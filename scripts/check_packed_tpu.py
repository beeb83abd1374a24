"""Compile + equivalence check for the packed kNN kernel ON REAL TPU.

Interpret-mode tests (tests/test_pallas_kernels.py) prove the math; this
proves Mosaic lowers the int32 shift/bitwise packing and that the packed
and float kernels agree on-device at a production-like shape. Run before
trusting the packed default on hardware.
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from reconstructor_tpu.matching import pallas_knn

    rng = np.random.default_rng(0)
    N, K, D, B = 6, 1024, 128, 32
    desc = rng.standard_normal((N, K, D)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
    mask = np.ones((N, K), bool)
    mask[:, 900:] = False          # exercise the mask sentinel
    pidx = rng.integers(0, N, (B, 2)).astype(np.int32)
    pidx = pidx[pidx[:, 0] != pidx[:, 1]][:16]

    desc_j = jnp.asarray(desc)
    mask_j = jnp.asarray(mask)
    pidx_j = jnp.asarray(pidx)
    out = {"device": str(jax.devices()[0])}
    for dt in ("float32", "bfloat16"):
        d = desc_j.astype(jnp.bfloat16) if dt == "bfloat16" else desc_j
        bias_f = jnp.where(mask_j, 0.0, pallas_knn._BIG).astype(jnp.float32)
        bias_i = jnp.where(mask_j, 0, pallas_knn._DMAX).astype(jnp.int32)
        bp, sp, ap_, cp = [np.asarray(x) for x in pallas_knn._knn_topk2(
            d, bias_i, pidx_j, packed=True)]
        bf, sf, af, cf = [np.asarray(x) for x in pallas_knn._knn_topk2(
            d, bias_f, pidx_j, packed=False)]
        out[f"{dt}_arg_agree"] = float((ap_ == af).mean())
        out[f"{dt}_colarg_agree"] = float((cp == cf).mean())
        lo = bf < 1e29
        out[f"{dt}_best_maxerr"] = float(np.abs(bp - bf)[lo].max())
        out[f"{dt}_sentinel_agree"] = float(((bp > 1e29) == (bf > 1e29)).mean())
    print(json.dumps(out))


if __name__ == "__main__":
    main()
