"""Bisect the r2->r3 match100 regression (VERDICT r3 #5): packed vs
unpacked fused kNN kernel x keypoint-axis trim (3840 vs 4096), on the
real fountain descriptors tiled to the 100-image workload.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_match_regression.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from reconstructor_tpu.config import ReconstructorConfig
    from reconstructor_tpu.matching import pallas_knn, pairs as pairing
    from reconstructor_tpu.pipeline.incremental import IncrementalReconstructor

    cfg = ReconstructorConfig()
    rec = IncrementalReconstructor(cfg, verbose=False)
    state = rec.detect_features("/root/reference/data")
    tile = 4
    desc = np.tile(state.desc, (tile, 1, 1))
    kmask = np.tile(state.kp_mask, (tile, 1))
    n_img = desc.shape[0]
    pair_np = pairing.exhaustive_pairs(n_img)
    P = pair_np.shape[0]
    B = cfg.match_chunk_pairs
    print(f"imgs={n_img} K_full={desc.shape[1]} pairs={P} chunk={B}",
          flush=True)

    counts = kmask.sum(axis=1)
    kt_real = int(counts.max())

    def run(kt, packed, dtype):
        d = jnp.asarray(desc[:, :kt])
        m = jnp.asarray(kmask[:, :kt])
        if dtype == "bfloat16":
            d = d.astype(jnp.bfloat16)
        from reconstructor_tpu.matching.pallas_knn import (
            _knn_topk2, _DMAX, _BIG)
        bias = (jnp.where(m, 0, _DMAX).astype(jnp.int32) if packed
                else jnp.where(m, 0.0, _BIG).astype(jnp.float32))

        def once():
            outs = []
            for s0 in range(0, P, B):
                chunk = np.zeros((B, 2), np.int32)
                e = min(s0 + B, P)
                chunk[: e - s0] = pair_np[s0:e]
                outs.append(_knn_topk2(d, bias, jnp.asarray(chunk),
                                       packed=packed))
            for o in outs:
                np.asarray(o[0][-1, :4])
        once()
        best = 1e9
        for _ in range(3):
            t0 = time.time(); once(); best = min(best, time.time() - t0)
        print(f"kt={kt} packed={int(packed)} {dtype:8s}: "
              f"{P/best:7.1f} pairs/s ({best:.2f} s)", flush=True)

    for kt in (max(256, -(-kt_real // 256) * 256), 4096):
        for packed in (True, False):
            run(kt, packed, str(cfg.knn_compute_dtype))


if __name__ == "__main__":
    main()
