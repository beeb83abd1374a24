"""Device-side per-iteration profile of the BA solver pieces (SoA core).

Each piece runs K times inside a lax.fori_loop with a data dependence
(so XLA cannot hoist it) and returns ONE scalar — no big host transfers,
so the remote-relay transfer cost cannot pollute the numbers.

Usage: PYTHONPATH=/root/repo:/root/repo/scripts:/root/.axon_site python scripts/profile_ba2.py [C L]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from exp_ba import make_problem  # noqa: E402

K = 20


def timeit(fn, *a, repeat=3):
    out = fn(*a)
    float(np.asarray(out))
    best = float("inf")
    for _ in range(repeat):
        t0 = time.time()
        out = fn(*a)
        float(np.asarray(out))
        best = min(best, time.time() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from reconstructor_tpu.ba import lm

    print("device:", jax.devices()[0], file=sys.stderr)
    rng = np.random.default_rng(0)
    if len(sys.argv) >= 3:
        C_req, L_req = int(sys.argv[1]), int(sys.argv[2])
        C_pad = -(-C_req // 16) * 16
        L_pad = -(-L_req // 4096) * 4096
        prob, O = make_problem(rng, C_req, L_req, None, C_pad=C_pad, L_pad=L_pad)
    else:
        prob, O = make_problem(rng, 25, 11000, None, C_pad=32, L_pad=16384)
    C = prob.cam_params.shape[0]
    L = prob.points.shape[0]

    w_idx = jnp.asarray(lm.coupling_gather_table(
        prob.obs_pt, prob.obs_cam, prob.obs_mask, C, L))
    print(f"shapes: C={C} L={L} O={prob.obs_cam.shape[0]} K={K}",
          file=sys.stderr)

    cam_ids = jnp.arange(C, dtype=prob.obs_cam.dtype)
    onehot_cam = ((prob.obs_cam[:, None] == cam_ids)
                  & prob.obs_mask[:, None]).astype(jnp.float32)
    camT0 = prob.cam_params.T
    ptsT0 = prob.points.T
    uvT = prob.obs_uv.T
    maskO = prob.obs_mask.astype(jnp.float32)[None, :]
    freeT = prob.cam_free.T

    @jax.jit
    def loop_jac(eps):
        def body(i, acc):
            res, Jc, Jp = lm._blocks_soa(camT0 + acc * 1e-30, ptsT0, freeT,
                                         prob.obs_cam, prob.obs_pt, uvT,
                                         maskO, 0.0)
            return acc + res[0, 0] + Jc[0, 0, 0] + Jp[0, 0, 0]
        return lax.fori_loop(0, K, body, eps)

    @jax.jit
    def loop_blocks(eps):
        def body(i, acc):
            b = lm._normal_blocks_lm(prob, camT0 + acc * 1e-30, ptsT0, freeT,
                                     uvT, maskO, w_idx, onehot_cam, 0.0)
            return acc + b[0][0, 0] + b[1][0, 0] + b[2][0, 0, 0] \
                + b[3][0, 0] + b[4][0, 0, 0, 0]
        return lax.fori_loop(0, K, body, eps)

    blocks = jax.jit(lambda: lm._normal_blocks_lm(
        prob, camT0, ptsT0, freeT, uvT, maskO, w_idx, onehot_cam, 0.0))()

    @jax.jit
    def loop_step(eps):
        def body(i, acc):
            d_cam, d_pt, pred = lm._damped_schur_step(
                prob.cam_free, blocks, 1e-3 + acc * 1e-30, "marquardt")
            return acc + d_cam[2, 0] + d_pt[0, 0] + pred * 0
        return lax.fori_loop(0, K, body, eps)

    @jax.jit
    def loop_cost(eps):
        def body(i, acc):
            c = lm._cost_soa(camT0 + acc * 1e-30, ptsT0, uvT, maskO,
                             prob.obs_cam, prob.obs_pt, 0.0)
            return acc + c * 1e-30
        return lax.fori_loop(0, K, body, eps)

    @jax.jit
    def loop_full(eps):
        def body(i, acc):
            b = lm._normal_blocks_lm(prob, camT0 + acc * 1e-30, ptsT0, freeT,
                                     uvT, maskO, w_idx, onehot_cam, 0.0)
            d_cam, d_pt, pred = lm._damped_schur_step(
                prob.cam_free, b, 1e-3, "marquardt")
            c = lm._cost_soa(camT0 + d_cam.T, ptsT0 + d_pt, uvT, maskO,
                             prob.obs_cam, prob.obs_pt, 0.0)
            return acc + c * 1e-30
        return lax.fori_loop(0, K, body, eps)

    z = jnp.asarray(0.0, jnp.float32)

    @jax.jit
    def loop_null(eps):
        return lax.fori_loop(0, K, lambda i, a: a + eps * 1e-30, eps)

    base = timeit(loop_null, z)
    print(f"{'dispatch baseline':28s}: {base * 1e3:8.2f} ms/call "
          f"(subtracted below)", file=sys.stderr)
    for name, fn in [("jacobians only", loop_jac),
                     ("normal blocks (incl jac)", loop_blocks),
                     ("schur step only", loop_step),
                     ("cost eval only", loop_cost),
                     ("full iteration", loop_full)]:
        t = timeit(fn, z) - base
        print(f"{name:28s}: {t / K * 1e3:8.2f} ms/iter", file=sys.stderr)


if __name__ == "__main__":
    main()
