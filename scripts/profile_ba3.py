"""Micro-profile of individual SoA BA ops (throwaway diagnostics).

Usage: PYTHONPATH=/root/repo:/root/repo/scripts:/root/.axon_site python scripts/profile_ba3.py
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
    return best / K * 1e3


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from reconstructor_tpu.ba import lm

    print("device:", jax.devices()[0], file=sys.stderr)
    rng = np.random.default_rng(0)
    prob, O_live = make_problem(rng, 25, 11000, None, C_pad=32, L_pad=16384)
    C = prob.cam_params.shape[0]
    L = prob.points.shape[0]
    O = prob.obs_cam.shape[0]

    p_idx, p_cam, p_mask = lm.landmark_major_layout(
        prob.obs_pt, prob.obs_cam, prob.obs_mask, L)
    w_idx = jnp.asarray(lm.coupling_gather_table(
        prob.obs_pt, prob.obs_cam, prob.obs_mask, C, L))
    p_idxT = jnp.asarray(p_idx.T.copy())
    p_maskT = jnp.asarray(p_mask.T.copy())
    M = p_idxT.shape[0]
    print(f"shapes: C={C} L={L} O={O} M={M}", file=sys.stderr)

    cam_ids = jnp.arange(C, dtype=prob.obs_cam.dtype)
    onehot_cam = ((prob.obs_cam[:, None] == cam_ids)
                  & prob.obs_mask[:, None]).astype(jnp.float32)
    camT0 = prob.cam_params.T
    ptsT0 = prob.points.T
    uvT = prob.obs_uv.T
    maskO = prob.obs_mask.astype(jnp.float32)[None, :]
    freeT = prob.cam_free.T

    blocks = jax.jit(lambda: lm._normal_blocks_lm(
        prob, camT0, ptsT0, freeT, uvT, maskO, p_idxT, p_maskT, w_idx,
        onehot_cam, 0.0))()
    res, Jc, Jp = jax.jit(lambda: lm._blocks_soa(
        camT0, ptsT0, freeT, prob.obs_cam, prob.obs_pt, uvT, maskO, 0.0))()
    g_cT, g_pL, H_cc, H_ppL, W = blocks
    n = C * 12

    def loop(fn):
        @jax.jit
        def run(eps):
            def body(i, acc):
                return acc + fn(eps + acc * 1e-30)
            return lax.fori_loop(0, K, body, eps)
        return run

    # --- block pieces ---
    hcc_fn = loop(lambda e: ((jnp.einsum("iro,jro->ijo", Jc + e, Jc)
                              .reshape(144, -1) @ onehot_cam)[0, 0]))
    y_fn = loop(lambda e: jnp.einsum("iro,jro->ijo", Jc + e, Jp)[0, 0, 0])
    hpp9 = jnp.einsum("iro,jro->ijo", Jp, Jp).reshape(9, -1)
    pt_fn = loop(lambda e: jnp.sum((hpp9 + e)[:, p_idxT] * p_maskT,
                                   axis=1)[0, 0])
    Y36 = jnp.einsum("iro,jro->ijo", Jc, Jp).reshape(36, -1)
    Yp = jnp.concatenate([Y36, jnp.zeros((36, 1), Y36.dtype)], axis=1)

    w_fn = loop(lambda e: jax.vmap(lambda idx: (Yp + e)[:, idx])(w_idx)[0, 0, 0])
    wt_fn = loop(lambda e: jnp.take(Yp + e, w_idx.reshape(-1), axis=1)[0, 0])

    # --- step pieces ---
    Hinv = lm._inv3x3_soa(H_ppL + 1e-3).reshape(3, 3, L)
    b_fn = loop(lambda e: jnp.einsum("cijl,jkl->cikl", W + e, Hinv)[0, 0, 0, 0])
    B = jnp.einsum("cijl,jkl->cikl", W, Hinv)
    Wf = W.reshape(n, 3 * L)
    Bf = B.reshape(n, 3 * L)
    s_fn = loop(lambda e: ((Bf + e) @ Wf.T)[0, 0])
    S = (Bf @ Wf.T) + jnp.eye(n) * 1e3
    chol_fn = loop(lambda e: jax.scipy.linalg.cho_factor(S + e)[0][0, 0])
    rhs = jnp.ones((n,), jnp.float32)
    chol = jax.scipy.linalg.cho_factor(S)
    solve_fn = loop(lambda e: jax.scipy.linalg.cho_solve(chol, rhs + e)[0])

    for name, fn in [("H_cc einsum+onehot", hcc_fn),
                     ("Y36 einsum", y_fn),
                     ("point-side gathersum", pt_fn),
                     ("W gather (vmap)", w_fn),
                     ("W gather (flat take)", wt_fn),
                     ("B = W Hpp^-1 einsum", b_fn),
                     ("S = Bf @ Wf.T", s_fn),
                     ("cho_factor(S)", chol_fn),
                     ("cho_solve", solve_fn)]:
        print(f"{name:24s}: {timeit(fn, jnp.float32(0.0)):8.2f} ms",
              file=sys.stderr)


if __name__ == "__main__":
    main()
