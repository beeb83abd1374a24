"""Per-stage profile of the landmark-major BA solver on the live device.

Times each jitted sub-program (blocks build, damped Schur step, cost
eval) separately at fountain-25 shapes, to find where the per-iteration
milliseconds go.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_ba.py
"""

import os
import sys
import time
import functools

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from exp_ba import make_problem  # noqa: E402


def timeit(fn, *a, repeat=10, **kw):
    out = fn(*a, **kw)
    jax_flatten_to_host(out)
    best = float("inf")
    for _ in range(repeat):
        t0 = time.time()
        out = fn(*a, **kw)
        jax_flatten_to_host(out)
        best = min(best, time.time() - t0)
    return out, best


def jax_flatten_to_host(x):
    import jax
    for leaf in jax.tree_util.tree_leaves(x):
        np.asarray(leaf).ravel()[:1]


def main():
    import jax
    import jax.numpy as jnp
    from reconstructor_tpu.ba import lm

    print("device:", jax.devices()[0], file=sys.stderr)
    rng = np.random.default_rng(0)
    prob, O = make_problem(rng, 25, 11000, None, C_pad=32, L_pad=16384)
    C = prob.cam_params.shape[0]

    p_idx, p_cam, p_mask = lm.landmark_major_layout(
        prob.obs_pt, prob.obs_cam, prob.obs_mask, prob.points.shape[0])
    p_idx, p_cam, p_mask = map(jnp.asarray, (p_idx, p_cam, p_mask))
    print(f"shapes: C={C} L={prob.points.shape[0]} O={prob.obs_cam.shape[0]} "
          f"M={p_idx.shape[1]}", file=sys.stderr)

    cam_ids = jnp.arange(C, dtype=p_cam.dtype)
    onehot_cam = ((prob.obs_cam[:, None] == cam_ids)
                  & prob.obs_mask[:, None]).astype(jnp.float32)
    onehot_pc = (p_cam[..., None] == cam_ids).astype(jnp.float32) * p_mask[..., None]

    blocks_fn = jax.jit(functools.partial(
        lm._normal_blocks_lm, huber_delta=0.0))
    step_fn = jax.jit(functools.partial(lm._damped_schur_step,
                                        damping="marquardt"))
    cost_fn = jax.jit(functools.partial(lm._compute_cost, huber_delta=0.0))
    jac_fn = jax.jit(functools.partial(lm._build_blocks, huber_delta=0.0))

    lam = jnp.asarray(1e-3, jnp.float32)

    _, t_jac = timeit(jac_fn, prob, prob.cam_params, prob.points)
    blocks, t_blocks = timeit(blocks_fn, prob, prob.cam_params, prob.points,
                              p_idx, p_mask, onehot_cam, onehot_pc)
    _, t_step = timeit(step_fn, prob, blocks, lam)
    _, t_cost = timeit(cost_fn, prob, prob.cam_params, prob.points)

    print(f"jacobians (_build_blocks)        : {t_jac*1e3:8.2f} ms", file=sys.stderr)
    print(f"normal blocks (incl. jacobians)  : {t_blocks*1e3:8.2f} ms", file=sys.stderr)
    print(f"damped schur step                : {t_step*1e3:8.2f} ms", file=sys.stderr)
    print(f"cost eval                        : {t_cost*1e3:8.2f} ms", file=sys.stderr)

    # decompose the blocks build further
    def blocks_no_w(prob_, cam, pts):
        res, Jc, Jp = lm._build_blocks(prob_, cam, pts, 0.0)
        g_c = onehot_cam.T @ jnp.einsum("ori,or->oi", Jc, res)
        H_cc = (onehot_cam.T @ jnp.einsum("ori,orj->oij", Jc, Jc).reshape(-1, 144)).reshape(C, 12, 12)
        A = jnp.einsum("ori,orj->oij", Jc, Jp)
        HppO = jnp.einsum("ori,orj->oij", Jp, Jp)
        gpO = jnp.einsum("ori,or->oi", Jp, res)
        pmm = p_mask[..., None, None]
        Ag = A[p_idx] * pmm
        H_pp = jnp.sum(HppO[p_idx] * pmm, axis=1)
        g_p = jnp.sum(gpO[p_idx] * p_mask[..., None], axis=1)
        return g_c, H_cc, Ag, H_pp, g_p

    _, t_now = timeit(jax.jit(blocks_no_w), prob, prob.cam_params, prob.points)
    print(f"  blocks w/o W einsum            : {t_now*1e3:8.2f} ms", file=sys.stderr)

    # decompose the step further
    g_c, g_p, H_cc, H_pp, Wt3 = blocks
    n = C * 12
    L = g_p.shape[0]

    def step_schur_only(Wt3_, Hpp_inv):
        Bt = jnp.einsum("alj,ljk->alk", Wt3_, Hpp_inv)
        Bf = Bt.reshape(n, L * 3)
        Wf = Wt3_.reshape(n, L * 3)
        return Bf @ Wf.T

    def inv_only(H_pp_):
        dp = jnp.clip(jnp.diagonal(H_pp_, axis1=1, axis2=2), 1e-6, 1e32)
        return lm._inv3x3(H_pp_ + (1e-3 * dp + 1e-8)[:, :, None] * jnp.eye(3))

    Hpp_inv, t_inv = timeit(jax.jit(inv_only), H_pp)
    _, t_schur = timeit(jax.jit(step_schur_only), Wt3, Hpp_inv)
    print(f"  3x3 adjugate inverses          : {t_inv*1e3:8.2f} ms", file=sys.stderr)
    print(f"  B=W Hppinv + S matmul          : {t_schur*1e3:8.2f} ms", file=sys.stderr)

    def chol_solve(S, rhs):
        chol = jax.scipy.linalg.cho_factor(S)
        return jax.scipy.linalg.cho_solve(chol, rhs)

    S = np.eye(n, dtype=np.float32) * 100 + rng.normal(0, 0.1, (n, n)).astype(np.float32)
    S = jnp.asarray(S @ S.T)
    rhs = jnp.asarray(rng.normal(0, 1, n).astype(np.float32))
    _, t_chol = timeit(jax.jit(chol_solve), S, rhs)
    print(f"  cholesky factor+solve ({n})    : {t_chol*1e3:8.2f} ms", file=sys.stderr)


if __name__ == "__main__":
    main()
