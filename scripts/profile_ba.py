"""Profile ba/lm.py sub-pieces on the exported fountain problem (real TPU).

Times, per call: full solve iteration, blocks build, damped Schur step,
cost eval, and the inner pieces of the blocks build (jvp Jacobians,
one-hot camera reductions, sentinel gather).
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

from reconstructor_tpu.ba import lm


def timeit(fn, *args, reps=20, warmup=2):
    for _ in range(warmup):
        r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / reps


def load(path):
    d = np.load(path)
    return lm.BAProblem(
        cam_params=jnp.asarray(d["cam_params"]),
        points=jnp.asarray(d["points"]),
        obs_cam=jnp.asarray(d["obs_cam"]),
        obs_pt=jnp.asarray(d["obs_pt"]),
        obs_uv=jnp.asarray(d["obs_uv"]),
        obs_mask=jnp.asarray(d["obs_mask"]),
        cam_free=jnp.asarray(d["cam_free"]),
    )


def profile(prob, tag):
    C = prob.cam_params.shape[0]
    L = prob.points.shape[0]
    O = prob.obs_cam.shape[0]
    nlive = int(np.asarray(prob.obs_mask).sum())
    npts = int(np.unique(np.asarray(prob.obs_pt)[np.asarray(prob.obs_mask)]).size)
    print(f"== {tag}: C={C} L={L} (live {npts}) O={O} (live {nlive})")

    w_idx = jnp.asarray(lm.coupling_gather_table(
        prob.obs_pt, prob.obs_cam, prob.obs_mask, C, L))

    dtype = prob.cam_params.dtype
    cam_ids = jnp.arange(C, dtype=prob.obs_cam.dtype)
    onehot_cam = ((prob.obs_cam[:, None] == cam_ids)
                  & prob.obs_mask[:, None]).astype(dtype)
    uvT = prob.obs_uv.T
    maskO = prob.obs_mask.astype(dtype)[None, :]
    freeT = prob.cam_free.T
    camT = prob.cam_params.T
    ptsT = prob.points.T

    # full solve, fixed 20 iters (no early exit -> clean per-iter time)
    @jax.jit
    def full():
        return lm._solve_landmark_major(
            prob, w_idx, 20, 1e-3, 4.0, 2.0, 0.0, 1000.0, 5, 0.0,
            "marquardt", "nielsen")
    t = timeit(full, reps=3)
    print(f"  full 20-iter solve: {t*1e3:8.2f} ms -> {t/20*1e3:6.2f} ms/iter")

    blocks_j = jax.jit(lambda c, p: lm._normal_blocks_lm(
        prob, c, p, freeT, uvT, maskO, w_idx, onehot_cam, 0.0))
    t_blocks = timeit(blocks_j, camT, ptsT)
    print(f"  blocks build:       {t_blocks*1e3:8.2f} ms")

    blocks = jax.jit(lambda c, p: lm._normal_blocks_lm(
        prob, c, p, freeT, uvT, maskO, w_idx, onehot_cam, 0.0))(camT, ptsT)
    blocks = jax.tree.map(jnp.asarray, blocks)
    step_j = jax.jit(lambda b, lam: lm._damped_schur_step(
        prob.cam_free, b, lam, "marquardt"))
    t_step = timeit(step_j, blocks, jnp.asarray(1e-3, dtype))
    print(f"  damped schur step:  {t_step*1e3:8.2f} ms")

    cost_j = jax.jit(lambda c, p: lm._cost_soa(
        c, p, uvT, maskO, prob.obs_cam, prob.obs_pt, 0.0))
    t_cost = timeit(cost_j, camT, ptsT)
    print(f"  cost eval:          {t_cost*1e3:8.2f} ms")

    # --- blocks internals ---
    bs_j = jax.jit(lambda c, p: lm._blocks_soa(
        c, p, freeT, prob.obs_cam, prob.obs_pt, uvT, maskO, 0.0))
    t_bs = timeit(bs_j, camT, ptsT)
    print(f"    jacobian stacks:  {t_bs*1e3:8.2f} ms")

    res, Jc, Jp = jax.tree.map(jnp.asarray, bs_j(camT, ptsT))

    def camside(res, Jc):
        Jc0, Jc1 = Jc[:, 0], Jc[:, 1]
        jtr_c = Jc0 * res[0] + Jc1 * res[1]
        g_cT = jtr_c @ onehot_cam
        hcc_o = (Jc0[:, None] * Jc0[None] + Jc1[:, None] * Jc1[None])
        H_cc = (hcc_o.reshape(144, -1) @ onehot_cam).reshape(12, 12, C)
        return g_cT, H_cc
    t_cam = timeit(jax.jit(camside), res, Jc)
    print(f"    cam-side onehot:  {t_cam*1e3:8.2f} ms")

    def gather(res, Jc, Jp):
        Jc0, Jc1 = Jc[:, 0], Jc[:, 1]
        Jp0, Jp1 = Jp[:, 0], Jp[:, 1]
        Y = (Jc0[:, None] * Jp0[None] + Jc1[:, None] * Jp1[None]).reshape(36, -1)
        hpp_o = (Jp0[:, None] * Jp0[None] + Jp1[:, None] * Jp1[None]).reshape(9, -1)
        gp_o = Jp0 * res[0] + Jp1 * res[1]
        src = jnp.concatenate([Y, hpp_o, gp_o], axis=0)
        srcp = jnp.concatenate([src, jnp.zeros((48, 1), src.dtype)], axis=1)
        G = jax.vmap(lambda idx: srcp[:, idx])(w_idx)
        return G
    t_g = timeit(jax.jit(gather), res, Jc, Jp)
    print(f"    sentinel gather:  {t_g*1e3:8.2f} ms")

    # --- step internals ---
    g_cT, g_pL, H_cc, H_ppL, W = blocks

    def schur_mm(W, Hinv):
        B = (W[:, :, 0, None, :] * Hinv[0][None, None]
             + W[:, :, 1, None, :] * Hinv[1][None, None]
             + W[:, :, 2, None, :] * Hinv[2][None, None])
        n = C * 12
        Wf = W.reshape(n, 3 * L)
        Bf = B.reshape(n, 3 * L)
        return Bf @ Wf.T
    Hinv = jnp.asarray(lm._inv3x3_soa(H_ppL).reshape(3, 3, L))
    t_mm = timeit(jax.jit(schur_mm), W, Hinv)
    print(f"    B build+S matmul: {t_mm*1e3:8.2f} ms")

    def chol(S, rhs):
        c = jax.scipy.linalg.cho_factor(S)
        return jax.scipy.linalg.cho_solve(c, rhs)
    n = C * 12
    S = jnp.eye(n) * 100.0
    rhs = jnp.ones((n,))
    t_ch = timeit(jax.jit(chol), S, rhs)
    print(f"    cholesky {n}x{n}: {t_ch*1e3:8.2f} ms")


if __name__ == "__main__":
    print("device:", jax.devices()[0].device_kind)
    prob = load("out/ba_problem_final.npz")
    profile(prob, "fountain (padded)")

    # large synthetic, same generator as bench ba_large
    from scripts import exp_ba
    rng = np.random.default_rng(0)
    lprob, lO = exp_ba.make_problem(rng, 100, 40000, None,
                                    C_pad=112, L_pad=49152)
    profile(lprob, "large")
