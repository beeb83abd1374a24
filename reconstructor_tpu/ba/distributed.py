"""Distributed bundle adjustment: implicit-Schur PCG over a device mesh.

This is the scale-out path BASELINE.json config 5 asks for (multi-host
Schur-complement BA) — a capability the reference does not have at all
(its Ceres solve is single-process, 4 CPU threads, BundleAdjuster.cpp:133).

Design (SURVEY.md §7 step 6, scaling-book style):

- The *observation* axis is the sharding axis: residuals, Jacobian blocks
  and the per-observation camera-point coupling Y_o = Jc_o^T Jp_o are all
  computed locally on each chip's observation slice.
- The reduced camera system S = Hcc - W Hpp^-1 W^T is never materialized.
  LM solves it with preconditioned CG whose matvec is two segment-sums
  over observations: u -> Hcc u - SUM_o Y_o Hpp^-1[pt_o] (Y_o^T u[cam_o]).
  Reducing those segment-sums to the (C,12) / (L,3,3) replicated operands
  is exactly a ``psum`` over the mesh — XLA inserts it from the sharding
  annotations; no hand-written collectives.
- Camera state (C x 12) and points (L x 3) stay replicated: they are tiny
  next to observations, and the dense S solve the single-chip path does
  is replaced by CG matvecs that only touch replicated small tensors.
  Communication per CG iteration is O(C*12 + L*3) over ICI — independent
  of the observation count, which is the property that gives near-linear
  scaling as observations grow.

The same function runs single-chip (trivial mesh) — useful both for
testing and as an alternative to the dense-Schur solve once C*12
outgrows a comfortable dense factorization.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from reconstructor_tpu.ba import lm as ba_lm
from reconstructor_tpu.parallel.sharding import AXIS


def _build_blocks(prob: ba_lm.BAProblem, cam_params, points,
                  huber_delta: float = 0.0):
    return ba_lm._build_blocks(prob, cam_params, points, huber_delta)


def _pcg(matvec, rhs, precond, num_iters: int, tol: float):
    """Fixed-budget preconditioned conjugate gradient with early exit."""
    x0 = jnp.zeros_like(rhs)
    r0 = rhs
    z0 = precond(r0)
    p0 = z0
    rz0 = jnp.vdot(r0, z0)
    rhs_norm = jnp.linalg.norm(rhs)

    def cond(state):
        x, r, p, rz, it = state
        return (it < num_iters) & (jnp.linalg.norm(r) > tol * rhs_norm)

    def body(state):
        x, r, p, rz, it = state
        Ap = matvec(p)
        alpha = rz / jnp.maximum(jnp.vdot(p, Ap), 1e-20)
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond(r)
        rz_new = jnp.vdot(r, z)
        beta = rz_new / jnp.maximum(rz, 1e-20)
        p = z + beta * p
        return x, r, p, rz_new, it + 1

    x, r, p, rz, it = jax.lax.while_loop(cond, body, (x0, r0, p0, rz0, 0))
    return x


def _build_pcg_blocks(prob: ba_lm.BAProblem, cam_params, points,
                      huber_delta: float = 0.0):
    """Damping-independent blocks for the implicit-Schur path (built once
    per outer LM iteration; lambda retries reuse them)."""
    C = cam_params.shape[0]
    L = points.shape[0]
    res, Jc, Jp = _build_blocks(prob, cam_params, points, huber_delta)
    g_c = jax.ops.segment_sum(jnp.einsum("ori,or->oi", Jc, res), prob.obs_cam, C)
    g_p = jax.ops.segment_sum(jnp.einsum("ori,or->oi", Jp, res), prob.obs_pt, L)
    H_cc = jax.ops.segment_sum(jnp.einsum("ori,orj->oij", Jc, Jc), prob.obs_cam, C)
    H_pp = jax.ops.segment_sum(jnp.einsum("ori,orj->oij", Jp, Jp), prob.obs_pt, L)
    Y = jnp.einsum("ori,orj->oij", Jc, Jp)          # (O,12,3), sharded on O
    return g_c, g_p, H_cc, H_pp, Y


def _lm_step_pcg(prob: ba_lm.BAProblem, blocks, lam,
                 cg_iters: int, cg_tol: float, damping: str = "levenberg"):
    """One damped implicit-Schur PCG solve from prebuilt blocks.

    The Schur matvec streams over the (sharded) observation axis; no W is
    materialized.
    """
    g_c, g_p, H_cc, H_pp, Y = blocks
    C = g_c.shape[0]
    L = g_p.shape[0]
    eye12 = jnp.eye(12, dtype=g_c.dtype)
    eye3 = jnp.eye(3, dtype=g_c.dtype)
    fixed_c = 1.0 - prob.cam_free
    if damping == "marquardt":
        dc = jnp.clip(jnp.diagonal(H_cc, axis1=1, axis2=2), 1e-6, 1e32)
        dp = jnp.clip(jnp.diagonal(H_pp, axis1=1, axis2=2), 1e-6, 1e32)
        H_cc = H_cc + (lam * dc)[:, :, None] * eye12 + fixed_c[:, :, None] * eye12
        H_pp = H_pp + (lam * dp + 1e-8)[:, :, None] * eye3
    else:
        H_cc = H_cc + lam * eye12 + fixed_c[:, :, None] * eye12
        H_pp = H_pp + (lam + 1e-8) * eye3
    H_pp_inv = ba_lm._inv3x3(H_pp)                   # (L,3,3) replicated

    def schur_matvec(u_flat):
        u = u_flat.reshape(C, 12)
        # W^T u: per-obs Y^T u[cam] -> segment over points
        Ytu = jnp.einsum("oij,oi->oj", Y, u[prob.obs_cam])            # (O,3)
        WtU = jax.ops.segment_sum(Ytu, prob.obs_pt, L)                # (L,3)  [psum]
        z = jnp.einsum("lij,lj->li", H_pp_inv, WtU)                   # (L,3)
        Wz_o = jnp.einsum("oij,oj->oi", Y, z[prob.obs_pt])            # (O,12)
        Wz = jax.ops.segment_sum(Wz_o, prob.obs_cam, C)               # (C,12) [psum]
        Hu = jnp.einsum("cij,cj->ci", H_cc, u)
        return (Hu - Wz).reshape(-1)

    # W Hpp^-1 g_p for the reduced rhs
    zg = jnp.einsum("lij,lj->li", H_pp_inv, g_p)
    Wzg = jax.ops.segment_sum(jnp.einsum("oij,oj->oi", Y, zg[prob.obs_pt]),
                              prob.obs_cam, C)
    rhs = -(g_c - Wzg).reshape(-1)

    H_cc_inv = jnp.linalg.inv(H_cc)                  # block-Jacobi preconditioner

    def precond(r_flat):
        r = r_flat.reshape(C, 12)
        return jnp.einsum("cij,cj->ci", H_cc_inv, r).reshape(-1)

    d_cam = _pcg(schur_matvec, rhs, precond, cg_iters, cg_tol).reshape(C, 12)

    WtD = jax.ops.segment_sum(
        jnp.einsum("oij,oi->oj", Y, d_cam[prob.obs_cam]), prob.obs_pt, L)
    d_pt = -jnp.einsum("lij,lj->li", H_pp_inv, g_p + WtD)
    return d_cam * prob.cam_free, d_pt


@functools.partial(jax.jit, static_argnames=("max_iters", "cg_iters",
                                             "max_retries", "huber_delta",
                                             "damping"))
def solve_pcg(prob: ba_lm.BAProblem, max_iters: int = 50,
              init_lambda: float = 1e-3, lambda_up: float = 4.0,
              lambda_down: float = 2.0, ftol: float = 1e-8,
              cg_iters: int = 64, cg_tol: float = 1e-6,
              focal_upper_bound: float = 1000.0,
              max_retries: int = 5, huber_delta: float = 0.0,
              damping: str = "marquardt") -> ba_lm.BAResult:
    """LM with implicit-Schur PCG linear solves (mesh-shardable).

    Same two-level structure as ba.lm.solve: blocks once per outer
    iteration, damping retries re-run only the PCG solve.
    """
    cost0 = ba_lm._compute_cost(prob, prob.cam_params, prob.points, huber_delta)

    def cond(state):
        cam, pts, lam, cost, it, done = state
        return (it < max_iters) & (~done)

    def body(state):
        cam, pts, lam, cost, it, done = state
        blocks = _build_pcg_blocks(prob, cam, pts, huber_delta)

        def retry_cond(s):
            tries, lam_i, accepted, *_ = s
            return (tries < max_retries) & (~accepted)

        def retry_body(s):
            tries, lam_i, accepted, best_cam, best_pts, best_cost = s
            d_cam, d_pt = _lm_step_pcg(prob, blocks, lam_i, cg_iters, cg_tol,
                                       damping)
            cam_new = (cam + d_cam).at[:, 6:8].min(focal_upper_bound)
            pts_new = pts + d_pt
            new_cost = ba_lm._compute_cost(prob, cam_new, pts_new, huber_delta)
            good = (new_cost < cost) & jnp.isfinite(new_cost)
            best_cam = jnp.where(good, cam_new, best_cam)
            best_pts = jnp.where(good, pts_new, best_pts)
            best_cost = jnp.where(good, new_cost, best_cost)
            return tries + 1, jnp.where(good, lam_i, lam_i * lambda_up), \
                good, best_cam, best_pts, best_cost

        tries, lam_new, accepted, cam_new, pts_new, new_cost = jax.lax.while_loop(
            retry_cond, retry_body,
            (jnp.asarray(0, jnp.int32), lam, jnp.asarray(False), cam, pts, cost))

        cam = jnp.where(accepted, cam_new, cam)
        pts = jnp.where(accepted, pts_new, pts)
        lam = jnp.where(accepted, lam_new / lambda_down, lam_new)
        rel_drop = (cost - new_cost) / jnp.maximum(cost, 1e-12)
        # a fully-failed retry round only inflates lambda and tries again
        # next outer iteration; termination is convergence or lambda blowup
        done = (accepted & (rel_drop < ftol) & (rel_drop >= 0)) | (lam > 1e10)
        cost = jnp.where(accepted, new_cost, cost)
        return cam, pts, lam, cost, it + 1, done

    lam0 = jnp.asarray(init_lambda, prob.cam_params.dtype)
    state = (prob.cam_params, prob.points, lam0, cost0,
             jnp.asarray(0, jnp.int32), jnp.asarray(False))
    cam, pts, lam, cost, it, _ = jax.lax.while_loop(cond, body, state)
    return ba_lm.BAResult(cam_params=cam, points=pts, cost_initial=cost0,
                          cost_final=cost, iterations=it)


def shard_problem(mesh: Mesh, prob: ba_lm.BAProblem) -> ba_lm.BAProblem:
    """Place the observation axis of a BAProblem across the mesh, camera
    and point state replicated. Observation count must be a multiple of
    the mesh size (pad with masked-out slots)."""
    from reconstructor_tpu.parallel.sharding import put_global
    return ba_lm.BAProblem(
        cam_params=put_global(mesh, prob.cam_params, P()),
        points=put_global(mesh, prob.points, P()),
        obs_cam=put_global(mesh, prob.obs_cam, P(AXIS)),
        obs_pt=put_global(mesh, prob.obs_pt, P(AXIS)),
        obs_uv=put_global(mesh, prob.obs_uv, P(AXIS)),
        obs_mask=put_global(mesh, prob.obs_mask, P(AXIS)),
        cam_free=put_global(mesh, prob.cam_free, P()),
    )


def solve_distributed(mesh: Mesh, prob: ba_lm.BAProblem, **kwargs) -> ba_lm.BAResult:
    """Shard the problem over the mesh and run the PCG-Schur LM solver.

    XLA partitions every per-observation computation across chips and
    inserts psums for the (C,12)/(L,3) reductions — the multi-host
    topology just makes those collectives span ICI + DCN.
    """
    sharded = shard_problem(mesh, prob)
    solver = _dist_solver(mesh, tuple(sorted(kwargs.items())))
    return solver(sharded)


@functools.lru_cache(maxsize=32)
def _dist_solver(mesh: Mesh, kwargs_items):
    """Cached jitted solver: a fresh jax.jit wrapper per call would
    recompile on every invocation (the jit cache keys on the wrapped
    callable's identity)."""
    rep = NamedSharding(mesh, P())
    return jax.jit(
        functools.partial(solve_pcg, **dict(kwargs_items)),
        out_shardings=ba_lm.BAResult(cam_params=rep, points=rep,
                                     cost_initial=rep, cost_final=rep,
                                     iterations=rep))
