"""Levenberg-Marquardt bundle adjustment with a Schur-complement solve.

Capability parity with the reference's Ceres-based ``BundleAdjuster``
(BundleAdjuster.cpp:11-188: autodiff reprojection residuals, DENSE_SCHUR,
gauge fixing cam0 + cam1-translation, intrinsics frozen below 10 cameras),
re-architected for TPU:

- The residual (``_residual``) is the reference's ReprojectionError
  (BundleAdjuster.h:26-58) — angle-axis rotation, additive shared radial
  distortion — written once in JAX; forward-mode autodiff (``jacfwd``
  vmapped over all observations at once) replaces Ceres's per-block
  AutoDiffCostFunction.
- Hessian assembly is SCATTER-FREE: TPU scatter-adds serialize, so every
  reduction is either a one-hot matmul (camera-side: (O,C)^T @ blocks —
  C is tiny, the contraction rides the MXU) or a contiguous sum over a
  landmark-major padded observation layout (point-side: obs sorted by
  landmark on the host once per solve, padded to M slots per landmark).
- The reduced camera system S = Hcc - W Hpp^-1 W^T is materialized
  *densely* through a (12C, 3L) landmark-camera coupling matrix: with C
  cameras in the dozens and L landmarks in the tens of thousands this is
  exactly the DENSE_SCHUR regime (BundleAdjuster.cpp:132), and the
  reduction is a single MXU matmul instead of Ceres's sparse block
  elimination. W itself is built by a batched per-landmark one-hot
  matmul over the M padded slots — no ``.at[].add`` anywhere.
- Per-landmark 3x3 inverses are closed-form adjugates (pure VPU
  elementwise math) instead of batched LU.
- Damping is Ceres-style Marquardt (lambda * clipped diag(H)) by
  default — the reference problem is badly scaled (focal ~600 px vs
  rotations ~0.1 rad), and diagonal scaling converges in far fewer
  iterations than additive-identity Levenberg.
- Parameter freezing (gauge + intrinsics policy) is expressed by zeroing
  Jacobian columns — the same fixed-point semantics as Ceres's
  SetParameterBlockConstant / SubsetManifold, but branch-free.
- The damped LM loop runs under ``lax.while_loop`` with accept/reject
  lambda control, entirely on device.

Parameter layout per camera (12): [aa(3), t(3), fx, fy, cx, cy, k1, k2]
(extrinsics packing of BundleAdjuster.cpp:52-57, intrinsics of :38-43).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from reconstructor_tpu.geometry import se3


class BAProblem(NamedTuple):
    """Fixed-shape bundle adjustment problem."""
    cam_params: jnp.ndarray   # (C, 12)
    points: jnp.ndarray       # (L, 3)
    obs_cam: jnp.ndarray      # (O,) int32
    obs_pt: jnp.ndarray       # (O,) int32
    obs_uv: jnp.ndarray       # (O, 2)
    obs_mask: jnp.ndarray     # (O,) bool
    cam_free: jnp.ndarray     # (C, 12) float 0/1 — free-parameter mask


class BAResult(NamedTuple):
    cam_params: jnp.ndarray
    points: jnp.ndarray
    cost_initial: jnp.ndarray
    cost_final: jnp.ndarray
    iterations: jnp.ndarray
    # Per-outer-iteration accepted cost (max_iters,), padded with the
    # final cost — feeds the time-to-equal-cost benchmark metric.
    cost_trace: jnp.ndarray | None = None


def _residual(cam: jnp.ndarray, pt: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Reprojection residual [du, dv] — BundleAdjuster.h:26-58 parity.

    cam: (12,) [aa, t, fx, fy, cx, cy, k1, k2]; pt: (3,); uv: (2,).
    """
    p = se3.rotate_points_aa(cam[:3], pt) + cam[3:6]
    # guard against z ~ 0 (masked observations may be garbage)
    z = jnp.where(jnp.abs(p[2]) < 1e-8, 1e-8, p[2])
    x = p[0] / z
    y = p[1] / z
    r = x * x + y * y
    d = cam[10] * r + cam[11] * r * r
    xd = x + d
    yd = y + d
    u = cam[6] * xd + cam[8]
    v = cam[7] * yd + cam[9]
    return jnp.stack([u - uv[0], v - uv[1]])


def make_cam_free_mask(num_cams: int, intrinsics_free_min_cams: int = 10):
    """Reference freezing policy as a (C, 12) 0/1 mask (host numpy — this
    runs once per BA call in the host loop; eager jnp here would compile
    a fresh tiny program per camera count through the remote tunnel).

    - camera 0: fully constant (gauge, BundleAdjuster.cpp:100-101)
    - camera 1: translation constant (scale gauge, :104-105)
    - intrinsics: all frozen when C < 10, else only principal point frozen
      (:108-129). k1, k2 follow the focal columns' policy.
    """
    import numpy as np
    free = np.ones((num_cams, 12), np.float32)
    free[0, :] = 0.0
    if num_cams > 1:
        free[1, 3:6] = 0.0
    if num_cams < intrinsics_free_min_cams:
        free[:, 6:12] = 0.0
    else:
        free[:, 8:10] = 0.0
    return free


def _compute_cost(prob: BAProblem, cam_params, points,
                  huber_delta: float = 0.0) -> jnp.ndarray:
    """Total cost; with huber_delta > 0 the per-observation squared norm
    s = |r|^2 runs through the Huber loss rho(s) = s for s <= delta^2,
    2 delta sqrt(s) - delta^2 otherwise (Ceres HuberLoss convention) —
    the robustification the reference lacks (its Ceres call passes a
    nullptr loss, BundleAdjuster.cpp:95-97)."""
    res = jax.vmap(_residual)(cam_params[prob.obs_cam], points[prob.obs_pt], prob.obs_uv)
    res = res * prob.obs_mask[:, None]
    s = jnp.sum(res * res, axis=-1)
    if huber_delta > 0.0:
        d2 = huber_delta * huber_delta
        s = jnp.where(s <= d2, s, 2.0 * huber_delta * jnp.sqrt(s + 1e-20) - d2)
    return 0.5 * jnp.sum(s)


def _build_blocks(prob: BAProblem, cam_params, points,
                  huber_delta: float = 0.0):
    """Per-observation residuals and masked Jacobian blocks.

    With huber_delta > 0, residuals and Jacobians are IRLS-scaled by
    sqrt(rho'(s)) so the Gauss-Newton normal equations of the scaled
    problem are those of the robustified cost (Triggs correction
    omitted, as is standard practice for Huber)."""
    def rj(cam, pt, uv):
        return (jax.jacfwd(_residual, argnums=(0, 1))(cam, pt, uv),
                _residual(cam, pt, uv))
    (Jc, Jp), res = jax.vmap(rj)(cam_params[prob.obs_cam], points[prob.obs_pt], prob.obs_uv)
    m = prob.obs_mask[:, None, None]
    Jc = Jc * m * prob.cam_free[prob.obs_cam][:, None, :]
    Jp = Jp * m
    res = res * prob.obs_mask[:, None]
    if huber_delta > 0.0:
        e = jnp.sqrt(jnp.sum(res * res, axis=-1, keepdims=True) + 1e-20)
        w = jnp.sqrt(jnp.minimum(1.0, huber_delta / e))      # (O,1)
        res = res * w
        Jc = Jc * w[:, :, None]
        Jp = Jp * w[:, :, None]
    return res, Jc, Jp   # (O,2), (O,2,12), (O,2,3)


def _inv3x3(m: jnp.ndarray) -> jnp.ndarray:
    """Closed-form adjugate inverse of (..., 3, 3) SPD matrices.

    Pure elementwise VPU math — replaces ``jnp.linalg.inv``'s batched LU,
    which at tens of thousands of 3x3 blocks is one of the two TPU sinks
    the r2 profile named. The determinant is clamped away from zero:
    rows whose W-coupling is zero (padding landmarks) never use the
    value, they just must not produce NaNs."""
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    A = e * i - f * h
    B = c * h - b * i
    Cc = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    H = b * g - a * h
    I = a * e - b * d
    det = a * A + b * D + c * G
    det = jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    adj = jnp.stack([A, B, Cc, D, E, F, G, H, I], axis=-1)
    return (adj / det[..., None]).reshape(m.shape)


def landmark_major_layout(obs_pt, obs_cam, obs_mask, num_landmarks: int,
                          m_pad: int | None = None):
    """Host-side (numpy) landmark-major padded observation layout.

    Returns (p_idx, p_cam, p_mask), each (L, M): for landmark l, slot m
    holds the index into the flat observation table of its m-th
    observation (0 + mask 0 for padding). M is the max track length
    rounded up to a power of two (>= 4) so jit shapes stay in coarse
    buckets as tracks grow. This is the same per-landmark-run trick the
    native DENSE_SCHUR baseline uses (native/ba_schur.cpp sorts
    observations landmark-major), expressed as a gather table instead of
    runs so every downstream reduction is a contiguous masked sum."""
    import numpy as np
    op = np.asarray(obs_pt)
    oc = np.asarray(obs_cam)
    om = np.asarray(obs_mask)
    L = int(num_landmarks)
    live = np.nonzero(om)[0]
    if live.size == 0:
        M = int(m_pad) if m_pad else 4
        return (np.zeros((L, M), np.int32), np.zeros((L, M), np.int32),
                np.zeros((L, M), np.float32))
    order = live[np.argsort(op[live], kind="stable")]
    sp = op[order]
    counts = np.bincount(sp, minlength=L)
    maxc = int(counts.max())
    M = int(m_pad) if m_pad else max(4, 1 << (maxc - 1).bit_length())
    starts = np.zeros(L, np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    slot = np.arange(order.size) - starts[sp]
    p_idx = np.zeros((L, M), np.int32)
    p_cam = np.zeros((L, M), np.int32)
    p_mask = np.zeros((L, M), np.float32)
    p_idx[sp, slot] = order
    p_cam[sp, slot] = oc[order]
    p_mask[sp, slot] = 1.0
    return p_idx, p_cam, p_mask


def coupling_gather_table(obs_pt, obs_cam, obs_mask, num_cams: int,
                          num_landmarks: int):
    """Host-side (numpy) (C, L) gather table for the W coupling blocks.

    Each (camera, landmark) pair has at most one observation, so the
    camera-landmark coupling W[c, l] = Jc_o^T Jp_o is a pure GATHER of
    per-observation blocks — w_idx[c, l] is that observation's index.
    Unobserved pairs point at the SENTINEL slot O (one zero column is
    appended to the per-observation coupling table on device), so no
    separate (C, L) mask multiply is needed. This replaces both the
    r2 dense scatter (TPU scatters serialize) and the r3-draft one-hot
    batched matmul (thousands of tiny (M,C)@(M,36) products lower to
    VPU work): one gather, full memory-bandwidth speed."""
    import numpy as np
    op = np.asarray(obs_pt)
    oc = np.asarray(obs_cam)
    om = np.asarray(obs_mask)
    O = op.shape[0]
    live = np.nonzero(om)[0]
    w_idx = np.full((num_cams, num_landmarks), O, np.int32)
    w_idx[oc[live], op[live]] = live
    return w_idx


def _resid_soa(camO, ptO, uvO):
    """SoA reprojection residual: all operands are (k, O) stacks with the
    observation axis MINOR, so every array tiles onto the TPU's (8, 128)
    register layout with ~1x padding (the AoS (O, 2, 12) layout pads
    5-42x and was the r2 profile's memory sink). Same math as
    ``_residual`` (BundleAdjuster.h:26-58 parity).

    camO: (12, O) [aa, t, fx, fy, cx, cy, k1, k2]; ptO: (3, O); uvO: (2, O).
    """
    aa, t = camO[0:3], camO[3:6]
    theta2 = aa[0] * aa[0] + aa[1] * aa[1] + aa[2] * aa[2]
    theta = jnp.sqrt(theta2 + 1e-20)
    w = aa / theta
    cos_t = jnp.cos(theta)
    sin_t = jnp.sin(theta)
    wxp = jnp.stack([w[1] * ptO[2] - w[2] * ptO[1],
                     w[2] * ptO[0] - w[0] * ptO[2],
                     w[0] * ptO[1] - w[1] * ptO[0]])
    aaxp = jnp.stack([aa[1] * ptO[2] - aa[2] * ptO[1],
                      aa[2] * ptO[0] - aa[0] * ptO[2],
                      aa[0] * ptO[1] - aa[1] * ptO[0]])
    wdp = w[0] * ptO[0] + w[1] * ptO[1] + w[2] * ptO[2]
    rot = ptO * cos_t + wxp * sin_t + w * (wdp * (1.0 - cos_t))
    rot = jnp.where(theta2 < 1e-12, ptO + aaxp, rot)
    p = rot + t
    z = jnp.where(jnp.abs(p[2]) < 1e-8, 1e-8, p[2])
    x = p[0] / z
    y = p[1] / z
    r = x * x + y * y
    d = camO[10] * r + camO[11] * r * r
    u = camO[6] * (x + d) + camO[8]
    v = camO[7] * (y + d) + camO[9]
    return jnp.stack([u - uvO[0], v - uvO[1]])


def _blocks_soa(camT, ptsT, freeT, obs_cam, obs_pt, uvT, maskO,
                huber_delta: float):
    """Residual + Jacobian stacks in SoA layout.

    Jacobians come from 15 unrolled ``jax.jvp`` basis passes through the
    elementwise SoA residual (XLA CSEs the shared primal); the result is
    Jc (12, 2, O) and Jp (3, 2, O) — observation axis minor throughout.
    """
    camO = camT[:, obs_cam]                                   # (12, O)
    ptO = ptsT[:, obs_pt]                                     # (3, O)
    O = obs_cam.shape[0]
    dtype = camT.dtype

    res = _resid_soa(camO, ptO, uvT) * maskO                  # (2, O)

    zc = jnp.zeros_like(camO)
    zp = jnp.zeros_like(ptO)
    ones = jnp.ones((O,), dtype)
    jc_rows = []
    for i in range(12):
        tan = zc.at[i].set(ones)
        _, jr = jax.jvp(lambda c: _resid_soa(c, ptO, uvT), (camO,), (tan,))
        jc_rows.append(jr)
    jp_rows = []
    for j in range(3):
        tan = zp.at[j].set(ones)
        _, jr = jax.jvp(lambda p: _resid_soa(camO, p, uvT), (ptO,), (tan,))
        jp_rows.append(jr)
    freeO = freeT[:, obs_cam]                                 # (12, O)
    Jc = jnp.stack(jc_rows) * maskO * freeO[:, None, :]       # (12, 2, O)
    Jp = jnp.stack(jp_rows) * maskO                           # (3, 2, O)

    if huber_delta > 0.0:
        e = jnp.sqrt(res[0] * res[0] + res[1] * res[1] + 1e-20)
        w = jnp.sqrt(jnp.minimum(1.0, huber_delta / e))       # (O,)
        res = res * w
        Jc = Jc * w
        Jp = Jp * w
    return res, Jc, Jp


def _normal_blocks_lm(prob: BAProblem, camT, ptsT, freeT, uvT, maskO,
                      w_idx, onehot_cam, huber_delta: float):
    """Damping-independent normal-equation pieces, SoA layout, built once
    per outer LM iteration. Scatter-free AND transpose-free:

    - camera-side reductions are (k, O) @ (O, C) one-hot MXU matmuls;
    - the coupling W AND the point-side reductions come from ONE batched
      gather through the host-precomputed sentinel (C, L) table, emitted
      directly in (C, 12, 3, L) layout so the Schur product's (n, 3L)
      operand is a free reshape.
    """
    C = camT.shape[1]
    L = ptsT.shape[1]
    res, Jc, Jp = _blocks_soa(camT, ptsT, freeT, prob.obs_cam, prob.obs_pt,
                              uvT, maskO, huber_delta)

    # Tiny contractions over the residual axis (r=2) are written as
    # explicit broadcast products: einsum("iro,jro->ijo") lowers to a
    # batch-O stream of (12,2)@(2,12) micro-dots (measured ~3x slower).
    Jc0, Jc1 = Jc[:, 0], Jc[:, 1]                             # (12, O)
    Jp0, Jp1 = Jp[:, 0], Jp[:, 1]                             # (3, O)
    jtr_c = Jc0 * res[0] + Jc1 * res[1]                       # (12, O)
    g_cT = jtr_c @ onehot_cam                                 # (12, C)
    hcc_o = (Jc0[:, None] * Jc0[None] + Jc1[:, None] * Jc1[None])
    H_cc = (hcc_o.reshape(144, -1) @ onehot_cam).reshape(12, 12, C)
    H_cc = H_cc.transpose(2, 0, 1)

    # Per-observation coupling blocks, (i, j) flattened: Y[(i,j), o].
    Y = (Jc0[:, None] * Jp0[None] + Jc1[:, None] * Jp1[None]).reshape(36, -1)
    hpp_o = (Jp0[:, None] * Jp0[None] + Jp1[:, None] * Jp1[None]).reshape(9, -1)
    gp_o = Jp0 * res[0] + Jp1 * res[1]                        # (3, O)

    # ONE sentinel-gather per camera row, batched, carrying the coupling
    # blocks AND the point-side Hpp/g_p rows (48 rows share the (C, L)
    # index table — TPU gathers are index-rate-bound at ~1.8 ns/index,
    # so the 12 extra rows ride almost free and replace a second
    # 524k-index landmark-major gather). Output (C, 48, L): the first 36
    # rows reshape (for free) to the (C, 12, 3, L) == (n, 3L) coupling
    # operand; rows 36:48 sum over C into H_pp (9, L) and g_p (3, L)
    # (each live (c, l) pair is exactly one observation, sentinel slots
    # are zero, so the camera-sum IS the per-landmark observation sum).
    src = jnp.concatenate([Y, hpp_o, gp_o], axis=0)           # (48, O)
    srcp = jnp.concatenate([src, jnp.zeros((48, 1), src.dtype)], axis=1)
    G = jax.vmap(lambda idx: srcp[:, idx])(w_idx)             # (C, 48, L)
    W = G[:, :36].reshape(C, 12, 3, L)
    pt_sum = jnp.sum(G[:, 36:], axis=0)                       # (12, L)
    H_ppL = pt_sum[:9]                                        # (9, L)
    g_pL = pt_sum[9:]                                         # (3, L)
    return g_cT, g_pL, H_cc, H_ppL, W


def _inv3x3_soa(h9):
    """Adjugate inverse of SPD 3x3 blocks stored SoA as (9, L) rows
    [a b c d e f g h i] — pure elementwise VPU math, L minor."""
    a, b, c, d, e, f, g, h, i = h9
    A = e * i - f * h
    B = c * h - b * i
    Cc = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    H = b * g - a * h
    I = a * e - b * d
    det = a * A + b * D + c * G
    det = jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    return jnp.stack([A, B, Cc, D, E, F, G, H, I]) / det


def _damped_schur_step(cam_free, blocks, lam, damping: str):
    """Damped Schur-complement solve from prebuilt SoA blocks:
    returns (d_cam (C,12), d_ptT (3,L), predicted_reduction)."""
    g_cT, g_pL, H_cc, H_ppL, W = blocks
    C = g_cT.shape[1]
    L = g_pL.shape[1]
    n = C * 12
    dtype = g_cT.dtype
    eye12 = jnp.eye(12, dtype=dtype)
    # Fixed columns get a unit diagonal so the system stays non-singular
    # and their update is exactly zero.
    fixed_c = 1.0 - cam_free
    if damping == "marquardt":
        # Ceres-style: lambda * clip(diag(H)) — scale-aware damping for
        # the badly mixed units (focal px vs radians vs world coords).
        dc = lam * jnp.clip(jnp.diagonal(H_cc, axis1=1, axis2=2), 1e-6, 1e32)
        dp = lam * jnp.clip(H_ppL[jnp.array([0, 4, 8])], 1e-6, 1e32) + 1e-8
    else:
        dc = jnp.full((C, 12), lam, dtype)
        dp = jnp.full((3, L), lam + 1e-8, dtype)
    H_cc_d = H_cc + dc[:, :, None] * eye12 + fixed_c[:, :, None] * eye12
    H_pp_d = H_ppL.at[jnp.array([0, 4, 8])].add(dp)
    Hinv = _inv3x3_soa(H_pp_d).reshape(3, 3, L)               # (3,3,L)

    # B = W Hpp^-1 in the same (C, 12, 3, L) layout — the j-contraction
    # unrolled as 3 broadcast FMAs over (C,12,L) planes (the einsum form
    # lowers to batch-L micro-dots, measured ~6x slower).
    B = (W[:, :, 0, None, :] * Hinv[0][None, None]
         + W[:, :, 1, None, :] * Hinv[1][None, None]
         + W[:, :, 2, None, :] * Hinv[2][None, None])
    Wf = W.reshape(n, 3 * L)
    Bf = B.reshape(n, 3 * L)

    S = -(Bf @ Wf.T)                                          # MXU
    ci = jnp.arange(C)
    S = S.reshape(C, 12, C, 12).at[ci, :, ci, :].add(H_cc_d).reshape(n, n)
    rhs = -(g_cT.T.reshape(-1) - Bf @ g_pL.reshape(-1))
    chol = jax.scipy.linalg.cho_factor(S)
    d_cam = jax.scipy.linalg.cho_solve(chol, rhs) * cam_free.reshape(-1)

    # Back-substitute points: dp = -Hpp^-1 (g_p + W^T dc)
    Wt_dc = (d_cam @ Wf).reshape(3, L)
    t = g_pL + Wt_dc
    d_ptT = -(Hinv[:, 0] * t[0] + Hinv[:, 1] * t[1] + Hinv[:, 2] * t[2])

    # Predicted cost reduction of the quadratic model (for the gain
    # ratio): with (H + lam D) d = -g,  pred = 0.5 (d^T (lam D) d - d^T g).
    pred = 0.5 * (jnp.sum(d_cam * d_cam * dc.reshape(-1))
                  + jnp.sum(d_ptT * d_ptT * dp)
                  - jnp.dot(d_cam, g_cT.T.reshape(-1))
                  - jnp.sum(d_ptT * g_pL))
    return d_cam.reshape(C, 12), d_ptT, pred


def _cost_soa(camT, ptsT, uvT, maskO, obs_cam, obs_pt,
              huber_delta: float) -> jnp.ndarray:
    """SoA total cost — same semantics as ``_compute_cost``."""
    res = _resid_soa(camT[:, obs_cam], ptsT[:, obs_pt], uvT) * maskO
    s = res[0] * res[0] + res[1] * res[1]
    if huber_delta > 0.0:
        d2 = huber_delta * huber_delta
        s = jnp.where(s <= d2, s, 2.0 * huber_delta * jnp.sqrt(s + 1e-20) - d2)
    return 0.5 * jnp.sum(s)


@functools.partial(jax.jit, static_argnames=("max_iters", "max_retries",
                                             "huber_delta", "damping",
                                             "schedule"))
def _solve_landmark_major(prob: BAProblem, w_idx,
                          max_iters: int, init_lambda, lambda_up,
                          lambda_down, ftol, focal_upper_bound,
                          max_retries: int, huber_delta: float,
                          damping: str, schedule: str) -> BAResult:
    C = prob.cam_params.shape[0]
    dtype = prob.cam_params.dtype
    cam_ids = jnp.arange(C, dtype=prob.obs_cam.dtype)
    # Loop-invariant obs->camera one-hot, hoisted out of the LM loop:
    # it turns the camera-side reductions into MXU matmuls.
    onehot_cam = ((prob.obs_cam[:, None] == cam_ids)
                  & prob.obs_mask[:, None]).astype(dtype)            # (O,C)
    # SoA operands: big axis minor everywhere.
    uvT = prob.obs_uv.T                                              # (2, O)
    maskO = prob.obs_mask.astype(dtype)[None, :]                     # (1, O)
    freeT = prob.cam_free.T                                          # (12, C)
    camT0 = prob.cam_params.T                                        # (12, C)
    ptsT0 = prob.points.T                                            # (3, L)

    def cost_of(camT, ptsT):
        return _cost_soa(camT, ptsT, uvT, maskO, prob.obs_cam,
                         prob.obs_pt, huber_delta)

    cost0 = cost_of(camT0, ptsT0)

    def cond(state):
        cam, pts, lam, cost, it, done, trace = state
        return (it < max_iters) & (~done)

    def body(state):
        cam, pts, lam, cost, it, done, trace = state
        blocks = _normal_blocks_lm(prob, cam, pts, freeT, uvT, maskO,
                                   w_idx, onehot_cam, huber_delta)

        def retry_cond(s):
            tries, lam_i, nu, accepted, *_ = s
            return (tries < max_retries) & (~accepted)

        def retry_body(s):
            tries, lam_i, nu, accepted, best_cam, best_pts, best_cost, lam_next = s
            d_cam, d_ptT, pred = _damped_schur_step(prob.cam_free, blocks,
                                                    lam_i, damping)
            cam_new = (cam + d_cam.T).at[6:8].min(focal_upper_bound)
            pts_new = pts + d_ptT
            new_cost = cost_of(cam_new, pts_new)
            good = (new_cost < cost) & jnp.isfinite(new_cost)
            if schedule == "nielsen":
                # Marquardt-Nielsen gain-ratio schedule (what Ceres's
                # trust-region update amounts to): accept -> shrink by
                # max(1/3, 1-(2 rho-1)^3) and reset nu; reject -> lam *= nu,
                # nu doubles. Far fewer iterations than fixed up/down
                # factors on well-behaved problems.
                rho = (cost - new_cost) / jnp.maximum(pred, 1e-20)
                shrink = jnp.maximum(jnp.asarray(1.0 / 3.0, dtype),
                                     1.0 - (2.0 * rho - 1.0) ** 3)
                lam_acc = jnp.maximum(lam_i * shrink, 1e-12)
                lam_rej = lam_i * nu
                nu_new = jnp.where(good, jnp.asarray(2.0, dtype), nu * 2.0)
            else:
                lam_acc = jnp.maximum(lam_i / lambda_down, 1e-12)
                lam_rej = lam_i * lambda_up
                nu_new = nu
            best_cam = jnp.where(good, cam_new, best_cam)
            best_pts = jnp.where(good, pts_new, best_pts)
            best_cost = jnp.where(good, new_cost, best_cost)
            return (tries + 1, jnp.where(good, lam_i, lam_rej), nu_new,
                    good, best_cam, best_pts, best_cost,
                    jnp.where(good, lam_acc, lam_rej))

        (tries, lam_used, nu, accepted, cam_new, pts_new, new_cost,
         lam_next) = jax.lax.while_loop(
            retry_cond, retry_body,
            (jnp.asarray(0, jnp.int32), lam, jnp.asarray(2.0, dtype),
             jnp.asarray(False), cam, pts, cost, lam))

        cam = jnp.where(accepted, cam_new, cam)
        pts = jnp.where(accepted, pts_new, pts)
        lam = lam_next
        rel_drop = (cost - new_cost) / jnp.maximum(cost, 1e-12)
        # a fully-failed retry round only inflates lambda and tries again
        # next outer iteration; termination is convergence or lambda blowup
        done = (accepted & (rel_drop < ftol) & (rel_drop >= 0)) | (lam > 1e10)
        cost = jnp.where(accepted, new_cost, cost)
        trace = trace.at[it].set(cost)
        return cam, pts, lam, cost, it + 1, done, trace

    lam0 = jnp.asarray(init_lambda, dtype)
    state = (camT0, ptsT0, lam0, cost0,
             jnp.asarray(0, jnp.int32), jnp.asarray(False),
             jnp.full((max_iters,), jnp.inf, dtype))
    cam, pts, lam, cost, it, _, trace = jax.lax.while_loop(cond, body, state)
    trace = jax.lax.cummin(jnp.where(jnp.isfinite(trace), trace, cost))
    return BAResult(cam_params=cam.T, points=pts.T, cost_initial=cost0,
                    cost_final=cost, iterations=it, cost_trace=trace)


def solve(prob: BAProblem, max_iters: int = 50, init_lambda: float = 1e-3,
          lambda_up: float = 4.0, lambda_down: float = 2.0,
          ftol: float = 1e-8, focal_upper_bound: float = 1000.0,
          max_retries: int = 5, huber_delta: float = 0.0,
          damping: str = "marquardt", schedule: str = "nielsen") -> BAResult:
    """Run damped LM to convergence (or max_iters) fully on device.

    Classic two-level structure: the Jacobian/normal blocks are built once
    per outer iteration; an inner fixed-budget loop retries increasing
    damping with only the (cheap) Schur solve + cost evaluation until a
    step is accepted.

    The landmark-major gather layout is built host-side here (one
    argsort over the observation table per call — microseconds next to
    the solve) and fed to the jitted core; its M dimension is bucketed
    to powers of two so shapes stay stable as tracks grow.
    """
    key = (id(prob.obs_pt), id(prob.obs_cam), id(prob.obs_mask),
           prob.cam_params.shape[0], prob.points.shape[0])
    cached = _LAYOUT_CACHE.get(key)
    if cached is None:
        w_idx = coupling_gather_table(
            prob.obs_pt, prob.obs_cam, prob.obs_mask,
            prob.cam_params.shape[0], prob.points.shape[0])
        cached = (jnp.asarray(w_idx),
                  # hold references so id()s can't be recycled
                  prob.obs_pt, prob.obs_cam, prob.obs_mask)
        if len(_LAYOUT_CACHE) > 8:
            _LAYOUT_CACHE.clear()
        _LAYOUT_CACHE[key] = cached
    w_idx = cached[0]
    return _solve_landmark_major(
        prob, w_idx,
        max_iters, init_lambda, lambda_up, lambda_down, ftol,
        focal_upper_bound, max_retries, huber_delta, damping, schedule)


# Re-solves of an unchanged observation structure (retry rounds, warm
# benches, damped refinement sweeps) reuse the host-built gather tables;
# keys are array identities, so any new observation table recomputes.
_LAYOUT_CACHE: dict = {}
