"""SE(3) / SO(3) utilities, batched and jit-friendly.

The reference stores world->camera rigid transforms as 4x4 Eigen matrices
(``imgIdx2camPose``) and converts to/from angle-axis for Ceres
(BundleAdjuster.cpp:49-57, 160-174). Here poses are plain ``(4, 4)`` or
``(..., 4, 4)`` arrays plus angle-axis 6-vectors ``[aa(3), t(3)]`` used as
the BA parameterization. All ops are shape-polymorphic over leading batch
dims and safe at the small-angle / pi singularities (needed because they sit
inside jitted LM iterations where autodiff passes through them).

Convention (same as reference): ``p_cam = R @ p_world + t``; camera center
``c = -R^T t`` (utils.cpp:265).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix of a 3-vector (batched)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zeros = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zeros, -wz, wy], axis=-1),
            jnp.stack([wz, zeros, -wx], axis=-1),
            jnp.stack([-wy, wx, zeros], axis=-1),
        ],
        axis=-2,
    )


def angle_axis_to_rotation(aa: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula, Taylor-safe near zero.

    R = I + sin(t)/t * W + (1-cos(t))/t^2 * W^2, W = hat(aa).
    """
    theta2 = jnp.sum(aa * aa, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS)
    # Taylor fallbacks keep gradients finite at theta -> 0.
    small = theta2 < 1e-8
    sin_t = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    cos_t = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / (theta2 + _EPS))
    W = hat(aa)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=aa.dtype), W.shape)
    return eye + sin_t[..., None, None] * W + cos_t[..., None, None] * W2


def rotation_to_angle_axis(R: jnp.ndarray) -> jnp.ndarray:
    """Inverse Rodrigues via quaternion extraction (robust near 0 and pi)."""
    q = rotation_to_quaternion(R)
    return quaternion_to_angle_axis(q)


def rotation_to_quaternion(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> unit quaternion [w, x, y, z], branch-free.

    Uses the standard four-candidate construction and selects the best-
    conditioned one with ``where`` so it vmaps/jits cleanly.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    tr = m00 + m11 + m22
    # Four candidate constructions; qi built from the largest diagonal term.
    qw0 = jnp.sqrt(jnp.maximum(1.0 + tr, _EPS)) / 2.0
    q0 = jnp.stack([qw0, (m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0), (m10 - m01) / (4 * qw0)], axis=-1)

    s1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, _EPS)) * 2
    q1 = jnp.stack([(m21 - m12) / s1, s1 / 4, (m01 + m10) / s1, (m02 + m20) / s1], axis=-1)

    s2 = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, _EPS)) * 2
    q2 = jnp.stack([(m02 - m20) / s2, (m01 + m10) / s2, s2 / 4, (m12 + m21) / s2], axis=-1)

    s3 = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, _EPS)) * 2
    q3 = jnp.stack([(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3, s3 / 4], axis=-1)

    cond0 = tr > 0
    cond1 = (m00 > m11) & (m00 > m22)
    cond2 = m11 > m22
    q = jnp.where(
        cond0[..., None], q0,
        jnp.where(cond1[..., None], q1, jnp.where(cond2[..., None], q2, q3)),
    )
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # Canonicalize sign (w >= 0) so angle <= pi.
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def quaternion_to_angle_axis(q: jnp.ndarray) -> jnp.ndarray:
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    xyz = q[..., 1:]
    sin_half = jnp.linalg.norm(xyz, axis=-1)
    angle = 2.0 * jnp.arctan2(sin_half, w)
    scale = jnp.where(sin_half < 1e-8, 2.0, angle / (sin_half + _EPS))
    return xyz * scale[..., None]


def make_pose(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Assemble (..., 4, 4) world->camera pose from R and t."""
    batch = R.shape[:-2]
    T = jnp.zeros(batch + (4, 4), dtype=R.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def pose_to_params(T: jnp.ndarray) -> jnp.ndarray:
    """(..., 4, 4) pose -> (..., 6) [angle-axis, t] (BA parameterization)."""
    aa = rotation_to_angle_axis(T[..., :3, :3])
    return jnp.concatenate([aa, T[..., :3, 3]], axis=-1)


def params_to_pose(p: jnp.ndarray) -> jnp.ndarray:
    """(..., 6) [angle-axis, t] -> (..., 4, 4) pose."""
    return make_pose(angle_axis_to_rotation(p[..., :3]), p[..., 3:6])


def transform_points(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply world->camera transform: p_cam = R p + t.

    ``T``: (..., 4, 4) (or (...,6) pose params), ``pts``: (..., N, 3).
    """
    if T.shape[-1] == 6:
        R = angle_axis_to_rotation(T[..., :3])
        t = T[..., 3:6]
    else:
        R, t = T[..., :3, :3], T[..., :3, 3]
    return pts @ jnp.swapaxes(R, -1, -2) + t[..., None, :]


def rotate_points_aa(aa: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Rotate points directly by an angle-axis vector (no matrix build).

    Equivalent of ceres::AngleAxisRotatePoint (BundleAdjuster.h:34); used in
    the BA residual so autodiff sees the compact Rodrigues form:
        p' = p cos(t) + (w x p) sin(t) + w (w . p)(1 - cos(t)).
    ``aa``: (..., 3); ``pts``: (..., 3) with matching batch dims.
    """
    theta2 = jnp.sum(aa * aa, axis=-1, keepdims=True)
    theta = jnp.sqrt(theta2 + _EPS)
    w = aa / theta
    cos_t = jnp.cos(theta)
    sin_t = jnp.sin(theta)
    w_cross_p = jnp.cross(w, pts)
    w_dot_p = jnp.sum(w * pts, axis=-1, keepdims=True)
    rotated = pts * cos_t + w_cross_p * sin_t + w * w_dot_p * (1.0 - cos_t)
    # Taylor for tiny angles: p + aa x p.
    small = theta2 < 1e-12
    return jnp.where(small, pts + jnp.cross(aa, pts), rotated)


def camera_center(T: jnp.ndarray) -> jnp.ndarray:
    """Camera center in world frame: c = -R^T t (utils.cpp:265)."""
    R, t = T[..., :3, :3], T[..., :3, 3]
    return -jnp.einsum("...ji,...j->...i", R, t)


def invert_pose(T: jnp.ndarray) -> jnp.ndarray:
    R, t = T[..., :3, :3], T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return make_pose(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def compose(T1: jnp.ndarray, T2: jnp.ndarray) -> jnp.ndarray:
    """T1 @ T2 (apply T2 first)."""
    return T1 @ T2


def project_to_so3(M: jnp.ndarray) -> jnp.ndarray:
    """Nearest rotation matrix to M via SVD (det-corrected)."""
    U, _, Vt = jnp.linalg.svd(M)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.ones(M.shape[:-2] + (3,), dtype=M.dtype).at[..., 2].set(det)
    return (U * D[..., None, :]) @ Vt
