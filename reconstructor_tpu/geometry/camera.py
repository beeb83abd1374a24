"""Pinhole camera with the reference's (non-standard) radial distortion.

Parity target: reference ``Camera.h``. Intrinsics are a 6-vector
``[fx, fy, cx, cy, k1, k2]`` (the Ceres packing order,
BundleAdjuster.cpp:38-43). Two quirks of the reference are reproduced
deliberately because the whole quality envelope (4 px L1 gates, BA
residuals) is defined in terms of them:

1. Distortion is *additive* and *shared* between x and y
   (Camera.h:64-72): ``d = k1*r + k2*r^2`` with ``r = x^2 + y^2`` and then
   ``x += d; y += d`` — not the usual multiplicative ``x *= (1 + ...)``.
2. Principal point is integer-floored ``width // 2`` (Camera.h:24 with int
   division).

Reprojection error is the L1 sum ``|du| + |dv|``
(SequentialReconstructor.cpp:852-867).
"""

from __future__ import annotations

import jax.numpy as jnp

FX, FY, CX, CY, K1, K2 = 0, 1, 2, 3, 4, 5


def make_intrinsics(height, width, focal_px=None, focal_factor: float = 1.2,
                    use_35mm_prior: bool = False,
                    dtype=jnp.float32) -> jnp.ndarray:
    """Build a [fx, fy, cx, cy, k1, k2] vector.

    - known focal: Camera.h:18-27
    - colmap-style prior: f = focal_factor * max(h, w) (Camera.h:45-54)
    - 35mm-equivalent prior (use_35mm_prior): f = 50mm scaled by the
      sensor/image diagonal ratio (Camera.h:30-42)
    """
    if focal_px is not None:
        fx = fy = float(focal_px)
    elif use_35mm_prior:
        import math
        diag35mm = 36.0 ** 2 + 24.0 ** 2
        diag_px = float(width) ** 2 + float(height) ** 2
        fx = fy = 50.0 * math.sqrt(diag_px / diag35mm)
    else:
        fx = fy = focal_factor * float(max(height, width))
    cx = float(int(width) // 2)
    cy = float(int(height) // 2)
    return jnp.array([fx, fy, cx, cy, 0.0, 0.0], dtype=dtype)


def distort(xy: jnp.ndarray, intr: jnp.ndarray) -> jnp.ndarray:
    """Apply the reference's additive radial distortion on the z=1 plane."""
    r = jnp.sum(xy * xy, axis=-1, keepdims=True)
    d = intr[..., None, K1:K1 + 1] * r + intr[..., None, K2:K2 + 1] * r * r
    return xy + d


def project(intr: jnp.ndarray, pts_cam: jnp.ndarray) -> jnp.ndarray:
    """Camera-frame 3D points -> pixel coords (Camera.h:59-76).

    ``intr``: (..., 6); ``pts_cam``: (..., N, 3) -> (..., N, 2).
    No cheirality handling here; callers gate on z > 0 themselves, exactly
    like the reference.
    """
    z = pts_cam[..., 2:3]
    xy = pts_cam[..., :2] / z
    xy = distort(xy, intr)
    f = jnp.stack([intr[..., FX], intr[..., FY]], axis=-1)[..., None, :]
    c = jnp.stack([intr[..., CX], intr[..., CY]], axis=-1)[..., None, :]
    return xy * f + c


def unproject(intr: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Pixels -> z=1 camera-plane points (Camera.h:79-93).

    Uses the reference's one-step approximate undistortion (subtract the
    distortion evaluated at the distorted point).
    """
    f = jnp.stack([intr[..., FX], intr[..., FY]], axis=-1)[..., None, :]
    c = jnp.stack([intr[..., CX], intr[..., CY]], axis=-1)[..., None, :]
    xy = (uv - c) / f
    r = jnp.sum(xy * xy, axis=-1, keepdims=True)
    d = intr[..., None, K1:K1 + 1] * r + intr[..., None, K2:K2 + 1] * r * r
    xy = xy - d
    return jnp.concatenate([xy, jnp.ones_like(xy[..., :1])], axis=-1)


def intrinsic_matrix(intr: jnp.ndarray) -> jnp.ndarray:
    """(..., 6) -> (..., 3, 3) K matrix (Camera.h:96-106)."""
    batch = intr.shape[:-1]
    K = jnp.zeros(batch + (3, 3), dtype=intr.dtype)
    K = K.at[..., 0, 0].set(intr[..., FX])
    K = K.at[..., 1, 1].set(intr[..., FY])
    K = K.at[..., 0, 2].set(intr[..., CX])
    K = K.at[..., 1, 2].set(intr[..., CY])
    K = K.at[..., 2, 2].set(1.0)
    return K


def reprojection_error_l1(intr: jnp.ndarray, pts_cam: jnp.ndarray,
                          uv_observed: jnp.ndarray) -> jnp.ndarray:
    """|du| + |dv| per point (SequentialReconstructor.cpp:852-867)."""
    uv = project(intr, pts_cam)
    return jnp.sum(jnp.abs(uv - uv_observed), axis=-1)


def focal_mm_to_px(focal_mm: float, img_dim: float, fov_degrees: float) -> float:
    """35mm-style focal conversion (utils.cpp:152-163, incl. its pi=3.1415)."""
    fov_radians = fov_degrees * 3.1415 / 180.0
    return img_dim / (2.0 * jnp.tan(fov_radians / 2.0))
