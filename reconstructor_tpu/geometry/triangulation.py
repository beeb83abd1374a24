"""Batched multi-view DLT triangulation.

Capability parity with ``SequentialReconstructor::triangulateMultiView``
(SequentialReconstructor.cpp:396-490), redesigned for TPU:

- The reference builds a (2V, 4) system per landmark and runs JacobiSVD on
  it, one landmark at a time inside the incremental loop. Here the DLT
  nullspace is found from the 4x4 normal matrix ``A^T A`` via ``eigh`` —
  mathematically the same null vector, but a fixed tiny symmetric
  eigenproblem that batches perfectly (``vmap`` over thousands of
  candidate landmarks at once) instead of a tall SVD per point.
- Variable observation counts are handled by masking rows out of the
  normal-matrix accumulation, so every landmark sees the same static
  shape.

Acceptance tests mirror the reference exactly: positive depth of the DLT
solution (cpp:427), per-view L1 reprojection error <= max_projection_error
(cpp:437-452) and *all* pairwise triangulation angles >= the minimum
(cpp:455-477; note the reference rejects if ANY pair is below threshold at
creation time).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from reconstructor_tpu.geometry import camera as cam
from reconstructor_tpu.geometry import se3

# Matches the reference's hand-typed pi (SequentialReconstructor.cpp:833).
_REF_PI = 3.1415


def dlt_rows(pose: jnp.ndarray, intr: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Two DLT rows for one observation.

    ``pose``: (..., 4, 4); ``intr``: (..., 6); ``uv``: (..., 2).
    Rows are x*P3 - P1 and y*P3 - P2 with P the 3x4 extrinsics and (x, y)
    the unprojected (undistorted, normalized) feature coordinates —
    identical to SequentialReconstructor.cpp:403-421.
    """
    P = pose[..., :3, :4]
    xy1 = cam.unproject(intr, uv[..., None, :])[..., 0, :]  # (..., 3)
    r0 = xy1[..., 0:1] * P[..., 2, :] - P[..., 0, :]
    r1 = xy1[..., 1:2] * P[..., 2, :] - P[..., 1, :]
    return jnp.stack([r0, r1], axis=-2)  # (..., 2, 4)


def triangulate(poses: jnp.ndarray, intrs: jnp.ndarray, uvs: jnp.ndarray,
                mask: jnp.ndarray) -> jnp.ndarray:
    """DLT-triangulate one point from up to V observations.

    poses (V, 4, 4), intrs (V, 6), uvs (V, 2), mask (V,) bool.
    Returns homogeneous-normalized world point (3,).
    """
    rows = dlt_rows(poses, intrs, uvs)          # (V, 2, 4)
    rows = rows * mask[:, None, None]
    A = rows.reshape(-1, 4)
    # Nullspace of A == eigenvector of A^T A with smallest eigenvalue.
    AtA = A.T @ A
    _, vecs = jnp.linalg.eigh(AtA)
    h = vecs[:, 0]
    return h[:3] / jnp.where(jnp.abs(h[3]) < 1e-12, jnp.sign(h[3]) * 1e-12 + 1e-12, h[3])


# Batched over landmarks: poses (N, V, 4, 4), intrs (N, V, 6), uvs (N, V, 2),
# mask (N, V) -> (N, 3).
triangulate_batch = jax.vmap(triangulate)


def triangulation_angles_deg(points: jnp.ndarray, centers: jnp.ndarray) -> jnp.ndarray:
    """Pairwise ray angles (degrees) between observing cameras.

    ``points``: (N, 3); ``centers``: (N, V, 3) camera centers per
    observation. Returns (N, V, V) angle matrix. The degree conversion uses
    the reference's pi = 3.1415 (SequentialReconstructor.cpp:833) so
    thresholding at 1.0 deg selects the same landmarks.
    """
    rays = points[:, None, :] - centers                     # (N, V, 3)
    norms = jnp.linalg.norm(rays, axis=-1)                  # (N, V)
    dots = jnp.einsum("nvc,nwc->nvw", rays, rays)
    cos = dots / jnp.maximum(norms[:, :, None] * norms[:, None, :], 1e-12)
    ang = jnp.arccos(jnp.clip(cos, -1.0, 1.0))
    return 180.0 * ang / _REF_PI


def triangulate_and_validate(poses: jnp.ndarray, intrs: jnp.ndarray,
                             uvs: jnp.ndarray, mask: jnp.ndarray,
                             max_projection_error: float,
                             min_triangulation_angle: float):
    """Batched triangulation + the reference's creation-time acceptance.

    Args mirror :func:`triangulate_batch` (leading N batch dim). Returns
    ``(points (N,3), valid (N,))`` where ``valid`` requires:
      * finite, positive world-z DLT solution (cpp:427 quirk: the check is
        on world z, valid because camera 0 is gauge-fixed at identity),
      * every masked observation reprojects within the L1 gate,
      * every pair of observations subtends at least the minimum angle.
    """
    points = triangulate_batch(poses, intrs, uvs, mask)     # (N, 3)

    pts_cam = jnp.einsum("nvij,nj->nvi", poses[..., :3, :3], points) + poses[..., :3, 3]
    err = cam.reprojection_error_l1(intrs, pts_cam[..., None, :], uvs[..., None, :])[..., 0]
    err_ok = jnp.all(jnp.where(mask, err <= max_projection_error, True), axis=-1)

    centers = se3.camera_center(poses)                      # (N, V, 3)
    ang = triangulation_angles_deg(points, centers)         # (N, V, V)
    pair_mask = mask[:, :, None] & mask[:, None, :]
    pair_mask &= ~jnp.eye(mask.shape[-1], dtype=bool)[None]
    ang_ok = jnp.all(jnp.where(pair_mask, ang >= min_triangulation_angle, True), axis=(-1, -2))

    finite = jnp.all(jnp.isfinite(points), axis=-1)
    depth_ok = points[:, 2] > 0
    valid = finite & depth_ok & err_ok & ang_ok & (jnp.sum(mask, axis=-1) >= 2)
    return points, valid
