"""Epipolar geometry: fundamental/essential estimation and pose recovery.

Capability parity with the reference's ``GeometricFilter``
(GeometricFilter.cpp:10-61, backed by OpenCV RANSAC) and
``essentialMatToPose``/``cv::recoverPose``
(SequentialReconstructor.cpp:284-317), rebuilt as batched fixed-shape JAX:

- 8-point linear estimation with Hartley normalization as the minimal
  solver, run as a ``vmap`` over thousands of hypotheses at once
  (see geometry.ransac for why the fixed-budget design replaces OpenCV's
  adaptive loop).
- Sampson distance scoring over all correspondences per hypothesis — one
  (H, N) batched computation.
- Essential-matrix pose recovery testing all four (R, t) decompositions by
  batched two-view triangulation and cheirality counting, identical in
  effect to cv::recoverPose.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from reconstructor_tpu.geometry import camera as cam
from reconstructor_tpu.geometry import se3, ransac, triangulation
from reconstructor_tpu.geometry.linalg import smallest_eigvec, project_rank2


def _normalize_points(pts: jnp.ndarray):
    """Hartley normalization: zero centroid, mean distance sqrt(2).

    pts: (N, 2). Returns (pts_norm, T 3x3) with p_norm = T @ p_h.
    """
    centroid = jnp.mean(pts, axis=0)
    d = jnp.linalg.norm(pts - centroid, axis=-1)
    scale = jnp.sqrt(2.0) / jnp.maximum(jnp.mean(d), 1e-12)
    T = jnp.array([[1.0, 0.0, -centroid[0]],
                   [0.0, 1.0, -centroid[1]],
                   [0.0, 0.0, 1.0]], dtype=pts.dtype)
    T = T.at[0].multiply(scale).at[1].multiply(scale).at[2, 2].set(1.0)
    pts_n = (pts - centroid) * scale
    return pts_n, T


def _eight_point(pts1: jnp.ndarray, pts2: jnp.ndarray,
                 rank2_project: bool, essential: bool) -> jnp.ndarray:
    """Linear 8-point solve for F (or E) from (S, 2) correspondences.

    Returns a 3x3 matrix such that x2^T M x1 = 0. Uses the nullspace of the
    9x9 normal matrix (eigh) — batches far better on TPU than a tall SVD.
    """
    p1n, T1 = _normalize_points(pts1)
    p2n, T2 = _normalize_points(pts2)
    x1, y1 = p1n[:, 0], p1n[:, 1]
    x2, y2 = p2n[:, 0], p2n[:, 1]
    ones = jnp.ones_like(x1)
    A = jnp.stack([x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, ones], axis=-1)
    M = smallest_eigvec(A.T @ A).reshape(3, 3)
    if rank2_project:
        if essential:
            M = T2.T @ M @ T1
            U, S, Vt = jnp.linalg.svd(M)
            s = (S[0] + S[1]) / 2.0
            S = jnp.array([s, s, 0.0], dtype=M.dtype)
            M = (U * S[None, :]) @ Vt
        else:
            # SVD-free truncation (hot path: vmapped over every RANSAC
            # hypothesis of every pair in the F-gate). Projecting in the
            # *normalized* frame (Hartley's formulation) keeps the
            # singular values balanced — forming M^T M on the
            # denormalized F (entries spanning ~1e-6..1) would lose the
            # small sigma3 to f32 squaring. Rank <= 2 survives the
            # invertible denormalization.
            M = project_rank2(M)
            M = T2.T @ M @ T1
    else:
        M = T2.T @ M @ T1
    return M / jnp.maximum(jnp.linalg.norm(M), 1e-12)


def sampson_distance(M: jnp.ndarray, pts1: jnp.ndarray, pts2: jnp.ndarray) -> jnp.ndarray:
    """First-order geometric (Sampson) distance, (N,) given (N, 2) points."""
    p1 = jnp.concatenate([pts1, jnp.ones_like(pts1[:, :1])], axis=-1)
    p2 = jnp.concatenate([pts2, jnp.ones_like(pts2[:, :1])], axis=-1)
    Mp1 = p1 @ M.T          # (N, 3) = M @ p1
    Mtp2 = p2 @ M            # (N, 3) = M^T @ p2
    e = jnp.sum(p2 * Mp1, axis=-1)
    denom = Mp1[:, 0] ** 2 + Mp1[:, 1] ** 2 + Mtp2[:, 0] ** 2 + Mtp2[:, 1] ** 2
    return (e * e) / jnp.maximum(denom, 1e-12)


def estimate_fundamental(key: jax.Array, pts1: jnp.ndarray, pts2: jnp.ndarray,
                         mask: jnp.ndarray, thresh_px: float = 3.0,
                         num_hypotheses: int = 2048):
    """RANSAC fundamental matrix (GeometricFilter.cpp:39-61 equivalent).

    Returns (F, inlier_mask, num_inliers). Threshold compares the Sampson
    distance against thresh_px^2 (squared-distance form).
    """
    solver = lambda p1, p2: _eight_point(p1, p2, rank2_project=True, essential=False)
    F, inl, cnt = ransac.ransac(
        key, (pts1, pts2), mask, solver, sampson_distance,
        sample_size=8, num_hypotheses=num_hypotheses,
        inlier_thresh=thresh_px * thresh_px)
    F, inl, cnt = _refit_if_better(F, inl, cnt, pts1, pts2, mask,
                                   thresh_px * thresh_px, essential=False)
    return F, inl, cnt


def _refit_if_better(M_best, inl_best, cnt_best, pts1, pts2, mask,
                     thresh, essential: bool):
    """All-inlier least-squares refit, kept only if it scores at least as
    many inliers as the RANSAC-best minimal model.

    The guard matters numerically: the refit's 9x9 normal-matrix eigh in
    f32 cannot always resolve a nullspace whose eigenvalue is ~1e-7 of the
    spectrum (hundreds of near-perfect inlier rows), and can return a
    *worse* model than the clean 8-point minimal solve. Model selection by
    inlier count makes the refit strictly non-harmful.
    """
    M_refit = _refit(pts1, pts2, inl_best, essential=essential)
    d = sampson_distance(M_refit, pts1, pts2)
    inl_refit = (d < thresh) & mask
    cnt_refit = jnp.sum(inl_refit)
    better = cnt_refit >= cnt_best
    M = jnp.where(better, M_refit, M_best)
    inl = jnp.where(better, inl_refit, inl_best)
    return M, inl, jnp.maximum(cnt_refit, cnt_best)


def _refit(pts1, pts2, mask, essential: bool) -> jnp.ndarray:
    """Masked least-squares 8-point refit over all inliers."""
    w = mask.astype(pts1.dtype)[:, None]
    # Weighted Hartley normalization.
    wsum = jnp.maximum(jnp.sum(w), 1.0)
    c1 = jnp.sum(pts1 * w, axis=0) / wsum
    c2 = jnp.sum(pts2 * w, axis=0) / wsum
    s1 = jnp.sqrt(2.0) / jnp.maximum(jnp.sum(jnp.linalg.norm(pts1 - c1, axis=-1) * w[:, 0]) / wsum, 1e-12)
    s2 = jnp.sqrt(2.0) / jnp.maximum(jnp.sum(jnp.linalg.norm(pts2 - c2, axis=-1) * w[:, 0]) / wsum, 1e-12)
    p1n = (pts1 - c1) * s1
    p2n = (pts2 - c2) * s2
    x1, y1 = p1n[:, 0], p1n[:, 1]
    x2, y2 = p2n[:, 0], p2n[:, 1]
    ones = jnp.ones_like(x1)
    A = jnp.stack([x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, ones], axis=-1) * w
    M = smallest_eigvec(A.T @ A).reshape(3, 3)
    T1 = jnp.array([[s1, 0, -s1 * c1[0]], [0, s1, -s1 * c1[1]], [0, 0, 1]], dtype=pts1.dtype)
    T2 = jnp.array([[s2, 0, -s2 * c2[0]], [0, s2, -s2 * c2[1]], [0, 0, 1]], dtype=pts1.dtype)
    if essential:
        M = T2.T @ M @ T1
        U, S, Vt = jnp.linalg.svd(M)
        s = (S[0] + S[1]) / 2.0
        S = jnp.array([s, s, 0.0], dtype=M.dtype)
        M = (U * S[None, :]) @ Vt
    else:
        # rank-2 projection in the normalized frame (see _eight_point)
        M = project_rank2(M)
        M = T2.T @ M @ T1
    return M / jnp.maximum(jnp.linalg.norm(M), 1e-12)


def estimate_essential(key: jax.Array, uv1: jnp.ndarray, uv2: jnp.ndarray,
                       intr1: jnp.ndarray, intr2: jnp.ndarray,
                       mask: jnp.ndarray, thresh_px: float = 1.0,
                       num_hypotheses: int = 2048):
    """RANSAC essential matrix in normalized camera coordinates
    (GeometricFilter.cpp:10-37 equivalent).

    The pixel threshold is converted to the normalized-plane scale by the
    mean focal length, matching OpenCV's internal convention.
    """
    x1 = cam.unproject(intr1, uv1)[:, :2]
    x2 = cam.unproject(intr2, uv2)[:, :2]
    f_mean = (intr1[cam.FX] + intr1[cam.FY] + intr2[cam.FX] + intr2[cam.FY]) / 4.0
    thresh = (thresh_px / f_mean) ** 2

    solver = lambda p1, p2: _eight_point(p1, p2, rank2_project=True, essential=True)
    E, inl, cnt = ransac.ransac(
        key, (x1, x2), mask, solver, sampson_distance,
        sample_size=8, num_hypotheses=num_hypotheses, inlier_thresh=thresh)
    E, inl, cnt = _refit_if_better(E, inl, cnt, x1, x2, mask, thresh,
                                   essential=True)
    return E, inl, cnt


def two_view_depths(R: jnp.ndarray, t: jnp.ndarray, x1h: jnp.ndarray,
                    x2h: jnp.ndarray):
    """Closed-form two-view depths (no SVD): X = z1 x1 in cam1 and
    z2 x2 = R (z1 x1) + t. Crossing with x2 eliminates z2:
        z1 = -(x2 x t) . (x2 x R x1) / |x2 x R x1|^2.
    x1h/x2h: (N, 3) homogeneous normalized coords. Returns (z1, z2).
    """
    Rx1 = x1h @ R.T
    c_rx = jnp.cross(x2h, Rx1)
    c_t = jnp.cross(x2h, jnp.broadcast_to(t, x2h.shape))
    z1 = -jnp.sum(c_t * c_rx, axis=-1) / jnp.maximum(
        jnp.sum(c_rx * c_rx, axis=-1), 1e-12)
    z2 = jnp.sum((z1[:, None] * Rx1 + t) * x2h, axis=-1) / jnp.maximum(
        jnp.sum(x2h * x2h, axis=-1), 1e-12)
    return z1, z2


def pose_support(E: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray,
                 sampson_thresh: float, mask: jnp.ndarray = None):
    """Cheirality-aware residual for E-RANSAC scoring.

    Near-planar scenes admit a whole family of epipolar-consistent E's
    (the fountain facade triggers this): Sampson distance alone cannot
    tell family members apart, but only the true (R, t) puts (nearly) all
    correspondences in front of both cameras. For each of E's four
    decompositions this computes closed-form depths and returns, for the
    best candidate, a residual that is the Sampson distance where
    cheirality holds and +inf where it fails — plugging straight into the
    generic RANSAC argmax.
    """
    x1h = jnp.concatenate([x1, jnp.ones_like(x1[:, :1])], axis=-1)
    x2h = jnp.concatenate([x2, jnp.ones_like(x2[:, :1])], axis=-1)
    d = sampson_distance(E, x1, x2)
    candidates = decompose_essential(E)

    def cand_residual(Rt):
        R, t = Rt
        z1, z2 = two_view_depths(R, t, x1h, x2h)
        ok = (z1 > 0) & (z2 > 0)
        return jnp.where(ok, d, jnp.inf)

    res = jnp.stack([cand_residual(c) for c in candidates])   # (4, N)
    ok = res < sampson_thresh
    if mask is not None:
        ok = ok & mask[None, :]
    support = jnp.sum(ok, axis=1)
    best = jnp.argmax(support)
    return res[best], best


def _four_point_homography(p1: jnp.ndarray, p2: jnp.ndarray) -> jnp.ndarray:
    """Minimal DLT homography from (S>=4, 2) correspondences, normalized."""
    p1n, T1 = _normalize_points(p1)
    p2n, T2 = _normalize_points(p2)
    x1, y1 = p1n[:, 0], p1n[:, 1]
    x2, y2 = p2n[:, 0], p2n[:, 1]
    ones = jnp.ones_like(x1)
    zeros = jnp.zeros_like(x1)
    rows_a = jnp.stack([-x1, -y1, -ones, zeros, zeros, zeros,
                        x2 * x1, x2 * y1, x2], axis=-1)
    rows_b = jnp.stack([zeros, zeros, zeros, -x1, -y1, -ones,
                        y2 * x1, y2 * y1, y2], axis=-1)
    A = jnp.concatenate([rows_a, rows_b], axis=0)
    H = smallest_eigvec(A.T @ A).reshape(3, 3)
    H = jnp.linalg.inv(T2) @ H @ T1
    return H / jnp.where(jnp.abs(H[2, 2]) < 1e-12, 1e-12, H[2, 2])


def homography_transfer_error(H: jnp.ndarray, p1: jnp.ndarray,
                              p2: jnp.ndarray) -> jnp.ndarray:
    """Squared forward transfer distance |x2 - H x1|^2, (N,)."""
    p1h = jnp.concatenate([p1, jnp.ones_like(p1[:, :1])], axis=-1)
    q = p1h @ H.T
    q = q[:, :2] / jnp.where(jnp.abs(q[:, 2:]) < 1e-12, 1e-12, q[:, 2:])
    return jnp.sum((q - p2) ** 2, axis=-1)


def decompose_homography(H: jnp.ndarray):
    """Calibrated homography -> 4 (R, unit t) candidates (Faugeras/
    Ma-Soatto Algorithm 5.2). H maps normalized coords cam1 -> cam2 as
    H = R + t n^T / d; candidates differ by plane-normal sign ambiguity.
    Degenerate (pure-rotation) cases simply yield repeated candidates.
    """
    U, lam, Vt = jnp.linalg.svd(H)
    Hn = H / jnp.maximum(lam[1], 1e-12)
    # re-decompose the normalized H (singular values lam/lam[1])
    l1 = lam[0] / jnp.maximum(lam[1], 1e-12)
    l3 = lam[2] / jnp.maximum(lam[1], 1e-12)
    v1 = Vt[0]
    v2 = Vt[1]
    v3 = Vt[2]
    denom = jnp.sqrt(jnp.maximum(l1 * l1 - l3 * l3, 1e-12))
    a = jnp.sqrt(jnp.maximum(1.0 - l3 * l3, 0.0))
    b = jnp.sqrt(jnp.maximum(l1 * l1 - 1.0, 0.0))
    u1 = (a * v1 + b * v3) / denom
    u2 = (a * v1 - b * v3) / denom

    def solution(Hn, u):
        U1 = jnp.stack([v2, u, jnp.cross(v2, u)], axis=1)
        Hv2 = Hn @ v2
        Hu = Hn @ u
        W1 = jnp.stack([Hv2, Hu, jnp.cross(Hv2, Hu)], axis=1)
        R = W1 @ U1.T
        n = jnp.cross(v2, u)
        t = (Hn - R) @ n
        tn = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
        return R, tn

    # the sign ambiguity H ~ -H gives the other two physical solutions
    sols = [solution(Hn, u1), solution(Hn, u2),
            solution(-Hn, u1), solution(-Hn, u2)]
    return sols


def estimate_relative_pose(key: jax.Array, uv1: jnp.ndarray, uv2: jnp.ndarray,
                           intr1: jnp.ndarray, intr2: jnp.ndarray,
                           mask: jnp.ndarray, thresh_px: float = 1.0,
                           num_hypotheses: int = 2048, refine_iters: int = 10):
    """Initial-pair relative pose, planar-safe.

    RANSAC over 8-point essential hypotheses scored by *pose support*
    (epipolar fit + cheirality, see pose_support), then Gauss-Newton
    refinement on the essential manifold. Functionally replaces the
    reference's cv::findEssentialMat + cv::recoverPose
    (GeometricFilter.cpp:26, SequentialReconstructor.cpp:303) and is
    robust where the 8-point + recoverPose pair is not.

    Returns (pose (4,4) world->cam2 with cam1 at identity, E, inlier
    mask, inlier count).
    """
    x1 = cam.unproject(intr1, uv1)[:, :2]
    x2 = cam.unproject(intr2, uv2)[:, :2]
    f_mean = (intr1[cam.FX] + intr1[cam.FY] + intr2[cam.FX] + intr2[cam.FY]) / 4.0
    thresh = (thresh_px / f_mean) ** 2

    key_e, key_h = jax.random.split(key)
    solver = lambda p1, p2: _eight_point(p1, p2, rank2_project=True, essential=True)
    residual = lambda E, p1, p2: pose_support(E, p1, p2, thresh, mask)[0]
    E, _, _ = ransac.ransac(
        key_e, (x1, x2), mask, solver, residual,
        sample_size=8, num_hypotheses=num_hypotheses, inlier_thresh=thresh)

    # Homography hypotheses cover the planar-degenerate regime where
    # 8-point E sampling rarely lands in the true pose family (dominant
    # plane + small off-plane minority — e.g. a building facade).
    H, _, _ = ransac.ransac(
        key_h, (x1, x2), mask,
        lambda p1, p2: _four_point_homography(p1, p2),
        lambda Hm, p1, p2: homography_transfer_error(Hm, p1, p2),
        sample_size=4, num_hypotheses=num_hypotheses, inlier_thresh=thresh)

    # pool all pose candidates: 4 from E, 4 from H decomposition
    cands = list(decompose_essential(E)) + list(decompose_homography(H))
    x1h = jnp.concatenate([x1, jnp.ones_like(x1[:, :1])], axis=-1)
    x2h = jnp.concatenate([x2, jnp.ones_like(x2[:, :1])], axis=-1)

    def cand_metrics(Rt):
        R, t = Rt
        R = se3.project_to_so3(R)
        t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
        Ec = essential_from_pose(R, t)
        d = sampson_distance(Ec, x1, x2)
        z1, z2 = two_view_depths(R, t, x1h, x2h)
        ok = (d < thresh) & (z1 > 0) & (z2 > 0) & mask
        return jnp.sum(ok), se3.make_pose(R, t), jnp.where(
            (z1 > 0) & (z2 > 0), d, jnp.inf)

    counts, poses, res_all = zip(*(cand_metrics(c) for c in cands))
    counts = jnp.stack(counts)
    poses = jnp.stack(poses)
    res_all = jnp.stack(res_all)
    best = jnp.argmax(counts)
    pose0 = poses[best]
    inl = (res_all[best] < thresh) & mask

    w = inl.astype(x1.dtype)
    pose = refine_relative_pose(pose0, x1, x2, w, num_iters=refine_iters)
    E_ref = essential_from_pose(pose[:3, :3], pose[:3, 3])
    res_ref, _ = pose_support(E_ref, x1, x2, thresh, mask)
    inl_ref = (res_ref < thresh) & mask
    better = jnp.sum(inl_ref) >= jnp.sum(inl)
    E0 = essential_from_pose(pose0[:3, :3], pose0[:3, 3])
    pose = jnp.where(better, pose, pose0)
    E_out = jnp.where(better, E_ref, E0)
    inl_out = jnp.where(better, inl_ref, inl)
    return pose, E_out, inl_out, jnp.sum(inl_out)


def decompose_essential(E: jnp.ndarray):
    """E -> four candidate (R, t) with det(R)=+1, |t|=1."""
    U, _, Vt = jnp.linalg.svd(E)
    # Keep rotations proper.
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], dtype=E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]
    return (R1, t), (R1, -t), (R2, t), (R2, -t)


def essential_from_pose(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """E = [t]_x R, Frobenius-normalized."""
    E = se3.hat(t) @ R
    return E / jnp.maximum(jnp.linalg.norm(E), 1e-12)


def refine_relative_pose(pose: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray,
                         weights: jnp.ndarray, num_iters: int = 10) -> jnp.ndarray:
    """Gauss-Newton refinement of a relative pose on the essential manifold.

    Minimizes the weighted Sampson distance of E(R, t) over inliers,
    parameterized by [angle-axis(3), t(3)] with t renormalized each step
    (5 effective dof). This matters beyond polish: on quasi-planar or
    narrow-baseline scenes the linear 8-point estimate can sit far from
    the optimum while still collecting inliers (the fountain facade does
    exactly this), and the refined pose is what makes triangulation gates
    pass. x1, x2: (N, 2) normalized camera coords.
    """
    p0 = jnp.concatenate([se3.rotation_to_angle_axis(pose[:3, :3]),
                          pose[:3, 3]])

    def residuals(p):
        R = se3.angle_axis_to_rotation(p[:3])
        t = p[3:] / jnp.maximum(jnp.linalg.norm(p[3:]), 1e-12)
        E = essential_from_pose(R, t)
        # signed first-order geometric residual (sqrt of Sampson distance)
        d = sampson_distance(E, x1, x2)
        return jnp.sqrt(d + 1e-18) * weights

    def step(_, p):
        r = residuals(p)
        J = jax.jacfwd(residuals)(p)             # (N, 6)
        H = J.T @ J + 1e-9 * jnp.eye(6, dtype=p.dtype)
        g = J.T @ r
        p_new = p - jnp.linalg.solve(H, g)
        better = jnp.sum(residuals(p_new) ** 2) < jnp.sum(r ** 2)
        return jnp.where(better, p_new, p)

    p = jax.lax.fori_loop(0, num_iters, step, p0)
    R = se3.angle_axis_to_rotation(p[:3])
    t = p[3:] / jnp.maximum(jnp.linalg.norm(p[3:]), 1e-12)
    return se3.make_pose(R, t)


def recover_pose(E: jnp.ndarray, uv1: jnp.ndarray, uv2: jnp.ndarray,
                 intr1: jnp.ndarray, intr2: jnp.ndarray,
                 mask: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cheirality-disambiguated relative pose from E (cv::recoverPose
    equivalent; SequentialReconstructor.cpp:284-317).

    Returns the (4, 4) pose of camera 2 assuming camera 1 at identity
    (world->cam2: p2 = R p + t), chosen so the most correspondences
    triangulate in front of both cameras.
    """
    candidates = decompose_essential(E)
    eye = jnp.eye(4, dtype=E.dtype)
    n = uv1.shape[0]

    def count_cheirality(R, t):
        pose2 = se3.make_pose(R, t)
        poses = jnp.stack([jnp.broadcast_to(eye, (n, 4, 4)),
                           jnp.broadcast_to(pose2, (n, 4, 4))], axis=1)
        intrs = jnp.stack([jnp.broadcast_to(intr1, (n, 6)),
                           jnp.broadcast_to(intr2, (n, 6))], axis=1)
        uvs = jnp.stack([uv1, uv2], axis=1)
        m = jnp.broadcast_to(mask[:, None], (n, 2))
        pts = triangulation.triangulate_batch(poses, intrs, uvs, m)
        z1 = pts[:, 2]
        z2 = (pts @ R.T + t)[:, 2]
        ok = (z1 > 0) & (z2 > 0) & mask & jnp.all(jnp.isfinite(pts), axis=-1)
        return jnp.sum(ok), pose2

    counts, poses = zip(*(count_cheirality(R, t) for (R, t) in candidates))
    counts = jnp.stack(counts)
    poses = jnp.stack(poses)
    return poses[jnp.argmax(counts)], counts
