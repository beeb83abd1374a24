"""Grunert P3P: minimal 3-point absolute pose, batched for RANSAC.

Why this exists: the 6-point DLT minimal solver needs six simultaneously
clean correspondences — at a 30% inlier ratio a 2048-hypothesis budget
yields ~1-2 uncontaminated samples and registration becomes a coin flip
(observed on the fountain tail views). P3P needs three: ~55 clean
hypotheses at the same budget. This is also what the reference leans on
implicitly (cv::solvePnPRansac's default minimal solver is P3P).

Pipeline per sample, all branch-free and vmappable:
1. Grunert's reduction (Haralick et al., "Review and Analysis of
   Solutions of the Three Point Perspective Pose Estimation Problem") to
   a quartic in the distance ratio v = s3/s1.
2. Quartic roots via fixed-iteration Durand-Kerner in hand-rolled
   complex arithmetic (TPU has no nonsymmetric eig; D-K is
   branch-free, converges in ~30 iterations, finds all 4 roots at once).
3. Each admissible real root -> camera-frame point distances -> absolute
   orientation from 3 point pairs by orthonormal-frame alignment.

Returns 4 candidate poses per sample (inadmissible roots yield NaN poses
that score zero inliers downstream).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from reconstructor_tpu.geometry import se3


def _dk_quartic_roots(coeffs: jnp.ndarray, iters: int = 40):
    """All 4 roots of A4 x^4 + ... + A0 via Durand-Kerner.

    coeffs: (5,) [A4, A3, A2, A1, A0]. Returns (re (4,), im (4,)).
    """
    A4 = coeffs[0]
    # normalize; guard the (near-)degenerate leading coefficient
    scale = jnp.where(jnp.abs(A4) < 1e-12, jnp.sign(A4) * 1e-12 + 1e-12, A4)
    c = coeffs / scale                    # monic: x^4 + c1 x^3 + ...
    c1, c2, c3, c4 = c[1], c[2], c[3], c[4]

    def poly(re, im):
        # evaluate monic quartic at re+im*i via Horner in split form
        pr, pi = jnp.ones_like(re), jnp.zeros_like(re)
        for coef in (c1, c2, c3, c4):
            pr, pi = pr * re - pi * im + coef, pr * im + pi * re
        return pr, pi

    # standard D-K seeds: powers of 0.4 + 0.9i
    sr, si = jnp.asarray(0.4, c.dtype), jnp.asarray(0.9, c.dtype)
    re = jnp.stack([sr, sr * sr - si * si,
                    sr * (sr * sr - 3 * si * si),
                    (sr * sr - si * si) ** 2 - (2 * sr * si) ** 2])
    im = jnp.stack([si, 2 * sr * si,
                    si * (3 * sr * sr - si * si),
                    2.0 * (sr * sr - si * si) * (2.0 * sr * si)])

    def step(_, state):
        re, im = state
        pr, pi = poly(re, im)
        # denominator: prod_{j != i} (z_i - z_j)
        dr = re[:, None] - re[None, :]
        di = im[:, None] - im[None, :]
        # start product at 1, skip the diagonal via where
        prod_r = jnp.ones_like(re)
        prod_i = jnp.zeros_like(im)
        for j in range(4):
            take = jnp.arange(4) != j
            nr = prod_r * dr[:, j] - prod_i * di[:, j]
            ni = prod_r * di[:, j] + prod_i * dr[:, j]
            prod_r = jnp.where(take, nr, prod_r)
            prod_i = jnp.where(take, ni, prod_i)
        denom = prod_r * prod_r + prod_i * prod_i
        denom = jnp.where(denom < 1e-20, 1e-20, denom)
        qr = (pr * prod_r + pi * prod_i) / denom
        qi = (pi * prod_r - pr * prod_i) / denom
        return re - qr, im - qi

    re, im = jax.lax.fori_loop(0, iters, step, (re, im))
    return re, im


def _align_three_points(pw: jnp.ndarray, pc: jnp.ndarray):
    """Rigid transform from 3 world points to 3 camera points.

    Builds the orthonormal triangle frame in both systems:
    R = F_cam @ F_world^T, t = c_cam - R c_world. pw, pc: (3, 3).
    """
    def frame(p):
        e1 = p[1] - p[0]
        e1 = e1 / jnp.maximum(jnp.linalg.norm(e1), 1e-12)
        n = jnp.cross(e1, p[2] - p[0])
        e3 = n / jnp.maximum(jnp.linalg.norm(n), 1e-12)
        e2 = jnp.cross(e3, e1)
        return jnp.stack([e1, e2, e3], axis=1)   # columns

    Fw = frame(pw)
    Fc = frame(pc)
    R = Fc @ Fw.T
    t = jnp.mean(pc, axis=0) - R @ jnp.mean(pw, axis=0)
    return R, t


def p3p_grunert(pts3d: jnp.ndarray, bearings: jnp.ndarray) -> jnp.ndarray:
    """Solve P3P for one sample.

    pts3d: (3, 3) world points; bearings: (3, 3) unit rays in the camera
    frame. Returns (4, 4, 4) candidate world->camera poses (NaN-filled
    rows for inadmissible roots).
    """
    P1, P2, P3 = pts3d[0], pts3d[1], pts3d[2]
    j1, j2, j3 = bearings[0], bearings[1], bearings[2]

    a2 = jnp.sum((P2 - P3) ** 2)
    b2 = jnp.sum((P1 - P3) ** 2)
    c2 = jnp.sum((P1 - P2) ** 2)
    b2 = jnp.maximum(b2, 1e-12)

    cos_a = jnp.dot(j2, j3)
    cos_b = jnp.dot(j1, j3)
    cos_g = jnp.dot(j1, j2)

    A = (a2 - c2) / b2
    B = (a2 + c2) / b2
    C = (b2 - c2) / b2
    D = (b2 - a2) / b2

    A4 = (A - 1.0) ** 2 - 4.0 * (c2 / b2) * cos_a ** 2
    A3 = 4.0 * (A * (1.0 - A) * cos_b
                - (1.0 - B) * cos_a * cos_g
                + 2.0 * (c2 / b2) * cos_a ** 2 * cos_b)
    A2 = 2.0 * (A ** 2 - 1.0
                + 2.0 * A ** 2 * cos_b ** 2
                + 2.0 * C * cos_a ** 2
                - 4.0 * B * cos_a * cos_b * cos_g
                + 2.0 * D * cos_g ** 2)
    A1 = 4.0 * (-A * (1.0 + A) * cos_b
                + 2.0 * (a2 / b2) * cos_g ** 2 * cos_b
                - (1.0 - B) * cos_a * cos_g)
    A0 = (1.0 + A) ** 2 - 4.0 * (a2 / b2) * cos_g ** 2

    re, im = _dk_quartic_roots(jnp.stack([A4, A3, A2, A1, A0]))
    real_ok = jnp.abs(im) < 1e-4 * (1.0 + jnp.abs(re))
    v = re                                            # s3/s1 candidates

    denom_u = 2.0 * (cos_g - v * cos_a)
    denom_u = jnp.where(jnp.abs(denom_u) < 1e-12, 1e-12, denom_u)
    u = ((-1.0 + A) * v ** 2 - 2.0 * A * cos_b * v + 1.0 + A) / denom_u

    s1_sq = b2 / jnp.maximum(1.0 + v ** 2 - 2.0 * v * cos_b, 1e-12)
    admissible = real_ok & (s1_sq > 0) & (v > 0) & (u > 0)
    s1 = jnp.sqrt(jnp.maximum(s1_sq, 1e-12))
    s2 = u * s1
    s3 = v * s1

    def build_pose(i):
        pc = jnp.stack([s1[i] * j1, s2[i] * j2, s3[i] * j3])
        R, t = _align_three_points(pts3d, pc)
        T = se3.make_pose(R, t)
        return jnp.where(admissible[i], T, jnp.full((4, 4), jnp.nan, T.dtype))

    return jnp.stack([build_pose(i) for i in range(4)])
