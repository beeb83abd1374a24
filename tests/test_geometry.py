"""Unit tests for the geometry core against closed-form ground truth."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reconstructor_tpu.geometry import camera as cam
from reconstructor_tpu.geometry import se3, triangulation, epipolar, pnp


def rand_rotation(rng):
    aa = rng.standard_normal(3)
    aa = aa / np.linalg.norm(aa) * rng.uniform(0.1, 2.5)
    return np.asarray(se3.angle_axis_to_rotation(jnp.asarray(aa, jnp.float64 if jax.config.read('jax_enable_x64') else jnp.float32)))


class TestSE3:
    def test_rodrigues_roundtrip(self):
        rng = np.random.default_rng(0)
        aa = jnp.asarray(rng.standard_normal((64, 3)), jnp.float32)
        R = se3.angle_axis_to_rotation(aa)
        # orthonormality
        eye = jnp.einsum("nij,nkj->nik", R, R)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-5)
        aa2 = se3.rotation_to_angle_axis(R)
        R2 = se3.angle_axis_to_rotation(aa2)
        np.testing.assert_allclose(R, R2, atol=1e-5)

    def test_small_angle(self):
        aa = jnp.array([[1e-9, 0.0, 0.0], [0.0, 0.0, 0.0]])
        R = se3.angle_axis_to_rotation(aa)
        np.testing.assert_allclose(R, np.broadcast_to(np.eye(3), (2, 3, 3)), atol=1e-6)

    def test_rotate_points_aa_matches_matrix(self):
        rng = np.random.default_rng(1)
        aa = jnp.asarray(rng.standard_normal((32, 3)), jnp.float32)
        pts = jnp.asarray(rng.standard_normal((32, 3)), jnp.float32)
        R = se3.angle_axis_to_rotation(aa)
        expect = jnp.einsum("nij,nj->ni", R, pts)
        got = se3.rotate_points_aa(aa, pts)
        np.testing.assert_allclose(got, expect, atol=1e-5)

    def test_camera_center(self):
        rng = np.random.default_rng(2)
        R = jnp.asarray(rand_rotation(rng))
        t = jnp.asarray(rng.standard_normal(3), jnp.float32)
        T = se3.make_pose(R, t)
        c = se3.camera_center(T)
        # transforming the center into camera frame must give the origin
        np.testing.assert_allclose(R @ c + t, np.zeros(3), atol=1e-5)

    def test_pose_params_roundtrip(self):
        rng = np.random.default_rng(3)
        R = jnp.asarray(rand_rotation(rng))
        t = jnp.asarray(rng.standard_normal(3), jnp.float32)
        T = se3.make_pose(R, t)
        T2 = se3.params_to_pose(se3.pose_to_params(T))
        np.testing.assert_allclose(T, T2, atol=1e-5)


class TestCamera:
    def test_project_unproject_no_distortion(self):
        intr = cam.make_intrinsics(480, 640, focal_px=500.0)
        pts = jnp.array([[[0.1, -0.2, 2.0], [1.0, 1.0, 5.0]]])[0]
        uv = cam.project(intr, pts)
        # manual check of first point
        np.testing.assert_allclose(uv[0], [500 * 0.05 + 320, 500 * -0.1 + 240], rtol=1e-5)
        back = cam.unproject(intr, uv)
        np.testing.assert_allclose(back[:, :2], pts[:, :2] / pts[:, 2:3], atol=1e-5)

    def test_reference_additive_distortion(self):
        # Camera.h:59-76 — the same scalar distortion is ADDED to x and y.
        intr = jnp.array([100.0, 100.0, 0.0, 0.0, 0.1, 0.01])
        pt = jnp.array([[0.3, -0.4, 1.0]])
        r = 0.3 ** 2 + 0.4 ** 2
        d = 0.1 * r + 0.01 * r * r
        uv = cam.project(intr, pt)
        np.testing.assert_allclose(uv[0], [100 * (0.3 + d), 100 * (-0.4 + d)], rtol=1e-5)

    def test_principal_point_floor(self):
        intr = cam.make_intrinsics(341, 512)
        assert float(intr[cam.CX]) == 256.0
        assert float(intr[cam.CY]) == 170.0  # 341 // 2
        assert float(intr[cam.FX]) == pytest.approx(1.2 * 512)

    def test_l1_reprojection_error(self):
        intr = cam.make_intrinsics(480, 640, focal_px=500.0)
        pts = jnp.array([[0.0, 0.0, 1.0]])
        uv_obs = jnp.array([[321.0, 242.0]])  # off by (1, 2) px
        err = cam.reprojection_error_l1(intr, pts, uv_obs)
        np.testing.assert_allclose(err, [3.0], atol=1e-4)


def synthetic_scene(rng, n_pts=128, n_cams=3, noise=0.0):
    """Random points in front of a ring of cameras; returns exact projections."""
    pts = rng.uniform([-2, -2, 4], [2, 2, 8], size=(n_pts, 3)).astype(np.float32)
    poses, intrs, uvs = [], [], []
    intr = np.asarray(cam.make_intrinsics(480, 640, focal_px=600.0))
    for i in range(n_cams):
        aa = np.array([0.02 * i, 0.3 * i - 0.3, 0.01 * i], np.float32)
        R = np.asarray(se3.angle_axis_to_rotation(jnp.asarray(aa)))
        t = np.array([0.8 * i - 0.8, 0.05 * i, 0.1 * i], np.float32)
        T = np.asarray(se3.make_pose(jnp.asarray(R), jnp.asarray(t)))
        pc = pts @ R.T + t
        uv = np.asarray(cam.project(jnp.asarray(intr), jnp.asarray(pc)))
        if noise:
            uv = uv + rng.normal(0, noise, uv.shape).astype(np.float32)
        poses.append(T); intrs.append(intr); uvs.append(uv)
    return pts, np.stack(poses), np.stack(intrs), np.stack(uvs)


class TestTriangulation:
    def test_exact_recovery(self):
        rng = np.random.default_rng(4)
        pts, poses, intrs, uvs = synthetic_scene(rng, n_pts=64, n_cams=3)
        n = pts.shape[0]
        P = jnp.asarray(np.broadcast_to(poses[None], (n, 3, 4, 4)))
        I = jnp.asarray(np.broadcast_to(intrs[None], (n, 3, 6)))
        U = jnp.asarray(np.transpose(uvs, (1, 0, 2)))
        mask = jnp.ones((n, 3), bool)
        est = triangulation.triangulate_batch(P, I, U, mask)
        np.testing.assert_allclose(est, pts, atol=1e-2)

    def test_validation_gates(self):
        rng = np.random.default_rng(5)
        pts, poses, intrs, uvs = synthetic_scene(rng, n_pts=64, n_cams=2)
        n = pts.shape[0]
        P = jnp.asarray(np.broadcast_to(poses[None], (n, 2, 4, 4)))
        I = jnp.asarray(np.broadcast_to(intrs[None], (n, 2, 6)))
        U = np.transpose(uvs, (1, 0, 2)).copy()
        # corrupt half the observations by 50 px PERPENDICULAR to the
        # (mostly horizontal) epipolar lines — an along-epipolar shift
        # would be geometrically consistent and undetectable by any
        # reprojection gate.
        U[: n // 2, 1, 1] += 50.0
        est, valid = triangulation.triangulate_and_validate(
            P, I, jnp.asarray(U), jnp.ones((n, 2), bool), 4.0, 1.0)
        valid = np.asarray(valid)
        assert valid[n // 2:].mean() > 0.9      # clean ones survive
        assert valid[: n // 2].mean() < 0.3     # corrupted ones are culled

    def test_masked_observation_ignored(self):
        rng = np.random.default_rng(6)
        pts, poses, intrs, uvs = synthetic_scene(rng, n_pts=32, n_cams=3)
        n = pts.shape[0]
        P = jnp.asarray(np.broadcast_to(poses[None], (n, 3, 4, 4)))
        I = jnp.asarray(np.broadcast_to(intrs[None], (n, 3, 6)))
        U = np.transpose(uvs, (1, 0, 2)).copy()
        U[:, 2, :] = 1e6  # garbage in the masked-out slot
        mask = np.ones((n, 3), bool)
        mask[:, 2] = False
        est = triangulation.triangulate_batch(P, I, jnp.asarray(U), jnp.asarray(mask))
        np.testing.assert_allclose(est, pts, atol=1e-2)


class TestEpipolar:
    def test_fundamental_separates_outliers(self):
        rng = np.random.default_rng(7)
        pts, poses, intrs, uvs = synthetic_scene(rng, n_pts=256, n_cams=2, noise=0.3)
        uv1, uv2 = uvs[0].copy(), uvs[1].copy()
        # 25% outliers
        n_out = 64
        uv2[:n_out] = rng.uniform([0, 0], [640, 480], size=(n_out, 2))
        F, inl, cnt = epipolar.estimate_fundamental(
            jax.random.PRNGKey(0), jnp.asarray(uv1), jnp.asarray(uv2),
            jnp.ones(256, bool), thresh_px=3.0, num_hypotheses=512)
        inl = np.asarray(inl)
        assert inl[n_out:].mean() > 0.9
        assert inl[:n_out].mean() < 0.1

    def test_essential_recover_pose(self):
        rng = np.random.default_rng(8)
        pts, poses, intrs, uvs = synthetic_scene(rng, n_pts=256, n_cams=2)
        intr = jnp.asarray(intrs[0])
        E, inl, cnt = epipolar.estimate_essential(
            jax.random.PRNGKey(1), jnp.asarray(uvs[0]), jnp.asarray(uvs[1]),
            intr, intr, jnp.ones(256, bool), thresh_px=1.0, num_hypotheses=512)
        assert int(cnt) > 200
        pose2, counts = epipolar.recover_pose(
            E, jnp.asarray(uvs[0]), jnp.asarray(uvs[1]), intr, intr, inl)
        # ground-truth relative pose cam1 -> cam2: T_rel = T2 @ inv(T1)
        T_rel = poses[1] @ np.linalg.inv(poses[0])
        R_est = np.asarray(pose2[:3, :3])
        t_est = np.asarray(pose2[:3, 3])
        R_gt = T_rel[:3, :3]
        t_gt = T_rel[:3, 3]
        np.testing.assert_allclose(R_est, R_gt, atol=2e-2)
        # translation up to scale
        cos = np.dot(t_est / np.linalg.norm(t_est), t_gt / np.linalg.norm(t_gt))
        assert cos > 0.999


class TestPnP:
    def test_pnp_with_outliers(self):
        rng = np.random.default_rng(9)
        pts, poses, intrs, uvs = synthetic_scene(rng, n_pts=256, n_cams=2, noise=0.3)
        uv = uvs[1].copy()
        n_out = 64
        uv[:n_out] = rng.uniform([0, 0], [640, 480], size=(n_out, 2))
        pose, inl, cnt = pnp.solve_pnp_ransac(
            jax.random.PRNGKey(2), jnp.asarray(pts), jnp.asarray(uv),
            jnp.asarray(intrs[1]), jnp.ones(256, bool),
            thresh_px=4.0, num_hypotheses=512, refine_iters=8)
        np.testing.assert_allclose(np.asarray(pose[:3, :3]), poses[1][:3, :3], atol=1e-2)
        np.testing.assert_allclose(np.asarray(pose[:3, 3]), poses[1][:3, 3], atol=5e-2)
        assert int(cnt) > 180


class TestLinalg:
    def test_cholesky_and_solve_unrolled(self):
        from reconstructor_tpu.geometry import linalg
        rng = np.random.default_rng(7)
        for n in (3, 4, 9, 12):
            B = 64
            Q = rng.standard_normal((B, n, n)).astype(np.float32)
            A = Q @ np.transpose(Q, (0, 2, 1)) + n * np.eye(n, dtype=np.float32)
            L = np.asarray(linalg.cholesky_unrolled(jnp.asarray(A)))
            np.testing.assert_allclose(L @ np.transpose(L, (0, 2, 1)), A,
                                       rtol=2e-4, atol=2e-4)
            assert np.allclose(np.triu(L, 1), 0.0)
            b = rng.standard_normal((B, n)).astype(np.float32)
            x = np.asarray(linalg.cho_solve_unrolled(jnp.asarray(L), jnp.asarray(b)))
            np.testing.assert_allclose(
                np.einsum("bij,bj->bi", A, x), b, rtol=1e-3, atol=1e-3)

    def test_smallest_eigvec_matches_eigh(self):
        from reconstructor_tpu.geometry import linalg
        rng = np.random.default_rng(8)
        B, n = 128, 9
        Q = rng.standard_normal((B, n, n)).astype(np.float32)
        A = Q @ np.transpose(Q, (0, 2, 1))
        v = np.asarray(linalg.smallest_eigvec(jnp.asarray(A)))
        w, V = np.linalg.eigh(A)
        ref = V[:, :, 0]
        dots = np.abs(np.sum(v * ref, axis=-1))
        assert np.mean(dots > 0.999) > 0.95  # f32 + near-degenerate pairs

    def test_project_rank2_is_optimal_truncation(self):
        from reconstructor_tpu.geometry import linalg
        rng = np.random.default_rng(9)
        M = rng.standard_normal((256, 3, 3)).astype(np.float32)
        out = np.asarray(jax.vmap(linalg.project_rank2)(jnp.asarray(M)))
        sv = np.linalg.svd(M, compute_uv=False)
        # result is rank 2 ...
        s3 = np.linalg.svd(out, compute_uv=False)[:, 2]
        assert np.all(s3 < 2e-4 * sv[:, 0])
        # ... and Frobenius-optimal: ||M - out||_F == sigma3 (the SVD
        # truncation bound; near-degenerate sigma2 ~ sigma3 admits many
        # equally-optimal answers, so compare errors, not matrices)
        err = np.linalg.norm(M - out, axis=(1, 2))
        assert np.all(err <= sv[:, 2] * (1 + 1e-3) + 1e-4)

    def test_project_rank2_well_separated_matches_svd(self):
        from reconstructor_tpu.geometry import linalg
        rng = np.random.default_rng(10)
        U, _ = np.linalg.qr(rng.standard_normal((16, 3, 3)))
        V, _ = np.linalg.qr(rng.standard_normal((16, 3, 3)))
        S = np.stack([np.full(16, 3.0), np.full(16, 1.0), np.full(16, 0.2)],
                     axis=-1).astype(np.float32)
        M = (np.einsum("bij,bj,bkj->bik", U, S, V)).astype(np.float32)
        out = np.asarray(jax.vmap(linalg.project_rank2)(jnp.asarray(M)))
        S[:, 2] = 0.0
        ref = np.einsum("bij,bj,bkj->bik", U, S, V)
        np.testing.assert_allclose(out, ref, rtol=1e-3, atol=2e-4)
