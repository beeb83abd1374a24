"""Tests for the planar-safe relative pose machinery."""

import numpy as np
import jax
import jax.numpy as jnp

from reconstructor_tpu.geometry import epipolar, se3, camera as cam


def make_two_view(rng, n=200, planar_frac=0.0, noise=0.0):
    """Two calibrated views of a scene with optional dominant plane."""
    n_plane = int(n * planar_frac)
    pts = rng.uniform([-2, -2, 6], [2, 2, 10], (n, 3)).astype(np.float32)
    if n_plane:
        # plane z = 8 - 0.3x + 0.2y
        pts[:n_plane, 2] = 8 - 0.3 * pts[:n_plane, 0] + 0.2 * pts[:n_plane, 1]
    aa = np.array([0.02, -0.15, 0.03], np.float32)
    t = np.array([-1.2, 0.1, 0.15], np.float32)
    R = np.asarray(se3.angle_axis_to_rotation(jnp.asarray(aa)))
    intr = np.asarray(cam.make_intrinsics(480, 640, focal_px=600.0))
    uv1 = np.asarray(cam.project(jnp.asarray(intr), jnp.asarray(pts)))
    pc2 = pts @ R.T + t
    uv2 = np.asarray(cam.project(jnp.asarray(intr), jnp.asarray(pc2)))
    if noise:
        uv1 = uv1 + rng.normal(0, noise, uv1.shape).astype(np.float32)
        uv2 = uv2 + rng.normal(0, noise, uv2.shape).astype(np.float32)
    T = np.asarray(se3.make_pose(jnp.asarray(R), jnp.asarray(t)))
    return uv1, uv2, intr, T


def check_pose(pose_est, T_gt, atol_rot=0.03, atol_dir=0.03):
    R_est = np.asarray(pose_est[:3, :3])
    t_est = np.asarray(pose_est[:3, 3])
    np.testing.assert_allclose(R_est, T_gt[:3, :3], atol=atol_rot)
    cos = np.dot(t_est / np.linalg.norm(t_est),
                 T_gt[:3, 3] / np.linalg.norm(T_gt[:3, 3]))
    assert cos > 1 - atol_dir, f"translation direction off: cos={cos}"


class TestTwoViewDepths:
    def test_closed_form_matches_ground_truth(self):
        rng = np.random.default_rng(0)
        uv1, uv2, intr, T = make_two_view(rng, n=50)
        x1 = np.asarray(cam.unproject(jnp.asarray(intr), jnp.asarray(uv1)))
        x2 = np.asarray(cam.unproject(jnp.asarray(intr), jnp.asarray(uv2)))
        z1, z2 = epipolar.two_view_depths(
            jnp.asarray(T[:3, :3]), jnp.asarray(T[:3, 3]),
            jnp.asarray(x1), jnp.asarray(x2))
        # depths must be positive and consistent with projection depths
        assert np.all(np.asarray(z1) > 0)
        assert np.all(np.asarray(z2) > 0)


class TestRelativePose:
    def test_general_scene(self):
        rng = np.random.default_rng(1)
        uv1, uv2, intr, T = make_two_view(rng, n=256, noise=0.3)
        pose, E, inl, cnt = epipolar.estimate_relative_pose(
            jax.random.PRNGKey(0), jnp.asarray(uv1), jnp.asarray(uv2),
            jnp.asarray(intr), jnp.asarray(intr), jnp.ones(256, bool),
            thresh_px=1.0, num_hypotheses=512)
        assert int(cnt) > 200
        check_pose(pose, T)

    def test_dominant_plane(self):
        """90% coplanar points — the regime that defeats plain 8-point."""
        for seed in range(3):
            rng = np.random.default_rng(10 + seed)
            uv1, uv2, intr, T = make_two_view(rng, n=256, planar_frac=0.9,
                                              noise=0.3)
            pose, E, inl, cnt = epipolar.estimate_relative_pose(
                jax.random.PRNGKey(seed), jnp.asarray(uv1), jnp.asarray(uv2),
                jnp.asarray(intr), jnp.asarray(intr), jnp.ones(256, bool),
                thresh_px=1.0, num_hypotheses=512)
            check_pose(pose, T, atol_rot=0.05, atol_dir=0.05)

    def test_pure_plane(self):
        """100% coplanar — only the homography path yields a consistent
        pose at all. Two views of a pure plane are inherently two-fold
        ambiguous (both Faugeras solutions satisfy every constraint), so
        this asserts full geometric consistency rather than equality with
        one specific ground-truth pose."""
        rng = np.random.default_rng(2)
        uv1, uv2, intr, T = make_two_view(rng, n=256, planar_frac=1.0)
        pose, E, inl, cnt = epipolar.estimate_relative_pose(
            jax.random.PRNGKey(3), jnp.asarray(uv1), jnp.asarray(uv2),
            jnp.asarray(intr), jnp.asarray(intr), jnp.ones(256, bool),
            thresh_px=1.0, num_hypotheses=512)
        # nearly all points epipolar-consistent AND in front of both cameras
        assert int(cnt) > 240
        x1 = np.asarray(cam.unproject(jnp.asarray(intr), jnp.asarray(uv1)))
        x2 = np.asarray(cam.unproject(jnp.asarray(intr), jnp.asarray(uv2)))
        z1, z2 = epipolar.two_view_depths(pose[:3, :3], pose[:3, 3],
                                          jnp.asarray(x1), jnp.asarray(x2))
        assert np.mean(np.asarray(z1) > 0) > 0.95
        assert np.mean(np.asarray(z2) > 0) > 0.95

    def test_with_padding_and_outliers(self):
        rng = np.random.default_rng(4)
        uv1, uv2, intr, T = make_two_view(rng, n=200, planar_frac=0.7, noise=0.3)
        K = 512
        u1 = np.zeros((K, 2), np.float32)
        u2 = np.zeros((K, 2), np.float32)
        mask = np.zeros(K, bool)
        u1[:200] = uv1; u2[:200] = uv2; mask[:200] = True
        # 40 outliers among the valid region
        u2[:40] = rng.uniform([0, 0], [640, 480], (40, 2))
        pose, E, inl, cnt = epipolar.estimate_relative_pose(
            jax.random.PRNGKey(5), jnp.asarray(u1), jnp.asarray(u2),
            jnp.asarray(intr), jnp.asarray(intr), jnp.asarray(mask),
            thresh_px=1.0, num_hypotheses=512)
        inl = np.asarray(inl)
        assert not inl[200:].any()
        assert inl[:40].mean() < 0.2
        check_pose(pose, T, atol_rot=0.05, atol_dir=0.05)


class TestHomography:
    def test_decomposition_recovers_pose(self):
        rng = np.random.default_rng(6)
        uv1, uv2, intr, T = make_two_view(rng, n=64, planar_frac=1.0)
        x1 = np.asarray(cam.unproject(jnp.asarray(intr), jnp.asarray(uv1)))[:, :2]
        x2 = np.asarray(cam.unproject(jnp.asarray(intr), jnp.asarray(uv2)))[:, :2]
        H = epipolar._four_point_homography(jnp.asarray(x1), jnp.asarray(x2))
        err = epipolar.homography_transfer_error(H, jnp.asarray(x1), jnp.asarray(x2))
        assert float(jnp.max(err)) < 1e-6
        sols = epipolar.decompose_homography(H)
        best_cos = -1
        for R, t in sols:
            R = np.asarray(se3.project_to_so3(R))
            t = np.asarray(t)
            cos_t = abs(np.dot(t, T[:3, 3] / np.linalg.norm(T[:3, 3])))
            if np.allclose(R, T[:3, :3], atol=0.05):
                best_cos = max(best_cos, cos_t)
        assert best_cos > 0.95
