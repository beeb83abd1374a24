"""Grunert P3P tests against exact synthetic poses."""

import numpy as np
import jax
import jax.numpy as jnp

from reconstructor_tpu.geometry import p3p, pnp, se3, camera as cam


def make_p3p_case(rng):
    aa = rng.standard_normal(3) * 0.4
    R = np.asarray(se3.angle_axis_to_rotation(jnp.asarray(aa, jnp.float32)))
    t = rng.standard_normal(3).astype(np.float32)
    pts = rng.uniform([-2, -2, 4], [2, 2, 8], (3, 3)).astype(np.float32)
    pc = pts @ R.T + t
    bearings = pc / np.linalg.norm(pc, axis=-1, keepdims=True)
    return pts, bearings, R, t


class TestQuartic:
    def test_known_roots(self):
        # (x-1)(x-2)(x-3)(x-4) = x^4 -10x^3 +35x^2 -50x +24
        re, im = p3p._dk_quartic_roots(
            jnp.asarray([1.0, -10.0, 35.0, -50.0, 24.0], jnp.float32))
        roots = np.sort(np.asarray(re))
        np.testing.assert_allclose(roots, [1, 2, 3, 4], atol=1e-3)
        np.testing.assert_allclose(np.asarray(im), 0.0, atol=1e-3)

    def test_complex_pair(self):
        # (x^2+1)(x-2)(x-5) = x^4 -7x^3 +11x^2 -7x +10
        re, im = p3p._dk_quartic_roots(
            jnp.asarray([1.0, -7.0, 11.0, -7.0, 10.0], jnp.float32))
        re, im = np.asarray(re), np.asarray(im)
        real = np.sort(re[np.abs(im) < 1e-3])
        np.testing.assert_allclose(real, [2, 5], atol=1e-3)


class TestP3P:
    def test_recovers_exact_pose(self):
        hits = 0
        for seed in range(10):
            rng = np.random.default_rng(seed)
            pts, bearings, R, t = make_p3p_case(rng)
            cands = np.asarray(p3p.p3p_grunert(jnp.asarray(pts),
                                               jnp.asarray(bearings)))
            found = False
            for T in cands:
                if np.any(np.isnan(T)):
                    continue
                if (np.allclose(T[:3, :3], R, atol=2e-2)
                        and np.allclose(T[:3, 3], t, atol=5e-2)):
                    found = True
            hits += found
        assert hits >= 9  # exact-data recovery should be near-universal

    def test_pnp_p3p_low_inlier_ratio(self):
        """30% inliers: the regime where 6-point DLT sampling collapses."""
        rng = np.random.default_rng(42)
        n = 300
        pts = rng.uniform([-2, -2, 4], [2, 2, 8], (n, 3)).astype(np.float32)
        aa = np.array([0.1, -0.2, 0.05], np.float32)
        R = np.asarray(se3.angle_axis_to_rotation(jnp.asarray(aa)))
        t = np.array([0.3, -0.1, 0.2], np.float32)
        intr = np.asarray(cam.make_intrinsics(480, 640, focal_px=500.0))
        pc = pts @ R.T + t
        uv = np.asarray(cam.project(jnp.asarray(intr), jnp.asarray(pc))).copy()
        uv = (uv + rng.normal(0, 0.3, uv.shape)).astype(np.float32)
        n_out = int(n * 0.7)
        uv[:n_out] = rng.uniform([0, 0], [640, 480], (n_out, 2))
        pose, inl, cnt = pnp.solve_pnp_ransac(
            jax.random.PRNGKey(0), jnp.asarray(pts), jnp.asarray(uv),
            jnp.asarray(intr), jnp.ones(n, bool),
            thresh_px=4.0, num_hypotheses=512, refine_iters=8)
        np.testing.assert_allclose(np.asarray(pose[:3, :3]), R, atol=2e-2)
        np.testing.assert_allclose(np.asarray(pose[:3, 3]), t, atol=5e-2)
        assert int(cnt) > 80
