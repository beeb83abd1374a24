"""Tests for the ATE evaluation machinery."""

import numpy as np

from reconstructor_tpu.eval import ate


class TestUmeyama:
    def test_exact_similarity_recovery(self):
        rng = np.random.default_rng(0)
        src = rng.standard_normal((30, 3))
        from reconstructor_tpu.geometry import se3
        import jax.numpy as jnp
        aa = np.array([0.3, -0.5, 0.8])
        R = np.asarray(se3.angle_axis_to_rotation(jnp.asarray(aa, jnp.float32)))
        s, t = 2.5, np.array([1.0, -2.0, 3.0])
        dst = s * src @ R.T + t
        s_e, R_e, t_e = ate.umeyama(src, dst)
        np.testing.assert_allclose(s_e, s, rtol=1e-5)
        np.testing.assert_allclose(R_e, R, atol=1e-5)
        np.testing.assert_allclose(t_e, t, atol=1e-4)


class TestAlignICP:
    def test_subset_alignment(self):
        """25 est cameras must align onto a 100-camera reference arc."""
        rng = np.random.default_rng(1)
        theta = np.linspace(0, 2.0, 100)
        ref = np.stack([10 * np.cos(theta), 10 * np.sin(theta),
                        0.5 * theta], axis=1)
        est = ref[::4].copy()                        # 25-camera subset
        # random similarity warp + small noise
        from reconstructor_tpu.geometry import se3
        import jax.numpy as jnp
        R = np.asarray(se3.angle_axis_to_rotation(
            jnp.asarray([0.2, 0.7, -0.4], jnp.float32)))
        est = 0.37 * est @ R.T + np.array([5.0, -3.0, 1.0])
        est += rng.normal(0, 0.01, est.shape)
        aligned, rmse = ate.align_trajectories_icp(est, ref)
        assert rmse < 0.1

    def test_split_golden(self):
        pts = np.zeros((5, 3), np.float32)
        cols = np.zeros((5, 3), np.uint8)
        cols[3] = (0, 250, 0)
        lm, cams = ate.split_golden_cloud(pts, cols)
        assert lm.shape[0] == 4 and cams.shape[0] == 1


class TestAteFloor:
    def test_floor_on_golden_subset(self):
        """A perfect 25-of-100 golden-arc subset pushed through the same
        NN-ICP pipeline: the floor must be well below the measured
        end-to-end ATE (else the metric is saturated) and nonnegative."""
        golden = "/root/reference/cloud_fountain.ply"
        from reconstructor_tpu.io import ply
        pts, cols = ply.load_cloud(golden)
        _, ref = ate.split_golden_cloud(pts, cols)
        order = np.argsort(ref @ np.linalg.svd(
            ref - ref.mean(0), full_matrices=False)[2][0])
        est = ref[order[::4]][:25] * 1.7 + np.array([0.3, -1.0, 2.0])
        res = ate.ate_floor_vs_golden(est, golden)
        assert 0.0 <= res["ate_floor_normalized"] < 0.022
        assert 0.0 <= res["ate_floor_stride_normalized"] < 0.022
        assert res["floor_subset_size"] >= 20
