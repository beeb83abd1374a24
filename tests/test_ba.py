"""Bundle adjustment tests: noisy synthetic scenes must re-converge."""

import numpy as np
import jax.numpy as jnp
import pytest

from reconstructor_tpu.ba import lm
from reconstructor_tpu.geometry import se3, camera as cam


def make_ba_problem(rng, n_cams=5, n_pts=200, pose_noise=0.02, pt_noise=0.05,
                    px_noise=0.0):
    """Ground-truth scene + perturbed initial estimates."""
    pts_gt = rng.uniform([-2, -2, 5], [2, 2, 9], (n_pts, 3)).astype(np.float32)
    intr = np.array([600.0, 600.0, 320.0, 240.0, 0.0, 0.0], np.float32)

    cams_gt = []
    for i in range(n_cams):
        aa = np.array([0.05 * i, 0.25 * i - 0.5, 0.02 * i], np.float32)
        t = np.array([1.2 * i - 2.4, 0.1 * i, 0.05 * i], np.float32)
        cams_gt.append(np.concatenate([aa, t, intr]))
    cams_gt = np.stack(cams_gt)

    obs_cam, obs_pt, obs_uv = [], [], []
    for c in range(n_cams):
        R = np.asarray(se3.angle_axis_to_rotation(jnp.asarray(cams_gt[c, :3])))
        pc = pts_gt @ R.T + cams_gt[c, 3:6]
        uv = np.asarray(cam.project(jnp.asarray(intr), jnp.asarray(pc)))
        if px_noise:
            uv = uv + rng.normal(0, px_noise, uv.shape).astype(np.float32)
        for p in range(n_pts):
            obs_cam.append(c); obs_pt.append(p); obs_uv.append(uv[p])

    cams_init = cams_gt.copy()
    # perturb all but the gauge-fixed parts
    cams_init[2:, :3] += rng.normal(0, pose_noise, (n_cams - 2, 3)).astype(np.float32)
    cams_init[2:, 3:6] += rng.normal(0, pose_noise * 5, (n_cams - 2, 3)).astype(np.float32)
    cams_init[1, :3] += rng.normal(0, pose_noise, 3).astype(np.float32)
    pts_init = pts_gt + rng.normal(0, pt_noise, pts_gt.shape).astype(np.float32)

    prob = lm.BAProblem(
        cam_params=jnp.asarray(cams_init),
        points=jnp.asarray(pts_init),
        obs_cam=jnp.asarray(obs_cam, jnp.int32),
        obs_pt=jnp.asarray(obs_pt, jnp.int32),
        obs_uv=jnp.asarray(np.stack(obs_uv)),
        obs_mask=jnp.ones(len(obs_cam), bool),
        cam_free=lm.make_cam_free_mask(n_cams),
    )
    return prob, cams_gt, pts_gt


class TestLM:
    def test_converges_to_ground_truth(self):
        rng = np.random.default_rng(0)
        prob, cams_gt, pts_gt = make_ba_problem(rng)
        result = lm.solve(prob, max_iters=40)
        assert float(result.cost_final) < float(result.cost_initial) * 1e-3
        # final mean reprojection residual below 0.1 px
        rms = np.sqrt(2 * float(result.cost_final) / prob.obs_uv.shape[0])
        assert rms < 0.1

    def test_gauge_fixed_cameras_untouched(self):
        rng = np.random.default_rng(1)
        prob, cams_gt, pts_gt = make_ba_problem(rng)
        result = lm.solve(prob, max_iters=20)
        np.testing.assert_array_equal(np.asarray(result.cam_params[0]),
                                      np.asarray(prob.cam_params[0]))
        np.testing.assert_array_equal(np.asarray(result.cam_params[1, 3:6]),
                                      np.asarray(prob.cam_params[1, 3:6]))
        # intrinsics frozen (< 10 cams)
        np.testing.assert_array_equal(np.asarray(result.cam_params[:, 6:]),
                                      np.asarray(prob.cam_params[:, 6:]))

    def test_masked_observations_ignored(self):
        rng = np.random.default_rng(2)
        prob, cams_gt, pts_gt = make_ba_problem(rng)
        # corrupt 10% of observations but mask them out
        n = prob.obs_uv.shape[0]
        bad = rng.choice(n, n // 10, replace=False)
        uv = np.asarray(prob.obs_uv).copy()
        uv[bad] += 500.0
        mask = np.ones(n, bool)
        mask[bad] = False
        prob2 = prob._replace(obs_uv=jnp.asarray(uv), obs_mask=jnp.asarray(mask))
        result = lm.solve(prob2, max_iters=40)
        rms = np.sqrt(2 * float(result.cost_final) / mask.sum())
        assert rms < 0.1

    def test_noisy_observations_converge(self):
        rng = np.random.default_rng(3)
        prob, cams_gt, pts_gt = make_ba_problem(rng, px_noise=0.5)
        result = lm.solve(prob, max_iters=40)
        rms = np.sqrt(2 * float(result.cost_final) / prob.obs_uv.shape[0])
        assert rms < 1.0  # should approach the noise floor (~0.5 px)

    def test_residual_matches_reference_model(self):
        """The BA residual must agree with the camera model's projection."""
        rng = np.random.default_rng(4)
        intr = np.array([500.0, 510.0, 320.0, 240.0, 0.01, 0.001], np.float32)
        aa = np.array([0.1, -0.2, 0.3], np.float32)
        t = np.array([0.5, -0.1, 0.2], np.float32)
        pt = np.array([0.4, 0.3, 5.0], np.float32)
        camvec = jnp.asarray(np.concatenate([aa, t, intr]))
        R = se3.angle_axis_to_rotation(jnp.asarray(aa))
        pc = R @ jnp.asarray(pt) + jnp.asarray(t)
        uv_expected = cam.project(jnp.asarray(intr), pc[None])[0]
        res = lm._residual(camvec, jnp.asarray(pt), uv_expected)
        np.testing.assert_allclose(np.asarray(res), 0.0, atol=1e-3)


class TestNativeBABaseline:
    """native/ba_schur.cpp — the Ceres DENSE_SCHUR stand-in the TPU
    solver is benchmarked against — must descend the same problems."""

    def test_native_matches_jax_solution(self):
        pytest.importorskip("ctypes")
        from reconstructor_tpu.io import native as io_native
        if io_native._load() is None:
            pytest.skip("native library unavailable")
        from reconstructor_tpu.eval import ba_native
        prob, cams_gt, pts_gt = make_ba_problem(np.random.default_rng(0))
        om = np.asarray(prob.obs_mask)
        oc = np.asarray(prob.obs_cam)[om]
        op = np.asarray(prob.obs_pt)[om]
        ouv = np.asarray(prob.obs_uv)[om]
        C = int(oc.max()) + 1
        L = int(op.max()) + 1
        r = ba_native.solve_native_ba(
            np.asarray(prob.cam_params)[:C], np.asarray(prob.points)[:L],
            oc, op, ouv, np.asarray(prob.cam_free)[:C], max_iters=60)
        # noise-free problem: the native LM must reach ~zero cost and the
        # ground-truth points (same convergence the JAX solver shows)
        assert r["cost_final"] < 1e-3, r["cost_final"]
        assert np.max(np.abs(r["points"] - pts_gt[:L])) < 1e-2


class TestCompaction:
    def test_compact_solve_matches_full_and_passes_through(self):
        """compact=True must (a) reach the same cost as the uncompacted
        solve, (b) scatter results back to caller shapes, (c) leave
        landmarks/cameras with no live observation untouched."""
        import jax.numpy as jnp
        rng = np.random.default_rng(11)
        prob, cams_gt, pts_gt = make_ba_problem(rng, n_cams=5, n_pts=60)
        # interleave dead entries: mask out every 7th observation, add
        # padding landmarks + a padding camera at the end
        om = np.asarray(prob.obs_mask).copy()
        om[::7] = False
        C = prob.cam_params.shape[0] + 1
        L = prob.points.shape[0] + 13
        cam = np.zeros((C, 12), np.float32)
        cam[:-1] = np.asarray(prob.cam_params)
        cam[-1] = 123.0                       # sentinel: must pass through
        pts = np.zeros((L, 3), np.float32)
        pts[:-13] = np.asarray(prob.points)
        pts[-1] = 77.0                        # sentinel: must pass through
        free = np.zeros((C, 12), np.float32)
        free[:-1] = np.asarray(prob.cam_free)
        p2 = lm.BAProblem(jnp.asarray(cam), jnp.asarray(pts),
                          prob.obs_cam, prob.obs_pt, prob.obs_uv,
                          jnp.asarray(om), jnp.asarray(free))
        r_full = lm.solve(p2, max_iters=20, compact=False,
                          block_dtype="float32")
        r_comp = lm.solve(p2, max_iters=20, compact=True,
                          block_dtype="float32")
        cf, cc = float(r_full.cost_final), float(r_comp.cost_final)
        # equal up to solver noise: relative when meaningfully nonzero,
        # else both at numerical zero
        assert abs(cf - cc) <= max(1e-6, 0.02 * cf), (cf, cc)
        out_pts = np.asarray(r_comp.points)
        out_cam = np.asarray(r_comp.cam_params)
        np.testing.assert_array_equal(out_pts[-1], pts[-1])
        np.testing.assert_array_equal(out_cam[-1], cam[-1])
        assert out_pts.shape == pts.shape and out_cam.shape == cam.shape
