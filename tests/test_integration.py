"""Integration tests: two-view slice on real data + synthetic full pipeline.

These run on CPU (conftest) with reduced capacities so CI stays fast.
"""

import os
import shutil

import numpy as np
import jax.numpy as jnp
import pytest

from reconstructor_tpu.config import ReconstructorConfig
from reconstructor_tpu.pipeline.incremental import IncrementalReconstructor
from reconstructor_tpu.geometry import se3, camera as cam

REF_DATA = "/root/reference/data"


@pytest.fixture(scope="module")
def two_view_folder(tmp_path_factory):
    if not os.path.isdir(REF_DATA):
        pytest.skip("reference dataset unavailable")
    d = tmp_path_factory.mktemp("twoview")
    for f in ["0018.jpg", "0019.jpg"]:
        shutil.copy(os.path.join(REF_DATA, f), d)
    return str(d)


class TestTwoViewRealData:
    """BASELINE config 1: the minimal two-view slice on fountain images."""

    def test_two_view_reconstruction(self, two_view_folder, tmp_path):
        cfg = ReconstructorConfig(max_keypoints=512,
                                  ransac_num_hypotheses=256,
                                  pnp_num_hypotheses=256)
        rec = IncrementalReconstructor(cfg, verbose=False)
        state = rec.detect_features(two_view_folder)
        rec.match_features(state)
        assert state.matches, "no pairs matched"
        i1, i2, rel = rec.choose_initial_pair(state)
        state.poses[i1] = np.eye(4, dtype=np.float32)
        state.poses[i2] = rel
        state.registered = [i1, i2]
        rec.triangulate_initial_pair(state, i1, i2)
        assert state.num_landmarks > 50
        # every landmark must satisfy the creation gates wrt both views
        valid = rec.check_landmark_validity(state)
        assert valid.mean() > 0.95
        # and produce a loadable PLY
        out = str(tmp_path / "two_view.ply")
        from reconstructor_tpu.io import ply
        poses = np.stack([state.poses[i] for i in state.registered])
        ply.save_cloud(out, state.lm_xyz, state.lm_rgb, poses)
        pts, _ = ply.load_cloud(out)
        assert pts.shape[0] == state.num_landmarks + 2


def render_synthetic_views(rng, n_views=4, h=256, w=320, n_pts=300):
    """Render blob images of one 3D point set from several cameras.

    Dense points with per-point intensity/size variation give descriptors
    neighborhood context to match on (isolated identical blobs would be
    inherently ambiguous); small baselines keep appearance change low.
    """
    pts = rng.uniform([-2.0, -1.5, 6.0], [2.0, 1.5, 10.0], (n_pts, 3)).astype(np.float32)
    amp = rng.uniform(0.3, 1.0, n_pts).astype(np.float32)
    sig = rng.uniform(1.3, 3.5, n_pts).astype(np.float32)
    intr = np.asarray(cam.make_intrinsics(h, w, focal_px=300.0))
    imgs, poses = [], []
    yy, xx = np.mgrid[0:h, 0:w]
    for i in range(n_views):
        # baseline 0.45/view at depth 6-10 -> ~3 deg triangulation angles:
        # comfortably above the 1 deg validity gate. (0.3 sat at ~2 deg,
        # where BA on an unlucky initialization could slide the whole
        # structure deeper — reprojection stays sub-pixel under the
        # low-parallax ambiguity — and the angle gate then dropped the
        # entire map; r5 collapse analysis.)
        aa = np.array([0.0, 0.04 * i - 0.06, 0.0], np.float32)
        t = np.array([0.45 * i - 0.675, 0.0, 0.0], np.float32)
        R = np.asarray(se3.angle_axis_to_rotation(jnp.asarray(aa)))
        pc = pts @ R.T + t
        uv = np.asarray(cam.project(jnp.asarray(intr), jnp.asarray(pc)))
        img = np.zeros((h, w), np.float32)
        scale = 300.0 / pc[:, 2]
        for (u, v), a, s, sc in zip(uv, amp, sig, scale):
            if 5 < u < w - 5 and 5 < v < h - 5:
                s_px = s * sc / 50.0 + 1.2
                img += a * np.exp(-((yy - v) ** 2 + (xx - u) ** 2) / (2 * s_px ** 2))
        imgs.append(np.clip(img, 0, 1))
        poses.append(np.asarray(se3.make_pose(jnp.asarray(R), jnp.asarray(t))))
    return imgs, np.stack(poses), intr, pts


class TestInjectedSyntheticScene:
    """Feature-level synthetic scene with exact ground truth: the pipeline
    must recover correspondence (kNN + ratio + epipolar gate), reject all
    clutter, register every view and hit near-zero ATE."""

    def test_ground_truth_recovery(self):
        from reconstructor_tpu.eval.synth import make_synthetic_state, pose_ate
        state, gt_poses, _ = make_synthetic_state(
            n_views=6, n_points=200, clutter=24, seed=3)
        cfg = ReconstructorConfig(max_keypoints=state.max_keypoints,
                                  focal_px=520.0)
        rec = IncrementalReconstructor(cfg, verbose=False)
        state = rec.reconstruct_from_state(state)
        assert len(state.registered) == 6
        # every landmark is a true scene point (clutter rejected)
        assert state.num_landmarks <= 200
        assert state.num_landmarks > 120
        res = pose_ate(state.poses, gt_poses)
        assert res["ate_rmse_normalized"] < 0.005

    def test_retrieval_pair_selection_pipeline(self):
        """Retrieval pair selection must prune the pair set while still
        registering every view (the reference's FAISS TODO, README:40 —
        wired as a first-class matchImages strategy)."""
        from reconstructor_tpu.eval.synth import make_synthetic_state, pose_ate
        state, gt_poses, _ = make_synthetic_state(
            n_views=6, n_points=200, clutter=24, seed=3)
        cfg = ReconstructorConfig(max_keypoints=state.max_keypoints,
                                  focal_px=520.0,
                                  pair_selection="retrieval",
                                  retrieval_top_k=3)
        rec = IncrementalReconstructor(cfg, verbose=False)
        assert rec.select_pairs(state).shape[0] < 15  # pruned vs exhaustive
        state = rec.reconstruct_from_state(state)
        assert len(state.registered) == 6
        res = pose_ate(state.poses, gt_poses)
        assert res["ate_rmse_normalized"] < 0.01

    def test_local_ba_matches_global_quality(self):
        """Windowed local BA + periodic global must reach the same ATE."""
        from reconstructor_tpu.eval.synth import make_synthetic_state, pose_ate
        state, gt_poses, _ = make_synthetic_state(
            n_views=9, n_points=220, clutter=16, seed=4)
        cfg = ReconstructorConfig(max_keypoints=state.max_keypoints,
                                  focal_px=520.0,
                                  ba_local_window=4, ba_global_every=5,
                                  final_refinement_rounds=1)
        rec = IncrementalReconstructor(cfg, verbose=False)
        state = rec.reconstruct_from_state(state)
        assert len(state.registered) == 9
        res = pose_ate(state.poses, gt_poses)
        assert res["ate_rmse_normalized"] < 0.005


class TestSyntheticPipeline:
    def test_full_pipeline_recovers_geometry(self, tmp_path):
        rng = np.random.default_rng(11)
        imgs, poses_gt, intr, pts_gt = render_synthetic_views(rng)
        d = tmp_path / "views"
        d.mkdir()
        from PIL import Image
        for i, im in enumerate(imgs):
            Image.fromarray((im * 255).astype(np.uint8)).convert("RGB").save(
                str(d / f"{i:02d}.png"))
        cfg = ReconstructorConfig(max_keypoints=256,
                                  ransac_num_hypotheses=256,
                                  pnp_num_hypotheses=256,
                                  focal_px=300.0,
                                  pnp_min_inliers=8,
                                  min_2d3d_match_num=5)
        rec = IncrementalReconstructor(cfg, verbose=False)
        state = rec.reconstruct(str(d))
        assert len(state.registered) >= 3
        assert state.num_landmarks > 20
        # relative camera geometry should match ground truth up to scale:
        # compare angles between camera-center baselines
        reg = sorted(state.registered)
        est = np.stack([-state.poses[i][:3, :3].T @ state.poses[i][:3, 3]
                        for i in reg])
        gt = np.stack([-poses_gt[i][:3, :3].T @ poses_gt[i][:3, 3]
                       for i in reg])
        e = est[1:] - est[0]
        g = gt[1:] - gt[0]
        e = e / np.linalg.norm(e, axis=1, keepdims=True)
        g = g / np.linalg.norm(g, axis=1, keepdims=True)
        # baseline directions agree within 10 degrees
        cos = np.abs((e * g).sum(1))
        assert np.all(cos > np.cos(np.deg2rad(10)))


class TestCheckpointResume:
    """An interrupted run resumed from its autosave must reproduce the
    uninterrupted run exactly (same state, same RNG stream -> identical
    registrations, landmarks and poses)."""

    def _config(self):
        from reconstructor_tpu.config import ReconstructorConfig
        return ReconstructorConfig(
            max_keypoints=320, ransac_num_hypotheses=256,
            fundamental_num_hypotheses=128, pnp_num_hypotheses=256,
            ba_max_iters_small=20, ba_max_iters_large=20,
            final_refinement_rounds=1, min_2d3d_match_num=10,
            pnp_min_inliers=8)

    def test_resume_reproduces_uninterrupted_run(self, tmp_path):
        import copy
        from reconstructor_tpu.eval.synth import make_synthetic_state
        from reconstructor_tpu.pipeline import checkpoint
        from reconstructor_tpu.pipeline.incremental import IncrementalReconstructor

        def fresh_state():
            state, _, _ = make_synthetic_state(
                n_views=6, n_points=250, clutter=16, seed=11)
            return state

        ckpt = str(tmp_path / "run.npz")

        # straight-through run with autosaving
        rec_a = IncrementalReconstructor(self._config(), verbose=False)
        final_a = rec_a.reconstruct_from_state(fresh_state(),
                                               checkpoint_path=ckpt)

        # "interrupted" run: stop after the initial pair + 2 views by
        # replaying from an early checkpoint copy
        rec_b = IncrementalReconstructor(self._config(), verbose=False)
        state_b = fresh_state()
        rec_b.match_features(state_b)
        rec_b._presize_caps(state_b)
        i1, i2, rel = rec_b.choose_initial_pair(state_b)
        state_b.poses[i1] = np.eye(4, dtype=np.float32)
        state_b.poses[i2] = rel
        state_b.registered = [i1, i2]
        rec_b.triangulate_initial_pair(state_b, i1, i2)
        for _ in range(2):
            rec_b.add_next_view(state_b)
            rec_b.check_landmark_validity(state_b, drop=True)
            rec_b.bundle_adjust(state_b)
            keep = rec_b.check_landmark_validity(state_b, drop=True)
            state_b.remove_landmarks(keep)
            rec_b.complete_tracks(state_b)
        # NOTE: this manual prefix intentionally mirrors the loop body in
        # reconstruct_from_state; the point is only to produce a plausible
        # mid-run checkpoint, then verify save->load round-trips exactly.
        mid = str(tmp_path / "mid.npz")
        checkpoint.save(mid, state_b, config=rec_b.config,
                        rng_key=rec_b._key, caps=rec_b._caps)

        state_c = checkpoint.load(mid)
        rec_c = IncrementalReconstructor(self._config(), verbose=False)
        rec_c._key = checkpoint.load_rng_key(mid)
        rec_c._caps.update(checkpoint.load_meta(mid).get("caps", {}))
        # loaded state must equal the saved one field-for-field
        np.testing.assert_array_equal(state_c.lm_xyz, state_b.lm_xyz)
        np.testing.assert_array_equal(state_c.feat2lm, state_b.feat2lm)
        assert state_c.registered == state_b.registered

        final_b = rec_c.reconstruct_from_state(state_c)
        assert sorted(final_b.registered) == sorted(final_a.registered)
        assert final_b.num_landmarks == final_a.num_landmarks
        for i in final_a.registered:
            np.testing.assert_allclose(final_b.poses[i], final_a.poses[i],
                                       atol=1e-5)


class TestBASolverDispatch:
    """Above the dense-W memory budget, bundle_adjust must route to the
    implicit-Schur PCG solver and still converge (the 100-view stress
    OOMed 16 GB HBM materializing the (C*12, L*3) coupling)."""

    def test_pcg_dispatch_matches_dense(self):
        from reconstructor_tpu.eval.synth import make_synthetic_state, pose_ate
        state, gt_poses, _ = make_synthetic_state(
            n_views=6, n_points=200, clutter=24, seed=3)
        cfg = ReconstructorConfig(max_keypoints=state.max_keypoints,
                                  focal_px=520.0,
                                  ba_dense_w_max_elems=1)  # force PCG
        rec = IncrementalReconstructor(cfg, verbose=False)
        state = rec.reconstruct_from_state(state)
        assert len(state.registered) == 6
        res = pose_ate(state.poses, gt_poses)
        assert res["ate_rmse_normalized"] < 0.01, res
