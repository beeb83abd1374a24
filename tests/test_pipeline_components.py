"""Tests for pipeline plumbing: state, checkpoint, viz, CLI, retrieval."""

import os

import numpy as np
import pytest

from reconstructor_tpu.pipeline.state import ReconstructionState, MAX_VIEWS_PER_LANDMARK
from reconstructor_tpu.pipeline import checkpoint
from reconstructor_tpu.matching import pairs as pairing
from reconstructor_tpu.io import ply


def tiny_state(n=3, k=16):
    rng = np.random.default_rng(0)
    st = ReconstructionState(
        num_images=n, max_keypoints=k,
        xy=rng.uniform(0, 100, (n, k, 2)).astype(np.float32),
        desc=rng.standard_normal((n, k, 8)).astype(np.float32),
        kp_mask=np.ones((n, k), bool),
        colors=rng.integers(0, 255, (n, k, 3)).astype(np.uint8),
        shapes=np.full((n, 2), 100, np.int32),
        intrinsics=np.tile(np.array([100, 100, 50, 50, 0, 0], np.float32), (n, 1)),
        kp_score=rng.uniform(0, 1, (n, k)).astype(np.float32))
    return st


class TestState:
    def test_add_and_remove_landmarks(self):
        st = tiny_state()
        V = MAX_VIEWS_PER_LANDMARK
        obs_img = np.zeros((2, V), np.int32)
        obs_feat = np.zeros((2, V), np.int32)
        obs_mask = np.zeros((2, V), bool)
        obs_img[0, :2] = [0, 1]; obs_feat[0, :2] = [3, 4]; obs_mask[0, :2] = True
        obs_img[1, :2] = [1, 2]; obs_feat[1, :2] = [5, 6]; obs_mask[1, :2] = True
        ids = st.add_landmarks(np.zeros((2, 3)), np.zeros((2, 3)),
                               obs_img, obs_feat, obs_mask)
        assert st.num_landmarks == 2
        assert st.feat2lm[0, 3] == ids[0] and st.feat2lm[1, 5] == ids[1]
        st.remove_landmarks(np.array([False, True]))
        assert st.num_landmarks == 1
        assert st.feat2lm[0, 3] == -1          # freed
        assert st.feat2lm[1, 5] == 0           # reindexed

    def test_match_lookup_mirror(self):
        st = tiny_state()
        m = np.full(st.max_keypoints, -1, np.int32)
        m[2] = 7
        st.matches[(0, 1)] = m
        inv = st.match_lookup(1, 0)
        assert inv[7] == 2
        assert (inv >= 0).sum() == 1

    def test_drop_observations(self):
        st = tiny_state()
        V = MAX_VIEWS_PER_LANDMARK
        obs_img = np.zeros((1, V), np.int32)
        obs_feat = np.zeros((1, V), np.int32)
        obs_mask = np.zeros((1, V), bool)
        obs_img[0, :3] = [0, 1, 2]; obs_feat[0, :3] = [1, 2, 3]; obs_mask[0, :3] = True
        st.add_landmarks(np.zeros((1, 3)), np.zeros((1, 3)),
                         obs_img, obs_feat, obs_mask)
        drop = np.zeros_like(st.lm_obs_mask)
        drop[0, 1] = True
        st.drop_observations(drop)
        assert st.feat2lm[1, 2] == -1
        assert st.lm_obs_mask[0].sum() == 2


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        st = tiny_state()
        m = np.full(st.max_keypoints, -1, np.int32); m[0] = 1
        st.matches[(0, 2)] = m
        st.poses[0] = np.eye(4, dtype=np.float32)
        st.registered = [0]
        V = MAX_VIEWS_PER_LANDMARK
        obs_img = np.zeros((1, V), np.int32); obs_feat = np.zeros((1, V), np.int32)
        obs_mask = np.zeros((1, V), bool); obs_mask[0, :2] = True
        obs_img[0, :2] = [0, 1]; obs_feat[0, :2] = [3, 4]
        st.add_landmarks(np.ones((1, 3)), np.zeros((1, 3)), obs_img, obs_feat, obs_mask)

        p = str(tmp_path / "ck.npz")
        checkpoint.save(p, st)
        st2 = checkpoint.load(p)
        assert st2.num_images == st.num_images
        np.testing.assert_array_equal(st2.xy, st.xy)
        np.testing.assert_array_equal(st2.matches[(0, 2)], m)
        np.testing.assert_array_equal(st2.poses[0], np.eye(4))
        assert st2.registered == [0]
        assert st2.num_landmarks == 1
        np.testing.assert_array_equal(st2.feat2lm, st.feat2lm)


class TestRetrievalPairs:
    def test_selects_similar_images(self):
        rng = np.random.default_rng(1)
        # images 0,1 share a descriptor cluster; 2,3 share another
        base_a = rng.standard_normal(16)
        base_b = rng.standard_normal(16)
        desc = np.zeros((4, 8, 16), np.float32)
        for i, base in enumerate([base_a, base_a, base_b, base_b]):
            desc[i] = base + 0.05 * rng.standard_normal((8, 16))
        desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
        mask = np.ones((4, 8), bool)
        p = pairing.retrieval_pairs(desc, mask, top_k=1)
        pset = {tuple(x) for x in p}
        assert (0, 1) in pset and (2, 3) in pset

    def test_exhaustive_structure(self):
        p = pairing.exhaustive_pairs(5)
        assert p.shape == (10, 2)
        assert np.all(p[:, 0] < p[:, 1])


class TestViz:
    def test_draw_pair(self):
        from reconstructor_tpu.utils import viz
        rng = np.random.default_rng(2)
        rgb = (rng.uniform(0, 255, (50, 60, 3))).astype(np.uint8)
        img = viz.draw_pair_matches(rgb, rgb, np.array([[10., 10.]]),
                                    np.array([[20., 20.]]))
        assert img.size == (120, 50)


class TestCLI:
    def test_parser(self):
        from reconstructor_tpu.cli import build_parser
        args = build_parser().parse_args(["in", "out", "--detector", "sift",
                                          "--max-keypoints", "512"])
        assert args.detector == "sift" and args.max_keypoints == 512


class TestPLY:
    def test_roundtrip_with_cameras(self, tmp_path):
        rng = np.random.default_rng(3)
        pts = rng.standard_normal((10, 3)).astype(np.float32)
        cols = rng.integers(0, 255, (10, 3)).astype(np.uint8)
        poses = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
        poses[1, :3, 3] = [1, 2, 3]
        p = str(tmp_path / "c.ply")
        ply.save_cloud(p, pts, cols, poses)
        pts2, cols2 = ply.load_cloud(p)
        assert pts2.shape[0] == 12
        np.testing.assert_allclose(pts2[:10], pts, atol=1e-4)
        # camera points are green
        np.testing.assert_array_equal(cols2[10:], [[0, 250, 0]] * 2)
        # second camera center = -R^T t = -t for identity R
        np.testing.assert_allclose(pts2[11], [-1, -2, -3], atol=1e-5)


class TestRunReport:
    def test_report_written(self, tmp_path):
        import json
        from tests.test_integration import render_synthetic_views
        from PIL import Image
        from reconstructor_tpu.config import ReconstructorConfig
        from reconstructor_tpu.pipeline.incremental import IncrementalReconstructor

        rng = np.random.default_rng(5)
        imgs, _, _, _ = render_synthetic_views(rng, n_views=3)
        d = tmp_path / "imgs"; d.mkdir()
        for i, im in enumerate(imgs):
            Image.fromarray((im * 255).astype(np.uint8)).convert("RGB").save(
                str(d / f"{i:02d}.png"))
        cfg = ReconstructorConfig(max_keypoints=256, ransac_num_hypotheses=256,
                                  pnp_num_hypotheses=256, focal_px=300.0,
                                  pnp_min_inliers=8, min_2d3d_match_num=5)
        rec = IncrementalReconstructor(cfg, verbose=False)
        rec.reconstruct(str(d), out_folder=str(tmp_path / "out"))
        report = json.load(open(tmp_path / "out" / "report.json"))
        assert report["num_images"] == 3
        assert "feature extraction" in report["stage_timings_ms"]
        assert report["num_landmarks"] > 0


class TestKeypointTrim:
    """match_features trims the keypoint axis to real occupancy (detection
    emits top_k-sorted slots, so valid keypoints are a prefix); results
    must be identical to the untrimmed capacity run, padded back to K."""

    def test_trimmed_matches_equal_untrimmed(self):
        from reconstructor_tpu.config import ReconstructorConfig
        from reconstructor_tpu.pipeline.incremental import IncrementalReconstructor
        from reconstructor_tpu.matching import knn
        import jax.numpy as jnp

        rng = np.random.default_rng(3)
        n, k_cap, k_real, d = 4, 1024, 300, 8
        st = tiny_state(n=n, k=k_cap)
        # overwrite with structured descriptors: images share a common
        # bank so real cross-image matches exist
        bank = rng.standard_normal((k_real, d)).astype(np.float32)
        desc = np.zeros((n, k_cap, d), np.float32)
        mask = np.zeros((n, k_cap), bool)
        for i in range(n):
            desc[i, :k_real] = bank + 0.05 * rng.standard_normal((k_real, d))
            mask[i, :k_real] = True
        desc /= np.maximum(np.linalg.norm(desc, axis=-1, keepdims=True), 1e-9)
        st.desc, st.kp_mask = desc, mask
        st.xy = rng.uniform(0, 100, (n, k_cap, 2)).astype(np.float32)

        cfg = ReconstructorConfig(max_keypoints=k_cap)
        rec = IncrementalReconstructor(cfg, verbose=False)
        rec.match_features(st, filter=False)

        # trim must have engaged: cached device desc is (n, 512, d)
        assert st._dev_frontend[1].shape[1] == 512

        pair_idx = pairing.exhaustive_pairs(n)
        ref_idx, ref_mask = knn.match_all_pairs(
            jnp.asarray(desc), jnp.asarray(mask), jnp.asarray(pair_idx),
            ratio_thresh=cfg.ratio_thresh, cross_check=cfg.cross_check)
        ref_idx, ref_mask = np.asarray(ref_idx), np.asarray(ref_mask)
        for p, (i, j) in enumerate(pair_idx):
            want = np.where(ref_mask[p], ref_idx[p], -1)
            got = st.matches.get((int(i), int(j)))
            if got is None:
                assert (want < 0).all()
            else:
                assert got.shape == (k_cap,)
                np.testing.assert_array_equal(got, want)
