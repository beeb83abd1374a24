"""Sharded matching + distributed BA on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reconstructor_tpu.ba import lm, distributed
from reconstructor_tpu.parallel import sharding
from tests.test_ba import make_ba_problem


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return sharding.make_mesh(8)


class TestShardedMatching:
    def test_matches_equal_single_device(self, mesh):
        rng = np.random.default_rng(0)
        desc = rng.standard_normal((6, 64, 32)).astype(np.float32)
        desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
        mask = np.ones((6, 64), bool)
        from reconstructor_tpu.matching import knn, pairs
        p = pairs.exhaustive_pairs(6)  # 15 pairs -> padded to 16
        midx_ref, mmask_ref = knn.match_all_pairs(
            jnp.asarray(desc), jnp.asarray(mask), jnp.asarray(p))
        midx, mmask = sharding.match_all_pairs_sharded(mesh, desc, mask, p)
        np.testing.assert_array_equal(midx, np.asarray(midx_ref))
        np.testing.assert_array_equal(mmask, np.asarray(mmask_ref))


class TestDistributedBA:
    def test_pcg_matches_dense_schur(self):
        rng = np.random.default_rng(1)
        prob, cams_gt, pts_gt = make_ba_problem(rng, n_cams=4, n_pts=100)
        dense = lm.solve(prob, max_iters=30)
        pcg = distributed.solve_pcg(prob, max_iters=30, cg_iters=100, cg_tol=1e-8)
        rms_d = np.sqrt(2 * float(dense.cost_final) / prob.obs_uv.shape[0])
        rms_p = np.sqrt(2 * float(pcg.cost_final) / prob.obs_uv.shape[0])
        assert rms_p < 0.1 and rms_d < 0.1

    def test_sharded_solve_runs_and_converges(self, mesh):
        rng = np.random.default_rng(2)
        prob, cams_gt, pts_gt = make_ba_problem(rng, n_cams=4, n_pts=128)
        # pad observations to a multiple of 8 for even sharding
        O = prob.obs_uv.shape[0]
        O_pad = ((O + 7) // 8) * 8
        pad = O_pad - O
        prob = prob._replace(
            obs_cam=jnp.pad(prob.obs_cam, (0, pad)),
            obs_pt=jnp.pad(prob.obs_pt, (0, pad)),
            obs_uv=jnp.pad(prob.obs_uv, ((0, pad), (0, 0))),
            obs_mask=jnp.pad(prob.obs_mask, (0, pad)),
        )
        result = distributed.solve_distributed(mesh, prob, max_iters=30,
                                               cg_iters=100, cg_tol=1e-8)
        rms = np.sqrt(2 * float(result.cost_final) / O)
        assert rms < 0.1

    def test_gauge_respected(self):
        rng = np.random.default_rng(3)
        prob, _, _ = make_ba_problem(rng, n_cams=4, n_pts=64)
        result = distributed.solve_pcg(prob, max_iters=10)
        np.testing.assert_array_equal(np.asarray(result.cam_params[0]),
                                      np.asarray(prob.cam_params[0]))


class TestMeshPipeline:
    def test_pipeline_with_mesh_matches_and_ba(self, mesh, tmp_path):
        """Full pipeline driving sharded matching + distributed BA on the
        virtual mesh (synthetic views)."""
        import numpy as np
        from tests.test_integration import render_synthetic_views
        from PIL import Image
        from reconstructor_tpu.config import ReconstructorConfig
        from reconstructor_tpu.pipeline.incremental import IncrementalReconstructor

        rng = np.random.default_rng(21)
        imgs, poses_gt, intr, pts_gt = render_synthetic_views(rng, n_views=3)
        d = tmp_path / "views"
        d.mkdir()
        for i, im in enumerate(imgs):
            Image.fromarray((im * 255).astype(np.uint8)).convert("RGB").save(
                str(d / f"{i:02d}.png"))
        cfg = ReconstructorConfig(max_keypoints=256, ransac_num_hypotheses=256,
                                  pnp_num_hypotheses=256, focal_px=300.0,
                                  pnp_min_inliers=8, min_2d3d_match_num=5)
        rec = IncrementalReconstructor(cfg, verbose=False, mesh=mesh)
        state = rec.reconstruct(str(d))
        assert len(state.registered) >= 2
        assert state.num_landmarks > 10


class TestShardedMatchAndGate:
    def test_equals_single_device(self, mesh):
        """The sharded fused match+gate must reproduce the single-device
        program bit-for-bit (same keys -> same RANSAC -> same inliers)."""
        import jax
        import jax.numpy as jnp
        from reconstructor_tpu.matching import gated, pairs

        rng = np.random.default_rng(3)
        n_img, K, D = 6, 64, 32
        desc = rng.standard_normal((n_img, K, D)).astype(np.float32)
        desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
        mask = np.ones((n_img, K), bool)
        xy = rng.uniform(0, 256, (n_img, K, 2)).astype(np.float32)
        p = pairs.exhaustive_pairs(n_img)
        B = ((p.shape[0] + 7) // 8) * 8
        chunk = np.zeros((B, 2), np.int32)
        chunk[: p.shape[0]] = p
        keys = jax.random.split(jax.random.PRNGKey(7), B)
        kw = dict(ratio_thresh=0.9, cross_check=True, use_fused=False,
                  num_hypotheses=64, thresh_px=3.0, min_matches=7)
        ref_idx, ref_cnt = gated.match_and_gate_jit(
            keys, jnp.asarray(desc), jnp.asarray(mask), jnp.asarray(xy),
            jnp.asarray(chunk), **kw)
        sh_idx, sh_cnt = sharding.match_and_gate_sharded(
            mesh, jnp.asarray(desc), jnp.asarray(mask), jnp.asarray(xy),
            jnp.asarray(chunk), keys, **kw)
        np.testing.assert_array_equal(np.asarray(sh_idx), np.asarray(ref_idx))
        np.testing.assert_array_equal(np.asarray(sh_cnt), np.asarray(ref_cnt))


class TestShardedSuperGlue:
    def test_superglue_matches_equal_single_device(self, mesh):
        """shard_map SuperGlue == plain chunked dispatch (VERDICT r3 #6:
        the reference's OpenMP pair loop covers SuperGlue too,
        SequentialReconstructor.cpp:202)."""
        import jax
        import jax.numpy as jnp
        from reconstructor_tpu.matching import pairs
        from reconstructor_tpu.matching import superglue as sg

        rng = np.random.default_rng(5)
        n_img, K, D = 6, 32, 256
        desc = rng.standard_normal((n_img, K, D)).astype(np.float32)
        desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
        xy = rng.uniform(0, 256, (n_img, K, 2)).astype(np.float32)
        score = rng.uniform(0.2, 1.0, (n_img, K)).astype(np.float32)
        kmask = np.ones((n_img, K), bool)
        shapes = np.full((n_img, 2), 256, np.int32)
        params = sg.structured_identity_params()
        p = pairs.exhaustive_pairs(n_img)
        B = ((p.shape[0] + 7) // 8) * 8
        chunk = np.zeros((B, 2), np.int32)
        chunk[: p.shape[0]] = p
        args = (jnp.asarray(desc), jnp.asarray(xy), jnp.asarray(score),
                jnp.asarray(kmask), jnp.asarray(shapes), jnp.asarray(chunk))
        ref_idx, ref_ok, ref_sc = sg.match_pairs_batched(
            params, *args, sinkhorn_iters=10, score_thresh=0.2,
            use_pallas=False)
        sh_idx, sh_ok, sh_sc = sharding.match_superglue_sharded(
            mesh, params, *args, sinkhorn_iters=10, score_thresh=0.2,
            use_pallas=False)
        np.testing.assert_array_equal(np.asarray(sh_idx), np.asarray(ref_idx))
        np.testing.assert_array_equal(np.asarray(sh_ok), np.asarray(ref_ok))
        np.testing.assert_allclose(np.asarray(sh_sc), np.asarray(ref_sc),
                                   atol=1e-5)
