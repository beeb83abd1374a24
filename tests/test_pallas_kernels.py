"""Pallas kernel parity tests (interpret mode on CPU; compiled on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from reconstructor_tpu.matching import superglue as sg
from reconstructor_tpu.matching import pallas_sinkhorn as ps


class TestFusedSinkhorn:
    def test_matches_xla_reference(self):
        rng = np.random.default_rng(0)
        M, N = 48, 40
        scores = jnp.asarray(rng.standard_normal((M, N)).astype(np.float32))
        alpha = jnp.asarray(0.7, jnp.float32)
        mask0 = jnp.asarray(np.arange(M) < 44)
        mask1 = jnp.asarray(np.arange(N) < 36)
        Z_ref = sg.log_sinkhorn(scores, alpha, mask0, mask1, 60)
        Z_pal = ps.log_sinkhorn_fused(scores, alpha, mask0, mask1, 60,
                                      interpret=True)
        np.testing.assert_allclose(np.asarray(Z_pal), np.asarray(Z_ref),
                                   atol=1e-4)

    def test_marginals(self):
        rng = np.random.default_rng(1)
        M, N = 32, 32
        scores = jnp.asarray(rng.standard_normal((M, N)).astype(np.float32))
        Z = ps.log_sinkhorn_fused(scores, jnp.asarray(0.5), jnp.ones(M, bool),
                                  jnp.ones(N, bool), 100, interpret=True)
        P = np.exp(np.asarray(Z))
        np.testing.assert_allclose(P[:-1].sum(axis=1), 1.0, rtol=1e-3)
        np.testing.assert_allclose(P[:, :-1].sum(axis=0), 1.0, rtol=1e-3)


class TestPallasKnn:
    def test_fused_matches_xla_path(self):
        from reconstructor_tpu.matching import knn, pallas_knn
        rng = np.random.default_rng(11)
        N, K, D = 5, 256, 128
        desc = rng.standard_normal((N, K, D)).astype(np.float32)
        desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
        mask = rng.uniform(size=(N, K)) < 0.8
        pair_idx = np.array([[0, 1], [2, 3], [1, 4], [3, 0]], np.int32)
        for cross in (True, False):
            ri, rm = knn.match_all_pairs(
                jnp.asarray(desc), jnp.asarray(mask), jnp.asarray(pair_idx),
                ratio_thresh=0.8, cross_check=cross)
            fi, fm = pallas_knn.match_all_pairs_fused(
                jnp.asarray(desc), jnp.asarray(mask), jnp.asarray(pair_idx),
                ratio_thresh=0.8, cross_check=cross, interpret=True)
            np.testing.assert_array_equal(np.asarray(rm), np.asarray(fm))
            np.testing.assert_array_equal(np.asarray(ri), np.asarray(fi))

    def test_fused_fully_masked_image(self):
        from reconstructor_tpu.matching import pallas_knn
        rng = np.random.default_rng(12)
        N, K, D = 2, 128, 128
        desc = rng.standard_normal((N, K, D)).astype(np.float32)
        mask = np.zeros((N, K), bool)
        mask[0] = True  # image 1 has no valid keypoints
        fi, fm = pallas_knn.match_all_pairs_fused(
            jnp.asarray(desc), jnp.asarray(mask),
            jnp.asarray([[0, 1]], np.int32), interpret=True)
        assert not np.asarray(fm).any()
        assert (np.asarray(fi) == -1).all()


def test_fused_kernel_K_not_multiple_of_256():
    """K a multiple of 128 but not 256 (e.g. 2176 in the 100-view
    stress) must pick a row tile that divides K — the floor-divided grid
    silently skipped the last rows and hung the remote compiler."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from reconstructor_tpu.matching import knn, pallas_knn
    rng = np.random.default_rng(0)
    K = 384  # 3 x 128
    assert pallas_knn.supported(K, 128)
    base = rng.standard_normal((K, 128)).astype(np.float32)
    desc = np.stack([base + 0.1 * rng.standard_normal((K, 128)).astype(np.float32)
                     for _ in range(2)])
    desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
    mask = np.ones((2, K), bool)
    pairs = jnp.asarray([[0, 1]], np.int32)
    mf, _ = pallas_knn.match_all_pairs_fused(jnp.asarray(desc), mask, pairs,
                                             interpret=True)
    mx, _ = knn.match_all_pairs(jnp.asarray(desc), jnp.asarray(mask), pairs)
    assert (np.asarray(mf) == np.asarray(mx)).all()


def test_fused_single_valid_column_ratio_passes():
    """One valid keypoint in image j: the 'second best' is the masked
    sentinel (effectively infinite), so the ratio test must PASS for the
    lone candidate — the packed kernel's reserved DMAX sentinel must
    reproduce the float kernel's 1e30 semantics here."""
    from reconstructor_tpu.matching import knn, pallas_knn
    rng = np.random.default_rng(13)
    N, K, D = 2, 128, 128
    desc = rng.standard_normal((N, K, D)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
    desc[1, 0] = desc[0, 5]          # the lone valid slot matches kp 5
    mask = np.zeros((N, K), bool)
    mask[0] = True
    mask[1, 0] = True
    pair_idx = jnp.asarray([[0, 1]], np.int32)
    ri, rm = knn.match_all_pairs(
        jnp.asarray(desc), jnp.asarray(mask), pair_idx,
        ratio_thresh=0.7, cross_check=True)
    fi, fm = pallas_knn.match_all_pairs_fused(
        jnp.asarray(desc), jnp.asarray(mask), pair_idx,
        ratio_thresh=0.7, cross_check=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(rm), np.asarray(fm))
    np.testing.assert_array_equal(np.asarray(ri), np.asarray(fi))
    assert np.asarray(fm)[0, 5]      # the lone match survived the ratio
