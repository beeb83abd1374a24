"""Tests for the SIFT-style frontend and kNN matcher on synthetic images."""

import numpy as np
import jax
import jax.numpy as jnp

from reconstructor_tpu.features import sift
from reconstructor_tpu.matching import knn, pairs
from reconstructor_tpu.io import images as io_images


def make_blob_image(rng, h=128, w=160, n_blobs=None, grid=24):
    """Image with well-separated Gaussian blobs — ideal DoG targets.

    Blobs sit on a jittered grid so they never overlap (overlapping blobs
    legitimately merge into one extremum and would make recall flaky).
    """
    img = np.zeros((h, w), np.float32)
    yy, xx = np.mgrid[0:h, 0:w]
    centers = []
    for gy in range(16, h - 16, grid):
        for gx in range(16, w - 16, grid):
            y = gy + rng.uniform(-4, 4)
            x = gx + rng.uniform(-4, 4)
            s = rng.uniform(2.0, 3.2)
            img += rng.uniform(0.5, 1.0) * np.exp(
                -((yy - y) ** 2 + (xx - x) ** 2) / (2 * s * s))
            centers.append((x, y))
    if n_blobs is not None:
        centers = centers[:n_blobs]
    return np.clip(img, 0, 1), np.asarray(centers)


class TestSift:
    def test_detects_blob_centers(self):
        rng = np.random.default_rng(0)
        img, centers = make_blob_image(rng)
        gray = jnp.asarray(img)[None]
        shapes = jnp.asarray([[img.shape[0], img.shape[1]]], jnp.int32)
        feats = sift.detect_and_describe(gray, shapes, max_keypoints=256)
        xy = np.asarray(feats.xy[0])[np.asarray(feats.mask[0])]
        assert xy.shape[0] >= 20
        # every blob center should have a detection within 3 px
        d = np.linalg.norm(centers[:, None, :] - xy[None, :, :], axis=-1).min(axis=1)
        assert (d < 3.0).mean() > 0.7

    def test_mask_and_border(self):
        rng = np.random.default_rng(1)
        img, _ = make_blob_image(rng)
        gray = jnp.asarray(img)[None]
        shapes = jnp.asarray([[96, 128]], jnp.int32)  # claim smaller valid area
        feats = sift.detect_and_describe(gray, shapes, max_keypoints=256)
        xy = np.asarray(feats.xy[0])[np.asarray(feats.mask[0])]
        assert np.all(xy[:, 0] < 128 - 8) and np.all(xy[:, 1] < 96 - 8)
        assert np.all(xy[:, 0] >= 8) and np.all(xy[:, 1] >= 8)

    def test_pitch_resample_exact(self):
        """Resampled levels must equal bilinear samples of the original."""
        rng = np.random.default_rng(5)
        gauss = jnp.asarray(rng.standard_normal((4, 40, 56)).astype(np.float32))
        sigma_list = [0.8 * 2 ** (i / 3.0) for i in range(4)]
        rs, pitches, lims = sift._resample_pitch_levels(gauss, sigma_list, 1, 3)
        rs, pitches, lims = np.asarray(rs), np.asarray(pitches), np.asarray(lims)
        g = np.asarray(gauss)
        for rel, s in enumerate(range(1, 3)):
            p = pitches[rel]
            for u, v in [(0, 0), (3, 7), (17, 29), (31, 50)]:
                if u >= lims[rel, 0] or v >= lims[rel, 1]:
                    continue  # outside this level's own grid (r4 sizing)
                yc = min(u * p, 39.0); xc = min(v * p, 55.0)
                y0, x0 = int(min(yc, 38)), int(min(xc, 54))
                fy, fx = yc - y0, xc - x0
                want = (g[s, y0, x0] * (1-fy) * (1-fx) + g[s, y0, x0+1] * (1-fy) * fx
                        + g[s, y0+1, x0] * fy * (1-fx) + g[s, y0+1, x0+1] * fy * fx)
                np.testing.assert_allclose(rs[rel, u, v], want, rtol=2e-5, atol=2e-5)

    def test_descriptor_rotation_invariance(self):
        """90-degree rotated image: descriptors of the same blobs match."""
        rng = np.random.default_rng(6)
        img, _ = make_blob_image(rng)
        rot = np.rot90(img).copy()
        h = max(img.shape[0], rot.shape[0]); w = max(img.shape[1], rot.shape[1])
        batch = np.zeros((2, h, w), np.float32)
        batch[0, :img.shape[0], :img.shape[1]] = img
        batch[1, :rot.shape[0], :rot.shape[1]] = rot
        shapes = jnp.asarray([[img.shape[0], img.shape[1]],
                              [rot.shape[0], rot.shape[1]]], jnp.int32)
        feats = sift.detect_and_describe(jnp.asarray(batch), shapes,
                                         max_keypoints=128)
        midx, mmask = knn.match_pair(feats.desc[0], feats.desc[1],
                                     feats.mask[0], feats.mask[1],
                                     ratio_thresh=0.8)
        midx, mmask = np.asarray(midx), np.asarray(mmask)
        xy0 = np.asarray(feats.xy[0]); xy1 = np.asarray(feats.xy[1])
        n_checked = n_good = 0
        for i in np.nonzero(mmask)[0]:
            x, y = xy0[i]
            # (x, y) -> rot90 coords: (y, W-1-x)
            xr, yr = y, img.shape[1] - 1 - x
            n_checked += 1
            n_good += np.hypot(*(xy1[midx[i]] - [xr, yr])) < 3.0
        assert n_checked >= 15
        assert n_good / n_checked > 0.8

    def test_descriptors_normalized(self):
        rng = np.random.default_rng(2)
        img, _ = make_blob_image(rng)
        feats = sift.detect_and_describe(
            jnp.asarray(img)[None], jnp.asarray([[128, 160]], jnp.int32), max_keypoints=128)
        mask = np.asarray(feats.mask[0])
        norms = np.linalg.norm(np.asarray(feats.desc[0])[mask], axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-3)

    def test_translation_matching(self):
        """Shifted copy of an image must match back via descriptors."""
        rng = np.random.default_rng(3)
        img, _ = make_blob_image(rng, n_blobs=40)
        dy, dx = 6, 9
        img2 = np.roll(np.roll(img, dy, axis=0), dx, axis=1)
        gray = jnp.asarray(np.stack([img, img2]))
        shapes = jnp.asarray([[128, 160], [128, 160]], jnp.int32)
        feats = sift.detect_and_describe(gray, shapes, max_keypoints=256)
        midx, mmask = knn.match_pair(feats.desc[0], feats.desc[1],
                                     feats.mask[0], feats.mask[1])
        midx, mmask = np.asarray(midx), np.asarray(mmask)
        assert mmask.sum() >= 15
        xy1 = np.asarray(feats.xy[0])
        xy2 = np.asarray(feats.xy[1])
        d = xy2[midx[mmask]] - xy1[mmask]
        # most matches should agree with the true shift
        good = (np.abs(d - np.array([dx, dy])) <= 1.5).all(axis=1)
        assert good.mean() > 0.8


class TestKnn:
    def test_exact_match_identity(self):
        rng = np.random.default_rng(4)
        d = rng.standard_normal((64, 128)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        perm = rng.permutation(64)
        idx, ok = knn.match_pair(jnp.asarray(d), jnp.asarray(d[perm]),
                                 jnp.ones(64, bool), jnp.ones(64, bool))
        idx = np.asarray(idx)
        assert np.asarray(ok).all()
        np.testing.assert_array_equal(perm[idx], np.arange(64))

    def test_ratio_test_rejects_ambiguous(self):
        # two identical target descriptors -> ratio ~1 -> reject
        d1 = np.zeros((1, 4), np.float32); d1[0, 0] = 1
        d2 = np.stack([d1[0], d1[0]])
        idx, ok = knn.match_pair(jnp.asarray(d1), jnp.asarray(d2),
                                 jnp.ones(1, bool), jnp.ones(2, bool))
        assert not bool(ok[0])

    def test_mask_respected(self):
        rng = np.random.default_rng(5)
        d = rng.standard_normal((8, 16)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        m2 = np.zeros(8, bool); m2[:4] = True
        idx, ok = knn.match_pair(jnp.asarray(d), jnp.asarray(d),
                                 jnp.ones(8, bool), jnp.asarray(m2))
        idx, ok = np.asarray(idx), np.asarray(ok)
        assert np.all(idx[ok] < 4)

    def test_match_all_pairs_shapes(self):
        rng = np.random.default_rng(6)
        desc = rng.standard_normal((3, 32, 16)).astype(np.float32)
        desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
        mask = np.ones((3, 32), bool)
        p = pairs.exhaustive_pairs(3)
        assert p.shape == (3, 2)
        midx, mmask = knn.match_all_pairs(jnp.asarray(desc), jnp.asarray(mask), jnp.asarray(p))
        assert midx.shape == (3, 32) and mmask.shape == (3, 32)


class TestImageIO:
    def test_reference_resize_semantics(self):
        # 3072x2048 landscape -> width 512, height floored to /8
        h, w = io_images.reference_target_size(2048, 3072, 512)
        assert w == 512
        assert h == (2048 * 512 // 3072) - ((2048 * 512 // 3072) % 8)
        # portrait
        h, w = io_images.reference_target_size(1000, 500, 512)
        assert h == 512 and w % 8 == 0
        # small image untouched
        assert io_images.reference_target_size(100, 200, 512) == (100, 200)


class TestOrb:
    def test_fast_detects_corners(self):
        from reconstructor_tpu.features import orb
        import jax.numpy as jnp
        # a bright square on dark background has strong FAST corners
        img = np.zeros((96, 96), np.float32)
        img[30:60, 30:60] = 1.0
        feats = orb.detect_and_describe(jnp.asarray(img)[None],
                                        jnp.asarray([[96, 96]], jnp.int32),
                                        max_keypoints=64)
        xy = np.asarray(feats.xy[0])[np.asarray(feats.mask[0])]
        assert xy.shape[0] >= 4
        corners = np.array([[30, 30], [30, 59], [59, 30], [59, 59]], float)
        d = np.linalg.norm(corners[:, None] - xy[None], axis=-1).min(axis=1)
        assert (d < 4.0).mean() >= 0.75

    def test_orb_translation_matching(self):
        from reconstructor_tpu.features import orb
        from reconstructor_tpu.matching import knn
        import jax.numpy as jnp
        rng = np.random.default_rng(7)
        img, _ = make_blob_image(rng)
        img = (img > 0.4).astype(np.float32)  # hard edges for FAST
        dy, dx = 5, 8
        img2 = np.roll(np.roll(img, dy, axis=0), dx, axis=1)
        gray = jnp.asarray(np.stack([img, img2]))
        shapes = jnp.asarray([[128, 160]] * 2, jnp.int32)
        feats = orb.detect_and_describe(gray, shapes, max_keypoints=256)
        midx, mmask = knn.match_pair(feats.desc[0], feats.desc[1],
                                     feats.mask[0], feats.mask[1],
                                     ratio_thresh=0.9)
        midx, mmask = np.asarray(midx), np.asarray(mmask)
        assert mmask.sum() >= 10
        d = np.asarray(feats.xy[1])[midx[mmask]] - np.asarray(feats.xy[0])[mmask]
        good = (np.abs(d - np.array([dx, dy])) <= 1.5).all(axis=1)
        assert good.mean() > 0.7


class TestScalarizedFGate:
    """geometry.fgate: the VPU-layout F-RANSAC gate must reproduce the
    generic vmapped path (identical sampling draws => identical inlier
    sets at stride 1) and recover true epipolar inlier sets."""

    def _make_pairs(self, B=4, K=512, outlier_frac=0.25, seed=3):
        rng = np.random.default_rng(seed)
        pts1 = np.zeros((B, K, 2), np.float32)
        pts2 = np.zeros((B, K, 2), np.float32)
        true_inl = np.zeros((B, K), bool)
        n_out = int(K * outlier_frac)
        for b in range(B):
            R = np.linalg.qr(rng.standard_normal((3, 3)))[0]
            if np.linalg.det(R) < 0:
                R[:, 0] *= -1
            t = rng.standard_normal(3)
            t /= np.linalg.norm(t)
            X = rng.uniform([-2, -2, 4], [2, 2, 8], (K, 3))
            x1 = X[:, :2] / X[:, 2:]
            Xc = X @ R.T + t
            x2 = Xc[:, :2] / Xc[:, 2:]
            uv1 = x1 * 400.0 + 256
            uv2 = x2 * 400.0 + 256
            uv2[:n_out] = rng.uniform(0, 512, (n_out, 2))
            pts1[b] = uv1 + rng.normal(0, 0.3, (K, 2))
            pts2[b] = uv2 + rng.normal(0, 0.3, (K, 2))
            true_inl[b, n_out:] = True
        return pts1, pts2, true_inl

    def test_recovers_true_inliers(self):
        from reconstructor_tpu.geometry import fgate
        pts1, pts2, true_inl = self._make_pairs()
        B, K = true_inl.shape
        keys = jax.random.split(jax.random.PRNGKey(0), B)
        inl = np.asarray(fgate.filter_pairs_scalarized(
            keys, jnp.asarray(pts1), jnp.asarray(pts2),
            jnp.ones((B, K), bool), num_hypotheses=512, thresh_px=3.0))
        recall = (inl & true_inl).sum() / true_inl.sum()
        fpr = (inl & ~true_inl).sum() / (~true_inl).sum()
        assert recall > 0.98, recall
        assert fpr < 0.05, fpr

    def test_matches_generic_path_exactly(self):
        from reconstructor_tpu.geometry import epipolar, fgate
        pts1, pts2, _ = self._make_pairs(B=3)
        B, K = pts1.shape[:2]
        mask = np.ones((B, K), bool)
        keys = jax.random.split(jax.random.PRNGKey(1), B)
        inl_s = np.asarray(fgate.filter_pairs_scalarized(
            keys, jnp.asarray(pts1), jnp.asarray(pts2), jnp.asarray(mask),
            num_hypotheses=256, thresh_px=3.0))

        def one(key, p1, p2, m):
            F, _, _ = epipolar.estimate_fundamental(
                key, p1, p2, m, thresh_px=3.0, num_hypotheses=256)
            d = epipolar.sampson_distance(F, p1, p2)
            return (d < 9.0) & m
        inl_g = np.asarray(jax.vmap(one)(
            keys, jnp.asarray(pts1), jnp.asarray(pts2), jnp.asarray(mask)))
        assert (inl_s == inl_g).mean() > 0.999, (inl_s != inl_g).sum()

    def test_masked_slots_never_inliers(self):
        from reconstructor_tpu.geometry import fgate
        pts1, pts2, _ = self._make_pairs(B=2)
        B, K = pts1.shape[:2]
        mask = np.ones((B, K), bool)
        mask[:, ::3] = False
        keys = jax.random.split(jax.random.PRNGKey(2), B)
        inl = np.asarray(fgate.filter_pairs_scalarized(
            keys, jnp.asarray(pts1), jnp.asarray(pts2), jnp.asarray(mask),
            num_hypotheses=128, thresh_px=3.0))
        assert not (inl & ~mask).any()
