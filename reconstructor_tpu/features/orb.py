"""ORB-style detector: FAST corners + oriented BRIEF descriptors, batched.

The reference's FeatureClassic carries (commented-out) ORB support next to
SIFT (FeatureDetector.cpp:9,19) and BASELINE config 1 names "ORB + FLANN"
as the minimal two-view path. This is the TPU-native take:

- FAST-9/16: all 16 Bresenham-circle comparisons for every pixel at once
  (shifted-image arithmetic, no gathers); the contiguous-arc test runs as
  16-bit mask rotations on the VPU.
- Score: sum of absolute center-circle differences (the FAST score),
  3x3 NMS, global top-K with validity masks — same fixed-capacity layout
  as features.sift.
- Orientation by intensity centroid (the "O" in ORB) over a radius-7
  patch.
- Descriptor: 256 BRIEF tests with offsets rotated by the orientation.
  The test pattern is our own seeded isotropic-Gaussian draw (OpenCV's
  learned table is its own artifact; any fixed well-spread pattern gives
  BRIEF its discriminative power). Bits are emitted as +-1 float32, so
  Hamming distance is an affine function of the inner product and the
  exact top-2 MXU matcher (matching.knn) works unchanged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from reconstructor_tpu.features.sift import Features

# Bresenham circle of radius 3 (FAST-16 offsets, clockwise from 12 o'clock)
_CIRCLE = np.array([
    (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
    (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3),
], np.int32)  # (dx, dy)

_NUM_TESTS = 256
_PATCH_R = 15


def _brief_pattern(seed: int = 7) -> np.ndarray:
    """(256, 4) test offsets (x1, y1, x2, y2), N(0, (R/2)^2) clipped."""
    rng = np.random.default_rng(seed)
    pts = rng.normal(0.0, _PATCH_R / 2.0, size=(_NUM_TESTS, 4))
    return np.clip(pts, -_PATCH_R, _PATCH_R).astype(np.float32)


_PATTERN = _brief_pattern()


def _shift(img: jnp.ndarray, dx: int, dy: int) -> jnp.ndarray:
    """Shift an (N, H, W) batch so out[y, x] = img[y+dy, x+dx] (zero pad)."""
    return jnp.roll(img, shift=(-dy, -dx), axis=(1, 2))


def fast_score(gray: jnp.ndarray, threshold: float):
    """FAST-9/16 corner mask and score for an (N, H, W) batch."""
    center = gray
    brighter = jnp.zeros(gray.shape, jnp.uint32)
    darker = jnp.zeros(gray.shape, jnp.uint32)
    score = jnp.zeros_like(gray)
    for i, (dx, dy) in enumerate(_CIRCLE):
        p = _shift(gray, int(dx), int(dy))
        diff = p - center
        brighter |= (diff > threshold).astype(jnp.uint32) << i
        darker |= (diff < -threshold).astype(jnp.uint32) << i
        score = score + jnp.abs(diff)

    def has_arc9(mask16):
        # contiguous run >= 9 on the 16-bit ring: duplicate the ring and
        # AND together 9 successively shifted copies
        ring = mask16 | (mask16 << 16)
        run = ring
        for s in range(1, 9):
            run = run & (ring >> s)
        return run != 0

    corner = has_arc9(brighter) | has_arc9(darker)
    return corner, jnp.where(corner, score, 0.0)


def _orientation(gray: jnp.ndarray, xy: jnp.ndarray, radius: int = 7):
    """Intensity-centroid orientation at one keypoint. gray (H, W)."""
    H, W = gray.shape
    offs = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    oy, ox = jnp.meshgrid(offs, offs, indexing="ij")
    in_disc = (ox ** 2 + oy ** 2) <= radius * radius
    ys = jnp.clip((xy[1] + oy).astype(jnp.int32), 0, H - 1)
    xs = jnp.clip((xy[0] + ox).astype(jnp.int32), 0, W - 1)
    patch = gray[ys, xs] * in_disc
    m10 = jnp.sum(patch * ox)
    m01 = jnp.sum(patch * oy)
    return jnp.arctan2(m01, m10)


def _brief_at(gray: jnp.ndarray, xy: jnp.ndarray, theta: jnp.ndarray,
              pattern: jnp.ndarray):
    """Rotated-BRIEF +-1 descriptor at one keypoint. gray (H, W)."""
    H, W = gray.shape
    c, s = jnp.cos(theta), jnp.sin(theta)

    def sample(ox, oy):
        rx = c * ox - s * oy
        ry = s * ox + c * oy
        ys = jnp.clip((xy[1] + ry).astype(jnp.int32), 0, H - 1)
        xs = jnp.clip((xy[0] + rx).astype(jnp.int32), 0, W - 1)
        return gray[ys, xs]

    v1 = sample(pattern[:, 0], pattern[:, 1])
    v2 = sample(pattern[:, 2], pattern[:, 3])
    bits = jnp.where(v1 < v2, 1.0, -1.0)
    return bits / jnp.sqrt(jnp.asarray(float(_NUM_TESTS), gray.dtype))


@functools.partial(jax.jit, static_argnames=("max_keypoints", "threshold",
                                             "border"))
def detect_and_describe(gray: jnp.ndarray, shapes: jnp.ndarray,
                        max_keypoints: int = 2048, threshold: float = 0.06,
                        border: int = 16) -> Features:
    """Full ORB frontend: (N, H, W) float [0,1] batch -> Features."""
    N, H, W = gray.shape
    # light blur stabilizes both FAST and BRIEF
    k = jnp.asarray([0.25, 0.5, 0.25], gray.dtype)
    img4 = gray[:, None]
    img4 = jax.lax.conv_general_dilated(img4, k.reshape(1, 1, 1, 3), (1, 1),
                                        [(0, 0), (1, 1)])
    img4 = jax.lax.conv_general_dilated(img4, k.reshape(1, 1, 3, 1), (1, 1),
                                        [(1, 1), (0, 0)])
    smooth = img4[:, 0]

    corner, score = fast_score(smooth, threshold)

    ys = jnp.arange(H)[None, :, None]
    xs = jnp.arange(W)[None, None, :]
    hh = shapes[:, 0][:, None, None]
    ww = shapes[:, 1][:, None, None]
    inb = (ys >= border) & (ys < hh - border) & (xs >= border) & (xs < ww - border)
    score = jnp.where(inb, score, 0.0)

    # 3x3 NMS
    pad = jnp.pad(score, ((0, 0), (1, 1), (1, 1)))
    rows = jnp.maximum(jnp.maximum(pad[:, :-2, 1:-1], pad[:, 1:-1, 1:-1]), pad[:, 2:, 1:-1])
    padr = jnp.pad(rows, ((0, 0), (0, 0), (1, 1)))
    local_max = jnp.maximum(jnp.maximum(padr[:, :, :-2], padr[:, :, 1:-1]), padr[:, :, 2:])
    score = jnp.where(score >= local_max, score, 0.0)

    flat = score.reshape(N, -1)
    scores, idx = jax.lax.top_k(flat, max_keypoints)
    yk = (idx // W).astype(gray.dtype)
    xk = (idx % W).astype(gray.dtype)
    mask = scores > 0
    xy = jnp.stack([xk, yk], axis=-1)

    pattern = jnp.asarray(_PATTERN)

    def per_image(img, img_xy):
        thetas = jax.vmap(lambda p: _orientation(img, p))(img_xy)
        descs = jax.vmap(lambda p, t: _brief_at(img, p, t, pattern))(img_xy, thetas)
        return descs

    desc = jax.vmap(per_image)(smooth, xy)
    desc = desc * mask[..., None]
    return Features(xy=xy, scale=jnp.full(scores.shape, 3.0, gray.dtype),
                    score=scores, desc=desc, mask=mask)
