"""Classic (DoG/SIFT-style) feature detection as one batched TPU program.

Capability parity with the reference's ``FeatureClassic`` (OpenCV SIFT,
FeatureDetector.cpp:13-35), re-designed for TPU rather than translated:

- The Gaussian / DoG scale-space is built with separable depthwise
  convolutions over the *whole image batch at once* — (N, S, H, W) tensors
  instead of OpenCV's per-image pyramid of mats. XLA fuses the blur chain;
  the MXU sees the convolutions.
- Extrema detection, contrast/edge gating, orientation assignment and
  descriptor sampling are all fixed-shape masked array ops: every image
  yields exactly ``max_keypoints`` slots with a validity mask (the
  fixed-capacity layout that SURVEY.md §7 calls the foundational design
  decision).
- Instead of per-octave downsampling (ragged shapes), scale space is built
  at full resolution with geometrically increasing sigmas. That trades
  some FLOPs for perfectly static shapes — the TPU-friendly choice at the
  <=512 px working resolution the pipeline uses (img_max_size=512).
- The descriptor is the classic 4x4 spatial x 8 orientation histogram
  (128-d), computed with gather-free bilinear weighting over a fixed
  16x16 patch, vmapped over keypoints. L2-normalized, 0.2-clipped,
  renormalized as in Lowe's paper (and OpenCV).

Output coordinate convention matches the reference: (x, y) pixel
coordinates in the resized image, integer-valued (the reference keeps int
coords via FeatCoord<int>, datatypes.h:12-25).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp


class Features(NamedTuple):
    """Fixed-capacity per-image feature set (batched over leading dim)."""
    xy: jnp.ndarray       # (..., K, 2) float32 — (x, y) pixel coords
    scale: jnp.ndarray    # (..., K) float32 — detection sigma
    score: jnp.ndarray    # (..., K) float32 — |DoG| response
    desc: jnp.ndarray     # (..., K, 128) float32 — L2-normalized descriptor
    mask: jnp.ndarray     # (..., K) bool


def gaussian_kernel1d(sigma: float, radius: int, dtype=jnp.float32) -> jnp.ndarray:
    x = jnp.arange(-radius, radius + 1, dtype=dtype)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def gaussian_blur(img: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Separable Gaussian blur of an (N, H, W) batch."""
    radius = max(1, int(math.ceil(3.0 * sigma)))
    k = gaussian_kernel1d(sigma, radius, img.dtype)
    img4 = img[:, None]  # (N, 1, H, W)
    kh = k.reshape(1, 1, 1, -1)
    kv = k.reshape(1, 1, -1, 1)
    out = jax.lax.conv_general_dilated(img4, kh, (1, 1), [(0, 0), (radius, radius)])
    out = jax.lax.conv_general_dilated(out, kv, (1, 1), [(radius, radius), (0, 0)])
    return out[:, 0]


@functools.lru_cache(maxsize=8)
def _blur_band_matrices(n: int, num_scales: int, sigma0: float,
                        scales_per_octave: int):
    """(S, n, n) float32 band matrices: level s = mats[s] @ signal.

    Composed in float64 numpy at trace time to replicate the incremental
    zero-padded separable blur chain EXACTLY (each increment's kernel is
    truncated at its own 3*sigma, matching the conv implementation's
    edge behavior) — the matrices are plain graph constants.
    """
    import numpy as np
    sigmas = [sigma0 * (2.0 ** (i / scales_per_octave))
              for i in range(num_scales)]
    mats = []
    prev = None
    for i, s in enumerate(sigmas):
        inc = s if i == 0 else math.sqrt(max(s * s - sigmas[i - 1] ** 2, 1e-6))
        radius = max(1, int(math.ceil(3.0 * inc)))
        x = np.arange(-radius, radius + 1, dtype=np.float64)
        k = np.exp(-0.5 * (x / inc) ** 2)
        k /= k.sum()
        T = np.zeros((n, n), np.float64)
        for o, w in zip(range(-radius, radius + 1), k):
            T += np.diag(np.full(n - abs(o), w), o)
        prev = T if prev is None else T @ prev
        mats.append(prev)
    return np.stack(mats).astype(np.float32)


def build_scale_space(img: jnp.ndarray, num_scales: int, sigma0: float = 1.6,
                      scales_per_octave: int = 3):
    """(N, H, W) -> gaussians (N, S, H, W) and sigmas (S,).

    sigma_i = sigma0 * 2^(i / scales_per_octave). All S levels are
    produced by TWO batched band-matrix contractions (rows then columns)
    instead of S sequential separable convs: the incremental conv chain
    materialized the (N, S, H, W) volume level-by-level, and XLA:TPU
    lowered that assembly to a dynamic-update-slice chain that one r5
    device profile measured at 662 ms of a 921 ms detection program
    (~0.6 GB/s effective — fusion.13, window-looped DUS). The matrices
    compose the SAME truncated incremental kernels (f64, trace-time
    numpy), so the output matches the conv chain to f32 rounding, and
    the contraction is MXU work producing the volume in one pass.
    """
    import numpy as np
    N, H, W = img.shape
    A = jnp.asarray(_blur_band_matrices(H, num_scales, float(sigma0),
                                        scales_per_octave))      # (S, H, H)
    B = jnp.asarray(_blur_band_matrices(W, num_scales, float(sigma0),
                                        scales_per_octave))      # (S, W, W)
    sigmas = [sigma0 * (2.0 ** (i / scales_per_octave))
              for i in range(num_scales)]
    g = jnp.einsum("sab,nbw->nsaw", A, img)          # blur rows (H axis)
    g = jnp.einsum("nsaw,svw->nsav", g, B)           # blur cols (W axis)
    return g, jnp.asarray(np.asarray(sigmas), img.dtype)


def _neighborhood_extrema(dog: jnp.ndarray) -> jnp.ndarray:
    """26-neighborhood extremum test over the (N, S, H, W) DoG volume.

    Returns bool (N, S-2, H, W) for the interior scales. A voxel is an
    extremum when it equals the max (or min) of its full 3x3x3
    neighborhood; ties are broken by the spatial NMS pass afterwards.
    Implemented as separable 3x3 spatial pools + a 3-scale reduction —
    pure VPU work, no gathers.
    """
    def pool3x3(x, op):
        cv = -jnp.inf if op is jnp.maximum else jnp.inf
        pad = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)), constant_values=cv)
        rows = op(op(pad[:, :, :-2, 1:-1], pad[:, :, 1:-1, 1:-1]), pad[:, :, 2:, 1:-1])
        padr = jnp.pad(rows, ((0, 0), (0, 0), (0, 0), (1, 1)), constant_values=cv)
        return op(op(padr[:, :, :, :-2], padr[:, :, :, 1:-1]), padr[:, :, :, 2:])

    mx = pool3x3(dog, jnp.maximum)
    mn = pool3x3(dog, jnp.minimum)
    nb_max = jnp.maximum(jnp.maximum(mx[:, :-2], mx[:, 1:-1]), mx[:, 2:])
    nb_min = jnp.minimum(jnp.minimum(mn[:, :-2], mn[:, 1:-1]), mn[:, 2:])
    center = dog[:, 1:-1]
    is_max = (center >= nb_max) & (center > 0)
    is_min = (center <= nb_min) & (center < 0)
    return is_max | is_min


def _edge_response_ok(dog_level: jnp.ndarray, edge_thresh: float) -> jnp.ndarray:
    """Hessian-ratio edge rejection (Lowe §4.1): tr^2/det < (r+1)^2/r."""
    d = dog_level
    dxx = d[:, :, 2:] + d[:, :, :-2] - 2 * d[:, :, 1:-1]
    dxx = jnp.pad(dxx, ((0, 0), (0, 0), (1, 1)))
    dyy = d[:, 2:, :] + d[:, :-2, :] - 2 * d[:, 1:-1, :]
    dyy = jnp.pad(dyy, ((0, 0), (1, 1), (0, 0)))
    dxy = (d[:, 2:, 2:] - d[:, 2:, :-2] - d[:, :-2, 2:] + d[:, :-2, :-2]) / 4.0
    dxy = jnp.pad(dxy, ((0, 0), (1, 1), (1, 1)))
    tr = dxx + dyy
    det = dxx * dyy - dxy * dxy
    r = edge_thresh
    return (det > 0) & (tr * tr * r < (r + 1.0) ** 2 * det)


def detect_keypoints(gray: jnp.ndarray, shapes: jnp.ndarray, max_keypoints: int,
                     num_scales: int = 12, contrast_thresh: float = 0.004,
                     edge_thresh: float = 10.0, border: int = 8,
                     sigma0: float = 0.8):
    """Batched DoG keypoint detection.

    gray: (N, H, W) float32 in [0,1]; shapes: (N, 2) valid (h, w) per image.
    Returns (xy (N,K,2) int-valued float, scale (N,K), score (N,K),
    mask (N,K), gaussians (N,S,H,W), sigmas (S,)).
    """
    N, H, W = gray.shape
    gauss, sigmas = build_scale_space(gray, num_scales, sigma0=sigma0)
    dog = gauss[:, 1:] - gauss[:, :-1]            # (N, S-1, H, W)

    extrema = _neighborhood_extrema(dog)          # (N, S-3, H, W)
    contrast_ok = jnp.abs(dog[:, 1:-1]) > contrast_thresh
    edge_ok = jax.vmap(lambda d: _edge_response_ok(d, edge_thresh), in_axes=1, out_axes=1)(dog[:, 1:-1])
    cand = extrema & contrast_ok & edge_ok        # (N, Si, H, W)

    # mask borders and padding
    ys = jnp.arange(H)[None, None, :, None]
    xs = jnp.arange(W)[None, None, None, :]
    h_valid = shapes[:, 0][:, None, None, None]
    w_valid = shapes[:, 1][:, None, None, None]
    in_bounds = (ys >= border) & (ys < h_valid - border) & (xs >= border) & (xs < w_valid - border)
    cand = cand & in_bounds

    score_vol = jnp.where(cand, jnp.abs(dog[:, 1:-1]), 0.0)

    # 3x3 spatial NMS within each scale, then flatten and take global top-K.
    pad = jnp.pad(score_vol, ((0, 0), (0, 0), (1, 1), (1, 1)))
    rows = jnp.maximum(jnp.maximum(pad[:, :, :-2, :], pad[:, :, 1:-1, :]), pad[:, :, 2:, :])
    local_max = jnp.maximum(jnp.maximum(rows[:, :, :, :-2], rows[:, :, :, 1:-1]), rows[:, :, :, 2:])
    score_vol = jnp.where(score_vol >= local_max, score_vol, 0.0)

    Si = score_vol.shape[1]
    flat = score_vol.reshape(N, -1)
    scores, idx = jax.lax.top_k(flat, max_keypoints)     # (N, K)
    s_idx = idx // (H * W)
    y_idx = (idx % (H * W)) // W
    x_idx = idx % W
    mask = scores > 0
    # --- subpixel refinement: 2D quadratic fit of the DoG level ---------
    # (the reference inherits OpenCV SIFT's interpolation then truncates
    # to int coords, datatypes.h:12-25; keeping the subpixel offset makes
    # every downstream pixel-threshold gate measurably sharper)
    dxy = _subpixel_offset(dog, s_idx + 1, y_idx, x_idx)
    xy = jnp.stack([x_idx, y_idx], axis=-1).astype(gray.dtype) + dxy
    # detection sigma: interior DoG scale i corresponds to sigma[i+1]
    scale = sigmas[s_idx + 1]
    return xy, scale, scores, mask, gauss, sigmas, s_idx + 1


def _subpixel_offset(dog: jnp.ndarray, d_idx: jnp.ndarray, y: jnp.ndarray,
                     x: jnp.ndarray) -> jnp.ndarray:
    """(dx, dy) quadratic-fit offsets, clamped to +-0.5.

    dog: (N, D, H, W); d_idx/y/x: (N, K). Solves the 2x2 spatial Newton
    step -H^-1 g on each keypoint's DoG level (scale offset omitted — it
    does not move the pixel).
    """
    N, D, H, W = dog.shape
    yc = jnp.clip(y, 1, H - 2)
    xc = jnp.clip(x, 1, W - 2)

    def level_val(oy, ox):
        ns = jnp.arange(N)[:, None]
        return dog[ns, d_idx, yc + oy, xc + ox]

    v = level_val(0, 0)
    gx = (level_val(0, 1) - level_val(0, -1)) / 2.0
    gy = (level_val(1, 0) - level_val(-1, 0)) / 2.0
    hxx = level_val(0, 1) + level_val(0, -1) - 2 * v
    hyy = level_val(1, 0) + level_val(-1, 0) - 2 * v
    hxy = (level_val(1, 1) - level_val(1, -1) - level_val(-1, 1) + level_val(-1, -1)) / 4.0
    det = hxx * hyy - hxy * hxy
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    dx = -(hyy * gx - hxy * gy) / det
    dy = -(hxx * gy - hxy * gx) / det
    dx = jnp.clip(dx, -0.5, 0.5)
    dy = jnp.clip(dy, -0.5, 0.5)
    return jnp.stack([dx, dy], axis=-1)


def _descriptor_at(rs: jnp.ndarray, s_rel: jnp.ndarray, xy: jnp.ndarray,
                   sigma: jnp.ndarray, pitch: jnp.ndarray,
                   lim: jnp.ndarray = None, patch_radius: int = 8):
    """128-d SIFT descriptor at one keypoint of one image.

    Gradient orientations are binned into a 4x4 grid of 8-bin histograms
    over a (2R)x(2R) patch scaled by the keypoint sigma, with bilinear
    spatial weighting and a Gaussian window — the classic formulation.
    Orientation invariance: a dominant orientation is first estimated from
    a 36-bin histogram and all gradients are rotated by it.

    ``rs`` is the image's PITCH-MATCHED resampled scale-space (see
    ``_resample_pitch_levels``): level ``s_rel`` is the Gaussian level
    resampled on a regular grid whose pitch equals this level's descriptor
    sample spacing. In that frame the (P+2)^2 patch taps sit at integer
    offsets from a single fractional base, so sampling needs ONE
    (P+3)^2 integer-aligned block gather + a 4-term shift-combine with
    scalar weights — 3.6x fewer gather indices than per-tap bilinear
    (gathers dominate the descriptor pass on TPU). The gather still
    indexes the 3D volume directly (rs[s, u, v]) so vmapping over
    thousands of keypoints never materializes per-keypoint level copies.
    """
    S, U, V = rs.shape
    R = patch_radius
    P = 2 * R  # 16x16 gradient grid

    # sample grid in pixel units, scaled with sigma (3 px per bin at
    # sigma=1.6); ``pitch`` is this exact spacing, taken from the same
    # static table the resample used
    spacing = pitch
    offs_p = (jnp.arange(P + 2, dtype=jnp.float32) - (P + 1) / 2.0) * spacing
    py, px = jnp.meshgrid(offs_p, offs_p, indexing="ij")

    # resampled-frame coordinates of tap k: xy/pitch - (P+1)/2 + k
    ub = xy[1] / spacing - (P + 1) / 2.0
    vb = xy[0] / spacing - (P + 1) / 2.0
    u0 = jnp.floor(ub).astype(jnp.int32)
    v0 = jnp.floor(vb).astype(jnp.int32)
    fu = ub - u0
    fv = vb - v0
    # clamp taps to THIS level's valid extent (levels are zero-padded to
    # a common grid; the clamp keeps edge-replicate semantics)
    lim_u = (U if lim is None else lim[0]) - 1
    lim_v = (V if lim is None else lim[1]) - 1
    uu = jnp.clip(u0 + jnp.arange(P + 3), 0, lim_u)
    vv = jnp.clip(v0 + jnp.arange(P + 3), 0, lim_v)
    # Grouped-lane patch fetch: the natural scattered-scalar gather
    # (rs[s, uu[:,None], vv[None,:]], (P+3)^2 single-element taps) was
    # 72% of the whole detection program's device time (r5 trace:
    # 662 ms for 25 imgs x 4096 kps x 361 taps, ~18 ns/element).
    # Fetching 8-lane GROUPS cuts the index count 8x — (P+3) x 4 group
    # taps cover the window wherever it starts — and a one-hot
    # multiply-reduce selects the P+3 needed lanes in-register (pure
    # VPU work). Measured 176 ms vs 765 ms for the same taps (G=8 was
    # the optimum across G in {2,4,8,16,32}). The clamped `sel` offsets
    # reproduce the scalar path's replicate-edge semantics exactly:
    # needed positions always live in non-clamped groups because V is
    # a multiple of G (padded by _resample_pitch_levels).
    if V % 8 == 0:
        G = 8
        n_grp = (P + 3 + G - 1) // G + 1                 # 4 for P=16
        ve = jnp.clip(v0, 0, lim_v) // G
        rsg = rs.reshape(S, U, V // G, G)
        vvp = jnp.clip(ve + jnp.arange(n_grp), 0, V // G - 1)
        blk_g = rsg[s_rel, uu[:, None], vvp[None, :], :]  # (P+3, n_grp, G)
        f = blk_g.reshape(P + 3, n_grp * G)
        sel = vv - G * ve                                 # in [0, n_grp*G)
        oh = (jnp.arange(n_grp * G)[:, None] == sel[None, :]).astype(rs.dtype)
        blk = jnp.sum(f[:, :, None] * oh[None], axis=1)   # (P+3, P+3)
    else:  # fallback for direct callers with arbitrary volumes
        blk = rs[s_rel, uu[:, None], vv[None, :]]        # (P+3, P+3)
    patch = ((1 - fu) * (1 - fv) * blk[:-1, :-1]
             + (1 - fu) * fv * blk[:-1, 1:]
             + fu * (1 - fv) * blk[1:, :-1]
             + fu * fv * blk[1:, 1:])                    # (P+2, P+2)

    dx = (patch[1:-1, 2:] - patch[1:-1, :-2]) / 2.0      # (P, P), grid units
    dy = (patch[2:, 1:-1] - patch[:-2, 1:-1]) / 2.0
    gy = py[1:-1, 1:-1]
    gx = px[1:-1, 1:-1]
    mag = jnp.sqrt(dx * dx + dy * dy + 1e-12)
    ang = jnp.arctan2(dy, dx)                                  # [-pi, pi]

    # --- dominant orientation (36-bin histogram, Gaussian-weighted) ------
    # Binning is compare-and-reduce, not scatter-add: under vmap over
    # thousands of keypoints, scatters serialize on TPU while a (S, 36)
    # masked reduction fuses into plain VPU work (this one change took
    # the 25-image descriptor pass from 4.7 s to sub-second).
    w_orient = jnp.exp(-(gx ** 2 + gy ** 2) / (2.0 * (1.5 * sigma * 3.0) ** 2))
    bins36 = jnp.floor((ang + jnp.pi) / (2 * jnp.pi) * 36).astype(jnp.int32) % 36
    contrib36 = (mag * w_orient).reshape(-1, 1)
    hist36 = jnp.sum(jnp.where(bins36.reshape(-1, 1) == jnp.arange(36)[None, :],
                               contrib36, 0.0), axis=0)
    # smooth circularly
    hist36 = (jnp.roll(hist36, 1) + hist36 + jnp.roll(hist36, -1)) / 3.0
    theta0 = (jnp.argmax(hist36).astype(mag.dtype) + 0.5) / 36.0 * 2 * jnp.pi - jnp.pi

    ang_rel = ang - theta0
    # rotate sample offsets into the keypoint frame for spatial binning
    cos0, sin0 = jnp.cos(-theta0), jnp.sin(-theta0)
    rx = (gx * cos0 - gy * sin0) / jnp.maximum(spacing, 1e-6)
    ry = (gx * sin0 + gy * cos0) / jnp.maximum(spacing, 1e-6)

    # --- 4x4 x 8 histogram with bilinear weights -------------------------
    # cell coords in [0, 4): patch spans 16 samples -> 4 samples per cell
    cx = rx / 4.0 + 1.5 + 0.5  # sample at rx in [-8, 8] -> cell coord ~[0,4)
    cy = ry / 4.0 + 1.5 + 0.5
    ob = (ang_rel + 2 * jnp.pi) % (2 * jnp.pi) / (2 * jnp.pi) * 8.0

    w_desc = jnp.exp(-(rx ** 2 + ry ** 2) / (2.0 * 8.0 ** 2)) * mag

    # Trilinear binning, factorized: the 128 bin weights are an outer
    # product of per-axis triangular kernels — clip(1-|c-0.5-y|) hits
    # exactly the two adjacent cells (and zeroes out-of-range cells), the
    # circular min(|d|, 8-|d|) form does the same for orientation. The
    # whole histogram is then one (16, S) x (S, 8) contraction per
    # keypoint instead of 8 compare-and-reduce sweeps over all 128 bins —
    # ~5x fewer VPU ops and the reduction is matmul-shaped. Identical
    # math to the loop formulation it replaced (same weights, same bins).
    s_flat = w_desc.reshape(-1)
    cells = jnp.arange(4, dtype=mag.dtype)
    Wy = jnp.clip(1.0 - jnp.abs(cy.reshape(-1, 1) - 0.5 - cells[None, :]), 0, 1)
    Wx = jnp.clip(1.0 - jnp.abs(cx.reshape(-1, 1) - 0.5 - cells[None, :]), 0, 1)
    obins = jnp.arange(8, dtype=mag.dtype)
    do = jnp.abs(ob.reshape(-1, 1) - obins[None, :])
    Wo = jnp.clip(1.0 - jnp.minimum(do, 8.0 - do), 0, 1)
    A = (Wy[:, :, None] * Wx[:, None, :]).reshape(-1, 16) * s_flat[:, None]
    v = jnp.einsum("sm,so->mo", A, Wo).reshape(128)
    v = v / jnp.maximum(jnp.linalg.norm(v), 1e-12)
    v = jnp.minimum(v, 0.2)
    v = v / jnp.maximum(jnp.linalg.norm(v), 1e-12)
    return v


def _pitch_of(sigma: float) -> float:
    """Descriptor sample spacing for a level sigma (3 px/bin at sigma=1.6)."""
    return sigma * 3.0 / 1.6 / 2.0


def _resample_pitch_levels(gauss: jnp.ndarray, sigma_list, lo: int, hi: int):
    """Resample Gaussian levels [lo, hi) onto their descriptor-pitch grids.

    gauss: (S, H, W). Level s is bilinearly resampled at coordinate pitch
    ``_pitch_of(sigma_list[s])`` — exactly the spacing `_descriptor_at`
    samples at — via two small dense matmuls per level (tent-weight
    matrices; regular grids make bilinear interpolation MXU work instead
    of gather work). Out-of-image coordinates clamp to the edge
    (replicate).

    Each level is computed at ITS OWN (U_l, V_l) grid size — coarse
    (large-pitch) levels need far fewer samples, and sizing them at the
    finest level's grid made this pass ~2/3 of the whole detection wall
    (r4 profile: 1478 ms of a 1407 ms frontend on the 25-image batch).
    Results land in a common zero-padded (hi-lo, U, V) volume for direct
    3D gathers; per-level valid extents are returned so descriptor taps
    clamp to the level's own edge (replicate semantics preserved).

    Returns (rs (hi-lo, U, V), pitches (hi-lo,), lims (hi-lo, 2) int32).
    """
    import numpy as np
    S, H, W = gauss.shape
    pitches = [_pitch_of(sigma_list[s]) for s in range(lo, hi)]
    sizes = [(int((H - 1) / p) + 2, int((W - 1) / p) + 2) for p in pitches]
    U = max(u for u, _ in sizes)
    # V rounds up to a multiple of 8: _descriptor_at fetches its patch
    # block in 8-lane groups (see the grouped gather there), which needs
    # the lane axis divisible by the group width
    V = -(-max(v for _, v in sizes) // 8) * 8
    # tent matrices are input-independent: build them in numpy at trace
    # time (plain graph constants) — building them in-graph made XLA
    # constant-fold iota/abs/clip chains, multiplying compile time
    hs = np.arange(H, dtype=np.float32)
    ws = np.arange(W, dtype=np.float32)
    g = gauss[lo:hi].astype(jnp.float32)
    levels = []
    for i, (p, (Ul, Vl)) in enumerate(zip(pitches, sizes)):
        cu = np.minimum(np.arange(Ul, dtype=np.float32) * p, H - 1.0)
        cv = np.minimum(np.arange(Vl, dtype=np.float32) * p, W - 1.0)
        A = np.clip(1.0 - np.abs(cu[:, None] - hs[None, :]), 0, 1)
        B = np.clip(1.0 - np.abs(cv[:, None] - ws[None, :]), 0, 1)
        # pinned (package-default float32) precision: the resample must
        # equal exact bilinear sampling (test_pitch_resample_exact), and
        # bf16 here measurably bought nothing (r4: detect_warm_s flat)
        level = jax.lax.dot(jax.lax.dot(jnp.asarray(A), g[i]),
                            jnp.asarray(B).T)
        # pad+stack (ONE buffer write) — an .at[i,:Ul,:Vl].set chain
        # re-materializes the whole padded volume per level
        levels.append(jnp.pad(level, ((0, U - Ul), (0, V - Vl))))
    rs = jnp.stack(levels, axis=0)
    lims = jnp.asarray(np.asarray(sizes, np.int32))
    return (rs.astype(gauss.dtype), jnp.asarray(pitches, gauss.dtype),
            lims)


def compute_descriptors(gauss: jnp.ndarray, xy: jnp.ndarray, scale_idx: jnp.ndarray,
                        sigmas: jnp.ndarray, sigma_list=None) -> jnp.ndarray:
    """Descriptors for one image's keypoints. gauss: (S, H, W);
    xy (K, 2); scale_idx (K,) int; sigma_list: static per-level sigmas
    (defaults to host values of ``sigmas``). Returns (K, 128)."""
    if sigma_list is None:
        import numpy as _np
        sigma_list = [float(v) for v in _np.asarray(sigmas)]
    S = gauss.shape[0]
    # detection only emits interior DoG levels [1, S-3]; resample just those
    lo, hi = 1, max(2, S - 2)
    rs, pitches, lims = _resample_pitch_levels(gauss, sigma_list, lo, hi)

    def one(kp_xy, s_idx):
        s_rel = jnp.clip(s_idx - lo, 0, hi - lo - 1)
        return _descriptor_at(rs, s_rel, kp_xy, sigmas[s_idx], pitches[s_rel],
                              lims[s_rel])
    return jax.vmap(one)(xy, scale_idx)


@functools.partial(jax.jit, static_argnames=("max_keypoints", "num_scales",
                                             "contrast_thresh", "edge_thresh",
                                             "sigma0"))
def detect_and_describe(gray: jnp.ndarray, shapes: jnp.ndarray,
                        max_keypoints: int = 2048, num_scales: int = 12,
                        contrast_thresh: float = 0.004,
                        edge_thresh: float = 10.0,
                        sigma0: float = 0.8) -> Features:
    """The full classic frontend: (N, H, W) batch -> Features.

    One jitted program: scale space, extrema, top-K selection and
    descriptor extraction all run on-device; the host only sees the final
    fixed-shape Features pytree.

    sigma0=0.8 plays the role of OpenCV SIFT's doubled-resolution first
    octave (its sigma 1.6 lives on a 2x-upsampled image, i.e. 0.8 in
    native pixels): detection reaches the fine structures that produce
    the bulk of SIFT keypoints without paying for 4x upsampled conv work.
    """
    xy, scale, score, mask, gauss, sigmas, s_idx = detect_keypoints(
        gray, shapes, max_keypoints, num_scales, contrast_thresh, edge_thresh,
        sigma0=sigma0)
    sigma_list = [sigma0 * (2.0 ** (i / 3.0)) for i in range(num_scales)]
    desc = jax.vmap(compute_descriptors, in_axes=(0, 0, 0, None, None))(
        gauss, xy, s_idx, sigmas, sigma_list)
    desc = desc * mask[..., None]
    return Features(xy=xy, scale=scale, score=score, desc=desc, mask=mask)
