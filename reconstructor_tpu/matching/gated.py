"""Fused kNN matching + epipolar gate over a chunk of pairs.

One device program per chunk: raw top-2 descriptor matching (Pallas
fused kernel on TPU, XLA einsum path elsewhere), on-device gather of the
matched coordinates, fundamental-RANSAC gating, and on-device mask fold
to compact int16 match tables. The raw match table never round-trips to
the host between the stages (the host-side (B, K, 2) gather and its
transfers dominated matching wall-clock before this fusion).

This is the single-device body; ``parallel.sharding`` wraps the same
function in ``shard_map`` so multi-chip matching shards BOTH halves of
the work — the reference's OpenMP collapse(2) loop
(SequentialReconstructor.cpp:202) plus its per-pair
cv::findFundamentalMat gate (:251) — not just the kNN.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from reconstructor_tpu.geometry import fgate
from reconstructor_tpu.matching import knn


def filter_pairs(keys, pts1, pts2, mask, num_hypotheses: int,
                 thresh_px: float):
    """Batched fundamental-RANSAC gate over a chunk of pairs.

    pts1/pts2: (B, K, 2); mask: (B, K). Returns inlier masks (B, K).

    Model selection runs on a strided quarter-subsample of the match
    slots (the (H, N) Sampson sweep is the F-gate's dominant cost and
    its inlier-ratio ranking is just as sharp on 1k points); the winning
    F — plus a guarded all-inlier refit — then classifies every match
    once. Implementation: geometry.fgate's scalarized layout (everything
    elementwise over (B, H, S); no per-hypothesis tiny matmuls) — it
    draws the same RANSAC samples as the vmapped generic path and
    produces identical inlier sets at a fraction of the VPU cost.
    """
    K = pts1.shape[1]
    stride = 4 if K >= 1024 else 1
    return fgate.filter_pairs_scalarized(
        keys, pts1, pts2, mask, num_hypotheses=num_hypotheses,
        thresh_px=thresh_px, stride=stride)


def match_and_gate(keys, desc, kmask, xy, pair_chunk,
                   ratio_thresh: float, cross_check: bool,
                   use_fused: bool, num_hypotheses: int,
                   thresh_px: float, min_matches: int,
                   compute_dtype: str = "float32"):
    """kNN matching + epipolar gate for one pair chunk (trace-level body;
    callers jit or shard_map it).

    Returns (match_idx (B, K) int16 with -1 for gated-out slots,
    inlier counts (B,) int32).
    """
    from reconstructor_tpu.matching import pallas_knn
    if use_fused:
        midx, mmask = pallas_knn.match_all_pairs_fused(
            desc, kmask, pair_chunk, ratio_thresh=ratio_thresh,
            cross_check=cross_check, compute_dtype=compute_dtype)
    else:
        midx, mmask = knn.match_all_pairs(
            desc, kmask, pair_chunk, ratio_thresh=ratio_thresh,
            cross_check=cross_check, compute_dtype=compute_dtype)
    K = desc.shape[1]
    p1 = xy[pair_chunk[:, 0]]                                    # (B, K, 2)
    p2 = xy[pair_chunk[:, 1][:, None], jnp.clip(midx, 0, K - 1)]  # (B, K, 2)
    inl = filter_pairs(keys, p1, p2, mmask,
                       num_hypotheses=num_hypotheses, thresh_px=thresh_px)
    # need >= min_matches for F estimation; keep raw matches otherwise
    # (SequentialReconstructor.cpp:237)
    counts = jnp.sum(mmask, axis=1)
    out = jnp.where((counts >= min_matches)[:, None], inl & mmask, mmask)
    # fold the mask on device and ship int16 ids: halves the device->host
    # result traffic (K <= 32k always) and removes the host-side
    # per-pair np.where sweep from the hot loop
    midx16 = jnp.where(out, midx, -1).astype(jnp.int16)
    return midx16, jnp.sum(out, axis=1)


match_and_gate_jit = jax.jit(
    match_and_gate,
    static_argnames=("ratio_thresh", "cross_check", "use_fused",
                     "num_hypotheses", "thresh_px", "min_matches",
                     "compute_dtype"))


filter_pairs_jit = jax.jit(
    filter_pairs, static_argnames=("num_hypotheses", "thresh_px"))
