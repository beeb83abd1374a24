"""Fixed-budget batched RANSAC for TPU.

The reference leans on OpenCV's sequential RANSAC loops
(``cv::findFundamentalMat`` GeometricFilter.cpp:47, ``cv::findEssentialMat``
GeometricFilter.cpp:26, ``cv::solvePnPRansac``
SequentialReconstructor.cpp:591) whose iteration counts adapt at runtime —
a shape/control-flow pattern XLA cannot compile. The TPU-native design
evaluates a *fixed batch* of hypotheses in one shot:

1. sample H minimal sets at once (Gumbel top-k => distinct indices per
   hypothesis, respecting the validity mask),
2. ``vmap`` the minimal solver over all H samples,
3. score every hypothesis against every correspondence with one batched
   residual evaluation (an (H, N) computation that the VPU/MXU eats),
4. argmax inlier count.

With H = 2048 this covers the same search space as OpenCV's adaptive loop
at 0.99 confidence for the inlier ratios seen in practice, with a single
compiled kernel and zero host round-trips.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def sample_minimal_sets(key: jax.Array, mask: jnp.ndarray, num_hypotheses: int,
                        sample_size: int) -> jnp.ndarray:
    """Draw (H, S) index sets of valid (masked-in) points.

    Valid indices are compacted to the front once (one argsort over N),
    then each hypothesis draws S uniform positions below the valid count.
    An earlier Gumbel-top-k formulation guaranteed within-sample
    distinctness but cost an (H, N) gumbel + top-k sweep — the single
    most expensive piece of the epipolar gate. Duplicates under uniform
    draws occur at ~S^2/2N rate and merely yield a rank-deficient model
    that scores no inliers, which fixed-budget selection absorbs; the
    effective hypothesis budget shrinks by under a percent.
    """
    mask = mask.astype(bool)
    order = jnp.argsort(~mask)                     # valid indices first
    n_valid = jnp.maximum(jnp.sum(mask), 1)
    pos = jax.random.randint(key, (num_hypotheses, sample_size), 0,
                             jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
    return order[pos % n_valid]


def ransac(key: jax.Array,
           data: Tuple[jnp.ndarray, ...],
           mask: jnp.ndarray,
           solver: Callable[..., jnp.ndarray],
           residual: Callable[..., jnp.ndarray],
           sample_size: int,
           num_hypotheses: int,
           inlier_thresh: float):
    """Generic batched RANSAC.

    Args:
      data: tuple of per-correspondence arrays, each (N, ...).
      mask: (N,) validity of correspondences.
      solver: minimal solver mapping sampled data tuple -> model (pytree of
        arrays); vmapped over hypotheses.
      residual: (model, *data) -> (N,) residuals; vmapped over hypotheses.
      inlier_thresh: residual threshold for inliers.

    Returns:
      (best_model, inlier_mask (N,), best_count)
    """
    idx = sample_minimal_sets(key, mask, num_hypotheses, sample_size)
    sampled = tuple(d[idx] for d in data)            # each (H, S, ...)
    models = jax.vmap(solver)(*sampled)
    res = jax.vmap(lambda m: residual(m, *data))(models)   # (H, N)
    inliers = (res < inlier_thresh) & mask[None, :]
    counts = jnp.sum(inliers, axis=-1)
    best = jnp.argmax(counts)
    best_model = jax.tree_util.tree_map(lambda m: m[best], models)
    return best_model, inliers[best], counts[best]
