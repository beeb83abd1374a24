"""Exact top-2 descriptor matching with ratio test — the FLANN replacement.

Capability parity with ``FlannMatcher::matchFeatures``
(FeatureMatcher.cpp:32-65: FLANN kNN k=2, Lowe ratio 0.7, uniqueness on
train ids). The TPU-native design is *better* than the reference, not just
equivalent: FLANN is an approximate KD-forest because exact search is slow
on CPU, but on TPU the exact (K1, D) x (D, K2) similarity is one MXU
matmul, so we compute exact top-2 neighbors in a single fused program —
higher recall at a fraction of the cost. Uniqueness is enforced as full
mutual-nearest cross-checking (reverse argmax agreement) rather than
FLANN's first-come-first-served train-id set.

All shapes are fixed: K1/K2-padded descriptor blocks with masks; invalid
slots get -inf similarity so they never match.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def match_pair_scores(desc1: jnp.ndarray, desc2: jnp.ndarray,
                      mask1: jnp.ndarray, mask2: jnp.ndarray):
    """Squared L2 distance matrix between two descriptor sets.

    For L2-normalized descriptors d^2 = 2 - 2 <a, b>; the inner products
    run on the MXU. Masked slots are pushed to +inf distance.
    """
    sim = jnp.matmul(desc1, desc2.T,
                     preferred_element_type=jnp.float32)  # (K1, K2) — MXU
    d2 = jnp.maximum(2.0 - 2.0 * sim, 0.0)
    big = jnp.asarray(jnp.inf, d2.dtype)
    d2 = jnp.where(mask1[:, None] & mask2[None, :], d2, big)
    return d2


def match_pair(desc1: jnp.ndarray, desc2: jnp.ndarray,
               mask1: jnp.ndarray, mask2: jnp.ndarray,
               ratio_thresh: float = 0.7, cross_check: bool = True):
    """Ratio-tested (optionally mutual) nearest-neighbor match of one pair.

    Returns (match_idx (K1,) int32 — index into desc2 or -1,
             match_mask (K1,) bool).
    """
    d2 = match_pair_scores(desc1, desc2, mask1, mask2)
    # top-2 smallest distances along axis 1 via two min/argmin passes —
    # measurably cheaper than generic lax.top_k on 4096-wide rows (top_k
    # pays for a partial sort; two masked reductions are pure VPU sweeps)
    nn = jnp.argmin(d2, axis=1)                  # (K1,)
    best = jnp.take_along_axis(d2, nn[:, None], axis=1)[:, 0]
    d2_masked = d2.at[jnp.arange(d2.shape[0]), nn].set(jnp.inf)
    second = jnp.min(d2_masked, axis=1)
    # Lowe ratio on distances (FLANN uses non-squared; we compare squared
    # distances against ratio^2 — identical test).
    ratio_ok = best < (ratio_thresh * ratio_thresh) * second
    ok = ratio_ok & mask1 & jnp.isfinite(best)
    if cross_check:
        rev = jnp.argmin(d2, axis=0)             # (K2,) best row per column
        mutual = rev[nn] == jnp.arange(d2.shape[0])
        ok = ok & mutual
    return jnp.where(ok, nn, -1).astype(jnp.int32), ok


# jitted single-pair entry for host-loop callers (eager jnp would compile
# op-by-op through the remote-compile tunnel at every new shape)
match_pair_jit = jax.jit(match_pair,
                         static_argnames=("ratio_thresh", "cross_check"))


@functools.partial(jax.jit, static_argnames=("ratio_thresh", "cross_check",
                                             "compute_dtype"))
def match_all_pairs(desc: jnp.ndarray, mask: jnp.ndarray,
                    pair_idx: jnp.ndarray,
                    ratio_thresh: float = 0.7, cross_check: bool = True,
                    compute_dtype: str = "float32"):
    """Batched matching over an explicit list of image pairs.

    desc: (N, K, D); mask: (N, K); pair_idx: (P, 2) int32 image-id pairs.
    Returns (match_idx (P, K), match_mask (P, K)).

    Replaces the OpenMP collapse(2) loop over pairs
    (SequentialReconstructor.cpp:202) with one vmapped program — the
    natural sharding axis for multi-chip scale-out (matching/sharded.py).
    """
    if compute_dtype == "bfloat16":
        desc = desc.astype(jnp.bfloat16)  # f32-accumulated (see pallas_knn)

    def one(pair):
        i, j = pair[0], pair[1]
        return match_pair(desc[i], desc[j], mask[i], mask[j],
                          ratio_thresh, cross_check)
    return jax.vmap(one)(pair_idx)
