"""Fused exact top-2 kNN matching as a Pallas TPU kernel.

The XLA path (matching/knn.py) materializes the (K, K) squared-distance
matrix in HBM and re-reads it for each reduction (row min, row argmin,
second-best min, column argmin for the cross-check): ~5 passes over
67 MB per pair at K = 4096 — HBM-bandwidth bound at ~1.9 ms/pair while
the underlying matmul is ~0.1 ms of MXU work.

This kernel never lets the distance matrix leave the chip. Grid =
(pair, row-tile); per step it matmuls a (TR, D) row tile of image-1
descriptors against the whole resident (K, D) image-2 block (MXU), then
reduces the (TR, K) tile in VMEM:

- row top-2 (best / second distances + best index) written per row tile,
- the cross-check's column-best row index accumulated across row tiles
  in a revisited (1, K) output block (grid iterations are sequential on
  a TPU core, so the accumulation is race-free by construction).

HBM traffic per pair drops to the descriptors themselves (~4 MB) and
the (K,)-sized outputs. Masked slots ride a large-finite bias (1e30)
instead of inf so no inf-inf NaNs can appear in the reductions.

Capability parity: FlannMatcher::matchFeatures (FeatureMatcher.cpp:32-65)
— exact instead of approximate kNN; Lowe ratio and mutual cross-check
applied by the caller on the kernel outputs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e30

# Packed top-2 quantization: distances in [0, 4] scaled by 2^17 into 19
# bits, packed with the 12-bit slot id ((di << 12) | id <= int32 max).
# One plain int min then yields value AND argmin in a single reduction
# pass — replacing the min + argmin + masked-second float sweeps that
# dominated the kernel's VPU time — with identical tie-breaking (lowest
# index on equal distance, matching jnp.argmin). Quantization perturbs
# the ratio test by <= 2^-17 absolute on squared distances; the masked
# sentinel DMAX is reserved (real distances clip to DMAX - 1) so "no
# valid column" still surfaces as an effectively-infinite distance.
_SCALE = 131072.0          # 2^17
_DMAX = (1 << 19) - 1      # mask sentinel (packed >= _DMAX << 12)


def _knn_kernel_packed(idx_ref, d1_ref, d2t_ref, bias1_ref, bias2_ref,
                       best_ref, second_ref, arg_ref, colarg_ref,
                       colbest_ref):
    del idx_ref  # consumed by the BlockSpec index maps (scalar prefetch)
    r = pl.program_id(1)
    TR = d1_ref.shape[1]
    K = d2t_ref.shape[2]

    d1 = d1_ref[0]                                    # (TR, D)
    d2t = d2t_ref[0]                                  # (D, K)
    prec = (jax.lax.Precision.DEFAULT if d1.dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)
    sim = jax.lax.dot_general(d1, d2t, (((1,), (0,)), ((), ())),
                              precision=prec,
                              preferred_element_type=jnp.float32)
    di = jnp.clip((2.0 - 2.0 * sim) * _SCALE, 0.0, float(_DMAX - 1)) \
        .astype(jnp.int32)
    di = jnp.maximum(di, bias2_ref[0, 0][None, :])    # mask image-2 slots

    # ---- row top-2 (single int-min reductions) -------------------------
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (TR, K), 1)
    p = (di << 12) | col_ids
    bestp = jnp.min(p, axis=1)
    secondp = jnp.min(
        jnp.where(p == bestp[:, None], jnp.int32(2**31 - 1), p), axis=1)
    sentinel = jnp.int32(_DMAX) << 12
    best_ref[0, 0] = jnp.where(
        bestp >= sentinel, _BIG,
        (bestp >> 12).astype(jnp.float32) * (1.0 / _SCALE))
    second_ref[0, 0] = jnp.where(
        secondp >= sentinel, _BIG,
        (secondp >> 12).astype(jnp.float32) * (1.0 / _SCALE))
    arg_ref[0, 0] = bestp & 4095

    # ---- column best (mutual cross-check), packed accumulator ----------
    di_c = jnp.maximum(di, bias1_ref[0, 0][:, None])  # mask image-1 rows
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (TR, K), 0) + r * TR
    cp = jnp.min((di_c << 12) | row_ids, axis=0)

    @pl.when(r == 0)
    def _():
        colbest_ref[0] = jnp.full_like(colbest_ref[0], 2**31 - 1)

    acc = jnp.minimum(cp, colbest_ref[0])
    colbest_ref[0] = acc
    colarg_ref[0, 0] = acc & 4095


def _knn_kernel(idx_ref, d1_ref, d2t_ref, bias1_ref, bias2_ref,
                best_ref, second_ref, arg_ref, colarg_ref,
                colbest_ref):
    del idx_ref  # consumed by the BlockSpec index maps (scalar prefetch)
    r = pl.program_id(1)
    TR = d1_ref.shape[1]
    K = d2t_ref.shape[2]

    d1 = d1_ref[0]                                    # (TR, D)
    d2t = d2t_ref[0]                                  # (D, K) pre-transposed:
    # Mosaic only lowers the canonical (M,K)x(K,N) contraction for bf16
    # operands ("Bad lhs type" on the both-dims-1 d1 @ d2^T form), so the
    # caller ships descriptors in both layouts and the kernel always
    # contracts dim 1 against dim 0.
    # The package pins jax_default_matmul_precision=float32 (geometry
    # needs it); that global would force a 3-pass f32 contraction here
    # and Mosaic rejects fp32-precision matmuls on bf16 operands ("Bad
    # lhs type"). Request native-dtype precision explicitly: for bf16
    # inputs that is the MXU's single-pass bf16 multiply with f32
    # accumulation (preferred_element_type).
    prec = (jax.lax.Precision.DEFAULT if d1.dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)
    sim = jax.lax.dot_general(d1, d2t, (((1,), (0,)), ((), ())),
                              precision=prec,
                              preferred_element_type=jnp.float32)
    dist = jnp.maximum(2.0 - 2.0 * sim, 0.0)          # (TR, K)
    dist = dist + bias2_ref[0, 0][None, :]            # mask image-2 slots

    # ---- row top-2 ---------------------------------------------------
    best = jnp.min(dist, axis=1)                      # (TR,)
    arg = jnp.argmin(dist, axis=1).astype(jnp.int32)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (TR, K), 1)
    second = jnp.min(jnp.where(col_ids == arg[:, None], _BIG, dist), axis=1)
    best_ref[0, 0] = best
    second_ref[0, 0] = second
    arg_ref[0, 0] = arg

    # ---- column best (for the mutual cross-check) --------------------
    dist_c = dist + bias1_ref[0, 0][:, None]          # mask image-1 rows
    colmin = jnp.min(dist_c, axis=0)                  # (K,)
    colarg = (jnp.argmin(dist_c, axis=0).astype(jnp.int32) + r * TR)

    @pl.when(r == 0)
    def _():
        colbest_ref[0] = jnp.full_like(colbest_ref[0], _BIG)
        colarg_ref[0, 0] = jnp.zeros_like(colarg_ref[0, 0])

    upd = colmin < colbest_ref[0]
    colbest_ref[0] = jnp.where(upd, colmin, colbest_ref[0])
    colarg_ref[0, 0] = jnp.where(upd, colarg, colarg_ref[0, 0])


@functools.partial(jax.jit, static_argnames=("interpret", "packed"))
def _knn_topk2(desc, bias, pair_idx, interpret: bool = False,
               packed: bool = True):
    """desc: (N, K, D) f32 or bf16; bias: (N, K) f32 (0 valid / 1e30 not)
    or int32 (0 valid / _DMAX not) for the packed kernel;
    pair_idx: (B, 2) int32 image indices.

    Returns (best (B,K), second (B,K), arg (B,K) int32, colarg (B,K) int32).

    The pair table rides as a scalar-prefetch operand: the BlockSpec
    index maps select each pair's descriptor blocks straight out of the
    resident (N, K, D) array, so no (B, K, D) gathered copies of the
    descriptors are ever materialized in HBM (at K=4096 those copies
    were 2x512 MB of traffic per 256-pair chunk — comparable to the
    matmul time itself).
    """
    N, K, D = desc.shape
    B = pair_idx.shape[0]
    # the row-tile size must DIVIDE K (the grid floor-divides): K is
    # guaranteed a multiple of 128 by supported(), not of 256
    TR = 256 if K % 256 == 0 else 128
    grid = (B, K // TR)
    descT = jnp.swapaxes(desc, 1, 2)   # (N, D, K) for the canonical dot
    # (N, K) operands ride as (N, 1, K): TPU block shapes need the last
    # two dims (sublane, lane) tileable — (1, TR) blocks of a 2-D array
    # are not, (1, 1, TR) blocks of a 3-D array are.
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TR, D), lambda p, r, idx: (idx[p, 0], r, 0)),
            pl.BlockSpec((1, D, K), lambda p, r, idx: (idx[p, 1], 0, 0)),
            pl.BlockSpec((1, 1, TR), lambda p, r, idx: (idx[p, 0], 0, r)),
            pl.BlockSpec((1, 1, K), lambda p, r, idx: (idx[p, 1], 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, TR), lambda p, r, idx: (p, 0, r)),
            pl.BlockSpec((1, 1, TR), lambda p, r, idx: (p, 0, r)),
            pl.BlockSpec((1, 1, TR), lambda p, r, idx: (p, 0, r)),
            pl.BlockSpec((1, 1, K), lambda p, r, idx: (p, 0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((1, K),
                                   jnp.int32 if packed else jnp.float32)],
    )
    kernel = pl.pallas_call(
        _knn_kernel_packed if packed else _knn_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, K), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, K), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, K), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, K), jnp.int32),
        ],
        interpret=interpret,
    )
    best, second, arg, colarg = kernel(pair_idx, desc, descT,
                                       bias[:, None, :], bias[:, None, :])
    return best[:, 0], second[:, 0], arg[:, 0], colarg[:, 0]


def supported(K: int, D: int) -> bool:
    """Whether the fused kernel handles this descriptor layout on TPU."""
    return K % 128 == 0 and D % 128 == 0


@functools.partial(jax.jit, static_argnames=("ratio_thresh", "cross_check",
                                             "interpret", "compute_dtype"))
def match_all_pairs_fused(desc: jnp.ndarray, mask: jnp.ndarray,
                          pair_idx: jnp.ndarray,
                          ratio_thresh: float = 0.7,
                          cross_check: bool = True,
                          interpret: bool = False,
                          compute_dtype: str = "float32"):
    """Drop-in fused equivalent of matching.knn.match_all_pairs.

    desc: (N, K, D); mask: (N, K); pair_idx: (P, 2).
    Returns (match_idx (P, K) int32 into image j or -1, match_mask (P, K)).

    compute_dtype="bfloat16" stores/streams descriptors as bf16 and runs
    the distance matmul at the MXU's native bf16 rate with f32
    accumulation (``preferred_element_type`` in the kernel). Input
    rounding perturbs distances by ~2^-9 relative — the ratio test at
    0.49 and the downstream epipolar gate absorb it (equivalence
    measured in tests/test_pallas_kernels.py) — while the matmul, the
    dominant matching cost, runs ~2-3x faster and descriptor HBM
    traffic halves.
    """
    i, j = pair_idx[:, 0], pair_idx[:, 1]
    if compute_dtype == "bfloat16":
        desc = desc.astype(jnp.bfloat16)
    # The packed-int32 accumulator variant measures 12-14% SLOWER than
    # the float kernel at production shapes (r4 bisect of the r3 match100
    # regression: 4749 vs 5382 pairs/s at kt=3840, 4630 vs 5112 at 4096)
    # — the int min/max column reduction does not pay for the halved
    # accumulator traffic. Kept for experiments; off in production.
    packed = False
    bias = (jnp.where(mask, 0, _DMAX).astype(jnp.int32) if packed
            else jnp.where(mask, 0.0, _BIG).astype(jnp.float32))
    best, second, arg, colarg = _knn_topk2(desc, bias, pair_idx,
                                           interpret=interpret,
                                           packed=packed)

    ratio_ok = best < (ratio_thresh * ratio_thresh) * second
    ok = ratio_ok & mask[i] & (best < _BIG * 0.5)
    if cross_check:
        mutual = jnp.take_along_axis(colarg, arg, axis=1) == \
            jnp.arange(arg.shape[1], dtype=jnp.int32)[None, :]
        ok = ok & mutual
    return jnp.where(ok, arg, -1).astype(jnp.int32), ok
