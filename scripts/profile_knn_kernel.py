"""Isolate the fused kNN kernel's cost components on TPU.

Variants: (a) matmul only, (b) matmul + row top-2 (no argmin), (c) + argmin,
(d) full kernel (+ column cross-check), each over the same 100-image
workload shapes (B pairs of K=4096 x D=128), f32 and bf16.
"""
import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e30


def make_packed_kernel():
    """Packed-int32 top-2 variant: distance quantized to 2^-17 and packed
    with the column id (di * K + col <= int32 max for K=4096), so each
    argmin-style reduction is ONE plain int min instead of min+argmin,
    and tie-breaking (lowest index on equal distance) is preserved."""
    SCALE = 131072.0  # 2^17; dist in [0,4] -> di < 2^19
    DMAX = (1 << 19) - 1

    def kern(idx_ref, d1_ref, d2t_ref, best_ref, second_ref, arg_ref,
             colarg_ref, colbest_ref):
        r = pl.program_id(1)
        TR = d1_ref.shape[1]
        K = d2t_ref.shape[2]
        d1 = d1_ref[0]
        d2t = d2t_ref[0]
        prec = (jax.lax.Precision.DEFAULT if d1.dtype == jnp.bfloat16
                else jax.lax.Precision.HIGHEST)
        sim = jax.lax.dot_general(d1, d2t, (((1,), (0,)), ((), ())),
                                  precision=prec,
                                  preferred_element_type=jnp.float32)
        di = jnp.clip((2.0 - 2.0 * sim) * SCALE, 0.0, float(DMAX)) \
            .astype(jnp.int32)
        # pack with a FIXED 4096 stride (shifts, not division; K <= 4096):
        # di<<12 | id <= int32 max exactly when di = 2^19-1, id = 4095.
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (TR, K), 1)
        p = (di << 12) | col_ids
        bestp = jnp.min(p, axis=1)
        secondp = jnp.min(jnp.where(p == bestp[:, None], jnp.int32(2**31 - 1),
                                    p), axis=1)
        best_ref[0, 0] = (bestp >> 12).astype(jnp.float32) * (1.0 / SCALE)
        second_ref[0, 0] = (secondp >> 12).astype(jnp.float32) * (1.0 / SCALE)
        arg_ref[0, 0] = bestp & 4095
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (TR, K), 0) + r * TR
        cp = jnp.min((di << 12) | row_ids, axis=0)

        @pl.when(r == 0)
        def _():
            colbest_ref[0] = jnp.full_like(colbest_ref[0], 2**31 - 1)

        upd = cp < colbest_ref[0]
        colbest_ref[0] = jnp.where(upd, cp, colbest_ref[0])
        colarg_ref[0, 0] = colbest_ref[0] & 4095
    return kern


def make_kernel(level: int):
    def kern(idx_ref, d1_ref, d2t_ref, best_ref, second_ref, arg_ref,
             colarg_ref, colbest_ref):
        r = pl.program_id(1)
        TR = d1_ref.shape[1]
        K = d2t_ref.shape[2]
        d1 = d1_ref[0]
        d2t = d2t_ref[0]
        prec = (jax.lax.Precision.DEFAULT if d1.dtype == jnp.bfloat16
                else jax.lax.Precision.HIGHEST)
        sim = jax.lax.dot_general(d1, d2t, (((1,), (0,)), ((), ())),
                                  precision=prec,
                                  preferred_element_type=jnp.float32)
        dist = jnp.maximum(2.0 - 2.0 * sim, 0.0)
        best = jnp.min(dist, axis=1)
        best_ref[0, 0] = best
        if level >= 1:
            arg = jnp.argmin(dist, axis=1).astype(jnp.int32)
            arg_ref[0, 0] = arg
        else:
            arg_ref[0, 0] = jnp.zeros((TR,), jnp.int32)
        if level >= 2:
            col_ids = jax.lax.broadcasted_iota(jnp.int32, (TR, K), 1)
            second = jnp.min(jnp.where(col_ids == arg[:, None], _BIG, dist),
                             axis=1)
            second_ref[0, 0] = second
        else:
            second_ref[0, 0] = best
        if level >= 3:
            colmin = jnp.min(dist, axis=0)
            colarg = (jnp.argmin(dist, axis=0).astype(jnp.int32) + r * TR)

            @pl.when(r == 0)
            def _():
                colbest_ref[0] = jnp.full_like(colbest_ref[0], _BIG)
                colarg_ref[0, 0] = jnp.zeros_like(colarg_ref[0, 0])

            upd = colmin < colbest_ref[0]
            colbest_ref[0] = jnp.where(upd, colmin, colbest_ref[0])
            colarg_ref[0, 0] = jnp.where(upd, colarg, colarg_ref[0, 0])
        else:
            colarg_ref[0, 0] = jnp.zeros_like(colarg_ref[0, 0])
    return kern


@functools.partial(jax.jit, static_argnames=("level", "TR", "interpret"))
def run(desc, descT, pair_idx, level, TR=256, interpret=False):
    N, K, D = desc.shape
    B = pair_idx.shape[0]
    packed = level == "packed"
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(B, K // TR),
        in_specs=[
            pl.BlockSpec((1, TR, D), lambda p, r, idx: (idx[p, 0], r, 0)),
            pl.BlockSpec((1, D, K), lambda p, r, idx: (idx[p, 1], 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, TR), lambda p, r, idx: (p, 0, r)),
            pl.BlockSpec((1, 1, TR), lambda p, r, idx: (p, 0, r)),
            pl.BlockSpec((1, 1, TR), lambda p, r, idx: (p, 0, r)),
            pl.BlockSpec((1, 1, K), lambda p, r, idx: (p, 0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((1, K),
                                   jnp.int32 if packed else jnp.float32)])
    return pl.pallas_call(
        make_packed_kernel() if packed else make_kernel(level),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, 1, K), jnp.float32),
                   jax.ShapeDtypeStruct((B, 1, K), jnp.float32),
                   jax.ShapeDtypeStruct((B, 1, K), jnp.int32),
                   jax.ShapeDtypeStruct((B, 1, K), jnp.int32)],
        interpret=interpret,
    )(pair_idx, desc, descT)


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="bf16 only: full vs packed at K=4096/3584, TR sweep")
    args = ap.parse_args()
    D, B = 128, 256
    rng = np.random.default_rng(0)
    out = {}

    def measure(tag, desc, descT, pair_idx, level, TR):
        r = run(desc, descT, pair_idx, level, TR=TR)
        np.asarray(r[0][:2])
        t0 = time.time()
        for _ in range(3):
            r = run(desc, descT, pair_idx, level, TR=TR)
            np.asarray(r[0][:2])
        dtime = (time.time() - t0) / 3
        out[f"{tag}_ms_per_pair"] = round(dtime / B * 1e3, 4)
        out[f"{tag}_pairs_per_s"] = round(B / dtime, 1)
        print(json.dumps({tag: out[f"{tag}_pairs_per_s"]}), flush=True)

    for K in (4096, 3584):
        desc_f = jnp.asarray(rng.standard_normal((8, K, D)).astype(np.float32))
        pair_idx = jnp.asarray(rng.integers(0, 8, (B, 2)).astype(np.int32))
        dts = ("bfloat16",) if args.quick else ("float32", "bfloat16")
        for dt in dts:
            desc = desc_f.astype(jnp.bfloat16) if dt == "bfloat16" else desc_f
            descT = jnp.swapaxes(desc, 1, 2)
            levels = ([(3, "full"), ("packed", "packed")] if args.quick else
                      [(0, "matmul+min"), (1, "+argmin"), (2, "+second"),
                       (3, "full"), ("packed", "packed")])
            for level, name in levels:
                for TR in ((256, 512) if name in ("full", "packed")
                           else (256,)):
                    if K % TR:
                        continue
                    measure(f"{dt}_K{K}_{name}_TR{TR}", desc, descT,
                            pair_idx, level, TR)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
