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


@functools.partial(jax.jit, static_argnames=("level",))
def run(desc, descT, pair_idx, level):
    N, K, D = desc.shape
    B = pair_idx.shape[0]
    TR = 256
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
        scratch_shapes=[pltpu.VMEM((1, K), jnp.float32)])
    return pl.pallas_call(
        make_kernel(level), grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, 1, K if False else TR and K), jnp.float32)
                   if False else jax.ShapeDtypeStruct((B, 1, K), jnp.float32),
                   jax.ShapeDtypeStruct((B, 1, K), jnp.float32),
                   jax.ShapeDtypeStruct((B, 1, K), jnp.int32),
                   jax.ShapeDtypeStruct((B, 1, K), jnp.int32)],
    )(pair_idx, desc, descT)


def main():
    K, D, B = 4096, 128, 256
    rng = np.random.default_rng(0)
    out = {}
    for dt in ("float32", "bfloat16"):
        desc = jnp.asarray(rng.standard_normal((8, K, D)).astype(np.float32))
        if dt == "bfloat16":
            desc = desc.astype(jnp.bfloat16)
        descT = jnp.swapaxes(desc, 1, 2)
        pair_idx = jnp.asarray(
            rng.integers(0, 8, (B, 2)).astype(np.int32))
        for level, name in [(0, "matmul+min"), (1, "+argmin"),
                            (2, "+second"), (3, "full")]:
            r = run(desc, descT, pair_idx, level)
            np.asarray(r[0][:2])
            t0 = time.time()
            for _ in range(3):
                r = run(desc, descT, pair_idx, level)
                np.asarray(r[0][:2])
            dtime = (time.time() - t0) / 3
            out[f"{dt}_{name}_ms_per_pair"] = round(dtime / B * 1e3, 4)
            out[f"{dt}_{name}_pairs_per_s"] = round(B / dtime, 1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
