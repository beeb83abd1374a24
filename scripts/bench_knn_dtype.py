"""Micro-benchmark: f32 vs bf16 descriptor matmuls in the matching path.

Runs the reference's 100-image workload (fountain features tiled 4x,
4950 pairs) through the fused kNN kernel and the full match+gate chunk
program in both compute dtypes; reports warm timings and the match/inlier
agreement between the two, to decide the production default for
``knn_compute_dtype``.
"""
import dataclasses
import json
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from reconstructor_tpu.config import ReconstructorConfig
    from reconstructor_tpu.pipeline.incremental import IncrementalReconstructor
    from reconstructor_tpu.matching import pairs as pairing

    cfg = ReconstructorConfig()
    rec = IncrementalReconstructor(cfg, verbose=False)
    state = rec.detect_features("/root/reference/data")

    tile = 4
    state100 = dataclasses.replace(
        state, num_images=state.num_images * tile,
        xy=np.tile(state.xy, (tile, 1, 1)),
        desc=np.tile(state.desc, (tile, 1, 1)),
        kp_mask=np.tile(state.kp_mask, (tile, 1)),
        colors=np.tile(state.colors, (tile, 1, 1)),
        shapes=np.tile(state.shapes, (tile, 1)),
        intrinsics=np.tile(state.intrinsics, (tile, 1)),
        kp_score=np.tile(state.kp_score, (tile, 1)),
        matches={}, poses={}, registered=[], feat2lm=None,
        lm_xyz=None, lm_rgb=None, lm_obs_img=None, lm_obs_feat=None,
        lm_obs_mask=None, lm_initial=None)
    n_pairs = state100.num_images * (state100.num_images - 1) // 2
    out = {"n_pairs": n_pairs, "device": str(jax.devices()[0])}

    results = {}
    for dtype in ("float32", "bfloat16"):
        rec_d = IncrementalReconstructor(cfg.with_(knn_compute_dtype=dtype),
                                         verbose=False)
        state100.matches = {}
        rec_d.match_features(state100)   # cold
        best = float("inf")
        for _ in range(3):
            state100.matches = {}
            t0 = time.time()
            rec_d.match_features(state100)
            best = min(best, time.time() - t0)
        results[dtype] = dict(state100.matches)
        out[f"match100_s_{dtype}"] = round(best, 3)
        out[f"pairs_per_s_{dtype}"] = round(n_pairs / best, 1)
        out[f"total_inliers_{dtype}"] = int(
            sum((m >= 0).sum() for m in state100.matches.values()))

    # agreement: fraction of f32 inlier matches reproduced under bf16
    same = 0
    tot = 0
    for k, m32 in results["float32"].items():
        m16 = results["bfloat16"].get(k)
        sel = m32 >= 0
        tot += int(sel.sum())
        if m16 is not None:
            same += int((m16[sel] == m32[sel]).sum())
    out["agreement_bf16_vs_f32"] = round(same / max(tot, 1), 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
