"""Measure ONLY the gate-inclusive matching headline on TPU.

Reproduces bench.py's match100 section (detection on fountain-25, state
tiled 4x to the reference's 100-image benchmark workload, warm best-of-3
through the production match_features path) without the tens of minutes
of BA/quality stages — the fast iteration loop for kernel work.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/measure_match100.py
"""

import dataclasses as dc
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

    cfg = ReconstructorConfig()
    rec = IncrementalReconstructor(cfg, verbose=False)
    print(json.dumps({"device": str(jax.devices()[0])}), file=sys.stderr)

    t0 = time.time()
    state = rec.detect_features("/root/reference/data")
    print(json.dumps({"detect_cold_s": round(time.time() - t0, 1),
                      "kt": int(getattr(state, "_dev_frontend", [None]*2)[1].shape[1])
                      if getattr(state, "_dev_frontend", None) else -1}),
          file=sys.stderr, flush=True)

    tile = 4
    state100 = dc.replace(
        state,
        num_images=state.num_images * tile,
        xy=np.tile(state.xy, (tile, 1, 1)),
        desc=np.tile(state.desc, (tile, 1, 1)),
        kp_mask=np.tile(state.kp_mask, (tile, 1)),
        colors=np.tile(state.colors, (tile, 1, 1)),
        shapes=np.tile(state.shapes, (tile, 1)),
        intrinsics=np.tile(state.intrinsics, (tile, 1)),
        kp_score=None if state.kp_score is None
        else np.tile(state.kp_score, (tile, 1)),
        matches={}, poses={}, registered=[], feat2lm=None,
        lm_xyz=None, lm_rgb=None, lm_obs_img=None, lm_obs_feat=None,
        lm_obs_mask=None, lm_initial=None)
    n_pairs = state100.num_images * (state100.num_images - 1) // 2
    t0 = time.time()
    rec.match_features(state100)
    print(json.dumps({"match100_cold_s": round(time.time() - t0, 1),
                      "pairs_matched": len(state100.matches)}),
          file=sys.stderr, flush=True)
    best = float("inf")
    for _ in range(3):
        state100.matches = {}
        t0 = time.time()
        rec.match_features(state100)
        best = min(best, time.time() - t0)
    kt = state100._dev_frontend[1].shape[1]
    print(json.dumps({
        "match100_warm_s": round(best, 3),
        "match100_pairs_per_s": round(n_pairs / best, 1),
        "kt": int(kt),
        "pairs_matched": len(state100.matches),
    }))


if __name__ == "__main__":
    main()
