"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric: end-to-end fountain-25 reconstruction wall-clock on one
chip, compared against the reference's CPU pipeline stage times
(BASELINE.md). Also reports stage breakdown and quality (landmarks,
registered views) on stderr for humans.

The baseline for vs_baseline: the reference README publishes only
100-image stage timings; for fountain-25 the honest comparable number is
the per-pair matching throughput (76 s for 100-image SIFT+FLANN matching
with 4 threads = 4950 pairs -> ~65 pairs/s). We report matched pairs/s on
the 25-image set (300 pairs) as the headline, with vs_baseline relative
to 65 pairs/s.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    from reconstructor_tpu.config import ReconstructorConfig
    from reconstructor_tpu.pipeline.incremental import IncrementalReconstructor

    data = "/root/reference/data"
    cfg = ReconstructorConfig()
    rec = IncrementalReconstructor(cfg, verbose=False)

    t0 = time.time()
    state = rec.detect_features(data)
    jax.block_until_ready(None) if False else None
    t_detect = time.time() - t0

    # matching benchmark: run twice, second timed (first pays compile)
    t0 = time.time()
    rec.match_features(state)
    t_match_cold = time.time() - t0
    n_pairs = state.num_images * (state.num_images - 1) // 2

    state2 = state
    state2.matches = {}
    t0 = time.time()
    rec.match_features(state2)
    t_match = time.time() - t0
    pairs_per_s = n_pairs / t_match

    # full reconstruction (continues from matches)
    t0 = time.time()
    i1, i2, rel = rec.choose_initial_pair(state2)
    state2.poses[i1] = np.eye(4, dtype=np.float32)
    state2.poses[i2] = rel
    state2.registered = [i1, i2]
    rec.triangulate_initial_pair(state2, i1, i2)
    n_ba_iters = 0
    t_ba = 0.0
    for _ in range(state2.num_images - 2):
        if rec.add_next_view(state2) is None:
            break
        rec.check_landmark_validity(state2, drop=True)
        tb = time.time()
        rec.bundle_adjust(state2)
        t_ba += time.time() - tb
        keep = rec.check_landmark_validity(state2, drop=True)
        state2.remove_landmarks(keep)
    t_recon = time.time() - t0

    stats = {
        "detect_s": round(t_detect, 2),
        "match_cold_s": round(t_match_cold, 2),
        "match_warm_s": round(t_match, 2),
        "incremental_s": round(t_recon, 2),
        "ba_total_s": round(t_ba, 2),
        "landmarks": int(state2.num_landmarks),
        "registered": len(state2.registered),
        "images": int(state2.num_images),
    }
    print(json.dumps(stats), file=sys.stderr)

    baseline_pairs_per_s = 4950 / 76.0  # reference: 100-img matching, OpenMP x4
    print(json.dumps({
        "metric": "matched_pairs_per_s",
        "value": round(pairs_per_s, 2),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_s / baseline_pairs_per_s, 2),
    }))


if __name__ == "__main__":
    main()
