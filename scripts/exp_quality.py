"""Quality experiment: BA policy / convergence knobs vs fountain-25 ATE.

Runs several config variants through the incremental pipeline in ONE
process (shared detection + matching; per-variant BA programs compile
once each), reporting registered views, landmarks, camera-ICP ATE vs the
golden cloud, and wall-clock — the evidence base for choosing the
production defaults (VERDICT r1 item 4: push ATE toward <= 1.5%).
"""
import copy
import dataclasses
import json
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np


def fresh_state(base):
    """Deep-copy the feature+match state without incremental artifacts."""
    return dataclasses.replace(
        base,
        matches={k: v.copy() for k, v in base.matches.items()},
        poses={}, registered=[], feat2lm=None,
        lm_xyz=None, lm_rgb=None, lm_obs_img=None, lm_obs_feat=None,
        lm_obs_mask=None, lm_initial=None)


def main():
    import jax
    from reconstructor_tpu.config import ReconstructorConfig
    from reconstructor_tpu.pipeline.incremental import IncrementalReconstructor
    from reconstructor_tpu.eval import ate

    base_cfg = ReconstructorConfig()
    rec0 = IncrementalReconstructor(base_cfg, verbose=False)
    state0 = rec0.detect_features("/root/reference/data")
    rec0.match_features(state0)
    print("matching done", flush=True)

    variants = {
        "default": {},
        "default_bf16_matching": {"knn_compute_dtype": "bfloat16"},
        "local_iters50": {"ba_local_max_iters": 50},
        "noretri": {"final_retriangulate": False},
        # r4 ATE push (VERDICT r3 #4): convergence depth + robustifier
        "ftol8": {"ba_ftol": 1e-8},
        "final6": {"final_refinement_rounds": 6},
        "final6_ftol8": {"final_refinement_rounds": 6, "ba_ftol": 1e-8},
        "huber2": {"ba_huber_delta": 2.0},
        "huber45": {"ba_huber_delta": 4.5},
        "maxerr3": {"max_projection_error": 3.0},
        "final9": {"final_refinement_rounds": 9},
        "final6_iters150": {"ba_max_iters_large": 150},
    }
    if len(sys.argv) > 1:
        keep = sys.argv[1].split(",")
        variants = {k: v for k, v in variants.items() if k in keep}

    results = {}
    for name, over in variants.items():
      try:
        cfg = base_cfg.with_(**over)
        rec = IncrementalReconstructor(cfg, verbose=False)
        st = fresh_state(state0)
        if "knn_compute_dtype" in over:
            st.matches = {}      # matching knob changed: rematch
        t0 = time.time()
        st = rec.reconstruct_from_state(st)
        wall = time.time() - t0
        centers = np.stack([-st.poses[i][:3, :3].T @ st.poses[i][:3, 3]
                            for i in st.registered])
        res = ate.ate_vs_golden(centers, "/root/reference/cloud_fountain.ply")
        results[name] = {
            "registered": len(st.registered),
            "landmarks": int(st.num_landmarks),
            "observations": int(st.lm_obs_mask.sum()),
            "ate_rmse": round(res["ate_rmse"], 3),
            "ate_norm": round(res["ate_rmse_normalized"], 4),
            "ate_hung_norm": round(
                res.get("ate_rmse_hungarian_normalized", -1.0), 4),
            "wall_s": round(wall, 1),
        }
        print(json.dumps({name: results[name]}), flush=True)
      except Exception as e:
        results[name] = {"error": repr(e)}
        print(json.dumps({name: results[name]}), flush=True)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
