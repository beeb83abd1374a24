"""100-view synthetic-scene stress run (landmark/BA capacity + wall time).

Exercises the scaling axes the fountain-25 set cannot: ~5k image pairs,
O(100) registered cameras, repeated bucket growth of the landmark and
observation tables, and 98 incremental BA rounds. Ground truth makes the
result checkable (ATE), unlike the reference which has no >25-image run.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/stress_synth.py
       [--views 100] [--points 2000]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=100)
    ap.add_argument("--points", type=int, default=2000)
    ap.add_argument("--clutter", type=int, default=128)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--local-window", type=int, default=0,
                    help="ba_local_window (0 = global BA every view)")
    ap.add_argument("--global-every", type=int, default=8)
    ap.add_argument("--checkpoint", default=None,
                    help="autosave/resume path (the long run rides out "
                         "environment-side TPU worker crashes)")
    ap.add_argument("--seed", type=int, default=0,
                    help="RANSAC key-stream seed (quality varies a few "
                         "tenths of a point between seeds; report runs "
                         "with their seed)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from reconstructor_tpu.eval.synth import make_synthetic_state, pose_ate
    from reconstructor_tpu.config import ReconstructorConfig
    from reconstructor_tpu.pipeline.incremental import IncrementalReconstructor

    state, gt, _ = make_synthetic_state(
        n_views=args.views, n_points=args.points, clutter=args.clutter, seed=7)
    print(f"device={jax.devices()[0]} views={args.views} "
          f"keypoints/view={state.max_keypoints}", file=sys.stderr, flush=True)

    cfg = ReconstructorConfig(max_keypoints=state.max_keypoints, focal_px=520.0,
                              ba_local_window=args.local_window,
                              ba_global_every=args.global_every,
                              rng_seed=args.seed)
    rec = IncrementalReconstructor(cfg, verbose=True)
    t0 = time.time()
    if args.checkpoint:
        import os
        if os.path.exists(args.checkpoint):
            from reconstructor_tpu.pipeline import checkpoint as ckpt
            state = ckpt.load(args.checkpoint)
            key = ckpt.load_rng_key(args.checkpoint)
            if key is not None:
                rec._key = key
            caps = ckpt.load_meta(args.checkpoint).get("caps")
            if caps:
                rec._caps.update(caps)
            print(f"resumed at {len(state.registered)} views",
                  file=sys.stderr, flush=True)
    state = rec.reconstruct_from_state(state,
                                       checkpoint_path=args.checkpoint)
    wall = time.time() - t0

    res = {
        "views_registered": len(state.registered),
        "views_total": state.num_images,
        "landmarks": int(state.num_landmarks),
        "observations": int(state.lm_obs_mask.sum()),
        "wall_s": round(wall, 1),
    }
    res.update({k: round(v, 6) if isinstance(v, float) else v
                for k, v in pose_ate(state.poses, gt).items()})
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
