"""Emit a stress-run report JSON from a (possibly mid-run) checkpoint.

The 100-view stress (scripts/stress_synth.py) autosaves per view; this
tool turns the latest autosave into the committed artifact — used both
for partial progress (environment kills the run) and to recompute the
final numbers (ATE vs the synthetic GT) from the finished state.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python \
           scripts/stress_report.py out/stress100_ckpt.npz [--wall-s N]
"""

import argparse
import json
import sys

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("--views", type=int, default=100)
    ap.add_argument("--points", type=int, default=2000)
    ap.add_argument("--clutter", type=int, default=128)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--wall-s", type=float, default=None)
    ap.add_argument("--partial", action="store_true")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    from reconstructor_tpu.pipeline import checkpoint as ckpt_mod
    from reconstructor_tpu.eval.synth import make_synthetic_state, pose_ate

    state = ckpt_mod.load(args.ckpt)
    _, gt, _ = make_synthetic_state(n_views=args.views, n_points=args.points,
                                    clutter=args.clutter, seed=args.seed)
    res = {
        "views_registered": len(state.registered),
        "views_total": state.num_images,
        "landmarks": int(state.num_landmarks),
        "observations": int(np.asarray(state.lm_obs_mask).sum()),
        "partial": bool(args.partial),
    }
    if args.wall_s is not None:
        res["wall_s"] = args.wall_s
    res.update({k: round(v, 6) if isinstance(v, float) else v
                for k, v in pose_ate(state.poses, gt).items()})
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
