"""Latency structure of the fountain-scale BA solve (VERDICT r4 #2).

The LM loop is ONE device program (lax.while_loop); the question is how
much of the measured wall is device compute vs fixed dispatch/transfer
latency through the remote relay. Measures:

  1. tunnel RTT: trivial jitted program + scalar pull
  2. solve wall vs iteration count (ftol=0 disables early exit):
     slope = device s/iter, intercept = fixed per-solve overhead
  3. pipelined throughput: R solver dispatches in flight at once
     (per-solve wall at steady state, the number a production pipeline
     doing ~100 BA solves per reconstruction actually sees)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_ba_latency.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from reconstructor_tpu.ba import lm

    d = np.load("out/ba_problem_final.npz")
    prob = lm.BAProblem(
        cam_params=jnp.asarray(d["cam_params"]),
        points=jnp.asarray(d["points"]),
        obs_cam=jnp.asarray(d["obs_cam"]),
        obs_pt=jnp.asarray(d["obs_pt"]),
        obs_uv=jnp.asarray(d["obs_uv"]),
        obs_mask=jnp.asarray(d["obs_mask"]),
        cam_free=jnp.asarray(d["cam_free"]))
    O = int(d["obs_mask"].sum())
    C = int(d["obs_cam"][d["obs_mask"]].max()) + 1
    L = int(d["obs_pt"][d["obs_mask"]].max()) + 1
    print(f"problem: C={C} L={L} O={O} (padded "
          f"{d['points'].shape[0]}L/{d['obs_mask'].size}O)", flush=True)

    # --- 1. RTT ----------------------------------------------------------
    tiny = jax.jit(lambda x: x * 2.0 + 1.0)
    x = jnp.asarray(3.0)
    np.asarray(tiny(x))
    rtts = []
    for _ in range(10):
        t0 = time.time()
        np.asarray(tiny(x))
        rtts.append(time.time() - t0)
    rtt = float(np.median(rtts))
    print(f"tunnel RTT (tiny jit + scalar pull): {rtt*1e3:.1f} ms "
          f"(min {min(rtts)*1e3:.1f}, max {max(rtts)*1e3:.1f})", flush=True)

    # --- 2. wall vs iteration budget ------------------------------------
    walls = {}
    for iters in (8, 16, 32, 64):
        def run():
            r = lm.solve(prob, max_iters=iters, ftol=0.0)
            np.asarray(r.cost_final)
            return r
        r = run()  # compile
        ts = []
        for _ in range(5):
            t0 = time.time()
            r = run()
            ts.append(time.time() - t0)
        walls[iters] = float(np.median(ts))
        print(f"max_iters={iters:3d}: wall={walls[iters]*1e3:7.1f} ms "
              f"(ran {int(r.iterations)} iters, cost {float(r.cost_final):.1f})",
              flush=True)
    its = np.asarray(sorted(walls))
    ws = np.asarray([walls[i] for i in its])
    slope, intercept = np.polyfit(its, ws, 1)
    print(f"fit: device {slope*1e3:.2f} ms/iter + fixed {intercept*1e3:.1f} ms"
          f" per solve", flush=True)

    # --- 3. pipelined solves (R in flight) ------------------------------
    # Per-solve wall when the dispatch pipeline is kept full — the relay
    # latency overlaps across in-flight solves. Uses the inner jitted
    # core via solve()'s own path (layout cache warm, compact slicing
    # included) but defers every host pull to the end.
    for R in (4, 8):
        def run_pipelined():
            rs = [lm.solve(prob, max_iters=16, ftol=0.0) for _ in range(R)]
            for r in rs:
                np.asarray(r.cost_final)
        run_pipelined()
        ts = []
        for _ in range(3):
            t0 = time.time()
            run_pipelined()
            ts.append(time.time() - t0)
        per = float(np.median(ts)) / R
        print(f"pipelined R={R}: {per*1e3:.1f} ms/solve "
              f"({per/16*1e3:.2f} ms/iter incl. everything)", flush=True)


if __name__ == "__main__":
    main()
