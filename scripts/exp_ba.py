"""BA solver microbenchmark: TPU landmark-major Schur LM vs the native
C++ DENSE_SCHUR baseline (native/ba_schur.cpp, OpenMP x4, f64).

Problems: a saved real fountain BA problem (out/ba_problem_final.npz, if
bench.py has exported one) and synthetic problems with fountain-like and
100-camera shapes. Reports s/iter and time-to-equal-cost for both
solvers.

Usage:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_ba.py [--sizes small]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_problem(rng, C, L, obs_per_cam, pose_noise=5e-3, pt_noise=2e-2,
                 px_noise=0.5, C_pad=None, L_pad=None):
    """Synthetic BA problem shaped like an incremental-SfM final solve:
    cameras on an arc, landmarks in a box, each landmark observed by a
    contiguous run of cameras (track-length distribution ~ geometric)."""
    import jax.numpy as jnp
    from reconstructor_tpu.ba import lm
    from reconstructor_tpu.geometry import se3, camera as cam_mod

    intr = np.array([520.0, 520.0, 256.0, 170.0, 0.0, 0.0], np.float32)
    cams_gt = []
    for i in range(C):
        th = 0.8 * i / max(C - 1, 1) - 0.4
        aa = np.array([0.02 * np.sin(3 * th), th, 0.01 * np.cos(5 * th)], np.float32)
        t = np.array([-2.0 * np.sin(th), 0.1 * th, 0.3 * (1 - np.cos(th))], np.float32)
        cams_gt.append(np.concatenate([aa, t, intr]))
    cams_gt = np.stack(cams_gt)

    pts_gt = rng.uniform([-3, -2, 4], [3, 2, 10], (L, 3)).astype(np.float32)
    # track: first cam uniform, length geometric-ish, clipped
    first = rng.integers(0, C, L)
    tlen = np.minimum(2 + rng.geometric(0.35, L), C - first)
    obs_cam, obs_pt = [], []
    for l in range(L):
        for c in range(first[l], first[l] + tlen[l]):
            obs_cam.append(c)
            obs_pt.append(l)
    obs_cam = np.asarray(obs_cam, np.int32)
    obs_pt = np.asarray(obs_pt, np.int32)

    R_all = np.stack([np.asarray(se3.angle_axis_to_rotation(jnp.asarray(a)))
                      for a in cams_gt[:, :3]])
    pc = np.einsum("oij,oj->oi", R_all[obs_cam], pts_gt[obs_pt]) + cams_gt[obs_cam, 3:6]
    uv = np.asarray(cam_mod.project(jnp.asarray(intr), jnp.asarray(pc)))
    uv = uv + rng.normal(0, px_noise, uv.shape).astype(np.float32)

    cams0 = cams_gt.copy()
    cams0[2:, :3] += rng.normal(0, pose_noise, (C - 2, 3)).astype(np.float32)
    cams0[2:, 3:6] += rng.normal(0, pose_noise * 5, (C - 2, 3)).astype(np.float32)
    pts0 = pts_gt + rng.normal(0, pt_noise, pts_gt.shape).astype(np.float32)

    C_pad = C_pad or C
    L_pad = L_pad or L
    O = obs_cam.size
    O_pad = -(-O // 4096) * 4096
    cp = np.zeros((C_pad, 12), np.float32); cp[:C] = cams0
    pp = np.zeros((L_pad, 3), np.float32); pp[:L] = pts0
    oc = np.zeros(O_pad, np.int32); oc[:O] = obs_cam
    op = np.zeros(O_pad, np.int32); op[:O] = obs_pt
    ouv = np.zeros((O_pad, 2), np.float32); ouv[:O] = uv
    om = np.zeros(O_pad, bool); om[:O] = True
    free = np.zeros((C_pad, 12), np.float32)
    free[:C] = np.asarray(lm.make_cam_free_mask(C))
    prob = lm.BAProblem(
        cam_params=jnp.asarray(cp), points=jnp.asarray(pp),
        obs_cam=jnp.asarray(oc), obs_pt=jnp.asarray(op),
        obs_uv=jnp.asarray(ouv), obs_mask=jnp.asarray(om),
        cam_free=jnp.asarray(free))
    return prob, O


def time_tpu(prob, max_iters=50, damping="marquardt", huber=0.0, repeat=3):
    from reconstructor_tpu.ba import lm
    def run():
        r = lm.solve(prob, max_iters=max_iters, damping=damping,
                     huber_delta=huber)
        np.asarray(r.cost_final)
        return r
    r = run()  # compile
    best = float("inf")
    for _ in range(repeat):
        t0 = time.time(); r = run(); best = min(best, time.time() - t0)
    iters = max(int(r.iterations), 1)
    return dict(total_s=best, iters=iters, s_per_iter=best / iters,
                cost0=float(r.cost_initial), cost=float(r.cost_final),
                cost_trace=np.asarray(r.cost_trace))


def time_to_cost(t, n):
    """Seconds each solver takes to reach the WORSE of the two final
    costs (so both demonstrably got there). TPU per-iteration time is
    total/iters (uniform retries assumption); native carries a real
    per-iteration clock."""
    target = max(t["cost"], n["cost"]) * (1.0 + 1e-6)
    ti = int(np.argmax(t["cost_trace"] <= target)) + 1
    tpu_s = t["s_per_iter"] * ti
    reached = n["cost_trace"] <= target
    if reached.any():
        native_s = float(n["time_trace"][int(np.argmax(reached))])
    else:
        native_s = float(n["total_s"])
    return tpu_s, native_s


def time_native(prob, max_iters=50):
    from reconstructor_tpu.eval import ba_native
    om = np.asarray(prob.obs_mask)
    oc = np.asarray(prob.obs_cam)[om]
    op = np.asarray(prob.obs_pt)[om]
    ouv = np.asarray(prob.obs_uv)[om]
    C = int(oc.max()) + 1
    L = int(op.max()) + 1
    r = ba_native.solve_native_ba(
        np.asarray(prob.cam_params)[:C], np.asarray(prob.points)[:L],
        oc, op, ouv, np.asarray(prob.cam_free)[:C], max_iters=max_iters)
    return dict(total_s=r["total_s"], iters=r["iters"],
                s_per_iter=r["s_per_iter"], cost=r["cost_final"],
                cost_trace=r["cost_trace"], time_trace=r["time_trace"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="fountain,large")
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    import jax
    print("device:", jax.devices()[0], file=sys.stderr)
    rng = np.random.default_rng(0)

    shapes = {
        "fountain": dict(C=25, L=11000, C_pad=32, L_pad=16384),
        "large": dict(C=100, L=40000, C_pad=112, L_pad=49152),
        "small": dict(C=10, L=2000, C_pad=16, L_pad=2048),
    }
    for name in args.sizes.split(","):
        sh = shapes[name]
        prob, O = make_problem(rng, sh["C"], sh["L"], None,
                               C_pad=sh["C_pad"], L_pad=sh["L_pad"])
        print(f"[{name}] C={sh['C']} L={sh['L']} O={O}", file=sys.stderr)
        t = time_tpu(prob, max_iters=args.iters)
        print(f"  tpu    : {t['total_s']:.3f}s / {t['iters']} iters = "
              f"{t['s_per_iter']*1e3:.2f} ms/iter  cost {t['cost0']:.1f} -> {t['cost']:.3f}",
              file=sys.stderr)
        n = time_native(prob, max_iters=args.iters)
        print(f"  native : {n['total_s']:.3f}s / {n['iters']} iters = "
              f"{n['s_per_iter']*1e3:.2f} ms/iter  cost -> {n['cost']:.3f}",
              file=sys.stderr)
        print(f"  speedup (s/iter): {n['s_per_iter']/t['s_per_iter']:.2f}x",
              file=sys.stderr)
        tpu_s, native_s = time_to_cost(t, n)
        print(f"  time-to-equal-cost: tpu {tpu_s:.3f}s vs native "
              f"{native_s:.3f}s = {native_s/max(tpu_s,1e-9):.2f}x",
              file=sys.stderr)


if __name__ == "__main__":
    main()
