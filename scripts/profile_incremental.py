"""Profile the fountain-25 incremental loop: where do the non-BA seconds go?

Runs detection+matching (warm), then cProfiles the incremental phase and
dumps cumulative stats + per-stage wall clock to out/profile_incremental.txt.
"""
import cProfile
import io
import pstats
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main():
    from reconstructor_tpu.config import ReconstructorConfig
    from reconstructor_tpu.pipeline.incremental import IncrementalReconstructor

    cfg = ReconstructorConfig()
    rec = IncrementalReconstructor(cfg, verbose=False)

    t0 = time.time()
    state = rec.detect_features("/root/reference/data")
    print(f"detect: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    rec.match_features(state)
    print(f"match: {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    prof = cProfile.Profile()
    prof.enable()

    i1, i2, rel = rec.choose_initial_pair(state)
    state.poses[i1] = np.eye(4, dtype=np.float32)
    state.poses[i2] = rel
    state.registered = [i1, i2]
    rec.triangulate_initial_pair(state, i1, i2)
    t_ba = 0.0
    stage_t = {}

    def tick(name, fn, *a, **k):
        s = time.time()
        r = fn(*a, **k)
        stage_t[name] = stage_t.get(name, 0.0) + (time.time() - s)
        return r

    for _ in range(state.num_images - 2):
        if tick("add_next_view", rec.add_next_view, state) is None:
            break
        tick("check_validity", rec.check_landmark_validity, state, drop=True)
        tb = time.time()
        tick("bundle_adjust", rec.bundle_adjust, state)
        t_ba += time.time() - tb
        keep = tick("check_validity", rec.check_landmark_validity, state, drop=True)
        tick("remove_landmarks", state.remove_landmarks, keep)
        tick("complete_tracks", rec.complete_tracks, state)

    prof.disable()
    total = time.time() - t0
    buf = io.StringIO()
    buf.write(f"incremental total: {total:.1f}s  ba: {t_ba:.1f}s  "
              f"registered: {len(state.registered)}  landmarks: {state.num_landmarks}\n")
    buf.write("stage wall clock:\n")
    for k, v in sorted(stage_t.items(), key=lambda kv: -kv[1]):
        buf.write(f"  {k:20s} {v:8.1f}s\n")
    ps = pstats.Stats(prof, stream=buf).sort_stats("cumulative")
    ps.print_stats(60)
    out = buf.getvalue()
    with open("/root/repo/out/profile_incremental.txt", "w") as f:
        f.write(out)
    print(out[:4000], flush=True)


if __name__ == "__main__":
    import os
    os.makedirs("/root/repo/out", exist_ok=True)
    main()
