"""Decompose the match100 headline into kNN / gate / download / dispatch.

The r2->r4 slide (1722 -> 1393 pairs/s) needs attribution, not guesses:
raw kNN (2784 pairs/s in BENCH_r04) is timed WITHOUT downloading its
(B, K) results, while the gated path ships every chunk's full int16
match table through the remote tunnel. This script times, median-of-5
with spread:

  A. production match_and_gate, full result download  (the headline)
  B. production match_and_gate, 4-element download     (compute+dispatch)
  C. kNN only,                 full result download
  D. kNN only,                 4-element download      (the 2784 number)
  E. A at other chunk sizes B in {128, 512, 1024}
  F. A with H=256 hypotheses (gate compute sensitivity)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_match100_decomp.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np


def median_spread(fn, reps=5):
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    ts = np.asarray(ts)
    med = float(np.median(ts))
    return med, float(ts.min()), float(ts.max()), float(ts.std() / med)


def main():
    import jax
    import jax.numpy as jnp
    from reconstructor_tpu.config import ReconstructorConfig
    from reconstructor_tpu.matching import pallas_knn, pairs as pairing
    from reconstructor_tpu.matching.gated import match_and_gate_jit
    from reconstructor_tpu.pipeline.incremental import IncrementalReconstructor

    cfg = ReconstructorConfig()
    rec = IncrementalReconstructor(cfg, verbose=False)
    state = rec.detect_features("/root/reference/data")
    desc_j, mask_j, xy_j = rec._device_frontend(state)
    tile = 4
    desc = jnp.concatenate([desc_j] * tile, axis=0)
    kmask = jnp.concatenate([mask_j] * tile, axis=0)
    xy = jnp.concatenate([xy_j] * tile, axis=0)
    n_img = desc.shape[0]
    Kt = int(desc.shape[1])
    pair_np = pairing.exhaustive_pairs(n_img)
    P = pair_np.shape[0]
    print(f"imgs={n_img} Kt={Kt} pairs={P}", flush=True)
    key0 = jax.random.PRNGKey(7)

    def gated(B, H, full_dl):
        def once():
            futs = []
            for s0 in range(0, P, B):
                chunk = np.zeros((B, 2), np.int32)
                e = min(s0 + B, P)
                chunk[: e - s0] = pair_np[s0:e]
                keys = jax.random.split(key0, B)
                futs.append(match_and_gate_jit(
                    keys, desc, kmask, xy, jnp.asarray(chunk),
                    ratio_thresh=cfg.ratio_thresh,
                    cross_check=cfg.cross_check, use_fused=True,
                    num_hypotheses=H,
                    thresh_px=cfg.fundamental_thresh_px,
                    min_matches=cfg.min_matches_for_filter,
                    compute_dtype=cfg.knn_compute_dtype))
            for mi, cnt in futs:
                if full_dl:
                    np.asarray(mi); np.asarray(cnt)
                else:
                    np.asarray(mi[-1, :4])
        return once

    def knn_only(B, full_dl):
        def once():
            futs = []
            for s0 in range(0, P, B):
                chunk = np.zeros((B, 2), np.int32)
                e = min(s0 + B, P)
                chunk[: e - s0] = pair_np[s0:e]
                futs.append(pallas_knn.match_all_pairs_fused(
                    desc, kmask, jnp.asarray(chunk),
                    ratio_thresh=cfg.ratio_thresh,
                    cross_check=cfg.cross_check,
                    compute_dtype=cfg.knn_compute_dtype))
            for mi, mm in futs:
                if full_dl:
                    np.asarray(mi); np.asarray(mm)
                else:
                    np.asarray(mi[-1, :4])
        return once

    H = cfg.fundamental_num_hypotheses
    import os
    sel = os.environ.get("CASES", "ABCD")
    all_cases = [
        ("A", "A gated B=256 full-dl", gated(256, H, True)),
        ("B", "B gated B=256 tiny-dl", gated(256, H, False)),
        ("C", "C knn   B=256 full-dl", knn_only(256, True)),
        ("D", "D knn   B=256 tiny-dl", knn_only(256, False)),
        ("E", "E gated B=512 full-dl", gated(512, H, True)),
        ("G", "G gated B=1024 full-dl", gated(1024, H, True)),
        ("F", "F gated B=256 H=128 full-dl", gated(256, 128, True)),
    ]
    cases = [(n, f) for c, n, f in all_cases if c in sel]
    for name, fn in cases:
        fn()  # compile
        med, lo, hi, spread = median_spread(fn)
        print(f"{name:30s}: {P/med:7.1f} pairs/s  med={med:.3f}s "
              f"min={lo:.3f} max={hi:.3f} spread={spread*100:.1f}%",
              flush=True)


if __name__ == "__main__":
    main()
