"""Compare BA solver variants (compaction x block dtype) on the exported
fountain problem + the large synthetic: final cost, iterations, s/iter."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from reconstructor_tpu.ba import lm
from scripts import exp_ba


def load(path):
    d = np.load(path)
    return lm.BAProblem(*[jnp.asarray(d[k]) for k in
                          ("cam_params", "points", "obs_cam", "obs_pt",
                           "obs_uv", "obs_mask", "cam_free")])


def run(prob, tag, **kw):
    r = lm.solve(prob, max_iters=50, **kw)
    jax.block_until_ready(r.cost_final)
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        r = lm.solve(prob, max_iters=50, **kw)
        jax.block_until_ready(r.cost_final)
    t = (time.perf_counter() - t0) / reps
    it = int(r.iterations)
    print(f"  {tag:28s} cost {float(r.cost_initial):12.1f} -> "
          f"{float(r.cost_final):12.4f}  iters {it:3d}  "
          f"total {t*1e3:7.1f} ms  {t/max(it,1)*1e3:6.2f} ms/iter")
    return r


for name, prob in [("fountain", load("out/ba_problem_final.npz")),
                   ("large", exp_ba.make_problem(
                       np.random.default_rng(0), 100, 40000, None,
                       C_pad=112, L_pad=49152)[0])]:
    print(f"== {name}")
    run(prob, "f32 nocompact (r3)", compact=False, block_dtype="float32")
    run(prob, "f32 compact", compact=True, block_dtype="float32")
    run(prob, "bf16 compact (rejected: stalls 100-cam)", compact=True,
        block_dtype="bfloat16")
    run(prob, "bf16 nocompact", compact=False, block_dtype="bfloat16")
