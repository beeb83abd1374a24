"""Sharded-matching + distributed-BA scaling benchmark on a virtual mesh.

Measures pairs/s and BA solve time at 1/2/4/8 mesh shards using CPU
virtual devices (xla_force_host_platform_device_count), reporting scaling
efficiency. On real multi-chip hardware the same code paths shard over
ICI; run there unchanged for hardware numbers (BASELINE config 4/5:
>=80% efficiency at 2 hosts is the target for the collectives design).

Usage:  python scripts/bench_scaling.py [num_images] [keypoints]
"""

import json
import os
import sys
import time

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    n_imgs = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 512

    from reconstructor_tpu.parallel import sharding
    from reconstructor_tpu.matching import pairs as pairing
    from reconstructor_tpu.ba import lm as ba_lm, distributed
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

    rng = np.random.default_rng(0)
    desc = rng.standard_normal((n_imgs, K, 128)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
    mask = np.ones((n_imgs, K), bool)
    pair_idx = pairing.exhaustive_pairs(n_imgs)
    n_pairs = pair_idx.shape[0]

    results = {"num_images": n_imgs, "keypoints": K, "pairs": int(n_pairs)}
    base = None
    for n_dev in (1, 2, 4, 8):
        mesh = sharding.make_mesh(n_dev)
        # warm
        sharding.match_all_pairs_sharded(mesh, desc, mask, pair_idx)
        t0 = time.time()
        for _ in range(3):
            sharding.match_all_pairs_sharded(mesh, desc, mask, pair_idx)
        dt = (time.time() - t0) / 3
        pps = n_pairs / dt
        if base is None:
            base = pps
        results[f"match_pairs_per_s_{n_dev}dev"] = round(pps, 1)
        results[f"match_efficiency_{n_dev}dev"] = round(pps / (base * n_dev), 3)

    # distributed BA scaling
    from test_ba import make_ba_problem  # noqa: E402
    prob, _, _ = make_ba_problem(np.random.default_rng(1), n_cams=8, n_pts=2000)
    O = int(prob.obs_uv.shape[0])
    O_pad = ((O + 7) // 8) * 8
    pad = O_pad - O
    import jax.numpy as jnp
    prob = prob._replace(
        obs_cam=jnp.pad(prob.obs_cam, (0, pad)),
        obs_pt=jnp.pad(prob.obs_pt, (0, pad)),
        obs_uv=jnp.pad(prob.obs_uv, ((0, pad), (0, 0))),
        obs_mask=jnp.pad(prob.obs_mask, (0, pad)))
    base = None
    for n_dev in (1, 2, 4, 8):
        mesh = sharding.make_mesh(n_dev)
        r = distributed.solve_distributed(mesh, prob, max_iters=10, cg_iters=32)
        jax.block_until_ready(r.cost_final)
        t0 = time.time()
        r = distributed.solve_distributed(mesh, prob, max_iters=10, cg_iters=32)
        jax.block_until_ready(r.cost_final)
        dt = time.time() - t0
        if base is None:
            base = dt
        results[f"ba_solve_s_{n_dev}dev"] = round(dt, 3)
        results[f"ba_speedup_{n_dev}dev"] = round(base / dt, 2)

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
