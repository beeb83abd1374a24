"""Test harness: run everything on CPU with 8 virtual devices.

Multi-chip sharding logic (shard_map/pjit over a Mesh) is exercised on a
simulated mesh via --xla_force_host_platform_device_count, so the full
distributed path compiles and executes without a pod.

Note: this environment's sitecustomize registers the axon TPU plugin and
forces jax_platforms before any user code runs, so plain JAX_PLATFORMS env
vars are ignored — the config must be updated post-import, before any
computation.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
