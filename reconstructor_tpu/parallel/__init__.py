from reconstructor_tpu.parallel import sharding  # noqa: F401
