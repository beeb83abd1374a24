from reconstructor_tpu.eval import ate  # noqa: F401
