from reconstructor_tpu.pipeline.incremental import IncrementalReconstructor  # noqa: F401
