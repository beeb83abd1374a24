from reconstructor_tpu.utils import timing  # noqa: F401
