from reconstructor_tpu.ba import lm  # noqa: F401
