from reconstructor_tpu.features import sift  # noqa: F401
