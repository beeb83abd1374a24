from reconstructor_tpu.io import images, ply  # noqa: F401
