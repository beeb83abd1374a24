from reconstructor_tpu.geometry import camera, se3, triangulation, epipolar, ransac, pnp  # noqa: F401
