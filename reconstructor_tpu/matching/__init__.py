from reconstructor_tpu.matching import knn, pairs  # noqa: F401
