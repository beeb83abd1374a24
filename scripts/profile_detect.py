"""Stage profile of the classic detection path on the real fountain batch.

Times (pipelined, with final host readback): scale space, DoG+extrema+
gates, top-k selection, subpixel, descriptor resample, descriptor
extraction — to find the sink behind detect_imgs_per_s (VERDICT r3 #8).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_detect.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np


def timeit(fn, *args, reps=10, warmup=2):
    import jax
    for _ in range(warmup):
        r = fn(*args)
    jax.tree.map(lambda x: np.asarray(x).ravel()[:1], r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*args)
    jax.tree.map(lambda x: np.asarray(x).ravel()[:1], r)
    return (time.perf_counter() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp
    from reconstructor_tpu.config import ReconstructorConfig
    from reconstructor_tpu.features import sift
    from reconstructor_tpu.io import images as io_images

    cfg = ReconstructorConfig()
    imgs = io_images.load_folder("/root/reference/data", cfg.img_max_size)
    gray, shapes, _ = io_images.pad_batch(imgs)
    gray_j, shapes_j = jnp.asarray(gray), jnp.asarray(shapes)
    N, H, W = gray.shape
    S = cfg.sift_num_scales
    print(f"batch ({N},{H},{W}) scales={S} K={cfg.max_keypoints}")

    ss = jax.jit(lambda g: sift.build_scale_space(g, S, sigma0=cfg.sift_sigma0))
    t = timeit(ss, gray_j)
    print(f"scale space:     {t*1e3:8.2f} ms")
    gauss, sigmas = jax.tree.map(jnp.asarray, ss(gray_j))

    def dog_gates(gauss, shapes):
        dog = gauss[:, 1:] - gauss[:, :-1]
        extrema = sift._neighborhood_extrema(dog)
        contrast_ok = jnp.abs(dog[:, 1:-1]) > cfg.sift_contrast_thresh
        edge_ok = jax.vmap(lambda d: sift._edge_response_ok(
            d, cfg.sift_edge_thresh), in_axes=1, out_axes=1)(dog[:, 1:-1])
        cand = extrema & contrast_ok & edge_ok
        score = jnp.where(cand, jnp.abs(dog[:, 1:-1]), 0.0)
        return score
    dg = jax.jit(dog_gates)
    t = timeit(dg, gauss, shapes_j)
    print(f"DoG+gates:       {t*1e3:8.2f} ms")
    score_vol = jnp.asarray(dg(gauss, shapes_j))

    def nms_topk(score_vol):
        pad = jnp.pad(score_vol, ((0, 0), (0, 0), (1, 1), (1, 1)))
        rows = jnp.maximum(jnp.maximum(pad[:, :, :-2, :], pad[:, :, 1:-1, :]),
                           pad[:, :, 2:, :])
        lm = jnp.maximum(jnp.maximum(rows[:, :, :, :-2], rows[:, :, :, 1:-1]),
                         rows[:, :, :, 2:])
        sv = jnp.where(score_vol >= lm, score_vol, 0.0)
        flat = sv.reshape(N, -1)
        return jax.lax.top_k(flat, cfg.max_keypoints)
    tk = jax.jit(nms_topk)
    t = timeit(tk, score_vol)
    print(f"NMS+top_k:       {t*1e3:8.2f} ms")

    full_det = jax.jit(lambda g, s: sift.detect_keypoints(
        g, s, cfg.max_keypoints, S, cfg.sift_contrast_thresh,
        cfg.sift_edge_thresh, sigma0=cfg.sift_sigma0)[:4])
    t = timeit(full_det, gray_j, shapes_j)
    print(f"detect (all):    {t*1e3:8.2f} ms")

    xy, scale, score, mask, gauss2, sigmas2, s_idx = sift.detect_keypoints(
        gray_j, shapes_j, cfg.max_keypoints, S, cfg.sift_contrast_thresh,
        cfg.sift_edge_thresh, sigma0=cfg.sift_sigma0)
    sigma_list = [cfg.sift_sigma0 * (2.0 ** (i / 3.0)) for i in range(S)]

    desc_fn = jax.jit(lambda g, x, si: jax.vmap(
        sift.compute_descriptors, in_axes=(0, 0, 0, None, None))(
            g, x, si, sigmas2, sigma_list))
    t = timeit(desc_fn, gauss2, xy, s_idx, reps=5)
    print(f"descriptors:     {t*1e3:8.2f} ms")

    resamp = jax.jit(lambda g: jax.vmap(
        lambda gi: sift._resample_pitch_levels(gi, sigma_list, 1,
                                               max(2, S - 2))[0])(g))
    t = timeit(resamp, gauss2, reps=5)
    print(f"  resample only: {t*1e3:8.2f} ms")

    full = jax.jit(lambda g, s: sift.detect_and_describe(
        g, s, max_keypoints=cfg.max_keypoints, num_scales=S,
        contrast_thresh=cfg.sift_contrast_thresh,
        edge_thresh=cfg.sift_edge_thresh, sigma0=cfg.sift_sigma0))
    t = timeit(full, gray_j, shapes_j, reps=5)
    print(f"FULL:            {t*1e3:8.2f} ms -> {N/t:.1f} imgs/s")


if __name__ == "__main__":
    main()
