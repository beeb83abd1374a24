"""Self-distill SuperPoint on the fountain photographs (VERDICT r2 #6).

Zero-egress environment => the magicleap checkpoint cannot exist here, so
the learned frontend has only ever been proven on synthetic scenes. The
env-compatible closing move: distill the CLASSIC detector into SuperPoint
on the real images themselves —

- teacher: our DoG/SIFT detector's keypoints on the 25 fountain images
  (features/sift.py — the production classic path),
- student: the real SuperPoint architecture (features/superpoint.py),
- supervision: random 160x160 crops warped by random homographies; the
  detector head learns the 65-way cell classification of teacher
  keypoints in BOTH views, the descriptor head an InfoNCE loss anchored
  on keypoint identity across the warp (the standard homographic-
  adaptation recipe, matching the path the reference exercises with
  pretrained weights at FeatureSuperPoint.cpp:228-263).

Images 20-24 are held out of training entirely; eval reports detector
recall/precision @2px against the teacher on those. With --reconstruct,
runs the full fountain-25 pipeline through detector=superpoint,
matcher=superglue (structured) with the distilled weights and reports
registered views + ATE vs the golden cloud next to the SIFT path.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python \
           scripts/distill_fountain.py [--steps 1200] [--cpu] [--reconstruct]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

CROP = 160
M_KP = 48  # keypoint budget per training pair


def rand_homography(rng, size, jitter=0.18):
    """Random perspective warp of a size x size square (corner jitter)."""
    s = float(size)
    src = np.array([[0, 0], [s, 0], [s, s], [0, s]], np.float64)
    dst = src + rng.uniform(-jitter * s, jitter * s, (4, 2))
    # DLT for the 4-point homography
    A = []
    for (x, y), (u, v) in zip(src, dst):
        A.append([x, y, 1, 0, 0, 0, -u * x, -u * y, -u])
        A.append([0, 0, 0, x, y, 1, -v * x, -v * y, -v])
    _, _, Vt = np.linalg.svd(np.asarray(A))
    H = Vt[-1].reshape(3, 3)
    return H / H[2, 2]


def warp_image(img, H, size):
    """Inverse-map bilinear warp of img (H applied to pixel coords)."""
    Hi = np.linalg.inv(H)
    ys, xs = np.mgrid[0:size, 0:size].astype(np.float64)
    ones = np.ones_like(xs)
    src = np.einsum("ij,jhw->ihw", Hi, np.stack([xs, ys, ones]))
    sx = src[0] / src[2]
    sy = src[1] / src[2]
    x0 = np.floor(sx).astype(int)
    y0 = np.floor(sy).astype(int)
    fx, fy = sx - x0, sy - y0
    h, w = img.shape
    valid = (x0 >= 0) & (x0 < w - 1) & (y0 >= 0) & (y0 < h - 1)
    x0c = np.clip(x0, 0, w - 2)
    y0c = np.clip(y0, 0, h - 2)
    out = ((1 - fx) * (1 - fy) * img[y0c, x0c]
           + fx * (1 - fy) * img[y0c, x0c + 1]
           + (1 - fx) * fy * img[y0c + 1, x0c]
           + fx * fy * img[y0c + 1, x0c + 1])
    return np.where(valid, out, 0.0).astype(np.float32)


def cell_labels(uv, valid, size):
    """65-way SuperPoint cell labels (64 subcells + dust bin) for a crop."""
    hc = size // 8
    lab = np.full((hc, hc), 64, np.int32)
    for (x, y), v in zip(uv, valid):
        if not v:
            continue
        cx, cy = int(x // 8), int(y // 8)
        if 0 <= cx < hc and 0 <= cy < hc:
            lab[cy, cx] = int(y % 8) * 8 + int(x % 8)
    return lab


def build_bank(grays, teacher_xy, teacher_mask, n_pairs, rng):
    """Pre-generate (crop, warped crop, kp uv pairs, labels) tuples."""
    imgs = np.zeros((n_pairs, 2, CROP, CROP), np.float32)
    uvs = np.zeros((n_pairs, 2, M_KP, 2), np.float32)
    kvalid = np.zeros((n_pairs, M_KP), bool)
    labels = np.full((n_pairs, 2, CROP // 8, CROP // 8), 64, np.int32)
    n = 0
    while n < n_pairs:
        i = rng.integers(0, len(grays))
        g = grays[i]
        h, w = g.shape
        y0 = rng.integers(0, h - CROP)
        x0 = rng.integers(0, w - CROP)
        crop = g[y0:y0 + CROP, x0:x0 + CROP].astype(np.float32)
        kp = teacher_xy[i][teacher_mask[i]]
        inside = ((kp[:, 0] >= x0 + 2) & (kp[:, 0] < x0 + CROP - 2)
                  & (kp[:, 1] >= y0 + 2) & (kp[:, 1] < y0 + CROP - 2))
        kp_c = kp[inside] - np.array([x0, y0], np.float32)
        if len(kp_c) < 12:
            continue
        H = rand_homography(rng, CROP)
        warped = warp_image(crop, H, CROP)
        ones = np.ones((len(kp_c), 1))
        kp_w = (np.hstack([kp_c, ones]) @ H.T)
        kp_w = kp_w[:, :2] / kp_w[:, 2:3]
        both = ((kp_w[:, 0] >= 2) & (kp_w[:, 0] < CROP - 2)
                & (kp_w[:, 1] >= 2) & (kp_w[:, 1] < CROP - 2))
        if both.sum() < 12:
            continue
        sel = np.flatnonzero(both)
        take = rng.choice(sel, M_KP, replace=len(sel) < M_KP)
        imgs[n, 0] = crop
        imgs[n, 1] = warped
        uvs[n, 0] = kp_c[take]
        uvs[n, 1] = kp_w[take]
        kvalid[n] = True
        labels[n, 0] = cell_labels(kp_c, np.ones(len(kp_c), bool), CROP)
        labels[n, 1] = cell_labels(kp_w[both], np.ones(both.sum(), bool), CROP)
        n += 1
    return imgs, uvs, kvalid, labels


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1200)
    ap.add_argument("--pairs", type=int, default=400)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1.5e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="tests/data/superpoint_fountain.npz")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--reconstruct", action="store_true")
    ap.add_argument("--init", default=None,
                    help="warm-start from an existing weights npz "
                         "(continue training across sessions)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax
    from reconstructor_tpu.config import ReconstructorConfig
    from reconstructor_tpu.features import sift, superpoint as sp
    from reconstructor_tpu.io import images as io_images

    cfg = ReconstructorConfig()
    imgs = io_images.load_folder("/root/reference/data", cfg.img_max_size)
    gray, shapes, _ = io_images.pad_batch(imgs)
    grays = [gray[i][: shapes[i][0], : shapes[i][1]]  # already [0,1]
             for i in range(len(imgs))]

    # ---- teacher: DoG keypoints on every image -------------------------
    feats = sift.detect_and_describe(
        jnp.asarray(gray), jnp.asarray(shapes),
        max_keypoints=1024, num_scales=cfg.sift_num_scales,
        contrast_thresh=cfg.sift_contrast_thresh,
        edge_thresh=cfg.sift_edge_thresh, sigma0=cfg.sift_sigma0)
    t_xy = np.asarray(feats.xy)
    t_mask = np.asarray(feats.mask)
    print(f"teacher: {t_mask.sum(1).mean():.0f} DoG kps/img", flush=True)

    rng = np.random.default_rng(args.seed)
    train_imgs = list(range(20))        # 20-24 held out
    bank = build_bank([grays[i] for i in train_imgs],
                      t_xy[train_imgs], t_mask[train_imgs],
                      args.pairs, rng)
    imgs_j = jnp.asarray(bank[0])       # (P, 2, CROP, CROP)
    uv_j = jnp.asarray(bank[1])         # (P, 2, M, 2)
    lab_j = jnp.asarray(bank[3])        # (P, 2, hc, wc)
    print(f"bank: {args.pairs} crop pairs", flush=True)

    params = sp.init_params(jax.random.PRNGKey(1))
    if args.init and os.path.exists(args.init):
        loaded = dict(np.load(args.init))
        params = {name: {kk: jnp.asarray(loaded[f"{name}.{kk}"],
                                         jnp.float32)
                         for kk in layer}
                  for name, layer in params.items()}
        print(f"warm-start from {args.init}", flush=True)

    def save_params(p):
        flat = {}
        for name, layer in p.items():
            for kk, v in layer.items():
                flat[f"{name}.{kk}"] = np.asarray(v).astype(np.float16)
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        # atomic: a kill mid-write (the scenario autosave guards against)
        # must never truncate the only checkpoint (ADVICE r3)
        tmp = args.out + f".tmp{os.getpid()}"
        np.savez_compressed(tmp, **flat)
        src = tmp if os.path.exists(tmp) else tmp + ".npz"
        os.replace(src, args.out)

    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warmup_steps=min(100, args.steps // 10),
        decay_steps=args.steps, end_value=args.lr * 0.03)
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(sched))
    opt_state = opt.init(params)
    TAU = 20.0

    def pair_loss(p, key, b):
        g = imgs_j[b]                                   # (2, CROP, CROP)
        k1, k2, k3 = jax.random.split(key, 3)
        gain = 1.0 + 0.25 * jax.random.normal(k1, (2, 1, 1))
        bias = 0.1 * jax.random.normal(k2, (2, 1, 1))
        noise = 0.02 * jax.random.normal(k3, g.shape)
        g = jnp.clip(g * gain + bias + noise, 0.0, 1.0)
        logits, draw = sp.forward(p, g)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, lab_j[b][..., None], axis=-1)[..., 0]
        is_kp = lab_j[b] != 64
        det = (jnp.sum(nll * is_kp) / jnp.maximum(jnp.sum(is_kp), 1)
               + 0.3 * jnp.sum(nll * ~is_kp) / jnp.maximum(jnp.sum(~is_kp), 1))
        d0 = sp._bilinear_sample_map(draw[0], uv_j[b, 0])
        d1 = sp._bilinear_sample_map(draw[1], uv_j[b, 1])
        sim = TAU * (d0 @ d1.T)
        lbl = jnp.arange(sim.shape[0])
        desc = 0.5 * jnp.mean(
            optax.softmax_cross_entropy_with_integer_labels(sim, lbl)
            + optax.softmax_cross_entropy_with_integer_labels(sim.T, lbl))
        return det + desc, (det, desc)

    def loss_fn(p, key, bs):
        keys = jax.random.split(key, bs.shape[0])
        l, aux = jax.vmap(lambda k, b: pair_loss(p, k, b))(keys, bs)
        return jnp.mean(l), (jnp.mean(aux[0]), jnp.mean(aux[1]))

    @jax.jit
    def step(p, s, key, bs):
        (l, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(p, key, bs)
        upd, s = opt.update(g, s)
        return optax.apply_updates(p, upd), s, l, aux

    nprng = np.random.default_rng(args.seed + 1)
    key = jax.random.PRNGKey(args.seed + 2)
    t0 = time.time()
    for it in range(args.steps):
        key, sub = jax.random.split(key)
        bs = jnp.asarray(nprng.choice(args.pairs, args.batch, replace=False))
        params, opt_state, l, (det, desc) = step(params, opt_state, sub, bs)
        if it % 50 == 0 or it == args.steps - 1:
            print(f"step {it:4d}  loss {float(l):.4f}  det {float(det):.4f}"
                  f"  desc {float(desc):.4f}  ({time.time()-t0:.0f}s)",
                  flush=True)
        if it and it % 100 == 0:
            save_params(params)   # ride out session/environment cutoffs

    # ---- held-out eval vs the teacher ----------------------------------
    held = list(range(20, 25))
    hf = sp.detect_and_describe(
        params, jnp.asarray(gray[held]),
        jnp.asarray(shapes[held]), max_keypoints=1024,
        conf_thresh=0.015, nms_radius=4, border=4)
    rec, prec = [], []
    for k, i in enumerate(held):
        gt = t_xy[i][t_mask[i]]
        det_xy = np.asarray(hf.xy[k])[np.asarray(hf.mask[k])]
        if len(det_xy) == 0:
            rec.append(0.0); prec.append(0.0); continue
        d = np.linalg.norm(gt[:, None] - det_xy[None], axis=-1)
        rec.append(float((d.min(1) <= 2.0).mean()))
        prec.append(float((d.min(0) <= 2.0).mean()))
    out = {
        "steps": args.steps, "train_s": round(time.time() - t0, 1),
        "teacher_recall_2px_heldout": round(float(np.mean(rec)), 3),
        "teacher_precision_2px_heldout": round(float(np.mean(prec)), 3),
        "weights": args.out,
    }

    save_params(params)
    out["size_mb"] = round(os.path.getsize(args.out) / 1e6, 2)
    print(json.dumps(out), flush=True)

    if args.reconstruct:
        from reconstructor_tpu.pipeline.incremental import IncrementalReconstructor
        from reconstructor_tpu.eval import ate
        rcfg = ReconstructorConfig(
            detector="superpoint", matcher="superglue",
            superpoint_weights=args.out,
            superglue_weights="structured",
            # SuperPoint's conf gate yields ~1k keypoints on these
            # images, and the fused Sinkhorn's (K+1)^2 coupling must fit
            # Mosaic's 16 MiB scoped-vmem stack (OOMs at K=2048)
            max_keypoints=1024)
        rec_ = IncrementalReconstructor(rcfg, verbose=True)
        st = rec_.detect_features("/root/reference/data")
        st = rec_.reconstruct_from_state(st)
        centers = np.stack([-st.poses[i][:3, :3].T @ st.poses[i][:3, 3]
                            for i in st.registered])
        res = ate.ate_vs_golden(centers,
                                "/root/reference/cloud_fountain.ply")
        print(json.dumps({
            "learned_registered": len(st.registered),
            "learned_landmarks": int(st.num_landmarks),
            "learned_ate_normalized": round(res["ate_rmse_normalized"], 4),
        }), flush=True)


if __name__ == "__main__":
    main()
