"""Train SuperPoint on synthetic corner scenes (learned-frontend proof).

Zero-egress environment => no pretrained magicleap checkpoints can exist
here (the reference's own TorchScript blobs are likewise absent,
`.MISSING_LARGE_BLOBS`). This script produces the substitute artifact:
REAL trained weights for the real SuperPoint architecture
(features/superpoint.py), fit on analytic corner scenes
(eval/render.py) with the standard SuperPoint losses —

- detector: 65-way cell classification (64 subcell positions + dust bin)
  against the known blob-center projections,
- descriptor: cross-view InfoNCE anchored on landmark identity (two
  views of the same blob pull together, different blobs push apart).

Generalization, not memorization: training draws from MANY scenes
(fresh textures, blob layouts and rigs per scene) with photometric
augmentation (brightness/contrast jitter + pixel noise) each step; the
committed weights are evaluated on held-out scenes and power
tests/test_learned_e2e.py — a full reconstruction through
detector=superpoint, matcher=superglue on a scene the training never saw.

Usage: python scripts/train_frontend.py [--steps 600] [--out PATH]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def build_labels(scene, hc, wc):
    """Per-view detector cell labels (64 subcell classes + dust bin)."""
    n_views = scene["images"].shape[0]
    labels = np.full((n_views, hc, wc), 64, np.int32)
    for i in range(n_views):
        uv = scene["gt_uv"][i][scene["gt_vis"][i]]
        cx = (uv[:, 0] // 8).astype(np.int32)
        cy = (uv[:, 1] // 8).astype(np.int32)
        sub = ((uv[:, 1] % 8).astype(np.int32) * 8
               + (uv[:, 0] % 8).astype(np.int32))
        labels[i, cy, cx] = sub
    return labels


def build_pairs(scene, lm_budget, rng):
    """All covisible view pairs with fixed-size landmark samples."""
    n_views = scene["images"].shape[0]
    vis = scene["gt_vis"]
    pairs, lms = [], []
    for i in range(n_views):
        for j in range(i + 1, n_views):
            common = np.flatnonzero(vis[i] & vis[j])
            if len(common) < 8:
                continue
            take = rng.choice(common, lm_budget,
                              replace=len(common) < lm_budget)
            pairs.append((i, j))
            lms.append(take)
    return np.asarray(pairs, np.int32), np.asarray(lms, np.int32)


def make_dataset(n_scenes, views_per_scene, h, w, lm_budget, seed):
    """Pre-render a bank of scenes; returns stacked arrays.

    Images (S, V, h, w); labels (S, V, hc, wc); per-scene pair tables
    padded to a common pair count.
    """
    from reconstructor_tpu.eval import render
    rng = np.random.default_rng(seed)
    imgs, labels, uvs, pair_ij, pair_lm = [], [], [], [], []
    for s in range(n_scenes):
        scene = render.make_scene(
            seed=seed * 1000 + s, n_views=views_per_scene, h=h, w=w,
            n_blobs=int(rng.integers(90, 140)),
            focal_px=float(rng.uniform(150, 200)))
        imgs.append(scene["images"])
        labels.append(build_labels(scene, h // 8, w // 8))
        uvs.append(scene["gt_uv"])
        ij, lm = build_pairs(scene, lm_budget, rng)
        pair_ij.append(ij)
        pair_lm.append(lm)
    n_pair = min(len(p) for p in pair_ij)
    pad_uv = max(u.shape[1] for u in uvs)
    uv_arr = np.zeros((n_scenes, views_per_scene, pad_uv, 2), np.float32)
    for s, u in enumerate(uvs):
        uv_arr[s, :, :u.shape[1]] = u
    return (np.stack(imgs), np.stack(labels), uv_arr,
            np.stack([p[:n_pair] for p in pair_ij]),
            np.stack([p[:n_pair] for p in pair_lm]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--lr", type=float, default=1.5e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--scenes", type=int, default=24)
    ap.add_argument("--views", type=int, default=6)
    ap.add_argument("--size", type=int, default=160)
    ap.add_argument("--out", default="tests/data/superpoint_synth.npz")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax
    from reconstructor_tpu.eval import render
    from reconstructor_tpu.features import superpoint as sp

    H = W = args.size
    hc, wc = H // 8, W // 8
    LM_BUDGET = 48
    print(f"rendering {args.scenes} scenes x {args.views} views ...",
          flush=True)
    imgs, labels, gt_uv, pair_ij, pair_lm = make_dataset(
        args.scenes, args.views, H, W, LM_BUDGET, args.seed)
    imgs_j = jnp.asarray(imgs)          # (S, V, H, W)
    labels_j = jnp.asarray(labels)      # (S, V, hc, wc)
    uv_j = jnp.asarray(gt_uv)           # (S, V, P, 2)
    ij_j = jnp.asarray(pair_ij)         # (S, Q, 2)
    lm_j = jnp.asarray(pair_lm)         # (S, Q, M)

    params = sp.init_params(jax.random.PRNGKey(1))
    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warmup_steps=min(100, args.steps // 10),
        decay_steps=args.steps, end_value=args.lr * 0.03)
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(sched))
    opt_state = opt.init(params)
    TAU = 20.0
    N_PAIR_SAMPLE = 6

    def scene_loss(p, key, s):
        gray = imgs_j[s]                                # (V, H, W)
        # photometric augmentation: per-view brightness/contrast + noise
        k1, k2, k3, k4 = jax.random.split(key, 4)
        gain = 1.0 + 0.25 * jax.random.normal(k1, (gray.shape[0], 1, 1))
        bias = 0.1 * jax.random.normal(k2, (gray.shape[0], 1, 1))
        noise = 0.02 * jax.random.normal(k3, gray.shape)
        gray = jnp.clip(gray * gain + bias + noise, 0.0, 1.0)

        logits, desc_raw = sp.forward(p, gray)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, labels_j[s][..., None],
                                   axis=-1)[..., 0]
        is_kp = labels_j[s] != 64
        det = (jnp.sum(nll * is_kp) / jnp.maximum(jnp.sum(is_kp), 1)
               + 0.3 * jnp.sum(nll * ~is_kp) / jnp.maximum(jnp.sum(~is_kp), 1))

        def view_desc(i):
            return sp._bilinear_sample_map(desc_raw[i], uv_j[s, i])
        all_desc = jax.vmap(view_desc)(jnp.arange(gray.shape[0]))

        qidx = jax.random.randint(k4, (N_PAIR_SAMPLE,), 0, ij_j.shape[1])

        def pair_loss(q):
            ij = ij_j[s, q]
            lm = lm_j[s, q]
            di = all_desc[ij[0], lm]
            dj = all_desc[ij[1], lm]
            sim = TAU * (di @ dj.T)
            lbl = jnp.arange(sim.shape[0])
            return 0.5 * jnp.mean(
                optax.softmax_cross_entropy_with_integer_labels(sim, lbl)
                + optax.softmax_cross_entropy_with_integer_labels(sim.T, lbl))

        desc = jnp.mean(jax.vmap(pair_loss)(qidx))
        return det + desc, (det, desc)

    def loss_fn(p, key, scene_ids):
        keys = jax.random.split(key, scene_ids.shape[0])
        (l, aux) = jax.vmap(lambda k, s: scene_loss(p, k, s))(keys, scene_ids)
        return jnp.mean(l), (jnp.mean(aux[0]), jnp.mean(aux[1]))

    @jax.jit
    def step(p, s, key, scene_ids):
        (l, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(
            p, key, scene_ids)
        updates, s = opt.update(g, s)
        return optax.apply_updates(p, updates), s, l, aux

    SCENES_PER_STEP = 2
    rng = np.random.default_rng(args.seed + 1)
    key = jax.random.PRNGKey(args.seed + 2)
    t0 = time.time()
    for it in range(args.steps):
        key, sub = jax.random.split(key)
        sids = jnp.asarray(rng.choice(args.scenes, SCENES_PER_STEP,
                                      replace=False))
        params, opt_state, l, (det, desc) = step(params, opt_state, sub, sids)
        if it % 25 == 0 or it == args.steps - 1:
            print(f"step {it:4d}  loss {float(l):.4f}  det {float(det):.4f} "
                  f"desc {float(desc):.4f}  ({time.time()-t0:.0f}s)",
                  flush=True)

    # ---- held-out evaluation -------------------------------------------
    ev = render.make_scene(seed=args.seed + 777, n_views=6, h=H, w=W)
    feats = sp.detect_and_describe(
        params, jnp.asarray(ev["images"]),
        jnp.asarray(np.tile([H, W], (6, 1)).astype(np.int32)),
        max_keypoints=256)
    xy = np.asarray(feats.xy)
    msk = np.asarray(feats.mask)
    recalls, precisions = [], []
    for i in range(6):
        gt = ev["gt_uv"][i][ev["gt_vis"][i]]
        det_xy = xy[i][msk[i]]
        if len(det_xy) == 0:
            recalls.append(0.0); precisions.append(0.0)
            continue
        d_gt = np.linalg.norm(gt[:, None] - det_xy[None], axis=-1)
        recalls.append(float((d_gt.min(1) <= 2.0).mean()))
        precisions.append(float((d_gt.min(0) <= 2.0).mean()))
    logits, draw = sp.forward(params, jnp.asarray(ev["images"]))
    d0 = np.asarray(sp._bilinear_sample_map(draw[0], jnp.asarray(ev["gt_uv"][0])))
    d3 = np.asarray(sp._bilinear_sample_map(draw[3], jnp.asarray(ev["gt_uv"][3])))
    both = ev["gt_vis"][0] & ev["gt_vis"][3]
    sim = d0[both] @ d3[both].T
    pos = float(np.mean(np.diag(sim)))
    neg = float(np.mean(sim[~np.eye(sim.shape[0], dtype=bool)]))

    flat = {}
    for name, layer in params.items():
        for k, v in layer.items():
            flat[f"{name}.{k}"] = np.asarray(v).astype(np.float16)
    import os
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    np.savez_compressed(args.out, **flat)
    print(json.dumps({
        "steps": args.steps, "train_s": round(time.time() - t0, 1),
        "det_recall_2px_heldout": round(float(np.mean(recalls)), 3),
        "det_precision_2px_heldout": round(float(np.mean(precisions)), 3),
        "desc_pos_sim": round(pos, 3), "desc_neg_sim": round(neg, 3),
        "weights": args.out,
        "size_mb": round(os.path.getsize(args.out) / 1e6, 2)}))


if __name__ == "__main__":
    main()
