"""Train a compact SuperGlue GNN on fountain homography pairs.

VERDICT r4 missing #1: every real-photo run so far used
``structured_identity_params`` — Sinkhorn decode on raw descriptors with
the 18 attention layers zeroed. Pretrained magicleap blobs cannot exist
in this zero-egress image, but a small GNN CAN be trained here: this
script supervises a 4-layer (self/cross alternating) attentional GNN on
homography-warped crops of the REAL fountain photographs, with keypoints
and descriptors from the self-distilled SuperPoint
(tests/data/superpoint_fountain.npz).

Initialization IS the structured identity (zeroed residual MLPs +
gamma*I final projection), so step 0 reproduces the current production
matcher exactly and training can only move away from it if the loss
improves — the trained model is accepted only if it beats the identity
on held-out GT correspondence F1 (printed), and finally by the fountain
pipeline gate (bench.py learned path: 25/25 registered or ATE win).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/train_superglue.py
       [--steps 1500] [--pairs 200] [--kps 512] [--out tests/data/superglue_fountain.npz]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


CROP = 320


def build_bank(grays, sp_params, n_pairs, kps, rng, conf_thresh=0.015):
    """(desc0, desc1, xy0, xy1, sc0, sc1, m0, m1, gt0, bin1) arrays.

    gt0[i] = column index of kp i's GT partner, kps (the dust-bin column)
    when kp i maps inside the warp but has no partner within 3 px, or -1
    (excluded from the loss) when it maps outside the crop.
    bin1[j] = True when kp j of the warped crop has no GT partner (its
    dust-bin row term enters the loss).
    """
    import jax
    import jax.numpy as jnp
    from reconstructor_tpu.features import superpoint as sp
    from distill_fountain import rand_homography, warp_image

    detect = jax.jit(lambda g: sp.detect_and_describe(
        sp_params, g[None], jnp.asarray([[CROP, CROP]], jnp.int32),
        max_keypoints=kps, conf_thresh=conf_thresh))

    out = {k: [] for k in ("d0", "d1", "x0", "x1", "s0", "s1",
                           "m0", "m1", "gt0", "bin1")}
    n_img = len(grays)
    made = 0
    while made < n_pairs:
        g = grays[rng.integers(n_img)]
        H_img, W_img = g.shape
        y0 = rng.integers(0, H_img - CROP + 1)
        x0 = rng.integers(0, W_img - CROP + 1)
        crop = g[y0:y0 + CROP, x0:x0 + CROP]
        Hm = rand_homography(rng, CROP)
        warped = warp_image(crop, Hm, CROP)

        fa = detect(jnp.asarray(crop, jnp.float32))
        fb = detect(jnp.asarray(warped, jnp.float32))
        xa = np.asarray(fa.xy[0]); ma = np.asarray(fa.mask[0]).astype(bool)
        xb = np.asarray(fb.xy[0]); mb = np.asarray(fb.mask[0]).astype(bool)
        if ma.sum() < 64 or mb.sum() < 64:
            continue

        # map A's keypoints through the warp: warp_image computes
        # out(x, y) = img(H^-1 (x, y)), so a source point p appears at
        # H(p) in the warped image
        ph = np.concatenate([xa, np.ones((kps, 1))], axis=1) @ Hm.T
        pw = ph[:, :2] / np.maximum(np.abs(ph[:, 2:]), 1e-9) * np.sign(ph[:, 2:])
        inside = ((pw[:, 0] >= 4) & (pw[:, 0] < CROP - 4)
                  & (pw[:, 1] >= 4) & (pw[:, 1] < CROP - 4) & ma)
        d2 = np.linalg.norm(pw[:, None] - xb[None], axis=-1)
        d2[:, ~mb] = 1e9
        nn = d2.argmin(1)
        nnd = d2[np.arange(kps), nn]
        # one-to-one: keep the closest claimant of each target
        gt0 = np.full(kps, -1, np.int64)
        gt0[inside & (nnd < 3.0)] = nn[inside & (nnd < 3.0)]
        for j in np.unique(gt0[gt0 >= 0]):
            claim = np.where(gt0 == j)[0]
            if claim.size > 1:
                keep = claim[np.argmin(nnd[claim])]
                gt0[claim] = -1
                gt0[keep] = j
        gt0[inside & (gt0 < 0)] = kps        # dust-bin column
        matched_j = gt0[(gt0 >= 0) & (gt0 < kps)]
        bin1 = mb.copy()
        bin1[matched_j] = False

        if (gt0 >= 0).sum() < 32:
            continue
        out["d0"].append(np.asarray(fa.desc[0]))
        out["d1"].append(np.asarray(fb.desc[0]))
        out["x0"].append(xa); out["x1"].append(xb)
        out["s0"].append(np.asarray(fa.score[0]))
        out["s1"].append(np.asarray(fb.score[0]))
        out["m0"].append(ma); out["m1"].append(mb)
        out["gt0"].append(gt0); out["bin1"].append(bin1)
        made += 1
    return {k: np.stack(v) for k, v in out.items()}


def small_identity_params(n_layers, gamma=24.0, bin_score=5.0):
    """n-layer GNN initialized AT the structured identity (step 0 ==
    today's production matcher)."""
    import jax
    import jax.numpy as jnp
    from reconstructor_tpu.matching import superglue as sg
    p = sg.init_params(jax.random.PRNGKey(1), n_layers=n_layers)

    def zero_last(mlp_layers):
        last = mlp_layers[-1]["dense"]
        last["w"] = jnp.zeros_like(last["w"])
        last["b"] = jnp.zeros_like(last["b"])

    zero_last(p["kenc"])
    for layer in p["layers"]:
        zero_last(layer["mlp"])
    p["final_proj"] = {"w": gamma * jnp.eye(sg.D_MODEL),
                       "b": jnp.zeros((sg.D_MODEL,))}
    p["bin_score"] = jnp.asarray(bin_score)
    return p


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--pairs", type=int, default=200)
    ap.add_argument("--kps", type=int, default=512)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--sinkhorn-iters", type=int, default=50)
    ap.add_argument("--out", default="tests/data/superglue_fountain.npz")
    ap.add_argument("--warm-start", default=None,
                    help="resume from a params npz instead of the identity")
    ap.add_argument("--bank", default=None,
                    help="npz path to cache/reuse the correspondence bank")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax
    from reconstructor_tpu.features import superpoint as sp
    from reconstructor_tpu.matching import superglue as sg
    from reconstructor_tpu.io import images as io_images

    sp_params = sp.params_from_npz("tests/data/superpoint_fountain.npz")
    imgs = io_images.load_folder("/root/reference/data", 512)
    gray, shapes, _ = io_images.pad_batch(imgs)
    grays = [gray[i, :shapes[i, 0], :shapes[i, 1]] for i in range(len(imgs))]

    rng = np.random.default_rng(0)
    t0 = time.time()
    if args.bank and os.path.exists(args.bank):
        bank = dict(np.load(args.bank))
        print(f"loaded bank {args.bank}", flush=True)
    else:
        bank = build_bank(grays, sp_params, args.pairs, args.kps, rng)
        if args.bank:
            np.savez_compressed(args.bank, **bank)
    n_bank = bank["d0"].shape[0]
    n_val = min(max(8, n_bank // 10), max(n_bank // 2, 1))
    val = {k: jnp.asarray(v[:n_val]) for k, v in bank.items()}
    trn = {k: jnp.asarray(v[n_val:]) for k, v in bank.items()}
    n_trn = n_bank - n_val
    print(f"bank: {n_trn} train / {n_val} val pairs "
          f"({time.time()-t0:.0f} s)", flush=True)

    shape = jnp.asarray([CROP, CROP], jnp.int32)

    def pair_nll(p, b, i):
        xy0n = sg.normalize_keypoints(b["x0"][i], shape[0], shape[1])
        xy1n = sg.normalize_keypoints(b["x1"][i], shape[0], shape[1])
        f0, f1 = sg.gnn_forward(p, b["d0"][i], b["d1"][i], xy0n, xy1n,
                                b["s0"][i], b["s1"][i], b["m0"][i], b["m1"][i])
        scores = jnp.einsum("md,nd->mn", f0, f1) / (sg.D_MODEL ** 0.5)
        Z = sg.log_sinkhorn(scores, p["bin_score"], b["m0"][i], b["m1"][i],
                            args.sinkhorn_iters)
        gt = b["gt0"][i]
        sel = jnp.where(gt >= 0, gt, 0)
        row_ll = Z[jnp.arange(args.kps), sel]
        row_terms = jnp.where(gt >= 0, row_ll, 0.0)
        n_row = jnp.maximum((gt >= 0).sum(), 1)
        bin_ll = jnp.where(b["bin1"][i], Z[args.kps, :args.kps], 0.0)
        n_bin = jnp.maximum(b["bin1"][i].sum(), 1)
        return -(row_terms.sum() / n_row + bin_ll.sum() / n_bin)

    def loss_fn(p, bank_dev, idx):
        # bank_dev is a jit ARGUMENT: closing over the (pairs, K, 256)
        # arrays embeds them as HLO constants, and at 400 pairs the
        # serialized program exceeds the remote-compile helper's request
        # body limit (HTTP 413)
        return jnp.mean(jax.vmap(lambda i: pair_nll(p, bank_dev, i))(idx))

    if args.warm_start and os.path.exists(args.warm_start):
        params = sg.params_from_npz(args.warm_start)
        print(f"warm-started from {args.warm_start}", flush=True)
    else:
        params = small_identity_params(args.layers)
    # cosine decay to 0: the flat-LR run's loss spiked at step 1300 and
    # F1 was still recovering toward the identity at the end — annealing
    # lets the high-precision solution the GNN finds early regain recall
    opt = optax.adam(optax.cosine_decay_schedule(args.lr, args.steps))
    opt_state = opt.init(params)

    @jax.jit
    def step(p, s, bank_dev, idx):
        l, g = jax.value_and_grad(loss_fn)(p, bank_dev, idx)
        updates, s = opt.update(g, s)
        return optax.apply_updates(p, updates), s, l

    def val_f1(p):
        """Precision/recall of decoded matches vs GT on the val pairs."""
        tp = fp = fn = 0
        for i in range(n_val):
            mi, mk, _ = sg.match_pair(
                p, val["d0"][i], val["d1"][i], val["x0"][i], val["x1"][i],
                val["s0"][i], val["s1"][i], val["m0"][i], val["m1"][i],
                shape, shape, sinkhorn_iters=100, score_thresh=0.5)
            mi = np.asarray(mi)
            gt = np.asarray(val["gt0"][i])
            has_gt = (gt >= 0) & (gt < args.kps)
            pred = mi >= 0
            tp += int((pred & has_gt & (mi == gt)).sum())
            fp += int((pred & ~(has_gt & (mi == gt))).sum())
            fn += int((has_gt & ~(pred & (mi == gt))).sum())
        prec = tp / max(tp + fp, 1)
        rec = tp / max(tp + fn, 1)
        return 2 * prec * rec / max(prec + rec, 1e-9), prec, rec

    f1_0, p0, r0 = val_f1(params)
    print(f"identity baseline: F1 {f1_0:.3f} (P {p0:.3f} R {r0:.3f})",
          flush=True)

    best_f1, best_params = f1_0, params
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    for it in range(args.steps):
        key, k = jax.random.split(key)
        idx = jax.random.randint(k, (args.batch,), 0, n_trn)
        params, opt_state, l = step(params, opt_state, trn, idx)
        if (it + 1) % 100 == 0:
            f1, prec, rec = val_f1(params)
            mark = ""
            if f1 > best_f1:
                best_f1, best_params = f1, jax.tree.map(lambda x: x, params)
                mark = "  *best*"
            print(f"step {it+1:5d}: loss {float(l):.4f}  F1 {f1:.3f} "
                  f"(P {prec:.3f} R {rec:.3f})  "
                  f"{(it+1)/(time.time()-t0):.1f} it/s{mark}", flush=True)

    print(f"final: best F1 {best_f1:.3f} vs identity {f1_0:.3f}", flush=True)
    if best_f1 > f1_0:
        sg.params_to_npz(best_params, args.out)
        print(f"saved {args.out}", flush=True)
    else:
        print("trained model did NOT beat the identity — not saving",
              flush=True)


if __name__ == "__main__":
    main()
