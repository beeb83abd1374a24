"""SuperGlue learned matcher (attentional GNN + Sinkhorn OT) in JAX.

Capability parity with the reference's ``FeatureMatcherSuperglue``
(FeatureMatcherSuperglue.{h,cpp}): same I/O contract — keypoint coords
normalized to +-0.7 around the image center (utils.cpp:119-150),
keypoint confidences, 256-d SuperPoint descriptors; matches kept when the
match score exceeds 0.5 (FeatureMatcherSuperglue.h:25) — but the network
itself runs natively as batched JAX instead of TorchScript.

Architecture (magicleap SuperGlue, arXiv:1911.11763):
- keypoint MLP encoder [3 -> 32 -> 64 -> 128 -> 256] added to descriptors
- 18 alternating self-/cross-attention message-passing layers
  (4 heads x 64), each with a [512 -> 512 -> 256] MLP on the concatenated
  (x, message)
- final 1x1 projection, pairwise scores scaled by d^-1/4 each side,
  differentiable optimal transport (log-space Sinkhorn) with a learned
  dust-bin score.

Everything is fixed-shape: padded keypoint slots participate with -inf
score masks. Sinkhorn runs its fixed iteration budget as a lax.fori_loop
(matmul + logsumexp — MXU/VPU work; see matching/pallas_sinkhorn.py for
the fused kernel used on the hot path).

Weights: ``params_from_torch_state_dict`` converts the public magicleap
``superglue_outdoor.pth``/``superglue_indoor.pth`` checkpoints (the
reference's missing ``models/superglue_model.zip``); ``init_params`` for
tests.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

D_MODEL = 256
N_HEADS = 4
N_LAYERS = 18  # alternating self, cross
KENC_CHANNELS = [3, 32, 64, 128, 256, D_MODEL]
MLP_CHANNELS = [2 * D_MODEL, 2 * D_MODEL, D_MODEL]


# ----------------------------------------------------------------------
# parameters
# ----------------------------------------------------------------------

def _dense_init(key, cin, cout, dtype):
    w = jax.random.normal(key, (cin, cout), dtype) * np.sqrt(1.0 / cin)
    return {"w": w, "b": jnp.zeros((cout,), dtype)}


def _bn_init(c, dtype):
    return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype),
            "mean": jnp.zeros((c,), dtype), "var": jnp.ones((c,), dtype)}


def _mlp_init(key, channels: List[int], dtype):
    keys = jax.random.split(key, len(channels))
    layers = []
    for i in range(1, len(channels)):
        layer = {"dense": _dense_init(keys[i - 1], channels[i - 1], channels[i], dtype)}
        if i < len(channels) - 1:
            layer["bn"] = _bn_init(channels[i], dtype)
        layers.append(layer)
    return layers


def init_params(key: jax.Array, dtype=jnp.float32,
                n_layers: int = N_LAYERS) -> Dict[str, Any]:
    """``n_layers`` < 18 builds a SMALLER GNN with the same layer
    structure — the forward pass iterates ``params['layers']``, so depth
    is a property of the parameter pytree, not the code (used by the
    trained-here compact model, scripts/train_superglue.py)."""
    keys = jax.random.split(key, 4 + n_layers * 5)
    params: Dict[str, Any] = {
        "kenc": _mlp_init(keys[0], KENC_CHANNELS, dtype),
        "final_proj": _dense_init(keys[1], D_MODEL, D_MODEL, dtype),
        "bin_score": jnp.asarray(1.0, dtype),
        "layers": [],
    }
    for i in range(n_layers):
        k = keys[4 + i * 5: 4 + (i + 1) * 5]
        params["layers"].append({
            "q": _dense_init(k[0], D_MODEL, D_MODEL, dtype),
            "k": _dense_init(k[1], D_MODEL, D_MODEL, dtype),
            "v": _dense_init(k[2], D_MODEL, D_MODEL, dtype),
            "merge": _dense_init(k[3], D_MODEL, D_MODEL, dtype),
            "mlp": _mlp_init(k[4], MLP_CHANNELS, dtype),
        })
    return params


def params_to_npz(params: Dict[str, Any], path: str) -> None:
    """Serialize a params pytree (nested dicts/lists of arrays) to npz."""
    flat: Dict[str, np.ndarray] = {}

    def walk(obj, prefix):
        if isinstance(obj, dict):
            for k, v in obj.items():
                walk(v, f"{prefix}{k}.")
        elif isinstance(obj, (list, tuple)):
            for i, v in enumerate(obj):
                walk(v, f"{prefix}{i}.")
        else:
            flat[prefix[:-1]] = np.asarray(obj)

    walk(params, "")
    np.savez_compressed(path, **flat)


def params_from_npz(path: str) -> Dict[str, Any]:
    """Load a params pytree saved by ``params_to_npz`` (locally-trained
    checkpoints, e.g. tests/data/superglue_fountain.npz)."""
    d = np.load(path)
    root: Dict[str, Any] = {}
    for key in d.files:
        parts = key.split(".")
        cur = root
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        cur[parts[-1]] = jnp.asarray(d[key])

    def listify(obj):
        if isinstance(obj, dict):
            if obj and all(k.isdigit() for k in obj):
                return [listify(obj[str(i)]) for i in range(len(obj))]
            return {k: listify(v) for k, v in obj.items()}
        return obj

    out = listify(root)
    # bin_score is a scalar
    out["bin_score"] = jnp.asarray(out["bin_score"]).reshape(())
    return out


def structured_identity_params(gamma: float = 24.0, bin_score: float = 5.0,
                               dtype=jnp.float32) -> Dict[str, Any]:
    """Structured weights that make SuperGlue a pure Sinkhorn matcher.

    The GNN layers are residual (``x = x + mlp(...)``), so zeroing every
    MLP's final dense (and the keypoint encoder's) turns the 18-layer
    GNN into an exact identity on the input descriptors; the final
    projection is ``gamma * I``, so the optimal-transport scores become
    ``gamma^2 <d_i, d_j> / sqrt(D)`` — temperature-scaled cosine
    similarity of the raw descriptors — and the full dust-bin Sinkhorn +
    mutual-argmax + score>0.5 decode runs unchanged.

    This is the dependency-free operating mode for environments without
    the magicleap checkpoint (config ``superglue_weights="structured"``):
    every line of the production matcher executes, with matching quality
    determined by the descriptors alone. gamma/bin_score defaults assume
    unit-norm descriptors with same-landmark cosine ~0.3+ and
    near-zero cross-landmark similarity (the regime the synthetic-scene
    training lands in): matched scores ~gamma^2*0.3/16 ~= 11, unmatched
    ~0, bin at 5 between (measured sweep: 14x the match yield of the
    previous (19, 14) setting on trained descriptors).
    """
    params = init_params(jax.random.PRNGKey(0), dtype)

    def zero_last(mlp_layers):
        last = mlp_layers[-1]["dense"]
        last["w"] = jnp.zeros_like(last["w"])
        last["b"] = jnp.zeros_like(last["b"])

    zero_last(params["kenc"])
    for layer in params["layers"]:
        zero_last(layer["mlp"])
    params["final_proj"] = {"w": gamma * jnp.eye(D_MODEL, dtype=dtype),
                            "b": jnp.zeros((D_MODEL,), dtype)}
    params["bin_score"] = jnp.asarray(bin_score, dtype)
    return params


def params_from_torch_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Convert magicleap SuperGlue state_dict (Conv1d OIW kernels) to this
    module's dense layout."""
    def dense(prefix):
        w = np.asarray(sd[f"{prefix}.weight"])  # (out, in, 1)
        b = np.asarray(sd[f"{prefix}.bias"])
        return {"w": jnp.asarray(w[:, :, 0].T), "b": jnp.asarray(b)}

    def bn(prefix):
        return {"scale": jnp.asarray(np.asarray(sd[f"{prefix}.weight"])),
                "bias": jnp.asarray(np.asarray(sd[f"{prefix}.bias"])),
                "mean": jnp.asarray(np.asarray(sd[f"{prefix}.running_mean"])),
                "var": jnp.asarray(np.asarray(sd[f"{prefix}.running_var"]))}

    def mlp(prefix, channels):
        # torch MLP: Conv1d at 0, 3, 6, ... with BN at 1, 4, 7, ...
        layers = []
        n = len(channels) - 1
        for i in range(n):
            conv_idx = 3 * i
            layer = {"dense": dense(f"{prefix}.{conv_idx}")}
            if i < n - 1:
                layer["bn"] = bn(f"{prefix}.{conv_idx + 1}")
            layers.append(layer)
        return layers

    params: Dict[str, Any] = {
        "kenc": mlp("kenc.encoder", KENC_CHANNELS),
        "final_proj": dense("final_proj"),
        "bin_score": jnp.asarray(float(np.asarray(sd["bin_score"]))),
        "layers": [],
    }
    for i in range(N_LAYERS):
        p = f"gnn.layers.{i}"
        params["layers"].append({
            "q": dense(f"{p}.attn.proj.0"),
            "k": dense(f"{p}.attn.proj.1"),
            "v": dense(f"{p}.attn.proj.2"),
            "merge": dense(f"{p}.attn.merge"),
            "mlp": mlp(f"{p}.mlp", MLP_CHANNELS),
        })
    return params


# ----------------------------------------------------------------------
# forward
# ----------------------------------------------------------------------

def _dense(p, x):
    return x @ p["w"] + p["b"]


def _bn(p, x, eps=1e-5):
    return (x - p["mean"]) * jax.lax.rsqrt(p["var"] + eps) * p["scale"] + p["bias"]


def _mlp(layers, x):
    n = len(layers)
    for i, layer in enumerate(layers):
        x = _dense(layer["dense"], x)
        if i < n - 1:
            x = jax.nn.relu(_bn(layer["bn"], x))
    return x


def normalize_keypoints(xy: jnp.ndarray, height, width,
                        normalization: float = 0.7) -> jnp.ndarray:
    """The reference's +-0.7 coordinate normalization (utils.cpp:119-150):
    (p - center) / (max(h, w) * range). Integer-floored center, like the
    reference."""
    cx = jnp.floor_divide(width, 2).astype(xy.dtype)
    cy = jnp.floor_divide(height, 2).astype(xy.dtype)
    scale = jnp.maximum(height, width).astype(xy.dtype) * normalization
    return (xy - jnp.stack([cx, cy])[None, :]) / scale


def _attention(q_p, k_p, v_p, merge_p, x, source, source_mask):
    """Multi-head attention: x attends to source. x (M, D); source (N, D).

    Channel-to-head split matches the magicleap Conv1d ``view(b, 64, 4, n)``
    layout: heads are the *inner* stride of the channel dimension.
    """
    M = x.shape[0]
    hd = D_MODEL // N_HEADS
    q = _dense(q_p, x).reshape(M, hd, N_HEADS)
    k = _dense(k_p, source).reshape(-1, hd, N_HEADS)
    v = _dense(v_p, source).reshape(-1, hd, N_HEADS)
    scores = jnp.einsum("mdh,ndh->hmn", q, k) / np.sqrt(hd)
    scores = jnp.where(source_mask[None, None, :], scores, -1e9)
    attn = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("hmn,ndh->mdh", attn, v).reshape(M, D_MODEL)
    return _dense(merge_p, out)


def gnn_forward(params, desc0, desc1, xy0n, xy1n, score0, score1,
                mask0, mask1):
    """Run the full attentional GNN. Returns matching descriptors
    (M, D), (N, D) after the final projection."""
    x0 = desc0 + _mlp(params["kenc"],
                      jnp.concatenate([xy0n, score0[:, None]], axis=-1))
    x1 = desc1 + _mlp(params["kenc"],
                      jnp.concatenate([xy1n, score1[:, None]], axis=-1))

    for i, layer in enumerate(params["layers"]):
        if i % 2 == 0:  # self-attention
            s0, sm0 = x0, mask0
            s1, sm1 = x1, mask1
        else:           # cross-attention
            s0, sm0 = x1, mask1
            s1, sm1 = x0, mask0
        m0 = _attention(layer["q"], layer["k"], layer["v"], layer["merge"],
                        x0, s0, sm0)
        m1 = _attention(layer["q"], layer["k"], layer["v"], layer["merge"],
                        x1, s1, sm1)
        x0 = x0 + _mlp(layer["mlp"], jnp.concatenate([x0, m0], axis=-1))
        x1 = x1 + _mlp(layer["mlp"], jnp.concatenate([x1, m1], axis=-1))

    return _dense(params["final_proj"], x0), _dense(params["final_proj"], x1)


def log_sinkhorn(scores: jnp.ndarray, alpha: jnp.ndarray,
                 mask0: jnp.ndarray, mask1: jnp.ndarray,
                 num_iters: int) -> jnp.ndarray:
    """Differentiable optimal transport with dust bins (SuperGlue §3.2).

    scores: (M, N) similarity; returns the (M+1, N+1) log-coupling.
    Masked slots are driven to -inf so they only couple with the bins.
    """
    M, N = scores.shape
    big_neg = -1e9
    scores = jnp.where(mask0[:, None] & mask1[None, :], scores, big_neg)

    couplings = jnp.concatenate([
        jnp.concatenate([scores, jnp.full((M, 1), alpha, scores.dtype)], axis=1),
        jnp.concatenate([jnp.full((1, N), alpha, scores.dtype),
                         alpha[None, None].astype(scores.dtype)], axis=1),
    ], axis=0)

    m_eff = jnp.sum(mask0).astype(scores.dtype)
    n_eff = jnp.sum(mask1).astype(scores.dtype)
    norm = -jnp.log(m_eff + n_eff + 1e-9)
    log_mu = jnp.concatenate([jnp.where(mask0, norm, big_neg),
                              (jnp.log(n_eff + 1e-9) + norm)[None]])
    log_nu = jnp.concatenate([jnp.where(mask1, norm, big_neg),
                              (jnp.log(m_eff + 1e-9) + norm)[None]])

    def body(_, uv):
        u, v = uv
        u = log_mu - jax.nn.logsumexp(couplings + v[None, :], axis=1)
        v = log_nu - jax.nn.logsumexp(couplings + u[:, None], axis=0)
        return u, v

    u0 = jnp.zeros(M + 1, scores.dtype)
    v0 = jnp.zeros(N + 1, scores.dtype)
    u, v = jax.lax.fori_loop(0, num_iters, body, (u0, v0))
    return couplings + u[:, None] + v[None, :] - norm


def _match_pair_impl(params: Dict[str, Any],
                     desc0, desc1, xy0, xy1, score0, score1,
                     mask0, mask1, shape0, shape1,
                     sinkhorn_iters: int, score_thresh: float,
                     use_pallas: bool):
    """Unjitted single-pair core; vmappable over a batch of pairs (the
    Pallas Sinkhorn call batches to an extra grid dimension)."""
    xy0n = normalize_keypoints(xy0, shape0[0], shape0[1])
    xy1n = normalize_keypoints(xy1, shape1[0], shape1[1])
    f0, f1 = gnn_forward(params, desc0, desc1, xy0n, xy1n,
                         score0, score1, mask0, mask1)
    scores = jnp.einsum("md,nd->mn", f0, f1) / (D_MODEL ** 0.5)
    from reconstructor_tpu.matching import pallas_sinkhorn
    if use_pallas and pallas_sinkhorn.supported(scores.shape[0],
                                                scores.shape[1]):
        Z = pallas_sinkhorn.log_sinkhorn_fused(
            scores, params["bin_score"], mask0, mask1, sinkhorn_iters)
    else:
        Z = log_sinkhorn(scores, params["bin_score"], mask0, mask1, sinkhorn_iters)
    P = jnp.exp(Z[:-1, :-1])
    idx0 = jnp.argmax(P, axis=1)
    idx1 = jnp.argmax(P, axis=0)
    mutual = idx1[idx0] == jnp.arange(P.shape[0])
    mscores = P[jnp.arange(P.shape[0]), idx0]
    ok = mutual & (mscores > score_thresh) & mask0
    return jnp.where(ok, idx0, -1).astype(jnp.int32), ok, mscores


@functools.partial(jax.jit, static_argnames=("sinkhorn_iters", "score_thresh",
                                             "use_pallas"))
def match_pair(params: Dict[str, Any],
               desc0, desc1, xy0, xy1, score0, score1,
               mask0, mask1, shape0, shape1,
               sinkhorn_iters: int = 100, score_thresh: float = 0.5,
               use_pallas: bool = False):
    """Full SuperGlue matching of one image pair.

    Inputs are the fixed-capacity per-image feature arrays; shapes are
    (h, w) int pairs. Returns (match_idx (M,) into image1 or -1,
    match_mask (M,), match_scores (M,)) — the keep-if-score>0.5 contract
    of FeatureMatcherSuperglue.cpp:76-87.
    """
    return _match_pair_impl(params, desc0, desc1, xy0, xy1, score0, score1,
                            mask0, mask1, shape0, shape1,
                            sinkhorn_iters, score_thresh, use_pallas)


@functools.partial(jax.jit, static_argnames=("sinkhorn_iters", "score_thresh",
                                             "use_pallas"))
def match_pairs_batched(params: Dict[str, Any],
                        desc, xy, score, kmask, shapes, pair_idx,
                        sinkhorn_iters: int = 100, score_thresh: float = 0.5,
                        use_pallas: bool = False):
    """Batched all-pairs SuperGlue: one device program per pair *chunk*.

    The reference runs SuperGlue once per pair inside the OpenMP loop
    (FeatureMatcherSuperglue.cpp:51-101, one TorchScript forward each);
    on TPU a per-pair dispatch leaves the chip idle between launches, so
    the whole (B, K, K) attention+Sinkhorn stack is vmapped over the
    chunk — the MXU sees one big batched program.

    desc (N, K, D), xy (N, K, 2), score (N, K), kmask (N, K),
    shapes (N, 2), pair_idx (B, 2). Returns (match_idx (B, K),
    match_mask (B, K), match_scores (B, K)).
    """
    def one(pair):
        i, j = pair[0], pair[1]
        return _match_pair_impl(
            params, desc[i], desc[j], xy[i], xy[j], score[i], score[j],
            kmask[i], kmask[j], shapes[i], shapes[j],
            sinkhorn_iters, score_thresh, use_pallas)

    return jax.vmap(one)(pair_idx)
