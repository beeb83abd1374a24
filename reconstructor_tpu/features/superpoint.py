"""SuperPoint learned detector/descriptor as a JAX/Flax module.

Capability parity with the reference's ``FeatureSuperPoint``
(FeatureSuperPoint.{h,cpp}): the same VGG-style shared encoder + 65-channel
detector head + 256-channel descriptor head as the TorchScript model the
reference loads (FeatureSuperPoint.cpp:217), with the decode pipeline of
cpp:95-211 — softmax over the 65 logits, dust-bin drop, depth-to-space x8
heatmap, confidence threshold 0.015, NMS radius 4, border strip 4,
descriptor sampling at keypoints + L2 norm — re-done as fixed-shape
batched array ops.

Deliberate improvements over the reference's decode (documented, not
accidental):
- cpp:106-116 normalizes each of the 65 channels by that channel's global
  sum — a bug; the true SuperPoint decode (and ours) is a softmax across
  the 65 channels per cell.
- cpp:191-195 samples the descriptor at the integer cell (x/8, y/8); we
  bilinearly interpolate the descriptor map at the keypoint (the upstream
  magicleap implementation's choice), which measurably improves matching.
- greedy confidence-ordered grid NMS (cpp:15-70) is inherently
  sequential; we use max-pool NMS over the same radius — the standard
  batched equivalent.

Weights: ``params_from_torch_state_dict`` converts the public magicleap
``superpoint_v1.pth`` checkpoint (the weights behind the reference's
missing ``models/superpoint_model.zip`` blob); ``init_params`` gives
random weights for tests.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from reconstructor_tpu.features.sift import Features

# encoder channel plan (VGG-style, matching magicleap SuperPointNet)
_ENC = [(1, 64), (64, 64), (64, 64), (64, 64),
        (64, 128), (128, 128), (128, 128), (128, 128)]
_ENC_NAMES = ["conv1a", "conv1b", "conv2a", "conv2b",
              "conv3a", "conv3b", "conv4a", "conv4b"]
# pool after conv1b, conv2b, conv3b
_POOL_AFTER = {"conv1b", "conv2b", "conv3b"}


def init_params(key: jax.Array, dtype=jnp.float32) -> Dict[str, Any]:
    """He-initialized parameter pytree (layout: HWIO conv kernels)."""
    params = {}

    def conv(key, name, cin, cout, k):
        w_key, _ = jax.random.split(key)
        fan_in = cin * k * k
        w = jax.random.normal(w_key, (k, k, cin, cout), dtype) * np.sqrt(2.0 / fan_in)
        params[name] = {"w": w, "b": jnp.zeros((cout,), dtype)}

    keys = jax.random.split(key, len(_ENC) + 4)
    for i, ((cin, cout), name) in enumerate(zip(_ENC, _ENC_NAMES)):
        conv(keys[i], name, cin, cout, 3)
    conv(keys[-4], "convPa", 128, 256, 3)
    conv(keys[-3], "convPb", 256, 65, 1)
    conv(keys[-2], "convDa", 128, 256, 3)
    conv(keys[-1], "convDb", 256, 256, 1)
    return params


def params_from_npz(path: str) -> Dict[str, Any]:
    """Load a parameter pytree saved as a flat ``name.key`` npz (the
    format scripts/train_frontend.py writes; float16 storage upcasts)."""
    data = np.load(path)
    out: Dict[str, Any] = {}
    for flat_key in data.files:
        name, k = flat_key.rsplit(".", 1)
        out.setdefault(name, {})[k] = jnp.asarray(
            data[flat_key].astype(np.float32))
    return out


def params_from_torch_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Convert a magicleap SuperPointNet state_dict (OIHW torch tensors or
    numpy arrays) to this module's HWIO pytree."""
    out = {}
    for name in _ENC_NAMES + ["convPa", "convPb", "convDa", "convDb"]:
        w = np.asarray(sd[f"{name}.weight"])
        b = np.asarray(sd[f"{name}.bias"])
        out[name] = {"w": jnp.asarray(w.transpose(2, 3, 1, 0)),  # OIHW->HWIO
                     "b": jnp.asarray(b)}
    return out


def _conv(x, p, stride=1):
    return jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["b"]


def _maxpool2(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def forward(params: Dict[str, Any], gray: jnp.ndarray):
    """Network forward. gray: (N, H, W) float32 in [0, 1] (the reference's
    /255 prep, FeatureSuperPoint.cpp:265-288), H and W multiples of 8.

    Returns (logits (N, H/8, W/8, 65), desc_raw (N, H/8, W/8, 256)).
    """
    x = gray[..., None]
    for name in _ENC_NAMES:
        x = jax.nn.relu(_conv(x, params[name]))
        if name in _POOL_AFTER:
            x = _maxpool2(x)
    cPa = jax.nn.relu(_conv(x, params["convPa"]))
    logits = _conv(cPa, params["convPb"])
    cDa = jax.nn.relu(_conv(x, params["convDa"]))
    desc = _conv(cDa, params["convDb"])
    return logits, desc


def decode_heatmap(logits: jnp.ndarray) -> jnp.ndarray:
    """(N, Hc, Wc, 65) logits -> (N, Hc*8, Wc*8) keypoint probability.

    Proper softmax over the 65 channels, dust bin dropped, depth-to-space
    (the correct version of FeatureSuperPoint.cpp:95-140).
    """
    prob = jax.nn.softmax(logits, axis=-1)[..., :64]
    n, hc, wc, _ = prob.shape
    prob = prob.reshape(n, hc, wc, 8, 8)
    prob = prob.transpose(0, 1, 3, 2, 4)
    return prob.reshape(n, hc * 8, wc * 8)


def _maxpool_nms(heat: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Keep only local maxima within a (2r+1)^2 window."""
    k = 2 * radius + 1
    mx = jax.lax.reduce_window(heat, -jnp.inf, jax.lax.max,
                               (1, k, k), (1, 1, 1), "SAME")
    return jnp.where(heat >= mx, heat, 0.0)


def _bilinear_sample_map(desc_map: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Sample (Hc, Wc, C) descriptor map at full-res keypoints xy (K, 2)."""
    hc, wc, c = desc_map.shape
    # keypoint -> cell coordinates (cell centers at (i*8+3.5))
    gx = jnp.clip((xy[:, 0] - 3.5) / 8.0, 0.0, wc - 1.0)
    gy = jnp.clip((xy[:, 1] - 3.5) / 8.0, 0.0, hc - 1.0)
    x0 = jnp.clip(jnp.floor(gx).astype(jnp.int32), 0, wc - 2)
    y0 = jnp.clip(jnp.floor(gy).astype(jnp.int32), 0, hc - 2)
    fx = gx - x0
    fy = gy - y0
    v00 = desc_map[y0, x0]
    v01 = desc_map[y0, x0 + 1]
    v10 = desc_map[y0 + 1, x0]
    v11 = desc_map[y0 + 1, x0 + 1]
    v = (v00 * ((1 - fy) * (1 - fx))[:, None] + v01 * ((1 - fy) * fx)[:, None]
         + v10 * (fy * (1 - fx))[:, None] + v11 * (fy * fx)[:, None])
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)


@functools.partial(jax.jit, static_argnames=("max_keypoints", "conf_thresh",
                                             "nms_radius", "border"))
def detect_and_describe(params: Dict[str, Any], gray: jnp.ndarray,
                        shapes: jnp.ndarray, max_keypoints: int = 2048,
                        conf_thresh: float = 0.015, nms_radius: int = 4,
                        border: int = 4) -> Features:
    """Full SuperPoint frontend -> fixed-capacity Features (batched).

    Thresholds default to the reference's (FeatureSuperPoint.h:28-30,
    cpp:18, cpp:76).
    """
    n, H, W = gray.shape
    logits, desc_raw = forward(params, gray)
    heat = decode_heatmap(logits)                       # (N, H, W)
    heat = jnp.where(heat >= conf_thresh, heat, 0.0)
    heat = _maxpool_nms(heat, nms_radius)

    ys = jnp.arange(H)[None, :, None]
    xs = jnp.arange(W)[None, None, :]
    hh = shapes[:, 0][:, None, None]
    ww = shapes[:, 1][:, None, None]
    inb = (ys >= border) & (ys < hh - border) & (xs >= border) & (xs < ww - border)
    heat = jnp.where(inb, heat, 0.0)

    flat = heat.reshape(n, -1)
    scores, idx = jax.lax.top_k(flat, max_keypoints)
    yk = (idx // W).astype(gray.dtype)
    xk = (idx % W).astype(gray.dtype)
    mask = scores > 0.0
    xy = jnp.stack([xk, yk], axis=-1)

    desc = jax.vmap(_bilinear_sample_map)(desc_raw, xy)
    desc = desc * mask[..., None]
    return Features(xy=xy, scale=jnp.full(scores.shape, 8.0, gray.dtype),
                    score=scores, desc=desc, mask=mask)
