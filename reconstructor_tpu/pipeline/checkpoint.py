"""Reconstruction checkpoint / resume.

The reference has no resumable state at all — its README lists "saving of
intermediate steps ... to avoid their computation" as TODO (SURVEY.md §5).
Here the full ReconstructionState round-trips through one compressed npz:
frontend outputs, match tables, poses, and the landmark/observation
tables, so a run can resume after any stage (e.g. skip detection+matching
when iterating on BA settings, or recover an interrupted run).
"""

from __future__ import annotations

import json
from typing import Optional, Tuple

import numpy as np

from reconstructor_tpu.pipeline.state import ReconstructionState

_FIELDS = ["xy", "desc", "kp_mask", "kp_score", "colors", "shapes",
           "intrinsics", "feat2lm", "lm_xyz", "lm_rgb", "lm_obs_img",
           "lm_obs_feat", "lm_obs_mask", "lm_initial"]


def save(path: str, state: ReconstructionState,
         config=None, rng_key=None, caps: Optional[dict] = None) -> None:
    """Write the full resumable state to one compressed npz.

    ``config`` (a ReconstructorConfig), ``rng_key`` (the driver's current
    PRNG key) and ``caps`` (sticky shape caps) make a resumed run
    reproduce the interrupted one exactly: same thresholds, same RANSAC
    key stream, same compiled program shapes.
    """
    data = {f: getattr(state, f) for f in _FIELDS if getattr(state, f) is not None}
    data["num_images"] = np.asarray(state.num_images)
    data["max_keypoints"] = np.asarray(state.max_keypoints)
    data["registered"] = np.asarray(state.registered, np.int32)
    pose_ids = np.asarray(sorted(state.poses), np.int32)
    data["pose_ids"] = pose_ids
    data["pose_mats"] = np.stack([state.poses[int(i)] for i in pose_ids]) \
        if pose_ids.size else np.zeros((0, 4, 4), np.float32)
    match_keys = np.asarray(sorted(state.matches), np.int32)
    data["match_keys"] = match_keys
    data["match_vals"] = np.stack([state.matches[(int(i), int(j))]
                                   for i, j in match_keys]) \
        if match_keys.size else np.zeros((0, state.max_keypoints), np.int32)
    meta = {}
    if config is not None:
        meta["config"] = {k: v for k, v in vars(config).items()
                          if isinstance(v, (int, float, str, bool, type(None)))}
    if caps:
        meta["caps"] = dict(caps)
    if meta:
        data["meta_json"] = np.frombuffer(
            json.dumps(meta).encode(), dtype=np.uint8)
    if rng_key is not None:
        import jax
        data["rng_key"] = np.asarray(jax.random.key_data(rng_key))
    tmp = path + ".tmp.npz"
    np.savez_compressed(tmp, **data)
    import os
    os.replace(tmp, path)


def load_meta(path: str) -> dict:
    """Read back the config/caps metadata saved alongside the state."""
    z = np.load(path, allow_pickle=False)
    if "meta_json" not in z:
        return {}
    return json.loads(bytes(z["meta_json"].tobytes()).decode())


def load_rng_key(path: str):
    """Restore the driver PRNG key, or None if absent."""
    z = np.load(path, allow_pickle=False)
    if "rng_key" not in z:
        return None
    import jax
    return jax.random.wrap_key_data(z["rng_key"])


def load(path: str) -> ReconstructionState:
    z = np.load(path, allow_pickle=False)
    state = ReconstructionState(
        num_images=int(z["num_images"]),
        max_keypoints=int(z["max_keypoints"]),
        xy=z["xy"], desc=z["desc"], kp_mask=z["kp_mask"],
        colors=z["colors"], shapes=z["shapes"], intrinsics=z["intrinsics"],
        kp_score=z["kp_score"] if "kp_score" in z else None,
        feat2lm=z["feat2lm"],
        lm_xyz=z["lm_xyz"], lm_rgb=z["lm_rgb"],
        lm_obs_img=z["lm_obs_img"], lm_obs_feat=z["lm_obs_feat"],
        lm_obs_mask=z["lm_obs_mask"], lm_initial=z["lm_initial"])
    state.registered = [int(i) for i in z["registered"]]
    for i, T in zip(z["pose_ids"], z["pose_mats"]):
        state.poses[int(i)] = T
    for (i, j), m in zip(z["match_keys"], z["match_vals"]):
        state.matches[(int(i), int(j))] = m
    return state
