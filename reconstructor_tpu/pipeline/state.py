"""Mutable reconstruction state (host side).

The reference scatters state over unordered_maps inside the orchestrator
(SequentialReconstructor.h:205-229). Here the authoritative layout is a
set of flat, growable numpy arrays with a *grouped observation table*
(landmark-major, fixed max views per landmark) — the shape that feeds
directly into the batched device kernels (validity sweep, triangulation,
BA packing) without any host-side graph walking.

The incremental loop is inherently sequential (each PnP depends on the
last BA — SURVEY.md §7 risk list), so this state lives on host between
stages; everything expensive happens in fixed-shape device programs.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import numpy as np

MAX_VIEWS_PER_LANDMARK = 32


@dataclasses.dataclass
class ReconstructionState:
    num_images: int
    max_keypoints: int

    # frontend outputs (fixed shape, set once)
    xy: np.ndarray            # (N, K, 2) float32
    desc: np.ndarray          # (N, K, D) float32
    kp_mask: np.ndarray       # (N, K) bool
    colors: np.ndarray        # (N, K, 3) uint8
    shapes: np.ndarray        # (N, 2) int32 (h, w)
    intrinsics: np.ndarray    # (N, 6) float32

    # detector confidences (used by SuperGlue's keypoint encoder)
    kp_score: Optional[np.ndarray] = None   # (N, K) float32

    # matching outputs: matches[(i, j)] = (K,) int32 feat_i -> feat_j or -1
    matches: Dict = dataclasses.field(default_factory=dict)

    # incremental state
    poses: Dict[int, np.ndarray] = dataclasses.field(default_factory=dict)
    registered: List[int] = dataclasses.field(default_factory=list)  # order
    feat2lm: Optional[np.ndarray] = None     # (N, K) int32, -1 = free

    # landmarks (grouped observation table)
    lm_xyz: Optional[np.ndarray] = None      # (L, 3) float32
    lm_rgb: Optional[np.ndarray] = None      # (L, 3) uint8
    lm_obs_img: Optional[np.ndarray] = None  # (L, V) int32
    lm_obs_feat: Optional[np.ndarray] = None # (L, V) int32
    lm_obs_mask: Optional[np.ndarray] = None # (L, V) bool
    lm_initial: Optional[np.ndarray] = None  # (L,) bool

    def __post_init__(self):
        if self.feat2lm is None:
            self.feat2lm = np.full((self.num_images, self.max_keypoints), -1, np.int32)
        if self.lm_xyz is None:
            V = MAX_VIEWS_PER_LANDMARK
            self.lm_xyz = np.zeros((0, 3), np.float32)
            self.lm_rgb = np.zeros((0, 3), np.uint8)
            self.lm_obs_img = np.zeros((0, V), np.int32)
            self.lm_obs_feat = np.zeros((0, V), np.int32)
            self.lm_obs_mask = np.zeros((0, V), bool)
            self.lm_initial = np.zeros((0,), bool)

    # ---------------- landmarks ----------------------------------------
    @property
    def num_landmarks(self) -> int:
        return self.lm_xyz.shape[0]

    def add_landmarks(self, xyz: np.ndarray, rgb: np.ndarray,
                      obs_img: np.ndarray, obs_feat: np.ndarray,
                      obs_mask: np.ndarray, initial: bool = False) -> np.ndarray:
        """Append new landmarks; returns their ids. Updates feat2lm."""
        n = xyz.shape[0]
        ids = np.arange(self.num_landmarks, self.num_landmarks + n, dtype=np.int32)
        self.lm_xyz = np.concatenate([self.lm_xyz, xyz.astype(np.float32)])
        self.lm_rgb = np.concatenate([self.lm_rgb, rgb.astype(np.uint8)])
        self.lm_obs_img = np.concatenate([self.lm_obs_img, obs_img.astype(np.int32)])
        self.lm_obs_feat = np.concatenate([self.lm_obs_feat, obs_feat.astype(np.int32)])
        self.lm_obs_mask = np.concatenate([self.lm_obs_mask, obs_mask.astype(bool)])
        self.lm_initial = np.concatenate([self.lm_initial, np.full(n, initial)])
        for k in range(n):
            for v in range(obs_img.shape[1]):
                if obs_mask[k, v]:
                    self.feat2lm[obs_img[k, v], obs_feat[k, v]] = ids[k]
        return ids

    def add_observation(self, lm_id: int, img: int, feat: int) -> bool:
        """Attach one observation to an existing landmark (if capacity)."""
        row = self.lm_obs_mask[lm_id]
        free = np.where(~row)[0]
        if free.size == 0:
            return False
        v = free[0]
        self.lm_obs_img[lm_id, v] = img
        self.lm_obs_feat[lm_id, v] = feat
        self.lm_obs_mask[lm_id, v] = True
        self.feat2lm[img, feat] = lm_id
        return True

    def drop_observations(self, drop_mask: np.ndarray) -> None:
        """Remove observations flagged (L, V) True; resets feat2lm."""
        sel = drop_mask & self.lm_obs_mask
        imgs = self.lm_obs_img[sel]
        feats = self.lm_obs_feat[sel]
        self.feat2lm[imgs, feats] = -1
        self.lm_obs_mask &= ~drop_mask

    def remove_landmarks(self, keep: np.ndarray) -> None:
        """Compact landmark arrays to ``keep`` (bool mask), freeing the
        features of removed ones (removeOutlierLandmarks parity,
        SequentialReconstructor.cpp:956-976)."""
        gone = ~keep
        sel = self.lm_obs_mask & gone[:, None]
        self.feat2lm[self.lm_obs_img[sel], self.lm_obs_feat[sel]] = -1
        self.lm_xyz = self.lm_xyz[keep]
        self.lm_rgb = self.lm_rgb[keep]
        self.lm_obs_img = self.lm_obs_img[keep]
        self.lm_obs_feat = self.lm_obs_feat[keep]
        self.lm_obs_mask = self.lm_obs_mask[keep]
        self.lm_initial = self.lm_initial[keep]
        # reindex feat2lm
        new_ids = np.full(keep.shape[0], -1, np.int32)
        new_ids[keep] = np.arange(keep.sum(), dtype=np.int32)
        live = self.feat2lm >= 0
        self.feat2lm[live] = new_ids[self.feat2lm[live]]

    # ---------------- observations as flat arrays ----------------------
    def flat_observations(self):
        """(obs_lm, obs_img, obs_feat) int32 arrays of all live observations."""
        lm_ids = np.broadcast_to(
            np.arange(self.num_landmarks, dtype=np.int32)[:, None],
            self.lm_obs_mask.shape)
        sel = self.lm_obs_mask
        return lm_ids[sel], self.lm_obs_img[sel], self.lm_obs_feat[sel]

    def observation_uv(self, obs_img: np.ndarray, obs_feat: np.ndarray) -> np.ndarray:
        return self.xy[obs_img, obs_feat]

    def match_lookup(self, i: int, j: int) -> Optional[np.ndarray]:
        """feat_i -> feat_j mapping ((K,) int32 with -1), if the pair was
        matched. Mirrors stored i<j tables on the fly (the reference caches
        the inverse map instead, SequentialReconstructor.cpp:219-227)."""
        if (i, j) in self.matches:
            return self.matches[(i, j)]
        if (j, i) in self.matches:
            inv = self.matches[(j, i)]
            out = np.full(self.max_keypoints, -1, np.int32)
            src = np.where(inv >= 0)[0]
            out[inv[src]] = src
            return out
        return None
