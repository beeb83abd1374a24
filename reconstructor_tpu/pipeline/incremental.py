"""The incremental SfM driver — SequentialReconstructor re-designed for TPU.

Capability parity with the reference's pipeline
(SequentialReconstructor.cpp:978-1103): detect -> match (+epipolar gate) ->
initial pair -> triangulate -> [PnP register -> triangulate new ->
validity sweep -> global BA -> outlier removal] x (N-2) -> colored PLY.

Architecture (deliberately NOT the reference's): the incremental loop is
inherently sequential, so a thin host driver owns bookkeeping
(pipeline.state) while every stage's math runs as a fixed-shape batched
device program:

- detection: one vmapped program over the whole image batch
  (features.sift), replacing the racy OpenMP loop at
  SequentialReconstructor.cpp:58.
- matching: all pairs at once on the MXU (matching.knn), replacing the
  collapse(2) OpenMP loop at :202.
- epipolar gating: fixed-budget batched RANSAC vmapped over pair chunks,
  replacing cv::findFundamentalMat per pair (:251).
- registration: batched PnP hypotheses (geometry.pnp) replacing
  cv::solvePnPRansac (:591).
- triangulation + landmark validity: landmark-major grouped observation
  tables swept in one batched kernel (geometry.triangulation,
  _check_landmarks) replacing the per-landmark loops at :396-490/:869-954.
- BA: Schur-complement LM (ba.lm) replacing Ceres DENSE_SCHUR (:1065).

Shapes are padded to coarse buckets (powers of two / multiples of 8) so
the whole run compiles a handful of programs, then reuses them.
"""

from __future__ import annotations

import functools
import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from reconstructor_tpu.config import ReconstructorConfig
from reconstructor_tpu.features import sift
from reconstructor_tpu.geometry import camera as cam
from reconstructor_tpu.geometry import epipolar, np_ops, pnp, se3, triangulation
from reconstructor_tpu.io import images as io_images
from reconstructor_tpu.io import ply
from reconstructor_tpu.matching import knn, pairs as pairing
from reconstructor_tpu.ba import lm as ba_lm
from reconstructor_tpu.pipeline.state import ReconstructionState, MAX_VIEWS_PER_LANDMARK
from reconstructor_tpu.utils.timing import TimeLogger


def _next_pow2(n: int, lo: int = 64) -> int:
    v = lo
    while v < n:
        v *= 2
    return v


def _bucket(n: int, lo: int = 1024, factor: int = 4) -> int:
    """Coarse shape bucket (x4 growth): every distinct padded shape is a
    fresh XLA compile — through the remote-compile tunnel that costs tens
    of seconds — so the incremental loop quantizes its dynamic sizes to a
    handful of buckets instead of powers of two."""
    v = lo
    while v < n:
        v *= factor
    return v


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


# ----------------------------------------------------------------------
# jitted stage kernels
# ----------------------------------------------------------------------

from reconstructor_tpu.matching.gated import (  # noqa: E402
    filter_pairs_jit as _filter_chunk,
    match_and_gate_jit as _match_filter_chunk,
)


@functools.partial(jax.jit, static_argnames=("num_hypotheses", "thresh_px"))
def _initial_pose(key, uv1, uv2, intr1, intr2, mask,
                  num_hypotheses: int, thresh_px: float):
    pose, E, inl, cnt = epipolar.estimate_relative_pose(
        key, uv1, uv2, intr1, intr2, mask,
        thresh_px=thresh_px, num_hypotheses=num_hypotheses)
    return pose, inl, cnt


@functools.partial(jax.jit, static_argnames=("max_err", "min_angle"))
def _triangulate_validate(poses, intrs, uvs, mask, max_err: float, min_angle: float):
    return triangulation.triangulate_and_validate(poses, intrs, uvs, mask,
                                                  max_err, min_angle)


@functools.partial(jax.jit, static_argnames=("max_err", "min_angle"))
def _check_landmarks(xyz, poses_all, intr_all, obs_img, obs_feat, obs_mask,
                     xy_all, max_err: float, min_angle: float):
    """Batched landmark validity sweep (checkLandmarkValidity parity,
    SequentialReconstructor.cpp:869-954).

    xyz (L,3); poses_all (N,4,4); intr_all (N,6); obs_* (L,V); xy_all (N,K,2).
    Returns (valid (L,), new_obs_mask (L,V)) where failing observations
    (reproj > gate or negative depth) are dropped and a landmark survives
    iff >= 2 observations remain and at least one pair of them subtends
    more than the minimum angle (the reference's keep-if-any-pair-passes
    rule at :943-948 — deliberately weaker than the creation-time
    all-pairs rule).
    """
    uv = xy_all[obs_img, obs_feat]                 # (L,V,2)
    P = poses_all[obs_img]                         # (L,V,4,4)
    I = intr_all[obs_img]                          # (L,V,6)
    local = jnp.einsum("lvij,lj->lvi", P[..., :3, :3], xyz) + P[..., :3, 3]
    err = cam.reprojection_error_l1(I, local[..., None, :], uv[..., None, :])[..., 0]
    obs_ok = (err <= max_err) & (local[..., 2] > 0)
    new_mask = obs_mask & obs_ok

    centers = se3.camera_center(P)                 # (L,V,3)
    ang = triangulation.triangulation_angles_deg(xyz, centers)  # (L,V,V)
    V = obs_mask.shape[1]
    pair = new_mask[:, :, None] & new_mask[:, None, :] & ~jnp.eye(V, dtype=bool)[None]
    angle_passed = jnp.any(pair & (ang > min_angle), axis=(1, 2))
    valid = (jnp.sum(new_mask, axis=1) >= 2) & angle_passed
    return valid, new_mask


@functools.partial(jax.jit, static_argnames=("num_hypotheses", "thresh_px", "refine_iters"))
def _pnp(key, pts3d, uv, intr, mask, num_hypotheses: int, thresh_px: float,
         refine_iters: int):
    return pnp.solve_pnp_ransac(key, pts3d, uv, intr, mask,
                                thresh_px=thresh_px,
                                num_hypotheses=num_hypotheses,
                                refine_iters=refine_iters)


# ----------------------------------------------------------------------
# driver
# ----------------------------------------------------------------------

class IncrementalReconstructor:
    """End-to-end incremental reconstruction (reconstruct() parity)."""

    def __init__(self, config: Optional[ReconstructorConfig] = None,
                 verbose: bool = True, mesh=None):
        """``mesh``: optional jax.sharding.Mesh — when given, bundle
        adjustment runs the observation-sharded implicit-Schur PCG solver
        across it (ba.distributed) instead of the single-chip dense-Schur
        solve."""
        self.config = config or ReconstructorConfig()
        self.verbose = verbose
        self.mesh = mesh
        self.timer = TimeLogger()
        self._key = jax.random.PRNGKey(self.config.rng_seed)
        # Sticky shape caps: on this backend every distinct padded shape
        # is a fresh remote compile costing tens of seconds
        # (ENVIRONMENT_NOTES.md #3), so each program's pad grows
        # monotonically and is sized once from the dataset where possible.
        self._caps: Dict[str, int] = {}

    def _sticky_cap(self, name: str, need: int, lo: int = 1024) -> int:
        cap = self._caps.get(name, 0)
        if need > cap:
            cap = _bucket(need, lo=max(lo, cap * 4))
            self._caps[name] = cap
        return cap

    def _log(self, *args):
        if self.verbose:
            print(*args, flush=True)

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    # ------------------------------------------------------------------
    def reconstruct(self, img_folder: str, out_folder: Optional[str] = None,
                    save_intermediate: bool = False,
                    checkpoint_path: Optional[str] = None,
                    resume: bool = False) -> ReconstructionState:
        if resume and checkpoint_path and os.path.exists(checkpoint_path):
            from reconstructor_tpu.pipeline import checkpoint
            state = checkpoint.load(checkpoint_path)
            key = checkpoint.load_rng_key(checkpoint_path)
            if key is not None:
                self._key = key
            caps = checkpoint.load_meta(checkpoint_path).get("caps")
            if caps:
                self._caps.update(caps)
            self._log(f"resumed from {checkpoint_path}: "
                      f"{len(state.registered)} views registered")
        else:
            with self.timer.event("feature extraction"):
                state = self.detect_features(img_folder)
        return self.reconstruct_from_state(state, out_folder, save_intermediate,
                                           checkpoint_path=checkpoint_path)

    def _autosave(self, state: ReconstructionState,
                  checkpoint_path: Optional[str]) -> None:
        if checkpoint_path:
            from reconstructor_tpu.pipeline import checkpoint
            checkpoint.save(checkpoint_path, state, config=self.config,
                            rng_key=self._key, caps=self._caps)

    def reconstruct_from_state(self, state: ReconstructionState,
                               out_folder: Optional[str] = None,
                               save_intermediate: bool = False,
                               checkpoint_path: Optional[str] = None) -> ReconstructionState:
        """Run the full pipeline from a prepared feature state.

        Public entry for custom frontends (injected features/descriptors)
        and synthetic-scene evaluation — everything after detection:
        matching, initialization, the incremental register/BA loop, and
        output artifacts. A partially-registered state (from a resumed
        checkpoint) continues where it stopped; with ``checkpoint_path``
        the state autosaves after every registered view.
        """
        resuming = bool(state.registered)
        if out_folder and not resuming:
            # clear previous run artifacts (deleteDirectoryContents parity,
            # SequentialReconstructor.cpp:984-985) — only dirs we own
            import shutil
            for sub in ("clouds", "matches"):
                d = os.path.join(out_folder, sub)
                if os.path.isdir(d):
                    shutil.rmtree(d)
        if out_folder:
            os.makedirs(os.path.join(out_folder, "clouds"), exist_ok=True)

        if not state.matches:
            with self.timer.event("feature matching"):
                self.match_features(state)
        self._presize_caps(state)
        if not state.registered:
            # RANSAC's pose recovery is randomized; a rare unlucky key
            # stream can return a pose that passes the epipolar fit but
            # fails cheirality en masse (observed: 1436/1440 essential
            # inliers yet 0 triangulable landmarks). Detect the failed
            # initialization by its triangulation yield and redraw —
            # the key stream advances on every attempt.
            best = None       # (count, i1, i2, rel_pose) over failed draws
            for attempt in range(3):
                with self.timer.event("initial pair and pose estimation"):
                    i1, i2, rel_pose = self.choose_initial_pair(state)
                state.poses[i1] = np.eye(4, dtype=np.float32)
                state.poses[i2] = rel_pose
                state.registered = [i1, i2]
                self._log(f"initial pair: {i1}, {i2}")

                with self.timer.event("initial pair features triangulation"):
                    self.triangulate_initial_pair(state, i1, i2)
                n_pair_matches = int(
                    (state.matches[(i1, i2)] >= 0).sum())
                self._log(f"landmarks initial size: {state.num_landmarks} "
                          f"(of {n_pair_matches} matches)")
                # Absolute floor AND a relative yield gate: a cheirality-
                # degenerate pose can still triangulate a few dozen
                # points by luck (observed r5: 52 of ~200 matches, all
                # dropped by later validity sweeps -> empty map). A
                # correct pose on the best-matched pair converts well
                # over half its matches; a much lower yield usually means
                # the pose is wrong — redraw, but keep the best draw: a
                # genuinely low-parallax pair (legitimate small-baseline
                # capture) never clears the ratio, and the best-yield
                # pose is then the right initialization, not an error.
                if (state.num_landmarks >= self.config.min_2d3d_match_num
                        and state.num_landmarks * 4 >= n_pair_matches):
                    break
                if best is None or state.num_landmarks > best[0]:
                    best = (state.num_landmarks, i1, i2, rel_pose)
                self._log("initial triangulation starved — redrawing "
                          "the initial pose")
                state.poses = {}
                state.registered = []
                state.reset_landmarks()
            else:
                count, i1, i2, rel_pose = best
                if count < self.config.min_2d3d_match_num:
                    raise RuntimeError(
                        "initialization failed: 3 initial-pair pose "
                        f"redraws all starved triangulation (best draw "
                        f"{count} < {self.config.min_2d3d_match_num} "
                        "landmarks); the dataset's best pair may be "
                        "degenerate (pure rotation) or matching may be "
                        "broken")
                self._log(f"no draw cleared the yield ratio — keeping the "
                          f"best ({count} landmarks)")
                state.poses[i1] = np.eye(4, dtype=np.float32)
                state.poses[i2] = rel_pose
                state.registered = [i1, i2]
                self.triangulate_initial_pair(state, i1, i2)
            self._autosave(state, checkpoint_path)

        if out_folder and save_intermediate and not resuming:
            self._save(state, os.path.join(out_folder, "clouds/cloud_initial.ply"))

        retried = False
        for it in range(len(state.registered) - 2,
                        max(state.num_images - 2, len(state.registered) - 2)):
            with self.timer.event("adding new view"):
                added = self.add_next_view(state)
            if added is None:
                # One retry round: track completion after the last BA can
                # unlock 2d-3d support that did not exist when the
                # remaining candidates were last evaluated.
                if not retried:
                    retried = True
                    self.complete_tracks(state)
                    added = self.add_next_view(state)
                if added is None:
                    self._log("no registrable view left; stopping early")
                    break
            retried = False
            cfg = self.config
            use_local = (cfg.ba_local_window > 0
                         and len(state.registered) > max(cfg.ba_global_every,
                                                         cfg.ba_local_window + 2)
                         and (len(state.registered) % cfg.ba_global_every != 0))
            with self.timer.event("local bundle adjustment" if use_local
                                  else "global bundle adjustment"):
                inl_before = self.check_landmark_validity(state, drop=True)
                if out_folder and save_intermediate:
                    self._save(state, os.path.join(out_folder, f"clouds/cloud_before_{it}.ply"), inl_before)
                if use_local:
                    window = self._covisible_window(state, added,
                                                    cfg.ba_local_window)
                    self.bundle_adjust(state, local_cams=window)
                else:
                    self.bundle_adjust(state)
                inl_after = self.check_landmark_validity(state, drop=True)
                state.remove_landmarks(inl_after)
                self.complete_tracks(state)
                if out_folder and save_intermediate:
                    self._save(state, os.path.join(out_folder, f"clouds/cloud_after_{it}.ply"))
            self._log(f"registered img {added} | landmarks: {state.num_landmarks}")
            # Autosave cadence: a full-state npz at 100 views is >100 MB
            # compressed — writing one per view cost the stress run
            # seconds/view. Every Nth view bounds crash-replay to N views.
            if (it % max(self.config.checkpoint_every_views, 1) == 0
                    or len(state.registered) == state.num_images):
                self._autosave(state, checkpoint_path)

        for r in range(self.config.final_refinement_rounds):
            with self.timer.event("final refinement"):
                if self.config.final_retriangulate:
                    self.retriangulate(state)
                self.check_landmark_validity(state, drop=True)
                self.bundle_adjust(state)
                keep = self.check_landmark_validity(state, drop=True)
                state.remove_landmarks(keep)
                self.complete_tracks(state)
            self._log(f"final refinement {r + 1}: {state.num_landmarks} landmarks")

        self._autosave(state, checkpoint_path)
        if out_folder:
            self._save(state, os.path.join(out_folder, "clouds/cloud_final.ply"))
            self._write_report(state, out_folder)
        if self.verbose:
            self.timer.print_timings()
        return state

    def _write_report(self, state: ReconstructionState, out_folder: str) -> None:
        """Structured run report (observability beyond the reference's
        stdout lines + ms table, SURVEY.md §5): stage timings, counts and
        per-view registration summary as JSON next to the cloud."""
        import json
        report = {
            "num_images": state.num_images,
            "registered": state.registered,
            "num_landmarks": int(state.num_landmarks),
            "num_observations": int(state.lm_obs_mask.sum()),
            "stage_timings_ms": {k: round(v, 1)
                                 for k, v in self.timer.totals().items()},
            "config": {k: v for k, v in vars(self.config).items()
                       if isinstance(v, (int, float, str, bool, type(None)))},
        }
        with open(os.path.join(out_folder, "report.json"), "w") as f:
            json.dump(report, f, indent=2)

    # ------------------------------------------------------------------
    def _superpoint_params(self):
        if not hasattr(self, "_sp_params"):
            from reconstructor_tpu.features import superpoint as sp
            path = self.config.superpoint_weights
            if path and path.endswith(".npz"):
                # locally-trained weights (scripts/train_frontend.py)
                self._sp_params = sp.params_from_npz(path)
            elif path:
                import torch
                sd = torch.load(path, map_location="cpu")
                sd = {k: v.numpy() for k, v in sd.items()}
                self._sp_params = sp.params_from_torch_state_dict(sd)
            else:
                self._log("superpoint: no weights configured, random init")
                self._sp_params = sp.init_params(jax.random.PRNGKey(42))
        return self._sp_params

    def _superglue_params(self):
        if not hasattr(self, "_sg_params"):
            from reconstructor_tpu.matching import superglue as sg
            path = self.config.superglue_weights
            if path == "structured":
                # identity GNN + full Sinkhorn decode on raw descriptors
                # (no-checkpoint operating mode; see superglue.py)
                self._sg_params = sg.structured_identity_params()
            elif path and path.endswith(".npz"):
                # locally-trained compact GNN (scripts/train_superglue.py)
                self._sg_params = sg.params_from_npz(path)
            elif path:
                import torch
                sd = torch.load(path, map_location="cpu")
                sd = {k: v.numpy() for k, v in sd.items()}
                self._sg_params = sg.params_from_torch_state_dict(sd)
            else:
                self._log("superglue: no weights configured, random init")
                self._sg_params = sg.init_params(jax.random.PRNGKey(43))
        return self._sg_params

    def detect_features(self, img_folder: str) -> ReconstructionState:
        cfg = self.config
        imgs = io_images.load_folder(img_folder, cfg.img_max_size)
        if len(imgs) < 2:
            raise ValueError(f"need at least 2 images, found {len(imgs)} in {img_folder}")
        gray, shapes, rgb = io_images.pad_batch(imgs)
        if cfg.detector == "superpoint":
            from reconstructor_tpu.features import superpoint as sp
            feats = sp.detect_and_describe(
                self._superpoint_params(), jnp.asarray(gray), jnp.asarray(shapes),
                max_keypoints=cfg.max_keypoints,
                conf_thresh=cfg.superpoint_conf_thresh,
                nms_radius=cfg.superpoint_nms_radius,
                border=cfg.superpoint_border)
        elif cfg.detector == "orb":
            from reconstructor_tpu.features import orb
            feats = orb.detect_and_describe(
                jnp.asarray(gray), jnp.asarray(shapes),
                max_keypoints=cfg.max_keypoints,
                threshold=cfg.orb_fast_threshold)
        else:
            from reconstructor_tpu.utils import aot
            feats = aot.call(
                "sift_detect", sift.detect_and_describe,
                jnp.asarray(gray), jnp.asarray(shapes),
                max_keypoints=cfg.max_keypoints,
                num_scales=cfg.sift_num_scales,
                contrast_thresh=cfg.sift_contrast_thresh,
                edge_thresh=cfg.sift_edge_thresh,
                sigma0=cfg.sift_sigma0)
        xy = np.asarray(feats.xy)
        mask = np.asarray(feats.mask)
        # per-feature color pickup (SequentialReconstructor.cpp:99-106)
        n, k = mask.shape
        xi = np.clip(xy[..., 0].astype(np.int32), 0, rgb.shape[2] - 1)
        yi = np.clip(xy[..., 1].astype(np.int32), 0, rgb.shape[1] - 1)
        colors = rgb[np.arange(n)[:, None], yi, xi]

        intr = np.stack([
            np.asarray(cam.make_intrinsics(int(h), int(w), cfg.focal_px,
                                           cfg.focal_length_factor))
            for h, w in shapes])
        state = ReconstructionState(
            num_images=n, max_keypoints=k,
            xy=xy, desc=np.asarray(feats.desc), kp_mask=mask,
            colors=colors, shapes=shapes, intrinsics=intr,
            kp_score=np.asarray(feats.score))
        self._log(f"detected features: {mask.sum(1).tolist()}")
        return state

    # ------------------------------------------------------------------
    def _device_frontend(self, state: ReconstructionState):
        """Device copies of (desc, kp_mask, xy), cached on the state: the
        ~200 MB descriptor upload must not be paid once per matching call.

        The keypoint axis is trimmed to the dataset's real occupancy:
        detection emits top_k-sorted slots (scores descending, so valid
        keypoints are a prefix), and matching cost is quadratic in K, so
        carrying the full ``max_keypoints`` capacity when the densest
        image holds fewer is pure padding work. Kt is the max per-image
        count rounded up to 256 (keeps the fused kernel's row tiling and
        one compiled shape per dataset). Match tables produced at Kt are
        padded back to capacity on the host (match_lookup / checkpoint
        assume full-length tables); slot ids are unchanged by the trim."""
        cache = getattr(state, "_dev_frontend", None)
        if cache is None or cache[0] is not state.desc:
            counts = np.asarray(state.kp_mask).sum(axis=1)
            kt = int(counts.max()) if counts.size else 0
            kt = min(state.desc.shape[1], max(256, -(-kt // 256) * 256))
            cache = (state.desc, jnp.asarray(state.desc[:, :kt]),
                     jnp.asarray(state.kp_mask[:, :kt]),
                     jnp.asarray(state.xy[:, :kt]))
            state._dev_frontend = cache
        return cache[1], cache[2], cache[3]

    def select_pairs(self, state: ReconstructionState) -> np.ndarray:
        """Pair-selection stage (matchImages parity,
        SequentialReconstructor.cpp:1002 / ImageMatcher.cpp:6-24).

        ``exhaustive`` is the reference's FakeImgMatcher (all unordered
        pairs); ``retrieval`` prunes to each image's top-k most similar
        partners by global-descriptor affinity — the reference README's
        declared FAISS TODO (README:40)."""
        cfg = self.config
        if cfg.pair_selection == "retrieval":
            return pairing.retrieval_pairs(state.desc, state.kp_mask,
                                           top_k=cfg.retrieval_top_k)
        return pairing.exhaustive_pairs(state.num_images)

    def match_features(self, state: ReconstructionState, filter: bool = True) -> None:
        cfg = self.config
        pair_idx = self.select_pairs(state)
        if cfg.matcher == "superglue":
            midx, mmask = self._match_superglue(state, pair_idx)
        elif self.mesh is not None and not filter:
            from reconstructor_tpu.parallel import sharding
            midx, mmask = sharding.match_all_pairs_sharded(
                self.mesh, state.desc, state.kp_mask, pair_idx,
                ratio_thresh=cfg.ratio_thresh, cross_check=cfg.cross_check)
        else:
            # chunk the pair axis: the (B, K, K) distance tensor must fit
            # in HBM (300 x 4096^2 f32 would be 20 GB). On TPU the fused
            # Pallas kernel keeps the distance tile in VMEM entirely.
            # Matching and the epipolar gate run as ONE program per chunk
            # (filter=True) — sharded over the mesh when one is set (both
            # halves of the work shard: kNN and the F-gate) — with all
            # chunks dispatched asynchronously.
            from reconstructor_tpu.matching import pallas_knn
            platform = (self.mesh.devices.flat[0].platform
                        if self.mesh is not None
                        else jax.devices()[0].platform)
            desc_j, mask_j, xy_j = self._device_frontend(state)
            Kt = int(desc_j.shape[1])          # trimmed keypoint width
            use_fused = (cfg.knn_use_pallas and platform not in ("cpu",)
                         and pallas_knn.supported(Kt, state.desc.shape[2]))
            # bf16 descriptor matmuls are an MXU feature; on CPU they
            # emulate slowly and perturb results for nothing
            compute_dtype = (cfg.knn_compute_dtype
                             if platform not in ("cpu",) else "float32")
            match_fn = (pallas_knn.match_all_pairs_fused if use_fused
                        else knn.match_all_pairs)
            B = (cfg.match_chunk_pairs_fused if use_fused
                 else cfg.match_chunk_pairs)
            if self.mesh is not None:
                n_dev = int(self.mesh.devices.size)
                B = _round_up(B, n_dev)
            P = pair_idx.shape[0]
            futures = []
            for s0 in range(0, P, B):
                chunk = np.zeros((B, 2), np.int32)
                e = min(s0 + B, P)
                chunk[: e - s0] = pair_idx[s0:e]
                if filter:
                    keys = jax.random.split(self._next_key(), B)
                    if self.mesh is not None:
                        from reconstructor_tpu.parallel import sharding
                        fut = sharding.match_and_gate_sharded(
                            self.mesh, desc_j, mask_j, xy_j,
                            jnp.asarray(chunk), keys,
                            ratio_thresh=cfg.ratio_thresh,
                            cross_check=cfg.cross_check, use_fused=use_fused,
                            num_hypotheses=cfg.fundamental_num_hypotheses,
                            thresh_px=cfg.fundamental_thresh_px,
                            min_matches=cfg.min_matches_for_filter,
                            compute_dtype=compute_dtype)
                    else:
                        from reconstructor_tpu.utils import aot
                        fut = aot.call(
                            "match_gate", _match_filter_chunk,
                            keys, desc_j, mask_j, xy_j, jnp.asarray(chunk),
                            ratio_thresh=cfg.ratio_thresh,
                            cross_check=cfg.cross_check, use_fused=use_fused,
                            num_hypotheses=cfg.fundamental_num_hypotheses,
                            thresh_px=cfg.fundamental_thresh_px,
                            min_matches=cfg.min_matches_for_filter,
                            compute_dtype=compute_dtype)
                    futures.append((s0, e, fut))
                else:
                    futures.append((s0, e, match_fn(
                        desc_j, mask_j, jnp.asarray(chunk),
                        ratio_thresh=cfg.ratio_thresh,
                        cross_check=cfg.cross_check)))
            K = state.max_keypoints
            if filter:
                for s0, e, (mi, cnt) in futures:
                    mi = np.asarray(mi)
                    cnt = np.asarray(cnt)
                    for q in range(e - s0):
                        if cnt[q] > 0:
                            i, j = pair_idx[s0 + q]
                            full = np.full(K, -1, np.int32)
                            full[:Kt] = mi[q]
                            state.matches[(int(i), int(j))] = full
                return
            midx = np.full((P, K), -1, np.int32)
            mmask = np.zeros((P, K), bool)
            for s0, e, (mi, mm) in futures:
                midx[s0:e, :Kt] = np.asarray(mi)[: e - s0]
                mmask[s0:e, :Kt] = np.asarray(mm)[: e - s0]
        midx = np.asarray(midx)
        mmask = np.asarray(mmask)

        if filter:
            mmask = self._filter_matches(state, pair_idx, midx, mmask)

        for p, (i, j) in enumerate(pair_idx):
            m = np.where(mmask[p], midx[p], -1).astype(np.int32)
            if (m >= 0).sum() > 0:
                state.matches[(int(i), int(j))] = m

    def _match_superglue(self, state: ReconstructionState, pair_idx):
        """SuperGlue matching over all pairs (FeatureMatcherSuperglue
        parity: +-0.7 coord normalization, score > 0.5 gate).

        Pairs are processed in fixed-size vmapped chunks — one device
        program per chunk instead of the reference's per-pair TorchScript
        forward inside its OpenMP loop; chunks are dispatched
        asynchronously so host gather/scatter overlaps device compute."""
        from reconstructor_tpu.matching import superglue as sg
        cfg = self.config
        params = self._superglue_params()
        P = pair_idx.shape[0]
        K = state.max_keypoints
        midx = np.full((P, K), -1, np.int32)
        mmask = np.zeros((P, K), bool)
        desc = jnp.asarray(state.desc)
        xy = jnp.asarray(state.xy)
        score = jnp.asarray(state.kp_score)
        kmask = jnp.asarray(state.kp_mask)
        shapes = jnp.asarray(state.shapes)
        platform = (self.mesh.devices.flat[0].platform
                    if self.mesh is not None else jax.devices()[0].platform)
        use_pallas = (cfg.superglue_use_pallas_sinkhorn
                      and platform not in ("cpu",))
        B = cfg.superglue_chunk_pairs
        if self.mesh is not None:
            # pair axis shards over the mesh (VERDICT r3 #6) — same data
            # parallelism as the kNN path; chunks pad to the mesh size
            B = _round_up(B, int(self.mesh.devices.size))
        futures = []
        for s0 in range(0, P, B):
            e = min(s0 + B, P)
            chunk = np.zeros((B, 2), np.int32)
            chunk[: e - s0] = pair_idx[s0:e]
            if self.mesh is not None:
                from reconstructor_tpu.parallel import sharding
                futures.append((s0, e, sharding.match_superglue_sharded(
                    self.mesh, params, desc, xy, score, kmask, shapes,
                    jnp.asarray(chunk),
                    sinkhorn_iters=cfg.superglue_sinkhorn_iters,
                    score_thresh=cfg.superglue_score_thresh,
                    use_pallas=use_pallas)))
            else:
                futures.append((s0, e, sg.match_pairs_batched(
                    params, desc, xy, score, kmask, shapes,
                    jnp.asarray(chunk),
                    sinkhorn_iters=cfg.superglue_sinkhorn_iters,
                    score_thresh=cfg.superglue_score_thresh,
                    use_pallas=use_pallas)))
        for s0, e, (idx, ok, _) in futures:
            midx[s0:e] = np.asarray(idx)[: e - s0]
            mmask[s0:e] = np.asarray(ok)[: e - s0]
        return midx, mmask

    def _filter_matches(self, state, pair_idx, midx, mmask) -> np.ndarray:
        """Epipolar gate on every pair, in fixed-size chunks.

        All chunk calls are dispatched asynchronously before any result is
        collected — device work for chunk k+1 overlaps the host-side
        gather/scatter for chunk k.
        """
        cfg = self.config
        P = pair_idx.shape[0]
        K = state.max_keypoints
        B = cfg.filter_chunk_pairs
        out = mmask.copy()
        raw_counts = mmask.sum(1)
        xy = state.xy

        # gather all pair coordinate blocks up front (vectorized)
        i_all = pair_idx[:, 0]
        j_all = pair_idx[:, 1]
        p1_all = xy[i_all]                                        # (P, K, 2)
        p2_all = xy[j_all[:, None], np.clip(midx, 0, K - 1)]      # (P, K, 2)

        futures = []
        for s in range(0, P, B):
            e = min(s + B, P)
            p1 = np.zeros((B, K, 2), np.float32)
            p2 = np.zeros((B, K, 2), np.float32)
            m = np.zeros((B, K), bool)
            p1[: e - s] = p1_all[s:e]
            p2[: e - s] = p2_all[s:e]
            m[: e - s] = mmask[s:e]
            keys = jax.random.split(self._next_key(), B)
            futures.append((s, e, _filter_chunk(
                keys, jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(m),
                num_hypotheses=cfg.fundamental_num_hypotheses,
                thresh_px=cfg.fundamental_thresh_px)))
        for s, e, fut in futures:
            inl = np.asarray(fut)
            for bi, p in enumerate(range(s, e)):
                # need >= 7 matches for F estimation; keep raw otherwise
                # (SequentialReconstructor.cpp:237)
                if raw_counts[p] >= cfg.min_matches_for_filter:
                    out[p] = inl[bi] & mmask[p]
        return out

    def _presize_caps(self, state: ReconstructionState) -> None:
        """Pre-size the sticky shape caps from match statistics, so the
        landmark/observation programs compile once instead of re-compiling
        at every growth tier. Every observation is a distinct matched
        (img, feat), so the count of features participating in any match
        upper-bounds the observation table (rescue-path attachments can
        exceed it; the sticky caps then grow once)."""
        if "check_L" in self._caps or not state.matches:
            return
        matched = np.zeros((state.num_images, state.max_keypoints), bool)
        for (i, j), m in state.matches.items():
            src = m >= 0
            matched[i] |= src
            matched[j][m[src]] = True
        obs_est = max(int(matched.sum()), 1)
        lm_est = max(obs_est // 3, 1)
        # BA shapes are sized per call by ba_lm's compaction buckets now;
        # only the landmark-table programs still use sticky caps.
        for name in ("check_L", "rescue_L"):
            self._caps[name] = _bucket(lm_est, lo=2048)

    # ------------------------------------------------------------------
    def choose_initial_pair(self, state: ReconstructionState) -> Tuple[int, int, np.ndarray]:
        """Highest-match-count pair -> essential -> cheirality pose
        (chooseInitialPair parity, SequentialReconstructor.cpp:325-375)."""
        cfg = self.config
        self._presize_caps(state)
        best = max(state.matches.items(), key=lambda kv: (kv[1] >= 0).sum())
        (i1, i2), m = best
        sel = np.where(m >= 0)[0]
        K = state.max_keypoints
        uv1 = np.zeros((K, 2), np.float32)
        uv2 = np.zeros((K, 2), np.float32)
        mask = np.zeros(K, bool)
        uv1[: sel.size] = state.xy[i1, sel]
        uv2[: sel.size] = state.xy[i2, m[sel]]
        mask[: sel.size] = True
        pose, inl, cnt = _initial_pose(
            self._next_key(), jnp.asarray(uv1), jnp.asarray(uv2),
            jnp.asarray(state.intrinsics[i1]), jnp.asarray(state.intrinsics[i2]),
            jnp.asarray(mask),
            num_hypotheses=cfg.ransac_num_hypotheses,
            thresh_px=cfg.essential_thresh_px)
        self._log(f"essential inliers: {int(cnt)} / {sel.size}")
        return int(i1), int(i2), np.asarray(pose)

    # ------------------------------------------------------------------
    def _batch_triangulate(self, state: ReconstructionState,
                           obs_img: np.ndarray, obs_feat: np.ndarray,
                           obs_mask: np.ndarray):
        """Triangulate+validate a batch of candidate landmarks given their
        (n, V) observation tables. Returns (xyz, valid)."""
        cfg = self.config
        n, V = obs_img.shape
        # n <= max_keypoints at every call site (initial-pair matches and
        # per-view free features are both per-image feature subsets), so
        # one fixed pad => one compiled program for the whole run.
        n_pad = _round_up(max(state.max_keypoints, n), 256)
        oi = np.zeros((n_pad, V), np.int32)
        of = np.zeros((n_pad, V), np.int32)
        om = np.zeros((n_pad, V), bool)
        oi[:n] = obs_img; of[:n] = obs_feat; om[:n] = obs_mask

        poses_all = np.stack([state.poses.get(i, np.eye(4, dtype=np.float32))
                              for i in range(state.num_images)])
        P = poses_all[oi]
        I = state.intrinsics[oi]
        U = state.xy[oi, of]
        xyz, valid = _triangulate_validate(
            jnp.asarray(P), jnp.asarray(I), jnp.asarray(U), jnp.asarray(om),
            max_err=cfg.max_projection_error,
            min_angle=cfg.min_triangulation_angle)
        return np.asarray(xyz)[:n], np.asarray(valid)[:n]

    def triangulate_initial_pair(self, state: ReconstructionState, i1: int, i2: int) -> None:
        m = state.match_lookup(i1, i2)
        f1 = np.where(m >= 0)[0]
        f2 = m[f1]
        n = f1.size
        V = MAX_VIEWS_PER_LANDMARK
        obs_img = np.zeros((n, V), np.int32)
        obs_feat = np.zeros((n, V), np.int32)
        obs_mask = np.zeros((n, V), bool)
        obs_img[:, 0] = i1; obs_feat[:, 0] = f1
        obs_img[:, 1] = i2; obs_feat[:, 1] = f2
        obs_mask[:, :2] = True
        xyz, valid = self._batch_triangulate(state, obs_img, obs_feat, obs_mask)
        rgb = state.colors[i1, f1]
        state.add_landmarks(xyz[valid], rgb[valid], obs_img[valid],
                            obs_feat[valid], obs_mask[valid], initial=True)

    # ------------------------------------------------------------------
    def calc_2d3d_matches(self, state: ReconstructionState,
                          candidates: List[int]) -> Dict[int, Tuple[np.ndarray, np.ndarray]]:
        """2d-3d correspondence mining (calc2d3dMatches parity,
        SequentialReconstructor.cpp:643-695), vectorized per candidate:
        landmarks seen in a registered image whose features match the
        candidate's unassigned features."""
        out = {}
        empty = (np.zeros(0, np.int32), np.zeros(0, np.int32))
        F2L = state.feat2lm
        reg = list(state.registered)
        for c in candidates:
            # candidate-major match tables, stacked: one (R, K) block per
            # candidate instead of a registered-images python loop with
            # per-image filtering (the r2 O(C*R) host hotspot at 100
            # views, VERDICT r2 weak #7).
            tabs, rids = [], []
            for r in reg:
                m = state.match_lookup(c, r)
                if m is not None:
                    tabs.append(m)
                    rids.append(r)
            if not tabs:
                out[c] = empty
                continue
            M = np.stack(tabs)                                     # (R, K)
            lmtab = F2L[np.asarray(rids)[:, None], np.maximum(M, 0)]
            valid = (M >= 0) & (lmtab >= 0) & (F2L[c] == -1)[None, :]
            has = valid.any(axis=0)
            fc = np.nonzero(has)[0]
            if fc.size == 0:
                out[c] = empty
                continue
            # One landmark per candidate feature (first registered image
            # wins): the reference keeps duplicates (cpp:683-684) and
            # leans on 10k adaptive RANSAC iterations to survive them,
            # but in a fixed hypothesis budget duplicate features inside
            # a minimal sample produce degenerate DLTs and starve the
            # sampler. Starved views now fall through to the
            # landmark-descriptor rescue pass instead.
            first_r = valid[:, fc].argmax(axis=0)
            lm = lmtab[first_r, fc]
            out[c] = (lm.astype(np.int32), fc.astype(np.int32))
        return out

    def rank_next_images(self, state: ReconstructionState,
                         matches_2d3d: Dict[int, Tuple[np.ndarray, np.ndarray]]) -> List[int]:
        """Next-view ranking (rankNextImages parity,
        SequentialReconstructor.cpp:697-759)."""
        cfg = self.config
        scores = {}
        for c, (lm_ids, feat_ids) in matches_2d3d.items():
            if cfg.ranking_mode == "total":
                scores[c] = lm_ids.size
            else:
                h, w = state.shapes[c]
                g = cfg.ranking_grid
                xy = state.xy[c, feat_ids]
                cx = np.clip((g * xy[:, 0] / float(w)).astype(int), 0, g - 1)
                cy = np.clip((g * xy[:, 1] / float(h)).astype(int), 0, g - 1)
                scores[c] = np.unique(cy * g + cx).size
        ranked = sorted(scores, key=lambda c: -scores[c])
        passing = [c for c in ranked if scores[c] > cfg.min_2d3d_match_num]
        if not passing and ranked:
            # the reference would crash on an empty list (cpp:793); degrade
            # gracefully to the best-scoring candidate instead
            passing = ranked[:1]
        return passing

    def register_image_pnp(self, state: ReconstructionState, img: int,
                           lm_ids: np.ndarray, feat_ids: np.ndarray):
        """PnP registration (registerImagePnP parity,
        SequentialReconstructor.cpp:559-638). Returns (pose, inlier sel)."""
        cfg = self.config
        n = lm_ids.size
        cap = self._sticky_cap("pnp", max(n, state.max_keypoints), lo=1024)
        pts3d = np.zeros((cap, 3), np.float32)
        uv = np.zeros((cap, 2), np.float32)
        mask = np.zeros(cap, bool)
        pts3d[:n] = state.lm_xyz[lm_ids]
        uv[:n] = state.xy[img, feat_ids]
        mask[:n] = True
        pose, inl, cnt = _pnp(
            self._next_key(), jnp.asarray(pts3d), jnp.asarray(uv),
            jnp.asarray(state.intrinsics[img]), jnp.asarray(mask),
            num_hypotheses=cfg.pnp_num_hypotheses,
            thresh_px=cfg.max_projection_error,
            refine_iters=cfg.pnp_refine_iters)
        inl = np.asarray(inl)[:n]
        self._log(f"imgIdx: {img} numInliers: {int(inl.sum())} totalMatches: {n}")
        return np.asarray(pose), inl

    def triangulate_matched_landmarks(self, state: ReconstructionState, img: int,
                                      lm_ids: np.ndarray, feat_ids: np.ndarray) -> None:
        """Attach observations + create new landmarks
        (triangulateMatchedLandmarks parity, cpp:492-557)."""
        cfg = self.config
        pose = state.poses[img]
        intr = state.intrinsics[img]

        # 1. attach 2d-3d inlier matches as new observations, gated on
        #    positive depth, L1 reprojection and unassigned feature (cpp:506)
        if lm_ids.size:
            pts = state.lm_xyz[lm_ids]
            local = pts @ pose[:3, :3].T + pose[:3, 3]
            uv = state.xy[img, feat_ids]
            err = np_ops.reprojection_error_l1(intr, local, uv)
            ok = (local[:, 2] > 0) & (err < cfg.max_projection_error) \
                & (state.feat2lm[img, feat_ids] == -1)
            state.add_observations(lm_ids[ok],
                                   np.full(int(ok.sum()), img, np.int32),
                                   feat_ids[ok])

        # 2. unassigned features: multi-view triangulation against ALL
        #    registered partners whose matched features are also
        #    unassigned. (The reference stops at the first partner,
        #    cpp:547-549 — using every available view both tightens the
        #    DLT and lets the angle gate pass sooner.)
        free = np.where((state.feat2lm[img] == -1) & state.kp_mask[img])[0]
        V = MAX_VIEWS_PER_LANDMARK
        n = free.size
        if n == 0:
            return
        obs_img = np.zeros((n, V), np.int32)
        obs_feat = np.zeros((n, V), np.int32)
        obs_mask = np.zeros((n, V), bool)
        obs_img[:, 0] = img
        obs_feat[:, 0] = free
        obs_mask[:, 0] = True
        slot = np.ones(n, np.int32)
        for r in state.registered:
            if r == img:
                continue
            m = state.match_lookup(img, r)
            if m is None:
                continue
            partner = m[free]
            ok = partner >= 0
            ok[ok] &= state.feat2lm[r, partner[ok]] == -1
            ok &= slot < V
            rows = np.where(ok)[0]
            obs_img[rows, slot[rows]] = r
            obs_feat[rows, slot[rows]] = partner[rows]
            obs_mask[rows, slot[rows]] = True
            slot[rows] += 1
        multi = slot >= 2
        if not multi.any():
            return
        obs_img, obs_feat, obs_mask = obs_img[multi], obs_feat[multi], obs_mask[multi]
        xyz, valid = self._batch_triangulate(state, obs_img, obs_feat, obs_mask)
        rgb = state.colors[obs_img[:, 0], obs_feat[:, 0]]
        state.add_landmarks(xyz[valid], rgb[valid], obs_img[valid],
                            obs_feat[valid], obs_mask[valid])

    def complete_tracks(self, state: ReconstructionState) -> int:
        """Attach missing observations of existing landmarks across all
        registered views (COLMAP-style track completion; no reference
        equivalent — the reference only ever links the newly added view).
        Returns the number of observations added."""
        cfg = self.config
        added = 0
        matches_2d3d = self.calc_2d3d_matches(state, list(state.registered))
        for r, (lm_ids, feat_ids) in matches_2d3d.items():
            if lm_ids.size == 0:
                continue
            pose = state.poses[r]
            pts = state.lm_xyz[lm_ids]
            local = pts @ pose[:3, :3].T + pose[:3, 3]
            uv = state.xy[r, feat_ids]
            err = np_ops.reprojection_error_l1(state.intrinsics[r], local, uv)
            ok = (local[:, 2] > 0) & (err < cfg.max_projection_error) \
                & (state.feat2lm[r, feat_ids] == -1)
            added += state.add_observations(
                lm_ids[ok], np.full(int(ok.sum()), r, np.int32), feat_ids[ok])
        return added

    def match_features_to_landmarks(self, state: ReconstructionState,
                                    img: int):
        """Direct 2D-3D mining: match the candidate's descriptors against
        landmark descriptors (each landmark represented by its first
        observation's descriptor).

        No reference equivalent — its 2d-3d matches can only flow through
        pairwise match chains (cpp:643-695), which starves views whose
        pairwise matches were consumed by earlier registrations. One MXU
        matmul against the whole map recovers them.
        """
        cfg = self.config
        lm_obs0_img = state.lm_obs_img[:, 0]
        lm_obs0_feat = state.lm_obs_feat[:, 0]
        lm_desc = state.desc[lm_obs0_img, lm_obs0_feat]        # (L, D)
        L = lm_desc.shape[0]
        L_pad = self._sticky_cap("rescue_L", max(L, 1), lo=2048)
        lm_desc_p = np.zeros((L_pad, lm_desc.shape[1]), np.float32)
        lm_desc_p[:L] = lm_desc
        lm_mask = np.zeros(L_pad, bool)
        lm_mask[:L] = state.lm_obs_mask[:, 0]
        midx, mmask = knn.match_pair_jit(
            jnp.asarray(state.desc[img]), jnp.asarray(lm_desc_p),
            jnp.asarray(state.kp_mask[img]), jnp.asarray(lm_mask),
            ratio_thresh=0.9, cross_check=True)
        midx = np.asarray(midx)
        sel = np.where(np.asarray(mmask) & (state.feat2lm[img] == -1))[0]
        return midx[sel].astype(np.int32), sel.astype(np.int32)

    def _try_register(self, state: ReconstructionState, img: int,
                      lm_ids: np.ndarray, feat_ids: np.ndarray) -> bool:
        if lm_ids.size < 6:
            return False
        pose, inl = self.register_image_pnp(state, img, lm_ids, feat_ids)
        # Reject registrations the pose evidence cannot support (the
        # reference registers unconditionally, cpp:797-801, which lets
        # 1-inlier PnP poses poison the map; requiring a minimum inlier
        # support and falling through to the next-ranked candidate is
        # strictly higher-quality behavior).
        if int(inl.sum()) < self.config.pnp_min_inliers:
            self._log(f"rejecting img {img}: only {int(inl.sum())} PnP inliers")
            return False
        state.poses[img] = pose
        self.triangulate_matched_landmarks(state, img, lm_ids[inl], feat_ids[inl])
        state.registered.append(img)
        return True

    def add_next_view(self, state: ReconstructionState) -> Optional[int]:
        """addNextView parity (cpp:761-813) + landmark-descriptor rescue."""
        candidates = [i for i in range(state.num_images) if i not in state.poses]
        if not candidates:
            return None
        matches_2d3d = self.calc_2d3d_matches(state, candidates)
        ranked = self.rank_next_images(state, matches_2d3d)
        for img in ranked:
            lm_ids, feat_ids = matches_2d3d[img]
            if self._try_register(state, img, lm_ids, feat_ids):
                return img
        # Rescue pass: every remaining candidate gets one shot at direct
        # feature-to-landmark matching, best-connected first.
        order = sorted(candidates, key=lambda c: -matches_2d3d[c][0].size)
        for img in order:
            if img in state.poses:
                continue
            lm_ids, feat_ids = self.match_features_to_landmarks(state, img)
            self._log(f"rescue 2d-3d for img {img}: {lm_ids.size} direct matches")
            if self._try_register(state, img, lm_ids, feat_ids):
                return img
        return None

    def retriangulate(self, state: ReconstructionState) -> int:
        """Re-solve every landmark's position by multi-view DLT from the
        CURRENT camera poses (one batched program over the whole map).

        Landmarks triangulated early in the run carry the error of the
        poses as they were at creation time; BA can only polish them
        within its basin. Re-triangulating against the final poses —
        standard COLMAP practice between refinement rounds, no reference
        equivalent — resets each point to the geometric optimum of its
        full track. Positions are updated only where the re-solve passes
        the reprojection + angle gates; the rest keep their BA estimate.
        Returns the number of landmarks updated.
        """
        L = state.num_landmarks
        if L == 0:
            return 0
        cfg = self.config
        L_pad = self._sticky_cap("check_L", L, lo=2048)
        V = MAX_VIEWS_PER_LANDMARK
        oi = np.zeros((L_pad, V), np.int32)
        of = np.zeros((L_pad, V), np.int32)
        om = np.zeros((L_pad, V), bool)
        oi[:L] = state.lm_obs_img
        of[:L] = state.lm_obs_feat
        om[:L] = state.lm_obs_mask
        poses_all = np.stack([state.poses.get(i, np.eye(4, dtype=np.float32))
                              for i in range(state.num_images)])
        xyz, valid = _triangulate_validate(
            jnp.asarray(poses_all[oi]), jnp.asarray(state.intrinsics[oi]),
            jnp.asarray(state.xy[oi, of]), jnp.asarray(om),
            max_err=cfg.max_projection_error,
            min_angle=cfg.min_triangulation_angle)
        xyz = np.asarray(xyz)[:L]
        valid = np.asarray(valid)[:L]
        state.lm_xyz[valid] = xyz[valid]
        return int(valid.sum())

    # ------------------------------------------------------------------
    def check_landmark_validity(self, state: ReconstructionState,
                                drop: bool = False) -> np.ndarray:
        """Batched validity sweep; optionally drops failing observations
        in place (the reference mutates during the check, cpp:896)."""
        cfg = self.config
        L = state.num_landmarks
        if L == 0:
            return np.zeros(0, bool)
        L_pad = self._sticky_cap("check_L", L, lo=2048)
        V = MAX_VIEWS_PER_LANDMARK
        xyz = np.zeros((L_pad, 3), np.float32)
        oi = np.zeros((L_pad, V), np.int32)
        of = np.zeros((L_pad, V), np.int32)
        om = np.zeros((L_pad, V), bool)
        xyz[:L] = state.lm_xyz
        oi[:L] = state.lm_obs_img; of[:L] = state.lm_obs_feat; om[:L] = state.lm_obs_mask
        poses_all = np.stack([state.poses.get(i, np.eye(4, dtype=np.float32))
                              for i in range(state.num_images)])
        valid, new_mask = _check_landmarks(
            jnp.asarray(xyz), jnp.asarray(poses_all), jnp.asarray(state.intrinsics),
            jnp.asarray(oi), jnp.asarray(of), jnp.asarray(om),
            jnp.asarray(state.xy),
            max_err=cfg.max_projection_error,
            min_angle=cfg.min_triangulation_angle)
        valid = np.asarray(valid)[:L]
        new_mask = np.asarray(new_mask)[:L]
        if drop:
            state.drop_observations(state.lm_obs_mask & ~new_mask)
        return valid

    # ------------------------------------------------------------------
    def _covisible_window(self, state: ReconstructionState, img: int,
                          window: int) -> List[int]:
        """``img`` plus its (window-1) most covisible registered cameras,
        ranked by shared-landmark count."""
        rows = ((state.lm_obs_img == img) & state.lm_obs_mask).any(axis=1)
        co_img = state.lm_obs_img[rows]
        co_msk = state.lm_obs_mask[rows]
        counts = np.bincount(co_img[co_msk], minlength=state.num_images)
        counts[img] = 0
        reg = np.zeros(state.num_images, bool)
        reg[state.registered] = True
        counts[~reg] = 0
        top = np.argsort(-counts)[:max(window - 1, 0)]
        return [img] + [int(t) for t in top if counts[t] > 0]

    def bundle_adjust(self, state: ReconstructionState,
                      local_cams: Optional[List[int]] = None) -> None:
        """Bundle adjustment (BundleAdjuster::adjust parity).

        Global by default: all registered cameras and landmarks. With
        ``local_cams`` (a subset of registered image ids) this becomes a
        COLMAP-style *local* BA: only landmarks observed by the window
        participate, only window cameras move, and the cameras outside
        the window that co-observe those landmarks enter as fixed
        anchors (which also pins the gauge). The reference has no local
        mode — every view pays a full global solve, the dominant cost
        beyond ~25 views.
        """
        cfg = self.config
        obs_lm, obs_img, obs_feat = state.flat_observations()
        # only observations from registered cameras participate
        reg_mask = np.isin(obs_img, state.registered)
        obs_lm, obs_img, obs_feat = obs_lm[reg_mask], obs_img[reg_mask], obs_feat[reg_mask]

        lm_sel = None
        if local_cams is None:
            order = list(state.registered)
            L = state.num_landmarks
            points_src = state.lm_xyz
        else:
            local_set = set(int(c) for c in local_cams)
            # landmarks observed by >=1 window camera, with ALL their
            # registered observations (fixed co-observers anchor them)
            lm_sel = np.unique(obs_lm[np.isin(obs_img, list(local_set))])
            keep = np.isin(obs_lm, lm_sel)
            obs_lm, obs_img, obs_feat = obs_lm[keep], obs_img[keep], obs_feat[keep]
            remap = np.full(state.num_landmarks, -1, np.int64)
            remap[lm_sel] = np.arange(lm_sel.size)
            obs_lm = remap[obs_lm]
            # fixed anchors first, window cameras after (order is free —
            # the gauge comes from the fixed anchors, not from index 0)
            participating = set(np.unique(obs_img).tolist()) | local_set
            order = sorted(participating - local_set) + sorted(local_set)
            L = lm_sel.size
            points_src = state.lm_xyz[lm_sel]

        C = len(order)
        # The problem is built COMPACT (C = participating cameras only,
        # pow2 buckets on the live L/O sizes) so ba_lm.solve runs it
        # as-is (compact=False) with no device->host->device roundtrip:
        # r4 profiling showed the per-view local BA paying more in
        # tunnel transfers + re-compaction than in the solve itself.
        # Buckets stay pow2 so a growing run compiles log-many shapes.
        C_pad = max(16, _round_up(C, 16))
        g2l = {g: l for l, g in enumerate(order)}

        order_arr = np.asarray(order, np.int64)
        poses_arr = np.stack([state.poses[g] for g in order])
        cam_params = np.zeros((C_pad, 12), np.float32)
        cam_params[:C, :3] = np_ops.rotation_to_angle_axis(poses_arr[:, :3, :3])
        cam_params[:C, 3:6] = poses_arr[:, :3, 3]
        cam_params[:C, 6:] = state.intrinsics[order_arr]

        O = obs_lm.size
        O_pad = ba_lm._bucket(max(O, 1), 1)
        L_pad = ba_lm._bucket(max(L, 1), 1)

        obs_cam_l = np.zeros(O_pad, np.int32)
        obs_pt = np.zeros(O_pad, np.int32)
        obs_uv = np.zeros((O_pad, 2), np.float32)
        obs_mask = np.zeros(O_pad, bool)
        obs_cam_l[:O] = [g2l[g] for g in obs_img]
        obs_pt[:O] = obs_lm
        obs_uv[:O] = state.observation_uv(obs_img, obs_feat)
        obs_mask[:O] = True

        points = np.zeros((L_pad, 3), np.float32)
        points[:L] = points_src

        cam_free = np.zeros((C_pad, 12), np.float32)
        if local_cams is None:
            cam_free[:C] = np.asarray(ba_lm.make_cam_free_mask(
                C, cfg.ba_intrinsics_free_min_cams))
        else:
            n_fixed = C - len(local_set)
            if n_fixed == 0:
                # no anchors — fall back to the reference gauge policy
                cam_free[:C] = np.asarray(ba_lm.make_cam_free_mask(
                    C, cfg.ba_intrinsics_free_min_cams))
            else:
                cam_free[n_fixed:C, :6] = 1.0
                # intrinsics policy follows the FULL registered count
                if len(state.registered) >= cfg.ba_intrinsics_free_min_cams:
                    cam_free[n_fixed:C, 6:8] = 1.0   # focal free
                    cam_free[n_fixed:C, 10:12] = 1.0  # distortion free

        prob = ba_lm.BAProblem(
            cam_params=jnp.asarray(cam_params),
            points=jnp.asarray(points),
            obs_cam=jnp.asarray(obs_cam_l),
            obs_pt=jnp.asarray(obs_pt),
            obs_uv=jnp.asarray(obs_uv),
            obs_mask=jnp.asarray(obs_mask),
            cam_free=jnp.asarray(cam_free))
        if local_cams is None:
            self._last_ba_problem = prob
        if local_cams is not None:
            # local windows only need to absorb the new view; the periodic
            # global rounds + final refinement do the real polishing
            # (COLMAP's local BA budget is similarly small)
            max_iters = cfg.ba_local_max_iters
        else:
            max_iters = (cfg.ba_max_iters_small if C < 10
                         else cfg.ba_max_iters_large)
        common = dict(max_iters=max_iters,
                      init_lambda=cfg.ba_init_lambda,
                      lambda_up=cfg.ba_lambda_up,
                      lambda_down=cfg.ba_lambda_down,
                      ftol=cfg.ba_ftol,
                      focal_upper_bound=cfg.ba_focal_upper_bound,
                      huber_delta=cfg.ba_huber_delta,
                      damping=cfg.ba_damping)
        # The dense-W Schur formulation materializes a (C*12, L*3)
        # coupling matrix — ideal MXU work in the DENSE_SCHUR regime
        # (tens of cameras) but HBM-infeasible at 100+ cameras with big
        # maps. Beyond the budget, the implicit-Schur PCG solver (no
        # materialized W; matvecs as segment-sums) takes over.
        dense_w_elems = C_pad * 12 * points.shape[0] * 3
        use_pcg = (cfg.ba_solver == "pcg"
                   or dense_w_elems > cfg.ba_dense_w_max_elems)
        if self.mesh is not None:
            from reconstructor_tpu.ba import distributed
            result = distributed.solve_distributed(self.mesh, prob, **common)
        elif use_pcg:
            from reconstructor_tpu.ba import distributed
            result = distributed.solve_pcg(prob, **common)
        else:
            # the problem was built compact above — skip solve()'s own
            # host-side compaction (it would round-trip every array
            # through the tunnel again) and hand it the host copies of
            # the observation tables for the layout build
            result = ba_lm.solve(prob, compact=False,
                                 host_obs=(obs_pt, obs_cam_l, obs_mask),
                                 **common)
        self._log(f"BA: cost {float(result.cost_initial):.1f} -> "
                  f"{float(result.cost_final):.1f} in {int(result.iterations)} iters")

        new_cams = np.asarray(result.cam_params)
        R_all = np_ops.angle_axis_to_rotation(new_cams[:C, :3])
        for g, l in g2l.items():
            if local_cams is not None and g not in local_set:
                continue  # fixed anchor — unchanged by construction
            T = np.eye(4, dtype=np.float32)
            T[:3, :3] = R_all[l]
            T[:3, 3] = new_cams[l, 3:6]
            state.poses[g] = T
            state.intrinsics[g] = new_cams[l, 6:]
        if lm_sel is None:
            state.lm_xyz[:] = np.asarray(result.points)[:L]
        else:
            state.lm_xyz[lm_sel] = np.asarray(result.points)[:L]

    # ------------------------------------------------------------------
    def _save(self, state: ReconstructionState, path: str,
              inliers: Optional[np.ndarray] = None) -> None:
        poses = np.stack([state.poses[i] for i in state.registered]) \
            if state.registered else None
        ply.save_cloud(path, state.lm_xyz, state.lm_rgb, poses, inliers)
