"""System facade: the engine's public API.

Mirrors the reference System class surface (perfect/include/System.h:
61-131 / src/System.cc): construction boots the subsystems; per-frame
entry is `track_rgbd`; mode switches, reset, trajectory/map/octomap
persistence and the semantic-object listing round out the API. Where
the reference spawns five threads (SURVEY.md §2.6), this facade
sequences jitted pipeline stages: tracking every frame; detection,
semantic fusion and occupancy insertion per new keyframe.
"""

from __future__ import annotations

import numpy as np

from orb_slam2_ssd_semantic_tpu.config import SlamConfig


class SlamSystem:
    def __init__(
        self,
        cfg: SlamConfig | None = None,
        enable_semantics: bool = False,
        enable_dense_map: bool = False,
        detector_params=None,
    ):
        import jax.numpy as jnp

        from orb_slam2_ssd_semantic_tpu.tracking.tracker import Tracker

        self.cfg = cfg or SlamConfig()
        self.tracker = Tracker(self.cfg)
        self.localization_only = False

        self.detector = None
        self.object_db = None
        if enable_semantics:
            from orb_slam2_ssd_semantic_tpu.semantic.detector import Detector
            from orb_slam2_ssd_semantic_tpu.semantic.object_db import empty_db

            self.detector = Detector(self.cfg.semantic, params=detector_params)
            self.object_db = empty_db(self.cfg.semantic.max_objects)

        self.grid = None
        if enable_dense_map:
            from orb_slam2_ssd_semantic_tpu.dense.occupancy import empty_grid

            self.grid = empty_grid(resolution=self.cfg.dense.resolution)
        self._rng_key = None
        self._last_n_kfs = 0

    # ---- per-frame entry (TrackRGBD, System.cc:262-326) -------------------

    def track_rgbd(self, rgb: np.ndarray, depth: np.ndarray, stamp: float) -> np.ndarray:
        """rgb: (H, W, 3) uint8 (or (H, W) gray); depth: (H, W) float32
        meters or uint16 millimeters. Returns T_cw (4, 4)."""
        import jax
        import jax.numpy as jnp

        from orb_slam2_ssd_semantic_tpu.io.tum import rgb_to_gray

        gray = rgb_to_gray(rgb) if rgb.ndim == 3 else rgb
        was_kf_count = self.tracker._n_kfs
        self.tracker.allow_new_keyframes = not self.localization_only
        T_cw = self.tracker.process(gray, depth, stamp)

        new_kf = self.tracker._n_kfs > was_kf_count
        if new_kf:
            self._on_new_keyframe(rgb, depth, T_cw)
        return T_cw

    def _on_new_keyframe(self, rgb, depth, T_cw):
        """Keyframe consumers: detection + semantic fusion (the
        RunDetect/ObjectDatabase path, SURVEY.md §3.4) and occupancy
        insertion (MapDrawer::UpdateOctomap path)."""
        import jax
        import jax.numpy as jnp

        if depth.dtype == np.uint16:
            depth = depth.astype(np.float32) * 1e-3
        if self.detector is not None:
            from orb_slam2_ssd_semantic_tpu.semantic.fusion import fuse_depth_window
            from orb_slam2_ssd_semantic_tpu.semantic.object_db import add_objects

            rgb3 = rgb if rgb.ndim == 3 else np.repeat(rgb[..., None], 3, -1)
            det = self.detector(rgb3.astype(np.uint8))
            c, s, p, cls, ok = fuse_depth_window(
                det, jnp.asarray(depth), jnp.asarray(T_cw), self.cfg.camera,
                self.cfg.semantic,
            )
            self.object_db = add_objects(self.object_db, c, s, p, cls, ok)

        if self.grid is not None:
            from orb_slam2_ssd_semantic_tpu.dense.occupancy import insert_scan
            from orb_slam2_ssd_semantic_tpu.dense.pointcloud import (
                keyframe_cloud,
                split_ground,
            )
            from orb_slam2_ssd_semantic_tpu.geometry import se3

            if self._rng_key is None:
                self._rng_key = jax.random.PRNGKey(0)
            self._rng_key, sub = jax.random.split(self._rng_key)
            gray = rgb_to_gray_np(rgb)
            pts, valid, colors = keyframe_cloud(
                jnp.asarray(depth), jnp.asarray(T_cw), self.cfg.camera,
                self.cfg.dense, gray_img=jnp.asarray(gray),
            )
            is_ground, _ = split_ground(pts, valid, sub, 1, self.cfg.dense)
            T_wc = np.linalg.inv(np.asarray(T_cw))
            origin = jnp.asarray(T_wc[:3, 3])
            self.grid = insert_scan(
                self.grid, origin, pts, valid, colors=colors,
                carve_only=is_ground, cfg=self.cfg.dense,
            )

    # ---- mode switches (System.cc:389-421) --------------------------------

    def activate_localization_mode(self):
        self.localization_only = True

    def deactivate_localization_mode(self):
        self.localization_only = False
        self.tracker.frames_since_kf = 0

    def reset(self):
        """System::Reset equivalent (System.cc:417, Tracking.cc:3069)."""
        from orb_slam2_ssd_semantic_tpu.tracking.tracker import Tracker

        self.tracker = Tracker(self.cfg)

    def shutdown(self):
        """No worker threads to join; provided for API parity
        (System::Shutdown, System.cc:424-451)."""

    # ---- outputs ----------------------------------------------------------

    @property
    def status(self) -> str:
        return self.tracker.status

    def save_trajectory_tum(self, path: str):
        self.tracker.save_trajectory_tum(path)

    def save_keyframe_trajectory_tum(self, path: str):
        """SaveKeyFrameTrajectoryTUM (System.cc:508-541)."""
        import jax.numpy as jnp

        from orb_slam2_ssd_semantic_tpu.geometry import se3
        from orb_slam2_ssd_semantic_tpu.io.tum import write_trajectory

        n = self.tracker._n_kfs
        st = self.tracker.state
        stamps, ts, qs = [], [], []
        for i in range(n):
            T = np.asarray(st.kfs.T_cw[i])
            R, t = T[:3, :3], T[:3, 3]
            Rwc, twc = R.T, -R.T @ t
            q = np.asarray(se3.rot_to_quat(jnp.asarray(Rwc)))
            stamps.append(float(np.asarray(st.kfs.stamp[i])))
            ts.append(twc)
            qs.append(q)
        write_trajectory(path, stamps, ts, qs)

    def save_trajectory_kitti(self, path: str):
        from orb_slam2_ssd_semantic_tpu.io.tum import write_trajectory_kitti

        poses = [np.linalg.inv(T) for _, T in self.tracker.absolute_poses()]
        write_trajectory_kitti(path, poses)

    def save_map(self, path: str):
        from orb_slam2_ssd_semantic_tpu.io.map_io import save_map

        save_map(path, self.tracker.state)

    def load_map(self, path: str):
        from orb_slam2_ssd_semantic_tpu.io.map_io import load_map

        self.tracker.state = load_map(path, self.cfg)
        self.tracker.initialized = True
        self.tracker._on_keyframe_inserted()

    def save_octomap(self, path: str):
        from orb_slam2_ssd_semantic_tpu.dense.occupancy import save_grid

        assert self.grid is not None, "dense map not enabled"
        save_grid(path, self.grid, self.cfg.dense)

    def load_octomap(self, path: str):
        from orb_slam2_ssd_semantic_tpu.dense.occupancy import load_grid

        self.grid = load_grid(path)

    def objects(self) -> list:
        from orb_slam2_ssd_semantic_tpu.semantic.object_db import summarize

        return summarize(self.object_db) if self.object_db is not None else []


def rgb_to_gray_np(rgb: np.ndarray) -> np.ndarray:
    from orb_slam2_ssd_semantic_tpu.io.tum import rgb_to_gray

    return rgb_to_gray(rgb) if rgb.ndim == 3 else rgb.astype(np.float32)
