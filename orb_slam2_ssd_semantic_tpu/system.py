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
from orb_slam2_ssd_semantic_tpu.utils import precision


class SlamSystem:
    def __init__(
        self,
        cfg: SlamConfig | None = None,
        enable_semantics: bool = False,
        enable_dense_map: bool = False,
        detector_params=None,
        mesh=None,
    ):
        """`mesh`: a `jax.sharding.Mesh` with (`kf`, `pt`) axes switches
        the engine's batch subsystems to their sharded implementations —
        post-loop global BA runs the observation-sharded distributed
        reduction (parallel/dist_ba.py), the keyframe BoW database is
        kf-sharded with sharded queries (parallel/dist_bow.py), and
        dense-grid occupancy insertion runs over X-slabs
        (parallel/dist_occupancy.py). The per-frame tracking hot path
        stays single-device by design (it is latency-bound at 30 Hz;
        the map-scale subsystems are what grow with trajectory length —
        SURVEY.md §2.6 P12, §7 stage 5). Single-device parity is pinned
        by tests/test_mesh_engine.py."""
        import jax.numpy as jnp

        from orb_slam2_ssd_semantic_tpu.tracking.tracker import Tracker

        self.cfg = cfg or SlamConfig()
        self.mesh = mesh
        self.tracker = Tracker(self.cfg, mesh=mesh)
        self.localization_only = False
        self._enable_semantics = enable_semantics
        self._enable_dense_map = enable_dense_map

        self.detector = None
        self.object_db = None
        # Detection queue (the reference's RunDetect condvar queue,
        # RunDetect.cc:29-61): keyframe payloads accumulate and are
        # consumed in batches. Single-device the batch is 1 (detect on
        # insertion, like the thread waking per keyframe); with a mesh
        # the batch is the kf-axis size and the SSD forward runs
        # KEYFRAME-SHARDED over it (VERDICT r4 next #9).
        self._det_queue: list = []
        self._det_batch = 1
        if enable_semantics:
            from orb_slam2_ssd_semantic_tpu.semantic.detector import Detector
            from orb_slam2_ssd_semantic_tpu.semantic.object_db import empty_db

            self.detector = Detector(self.cfg.semantic, params=detector_params)
            self.object_db = empty_db(self.cfg.semantic.max_objects)
            if mesh is not None:
                from orb_slam2_ssd_semantic_tpu.parallel.mesh import KF_AXIS

                if KF_AXIS in mesh.shape:
                    self._det_batch = int(mesh.shape[KF_AXIS])

        self._build_grid()
        self._rng_key = None
        self._last_n_kfs = 0

    def _build_grid(self):
        """(Re)create the dense occupancy map — called at construction and
        on reset (the reference clears the octomap when the map resets,
        MapDrawer.cc:381-386)."""
        mesh = self.mesh
        self.grid = None
        self._sharded_grid = None
        if self._enable_dense_map:
            if mesh is not None and not self.cfg.dense.unbounded:
                # Mesh mode: single working volume sharded into X-slabs
                # over the pt axis; inserts run shard-local with no
                # cross-slab traffic, colors included (first-ray per-scan
                # dedup per slab — parallel/dist_occupancy.py; ADVICE r4
                # colorless-mesh-grid fix).
                from orb_slam2_ssd_semantic_tpu.dense.occupancy import (
                    empty_grid,
                )
                from orb_slam2_ssd_semantic_tpu.parallel import (
                    dist_occupancy,
                )
                from orb_slam2_ssd_semantic_tpu.parallel.mesh import PT_AXIS

                ref = empty_grid(resolution=self.cfg.dense.resolution)
                dims = tuple(int(d) for d in ref.log_odds.shape)
                # Pad only to the pt-axis size: the X slabs are sharded
                # over PT_AXIS alone, so padding to the full device count
                # on a kf>1 mesh would inflate the working volume for
                # nothing (ADVICE r4).
                n_sh = int(mesh.shape[PT_AXIS])
                if dims[0] % n_sh:
                    # Pad the X extent up to a slab multiple.
                    X = ((dims[0] + n_sh - 1) // n_sh) * n_sh
                    res = self.cfg.dense.resolution
                    ref = empty_grid(
                        extent=(X * res, dims[1] * res, dims[2] * res),
                        resolution=res,
                        origin=tuple(float(o) for o in np.asarray(ref.origin)),
                    )
                    dims = tuple(int(d) for d in ref.log_odds.shape)
                origin = tuple(float(o) for o in np.asarray(ref.origin))
                lo, meta = dist_occupancy.make_sharded_grid(
                    mesh, dims, self.cfg.dense.resolution, origin)
                color, n_color = dist_occupancy.make_sharded_colors(
                    mesh, dims)
                insert = dist_occupancy.make_sharded_insert(
                    mesh, self.cfg.dense, dims, origin)
                self._sharded_grid = dict(
                    log_odds=lo, color=color, n_color=n_color, meta=meta,
                    insert=insert, ref=ref)
                self.grid = ref  # dims/origin template for save paths
            elif self.cfg.dense.unbounded:
                from orb_slam2_ssd_semantic_tpu.dense.occupancy import BlockGridMap

                self.grid = BlockGridMap(
                    self.cfg.dense, block_voxels=self.cfg.dense.block_voxels
                )
            else:
                from orb_slam2_ssd_semantic_tpu.dense.occupancy import empty_grid

                self.grid = empty_grid(resolution=self.cfg.dense.resolution)

    # ---- per-frame entry (TrackRGBD, System.cc:262-326) -------------------

    @precision.scoped
    def track_rgbd(self, rgb: np.ndarray, depth: np.ndarray, stamp: float,
                   feats=None) -> np.ndarray:
        """rgb: (H, W, 3) uint8 (or (H, W) gray); depth: (H, W) float32
        meters or uint16 millimeters. Returns T_cw (4, 4). `feats`:
        optional pre-extracted Features (stereo front end)."""
        import jax
        import jax.numpy as jnp

        from orb_slam2_ssd_semantic_tpu.io.tum import rgb_to_gray

        gray = rgb_to_gray(rgb) if rgb.ndim == 3 else rgb
        # Keyframe-insertion detection by uid (counts can stay flat when
        # an insertion and a cull coincide; uids are monotonic).
        was_kf_uid = self.tracker._ref_kf_uid
        was_init = self.tracker.initialized
        self.tracker.allow_new_keyframes = not self.localization_only
        T_cw = self.tracker.process(gray, depth, stamp, feats=feats)

        new_kf = self.tracker._ref_kf_uid > was_kf_uid or (
            self.tracker.initialized and not was_init
        )
        if new_kf:
            self._on_new_keyframe(rgb, depth, T_cw)
        return T_cw

    @precision.scoped
    def track_stereo(self, left: np.ndarray, right: np.ndarray, stamp: float) -> np.ndarray:
        """TrackStereo equivalent (System.cc TrackStereo; the reference
        runs L/R ORB extraction in two std::threads and row-band stereo
        matching in the Frame ctor, Frame.cc:196-197 + ComputeStereoMatches).

        Here: batched extraction over both rectified images, one masked
        row-band Hamming match (ops/stereo.py), and the per-keypoint
        depths are scattered into a sparse depth image consumed by the
        RGB-D path — stereo and RGB-D share every downstream stage. The
        left-image features are handed to the tracker so each image is
        extracted exactly ONCE (the reference likewise extracts once per
        image, in two threads, Frame.cc:196-197)."""
        import jax
        import jax.numpy as jnp

        from orb_slam2_ssd_semantic_tpu.frontend.extractor import extract
        from orb_slam2_ssd_semantic_tpu.geometry import camera as cam_ops
        from orb_slam2_ssd_semantic_tpu.io.tum import rgb_to_gray
        from orb_slam2_ssd_semantic_tpu.ops.stereo import stereo_match

        gl = rgb_to_gray(left) if left.ndim == 3 else left
        gr = rgb_to_gray(right) if right.ndim == 3 else right
        cam, orb = self.cfg.camera, self.cfg.orb

        if getattr(self, "_stereo_front", None) is None:
            # Built ONCE: a jit defined per call is a new cache key per
            # call — the front end would recompile every frame.
            @jax.jit
            def stereo_front(gl, gr):
                fl = extract(gl.astype(jnp.float32), orb)
                fr = extract(gr.astype(jnp.float32), orb)
                depth, _, ok = stereo_match(fl, fr, cam, orb)
                # Scatter depths at the (undistorted) keypoint pixels;
                # the RGB-D frame builder nearest-samples the same
                # pixels.
                uv = cam_ops.undistort_points(fl.uv, cam)
                x = jnp.round(uv[:, 0]).astype(jnp.int32)
                y = jnp.round(uv[:, 1]).astype(jnp.int32)
                oob = ~(
                    ok & (x >= 0) & (x < cam.width)
                    & (y >= 0) & (y < cam.height)
                )
                flat = jnp.where(oob, cam.width * cam.height,
                                 y * cam.width + x)
                img = jnp.zeros((cam.height * cam.width,), jnp.float32)
                img = img.at[flat].set(jnp.where(ok, depth, 0.0), mode="drop")
                return fl, img.reshape(cam.height, cam.width)

            self._stereo_front = stereo_front

        fl, d_dev = self._stereo_front(jnp.asarray(gl), jnp.asarray(gr))
        d = np.asarray(d_dev)
        return self.track_rgbd(gl, d, stamp, feats=fl)

    @precision.scoped
    def track_monocular(self, rgb: np.ndarray, stamp: float) -> np.ndarray:
        """TrackMonocular equivalent (System.cc TrackMonocular).

        Before initialization: hold frames and run the two-view
        initializer (mapping/initializer.py ≙ Initializer.cc) on a wide
        window match; on success the triangulated structure seeds the map
        (scaled so median depth = 1, as CreateInitialMapMonocular does)
        by synthesizing per-keypoint depths for the two seed keyframes.
        Afterwards the regular tracking path runs with depth-less frames:
        observations are monocular in the pose optimizer and new
        landmarks enter only via local-mapping triangulation."""
        import jax
        import jax.numpy as jnp

        from orb_slam2_ssd_semantic_tpu.io.tum import rgb_to_gray

        gray = rgb_to_gray(rgb) if rgb.ndim == 3 else rgb
        if self.tracker.initialized:
            zero_depth = np.zeros(gray.shape, np.float32)
            return self.track_rgbd(gray, zero_depth, stamp)
        return self._mono_initialize(gray, stamp)

    def _mono_initialize(self, gray: np.ndarray, stamp: float) -> np.ndarray:
        import jax
        import jax.numpy as jnp

        from orb_slam2_ssd_semantic_tpu.frontend.extractor import extract
        from orb_slam2_ssd_semantic_tpu.geometry import camera as cam_ops
        from orb_slam2_ssd_semantic_tpu.mapping.initializer import initialize_monocular
        from orb_slam2_ssd_semantic_tpu.ops import match as match_ops

        cam, orb = self.cfg.camera, self.cfg.orb
        feats = extract(jnp.asarray(gray, jnp.float32), orb)
        if getattr(self, "_mono_seed", None) is None:
            self._mono_seed = (gray, stamp, feats)
            return np.eye(4, dtype=np.float32)

        g0, t0, f0 = self._mono_seed
        # Wide-window 2D-2D match (SearchForInitialization radius 100).
        m = match_ops.match_by_window(
            f0.desc, feats.desc, f0.uv, feats.uv, f0.valid, feats.valid,
            radius=100.0, angle_q=f0.angle, angle_t=feats.angle,
            max_dist=match_ops.TH_LOW,
        )
        tgt = jnp.clip(m.idx, 0, feats.uv.shape[0] - 1)
        out = initialize_monocular(
            f0.uv, feats.uv[tgt], m.valid, cam, jax.random.PRNGKey(0)
        )
        if not out["success"]:
            # Keep the newest frame as the seed (reference resets the
            # initializer when matching fails, Tracking.cc monocular init).
            self._mono_seed = (gray, stamp, feats)
            return np.eye(4, dtype=np.float32)

        # Scale so median triangulated depth = 1 (CreateInitialMapMonocular).
        X = np.asarray(out["pts3d"])
        good = np.asarray(out["good"])
        med = float(np.median(X[good][:, 2])) if good.any() else 1.0
        X = X / max(med, 1e-6)
        T1 = np.eye(4, dtype=np.float32)
        T1[:3, :3] = np.asarray(out["R"])
        T1[:3, 3] = np.asarray(out["t"]) / max(med, 1e-6)

        # Seed the two keyframes through the RGB-D path by synthesizing
        # sparse depth images from the triangulated structure.
        d0 = self._sparse_depth(np.asarray(f0.uv), X[:, 2], good, cam)
        self.track_rgbd(g0, d0, t0)
        z1 = (X @ T1[:3, :3].T + T1[:3, 3])[:, 2]
        uv1 = np.asarray(feats.uv)[np.asarray(tgt)]
        d1 = self._sparse_depth(uv1, z1, good & np.asarray(m.valid), cam)
        # Both initial views are keyframes (CreateInitialMapMonocular).
        self.tracker.frames_since_kf = 10**6
        T = self.track_rgbd(gray, d1, stamp)
        self._mono_seed = None
        return T

    @staticmethod
    def _sparse_depth(uv: np.ndarray, z: np.ndarray, ok: np.ndarray, cam) -> np.ndarray:
        img = np.zeros((cam.height, cam.width), np.float32)
        x = np.round(uv[:, 0]).astype(int)
        y = np.round(uv[:, 1]).astype(int)
        keep = ok & (z > 0.05) & (x >= 0) & (x < cam.width) & (y >= 0) & (y < cam.height)
        img[y[keep], x[keep]] = z[keep]
        return img

    def flush_detections(self):
        """Drain the detection queue: one SSD forward over every queued
        keyframe image, then per-keyframe fusion + database merge in
        queue order (the RunDetect consumer processes its whole queue
        per wake, RunDetect.cc:44-57; fusion scheme per
        cfg.semantic.fusion_scheme — depth_window/Merge2d3d or merge_sg,
        the reference's compiled-in choice, MapDrawer.cc:79).

        With a mesh the image batch is placed KEYFRAME-SHARDED before
        the forward, so each device detects its keyframes and only the
        small decoded Detections gather back (parity:
        tests/test_mesh_engine.py)."""
        if self.detector is None or not self._det_queue:
            return
        import jax.numpy as jnp

        from orb_slam2_ssd_semantic_tpu.semantic.fusion import fuse_detections
        from orb_slam2_ssd_semantic_tpu.semantic.object_db import add_objects

        queue, self._det_queue = self._det_queue, []
        if len(queue) == 1 and self.mesh is None:
            # Single keyframe, no mesh: the f32 single-image path (the
            # thread waking for one insertion).
            dets = [self.detector(queue[0][0])]
        else:
            import jax

            rgbs = jnp.asarray(np.stack([q[0] for q in queue]))
            if self.mesh is not None:
                from orb_slam2_ssd_semantic_tpu.parallel.mesh import (
                    KF_AXIS,
                )
                from jax.sharding import NamedSharding, PartitionSpec as P_

                n_kf = int(self.mesh.shape.get(KF_AXIS, 1))
                if rgbs.shape[0] % n_kf == 0:
                    rgbs = jax.device_put(
                        rgbs, NamedSharding(self.mesh, P_(KF_AXIS)))
            h, w = queue[0][0].shape[:2]
            dd = self.detector._detect_batched(
                self.detector.params, rgbs, h, w)
            dets = [jax.tree.map(lambda x, i=i: x[i], dd)
                    for i in range(len(queue))]
        for (rgb3, depth, T_cw), det in zip(queue, dets):
            c, s, p, cls, ok = fuse_detections(
                det, jnp.asarray(depth), jnp.asarray(T_cw),
                self.cfg.camera, self.cfg.semantic,
            )
            self.object_db = add_objects(self.object_db, c, s, p, cls, ok)

    def _on_new_keyframe(self, rgb, depth, T_cw):
        """Keyframe consumers: detection + semantic fusion (the
        RunDetect/ObjectDatabase path, SURVEY.md §3.4) and occupancy
        insertion (MapDrawer::UpdateOctomap path)."""
        import jax
        import jax.numpy as jnp

        if depth.dtype == np.uint16:
            depth = depth.astype(np.float32) * 1e-3
        if self.detector is not None:
            rgb3 = rgb if rgb.ndim == 3 else np.repeat(rgb[..., None], 3, -1)
            self._det_queue.append(
                (rgb3.astype(np.uint8), np.asarray(depth),
                 np.asarray(T_cw)))
            if len(self._det_queue) >= self._det_batch:
                self.flush_detections()

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
            from orb_slam2_ssd_semantic_tpu.dense.occupancy import BlockGridMap

            if self._sharded_grid is not None:
                sg = self._sharded_grid
                sg["log_odds"], sg["color"], sg["n_color"] = sg["insert"](
                    sg["log_odds"], origin, pts, valid, is_ground,
                    colors=colors, color=sg["color"],
                    n_color=sg["n_color"],
                )
            elif isinstance(self.grid, BlockGridMap):
                self.grid.insert_scan(
                    origin, pts, valid, colors=colors, carve_only=is_ground
                )
            else:
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
        """System::Reset equivalent (System.cc:417, Tracking.cc:3069):
        rebuild the tracker KEEPING the device mesh (sharded GBA/BoW/
        occupancy stay active), clear the dense map (the reference clears
        the octomap on map reset, MapDrawer.cc:381-386) and the semantic
        object database."""
        from orb_slam2_ssd_semantic_tpu.tracking.tracker import Tracker

        self.tracker = Tracker(self.cfg, mesh=self.mesh)
        self._build_grid()
        self._det_queue = []
        if self.object_db is not None:
            from orb_slam2_ssd_semantic_tpu.semantic.object_db import empty_db

            self.object_db = empty_db(self.cfg.semantic.max_objects)
        self._rng_key = None
        self._last_n_kfs = 0

    def shutdown(self):
        """Drain pending keyframe consumers (the reference joins its
        worker threads here, System.cc:424-451)."""
        self.flush_detections()

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

        st = self.tracker.state
        kv = np.asarray(st.kfs.valid)
        uid = np.asarray(st.kfs.uid)
        order = np.argsort(np.where(kv, uid, 2 ** 30))[: int(kv.sum())]
        stamps, ts, qs = [], [], []
        for i in order:
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
        from orb_slam2_ssd_semantic_tpu.dense.occupancy import (
            BlockGridMap,
            save_grid,
        )

        assert self.grid is not None, "dense map not enabled"
        if self._sharded_grid is not None:
            # Gather the sharded slabs into the dense-grid container
            # (colors included — ADVICE r4).
            sg = self._sharded_grid
            grid = sg["ref"]._replace(
                log_odds=np.asarray(sg["log_odds"]),
                color=np.asarray(sg["color"]),
                n_color=np.asarray(sg["n_color"]))
            save_grid(path, grid, self.cfg.dense)
            return
        if isinstance(self.grid, BlockGridMap):
            self.grid.save(path)
        else:
            save_grid(path, self.grid, self.cfg.dense)

    def load_octomap(self, path: str):
        from orb_slam2_ssd_semantic_tpu.dense.occupancy import (
            BlockGridMap,
            load_grid,
        )

        import numpy as _np

        with _np.load(path) as z:
            is_blocks = "block_keys" in z.files
        if is_blocks:
            self.grid = BlockGridMap.load(path, self.cfg.dense)
        else:
            self.grid = load_grid(path)

    def objects(self) -> list:
        from orb_slam2_ssd_semantic_tpu.semantic.object_db import summarize

        self.flush_detections()
        return summarize(self.object_db) if self.object_db is not None else []

    def save_objects(self, path: str):
        """Persist the semantic object database: `path` (npz columnar dump)
        plus `path + '.txt'` (objectD.txt-style listing)."""
        from orb_slam2_ssd_semantic_tpu.semantic.object_db import (
            save_db,
            save_objects_txt,
        )

        assert self.object_db is not None, "semantics not enabled"
        self.flush_detections()
        save_db(path, self.object_db)
        save_objects_txt(path + ".txt", self.object_db)

    def load_objects(self, path: str):
        from orb_slam2_ssd_semantic_tpu.semantic.object_db import load_db

        self.object_db = load_db(path)


def rgb_to_gray_np(rgb: np.ndarray) -> np.ndarray:
    from orb_slam2_ssd_semantic_tpu.io.tum import rgb_to_gray

    return rgb_to_gray(rgb) if rgb.ndim == 3 else rgb.astype(np.float32)


# Reference-name alias: the reference's facade class is `System`
# (perfect/include/System.h); users porting code can keep the name.
System = SlamSystem
