"""FBASlam: sparse keyframe odometry + loop closure + pose-graph optimisation.

TPU rebuild of the reference's FBAFusion system (ref:
example/FBAFusion/FBASlam.{h,cpp}, driver FBAFusion.cpp:10-105):

  per frame:
    - ORB-track against the last keyframe (ref FBASlam.cpp:23)
    - keyframe when average disparity >= 30 px (ref :32-41)
    - on keyframe: loop-closure candidates from the descriptor DB
      (ref :73), re-track each candidate to build graph edges (ref :81-123),
      insert into DB, pose-graph FastBA over keyframes (ref :140-147),
      re-anchor all frames (UpdateAllPoses)
    - relocalisation via LC candidates when tracking fails (ref :103-108)

Device work (feature extraction, matching, RANSAC, pose-graph GN) is jitted;
this module is the host-side frame loop, exactly the part of the reference
that is irregular control flow.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import se3
from ..geometry.camera import PinholeCamera
from ..lcdetection.mild import LoopClosureDetector
from ..odometry import sparse
from ..optimization import posegraph
from .keyframe_slam import KEYFRAME_DISPARITY, KeyframeSlamState, average_disparity

MAX_EDGE_CORRS = 256


@dataclasses.dataclass
class FBASlam:
    camera: PinholeCamera
    max_keypoints: int = 1000
    fast_threshold: float = 0.05
    keyframe_disparity: float = KEYFRAME_DISPARITY

    def __post_init__(self):
        self.state = KeyframeSlamState(self.camera)
        self.lcd = LoopClosureDetector()
        self.keyframe_frames: list[sparse.SparseFrame] = []
        self.keyframe_poses: list[np.ndarray] = []  # world-from-keyframe
        self.edges: list[dict] = []
        self.frame_count = 0
        self._rng = np.random.default_rng(0)

    # ------------------------------------------------------------------

    def _extract(self, gray, depth) -> sparse.SparseFrame:
        return sparse.extract_sparse_frame(
            jnp.asarray(gray), jnp.asarray(depth), self.camera,
            max_keypoints=self.max_keypoints, threshold=self.fast_threshold,
        )

    def _track(self, src: sparse.SparseFrame, tgt: sparse.SparseFrame):
        key = jax.random.PRNGKey(int(self._rng.integers(0, 2**31)))
        return sparse.sparse_tracking(src, tgt, self.camera, key)

    def _add_edge(self, src_kf: int, dst_kf: int, res) -> None:
        v = np.asarray(res.corr_valid)
        self.edges.append(
            {
                "src": src_kf,
                "dst": dst_kf,
                "p_src": np.asarray(res.corr_src)[v][:MAX_EDGE_CORRS],
                "p_dst": np.asarray(res.corr_dst)[v][:MAX_EDGE_CORRS],
            }
        )

    def update_frame(self, gray: np.ndarray, depth: np.ndarray) -> dict:
        """Process one frame; returns a metrics dict (pose, keyframe?, ...)."""
        fidx = self.frame_count
        self.frame_count += 1
        frame = self._extract(gray, depth)

        if fidx == 0:
            self.keyframe_frames.append(frame)
            self.keyframe_poses.append(np.eye(4, dtype=np.float32))
            self.state.promote_keyframe(0)
            self.lcd.insert(frame.kp.desc, frame.valid)
            self.state.add_frame(np.eye(4), 0, np.eye(4), True)
            return {"frame": 0, "keyframe": True, "success": True}

        kf_idx = len(self.keyframe_frames) - 1
        res = self._track(self.keyframe_frames[kf_idx], frame)
        success = bool(res.success)

        if not success:
            # relocalisation against loop-closure candidates (ref :103-108)
            for cand in self.lcd.select_candidates(frame.kp.desc, frame.valid, exclude_recent=0):
                res_c = self._track(self.keyframe_frames[cand], frame)
                if bool(res_c.success):
                    kf_idx = cand
                    res = res_c
                    success = True
                    break

        if not success:
            # keep last pose (constant-position fallback); mark failure
            last = self.state.poses[-1]
            self.state.add_frame(last, kf_idx, np.linalg.inv(self.keyframe_poses[kf_idx]) @ last, False)
            return {"frame": fidx, "keyframe": False, "success": False}

        T_ts = np.asarray(res.T_ts)  # kf -> current
        T_rel = np.linalg.inv(T_ts)  # current in kf coords: T_kf_cur
        T_world = self.keyframe_poses[kf_idx] @ T_rel
        self.state.add_frame(T_world, kf_idx, T_rel, True)

        # keyframe decision on inlier disparity (ref :32-41)
        v = np.asarray(res.corr_valid)
        uv_kf = np.asarray(self.keyframe_frames[kf_idx].kp.uv)
        pred = np.asarray(res.corr_dst)  # matched target points (3D)
        # disparity in pixels between keyframe keypoints and their matches
        uvs_t, _ = self.camera.project(jnp.asarray(pred))
        disp = average_disparity(uv_kf, np.asarray(uvs_t), v)
        is_kf = disp >= self.keyframe_disparity
        if not is_kf:
            return {"frame": fidx, "keyframe": False, "success": True, "disparity": disp}

        # promote to keyframe
        new_kf = len(self.keyframe_frames)
        self.keyframe_frames.append(frame)
        self.keyframe_poses.append(T_world.astype(np.float32))
        self.state.promote_keyframe(fidx)
        self._add_edge(kf_idx, new_kf, res)

        # loop closure edges (ref :73-123)
        for cand in self.lcd.select_candidates(frame.kp.desc, frame.valid):
            if cand == kf_idx:
                continue
            res_c = self._track(self.keyframe_frames[cand], frame)
            if bool(res_c.success):
                self._add_edge(cand, new_kf, res_c)

        self.lcd.insert(frame.kp.desc, frame.valid)
        self.optimize()
        return {"frame": fidx, "keyframe": True, "success": True, "disparity": disp}

    def optimize(self, iters: int = posegraph.DEFAULT_ITERS) -> None:
        """Pose-graph FastBA over keyframes + re-anchor all frames
        (ref FBASlam.cpp:140-147 `Optimize`)."""
        n = len(self.keyframe_poses)
        if n < 2 or not self.edges:
            return
        edges = posegraph.build_edges(self.edges, corr_capacity=MAX_EDGE_CORRS)
        poses0 = jnp.asarray(np.stack(self.keyframe_poses), jnp.float32)
        opt, _ = posegraph.optimize_pose_graph(poses0, edges, iters=iters)
        opt_np = np.asarray(opt)
        self.keyframe_poses = [opt_np[i] for i in range(n)]
        # re-anchor every frame: anchor_keyframe stores keyframe LIST index
        kf_pose_arr = np.stack(self.keyframe_poses)
        self.state.update_all_poses(kf_pose_arr)

    def trajectory(self) -> np.ndarray:
        return self.state.trajectory()
