"""Mid-run checkpoint / resume of the SLAM pipeline state.

The reference has NO mid-run checkpointing — only terminal artifacts (PLY +
pbstream at shutdown, laser_mapping.cc:89-120; SURVEY.md §5). For a
production TPU deployment we snapshot the full pipeline state — voxel map
shards, pose chain, estimator window, IMU-derived gravity/velocity — so a
run can resume exactly where it stopped (elastic restart / preemption).

Format: one compressed .npz per snapshot (atomic rename on save).
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import TYPE_CHECKING

import jax.numpy as jnp
import numpy as np

from msf_loam_tpu.core.se3 import Pose

if TYPE_CHECKING:
    from msf_loam_tpu.slam.pipeline import SlamPipeline


def save_checkpoint(pipe: "SlamPipeline", path: str) -> None:
    payload = {
        "frame_idx": np.int64(pipe.frame_idx),
        "pose_odom_t": np.asarray(pipe.pose_odom.t),
        "pose_odom_q": np.asarray(pipe.pose_odom.q),
        "pose_c2l_t": np.asarray(pipe.pose_curr2last.t),
        "pose_c2l_q": np.asarray(pipe.pose_curr2last.q),
        "pose_o2m_t": np.asarray(pipe.pose_odom2map.t),
        "pose_o2m_q": np.asarray(pipe.pose_odom2map.q),
        "pose_map_t": np.asarray(pipe.pose_map.t),
        "pose_map_q": np.asarray(pipe.pose_map.q),
        "velocity": np.asarray(pipe.velocity),
        "gravity": np.asarray(pipe.gravity),
        "is_initialized": np.bool_(pipe.is_initialized),
        # voxel maps
        "cmap_points": np.asarray(pipe.corner_map.points),
        "cmap_keys": np.asarray(pipe.corner_map.leaf_key),
        "cmap_count": np.asarray(pipe.corner_map.count),
        "cmap_nobs": np.asarray(pipe.corner_map.n_obs),
        "smap_points": np.asarray(pipe.surf_map.points),
        "smap_keys": np.asarray(pipe.surf_map.leaf_key),
        "smap_count": np.asarray(pipe.surf_map.count),
        "smap_nobs": np.asarray(pipe.surf_map.n_obs),
        # trajectory so far
        "traj": pipe.trajectory() if pipe.results else np.zeros((0, 8)),
        # estimator window (JSON-encoded; small)
        "states_json": np.frombuffer(json.dumps([
            {k: (v.tolist() if isinstance(v, np.ndarray) else v)
             for k, v in s.items()} for s in pipe._states
        ]).encode(), dtype=np.uint8),
    }
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    # note: np.savez appends ".npz" unless the name already ends with it,
    # so the temp name must keep the suffix for the atomic rename to work
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp.npz")
    os.close(fd)
    try:
        np.savez_compressed(tmp, **payload)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load_checkpoint(pipe: "SlamPipeline", path: str) -> None:
    """Restore state in place (maps/poses/estimator; results get the saved
    trajectory as (time, odom==map) rows)."""
    from msf_loam_tpu.slam.pipeline import FrameResult

    with np.load(path) as z:
        pipe.frame_idx = int(z["frame_idx"])
        pipe.pose_odom = Pose(jnp.asarray(z["pose_odom_t"]), jnp.asarray(z["pose_odom_q"]))
        pipe.pose_curr2last = Pose(jnp.asarray(z["pose_c2l_t"]), jnp.asarray(z["pose_c2l_q"]))
        pipe.pose_odom2map = Pose(jnp.asarray(z["pose_o2m_t"]), jnp.asarray(z["pose_o2m_q"]))
        pipe.pose_map = Pose(jnp.asarray(z["pose_map_t"]), jnp.asarray(z["pose_map_q"]))
        pipe.velocity = jnp.asarray(z["velocity"])
        pipe.gravity = jnp.asarray(z["gravity"])
        pipe.is_initialized = bool(z["is_initialized"])
        def _sanitize(points, count):
            # restore the EMPTY_COORD tail invariant (snapshots written
            # before the invariant existed carry zeros past count)
            from msf_loam_tpu.slam.voxel_map import EMPTY_COORD
            p = jnp.asarray(points)
            occ = jnp.arange(p.shape[1])[None, :] < jnp.asarray(count)[:, None]
            return jnp.where(occ[..., None], p, EMPTY_COORD)

        pipe.corner_map = pipe.corner_map._replace(
            points=_sanitize(z["cmap_points"], z["cmap_count"]),
            leaf_key=jnp.asarray(z["cmap_keys"]),
            count=jnp.asarray(z["cmap_count"]),
            n_obs=jnp.asarray(z["cmap_nobs"]))
        pipe.surf_map = pipe.surf_map._replace(
            points=_sanitize(z["smap_points"], z["smap_count"]),
            leaf_key=jnp.asarray(z["smap_keys"]),
            count=jnp.asarray(z["smap_count"]),
            n_obs=jnp.asarray(z["smap_nobs"]))
        states = json.loads(bytes(z["states_json"]).decode() or "[]")
        pipe._states = [
            {k: (np.asarray(v, np.float32) if isinstance(v, list) else v)
             for k, v in s.items()} for s in states]
        traj = z["traj"]
        pipe.results = [
            FrameResult(time=float(r[0]),
                        odom_pose=Pose(jnp.asarray(r[1:4], dtype=jnp.float32),
                                       jnp.asarray(r[4:8], dtype=jnp.float32)),
                        map_pose=Pose(jnp.asarray(r[1:4], dtype=jnp.float32),
                                      jnp.asarray(r[4:8], dtype=jnp.float32)),
                        n_correspondences=0.0, ok=True)
            for r in traj]
