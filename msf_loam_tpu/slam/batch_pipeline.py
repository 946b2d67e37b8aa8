"""Multi-sequence batched SLAM: one device program, B trajectories.

The within-frame math of a single trajectory cannot parallelize across
frames (frame t needs the map built from frames <t — SURVEY.md §7.3), but a
chip can run MANY trajectories at once: every stage of the per-frame
pipeline is vmapped over a batch axis and frames advance with a ``lax.scan``
inside one jit. This is how KITTI 00-10 runs as a batch and how a serving
deployment packs many robots per chip.

State (maps, poses, previous features) is a pytree with a leading batch
axis, donated between steps. Sharding the batch axis over a mesh 'data'
axis turns this into multi-chip data parallelism with zero collectives.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from msf_loam_tpu.config import MsfLoamConfig
from msf_loam_tpu.core.pointcloud import RingImage, ScanFeatures
from msf_loam_tpu.core.se3 import Pose
from msf_loam_tpu.ops import features as feat_mod
from msf_loam_tpu.slam import mapping, odometry, voxel_map
from msf_loam_tpu.slam.pipeline import downsample_features
from msf_loam_tpu.slam.voxel_map import VoxelHashMap

Array = jax.Array


class BatchState(NamedTuple):
    corner_map: VoxelHashMap     # leaves have leading batch axis
    surf_map: VoxelHashMap
    prev_feats: ScanFeatures     # leading batch axis
    pose_c2l: Pose               # (B,) poses
    pose_odom: Pose
    pose_o2m: Pose
    frame_idx: Array             # () int32


def init_batch_state(cfg: MsfLoamConfig, batch: int, n_rings: int) -> BatchState:
    mc = cfg.mapping
    one_c = voxel_map.create_map(mc.map_table_size, mc.map_cell_capacity,
                                 mc.map_cell_size, mc.line_resolution)
    one_s = voxel_map.create_map(mc.map_table_size, mc.map_cell_capacity,
                                 mc.map_cell_size, mc.plane_resolution)
    tile = lambda tree: jax.tree.map(
        lambda a: jnp.broadcast_to(a, (batch,) + a.shape).copy()
        if jnp.ndim(a) > 0 else jnp.broadcast_to(a, (batch,)).copy(), tree)

    fc = cfg.features
    S = fc.num_sectors
    dummy = RingImage(
        xyz=jnp.zeros((n_rings, fc.max_points_per_ring, 3)),
        rel_time=jnp.zeros((n_rings, fc.max_points_per_ring)),
        mask=jnp.zeros((n_rings, fc.max_points_per_ring), bool))
    feats0 = feat_mod.extract_features(dummy, jnp.float32(0.0), fc)

    return BatchState(
        corner_map=tile(one_c),
        surf_map=tile(one_s),
        prev_feats=tile(feats0),
        pose_c2l=Pose.identity((batch,)),
        pose_odom=Pose.identity((batch,)),
        pose_o2m=Pose.identity((batch,)),
        frame_idx=jnp.int32(0),
    )


def _frame_fn(cfg: MsfLoamConfig, state_slice, img: RingImage, is_first: Array):
    """Single-trajectory frame step (vmapped over the batch)."""
    (cmap, smap, prev_feats, pose_c2l, pose_odom, pose_o2m) = state_slice
    fc, oc, mc = cfg.features, cfg.odometry, cfg.mapping

    feats = feat_mod.extract_features(img, jnp.float32(0.0), fc)

    odo = odometry.match_scan2scan(prev_feats, feats, pose_c2l, oc)
    use = odo.ok & ~is_first
    pose_c2l = jax.tree.map(
        lambda n, o: jnp.where(use, n, o), odo.pose_curr2last, pose_c2l)
    # first frame: no motion
    step_pose = jax.tree.map(
        lambda i, p: jnp.where(is_first, i, p), Pose.identity(), pose_c2l)
    pose_odom = pose_odom.compose(step_pose)

    corner_ds = downsample_features(feats.corner_less_sharp,
                                    mc.line_resolution, mc.max_query_points)
    surf_ds = downsample_features(feats.surf_less_flat,
                                  mc.plane_resolution, mc.max_query_points)

    guess = pose_o2m.compose(pose_odom)
    mres = mapping.match_scan2map(cmap, smap, corner_ds, surf_ds, guess, mc)
    pose_map = jax.tree.map(
        lambda n, o: jnp.where(mres.ok, n, o), mres.pose, guess)
    pose_o2m = pose_map.compose(pose_odom.inverse())

    cw = corner_ds.transform(pose_map)
    sw = surf_ds.transform(pose_map)
    cmap = voxel_map.insert(cmap, cw.xyz, cw.mask)
    smap = voxel_map.insert(smap, sw.xyz, sw.mask)

    return (cmap, smap, feats, pose_c2l, pose_odom, pose_o2m), pose_map


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(1,))
def run_batch(cfg: MsfLoamConfig, state: BatchState,
              ring_images: RingImage) -> Tuple[BatchState, Pose]:
    """Process T frames for all B sequences.

    ring_images leaves are (T, B, R, W, ...). Returns (final state,
    per-frame mapped poses with leaves (T, B, ...)).
    """
    vf = jax.vmap(functools.partial(_frame_fn, cfg),
                  in_axes=((0, 0, 0, 0, 0, 0), 0, None))

    def scan_step(carry, img_t):
        state_tuple, idx = carry
        new_state, pose_map = vf(state_tuple, img_t, idx == 0)
        return (new_state, idx + 1), pose_map

    state_tuple = (state.corner_map, state.surf_map, state.prev_feats,
                   state.pose_c2l, state.pose_odom, state.pose_o2m)
    (state_tuple, idx), poses = jax.lax.scan(
        scan_step, (state_tuple, state.frame_idx), ring_images)
    new_state = BatchState(*state_tuple, frame_idx=idx)
    return new_state, poses
