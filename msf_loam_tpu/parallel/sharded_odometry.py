"""Point-axis-sharded scan-to-scan odometry.

SURVEY §2.9's "data parallelism over residuals" wired into the frame
program (VERDICT r4 missing #3): the scan-to-scan matcher's per-query
work — the (N, M) distance reductions of the correspondence search
(the reference's serial loops, odometry_scan_matcher.cc:81-258) and the
residual/Jacobian blocks of the 2x6 GN — shards over the mesh axis, with
ONE psum per GN iteration carrying the 6x6 normal equations and one for
the correspondence count. Reference clouds stay replicated (they are the
"model" every query matches against); query clouds split rows.

Results are numerically identical to the dense matcher up to the psum's
partial-sum reassociation (same correspondences, same solve — the only
float difference is the H/g accumulation order), which the dense-vs-
sharded trajectory test tolerance absorbs.

Measured motivation: on the 8-virtual-device CPU mesh, odometry is 91%
of the replicated frame (1447 of 1588 ms — scripts/profile_fused_ablate
under JAX_PLATFORMS=cpu), which is exactly the strong-scaling collapse
the r4 census attributed to replicated per-frame compute.
"""

from __future__ import annotations

import functools

import jax
from jax.sharding import Mesh, PartitionSpec as P

from msf_loam_tpu.config import OdometryConfig
from msf_loam_tpu.core.pointcloud import PointBatch, ScanFeatures
from msf_loam_tpu.core.se3 import Pose
from msf_loam_tpu.slam import odometry

_AXIS = "map"          # same mesh axis the sharded map shards over


def _pb_spec(sharded: bool) -> PointBatch:
    row = P(_AXIS) if sharded else P()
    return PointBatch(xyz=P(_AXIS, None) if sharded else P(),
                      rel_time=row, ring=row, mask=row)


@functools.lru_cache(maxsize=16)
def _sharded_odo_program(mesh: Mesh, cfg: OdometryConfig):
    pose_spec = Pose(t=P(), q=P())
    out_spec = odometry.OdometryResult(
        pose_curr2last=pose_spec, n_correspondences=P(), ok=P(), cost=P())

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(_pb_spec(False), _pb_spec(False),
                  _pb_spec(True), _pb_spec(True), pose_spec),
        out_specs=out_spec,
        check_vma=False,
    )
    def run(ref_corner, ref_surf, q_corner, q_surf, pose0):
        return odometry.match_clouds(ref_corner, ref_surf, q_corner, q_surf,
                                     pose0, cfg, axis_name=_AXIS)

    return run


def sharded_match_scan2scan(mesh: Mesh, scan_last: ScanFeatures,
                            scan_curr: ScanFeatures, pose0: Pose,
                            cfg: OdometryConfig):
    """Drop-in for odometry.match_scan2scan with query rows sharded over
    the mesh (use inside a jitted frame program; the shard_map region is
    internal). Falls back to the dense matcher when a query cloud's row
    count does not divide the mesh size (nonstandard sensor configs)."""
    ndev = mesh.devices.size
    if (scan_curr.corner_sharp.capacity % ndev
            or scan_curr.surf_flat.capacity % ndev):
        return odometry.match_scan2scan(scan_last, scan_curr, pose0, cfg)
    return _sharded_odo_program(mesh, cfg)(
        scan_last.corner_less_sharp, scan_last.surf_less_flat,
        scan_curr.corner_sharp, scan_curr.surf_flat, pose0)
