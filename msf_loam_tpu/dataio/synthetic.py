"""Synthetic LiDAR world + scan simulator for golden-trajectory tests.

The reference has no such harness (its e2e validation is manual bag replay,
SURVEY.md §4); we build one: a structured world of planes (walls/floor) and
vertical poles, ray-cast by a virtual multi-ring spinning LiDAR from a given
pose. Gives exact ground-truth trajectories for ATE-bounded tests.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import numpy as np


@dataclasses.dataclass
class Plane:
    point: np.ndarray   # (3,)
    normal: np.ndarray  # (3,) unit
    half_extent: float = 30.0  # ray hits accepted within this distance of `point`


@dataclasses.dataclass
class Pole:
    base: np.ndarray  # (3,) base position
    radius: float = 0.15
    height: float = 6.0


@dataclasses.dataclass
class World:
    planes: List[Plane]
    poles: List[Pole]

    @staticmethod
    def corridor(seed: int = 0, n_poles: int = 24, size: float = 40.0) -> "World":
        """A room: floor + 4 walls + scattered poles (edge features)."""
        rng = np.random.default_rng(seed)
        s = size
        planes = [
            Plane(np.array([0.0, 0.0, -2.0]), np.array([0.0, 0.0, 1.0]), s * 2),
            Plane(np.array([s, 0.0, 0.0]), np.array([-1.0, 0.0, 0.0]), s * 2),
            Plane(np.array([-s, 0.0, 0.0]), np.array([1.0, 0.0, 0.0]), s * 2),
            Plane(np.array([0.0, s, 0.0]), np.array([0.0, -1.0, 0.0]), s * 2),
            Plane(np.array([0.0, -s, 0.0]), np.array([0.0, 1.0, 0.0]), s * 2),
        ]
        poles = []
        for _ in range(n_poles):
            xy = rng.uniform(-s * 0.8, s * 0.8, size=2)
            if np.linalg.norm(xy) < 4.0:
                continue  # keep the sensor start area clear
            poles.append(Pole(np.array([xy[0], xy[1], -2.0])))
        return World(planes, poles)


def _raycast(world: World, origins: np.ndarray, d_world: np.ndarray,
             max_range: float) -> np.ndarray:
    """Per-ray hit distance for rays (origins (N,3), directions (N,3))."""
    t_hit = np.full(len(d_world), np.inf)
    for pl in world.planes:
        denom = d_world @ pl.normal
        safe = np.where(np.abs(denom) > 1e-6, denom, 1.0)
        t = np.where(np.abs(denom) > 1e-6,
                     ((pl.point[None] - origins) @ pl.normal) / safe, np.inf)
        t = np.minimum(t, 1e6)
        hit_pt = origins + d_world * t[:, None]
        ok = (t > 0.1) & (np.linalg.norm(hit_pt - pl.point, axis=1) < pl.half_extent)
        t_hit = np.where(ok & (t < t_hit), t, t_hit)
    for pole in world.poles:
        # infinite-cylinder intersection in xy, then z-extent check
        oc = origins[:, :2] - pole.base[None, :2]
        dxy = d_world[:, :2]
        a = np.sum(dxy * dxy, axis=1)
        b = 2 * np.sum(dxy * oc, axis=1)
        c = np.sum(oc * oc, axis=1) - pole.radius ** 2
        disc = b * b - 4 * a * c
        ok = (disc > 0) & (a > 1e-9)
        sq = np.sqrt(np.maximum(disc, 0.0))
        t = np.where(ok, (-b - sq) / np.maximum(2 * a, 1e-9), np.inf)
        z = origins[:, 2] + d_world[:, 2] * t
        ok = ok & (t > 0.1) & (z >= pole.base[2]) & (z <= pole.base[2] + pole.height)
        t_hit = np.where(ok & (t < t_hit), t, t_hit)
    t_hit = np.where(t_hit < max_range, t_hit, np.inf)
    return t_hit


def simulate_scan(world: World, t_world: np.ndarray, R_world: np.ndarray,
                  n_rings: int = 16, pts_per_ring: int = 900,
                  fov_up: float = 15.0, fov_down: float = -15.0,
                  max_range: float = 80.0, noise: float = 0.0,
                  seed: int = 0,
                  linear_vel: np.ndarray = None,
                  yaw_rate: float = 0.0,
                  scan_period: float = 0.1) -> Tuple[np.ndarray, np.ndarray]:
    """Ray-cast a spinning-LiDAR scan from pose (R_world, t_world).

    Returns (xyz (N,3) in the scan-START sensor frame, ring (N,)). Points
    are emitted azimuth-major like a real spinning lidar packet stream, so
    downstream rel-time computation is realistic.

    With ``linear_vel``/``yaw_rate`` set, the sensor moves DURING the scan
    (rolling shutter): column at azimuth fraction s is captured from pose
    (t + v*s*T, R*Rz(w*s*T)) but all returns are expressed in the start
    frame — exactly the motion distortion the IMU deskew path removes.
    """
    rng = np.random.default_rng(seed)
    elev = np.radians(np.linspace(fov_down, fov_up, n_rings))
    azim = -np.linspace(0, 2 * np.pi, pts_per_ring, endpoint=False)  # CW

    az, el = np.meshgrid(azim, elev, indexing="ij")  # (A, R)
    dirs = np.stack(
        [np.cos(el) * np.cos(az), np.cos(el) * np.sin(az), np.sin(el)], axis=-1
    ).reshape(-1, 3)  # (A*R, 3)
    ring = np.tile(np.arange(n_rings, dtype=np.int32), pts_per_ring)

    # per-point capture pose (constant during a column)
    s = np.repeat(np.arange(pts_per_ring) / pts_per_ring, n_rings)  # (A*R,)
    if linear_vel is None and yaw_rate == 0.0:
        origins = np.broadcast_to(t_world, dirs.shape).copy()
        R_cols = None
        d_world = dirs @ R_world.T
    else:
        lv = np.zeros(3) if linear_vel is None else np.asarray(linear_vel)
        dt = s * scan_period
        origins = t_world[None] + lv[None] * dt[:, None]
        yaw = yaw_rate * dt
        cy, sy = np.cos(yaw), np.sin(yaw)
        # d_world = R_world @ Rz(yaw) @ dir, vectorized
        dx = cy * dirs[:, 0] - sy * dirs[:, 1]
        dy = sy * dirs[:, 0] + cy * dirs[:, 1]
        d_local = np.stack([dx, dy, dirs[:, 2]], axis=1)
        d_world = d_local @ R_world.T

    t_hit = _raycast(world, origins, d_world, max_range)
    hit = np.isfinite(t_hit)
    pts_world = origins + d_world * np.where(hit, t_hit, 0.0)[:, None]
    if noise > 0:
        pts_world = pts_world + rng.normal(scale=noise, size=pts_world.shape)
    # express in the scan-START sensor frame
    pts_sensor = (pts_world[hit] - t_world) @ R_world
    return pts_sensor.astype(np.float32), ring[hit]
