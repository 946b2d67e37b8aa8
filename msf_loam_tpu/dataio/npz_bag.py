"""Multi-sensor stream container ("bag") + timestamp-ordered replay.

The rosbag replacement: the reference replays ``/velodyne_points``, ``/imu``
and ``/odometry_gt`` from a bag in offline mode (``msf_loam_node.cc:
442-460``) or subscribes online with backlog dropping (``laser_mapping.cc:
159-165``). Here a "bag" is one compressed npz holding the three streams;
``replay()`` yields messages in global timestamp order, and
``replay_realtime()`` simulates the online mode — messages arrive on the
wall clock and scan messages are DROPPED when the consumer falls behind
(the reference's load-shedding policy).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Iterator, List, Optional, Tuple, Union

import numpy as np


@dataclasses.dataclass
class ScanMsg:
    time: float
    xyz: np.ndarray       # (N, 3)
    ring: np.ndarray      # (N,)


@dataclasses.dataclass
class ImuMsg:
    time: float
    acc: np.ndarray       # (3,)
    gyr: np.ndarray       # (3,)


@dataclasses.dataclass
class OdomMsg:
    time: float
    t: np.ndarray         # (3,)
    q_wxyz: np.ndarray    # (4,)


Msg = Union[ScanMsg, ImuMsg, OdomMsg]


class BagWriter:
    def __init__(self) -> None:
        self._scan_t: List[float] = []
        self._scan_xyz: List[np.ndarray] = []
        self._scan_ring: List[np.ndarray] = []
        self._imu: List[Tuple[float, np.ndarray, np.ndarray]] = []
        self._odom: List[Tuple[float, np.ndarray, np.ndarray]] = []

    def add_scan(self, t: float, xyz: np.ndarray, ring: np.ndarray) -> None:
        self._scan_t.append(t)
        self._scan_xyz.append(np.asarray(xyz, np.float32))
        self._scan_ring.append(np.asarray(ring, np.int32))

    def add_imu(self, t: float, acc, gyr) -> None:
        self._imu.append((t, np.asarray(acc, np.float64),
                          np.asarray(gyr, np.float64)))

    def add_odom(self, t: float, trans, q_wxyz) -> None:
        self._odom.append((t, np.asarray(trans, np.float64),
                           np.asarray(q_wxyz, np.float64)))

    def save(self, path: str) -> None:
        # ragged scans stored flattened + offsets
        counts = np.asarray([len(x) for x in self._scan_xyz], np.int64)
        offsets = np.concatenate([[0], np.cumsum(counts)])
        payload = dict(
            scan_times=np.asarray(self._scan_t),
            scan_offsets=offsets,
            scan_xyz=(np.concatenate(self._scan_xyz)
                      if self._scan_xyz else np.zeros((0, 3), np.float32)),
            scan_ring=(np.concatenate(self._scan_ring)
                       if self._scan_ring else np.zeros((0,), np.int32)),
            imu_times=np.asarray([x[0] for x in self._imu]),
            imu_acc=np.asarray([x[1] for x in self._imu]).reshape(-1, 3),
            imu_gyr=np.asarray([x[2] for x in self._imu]).reshape(-1, 3),
            odom_times=np.asarray([x[0] for x in self._odom]),
            odom_t=np.asarray([x[1] for x in self._odom]).reshape(-1, 3),
            odom_q=np.asarray([x[2] for x in self._odom]).reshape(-1, 4),
        )
        np.savez_compressed(path, **payload)


class Bag:
    def __init__(self, path: str):
        self._z = np.load(path)

    @property
    def n_scans(self) -> int:
        return len(self._z["scan_times"])

    def scan(self, i: int) -> ScanMsg:
        o = self._z["scan_offsets"]
        return ScanMsg(
            time=float(self._z["scan_times"][i]),
            xyz=self._z["scan_xyz"][o[i]:o[i + 1]],
            ring=self._z["scan_ring"][o[i]:o[i + 1]],
        )

    def replay(self) -> Iterator[Msg]:
        """All messages in global timestamp order (offline mode,
        msf_loam_node.cc:448-459)."""
        z = self._z
        streams = [
            (z["scan_times"], "scan"),
            (z["imu_times"], "imu"),
            (z["odom_times"], "odom"),
        ]
        tagged = []
        for times, kind in streams:
            tagged.extend((float(t), kind, i) for i, t in enumerate(times))
        tagged.sort()
        for t, kind, i in tagged:
            if kind == "scan":
                yield self.scan(i)
            elif kind == "imu":
                yield ImuMsg(t, self._z["imu_acc"][i], self._z["imu_gyr"][i])
            else:
                yield OdomMsg(t, self._z["odom_t"][i], self._z["odom_q"][i])

    def replay_realtime(self, speed: float = 1.0,
                        busy_until=None) -> Iterator[Tuple[Msg, bool]]:
        """Online-mode simulation: yields (msg, dropped). A scan is marked
        dropped when the consumer (``busy_until() -> wall time``) is still
        behind when the next scan arrives — the reference's backlog policy
        (laser_mapping.cc:159-165). IMU messages are never dropped."""
        t0_wall = time.perf_counter()
        msgs = list(self.replay())
        if not msgs:
            return
        t0_msg = msgs[0].time
        for m in msgs:
            target = t0_wall + (m.time - t0_msg) / speed
            now = time.perf_counter()
            if now < target:
                time.sleep(target - now)
            dropped = False
            if isinstance(m, ScanMsg) and busy_until is not None:
                dropped = busy_until() > time.perf_counter()
            yield m, dropped


def bag_from_kitti(kitti_root: str, sequence: str, out_path: str,
                   n_rings: int = 64, max_frames: Optional[int] = None,
                   imu_rate: float = 0.0, latency: float = 0.0) -> None:
    """KITTI sequence -> bag (the kitti_helper.cc workflow, minus ROS).

    With ``imu_rate`` > 0 synthesizes a consistent gyro/accel stream by
    differentiating the ground-truth poses (KITTI odometry has no IMU).
    ``latency`` re-stamps scans like scripts/preprocess_bag_file.py.
    """
    from msf_loam_tpu.dataio.kitti import KittiSequence

    seq = KittiSequence(kitti_root, sequence, n_rings=n_rings)
    end = min(len(seq), max_frames or len(seq))
    w = BagWriter()
    for f in seq.frames(0, end):
        w.add_scan(f.time + latency, f.xyz, f.ring)
        if f.gt_pose is not None:
            from msf_loam_tpu.core.se3 import matrix_to_quat
            import jax.numpy as jnp
            q = np.asarray(matrix_to_quat(jnp.asarray(f.gt_pose[:3, :3])))
            w.add_odom(f.time, f.gt_pose[:3, 3], q)
    if imu_rate > 0 and seq.gt_poses is not None:
        _synthesize_imu(w, seq, end, imu_rate)
    w.save(out_path)


def _synthesize_imu(w: BagWriter, seq, end: int, rate: float,
                    gravity=np.array([0.0, 0.0, 9.81])) -> None:
    """Finite-difference GT poses into a plausible IMU stream."""
    import jax.numpy as jnp

    from msf_loam_tpu.core.se3 import (matrix_to_quat, quat_conjugate,
                                       quat_log, quat_multiply, quat_rotate)

    times = seq.times[:end]
    poses = seq.gt_poses[:end]
    if len(times) < 3:
        return
    # spline-free: sample piecewise-linear velocity/angular rate
    dt_frame = np.diff(times)
    v = np.diff(poses[:, :3, 3], axis=0) / dt_frame[:, None]
    t_imu = np.arange(times[0], times[-1], 1.0 / rate)
    for t in t_imu:
        i = min(int(np.searchsorted(times, t, side="right")) - 1,
                len(times) - 2)
        # angular velocity from relative rotation of the bracketing frames
        qi = matrix_to_quat(jnp.asarray(poses[i, :3, :3]))
        qj = matrix_to_quat(jnp.asarray(poses[i + 1, :3, :3]))
        w_body = np.asarray(quat_log(quat_multiply(quat_conjugate(qi), qj))) \
            / max(dt_frame[i], 1e-6)
        # acceleration: world accel (finite diff of v) + gravity, body frame
        a_world = ((v[min(i + 1, len(v) - 1)] - v[max(i - 1, 0)])
                   / max(times[min(i + 1, len(times) - 1)] - times[max(i - 1, 0)], 1e-6))
        acc_body = np.asarray(quat_rotate(quat_conjugate(qi),
                                          jnp.asarray(a_world + gravity)))
        w.add_imu(float(t), acc_body, w_body)
