"""Protobuf trajectory/IMU record — wire-compatible with the reference.

The reference serializes ``proto::PbData`` (trajectory + IMU stream) to
``/tmp/trajectory.pbstream`` at shutdown (laser_mapping.cc:116-117) and the
calibration tool reads it back (calib_lidar_imu.cc:10-17). This package
carries the same schemas (``msg.proto``/``config.proto``, field-for-field
with the reference's ``proto/msg.proto``/``proto/config.proto``) and a
small codec bridging them to the npz trajectory artifacts.

Generated code is produced on demand with protoc (baked into the image);
``available()`` is False when generation fails and callers keep npz-only.
"""

from __future__ import annotations

import logging
import os
import subprocess
import sys
import threading
from typing import Dict, Optional

import numpy as np

logger = logging.getLogger("msf_loam_tpu")

_HERE = os.path.dirname(os.path.abspath(__file__))
_lock = threading.Lock()
_mods: Optional[tuple] = None


def _load():
    global _mods
    with _lock:
        if _mods is not None:
            return _mods
        gen = os.path.join(_HERE, "msg_pb2.py")
        if not os.path.exists(gen) or (
                os.path.getmtime(gen) < os.path.getmtime(
                    os.path.join(_HERE, "msg.proto"))):
            try:
                subprocess.run(
                    ["protoc", "--python_out=.", "msg.proto", "config.proto"],
                    cwd=_HERE, check=True, capture_output=True, timeout=60)
            except Exception as e:  # no protoc / failure -> unavailable
                logger.warning("protoc generation failed: %s", e)
                _mods = (None, None)
                return _mods
        if _HERE not in sys.path:
            sys.path.insert(0, _HERE)
        try:
            import config_pb2  # noqa: F401
            import msg_pb2
            _mods = (msg_pb2, config_pb2)
        except Exception as e:
            logger.warning("generated proto import failed: %s", e)
            _mods = (None, None)
        return _mods


def available() -> bool:
    return _load()[0] is not None


def _to_universal_ns100(t_seconds: np.ndarray) -> np.ndarray:
    """Seconds -> the reference's uint64 'universal' ticks (100 ns units,
    common/time.h UniversalTimeScaleClock semantics)."""
    return np.round(np.asarray(t_seconds, np.float64) * 1e7).astype(np.uint64)


def _from_universal(ticks) -> float:
    return float(ticks) / 1e7


def write_pbstream(path: str, times: np.ndarray, t: np.ndarray,
                   q_wxyz: np.ndarray,
                   imu: Optional[Dict[str, np.ndarray]] = None) -> None:
    """Serialize a PbData record (trajectory + optional IMU stream)."""
    msg_pb2, _ = _load()
    assert msg_pb2 is not None, "protobuf codec unavailable"
    d = msg_pb2.PbData()
    for i, ticks in enumerate(_to_universal_ns100(times)):
        od = d.odom_datas.add()
        od.timestamp = int(ticks)
        od.pose.translation.x = float(t[i, 0])
        od.pose.translation.y = float(t[i, 1])
        od.pose.translation.z = float(t[i, 2])
        od.pose.rotation.w = float(q_wxyz[i, 0])
        od.pose.rotation.x = float(q_wxyz[i, 1])
        od.pose.rotation.y = float(q_wxyz[i, 2])
        od.pose.rotation.z = float(q_wxyz[i, 3])
    if imu is not None:
        gyr = imu["angular_velocity"]
        acc = imu.get("linear_acceleration",
                      np.zeros_like(gyr))
        for i, ticks in enumerate(_to_universal_ns100(imu["times"])):
            im = d.imu_datas.add()
            im.timestamp = int(ticks)
            im.angular_velocity.x = float(gyr[i, 0])
            im.angular_velocity.y = float(gyr[i, 1])
            im.angular_velocity.z = float(gyr[i, 2])
            im.linear_acceleration.x = float(acc[i, 0])
            im.linear_acceleration.y = float(acc[i, 1])
            im.linear_acceleration.z = float(acc[i, 2])
    with open(path, "wb") as f:
        f.write(d.SerializeToString())


def read_pbstream(path: str) -> Dict[str, np.ndarray]:
    """Parse a PbData record into the npz-trajectory dict layout."""
    msg_pb2, _ = _load()
    assert msg_pb2 is not None, "protobuf codec unavailable"
    d = msg_pb2.PbData()
    with open(path, "rb") as f:
        d.ParseFromString(f.read())
    n = len(d.odom_datas)
    times = np.zeros(n)
    t = np.zeros((n, 3))
    q = np.zeros((n, 4))
    for i, od in enumerate(d.odom_datas):
        times[i] = _from_universal(od.timestamp)
        t[i] = [od.pose.translation.x, od.pose.translation.y,
                od.pose.translation.z]
        q[i] = [od.pose.rotation.w, od.pose.rotation.x,
                od.pose.rotation.y, od.pose.rotation.z]
    out = {"times": times, "translation": t, "rotation_wxyz": q}
    m = len(d.imu_datas)
    if m:
        it = np.zeros(m)
        gyr = np.zeros((m, 3))
        acc = np.zeros((m, 3))
        for i, im in enumerate(d.imu_datas):
            it[i] = _from_universal(im.timestamp)
            gyr[i] = [im.angular_velocity.x, im.angular_velocity.y,
                      im.angular_velocity.z]
            acc[i] = [im.linear_acceleration.x, im.linear_acceleration.y,
                      im.linear_acceleration.z]
        out.update({"imu_times": it, "imu_angular_velocity": gyr,
                    "imu_linear_acceleration": acc})
    return out
