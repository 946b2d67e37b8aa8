"""Output artifacts: PLY map export and trajectory serialization.

Analogs of the reference's shutdown products (``laser_mapping.cc:89-120``):
the gravity-aligned ``msf_loam_cloud.ply`` point-cloud map and the
``/tmp/trajectory.pbstream`` protobuf record (``proto/msg.proto``) consumed
by the calibration tool. We serialize to ``.npz`` (same content, no
protobuf runtime needed on the hot path) and provide binary PLY export.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def save_ply(path: str, xyz: np.ndarray,
             intensity: Optional[np.ndarray] = None) -> None:
    """Binary little-endian PLY (pcl::io::savePLYFileBinary analog,
    laser_mapping.cc:108)."""
    n = xyz.shape[0]
    props = ["property float x", "property float y", "property float z"]
    if intensity is not None:
        props.append("property float intensity")
    header = "\n".join([
        "ply", "format binary_little_endian 1.0",
        f"element vertex {n}", *props, "end_header", ""])
    if intensity is not None:
        data = np.column_stack([xyz.astype("<f4"),
                                intensity.astype("<f4")]).astype("<f4")
    else:
        data = xyz.astype("<f4")
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        f.write(data.tobytes())


def load_ply(path: str) -> np.ndarray:
    """Read back a binary PLY written by save_ply (x, y, z only)."""
    with open(path, "rb") as f:
        header = b""
        while not header.endswith(b"end_header\n"):
            header += f.readline()
        lines = header.decode().splitlines()
        n = int(next(l.split()[-1] for l in lines if l.startswith("element vertex")))
        n_props = sum(1 for l in lines if l.startswith("property"))
        data = np.frombuffer(f.read(), dtype="<f4").reshape(n, n_props)
    return data[:, :3].copy()


def gravity_align(xyz: np.ndarray, gravity: np.ndarray) -> np.ndarray:
    """Rotate the cloud so gravity maps to +z (FromTwoVectors(G, UnitZ),
    laser_mapping.cc:97-104)."""
    import jax.numpy as jnp

    from msf_loam_tpu.core.se3 import quat_from_two_vectors, quat_to_matrix

    q = quat_from_two_vectors(jnp.asarray(gravity, dtype=jnp.float32),
                              jnp.asarray([0.0, 0.0, 1.0]))
    R = np.asarray(quat_to_matrix(q))
    return xyz @ R.T


def save_trajectory(path: str, times: np.ndarray, t: np.ndarray,
                    q_wxyz: np.ndarray,
                    imu: Optional[Dict[str, np.ndarray]] = None) -> None:
    """Trajectory (+optional IMU record) — the pbstream analog
    (PbData, proto/msg.proto:31-37)."""
    payload = dict(times=times, translation=t, rotation_wxyz=q_wxyz)
    if imu is not None:
        payload.update({f"imu_{k}": v for k, v in imu.items()})
    np.savez_compressed(path, **payload)


def load_trajectory(path: str) -> Dict[str, np.ndarray]:
    with np.load(path) as z:
        return {k: z[k] for k in z.files}
