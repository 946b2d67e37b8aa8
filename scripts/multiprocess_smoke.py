"""Two-process jax.distributed smoke test (multi-host simulation).

Validates parallel.runtime.initialize + a cross-process sharded computation
on CPU devices — the closest a single machine gets to a real multi-host
pod run. Launch: python scripts/multiprocess_smoke.py (spawns both ranks).
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORKER = r'''
import os, sys
sys.path.insert(0, os.environ["MSF_REPO"])
from msf_loam_tpu.parallel.runtime import initialize
ok = initialize()
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
import numpy as np

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8  # 2 procs x 4 local cpu devices

mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("data",))
sharding = NamedSharding(mesh, P("data"))

@jax.jit
def global_sum(x):
    return jnp.sum(x)

# build a process-local shard and assemble the global array
local = jnp.arange(4 * jax.process_index(), 4 * jax.process_index() + 4,
                   dtype=jnp.float32)
arrs = [jax.device_put(local[i:i+1], d)
        for i, d in enumerate(jax.local_devices())]
global_x = jax.make_array_from_single_device_arrays(
    (8,), sharding, arrs)
s = global_sum(global_x)
expected = sum(range(8))
assert float(s) == expected, (float(s), expected)

# --- the real config-5 path: sharded voxel map across BOTH processes ---
from msf_loam_tpu.parallel import mesh as mesh_mod, sharded_map
rng = np.random.default_rng(0)
mm = mesh_mod.make_mesh(n_map=8, n_data=1)
m = sharded_map.create_sharded_map(mm, 1 << 10, 8, 2.0, 0.4)
pts = jnp.asarray(rng.uniform(-5, 5, size=(512, 3)).astype(np.float32))
m = sharded_map.sharded_insert(mm, m, pts, jnp.ones(512, bool))
q = jnp.asarray(rng.uniform(-4, 4, size=(32, 3)).astype(np.float32))
d2, xyz, valid = sharded_map.sharded_query_knn(mm, m, q, jnp.ones(32, bool))
import jax as _jax
nn_found = int(_jax.device_get(
    _jax.jit(lambda v: jnp.sum(v))(valid)))
assert nn_found > 0

# --- full sharded SLAM pipeline frames across BOTH processes ---
# every rank runs the same program over the same host inputs; the map
# lives sharded across the global 8-device mesh and every frame runs
# extract + odometry + sharded insert/query + mapping GN
from msf_loam_tpu.config import FeatureConfig, MappingConfig, MsfLoamConfig
from msf_loam_tpu.dataio import preprocess, synthetic
from msf_loam_tpu.parallel.sharded_pipeline import ShardedSlamPipeline

cfg = MsfLoamConfig(
    features=FeatureConfig(max_points_per_ring=512, max_less_flat=1024),
    mapping=MappingConfig(map_table_size=1 << 10, map_cell_capacity=16,
                          max_query_points=256))
pipe = ShardedSlamPipeline(cfg, mm)
world = synthetic.World.corridor(seed=0, size=12.0)
for i in range(3):
    xyz, ring = synthetic.simulate_scan(
        world, np.array([0.1 * i, 0.0, 0.0]), np.eye(3), n_rings=8,
        pts_per_ring=360, noise=0.004, seed=i)
    img = preprocess.preprocess_scan(xyz, ring, cfg.features, num_rings=8)
    res = pipe.process_ring_image(img, 0.1 * i)
pose_t = np.asarray(res.map_pose.t)
assert np.isfinite(pose_t).all(), pose_t
# ~0.2 m of true motion must be recovered (not just "finite")
assert abs(pose_t[0] - 0.2) < 0.1, pose_t

# --- multi-process sharded checkpoint/resume (VERDICT r3 #8): every
# rank snapshots ITS addressable map shards, a fresh pipeline on the
# same global mesh restores them, and the resumed run must match the
# uninterrupted one ---
from msf_loam_tpu.slam import checkpoint as ckpt_mod
ck = os.path.join(os.environ["MSF_CKPT_DIR"], "sharded.npz")
ckpt_mod.save_sharded_checkpoint(pipe, ck)
extra = []
for i in (3, 4):
    xyz, ring = synthetic.simulate_scan(
        world, np.array([0.1 * i, 0.0, 0.0]), np.eye(3), n_rings=8,
        pts_per_ring=360, noise=0.004, seed=i)
    extra.append(preprocess.preprocess_scan(xyz, ring, cfg.features,
                                            num_rings=8))
for j, im in enumerate(extra):
    res_a = pipe.process_ring_image(im, 0.1 * (3 + j))
pose_a = np.asarray(res_a.map_pose.t)

pipe2 = ShardedSlamPipeline(cfg, mm)
ckpt_mod.load_sharded_checkpoint(pipe2, ck)
assert pipe2.frame_idx == 3
# resume needs the previous scan for scan-to-scan matching (same
# convention as the dense resume test)
from msf_loam_tpu.ops import features as feat_mod
pipe2.prev_scan = feat_mod.extract_features(img, jnp.float32(0.2),
                                            cfg.features)
for j, im in enumerate(extra):
    res_b = pipe2.process_ring_image(im, 0.1 * (3 + j))
pose_b = np.asarray(res_b.map_pose.t)
assert np.allclose(pose_a, pose_b, atol=1e-5), (pose_a, pose_b)

print("MULTIPROCESS_OK rank=%d sum=%d procs=%d devices=%d sharded_nn=%d "
      "pipeline_t=%.3f,%.3f,%.3f resume=ok" %
      (jax.process_index(), int(s), jax.process_count(), len(jax.devices()),
       nn_found, pose_t[0], pose_t[1], pose_t[2]),
      flush=True)
'''


def main():
    import tempfile
    env = dict(os.environ)
    env["MSF_REPO"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["MSF_CKPT_DIR"] = tempfile.mkdtemp(prefix="msf_mp_ck_")
    env["MSF_COORD"] = "localhost:12355"
    env["MSF_NUM_PROCESSES"] = "2"
    # must be in the spawn env: sitecustomize registers the axon TPU
    # backend at interpreter start, before worker code runs
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    procs = []
    for rank in range(2):
        e = dict(env)
        e["MSF_PROCESS_ID"] = str(rank)
        procs.append(subprocess.Popen([sys.executable, "-c", WORKER], env=e,
                                      stdout=subprocess.PIPE,
                                      stderr=subprocess.STDOUT))
    ok = True
    poses = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        text = out.decode()
        if p.returncode != 0:
            ok = False
            print(text[-2000:])
        elif "MULTIPROCESS_OK" in text and "resume=ok" in text:
            line = [ln for ln in text.strip().splitlines()
                    if "MULTIPROCESS_OK" in ln][-1]
            print(line)
            poses.append(line.split("pipeline_t=")[-1])
    # both ranks must report (incl. resume=ok) and agree on the sharded
    # pipeline's pose bit-for-bit
    if ok and (len(poses) != 2 or len(set(poses)) != 1):
        ok = False
        print("rank pose mismatch/missing:", poses)
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
