"""Device check: the batched pipeline (vmapped Pallas kernels) must track
like the dense pipeline ON TPU.

The headline bench number is the batched mode; its lanes run the
pick-rounds kernel under vmap and the fused-table select_fit kernel on
device, while the CPU equality tests exercise the XLA paths. This script
runs B=2 lanes for 8 frames on the real chip and compares each lane's
trajectory against the dense SlamPipeline on the same scans.

Run (real TPU):  python scripts/verify_batched_tpu.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from msf_loam_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()

    from msf_loam_tpu.config import (FeatureConfig, MappingConfig,
                                     MsfLoamConfig)
    from msf_loam_tpu.core.pointcloud import RingImage
    from msf_loam_tpu.dataio import preprocess, synthetic
    from msf_loam_tpu.slam import batch_pipeline
    from msf_loam_tpu.slam.pipeline import SlamPipeline

    print(f"platform: {jax.devices()[0].platform}")
    T, B = 8, 2
    fcfg = FeatureConfig(max_points_per_ring=2048, max_less_flat=4096)
    cfg = MsfLoamConfig(
        features=fcfg,
        mapping=MappingConfig(map_table_size=1 << 12, map_cell_capacity=32,
                              max_query_points=2048, map_evict_period=0))
    imgs, gts = [], []
    for b in range(B):
        world = synthetic.World.corridor(seed=b, size=12.0)
        step = np.array([0.25, 0.05 * (b + 1), 0.0])
        si, sg = [], []
        for i in range(T):
            t = step * i
            xyz, ring = synthetic.simulate_scan(
                world, t, np.eye(3), n_rings=16, pts_per_ring=1800,
                noise=0.004, seed=10 * b + i)
            si.append(preprocess.preprocess_scan(xyz, ring, fcfg,
                                                 num_rings=16))
            sg.append(t)
        imgs.append(si)
        gts.append(sg)
    stack = lambda f: jnp.stack(
        [jnp.stack([f(imgs[b][t]) for b in range(B)]) for t in range(T)])
    ring_images = RingImage(xyz=stack(lambda im: im.xyz),
                            rel_time=stack(lambda im: im.rel_time),
                            mask=stack(lambda im: im.mask))
    state = batch_pipeline.init_batch_state(cfg, B, n_rings=16)
    state, poses = batch_pipeline.run_batch(cfg, state, ring_images)
    est = np.asarray(poses.t)                              # (T, B, 3)

    fails = 0
    for b in range(B):
        dense = SlamPipeline(cfg)
        for i in range(T):
            dense.process_ring_image(imgs[b][i], 0.1 * i)
        dt = np.asarray(dense.trajectory()[:, 1:4])
        err_vs_dense = np.linalg.norm(est[:, b] - dt, axis=1).max()
        err_vs_gt = np.linalg.norm(est[-1, b] - gts[b][-1])
        ok = err_vs_dense < 0.03 and err_vs_gt < 0.05
        print(f"lane {b}: max|batched-dense|={err_vs_dense:.4f} m, "
              f"final-vs-gt={err_vs_gt:.4f} m -> "
              f"{'PASS' if ok else 'FAIL'}")
        fails += 0 if ok else 1
    print("ALL PASS" if not fails else f"FAILED ({fails})")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
