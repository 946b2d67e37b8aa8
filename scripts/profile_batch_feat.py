"""Where does BATCHED (vmapped) feature extraction lose vs single-stream?

Feature extraction is per-ring independent except the less-flat voxel
compaction, so a (B, R, W) batch can either vmap the whole thing or
flatten lanes into rings (B*R, W). This measures, in fused on-device
loops (the only trustworthy signal, CLAUDE.md):

  a) vmapped full extract_features          (production batch path)
  b) vmapped extraction minus the less-flat compaction
  c) flattened-(B*R) extraction minus less-flat
  d) vmapped less-flat compaction alone (voxel_downsample_compact_idx)

Run: python scripts/profile_batch_feat.py     (real TPU)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

B = int(os.environ.get("PBF_B", "8"))
N_RINGS = 16
PTS = 1800
N_ITERS = 20


def main():
    import jax
    import jax.numpy as jnp

    from msf_loam_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()

    from bench import build_inputs
    from msf_loam_tpu.config import FeatureConfig
    from msf_loam_tpu.ops import features as F
    from msf_loam_tpu.ops.voxel import voxel_downsample_compact_idx

    fcfg = FeatureConfig(max_points_per_ring=2048, max_less_flat=8192)
    _, _, _, imgs = build_inputs(N_RINGS, PTS, B)
    # B distinct scans as the B lanes
    img_b = jax.tree.map(lambda a: a[:B], imgs)
    print(f"platform: {jax.devices()[0].platform}  B={B} rings={N_RINGS}")

    def scan_time(name, body, init):
        @jax.jit
        def run(c):
            c, ss = jax.lax.scan(lambda c, _: body(c), c, None, length=N_ITERS)
            return ss
        out = run(init)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            out = run(init)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / (reps * N_ITERS) * 1e3
        print(f"{name:44s} {dt:8.3f} ms/step ({dt / B:6.3f} ms/lane)",
              flush=True)
        return dt

    eps = jnp.float32(1e-37)

    def vmap_full(carry):
        x, acc = carry
        f = jax.vmap(lambda im: F.extract_features(
            im, jnp.float32(0.0), fcfg))(img_b._replace(xyz=img_b.xyz + x))
        s = jnp.sum(f.corner_sharp.xyz) * eps
        return (x + s, acc + s), s

    def core_no_lf(im_xyz, im_mask):
        """curvature + sectors + gates + all pick rounds + pick gathers,
        on an (R', W) image — everything except the less-flat filter."""
        curv, eligible = F.compute_curvature(im_xyz, im_mask, fcfg)
        n_valid = jnp.sum(im_mask.astype(jnp.int32), axis=1)
        sector = F.assign_sectors(eligible, n_valid, fcfg)
        gap = F._gap_sq(im_xyz)
        pickable = eligible & ~F.unreliable_mask(im_xyz, im_mask, fcfg)
        gate_arr = F.corner_gate_array(curv, eligible, sector, fcfg)
        corner_gate = lambda c: c > gate_arr
        sharp, suppressed = F._pick_rounds(
            curv, pickable, sector, gap, fcfg,
            n_total=fcfg.sharp_per_sector, maximize=True,
            curv_gate=corner_gate, picks_per_round=1)
        rest, suppressed = F._pick_rounds(
            curv, pickable, sector, gap, fcfg,
            n_total=fcfg.less_sharp_per_sector - fcfg.sharp_per_sector,
            maximize=True, curv_gate=corner_gate, picks_per_round=6,
            suppressed0=suppressed)
        flat, _ = F._pick_rounds(
            curv, pickable, sector, gap, fcfg,
            n_total=fcfg.flat_per_sector, maximize=False,
            curv_gate=lambda c: c < fcfg.curvature_threshold,
            picks_per_round=1, suppressed0=suppressed)
        w = jnp.maximum(jnp.concatenate([sharp, rest, flat], 0), 0)
        pts = jnp.take_along_axis(
            im_xyz, w.transpose(1, 0, 2).reshape(im_xyz.shape[0], -1)[..., None],
            axis=1)
        return pts

    def vmap_no_lf(carry):
        x, acc = carry
        pts = jax.vmap(core_no_lf)(img_b.xyz + x, img_b.mask)
        s = jnp.sum(pts) * eps
        return (x + s, acc + s), s

    flat_xyz = img_b.xyz.reshape(B * N_RINGS, -1, 3)
    flat_mask = img_b.mask.reshape(B * N_RINGS, -1)

    def flat_no_lf(carry):
        x, acc = carry
        pts = core_no_lf(flat_xyz + x, flat_mask)
        s = jnp.sum(pts) * eps
        return (x + s, acc + s), s

    lf_xyz = img_b.xyz.reshape(B, -1, 3)
    lf_mask = img_b.mask.reshape(B, -1)

    def vmap_lf(carry):
        x, acc = carry
        idx, valid = jax.vmap(lambda p, m: voxel_downsample_compact_idx(
            p, m, fcfg.less_flat_leaf, fcfg.max_less_flat))(lf_xyz + x, lf_mask)
        s = jnp.sum(idx[:, 0]).astype(jnp.float32) * eps
        return (x + s * 0, acc), s.astype(jnp.float32)

    z = (jnp.float32(0), jnp.float32(0))
    scan_time("a) vmap extract_features (full)", vmap_full, z)
    scan_time("b) vmap extraction minus less-flat", vmap_no_lf, z)
    scan_time("c) flattened (B*R, W) minus less-flat", flat_no_lf, z)
    scan_time("d) vmap less-flat compact_idx", vmap_lf, z)


if __name__ == "__main__":
    main()
