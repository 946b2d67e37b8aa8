"""Device-utilization (roofline) accounting for the hot kernels.

VERDICT r3 next #1: ground the throughput claim in what fraction of the
chip each hot kernel uses. For each kernel we time a fused on-device loop
(anti-hoist perturbation, same methodology as scripts/profile_stages_fused
— the only trustworthy signal over the axon tunnel), compute the MINIMUM
HBM traffic its semantics require (useful bytes: operands read once +
results written once), and report achieved GB/s and GFLOP/s against chip
peaks. "Effective bandwidth" from minimum bytes is a lower bound on the
real traffic/time, so %peak numbers are conservative.

Peaks: TPU v5e (the "v5 lite" chip this repo benches on) — 819 GB/s HBM,
197 TFLOP/s bf16 / ~98 TFLOP/s f32 MXU (public spec sheet numbers).

Run standalone:        python roofline.py
Or inside the bench:   MSF_BENCH_ROOFLINE=1 python bench.py
"""

import json
import os
import sys
import time

import numpy as np

HBM_PEAK = 819e9          # bytes/s, TPU v5e
FLOPS_PEAK_F32 = 98e12    # MXU f32-effective
N_ITERS = 30


def _scan_time(name, body, init_carry, n_iters=N_ITERS, reps=3):
    import jax

    @jax.jit
    def run(carry):
        def step(c, _):
            return body(c)
        c, ss = jax.lax.scan(step, carry, None, length=n_iters)
        return ss

    out = run(init_carry)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run(init_carry)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / (reps * n_iters)


def report(n_rings=16, pts_per_ring=1800, file=sys.stderr, write_json=True):
    import jax
    import jax.numpy as jnp

    import bench as bench_mod
    from msf_loam_tpu.ops import gauss_newton as gn
    from msf_loam_tpu.ops import icp_residuals as icp
    from msf_loam_tpu.ops.select_fit import select_fit_pallas
    from msf_loam_tpu.slam import voxel_map

    fcfg, mcfg, ocfg, imgs = bench_mod.build_inputs(n_rings, pts_per_ring, 2)
    eps = jnp.float32(1e-37)
    rows = []

    # scaffold floor: the anti-hoist scan chain costs ~0.27 ms/step even
    # for a trivial body (measured r4 — carry dependency defeats step
    # overlap). Subtract it so per-kernel numbers aren't inflated.
    def floor_body(carry):
        x, acc = carry
        s = (x * 2.0 + 1.0)[0] * eps
        return (x + s, acc), s
    t_floor = _scan_time("floor", floor_body,
                         (jnp.zeros(8), jnp.float32(0)))

    # a bench-realistic surf map (dominant query load: Q=4096, P=32)
    rng = np.random.default_rng(0)
    m = voxel_map.create_map(mcfg.map_table_size, mcfg.map_cell_capacity,
                             mcfg.map_cell_size, mcfg.plane_resolution)
    big = jnp.asarray(rng.uniform(-20, 20, size=(120_000, 3), ).astype(np.float32))
    m = voxel_map.insert(m, big, jnp.ones(big.shape[0], bool))
    Q = mcfg.max_query_points
    q = jnp.asarray(rng.uniform(-18, 18, size=(Q, 3)).astype(np.float32))
    H, P = m.table_size, m.slab_capacity
    C = 8 * P

    # --- kernel 1: octant gather (planar layout) ----------------------
    def gather_body(carry):
        x, acc = carry
        cand = voxel_map.gather_candidates_planar(m, q + x, None)
        s = jnp.sum(cand[0, 0]) * eps
        return (x + s, acc), s
    dt = _scan_time("octant gather", gather_body,
                    (jnp.float32(0), jnp.float32(0)))
    # useful bytes: read 8 gathered slabs per query (3 planes) + write the
    # (3, Q, 8P) candidate tensor
    nbytes = 2 * 3 * Q * C * 4
    rows.append(("octant_gather(Q=%d,P=%d)" % (Q, P), dt, nbytes, 0))

    # --- kernel 1b: grouped two-level octant gather (r5 shipping path) —
    # queries clustered like a real scan (surfaces), grouped by base cell
    # via the downsample's 2-key sort, one slab fetch per GROUP
    from msf_loam_tpu.core.pointcloud import PointBatch
    from msf_loam_tpu.core.se3 import Pose
    from msf_loam_tpu.slam.pipeline import downsample_features_grouped
    centers = rng.uniform(-18, 18, size=(40, 3)).astype(np.float32)
    cl = (centers[rng.integers(0, 40, 2 * Q)]
          + rng.normal(0, 1.0, (2 * Q, 3))).astype(np.float32)
    pbq = PointBatch(xyz=jnp.asarray(cl), rel_time=jnp.zeros(2 * Q),
                     ring=jnp.zeros(2 * Q, jnp.int32),
                     mask=jnp.ones(2 * Q, bool))
    qg, groups = downsample_features_grouped(
        pbq, float(mcfg.plane_resolution), Q,
        Pose.identity().apply(pbq.xyz), float(mcfg.map_cell_size),
        mcfg.gather_groups)
    G = mcfg.gather_groups

    def gather2_body(carry):
        x, acc = carry
        cand = voxel_map.gather_candidates_rows_grouped(
            m, qg.xyz + x, groups.gid, groups.rep_pos)
        s = jnp.sum(cand[0, :1]) * eps
        return (x + s, acc), s
    dt = _scan_time("grouped 2-level gather", gather2_body,
                    (jnp.float32(0), jnp.float32(0)))
    # useful bytes: each GROUP's 8 slabs once + the (Q, 3*8P) expansion
    nbytes = (G * 8 * P * 3 + 2 * Q * C * 3) * 4
    rows.append(("grouped_gather(Q=%d,G=%d,P=%d)" % (Q, G, P), dt,
                 nbytes, 0))

    # --- kernel 2: fused selection + fit (Pallas) ---------------------
    candp = voxel_map.gather_candidates_planar(m, q, None)
    cell = m.cell_size

    def sf_body(carry):
        x, acc = carry
        fs = select_fit_pallas(candp, q + x, (cell * 0.5) ** 2, cell ** 2,
                               k=mcfg.knn, mode="plane2", min_count=mcfg.knn,
                               min_wide=mcfg.knn, tol=mcfg.plane_fit_tol)
        s = jnp.sum(fs.d2[:, 0]) * eps
        return (x + s, acc), s
    dt = _scan_time("select_fit", sf_body, (jnp.float32(0), jnp.float32(0)))
    # reads the candidate planes once; outputs are tiny
    nbytes = 3 * Q * C * 4 + Q * (mcfg.knn + 3 + 3 + 1) * 4
    # distance eval: C cands x (3 sub + 3 mul + 2 add) per query + fit
    nflops = Q * C * 8
    rows.append(("select_fit(Q=%d,C=%d)" % (Q, C), dt, nbytes, nflops))

    # --- kernel 3: batched GN (plane residuals, 6-state) --------------
    normals = rng.normal(size=(Q, 3)).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    pw = jnp.asarray(rng.normal(size=(Q, 3)).astype(np.float32) * 5)
    nrm = jnp.asarray(normals)
    valid = jnp.ones(Q, bool)
    from msf_loam_tpu.core.se3 import Pose

    def gn_body(carry):
        pose, acc = carry

        def build(p, v):
            pb = icp.plane_residuals(p, pw, pw, nrm, valid)
            return [pb], [gn.huber_weights(pb, mcfg.huber_delta)]

        out = gn.gauss_newton(build, pose, jnp.zeros(3, jnp.float32),
                              n_iters=mcfg.gn_iterations)
        s = jnp.sum(out.pose.t) * eps
        return (Pose(t=pose.t + s, q=pose.q), acc), s
    dt = _scan_time("gauss_newton", gn_body,
                    (Pose.identity(), jnp.float32(0)))
    it = mcfg.gn_iterations
    # per iter: residual+J build (~60 flop/row) + JTJ/JTr outer products
    # (6x6 + 6 per row) + reads of points/normals
    nflops = it * Q * (60 + 36 * 2 + 6 * 2)
    nbytes = it * Q * (3 + 3 + 3 + 1) * 4
    rows.append(("gauss_newton(N=%d,it=%d)" % (Q, it), dt, nbytes, nflops))

    out_rows = []
    print("# roofline (peaks: %.0f GB/s HBM, %.0f TFLOP/s f32; "
          "scaffold floor %.3f ms subtracted):"
          % (HBM_PEAK / 1e9, FLOPS_PEAK_F32 / 1e12, t_floor * 1e3),
          file=file)
    for name, dt, nbytes, nflops in rows:
        dt = max(dt - t_floor, 1e-6)
        gbs = nbytes / dt / 1e9
        gfs = nflops / dt / 1e9
        print("#   %-32s %7.3f ms  %7.1f GB/s (%4.1f%% HBM)  "
              "%8.1f GFLOP/s (%5.2f%% MXU)"
              % (name, dt * 1e3, gbs, 100 * gbs * 1e9 / HBM_PEAK,
                 gfs, 100 * gfs * 1e9 / FLOPS_PEAK_F32), file=file)
        out_rows.append({
            "kernel": name, "ms_minus_floor": round(dt * 1e3, 4),
            "bytes_min": nbytes, "flops_min": nflops,
            "achieved_GBps": round(gbs, 1),
            "pct_hbm_peak": round(100 * gbs * 1e9 / HBM_PEAK, 2),
            "achieved_GFLOPs": round(gfs, 1),
            "pct_mxu_peak": round(100 * gfs * 1e9 / FLOPS_PEAK_F32, 3),
        })
    payload = {
        "platform": jax.devices()[0].platform,
        "n_rings": n_rings,
        "scaffold_floor_ms": round(t_floor * 1e3, 4),
        "peaks": {"hbm_GBps": HBM_PEAK / 1e9,
                  "mxu_f32_TFLOPs": FLOPS_PEAK_F32 / 1e12},
        "kernels": out_rows,
    }
    if write_json:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "docs", "roofline.json")
        with open(path, "w") as f:
            json.dump(payload, f, indent=1)
        print(f"# wrote {path}", file=file)
    return payload


if __name__ == "__main__":
    from msf_loam_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()
    report(int(os.environ.get("MSF_BENCH_RINGS", "16")),
           int(os.environ.get("MSF_BENCH_PTS", "1800")))
