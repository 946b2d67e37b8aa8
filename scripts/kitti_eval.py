"""KITTI-credible evaluation on synthetic urban drives (zero-egress stand-in
for the KITTI odometry benchmark the reference validates on, README.md:44-47).

Street-grid world (ground plane + segmented building facades + lamp poles),
HDL-64-style sensor (64 rings, 26.8 deg fov, 10 Hz), ground-vehicle motion
at ~10 m/s with fillet turns, km-scale routes. Reports ATE RMSE and the
KITTI devkit drift metrics (translation %/100 m, rotation deg/100 m over
100-800 m segments) per configuration.

  python scripts/kitti_eval.py --frames 1000 --configs odo,map,gps
  python scripts/kitti_eval.py --frames 600 --configs lio   (distorted+IMU)

Simulation is cached under --cache_dir (keyed by scene/sensor params), so
repeat runs only pay the SLAM compute.
"""

import argparse
import hashlib
import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SPEED = 10.0  # street-world defaults (KITTI-style drive)
ACCEL = 2.0   # standstill-to-cruise ramp
DT = 0.1

# per-world presets: (speed, accel, rings, fov_up, fov_down, turn_radius)
WORLDS = {
    "street": (SPEED, ACCEL, 64, 2.0, -24.8, 8.0),
    # handheld VLP-16 walk through World.nsh_campus (the reference's NSH
    # indoor-outdoor validation analog, README.md:40-43)
    "nsh": (1.5, 0.5, 16, 15.0, -15.0, 2.0),
}


def sim_params(args):
    # sim_version busts the frame cache when simulate_scan semantics change
    # (v2: distorted scans report returns in the capture-time sensor frame)
    d = dict(seed=args.seed, n_blocks=args.blocks, frames=args.frames,
             rings=args.rings, pts=args.pts, route=args.route,
             speed=args.speed, accel=args.accel, noise=args.noise,
             distorted=args.distorted)
    if args.world != "street":
        # keyed only for non-street worlds so pre-existing street caches
        # keep their hashes
        d.update(world=args.world, fov_up=args.fov_up,
                 fov_down=args.fov_down, sway=args.sway)
    if args.distorted:
        # v2: distorted scans report returns in the capture-time sensor
        # frame (undistorted output is identical across versions — those
        # caches keep their original key)
        d["sim_version"] = 2
    return d


def _sim_one(task):
    """Worker: simulate + save one frame (numpy only, no jax)."""
    (i, path_file, params, out_file) = task
    from msf_loam_tpu.dataio import synthetic
    blob = np.load(path_file, allow_pickle=False)
    p, R = blob["p"][i], blob["R"][i]
    kw = {}
    if params["distorted"]:
        kw = dict(linear_vel=blob["v_world"][i],
                  yaw_rate=float(blob["yaw_rate"][i]))
    if params.get("world", "street") == "nsh":
        world = synthetic.World.nsh_campus(seed=params["seed"])
    else:
        world = synthetic.World.street_grid(seed=params["seed"],
                                            n_blocks=params["n_blocks"])
    xyz, ring = synthetic.simulate_scan(
        world, p, R, n_rings=params["rings"], pts_per_ring=params["pts"],
        fov_up=params.get("fov_up", 2.0), fov_down=params.get("fov_down", -24.8),
        max_range=80.0, noise=params["noise"],
        seed=1000 + i, **kw)
    np.savez_compressed(out_file, xyz=xyz, ring=ring.astype(np.uint8))
    return i


def simulate_cached(args):
    """Returns (cache_dir, states dict) with every frame_XXXXX.npz present."""
    from msf_loam_tpu.dataio import synthetic
    params = sim_params(args)
    key = hashlib.sha1(json.dumps(params, sort_keys=True).encode()).hexdigest()[:12]
    cache = os.path.join(args.cache_dir, key)
    os.makedirs(cache, exist_ok=True)

    if args.world == "nsh":
        wps = synthetic.nsh_route()
    else:
        wps = synthetic.street_route(n_blocks=args.blocks, route=args.route)
    path = synthetic.VehiclePath.from_waypoints(
        wps, turn_radius=WORLDS[args.world][5])
    times = np.arange(args.frames) * DT
    need = float(synthetic.speed_profile(times[-1:], args.speed,
                                         args.accel)[0][0])
    if need > path.total_length:
        raise SystemExit(
            f"route too short: need {need:.0f} m, route {path.total_length:.0f} m"
            f" — raise --blocks or lower --frames")
    if args.sway:
        st = synthetic.walk_states(path, args.speed, times, accel=args.accel)
    else:
        st = synthetic.drive_states(path, args.speed, times, accel=args.accel)
    path_file = os.path.join(cache, "states.npz")
    np.savez(path_file, **st, times=times)

    todo = [i for i in range(args.frames)
            if not os.path.exists(os.path.join(cache, f"frame_{i:05d}.npz"))]
    if todo:
        print(f"simulating {len(todo)}/{args.frames} frames "
              f"({args.rings}x{args.pts}, route {path.total_length:.0f} m) ...",
              flush=True)
        tasks = [(i, path_file, params,
                  os.path.join(cache, f"frame_{i:05d}.npz")) for i in todo]
        t0 = time.perf_counter()
        ctx = mp.get_context("spawn")
        with ctx.Pool(args.sim_workers) as pool:
            for k, _ in enumerate(pool.imap_unordered(_sim_one, tasks, chunksize=4)):
                if (k + 1) % 50 == 0:
                    print(f"  {k + 1}/{len(todo)} "
                          f"({time.perf_counter() - t0:.0f}s)", flush=True)
        print(f"simulation done in {time.perf_counter() - t0:.0f}s", flush=True)
    return cache, st, path


def load_frame(cache, i):
    blob = np.load(os.path.join(cache, f"frame_{i:05d}.npz"))
    return blob["xyz"], blob["ring"].astype(np.int32)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--frames", type=int, default=1000)
    ap.add_argument("--world", default="street", choices=sorted(WORLDS),
                    help="street = KITTI-style urban drive (HDL-64); "
                         "nsh = indoor-outdoor campus walk (VLP-16)")
    ap.add_argument("--rings", type=int, default=None,
                    help="default: per-world (street 64, nsh 16)")
    ap.add_argument("--pts", type=int, default=1800)
    ap.add_argument("--blocks", type=int, default=5)
    ap.add_argument("--route", default="tour", choices=["tour", "lap"])
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--noise", type=float, default=0.01)
    ap.add_argument("--distorted", action="store_true",
                    help="simulate within-scan motion (rolling shutter); "
                         "required for the lio config")
    ap.add_argument("--configs", default="odo,map,gps",
                    help="comma list of odo,map,gps,lio,batch")
    ap.add_argument("--batch", type=int, default=4,
                    help="B concurrent sequences for the batch config "
                         "(each with its own street-grid world seed)")
    ap.add_argument("--batch_chunk", type=int, default=5,
                    help="frames per run_batch dispatch")
    ap.add_argument("--cache_dir", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".cache", "kitti_sim"))
    ap.add_argument("--sim_workers", type=int, default=4)
    ap.add_argument("--sim_only", action="store_true")
    ap.add_argument("--feature_overrides", default=None,
                    help="JSON dict of FeatureConfig field overrides "
                         "(ablations, e.g. '{\"corner_gate_factor\": 0}')")
    ap.add_argument("--odo_overrides", default=None,
                    help="JSON dict of OdometryConfig field overrides "
                         "(e.g. '{\"plane_corr\": \"triangle\"}')")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()
    configs = args.configs.split(",")
    if "lio" in configs and not args.distorted:
        args.distorted = True  # lio is only meaningful on distorted scans
    args.speed, args.accel, rings_d, args.fov_up, args.fov_down, _ = \
        WORLDS[args.world]
    if args.rings is None:
        args.rings = rings_d
    # handheld gait sway for the nsh walk — only where the simulator and
    # IMU synthesis stay exact (they model planar base motion)
    args.sway = (args.world == "nsh" and not args.distorted
                 and "lio" not in configs)

    cache, st, path = simulate_cached(args)
    if args.sim_only:
        print(json.dumps({"cache": cache, "frames": args.frames,
                          "route_m": round(path.total_length, 1)}))
        return

    import jax
    import jax.numpy as jnp

    from msf_loam_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()

    from msf_loam_tpu.apps.evaluate import _quat_wxyz_to_R, kitti_drift
    from msf_loam_tpu.config import (FeatureConfig, ImuConfig, MappingConfig,
                                     MsfLoamConfig, OdometryConfig)
    from msf_loam_tpu.core.se3 import Pose
    from msf_loam_tpu.dataio import preprocess, synthetic
    from msf_loam_tpu.ops import features as feat_mod
    from msf_loam_tpu.slam import odometry, posegraph
    from msf_loam_tpu.slam.pipeline import SlamPipeline, ate_rmse

    fkw = dict(max_points_per_ring=2048, max_less_flat=8192)
    if args.feature_overrides:
        fkw.update(json.loads(args.feature_overrides))
    fcfg = FeatureConfig(**fkw)
    # distorted scans: reproject with the constant-velocity motion prior
    # (real-sensor semantics; undistorted sims must NOT apply it)
    okw = dict(motion_deskew=args.distorted)
    if args.odo_overrides:
        okw.update(json.loads(args.odo_overrides))
    ocfg = OdometryConfig(**okw)
    cfg = MsfLoamConfig(
        features=fcfg, odometry=ocfg,
        mapping=MappingConfig(map_table_size=1 << 15, max_query_points=4096))
    n = args.frames
    # ground truth in the first-frame (SLAM origin) coordinate system — the
    # tour route happens to start at origin/identity, the lap route does not
    p0, R0 = st["p"][0], st["R"][0]
    gt_t = (st["p"][:n] - p0) @ R0
    gt_R = np.einsum("ji,njk->nik", R0, st["R"][:n])
    dist_m = float(np.linalg.norm(np.diff(gt_t, axis=0), axis=1).sum())
    print(f"platform {jax.devices()[0].platform}; {n} frames, "
          f"{dist_m:.0f} m", flush=True)

    results = {"frames": n, "trajectory_m": round(dist_m, 1),
               "sensor": f"{args.rings}x{args.pts}",
               "platform": jax.devices()[0].platform}

    def metrics(est_t, est_q, tag, elapsed):
        est_R = _quat_wxyz_to_R(np.asarray(est_q))
        d = kitti_drift(np.asarray(est_t), gt_t[:len(est_t)],
                        est_R, gt_R[:len(est_t)])
        out = {
            "ate_rmse_m": round(ate_rmse(np.asarray(est_t),
                                         gt_t[:len(est_t)], align=False), 3),
            "kitti_t_pct": d["t_pct"],
            "kitti_r_deg_per_100m": d["r_deg_per_100m"],
            "segments": d["segments"],
            "elapsed_s": round(elapsed, 1),
        }
        results[tag] = out
        print(tag + ":", json.dumps(out), flush=True)

    def frame_iter(label):
        t_last = time.perf_counter()
        for i in range(n):
            xyz, ring = load_frame(cache, i)
            img = preprocess.preprocess_scan(xyz, ring, fcfg,
                                             num_rings=args.rings)
            if i % 100 == 0:
                print(f"  [{label}] frame {i}/{n} "
                      f"({time.perf_counter() - t_last:.0f}s)", flush=True)
            yield i, img

    # (1) odometry only (scan-to-scan chain). On distorted scans the
    # matcher runs its IN-LOOP deskew (OdometryConfig.deskew, the A-LOAM
    # DISTORTION=1 TransformToStart the reference ships disabled): each
    # round the current scan reprojects with the LIVE estimate, so the
    # deskew error contracts. Measured and REJECTED earlier: the
    # stale-prior variant (deskew once with the previous step OUTSIDE the
    # matcher, then match rigidly) — without in-loop refresh the prior
    # feeds its own error forward and the chain diverges (13 -> 112
    # %/100m on this run).
    if "odo" in configs:
        import dataclasses as _dc2

        odo_cfg = (_dc2.replace(cfg.odometry, deskew=True)
                   if args.distorted else cfg.odometry)
        t0 = time.perf_counter()
        pose_w = Pose.identity()
        c2l = Pose.identity()
        est_t, est_q = [np.zeros(3)], [np.array([1.0, 0, 0, 0])]
        prev = None
        for i, img in frame_iter("odo"):
            feats = feat_mod.extract_features(img, jnp.float32(DT * i), fcfg)
            if prev is not None:
                out = odometry.match_scan2scan(prev, feats, c2l, odo_cfg)
                c2l = out.pose_curr2last
                pose_w = pose_w.compose(c2l)
                est_t.append(np.asarray(pose_w.t))
                est_q.append(np.asarray(pose_w.q))
            prev = feats
        metrics(np.asarray(est_t), np.asarray(est_q), "odometry_only",
                time.perf_counter() - t0)

    # (2) scan-to-map (feeds gps and loop); the loop config snapshots
    # keyframes during this same run
    traj = None
    keyframes = {}
    want_loop = "loop" in configs
    if want_loop and args.route != "lap" and args.world != "nsh":
        raise SystemExit("--configs loop requires --route lap or --world nsh "
                         "(a route with a genuine revisit)")
    if "map" in configs or "gps" in configs or want_loop:
        import dataclasses as _dc

        kf_stride = 10
        loop_cfg = _dc.replace(cfg, posegraph=_dc.replace(
            cfg.posegraph, loop_keyframe_stride=kf_stride,
            loop_max_dist=6.0, loop_min_index_gap=100))
        t0 = time.perf_counter()
        pipe = SlamPipeline(cfg)
        for i, img in frame_iter("map"):
            pipe.process_ring_image(img, DT * i)
            if want_loop and i % kf_stride == 0 and pipe.prev_scan is not None:
                keyframes[i] = jax.device_get(pipe.prev_scan)
        traj = pipe.trajectory()
        metrics(traj[:, 1:4], traj[:, 4:8], "scan_to_map",
                time.perf_counter() - t0)

    # (2b) + loop closure on the lap circuit (detect revisits among the
    # keyframes, scan-match loop edges, exact pose-graph solve)
    if want_loop and len(keyframes) >= 2:
        import logging

        from msf_loam_tpu.apps.run_slam import _close_loops

        t0 = time.perf_counter()
        poses = Pose(t=jnp.asarray(traj[:, 1:4], dtype=jnp.float32),
                     q=jnp.asarray(traj[:, 4:8], dtype=jnp.float32))
        data = posegraph.build_graph_data(
            jnp.asarray(traj[:, 0], dtype=jnp.float32), poses,
            jnp.zeros(1, jnp.float32), jnp.zeros((1, 3), jnp.float32),
            jnp.zeros(1, bool))  # inert GPS row: loop edges only
        n_real = len(traj)
        poses_p, data_p = posegraph.pad_graph(
            poses, data, posegraph.next_bucket(n_real))
        out, n_edges = _close_loops(
            loop_cfg, poses_p, data_p, traj, keyframes,
            logging.getLogger("kitti_eval"))
        traj_lc = traj.copy()
        traj_lc[:, 1:4] = np.asarray(out.poses.t[:n_real])
        traj_lc[:, 4:8] = np.asarray(out.poses.q[:n_real])
        metrics(traj_lc[:, 1:4], traj_lc[:, 4:8], "with_loop_closure",
                time.perf_counter() - t0)
        results["loop_edges"] = n_edges

    # (3) + GPS pose graph (1 Hz, 5 cm)
    if "gps" in configs:
        t0 = time.perf_counter()
        rng = np.random.default_rng(0)
        sel = np.arange(0, n, 10)
        gps_xyz = gt_t[sel] + rng.uniform(-0.05, 0.05, size=(len(sel), 3))
        poses = Pose(t=jnp.asarray(traj[:, 1:4], dtype=jnp.float32),
                     q=jnp.asarray(traj[:, 4:8], dtype=jnp.float32))
        data = posegraph.build_graph_data(
            jnp.asarray(traj[:, 0], dtype=jnp.float32), poses,
            jnp.asarray(traj[sel, 0], dtype=jnp.float32),
            jnp.asarray(gps_xyz, dtype=jnp.float32),
            jnp.ones(len(sel), bool))
        out = posegraph.optimize(poses, data, cfg.posegraph, n_iters=10)
        metrics(np.asarray(out.poses.t), np.asarray(out.poses.q),
                "with_gps_graph", time.perf_counter() - t0)

    # (4) LIO on distorted scans with the exact synthetic IMU stream
    if "lio" in configs:
        t0 = time.perf_counter()
        lio_cfg = MsfLoamConfig(
            features=fcfg, odometry=ocfg,
            mapping=MappingConfig(map_table_size=1 << 15,
                                  max_query_points=4096),
            imu=ImuConfig(init_frames=30, warmup_msgs=50))
        pipe = SlamPipeline(lio_cfg)
        tt, acc, gyr = synthetic.synthetic_imu(
            path, args.speed, -0.5, n * DT + 0.3, rate=400.0,
            accel=args.accel)
        # feed IMU stream interleaved ahead of each scan
        j = 0
        for i, img in frame_iter("lio"):
            ts = DT * i
            while j < len(tt) and tt[j] <= ts + DT:
                pipe.add_imu(tt[j], acc[j], gyr[j])
                j += 1
            pipe.process_ring_image(img, ts)
        traj_l = pipe.trajectory()
        metrics(traj_l[:, 1:4], traj_l[:, 4:8], "lio_distorted",
                time.perf_counter() - t0)
        results["lio_initialized"] = bool(pipe.is_initialized)

    # (5) B concurrent sequences in one device program (slam/batch_pipeline):
    # each lane drives the same route through a DIFFERENT street-grid world
    # (seed+b), so per-lane accuracy proves no cross-sequence leakage.
    if "batch" in configs:
        from msf_loam_tpu.slam import batch_pipeline

        B = args.batch
        caches = []
        for b in range(B):
            a2 = argparse.Namespace(**vars(args))
            a2.seed = args.seed + b
            c, _, _ = simulate_cached(a2)
            caches.append(c)
        bcfg = MsfLoamConfig(
            features=fcfg, odometry=ocfg,
            mapping=MappingConfig(map_table_size=1 << 15,
                                  max_query_points=4096))
        state = batch_pipeline.init_batch_state(bcfg, B, n_rings=args.rings)
        t0 = time.perf_counter()
        est_t, est_q = [], []
        for s0 in range(0, n, args.batch_chunk):
            T = min(args.batch_chunk, n - s0)
            frames = []
            for i in range(s0, s0 + T):
                per_b = []
                for b in range(B):
                    xyz, ring = load_frame(caches[b], i)
                    per_b.append(preprocess.preprocess_scan(
                        xyz, ring, fcfg, num_rings=args.rings))
                frames.append(jax.tree.map(
                    lambda *xs: jnp.stack(xs), *per_b))
            ring_images = jax.tree.map(lambda *xs: jnp.stack(xs), *frames)
            state, poses = batch_pipeline.run_batch(bcfg, state, ring_images)
            est_t.append(np.asarray(poses.t))
            est_q.append(np.asarray(poses.q))
            if s0 % 100 < args.batch_chunk:
                print(f"  [batch] frame {s0}/{n} "
                      f"({time.perf_counter() - t0:.0f}s)", flush=True)
        elapsed = time.perf_counter() - t0
        est_t = np.concatenate(est_t)   # (n, B, 3)
        est_q = np.concatenate(est_q)
        per_seq = []
        for b in range(B):
            R = _quat_wxyz_to_R(est_q[:, b])
            d = kitti_drift(est_t[:, b], gt_t, R, gt_R)
            per_seq.append({
                "ate_rmse_m": round(ate_rmse(est_t[:, b], gt_t,
                                             align=False), 3),
                "kitti_t_pct": d["t_pct"],
            })
        results["batched"] = {
            "B": B,
            "aggregate_scans_per_sec": round(n * B / elapsed, 1),
            "elapsed_s": round(elapsed, 1),
            "per_sequence": per_seq,
        }
        print("batched:", json.dumps(results["batched"]), flush=True)

    print(json.dumps(results))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
