"""One-level vs two-level octant gather at bench scale (dev tool).

Measures voxel_map.gather_candidates_planar vs gather_candidates_planar_2l
with the roofline anti-hoist scan loop (floor ~0.27 ms/step NOT
subtracted — compare deltas between rows, not absolutes).
Run: python scripts/bench_gather_2l.py   (real TPU)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_ITERS = 30
Q = 4096
H = 1 << 15
P = 32


def main():
    import jax
    import jax.numpy as jnp

    from msf_loam_tpu.core.cache import enable_compilation_cache
    from msf_loam_tpu.slam import voxel_map

    enable_compilation_cache()
    print("platform:", jax.devices()[0].platform)
    rng = np.random.default_rng(0)
    m = voxel_map.create_map(H, P, 2.0, 0.4)
    big = jnp.asarray(rng.uniform(-20, 20, size=(120_000, 3)).astype(np.float32))
    m = voxel_map.insert(m, big, jnp.ones(big.shape[0], bool))
    q = jnp.asarray(rng.uniform(-18, 18, size=(Q, 3)).astype(np.float32))
    eps = jnp.float32(1e-37)

    # how many unique slots does this query set touch?
    cells = voxel_map.neighbor_cells8(q, m.cell_size)
    slots = np.asarray(voxel_map._hash_cells(cells, H)).reshape(-1)
    print("unique slots:", len(np.unique(slots)), "of", slots.size)

    def timed(name, body):
        @jax.jit
        def run(x0):
            def step(x, _):
                s = body(x)
                return x + s * eps, s
            return jax.lax.scan(step, x0, None, length=N_ITERS)[1]
        out = run(jnp.float32(0)); jax.block_until_ready(out)
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            out = run(jnp.float32(0))
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / (reps * N_ITERS) * 1e3
        print(f"{name:44s} {dt:8.3f} ms/call", flush=True)
        return dt

    timed("one-level gather_candidates_planar",
          lambda x: jnp.sum(
              voxel_map.gather_candidates_planar(m, q + x, None)[0, 0]))
    for u_max in (1024, 2048, 4096):
        timed(f"two-level gather (u_max={u_max})",
              lambda x, u=u_max: jnp.sum(
                  voxel_map.gather_candidates_planar_2l(m, q + x, None,
                                                        u_max=u)[0, 0]))

    # isolate the dedupe machinery (scatter + cumsum rank, no point data, no point data)
    def dedupe_only(x):
        cells = voxel_map.neighbor_cells8(q + x, m.cell_size)
        s = voxel_map._hash_cells(cells, H).reshape(-1)
        uslots, remap = voxel_map._two_level_slots(s, H, 2048)
        return jnp.sum(uslots[0].astype(jnp.float32) + remap[0].astype(jnp.float32))
    timed("dedupe only (scatter+cumsum, u=2048)", dedupe_only)

    # realistic surface-clustered queries (scan points lie on 2-D
    # surfaces; volume-random queries overstate the unique-cell count)
    qs = np.empty((Q, 3), np.float32)
    third = Q // 3
    qs[:third] = np.stack([rng.uniform(-18, 18, third),
                           rng.uniform(-18, 18, third),
                           rng.normal(0, 0.05, third)], -1)
    qs[third:2 * third] = np.stack([rng.uniform(-18, 18, third),
                                    np.full(third, 8.0) + rng.normal(0, 0.05, third),
                                    rng.uniform(0, 6, third)], -1)
    qs[2 * third:] = np.stack([np.full(Q - 2 * third, -9.0) + rng.normal(0, 0.05, Q - 2 * third),
                               rng.uniform(-18, 18, Q - 2 * third),
                               rng.uniform(0, 6, Q - 2 * third)], -1)
    qs = jnp.asarray(qs)
    cells = voxel_map.neighbor_cells8(qs, m.cell_size)
    sl = np.asarray(voxel_map._hash_cells(cells, H)).reshape(-1)
    print("unique slots (surface queries):", len(np.unique(sl)), "of", sl.size)
    timed("one-level gather (surface queries)",
          lambda x: jnp.sum(
              voxel_map.gather_candidates_planar(m, qs + x, None)[0, 0]))
    for u_max in (1024, 2048):
        timed(f"two-level gather surface (u_max={u_max})",
              lambda x, u=u_max: jnp.sum(
                  voxel_map.gather_candidates_planar_2l(m, qs + x, None,
                                                        u_max=u)[0, 0]))

    # operand-size sensitivity, done RIGHT: query positions (hence slot
    # indices) must depend on the loop carry, or XLA hoists the gather out
    # of the scan and the probe times only the reduction (the measurement
    # trap recorded in docs/RESULTS.md / CLAUDE.md).
    for he in (12, 13, 14, 15):
        hh = 1 << he
        mh = voxel_map.create_map(hh, P, 2.0, 0.4)
        mh = voxel_map.insert(mh, big, jnp.ones(big.shape[0], bool))
        timed(f"one-level gather, table H=2^{he}",
              lambda x, mm=mh: jnp.sum(
                  voxel_map.gather_candidates_planar(mm, q + x, None)[0, 0]))


if __name__ == "__main__":
    main()
