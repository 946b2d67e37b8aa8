"""Round-5 gather microbench — CORRECTED for the r4 measurement trap.

bench_gather_layout.py (r3) kept the gather indices loop-INVARIANT inside
its anti-hoist scan, so XLA hoisted the gathers out of the loop and the
"layout makes no difference" conclusion measured only the d2/top-k tail.
Here every variant's indices depend on the loop carry (slots roll by a
carry-derived offset mod H, which preserves the duplicate structure), so
the gather truly re-runs every step.

Variants (Q=4096 queries x 8 octant slots, H=32768, P=32):
  a) planar (3,H,P)     — production layout: 3 gathers of (Q*8) P-rows
  b) rows   (H,3P)      — one 384 B row per slot fetch (3x fewer rows)
  c) rows + transpose   — (b) then rearrange to the planar (3,Q,8P) the
                          select_fit kernel consumes today
  d) rows   (H,128) pad — 128-lane-aligned rows
  e) grouped rows       — queries pre-grouped by base cell: gather G*8
                          rows once per GROUP (G~700), no per-query fetch
  f) e + one-hot expand — grouped gather + f32 one-hot MXU expansion back
                          to per-query (Q,8,3P) (exact: 0/1 weights)

Run on real TPU:  python scripts/bench_gather_r5.py
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
G = 1024          # static group budget for the grouped variants


def main():
    import jax
    import jax.numpy as jnp

    from msf_loam_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()

    print("platform:", jax.devices()[0].platform)
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-20, 20, size=(H, P, 3)).astype(np.float32))
    pts_planar = jnp.transpose(pts, (2, 0, 1))          # (3, H, P)
    pts_rows = pts.transpose(0, 2, 1).reshape(H, 3 * P)  # (H, [x*P y*P z*P])
    pts_pad = jnp.concatenate(
        [pts_rows, jnp.zeros((H, 128 - 3 * P), jnp.float32)], axis=1)

    # realistic duplicate structure: ~700 unique base cells, 8 octant slots
    # each, queries clustered ~6 per cell (matches the measured ~640 unique
    # slots per 32k fetches of the street-eval surf queries)
    n_cells = 700
    cell_slots = rng.integers(0, H, size=(n_cells, 8)).astype(np.int32)
    gid_np = np.sort(rng.integers(0, n_cells, size=(Q,)).astype(np.int32))
    slots_np = cell_slots[gid_np]                        # (Q, 8)
    slots = jnp.asarray(slots_np)
    gid = jnp.asarray(gid_np)
    # grouped representative slots, padded to the static G budget
    grp_slots = jnp.asarray(
        np.concatenate([cell_slots,
                        np.zeros((G - n_cells, 8), np.int32)], 0))  # (G, 8)
    eps = jnp.float32(1e-37)

    def timed(name, body):
        @jax.jit
        def run(c0):
            def step(carry, _):
                x, ix = carry
                s = body(x, ix)
                return (x + s * eps, (ix + 1) % H), s
            return jax.lax.scan(step, c0, None, length=N_ITERS)[1]
        c0 = (jnp.float32(0), jnp.int32(0))
        out = run(c0); jax.block_until_ready(out)
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            out = run(c0)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / (reps * N_ITERS) * 1e3
        print(f"{name:44s} {dt:8.3f} ms/call", flush=True)

    def roll(ix):
        # carry-dependent index shift: defeats hoisting, keeps duplicates
        return (slots + ix) % H

    def groll(ix):
        return (grp_slots + ix) % H

    timed("scaffold (no gather)",
          lambda x, ix: jnp.float32(ix % 3) + x * 0)

    timed("a) planar (3,H,P) 3x32k rows",
          lambda x, ix: jnp.sum(pts_planar[:, roll(ix)][:, 0, 0, :1]) + x * 0)

    timed("b) rows (H,3P) 32k rows",
          lambda x, ix: jnp.sum(pts_rows[roll(ix)][0, 0, :1]) + x * 0)

    def body_c(x, ix):
        cand = pts_rows[roll(ix)]                        # (Q, 8, 96)
        planar = cand.reshape(Q, 8, 3, P).transpose(2, 0, 1, 3)
        return jnp.sum(planar[:, 0, 0, :1]) + x * 0
    timed("c) rows + transpose to planar", body_c)

    timed("d) rows (H,128) padded",
          lambda x, ix: jnp.sum(pts_pad[roll(ix)][0, 0, :1]) + x * 0)

    timed("e) grouped rows (G*8 = 8k rows)",
          lambda x, ix: jnp.sum(pts_rows[groll(ix)][0, 0, :1]) + x * 0)

    def body_f(x, ix):
        grp = pts_rows[groll(ix)].reshape(G, 8 * 3 * P)  # (G, 768)
        onehot = (gid[:, None] == jnp.arange(G)[None, :]).astype(jnp.float32)
        cand = jax.lax.dot_general(
            onehot, grp, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (Q, 768)
        return jnp.sum(cand[0, :1]) + x * 0
    timed("f) grouped + f32 one-hot expand", body_f)

    # expansion-only (isolate the MXU cost of f)
    grp_static = pts_rows[grp_slots].reshape(G, 8 * 3 * P)

    def body_g(x, ix):
        onehot = (((gid + ix) % n_cells)[:, None]
                  == jnp.arange(G)[None, :]).astype(jnp.float32)
        cand = jax.lax.dot_general(
            onehot, grp_static, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return jnp.sum(cand[0, :1]) + x * 0
    timed("g) one-hot expand only (Qx G @ G x768)", body_g)

    # per-query Q-row gather from the small grouped buffer (the XLA-level
    # alternative to the one-hot expansion)
    def body_h(x, ix):
        cand = grp_static[(gid + ix) % n_cells]          # (Q, 768)
        return jnp.sum(cand[0, :1]) + x * 0
    timed("h) Q-row gather from (G,768)", body_h)


if __name__ == "__main__":
    main()
