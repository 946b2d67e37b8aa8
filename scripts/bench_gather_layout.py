"""Gather-layout microbench for the map query (dev tool).

The query's hot op is points[slots]: (Q*8) rows out of (H, P, 3) float32.
TPU gather cost is dominated by memory tiling of the operand's minor dims,
so the same logical gather can differ by large factors across layouts:

  a) (H, P, 3) f32   — current canonical layout (minor dim 3!)
  b) (H, P*3) f32    — same bytes, one lane-aligned row per slab
  c) (H, 128) f32    — padded to the 128-lane tile
  d) (H, P*3) bf16   — half the bytes (query-only copy; fits precision:
                       points span tens of meters -> bf16 ~3 cm; only
                       usable for candidate SELECTION, not the fit)

Each variant runs gather + d2 + top-k5 in a fused device loop.
Run: python scripts/bench_gather_layout.py   (real TPU)
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
    enable_compilation_cache()

    print("platform:", jax.devices()[0].platform)
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-20, 20, size=(H, P, 3)).astype(np.float32))
    slots = jnp.asarray(rng.integers(0, H, size=(Q, 8)).astype(np.int32))
    q = jnp.asarray(rng.uniform(-20, 20, size=(Q, 3)).astype(np.float32))
    eps = jnp.float32(1e-37)

    pts_flat = pts.reshape(H, P * 3)
    pts_pad = jnp.concatenate(
        [pts_flat, jnp.zeros((H, 128 - P * 3), jnp.float32)], axis=1)
    pts_bf16 = pts_flat.astype(jnp.bfloat16)

    def timed(name, body, *args):
        @jax.jit
        def run(x0):
            def step(x, _):
                s = body(x, *args)
                return x + s * eps, s
            return jax.lax.scan(step, x0, None, length=N_ITERS)[1]
        out = run(jnp.float32(0)); jax.block_until_ready(out)
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            out = run(jnp.float32(0))
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / (reps * N_ITERS) * 1e3
        print(f"{name:34s} {dt:8.3f} ms/call", flush=True)

    def d2_topk(cand, qq):
        d2 = jnp.sum((cand - qq[:, None, None, :]) ** 2, axis=-1)
        d2 = d2.reshape(Q, -1)
        neg, _ = jax.lax.top_k(-d2, 5)
        return jnp.sum(neg[0])

    def body_a(x):
        cand = pts[slots]                       # (Q, 8, P, 3)
        return d2_topk(cand, q + x)
    timed("a) gather (H,P,3) f32", body_a)

    def body_b(x):
        cand = pts_flat[slots].reshape(Q, 8, P, 3)
        return d2_topk(cand, q + x)
    timed("b) gather (H,P*3) f32", body_b)

    def body_c(x):
        cand = pts_pad[slots][..., :P * 3].reshape(Q, 8, P, 3)
        return d2_topk(cand, q + x)
    timed("c) gather (H,128)pad f32", body_c)

    def body_d(x):
        cand = pts_bf16[slots].astype(jnp.float32).reshape(Q, 8, P, 3)
        return d2_topk(cand, q + x)
    timed("d) gather (H,P*3) bf16->f32", body_d)

    # gather only (no d2/topk) to isolate the memory op
    def body_ga(x):
        cand = pts[slots]
        return jnp.sum(cand[0, 0, 0]) + x * 0
    timed("gather only (H,P,3)", body_ga)

    def body_gb(x):
        cand = pts_flat[slots]
        return jnp.sum(cand[0, 0]) + x * 0
    timed("gather only (H,P*3)", body_gb)


if __name__ == "__main__" and os.environ.get("EXTRA", "0") != "1":
    main()


def extra():
    """Second round: count-gather cost, small-operand gather, one-hot MXU
    gather, and bf16 d2 via matmul."""
    import jax
    import jax.numpy as jnp

    from msf_loam_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()
    print("platform:", jax.devices()[0].platform)
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-20, 20, size=(H, P, 3)).astype(np.float32))
    pts_flat = pts.reshape(H, P * 3)
    cnt = jnp.asarray(rng.integers(0, P, size=(H,)).astype(np.int32))
    slots = jnp.asarray(rng.integers(0, H, size=(Q, 8)).astype(np.int32))
    slots_small = jnp.asarray(rng.integers(0, 2048, size=(Q, 8)).astype(np.int32))
    small = jnp.asarray(rng.uniform(-20, 20, size=(2048, P * 3)).astype(np.float32))
    small_bf = small.astype(jnp.bfloat16)
    q = jnp.asarray(rng.uniform(-20, 20, size=(Q, 3)).astype(np.float32))
    eps = jnp.float32(1e-37)

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
        print(f"{name:40s} {dt:8.3f} ms/call", flush=True)

    timed("count gather (Q,8) int32",
          lambda x: jnp.sum(cnt[slots][0]).astype(jnp.float32) + x * 0)
    timed("points+count gathers",
          lambda x: (jnp.sum(pts_flat[slots][0, 0])
                     + jnp.sum(cnt[slots][0]).astype(jnp.float32)) + x * 0)
    timed("gather from (2048,96) small operand",
          lambda x: jnp.sum(small[slots_small][0, 0]) + x * 0)

    def onehot_gather(x):
        oh = (slots_small.reshape(-1)[:, None]
              == jnp.arange(2048)[None, :]).astype(jnp.bfloat16)
        out = jax.lax.dot_general(
            oh, small_bf, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return jnp.sum(out[0]) + x * 0
    timed("one-hot matmul gather (32k x 2048)", onehot_gather)

    # full query with sentinel-style occupancy (no count gather, one mask)
    def sentinel_query(x):
        cand = pts_flat[slots].reshape(Q, 8, P, 3)
        d2 = jnp.sum((cand - (q + x)[:, None, None, :]) ** 2, axis=-1)
        d2 = jnp.where(d2 <= 1.0, d2, jnp.float32(3e38)).reshape(Q, -1)
        neg, _ = jax.lax.top_k(-d2, 5)
        return jnp.sum(neg[0])
    timed("sentinel query (gather+d2+mask+topk)", sentinel_query)


if __name__ == "__main__" and os.environ.get("EXTRA", "0") == "1":
    extra()
