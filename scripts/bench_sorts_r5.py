"""Round-5 probes: where do extraction's and insert's sort/scatter costs
go at 64-ring scale, and what do the restructured forms cost?

  1. the 131k 3-operand lax.sort of the global less-flat voxel filter
     (ops.voxel.voxel_downsample_compact_idx) vs a per-ring LANE sort of
     the (R, W) image (sorting networks vectorize across rows)
  2. insert's two argsorts (batch dedup + slot rank) vs one 2-key sort
  3. the (Q,) cumsum/segment glue the grouped gather adds

Run on real TPU:  python scripts/bench_sorts_r5.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_ITERS = 30
R, W = 64, 2048
N = R * W


def main():
    import jax
    import jax.numpy as jnp

    from msf_loam_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()

    print("platform:", jax.devices()[0].platform)
    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.integers(-2**31, 2**31 - 1,
                                    size=(N,)).astype(np.int32))
    keys2 = jnp.asarray(rng.integers(-2**31, 2**31 - 1,
                                     size=(N,)).astype(np.int32))
    mask = jnp.asarray(rng.random(N) < 0.9)
    kimg = keys.reshape(R, W)
    mimg = mask.reshape(R, W)
    k4 = keys[:4096]
    m4 = mask[:4096]
    eps = jnp.int32(1)

    def timed(name, body):
        @jax.jit
        def run(c0):
            def step(ix, _):
                s = body(ix)
                # the body result feeds the carry: each step truly waits
                # for the previous body (no cross-step pipelining)
                nxt = (ix + eps + jnp.int32(s * 1e-30)) % jnp.int32(1000)
                return nxt, s
            return jax.lax.scan(step, c0, None, length=N_ITERS)[1]
        out = run(jnp.int32(0)); jax.block_until_ready(out)
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            out = run(jnp.int32(0))
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / (reps * N_ITERS) * 1e3
        print(f"{name:46s} {dt:8.3f} ms/call", flush=True)

    iota = jnp.arange(N, dtype=jnp.int32)

    timed("scaffold", lambda ix: jnp.float32(ix))

    def sort131k(ix):
        k = keys + ix
        ks, order, ms = jax.lax.sort(
            [k, iota, mask.astype(jnp.int32)], num_keys=1, is_stable=True)
        return jnp.float32(jnp.sum(ks[::97]) + jnp.sum(order[::97]) + jnp.sum(ms[::97]))
    timed("131k 3-operand 1-key sort", sort131k)

    def sort131k_2key(ix):
        k = keys + ix
        ks, k2s, order, ms = jax.lax.sort(
            [k, keys2, iota, mask.astype(jnp.int32)], num_keys=2,
            is_stable=True)
        return jnp.float32(jnp.sum(ks[::97]) + jnp.sum(k2s[::97]) + jnp.sum(order[::97]) + jnp.sum(ms[::97]))
    timed("131k 4-operand 2-key sort", sort131k_2key)

    iimg = jnp.broadcast_to(jnp.arange(W, dtype=jnp.int32)[None], (R, W))

    def sort_rows(ix):
        k = kimg + ix
        ks, order, ms = jax.lax.sort(
            [k, iimg, mimg.astype(jnp.int32)], num_keys=1, is_stable=True,
            dimension=1)
        return jnp.float32(jnp.sum(ks[:, ::31]) + jnp.sum(order[:, ::31]) + jnp.sum(ms[:, ::31]))
    timed("(64,2048) per-row 3-operand sort", sort_rows)

    def sort8k(ix):
        k = keys[:8192] + ix
        ks, order, ms = jax.lax.sort(
            [k, iota[:8192], mask[:8192].astype(jnp.int32)], num_keys=1,
            is_stable=True)
        return jnp.float32(jnp.sum(ks[::13]) + jnp.sum(order[::13]) + jnp.sum(ms[::13]))
    timed("8k 3-operand sort (downsample_features)", sort8k)

    def sort4k_2key(ix):
        k = k4 + ix
        ks, k2s, order, ms = jax.lax.sort(
            [k, keys2[:4096], iota[:4096], m4.astype(jnp.int32)],
            num_keys=2, is_stable=True)
        return jnp.float32(jnp.sum(ks[::13]) + jnp.sum(k2s[::13]) + jnp.sum(order[::13]) + jnp.sum(ms[::13]))
    timed("4k 2-key sort (insert fused dedup+rank)", sort4k_2key)

    def two_argsorts_4k(ix):
        k = k4 + ix
        o1 = jnp.argsort(k, stable=True)
        o2 = jnp.argsort(k + o1.astype(jnp.int32), stable=True)
        return jnp.float32(jnp.sum(o1[::13]) + jnp.sum(o2[::13]))
    timed("2x argsort 4k (insert today)", two_argsorts_4k)

    def seg_glue(ix):
        k = (k4 + ix) >> 20
        neq = jnp.concatenate([jnp.ones((1,), jnp.int32),
                               (k[1:] != k[:-1]).astype(jnp.int32)])
        gid = jnp.cumsum(neq) - 1
        return jnp.float32(jnp.sum(gid[::13]))
    timed("4k neq+cumsum group ids", seg_glue)

    def topk131(ix):
        k = keys + ix
        neg, _ = jax.lax.top_k(-k, 8192)
        return jnp.float32(jnp.sum(neg[::13]))
    timed("131k top_k(8192)", topk131)

    def scatter4k(ix):
        tgt = jnp.zeros((32768,), jnp.int32)
        out = tgt.at[(k4 + ix) & 32767].max(iota[:4096])
        return jnp.float32(jnp.sum(out[::97]))
    timed("4k scatter-max into 32k table", scatter4k)


if __name__ == "__main__":
    main()
