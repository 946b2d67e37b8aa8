"""Isolated A/B of the odo_corr kernel variants at bench shapes (dev
tool): cache_d2 (phase-C scratch reread) vs recompute, block sizes.

Run on real TPU:  python scripts/bench_odo_kernel.py
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from msf_loam_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()
    from msf_loam_tpu.ops.odo_corr import odo_corr_pallas
    print("platform:", jax.devices()[0].platform)
    rng = np.random.default_rng(0)
    for (N, M, K, tag) in [(1536, 8192, 16, "plane"), (768, 7680, 0, "edge")]:
        q = jnp.asarray(rng.uniform(-20, 20, (N, 3)).astype(np.float32))
        r = jnp.asarray(rng.uniform(-20, 20, (M, 3)).astype(np.float32))
        mask = jnp.ones(M, bool)
        ring = jnp.asarray(rng.integers(0, 64, M).astype(np.int32))
        for nb in (64, 128, 256):
            for cache in (True, False):
                @jax.jit
                def run(q0):
                    def step(x, _):
                        oc = odo_corr_pallas(q0 + x, r, mask, ring, K=K,
                                             nb=nb, cache_d2=cache)
                        s = oc.a_d2[0] * 1e-30
                        return x + s, s
                    return jax.lax.scan(step, jnp.float32(0), None, length=30)[1]
                out = run(q); jax.block_until_ready(out)
                t0 = time.perf_counter()
                for _ in range(3):
                    out = run(q)
                jax.block_until_ready(out)
                dt = (time.perf_counter() - t0) / 90 * 1e3
                print(f"{tag} nb={nb:3d} cache_d2={int(cache)}  {dt:7.3f} ms",
                      flush=True)

if __name__ == "__main__":
    main()
