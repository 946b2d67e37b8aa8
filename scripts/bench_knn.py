"""Compare kNN backends on the real TPU (dev tool)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from msf_loam_tpu.ops import knn as knn_xla
    from msf_loam_tpu.ops import pallas_knn
    from msf_loam_tpu.slam import voxel_map

    rng = np.random.default_rng(0)
    Q, M = 4096, 65536
    q = jnp.asarray(rng.uniform(-20, 20, size=(Q, 3)).astype(np.float32))
    r = jnp.asarray(rng.uniform(-20, 20, size=(M, 3)).astype(np.float32))
    rmask = jnp.ones(M, bool)
    print("platform:", jax.devices()[0].platform, f"Q={Q} M={M}")

    def timeit(f, *a, n=20, name=""):
        out = f(*a); jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(n): out = f(*a)
        jax.block_until_ready(out)
        print(f"{name:34s} {(time.perf_counter()-t0)/n*1e3:8.2f} ms")
        return out

    d_p, i_p = timeit(lambda: pallas_knn.knn_pallas(q, r, rmask, k=8), name="pallas fused knn k=8")
    d_x, i_x = timeit(lambda: knn_xla.knn(q, jnp.ones(Q, bool), r, rmask, k=8), name="xla blockwise knn k=8")
    np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_x), rtol=1e-3, atol=1e-3)
    print("pallas == xla distances OK")

    # hash-map query comparison at its natural scale
    m = voxel_map.create_map(1 << 15, 32, 2.0, 0.4)
    m = voxel_map.insert(m, r, rmask)
    timeit(lambda: voxel_map.query_knn(m, q, jnp.ones(Q, bool), k=5), name="hash-map query_knn k=5")
    d5_p, _ = timeit(lambda: pallas_knn.knn_pallas(q, r, rmask, k=5), name="pallas fused knn k=5")

if __name__ == "__main__":
    main()
