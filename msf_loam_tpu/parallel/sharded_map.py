"""Device-sharded voxel hash map: map-parallel insert + query.

The "sharded mapping" configuration of BASELINE.json (map-block partition
across devices). The hash-table axis H of ``slam.voxel_map.VoxelHashMap``
is split over the mesh's ``map`` axis; each device owns the slot range
[d*H/D, (d+1)*H/D):

* **insert** — every device sees the full scan, keeps only the points whose
  target slot it owns, and inserts locally. Zero communication (the scatter
  IS the routing).
* **query**  — queries are replicated; each device answers k-NN from its
  shard (non-owned neighbor cells are masked out) and the per-device
  candidate sets merge with an ``all_gather`` over the map axis followed by
  a local top-k. k-NN is associative under top-k merge, so the result is
  exactly the single-device answer.

Replaces: HybridGrid sharding has no reference analog (single-process,
SURVEY.md §2.9) — the semantics mirrored are hybrid_grid.cc:462-534 per
shard.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from msf_loam_tpu.slam import voxel_map as vm
from msf_loam_tpu.slam.voxel_map import (VoxelHashMap, _hash_cells,
                                         neighbor_cells8)

Array = jax.Array


def create_sharded_map(mesh: Mesh, table_size: int, slab_capacity: int,
                       cell_size: float, leaf: float) -> VoxelHashMap:
    """Create a map whose hash-table axis is sharded over mesh axis 'map'."""
    n_shards = mesh.shape["map"]
    if table_size % n_shards != 0:
        raise ValueError(
            f"map_table_size={table_size} must divide evenly over the "
            f"{n_shards}-way 'map' mesh axis (got remainder "
            f"{table_size % n_shards}); slot ownership ranges would "
            f"misalign with the sharded layout")
    m = vm.create_map(table_size, slab_capacity, cell_size, leaf)
    shard = NamedSharding(mesh, P("map"))
    rep = NamedSharding(mesh, P())
    return VoxelHashMap(
        points=jax.device_put(m.points, shard),
        leaf_key=jax.device_put(m.leaf_key, shard),
        count=jax.device_put(m.count, shard),
        n_obs=jax.device_put(m.n_obs, shard),
        cell_size=jax.device_put(m.cell_size, rep),
        leaf=jax.device_put(m.leaf, rep),
    )


@functools.lru_cache(maxsize=64)
def _insert_program(mesh: Mesh, H: int, h_local: int):
    """Build (once per mesh/table-shape) the jitted sharded-insert program.
    Caching keeps a stable function identity so jax's compile cache hits —
    rebuilding the shard_map per call recompiles every time."""

    @jax.jit
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P("map", None, None), P("map", None), P("map"),
                  P("map", None), P(), P(), P(), P()),
        out_specs=(P("map", None, None), P("map", None), P("map"),
                   P("map", None)),
    )
    def _insert(points, leaf_key, count, n_obs, cell_size, leaf, pts, pmask):
        shard_id = jax.lax.axis_index("map")
        local = VoxelHashMap(points, leaf_key, count, n_obs, cell_size, leaf)
        cells = jnp.floor(pts / cell_size).astype(jnp.int32)
        slot = _hash_cells(cells, H)
        own = (slot >= shard_id * h_local) & (slot < (shard_id + 1) * h_local)
        # insert with LOCAL slot ids: shift the hash into shard-local space
        out = vm.insert_at_slots(local, pts, pmask & own,
                                 slot - shard_id * h_local)
        return out.points, out.leaf_key, out.count, out.n_obs

    return _insert


def sharded_insert(mesh: Mesh, vmap_state: VoxelHashMap, xyz: Array,
                   mask: Array) -> VoxelHashMap:
    """Insert world points into the sharded map (owner-routes scatter)."""
    H = vmap_state.table_size
    h_local = H // mesh.shape["map"]
    fn = _insert_program(mesh, H, h_local)
    points, leaf_key, count, n_obs = fn(
        vmap_state.points, vmap_state.leaf_key, vmap_state.count,
        vmap_state.n_obs, vmap_state.cell_size, vmap_state.leaf, xyz, mask)
    return vmap_state._replace(points=points, leaf_key=leaf_key, count=count,
                               n_obs=n_obs)


@functools.lru_cache(maxsize=64)
def _evict_program(mesh: Mesh):
    """Jitted sharded evict-far pass: vm.evict_far is per-slot elementwise
    (+ per-slab compaction sort), so it maps over the 'map' axis with zero
    communication."""

    @jax.jit
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P("map", None, None), P("map", None), P("map"),
                  P("map", None), P(), P(), P(), P()),
        out_specs=(P("map", None, None), P("map", None), P("map"),
                   P("map", None)),
    )
    def _evict(points, leaf_key, count, n_obs, cell_size, leaf, center,
               radius):
        local = VoxelHashMap(points, leaf_key, count, n_obs, cell_size, leaf)
        out = vm.evict_far(local, center, radius)
        return out.points, out.leaf_key, out.count, out.n_obs

    return _evict


def sharded_evict_far(mesh: Mesh, vmap_state: VoxelHashMap, center: Array,
                      radius: float) -> VoxelHashMap:
    """Drop stored points beyond ``radius`` of center, per shard (no
    collectives). Long-trajectory analog of SlamPipeline's periodic
    vm.evict_far — without it the sharded tables fill monotonically and
    collisions degrade kNN quality."""
    fn = _evict_program(mesh)
    points, leaf_key, count, n_obs = fn(
        vmap_state.points, vmap_state.leaf_key, vmap_state.count,
        vmap_state.n_obs, vmap_state.cell_size, vmap_state.leaf,
        jnp.asarray(center, jnp.float32), jnp.float32(radius))
    return vmap_state._replace(points=points, leaf_key=leaf_key, count=count,
                               n_obs=n_obs)


@functools.lru_cache(maxsize=64)
def _query_program(mesh: Mesh, H: int, h_local: int, k: int):
    """Jitted sharded-query program, cached per (mesh, shape, k).

    Each shard answers top-k from its own slot range and returns its
    candidate set with a leading per-shard axis (out_specs P('map') — the
    output genuinely varies per device, so the program is VMA-clean with
    the checker ON); the cross-shard top-k merge runs replicated OUTSIDE
    the shard_map, where XLA inserts the gather. k-NN is associative under
    top-k merge, so the result is exactly the single-device answer.
    """
    n_shards = mesh.shape["map"]

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P("map", None, None), P("map", None), P("map"),
                  P(), P(), P()),
        out_specs=(P("map", None, None), P("map", None, None, None)),
    )
    def _local_query(points, leaf_key, count, cell_size, leaf, q):
        shard_id = jax.lax.axis_index("map")
        Q = q.shape[0]
        P_ = points.shape[1]
        ncells = neighbor_cells8(q, cell_size)               # (Q, 8, 3)
        slots = _hash_cells(ncells, H)                       # (Q, 8) global
        own = (slots >= shard_id * h_local) & (slots < (shard_id + 1) * h_local)
        lslots = jnp.clip(slots - shard_id * h_local, 0, h_local - 1)
        cand = points[lslots]                                # (Q, 8, P, 3)
        occup = (jnp.arange(P_)[None, None, :] < count[lslots][:, :, None]) \
            & own[:, :, None]
        diff = cand - q[:, None, None, :]
        d2 = jnp.sum(diff * diff, axis=-1)
        radius_sq = (cell_size * 0.5) ** 2
        keep = occup & (d2 <= radius_sq)
        d2 = jnp.where(keep, d2, jnp.float32(3e38)).reshape(Q, -1)
        neg_top, arg = jax.lax.top_k(-d2, k)
        local_d2 = -neg_top                                  # (Q, k)
        local_xyz = jnp.take_along_axis(
            cand.reshape(Q, -1, 3), arg[..., None], axis=1)  # (Q, k, 3)
        return local_d2[None], local_xyz[None]

    @jax.jit
    def _query(points, leaf_key, count, cell_size, leaf, q, qmask):
        Q = q.shape[0]
        all_d2, all_xyz = _local_query(points, leaf_key, count, cell_size,
                                       leaf, q)              # (D,Q,k), (D,Q,k,3)
        all_d2 = jnp.moveaxis(all_d2, 0, 1).reshape(Q, n_shards * k)
        all_xyz = jnp.moveaxis(all_xyz, 0, 1).reshape(Q, n_shards * k, 3)
        neg_top, arg = jax.lax.top_k(-all_d2, k)
        top_d2 = -neg_top
        top_xyz = jnp.take_along_axis(all_xyz, arg[..., None], axis=1)
        valid = (top_d2 < 1e37) & qmask[:, None]
        return top_d2, top_xyz, valid

    return _query


def sharded_query_knn(mesh: Mesh, vmap_state: VoxelHashMap, query: Array,
                      query_mask: Array, k: int = 5
                      ) -> Tuple[Array, Array, Array]:
    """k-NN against the sharded map; exact via per-shard top-k + all_gather
    merge over the ICI."""
    H = vmap_state.table_size
    h_local = H // mesh.shape["map"]
    fn = _query_program(mesh, H, h_local, k)
    return fn(vmap_state.points, vmap_state.leaf_key, vmap_state.count,
              vmap_state.cell_size, vmap_state.leaf, query, query_mask)


@functools.lru_cache(maxsize=64)
def _query2_program(mesh: Mesh, H: int, h_local: int, k: int, k2: int):
    """Two-radius sharded query (voxel_map.query_knn_2r semantics): each
    shard returns its strict top-k (radius cell/2) AND wide top-k2 (radius
    cell) from one 8-cell gather; both candidate sets merge replicated
    outside the shard_map. Same associativity argument as _query_program."""
    n_shards = mesh.shape["map"]

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P("map", None, None), P("map", None), P("map"),
                  P(), P(), P()),
        out_specs=(P("map", None, None), P("map", None, None, None),
                   P("map", None, None), P("map", None, None, None)),
    )
    def _local_query(points, leaf_key, count, cell_size, leaf, q):
        shard_id = jax.lax.axis_index("map")
        Q = q.shape[0]
        P_ = points.shape[1]
        ncells = neighbor_cells8(q, cell_size)
        slots = _hash_cells(ncells, H)
        own = (slots >= shard_id * h_local) & (slots < (shard_id + 1) * h_local)
        lslots = jnp.clip(slots - shard_id * h_local, 0, h_local - 1)
        cand = points[lslots]
        occup = (jnp.arange(P_)[None, None, :] < count[lslots][:, :, None]) \
            & own[:, :, None]
        diff = cand - q[:, None, None, :]
        d2 = jnp.sum(diff * diff, axis=-1)
        flat = cand.reshape(Q, -1, 3)
        keep = occup & (d2 <= (cell_size * 0.5) ** 2)
        keep_w = occup & (d2 <= cell_size ** 2)
        d2s = jnp.where(keep, d2, jnp.float32(3e38)).reshape(Q, -1)
        d2w = jnp.where(keep_w, d2, jnp.float32(3e38)).reshape(Q, -1)
        neg_top, arg = jax.lax.top_k(-d2s, k)
        xyz_s = jnp.take_along_axis(flat, arg[..., None], axis=1)
        neg_w, arg_w = jax.lax.top_k(-d2w, k2)
        xyz_w = jnp.take_along_axis(flat, arg_w[..., None], axis=1)
        return -neg_top[None], xyz_s[None], -neg_w[None], xyz_w[None]

    @jax.jit
    def _query(points, leaf_key, count, cell_size, leaf, q, qmask):
        Q = q.shape[0]
        s_d2, s_xyz, w_d2, w_xyz = _local_query(points, leaf_key, count,
                                                cell_size, leaf, q)

        def merge(all_d2, all_xyz, kk):
            d2m = jnp.moveaxis(all_d2, 0, 1).reshape(Q, n_shards * kk)
            xyzm = jnp.moveaxis(all_xyz, 0, 1).reshape(Q, n_shards * kk, 3)
            neg_top, arg = jax.lax.top_k(-d2m, kk)
            top_d2 = -neg_top
            top_xyz = jnp.take_along_axis(xyzm, arg[..., None], axis=1)
            return top_d2, top_xyz, (top_d2 < 1e37) & qmask[:, None]

        d2, xyz, valid = merge(s_d2, s_xyz, k)
        d2w, xyzw, validw = merge(w_d2, w_xyz, k2)
        return d2, xyz, valid, d2w, xyzw, validw

    return _query


def sharded_query_knn_2r(mesh: Mesh, vmap_state: VoxelHashMap, query: Array,
                         query_mask: Array, k: int = 5, k2: int = 16):
    """Two-radius k-NN against the sharded map (voxel_map.query_knn_2r
    semantics: strict top-k within cell/2 plus wide top-k2 enrichment)."""
    H = vmap_state.table_size
    h_local = H // mesh.shape["map"]
    fn = _query2_program(mesh, H, h_local, k, k2)
    return fn(vmap_state.points, vmap_state.leaf_key, vmap_state.count,
              vmap_state.cell_size, vmap_state.leaf, query, query_mask)


@functools.lru_cache(maxsize=64)
def _query_pair_program(mesh: Mesh, H: int, h_local: int, Qc: int, Qs: int,
                        k: int, k2: int):
    """Corner k-NN + surf two-radius k-NN in ONE shard_map whose per-shard
    candidate sets pack into a single flat buffer — ONE all-gather per
    association round instead of six (the collective-budget cut of VERDICT
    r3 weak #4: the matcher's two separate query programs emitted one
    gather per output tensor; at 2 rounds/frame that was 12 small
    collectives per frame riding ICI latency, now 2)."""
    n_shards = mesh.shape["map"]
    seg_c = (Qc * k, Qc * k * 3)           # corner d2, corner xyz
    seg_s = (Qs * k, Qs * k * 3)           # surf strict d2/xyz
    seg_w = (Qs * k2, Qs * k2 * 3)         # surf wide d2/xyz

    def _local_topk(points, count, cell_size, q, ks, radii_sq):
        """Per-shard 8-cell candidate top-k at one or two radii; returns
        [(d2, xyz), ...] aligned with (ks, radii_sq)."""
        shard_id = jax.lax.axis_index("map")
        Q = q.shape[0]
        P_ = points.shape[1]
        ncells = neighbor_cells8(q, cell_size)
        slots = _hash_cells(ncells, H)
        own = (slots >= shard_id * h_local) & \
            (slots < (shard_id + 1) * h_local)
        lslots = jnp.clip(slots - shard_id * h_local, 0, h_local - 1)
        cand = points[lslots]                                # (Q, 8, P, 3)
        occup = (jnp.arange(P_)[None, None, :] < count[lslots][:, :, None]) \
            & own[:, :, None]
        diff = cand - q[:, None, None, :]
        d2 = jnp.sum(diff * diff, axis=-1)
        flat = cand.reshape(Q, -1, 3)
        outs = []
        for kk, r_sq in zip(ks, radii_sq):
            keep = occup & (d2 <= r_sq)
            d2m = jnp.where(keep, d2, jnp.float32(3e38)).reshape(Q, -1)
            neg_top, arg = jax.lax.top_k(-d2m, kk)
            xyz = jnp.take_along_axis(flat, arg[..., None], axis=1)
            outs.append((-neg_top, xyz))
        return outs

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P("map", None, None), P("map"),
                  P("map", None, None), P("map"),
                  P(), P(), P(), P()),
        out_specs=P("map", None),
    )
    def _local(cpoints, ccount, spoints, scount, cell_c, cell_s, qc, qs):
        (cd2, cxyz), = _local_topk(cpoints, ccount, cell_c, qc, (k,),
                                   ((cell_c * 0.5) ** 2,))
        (sd2, sxyz), (wd2, wxyz) = _local_topk(
            spoints, scount, cell_s, qs, (k, k2),
            ((cell_s * 0.5) ** 2, cell_s ** 2))
        buf = jnp.concatenate([cd2.ravel(), cxyz.ravel(), sd2.ravel(),
                               sxyz.ravel(), wd2.ravel(), wxyz.ravel()])
        return buf[None]

    @jax.jit
    def _query(cpoints, ccount, spoints, scount, cell_c, cell_s,
               qc, qc_mask, qs, qs_mask):
        buf = _local(cpoints, ccount, spoints, scount, cell_c, cell_s,
                     qc, qs)                                 # (D, L)

        def merge(d2_all, xyz_all, Q, kk, qmask):
            d2m = jnp.moveaxis(d2_all, 0, 1).reshape(Q, n_shards * kk)
            xyzm = jnp.moveaxis(xyz_all, 0, 1).reshape(Q, n_shards * kk, 3)
            neg_top, arg = jax.lax.top_k(-d2m, kk)
            top_d2 = -neg_top
            top_xyz = jnp.take_along_axis(xyzm, arg[..., None], axis=1)
            return top_d2, top_xyz, (top_d2 < 1e37) & qmask[:, None]

        o = 0
        segs = []
        for n in (*seg_c, *seg_s, *seg_w):
            segs.append(buf[:, o:o + n])
            o += n
        cd2 = segs[0].reshape(-1, Qc, k)
        cxyz = segs[1].reshape(-1, Qc, k, 3)
        sd2 = segs[2].reshape(-1, Qs, k)
        sxyz = segs[3].reshape(-1, Qs, k, 3)
        wd2 = segs[4].reshape(-1, Qs, k2)
        wxyz = segs[5].reshape(-1, Qs, k2, 3)
        sel_c = merge(cd2, cxyz, Qc, k, qc_mask)
        d2s, xyzs, vs = merge(sd2, sxyz, Qs, k, qs_mask)
        d2w, xyzw, vw = merge(wd2, wxyz, Qs, k2, qs_mask)
        return sel_c, (d2s, xyzs, vs, d2w, xyzw, vw)

    return _query


def sharded_query_pair(mesh: Mesh, corner_map: VoxelHashMap,
                       surf_map: VoxelHashMap, qc: Array, qc_mask: Array,
                       qs: Array, qs_mask: Array, k: int = 5, k2: int = 16):
    """One association round's worth of queries — corner k-NN plus surf
    two-radius k-NN — as a single packed collective. Returns
    (sel_corner, sel_surf) in the exact shapes of sharded_query_knn /
    sharded_query_knn_2r."""
    H = corner_map.table_size
    h_local = H // mesh.shape["map"]
    fn = _query_pair_program(mesh, H, h_local, qc.shape[0], qs.shape[0],
                             k, k2)
    return fn(corner_map.points, corner_map.count, surf_map.points,
              surf_map.count, corner_map.cell_size, surf_map.cell_size,
              qc, qc_mask, qs, qs_mask)
