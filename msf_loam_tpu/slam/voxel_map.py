"""Fixed-capacity spatial-hash voxel map.

TPU-native replacement for the reference's Cartographer-style HybridGrid
(``/root/reference/src/slam/map/hybrid_grid.cc:462-534``): per-cell point
clouds, voxel-deduplicated on insert (the ``InsertScan`` re-filter at
hybrid_grid.cc:503-521), queried by gathering a 27-cell neighborhood around
each scan point (``GetSurroundedCloud``'s +/-1 dilation, hybrid_grid.cc:
474-481). The dynamic pointer grid becomes a flat hash table of fixed-size
point slabs so insert/query are pure gather/scatter with static shapes:

* ``points``   (H, P, 3)  — slab of up to P points per hash slot
* ``leaf_key`` (H, P)     — packed leaf-voxel id per stored point, giving
                            one-point-per-leaf-voxel dedup on insert
* ``count``    (H,)       — occupancy per slot

Cells hash into slots without collision resolution; a collision only mixes
far-apart cells into one candidate slab, and the kNN distance gate
(d^2 < 1.0, mapping_scan_matcher.cc:128) rejects the aliens. The whole map
is a pytree, threaded through the jitted frame step with buffer donation.
Sharding story: shard the H axis across devices; each device owns a slot
range, inserts locally, answers queries over its shard, and top-k results
merge with an all-gather (see parallel/sharded_map.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

# 27-neighborhood offsets, shaped (27, 3)
_OFFSETS = jnp.stack(jnp.meshgrid(
    jnp.arange(-1, 2), jnp.arange(-1, 2), jnp.arange(-1, 2),
    indexing="ij"), axis=-1).reshape(-1, 3)

_P1 = jnp.uint32(73856093)
_P2 = jnp.uint32(19349663)
_P3 = jnp.uint32(83492791)


def _hash_cells(cells: Array, table_size: int) -> Array:
    """(..., 3) int32 cell coords -> slot index in [0, table_size)."""
    c = cells.astype(jnp.uint32)
    h = (c[..., 0] * _P1) ^ (c[..., 1] * _P2) ^ (c[..., 2] * _P3)
    return (h % jnp.uint32(table_size)).astype(jnp.int32)


class VoxelHashMap(NamedTuple):
    points: Array     # (H, P, 3) float32 — running per-leaf-voxel centroids
    leaf_key: Array   # (H, P) int32
    count: Array      # (H,) int32
    n_obs: Array      # (H, P) float32 — observations per stored point
    cell_size: Array  # () float32
    leaf: Array       # () float32

    @property
    def table_size(self) -> int:
        return self.points.shape[0]

    @property
    def slab_capacity(self) -> int:
        return self.points.shape[1]

    def total_points(self) -> Array:
        return jnp.sum(self.count)


# Unoccupied slab entries hold this coordinate in every component — an
# INVARIANT maintained by create_map/insert_at_slots/evict_far so the
# planar gather for the fused selection kernel (ops.select_fit) needs no
# occupancy mask: sentinel coords produce d2 ~ 3e18, outside every radius
# gate. (3 * EMPTY_COORD^2 stays < f32 max.)
EMPTY_COORD = 1.0e9


def create_map(table_size: int, slab_capacity: int, cell_size: float,
               leaf: float) -> VoxelHashMap:
    return VoxelHashMap(
        points=jnp.full((table_size, slab_capacity, 3), EMPTY_COORD,
                        jnp.float32),
        leaf_key=jnp.full((table_size, slab_capacity), -1, jnp.int32),
        count=jnp.zeros((table_size,), jnp.int32),
        n_obs=jnp.zeros((table_size, slab_capacity), jnp.float32),
        cell_size=jnp.float32(cell_size),
        leaf=jnp.float32(leaf),
    )


@functools.partial(jax.jit, static_argnames=("centroid_updates",))
def insert(vmap: VoxelHashMap, xyz: Array, mask: Array,
           centroid_updates: bool = False) -> VoxelHashMap:
    """Insert world-frame points, one representative per leaf voxel.

    Semantics follow HybridGridImpl::InsertScan (hybrid_grid.cc:503-521):
    bin by cell, then keep per-cell clouds thinned at leaf resolution.
    The first observation of a leaf voxel is kept; with
    ``centroid_updates=True`` later observations fold into a running
    centroid instead (pcl::VoxelGrid-like — measured to SMEAR the map with
    misregistered points and worsen ATE, hence off by default). Full slabs
    drop overflow (the reference's grid is unbounded; our slabs bound it —
    size them for the leaf/cell ratio).
    """
    H = vmap.table_size
    cells = jnp.floor(xyz / vmap.cell_size).astype(jnp.int32)
    slot = _hash_cells(cells, H)
    return insert_at_slots(vmap, xyz, mask, slot, centroid_updates)


def insert_at_slots(vmap: VoxelHashMap, xyz: Array, mask: Array,
                    slot: Array, centroid_updates: bool = False,
                    leaf_salt: Array = None) -> VoxelHashMap:
    """Insert with caller-provided slot ids (the sharded map passes
    shard-local slots; `insert` passes the global hash).

    ``leaf_salt`` (per-point int32) separates leaf-voxel namespaces when
    logically-distinct maps share one table (the fused batch pipeline salts
    by sequence id — without it a point from one sequence would suppress
    another sequence's insert in the same world voxel)."""
    H, P = vmap.table_size, vmap.slab_capacity
    n = xyz.shape[0]

    rep = _dedup_batch(xyz, mask, vmap.leaf, salt=leaf_salt)
    lkey = _leaf_key_dyn(xyz, vmap.leaf)
    if leaf_salt is not None:
        lkey = lkey ^ (leaf_salt * jnp.int32(40503))
    slot = jnp.clip(slot, 0, H - 1)
    slot = jnp.where(mask, slot, H - 1)

    # representatives whose leaf voxel already exists fold into the stored
    # running centroid (pcl::VoxelGrid keeps centroids; first-point-only
    # stored a noisier map) instead of being dropped
    slab_keys = vmap.leaf_key[slot]                     # (n, P)
    occup = jnp.arange(P)[None, :] < vmap.count[slot][:, None]
    match = (slab_keys == lkey[:, None]) & occup
    dup = jnp.any(match, axis=1)
    dup_pos = jnp.argmax(match, axis=1)                 # first matching slot
    keep = rep & ~dup
    # at most one fold per (slot, pos) per batch -> exact running mean
    if centroid_updates:
        upd = rep & dup
        u_slot = jnp.where(upd, slot, H)
        u_pos = jnp.where(upd, dup_pos, 0)
        n_obs = vmap.n_obs.at[u_slot, u_pos].add(
            upd.astype(jnp.float32), mode="drop")
        denom = jnp.maximum(n_obs[jnp.clip(u_slot, 0, H - 1), u_pos], 1.0)
        delta = (xyz - vmap.points[jnp.clip(u_slot, 0, H - 1), u_pos]) \
            / denom[:, None]
        new_points = vmap.points.at[u_slot, u_pos].add(
            jnp.where(upd[:, None], delta, 0.0), mode="drop")
    else:
        # default path: duplicates are dropped, not folded — skip the two
        # full-table no-op scatters (each would copy the (H,P,*) buffers)
        n_obs = vmap.n_obs
        new_points = vmap.points

    # rank new points within their slot (stable) to get write offsets
    sent = jnp.int32(H)
    key = jnp.where(keep, slot, sent)
    order = jnp.argsort(key, stable=True)
    ks = key[order]
    pos = jnp.arange(n)
    is_start = jnp.concatenate([jnp.ones((1,), bool), ks[1:] != ks[:-1]])
    seg_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(is_start, pos, 0))
    rank_sorted = pos - seg_start
    rank = jnp.zeros((n,), jnp.int32).at[order].set(rank_sorted.astype(jnp.int32))

    dest = vmap.count[slot] + rank
    ok = keep & (dest < P)
    w_slot = jnp.where(ok, slot, H)   # out-of-bounds => dropped by mode="drop"
    w_dest = jnp.where(ok, dest, 0)

    new_points = new_points.at[w_slot, w_dest].set(xyz, mode="drop")
    new_keys = vmap.leaf_key.at[w_slot, w_dest].set(lkey, mode="drop")
    n_obs = n_obs.at[w_slot, w_dest].set(
        jnp.ones((n,), jnp.float32), mode="drop")
    new_count = vmap.count.at[w_slot].add(ok.astype(jnp.int32), mode="drop")
    new_count = jnp.minimum(new_count, P)
    return vmap._replace(points=new_points, leaf_key=new_keys,
                         count=new_count, n_obs=n_obs)


@jax.jit
def evict_far(vmap: VoxelHashMap, center: Array, radius: float = 100.0
              ) -> VoxelHashMap:
    """Drop stored points farther than ``radius`` from center.

    The reference keeps an unbounded grid but only queries a 60 m surround
    (hybrid_grid.cc:474,532); a fixed-size hash table instead needs
    eviction so km-scale trajectories don't exhaust slots via collisions.
    Eviction is per stored POINT, not per slot: hash collisions mix
    far-apart cells into one slab, so a slot-level anchor test would evict
    (or wrongly retain) live near cells that share a slot with stale far
    ones. Each slab is compacted with a stable keep-first argsort —
    O(H * P log P) elementwise/sort work, run every few frames.
    """
    H, P = vmap.table_size, vmap.slab_capacity
    occup = jnp.arange(P)[None, :] < vmap.count[:, None]         # (H, P)
    # center: (3,) single anchor, or (H, 3) per-slot anchors (the fused
    # multi-sequence table evicts each lane around ITS trajectory)
    c = center[None, None, :] if center.ndim == 1 else center[:, None, :]
    d2 = jnp.sum((vmap.points - c) ** 2, axis=-1)
    keep = occup & (d2 <= radius * radius)
    order = jnp.argsort(~keep, axis=1, stable=True)              # kept first
    new_points = jnp.take_along_axis(vmap.points, order[..., None], axis=1)
    new_keys = jnp.take_along_axis(vmap.leaf_key, order, axis=1)
    new_nobs = jnp.take_along_axis(vmap.n_obs, order, axis=1)
    new_count = jnp.sum(keep, axis=1).astype(jnp.int32)
    live = jnp.arange(P)[None, :] < new_count[:, None]
    new_keys = jnp.where(live, new_keys, -1)
    # maintain the EMPTY_COORD tail invariant (evicted entries would
    # otherwise keep their real coords past the count boundary)
    new_points = jnp.where(live[..., None], new_points, EMPTY_COORD)
    return vmap._replace(points=new_points, leaf_key=new_keys,
                         count=new_count, n_obs=new_nobs)


def _dedup_batch(xyz: Array, mask: Array, leaf: Array,
                 salt: Array = None) -> Array:
    """One representative per (salted) leaf voxel within the incoming batch."""
    n = xyz.shape[0]
    key = _leaf_key_dyn(xyz, leaf)
    if salt is not None:
        key = key ^ (salt * jnp.int32(40503))
    key = jnp.where(mask, key, jnp.arange(n, dtype=jnp.int32) | jnp.int32(-2147483648))
    order = jnp.argsort(key, stable=True)
    ks = key[order]
    first = jnp.concatenate([jnp.ones((1,), bool), ks[1:] != ks[:-1]])
    keep = jnp.zeros((n,), bool).at[order].set(first)
    return keep & mask


def _leaf_key_dyn(xyz: Array, leaf: Array, origin: float = 8192.0) -> Array:
    ijk = jnp.floor((xyz + origin) / leaf).astype(jnp.uint32)
    k = (ijk[..., 0] * _P1) ^ (ijk[..., 1] * _P2) ^ (ijk[..., 2] * _P3)
    return k.astype(jnp.int32)


# corner offsets of a 2x2x2 cell block, shaped (8, 3)
_OFFSETS8 = jnp.stack(jnp.meshgrid(
    jnp.arange(2), jnp.arange(2), jnp.arange(2),
    indexing="ij"), axis=-1).reshape(-1, 3)


def neighbor_cells8(q: Array, cell_size: Array) -> Array:
    """The 8 cells that can contain any point within cell_size/2 of q.

    For a search radius r <= cell_size/2, the ball around q intersects at
    most 2 cells per axis — the cell of q plus the neighbor on the side of
    q's octant. A 3.4x candidate reduction vs the naive 27-neighborhood.
    Returns (Q, 8, 3) int32 cell coords.
    """
    cf = q / cell_size
    base = jnp.floor(cf)
    frac = cf - base
    low = base.astype(jnp.int32) + jnp.where(frac < 0.5, -1, 0)  # (Q, 3)
    return low[:, None, :] + _OFFSETS8[None, :, :]


@functools.partial(jax.jit, static_argnames=("k",))
def query_knn(vmap: VoxelHashMap, query: Array, query_mask: Array,
              k: int = 5) -> Tuple[Array, Array, Array]:
    """k nearest map points (within cell_size/2) for each query.

    Gathers the 8-cell octant neighborhood slabs around each query point
    and top-k's by distance — the batched analog of GetSurroundedCloud +
    5-NN KD-tree search (hybrid_grid.cc:470-501 + mapping_scan_matcher.cc:
    125). Complete out to radius cell_size/2, which must cover the
    downstream distance gate (knn_dist_sq_max <= (cell_size/2)^2 — the
    reference gates at d^2 < 1.0 with our default 2.0 m cells).

    Returns (d2 (Q,k), xyz (Q,k,3), valid (Q,k)).
    """
    H, P = vmap.table_size, vmap.slab_capacity
    q = query.astype(jnp.float32)
    ncells = neighbor_cells8(q, vmap.cell_size)                  # (Q, 8, 3)
    slots = _hash_cells(ncells, H)                               # (Q, 8)

    cand = vmap.points[slots]                                    # (Q, 8, P, 3)
    occup = jnp.arange(P)[None, None, :] < vmap.count[slots][:, :, None]
    diff = cand - q[:, None, None, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    # enforce the completeness radius so results are order-identical to an
    # exact kNN truncated at cell_size/2
    radius_sq = (vmap.cell_size * 0.5) ** 2
    keep = occup & (d2 <= radius_sq)
    d2 = jnp.where(keep, d2, jnp.float32(3e38)).reshape(q.shape[0], -1)

    neg_top, arg = jax.lax.top_k(-d2, k)
    top_d2 = -neg_top
    top_xyz = jnp.take_along_axis(
        cand.reshape(q.shape[0], -1, 3), arg[..., None], axis=1)
    valid = (top_d2 < 1e37) & query_mask[:, None]
    return top_d2, top_xyz, valid


def gather_candidates(vmap: VoxelHashMap, query: Array, query_mask: Array
                      ) -> Tuple[Array, Array]:
    """One 8-cell octant gather, selection deferred: (Q, 8P, 3) candidate
    coordinates + (Q, 8P) occupancy.

    TPU gathers are row-latency-bound (~10 ns/row regardless of row size,
    operand size, or layout — measured in scripts/bench_gather_layout.py),
    so the scan-to-map matcher gathers ONCE per frame and re-runs only the
    cheap distance/top-k selection (``select_knn`` / ``select_knn_2r``)
    against the updated pose each re-association round. Coverage: complete
    for any ball of radius <= cell_size/2 around the GATHER positions;
    with the default gate radius == cell_size/2 a pose update of d meters
    between rounds can only lose candidates in the outer d-shell of the
    gate ball (GN steps from an odometry warm start are centimeters vs a
    1 m gate — ATE-checked in the golden evals).
    """
    H, P = vmap.table_size, vmap.slab_capacity
    q = query.astype(jnp.float32)
    ncells = neighbor_cells8(q, vmap.cell_size)                  # (Q, 8, 3)
    slots = _hash_cells(ncells, H)                               # (Q, 8)
    cand = vmap.points[slots]                                    # (Q, 8, P, 3)
    occup = jnp.arange(P)[None, None, :] < vmap.count[slots][:, :, None]
    occup = occup & query_mask[:, None, None]
    return (cand.reshape(q.shape[0], -1, 3),
            occup.reshape(q.shape[0], -1))


def gather_candidates_planar(vmap: VoxelHashMap, query: Array,
                             query_mask: Array) -> Array:
    """One octant gather in PLANAR (3, Q, 8P) layout for the fused Pallas
    selection+fit kernel (ops.select_fit). No occupancy mask travels with
    the candidates: unoccupied slab entries hold EMPTY_COORD by table
    invariant, which lands outside every radius gate. Masked QUERIES are
    not filtered here either — their rows produce gated-off fits and every
    caller ANDs the query mask into its validity gates. Same coverage
    contract as ``gather_candidates``."""
    H, P = vmap.table_size, vmap.slab_capacity
    del query_mask  # folded into the callers' validity gates
    q = query.astype(jnp.float32)
    ncells = neighbor_cells8(q, vmap.cell_size)                  # (Q, 8, 3)
    slots = _hash_cells(ncells, H)                               # (Q, 8)
    tp = jnp.transpose(vmap.points, (2, 0, 1))                   # (3, H, P)
    cand = tp[:, slots]                                          # (3, Q, 8, P)
    return cand.reshape(3, q.shape[0], 8 * P)


class QueryGroups(NamedTuple):
    """Base-cell grouping of a query batch (ops.voxel.
    voxel_downsample_grouped_idx): ascending per-query group ids and the
    first query row of each group. Group ``len(rep_pos) - 1`` is the
    overflow/invalid sentinel."""
    gid: Array       # (Q,) int32
    rep_pos: Array   # (G,) int32


def gather_candidates_rows_grouped(vmap: VoxelHashMap, query: Array,
                                   gid: Array, rep_pos: Array) -> Array:
    """Two-level octant gather over base-cell GROUPED queries, in
    planar-packed ROW layout (Q, 3*8P): row q = [x*8P | y*8P | z*8P],
    EMPTY_COORD for invalid — the fused selection kernel's rows input
    (ops.select_fit layout='rows'), at ~1/4 the HBM row fetches of the
    one-level gather.

    Queries sharing an octant base cell share all 8 hash slots, so the
    slab gather runs once per GROUP (G*8 rows instead of Q*8 — measured
    0.10 ms vs 0.41 ms net at Q=4096/G=1024 on v5e,
    scripts/bench_gather_r5.py) and candidates re-expand per query with
    a Q-row gather from the compact (G, 24P) buffer (measured 0.03 ms
    net: row-gather cost scales with ROW COUNT, and Q rows from a small
    resident operand are cheap — this is what makes the two-level form
    win where the r4 XLA dedupe variants lost). An f32 one-hot MXU
    expansion measured even cheaper (fully overlapped) but is only
    bit-exact at Precision.HIGHEST; the gather is exact by construction.

    Requires queries grouped by base cell (ops.voxel.
    voxel_downsample_grouped_idx): ``gid (Q,)`` ascending group ids,
    ``rep_pos (G,)`` the first query row of each group. Group
    ``G - 1`` is the overflow/invalid sentinel — its candidates are
    forced to EMPTY_COORD, so over-budget groups degrade to dropped
    candidates rather than aliased ones (same philosophy as slab
    overflow on insert). Bit-identical to the one-level gather for every
    query whose group rank is below ``G - 1``
    (tests/test_voxel_map.py::test_grouped_gather_bit_identical).

    Replaces the same reference loop as ``gather_candidates``
    (hybrid_grid.cc:470-501 surround lookup per point).
    """
    H, P = vmap.table_size, vmap.slab_capacity
    Q = query.shape[0]
    G = rep_pos.shape[0]
    q = query.astype(jnp.float32)
    rep_w = q[jnp.clip(rep_pos, 0, Q - 1)]                       # (G, 3)
    ncells = neighbor_cells8(rep_w, vmap.cell_size)              # (G, 8, 3)
    slots = _hash_cells(ncells, H)                               # (G, 8)
    # gather whole slab ROWS from the bitcast (H, 3P) view — indexing the
    # (H, P, 3) table directly makes XLA relayout-copy the full 12.6 MB
    # table first (~53 us/frame/map, xprof r5); the flat view is a free
    # bitcast and the row gather needs no relayout
    grp = vmap.points.reshape(H, 3 * P)[slots]                   # (G,8,3P)
    # planar within the group row: (G, 3, 8P) -> flatten to (G, 3*8P)
    grp = grp.reshape(G, 8, P, 3)
    grp_rows = jnp.transpose(grp, (0, 3, 1, 2)).reshape(G, 3 * 8 * P)
    grp_rows = grp_rows.at[G - 1, :].set(EMPTY_COORD)            # sentinel
    return grp_rows[jnp.clip(gid, 0, G - 1)]                     # (Q, 3*8P)


def gather_candidates_planar_grouped(vmap: VoxelHashMap, query: Array,
                                     gid: Array, rep_pos: Array) -> Array:
    """``gather_candidates_rows_grouped`` rearranged to the legacy planar
    (3, Q, 8P) contract (tests / planar consumers; the fused select path
    consumes the rows form directly to skip this transpose)."""
    P = vmap.slab_capacity
    cand = gather_candidates_rows_grouped(vmap, query, gid, rep_pos)
    return jnp.transpose(cand.reshape(query.shape[0], 3, 8 * P), (1, 0, 2))


def _two_level_slots(slots_flat: Array, table_size: int, u_max: int
                     ) -> Tuple[Array, Array]:
    """Dedupe a flat slot-id vector for the two-level gather.

    Returns ``(uslots (u_max,), remap (n,))`` with
    ``uslots[remap[i]] == slots_flat[i]`` for every i whose slot id ranks
    below ``u_max - 1`` among the uniques. Index ``u_max - 1`` is the
    overflow sentinel — callers must make that compact row EMPTY_COORD so
    overflowed candidates are dropped (graceful degradation, same
    philosophy as slab overflow on insert) rather than aliased.

    Sort-free: an argsort-based dedupe costs more than the one-level
    gather it replaces (~0.6 ms for a 32k argsort, measured r4 —
    scripts/bench_gather_2l.py), so uniques are ranked by a presence
    scatter + exclusive prefix sum over the table axis instead.
    """
    h = table_size
    flags = jnp.zeros((h,), jnp.int32).at[slots_flat].set(1)
    rank = jnp.cumsum(flags) - flags                 # 0-based unique rank
    si = u_max - 1
    rank = jnp.minimum(rank, si)
    # NOTE (ADVICE r4): compact rows between the frame's unique-slot count
    # and u_max-2 keep this zero init, so the compact gather redundantly
    # fetches slot 0's slab for them — harmless for correctness, and it
    # PADS the measured two-level cost at large u_max; the r4 rejection
    # also held at u_max=1024 where the padding is minimal.
    uslots = jnp.zeros((u_max,), jnp.int32).at[
        jnp.where(flags == 1, rank, u_max)].set(
        jnp.arange(h, dtype=jnp.int32), mode="drop")
    remap = rank[slots_flat]
    return uslots, remap


@functools.partial(jax.jit, static_argnames=("u_max",))
def gather_candidates_planar_2l(vmap: VoxelHashMap, query: Array,
                                query_mask: Array, u_max: int = 2048
                                ) -> Array:
    """Two-level octant gather, same contract as gather_candidates_planar.

    The Q*8 octant slot fetches of a spatially-clustered query set touch
    far fewer UNIQUE table slots (~880 of 32768 for surface-clustered
    queries, measured r4), so the big-table gather is split: (1) dedupe
    slot ids and fetch each unique slab ONCE from the (3, H, P) table,
    (2) re-expand per-query candidates from the compact (3, u_max, P)
    buffer. Bit-identical to the one-level gather whenever the frame
    touches <= u_max - 1 unique slots (overflow drops candidates via the
    EMPTY_COORD sentinel row instead of aliasing them).

    MEASURED AND REJECTED as an XLA-level program (r4, scripts/
    bench_gather_2l.py on real TPU): 1.13-1.22 ms vs 0.69 ms one-level at
    Q=4096 — every 32k-element dedupe primitive (scatter ~0.34 ms, 1-D
    cumsum ~0.35 ms, argsort ~0.6 ms) costs as much as the whole gather
    it replaces, independent of the dedupe algorithm. Kept (off by
    default, config.gather_two_level) as groundwork for an in-kernel
    variant where the dedupe amortizes into the selection kernel's pass.
    """
    H, P = vmap.table_size, vmap.slab_capacity
    del query_mask  # same contract as gather_candidates_planar
    q = query.astype(jnp.float32)
    ncells = neighbor_cells8(q, vmap.cell_size)                  # (Q, 8, 3)
    slots = _hash_cells(ncells, H)                               # (Q, 8)
    uslots, remap = _two_level_slots(slots.reshape(-1), H, u_max)
    tp = jnp.transpose(vmap.points, (2, 0, 1))                   # (3, H, P)
    compact = tp[:, uslots]                                      # (3, U, P)
    compact = compact.at[:, u_max - 1, :].set(EMPTY_COORD)
    cand = compact[:, remap]                                     # (3, Q*8, P)
    return cand.reshape(3, q.shape[0], 8 * P)


@functools.partial(jax.jit, static_argnames=("k",))
def select_knn(cand: Array, cand_valid: Array, query: Array,
               cell_size: Array, k: int = 5
               ) -> Tuple[Array, Array, Array]:
    """Strict top-k (radius cell_size/2) from a gathered candidate set —
    the selection half of ``query_knn`` (same result when the candidates
    were gathered at these query positions)."""
    q = query.astype(jnp.float32)
    diff = cand - q[:, None, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    keep = cand_valid & (d2 <= (cell_size * 0.5) ** 2)
    d2 = jnp.where(keep, d2, jnp.float32(3e38))
    neg_top, arg = jax.lax.top_k(-d2, k)
    top_d2 = -neg_top
    top_xyz = jnp.take_along_axis(cand, arg[..., None], axis=1)
    valid = top_d2 < 1e37
    return top_d2, top_xyz, valid


@functools.partial(jax.jit, static_argnames=("k",))
def select_knn_wide_mask(cand: Array, cand_valid: Array, query: Array,
                         cell_size: Array, k: int = 5
                         ) -> Tuple[Array, Array, Array, Array]:
    """Strict top-k plus the wide in-radius MASK over the candidates, one
    distance pass. The mask form feeds the moments-based fallback plane
    fit (fitting.fit_planes_two_scale_masked) without a second top-k or
    its row-latency-bound take_along_axis gather."""
    q = query.astype(jnp.float32)
    diff = cand - q[:, None, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    keep = cand_valid & (d2 <= (cell_size * 0.5) ** 2)
    wide = cand_valid & (d2 <= cell_size ** 2)
    d2s = jnp.where(keep, d2, jnp.float32(3e38))
    neg_top, arg = jax.lax.top_k(-d2s, k)
    top_d2 = -neg_top
    top_xyz = jnp.take_along_axis(cand, arg[..., None], axis=1)
    return top_d2, top_xyz, top_d2 < 1e37, wide


@functools.partial(jax.jit, static_argnames=("k",))
def select_knn_weights(cand: Array, cand_valid: Array, query: Array,
                       cell_size: Array, k: int = 5
                       ) -> Tuple[Array, Array, Array]:
    """Strict k-NN as a 0/1 WEIGHT over the candidate slab — no neighbor
    gather at all (downstream fits consume weighted moments,
    fitting.fit_*_weighted). Returns (d2 (Q,k) ascending, w_near (Q,C)
    f32 0/1, wide (Q,C) f32 0/1). Ties at the kth distance may admit >k
    candidates (measure-zero with leaf-deduped float32 maps; fits are
    unaffected).

    Implementation notes (xprof-measured): the weights are float32, not
    bool — TPU pred arrays tile as (8,128)(4,1) and their cross-fusion
    copies cost ~300 us each at this shape; and the k smallest distances
    come from k sequential masked mins (values only), not a sort-based
    lax.top_k — no index operand, ~2x cheaper at C=256."""
    q = query.astype(jnp.float32)
    diff = cand - q[..., None, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    keep = cand_valid & (d2 <= (cell_size * 0.5) ** 2)
    wide = cand_valid & (d2 <= cell_size ** 2)
    d2s = jnp.where(keep, d2, jnp.float32(3e38))
    vals = []
    cur = d2s
    for _ in range(k):
        v = jnp.min(cur, axis=-1, keepdims=True)
        vals.append(v)
        cur = jnp.where(cur <= v, jnp.float32(3e38), cur)
    top_d2 = jnp.concatenate(vals, axis=-1)
    w_near = jnp.where(keep & (d2s <= top_d2[..., k - 1:k]), 1.0, 0.0)
    return top_d2, w_near, wide.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("k", "k2"))
def select_knn_2r(cand: Array, cand_valid: Array, query: Array,
                  cell_size: Array, k: int = 5, k2: int = 16
                  ) -> Tuple[Array, Array, Array, Array, Array, Array]:
    """Two-radius selection from a gathered candidate set — the selection
    half of ``query_knn_2r``."""
    q = query.astype(jnp.float32)
    diff = cand - q[:, None, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    keep = cand_valid & (d2 <= (cell_size * 0.5) ** 2)
    keep_w = cand_valid & (d2 <= cell_size ** 2)
    d2s = jnp.where(keep, d2, jnp.float32(3e38))
    d2w = jnp.where(keep_w, d2, jnp.float32(3e38))

    neg_top, arg = jax.lax.top_k(-d2s, k)
    top_d2 = -neg_top
    top_xyz = jnp.take_along_axis(cand, arg[..., None], axis=1)
    valid = top_d2 < 1e37

    neg_w, arg_w = jax.lax.top_k(-d2w, k2)
    top_d2w = -neg_w
    top_xyzw = jnp.take_along_axis(cand, arg_w[..., None], axis=1)
    valid_w = top_d2w < 1e37
    return top_d2, top_xyz, valid, top_d2w, top_xyzw, valid_w


@functools.partial(jax.jit, static_argnames=("k", "k2"))
def query_knn_2r(vmap: VoxelHashMap, query: Array, query_mask: Array,
                 k: int = 5, k2: int = 16
                 ) -> Tuple[Array, Array, Array, Array, Array, Array]:
    """Two-radius kNN from ONE 8-cell gather: the strict top-k within
    cell_size/2 (identical to ``query_knn``) plus a top-k2 within the full
    gathered neighborhood (radius up to cell_size on the octant side).

    The wide set exists because a tight k-NN is blind to anisotropic
    density: on a surface grazed along the scan ring (floor/ceiling at
    VLP-16 geometry) the same-ring spacing is centimeters while the nearest
    cross-ring point is over a meter away — outside the strict radius — so
    5-NN plane fits degenerate to collinear arcs with arbitrary normals
    (the reference's 5-NN + 0.2 residual check, mapping_scan_matcher.cc:
    198-220, has the same blind spot). The wide set feeds a fallback TLS
    plane fit only where the strict fit fails its spread gate. Coverage
    beyond cell_size/2 is best-effort (whatever the 8 gathered slabs hold),
    which is fine for an enrichment set — completeness still only claimed
    for the strict radius.

    Returns (d2 (Q,k), xyz, valid, d2w (Q,k2), xyzw, validw).
    """
    H, P = vmap.table_size, vmap.slab_capacity
    q = query.astype(jnp.float32)
    ncells = neighbor_cells8(q, vmap.cell_size)                  # (Q, 8, 3)
    slots = _hash_cells(ncells, H)                               # (Q, 8)

    cand = vmap.points[slots]                                    # (Q, 8, P, 3)
    occup = jnp.arange(P)[None, None, :] < vmap.count[slots][:, :, None]
    diff = cand - q[:, None, None, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    radius_sq = (vmap.cell_size * 0.5) ** 2
    keep = occup & (d2 <= radius_sq)
    keep_w = occup & (d2 <= vmap.cell_size ** 2)
    flat = cand.reshape(q.shape[0], -1, 3)
    d2s = jnp.where(keep, d2, jnp.float32(3e38)).reshape(q.shape[0], -1)
    d2w = jnp.where(keep_w, d2, jnp.float32(3e38)).reshape(q.shape[0], -1)

    neg_top, arg = jax.lax.top_k(-d2s, k)
    top_d2 = -neg_top
    top_xyz = jnp.take_along_axis(flat, arg[..., None], axis=1)
    valid = (top_d2 < 1e37) & query_mask[:, None]

    neg_w, arg_w = jax.lax.top_k(-d2w, k2)
    top_d2w = -neg_w
    top_xyzw = jnp.take_along_axis(flat, arg_w[..., None], axis=1)
    valid_w = (top_d2w < 1e37) & query_mask[:, None]
    return top_d2, top_xyz, valid, top_d2w, top_xyzw, valid_w
