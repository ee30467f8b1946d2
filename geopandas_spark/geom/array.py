"""Columnar geometry array: the kernel's in-memory representation.

Layout (GeoArrow-inspired, uniform nesting depth for all geometry types):

    types        uint8[n]        WKB geometry-type code per row (0 = NULL)
    geom_offsets int64[n+1]      row i owns parts  [geom_offsets[i], geom_offsets[i+1])
    part_offsets int64[nparts+1] part j owns rings [part_offsets[j], part_offsets[j+1])
    ring_offsets int64[nrings+1] ring k owns coords[ring_offsets[k], ring_offsets[k+1])
    coords       float64[ncoords, 2]

Mapping per type:
    POINT            1 part, 1 ring, 1 coord
    LINESTRING       1 part, 1 ring (the vertex chain)
    POLYGON          1 part, R rings (ring 0 = shell, rest = holes)
    MULTIPOINT       P parts, each 1 ring / 1 coord
    MULTILINESTRING  P parts, each 1 ring
    MULTIPOLYGON     P parts, each R_i rings
    NULL / EMPTY     0 parts / 0 coords

This is a deliberate contrast with the reference, whose GeometryArray is a
numpy *object* array of per-row GEOS pointers (reference:
geopandas/array.py:346-372): here a whole Arrow batch is a handful of flat
numpy buffers, so every measure/predicate kernel is a vectorized numpy pass
with no per-row Python in the hot loop.

GEOMETRYCOLLECTION rows flatten their children's single-type parts into the
uniform layout and record the child structure in an auxiliary per-row
``gc_meta`` list ([(child_type, n_parts), ...]); codecs, get_parts /
collection_extract and the measures (via dimension decomposition) consume
it. GC children are 2-D.

Documented deviation: *nested* GEOMETRYCOLLECTIONs are flattened one level
— ``GC(GC(POINT a), POINT b)`` round-trips as ``GC(POINT a, POINT b)``.
gc_meta holds one (type, n_parts) tier, so a sub-collection's children are
promoted to the parent. GEOS/the reference preserve nesting; every
measure, predicate, and extraction result is identical under flattening
(only the WKB/WKT byte layout differs).
"""

from __future__ import annotations

import numpy as np

GT_MISSING = 0
GT_POINT = 1
GT_LINESTRING = 2
GT_POLYGON = 3
GT_MULTIPOINT = 4
GT_MULTILINESTRING = 5
GT_MULTIPOLYGON = 6
GT_GEOMETRYCOLLECTION = 7

GEOM_TYPE_NAMES = {
    GT_POINT: "Point",
    GT_LINESTRING: "LineString",
    GT_POLYGON: "Polygon",
    GT_MULTIPOINT: "MultiPoint",
    GT_MULTILINESTRING: "MultiLineString",
    GT_MULTIPOLYGON: "MultiPolygon",
    GT_GEOMETRYCOLLECTION: "GeometryCollection",
}

WKT_TYPE_NAMES = {k: v.upper() for k, v in GEOM_TYPE_NAMES.items()}

POINT_TYPES = frozenset({GT_POINT, GT_MULTIPOINT})
LINE_TYPES = frozenset({GT_LINESTRING, GT_MULTILINESTRING})
POLYGON_TYPES = frozenset({GT_POLYGON, GT_MULTIPOLYGON})
MULTI_TYPES = frozenset({GT_MULTIPOINT, GT_MULTILINESTRING, GT_MULTIPOLYGON})

MULTI_OF = {GT_POINT: GT_MULTIPOINT, GT_LINESTRING: GT_MULTILINESTRING,
            GT_POLYGON: GT_MULTIPOLYGON}
SINGLE_OF = {v: k for k, v in MULTI_OF.items()}


class GeometryArray:
    """Immutable batch of geometries in the columnar layout above.

    Z/M support: optional parallel buffers ``z`` / ``m`` (float64[ncoords]
    or None) — NaN marks coords of 2-D rows inside a mixed batch. All 2-D
    kernels ignore them (planar semantics, like the reference's shapely
    ops); the codec, accessors (z/m/has_z/has_m) and force_2d/force_3d
    carry them. A row is 3-D iff its first coord's z is non-NaN (rows are
    uniformly dimensioned, as in WKB)."""

    __slots__ = ("types", "geom_offsets", "part_offsets", "ring_offsets",
                 "coords", "z", "m", "gc_meta", "_co_geom")

    def __init__(self, types, geom_offsets, part_offsets, ring_offsets,
                 coords, z=None, m=None, gc_meta=None):
        self.types = np.asarray(types, dtype=np.uint8)
        self.geom_offsets = np.asarray(geom_offsets, dtype=np.int64)
        self.part_offsets = np.asarray(part_offsets, dtype=np.int64)
        self.ring_offsets = np.asarray(ring_offsets, dtype=np.int64)
        self.coords = np.ascontiguousarray(coords, dtype=np.float64).reshape(-1, 2)
        self.z = (None if z is None
                  else np.ascontiguousarray(z, dtype=np.float64).reshape(-1))
        self.m = (None if m is None
                  else np.ascontiguousarray(m, dtype=np.float64).reshape(-1))
        # GEOMETRYCOLLECTION rows: parts are the flattened single-type
        # parts of all children; gc_meta[i] = [(child_type, n_parts), ...]
        # (None for non-GC rows / arrays without collections).
        self.gc_meta = gc_meta

    # -- sizes ------------------------------------------------------------
    def __len__(self) -> int:
        return len(self.types)

    @property
    def n_parts(self) -> int:
        return len(self.part_offsets) - 1

    @property
    def n_rings(self) -> int:
        return len(self.ring_offsets) - 1

    @property
    def n_coords(self) -> int:
        return len(self.coords)

    # -- derived index structures ----------------------------------------
    def parts_per_geom(self) -> np.ndarray:
        return np.diff(self.geom_offsets)

    def rings_per_part(self) -> np.ndarray:
        return np.diff(self.part_offsets)

    def coords_per_ring(self) -> np.ndarray:
        return np.diff(self.ring_offsets)

    def rings_per_geom(self) -> np.ndarray:
        # ring index range per geometry = part_offsets composed over geom_offsets
        return np.diff(self.part_offsets[self.geom_offsets])

    def coords_per_geom(self) -> np.ndarray:
        return np.diff(self.coord_offsets_per_geom())

    def coord_offsets_per_geom(self) -> np.ndarray:
        """int64[n+1]: coords slice per geometry (rings are contiguous).
        Memoized — the array is immutable and hot kernels (pair filters,
        accessors) call this per pair; recomputing the double gather was
        ~0.2 s per 24k-part dissolve merge task."""
        co = getattr(self, "_co_geom", None)
        if co is None:
            co = self.ring_offsets[self.part_offsets[self.geom_offsets]]
            self._co_geom = co
        return co

    def coord_offsets_per_part(self) -> np.ndarray:
        return self.ring_offsets[self.part_offsets]

    def ring_geom_index(self) -> np.ndarray:
        """int64[n_rings]: owning geometry row of each ring."""
        return np.repeat(np.arange(len(self)), self.rings_per_geom())

    def part_geom_index(self) -> np.ndarray:
        return np.repeat(np.arange(len(self)), self.parts_per_geom())

    def coord_geom_index(self) -> np.ndarray:
        return np.repeat(np.arange(len(self)), self.coords_per_geom())

    def is_missing(self) -> np.ndarray:
        return self.types == GT_MISSING

    def _row_has_dim(self, buf) -> np.ndarray:
        if buf is None:
            return np.zeros(len(self), dtype=bool)
        co = self.coord_offsets_per_geom()
        first = np.minimum(co[:-1], max(len(buf) - 1, 0))
        out = ~np.isnan(buf[first]) if len(buf) else np.zeros(len(self), bool)
        out[co[:-1] == co[1:]] = False   # empty rows
        return out

    def row_has_z(self) -> np.ndarray:
        """bool[n]: row carries Z (first coord's z non-NaN)."""
        return self._row_has_dim(self.z)

    def row_has_m(self) -> np.ndarray:
        return self._row_has_dim(self.m)

    def dim_slice(self, buf, i: int):
        """z/m slice of row i (or None)."""
        if buf is None:
            return None
        co = self.coord_offsets_per_geom()
        s = buf[co[i]:co[i + 1]]
        if len(s) == 0 or np.isnan(s[0]):
            return None
        return s

    def is_empty(self) -> np.ndarray:
        """Non-null geometries with zero coordinates (POINT EMPTY etc.)."""
        return (self.types != GT_MISSING) & (self.coords_per_geom() == 0)

    # -- row access (slow path, for tests / per-row fallbacks) -----------
    def geom_slices(self, i: int):
        """Return list of parts; each part is a list of (k,2) coord arrays."""
        parts = []
        for p in range(self.geom_offsets[i], self.geom_offsets[i + 1]):
            rings = []
            for r in range(self.part_offsets[p], self.part_offsets[p + 1]):
                rings.append(self.coords[self.ring_offsets[r]:self.ring_offsets[r + 1]])
            parts.append(rings)
        return parts

    def children_of(self, i: int):
        """GC row i → list of (child_type, parts) in geom_slices format;
        non-GC rows yield themselves as a single child."""
        t = int(self.types[i])
        parts = self.geom_slices(i)
        if t != GT_GEOMETRYCOLLECTION:
            return [(t, parts)]
        meta = (self.gc_meta[i] if self.gc_meta is not None else None) or []
        out, pos = [], 0
        for ctype, nparts in meta:
            out.append((ctype, parts[pos:pos + nparts]))
            pos += nparts
        return out

    def take(self, indices) -> "GeometryArray":
        """Gather rows (negative index not supported).

        Vectorized: three repeat/cumsum offset gathers (geom→part→ring→
        coord) rebuild the nested layout with no per-row Python — this is
        the hot path of pairwise refines (sjoin candidate batches gather
        both sides per pair). GC rows fall back to the builder (rare)."""
        indices = np.asarray(indices, dtype=np.int64)
        if self.gc_meta is not None and \
                (self.types[indices] == GT_GEOMETRYCOLLECTION).any():
            b = GeometryBuilder()
            for i in indices:
                b.append_from(self, int(i))
            return b.finish()

        def _expand(starts, counts):
            """Global ids [starts[k], starts[k]+counts[k]) concatenated."""
            total = int(counts.sum())
            if total == 0:
                return np.empty(0, dtype=np.int64)
            within = np.arange(total, dtype=np.int64) - \
                np.repeat(np.cumsum(counts) - counts, counts)
            return np.repeat(starts, counts) + within

        ppg = self.parts_per_geom()[indices]
        part_ids = _expand(self.geom_offsets[indices], ppg)
        rpp = np.diff(self.part_offsets)[part_ids]
        ring_ids = _expand(self.part_offsets[part_ids], rpp)
        cpr = np.diff(self.ring_offsets)[ring_ids]
        coord_ids = _expand(self.ring_offsets[ring_ids], cpr)

        n = len(indices)
        geom_offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(ppg, out=geom_offsets[1:])
        part_offsets = np.zeros(len(part_ids) + 1, dtype=np.int64)
        np.cumsum(rpp, out=part_offsets[1:])
        ring_offsets = np.zeros(len(ring_ids) + 1, dtype=np.int64)
        np.cumsum(cpr, out=ring_offsets[1:])
        return GeometryArray(
            self.types[indices], geom_offsets, part_offsets, ring_offsets,
            self.coords[coord_ids],
            z=self.z[coord_ids] if self.z is not None else None,
            m=self.m[coord_ids] if self.m is not None else None)

    def __repr__(self):
        return (f"GeometryArray(n={len(self)}, parts={self.n_parts}, "
                f"rings={self.n_rings}, coords={self.n_coords})")


class GeometryBuilder:
    """Append-based builder producing a GeometryArray.

    Used by the WKB/WKT parsers and by per-row constructive ops that cannot
    be expressed as a flat vectorized pass (convex hull, simplify, ...).

    Z/M: rings may be passed as (k, 2+extra) arrays with ``zm`` naming the
    extra columns ("", "z", "m", "zm"); global z/m buffers are built only
    if any row carries them (NaN elsewhere).
    """

    __slots__ = ("types", "geom_offsets", "part_offsets", "ring_offsets",
                 "_coords", "_zrings", "_mrings", "_any_z", "_any_m",
                 "_gc_meta")

    def __init__(self):
        self.types = []
        self.geom_offsets = [0]
        self.part_offsets = [0]
        self.ring_offsets = [0]
        self._coords = []
        self._zrings = []
        self._mrings = []
        self._any_z = False
        self._any_m = False
        self._gc_meta = {}      # row index -> [(child_type, n_parts), ...]

    def append_null(self):
        self.types.append(GT_MISSING)
        self.geom_offsets.append(self.geom_offsets[-1])

    def append_empty(self, gtype: int):
        self.types.append(gtype)
        self.geom_offsets.append(self.geom_offsets[-1])

    def append(self, gtype: int, parts, zm: str = ""):
        """parts: list of list of (k, 2+len(zm)) float arrays."""
        self.types.append(gtype)
        width = 2 + len(zm)
        zi = 2 if "z" in zm else None
        mi = (2 + ("z" in zm)) if "m" in zm else None
        for rings in parts:
            for ring in rings:
                ring = np.asarray(ring, dtype=np.float64).reshape(-1, width)
                self._coords.append(ring[:, :2])
                self._zrings.append(ring[:, zi] if zi is not None else None)
                self._mrings.append(ring[:, mi] if mi is not None else None)
                self.ring_offsets.append(self.ring_offsets[-1] + len(ring))
            self.part_offsets.append(self.part_offsets[-1] + len(rings))
        self.geom_offsets.append(self.geom_offsets[-1] + len(parts))
        self._any_z |= zi is not None
        self._any_m |= mi is not None

    def append_multipoint(self, coords):
        """Bulk MULTIPOINT append from an (n, 2) float64 coords array —
        offsets built with C-level range extends instead of the per-part
        python loop in append() (which costs ~0.5 s per 100k parts —
        the union_all point-dedupe hot path)."""
        coords = np.asarray(coords, dtype=np.float64).reshape(-1, 2)
        n = len(coords)
        if n == 0:
            self.append_empty(GT_MULTIPOINT)
            return
        self.types.append(GT_MULTIPOINT)
        self._coords.append(coords)
        self._zrings.append(None)
        self._mrings.append(None)
        r0 = self.ring_offsets[-1]
        self.ring_offsets.extend(range(r0 + 1, r0 + n + 1))
        p0 = self.part_offsets[-1]
        self.part_offsets.extend(range(p0 + 1, p0 + n + 1))
        self.geom_offsets.append(self.geom_offsets[-1] + n)

    def append_point(self, x: float, y: float, z: float = None,
                     m: float = None):
        self.types.append(GT_POINT)
        self._coords.append(np.array([[x, y]], dtype=np.float64))
        self._zrings.append(None if z is None else np.array([z], np.float64))
        self._mrings.append(None if m is None else np.array([m], np.float64))
        self._any_z |= z is not None
        self._any_m |= m is not None
        self.ring_offsets.append(self.ring_offsets[-1] + 1)
        self.part_offsets.append(self.part_offsets[-1] + 1)
        self.geom_offsets.append(self.geom_offsets[-1] + 1)

    def append_collection(self, children):
        """GEOMETRYCOLLECTION row: children = [(child_type, parts), ...]
        (standard nested parts format, 2-D)."""
        meta = [(int(ct), len(parts)) for ct, parts in children]
        row = len(self.types)
        flat = [rings for _, parts in children for rings in parts]
        self.append(GT_GEOMETRYCOLLECTION, flat)
        self._gc_meta[row] = meta

    def append_from(self, ga: GeometryArray, i: int):
        t = int(ga.types[i])
        if t == GT_MISSING:
            self.append_null()
            return
        if t == GT_GEOMETRYCOLLECTION:
            self.append_collection(ga.children_of(i))
            return
        zs = ga.dim_slice(ga.z, i)
        ms = ga.dim_slice(ga.m, i)
        if zs is None and ms is None:
            self.append(t, ga.geom_slices(i))
            return
        zm = ("z" if zs is not None else "") + ("m" if ms is not None else "")
        parts, pos = [], 0
        for rings in ga.geom_slices(i):
            out_rings = []
            for ring in rings:
                k = len(ring)
                cols = [ring]
                if zs is not None:
                    cols.append(zs[pos:pos + k, None])
                if ms is not None:
                    cols.append(ms[pos:pos + k, None])
                out_rings.append(np.hstack(cols))
                pos += k
            parts.append(out_rings)
        self.append(t, parts, zm=zm)

    def finish(self) -> GeometryArray:
        coords = (np.concatenate(self._coords, axis=0)
                  if self._coords else np.empty((0, 2), dtype=np.float64))

        def _dim(rings, any_flag):
            if not any_flag:
                return None
            out = np.full(len(coords), np.nan, dtype=np.float64)
            pos = 0
            for i, c in enumerate(self._coords):
                k = len(c)
                r = rings[i]
                if r is not None:
                    out[pos:pos + k] = r
                pos += k
            return out

        gc_meta = None
        if self._gc_meta:
            gc_meta = [self._gc_meta.get(i) for i in range(len(self.types))]
        return GeometryArray(
            np.array(self.types, dtype=np.uint8),
            np.array(self.geom_offsets, dtype=np.int64),
            np.array(self.part_offsets, dtype=np.int64),
            np.array(self.ring_offsets, dtype=np.int64),
            coords,
            z=_dim(self._zrings, self._any_z),
            m=_dim(self._mrings, self._any_m),
            gc_meta=gc_meta,
        )


def points_from_xy(x, y) -> GeometryArray:
    """Vectorized point construction (reference: geopandas/array.py:293-343).

    NaN in either coordinate produces POINT EMPTY? No — the reference
    produces a point with NaN coords; we mirror that (NULL handling is the
    caller's job via masks).
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n = len(x)
    coords = np.column_stack([x, y])
    ar = np.arange(n + 1, dtype=np.int64)
    return GeometryArray(np.full(n, GT_POINT, np.uint8), ar, ar.copy(), ar.copy(), coords)


def boxes_from_bounds(xmin, ymin, xmax, ymax) -> GeometryArray:
    """Vectorized axis-aligned box polygons (shapely.box analogue).

    Ring is CCW starting at (xmin, ymin), closed (5 coords), matching
    shapely.geometry.box(ccw=True) vertex order.
    """
    xmin = np.asarray(xmin, dtype=np.float64)
    ymin = np.asarray(ymin, dtype=np.float64)
    xmax = np.asarray(xmax, dtype=np.float64)
    ymax = np.asarray(ymax, dtype=np.float64)
    n = len(xmin)
    coords = np.empty((n * 5, 2), dtype=np.float64)
    coords[0::5, 0] = xmin; coords[0::5, 1] = ymin
    coords[1::5, 0] = xmax; coords[1::5, 1] = ymin
    coords[2::5, 0] = xmax; coords[2::5, 1] = ymax
    coords[3::5, 0] = xmin; coords[3::5, 1] = ymax
    coords[4::5, 0] = xmin; coords[4::5, 1] = ymin
    ar = np.arange(n + 1, dtype=np.int64)
    return GeometryArray(np.full(n, GT_POLYGON, np.uint8), ar, ar.copy(),
                         ar * 5, coords)
