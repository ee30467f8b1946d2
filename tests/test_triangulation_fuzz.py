"""r13 degeneracy fuzz for Delaunay / Voronoi / CDT and a coverage
referee (VERDICT r12 #7a/#7b).

Referees are INDEPENDENT of the implementation:

* Delaunay — the defining property: no input site strictly inside any
  output triangle's circumcircle (checked O(T·n), n kept small); plus
  union area == convex hull area and per-part validity. Degenerate
  inputs: cocircular sites, grid lattices (every quad cocircular),
  collinear runs, exact duplicates, near-duplicates (1e-12 apart).
* Voronoi — sampled nearest-site referee: random probe points inside
  the site extent must land in the cell of their nearest site (interior
  probes only; ties skipped); plus the cells form a valid coverage and
  tile their clip envelope.
* CDT — triangles tile the input polygon exactly (area sum == polygon
  area), every triangle valid, and every polygon boundary segment
  appears as a triangulation edge.
* Coverage — synthesized grids with KNOWN defect counts: a perfect grid
  is a valid coverage; shrinking k interior cells breaks validity and
  invalid_coverage_edges flags a non-empty edge set for the shrunk
  cells' neighborhoods; simplify_coverage on a valid coverage preserves
  validity, total area, and pairwise non-overlap.
"""

import numpy as np
import pytest

from geopandas_spark.geom import algos, wkt
from geopandas_spark.geom.array import GeometryBuilder


def _multipoint(pts):
    b = GeometryBuilder()
    b.append_multipoint(np.asarray(pts, dtype=float))
    return b.finish()


def _circumcircle(a, b, c):
    """(center, r2) of the triangle's circumcircle, or None if collinear."""
    ax, ay = a
    bx, by = b
    cx, cy = c
    d = 2.0 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
    if abs(d) < 1e-300:
        return None
    ux = ((ax * ax + ay * ay) * (by - cy) + (bx * bx + by * by) * (cy - ay)
          + (cx * cx + cy * cy) * (ay - by)) / d
    uy = ((ax * ax + ay * ay) * (cx - bx) + (bx * bx + by * by) * (ax - cx)
          + (cx * cx + cy * cy) * (bx - ax)) / d
    r2 = (ax - ux) ** 2 + (ay - uy) ** 2
    return (ux, uy), r2


def _check_delaunay(pts, rel_tol=1e-9):
    ga = _multipoint(pts)
    dt = algos.delaunay_triangles(ga)
    upts = np.unique(np.asarray(pts, dtype=float), axis=0)
    hull = algos.convex_hull(ga)
    hull_area = float(algos.area(hull)[0])
    if hull_area == 0.0 or len(upts) < 3:
        assert algos.count_geometries(dt)[0] == 0
        return
    tris, _p, _o = algos.get_parts(dt)
    assert algos.is_valid(tris).all()
    total = float(algos.area(tris).sum())
    assert total == pytest.approx(hull_area, rel=1e-9), (total, hull_area)
    # empty-circumcircle: no site strictly inside (tolerance-scaled)
    scale = float(np.abs(upts).max() + 1.0)
    for t in range(len(tris)):
        ring = tris.coords[tris.ring_offsets[t]:tris.ring_offsets[t + 1]]
        cc = _circumcircle(ring[0], ring[1], ring[2])
        if cc is None:
            continue
        (ux, uy), r2 = cc
        d2 = (upts[:, 0] - ux) ** 2 + (upts[:, 1] - uy) ** 2
        inside = d2 < r2 - rel_tol * scale * scale * max(r2, 1.0)
        assert not inside.any(), (
            f"site strictly inside circumcircle of triangle {t}: "
            f"{upts[inside][:3]}")


class TestDelaunayDegenerate:
    def test_cocircular_sites(self):
        for n in (4, 6, 8, 12, 16):
            ang = 2 * np.pi * np.arange(n) / n
            pts = np.stack([np.cos(ang), np.sin(ang)], axis=1) * 10
            _check_delaunay(pts)

    def test_cocircular_plus_center(self):
        ang = 2 * np.pi * np.arange(10) / 10
        pts = np.vstack([np.stack([np.cos(ang), np.sin(ang)], axis=1),
                         [[0.0, 0.0]]])
        _check_delaunay(pts)

    def test_grid_lattice(self):
        for nx, ny in ((3, 3), (4, 5), (6, 2)):
            xs, ys = np.meshgrid(np.arange(nx, dtype=float),
                                 np.arange(ny, dtype=float))
            _check_delaunay(np.stack([xs.ravel(), ys.ravel()], axis=1))

    def test_collinear_runs(self):
        # fully collinear → empty
        _check_delaunay([[i, 2.0 * i] for i in range(8)])
        # collinear run + one apex
        _check_delaunay([[i, 0.0] for i in range(8)] + [[3.5, 4.0]])
        # two parallel collinear runs
        _check_delaunay([[i, 0.0] for i in range(5)] +
                        [[i + 0.5, 1.0] for i in range(5)])

    def test_duplicates_and_near_duplicates(self):
        pts = [[0, 0], [4, 0], [4, 4], [0, 4], [2, 2],
               [0, 0], [4, 4], [2, 2]]
        _check_delaunay(pts)
        near = [[0, 0], [4, 0], [4, 4], [0, 4],
                [2, 2], [2 + 1e-12, 2 - 1e-12]]
        ga = _multipoint(near)
        dt = algos.delaunay_triangles(ga)
        tris, _p, _o = algos.get_parts(dt)
        assert algos.is_valid(tris).all()
        assert float(algos.area(tris).sum()) == pytest.approx(16.0, rel=1e-6)

    def test_random_clusters_fuzz(self):
        rng = np.random.default_rng(97)
        for trial in range(15):
            n = int(rng.integers(3, 40))
            base = rng.uniform(-100, 100, (n, 2))
            mode = trial % 3
            if mode == 1:       # quantized → many cocircular quadruples
                base = np.round(base / 10) * 10
            elif mode == 2:     # inject duplicates
                base = np.vstack([base, base[rng.integers(0, n, 5)]])
            _check_delaunay(base)


class TestVoronoiDegenerate:
    def _check(self, pts, nprobe=150, seed=5):
        rng = np.random.default_rng(seed)
        ga = _multipoint(pts)
        vp = algos.voronoi_polygons(ga)
        upts = np.unique(np.asarray(pts, dtype=float), axis=0)
        cells, _p, _o = algos.get_parts(vp)
        if len(upts) < 2:
            return
        assert len(cells) == len(upts)
        assert algos.is_valid(cells).all()
        assert algos.is_valid_coverage(cells)
        # cells tile their joint envelope
        cb = algos.bounds(cells)
        ext = ((cb[:, 2].max() - cb[:, 0].min()) *
               (cb[:, 3].max() - cb[:, 1].min()))
        assert float(algos.area(cells).sum()) == pytest.approx(ext, rel=1e-9)
        # sampled nearest-site referee: which cell contains each probe?
        x0, y0 = cb[:, 0].min(), cb[:, 1].min()
        x1, y1 = cb[:, 2].max(), cb[:, 3].max()
        probes = np.stack([rng.uniform(x0, x1, nprobe),
                           rng.uniform(y0, y1, nprobe)], axis=1)
        pb = GeometryBuilder()
        for p in probes:
            pb.append_point(p[0], p[1])
        pga = pb.finish()
        checked = 0
        for j in range(nprobe):
            d2 = ((upts[:, 0] - probes[j, 0]) ** 2 +
                  (upts[:, 1] - probes[j, 1]) ** 2)
            order = np.argsort(d2)
            if d2[order[1]] - d2[order[0]] < 1e-6:
                continue                      # near-tie: boundary probe
            nearest = order[0]
            one = pga.take(np.full(len(cells), j))
            cover = algos.covers(cells, one)
            assert cover[nearest], (
                f"probe {probes[j]} not covered by nearest cell "
                f"{upts[nearest]}")
            strict = cover & (algos.covered_by(
                one, algos.boundary(cells)) == False)  # noqa: E712
            # the probe must not be INTERIOR to any other cell
            for c in np.nonzero(strict)[0]:
                assert c == nearest, (
                    f"probe {probes[j]} interior to cell {upts[c]} but "
                    f"nearest is {upts[nearest]}")
            checked += 1
        assert checked > nprobe // 2          # referee actually ran

    def test_cocircular(self):
        ang = 2 * np.pi * np.arange(8) / 8
        self._check(np.stack([np.cos(ang), np.sin(ang)], axis=1) * 10)

    def test_grid(self):
        xs, ys = np.meshgrid(np.arange(4, dtype=float),
                             np.arange(4, dtype=float))
        self._check(np.stack([xs.ravel(), ys.ravel()], axis=1) * 3)

    def test_collinear_sites(self):
        self._check([[float(i), 0.0] for i in range(6)])

    def test_duplicates(self):
        self._check([[0, 0], [4, 0], [2, 3], [0, 0], [4, 0]])

    def test_random_fuzz(self):
        rng = np.random.default_rng(41)
        for trial in range(8):
            n = int(rng.integers(2, 24))
            pts = rng.uniform(-50, 50, (n, 2))
            if trial % 2:
                pts = np.round(pts / 5) * 5
            self._check(pts, seed=trial)


class TestCDTDegenerate:
    def _check(self, wkt_str):
        ga = wkt.parse_array([wkt_str] * 32)
        r = algos.constrained_delaunay_triangles(ga)
        tris, _p, _o = algos.get_parts(r.take([0]))
        assert algos.is_valid(tris).all()
        src_area = float(algos.area(ga)[0])
        assert float(algos.area(tris).sum()) == pytest.approx(
            src_area, rel=1e-9)
        # every boundary segment of the polygon appears as a triangle edge
        poly = ga.take([0])
        seg_set = set()
        for t in range(len(tris)):
            ring = tris.coords[tris.ring_offsets[t]:tris.ring_offsets[t + 1]]
            for i in range(3):
                a = tuple(np.round(ring[i], 9))
                b = tuple(np.round(ring[i + 1], 9))
                seg_set.add((a, b))
                seg_set.add((b, a))
        for r0, r1 in zip(poly.ring_offsets[:-1], poly.ring_offsets[1:]):
            ring = poly.coords[r0:r1]
            for i in range(len(ring) - 1):
                a = tuple(np.round(ring[i], 9))
                b = tuple(np.round(ring[i + 1], 9))
                assert (a, b) in seg_set, (wkt_str, a, b)

    def test_convex(self):
        self._check("POLYGON ((0 0, 8 0, 8 6, 0 6, 0 0))")

    def test_reflex_star(self):
        self._check("POLYGON ((0 0, 4 1, 8 0, 7 4, 8 8, 4 7, 0 8, 1 4, 0 0))")

    def test_spike(self):
        self._check("POLYGON ((0 0, 10 0, 10 1, 5 0.9, 0 1, 0 0))")

    def test_collinear_boundary_vertices(self):
        self._check("POLYGON ((0 0, 2 0, 4 0, 6 0, 6 4, 3 4, 0 4, 0 2, 0 0))")

    def test_with_hole(self):
        self._check("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), "
                    "(3 3, 7 3, 7 7, 3 7, 3 3))")


def _grid_cells(nx, ny, size=10.0):
    rows = []
    for gy in range(ny):
        for gx in range(nx):
            x0, y0 = gx * size, gy * size
            rows.append(f"POLYGON (({x0} {y0}, {x0 + size} {y0}, "
                        f"{x0 + size} {y0 + size}, {x0} {y0 + size}, "
                        f"{x0} {y0}))")
    return wkt.parse_array(rows)


class TestCoverageReferee:
    def test_perfect_grid_is_valid(self):
        for nx, ny in ((3, 3), (6, 5)):
            ga = _grid_cells(nx, ny)
            assert algos.is_valid_coverage(ga)
            edges = algos.invalid_coverage_edges(ga)
            assert edges.is_empty().all()

    def test_known_defects_detected(self):
        rng = np.random.default_rng(13)
        for ndef in (1, 2, 4):
            ga = _grid_cells(5, 5)
            # shrink `ndef` interior cells by 0.5 on one side → gaps
            # against their right neighbor
            idx = rng.choice(
                [r for r in range(25) if r % 5 not in (0, 4)
                 and 5 <= r < 20], size=ndef, replace=False)
            b = GeometryBuilder()
            for r in range(len(ga)):
                if r in idx:
                    x0 = (r % 5) * 10.0
                    y0 = (r // 5) * 10.0
                    ring = np.array([[x0, y0], [x0 + 9.5, y0],
                                     [x0 + 9.5, y0 + 10], [x0, y0 + 10],
                                     [x0, y0]])
                    b.append(3, [[ring]])
                else:
                    b.append_from(ga, r)
            broken = b.finish()
            # gap defects: invalid only through the gap_width lens (the
            # r13 fuzz find — the kwarg used to be silently ignored)
            assert not algos.is_valid_coverage(broken, gap_width=1.0)
            assert algos.is_valid_coverage(broken, gap_width=0.4)
            edges = algos.invalid_coverage_edges(broken, gap_width=1.0)
            flagged = ~edges.is_empty()
            assert flagged.any()
            # the flagged rows border the shrunk cells (the shrunk cell
            # and/or its right neighbor)
            near = set()
            for r in idx:
                near |= {r, r + 1}
            assert set(np.nonzero(flagged)[0]) <= near, (
                idx, np.nonzero(flagged)[0])

    def test_overlap_detected(self):
        ga = _grid_cells(4, 4)
        b = GeometryBuilder()
        for r in range(len(ga)):
            if r == 5:      # grow one interior cell → overlaps neighbors
                x0, y0 = (r % 4) * 10.0, (r // 4) * 10.0
                ring = np.array([[x0, y0], [x0 + 11, y0], [x0 + 11, y0 + 10],
                                 [x0, y0 + 10], [x0, y0]])
                b.append(3, [[ring]])
            else:
                b.append_from(ga, r)
        broken = b.finish()
        assert not algos.is_valid_coverage(broken)
        assert (~algos.invalid_coverage_edges(broken).is_empty()).any()

    def test_simplify_preserves_coverage(self):
        # grid with densified shared edges (extra collinear vertices)
        rows = []
        for gy in range(3):
            for gx in range(3):
                x0, y0 = gx * 10.0, gy * 10.0
                pts = [(x0, y0), (x0 + 5, y0), (x0 + 10, y0),
                       (x0 + 10, y0 + 5), (x0 + 10, y0 + 10),
                       (x0 + 5, y0 + 10), (x0, y0 + 10), (x0, y0 + 5),
                       (x0, y0)]
                rows.append("POLYGON ((" +
                            ", ".join(f"{x} {y}" for x, y in pts) + "))")
        ga = wkt.parse_array(rows)
        assert algos.is_valid_coverage(ga)
        simp = algos.simplify_coverage(ga, tolerance=2.0)
        assert algos.is_valid_coverage(simp)
        np.testing.assert_allclose(algos.area(simp).sum(),
                                   algos.area(ga).sum(), rtol=1e-12)
        assert algos.is_valid(simp).all()
