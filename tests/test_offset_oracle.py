"""Independent oracles for offset_curve, single-sided buffer, and
mitre-join buffer (r12, VERDICT r11 #6b).

The r11 positive-round-buffer oracle covers round caps/joins only;
these suites referee the remaining constructive surfaces with
closed-form or geometric-invariant checks that share no code with the
construction kernels:

* offset_curve — every output vertex sits at the offset distance from
  the input polyline (for gentle inputs whose local feature size far
  exceeds |d|), on the correct side; sampled chord midpoints dip below
  by at most the arc-chord sagitta.
* single-sided buffer — a single segment's one-sided buffer is exactly
  the L x d rectangle; on gentle polylines membership probes at d/2 on
  the buffered side are inside, the unbuffered side and beyond-the-end
  probes are outside (flat caps).
* mitre buffer of a CONVEX polygon — closed form, no discretization:
  area == A + P*d + d^2 * sum(tan(phi_i / 2)) over the exterior turn
  angles phi_i (each corner contributes a kite of two right triangles).
"""

import numpy as np
import pytest

from geopandas_spark.geom import algos, wkt
from geopandas_spark.geom.algos import _point_seg_dist


def _polyline(rng, n=8, seg=(5.0, 10.0), max_turn=0.8):
    """Gentle random polyline: bounded turning, long segments."""
    pts = [np.zeros(2)]
    heading = rng.uniform(0, 2 * np.pi)
    for _ in range(n):
        heading += rng.uniform(-max_turn, max_turn)
        step = rng.uniform(*seg)
        pts.append(pts[-1] + step * np.array([np.cos(heading),
                                              np.sin(heading)]))
    return np.array(pts)


def _ga_line(pts):
    w = "LINESTRING (" + ", ".join(f"{x} {y}" for x, y in pts) + ")"
    return wkt.parse_array([w])


def _segs(pts):
    return np.stack([pts[:-1], pts[1:]], axis=1)


def _side_of(pts, p):
    """Sign of the cross product at p's nearest segment (+1 = left)."""
    segs = _segs(pts)
    a, b = segs[:, 0], segs[:, 1]
    ab = b - a
    denom = (ab * ab).sum(-1)
    t = np.clip(((p - a) * ab).sum(-1) / np.where(denom == 0, 1, denom),
                0, 1)
    proj = a + t[:, None] * ab
    d = np.hypot(*(p - proj).T)
    k = int(np.argmin(d))
    return np.sign(ab[k, 0] * (p[1] - a[k, 1]) - ab[k, 1] * (p[0] - a[k, 0]))


class TestOffsetCurveOracle:
    def test_vertices_on_offset_band_and_side(self):
        rng = np.random.default_rng(121)
        for trial in range(40):
            pts = _polyline(rng)
            d = float(rng.uniform(0.3, 1.0)) * (1 if trial % 2 else -1)
            out = algos.offset_curve(_ga_line(pts), d)
            assert not bool(out.is_empty()[0]), (trial, d)
            segs = _segs(pts)
            for part in out.geom_slices(0):
                verts = part[0]
                dist = _point_seg_dist(verts, segs)
                assert np.all(dist >= abs(d) * (1 - 1e-9)), (trial, d)
                assert np.all(dist <= abs(d) * (1 + 1e-9)), (trial, d)
                for v in verts:
                    assert _side_of(pts, v) == np.sign(d), (trial, d)

    def test_chord_midpoints_within_sagitta(self):
        rng = np.random.default_rng(313)
        for trial in range(20):
            pts = _polyline(rng)
            d = float(rng.uniform(0.4, 0.9))
            out = algos.offset_curve(_ga_line(pts), d, quad_segs=16)
            segs = _segs(pts)
            # arc step <= (pi/2)/16 -> chord midpoint sagitta bound
            lo = d * np.cos((np.pi / 2) / 16 / 2) * (1 - 1e-9)
            for part in out.geom_slices(0):
                verts = part[0]
                mids = 0.5 * (verts[:-1] + verts[1:])
                dist = _point_seg_dist(mids, segs)
                assert np.all(dist >= lo), trial
                assert np.all(dist <= d * (1 + 1e-9)), trial


class TestSingleSidedBufferOracle:
    def test_single_segment_is_exact_rectangle(self):
        rng = np.random.default_rng(77)
        for _ in range(20):
            a = rng.uniform(-50, 50, 2)
            b = rng.uniform(-50, 50, 2)
            L = float(np.hypot(*(b - a)))
            if L < 1:
                continue
            d = float(rng.uniform(0.2, 2.0))
            ga = _ga_line(np.array([a, b]))
            for sd in (d, -d):
                out = algos.buffer(ga, sd, single_sided=True)
                area = float(algos.area(out)[0])
                assert area == pytest.approx(L * d, rel=1e-12)
                per = float(algos.length(out)[0])
                assert per == pytest.approx(2 * L + 2 * d, rel=1e-12)

    def test_membership_probes_gentle_polyline(self):
        rng = np.random.default_rng(99)
        for trial in range(25):
            pts = _polyline(rng, n=6)
            d = float(rng.uniform(0.3, 1.0))
            ga = _ga_line(pts)
            out = algos.buffer(ga, d, single_sided=True)   # left side
            segs = _segs(pts)
            mids = 0.5 * (segs[:, 0] + segs[:, 1])
            ab = segs[:, 1] - segs[:, 0]
            nrm = np.stack([-ab[:, 1], ab[:, 0]], axis=1)
            nrm /= np.hypot(nrm[:, 0], nrm[:, 1])[:, None]
            inside_pts = mids + 0.5 * d * nrm      # left, within band
            outside_pts = mids - 0.5 * d * nrm     # right side
            far_pts = mids + 1.6 * d * nrm         # beyond the band
            for p in inside_pts:
                assert algos.points_in_geom(
                    np.array([p[0]]), np.array([p[1]]), out, 0)[0] > 0, \
                    (trial, p)
            for p in np.vstack([outside_pts, far_pts]):
                # probes near a concave corner's overlap zone can
                # legitimately fall inside; skip ones whose distance to
                # the LINE is ambiguous for the right side
                dd = _point_seg_dist(p[None, :], segs)[0]
                if dd < 0.45 * d or dd > 1.55 * d:
                    continue
                side = _side_of(pts, p)
                if side < 0:            # right of the line: never inside
                    assert algos.points_in_geom(
                        np.array([p[0]]), np.array([p[1]]), out, 0)[0] \
                        == 0, (trial, p)

    def test_flat_end_caps(self):
        # straight horizontal segment: beyond-end probes outside even
        # at the buffered side's lateral offset
        ga = _ga_line(np.array([[0.0, 0.0], [10.0, 0.0]]))
        out = algos.buffer(ga, 1.0, single_sided=True)
        for x, y, want in [(-0.5, 0.5, 0), (10.5, 0.5, 0),
                           (0.5, 0.5, 2), (9.5, 0.5, 2),
                           (5.0, -0.5, 0)]:
            got = algos.points_in_geom(np.array([x]), np.array([y]),
                                       out, 0)[0]
            assert (got > 0) == (want > 0), (x, y)


class TestMitreBufferOracle:
    def test_convex_polygon_mitre_area_closed_form(self):
        """area(mitre buffer) == A + P*d + d^2 * sum(tan(phi/2)) —
        exact for convex input with an unreachable mitre limit."""
        rng = np.random.default_rng(2024)
        for trial in range(30):
            pts = rng.uniform(0, 40, (int(rng.integers(6, 20)), 2))
            hull = algos.convex_hull(wkt.parse_array(
                ["MULTIPOINT (" + ", ".join(
                    f"({x} {y})" for x, y in pts) + ")"]))
            if int(hull.types[0]) != 3:
                continue
            ring = hull.geom_slices(0)[0][0]
            body = ring[:-1]
            k = len(body)
            if k < 3:
                continue
            A = float(algos.area(hull)[0])
            P = float(algos.length(hull)[0])
            # exterior turn angles
            tansum = 0.0
            for i in range(k):
                u = body[(i + 1) % k] - body[i]
                v = body[(i + 2) % k] - body[(i + 1) % k]
                cr = u[0] * v[1] - u[1] * v[0]
                dt = u @ v
                phi = np.arctan2(abs(cr), dt)
                tansum += np.tan(phi / 2)
            d = float(rng.uniform(0.5, 3.0))
            buf = algos.buffer(hull, d, join_style="mitre",
                               mitre_limit=1e9)
            got = float(algos.area(buf)[0])
            want = A + P * d + d * d * tansum
            assert got == pytest.approx(want, rel=1e-9), (trial, d)

    def test_mitre_limit_falls_back_to_bevel(self):
        """A needle triangle's sharp tip exceeds mitre_limit=2: the
        buffered area must land strictly between the bevel area and
        the unlimited-mitre area."""
        w = "POLYGON ((0 0, 40 0, 0 1.2, 0 0))"
        ga = wkt.parse_array([w])
        d = 1.0
        full = float(algos.area(algos.buffer(
            ga, d, join_style="mitre", mitre_limit=1e9))[0])
        bev = float(algos.area(algos.buffer(
            ga, d, join_style="bevel"))[0])
        lim = float(algos.area(algos.buffer(
            ga, d, join_style="mitre", mitre_limit=2.0))[0])
        assert bev < full
        assert bev <= lim * (1 + 1e-12)
        assert lim < full
