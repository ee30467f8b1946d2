"""CRS transforms (reference: to_crs geopandas/array.py:1098-1187).

pyproj (PROJ) is not available in this environment, so the two most common
web-mapping CRS pairs get exact closed-form implementations and everything
else gates on an import-try of pyproj. CRS identity is tracked at the
wrapper level (column metadata convention, SURVEY §1.1), not per-value.
"""

from __future__ import annotations

import numpy as np

_R = 6378137.0  # WGS84 spherical major axis used by EPSG:3857


def _norm(crs: str) -> str:
    c = str(crs).upper().replace(" ", "")
    if c in ("EPSG:4326", "OGC:CRS84", "WGS84", "4326"):
        return "EPSG:4326"
    if c in ("EPSG:3857", "EPSG:900913", "3857"):
        return "EPSG:3857"
    return c


def transform_coords(coords: np.ndarray, src: str, dst: str) -> np.ndarray:
    """(N,2) coordinate transform. Closed form for 4326↔3857; pyproj for
    anything else when importable."""
    s, d = _norm(src), _norm(dst)
    if s == d or len(coords) == 0:
        return coords.copy()
    if (s, d) == ("EPSG:4326", "EPSG:3857"):
        x = np.radians(coords[:, 0]) * _R
        y = np.log(np.tan(np.pi / 4 + np.radians(coords[:, 1]) / 2)) * _R
        return np.column_stack([x, y])
    if (s, d) == ("EPSG:3857", "EPSG:4326"):
        lon = np.degrees(coords[:, 0] / _R)
        lat = np.degrees(2 * np.arctan(np.exp(coords[:, 1] / _R)) - np.pi / 2)
        return np.column_stack([lon, lat])
    try:
        from pyproj import Transformer
    except ImportError as e:
        raise NotImplementedError(
            f"transform {src}->{dst} needs pyproj (not installed); built-in "
            "closed forms cover EPSG:4326 <-> EPSG:3857") from e
    tr = Transformer.from_crs(s, d, always_xy=True)
    x, y = tr.transform(coords[:, 0], coords[:, 1])
    return np.column_stack([x, y])


def transform(ga, src: str, dst: str):
    """GeometryArray reprojection — one vectorized pass over the flat
    coordinate buffer (the same shape as the reference's
    shapely.transform(geoms, transformer.transform))."""
    from geopandas_spark.geom.array import GeometryArray

    nc = transform_coords(ga.coords, src, dst)
    return GeometryArray(ga.types, ga.geom_offsets, ga.part_offsets,
                         ga.ring_offsets, np.asarray(nc, dtype=np.float64))


def estimate_utm_crs(lon: float, lat: float) -> str:
    """UTM CRS for a lon/lat centroid (reference: estimate_utm_crs,
    geopandas/array.py:1190-1270 — same zone arithmetic, minus the pyproj
    database query)."""
    zone = int((lon + 180.0) // 6.0) + 1
    zone = min(max(zone, 1), 60)
    return f"EPSG:{32600 + zone if lat >= 0 else 32700 + zone}"
