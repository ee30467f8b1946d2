"""CRS transforms (reference: to_crs geopandas/array.py:1098-1187).

pyproj (PROJ) is not available in this environment, so the common CRS
families get exact closed-form implementations and everything else gates
on an import-try of pyproj. CRS identity is tracked at the wrapper level
(column metadata convention, SURVEY §1.1), not per-value.

Built-in pairs:
- EPSG:4326 ↔ EPSG:3857 (spherical web mercator, exact closed form)
- EPSG:4326 ↔ EPSG:326xx/327xx (WGS84 UTM, ellipsoidal transverse
  Mercator via the published Karney–Krüger n^6 series — nanometre-level
  series truncation error; Newton inversion of the conformal latitude)
- compositions through EPSG:4326 (e.g. 3857 ↔ UTM)
"""

from __future__ import annotations

import numpy as np

_R = 6378137.0  # WGS84 spherical major axis used by EPSG:3857
_A = 6378137.0                       # WGS84 semi-major
_F = 1.0 / 298.257223563             # WGS84 flattening
_E = np.sqrt(_F * (2.0 - _F))        # first eccentricity
_K0 = 0.9996                         # UTM scale on the central meridian
_E0 = 500000.0                       # UTM false easting


def _norm(crs: str) -> str:
    c = str(crs).upper().replace(" ", "")
    if c in ("EPSG:4326", "OGC:CRS84", "WGS84", "4326"):
        return "EPSG:4326"
    if c in ("EPSG:3857", "EPSG:900913", "3857"):
        return "EPSG:3857"
    return c


def _utm_zone_of(crs: str):
    """EPSG:326xx/327xx → (zone, north) or None."""
    c = _norm(crs)
    if not c.startswith("EPSG:"):
        return None
    try:
        code = int(c[5:])
    except ValueError:
        return None
    if 32601 <= code <= 32660:
        return code - 32600, True
    if 32701 <= code <= 32760:
        return code - 32700, False
    return None


def _tm_series():
    """Rectifying radius + Krüger alpha/beta coefficients to n^6
    (published series: Karney 2011, 'Transverse Mercator with an accuracy
    of a few nanometers'; also the Wikipedia TM-series form)."""
    n = _F / (2.0 - _F)
    n2, n3, n4, n5, n6 = n**2, n**3, n**4, n**5, n**6
    A = _A / (1 + n) * (1 + n2 / 4 + n4 / 64 + n6 / 256)
    alpha = np.array([
        n / 2 - 2 * n2 / 3 + 5 * n3 / 16 + 41 * n4 / 180 - 127 * n5 / 288
        + 7891 * n6 / 37800,
        13 * n2 / 48 - 3 * n3 / 5 + 557 * n4 / 1440 + 281 * n5 / 630
        - 1983433 * n6 / 1935360,
        61 * n3 / 240 - 103 * n4 / 140 + 15061 * n5 / 26880
        + 167603 * n6 / 181440,
        49561 * n4 / 161280 - 179 * n5 / 168 + 6601661 * n6 / 7257600,
        34729 * n5 / 80640 - 3418889 * n6 / 1995840,
        212378941 * n6 / 319334400,
    ])
    beta = np.array([
        n / 2 - 2 * n2 / 3 + 37 * n3 / 96 - n4 / 360 - 81 * n5 / 512
        + 96199 * n6 / 604800,
        n2 / 48 + n3 / 15 - 437 * n4 / 1440 + 46 * n5 / 105
        - 1118711 * n6 / 3870720,
        17 * n3 / 480 - 37 * n4 / 840 - 209 * n5 / 4480 + 5569 * n6 / 90720,
        4397 * n4 / 161280 - 11 * n5 / 504 - 830251 * n6 / 7257600,
        4583 * n5 / 161280 - 108847 * n6 / 3991680,
        20648693 * n6 / 638668800,
    ])
    return A, alpha, beta


def utm_forward(lon, lat, zone: int, north: bool):
    """WGS84 geographic → UTM easting/northing (vectorized)."""
    A, alpha, _ = _tm_series()
    lon0 = zone * 6.0 - 183.0
    lam = np.radians(np.asarray(lon, float) - lon0)
    phi = np.radians(np.asarray(lat, float))
    tau = np.tan(phi)
    sigma = np.sinh(_E * np.arctanh(_E * tau / np.sqrt(1 + tau * tau)))
    taup = tau * np.sqrt(1 + sigma * sigma) - sigma * np.sqrt(1 + tau * tau)
    coslam = np.cos(lam)
    xi_p = np.arctan2(taup, coslam)
    eta_p = np.arcsinh(np.sin(lam) / np.sqrt(taup * taup + coslam * coslam))
    xi, eta = xi_p.copy(), eta_p.copy()
    for j, a in enumerate(alpha, start=1):
        xi += a * np.sin(2 * j * xi_p) * np.cosh(2 * j * eta_p)
        eta += a * np.cos(2 * j * xi_p) * np.sinh(2 * j * eta_p)
    E = _E0 + _K0 * A * eta
    N = (0.0 if north else 10000000.0) + _K0 * A * xi
    return E, N


def utm_inverse(E, N, zone: int, north: bool):
    """UTM easting/northing → WGS84 geographic (vectorized)."""
    A, _, beta = _tm_series()
    lon0 = zone * 6.0 - 183.0
    xi = (np.asarray(N, float) - (0.0 if north else 10000000.0)) / (_K0 * A)
    eta = (np.asarray(E, float) - _E0) / (_K0 * A)
    xi_p, eta_p = xi.copy(), eta.copy()
    for j, b in enumerate(beta, start=1):
        xi_p -= b * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        eta_p -= b * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
    taup = np.sin(xi_p) / np.sqrt(np.sinh(eta_p) ** 2 + np.cos(xi_p) ** 2)
    # Newton-invert the conformal latitude (quadratic convergence)
    tau = taup.copy()
    e2 = _E * _E
    for _ in range(6):
        sigma = np.sinh(_E * np.arctanh(_E * tau / np.sqrt(1 + tau * tau)))
        taupi = (tau * np.sqrt(1 + sigma * sigma)
                 - sigma * np.sqrt(1 + tau * tau))
        dtau = ((taup - taupi) * (1 + (1 - e2) * tau * tau)
                / ((1 - e2) * np.sqrt((1 + taupi * taupi)
                                      * (1 + tau * tau))))
        tau = tau + dtau
    lat = np.degrees(np.arctan(tau))
    lon = lon0 + np.degrees(np.arctan2(np.sinh(eta_p), np.cos(xi_p)))
    return lon, lat


def transform_coords(coords: np.ndarray, src: str, dst: str) -> np.ndarray:
    """(N,2) coordinate transform. Closed form for 4326↔3857 and
    4326↔UTM (compositions via 4326); pyproj for anything else when
    importable."""
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
    dz = _utm_zone_of(d)
    if s == "EPSG:4326" and dz is not None:
        E, N = utm_forward(coords[:, 0], coords[:, 1], *dz)
        return np.column_stack([E, N])
    sz = _utm_zone_of(s)
    if sz is not None and d == "EPSG:4326":
        lon, lat = utm_inverse(coords[:, 0], coords[:, 1], *sz)
        return np.column_stack([lon, lat])
    if sz is not None or dz is not None or "EPSG:3857" in (s, d):
        # compose through geographic coordinates
        if s != "EPSG:4326" and (sz is not None or s == "EPSG:3857"):
            mid = transform_coords(coords, s, "EPSG:4326")
            return transform_coords(mid, "EPSG:4326", d)
    try:
        from pyproj import Transformer
    except ImportError as e:
        raise NotImplementedError(
            f"transform {src}->{dst} needs pyproj (not installed); built-in "
            "closed forms cover EPSG:4326 <-> EPSG:3857 and WGS84 UTM "
            "(EPSG:326xx/327xx)") from e
    tr = Transformer.from_crs(s, d, always_xy=True)
    x, y = tr.transform(coords[:, 0], coords[:, 1])
    return np.column_stack([x, y])


def transform(ga, src: str, dst: str):
    """GeometryArray reprojection — one vectorized pass over the flat
    coordinate buffer (the same shape as the reference's
    shapely.transform(geoms, transformer.transform))."""
    from geopandas_spark.geom.algos import _with_coords

    nc = transform_coords(ga.coords, src, dst)
    return _with_coords(ga, np.asarray(nc, dtype=np.float64))


def estimate_utm_crs(lon: float, lat: float) -> str:
    """UTM CRS for a lon/lat centroid (reference: estimate_utm_crs,
    geopandas/array.py:1190-1270 — same zone arithmetic, minus the pyproj
    database query)."""
    zone = int((lon + 180.0) // 6.0) + 1
    zone = min(max(zone, 1), 60)
    return f"EPSG:{32600 + zone if lat >= 0 else 32700 + zone}"
