"""Generate the Hilbert-key oracle fixture.

The engine's `st_hilbert` key for the oracle query `q_hilbert`
(customer points px=(c_custkey%1000), py=(c_custkey*7%1000), bounds
[0,1000]x[0,1000], level 15) depends only on m = c_custkey % 1000, so a
1000-row lookup table (m -> hkey) is a complete oracle. The keys here are
computed by an INDEPENDENT scalar implementation of the published
Hilbert xy->d algorithm (Wikipedia, "Hilbert curve", converting to and
from Hilbert curve index) — per-point scalar loop, not the engine's
vectorized numpy-mask kernel (geopandas_spark/geom/algos.py:2202), so a
vectorization bug in either implementation breaks the CORRECTNESS row.

Usage: python tools/make_hilbert_fixture.py  (writes fixtures/hilbert_mod1000.parquet)
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

LEVEL = 15
SIDE = 2 ** LEVEL


def xy2d_scalar(x: int, y: int, level: int = LEVEL) -> int:
    """Published Hilbert xy->d: MSB-first quadrant walk with rotate."""
    d = 0
    s = 2 ** (level - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        # rotate quadrant into canonical frame
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def grid_coord(v: float, lo: float, hi: float) -> int:
    """Mirror of hilbert_distance's continuous->discrete mapping."""
    t = (v - lo) / ((hi - lo) or 1.0) * (SIDE - 1)
    t = min(max(t, 0.0), SIDE - 1)
    return int(t)


def main() -> None:
    ms, keys = [], []
    for m in range(1000):
        px, py = float(m), float((m * 7) % 1000)
        x = grid_coord(px, 0.0, 1000.0)
        y = grid_coord(py, 0.0, 1000.0)
        ms.append(m)
        keys.append(xy2d_scalar(x, y))
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "fixtures", "hilbert_mod1000.parquet")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pq.write_table(
        pa.table({"m": pa.array(ms, pa.int64()),
                  "hkey": pa.array(keys, pa.int64())}), out)
    print(f"wrote {out} ({len(ms)} rows)")


if __name__ == "__main__":
    main()
