"""Deterministic scale-up of a driver testdata dir (default ×10: sf0.1 →
sf1-equivalent) for the bench's scale tier.

Replicates every table ``factor`` times with per-replica key offsets so
primary/foreign keys stay consistent (replica i of orders still joins
replica i of customer) and join fan-out stays linear in the factor — a
naive UNION ALL without offsets would square the matched pairs. Offsets are
``maxkey + 7`` so the key-derived geometry fixtures (FIXTURES.md:
``x = c_custkey % 1000``) shift by 7·i per replica instead of stacking
10 identical points — preserving realistic density for the spatial
workloads. nation/region keep their TPC-H fixed cardinality (the 5×5
nation-box grid is the join target at every SF, mirroring how TPC-H holds
them constant).

Pure pyarrow (no Spark session needed); ~170 MB output, runs in seconds.
Usage: python tools/make_scale.py [src_dir] [dst_dir] [factor]
"""

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# per-table key columns and the offset "family" each belongs to — columns
# in the same family shift by the same constant so FKs keep matching
KEYS = {
    "customer": {"c_custkey": "cust"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "order", "l_partkey": "part",
                 "l_suppkey": "supp"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
    "events": {"event_id": "event"},
}
FIXED = ("nation", "region")


def scale_dir(src: str, dst: str, factor: int = 10) -> None:
    os.makedirs(dst, exist_ok=True)
    # offset per family = max over all key columns of that family + 7
    fam_max = {}
    tables = {}
    for name, keymap in KEYS.items():
        p = os.path.join(src, f"{name}.parquet")
        if not os.path.exists(p):
            continue
        t = pq.read_table(p)
        tables[name] = t
        for col, fam in keymap.items():
            m = pc.max(t[col]).as_py() or 0
            fam_max[fam] = max(fam_max.get(fam, 0), int(m))
    offsets = {fam: m + 7 for fam, m in fam_max.items()}

    for name in FIXED:
        p = os.path.join(src, f"{name}.parquet")
        if os.path.exists(p):
            pq.write_table(pq.read_table(p), os.path.join(dst, f"{name}.parquet"))

    for name, t in tables.items():
        # one part file per replica under a table.parquet/ directory:
        # Spark assigns one input split per file, so every scaled table
        # scans with `factor`-way parallelism out of the box (a single
        # concatenated file stays one split below maxPartitionBytes and
        # serializes every downstream stage — measured 3-17× slowdowns on
        # the scan-bound headline queries)
        tdir = os.path.join(dst, f"{name}.parquet")
        if os.path.isfile(tdir):
            os.remove(tdir)
        os.makedirs(tdir, exist_ok=True)
        for i in range(factor):
            r = t
            if i > 0:
                for col, fam in KEYS[name].items():
                    idx = r.schema.get_field_index(col)
                    shifted = pc.add(r[col], i * offsets[fam])
                    r = r.set_column(idx, r.schema.field(idx),
                                     shifted.cast(r.schema.field(idx).type))
            pq.write_table(r, os.path.join(tdir, f"part-{i:03d}.parquet"),
                           row_group_size=1 << 18)


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else \
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".bench", "sf1")
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    scale_dir(src, dst, factor)
    print(f"wrote {dst} (factor {factor})")
