"""Build a larger measurement-only replica of the driver's sf tables.

The driver's round-end MEASUREMENT runs at a scale factor it generates
itself (BENCH_r05.json: sf=1.0) while /root/testdata ships only up to
sf0.1.  For optimization work we need a local dataset of the graded size;
this tool scales the sf0.1 fixtures by an integer factor k (default 10)
with the same physical layout the driver uses (one parquet file per
table, pyarrow-default 1Mi-row row groups — lineitem lands at 6 row
groups exactly like the driver's sf1.0 file).

NOT driver data and NEVER used by bench.py/oracle paths unless pointed
at explicitly via SPARK_GRAFT_SF_DIR.  Row values are derived, not
regenerated: copy c != 0 shifts every primary/foreign key family by
c * (max_key + 1) so keys stay disjoint and FK joins stay consistent,
and document text is half-spliced across a copy-dependent partner doc so
copies are neither exact nor near duplicates of the originals (a plain
10x duplication would explode every near-dup pair join ~45x and make
the replica unrepresentative).

Usage:
    python tools/make_sf_replica.py --src /root/testdata/sf0.1 \
        --out /root/sfrep/sf1.0 --k 10
"""

from __future__ import annotations

import argparse
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# key column -> family; every column in a family gets the same per-copy
# offset (max over every occurrence of the family + 1, times copy index).
FAMILIES = {
    "customer": {"c_custkey": "custkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {"l_orderkey": "orderkey", "l_partkey": "partkey", "l_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "documents": {"doc_id": "doc_id"},
    "events": {"event_id": "event_id", "user_id": "user_id"},
    "embeddings": {"vec_id": "vec_id"},
}
SMALL = ("region", "nation")  # fixed-size dimension tables: copied verbatim


def _family_offsets(tables: dict[str, pa.Table]) -> dict[str, int]:
    off: dict[str, int] = {}
    for t, cols in FAMILIES.items():
        for col, fam in cols.items():
            m = pc.max(tables[t][col]).as_py()
            off[fam] = max(off.get(fam, 0), int(m) + 1)
    return off


def _splice_texts(texts: list[str | None], c: int) -> list[str | None]:
    """Half-splice doc i with partner (i + c*stride) % n: keeps word/shape
    distributions while making copies ~0.5-Jaccard vs the originals."""
    n = len(texts)
    stride = max(1, n // (c + 2) + c)
    out: list[str | None] = []
    for i, t in enumerate(texts):
        p = texts[(i + stride) % n]
        if t is None or p is None:
            out.append(t)
            continue
        hm, pm = len(t) // 2, len(p) // 2
        hi = t.rfind(" ", 0, hm)
        pi = p.rfind(" ", 0, pm)
        head = t[:hi] if hi > 0 else t
        tail = p[pi:] if pi > 0 else (" " + p)
        out.append(head + tail)
    return out


def _copy(table: str, tab: pa.Table, c: int, off: dict[str, int]) -> pa.Table:
    if c == 0:
        return tab
    for col, fam in FAMILIES.get(table, {}).items():
        idx = tab.schema.get_field_index(col)
        typ = tab.schema.field(idx).type
        shifted = pc.add(tab[col], pa.scalar(c * off[fam], type=typ))
        tab = tab.set_column(idx, tab.schema.field(idx), shifted.cast(typ))
    if table == "documents":
        texts = _splice_texts(tab["text"].to_pylist(), c)
        arr = pa.array(texts, type=tab.schema.field("text").type)
        tab = tab.set_column(tab.schema.get_field_index("text"), tab.schema.field("text"), arr)
        nc = pc.utf8_length(arr).cast(tab.schema.field("n_chars").type)
        tab = tab.set_column(
            tab.schema.get_field_index("n_chars"), tab.schema.field("n_chars"), nc
        )
    return tab


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", required=True)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    names = sorted(
        f[: -len(".parquet")] for f in os.listdir(args.src) if f.endswith(".parquet")
    )
    tables = {n: pq.read_table(os.path.join(args.src, f"{n}.parquet")) for n in names}
    off = _family_offsets(tables)
    for n in names:
        src = tables[n]
        if n in SMALL:
            out = src
        else:
            out = pa.concat_tables([_copy(n, src, c, off) for c in range(args.k)])
            out = out.combine_chunks()
        pq.write_table(out, os.path.join(args.out, f"{n}.parquet"))
        meta = pq.ParquetFile(os.path.join(args.out, f"{n}.parquet")).metadata
        print(f"{n}: rows {meta.num_rows} row_groups {meta.num_row_groups}")
    open(os.path.join(args.out, "_DONE"), "w").close()


if __name__ == "__main__":
    main()
