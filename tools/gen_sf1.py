"""Generate an sf1-equivalent fixture (~10x sf0.1) for scale-smoke runs.

The driver ships sf0.001/0.01/0.1 only; VERDICT r03 item 6 asks for one
sf1 smoke to catch constants that are flat at sf0.1 but superlinear at
10x.  This replicates each sf0.1 table 10x with per-replica KEY OFFSETS so
join cardinalities scale linearly (each fact row still matches exactly one
dim row), writing to ./testdata_sf1 (gitignored — ~200 MB, regenerable).

Scaling rules:
- nation/region: NOT replicated (real schemas keep small dims fixed);
  nationkey/regionkey fks unchanged, so every replica joins the same 25
  nations — group-by-nation cardinalities stay constant, group sizes 10x,
  which is the realistic scale-up.
- customer/supplier/part/orders/lineitem/events: pk + non-nation fks
  shifted by replica * stride (stride = 1 + global max of the key domain,
  identical on both sides of every fk edge).
- documents: doc_id shifted; TEXT gets a replica tag token injected every
  5 words for replicas >= 1 — cross-replica copies of a doc drop below
  jaccard 0.5 on word-3-shingles, so near-dup cluster sizes stay ~sf0.1
  (x10 count, not x10 size: pair-count growth stays LINEAR, matching how
  a real 10x corpus behaves, instead of the quadratic blowup verbatim
  replication would cause).
- embeddings: vec_id shifted; vector component [replica % dims] gets
  +0.01*replica so replicas are near- but not exact-duplicates.

Usage: python tools/gen_sf1.py   (writes ./testdata_sf1/*.parquet)

sf10 (VERDICT r5 item 2 — push the scale proof one more decade):
    python tools/gen_sf1.py --src ./testdata_sf1 --dst ./testdata_sf10 \
        --tag-prefix s
replicates the sf1 fixture 10x.  ``--tag-prefix`` gives the second
replication level its own tag namespace ("s{r}tag" instead of
"r{r}tag"): with the SAME prefix, inject(base, r3) would be produced
both by (sf1-replica 3, sf10-replica 0) and (sf1-replica 0,
sf10-replica 3) — byte-identical texts, i.e. ~9 planted exact-dup pairs
per base doc that the real corpus growth model has no business
containing.  Distinct prefixes keep every (i, j) composition unique.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = Path("/root/testdata/sf0.1")
DST = Path(__file__).resolve().parent.parent / "testdata_sf1"
REPLICAS = 10
TAG_PREFIX = "r"

# key domain -> columns carrying it, per table (nation/region keys excluded
# on purpose: those dims are not replicated)
KEY_COLS = {
    "custkey": {"customer": ["c_custkey"], "orders": ["o_custkey"]},
    "suppkey": {"supplier": ["s_suppkey"], "lineitem": ["l_suppkey"]},
    "partkey": {"part": ["p_partkey"], "lineitem": ["l_partkey"]},
    "orderkey": {"orders": ["o_orderkey"], "lineitem": ["l_orderkey"]},
    "event_id": {"events": ["event_id"]},
    "user_id": {"events": ["user_id"]},
    "doc_id": {"documents": ["doc_id"]},
    "vec_id": {"embeddings": ["vec_id"]},
}


def _strides() -> dict[str, int]:
    out = {}
    for domain, tables in KEY_COLS.items():
        mx = 0
        for table, cols in tables.items():
            t = pq.read_table(SRC / f"{table}.parquet", columns=cols)
            for c in cols:
                mx = max(mx, pc.max(t[c]).as_py() or 0)
        out[domain] = mx + 1
    return out


def _tag_text(texts: list[str | None], replica: int) -> list[str | None]:
    tag = f"{TAG_PREFIX}{replica}tag"
    out = []
    for s in texts:
        if s is None:
            out.append(None)
            continue
        words = s.split(" ")
        # inject the tag every 5 words: breaks enough word-3-shingles to
        # push cross-replica jaccard below the 0.5 dedup threshold
        merged: list[str] = []
        for i, w in enumerate(words):
            if i % 5 == 0:
                merged.append(tag)
            merged.append(w)
        out.append(" ".join(merged))
    return out


def main() -> None:
    global SRC, DST, REPLICAS, TAG_PREFIX
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default=str(SRC))
    ap.add_argument("--dst", default=str(DST))
    ap.add_argument("--replicas", type=int, default=REPLICAS)
    ap.add_argument("--tag-prefix", default=TAG_PREFIX)
    args = ap.parse_args()
    SRC, DST = Path(args.src), Path(args.dst)
    REPLICAS, TAG_PREFIX = args.replicas, args.tag_prefix
    DST.mkdir(exist_ok=True)
    strides = _strides()
    col_shift: dict[str, dict[str, int]] = {}
    for domain, tables in KEY_COLS.items():
        for table, cols in tables.items():
            for c in cols:
                col_shift.setdefault(table, {})[c] = strides[domain]

    for small in ("nation", "region"):
        # byte-identical copy keeps dictionary encodings
        (DST / f"{small}.parquet").write_bytes(
            (SRC / f"{small}.parquet").read_bytes()
        )
        print(f"{small}: copied (small dim, not replicated)")

    for table in ("customer", "supplier", "part", "orders", "lineitem",
                  "events", "documents", "embeddings"):
        base = pq.read_table(SRC / f"{table}.parquet")
        shifts = col_shift.get(table, {})
        reps = []
        for r in range(REPLICAS):
            t = base
            for col, stride in shifts.items():
                idx = t.schema.get_field_index(col)
                shifted = pc.add(t[col], pa.scalar(r * stride,
                                                   type=t.schema.field(col).type))
                t = t.set_column(idx, t.schema.field(col), shifted)
            if table == "documents" and r > 0:
                idx = t.schema.get_field_index("text")
                tagged = pa.array(_tag_text(t["text"].to_pylist(), r),
                                  type=pa.string())
                t = t.set_column(idx, t.schema.field("text"), tagged)
                nidx = t.schema.get_field_index("n_chars")
                nchars = pc.utf8_length(t["text"]).cast(pa.int64())
                t = t.set_column(nidx, t.schema.field("n_chars"), nchars)
            if table == "embeddings" and r > 0:
                emb = t["embedding"].combine_chunks()
                flat = emb.values.to_numpy(zero_copy_only=False).copy()
                offsets = emb.offsets.to_numpy(zero_copy_only=False)
                dims = int(offsets[1] - offsets[0]) if len(offsets) > 1 else 1
                flat[(r % dims)::dims] += np.float32(0.01 * r)
                rebuilt = pa.ListArray.from_arrays(
                    emb.offsets, pa.array(flat, type=pa.float32()))
                idx = t.schema.get_field_index("embedding")
                t = t.set_column(idx, t.schema.field("embedding"), rebuilt)
            reps.append(t)
        out = pa.concat_tables(reps)
        pq.write_table(out, DST / f"{table}.parquet",
                       compression="zstd", row_group_size=200_000)
        print(f"{table}: {base.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    sys.exit(main())
