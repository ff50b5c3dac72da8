"""Synthesize an sf1 corpus (10x sf0.1) for the r11 scaling study.

VERDICT r10 #1: every plan is shaped for 100x but the bench only ever
ran at sf0.1 — materialize a 10x corpus and measure per-gate scaling
exponents.  The driver's testdata is read-only and its generator is not
in-repo, so sf1 is built by DETERMINISTIC REPLICATION of sf0.1: ten
key-shifted copies (copy 0 = the original rows bit-for-bit).

Design choices that keep each workload's 10x shape representative:

- All key columns shift by copy * 10_000_000, consistently across
  tables, so intra-copy join relationships are preserved and NO
  cross-copy key ever matches: joins/aggregations see a true 10x.
- nation/region stay 1x (dimension tables don't grow with corpus size).
- documents.text gets a per-copy token suffix (`tok` -> `tok_cN`) so
  cross-copy shingle/minhash/simhash similarity is ZERO: a replicated
  corpus would otherwise make every cross-copy pair a near-duplicate
  and inflate candidate sets quadratically — not what a real 10x corpus
  looks like.  Within-copy near-dup structure is identical to sf0.1.
- embeddings get a per-copy deterministic DIMENSION PERMUTATION:
  norms and within-copy distances are preserved exactly; cross-copy
  cosine drops to the random-vector baseline (no fake near-dup pairs).
- events shift time by copy * (span + 1h): a 10x event corpus is 10x
  of history (same per-window density, 10x windows), not 10x density.

Output: <repo>/.scale/sf1/<table>.parquet (never under /root/testdata).
"""

from __future__ import annotations

import os
import re
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, ".scale", "sf1")
COPIES = 10
SHIFT = 10_000_000

KEY_SHIFTS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def _shift_keys(tbl: pa.Table, keys: list[str], c: int) -> pa.Table:
    for k in keys:
        i = tbl.schema.get_field_index(k)
        tbl = tbl.set_column(
            i, k, pc.add(tbl.column(k), pa.scalar(c * SHIFT, pa.int64())))
    return tbl


def _remap_text(tbl: pa.Table, c: int) -> pa.Table:
    if c == 0:
        return tbl
    texts = tbl.column("text").to_pylist()
    suf = f"_c{c}"
    pat = re.compile(r"(\S+)")
    new = [None if t is None else pat.sub(lambda m: m.group(1) + suf, t)
           for t in texts]
    tbl = tbl.set_column(tbl.schema.get_field_index("text"), "text",
                         pa.array(new, pa.string()))
    if "n_chars" in tbl.column_names:
        nc = pa.array([None if t is None else len(t) for t in new],
                      tbl.schema.field("n_chars").type)
        tbl = tbl.set_column(tbl.schema.get_field_index("n_chars"),
                             "n_chars", nc)
    return tbl


def _permute_dims(tbl: pa.Table, c: int) -> pa.Table:
    if c == 0:
        return tbl
    col = tbl.column("embedding").combine_chunks()
    vecs = col.to_pylist()
    dim = max(len(v) for v in vecs if v is not None)
    perm = np.random.RandomState(1000 + c).permutation(dim)
    new = [None if v is None else [v[j] for j in perm] for v in vecs]
    field = tbl.schema.field("embedding")
    tbl = tbl.set_column(tbl.schema.get_field_index("embedding"),
                         "embedding", pa.array(new, field.type))
    return tbl


def _shift_time(tbl: pa.Table, col: str, c: int, span_us: int) -> pa.Table:
    if c == 0:
        return tbl
    i = tbl.schema.get_field_index(col)
    t = tbl.column(col)
    typ = t.type
    us = pc.cast(t, pa.int64())
    us = pc.add(us, pa.scalar(c * (span_us + 3_600_000_000), pa.int64()))
    return tbl.set_column(i, col, pc.cast(us, typ))


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    for t in ("nation", "region"):
        pq.write_table(pq.read_table(f"{SRC}/{t}.parquet"),
                       f"{OUT}/{t}.parquet")
        print(t, "1x copied")
    for t, keys in KEY_SHIFTS.items():
        base = pq.read_table(f"{SRC}/{t}.parquet")
        span_us = 0
        if t == "events":
            ts = pc.cast(base.column("ts"), pa.int64())
            span_us = pc.max(ts).as_py() - pc.min(ts).as_py()
        # one FILE per copy under a <table>.parquet directory, each with
        # sf0.1's own row-group layout: a real 10x corpus arrives as 10x
        # more files/objects, not one monolithic file whose single
        # 128 MB-split scan task decodes every row group serially.  The
        # first (monolithic) layout measured input skew, not scaling
        # (guide §2.5 "one huge unsplittable file": q01 ratio 11.4,
        # q09 ratio 49.6 — both scan-serialization artifacts).
        tdir = f"{OUT}/{t}.parquet"
        if os.path.isfile(tdir):
            os.remove(tdir)
        # clear stale part files from a prior run (different COPIES or
        # naming): Spark's directory scan silently includes any leftover
        # part-*.parquet, corrupting the corpus and every ratio
        shutil.rmtree(tdir, ignore_errors=True)
        os.makedirs(tdir, exist_ok=True)
        n = 0
        for c in range(COPIES):
            p = _shift_keys(base, keys, c)
            if t == "documents":
                p = _remap_text(p, c)
            if t == "embeddings":
                p = _permute_dims(p, c)
            if t == "events":
                p = _shift_time(p, "ts", c, span_us)
            pq.write_table(p, f"{tdir}/part-{c:02d}.parquet")
            n += p.num_rows
        print(t, base.num_rows, "->", n)
    print("done:", OUT)


if __name__ == "__main__":
    main()
