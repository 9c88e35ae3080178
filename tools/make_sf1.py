#!/usr/bin/env python3
"""Derive the 10x stress dataset STRESS_sf1.md describes: replicate the
sf0.1 fact tables 10x with consistently shifted keys (all foreign keys
stay valid), dims unchanged, events via pyarrow so the TIMESTAMP(NANOS)
physical type survives. NOT a correctness input — correctness gates run
on the driver's sf0.01 parquet + DuckDB oracles; this exists to measure
scaling behavior (see STRESS_sf1.md).

Usage: python3 tools/make_sf1.py [src=/root/testdata/sf0.1] [dst=/tmp/graft_sf1] [repl=10] [jitter=0.1]

repl=10 is the sf1 (10x) dataset; repl=100 is the sf10 memory-ceiling
probe (60M lineitem / 500k docs / 2M vectors -- still a few GB of
parquet, but the dedup workload grows QUADRATICALLY in repl: every doc
gains repl exact copies, so duplicate pairs per group go C(repl,2),
i.e. 110x the sf1 pair count at only 10x its rows. Read stress ratios
against that expected workload growth, not against row count).

jitter (round 12): replicated EMBEDDINGS get a deterministic per-copy
Gaussian perturbation of `jitter` x row-norm (copy 0 = the original,
untouched). Without it every probe's exact top-10 saturates with its
own byte-identical copies and recall@10 reads 1.0 by construction
(STRESS_sf1.md's r11 footnote); with it the copies are near-duplicates
(cos ~0.995 at 0.1) whose exact ranking the quantizers must actually
reproduce -- routing + rerank get measured, not copy saturation.
jitter=0 restores the old byte-identical replication.
"""
import sys
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1"
REPL = int(sys.argv[3]) if len(sys.argv) > 3 else 10
JITTER = float(sys.argv[4]) if len(sys.argv) > 4 else 0.1

import os
os.makedirs(dst, exist_ok=True)

# key columns to shift per table: {col: stride_source_col} — stride is
# max(col)+1 of the ORIGINAL table named by the stride key
SHIFTS = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {"l_orderkey": "orders", "l_partkey": "part", "l_suppkey": "supplier"},
    "events": {"event_id": "events", "user_id": "events_user"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
KEY_OF = {  # table -> its primary key col (for stride computation)
    "customer": "c_custkey", "supplier": "s_suppkey", "part": "p_partkey",
    "orders": "o_orderkey", "events": "event_id", "events_user": "user_id",
    "documents": "doc_id", "embeddings": "vec_id",
}


def stride(table_name: str) -> int:
    base = "events" if table_name == "events_user" else table_name
    t = pq.read_table(f"{src}/{base}.parquet", columns=[KEY_OF[table_name]])
    return t.column(0).to_pylist() and (max(t.column(0).to_pylist()) + 1) or 1


strides = {name: stride(name) for name in KEY_OF}

for table in "region nation".split():  # dims unchanged
    pq.write_table(pq.read_table(f"{src}/{table}.parquet"), f"{dst}/{table}.parquet")
    print(f"{table}: copied")

def jitter_embeddings(col: pa.ChunkedArray, copy_idx: int) -> pa.ChunkedArray:
    """Per-copy deterministic Gaussian jitter, `JITTER` x row-norm,
    seeded by the copy index alone — re-running the script reproduces
    the dataset bit-for-bit."""
    la = col.combine_chunks()
    dim = 0
    if isinstance(la, pa.FixedSizeListArray):
        dim, values, offsets = la.type.list_size, la.values, None
    else:
        offsets = la.offsets
        step = np.diff(offsets.to_numpy(zero_copy_only=False))
        assert len(set(step)) == 1, "ragged embedding lists"
        dim, values = int(step[0]), la.flatten()
    arr = values.to_numpy(zero_copy_only=False).astype(np.float32).reshape(-1, dim)
    rs = np.random.RandomState(0x5EED ^ (1000003 * copy_idx))
    noise = rs.standard_normal(arr.shape).astype(np.float32) / np.sqrt(dim)
    arr = arr + JITTER * np.linalg.norm(arr, axis=1, keepdims=True) * noise
    flat = pa.array(arr.reshape(-1), type=pa.float32())
    if offsets is None:
        out = pa.FixedSizeListArray.from_arrays(flat, dim)
    else:
        out = pa.ListArray.from_arrays(offsets, flat)
    return pa.chunked_array([out])


for table, shifts in SHIFTS.items():
    t = pq.read_table(f"{src}/{table}.parquet")
    copies = []
    for i in range(REPL):
        cols = []
        for name in t.column_names:
            col = t.column(name)
            if name in shifts and i > 0:
                off = i * strides[shifts[name]]
                col = pa.chunked_array([
                    pa.compute.add(c, pa.scalar(off, type=c.type)) for c in col.chunks])
            if table == "embeddings" and name == "embedding" and i > 0 and JITTER > 0:
                col = jitter_embeddings(col, i)
            cols.append(col)
        copies.append(pa.table(cols, names=t.column_names))
    out = pa.concat_tables(copies)
    # preserve the physical schema (events: TIMESTAMP(NANOS)) exactly
    out = out.cast(t.schema)
    # Write ~4MB (arrow-bytes) row groups. A single-row-group file is
    # effectively unsplittable for Spark (every byte-range split reads
    # the row groups whose MIDPOINT it contains), which serialized the
    # whole CPU-bound text tier onto ONE task at repl=100 regardless of
    # split config — an unrepresentative layout; production corpora are
    # many files/groups. Spark's scan split sizing already adapts down
    # to openCostInBytes (4MB) via bytesPerCore when files are small vs
    # cores, so groups ≈ that floor let a 55MB documents file fan out.
    rg_rows = max(4096, int(out.num_rows * (4 << 20) / max(out.nbytes, 1)))
    pq.write_table(out, f"{dst}/{table}.parquet", row_group_size=rg_rows)
    print(f"{table}: {t.num_rows} -> {out.num_rows} (rg_rows={rg_rows})")
