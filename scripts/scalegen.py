#!/usr/bin/env python3
"""Dev-only sf-scale-up generator: build an sfN directory by replicating an
existing testdata sf directory K times with key offsets (referentially
consistent, schema- and parquet-physical-type-preserving — events.ts keeps
whatever physical time encoding the source files carry; the engine's reader
dispatches on it either way, see Tables.eventsUs).

The point is VOLUME (spill paths, size-sensitive thresholds, overflow
classes), not distribution realism: the oracle compare is self-consistent
(Spark and DuckDB read the same files). Document text gets a per-replica
suffix so near-dup pair counts scale ~linearly instead of quadratically.

Usage: python3 scripts/scalegen.py /root/testdata/sf0.1 /tmp/sf1 10
"""
import sys
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

src, dst, k = sys.argv[1], sys.argv[2], int(sys.argv[3])

import os
os.makedirs(dst, exist_ok=True)

COPY_AS_IS = ["region", "nation"]
# table -> {column: stride_source_column}; stride = max+1 of that column
OFFSETS = {
    "customer": {"c_custkey": "c_custkey"},
    "supplier": {"s_suppkey": "s_suppkey"},
    "part": {"p_partkey": "p_partkey"},
    "orders": {"o_orderkey": "o_orderkey", "o_custkey": "c_custkey"},
    "lineitem": {"l_orderkey": "o_orderkey", "l_partkey": "p_partkey",
                 "l_suppkey": "s_suppkey"},
    "events": {"event_id": "event_id", "user_id": "user_id"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
}

strides = {}
for t in ["customer", "supplier", "part", "orders", "events", "documents",
          "embeddings"]:
    tbl = pq.read_table(f"{src}/{t}.parquet")
    for col in tbl.column_names:
        if col in {c for m in OFFSETS.values() for c in m.values()}:
            strides[col] = pc.max(tbl[col]).as_py() + 1

for t in COPY_AS_IS:
    tbl = pq.read_table(f"{src}/{t}.parquet")
    pq.write_table(tbl, f"{dst}/{t}.parquet")
    print(f"{t}: {tbl.num_rows} rows (copied)")

for t, offs in OFFSETS.items():
    tbl = pq.read_table(f"{src}/{t}.parquet")
    schema = tbl.schema
    replicas = []
    for i in range(k):
        cols = []
        for name in tbl.column_names:
            col = tbl[name]
            if name in offs and i > 0:
                typ = schema.field(name).type
                col = pc.add(col, pa.scalar(i * strides[offs[name]], type=typ))
            elif t == "documents" and name == "text" and i > 0:
                col = pc.binary_join_element_wise(
                    col.cast(pa.string()), f" replica{i}", "")
            elif t == "documents" and name == "n_chars" and i > 0:
                col = pc.add(col, pa.scalar(len(f" replica{i}"),
                                            type=schema.field(name).type))
            cols.append(col.combine_chunks() if hasattr(col, "combine_chunks") else col)
        replicas.append(pa.table(dict(zip(tbl.column_names, cols)), schema=schema))
    out = pa.concat_tables(replicas)
    pq.write_table(out, f"{dst}/{t}.parquet")
    print(f"{t}: {tbl.num_rows} -> {out.num_rows} rows")
