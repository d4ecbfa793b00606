#!/usr/bin/env python3
"""Build a ~sf1 dataset by replicating /root/testdata/sf0.1 10x with
consistent key offsets (tooling only — NOT part of the engine; the
driver's own generator is not available at sf1).

Replication rule: each fact/dim table unions 10 copies; copy i shifts
every key column by i * (max_key + 1) of its OWNED table, and FK columns
by the owning table's stride, so joins hold exactly (each copy is a
disjoint, internally consistent shard of the key space). region/nation
(fixed dimensions) are NOT replicated; FK columns into them stay put.

Caveat recorded in SCALE.md: text/embedding payloads replicate verbatim,
so dedup-family queries see every document in a 10-clone group — pair
work is an UPPER bound on a naturally grown corpus, which is the right
direction for a stress fixture.

Usage: python3 tools/gen_sf1.py [outdir] [copies]
"""
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

# table -> its own key columns (stride source). FK columns reference the
# owner's stride. Unlisted int columns stay put.
OWNED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
FKS = {
    "orders": {"o_custkey": "customer"},
    "lineitem": {"l_orderkey": "orders", "l_partkey": "part",
                 "l_suppkey": "supplier"},
}
COPY_ONLY = ["region", "nation"]
REPLICATE = ["customer", "supplier", "part", "orders", "lineitem",
             "events", "documents", "embeddings"]


def write_split(table, path, files=16, **kw):
    os.makedirs(path, exist_ok=True)
    n = table.num_rows
    step = (n + files - 1) // files
    for i in range(files):
        part = table.slice(i * step, step)
        if part.num_rows:
            pq.write_table(part, f"{path}/part-{i:04d}.parquet", **kw)


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale/sf1"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out, exist_ok=True)

    strides = {}
    for t, keys in OWNED.items():
        tb = pq.read_table(f"{SRC}/{t}.parquet", columns=keys)
        strides[t] = int(pc.max(tb.column(keys[0])).as_py()) + 1

    for t in COPY_ONLY:
        tb = pq.read_table(f"{SRC}/{t}.parquet")
        write_split(tb, f"{out}/{t}.parquet", files=1)
        print(f"{t}: {tb.num_rows} rows (not replicated)")

    for t in REPLICATE:
        tb = pq.read_table(f"{SRC}/{t}.parquet")
        kw = {}
        if t == "events":  # keep TIMESTAMP(NANOS) exactly as the driver writes it
            kw = {"coerce_timestamps": None, "version": "2.6"}
        shifted = []
        shift_cols = {k: strides[t] for k in OWNED.get(t, [])}
        shift_cols.update({c: strides[owner] for c, owner in FKS.get(t, {}).items()})
        for i in range(copies):
            cp = tb
            if i > 0:
                for c, stride in shift_cols.items():
                    idx = cp.schema.get_field_index(c)
                    col = cp.column(c)
                    cp = cp.set_column(
                        idx, c, pc.add(col, pa.scalar(i * stride, col.type)))
            shifted.append(cp)
        big = pa.concat_tables(shifted)
        write_split(big, f"{out}/{t}.parquet", files=16, **kw)
        print(f"{t}: {tb.num_rows} -> {big.num_rows} rows")


if __name__ == "__main__":
    main()
