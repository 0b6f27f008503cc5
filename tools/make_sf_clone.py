"""Synthesize a larger benchmark dataset by replicating an existing
testdata SF with shifted keys (for LOCAL measurement only — the
driver benches on its own generated data; this clone just reproduces
the row counts and layout of a bigger SF so optimizations can be
timed at driver scale without waiting for the round end).

Key columns are offset per replica so joins/distincts keep realistic
cardinalities (documents/doc_id, embeddings/vec_id, orders+customer
keys, lineitem/orderkey, events/user_id). Dimension tables
(nation/region/supplier/part) are copied unchanged, matching how
TPC-H scales fact tables faster than dims.

Usage: python tools/make_sf_clone.py <src_sf_dir> <out_dir> <factor>
"""

import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# table -> columns to offset by (replica_index * (max+1))
OFFSETS = {
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "lineitem": ["l_orderkey"],
    "events": ["user_id", "event_id"],
    "part": [],
    "supplier": [],
    "nation": [],
    "region": [],
}


def main():
    src, out, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    import os

    os.makedirs(out, exist_ok=True)
    for name, keycols in OFFSETS.items():
        t = pq.read_table(f"{src}/{name}.parquet")
        keycols = [c for c in keycols if c in t.column_names]
        if not keycols or factor == 1:
            reps = [t] * (factor if keycols else 1)
        else:
            spans = {c: pc.max(t[c]).as_py() + 1 for c in keycols}
            reps = []
            for i in range(factor):
                r = t
                for c in keycols:
                    idx = r.column_names.index(c)
                    col = pc.add(r[c], i * spans[c])
                    col = col.cast(t.schema.field(c).type)
                    r = r.set_column(idx, t.schema.field(c), col)
                reps.append(r)
        big = pa.concat_tables(reps)
        pq.write_table(
            big, f"{out}/{name}.parquet", row_group_size=1 << 20,
            compression="zstd",
        )
        print(name, big.num_rows, "rows")


if __name__ == "__main__":
    main()
