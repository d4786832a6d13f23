"""Build a 10x timing replica of sf0.1 (the driver's sf1.0 scale) in a
WRITABLE dir — /root/testdata is read-only this session and the driver's
own sf1.0 is gone.  A/B-timing data only: ids are remapped per copy with a
10M stride (collision-free vs the +100k/+200k dup-injection offsets, and
id%10 / id%20 distributions are preserved because the stride is a multiple
of 20), text gets a per-copy prefix word and embeddings a per-copy nudge so
near-dup / LSH candidate volume scales ~linearly instead of going
quadratic on 10 identical copies.  NOT the driver's sf1.0 — numbers from
this dir are for relative A/B only.

Usage: python scripts/make_sf_replica.py [out_dir] [n_copies]
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/sf1.0r"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 10
STRIDE = 10_000_000

ID_COLS = {
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
}
DIM_ONLY = ["nation", "region"]


def main():
    os.makedirs(OUT, exist_ok=True)
    for t in DIM_ONLY:
        pq.write_table(pq.read_table(f"{SRC}/{t}.parquet"),
                       f"{OUT}/{t}.parquet")
        print(f"{t}: copied")
    for t, idc in ID_COLS.items():
        base = pq.read_table(f"{SRC}/{t}.parquet")
        copies = []
        for c in range(N):
            tb = base
            for col in idc:
                i = tb.schema.get_field_index(col)
                tb = tb.set_column(
                    i, col, pc.add(tb.column(col),
                                   pa.scalar(c * STRIDE,
                                             tb.schema.field(col).type)))
            if t == "documents" and c > 0:
                # prefix EVERY word, not just the line: otherwise the 10
                # copies share ~all shingles and the minhash/jaccard
                # queries explode on cross-copy near-dup cliques that the
                # driver's real sf1.0 (fresh text per row) does not have
                i = tb.schema.get_field_index("text")
                txt = tb.column("text").combine_chunks()
                txt = pc.replace_substring(txt, " ", f" zc{c}")
                txt = pc.binary_join_element_wise(
                    pa.scalar(f"zc{c}"), txt, "")
                tb = tb.set_column(i, "text", txt)
            if t == "embeddings" and c > 0:
                # PERMUTE dims per copy: keeps norms and within-copy
                # near-dup structure, makes cross-copy cosines ~random —
                # a tiny nudge left copies at cosine ~0.9999 and the LSH
                # near-dup query exploded on cross-copy cliques the
                # driver's real data does not have
                i = tb.schema.get_field_index("embedding")
                col0 = tb.column("embedding").combine_chunks()
                arr = col0.chunk(0) if isinstance(col0, pa.ChunkedArray) else col0
                vals = arr.values.to_numpy(zero_copy_only=False).copy()
                dim = len(vals) // len(tb)
                rng = np.random.RandomState(1000 + c)
                perm = rng.permutation(dim)
                vals = vals.reshape(len(tb), dim)[:, perm].ravel()
                new = pa.ListArray.from_arrays(arr.offsets, pa.array(
                    vals, type=arr.values.type))
                tb = tb.set_column(i, "embedding", new)
            copies.append(tb)
        out = pa.concat_tables(copies)
        pq.write_table(out, f"{OUT}/{t}.parquet", row_group_size=1 << 20)
        print(f"{t}: {len(base)} -> {len(out)} rows")


if __name__ == "__main__":
    main()
