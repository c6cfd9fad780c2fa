#!/usr/bin/env python
"""Generate a 10x scale-up of the sf0.1 test tables for scaling-curve
benchmarks (VERDICT r03 #5) — synthetic TIMING data only, never used
for correctness oracles.

Scheme: each fact table becomes 10 key-shifted shards of the sf0.1
original, so the scaled dataset behaves like 10 independent sf0.1
partitions of one larger world:

- keys (event_id/user_id, doc_id, vec_id, *_orderkey/custkey/partkey/
  suppkey) shift by ``copy * (max_key + 1)`` — joins stay consistent
  across tables (events.user_id matches customer.c_custkey, lineitem
  matches orders/part/supplier);
- ``documents.text`` gets a per-copy digit suffixed onto every word for
  copies > 0, so shingle/token spaces are disjoint across copies — the
  dedup/similarity workload scales as 10 independent shards instead of
  degenerating into 10-way exact duplicates (which would measure a
  pathological workload, not scale);
- ``embeddings.embedding`` shifts every component by ``copy * 1e-3``
  for the same reason (no artificial exact-duplicate vectors);
- ``region``/``nation`` stay as-is: dimension tables do not scale with
  fact volume (they stay broadcast-sized at any SF, which is the point
  of the broadcast-join design);
- timestamps are untouched: the time range is fixed, event RATE grows
  10x — rows per time bucket scale, bucket count does not.

Usage: python tools/gen_scale_data.py [SRC_DIR] [OUT_DIR]
Defaults: /root/testdata/sf0.1 -> /tmp/scaledata/sf1.0
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

COPIES = 10

# table -> columns to key-shift (each by copy * (max+1) of that column)
SHIFT_COLS = {
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
}
COPY_AS_IS = ["region", "nation"]

# user_id shifts must use customer's key modulus so the events->customer
# join stays consistent (events.user_id is a subset of c_custkey space).
SHARED_MODULUS = {
    ("events", "user_id"): ("customer", "c_custkey"),
    ("orders", "o_custkey"): ("customer", "c_custkey"),
    ("lineitem", "l_orderkey"): ("orders", "o_orderkey"),
    ("lineitem", "l_partkey"): ("part", "p_partkey"),
    ("lineitem", "l_suppkey"): ("supplier", "s_suppkey"),
}


def _suffix_words(texts: pa.ChunkedArray, copy: int) -> pa.Array:
    # The separator must be OUTSIDE the source vocabulary: a bare digit
    # suffix collides when a source word already ends in a digit ('foo1'
    # in copy 0 == 'foo'+'1' in copy 1), weakening the
    # no-cross-copy-duplicates property the dedup scaling curve relies
    # on (ADVICE r04). '§' never appears in the synthetic corpus.
    out = []
    tag = "§" + str(copy)
    for chunk in texts.chunks:
        for t in chunk.to_pylist():
            out.append(" ".join(w + tag for w in t.split(" ")))
    return pa.array(out, type=pa.string())


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scaledata/sf1.0"
    os.makedirs(out, exist_ok=True)

    moduli: dict[tuple[str, str], int] = {}
    for table, cols in SHIFT_COLS.items():
        t = pq.read_table(os.path.join(src, f"{table}.parquet"))
        for c in cols:
            moduli[(table, c)] = pc.max(t[c]).as_py() + 1

    for table in COPY_AS_IS:
        t = pq.read_table(os.path.join(src, f"{table}.parquet"))
        pq.write_table(t, os.path.join(out, f"{table}.parquet"))
        print(f"{table}: copied as-is ({t.num_rows} rows)")

    for table, cols in SHIFT_COLS.items():
        t = pq.read_table(os.path.join(src, f"{table}.parquet"))
        parts = []
        for copy in range(COPIES):
            shard = t
            if copy > 0:
                for c in cols:
                    key = SHARED_MODULUS.get((table, c), (table, c))
                    mod = moduli[key]
                    shifted = pc.add(shard[c], copy * mod)
                    # preserve the original integer type exactly
                    shifted = shifted.cast(t.schema.field(c).type)
                    shard = shard.set_column(
                        shard.schema.get_field_index(c), c, shifted
                    )
                if table == "documents":
                    new_text = _suffix_words(shard["text"], copy)
                    shard = shard.set_column(
                        shard.schema.get_field_index("text"), "text", new_text
                    )
                    # keep the derived column consistent with the new text
                    shard = shard.set_column(
                        shard.schema.get_field_index("n_chars"),
                        "n_chars",
                        pc.utf8_length(new_text).cast(
                            t.schema.field("n_chars").type
                        ),
                    )
                if table == "embeddings":
                    i = shard.schema.get_field_index("embedding")
                    emb = shard["embedding"].combine_chunks()
                    vals = pc.add(emb.values, copy * 1e-3).cast(pa.float32())
                    new_emb = pa.ListArray.from_arrays(
                        emb.offsets, vals
                    ).cast(t.schema.field("embedding").type)
                    shard = shard.set_column(i, "embedding", new_emb)
            parts.append(shard)
        merged = pa.concat_tables(parts)
        pq.write_table(merged, os.path.join(out, f"{table}.parquet"))
        print(f"{table}: {t.num_rows} -> {merged.num_rows} rows")


if __name__ == "__main__":
    main()
