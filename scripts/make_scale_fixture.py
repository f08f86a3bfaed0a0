#!/usr/bin/env python
"""Build a K× scale-up of a driver fixture directory for scaling measurement.

The driver ships sf0.001/0.01/0.1 only; SCALE.md's scaling curve needs one
more decade.  This script derives an sf1-equivalent from sf0.1 by K-fold
replication with key shifting, preserving the statistical structure a real
scale-up would have:

- Fixed-cardinality dims (region, nation) are NOT replicated — TPC-H keeps
  them constant across scale factors.
- Fact/dim keys are shifted per replica by a stride larger than the max key,
  so the K copies are disjoint and every join keeps its per-key cardinality
  (no artificial key hot-spots, no broken referential integrity).
- documents.text gets a per-replica token suffix (every token `tok` becomes
  `tok~i` in replica i>0), making replica vocabularies disjoint: duplicate /
  near-duplicate DENSITY stays constant as data grows, which is the right
  null model for "more independent data".  Naive replication would instead
  create K-sized duplicate clusters and quadratic candidate-pair blowup in
  the LSH queries — measuring that would be measuring the synthetic
  artifact, not the engine.
- embeddings are rotated (np.roll by i) per replica: norms and coordinate
  distributions are preserved while cross-replica cosine structure is
  decorrelated, so kNN/LSH bucket occupancy scales like real data.

Output layout matches the driver fixtures ({out}/{table}.parquet), so
`SPARK_GRAFT_SF_DIR={out} python bench.py` runs unmodified.

Usage: python scripts/make_scale_fixture.py [K] [SRC] [OUT]
Defaults: K=10, SRC=/root/testdata/sf0.1, OUT=/root/repo/.scale/sf1
"""

from __future__ import annotations

import re
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# table -> {column: stride}; stride must exceed the max key at the source SF
# (asserted below) so replicas occupy disjoint key ranges.
KEY_STRIDES: dict[str, dict[str, int]] = {
    "customer": {"c_custkey": 1_000_000},
    "supplier": {"s_suppkey": 1_000_000},
    "part": {"p_partkey": 1_000_000},
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
    "lineitem": {
        "l_orderkey": 10_000_000,
        "l_partkey": 1_000_000,
        "l_suppkey": 1_000_000,
    },
    "events": {"event_id": 10_000_000, "user_id": 1_000_000},
    "documents": {"doc_id": 1_000_000},
    "embeddings": {"vec_id": 1_000_000},
}
UNREPLICATED = ("region", "nation")

_TOKEN = re.compile(r"(\S+)")


def _salt_text(texts: list[str | None], i: int) -> list[str | None]:
    suffix = f"~{i}"
    return [
        None if t is None else _TOKEN.sub(lambda m: m.group(1) + suffix, t)
        for t in texts
    ]


def replicate(src: str, out: str, k: int) -> None:
    import os

    os.makedirs(out, exist_ok=True)
    for name in UNREPLICATED:
        tbl = pq.read_table(f"{src}/{name}.parquet")
        pq.write_table(tbl, f"{out}/{name}.parquet")
        print(f"{name}: copied {tbl.num_rows} rows (fixed-cardinality dim)")

    for name, strides in KEY_STRIDES.items():
        tbl = pq.read_table(f"{src}/{name}.parquet")
        cols = {c: tbl.column(c).to_numpy(zero_copy_only=False) for c in strides}
        for c, stride in strides.items():
            assert cols[c].max() < stride, f"{name}.{c} max >= stride {stride}"
        replicas = []
        for i in range(k):
            arrays = []
            for field in tbl.schema:
                c = field.name
                if c in strides:
                    arrays.append(
                        pa.array(cols[c] + i * strides[c], type=field.type)
                    )
                elif name == "documents" and c == "text" and i > 0:
                    arrays.append(
                        pa.array(
                            _salt_text(tbl.column(c).to_pylist(), i),
                            type=field.type,
                        )
                    )
                elif name == "documents" and c == "n_chars":
                    # recomputed after salting below
                    arrays.append(tbl.column(c).combine_chunks())
                elif name == "embeddings" and c == "embedding" and i > 0:
                    vecs = np.stack(
                        tbl.column(c).to_pandas().map(np.asarray).to_list()
                    )
                    rolled = np.roll(vecs, i, axis=1)
                    arrays.append(
                        pa.array(list(rolled.astype(np.float32)), type=field.type)
                    )
                else:
                    arrays.append(tbl.column(c).combine_chunks())
            rep = pa.table(arrays, schema=tbl.schema)
            if name == "documents" and i > 0:
                n_chars = pa.array(
                    [None if t is None else len(t) for t in rep.column("text").to_pylist()],
                    type=rep.schema.field("n_chars").type,
                )
                rep = rep.set_column(
                    rep.schema.get_field_index("n_chars"), "n_chars", n_chars
                )
            replicas.append(rep)
        big = pa.concat_tables(replicas)
        pq.write_table(big, f"{out}/{name}.parquet")
        print(f"{name}: {tbl.num_rows} -> {big.num_rows} rows")


if __name__ == "__main__":
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else "/root/repo/.scale/sf1"
    replicate(src, out, k)
