"""Invariants of scripts/make_scale_fixture.py — the derived-decade
methodology SCALE.md's second scaling measurement rests on: K-fold
replication must scale row counts exactly, keep replica key ranges
disjoint (so per-key join cardinality is preserved), keep duplicate
DENSITY constant in documents (disjoint per-replica vocabularies), and
preserve embedding norms while decorrelating replicas."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from make_scale_fixture import KEY_STRIDES, UNREPLICATED, replicate  # noqa: E402

SRC = "/root/testdata/sf0.001"
K = 2


@pytest.fixture(scope="module")
def scaled(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("scale") / "sfx")
    replicate(SRC, out, K)
    return out


def _q(path, sql):
    return duckdb.sql(sql.replace("$T", f"'{path}'")).fetchall()


def test_row_counts_scale_exactly(scaled):
    for name in KEY_STRIDES:
        (n_src,) = _q(f"{SRC}/{name}.parquet", "SELECT count(*) FROM $T")[0]
        (n_out,) = _q(f"{scaled}/{name}.parquet", "SELECT count(*) FROM $T")[0]
        assert n_out == K * n_src, name
    for name in UNREPLICATED:
        (n_src,) = _q(f"{SRC}/{name}.parquet", "SELECT count(*) FROM $T")[0]
        (n_out,) = _q(f"{scaled}/{name}.parquet", "SELECT count(*) FROM $T")[0]
        assert n_out == n_src, name  # fixed-cardinality dims


def test_replica_key_ranges_disjoint_and_fk_integrity(scaled):
    # Keys stay unique after striding...
    for name, strides in KEY_STRIDES.items():
        col = next(iter(strides))
        ((n, nd),) = _q(
            f"{scaled}/{name}.parquet",
            f"SELECT count(*), count(DISTINCT {col}) FROM $T",
        )
        if name in ("customer", "supplier", "part", "orders", "events",
                    "documents", "embeddings"):
            assert n == nd, name
    # ...and every orders.o_custkey still resolves to a customer (the join
    # keeps referential integrity, so per-key cardinality is preserved).
    (dangling,) = duckdb.sql(
        f"""SELECT count(*) FROM '{scaled}/orders.parquet' o
            WHERE NOT EXISTS (SELECT 1 FROM '{scaled}/customer.parquet' c
                              WHERE c.c_custkey = o.o_custkey)"""
    ).fetchone()
    assert dangling == 0


def test_join_cardinality_scales_linearly(scaled):
    (j_src,) = duckdb.sql(
        f"""SELECT count(*) FROM '{SRC}/orders.parquet' o
            JOIN '{SRC}/customer.parquet' c ON c.c_custkey = o.o_custkey"""
    ).fetchone()
    (j_out,) = duckdb.sql(
        f"""SELECT count(*) FROM '{scaled}/orders.parquet' o
            JOIN '{scaled}/customer.parquet' c ON c.c_custkey = o.o_custkey"""
    ).fetchone()
    assert j_out == K * j_src  # no cross-replica key collisions


def test_document_dup_density_constant(scaled):
    ((n_src, d_src),) = _q(
        f"{SRC}/documents.parquet",
        "SELECT count(*), count(DISTINCT text) FROM $T",
    )
    ((n_out, d_out),) = _q(
        f"{scaled}/documents.parquet",
        "SELECT count(*), count(DISTINCT text) FROM $T",
    )
    # Distinct texts scale with the corpus: per-replica token salting means
    # replicas NEVER collide with each other, so the duplicate fraction
    # (1 - distinct/total) is exactly preserved.
    assert n_out == K * n_src and d_out == K * d_src
    # n_chars stays consistent with the salted text.
    (bad,) = _q(
        f"{scaled}/documents.parquet",
        "SELECT count(*) FROM $T WHERE text IS NOT NULL AND n_chars <> len(text)",
    )[0]
    assert bad == 0


def test_replica_vocabularies_disjoint(scaled):
    # Tokens of replica 0 and replica 1 must not overlap at all.
    (overlap,) = duckdb.sql(
        f"""WITH t AS (
              SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS tok
              FROM '{scaled}/documents.parquet' WHERE text IS NOT NULL)
            SELECT count(*) FROM (
              SELECT DISTINCT a.tok FROM t a
              WHERE a.doc_id < 1000000
              AND EXISTS (SELECT 1 FROM t b
                          WHERE b.doc_id >= 1000000 AND b.tok = a.tok))"""
    ).fetchone()
    assert overlap == 0


def test_embedding_norms_preserved(scaled):
    # np.roll permutes coordinates: per-vector L2 norm is invariant, so
    # corpus-level norm statistics match the source exactly.
    src_stats = duckdb.sql(
        f"""SELECT round(avg(sqrt(list_sum(list_transform(embedding,
                   x -> x::DOUBLE * x)))), 6) FROM '{SRC}/embeddings.parquet'"""
    ).fetchone()
    out_stats = duckdb.sql(
        f"""SELECT round(avg(sqrt(list_sum(list_transform(embedding,
                   x -> x::DOUBLE * x)))), 6) FROM '{scaled}/embeddings.parquet'"""
    ).fetchone()
    assert src_stats == out_stats
