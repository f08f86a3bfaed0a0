"""Every registered query with an oracle must hash-match DuckDB on the same
fixtures — the local twin of the driver's CORRECTNESS gate.

Run at sf0.001 by default (fast); set SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01
to reproduce the driver's exact scale.
"""

from __future__ import annotations

import pytest

from real_time_iot_data_engineering_pipeline_spark import registry
from .oracle_utils import compare, duck_connection

registry.load_all()

_WITH_ORACLE = sorted(registry.ORACLES)
_ROWS_ONLY = sorted(set(registry.QUERIES) - set(registry.ORACLES))


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_oracle_parity(spark, sf_dir, duck, name):
    sdf = registry.QUERIES[name](spark, sf_dir).toPandas()
    ddf = duck.execute(registry.ORACLES[name]).fetchdf()
    problems = compare(sdf, ddf)
    assert not problems, f"{name}: " + " | ".join(problems)


def test_rank_bucketed_scale_path_parity(spark, sf_dir, duck, monkeypatch):
    """q_rank_per_group's cluster-scale bucketed plan is bypassed at fixture
    sizes (adaptive switch); force it here so BOTH paths stay oracle-exact."""
    monkeypatch.setenv("SPARK_GRAFT_SCALE_SWITCH_BYTES", "0")
    sdf = registry.QUERIES["q_rank_per_group"](spark, sf_dir).toPandas()
    ddf = duck.execute(registry.ORACLES["q_rank_per_group"]).fetchdf()
    problems = compare(sdf, ddf)
    assert not problems, "q_rank_per_group[bucketed]: " + " | ".join(problems)


def test_token_budget_bucketed_scale_path_parity(spark, sf_dir, duck, monkeypatch):
    """q_token_budget_pack's cluster-scale bucketed running-sum plan is
    bypassed at fixture sizes (adaptive switch); force it here so BOTH
    paths stay oracle-exact (integer token sums make the two-phase plan
    bit-identical, not merely ULP-close)."""
    monkeypatch.setenv("SPARK_GRAFT_SCALE_SWITCH_BYTES", "0")
    sdf = registry.QUERIES["q_token_budget_pack"](spark, sf_dir).toPandas()
    ddf = duck.execute(registry.ORACLES["q_token_budget_pack"]).fetchdf()
    problems = compare(sdf, ddf)
    assert not problems, "q_token_budget_pack[bucketed]: " + " | ".join(problems)


def test_driver_priority_queries_inside_50_window():
    """The driver's correctness harness verifies only the first 50 entries of
    queries(); every query that still needs a hard-signal row (new or
    modified this round) must land inside that window, and everything pushed
    past it must already hold a green row from a prior round's CORRECTNESS."""
    order = list(registry.QUERIES)
    window = set(order[:50])
    missing = [n for n in registry._DRIVER_PRIORITY if n in registry.QUERIES and n not in window]
    assert not missing, f"priority queries past the driver's 50-query cut: {missing}"


def test_driver_priority_rotated_to_uncertified():
    """Forcing function for the per-round window rotation: every slot in the
    driver's 50-query window is wasted if its query already holds a green
    CORRECTNESS row from a prior round.  This fails at the START of round
    N+1 until _DRIVER_PRIORITY is rotated to never-certified queries.  If a
    certified query is legitimately re-fronted (its code or oracle changed,
    invalidating the old row), list it in _RECERTIFY below with the reason.

    ATOMIC-COMMIT REQUIREMENT: by design this test goes red the moment a
    round's CORRECTNESS_rNN.json certifying the current window lands —
    commit the round-N artifact and the round-N+1 rotation TOGETHER (or
    rotate first in the same working tree) so CI never sits between them.

    A query counts as *certified* only if some round's row is fully green
    (rows_match, schema_match, hash_match all true, err null); a failing
    driver row must keep its query inside the window for re-verification.
    """
    import json
    from pathlib import Path

    # Re-fronted because their code changed after the certifying round.
    # Round 8: empty — the only re-fronted query, q_quality_ensemble, was
    # never certified (its r07 row errored), so it needs no exemption.
    _RECERTIFY: set[str] = set()
    repo = Path(__file__).resolve().parents[1]
    certified: set[str] = set()
    for p in sorted(repo.glob("CORRECTNESS_r*.json")):
        for name, row in json.loads(p.read_text()).items():
            if (
                isinstance(row, dict)
                and row.get("rows_match") is True
                and row.get("schema_match") is True
                and row.get("hash_match") is True
                and row.get("err") is None
            ):
                certified.add(name)
    stale = [
        n
        for n in registry._DRIVER_PRIORITY
        if n in certified and n not in _RECERTIFY
    ]
    assert not stale, (
        "driver-window slots burned on already-certified queries (rotate "
        f"registry._DRIVER_PRIORITY): {stale}"
    )


def test_rows_only_queries_run(spark, sf_dir):
    """Queries without an oracle must still produce a non-trivial result,
    not merely avoid throwing.  Currently EVERY registered query is
    oracle-checked, so the loop is vacuously green — written this way
    (not parametrized) so an empty set reads as a pass on the stronger
    invariant instead of a perpetual pytest skip."""
    for name in _ROWS_ONLY:
        df = registry.QUERIES[name](spark, sf_dir)
        assert len(df.columns) > 0, name
        assert df.count() > 0, name


def test_registered_query_schemas_are_atomic(spark, sf_dir):
    """The driver's canonicalizer pandas-sorts and hashes the result frame;
    a top-level array/map/struct column is unhashable there and errors the
    row (q_quality_ensemble, CORRECTNESS_r07).  Guard the whole class:
    every registered query must return only atomic top-level columns.
    Schema resolution is lazy (plan analysis only), so this sweeps all ~280
    queries without executing them."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    offenders = []
    for name, fn in registry.QUERIES.items():
        for f in fn(spark, sf_dir).schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType)):
                offenders.append(f"{name}.{f.name}:{f.dataType.simpleString()}")
    assert not offenders, (
        "non-atomic top-level result columns (serialize with array_join or "
        f"to_json before returning): {offenders}"
    )
