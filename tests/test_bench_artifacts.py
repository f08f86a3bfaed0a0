"""Committed bench artifacts must stay round-over-round comparable
(round-5 ADVICE: BENCH_DETAIL.json once shipped as an sf0.01 run while
every BENCH_rNN.json was sf0.1, making the wall-clock comparison a
10x-smaller-dataset artifact)."""

from __future__ import annotations

import json
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def test_bench_detail_sf_matches_round_artifacts():
    detail = json.loads((REPO / "BENCH_DETAIL.json").read_text())
    rounds = sorted(REPO.glob("BENCH_r*.json"))
    assert rounds, "driver round artifacts missing"
    latest = json.loads(rounds[-1].read_text())
    assert detail["sf"] == latest["sf"], (
        f"committed BENCH_DETAIL.json is an sf={detail['sf']} run; round "
        f"artifacts are sf={latest['sf']} — regenerate with "
        "SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python bench.py"
    )


def test_bench_detail_covers_current_registry():
    """Forcing function: after registering new queries, re-run the sf0.1
    bench so the committed detail (and the baseline ledger built from it)
    covers them."""
    from real_time_iot_data_engineering_pipeline_spark import registry

    registry.load_all()
    detail = json.loads((REPO / "BENCH_DETAIL.json").read_text())
    missing = sorted(set(registry.QUERIES) - set(detail["queries"]))
    assert not missing, (
        f"queries with no committed sf0.1 bench row: {missing} — re-run "
        "bench.py at sf0.1"
    )


def test_dedup_similarity_families_have_sf1_baselines():
    """The 100 TB-critical operators (dedup/similarity families) carry an
    sf1.0 baseline row (r8 verdict ask #5) so their regression bar exists
    at the largest local scale.  Forcing function for NEW family queries:
    registering one obliges an sf1 leg (scripts/time_queries.py on
    .scale/sf1) merged via scripts/gen_baseline.py."""
    import re

    from real_time_iot_data_engineering_pipeline_spark import registry

    registry.load_all()
    fam_pat = re.compile(
        r"dedup|minhash|simhash|jaccard|embed|knn|semantic|decontam|novelty"
        r"|dup_group|fingerprint|sparse_cosine|pq_|editdist|paragraph"
    )
    ledger = json.loads(
        (REPO / "bench_snapshots" / "BASELINES.json").read_text()
    )
    missing = sorted(
        n
        for n in registry.QUERIES
        if fam_pat.search(n) and "sf1" not in ledger.get(n, {})
    )
    assert not missing, (
        f"dedup/similarity queries with no sf1.0 baseline row: {missing} — "
        "run scripts/time_queries.py on .scale/sf1 and merge with "
        "scripts/gen_baseline.py"
    )
