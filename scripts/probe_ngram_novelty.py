"""Round-13 one-off: interleaved in-process A/B of q_ngram_novelty's two
forms at a given scale — the r12 single-pass collect_set rewrite (current
registry code, variant 'new') vs the pre-r12 distinct+anti-join form
(variant 'old', reconstructed inline from 230f7b1^) — alternating reps in
ONE session so host-load bands hit both equally (r12 protocol).

Usage: python scripts/probe_ngram_novelty.py SF_DIR REPS
Prints one JSON line {"old": [...], "new": [...]}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from real_time_iot_data_engineering_pipeline_spark import registry  # noqa: E402
from real_time_iot_data_engineering_pipeline_spark.queries.lexical import (  # noqa: E402
    NOVELTY_N,
    _tok_arrays,
)
from real_time_iot_data_engineering_pipeline_spark.queries.prep import (  # noqa: E402
    SPLIT_TRAIN_PCT,
)
from real_time_iot_data_engineering_pipeline_spark.functions.rounding import (  # noqa: E402
    fround,
)
from real_time_iot_data_engineering_pipeline_spark.session import (  # noqa: E402
    build_session,
)
from real_time_iot_data_engineering_pipeline_spark.sources import (  # noqa: E402
    load_table,
)


def old_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _tok_arrays(spark, sf_dir)
    grams = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(slice(t, 1, greatest(size(t) - {NOVELTY_N - 1}, 0)),"
                " (x, i) -> concat_ws(' ', x, t[i + 1], t[i + 2],"
                " t[i + 3], t[i + 4]))"
            )
        ).alias("gram"),
    )
    bucket = F.expr(
        "cast(cast(conv(substr(md5(cast(doc_id AS string)), 1, 15), 16, 10) "
        "AS bigint) % 100 AS int)"
    )
    grams = grams.withColumn("_b", bucket)
    train = (
        grams.filter(F.col("_b") < SPLIT_TRAIN_PCT).select("gram").distinct()
    )
    src = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    test = (
        grams.filter(F.col("_b") >= SPLIT_TRAIN_PCT)
        .join(src, "doc_id")
        .select("source", "gram")
        .distinct()
    )
    novel = test.join(train, "gram", "left_anti")
    n_test = test.groupBy("source").agg(
        F.count("*").cast("long").alias("n_test_grams")
    )
    n_novel = novel.groupBy("source").agg(
        F.count("*").cast("long").alias("n_novel")
    )
    return (
        n_test.join(n_novel, "source", "left")
        .select(
            "source",
            "n_test_grams",
            F.coalesce(F.col("n_novel"), F.lit(0)).cast("long").alias(
                "n_novel"
            ),
            fround(
                F.coalesce(F.col("n_novel"), F.lit(0))
                / F.col("n_test_grams").cast("double"),
                6,
            ).alias("novelty"),
        )
        .orderBy("source")
    )


def main() -> None:
    sf_dir, reps = sys.argv[1], int(sys.argv[2])
    registry.load_all()
    spark = build_session(app_name="probe-ngram-novelty")
    spark.sparkContext.setLogLevel("ERROR")
    new_form = registry.QUERIES["q_ngram_novelty"]
    # warm codegen/scan on both variants
    old_form(spark, sf_dir).write.format("noop").mode("overwrite").save()
    new_form(spark, sf_dir).write.format("noop").mode("overwrite").save()
    out = {"old": [], "new": []}
    for r in range(reps):
        for variant, fn in (("old", old_form), ("new", new_form)):
            spark.sparkContext.setJobDescription(f"ngram:{variant}:{r}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            out[variant].append(round(time.perf_counter() - t0, 3))
            print(
                f"[probe] {variant} r{r}: {out[variant][-1]}",
                file=sys.stderr,
                flush=True,
            )
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
