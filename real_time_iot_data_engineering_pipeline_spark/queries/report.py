"""Corpus reporting operators over `documents`: global vocabulary top-k
(the feed a tokenizer-training run starts from) and the per-source
"dataset card" composition summary.  Small operators, but each pins a
scale shape the engine must get right: global top-k WITHOUT a global
sort, and grand-total ratios WITHOUT a single-partition window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import fround, fround_sql
from ..registry import register
from ..sources import load_table

VOCAB_K = 100


@register(
    "q_vocab_topk",
    oracle=f"""
    WITH tok AS (
        SELECT lower(unnest(string_split_regex(trim(text), '\\s+'))) AS token
        FROM documents
    )
    SELECT token, CAST(count(*) AS BIGINT) AS n
    FROM tok
    GROUP BY token
    ORDER BY n DESC, token
    LIMIT {VOCAB_K}
    """,
)
def q_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global token vocabulary: the {VOCAB_K} most frequent lowercased
    whitespace tokens with counts, ties broken lexicographically — the
    frequency table tokenizer training (BPE seed vocab, coverage checks)
    reads first.

    Scale: token counting is a partial agg on a high-cardinality key
    (map-side combine collapses each split's Zipf head before the
    shuffle).  The global top-k is orderBy+limit, which Spark plans as
    TakeOrderedAndProject — each partition keeps only its own top
    {VOCAB_K} and the driver merges #partitions x {VOCAB_K} rows; no
    global sort, no single-partition exchange."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        F.explode(F.split(F.trim("text"), r"\s+")).alias("raw")
    ).select(F.lower("raw").alias("token"))
    return (
        tok.groupBy("token")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(VOCAB_K)
    )


@register(
    "q_corpus_stats",
    oracle=f"""
    WITH s AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT)
                   AS n_tokens,
               {fround_sql("avg(n_chars)")} AS avg_chars
        FROM documents
        GROUP BY source
    ),
    t AS (SELECT sum(n_docs) AS total_docs FROM s)
    SELECT source, n_docs, n_tokens, avg_chars,
           {fround_sql("n_docs::DOUBLE / total_docs")} AS doc_share
    FROM s, t
    """,
)
def q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus composition ("dataset card"): document count,
    token count, mean document length, and each source's share of the
    corpus — the report a data-mixing decision is made from.

    Scale: one partial agg keyed by source; the grand total for the share
    column comes from a BROADCAST join-back of the 1-row total (the
    q_city_avg_compare idiom), never a single-partition window over the
    aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.size(F.split(F.trim("text"), r"\s+"))).cast("long").alias("n_tokens"),
        fround(F.avg("n_chars"), 4).alias("avg_chars"),
    )
    total = s.agg(F.sum("n_docs").alias("total_docs"))
    return s.crossJoin(F.broadcast(total)).select(
        "source",
        "n_docs",
        "n_tokens",
        "avg_chars",
        fround(F.col("n_docs").cast("double") / F.col("total_docs"), 4).alias(
            "doc_share"
        ),
    )
