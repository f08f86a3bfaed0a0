"""Beyond-reference training-data preparation operators over `documents`:
PII/URL redaction and deterministic train/validation/test splitting — the
corpus-hygiene stages an LLM data pipeline runs between dedup and training.

Design rules follow queries/text.py: portable hashing (md5 hex — never an
engine-specific 64-bit hash), JVM-side regex/string work only (no Python in
the hot path), and PLANTED fixtures — the driver documents are synthetic
word salad with no PII, so the redaction corpus deterministically appends
known PII to a doc_id-keyed subset and the oracle derives the identical
corpus in SQL, making redaction recall itself part of the checked contract.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import fround, fround_sql
from ..functions.tokenize import WS as _WS, NOT_WS as _NOT_WS
from ..registry import ORACLES, register
from ..sources import load_table
from . import text as _text_mod

# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# Patterns valid in BOTH regex dialects (Java for Spark, RE2 for DuckDB):
# no backrefs, no lookaround.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_RE = f"https?://{_NOT_WS}"
PHONE_RE = r"\b\d{3}-\d{4}\b"

# Every 5th doc gets one email + one URL + one phone appended.
_PII_CORPUS_SQL = """
    SELECT doc_id,
           CASE WHEN doc_id % 5 = 0
                THEN text || ' Contact user' || CAST(doc_id AS VARCHAR)
                     || '@example.com or https://example.org/u/'
                     || CAST(doc_id AS VARCHAR) || ' or call 555-'
                     || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || '.'
                ELSE text END AS text
    FROM documents
"""


def _pii_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    planted = F.concat(
        F.col("text"),
        F.lit(" Contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or https://example.org/u/"),
        F.col("doc_id").cast("string"),
        F.lit(" or call 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit("."),
    )
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 5 == 0, planted).otherwise(F.col("text")).alias(
            "text"
        ),
    )


@register(
    "q_pii_redact",
    oracle=f"""
    WITH corpus AS ({_PII_CORPUS_SQL}),
    counted AS (
        SELECT doc_id, text,
               len(regexp_extract_all(text, '{EMAIL_RE}')) AS n_emails,
               len(regexp_extract_all(text, '{URL_RE}')) AS n_urls,
               len(regexp_extract_all(text, '{PHONE_RE}')) AS n_phones
        FROM corpus
    )
    SELECT doc_id,
           regexp_replace(
               regexp_replace(
                   regexp_replace(text, '{URL_RE}', '[URL]', 'g'),
                   '{EMAIL_RE}', '[EMAIL]', 'g'),
               '{PHONE_RE}', '[PHONE]', 'g') AS redacted,
           CAST(n_emails AS INT) AS n_emails,
           CAST(n_urls AS INT) AS n_urls,
           CAST(n_phones AS INT) AS n_phones,
           CAST(n_emails + n_urls + n_phones AS INT) AS n_redactions
    FROM counted
    """,
)
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub: replace emails/URLs/phone numbers with typed placeholder
    tokens and count what was removed, per document.

    URL redaction runs FIRST so an address embedded in a URL query string
    cannot survive as a partial match after the URL is collapsed; counts are
    taken on the original text.  All three passes are codegen regex
    projections — shuffle-free, embarrassingly parallel at any scale; the
    planted-PII corpus derivation makes recall oracle-checked, not assumed.
    """
    corpus = _pii_corpus(spark, sf_dir)
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), URL_RE, "[URL]"), EMAIL_RE, "[EMAIL]"
        ),
        PHONE_RE,
        "[PHONE]",
    )
    # Counts go through the Python API (F.lit pattern), NOT F.expr — a SQL
    # string literal would escape-process \b and \d and corrupt the regex.
    n_emails = F.size(F.regexp_extract_all("text", F.lit(EMAIL_RE), F.lit(0)))
    n_urls = F.size(F.regexp_extract_all("text", F.lit(URL_RE), F.lit(0)))
    n_phones = F.size(F.regexp_extract_all("text", F.lit(PHONE_RE), F.lit(0)))
    return corpus.select(
        "doc_id",
        redacted.alias("redacted"),
        n_emails.cast("int").alias("n_emails"),
        n_urls.cast("int").alias("n_urls"),
        n_phones.cast("int").alias("n_phones"),
        (n_emails + n_urls + n_phones).cast("int").alias("n_redactions"),
    )


# ---------------------------------------------------------------------------
# Deterministic train/validation/test split
# ---------------------------------------------------------------------------

SPLIT_TRAIN_PCT = 80
SPLIT_VALID_PCT = 10  # test gets the remainder


@register(
    "q_train_test_split",
    oracle=f"""
    SELECT doc_id, source,
           CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100
                AS INT) AS bucket,
           CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100
                     < {SPLIT_TRAIN_PCT} THEN 'train'
                WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100
                     < {SPLIT_TRAIN_PCT + SPLIT_VALID_PCT} THEN 'validation'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def q_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/validation/test assignment by hashed
    document id — the split every training pipeline needs to be stable
    across reruns, engines and data re-partitioning (a random split is
    neither reproducible nor join-safe).

    The bucket is md5-derived (engine-portable; Spark's hash() is murmur3
    which DuckDB cannot reproduce — same idiom as q_hash_partition), using
    15 hex chars = 60 bits, inside bigint range.  Pure projection: no
    shuffle, no state; stratified variants key the same hash by
    (stratum, doc_id).  Keeping `source` in the output makes the
    per-source composition of each split auditable downstream."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.expr(
        "cast(cast(conv(substr(md5(cast(doc_id AS string)), 1, 15), 16, 10) "
        "AS bigint) % 100 AS int)"
    )
    split = (
        F.when(F.col("bucket") < SPLIT_TRAIN_PCT, "train")
        .when(F.col("bucket") < SPLIT_TRAIN_PCT + SPLIT_VALID_PCT, "validation")
        .otherwise("test")
    )
    return docs.select("doc_id", "source", bucket.alias("bucket")).withColumn(
        "split", split
    )


# ---------------------------------------------------------------------------
# Source-weighted corpus sampling (data mixing)
# ---------------------------------------------------------------------------

# Per-source keep rates in percent — the "mixture weights" a training run
# applies to rebalance corpora (upweight curated sources, downsample crawl).
SAMPLE_RATES = {"src0": 100, "src1": 50, "src2": 25}
SAMPLE_RATE_DEFAULT = 10

_RATE_CASE_SQL = (
    "CASE source "
    + " ".join(f"WHEN '{s}' THEN {r}" for s, r in sorted(SAMPLE_RATES.items()))
    + f" ELSE {SAMPLE_RATE_DEFAULT} END"
)


@register(
    "q_sample_stratified",
    oracle=f"""
    WITH rated AS (
        SELECT doc_id, source,
               CAST({_RATE_CASE_SQL} AS INT) AS keep_pct,
               CAST(('0x' || substr(md5('smp:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100
                    AS INT) AS bucket
        FROM documents
    )
    SELECT doc_id, source, keep_pct, bucket
    FROM rated
    WHERE bucket < keep_pct
    """,
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-weighted deterministic sampling — the corpus-mixing stage that
    rebalances training data per source (keep 100% of src0, 50% of src1,
    25% of src2, 10% of the long tail).

    The keep/drop decision hashes a salted doc_id ('smp:' prefix), so it is
    INDEPENDENT of the train/test split hash — sampling then splitting
    cannot correlate — reproducible across runs and engines, and a pure
    projection + filter (shuffle-free; the filter pushes to the scan).
    Changing mixture weights only moves the threshold, so a rerun with a
    higher rate is a superset of the lower-rate sample (nested samples —
    handy for scaling-law ladders)."""
    docs = load_table(spark, sf_dir, "documents")
    rate = F.coalesce(
        *[
            F.when(F.col("source") == s, F.lit(r))
            for s, r in sorted(SAMPLE_RATES.items())
        ],
        F.lit(SAMPLE_RATE_DEFAULT),
    )
    bucket = F.expr(
        "cast(cast(conv(substr(md5(concat('smp:', cast(doc_id AS string))), 1, 15), "
        "16, 10) AS bigint) % 100 AS int)"
    )
    return (
        docs.select(
            "doc_id",
            "source",
            rate.cast("int").alias("keep_pct"),
            bucket.alias("bucket"),
        )
        .filter(F.col("bucket") < F.col("keep_pct"))
    )


# ---------------------------------------------------------------------------
# Document chunking (overlapping character windows)
# ---------------------------------------------------------------------------

CHUNK_CHARS = 200
CHUNK_OVERLAP = 50
_CHUNK_STEP = CHUNK_CHARS - CHUNK_OVERLAP


@register(
    "q_doc_chunk",
    oracle=f"""
    WITH offs AS (
        SELECT doc_id,
               unnest(generate_series(1, greatest(n_chars - {CHUNK_OVERLAP}, 1),
                                      {_CHUNK_STEP})) AS off,
               text
        FROM documents
    )
    SELECT doc_id,
           CAST((off - 1) / {_CHUNK_STEP} AS INT) AS chunk_id,
           CAST(off AS INT) AS char_start,
           substr(text, off, {CHUNK_CHARS}) AS chunk
    FROM offs
    """,
)
def q_doc_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split documents into {CHUNK_CHARS}-char windows with {CHUNK_OVERLAP}
    overlap — the chunking stage feeding embedding / retrieval pipelines.
    The last chunk may be short; every character is covered and every
    boundary region appears in two chunks.

    Scale: explode over an arithmetic offset sequence inside codegen —
    shuffle-free row fan-out (output rows ~ chars/{_CHUNK_STEP}), the same
    shape as the multimodal frame sampler.  Uses the documents table's
    n_chars column so both engines derive identical offset lists."""
    docs = load_table(spark, sf_dir, "documents")
    offs = docs.select(
        "doc_id",
        "text",
        F.explode(
            F.sequence(
                F.lit(1),
                F.greatest(F.col("n_chars") - CHUNK_OVERLAP, F.lit(1)),
                F.lit(_CHUNK_STEP),
            )
        ).alias("off"),
    )
    return offs.select(
        "doc_id",
        ((F.col("off") - 1) / _CHUNK_STEP).cast("int").alias("chunk_id"),
        F.col("off").cast("int").alias("char_start"),
        F.expr(f"substr(text, off, {CHUNK_CHARS})").alias("chunk"),
    )


# ---------------------------------------------------------------------------
# Sequence packing (cumulative-token binning)
# ---------------------------------------------------------------------------

PACK_TOKENS = 2048  # target tokens per training sequence
PACK_SHARD_DOCS = 1000  # docs per packing shard (bounds the window state)


@register(
    "q_sequence_pack",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id,
               CAST(doc_id // {PACK_SHARD_DOCS} AS BIGINT) AS shard,
               len(string_split_regex(trim(text), '{_WS}')) AS n_tokens
        FROM documents
    ),
    packed AS (
        SELECT doc_id, shard, n_tokens,
               sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) AS cum
        FROM toks
    )
    SELECT doc_id, CAST(shard AS INT) AS shard,
           CAST(n_tokens AS INT) AS n_tokens,
           CAST((cum - n_tokens) // {PACK_TOKENS} AS INT) AS seq_in_shard,
           CAST(cum - n_tokens - ((cum - n_tokens) // {PACK_TOKENS}) * {PACK_TOKENS}
                AS INT) AS token_offset
    FROM packed
    """,
)
def q_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous sequence packing: assign each document a training-sequence
    slot of ~{PACK_TOKENS} whitespace-tokens by cumulative token count —
    the packing stage that turns a cleaned corpus into fixed-budget
    training rows (docs are not split; a doc starts at token_offset inside
    sequence seq_in_shard of its shard).

    Scale: packing is inherently sequential, so it runs per SHARD of
    {PACK_SHARD_DOCS} docs (deterministic doc_id ranges) — the window state
    is bounded, shards pack embarrassingly parallel after one shard-keyed
    shuffle, and contiguity-within-shard is exactly the trade production
    packers make (pack within partition, never globally)."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    toks = docs.select(
        "doc_id",
        (F.col("doc_id") / PACK_SHARD_DOCS).cast("bigint").alias("shard"),
        F.size(F.split(F.trim("text"), _WS)).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = toks.withColumn("cum", F.sum("n_tokens").over(w))
    start = F.col("cum") - F.col("n_tokens")
    seq = F.floor(start / PACK_TOKENS)
    return packed.select(
        "doc_id",
        F.col("shard").cast("int").alias("shard"),
        F.col("n_tokens").cast("int").alias("n_tokens"),
        seq.cast("int").alias("seq_in_shard"),
        (start - seq * PACK_TOKENS).cast("int").alias("token_offset"),
    )


@register(
    "q_winsorize",
    oracle=f"""
    WITH bounds AS (
        SELECT event_type,
               {fround_sql("quantile_cont(value, 0.05)", 6)} AS lo,
               {fround_sql("quantile_cont(value, 0.95)", 6)} AS hi
        FROM events
        GROUP BY event_type
    )
    SELECT e.event_id,
           e.event_type,
           {fround_sql("e.value")} AS value,
           {fround_sql("least(greatest(e.value, b.lo), b.hi)")} AS clipped,
           (e.value < b.lo OR e.value > b.hi) AS was_clipped
    FROM events e
    JOIN bounds b USING (event_type)
    """,
)
def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile winsorization (robust feature clipping): clamp each
    event's value to its event type's [p05, p95] band and flag the
    outliers — the standard tail-taming step before z-scoring or model
    features, complementing q_outlier_flag's stddev rule with a
    distribution-free one.

    Scale: per-type bounds are a partial-aggregated exact-percentile pass
    (hash-accumulating, no per-group sort — same contract as
    q_quantile_summary; approx_percentile is the unbounded-domain
    production twin), and the |types|-row bounds table broadcasts back
    onto the stream — no window over low-cardinality event_type, no
    second shuffle of the fact rows.

    Cross-engine determinism: the two engines' percentile interpolation
    can differ in the last ulp, so the BOUNDS are quantized at 6 dp on
    both sides before any comparison — the clip and the flag then compare
    raw values against bit-identical bounds."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    bounds = ev.groupBy("event_type").agg(
        fround(F.expr("percentile(value, 0.05)"), 6).alias("lo"),
        fround(F.expr("percentile(value, 0.95)"), 6).alias("hi"),
    )
    return ev.join(F.broadcast(bounds), "event_type").select(
        "event_id",
        "event_type",
        fround(F.col("value"), 4).alias("value"),
        fround(F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi")), 4)
        .alias("clipped"),
        ((F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi"))).alias(
            "was_clipped"
        ),
    )


# ---------------------------------------------------------------------------
# Packing-efficiency report: how well did sequence packing fill its budget?
# ---------------------------------------------------------------------------

_PACK_ORACLE = ORACLES["q_sequence_pack"]


@register(
    "q_pack_efficiency",
    oracle=f"""
    WITH packed AS ({_PACK_ORACLE}),
    per_shard AS (
        SELECT shard,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(max(seq_in_shard) + 1 AS BIGINT) AS n_seqs,
               CAST(sum(n_tokens) AS BIGINT) AS total_tokens
        FROM packed GROUP BY shard
    )
    SELECT shard, n_docs, n_seqs, total_tokens,
           CAST(n_seqs * {PACK_TOKENS} AS BIGINT) AS capacity,
           {fround_sql(
               f"total_tokens / CAST(n_seqs * {PACK_TOKENS} AS DOUBLE)", 6)}
               AS utilization,
           {fround_sql("total_tokens / CAST(n_docs AS DOUBLE)", 2)}
               AS mean_doc_tokens
    FROM per_shard
    ORDER BY shard
    """,
)
def q_pack_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Efficiency report over the REGISTERED packing assignment
    (q_sequence_pack): per shard, how many training sequences the packer
    opened, the token mass that landed in them, and utilization against
    the {PACK_TOKENS}-token budget — the number a training-data team
    watches to decide whether to enable doc splitting or change shard
    ordering (utilization ~1 means tight packing; the open tail sequence
    of each shard is the structural waste).  Composed on the registered
    operator so the report can never drift from the packing it describes.

    Scale: one partial aggregate over the packing output keyed by shard —
    report cardinality is #shards (metadata scale), and the packing
    itself already bounded its window state per shard."""
    packed = q_sequence_pack(spark, sf_dir)
    per_shard = packed.groupBy("shard").agg(
        F.count("*").cast("long").alias("n_docs"),
        (F.max("seq_in_shard") + 1).cast("long").alias("n_seqs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
    )
    return per_shard.select(
        "shard",
        "n_docs",
        "n_seqs",
        "total_tokens",
        (F.col("n_seqs") * PACK_TOKENS).cast("long").alias("capacity"),
        fround(
            F.col("total_tokens")
            / (F.col("n_seqs") * PACK_TOKENS).cast("double"),
            6,
        ).alias("utilization"),
        fround(
            F.col("total_tokens") / F.col("n_docs").cast("double"), 2
        ).alias("mean_doc_tokens"),
    ).orderBy("shard")


# ---------------------------------------------------------------------------
# k-anonymity audit (round 7)
# ---------------------------------------------------------------------------

K_ANON = 5  # a quasi-identifier group smaller than this re-identifies


@register(
    "q_k_anonymity",
    oracle=f"""
    WITH qi AS (
        SELECT event_type,
               date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
               CAST(floor(value / 10) AS BIGINT) AS value_band
        FROM events
    ),
    groups AS (
        SELECT event_type, day, value_band, count(*) AS k
        FROM qi GROUP BY 1, 2, 3
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(min(k) AS BIGINT) AS min_k,
           CAST(sum(CASE WHEN k < {K_ANON} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_small_groups,
           CAST(sum(CASE WHEN k < {K_ANON} THEN k ELSE 0 END) AS BIGINT)
               AS n_rows_at_risk,
           {fround_sql(
               f"sum(CASE WHEN k < {K_ANON} THEN k ELSE 0 END)"
               " / CAST(sum(k) AS DOUBLE)",
               6,
           )} AS suppression_rate
    FROM groups
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier tuple (event_type, day,
    value decade band): group sizes k, the groups below k={K_ANON}, and the
    row fraction a suppress-small-groups release policy would drop — the
    privacy gate a data release runs after PII redaction (q_pii_redact
    handles direct identifiers; this handles re-identification by joining
    background knowledge on the quasi-identifiers).

    Scale: two chained aggregations — the first keyed by the (bounded)
    quasi-identifier tuple with map-side partial agg, the second by its
    event_type prefix (re-aggregation of an already-reduced frame), so
    nothing data-proportional ever shuffles twice."""
    ev = load_table(spark, sf_dir, "events")
    groups = (
        ev.select(
            "event_type",
            F.date_trunc("day", "ts").alias("day"),
            F.floor(F.col("value") / 10).cast("long").alias("value_band"),
        )
        .groupBy("event_type", "day", "value_band")
        .agg(F.count("*").alias("k"))
    )
    small = F.col("k") < K_ANON
    return (
        groups.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_groups"),
            F.min("k").cast("long").alias("min_k"),
            F.sum(small.cast("long")).cast("long").alias("n_small_groups"),
            F.sum(F.when(small, F.col("k")).otherwise(0))
            .cast("long")
            .alias("n_rows_at_risk"),
            fround(
                F.sum(F.when(small, F.col("k")).otherwise(0)).cast("double")
                / F.sum("k").cast("double"),
                6,
            ).alias("suppression_rate"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Per-key lag features (round 7)
# ---------------------------------------------------------------------------


@register(
    "q_lag_features",
    oracle=f"""
    WITH daily AS (
        SELECT user_id,
               date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
               {fround_sql("sum(value)", 6)} AS day_value
        FROM events GROUP BY 1, 2
    )
    SELECT user_id, day, day_value,
           lag(day_value, 1) OVER w AS lag_1,
           lag(day_value, 7) OVER w AS lag_7,
           {fround_sql("day_value - lag(day_value, 1) OVER w", 6)} AS delta_1,
           {fround_sql(
               "(day_value - lag(day_value, 7) OVER w)"
               " / nullif(lag(day_value, 7) OVER w, 0)",
               6,
           )} AS pct_change_7
    FROM daily
    WINDOW w AS (PARTITION BY user_id ORDER BY day)
    ORDER BY user_id, day
    """,
)
def q_lag_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supervised-learning feature generation: per entity's daily series,
    lag-1 / lag-7 values, the one-day delta and the week-over-week percent
    change — the standard autoregressive feature block a forecasting or
    churn model trains on.

    Scale: the window partitions by the HIGH-cardinality entity key over
    the pre-aggregated daily frame (<=31 rows per key here; bounded by the
    date span generally), so per-partition sorts are tiny and the exchange
    is the same user_id hash shuffle the daily aggregate already made —
    lag features are free once the groupBy ran.  day_value is quantized
    (fround 6) BEFORE the lags so every derived column compares
    engine-exact."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(fround(F.sum("value"), 6).alias("day_value"))
    w = Window.partitionBy("user_id").orderBy("day")
    lag1 = F.lag("day_value", 1).over(w)
    lag7 = F.lag("day_value", 7).over(w)
    return daily.select(
        "user_id",
        "day",
        "day_value",
        lag1.alias("lag_1"),
        lag7.alias("lag_7"),
        fround(F.col("day_value") - lag1, 6).alias("delta_1"),
        fround(
            (F.col("day_value") - lag7) / F.nullif(lag7, F.lit(0)), 6
        ).alias("pct_change_7"),
    ).orderBy("user_id", "day")


# ---------------------------------------------------------------------------
# URL canonicalization dedup (round 7)
# ---------------------------------------------------------------------------

# Planted raw URLs: item number and surface variant derive from coprime
# doc_id residues (7 and 5), so every item appears under several surface
# forms across the corpus and canonicalization genuinely merges groups —
# oracle-checked, not vacuous (the curation-tier plant pattern).
_URL_HOST = "cdn.example.com"
_URL_HOST_UC = "CDN.Example.COM"

_RAW_URL_SPARK = (
    "concat('https://', "
    f"if(doc_id % 5 = 1, '{_URL_HOST_UC}', '{_URL_HOST}'), "
    "'/items/', cast(doc_id % 7 as string), "
    "if(doc_id % 5 = 1, '/', ''), "
    "if(doc_id % 5 = 2, '?utm_source=feed', ''), "
    "if(doc_id % 5 = 4, '?keep=1&utm_medium=email', ''), "
    "if(doc_id % 5 = 3, '#section', ''))"
)
_RAW_URL_DUCK = (
    "'https://' || "
    f"CASE WHEN doc_id % 5 = 1 THEN '{_URL_HOST_UC}' ELSE '{_URL_HOST}' END "
    "|| '/items/' || CAST(doc_id % 7 AS VARCHAR) "
    "|| CASE WHEN doc_id % 5 = 1 THEN '/' ELSE '' END "
    "|| CASE WHEN doc_id % 5 = 2 THEN '?utm_source=feed' ELSE '' END "
    "|| CASE WHEN doc_id % 5 = 4 THEN '?keep=1&utm_medium=email' ELSE '' END "
    "|| CASE WHEN doc_id % 5 = 3 THEN '#section' ELSE '' END"
)

# canonicalization pipeline, identical regex steps in both engines:
# 1. drop the fragment   2. drop utm_* params   3. drop dangling ?/&
# 4. drop a trailing path slash   5. lowercase scheme://host
_CANON_STEPS = (
    ("#.*$", ""),
    ("utm_[a-z]+=[A-Za-z0-9]*&?", ""),
    ("[?&]+$", ""),
    ("/$", ""),
)


def _canon_spark(expr: str) -> str:
    for pat, rep in _CANON_STEPS:
        expr = f"regexp_replace({expr}, '{pat}', '{rep}')"
    return (
        f"concat(lower(regexp_extract({expr}, '^https?://[^/]+', 0)), "
        f"regexp_replace({expr}, '^https?://[^/]+', ''))"
    )


def _canon_duck(expr: str) -> str:
    for pat, rep in _CANON_STEPS:
        expr = f"regexp_replace({expr}, '{pat}', '{rep}', 'g')"
    return (
        f"lower(regexp_extract({expr}, '^https?://[^/]+')) || "
        f"regexp_replace({expr}, '^https?://[^/]+', '')"
    )


@register(
    "q_url_dedup",
    oracle=f"""
    WITH raw AS (
        SELECT doc_id, {_RAW_URL_DUCK} AS url FROM documents
    ),
    canon AS (
        SELECT doc_id, url, {_canon_duck("url")} AS canonical_url FROM raw
    )
    SELECT canonical_url,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT url) AS BIGINT) AS n_surface_forms,
           CAST(min(doc_id) AS BIGINT) AS keep_doc_id
    FROM canon
    GROUP BY canonical_url
    ORDER BY canonical_url
    """,
)
def q_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization dedup — the first stage of a web-corpus
    pipeline (CCNet/C4 dedup by URL before any content hashing): strip
    fragments, tracking (utm_*) parameters, dangling separators and
    trailing slashes, lowercase scheme+host, then group by the canonical
    form.  Emits each canonical URL's doc count, how many distinct
    surface forms collapsed into it, and the min-doc_id survivor the
    keep-first policy would retain.

    Scale: canonicalization is a fixed regex chain in whole-stage
    codegen; only the canonical-URL strings shuffle (never text), keyed
    by a high-cardinality column with map-side partial aggregation."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_RAW_URL_SPARK).alias("url")
    )
    canon = docs.withColumn("canonical_url", F.expr(_canon_spark("url")))
    return (
        canon.groupBy("canonical_url")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.countDistinct("url").cast("long").alias("n_surface_forms"),
            F.min("doc_id").cast("long").alias("keep_doc_id"),
        )
        .orderBy("canonical_url")
    )


# ---------------------------------------------------------------------------
# Leakage-safe (group-aware) train/validation/test split
# ---------------------------------------------------------------------------


@register(
    "q_group_split",
    oracle=f"""
    WITH corpus AS ({_text_mod._EXACT_CORPUS_SQL}),
    hashed AS (
        SELECT doc_id,
               sha256(lower(regexp_replace(trim(text), '{_WS}', ' ', 'g')))
                   AS content_hash
        FROM corpus
    ),
    groups AS (
        SELECT content_hash,
               min(doc_id) AS group_id,
               CAST(count(*) AS BIGINT) AS group_size
        FROM hashed GROUP BY content_hash
    )
    SELECT h.doc_id, g.group_id, g.group_size,
           CASE WHEN ('0x' || substr(md5(CAST(g.group_id AS VARCHAR)), 1, 15))::BIGINT
                     % 100 < {SPLIT_TRAIN_PCT} THEN 'train'
                WHEN ('0x' || substr(md5(CAST(g.group_id AS VARCHAR)), 1, 15))::BIGINT
                     % 100 < {SPLIT_TRAIN_PCT + SPLIT_VALID_PCT} THEN 'validation'
                ELSE 'test' END AS split
    FROM hashed h JOIN groups g USING (content_hash)
    """,
)
def q_group_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/validation/test assignment: whole DUPLICATE
    GROUPS move together, so two copies of the same content can never
    straddle train and test (the contamination a doc-level hash split —
    q_train_test_split — cannot prevent: every duplicate pair it separates
    is an eval answer sitting in the training set).  Groups are the exact
    content-hash groups of q_doc_dedup_exact; the split hash is keyed by
    the group REPRESENTATIVE (min doc_id), md5-derived with the same
    engine-portable 60-bit idiom as q_train_test_split, so group
    membership — not surface doc identity — decides the split.

    On the planted exact-dup corpus every (original, re-cased copy) pair
    lands in one split by construction; the oracle checks the assignment
    itself, and tests/test_setjoin.py asserts the no-straddle invariant
    holds over every group.

    Scale: one content-hash partial agg (64-byte hashes shuffle, text
    never does) + a hash-keyed join back; the split expression is a pure
    projection in whole-stage codegen.  Near-dup variants swap the group
    key for the CC component id from q_doc_dup_groups_cc — same plan."""
    corpus = _text_mod._exact_corpus(spark, sf_dir)
    normalized = F.lower(F.regexp_replace(F.trim("text"), _WS, " "))
    hashed = corpus.select(
        "doc_id", F.sha2(normalized, 256).alias("content_hash")
    )
    groups = hashed.groupBy("content_hash").agg(
        F.min("doc_id").alias("group_id"),
        F.count("*").cast("long").alias("group_size"),
    )
    bucket = F.expr(
        "cast(cast(conv(substr(md5(cast(group_id AS string)), 1, 15), 16, 10) "
        "AS bigint) % 100 AS int)"
    )
    split = (
        F.when(bucket < SPLIT_TRAIN_PCT, "train")
        .when(bucket < SPLIT_TRAIN_PCT + SPLIT_VALID_PCT, "validation")
        .otherwise("test")
    )
    return hashed.join(groups, "content_hash").select(
        "doc_id", "group_id", "group_size", split.alias("split")
    )


# ---------------------------------------------------------------------------
# Deterministic shuffle-sharding
# ---------------------------------------------------------------------------

# Number of output shards.  Production sets this to the target file count
# (e.g. corpus_bytes / 1 GiB); 16 keeps every shard populated at fixture SFs.
N_SHARDS = 16


@register(
    "q_shard_assign",
    oracle=f"""
    WITH hashed AS (
        SELECT doc_id,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h,
               len(string_split_regex(trim(text), '{_WS}')) AS ws_tokens,
               n_chars
        FROM documents
    )
    SELECT CAST(h % {N_SHARDS} AS INT) AS shard,
           count(*) AS n_docs,
           CAST(sum(ws_tokens) AS BIGINT) AS total_tokens,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           arg_min(doc_id, h) AS first_doc,
           arg_max(doc_id, h) AS last_doc
    FROM hashed
    GROUP BY 1
    """,
)
def q_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic shuffle-shard manifest: every document is assigned to
    one of {N_SHARDS} shards by a portable 60-bit md5 hash of its id, and
    within a shard the epoch read order is ascending hash — the standard
    'global shuffle once, stream shards sequentially' layout a training
    run needs to be reproducible across reruns, engines and cluster sizes
    (Spark's own hash() is murmur3, which nothing else can reproduce —
    same idiom as q_train_test_split).  Emits one manifest row per shard:
    sizes for balance auditing plus the first/last doc under the in-shard
    hash order as determinism witnesses.

    Scale posture: pure projection + one hash partial-agg on a perfectly
    uniform 16-ary key — at 100 TB this is the cheapest possible full-
    corpus pass (map-side combine reduces each partition to {N_SHARDS}
    rows before the exchange); the actual shard WRITE is
    `df.repartition(N_SHARDS, hash_col).sortWithinPartitions(hash)` on
    the same expressions, landing pre-shuffled training files.  min_by/
    max_by keep the witness O(1) per shard; the md5 hash is unique per
    doc (60 bits over corpus-scale ids), so the order key is total."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.expr(
        "cast(conv(substr(md5(cast(doc_id AS string)), 1, 15), 16, 10) AS bigint)"
    )
    hashed = docs.select(
        "doc_id",
        h.alias("h"),
        F.size(F.split(F.trim("text"), _WS)).cast("long").alias("ws_tokens"),
        "n_chars",
    )
    return (
        hashed.groupBy((F.col("h") % N_SHARDS).cast("int").alias("shard"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("ws_tokens").alias("total_tokens"),
            F.sum("n_chars").alias("total_chars"),
            F.min_by("doc_id", "h").alias("first_doc"),
            F.max_by("doc_id", "h").alias("last_doc"),
        )
    )


# ---------------------------------------------------------------------------
# Unicode canonicalization (NFC)
# ---------------------------------------------------------------------------


@register(
    "q_text_normalize",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN text IS NULL THEN NULL
                ELSE nfc_normalize(text) IS DISTINCT FROM text END AS nfc_changed,
           length(nfc_normalize(text)) AS n_chars_nfc,
           md5(nfc_normalize(regexp_replace(trim(text), '{_WS}', ' ', 'g')))
               AS canon_hash
    FROM documents
    """,
)
def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC canonicalization audit — the ingest stage that makes
    every later equality-based operator honest: an NFD 'e + COMBINING
    ACUTE' and a precomposed U+00E9 are different byte strings that hash
    apart, split apart and dedup apart until normalization folds them.
    Emits per doc: whether NFC changed the text, the post-NFC codepoint
    length, and the md5 of the canonical form (NFC over whitespace-
    collapsed trimmed text) — the key exact-dedup should run on.

    Spark has no built-in Unicode normalizer, so NFC runs as an
    Arrow-batched scalar pandas_udf (unicodedata.normalize per Arrow
    batch) — the engine's one non-multimodal Python stage, and the
    documented escape hatch shape (SURVEY §2.9): batch-vectorized
    transfer, never row-at-a-time pickling.  Both engines implement
    UAX#15, whose normalization-stability guarantee makes the outputs
    bit-identical across their Unicode versions for assigned codepoints;
    parity on composed/decomposed/Hangul/compatibility rows is pinned in
    tests/test_hostile_docs.py.

    Scale posture: embarrassingly parallel projection — no shuffle, no
    state; the Python stage costs one Arrow round-trip over (doc_id,
    text) and at 100 TB runs as wide as the scan.  Production would swap
    the udf body for a JVM ICU call via a registered expression; the
    plan shape (scan -> ArrowEvalPython -> project) is what's being
    certified here."""
    # pandas is imported at module scope so the stringified type hints
    # (`from __future__ import annotations`) resolve for pandas_udf's
    # signature inference.

    @F.pandas_udf("string")
    def _nfc(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(
            lambda t: unicodedata.normalize("NFC", t) if t is not None else None
        )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    nfc_text = _nfc(F.col("text"))
    canon = _nfc(F.regexp_replace(F.trim("text"), _WS, " "))
    return docs.select(
        "doc_id",
        F.when(
            F.col("text").isNotNull(), ~nfc_text.eqNullSafe(F.col("text"))
        ).alias("nfc_changed"),
        F.length(nfc_text).alias("n_chars_nfc"),
        F.md5(canon).alias("canon_hash"),
    )
