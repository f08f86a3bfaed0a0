"""Corpus reporting operators over `documents`: global vocabulary top-k
(the feed a tokenizer-training run starts from) and the per-source
"dataset card" composition summary.  Small operators, but each pins a
scale shape the engine must get right: global top-k WITHOUT a global
sort, and grand-total ratios WITHOUT a single-partition window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.rounding import fround, fround_sql
from ..functions.tokenize import WS as _WS
from ..registry import ORACLES, register
from ..sources import load_table
from .text import _QUALITY_EXPR_DUCK, _WORDS_SPARK, quality_score_col

VOCAB_K = 100
TFIDF_K = 3


@register(
    "q_vocab_topk",
    oracle=f"""
    WITH tok AS (
        SELECT lower(unnest(string_split_regex(trim(text), '{_WS}'))) AS token
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
        F.explode(F.split(F.trim("text"), _WS)).alias("raw")
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
               CAST(sum(len(string_split_regex(trim(text), '{_WS}'))) AS BIGINT)
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
        F.sum(F.size(F.split(F.trim("text"), _WS))).cast("long").alias("n_tokens"),
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


@register(
    "q_tfidf_topterms",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id,
               lower(unnest(string_split_regex(trim(text), '{_WS}'))) AS token
        FROM documents
    ),
    tf AS (
        SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
        FROM tok GROUP BY doc_id, token
    ),
    df AS (
        SELECT token, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY token
    ),
    n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
    scored AS (
        SELECT f.doc_id, f.token, f.tf,
               {fround_sql("f.tf * ln(n.n_docs / d.df)", 6)} AS score6,
               {fround_sql("f.tf * ln(n.n_docs / d.df)", 4)} AS score
        FROM tf f JOIN df d USING (token), n
    )
    SELECT doc_id, CAST(rnk AS INT) AS term_rank, token, tf, score
    FROM (
        SELECT doc_id, token, tf, score,
               row_number() OVER (
                   PARTITION BY doc_id ORDER BY score6 DESC, token
               ) AS rnk
        FROM scored
    )
    WHERE rnk <= {TFIDF_K}
    """,
)
def q_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-{TFIDF_K} TF-IDF terms: tf(t,d) * ln(N / df(t)),
    ranked per doc (ties broken by token) — the keyword/topic signal a
    corpus card or quality classifier reads per document.

    Scale: tf is a partial agg on the high-cardinality (doc_id, token)
    key; df is a partial agg over the tf table (never re-reads text).
    The df lookup is a plain equi-join on token — AQE converts it to a
    runtime broadcast when the vocabulary is small (here, and for any
    Zipf-headed corpus after a min-df cut) and falls back to sort-merge
    for a 100M-term web-scale vocabulary; nothing in the plan assumes
    the vocab fits on one executor.  The per-doc top-{TFIDF_K} is a
    rank-filtered window over doc_id — a high-cardinality partition key,
    so Catalyst applies WindowGroupLimit (partial top-k before the
    exchange) and no partition ever sees more than its own docs.

    Cross-engine determinism: ranking uses the score quantized to 6 dp
    (fround bias 1e-12 >> the ~1-ulp ln() divergence between Java
    Math.log and libm), with the token as total tiebreak.
    """
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(
            "doc_id", F.explode(F.split(F.trim("text"), _WS)).alias("raw")
        )
        .select("doc_id", F.lower("raw").alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    df = tf.groupBy("token").agg(F.count("*").cast("double").alias("df"))
    n = docs.agg(F.count("*").cast("double").alias("n_docs"))
    base = F.col("tf") * F.log(F.col("n_docs") / F.col("df"))
    scored = (
        tf.join(df, "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            "tf",
            fround(base, 6).alias("score6"),
            fround(base, 4).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score6"), "token")
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= TFIDF_K)
        .select("doc_id", "term_rank", "token", "tf", "score")
    )


@register(
    "q_mixture_weights",
    oracle=f"""
    WITH s AS (
        SELECT source,
               CAST(sum(len(string_split_regex(trim(text), '{_WS}'))) AS BIGINT)
                   AS n_tokens,
               -- TRY_CAST + default weight 1: the srcN-derived target
               -- weight is fixture plumbing, and a source name that does
               -- not parse (hostile-docs 'hostile') must not ERROR the
               -- oracle where Spark's try_cast yields NULL
               CAST(COALESCE(TRY_CAST(substr(source, 4) AS INT) + 1, 1)
                    AS DOUBLE) AS w
        FROM documents
        GROUP BY source
    ),
    t AS (
        SELECT CAST(sum(n_tokens) AS DOUBLE) AS total_tokens,
               sum(w) AS total_w
        FROM s
    ),
    r AS (
        SELECT source, n_tokens,
               (w / t.total_w) / (n_tokens / t.total_tokens) AS raw_rate,
               w / t.total_w AS target_share,
               n_tokens / t.total_tokens AS token_share
        FROM s, t
    ),
    m AS (SELECT max(raw_rate) AS max_rate FROM r)
    SELECT source, n_tokens,
           {fround_sql("token_share")} AS token_share,
           {fround_sql("target_share")} AS target_share,
           {fround_sql("raw_rate / m.max_rate")} AS sample_rate,
           CAST(floor(n_tokens * {fround_sql("raw_rate / m.max_rate")})
                AS BIGINT) AS sampled_tokens
    FROM r, m
    """,
)
def q_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture reweighting (the static DoReMi/Pile-style step):
    given a target weight per source (here the deterministic weight
    index(source)+1, renormalized over observed sources), compute each
    source's actual token share and the downsampling rate that realizes
    the target mixture without upsampling — the most over-represented
    source keeps rate 1.0 and everything else scales below it — plus
    the resulting token budget per source.

    Scale: one partial agg keyed by source (tiny output regardless of
    input size), then two broadcast join-backs of 1-row totals (grand
    token/weight sums, then the max raw rate) — the q_city_avg_compare
    idiom; no single-partition window anywhere, and the full corpus is
    read exactly once.
    """
    docs = load_table(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(
        F.sum(F.size(F.split(F.trim("text"), _WS))).cast("long").alias("n_tokens"),
        F.first(
            # try_cast keeps the weight derivation total under ANSI mode
            # and on non-srcN source names (default weight 1) — matching
            # the oracle's TRY_CAST (hostile-docs suite)
            F.coalesce(
                F.substring("source", 4, 10).try_cast("int") + F.lit(1),
                F.lit(1),
            ).cast("double")
        ).alias("w"),
    )
    t = s.agg(
        F.sum("n_tokens").cast("double").alias("total_tokens"),
        F.sum("w").alias("total_w"),
    )
    r = s.crossJoin(F.broadcast(t)).select(
        "source",
        "n_tokens",
        (F.col("w") / F.col("total_w")).alias("target_share"),
        (F.col("n_tokens") / F.col("total_tokens")).alias("token_share"),
        (
            (F.col("w") / F.col("total_w"))
            / (F.col("n_tokens") / F.col("total_tokens"))
        ).alias("raw_rate"),
    )
    m = r.agg(F.max("raw_rate").alias("max_rate"))
    rate = fround(F.col("raw_rate") / F.col("max_rate"), 4)
    return r.crossJoin(F.broadcast(m)).select(
        "source",
        "n_tokens",
        fround(F.col("token_share"), 4).alias("token_share"),
        fround(F.col("target_share"), 4).alias("target_share"),
        rate.alias("sample_rate"),
        F.floor(F.col("n_tokens") * rate).cast("long").alias("sampled_tokens"),
    )


# ---------------------------------------------------------------------------
# Curriculum quality buckets
# ---------------------------------------------------------------------------

_N_BUCKETS = 10


@register(
    "q_quality_buckets",
    oracle=rf"""
    WITH feat AS (
        SELECT doc_id, lang, n_chars,
               string_split_regex(trim(lower(text)), '{_WS}') AS _words
        FROM documents
    ),
    scored AS (
        SELECT lang, {fround_sql(_QUALITY_EXPR_DUCK)} AS q
        FROM (
            SELECT lang, n_chars, len(_words) AS n_words,
                   len(list_filter(_words,
                                   w -> w IN ('the', 'a', 'of', 'and', 'is')))
                       AS n_stop
            FROM feat
        )
        WHERE n_words > 0
    ),
    bucketed AS (
        SELECT lang, least(CAST(floor(q * {_N_BUCKETS}) AS BIGINT),
                           {_N_BUCKETS - 1}) AS bucket, q
        FROM scored
    )
    SELECT lang, bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           {fround_sql("min(q)")} AS min_score,
           {fround_sql("max(q)")} AS max_score,
           {fround_sql("avg(q)")} AS avg_score,
           {fround_sql("count(*) / sum(count(*)) OVER (PARTITION BY lang)")}
               AS lang_share
    FROM bucketed
    GROUP BY lang, bucket
    """,
)
def q_quality_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum bucketing: documents binned into 10 fixed-width quality
    bands per language, with per-band counts, score stats, and the band's
    share of its language — the table a data-mixing/curriculum schedule is
    written against.

    Fixed score thresholds are chosen over ntile() DELIBERATELY: a global
    (or per-lang — languages are low-cardinality) ntile is a single-
    partition sort, the classic scale killer this repo engineers away
    (SCALE.md "Analytics"), while threshold binning is a pure projection
    ahead of one partial-agg groupBy.  The only window runs over the
    ALREADY-AGGREGATED langs x 10 table — metadata scale, same bounded
    pattern as the as-of carry-in summary."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "_words", F.expr(_WORDS_SPARK)
    )
    q = fround(quality_score_col(), 4)
    scored = docs.filter(F.size("_words") > 0).select(
        "lang", q.alias("q")
    )
    bucket = F.least(
        F.floor(F.col("q") * _N_BUCKETS), F.lit(_N_BUCKETS - 1)
    ).cast("long")
    agg = scored.withColumn("bucket", bucket).groupBy("lang", "bucket").agg(
        F.count("*").cast("long").alias("n_docs"),
        fround(F.min("q"), 4).alias("min_score"),
        fround(F.max("q"), 4).alias("max_score"),
        fround(F.avg("q"), 4).alias("avg_score"),
    )
    per_lang = Window.partitionBy("lang")
    return agg.select(
        "lang",
        "bucket",
        "n_docs",
        "min_score",
        "max_score",
        "avg_score",
        fround(F.col("n_docs") / F.sum("n_docs").over(per_lang), 4).alias(
            "lang_share"
        ),
    )


@register(
    "q_length_histogram",
    oracle=rf"""
    WITH feat AS (
        SELECT doc_id,
               len(string_split_regex(trim(lower(text)), '{_WS}')) AS n_tokens
        FROM documents
        WHERE text IS NOT NULL
    ),
    b AS (
        SELECT n_tokens,
               CAST(floor(log2(n_tokens)) AS BIGINT) AS bucket
        FROM feat WHERE n_tokens > 0
    )
    SELECT bucket,
           CAST(power(2, bucket) AS BIGINT)       AS bucket_lo,
           CAST(power(2, bucket + 1) - 1 AS BIGINT) AS bucket_hi,
           CAST(count(*) AS BIGINT)               AS n_docs,
           CAST(sum(n_tokens) AS BIGINT)          AS total_tokens,
           {fround_sql("count(*) / (SELECT CAST(count(*) AS DOUBLE) FROM b)")}
               AS doc_share,
           {fround_sql("sum(n_tokens) / (SELECT CAST(sum(n_tokens) AS DOUBLE) FROM b)")}
               AS token_share
    FROM b
    GROUP BY bucket
    """,
)
def q_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log2-bucketed document-length histogram: the sequence-length
    distribution a packing/batching planner reads before choosing context
    length and pack targets (bucket k covers [2^k, 2^(k+1)) tokens), with
    each bucket's share of documents and of total tokens.

    Scale: one projection computes the token count, the bucket agg is a
    partial agg on a ~20-value key, and the grand totals come from a
    single-row aggregate BROADCAST back onto the bucket rows — no
    single-partition window ever sees the corpus."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    n_tokens = F.size(F.expr(_WORDS_SPARK)).cast("long")
    feat = docs.select(n_tokens.alias("n_tokens")).filter(F.col("n_tokens") > 0)
    b = feat.withColumn(
        "bucket", F.floor(F.log2("n_tokens")).cast("long")
    )
    agg = b.groupBy("bucket").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
    )
    totals = agg.agg(
        F.sum("n_docs").cast("double").alias("_all_docs"),
        F.sum("total_tokens").cast("double").alias("_all_tokens"),
    )
    return agg.crossJoin(F.broadcast(totals)).select(
        "bucket",
        F.pow(F.lit(2.0), F.col("bucket")).cast("long").alias("bucket_lo"),
        (F.pow(F.lit(2.0), F.col("bucket") + 1) - 1).cast("long").alias("bucket_hi"),
        "n_docs",
        "total_tokens",
        fround(F.col("n_docs") / F.col("_all_docs"), 4).alias("doc_share"),
        fround(F.col("total_tokens") / F.col("_all_tokens"), 4).alias("token_share"),
    )


@register(
    "q_profile_events",
    oracle=f"""
    WITH agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(count(*) - count(event_id) AS BIGINT) AS null_event_id,
               CAST(count(DISTINCT event_id) AS BIGINT) AS nd_event_id,
               {fround_sql("min(event_id)")} AS min_event_id,
               {fround_sql("max(event_id)")} AS max_event_id,
               CAST(count(*) - count(user_id) AS BIGINT) AS null_user_id,
               CAST(count(DISTINCT user_id) AS BIGINT) AS nd_user_id,
               {fround_sql("min(user_id)")} AS min_user_id,
               {fround_sql("max(user_id)")} AS max_user_id,
               CAST(count(*) - count(value) AS BIGINT) AS null_value,
               CAST(count(DISTINCT value) AS BIGINT) AS nd_value,
               {fround_sql("min(value)")} AS min_value,
               {fround_sql("max(value)")} AS max_value,
               CAST(count(*) - count(event_type) AS BIGINT) AS null_event_type,
               CAST(count(DISTINCT event_type) AS BIGINT) AS nd_event_type,
               min(event_type) AS smin_event_type,
               max(event_type) AS smax_event_type
        FROM events
    )
    SELECT 'event_id' AS column_name, n, null_event_id AS n_null,
           nd_event_id AS n_distinct, min_event_id AS min_num,
           max_event_id AS max_num, CAST(NULL AS VARCHAR) AS min_str,
           CAST(NULL AS VARCHAR) AS max_str
    FROM agg
    UNION ALL
    SELECT 'user_id', n, null_user_id, nd_user_id, min_user_id,
           max_user_id, NULL, NULL FROM agg
    UNION ALL
    SELECT 'value', n, null_value, nd_value, min_value, max_value,
           NULL, NULL FROM agg
    UNION ALL
    SELECT 'event_type', n, null_event_type, nd_event_type,
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           smin_event_type, smax_event_type FROM agg
    ORDER BY column_name
    """,
)
def q_profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass dataset profiler: per column, row count, null count,
    exact distinct count, and min/max (numeric columns in the numeric
    slots, string columns in the string slots) — the DESCRIBE/data-card
    table every ingestion pipeline emits before anything else runs.

    Scale: ALL sixteen statistics come from ONE aggregate over ONE scan —
    the multi-count-distinct compiles to a single Expand (4x row
    replication, partial-aggregated map-side), not four jobs; the wide
    1-row result is then unpivoted to the per-column layout with stack()
    (Spark's UNPIVOT generator), which is a projection of the single row
    — reshaping happens after aggregation, so it is free.  Profiling N
    columns at 100 TB costs exactly one scan regardless of N."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.agg(
        F.count("*").cast("long").alias("n"),
        (F.count("*") - F.count("event_id")).cast("long").alias("null_event_id"),
        F.count_distinct("event_id").cast("long").alias("nd_event_id"),
        fround(F.min("event_id"), 4).alias("min_event_id"),
        fround(F.max("event_id"), 4).alias("max_event_id"),
        (F.count("*") - F.count("user_id")).cast("long").alias("null_user_id"),
        F.count_distinct("user_id").cast("long").alias("nd_user_id"),
        fround(F.min("user_id"), 4).alias("min_user_id"),
        fround(F.max("user_id"), 4).alias("max_user_id"),
        (F.count("*") - F.count("value")).cast("long").alias("null_value"),
        F.count_distinct("value").cast("long").alias("nd_value"),
        fround(F.min("value"), 4).alias("min_value"),
        fround(F.max("value"), 4).alias("max_value"),
        (F.count("*") - F.count("event_type"))
        .cast("long")
        .alias("null_event_type"),
        F.count_distinct("event_type").cast("long").alias("nd_event_type"),
        F.min("event_type").alias("smin_event_type"),
        F.max("event_type").alias("smax_event_type"),
    )
    return agg.select(
        F.expr(
            """
            stack(4,
              'event_id',  null_event_id,  nd_event_id,
                  min_event_id, max_event_id,
                  CAST(NULL AS STRING), CAST(NULL AS STRING),
              'user_id',   null_user_id,   nd_user_id,
                  min_user_id, max_user_id,
                  CAST(NULL AS STRING), CAST(NULL AS STRING),
              'value',     null_value,     nd_value,
                  min_value, max_value,
                  CAST(NULL AS STRING), CAST(NULL AS STRING),
              'event_type', null_event_type, nd_event_type,
                  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
                  smin_event_type, smax_event_type
            ) AS (column_name, n_null, n_distinct,
                  min_num, max_num, min_str, max_str)
            """
        ),
        F.col("n"),
    ).select(
        "column_name", "n", "n_null", "n_distinct",
        "min_num", "max_num", "min_str", "max_str",
    ).orderBy("column_name")


BPE_K = 50


@register(
    "q_bpe_pairs",
    oracle=f"""
    WITH words AS (
        SELECT lower(unnest(string_split_regex(trim(text), '{_WS}'))) AS w
        FROM documents
    ),
    pairs AS (
        SELECT substr(w, i, 2) AS pair
        FROM (
            SELECT w, unnest(generate_series(1, length(w) - 1)) AS i
            FROM words WHERE length(w) >= 2
        )
    )
    SELECT pair, CAST(count(*) AS BIGINT) AS n
    FROM pairs
    GROUP BY pair
    ORDER BY n DESC, pair
    LIMIT {BPE_K}
    """,
)
def q_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-pair-encoding merge statistics: the frequency of every
    adjacent character pair WITHIN words, ranked — exactly the count
    table from which BPE tokenizer training (Sennrich et al. 2016)
    picks its next merge.  One iteration is the expensive, data-sized
    step of tokenizer training (later iterations run on the shrinking
    merged vocabulary), so this operator is the distributed kernel a
    tokenizer pipeline runs over a 100 TB corpus before the driver-side
    merge loop takes over on the aggregated counts.

    Scale: pair extraction is an in-codegen explode over character
    offsets (no UDF, no Python); the count partial-aggregates map-side
    to at most |alphabet|^2 distinct pairs — hundreds of rows per
    partition regardless of corpus size — and the global top-{BPE_K}
    compiles to TakeOrderedAndProject, never a full sort."""
    words = load_table(spark, sf_dir, "documents").select(
        F.explode(F.split(F.trim(F.lower("text")), _WS)).alias("w")
    )
    pairs = words.filter(F.length("w") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(w) - 1),"
                " i -> substring(w, i, 2))"
            )
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(BPE_K)
    )


N_HEAPS_DECILES = 10


@register(
    "q_heaps_law",
    oracle=f"""
    WITH bounds AS (
        SELECT min(doc_id) AS lo, max(doc_id) AS hi,
               CAST(count(*) AS BIGINT) AS n_docs
        FROM documents
    ),
    cuts AS (
        SELECT i AS decile,
               lo + CAST(floor((hi - lo + 1) * i / {N_HEAPS_DECILES}.0)
                         AS BIGINT) AS cutoff
        FROM bounds, unnest(generate_series(1, {N_HEAPS_DECILES})) t(i)
    ),
    toks AS (
        SELECT doc_id, lower(unnest(string_split_regex(trim(text), '{_WS}')))
                   AS token
        FROM documents
    ),
    firsts AS (
        SELECT token, min(doc_id) AS first_doc FROM toks GROUP BY token
    ),
    vocab AS (
        SELECT c.decile, CAST(count(*) AS BIGINT) AS vocab_size
        FROM cuts c JOIN firsts f ON f.first_doc < c.cutoff
        GROUP BY c.decile
    ),
    volume AS (
        SELECT c.decile, CAST(count(*) AS BIGINT) AS n_tokens
        FROM cuts c JOIN toks t ON t.doc_id < c.cutoff
        GROUP BY c.decile
    )
    SELECT v.decile, volume.n_tokens, v.vocab_size
    FROM vocab v JOIN volume USING (decile)
    ORDER BY v.decile
    """,
)
def q_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-growth curve (Heaps' law): distinct-token count and
    total token volume at ten corpus prefixes (by doc_id order) — the
    curve a corpus report plots to judge whether more data still brings
    new vocabulary or the source has saturated (its log-log slope is
    Heaps' beta).

    Scale: the expensive parts are both partial-aggregating — the
    per-token FIRST-occurrence min (tokens shuffle once as hashed keys)
    and the per-prefix counts, which join the tiny cutoff table (10
    rows, broadcast) with a range predicate so each token/first-doc row
    lands in the deciles it belongs to without any window or sort.
    This is the standard trick for cumulative-at-checkpoints statistics:
    N checkpoints as a broadcast range join, not a global running
    window over the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    bounds = docs.agg(
        F.min("doc_id").alias("lo"),
        F.max("doc_id").alias("hi"),
        F.count("*").cast("long").alias("n_docs"),
    )
    cuts = (
        bounds.select(
            F.explode(
                F.sequence(F.lit(1), F.lit(N_HEAPS_DECILES))
            ).alias("decile"),
            "lo",
            "hi",
        )
        .select(
            "decile",
            (
                F.col("lo")
                + F.floor(
                    (F.col("hi") - F.col("lo") + 1)
                    * F.col("decile")
                    / float(N_HEAPS_DECILES)
                )
            ).cast("long").alias("cutoff"),
        )
    )
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower("text")), _WS)).alias("token"),
    )
    firsts = toks.groupBy("token").agg(F.min("doc_id").alias("first_doc"))
    vocab = (
        firsts.join(
            F.broadcast(cuts), F.col("first_doc") < F.col("cutoff")
        )
        .groupBy("decile")
        .agg(F.count("*").cast("long").alias("vocab_size"))
    )
    volume = (
        toks.join(F.broadcast(cuts), F.col("doc_id") < F.col("cutoff"))
        .groupBy("decile")
        .agg(F.count("*").cast("long").alias("n_tokens"))
    )
    return (
        vocab.join(volume, "decile")
        .select("decile", "n_tokens", "vocab_size")
        .orderBy("decile")
    )


@register(
    "q_source_divergence",
    oracle=f"""
    WITH toks AS (
        SELECT source, lower(unnest(string_split_regex(trim(text), '{_WS}')))
                   AS token
        FROM documents
    ),
    st AS (
        SELECT source, token, CAST(count(*) AS DOUBLE) AS c
        FROM toks GROUP BY source, token
    ),
    stot AS (SELECT source, sum(c) AS n FROM st GROUP BY source),
    ct AS (SELECT token, CAST(sum(c) AS DOUBLE) AS cc FROM st GROUP BY token),
    tot AS (SELECT CAST(sum(cc) AS DOUBLE) AS t FROM ct),
    terms AS (
        SELECT st.source,
               st.c / stot.n AS p,
               ct.cc / tot.t AS q
        FROM st
        JOIN stot USING (source)
        JOIN ct USING (token), tot
    ),
    agg AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS vocab_size,
               sum(0.5 * (p * ln(p / ((p + q) / 2))
                          + q * ln(q / ((p + q) / 2)))) AS js_core,
               sum(q) AS q_covered
        FROM terms GROUP BY source
    )
    SELECT a.source,
           CAST(stot.n AS BIGINT) AS n_tokens,
           a.vocab_size,
           {fround_sql("a.js_core + 0.5 * ln(2) * (1.0 - a.q_covered)", 6)}
               AS js_divergence
    FROM agg a JOIN stot ON stot.source = a.source
    ORDER BY a.source
    """,
)
def q_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source distinctiveness: the Jensen-Shannon divergence between each
    source's token distribution and the whole corpus's — the
    dataset-card number that says which sources are interchangeable
    (JS ~ 0) and which contribute genuinely different text (JS -> ln 2),
    feeding the mixture-reweighting decisions beside q_mixture_weights.

    Scale: sums run ONLY over (source, token) pairs that occur — the
    vocabulary a source does NOT cover is folded in closed form as
    0.5*ln(2)*(1 - covered corpus mass), so there is no source x vocab
    cross join anywhere.  Counts partial-aggregate; the corpus
    distribution is vocabulary-sized and AQE broadcasts it into the
    per-source join.  All probability terms divide identical doubles in
    identical order on both engines; fround guards the final sum."""
    toks = load_table(spark, sf_dir, "documents").select(
        "source",
        F.explode(F.split(F.trim(F.lower("text")), _WS)).alias("token"),
    )
    st = toks.groupBy("source", "token").agg(
        F.count("*").cast("double").alias("c")
    )
    stot = st.groupBy("source").agg(F.sum("c").alias("n"))
    ct = st.groupBy("token").agg(F.sum("c").alias("cc"))
    tot = ct.agg(F.sum("cc").alias("t"))
    terms = (
        st.join(stot, "source")
        .join(ct, "token")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            (F.col("c") / F.col("n")).alias("p"),
            (F.col("cc") / F.col("t")).alias("q"),
        )
    )
    m = (F.col("p") + F.col("q")) / 2
    agg = terms.groupBy("source").agg(
        F.count("*").cast("long").alias("vocab_size"),
        F.sum(
            0.5
            * (
                F.col("p") * F.log(F.col("p") / m)
                + F.col("q") * F.log(F.col("q") / m)
            )
        ).alias("js_core"),
        F.sum("q").alias("q_covered"),
    )
    import math

    return (
        agg.join(stot, "source")
        .select(
            "source",
            F.col("n").cast("long").alias("n_tokens"),
            "vocab_size",
            fround(
                F.col("js_core")
                + 0.5 * math.log(2.0) * (1.0 - F.col("q_covered")),
                6,
            ).alias("js_divergence"),
        )
        .orderBy("source")
    )


@register(
    "q_source_overlap",
    oracle=f"""
    WITH vocab AS (
        SELECT DISTINCT source,
               lower(unnest(string_split_regex(trim(text), '{_WS}'))) AS token
        FROM documents
    ),
    sizes AS (
        SELECT source, CAST(count(*) AS BIGINT) AS sz
        FROM vocab GROUP BY source
    ),
    inter AS (
        SELECT a.source AS source_a, b.source AS source_b,
               CAST(count(*) AS BIGINT) AS n_common
        FROM vocab a JOIN vocab b
          ON a.token = b.token AND a.source < b.source
        GROUP BY source_a, source_b
    )
    SELECT i.source_a, i.source_b, sa.sz AS vocab_a, sb.sz AS vocab_b,
           i.n_common,
           {fround_sql(
               "i.n_common / CAST(sa.sz + sb.sz - i.n_common AS DOUBLE)", 6
           )} AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.source = i.source_a
    JOIN sizes sb ON sb.source = i.source_b
    ORDER BY i.source_a, i.source_b
    """,
)
def q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary overlap between sources (Jaccard over distinct
    token sets) — the redundancy matrix beside q_source_divergence's
    per-source distinctiveness: two sources with near-identical
    vocabularies are candidates for dropping one, and the matrix says
    WHICH pair, not just that someone is generic.

    Scale: the pair counts come from a token-keyed equi-self-join of the
    (source, token) DISTINCT table — vocabulary-sized, NOT corpus-sized,
    so the join input is |sources| x |vocab| at worst and the per-token
    expansion is (sources containing the token choose 2), bounded by the
    source count squared per token.  Never a cartesian of sources; set
    sizes attach by broadcast.  This is the same inverted-index pairing
    idiom as the sparse-cosine and MinHash-band joins."""
    vocab = (
        load_table(spark, sf_dir, "documents")
        .select(
            "source",
            F.explode(
                F.split(F.trim(F.lower("text")), _WS)
            ).alias("token"),
        )
        .distinct()
    )
    sizes = vocab.groupBy("source").agg(
        F.count("*").cast("long").alias("sz")
    )
    a = vocab.select(F.col("source").alias("source_a"), "token")
    b = vocab.select(F.col("source").alias("source_b"), "token")
    inter = (
        a.join(b, "token")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").cast("long").alias("n_common"))
    )
    sa = sizes.select(
        F.col("source").alias("source_a"), F.col("sz").alias("vocab_a")
    )
    sb = sizes.select(
        F.col("source").alias("source_b"), F.col("sz").alias("vocab_b")
    )
    return (
        inter.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            "vocab_a",
            "vocab_b",
            "n_common",
            fround(
                F.col("n_common")
                / (
                    F.col("vocab_a") + F.col("vocab_b") - F.col("n_common")
                ).cast("double"),
                6,
            ).alias("jaccard"),
        )
        .orderBy("source_a", "source_b")
    )


# ---------------------------------------------------------------------------
# Partition-skew diagnostic: the report run before picking a salting plan
# ---------------------------------------------------------------------------

SKEW_TOP_K = 10


@register(
    "q_skew_report",
    oracle=f"""
    WITH per_key AS (
        SELECT user_id AS key, CAST(count(*) AS BIGINT) AS cnt
        FROM events WHERE user_id IS NOT NULL GROUP BY user_id
    ),
    tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n_keys,
               CAST(sum(cnt) AS BIGINT) AS total_rows,
               CAST(max(cnt) AS BIGINT) AS max_cnt
        FROM per_key
    )
    SELECT key, cnt, n_keys, total_rows,
           {fround_sql("cnt / CAST(total_rows AS DOUBLE)", 6)} AS share,
           {fround_sql("cnt * n_keys / CAST(total_rows AS DOUBLE)", 6)}
               AS skew_x,
           {fround_sql("max_cnt * n_keys / CAST(total_rows AS DOUBLE)", 6)}
               AS worst_skew_x
    FROM per_key, tot
    ORDER BY cnt DESC, key
    LIMIT {SKEW_TOP_K}
    """,
)
def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew diagnostic over the stream's grouping key: the
    {SKEW_TOP_K} heaviest user_id keys with their row share and skew factor
    (cnt / mean-per-key), plus the corpus-wide worst skew — the report an
    operator reads before deciding whether a groupBy/join on this key needs
    salting (q_salted_agg) or AQE skew splitting (tests/test_aqe.py).

    Scale: per-key counts are one map-side-combined shuffle on the key
    itself; the summary aggregate is a single broadcast row; the top-{SKEW_TOP_K}
    is TakeOrderedAndProject (no global sort).  The output is O(k), never
    O(keys)."""
    per_key = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .groupBy(F.col("user_id").alias("key"))
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    tot = per_key.agg(
        F.count("*").cast("long").alias("n_keys"),
        F.sum("cnt").cast("long").alias("total_rows"),
        F.max("cnt").cast("long").alias("max_cnt"),
    )
    return (
        per_key.crossJoin(F.broadcast(tot))
        .select(
            "key",
            "cnt",
            "n_keys",
            "total_rows",
            fround(F.col("cnt") / F.col("total_rows").cast("double"), 6).alias(
                "share"
            ),
            fround(
                F.col("cnt") * F.col("n_keys") / F.col("total_rows").cast("double"),
                6,
            ).alias("skew_x"),
            fround(
                F.col("max_cnt")
                * F.col("n_keys")
                / F.col("total_rows").cast("double"),
                6,
            ).alias("worst_skew_x"),
        )
        .orderBy(F.desc("cnt"), "key")
        .limit(SKEW_TOP_K)
    )


# ---------------------------------------------------------------------------
# Join-cardinality report: output sizes from key histograms, no join executed
# ---------------------------------------------------------------------------

_JOINS = (
    ("orders_lineitem", "orders", "o_orderkey", "lineitem", "l_orderkey"),
    ("part_lineitem", "part", "p_partkey", "lineitem", "l_partkey"),
    ("customer_orders", "customer", "c_custkey", "orders", "o_custkey"),
)


def _join_card_duck(name, lt, lk, rt, rk) -> str:
    return f"""
    SELECT '{name}' AS join_name,
           (SELECT CAST(count(*) AS BIGINT) FROM {lt}) AS left_rows,
           (SELECT CAST(count(*) AS BIGINT) FROM {rt}) AS right_rows,
           CAST(coalesce(sum(ca * cb), 0) AS BIGINT) AS est_rows,
           CAST(coalesce(max(ca * cb), 0) AS BIGINT) AS hot_key_rows
    FROM (SELECT {lk} AS k, count(*) AS ca FROM {lt} GROUP BY {lk}) a
    JOIN (SELECT {rk} AS k, count(*) AS cb FROM {rt} GROUP BY {rk}) b
      ON a.k = b.k
    """


@register(
    "q_join_cardinality",
    oracle="\nUNION ALL\n".join(_join_card_duck(*j) for j in _JOINS)
    + "\nORDER BY join_name",
)
def q_join_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Planner-style join-cardinality report: for each named equi-join,
    the EXACT output size computed from the two sides' key histograms
    (sum over keys of cntA x cntB) without materializing the join, plus
    the hottest key's contribution — the number AQE's skew-join logic
    keys off.  Histograms, not sampled estimates, so the report doubles
    as the ground truth an estimator would be validated against.

    Scale: each side reduces to (key, count) via map-side partial agg —
    the only shuffle is of count rows, never fact rows; the histogram
    equi-join co-partitions on the key and collapses to one summary row
    per join.  Reading 3 joins = 6 aggregate scans, all column-pruned to
    the key alone."""
    out = []
    for name, lt, lk, rt, rk in _JOINS:
        left = load_table(spark, sf_dir, lt)
        right = load_table(spark, sf_dir, rt)
        ha = left.groupBy(F.col(lk).alias("k")).agg(F.count("*").alias("ca"))
        hb = right.groupBy(F.col(rk).alias("k")).agg(F.count("*").alias("cb"))
        joined = ha.join(hb, "k").select(
            (F.col("ca") * F.col("cb")).alias("prod")
        )
        # side totals come from the same histograms (sum of counts), so the
        # whole report stays one lazy plan — no driver-side count() actions
        la = ha.agg(F.sum("ca").cast("long").alias("left_rows"))
        lb = hb.agg(F.sum("cb").cast("long").alias("right_rows"))
        out.append(
            joined.agg(
                F.coalesce(F.sum("prod"), F.lit(0)).cast("long").alias("est_rows"),
                F.coalesce(F.max("prod"), F.lit(0))
                .cast("long")
                .alias("hot_key_rows"),
            )
            .crossJoin(F.broadcast(la))
            .crossJoin(F.broadcast(lb))
            .select(
                F.lit(name).alias("join_name"),
                "left_rows",
                "right_rows",
                "est_rows",
                "hot_key_rows",
            )
        )
    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    return res.orderBy("join_name")


# ---------------------------------------------------------------------------
# Mixture sampling: materialize the reweighted training mix
# ---------------------------------------------------------------------------

_MIX_ORACLE = ORACLES["q_mixture_weights"]
# md5-derived per-doc draw in [0, 10000) — the train/test-split idiom, so
# the draw is engine-portable and independent of the source column
_DRAW_DUCK = (
    "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10000"
)
_DRAW_SPARK = (
    "cast(conv(substr(md5(cast(doc_id AS string)), 1, 15), 16, 10) AS bigint)"
    " % 10000"
)


@register(
    "q_mixture_sample",
    oracle=f"""
    WITH mix AS ({_MIX_ORACLE}),
    drawn AS (
        SELECT d.source,
               len(string_split_regex(trim(d.text), '{_WS}')) AS n_tokens,
               CASE WHEN {_DRAW_DUCK}
                     < CAST(floor(mix.sample_rate * 10000 + 0.5) AS BIGINT)
                    THEN 1 ELSE 0 END AS kept
        FROM documents d JOIN mix ON d.source = mix.source
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(kept) AS BIGINT) AS n_kept,
           CAST(sum(kept * n_tokens) AS BIGINT) AS kept_tokens,
           {fround_sql("sum(kept) / CAST(count(*) AS DOUBLE)")}
               AS realized_rate
    FROM drawn
    GROUP BY source
    ORDER BY source
    """,
)
def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize the training mixture the reweighting step prescribed:
    each document draws a deterministic md5 value in [0, 10000) and
    survives iff it falls under its source's q_mixture_weights
    sample_rate — the actual downsampling pass that turns mixture math
    into a training corpus, reported per source (docs kept, token mass
    kept, realized rate vs target).  Composed on the registered weights
    so the sample can never drift from the prescription; the threshold
    comparison is integer-exact on the 4dp rate, so keep/drop membership
    is engine-stable.

    Scale: the weights table is #sources rows and broadcasts onto the
    corpus scan; the draw is one md5 per doc computed in codegen; the
    summary is a source-keyed partial agg.  The corpus is read once and
    never shuffles (per-doc keep flags would stream straight to the
    training sink)."""
    mix = q_mixture_weights(spark, sf_dir).select("source", "sample_rate")
    docs = load_table(spark, sf_dir, "documents").select(
        "source",
        F.size(F.split(F.trim("text"), _WS)).alias("n_tokens"),
        F.expr(_DRAW_SPARK).alias("draw"),
    )
    drawn = docs.join(F.broadcast(mix), "source").withColumn(
        "kept",
        (
            F.col("draw")
            < F.floor(F.col("sample_rate") * 10000 + 0.5).cast("long")
        ).cast("int"),
    )
    return (
        drawn.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("kept").cast("long").alias("n_kept"),
            F.sum(F.col("kept") * F.col("n_tokens"))
            .cast("long")
            .alias("kept_tokens"),
            fround(
                F.sum("kept") / F.count("*").cast("double"), 4
            ).alias("realized_rate"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Tokenizer vocabulary coverage curve
# ---------------------------------------------------------------------------

COVERAGE_KS = (100, 500, 2000)


@register(
    "q_vocab_coverage",
    oracle=f"""
    WITH tok AS (
        SELECT lower(unnest(string_split_regex(trim(text), '{_WS}'))) AS token
        FROM documents
    ),
    freq AS (
        SELECT token, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY token
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS total_tokens,
                   CAST(count(*) AS BIGINT) AS vocab_size FROM freq),
    ranked AS (
        SELECT n, row_number() OVER (ORDER BY n DESC, token) AS rnk
        FROM freq
    )
    SELECT k, total_tokens, vocab_size,
           CAST(covered AS BIGINT) AS covered_tokens,
           {fround_sql("covered / CAST(total_tokens AS DOUBLE)", 6)}
               AS coverage
    FROM (
        SELECT k.k, sum(CASE WHEN rnk <= k.k THEN n ELSE 0 END) AS covered
        FROM ranked, (VALUES {", ".join(f"({k})" for k in COVERAGE_KS)}) k(k)
        GROUP BY k.k
    ), tot
    ORDER BY k
    """,
)
def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: for candidate vocab sizes K, the share
    of corpus token mass the top-K most-frequent lowercased tokens cover
    — the curve a tokenizer-vocab-size decision reads (diminishing
    returns past the Zipf head), beside q_vocab_topk (the head itself)
    and q_heaps_law (vocab growth).

    Scale: token counting is the same map-side-combined partial agg as
    q_vocab_topk; the top-max(K) cut is TakeOrderedAndProject (only
    max(K) rows ever hold a rank), each K sums over that constant-size
    set, and the grand totals broadcast.  No window ever touches the
    full vocabulary."""
    docs = load_table(spark, sf_dir, "documents")
    freq = (
        docs.select(F.explode(F.split(F.trim("text"), _WS)).alias("raw"))
        .select(F.lower("raw").alias("token"))
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("n"))
    )
    tot = freq.agg(
        F.sum("n").cast("long").alias("total_tokens"),
        F.count("*").cast("long").alias("vocab_size"),
    )
    kmax = max(COVERAGE_KS)
    head = freq.orderBy(F.desc("n"), "token").limit(kmax)
    w = Window.orderBy(F.desc("n"), "token")
    ranked = head.withColumn("rnk", F.row_number().over(w))
    ks = spark.createDataFrame([(k,) for k in COVERAGE_KS], "k int")
    covered = (
        ranked.crossJoin(F.broadcast(ks))
        .groupBy("k")
        .agg(
            F.sum(F.when(F.col("rnk") <= F.col("k"), F.col("n")).otherwise(0))
            .alias("covered")
        )
    )
    return (
        covered.crossJoin(F.broadcast(tot))
        .select(
            "k",
            "total_tokens",
            "vocab_size",
            F.col("covered").cast("long").alias("covered_tokens"),
            fround(
                F.col("covered") / F.col("total_tokens").cast("double"), 6
            ).alias("coverage"),
        )
        .orderBy("k")
    )


# ---------------------------------------------------------------------------
# Dataset manifest: order-insensitive content hash per source
# ---------------------------------------------------------------------------


@register(
    "q_dataset_manifest",
    oracle=f"""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS n_chars,
           bit_xor(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || text),
                    1, 15))::BIGINT) AS content_sig,
           CAST(sum(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || text),
                    1, 8))::BIGINT) AS BIGINT) AS content_sum
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def q_dataset_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducibility manifest: per source, an ORDER-INSENSITIVE content
    signature (xor and sum of per-doc md5(doc_id:text) prefixes) plus doc
    and char counts — the fingerprint a pipeline records before training
    so "did the input change since the last run?" is one row compare, not
    a re-scan diff.  xor catches any single-doc change; the additive sum
    catches xor-cancelling pair swaps; binding doc_id into the hash
    catches content moving between ids.

    Scale: one md5 per doc computed in codegen, folded by xor/sum partial
    aggregates keyed by source — commutative, so partition order and
    parallelism can never change the signature; the manifest is #sources
    rows regardless of corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    _h = "md5(concat(cast(doc_id AS string), ':', text))"
    h15_sql = f"cast(conv(substr({_h}, 1, 15), 16, 10) AS bigint)"
    h8_sql = f"cast(conv(substr({_h}, 1, 8), 16, 10) AS bigint)"
    return (
        docs.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("n_chars"),
            F.expr(f"bit_xor({h15_sql})").alias("content_sig"),
            F.sum(F.expr(h8_sql)).cast("long").alias("content_sum"),
        )
        .orderBy("source")
    )
