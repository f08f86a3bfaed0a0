"""Corpus-composition and curation-planning operators over `documents` —
the reports a 100 TB training-data pipeline publishes before anyone trains
on the data: within-doc repetition profiles, token-budget allocation across
sources, stylistic source fingerprints, dedup threshold cost curves,
length-band composition, stopword/punctuation profiles, and LSH band
tuning against planted ground truth.

Tokenization follows the repo-wide WS_CLASS contract (ranking.py:54): the
whitespace class is spelled out so Spark, DuckDB, and Python goldens split
identically by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.rounding import fround, fround_sql
from ..registry import ORACLES, register
from ..sources import load_table
from .ranking import WS_CLASS
from .text import (
    _NEAR_CORPUS_SQL,
    _SHINGLES_DUCK,
    _WORDS_DUCK,
    _near_corpus,
    _shingle_rows,
)

_TOKS_DUCK = f"string_split_regex(trim(lower(text)), '{WS_CLASS}')"


# ---------------------------------------------------------------------------
# Within-doc repetition: word-3-gram profile
# ---------------------------------------------------------------------------


@register(
    "q_shingle_profile",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {_TOKS_DUCK} AS _words FROM documents
    ),
    grams AS (
        SELECT doc_id, unnest({_SHINGLES_DUCK}) AS g
        FROM toks WHERE len(_words) >= 3
    ),
    per_gram AS (
        SELECT doc_id, g, count(*) AS f FROM grams GROUP BY doc_id, g
    )
    SELECT doc_id,
           CAST(sum(f) AS BIGINT) AS n_grams,
           CAST(count(*) AS BIGINT) AS n_distinct_grams,
           CAST(max(f) AS BIGINT) AS max_gram_freq,
           {fround_sql("1.0 - count(*) / CAST(sum(f) AS DOUBLE)", 6)}
               AS rep_ratio
    FROM per_gram
    GROUP BY doc_id
    """,
)
def q_shingle_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition profile on word 3-grams: total grams,
    distinct grams, the hottest gram's frequency, and the repetition ratio
    (1 - distinct/total) — the boilerplate/spam signal a curation pipeline
    thresholds on before anything cross-document runs (a doc that repeats
    its own shingles also floods MinHash bands).

    Scale: shingles are codegen rows (posexplode + lead, text.py:154), the
    per-(doc, gram) count and the per-doc rollup are two partial
    aggregations on the same doc_id key — one shuffle, no joins, state is
    O(distinct grams), i.e. corpus-token bounded."""
    grams = _shingle_rows(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    per_gram = grams.groupBy("doc_id", "s").agg(F.count("*").alias("f"))
    return per_gram.groupBy("doc_id").agg(
        F.sum("f").cast("long").alias("n_grams"),
        F.count("*").cast("long").alias("n_distinct_grams"),
        F.max("f").cast("long").alias("max_gram_freq"),
        fround(
            F.lit(1.0) - F.count("*") / F.sum("f").cast("double"), 6
        ).alias("rep_ratio"),
    )


# ---------------------------------------------------------------------------
# Token-budget allocation across sources (one water-filling round)
# ---------------------------------------------------------------------------

BUDGET_FRAC = "0.5"
# Upsampled "high-quality" sources — the mixture designer's thumb on the
# scale that forces the cap/redistribute path to actually execute.
_PREMIUM = ("src0", "src1", "src2")
_PREMIUM_W = "5.0"
_PREMIUM_SQL = ", ".join(f"'{s}'" for s in _PREMIUM)


@register(
    "q_token_budget_plan",
    oracle=f"""
    WITH per_source AS (
        SELECT source,
               CAST(sum(len({_TOKS_DUCK})) AS BIGINT) AS avail
        FROM documents GROUP BY source
    ),
    weighted AS (
        SELECT source, avail,
               (CASE WHEN source IN ({_PREMIUM_SQL})
                     THEN {_PREMIUM_W} ELSE 1.0 END)
               / (SELECT sum(CASE WHEN source IN ({_PREMIUM_SQL})
                                  THEN {_PREMIUM_W} ELSE 1.0 END)
                  FROM per_source) AS w
        FROM per_source
    ),
    sized AS (
        SELECT *,
               (SELECT sum(avail) FROM per_source)
                   * CAST({BUDGET_FRAC} AS DOUBLE) AS budget
        FROM weighted
    ),
    first_pass AS (
        SELECT *, least(CAST(avail AS DOUBLE), w * budget) AS alloc0,
               w * budget < CAST(avail AS DOUBLE) AS uncapped
        FROM sized
    ),
    remainder AS (
        SELECT any_value(budget) - sum(alloc0) AS r,
               sum(CASE WHEN uncapped THEN w ELSE 0 END) AS w_u
        FROM first_pass
    )
    SELECT f.source, f.avail AS avail_tokens,
           {fround_sql("f.w", 6)} AS weight,
           {fround_sql(
               "least(CAST(f.avail AS DOUBLE), f.alloc0 + CASE WHEN f.uncapped AND m.w_u > 0 THEN f.w / m.w_u * m.r ELSE 0 END)",
               2,
           )} AS alloc_tokens,
           NOT f.uncapped AS capped,
           {fround_sql(
               "least(CAST(f.avail AS DOUBLE), f.alloc0 + CASE WHEN f.uncapped AND m.w_u > 0 THEN f.w / m.w_u * m.r ELSE 0 END) / CAST(f.avail AS DOUBLE)",
               6,
           )} AS fill_frac
    FROM first_pass f, remainder m
    """,
)
def q_token_budget_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget allocation across sources: given a target budget
    ({BUDGET_FRAC} of the corpus) and mixture weights (premium sources
    {_PREMIUM} upweighted {_PREMIUM_W}x), allocate w*B tokens per source
    capped at availability, then redistribute the capped surplus to the
    uncapped sources proportionally — one deterministic water-filling
    round, the calculation every mixture-sampling job runs before writing
    a training shard list.

    Scale: one token-count aggregation per source (partial agg over the
    corpus), then pure scalar math over the |sources|-row table with two
    broadcast scalar join-backs.  The corpus is scanned once."""
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    # Python-API split: an F.expr SQL literal would escape-process the
    # backslash classes in WS_CLASS and corrupt the pattern
    per_source = docs.groupBy("source").agg(
        F.sum(F.size(F.split(F.trim(F.lower("text")), WS_CLASS)))
        .cast("long")
        .alias("avail")
    )
    raw_w = F.when(F.col("source").isin(*_PREMIUM), F.expr(_PREMIUM_W)).otherwise(
        F.lit(1.0)
    )
    weighted = per_source.withColumn("rw", raw_w)
    scal = weighted.agg(
        F.sum("rw").alias("w_tot"),
        (F.sum("avail") * F.expr(f"CAST({BUDGET_FRAC} AS DOUBLE)")).alias(
            "budget"
        ),
    )
    first = (
        weighted.crossJoin(F.broadcast(scal))
        .withColumn("w", F.col("rw") / F.col("w_tot"))
        .withColumn(
            "alloc0",
            F.least(F.col("avail").cast("double"), F.col("w") * F.col("budget")),
        )
        .withColumn(
            "uncapped",
            F.col("w") * F.col("budget") < F.col("avail").cast("double"),
        )
    )
    rem = first.agg(
        (F.any_value("budget") - F.sum("alloc0")).alias("r"),
        F.sum(F.when(F.col("uncapped"), F.col("w")).otherwise(0.0)).alias("w_u"),
    )
    alloc = F.least(
        F.col("avail").cast("double"),
        F.col("alloc0")
        + F.when(
            F.col("uncapped") & (F.col("w_u") > 0),
            F.col("w") / F.col("w_u") * F.col("r"),
        ).otherwise(0.0),
    )
    return (
        first.crossJoin(F.broadcast(rem))
        .select(
            "source",
            F.col("avail").alias("avail_tokens"),
            fround(F.col("w"), 6).alias("weight"),
            fround(alloc, 2).alias("alloc_tokens"),
            (~F.col("uncapped")).alias("capped"),
            fround(alloc / F.col("avail").cast("double"), 6).alias("fill_frac"),
        )
    )


# ---------------------------------------------------------------------------
# Stylistic source fingerprints: char-class vectors + pairwise cosine
# ---------------------------------------------------------------------------

_CLASSES = (
    ("letters", "[^a-zA-Z]"),
    ("digits", "[^0-9]"),
    ("punct", "[^.,;:!?]"),
    ("spaces", "[^ ]"),
)


@register(
    "q_source_fingerprint",
    oracle=f"""
    WITH per_source AS (
        SELECT source,
               {", ".join(
                   f"CAST(sum(length(regexp_replace(text, '{pat}', '', 'g'))) AS DOUBLE) AS {name}"
                   for name, pat in _CLASSES
               )}
        FROM documents GROUP BY source
    )
    SELECT a.source AS source_a, b.source AS source_b,
           {fround_sql(
               "(a.letters*b.letters + a.digits*b.digits + a.punct*b.punct + a.spaces*b.spaces)"
               " / sqrt((a.letters*a.letters + a.digits*a.digits + a.punct*a.punct + a.spaces*a.spaces)"
               " * (b.letters*b.letters + b.digits*b.digits + b.punct*b.punct + b.spaces*b.spaces))",
               6,
           )} AS cos_sim
    FROM per_source a JOIN per_source b ON a.source < b.source
    """,
)
def q_source_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stylistic fingerprint per source — a 4-dim char-class count vector
    (letters / digits / punctuation / spaces) — and the pairwise cosine
    between every two sources.  Near-1.0 pairs are candidate mirror/scrape
    duplicates at the SOURCE level, worth checking before any per-document
    dedup spends compute on them.

    Scale: the corpus collapses to |sources| rows in one partial-agg pass
    (regexp counting is per-row, codegen); the pairwise stage is a
    broadcast self-join of that tiny table — |sources|^2 work on rows that
    fit in a closure."""
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    aggs = [
        F.sum(F.length(F.regexp_replace("text", pat, "")))
        .cast("double")
        .alias(name)
        for name, pat in _CLASSES
    ]
    per_source = docs.groupBy("source").agg(*aggs)
    a = per_source.select(
        F.col("source").alias("source_a"),
        *[F.col(n).alias(f"a_{n}") for n, _ in _CLASSES],
    )
    b = per_source.select(
        F.col("source").alias("source_b"),
        *[F.col(n).alias(f"b_{n}") for n, _ in _CLASSES],
    )
    dot = sum(F.col(f"a_{n}") * F.col(f"b_{n}") for n, _ in _CLASSES)
    na = sum(F.col(f"a_{n}") * F.col(f"a_{n}") for n, _ in _CLASSES)
    nb = sum(F.col(f"b_{n}") * F.col(f"b_{n}") for n, _ in _CLASSES)
    return (
        a.join(F.broadcast(b), F.col("source_a") < F.col("source_b"))
        .select(
            "source_a",
            "source_b",
            fround(dot / F.sqrt(na * nb), 6).alias("cos_sim"),
        )
    )


# ---------------------------------------------------------------------------
# Dedup threshold cost curve
# ---------------------------------------------------------------------------

_CURVE_THRESHOLDS = ("0.3", "0.5", "0.7", "0.8", "0.9")


@register(
    "q_dedup_cost_curve",
    # Builds directly on q_doc_ngram_jaccard's oracle (registered earlier in
    # queries.text), so the pair set is identical BY CONSTRUCTION.
    oracle=None,  # assigned below once text's oracle is importable
)
def q_dedup_cost_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dedup cost curve: for each candidate Jaccard threshold, how many
    pairs qualify and how many documents the keep-min-doc_id policy would
    remove — the sweep a curation owner reads before choosing the
    production threshold (removal rate vs aggressiveness), priced once from
    ONE pair table rather than re-running dedup per candidate.

    Scale: reuses q_doc_ngram_jaccard's anchor-bucketed exact pair table
    (never all-pairs); the sweep explodes each pair into the thresholds it
    clears (<= |thresholds| rows per pair) and the removed-doc count is a
    distinct-aggregate per threshold over that small table."""
    from .text import q_doc_ngram_jaccard

    pairs = q_doc_ngram_jaccard(spark, sf_dir)
    thresholds = F.array(
        *[F.expr(f"CAST({t} AS DOUBLE)") for t in _CURVE_THRESHOLDS]
    )
    swept = pairs.select(
        "doc_a",
        "doc_b",
        "jaccard",
        F.explode(thresholds).alias("threshold"),
    ).filter(F.col("jaccard") >= F.col("threshold"))
    corpus_n = _near_corpus(spark, sf_dir).agg(
        F.count("*").cast("double").alias("corpus_n")
    )
    return (
        swept.groupBy("threshold")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.countDistinct("doc_b").cast("long").alias("n_docs_removed"),
        )
        .crossJoin(F.broadcast(corpus_n))
        .select(
            "threshold",
            "n_pairs",
            "n_docs_removed",
            fround(F.col("n_docs_removed") / F.col("corpus_n"), 6).alias(
                "removal_rate"
            ),
        )
    )


def _install_cost_curve_oracle() -> None:
    pair_sql = ORACLES["q_doc_ngram_jaccard"]
    ts = ", ".join(f"({t})" for t in _CURVE_THRESHOLDS)
    ORACLES["q_dedup_cost_curve"] = f"""
    WITH pairs AS ({pair_sql}),
    corpus AS ({_NEAR_CORPUS_SQL}),
    swept AS (
        SELECT p.doc_b, CAST(t.t AS DOUBLE) AS threshold
        FROM pairs p JOIN (VALUES {ts}) t(t)
          ON p.jaccard >= CAST(t.t AS DOUBLE)
    )
    SELECT threshold,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(count(DISTINCT doc_b) AS BIGINT) AS n_docs_removed,
           {fround_sql(
               "count(DISTINCT doc_b) / (SELECT CAST(count(*) AS DOUBLE) FROM corpus)",
               6,
           )} AS removal_rate
    FROM swept
    GROUP BY threshold
    """


_install_cost_curve_oracle()


# ---------------------------------------------------------------------------
# Corpus composition by token-length band
# ---------------------------------------------------------------------------


@register(
    "q_doc_length_bands",
    oracle=f"""
    WITH sized AS (
        SELECT doc_id, len({_TOKS_DUCK}) AS n_toks FROM documents
    ),
    banded AS (
        -- floor(log2(n)) via binary-string length: integer-exact, immune
        -- to log() ULP differences at exact powers of two
        SELECT doc_id, n_toks,
               CAST(length(bin(n_toks)) - 1 AS BIGINT) AS band
        FROM sized WHERE n_toks >= 1
    ),
    tot AS (SELECT CAST(sum(n_toks) AS DOUBLE) AS all_toks,
                   CAST(count(*) AS DOUBLE) AS all_docs FROM banded)
    SELECT band,
           CAST(pow(2, band) AS BIGINT) AS band_min_tokens,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_toks) AS BIGINT) AS n_tokens,
           {fround_sql("count(*) / any_value(t.all_docs)", 6)} AS doc_share,
           {fround_sql("sum(n_toks) / any_value(t.all_toks)", 6)} AS token_share,
           {fround_sql(
               "sum(sum(n_toks)) OVER (ORDER BY band ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / any_value(t.all_toks)",
               6,
           )} AS cum_token_share
    FROM banded, tot t
    GROUP BY band
    """,
)
def q_doc_length_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition by power-of-two token-length band: docs, tokens,
    shares, and the cumulative token share walking up the bands — the
    first table in any dataset manifest (how much of the token budget
    lives in short docs that sequence packing must fuse vs long docs that
    need chunking).

    Band = floor(log2(n_tokens)) computed via binary-representation length,
    which is integer-exact in both engines (log2() can sit a ULP under an
    integer at exact powers of two and flip the floor).

    Scale: one pass to size docs, partial agg to ~60 band rows, window over
    those rows only."""
    sized = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split(F.trim(F.lower("text")), WS_CLASS)).alias("n_toks"),
    )
    banded = sized.filter(F.col("n_toks") >= 1).withColumn(
        "band", (F.length(F.bin("n_toks")) - 1).cast("long")
    )
    tot = banded.agg(
        F.sum("n_toks").cast("double").alias("all_toks"),
        F.count("*").cast("double").alias("all_docs"),
    )
    per_band = banded.groupBy("band").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_toks").cast("long").alias("n_tokens"),
    )
    wb = Window.orderBy("band").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per_band.crossJoin(F.broadcast(tot))
        .select(
            "band",
            F.pow(F.lit(2.0), F.col("band")).cast("long").alias(
                "band_min_tokens"
            ),
            "n_docs",
            "n_tokens",
            fround(F.col("n_docs") / F.col("all_docs"), 6).alias("doc_share"),
            fround(F.col("n_tokens") / F.col("all_toks"), 6).alias(
                "token_share"
            ),
            fround(
                F.sum("n_tokens").over(wb) / F.col("all_toks"), 6
            ).alias("cum_token_share"),
        )
    )


# ---------------------------------------------------------------------------
# Stopword / token-length / lexical-diversity profile per source
# ---------------------------------------------------------------------------

STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "this", "that", "be", "are",
    "was", "from", "but", "not",
)
_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)


@register(
    "q_stopword_profile",
    oracle=f"""
    WITH per_doc AS (
        SELECT source,
               len({_TOKS_DUCK}) AS toks,
               len(list_filter({_TOKS_DUCK}, t -> t IN ({_STOP_SQL})))
                   AS stops,
               length(regexp_replace(lower(trim(text)), '{WS_CLASS}', '', 'g'))
                   AS tok_chars
        FROM documents
    ),
    ttr AS (
        SELECT source,
               count(DISTINCT t) / CAST(count(*) AS DOUBLE) AS raw_ttr
        FROM (SELECT source, unnest({_TOKS_DUCK}) AS t FROM documents)
        GROUP BY source
    ),
    per_source AS (
        SELECT d.source,
               {fround_sql("sum(d.stops) / CAST(sum(d.toks) AS DOUBLE)", 6)}
                   AS stop_ratio,
               {fround_sql("sum(d.tok_chars) / CAST(sum(d.toks) AS DOUBLE)", 6)}
                   AS avg_token_len,
               {fround_sql("any_value(r.raw_ttr)", 6)} AS ttr
        FROM per_doc d JOIN ttr r ON d.source = r.source
        GROUP BY d.source
    ),
    stats AS (
        SELECT avg(stop_ratio) AS mu_s, stddev_samp(stop_ratio) AS sd_s,
               avg(avg_token_len) AS mu_l, stddev_samp(avg_token_len) AS sd_l,
               avg(ttr) AS mu_t, stddev_samp(ttr) AS sd_t
        FROM per_source
    )
    SELECT p.source, p.stop_ratio, p.avg_token_len, p.ttr,
           {fround_sql("(p.stop_ratio - s.mu_s) / s.sd_s", 4)} AS z_stop,
           {fround_sql("(p.avg_token_len - s.mu_l) / s.sd_l", 4)} AS z_len,
           {fround_sql("(p.ttr - s.mu_t) / s.sd_t", 4)} AS z_ttr,
           (abs((p.stop_ratio - s.mu_s) / s.sd_s) > 2
            OR abs((p.avg_token_len - s.mu_l) / s.sd_l) > 2
            OR abs((p.ttr - s.mu_t) / s.sd_t) > 2) AS is_outlier
    FROM per_source p, stats s
    """,
)
def q_stopword_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source language-quality profile: stopword token ratio, mean
    token length, and type-token ratio (lexical diversity), each z-scored
    against the cross-source distribution with a 2-sigma outlier flag —
    the "does this source even look like the rest of the corpus" gate
    that runs before per-document quality scoring.  (Punctuation/caps
    ratios would be the natural extra dims, but the synthetic corpus has
    neither — all-zero columns certify nothing.)

    Scale: stopword and length counting are per-row codegen (array filter
    + regexp length) collapsed to |sources| rows in one partial agg; TTR
    needs the token explode but aggregates map-side to |sources| rows;
    z-scoring joins back a broadcast 1-row stats table."""
    toks = F.split(F.trim(F.lower("text")), WS_CLASS)
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    per_doc = docs.select(
        "source",
        F.size(toks).alias("toks"),
        F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))).alias(
            "stops"
        ),
        F.length(
            F.regexp_replace(F.lower(F.trim("text")), F.lit(WS_CLASS), F.lit(""))
        ).alias("tok_chars"),
    )
    ttr = (
        docs.select("source", F.explode(toks).alias("t"))
        .groupBy("source")
        .agg(
            (F.countDistinct("t") / F.count("*").cast("double")).alias(
                "raw_ttr"
            )
        )
    )
    per_source = (
        per_doc.groupBy("source")
        .agg(
            fround(F.sum("stops") / F.sum("toks").cast("double"), 6).alias(
                "stop_ratio"
            ),
            fround(
                F.sum("tok_chars") / F.sum("toks").cast("double"), 6
            ).alias("avg_token_len"),
        )
        .join(
            ttr.select("source", fround(F.col("raw_ttr"), 6).alias("ttr")),
            "source",
        )
    )
    stats = per_source.agg(
        F.avg("stop_ratio").alias("mu_s"),
        F.stddev_samp("stop_ratio").alias("sd_s"),
        F.avg("avg_token_len").alias("mu_l"),
        F.stddev_samp("avg_token_len").alias("sd_l"),
        F.avg("ttr").alias("mu_t"),
        F.stddev_samp("ttr").alias("sd_t"),
    )
    zs = (F.col("stop_ratio") - F.col("mu_s")) / F.col("sd_s")
    zl = (F.col("avg_token_len") - F.col("mu_l")) / F.col("sd_l")
    zt = (F.col("ttr") - F.col("mu_t")) / F.col("sd_t")
    return per_source.crossJoin(F.broadcast(stats)).select(
        "source",
        "stop_ratio",
        "avg_token_len",
        "ttr",
        fround(zs, 4).alias("z_stop"),
        fround(zl, 4).alias("z_len"),
        fround(zt, 4).alias("z_ttr"),
        ((F.abs(zs) > 2) | (F.abs(zl) > 2) | (F.abs(zt) > 2)).alias(
            "is_outlier"
        ),
    )


# ---------------------------------------------------------------------------
# MinHash band tuning against planted ground truth
# ---------------------------------------------------------------------------

# (bands, rows) configurations, all factoring the repo's K=32 signature
BAND_CONFIGS = ((32, 1), (16, 2), (8, 4), (4, 8))
_CONFIG_SQL = ", ".join(f"({b}, {r})" for b, r in BAND_CONFIGS)


@register(
    "q_minhash_band_tuning",
    oracle=f"""
    WITH corpus AS ({_NEAR_CORPUS_SQL}),
    toks AS (SELECT doc_id, {_WORDS_DUCK} AS _words FROM corpus),
    sh AS (SELECT doc_id, {_SHINGLES_DUCK} AS _shingles FROM toks),
    expl AS (
        SELECT DISTINCT doc_id, s
        FROM (SELECT doc_id, unnest(_shingles) AS s FROM sh)
    ),
    orig AS (SELECT doc_id, s FROM expl WHERE doc_id < 200000),
    copy AS (SELECT doc_id - 200000 AS doc_id, s FROM expl
             WHERE doc_id >= 200000),
    sizes_o AS (SELECT doc_id, count(*) AS n_o FROM orig GROUP BY doc_id),
    sizes_c AS (SELECT doc_id, count(*) AS n_c FROM copy GROUP BY doc_id),
    common AS (
        SELECT o.doc_id, count(*) AS c
        FROM orig o JOIN copy k ON o.doc_id = k.doc_id AND o.s = k.s
        GROUP BY o.doc_id
    ),
    planted AS (
        SELECT s_c.doc_id,
               {fround_sql(
                   "coalesce(c.c, 0) / CAST(s_o.n_o + s_c.n_c - coalesce(c.c, 0) AS DOUBLE)",
                   6,
               )} AS j
        FROM sizes_c s_c
        JOIN sizes_o s_o ON s_o.doc_id = s_c.doc_id
        LEFT JOIN common c ON c.doc_id = s_c.doc_id
    ),
    scored AS (
        SELECT cfg.b, cfg.r, p.doc_id,
               {fround_sql("1 - pow(1 - pow(p.j, cfg.r), cfg.b)", 6)} AS p_detect
        FROM planted p JOIN (VALUES {_CONFIG_SQL}) cfg(b, r) ON TRUE
    )
    SELECT b AS bands, r AS rows_per_band,
           CAST(count(*) AS BIGINT) AS n_pairs,
           {fround_sql("avg(p_detect)", 6)} AS expected_recall,
           CAST(sum(CASE WHEN p_detect >= 0.9 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_pairs_ge90
    FROM scored
    GROUP BY b, r
    """,
)
def q_minhash_band_tuning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH band tuning against planted ground truth: for every planted
    near-dup pair (the _near_corpus doc/truncated-copy pairs), compute the
    EXACT 3-gram Jaccard, then for each (bands, rows) factorization of the
    K=32 signature evaluate the S-curve detection probability
    1-(1-j^r)^b — expected recall and the count of pairs detected with
    >=90% probability per configuration.  This is how the MinHash
    deployment (text.py:_BANDS x _ROWS) picks its operating point at
    100 TB: measure the real similarity distribution on planted/known
    dups, read the curve, THEN spend the cluster.

    Scale: exact Jaccard is computed only for the |planted| pairs by a
    keyed join of the two docs' distinct shingle sets (|pairs| x shingles
    work, the q_minhash_eval idiom, text.py:952) — never corpus-quadratic;
    the S-curve stage is scalar math on |pairs| x |configs| rows."""
    # sh fans into orig and copy, each feeding a size census AND a join
    # leg of the common-shingle count: lazily composed, the shingle
    # explode + distinct ran 4x.  One eager checkpoint bounds it at one
    # pass (r12, guide §5).
    sh = (
        _shingle_rows(_near_corpus(spark, sf_dir))
        .select("doc_id", "s")
        .distinct()
        .localCheckpoint(eager=True)
    )
    orig = sh.filter(F.col("doc_id") < 200000)
    copy = sh.filter(F.col("doc_id") >= 200000).select(
        (F.col("doc_id") - 200000).alias("doc_id"), "s"
    )
    sizes_o = orig.groupBy("doc_id").agg(F.count("*").alias("n_o"))
    sizes_c = copy.groupBy("doc_id").agg(F.count("*").alias("n_c"))
    common = (
        orig.join(copy, ["doc_id", "s"])
        .groupBy("doc_id")
        .agg(F.count("*").alias("c"))
    )
    planted = (
        sizes_c.join(sizes_o, "doc_id")
        .join(common, "doc_id", "left")
        .select(
            "doc_id",
            fround(
                F.coalesce("c", F.lit(0))
                / (
                    F.col("n_o") + F.col("n_c") - F.coalesce("c", F.lit(0))
                ).cast("double"),
                6,
            ).alias("j"),
        )
    )
    cfg = F.array(
        *[
            F.struct(F.lit(b).alias("b"), F.lit(r).alias("r"))
            for b, r in BAND_CONFIGS
        ]
    )
    scored = (
        planted.select("doc_id", "j", F.explode(cfg).alias("cfg"))
        .select(
            "doc_id",
            "j",
            F.col("cfg.b").alias("b"),
            F.col("cfg.r").alias("r"),
        )
        .withColumn(
            "p_detect",
            fround(
                F.lit(1.0)
                - F.pow(
                    F.lit(1.0) - F.pow(F.col("j"), F.col("r").cast("double")),
                    F.col("b").cast("double"),
                ),
                6,
            ),
        )
    )
    return scored.groupBy(
        F.col("b").alias("bands"), F.col("r").alias("rows_per_band")
    ).agg(
        F.count("*").cast("long").alias("n_pairs"),
        fround(F.avg("p_detect"), 6).alias("expected_recall"),
        F.sum((F.col("p_detect") >= 0.9).cast("long"))
        .cast("long")
        .alias("n_pairs_ge90"),
    )


# ---------------------------------------------------------------------------
# Partition-pruning audit (round 7)
# ---------------------------------------------------------------------------

PRUNE_VALUE_MIN = 90.0  # the audited predicate: value > 90 (Faulty band)


@register(
    "q_pruning_audit",
    oracle=f"""
    WITH parts AS (
        SELECT event_type,
               date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
               count(*) AS n_rows,
               max(value) AS max_value,
               min(value) AS min_value
        FROM events GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_partitions,
           CAST(sum(CASE WHEN max_value <= {PRUNE_VALUE_MIN} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_prunable,
           CAST(sum(n_rows) AS BIGINT) AS total_rows,
           CAST(sum(CASE WHEN max_value <= {PRUNE_VALUE_MIN} THEN n_rows
                         ELSE 0 END) AS BIGINT) AS rows_skipped,
           {fround_sql(
               f"sum(CASE WHEN max_value <= {PRUNE_VALUE_MIN} THEN n_rows"
               " ELSE 0 END) / CAST(sum(n_rows) AS DOUBLE)",
               6,
           )} AS skip_frac
    FROM parts
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_pruning_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Layout-effectiveness audit for the 100 TB question "will this
    predicate prune?": build the (event_type, day) partition-statistics
    frame a lakehouse layout would expose (per-partition min/max/rows —
    what parquet row-group footers and Iceberg manifests store), then
    score the hot predicate `value > {PRUNE_VALUE_MIN}` — how many
    partitions a scan could SKIP on max_value alone, and what row fraction
    that saves.  A low skip_frac says the column needs clustering/z-order
    before the predicate gets cheap; this query is how you know before
    paying for the rewrite.

    Scale: the stats frame is one partial-agg pass keyed by the bounded
    partition tuple; the verdict is a re-aggregation of that already-tiny
    frame.  Nothing data-proportional shuffles twice."""
    ev = load_table(spark, sf_dir, "events")
    parts = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.count("*").alias("n_rows"),
        F.max("value").alias("max_value"),
        F.min("value").alias("min_value"),
    )
    prunable = F.col("max_value") <= PRUNE_VALUE_MIN
    return (
        parts.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_partitions"),
            F.sum(prunable.cast("long")).cast("long").alias("n_prunable"),
            F.sum("n_rows").cast("long").alias("total_rows"),
            F.sum(F.when(prunable, F.col("n_rows")).otherwise(0))
            .cast("long")
            .alias("rows_skipped"),
            fround(
                F.sum(F.when(prunable, F.col("n_rows")).otherwise(0)).cast(
                    "double"
                )
                / F.sum("n_rows").cast("double"),
                6,
            ).alias("skip_frac"),
        )
        .orderBy("event_type")
    )
