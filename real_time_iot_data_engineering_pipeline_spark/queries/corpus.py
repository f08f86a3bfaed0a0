"""Corpus-level n-gram and sparse-similarity statistics over `documents`.

The LLM-data tier so far scores documents individually (quality, entropy,
perplexity) or hashes them (minhash/simhash); this module adds the
CORPUS-level statistics a training-data pipeline derives across documents:
bigram frequency tables (n-gram LM base counts), PMI collocation mining
(tokenizer/vocab construction signal), and sparse TF-IDF cosine pairs
(the inverted-index similarity pattern, complementing the dense-embedding
and shingle-hash families in similarity.py / text.py).

Tokenization is the shared explicit-whitespace class from ranking.py
(WS_CLASS) so Spark, DuckDB, and the Python goldens split identically by
construction.

Scale design:
- Bigram expansion happens INSIDE the array domain (a SQL lambda over the
  token array) — each document row expands to its n-1 bigrams in the scan
  stage with no self-join and no posexplode alignment shuffle.
- PMI joins bigram counts to the unigram table WITHOUT broadcast hints:
  vocabulary is unbounded at 100 TB (the unigram side can be tens of GB),
  so the join must stay a key-shuffle that AQE can locally convert to
  broadcast when a filter makes the side small.
- The PMI RANKING key is the exact integer-ratio double ((c12*Nt)*Nt) /
  ((Nb*c1)*c2) rather than ln() of it: both engines evaluate the same
  IEEE expression over exactly-representable integers (all products
  < 2^53 at fixture scale; the docstring of q_pmi_collocations notes the
  big-data guard), so top-k membership cannot flip on libm ulp
  differences.  ln() is applied only to the reported column, after
  quantization.
- Sparse cosine restricts each document to its top-8 TF-IDF terms before
  the inverted-index join: high-document-frequency terms (low IDF) drop
  out of every posting list, which is what keeps candidate generation
  near-linear — the classic index-pruning trade documented in SCALE.md.

Reference parity: the reference has no corpus statistics; this extends
SURVEY.md §2.9's training-data tier (PAPERS.md: n-gram LM pipelines,
DIMSUM/DISCO sparse similarity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.rounding import fround, fround_sql
from ..registry import register
from ..sources import load_table
from .ranking import WS_CLASS

_TOKS_SQL = f"""
    SELECT doc_id,
           string_split_regex(trim(lower(text)), '{WS_CLASS}') AS t
    FROM documents
    WHERE text IS NOT NULL
"""

# DuckDB list slicing is 1-based with INCLUSIVE negative ends (t[:-1] is the
# whole list), so the pair stream is built by zipping t with t[2:] and
# dropping the final padded-NULL row; split() tokens are never NULL, so the
# filter removes exactly the padding.
_BIGRAMS_SQL = f"""
    SELECT doc_id, w1, w2
    FROM (
        SELECT doc_id, unnest(t) AS w1, unnest(t[2:]) AS w2
        FROM ({_TOKS_SQL})
    )
    WHERE w2 IS NOT NULL
"""


def _bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, w1, w2) bigram stream, expanded inside the array domain."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    toks = docs.select(
        "doc_id", F.split(F.trim(F.lower("text")), WS_CLASS).alias("t")
    )
    # struct(x AS w1, t[i+1] AS w2): transform's index i is 0-based over the
    # n-1 prefix slice, and Spark SQL bracket indexing is 0-based, so t[i+1]
    # is the successor token.
    return toks.select(
        "doc_id",
        F.expr(
            "explode(transform(slice(t, 1, size(t) - 1),"
            " (x, i) -> struct(x AS w1, t[i + 1] AS w2)))"
        ).alias("bg"),
    ).select("doc_id", "bg.w1", "bg.w2")


@register(
    "q_bigram_topk",
    oracle=f"""
    SELECT w1, w2, CAST(count(*) AS BIGINT) AS n
    FROM ({_BIGRAMS_SQL})
    GROUP BY w1, w2
    ORDER BY n DESC, w1, w2
    LIMIT 50
    """,
)
def q_bigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 bigrams with counts — the base table of an n-gram language
    model.  The expansion is a lambda over the token array (scan-stage,
    no join); counts partial-aggregate map-side, and the top-50
    terminates as TakeOrderedAndProject with (w1, w2) tiebreaks."""
    return (
        _bigrams(spark, sf_dir)
        .groupBy("w1", "w2")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy(F.col("n").desc(), "w1", "w2")
        .limit(50)
    )


@register(
    "q_pmi_collocations",
    oracle=f"""
    WITH toks AS (
        SELECT unnest(t) AS token FROM ({_TOKS_SQL})
    ),
    uni AS (
        SELECT token, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY token
    ),
    tot AS (
        SELECT CAST(sum(c) AS BIGINT) AS n_tok FROM uni
    ),
    big AS (
        SELECT w1, w2, CAST(count(*) AS BIGINT) AS pair_count
        FROM ({_BIGRAMS_SQL})
        GROUP BY w1, w2
        HAVING count(*) >= 5
    ),
    btot AS (
        SELECT CAST(count(*) AS BIGINT) AS n_big FROM ({_BIGRAMS_SQL})
    )
    SELECT w1, w2, pair_count,
           {fround_sql("ln(((CAST(pair_count AS DOUBLE) * n_tok) * n_tok)"
                       " / ((CAST(n_big AS DOUBLE) * u1.c) * u2.c))")} AS pmi
    FROM big
    JOIN uni u1 ON w1 = u1.token
    JOIN uni u2 ON w2 = u2.token
    CROSS JOIN tot CROSS JOIN btot
    ORDER BY ((CAST(pair_count AS DOUBLE) * n_tok) * n_tok)
             / ((CAST(n_big AS DOUBLE) * u1.c) * u2.c) DESC, w1, w2
    LIMIT 100
    """,
)
def q_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining by pointwise mutual information: bigrams seen
    >= 5 times, ranked by PMI against unigram frequencies.  Ranking uses
    the raw probability ratio — an IEEE-deterministic expression over
    exact integers (valid while c12*Nt*Nt < 2^53; beyond that, rank on
    ln-of-factored terms and accept ulp ties) — so the top-100 boundary
    is engine-independent; ln() only decorates the output.  The
    unigram<->bigram joins carry no broadcast hint: vocabulary scales
    with the corpus, and AQE downgrades to broadcast only when it
    measures the side small."""
    bigrams = _bigrams(spark, sf_dir)
    big = (
        bigrams.groupBy("w1", "w2")
        .agg(F.count("*").cast("long").alias("pair_count"))
        .filter(F.col("pair_count") >= 5)
    )
    toks = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    ).select(
        F.explode(F.split(F.trim(F.lower("text")), WS_CLASS)).alias("token")
    )
    uni = toks.groupBy("token").agg(F.count("*").cast("long").alias("c"))
    n_tok = uni.agg(F.sum("c").cast("long").alias("n_tok"))
    n_big = bigrams.agg(F.count("*").cast("long").alias("n_big"))
    u1 = uni.select(F.col("token").alias("_t1"), F.col("c").alias("_c1"))
    u2 = uni.select(F.col("token").alias("_t2"), F.col("c").alias("_c2"))
    ratio = (
        (F.col("pair_count").cast("double") * F.col("n_tok")) * F.col("n_tok")
    ) / ((F.col("n_big").cast("double") * F.col("_c1")) * F.col("_c2"))
    return (
        big.join(u1, F.col("w1") == F.col("_t1"))
        .join(u2, F.col("w2") == F.col("_t2"))
        .join(F.broadcast(n_tok))
        .join(F.broadcast(n_big))
        .withColumn("_ratio", ratio)
        .select(
            "w1", "w2", "pair_count", fround(F.log("_ratio"), 4).alias("pmi"),
            "_ratio",
        )
        .orderBy(F.col("_ratio").desc(), "w1", "w2")
        .limit(100)
        .drop("_ratio")
    )


# Absolute per-term posting cap for the sparse-cosine inverted index
# (the "production guard" the q_sparse_cosine_topk docstring names): a
# term whose KEPT-index posting list exceeds this length contributes
# candidacy only through its top-cap highest-weight postings, and its
# score contribution is then recomputed EXACTLY for surviving candidate
# pairs from the uncapped postings (candidate-then-verify, the
# q_embed_knn_lsh two-phase shape).  2048 never binds on the fixtures
# (max kept-index posting length 338 at sf0.1), keeping the DuckDB
# oracle exact, while bounding any one term's candidate fan-out to
# cap^2/2 pairs at any corpus size.
SPARSE_POSTING_CAP = 2048


def _sparse_capped_index(unit: DataFrame, cap: int):
    """(cand_index, hot_unit): the candidate-generation index with hot
    (> cap postings) terms truncated to their top-cap weights, plus the
    UNCAPPED hot postings for exact rescoring.  The hot-token table is
    bounded by n_postings/cap, so it is joined plainly and AQE broadcasts
    it when measured small — no forced broadcast."""
    plen = unit.groupBy("token").agg(F.count("*").alias("_plen"))
    hot_toks = plen.filter(F.col("_plen") > cap).select("token")
    cold = unit.join(hot_toks, "token", "left_anti").withColumn(
        "_hot", F.lit(False)
    )
    hot_unit = unit.join(hot_toks, "token", "left_semi")
    prn = F.row_number().over(
        Window.partitionBy("token").orderBy(F.col("nw").desc(), "doc_id")
    )
    capped_hot = (
        hot_unit.withColumn("_prn", prn)
        .filter(F.col("_prn") <= cap)
        .drop("_prn")
        .withColumn("_hot", F.lit(True))
    )
    return cold.unionByName(capped_hot), hot_unit


def _sparse_exact_pairs(unit: DataFrame, topk: int) -> DataFrame:
    """Single-pass exact scoring (the pre-cap plan): inverted-index
    self-join on token, per-pair sum — used whenever no posting list
    exceeds the cap."""
    a = unit.select(
        F.col("doc_id").alias("doc_a"),
        F.col("token").alias("_tok"),
        F.col("nw").alias("_nwa"),
    )
    b = unit.select(
        F.col("doc_id").alias("doc_b"),
        F.col("token").alias("_tok2"),
        F.col("nw").alias("_nwb"),
    )
    pairs = (
        a.join(
            b,
            (F.col("_tok") == F.col("_tok2"))
            & (F.col("doc_a") < F.col("doc_b")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(
            fround(F.sum(F.col("_nwa") * F.col("_nwb")), 4).alias("cosine"),
            F.count("*").cast("long").alias("shared_terms"),
        )
    )
    return pairs.orderBy(F.col("cosine").desc(), "doc_a", "doc_b").limit(topk)


def sparse_cosine_pairs(unit: DataFrame, cap: int, topk: int) -> DataFrame:
    """Top-k sparse-cosine pairs over a unit-normalized inverted index
    (doc_id, token, nw) with the per-term posting cap applied.

    The input index is eagerly localCheckpoint-ed (it fans into the
    posting-length census plus both phases, and it is the SMALL artifact
    here — <= top-m rows per doc — so materializing it is linear and
    partition-parallel; blocks are ContextCleaner-released with the
    plan).  The cap decision is then a 1-row driver scalar — does ANY
    posting list exceed cap? — the same runtime-replanning move AQE
    makes from shuffle statistics:

    - No (every fixture corpus): the plan IS the uncapped single-pass
      exact join — zero two-phase overhead.
    - Yes (degenerate vocabulary at scale): phase 1 joins the capped
      index on token — COLD terms (postings <= cap) score exactly, HOT
      terms grant candidacy through their top-cap postings only — and
      phase 2 rescores every candidate pair against the UNCAPPED hot
      postings (a pair surfaced by a cold term can share a hot term
      from which both docs were truncated, so membership in the capped
      hot join cannot gate the verify phase; the inner join against
      hot_unit is itself the filter).  Every reported cosine is exact
      over all shared kept terms — capping can only DROP pairs whose
      every shared term is hot and which fell outside every such term's
      top-cap postings, the degenerate mass the guard exists to bound
      (<= cap^2/2 candidate pairs per hot term).  The candidate-pair
      table is checkpointed in this branch (it feeds both the final
      score join and the rescore probe), bounded by cold fan-out plus
      the capped hot fan-out."""
    unit = unit.localCheckpoint(eager=True)
    cand_index, hot_unit = _sparse_capped_index(unit, cap)
    if not hot_unit.take(1):
        return _sparse_exact_pairs(unit, topk)
    a = cand_index.select(
        F.col("doc_id").alias("doc_a"),
        F.col("token").alias("_tok"),
        F.col("nw").alias("_nwa"),
        "_hot",
    )
    b = cand_index.select(
        F.col("doc_id").alias("doc_b"),
        F.col("token").alias("_tok2"),
        F.col("nw").alias("_nwb"),
    )
    pairs0 = (
        a.join(
            b,
            (F.col("_tok") == F.col("_tok2"))
            & (F.col("doc_a") < F.col("doc_b")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(~F.col("_hot"), F.col("_nwa") * F.col("_nwb"))
                ),
                F.lit(0.0),
            ).alias("_cold_cos"),
            F.sum(F.when(~F.col("_hot"), 1).otherwise(0))
            .cast("long")
            .alias("_cold_shared"),
        )
        .localCheckpoint(eager=True)
    )
    ha = hot_unit.select(
        F.col("doc_id").alias("doc_a"),
        "token",
        F.col("nw").alias("_hwa"),
    )
    hb = hot_unit.select(
        F.col("doc_id").alias("doc_b"),
        "token",
        F.col("nw").alias("_hwb"),
    )
    # Rescore EVERY candidate pair against the uncapped hot postings: a
    # pair surfaced by a cold term can share a hot term from which both
    # docs were truncated, so membership in the capped hot join cannot
    # gate the verify phase — the inner join against hot_unit is itself
    # the filter (pairs with no hot terms fall out, zero rows when no
    # term is hot).
    hot_scores = (
        pairs0.select("doc_a", "doc_b")
        .join(ha, "doc_a")
        .join(hb, ["doc_b", "token"])
        .groupBy("doc_a", "doc_b")
        .agg(
            F.sum(F.col("_hwa") * F.col("_hwb")).alias("_hot_cos"),
            F.count("*").cast("long").alias("_hot_shared"),
        )
    )
    scored = pairs0.join(hot_scores, ["doc_a", "doc_b"], "left").select(
        "doc_a",
        "doc_b",
        fround(
            F.col("_cold_cos") + F.coalesce(F.col("_hot_cos"), F.lit(0.0)), 4
        ).alias("cosine"),
        (
            F.col("_cold_shared")
            + F.coalesce(F.col("_hot_shared"), F.lit(0).cast("long"))
        ).alias("shared_terms"),
    )
    return scored.orderBy(F.col("cosine").desc(), "doc_a", "doc_b").limit(topk)


@register(
    "q_sparse_cosine_topk",
    oracle=f"""
    WITH tf AS (
        SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
        FROM (SELECT doc_id, w1 || ' ' || w2 AS token FROM ({_BIGRAMS_SQL}))
        GROUP BY doc_id, token
    ),
    ndocs AS (
        SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM tf
    ),
    idf AS (
        SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY token
    ),
    weighted AS (
        SELECT doc_id, tf.token,
               {fround_sql("tf * ln(CAST(n AS DOUBLE) / df)", 6)} AS w
        FROM tf JOIN idf ON tf.token = idf.token CROSS JOIN ndocs
    ),
    top AS (
        SELECT doc_id, token, w
        FROM (
            SELECT doc_id, token, w,
                   row_number() OVER (
                       PARTITION BY doc_id ORDER BY w DESC, token
                   ) AS rn
            FROM weighted
        )
        WHERE rn <= 8 AND w > 0
    ),
    norms AS (
        SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM top GROUP BY doc_id
    ),
    unit AS (
        SELECT top.doc_id, token, w / nrm AS nw
        FROM top JOIN norms ON top.doc_id = norms.doc_id
    ),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               {fround_sql("sum(a.nw * b.nw)")} AS cosine,
               CAST(count(*) AS BIGINT) AS shared_terms
        FROM unit a JOIN unit b
          ON a.token = b.token AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b, cosine, shared_terms
    FROM pairs
    ORDER BY cosine DESC, doc_a, doc_b
    LIMIT 50
    """,
)
def q_sparse_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse TF-IDF cosine similarity via an inverted-index join over
    WORD-BIGRAM terms: each document keeps its top-8 TF-IDF bigrams
    (6 dp-quantized weights so rank membership is engine-exact),
    unit-normalizes over the kept vector, and candidate pairs form ONLY
    where two documents share a kept term.  Two prunings keep candidate
    generation near-linear: (1) top-m per doc bounds each doc's index
    contribution; (2) the BIGRAM term space — measured on the fixture,
    whose unigram vocabulary is only ~31 words, so unigram posting lists
    cover ~40% of the corpus each (27.9M candidate pairs at sf0.1) while
    bigram lists are 12x smaller (2.4M) — n-gram terms are the standard
    discrimination fix when the unigram vocabulary is degenerate; and
    (3) the absolute per-term posting cap (SPARSE_POSTING_CAP = 2048)
    with candidate-then-verify rescoring (sparse_cosine_pairs above,
    the q_embed_knn_lsh two-phase shape) bounds any single skewed term
    (a boilerplate header bigram on a 100 TB corpus) to cap^2/2
    candidate pairs, with survivors rescored exactly from the uncapped
    postings.  The cap never binds on the fixtures (max kept-index
    posting 338 at sf0.1), so the DuckDB oracle stays exact; the
    binding path is pinned by the skewed-vocabulary test
    (tests/test_sparse_cap.py).  Final all-pair cosines are 4 dp-rounded
    before the global top-50."""
    return sparse_cosine_pairs(_sparse_unit(spark, sf_dir), SPARSE_POSTING_CAP, 50)


def _sparse_unit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The unit-normalized top-8 TF-IDF bigram index (doc_id, token, nw)
    feeding sparse_cosine_pairs — the per-doc top-8 cut stays lazy in the
    returned plan so the plan pin (tests/test_plans.py) can assert it
    compiles to WindowGroupLimit.

    r12: the (doc_id, token, tf) table fans into THREE subtrees (ndocs,
    idf, the weighted join), so the lazily-composed index re-ran the
    bigram explode + tf aggregation once per leg — one eager checkpoint
    of the ~3-column tf table bounds it at one pass (guide §5).  The
    unit normalization is a sum window over the SAME doc_id partitioning
    the top-8 rank window already established (guide §2.4: two
    operations keyed the same way share one exchange), replacing the
    groupBy-norms self-join that re-ran the weighted chain per leg."""
    tf = (
        _bigrams(spark, sf_dir)
        .select(
            "doc_id",
            F.concat_ws(" ", F.col("w1"), F.col("w2")).alias("token"),
        )
        .groupBy("doc_id", "token")
        .agg(F.count("*").cast("long").alias("tf"))
        .localCheckpoint(eager=True)
    )
    ndocs = tf.agg(F.count_distinct("doc_id").cast("long").alias("n"))
    idf = tf.groupBy("token").agg(F.count("*").cast("long").alias("df"))
    weighted = (
        tf.join(idf, "token")
        .join(F.broadcast(ndocs))
        .select(
            "doc_id",
            "token",
            fround(
                F.col("tf") * F.log(F.col("n").cast("double") / F.col("df")), 6
            ).alias("w"),
        )
    )
    rn = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(F.col("w").desc(), "token")
    )
    top = (
        weighted.withColumn("rn", rn)
        .filter((F.col("rn") <= 8) & (F.col("w") > 0))
        .drop("rn")
    )
    nrm = F.sqrt(
        F.sum(F.col("w") * F.col("w")).over(Window.partitionBy("doc_id"))
    )
    return top.select("doc_id", "token", (F.col("w") / nrm).alias("nw"))


# Keyword pattern: explicit character classes only (identical semantics in
# Java regex and RE2), leftmost non-overlapping matching in both engines.
KEYWORD_PATTERN = "[a-z]*(?:scan|sort|hash)[a-z]*"


@register(
    "q_keyword_extract",
    oracle=f"""
    SELECT keyword, CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM (
        SELECT doc_id,
               unnest(regexp_extract_all(lower(text), '{KEYWORD_PATTERN}'))
                   AS keyword
        FROM documents
        WHERE text IS NOT NULL
    )
    GROUP BY keyword
    ORDER BY n DESC, keyword
    LIMIT 20
    """,
)
def q_keyword_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pattern-based keyword extraction: every match of a domain keyword
    pattern across the corpus, with occurrence and document counts — the
    regexp_extract_all + explode (generator/UDTF-style) surface, distinct
    from the split-tokenizers elsewhere: ONE regex pass yields multiple
    rows per document.

    Scale: the extraction is a scan-stage projection (codegen regex, no
    Python); only matched keywords explode into rows, so output volume
    tracks match density, not corpus size.  The pattern is built from
    explicit character classes so Java regex and RE2 match identically
    (same discipline as WS_CLASS); the regex rides the PYTHON API with
    F.lit, never F.expr, so backslash classes can't be escape-corrupted
    (repo gotcha, queries/prep.py)."""
    return (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            F.explode(
                F.regexp_extract_all(
                    F.lower("text"), F.lit(KEYWORD_PATTERN), 0
                )
            ).alias("keyword"),
        )
        .groupBy("keyword")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.count_distinct("doc_id").cast("long").alias("n_docs"),
        )
        .orderBy(F.col("n").desc(), "keyword")
        .limit(20)
    )
