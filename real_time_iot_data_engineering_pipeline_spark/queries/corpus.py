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
    discrimination fix when the unigram vocabulary is degenerate.  For
    corpora where even n-gram lists skew, the production guard is an
    absolute per-term posting cap with candidate-then-verify rescoring
    (same two-phase shape as q_embed_knn_lsh).  Final all-pair cosines
    are 4 dp-rounded before the global top-50."""
    tf = (
        _bigrams(spark, sf_dir)
        .select(
            "doc_id",
            F.concat_ws(" ", F.col("w1"), F.col("w2")).alias("token"),
        )
        .groupBy("doc_id", "token")
        .agg(F.count("*").cast("long").alias("tf"))
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
    norms = top.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm")
    )
    unit = top.join(norms, "doc_id").select(
        "doc_id", "token", (F.col("w") / F.col("nrm")).alias("nw")
    )
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
    return pairs.orderBy(F.col("cosine").desc(), "doc_a", "doc_b").limit(50)


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
