"""Published-heuristic document-quality filters over `documents` — the
rule-based cleaning pass a training-data pipeline runs before dedup and
LM-based filtering.  Beyond-reference capability (the reference pipeline
has no document corpus); rule provenance is public literature:

- Gopher rules: Rae et al. 2021 (Gopher, table A1) — word-count bounds,
  mean-word-length bounds, symbol-to-word ratio, alphabetic-word fraction,
  stopword presence.
- C4 line filters: Raffel et al. 2020 (T5/C4, §2.2) — keep lines with
  enough words, drop documents containing code/boilerplate markers
  ("lorem ipsum", curly braces).
- Code detection: heuristic token/char ratios (braces, semicolons,
  operator tokens) — the standard cheap code-vs-prose router.
- Boilerplate lines: near-universal lines within a source (CCNet §3.1
  dedups paragraph hashes against shard-frequency for the same reason).

The synthetic fixture's documents are punctuation-free word soup, so each
query PLANTS its trigger features deterministically from doc_id (the
queries/curation.py canary pattern), identically in Spark and DuckDB —
keep/drop decisions are therefore non-trivially exercised and
oracle-CHECKED, not vacuously green.

Scale design: the Gopher / C4 / code filters are pure per-document column
expressions (split + higher-order array functions, whole-stage codegen,
no Python, no shuffle) — at 100 TB they are a map-only pass that fuses
into whatever scan precedes them.  Boilerplate detection shuffles 16-byte
chunk hashes, never text, keyed by (source, hash) with map-side partial
aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import fround, fround_sql
from ..functions.tokenize import WS as _WS
from ..registry import register
from ..sources import load_table

# ---------------------------------------------------------------------------
# Planted corpus: deterministic trigger features by doc_id residue
# ---------------------------------------------------------------------------

# residues chosen pairwise-coprime so rule combinations occur
_SYMBOL_WORDS = " ### #@# ##@ @@# #@@ ###"  # doc_id % 5 == 0
_NUM_WORD = " 1234567890123"  # x20, doc_id % 7 == 0
_LONG_WORD = " zzzzzzzzzzzzzzzzzzzzzzzzzzzzzz"  # 30 chars, x20, doc_id % 11 == 0
_LOREM = " lorem ipsum dolor"  # doc_id % 13 == 0
_CODE = " function foo ( x ) { return x + 1 ; } var y = 0 ; { }"  # % 19 == 0
# PREPENDED footer, exactly LINE_WORDS (12) words including the source name,
# so it fills chunk 0 on its own and hashes identically across a source's
# documents (a footer appended at the end would land mid-chunk at a
# doc-length-dependent offset and never repeat); doc_id % 4 != 0.
_FOOTER_PRE = "subscribe to the official newsletter of "
_FOOTER_POST = " click here to unsubscribe anytime "

_PLANT_SPARK = (
    "concat("
    f"if(doc_id % 4 != 0, concat('{_FOOTER_PRE}', source, '{_FOOTER_POST}'), '')"
    ", text"
    f", if(doc_id % 5 = 0, '{_SYMBOL_WORDS}', '')"
    f", if(doc_id % 7 = 0, repeat('{_NUM_WORD}', 20), '')"
    f", if(doc_id % 11 = 0, repeat('{_LONG_WORD}', 20), '')"
    f", if(doc_id % 13 = 0, '{_LOREM}', '')"
    f", if(doc_id % 19 = 0, '{_CODE}', ''))"
)
_PLANT_DUCK = (
    f"CASE WHEN doc_id % 4 != 0"
    f" THEN '{_FOOTER_PRE}' || source || '{_FOOTER_POST}' ELSE '' END"
    " || text"
    f" || CASE WHEN doc_id % 5 = 0 THEN '{_SYMBOL_WORDS}' ELSE '' END"
    f" || CASE WHEN doc_id % 7 = 0 THEN repeat('{_NUM_WORD}', 20) ELSE '' END"
    f" || CASE WHEN doc_id % 11 = 0 THEN repeat('{_LONG_WORD}', 20) ELSE '' END"
    f" || CASE WHEN doc_id % 13 = 0 THEN '{_LOREM}' ELSE '' END"
    f" || CASE WHEN doc_id % 19 = 0 THEN '{_CODE}' ELSE '' END"
)

_CORPUS_DUCK = f"""
    SELECT doc_id, source, lang, {_PLANT_DUCK} AS text FROM documents
"""


def _planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang", "text"
    )
    return docs.withColumn("text", F.expr(_PLANT_SPARK))


_WS_SPARK = f"split(trim(text), '{_WS}')"
_WS_DUCK = f"string_split_regex(trim(text), '{_WS}')"

# ---------------------------------------------------------------------------
# Gopher quality rules
# ---------------------------------------------------------------------------

GOPHER_MIN_WORDS = 30
GOPHER_MAX_WORDS = 100_000
GOPHER_MWL_LO = 3.0
GOPHER_MWL_HI = 10.0
GOPHER_SYMBOL_MAX = 0.1
GOPHER_ALPHA_MIN = 0.8
_STOPS = ("the", "a", "and", "of", "to")
_STOPS_SPARK = "array(" + ", ".join(f"'{s}'" for s in _STOPS) + ")"
_STOPS_DUCK = "[" + ", ".join(f"'{s}'" for s in _STOPS) + "]"


@register(
    "q_gopher_rules",
    oracle=f"""
    WITH corpus AS ({_CORPUS_DUCK}),
    feat AS (
        SELECT doc_id, {_WS_DUCK} AS ws,
               (length(text) - length(replace(text, '#', ''))) AS sym_hits
        FROM corpus
    ),
    m AS (
        SELECT doc_id,
               len(ws) AS n_words,
               list_sum(list_transform(ws, w -> length(w)))
                   / CAST(len(ws) AS DOUBLE) AS mwl,
               len(list_filter(ws, w -> regexp_matches(w, '[a-z]')))
                   / CAST(len(ws) AS DOUBLE) AS alpha_frac,
               sym_hits / CAST(len(ws) AS DOUBLE) AS symbol_ratio,
               len(list_intersect(ws, {_STOPS_DUCK})) AS n_stop
        FROM feat
    )
    SELECT doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           {fround_sql("mwl")} AS mean_word_len,
           {fround_sql("symbol_ratio")} AS symbol_ratio,
           {fround_sql("alpha_frac")} AS alpha_frac,
           CAST(n_stop AS INT) AS n_stop,
           n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}
               AS r_word_count,
           {fround_sql("mwl", 6)} BETWEEN {GOPHER_MWL_LO} AND {GOPHER_MWL_HI}
               AS r_word_len,
           {fround_sql("symbol_ratio", 6)} <= {GOPHER_SYMBOL_MAX}
               AS r_symbols,
           {fround_sql("alpha_frac", 6)} >= {GOPHER_ALPHA_MIN} AS r_alpha,
           n_stop >= 2 AS r_stopwords,
           (n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS})
               AND ({fround_sql("mwl", 6)}
                    BETWEEN {GOPHER_MWL_LO} AND {GOPHER_MWL_HI})
               AND {fround_sql("symbol_ratio", 6)} <= {GOPHER_SYMBOL_MAX}
               AND {fround_sql("alpha_frac", 6)} >= {GOPHER_ALPHA_MIN}
               AND n_stop >= 2 AS keep
    FROM m
    ORDER BY doc_id
    """,
)
def q_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher rule-based quality filter (Rae et al. 2021, table A1): per
    document, word count, mean word length, symbol-to-word ratio,
    alphabetic-word fraction, and stopword presence, each with its
    keep-range verdict plus the conjunction.

    Scale: map-only — split + higher-order array folds (aggregate /
    filter / array_intersect) are all whole-stage-codegen JVM
    expressions; nothing shuffles, nothing leaves the scan stage.  Rule
    thresholds compare 6 dp-quantized features (fround both engines) so
    boundary verdicts can't flip on summation order."""
    ws = F.expr(_WS_SPARK)
    feat = _planted(spark, sf_dir).select(
        "doc_id",
        ws.alias("ws"),
        (
            F.length("text") - F.length(F.expr("replace(text, '#', '')"))
        ).alias("sym_hits"),
    )
    n = F.size("ws").cast("double")
    m = feat.select(
        "doc_id",
        F.size("ws").cast("long").alias("n_words"),
        (
            F.expr("aggregate(ws, 0L, (acc, w) -> acc + length(w))") / n
        ).alias("mwl"),
        (F.expr("size(filter(ws, w -> w rlike '[a-z]'))") / n).alias(
            "alpha_frac"
        ),
        (F.col("sym_hits") / n).alias("symbol_ratio"),
        F.expr(f"size(array_intersect(ws, {_STOPS_SPARK}))")
        .cast("int")
        .alias("n_stop"),
    )
    r_wc = F.col("n_words").between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
    r_wl = fround(F.col("mwl"), 6).between(GOPHER_MWL_LO, GOPHER_MWL_HI)
    r_sym = fround(F.col("symbol_ratio"), 6) <= GOPHER_SYMBOL_MAX
    r_alpha = fround(F.col("alpha_frac"), 6) >= GOPHER_ALPHA_MIN
    r_stop = F.col("n_stop") >= 2
    return m.select(
        "doc_id",
        "n_words",
        fround(F.col("mwl")).alias("mean_word_len"),
        fround(F.col("symbol_ratio")).alias("symbol_ratio"),
        fround(F.col("alpha_frac")).alias("alpha_frac"),
        "n_stop",
        r_wc.alias("r_word_count"),
        r_wl.alias("r_word_len"),
        r_sym.alias("r_symbols"),
        r_alpha.alias("r_alpha"),
        r_stop.alias("r_stopwords"),
        (r_wc & r_wl & r_sym & r_alpha & r_stop).alias("keep"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# C4 line filters (chunk-as-line over punctuation-free fixture text)
# ---------------------------------------------------------------------------

LINE_WORDS = 12  # a "line" = non-overlapping 12-word chunk
C4_MIN_LINE_WORDS = 5
_BAD_LINE_TOKENS_SPARK = "array('lorem', '{')"
_BAD_LINE_TOKENS_DUCK = "['lorem', '{']"

# chunks-of-12 as a narrow array expression (no explode, no shuffle)
_LINES_SPARK = (
    f"if(size(ws) = 0, array(), transform("
    f"sequence(0, cast(ceil(size(ws) / {LINE_WORDS}.0d) AS int) - 1), "
    f"i -> slice(ws, i * {LINE_WORDS} + 1, {LINE_WORDS})))"
)
_LINES_DUCK = (
    f"CASE WHEN len(ws) = 0 THEN [] ELSE list_transform("
    f"generate_series(0, CAST(ceil(len(ws) / {LINE_WORDS}.0) AS INT) - 1), "
    f"i -> ws[i * {LINE_WORDS} + 1 : i * {LINE_WORDS} + {LINE_WORDS}]) END"
)


@register(
    "q_c4_filters",
    oracle=f"""
    WITH corpus AS ({_CORPUS_DUCK}),
    toks AS (SELECT doc_id, text, {_WS_DUCK} AS ws FROM corpus),
    lined AS (SELECT doc_id, text, {_LINES_DUCK} AS lines FROM toks),
    m AS (
        SELECT doc_id,
               len(lines) AS n_lines,
               len(list_filter(lines, l ->
                   len(l) >= {C4_MIN_LINE_WORDS}
                   AND len(list_intersect(l, {_BAD_LINE_TOKENS_DUCK})) = 0))
                   AS n_kept,
               list_sum(list_transform(list_filter(lines, l ->
                   len(l) >= {C4_MIN_LINE_WORDS}
                   AND len(list_intersect(l, {_BAD_LINE_TOKENS_DUCK})) = 0),
                   l -> len(l))) AS kept_words,
               list_sum(list_transform(lines, l -> len(l))) AS total_words,
               (contains(text, 'lorem ipsum') OR contains(text, '{{'))
                   AS doc_drop
        FROM lined
    )
    SELECT doc_id, CAST(n_lines AS BIGINT) AS n_lines,
           CAST(n_kept AS BIGINT) AS n_kept_lines,
           {fround_sql("coalesce(kept_words, 0) / CAST(total_words AS DOUBLE)")}
               AS kept_word_frac,
           doc_drop
    FROM m
    ORDER BY doc_id
    """,
)
def q_c4_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style cleaning report (Raffel et al. 2020 §2.2): treat each
    non-overlapping {LINE_WORDS}-word chunk as a "line" (the fixture has
    no newlines), keep lines with >= {C4_MIN_LINE_WORDS} words and no
    code/boilerplate marker token, and flag whole documents containing
    'lorem ipsum' or a curly brace for removal.

    Scale: map-only.  The chunking is a sequence+slice higher-order
    expression over the split array — one pass, no explode, no shuffle;
    per-line verdicts fold back with filter/transform/list sums inside
    whole-stage codegen."""
    toks = _planted(spark, sf_dir).select(
        "doc_id", "text", F.expr(_WS_SPARK).alias("ws")
    )
    keep_pred = (
        f"l -> size(l) >= {C4_MIN_LINE_WORDS} "
        f"AND size(array_intersect(l, {_BAD_LINE_TOKENS_SPARK})) = 0"
    )
    m = toks.select(
        "doc_id",
        "text",
        F.expr(_LINES_SPARK).alias("lines"),
    ).select(
        "doc_id",
        F.size("lines").cast("long").alias("n_lines"),
        F.expr(f"size(filter(lines, {keep_pred}))").cast("long").alias("n_kept"),
        F.expr(
            f"aggregate(filter(lines, {keep_pred}), 0L, (acc, l) -> acc + size(l))"
        ).alias("kept_words"),
        F.expr("aggregate(lines, 0L, (acc, l) -> acc + size(l))").alias(
            "total_words"
        ),
        (
            F.col("text").contains("lorem ipsum") | F.col("text").contains("{")
        ).alias("doc_drop"),
    )
    return m.select(
        "doc_id",
        "n_lines",
        F.col("n_kept").alias("n_kept_lines"),
        fround(
            F.coalesce(F.col("kept_words"), F.lit(0)).cast("double")
            / F.col("total_words").cast("double")
        ).alias("kept_word_frac"),
        "doc_drop",
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Code-vs-prose detection
# ---------------------------------------------------------------------------

_CODE_TOKENS_SPARK = "array('{', '}', '(', ')', ';', '=', '+', 'function', 'var', 'return')"
_CODE_TOKENS_DUCK = "['{', '}', '(', ')', ';', '=', '+', 'function', 'var', 'return']"
CODE_SCORE_MIN = 0.08


@register(
    "q_code_detect",
    oracle=f"""
    WITH corpus AS ({_CORPUS_DUCK}),
    toks AS (SELECT doc_id, text, {_WS_DUCK} AS ws FROM corpus),
    m AS (
        SELECT doc_id,
               (length(text) - length(replace(text, '{{', '')))
                 + (length(text) - length(replace(text, '}}', '')))
                   AS brace_count,
               (length(text) - length(replace(text, ';', '')))
                   AS semi_count,
               len(list_filter(ws, w -> list_contains({_CODE_TOKENS_DUCK}, w)))
                   / CAST(len(ws) AS DOUBLE) AS code_token_frac,
               len(ws) AS n_words
        FROM toks
    )
    SELECT doc_id,
           CAST(brace_count AS INT) AS brace_count,
           CAST(semi_count AS INT) AS semi_count,
           {fround_sql("code_token_frac")} AS code_token_frac,
           {fround_sql(
               "code_token_frac"
               " + least(brace_count, 4) / (4.0 * CAST(n_words AS DOUBLE))"
               " + least(semi_count, 4) / (4.0 * CAST(n_words AS DOUBLE))"
           )} AS code_score,
           {fround_sql(
               "code_token_frac"
               " + least(brace_count, 4) / (4.0 * CAST(n_words AS DOUBLE))"
               " + least(semi_count, 4) / (4.0 * CAST(n_words AS DOUBLE))",
               6,
           )} >= {CODE_SCORE_MIN} AS is_code
    FROM m
    ORDER BY doc_id
    """,
)
def q_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cheap code-vs-prose router: per document, brace / semicolon counts
    and the fraction of code-marker tokens, combined into a score with an
    is_code verdict — the heuristic front of a code-routing mixture
    pipeline (code goes to a code tokenizer, prose to text filters).

    Scale: map-only single scan, all JVM string/array expressions; the
    verdict compares the 6 dp-quantized score on both engines."""
    toks = _planted(spark, sf_dir).select(
        "doc_id", "text", F.expr(_WS_SPARK).alias("ws")
    )
    brace = (
        F.length("text") - F.length(F.expr("replace(text, '{', '')"))
    ) + (F.length("text") - F.length(F.expr("replace(text, '}', '')")))
    semi = F.length("text") - F.length(F.expr("replace(text, ';', '')"))
    n = F.size("ws").cast("double")
    ctf = (
        F.expr(f"size(filter(ws, w -> array_contains({_CODE_TOKENS_SPARK}, w)))")
        / n
    )
    m = toks.select(
        "doc_id",
        brace.cast("int").alias("brace_count"),
        semi.cast("int").alias("semi_count"),
        ctf.alias("code_token_frac"),
        n.alias("n_words"),
    )
    score = (
        F.col("code_token_frac")
        + F.least(F.col("brace_count"), F.lit(4)).cast("double")
        / (F.lit(4.0) * F.col("n_words"))
        + F.least(F.col("semi_count"), F.lit(4)).cast("double")
        / (F.lit(4.0) * F.col("n_words"))
    )
    return m.select(
        "doc_id",
        "brace_count",
        "semi_count",
        fround(F.col("code_token_frac")).alias("code_token_frac"),
        fround(score).alias("code_score"),
        (fround(score, 6) >= CODE_SCORE_MIN).alias("is_code"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Boilerplate-line detection (per-source near-universal chunks)
# ---------------------------------------------------------------------------

BOILER_DOC_FRAC = 0.5  # chunk type present in >= half a source's docs


@register(
    "q_boilerplate",
    oracle=f"""
    WITH corpus AS ({_CORPUS_DUCK}),
    toks AS (SELECT doc_id, source, {_WS_DUCK} AS ws FROM corpus),
    lined AS (SELECT doc_id, source, {_LINES_DUCK} AS lines FROM toks),
    chunks AS (
        SELECT doc_id, source,
               md5(array_to_string(unnest(lines), ' ')) AS h
        FROM lined
    ),
    per_src AS (
        SELECT source, CAST(count(DISTINCT doc_id) AS DOUBLE) AS n_docs
        FROM chunks GROUP BY source
    ),
    freq AS (
        SELECT c.source, c.h,
               count(*) AS n_occ,
               count(DISTINCT c.doc_id) AS n_docs_with,
               max(s.n_docs) AS n_docs
        FROM chunks c JOIN per_src s USING (source)
        GROUP BY c.source, c.h
    )
    SELECT source,
           CAST(sum(n_occ) AS BIGINT) AS total_chunks,
           CAST(sum(CASE WHEN n_docs_with >= {BOILER_DOC_FRAC} * n_docs
                         THEN 1 ELSE 0 END) AS BIGINT) AS boiler_chunk_types,
           CAST(sum(CASE WHEN n_docs_with >= {BOILER_DOC_FRAC} * n_docs
                         THEN n_occ ELSE 0 END) AS BIGINT) AS boiler_occurrences,
           {fround_sql(
               "sum(CASE WHEN n_docs_with >= "
               f"{BOILER_DOC_FRAC} * n_docs THEN n_occ ELSE 0 END)"
               " / CAST(sum(n_occ) AS DOUBLE)",
               6,
           )} AS boiler_frac
    FROM freq
    GROUP BY source
    ORDER BY source
    """,
)
def q_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source boilerplate detector: hash every {LINE_WORDS}-word chunk,
    call a chunk type boilerplate when it appears in >= {BOILER_DOC_FRAC:.0%}
    of the source's documents (the planted subscribe-footer is one per
    source), and report each source's boilerplate chunk-type count and
    occurrence fraction — what a C4/CCNet-style cleaner would strip.

    Scale: text never shuffles.  Chunks collapse to md5 hashes map-side;
    the (source, hash) groupBy partial-aggregates before its exchange, and
    the per-source doc counts ride a broadcast join.  Distinct-doc counts
    within (source, hash) use Spark's native two-phase count-distinct
    expand."""
    toks = _planted(spark, sf_dir).select(
        "doc_id", "source", F.expr(_WS_SPARK).alias("ws")
    )
    chunks = (
        toks.select(
            "doc_id", "source", F.expr(_LINES_SPARK).alias("lines")
        )
        .select(
            "doc_id",
            "source",
            F.explode(
                F.expr("transform(lines, l -> md5(array_join(l, ' ')))")
            ).alias("h"),
        )
    )
    per_src = chunks.groupBy("source").agg(
        F.countDistinct("doc_id").cast("double").alias("n_docs")
    )
    freq = (
        chunks.groupBy("source", "h")
        .agg(
            F.count("*").alias("n_occ"),
            F.countDistinct("doc_id").alias("n_docs_with"),
        )
        .join(F.broadcast(per_src), "source")
    )
    is_boiler = F.col("n_docs_with") >= F.lit(BOILER_DOC_FRAC) * F.col("n_docs")
    return (
        freq.groupBy("source")
        .agg(
            F.sum("n_occ").cast("long").alias("total_chunks"),
            F.sum(is_boiler.cast("long")).cast("long").alias(
                "boiler_chunk_types"
            ),
            F.sum(F.when(is_boiler, F.col("n_occ")).otherwise(0))
            .cast("long")
            .alias("boiler_occurrences"),
            fround(
                F.sum(F.when(is_boiler, F.col("n_occ")).otherwise(0)).cast(
                    "double"
                )
                / F.sum("n_occ").cast("double"),
                6,
            ).alias("boiler_frac"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Cleaning-policy ensemble (round 7)
# ---------------------------------------------------------------------------


@register(
    "q_quality_ensemble",
    oracle=f"""
    WITH corpus AS ({_CORPUS_DUCK}),
    feat AS (
        SELECT doc_id, text, {_WS_DUCK} AS ws,
               (length(text) - length(replace(text, '#', ''))) AS sym_hits
        FROM corpus
    ),
    m AS (
        SELECT doc_id,
               len(ws) AS n_words,
               list_sum(list_transform(ws, w -> length(w)))
                   / CAST(len(ws) AS DOUBLE) AS mwl,
               len(list_filter(ws, w -> regexp_matches(w, '[a-z]')))
                   / CAST(len(ws) AS DOUBLE) AS alpha_frac,
               sym_hits / CAST(len(ws) AS DOUBLE) AS symbol_ratio,
               len(list_intersect(ws, {_STOPS_DUCK})) AS n_stop,
               len(list_filter(ws, w ->
                   list_contains({_CODE_TOKENS_DUCK}, w)))
                   / CAST(len(ws) AS DOUBLE) AS code_token_frac,
               (contains(text, 'lorem ipsum') OR contains(text, '{{'))
                   AS c4_doc_drop
        FROM feat
    ),
    verdicts AS (
        SELECT doc_id,
               NOT (n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS})
                   AS r_gopher_words,
               NOT ({fround_sql("mwl", 6)}
                    BETWEEN {GOPHER_MWL_LO} AND {GOPHER_MWL_HI})
                   AS r_gopher_wordlen,
               {fround_sql("symbol_ratio", 6)} > {GOPHER_SYMBOL_MAX}
                   AS r_gopher_symbols,
               {fround_sql("alpha_frac", 6)} < {GOPHER_ALPHA_MIN}
                   AS r_gopher_alpha,
               n_stop < 2 AS r_gopher_stopwords,
               c4_doc_drop AS r_c4_marker,
               {fround_sql("code_token_frac", 6)} >= {CODE_SCORE_MIN}
                   AS r_route_code
        FROM m
    )
    SELECT doc_id,
           -- serialized (';'-joined) per the q_validate_reasons convention:
           -- the driver canonicalizer hashes atomic columns only.  coalesce:
           -- DuckDB's array_to_string returns NULL for an empty list, Spark's
           -- array_join returns '' — '' is the contract.
           coalesce(array_to_string(list_filter([
               CASE WHEN r_gopher_words THEN 'gopher_words' END,
               CASE WHEN r_gopher_wordlen THEN 'gopher_wordlen' END,
               CASE WHEN r_gopher_symbols THEN 'gopher_symbols' END,
               CASE WHEN r_gopher_alpha THEN 'gopher_alpha' END,
               CASE WHEN r_gopher_stopwords THEN 'gopher_stopwords' END,
               CASE WHEN r_c4_marker THEN 'c4_marker' END
           ], x -> x IS NOT NULL), ';'), '') AS drop_reasons,
           CASE WHEN r_route_code THEN 'code'
                WHEN r_gopher_words OR r_gopher_wordlen OR r_gopher_symbols
                     OR r_gopher_alpha OR r_gopher_stopwords OR r_c4_marker
                     THEN 'drop'
                ELSE 'keep' END AS route
    FROM verdicts
    ORDER BY doc_id
    """,
)
def q_quality_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cleaning POLICY the individual filters feed: one pass computes
    every rule's verdict and routes each document — 'code' documents go to
    the code pipeline (checked FIRST: code legitimately fails prose
    rules), everything violating a Gopher/C4 rule is 'drop' with the full
    machine-readable reason list, the rest 'keep'.  This is the
    composition a production corpus cleaner actually runs — one scan, one
    decision, auditable reasons — rather than N independent passes.

    Scale: identical posture to the component filters — a single map-only
    projection, all higher-order array folds in whole-stage codegen; the
    reason list is built per row with no explode and no shuffle."""
    ws = F.expr(_WS_SPARK)
    feat = _planted(spark, sf_dir).select(
        "doc_id",
        "text",
        ws.alias("ws"),
        (
            F.length("text") - F.length(F.expr("replace(text, '#', '')"))
        ).alias("sym_hits"),
    )
    n = F.size("ws").cast("double")
    m = feat.select(
        "doc_id",
        F.size("ws").cast("long").alias("n_words"),
        (
            F.expr("aggregate(ws, 0L, (acc, w) -> acc + length(w))") / n
        ).alias("mwl"),
        (F.expr("size(filter(ws, w -> w rlike '[a-z]'))") / n).alias(
            "alpha_frac"
        ),
        (F.col("sym_hits") / n).alias("symbol_ratio"),
        F.expr(f"size(array_intersect(ws, {_STOPS_SPARK}))").alias("n_stop"),
        (
            F.expr(
                f"size(filter(ws, w -> array_contains({_CODE_TOKENS_SPARK}, w)))"
            )
            / n
        ).alias("code_token_frac"),
        (
            F.col("text").contains("lorem ipsum") | F.col("text").contains("{")
        ).alias("c4_doc_drop"),
    )
    rules = [
        (
            "gopher_words",
            ~F.col("n_words").between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS),
        ),
        (
            "gopher_wordlen",
            ~fround(F.col("mwl"), 6).between(GOPHER_MWL_LO, GOPHER_MWL_HI),
        ),
        ("gopher_symbols", fround(F.col("symbol_ratio"), 6) > GOPHER_SYMBOL_MAX),
        ("gopher_alpha", fround(F.col("alpha_frac"), 6) < GOPHER_ALPHA_MIN),
        ("gopher_stopwords", F.col("n_stop") < 2),
        ("c4_marker", F.col("c4_doc_drop")),
    ]
    is_code = fround(F.col("code_token_frac"), 6) >= CODE_SCORE_MIN
    reasons = F.filter(
        F.array(*[F.when(cond, F.lit(name)) for name, cond in rules]),
        lambda x: x.isNotNull(),
    )
    any_drop = rules[0][1]
    for _, cond in rules[1:]:
        any_drop = any_drop | cond
    return m.select(
        "doc_id",
        F.array_join(reasons, ";").alias("drop_reasons"),
        F.when(is_code, "code")
        .when(any_drop, "drop")
        .otherwise("keep")
        .alias("route"),
    ).orderBy("doc_id")
