"""Hostile-documents PARITY: the text-tier companion of
tests/test_adversarial_parity.py — registered queries and their DuckDB
oracles must agree on documents the driver's ASCII word salad never
contains: vertical tabs INSIDE token streams (the Java-\\s vs RE2-\\s
divergence that motivated functions/tokenize.py), tabs/newlines as
separators, empty and whitespace-only texts, single-word docs, CJK text
with no spaces, emoji, accented latin, and pathological repetition.

KNOWN ENGINE DIVERGENCE (excluded here, by contract): full Unicode
case-mapping of dotted capital I (U+0130, as in Turkish "İstanbul")
differs between Spark's UTF8String.toLowerCase and DuckDB's utf8proc —
Spark produces "i" + COMBINING DOT ABOVE, DuckDB a bare "i".  The
engine's behavior (Spark's) is the product contract; the DuckDB oracle
is only byte-comparable on text whose lowercase mapping both libraries
agree on, which excludes U+0130/U+0131.  Everything else below must
match to the hash.
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from real_time_iot_data_engineering_pipeline_spark import registry
from .oracle_utils import compare

registry.load_all()

_TEXTS = {
    1001: "plain ascii words here repeated words here",
    1002: "tab\tseparated\twords and\nnewline lines",
    1003: "vertical\x0btab inside token stream maybe",
    1004: "non breaking space stays one token",
    1005: "mixed CASE Words LOWERing test Title",
    1006: "",  # empty text
    1007: "   ",  # whitespace-only
    1008: "one",
    1009: "日本語のテキストは空白なし one two three",
    1011: "emoji 🙂 in the middle of words",
    1012: "accented café naïve façade über señor",
    1013: "x " * 200,  # long pathological repetition
    1015: "zero​width space inside token",  # U+200B is NOT whitespace
    # Unicode-normalization rows (round 10, for q_text_normalize): NFD
    # decomposed accents, decomposed Hangul jamo, and the U+212B angstrom
    # singleton — each changes under NFC; 1012 above is precomposed NFC
    # and must read unchanged.
    1016: "caf\u0065\u0301 nfd decomposed accent words here",
    1017: "\u1100\u1161\u11a8 hangul jamo decomposed syllable one",
    1018: "angstrom \u212b sign plus ring \u0041\u030a letter",
}

# Text-tier queries that read only `documents`; each must agree with its
# own oracle on the hostile rows.
_PARITY_QUERIES = (
    "q_token_count",
    "q_text_stats",
    "q_doc_dedup_exact",
    "q_lang_id",
    "q_doc_fingerprint",
    "q_doc_ngram_jaccard",
    "q_jaccard_setjoin",
    "q_quality_score",
    "q_bm25_rank",
    "q_doc_simhash",
    "q_group_split",
    "q_length_histogram",
    "q_unigram_ppl",
    "q_vocab_topk",
    "q_tokenizer_fertility",
    "q_pii_redact",
    "q_gopher_rules",
    "q_c4_filters",
    "q_boilerplate",
    "q_curation_pipeline",
    "q_repetition_filter",
    "q_heaps_law",
    "q_stopword_profile",
    "q_text_normalize",
    "q_source_cap",
    "q_shard_assign",
    "q_kn_bigram_lm",
    "q_kn_doc_ppl",
    # round-10 widening: every further documents-only query that is a
    # total function of arbitrary text joins the hostile table.
    "q_batch_novelty",
    "q_bigram_ppl",
    "q_bpe_pairs",
    "q_ccnet_buckets",
    "q_corpus_stats",
    "q_dataset_manifest",
    "q_doc_chunk",
    "q_doc_length_bands",
    "q_editdist_refine",
    "q_keyword_extract",
    "q_lang_confusion",
    "q_minhash_eval",
    "q_mixture_sample",
    "q_mixture_weights",
    "q_ngram_novelty",
    "q_paragraph_dedup",
    "q_pmi_collocations",
    "q_quality_buckets",
    "q_readability",
    "q_repeated_substrings",
    "q_sample_stratified",
    "q_sequence_pack",
    "q_shingle_profile",
    "q_source_divergence",
    "q_source_fingerprint",
    "q_source_overlap",
    "q_source_quality_report",
    "q_tfidf_topterms",
    "q_token_budget_pack",
    "q_token_budget_plan",
    "q_train_test_split",
    "q_url_dedup",
    "q_vocab_coverage",
    # round-11 additions (documents-only, total on arbitrary text; the
    # all-'xx' lang column also exercises q_dsir_weights' zero-target
    # smoothing arm: t_b = 0 everywhere, p_target uniform 1/B).
    "q_dsir_weights",
    "q_rrf_fusion",
)


@pytest.fixture(scope="module")
def hostile_docs_sf(tmp_path_factory) -> str:
    path = tmp_path_factory.mktemp("hostile_docs")
    ids = sorted(_TEXTS)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "text": pa.array([_TEXTS[i] for i in ids], type=pa.string()),
                "lang": pa.array(["xx"] * len(ids), type=pa.string()),
                "source": pa.array(["hostile"] * len(ids), type=pa.string()),
                "n_chars": pa.array(
                    [len(_TEXTS[i]) for i in ids], type=pa.int64()
                ),
            }
        ),
        f"{path}/documents.parquet",
    )
    return str(path)


@pytest.fixture(scope="module")
def hostile_docs_duck(hostile_docs_sf):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{hostile_docs_sf}/documents.parquet'"
    )
    yield con
    con.close()


@pytest.mark.parametrize("name", _PARITY_QUERIES)
def test_hostile_docs_parity(spark, hostile_docs_sf, hostile_docs_duck, name):
    sdf = registry.QUERIES[name](spark, hostile_docs_sf).toPandas()
    ddf = hostile_docs_duck.execute(registry.ORACLES[name]).fetchdf()
    problems = compare(sdf, ddf)
    assert not problems, f"{name}: " + " | ".join(problems)


def test_vertical_tab_tokenizes_as_whitespace(spark, hostile_docs_sf):
    """The regression the shared WS class exists for: doc 1003's \\x0B must
    SPLIT the token stream (Java-\\s semantics) in the registered engine
    output — 6 whitespace tokens, not 5."""
    rows = {
        r.doc_id: r
        for r in registry.QUERIES["q_token_count"](
            spark, hostile_docs_sf
        ).collect()
    }
    assert rows[1003].ws_tokens == 6
    # empty / whitespace-only / single-word degenerates survive the tier
    assert rows[1008].ws_tokens == 1


def test_nfc_normalization_semantics(spark, hostile_docs_sf):
    """Beyond parity, the NFC answers themselves: decomposed rows change
    (and shrink to the composed codepoint count), precomposed and ASCII
    rows do not, and an NFD/NFC pair of the same word canonicalizes to
    the SAME hash — the property exact-dedup downstream relies on."""
    rows = {
        r.doc_id: r
        for r in registry.QUERIES["q_text_normalize"](
            spark, hostile_docs_sf
        ).collect()
    }
    assert rows[1016].nfc_changed is True
    assert rows[1017].nfc_changed is True
    assert rows[1018].nfc_changed is True
    assert rows[1001].nfc_changed is False  # ascii
    assert rows[1012].nfc_changed is False  # precomposed NFC already
    # "cafe\u0301" (5 cp) composes to "caf\u00e9" (4 cp): one cp shorter.
    assert rows[1016].n_chars_nfc == len(_TEXTS[1016]) - 1
    # decomposed Hangul syllable (3 jamo) composes to 1 syllable.
    assert rows[1017].n_chars_nfc == len(_TEXTS[1017]) - 2
    import hashlib
    import unicodedata

    want = hashlib.md5(
        unicodedata.normalize(
            "NFC", "caf\u0065\u0301 nfd decomposed accent words here"
        ).encode()
    ).hexdigest()
    assert rows[1016].canon_hash == want
