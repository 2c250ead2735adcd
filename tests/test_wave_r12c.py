"""Round-12 BPE-64 encoder: the one-pass Arrow encoder must be
value-identical to the iterative-replace path at the same K.

`doc_tokenize_bpe64` collects the trained 64-rule table and applies it
per pretoken with Python str.replace inside mapInPandas; the K=8 family
applies rules as chained column-level F.replace over an array column.
Both claim left-to-right non-overlapping replace semantics — this pin
PROVES it by running both paths at K=64 over a long-word fixture built
to exercise deep merge chains, greedy overlaps and rule interactions,
and comparing the full merged streams doc-for-doc.
"""
import pytest
from pyspark.sql import functions as F

from industry_big_data_time_sequence_process_spark.operators.text import (
    _BPE64_K,
    _bpe_merge_frames,
    _bpe_merged_tokens,
)
from industry_big_data_time_sequence_process_spark.registry import REGISTRY
from industry_big_data_time_sequence_process_spark.sources.io import load

from .test_wave_r10b import _corpus

#: long-word-dense texts: repeated chars force deep merge towers
#: (a->aa->aaaa->aaaaaaaa), alternations exercise greedy-overlap
#: resolution, digits/punctuation exercise the non-letter lexer arms.
_TEXTS = [
    "aaaaaaaaaaaaaaaa bbbbbbbbbbbbbbbb abababababababab",
    "cdcdcdcdcdcdcdcd aaaabbbbaaaabbbb 1212121212121212",
    "internationalization antidisestablishmentarianism",
    "zzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzz yyyyyyyyyyyyyyyy!!!!",
    "aaa aaaa aaaaa aaaaaa aaaaaaa aaaaaaaa aaaaaaaaa",
    "the quick brown fox jumps over the lazy dog 42 times",
    "mississippi mississippi mississippi bookkeeper",
    "0000000000000000 9999999999999999 @@@@@@@@,,,,,,,,",
]


@pytest.fixture(scope="module")
def bpe64_corpus(tmp_path_factory):
    docs = {
        "doc_id": list(range(1, len(_TEXTS) + 1)),
        "text": list(_TEXTS),
        "lang": ["en"] * len(_TEXTS),
        "source": ["planted"] * len(_TEXTS),
        "n_chars": [len(t) for t in _TEXTS],
    }
    return _corpus(tmp_path_factory, "bpe64_fixture", documents=docs)


def test_arrow_encoder_equals_iterative_replace_at_k64(spark,
                                                       bpe64_corpus):
    fast = {r["doc_id"]: (r["n_pretokens"], r["n_merged_tokens"],
                          r["tok_md5"])
            for r in REGISTRY["doc_tokenize_bpe64"]
            .fn(spark, bpe64_corpus).collect()}

    d = load(spark, bpe64_corpus, "documents")
    bests = _bpe_merge_frames(spark, d, _BPE64_K)
    slow = {r["doc_id"]: (r["n_pretokens"], r["n_merged_tokens"],
                          r["tok_md5"])
            for r in _bpe_merged_tokens(d, bests).select(
                "doc_id",
                F.size(F.regexp_extract_all(
                    "text", F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0))
                 .cast("long").alias("n_pretokens"),
                F.size("toks").cast("long").alias("n_merged_tokens"),
                F.md5(F.array_join("toks", " ")).alias("tok_md5"))
            .collect()}

    assert fast == slow
    # the fixture actually exercised merges: the merged stream sits far
    # below the char count (64 merges collapse the repeated-char towers
    # — some all the way back to ONE symbol per pretoken, so m == p is
    # legitimate; m < p is impossible since every pretoken yields >= 1)
    assert all(m >= p for p, m, _ in fast.values())
    total_chars = sum(len(t.replace(" ", "")) for t in _TEXTS)
    assert sum(m for _, m, _ in fast.values()) < total_chars / 2


def test_bpe64_merge_table_is_deeper_than_k8(spark, bpe64_corpus):
    """K=64 must genuinely out-merge the K=8 family on the fixture —
    the whole point of the realistic merge count (no-op sentinel rounds
    excluded from the comparison)."""
    d = load(spark, bpe64_corpus, "documents")
    real64 = sum(1 for b in _bpe_merge_frames(spark, d, _BPE64_K)
                 if b.collect()[0]["pc"] > 0)
    assert real64 > 8
