"""Round-12 language-ID semantics (`text_langid_model`).

The sf corpora CANNOT prove the classifier learns: their documents are
the same operator-word salad regardless of the lang column (verified —
holdout agreement sits at the 5-class chance floor there, which is
exactly the audit signal the op exists to surface: the column is
untrustworthy for that corpus). These pins run the op on a PLANTED
corpus whose three "languages" use disjoint character inventories:

- holdout accuracy is 1.0 on separable data (the NB actually learns
  from the 20% md5 train slice);
- prediction is CONTENT-only: rewriting the lang column of every
  holdout doc to a lie flips `agree`, not `pred_lang`;
- a zero-ngram doc (text shorter than the n-gram order) still
  classifies — by prior alone, margin 0 under exactly-balanced train
  classes, lexicographic tie-break.
"""
import hashlib

import pytest
from pyspark.sql import functions as F

from industry_big_data_time_sequence_process_spark.registry import REGISTRY

from .test_wave_r10b import _corpus

_LANGS = ("aa", "bb", "cc")
#: disjoint character inventories per planted language
_VOCAB = {"aa": "abcdefghijklm", "bb": "nopqrstuvwxyz", "cc": "0123456789"}


def _is_train(doc_id: int) -> bool:
    hv = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)
    return hv % 5 == 0


def _text(lang: str, doc_id: int, n_words: int = 30) -> str:
    v = _VOCAB[lang]
    return " ".join(
        "".join(v[(doc_id * 7 + j * 3 + t) % len(v)] for t in range(4))
        for j in range(n_words))


@pytest.fixture(scope="module")
def langid_corpus(tmp_path_factory):
    """90 candidate ids partitioned by the op's own md5 slice, langs
    assigned round-robin WITHIN each partition so the train slice holds
    exactly equal class counts (equal priors — the zero-ngram doc then
    ties at margin 0). Doc 9001 is the 2-char zero-ngram probe."""
    ids = list(range(1, 91))
    train = [i for i in ids if _is_train(i)]
    hold = [i for i in ids if not _is_train(i)]
    k = min(len(train) // 3, 5)
    train = train[:3 * k]            # exactly k train docs per class
    hold = hold[:30]
    rows = []
    for group in (train, hold):
        for pos, i in enumerate(group):
            lang = _LANGS[pos % 3]
            t = _text(lang, i)
            rows.append((i, t, lang, "planted", len(t)))
    assert not _is_train(9001)
    rows.append((9001, "ab", "aa", "planted", 2))
    docs = {
        "doc_id": [r[0] for r in rows], "text": [r[1] for r in rows],
        "lang": [r[2] for r in rows], "source": [r[3] for r in rows],
        "n_chars": [r[4] for r in rows],
    }
    return _corpus(tmp_path_factory, "langid_sep", documents=docs), hold


def test_langid_learns_on_separable_corpus(spark, langid_corpus):
    d, hold = langid_corpus
    out = REGISTRY["text_langid_model"].fn(spark, d)
    res = {r["doc_id"]: r for r in out.collect()}
    # every holdout doc with content classifies correctly, decisively
    for i in hold:
        assert res[i]["is_train"] == 0
        assert res[i]["agree"] == 1, (i, res[i])
        assert res[i]["margin"] > 0
    # train slice too (sanity: the model at least memorizes)
    assert all(r["agree"] == 1 for r in res.values()
               if r["is_train"] == 1)


def test_langid_zero_ngram_doc_classifies_by_prior(spark, langid_corpus):
    d, _ = langid_corpus
    out = REGISTRY["text_langid_model"].fn(spark, d)
    probe = out.filter(F.col("doc_id") == 9001).collect()[0]
    assert probe["n_ngrams"] == 0
    # balanced train classes -> equal priors -> exact tie, margin 0,
    # lexicographically first class wins
    assert probe["margin"] == 0.0
    assert probe["pred_lang"] == "aa"


def test_langid_prediction_is_content_only(spark, langid_corpus,
                                           tmp_path_factory):
    """Rewriting the lang COLUMN of the holdout docs must flip `agree`
    and leave `pred_lang` untouched — the column feeds labels on the
    train slice only, never the features."""
    d, hold = langid_corpus
    base = {r["doc_id"]: r
            for r in REGISTRY["text_langid_model"].fn(spark, d).collect()}

    import pyarrow.parquet as pq
    t = pq.read_table(f"{d}/documents.parquet").to_pydict()
    lie = {_LANGS[i]: _LANGS[(i + 1) % 3] for i in range(3)}
    t["lang"] = [lie[g] if (i in set(hold)) else g
                 for i, g in zip(t["doc_id"], t["lang"])]
    d2 = _corpus(tmp_path_factory, "langid_lied", documents=t)
    lied = {r["doc_id"]: r
            for r in REGISTRY["text_langid_model"].fn(spark, d2).collect()}
    for i in hold:
        assert lied[i]["pred_lang"] == base[i]["pred_lang"]
        assert lied[i]["agree"] == 0 and base[i]["agree"] == 1
