"""Round-9 second wave semantics: the trained quality scorer, the
small-file compaction pass, and the tokenizer-faithful budget twins
(VERDICT r8 missing #2, #3 and next-round #6).

All three families are exact-oracled in tests/test_oracle_parity.py;
this file pins what the oracle can't see — that the model actually
SEPARATES junk from clean text, that compaction physically bounds the
file population and survives re-runs, and that the whitespace/BPE
budget twins genuinely diverge where a tokenizer would."""
import hashlib
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from industry_big_data_time_sequence_process_spark.registry import REGISTRY

from .conftest import SF_T2

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_documents(d, rows):
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "text": pa.array([r[1] for r in rows], type=pa.string()),
        "lang": pa.array(["en"] * len(rows), type=pa.string()),
        "source": pa.array(["fix"] * len(rows), type=pa.string()),
        "n_chars": pa.array([len(r[1]) for r in rows], type=pa.int64()),
    }), os.path.join(d, "documents.parquet"))


def _is_train(doc_id: int) -> bool:
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % 5 == 0


# ---- text_quality_model ---------------------------------------------------

_CLEAN_VOCAB = ["the", "quick", "brown", "fox", "jumps", "over", "lazy",
                "dogs", "while", "rivers", "flow", "under", "bright",
                "morning", "light"]


@pytest.fixture(scope="module")
def quality_dir(tmp_path_factory):
    """80 clean docs (natural-vocab, heuristic-passing) + 20 junk docs
    (distinct junk vocab, heuristic-failing via absurd token length).
    The md5 train slice provably contains both classes (asserted in the
    test), so the NB weights separate the two disjoint vocabularies."""
    d = tmp_path_factory.mktemp("quality_fix")
    rows = []
    for i in range(80):
        words = [_CLEAN_VOCAB[(i + j) % len(_CLEAN_VOCAB)]
                 for j in range(30)]
        rows.append((i, " ".join(words)))
    for i in range(20):
        junk = ["z" * 18, "q" * 20, "x" * 16][i % 3]
        rows.append((80 + i, " ".join([junk] * 25)))
    _write_documents(str(d), rows)
    return str(d)


def test_quality_model_separates_planted_junk(spark, quality_dir):
    rows = {r["doc_id"]: r for r in
            REGISTRY["text_quality_model"].fn(spark, quality_dir).collect()}
    assert len(rows) == 100
    # the deterministic split must see both classes, or training is vacuous
    assert any(_is_train(i) for i in range(80))
    assert any(_is_train(i) for i in range(80, 100))
    clean_scores = [rows[i]["score"] for i in range(80)]
    junk_scores = [rows[i]["score"] for i in range(80, 100)]
    # total separation on disjoint vocabularies: every junk doc below
    # every clean doc, and the sign agrees with the heuristic label
    assert max(junk_scores) < min(clean_scores), (
        max(junk_scores), min(clean_scores))
    for i in range(80):
        assert rows[i]["label_heuristic"] == 1
        assert rows[i]["pred_good"] == 1
    for i in range(80, 100):
        assert rows[i]["label_heuristic"] == 0
        assert rows[i]["pred_good"] == 0


def test_quality_model_holdout_agreement_on_corpus(spark):
    """The measured-agreement row VERDICT r8 #3 asked for: on the real
    sf0.01 corpus the model must agree with the heuristic filter on
    >= 80% of HOLDOUT documents (measured r9: 0.915) — distant
    supervision that generalizes, not a memorized train slice."""
    rows = REGISTRY["text_quality_model"].fn(spark, SF_T2).collect()
    hold = [r for r in rows if r["is_train"] == 0]
    train = [r for r in rows if r["is_train"] == 1]
    assert len(train) > 50 and len(hold) > 200
    agree = sum(1 for r in hold
                if r["pred_good"] == r["label_heuristic"]) / len(hold)
    assert agree >= 0.8, agree


# ---- sink_compact_small_files ---------------------------------------------


def test_compaction_identity_and_bounded_files(spark):
    out = REGISTRY["sink_compact_small_files"].fn(spark, SF_T2).collect()
    assert len(out) == 1
    r = out[0]
    assert r["value_match"] == 1
    assert r["files_bounded"] == 1
    assert r["rows_before"] == r["rows_after"] > 0
    assert r["n_batches"] == 8
    # physically: the compacted dir holds at most the target file count,
    # the staged dir holds the small-file population it replaced
    base = os.path.join(_REPO, ".scratch", "sink_compact_small_files")
    n_comp = len([f for f in os.listdir(os.path.join(base, "compacted"))
                  if f.endswith(".parquet")])
    n_staged = sum(len([f for f in files if f.endswith(".parquet")])
                   for _, _, files in os.walk(os.path.join(base, "staged")))
    assert n_comp <= 2
    assert n_staged > n_comp


def test_compaction_idempotent_after_partial_failure(spark):
    """The recovery pin (VERDICT r8 #4 done-criterion): re-running after
    a simulated mid-compaction crash (compacted dir deleted) produces
    the identical audit row — a deployment can schedule the pass
    blindly and re-run on any failure."""
    import shutil

    fn = REGISTRY["sink_compact_small_files"].fn
    first = fn(spark, SF_T2).collect()
    base = os.path.join(_REPO, ".scratch", "sink_compact_small_files")
    shutil.rmtree(os.path.join(base, "compacted"))
    second = fn(spark, SF_T2).collect()
    assert [tuple(r) for r in first] == [tuple(r) for r in second]


# ---- whitespace vs BPE budget divergence ----------------------------------


@pytest.fixture(scope="module")
def punct_dir(tmp_path_factory):
    """One punctuation-dense doc: 50 whitespace words, each 'ab,' — a
    whitespace budget of 64 says it fits untruncated; the BPE lexer
    bills 100 tokens ('ab' + ',') and truncates."""
    d = tmp_path_factory.mktemp("punct_fix")
    _write_documents(str(d), [(0, " ".join(["ab,"] * 50))])
    return str(d)


def test_budget_twins_diverge_on_punctuation(spark, punct_dir):
    ws = REGISTRY["doc_truncate_budget"].fn(spark, punct_dir).collect()[0]
    bpe = REGISTRY["doc_truncate_budget_bpe"].fn(spark,
                                                 punct_dir).collect()[0]
    assert ws["n_tokens"] == 50 and ws["truncated"] == 0
    assert bpe["n_bpe_tokens"] == 100 and bpe["truncated"] == 1
    assert bpe["n_kept"] == 64

    ws_chunks = REGISTRY["doc_chunk_sliding"].fn(spark, punct_dir).count()
    bpe_chunks = REGISTRY["doc_chunk_sliding_bpe"].fn(spark,
                                                      punct_dir).count()
    # (50-1)//24 + 1 = 3 whitespace chunks vs (100-1)//24 + 1 = 5
    assert ws_chunks == 3
    assert bpe_chunks == 5


def test_budget_twins_agree_on_plain_words(spark, quality_dir):
    """On punctuation-free lowercase words the two lexers coincide, so
    the twins must report identical token counts doc for doc — the
    divergence above is the punctuation, not a systematic bias."""
    ws = {r["doc_id"]: r["n_tokens"] for r in
          REGISTRY["doc_truncate_budget"].fn(spark, quality_dir).collect()}
    bpe = {r["doc_id"]: r["n_bpe_tokens"] for r in
           REGISTRY["doc_truncate_budget_bpe"].fn(spark,
                                                  quality_dir).collect()}
    assert ws == bpe


# ---- doc_pack_nextfit_bpe ---------------------------------------------------


@pytest.fixture(scope="module")
def punct_corpus_dir(tmp_path_factory):
    """24 punctuation-dense docs (40 words of 'ab,' each): 40 whitespace
    tokens but 80 BPE-lexer tokens per doc, so next-fit closes packs
    twice as fast under the BPE meter."""
    d = tmp_path_factory.mktemp("punct_corpus")
    _write_documents(str(d), [(i, " ".join(["ab,"] * 40))
                              for i in range(24)])
    return str(d)


def test_pack_twins_diverge_on_punctuation(spark, punct_corpus_dir):
    ws = REGISTRY["doc_pack_nextfit"].fn(spark, punct_corpus_dir).collect()
    bpe = REGISTRY["doc_pack_nextfit_bpe"].fn(spark,
                                              punct_corpus_dir).collect()
    # same documents, same shards — but the BPE meter bills every doc
    # double (40 ws words -> 80 lexer tokens), so the BPE packer needs
    # MORE packs and reports double the token mass
    assert sum(r["n_docs"] for r in ws) == 24
    assert sum(r["n_docs"] for r in bpe) == 24
    assert sum(r["tok_sum"] for r in ws) == 24 * 40
    assert sum(r["tok_sum"] for r in bpe) == 24 * 80
    assert len(bpe) > len(ws), (len(ws), len(bpe))
    # no pack overflows its budget under its own meter (single docs
    # under budget here, so fill <= 1 strictly)
    assert all(r["fill"] <= 1.0 for r in ws + bpe)


# ---- dedup_semantic_cluster_cc ----------------------------------------------


def test_semantic_cluster_cc_consistent_with_drop_list(spark):
    """Cross-op invariant on the real corpus: the CC op and the
    min-keeper drop list describe the SAME pair graph, so (a) every
    (vec_id, kept_id) drop edge lands in one component, (b) every
    cluster label is the component's minimum and itself a member,
    (c) the CC covers exactly the vectors that appear in at least one
    τ-pair (supersets the drop list's ids)."""
    cc = {r["vec_id"]: r["cluster_id"] for r in
          REGISTRY["dedup_semantic_cluster_cc"].fn(spark, SF_T2).collect()}
    drops = REGISTRY["dedup_semantic_embedding"].fn(spark, SF_T2).collect()
    assert drops and cc
    for r in drops:
        assert cc[r["vec_id"]] == cc[r["kept_id"]], r      # (a)
    labels = set(cc.values())
    for lbl in labels:
        members = [v for v, l in cc.items() if l == lbl]
        assert min(members) == lbl                          # (b)
    covered = {r["vec_id"] for r in drops} | {r["kept_id"] for r in drops}
    assert covered <= set(cc)                               # (c)
    # and every CC member really has some tau-mate: a singleton
    # component would mean the edge list invented a node
    from collections import Counter
    sizes = Counter(cc.values())
    assert all(sizes[cc[v]] >= 2 for v in cc)


# ---- sim_twolevel_recall_eval ----------------------------------------------


def test_twolevel_eval_quantifies_the_trade(spark):
    """The split's self-measurement must be internally consistent and
    show the trade it exists to expose: strictly fewer candidate pairs
    than single-level, found pairs a subset (recall <= 1) but >= 0.7 at
    the deliberately over-tight occ=8 dial (measured sf0.01 with the
    r10 hard envelope: cand_ratio 0.58, pair_recall 0.794)."""
    r = REGISTRY["sim_twolevel_recall_eval"].fn(spark, SF_T2).collect()
    assert len(r) == 1
    r = r[0]
    assert r["cand_pairs_two"] < r["cand_pairs_single"]
    assert r["found_two"] <= r["found_single"]
    assert r["found_two"] <= r["cand_pairs_two"]
    assert r["found_single"] <= r["cand_pairs_single"]
    assert r["pair_recall"] >= 0.7, r["pair_recall"]
    assert r["cand_ratio"] < 0.8, r["cand_ratio"]


# ---- text_quality_calibration ----------------------------------------------


def test_quality_calibration_structure_and_monotonicity(spark):
    """Deciles are exact (counts differ by at most 1, cover the corpus)
    and, because the ranking IS the score order, per-decile mean score
    must rise monotonically; the heuristic-good share must be higher in
    the top decile than the bottom (the model orders junk first)."""
    rows = sorted(REGISTRY["text_quality_calibration"]
                  .fn(spark, SF_T2).collect(),
                  key=lambda r: r["decile"])
    assert [r["decile"] for r in rows] == list(range(1, 11))
    sizes = [r["n_docs"] for r in rows]
    assert sum(sizes) == 500
    assert max(sizes) - min(sizes) <= 1
    scores = [r["avg_score"] for r in rows]
    assert scores == sorted(scores), scores
    share = [r["n_good_heuristic"] / r["n_docs"] for r in rows]
    assert share[-1] > share[0]
    assert share[-1] == 1.0


# ---- stream_quality_scores --------------------------------------------------


def test_stream_quality_scores_cover_arrivals_once(spark):
    """Every arrival (the top-10% doc_id slice) is scored exactly once
    across the micro-batches, nothing else leaks into the sink, and the
    scores are finite log-odds with a sign-consistent keep flag."""
    import math

    import pyarrow.parquet as pq_

    n = pq_.read_metadata(os.path.join(SF_T2, "documents.parquet")).num_rows
    cut = math.floor(0.9 * n)
    rows = REGISTRY["stream_quality_scores"].fn(spark, SF_T2).collect()
    ids = [r["doc_id"] for r in rows]
    assert sorted(ids) == list(range(cut, n))
    for r in rows:
        assert r["n_tokens"] > 0
        assert r["pred_good"] == int(r["score"] >= 0)
