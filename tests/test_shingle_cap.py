"""High-df shingle cap drill (VERDICT r3 item #1; SCALE.md "the production
guard").

The degenerate corpus for inverted-index dedup: a shingle present in (nearly)
every document. Each of the 1200 docs here is 4 unique tokens + a 20-token
shared boilerplate footer, so 18 of its 22 shingles have df = 1200. Without
the cap, every one of the 719,400 doc pairs shares those 18 shingles —
jaccard 18/(22+22-18) ≈ 0.69 ≥ 0.5 — and ``dedup_ngram_jaccard`` "finds"
all-pairs near-duplication that is pure boilerplate (and the join fans out
toward n² on the way). With the cap (df > max(1000, 0.5%·n_docs) dropped),
boilerplate carries no signal, and only the one planted true near-dup pair
(docs 0 and 1, identical unique bodies) survives — in BOTH engines, because
the oracle applies the identical cap.

The sf0.01 corpus (500 docs, max possible df 500 < the 1000 floor) is
provably untouched by the cap, which is why every pre-existing shingle-op
oracle stays value-identical (tests/test_oracle_parity.py covers that).
"""
import shutil
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from industry_big_data_time_sequence_process_spark.operators.text import (
    _SHINGLE_DF_CAP_FLOOR, _shingles,
)
from industry_big_data_time_sequence_process_spark.registry import REGISTRY
from industry_big_data_time_sequence_process_spark.sources.io import (
    TABLES, load,
)

from .conftest import SF_T2
from .parity import assert_parity

N_DOCS = 1200
BOILER = ("all rights reserved worldwide this document is provided as is "
          "without warranty of any kind express or implied footer end")
TIME_CAP_S = 120.0


@pytest.fixture(scope="module")
def boiler_dir(tmp_path_factory):
    assert N_DOCS > _SHINGLE_DF_CAP_FLOOR  # the cap must actually bite
    d = tmp_path_factory.mktemp("boilerplate_sf")
    for t in TABLES:
        if t != "documents":
            shutil.copy(f"{SF_T2}/{t}.parquet", d / f"{t}.parquet")
    texts = []
    for i in range(N_DOCS):
        body = ("dupbody alpha beta gamma" if i < 2
                else f"u{i}a u{i}b u{i}c u{i}d")
        texts.append(f"{body} {BOILER}")
    tbl = pa.table({
        "doc_id": pa.array(range(N_DOCS), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
        "lang": pa.array(["en"] * N_DOCS, type=pa.string()),
        "source": pa.array(["boiler"] * N_DOCS, type=pa.string()),
        "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
    })
    pq.write_table(tbl, d / "documents.parquet")
    return str(d)


def test_cap_drops_boilerplate_keeps_signal(spark, boiler_dir):
    d = load(spark, boiler_dir, "documents")
    sh = _shingles(d)
    # pure-boilerplate shingles (df = N_DOCS > floor) must be gone
    assert sh.filter(sh.s == "all rights reserved").count() == 0
    # low-df shingles (unique bodies, df <= 2) must survive untouched
    assert sh.filter(sh.s == "dupbody alpha beta").count() == 2
    # per-doc surviving shingles: 22 raw - 18 pure-boilerplate = 4
    per_doc = sh.groupBy("doc_id").count().select("count").distinct().collect()
    assert [r["count"] for r in per_doc] == [4]


@pytest.mark.parametrize("key", ["dedup_ngram_jaccard", "dedup_near_minhash"])
def test_dedup_on_boilerplate_corpus(spark, boiler_dir, key):
    op = REGISTRY[key]
    t0 = time.monotonic()
    # cross-engine parity ON the degenerate corpus proves the oracle caps
    # identically; the wall-clock bound pins the fan-out guard
    assert_parity(spark, op.fn, op.oracle, boiler_dir, key=f"{key}@boiler")
    assert time.monotonic() - t0 < TIME_CAP_S
    rows = op.fn(spark, boiler_dir).collect()
    # exactly the planted pair; 719,400 boilerplate pairs would appear
    # here if the cap regressed
    assert [(r["doc1"], r["doc2"], r["jaccard"]) for r in rows] == [(0, 1, 1.0)]


def test_stream_ingest_dedup_cap_matches_oracle_on_boiler(spark, boiler_dir):
    """ADVICE r5 (medium): the streamed kill-list must equal the batch
    oracle even when shingles CROSS the df cap. Pre-r6 the stream
    re-derived caps per side (arrival batches ~150 docs, corpus 900 —
    both under the 1000 floor, so neither side dropped the boilerplate
    the full-corpus oracle drops): boilerplate-dominated signatures
    collided band-wide and the streamed kill-list exploded to ~270k
    spurious pairs. r6 computes ONE hot-shingle set from the full corpus
    (the index-build artifact) and anti-joins it on both sides, so the
    twin is exact by construction, not by cap-inertness."""
    op = REGISTRY["stream_ingest_dedup"]
    t0 = time.monotonic()
    assert_parity(spark, op.fn, op.oracle, boiler_dir,
                  key="stream_ingest_dedup@boiler")
    assert time.monotonic() - t0 < TIME_CAP_S
