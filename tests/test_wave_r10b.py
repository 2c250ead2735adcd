"""Round-10 second wave semantics (SURVEY.md §2.31): what the exact
oracles in tests/test_oracle_parity.py can't see —

- `text_substring_dedup`: planted shared-span corpus (the span is found,
  the unique doc isn't, the sub-W doc reports the NULL path);
- `sample_weighted_reservoir`: per-key counts are exactly min(K, n), and
  a planted heavy-weight event is ALWAYS drawn first (the weighting is
  real, not decorative);
- `ts_croston_sba`: closed-form check on a constant daily-demand user
  (z -> d, p -> 1) and a hand-stepped lumpy user;
- `ts_anomaly_sigma_clip`: the masked-outlier story — the second
  outlier's one-shot z is BELOW the cut (so `ts_anomaly_zscore` at the
  same threshold misses it) and round 2 still removes it;
- `agg_dp_laplace_counts`: independent python recomputation of the
  seeded Laplace noise;
- `feat_isotonic_calibration`: the minimax closed form equals an
  independent python pool-adjacent-violators implementation, is
  monotone, and preserves the weighted total (the PAV invariants).
"""
import hashlib
import math
import shutil

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from industry_big_data_time_sequence_process_spark.registry import REGISTRY
from industry_big_data_time_sequence_process_spark.sources.io import TABLES

from .conftest import SF_SMOKE, SF_T2

DAY_US = 86_400_000_000
T0 = 1_704_067_200_000_000  # 2024-01-01 00:00:00 UTC, microseconds

_EVENT_SCHEMA = pa.schema([
    ("event_id", pa.int64()), ("ts", pa.timestamp("us")),
    ("user_id", pa.int64()), ("event_type", pa.string()),
    ("value", pa.float64()), ("props", pa.string()),
])

_DOC_SCHEMA = pa.schema([
    ("doc_id", pa.int64()), ("text", pa.string()), ("lang", pa.string()),
    ("source", pa.string()), ("n_chars", pa.int64()),
])


def _corpus(tmp_path_factory, name, *, events=None, documents=None):
    """A test corpus: SF_SMOKE tables with events/documents replaced."""
    d = tmp_path_factory.mktemp(name)
    for t in TABLES:
        if (t == "events" and events is not None) or (
                t == "documents" and documents is not None):
            continue
        shutil.copy(f"{SF_SMOKE}/{t}.parquet", d / f"{t}.parquet")
    if events is not None:
        pq.write_table(pa.table(events, schema=_EVENT_SCHEMA),
                       d / "events.parquet")
    if documents is not None:
        pq.write_table(pa.table(documents, schema=_DOC_SCHEMA),
                       d / "documents.parquet")
    return str(d)


# ---------------------------------------------------------------------------
# text_substring_dedup
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def span_corpus(tmp_path_factory):
    span = " ".join(f"s{i}" for i in range(12))       # shared 12-token span
    texts = [
        "u1 u2 " + span + " v1 v2",                    # 16 toks, 7 windows
        "w1 w2 w3 " + span,                            # 15 toks, 6 windows
        " ".join(f"q{i}" for i in range(15)),          # unique, 6 windows
        "t1 t2 t3 t4 t5",                              # sub-W: 0 windows
    ]
    docs = {
        "doc_id": [1, 2, 3, 4],
        "text": texts,
        "lang": ["en"] * 4,
        "source": ["test"] * 4,
        "n_chars": [len(t) for t in texts],
    }
    return _corpus(tmp_path_factory, "span_corpus", documents=docs)


def test_substring_dedup_planted_span(spark, span_corpus):
    """A 12-token span shared by docs 1 and 2 yields exactly the 3 fully
    interior windows as duplicated in each; the unique doc has none; the
    4-token doc takes the zero-window NULL path."""
    rows = {r["doc_id"]: r for r in
            REGISTRY["text_substring_dedup"].fn(spark, span_corpus)
            .collect()}
    assert (rows[1]["n_windows"], rows[1]["n_dup_windows"]) == (7, 3)
    assert rows[1]["flagged"] == 0
    assert (rows[2]["n_windows"], rows[2]["n_dup_windows"]) == (6, 3)
    assert rows[2]["flagged"] == 1          # 3/6 = exactly the 50% cut
    assert rows[2]["dup_frac"] == 0.5
    assert (rows[3]["n_windows"], rows[3]["n_dup_windows"]) == (6, 0)
    assert (rows[4]["n_windows"], rows[4]["n_dup_windows"]) == (0, 0)
    assert rows[4]["dup_frac"] is None and rows[4]["flagged"] == 0


# ---------------------------------------------------------------------------
# sample_weighted_reservoir
# ---------------------------------------------------------------------------


def test_weighted_reservoir_per_key_counts(spark):
    """Exactly min(K, n_user) rows per user, ranks dense 1..k."""
    out = REGISTRY["sample_weighted_reservoir"].fn(spark, SF_T2)
    got = {r["user_id"]: (r["n"], r["mx"]) for r in
           out.groupBy("user_id")
              .agg(F.count("*").alias("n"), F.max("draw_rank").alias("mx"))
              .collect()}
    truth = dict(duckdb.sql(
        f"SELECT user_id, least(count(*), 5) FROM "
        f"'{SF_T2}/events.parquet' GROUP BY user_id").fetchall())
    assert len(got) == len(truth)
    for u, k in truth.items():
        assert got[u] == (k, k), f"user {u}: {got[u]} != ({k},{k})"


@pytest.fixture(scope="module")
def heavy_corpus(tmp_path_factory):
    n = 100
    events = {
        "event_id": list(range(1, n + 1)),
        "ts": [T0 + i * 1_000_000 for i in range(n)],
        "user_id": [7] * n,
        "event_type": ["click"] * n,
        # event 1 carries weight 1e9; the rest weight 1 (value 0)
        "value": [1e9 - 1.0] + [0.0] * (n - 1),
        "props": ["{}"] * n,
    }
    return _corpus(tmp_path_factory, "heavy_corpus", events=events)


def test_weighted_reservoir_heavy_event_always_first(spark, heavy_corpus):
    """w = 1e9 drives the exp-clock key below the 1e-6 grid (key_q = 0)
    while a weight-1 event lands there only with prob ~1e-6 — the heavy
    event is deterministically drawn, and drawn first."""
    out = (REGISTRY["sample_weighted_reservoir"].fn(spark, heavy_corpus)
           .orderBy("draw_rank").collect())
    assert len(out) == 5
    assert out[0]["event_id"] == 1 and out[0]["draw_rank"] == 1
    assert out[0]["wkey_q"] == 0


# ---------------------------------------------------------------------------
# ts_croston_sba
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def demand_corpus(tmp_path_factory):
    rows = []
    # user 1: constant daily demand 5.00 for 10 days (smooth series)
    for i in range(10):
        rows.append((100 + i, T0 + i * DAY_US, 1, "purchase", 5.0))
    # user 2: lumpy — demands on days 0, 3, 9 of sizes 2, 4, 8
    for eid, day, v in [(200, 0, 2.0), (201, 3, 4.0), (202, 9, 8.0)]:
        rows.append((eid, T0 + day * DAY_US, 2, "purchase", v))
    events = {
        "event_id": [r[0] for r in rows],
        "ts": [r[1] for r in rows],
        "user_id": [r[2] for r in rows],
        "event_type": [r[3] for r in rows],
        "value": [r[4] for r in rows],
        "props": ["{}"] * len(rows),
    }
    return _corpus(tmp_path_factory, "demand_corpus", events=events)


def test_croston_constant_and_lumpy(spark, demand_corpus):
    rows = {r["user_id"]: r for r in
            REGISTRY["ts_croston_sba"].fn(spark, demand_corpus).collect()}
    # constant series: z is exactly d, p exactly 1 -> forecast = demand
    r1 = rows[1]
    assert r1["n_demands"] == 10
    assert r1["z_smooth"] == 5.0 and r1["p_smooth"] == 1.0
    assert r1["croston"] == 5.0 and r1["sba"] == 4.5
    # lumpy series: hand-step the recursion with the same literals/order
    z = 0.8 * (0.8 * 2.0 + 0.2 * 4.0) + 0.2 * 8.0
    p = 0.8 * (0.8 * 1.0 + 0.2 * 3.0) + 0.2 * 6.0
    r2 = rows[2]
    assert r2["n_demands"] == 3
    assert r2["z_smooth"] == round(z, 6)
    assert r2["p_smooth"] == round(p, 6)
    assert r2["croston"] == round(z / p, 6)
    assert r2["sba"] == round(0.9 * (z / p), 6)


# ---------------------------------------------------------------------------
# ts_anomaly_sigma_clip
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def masked_corpus(tmp_path_factory):
    vals = [round(4.9 + 0.01 * i, 2) for i in range(20)] + [100.0, 60.0]
    n = len(vals)
    events = {
        "event_id": list(range(1, n + 1)),
        "ts": [T0 + i * 1_000_000 for i in range(n)],
        "user_id": [1] * n,
        "event_type": ["m"] * n,
        "value": vals,
        "props": ["{}"] * n,
    }
    return _corpus(tmp_path_factory, "masked_corpus", events=events)


def test_sigma_clip_unmasks_second_outlier(spark, masked_corpus):
    """One-shot z of the 60.0 point is ~2.10 < 2.5 (MASKED by the 100.0
    point inflating sigma — `ts_anomaly_zscore` at the same cut misses
    it); the clip removes 100.0 in round 1, 60.0 in round 2 (z ~4.36),
    and nothing in round 3."""
    out = sorted(REGISTRY["ts_anomaly_sigma_clip"].fn(spark, masked_corpus)
                 .collect(), key=lambda r: r["clip_round"])
    assert len(out) == 2
    assert (out[0]["clip_round"], out[0]["value"]) == (1, 100.0)
    assert (out[1]["clip_round"], out[1]["value"]) == (2, 60.0)
    assert out[0]["z"] > 2.5 and out[1]["z"] > 2.5
    # the masking premise, recomputed independently
    vals = [round(4.9 + 0.01 * i, 2) for i in range(20)] + [100.0, 60.0]
    m = sum(vals) / len(vals)
    sd = math.sqrt(sum((v - m) ** 2 for v in vals) / (len(vals) - 1))
    assert (60.0 - m) / sd < 2.5


def test_sigma_clip_constant_channel_removes_nothing(spark):
    """sf0.001's degenerate slices aside: a constant channel has sd = 0
    -> z NULL -> no removals (guard, not crash). Uses the smoke corpus;
    the assertion is just completion + bounded output."""
    out = REGISTRY["ts_anomaly_sigma_clip"].fn(spark, SF_SMOKE).collect()
    assert all(r["clip_round"] in (1, 2, 3) for r in out)
    per_round_channel = {(r["event_type"], r["clip_round"]) for r in out}
    assert len(per_round_channel) == len(out)  # <= 1 removal per (ch, round)


# ---------------------------------------------------------------------------
# agg_dp_laplace_counts
# ---------------------------------------------------------------------------


def test_dp_laplace_noise_recomputed(spark):
    """Recompute the seeded Laplace draw independently (hashlib + math)
    and match the released values to the 1e-6 rounding."""
    out = {r["event_type"]: r for r in
           REGISTRY["agg_dp_laplace_counts"].fn(spark, SF_T2).collect()}
    truth = dict(duckdb.sql(
        f"SELECT event_type, count(*) FROM '{SF_T2}/events.parquet' "
        f"GROUP BY event_type").fetchall())
    assert set(out) == set(truth)
    for et, n in truth.items():
        h = int(hashlib.md5(f"dp:{et}".encode()).hexdigest()[:8], 16)
        u = (h + 1) / 4294967297.0
        noise = ((-1.0 if u >= 0.5 else 1.0)
                 * math.log(1.0 - 2.0 * abs(u - 0.5)))
        assert out[et]["epsilon"] == 1.0
        assert abs(out[et]["noisy_count"] - (n + noise)) < 2e-6
        # the release actually perturbs (no event_type noise is ~0 here)
        assert out[et]["noisy_count"] != n


# ---------------------------------------------------------------------------
# feat_isotonic_calibration
# ---------------------------------------------------------------------------


def _pav(ns, ps):
    """Independent pool-adjacent-violators on (count, positives) bins."""
    blocks = [[n, p] for n, p in zip(ns, ps)]  # [weight, positives]
    i = 0
    while i < len(blocks) - 1:
        if (blocks[i][1] / blocks[i][0]
                > blocks[i + 1][1] / blocks[i + 1][0]):
            blocks[i][0] += blocks[i + 1][0]
            blocks[i][1] += blocks[i + 1][1]
            del blocks[i + 1]
            i = max(i - 1, 0)
        else:
            i += 1
    out = []
    for w, p in blocks:
        out.extend([p / w] * 0)  # placeholder; expanded below by weight
    # expand back to per-bin values by replaying bin widths
    fitted, bi = [], 0
    for w, p in blocks:
        consumed = 0
        while consumed < w:
            consumed += ns[bi]
            fitted.append(p / w)
            bi += 1
    return fitted


def test_isotonic_matches_independent_pav(spark):
    rows = sorted(REGISTRY["feat_isotonic_calibration"].fn(spark, SF_T2)
                  .collect(), key=lambda r: r["bin"])
    ns = [r["n"] for r in rows]
    ps = [r["pos"] for r in rows]
    fitted = _pav(ns, ps)
    for r, f in zip(rows, fitted):
        assert abs(r["iso_rate"] - f) < 2e-6, (r["bin"], r["iso_rate"], f)
    # monotone non-decreasing
    iso = [r["iso_rate"] for r in rows]
    assert all(a <= b for a, b in zip(iso, iso[1:]))
    # PAV preserves the weighted total: sum n*iso == sum pos
    assert abs(sum(n * z for n, z in zip(ns, iso)) - sum(ps)) < 1e-2
    # raw rates really are non-monotone somewhere (else the op is vacuous
    # on this corpus and the pins above prove nothing)
    raw = [r["raw_rate"] for r in rows]
    assert any(a > b for a, b in zip(raw, raw[1:]))
