"""Semantic tests for the ninth round-7 wave (SURVEY.md §2.26) — beyond
oracle parity: MTBF hand recomputation, full alarm-flood episode
replication, and a by-hand Western Electric rules replay."""
import datetime
import math

from pyspark.sql import functions as F

from industry_big_data_time_sequence_process_spark.operators import timeseries
from industry_big_data_time_sequence_process_spark.sources.io import load

from .conftest import SF_T2


def _utc_literal(*ymd):
    """A UTC calendar instant rendered the way PySpark renders collected
    timestamps (naive, in the PROCESS timezone) — so comparisons against
    collected values hold on non-UTC machines too."""
    import calendar
    import datetime as _dt
    return _dt.datetime.fromtimestamp(
        calendar.timegm(_dt.datetime(*ymd).timetuple()))


def test_mtbf_recompute_one_user(spark):
    df = timeseries.ts_mtbf(spark, SF_T2)
    rows = {r["user_id"]: r for r in df.collect()}
    # every channel with >= 2 failures carries an MTBF; 1-failure
    # channels carry NULL
    for r in rows.values():
        assert (r["mtbf_hours"] is None) == (r["n_failures"] < 2)
        # failures_per_day is NULL only for zero-span units
        assert r["failures_per_day"] is None or r["failures_per_day"] > 0
    uid = max(rows, key=lambda u: rows[u]["n_failures"])
    ev = (load(spark, SF_T2, "events")
          .filter(F.col("user_id") == uid)
          .select("ts", "event_id", "event_type").collect())
    errs = sorted((r["ts"], r["event_id"]) for r in ev
                  if r["event_type"] == "error")
    gaps = [(b[0] - a[0]).total_seconds() * 1_000_000
            for a, b in zip(errs, errs[1:])]
    span = (max(r["ts"] for r in ev)
            - min(r["ts"] for r in ev)).total_seconds() * 1_000_000
    got = rows[uid]
    assert got["n_failures"] == len(errs)
    want_mtbf = sum(gaps) / len(gaps) / 3_600_000_000
    assert abs(got["mtbf_hours"] - round(want_mtbf, 6)) < 1e-6
    want_rate = len(errs) * 86_400_000_000.0 / span
    assert abs(got["failures_per_day"] - round(want_rate, 6)) < 1e-6


def test_alarm_flood_full_replication(spark):
    rows = sorted(timeseries.ts_alarm_flood(spark, SF_T2).collect(),
                  key=lambda r: r["flood_start"])
    errs = (load(spark, SF_T2, "events")
            .filter(F.col("event_type") == "error")
            .select("ts").collect())
    per_w = {}
    for r in errs:
        w = int(r["ts"].timestamp() * 1_000_000) // 600_000_000
        per_w[w] = per_w.get(w, 0) + 1
    flood = sorted(w for w, n in per_w.items() if n >= 3)
    episodes = []
    for w in flood:
        if episodes and w == episodes[-1][-1] + 1:
            episodes[-1].append(w)
        else:
            episodes.append([w])
    assert len(rows) == len(episodes)
    for got, ws in zip(rows, episodes):
        start = datetime.datetime.fromtimestamp(ws[0] * 600)
        end = datetime.datetime.fromtimestamp((ws[-1] + 1) * 600)
        assert got["flood_start"] == start
        assert got["flood_end"] == end
        assert got["n_buckets"] == len(ws)
        assert got["n_alarms"] == sum(per_w[w] for w in ws)
        assert got["peak_bucket_alarms"] == max(per_w[w] for w in ws)
        assert got["peak_bucket_alarms"] >= 3
    # episodes are disjoint and ordered
    for a, b in zip(rows, rows[1:]):
        assert a["flood_end"] < b["flood_start"]


def test_western_rules_replay_one_user(spark):
    df = timeseries.ts_spc_rules_western(spark, SF_T2).cache()
    try:
        rows = df.collect()
        assert rows
        # every emitted row fires at least one rule
        assert all(r["rule1"] + r["rule2"] + r["rule3"] + r["rule4"] >= 1
                   for r in rows)
        uid = rows[0]["user_id"]
        got = {r["event_id"]: r for r in rows if r["user_id"] == uid}
        cut = _utc_literal(2024, 1, 8)
        ev = (load(spark, SF_T2, "events")
              .filter(F.col("user_id") == uid)
              .select("ts", "event_id", "value").collect())
        base = [r["value"] for r in ev if r["ts"] < cut]
        mu = sum(base) / len(base)
        sd = math.sqrt(sum((v - mu) ** 2 for v in base) / (len(base) - 1))
        assert sd > 0
        mon = sorted(((r["ts"], r["event_id"], r["value"]) for r in ev
                      if r["ts"] >= cut))
        want = {}
        for i, (_ts, eid, v) in enumerate(mon):
            win = lambda k: [x[2] for x in mon[max(0, i - k + 1):i + 1]]
            w3, w5, w8 = win(3), win(5), win(8)
            r1 = int(v > mu + 3 * sd or v < mu - 3 * sd)
            r2 = int(len(w3) == 3
                     and (sum(1 for x in w3 if x > mu + 2 * sd) >= 2
                          or sum(1 for x in w3 if x < mu - 2 * sd) >= 2))
            r3 = int(len(w5) == 5
                     and (sum(1 for x in w5 if x > mu + sd) >= 4
                          or sum(1 for x in w5 if x < mu - sd) >= 4))
            r4 = int(len(w8) == 8
                     and (all(x > mu for x in w8)
                          or all(x < mu for x in w8)))
            if r1 or r2 or r3 or r4:
                want[eid] = (r1, r2, r3, r4)
        assert set(got) == set(want)
        for eid, flags in want.items():
            g = got[eid]
            assert (g["rule1"], g["rule2"], g["rule3"], g["rule4"]) \
                == flags
    finally:
        df.unpersist()


def test_western_rules_catch_drift_raw_z_misses(spark):
    """Rules 2-4 must fire somewhere rule 1 doesn't — the entire point
    of run rules is catching drifts below the 3-sigma bar."""
    df = timeseries.ts_spc_rules_western(spark, SF_T2)
    n_runs_only = df.where((F.col("rule1") == 0)
                           & ((F.col("rule2") == 1) | (F.col("rule3") == 1)
                              | (F.col("rule4") == 1))).count()
    assert n_runs_only > 0
