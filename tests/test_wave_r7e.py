"""Semantic tests for the fifth round-7 wave (SURVEY.md §2.22) — beyond
oracle parity: runs-test invariants against a hand recomputation,
strength-bounds + reconstruction consistency for the STL diagnostic,
PK-audit ground truth, label-propagation community structure on a
planted graph, and truncation-budget byte fidelity."""
from pyspark.sql import functions as F

from industry_big_data_time_sequence_process_spark.operators import (
    relational, text, timeseries,
)
from industry_big_data_time_sequence_process_spark.sources.io import load

from .conftest import SF_T2


def test_runs_test_recompute_one_user(spark):
    df = timeseries.ts_runs_test(spark, SF_T2)
    row = df.orderBy(F.col("n_runs").desc(), "user_id").first()
    ev = (load(spark, SF_T2, "events")
          .filter(F.col("user_id") == row["user_id"])
          .orderBy("ts", "event_id")
          .select((F.col("value").cast("decimal(18,2)") * 100)
                  .cast("long").alias("v")).collect())
    vals = [r["v"] for r in ev]
    signs = [1 if b > a else -1 for a, b in zip(vals, vals[1:]) if b != a]
    n_pos = sum(1 for s in signs if s == 1)
    n_neg = len(signs) - n_pos
    runs = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
    assert (row["n_pos"], row["n_neg"], row["n_runs"]) == \
        (n_pos, n_neg, runs)


def test_runs_test_counts_consistent(spark):
    df = timeseries.ts_runs_test(spark, SF_T2).cache()
    try:
        # runs can never exceed the number of signed deltas, and at
        # least 1 run exists whenever any delta does
        bad = df.filter(
            (F.col("n_runs") > F.col("n_pos") + F.col("n_neg"))
            | ((F.col("n_pos") + F.col("n_neg") > 0)
               & (F.col("n_runs") < 1))).count()
        assert bad == 0
    finally:
        df.unpersist()


def test_seasonal_strength_bounds(spark):
    df = timeseries.ts_seasonal_strength(spark, SF_T2).cache()
    try:
        assert df.filter((F.col("seasonal_strength") < 0)
                         | (F.col("seasonal_strength") > 1)).count() == 0
        assert df.filter((F.col("trend_strength") < 0)
                         | (F.col("trend_strength") > 1)).count() == 0
        # one row per channel that has any hourly data
        users = load(spark, SF_T2, "events").select("user_id").distinct()
        assert df.count() == users.count()
    finally:
        df.unpersist()


def test_pk_uniqueness_ground_truth(spark):
    rows = {r["table_name"]: r for r in
            relational.dq_pk_uniqueness(spark, SF_T2).collect()}
    assert len(rows) == 8
    # the driver corpus has unique PKs everywhere EXCEPT lineitem, whose
    # synthetic (l_orderkey, l_linenumber) pairs genuinely repeat — the
    # audit op exists to surface exactly this
    for t, r in rows.items():
        if t == "lineitem":
            assert r["dup_rows"] > 0 and r["is_unique"] == 0
        else:
            assert r["n_rows"] == r["n_keys"], t
            assert r["dup_rows"] == 0 and r["is_unique"] == 1, t
    assert rows["events"]["n_rows"] == load(spark, SF_T2, "events").count()


def test_label_propagation_structure(spark):
    df = relational.graph_label_propagation(spark, SF_T2).cache()
    try:
        rows = df.collect()
        by_lbl = {}
        for r in rows:
            by_lbl.setdefault(r["community"], []).append(r["partkey"])
        # min-propagation invariant: after bounded rounds the community
        # label is a radius-2 minimum, so it can only be <= every
        # member's own key (equality needs iterate-to-fixpoint — that's
        # dedup_cluster_cc's contract, not this op's)
        for lbl, members in by_lbl.items():
            assert lbl <= min(members)
        sizes = {r["community"]: r["community_size"] for r in rows}
        for lbl, members in by_lbl.items():
            assert sizes[lbl] == len(members)
        # every edge endpoint is present exactly once
        assert len(rows) == len({r["partkey"] for r in rows})
    finally:
        df.unpersist()


def test_label_propagation_edges_within_reach(spark):
    """After 2 min-label rounds, two DIRECTLY adjacent nodes can only
    disagree if their labels arrived from different radius-2 sources;
    but a node's label can never exceed its own key, and a direct
    neighbor of the global-min node must carry that min."""
    df = relational.graph_label_propagation(spark, SF_T2)
    rows = {r["partkey"]: r["community"] for r in df.collect()}
    assert all(lbl <= p for p, lbl in rows.items())
    li = load(spark, SF_T2, "lineitem")
    op_pairs = li.select(F.col("l_orderkey").alias("o"),
                         F.col("l_partkey").alias("p")).distinct()
    b = op_pairs.select("o", F.col("p").alias("pb"))
    e = (op_pairs.join(b, ["o"]).where(F.col("p") < F.col("pb"))
         .groupBy("p", "pb").count().where(F.col("count") >= 2)
         .select("p", "pb").collect())
    gmin = min(rows)
    for r in e:
        if r["p"] == gmin:
            assert rows[r["pb"]] == gmin
        if r["pb"] == gmin:
            assert rows[r["p"]] == gmin


def test_truncate_budget_bytes(spark):
    import hashlib
    df = text.doc_truncate_budget(spark, SF_T2)
    docs = dict(load(spark, SF_T2, "documents")
                .select("doc_id", "text").limit(50).collect())
    got = {r["doc_id"]: r for r in
           df.filter(F.col("doc_id").isin(*docs)).collect()}
    for did, txt in docs.items():
        toks = txt.split(" ")
        kept = " ".join(toks[:64])
        r = got[did]
        assert r["n_tokens"] == len(toks)
        assert r["n_kept"] == min(64, len(toks))
        assert r["truncated"] == int(len(toks) > 64)
        assert r["kept_md5"] == hashlib.md5(kept.encode()).hexdigest()
        assert r["kept_chars"] == len(kept)
