"""Round-13 wave semantics (VERDICT r12 missing #1-#4):

- exactly-once streaming commit protocol (`txn_stream_commit` /
  `txn_last_epoch` / `txn_head_version`): a replayed epoch NO-OPS, apps
  are isolated, foreign commits interleave safely, the head probe
  seeds from the checkpoint;
- change data feed (`txn_changes`): a version range covering ONLY a
  pure OPTIMIZE rewrite emits ZERO change rows (the pin that kills
  naive dir-diffing), a range equals its merge-only prefix across a
  trailing rewrite, and a self-range is empty;
- generalized pruning (`txn_prune_dirs_full`): partition equality
  drops dirs BEFORE stats are consulted, absent metadata never drops a
  dir, and the remove-mirror fold covers partition values and
  column stats exactly as it covers ts stats.

Protocol pins are pure-filesystem; the CDF pins ride the registered
op's staged history (one Spark staging, three assertions).
"""
import os

import pytest

from industry_big_data_time_sequence_process_spark.registry import REGISTRY
from industry_big_data_time_sequence_process_spark.operators.sources_sinks import (  # noqa: E501
    _scratch,
    txn_changes,
    txn_checkpoint,
    txn_commit,
    txn_head_version,
    txn_last_epoch,
    txn_prune_dirs_full,
    txn_stream_commit,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# exactly-once commit protocol
# ---------------------------------------------------------------------------


def test_stream_commit_replay_noops(tmp_path):
    log = str(tmp_path / "_log")
    os.makedirs(log)
    assert txn_stream_commit(log, "app", 0, ["e0"]) is True
    assert txn_stream_commit(log, "app", 0, ["e0"]) is False  # replay
    assert txn_stream_commit(log, "app", 1, ["e1"]) is True
    # a LOWER epoch replay after later commits still no-ops
    assert txn_stream_commit(log, "app", 0, ["e0"]) is False
    assert txn_head_version(log) == 2
    assert txn_last_epoch(log, "app") == (1, 2)


def test_stream_commit_apps_are_isolated(tmp_path):
    """Two streaming writers (different app ids) into one table: each
    tracks its own epoch sequence; app B's epoch 0 commits even though
    app A is already at epoch 5."""
    log = str(tmp_path / "_log")
    os.makedirs(log)
    for e in range(6):
        assert txn_stream_commit(log, "appA", e, [f"a{e}"]) is True
    assert txn_stream_commit(log, "appB", 0, ["b0"]) is True
    assert txn_last_epoch(log, "appA") == (5, 6)
    assert txn_last_epoch(log, "appB") == (0, 7)
    # replays of both apps no-op independently
    assert txn_stream_commit(log, "appA", 5, ["a5"]) is False
    assert txn_stream_commit(log, "appB", 0, ["b0"]) is False


def test_stream_commit_survives_foreign_commits(tmp_path):
    """Batch writers (no app stamp) interleave with the stream: the
    stream's next epoch lands at the NEW head and the backward epoch
    scan walks past the foreign manifests to the app's newest stamp."""
    log = str(tmp_path / "_log")
    os.makedirs(log)
    assert txn_stream_commit(log, "app", 0, ["e0"]) is True
    txn_commit(log, 2, ["batch1"], [])        # foreign batch commit
    txn_commit(log, 3, ["batch2"], [])
    assert txn_stream_commit(log, "app", 1, ["e1"]) is True
    assert txn_head_version(log) == 4
    assert txn_last_epoch(log, "app") == (1, 4)
    assert txn_stream_commit(log, "app", 1, ["e1"]) is False


def test_head_version_empty_and_checkpoint_seeded(tmp_path):
    log = str(tmp_path / "_log")
    os.makedirs(log)
    assert txn_head_version(log) == 0
    for v in range(1, 8):
        txn_commit(log, v, [f"v{v}"], [], extra={"ts": 1000 + v})
    assert txn_head_version(log) == 7
    txn_checkpoint(log, 5)
    assert txn_head_version(log) == 7  # seeded at 5, probes 6,7,miss(8)


# ---------------------------------------------------------------------------
# change data feed
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def cdf_history(spark):
    """Stage the registered op's 3-version history once (v1 base, v2
    merge, v3 pure OPTIMIZE) and hand back its scratch paths."""
    from industry_big_data_time_sequence_process_spark.sources.io import load

    REGISTRY["sink_txn_changes"].fn(spark, SF_DIR).collect()
    base = _scratch("sink_txn_changes")
    schema = load(spark, SF_DIR, "events").schema
    return (os.path.join(base, "data"), os.path.join(base, "_log"),
            schema)


def test_changes_across_pure_optimize_is_empty(spark, cdf_history):
    """THE dir-diff killer: v2 -> v3 is a pure compaction rewrite —
    every dir changed, zero rows changed. The feed must be EMPTY."""
    data, log, schema = cdf_history
    feed = txn_changes(spark, data, log, schema, "event_id", 2, 3)
    assert feed.count() == 0


def test_changes_range_equals_merge_only_prefix(spark, cdf_history):
    """(1 -> 3) crosses the OPTIMIZE; it must equal (1 -> 2) exactly —
    the rewrite contributes nothing to the semantic diff."""
    data, log, schema = cdf_history
    a = sorted(map(tuple, txn_changes(
        spark, data, log, schema, "event_id", 1, 2).collect()))
    b = sorted(map(tuple, txn_changes(
        spark, data, log, schema, "event_id", 1, 3).collect()))
    assert a == b
    assert len(a) > 0  # the merge genuinely changed rows


def test_changes_self_range_is_empty(spark, cdf_history):
    data, log, schema = cdf_history
    assert txn_changes(spark, data, log, schema,
                       "event_id", 2, 2).count() == 0


def test_changes_types_partition_the_feed(spark, cdf_history):
    """Every change row is exactly one of insert/update/delete, with
    before/after nullity matching its type."""
    data, log, schema = cdf_history
    rows = txn_changes(spark, data, log, schema,
                       "event_id", 1, 3).collect()
    for r in rows:
        if r["change_type"] == "insert":
            assert r["value_before"] is None
            assert r["value_after"] is not None
        elif r["change_type"] == "delete":
            assert r["value_before"] is not None
            assert r["value_after"] is None
        else:
            assert r["change_type"] == "update"
            assert r["value_before"] is not None
            assert r["value_after"] is not None


# ---------------------------------------------------------------------------
# generalized pruning: partitions before stats, remove-mirror
# ---------------------------------------------------------------------------


def test_partition_prune_runs_before_stats(tmp_path):
    """A dir whose partition value mismatches is dropped at stage 1
    even though its recorded stats OVERLAP the predicate window —
    observable via the three-stage return."""
    log = str(tmp_path / "_log")
    os.makedirs(log)
    txn_commit(log, 1, ["a"], [], extra={
        "parts": {"a": {"event_type": "click"}},
        "colstats": {"a": {"ts": {"min": 100, "max": 200}}}})
    txn_commit(log, 2, ["b"], [], extra={
        "parts": {"b": {"event_type": "view"}},
        "colstats": {"b": {"ts": {"min": 100, "max": 200}}}})
    active, after_parts, scanned = txn_prune_dirs_full(
        log, 2, part_eq={"event_type": "click"},
        col_preds={"ts": (150, 160)})
    assert active == ["a", "b"]
    assert after_parts == ["a"]   # b dropped on partition value alone
    assert scanned == ["a"]


def test_partition_match_stats_miss_drops_at_stage_two(tmp_path):
    log = str(tmp_path / "_log")
    os.makedirs(log)
    txn_commit(log, 1, ["a"], [], extra={
        "parts": {"a": {"event_type": "click"}},
        "colstats": {"a": {"ts": {"min": 100, "max": 200}}}})
    active, after_parts, scanned = txn_prune_dirs_full(
        log, 1, part_eq={"event_type": "click"},
        col_preds={"ts": (500, 600)})
    assert after_parts == ["a"]
    assert scanned == []          # survived partitions, lost on stats


def test_absent_metadata_never_drops(tmp_path):
    """A dir with no partition record and no stats survives both
    stages; a dir with partition record but no stats survives stage 2."""
    log = str(tmp_path / "_log")
    os.makedirs(log)
    txn_commit(log, 1, ["bare"], [])
    txn_commit(log, 2, ["half"], [],
               extra={"parts": {"half": {"event_type": "click"}}})
    _, after_parts, scanned = txn_prune_dirs_full(
        log, 2, part_eq={"event_type": "view"},
        col_preds={"ts": (0, 1)})
    assert "bare" in after_parts and "bare" in scanned
    assert "half" not in after_parts  # it RECORDED click, predicate view


def test_prune_full_remove_mirror_on_name_reuse(tmp_path):
    """The r13 stats-fold rule extends to partition values and
    colstats: remove+re-add under the same name sheds the retired
    incarnation's metadata entirely."""
    log = str(tmp_path / "_log")
    os.makedirs(log)
    txn_commit(log, 1, ["d"], [], extra={
        "parts": {"d": {"event_type": "view"}},
        "colstats": {"d": {"ts": {"min": 100, "max": 200}}}})
    txn_commit(log, 2, [], ["d"])
    txn_commit(log, 3, ["d"], [])  # re-add bare: nothing known
    _, after_parts, scanned = txn_prune_dirs_full(
        log, 3, part_eq={"event_type": "click"},
        col_preds={"ts": (1000, 2000)})
    assert after_parts == ["d"] and scanned == ["d"], (
        "re-added dir inherited its retired namesake's metadata")
