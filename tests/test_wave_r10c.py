"""Round-10 third wave semantics (SURVEY.md §2.32): what the exact
oracles can't see —

- `ts_adf_lite`: a planted integer-cents random walk is NOT rejected
  (unit root survives) while a planted white-noise channel is strongly
  rejected — the screen separates the two regimes it exists for;
- `agg_conformal_interval`: the split-conformal guarantee holds by
  construction (coverage >= 0.9 on every channel) and the calibration
  slice size matches an independent DuckDB count;
- `graph_bfs_layers`: layer sets match an independent python BFS over
  the same DuckDB-derived edges, exactly;
- `sim_lsh_radius_search`: results are a strict subset of the
  brute-force tau-set (the verify is exact) with recall pinned at the
  measured operating point.
"""
import hashlib

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from industry_big_data_time_sequence_process_spark.registry import REGISTRY

from .conftest import SF_T2
from .test_wave_r10b import T0, _corpus

HOUR_US = 3_600_000_000


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


# ---------------------------------------------------------------------------
# ts_adf_lite
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def unit_root_corpus(tmp_path_factory):
    """Channel 'rw': an integer-cents random walk (720 hourly points,
    seed 'w4' — measured df = -0.549, textbook fail-to-reject).
    Channel 'st': white noise around 50 (measured df = -26.9)."""
    rows = []
    cents = 50000
    for i in range(720):
        cents += round(((_h32(f"w4:{i}") % 16) - 7.5) / 7.5 * 100)
        rows.append((1000 + i, T0 + i * HOUR_US, 1, "rw", cents / 100.0))
    for i in range(720):
        rows.append((2000 + i, T0 + i * HOUR_US, 2, "st",
                     50.0 + ((_h32(f"st:{i}") % 16) - 7.5)))
    events = {
        "event_id": [r[0] for r in rows],
        "ts": [r[1] for r in rows],
        "user_id": [r[2] for r in rows],
        "event_type": [r[3] for r in rows],
        "value": [r[4] for r in rows],
        "props": ["{}"] * len(rows),
    }
    return _corpus(tmp_path_factory, "unit_root_corpus", events=events)


def test_adf_separates_unit_root_from_noise(spark, unit_root_corpus):
    rows = {r["event_type"]: r for r in
            REGISTRY["ts_adf_lite"].fn(spark, unit_root_corpus).collect()}
    assert rows["rw"]["stationary"] == 0
    assert rows["rw"]["df_stat"] > -2.86
    assert rows["st"]["stationary"] == 1
    assert rows["st"]["df_stat"] < -20
    # the walk's beta is near zero (shocks persist); noise mean-reverts
    assert abs(rows["rw"]["beta"]) < 0.05
    assert rows["st"]["beta"] < -0.9


def test_adf_white_noise_corpus_all_stationary(spark):
    """The synthetic corpus's channels are white noise — every channel
    must reject the unit root decisively."""
    out = REGISTRY["ts_adf_lite"].fn(spark, SF_T2).collect()
    assert len(out) == 5
    assert all(r["stationary"] == 1 and r["df_stat"] < -20 for r in out)


# ---------------------------------------------------------------------------
# agg_conformal_interval
# ---------------------------------------------------------------------------


def test_conformal_coverage_guarantee(spark):
    out = REGISTRY["agg_conformal_interval"].fn(spark, SF_T2).collect()
    assert len(out) == 5
    for r in out:
        # finite-sample guarantee: k/n >= 0.9 by the ceil((n+1)*0.9) pick
        assert r["coverage"] >= 0.9, r
        assert r["coverage"] <= 0.95, r   # and not vacuously wide
        assert r["q_hat"] > 0
    # calibration slice size: independent recount of the md5 20% slice
    con = duckdb.connect()
    n_cal = con.sql(f"""
        SELECT count(*) FROM '{SF_T2}/events.parquet'
        WHERE ('0x' || substr(md5('cf:' || CAST(event_id AS VARCHAR)),
                              1, 8))::BIGINT % 5 = 0""").fetchone()[0]
    assert sum(r["n_cal"] for r in out) == n_cal


# ---------------------------------------------------------------------------
# graph_bfs_layers
# ---------------------------------------------------------------------------


def test_bfs_layers_match_python_bfs(spark):
    got = {(r["part"], r["layer"]) for r in
           REGISTRY["graph_bfs_layers"].fn(spark, SF_T2).collect()}
    con = duckdb.connect()
    edges = con.sql(f"""
        WITH op_pairs AS (
            SELECT DISTINCT l_orderkey AS o, l_partkey AS p
            FROM '{SF_T2}/lineitem.parquet'
        )
        SELECT a.p, b.p FROM op_pairs a JOIN op_pairs b
        ON a.o = b.o AND a.p < b.p GROUP BY 1, 2 HAVING count(*) >= 2
        """).fetchall()
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    seeds = {p for p in adj if _h32(f"bfs:{p}") % 31 == 0}
    dist = {p: 0 for p in seeds}
    frontier = set(seeds)
    for layer in range(1, 4):
        frontier = {n for p in frontier for n in adj[p]} - set(dist)
        for p in frontier:
            dist[p] = layer
    assert got == set(dist.items())
    assert len({r for r in got if r[1] == 0}) == len(seeds)


# ---------------------------------------------------------------------------
# sim_lsh_radius_search
# ---------------------------------------------------------------------------


def test_radius_results_subset_of_bruteforce_with_pinned_recall(spark):
    got = {(r["qid"], r["nid"]) for r in
           REGISTRY["sim_lsh_radius_search"].fn(spark, SF_T2).collect()}
    con = duckdb.connect()
    truth = set(con.sql(f"""
        WITH u AS (SELECT vec_id, list_transform(embedding,
            x -> CAST(x AS DOUBLE) / sqrt(list_reduce(
                list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                (a, b) -> a + b))) AS ue
            FROM '{SF_T2}/embeddings.parquet')
        SELECT q.vec_id, v.vec_id
        FROM u q JOIN u v ON v.vec_id != q.vec_id
        WHERE q.vec_id % 97 = 0
          AND list_reduce(list_transform(q.ue, (x, i) -> x * v.ue[i]),
                          (a, b) -> a + b) >= 0.25
        """).fetchall())
    # exact verify: nothing outside the true tau-set survives
    assert got <= truth
    # measured operating point at sf0.01: 38/83 ~ 0.46 recall; pin the
    # floor so a band-width regression can't silently gut the candidates
    assert len(got) / len(truth) >= 0.35, (len(got), len(truth))
