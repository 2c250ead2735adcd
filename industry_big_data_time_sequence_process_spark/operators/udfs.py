"""UDF / UDAF / UDTF surface (SURVEY.md §2.12).

The engine's position (SURVEY.md §4): UDFs are the slow path — every op
that CAN be a built-in is one. This module exists to prove the full
extension surface with the right mechanics for each kind:

- scalar Python UDF: row-at-a-time, pickled — demonstrated, and its SQL
  twin is the oracle (so the test doubles as a "you didn't need a UDF
  here" proof);
- pandas (vectorized) UDF: Arrow batches, ~10-100x the scalar path;
- grouped-map UDAF via ``applyInPandas``: per-group pandas frame, the
  escape hatch for sequential/fitted per-entity logic;
- UDTF (Spark 4): table function over a partitioned input table.
"""
from __future__ import annotations

import json

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.functions import pandas_udf, udf

from ..registry import op
from ..sources.io import load


@op("udf_scalar_py", oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INT) AS k_parsed,
       CAST(json_extract_string(props, '$.k') AS INT) % 7 AS k_mod7
FROM events
""", tier=2, section="2.12")
def udf_scalar_py(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain Python UDF: a custom props parser (json.loads per row).

    Row-at-a-time pickling — deliberately the thing NOT to do in a hot
    path; the oracle is the built-in twin that should replace it.
    """

    @udf("int")
    def parse_k(props: str):
        try:
            return int(json.loads(props).get("k"))
        except Exception:
            return None

    ev = load(spark, sf_dir, "events")
    k = parse_k(F.col("props"))
    return ev.select(
        "event_id", k.alias("k_parsed"), (k % 7).alias("k_mod7"),
    )


@op("udf_pandas_vec", oracle="""
SELECT event_id, value,
       round(ln(1 + value), 6) AS log1p_value
FROM events
""", tier=2, section="2.12")
def udf_pandas_vec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized pandas UDF (Arrow-batched): log1p over the value column.
    numpy's log1p and the JVM's ln(1+x) agree well below 1e-6 here."""

    @pandas_udf("double")
    def log1p_vec(v: pd.Series) -> pd.Series:
        import numpy as np
        return pd.Series(np.round(np.log1p(v.to_numpy()), 6))

    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id", "value", log1p_vec(F.col("value")).alias("log1p_value"),
    )


@op("udaf_grouped_slope", oracle="""
WITH m AS (SELECT user_id, min(epoch_us(ts)) AS t0 FROM events GROUP BY 1)
SELECT e.user_id,
       count(*) AS n,
       round(regr_slope(e.value,
                        (epoch_us(e.ts) - m.t0) / 3600000000.0), 6)
           AS slope_per_hour
FROM events e JOIN m USING (user_id)
GROUP BY e.user_id
""", tier=2, section="2.12")
def udaf_grouped_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user OLS slope of value over time (drift detection), as a
    grouped-map UDAF: ``groupBy(user).applyInPandas`` fits each user's
    series in pandas. Oracle is DuckDB's closed-form ``regr_slope`` — an
    independent implementation of the same regression.

    x is hours since the user's first event (keeps the slope magnitude
    in a range where round-6 comparison is meaningful).
    """

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np
        x = (pdf["t_us"] - pdf["t_us"].min()).to_numpy(dtype="float64") / 3.6e9
        y = pdf["value"].to_numpy(dtype="float64")
        xc = x - x.mean()
        denom = (xc * xc).sum()
        slope = float((xc * (y - y.mean())).sum() / denom) if denom else None
        return pd.DataFrame({
            "user_id": [pdf["user_id"].iloc[0]],
            "n": [len(pdf)],
            "slope_per_hour": [round(slope, 6) if slope is not None else None],
        })

    ev = load(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("t_us"), "value")
    return ev.groupBy("user_id").applyInPandas(
        fit, "user_id long, n long, slope_per_hour double")


@op("udtf_sessions", oracle="""
WITH gaps AS (
    SELECT user_id, event_id, epoch_us(ts) AS t_us,
           epoch_us(ts) - lag(epoch_us(ts)) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
    FROM events
), tagged AS (
    SELECT user_id, t_us,
           CAST(SUM(CASE WHEN gap_us IS NULL OR gap_us > 1800000000
                         THEN 1 ELSE 0 END) OVER
               (PARTITION BY user_id ORDER BY t_us, event_id
                ROWS UNBOUNDED PRECEDING) AS BIGINT) - 1 AS session_seq
    FROM gaps
)
SELECT user_id, session_seq, count(*) AS n_events,
       min(t_us) AS start_us, max(t_us) AS end_us
FROM tagged
GROUP BY user_id, session_seq
""", tier=3, section="2.12")
def udtf_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4) exploding each user's ordered event stream
    into session rows (30-min gap rule) — the UDTF twin of
    ``ts_sessionize``, value-oracled since round 4: the emitted
    (session_seq starting at 0, n_events, start/end in epoch-µs longs)
    is exactly the lag/cumsum sessionization, so the DuckDB oracle is
    the flagship's SQL re-keyed to the UDTF's output columns. (Ordering
    ties on equal t_us can differ between engines, but session
    membership, counts and extrema are tie-invariant — only integer µs
    arithmetic crosses engines.) Cross-checked row-for-row against the
    built-in twin in tests/test_twins.py as well.

    Mechanics shown: ``udtf`` class with per-partition ``eval``/
    ``terminate`` over ``TABLE(...) PARTITION BY user_id ORDER BY ts``.
    """
    from pyspark.sql.functions import udtf

    gap_us = 30 * 60 * 1_000_000

    @udtf(returnType="user_id long, session_seq long, n_events long, "
                     "start_us long, end_us long")
    class Sessionize:
        def __init__(self):
            self.user = None
            self.seq = 0
            self.n = 0
            self.start = None
            self.last = None

        def _flush(self):
            if self.n:
                yield (self.user, self.seq, self.n, self.start, self.last)

        def eval(self, row):
            user_id, t_us = row["user_id"], row["t_us"]
            if self.user is None:
                self.user = user_id
            if self.last is not None and t_us - self.last > gap_us:
                yield from self._flush()
                self.seq += 1
                self.n = 0
                self.start = None
            if self.start is None:
                self.start = t_us
            self.n += 1
            self.last = t_us

        def terminate(self):
            yield from self._flush()

    spark.udtf.register("udtf_sessions_fn", Sessionize)
    load(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("t_us")
    ).createOrReplaceTempView("udtf_sessions_in")
    return spark.sql("""
        SELECT * FROM udtf_sessions_fn(
            TABLE(udtf_sessions_in) PARTITION BY user_id ORDER BY t_us)
    """)


@op("udf_arrow_scalar", oracle="""
SELECT event_id,
       upper(substr(props, 6, 10)) AS k_snippet,
       length(props) AS props_len
FROM events
""", tier=2, section="2.12")
def udf_arrow_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-OPTIMIZED scalar Python UDF (Spark 4's ``useArrow=True``):
    same ``@udf`` authoring model as the pickled row-at-a-time path, but
    arguments/results cross in Arrow batches — the migration story for
    legacy UDF code that can't be rewritten as pandas_udf. SQL twin
    value-checks the logic."""
    @F.udf("string", useArrow=True)
    def snippet(props: str) -> str:
        return props[5:15].upper()

    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        snippet("props").alias("k_snippet"),
        F.length("props").alias("props_len"),
    )


@op("udaf_pandas_trimmed_mean", oracle="""
WITH ranked AS (
    SELECT user_id, value,
           row_number() OVER (PARTITION BY user_id ORDER BY value, event_id)
               AS rn,
           count(*) OVER (PARTITION BY user_id) AS n
    FROM events
)
SELECT user_id,
       round(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6)
           AS trimmed_mean,
       count(*) AS n_kept
FROM ranked
WHERE rn > CAST(floor(0.1 * n) AS BIGINT)
  AND rn <= n - CAST(floor(0.1 * n) AS BIGINT)
GROUP BY user_id
""", tier=2, section="2.12")
def udaf_pandas_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED-AGG pandas UDF (the scalar-per-group UDAF flavor): 10%
    trimmed mean of value per user — the outlier-proof average. The UDF
    receives each group's values as one pandas Series (Arrow-batched);
    the oracle reproduces the trim with rank arithmetic. Note the UDF
    sorts by value only — the trim set is value-determined, so the
    event_id tiebreak in the oracle's ORDER BY changes which *row* ranks
    where but never which *values* survive."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def trimmed_mean(v: pd.Series) -> float:
        s = v.sort_values()
        k = int(len(s) // 10)
        kept = s.iloc[k: len(s) - k] if k else s
        # exact integer-cents sum (values are 2-decimal), then the same
        # two divisions the oracle's DECIMAL->DOUBLE/count path performs:
        # float means drift with summation order; integers don't
        cents = int((kept * 100).round().astype("int64").sum())
        return cents / 100.0 / float(len(kept))

    @pandas_udf("long")
    def trimmed_count(v: pd.Series) -> int:
        k = int(len(v) // 10)
        return int(len(v) - 2 * k)

    ev = load(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.round(trimmed_mean("value"), 6).alias("trimmed_mean"),
        trimmed_count("value").alias("n_kept"),
    )
