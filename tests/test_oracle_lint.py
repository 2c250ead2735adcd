"""Registry-wide output-type lint: every oracled op must emit only
driver-canonicalizer-safe column types on BOTH engines.

The driver's correctness check canonicalizes results through pandas, so the
safe output surface is scalar INT / FLOAT / DECIMAL / VARCHAR / TIMESTAMP /
DATE. Forbidden:
  * HUGEINT on the oracle side (pandas widens to float64; Spark int64 ->
    hash mismatch on identical values) — DuckDB's count_if / integer SUM /
    bit-shift aggregates all produce it silently;
  * LIST / STRUCT / MAP on either side (pandas sort_values crashes on
    ndarray cells -> driver records `err`);
  * BOOLEAN on either side (survives pandas only when null-free; we render
    flags as INT so the hazard class is gone, not just dormant).

This is analysis-only: DuckDB `DESCRIBE (<sql>)` plus Spark's lazy schema —
no query execution, so the whole registry lints in seconds.
"""
import pytest

from industry_big_data_time_sequence_process_spark.registry import REGISTRY

from .conftest import SF_SMOKE, slowwave_param
from .parity import duck_con, duck_kind, oracle_output_types, spark_kind

ORACLED = sorted(k for k, o in REGISTRY.items() if o.oracle is not None)

SAFE_KINDS = {"int", "float", "decimal", "str", "time", "bytes"}


@pytest.fixture(scope="module")
def lint_con():
    con = duck_con(SF_SMOKE)
    yield con
    con.close()


@pytest.mark.parametrize("key", ORACLED)
def test_oracle_output_types_safe(lint_con, key):
    bad = [
        f"{name}: {t} (kind={duck_kind(t)})"
        for name, t in oracle_output_types(lint_con, REGISTRY[key].oracle)
        if duck_kind(t) not in SAFE_KINDS
    ]
    assert not bad, (
        f"[{key}] oracle emits canonicalizer-unsafe column types:\n  "
        + "\n  ".join(bad)
    )


# r14: frame CONSTRUCTION is not lazy for every op (BPE merge training,
# semantic index builds run driver work at plan-build time) — the heavy
# keys carry the slowwave marker like the parity sweep.
@pytest.mark.parametrize("key", [slowwave_param(k) for k in ORACLED])
def test_spark_output_types_safe(spark, key):
    sdf = REGISTRY[key].fn(spark, SF_SMOKE)  # lazy: schema only, no execute
    bad = [
        f"{f.name}: {f.dataType.simpleString()} (kind={spark_kind(f.dataType)})"
        for f in sdf.schema.fields
        if spark_kind(f.dataType) not in SAFE_KINDS
    ]
    assert not bad, (
        f"[{key}] Spark result emits canonicalizer-unsafe column types:\n  "
        + "\n  ".join(bad)
    )
