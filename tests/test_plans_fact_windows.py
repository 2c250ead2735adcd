"""Repo-wide plan pin (VERDICT r4 #1): NO unpartitioned window function
over fact-table rows anywhere in the non-baseline registry.

A ``Window.orderBy(...)`` with no partition key funnels its whole input
through ONE partition — the textbook 100x OOM when that input is a fact
table. The six exactness-first baselines that (documentedly) carry one
now each ship a ``*_scalable`` exact twin built on the two-phase rank
primitives in ``api.py`` (``bucketed_global_rank`` /
``bucketed_order_statistic`` / ``bucketed_running_sum`` /
``bucketed_ntile``); this test pins the rest of the registry — and every
future operator — against regressing into the pattern.

Mechanics: walk each operator's OPTIMIZED logical plan (pre-order JSON
from Catalyst). A Window node with an empty ``partitionSpec`` is flagged
iff a fact-table leaf relation is reachable from its child without
crossing a cardinality-bounding node (Aggregate / Limit / Deduplicate) —
windows over aggregates (bin tables, bucket-count tables, per-group
stats) are exactly the bounded pattern the engine is built on and pass.
Fact tables = every test corpus table that grows with the corpus
(region/nation are constant-size dims and exempt by construction).
"""
import json

import pytest

from industry_big_data_time_sequence_process_spark.registry import REGISTRY

from .conftest import SF_SMOKE

#: A column name that uniquely identifies each scale-unbounded table.
FACT_MARKER_COLUMNS = {
    "event_id": "events", "l_orderkey": "lineitem", "o_orderkey": "orders",
    "c_custkey": "customer", "p_partkey": "part", "s_suppkey": "supplier",
    "doc_id": "documents", "vec_id": "embeddings",
}

#: Nodes whose output cardinality is bounded regardless of input size —
#: a window above one of these is not a window over fact rows. Aggregate
#: and Deduplicate are handled separately (ADVICE r5): they bound
#: cardinality ONLY when their keys exclude the fact-unique marker
#: columns — ``groupBy(event_id)`` / ``dropDuplicates(doc_id, ...)``
#: emit one row per fact row and must propagate reachability.
SHRINKING_NODES = {"GlobalLimit", "LocalLimit"}

#: Catalyst node -> JSON field holding its keys, for the key-aware check.
KEYED_SHRINKING_NODES = {"Aggregate": "groupingExpressions",
                         "Deduplicate": "keys"}

#: Documented exactness-first baselines: each carries ONE deliberate
#: global-order window, names the hazard in its docstring, and ships a
#: value-identical ``*_scalable`` twin (same oracle verbatim). Nothing
#: else may appear here without the same treatment.
BASELINE_EXEMPT = {
    "feat_woe_binning", "feat_gains_table", "feat_psi_drift",
    "feat_time_split_encode", "sample_split_temporal",
    # feat_auc_roc's window is over an aggregate (auto-passes the walk);
    # its *_scalable twin bounds even that. Listed for documentation:
    "feat_auc_roc",
}


def _parse_tree(nodes: list[dict]):
    """Reconstruct the pre-order-serialized Catalyst tree."""

    def build(i: int):
        n = nodes[i]
        children, j = [], i + 1
        for _ in range(n.get("num-children", 0)):
            child, j = build(j)
            children.append(child)
        return (n, children), j

    tree, _ = build(0)
    return tree


def _relation_fact(node: dict):
    names = set()

    def walk(o):
        if isinstance(o, dict):
            if o.get("name"):
                names.add(o["name"])
            for v in o.values():
                walk(v)
        elif isinstance(o, list):
            for v in o:
                walk(v)

    walk(node.get("output") or [])
    for col, table in FACT_MARKER_COLUMNS.items():
        if col in names:
            return table
    return None


def _expr_names(obj) -> set:
    """All attribute names referenced anywhere in an expression JSON."""
    names = set()

    def walk(o):
        if isinstance(o, dict):
            if o.get("name"):
                names.add(o["name"])
            for v in o.values():
                walk(v)
        elif isinstance(o, list):
            for v in o:
                walk(v)

    walk(obj)
    return names


def _fact_reach(tree):
    """Fact tables reachable without crossing a shrinking node.

    Aggregate/Deduplicate shrink ONLY when keyed off the fact-unique
    marker columns (ADVICE r5): a groupBy/dropDuplicates keyed on
    event_id / doc_id / vec_id / ... emits one row per fact row — an
    unpartitioned window above it is still a window over fact
    cardinality and must stay flagged."""
    node, children = tree
    cls = node["class"].split(".")[-1]
    if cls in SHRINKING_NODES:
        return set()
    if cls in KEYED_SHRINKING_NODES:
        keys = _expr_names(node.get(KEYED_SHRINKING_NODES[cls]) or [])
        if not keys & set(FACT_MARKER_COLUMNS):
            return set()
        # fact-keyed: cardinality not bounded — fall through to children
    if cls.endswith("Relation"):
        t = _relation_fact(node)
        return {t} if t else set()
    out = set()
    for c in children:
        out |= _fact_reach(c)
    return out


def _unpartitioned_fact_windows(tree, found):
    node, children = tree
    cls = node["class"].split(".")[-1]
    if cls == "Window" and node.get("partitionSpec") == []:
        reach = _fact_reach(children[0]) if children else set()
        if reach:
            found.append(sorted(reach))
    for c in children:
        _unpartitioned_fact_windows(c, found)


def test_no_unpartitioned_window_over_fact_rows(spark):
    offenders = {}
    for key, o in sorted(REGISTRY.items()):
        if key in BASELINE_EXEMPT:
            continue
        if o.fn.__module__.endswith(".streaming"):
            # streaming fns EXECUTE a drain when called; their windowed
            # aggregations are watermarked streaming aggregates, not
            # batch window functions — out of scope for this pin.
            continue
        df = o.fn(spark, SF_SMOKE)
        nodes = json.loads(
            df._jdf.queryExecution().optimizedPlan().toJSON())
        found = []
        _unpartitioned_fact_windows(_parse_tree(nodes), found)
        if found:
            offenders[key] = found
    assert not offenders, (
        "unpartitioned window over fact-table rows (use the api.py "
        "two-phase rank primitives, or document + twin per the "
        f"BASELINE_EXEMPT contract): {offenders}")


@pytest.mark.parametrize("key", sorted(BASELINE_EXEMPT))
def test_every_exempt_baseline_has_a_scalable_twin(key):
    twin = f"{key}_scalable"
    assert twin in REGISTRY, f"{key} is exempt but ships no {twin}"
    assert REGISTRY[twin].oracle == REGISTRY[key].oracle, (
        f"{twin} must be an exact twin (same oracle verbatim)")


#: §2.5 SQL-surface demos whose PARTITIONED window key is
#: low-cardinality (a constant corpus fraction per partition — the
#: OTHER hazard class, SCALE.md). They stay as the SQL-surface
#: reference; each must ship a value-identical bounded-partition twin.
LOW_CARD_DEMOS = ["win_ntile", "win_row_number", "win_cume_pct",
                  "win_pct_of_total", "win_range_numeric",
                  "win_rank_dense"]


@pytest.mark.parametrize("key", LOW_CARD_DEMOS)
def test_every_low_cardinality_window_demo_has_a_twin(key):
    twin = f"{key}_scalable"
    assert twin in REGISTRY, f"{key} ships no {twin}"
    assert REGISTRY[twin].oracle == REGISTRY[key].oracle, (
        f"{twin} must be an exact twin (same oracle verbatim)")
