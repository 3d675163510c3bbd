"""Guards on the driver-priority query window (VERDICT r2 items 1+7).

The driver's correctness sweep records at most 50 entries, taken
first-by-order (alphabetical in both recorded rounds). These tests pin
the contract that keeps the engine's signature surface inside that
window, so a future alphabetically-early addition can't silently evict
e.g. h5_glove_fit from driver verification.

Round-11 semantics (VERDICT r10 items 1+8): the window is
R11_REMAINDER (the three r10 post-freeze additions — the only
registered queries with zero driver records after ten rounds) +
R11_NEW (built this round) + R11_REGREEN (deliberate re-certification
of driver-green rows at r11 HEAD). The partition guard distinguishes
"wasted slot" (an already-checked name NOT declared as a re-green)
from the explicit R11_REGREEN tuple.

No SparkSession needed — these are pure registry-shape checks.
"""

from __future__ import annotations

import importlib.util
import os

from spark_glove_spark import api
from spark_glove_spark.registry import (
    DRIVER_PRIORITY,
    DRIVER_WINDOW,
    R11_NEW,
    R11_REGREEN,
    R11_REMAINDER,
    R12_REMAINDER,
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
    "CORRECTNESS_r06",
    "CORRECTNESS_r07",
    "CORRECTNESS_r08",
    "CORRECTNESS_r09",
    "CORRECTNESS_r10",
)


def test_r10_window_landed_green():
    """VERDICT r9 item 1's failure class (a rotation declared but never
    executed) must stay dead: the r10 record must show the r10 window's
    remainder+new names green, proving rotations actually run."""
    checked = _driver_checked(("CORRECTNESS_r10",))
    for n in ("a34_txlog_idempotent_sink", "pipeline_cdc_exactly_once",
              "h15_knn_filtered", "h16_ivf_filtered"):
        assert n in checked, f"r10 rotation name missing from record: {n}"


def test_window_slots_are_new_work_or_declared_regreens():
    """Every window slot is either a query with NO driver record in
    any prior round (closing the evidence gap: R11_REMAINDER + the
    r11-built queries) or an EXPLICIT member of R11_REGREEN
    (re-certifying the signature surface at r11 HEAD). An
    already-checked name outside R11_REGREEN is a wasted slot; an
    unchecked name inside R11_REGREEN would be new coverage
    masquerading as a re-green."""
    checked = _driver_checked(ALL_RECORDS)
    stale = [
        n for n in DRIVER_PRIORITY if n in checked and n not in R11_REGREEN
    ]
    assert not stale, f"already-checked slots not declared as regreens: {stale}"
    fake = [n for n in R11_REGREEN if n not in checked]
    assert not fake, f"R11_REGREEN names without a prior green record: {fake}"


def test_window_covers_the_rotation_waves():
    """The r11 rotation carries the VERDICT r10 mandates: R11_REMAINDER
    leads in its pre-committed order (item 1 — the only three queries
    without a driver record after ten rounds); R11_NEW (the IVF-PQ
    composition + drift-rebuild work, items 4+5) follows; and the
    re-green slate leads with the ANN family r11 code touches, the
    bisected ml_naive_bayes, and the streaming-curate perf watch."""
    assert DRIVER_PRIORITY[: len(R11_REMAINDER)] == R11_REMAINDER
    assert R11_REMAINDER == (
        "h16_ivf_persisted",
        "pipeline_ann_index_lifecycle",
        "i23_streaming_ann_ingest",
    )
    assert (
        DRIVER_PRIORITY[len(R11_REMAINDER):len(R11_REMAINDER) + len(R11_NEW)]
        == R11_NEW
    )
    # the families r11 code touches
    for n in ("h15_knn_bruteforce", "h16_ivf_portable", "h16_pq_portable",
              "ml_naive_bayes", "pipeline_streaming_curate",
              "d23_psi_drift", "i21_streaming_psi_drift",
              "h17_span_dedup_bucketed"):
        assert n in R11_REGREEN


def test_remainder_plus_new_closes_the_evidence_contract():
    """After CORRECTNESS_r11 records the window, every registered
    query must possess a driver record: prior greens + R11_REMAINDER +
    R11_NEW must equal the full registry (R12_REMAINDER catches any
    query built after the r11 freeze)."""
    checked = _driver_checked(ALL_RECORDS)
    uncovered = (
        set(api.queries())
        - checked
        - set(R11_REMAINDER)
        - set(R11_NEW)
        - set(R12_REMAINDER)
    )
    assert not uncovered, f"queries not slotted in any rotation: {uncovered}"


def test_driver_keys_sort_before_every_organic_name():
    entry = _load_entry()
    organic = [k for k in entry.queries() if original_name(k) == k]
    first_organic = min(organic)
    last_window = driver_key(DRIVER_WINDOW - 1, DRIVER_PRIORITY[-1])
    assert last_window < first_organic


def test_rotation_plan_partitions_the_registry():
    """The three r11 plans (REMAINDER / NEW / REGREEN) are disjoint,
    registered, and every oracle obligation holds: the three
    R11_REMAINDER queries are rows-only BY DESIGN (k-means cells and
    streamed epoch state are model-specific) with their documented
    in-body/pytest teeth; R11_NEW entries ship oracles except the
    persisted/drift legs, which are rows-only by the same design with
    the oracle-checked h16_ivfpq_portable twin IN THE SAME WAVE."""
    from spark_glove_spark.registry import REGISTRY

    parts = [set(R11_REMAINDER), set(R11_NEW), set(R11_REGREEN)]
    for i in range(len(parts)):
        for j in range(i + 1, len(parts)):
            assert not parts[i] & parts[j], (i, j, parts[i] & parts[j])
    ghost = set(DRIVER_PRIORITY) - set(api.queries())
    assert not ghost, f"plan names not registered: {ghost}"
    for n in R11_REMAINDER:
        assert REGISTRY[n].oracle is None, (
            f"{n} is declared rows-only by design; an oracle appearing "
            "means the declaration is stale"
        )
    rows_only_new = (
        "h16_ivfpq_persisted",
        "pipeline_ann_drift_rebuild",
        # filtered composed-index probe: exact oracle-checked twin
        # h15_knn_filtered rides in R11_REGREEN's same window
        "h16_ivfpq_filtered",
    )
    for n in R11_NEW:
        if n in rows_only_new:
            assert REGISTRY[n].oracle is None
            assert "h16_ivfpq_portable" in R11_NEW
            assert "h15_knn_filtered" in R11_REGREEN
        else:
            assert REGISTRY[n].oracle is not None, f"{n} must ship an oracle"
    for n in R12_REMAINDER:
        assert n in REGISTRY, f"R12 plan name not registered: {n}"


def test_original_name_roundtrip():
    for i, n in enumerate(DRIVER_PRIORITY):
        assert original_name(driver_key(i, n)) == n
    assert original_name("a1_scan_pushdown") == "a1_scan_pushdown"
