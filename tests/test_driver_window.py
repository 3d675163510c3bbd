"""Guards on the driver-priority query window (VERDICT r2 items 1+7).

The driver's correctness sweep records at most 50 entries, taken
first-by-order (alphabetical in both recorded rounds). These tests pin
the contract that keeps the engine's signature surface inside that
window, so a future alphabetically-early addition can't silently evict
e.g. h5_glove_fit from driver verification.

Round-12 semantics (VERDICT r11 items 1-5): the window is
R12_REMAINDER (the eight r11 post-freeze additions — the only
registered queries with zero driver records after eleven rounds) +
R12_NEW (built this round: the HNSW hierarchy, persisted BQ/NSW
artifacts, the RAG serving capstone) + R12_REGREEN (deliberate
re-certification at r12 HEAD of the txlog demos the scalar-bound
fusion touched, the whole ANN family ann.py changed under, the GloVe
signature, and the dedup/capstone anchors). The partition guard
distinguishes "wasted slot" (an already-checked name NOT declared as
a re-green) from the explicit R12_REGREEN tuple.

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
    R11_REMAINDER,
    R12_NEW,
    R12_REGREEN,
    R12_REMAINDER,
    R13_REMAINDER,
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
    "CORRECTNESS_r11",
)


def test_r10_window_landed_green():
    """VERDICT r9 item 1's failure class (a rotation declared but never
    executed) must stay dead: the r10 record must show the r10 window's
    remainder+new names green, proving rotations actually run."""
    checked = _driver_checked(("CORRECTNESS_r10",))
    for n in ("a34_txlog_idempotent_sink", "pipeline_cdc_exactly_once",
              "h15_knn_filtered", "h16_ivf_filtered"):
        assert n in checked, f"r10 rotation name missing from record: {n}"


def test_r11_window_landed_green():
    """Same guard, one round later: the r11 record must show the r11
    remainder + the r11-built queries green (or best-possible
    rows-only), proving the r11 rotation actually executed."""
    checked = _driver_checked(("CORRECTNESS_r11",))
    for n in R11_REMAINDER + R11_NEW:
        assert n in checked, f"r11 rotation name missing from record: {n}"


def test_window_slots_are_new_work_or_declared_regreens():
    """Every window slot is either a query with NO driver record in
    any prior round (closing the evidence gap: R12_REMAINDER + the
    r12-built queries) or an EXPLICIT member of R12_REGREEN
    (re-certifying the signature surface at r12 HEAD). An
    already-checked name outside R12_REGREEN is a wasted slot; an
    unchecked name inside R12_REGREEN would be new coverage
    masquerading as a re-green."""
    checked = _driver_checked(ALL_RECORDS)
    stale = [
        n for n in DRIVER_PRIORITY if n in checked and n not in R12_REGREEN
    ]
    assert not stale, f"already-checked slots not declared as regreens: {stale}"
    fake = [n for n in R12_REGREEN if n not in checked]
    assert not fake, f"R12_REGREEN names without a prior green record: {fake}"


def test_window_covers_the_rotation_waves():
    """The r12 rotation carries the VERDICT r11 mandates: R12_REMAINDER
    leads in its pre-committed order (item 1 — the only eight queries
    without a driver record after eleven rounds); R12_NEW (the HNSW
    hierarchy, persisted BQ/NSW serving, and the RAG capstone — items
    3, 4, 5) follows; and the re-green slate leads with the five
    txlog demos the scalar-bound fusion touched (item 6) plus the ANN
    family ann.py changed under."""
    assert DRIVER_PRIORITY[: len(R12_REMAINDER)] == R12_REMAINDER
    assert R12_REMAINDER == (
        "h16_bq_portable",
        "h15_retrieval_metrics",
        "h16_nsw_portable",
        "h15_hybrid_retrieval",
        "i24_streaming_bq_ingest",
        "h17_semantic_chunking",
        "d35_kmv_sketch",
        "i25_streaming_index_quality",
    )
    n_rem = len(R12_REMAINDER)
    assert DRIVER_PRIORITY[n_rem:n_rem + len(R12_NEW)] == R12_NEW
    assert R12_NEW == (
        "h16_hnsw_portable",
        "h16_bq_persisted",
        "h16_nsw_persisted",
        "pipeline_rag_serving",
        # h16_lsh_ann's regreen slot funded this one: that query keeps
        # per-round BENCH coverage, so the window slot buys NEW
        # evidence instead of a third certification lane
        "a35_avro_roundtrip",
    )
    # the families r12 code touches
    for n in ("pipeline_cdc_replication", "pipeline_cdc_exactly_once",
              "pipeline_incremental_agg", "i19_streaming_incremental_agg",
              "a25_txlog_change_feed", "h16_ivf_persisted",
              "h16_ivfpq_portable", "h15_knn_bruteforce",
              "h5_glove_fit_micro", "pipeline_curate_corpus"):
        assert n in R12_REGREEN


def test_remainder_plus_new_closes_the_evidence_contract():
    """After CORRECTNESS_r12 records the window, every registered
    query must possess a driver record: prior greens + R12_REMAINDER +
    R12_NEW must equal the full registry (R13_REMAINDER catches any
    query built after the r12 freeze)."""
    checked = _driver_checked(ALL_RECORDS)
    uncovered = (
        set(api.queries())
        - checked
        - set(R12_REMAINDER)
        - set(R12_NEW)
        - set(R13_REMAINDER)
    )
    assert not uncovered, f"queries not slotted in any rotation: {uncovered}"


def test_driver_keys_sort_before_every_organic_name():
    entry = _load_entry()
    organic = [k for k in entry.queries() if original_name(k) == k]
    first_organic = min(organic)
    last_window = driver_key(DRIVER_WINDOW - 1, DRIVER_PRIORITY[-1])
    assert last_window < first_organic


def test_rotation_plan_partitions_the_registry():
    """The three r12 plans (REMAINDER / NEW / REGREEN) are disjoint,
    registered, and every oracle obligation holds. Rows-only by
    design: in R12_REMAINDER, the two streaming-ingest monitors (i24,
    i25 — streamed epoch state is replay-specific, with in-body
    equality teeth against their oracle-checked batch twins); in
    R12_NEW, the two persisted-serving exhibits (on-disk lifecycle
    state, byte-equality with the oracle-checked in-memory twins —
    which ride in R12_REMAINDER's SAME window — pinned in
    tests/test_txlog.py). Everything else must ship an oracle."""
    from spark_glove_spark.registry import REGISTRY

    parts = [set(R12_REMAINDER), set(R12_NEW), set(R12_REGREEN)]
    for i in range(len(parts)):
        for j in range(i + 1, len(parts)):
            assert not parts[i] & parts[j], (i, j, parts[i] & parts[j])
    ghost = set(DRIVER_PRIORITY) - set(api.queries())
    assert not ghost, f"plan names not registered: {ghost}"
    rows_only_rem = ("i24_streaming_bq_ingest", "i25_streaming_index_quality")
    for n in R12_REMAINDER:
        if n in rows_only_rem:
            assert REGISTRY[n].oracle is None
        else:
            assert REGISTRY[n].oracle is not None, f"{n} must ship an oracle"
    rows_only_new = ("h16_bq_persisted", "h16_nsw_persisted")
    for n in R12_NEW:
        if n in rows_only_new:
            assert REGISTRY[n].oracle is None
            assert "h16_bq_portable" in R12_REMAINDER
            assert "h16_nsw_portable" in R12_REMAINDER
        else:
            assert REGISTRY[n].oracle is not None, f"{n} must ship an oracle"
    for n in R13_REMAINDER:
        assert n in REGISTRY, f"R13 plan name not registered: {n}"


def test_original_name_roundtrip():
    for i, n in enumerate(DRIVER_PRIORITY):
        assert original_name(driver_key(i, n)) == n
    assert original_name("a1_scan_pushdown") == "a1_scan_pushdown"
