"""Guards on the driver-priority query window (VERDICT r2 items 1+7).

The driver's correctness sweep records at most 50 entries, taken
first-by-order (alphabetical in both recorded rounds). These tests pin
the contract that keeps the engine's signature surface inside that
window, so a future alphabetically-early addition can't silently evict
e.g. h5_glove_fit from driver verification.

Round-8 semantics: the window is REMAINDER (never-driver-checked) +
NEW (built this round) + REGREEN (deliberate re-certification of
driver-green rows at r8 HEAD — VERDICT r7 item 2). The partition
guard therefore distinguishes "wasted slot" (an already-checked name
NOT declared as a re-green) from the explicit R8_REGREEN tuple.

No SparkSession needed — these are pure registry-shape checks.
"""

from __future__ import annotations

import importlib.util
import os

from spark_glove_spark import api
from spark_glove_spark.registry import (
    DRIVER_PRIORITY,
    DRIVER_WINDOW,
    R8_NEW,
    R8_REGREEN,
    R8_REMAINDER,
    R9_REMAINDER,
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
)


def test_window_slots_are_new_work_or_declared_regreens():
    """VERDICT r7 items 1+2: every window slot is either a query with
    NO driver record in any prior round (closing the evidence gap) or
    an EXPLICIT member of R8_REGREEN (re-certifying the signature
    surface at r8 HEAD). An already-checked name outside R8_REGREEN
    is a wasted slot; an unchecked name inside R8_REGREEN would be
    new coverage masquerading as a re-green."""
    checked = _driver_checked(ALL_RECORDS)
    stale = [
        n for n in DRIVER_PRIORITY if n in checked and n not in R8_REGREEN
    ]
    assert not stale, f"already-checked slots not declared as regreens: {stale}"
    fake = [n for n in R8_REGREEN if n not in checked]
    assert not fake, f"R8_REGREEN names without a prior green record: {fake}"


def test_window_covers_the_rotation_waves():
    """The r8 rotation carries the VERDICT r7 mandates: R8_REMAINDER
    leads in its pre-committed order (item 1 — the 12 names whose
    driver records close the contract at 310/310); the three new r8
    queries follow; and the re-green slate includes item 2's explicit
    signature list."""
    assert DRIVER_PRIORITY[: len(R8_REMAINDER)] == R8_REMAINDER
    assert R8_REMAINDER == (
        "mm_bmp_decode", "mm_gif_decode", "h15_rrf_fusion",
        "e11_markov_transitions", "d31_hll_portable",
        "h13_containment_dedup", "h17_langid_trigrams",
        "d32_sample_quantiles", "i22_streaming_online_dedup",
        "d33_seasonal_profile", "d34_cusum_changepoint",
        "e12_rfm_segmentation",
    )
    # the new r8 work: reader pinning, the streaming ingestion
    # capstone (VERDICT r7 item 5), the planted-analogy judgment
    # record (item 9)
    assert R8_NEW == (
        "a33_txlog_pinned_reader",
        "pipeline_streaming_curate",
        "h5_glove_planted_analogy",
    )
    for n in R8_NEW:
        assert n in DRIVER_PRIORITY
    # VERDICT r7 item 2's named signature set, all in the regreens
    for n in ("h3_cooccurrence_topk", "h5_glove_fit_micro",
              "h13_minhash_portable", "h14_similarity_join",
              "h14_jaccard", "h15_knn_bruteforce", "a21_txlog_delete",
              "a22_txlog_merge", "a27_txlog_update",
              "i9_streaming_cooccurrence",
              "i20_streaming_cooccurrence_update"):
        assert n in R8_REGREEN


def test_remainder_plus_new_closes_the_evidence_contract():
    """After CORRECTNESS_r08 records the window, every registered
    query must possess a driver record: prior greens + R8_REMAINDER +
    R8_NEW must equal the full registry (R9_REMAINDER catches any
    query built after the freeze)."""
    checked = _driver_checked(ALL_RECORDS)
    uncovered = (
        set(api.queries())
        - checked
        - set(R8_REMAINDER)
        - set(R8_NEW)
        - set(R9_REMAINDER)
    )
    assert not uncovered, f"queries not slotted in any rotation: {uncovered}"


def test_driver_keys_sort_before_every_organic_name():
    entry = _load_entry()
    organic = [k for k in entry.queries() if original_name(k) == k]
    first_organic = min(organic)
    last_window = driver_key(DRIVER_WINDOW - 1, DRIVER_PRIORITY[-1])
    assert last_window < first_organic


def test_rotation_plan_partitions_the_registry():
    """The three r8 plans (REMAINDER / NEW / REGREEN) are disjoint,
    registered, and every oracle obligation holds: R8_REMAINDER ships
    oracles (pre-committed r7 discipline); R8_NEW ships oracles except
    h5_glove_planted_analogy, which is rows-only BY NECESSITY
    (iterative seeded training) with oracle-checked portable twins
    (h5_glove_fit_micro + h8_analogy, both in the re-green slate)."""
    from spark_glove_spark.registry import REGISTRY

    parts = [set(R8_REMAINDER), set(R8_NEW), set(R8_REGREEN)]
    for i in range(len(parts)):
        for j in range(i + 1, len(parts)):
            assert not parts[i] & parts[j], (i, j, parts[i] & parts[j])
    ghost = set(DRIVER_PRIORITY) - set(api.queries())
    assert not ghost, f"plan names not registered: {ghost}"
    for n in R8_REMAINDER:
        assert REGISTRY[n].oracle is not None, f"{n} must ship an oracle"
    for n in R8_NEW:
        if n == "h5_glove_planted_analogy":
            assert REGISTRY[n].oracle is None
            assert "h5_glove_fit_micro" in R8_REGREEN
            assert "h8_analogy" in R8_REGREEN
        else:
            assert REGISTRY[n].oracle is not None, f"{n} must ship an oracle"
    for n in R9_REMAINDER:
        assert n in REGISTRY, f"R9 plan name not registered: {n}"


def test_original_name_roundtrip():
    for i, n in enumerate(DRIVER_PRIORITY):
        assert original_name(driver_key(i, n)) == n
    assert original_name("a1_scan_pushdown") == "a1_scan_pushdown"
