"""Teeth for the txlog table format (sources/txlog.py): snapshot
isolation, time travel, optimistic-concurrency conflicts, and data-
file immutability — the properties the a18 oracle check can't state
directly."""

from __future__ import annotations

import glob
import os

import pytest

from spark_glove_spark.sources import txlog


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def test_create_read_roundtrip(spark, tmp_path):
    path = str(tmp_path / "t")
    txlog.create(_df(spark, [(1, "a"), (2, "b")]), path)
    got = sorted(txlog.read(spark, path).collect())
    assert [(r["k"], r["v"]) for r in got] == [(1, "a"), (2, "b")]
    assert txlog.current_version(path) == 0


def test_time_travel_reads_old_version_after_later_commits(spark, tmp_path):
    path = str(tmp_path / "t")
    txlog.create(_df(spark, [(1, "a")]), path)
    txlog.overwrite(_df(spark, [(9, "z")]), path)
    txlog.append(_df(spark, [(10, "y")]), path)
    assert txlog.current_version(path) == 2
    v0 = [(r["k"], r["v"]) for r in txlog.read(spark, path, version=0).collect()]
    assert v0 == [(1, "a")], "v0 must be untouched by overwrite+append"
    v2 = sorted(
        (r["k"], r["v"]) for r in txlog.read(spark, path, version=2).collect()
    )
    assert v2 == [(9, "z"), (10, "y")]


def test_snapshot_resolved_file_list_is_immune_to_later_commits(spark, tmp_path):
    """The isolation mechanism itself: a reader that resolved its file
    list keeps reading the same bytes no matter what commits after."""
    path = str(tmp_path / "t")
    txlog.create(_df(spark, [(1, "a"), (2, "b")]), path)
    files_before = txlog.snapshot_files(path, 0)
    txlog.overwrite(_df(spark, [(3, "c")]), path)
    # the v0 file list is byte-identical and every file still exists
    assert txlog.snapshot_files(path, 0) == files_before
    for f in files_before:
        assert os.path.exists(os.path.join(path, f)), "data files are immutable"


def test_concurrent_writer_conflict(spark, tmp_path):
    path = str(tmp_path / "t")
    txlog.create(_df(spark, [(1, "a")]), path)
    # two writers both target version 1: the second must lose
    files_a, stats_a = txlog._write_data(_df(spark, [(2, "b")]), path)
    files_b, _stats_b = txlog._write_data(_df(spark, [(3, "c")]), path)
    txlog.commit(path, files_a, [], expected_version=0, stats=stats_a)
    with pytest.raises(txlog.TxLogConflict):
        txlog.commit(path, files_b, [], expected_version=0)
    # the winner's row is visible; the loser's orphan files are inert
    got = sorted(r["k"] for r in txlog.read(spark, path).collect())
    assert got == [1, 2]


def test_create_refuses_existing_table(spark, tmp_path):
    path = str(tmp_path / "t")
    txlog.create(_df(spark, [(1, "a")]), path)
    with pytest.raises(FileExistsError):
        txlog.create(_df(spark, [(2, "b")]), path)


def test_read_unknown_version_raises(spark, tmp_path):
    path = str(tmp_path / "t")
    txlog.create(_df(spark, [(1, "a")]), path)
    with pytest.raises(ValueError):
        txlog.read(spark, path, version=5)


def test_log_entries_record_operations(spark, tmp_path):
    path = str(tmp_path / "t")
    txlog.create(_df(spark, [(1, "a")]), path)
    txlog.append(_df(spark, [(2, "b")]), path)
    txlog.overwrite(_df(spark, [(3, "c")]), path)
    ops = [e["operation"] for e in txlog.read_log(path)]
    assert ops == ["create", "append", "overwrite"]
    # overwrite removed exactly the files the first two commits added
    log = txlog.read_log(path)
    assert sorted(log[2]["removes"]) == sorted(log[0]["adds"] + log[1]["adds"])


def test_file_skipping_prunes_by_footer_stats(spark, tmp_path):
    """The data-skipping index: three appends with disjoint key ranges
    -> a range predicate keeps exactly one file group, and the
    predicate read returns the same rows as a full-scan filter."""
    path = str(tmp_path / "t")
    txlog.create(_df(spark, [(i, "a") for i in range(0, 10)]).coalesce(1), path)
    txlog.append(_df(spark, [(i, "b") for i in range(100, 110)]).coalesce(1), path)
    txlog.append(_df(spark, [(i, "c") for i in range(200, 210)]).coalesce(1), path)
    kept, total = txlog.prune_files(path, "k", 100, 109)
    assert total == 3 and len(kept) == 1, (kept, total)
    got = sorted(
        r["k"] for r in txlog.read(spark, path, predicate=("k", 100, 109)).collect()
    )
    assert got == list(range(100, 110))
    # stats survive log replay at any version
    st = txlog.snapshot_stats(path)
    assert all("k" in cols for cols in st.values())
    mins = sorted(cols["k"][0] for cols in st.values())
    assert mins == [0, 100, 200]


def test_file_skipping_keeps_statless_files(spark, tmp_path):
    """A file with no recorded stats for the predicate column is
    conservatively KEPT (correctness before pruning)."""
    import json
    import os

    path = str(tmp_path / "t")
    txlog.create(_df(spark, [(1, "a")]).coalesce(1), path)
    # simulate a pre-stats writer: strip stats from the log entry
    f = os.path.join(path, "_txlog", "00000000.json")
    entry = json.load(open(f))
    entry["stats"] = {}
    open(f, "w").write(json.dumps(entry))
    kept, total = txlog.prune_files(path, "k", 1000, 2000)
    assert (len(kept), total) == (1, 1), "statless file must not be skipped"


def test_optimize_compacts_files_and_preserves_data_and_history(spark, tmp_path):
    path = str(tmp_path / "t")
    txlog.create(_df(spark, [(1, "a")]).coalesce(1), path)
    txlog.append(_df(spark, [(2, "b")]).coalesce(1), path)
    txlog.append(_df(spark, [(3, "c")]).coalesce(1), path)
    assert len(txlog.snapshot_files(path)) == 3
    v = txlog.optimize(spark, path)
    assert v == 3 and len(txlog.snapshot_files(path)) == 1
    got = sorted(r["k"] for r in txlog.read(spark, path).collect())
    assert got == [1, 2, 3], "OPTIMIZE must not change data"
    # pre-compaction versions still time-travel
    assert sorted(r["k"] for r in txlog.read(spark, path, version=1).collect()) == [1, 2]
    # compacted file carries merged stats for skipping
    st = txlog.snapshot_stats(path)
    (cols,) = st.values()
    assert cols["k"] == [1, 3]


def test_vacuum_reclaims_old_files_only(spark, tmp_path):
    path = str(tmp_path / "t")
    txlog.create(_df(spark, [(1, "a")]).coalesce(1), path)       # v0
    txlog.overwrite(_df(spark, [(2, "b")]).coalesce(1), path)    # v1
    txlog.overwrite(_df(spark, [(3, "c")]).coalesce(1), path)    # v2
    deleted = txlog.vacuum(path, keep_versions=2)
    assert deleted == txlog.read_log(path)[0]["adds"], (
        "only v0's (otherwise-unreferenced) files are reclaimed"
    )
    # retained versions still read
    assert [r["k"] for r in txlog.read(spark, path, version=1).collect()] == [2]
    assert [r["k"] for r in txlog.read(spark, path).collect()] == [3]
    # the vacuumed version fails at SCAN time (file genuinely gone)
    import pytest as _pytest

    with _pytest.raises(Exception):
        txlog.read(spark, path, version=0).collect()


def test_vacuum_keeps_files_shared_with_retained_versions(spark, tmp_path):
    """Append-only history: v0's files are part of EVERY later
    snapshot, so even keep_versions=1 must not delete them."""
    path = str(tmp_path / "t")
    txlog.create(_df(spark, [(1, "a")]).coalesce(1), path)
    txlog.append(_df(spark, [(2, "b")]).coalesce(1), path)
    assert txlog.vacuum(path, keep_versions=1) == []
    assert sorted(r["k"] for r in txlog.read(spark, path).collect()) == [1, 2]


def test_txlog_model_random_histories(spark, tmp_path):
    """Model check: a random mixed history of appends/overwrites/
    optimizes must read back, AT EVERY VERSION, exactly what a plain
    Python model says that version held (seeded sequences — a
    deterministic mini-stateful-test without per-example Spark
    session cost)."""
    import random

    rng = random.Random(7)
    for trial in range(3):
        path = str(tmp_path / f"m{trial}")
        nxt = iter(range(1, 1000))
        first = [(next(nxt), "x") for _ in range(rng.randint(1, 3))]
        txlog.create(_df(spark, first).coalesce(1), path)
        model = {0: sorted(k for k, _ in first)}
        for v in range(1, 5):
            op = rng.choice(["append", "overwrite", "optimize"])
            rows = [(next(nxt), "x") for _ in range(rng.randint(1, 3))]
            if op == "append":
                txlog.append(_df(spark, rows).coalesce(1), path)
                model[v] = sorted(model[v - 1] + [k for k, _ in rows])
            elif op == "overwrite":
                txlog.overwrite(_df(spark, rows).coalesce(1), path)
                model[v] = sorted(k for k, _ in rows)
            else:
                txlog.optimize(spark, path)
                model[v] = model[v - 1]
        for v, expect in model.items():
            got = sorted(r["k"] for r in txlog.read(spark, path, version=v).collect())
            assert got == expect, (trial, v, got, expect)
