"""Metadata-scaling probe for the txlog table format (PLANS.md
evidence — VERDICT r5 item 6).

Builds a table with N tiny commits (the frequently-committed-table
shape: a streaming sink appending every epoch), then measures what a
reader pays to resolve the latest snapshot:

- wall-clock of `snapshot_files` (checkpointed resolution: newest
  checkpoint + tail replay),
- wall-clock of a full-log replay (what every read cost before the
  r6 checkpointing landed — reconstructed here by replaying from
  version 0, ignoring checkpoints),
- the number of per-version JSON entries each path opens.

The point at 100 TB: a long-lived table accumulates thousands of
commits; full-log replay makes every read O(versions) metadata I/O
while checkpointed resolution stays O(CHECKPOINT_INTERVAL). Data
volume is irrelevant to this probe — commits move KB of metadata —
so the table rows are single-digit.

Usage: python tools/scaleprobe_txlog.py [n_commits]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from spark_glove_spark.session import get_spark  # noqa: E402
from spark_glove_spark.sources import txlog  # noqa: E402


def full_replay(path: str) -> tuple[int, int]:
    """Pre-checkpoint resolution: replay EVERY entry from version 0.
    Returns (active-file count, entries read)."""
    latest = txlog.current_version(path)
    active: set[str] = set()
    n = 0
    for k in range(latest + 1):
        entry = txlog._read_entry(path, k)
        n += 1
        active -= set(entry["removes"])
        active |= set(entry["adds"])
    return len(active), n


def main() -> None:
    n_commits = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    spark = get_spark("scaleprobe_txlog")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="sgs_txprobe_")
    path = os.path.join(root, "t")
    df = spark.range(4).selectExpr("id", "id * 2 AS v")
    txlog.create(df.coalesce(1), path)
    for _ in range(n_commits - 1):
        txlog.append(df.coalesce(1), path)
    latest = txlog.current_version(path)

    # Checkpointed resolution (the shipped read path).
    t0 = time.time()
    files_cp = txlog.snapshot_files(path)
    t_cp = time.time() - t0
    start = 0
    for cv in reversed(txlog.checkpoint_versions(path)):
        if cv <= latest:
            start = cv + 1
            break
    tail = latest - start + 1

    # Full-log replay (the pre-r6 cost model).
    t0 = time.time()
    n_files_full, n_entries_full = full_replay(path)
    t_full = time.time() - t0

    if len(files_cp) != n_files_full:
        raise AssertionError("checkpointed and full replay disagree")
    print(
        json.dumps(
            {
                "n_commits": n_commits,
                "latest_version": latest,
                "active_files": len(files_cp),
                "checkpointed_entries_read": tail,
                "checkpointed_sec": round(t_cp, 4),
                "full_replay_entries_read": n_entries_full,
                "full_replay_sec": round(t_full, 4),
                "metadata_read_ratio": round(n_entries_full / max(tail, 1), 1),
            }
        )
    )
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
