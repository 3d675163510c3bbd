"""Interleaved A/B of the global SHJ session config (VERDICT r14 item 2).

Round 14 set `spark.sql.join.preferSortMergeJoin=false` plus
`spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold=64MB` on a
noise-level measurement; this probe settles it. Both are runtime SQL
confs (read at planning time, not session construction), so ONE
session alternates A (the committed pair) and B (Spark defaults:
prefer SMJ, threshold 0) between interleaved reps of the join-heavy
bench entries — no process-startup variance, same JIT state for both
arms.

Usage: python tools/abprobe_shj_r15.py [rounds] [entry,entry,...]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from spark_glove_spark import api  # noqa: E402
from spark_glove_spark.session import get_spark  # noqa: E402
from spark_glove_spark.sources import table  # noqa: E402

ENTRIES = ["c2_shuffle_join", "c8_asof_join", "d1_pricing_summary",
           "pipeline_curate_corpus"]

ARMS = {
    "shj": {"spark.sql.join.preferSortMergeJoin": "false",
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "64MB"},
    "smj": {"spark.sql.join.preferSortMergeJoin": "true",
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "0"},
}


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    entries = sys.argv[2].split(",") if len(sys.argv) > 2 else ENTRIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("abprobe_shj")
    spark.sparkContext.setLogLevel("ERROR")
    table(spark, sf_dir, "region").count()
    qs = api.queries()
    walls: dict[tuple[str, str], list[float]] = {}
    for r in range(rounds):
        # alternate arm order per round: a fixed order lets the second
        # arm ride the first arm's warm-up every round (observed on d1,
        # which has no join: identical plans, second arm ~0.06 s faster)
        order = list(ARMS.items())
        if r % 2 == 1:
            order.reverse()
        for arm, confs in order:
            for k, v in confs.items():
                spark.conf.set(k, v)
            for name in entries:
                spark.sparkContext.setJobDescription(f"shjAB:{arm}:{name}")
                t0 = time.time()
                qs[name](spark, sf_dir).write.mode("overwrite").format(
                    "noop"
                ).save()
                walls.setdefault((name, arm), []).append(
                    round(time.time() - t0, 3)
                )
    for name in entries:
        a = walls[(name, "shj")]
        b = walls[(name, "smj")]
        print(
            f"{name}: shj min={min(a)} reps={a} | smj min={min(b)} reps={b}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
