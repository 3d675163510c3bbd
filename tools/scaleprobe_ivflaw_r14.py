"""r14 IVF-law ladder (the graph search laws' discipline applied to
the cell tier): at 1x/10x/100x corpus growth, build + probe the
PERSISTED IVF index twice per rung —

  fixed:   the lanes' authored knobs (n_lists=10, n_probe=3)
  derived: everything unpinned, flowing through ivf_list_schedule

— and score both against the exact quantized-cosine truth. The law's
claim: derived holds recall at-or-above fixed while the SCANNED
FRACTION (n_probe/n_lists, printed) falls like n^(-1/4), so the
probe wall stops tracking corpus growth. Fixed constants scan 30% of
every corpus forever; that is the fixture constant the schedule
stops from escaping to production.

Usage: python tools/scaleprobe_ivflaw_r14.py [factor ...] (default 10 100)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from spark_glove_spark.operators.ann import (  # noqa: E402
    ivf_build_index,
    ivf_list_schedule,
    ivf_probe_index,
)
from spark_glove_spark.session import get_spark  # noqa: E402
from tools.scaleprobe_vec_r11 import SF_DIR, build_emb_nx  # noqa: E402
from tools.scaleprobe_vec_r12 import exact_topk  # noqa: E402

_K = 10


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [10, 100]
    spark = get_spark("scaleprobe_ivflaw_r14")
    spark.sparkContext.setLogLevel("ERROR")
    pinned = (F.col("vec_id") % 100 == 0) & (F.col("vec_id") < 10_000_000)
    dirs = {1: SF_DIR, **{n: build_emb_nx(spark, n) for n in factors}}

    print(
        f"{'n':>4s} {'rows':>8s} {'mode':>8s} {'(nl,np)':>12s} "
        f"{'frac':>6s} {'build_s':>8s} {'probe_s':>8s} {'recall':>7s}"
    )
    for n in [1] + factors:
        d = dirs[n]
        e = spark.read.parquet(os.path.join(d, "embeddings.parquet"))
        rows = e.count()
        probes = e.where(pinned).select(
            F.col("vec_id").alias("probe_id"), "embedding"
        )
        truth = exact_topk(spark, d, pinned, _K)
        for mode, nl, np_ in (
            ("fixed", 10, 3),
            ("derived",) + ivf_list_schedule(rows),
        ):
            path = tempfile.mkdtemp(prefix=f"ivflaw_{mode}_{n}x_")
            try:
                t0 = time.time()
                ivf_build_index(e, path, n_lists=nl)
                build_s = time.time() - t0
                best = float("inf")
                got = None
                for _ in range(2):
                    t0 = time.time()
                    got = {
                        (r["probe_id"], r["vec_id"])
                        for r in ivf_probe_index(
                            spark, path, probes, k=_K, n_probe=np_
                        ).collect()
                    }
                    best = min(best, time.time() - t0)
                rec = len(got & truth) / max(len(truth), 1)
                print(
                    f"{n:>4d} {rows:>8d} {mode:>8s} "
                    f"{f'({nl},{np_})':>12s} {np_ / nl:>6.3f} "
                    f"{build_s:>8.1f} {best:>8.1f} {rec:>7.2f}"
                )
            finally:
                shutil.rmtree(path, ignore_errors=True)


if __name__ == "__main__":
    main()
