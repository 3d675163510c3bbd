"""Index-lifecycle walkthrough (round 14): the operability story a
production vector store lives by, composed from registered queries —

    derived search schedules (no hand-tuned knobs at any corpus
    size) → GDPR deletes through the BQ code table (deletion
    vectors → DV-subtracted serving → purge) → tombstone deletes
    through the graph tier (deleted nodes route but never surface) →
    OPTIMIZE-style edge compaction after insert epochs → the Arrow
    IPC exchange hop that hands the served results to a foreign
    engine

    python examples/index_lifecycle.py [sf_dir]

Defaults to /root/testdata/sf0.01. Each stage is a registered,
driver-verified query (h16_bq_deletes / h16_nsw_deletes /
h16_hnsw_compaction / a44_arrow_ipc); this file shows them as one
operational narrative.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from spark_glove_spark import api  # noqa: E402
from spark_glove_spark.operators.ann import (  # noqa: E402
    hnsw_plane_schedule,
    hnsw_search_schedule,
    nsw_search_schedule,
)
from spark_glove_spark.registry import drain_deferred_unpersist  # noqa: E402
from spark_glove_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("index_lifecycle")
    spark.sparkContext.setLogLevel("ERROR")
    qs = api.queries()

    # 0. The knobs derive from corpus size — a user at 10^9 vectors
    #    inherits production-sized beam/hop/plane settings without
    #    touching one (calibrated on the measured 1x/10x/100x ladder,
    #    PLANS.md r14).
    for n in (2_000, 200_000, 1_000_000_000):
        print(
            f"n={n:>13,}: planes={hnsw_plane_schedule(n)} "
            f"nsw(beam,hops)={nsw_search_schedule(n)} "
            f"hnsw(beams,hops)={hnsw_search_schedule(n)}"
        )

    # 1. GDPR slice through the persisted BQ index: delete records
    #    deletion vectors (no rewrite), serving subtracts them, purge
    #    re-materializes survivors — and the pre-delete snapshot still
    #    time-travels. The query's audit frame IS the proof.
    print("\nBQ delete lifecycle (h16_bq_deletes):")
    qs["h16_bq_deletes"](spark, sf_dir).show(truncate=False)
    drain_deferred_unpersist()

    # 2. The graph tier deletes by TOMBSTONE (Lucene/Vespa deleted-doc
    #    semantics): deleted nodes still ROUTE the beam search — the
    #    graph stays navigable — but are excluded before the final
    #    top-k, and doomed probes never enter.
    print("graph tombstone lifecycle (h16_nsw_deletes):")
    qs["h16_nsw_deletes"](spark, sf_dir).show(truncate=False)
    drain_deferred_unpersist()

    # 3. Insert epochs accrete reverse-edge mass past the degree
    #    bound; compaction re-ranks each node's union to top-deg as
    #    ONE copy-on-write version (recall within 0.02, pre-compaction
    #    snapshot intact).
    print("edge compaction (h16_hnsw_compaction):")
    qs["h16_hnsw_compaction"](spark, sf_dir).show(truncate=False)
    drain_deferred_unpersist()

    # 4. Hand the curated vectors to a foreign engine over Arrow IPC
    #    (the exchange hop: record batches end-to-end, no per-row
    #    decode — a44's checksummed roundtrip).
    print("Arrow IPC exchange hop (a44_arrow_ipc):")
    qs["a44_arrow_ipc"](spark, sf_dir).orderBy("bucket").show()
    drain_deferred_unpersist()


if __name__ == "__main__":
    main()
