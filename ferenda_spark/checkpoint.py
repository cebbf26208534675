"""Lineage truncation for iterative DataFrame loops — localCheckpoint with
HONEST statistics.

Every iterative operator in this package (connected components, PageRank,
HITS, Katz, BFS, LPA, k-core, transitive/SPARQL path closure, redirect
resolution, triplestore updates) truncates its per-round state with
``localCheckpoint(eager=True)``. Round 4's 1M-node measurement
(tools/graph_job.py) surfaced a failure mode invisible at few-round scale:

**``Dataset.localCheckpoint`` preserves the CHILD PLAN's size estimate**
(the new ``LogicalRDD`` carries ``optimizedPlan.stats`` forward), and
Catalyst's fallback join estimate is the PRODUCT of its children's
``sizeInBytes``. A loop whose round contains a join therefore squares the
estimate every iteration: after r rounds the BigInt has ~2^r bits, and
from round ~17 the driver spends its wall multiplying megabyte-long
integers inside ``stats`` (measured: 0.7s/round flat through round 15,
then 1.7s, 6.9s, 19s, 50s, 139s — a pure driver-side stall with every
executor thread parked; jstack pinned 374s of CPU in
``BigInt.multiply`` under ``SizeInBytesOnlyStatsPlanVisitor``).

The fix: persist the round's result, let the eager checkpoint materialize
THROUGH the cache, then drop the cache. The checkpoint's LogicalRDD then
inherits the ``InMemoryRelation``'s *measured* size (bytes actually
cached) instead of the multiplicative guess — stats stay ~actual-data-
sized forever (verified: 5 digits flat through 30 join rounds, wall flat
at 0.17s/round where the bare checkpoint hit 139s/round by round 22).
The extra cache write is one memory pass over a node-sized skinny frame —
noise next to the round's shuffle.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame


def truncate_checkpoint(df: DataFrame) -> DataFrame:
    """``localCheckpoint(eager=True)`` whose resulting plan carries the
    MEASURED size of the materialized data, not the (possibly
    exponentially inflated) estimate of the plan that produced it. Use
    this for every per-round truncation in an iterative loop; see the
    module docstring for why the bare call stalls the driver."""
    cached = df.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        return cached.localCheckpoint(eager=True)
    finally:
        cached.unpersist()


def unpersist_checkpoint(df: DataFrame) -> None:
    """Free a localCheckpoint's cached RDD blocks. There is no public API;
    the checkpointed RDD sits in the df's LogicalRDD plan node (verified:
    getPersistentRDDs drops to zero after this, while the documented-ish
    ``toRdd()`` route unpersists only a wrapper and frees nothing).
    Best-effort — on failure the ContextCleaner frees it at GC time."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:  # pragma: no cover
        pass
