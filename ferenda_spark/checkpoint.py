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


class RoundCadence:
    """Per-round lineage management for iterative loops, with the eager
    checkpoint paid every ``interval`` rounds instead of every round.

    Round-4's two-parallelism measurement (BENCH/BASELINE.md "Graph family
    at two parallelism levels") decomposed the iterative operators' wall
    into data work + a FIXED ~0.34s/job latency (scheduler round-trip +
    eager-checkpoint commit) that is identical at local[2] and local[8] —
    i.e. the non-scaling term that drags raw efficiency to 0.67-0.78 at 1M
    nodes and dominates entirely at bench scale. One eager checkpoint per
    round means one such job per round.

    The cadence replaces that with: every round's state frame is persisted
    LAZILY (no job — ``persist`` only marks the plan), and only every
    ``interval``-th round (plus ``finish()``) runs ``truncate_checkpoint``.
    The checkpoint job then executes the whole window's rounds as stages of
    ONE job, so the per-job latency amortizes over ``interval`` rounds.
    The lazy persists are load-bearing, not an optimization: loop bodies
    reference the previous state twice (PageRank's dangling probe, HITS'
    norm, CC's pointer jump), so an UNcached window would recompute each
    round ~2x per reference — 2^interval blowup. With the cache, the first
    job that touches round r materializes it once and every later
    reference (including a convergence probe, which therefore still costs
    one job of its own on probe loops) reads blocks.

    Within a window the plan grows ``interval`` rounds deep and the
    sizeInBytes estimate squares per join round — bounded by 2^interval
    bits of growth, reset to the MEASURED size at each truncation, so the
    BigInt stall documented above cannot re-arise for small intervals.

    Usage::

        cad = RoundCadence(interval=4)
        state = cad.seed(init_frame)          # checkpointed round-0 state
        for _ in range(n_iter):
            state = cad.step(round_expr(state))
        return cad.finish(state)              # checkpointed, caches freed

    ``finish`` ALWAYS hands back a frame whose data is independent of the
    window caches it frees (a checkpoint, or the seed/last checkpoint
    itself) — callers may keep using it after the cadence is gone. On an
    abnormal exit call ``close()`` (e.g. in ``finally``) to drop the
    window caches; the last checkpoint stays alive for the caller.

    LIFETIME CONTRACT: every ``step``/``step_many`` call may FREE all
    frames from earlier rounds (it does so on cadence rounds) — that
    eager release is the point of the class. So loop bodies must only
    carry forward the frames the LATEST step returned; in particular an
    early-exit probe that breaks the loop must rebind its state to the
    current round's output BEFORE deciding, never hand a pre-step
    variable to ``finish`` (the blocks behind it may be gone, and its
    checkpoint-truncated lineage cannot recompute them —
    CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND).
    """

    def __init__(self, interval: int = 4):
        self.interval = max(1, int(interval))
        self._pending: list[DataFrame] = []
        self._ckpts: list[DataFrame] = []
        self._rounds = 0

    def seed(self, df: DataFrame) -> DataFrame:
        """Checkpoint a round-0 state and track it for eager release."""
        out = truncate_checkpoint(df)
        self._ckpts.append(out)
        return out

    def step(self, df: DataFrame) -> DataFrame:
        """Register one round's state; returns the frame the next round
        must build on (cached, or checkpointed on cadence rounds)."""
        return self.step_many([df])[0]

    def step_many(self, dfs: list[DataFrame]) -> list[DataFrame]:
        """Register one round with SEVERAL live states (e.g. BFS's
        settled+frontier, HITS' hubs+auths). On cadence rounds every state
        is checkpointed TOGETHER before any prior checkpoint is freed —
        freeing the previous chain under only one of two interdependent
        states would orphan the other's lineage.

        Off-cadence rounds use ``localCheckpoint(eager=False)``, NOT a bare
        ``persist``: a lazy persist leaves the round's full LOGICAL plan in
        place, and loop bodies that reference their state more than once
        (HITS' norm, CC's pointer jump, BFS's settled set) then grow the
        analyzed tree exponentially within the window — measured as a
        driver-heap OOM at interval=4 on HITS. The non-eager checkpoint
        flattens the plan to a LogicalRDD immediately (zero jobs — the
        physical plan compiles now, materialization happens at the next
        action) and its RDD is storage-marked, so later references within
        the materializing job read blocks instead of recomputing."""
        self._rounds += 1
        if self._rounds % self.interval == 0:
            return self._checkpoint(dfs)
        flat = [d.localCheckpoint(eager=False) for d in dfs]
        self._pending.extend(flat)
        return flat

    def flatten(self, df: DataFrame) -> DataFrame:
        """Flatten a frame MID-round (non-eager checkpoint, no round
        count, never a cadence trigger): use when a later sibling state's
        plan must build on THIS round's earlier state. Handing the sibling
        the RAW plan would embed the subtree a second time, and non-eager
        checkpoints don't register in the CacheManager, so the two
        compilations share nothing — the earlier state's shuffles run
        twice per round (measured: 2x wall / +68% shuffle write on HITS,
        whose hub update embeds the same round's authority update). The
        flattened frame is window-pending like any step output: it dies
        at the next cadence round, so only the frames the latest
        step/step_many returned may cross rounds."""
        flat = df.localCheckpoint(eager=False)
        self._pending.append(flat)
        return flat

    def finish(self, df: DataFrame) -> DataFrame:
        """Final truncation: checkpoint ``df`` unless it already is one of
        this cadence's live checkpoints, then free every window cache and
        every OTHER checkpoint."""
        if any(df is c for c in self._ckpts):
            self.close()
            for c in self._ckpts:
                if c is not df:
                    unpersist_checkpoint(c)
            self._ckpts = [df]
            return df
        return self._checkpoint([df])[0]

    def close(self) -> None:
        """Free the window frames' checkpoint storage (NOT the live cadence
        checkpoints — the caller's return value may be reading one). The
        pendings are non-eager localCheckpoints, so the storage hangs off
        the plan's RDD, not the CacheManager — ``DataFrame.unpersist`` would
        be a silent no-op on them."""
        for p in self._pending:
            unpersist_checkpoint(p)
        self._pending.clear()

    def _checkpoint(self, dfs: list[DataFrame]) -> list[DataFrame]:
        # persist ALL states before truncating any: a later sibling's plan
        # typically embeds an earlier sibling (HITS' hubs_t builds on
        # auths_t), so its checkpoint job must find the sibling cached
        # rather than re-deriving it. The persist-through-cache is also
        # what keeps the checkpoint's stats MEASURED (see module docstring).
        cached = [d.persist(StorageLevel.MEMORY_AND_DISK) for d in dfs]
        try:
            outs = [c.localCheckpoint(eager=True) for c in cached]
        finally:
            for c in cached:
                c.unpersist()
        # the checkpoints' RDDs are materialized and independent: the
        # window caches and the PREVIOUS checkpoints are now dead weight
        self.close()
        for c in self._ckpts:
            unpersist_checkpoint(c)
        self._ckpts = outs
        return outs


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
