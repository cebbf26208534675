"""Truth discovery / fact fusion over conflicting (source, subj, pred, obj)
claims — resolve each (subj, pred) to one value, weighting sources by an
iteratively-estimated reliability.

Reference analog: none directly — ferenda ingests one authoritative
publisher per repo, so its triples never conflict. At the north_rule's
Common-Crawl scale the SAME fact is asserted by many independent hosts
(schema.org markup, infobox-style prose, microdata — see
operators/structured.py), and they disagree: stale mirrors, scraped
copies, vandalism. A web-scale KG-construction pipeline therefore needs a
fusion step between triple harvest and graph materialization. The
algorithm below is the public "Sums/TruthFinder-lite" fixed-point (Yin et
al., "Truth Discovery with Multiple Conflicting Information Providers on
the Web", KDD'07; Pasternack & Roth's Sums baseline), restricted to a
deterministic, fully-relational form:

    trust⁰(s)            = 1.0 for every source
    belief_k(f)          = Σ_{s asserts f} trust_{k-1}(s)
    conf_k(f)            = belief_k(f) / Σ_{f' same (subj,pred)} belief_k(f')
    trust_k(s)           = avg_{f asserted by s} conf_k(f)

After ``n_iter`` rounds the resolved value per (subj, pred) is the
candidate with the highest confidence (ties broken by minimum ``obj`` —
deterministic, re-run- and partitioning-stable).

Scale shape (claims ≫ sources ≫ facts-per-key):

- claims are deduped once up front ((source, subj, pred, obj) distinct —
  one shuffle) and cached; every round reuses the same frame.
- each round is three claim-keyed shuffles: (subj,pred,obj) belief sum,
  (subj,pred) normalizer sum, and source trust avg — ALL map-side
  combined, so a celebrity fact (millions of asserting hosts) or a giant
  source (a host with billions of claims) reduces to one row per map
  partition before the exchange.
- trust is source-sized and belief is fact-sized: both skinny; the
  claims×trust join is a plain equi-join on ``source`` (hash-partitioned;
  at 10^8 hosts trust is NOT broadcast-able and we never hint it).
- ``truncate_checkpoint`` truncates trust's lineage per round (same
  driver-stall rationale as graph.py).

Float determinism — ``fuse_claims`` is deterministic BY CONSTRUCTION,
not merely up to sum-order noise: trust is quantized to DECIMAL(20,12)
every round, so all sums are exact decimal arithmetic (associative,
partition-order independent); doubles appear only as quotients of two
deterministic operands and are re-quantized before the next sum. This
matters for the resolver: mathematically tied candidates are routine
(symmetric source counts), their beliefs are small-denominator
rationals that can terminate exactly ON a rounding boundary, so no
round-the-double sort key is stable — exact arithmetic is the only fix
that makes the argmax's obj tiebreak fire identically on every
partitioning. Consumers still round to 6 decimals for cross-engine
equality (the repo-wide grain); the SQL spelling in
:func:`fusion_unrolled_sql` replays the same decimal pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ferenda_spark.checkpoint import (
    truncate_checkpoint as _truncate_checkpoint,
)

#: quantization type for the trust fixed point: sums over this type are
#: exact in both Spark and DuckDB (module docstring, float determinism)
_TRUST_DEC = "decimal(20,12)"


def fuse_claims(
    claims: DataFrame,
    n_iter: int = 3,
) -> tuple[DataFrame, DataFrame]:
    """Run the fusion fixed-point.

    claims: (source, subj, pred, obj) — extra columns are dropped;
    duplicate assertions of the same fact by the same source count once.

    Returns ``(resolved, trust)``:

    - resolved: (subj, pred, obj, confidence, n_sources, n_candidates) —
      exactly one row per (subj, pred); ``confidence`` is the final-round
      normalized belief of the winning value, ``n_sources`` how many
      sources assert it, ``n_candidates`` how many distinct values
      competed.
    - trust: (source, trust) — final per-source reliability in [0, 1].
    """
    c = claims.select("source", "subj", "pred", "obj").distinct()
    # persist without priming: round 1's belief aggregate materializes the
    # cache as a side effect — an explicit count() here would be a whole
    # extra pass over the claims whose only purpose is cache warming
    c = c.persist()

    # Deterministic-by-construction arithmetic (module docstring): trust
    # lives in DECIMAL(20,12), so every SUM is exact and partition-order
    # independent; doubles appear only as quotients of two deterministic
    # operands, and each quotient is re-quantized to the decimal grain
    # before the next sum. A raw-double pipeline let partial-aggregation
    # order pick the winner between mathematically tied candidates
    # (observed flaking in test_partitioning_invariance: tied beliefs
    # whose decimal expansion terminates ON a rounding boundary).
    trust = c.select("source").distinct().withColumn(
        "trust", F.lit(1.0).cast(_TRUST_DEC)
    )
    conf = None
    for _ in range(n_iter):
        supported = c.join(trust, "source")
        belief = supported.groupBy("subj", "pred", "obj").agg(
            F.sum("trust").alias("belief"),  # exact decimal sum
            F.count("*").alias("n_sources"),
        )
        norm = belief.groupBy("subj", "pred").agg(
            F.sum("belief").alias("total"),
            F.count("*").alias("n_candidates"),
        )
        conf = belief.join(norm, ["subj", "pred"]).select(
            "subj", "pred", "obj", "n_sources", "n_candidates",
            # double division of two DETERMINISTIC decimal operands —
            # deterministic, and identical IEEE math in DuckDB's replay
            (
                F.col("belief").cast("double")
                / F.col("total").cast("double")
            ).alias("confidence"),
        )
        new_trust = (
            c.join(conf, ["subj", "pred", "obj"])
            .groupBy("source")
            .agg(
                # re-quantize each confidence to the decimal grain so
                # this sum is exact again (avg over raw doubles would
                # reintroduce partial-aggregation-order noise)
                F.sum(
                    F.round(F.col("confidence"), 12).cast(_TRUST_DEC)
                ).alias("sc"),
                F.count(F.lit(1)).alias("nc"),
            )
            .select(
                "source",
                F.round(F.col("sc").cast("double") / F.col("nc"), 12)
                .cast(_TRUST_DEC).alias("trust"),
            )
        )
        trust = _truncate_checkpoint(new_trust)

    # confidence is deterministic, so a true tie compares EQUAL and falls
    # through to the obj ordering on every partitioning / parallelism
    w = Window.partitionBy("subj", "pred").orderBy(
        F.col("confidence").desc(), F.col("obj").asc()
    )
    resolved = _truncate_checkpoint(
        conf.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
        .select("subj", "pred", "obj", "confidence", "n_sources",
                "n_candidates")
    )
    trust = trust.select("source", F.col("trust").cast("double").alias("trust"))
    # safe to free only AFTER resolved is materialized: a lazy return
    # would silently recompute the claims distinct on first action
    c.unpersist()
    return resolved, trust


def fusion_unrolled_sql(claims_cte: str, n_iter: int = 2) -> str:
    """ANSI-SQL oracle mirroring :func:`fuse_claims` exactly for a fixed
    iteration count: ``claims_cte`` must be the body of a CTE producing
    (source, subj, pred, obj). Returns a WITH-chain whose final SELECT is
    left to the caller (it ends with the CTEs ``conf{n_iter}`` and
    ``trust{n_iter}`` defined). Used by __spark_entry__'s oracles so the
    DuckDB replay and the Spark operator share one update-rule spelling.
    """
    parts = [
        f"claims_raw AS ({claims_cte})",
        "claims AS (SELECT DISTINCT source, subj, pred, obj FROM claims_raw)",
        "trust0 AS (SELECT DISTINCT source,"
        " CAST(1.0 AS DECIMAL(20,12)) AS trust FROM claims)",
    ]
    for k in range(1, n_iter + 1):
        parts.append(f"""
        belief{k} AS (
            SELECT c.subj, c.pred, c.obj,
                   sum(t.trust) AS belief, count(*) AS n_sources
            FROM claims c JOIN trust{k - 1} t USING (source)
            GROUP BY c.subj, c.pred, c.obj)""")
        parts.append(f"""
        norm{k} AS (
            SELECT subj, pred, sum(belief) AS total,
                   count(*) AS n_candidates
            FROM belief{k} GROUP BY subj, pred)""")
        parts.append(f"""
        conf{k} AS (
            SELECT b.subj, b.pred, b.obj, b.n_sources, n.n_candidates,
                   CAST(b.belief AS DOUBLE) / CAST(n.total AS DOUBLE)
                       AS confidence
            FROM belief{k} b JOIN norm{k} n USING (subj, pred))""")
        parts.append(f"""
        trust{k} AS (
            SELECT c.source,
                   CAST(round(
                       CAST(sum(CAST(round(f.confidence, 12)
                                     AS DECIMAL(20,12))) AS DOUBLE)
                       / count(*), 12) AS DECIMAL(20,12)) AS trust
            FROM claims c
            JOIN conf{k} f USING (subj, pred, obj)
            GROUP BY c.source)""")
    return "WITH " + ",\n".join(parts)


def fold_claims(
    batch: DataFrame,
    trust_state: DataFrame | None = None,
    fact_state: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Incremental fusion: fold ONE batch of claims into persistent
    fusion state without rescanning claim history — the
    update_components / incremental_void pattern applied to truth
    discovery (nightly crawl deltas keep arriving; re-running the full
    fixed point over 10^12 accumulated claims per delta is not a plan).

    State tables (both skinny, both partition-prunable on their keys):

    - trust_state: (source, n_claims, sum_conf) — trust(s) =
      sum_conf / n_claims, the running average confidence of everything
      s has asserted so far.
    - fact_state: (subj, pred, obj, belief, n_sources) — ``belief``
      accumulates each asserting source's trust AT FOLD TIME.

    Fold semantics (deterministic, amortized — documented deviation
    from the batch fixed point): a batch claim contributes its source's
    CURRENT trust (unseen sources start at 1.0) to the fact's belief;
    confidences are recomputed only for the (subj, pred) keys the batch
    touches, against the updated fact_state (old claims keep the trust
    they were folded with — the standard streaming truth-discovery
    amortization; a periodic :func:`fuse_claims` over the full claim log
    reconciles drift). Duplicate (source, fact) assertions within a
    batch collapse; re-assertions across batches re-contribute (they ARE
    fresh evidence under this model — re-crawls re-attest).

    Returns ``(trust_state', fact_state', resolved_delta)`` where
    ``resolved_delta`` is (subj, pred, obj, confidence, n_sources,
    n_candidates) for exactly the touched keys — the upsert a caller
    applies to its resolved store. Shapes: one batch-keyed trust join,
    one full_outer merge keyed on touched facts (history enters ONLY via
    the keyed join — never rescanned), one touched-key normalizer
    aggregation, one batch-keyed trust-state merge. All O(batch) plus
    keyed reads.

    First fold (both states None) with the whole claim set reproduces
    ``fuse_claims(..., n_iter=1)``'s resolved output exactly (pinned in
    tests/test_fusion_incremental.py).
    """
    sess = batch.sparkSession
    b = batch.select("source", "subj", "pred", "obj").distinct()
    if trust_state is None:
        trust_state = sess.createDataFrame(
            [], "source string, n_claims bigint, sum_conf double"
        )
    if fact_state is None:
        fact_state = sess.createDataFrame(
            [],
            "subj string, pred string, obj string, belief double, "
            "n_sources bigint",
        )

    trust = trust_state.select(
        "source",
        F.when(F.col("n_claims") > 0,
               F.col("sum_conf") / F.col("n_claims"))
         .otherwise(F.lit(1.0)).alias("trust"),
    )
    bt = b.join(trust, "source", "left").withColumn(
        "trust", F.coalesce("trust", F.lit(1.0))
    )
    delta = bt.groupBy("subj", "pred", "obj").agg(
        F.sum("trust").alias("d_belief"),
        F.count(F.lit(1)).alias("d_sources"),
    )
    fact_state2 = (
        fact_state.join(delta, ["subj", "pred", "obj"], "full_outer")
        .select(
            "subj", "pred", "obj",
            (F.coalesce("belief", F.lit(0.0))
             + F.coalesce("d_belief", F.lit(0.0))).alias("belief"),
            (F.coalesce("n_sources", F.lit(0))
             + F.coalesce("d_sources", F.lit(0))).alias("n_sources"),
        )
    )
    fact_state2 = _truncate_checkpoint(fact_state2)

    touched = delta.select("subj", "pred").distinct()
    cand = fact_state2.join(touched, ["subj", "pred"], "left_semi")
    norm = cand.groupBy("subj", "pred").agg(
        F.sum("belief").alias("total"),
        F.count(F.lit(1)).alias("n_candidates"),
    )
    conf = cand.join(norm, ["subj", "pred"]).select(
        "subj", "pred", "obj", "n_sources", "n_candidates",
        (F.col("belief") / F.col("total")).alias("confidence"),
    )
    w = Window.partitionBy("subj", "pred").orderBy(
        F.col("confidence").desc(), F.col("obj").asc()
    )
    resolved_delta = (
        conf.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )

    batch_conf = bt.join(
        conf.select("subj", "pred", "obj", "confidence"),
        ["subj", "pred", "obj"],
    )
    t_delta = batch_conf.groupBy("source").agg(
        F.count(F.lit(1)).alias("d_n"),
        F.sum("confidence").alias("d_sum"),
    )
    trust_state2 = (
        trust_state.join(t_delta, "source", "full_outer")
        .select(
            "source",
            (F.coalesce("n_claims", F.lit(0))
             + F.coalesce("d_n", F.lit(0))).alias("n_claims"),
            (F.coalesce("sum_conf", F.lit(0.0))
             + F.coalesce("d_sum", F.lit(0.0))).alias("sum_conf"),
        )
    )
    trust_state2 = _truncate_checkpoint(trust_state2)
    resolved_delta = _truncate_checkpoint(resolved_delta)
    return trust_state2, fact_state2, resolved_delta
