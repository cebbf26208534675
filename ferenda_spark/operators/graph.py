"""Connected components over alias/near-dup pair edges (entity clustering).

Reference analog: none directly — ferenda resolves aliases exactly through
its grammars (LegalRef/COIN, [ref: ferenda/sources/legal/se/legalref.py],
[ref: ferenda/thirdparty/coin.py]) and never needs to cluster, because a
10^4-doc legal corpus has a curated URI space. At the north_rule's
Common-Crawl scale the MinHash-LSH alias pairs (SURVEY J4) form an
undirected similarity graph whose connected components ARE the entities:
clustering the pairs and electing a canonical representative (the minimum
node id — deterministic, re-run-stable) is the step that turns pairwise
near-duplicate evidence into a canonical URI dictionary.

Algorithm — distributed min-label propagation with pointer jumping:

    comp(v) starts as v.
    Each round:   comp'(v)  = min(comp(v), min over neighbors u of comp(u))
    then jumps:   comp''(v) = min(comp'(v), comp'(comp'(v)))

Plain propagation needs O(diameter) rounds; the pointer-jumping join makes
label distances roughly double each round, so convergence is
O(log diameter) — the property that makes this viable on a 1000-executor
cluster where every round is a full shuffle. Scale behavior:

- each round is two shuffles (neighbor-min aggregation + jump self-join),
  both on the node key; the min-aggregation combines map-side, so a hot
  node (a celebrity entity with millions of aliases) reduces to one row
  per map partition before the shuffle;
- the symmetrized edge set is computed once, deduped, and cached — rounds
  reuse it;
- ``localCheckpoint`` truncates the plan every round; without it the
  lineage doubles per iteration and Catalyst analysis time explodes long
  before the data does;
- the convergence probe is a ``limit(1)`` existence check on changed
  labels, not a full count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# round-4: every per-round truncation goes through truncate_checkpoint —
# the bare localCheckpoint preserves the join-product size ESTIMATE, which
# squares per round and stalls the driver in BigInt stats math from round
# ~17 (see ferenda_spark/checkpoint.py for the measured failure).
from ferenda_spark.checkpoint import (  # noqa: F401 — re-exported
    RoundCadence as _RoundCadence,
    truncate_checkpoint as _truncate_checkpoint,
    unpersist_checkpoint as _unpersist_checkpoint,
)


def _hook_round(und: DataFrame, labels: DataFrame) -> DataFrame:
    """One tree-hooking round → root map ``(old, new)``: for every current
    root (distinct ``comp`` value), the minimum root reachable over any
    edge leaving its tree, floored by itself. Factored out so
    tools/explain_kg.py can audit the per-round physical plan (the shape
    that repeats O(log n) times at scale): two edge-keyed equi-joins to
    put both endpoints' roots on each edge, then a map-side-combined min
    grouped by the ROOT key — a celebrity component's millions of edges
    pre-reduce to one row per map partition before the shuffle."""
    bl = labels.select(F.col("node").alias("b"), F.col("comp").alias("bcomp"))
    al = labels.select(F.col("node").alias("a"), F.col("comp").alias("acomp"))
    return (
        und.join(bl, "b")
        .join(al, "a")
        .groupBy("acomp")
        .agg(F.min("bcomp").alias("nbmin"))
        .select(
            F.col("acomp").alias("old"),
            F.least(F.col("acomp"), F.col("nbmin")).alias("new"),
        )
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    max_iter: int = 50,
) -> DataFrame:
    """Cluster an undirected edge list into connected components.

    Returns ``(node, component)`` with one row per distinct node that
    appears in ``edges``; ``component`` is the minimum node id of the
    component (any total order works — min is deterministic and stable
    across re-runs, which the ledger/resume contract requires). Isolated
    nodes never enter the edge list and are absent: union them in from the
    entity table afterwards if singleton clusters are wanted.

    Raises ``RuntimeError`` if ``max_iter`` rounds don't converge — with
    pointer jumping that needs a component diameter around 2**max_iter, so
    hitting it means the input is pathological, and returning a partial
    clustering silently would poison every downstream canonical URI.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).filter(
        F.col("a") != F.col("b")
    )
    und = (
        e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .persist()
    )
    cad = _RoundCadence()
    labels = cad.seed(
        und.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
    )

    try:
        for _ in range(max_iter):
            # hook: per current root, the min root over its tree's edges.
            # The probe materializes the (flattened) root map — one job.
            rootmap = cad.flatten(_hook_round(und, labels))
            if rootmap.filter(F.col("new") != F.col("old")).limit(1).count() == 0:
                return cad.finish(labels)
            # compress root chains (r → r' → r'') to their fixpoint before
            # touching the node-sized labels: each composition doubles the
            # compressed chain length, and the frames involved are
            # ROOT-sized (≤ #components), shrinking every outer round
            for _ in range(max_iter):
                nxt = rootmap.select(
                    F.col("old").alias("new"), F.col("new").alias("new2")
                )
                joined = cad.flatten(
                    rootmap.join(nxt, "new", "left").select(
                        "old", "new",
                        F.coalesce("new2", "new").alias("cnew"),
                    )
                )
                rootmap = joined.select(
                    "old", F.col("cnew").alias("new")
                )
                if (
                    joined.filter(F.col("cnew") != F.col("new"))
                    .limit(1).count() == 0
                ):
                    break
            # apply the compressed map to the members (node-sized join on
            # the comp key; a giant component's root is a hot key, but the
            # map side is root-sized and AQE broadcast-joins it)
            labels = cad.step(
                labels.withColumnRenamed("comp", "old")
                .join(rootmap, "old", "left")
                .select(
                    "node",
                    F.coalesce("new", "old").alias("comp"),
                )
            )
    finally:
        cad.close()
        und.unpersist()
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} iterations"
    )


def canonicalize_dictionary(
    dictionary: DataFrame, uri_pairs: DataFrame, src: str = "uri_a", dst: str = "uri_b"
) -> DataFrame:
    """Merge dictionary entries that name the same entity.

    ``uri_pairs`` is same-entity evidence between canonical URIs — e.g. the
    MinHash-LSH fuzzy tier (SURVEY J4) run dictionary-vs-dictionary when
    several source vocabularies are unioned and one real-world entity has a
    URI in each. Connected components elects one representative per entity
    (min URI) and every alias row re-points to it, so downstream linking
    (J3) emits a single canonical subject per entity.

    The component map is only as large as the URIs that appear in evidence
    pairs — a small fraction of the dictionary — so the rewrite joins it
    broadcast; the dictionary itself is never shuffled.
    """
    comp = connected_components(uri_pairs, src, dst).withColumnRenamed(
        "node", "canonical_uri"
    )
    return (
        dictionary.join(F.broadcast(comp), "canonical_uri", "left")
        .withColumn("canonical_uri", F.coalesce("comp", "canonical_uri"))
        .drop("comp")
    )


def cluster_sizes(components: DataFrame) -> DataFrame:
    """Per-component member counts — the dedup-audit rollup (how much of
    the corpus collapses per canonical entity)."""
    return components.groupBy("comp").agg(F.count(F.lit(1)).alias("n_members"))


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    damping: float = 0.85,
    n_iter: int = 8,
    checkpoint_interval: int = 4,
    init_ranks: DataFrame | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list → (node, rank).

    The web-scale use: rank hosts/domains of a Common-Crawl-style corpus by
    the hyperlink graph (harvested hrefs), the classic quality prior for
    training-data curation (high-rank hosts are upweighted, spam farms sink).
    Public algorithm (Page et al. 1999); fixed iteration count rather than a
    convergence probe so the result is deterministic across cluster sizes
    and exactly reproducible by an unrolled-SQL oracle.

    Semantics (pinned, oracle-visible): parallel edges collapse (DISTINCT),
    self-loops drop, N = |distinct nodes over src ∪ dst|, uniform 1/N init,
    rank' = (1−d)/N + d·(Σ_{u→v} rank(u)/outdeg(u) + dangling_mass/N) where
    dangling_mass is the rank sitting on nodes with no out-edges.

    Scale design: per iteration ONE shuffle that touches edge-sized data —
    the contribution groupBy(dst), map-side combined so a high-indegree hub
    reduces per map partition before the wire. The (edges ⋈ outdeg) frame is
    computed once and cached across iterations; the dangling probe is a
    vocabulary-sized anti-join aggregate broadcast back as a scalar; rank
    frames are node-sized (skinny). ``localCheckpoint`` truncates lineage per
    round exactly as in ``connected_components`` above — without it Catalyst
    analysis cost doubles per iteration.

    Incremental maintenance (``init_ranks``): PageRank's fixed point
    depends only on the edge set, not the starting vector — so a nightly
    crawl delta re-ranks by WARM-STARTING from yesterday's (node, rank)
    map instead of 1/N. Convergence is geometric in the damping factor
    from the distance of the start vector to the fixed point; a small
    edge delta leaves that distance tiny, so materially fewer iterations
    reach the same tolerance (tests/test_pagerank_warm.py pins >5x lower
    error at equal rounds and >=2 rounds saved on a ~1% delta).
    New nodes (absent from ``init_ranks``) enter at 1/N; departed nodes'
    stale rows are ignored (left-joined on the CURRENT node set); the
    vector is renormalized to sum 1 so the dangling/teleport arithmetic
    keeps its mass-conservation invariant. Still oracle-replayable: same
    update rule, custom r0.
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .cache()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    contrib_edges = e.join(outdeg, "src").cache()

    # the DANGLING NODE SET is static across iterations (only the mass on
    # it varies): detect emptiness once and skip the per-round anti-join +
    # broadcast entirely — web link graphs built from "every page links
    # out" constructions have no dangling nodes at all
    dangling_nodes = nodes.join(
        outdeg.withColumnRenamed("src", "node"), "node", "left_anti"
    ).cache()
    has_dangling = bool(dangling_nodes.limit(1).collect())

    joined = None
    if init_ranks is None:
        ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    else:
        # dedupe the prior on node: duplicate rows in init_ranks would
        # otherwise fan out through the join and silently inflate the
        # warm-start vector (averaging conflicting priors is the neutral
        # merge; renormalization below absorbs any residual scale)
        prev = init_ranks.groupBy("node").agg(F.avg("rank").alias("r0"))
        joined = nodes.join(prev, "node", "left").select(
            "node", F.coalesce("r0", F.lit(1.0 / n)).alias("r0")
        ).cache()
        total = joined.agg(F.sum("r0").alias("t"))
        ranks = joined.crossJoin(F.broadcast(total)).select(
            "node", (F.col("r0") / F.col("t")).alias("rank")
        )
    cad = _RoundCadence(interval=checkpoint_interval)
    for _ in range(n_iter):
        contribs = (
            contrib_edges.join(
                ranks.withColumnRenamed("node", "src"), "src"
            )
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("in_mass"))
            .withColumnRenamed("dst", "node")
        )
        new = nodes.join(contribs, "node", "left")
        if has_dangling:
            dangling = ranks.join(dangling_nodes, "node", "left_semi").agg(
                F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm")
            )
            new = new.crossJoin(F.broadcast(dangling))
            dm_term = F.col("dm") / F.lit(float(n))
        else:
            dm_term = F.lit(0.0)
        ranks = cad.step(
            new.select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (F.coalesce(F.col("in_mass"), F.lit(0.0)) + dm_term)
                ).alias("rank"),
            )
        )
    ranks = cad.finish(ranks)
    nodes.unpersist()
    contrib_edges.unpersist()
    dangling_nodes.unpersist()
    if joined is not None:
        joined.unpersist()  # warm-start prior — release after final ranks
    return ranks


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame | list,
    src: str = "src",
    dst: str = "dst",
    *,
    damping: float = 0.85,
    n_iter: int = 8,
    checkpoint_interval: int = 4,
) -> DataFrame:
    """Fixed-iteration personalized PageRank → (node, score): random walks
    restart at a SEED set instead of uniformly, so mass concentrates in
    the seeds' link neighborhood.

    The web-curation use is TrustRank (Gyöngyi, Garcia-Molina & Pedersen,
    VLDB 2004): seed with hand-vetted reputable hosts and the score
    separates organic link mass from spam-farm mass that uniform PageRank
    happily launders — the standard demotion signal next to ``pagerank``'s
    quality prior. The same operator with an entity's URI as the single
    seed is entity relatedness over the KG link graph.

    Semantics (pinned, oracle-visible): parallel edges collapse
    (DISTINCT), self-loops drop, node set = src ∪ dst; S = seeds that
    occur in the node set; teleport p(v) = 1/|S| for v ∈ S else 0;
    x_0 = p;  x' = (1−d)·p(v) + d·(Σ_{u→v} x(u)/outdeg(u) + dm·p(v))
    where dm is the mass on dangling nodes — redistributed by the
    TELEPORT vector, not uniformly, so unreachable nodes stay at exactly
    0.0 and Σx = 1 every round. Fixed iterations, no convergence probe:
    deterministic across cluster sizes, replayable by an unrolled-SQL
    oracle.

    Scale design is ``pagerank``'s: one edge-sized map-side-combined
    shuffle per round over the cached (edges ⋈ outdeg) frame, node-sized
    rank frames, the static teleport prior computed ONCE and joined in
    round-free (it rides the same node-keyed shuffle as the contribution
    join), RoundCadence lineage truncation. Seeds are a vocabulary-sized
    frame (trusted-host lists are thousands of rows at most) but are
    joined against nodes once, never per round.
    """
    sess = edges.sparkSession
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .cache()
    )
    if not isinstance(seeds, DataFrame):
        seeds = sess.createDataFrame(
            [(v,) for v in seeds], f"node {nodes.schema['node'].dataType.simpleString()}"
        )
    first = seeds.columns[0]
    seed_nodes = (
        seeds.select(F.col(first).alias("node"))
        .distinct()
        .join(nodes, "node", "left_semi")
        .cache()
    )
    n_seeds = seed_nodes.count()
    if n_seeds == 0:
        nodes.unpersist()
        seed_nodes.unpersist()
        raise ValueError("personalized_pagerank: no seed occurs in the graph")
    # static teleport prior — node-sized, cached once, reused every round
    prior = nodes.join(
        seed_nodes.withColumn("tele", F.lit(1.0 / n_seeds)), "node", "left"
    ).select("node", F.coalesce("tele", F.lit(0.0)).alias("tele")).cache()

    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    contrib_edges = e.join(outdeg, "src").cache()
    dangling_nodes = nodes.join(
        outdeg.withColumnRenamed("src", "node"), "node", "left_anti"
    ).cache()
    has_dangling = bool(dangling_nodes.limit(1).collect())

    ranks = prior.select("node", F.col("tele").alias("score"))
    cad = _RoundCadence(interval=checkpoint_interval)
    for _ in range(n_iter):
        contribs = (
            contrib_edges.join(
                ranks.withColumnRenamed("node", "src"), "src"
            )
            .groupBy("dst")
            .agg(F.sum(F.col("score") / F.col("deg")).alias("in_mass"))
            .withColumnRenamed("dst", "node")
        )
        new = prior.join(contribs, "node", "left")
        if has_dangling:
            dangling = ranks.join(dangling_nodes, "node", "left_semi").agg(
                F.coalesce(F.sum("score"), F.lit(0.0)).alias("dm")
            )
            new = new.crossJoin(F.broadcast(dangling))
            dm_term = F.col("dm") * F.col("tele")
        else:
            dm_term = F.lit(0.0)
        ranks = cad.step(
            new.select(
                "node",
                (
                    F.lit(1.0 - damping) * F.col("tele")
                    + F.lit(damping)
                    * (F.coalesce(F.col("in_mass"), F.lit(0.0)) + dm_term)
                ).alias("score"),
            )
        )
    ranks = cad.finish(ranks)
    nodes.unpersist()
    seed_nodes.unpersist()
    prior.unpersist()
    contrib_edges.unpersist()
    dangling_nodes.unpersist()
    return ranks


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    n_iter: int = 8,
    checkpoint_interval: int = 4,
) -> DataFrame:
    """Fixed-iteration HITS (Kleinberg 1999) → (node, hub, authority).

    The complementary link-analysis prior to ``pagerank`` above: hubs are
    pages that link to many good authorities (directory/index pages — at
    curation time often boilerplate to DOWNweight), authorities are pages
    many good hubs point at. Same determinism discipline as pagerank:
    fixed iteration count (no convergence probe), parallel edges collapse
    (DISTINCT), self-loops drop, so an unrolled-SQL oracle reproduces the
    result exactly.

    Semantics (pinned, oracle-visible): hub/auth init 1.0 on every node;
    per iteration auth(v) = Σ_{u→v} hub(u) then L2-normalized over ALL
    nodes, hub(u) = Σ_{u→v} auth(v) from the FRESH auth then
    L2-normalized; nodes without in(out)-edges hold 0.

    Scale design: per iteration exactly TWO edge-sized map-side-combined
    shuffles (groupBy dst for auth, groupBy src for hub); the L2 norms
    are scalar aggregates broadcast back with crossJoin; rank frames stay
    node-sized; ``localCheckpoint`` truncates lineage per round (same
    rationale as connected_components/pagerank — analysis cost otherwise
    doubles per iteration)."""
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .cache()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .cache()
    )

    def _normalize(scores: DataFrame, col: str) -> DataFrame:
        norm = scores.agg(
            F.sqrt(F.sum(F.col(col) * F.col(col))).alias("_n")
        )
        return scores.crossJoin(F.broadcast(norm)).select(
            "node",
            F.when(F.col("_n") > 0, F.col(col) / F.col("_n"))
            .otherwise(F.lit(0.0))
            .alias(col),
        )

    hubs = nodes.select("node", F.lit(1.0).alias("hub"))
    auths = nodes.select("node", F.lit(0.0).alias("authority"))
    # one cadence step per round carrying BOTH states: auths and hubs are
    # interdependent (hubs_t builds on auths_t), so they must be cached —
    # and, on cadence rounds, checkpointed — TOGETHER; checkpointing only
    # one would free the chain the other's lineage still roots in
    cad = _RoundCadence(interval=checkpoint_interval)
    for _ in range(n_iter):
        a_raw = (
            e.join(hubs.withColumnRenamed("node", "src"), "src")
            .groupBy("dst")
            .agg(F.sum("hub").alias("_v"))
            .withColumnRenamed("dst", "node")
        )
        # flatten mid-round: h_raw below must reference the FLATTENED
        # authority frame — embedding the raw subtree would compile it a
        # second time with no sharing (see RoundCadence.flatten)
        auths = cad.flatten(_normalize(
            nodes.join(a_raw, "node", "left").select(
                "node", F.coalesce("_v", F.lit(0.0)).alias("authority")
            ),
            "authority",
        ))
        h_raw = (
            e.join(auths.withColumnRenamed("node", "dst"), "dst")
            .groupBy("src")
            .agg(F.sum("authority").alias("_v"))
            .withColumnRenamed("src", "node")
        )
        hubs = _normalize(
            nodes.join(h_raw, "node", "left").select(
                "node", F.coalesce("_v", F.lit(0.0)).alias("hub")
            ),
            "hub",
        )
        auths, hubs = cad.step_many([auths, hubs])
    # checkpoint the JOINED output (both final states feed it), so finish
    # can free the window caches without orphaning either state's lineage
    out = cad.finish(
        nodes.join(hubs, "node").join(auths, "node").select(
            "node", "hub", "authority"
        )
    )
    nodes.unpersist()
    e.unpersist()
    return out


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node triangle counts over an undirected simple graph
    (self-loops and duplicate/reverse edges collapsed first).

    Returns ``(node, n_triangles)`` for every node that appears in an
    edge (nodes in no triangle get 0).

    Algorithm: degree-ordered edge orientation (each undirected edge
    points from its (degree, id)-smaller endpoint to the larger), then
    wedge join + closing-edge join. The orientation is THE scale move:
    out-degree is bounded by O(sqrt(m)) regardless of hubs (a celebrity
    host with 10^7 neighbors contributes wedges only through the ~sqrt(m)
    neighbors that outrank it), so the wedge self-join — the only
    super-linear step — never explodes on skew. Each triangle is produced
    exactly once, as its unique orientation-ordered (a, b, c).

    Shuffles: symmetrize+distinct, degree agg, two joins keyed on node
    pairs, final explode+count — all equi-keyed, AQE-splittable.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).filter(
        F.col("a") != F.col("b")
    )
    # no persist: the function is lazy end-to-end; the symmetrize+distinct
    # Exchange is reused across the downstream joins by Spark's shuffle
    # reuse within the single action that evaluates the result
    und = e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    deg = und.groupBy("a").agg(F.count(F.lit(1)).alias("d")).withColumnRenamed(
        "a", "node"
    )
    ranked = (
        und.join(deg.select(F.col("node").alias("a"), F.col("d").alias("da")), "a")
        .join(deg.select(F.col("node").alias("b"), F.col("d").alias("db")), "b")
    )
    oriented = ranked.filter(
        F.struct("da", "a") < F.struct("db", "b")
    ).select("a", "b")
    wedges = (
        oriented.alias("e1")
        .join(oriented.alias("e2"), F.col("e1.a") == F.col("e2.a"))
        .filter(F.col("e1.b") < F.col("e2.b"))
        .select(
            F.col("e1.a").alias("x"),
            F.least("e1.b", "e2.b").alias("y"),
            F.greatest("e1.b", "e2.b").alias("z"),
        )
    )
    # the closing edge may be oriented either way between y and z in the
    # (degree, id) order — normalize wedge (y, z) by plain id above, so
    # probe the oriented set in both directions
    closing = oriented.select(
        F.least("a", "b").alias("y"), F.greatest("a", "b").alias("z")
    )
    tris = wedges.join(closing, ["y", "z"]).select("x", "y", "z")
    per_node = (
        tris.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    out = (
        deg.select("node")
        .join(per_node, "node", "left")
        .select(
            "node",
            F.coalesce("n_triangles", F.lit(0)).cast("bigint").alias(
                "n_triangles"
            ),
        )
    )
    return out


def clustering_coefficient(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Local clustering coefficient per node over the undirected simple
    graph → ``(node, degree, n_triangles, cc)`` with
    cc = 2·T(v) / (d(v)·(d(v)−1)) for d ≥ 2, else 0.0.

    The web-graph diagnostic next to ``degree_assortativity``: organic
    link neighborhoods close triangles (communities, topical hubs), while
    farm-generated link graphs are locally tree-like (cc ≈ 0) or
    complete-bipartite (cc spikes without matching degree structure) —
    a cheap per-host feature for the same curation verdicts TrustRank
    feeds. Composition of ``triangle_count`` (degree-ordered orientation,
    O(sqrt(m))-bounded wedge join — see its docstring for the skew story)
    with the degree table; the symmetrize+distinct and degree exchanges
    appear identically in both subtrees, so Spark's ReusedExchange
    evaluates them once within the single consuming action.
    """
    tc = triangle_count(edges, src, dst)
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).filter(
        F.col("a") != F.col("b")
    )
    und = e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    deg = und.groupBy("a").agg(F.count(F.lit(1)).alias("degree")).withColumnRenamed(
        "a", "node"
    )
    return deg.join(tc, "node").select(
        "node",
        "degree",
        "n_triangles",
        F.when(
            F.col("degree") >= 2,
            2.0 * F.col("n_triangles")
            / (F.col("degree") * (F.col("degree") - 1)),
        )
        .otherwise(F.lit(0.0))
        .alias("cc"),
    )


def update_components(prev: DataFrame, new_edges: DataFrame,
                      src: str = "src", dst: str = "dst") -> DataFrame:
    """Incrementally maintain a connected-components labeling when a new
    batch of edges arrives: exactly ``connected_components(history ∪
    new_edges)`` WITHOUT rescanning the edge history.

    ``prev`` is a previous run's (node, comp) output. Each old component
    is connectivity-equivalent to its STAR (every member linked to the
    representative), and the star has O(nodes) edges no matter how dense
    the original evidence was — for alias graphs (edges ≫ nodes) the
    incremental run is therefore strictly smaller than the original, and
    the raw pair history never needs to be stored at all (the component
    map IS the state, same discipline as dedup_store's fingerprint-only
    snapshots). Labels stay stable: comp ids are min member ids, and the
    min over a merged set of old components is again the global min node.

    New-batch nodes unseen before enter as ordinary edge endpoints;
    previously-labeled nodes keep their row even when untouched (they ride
    along as star edges). Iteration count stays O(log diameter) of the
    NEW quotient graph — old components are already depth-1 stars.
    """
    star = prev.filter(F.col("node") != F.col("comp")).select(
        F.col("node").alias(src), F.col("comp").alias(dst)
    )
    edges = star.unionByName(
        new_edges.select(F.col(src).alias(src), F.col(dst).alias(dst))
    )
    merged = connected_components(edges, src, dst)
    # a singleton (node==comp) prev row — possible when a caller unioned
    # isolated nodes into the map — has no star edge; if no new edge
    # touches it either it is absent from `merged`: restore its old label
    untouched = prev.join(merged.select("node"), "node", "left_anti")
    return merged.unionByName(untouched)


def modularity(
    edges: DataFrame,
    labels: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
    label: str = "comp",
) -> DataFrame:
    """Newman modularity decomposition of a community assignment over an
    undirected simple graph → one row per community:

        (comp, n_nodes, m_internal, deg_total, q_contrib)
        with  q_contrib = m_c/m − (d_c/(2m))²   and   Q = Σ_c q_contrib.

    The quality gauge for every clustering this repo produces (LPA
    communities, connected components, MinHash entity clusters): Q ≈ 0
    means the partition is no better than random wiring with the same
    degree sequence, Q ≳ 0.3 means real structure (Newman & Girvan 2004).
    Running it after `label_propagation` is the standard acceptance check
    before a community map is allowed to drive host grouping or crawl
    scheduling.

    Semantics: edges are symmetrized to canonical ``a < b`` pairs and
    deduped (simple graph, self-loops dropped); degree counts each
    incident canonical edge once per endpoint. Nodes missing from
    ``labels`` are dropped (with their incident edges' endpoint degree
    still counted in m via the edge count — i.e. labels are expected to
    cover the edge set; components/LPA output always does).

    Scale shape: two skinny equi-joins of the edge list against the
    node-sized label map (no broadcast hint — at web scale the label map
    is corpus-sized), then two map-side-combined aggregations keyed by
    community; the scalar m arrives via a one-row cross join (annotated
    single-partition reduction, same pattern as SALSA's totals). A
    celebrity community reduces map-side; nothing collects.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    lab = labels.select(F.col(node).alias("_n"), F.col(label).alias("_c"))
    both = (
        e.join(lab.withColumnRenamed("_n", "a"), "a")
        .withColumnRenamed("_c", "ca")
        .join(lab.withColumnRenamed("_n", "b"), "b")
        .withColumnRenamed("_c", "cb")
    )
    m_row = e.agg(F.count(F.lit(1)).alias("_m"))
    # degree of each labeled node, then community degree mass
    deg = (
        e.select(F.col("a").alias("_n"))
        .unionAll(e.select(F.col("b").alias("_n")))
        .groupBy("_n")
        .agg(F.count(F.lit(1)).alias("_deg"))
    )
    dmass = (
        lab.join(deg, "_n", "left")
        .groupBy("_c")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum(F.coalesce("_deg", F.lit(0))).alias("deg_total"),
        )
    )
    internal = (
        both.where(F.col("ca") == F.col("cb"))
        .groupBy(F.col("ca").alias("_c"))
        .agg(F.count(F.lit(1)).alias("m_internal"))
    )
    return (
        dmass.join(internal, "_c", "left")
        .crossJoin(F.broadcast(m_row))
        .select(
            F.col("_c").alias("comp"),
            "n_nodes",
            F.coalesce("m_internal", F.lit(0)).alias("m_internal"),
            "deg_total",
            (
                F.coalesce("m_internal", F.lit(0)) / F.col("_m")
                - F.pow(F.col("deg_total") / (2.0 * F.col("_m")), F.lit(2.0))
            ).alias("q_contrib"),
        )
    )


def modularity_score(per_community: DataFrame) -> DataFrame:
    """Collapse :func:`modularity`'s decomposition to the scalar Q —
    one row ``(modularity, n_communities)``."""
    return per_community.agg(
        F.sum("q_contrib").alias("modularity"),
        F.count(F.lit(1)).alias("n_communities"),
    )
