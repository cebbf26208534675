"""Graph analytics over the harvested web/entity graphs: BFS distances,
label-propagation communities, k-core decomposition, Adamic-Adar link
prediction, and Weisfeiler-Lehman structural colors.

Reference analog: none in ferenda (a 10^4-doc curated corpus never needs
graph algorithms) — these are the standard companions of the operators the
north_rule does mandate (pagerank/hits quality priors, connected-component
entity clustering, triangle counting in ``graph.py``): seed-distance
crawl-frontier scoring (BFS), community detection for topic/host grouping
(LPA), spam-farm core extraction (k-core is the classic dense-subgraph
primitive for link-spam detection), alias-candidate generation beyond
string similarity (Adamic-Adar over the co-mention graph), and
blank-node-stable structural fingerprints for graph diffing (WL colors —
the 1-dimensional Weisfeiler-Lehman refinement that underlies canonical
RDF dataset hashing).

Shared scale discipline (same as graph.py):

- every iterative loop ``localCheckpoint``s its per-round state so lineage
  stays O(1) — without it Catalyst analysis time doubles per round;
- the symmetrized edge set is computed once and persisted; rounds reuse it;
- per-round shuffles are equi-keyed on node ids (map-side combinable,
  AQE-splittable); nothing ever collects to the driver;
- convergence probes are ``limit(1)`` existence checks, never counts, and
  every fixed-point loop is monotone, so running extra rounds is a no-op —
  which is exactly what makes the unrolled-SQL oracles in
  ``__spark_entry__.py`` replayable: both engines land on the same fixed
  point regardless of when each stops.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ferenda_spark.checkpoint import RoundCadence as _RoundCadence
from ferenda_spark.checkpoint import truncate_checkpoint as _tckpt

from .graph import _unpersist_checkpoint


def _undirected(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Symmetrized, self-loop-free, deduped edge set as (a, b)."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).filter(
        F.col("a") != F.col("b")
    )
    return e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()


def bfs_distances(
    edges: DataFrame,
    sources: DataFrame | Iterable,
    src: str = "src",
    dst: str = "dst",
    *,
    max_hops: int = 10,
    directed: bool = False,
) -> DataFrame:
    """Multi-source BFS: minimum hop distance from any source node.

    Returns ``(node, dist)`` for every node reachable within ``max_hops``
    (sources themselves at dist 0); unreachable nodes are absent. ``sources``
    is a one-column DataFrame or a plain iterable of node ids.

    Frontier-only relaxation: round h joins ONLY the nodes first reached at
    h-1 against the edge list, anti-joins the already-settled set, and the
    survivors ARE the dist=h rows (BFS by rounds means first-touch = min
    dist — no re-relaxation, no min-aggregation over settled nodes). Each
    round is one edge-keyed equi-join + one anti-join, both shuffles
    bounded by the frontier size, not the graph; on a 1000-executor
    cluster the expensive early rounds are frontier-small and the late
    rounds are frontier-sparse. Stops early (limit-1 probe) when the
    frontier empties — extra rounds would be no-ops, which keeps the
    operator equivalent to a fixed-round unrolled replay.
    """
    sess = edges.sparkSession
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).filter(
        F.col("a") != F.col("b")
    )
    if not directed:
        e = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    e = e.distinct().persist()

    if not isinstance(sources, DataFrame):
        schema_col = e.schema["a"].dataType
        sources = sess.createDataFrame(
            [(v,) for v in sources], f"node {schema_col.simpleString()}"
        )
    first = sources.columns[0]
    cad = _RoundCadence()
    settled = cad.seed(
        sources.select(F.col(first).alias("node"))
        .distinct()
        .withColumn("dist", F.lit(0))
    )
    frontier = settled

    try:
        for h in range(1, max_hops + 1):
            cand = (
                frontier.join(e, frontier["node"] == e["a"])
                .select(F.col("b").alias("node"))
                .distinct()
            )
            # flatten mid-round: the settled-union below must reference
            # the FLATTENED frontier, not embed its raw anti-join subtree
            # a second time (see RoundCadence.flatten)
            new = cad.flatten(
                cand.join(settled.select("node"), "node", "left_anti")
                .withColumn("dist", F.lit(h))
            )
            # frontier and settled stay live ACROSS rounds — one cadence
            # step carries both (see RoundCadence.step_many); the
            # emptiness probe materializes the round's (cached) frontier.
            # Rebind BEFORE probing: a cadence round frees every earlier
            # round's frame, so the pre-step `settled` may be dead by now —
            # and on an empty frontier nxt == settled as a set anyway.
            new, nxt = cad.step_many([new, settled.unionByName(new)])
            settled, frontier = nxt, new
            if not new.limit(1).take(1):
                break
        return cad.finish(settled)
    finally:
        cad.close()
        e.unpersist()


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    n_iter: int = 5,
) -> DataFrame:
    """Synchronous label-propagation community detection → (node, label).

    Every node starts labeled with its own id; each of the ``n_iter``
    rounds relabels every node to its neighbors' most frequent label,
    ties broken by the SMALLEST label — the deterministic variant (plain
    LPA's random tie-break is irreproducible across cluster sizes, which
    violates this repo's re-run-stability contract; min-tie-break is the
    standard fix and what the unrolled-SQL oracle replays). Fixed
    iteration count, no convergence probe: synchronous LPA can oscillate
    on bipartite structures, so "run k rounds" IS the spec.

    Per round: one edge-keyed join + one (node, label) count aggregation
    (map-side combined — a celebrity node's million same-label neighbors
    pre-reduce per map partition) + one per-node argmax. The argmax is
    computed as ``min(struct(-cnt, label))`` rather than a row_number
    window: an aggregation combines map-side and never materializes the
    sorted per-node candidate list the way a window would, and negating
    the count (not the label) keeps string node ids working.
    """
    und = _undirected(edges, src, dst).persist()
    cad = _RoundCadence()
    labels = cad.seed(
        und.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    try:
        for _ in range(n_iter):
            counts = (
                und.join(
                    labels.select(
                        F.col("node").alias("b"), F.col("label").alias("nl")
                    ),
                    "b",
                )
                .groupBy("a", "nl")
                .agg(F.count(F.lit(1)).alias("cnt"))
            )
            # argmax by (cnt DESC, label ASC) as min over (-cnt, label):
            # negating the COUNT (always numeric) instead of the label
            # keeps the tie-break correct for STRING node ids too (a
            # negated string column would silently cast to NULL)
            labels = cad.step(
                counts.groupBy("a")
                .agg(
                    F.min(
                        F.struct(
                            (-F.col("cnt")).alias("negc"),
                            F.col("nl").alias("lbl"),
                        )
                    ).alias("m")
                )
                .select(
                    F.col("a").alias("node"),
                    F.col("m.lbl").alias("label"),
                )
            )
        return cad.finish(labels)
    finally:
        cad.close()
        und.unpersist()


def k_core(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    *,
    max_iter: int = 50,
) -> DataFrame:
    """The k-core of an undirected graph: the maximal subgraph where every
    node has degree ≥ k. Returns ``(node, degree)`` — degree WITHIN the
    core. Classic peel loop: repeatedly delete nodes with degree < k until
    none remain. Peeling is monotone (the survivor set only shrinks) and
    its fixed point is unique, so the result is independent of deletion
    order — and an unrolled fixed-round SQL replay lands on the same set.

    Per round: one degree aggregation (map-side combined) + two anti-joins
    removing edges with a peeled endpoint; the anti-join's build side is
    the peeled-node set — small after the first rounds. ``localCheckpoint``
    per round truncates the shrinking edge set's lineage. Converges in
    ≤ peel-depth rounds (bounded by max degree, in practice tiny);
    ``max_iter`` is a pathology guard that raises rather than returning a
    superset of the core silently.

    Cadence interval=1 (eager checkpoint every round), deliberately: this
    loop runs a convergence probe EVERY round, so every round's state is
    materialized by an action regardless — there is no per-job latency to
    amortize across a window (the round-4 cadence's whole point), and the
    probe against a multi-round unflattened window only adds partial-
    materialization + deeper-compile overhead (measured at sf0.1:
    interval=1 beats interval=4 on every probe-per-round loop; fixed-round
    loops like BFS keep the default window).
    """
    cad = _RoundCadence(interval=1)
    und = cad.seed(_undirected(edges, src, dst))
    prev_bad = None
    try:
        for _ in range(max_iter):
            deg = und.groupBy("a").agg(F.count(F.lit(1)).alias("degree"))
            bad = deg.filter(F.col("degree") < k).select("a").persist()
            # this probe's shuffle fully materializes und (and with it the
            # previous round's lazily-cached peel) — only NOW is the
            # previous round's bad set done feeding lineage
            probe = bad.limit(1).take(1)
            if prev_bad is not None:
                prev_bad.unpersist()
            prev_bad = bad
            if not probe:
                return cad.finish(deg.withColumnRenamed("a", "node"))
            und = cad.step(
                und.join(bad, "a", "left_anti")
                .join(bad.withColumnRenamed("a", "b"), "b", "left_anti")
                .select("a", "b")
            )
    finally:
        if prev_bad is not None:
            prev_bad.unpersist()
        cad.close()
    raise RuntimeError(f"k_core did not converge in {max_iter} rounds")


def adamic_adar(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    top_k: int = 20,
    max_center_degree: int | None = 1000,
) -> DataFrame:
    """Adamic-Adar link prediction: for node pairs NOT already connected,
    score = Σ over common neighbors z of 1/ln(degree(z)). Returns the
    global top-``top_k`` candidate pairs ``(a, b, score)`` with a < b,
    score rounded to 6 places, ties broken by (a, b) — fully deterministic.

    The wedge join through the common neighbor z is the quadratic step:
    a hub with d neighbors produces d² candidate pairs while contributing
    only 1/ln(d) ≈ nothing to each score. ``max_center_degree`` drops such
    centers before the self-join (the standard cap in production link
    prediction — at Common-Crawl scale a 10^7-degree hub would otherwise
    emit 10^14 wedges for ~0.06 score each); the cap is part of the
    operator's definition and the SQL oracle replays it verbatim. Degree-1
    centers are skipped too (they form no wedge). Final top-k compiles to
    TakeOrderedAndProject — no global sort.

    No persist: the operator is lazy end-to-end, and the symmetrize+
    distinct Exchange behind ``und`` is REUSED across its four consumers
    (deg, both wedge sides, the existing-edge anti-join) by Spark's
    exchange reuse within the single evaluating action — the same stance
    as ``graph.triangle_count``; the iterative operators above persist
    because their loops run many separate actions.
    """
    und = _undirected(edges, src, dst)
    deg = und.groupBy("a").agg(F.count(F.lit(1)).alias("d"))
    centers = deg.filter(F.col("d") >= 2)
    if max_center_degree is not None:
        centers = centers.filter(F.col("d") <= max_center_degree)
    # neighbors grouped by center z, weighted by the center's AA mass
    nbrs = und.join(
        centers.select(F.col("a").alias("z"), F.col("d")),
        und["a"] == F.col("z"),
    ).select("z", F.col("b").alias("n"), (1.0 / F.log(F.col("d").cast("double"))).alias("w"))
    pairs = (
        nbrs.alias("l")
        .join(nbrs.alias("r"), F.col("l.z") == F.col("r.z"))
        .filter(F.col("l.n") < F.col("r.n"))
        .select(
            F.col("l.n").alias("a"),
            F.col("r.n").alias("b"),
            F.col("l.w").alias("w"),
        )
    )
    existing = und.filter(F.col("a") < F.col("b"))
    scored = (
        pairs.join(existing, ["a", "b"], "left_anti")
        .groupBy("a", "b")
        .agg(F.round(F.sum("w"), 6).alias("score"))
    )
    return scored.orderBy(F.desc("score"), F.asc("a"), F.asc("b")).limit(top_k)


def wl_colors(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    n_rounds: int = 3,
) -> DataFrame:
    """1-WL (Weisfeiler-Lehman) color refinement → (node, color) after
    ``n_rounds``; color is a 32-hex md5. Two nodes get equal colors iff
    their n_rounds-hop neighborhood trees are isomorphic — the structural
    fingerprint used for blank-node-stable graph digests (RDF dataset
    canonicalization hashes the same refinement) and graph-diff triage.

    color₀(v)   = md5(degree(v))
    colorₜ₊₁(v) = md5(colorₜ(v) || '|' || join(sort([colorₜ(u) : u∈N(v)]),','))

    The per-node sorted neighbor-color list is collected with
    ``sort_array(collect_list(...))`` — per-node state is O(degree), so a
    10^7-degree hub makes a long (but single-row, spillable) string; for
    graphs with such hubs, cap or sample neighbors upstream. Everything is
    codegen'd column expressions (md5/concat_ws/sort_array) — no UDF — and
    the identical expression chain replays in DuckDB
    (md5 / string_agg ORDER BY), which is what the oracle does.
    """
    und = _undirected(edges, src, dst).persist()
    cad = _RoundCadence()
    colors = cad.seed(
        und.groupBy("a")
        .agg(F.count(F.lit(1)).alias("d"))
        .select(
            F.col("a").alias("node"),
            F.md5(F.col("d").cast("string")).alias("color"),
        )
    )
    try:
        for _ in range(n_rounds):
            colors = cad.step(
                und.join(
                    colors.select(
                        F.col("node").alias("b"), F.col("color").alias("nc")
                    ),
                    "b",
                )
                .groupBy("a")
                .agg(
                    F.concat_ws(",", F.sort_array(F.collect_list("nc"))).alias(
                        "sig"
                    )
                )
                .join(colors.withColumnRenamed("node", "a"), "a")
                .select(
                    F.col("a").alias("node"),
                    F.md5(F.concat_ws("|", "color", "sig")).alias("color"),
                )
            )
        return cad.finish(colors)
    finally:
        cad.close()
        und.unpersist()


def graph_digest(colors: DataFrame) -> DataFrame:
    """Collapse WL colors into one structural digest row
    ``(n_nodes, digest)``: md5 over the sorted color multiset, encoded as
    sorted ``color:count`` pairs. Per-color counting is a map-side-combined
    aggregation; only the vocabulary-sized (distinct colors) list is
    collected into the final single-row reduce — never the node set."""
    per_color = colors.groupBy("color").agg(F.count(F.lit(1)).alias("cnt"))
    return per_color.agg(
        F.sum("cnt").cast("bigint").alias("n_nodes"),
        F.md5(
            F.concat_ws(
                ",",
                F.sort_array(
                    F.collect_list(
                        F.concat_ws(":", "color", F.col("cnt").cast("string"))
                    )
                ),
            )
        ).alias("digest"),
    )


def katz_centrality(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    alpha: float = 0.1,
    n_iter: int = 4,
) -> DataFrame:
    """Fixed-iteration Katz centrality → (node, katz), rounded to 6.

        x_{t+1}(v) = 1 + α · Σ over in-neighbors u of x_t(u),  x_0 = 1

    The walk-counting prior that complements PageRank (no out-degree
    normalization: a page is central if MANY paths lead to it, not many
    random walks) — with α below 1/λ_max the fixed iterations approximate
    the closed form; like ``graph.pagerank`` the iteration count is fixed
    (deterministic across cluster sizes) and the per-round cost is ONE
    edge-keyed, map-side-combined shuffle over the cached edge set, with
    ``localCheckpoint`` truncating lineage per round.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).filter(
        F.col("a") != F.col("b")
    ).distinct().persist()
    nodes = (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .distinct()
    )
    cad = _RoundCadence()
    x = cad.seed(nodes.withColumn("katz", F.lit(1.0)))
    try:
        for _ in range(n_iter):
            mass = (
                e.join(
                    x.select(F.col("node").alias("a"), F.col("katz").alias("xa")),
                    "a",
                )
                .groupBy("b")
                .agg(F.sum("xa").alias("m"))
                .withColumnRenamed("b", "node")
            )
            x = cad.step(
                nodes.join(mass, "node", "left")
                .select(
                    "node",
                    (
                        F.lit(1.0)
                        + F.lit(alpha) * F.coalesce("m", F.lit(0.0))
                    ).alias("katz"),
                )
            )
        return cad.finish(x).select("node", F.round("katz", 6).alias("katz"))
    finally:
        cad.close()
        e.unpersist()


def degree_assortativity(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Pearson degree assortativity of the undirected graph → one row
    ``(n_endpoints, r)``. Positive r: hubs link to hubs (social graphs);
    negative: hubs link to leaves (the web's signature) — the one-number
    diagnostic for whether a crawl frontier's link structure looks like
    organic web or a link farm.

    Computed from INTEGER sufficient statistics (Σx, Σy, Σxy, Σx², Σy², n
    over the symmetrized endpoint-degree pairs) — exact bigint aggregates,
    one double division at the end, rounded to 6: bit-replayable by any
    SQL engine, unlike engine-native corr() implementations with their
    own streaming-update orders."""
    und = _undirected(edges, src, dst)
    deg = und.groupBy("a").agg(F.count(F.lit(1)).alias("d"))
    pairs = und.join(
        deg.select(F.col("a"), F.col("d").alias("dx")), "a"
    ).join(
        deg.select(F.col("a").alias("b"), F.col("d").alias("dy")), "b"
    )
    s = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dx").alias("sx"),
        F.sum("dy").alias("sy"),
        F.sum(F.col("dx") * F.col("dy")).alias("sxy"),
        F.sum(F.col("dx") * F.col("dx")).alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    )
    return s.select(
        F.col("n").alias("n_endpoints"),
        F.round(num.cast("double") / den, 6).alias("r"),
    )


def diameter_estimate(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    max_hops: int = 64,
) -> DataFrame:
    """Double-sweep diameter lower bound → one row
    ``(seed, far_node, diameter_lb)``: BFS from the (deterministic)
    minimum node id to its farthest node, then BFS again from there —
    the classic 2-sweep heuristic, exact on trees and within a small
    factor on real web graphs, at the cost of TWO BFS runs instead of
    all-pairs. The two single-row collects (picking each sweep's
    periphery node) are scalar probes, same class as the triplestore's
    ASK boolean — never corpus-sized."""
    und_nodes = _undirected(edges, src, dst).select("a")
    seed = und_nodes.agg(F.min("a").alias("m")).collect()[0]["m"]
    d1 = bfs_distances(edges, [seed], src, dst, max_hops=max_hops)
    far1 = d1.orderBy(F.desc("dist"), F.asc("node")).limit(1).collect()[0]
    d2 = bfs_distances(edges, [far1["node"]], src, dst, max_hops=max_hops)
    far2 = d2.orderBy(F.desc("dist"), F.asc("node")).limit(1).collect()[0]
    sess = edges.sparkSession
    # node ids keep the edge column's own type (string hosts work like
    # every sibling operator here, not just bigint ids).
    id_type = edges.schema[src].dataType.simpleString()
    return sess.createDataFrame(
        [(seed, far2["node"], far2["dist"])],
        f"seed {id_type}, far_node {id_type}, diameter_lb int",
    )


def salsa(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """SALSA link analysis (Lempel & Moran, WWW 2000) in CLOSED FORM →
    ``(node, hub, auth)``.

    SALSA is HITS with the mutual-reinforcement replaced by two random
    walks on the bipartite hub/authority view, and its fixed point has an
    exact combinatorial solution — no power iteration at all: within a
    connected component of the bipartite graph the authority chain's
    stationary distribution is proportional to in-degree, and each
    component holds mass proportional to its share of authority nodes
    (the paper's uniform-over-components convention, §3.2):

        auth(v) = (|A_c(v)| / |A|) · (indeg(v) / Σ_{w ∈ A_c(v)} indeg(w))
        hub(u)  = (|H_c(u)| / |H|) · (outdeg(u) / Σ_{w ∈ H_c(u)} outdeg(w))

    where A/H are all nodes with in/out edges and A_c/H_c the ones in v's
    bipartite component. This is why SALSA displaced HITS in production
    web ranking (it resists the tightly-knit-community effect — a dense
    clique inflates HITS eigenvector mass but only earns SALSA its degree
    share) and why it's the cheapest of the family here: ONE connected-
    components run (O(log d) pointer-jumping rounds over an edge-sized
    frame, ``graph.connected_components``) plus two degree aggregations —
    versus a shuffle per iteration for pagerank/HITS/Katz. Scores are
    exact rationals of integer degree counts divided once at the end, so
    the SQL oracle replays them digit-for-digit (modulo one double
    rounding, handled by round-6 in the driver query).

    Self-loops drop, parallel edges collapse (DISTINCT) — the family's
    pinned graph semantics. Node ids may be any orderable type; the
    bipartite side-tag prefixes stringified ids ('h|'/'a|'), used only as
    CC keys, never returned.
    """
    from ferenda_spark.operators.graph import connected_components

    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    bip = e.select(
        F.concat(F.lit("h|"), F.col("src").cast("string")).alias("src"),
        F.concat(F.lit("a|"), F.col("dst").cast("string")).alias("dst"),
    )
    comp = connected_components(bip)

    def _side(deg: DataFrame, tag: str, score_name: str) -> DataFrame:
        # deg: (node, deg); weight by component share of this side
        tagged = deg.withColumn(
            "cc_key", F.concat(F.lit(tag), F.col("node").cast("string"))
        ).join(comp.withColumnRenamed("node", "cc_key"), "cc_key")
        per_comp = tagged.groupBy("comp").agg(
            F.sum("deg").alias("sdeg"), F.count(F.lit(1)).alias("nn")
        )
        total = tagged.select(
            F.count(F.lit(1)).cast("double").alias("tot")
        )
        # per_comp is component-keyed and can be node-sized on a
        # fragmented graph — equi-join (AQE broadcasts it when small),
        # never a forced broadcast
        return (
            tagged.join(per_comp, "comp")
            .crossJoin(F.broadcast(total))
            .select(
                "node",
                (
                    (F.col("nn") / F.col("tot"))
                    * (F.col("deg") / F.col("sdeg"))
                ).alias(score_name),
            )
        )

    hub = _side(
        e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        .withColumnRenamed("src", "node"),
        "h|", "hub",
    )
    auth = _side(
        e.groupBy("dst").agg(F.count(F.lit(1)).alias("deg"))
        .withColumnRenamed("dst", "node"),
        "a|", "auth",
    )
    out = (
        hub.join(auth, "node", "full_outer")
        .select(
            "node",
            F.coalesce("hub", F.lit(0.0)).alias("hub"),
            F.coalesce("auth", F.lit(0.0)).alias("auth"),
        )
    )
    e.unpersist()
    return out


def cocitation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    min_count: int = 1,
    max_out_degree: int | None = None,
) -> DataFrame:
    """Co-citation similarity (Small 1973; the web-graph variant is the
    classic related-page signal: two URLs are similar if many pages link
    to BOTH) → ``(a, b, n_common)`` with ``a < b``, one row per unordered
    pair of co-cited targets.

    Reference analog: none in ferenda — its citation graph is resolved
    exactly by grammar. At Common-Crawl scale co-citation over the
    harvested link graph (operators/weblinks.py) is the cheap
    related-entity candidate generator that complements Adamic-Adar
    (which scores EXISTING candidate pairs; this ENUMERATES them).

    Scale shape — the wedge explosion is the whole game: a source with
    out-degree k contributes k·(k-1)/2 pairs, so one hub page with 10^4
    outlinks yields 5·10^7 rows before aggregation. ``max_out_degree``
    drops sources above the cap BEFORE the self-join (the same
    degree-capped wedge strategy as graph.triangle_count). Capped sources
    are excluded, not sampled — counts are exact over the kept sources;
    callers needing the number of dropped hubs recompute the degree
    aggregate (one cheap map-side-combined groupBy). Distinct-ified
    edges, one equi-join on ``src``, one map-side-combined count keyed by
    the pair. AQE splits a residual hot pair.
    """
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).where(F.col(src).isNotNull() & F.col(dst).isNotNull()).distinct()
    if max_out_degree is not None:
        deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("_d"))
        e = e.join(deg.where(F.col("_d") <= max_out_degree), "src").drop("_d")
    l = e.select("src", F.col("dst").alias("a"))
    r = e.select("src", F.col("dst").alias("b"))
    return (
        l.join(r, "src")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .where(F.col("n_common") >= min_count)
    )


def bibliographic_coupling(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    min_count: int = 1,
    max_in_degree: int | None = None,
) -> DataFrame:
    """Bibliographic coupling (Kessler 1963): two pages are similar if
    they link to many COMMON targets → ``(a, b, n_shared)`` with
    ``a < b``. The transpose of :func:`cocitation`; the wedge cap is on
    target IN-degree (a target cited by k pages contributes k·(k-1)/2
    pairs — for the web that is every page linking to a homepage, so the
    cap is not optional at scale)."""
    t = edges.select(F.col(dst).alias("src"), F.col(src).alias("dst"))
    out = cocitation(
        t, min_count=min_count, max_out_degree=max_in_degree
    )
    return out.withColumnRenamed("n_common", "n_shared")


def betweenness_sample(
    edges: DataFrame,
    seeds: DataFrame | Iterable,
    src: str = "src",
    dst: str = "dst",
    *,
    max_depth: int = 10,
    directed: bool = False,
) -> DataFrame:
    """Pivot-sampled betweenness centrality (Brandes 2001 dependency
    accumulation; Brandes & Pich 2007 for the sampling estimator) →
    ``(node, delta_sum)``.

    ``delta_sum(v) = Σ_{s ∈ seeds} δ_s(v)`` is the RAW accumulated
    dependency over the sampled pivots; the unbiased estimate of full
    betweenness is ``(n / k) · delta_sum`` (k pivots, n nodes), and for
    undirected graphs the conventional figure halves that (each unordered
    pair is counted from both endpoints when summing over ALL sources).
    Scaling is left to the caller — the ranking, which is what link-spam
    triage and router-page detection actually consume, is scale-invariant.

    Why sampled: exact betweenness is one SSSP per NODE — 10^12 BFS
    traversals at corpus scale is not a plan. K pivots bound the work to
    K frontier sweeps + K backward passes (all K run TOGETHER, vectorized
    over the seed column), and Brandes-Pich show pivot sampling preserves
    the high-centrality ranking long before k approaches n.

    Shape: the forward phase is :func:`bfs_distances`' frontier-only
    relaxation with a path-count column — per round one edge-keyed
    equi-join + map-side-combined sigma sum + anti-join, all bounded by
    frontier size. Path counts ``sigma`` are doubles by design (they grow
    combinatorially; exact integers would overflow long on dense graphs —
    standard practice, and δ only ever needs their ratio). The backward
    phase re-derives the shortest-path-DAG edges with one
    state-edge-state join (cheaper than carrying predecessor lists
    through the loop), then walks levels deepest-first: one filtered
    join + aggregation per level. Both loops run under ``RoundCadence``.
    Depth capped at ``max_depth``: dependencies through paths longer than
    the cap are dropped (documented truncation — web graphs' effective
    diameter is ~6-8, see hyperball.py).
    """
    sess = edges.sparkSession
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).filter(
        F.col("a") != F.col("b")
    )
    if not directed:
        e = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    e = e.distinct().persist()

    if not isinstance(seeds, DataFrame):
        schema_col = e.schema["a"].dataType
        seeds = sess.createDataFrame(
            [(v,) for v in seeds], f"seed {schema_col.simpleString()}"
        )
    first = seeds.columns[0]

    cad = _RoundCadence()
    state = cad.seed(
        seeds.select(F.col(first).alias("seed")).distinct()
        .select("seed", F.col("seed").alias("node"),
                F.lit(0).alias("dist"), F.lit(1.0).alias("sigma"))
    )
    frontier = state
    max_d = 0
    try:
        # on a forward-phase failure the edge cache must not leak (the
        # normal path frees it after the backward phase)
        for h in range(1, max_depth + 1):
            cand = (
                frontier.join(e, frontier["node"] == e["a"])
                .groupBy("seed", F.col("b").alias("node"))
                .agg(F.sum("sigma").alias("sigma"))
            )
            new = cad.flatten(
                cand.join(state.select("seed", "node"), ["seed", "node"],
                          "left_anti")
                .select("seed", "node", F.lit(h).alias("dist"), "sigma")
            )
            # rebind BEFORE probing (cadence lifetime contract — see
            # bfs_distances): on an empty frontier nxt == state as a set
            new, nxt = cad.step_many([new, state.unionByName(new)])
            state, frontier = nxt, new
            if not new.limit(1).take(1):
                break
            max_d = h
        state = cad.finish(state)
    except BaseException:
        e.unpersist()
        raise
    finally:
        cad.close()

    # shortest-path-DAG edges (v -> w with dist_w = dist_v + 1), per seed
    sv = state.select("seed", F.col("node").alias("v"),
                      F.col("dist").alias("dv"),
                      F.col("sigma").alias("sigma_v"))
    sw = state.select(F.col("seed").alias("seed_w"),
                      F.col("node").alias("w"),
                      F.col("dist").alias("dw"),
                      F.col("sigma").alias("sigma_w"))
    p = (
        sv.join(e, sv["v"] == e["a"])
        .join(sw, (F.col("seed") == F.col("seed_w")) & (e["b"] == sw["w"]))
        .where(F.col("dw") == F.col("dv") + 1)
        .select("seed", "v", "w", "dv", "sigma_v", "sigma_w")
        # persist WITHOUT priming (the hyperball idiom): backward round 1
        # is p's only first consumer, so its job materializes the cache —
        # an explicit count() here would be one whole extra pass over the
        # DAG-edge join
        .persist()
    )

    bcad = _RoundCadence()
    delta = bcad.seed(
        state.where(F.col("dist") == max_d)
        .select("seed", "node", F.lit(0.0).alias("delta"))
    )
    try:
        for d in range(max_d - 1, -1, -1):
            lvl = bcad.flatten(
                p.where(F.col("dv") == d)
                .join(
                    delta.select("seed", F.col("node").alias("w"),
                                 F.col("delta").alias("dw_delta")),
                    ["seed", "w"], "left",
                )
                .groupBy("seed", F.col("v").alias("node"))
                .agg(
                    F.sum(
                        (F.col("sigma_v") / F.col("sigma_w"))
                        * (1.0 + F.coalesce("dw_delta", F.lit(0.0)))
                    ).alias("delta")
                )
            )
            # nodes at level d with no DAG successors (dead ends) carry 0
            zero = (
                state.where(F.col("dist") == d)
                .join(lvl.select("seed", "node"), ["seed", "node"],
                      "left_anti")
                .select("seed", "node", F.lit(0.0).alias("delta"))
            )
            delta = bcad.step(delta.unionByName(lvl).unionByName(zero))
        out = bcad.finish(
            delta.where(F.col("node") != F.col("seed"))
            .groupBy("node")
            .agg(F.sum("delta").alias("delta_sum"))
        )
    finally:
        bcad.close()
        e.unpersist()
        p.unpersist()
    return out


def k_truss(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    *,
    max_iter: int = 50,
) -> DataFrame:
    """The k-truss of an undirected graph: the maximal subgraph where
    every EDGE sits in ≥ k−2 triangles. Returns the surviving canonical
    edges ``(a, b, support)`` with ``a < b``, support counted WITHIN the
    truss.

    Why alongside k-core: trusses are the standard strictly-stronger
    cohesion filter (every k-truss ⊆ (k−1)-core) — for link-spam
    forensics the 4-truss keeps only edges embedded in overlapping
    triangles, which organic navigation rarely produces but paid link
    farms always do (Cohen 2008, the National-Security-Agency tech
    report that named the concept; production graph systems ship it as
    the dense-subgraph primitive).

    Peel loop: per round, count each edge's triangle support with the
    a<b<c oriented wedge join (one self-join on the lower endpoint + one
    existence semi-join — every triangle found exactly once, each round
    bounded by the CURRENT wedge count, which only shrinks), drop edges
    below k−2, stop when nothing drops. Peeling is monotone with a
    unique fixed point → unrolled fixed-round SQL replay lands on the
    same set (same argument as k_core). The oriented join bounds wedge
    fan-out by min-endpoint degree, the same O(√m) discipline as
    triangle_count; ``RoundCadence`` truncates the shrinking edge set;
    ``max_iter`` raises rather than silently returning a superset.
    """
    cad = _RoundCadence()
    e = cad.seed(
        _undirected(edges, src, dst).where(F.col("a") < F.col("b"))
    )
    try:
        for _ in range(max_iter):
            # oriented wedges from the shared LOW endpoint x: (x<y), (x<z),
            # y<z; the wedge closes iff (y,z) is an edge
            w1 = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
            w2 = e.select(F.col("a").alias("x"), F.col("b").alias("z"))
            tri = (
                w1.join(w2, "x")
                .where(F.col("y") < F.col("z"))
                .join(
                    e.select(F.col("a").alias("y"), F.col("b").alias("z")),
                    ["y", "z"],
                    "left_semi",
                )
            )
            sup = (
                tri.select(F.col("x").alias("a"), F.col("y").alias("b"))
                .unionAll(tri.select(F.col("x").alias("a"),
                                     F.col("z").alias("b")))
                .unionAll(tri.select(F.col("y").alias("a"),
                                     F.col("z").alias("b")))
                .groupBy("a", "b")
                .agg(F.count(F.lit(1)).alias("support"))
            )
            kept = cad.flatten(
                e.join(sup, ["a", "b"], "left")
                .select(
                    "a", "b",
                    F.coalesce("support", F.lit(0)).alias("support"),
                )
                .where(F.col("support") >= k - 2)
            )
            dropped = e.join(kept.select("a", "b"), ["a", "b"], "left_anti")
            kept2, probe = cad.step_many([kept, dropped.limit(1)])
            if not probe.take(1):
                return cad.finish(kept2)
            e = cad.step(kept2.select("a", "b"))
        raise RuntimeError(
            f"k_truss did not converge within {max_iter} rounds"
        )
    finally:
        cad.close()


def propagate_features(
    edges: DataFrame,
    features: DataFrame,
    node_col: str = "node",
    value_col: str = "value",
    src: str = "src",
    dst: str = "dst",
    *,
    hops: int = 2,
    include_self: bool = True,
    directed: bool = False,
) -> DataFrame:
    """k-hop neighborhood feature smoothing → ``(node, value)``: each hop
    replaces a node's value with the MEAN over its (optionally
    self-inclusive) neighborhood — the SGC/feature-propagation primitive
    (Wu et al. 2019 showed k rounds of this plus a linear model matches
    a GCN; the data-pipeline use is densifying sparse per-host signals:
    a freshly-crawled host inherits the smoothed quality/spam score of
    its link neighborhood).

    Distinct from this module's other spreaders: label_propagation is a
    discrete argmax, spread_labels is seed-anchored multi-class with a
    retention term; this is plain dense-signal smoothing — every node
    starts with a value and drifts toward its neighborhood mean.

    Semantics (oracle-replayable): symmetrized (unless ``directed``)
    deduped edges; ``include_self`` adds a self-loop to every FEATURED
    node, so isolated nodes keep their value instead of vanishing; nodes
    with no feature row contribute nothing and acquire the mean of their
    featured neighbors (standard missing-feature treatment). Fixed
    ``hops``, no convergence probe.

    Shape: one edge-keyed equi-join + one map-side-combined (node) mean
    per hop, cadence-checkpointed — identical per-round cost profile to
    pagerank's contribution shuffle (edge-sized, no growth across hops).
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).filter(
        F.col("a") != F.col("b")
    )
    if not directed:
        e = e.unionByName(e.select(F.col("b").alias("a"),
                                   F.col("a").alias("b")))
    e = e.distinct()
    state0 = features.select(
        F.col(node_col).alias("node"), F.col(value_col).alias("value")
    )
    if include_self:
        e = e.unionByName(
            state0.select(F.col("node").alias("a"),
                          F.col("node").alias("b"))
        ).distinct()
    e = e.persist()
    cad = _RoundCadence()
    state = cad.seed(state0)
    try:
        for _ in range(hops):
            state = cad.step(
                state.join(e, state["node"] == e["a"])
                .groupBy(F.col("b").alias("node"))
                .agg(F.avg("value").alias("value"))
            )
        return cad.finish(state)
    finally:
        cad.close()
        e.unpersist()
