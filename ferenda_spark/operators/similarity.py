"""Similarity search over embedding columns: brute-force cosine top-k
(exact baseline) and an IVF-style cell-probed variant (the scale path).

No reference analog (ferenda delegates search to an external fulltext
index, [ref: ferenda/fulltextindex.py]); this is the ANN surface a
training-data pipeline needs over `array<float>` embedding columns.

Scale design:
- brute force: one narrow projection computing the dot product via
  `aggregate(zip_with(...))` (JVM-side, codegen'd) + TakeOrderedAndProject —
  O(N·d) flops, no shuffle, exact. The right tool up to ~10^8 vectors/query
  batch; the baseline every ANN variant is measured against.
- IVF: k-means-free inverted-file — centroids are a deterministic sample of
  the corpus (vec_id % stride), every vector is assigned to its nearest
  centroid once (broadcast centroids, exact argmin), queries probe the
  `n_probe` nearest cells. Recall/latency trades via n_cells × n_probe.
  Assignment is the only shuffle (groupBy cell on write), and probing prunes
  the scan to n_probe/n_cells of the corpus — the 100 TB path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ferenda_spark.sources import catalog


def dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a) -> F.Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def _query_lit(query_vec: list[float]) -> F.Column:
    return F.array(*[F.lit(float(x)) for x in query_vec])


def cosine_to(vec_col: str, query_vec: list[float]) -> F.Column:
    q = _query_lit(query_vec)
    return dot(F.col(vec_col), q) / (norm(F.col(vec_col)) * norm(q))


def brute_force_topk(
    df: DataFrame, vec_col: str, id_col: str, query_vec: list[float], k: int = 10
) -> DataFrame:
    """Exact cosine top-k: orderBy+limit compiles to TakeOrderedAndProject
    (per-partition heap + driver merge of k rows — no global sort)."""
    return (
        df.select(
            F.col(id_col).alias("id"),
            cosine_to(vec_col, query_vec).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("id"))
        .limit(k)
    )


# ----------------------------------------------------------------------- IVF


def build_ivf_index(
    df: DataFrame, vec_col: str, id_col: str, n_cells: int = 16
) -> tuple[DataFrame, list[tuple[int, list[float]]]]:
    """Assign every vector to its nearest of `n_cells` deterministic
    centroids. Returns (indexed df with `cell` column, centroids).

    Centroid choice is a deterministic hash-mod sample: keep rows where
    ``xxhash64(id) % stride == 0`` (expected ~2·n_cells candidates with the
    halved stride below — oversampled so hash variance can't under-fill),
    then the n_cells hash-smallest of those. No global sort anywhere: the
    filter is a map-only projection and the orderBy+limit compiles to
    TakeOrderedAndProject (per-partition heap of n_cells rows + driver
    merge) — the previous row_number-over-unpartitioned-Window pulled the
    whole corpus through ONE task, a 100 TB scale-killer. Still
    deterministic across runs AND cluster sizes (pure function of ids, no
    partition-order dependence). At 100 TB n_cells is O(√N); the centroid
    list stays driver-small and broadcasts.
    """
    n = df.count()
    # oversample ~2x so the hash-mod filter practically never yields fewer
    # than n_cells candidates, then cut back deterministically
    stride = max(n // (2 * n_cells), 1)

    def _sample(s: int) -> list[tuple[int, list[float]]]:
        rows = (
            df.select(
                F.col(id_col).alias("cid"),
                F.col(vec_col).alias("cvec"),
                F.xxhash64(F.col(id_col)).alias("_h"),
            )
            .filter(F.pmod(F.col("_h"), F.lit(s)) == 0)
            .orderBy(F.col("_h"), F.col("cid"))
            .limit(n_cells)
            .drop("_h")
            .collect()
        )
        return [(int(r["cid"]), [float(x) for x in r["cvec"]]) for r in rows]

    centroids = _sample(stride)
    if len(centroids) < min(n_cells, n) and stride > 1:
        # binomial tail: the 2x oversample can still under-fill for small n /
        # small n_cells — fall back to the n_cells hash-smallest of ALL rows
        # (stride=1; same TakeOrderedAndProject shape, just unfiltered) so
        # the cell list is never silently short and cell balance holds
        centroids = _sample(1)

    cent_struct = F.array(
        *[
            F.struct(F.lit(i).alias("cell"), _query_lit(v).alias("cvec"))
            for i, (_, v) in enumerate(centroids)
        ]
    )
    # nearest centroid by cosine: score each, sort desc, take first — one
    # projection, no shuffle. (centroids are literals: broadcast-by-plan)
    scored = F.transform(
        cent_struct,
        lambda c: F.struct(
            (dot(F.col(vec_col), c["cvec"]) / (norm(F.col(vec_col)) * norm(c["cvec"]))).alias("score"),
            c["cell"].alias("cell"),
        ),
    )
    indexed = df.withColumn("cell", F.sort_array(scored, asc=False)[0]["cell"])
    return indexed, centroids


def write_ivf_index(indexed: DataFrame, path: str) -> None:
    """Materialize the indexed table CELL-PARTITIONED through the catalog
    seam: with the table laid out as ``cell=<i>/`` directories,
    ``ivf_topk``'s ``cell ∈ probes`` filter is partition PRUNING — only
    n_probe/n_cells of the files are listed, let alone read — instead of a
    post-scan filter. This is what makes IVF the 100 TB path in practice."""
    catalog.overwrite_partitions(indexed, path, partition_by=("cell",))


def read_ivf_index(spark: SparkSession, path: str) -> DataFrame:
    return catalog.read_table(spark, path)


def ivf_topk(
    indexed: DataFrame,
    centroids: list[tuple[int, list[float]]],
    vec_col: str,
    id_col: str,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 4,
) -> DataFrame:
    """Probe the n_probe nearest cells, exact cosine within them.

    Cell selection happens driver-side on the tiny centroid list (pure
    Python math on O(n_cells) values); the Spark plan is then
    filter(cell ∈ probes) → cosine → top-k, and with the index written as
    cell-partitioned Parquet the filter becomes partition pruning.
    """
    import math

    qn = math.sqrt(sum(x * x for x in query_vec))

    def cos(v):
        d = sum(a * b for a, b in zip(v, query_vec))
        vn = math.sqrt(sum(a * a for a in v))
        return d / (vn * qn) if vn and qn else 0.0

    ranked = sorted(
        range(len(centroids)), key=lambda i: (-cos(centroids[i][1]), i)
    )
    probes = ranked[:n_probe]
    return (
        indexed.filter(F.col("cell").isin(probes))
        .select(
            F.col(id_col).alias("id"), cosine_to(vec_col, query_vec).alias("cosine")
        )
        .orderBy(F.desc("cosine"), F.asc("id"))
        .limit(k)
    )
