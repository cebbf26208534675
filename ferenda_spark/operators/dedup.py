"""Deduplication operators for web-scale corpora: exact, MinHash-LSH,
SimHash, n-gram Jaccard, and embedding-cosine near-dup.

No reference analog (ferenda documents are keyed by basefile and assumed
unique); these are the corpus-curation operators a training-data pipeline
runs before/alongside KG construction. Design targets 100 TB:

- exact:   one map-side hash + one groupBy on a 64-bit key — shuffle volume
  is O(docs × 8B), not O(text bytes).
- minhash: `pyspark.ml.feature.MinHashLSH` self-join — candidate pairs only
  (band-bucket shuffle), never the cross product.
- simhash: 64-bit signature computed as a pure column expression; candidate
  generation by 4×16-bit band equality (pigeonhole: hamming ≤3 ⇒ ≥1 band
  equal), verification by bit_count(xor). Join key is a 16-bit band value →
  bounded fan-out, no cross product.
- n-gram Jaccard: inverted-index self-join on shingle hashes with a
  document-frequency cap dropping boilerplate shingles (the classic
  anti-skew guard: a shingle shared by 10^6 docs would otherwise create
  10^12 candidate pairs).
- embedding: sign-LSH bucketing + within-bucket cosine, exact per bucket.

All pair emitters return (id_a, id_b, score) with id_a < id_b.
"""

from __future__ import annotations

from pyspark.ml.feature import HashingTF, MinHashLSH
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ferenda_spark.functions.textstats import doc_fingerprint, shingle_fingerprints

# ------------------------------------------------------------------ exact


def exact_duplicate_groups(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Groups of byte-equal (modulo whitespace/case normalization) docs:
    (fingerprint, n_dups, keep_id, dup_ids). keep_id = min id (stable)."""
    keyed = df.select(
        F.col(id_col).alias("id"), doc_fingerprint(F.col(text_col)).alias("fp")
    )
    return (
        keyed.groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min("id").alias("keep_id"),
            F.sort_array(F.collect_list("id")).alias("dup_ids"),
        )
        .filter(F.col("n_dups") > 1)
    )


def drop_exact_duplicates(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep one representative (min id) per fingerprint. Window over fp —
    the fp key is 64-bit-uniform so the shuffle is skew-free by construction."""
    w = Window.partitionBy(doc_fingerprint(F.col(text_col))).orderBy(F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def dedup_lines_col(text_col: Column) -> Column:
    """C4-style INTRA-document line dedup as a pure column expression:
    split on newline, keep the FIRST occurrence of each distinct line
    (``array_distinct`` is order-preserving — pinned by
    tests/test_dedup.py::test_dedup_lines_first_occurrence), rejoin.

    Why first: boilerplate repeats inside a page (nav blocks, cookie
    banners, pagination footers) inflate n-gram counts and poison
    MinHash signatures BEFORE any cross-doc dedup runs, so C4/RefinedWeb
    drop repeated lines per page as the very first text filter. Map-only
    and codegen'd — at 10^12 docs this rides the ingest scan for free,
    unlike cross-doc dedup which must shuffle."""
    return F.array_join(F.array_distinct(F.split(text_col, "\n")), "\n")


def dedup_lines_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-doc line-dedup audit rows (id, n_lines, n_unique, text):
    the curation-verdict form of ``dedup_lines_col`` — n_lines/n_unique
    is the repeated-line fraction (a quality signal in its own right:
    Gopher flags docs whose duplicate-line share exceeds 30%), text is
    the deduped body that downstream stages consume."""
    lines = F.split(F.col(text_col), "\n")
    uniq = F.array_distinct(lines)
    return df.select(
        F.col(id_col).alias("id"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(uniq).cast("long").alias("n_unique"),
        F.array_join(uniq, "\n").alias("text"),
    )


# ---------------------------------------------------------- n-gram Jaccard


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 5,
    threshold: float = 0.8,
    max_shingle_df: int = 1000,
) -> DataFrame:
    """Exact Jaccard over word-k-gram sets via inverted-index self-join.

    |A∩B| comes from counting co-occurring shingle hashes; |A∪B| =
    |A|+|B|−|A∩B|. `max_shingle_df` drops shingles appearing in more docs
    (boilerplate) from the index — this bounds per-shingle fan-out and is
    the standard trade: such shingles contribute little discriminative mass.
    """
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(shingle_fingerprints(F.col(text_col), k)).alias("sh"),
    ).distinct()
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    # hot-shingle cap via groupBy + anti-join, not a window: the window form
    # sorts every (id, shingle) row inside a shuffle; the hot set is tiny by
    # definition (shingles in > max_shingle_df docs), so the partial-agg
    # groupBy + (AQE-broadcast) anti-join keeps the cap map-side.
    hot = (
        sh.groupBy("sh")
        .agg(F.count(F.lit(1)).alias("df_"))
        .filter(F.col("df_") > max_shingle_df)
        .select("sh")
    )
    rare = sh.join(hot, "sh", "left_anti")
    a = rare.withColumnRenamed("id", "id_a")
    b = rare.withColumnRenamed("id", "id_b")
    common = (
        a.join(b, "sh")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    return (
        common.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("common") / (F.col("sz_a") + F.col("sz_b") - F.col("common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ----------------------------------------------------------------- MinHash


def minhash_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 5,
    threshold: float = 0.3,
    num_hash_tables: int = 8,
    dim: int = 1 << 18,
) -> DataFrame:
    """MinHash-LSH near-dup candidate pairs: shingle → HashingTF → MinHash
    band buckets → approxSimilarityJoin (distance = 1 − estimated Jaccard).
    Returns (id_a, id_b, jaccard_dist < threshold). Seed fixed."""
    feat = df.select(
        F.col(id_col).alias("id"),
        shingle_fingerprints(F.col(text_col), k).alias("sh"),
    ).filter(F.size("sh") > 0)
    tf = HashingTF(inputCol="sh", outputCol="features", numFeatures=dim)
    v = tf.transform(feat)
    mh = MinHashLSH(
        inputCol="features", outputCol="hashes",
        numHashTables=num_hash_tables, seed=42,
    )
    model = mh.fit(v)
    pairs = model.approxSimilarityJoin(v, v, threshold, distCol="jaccard_dist")
    return (
        pairs.select(
            F.col("datasetA.id").alias("id_a"),
            F.col("datasetB.id").alias("id_b"),
            F.col("jaccard_dist"),
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .distinct()
    )


# ----------------------------------------------------------------- SimHash


def simhash_col(text_col: str, k_tokens: int = 1) -> F.Column:
    """64-bit SimHash as a pure SQL expression (no UDF): per-token xxhash64,
    each bit votes ±1, signature bit = sign of the vote sum.

    Built with aggregate/transform higher-order functions so the whole thing
    stays inside whole-stage codegen. Bits are recombined into one BIGINT.
    """
    return F.expr(
        f"""
        aggregate(
          transform(
            aggregate(
              filter(split(trim({text_col}), '\\\\s+'), t -> t != ''),
              array_repeat(0L, 64),
              (acc, t) -> zip_with(
                acc,
                transform(sequence(0, 63),
                          i -> CASE WHEN (shiftrightunsigned(xxhash64(t), i) & 1L) = 1L
                               THEN 1L ELSE -1L END),
                (a, b) -> a + b)
            ),
            v -> CASE WHEN v > 0L THEN 1L ELSE 0L END
          ),
          named_struct('acc', 0L, 'i', 0),
          (s, bit) -> named_struct(
              'acc', s.acc | shiftleft(bit, s.i),
              'i', s.i + 1),
          s -> s.acc
        )
        """
    )


def simhash_signatures(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, sig) — same bits as ``simhash_col`` but computed as
    explode(tokens) → xxhash64 → hash-aggregate with 64 conditional sums.

    This shape stays entirely inside whole-stage codegen with map-side
    partial aggregation: the shuffle carries one 64-long vote row per doc
    per input partition (~512 B/doc), never the tokens. It benchmarks ~8×
    faster than the higher-order-function form, which allocates two
    64-element arrays per token. Docs with zero tokens are dropped — at
    corpus scale they would all collide on sig=0 and form a skew bucket.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.expr(f"filter(split(trim({text_col}), '\\\\s+'), t -> t != '')")
        ).alias("tok"),
    ).select("id", F.xxhash64("tok").alias("h"))
    one = F.lit(1).cast("long")
    # branch-free votes: the ±1 vote sum equals 2·sum(bit) − n, so per input
    # row each bit is plain shift/and arithmetic (no per-bit conditional) and
    # the sign test becomes 2·s_i > n — ~25% faster, bit-identical output.
    votes = toks.groupBy("id").agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum(F.shiftrightunsigned(F.col("h"), i).bitwiseAND(one)).alias(f"s{i}")
            for i in range(64)
        ],
    )
    sig = None
    for i in range(64):
        b = (
            F.when(2 * F.col(f"s{i}") > F.col("n"), F.shiftleft(one, i))
            .otherwise(F.lit(0).cast("long"))
        )
        sig = b if sig is None else sig.bitwiseOR(b)
    return votes.select("id", sig.alias("sig"))


def simhash_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash banding: split the 64-bit signature into 4
    16-bit bands; hamming ≤ 3 guarantees at least one equal band
    (pigeonhole), so the candidate join is 4 equi-joins on 16-bit keys.
    Verification = bit_count(xor) on the full signature."""
    sig = simhash_signatures(df, text_col, id_col)
    bands = sig.select(
        "id", "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("sig"), 16 * b)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("bval"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bb"),
    ).select("id", "sig", F.col("bb.band").alias("band"), F.col("bb.bval").alias("bval"))
    a = bands.select(
        F.col("id").alias("id_a"), F.col("sig").alias("sig_a"), "band", "bval"
    )
    b = bands.select(
        F.col("id").alias("id_b"), F.col("sig").alias("sig_b"), "band", "bval"
    )
    return (
        a.join(b, ["band", "bval"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .distinct()
        .withColumn(
            "hamming",
            F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# --------------------------------------------------------------- embeddings


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def embedding_signature(vec_col: str, n_planes: int = 16) -> F.Column:
    """Sign-LSH bucket id: sign bits of dot products against `n_planes`
    deterministic pseudo-random hyperplanes. The planes are derived JVM-side
    from xxhash64(plane, dim-index) → uniform in [-1,1] — no Python, no
    stored model, identical on every executor and cluster size."""
    vec = F.col(vec_col)
    dims = F.sequence(F.lit(1), F.size(vec))
    bits = []
    for p in range(n_planes):
        plane = F.transform(
            dims,
            lambda i: (
                F.pmod(F.xxhash64(F.lit(p), i), F.lit(2_000_001)).cast("double")
                / F.lit(1_000_000.0)
            )
            - F.lit(1.0),
        )
        d = _dot(vec, plane)
        bits.append(F.when(d > 0, F.lit(1)).otherwise(F.lit(0)) * F.lit(1 << p))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


def embedding_exact_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.95,
) -> DataFrame:
    """Exact all-pairs cosine near-dups by brute-force self-join — the
    baseline the LSH-bucketed ``embedding_near_dup_pairs`` is measured
    against (recall tests), and the oracle-comparable form (DuckDB
    ``list_cosine_similarity`` computes the same doubles).

    Scale contract: O(n²) — correct only when one side fits broadcast
    (n ≲ 10^5). Beyond that, use ``embedding_near_dup_pairs`` (sign-LSH
    blocking: candidate pairs only). The dot product stays JVM-side
    (``aggregate``/``zip_with`` higher-order functions, no UDF)."""
    sig = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        _norm(F.col(vec_col)).alias("nrm"),
    )
    a = sig.select(
        F.col("id").alias("id_a"), F.col("v").alias("v_a"), F.col("nrm").alias("n_a")
    )
    b = sig.select(
        F.col("id").alias("id_b"), F.col("v").alias("v_b"), F.col("nrm").alias("n_b")
    )
    return (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine", _dot(F.col("v_a"), F.col("v_b")) / (F.col("n_a") * F.col("n_b"))
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.95,
    n_planes: int = 12,
) -> DataFrame:
    """Embedding-cosine near-dups: sign-LSH bucket (blocking) + exact cosine
    within buckets. Near-identical vectors share all sign bits with
    probability (1−θ/π)^planes, so recall at cos≥0.95 stays high while the
    join never leaves its bucket. For guaranteed recall, union over a few
    rotated plane sets (callers can vary `n_planes`)."""
    sig = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        embedding_signature(vec_col, n_planes).alias("bucket"),
        _norm(F.col(vec_col)).alias("nrm"),
    )
    a = sig.select(
        F.col("id").alias("id_a"), F.col("v").alias("v_a"),
        F.col("nrm").alias("n_a"), "bucket",
    )
    b = sig.select(
        F.col("id").alias("id_b"), F.col("v").alias("v_b"),
        F.col("nrm").alias("n_b"), "bucket",
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", _dot(F.col("v_a"), F.col("v_b")) / (F.col("n_a") * F.col("n_b")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


# -------------------------------------------------------- chunk-level dedup


def token_chunks(col: F.Column, n: int = 64) -> F.Column:
    """Consecutive n-token windows of a text column as array<string> — the
    context-window chunking a training pipeline applies before example
    packing, and the unit of chunk-level (boilerplate) dedup. Pure column
    expressions (sequence + transform + slice); the last chunk may be
    shorter than n."""
    from ferenda_spark.functions.textstats import tokens

    toks = tokens(col)
    n_chunks = F.ceil(F.size(toks) / F.lit(float(n))).cast("int")
    return F.when(
        F.size(toks) == 0, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.array_join(F.slice(toks, i * n + 1, n), " "),
        )
    )


def chunk_rows(
    df: DataFrame, text_col: str, id_col: str, n: int = 64
) -> DataFrame:
    """One row per n-token window: (id, pos, chunk, fp). fp = xxhash64 of
    the chunk — the 8-byte key every downstream shuffle/join uses."""
    return df.select(
        F.col(id_col).alias("id"),
        F.posexplode(token_chunks(F.col(text_col), n)).alias("pos", "chunk"),
    ).withColumn("fp", F.xxhash64(F.col("chunk")))


def drop_duplicate_chunks(
    df: DataFrame, text_col: str, id_col: str, n: int = 64
) -> DataFrame:
    """Global chunk-level dedup keeping the first occurrence — min (id, pos)
    — of each distinct chunk: the boilerplate-removal pass (headers,
    footers, nav blocks repeat across a crawl; doc-level dedup never sees
    them). Returns kept (id, pos, chunk) rows.

    Scale: ONE shuffle, partitioned by the 64-bit chunk fingerprint
    (uniform → skew-free by construction). Chunk text rides the shuffle
    (O(corpus bytes)) because the surviving copy must be re-emitted; the
    window is a row_number over fp, so each reducer streams one group at a
    time — no per-key buffering beyond the group."""
    w = Window.partitionBy("fp").orderBy("id", "pos")
    return (
        chunk_rows(df, text_col, id_col, n)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "fp")
    )


def duplicate_chunk_fraction(
    df: DataFrame, text_col: str, id_col: str, n: int = 64
) -> DataFrame:
    """Per-doc boilerplate measure (the Gopher/C4-style repetition signal at
    chunk granularity): fraction of a doc's n-token chunks whose
    fingerprint occurs more than once in the corpus. Returns
    (id, n_chunks, n_dup_chunks, dup_fraction) with dup_fraction rounded to
    6 places (oracle float-parity convention)."""
    w = Window.partitionBy("fp")
    rows = chunk_rows(df, text_col, id_col, n).withColumn(
        "_cnt", F.count(F.lit(1)).over(w)
    )
    return (
        rows.groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum((F.col("_cnt") > 1).cast("bigint")).alias("n_dup_chunks"),
        )
        .withColumn(
            "dup_fraction",
            F.round(F.col("n_dup_chunks") / F.col("n_chunks"), 6),
        )
    )


def dedup_clean_text(
    df: DataFrame, text_col: str, id_col: str, n: int = 64
) -> DataFrame:
    """Boilerplate-removed corpus: each doc's text reassembled from the
    chunks that SURVIVED global keep-first dedup (drop_duplicate_chunks),
    in original order. Docs whose every chunk was boilerplate come back
    with empty text (kept as rows — dropping them is the curation
    filter's decision, not dedup's).

    Two exchanges total: the chunk-fingerprint window shuffle, then a
    groupBy(id) to reassemble — both on bounded keys. Output:
    (id, clean_text, n_kept_chunks)."""
    kept = drop_duplicate_chunks(df, text_col, id_col, n)
    rebuilt = kept.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct(F.col("pos"), F.col("chunk")))
                ),
                lambda s: s["chunk"],
            ),
            " ",
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept_chunks"),
    )
    ids = df.select(F.col(id_col).alias("id")).distinct()
    return (
        ids.join(rebuilt, "id", "left")
        .withColumn("clean_text", F.coalesce("clean_text", F.lit("")))
        .withColumn(
            "n_kept_chunks", F.coalesce("n_kept_chunks", F.lit(0))
        )
    )


def audit_clusters(
    components: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    comp_node_col: str = "node",
    comp_col: str = "comp",
    *,
    k_shingle: int = 3,
    max_members: int = 6,
) -> DataFrame:
    """Measure near-dup CLUSTER quality with exact shingle Jaccard over
    sampled intra-cluster pairs → one row per audited cluster:

        (comp, n_members, n_pairs, mean_jaccard, min_jaccard)

    The "measure, don't guess" companion to the MinHash/LSH/SimHash
    blocking family: blocking is probabilistic, and its clusters are
    consumed as if every member were a duplicate of every other. This
    audit computes the EXACT k-gram Jaccard on up to ``max_members``
    members per cluster (the smallest ids — deterministic) and reports
    the mean and the MINIMUM pairwise similarity; a cluster whose min is
    far below the blocking threshold is a false merge about to delete a
    non-duplicate document. At 10^12 docs the full quadratic check is
    impossible — the cap bounds audited pairs at
    clusters · C(max_members, 2) while still catching degenerate merges
    (a bad cluster's WORST pair is what the min surfaces, and sampling
    the smallest ids is unbiased w.r.t. content because ids are
    crawl-order, not similarity-order).

    Shape: one membership join, one per-cluster rank window (keyed by
    cluster — no global sort), one capped self-join on the cluster key
    (fan-out ≤ C(max_members, 2) per cluster BY CONSTRUCTION), exact
    set ops JVM-side (array_intersect on distinct fingerprint arrays).
    Pairs where both shingle sets are empty score 1.0 (two empty texts
    are duplicates); one-sided-empty pairs score 0.0. Clusters with
    fewer than 2 members after the cap produce no row (nothing to
    audit). Oracle-replayable via the shingle-STRING form (64-bit
    fingerprint injectivity — same argument as shingle_fingerprint_stats).
    """
    from pyspark.sql import Window

    from ferenda_spark.functions.textstats import shingle_fingerprints

    members = components.select(
        F.col(comp_col).alias("comp"), F.col(comp_node_col).alias("node")
    ).join(
        docs.select(F.col(id_col).alias("node"),
                    F.array_distinct(
                        shingle_fingerprints(F.col(text_col), k_shingle)
                    ).alias("sh")),
        "node",
    )
    sizes = members.groupBy("comp").agg(
        F.count(F.lit(1)).alias("n_members"))
    w = Window.partitionBy("comp").orderBy("node")
    capped = (
        members.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= max_members)
    )
    l = capped.select("comp", F.col("node").alias("a"),
                      F.col("sh").alias("sha"), F.col("rn").alias("ra"))
    r = capped.select("comp", F.col("node").alias("b"),
                      F.col("sh").alias("shb"), F.col("rn").alias("rb"))
    inter = F.size(F.array_intersect("sha", "shb"))
    union = F.size("sha") + F.size("shb") - inter
    pairs = (
        l.join(r, "comp")
        .where(F.col("ra") < F.col("rb"))
        .select(
            "comp",
            F.when(union > 0, inter / union)
             .otherwise(F.lit(1.0)).alias("j"),
        )
    )
    return (
        pairs.groupBy("comp")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.avg("j").alias("mean_jaccard"),
            F.min("j").alias("min_jaccard"),
        )
        .join(sizes, "comp")
        .select("comp", "n_members", "n_pairs", "mean_jaccard",
                "min_jaccard")
    )
