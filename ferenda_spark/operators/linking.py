"""Tiered entity linking / canonicalization (north_star J3/J4).

Reference analog: LegalRef grammars + COIN URISpace resolve mention →
canonical URI ([ref: ferenda/sources/legal/se/legalref.py],
[ref: ferenda/thirdparty/coin.py]); the dictionary there is implicit in
grammar data. Here it is an explicit ``uri_dictionary`` table and the
linking is a three-tier join cascade:

tier 1 — exact:   broadcast hash join on normalized alias key (dictionary
                  ~10^4–10^6 rows ≪ broadcast threshold at any realistic
                  dictionary size; O(corpus) map-side, zero shuffle).
tier 2 — salted:  the same equi-join as a *shuffle* join with explicit key
                  salting, for deployments where the dictionary outgrows
                  broadcast. Mentions follow a Zipf law (FIXTURES: hottest
                  domain ≈30%), so a plain shuffle join puts the hottest
                  alias_key on one reducer; salting spreads each key over
                  SALT reducers by exploding the dictionary side ×SALT.
                  (AQE skew-join can split sort-merge stragglers at runtime,
                  but north_rule demands explicit handling — this is it.)
tier 3 — MinHash-LSH: unresolved mentions (typo'd surface forms) are
                  blocked against the dictionary by MinHash over character
                  3-gram sets and resolved to the best (lowest Jaccard
                  distance) candidate. This is the reference-free fuzzy path
                  the north_star adds on top of Ferenda's exact grammars.
"""

from __future__ import annotations

from pyspark.ml.feature import HashingTF, MinHashLSH, NGram
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MENTION_KEYS = ["url", "part_key", "section_ordinal", "mention", "alias_key"]


def _exact_broadcast(mentions: DataFrame, dictionary: DataFrame) -> DataFrame:
    d = dictionary.filter(F.col("is_exact")).select("alias_key", "canonical_uri")
    return (
        mentions.join(F.broadcast(d), "alias_key", "inner")
        .select(*MENTION_KEYS, "canonical_uri")
        .withColumn("tier", F.lit("exact"))
    )


def _exact_salted(mentions: DataFrame, dictionary: DataFrame, salt: int) -> DataFrame:
    """Same result as ``_exact_broadcast``, shuffle-join + explicit salting.

    Probe side: salt = pmod(xxhash64(url), S) — deterministic, spreads a hot
    alias_key over S reducers. Build side: exploded ×S so every salted probe
    key finds its dictionary row. Build-side blowup is S× the dictionary —
    acceptable because the dictionary is the small side by assumption.
    """
    d = (
        dictionary.filter(F.col("is_exact"))
        .select("alias_key", "canonical_uri")
        .withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    )
    m = mentions.withColumn(
        "salt", F.pmod(F.xxhash64(F.col("url")), F.lit(salt)).cast("int")
    )
    return (
        m.hint("shuffle_hash")
        .join(d, ["alias_key", "salt"], "inner")
        .select(*MENTION_KEYS, "canonical_uri")
        .withColumn("tier", F.lit("salted"))
    )


def _char_ngram_features(df: DataFrame, col: str, n: int = 3, dim: int = 8192):
    """col → sparse count vector of character n-grams (JVM-side only:
    split-to-chars → NGram → HashingTF; no Python UDF)."""
    chars = df.withColumn("_chars", F.slice(F.split(F.col(col), ""), 1, 10_000))
    ng = NGram(n=n, inputCol="_chars", outputCol="_ngrams")
    tf = HashingTF(inputCol="_ngrams", outputCol="_features", numFeatures=dim)
    return tf.transform(ng.transform(chars)).drop("_chars", "_ngrams")


def _lsh_tier(
    unresolved: DataFrame,
    dictionary: DataFrame,
    threshold: float = 0.5,
    num_hash_tables: int = 6,
) -> DataFrame:
    """MinHash-LSH blocking + best-match resolution for fuzzy mentions.

    Scale: approxSimilarityJoin shuffles on LSH band buckets — candidate
    pairs only, never the cross product. numHashTables trades recall for
    shuffle volume; 6 tables at J≈0.8 true similarity gives >99.9% pair
    recall. Seed fixed → deterministic across runs/cluster sizes.
    """
    keys = (
        unresolved.select("alias_key").distinct()
    )  # dedup before the expensive join: many mentions share a surface form
    k_feat = _char_ngram_features(keys, "alias_key")
    d = dictionary.select("alias_key", "canonical_uri").withColumnRenamed(
        "alias_key", "dict_key"
    )
    d_feat = _char_ngram_features(d, "dict_key")

    mh = MinHashLSH(
        inputCol="_features", outputCol="_hashes", numHashTables=num_hash_tables, seed=42
    )
    model = mh.fit(d_feat)
    pairs = model.approxSimilarityJoin(
        k_feat, d_feat, threshold, distCol="jaccard"
    ).select(
        F.col("datasetA.alias_key").alias("alias_key"),
        F.col("datasetB.dict_key").alias("dict_key"),
        F.col("datasetB.canonical_uri").alias("canonical_uri"),
        "jaccard",
    )
    best = Window.partitionBy("alias_key").orderBy(
        F.col("jaccard").asc(), F.col("canonical_uri").asc()
    )
    resolved_keys = (
        pairs.withColumn("_rn", F.row_number().over(best))
        .filter(F.col("_rn") == 1)
        .select("alias_key", "canonical_uri")
    )
    return (
        unresolved.join(F.broadcast(resolved_keys), "alias_key", "inner")
        .select(*MENTION_KEYS, "canonical_uri")
        .withColumn("tier", F.lit("lsh"))
    )


def link_mentions(
    mentions: DataFrame,
    dictionary: DataFrame,
    exact_strategy: str = "broadcast",
    salt: int = 8,
    lsh_threshold: float = 0.5,
) -> DataFrame:
    """mentions(url, part_key, section_ordinal, mention, alias_key) →
    links(..., canonical_uri, tier). Unlinkable mentions are dropped
    (reference behavior: unrecognized refs emit nothing)."""
    exact = (
        _exact_broadcast(mentions, dictionary)
        if exact_strategy == "broadcast"
        else _exact_salted(mentions, dictionary, salt)
    )
    # tier 2/3 input: mentions whose key has no exact-dictionary row.
    exact_keys = dictionary.filter(F.col("is_exact")).select("alias_key").distinct()
    unresolved = mentions.join(F.broadcast(exact_keys), "alias_key", "left_anti")
    fuzzy = _lsh_tier(unresolved, dictionary, threshold=lsh_threshold)
    return exact.unionByName(fuzzy)
