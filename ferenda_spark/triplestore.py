"""TripleStore facade: the reference's store API over the SPO/POS tables.

Reference analog: ``TripleStore.connect(storetype, location, repository)``
returns a store with ``add_serialized`` / ``select`` / ``construct`` /
``triple_count`` / ``clear``, one named-graph **context** per docrepo, and
every Ferenda query stage talks to it over HTTP (Fuseki/Sesame) or in-proc
rdflib ([ref: ferenda/triplestore.py :: TripleStore and subclasses]).

This class keeps that call surface so reference users keep their mental
model, but the "store" is the pair of partitioned triple tables managed by
``operators.triples`` + ``sources.catalog``, queries compile to DataFrame
plans (``operators.sparql``), and there is no service: ``select`` returns a
DataFrame you can further compose, collect, or write.

Context mapping: the reference keys contexts by repo; here a context is a
predicate-agnostic column filter on ``src_url`` domain (the domain IS the
repo identity in the web-corpus model — same key the part_key layout hashes
on). ``add`` appends (Iceberg gets atomic commits via the catalog seam;
plain Parquet appends are file-atomic per task); ``clear`` drops the
context's rows by rewriting — the reference's ``clear`` is the same
full-context rewrite server-side.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ferenda_spark.checkpoint import truncate_checkpoint as _tckpt
from ferenda_spark.operators.sparql import (
    sparql_ask,
    sparql_construct,
    sparql_describe,
    sparql_select,
)
from ferenda_spark.operators.triples import (
    _manifest_path,
    read_pos,
    with_obj_bucket,
    write_pos,
    write_spo,
)
from ferenda_spark.sources import catalog


def _domain(col: F.Column) -> F.Column:
    return F.lower(F.regexp_extract(col, r"^[a-z][a-z0-9+.\-]*://([^/]+)", 1))


class SparkTripleStore:
    """DataFrame-backed triple store. ``spo_path`` is authoritative;
    ``pos_path`` (optional) is the query-optimized layout that
    constant-predicate SPARQL patterns route to (partition-pruned)."""

    def __init__(
        self,
        spark: SparkSession,
        spo_path: str,
        pos_path: str | None = None,
        snapshot_mode: bool = False,
    ):
        """``snapshot_mode=True`` stores the authoritative SPO table
        through the Iceberg-lite snapshot layer (sources/snapshots.py):
        ``add``/``rewrite``/``clear`` become atomic manifest commits
        (readers never see a half-written store; a crashed write is
        invisible), and ``triples(version=...)`` time-travels. The POS
        layout stays plain (it is derived, query-optimized state —
        rebuildable from any SPO snapshot) and always tracks the NEWEST
        version, so version-pinned queries route to SPO only."""
        self.spark = spark
        self.spo_path = spo_path
        self.pos_path = pos_path
        self.snapshot_mode = snapshot_mode

    # ------------------------------------------------------------- reading

    def triples(
        self, context: str | None = None, version: int | None = None
    ) -> DataFrame:
        if self.snapshot_mode:
            from ferenda_spark.sources.snapshots import read_snapshot

            df = read_snapshot(self.spark, self.spo_path, version=version)
        else:
            if version is not None:
                raise ValueError(
                    "time travel needs snapshot_mode=True (plain tables "
                    "keep no version history)"
                )
            df = catalog.read_table(self.spark, self.spo_path)
        if context is not None:
            df = df.filter(_domain(F.col("src_url")) == context.lower())
        return df

    def _pos(self, context: str | None, version: int | None = None):
        if self.pos_path is None or version is not None:
            # POS tracks only the newest snapshot; pinned-version queries
            # answer from the versioned SPO alone
            return None
        df = read_pos(self.spark, self.pos_path)
        if context is not None:
            df = df.filter(_domain(F.col("src_url")) == context.lower())
        return df

    def select(
        self,
        query: str,
        context: str | None = None,
        version: int | None = None,
    ) -> DataFrame:
        """SPARQL SELECT → DataFrame (TripleStore.select returned row
        dicts; ``.collect()`` reproduces that shape when wanted).
        ``version`` pins a snapshot (snapshot_mode only)."""
        return sparql_select(
            self.triples(context, version), query, self._pos(context, version)
        )

    def construct(self, query: str, context: str | None = None) -> DataFrame:
        """SPARQL CONSTRUCT → graph as a (subj, pred, obj, obj_is_uri)
        DataFrame (TripleStore.construct returned an rdflib.Graph)."""
        return sparql_construct(self.triples(context), query, self._pos(context))

    def ask(self, query: str, context: str | None = None) -> bool:
        """SPARQL ASK → bool (rdflib-backed stores answer ASK queries the
        same way; this is a LIMIT-1 existence probe, not a full count)."""
        return sparql_ask(
            self.triples(context), query, self._pos(context)
        ).collect()[0]["ask"]

    def describe(self, query: str, context: str | None = None) -> DataFrame:
        """SPARQL DESCRIBE → the described resources' subject-rows as a
        triples DataFrame (subject-only CBD; the engine mints no blank
        nodes, so there is nothing to recurse into)."""
        return sparql_describe(self.triples(context), query, self._pos(context))

    def triple_count(self, context: str | None = None) -> int:
        return self.triples(context).count()

    # ------------------------------------------------------------- writing

    def add(self, triples: DataFrame) -> None:
        """Append a TRIPLES-schema frame (add_serialized's role — input is
        rows, not serialized RDF text; the parse stage already emits rows).
        POS stays consistent by appending the same rows in its layout."""
        clustered = triples.repartition("part_key").sortWithinPartitions(
            "subj", "pred"
        )
        if self.snapshot_mode:
            from ferenda_spark.sources.snapshots import commit_snapshot

            commit_snapshot(
                clustered, self.spo_path, mode="append",
                partition_by=("part_key",),
            )
        else:
            catalog.write_table(
                clustered,
                self.spo_path,
                partition_by=("part_key",),
                mode="append",
            )
        if self.pos_path is not None:
            catalog.write_table(
                with_obj_bucket(triples)
                .withColumn("pos_batch", F.lit("adhoc"))
                .repartition("pred")
                .sortWithinPartitions("obj", "subj"),
                self.pos_path,
                partition_by=("pred", "obj_bucket", "pos_batch"),
                mode="append",
            )
            # adhoc appends carry arbitrary part_keys: record the wildcard
            # manifest row so a later append_pos over the same table takes
            # the (always-correct) full-rebuild path instead of trusting
            # batch disjointness it can't verify
            self.spark.createDataFrame(
                [("adhoc", -1)], "pos_batch string, part_key int"
            ).write.mode("append").parquet(_manifest_path(self.pos_path))

    def rewrite(self, triples: DataFrame) -> None:
        """Full (re)materialization of both layouts — the bulk-load path
        the pipeline uses (dynamic partition overwrite, resume-idempotent;
        in snapshot_mode an atomic overwrite commit — prior versions stay
        time-travelable until expired)."""
        if self.snapshot_mode:
            from ferenda_spark.sources.snapshots import commit_snapshot

            commit_snapshot(
                triples.repartition("part_key").sortWithinPartitions(
                    "subj", "pred"
                ),
                self.spo_path,
                mode="overwrite",
                partition_by=("part_key",),
            )
        else:
            write_spo(triples, self.spo_path)
        if self.pos_path is not None:
            write_pos(self.triples(), self.pos_path)

    def clear(self, context: str) -> None:
        """Drop one context's triples (full-context rewrite, as the
        reference's clear(context) is server-side).

        Crash safety: the surviving rows are written to a durable
        ``.clearing`` sibling FIRST, then swapped in (same sibling+swap
        discipline as ``catalog.compact_table``). The original table is
        never deleted until the full survivor copy is on stable storage —
        a localCheckpoint + in-place overwrite would stage the only copy
        in volatile executor block storage, where an executor loss
        mid-rewrite loses the store permanently."""
        kept = self.triples().filter(_domain(F.col("src_url")) != context.lower())
        self._replace_with(kept)

    def _replace_with(self, kept: DataFrame) -> None:
        """Replace the store's contents with ``kept`` — which may be (and
        usually is) DERIVED FROM THE STORE'S OWN TABLE, so a plain
        overwrite would read and clobber the same files mid-job. The
        survivor rows are staged at a durable sibling first, then swapped
        (plain mode), or published as an atomic snapshot commit (snapshot
        mode, where data dirs are immutable)."""
        if self.snapshot_mode:
            # the snapshot layer IS the sibling+swap discipline: survivor
            # files are durable before the manifest rename publishes them,
            # and the pre-clear version stays readable (time travel) until
            # expire_snapshots
            from ferenda_spark.sources.snapshots import commit_snapshot

            commit_snapshot(
                kept.repartition("part_key").sortWithinPartitions(
                    "subj", "pred"
                ),
                self.spo_path,
                mode="overwrite",
                partition_by=("part_key",),
            )
        else:
            tmp = self.spo_path.rstrip("/") + ".clearing"
            catalog.write_table(
                kept.repartition("part_key").sortWithinPartitions("subj", "pred"),
                tmp,
                partition_by=("part_key",),
                mode="overwrite",
            )
            catalog.swap_in(self.spark, tmp, self.spo_path)
        if self.pos_path is not None:
            # POS is derivable from the (already swapped, durable) SPO, so
            # a crash here loses nothing. write_pos owns the POS layout
            # (bucket count, sort, batch dirs, manifest reset) and is
            # internally staged at a durable sibling + swapped, so readers
            # never see a half-written POS table.
            write_pos(self.triples(), self.pos_path)

    # ------------------------------------------------------------- updates

    _UPDATE_RE = re.compile(
        r"^\s*(INSERT DATA|DELETE DATA|DELETE WHERE)\s*\{(.*)\}\s*;?\s*$",
        re.IGNORECASE | re.DOTALL,
    )
    _TERM_RE = (
        r'(\?[A-Za-z_]\w*|<[^>]*>|"(?:[^"\\]|\\.)*"'
        r"(?:@[A-Za-z][A-Za-z0-9-]*|\^\^<[^>]*>)?)"
    )

    def update(self, query: str, n_parts: int = 8) -> None:
        """SPARQL 1.1 Update subset (reference analog: TripleStore's
        add_serialized/clear are ferenda's only write paths — this closes
        the standard-syntax gap for store maintenance):

        - ``INSERT DATA { <NT lines> }`` — ground triples appended
          (``add``); the block is parsed by the N-Triples machinery
          (sources/ntriples.py), so escaping/lang/datatype handling is the
          audited serializer's, not a second parser. ``part_key`` is
          minted from the subject hash; ``src_url`` stays NULL (assertion
          provenance is the pipeline's job, not the update language's).
        - ``DELETE DATA { <NT lines> }`` — exact ground triples removed
          (NULL-safe value match, same discipline as rdfs_closure's
          anti-join).
        - ``DELETE WHERE { ?s <p> ?o }`` — ONE triple pattern with
          variables/constants; matching triples removed. Multi-pattern
          templates would need full solution-mapping semantics — refused
          loudly (same philosophy as the SPARQL maybe-null guard) rather
          than silently approximated.

        Deletions rewrite through ``rewrite`` (sibling+swap / snapshot
        commit), so crash-safety matches ``clear``.
        """
        m = self._UPDATE_RE.match(query)
        if not m:
            raise ValueError(
                "unsupported update form (INSERT DATA / DELETE DATA / "
                f"DELETE WHERE only): {query[:80]!r}"
            )
        op, block = m.group(1).upper(), m.group(2)
        if op in ("INSERT DATA", "DELETE DATA"):
            rows = self._parse_data_block(block, n_parts)
            if op == "INSERT DATA":
                self.add(rows)
                return
            cond = None
            cur = self.triples().alias("_t")
            d = rows.select(
                "subj", "pred", "obj", "obj_is_uri", "obj_lang", "obj_dtype"
            ).alias("_d")
            for c in ("subj", "pred", "obj", "obj_is_uri", "obj_lang",
                      "obj_dtype"):
                e = F.col(f"_t.{c}").eqNullSafe(F.col(f"_d.{c}"))
                cond = e if cond is None else (cond & e)
            self._replace_with(cur.join(d, cond, "left_anti"))
            return
        # DELETE WHERE: one pattern
        pat = re.findall(
            rf"{self._TERM_RE}\s+{self._TERM_RE}\s+{self._TERM_RE}\s*\.?",
            block.strip(),
        )
        if len(pat) != 1:
            raise ValueError(
                "DELETE WHERE supports exactly one triple pattern; got "
                f"{len(pat)} in {block.strip()[:80]!r}"
            )
        s_t, p_t, o_t = pat[0]
        cond = F.lit(True)
        for term, col in ((s_t, "subj"), (p_t, "pred")):
            if not term.startswith("?"):
                if not (term.startswith("<") and term.endswith(">")):
                    raise ValueError(f"{col} term must be <iri> or var: {term}")
                cond = cond & (F.col(col) == term[1:-1])
        if not o_t.startswith("?"):
            if o_t.startswith("<"):
                cond = cond & (F.col("obj") == o_t[1:-1]) & F.col("obj_is_uri")
            else:
                lex = re.match(r'^"((?:[^"\\]|\\.)*)"', o_t).group(1)
                lex = (
                    lex.replace("\\\\", "\x00").replace('\\"', '"')
                    .replace("\\n", "\n").replace("\\r", "\r")
                    .replace("\\t", "\t").replace("\x00", "\\")
                )
                cond = cond & (F.col("obj") == lex) & ~F.col("obj_is_uri")
                suffix = o_t[o_t.rindex('"') + 1:]
                if suffix.startswith("@"):
                    cond = cond & (F.col("obj_lang") == suffix[1:])
                elif suffix.startswith("^^<"):
                    cond = cond & (F.col("obj_dtype") == suffix[3:-1])
                else:
                    # a SIMPLE literal matches neither @tagged nor ^^typed
                    # terms (SPARQL term equality) — without this, DELETE
                    # WHERE { ?s ?p "x" } would also delete "x"@en
                    cond = (
                        cond
                        & F.col("obj_lang").isNull()
                        & F.col("obj_dtype").isNull()
                    )
        # three-valued logic: a NULL conjunct (e.g. obj_lang NULL compared
        # to 'en') makes cond NULL, and filter(~NULL) would DROP the row —
        # deleting triples the pattern does not match. NULL means no-match,
        # so coalesce to FALSE before negating.
        self._replace_with(
            self.triples().filter(~F.coalesce(cond, F.lit(False)))
        )

    def _parse_data_block(self, block: str, n_parts: int) -> DataFrame:
        from ferenda_spark.sources.ntriples import parse_ntriples_lines

        lines = [
            ln.strip() for ln in block.strip().splitlines() if ln.strip()
        ]
        if not lines:
            raise ValueError("empty data block")
        parsed = parse_ntriples_lines(
            self.spark.createDataFrame([(l,) for l in lines], "line string")
        ).cache()
        try:
            bad = parsed.filter(F.col("kind") != "triple").limit(1).collect()
            if bad:
                raise ValueError(
                    f"malformed triple in data block: {bad[0]['obj']!r}"
                )
            rows = parsed.drop("kind").select(
                "subj", "pred", "obj", "obj_is_uri", "obj_lang", "obj_dtype",
                F.lit(None).cast("string").alias("src_url"),
                F.pmod(F.xxhash64("subj"), F.lit(n_parts)).cast("int").alias(
                    "part_key"
                ),
            )
            # materialize before unpersisting (data blocks are human-scale;
            # without this every update() would pin one cached frame in
            # block-manager memory for the session's lifetime)
            # truncate with honest stats — repeated update() calls feed
            # each checkpoint into the next plan, the compounding shape
            # the bare localCheckpoint's inherited estimate blows up on
            return _tckpt(rows)
        finally:
            parsed.unpersist()
