"""Byte-pair-encoding tokenizer: trained merge table + Arrow-batched apply.

The real-tokenizer tier above textstats.bpe_ish_tokens (regex
segmentation): token BUDGETS in a training-data pipeline are ultimately
counted by the model's BPE tokenizer, so the engine needs one that runs
distributed. Algorithm is the public Sennrich, Haddow, Birch 2016
word-internal BPE:

* **Train** (driver, deterministic): whitespace-pretokenize a
  hash-smallest document sample into words-with-counts; start from
  characters; repeatedly merge the most frequent adjacent symbol pair
  (ties broken lexicographically so training is order- and
  parallelism-independent), ``n_merges`` times. The sample is
  driver-sized (same budget discipline as IVF/PQ training); word-count
  aggregation is one Spark groupBy before the collect.

* **Apply** (executors): a pandas UDF — merges are a rank dict shipped
  once per executor via closure; each batch tokenizes with a per-batch
  word cache (web text repeats words heavily: the cache turns per-word
  merge loops into dict hits). Python-per-BATCH, not per-row: this is the
  documented slow path and exactly the case the Arrow/pandas tier exists
  for; counting runs ~word-linear.

End-of-word marker ``</w>`` keeps word-final merges distinct from
word-internal ones (the paper's formulation), so "low" and "lower" share
prefix merges but not the final symbol.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_EOW = "</w>"
_SPLIT = re.compile(r"\s+")


def _word_syms(word: str) -> tuple[str, ...]:
    return tuple(word[:-1]) + (word[-1] + _EOW,)


def train_bpe_merges(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_merges: int = 200,
    sample_docs: int = 2048,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` merges from the hash-smallest ``sample_docs``
    documents. Returns the ordered merge list (rank = position)."""
    rows = (
        df.select(
            F.col(id_col).alias("cid"),
            F.col(text_col).alias("ctext"),
            F.xxhash64(F.col(id_col)).alias("_h"),
        )
        .orderBy(F.col("_h"), F.col("cid"))
        .limit(sample_docs)
        .select(F.explode(F.split(F.trim("ctext"), r"\s+")).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    vocab: dict[tuple[str, ...], int] = {
        _word_syms(r["w"]): int(r["n"]) for r in rows
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, n in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        if not pairs:
            break
        # max count, ties to the lexicographically smallest pair —
        # deterministic regardless of dict order
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        joined = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, n in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(joined)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + n
        vocab = new_vocab
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    syms = list(_word_syms(word))
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_tokens_udf(merges: list[tuple[str, str]]):
    """Factory for a pandas UDF column function: text → ARRAY<STRING> of
    BPE tokens. Call as ``bpe_tokens_udf(merges)(F.col("text"))``."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    @pandas_udf("array<string>")
    def _tok(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def one(t):
            if t is None:
                return []
            out: list[str] = []
            for w in _SPLIT.split(t.strip()):
                if not w:
                    continue
                hit = cache.get(w)
                if hit is None:
                    hit = _encode_word(w, ranks)
                    cache[w] = hit
                out.extend(hit)
            return out

        return texts.map(one)

    return _tok


def bpe_token_count(merges: list[tuple[str, str]]):
    """Factory: text → BIGINT BPE token count."""
    tok = bpe_tokens_udf(merges)

    def count(col: Column) -> Column:
        return F.size(tok(col)).cast("bigint")

    return count
