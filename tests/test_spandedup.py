"""Exact duplicated-substring removal (operators/spandedup.py) vs an
independent naive reference: enumerate L-grams, count, mark, merge,
cut — O(n^2)-ish pure Python, shared with no code under test."""

import pytest
from hypothesis import given, settings, strategies as st

from ferenda_spark.operators.spandedup import (
    duplicate_spans,
    remove_duplicate_spans,
    span_postings,
)


def _ref(corpus, L, min_count=2, keep_first=False):
    """corpus: {id: text}. Returns {id: (spans, cleaned_text)} with spans
    a list of (start, end_exclusive) merged intervals."""
    toks = {i: t.split() for i, t in corpus.items()}
    occ = {}
    for i in sorted(toks):
        ts = toks[i]
        for p in range(len(ts) - L + 1):
            occ.setdefault(tuple(ts[p:p + L]), []).append((i, p))
    marked = {i: set() for i in toks}
    for g, places in occ.items():
        if len(places) < min_count:
            continue
        canon = min(places)
        for i, p in places:
            if keep_first and (i, p) == canon:
                continue
            marked[i].add(p)
    out = {}
    for i, ts in toks.items():
        spans = []
        for p in sorted(marked[i]):
            if spans and p <= spans[-1][1]:
                spans[-1] = (spans[-1][0], max(spans[-1][1], p + L))
            else:
                spans.append((p, p + L))
        kept, cur = [], 0
        for s, e in spans:
            kept.extend(ts[cur:s])
            cur = e
        kept.extend(ts[cur:])
        out[i] = (spans, " ".join(kept))
    return out


def _df(spark, corpus):
    return spark.createDataFrame(
        sorted(corpus.items()), "id long, text string"
    )


def _check(spark, corpus, L, **kw):
    exp = _ref(corpus, L, **kw)
    got = {
        r["id"]: r
        for r in remove_duplicate_spans(
            _df(spark, corpus), "text", "id", length=L, **kw
        ).collect()
    }
    assert set(got) == set(exp)
    for i, (spans, cleaned) in exp.items():
        assert got[i]["text"] == cleaned, (i, spans)
        assert got[i]["n_spans"] == len(spans)
        assert got[i]["n_removed"] == sum(e - s for s, e in spans)
        assert got[i]["n_tokens"] == len(corpus[i].split())
    gspans = {
        (r["id"], r["span_start"], r["span_end"])
        for r in duplicate_spans(
            _df(spark, corpus), "text", "id", length=L, **kw
        ).collect()
    }
    assert gspans == {
        (i, s, e) for i, (spans, _) in exp.items() for s, e in spans
    }


def test_shared_run_removed_from_both(spark):
    shared = "alpha beta gamma delta epsilon zeta"
    corpus = {
        1: f"one two {shared} three four",
        2: f"nine {shared} ten eleven twelve",
    }
    _check(spark, corpus, L=4)
    # and the shared run really was cut
    got = {
        r["id"]: r["text"]
        for r in remove_duplicate_spans(
            _df(spark, corpus), "text", "id", length=4
        ).collect()
    }
    assert "gamma" not in got[1] and "gamma" not in got[2]
    assert got[1].startswith("one two") and got[1].endswith("three four")


def test_intra_doc_repetition_counts(spark):
    # the run repeats WITHIN one doc -> still duplicated (suffix-array
    # semantics), both occurrences cut
    corpus = {1: "a b c d X Y Z W a b c d", 2: "unrelated words here"}
    _check(spark, corpus, L=4)
    got = remove_duplicate_spans(
        _df(spark, corpus), "text", "id", length=4
    ).filter("id = 1").collect()[0]
    assert got["text"] == "X Y Z W"
    assert got["n_spans"] == 2 and got["n_removed"] == 8


def test_overlapping_windows_merge_to_one_span(spark):
    # a 6-token duplicated run with L=4 = 3 overlapping windows -> 1 span
    corpus = {1: "p q r s t u tail1 x", 2: "p q r s t u tail2 y"}
    _check(spark, corpus, L=4)
    spans = duplicate_spans(
        _df(spark, corpus), "text", "id", length=4
    ).collect()
    assert all(r["n_windows"] == 3 for r in spans)
    assert {(r["span_start"], r["span_end"]) for r in spans} == {(0, 6)}


def test_doc_shorter_than_length_untouched(spark):
    corpus = {1: "a b c", 2: "a b c"}
    got = remove_duplicate_spans(
        _df(spark, corpus), "text", "id", length=4
    ).collect()
    assert all(r["n_removed"] == 0 and r["text"] == "a b c" for r in got)
    assert span_postings(_df(spark, corpus), "text", "id", length=4).count() == 0


def test_whole_doc_duplicate_becomes_empty(spark):
    corpus = {1: "a b c d e", 2: "a b c d e"}
    _check(spark, corpus, L=5)
    got = remove_duplicate_spans(
        _df(spark, corpus), "text", "id", length=5
    ).collect()
    assert all(r["text"] == "" and r["n_removed"] == 5 for r in got)


def test_keep_first_preserves_canonical_occurrence(spark):
    corpus = {1: "a b c d e tail", 2: "head a b c d e", 3: "a b c d e end"}
    _check(spark, corpus, L=5, keep_first=True)
    got = {
        r["id"]: r["text"]
        for r in remove_duplicate_spans(
            _df(spark, corpus), "text", "id", length=5, keep_first=True
        ).collect()
    }
    # canonical occurrence = min (id, pos) = doc 1 pos 0: survives there
    assert got[1] == "a b c d e tail"
    assert got[2] == "head" and got[3] == "end"


def test_min_count_threshold(spark):
    corpus = {1: "a b c d x", 2: "a b c d y", 3: "a b c d z"}
    # gram occurs 3 times; min_count=4 -> nothing removed
    _check(spark, corpus, L=4, min_count=4)
    got = remove_duplicate_spans(
        _df(spark, corpus), "text", "id", length=4, min_count=4
    ).collect()
    assert all(r["n_removed"] == 0 for r in got)
    _check(spark, corpus, L=4, min_count=3)


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from("abcde"), min_size=0, max_size=24),
        min_size=1,
        max_size=8,
    ),
    st.sampled_from([2, 3]),
    st.booleans(),
)
def test_matches_reference_on_random_corpora(spark, docs, L, keep_first):
    corpus = {i: " ".join(ws) for i, ws in enumerate(docs)}
    _check(spark, corpus, L=L, keep_first=keep_first)


# --- winnowed approximate mode (stride > 1) ------------------------------

def test_stride1_identical_to_exact(spark):
    import random

    rng = random.Random(11)
    corpus = {
        i: " ".join(rng.choice("abcdef") for _ in range(rng.randint(0, 30)))
        for i in range(10)
    }
    exact = sorted(
        tuple(r) for r in remove_duplicate_spans(
            _df(spark, corpus), "text", "id", length=3).collect())
    s1 = sorted(
        tuple(r) for r in remove_duplicate_spans(
            _df(spark, corpus), "text", "id", length=3, stride=1).collect())
    assert s1 == exact


def test_winnow_guarantee_misaligned_runs(spark):
    """The deterministic winnowing guarantee: EVERY duplicated run of
    length >= L + stride - 1 is detected, at arbitrary (mod-stride
    misaligned) offsets in both documents — the case plain position-
    stride sampling misses. 30 random plants, zero misses allowed."""
    import random

    L, stride = 5, 4
    run_len = L + stride - 1  # exactly the guarantee threshold
    rng = random.Random(23)
    for trial in range(30):
        run = [f"dup{trial}x{k}" for k in range(run_len)]
        # unique filler so nothing else duplicates
        def filler(tag, n):
            return [f"f{trial}{tag}{j}" for j in range(n)]
        off_a = rng.randint(0, 17)
        off_b = rng.randint(0, 17)
        corpus = {
            0: " ".join(filler("a", off_a) + run + filler("pa", 9)),
            1: " ".join(filler("b", off_b) + run + filler("pb", 9)),
        }
        spans = duplicate_spans(
            _df(spark, corpus), "text", "id",
            length=L, stride=stride).collect()
        by_id = {}
        for r in spans:
            by_id.setdefault(r["id"], []).append(
                (r["span_start"], r["span_end"]))
        assert 0 in by_id and 1 in by_id, (
            f"trial {trial}: run missed (offsets {off_a}/{off_b})")
        # detected span lies inside the true run, short by < stride
        # tokens per edge
        for i, off in ((0, off_a), (1, off_b)):
            (s, e), = by_id[i]
            assert off <= s < off + stride
            assert off + run_len - (stride - 1) <= e <= off + run_len


def test_winnow_posting_density(spark):
    """Winnowing selects ~2/(stride+1) of the windows (Schleimer et al.
    bound on random content); assert well under the exact count and
    above the 1/stride floor."""
    import random

    rng = random.Random(5)
    text = " ".join(
        rng.choice([f"w{j}" for j in range(5000)]) for _ in range(4000))
    df = _df(spark, {0: text})
    n_exact = span_postings(df, "text", "id", length=8).count()
    stride = 6
    n_win = span_postings(df, "text", "id", length=8, stride=stride).count()
    frac = n_win / n_exact
    assert 1.0 / stride * 0.8 < frac < 2.5 / (stride + 1)


def test_winnow_short_doc_clamps_to_one_posting(spark):
    """Docs with fewer windows than the stride still post (one whole-doc
    selection), so exact whole-short-doc duplicates remain detectable."""
    corpus = {0: "p q r s t", 1: "p q r s t"}
    spans = duplicate_spans(
        _df(spark, corpus), "text", "id", length=4, stride=8).collect()
    assert {r["id"] for r in spans} == {0, 1}


def test_stride_zero_rejected(spark):
    with pytest.raises(ValueError, match="stride"):
        span_postings(_df(spark, {0: "a b c"}), "text", "id",
                      length=2, stride=0)
