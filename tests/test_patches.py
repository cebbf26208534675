"""Patch-before-parse (S8): strict unified-diff application + the
broadcast-join patch stage composed with parse (port of the reference's
patch_if_needed behavior [ref: ferenda/documentrepository.py])."""

import pytest
from pyspark.sql import functions as F

from ferenda_spark.functions.extract import extract_text
from ferenda_spark.operators.parse import parse_stage, split_parsed
from ferenda_spark.operators.patches import (
    PatchError,
    apply_patch_bytes,
    apply_unified_patch,
    patch_corpus,
)
from ferenda_spark.sources.corpus import gen_doc

PATCH = """--- a/doc
+++ b/doc
@@ -2,2 +2,2 @@
 keep me
-typo here
+fixed here
"""


def test_apply_replaces_line():
    src = "header\nkeep me\ntypo here\ntail\n"
    assert (
        apply_unified_patch(src, PATCH) == "header\nkeep me\nfixed here\ntail\n"
    )


def test_apply_insert_and_delete():
    src = "a\nb\nc"
    p = "@@ -1,3 +1,3 @@\n a\n-b\n+B\n c"
    assert apply_unified_patch(src, p) == "a\nB\nc"
    p_ins = "@@ -0,0 +1,1 @@\n+top"
    assert apply_unified_patch(src, p_ins) == "top\na\nb\nc"


def test_context_mismatch_raises():
    with pytest.raises(PatchError, match="mismatch"):
        apply_unified_patch("a\nDIFFERENT\nc\n", PATCH)


def test_hunk_length_must_match():
    with pytest.raises(PatchError):
        apply_unified_patch("a\nb\n", "@@ -1,3 @@\n a\n b")


def test_bytes_roundtrip_non_utf8():
    """latin-1 view: arbitrary bytes patch losslessly."""
    raw = b"\xff\xfeline one\nbad\n\x80tail"
    patched = apply_patch_bytes(raw, "@@ -2,1 +2,1 @@\n-bad\n+good")
    assert patched == b"\xff\xfeline one\ngood\n\x80tail"


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _LINES = st.lists(
        st.text(alphabet="abXY <>/&é\t", max_size=8), min_size=0, max_size=12
    )

    @settings(max_examples=300, deadline=None)
    @given(_LINES, _LINES)
    def test_difflib_patches_roundtrip(src_lines, dst_lines):
        """Any diff difflib can produce, the applier must replay exactly."""
        import difflib

        src = "\n".join(src_lines)
        dst = "\n".join(dst_lines)
        patch = "\n".join(
            difflib.unified_diff(src.split("\n"), dst.split("\n"), lineterm="")
        )
        if not patch:
            return  # identical inputs: nothing to apply
        assert apply_unified_patch(src, patch) == dst

except ImportError:  # pragma: no cover
    pass


def test_patch_corpus_end_to_end(spark):
    """One doc patched, the rest byte-identical; parse consumes the result."""
    n = 20
    rows = [gen_doc(i, n) for i in range(n)]
    target = rows[3]
    html_text = target["html"].decode("latin-1")
    lines = html_text.split("\n")
    # replace the first line that contains a <p> with a sentinel paragraph
    li = next(i for i, l in enumerate(lines) if "<p>" in l)
    patch = (
        f"@@ -{li + 1},1 +{li + 1},1 @@\n-{lines[li]}\n"
        f"+<p>PATCHED SENTINEL PARAGRAPH</p>"
    )
    corpus = spark.createDataFrame(
        [(r["url"], r["warc_ts"], r["html"], r["text"], r["lang"]) for r in rows],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    patches = spark.createDataFrame([(target["url"], patch)], "url string, patch string")
    out = patch_corpus(corpus, patches).cache()
    assert out.filter(F.col("patch_error").isNotNull()).count() == 0
    assert out.filter("patched").count() == 1
    got = {r["url"]: bytes(r["html"]) for r in out.collect()}
    for r in rows:
        if r["url"] == target["url"]:
            assert b"PATCHED SENTINEL PARAGRAPH" in got[r["url"]]
        else:
            assert got[r["url"]] == r["html"]  # byte-identical passthrough
    # composes with the parse stage: extracted text reflects the patch
    docs, _ = split_parsed(parse_stage(out, n_parts=4))
    txt = docs.filter(F.col("url") == target["url"]).select("text_sha256").collect()
    import hashlib

    expected = hashlib.sha256(
        extract_text(got[target["url"]]).encode("utf-8")
    ).hexdigest()
    assert txt[0][0] == expected
    out.unpersist()


def test_failing_patch_surfaces_error_and_keeps_original(spark):
    d = gen_doc(0, 5)
    corpus = spark.createDataFrame(
        [(d["url"], d["warc_ts"], d["html"], d["text"], d["lang"])],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    bad = spark.createDataFrame(
        [(d["url"], "@@ -1,1 +1,1 @@\n-NOT IN THE FILE\n+x")],
        "url string, patch string",
    )
    row = patch_corpus(corpus, bad).collect()[0]
    assert row["patch_error"] is not None
    assert row["patched"] is False
    assert bytes(row["html"]) == d["html"]
