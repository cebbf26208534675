"""Patch-before-parse (SURVEY §2.1 S8).

Reference analog: ``patch_if_needed`` applies a hand-maintained unified
diff to a downloaded file before parsing, recording the patch description
in provenance ([ref: ferenda/documentrepository.py :: patch_if_needed],
[ref: ferenda/thirdparty/patch.py] — vendored python-patch). Ferenda uses
this to fix scanning/OCR defects in source documents without mutating the
downloaded original.

Spark form: patches are DATA, not files — a tiny table
``patches(url, patch, note)`` (one row per patched document; real-world
patch sets are O(10²) rows, hand-written) broadcast-joined onto the corpus,
with the diff applied inside the same Arrow-batched stage that feeds
extraction. Corpus rows without a patch pass through untouched on a fast
path; the join never shuffles the corpus (broadcast hash join on url).

Byte semantics: the reference patches raw downloaded bytes. A unified diff
is line-oriented text, so we apply it over the **latin-1 view** of the
html bytes — latin-1 is a bijection between bytes and U+0000..U+00FF, so
unpatched content round-trips byte-identically and a patch can target any
byte sequence. Patches must be authored against the same view (for
ASCII/UTF-8 sources this is what a normal ``diff -u`` of the file
produces). Application is STRICT (exact context match, no fuzz) and
deterministic: a non-applying patch raises, and ``patch_corpus`` surfaces
that as ``patch_error`` rather than silently parsing the unpatched bytes —
the reference logs and skips; at 10^12 docs a silent skip is unauditable.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HUNK_RE = re.compile(r"^@@ -(\d+)(?:,(\d+))? \+(\d+)(?:,(\d+))? @@")


class PatchError(ValueError):
    pass


def apply_unified_patch(text: str, patch: str) -> str:
    """Apply a unified diff to ``text``. Strict: context and removed lines
    must match exactly at the stated positions; otherwise PatchError.

    Lines are split on '\\n' only (the latin-1 byte view makes '\\r'
    ordinary content, so CRLF sources patch byte-exactly). A trailing
    newline in the input is preserved; '\\ No newline at end of file'
    markers are honored.
    """
    src = text.split("\n")
    out: list[str] = []
    pos = 0  # index into src of the next unconsumed line
    lines = patch.split("\n")
    i = 0
    saw_hunk = False
    while i < len(lines):
        line = lines[i]
        m = _HUNK_RE.match(line)
        if m is None:
            # headers (---/+++), index lines, blank tail: skip
            i += 1
            continue
        saw_hunk = True
        old_start = int(m.group(1))
        old_len = int(m.group(2)) if m.group(2) is not None else 1
        # unified diff is 1-based; old_len==0 means insertion AFTER old_start
        hunk_pos = old_start - 1 if old_len > 0 else old_start
        if hunk_pos < pos:
            raise PatchError(f"overlapping/out-of-order hunk at line {old_start}")
        out.extend(src[pos:hunk_pos])
        pos = hunk_pos
        i += 1
        consumed = 0
        while i < len(lines):
            pl = lines[i]
            if pl.startswith("@@") or pl.startswith("--- ") or pl.startswith("+++ "):
                break
            if pl.startswith(" ") or (pl == "" and consumed < old_len):
                # a bare "" inside a hunk is an empty context line (some
                # tools strip the ' ' prefix); after the hunk's old lines
                # are consumed it is just the patch's trailing newline
                want = pl[1:] if pl.startswith(" ") else ""
                found = repr(src[pos]) if pos < len(src) else "EOF"
                if pos >= len(src) or src[pos] != want:
                    raise PatchError(
                        f"context mismatch at source line {pos + 1}: "
                        f"expected {want!r}, found {found}"
                    )
                out.append(src[pos])
                pos += 1
                consumed += 1
            elif pl.startswith("-"):
                if pos >= len(src) or src[pos] != pl[1:]:
                    raise PatchError(
                        f"removed-line mismatch at source line {pos + 1}"
                    )
                pos += 1
                consumed += 1
            elif pl.startswith("+"):
                out.append(pl[1:])
            elif pl.startswith("\\"):
                pass  # '\ No newline at end of file'
            else:
                break
            i += 1
        if consumed != old_len:
            raise PatchError(
                f"hunk consumed {consumed} source lines, header said {old_len}"
            )
    if not saw_hunk:
        raise PatchError("no hunks in patch")
    out.extend(src[pos:])
    return "\n".join(out)


def apply_patch_bytes(raw: bytes, patch: str) -> bytes:
    """Patch raw bytes through the lossless latin-1 byte↔str view."""
    return apply_unified_patch(raw.decode("latin-1"), patch).encode("latin-1")


def _patch_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        errs: list[str | None] = []
        htmls = pdf["html"].tolist()
        patches = pdf["patch"].tolist()
        for r, (raw, patch) in enumerate(zip(htmls, patches)):
            if patch is None or (isinstance(patch, float) and pd.isna(patch)):
                errs.append(None)
                continue
            try:
                htmls[r] = apply_patch_bytes(bytes(raw), patch)
                errs.append(None)
            except PatchError as e:
                errs.append(str(e))
        out = pdf.drop(columns=["patch"]).copy()
        out["html"] = htmls
        out["patched"] = [
            p is not None and not (isinstance(p, float) and pd.isna(p)) and e is None
            for p, e in zip(patches, errs)
        ]
        out["patch_error"] = errs
        yield out


def patch_corpus(corpus: DataFrame, patches: DataFrame) -> DataFrame:
    """corpus ⟕ broadcast(patches) → corpus with patched html.

    Output = corpus columns + ``patched`` (bool) + ``patch_error``
    (string, null unless a patch failed to apply — callers decide whether
    to quarantine those rows; parse proceeds on the ORIGINAL bytes for
    them, which is deterministic either way).

    Scale shape: patches is vocabulary-sized → broadcast hash join, no
    corpus shuffle; the diff applier runs only on matched rows inside the
    Arrow batch loop (unmatched rows take a null-check fast path).
    """
    joined = corpus.join(
        F.broadcast(patches.select("url", "patch")), "url", "left"
    )
    out_schema = (
        ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in corpus.schema)
        + ", patched boolean, patch_error string"
    )
    return joined.mapInPandas(_patch_batches, schema=out_schema)
