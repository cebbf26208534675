"""PII detection/redaction as pure column expressions.

No reference analog (ferenda processes public legal documents); this is the
scrubbing pass a web-scale training-data pipeline runs over extracted text
before anything else consumes it. Design constraints:

- patterns live in the Java-regex ∩ RE2 common subset (no lookbehind, no
  backreferences) so the DuckDB oracle can run the byte-identical regex;
- everything is `regexp_replace` / `regexp_extract_all` column expressions
  — JVM-side, whole-stage-codegen, zero Python in the hot path;
- redaction is idempotent (the replacement token matches no pattern), so a
  re-run over already-scrubbed text is a no-op — required for resumable
  stages that may re-process a partition after a crash.

Recognized classes (v1): email addresses, internationally-prefixed phone
numbers (``+CC-NNN-NNNN`` with ``-``/``.``/space separators — national
formats need locale packs and are out of scope), and IPv4 literals.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Java ∩ RE2 subset — see module docstring. \b is an ASCII word boundary in
# both engines.
EMAIL_PATTERN = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"\+\d{1,3}[-. ]\d{3}[-. ]\d{4}\b"
IPV4_PATTERN = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"

#: applied in this order; email first so an address's domain can't be
#: half-eaten by the IP pattern when it is a bracketed IP literal
PII_PATTERNS: dict[str, str] = {
    "email": EMAIL_PATTERN,
    "phone": PHONE_PATTERN,
    "ipv4": IPV4_PATTERN,
}


def redact_pii(col: Column, token: str = "[PII]") -> Column:
    """Replace every recognized PII span with ``token``. One chained
    regexp_replace per class — a single codegen'd projection, no shuffle."""
    out = col
    for pattern in PII_PATTERNS.values():
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-class match counts: {'email': Column, 'phone': …, 'ipv4': …}.
    Counts are taken BEFORE redaction; callers alias and aggregate."""
    return {
        name: F.size(F.regexp_extract_all(col, F.lit(pattern), F.lit(0))).cast(
            "bigint"
        )
        for name, pattern in PII_PATTERNS.items()
    }
