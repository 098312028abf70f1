"""PII detection / scrubbing (training-data-pipeline op).

Regex-based detectors for the classic web-text PII classes (emails, phone
numbers, IPv4 addresses) with a redacting scrubber. Everything is JVM-side
(`regexp_count` / `regexp_replace` inside whole-stage codegen) — a narrow
per-row map with no shuffle, so at 100 TB the cost is exactly one pass
over the text bytes.

Patterns deliberately stay inside the common Java-regex / RE2 subset (no
backreferences, no lookaround) so the DuckDB oracle evaluates the SAME
pattern: parity of the gated query checks the regex semantics themselves,
not just the plumbing.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# order matters for scrubbing: emails first (their local part may contain
# digits), then IPv4 (digits+dots), then phones (digits+dashes); the three
# pattern alphabets are otherwise disjoint, so sequential replacement
# never creates or destroys a later match.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ipv4", r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "[IP]"),
    ("phone", r"[0-9]{3}-[0-9]{3}-[0-9]{4}", "[PHONE]"),
]


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-class match counts on the raw text (independent detectors)."""
    return {
        name: F.regexp_count(text, F.lit(pat))
        for name, pat, _ in PII_PATTERNS
    }


def scrub_pii(text: Column) -> Column:
    """Redact every PII class in declaration order."""
    out = text
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out
