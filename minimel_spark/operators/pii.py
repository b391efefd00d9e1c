"""PII detection and redaction for training-data curation.

The step every published pretraining pipeline runs between dedup and
packing (C4, The Pile, RefinedWeb all describe a regex scrub): find
personally-identifying spans, count them per document, and replace them
with typed placeholder tokens. No counterpart in the reference (minimEL
stops at entity linking) — this belongs to the LLM-curation family next to
`corpus.py` and `dedup.py`.

Everything is built-in JVM expressions (`regexp_extract_all` /
`regexp_replace` inside whole-stage codegen — a pure map over the scan, no
shuffle, no Python), and every rule is written in the regex subset that
Java's engine and RE2 (DuckDB) interpret identically — no lookaround, no
backreferences, no non-greedy quantifiers — so the whole operator is
DuckDB-oracle-checkable bit for bit, including the md5 of the redacted
text.

Scale: a pure narrow map; at 100 TB this pipelines inside the parquet
scan stage with zero exchange. Counting and redaction are SEQUENTIAL per
rule (rule k counts on the text already redacted by rules < k), which both
makes the counts well-defined under overlapping patterns (an email's
digits must not also count as an ID number) and lets the oracle recompute
the exact same fixpoint.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# (name, pattern, replacement) — applied in order. Patterns stay in the
# Java∩RE2 common subset; replacements contain no `$` group references.
DEFAULT_PII_RULES: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("idnum", r"\d{8,}", "<NUM>"),
]


def pii_scrub(
    docs: DataFrame,
    rules: list[tuple[str, str, str]] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Count and redact PII spans per document.

    Returns one row per input row: (id_col, n_<rule> per rule, n_pii total,
    clean_text). Rules fire in list order against the progressively
    redacted text, so a span consumed by an earlier rule can't be
    double-counted by a later one.
    """
    if rules is None:
        rules = DEFAULT_PII_RULES
    cur = F.col(text_col)
    count_cols = []
    for name, pat, repl in rules:
        count_cols.append(
            F.size(F.regexp_extract_all(cur, F.lit(pat), F.lit(0)))
            .cast("long")
            .alias(f"n_{name}")
        )
        cur = F.regexp_replace(cur, pat, repl)
    # one select so the whole chain stays a single codegen'd projection
    out = docs.select(F.col(id_col), *count_cols, cur.alias("clean_text"))
    # F.lit(0) seed: rules=[] is a legitimate pass-through (n_pii = 0), not
    # an AttributeError on None.cast
    total: F.Column = F.lit(0)
    for name, _, _ in rules:
        total = total + F.col(f"n_{name}")
    return out.withColumn("n_pii", total.cast("long"))


def with_luhn_valid(
    df: DataFrame, id_col: str, out_col: str = "luhn_valid"
) -> DataFrame:
    """Append a Luhn mod-10 validity flag (ISO/IEC 7812 check digit — the
    checksum behind payment cards and many national identifiers) for the
    digits of ``id_col``: non-digits are stripped first, fewer than two
    digits is invalid by definition. In a linkage pipeline this is the
    cheap STRUCTURAL gate on identifier-bearing columns: an "SSN-like"
    field that fails its checksum must not become high-weight match
    evidence (Fellegi-Sunter m-probabilities assume the identifier is
    real), and a corpus whose valid-rate drops after a merge signals a
    column mapping bug upstream.

    Entirely JVM-side integer arithmetic (reverse + transform +
    aggregate over a digit sequence — no UDF, engine-exact), so the flag
    is reproducible bit-for-bit in the SQL oracle.
    """
    tmp = "_luhn_rev"
    out = df.withColumn(
        tmp, F.reverse(F.regexp_replace(F.col(id_col), "[^0-9]", ""))
    )
    d = f"CAST(substring({tmp}, i, 1) AS INT)"
    expr = (
        f"length({tmp}) >= 2 AND aggregate(transform(sequence(1, length({tmp})), "
        f"i -> CASE WHEN i % 2 = 0 THEN "
        f"CASE WHEN {d} * 2 > 9 THEN {d} * 2 - 9 ELSE {d} * 2 END "
        f"ELSE {d} END), 0, (acc, x) -> acc + x) % 10 = 0"
    )
    return out.withColumn(out_col, F.expr(expr)).drop(tmp)
