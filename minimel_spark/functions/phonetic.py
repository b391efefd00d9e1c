"""Phonetic blocking keys: American Soundex as a pure JVM expression chain.

Classic record-linkage blocking family (Fellegi–Sunter-era census linkage;
Christen, *Data Matching* ch. 4): spelling variants of the same name
("Ashcraft"/"Ashcroft", "Robert"/"Rupert") share a phonetic key, so they land
in the same block with zero pairwise work. The reference's anchor dictionary
blocks on byte-normalized surface forms (minimel/normalize.py:24-54); Soundex
is the complementary key this engine adds for the ER tier — it catches
*phonetic* variants that byte normalization cannot.

Implementation notes
--------------------
The whole encoder is a chain of ``upper``/``translate``/``regexp_replace``
column expressions — fully JVM-side, codegen-able, no Python in the hot
path — and the DuckDB oracle mirrors the exact same chain (DuckDB 1.0 has no
``soundex`` builtin), so gate hash-equality pins the algorithm bit-for-bit.
We deliberately do NOT use Spark's builtin ``F.soundex``: its edge-case
behavior (non-letter handling, H/W transparency) is not replicable in DuckDB,
while this chain is identical on both engines by construction.

Algorithm (US-census Soundex, with the standard H/W-transparency rule):

1. strip non-letters, uppercase
2. map every letter to its code: BFPV→1 CGJKQSXZ→2 DT→3 L→4 MN→5 R→6,
   vowels+Y→0 (separators), H/W→9 (transparent)
3. drop the 9s FIRST — duplicate codes separated only by H/W collapse
4. collapse runs of each code 1-6 (per-digit ``regexp_replace`` — no regex
   backreferences, which DuckDB's RE2 engine lacks)
5. drop the leading code (it belongs to the retained first letter) unless
   the first letter is H/W (whose code was already removed in step 3)
6. drop the vowel separators, prepend the first letter, pad to 4 with 0
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# letters -> codes, one translate() call: consonant classes 1-6,
# vowels+Y -> 0 (separator), H/W -> 9 (transparent)
_LETTERS = "BFPVCGJKQSXZDTLMNRAEIOUYHW"
_CODES = "11112222222233455600000099"
_CODE_OF = dict(zip(_LETTERS, _CODES))


def soundex_col(col) -> Column:
    """American Soundex of ``col`` as a pure Column expression chain.

    Empty / non-letter input encodes to ``''`` (callers filter those keys
    out of the block stream).
    """
    c = F.col(col) if isinstance(col, str) else col
    u = F.upper(F.regexp_replace(c, "[^A-Za-z]", ""))
    first = F.substring(u, 1, 1)
    mapped = F.translate(u, _LETTERS, _CODES)
    collapsed = F.regexp_replace(mapped, "9", "")  # H/W transparency
    for d in "123456":
        collapsed = F.regexp_replace(collapsed, d + "+", d)
    tail = F.when(first.isin("H", "W"), collapsed).otherwise(
        F.substring(collapsed, 2, 1 << 30)
    )
    code = F.concat(first, F.regexp_replace(tail, "0", ""), F.lit("000"))
    return F.when(F.length(u) == 0, F.lit("")).otherwise(F.substring(code, 1, 4))


def soundex_sql(u: str) -> str:
    """DuckDB SQL expression mirroring :func:`soundex_col` exactly.

    ``u`` must be a SQL expression (usually a CTE column) already holding
    ``upper(regexp_replace(x, '[^A-Za-z]', '', 'g'))``.
    """
    c = f"replace(translate({u}, '{_LETTERS}', '{_CODES}'), '9', '')"
    for d in "123456":
        c = f"regexp_replace({c}, '{d}+', '{d}', 'g')"
    first = f"substr({u}, 1, 1)"
    tail = f"(CASE WHEN {first} IN ('H','W') THEN {c} ELSE substr({c}, 2) END)"
    return (
        f"(CASE WHEN length({u}) = 0 THEN '' ELSE "
        f"substr({first} || replace({tail}, '0', '') || '000', 1, 4) END)"
    )


def soundex_py(s: str) -> str:
    """Pure-Python reference implementation (tests only)."""
    u = re.sub("[^A-Za-z]", "", s).upper()
    if not u:
        return ""
    mapped = "".join(_CODE_OF[ch] for ch in u)
    collapsed = re.sub(r"([1-6])\1+", r"\1", mapped.replace("9", ""))
    tail = collapsed if u[0] in "HW" else collapsed[1:]
    return (u[0] + tail.replace("0", "") + "000")[:4]


# --------------------------------------------------------------------------
# NYSIIS-R: regular-language relaxation of Taft's NYSIIS (1970).
#
# Taft's original scans the name left-to-right mutating it in place (each
# rule sees the PREVIOUS rule's output at earlier positions), which no
# regex engine reproduces directly. NYSIIS-R keeps the same prefix/suffix
# tables and character-class collapses but applies them as ONE FIXED,
# ordered list of global leftmost non-overlapping rewrites — semantics
# every engine here shares (Java replaceAll, RE2 regexp_replace(…,'g'),
# Python re.sub), so the Spark chain, the DuckDB oracle, and the pytest
# mirror are generated from the SAME rule table and cannot diverge.
# Documented deviations from Taft: the H/W neighbor rules fire in rewrite
# order rather than scan order, the preserved first letter is opaque to
# the tail rules (a boundary H drops instead of consulting it), and the
# final-key single-letter guards keep one-char keys instead of emptying
# them. Patterns use capture groups in REPLACEMENTS only — no lookarounds,
# no pattern backreferences (RE2-compatible).
# --------------------------------------------------------------------------

# applied to the whole uppercased alpha-only string
NYSIIS_PRE: list[tuple[str, str]] = [
    ("^MAC", "MCC"),
    ("^KN", "NN"),
    ("^K", "C"),
    ("^(PH|PF)", "FF"),
    ("^SCH", "SSS"),
    ("(EE|IE)$", "Y"),
    ("(DT|RT|RD|NT|ND)$", "D"),
]

# applied to the tail (everything after the preserved first letter)
NYSIIS_TAIL: list[tuple[str, str]] = [
    ("EV", "AF"),
    ("[AEIOU]", "A"),
    ("Q", "G"),
    ("Z", "S"),
    ("M", "N"),
    ("KN", "N"),
    ("K", "C"),
    ("SCH", "SSS"),
    ("PH", "FF"),
    ("([^A])H", r"\1\1"),      # H after consonant -> that consonant
    ("(.)H([^A])", r"\1\1\2"),  # H before consonant -> previous char
    ("(.)H$", r"\1\1"),         # trailing H -> previous char
    ("^H", ""),                 # boundary H (first-letter context opaque)
    ("AW", "AA"),               # W after vowel -> vowel
]

# applied to first letter + rewritten tail, AFTER run collapsing
NYSIIS_POST: list[tuple[str, str]] = [
    ("(.)S$", r"\1"),
    ("^AY$", "Y"),
    ("(.)AY$", r"\1Y"),
    ("(.)A$", r"\1"),
]


def nysiis_col(col: Column, max_len: int = 6) -> Column:
    """NYSIIS-R key as a pure JVM expression chain (see module comment).
    Complements :func:`soundex_col` for blocking: NYSIIS retains more
    positional structure (it keeps real letters, not digit classes), so
    its blocks are finer — union both generators for recall, the
    meta-blocker prunes."""
    # Java replacement syntax is $1 where RE2/Python use \1 — the shared
    # tables store \1 and the Spark path translates
    def _jrep(rep: str) -> str:
        return re.sub(r"\\(\d)", r"$\1", rep)

    u = F.upper(F.regexp_replace(col, "[^A-Za-z]", ""))
    for pat, rep in NYSIIS_PRE:
        u = F.regexp_replace(u, pat, _jrep(rep))
    first = F.substring(u, 1, 1)
    tail = F.substring(u, 2, 1_000_000)
    for pat, rep in NYSIIS_TAIL:
        tail = F.regexp_replace(tail, pat, _jrep(rep))
    key = F.concat(first, tail)
    # collapse consecutive duplicate letters with a left fold (no pattern
    # backreferences): acc || c unless c repeats acc's last char
    key = F.aggregate(
        F.split(key, ""),
        F.lit(""),
        lambda acc, c: F.when(F.substring(acc, -1, 1) == c, acc).otherwise(
            F.concat(acc, c)
        ),
    )
    for pat, rep in NYSIIS_POST:
        key = F.regexp_replace(key, pat, _jrep(rep))
    return F.substring(key, 1, max_len)


def nysiis_sql(u: str, max_len: int = 6) -> str:
    """The identical NYSIIS-R chain as a DuckDB SQL expression over the
    expression ``u`` (generated from the same rule tables)."""

    def rr(expr: str, pat: str, rep: str) -> str:
        # DuckDB standard string literals keep backslashes verbatim, so the
        # table's \1 backrefs pass straight through; only quotes need escaping
        p = pat.replace("'", "''")
        r = rep.replace("'", "''")
        return f"regexp_replace({expr}, '{p}', '{r}', 'g')"

    e = f"upper(regexp_replace({u}, '[^A-Za-z]', '', 'g'))"
    for pat, rep in NYSIIS_PRE:
        e = rr(e, pat, rep)
    first = f"substr({e}, 1, 1)"
    tail = f"substr({e}, 2)"
    for pat, rep in NYSIIS_TAIL:
        tail = rr(tail, pat, rep)
    key = f"({first} || {tail})"
    key = (
        "list_reduce(list_prepend('', string_split("
        + key
        + ", '')), (a, c) -> CASE WHEN right(a, 1) = c THEN a ELSE a || c END)"
    )
    for pat, rep in NYSIIS_POST:
        key = rr(key, pat, rep)
    return f"substr({key}, 1, {max_len})"


def nysiis_py(s: str, max_len: int = 6) -> str:
    """Pure-Python mirror of the same chain (pytest parity reference)."""
    u = re.sub("[^A-Za-z]", "", s).upper()
    for pat, rep in NYSIIS_PRE:
        u = re.sub(pat, rep, u)
    first, tail = u[:1], u[1:]
    for pat, rep in NYSIIS_TAIL:
        tail = re.sub(pat, rep, tail)
    key = ""
    for c in first + tail:
        if not key or key[-1] != c:
            key += c
    for pat, rep in NYSIIS_POST:
        key = re.sub(pat, rep, key)
    return key[:max_len]
