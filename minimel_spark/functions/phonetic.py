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
