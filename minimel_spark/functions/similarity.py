"""Pairwise string-similarity kernels (pure Python/numpy, run inside pandas
UDF batches). North-star features: Jaro-Winkler, Levenshtein (Spark built-in
``F.levenshtein`` is used JVM-side instead), hashed bag-of-words cosine.
"""

from __future__ import annotations

import zlib

import numpy as np


def jaro(s1: str, s2: str) -> float:
    if s1 == s2:
        return 1.0
    n1, n2 = len(s1), len(s2)
    if not n1 or not n2:
        return 0.0
    match_dist = max(n1, n2) // 2 - 1
    m1 = [False] * n1
    m2 = [False] * n2
    matches = 0
    for i, c in enumerate(s1):
        lo = max(0, i - match_dist)
        hi = min(n2, i + match_dist + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                matches += 1
                break
    if not matches:
        return 0.0
    t = 0
    k = 0
    for i in range(n1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    return (matches / n1 + matches / n2 + (matches - t) / matches) / 3


def jaro_winkler(
    s1: str,
    s2: str,
    prefix_scale: float = 0.1,
    max_prefix: int = 4,
    boost_threshold: float = 0.7,
) -> float:
    """Winkler 1990 semantics: the common-prefix boost applies ONLY when
    the Jaro similarity exceeds ``boost_threshold`` (0.7 standard) — the
    same rule DuckDB's ``jaro_winkler_similarity`` implements, which is
    what makes the jw feature oracle-checkable on worlds where blocked
    pairs share a prefix but score below the threshold."""
    j = jaro(s1, s2)
    if j <= boost_threshold:
        return j
    prefix = 0
    for a, b in zip(s1[:max_prefix], s2[:max_prefix]):
        if a != b:
            break
        prefix += 1
    return j + prefix * prefix_scale * (1 - j)


def hashed_bow(tokens, dim: int = 1 << 18) -> dict[int, float]:
    """Deterministic hashed bag-of-words (the reference's HashingVectorizer,
    minimel/vectorize.py:170-181, with crc32 in place of murmur)."""
    v: dict[int, float] = {}
    for t in tokens:
        h = zlib.crc32(t.encode("utf-8")) % dim
        v[h] = v.get(h, 0.0) + 1.0
    return v


def sparse_cosine(a: dict[int, float], b: dict[int, float]) -> float:
    if not a or not b:
        return 0.0
    if len(b) < len(a):
        a, b = b, a
    dot = sum(w * b.get(k, 0.0) for k, w in a.items())
    if not dot:
        return 0.0
    na = np.sqrt(sum(w * w for w in a.values()))
    nb = np.sqrt(sum(w * w for w in b.values()))
    return float(dot / (na * nb))


def damerau_levenshtein(a: str, b: str) -> int:
    """TRUE (unrestricted) Damerau-Levenshtein distance — the
    Lowrance-Wagner 1975 recurrence with the last-seen-character table, so
    transposed characters may drift apart via intermediate edits
    (dl('CA','ABC') == 2, where the restricted OSA variant says 3). This is
    the variant DuckDB's native ``damerau_levenshtein`` implements, which
    is what lets the join gate use it as an independent oracle.
    Transpositions are the dominant human typo class in names, so this is
    the edit metric ER matchers actually want; plain Levenshtein charges
    every swap 2 and under-scores exactly those pairs."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if not la:
        return lb
    if not lb:
        return la
    inf = la + lb
    # H is (la+2) x (lb+2); row/col 0 hold the INF sentinel rim
    h = [[inf] * (lb + 2) for _ in range(la + 2)]
    for i in range(la + 1):
        h[i + 1][1] = i
    for j in range(lb + 1):
        h[1][j + 1] = j
    da: dict[str, int] = {}
    for i in range(1, la + 1):
        db = 0
        ca = a[i - 1]
        for j in range(1, lb + 1):
            cb = b[j - 1]
            i1 = da.get(cb, 0)
            j1 = db
            if ca == cb:
                cost = 0
                db = j
            else:
                cost = 1
            h[i + 1][j + 1] = min(
                h[i][j] + cost,            # substitute / match
                h[i + 1][j] + 1,           # insert
                h[i][j + 1] + 1,           # delete
                h[i1][j1] + (i - i1 - 1) + 1 + (j - j1 - 1),  # transpose
            )
        da[ca] = i
    return h[la + 1][lb + 1]
