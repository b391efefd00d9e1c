"""Gazetteer multi-pattern matcher (SURVEY §2 M1, O6).

Reference: minimel/mentions.py:16-45 — an ahocorasick_rs automaton with
``MatchKind.LeftmostLongest`` plus a word-boundary post-filter (prev/next char
non-alphanumeric). This module reproduces those semantics with a pure-Python
trie scanner (ahocorasick_rs is used instead when importable — same contract),
built ONCE per executor from a broadcast name list and reused across Arrow
batches (the executor-singleton pattern the reference uses per dask partition,
mentions.py:55).
"""

from __future__ import annotations


class TrieMatcher:
    """Leftmost-longest non-overlapping multi-pattern scanner with the
    reference's word-boundary rule."""

    __slots__ = ("root",)

    def __init__(self, names):
        root: dict = {}
        for name in names:
            node = root
            for ch in name:
                node = node.setdefault(ch, {})
            node[""] = True  # terminal
        self.root = root

    def find_matches(self, text: str):
        """Yield (start, surface) — surface is the matched slice of ``text``.
        Matches are leftmost-longest and non-overlapping (ahocorasick_rs
        LeftmostLongest), then filtered by the boundary rule
        (mentions.py:20-24)."""
        root = self.root
        n = len(text)
        i = 0
        while i < n:
            node = root
            j = i
            last_end = -1
            while j < n and text[j] in node:
                node = node[text[j]]
                j += 1
                if "" in node:
                    last_end = j
            if last_end > i:
                # boundary check: surrounded by non-alphanumeric characters
                ok = not (i != 0 and text[i - 1].isalnum())
                if ok and last_end != n and text[last_end].isalnum():
                    ok = False
                if ok:
                    yield (i, text[i:last_end])
                i = last_end
            else:
                i += 1


def build_matcher(names):
    """Prefer the Rust automaton when available (contract-identical)."""
    try:  # pragma: no cover - optional fast path
        from ahocorasick_rs import AhoCorasick, Implementation, MatchKind

        ac = AhoCorasick(
            list(names),
            matchkind=MatchKind.LeftmostLongest,
            implementation=Implementation.NoncontiguousNFA,
        )

        class _ACWrap:
            def find_matches(self, text):
                for _, start, end in ac.find_matches_as_indexes(text):
                    if start != 0 and text[start - 1].isalnum():
                        continue
                    if end != len(text) and text[end].isalnum():
                        continue
                    yield (start, text[start:end])

        return _ACWrap()
    except ImportError:
        return TrieMatcher(names)
