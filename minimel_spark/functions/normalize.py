"""Surface-form normalization and tokenization.

Semantics reproduce the reference exactly (the north rule requires byte-identical
normalized anchors), re-expressed for batch execution inside pandas UDFs:

- ``normalize``            — reference ``minimel/normalize.py:6-20``
- ``vw_tok``               — reference ``minimel/vectorize.py:20-28``
- ``char_shingles``        — reference ``minimel/clean.py:65-72`` (``tokens``)

Stemming (reference ``minimel/normalize.py:57-110``) is gated behind optional
imports: the snowball/MeCab/etc. libraries are not part of this engine's
dependency set; ``normalize(..., language=...)`` raises cleanly if the stemmer
backend is unavailable. All pipeline defaults use ``language=None`` (the
reference's own default for its golden runs).

The whole chain deliberately stays a Python function rather than a Spark SQL
expression chain: ``html.unescape`` has no Catalyst equivalent, and byte-identity
beats expression pushdown for a per-row string function that is already
Arrow-batched.
"""

from __future__ import annotations

import html
import re

# Reference minimel/normalize.py:8
BADCHARS = "'\"〞「❜❞＂”‚〝»‟―‹›❛❮’‘〟❯„‛“❝«()"
_BADCHARS_RE = re.compile(f"[{re.escape(BADCHARS)}]")
_NUMDATE_RE = re.compile(r"^[0-9-/—]+$")


def normalize(a: str | None, language: str | None = None) -> str | None:
    """Normalize one anchor surface form; returns None when the anchor is dropped.

    Reference semantics (minimel/normalize.py:6-20), which yields 0-or-1 values;
    here None encodes "0 values" so the caller can mask dropped anchors in a batch.
    """
    if not a:
        return None
    # remove part between brackets
    a = a.split("_(")[0].replace("_", " ")
    a = _BADCHARS_RE.sub("", a.replace("&nbsp;", " "))
    a = html.unescape(a).lower().strip()
    # no numbers or dates
    if a.startswith("<") or _NUMDATE_RE.match(a):
        return None
    if a and language:
        a = stem(a, language)
    return a if a else None


def stem(text: str, code: str) -> str:
    """Optional per-language stemming (reference minimel/normalize.py:57-110).

    Backends are optional dependencies; absent backends raise ImportError with a
    clear message instead of silently changing semantics.
    """
    try:
        import snowballstemmer  # type: ignore
    except ImportError as e:  # pragma: no cover - env without stemmers
        raise ImportError(
            f"stemming for language {code!r} requires snowballstemmer; "
            "install it or run with language=None"
        ) from e
    lang = SNOWBALL_LANG.get(code)
    if not lang:
        raise ValueError(f"no stemmer mapping for language code {code!r}")
    stemmer = _STEMMERS.setdefault(code, snowballstemmer.stemmer(lang))
    return " ".join(stemmer.stemWords(text.split()))


# Reference minimel/normalize.py:23-50
SNOWBALL_LANG = {
    "ar": "arabic", "eu": "basque", "ca": "catalan", "da": "danish",
    "nl": "dutch", "en": "english", "fi": "finnish", "fr": "french",
    "de": "german", "el": "greek", "hi": "hindi", "hu": "hungarian",
    "id": "indonesian", "ga": "irish", "it": "italian", "lt": "lithuanian",
    "ne": "nepali", "no": "norwegian", "pt": "portuguese", "ro": "romanian",
    "ru": "russian", "sr": "serbian", "es": "spanish", "sv": "swedish",
    "ta": "tamil", "tr": "turkish",
}

_STEMMERS: dict[str, object] = {}  # executor-singleton cache (normalize.py:53)


_TOKEN_RE = re.compile(r"(?u)\b\w+\b")


def vw_tok(text: str) -> list[str]:
    """Word tokenizer (reference minimel/vectorize.py:20-28): lowercase ``\\b\\w+\\b``
    tokens, dropping tokens containing ``|`` or ``:`` (VW namespace chars)."""
    return [
        t for t in _TOKEN_RE.findall(text.lower()) if ("|" not in t) and (":" not in t)
    ]


_NONWORD_RE = re.compile(r"\W")


def char_shingles(s: str, n: int = 3) -> set[str]:
    """Char n-gram shingles per word (reference ``tokens``, minimel/clean.py:65-72):
    lowercase, cut at ``" ("`` / ``" ,"``, split on non-word chars, emit n-char
    windows within each word."""
    s = s.lower().rsplit(" (")[0].rsplit(" ,")[0]
    return {
        w[i : i + n]
        for w in _NONWORD_RE.split(s.lower())
        if w.strip()
        for i in range(len(w) - n + 1)
    }
