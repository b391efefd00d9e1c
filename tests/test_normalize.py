"""Unit tests for the vendored normalization semantics (reference
minimel/normalize.py:6-20, minimel/vectorize.py:20-28, minimel/clean.py:65-72).
Golden expectations hand-derived from the reference function bodies."""

from minimel_spark.functions.normalize import char_shingles, normalize, vw_tok


def test_normalize_basic():
    assert normalize("Amsterdam") == "amsterdam"
    assert normalize("New_York") == "new york"
    assert normalize("  Padded  ") == "padded"


def test_normalize_qualifier_split():
    # split on "_(" takes part before the bracket
    assert normalize("Mercury_(planet)") == "mercury"
    # " (" with space is NOT split (only the underscore form is), but the
    # parens themselves are BADCHARS and get deleted
    assert normalize("Mercury (planet)") == "mercury planet"


def test_normalize_badchars_and_entities():
    assert normalize("“Acme”") == "acme"
    assert normalize("Tom&nbsp;Waits") == "tom waits"
    assert normalize("AT&amp;T") == "at&t"
    assert normalize("«Quoted»") == "quoted"
    assert normalize("(paren)") == "paren"


def test_normalize_drops():
    assert normalize("") is None
    assert normalize(None) is None
    assert normalize("1984") is None
    assert normalize("2024-01-01") is None
    assert normalize("12/25") is None
    assert normalize("<ref>") is None
    # html-unescape happens before the '<' check? No: check is after unescape
    assert normalize("&lt;tag&gt;") is None  # unescapes to <tag>


def test_normalize_badchar_only_becomes_empty():
    assert normalize("“”") is None


def test_vw_tok():
    assert vw_tok("Hello, World!") == ["hello", "world"]
    # \w+ tokens can never contain | or : (the regex splits there), so the
    # reference's defensive filter passes these through as separate tokens
    assert vw_tok("a|b c:d plain") == ["a", "b", "c", "d", "plain"]
    assert vw_tok("") == []


def test_char_shingles():
    assert char_shingles("acme") == {"acm", "cme"}
    assert char_shingles("Acme Corp (company)") == {"acm", "cme", "cor", "orp"}
    assert char_shingles("ab") == set()
    # cut at " ,"
    assert char_shingles("acme , junk") == {"acm", "cme"}
