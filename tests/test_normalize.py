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


# ---------- stemming backend matrix (reference normalize.py:57-110) ----------

def _installed(mod):
    try:
        __import__(mod)
        return True
    except ImportError:
        return False


def test_stem_absent_backends_raise_with_package_name():
    """Every gated backend must fail LOUDLY with the package name — never
    silently change semantics."""
    import pytest

    from minimel_spark.functions.normalize import stem

    cases = [
        ("en", {}, "snowballstemmer"),   # snowball language
        ("is", {}, "simplemma"),
        ("fa", {}, "PersianStemmer"),
        ("ja", {}, "MeCab"),
        ("en", {"spacy": True}, "spacy"),
    ]
    for code, kw, pkg in cases:
        if _installed(pkg if pkg != "MeCab (mecab-python3)" else "MeCab"):
            continue
        with pytest.raises(ImportError, match=pkg.split(" ")[0]):
            stem("running quickly", code, **kw)


def test_stem_unsegmented_script_requires_icu():
    """ADVICE r2: scripts without whitespace word boundaries (zh, th, ...)
    must NOT silently degrade to str.split — absent icu_tokenizer raises with
    the package name, like every other gated backend."""
    import pytest

    from minimel_spark.functions.normalize import ICU_REQUIRED, stem

    if _installed("icu_tokenizer"):
        pytest.skip("icu_tokenizer installed; fallback path not reachable")
    for code in ("zh", "th"):
        assert code in ICU_REQUIRED
        with pytest.raises(ImportError, match="icu_tokenizer"):
            stem("你好世界", code)
    # whitespace-delimited unmapped code still tokenizes via str.split
    assert stem("hello world", "xx") == "hello world"


def test_stem_snowball_parity_when_installed():
    import pytest

    if not _installed("snowballstemmer"):
        pytest.skip("snowballstemmer not installed")
    from minimel_spark.functions.normalize import stem

    assert stem("running runs", "en") == "run run"


def test_stem_unmapped_language_tokenizes_only_when_icu_installed():
    import pytest

    if not _installed("icu_tokenizer"):
        pytest.skip("icu_tokenizer not installed")
    from minimel_spark.functions.normalize import stem

    # unmapped code: ICU tokenization only (reference normalize.py:110)
    assert stem("hello world", "xx") == "hello world"


def test_transliterator_charmap_and_code():
    from minimel_spark.functions.normalize import TransLiterator

    sbl = (
        "routines ( mark_regions )\n"
        "stringdef a'   '{U+00E1}'\n"
        "stringdef e'   '{U+00E9}'\n"
    )
    tl = TransLiterator(sbl_text=sbl)
    assert tl.charmap == {"á": "a'", "é": "e'"}
    assert tl.code("café árbol") == "cafe' a'rbol"


def test_transliterator_fetch_gated():
    import pytest

    from minimel_spark.functions.normalize import TransLiterator

    try:
        import requests  # noqa: F401
        pytest.skip("requests installed; gated-error path not applicable")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="requests"):
        TransLiterator(lang="spanish", fetch=True)


def test_confusable_skeleton_folds_homoglyphs(spark):
    import pyspark.sql.functions as F

    from minimel_spark.functions.normalize import (
        CONFUSABLE_FROM,
        CONFUSABLE_TO,
        confusable_skeleton_col,
    )

    assert len(CONFUSABLE_FROM) == len(CONFUSABLE_TO)
    df = spark.createDataFrame(
        [
            ("pаypаl",),   # Cyrillic а (U+0430) twice
            ("paypal",),   # pure Latin
            ("СhАОs",),    # UPPER Cyrillic С/А/О lowercase into the mapping
        ],
        "form string",
    )
    out = [
        r["sk"]
        for r in df.select(confusable_skeleton_col(F.col("form")).alias("sk"))
        .collect()
    ]
    assert out[0] == out[1] == "paypal"
    assert out[2] == "chaos"
    # skeleton equality exposes the spoof pair; raw forms differ
    assert "pаypаl" != "paypal"


def test_expand_abbreviations_whole_tokens_only(spark):
    import pyspark.sql.functions as F

    from minimel_spark.functions.normalize import expand_abbreviations_col

    df = spark.createDataFrame(
        [
            ("123 Main St Apt 4",),
            ("Stone Rd",),         # 'stone' must NOT become 'streetone'
            ("W 42nd st",),        # 'w' expands as a whole token
            ("no abbreviations here",),
        ],
        "raw string",
    )
    out = [
        r["x"]
        for r in df.select(expand_abbreviations_col(F.col("raw")).alias("x"))
        .collect()
    ]
    assert out[0] == "123 main street apartment 4"
    assert out[1] == "stone road"
    assert out[2] == "west 42nd street"
    assert out[3] == "no abbreviations here"
    # custom table override
    custom = df.select(
        expand_abbreviations_col(F.col("raw"), {"main": "principal"}).alias("x")
    ).collect()
    assert custom[0]["x"] == "123 principal st apt 4"


def test_parse_person_name_forms(spark):
    import pyspark.sql.functions as F

    from minimel_spark.functions.normalize import parse_person_name_cols

    cases = [
        ("Dr. John A. Smith Jr.", ("dr", "john", "a", "smith", "jr")),
        ("Smith, John", (None, "john", None, "smith", None)),
        ("Mary Beth Ann Jones", (None, "mary", "beth ann", "jones", None)),
        ("Smith", (None, None, None, "smith", None)),
        ("Prof Plum", ("prof", None, None, "plum", None)),
        ("Jane Doe III", (None, "jane", None, "doe", "iii")),
    ]
    df = spark.createDataFrame([(c,) for c, _ in cases], "raw string")
    rows = [
        (r["p"]["title"], r["p"]["given"], r["p"]["middle"],
         r["p"]["family"], r["p"]["suffix"])
        for r in df.select(
            parse_person_name_cols(F.col("raw")).alias("p")
        ).collect()
    ]
    for (raw, want), got in zip(cases, rows):
        assert got == want, (raw, got, want)


def test_standardize_date_cols_formats_and_calendar(spark):
    import pyspark.sql.functions as F

    from minimel_spark.functions.normalize import standardize_date_cols

    cases = [
        ("1995-07-04", "iso", "1995-07-04", True),
        ("7/4/1995", "us", "1995-07-04", True),
        ("7/4/95", "us2", "1995-07-04", True),      # 95 >= pivot -> 19xx
        ("7/4/69", "us2", "2069-07-04", True),      # 69 < pivot -> 20xx
        ("4.7.1995", "eu", "1995-07-04", True),
        ("Jul 4, 1995", "name", "1995-07-04", True),
        ("july 4, 1995", "name", "1995-07-04", True),
        ("19950704", "compact", "1995-07-04", True),
        ("  1995-07-04  ", "iso", "1995-07-04", True),   # trimmed
        ("2000-02-29", "iso", "2000-02-29", True),       # 400-rule leap
        ("1900-02-29", "iso", None, False),              # 100-rule non-leap
        ("2024-02-29", "iso", "2024-02-29", True),       # 4-rule leap
        ("2023-02-29", "iso", None, False),
        ("1995-13-01", "iso", None, False),              # month 13
        ("31.4.1995", "eu", None, False),                # April 31
        ("Foo 4, 1995", "unknown", None, False),         # bad month name
        ("4 July 1995", "unknown", None, False),
        ("", "unknown", None, False),
    ]
    df = spark.createDataFrame([(i, s) for i, (s, *_i) in enumerate(cases)], "i long, s string")
    got = {
        r["i"]: (r["p"]["date_fmt"], r["p"]["iso_date"], r["p"]["date_valid"])
        for r in df.select("i", standardize_date_cols(F.col("s")).alias("p")).collect()
    }
    for i, (s, fmt, iso, valid) in enumerate(cases):
        assert got[i] == (fmt, iso, valid), (s, got[i])


def test_fold_accents_three_way_parity(spark):
    import duckdb
    import pyspark.sql.functions as F

    from minimel_spark.functions.normalize import (
        ACCENT_EXPAND,
        ACCENT_FROM,
        fold_accents_col,
        fold_accents_py,
        fold_accents_sql,
    )

    names = [
        "Müller", "crème brûlée", "Ñandú", "Æsir", "Großstraße", "Þór",
        "FRANÇOIS", "Škoda", "Łódź... almost", "plain ascii", "",
        ACCENT_FROM,                      # every 1:1 fold at once
        "".join(s for s, _ in ACCENT_EXPAND),
        "mixed: Besançon-Øresund œuvre",
    ]
    df = spark.createDataFrame([(i, n) for i, n in enumerate(names)], "i long, n string")
    got = {
        r["i"]: r["k"]
        for r in df.select("i", fold_accents_col(F.col("n")).alias("k")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i BIGINT, n VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(names)))
    duck = dict(con.execute(f"SELECT i, {fold_accents_sql('n')} FROM t").fetchall())
    for i, n in enumerate(names):
        want = fold_accents_py(n)
        assert got[i] == want, (n, got[i], want)
        assert duck[i] == want, (n, duck[i], want)
    # folded output of table characters is pure ASCII
    assert fold_accents_py(ACCENT_FROM).isascii()
    # ł is in the 1:1 table; ź/ż fold; the ellipsis passes through untouched
    assert fold_accents_py("Łódź…") == "Lodz…"
