"""PII scrub tests: counts and redaction vs a Python re reference, rule
ordering (no double counting), and partitioning invariance."""

import re

import pyspark.sql.functions as F
import pytest

from minimel_spark.operators.pii import DEFAULT_PII_RULES, pii_scrub


def _py_scrub(t):
    counts = {}
    for name, pat, repl in DEFAULT_PII_RULES:
        counts[f"n_{name}"] = len(re.findall(pat, t))
        t = re.sub(pat, repl, t)
    return counts, t


@pytest.fixture(scope="module")
def dirty(spark):
    rows = [
        (1, "mail me at jane.doe+spam@sub.example.co.uk or bob@x.io today"),
        (2, "server 192.168.0.1 and 10.0.0.255 are up"),
        (3, "account 123456789 card 9999888877776666"),
        (4, "mixed: a@b.com from 8.8.8.8 ref 0000000042"),
        (5, "clean text with no identifiers at all"),
        (6, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pii_scrub_matches_python_re(spark, dirty):
    got = {r["doc_id"]: r.asDict() for r in pii_scrub(dirty).collect()}
    for r in dirty.collect():
        counts, clean = _py_scrub(r["text"])
        g = got[r["doc_id"]]
        for k, v in counts.items():
            assert g[k] == v, (r["doc_id"], k)
        assert g["clean_text"] == clean
        assert g["n_pii"] == sum(counts.values())


def test_pii_scrub_sequential_no_double_count(spark):
    # the email's digits must NOT also count as an ID number, and the
    # ip inside the email context stays an email match only
    df = spark.createDataFrame(
        [(1, "x 12345678901@example.com y")], "doc_id long, text string"
    )
    row = pii_scrub(df).first()
    assert row["n_email"] == 1
    assert row["n_idnum"] == 0
    assert "<EMAIL>" in row["clean_text"] and "<NUM>" not in row["clean_text"]


def test_pii_scrub_partitioning_invariant(spark, dirty):
    a = sorted(map(tuple, pii_scrub(dirty).collect()))
    b = sorted(map(tuple, pii_scrub(dirty.repartition(5)).collect()))
    assert a == b


def test_pii_scrub_empty_rules_is_passthrough(spark):
    """rules=[] is a legitimate no-op configuration: n_pii must be 0 and the
    text unchanged (previously crashed on None.cast — r5 review finding)."""
    from minimel_spark.operators.pii import pii_scrub

    docs = spark.createDataFrame(
        [(1, "mail me at a@b.org")], "doc_id long, text string"
    )
    out = pii_scrub(docs, rules=[]).collect()
    assert out[0]["clean_text"] == "mail me at a@b.org"
    assert out[0]["n_pii"] == 0


def test_luhn_valid_known_numbers(spark):
    from minimel_spark.operators.pii import with_luhn_valid

    df = spark.createDataFrame(
        [
            ("4539148803436467", True),    # valid Visa test number
            ("4539148803436468", False),   # corrupted check digit
            ("4539-1488-0343-6467", True),  # separators stripped
            ("79927398713", True),         # the canonical Luhn example
            ("79927398714", False),
            ("7", False),                  # under two digits: invalid
            ("no digits", False),
        ],
        "acct string, want boolean",
    )
    rows = with_luhn_valid(df, "acct").collect()
    for r in rows:
        assert r["luhn_valid"] == r["want"], r["acct"]


def test_luhn_valid_matches_pure_python(spark):
    from minimel_spark.operators.pii import with_luhn_valid

    def luhn(s):
        ds = [int(c) for c in s if c.isdigit()]
        if len(ds) < 2:
            return False
        total = 0
        for i, d in enumerate(reversed(ds)):
            if i % 2 == 1:
                d *= 2
                if d > 9:
                    d -= 9
            total += d
        return total % 10 == 0

    accts = [str(1234567890123456 + 7 * i) for i in range(50)]
    df = spark.createDataFrame([(a,) for a in accts], "acct string")
    got = {r["acct"]: r["luhn_valid"] for r in with_luhn_valid(df, "acct").collect()}
    assert got == {a: luhn(a) for a in accts}
