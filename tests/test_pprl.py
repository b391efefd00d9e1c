"""Tests for privacy-preserving linkage (operators/pprl.py): CLK
Bloom-filter encodings and Dice comparison, including an independent
hashlib replication of the bit positions."""

import hashlib

import pytest

from minimel_spark.operators.pprl import clk_dice_pairs, clk_encode


def _ref_clk(text, m=128, k=4, q=2, salt=":clk"):
    s = "_" + text.lower() + "_"
    grams = [s[i : i + q] for i in range(len(s) - q + 1)]
    pos = {
        int(hashlib.md5(f"{j}:{g}{salt}".encode()).hexdigest()[:8], 16) % m
        for g in grams
        for j in range(1, k + 1)
    }
    return sorted(pos)


def test_clk_encode_matches_independent_hashlib(spark):
    recs = spark.createDataFrame(
        [(1, "Alice Smith"), (2, "alice smith"), (3, "Bob")],
        "rec_id long, name string",
    )
    rows = {r["rec_id"]: r for r in clk_encode(recs, "name").collect()}
    assert list(rows[1]["clk"]) == _ref_clk("Alice Smith")
    # case-insensitive: same filter
    assert list(rows[1]["clk"]) == list(rows[2]["clk"])
    assert rows[3]["n_bits"] == len(_ref_clk("Bob"))


def test_clk_dice_pairs_hand_values(spark):
    recs = spark.createDataFrame(
        [(1, "smith"), (2, "smith"), (3, "smyth"), (4, "")],
        "rec_id long, name string",
    )
    enc = clk_encode(recs, "name")
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (4, 4)], "id_a long, id_b long"
    )
    rows = {
        (r["id_a"], r["id_b"]): r
        for r in clk_dice_pairs(enc, pairs).collect()
    }
    assert rows[(1, 2)]["dice"] == 1.0  # identical strings
    a, b = set(_ref_clk("smith")), set(_ref_clk("smyth"))
    expected = 2.0 * len(a & b) / (len(a) + len(b))
    assert abs(rows[(1, 3)]["dice"] - expected) < 1e-12
    assert 0.0 < rows[(1, 3)]["dice"] < 1.0
    # empty-vs-empty: '_'-padded empty string still yields one bigram '__'
    # so n_bits > 0; the zero-denominator guard is covered by the threshold
    assert rows[(4, 4)]["dice"] == 1.0


def test_clk_threshold_and_guards(spark):
    recs = spark.createDataFrame(
        [(1, "abc"), (2, "xyz")], "rec_id long, name string"
    )
    enc = clk_encode(recs, "name")
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    full = clk_dice_pairs(enc, pairs, threshold=0.0).collect()
    assert len(full) == 1
    cut = clk_dice_pairs(enc, pairs, threshold=1.01).collect()
    assert cut == []
    with pytest.raises(ValueError):
        clk_encode(recs, "name", m=0)


def test_clk_bit_audit_matches_python(spark):
    import hashlib

    import pytest as _pt

    from minimel_spark.operators.pprl import clk_bit_audit, clk_encode

    names = ["smith john", "smith jane", "jones amy", "li wei"]
    recs = spark.createDataFrame([(n,) for n in names], "name string")
    m, k = 32, 3
    clks = clk_encode(recs, "name", id_col="name", m=m, k=k, q=2)
    got = {
        r["bit"]: (r["n_set"], r["freq"], r["lift"], r["chi2"])
        for r in clk_bit_audit(clks, m=m).collect()
    }
    assert set(got) == set(range(m))

    def bits(name):
        s = f"_{name.lower()}_"
        grams = [s[i:i + 2] for i in range(len(s) - 1)]
        out = set()
        for g in grams:
            for j in range(1, k + 1):
                out.add(int(hashlib.md5(f"{j}:{g}:clk".encode()).hexdigest()[:8], 16) % m)
        return out

    cnt = {b: 0 for b in range(m)}
    for n in names:
        for b in bits(n):
            cnt[b] += 1
    tot = sum(cnt.values())
    chi = sum((c - tot / m) ** 2 / (tot / m) for c in cnt.values())
    for b in range(m):
        assert got[b][0] == cnt[b], b
        assert abs(got[b][1] - cnt[b] / len(names)) < 1e-9
        assert abs(got[b][2] - (cnt[b] * m / tot)) < 1e-9
        assert abs(got[b][3] - chi) < 1e-6
    # the shared 'smith' grams drive repeated bits: some bit is set by >= 2
    # records while never-hit bits report 0 (leakage the audit exists to show)
    assert max(c for c, *_ in got.values()) >= 2
    assert min(c for c, *_ in got.values()) == 0
    a = sorted(map(tuple, clk_bit_audit(clks.coalesce(1), m=m).collect()))
    b2 = sorted(map(tuple, clk_bit_audit(clks.repartition(8), m=m).collect()))
    assert a == b2
    with _pt.raises(ValueError):
        clk_bit_audit(clks, m=0)
