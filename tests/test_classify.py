import math

import pytest

from minimel_spark.operators.classify import nb_classify


def test_nb_hand_example(spark):
    train = spark.createDataFrame(
        [("a", "x x y"), ("b", "z z y")], "lang string, text string"
    )
    test = spark.createDataFrame(
        [(1, "x y"), (2, ""), (3, "w")], "doc_id long, text string"
    )
    caches: list = []
    rows = {
        r["doc_id"]: r
        for r in nb_classify(train, test, persisted_out=caches).collect()
    }
    for c in caches:
        c.unpersist()
    # V=3, N_a=N_b=3, priors ln(1/2); P(x|a)=3/6, P(y|a)=2/6, P(x|b)=1/6
    sa = math.log(0.5) + math.log(3 / 6) + math.log(2 / 6)
    assert rows[1]["pred"] == "a"
    assert rows[1]["score"] == pytest.approx(sa)
    # empty doc: priors only, tie -> smallest label
    assert rows[2]["pred"] == "a"
    assert rows[2]["score"] == pytest.approx(math.log(0.5))
    # OOV token: smoothed default on both sides, tie -> smallest label
    assert rows[3]["pred"] == "a"
    assert rows[3]["score"] == pytest.approx(math.log(0.5) + math.log(1 / 6))


def test_nb_recovers_planted_classes(spark):
    """Held-out prediction on a planted two-vocabulary world: every test doc
    draws 5 of 6 words from its class vocabulary and 1 shared word."""
    a_words = ["goal", "match", "team", "score", "league", "coach"]
    b_words = ["tensor", "kernel", "compile", "shader", "buffer", "thread"]

    def doc(words, i):
        picks = [words[(i * 7 + j * 3) % 6] for j in range(5)] + ["the"]
        return " ".join(picks)

    train = spark.createDataFrame(
        [("sports", doc(a_words, i)) for i in range(30)]
        + [("tech", doc(b_words, i)) for i in range(30)],
        "lang string, text string",
    )
    test = spark.createDataFrame(
        [(i, doc(a_words, i + 11)) for i in range(20)]
        + [(100 + i, doc(b_words, i + 11)) for i in range(20)],
        "doc_id long, text string",
    )
    caches: list = []
    rows = {
        r["doc_id"]: r["pred"]
        for r in nb_classify(train, test, persisted_out=caches).collect()
    }
    for c in caches:
        c.unpersist()
    assert all(rows[i] == "sports" for i in range(20))
    assert all(rows[100 + i] == "tech" for i in range(20))


def test_nb_validates_alpha(spark):
    df = spark.createDataFrame([("a", "x")], "lang string, text string")
    with pytest.raises(ValueError, match="alpha"):
        nb_classify(df, df, alpha=0.0)


def test_readability_scores_matches_python(spark):
    import re

    from minimel_spark.operators.text import readability_scores

    rows = [
        (1, "The cat sat. The dog ran! Did they meet?"),
        (2, "no terminal punctuation here at all"),
        (3, "Rhythm myths fly by.  Tricky: zero classic vowels in some words!"),
        (4, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_sentences"], r["n_words"], r["n_syllables"],
                      round(r["flesch"], 9))
        for r in readability_scores(docs).collect()
    }
    for d, t in rows:
        nw = len([w for w in re.split(r"\W+", t.lower()) if w])
        if nw == 0:
            assert d not in got  # empty doc excluded
            continue
        ns = max(len(re.findall(r"[.!?]+", t)), 1)
        sy = len(re.findall(r"[aeiouy]+", t.lower()))
        fl = 206.835 - 1.015 * (nw / ns) - 84.6 * (sy / nw)
        assert got[d] == (ns, nw, sy, round(fl, 9)), d
    # doc 2: no punctuation -> sentence floor of 1 engaged
    assert got[2][0] == 1
    a = sorted(map(tuple, readability_scores(docs.coalesce(1)).collect()))
    b = sorted(map(tuple, readability_scores(docs.repartition(8)).collect()))
    assert a == b
