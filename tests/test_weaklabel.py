"""Weak-supervision label model (operators/weaklabel.py) tests."""

import pytest

from minimel_spark.operators.weaklabel import (
    vote_patterns,
    weak_label_model,
    weak_lf_stats,
)


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "v1 int, v2 int, v3 int")


def test_vote_patterns_encoding(spark):
    df = _pairs(spark, [(1, -1, 0), (0, 0, 0), (-1, 1, 1)])
    got = {r["pattern"] for r in vote_patterns(df, ["v1", "v2", "v3"]).collect()}
    # (1,-1,0) -> 1 + 2*3 + 0*9 = 7 ; (0,0,0) -> 0 ; (-1,1,1) -> 2 + 3 + 9 = 14
    assert got == {7, 0, 14}
    with pytest.raises(ValueError):
        vote_patterns(df, [])
    with pytest.raises(Exception):
        vote_patterns(
            spark.createDataFrame([(5,)], "v1 int"), ["v1"]
        ).collect()


def test_label_model_separates_planted_mixture(spark):
    # 40 pairs where all three LFs vote +1 (true matches), 60 where all
    # vote -1, plus noise rows where LFs disagree / abstain
    rows = [(1, 1, 1)] * 40 + [(-1, -1, -1)] * 60
    rows += [(1, -1, 0)] * 5 + [(0, 1, -1)] * 5
    df = _pairs(spark, rows)
    post = {
        r["pattern"]: r["p_match"]
        for r in weak_label_model(df, ["v1", "v2", "v3"]).collect()
    }
    all_pos = 1 + 3 + 9
    all_neg = 2 + 6 + 18
    assert post[all_pos] > 0.95
    assert post[all_neg] < 0.05
    # disagreeing patterns land strictly between the unanimous extremes
    for p, v in post.items():
        if p not in (all_pos, all_neg):
            assert post[all_neg] < v < post[all_pos]


def test_lf_stats_share_the_fit_and_rank_reliability(spark):
    # v1 and v2 agree with each other; v3 votes randomly-ish against them
    rows = [(1, 1, -1)] * 30 + [(-1, -1, 1)] * 30 + [(1, 1, 1)] * 10
    rows += [(-1, -1, -1)] * 10 + [(0, 1, 1)] * 4
    df = _pairs(spark, rows)
    stats = {r["lf"]: r for r in weak_lf_stats(df, ["v1", "v2", "v3"]).collect()}
    # corroborated LFs earn higher accuracy than the contrarian one
    assert stats["v1"]["accuracy"] > stats["v3"]["accuracy"]
    assert stats["v2"]["accuracy"] > stats["v3"]["accuracy"]
    # v1 abstained 4/84 times
    assert stats["v1"]["propensity"] == pytest.approx(80 / 84)
    # lam is identical across rows (one shared fit)
    lams = {r["lam"] for r in stats.values()}
    assert len(lams) == 1
    # posterior is deterministic across repeated fits
    a = sorted(map(tuple, weak_label_model(df, ["v1", "v2", "v3"]).collect()))
    b = sorted(map(tuple, weak_label_model(df, ["v1", "v2", "v3"]).collect()))
    assert a == b


def test_label_model_guards(spark):
    df = _pairs(spark, [(1, 1, 1)])
    with pytest.raises(ValueError, match="n_iter"):
        weak_label_model(df, ["v1"], n_iter=0)
    with pytest.raises(ValueError, match="at most 8"):
        vote_patterns(df, [f"v{i}" for i in range(9)])
    empty = spark.createDataFrame([], "v1 int")
    with pytest.raises(ValueError, match="empty"):
        weak_label_model(empty, ["v1"])
