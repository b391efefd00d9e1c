"""Tests for auction assignment (operators/assignment.py)."""

import pytest

from minimel_spark.operators.assignment import auction_assignment


def test_auction_beats_greedy(spark):
    # greedy gives bidder 1 its favorite (10) and leaves bidder 2 with
    # nothing from item 10; the optimum is 9 + 8 = 17
    edges = spark.createDataFrame(
        [(1, 10, 10.0), (1, 20, 9.0), (2, 10, 8.0)],
        "bidder long, item long, score double",
    )
    rows = {
        r["bidder"]: r["item"]
        for r in auction_assignment(edges, n_rounds=6, eps=0.01).collect()
    }
    assert rows == {1: 20, 2: 10}


def test_auction_finds_optimal_3x3(spark):
    import itertools

    scores = {
        (1, 1): 7.0, (1, 2): 5.0, (1, 3): 1.0,
        (2, 1): 8.0, (2, 2): 4.0, (2, 3): 2.0,
        (3, 1): 9.0, (3, 2): 6.0, (3, 3): 3.0,
    }
    best = max(
        sum(scores[(b + 1, p)] for b, p in enumerate(perm))
        for perm in itertools.permutations([1, 2, 3])
    )
    edges = spark.createDataFrame(
        [(b, i, s) for (b, i), s in scores.items()],
        "bidder long, item long, score double",
    )
    out = auction_assignment(edges, n_rounds=12, eps=0.001).collect()
    total = sum(r["score"] for r in out)
    assert len(out) == 3
    assert total >= best - 3 * 0.001  # within n*eps of optimal


def test_auction_deterministic_and_partial(spark):
    edges = spark.createDataFrame(
        [(1, 10, 1.0), (2, 10, 1.0), (3, 10, 1.0)],
        "bidder long, item long, score double",
    )
    # one item, three bidders: exactly one assigned; ties break to the
    # smallest bidder id on equal bids, but later rounds outbid — the
    # result must still be a single deterministic row
    a = sorted(map(tuple, auction_assignment(edges, n_rounds=5).collect()))
    b = sorted(map(tuple, auction_assignment(edges, n_rounds=5).collect()))
    assert a == b
    assert len(a) == 1 and a[0][1] == 10
    with pytest.raises(ValueError):
        auction_assignment(edges, n_rounds=0)
    with pytest.raises(ValueError):
        auction_assignment(edges, eps=0.0)
