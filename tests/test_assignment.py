"""Tests for auction assignment and stable marriage (operators/assignment.py)."""

import pytest

from minimel_spark.operators.assignment import auction_assignment, stable_marriage


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


def test_stable_marriage_textbook_instance(spark):
    # Classic 3x3 where proposer-optimal and acceptor-optimal matchings
    # differ. Scores encode preference ranks (higher = more preferred).
    # Proposers: 1 prefers A>B>C, 2 prefers B>A>C, 3 prefers A>B>C.
    # Acceptor scores: A prefers 2>1>3, B prefers 1>2>3, C anything.
    # GS with proposers proposing: 1->A, 2->B, 3->A; A keeps... the
    # matching must be stable — verify no blocking pair by brute force.
    scores = {
        (1, 10): 3.0, (1, 20): 2.0, (1, 30): 1.0,
        (2, 10): 2.5, (2, 20): 3.5, (2, 30): 1.5,
        (3, 10): 3.2, (3, 20): 2.2, (3, 30): 1.2,
    }
    edges = spark.createDataFrame(
        [(p, a, s) for (p, a), s in scores.items()],
        "proposer long, acceptor long, score double",
    )
    out = {
        (r["proposer"], r["acceptor"])
        for r in stable_marriage(edges, n_rounds=8).collect()
    }
    assert len(out) == 3
    matched_p = {p: a for p, a in out}
    matched_a = {a: p for p, a in out}
    # no blocking pair: an unmatched (p, a) where p prefers a over his
    # partner AND a prefers p over her partner
    for (p, a), s in scores.items():
        if matched_p[p] == a:
            continue
        p_prefers = s > scores[(p, matched_p[p])]
        a_prefers = s > scores[(matched_a[a], a)]
        assert not (p_prefers and a_prefers), f"blocking pair {(p, a)}"


def test_stable_marriage_eviction_chain(spark):
    # 2 proposers, 1 contested acceptor: proposer 2 evicts proposer 1,
    # who falls back to his second choice — needs >1 round to settle.
    edges = spark.createDataFrame(
        [(1, 10, 9.0), (1, 20, 1.0), (2, 10, 9.5)],
        "proposer long, acceptor long, score double",
    )
    out = {
        (r["proposer"], r["acceptor"])
        for r in stable_marriage(edges, n_rounds=4).collect()
    }
    assert out == {(2, 10), (1, 20)}


def test_stable_marriage_deterministic_ties_and_partial(spark):
    # equal scores: acceptor tie-breaks to the smaller proposer id; the
    # loser has nowhere else to go and stays unmatched
    edges = spark.createDataFrame(
        [(1, 10, 1.0), (2, 10, 1.0)],
        "proposer long, acceptor long, score double",
    )
    a = sorted(map(tuple, stable_marriage(edges, n_rounds=3).collect()))
    b = sorted(map(tuple, stable_marriage(edges, n_rounds=3).collect()))
    assert a == b
    assert len(a) == 1 and a[0][:2] == (1, 10)
    with pytest.raises(ValueError):
        stable_marriage(edges, n_rounds=0)
