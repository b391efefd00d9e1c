"""Truth-discovery (operators/fusion.py) unit tests: one-round hand
arithmetic, the trust-learning behaviour that distinguishes fusion from
majority vote, tie-breaking, dedup, and validation."""

import math

import pytest

from minimel_spark.operators.fusion import truth_discovery


def _claims(spark, rows):
    return spark.createDataFrame(
        rows, "source_id string, object_id string, value string"
    )


def test_one_round_hand_arithmetic(spark):
    # o1: A and B assert v1, C asserts v2. init trust 0.8 everywhere.
    c = _claims(spark, [("A", "o1", "v1"), ("B", "o1", "v1"), ("C", "o1", "v2")])
    caches: list = []
    facts, trusts = truth_discovery(c, n_rounds=1, init_trust=0.8, persisted_out=caches)
    f = facts.collect()
    t = {r["source_id"]: r for r in trusts.collect()}
    for cache in caches:
        cache.unpersist()
    assert len(f) == 1
    row = f[0]
    # conf(v1) = 1 - 0.2*0.2 = 0.96; conf(v2) = 1 - 0.2 = 0.8
    assert row["value"] == "v1"
    assert row["confidence"] == pytest.approx(0.96)
    assert row["n_sources"] == 2
    # trust after round 1 = mean confidence of own claims
    assert t["A"]["trust"] == pytest.approx(0.96)
    assert t["B"]["trust"] == pytest.approx(0.96)
    assert t["C"]["trust"] == pytest.approx(0.8)
    assert t["A"]["n_claims"] == 1


def test_reliable_source_beats_tied_vote(spark):
    # A is corroborated by B on o1-o3; C is alone (wrong) on those objects.
    # On o4 the vote is 1-1 (A: x, C: y) — a majority rule cannot decide,
    # but learned trust(A) > trust(C) makes x win from round 2 on.
    rows = []
    for o in ["o1", "o2", "o3"]:
        rows += [("A", o, "t"), ("B", o, "t"), ("C", o, "w")]
    rows += [("A", "o4", "x"), ("C", "o4", "y")]
    caches: list = []
    facts, trusts = truth_discovery(
        _claims(spark, rows), n_rounds=3, init_trust=0.8, persisted_out=caches
    )
    got = {r["object_id"]: r["value"] for r in facts.collect()}
    t = {r["source_id"]: r["trust"] for r in trusts.collect()}
    for cache in caches:
        cache.unpersist()
    assert got["o4"] == "x"
    assert t["A"] > t["C"]
    for o in ["o1", "o2", "o3"]:
        assert got[o] == "t"


def test_tie_breaks_on_smaller_value_and_dedup(spark):
    # identical single-source support for both values -> equal confidence ->
    # ascending-value tie-break; duplicate assertions count once.
    c = _claims(
        spark,
        [
            ("A", "o1", "vb"),
            ("A", "o1", "vb"),  # duplicate claim, deduplicated
            ("B", "o1", "va"),
        ],
    )
    caches: list = []
    facts, trusts = truth_discovery(c, n_rounds=2, persisted_out=caches)
    row = facts.collect()[0]
    n_claims = {r["source_id"]: r["n_claims"] for r in trusts.collect()}
    for cache in caches:
        cache.unpersist()
    assert row["value"] == "va"
    assert row["n_sources"] == 1
    assert n_claims["A"] == 1


def test_noisy_or_matches_formula_across_rounds(spark):
    # two independent sources, one object, agreeing: closed-form recurrence
    # t_{k+1} = 1 - (1 - t_k)^2 (their trusts stay equal by symmetry).
    c = _claims(spark, [("A", "o1", "v"), ("B", "o1", "v")])
    t = 0.8
    for _ in range(3):
        t = 1 - (1 - t) ** 2
    caches: list = []
    facts, _ = truth_discovery(c, n_rounds=3, init_trust=0.8, persisted_out=caches)
    row = facts.collect()[0]
    for cache in caches:
        cache.unpersist()
    assert row["confidence"] == pytest.approx(t, rel=1e-12)
    assert math.isfinite(row["confidence"])


def test_validation(spark):
    c = _claims(spark, [("A", "o1", "v")])
    with pytest.raises(ValueError, match="n_rounds"):
        truth_discovery(c, n_rounds=0)
    with pytest.raises(ValueError, match="init_trust"):
        truth_discovery(c, init_trust=1.0)


def test_null_claims_are_dropped(spark):
    c = spark.createDataFrame(
        [("A", "o1", "v"), ("A", "o2", None), ("B", "o3", None)],
        "source_id string, object_id string, value string",
    )
    caches: list = []
    facts, trusts = truth_discovery(c, n_rounds=2, persisted_out=caches)
    f = facts.collect()
    t = {r["source_id"]: r for r in trusts.collect()}
    for cache in caches:
        cache.unpersist()
    # the NULL claims neither resolve objects nor count as claims
    assert {r["object_id"] for r in f} == {"o1"}
    assert t["A"]["n_claims"] == 1
    # a source asserting ONLY NULLs asserted nothing: absent, not trust-skewed
    assert "B" not in t


def test_crosswalk_audit_hand_example(spark):
    from minimel_spark.operators.golden import crosswalk_audit

    mapping = spark.createDataFrame(
        [
            ("a", "x"), ("a", "x"),          # dup link -> one 1:1
            ("b", "y"), ("b", "z"),          # 1:n fan-out
            ("c", "w"), ("d", "w"),          # n:1 fan-in
            ("e", "u"), ("e", "v"), ("f", "u"),  # n:m tangle
        ],
        "src_id string, dst_id string",
    )
    rows = {r["link_class"]: r for r in crosswalk_audit(mapping).collect()}
    assert set(rows) == {"1:1", "1:n", "n:1", "n:m"}
    # per-link classes: a→x 1:1; b→y, b→z, e→v 1:n; c→w, d→w, f→u n:1;
    # e→u (both endpoints deg 2) n:m
    assert rows["1:1"]["n_links"] == 1
    assert rows["1:n"]["n_links"] == 3 and rows["1:n"]["n_src"] == 2
    assert rows["n:1"]["n_links"] == 3 and rows["n:1"]["n_dst"] == 2
    assert rows["n:m"]["n_links"] == 1
    total = sum(r["n_links"] for r in rows.values())
    assert abs(sum(r["pct_links"] for r in rows.values()) - 1.0) < 1e-9
    assert total == 8


def test_crosswalk_audit_empty(spark):
    from minimel_spark.operators.golden import crosswalk_audit

    empty = spark.createDataFrame([], "src_id string, dst_id string")
    rows = crosswalk_audit(empty).collect()
    assert len(rows) == 4
    assert all(r["n_links"] == 0 and r["pct_links"] == 0.0 for r in rows)


def test_cluster_medoids_hand_example(spark):
    from minimel_spark.operators.golden import cluster_medoids

    asg = spark.createDataFrame(
        [
            (1, "c1", "smith"),
            (2, "c1", "smyth"),   # dist 1 to smith, 2 to smithe
            (3, "c1", "smithe"),  # smith: 1+1=2, smyth: 1+2=3, smithe: 1+2=3
            (9, "c2", "alone"),
        ],
        "rec_id long, cluster_id string, name string",
    )
    rows = {r["cluster_id"]: r for r in cluster_medoids(asg).collect()}
    assert rows["c1"]["medoid_id"] == 1 and rows["c1"]["medoid_name"] == "smith"
    assert rows["c1"]["sum_dist"] == 2 and rows["c1"]["cluster_size"] == 3
    # singleton elects itself at distance zero
    assert rows["c2"]["medoid_id"] == 9 and rows["c2"]["sum_dist"] == 0
    assert rows["c2"]["cluster_size"] == 1


def test_cluster_medoids_tiebreak(spark):
    from minimel_spark.operators.golden import cluster_medoids

    # two identical names: equal sums -> smaller id wins
    asg = spark.createDataFrame(
        [(7, "c", "same"), (3, "c", "same")],
        "rec_id long, cluster_id string, name string",
    )
    row = cluster_medoids(asg).collect()[0]
    assert row["medoid_id"] == 3 and row["sum_dist"] == 0


def test_conflict_report_hand_example(spark):
    from minimel_spark.operators.golden import conflict_report

    recs = spark.createDataFrame(
        [
            (1, "acme", "10"),
            (2, "acme", "12"),
            (3, "akme", None),
            (9, "solo", "5"),
        ],
        "rec_id long, brand string, size string",
    )
    mem = spark.createDataFrame(
        [(1, "c1"), (2, "c1"), (3, "c1"), (9, "c2")],
        "rec_id long, cluster_id string",
    )
    rows = {
        (r["cluster_id"], r["attr"]): r
        for r in conflict_report(recs, mem, ["brand", "size"]).collect()
    }
    b = rows[("c1", "brand")]
    assert (b["n_members"], b["n_present"], b["n_distinct"]) == (3, 3, 2)
    assert b["majority_value"] == "acme"
    assert abs(b["majority_share"] - 2 / 3) < 1e-12
    assert b["is_conflict"]
    s = rows[("c1", "size")]
    assert s["n_present"] == 2 and s["n_distinct"] == 2  # NULL not a value
    assert s["majority_value"] == "10"  # tie -> value asc, like golden mode
    solo = rows[("c2", "brand")]
    assert not solo["is_conflict"] and solo["majority_share"] == 1.0


def test_conflict_report_all_null_and_guards(spark):
    import pytest as _pytest

    from minimel_spark.operators.golden import conflict_report

    recs = spark.createDataFrame([(1, None)], "rec_id long, brand string")
    mem = spark.createDataFrame([(1, "c")], "rec_id long, cluster_id string")
    row = conflict_report(recs, mem, ["brand"]).collect()[0]
    assert row["n_present"] == 0 and row["majority_value"] is None
    assert row["majority_share"] is None and not row["is_conflict"]
    with _pytest.raises(ValueError):
        conflict_report(recs, mem, [])
    with _pytest.raises(ValueError, match="not in records"):
        conflict_report(recs, mem, ["nope"])


def test_dempster_rule_hand_arithmetic(spark):
    from minimel_spark.operators.fusion import dempster_shafer_fusion

    # two sources: m1=(0.6,0.1,theta 0.3), m2=(0.5,0.2,theta 0.3)
    # unnormalized: m(M)=0.6*0.5+0.6*0.3+0.3*0.5=0.63; closed form
    # (0.9*0.8)-0.09=0.63; m(N)=(0.4*0.5)-0.09=0.11; m(T)=0.09
    # Z=0.83, K=0.17; bel=0.63/0.83, pl=(0.63+0.09)/0.83
    pairs = spark.createDataFrame(
        [(1, 2, 0.6, 0.1, 0.5, 0.2)],
        "a long, b long, m1 double, n1 double, m2 double, n2 double",
    )
    r = dempster_shafer_fusion(pairs, [("m1", "n1"), ("m2", "n2")]).collect()[0]
    assert abs(r["bel_match"] - 0.63 / 0.83) < 1e-12
    assert abs(r["pl_match"] - 0.72 / 0.83) < 1e-12
    assert abs(r["m_theta"] - 0.09 / 0.83) < 1e-12
    assert abs(r["conflict"] - 0.17) < 1e-12


def test_dempster_vacuous_source_is_neutral(spark):
    from minimel_spark.operators.fusion import dempster_shafer_fusion

    # a fully ignorant source (m=n=0) must not change the combination
    pairs = spark.createDataFrame(
        [(1, 0.6, 0.1, 0.0, 0.0)],
        "a long, m1 double, n1 double, m2 double, n2 double",
    )
    one = dempster_shafer_fusion(
        pairs.select("a", "m1", "n1"), [("m1", "n1")]
    ).collect()[0]
    two = dempster_shafer_fusion(pairs, [("m1", "n1"), ("m2", "n2")]).collect()[0]
    for c in ("bel_match", "pl_match", "m_theta", "conflict"):
        assert abs(one[c] - two[c]) < 1e-12


def test_dempster_total_conflict_and_validation(spark):
    import pytest

    from minimel_spark.operators.fusion import dempster_shafer_fusion

    # categorical disagreement: m1 all-match, m2 all-nonmatch -> the rule
    # degenerates (Z -> 0); with a hair of ignorance it stays finite and
    # conflict dominates
    pairs = spark.createDataFrame(
        [(1, 0.99, 0.0, 0.0, 0.99)],
        "a long, m1 double, n1 double, m2 double, n2 double",
    )
    r = dempster_shafer_fusion(pairs, [("m1", "n1"), ("m2", "n2")]).collect()[0]
    assert r["conflict"] > 0.9
    assert 0.0 <= r["bel_match"] <= r["pl_match"] <= 1.0
    with pytest.raises(ValueError):
        dempster_shafer_fusion(pairs, [])


def test_attribute_outliers_hampel_rule(spark):
    import pytest

    from minimel_spark.operators.golden import attribute_outliers

    # cluster A: values 100..104 (median 102, MAD 1) plus a 10000 unit
    # error; cluster B: tight values, no outlier
    rows = [("A", f"a{i}", 100 + i) for i in range(5)] + [
        ("A", "bad", 10000),
        ("B", "b1", 50), ("B", "b2", 51), ("B", "b3", 52),
    ]
    recs = spark.createDataFrame(rows, "cluster_id string, rec_id string, value long")
    out = attribute_outliers(recs, k=3.0).collect()
    assert {r["rec_id"] for r in out} == {"bad"}
    r = out[0]
    # 6 values: median interpolates between 102 and 103
    assert r["med"] == 102.5 and r["dev"] == 10000 - 102.5
    with pytest.raises(ValueError):
        attribute_outliers(recs, k=0)


def test_attribute_outliers_zero_mad_flags_any_deviation(spark):
    from minimel_spark.operators.golden import attribute_outliers

    # over half the cluster shares one value -> MAD 0 -> every deviating
    # record is flagged, equal ones are not
    rows = [("C", f"c{i}", 7) for i in range(4)] + [("C", "x", 8)]
    recs = spark.createDataFrame(rows, "cluster_id string, rec_id string, value long")
    out = attribute_outliers(recs, k=3.0).collect()
    assert {r["rec_id"] for r in out} == {"x"}
    assert out[0]["mad"] == 0.0
