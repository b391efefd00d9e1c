"""key_skew_profile: Python-Counter parity, composite/NULL keys, tie
ordering, cache hand-off, and validation."""

from collections import Counter

import pytest

from minimel_spark.operators.diagnostics import key_skew_profile

from conftest import pinned_rdd_ids


def _want(keys, top_n):
    c = Counter(keys)
    n_rows, n_keys = float(len(keys)), float(len(c))
    ordered = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:top_n]
    out, cum = [], 0
    for i, (k, cnt) in enumerate(ordered, 1):
        cum += cnt
        out.append(
            (i, k, cnt, cnt / n_rows, cnt * n_keys / n_rows, cum / n_rows)
        )
    return out


def _got(df):
    return [
        (r["rank"], r["key"], r["cnt"], r["share"], r["x_mean"], r["cum_share"])
        for r in df.orderBy("rank").collect()
    ]


def test_skew_profile_matches_python(spark):
    keys = (["hot"] * 50 + ["warm"] * 20 + [f"k{i}" for i in range(30)]) * 2
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    got = _got(key_skew_profile(df, "k", top_n=5))
    want = _want(keys, 5)
    for g, w in zip(got, want):
        assert g[:3] == w[:3]
        for gi, wi in zip(g[3:], w[3:]):
            assert gi == pytest.approx(wi, abs=1e-12)
    assert len(got) == 5


def test_skew_profile_composite_null_and_ties(spark):
    rows = [(1, "a"), (1, "a"), (1, None), (2, "a"), (2, "b"), (2, "b")]
    df = spark.createDataFrame(rows, "u long, t string")
    got = _got(key_skew_profile(df, ["u", "t"], top_n=10))
    # counts: 1\x1fa:2, 2\x1fb:2, 1\x1f:1, 2\x1fa:1 — ties broken by key asc
    assert [(g[0], g[1], g[2]) for g in got] == [
        (1, "1\x1fa", 2),
        (2, "2\x1fb", 2),
        (3, "1\x1f", 1),
        (4, "2\x1fa", 1),
    ]
    assert got[-1][5] == pytest.approx(1.0, abs=1e-12)


def test_skew_profile_cache_handoff_and_validation(spark):
    df = spark.createDataFrame([(i % 7,) for i in range(100)], "k long")
    ids_before = pinned_rdd_ids(spark)
    caches = []
    a = _got(key_skew_profile(df, "k", top_n=3, persisted_out=caches))
    assert len(caches) == 1
    for c in caches:
        c.unpersist()
    assert a == _got(key_skew_profile(df.repartition(13), "k", top_n=3))
    assert pinned_rdd_ids(spark) - ids_before == set()
    with pytest.raises(ValueError):
        key_skew_profile(df, "k", top_n=0)


# --------------------------------------------------------------------------
# profile_columns (one-pass data profiling)
# --------------------------------------------------------------------------


def test_profile_columns_stats(spark):
    from minimel_spark.operators.profile import profile_columns

    df = spark.createDataFrame(
        [
            (1, "aa", 2.5),
            (2, None, -10.0),
            (3, "bbbb", 2.5),
            (None, "aa", None),
        ],
        "k long, s string, v double",
    )
    got = {r["column"]: r.asDict() for r in profile_columns(df).collect()}
    assert set(got) == {"k", "s", "v"}
    assert got["k"]["n_rows"] == 4 and got["k"]["n_null"] == 1
    assert got["k"]["n_distinct"] == 3
    assert got["k"]["min_value"] == "1" and got["k"]["max_value"] == "3"
    assert got["k"]["avg_len"] is None  # non-string
    assert got["s"]["n_null"] == 1 and got["s"]["n_distinct"] == 2
    assert got["s"]["avg_len"] == pytest.approx((2 + 4 + 2) / 3)
    # numeric min/max are NATIVE-typed, not lexicographic
    assert got["v"]["min_value"] == "-10.0" and got["v"]["max_value"] == "2.5"


def test_profile_columns_one_pass_and_guards(spark):
    from minimel_spark.operators.profile import profile_columns

    df = spark.createDataFrame([(1, "x")], "a long, b string")
    out = profile_columns(df, ["a"])
    assert [r["column"] for r in out.collect()] == ["a"]
    # single aggregation job: the plan has no join and scans once
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    with pytest.raises(ValueError):
        profile_columns(df, [])
    with pytest.raises(ValueError):
        profile_columns(df, ["missing"])


def test_distribution_drift_hand_example(spark):
    import math

    from minimel_spark.operators.diagnostics import distribution_drift

    # reference range [0, 10], 2 bins of width 5
    ref = spark.createDataFrame(
        [(0.0,), (2.0,), (4.0,), (10.0,)], "v double"
    )  # bins: 0,0,0,1 -> q = (3/4, 1/4)
    cur = spark.createDataFrame(
        [(-5.0,), (1.0,), (6.0,), (7.0,), (12.0,)], "v double"
    )  # -5 clamps to bin 0, 12 clamps to bin 1 -> p = (2/5, 3/5)
    rows = {r["bin"]: r for r in distribution_drift(cur, ref, "v", n_bins=2).collect()}
    assert rows[0]["n_cur"] == 2 and rows[0]["n_ref"] == 3
    assert rows[1]["n_cur"] == 3 and rows[1]["n_ref"] == 1
    assert rows[0]["lo"] == pytest.approx(0.0) and rows[0]["hi"] == pytest.approx(5.0)
    psi = (0.4 - 0.75) * math.log(0.4 / 0.75) + (0.6 - 0.25) * math.log(0.6 / 0.25)
    assert rows[0]["psi"] == pytest.approx(psi)
    assert rows[1]["psi"] == pytest.approx(psi)
    assert rows[0]["psi_term"] + rows[1]["psi_term"] == pytest.approx(psi)


def test_distribution_drift_identical_empty_bin_and_degenerate(spark):
    from minimel_spark.operators.diagnostics import distribution_drift

    d = spark.createDataFrame([(1.0,), (2.0,), (3.0,)], "v double")
    rows = distribution_drift(d, d, "v", n_bins=4).collect()
    assert len(rows) == 4  # every bin emitted, occupied or not
    assert all(r["psi"] == pytest.approx(0.0, abs=1e-12) for r in rows)
    # empty bins on both sides floor to eps -> zero term, not NaN
    assert all(r["psi_term"] == pytest.approx(0.0, abs=1e-12) for r in rows)
    # degenerate reference (min == max): everything lands in bin 0
    one = spark.createDataFrame([(5.0,), (5.0,)], "v double")
    rows = {r["bin"]: r for r in distribution_drift(d, one, "v", n_bins=3).collect()}
    assert rows[0]["n_cur"] == 3 and rows[0]["n_ref"] == 2
    assert rows[1]["n_cur"] == 0
    with pytest.raises(ValueError, match="n_bins"):
        distribution_drift(d, d, "v", n_bins=0)


def test_distribution_drift_empty_reference_yields_null_psi(spark):
    from minimel_spark.operators.diagnostics import distribution_drift

    cur = spark.createDataFrame([(1.0,), (2.0,)], "v double")
    empty = spark.createDataFrame([(None,)], "v double")
    rows = distribution_drift(cur, empty, "v", n_bins=3).collect()
    assert len(rows) == 3
    for r in rows:
        assert r["psi"] is None and r["psi_term"] is None and r["p_ref"] is None
    # and symmetrically: an empty current side must not fabricate drift
    rows = distribution_drift(empty, cur, "v", n_bins=3).collect()
    for r in rows:
        assert r["psi"] is None and r["p_cur"] is None


def test_powerlaw_alpha_known_value(spark):
    import math

    from minimel_spark.operators.diagnostics import powerlaw_alpha

    counts = spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 4), ("d", 8)], "k string, cnt long"
    )
    row = powerlaw_alpha(counts, xmin=2).collect()[0]
    assert row["n_values"] == 3  # the count-1 key is below xmin
    lsum = sum(math.log(x / 1.5) for x in (2, 4, 8))
    assert abs(row["alpha"] - (1 + 3 / lsum)) < 1e-12
    assert abs(row["se"] - (3 / lsum) / math.sqrt(3)) < 1e-12


def test_powerlaw_alpha_guards(spark):
    import pytest as _pytest

    from minimel_spark.operators.diagnostics import powerlaw_alpha

    counts = spark.createDataFrame([("a", 1)], "k string, cnt long")
    with _pytest.raises(ValueError):
        powerlaw_alpha(counts, xmin=0)
    with _pytest.raises(ValueError, match="no frequencies"):
        powerlaw_alpha(counts, xmin=5)


def test_benford_audit_detects_benford_and_uniform(spark):
    import math

    from minimel_spark.operators.diagnostics import BENFORD_P, benford_audit

    # constants pinned against the defining formula
    for d, p in BENFORD_P.items():
        assert abs(p - math.log10(1 + 1 / d)) < 1e-12
    # hand-check the mechanics on a tiny exact case: 9 values,
    # one per digit -> n=1 each, expected_n = p*9
    exact = spark.createDataFrame(
        [(d * 100 + 7,) for d in range(1, 10)], "v long"
    )
    rows = {r["digit"]: r for r in benford_audit(exact, "v").collect()}
    assert set(rows) == set(range(1, 10))
    for d in range(1, 10):
        assert rows[d]["n"] == 1
        assert abs(rows[d]["expected_n"] - BENFORD_P[d] * 9) < 1e-9
        en = BENFORD_P[d] * 9
        assert abs(rows[d]["chi2_component"] - (1 - en) ** 2 / en) < 1e-9


def test_benford_audit_excludes_nonpositive_and_zero_fills(spark):
    from minimel_spark.operators.diagnostics import benford_audit

    df = spark.createDataFrame(
        [(100,), (150,), (-200,), (0,)], "v long"
    )
    rows = {r["digit"]: r for r in benford_audit(df, "v").collect()}
    # only the two positive values count, both leading digit 1
    assert rows[1]["n"] == 2
    # all nine digits emit a row even when unobserved
    assert set(rows) == set(range(1, 10))
    assert rows[9]["n"] == 0 and rows[9]["chi2_component"] > 0


def test_k_anonymity_audit_hand_case(spark):
    import pytest as _pytest

    from minimel_spark.operators.profile import k_anonymity_audit

    rows = [
        # class (a, x): 3 rows, 2 distinct sensitive
        ("a", "x", 1), ("a", "x", 1), ("a", "x", 2),
        # class (a, y): 1 row -> k fails
        ("a", "y", 9),
        # class (None, x): NULL quasi is its own class, 2 rows 1 sensitive
        (None, "x", 5), (None, "x", 5),
    ]
    df = spark.createDataFrame(rows, "q1 string, q2 string, s long")
    got = {
        (r["q1"], r["q2"]): (r["class_size"], r["n_sensitive"], r["k_ok"], r["l_ok"])
        for r in k_anonymity_audit(df, ["q1", "q2"], "s", k=2, l_div=2).collect()
    }
    assert got[("a", "x")] == (3, 2, True, True)
    assert got[("a", "y")] == (1, 1, False, False)
    assert got[(None, "x")] == (2, 1, True, False)
    with _pytest.raises(ValueError):
        k_anonymity_audit(df, [], "s")
    with _pytest.raises(ValueError):
        k_anonymity_audit(df, ["q1"], "s", k=0)


def test_t_closeness_hand_distributions(spark):
    from minimel_spark.operators.profile import t_closeness_audit

    # global: 6 zeros + 6 ones -> q = (.5, .5); class A all-zero -> cum
    # diff at rank1 = |1.0-0.5| = 0.5, m-1 = 1 -> EMD 0.5; class B mirrors
    # the global distribution -> EMD 0; class C all-one -> 0.5.
    rows = (
        [("A", 0)] * 4
        + [("B", 0), ("B", 0), ("B", 1), ("B", 1)]
        + [("C", 1)] * 4
    )
    df = spark.createDataFrame(rows, "grp string, v long")
    got = {r["grp"]: (r["class_size"], r["emd"], r["t_ok"])
           for r in t_closeness_audit(df, ["grp"], "v", t=0.2).collect()}
    assert got["A"] == (4, 0.5, False)
    assert got["B"] == (4, 0.0, True)
    assert got["C"] == (4, 0.5, False)


def test_t_closeness_ordered_emd_three_values(spark):
    from minimel_spark.operators.profile import t_closeness_audit

    # global over {0,1,2}: counts (2,2,2) -> q=(1/3,1/3,1/3).
    # class A = {0,0}: p=(1,0,0); cum diffs: 2/3, 1/3 -> EMD = (2/3+1/3)/2 = 1/2
    # class B = {1,1}: p=(0,1,0); cum diffs: -1/3, 1/3 -> EMD = (1/3+1/3)/2 = 1/3
    # class C = {2,2}: symmetric to A -> 1/2 (ordered distance matters: B is
    # closer to uniform than the extremes, which plain TV distance misses)
    rows = [("A", 0), ("A", 0), ("B", 1), ("B", 1), ("C", 2), ("C", 2)]
    df = spark.createDataFrame(rows, "grp string, v long")
    got = {r["grp"]: r["emd"] for r in t_closeness_audit(df, ["grp"], "v").collect()}
    assert got["A"] == 0.5
    assert got["B"] == round(1 / 3, 6)
    assert got["C"] == 0.5


def test_t_closeness_single_value_domain_and_validation(spark):
    import pytest as _pt

    from minimel_spark.operators.profile import t_closeness_audit

    df = spark.createDataFrame([("A", 7), ("B", 7)], "grp string, v long")
    got = {r["grp"]: (r["emd"], r["t_ok"])
           for r in t_closeness_audit(df, ["grp"], "v").collect()}
    assert got == {"A": (0.0, True), "B": (0.0, True)}
    with _pt.raises(ValueError, match="quasi_cols"):
        t_closeness_audit(df, [], "v")
    with _pt.raises(ValueError, match="t must"):
        t_closeness_audit(df, ["grp"], "v", t=1.5)


def test_t_closeness_partition_invariant(spark):
    from minimel_spark.operators.profile import t_closeness_audit

    rows = [(f"g{i % 5}", (i * 7 + 3) % 4) for i in range(200)]
    df = spark.createDataFrame(rows, "grp string, v long")
    a = sorted(map(tuple, t_closeness_audit(df.coalesce(1), ["grp"], "v").collect()))
    b = sorted(map(tuple, t_closeness_audit(df.repartition(16), ["grp"], "v").collect()))
    assert a == b and len(a) == 5


def test_bootstrap_mean_ci_matches_python(spark):
    import hashlib

    import pytest as _pt

    from minimel_spark.operators.diagnostics import bootstrap_mean_ci

    vals = [(i, (i * 7) % 23 + 1) for i in range(40)]
    df = spark.createDataFrame(vals, "rid long, v long")
    B = 50
    r = bootstrap_mean_ci(df, "v", "rid", n_boot=B).collect()[0]
    # python replay
    ordered = [v for _, v in sorted(vals, key=lambda t: (t[1], t[0]))]
    n = len(ordered)

    def draw(b, i):
        return int(hashlib.md5(f"bs:{b}:{i}".encode()).hexdigest()[:15], 16) % n

    means = sorted(
        (sum(ordered[draw(b, i)] for i in range(n)) / n, b) for b in range(B)
    )
    k = B * 25 // 1000
    want_lo, want_hi = means[k][0], means[B - k - 1][0]
    assert r["n"] == n and r["n_boot"] == B
    assert abs(r["mean"] - sum(v for _, v in vals) / n) < 1e-12
    assert abs(r["ci_lo"] - want_lo) < 1e-12
    assert abs(r["ci_hi"] - want_hi) < 1e-12
    assert r["ci_lo"] <= r["mean"] <= r["ci_hi"]
    a = sorted(map(tuple, bootstrap_mean_ci(df.coalesce(1), "v", "rid", n_boot=20).collect()))
    b2 = sorted(map(tuple, bootstrap_mean_ci(df.repartition(8), "v", "rid", n_boot=20).collect()))
    assert a == b2
    with _pt.raises(ValueError):
        bootstrap_mean_ci(df, "v", "rid", n_boot=1)
    with _pt.raises(ValueError):
        bootstrap_mean_ci(df, "v", "rid", alpha_num=500)


def test_rank_sum_drift_matches_scipy_formula(spark):
    from minimel_spark.operators.diagnostics import rank_sum_drift

    # hand-checkable: A = [1,2,2,5], B = [2,3,3]
    a = spark.createDataFrame([(v,) for v in [1, 2, 2, 5]], "x long")
    b = spark.createDataFrame([(v,) for v in [2, 3, 3]], "x long")
    r = rank_sum_drift(a, b, "x").collect()[0]
    # U = #(a>b) + 0.5 #(a==b): pairs a>b: 5>2,5>3,5>3 = 3; ties: 2==2 x2 -> 1
    assert (r["n_a"], r["n_b"], r["u2"]) == (4, 3, 2 * 3 + 2)
    # python z replay
    n_a, n_b, u = 4, 3, (2 * 3 + 2) / 2.0
    n = n_a + n_b
    pooled = [1, 2, 2, 5, 2, 3, 3]
    from collections import Counter

    tcorr = sum(t**3 - t for t in Counter(pooled).values())
    var = n_a * n_b / 12.0 * ((n + 1) - tcorr / (n * (n - 1)))
    z = (u - n_a * n_b / 2.0) / var**0.5
    assert abs(r["z"] - z) < 1e-9
    # symmetric shift: identical samples -> u2 = n_a*n_b (all ties at 0.5), z = 0
    s = spark.createDataFrame([(v,) for v in [7, 7, 9]], "x long")
    r2 = rank_sum_drift(s, s, "x").collect()[0]
    assert r2["u2"] == 3 * 3  # identical samples: U = nA·nB/2 exactly
    assert abs(r2["z"]) < 1e-12
    # stochastically larger side -> positive z
    hi = spark.createDataFrame([(v,) for v in [10, 11, 12]], "x long")
    lo = spark.createDataFrame([(v,) for v in [1, 2, 3]], "x long")
    # max possible z at n=3 vs 3 (complete separation): U = 9, z ≈ 1.964
    assert rank_sum_drift(hi, lo, "x").collect()[0]["z"] > 1.9
    x = sorted(map(tuple, rank_sum_drift(a.coalesce(1), b.coalesce(1), "x").collect()))
    y = sorted(map(tuple, rank_sum_drift(a.repartition(8), b.repartition(4), "x").collect()))
    assert x == y
