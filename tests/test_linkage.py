"""Fellegi-Sunter linkage tests: pattern binarization, EM parity with a
pure-Python reference, posterior separation on planted data, broadcast
scoring join, determinism, guards."""

import math

import pyspark.sql.functions as F
import pytest

from minimel_spark.operators.linkage import (
    _em,
    comparison_patterns,
    fellegi_sunter_em,
    fs_score_pairs,
)


def _feats(spark, rows):
    return spark.createDataFrame(rows, "a double, b double")


THR = {"a": 0.5, "b": 0.5}


def test_comparison_patterns_bits_and_nulls(spark):
    df = _feats(spark, [(0.9, 0.9), (0.9, 0.1), (0.1, 0.9), (0.1, 0.1), (None, 0.9)])
    got = [
        (r["g_a"], r["g_b"], r["pattern"])
        for r in comparison_patterns(df, THR).collect()
    ]
    # bit 0 = 'a' (sorted order), bit 1 = 'b'; NULL counts as disagreement
    assert sorted(got) == sorted(
        [(1, 1, 3), (1, 0, 1), (0, 1, 2), (0, 0, 0), (0, 1, 2)]
    )


def _planted(n_match=60, n_unmatch=240):
    """Matches mostly agree on both features, unmatches mostly on neither."""
    rows = []
    for i in range(n_match):
        rows.append((0.9 if i % 10 else 0.1, 0.9 if i % 8 else 0.1))
    for i in range(n_unmatch):
        rows.append((0.1 if i % 12 else 0.9, 0.1 if i % 9 else 0.9))
    return rows


def test_em_separates_planted_mixture(spark):
    df = _feats(spark, _planted())
    params = {
        r["pattern"]: (r["n_pairs"], r["p_match"], r["log2_bf"])
        for r in fellegi_sunter_em(df, THR, n_iter=20).collect()
    }
    assert set(params) == {0, 1, 2, 3}
    # both-agree pattern must be confidently match, both-disagree confidently not
    assert params[3][1] > 0.9
    assert params[0][1] < 0.1
    # log2 Bayes factor is monotone in p_match
    ordered = sorted(params.values(), key=lambda t: t[1])
    assert [x[2] for x in ordered] == sorted(x[2] for x in ordered)
    # pattern counts are exact
    assert sum(v[0] for v in params.values()) == 300


def test_em_matches_python_reference(spark):
    rows = _planted(40, 160)
    df = _feats(spark, rows)
    got = {
        r["pattern"]: (r["p_match"], r["log2_bf"])
        for r in fellegi_sunter_em(df, THR, n_iter=3).collect()
    }
    # independent reference: count patterns in python, run the same _em
    counts = {}
    for a, b in rows:
        p = (1 if a >= 0.5 else 0) | ((1 if b >= 0.5 else 0) << 1)
        counts[p] = counts.get(p, 0) + 1
    lam, m, u = _em(counts, 2, 3, 0.5, 0.9, 0.1)
    for p, n in counts.items():
        w, v, bf = lam, 1.0 - lam, 0.0
        for i in range(2):
            g = (p >> i) & 1
            mi = m[i] if g else 1.0 - m[i]
            ui = u[i] if g else 1.0 - u[i]
            w, v = w * mi, v * ui
            bf += math.log2(mi / ui)
        assert got[p][0] == pytest.approx(w / (w + v), abs=1e-12)
        assert got[p][1] == pytest.approx(bf, abs=1e-9)


def test_em_partitioning_invariant(spark):
    rows = _planted()
    a = sorted(
        tuple(r) for r in fellegi_sunter_em(_feats(spark, rows), THR, 5).collect()
    )
    b = sorted(
        tuple(r)
        for r in fellegi_sunter_em(
            _feats(spark, rows).repartition(17), THR, 5
        ).collect()
    )
    assert a == b


def test_fs_score_pairs_broadcast_join(spark):
    df = _feats(spark, _planted())
    out = fs_score_pairs(df, THR, n_iter=3)
    rows = out.collect()
    assert len(rows) == 300
    assert {"pattern", "p_match", "log2_bf", "g_a", "g_b"} <= set(out.columns)
    # the params join must be a broadcast (pattern table <= 2^f rows)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan
    # per-row posterior equals its pattern's posterior
    by_pat = {}
    for r in rows:
        by_pat.setdefault(r["pattern"], set()).add(r["p_match"])
    assert all(len(v) == 1 for v in by_pat.values())


def test_em_clamps_degenerate_features(spark):
    # feature 'b' always agrees -> u_b would hit 1 without the clamp
    df = _feats(spark, [(0.9, 0.9)] * 5 + [(0.1, 0.9)] * 5)
    rows = fellegi_sunter_em(df, THR, n_iter=10).collect()
    for r in rows:
        assert 0.0 < r["p_match"] < 1.0
        assert math.isfinite(r["log2_bf"])


def test_linkage_guards(spark):
    df = _feats(spark, [(0.9, 0.9)])
    with pytest.raises(ValueError):
        comparison_patterns(df, {})
    with pytest.raises(ValueError):
        comparison_patterns(df, {f"c{i}": 0.5 for i in range(17)})
    with pytest.raises(ValueError):
        fellegi_sunter_em(df, THR, n_iter=0)
    with pytest.raises(ValueError):
        fellegi_sunter_em(df.where(F.lit(False)), THR)


# --------------------------------------------------------------------------
# group linkage
# --------------------------------------------------------------------------

from minimel_spark.operators.linkage import group_linkage


def _gl_inputs(spark, pairs, assigns):
    scored = spark.createDataFrame(
        pairs, "rec_id_a string, rec_id_b string, score double"
    )
    asg = spark.createDataFrame(assigns, "rec_id string, group_id string")
    return scored, asg


def test_group_linkage_reciprocal_matching_and_sim(spark):
    # G1 = {a1, a2}, G2 = {b1, b2, b3}; one pair arrives reversed, one
    # intra-group pair and one below-threshold pair must be ignored
    scored, asg = _gl_inputs(
        spark,
        [
            ("a1", "b1", 0.9),
            ("b2", "a1", 0.8),  # reversed orientation
            ("a2", "b2", 0.85),
            ("a2", "b3", 0.2),  # below threshold
            ("a1", "a2", 0.99),  # intra-group
        ],
        [("a1", "G1"), ("a2", "G1"), ("b1", "G2"), ("b2", "G2"), ("b3", "G2")],
    )
    rows = group_linkage(scored, asg, threshold=0.5).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["group_a"], r["group_b"]) == ("G1", "G2")
    # reciprocal best: (a1,b1) at 0.9 and (a2,b2) at 0.85; (a1,b2) loses
    # both argmaxes. sim = (0.9+0.85) / (2 + 3 - 2)
    assert r["n_matched"] == 2
    assert r["sim"] == pytest.approx((0.9 + 0.85) / 3, abs=1e-12)


def test_group_linkage_tie_breaks_to_smallest_partner(spark):
    # x1 ties between y1 and y2 -> deterministic partner y1; y2 stays
    # unmatched (its best is x1 but x1's best is y1)
    scored, asg = _gl_inputs(
        spark,
        [("x1", "y1", 0.7), ("x1", "y2", 0.7)],
        [("x1", "GX"), ("y1", "GY"), ("y2", "GY")],
    )
    rows = group_linkage(scored, asg, threshold=0.5).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_matched"] == 1
    assert r["sim"] == pytest.approx(0.7 / (1 + 2 - 1), abs=1e-12)


def test_group_linkage_multiple_group_pairs_and_no_edge_groups(spark):
    # three groups; GZ has no above-threshold cross edge -> no row for it
    scored, asg = _gl_inputs(
        spark,
        [("a1", "b1", 0.9), ("a1", "c1", 0.6), ("b1", "c1", 0.3)],
        [("a1", "GA"), ("b1", "GB"), ("c1", "GC"), ("c2", "GC")],
    )
    got = {
        (r["group_a"], r["group_b"]): (r["n_matched"], r["sim"])
        for r in group_linkage(scored, asg, threshold=0.5).collect()
    }
    assert set(got) == {("GA", "GB"), ("GA", "GC")}
    assert got[("GA", "GB")][0] == 1
    assert got[("GA", "GB")][1] == pytest.approx(0.9 / (1 + 1 - 1), abs=1e-12)
    # GC has 2 members (c2 never scored) -> denominator 1 + 2 - 1
    assert got[("GA", "GC")][1] == pytest.approx(0.6 / 2, abs=1e-12)


def test_group_linkage_partitioning_invariant(spark):
    pairs = [
        (f"a{i}", f"b{j}", 0.5 + 0.01 * ((i * 7 + j) % 40))
        for i in range(12)
        for j in range(12)
    ]
    assigns = [(f"a{i}", f"G{i % 3}") for i in range(12)] + [
        (f"b{j}", f"H{j % 4}") for j in range(12)
    ]
    scored, asg = _gl_inputs(spark, pairs, assigns)
    one = sorted(tuple(r) for r in group_linkage(scored, asg, 0.6).collect())
    other = sorted(
        tuple(r)
        for r in group_linkage(
            scored.repartition(13), asg.repartition(7), 0.6
        ).collect()
    )
    assert one == other and len(one) > 0


def _tf_world(spark):
    # values: "smith" x3, "jones" x2, "zu" x1, one NULL record
    recs = spark.createDataFrame(
        [
            (1, "smith"), (2, "smith"), (3, "smith"),
            (4, "jones"), (5, "jones"), (6, "zu"), (7, None),
        ],
        "rec_id long, surname string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (4, 5), (1, 4), (6, 7), (3, 6)],
        "rec_id_a long, rec_id_b long",
    )
    return recs, pairs


def test_tf_adjusted_exact_weight_values(spark):
    from minimel_spark.operators.linkage import tf_adjusted_exact_weight

    recs, pairs = _tf_world(spark)
    out = {
        (r["rec_id_a"], r["rec_id_b"]): r
        for r in tf_adjusted_exact_weight(
            pairs, recs, "surname", m_exact=0.95
        ).collect()
    }
    # N = 6 non-null; tf(smith)=3/6, tf(jones)=2/6; ubar = (9+4+1)/36
    ubar = 14 / 36
    assert out[(1, 2)]["agree"] and out[(1, 2)]["tf"] == pytest.approx(0.5)
    assert out[(1, 2)]["tf_weight"] == pytest.approx(math.log2(0.95 / 0.5))
    assert out[(4, 5)]["tf_weight"] == pytest.approx(math.log2(0.95 / (2 / 6)))
    # agreeing on the rarer value is worth strictly more evidence
    assert out[(4, 5)]["tf_weight"] > out[(1, 2)]["tf_weight"]
    # disagreement pays the global chance-agreement rate
    assert not out[(1, 4)]["agree"]
    assert out[(1, 4)]["tf"] is None
    assert out[(1, 4)]["tf_weight"] == pytest.approx(
        math.log2(0.05 / (1 - ubar))
    )
    # NULL never agrees, and still gets the disagreement weight
    assert not out[(6, 7)]["agree"]
    assert out[(6, 7)]["tf_weight"] == pytest.approx(
        math.log2(0.05 / (1 - ubar))
    )
    assert not out[(3, 6)]["agree"]


def test_tf_adjusted_exact_weight_degenerate_and_guard(spark):
    from minimel_spark.operators.linkage import tf_adjusted_exact_weight

    # every record shares one value: agree branch still finite
    # (log2(m / 1) = log2 m), disagreement is impossible -> NULL weight
    recs = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "x")], "rec_id long, surname string"
    )
    pairs = spark.createDataFrame([(1, 2)], "rec_id_a long, rec_id_b long")
    row = tf_adjusted_exact_weight(pairs, recs, "surname").collect()[0]
    assert row["agree"] and row["tf_weight"] == pytest.approx(math.log2(0.95))
    with pytest.raises(ValueError, match="m_exact"):
        tf_adjusted_exact_weight(pairs, recs, "surname", m_exact=1.0)


def test_tf_adjusted_exact_weight_keeps_unmatched_pairs(spark):
    from minimel_spark.operators.linkage import tf_adjusted_exact_weight

    recs, _ = _tf_world(spark)
    pairs = spark.createDataFrame(
        [(1, 99), (98, 99)], "rec_id_a long, rec_id_b long"
    )  # 98/99 have no records row
    out = {
        (r["rec_id_a"], r["rec_id_b"]): r
        for r in tf_adjusted_exact_weight(pairs, recs, "surname").collect()
    }
    assert set(out) == {(1, 99), (98, 99)}  # every input pair survives
    ubar = 14 / 36
    for k in out:
        assert not out[k]["agree"]
        assert out[k]["tf"] is None
        assert out[k]["tf_weight"] == pytest.approx(math.log2(0.05 / (1 - ubar)))


def test_fs_waterfall_sums_to_em_weight(spark):
    from minimel_spark.operators.linkage import fs_waterfall

    df = _feats(spark, _planted())
    em = {
        r["pattern"]: r["log2_bf"]
        for r in fellegi_sunter_em(df, THR, n_iter=20).collect()
    }
    rows = fs_waterfall(df, THR, n_iter=20).collect()
    # one row per (pattern, feature); agree bits decode the pattern
    per = {}
    for r in rows:
        per.setdefault(r["pattern"], []).append(r)
        bit = {"a": 0, "b": 1}[r["feature"]]
        assert r["agree"] == bool((r["pattern"] >> bit) & 1)
        assert r["log2_bf"] == pytest.approx(em[r["pattern"]])
    assert set(per) == set(em)
    for p, rs in per.items():
        assert len(rs) == 2
        assert sum(r["contribution"] for r in rs) == pytest.approx(em[p])
    # agreement contributes positive evidence, disagreement negative
    # (on this well-separated planted mixture)
    for r in rows:
        assert (r["contribution"] > 0) == r["agree"]


def test_match_passes_first_match_wins(spark):
    from minimel_spark.operators.linkage import match_passes

    pairs = spark.createDataFrame(
        [
            (1, 2, "x", "x", 5, 5),   # matches rule 1 AND rule 2 -> rule 1
            (1, 3, "x", "y", 5, 5),   # only rule 2
            (1, 4, "x", "y", 5, 9),   # nothing
        ],
        "id_a long, id_b long, ta string, tb string, sa int, sb int",
    )
    rules = [
        ("exact_type", "ta = tb"),
        ("same_size", "sa = sb"),
    ]
    rows = {
        (r["id_a"], r["id_b"]): r for r in match_passes(pairs, rules).collect()
    }
    assert rows[(1, 2)]["pass_idx"] == 1
    assert rows[(1, 2)]["matched_rule"] == "exact_type"
    assert rows[(1, 3)]["pass_idx"] == 2
    assert rows[(1, 3)]["matched_rule"] == "same_size"
    assert rows[(1, 4)]["pass_idx"] is None
    assert rows[(1, 4)]["matched_rule"] is None


def test_match_passes_guards(spark):
    import pytest as _pytest

    from minimel_spark.operators.linkage import match_passes

    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    with _pytest.raises(ValueError):
        match_passes(pairs, [])
    with _pytest.raises(ValueError):
        match_passes(pairs, [("r", "id_a = id_b"), ("r", "id_a < id_b")])
    # Column conditions work too
    import pyspark.sql.functions as F

    out = match_passes(pairs, [("lt", F.col("id_a") < F.col("id_b"))]).collect()
    assert out[0]["matched_rule"] == "lt"


def test_estimate_u_constant_and_distinct_features(spark):
    from minimel_spark.operators.linkage import estimate_u

    recs = spark.createDataFrame(
        [(i, "same", i, None) for i in range(1, 101)],
        "rec_id long, konst string, uniq long, missing string",
    )
    rows = {
        r["feature"]: r
        for r in estimate_u(
            recs,
            [("konst", "konst"), ("uniq", "uniq"), ("missing", "missing")],
            n_buckets=16,
        ).collect()
    }
    n = rows["konst"]["n_pairs"]
    assert 0 < n <= 50
    # constant feature always agrees, distinct never, NULL never
    assert rows["konst"]["n_agree"] == n and rows["konst"]["u"] == 1.0
    assert rows["uniq"]["n_agree"] == 0 and rows["uniq"]["u"] == 0.0
    assert rows["missing"]["n_agree"] == 0 and rows["missing"]["u"] == 0.0
    # all features see the SAME pairing
    assert rows["uniq"]["n_pairs"] == n and rows["missing"]["n_pairs"] == n


def test_estimate_u_deterministic_and_guards(spark):
    import pytest as _pytest

    from minimel_spark.operators.linkage import estimate_u

    recs = spark.createDataFrame(
        [(i, i % 7) for i in range(1, 201)], "rec_id long, band long"
    )
    a = sorted(map(tuple, estimate_u(recs, [("band", "band")]).collect()))
    b = sorted(map(tuple, estimate_u(recs, [("band", "band")]).collect()))
    assert a == b
    # a 7-value uniform feature should agree ~1/7 of the time
    u = a[0][3]
    assert 0.02 < u < 0.35
    with _pytest.raises(ValueError):
        estimate_u(recs, [])
    with _pytest.raises(ValueError):
        estimate_u(recs, [("x", "band"), ("x", "band")])
    with _pytest.raises(ValueError):
        estimate_u(recs, [("band", "band")], n_buckets=0)


def test_fs_fit_audit_invariants(spark):
    import math

    from minimel_spark.operators.linkage import fs_fit_audit

    # planted two-feature world: half clear matches, half clear non-matches
    rows = [(0.9, 0.85) for _ in range(40)] + [(0.1, 0.2) for _ in range(60)]
    rows += [(0.9, 0.2) for _ in range(5)]  # a correlated-breaking corner
    feats = spark.createDataFrame(rows, "s1 double, s2 double")
    out = fs_fit_audit(feats, {"s1": 0.5, "s2": 0.5}, n_iter=3).collect()
    n_total = sum(r["n_pairs"] for r in out)
    assert n_total == 105
    # expected counts sum to N across ALL cells (unobserved row included)
    assert abs(sum(r["expected"] for r in out) - 105.0) < 1e-6
    # chi2 constant column == recomputed from the rows themselves
    chi2 = out[0]["chi2"]
    recomputed = sum(
        (r["n_pairs"] - r["expected"]) ** 2 / r["expected"]
        for r in out
        if r["expected"] > 0
    )
    assert abs(chi2 - recomputed) < 1e-9
    assert all(abs(r["chi2"] - chi2) < 1e-12 for r in out)
    # residual sign matches over/under-prediction
    for r in out:
        if r["pattern"] >= 0 and r["expected"] > 0:
            expect_sign = (r["n_pairs"] - r["expected"]) / math.sqrt(r["expected"])
            assert abs(r["pearson_resid"] - expect_sign) < 1e-9
    # the unobserved-mass row is present (pattern 2 = s1 agrees alone is
    # observed here, so only check shape) and counts nothing observed
    unobs = [r for r in out if r["pattern"] == -1]
    for r in unobs:
        assert r["n_pairs"] == 0 and r["pearson_resid"] <= 0


def test_name_order_audit_flags_flips(spark):
    from minimel_spark.operators.linkage import name_order_audit

    rows = (
        [(i, "john smith") for i in range(10)]
        + [(100 + i, "mary smith") for i in range(8)]
        + [(200, "smith john")]          # the flip
        + [(300, "prince")]              # mononym passes through
        + [(400, "anne marie clark")]    # 3 tokens pass through
    )
    recs = spark.createDataFrame(rows, "rec_id long, name string")
    got = {r["rec_id"]: r for r in name_order_audit(recs).collect()}
    # corpus stats: john first1=10 second1=1; smith first=1 second=18;
    # flip support for "smith john" = first(john)*second(smith)=10*18=180
    # vs observed first(smith)*second(john)=1*1=1 -> flagged
    assert got[200]["swap_likely"] and got[200]["swap_support"] == 180
    assert got[200]["first_support"] == 1
    # consistent records are not flagged
    assert not got[0]["swap_likely"] and got[0]["first_support"] == 180
    assert got[300]["n_tokens"] == 1 and not got[300]["swap_likely"]
    assert got[400]["n_tokens"] == 3 and not got[400]["swap_likely"]
    assert len(got) == len(rows)


def test_name_order_audit_partition_invariant(spark):
    from minimel_spark.operators.linkage import name_order_audit

    recs = spark.createDataFrame(
        [(i, f"g{i % 5} f{i % 7}") for i in range(60)],
        "rec_id long, name string",
    )
    a = sorted(map(tuple, name_order_audit(recs.coalesce(1)).collect()))
    b = sorted(map(tuple, name_order_audit(recs.repartition(16)).collect()))
    assert a == b and len(a) == 60


def _py_iv(rows, features, n_bins=4):
    """rows: (id_a, id_b, label, {feature: value}) replay of feature_iv."""
    import math

    out = []
    for f in features:
        ordered = sorted(rows, key=lambda r: (r[3][f], r[0], r[1]))
        n = len(ordered)
        cells = {}
        for i, r in enumerate(ordered):
            b = (i * n_bins) // n
            p, g = cells.get(b, (0, 0))
            cells[b] = (p + (1 if r[2] == 1 else 0), g + (0 if r[2] == 1 else 1))
        pt = sum(p for p, _ in cells.values())
        nt = sum(g for _, g in cells.values())
        iv = 0.0
        woes = {}
        for b, (p, g) in cells.items():
            w = math.log(((p + 0.5) / pt) / ((g + 0.5) / nt))
            woes[b] = w
            iv += (p / pt - g / nt) * w
        for b in cells:
            p, g = cells[b]
            out.append((f, b, p, g, round(woes[b], 9), round(iv, 9)))
    return sorted(out)


def test_feature_iv_matches_python_replay(spark):
    import random

    from minimel_spark.operators.evaluate import feature_iv

    rng = random.Random(9)
    rows = []
    for i in range(80):
        label = 1 if i % 4 == 0 else 0
        # informative feature f1 (shifted by label), noise feature f2
        f1 = label * 2.0 + rng.random()
        f2 = rng.random()
        rows.append((i, i + 1000, label, {"f1": f1, "f2": f2}))
    df = spark.createDataFrame(
        [(a, b, l, d["f1"], d["f2"]) for a, b, l, d in rows],
        "id_a long, id_b long, label int, f1 double, f2 double",
    )
    got = sorted(
        (r["feature"], r["bin"], r["n_pos"], r["n_neg"], round(r["woe"], 9), round(r["iv"], 9))
        for r in feature_iv(df, ["f1", "f2"], n_bins=4).collect()
    )
    assert got == _py_iv(rows, ["f1", "f2"], n_bins=4)
    iv_by_f = {f: iv for f, _, _, _, _, iv in got}
    # the informative feature dominates the noise feature
    assert iv_by_f["f1"] > 1.0 > iv_by_f["f2"]


def test_feature_iv_single_class_and_validation(spark):
    import pytest as _pt

    from minimel_spark.operators.evaluate import feature_iv

    df = spark.createDataFrame(
        [(i, i + 100, 0, float(i)) for i in range(10)],
        "id_a long, id_b long, label int, f double",
    )
    rows = feature_iv(df, ["f"], n_bins=2).collect()
    assert all(r["woe"] == 0.0 and r["iv"] == 0.0 for r in rows)
    a = sorted(map(tuple, feature_iv(df.coalesce(1), ["f"], n_bins=3).collect()))
    b = sorted(map(tuple, feature_iv(df.repartition(8), ["f"], n_bins=3).collect()))
    assert a == b
    with _pt.raises(ValueError):
        feature_iv(df, ["f"], n_bins=1)
    with _pt.raises(ValueError):
        feature_iv(df, [])


def test_dup_completeness_matches_closed_forms(spark):
    from minimel_spark.operators.evaluate import dup_completeness

    # 10 singletons, 3 pairs, 1 triple: n=19, S=14, f1=10, f2=3
    rows = []
    cid = 0
    for _ in range(10):
        rows.append((len(rows), cid)); cid += 1
    for _ in range(3):
        rows += [(len(rows), cid), (len(rows) + 1, cid)]; cid += 1
    rows += [(len(rows), cid), (len(rows) + 1, cid), (len(rows) + 2, cid)]
    df = spark.createDataFrame(rows, "rec_id long, cluster_id long")
    r = dup_completeness(df).collect()[0]
    assert (r["n_records"], r["s_obs"], r["f1"], r["f2"]) == (19, 14, 10, 3)
    assert abs(r["chao1"] - (14 + 10 * 9 / (2.0 * 4))) < 1e-12
    assert abs(r["coverage"] - (1.0 - 10 / 19)) < 1e-12
    # no singletons: chao1 == s_obs (nothing projected), coverage 1
    df2 = spark.createDataFrame(
        [(i, i // 2) for i in range(8)], "rec_id long, cluster_id long"
    )
    r2 = dup_completeness(df2).collect()[0]
    assert r2["chao1"] == float(r2["s_obs"]) == 4.0 and r2["coverage"] == 1.0
    # f2 = 0 stays finite (bias-corrected form)
    df3 = spark.createDataFrame(
        [(0, 0), (1, 1), (2, 2)], "rec_id long, cluster_id long"
    )
    r3 = dup_completeness(df3).collect()[0]
    assert abs(r3["chao1"] - (3 + 3 * 2 / 2.0)) < 1e-12
    a = sorted(map(tuple, dup_completeness(df.coalesce(1)).collect()))
    b = sorted(map(tuple, dup_completeness(df.repartition(8)).collect()))
    assert a == b
