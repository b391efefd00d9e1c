"""Phonetic blocking, meta-blocking, cluster-quality metrics, transitive
fuzzy dedup — the round-5 ER-literature batch."""

import duckdb
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from minimel_spark.functions.phonetic import soundex_col, soundex_py, soundex_sql
from minimel_spark.operators.blocking import phonetic_blocks, token_blocks
from minimel_spark.operators.dedup import transitive_dedup_keep
from minimel_spark.operators.evaluate import cluster_quality, clustering_information
from minimel_spark.operators.metablocking import meta_blocking_pairs

from conftest import pinned_rdd_ids

KNOWN = {
    "Robert": "R163",
    "Rupert": "R163",
    "Ashcraft": "A261",
    "Ashcroft": "A261",
    "Tymczak": "T522",
    "Pfister": "P236",
    "Honeyman": "H555",
    "Jackson": "J250",
    "Washington": "W252",
    "Lee": "L000",
    "Gutierrez": "G362",
    "VanDeusen": "V532",
    "Wheeler": "W460",
    "Czarkowska": "C622",
    "": "",
    "42!?": "",
    "o'brien": "O165",
}

FUZZ = [
    "hw", "wh", "aeiouy", "BCDB", "xXzZ", "llama", "  spaced out  ",
    "MacDonald", "mcdonald", "Schmidt", "Schneider", "lloyd", "PFEIFFER",
    "café", "naïve", "Äpfel", "hhhh", "wwww", "a", "h", "w", "b2b",
    "smith-jones", "O’Hara", "ALLRICHT", "Eberhard", "Heimbach",
    "Hanselmann", "Hildebrand", "Casstevens", "Vandervoort", "Lukaschowsky",
    "McDonnell", "McGee", "Oppenheimer", "Riedemanas", "Zita", "Zitzmeinn",
]


def test_soundex_known_vectors():
    for name, want in KNOWN.items():
        assert soundex_py(name) == want, name


def test_soundex_spark_matches_python(spark):
    names = list(KNOWN) + FUZZ
    df = spark.createDataFrame([Row(name=n) for n in names])
    got = {
        r["name"]: r["sx"]
        for r in df.select("name", soundex_col("name").alias("sx")).collect()
    }
    for n in names:
        assert got[n] == soundex_py(n), n


def test_soundex_duckdb_matches_python():
    con = duckdb.connect()
    names = [n for n in list(KNOWN) + FUZZ]
    con.execute("CREATE TABLE t(name VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(n,) for n in names])
    expr = soundex_sql("u")
    rows = con.execute(
        "WITH c AS (SELECT name, upper(regexp_replace(name, '[^A-Za-z]', '', 'g')) AS u FROM t) "
        f"SELECT name, {expr} FROM c"
    ).fetchall()
    for name, sx in rows:
        assert sx == soundex_py(name), name


def test_phonetic_blocks_groups_variants(spark):
    df = spark.createDataFrame(
        [
            Row(rec_id=1, name="Ashcraft Holdings"),
            Row(rec_id=2, name="ashcroft holdings"),
            Row(rec_id=3, name="Tymczak"),
        ]
    )
    rows = phonetic_blocks(df).collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r["block_key"], set()).add(r["rec_id"])
    assert by_key["p:A261"] == {1, 2}
    assert by_key["p:H435"] == {1, 2}  # holdings
    assert by_key["p:T522"] == {3}


def test_token_blocks(spark):
    df = spark.createDataFrame(
        [Row(rec_id=1, name="Red Fox-42"), Row(rec_id=2, name="red red hen")]
    )
    rows = token_blocks(df).collect()
    got = {(r["block_key"], r["rec_id"]) for r in rows}
    assert got == {
        ("red", 1), ("fox", 1), ("42", 1), ("red", 2), ("hen", 2),
    }


def _mb_world(spark, with_stop: bool):
    rows = [
        ("b1", "r1"), ("b1", "r2"),
        ("b2", "r1"), ("b2", "r2"),
        ("b3", "r1"), ("b3", "r3"),
        ("b4", "r1"), ("b4", "r4"),
        ("b5", "r3"), ("b5", "r4"),
        ("b6", "r3"), ("b6", "r4"),
        ("lone", "r1"),  # singleton block: emits nothing
    ]
    if with_stop:
        rows += [("stop", r) for r in ("r1", "r2", "r3", "r4")]
    return spark.createDataFrame(rows, "block_key string, rec_id string")


def test_meta_blocking_wnp_prunes_weak_hub_edges(spark):
    before = pinned_rdd_ids(spark)
    caches: list = []
    out = meta_blocking_pairs(_mb_world(spark, False), persisted_out=caches)
    got = {(r["rec_id_a"], r["rec_id_b"]): r["weight"] for r in out.collect()}
    # edge weights: (r1,r2)=2 (r1,r3)=1 (r1,r4)=1 (r3,r4)=2
    # node means: r1=4/3, r2=2, r3=1.5, r4=1.5 -> hub r1's weak spokes prune
    assert got == {("r1", "r2"): 2.0, ("r3", "r4"): 2.0}
    for c in caches:
        c.unpersist()
    assert not (pinned_rdd_ids(spark) - before)


def test_meta_blocking_block_purging(spark):
    caches: list = []
    out = meta_blocking_pairs(
        _mb_world(spark, True), max_block_size=3, persisted_out=caches
    )
    got = {(r["rec_id_a"], r["rec_id_b"]): r["weight"] for r in out.collect()}
    # the 4-record stop block is purged -> identical to the no-stop world
    assert got == {("r1", "r2"): 2.0, ("r3", "r4"): 2.0}
    for c in caches:
        c.unpersist()


def test_meta_blocking_js_weighting(spark):
    caches: list = []
    out = meta_blocking_pairs(
        _mb_world(spark, False), weighting="js", persisted_out=caches
    )
    got = {(r["rec_id_a"], r["rec_id_b"]): r["weight"] for r in out.collect()}
    # retained-block counts: r1 in {b1,b2,b3,b4}=4, r2 in 2, r3 in 3, r4 in 3
    # js(r1,r2)=2/(4+2-2)=0.5 js(r1,r3)=1/6 js(r1,r4)=1/6 js(r3,r4)=2/4=0.5
    # means: r1=(0.5+1/6+1/6)/3=5/18, r2=0.5, r3=(1/6+0.5)/2=1/3, r4=1/3
    assert set(got) == {("r1", "r2"), ("r3", "r4")}
    assert got[("r1", "r2")] == pytest.approx(0.5)
    for c in caches:
        c.unpersist()


def test_meta_blocking_rejects_unknown_weighting(spark):
    with pytest.raises(ValueError, match="weighting"):
        meta_blocking_pairs(_mb_world(spark, False), weighting="arcs")


def test_cluster_quality_hand_example(spark):
    # pred {1,2,3},{4,5},{6}; gold {1,2},{3,4,5},{6}
    pred = spark.createDataFrame(
        [(i, c) for i, c in [(1, "a"), (2, "a"), (3, "a"), (4, "b"), (5, "b"), (6, "c")]],
        "rec_id long, cluster_id string",
    )
    gold = spark.createDataFrame(
        [(i, c) for i, c in [(1, "x"), (2, "x"), (3, "y"), (4, "y"), (5, "y"), (6, "z")]],
        "rec_id long, cluster_id string",
    )
    row = cluster_quality(pred, gold).first()
    assert row["n_records"] == 6
    assert row["bcubed_p"] == pytest.approx(7 / 9)
    assert row["bcubed_r"] == pytest.approx(7 / 9)
    assert row["bcubed_f1"] == pytest.approx(7 / 9)
    # idx=2 a=4 b=4 tot=15 -> ari = (2 - 16/15) / (4 - 16/15)
    assert row["ari"] == pytest.approx((2 - 16 / 15) / (4 - 16 / 15))


def test_cluster_quality_identical_and_degenerate(spark):
    pred = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "rec_id long, cluster_id string"
    )
    row = cluster_quality(pred, pred).first()
    assert row["bcubed_f1"] == pytest.approx(1.0)
    assert row["ari"] == pytest.approx(1.0)
    # all-singletons vs all-singletons: max == exp == idx -> defined as 1.0
    singles = spark.createDataFrame(
        [(1, "s1"), (2, "s2"), (3, "s3")], "rec_id long, cluster_id string"
    )
    row = cluster_quality(singles, singles).first()
    assert row["ari"] == pytest.approx(1.0)
    assert row["bcubed_f1"] == pytest.approx(1.0)


def test_clustering_information_hand_example(spark):
    import math

    # pred {1,2,3},{4,5},{6}; gold {1,2},{3,4,5},{6}
    pred = spark.createDataFrame(
        [(i, c) for i, c in [(1, "a"), (2, "a"), (3, "a"), (4, "b"), (5, "b"), (6, "c")]],
        "rec_id long, cluster_id string",
    )
    gold = spark.createDataFrame(
        [(i, c) for i, c in [(1, "x"), (2, "x"), (3, "y"), (4, "y"), (5, "y"), (6, "z")]],
        "rec_id long, cluster_id string",
    )
    row = clustering_information(pred, gold).first()
    # H(P) = H(G) = ln6 - (3ln3 + 2ln2)/6; MI = ln6 - ln3 = ln2 (by hand)
    h = math.log(6) - (3 * math.log(3) + 2 * math.log(2)) / 6
    assert row["n_records"] == 6
    assert row["h_pred"] == pytest.approx(h)
    assert row["h_gold"] == pytest.approx(h)
    assert row["mi"] == pytest.approx(math.log(2))
    assert row["nmi"] == pytest.approx(math.log(2) / h)
    assert row["vi"] == pytest.approx(2 * h - 2 * math.log(2))
    # symmetry: swapping the clusterings swaps the entropies, fixes mi/nmi/vi
    rsw = clustering_information(gold, pred).first()
    assert rsw["h_pred"] == pytest.approx(row["h_gold"])
    assert rsw["h_gold"] == pytest.approx(row["h_pred"])
    assert rsw["mi"] == pytest.approx(row["mi"])
    assert rsw["nmi"] == pytest.approx(row["nmi"])
    assert rsw["vi"] == pytest.approx(row["vi"])


def test_clustering_information_identical_and_trivial(spark):
    pred = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "rec_id long, cluster_id string"
    )
    row = clustering_information(pred, pred).first()
    assert row["nmi"] == pytest.approx(1.0)
    assert row["vi"] == pytest.approx(0.0, abs=1e-12)
    # both trivial (one big cluster each): zero entropy on both sides -> 1.0
    one = spark.createDataFrame(
        [(1, "o"), (2, "o"), (3, "o")], "rec_id long, cluster_id string"
    )
    row = clustering_information(one, one).first()
    assert row["h_pred"] == pytest.approx(0.0, abs=1e-12)
    assert row["nmi"] == pytest.approx(1.0)
    assert row["vi"] == pytest.approx(0.0, abs=1e-12)
    # exactly one trivial: no shared information is extractable -> 0.0
    row = clustering_information(one, pred).first()
    assert row["nmi"] == pytest.approx(0.0)
    assert row["vi"] == pytest.approx(row["h_gold"])


def test_transitive_dedup_keep_chain(spark):
    docs = spark.createDataFrame(
        [
            (10, "x1 x2 x3 x4 x5"),
            (11, "x2 x3 x4 x5 x6"),
            (12, "x3 x4 x5 x6 x7"),
            (13, "y1 y2 y3"),
        ],
        "doc_id long, text string",
    )
    caches: list = []
    out = transitive_dedup_keep(
        docs, threshold=0.6, n=1, persisted_out=caches
    ).collect()
    for c in caches:
        c.unpersist()
    rows = {r["doc_id"]: r for r in out}
    # chain 10~11~12 (Jaccard 4/6 each) but 10 !~ 12 (3/7): one component
    assert set(rows) == {10, 11, 12}  # singleton 13 not listed
    for d in (10, 11, 12):
        assert rows[d]["canonical_id"] == 10
        assert rows[d]["cluster_size"] == 3
        assert rows[d]["is_kept"] == (d == 10)


def _lev(a, b):
    d = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, d[0] = d[:], i
        for j, cb in enumerate(b, 1):
            d[j] = min(d[j - 1] + 1, prev[j] + 1, prev[j - 1] + (ca != cb))
    return d[-1]


def test_edit_distance_join_lossless_vs_bruteforce(spark):
    """Dense fuzz over a 2-letter alphabet: lengths 0-8 around the short-
    stratum cut q*(k+1)=6, so the gram join, the short all-pairs pass, AND
    the cross-stratum pairs all fire; result must equal brute force."""
    import itertools
    import random

    from minimel_spark.operators.pairs import edit_distance_join

    rng = random.Random(42)
    names = list({
        "".join(rng.choice("ab") for _ in range(rng.randint(0, 8)))
        for _ in range(70)
    })
    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(names)], "rec_id long, name string"
    )
    got = {
        (r["rec_id_a"], r["rec_id_b"]): r["distance"]
        for r in edit_distance_join(df, k=2, q=2).collect()
    }
    want = {
        (i, j): _lev(names[i], names[j])
        for i, j in itertools.combinations(range(len(names)), 2)
        if _lev(names[i], names[j]) <= 2
    }
    assert got == want


def test_edit_distance_join_known_pairs(spark):
    from minimel_spark.operators.pairs import edit_distance_join

    df = spark.createDataFrame(
        [(1, "robert"), (2, "rupert"), (3, "roberto"), (4, "zzzzzz")],
        "rec_id long, name string",
    )
    got = {
        (r["rec_id_a"], r["rec_id_b"]): r["distance"]
        for r in edit_distance_join(df, k=2, q=2).collect()
    }
    # robert~rupert d=2, robert~roberto d=1; rupert~roberto d=3 excluded
    assert got == {(1, 2): 2, (1, 3): 1}


def test_edit_distance_join_validates_knobs(spark):
    import pytest as _pt

    from minimel_spark.operators.pairs import edit_distance_join

    df = spark.createDataFrame([(1, "a")], "rec_id long, name string")
    with _pt.raises(ValueError, match="k must"):
        edit_distance_join(df, k=-1)
    with _pt.raises(ValueError, match="q must"):
        edit_distance_join(df, q=0)


def test_fuzzy_ratios_hand_examples(spark):
    from minimel_spark.operators.pairs import fuzzy_ratios

    df = spark.createDataFrame(
        [
            ("john smith", "smith john"),
            ("acme corp", "acme corp holdings intl"),
            ("", ""),
            ("abc", "xyz"),
        ],
        "name_a string, name_b string",
    )
    rows = fuzzy_ratios(df).collect()
    by = {(r["name_a"], r["name_b"]): r for r in rows}
    r = by[("john smith", "smith john")]
    assert r["ratio"] < 1.0
    assert r["token_sort_ratio"] == pytest.approx(1.0)
    assert r["token_set_ratio"] == pytest.approx(1.0)
    r = by[("acme corp", "acme corp holdings intl")]
    assert r["token_sort_ratio"] < 1.0
    assert r["token_set_ratio"] == pytest.approx(1.0)  # common == shorter side
    r = by[("", "")]
    assert r["ratio"] == r["token_sort_ratio"] == r["token_set_ratio"] == 1.0
    r = by[("abc", "xyz")]
    assert r["ratio"] == pytest.approx(0.0)
    assert r["token_set_ratio"] == pytest.approx(0.0)  # empty common vs full


def test_cluster_churn_hand_example(spark):
    from minimel_spark.operators.cluster import cluster_churn

    # prev: A={1,2,3} B={4,5} C={6} D={7} (D vanishes)
    prev = spark.createDataFrame(
        [(1, 100), (2, 100), (3, 100), (4, 200), (5, 200), (6, 300), (7, 400)],
        "node long, component long",
    )
    # new: A splits {1,2}|{3}; B merges with C into one; 8 is brand new
    new = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 30), (4, 20), (5, 20), (6, 20), (8, 80)],
        "node long, component long",
    )
    row = cluster_churn(prev, new).first()
    assert row["n_prev"] == 4 and row["n_new"] == 4
    assert row["n_split"] == 1      # A
    assert row["n_merged"] == 2     # B and C both land in the absorbing 20
    assert row["n_stable"] == 0
    assert row["n_vanished"] == 1   # D
    # moved: A's minority shard {3} -> 1 record; B and C are each wholly in
    # their majority destination
    assert row["moved_records"] == 1


def test_cluster_churn_identity(spark):
    from minimel_spark.operators.cluster import cluster_churn

    c = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 3)], "node long, component long"
    )
    row = cluster_churn(c, c).first()
    assert row["n_stable"] == 2 and row["n_split"] == 0
    assert row["n_merged"] == 0 and row["n_vanished"] == 0
    assert row["moved_records"] == 0


def _assert_no_window_or_sort_funnel(df):
    """Scale-shape pin shared by the round-5 ER batch: no SinglePartition
    exchange feeding a Sort/Window (1-row scalar-aggregate reduces are the
    only allowed single-partition points)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" in line:
            above = " ".join(lines[max(0, i - 2) : i])
            assert "Window" not in above and "Sort" not in above, plan
    assert "TakeOrderedAndProject" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_round5_er_operator_plan_shapes(spark):
    from minimel_spark.operators.corpus import dsir_importance
    from minimel_spark.operators.pairs import edit_distance_join, fuzzy_ratios

    recs = spark.createDataFrame(
        [(i, f"name{i} corp") for i in range(40)], "rec_id long, name string"
    )
    _assert_no_window_or_sort_funnel(
        meta_blocking_pairs(token_blocks(recs))
    )
    _assert_no_window_or_sort_funnel(edit_distance_join(recs, k=2, q=2))
    docs = spark.createDataFrame(
        [(i, f"tok{i} tok{i+1} common") for i in range(30)],
        "doc_id long, text string",
    )
    _assert_no_window_or_sort_funnel(dsir_importance(docs, docs.limit(10)))
    pairs = spark.createDataFrame(
        [("a b", "b a")], "name_a string, name_b string"
    )
    _assert_no_window_or_sort_funnel(fuzzy_ratios(pairs))


def test_soft_tfidf_hand_example(spark):
    import math

    from minimel_spark.functions.similarity import jaro_winkler
    from minimel_spark.operators.pairs import soft_tfidf

    corpus = spark.createDataFrame(
        [("acme corp",), ("acme corporation",), ("zeta inc",)], "name string"
    )
    pairs = spark.createDataFrame(
        [
            ("acme corp", "acme corporation"),
            ("acme corp", "zeta inc"),
            ("acme corp", "acme corp"),
        ],
        "name_a string, name_b string",
    )
    caches: list = []
    rows = {
        (r["name_a"], r["name_b"]): r["soft_tfidf"]
        for r in soft_tfidf(
            pairs, corpus, threshold=0.85, persisted_out=caches
        ).collect()
    }
    for c in caches:
        c.unpersist()
    # weights: u(tok) = tf * ln(1 + 3/df); df(acme)=2, df(corp)=df(corporation)=1
    ua, uc = math.log(1 + 3 / 2), math.log(1 + 3 / 1)
    z = math.hypot(ua, uc)  # same norm for both acme-names
    jcc = jaro_winkler("corp", "corporation")
    assert jcc > 0.85  # the cross-token match the metric exists for
    want = (ua / z) * (ua / z) * 1.0 + (uc / z) * (uc / z) * jcc
    assert rows[("acme corp", "acme corporation")] == pytest.approx(want)
    assert rows[("acme corp", "zeta inc")] == 0.0
    assert rows[("acme corp", "acme corp")] == pytest.approx(1.0)


def test_soft_tfidf_validates_threshold(spark):
    from minimel_spark.operators.pairs import soft_tfidf

    df = spark.createDataFrame([("a", "b")], "name_a string, name_b string")
    corpus = spark.createDataFrame([("a",)], "name string")
    with pytest.raises(ValueError, match="threshold"):
        soft_tfidf(df, corpus, threshold=1.0)


def test_reciprocal_best_pairs(spark):
    from minimel_spark.operators.scoring import reciprocal_best_pairs

    scored = spark.createDataFrame(
        [
            ("a", "b", 0.9),   # mutual best
            ("a", "c", 0.8),   # a's 2nd; c's best is a -> not reciprocal
            ("c", "d", 0.7),   # c prefers a; d prefers c -> not reciprocal
            ("e", "f", 0.5),   # mutual best (only edge)
            ("g", "h", 0.6),   # tie with (g, i): partner asc -> h wins
            ("g", "i", 0.6),
        ],
        "rec_id_a string, rec_id_b string, score double",
    )
    got = {
        (r["rec_id_a"], r["rec_id_b"])
        for r in reciprocal_best_pairs(scored).collect()
    }
    assert got == {("a", "b"), ("e", "f"), ("g", "h")}


def test_pr_curve_hand_example(spark):
    from minimel_spark.operators.evaluate import pr_curve

    scored = spark.createDataFrame(
        [(0.95, True), (0.85, True), (0.82, False), (0.45, True), (0.40, False)],
        "score double, is_match boolean",
    )
    rows = {r["threshold"]: r for r in pr_curve(scored, bins=10).collect()}
    # bins: 0.9 -> (1 pos), 0.8 -> (1 pos, 1 neg), 0.4 -> (1 pos, 1 neg)
    assert rows[0.9]["tp"] == 1 and rows[0.9]["fp"] == 0 and rows[0.9]["fn"] == 2
    assert rows[0.9]["precision"] == pytest.approx(1.0)
    assert rows[0.8]["tp"] == 2 and rows[0.8]["fp"] == 1
    assert rows[0.8]["recall"] == pytest.approx(2 / 3)
    assert rows[0.4]["tp"] == 3 and rows[0.4]["fp"] == 2 and rows[0.4]["fn"] == 0
    assert rows[0.4]["precision"] == pytest.approx(0.6)
    with pytest.raises(ValueError, match="bins"):
        pr_curve(scored, bins=0)


def test_overlap_dups_catches_containment_jaccard_misses(spark):
    from minimel_spark.operators.dedup import ngram_jaccard_dups, overlap_dups

    quote = "q1 q2 q3 q4 q5 q6"
    page = quote + " " + " ".join(f"w{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, quote), (2, page), (3, "z1 z2 z3")], "doc_id long, text string"
    )
    ov = {
        (r["id_a"], r["id_b"]): r["overlap"]
        for r in overlap_dups(docs, threshold=0.8, n=2).collect()
    }
    # the 5 quote bigrams are all inside the page -> overlap 1.0
    assert ov == {(1, 2): pytest.approx(1.0)}
    # Jaccard misses the same pair at any reasonable threshold
    jc = ngram_jaccard_dups(docs, threshold=0.5, n=2).collect()
    assert jc == []


def test_edit_distance_join_duplicate_names(spark):
    """Duplicate-heavy input: similarity work runs per DISTINCT name; the
    expansion must emit every record pair, including same-name groups at
    distance 0."""
    from minimel_spark.operators.pairs import edit_distance_join

    df = spark.createDataFrame(
        [(1, "robert"), (2, "robert"), (3, "rupert"), (4, "robert")],
        "rec_id long, name string",
    )
    got = {
        (r["rec_id_a"], r["rec_id_b"]): r["distance"]
        for r in edit_distance_join(df, k=2, q=2).collect()
    }
    assert got == {
        (1, 2): 0, (1, 4): 0, (2, 4): 0,          # same-name group
        (1, 3): 2, (2, 3): 2, (3, 4): 2,          # cross-name expansion
    }


def test_fuzzy_ratios_tokenless_side_scores_zero(spark):
    from minimel_spark.operators.pairs import fuzzy_ratios

    df = spark.createDataFrame(
        [("###", "acme corp"), ("!!", "--")], "name_a string, name_b string"
    )
    rows = {(r["name_a"], r["name_b"]): r for r in fuzzy_ratios(df).collect()}
    # junk name vs real name: no maximal containment signal
    assert rows[("###", "acme corp")]["token_set_ratio"] == 0.0
    # both token-less: vacuously identical
    assert rows[("!!", "--")]["token_set_ratio"] == 1.0


def test_dsir_empty_target_uses_smoothed_floor(spark):
    from minimel_spark.operators.corpus import dsir_importance

    raw = spark.createDataFrame(
        [(1, "cat sat"), (2, "dog ran")], "doc_id long, text string"
    )
    empty = raw.where(F.col("doc_id") < 0)
    rows = {
        r["doc_id"]: r
        for r in dsir_importance(raw, empty, num_buckets=1 << 20).collect()
    }
    # every gram hits the target floor ln(1/(0+B)) minus its raw log-prob:
    # finite, negative, NOT null/zero
    import math
    B = 1 << 20
    per_gram = math.log(1 / (0 + B)) - math.log(2 / (6 + B))
    for d in (1, 2):
        assert rows[d]["logweight"] == pytest.approx(3 * per_gram)


def test_cluster_churn_disjoint_records(spark):
    from minimel_spark.operators.cluster import cluster_churn

    prev = spark.createDataFrame([(1, 1), (2, 1)], "node long, component long")
    new = spark.createDataFrame([(9, 9)], "node long, component long")
    row = cluster_churn(prev, new).first()
    assert row["n_vanished"] == 1 and row["n_stable"] == 0
    assert row["n_split"] == 0 and row["n_merged"] == 0
    assert row["moved_records"] == 0


def test_pr_curve_excludes_null_rows(spark):
    from minimel_spark.operators.evaluate import pr_curve

    scored = spark.createDataFrame(
        [(0.9, True), (0.8, None), (None, False)],
        "score double, is_match boolean",
    )
    rows = pr_curve(scored, bins=10).collect()
    assert len(rows) == 1
    assert rows[0]["tp"] == 1 and rows[0]["fp"] == 0 and rows[0]["fn"] == 0


def test_cluster_cohesion_flags_chains_and_unsupported(spark):
    from minimel_spark.operators.cluster import cluster_cohesion

    assign = spark.createDataFrame(
        # cluster 1: triangle-able {1,2,3} but only a chain was scored;
        # cluster 2: pair {4,5} fully scored; cluster 3: pair {6,7} with NO
        # scored edge (blocking-only); singleton 8 excluded
        [(1, 1), (2, 1), (3, 1), (4, 2), (5, 2), (6, 3), (7, 3), (8, 4)],
        "node long, component long",
    )
    scored = spark.createDataFrame(
        [(1, 2, 0.9), (2, 3, 0.7), (4, 5, 0.8), (1, 4, 0.99)],
        "rec_id_a long, rec_id_b long, score double",
    )
    rows = {r["cluster_id"]: r for r in cluster_cohesion(assign, scored).collect()}
    assert set(rows) == {1, 2, 3}
    c1 = rows[1]
    assert c1["size"] == 3 and c1["n_possible"] == 3 and c1["n_scored"] == 2
    assert c1["edge_coverage"] == pytest.approx(2 / 3)
    assert c1["min_score"] == pytest.approx(0.7)
    c2 = rows[2]
    assert c2["edge_coverage"] == pytest.approx(1.0)
    c3 = rows[3]
    assert c3["n_scored"] == 0 and c3["min_score"] is None


def test_monge_elkan_hand_example(spark):
    from minimel_spark.functions.similarity import jaro_winkler
    from minimel_spark.operators.pairs import monge_elkan

    pairs = spark.createDataFrame(
        [
            ("acme corp", "corp acme"),
            ("acme corp", "acme corporation"),
            ("acme corp", "zeta inc"),
        ],
        "name_a string, name_b string",
    )
    rows = {
        (r["name_a"], r["name_b"]): (r["me_ab"], r["me_ba"], r["me_sym"])
        for r in monge_elkan(pairs, threshold=0.85).collect()
    }
    # word reorder: every token has an exact partner in both directions
    assert rows[("acme corp", "corp acme")] == (1.0, 1.0, 1.0)
    jcc = jaro_winkler("corp", "corporation")
    assert jcc > 0.85
    want = (1.0 + jcc) / 2
    got = rows[("acme corp", "acme corporation")]
    assert got[0] == pytest.approx(want)
    assert got[1] == pytest.approx(want)  # jw is symmetric, same token sets
    assert rows[("acme corp", "zeta inc")] == (0.0, 0.0, 0.0)


def test_monge_elkan_multiset_and_asymmetry(spark):
    from minimel_spark.operators.pairs import monge_elkan

    pairs = spark.createDataFrame(
        [("aaa bbb", "aaa aaa aaa")], "name_a string, name_b string"
    )
    (row,) = monge_elkan(pairs, threshold=0.85).collect()
    # a-side: one exact match + one below-cutoff token -> mean (1+0)/2
    assert row["me_ab"] == pytest.approx(0.5)
    # b-side: all three multiset slots match 'aaa' exactly -> 1.0
    assert row["me_ba"] == pytest.approx(1.0)
    assert row["me_sym"] == pytest.approx(0.75)


def test_monge_elkan_validates_threshold(spark):
    from minimel_spark.operators.pairs import monge_elkan

    df = spark.createDataFrame([("a", "b")], "name_a string, name_b string")
    with pytest.raises(ValueError, match="threshold"):
        monge_elkan(df, threshold=-0.1)


# --------------------------------------------------------------------------
# stable_cluster_alignment (entity-id continuity)
# --------------------------------------------------------------------------


def _asg(spark, rows):
    return spark.createDataFrame(rows, "node long, component long")


def test_stable_alignment_split_merge_new(spark):
    from minimel_spark.operators.cluster import stable_cluster_alignment

    # prev: P100={1,2,3} P200={4,5} P300={6}
    prev = _asg(spark, [(1, 100), (2, 100), (3, 100), (4, 200), (5, 200), (6, 300)])
    # new: P100 splits {1,2}|{3}; P200+P300 merge into {4,5,6}; {8} is new
    new = _asg(spark, [(1, 10), (2, 10), (3, 30), (4, 20), (5, 20), (6, 20), (8, 80)])
    out = {
        r["new_component"]: r.asDict()
        for r in stable_cluster_alignment(prev, new).collect()
    }
    # the split's majority shard inherits; the minority shard does not
    assert out[10]["prev_component"] == 100 and out[10]["inherited"]
    assert out[10]["overlap"] == 2 and out[10]["new_size"] == 2
    assert out[10]["prev_size"] == 3
    assert out[30]["prev_component"] is None and not out[30]["inherited"]
    # the merge keeps the id of the largest absorbed cluster (200, overlap 2)
    assert out[20]["prev_component"] == 200 and out[20]["overlap"] == 2
    assert out[20]["new_size"] == 3 and out[20]["prev_size"] == 2
    # brand-new cluster: nothing to inherit
    assert out[80]["prev_component"] is None and not out[80]["inherited"]
    assert out[80]["new_size"] == 1 and out[80]["prev_size"] is None


def test_stable_alignment_tie_breaks_and_one_to_one(spark):
    from minimel_spark.operators.cluster import stable_cluster_alignment

    # every overlap is 1: P10 ties {C5, C6}, P20 ties {C5, C6}; both argmaxes
    # break to the smaller counterpart id, so only (P10, C5) is mutual
    prev = _asg(spark, [(1, 10), (2, 10), (3, 20), (4, 20)])
    new = _asg(spark, [(1, 5), (3, 5), (2, 6), (4, 6)])
    out = {
        r["new_component"]: r["prev_component"]
        for r in stable_cluster_alignment(prev, new).collect()
    }
    assert out == {5: 10, 6: None}


def test_stable_alignment_identity_and_injectivity(spark):
    from minimel_spark.operators.cluster import stable_cluster_alignment

    prev = _asg(spark, [(1, 1), (2, 1), (3, 3), (4, 4)])
    rows = stable_cluster_alignment(prev, prev).collect()
    # identity run: every cluster inherits itself with overlap == size
    for r in rows:
        assert r["prev_component"] == r["new_component"] and r["inherited"]
        assert r["overlap"] == r["new_size"] == r["prev_size"]
    # mutual-argmax alignment is one-to-one: no prev id inherited twice
    inh = [r["prev_component"] for r in rows if r["inherited"]]
    assert len(inh) == len(set(inh))


def test_stable_alignment_partitioning_invariant(spark):
    from minimel_spark.operators.cluster import stable_cluster_alignment

    prev = _asg(spark, [(i, i % 5) for i in range(40)])
    new = _asg(spark, [(i, i % 7) for i in range(40)])
    one = sorted(tuple(r) for r in stable_cluster_alignment(prev, new).collect())
    two = sorted(
        tuple(r)
        for r in stable_cluster_alignment(
            prev.repartition(7), new.repartition(3)
        ).collect()
    )
    assert one == two


def test_score_calibration_hand_example(spark):
    from minimel_spark.operators.evaluate import score_calibration

    scored = spark.createDataFrame(
        [
            (0.05, 0), (0.15, 0), (0.12, 1),   # bins 0 and 1
            (0.95, 1), (0.92, 0),              # bin 9
            (1.0, 1),                          # score 1.0 -> top bin, not bin 10
        ],
        "score double, label int",
    )
    rows = {r["bin"]: r for r in score_calibration(scored, n_bins=10).collect()}
    assert set(rows) == {0, 1, 9}
    assert rows[0]["n_pairs"] == 1 and rows[0]["match_rate"] == pytest.approx(0.0)
    assert rows[1]["match_rate"] == pytest.approx(0.5)
    b9 = rows[9]
    assert b9["n_pairs"] == 3
    assert b9["mean_score"] == pytest.approx((0.95 + 0.92 + 1.0) / 3)
    assert b9["match_rate"] == pytest.approx(2 / 3)
    # ece = weighted mean gap, identical constant on every row
    gaps = {b: abs(rows[b]["match_rate"] - rows[b]["mean_score"]) for b in rows}
    ece = sum(rows[b]["n_pairs"] * gaps[b] for b in rows) / 6
    for b in rows:
        assert rows[b]["ece"] == pytest.approx(ece)
        assert rows[b]["abs_gap"] == pytest.approx(gaps[b])


def test_score_calibration_perfectly_calibrated_and_guard(spark):
    from minimel_spark.operators.evaluate import score_calibration

    # constant score 0.5 with exactly half the labels positive: gap 0, ece 0
    scored = spark.createDataFrame(
        [(0.5, 1), (0.5, 0), (0.5, 1), (0.5, 0)], "score double, label int"
    )
    row = score_calibration(scored, n_bins=4).collect()
    assert len(row) == 1 and row[0]["bin"] == 2
    assert row[0]["abs_gap"] == pytest.approx(0.0)
    assert row[0]["ece"] == pytest.approx(0.0)
    with pytest.raises(ValueError, match="n_bins"):
        score_calibration(scored, n_bins=0)


def test_clustering_information_trivial_guard_is_structural(spark):
    # N=6: ln(6) - (6*ln 6)/6 is a ±2e-16 residual in doubles, NOT exact 0 —
    # the guard must key on cluster COUNTS, not float-zero entropy.
    one6 = spark.createDataFrame(
        [(i, "o") for i in range(6)], "rec_id long, cluster_id string"
    )
    row = clustering_information(one6, one6).first()
    assert row["h_pred"] == 0.0 and row["h_gold"] == 0.0
    assert row["nmi"] == pytest.approx(1.0)
    assert row["vi"] == pytest.approx(0.0, abs=1e-12)
    # exactly one trivial side at N=6: 0.0, not NaN (sqrt of a negative ulp)
    import math

    two6 = spark.createDataFrame(
        [(i, "a" if i < 3 else "b") for i in range(6)],
        "rec_id long, cluster_id string",
    )
    row = clustering_information(one6, two6).first()
    assert not math.isnan(row["nmi"])
    assert row["nmi"] == pytest.approx(0.0)
    assert row["mi"] == 0.0
    assert row["vi"] == pytest.approx(row["h_gold"])


def test_score_calibration_clamps_negative_scores(spark):
    from minimel_spark.operators.evaluate import score_calibration

    scored = spark.createDataFrame(
        [(-0.05, 0), (0.02, 0), (1.3, 1)], "score double, label int"
    )
    rows = {r["bin"]: r for r in score_calibration(scored, n_bins=10).collect()}
    assert set(rows) == {0, 9}  # no bin -1, no bin 10
    assert rows[0]["n_pairs"] == 2
    assert rows[9]["n_pairs"] == 1


def test_roc_auc_hand_example(spark):
    from minimel_spark.operators.evaluate import roc_auc

    # scores: pos {0.9, 0.7, 0.5}, neg {0.7, 0.3}. Midranks over
    # sorted [0.3, 0.5, 0.7, 0.7, 0.9]: 0.3→1, 0.5→2, 0.7→3.5, 0.9→5.
    # rank_pos = 2 + 3.5 + 5 = 10.5; AUC = (10.5 - 6) / (3*2) = 0.75.
    scored = spark.createDataFrame(
        [(0.9, True), (0.7, True), (0.5, True), (0.7, False), (0.3, False)],
        "score double, is_match boolean",
    )
    row = roc_auc(scored).collect()[0]
    assert row["n_pos"] == 3 and row["n_neg"] == 2
    assert abs(row["auc"] - 0.75) < 1e-12
    assert abs(row["gini"] - 0.5) < 1e-12


def test_roc_auc_perfect_and_random(spark):
    from minimel_spark.operators.evaluate import roc_auc

    perfect = spark.createDataFrame(
        [(0.9, True), (0.8, True), (0.2, False), (0.1, False)],
        "score double, is_match boolean",
    )
    assert roc_auc(perfect).collect()[0]["auc"] == 1.0
    # all scores tied -> pure midrank -> 0.5 exactly
    tied = spark.createDataFrame(
        [(0.5, True), (0.5, False), (0.5, True), (0.5, False)],
        "score double, is_match boolean",
    )
    assert roc_auc(tied).collect()[0]["auc"] == 0.5


def test_roc_auc_degenerate_and_nulls(spark):
    from minimel_spark.operators.evaluate import roc_auc

    # one class only -> NULL auc (undefined, not 0.5)
    onesided = spark.createDataFrame(
        [(0.9, True), (0.1, True)], "score double, is_match boolean"
    )
    row = roc_auc(onesided).collect()[0]
    assert row["auc"] is None and row["gini"] is None
    # NULL rows excluded, out-of-range scores clamp into edge ranges
    # without disturbing the rank order
    mixed = spark.createDataFrame(
        [(1.7, True), (None, True), (0.4, None), (-0.3, False), (0.5, False)],
        "score double, is_match boolean",
    )
    row = roc_auc(mixed).collect()[0]
    assert row["n_pos"] == 1 and row["n_neg"] == 2
    assert row["auc"] == 1.0


def test_brier_decomposition_identities(spark):
    from minimel_spark.operators.evaluate import brier_decomposition

    # constant-per-bin forecasts -> within_bin exactly 0 and the Murphy
    # identity brier = rel - res + unc holds to machine precision
    rows = (
        [(0.05, True)] * 2 + [(0.05, False)] * 8
        + [(0.95, True)] * 9 + [(0.95, False)] * 1
    )
    scored = spark.createDataFrame(rows, "score double, label boolean")
    r = brier_decomposition(scored, n_bins=10).collect()[0]
    assert r["n"] == 20
    assert abs(r["base_rate"] - 11 / 20) < 1e-12
    assert abs(r["within_bin"]) < 1e-12
    assert abs(
        r["brier"] - (r["reliability"] - r["resolution"] + r["uncertainty"])
    ) < 1e-12
    # hand brier: bin1 p=.05 y=.2; bin10 p=.95 y=.9
    expected_brier = (
        2 * 0.95**2 + 8 * 0.05**2 + 9 * 0.05**2 + 1 * 0.95**2
    ) / 20
    assert abs(r["brier"] - expected_brier) < 1e-12


def test_brier_perfect_forecaster_and_guard(spark):
    import pytest as _pytest

    from minimel_spark.operators.evaluate import brier_decomposition

    perfect = spark.createDataFrame(
        [(1.0, True)] * 3 + [(0.0, False)] * 7, "score double, label boolean"
    )
    r = brier_decomposition(perfect, n_bins=10).collect()[0]
    assert r["brier"] == 0.0 and r["reliability"] == 0.0
    # perfect forecaster's resolution equals uncertainty
    assert abs(r["resolution"] - r["uncertainty"]) < 1e-12
    with _pytest.raises(ValueError):
        brier_decomposition(perfect, n_bins=0)


def test_best_threshold_argmax_and_ties(spark):
    from minimel_spark.operators.evaluate import best_threshold, pr_curve

    scored = spark.createDataFrame(
        [(0.9, True), (0.8, True), (0.7, False), (0.6, True), (0.2, False)],
        "score double, is_match boolean",
    )
    curve = pr_curve(scored, bins=10)
    row = best_threshold(curve).collect()[0]
    # at t=0.6: tp=3 fp=1 fn=0 -> p=0.75, r=1, f1=6/7 (beats t=0.8's 0.8)
    assert abs(row["threshold"] - 0.6) < 1e-12
    assert row["tp"] == 3 and row["fp"] == 1 and row["fn"] == 0
    assert abs(row["f1"] - 6 / 7) < 1e-12
    # tie case: two rows with identical f1 -> higher threshold wins
    tie = spark.createDataFrame(
        [(0.9, 1.0, 0.5), (0.4, 0.5, 1.0)],
        "threshold double, precision double, recall double",
    )
    t = best_threshold(tie).collect()[0]
    assert t["threshold"] == 0.9


def test_learn_blocking_rules_greedy_trace(spark):
    from minimel_spark.operators.evaluate import learn_blocking_rules

    # rule a covers matches {1,2}; rule b covers {2,3,4}; rule c covers {1}
    # greedy: b first (3 new), then a (1 new: match 1), then c (0 new)
    rows = [
        # (is_match, a, b, c)
        (True, True, False, True),    # m1
        (True, True, True, False),    # m2
        (True, False, True, False),   # m3
        (True, False, True, False),   # m4
        (False, True, True, False),   # non-match noise
        (False, False, False, False),
    ]
    pairs = spark.createDataFrame(rows, "is_match boolean, a boolean, b boolean, c boolean")
    out = {r["round"]: r for r in learn_blocking_rules(pairs, ["a", "b", "c"], n_rules=3).collect()}
    assert out[1]["rule"] == "b" and out[1]["new_matches"] == 3
    assert out[1]["new_pairs"] == 4  # 3 matches + 1 noise pair
    assert out[2]["rule"] == "a" and out[2]["new_matches"] == 1
    assert out[2]["new_pairs"] == 1  # the noise pair was already covered by b
    assert out[3]["rule"] == "c" and out[3]["new_matches"] == 0
    assert out[3]["cum_matches"] == 4 and out[3]["total_matches"] == 4


def test_learn_blocking_rules_tiebreak_and_guards(spark):
    import pytest as _pytest

    from minimel_spark.operators.evaluate import learn_blocking_rules

    pairs = spark.createDataFrame(
        [(True, True, True)], "is_match boolean, z boolean, a boolean"
    )
    # equal coverage -> lexicographically smaller rule name first
    out = learn_blocking_rules(pairs, ["z", "a"], n_rules=2).collect()
    assert out[0]["rule"] == "a" and out[1]["rule"] == "z"
    with _pytest.raises(ValueError):
        learn_blocking_rules(pairs, [], n_rules=1)
    with _pytest.raises(ValueError):
        learn_blocking_rules(pairs, ["a", "a"], n_rules=1)
    with _pytest.raises(ValueError):
        learn_blocking_rules(pairs, ["a"], n_rules=2)


def test_progressive_size_curve_attribution_and_recall(spark):
    from minimel_spark.operators.evaluate import progressive_size_curve

    # entities: {1,2} match, {3,4} match, 5 alone. Blocks: size-2 block b1
    # holds the (1,2) match; size-3 block b2 holds (3,4) AND re-holds
    # (1,2)? no — b2 = {1,3,4}: contains (3,4) match only. b3 (size 4)
    # re-contains (3,4) — must NOT be credited twice.
    blocked = spark.createDataFrame(
        [("b1", 1), ("b1", 2),
         ("b2", 1), ("b2", 3), ("b2", 4),
         ("b3", 2), ("b3", 3), ("b3", 4), ("b3", 5)],
        "block_key string, rec_id long",
    )
    gold = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 20), (4, 20), (5, 30)],
        "rec_id long, entity_id long",
    )
    rows = {
        r["block_size"]: r
        for r in progressive_size_curve(blocked, gold).collect()
    }
    assert set(rows) == {2, 3, 4}
    # tier 2: one block, C(2,2)=1 pair, finds the (1,2) match
    assert rows[2]["n_blocks"] == 1 and rows[2]["new_pairs"] == 1
    assert rows[2]["new_matches"] == 1
    # tier 3: 3 pairs cost, first finds (3,4)
    assert rows[3]["new_pairs"] == 3 and rows[3]["new_matches"] == 1
    # tier 4: 6 more pairs, (3,4) already credited at size 3 -> 0 new
    assert rows[4]["new_pairs"] == 6 and rows[4]["new_matches"] == 0
    # denominator = 2 gold pairs; monotone cumulative recall 0.5 -> 1.0
    assert rows[2]["cum_recall"] == 0.5
    assert rows[3]["cum_recall"] == 1.0 == rows[4]["cum_recall"]
    assert rows[4]["cum_pairs"] == 10


def test_progressive_size_curve_unblocked_matches_cap_recall(spark):
    from minimel_spark.operators.evaluate import progressive_size_curve

    # the (5,6) match never co-occurs in a block: asymptote stays at 1/2
    blocked = spark.createDataFrame(
        [("b1", 1), ("b1", 2), ("b2", 5), ("b3", 6)],
        "block_key string, rec_id long",
    )
    gold = spark.createDataFrame(
        [(1, 10), (2, 10), (5, 20), (6, 20)],
        "rec_id long, entity_id long",
    )
    out = progressive_size_curve(blocked, gold).orderBy("block_size").collect()
    assert out[-1]["cum_recall"] == 0.5


def test_recall_at_k_hand_example(spark):
    import pytest

    from minimel_spark.operators.evaluate import recall_at_k

    ranked = spark.createDataFrame(
        [("q1", "a", 1), ("q1", "b", 2), ("q1", "c", 3), ("q2", "x", 1)],
        "query_id string, cand_id string, rank long",
    )
    gold = spark.createDataFrame(
        # q1 has two gold (b at rank 2, c at rank 3); q2's gold 'y' was
        # never proposed (blocker miss); q3 entirely unranked
        [("q1", "b"), ("q1", "c"), ("q2", "y"), ("q3", "z")],
        "query_id string, cand_id string",
    )
    rows = {r["k"]: r for r in recall_at_k(ranked, gold, [1, 2, 3]).collect()}
    assert rows[1]["n_hit"] == 0 and rows[1]["recall"] == 0.0
    assert rows[2]["n_hit"] == 1 and rows[2]["recall"] == 0.25
    assert rows[3]["n_hit"] == 2 and rows[3]["recall"] == 0.5
    # coverage: of 3 queries with gold, only q1 ever hits
    assert rows[3]["n_queries"] == 3 and rows[3]["n_queries_hit"] == 1
    assert abs(rows[3]["coverage"] - 1 / 3) < 1e-6  # operator rounds to 6dp
    with pytest.raises(ValueError):
        recall_at_k(ranked, gold, [])
    with pytest.raises(ValueError):
        recall_at_k(ranked, gold, [0])


def test_purge_blocks_budget_and_schedule(spark):
    import pytest

    from minimel_spark.operators.metablocking import purge_blocks

    # blocks: tiny (2 recs, 1 pair), small (3 recs, 3 pairs),
    # mega (10 recs, 45 pairs)
    rows = (
        [("tiny", f"t{i}") for i in range(2)]
        + [("small", f"s{i}") for i in range(3)]
        + [("mega", f"m{i}") for i in range(10)]
    )
    blocked = spark.createDataFrame(rows, "block_key string, rec_id string")
    # budget 10: admits tiny (cum 1) and small (cum 4); mega would hit 49
    out = {r["block_key"] for r in purge_blocks(blocked, 10).collect()}
    assert out == {"tiny", "small"}
    # budget 0: singleton blocks (0 pairs) would survive; none here besides
    # none -> only blocks with 0 pairs admitted
    assert purge_blocks(blocked, 0).count() == 0
    # generous budget keeps everything
    n_all = purge_blocks(blocked, 10_000).count()
    assert n_all == len(rows)
    with pytest.raises(ValueError):
        purge_blocks(blocked, -1)


def test_purge_blocks_dedupes_assignments_first(spark):
    from minimel_spark.operators.metablocking import purge_blocks

    # duplicated (key, rec) rows must not inflate block sizes
    blocked = spark.createDataFrame(
        [("b", "x"), ("b", "x"), ("b", "y")],
        "block_key string, rec_id string",
    )
    out = purge_blocks(blocked, 1).collect()
    assert len(out) == 2  # block of TRUE size 2 = 1 pair, fits budget 1


def test_blocker_venn_combinations_and_gold(spark):
    import pytest

    from minimel_spark.operators.evaluate import blocker_venn

    # generator A blocks {1,2} and {3,4}; generator B blocks {1,2} and {2,3}
    ga = spark.createDataFrame(
        [("x", 1), ("x", 2), ("y", 3), ("y", 4)],
        "block_key string, rec_id long",
    )
    gb = spark.createDataFrame(
        [("u", 1), ("u", 2), ("v", 2), ("v", 3)],
        "block_key string, rec_id long",
    )
    gold = spark.createDataFrame(
        [(1, 100), (2, 100), (3, 200), (4, 300)],
        "rec_id long, entity_id long",
    )
    rows = {
        r["combo"]: (r["n_pairs"], r["n_matches"])
        for r in blocker_venn([("A", ga), ("B", gb)], gold=gold).collect()
    }
    # (1,2) proposed by both; (3,4) only A; (2,3) only B
    assert rows["A+B"] == (1, 1)   # (1,2) is a gold match
    assert rows["A"] == (1, 0)     # (3,4) not a match
    assert rows["B"] == (1, 0)     # (2,3) not a match
    with pytest.raises(ValueError):
        blocker_venn([])
    # without gold: counts only
    plain = {r["combo"]: r["n_pairs"] for r in blocker_venn([("A", ga), ("B", gb)]).collect()}
    assert plain == {"A+B": 1, "A": 1, "B": 1}


def test_nysiis_known_pairs_and_edges(spark):
    import pyspark.sql.functions as F

    from minimel_spark.functions.phonetic import nysiis_col, nysiis_py

    pairs = [
        ("Ashcraft", "Ashcroft"),
        ("Knight", "Night"),
        ("Pfister", "Phister"),
        ("MacDonald", "McDonald"),
        ("Johnson", "Jonson"),
        ("Catherine", "Katherine"),
        ("Brown", "Braun"),
    ]
    for a, b in pairs:
        assert nysiis_py(a) == nysiis_py(b), (a, b)
    # distinct names keep distinct keys (NYSIIS keeps Y unfolded)
    assert nysiis_py("Smith") != nysiis_py("Smyth")
    # single-letter guards never empty a non-empty name
    for s in ("A", "Ay", "H", "S"):
        assert nysiis_py(s) != "" or s == ""
    assert nysiis_py("") == ""
    # spark chain == python mirror on all of the above
    names = sorted({n for p in pairs for n in p} | {"Smith", "Smyth", "A", "Ay", "H", "S", ""})
    df = spark.createDataFrame([(i, n) for i, n in enumerate(names)], "i long, n string")
    got = {
        r["i"]: r["k"]
        for r in df.select("i", nysiis_col(F.col("n")).alias("k")).collect()
    }
    for i, n in enumerate(names):
        assert got[i] == nysiis_py(n), n


def test_nysiis_three_way_fuzz_parity(spark):
    import random

    import duckdb
    import pyspark.sql.functions as F

    from minimel_spark.functions.phonetic import nysiis_col, nysiis_py, nysiis_sql

    rng = random.Random(20260820)
    alphabet = "abcdefghijklmnopqrstuvwxyzAEIOUY '-"
    names = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 12)))
        for _ in range(300)
    ]
    df = spark.createDataFrame([(i, n) for i, n in enumerate(names)], "i long, n string")
    got = {
        r["i"]: r["k"]
        for r in df.select("i", nysiis_col(F.col("n")).alias("k")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i BIGINT, n VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(names)))
    duck = dict(con.execute(f"SELECT i, {nysiis_sql('n')} FROM t").fetchall())
    for i, n in enumerate(names):
        want = nysiis_py(n)
        assert got[i] == want, (n, got[i], want)
        assert duck[i] == want, (n, duck[i], want)


def test_damerau_levenshtein_known_vectors_and_fuzz():
    import random

    import duckdb

    from minimel_spark.functions.similarity import damerau_levenshtein as dl

    # unrestricted (Lowrance-Wagner) semantics, NOT the restricted OSA:
    assert dl("CA", "ABC") == 2
    assert dl("ab", "ba") == 1
    assert dl("kitten", "sitting") == 3
    assert dl("", "") == 0 and dl("abc", "") == 3 and dl("", "xy") == 2
    assert dl("smtih", "smith") == 1          # one transposition (lev 2)
    con = duckdb.connect()
    rng = random.Random(123)
    for _ in range(500):
        a = "".join(rng.choice("abcd") for _ in range(rng.randint(0, 8)))
        b = "".join(rng.choice("abcd") for _ in range(rng.randint(0, 8)))
        ref = con.execute(
            "SELECT damerau_levenshtein(?, ?)", [a, b]
        ).fetchone()[0]
        assert dl(a, b) == ref, (a, b)


def test_damerau_join_catches_transpositions_lev_misses(spark):
    from minimel_spark.operators.pairs import damerau_distance_join

    df = spark.createDataFrame(
        [(1, "smith"), (2, "smtih"), (3, "johnson"), (4, "johsnon"), (5, "zzz")],
        "rec_id long, name string",
    )
    got = {
        (r["rec_id_a"], r["rec_id_b"]): (r["distance"], r["lev_distance"])
        for r in damerau_distance_join(df, k=1, q=2).collect()
    }
    # at k=1 a lev-join finds NEITHER pair (lev=2 for both swaps); dl=1
    assert got == {(1, 2): (1, 2), (3, 4): (1, 2)}


def test_damerau_join_lossless_vs_bruteforce(spark):
    """Dense fuzz over a 2-letter alphabet spanning the wider DL short
    stratum q + k*(q+1) = 8: gram join + short stratum + cross-stratum all
    fire; must equal brute-force true-DL."""
    import itertools
    import random

    from minimel_spark.functions.similarity import damerau_levenshtein as dl
    from minimel_spark.operators.pairs import damerau_distance_join

    rng = random.Random(99)
    names = list({
        "".join(rng.choice("ab") for _ in range(rng.randint(0, 10)))
        for _ in range(70)
    })
    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(names)], "rec_id long, name string"
    )
    got = {
        (r["rec_id_a"], r["rec_id_b"]): r["distance"]
        for r in damerau_distance_join(df, k=2, q=2).collect()
    }
    want = {
        (i, j): dl(names[i], names[j])
        for i, j in itertools.combinations(range(len(names)), 2)
        if dl(names[i], names[j]) <= 2
    }
    assert got == want
    assert any(v >= 1 for v in got.values())


def test_damerau_join_duplicate_names_and_knobs(spark):
    import pytest as _pt

    from minimel_spark.operators.pairs import damerau_distance_join

    df = spark.createDataFrame(
        [(1, "anna"), (2, "anna"), (3, "nana")], "rec_id long, name string"
    )
    got = {
        (r["rec_id_a"], r["rec_id_b"]): (r["distance"], r["lev_distance"])
        for r in damerau_distance_join(df, k=1, q=2).collect()
    }
    assert got == {(1, 2): (0, 0), (1, 3): (1, 2), (2, 3): (1, 2)}
    with _pt.raises(ValueError, match="k must"):
        damerau_distance_join(df, k=-1)
    with _pt.raises(ValueError, match="q must"):
        damerau_distance_join(df, q=0)
