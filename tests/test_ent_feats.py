"""Entity-feature construction (SURVEY §2 J5, J6, A8, A9; reference
minimel/ent_feats.py:26-63)."""

import pyspark.sql.functions as F

from minimel_spark.operators.ent_feats import entity_features, frequent_features


def test_entity_features_basic(spark):
    spo = spark.createDataFrame(
        [
            # s=1 (candidate): features (10,100)x3 across subjects -> frequent
            (1, 10, 100), (1, 10, 100), (1, 20, 200),
            (2, 10, 100), (2, 30, 300),
            # s=9 is NOT a candidate entity: its triples drop out pre-count
            (9, 40, 400), (9, 40, 400), (9, 40, 400),
        ],
        "s long, p long, o long",
    )
    ents = spark.createDataFrame([(1,), (2,)], "s long")
    out = {r["s"]: (r["feats"], r["n_feats"]) for r in entity_features(spo, ents, part=0.5).collect()}
    # joined counts: (10,100)->3, (20,200)->1, (30,300)->1; median=1 -> all kept
    assert out[1] == ("P10Q100 P20Q200", 2)
    assert out[2] == ("P10Q100 P30Q300", 2)
    assert 9 not in out


def test_frequent_features_absolute_threshold(spark):
    spo = spark.createDataFrame(
        [(1, 10, 100), (2, 10, 100), (3, 20, 200)], "s long, p long, o long"
    )
    kept = {(r["p"], r["o"]) for r in frequent_features(spo, part=2).collect()}
    assert kept == {(10, 100)}


def test_entity_features_dedupes_per_subject(spark):
    spo = spark.createDataFrame(
        [(1, 10, 100), (1, 10, 100), (1, 10, 100)], "s long, p long, o long"
    )
    ents = spark.createDataFrame([(1,)], "s long")
    rows = entity_features(spo, ents, part=1).collect()
    assert len(rows) == 1 and rows[0]["feats"] == "P10Q100" and rows[0]["n_feats"] == 1


def test_entity_features_deterministic_order(spark):
    """A9 determinism delta: feature string is sorted, not set-ordered."""
    spo = spark.createDataFrame(
        [(1, 2, 30), (1, 10, 4), (1, 2, 5)], "s long, p long, o long"
    )
    ents = spark.createDataFrame([(1,)], "s long")
    feats = entity_features(spo, ents, part=1).first()["feats"]
    assert feats == " ".join(sorted(["P2Q30", "P10Q4", "P2Q5"]))
