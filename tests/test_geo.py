"""Tests for geospatial grid-blocked distance join (operators/geo.py)."""

import math

import pytest

from minimel_spark.operators.geo import grid_distance_join


def test_grid_join_hand_distances(spark):
    # ~111 km per degree of latitude at the equator
    recs = spark.createDataFrame(
        [
            (1, 0.0, 0.0),
            (2, 0.5, 0.0),    # ~55.6 km north of 1
            (3, 0.0, 0.5),    # ~55.7 km east of 1
            (4, 10.0, 10.0),  # far away
        ],
        "rec_id long, lat double, lon double",
    )
    rows = {
        (r["id_a"], r["id_b"]): r["distance_km"]
        for r in grid_distance_join(recs, radius_km=100.0, cell_deg=2.0).collect()
    }
    assert set(rows) == {(1, 2), (1, 3), (2, 3)}
    assert abs(rows[(1, 2)] - 0.5 * math.pi / 180 * 6371.0088) < 0.01
    assert abs(rows[(1, 3)] - 0.5 * math.pi / 180 * 6371.0088) < 0.01


def test_grid_join_cross_cell_and_wraparound(spark):
    recs = spark.createDataFrame(
        [
            (1, 0.0, 179.9),   # near the antimeridian...
            (2, 0.0, -179.9),  # ...~22 km away across the wrap
            (3, 1.99, 0.0),    # cell-boundary straddle
            (4, 2.01, 0.0),
        ],
        "rec_id long, lat double, lon double",
    )
    rows = {
        (r["id_a"], r["id_b"])
        for r in grid_distance_join(recs, radius_km=100.0, cell_deg=2.0).collect()
    }
    assert (1, 2) in rows  # longitude wraparound found
    assert (3, 4) in rows  # neighbor-cell pair found
    assert not any(a == b for a, b in rows)


def test_grid_join_guards(spark):
    recs = spark.createDataFrame(
        [(1, 0.0, 0.0)], "rec_id long, lat double, lon double"
    )
    with pytest.raises(ValueError):
        grid_distance_join(recs, radius_km=0, cell_deg=1.0)
    with pytest.raises(ValueError):
        # 1 degree of latitude can't cover 500 km
        grid_distance_join(recs, radius_km=500.0, cell_deg=1.0)
    with pytest.raises(ValueError):
        # longitude degrees shrink at high latitude
        grid_distance_join(recs, radius_km=100.0, cell_deg=1.0, max_abs_lat=80.0)
    with pytest.raises(ValueError):
        grid_distance_join(recs, radius_km=100.0, cell_deg=2.0, max_abs_lat=95.0)


def test_grid_dbscan_blobs_and_noise(spark):
    import pytest

    from minimel_spark.operators.geo import grid_dbscan

    rows = []
    # blob A: 6 points in cell (0,0); blob B: 6 points split across the
    # ADJACENT cells (5,5) and (6,5) — must merge into one cluster
    rows += [(i, 0.3, 0.4) for i in range(6)]
    rows += [(10 + i, 5.5, 5.5) for i in range(6)]
    rows += [(20 + i, 6.5, 5.5) for i in range(6)]
    # sparse: 2 points in one far cell, below min_pts -> noise
    rows += [(30, 50.5, 50.5), (31, 50.6, 50.2)]
    pts = spark.createDataFrame(rows, "point_id long, x double, y double")
    out = {r["point_id"]: r for r in grid_dbscan(pts, eps=1.0, min_pts=5).collect()}
    # blob A clusters under its own cell id
    assert out[0]["is_core"] and out[0]["cluster_id"] == 0
    # the two adjacent core cells share ONE cluster: min(5*100000+5, 6*100000+5)
    assert out[10]["cluster_id"] == out[20]["cluster_id"] == 500005
    # sub-threshold cell is noise
    assert not out[30]["is_core"] and out[30]["cluster_id"] is None
    with pytest.raises(ValueError):
        grid_dbscan(pts, eps=0, min_pts=5)
    with pytest.raises(ValueError):
        grid_dbscan(pts, eps=1.0, min_pts=0)


def test_grid_dbscan_diagonal_adjacency_and_singleton_core(spark):
    from minimel_spark.operators.geo import grid_dbscan

    rows = [(i, 1.5, 1.5) for i in range(5)]        # core cell (1,1)
    rows += [(10 + i, 2.5, 2.5) for i in range(5)]  # diagonal core (2,2)
    rows += [(20 + i, 9.5, 9.5) for i in range(5)]  # isolated core (9,9)
    pts = spark.createDataFrame(rows, "point_id long, x double, y double")
    out = {r["point_id"]: r for r in grid_dbscan(pts, eps=1.0, min_pts=5).collect()}
    # 8-neighborhood: the diagonal pair merges
    assert out[0]["cluster_id"] == out[10]["cluster_id"] == 100001
    # an isolated core cell is its own singleton cluster, never noise
    assert out[20]["is_core"] and out[20]["cluster_id"] == 900009
