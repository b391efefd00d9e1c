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
