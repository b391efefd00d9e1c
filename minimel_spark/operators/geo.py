"""Geospatial linkage: grid-cell-blocked distance self-join.

The standard scale pattern for "find all record pairs within r km"
(spatial ER blocking, POI conflation, address deduplication): map every
record to a fixed lat/lon grid cell of side >= the radius, replicate ONE
side of the join to its 3x3 cell neighborhood (with longitude wraparound),
equi-join on the cell key, then filter by exact haversine distance. Every
qualifying pair shares the home cell of one record with exactly one
neighborhood replica of the other, so the join is complete and
duplicate-free by construction — no theta join, no cross join, one
shuffle on the cell key with a bounded 9x replication of one side.

Correctness of the blocking (no pair within the radius escapes the 3x3
neighborhood) requires the cell side to be at least the radius expressed
in degrees at every record's latitude; ``grid_distance_join`` enforces
the latitude bound and, when the caller declares ``max_abs_lat``, the
longitude bound too (degrees of longitude shrink by cos(lat)).
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

EARTH_RADIUS_KM = 6371.0088
_KM_PER_DEG_LAT = 110.574
_KM_PER_DEG_LON_EQ = 111.320


def haversine_km(lat_a: Column, lon_a: Column, lat_b: Column, lon_b: Column) -> Column:
    """Great-circle distance in km (haversine; clamped sqrt argument so
    antipodal rounding can never NaN). Pure JVM math — the same formula
    the oracle replays in SQL."""
    sa = F.sin(F.radians(lat_b - lat_a) / 2)
    so = F.sin(F.radians(lon_b - lon_a) / 2)
    cc = F.cos(F.radians(lat_a)) * F.cos(F.radians(lat_b))
    return (
        F.lit(2.0)
        * F.lit(EARTH_RADIUS_KM)
        * F.asin(F.sqrt(F.least(sa * sa + cc * so * so, F.lit(1.0))))
    )


def grid_distance_join(
    records: DataFrame,
    radius_km: float,
    cell_deg: float,
    lat_col: str = "lat",
    lon_col: str = "lon",
    id_col: str = "rec_id",
    max_abs_lat: float | None = None,
) -> DataFrame:
    """All record pairs within ``radius_km``: ``(id_a, id_b, distance_km)``
    with ``id_a < id_b``, found via grid blocking + exact haversine filter.

    ``cell_deg`` is the grid cell side in degrees. Completeness bounds
    (raise, don't silently drop pairs): ``cell_deg`` must cover the radius
    in latitude degrees always, and in longitude degrees at
    ``max_abs_lat`` when the caller declares one (records beyond a
    declared ``max_abs_lat`` would make the 3x3 neighborhood lossy — the
    caller owns that contract, exactly like ``max_pairs_per_block`` in
    blocking.py owns its cap).

    Scale: one projection per side (cell key arithmetic), a 9x explode of
    the right side, one equi-join shuffle on the cell key, per-row trig.
    Nothing quadratic; skew is bounded by cell occupancy (pick
    ``cell_deg`` near the radius, not far above it)."""
    if radius_km <= 0 or cell_deg <= 0:
        raise ValueError(
            f"radius_km and cell_deg must be > 0, got {radius_km}, {cell_deg}"
        )
    if cell_deg < radius_km / _KM_PER_DEG_LAT:
        raise ValueError(
            f"cell_deg={cell_deg} cannot cover radius_km={radius_km} in "
            f"latitude (needs >= {radius_km / _KM_PER_DEG_LAT:.4f})"
        )
    if max_abs_lat is not None:
        if not 0 <= max_abs_lat < 90:
            raise ValueError(f"max_abs_lat must be in [0, 90), got {max_abs_lat}")
        need = radius_km / (_KM_PER_DEG_LON_EQ * math.cos(math.radians(max_abs_lat)))
        if cell_deg < need:
            raise ValueError(
                f"cell_deg={cell_deg} cannot cover radius_km={radius_km} in "
                f"longitude at |lat|={max_abs_lat} (needs >= {need:.4f})"
            )
    nx = int(math.ceil(360.0 / cell_deg))
    cx = F.floor((F.col(lon_col) + 180.0) / cell_deg).cast("long")
    cy = F.floor((F.col(lat_col) + 90.0) / cell_deg).cast("long")
    left = records.select(
        F.col(id_col).alias("id_a"),
        F.col(lat_col).alias("_lat_a"),
        F.col(lon_col).alias("_lon_a"),
        F.concat_ws(":", cy, F.pmod(cx, F.lit(nx))).alias("_cell"),
    )
    right = (
        records.select(
            F.col(id_col).alias("id_b"),
            F.col(lat_col).alias("_lat_b"),
            F.col(lon_col).alias("_lon_b"),
            cx.alias("_cx"),
            cy.alias("_cy"),
        )
        .withColumn("_dy", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .withColumn("_dx", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .select(
            "id_b",
            "_lat_b",
            "_lon_b",
            F.concat_ws(
                ":",
                F.col("_cy") + F.col("_dy"),
                F.pmod(F.col("_cx") + F.col("_dx"), F.lit(nx)),
            ).alias("_cell"),
        )
    )
    dist = haversine_km(
        F.col("_lat_a"), F.col("_lon_a"), F.col("_lat_b"), F.col("_lon_b")
    )
    return (
        left.join(right, "_cell")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", dist.alias("distance_km"))
        .where(F.col("distance_km") <= radius_km)
    )


def grid_dbscan(
    points: DataFrame,
    eps: float,
    min_pts: int,
    x_col: str = "x",
    y_col: str = "y",
    id_col: str = "point_id",
    max_iter: int = 20,
) -> DataFrame:
    """Cell-granular density clustering — the grid relaxation of DBSCAN
    (the cell-based family: ρ-approximate DBSCAN, Gan & Tao SIGMOD 2015):
    space is cut into eps-sized cells, a cell is CORE when it holds at
    least ``min_pts`` points, core cells connect to their 8-neighborhood
    core cells, clusters are the connected components of that core-cell
    graph, and every point inherits its cell's cluster (points in
    non-core cells are noise: ``cluster_id`` NULL). Cell granularity is
    the documented approximation: two points in the same cell are always
    co-clustered (distance ≤ eps·√2), adjacent-cell points may be up to
    2·eps·√2 apart — the trade every distributed DBSCAN makes to avoid
    point-level neighborhood queries.

    Scale: one cell rollup (map-side combinable), adjacency via each
    core cell EMITTING its 9 neighbor keys and equi-joining — never a
    spatial self-join — and components over the core-CELL graph (orders
    of magnitude smaller than the point set) through the same
    large-star/small-star loop as every other clustering here. Points
    then take one broadcast-or-shuffle join back.

    Coordinates must be non-negative with cx, cy < 100000 after
    eps-scaling (cell ids pack into one long); shift/scale upstream if
    needed. Output: ``(point_id, cell_id, is_core, cluster_id)`` —
    cluster_id = the component's minimum cell id, NULL for noise.
    """
    from .cluster import connected_components

    if eps <= 0:
        raise ValueError(f"eps must be > 0, got {eps}")
    if min_pts < 1:
        raise ValueError(f"min_pts must be >= 1, got {min_pts}")
    p = points.select(
        F.col(id_col),
        F.floor(F.col(x_col) / eps).cast("long").alias("_cx"),
        F.floor(F.col(y_col) / eps).cast("long").alias("_cy"),
    )
    cell = (F.col("_cx") * 100000 + F.col("_cy")).alias("cell_id")
    p = p.select(F.col(id_col), "_cx", "_cy", cell)
    counts = p.groupBy("cell_id", "_cx", "_cy").agg(
        F.count(F.lit(1)).alias("_n")
    )
    core = counts.where(F.col("_n") >= min_pts).select("cell_id", "_cx", "_cy")
    nbr_keys = F.array(
        *[
            F.concat_ws(
                ":",
                (F.col("_cx") + dx).cast("string"),
                (F.col("_cy") + dy).cast("string"),
            )
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    emits = core.select(
        F.col("cell_id").alias("_a"), F.explode(nbr_keys).alias("_k")
    )
    selves = core.select(
        F.col("cell_id").alias("_b"),
        F.concat_ws(
            ":", F.col("_cx").cast("string"), F.col("_cy").cast("string")
        ).alias("_k"),
    )
    edges = (
        emits.join(selves, "_k")
        .where(F.col("_a") != F.col("_b"))
        .select(F.col("_a").alias("src"), F.col("_b").alias("dst"))
    )
    comp = connected_components(edges, max_iter=max_iter)
    assigned = (
        core.join(
            comp.withColumnRenamed("node", "cell_id"), "cell_id", "left"
        )
        # a core cell with no core neighbor is its own singleton cluster
        .select(
            "cell_id",
            F.coalesce("component", "cell_id").alias("cluster_id"),
        )
    )
    return (
        p.join(assigned, "cell_id", "left")
        .select(
            F.col(id_col),
            "cell_id",
            F.col("cluster_id").isNotNull().alias("is_core"),
            "cluster_id",
        )
    )
