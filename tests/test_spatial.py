"""Grid-bucketed spatial distance join: the grid equi-join must equal
the brute-force cross join exactly (the grid is a candidate generator,
the int64 distance filter the verifier — zero recall loss by the
cell-adjacency argument), on both replication sides."""

import pytest
from pyspark.sql import functions as F

from validate_spark.operators.spatial import grid_distance_join, grid_density


def _points(spark, n, salt, span=1000):
    # md5-derived deterministic scatter, including cell-boundary points
    return spark.range(n).select(
        F.col("id").alias("k"),
        F.pmod(
            F.conv(
                F.substring(F.md5(F.concat_ws("_", F.col("id"), F.lit(salt))), 1, 8),
                16,
                10,
            ).cast("long"),
            F.lit(span),
        ).alias("x"),
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat_ws("_", F.col("id"), F.lit(salt + "y"))), 1, 8
                ),
                16,
                10,
            ).cast("long"),
            F.lit(span),
        ).alias("y"),
    )


def _brute(left, right, radius):
    l = left.select(F.col("k").alias("a"), F.col("x").alias("ax"), F.col("y").alias("ay"))
    r = right.select(F.col("k").alias("b"), F.col("x").alias("bx"), F.col("y").alias("by"))
    dx = F.col("ax") - F.col("bx")
    dy = F.col("ay") - F.col("by")
    return (
        l.crossJoin(r)
        .filter(dx * dx + dy * dy <= radius * radius)
        .select("a", "b", (dx * dx + dy * dy).alias("dist2"))
    )


def test_grid_join_equals_brute_force_both_sides(spark):
    left = _points(spark, 120, "L")
    right = _points(spark, 80, "R")
    truth = {tuple(r) for r in _brute(left, right, 70).collect()}
    assert truth, "fixture must produce at least one pair"
    for side in ("left", "right"):
        got = {
            tuple(r)
            for r in grid_distance_join(left, right, 70, replicate=side).collect()
        }
        assert got == truth


def test_grid_join_boundary_pairs_cross_cells(spark):
    # points in adjacent cells exactly radius apart must be found
    left = spark.createDataFrame([(1, 99, 50), (2, 0, 0)], "k long, x long, y long")
    right = spark.createDataFrame(
        [(10, 100, 50), (11, 199, 50)], "k long, x long, y long"
    )
    got = {
        (r.a, r.b, r.dist2)
        for r in grid_distance_join(left, right, 100).collect()
    }
    assert (1, 10, 1) in got  # 1 apart, straddling the cell-99|100 border
    assert (1, 11, 10000) in got  # exactly radius away
    assert all(p[2] <= 10000 for p in got)


def test_grid_join_validates_args(spark):
    pts = _points(spark, 4, "V")
    with pytest.raises(ValueError):
        grid_distance_join(pts, pts, 0)
    with pytest.raises(ValueError):
        grid_distance_join(pts, pts, 10, replicate="both")


def test_grid_density_top_cells(spark):
    df = spark.createDataFrame(
        [(x, y) for x in (0, 1, 2) for y in (0, 1)] + [(500, 500)],
        "x long, y long",
    )
    top = grid_density(df, 10, top_n=1).collect()
    assert top[0].cx == 0 and top[0].cy == 0 and top[0].n_points == 6
