"""Spatial distance joins via grid bucketing.

The reference (gookit/validate) validates coordinates syntactically
(isLatitude/isLongitude, validators.go); a 100-TB pipeline also needs
the JOIN those columns feed: "every left point's right-side neighbors
within radius r". The naive form is a cross join — O(|L|·|R|) is
unrunnable at 10^9×10^9. The scale shape used here is the classic
grid-bucket equi-join:

* cell size = radius, cell id = (x div r, y div r): any two points
  within distance r are in the same cell or an 8-adjacent one;
* replicate ONE side into its 3×3 cell neighborhood (factor 9, on
  whichever side is smaller), shuffle BOTH sides once on the cell key,
  then filter candidate pairs by the EXACT integer squared distance.

So the only shuffle is an equi-join on (cx, cy) — Catalyst plans a
plain SortMergeJoin/ShuffledHashJoin and AQE's skew-join splitting
handles a hot cell (urban-density skew). No cross join, no UDF, all
comparisons are int64-exact (portable to any SQL oracle bit-for-bit).

Coordinate contract: integer, NON-NEGATIVE (micro-degrees or any
affine grid — callers offset signed coords first; integer `div`
truncates toward zero in both Spark and DuckDB, which would make the
cell at 0 double-width for signed input), and |coord| ≤ ~1.5e9 so the
squared-distance sum stays inside int64 (max 2·(3e9)² ≈ 1.8e19 would
overflow; 2·(2.1e9)² = 8.8e18 < 9.22e18 is the hard bound — radius
and coordinate range are validated against it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_COORD_MAX = 2_100_000_000  # |Δ|≤2·max ⇒ 2·Δ² ≤ 8.8e18 < int64 max


def grid_distance_join(
    left: DataFrame,
    right: DataFrame,
    radius: int,
    *,
    key: str = "k",
    x: str = "x",
    y: str = "y",
    replicate: str = "left",
) -> DataFrame:
    """All (a, b) pairs with a∈left, b∈right and squared Euclidean
    distance ≤ radius² — output columns ``a, b, dist2`` (int64).

    ``replicate`` names the side exploded into its 3×3 neighborhood
    (pick the smaller side: 9× its rows ride the shuffle; the other
    side shuffles once, unreplicated). Self-join use: pass the same
    frame twice and filter ``a < b`` downstream.
    """
    if radius <= 0:
        raise ValueError("grid_distance_join: radius must be positive")
    if radius > _COORD_MAX:
        raise ValueError("grid_distance_join: radius exceeds int64-safe bound")
    if replicate not in ("left", "right"):
        raise ValueError("grid_distance_join: replicate must be 'left' or 'right'")

    r2 = radius * radius

    def prep(df: DataFrame, kb: str, xn: str, yn: str) -> DataFrame:
        # lazy coordinate-contract guard (module docstring): 0 ≤ coord
        # ≤ _COORD_MAX, enforced with a diagnostic error instead of a
        # downstream ANSI overflow abort or silently wrong cell
        # geometry for negative coords; NULL coords keep their prior
        # behavior (NULL cell → dropped by the equi-join). assert_true
        # returns NULL for passing rows, so the filter keeps them all;
        # a filter cannot be pruned by the optimizer (r6 advisory).
        def _ok(c):
            col = F.col(c).cast("long")
            return col.isNull() | ((col >= 0) & (col <= F.lit(_COORD_MAX)))

        guarded = df.filter(
            F.assert_true(
                _ok(x) & _ok(y),
                F.concat(
                    F.lit(
                        "grid_distance_join: coordinate outside the "
                        f"non-negative int64-safe contract [0, {_COORD_MAX}]: "
                    ),
                    F.concat_ws(
                        ",", F.col(x).cast("string"), F.col(y).cast("string")
                    ),
                ),
            ).isNull()
        )
        return guarded.select(
            F.col(key).alias(kb),
            F.col(x).cast("long").alias(xn),
            F.col(y).cast("long").alias(yn),
            F.expr(f"CAST({x} AS BIGINT) div {radius}").alias("_cx"),
            F.expr(f"CAST({y} AS BIGINT) div {radius}").alias("_cy"),
        )

    lft = prep(left, "a", "_ax", "_ay")
    rgt = prep(right, "b", "_bx", "_by")

    # 3×3 neighborhood replication on one side: a literal 9-element
    # struct array exploded map-side (no join, no shuffle of its own).
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    if replicate == "left":
        lft = (
            lft.select("*", F.explode(offsets).alias("_o"))
            .withColumn("_cx", F.col("_cx") + F.col("_o.dx"))
            .withColumn("_cy", F.col("_cy") + F.col("_o.dy"))
            .drop("_o")
        )
    else:
        rgt = (
            rgt.select("*", F.explode(offsets).alias("_o"))
            .withColumn("_cx", F.col("_cx") + F.col("_o.dx"))
            .withColumn("_cy", F.col("_cy") + F.col("_o.dy"))
            .drop("_o")
        )

    dx = F.col("_ax") - F.col("_bx")
    dy = F.col("_ay") - F.col("_by")
    dist2 = (dx * dx + dy * dy).alias("dist2")
    return (
        lft.join(rgt, ["_cx", "_cy"])
        .filter(dx * dx + dy * dy <= F.lit(r2))
        .select("a", "b", dist2)
    )


def grid_density(
    df: DataFrame,
    cell: int,
    *,
    x: str = "x",
    y: str = "y",
    top_n: int = 20,
) -> DataFrame:
    """Densest ``top_n`` grid cells — the skew PRE-CHECK for
    :func:`grid_distance_join` (a cell holding 10^7 points makes the
    candidate filter O(cell²); this one aggregate tells the caller to
    shrink the cell size or route the hot region separately before
    launching the join). One groupBy + TakeOrderedAndProject; no
    global sort."""
    if cell <= 0:
        raise ValueError("grid_density: cell must be positive")
    return (
        df.groupBy(
            F.expr(f"CAST({x} AS BIGINT) div {cell}").alias("cx"),
            F.expr(f"CAST({y} AS BIGINT) div {cell}").alias("cy"),
        )
        .agg(F.count(F.lit(1)).alias("n_points"))
        .orderBy(F.desc("n_points"), "cx", "cy")
        .limit(top_n)
    )
