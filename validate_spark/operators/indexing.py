"""Layout / indexing operators: scalable global row numbering and
Z-order (Morton) clustering keys.

These are lake-layout primitives a validation+curation pipeline needs
around the reference's surface (gookit/validate has no dataset layer;
SURVEY.md §2.9 extends it): assigning a stable global index to 10^12
rows without a single-task global sort, and computing interleaved-bit
clustering keys so multi-dimensional range predicates prune files.

Scale notes are inline per function; both operators are pure
DataFrame plans (no Python in the row path).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def global_index(
    df: DataFrame,
    key: str | list[str],
    *,
    num_partitions: int | None = None,
    index_col: str = "global_idx",
) -> DataFrame:
    """Exact 1-based global row index ordered by ``key`` — WITHOUT the
    classic scale-killer ``row_number() OVER (ORDER BY key)`` (an empty
    PARTITION BY collapses the whole table onto ONE window task).

    Standard two-phase construction:

      1. ``repartitionByRange(key)`` + in-partition sort — one range
         exchange; partition p holds a contiguous key range and every
         partition < p holds strictly smaller keys.
      2. per-partition counts (tiny: one row per partition) → exclusive
         prefix sums → broadcast back; the final index is
         ``offset[pid] + local row_number`` where the row_number window
         partitions BY pid, so every window task handles exactly one
         partition's rows.

    The frame is persisted between the counts pass and the index pass:
    range boundaries are picked by sampling, so two independent
    evaluations of the same plan may split differently — the persisted
    frame pins one layout for both.  The tiny offsets window
    (``orderBy(_pid)`` with no partitionBy) runs over exactly
    ``num_partitions`` rows, never data rows.

    ``key`` may be one column name or a list (composite order); the
    combined key must be unique (the usual contract for a stable
    index) — ties would make the index nondeterministic across
    layouts, so callers append a unique id as the last component.
    Result = input columns + ``index_col``; caller unpersists via
    ``result.sparkSession.catalog.clearCache()`` or ignores (persist is
    MEMORY_AND_DISK on the ranged frame only).
    """
    keys = [key] if isinstance(key, str) else list(key)
    sc = df.sparkSession.sparkContext
    n_parts = num_partitions or sc.defaultParallelism
    ranged = (
        df.repartitionByRange(n_parts, *[F.col(c) for c in keys])
        .sortWithinPartitions(*keys)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    ranged.count()  # fix the sampled range boundaries before both passes

    sizes = ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
    off_w = (
        Window.orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = sizes.select(
        "_pid",
        F.coalesce(F.sum("_n").over(off_w), F.lit(0)).alias("_off"),
    )

    local_w = Window.partitionBy("_pid").orderBy(*keys)
    return (
        ranged.join(F.broadcast(offsets), "_pid")
        .withColumn(
            index_col,
            (F.col("_off") + F.row_number().over(local_w)).cast("long"),
        )
        .drop("_pid", "_off")
    )


def zorder_key(x: Column, y: Column, *, bits: int = 10) -> Column:
    """Morton (Z-order) interleave of two non-negative ints of ``bits``
    bits each: bit i of x lands at position 2i, bit i of y at 2i+1.

    Built as a chain of 2*bits NATIVE bitwise column ops (a Python-side
    loop emitting ``((v >> i) & 1) << pos`` terms OR-ed together) — the
    whole key stays inside whole-stage codegen; no higher-order
    function, no UDF.  Values are masked to ``bits`` bits first so
    out-of-range inputs can't silently collide across buckets.
    """
    mask = (1 << bits) - 1
    xm = x.cast("long").bitwiseAND(F.lit(mask))
    ym = y.cast("long").bitwiseAND(F.lit(mask))
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(xm, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(ym, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def zorder_bucket_profile(
    df: DataFrame,
    x: Column,
    y: Column,
    *,
    bits: int = 10,
    prefix_bits: int = 6,
) -> DataFrame:
    """Z-order layout audit: bucket rows by the top ``prefix_bits`` of
    their Morton key and profile each bucket's per-dimension extent.

    This is the evidence a lake optimizer wants before rewriting files
    in Z-order: if each bucket's (x_span, y_span) is small relative to
    the domain, min/max file statistics prune BOTH dimensions for range
    predicates — the point of Z-ordering (a single-column sort gives
    perfect pruning on one dimension and none on the other).

    One groupBy over 2^prefix_bits keys (map-side combine does the
    heavy lifting; output is bucket-count-sized).  The key itself is
    map-side codegen (see :func:`zorder_key`).
    """
    z = zorder_key(x, y, bits=bits)
    bucket = F.shiftright(z, 2 * bits - prefix_bits).alias("z_bucket")
    return (
        df.select(
            bucket,
            x.cast("long").alias("_x"),
            y.cast("long").alias("_y"),
        )
        .groupBy("z_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("_x").alias("x_min"),
            F.max("_x").alias("x_max"),
            F.min("_y").alias("y_min"),
            F.max("_y").alias("y_max"),
        )
        .withColumn("x_span", F.col("x_max") - F.col("x_min"))
        .withColumn("y_span", F.col("y_max") - F.col("y_min"))
    )


def compaction_plan(
    files: DataFrame,
    *,
    target_bytes: int,
    partition_col: str = "part",
    path_col: str = "path",
    bytes_col: str = "bytes",
) -> DataFrame:
    """Small-file compaction assignment: group each partition's files
    into rewrite batches of ~``target_bytes`` — the standing lake chore
    (streaming sinks and per-executor writers leave thousands of tiny
    files per partition; scans then pay one task + one open per file).

    Assignment is next-fit over files ordered (bytes DESC, path): a
    running ROWS-frame byte sum per partition, batch id =
    ``(cum - 1) DIV target`` — so every batch except a partition's last
    reaches the target, a file larger than the target gets its own
    batch, and the whole plan is ONE window whose state is a single
    long (never a buffered file list). Parallelism unit = table
    partition; file manifests are metadata-sized (10^6 files, not
    10^12 rows), so even a skewed partition's window is cheap. The
    DESC order packs big files first, which minimizes the tail batch's
    deficit. Deterministic: ties broken by path.

    Output: one row per file — (part, path, bytes, batch) with batch
    0-based per partition.
    """
    if target_bytes <= 0:
        raise ValueError("target_bytes must be positive")
    w = (
        Window.partitionBy(partition_col)
        .orderBy(F.col(bytes_col).desc(), F.col(path_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return files.select(
        F.col(partition_col).alias("part"),
        F.col(path_col).alias("path"),
        F.col(bytes_col).cast("long").alias("bytes"),
        F.sum(F.col(bytes_col).cast("long")).over(w).alias("_cum"),
    ).select(
        "part",
        "path",
        "bytes",
        # integer DIV (≡ DuckDB //): exact at any byte total, no float
        F.expr(f"(_cum - 1) DIV {int(target_bytes)}").alias("batch"),
    )


RRF_SCALE = 10**12


def rrf_fusion(
    df: DataFrame,
    key_col: str,
    signals: dict[str, str],
    *,
    k0: int = 60,
    num_partitions: int | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion over N quality signals (Cormack et al.
    SIGIR'09 — the standard way to ensemble incommensurable data-
    selection scores: quality classifier, link authority, dedup weight
    — without learning weights or normalizing distributions).

    Per signal, every row gets its GLOBAL rank (1 = highest signal
    value, ties by key) via :func:`global_index` on the composite
    (-signal, key) — i.e. the scale-safe two-phase range index, never
    a one-task ``row_number() OVER (ORDER BY ...)``. The fused score is

        rrf = sum over signals of  RRF_SCALE DIV (k0 + rank)

    kept int64-exact (RRF_SCALE = 10^12): selection thresholds on it
    are engine-portable with no float summation question.

    Cost: one range exchange + one key-partitioned join per signal —
    at N signals the corpus is exchanged N+? times, which is the
    honest price of N independent global rankings; signals are fused
    on co-partitioned ``key`` joins (the first join fixes the layout,
    later ones reuse it).

    Output: (key, rank_<name>... , rrf_score), one row per input row.
    """
    if not signals:
        raise ValueError("need at least one signal")
    fused = None
    for name, col in signals.items():
        ranked = global_index(
            df.select(
                F.col(key_col).alias("key"),
                (-F.col(col).cast("double")).alias("_neg"),
            ),
            ["_neg", "key"],
            num_partitions=num_partitions,
            index_col=f"rank_{name}",
        ).select("key", f"rank_{name}")
        fused = ranked if fused is None else fused.join(ranked, "key")
    score = None
    for name in signals:
        term = F.expr(f"{RRF_SCALE} DIV ({k0} + rank_{name})")
        score = term if score is None else score + term
    return fused.withColumn("rrf_score", score.cast("long"))


def partition_skipping_audit(
    df: DataFrame,
    part_col: str,
    value_col: str,
) -> DataFrame:
    """Data-skipping effectiveness audit: per partition, the value
    range a file footer would expose (min/max/count) and how many
    OTHER partitions' ranges intersect it — the number that says
    whether a range predicate on ``value_col`` can prune this layout.

    ``n_overlaps = 0`` everywhere → ranges are disjoint and a point
    predicate touches exactly one partition (the post-Z-order /
    time-partitioned ideal, `zorder_bucket_profile`'s single-column
    sibling); ``n_overlaps ≈ |partitions| - 1`` → every footer range
    spans the domain and min/max skipping prunes NOTHING (the classic
    "partitioned by the wrong column" layout). Run it with the
    intended partition expression BEFORE a rewrite to size the win.

    Plan: one hash aggregate collapses the table to |partitions| rows;
    the overlap self-join runs on that collapsed frame (quadratic in
    PARTITIONS, never rows — 10^4 partitions → 10^8 cheap interval
    comparisons, still partition-count-bounded; past that, sort the
    ranges and sweep). NULL values are excluded from ranges (footer
    stats ignore them; NULL-only partitions report NULL bounds and
    n_overlaps 0).
    """
    v = F.col(value_col)
    per = (
        df.groupBy(F.col(part_col).alias("part"))
        .agg(
            F.min(v).alias("vmin"),
            F.max(v).alias("vmax"),
            F.count(v).cast("long").alias("n_values"),
        )
    )
    a = per.select(
        F.col("part"), F.col("vmin"), F.col("vmax"), F.col("n_values")
    )
    b = per.select(
        F.col("part").alias("_p2"),
        F.col("vmin").alias("_min2"),
        F.col("vmax").alias("_max2"),
    )
    overlaps = (
        a.join(
            b,
            (F.col("part") != F.col("_p2"))
            & (F.col("vmin") <= F.col("_max2"))
            & (F.col("vmax") >= F.col("_min2")),
            "left",
        )
        .groupBy("part", "vmin", "vmax", "n_values")
        .agg(
            F.count(F.col("_p2")).cast("int").alias("n_overlaps")
        )
    )
    return overlaps


def layout_advisor(
    df: DataFrame,
    part_col: str,
    candidate_cols: list[str],
) -> DataFrame:
    """Sort/partition-key advisor: rank candidate layout columns by
    how much min/max data skipping a rewrite on the CURRENT partition
    scheme would give each of them — `partition_skipping_audit` run
    for every candidate in one scan, collapsed to one row per
    candidate. The table a compaction/Z-order planner (see
    `compaction_plan`, `zorder_bucket_profile`) reads to pick WHICH
    column to cluster by before paying for the rewrite.

    Per candidate: ``overlap_pairs`` = Σ over partitions of how many
    OTHER partitions' footer ranges intersect (0 = perfectly disjoint
    — a point predicate touches one partition; P·(P−1) = every range
    spans the domain, skipping prunes nothing), ``disjoint_parts`` =
    partitions overlapping none. All integers, ranked
    (overlap_pairs ASC, candidate ASC) — deterministic.

    Plan: ONE hash aggregate computes min/max/count for every
    candidate simultaneously (the `column_stats` multi-agg pattern —
    a 100-TB table is scanned once however many candidates are
    tried); each candidate's interval self-join then runs on the
    |partitions|-row collapsed frame (quadratic in partitions, never
    rows — q203's bound). NULLs excluded from ranges (footer
    semantics).
    """
    aggs = []
    for c in candidate_cols:
        v = F.col(c)
        aggs += [
            F.min(v).alias(f"_min_{c}"),
            F.max(v).alias(f"_max_{c}"),
            F.count(v).cast("long").alias(f"_n_{c}"),
        ]
    per = df.groupBy(F.col(part_col).alias("part")).agg(*aggs)
    per = per.localCheckpoint()  # |partitions| rows; reused per candidate

    outs = []
    for c in candidate_cols:
        a = per.select(
            "part",
            F.col(f"_min_{c}").alias("vmin"),
            F.col(f"_max_{c}").alias("vmax"),
        )
        b = per.select(
            F.col("part").alias("_p2"),
            F.col(f"_min_{c}").alias("_min2"),
            F.col(f"_max_{c}").alias("_max2"),
        )
        ov = (
            a.join(
                b,
                (F.col("part") != F.col("_p2"))
                & (F.col("vmin") <= F.col("_max2"))
                & (F.col("vmax") >= F.col("_min2")),
                "left",
            )
            .groupBy("part")
            .agg(F.count("_p2").cast("long").alias("_ov"))
        )
        outs.append(
            ov.agg(
                F.count(F.lit(1)).cast("long").alias("n_parts"),
                F.sum("_ov").cast("long").alias("overlap_pairs"),
                F.sum((F.col("_ov") == 0).cast("long"))
                .cast("long")
                .alias("disjoint_parts"),
            ).select(
                F.lit(c).alias("candidate"),
                "n_parts",
                "overlap_pairs",
                "disjoint_parts",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out.orderBy("overlap_pairs", "candidate")
