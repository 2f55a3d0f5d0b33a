"""Z-order (Morton) clustering actually skips data for 2-D range
predicates — the payoff claim behind derive-morton-zorder + compact().

Two copies of the same (x, y) table are written: one round-robin
(every file spans the whole key space) and one compacted with
``sort_cols=["zkey"]`` (range-partitioned + sorted on the Morton key,
so each file covers a compact 2-D tile). The assertions check the two
mechanisms an engine uses to turn that layout into less IO:

1. file-level stats skipping (what Delta/Iceberg data skipping and
   any min/max file index does): the number of files whose per-file
   parquet [min, max] x/y envelope intersects a small query box must
   be strictly smaller on the z-ordered layout;
2. Spark's own parquet row-group pruning: the scan of the z-ordered
   table emits strictly fewer post-pushdown rows for the same
   predicate (pushed min/max filters skip whole row groups).
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from medallion_delta_lake_spark.functions.spatial import morton_key
from medallion_delta_lake_spark.sources.writers import compact

N = 200_000
SIDE = 1024  # x, y in [0, SIDE)
BOX = (100, 140, 600, 640)  # x_lo, x_hi, y_lo, y_hi — ~0.15% of the space


def _write_layouts(spark, tmp_path) -> tuple[str, str]:
    base = (
        spark.range(N)
        .select(
            F.pmod(F.xxhash64("id"), F.lit(SIDE)).alias("x"),
            F.pmod(F.xxhash64("id", F.lit("y")), F.lit(SIDE)).alias("y"),
            F.col("id").alias("payload"),
        )
        .withColumn("zkey", morton_key(F.col("x"), F.col("y"), 10))
    )
    rr = str(tmp_path / "round_robin")
    zo = str(tmp_path / "zorder")
    base.repartition(16).write.parquet(rr)
    base.write.parquet(zo)
    compact(spark, zo, target_files=16, sort_cols=["zkey"])
    return rr, zo


def _files_intersecting_box(path: str) -> tuple[int, int]:
    """(#files whose x/y min-max envelope intersects BOX, #files)."""
    x_lo, x_hi, y_lo, y_hi = BOX
    hits, total = 0, 0
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.read_metadata(f)
        cols = {
            md.schema.column(i).name: i for i in range(md.num_columns)
        }
        fx_lo = min(
            md.row_group(g).column(cols["x"]).statistics.min
            for g in range(md.num_row_groups)
        )
        fx_hi = max(
            md.row_group(g).column(cols["x"]).statistics.max
            for g in range(md.num_row_groups)
        )
        fy_lo = min(
            md.row_group(g).column(cols["y"]).statistics.min
            for g in range(md.num_row_groups)
        )
        fy_hi = max(
            md.row_group(g).column(cols["y"]).statistics.max
            for g in range(md.num_row_groups)
        )
        total += 1
        if fx_lo <= x_hi and fx_hi >= x_lo and fy_lo <= y_hi and fy_hi >= y_lo:
            hits += 1
    return hits, total


def _scan_rows_after_pushdown(spark, path: str) -> int:
    x_lo, x_hi, y_lo, y_hi = BOX
    df = spark.read.parquet(path).filter(
        (F.col("x") >= x_lo)
        & (F.col("x") <= x_hi)
        & (F.col("y") >= y_lo)
        & (F.col("y") <= y_hi)
    )
    df.collect()
    plan = df._jdf.queryExecution().executedPlan()
    stack, total = [plan], 0
    while stack:
        node = stack.pop()
        name = node.nodeName()
        if "Scan" in name:
            m = node.metrics()
            if m.contains("numOutputRows"):
                total += m.apply("numOutputRows").value()
        for i in range(node.children().size()):
            stack.append(node.children().apply(i))
        # AQE wraps the real plan; unwrap via executedPlan if present
        if name.startswith("AdaptiveSparkPlan"):
            stack.append(node.executedPlan())
    return total


def test_zorder_layout_skips_files_and_row_groups(spark, tmp_path):
    rr, zo = _write_layouts(spark, tmp_path)

    rr_hits, rr_total = _files_intersecting_box(rr)
    zo_hits, zo_total = _files_intersecting_box(zo)
    # round-robin: every file spans the whole space → nothing skippable
    assert rr_hits == rr_total
    # z-order: the 0.15% box must touch a strict minority of files
    assert zo_hits < zo_total
    assert zo_hits < rr_hits

    # same answer from both layouts
    x_lo, x_hi, y_lo, y_hi = BOX
    pred = f"x >= {x_lo} AND x <= {x_hi} AND y >= {y_lo} AND y <= {y_hi}"
    n_rr = spark.read.parquet(rr).filter(pred).count()
    n_zo = spark.read.parquet(zo).filter(pred).count()
    assert n_rr == n_zo > 0

    # Spark's row-group pruning reads strictly less of the z-ordered table
    rows_rr = _scan_rows_after_pushdown(spark, rr)
    rows_zo = _scan_rows_after_pushdown(spark, zo)
    assert rows_zo < rows_rr
