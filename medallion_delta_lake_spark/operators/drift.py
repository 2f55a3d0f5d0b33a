"""Distribution-drift monitors for production data pipelines.

A 100 TB training-data pipeline watches every ingest batch for drift
against a reference window: feature histograms shifting, categorical
mixes changing. The industry-standard statistics (PSI, KL, JS) are all
``ln``-based — and runtime ``ln`` is NOT bit-identical across engines
(measured on this machine: 9 267 of 300 000 values differ by 1 ulp
between JVM ``Math.log`` and DuckDB's libm ``ln``), so a log-based
statistic can never pass an exact cross-engine value-hash. This module
therefore ships the log-free members of the drift family, each
engine-exact under the repo float contract:

- :func:`binned_total_variation` — L1/total-variation distance between
  fixed-width value histograms (pure integer cross-multiplication, like
  the Benford screen).
- :func:`categorical_bhattacharyya` — Bhattacharyya coefficient /
  Hellinger distance between two categorical mixes (``sqrt`` is
  correctly rounded per IEEE-754 in both engines; the per-category
  terms are summed in an ORDER BY category cumulative window so the
  double additions happen in one deterministic order).

PSI/KL/JS remain one ``ln`` away for users who accept last-ulp drift:
both functions emit the exact per-bucket counts they would consume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def binned_total_variation(
    df: DataFrame,
    val_col: str,
    flag_col: str,
    bins: int = 10,
) -> DataFrame:
    """Total-variation distance between the ``flag_col``=false
    (reference/expected) and =true (current/actual) histograms of
    ``val_col``, over ``bins`` fixed-width buckets spanning the
    REFERENCE min/max (the production posture: bin edges freeze with
    the reference snapshot; current values clamp into the edge
    buckets, so novel out-of-range mass is still counted).

    Exactness: bucket assignment is a fixed IEEE chain
    (``floor((x−mn)/w)`` + integer clamps — bit-identical per row in
    any engine); the distance is integer cross-multiplication
    ``|cur·n_ref − ref·n_cur|`` in DECIMAL(38,0) (overflow-safe past
    int64 at petabyte row counts) with one closing double division.

    Scale shape: one min/max pass over the reference partition, then
    one ``bins``-row groupBy with map-side combine — two scans, no
    wide shuffle, broadcast scalars only.

    Output: one row per touched bucket ``(bin, ref_cnt, cur_cnt,
    gap, tv_distance)`` — ``gap`` the per-bucket |p̂−q̂| proportion
    difference, ``tv_distance`` the ½·Σ gap headline repeated on
    every row so the histogram and the scalar travel together.
    """
    flag = F.col(flag_col).cast("boolean")
    v = F.col(val_col).cast("double")
    base = df.filter(v.isNotNull()).select(
        v.alias("_x"), flag.alias("_cur")
    )
    edges = base.filter(~F.col("_cur")).agg(
        F.min("_x").alias("_mn"), F.max("_x").alias("_mx")
    )
    mn, mx = F.col("_mn"), F.col("_mx")
    w = (mx - mn) / F.lit(float(bins))
    raw = F.floor((F.col("_x") - mn) / w).cast("int")
    bucket = (
        F.when(mx == mn, F.lit(0))
        .otherwise(
            F.least(F.lit(bins - 1), F.greatest(F.lit(0), raw))
        )
        .alias("bin")
    )
    counts = (
        base.crossJoin(F.broadcast(edges))
        .select(bucket, "_cur")
        .groupBy("bin")
        .agg(
            F.count(F.when(~F.col("_cur"), 1)).alias("ref_cnt"),
            F.count(F.when(F.col("_cur"), 1)).alias("cur_cnt"),
        )
    )
    totals = counts.agg(
        F.sum("ref_cnt").alias("_nr"), F.sum("cur_cnt").alias("_nc")
    )
    dec = "decimal(19,0)"
    cross = (
        F.col("cur_cnt").cast(dec) * F.col("_nr").cast(dec)
        - F.col("ref_cnt").cast(dec) * F.col("_nc").cast(dec)
    )
    nr_d = F.col("_nr").cast("double")
    nc_d = F.col("_nc").cast("double")
    gapped = counts.crossJoin(F.broadcast(totals)).select(
        "bin",
        "ref_cnt",
        "cur_cnt",
        (F.abs(cross).cast("double") / (nr_d * nc_d)).alias("gap"),
        F.abs(cross).alias("_dev"),
        "_nr",
        "_nc",
    )
    tot = Window.partitionBy()
    return gapped.select(
        "bin",
        "ref_cnt",
        "cur_cnt",
        "gap",
        (
            F.sum("_dev").over(tot).cast("double")
            / (F.lit(2.0) * nr_d * nc_d)
        ).alias("tv_distance"),
    )


def categorical_bhattacharyya(
    df: DataFrame,
    cat_col: str,
    flag_col: str,
) -> DataFrame:
    """Bhattacharyya coefficient and Hellinger distance between the
    ``flag_col``=false (reference) and =true (current) categorical
    mixes of ``cat_col`` — the log-free answer to "did the class mix
    shift?" (Hellinger bounds total variation: H² ≤ TV ≤ H·√2).

    Exactness: per-category terms are
    ``sqrt((ref/n_ref)·(cur/n_cur))`` — two exact int→double
    divisions, one IEEE product, one correctly-rounded sqrt. The sum
    over categories is the one order-sensitive double reduction, so
    it runs inside a ``SUM() OVER (ORDER BY category ROWS UNBOUNDED
    PRECEDING)`` window: both engines add in identical category
    order, and since every term is ≥ 0 the global MAX of the running
    sum IS the in-order total. Hellinger closes as
    ``sqrt(1 − min(1, bc))``.

    Scale shape: one grouped count with map-side combine (k rows for
    k categories), a broadcast totals join, and a k-row window — the
    data-sized work is a single scan.

    Output one row: ``(bhattacharyya, hellinger, n_ref, n_cur,
    n_categories)``.
    """
    flag = F.col(flag_col).cast("boolean")
    counts = (
        df.filter(F.col(cat_col).isNotNull())
        .select(F.col(cat_col).alias("_cat"), flag.alias("_cur"))
        .groupBy("_cat")
        .agg(
            F.count(F.when(~F.col("_cur"), 1)).alias("_rc"),
            F.count(F.when(F.col("_cur"), 1)).alias("_cc"),
        )
    )
    totals = counts.agg(
        F.sum("_rc").alias("_nr"), F.sum("_cc").alias("_nc")
    )
    term = F.sqrt(
        (F.col("_rc").cast("double") / F.col("_nr").cast("double"))
        * (F.col("_cc").cast("double") / F.col("_nc").cast("double"))
    )
    seq = (
        Window.orderBy("_cat")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = counts.crossJoin(F.broadcast(totals)).select(
        F.sum(term).over(seq).alias("_bc_run"),
        "_nr",
        "_nc",
    )
    bc = F.max("_bc_run")
    bc_capped = F.least(F.lit(1.0), bc)
    return running.groupBy().agg(
        bc.alias("bhattacharyya"),
        F.sqrt(F.lit(1.0) - bc_capped).alias("hellinger"),
        F.max("_nr").alias("n_ref"),
        F.max("_nc").alias("n_cur"),
        F.count(F.lit(1)).alias("n_categories"),
    )
