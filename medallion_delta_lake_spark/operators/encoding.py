"""Feature-encoding operators for ML pipelines (SURVEY.md §2.11
extension surface — no reference counterpart; pre-built r10).

Two standard encoders, built engine-exact:

- ``target_encode_oof``: OUT-OF-FOLD mean-target encoding — the
  leakage-safe form of the single most effective categorical encoder.
  Naive target encoding leaks: a row's own label contributes to its
  feature. The OOF form assigns each row a deterministic fold by
  portable hash and encodes category c for fold f from every fold
  EXCEPT f:  enc(c, f) = (sum_c − sum_{c,f}) / (n_c − n_{c,f}).
  Integer target sums + one exact DECIMAL division (q_div) → the
  enc_q6 face is bit-identical in any engine.

- ``feature_hash``: the hashing trick — categorical values from any
  number of columns land in a fixed ``dim``-bucket index space via
  the portable h64, with a ±1 sign bit to keep collisions unbiased
  (Weinberger et al. 2009). Long/sparse output (row key, idx, val) —
  the shape a downstream trainer consumes and the ONLY shape that
  scales (a dense dim-array per row at dim=2^20 would be a
  storage-explosion).

Scale shape: target encoding is two grouped integer aggregations
(category, and category × fold — fold count is a small constant)
joined on the category key; feature hashing is a pure per-row
projection followed by an optional (key, idx) combine. No UDFs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from medallion_delta_lake_spark.functions.hashing import h64
from medallion_delta_lake_spark.operators.agg import q_div


def assign_fold(
    id_col: str, folds: int = 5, salt: str = "f0"
) -> F.Column:
    """Deterministic fold in [0, folds) by portable hash of the row
    id — same row → same fold on any engine/partitioning (the
    reproducibility the sampling module's doctrine requires)."""
    return F.pmod(
        h64(F.concat(F.lit(salt), F.col(id_col).cast("string"))),
        F.lit(folds),
    ).cast("int")


def target_encode_oof(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    id_col: str,
    folds: int = 5,
    salt: str = "f0",
    min_out_rows: int = 1,
) -> DataFrame:
    """Out-of-fold encoding TABLE: (cat, fold, n_out, sum_out,
    enc_q6) where n_out/sum_out aggregate the category's rows OUTSIDE
    the fold and enc_q6 = trunc(sum_out·10^6 / n_out) via exact
    DECIMAL division. Rows then join their (cat, fold) — the table is
    |categories|·folds rows, broadcastable at any source scale.

    ``target_col`` must be INTEGER-valued (quantize doubles to
    cents/micros first — the repo's standard float quarantine);
    folds with fewer than ``min_out_rows`` out-of-fold rows get NULL
    enc_q6 (callers fall back to the global mean)."""
    base = df.select(
        F.col(cat_col).alias("cat"),
        F.col(target_col).cast("bigint").alias("t"),
        assign_fold(id_col, folds, salt).alias("fold"),
    )
    per_cf = base.groupBy("cat", "fold").agg(
        F.count(F.lit(1)).alias("n_cf"),
        F.sum("t").alias("sum_cf"),
    )
    per_c = base.groupBy("cat").agg(
        F.count(F.lit(1)).alias("n_c"),
        F.sum("t").alias("sum_c"),
    )
    # every (cat, fold) pair, including folds the category never hit
    grid = per_c.crossJoin(
        F.broadcast(
            df.sparkSession.range(folds).select(
                F.col("id").cast("int").alias("fold")
            )
        )
    )
    joined = grid.join(per_cf, ["cat", "fold"], "left").select(
        "cat",
        "fold",
        (
            F.col("n_c") - F.coalesce(F.col("n_cf"), F.lit(0))
        ).alias("n_out"),
        (
            F.col("sum_c")
            - F.coalesce(F.col("sum_cf"), F.lit(0).cast("bigint"))
        ).alias("sum_out"),
    )
    # q_div needs num >= 0 for trunc==floor; emit sign separately
    sign = F.when(F.col("sum_out") < 0, F.lit(-1)).otherwise(F.lit(1))
    enc = F.when(
        F.col("n_out") >= min_out_rows,
        sign
        * q_div(
            F.abs(F.col("sum_out")).cast("decimal(38,0)"),
            F.col("n_out").cast("decimal(38,0)"),
            6,
        ),
    )
    return joined.withColumn("enc_q6", enc)


def feature_hash(
    df: DataFrame,
    cols: Sequence[str],
    id_col: str,
    dim: int = 1 << 18,
    salt: str = "fh0",
) -> DataFrame:
    """Hashing-trick features: one (id, idx, val) row per non-null
    input cell, idx = h64(salt:col:value) % dim, val = ±1 from the
    hash's next bit; repeated collisions within a row combine by
    sum. Column identity is part of the hash input, so 'country=US'
    and 'source=US' never collide by construction."""
    cells = F.explode(
        F.array(
            *[
                F.struct(
                    h64(
                        F.concat_ws(
                            ":",
                            F.lit(salt),
                            F.lit(c),
                            F.col(c).cast("string"),
                        )
                    ).alias("h"),
                    F.col(c).isNotNull().alias("ok"),
                )
                for c in cols
            ]
        )
    ).alias("cell")
    flat = (
        df.select(F.col(id_col).alias("row_id"), cells)
        .select("row_id", "cell.h", "cell.ok")
        .filter(F.col("ok"))
    )
    idx = F.pmod(F.col("h"), F.lit(dim)).cast("int")
    sign = F.when(
        F.shiftright(F.col("h"), 59).bitwiseAND(F.lit(1)) == 1,
        F.lit(1),
    ).otherwise(F.lit(-1))
    return (
        flat.select("row_id", idx.alias("idx"), sign.alias("val"))
        .groupBy("row_id", "idx")
        .agg(F.sum("val").cast("int").alias("val"))
        .filter(F.col("val") != 0)
    )
