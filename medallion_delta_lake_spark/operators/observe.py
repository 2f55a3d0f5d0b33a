"""In-plan observability (SURVEY.md §2.11 extension surface — the
reference has no pipeline metrics at all; a production engine needs
row-count/null audits that do NOT cost extra actions).

``pyspark.sql.Observation`` attaches aggregate metrics to a plan; they
are computed as a side effect of whatever action the caller runs —
zero additional scans, unlike the count()-per-stage auditing the
reference's style implies. The helpers below standardize the audit
shape used by the medallion pipeline.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observed_audit(
    df: DataFrame,
    name: str,
    null_cols: Sequence[str] = (),
) -> tuple[DataFrame, Observation]:
    """Attach a standard audit observation: row count plus a null count
    per listed column. Read ``observation.get`` AFTER the caller's
    action; the metrics ride the existing job."""
    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    for c in null_cols:
        metrics.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"n_null_{c}")
        )
    return df.observe(obs, *metrics), obs
