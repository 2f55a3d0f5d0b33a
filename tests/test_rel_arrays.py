"""Array-native companions for agg-collect-array / array-funcs.

The registered queries project their array results through
array_join / a sequential fold so the driver's pandas canonicalizer
(which cannot hash list cells) gets scalar columns. These tests keep
the array-native shapes verified against DuckDB directly — the local
comparator sorts rows by repr, so list-valued cells compare fine here.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from medallion_delta_lake_spark.plans.registry import table
from tests.conftest import SF_SMOKE
from tests.oracle import canonical, run_oracle


def test_collect_array_native(spark):
    ev = table(spark, SF_SMOKE, "events")
    sdf = ev.groupBy("user_id").agg(
        F.sort_array(F.collect_list("event_type")).alias("types"),
        F.sort_array(F.collect_set("event_type")).alias("distinct_types"),
    )
    s_rows = [tuple(r) for r in sdf.collect()]
    o_cols, o_rows = run_oracle(
        """
        SELECT user_id, list_sort(list(event_type)) AS types,
               list_sort(list(DISTINCT event_type)) AS distinct_types
        FROM events GROUP BY user_id
        """,
        SF_SMOKE,
    )
    sc, sr = canonical(sdf.columns, s_rows)
    oc, orows = canonical(o_cols, o_rows)
    assert sc == oc
    assert sr == orows


def test_array_slice_transform_native(spark):
    e = table(spark, SF_SMOKE, "embeddings")
    sdf = e.select(
        "vec_id",
        F.transform(
            F.slice("embedding", 1, 4), lambda x: x.cast("double")
        ).alias("head4"),
    )
    s_rows = [tuple(r) for r in sdf.collect()]
    o_cols, o_rows = run_oracle(
        """
        SELECT vec_id,
               list_transform(embedding[1:4], x -> CAST(x AS DOUBLE))
                 AS head4
        FROM embeddings
        """,
        SF_SMOKE,
    )
    sc, sr = canonical(sdf.columns, s_rows)
    oc, orows = canonical(o_cols, o_rows)
    assert sc == oc
    assert sr == orows
