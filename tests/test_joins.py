"""Join operator unit tests: spatial nn-assignment against a
brute-force geodesic check, and true as-of join edge cases."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from medallion_delta_lake_spark.operators import joins


def _haversine_km(lat1, lon1, lat2, lon2):
    rl1, rl2 = math.radians(lat1), math.radians(lat2)
    dlat = rl2 - rl1
    dlon = math.radians(lon2 - lon1)
    a = math.sin(dlat / 2) ** 2 + math.cos(rl1) * math.cos(rl2) * math.sin(
        dlon / 2
    ) ** 2
    return 2 * 6371.0 * math.asin(math.sqrt(a))


def test_nn_assign_spatial_matches_bruteforce(spark):
    labeled = [
        (59.4, 24.7, 0), (58.4, 26.7, 1), (59.4, 27.4, 2), (57.8, 26.0, 3)
    ]
    unlabeled = [(58.9, 25.6), (59.1, 27.0), (57.9, 24.9), (58.4, 26.7)]
    ldf = spark.createDataFrame(labeled, ["latitude", "longitude", "county_id"])
    udf = spark.createDataFrame(unlabeled, ["latitude", "longitude"])
    got = {
        (r.latitude, r.longitude): r.county_id
        for r in joins.nn_assign_spatial(
            udf, ldf, label_cols=["county_id"], id_cols=["latitude", "longitude"]
        ).collect()
    }
    for lat, lon in unlabeled:
        best = min(
            labeled, key=lambda s: (_haversine_km(lat, lon, s[0], s[1]), s[0], s[1])
        )
        assert got[(lat, lon)] == best[2], (lat, lon)


def test_asof_join_backward_semantics(spark):
    left = spark.createDataFrame(
        [(1, 10, "e1"), (1, 20, "e2"), (1, 5, "e0"), (2, 50, "e3")],
        ["k", "t", "eid"],
    ).select("k", F.col("t").cast("long").alias("t"), "eid")
    right = spark.createDataFrame(
        [(1, 10, "r10"), (1, 15, "r15"), (2, 60, "r60")], ["k", "t", "payload"]
    ).select("k", F.col("t").cast("long").alias("rt"), "payload")

    out = joins.asof_join(
        left, right, keys=["k"], left_ts="t", right_ts="rt",
        payload_cols=["payload"],
    )
    got = {r.eid: r.payload for r in out.collect()}
    assert got == {
        "e0": None,     # no right row at or before t=5
        "e1": "r10",    # exact-equal timestamp is eligible (<=)
        "e2": "r15",    # latest prior, not first
        "e3": None,     # right row exists only later (t=60 > 50)
    }
    assert out.count() == left.count()  # no fan-out, no row loss


def test_salted_join_matches_plain_join(spark):
    from medallion_delta_lake_spark.operators import skew
    from pyspark.sql import functions as F

    fact = spark.range(10_000).select(
        F.pmod(F.xxhash64("id"), F.lit(7)).alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.range(7).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("p")
    )
    plain = {(r.k, r.v, r.p) for r in fact.join(dim, "k").collect()}
    salted = {
        (r.k, r.v, r.p)
        for r in skew.salted_join(fact, dim, ["k"], salt_buckets=8).collect()
    }
    assert plain == salted

    # left join with unmatched keys preserved
    dim_partial = dim.filter(F.col("k") < 3)
    plain_l = {
        (r.k, r.v, r.p)
        for r in fact.join(dim_partial, "k", "left").collect()
    }
    salted_l = {
        (r.k, r.v, r.p)
        for r in skew.salted_join(
            fact, dim_partial, ["k"], salt_buckets=8, how="left"
        ).collect()
    }
    assert plain_l == salted_l


def test_asof_join_inline_and_probe_paths_agree(spark):
    from medallion_delta_lake_spark.operators import joins
    from pyspark.sql import functions as F

    left = spark.createDataFrame(
        [(1, 10, "a", 1.0), (1, 20, "b", 2.0), (1, 20, "b2", 2.5),
         (2, 15, "c", 3.0), (3, 5, "d", 4.0)],
        "k int, ts int, tag string, x double",
    )
    right = spark.createDataFrame(
        [(1, 10, 100), (1, 15, 150), (2, 1, 10), (2, 15, 20)],
        "k int, rts int, payload int",
    )
    kw = dict(keys=["k"], left_ts="ts", right_ts="rts",
              payload_cols=["payload"])
    inline = joins.asof_join(left, right, wide_threshold=99, **kw)
    probe = joins.asof_join(left, right, wide_threshold=0, **kw)
    cols = ["k", "ts", "tag", "x", "payload"]
    a = {tuple(r) for r in inline.select(*cols).collect()}
    b = {tuple(r) for r in probe.select(*cols).collect()}
    assert a == b
    # backward semantics spot checks: <= boundary and no-match NULL
    assert (1, 10, "a", 1.0, 100) in a      # equal ts takes the right row
    assert (1, 20, "b", 2.0, 150) in a      # latest earlier row
    assert (1, 20, "b2", 2.5, 150) in a     # duplicate (k, ts) fans out
    assert (3, 5, "d", 4.0, None) in a      # key with no right rows


def test_asof_join_matches_bruteforce_reference_randomized(spark):
    """Both asof shapes vs an O(n*m) python reference on randomized
    (seeded) data with duplicate timestamps, unmatched keys, and
    boundary-equal rows."""
    import random

    from medallion_delta_lake_spark.operators import joins

    rnd = random.Random(20260813)
    left_rows = [
        (rnd.randrange(6), rnd.randrange(50), i) for i in range(300)
    ]
    right_rows = list({
        (rnd.randrange(6), rnd.randrange(50)): None for _ in range(80)
    })
    right_rows = [(k, ts, k * 1000 + ts) for (k, ts) in right_rows]
    left = spark.createDataFrame(left_rows, "k int, ts int, rid int")
    right = spark.createDataFrame(right_rows, "k int, rts int, payload int")

    def brute(k, ts):
        best = None
        for rk, rts, p in right_rows:
            if rk == k and rts <= ts and (best is None or rts > best[0]):
                best = (rts, p)
        return best[1] if best else None

    expected = {(k, ts, rid, brute(k, ts)) for k, ts, rid in left_rows}
    for th in (99, 0):  # inline and probe shapes
        got = {
            (r.k, r.ts, r.rid, r.payload)
            for r in joins.asof_join(
                left, right, keys=["k"], left_ts="ts", right_ts="rts",
                payload_cols=["payload"], wide_threshold=th,
            ).collect()
        }
        assert got == expected
