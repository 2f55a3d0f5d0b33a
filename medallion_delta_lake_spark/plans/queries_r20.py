"""DRAFT round-20 query faces — NOT registered (cohorts r13..r19 are
queued ahead). Same proof protocol as every cohort since r10:
tests/test_r20_drafts.py proves each face compare_query-green at two
SFs before registration is ever considered.

- maintenance-rename-timetravel — ALTER ... RENAME COLUMN as a
  METADATA-ONLY commit (sources/delta_log.py:rename_column, which
  auto-enables name-mode column mapping and bumps the protocol), with
  BOTH sides of the schema timeline proven in one face: the current
  snapshot reads under the NEW logical name while every data file
  keeps its physical name untouched, and a version_as_of read of the
  pre-rename snapshot still serves the OLD name — schema time travel,
  the thing a plain-parquet rename (full rewrite) can never give.
- maintenance-check-constraint — ALTER TABLE ADD CONSTRAINT driven
  through enforcement: a violating append is refused ATOMICALLY
  (DeltaInvariantViolationError, zero rows land), a compliant one
  commits — the engine-level data-quality gate dq-constraint-check
  only audits.

r13 additions (VERDICT r12 #5 — engine capabilities with pytest
evidence but no driver face until now):

- maintenance-type-widening — ALTER COLUMN TYPE int→bigint as a
  metadata-only commit; narrow files served widened.
- scan-delta-idmode — id-mode column mapping: data columns resolved
  by parquet FIELD ID under deliberately scrambled physical names.
- maintenance-identity-allocate — GENERATED ALWAYS AS IDENTITY
  allocation across two appends: dense start/step blocks, high-water
  mark advancing in the same commit's metaData.
- maintenance-log-compaction — replay through a
  ``{start}.{end}.compacted.json`` after the source commit JSONs are
  gone.
- maintenance-fsck-repair — FSCK after an out-of-band data-file
  deletion: dangling add removed, rest of the table readable.
- maintenance-column-defaults — SET DEFAULT fills later appends that
  omit the column.
- maintenance-generated-columns — delta.generationExpression
  computed by the writer when the column is absent.
- scan-timestamp-as-of — timestamp time travel
  (``version_at_timestamp`` under ``read_delta(timestamp_as_of=)``).
"""

from __future__ import annotations

import hashlib as _hashlib
import os as _os
import shutil as _shutil
import tempfile as _tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from medallion_delta_lake_spark.plans.registry import table

R20_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
R20_ORACLES: dict[str, str] = {}


def draft(name: str, oracle: str):
    def deco(fn):
        R20_QUERIES[name] = fn
        R20_ORACLES[name] = oracle
        return fn

    return deco


def _scratch(sf_dir: str, name: str) -> str:
    tag = _hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    return _os.path.join(
        _tempfile.gettempdir(), f"mdls_r20_{tag}_{_os.getpid()}", name
    )


@draft(
    "maintenance-rename-timetravel",
    # both snapshots must serve the SAME data — current under the new
    # logical name, v0 under the old one; the labels pin which schema
    # answered
    oracle="""
    WITH sub AS (
      SELECT event_type,
             CAST(floor(value * 100) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL AND event_id % 2 = 0
    ),
    agg AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS total
      FROM sub GROUP BY event_type
    )
    SELECT 'current_new_name' AS snapshot, event_type, n, total
    FROM agg
    UNION ALL
    SELECT 'v0_old_name', event_type, n, total FROM agg
    """,
)
def maintenance_rename_timetravel_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """maintenance / metadata-only column rename + schema time travel
    — ALTER ... RENAME COLUMN under name-mode column mapping
    (sources/delta_log.py:rename_column — auto-enables mapping,
    physicalName pins every already-written file, protocol advances):
    the CURRENT snapshot must answer under the NEW logical name
    (amount_cents) and a version_as_of=0 read must still answer under
    the OLD name (cents) — with identical data, because no file was
    rewritten. On plain parquet this rename is a full-table rewrite;
    here it is one O(metadata) commit — the 100 TB schema-evolution
    story driven end to end. The face unions both labeled reads; the
    oracle serves the same aggregate twice."""
    from medallion_delta_lake_spark.sources import delta_log as dl

    p = _scratch(sf_dir, "rename_tt")
    _shutil.rmtree(p, ignore_errors=True)
    sub = (
        table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull() & (F.col("event_id") % 2 == 0))
        .select(
            "event_type",
            F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
        )
    )
    dl.write_delta(spark, sub.coalesce(2), p, mode="overwrite")
    dl.rename_column(p, "cents", "amount_cents")

    cur = (
        dl.read_delta(spark, p)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("amount_cents").cast("bigint").alias("total"),
        )
        .select(
            F.lit("current_new_name").alias("snapshot"),
            "event_type",
            "n",
            "total",
        )
    )
    old = (
        dl.read_delta(spark, p, version_as_of=0)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("cents").cast("bigint").alias("total"),
        )
        .select(
            F.lit("v0_old_name").alias("snapshot"),
            "event_type",
            "n",
            "total",
        )
    )
    return cur.unionByName(old)


# ------------------------------------------------------------------
# maintenance-check-constraint


@draft(
    "maintenance-check-constraint",
    # the violating append must be REFUSED atomically (no partial
    # rows), the compliant one must land; refusal count pinned
    oracle="""
    WITH sub AS (
      SELECT event_type,
             CAST(floor(value * 100) AS BIGINT) AS cents,
             event_id % 3 AS m
      FROM events WHERE value IS NOT NULL
    ),
    state AS (
      SELECT event_type, cents FROM sub
      WHERE (m = 0 AND cents > 500) OR (m = 1 AND cents > 500)
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(cents) AS BIGINT) AS cents_sum,
           CAST(1 AS BIGINT) AS n_refused
    FROM state GROUP BY event_type
    """,
)
def maintenance_check_constraint_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """maintenance / CHECK constraint enforcement — ALTER TABLE ADD
    CONSTRAINT (cents > 500) on a seeded table
    (sources/delta_log.py:add_check_constraint, writer protocol bumps
    to the checkConstraints version), then: an append containing
    violating rows is REFUSED ATOMICALLY (DeltaInvariantViolationError
    — zero rows of the batch land, not just the bad ones; the
    write-side scan names the violating expression), and a compliant
    append commits normally. The final table therefore holds exactly
    the seed + the compliant batch — any leak of the refused batch
    breaks the row-hash — with the refusal count pinned. This is the
    schema-level data-quality gate dq-constraint-check only AUDITS;
    here the engine blocks the write itself."""
    from medallion_delta_lake_spark.sources import delta_log as dl

    p = _scratch(sf_dir, "check_constraint")
    _shutil.rmtree(p, ignore_errors=True)
    sub = (
        table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
            (F.col("event_id") % 3).alias("m"),
        )
    )
    seed = sub.filter(
        (F.col("m") == 0) & (F.col("cents") > 500)
    ).drop("m")
    dl.write_delta(spark, seed.coalesce(2), p, mode="overwrite")
    dl.add_check_constraint(spark, p, "cents_floor", "cents > 500")
    n_refused = 0
    try:  # batch with violating rows — must be refused atomically
        dl.write_delta(
            spark,
            sub.filter(F.col("m") == 1).drop("m").coalesce(1),
            p,
            mode="append",
        )
    except dl.DeltaInvariantViolationError:
        n_refused = 1
    dl.write_delta(  # compliant batch — must land
        spark,
        sub.filter((F.col("m") == 1) & (F.col("cents") > 500))
        .drop("m")
        .coalesce(1),
        p,
        mode="append",
    )
    out = dl.read_delta(spark, p).groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("cents_sum"),
    )
    return out.withColumn(
        "n_refused", F.lit(n_refused).cast("bigint")
    )


# ------------------------------------------------------------------
# r13 additions: the pytest-only engine capabilities, driver-graded


def _cents_events(spark: SparkSession, sf_dir: str, mod: int) -> DataFrame:
    """Shared seed: integer cents + a deterministic slice key."""
    return (
        table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
            (F.col("event_id") % mod).alias("m"),
        )
    )


_CENTS_SQL = """
      SELECT event_type,
             CAST(floor(value * 100) AS BIGINT) AS cents,
             event_id % {mod} AS m
      FROM events WHERE value IS NOT NULL
"""


@draft(
    "maintenance-type-widening",
    # the rollup must cover BOTH the narrow-encoded seed files and the
    # wide append; cents_type pins that the logical schema widened
    oracle=f"""
    WITH sub AS ({_CENTS_SQL.format(mod=2)})
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(cents) AS BIGINT) AS total,
           'bigint' AS cents_type
    FROM sub GROUP BY event_type
    """,
)
def maintenance_type_widening_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """maintenance / type widening — ALTER TABLE ... ALTER COLUMN
    ... TYPE int→bigint as a METADATA-ONLY commit
    (sources/delta_log.py:alter_column_type — the typeWidening table
    feature: schemaString takes the wider type, the already-written
    NARROW parquet files are never rewritten and read back up-cast).
    The face seeds with INT cents, widens, appends a BIGINT batch,
    and rolls the whole table up: the sum crosses narrow and wide
    files, and cents_type pins the widened logical schema. On plain
    parquet this is a full rewrite; here O(metadata) — the same
    100 TB schema-evolution story as the rename face."""
    from medallion_delta_lake_spark.sources import delta_log as dl

    p = _scratch(sf_dir, "type_widening")
    _shutil.rmtree(p, ignore_errors=True)
    sub = _cents_events(spark, sf_dir, 2)
    seed = (
        sub.filter(F.col("m") == 0)
        .select("event_type", F.col("cents").cast("int").alias("cents"))
    )
    dl.write_delta(spark, seed.coalesce(2), p, mode="overwrite")
    dl.alter_column_type(p, "cents", "bigint")
    late = sub.filter(F.col("m") == 1).select("event_type", "cents")
    dl.write_delta(spark, late.coalesce(2), p, mode="append")
    df = dl.read_delta(spark, p)
    wide = df.schema["cents"].dataType.simpleString()
    return (
        df.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("cents").cast("bigint").alias("total"),
        )
        .withColumn("cents_type", F.lit(wide))
    )


@draft(
    "scan-delta-idmode",
    # the id-mode read must resolve scrambled physical names by
    # parquet field id; any mis-binding swaps whole columns and
    # breaks the hash
    oracle="""
    SELECT event_type,
           CAST(user_id % 50 AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
             AS cents_sum
    FROM events WHERE value IS NOT NULL
    GROUP BY event_type, user_id % 50
    """,
)
def scan_delta_idmode_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """scan / id-mode column mapping — the table layout modern Delta
    writers produce under ``delta.columnMapping.mode = id``: physical
    column names are opaque tokens and the parquet FIELD IDs are
    authoritative (sources/delta_log.py:read_delta resolves them from
    the footers; tests/test_delta_log_reader.py:
    test_id_mode_column_mapping_read is the pytest twin). The face
    builds a BOUNDED rollup (event_type × 50 user buckets), stages it
    as an id-mode table with deliberately scrambled physical names,
    and reads it back through log replay — a column mis-bound by
    name instead of id swaps cnt/cents_sum and breaks the hash.

    The staging is executor-side: Spark stamps PARQUET field ids
    from ``parquet.field.id`` column metadata
    (``spark.sql.parquet.fieldId.write.enabled``, default on), so no
    driver-side row materialization occurs anywhere in the face
    (VERDICT r13 #6 — the former bounded ``toPandas`` staging is
    gone and tests/test_no_driver_materialization.py lints the whole
    plans/operators surface stays that way)."""
    import json as _json
    import uuid as _uuid

    from medallion_delta_lake_spark.sources import delta_log as dl

    p = _scratch(sf_dir, "idmode")
    _shutil.rmtree(p, ignore_errors=True)
    roll = (
        table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy(
            "event_type",
            (F.col("user_id") % 50).cast("bigint").alias("bucket"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
            F.sum(F.floor(F.col("value") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents_sum"),
        )
    )
    phys = {
        "event_type": "c-aa11",
        "bucket": "c-bb22",
        "cnt": "c-cc33",
        "cents_sum": "c-dd44",
    }
    staged = roll.select(
        *[
            F.col(c).alias(
                phys[c], metadata={"parquet.field.id": i + 1}
            )
            for i, c in enumerate(phys)
        ]
    )
    # Field-id-carrying footers are the whole point of this staging:
    # pin the writer conf rather than relying on Spark's default
    # (true) — a session/env override to false would write
    # field-id-less parquet and surface as a hash mismatch far from
    # the cause (ADVICE r14). Restore whatever the session had.
    _FID = "spark.sql.parquet.fieldId.write.enabled"
    prev = spark.conf.get(_FID, None)
    spark.conf.set(_FID, "true")
    try:
        staged.coalesce(1).write.mode("overwrite").parquet(p)
    finally:
        if prev is None:
            spark.conf.unset(_FID)
        else:
            spark.conf.set(_FID, prev)
    _os.makedirs(_os.path.join(p, "_delta_log"), exist_ok=True)
    data_files = sorted(
        f
        for f in _os.listdir(p)
        if f.startswith("part-") and f.endswith(".parquet")
    )
    fields = [
        {
            "name": c,
            "type": "string" if c == "event_type" else "long",
            "nullable": True,
            "metadata": {
                "delta.columnMapping.id": i + 1,
                "delta.columnMapping.physicalName": phys[c],
            },
        }
        for i, c in enumerate(phys)
    ]
    meta = {
        "metaData": {
            "id": str(_uuid.uuid4()),
            "format": {"provider": "parquet", "options": {}},
            "schemaString": _json.dumps(
                {"type": "struct", "fields": fields}
            ),
            "partitionColumns": [],
            "configuration": {"delta.columnMapping.mode": "id"},
        }
    }
    actions = [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        meta,
    ] + [
        {
            "add": {
                "path": f,
                "partitionValues": {},
                "size": _os.path.getsize(_os.path.join(p, f)),
                "modificationTime": 0,
                "dataChange": True,
            }
        }
        for f in data_files
    ]
    with open(
        _os.path.join(p, "_delta_log", f"{0:020d}.json"), "w"
    ) as fh:
        fh.write("\n".join(_json.dumps(a) for a in actions) + "\n")
    return dl.read_delta(spark, p)


@draft(
    "maintenance-identity-allocate",
    # dense start/step allocation: block arithmetic over the two
    # batch sizes is fully determined even though the row→id mapping
    # inside a batch is partition-order dependent
    oracle=f"""
    WITH sub AS ({_CENTS_SQL.format(mod=2)}),
    c AS (
      SELECT CAST(SUM(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n1,
             CAST(SUM(CASE WHEN m = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n2
      FROM sub
    )
    SELECT 'b1' AS batch, n1 AS n,
           CAST(1000 + 3 AS BIGINT) AS id_min,
           CAST(1000 + 3 * n1 AS BIGINT) AS id_max,
           CAST(1000 * n1 + (3 * n1 * (n1 + 1)) // 2 AS BIGINT)
             AS id_sum
    FROM c
    UNION ALL
    SELECT 'b2', n2,
           CAST(1000 + 3 * n1 + 3 AS BIGINT),
           CAST(1000 + 3 * n1 + 3 * n2 AS BIGINT),
           CAST((1000 + 3 * n1) * n2 + (3 * n2 * (n2 + 1)) // 2
                AS BIGINT)
    FROM c
    """,
)
def maintenance_identity_allocate_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """maintenance / identity columns — GENERATED ALWAYS AS IDENTITY
    (sources/identity.py: create_identity_table +
    append_with_identity): two appends allocate DENSE start/step
    blocks (1000+3k) and advance delta.identity.highWaterMark in the
    SAME commit's metaData, so the second batch starts exactly where
    the first ended — no gaps, no collisions. Per batch the face
    pins n / min / max / sum of the allocated ids: block arithmetic
    is fully determined by the batch sizes even though which ROW gets
    which id is partition-order dependent (the same contract Delta
    gives). Allocation is per-partition offset + intra-partition
    index — no shuffle, no driver row loop — so it holds at any
    batch size."""
    from medallion_delta_lake_spark.sources import delta_log as dl
    from medallion_delta_lake_spark.sources import identity as ident

    p = _scratch(sf_dir, "identity_alloc")
    _shutil.rmtree(p, ignore_errors=True)
    sub = _cents_events(spark, sf_dir, 2)
    b1 = sub.filter(F.col("m") == 0).select(
        F.lit("b1").alias("batch"), "cents"
    )
    b2 = sub.filter(F.col("m") == 1).select(
        F.lit("b2").alias("batch"), "cents"
    )
    ident.create_identity_table(
        spark, p, b1.schema, "row_id", start=1003, step=3
    )
    ident.append_with_identity(spark, b1.coalesce(4), p)
    ident.append_with_identity(spark, b2.coalesce(4), p)
    return (
        dl.read_delta(spark, p)
        .groupBy("batch")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min("row_id").cast("bigint").alias("id_min"),
            F.max("row_id").cast("bigint").alias("id_max"),
            F.sum("row_id").cast("bigint").alias("id_sum"),
        )
    )


@draft(
    "maintenance-log-compaction",
    # after the source commit JSONs are deleted, the snapshot is only
    # reconstructible through the compaction file — a wrong
    # reconciliation (resurrected delete, lost append) breaks the hash
    oracle=f"""
    WITH sub AS ({_CENTS_SQL.format(mod=4)}),
    state AS (
      SELECT event_type, cents FROM sub
      WHERE (m IN (0, 1) AND cents >= 1000) OR m = 2 OR m = 3
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(cents) AS BIGINT) AS total
    FROM state GROUP BY event_type
    """,
)
def maintenance_log_compaction_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """maintenance / log compaction — PROTOCOL.md's
    ``{start}.{end}.compacted.json``: four commits (overwrite,
    append, DELETE-by-DV, append) are reconciled into ONE compaction
    file (sources/delta_log.py:write_log_compaction — per-path final
    disposition, last metaData/protocol), the four source commit
    JSONs are then REMOVED out-of-band, and a fifth append lands.
    Replay has no choice but to substitute the compaction file for
    the missing range — a wrong reconciliation (the deleted rows
    resurrecting, an append lost) breaks the hash. This is the
    O(1)-file replay fast path long-lived 100 TB tables need between
    checkpoints."""
    from medallion_delta_lake_spark.sources import delta_log as dl

    p = _scratch(sf_dir, "log_compaction")
    _shutil.rmtree(p, ignore_errors=True)
    sub = _cents_events(spark, sf_dir, 4)

    def slice_(k: int) -> DataFrame:
        return sub.filter(F.col("m") == k).select("event_type", "cents")

    dl.write_delta(spark, slice_(0).coalesce(2), p, mode="overwrite")
    dl.write_delta(spark, slice_(1).coalesce(2), p, mode="append")
    dl.delete_delta_log(spark, p, [("cents", "<", 1000)])
    dl.write_delta(spark, slice_(2).coalesce(2), p, mode="append")
    dl.write_log_compaction(p, 0, 3)
    log = _os.path.join(p, "_delta_log")
    for v in range(4):
        _os.remove(_os.path.join(log, f"{v:020d}.json"))
    dl.write_delta(spark, slice_(3).coalesce(2), p, mode="append")
    return (
        dl.read_delta(spark, p)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("cents").cast("bigint").alias("total"),
        )
    )


@draft(
    "maintenance-fsck-repair",
    # the dangling partition's rows must vanish and NOTHING else;
    # n_dangling pins the repair report
    oracle=f"""
    WITH sub AS ({_CENTS_SQL.format(mod=2)}),
    victim AS (SELECT MIN(event_type) AS v FROM sub)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(cents) AS BIGINT) AS total,
           CAST(1 AS BIGINT) AS n_dangling
    FROM sub WHERE event_type != (SELECT v FROM victim)
    GROUP BY event_type
    """,
)
def maintenance_fsck_repair_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """maintenance / FSCK REPAIR TABLE — recovery from an
    OUT-OF-BAND data-file deletion (sources/delta_log.py:
    repair_table): the table is partitioned by event_type (one file
    per partition — hash repartition by the column never splits a
    value), the lexicographically smallest partition's file is rm'd
    from storage, and every read would now throw. repair_table drops
    the dangling add as a remove commit, making the loss explicit
    and bounded; the face pins the surviving rollup AND the dangling
    count. The repair walk is O(files) driver metadata — the same
    scan VACUUM does — so it holds on wide tables."""
    from medallion_delta_lake_spark.sources import delta_log as dl

    p = _scratch(sf_dir, "fsck_repair")
    _shutil.rmtree(p, ignore_errors=True)
    sub = _cents_events(spark, sf_dir, 2).select("event_type", "cents")
    dl.write_delta(
        spark,
        sub.repartition("event_type"),
        p,
        mode="overwrite",
        partition_by=["event_type"],
    )
    snap = dl.resolve_snapshot(p)
    victim = min(
        add["partitionValues"]["event_type"]
        for add in snap["files"].values()
    )
    for rel, add in snap["files"].items():
        if add["partitionValues"]["event_type"] == victim:
            _os.remove(_os.path.join(p, rel))
    rep = dl.repair_table(p)
    out = (
        dl.read_delta(spark, p)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("cents").cast("bigint").alias("total"),
        )
    )
    return out.withColumn(
        "n_dangling", F.lit(len(rep["dangling"])).cast("bigint")
    )


@draft(
    "maintenance-column-defaults",
    # rows appended WITHOUT the column must carry the declared
    # default, seed rows keep their explicit value
    oracle=f"""
    WITH sub AS ({_CENTS_SQL.format(mod=2)}),
    state AS (
      SELECT event_type, cents,
             CASE WHEN m = 0 THEN 'seed' ELSE 'late' END AS src
      FROM sub
    )
    SELECT src,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(cents) AS BIGINT) AS total
    FROM state GROUP BY src
    """,
)
def maintenance_column_defaults_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """maintenance / column DEFAULT — ALTER COLUMN ... SET DEFAULT
    (sources/delta_log.py:set_column_default, the allowColumnDefaults
    writer feature): after the default is declared, an append that
    OMITS the column commits with the default filled in by the
    writer; the seed's explicit values are untouched (existing files
    are never rewritten — Delta's exact contract). The rollup by src
    pins both populations."""
    from medallion_delta_lake_spark.sources import delta_log as dl

    p = _scratch(sf_dir, "col_defaults")
    _shutil.rmtree(p, ignore_errors=True)
    sub = _cents_events(spark, sf_dir, 2)
    seed = sub.filter(F.col("m") == 0).select(
        "event_type", "cents", F.lit("seed").alias("src")
    )
    dl.write_delta(spark, seed.coalesce(2), p, mode="overwrite")
    dl.set_column_default(spark, p, "src", "'late'")
    late = sub.filter(F.col("m") == 1).select("event_type", "cents")
    dl.write_delta(spark, late.coalesce(2), p, mode="append")
    return (
        dl.read_delta(spark, p)
        .groupBy("src")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("cents").cast("bigint").alias("total"),
        )
    )


@draft(
    "maintenance-generated-columns",
    # the writer must COMPUTE bucket for the append that omits it —
    # identical to the seed's explicit expression
    oracle=f"""
    WITH sub AS ({_CENTS_SQL.format(mod=2)})
    SELECT cents % 7 AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(cents) AS BIGINT) AS total
    FROM sub GROUP BY cents % 7
    """,
)
def maintenance_generated_columns_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """maintenance / generated columns — ``delta.generationExpression``
    (writer v4; sources/delta_log.py:_apply_generated_columns): the
    seed declares bucket GENERATED AS ``cents % 7`` and supplies
    correct values; the append OMITS the column and the writer
    computes it from the expression recorded in the table metadata.
    Both populations land in one rollup keyed by the generated
    value — a writer that skipped generation would null/miss half
    the groups."""
    from medallion_delta_lake_spark.sources import delta_log as dl

    p = _scratch(sf_dir, "gen_cols")
    _shutil.rmtree(p, ignore_errors=True)
    sub = _cents_events(spark, sf_dir, 2)
    seed = sub.filter(F.col("m") == 0).select(
        "event_type",
        "cents",
        (F.col("cents") % 7).alias(
            "bucket",
            metadata={"delta.generationExpression": "cents % 7"},
        ),
    )
    dl.write_delta(spark, seed.coalesce(2), p, mode="overwrite")
    late = sub.filter(F.col("m") == 1).select("event_type", "cents")
    dl.write_delta(spark, late.coalesce(2), p, mode="append")
    return (
        dl.read_delta(spark, p)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("cents").cast("bigint").alias("total"),
        )
    )


@draft(
    "scan-timestamp-as-of",
    # the timestamp read must land on the PRE-append snapshot; the
    # current read sees both batches
    oracle=f"""
    WITH sub AS ({_CENTS_SQL.format(mod=2)}),
    seed AS (SELECT event_type, cents FROM sub WHERE m = 0)
    SELECT 'at_ts' AS snap, event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(cents) AS BIGINT) AS total
    FROM seed GROUP BY event_type
    UNION ALL
    SELECT 'current', event_type,
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(cents) AS BIGINT)
    FROM sub GROUP BY event_type
    """,
)
def scan_timestamp_as_of_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """scan / timestamp time travel — ``read_delta(timestamp_as_of=)``
    (sources/delta_log.py:version_at_timestamp: latest version whose
    commit time ≤ the requested instant, commit times resolved
    ICT → commitInfo.timestamp → mtime). The face commits a seed,
    captures a wall-clock instant, commits an append, then reads
    BOTH at the captured instant (must serve exactly the seed) and
    current (both batches) — unioned under labels so a
    version_at_timestamp off-by-one breaks the hash."""
    import time as _time

    from medallion_delta_lake_spark.sources import delta_log as dl

    p = _scratch(sf_dir, "ts_as_of")
    _shutil.rmtree(p, ignore_errors=True)
    sub = _cents_events(spark, sf_dir, 2)
    seed = sub.filter(F.col("m") == 0).select("event_type", "cents")
    late = sub.filter(F.col("m") == 1).select("event_type", "cents")
    dl.write_delta(spark, seed.coalesce(2), p, mode="overwrite")
    _time.sleep(0.05)
    t_mid = _time.time()
    _time.sleep(0.05)
    dl.write_delta(spark, late.coalesce(2), p, mode="append")

    def rollup(df: DataFrame, tag: str) -> DataFrame:
        return (
            df.groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n"),
                F.sum("cents").cast("bigint").alias("total"),
            )
            .select(F.lit(tag).alias("snap"), "event_type", "n", "total")
        )

    at_ts = rollup(
        dl.read_delta(spark, p, timestamp_as_of=t_mid), "at_ts"
    )
    cur = rollup(dl.read_delta(spark, p), "current")
    return at_ts.unionByName(cur)
