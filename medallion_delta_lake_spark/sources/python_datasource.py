"""PySpark Python Data Source (Spark 4 DataSource API) over the
log-backed Delta engine: ``spark.read.format("mdls_delta")`` for batch
snapshots and ``spark.readStream.format("mdls_delta")`` for the
append-tailing streaming source — the standard-API face of
``sources/delta_log.py``, so the table plugs into any Spark job (or
pipeline definition) that speaks formats rather than this engine's
Python functions.

Scale shape: the driver handles O(files) metadata only; each input
partition is ONE data file, read on the executor with pyarrow and
emitted as Arrow record batches (the DataSource API's vectorized
path). Deletion vectors are resolved to row-index sets on the driver
(bounded by the engine's DV caps) and shipped inside the partition;
partition-column values rejoin as constants. Name-mode column mapping
resolves physical→logical on the executor; id-mode tables are routed
to :func:`delta_log.read_delta` (footer-driven resolution) instead.

The streaming reader follows delta-spark's source contract: offsets
are log versions, each microbatch emits the rows ADDED in
``(start, end]``; a data-changing remove (UPDATE/DELETE/MERGE) raises
unless ``skipChangeCommits`` is set, in which case the whole commit is
skipped; OPTIMIZE (dataChange=false) commits are silently ignored.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructField, StructType

FORMAT_NAME = "mdls_delta"


@dataclass
class _FilePartition(InputPartition):
    table_path: str
    rel_path: str
    partition_values: dict = field(default_factory=dict)
    dv_indexes: list = field(default_factory=list)
    physical_names: dict = field(default_factory=dict)  # logical→phys
    # change-feed extensions (readChangeFeed streaming): when
    # cdf_commit_version is set the partition emits CDF rows —
    # include_indexes (non-empty) selects EXACTLY those row indexes
    # (DV-diff deletes/restores) instead of subtracting dv_indexes;
    # cdf_change_type stamps the literal _change_type, or None for a
    # _change_data file that already carries the column
    cdf_change_type: str | None = None
    cdf_commit_version: int | None = None
    # commit time in epoch MICROSECONDS (delta_log._commit_timestamp
    # resolution: ICT → commitInfo.timestamp → file mtime), stamped
    # as the _commit_timestamp column — same contract as batch
    # table_changes and Delta's readChangeFeed
    cdf_commit_timestamp_us: int | None = None
    include_indexes: list = field(default_factory=list)


def _spark_to_arrow_schema(schema: StructType):
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_type

    return pa.schema(
        [
            pa.field(f.name, to_arrow_type(f.dataType), f.nullable)
            for f in schema.fields
        ]
    )


def _read_partition(part: _FilePartition, schema: StructType):
    """Executor-side file read → Arrow batches in the declared schema
    (physical→logical rename, partition constants, DV subtraction)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    target = _spark_to_arrow_schema(schema)
    tbl = pq.read_table(
        os.path.join(part.table_path, part.rel_path)
    )
    if part.include_indexes:
        keep = pc.is_in(
            pa.array(range(tbl.num_rows), type=pa.int64()),
            value_set=pa.array(
                part.include_indexes, type=pa.int64()
            ),
        )
        tbl = tbl.filter(keep)
    elif part.dv_indexes:
        keep = pc.invert(
            pc.is_in(
                pa.array(range(tbl.num_rows), type=pa.int64()),
                value_set=pa.array(part.dv_indexes, type=pa.int64()),
            )
        )
        tbl = tbl.filter(keep)
    cols = []
    for f in schema.fields:
        if f.name == "_commit_version" and (
            part.cdf_commit_version is not None
        ):
            cols.append(
                pa.array(
                    [part.cdf_commit_version] * tbl.num_rows,
                    type=pa.int64(),
                )
            )
            continue
        if f.name == "_change_type" and (
            part.cdf_change_type is not None
        ):
            cols.append(
                pa.array(
                    [part.cdf_change_type] * tbl.num_rows,
                    type=pa.string(),
                )
            )
            continue
        if f.name == "_commit_timestamp" and (
            part.cdf_commit_timestamp_us is not None
        ):
            at = target.field(f.name).type
            cols.append(
                pa.array(
                    [part.cdf_commit_timestamp_us] * tbl.num_rows,
                    type=pa.int64(),
                ).cast(at)
            )
            continue
        if f.name in part.partition_values:
            v = part.partition_values[f.name]
            at = target.field(f.name).type
            arr = pa.array([v] * tbl.num_rows).cast(at)
            cols.append(arr)
            continue
        phys = part.physical_names.get(f.name, f.name)
        at = target.field(f.name).type
        if phys in tbl.column_names:
            cols.append(tbl.column(phys).combine_chunks().cast(at))
        elif f.name in tbl.column_names and not any(
            p in tbl.column_names
            for ln, p in part.physical_names.items()
            if p != ln
        ):
            # pre-r9 cdc files staged LOGICAL column names under
            # name-mode column mapping; mirror the batch
            # table_changes fallback so batch and stream CDF agree.
            # The fallback fires ONLY when the file carries no
            # physical-name MARKER (a mapped physical column whose
            # physical name differs from its logical one — upgraded
            # tables keep physical == logical until a rename, so
            # identical pairs prove nothing): a physically-named
            # file missing this field's physical column means the
            # field genuinely has no data here — falling back by
            # logical name there misbinds after a rename + re-add
            # (old column renamed away, a new column re-using the
            # name — ADVICE r13)
            cols.append(tbl.column(f.name).combine_chunks().cast(at))
        else:  # column added after this file was written
            cols.append(pa.nulls(tbl.num_rows, type=at))
    out = pa.table(cols, schema=target)
    yield from out.to_batches(max_chunksize=1 << 16)


def _partitions_for(
    table_path: str, meta: dict, files: dict
) -> list[_FilePartition]:
    from medallion_delta_lake_spark.sources import (
        deletion_vectors as _dv,
    )
    from medallion_delta_lake_spark.sources.delta_log import (
        _column_mapping,
    )

    conf = (meta.get("configuration") or {})
    if conf.get("delta.columnMapping.mode", "none") == "id":
        raise NotImplementedError(
            "id-mode column mapping: use delta_log.read_delta "
            "(footer-driven field-id resolution)"
        )
    schema = StructType.fromJson(json.loads(meta["schemaString"]))
    if any("variant" in f.dataType.typeName() for f in schema.fields):
        raise NotImplementedError(
            "VARIANT columns: pyarrow cannot parse variant parquet "
            "footers — use delta_log.read_delta (Spark-native scan)"
        )
    mapping = _column_mapping(meta, schema)
    part_cols = meta.get("partitionColumns") or []
    phys = {c: mapping.get(c, c) for c in part_cols}
    out = []
    for rel, add in sorted(files.items()):
        pv_raw = add.get("partitionValues") or {}
        pv = {
            c: pv_raw.get(phys[c], pv_raw.get(c)) for c in part_cols
        }
        desc = add.get("deletionVector")
        idxs = (
            list(_dv.dv_row_indexes(table_path, desc)) if desc else []
        )
        out.append(
            _FilePartition(
                table_path=table_path,
                rel_path=rel,
                partition_values=pv,
                dv_indexes=idxs,
                physical_names=dict(mapping),
            )
        )
    return out


def _check_supported(meta: dict) -> None:
    """Refuse id-mode column mapping and VARIANT tables EAGERLY, at
    reader construction. This must NOT happen first inside
    ``partitions()``: the Python DS protocol treats a
    NotImplementedError from partitions() as "source is unpartitioned"
    and proceeds to ``read(None)`` — the refusal would be swallowed
    into a confusing executor crash (caught by
    tests/test_variant.py::test_python_datasource_refuses_variant_tables).
    """
    conf = (meta.get("configuration") or {})
    if conf.get("delta.columnMapping.mode", "none") == "id":
        raise NotImplementedError(
            "id-mode column mapping: use delta_log.read_delta "
            "(footer-driven field-id resolution)"
        )
    schema = StructType.fromJson(json.loads(meta["schemaString"]))
    if any("variant" in f.dataType.typeName() for f in schema.fields):
        raise NotImplementedError(
            "VARIANT columns: pyarrow cannot parse variant parquet "
            "footers — use delta_log.read_delta (Spark-native scan)"
        )


class _BatchReader(DataSourceReader):
    def __init__(self, options: dict, schema: StructType):
        from medallion_delta_lake_spark.sources.delta_log import (
            resolve_snapshot,
        )

        self._schema = schema
        self._path = options["path"]
        v = options.get("versionasof")
        snap = resolve_snapshot(
            self._path, version_as_of=int(v) if v is not None else None
        )
        self._meta = snap["meta"]
        self._files = snap["files"]
        self._pushed: list[tuple[str, str, object]] = []
        _check_supported(self._meta)

    def partitions(self):
        files = self._files
        if self._pushed:
            from medallion_delta_lake_spark.sources.delta_log import (
                _column_mapping,
                _file_can_skip,
            )

            schema = StructType.fromJson(
                json.loads(self._meta["schemaString"])
            )
            mapping = _column_mapping(self._meta, schema)
            phys_filters = [
                (mapping.get(c, c), op, val)
                for c, op, val in self._pushed
            ]
            phys_parts = [
                mapping.get(c, c)
                for c in (self._meta.get("partitionColumns") or [])
            ]
            files = {
                rel: add
                for rel, add in files.items()
                if not _file_can_skip(add, phys_filters, phys_parts)
            }
        return _partitions_for(self._path, self._meta, files)

    def read(self, partition: _FilePartition):
        yield from _read_partition(partition, self._schema)


class _PushdownBatchReader(_BatchReader):
    """File-skipping variant, selected by ``.option("pushdown",
    "true")``: comparison filters Spark offers at planning time prune
    the add-file list via the SAME logged min/max-stats +
    partitionValues test :func:`delta_log.read_delta` uses
    (``_file_can_skip``), so only surviving files become input
    partitions. EVERY filter is yielded back for Spark to re-evaluate
    — skipping is pure pruning, never a correctness dependency (a
    file with no logged stats simply isn't skipped).

    Kept separate from :class:`_BatchReader` because Spark 4.1 HARD
    FAILS any reader that overrides ``pushFilters`` while
    ``spark.sql.python.filterPushdown.enabled`` (default false) is
    off — pushdown must be an explicit opt-in, with the session conf
    and reader option flipped together."""

    def pushFilters(self, filters):
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
        )

        ops = {
            EqualTo: "=",
            GreaterThan: ">",
            GreaterThanOrEqual: ">=",
            LessThan: "<",
            LessThanOrEqual: "<=",
        }
        for f in filters:
            op = ops.get(type(f))
            if (
                op is not None
                and len(f.attribute) == 1
                and isinstance(f.value, (int, float, str))
                and not isinstance(f.value, bool)
            ):
                self._pushed.append((f.attribute[0], op, f.value))
            yield f  # Spark always re-applies; pruning only


class _StreamReader(DataSourceStreamReader):
    def __init__(self, options: dict, schema: StructType):
        from medallion_delta_lake_spark.sources.delta_log import (
            resolve_snapshot,
        )

        self._schema = schema
        self._path = options["path"]
        self._skip_change = (
            str(options.get("skipchangecommits", "false")).lower()
            == "true"
        )
        sv = options.get("startingversion")
        snap = resolve_snapshot(self._path)
        if snap["meta"] is not None:
            _check_supported(snap["meta"])
        if sv is not None:
            self._initial = int(sv) - 1
        else:
            self._initial = snap["version"]

    def initialOffset(self) -> dict:
        return {"version": self._initial}

    def latestOffset(self) -> dict:
        from medallion_delta_lake_spark.sources.delta_log import (
            resolve_snapshot,
        )

        return {
            "version": resolve_snapshot(self._path)["version"]
        }

    def partitions(self, start: dict, end: dict):
        from medallion_delta_lake_spark.sources.delta_log import (
            resolve_snapshot,
        )

        log = os.path.join(self._path, "_delta_log")
        parts: list[_FilePartition] = []
        # ONE log replay at the range start for the current metaData;
        # each commit's own metaData action (if any) folds in as the
        # loop advances — no per-commit full replay
        base_v = start["version"]
        meta = (
            resolve_snapshot(self._path, version_as_of=base_v)["meta"]
            if base_v >= 0
            else None
        )
        for v in range(base_v + 1, end["version"] + 1):
            commit = os.path.join(log, f"{v:020d}.json")
            if not os.path.exists(commit):
                raise FileNotFoundError(
                    f"commit {v} of {self._path} was cleaned; the "
                    "stream cannot resume before the earliest "
                    "retained commit"
                )
            with open(commit) as fh:
                actions = [
                    json.loads(ln) for ln in fh if ln.strip()
                ]
            for a in actions:
                if a.get("metaData"):
                    meta = a["metaData"]
            adds = [
                a["add"]
                for a in actions
                if a.get("add")
                and a["add"].get("dataChange", True)
            ]
            removes = [
                a["remove"]
                for a in actions
                if a.get("remove")
                and a["remove"].get("dataChange", True)
            ]
            if removes:
                if self._skip_change:
                    continue  # whole commit skipped, delta's contract
                raise RuntimeError(
                    f"commit {v} of {self._path} changed existing "
                    "data (UPDATE/DELETE/MERGE); the append-only "
                    "stream cannot represent it — set "
                    "skipChangeCommits to ignore such commits"
                )
            if not adds:
                continue
            parts.extend(
                _partitions_for(
                    self._path,
                    meta,
                    {a["path"]: a for a in adds},
                )
            )
        return parts

    def read(self, partition: _FilePartition):
        yield from _read_partition(partition, self._schema)

    def commit(self, end: dict) -> None:
        pass  # offsets are durable in the stream's own checkpoint


class _CdfStreamReader(DataSourceStreamReader):
    """Streaming CHANGE DATA FEED source
    (``option("readChangeFeed", "true")``): each microbatch emits the
    rows every newly-landed commit inserted and deleted — the table's
    columns plus ``_change_type`` / ``_commit_version`` — so a
    downstream consumer can MAINTAIN state (aggregate, replica, join)
    incrementally instead of re-reading snapshots. Offsets are commit
    versions (same contract as :class:`_StreamReader`); per-commit
    reconstruction follows delta_log.table_changes exactly:

    - dataChange:false commits (OPTIMIZE/cluster metadata shuffles)
      emit nothing;
    - a commit carrying ``cdc`` actions is read from its
      ``_change_data`` files INSTEAD of add/remove (full
      update_preimage/update_postimage fidelity);
    - brand-new files emit their live rows as ``insert``;
    - removed-and-not-re-added files emit their pre-commit live rows
      as ``delete``;
    - a file re-added with a grown deletion vector emits exactly the
      newly-flagged row indexes as ``delete`` (and a shrunk DV —
      RESTORE — the resurrected indexes as ``insert``).

    Without ``startingVersion`` the first batch emits the CURRENT
    snapshot's live rows as ``insert`` (stamped with the snapshot
    version) and subsequent batches tail new commits — Delta's
    streaming ``readChangeFeed`` default, so migrating users see the
    table contents instead of an empty initial batch. With
    ``startingVersion`` the feed starts exactly there (no snapshot).

    Everything driver-side is O(log metadata) per microbatch: ONE
    log replay at the range start, then each commit's actions fold
    into the running file-state incrementally."""

    def __init__(self, options: dict, schema: StructType):
        from medallion_delta_lake_spark.sources.delta_log import (
            _column_mapping,
            resolve_snapshot,
        )

        self._schema = schema
        self._path = options["path"]
        sv = options.get("startingversion")
        snap = resolve_snapshot(self._path)
        if snap["meta"] is not None:
            _check_supported(snap["meta"])
        # Output columns bind by the STREAM-SCHEMA-ERA mapping, not
        # each commit's: physical names are rename-stable, so the
        # stream's logical field always resolves to the same bytes
        # across old files, while a commit-era mapping would re-bind
        # a renamed-away column to a NEW same-named field (the
        # rename + re-add misbind, ADVICE r13). Partition VALUES
        # still decode per commit (physical keys are stable there
        # too).
        self._bind: dict = {}
        if snap["meta"] is not None:
            self._bind = _column_mapping(
                snap["meta"],
                StructType.fromJson(
                    json.loads(snap["meta"]["schemaString"])
                ),
            )
        if sv is not None:
            self._initial = {
                "version": int(sv) - 1,
                "snapshot_done": True,
            }
        else:
            # no startingVersion: first batch = current snapshot as
            # inserts (snapshot_done flips once the batch commits;
            # the flag rides the offset so a checkpoint restart
            # neither re-emits nor skips the snapshot)
            self._initial = {
                "version": snap["version"],
                "snapshot_done": False,
            }

    def initialOffset(self) -> dict:
        return dict(self._initial)

    def latestOffset(self) -> dict:
        from medallion_delta_lake_spark.sources.delta_log import (
            resolve_snapshot,
        )

        return {
            "version": resolve_snapshot(self._path)["version"],
            "snapshot_done": True,
        }

    def _meta_parts(self, meta: dict):
        from medallion_delta_lake_spark.sources.delta_log import (
            _column_mapping,
        )

        schema_v = StructType.fromJson(
            json.loads(meta["schemaString"])
        )
        mapping = _column_mapping(meta, schema_v)
        part_cols = meta.get("partitionColumns") or []
        phys = {c: mapping.get(c, c) for c in part_cols}
        return mapping, part_cols, phys

    def _pv(self, add: dict, part_cols, phys) -> dict:
        pv_raw = add.get("partitionValues") or {}
        return {
            c: pv_raw.get(phys[c], pv_raw.get(c)) for c in part_cols
        }

    def partitions(self, start: dict, end: dict):
        from medallion_delta_lake_spark.sources import (
            deletion_vectors as _dv,
        )
        from medallion_delta_lake_spark.sources.delta_log import (
            resolve_snapshot,
        )

        log = os.path.join(self._path, "_delta_log")
        parts: list[_FilePartition] = []
        base_v = start["version"]

        def dv_idx(desc) -> list:
            return (
                list(_dv.dv_row_indexes(self._path, desc))
                if desc
                else []
            )

        # ONE full log replay at the range start; every commit in the
        # range then folds its actions into the running file-state
        # (the old per-commit resolve_snapshot pair made this
        # O(range × log-size) driver work after long gaps)
        if base_v >= 0:
            snap0 = resolve_snapshot(
                self._path, version_as_of=base_v
            )
            prior, meta = dict(snap0["files"]), snap0["meta"]
        else:
            prior, meta = {}, None

        if not start.get("snapshot_done", True) and prior:
            # no startingVersion: emit the snapshot's live rows as
            # insert before tailing changes (Delta's streaming
            # readChangeFeed default)
            from medallion_delta_lake_spark.sources.delta_log import (
                _commit_timestamp,
            )

            ts0 = int(_commit_timestamp(log, base_v) * 1e6)
            mapping0, part_cols0, phys0 = self._meta_parts(meta)
            for rel, add in sorted(prior.items()):
                parts.append(
                    _FilePartition(
                        table_path=self._path,
                        rel_path=rel,
                        partition_values=self._pv(
                            add, part_cols0, phys0
                        ),
                        dv_indexes=dv_idx(
                            add.get("deletionVector")
                        ),
                        physical_names=dict(self._bind),
                        cdf_change_type="insert",
                        cdf_commit_version=base_v,
                        cdf_commit_timestamp_us=ts0,
                    )
                )

        for v in range(base_v + 1, end["version"] + 1):
            commit = os.path.join(log, f"{v:020d}.json")
            if not os.path.exists(commit):
                raise FileNotFoundError(
                    f"commit {v} of {self._path} was cleaned; the "
                    "change feed cannot resume before the earliest "
                    "retained commit"
                )
            with open(commit) as fh:
                actions = [
                    json.loads(ln) for ln in fh if ln.strip()
                ]
            for a in actions:
                if a.get("metaData"):
                    meta = a["metaData"]
            mapping, part_cols, phys = self._meta_parts(meta)
            all_adds = {
                a["add"]["path"]: a["add"]
                for a in actions
                if a.get("add")
            }
            all_removes = {
                a["remove"]["path"]: a["remove"]
                for a in actions
                if a.get("remove")
            }

            def _fold_file_state() -> None:
                # AFTER emission (which needs the pre-commit state),
                # apply ALL adds/removes — dataChange:false rewrites
                # (OPTIMIZE) change file composition too
                for rel in all_removes:
                    prior.pop(rel, None)
                prior.update(all_adds)

            from medallion_delta_lake_spark.sources.delta_log import (
                _commit_timestamp,
            )

            ts_us = int(_commit_timestamp(log, v) * 1e6)
            cdcs = [a["cdc"] for a in actions if a.get("cdc")]
            if cdcs:
                # cdc actions are the COMPLETE change description
                # for the commit (PROTOCOL.md CDF rule)
                for c in cdcs:
                    parts.append(
                        _FilePartition(
                            table_path=self._path,
                            rel_path=c["path"],
                            partition_values=self._pv(
                                c, part_cols, phys
                            ),
                            physical_names=dict(self._bind),
                            cdf_change_type=None,  # in the file
                            cdf_commit_version=v,
                            cdf_commit_timestamp_us=ts_us,
                        )
                    )
                _fold_file_state()
                continue
            adds = {
                rel: a
                for rel, a in all_adds.items()
                if a.get("dataChange", True)
            }
            removes = {
                rel: r
                for rel, r in all_removes.items()
                if r.get("dataChange", True)
            }

            for rel, add in sorted(adds.items()):
                pv = self._pv(add, part_cols, phys)
                if rel not in prior:
                    parts.append(
                        _FilePartition(
                            table_path=self._path,
                            rel_path=rel,
                            partition_values=pv,
                            dv_indexes=dv_idx(
                                add.get("deletionVector")
                            ),
                            physical_names=dict(self._bind),
                            cdf_change_type="insert",
                            cdf_commit_version=v,
                            cdf_commit_timestamp_us=ts_us,
                        )
                    )
                    continue
                old = set(
                    dv_idx(prior[rel].get("deletionVector"))
                )
                new = set(dv_idx(add.get("deletionVector")))
                for idxs, ct in (
                    (sorted(new - old), "delete"),
                    (sorted(old - new), "insert"),
                ):
                    if idxs:
                        parts.append(
                            _FilePartition(
                                table_path=self._path,
                                rel_path=rel,
                                partition_values=pv,
                                physical_names=dict(self._bind),
                                cdf_change_type=ct,
                                cdf_commit_version=v,
                                cdf_commit_timestamp_us=ts_us,
                                include_indexes=idxs,
                            )
                        )
            for rel, rem in sorted(removes.items()):
                if rel in adds or rel not in prior:
                    continue
                parts.append(
                    _FilePartition(
                        table_path=self._path,
                        rel_path=rel,
                        partition_values=self._pv(
                            prior[rel], part_cols, phys
                        ),
                        dv_indexes=dv_idx(
                            prior[rel].get("deletionVector")
                        ),
                        physical_names=dict(self._bind),
                        cdf_change_type="delete",
                        cdf_commit_version=v,
                        cdf_commit_timestamp_us=ts_us,
                    )
                )
            _fold_file_state()
        return parts

    def read(self, partition: _FilePartition):
        yield from _read_partition(partition, self._schema)

    def commit(self, end: dict) -> None:
        pass  # offsets are durable in the stream's own checkpoint


class MdlsDeltaDataSource(DataSource):
    """``format("mdls_delta")`` — batch + streaming reads and batch
    writes of the engine's log-backed Delta tables through Spark's
    standard source API. Options: ``path`` (required), ``versionAsOf``
    (batch read), ``startingVersion`` / ``skipChangeCommits``
    (streaming read), ``readChangeFeed`` (streaming read of the
    CHANGE FEED: rows gain ``_change_type`` / ``_commit_version`` /
    ``_commit_timestamp``, Delta's full readChangeFeed column set;
    see :class:`_CdfStreamReader`)."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def _cdf(self) -> bool:
        return (
            str(self.options.get("readchangefeed", "false")).lower()
            == "true"
        )

    def schema(self) -> StructType:
        from pyspark.sql.types import (
            LongType,
            StringType,
            StructField,
            TimestampType,
        )

        from medallion_delta_lake_spark.sources.delta_log import (
            resolve_snapshot,
        )

        meta = resolve_snapshot(self.options["path"])["meta"]
        base = StructType.fromJson(json.loads(meta["schemaString"]))
        if not self._cdf():
            return base
        return StructType(
            list(base.fields)
            + [
                StructField("_change_type", StringType(), True),
                StructField("_commit_version", LongType(), True),
                StructField("_commit_timestamp", TimestampType(), True),
            ]
        )

    def reader(self, schema: StructType) -> DataSourceReader:
        if str(self.options.get("pushdown", "")).lower() in (
            "true",
            "1",
        ):
            return _PushdownBatchReader(self.options, schema)
        return _BatchReader(self.options, schema)

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        if self._cdf():
            return _CdfStreamReader(self.options, schema)
        return _StreamReader(self.options, schema)

    def writer(self, schema: StructType, overwrite: bool):
        return _BatchWriter(self.options, schema, overwrite)

    def streamWriter(self, schema: StructType, overwrite: bool):
        return _StreamWriter(self.options, schema)


_REGISTERED: set[int] = set()


def register(spark) -> None:
    """Register the source on a session (idempotent — and CHEAP on
    repeat calls: `spark.dataSource.register` re-pickles and re-ships
    the Python source every time, ~1.5 s measured, so repeat callers
    in one session skip it via a per-session guard)."""
    key = id(spark._jsparkSession)
    if key in _REGISTERED:
        return
    spark.dataSource.register(MdlsDeltaDataSource)
    _REGISTERED.add(key)


# ----------------------------------------------------------- writer


@dataclass
class _WriteMessage(WriterCommitMessage):
    rel_path: str | None = None
    num_records: int = 0


class _BatchWriter(DataSourceWriter):
    """``df.write.format("mdls_delta")`` — executors stage one parquet
    file per task directly under the table path; the driver's
    ``commit`` turns the staged files into ONE atomic log commit
    (creation, append, or overwrite), exactly write_delta's division
    of labor through the standard writer API. ``abort`` unlinks the
    staged files, so a failed job leaves no live data. Partitioned
    and column-mapped targets are routed to
    :func:`delta_log.write_delta` (hive layout / physical staging)."""

    def __init__(self, options: dict, schema: StructType, overwrite: bool):
        from medallion_delta_lake_spark.sources import delta_log as dl

        self._path = options["path"]
        self._schema = schema
        self._overwrite = overwrite
        # fail fast on the driver, before any executor writes
        if dl.is_delta_table(self._path):
            snap = dl.resolve_snapshot(self._path)
            meta = snap["meta"]
            if meta.get("partitionColumns"):
                raise NotImplementedError(
                    "partitioned target: use delta_log.write_delta "
                    "(hive-layout staging)"
                )
            if (meta.get("configuration") or {}).get(
                "delta.columnMapping.mode", "none"
            ) != "none":
                raise NotImplementedError(
                    "column-mapped target: use delta_log.write_delta "
                    "(physical-name staging)"
                )
            table_schema = StructType.fromJson(
                json.loads(meta["schemaString"])
            )
            ours = [(f.name, f.dataType.simpleString()) for f in schema.fields]
            theirs = [
                (f.name, f.dataType.simpleString())
                for f in table_schema.fields
            ]
            if ours != theirs:
                raise ValueError(
                    f"schema mismatch writing to {self._path}: "
                    f"{ours} vs table {theirs}"
                )

    def write(self, iterator) -> _WriteMessage:
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        rows = list(iterator)
        if not rows:
            return _WriteMessage()
        target = _spark_to_arrow_schema(self._schema)
        arrays = [
            pa.array(
                [r[i] for r in rows], type=target.field(i).type
            )
            for i in range(len(self._schema.fields))
        ]
        tbl = pa.table(arrays, schema=target)
        os.makedirs(self._path, exist_ok=True)
        name = f"part-{uuid.uuid4().hex}.parquet"
        pq.write_table(tbl, os.path.join(self._path, name))
        return _WriteMessage(rel_path=name, num_records=tbl.num_rows)

    def commit(self, messages) -> None:
        import time as _time

        from medallion_delta_lake_spark.sources import delta_log as dl

        now_ms = int(_time.time() * 1000)
        adds = []
        for m in messages:
            if m is None or m.rel_path is None:
                continue
            full = os.path.join(self._path, m.rel_path)
            add = {
                "path": m.rel_path,
                "partitionValues": {},
                "size": os.path.getsize(full),
                "modificationTime": now_ms,
                "dataChange": True,
            }
            stats = dl._parquet_file_stats(full)
            if stats is not None:
                add["stats"] = stats
            adds.append({"add": add})

        if dl.is_delta_table(self._path):
            snap = dl.resolve_snapshot(self._path)

            def build(version: int) -> list[dict]:
                actions: list[dict] = []
                if self._overwrite:
                    for rel, old in sorted(snap["files"].items()):
                        actions.append(
                            {
                                "remove": dl._remove_action(
                                    rel, old, now_ms
                                )
                            }
                        )
                actions.extend(adds)
                actions.append(
                    {
                        "commitInfo": {
                            "operation": "WRITE",
                            "operationParameters": {
                                "mode": "Overwrite"
                                if self._overwrite
                                else "Append",
                                "source": FORMAT_NAME,
                            },
                        }
                    }
                )
                return actions

            dl._commit_version(
                self._path,
                build,
                read_version=snap["version"] if self._overwrite else None,
            )
            return

        import uuid as _uuid

        clean = StructType(
            [
                StructField(f.name, f.dataType, f.nullable)
                for f in self._schema.fields
            ]
        )
        meta = {
            "id": str(_uuid.uuid4()),
            "format": {"provider": "parquet", "options": {}},
            "schemaString": clean.json(),
            "partitionColumns": [],
            "configuration": {},
            "createdTime": now_ms,
        }

        def build0(version: int) -> list[dict]:
            return [
                {
                    "protocol": {
                        "minReaderVersion": 1,
                        "minWriterVersion": 2,
                    }
                },
                {"metaData": meta},
                *adds,
                {
                    "commitInfo": {
                        "operation": "WRITE",
                        "operationParameters": {
                            "mode": "ErrorIfExists",
                            "source": FORMAT_NAME,
                        },
                    }
                },
            ]

        dl._commit_version(self._path, build0)

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and m.rel_path is not None:
                try:
                    os.unlink(os.path.join(self._path, m.rel_path))
                except FileNotFoundError:
                    pass


# ---------------------------------------------------- stream writer


class _StreamWriter(DataSourceStreamWriter):
    """``df.writeStream.format("mdls_delta")`` — the streaming sink
    face: each microbatch's tasks stage one parquet per partition
    under the table path; the driver's ``commit(messages, batchId)``
    lands them as ONE log commit carrying a ``txn`` (SetTransaction)
    action ``{appId, version: batchId}``, which makes replays
    idempotent the way delta-spark's sink is: a restarted query
    re-running a committed batch sees ``last_txn_version >= batchId``
    and drops the duplicate (staged files unlinked, nothing
    committed). ``appId`` defaults to the option ``txnAppId`` or a
    path-stable constant; a checkpoint restart keeps the same id, so
    exactly-once holds across restarts. The target table must exist
    (create it with write_delta / the batch writer first) — matching
    delta-spark, the streaming sink never creates tables.

    Scale shape: executors never touch the log; the driver's commit is
    O(staged files) metadata. Appends only (streaming semantics);
    partitioned / column-mapped targets are routed away exactly like
    the batch writer."""

    def __init__(self, options: dict, schema: StructType):
        from medallion_delta_lake_spark.sources import delta_log as dl

        self._path = options["path"]
        self._schema = schema
        self._app_id = options.get(
            "txnappid", options.get("txnAppId")
        ) or f"mdls-stream-{os.path.basename(self._path.rstrip('/'))}"
        if not dl.is_delta_table(self._path):
            raise ValueError(
                f"{self._path} is not a Delta table: the streaming "
                "sink appends to existing tables only"
            )
        meta = dl.resolve_snapshot(self._path)["meta"]
        if meta.get("partitionColumns"):
            raise NotImplementedError(
                "partitioned target: use the foreachBatch sink "
                "(streaming/sink.py) with delta_log.write_delta"
            )
        if (meta.get("configuration") or {}).get(
            "delta.columnMapping.mode", "none"
        ) != "none":
            raise NotImplementedError(
                "column-mapped target: use the foreachBatch sink "
                "(streaming/sink.py) with delta_log.write_delta"
            )
        table_schema = StructType.fromJson(
            json.loads(meta["schemaString"])
        )
        ours = [(f.name, f.dataType.simpleString()) for f in schema.fields]
        theirs = [
            (f.name, f.dataType.simpleString())
            for f in table_schema.fields
        ]
        if ours != theirs:
            raise ValueError(
                f"schema mismatch streaming into {self._path}: "
                f"{ours} vs table {theirs}"
            )

    def write(self, iterator) -> _WriteMessage:
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        rows = list(iterator)
        if not rows:
            return _WriteMessage()
        target = _spark_to_arrow_schema(self._schema)
        arrays = [
            pa.array(
                [r[i] for r in rows], type=target.field(i).type
            )
            for i in range(len(self._schema.fields))
        ]
        tbl = pa.table(arrays, schema=target)
        name = f"part-{uuid.uuid4().hex}.parquet"
        pq.write_table(tbl, os.path.join(self._path, name))
        return _WriteMessage(rel_path=name, num_records=tbl.num_rows)

    def _unlink_staged(self, messages) -> None:
        for m in messages:
            if m is not None and m.rel_path is not None:
                try:
                    os.unlink(os.path.join(self._path, m.rel_path))
                except FileNotFoundError:
                    pass

    def commit(self, messages, batchId: int) -> None:
        import time as _time

        from medallion_delta_lake_spark.sources import delta_log as dl

        if dl.last_txn_version(self._path, self._app_id) >= batchId:
            # replayed batch after a restart: the log already has it
            self._unlink_staged(messages)
            return
        now_ms = int(_time.time() * 1000)
        adds = []
        for m in messages:
            if m is None or m.rel_path is None:
                continue
            full = os.path.join(self._path, m.rel_path)
            add = {
                "path": m.rel_path,
                "partitionValues": {},
                "size": os.path.getsize(full),
                "modificationTime": now_ms,
                "dataChange": True,
            }
            stats = dl._parquet_file_stats(full)
            if stats is not None:
                add["stats"] = stats
            adds.append({"add": add})

        def build(version: int) -> list[dict]:
            return [
                {"txn": {"appId": self._app_id, "version": batchId}},
                *adds,
                {
                    "commitInfo": {
                        "operation": "STREAMING UPDATE",
                        "operationParameters": {
                            "outputMode": "Append",
                            "queryId": self._app_id,
                            "epochId": batchId,
                            "source": FORMAT_NAME,
                        },
                    }
                },
            ]

        dl._commit_version(self._path, build)

    def abort(self, messages, batchId: int) -> None:
        self._unlink_staged(messages)
