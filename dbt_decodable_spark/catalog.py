"""Engine catalog: streams, pipelines, and the declarative lifecycle — the
Spark-native analogue of the reference's adapter + control plane
(``dbt/adapters/decodable/impl.py:197-660``, ``decodable/client/client.py``).

Entity model (SURVEY §1.1):

- **stream** — named relation with a :class:`StreamSchema`; materialized as a
  Spark view (in-memory) or parquet table (``warehouse_dir`` set). Streams
  are the only relation kind (``impl.py:366-380``).
- **pipeline** — ``INSERT INTO <sink> <select>`` transformation
  (``impl.py:690-692``); activating it runs the insert (batch) or starts a
  StreamingQuery (streaming layer).
- **connection** — (connector, source|sink) binding to a stream with its own
  activate/deactivate lifecycle (``decodable/client/api.py:36-48``,
  ``client.py:455-491``); the seed path creates a REST source connection and
  posts stringified events through it (``impl.py:502-574``).
- namespace prefixing: every entity name gets ``<namespace>__``
  (``dbt/include/decodable/macros/adapters.sql:17-28``).

Lifecycle semantics mirrored file:line by file:line:

- ``apply`` + dry-run diff → per-resource result ∈ {created, updated,
  unchanged} (``client.py:510-529``, ``impl.py:402-417``),
- cascade drop: deactivate+delete the stream's pipeline, then recursively
  delete pipelines *sourcing from* the stream, then the stream itself
  (``impl.py:197-257``),
- rename: rename stream + pipeline and rewrite ``INSERT INTO``/``FROM``
  references in dependent pipeline SQL (``impl.py:277-352, 694-701``) — done
  here at the catalog level, not by string replace,
- truncate: keep schema, drop rows (``impl.py:259-275``),
- run-operations: ``stop_pipelines``, ``delete_pipelines``,
  ``delete_streams``, ``cleanup``, ``count_resources``
  (``dbt/include/decodable/macros/operations.sql:17-127``).
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import re
import shutil
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession, functions as F

from dbt_decodable_spark.dialect import normalize
from dbt_decodable_spark.schema import StreamSchema


class CatalogError(ValueError):
    pass


def _advance_stream_offsets(spark, src_path: str, schema, ckpt: str) -> None:
    """Commit stream offsets over ``src_path``'s current files WITHOUT
    applying them — the bounded no-op pass both incremental arms run as the
    FIRST init step. The caller must list/fold the source only AFTER this
    returns: every file this pass commits as consumed is then included in
    the fold's listing, and a file landing in the gap is folded AND later
    replayed, converging by the fold tolerance (the reverse order silently
    dropped gap files: committed as consumed, never folded)."""
    q = (
        spark.readStream.schema(schema)
        .parquet(src_path)
        .writeStream.foreachBatch(lambda df, bid: None)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _write_atomic(path: str, content: str) -> None:
    """tmp-write + rename: markers and tiny metadata records are either
    fully present or absent, never truncated."""
    with open(path + ".tmp", "w") as fh:
        fh.write(content)
    os.replace(path + ".tmp", path)


@dataclass
class StreamDef:
    name: str
    schema: StreamSchema
    path: str | None = None  # parquet-backed when warehouse_dir is set
    properties: dict[str, str] = field(default_factory=dict)


@dataclass
class PipelineDef:
    name: str
    sql: str  # the SELECT (normalized)
    sink: str  # sink stream name
    sources: tuple[str, ...] = ()  # input stream names (resolved from the plan)
    active: bool = False
    fingerprint: str = ""


#: the reference's connector enum (decodable/client/api.py:36-43)
CONNECTORS = ("datagen", "kafka", "kinesis", "rest", "s3")


@dataclass
class ConnectionDef:
    """A connection binds (connector, source|sink) to a stream — the
    reference's first-class connection entity (decodable/client/api.py:36-48;
    created bound to a stream via client.py:455-471, lifecycle
    activate/deactivate/delete via client.py:474-491)."""

    name: str
    connector: str  # ∈ CONNECTORS
    conn_type: str  # "source" | "sink" (api.py:45-48)
    stream: str  # bound stream name (qualified)
    properties: dict[str, str] = field(default_factory=dict)
    active: bool = False
    fingerprint: str = ""


def _fingerprint(sql: str, schema_dict: dict[str, Any] | None) -> str:
    payload = json.dumps({"sql": sql, "schema": schema_dict}, sort_keys=True)
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


_IDENT = r"[A-Za-z_][A-Za-z0-9_]*"


class Engine:
    """One engine instance = one namespace over one SparkSession."""

    def __init__(
        self,
        spark: SparkSession,
        namespace: str = "",
        warehouse_dir: str | None = None,
    ):
        self.spark = spark
        self.namespace = namespace
        self.warehouse_dir = warehouse_dir
        self.streams: dict[str, StreamDef] = {}
        self.pipelines: dict[str, PipelineDef] = {}
        self.connections: dict[str, ConnectionDef] = {}

    # -- naming -------------------------------------------------------------

    def qualify(self, name: str) -> str:
        """``<namespace>__<name>`` prefixing (adapters.sql:17-28)."""
        if self.namespace and not name.startswith(self.namespace + "__"):
            return f"{self.namespace}__{name}"
        return name

    # -- stream lifecycle ---------------------------------------------------

    def create_stream(
        self,
        name: str,
        schema: StreamSchema | None = None,
        data: DataFrame | None = None,
        properties: dict[str, str] | None = None,
    ) -> StreamDef:
        """Create (or replace) a stream from a schema, a DataFrame, or both.

        Computed fields are applied to the data; the registered relation
        always reflects the full schema.
        """
        name = self.qualify(name)
        if data is None and schema is None:
            raise CatalogError(f"stream {name!r} needs a schema or data")
        if data is None:
            assert schema is not None
            data = self.spark.createDataFrame([], schema.to_struct_type())
        if schema is None:
            schema = StreamSchema.from_spark(data.schema)
        data = schema.apply_computed_fields(data)
        sdef = StreamDef(name=name, schema=schema, properties=dict(properties or {}))
        self._materialize(sdef, data)
        self.streams[name] = sdef
        return sdef

    def _materialize(self, sdef: StreamDef, data: DataFrame) -> None:
        if self.warehouse_dir:
            path = os.path.join(self.warehouse_dir, sdef.name)
            data.write.mode("overwrite").parquet(path)
            sdef.path = path
            self.spark.read.parquet(path).createOrReplaceTempView(sdef.name)
        else:
            data.createOrReplaceTempView(sdef.name)

    def get_stream(self, name: str) -> StreamDef:
        name = self.qualify(name)
        try:
            return self.streams[name]
        except KeyError:
            raise CatalogError(f"no such stream: {name}") from None

    def read_stream(self, name: str) -> DataFrame:
        return self.spark.table(self.get_stream(name).name)

    def list_streams(self) -> list[str]:
        """list_relations_without_caching (impl.py:366-380)."""
        return sorted(self.streams)

    def get_columns(self, name: str) -> list[tuple[str, str]]:
        """get_columns_in_relation (impl.py:382-400): (name, flink type)."""
        sdef = self.get_stream(name)
        return [
            (f.name, f.type or "")
            for f in sdef.schema.fields
            if f.kind in ("physical", "metadata")
        ]

    def truncate_stream(self, name: str) -> None:
        """Clear data, keep schema (impl.py:259-275)."""
        sdef = self.get_stream(name)
        empty = self.spark.createDataFrame([], self.read_stream(name).schema)
        self._materialize(sdef, empty)

    def refresh_stream(self, name: str) -> None:
        """Re-register the stream's temp view from its parquet path. Needed
        after out-of-band appends (e.g. a bounded streaming activation's
        foreachBatch sink) — the previously-registered view pins the file
        index as of registration time."""
        sdef = self.get_stream(name)
        if sdef.path:
            self.spark.read.parquet(sdef.path).createOrReplaceTempView(sdef.name)

    def drop_stream(self, name: str, cascade: bool = True) -> list[str]:
        """Cascade drop per impl.py:197-257; returns every entity dropped."""
        name = self.qualify(name)
        if name not in self.streams:
            return []
        dropped: list[str] = []
        # 0. connections bound to this stream (the reference's cascade drops
        # the attached connection before the stream, impl.py:197-257)
        for c in [c for c in self.connections.values() if c.stream == name]:
            self.delete_connection(c.name)
            dropped.append(f"connection:{c.name}")
        # 1. pipeline writing this stream
        writer = self._pipeline_writing(name)
        if writer:
            self.delete_pipeline(writer.name)
            dropped.append(f"pipeline:{writer.name}")
        # 2. pipelines sourcing from this stream → recursively drop their sinks
        if cascade:
            for p in list(self.pipelines.values()):
                if name in p.sources:
                    self.delete_pipeline(p.name)
                    dropped.append(f"pipeline:{p.name}")
                    if p.sink in self.streams and p.sink != name:
                        dropped.extend(self.drop_stream(p.sink, cascade=True))
        # 3. the stream itself
        self.spark.catalog.dropTempView(name)
        sdef = self.streams.pop(name)
        if sdef.path and os.path.isdir(sdef.path):
            shutil.rmtree(sdef.path, ignore_errors=True)
        dropped.append(f"stream:{name}")
        return dropped

    def rename_stream(self, old: str, new: str) -> None:
        """Rename stream + its writer pipeline; re-point dependent pipelines
        (impl.py:277-352). Plan-level: dependent SQL is re-resolved against
        the catalog, replacing the reference's string replace
        (impl.py:694-701)."""
        old, new = self.qualify(old), self.qualify(new)
        sdef = self.get_stream(old)
        if new in self.streams:
            raise CatalogError(f"stream {new!r} already exists")
        data = self.read_stream(old)
        self.streams[new] = StreamDef(
            name=new, schema=sdef.schema, properties=sdef.properties
        )
        self._materialize(self.streams[new], data)
        # writer pipeline follows the stream name (reference renames it too)
        writer = self._pipeline_writing(old)
        if writer:
            del self.pipelines[writer.name]
            nn = new if writer.name == old else writer.name
            self.pipelines[nn] = PipelineDef(
                name=nn,
                sql=self._retarget_sql(writer.sql, old, new),
                sink=new,
                sources=tuple(new if s == old else s for s in writer.sources),
                active=writer.active,
                fingerprint=writer.fingerprint,
            )
        # dependents re-point their FROM references
        for p in self.pipelines.values():
            if old in p.sources:
                p.sql = self._retarget_sql(p.sql, old, new)
                p.sources = tuple(new if s == old else s for s in p.sources)
        # connections bound to the renamed stream follow it — otherwise a
        # later send_events on the connection KeyErrors on the stale name
        for c in self.connections.values():
            if c.stream == old:
                c.stream = new
        self.spark.catalog.dropTempView(old)
        del self.streams[old]
        # warehouse mode: the old stream's parquet dir is dead weight now
        # (the data was re-materialized under the new name above)
        if sdef.path and os.path.isdir(sdef.path):
            shutil.rmtree(sdef.path, ignore_errors=True)

    @staticmethod
    def _retarget_sql(sql: str, old: str, new: str) -> str:
        return re.sub(rf"(?<![A-Za-z0-9_`]){re.escape(old)}(?![A-Za-z0-9_`])", new, sql)

    def _pipeline_writing(self, stream: str) -> PipelineDef | None:
        for p in self.pipelines.values():
            if p.sink == stream:
                return p
        return None

    # -- pipeline lifecycle -------------------------------------------------

    def infer_output_schema(self, sql: str) -> StreamSchema:
        """The reference POSTs the SQL to /pipelines/outputStream for schema
        inference (impl.py:482-500); Catalyst's analyzer does it locally.
        The temporal-join shape (``FOR SYSTEM_TIME AS OF`` — Flink syntax
        Spark has no spelling for) is inferred structurally: the fact's
        full schema plus the dim payload columns, nullable (LEFT
        semantics), in select order — exactly the AS-OF operator's output."""
        try:
            return StreamSchema.from_spark(self.spark.sql(normalize(sql)).schema)
        except Exception as exc:
            from dbt_decodable_spark.operators.ivm_temporal import (
                temporal_spec_from_sql,
            )

            try:
                spec0, ftbl, dtbl = temporal_spec_from_sql(sql, (), "__pending__")
            except ValueError:
                raise exc
            from pyspark.sql import types as _T

            f_st = self.streams[self.qualify(ftbl)].schema.to_struct_type()
            d_types = {
                f.name: f.dataType
                for f in self.streams[self.qualify(dtbl)].schema.to_struct_type()
            }
            bad = [s for s in spec0.payload.values() if s not in d_types]
            if bad:
                raise CatalogError(
                    f"temporal payload column(s) {bad} are not columns of "
                    f"{dtbl!r}"
                ) from None
            # mirror the incremental front door's payload-vs-fact check
            # (activate_pipeline_temporal_incremental): a colliding OUTPUT
            # alias would otherwise build a StructType with duplicate
            # field names instead of raising (ADVICE r12)
            fact_names = set(f_st.fieldNames())
            bad_alias = [a for a in spec0.payload if a in fact_names]
            if bad_alias:
                raise CatalogError(
                    f"payload name(s) {bad_alias} collide with a fact "
                    "column"
                ) from None
            out = _T.StructType(
                list(f_st.fields)
                + [
                    _T.StructField(name, d_types[src], True)
                    for name, src in spec0.payload.items()
                ]
            )
            return StreamSchema.from_spark(out)

    def _resolve_sources(self, sql: str) -> tuple[str, ...]:
        """Input streams referenced by the SQL (resolved against the catalog).
        Comma-separated FROM lists (``FROM a, b``) count every member — a
        missed source breaks cascade-drop, rename re-pointing, and streaming
        re-binding for that stream."""
        idents: set[str] = set()
        # capture the whole comma list after FROM/JOIN — each item may carry
        # an (optionally AS-prefixed) alias before its comma
        seg_re = (
            rf"(?:FROM|JOIN)\s+"
            rf"((?:`?{_IDENT}`?(?:\s+(?:AS\s+)?{_IDENT})?\s*,\s*)*`?{_IDENT}`?)"
        )
        for m in re.finditer(seg_re, sql, re.IGNORECASE):
            for item in m.group(1).split(","):
                first = re.match(rf"\s*`?({_IDENT})`?", item)
                if first:
                    idents.add(first.group(1))
        return tuple(sorted(i for i in idents if self.qualify(i) in self.streams))

    def create_pipeline(
        self,
        name: str,
        sql: str,
        sink: str | None = None,
        primary_key: list[str] | None = None,
        activate: bool = True,
    ) -> PipelineDef:
        """Stream+pipeline pair from model SQL (create_table, impl.py:419-447):
        infer the output schema, create the sink stream, register the
        pipeline ``INSERT INTO sink <sql>``, and activate (run) it."""
        name = self.qualify(name)
        sink = self.qualify(sink or name)
        nsql = normalize(sql)
        out_schema = self.infer_output_schema(nsql)
        if primary_key:
            out_schema = StreamSchema(
                fields=out_schema.fields,
                watermarks=out_schema.watermarks,
                primary_key=tuple(primary_key),
            )
        if sink not in self.streams:
            self.create_stream(sink, schema=out_schema)
        pdef = PipelineDef(
            name=name,
            sql=nsql,
            sink=sink,
            sources=self._resolve_sources(nsql),
            fingerprint=_fingerprint(nsql, out_schema.to_dict()),
        )
        self.pipelines[name] = pdef
        if activate:
            self.activate_pipeline(name)
        return pdef

    def _temporal_batch_frame(self, sql: str) -> DataFrame:
        """Batch execution of the temporal-join shape (Spark SQL has no
        ``FOR SYSTEM_TIME AS OF`` spelling): one AS-OF join of the fact
        rows against the dim's full version history — each fact picks the
        latest version with ``valid_from <= fact_ts`` for its key. The
        version-start column is the dim's single watermark column (the
        incremental front door accepts ``dim_valid_from=`` instead)."""
        from dbt_decodable_spark.operators.ivm_temporal import (
            _enrich,
            temporal_spec_from_sql,
        )

        spec0, ftbl, dtbl = temporal_spec_from_sql(sql, (), "__pending__")
        ddef = self.streams[self.qualify(dtbl)]
        wms = [w.name for w in ddef.schema.watermarks]
        if len(wms) != 1:
            raise CatalogError(
                "batch execution of a temporal join needs the dim stream "
                "to declare exactly one watermark column (its version "
                "start) — or activate incrementally with dim_valid_from="
            )
        import dataclasses

        spec = dataclasses.replace(spec0, valid_from=wms[0])
        return _enrich(
            self.spark.table(self.qualify(ftbl)),
            self.spark.table(self.qualify(dtbl)),
            spec,
        )

    def activate_pipeline(self, name: str) -> None:
        """Run the INSERT INTO (batch semantics: sink := query result)."""
        p = self.pipelines[self.qualify(name)]
        sdef = self.streams[p.sink]
        try:
            result = self.spark.sql(p.sql)
        except Exception as exc:
            from dbt_decodable_spark.operators.ivm_temporal import (
                temporal_spec_from_sql,
            )

            try:
                temporal_spec_from_sql(p.sql, (), "__pending__")
            except ValueError:
                raise exc
            result = self._temporal_batch_frame(p.sql)
        if p.sink in p.sources and self.warehouse_dir:
            # self-referencing pipeline (incremental-style model): the query
            # reads the sink's own parquet path, so a direct overwrite would
            # fail with "cannot overwrite a path being read from" (or worse,
            # destroy the input mid-job). Write to a sibling tmp dir, then
            # swap — same crash-safe shape as operators/maintenance.
            path = os.path.join(self.warehouse_dir, sdef.name)
            tmp = path + ".__insert_tmp__"
            old = path + ".__insert_old__"
            # crash recovery: a previous run that died between the two renames
            # below leaves the only copy at `old` — restore it before anything
            # else (never delete leftovers while `path` is missing).
            if not os.path.isdir(path) and os.path.isdir(old):
                os.rename(old, path)
            for leftover in (tmp, old):
                if os.path.isdir(leftover):
                    shutil.rmtree(leftover)
            result.write.mode("overwrite").parquet(tmp)
            # swap via rename-aside (never rmtree the live sink before the
            # replacement is in place): path -> old, tmp -> path, drop old.
            if os.path.isdir(path):
                os.rename(path, old)
            os.rename(tmp, path)
            if os.path.isdir(old):
                shutil.rmtree(old)
            sdef.path = path
            self.spark.read.parquet(path).createOrReplaceTempView(sdef.name)
        else:
            self._materialize(sdef, result)
        p.active = True

    def activate_pipeline_streaming(self, name: str, available_now: bool = True):
        """Run the pipeline as a continuous Structured Streaming query: every
        source stream is re-bound to a file stream over its parquet path (so
        appends to sources flow through), the pipeline SQL runs over the
        streaming views, and the sink is written in append mode.

        Requires ``warehouse_dir`` (streams must be parquet-backed). Returns
        the StreamingQuery; the reference's actual_state RUNNING/STOPPED maps
        to ``query.isActive`` (impl.py:218). ``available_now=True`` gives the
        bounded-run form (preview protocol §3.2); False runs continuously
        until ``deactivate``. After a bounded run completes, call
        ``refresh_stream(sink)`` before reading the sink through the catalog
        view (direct ``spark.read.parquet`` always sees the appends).
        """
        if not self.warehouse_dir:
            raise CatalogError("streaming activation needs a warehouse_dir engine")
        p = self.pipelines[self.qualify(name)]
        sink = self.streams[p.sink]
        # rebind each source view to a streaming reader over the same path
        for src in p.sources:
            sdef = self.streams[src]
            if not sdef.path:
                raise CatalogError(f"source stream {src!r} is not parquet-backed")
            stream_df = (
                self.spark.readStream.schema(self.spark.read.parquet(sdef.path).schema)
                .parquet(sdef.path)
            )
            stream_df = sdef.schema.apply_watermarks(stream_df)
            stream_df.createOrReplaceTempView(src)
        try:
            out = self.spark.sql(p.sql)
            ckpt = os.path.join(self.warehouse_dir, f"_ckpt_{p.name}")
            sink_path = os.path.join(self.warehouse_dir, sink.name)

            # foreachBatch plain-parquet appends, NOT the FileStreamSink:
            # the file sink drops a _spark_metadata log into the sink dir,
            # after which batch reads trust ONLY the log and silently hide
            # every previously-materialized (non-streamed) file. foreachBatch
            # keeps the dir a plain parquet table both readers agree on.
            # (Replay caveat: at-least-once on retry — the idempotent
            # batch-id-partitioned variant lives in streaming/temporal.py.)
            def _append(batch_df: DataFrame, batch_id: int) -> None:
                batch_df.write.mode("append").parquet(sink_path)

            writer = (
                out.writeStream.foreachBatch(_append)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
            )
            if available_now:
                writer = writer.trigger(availableNow=True)
            q = writer.start()
            p.active = True
            return q
        finally:
            # restore batch views so batch reads keep working; the sink view
            # is refreshed too once the stream has had a chance to append
            # (the file index in the previously-registered view is stale)
            for src in p.sources:
                sdef = self.streams[src]
                if sdef.path:
                    self.spark.read.parquet(sdef.path).createOrReplaceTempView(src)

    def activate_pipeline_incremental(
        self,
        name: str,
        order: list[str] | None = None,
        delete_col: str | None = None,
        bucket_expr: str | None = None,
        compact_every: int = 4,
        emit_changes: bool = False,
    ):
        """Run the pipeline as a CONTINUOUSLY-MAINTAINED materialization —
        the reference platform's actual execution model for an aggregate
        model over a change stream (``handler.py:89-94`` last-after-image
        fold on a ``primary_key``-constrained stream, ``schema.py:109-111``;
        the behavior behind the dbt adapter's rejected ``incremental``
        materialization, ``dbt/include/decodable/macros/materializations/
        unsupported/incremental.sql``). Requirements: the pipeline SQL is
        the provable GROUP BY shape (``ivm.agg_spec_from_sql``), its single
        source declares a primary key, and ``order`` names the change-order
        columns (default: the source's watermark column, with the primary
        key appended as the tie-breaker).

        Bounded run (availableNow): new source appends flow through
        ``operators/ivm_log.stream_maintain_view`` — the view advances at
        O(|batch|) append cost, never a recompute — and the sink stream is
        re-materialized from the maintained view afterwards so catalog
        readers see the reference-shaped result. First activation advances
        the stream checkpoint over the current source files with a no-op
        bounded pass BEFORE folding them into the snapshot (same init
        protocol as the join arm: files the pass commits are listed by the
        later fold, gap files are folded AND replayed — convergent, never
        lost — and the real stream runs only post-init appends instead of
        replaying the whole source through maintenance). Init completion
        is gated on a marker written last; a crash mid-init redoes it.
        Repeated activations resume from the stream checkpoint; any replay
        converges because replayed images tie with the snapshot and
        contribute nothing (the fold's replay tolerance).

        ``emit_changes`` maintains the rollup's OWN change log at
        ``_ivm_<name>/out`` (group-keyed upserts/tombstones with
        ``__seq``/``__deleted``) — what lets a FURTHER maintained stage
        consume this rollup, closing the aggregate-over-raw-stream
        composition gap in :meth:`activate_project_incremental` (the
        reference lets ANY model's sink source the next model,
        ``impl.py:419-447``). Same protocol as the DAG arm: the init image
        lands as the floor-seq-0 batch, every micro-batch emits its
        group-level changes BEFORE the state append
        (``ivm_log_batch_changes`` — crash replays converge by tag), and
        the emission choice is persisted at init: enabling late is
        impossible and disabling for one activation would punch a
        permanent gap, so both raise.
        """
        from dbt_decodable_spark.operators import ivm_log
        from dbt_decodable_spark.operators.ivm import agg_spec_from_sql
        from dbt_decodable_spark.streaming.changelog import (
            write_hash_partitioned,
        )

        if not self.warehouse_dir:
            raise CatalogError("incremental activation needs a warehouse_dir engine")
        p = self.pipelines[self.qualify(name)]
        spec, tbl = agg_spec_from_sql(p.sql)
        if tbl not in p.sources:
            raise CatalogError(
                f"view source {tbl!r} is not a registered source of {p.name!r}"
            )
        sdef = self.streams[tbl]
        keys = list(sdef.schema.primary_key)
        if not keys:
            raise CatalogError(
                f"{tbl!r} declares no primary_key — not a change stream "
                "(schema.py:109-111); incremental maintenance needs keyed "
                "upserts"
            )
        if order is None:
            if not sdef.schema.watermarks:
                raise CatalogError(
                    "pass order= (change-order columns): the source has no "
                    "watermark column to default to"
                )
            order = [w.name for w in sdef.schema.watermarks]
        order = list(order) + [k for k in keys if k not in order]
        if not sdef.path:
            raise CatalogError(f"source stream {tbl!r} is not parquet-backed")

        src_schema = self.spark.read.parquet(sdef.path).schema
        # fire-before-write (join-arm invariant): a reserved source column
        # rejected only inside the snapshot writer or the first maintenance
        # batch would fire AFTER the root dir and checkpoint offsets were
        # created for a pipeline that can never activate. __bucket is the
        # snapshot layout column; __g/__k/__gbucket/__mult are the names
        # the ivm_log state machinery stacks onto source rows (the same
        # set the DAG arm rejects on its sink columns).
        bad_src = sorted(
            set(src_schema.fieldNames())
            & {"__bucket", "__g", "__k", "__gbucket", "__mult"}
        )
        if bad_src:
            raise CatalogError(
                f"source column(s) {bad_src} collide with reserved "
                "maintenance-state names"
            )
        if emit_changes:
            bad_out = sorted(set(spec.outputs()) & {"__seq", "__deleted"})
            if bad_out:
                raise CatalogError(
                    f"view output name(s) {bad_out} collide with reserved "
                    "change-log columns — rename the aggregate aliases"
                )
        root = os.path.join(self.warehouse_dir, f"_ivm_{p.name}")
        snap_path = os.path.join(root, "snapshot")
        out_log = os.path.join(root, "out")
        emit_file = os.path.join(root, "_emit_changes")
        ckpt = os.path.join(self.warehouse_dir, f"_ckpt_ivm_{p.name}")
        # init completion is gated on a marker written LAST (r10, mirroring
        # the join arm): gating on the root dir would let a crash between
        # the snapshot write and ivm_log_init leave a root that later
        # activations mistake for completed state. Every init write below
        # is redo-safe (snapshot is mode-overwrite; ivm_log_init publishes
        # a fresh _SUCCESS-gated generation that supersedes a partial one).
        init_marker = os.path.join(root, "_init_done")
        if not os.path.exists(init_marker) and glob.glob(
            os.path.join(root, "agg", "v=*", "_SUCCESS")
        ):
            # pre-marker root whose init completed under the old
            # isdir(root) gate — ADOPT it rather than re-initialize: a
            # fresh watermark=-1 generation would re-apply the log's
            # still-present counter deltas (folded-but-unvacuumed ones
            # included) on top of a snapshot fold that already carries
            # their effects — double-counted aggregates. "Completed" means
            # EVERY state table has a published generation, not just agg:
            # ivm_log_init publishes agg first, then the sup_<col> tables,
            # so a crash between the publishes leaves agg committed with a
            # support table missing — adopting THAT root wedges every later
            # append on _latest_gen(sup_...) with a misleading
            # FileNotFoundError. Nothing can have consumed such a root
            # (appends fail on the missing generation before landing the
            # agg delta), so clearing and re-initializing is the safe
            # recovery — and the same clear covers the marker-gated path's
            # own crash between ivm_log_init's per-table publishes, which
            # ivm_log_init alone cannot redo (it refuses a root with
            # committed agg generations).
            from dbt_decodable_spark.streaming.changelog import (
                list_deltas as _list_deltas,
            )

            if all(
                glob.glob(os.path.join(root, f"sup_{c}", "v=*", "_SUCCESS"))
                for c in spec.support_cols()
            ) and (
                # an EMITTING init is complete only once the out log's
                # init image committed — a crash between the state publish
                # and that seed must re-init, or fold(out log) would
                # permanently miss every pre-existing group
                not emit_changes
                or any(
                    os.path.basename(d).endswith("-init")
                    for d in _list_deltas(out_log)
                )
            ):
                _write_atomic(init_marker, "1")
            else:
                shutil.rmtree(root, ignore_errors=True)
        if os.path.exists(init_marker):
            # the emission choice is a property of the ROOT (the
            # _run_downstream_stage rationale, verbatim): enabling late is
            # impossible (the out log's init image is unrecoverable), and
            # disabling for one activation would silently punch a
            # permanent gap in the out log
            if os.path.exists(emit_file):
                with open(emit_file) as fh:
                    persisted_emit = fh.read().strip() == "1"
            else:
                persisted_emit = os.path.isdir(out_log + ".__deltas__")
                _write_atomic(emit_file, "1" if persisted_emit else "0")
            if emit_changes and not persisted_emit:
                raise CatalogError(
                    "change emission must be enabled from the FIRST "
                    "activation (the out log's init image is unrecoverable "
                    f"later) — delete {root!r} to rebuild with emit_changes"
                )
            if persisted_emit and not emit_changes:
                raise CatalogError(
                    "this pipeline maintains an emitted change log — every "
                    "activation must keep emitting (a non-emitting one "
                    "would punch a permanent gap in the out log); pass "
                    f"emit_changes=True, or delete {root!r} to rebuild "
                    "without emission"
                )
        if not os.path.exists(init_marker):
            os.makedirs(root, exist_ok=True)
            # one-time setup: commit the stream offsets over the current
            # source files FIRST (bounded no-op pass), THEN fold the
            # snapshot and initialize the view from it — the real stream
            # below then runs only post-init appends instead of replaying
            # the whole source through maintenance (the pre-r10 behavior:
            # one-time O(|source|) maintenance + source-sized snapshot
            # deltas for data the snapshot already carried). See
            # _advance_stream_offsets for the race-free ordering argument.
            _advance_stream_offsets(self.spark, sdef.path, src_schema, ckpt)
            # the fold's listing must happen AFTER the offset capture —
            # do not hoist this read above the advance
            src_now = self.spark.read.parquet(sdef.path)
            from dbt_decodable_spark.streaming.changelog import fold_last_image

            snap0 = fold_last_image(src_now, keys, [F.col(c) for c in order])
            write_hash_partitioned(snap0, snap_path, keys, n_buckets=32)
            ivm_log.ivm_log_init(
                self.spark, root,
                self.spark.read.parquet(snap_path).drop("__bucket"),
                spec, delete_col=delete_col, bucket_expr=bucket_expr,
            )
            if emit_changes:
                # the change log must be self-contained: the init image is
                # its first batch (seq 0 — strictly below every emitted
                # batch's batch_id+1), so fold(out log) == the view from
                # init onward. A mid-init redo may fold a LARGER source
                # than the first attempt did, so the stale out log is
                # cleared first — nothing can have consumed it (the marker
                # gates completion) and the "init" tag would otherwise
                # dedupe the redo's fresher image.
                from dbt_decodable_spark.streaming.changelog import (
                    append_delta as _append_delta,
                )

                shutil.rmtree(out_log + ".__deltas__", ignore_errors=True)
                init_img = (
                    ivm_log.ivm_log_read(self.spark, root, spec)
                    .withColumn("__seq", F.lit(0).cast("long"))
                    .withColumn("__deleted", F.lit(False))
                )
                _append_delta(self.spark, out_log, init_img, tag="init")
            _write_atomic(emit_file, "1" if emit_changes else "0")
            _write_atomic(init_marker, "1")
        stream_df = self.spark.readStream.schema(src_schema).parquet(sdef.path)
        q = (
            ivm_log.stream_maintain_view(
                stream_df, root, snap_path,
                keys, [F.col(c) for c in order], spec,
                compact_every=compact_every, snapshot_n_buckets=32,
                emit_log=out_log if emit_changes else None,
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # reference-shaped sink: re-materialize the sink stream from the
        # maintained view (a projection of the view log — O(|view|), the
        # one reference-contract step that scales with the view, not the
        # data)
        self._materialize(
            self.streams[p.sink], ivm_log.ivm_log_read(self.spark, root, spec)
        )
        p.active = True
        return q

    def activate_pipeline_join_incremental(
        self,
        name: str,
        fact_order: list[str] | None = None,
        dim_order: list[str] | None = None,
        fact_delete_col: str | None = None,
        dim_delete_col: str | None = None,
        n_buckets: int = 32,
        compact: bool = True,
        compact_min_deltas: int = 4,
    ):
        """Run a TWO-SOURCE join pipeline as a continuously-maintained
        materialization — the enrichment twin of
        :meth:`activate_pipeline_incremental`. The pipeline SQL must be the
        provable lookup-join shape (``ivm_join.join_spec_from_sql``:
        ``SELECT f.*, d.col ... FROM fact f [LEFT] JOIN dim d ON f.fk =
        d.pk``), both sources must declare a ``primary_key`` (change
        streams, ``schema.py:109-111``), and the ON clause's dim columns
        must be exactly the dim's primary key.

        Persistence is three merge-on-read delta logs under the warehouse
        (fact state, dim state, view) — every micro-batch APPENDS: the raw
        batch to its side's state log, and the view's recomputed
        touched-key change stream (``maintain_join_with_changes``) to the
        view log. Appends are O(|batch| + dim-fanout); nothing rewrites
        with the state.

        Crash story: the VIEW delta commits before the side's state
        delta, so a crash between the two replays the batch against state
        that still EXCLUDES it — the recomputation is bit-identical, and
        within the same activation the batch tag dedupes the re-append. A
        replay under a RESTARTED activation carries a new epoch, so its
        tags differ and duplicate deltas can land on either log — that is
        convergent, not exactly-once: every delta is a last-image fold
        ordered by ``__seq`` (view) or the source order columns (state),
        and re-folding identical or older images picks the same winners.
        (Even a state-first commit order would converge the same way —
        a replayed batch TIES with its own state row and ties go to the
        batch, re-emitting identical view changes; view-first is kept
        because it recomputes from exactly the pre-batch state instead of
        leaning on tie semantics.) View-delta seqs are ``(epoch, side,
        batch_id)``-ordered so later activations win and dim batches (run
        second) win over the same activation's fact batches — matching
        application order.

        Bounded run (availableNow), one stream per source, sequential;
        repeated activations resume from the checkpoints and stream only
        new appends. First activation advances both stream checkpoints
        over the current source files WITHOUT applying them (a no-op
        bounded pass), THEN folds the sources into the state snapshots
        and the initial view — otherwise the fresh checkpoints would
        replay the whole source through maintenance and append
        full-view-sized deltas for data the snapshots already carry.
        Offsets-before-snapshots is load-bearing for concurrent appends:
        every file the no-op pass commits as consumed is listed before
        the snapshot fold reads the source, so the fold includes it, and
        a file landing between the offset capture and the fold is both
        folded and later replayed through maintenance — convergent by
        the fold tolerance above (re-folding identical images picks the
        same winners), never a lost or wrong answer. (The reverse order
        would commit gap files as consumed without ever folding them —
        silent loss.) Init completion is gated on a marker written LAST
        (not on the view-log directory, which Spark creates before the v0
        write commits) and every init write is mode-overwrite, so a crash
        mid-init simply redoes it: the re-run advances only files added
        since, and the fold reads the full source regardless. A pre-marker
        root whose v0 committed (``view/_SUCCESS``) is adopted as-is. The bucket
        count is persisted in the root on first activation and a
        re-activation with a different ``n_buckets`` raises — every merge
        and compaction must hash with the layout the writer used, and a
        mismatched expression would strand a key's old row in its old
        bucket directory alongside the new one. With ``compact`` a log
        folds into its partitioned
        snapshot afterwards once it holds at least ``compact_min_deltas``
        pending deltas (``compact_and_vacuum`` — the LSM minor compaction
        on its size trigger; below the threshold reads fold the pending
        deltas anyway), and the sink stream is re-materialized from the
        view.
        """
        import dataclasses

        from dbt_decodable_spark.operators import ivm_join as ij
        from dbt_decodable_spark.streaming.changelog import (
            append_delta,
            fold_last_image,
            list_deltas,
            read_merged,
            write_hash_partitioned,
        )

        if not self.warehouse_dir:
            raise CatalogError("incremental activation needs a warehouse_dir engine")
        p = self.pipelines[self.qualify(name)]
        spec0, ftbl, dtbl = ij.join_spec_from_sql(p.sql, ())
        for t in (ftbl, dtbl):
            if t not in p.sources:
                raise CatalogError(
                    f"view source {t!r} is not a registered source of {p.name!r}"
                )
        fdef, ddef = self.streams[ftbl], self.streams[dtbl]
        fkeys = list(fdef.schema.primary_key)
        dkeys = list(ddef.schema.primary_key)
        if not fkeys or not dkeys:
            raise CatalogError(
                "both join sides must declare primary_key — incremental "
                "maintenance needs keyed change streams (schema.py:109-111)"
            )
        if tuple(dkeys) != spec0.dim_keys:
            raise CatalogError(
                f"ON-clause dim columns {spec0.dim_keys} must be exactly "
                f"{dtbl!r}'s primary_key {tuple(dkeys)} — the dim snapshot "
                "is keyed by it"
            )
        spec = dataclasses.replace(spec0, fact_keys=tuple(fkeys))

        forder = self._change_order(fact_order, fdef, fkeys, "fact")
        dorder = self._change_order(dim_order, ddef, dkeys, "dim")
        for sdef, t in ((fdef, ftbl), (ddef, dtbl)):
            if not sdef.path:
                raise CatalogError(f"source stream {t!r} is not parquet-backed")

        root = os.path.join(self.warehouse_dir, f"_ivmj_{p.name}")
        fact_log = os.path.join(root, "fact")
        dim_log = os.path.join(root, "dim")
        view_log = os.path.join(root, "view")
        fordc = lambda: [F.col(c) for c in forder]  # noqa: E731
        dordc = lambda: [F.col(c) for c in dorder]  # noqa: E731
        fschema = self.spark.read.parquet(fdef.path).schema
        dschema = self.spark.read.parquet(ddef.path).schema
        # every shape error must fire BEFORE the first filesystem write —
        # a mid-init failure after partial writes would otherwise leave a
        # root that later activations mistake for completed state
        for out in spec.dim_payload:
            if out in fschema.fieldNames():
                raise CatalogError(
                    f"payload name {out!r} collides with a fact column"
                )
        for side_name, col_, sch in (
            ("fact", fact_delete_col, fschema),
            ("dim", dim_delete_col, dschema),
        ):
            if col_ is not None and col_ not in sch.fieldNames():
                raise CatalogError(
                    f"{side_name}_delete_col {col_!r} is not a column of "
                    f"the {side_name} stream"
                )
        # names this arm stacks onto the data, which a user column or
        # payload output would be silently destroyed by (__bucket by
        # write_hash_partitioned, __seq/__deleted by the view log) or
        # duplicate-select (the _round sentinels) — rejecting them only in
        # the maintenance round would fire AFTER init wrote the root,
        # wedging the pipeline against this function's fire-before-write
        # invariant
        log_cols = {"__bucket", "__seq", "__deleted"}
        bad_fact = sorted(set(fschema.fieldNames()) & (set(ij._RESERVED) | log_cols))
        if bad_fact:
            raise CatalogError(
                f"fact column(s) {bad_fact} collide with reserved "
                "maintenance names"
            )
        if "__bucket" in dschema.fieldNames():
            raise CatalogError(
                "dim column '__bucket' collides with the bucketed snapshot "
                "layout column"
            )
        bad_payload = sorted(set(spec.dim_payload) & log_cols)
        if bad_payload:
            raise CatalogError(
                f"payload output name(s) {bad_payload} collide with "
                "reserved view-log columns"
            )

        # init completion is gated on a MARKER written last, not on the
        # view-log directory: Spark creates the directory before the v0
        # write commits, so a crash mid-write would leave a dir that an
        # isdir gate mistakes for completed init — with the offsets already
        # advanced, the partial (or empty) v0 silently loses every key the
        # crash cut off. The marker plus redo-safe init writes (all
        # mode-overwrite) close that window, same protocol as the
        # aggregate/DAG arms.
        nb_file = os.path.join(root, "_n_buckets")
        init_marker = os.path.join(root, "_init_done")
        if not os.path.exists(init_marker) and os.path.exists(
            os.path.join(view_log, "_SUCCESS")
        ):
            # pre-marker root whose v0 write COMMITTED under the old
            # isdir(view_log) gate — adopt; re-initializing would overwrite
            # v0 (__seq=0) under the root's still-present higher-__seq view
            # deltas, whose stale images would then out-fold the fresher
            # recomputed snapshot
            _write_atomic(init_marker, "1")
        if not os.path.exists(init_marker):
            if any(
                list_deltas(log) for log in (fact_log, dim_log, view_log)
            ):
                # deltas can only land post-init, so this root completed
                # init WITHOUT a committed v0 — an old-code crash mid-write
                # that later activations appended onto; the base is
                # unrecoverable (re-init would strand the deltas' seqs over
                # a fresh v0) but the sources still hold every row
                raise CatalogError(
                    f"{root!r} has appended deltas but no committed view "
                    "base — an old-code crash mid-init; delete the root to "
                    "rebuild from the sources"
                )
            os.makedirs(root, exist_ok=True)
            # persist the bucket layout FIRST: every later merge/compaction
            # must hash with the writer's bucket expression (the
            # write_hash_partitioned contract), so re-activations are
            # validated against this file below
            _write_atomic(nb_file, str(n_buckets))
            # offsets BEFORE snapshots (see _advance_stream_offsets: the
            # old snapshot-then-advance order silently dropped files
            # landing in the gap — committed as consumed, never folded)
            _advance_stream_offsets(
                self.spark, fdef.path, fschema,
                os.path.join(root, "_ckpt_fact"),
            )
            _advance_stream_offsets(
                self.spark, ddef.path, dschema,
                os.path.join(root, "_ckpt_dim"),
            )
            # the folds' listings must happen AFTER the offset captures —
            # do not hoist these reads above the advances
            fsnap = fold_last_image(
                self.spark.read.parquet(fdef.path), fkeys, fordc()
            )
            dsnap = fold_last_image(
                self.spark.read.parquet(ddef.path), dkeys, dordc()
            )
            write_hash_partitioned(fsnap, fact_log, fkeys, n_buckets)
            write_hash_partitioned(dsnap, dim_log, dkeys, n_buckets)
            v0 = (
                ij.compute_join_view(
                    self.spark.read.parquet(fact_log).drop("__bucket"),
                    self.spark.read.parquet(dim_log).drop("__bucket"),
                    spec, fact_delete_col, dim_delete_col,
                )
                .withColumn("__seq", F.lit(0).cast("long"))
                .withColumn("__deleted", F.lit(False))
            )
            write_hash_partitioned(v0, view_log, fkeys, n_buckets)
            _write_atomic(init_marker, "1")
        if not os.path.exists(nb_file):
            raise CatalogError(
                f"{root!r} has a completed view log but no _n_buckets "
                "record — the layout's bucket count is unknown; delete the "
                "root to re-initialize"
            )
        with open(nb_file) as fh:
            raw_nb = fh.read().strip()
        try:
            persisted_nb = int(raw_nb)
        except ValueError:
            raise CatalogError(
                f"corrupt _n_buckets record {raw_nb!r} in {root!r} — "
                "delete the root to re-initialize"
            ) from None
        if persisted_nb != n_buckets:
            raise CatalogError(
                f"n_buckets={n_buckets} does not match the bucket layout "
                f"this view was created with ({persisted_nb}) — merges and "
                "compaction must hash with the writer's bucket expression; "
                f"re-activate with n_buckets={persisted_nb} or delete "
                f"{root!r} to re-initialize"
            )
        epoch_file = os.path.join(root, "_epoch")
        epoch = 0
        if os.path.exists(epoch_file):
            with open(epoch_file) as fh:
                epoch = int(fh.read().strip() or 0)
        epoch += 1
        _write_atomic(epoch_file, str(epoch))

        def _state():
            # prune_fold: per-batch state reads SCAN the snapshots and
            # shuffle only the pending-delta key slices (r12 — the
            # measured merge-on-read step slope at 20x state)
            return ij.JoinViewState(
                fact=read_merged(
                    self.spark, fact_log, fkeys, fordc(),
                    include_tombstones=True, prune_fold=True,
                ),
                dim=read_merged(
                    self.spark, dim_log, dkeys, dordc(),
                    include_tombstones=True, prune_fold=True,
                ),
                # the view frame only shapes the (discarded) splice plan
                view=read_merged(
                    self.spark, view_log, fkeys, [F.col("__seq")],
                    delete_col="__deleted", prune_fold=True,
                ).drop("__seq", "__deleted"),
            )

        def _run_side(side, sdef, side_log):
            sbit = 0 if side == "fact" else 1

            def handle(batch_df, batch_id):
                seq = ((epoch * 2 + sbit) << 33) + batch_id
                tag = f"{side}-{epoch}-{batch_id}"
                fb = batch_df if side == "fact" else self.spark.createDataFrame(
                    [], fschema
                )
                db = batch_df if side == "dim" else self.spark.createDataFrame(
                    [], dschema
                )
                _st, changes = ij.maintain_join_with_changes(
                    _state(), fb, db, fordc(), dordc(), spec, seq=seq,
                    fact_delete_col=fact_delete_col,
                    dim_delete_col=dim_delete_col,
                )
                changes = changes.localCheckpoint(eager=True)
                # VIEW delta first (see crash story in the docstring)
                if changes.count() > 0:
                    append_delta(
                        self.spark, view_log, changes, tag=f"view-{tag}"
                    )
                append_delta(self.spark, side_log, batch_df, tag=tag)

            q = (
                self.spark.readStream.schema(
                    fschema if side == "fact" else dschema
                )
                .parquet(sdef.path)
                .writeStream.foreachBatch(handle)
                .option(
                    "checkpointLocation",
                    os.path.join(root, f"_ckpt_{side}"),
                )
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        _run_side("fact", fdef, fact_log)
        _run_side("dim", ddef, dim_log)

        if compact:
            self._compact_join_pipeline_logs(
                p, n_buckets=n_buckets,
                compact_min_deltas=compact_min_deltas,
                fact_order=fact_order, dim_order=dim_order,
            )
        live = read_merged(
            self.spark, view_log, fkeys, [F.col("__seq")],
            delete_col="__deleted",
        ).drop("__seq", "__deleted")
        self._materialize(self.streams[p.sink], live)
        p.active = True

    def activate_pipeline_temporal_incremental(
        self,
        name: str,
        fact_order: list[str] | None = None,
        dim_valid_from: str | None = None,
        fact_delete_col: str | None = None,
        n_buckets: int = 32,
        compact: bool = True,
        compact_min_deltas: int = 4,
    ):
        """Run a TEMPORAL (``FOR SYSTEM_TIME AS OF``) join pipeline as a
        continuously-maintained materialization — the SQL front door of the
        SCD2-temporal IVM arm (:mod:`.operators.ivm_temporal`), making the
        reference's change-stream dimension semantics
        (``/root/reference/README.md:104``, ``decodable/client/
        schema.py:109-111``) a first-class node kind. The pipeline SQL must
        be the provable shape (``ivm_temporal.temporal_spec_from_sql``):
        ``SELECT f.*, d.<col> [AS name] FROM fact f LEFT JOIN dim FOR
        SYSTEM_TIME AS OF f.<ts> AS d ON f.<fk> = d.<pk>``. The dim's
        version-start column defaults to its single watermark column
        (versioning is a property of the dim STREAM, Flink's
        versioned-table stance); override with ``dim_valid_from``.

        Persistence is three logs under ``_ivmt_<name>``: the fact state
        (merge-on-read, folded by the fact order), the dim HISTORY
        (append-only — every version is retained; the SCD2 table is
        rebuilt from it per micro-batch, O(|dim history|) over a
        change-stream-contract-small dimension), and the view log
        (``__seq``/``__deleted`` change stream a downstream stage consumes
        exactly like a join node's). Per-batch view work is the operator's
        touched-slice recompute — O(|batch| + version fanout), never a
        view recompute; the fact snapshot the maintenance probes is the
        post-append merge-on-read read, so no extra per-batch key shuffle
        of the fact state (the ``snapshot_after`` caller-MERGE contract).

        Commit ordering per side: the FACT side lands its state delta
        FIRST (the post-append read IS the snapshot_after), the DIM side
        lands its state delta LAST (the SCD2 merge must pre-date the
        batch); both orders converge under replay — recomputation against
        unchanged inputs is bit-identical and the view append dedupes on
        the batch tag (the join arm's crash story, adapted).

        Contracts inherited from the operator (pytest-pinned there): dim
        versions arrive in ``valid_from`` order per key; dim keys are
        never tombstoned (a temporal dim retires by emitting a new
        version)."""
        import dataclasses

        from dbt_decodable_spark.operators import ivm_temporal as it
        from dbt_decodable_spark.streaming.changelog import (
            append_delta,
            fold_last_image,
            list_deltas,
            read_merged,
            scd2_from_changelog,
            write_hash_partitioned,
        )

        if not self.warehouse_dir:
            raise CatalogError("incremental activation needs a warehouse_dir engine")
        p = self.pipelines[self.qualify(name)]
        spec0, ftbl, dtbl = it.temporal_spec_from_sql(p.sql, (), "__pending__")
        for t in (ftbl, dtbl):
            if t not in p.sources:
                raise CatalogError(
                    f"view source {t!r} is not a registered source of {p.name!r}"
                )
        fdef, ddef = self.streams[ftbl], self.streams[dtbl]
        fkeys = list(fdef.schema.primary_key)
        dkeys = list(ddef.schema.primary_key)
        if not fkeys or not dkeys:
            raise CatalogError(
                "both temporal-join sides must declare primary_key — "
                "incremental maintenance needs keyed change streams "
                "(schema.py:109-111)"
            )
        if [spec0.dim_key] != dkeys:
            raise CatalogError(
                f"ON-clause dim column {spec0.dim_key!r} must be exactly "
                f"{dtbl!r}'s primary_key {tuple(dkeys)} — versions are "
                "keyed by it"
            )
        valid_from = dim_valid_from
        if valid_from is None:
            wms = [w.name for w in ddef.schema.watermarks]
            if len(wms) != 1:
                raise CatalogError(
                    "pass dim_valid_from= (the dim's version-start "
                    "column): the dim stream does not have exactly one "
                    "watermark column to default to"
                )
            valid_from = wms[0]
        spec = dataclasses.replace(
            spec0, fact_keys=tuple(fkeys), valid_from=valid_from
        )
        forder = self._change_order(fact_order, fdef, fkeys, "fact")
        for sdef, t in ((fdef, ftbl), (ddef, dtbl)):
            if not sdef.path:
                raise CatalogError(f"source stream {t!r} is not parquet-backed")
        fschema = self.spark.read.parquet(fdef.path).schema
        dschema = self.spark.read.parquet(ddef.path).schema
        # fire-before-write (the join arm's standing invariant)
        for out in spec.payload:
            if out in fschema.fieldNames():
                raise CatalogError(
                    f"payload name {out!r} collides with a fact column"
                )
        for col_, sch, side in (
            (fact_delete_col, fschema, "fact_delete_col"),
            (spec.fact_ts, fschema, "AS OF probe column"),
            (spec.fk_col, fschema, "ON-clause fact column"),
            (valid_from, dschema, "dim valid_from column"),
            *((src, dschema, "payload source column")
              for src in spec.payload.values()),
        ):
            if col_ is not None and col_ not in sch.fieldNames():
                raise CatalogError(f"{side} {col_!r} is not a source column")
        log_cols = {"__bucket", "__seq", "__deleted"}
        reserved = set(it._RESERVED) | log_cols
        bad_fact = sorted(set(fschema.fieldNames()) & reserved)
        bad_dim = sorted(set(dschema.fieldNames()) & reserved)
        bad_payload = sorted(set(spec.payload) & reserved)
        if bad_fact or bad_dim or bad_payload:
            raise CatalogError(
                f"column(s) fact={bad_fact} dim={bad_dim} "
                f"payload={bad_payload} collide with reserved temporal "
                "maintenance names"
            )

        root = os.path.join(self.warehouse_dir, f"_ivmt_{p.name}")
        fact_log = os.path.join(root, "fact")
        dim_log = os.path.join(root, "dim")
        view_log = os.path.join(root, "view")
        fordc = lambda: [F.col(c) for c in forder]  # noqa: E731
        dim_hist_keys = [spec.dim_key, valid_from]
        nb_file = os.path.join(root, "_n_buckets")
        init_marker = os.path.join(root, "_init_done")
        if not os.path.exists(init_marker):
            if any(list_deltas(log) for log in (fact_log, dim_log, view_log)):
                raise CatalogError(
                    f"{root!r} has appended deltas but no completed init — "
                    "delete the root to rebuild from the sources"
                )
            os.makedirs(root, exist_ok=True)
            _write_atomic(nb_file, str(n_buckets))
            # offsets BEFORE snapshots (the join arm's race-free ordering)
            _advance_stream_offsets(
                self.spark, fdef.path, fschema,
                os.path.join(root, "_ckpt_fact"),
            )
            _advance_stream_offsets(
                self.spark, ddef.path, dschema,
                os.path.join(root, "_ckpt_dim"),
            )
            fsnap = fold_last_image(
                self.spark.read.parquet(fdef.path), fkeys, fordc()
            )
            write_hash_partitioned(fsnap, fact_log, fkeys, n_buckets)
            # the dim log keeps EVERY version — keyed (dim key, valid_from)
            # the fold is duplicate-elimination only, never version loss
            write_hash_partitioned(
                fold_last_image(
                    self.spark.read.parquet(ddef.path),
                    dim_hist_keys, [F.col(valid_from)],
                ),
                dim_log, dim_hist_keys, n_buckets,
            )
            v0 = (
                it.recompute_temporal_view(
                    self.spark.read.parquet(fact_log).drop("__bucket"),
                    self.spark.read.parquet(dim_log).drop("__bucket"),
                    spec, fordc(), fact_delete_col=fact_delete_col,
                )
                .withColumn("__seq", F.lit(0).cast("long"))
                .withColumn("__deleted", F.lit(False))
            )
            write_hash_partitioned(v0, view_log, fkeys, n_buckets)
            _write_atomic(init_marker, "1")
        with open(nb_file) as fh:
            raw_nb = fh.read().strip()
        try:
            persisted_nb = int(raw_nb)
        except ValueError:
            raise CatalogError(
                f"corrupt _n_buckets record {raw_nb!r} in {root!r} — "
                "delete the root to re-initialize"
            ) from None
        if persisted_nb != n_buckets:
            raise CatalogError(
                f"n_buckets={n_buckets} does not match the bucket layout "
                f"this view was created with ({persisted_nb}) — re-activate "
                f"with n_buckets={persisted_nb} or delete {root!r}"
            )
        epoch_file = os.path.join(root, "_epoch")
        epoch = 0
        if os.path.exists(epoch_file):
            with open(epoch_file) as fh:
                epoch = int(fh.read().strip() or 0)
        epoch += 1
        _write_atomic(epoch_file, str(epoch))

        def _dim_rows():
            # merge-on-read keyed by (dim key, valid_from): the fold is
            # duplicate-elimination of replayed version rows only — every
            # distinct version survives (the history is the state)
            return read_merged(
                self.spark, dim_log, dim_hist_keys, [F.col(valid_from)],
                include_tombstones=True, prune_fold=True,
            )

        def _view():
            return read_merged(
                self.spark, view_log, fkeys, [F.col("__seq")],
                delete_col="__deleted", prune_fold=True,
            ).drop("__seq", "__deleted")

        def _run_side(side, sdef, sschema):
            sbit = 0 if side == "fact" else 1

            def handle(batch_df, batch_id):
                seq = ((epoch * 2 + sbit) << 33) + batch_id
                tag = f"{side}-{epoch}-{batch_id}"
                if side == "fact":
                    # state FIRST: the post-append merge-on-read read IS
                    # the snapshot_after (no extra per-batch fold)
                    append_delta(self.spark, fact_log, batch_df, tag=tag)
                fact_now = read_merged(
                    self.spark, fact_log, fkeys, fordc(),
                    include_tombstones=True, prune_fold=True,
                )
                # the maintenance only ever consumes versions of the
                # batch's touched dim keys (fact side: its fks; dim side:
                # its dks — the affected facts all carry those fks), so
                # the SCD2 window folds a broadcast-semi-pruned slice of
                # the history, not all of it: per-batch dim cost is
                # O(touched keys' history), not O(|dim history|) — the
                # large-dim scale path. Exact because SCD2 is a per-key
                # computation; the operator's returned dim state is
                # discarded (the next batch re-reads the logs).
                if side == "fact":
                    # The re-enrichment consumes the POST-MERGE WINNING
                    # images of the batch's keys, and a stale/out-of-order
                    # batch row can LOSE the merge to a snapshot image
                    # carrying a DIFFERENT fk — so the winners' fks must
                    # be in the pruned history too, or the LEFT as-of
                    # re-enriches against a version set missing them and
                    # emits a NULL-payload upsert over the correct view
                    # row. Both arms stay batch-bounded (≤ 2·|batch| keys
                    # broadcast): the batch's own fks ∪ the current
                    # winning images' fks for the batch's pks.
                    winner_fks = fact_now.join(
                        F.broadcast(batch_df.select(*fkeys).distinct()),
                        on=fkeys, how="left_semi",
                    ).select(F.col(spec.fk_col).alias(spec.dim_key))
                    touch_dk = (
                        batch_df.select(
                            F.col(spec.fk_col).alias(spec.dim_key)
                        )
                        .unionByName(winner_fks)
                        .distinct()
                    )
                else:
                    touch_dk = batch_df.select(spec.dim_key).distinct()
                hist = _dim_rows().join(
                    F.broadcast(touch_dk), on=spec.dim_key, how="left_semi"
                )
                state = it.TemporalJoinState(
                    fact=fact_now,
                    dim_versions=scd2_from_changelog(
                        hist, [spec.dim_key], valid_from
                    ),
                    view=_view(),
                )
                fb = batch_df if side == "fact" else None
                db = batch_df if side == "dim" else None
                _st, changes = it.maintain_temporal_join_with_changes(
                    state, fb, db, fordc(), spec, seq=seq,
                    fact_delete_col=fact_delete_col,
                    snapshot_after=fact_now,
                )
                changes = changes.localCheckpoint(eager=True)
                if changes.count() > 0:
                    append_delta(
                        self.spark, view_log, changes, tag=f"view-{tag}"
                    )
                if side == "dim":
                    # dim state LAST: the SCD2 merge must pre-date the batch
                    append_delta(self.spark, dim_log, batch_df, tag=tag)

            q = (
                self.spark.readStream.schema(sschema)
                .parquet(sdef.path)
                .writeStream.foreachBatch(handle)
                .option(
                    "checkpointLocation", os.path.join(root, f"_ckpt_{side}")
                )
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        _run_side("fact", fdef, fschema)
        _run_side("dim", ddef, dschema)

        if compact:
            self._compact_temporal_pipeline_logs(
                p, n_buckets=n_buckets,
                compact_min_deltas=compact_min_deltas,
                fact_order=fact_order, dim_valid_from=dim_valid_from,
            )
        self._materialize(self.streams[p.sink], _view())
        p.active = True

    def _compact_temporal_pipeline_logs(
        self,
        p,
        n_buckets: int,
        compact_min_deltas: int,
        fact_order: list[str] | None,
        dim_valid_from: str | None,
    ) -> None:
        """The temporal arm's LSM compaction — the inline trigger above and
        the project graph's deferred pass share this implementation (the
        ``_compact_join_pipeline_logs`` pattern). The dim history log is
        keyed (dim key, valid_from): its fold deduplicates replayed
        version rows, never drops a version."""
        from dbt_decodable_spark.operators import ivm_temporal as it
        from dbt_decodable_spark.streaming.changelog import (
            compact_and_vacuum,
            list_deltas,
        )

        spec0, ftbl, dtbl = it.temporal_spec_from_sql(p.sql, (), "__pending__")
        fdef, ddef = self.streams[ftbl], self.streams[dtbl]
        fkeys = list(fdef.schema.primary_key)
        valid_from = dim_valid_from or [w.name for w in ddef.schema.watermarks][0]
        forder = self._change_order(fact_order, fdef, fkeys, "fact")
        root = os.path.join(self.warehouse_dir, f"_ivmt_{p.name}")
        for log, keys_, ord_ in (
            (os.path.join(root, "fact"), fkeys, [F.col(c) for c in forder]),
            (
                os.path.join(root, "dim"),
                [spec0.dim_key, valid_from],
                [F.col(valid_from)],
            ),
            (os.path.join(root, "view"), fkeys, [F.col("__seq")]),
        ):
            if len(list_deltas(log)) >= compact_min_deltas:
                compact_and_vacuum(self.spark, log, keys_, ord_, n_buckets)

    def activate_pipeline_dag_incremental(
        self,
        name: str,
        upstream: str,
        fact_order: list[str] | None = None,
        dim_order: list[str] | None = None,
        fact_delete_col: str | None = None,
        dim_delete_col: str | None = None,
        n_buckets: int = 32,
        compact: bool = True,
        compact_min_deltas: int = 4,
        agg_compact_every: int = 4,
        agg_bucket_expr: str | None = None,
        emit_changes: bool = False,
    ):
        """Run a TWO-STAGE model DAG as continuously-maintained
        materializations: ``upstream`` is a lookup-join pipeline (the
        :meth:`activate_pipeline_join_incremental` shape) and ``name`` is
        an aggregate pipeline (the :meth:`activate_pipeline_incremental`
        GROUP BY shape) whose FROM table is the upstream's sink stream —
        the dbt ``sources → enriched → rollup`` chain the reference
        platform runs as a pipeline-per-model graph over shared streams
        (each model's sink stream is the next model's source;
        ``impl.py:419-447`` creates exactly that stream+pipeline pair).

        The downstream aggregate consumes the join view's CHANGE LOG —
        never a recompute of the view: every activation first advances the
        join stage (micro-batches append view deltas carrying
        ``__seq``/``__deleted``), then folds the pending slice of that log
        into the downstream aggregate state via one
        ``ivm_log_append`` ordered by ``__seq`` (see
        :mod:`.operators.ivm_dag` for the watermark protocol and why
        batching telescopes correctly). Join-log compaction runs AFTER the
        downstream step — the one cross-stage ordering invariant
        (compacting the view log past an unconsumed watermark would make
        the as-of state unreconstructible; ``maintain_downstream`` guards
        it with a base ``max(__seq)`` probe and raises
        ``DownstreamLagError``). Several aggregate pipelines may hang off
        one upstream: each keeps its own watermark root; activate them all
        before the view log accumulates ``compact_min_deltas`` deltas, or
        rebuild a lagging one (``ivm_dag.rebuild_downstream`` — O(|view|),
        nothing upstream re-runs).

        Downstream init is gated on a marker written LAST and the root is
        CLEARED before a (re)init — no downstream delta can exist before
        the marker, so a crash mid-init redoes it without double-counting
        (simpler than the aggregate arm's adoption path, which exists only
        for pre-marker legacy roots).

        ``emit_changes`` maintains the ROLLUP'S OWN change log under the
        downstream root (``out/``) — the depth-3 composition surface: the
        init image lands as a floor-seq batch and every consumption step
        appends its group-keyed upserts/tombstones
        (``ivm_log_batch_changes``, emitted BEFORE the state append so
        crash replays converge by tag), making ``fold(out log)`` equal the
        rollup view at every point. Read it with
        :meth:`read_pipeline_changes`."""
        from dbt_decodable_spark.operators import ivm_dag
        from dbt_decodable_spark.operators.ivm import agg_spec_from_sql
        from dbt_decodable_spark.operators.ivm_log import ivm_log_read

        if not self.warehouse_dir:
            raise CatalogError("incremental activation needs a warehouse_dir engine")
        p_agg = self.pipelines[self.qualify(name)]
        p_join = self.pipelines[self.qualify(upstream)]
        agg_spec, src_tbl = agg_spec_from_sql(p_agg.sql)
        if src_tbl != p_join.sink:
            raise CatalogError(
                f"DAG shape: {p_agg.name!r} must aggregate the upstream's "
                f"sink stream {p_join.sink!r}, not {src_tbl!r}"
            )
        # fire-before-write: the downstream stacks __g/__k/__gbucket onto
        # the view image and keys its state by the fact primary key, so a
        # view column with one of those names would be silently destroyed
        fkeys = list(self.streams[
            # the join arm validated these exist; resolve the fact stream
            # through the join SQL to key the downstream by its PK
            self._dag_fact_stream(p_join)
        ].schema.primary_key)
        view_reserved = {"__g", "__k", "__gbucket", "__mult"}
        sink_cols = set(
            f.name for f in self.streams[p_join.sink].schema.fields
        )
        bad = sorted(sink_cols & view_reserved)
        if bad:
            raise CatalogError(
                f"view column(s) {bad} collide with reserved downstream "
                "aggregate state names"
            )
        # stage 1: advance the join view (compaction DEFERRED — the
        # downstream must consume the new view deltas first)
        self.activate_pipeline_join_incremental(
            upstream,
            fact_order=fact_order,
            dim_order=dim_order,
            fact_delete_col=fact_delete_col,
            dim_delete_col=dim_delete_col,
            n_buckets=n_buckets,
            compact=False,
        )
        jroot = os.path.join(self.warehouse_dir, f"_ivmj_{p_join.name}")
        view_log = os.path.join(jroot, "view")

        # stage 2: fold the pending view changes into the downstream state
        self._run_downstream_stage(
            p_agg, agg_spec, view_log, fkeys,
            emit_changes=emit_changes,
            agg_bucket_expr=agg_bucket_expr,
            agg_compact_every=agg_compact_every,
        )

        # stage 3: NOW the join logs may compact (downstream watermark has
        # caught up to every committed view delta)
        if compact:
            self._compact_join_pipeline_logs(
                p_join, n_buckets=n_buckets,
                compact_min_deltas=compact_min_deltas,
                fact_order=fact_order, dim_order=dim_order,
            )
        droot = os.path.join(self.warehouse_dir, f"_ivmd_{p_agg.name}")
        self._materialize(
            self.streams[p_agg.sink],
            ivm_log_read(self.spark, droot, agg_spec),
        )
        p_agg.active = True

    def _run_downstream_stage(
        self,
        p_agg,
        agg_spec,
        view_log: str,
        keys: list[str],
        emit_changes: bool,
        agg_bucket_expr: str | None,
        agg_compact_every: int,
    ) -> int:
        """One maintained-aggregate stage over an upstream CHANGE LOG —
        the init-marker/emit-flag/watermark protocol shared by the
        two-stage DAG (:meth:`activate_pipeline_dag_incremental`, upstream
        = a join view log) and the N-node project graph
        (:meth:`activate_project_incremental`, upstream = a join view log
        OR another maintained rollup's emitted out log — the deltas-only
        shape :mod:`.operators.ivm_dag` auto-detects). Returns the stage's
        new consumed watermark."""
        from dbt_decodable_spark.operators import ivm_dag

        droot = os.path.join(self.warehouse_dir, f"_ivmd_{p_agg.name}")
        out_log = os.path.join(droot, "out")
        marker = os.path.join(droot, "_init_done")
        # the emission choice is a property of the ROOT, not of one
        # activation — persisted at init (like the join arm's _n_buckets)
        # and validated every re-activation. Enabling late is impossible
        # (the out log's init image is unrecoverable), and DISABLING for
        # one activation would be worse than an error: maintenance would
        # consume view seqs without emitting, silently punching a
        # permanent gap in the out log that a later emitting activation
        # papers over — fold(out log) would return stale pre-gap images
        # with no error ever raised.
        emit_file = os.path.join(droot, "_emit_changes")
        if os.path.exists(marker):
            if os.path.exists(emit_file):
                with open(emit_file) as fh:
                    persisted_emit = fh.read().strip() == "1"
            else:
                # pre-flag root: the out-deltas dir exists iff the root was
                # built emitting; persist the inferred answer
                persisted_emit = os.path.isdir(out_log + ".__deltas__")
                _write_atomic(emit_file, "1" if persisted_emit else "0")
            if emit_changes and not persisted_emit:
                raise CatalogError(
                    "change emission must be enabled from the FIRST "
                    "activation (the out log's init image is unrecoverable "
                    f"later) — delete {droot!r} to rebuild the downstream "
                    "with emit_changes"
                )
            if persisted_emit and not emit_changes:
                raise CatalogError(
                    "this downstream maintains an emitted change log — "
                    "every activation must keep emitting (a non-emitting "
                    "one would punch a permanent gap in the out log); pass "
                    f"emit_changes=True, or delete {droot!r} to rebuild "
                    "without emission"
                )
        if not os.path.exists(marker):
            # clear-then-init is redo-safe: appends are gated on the
            # marker, so a partial root holds no consumed delta to lose
            # (the out log lives under the root and is cleared with it)
            import shutil as _sh

            _sh.rmtree(droot, ignore_errors=True)
            floor = ivm_dag.init_downstream(
                self.spark, droot, view_log, keys, agg_spec,
                bucket_expr=agg_bucket_expr,
            )
            if emit_changes:
                # the change log must be self-contained: the init image is
                # its first batch, so fold(out log) == the view from the
                # floor onward
                from dbt_decodable_spark.operators.ivm_log import ivm_log_read
                from dbt_decodable_spark.streaming.changelog import append_delta

                init_img = (
                    ivm_log_read(self.spark, droot, agg_spec)
                    .withColumn("__seq", F.lit(floor).cast("long"))
                    .withColumn("__deleted", F.lit(False))
                )
                append_delta(self.spark, out_log, init_img, tag=str(floor))
            _write_atomic(emit_file, "1" if emit_changes else "0")
            _write_atomic(marker, "1")
        return ivm_dag.maintain_downstream(
            self.spark, droot, view_log, keys, agg_spec,
            compact_every=agg_compact_every,
            emit_log=out_log if emit_changes else None,
        )

    def _run_downstream_join_stage(
        self,
        p,
        up_log: str,
        up_keys: list[str],
        dim_order: list[str] | None,
        dim_delete_col: str | None,
        n_buckets: int,
    ) -> int:
        """One maintained LOOKUP-JOIN stage whose FACT side consumes an
        upstream node's CHANGE LOG instead of a raw stream — the last
        composition gap vs the reference platform, where ANY model's sink
        may source the next pipeline (``/root/reference/dbt/adapters/
        decodable/impl.py:419-447``): rollup → enrich-join → rollup.

        The insight that makes this the join arm unchanged: an upstream
        change log IS a keyed CDC stream — ``__seq`` is the change order,
        ``__deleted`` the tombstone flag. Ingest renames them to the
        state-only names ``__useq``/``__udel`` (the join's own view log
        stacks fresh ``__seq``/``__deleted`` onto its outputs), then the
        standard maintenance round runs with ``fact_order=[__useq]``,
        ``fact_delete_col="__udel"`` and both hidden from the view
        projection (``fact_hidden_cols``) — the view columns are exactly
        the upstream sink's columns plus the dim payload.

        Consumption is the DAG arm's watermark protocol, not a Spark
        stream (the upstream log is a delta directory whose files
        compaction deletes — file-based checkpoints would break): pending
        = upstream rows with ``__seq`` past the root's floor record,
        processed as ONE batch (correct for any batching — the keyed merge
        telescopes intermediate images), then the floor advances. Lag
        guards mirror :func:`~.operators.ivm_dag.maintain_downstream`:
        an upstream base/floor past this consumer's watermark raises
        :class:`~.operators.ivm_dag.DownstreamLagError` (delete the root
        to re-init from the current upstream state; downstream consumers
        of THIS join's view log must rebuild with it).

        Crash story (the join arm's, one level down): per batch the VIEW
        delta commits first, the fact STATE delta second, the floor LAST —
        a replay before the floor write recomputes bit-identical changes
        (state still excludes the batch, or the batch ties with its own
        landed state rows and changes nothing) and every append dedupes on
        its deterministic ``up<watermark>`` tag. The dim side stays a raw
        stream with the standard epoch/batch protocol; fact-stage view
        seqs use the same ``(epoch, side, batch)`` space so a later dim
        batch outranks this activation's fact batch, matching application
        order. Returns the consumed upstream watermark."""
        import dataclasses

        from dbt_decodable_spark.operators import ivm_dag
        from dbt_decodable_spark.operators import ivm_join as ij
        from dbt_decodable_spark.streaming.changelog import (
            append_delta,
            fold_last_image,
            list_deltas,
            read_merged,
            write_hash_partitioned,
        )

        spec0, ftbl, dtbl = ij.join_spec_from_sql(p.sql, ())
        ftbl, dtbl = self.qualify(ftbl), self.qualify(dtbl)
        spec = dataclasses.replace(spec0, fact_keys=tuple(up_keys))
        ddef = self.streams[dtbl]
        dkeys = list(ddef.schema.primary_key)
        if not dkeys:
            raise CatalogError(
                "the dim side must declare primary_key — incremental "
                "maintenance needs keyed change streams (schema.py:109-111)"
            )
        if tuple(dkeys) != spec.dim_keys:
            raise CatalogError(
                f"ON-clause dim columns {spec.dim_keys} must be exactly "
                f"{dtbl!r}'s primary_key {tuple(dkeys)}"
            )
        if not ddef.path:
            raise CatalogError(f"source stream {dtbl!r} is not parquet-backed")
        dorder = self._change_order(dim_order, ddef, dkeys, "dim")
        dordc = lambda: [F.col(c) for c in dorder]  # noqa: E731
        fordc = lambda: [F.col("__useq")]  # noqa: E731

        # fire-before-write: the fact side's columns are the upstream
        # SINK's schema; reject collisions with the state-only ingest
        # names, the view-log columns, and the round sentinels
        up_fields = [f.name for f in self.streams[ftbl].schema.fields]
        bad_fact = sorted(
            set(up_fields)
            & (
                set(ij._RESERVED)
                | {"__bucket", "__seq", "__deleted", "__useq", "__udel"}
            )
        )
        if bad_fact:
            raise CatalogError(
                f"upstream sink column(s) {bad_fact} collide with reserved "
                "maintenance names"
            )
        missing_fk = sorted(set(spec.fk_cols) - set(up_fields))
        if missing_fk:
            raise CatalogError(
                f"fk column(s) {missing_fk} are not columns of the "
                f"upstream sink {ftbl!r}"
            )
        for out in spec.dim_payload:
            if out in up_fields:
                raise CatalogError(
                    f"payload name {out!r} collides with a fact column"
                )
        bad_payload = sorted(
            set(spec.dim_payload) & {"__bucket", "__seq", "__deleted"}
        )
        if bad_payload:
            raise CatalogError(
                f"payload output name(s) {bad_payload} collide with "
                "reserved view-log columns"
            )
        dschema = self.spark.read.parquet(ddef.path).schema
        if dim_delete_col is not None and dim_delete_col not in dschema.fieldNames():
            raise CatalogError(
                f"dim_delete_col {dim_delete_col!r} is not a column of the "
                "dim stream"
            )
        if "__bucket" in dschema.fieldNames():
            raise CatalogError(
                "dim column '__bucket' collides with the bucketed snapshot "
                "layout column"
            )

        root = os.path.join(self.warehouse_dir, f"_ivmjd_{p.name}")
        fact_log = os.path.join(root, "fact")
        dim_log = os.path.join(root, "dim")
        view_log = os.path.join(root, "view")
        nb_file = os.path.join(root, "_n_buckets")
        init_marker = os.path.join(root, "_init_done")

        def _ingest(rows):
            return rows.withColumnRenamed("__seq", "__useq").withColumnRenamed(
                "__deleted", "__udel"
            )

        if not os.path.exists(init_marker):
            # clear-then-init is redo-safe: every append below is gated on
            # the marker, so a partial root holds no consumed delta to lose
            import shutil as _sh

            _sh.rmtree(root, ignore_errors=True)
            os.makedirs(root, exist_ok=True)
            _write_atomic(nb_file, str(n_buckets))
            # dim offsets BEFORE the dim fold (the no-op init pass both
            # raw arms run); the fact side has no stream — its floor is
            # captured from the same listing its fold reads
            _advance_stream_offsets(
                self.spark, ddef.path, dschema,
                os.path.join(root, "_ckpt_dim"),
            )
            base, drows = ivm_dag._view_rows(self.spark, up_log)
            fsnap = _ingest(
                fold_last_image(
                    base.unionByName(drows), list(up_keys),
                    [F.col("__seq")],
                ).localCheckpoint(eager=False)
            )
            floor_row = fsnap.agg(F.max("__useq").alias("m")).collect()[0]
            floor = int(floor_row["m"]) if floor_row["m"] is not None else 0
            # the fold consumed the ENTIRE listed log, so the consumed
            # floor must also cover seqs the log no longer RETAINS rows
            # for — a compaction fold keeps only live images, whose max
            # seq can sit BELOW the durable compaction floor (e.g. the
            # newest change was a group death), and a floor derived from
            # the retained rows alone would trip this stage's own lag
            # guard on the very next step
            floor = max(floor, ivm_dag._log_compaction_floor(up_log))
            if ivm_dag._has_parquet(up_log):
                bm = ivm_dag._base_max_seq(up_log)
                if bm is not None:
                    floor = max(floor, int(bm))
            dsnap = fold_last_image(
                self.spark.read.parquet(ddef.path), dkeys, dordc()
            )
            write_hash_partitioned(fsnap, fact_log, list(up_keys), n_buckets)
            write_hash_partitioned(dsnap, dim_log, dkeys, n_buckets)
            v0 = (
                ij.compute_join_view(
                    self.spark.read.parquet(fact_log).drop("__bucket"),
                    self.spark.read.parquet(dim_log).drop("__bucket"),
                    spec, "__udel", dim_delete_col,
                    fact_hidden_cols=("__useq",),
                )
                .withColumn("__seq", F.lit(0).cast("long"))
                .withColumn("__deleted", F.lit(False))
            )
            write_hash_partitioned(v0, view_log, list(up_keys), n_buckets)
            ivm_dag._write_floor(root, floor)
            _write_atomic(init_marker, "1")
        with open(nb_file) as fh:
            persisted_nb = int(fh.read().strip())
        if persisted_nb != n_buckets:
            raise CatalogError(
                f"n_buckets={n_buckets} does not match the bucket layout "
                f"this view was created with ({persisted_nb}) — re-activate "
                f"with n_buckets={persisted_nb} or delete {root!r}"
            )
        epoch_file = os.path.join(root, "_epoch")
        epoch = 0
        if os.path.exists(epoch_file):
            with open(epoch_file) as fh:
                epoch = int(fh.read().strip() or 0)
        epoch += 1
        _write_atomic(epoch_file, str(epoch))

        def _state():
            return ij.JoinViewState(
                fact=read_merged(
                    self.spark, fact_log, list(up_keys), fordc(),
                    include_tombstones=True, prune_fold=True,
                ),
                dim=read_merged(
                    self.spark, dim_log, dkeys, dordc(),
                    include_tombstones=True, prune_fold=True,
                ),
                view=read_merged(
                    self.spark, view_log, list(up_keys), [F.col("__seq")],
                    delete_col="__deleted", prune_fold=True,
                ).drop("__seq", "__deleted"),
            )

        fact_state_schema = self.spark.read.parquet(fact_log).drop(
            "__bucket"
        ).schema

        # ---- fact stage: consume the upstream log past the floor
        w = ivm_dag.downstream_watermark(root)
        base, drows = ivm_dag._view_rows(self.spark, up_log)
        from dbt_decodable_spark.operators.ivm_dag import DownstreamLagError

        if ivm_dag._has_parquet(up_log):
            base_max = ivm_dag._base_max_seq(up_log)
            if base_max is None:
                base_max = base.agg(F.max("__seq").alias("m")).collect()[0]["m"]
            if base_max is not None and int(base_max) > w:
                raise DownstreamLagError(
                    f"upstream log {up_log!r} base snapshot holds "
                    f"__seq={base_max} > join-stage watermark {w} — it was "
                    f"compacted past this consumer; delete {root!r} to "
                    "re-initialize from the current upstream state "
                    "(downstream consumers of this join rebuild with it)"
                )
        else:
            log_floor = ivm_dag._log_compaction_floor(up_log)
            if log_floor > w:
                raise DownstreamLagError(
                    f"upstream log {up_log!r} was compacted to floor "
                    f"{log_floor} > join-stage watermark {w} — tombstones "
                    f"this consumer never saw are gone; delete {root!r} to "
                    "re-initialize from the current upstream state "
                    "(downstream consumers of this join rebuild with it)"
                )
        pending = drows.filter(F.col("__seq") > F.lit(w))
        new_w_row = pending.agg(F.max("__seq").alias("m")).collect()[0]
        new_w = w
        if new_w_row["m"] is not None:
            new_w = int(new_w_row["m"])
            fb = _ingest(pending)
            seq = (epoch * 2) << 33
            _st, changes = ij.maintain_join_with_changes(
                _state(), fb,
                self.spark.createDataFrame([], dschema),
                fordc(), dordc(), spec, seq=seq,
                fact_delete_col="__udel", dim_delete_col=dim_delete_col,
                fact_hidden_cols=("__useq",),
            )
            changes = changes.localCheckpoint(eager=True)
            # VIEW delta first, state second, floor LAST (crash story)
            if changes.count() > 0:
                append_delta(
                    self.spark, view_log, changes, tag=f"view-up{new_w}"
                )
            append_delta(self.spark, fact_log, fb, tag=f"fact-up{new_w}")
            ivm_dag._write_floor(root, new_w)

        # ---- dim stage: the raw arm's bounded stream, fact side empty
        def handle(batch_df, batch_id):
            seq = ((epoch * 2 + 1) << 33) + batch_id
            tag = f"dim-{epoch}-{batch_id}"
            _st, changes = ij.maintain_join_with_changes(
                _state(),
                self.spark.createDataFrame([], fact_state_schema),
                batch_df, fordc(), dordc(), spec, seq=seq,
                fact_delete_col="__udel", dim_delete_col=dim_delete_col,
                fact_hidden_cols=("__useq",),
            )
            changes = changes.localCheckpoint(eager=True)
            if changes.count() > 0:
                append_delta(
                    self.spark, view_log, changes, tag=f"view-{tag}"
                )
            append_delta(self.spark, dim_log, batch_df, tag=tag)

        q = (
            self.spark.readStream.schema(dschema)
            .parquet(ddef.path)
            .writeStream.foreachBatch(handle)
            .option("checkpointLocation", os.path.join(root, "_ckpt_dim"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

        live = read_merged(
            self.spark, view_log, list(up_keys), [F.col("__seq")],
            delete_col="__deleted", prune_fold=True,
        ).drop("__seq", "__deleted")
        self._materialize(self.streams[p.sink], live)
        p.active = True
        return new_w

    def _compact_downstream_join_logs(
        self, p, up_keys: list[str], dim_order: list[str] | None,
        n_buckets: int, compact_min_deltas: int,
    ) -> None:
        """LSM compaction for a mid-graph join stage's three logs — the
        ``_ivmjd_`` twin of :meth:`_compact_join_pipeline_logs` (fact
        folds by the ingest order column ``__useq``)."""
        from dbt_decodable_spark.operators import ivm_join as ij
        from dbt_decodable_spark.streaming.changelog import (
            compact_and_vacuum,
            list_deltas,
        )

        _, _ftbl, dtbl = ij.join_spec_from_sql(p.sql, ())
        ddef = self.streams[self.qualify(dtbl)]
        dkeys = list(ddef.schema.primary_key)
        dorder = self._change_order(dim_order, ddef, dkeys, "dim")
        root = os.path.join(self.warehouse_dir, f"_ivmjd_{p.name}")
        for log, keys_, ord_ in (
            (os.path.join(root, "fact"), list(up_keys), [F.col("__useq")]),
            (os.path.join(root, "dim"), dkeys, [F.col(c) for c in dorder]),
            (os.path.join(root, "view"), list(up_keys), [F.col("__seq")]),
        ):
            if len(list_deltas(log)) >= compact_min_deltas:
                compact_and_vacuum(self.spark, log, keys_, ord_, n_buckets)

    def _join_node_root(self, info: dict, nd: dict) -> str:
        """Warehouse-relative root of a join node's state: the raw arm
        (``_ivmj_``) when the fact side is a raw stream, the mid-graph
        arm (``_ivmjd_``) when it consumes another node's sink — kind
        pinned by the persisted root exactly like :meth:`_agg_node_root`
        (a contradicting activation set raises instead of silently
        re-initializing under the other prefix)."""
        name, short, ftbl = nd["p"].name, nd["short"], nd["srcs"][0]
        persisted = next(
            (
                prefix
                for prefix in ("_ivmjd_", "_ivmj_")
                if os.path.exists(
                    os.path.join(
                        self.warehouse_dir, f"{prefix}{name}", "_init_done"
                    )
                )
            ),
            None,
        )
        sinks = {d["p"].sink for d in info.values()}
        from_set = "_ivmjd_" if ftbl in sinks else "_ivmj_"
        if persisted == "_ivmjd_" and from_set == "_ivmj_":
            raise CatalogError(
                f"join {short!r} was built as a MID-GRAPH stage consuming "
                f"the change log behind {ftbl!r}, but this activation set "
                "does not include that producer — include it, or delete "
                f"{os.path.join(self.warehouse_dir, f'_ivmjd_{name}')!r} "
                "to rebuild the node over raw streams"
            )
        if persisted == "_ivmj_" and from_set == "_ivmjd_":
            raise CatalogError(
                f"join {short!r} was built over RAW streams, but this "
                "activation set also activates a producer for its fact "
                "source — delete "
                f"{os.path.join(self.warehouse_dir, f'_ivmj_{name}')!r} to "
                "rebuild the node as a mid-graph stage"
            )
        return f"{persisted or from_set}{name}"

    def _node_view_keys(self, info: dict, nd: dict) -> list[str]:
        """The key columns of a node's change-log view — what a consumer
        folds/merges it by: an aggregate's group columns, a join's fact
        keys (for a mid-graph join: its UPSTREAM's view keys, resolved
        recursively), a temporal join's fact primary key."""
        from dbt_decodable_spark.operators import ivm_temporal

        if nd["kind"] == "agg":
            return list(nd["aspec"].group_cols)
        if nd["kind"] == "temporal":
            _t, t_ftbl, _d = ivm_temporal.temporal_spec_from_sql(
                nd["p"].sql, (), "__pending__"
            )
            return list(self.streams[self.qualify(t_ftbl)].schema.primary_key)
        producers = {d["p"].sink: q for q, d in info.items()}
        ftbl = nd["srcs"][0]
        if ftbl in producers:
            return self._node_view_keys(info, info[producers[ftbl]])
        return list(
            self.streams[self._dag_fact_stream(nd["p"])].schema.primary_key
        )

    def _upstream_change_log(self, info: dict, und: dict) -> tuple[str, list[str]]:
        """(change-log path, key columns) of a producer node — what any
        consumer stage (aggregate or mid-graph join) reads."""
        if und["kind"] == "join":
            log = os.path.join(
                self.warehouse_dir, self._join_node_root(info, und), "view"
            )
        elif und["kind"] == "temporal":
            log = os.path.join(
                self.warehouse_dir, f"_ivmt_{und['p'].name}", "view"
            )
        else:
            log = os.path.join(
                self.warehouse_dir, self._agg_node_root(info, und), "out"
            )
        return log, self._node_view_keys(info, und)

    def _agg_node_root(self, info: dict, nd: dict) -> str:
        """Warehouse-relative root of an aggregate node's state: the raw
        aggregate arm (``_ivm_``) when its source is a raw stream, the
        downstream-stage arm (``_ivmd_``) when it consumes another node's
        sink — both emit their change log at ``<root>/out``.

        The kind is PINNED by the persisted root (init-marker-gated, the
        ``_ivmd_``-first order :meth:`read_pipeline_changes` resolves by)
        once one exists: re-resolving from the current activation set alone
        would let a later run that omits the producer silently re-init the
        node as a raw-stream aggregate over the sink parquet under the
        other prefix — a persisted kind that contradicts the set raises
        instead (ADVICE r12)."""
        name, short, src = nd["p"].name, nd["short"], nd["srcs"][0]
        persisted = next(
            (
                prefix
                for prefix in ("_ivmd_", "_ivm_")
                if os.path.exists(
                    os.path.join(
                        self.warehouse_dir, f"{prefix}{name}", "_init_done"
                    )
                )
            ),
            None,
        )
        sinks = {d["p"].sink for d in info.values()}
        from_set = "_ivmd_" if src in sinks else "_ivm_"
        if persisted == "_ivmd_" and from_set == "_ivm_":
            raise CatalogError(
                f"aggregate {short!r} was built as a DOWNSTREAM stage "
                f"consuming the change log behind {src!r}, but this "
                "activation set does not include that producer — include "
                f"it, or delete {os.path.join(self.warehouse_dir, f'_ivmd_{name}')!r} "
                "to rebuild the node as a raw-stream aggregate"
            )
        if persisted == "_ivm_" and from_set == "_ivmd_":
            raise CatalogError(
                f"aggregate {short!r} was built as a RAW-STREAM aggregate "
                f"over {src!r}, but this activation set also activates a "
                "producer for that sink — delete "
                f"{os.path.join(self.warehouse_dir, f'_ivm_{name}')!r} to "
                "rebuild the node as a downstream stage"
            )
        return f"{persisted or from_set}{name}"

    def activate_project_incremental(
        self,
        nodes: dict[str, dict] | list[str],
        n_buckets: int = 32,
        compact: bool = True,
        compact_min_deltas: int = 4,
        agg_compact_every: int = 4,
    ) -> dict[str, int]:
        """Run an N-NODE model graph as continuously-maintained
        materializations — the reference platform's actual project shape:
        a stream+pipeline pair per model where any model's sink stream may
        be the next model's source (``/root/reference/dbt/adapters/
        decodable/impl.py:419-447`` creates exactly that pair for EVERY
        model in the project; the functional test runs a seed→model→test
        graph, ``tests/functional/adapter/simple/test_simple_project.py``).
        Generalizes :meth:`activate_pipeline_dag_incremental`'s fixed
        two-stage join→rollup chain to arbitrary depth and fan-out.

        ``nodes`` maps pipeline name → per-node options (or a plain list
        for all-default options): ``fact_order``/``dim_order``/
        ``fact_delete_col``/``dim_delete_col`` for join nodes,
        ``order``/``delete_col`` for aggregates over raw streams,
        ``agg_bucket_expr``/``emit_changes`` for any aggregate node.
        The graph is derived from the pipeline SQL itself (each node's
        FROM tables vs the other nodes' sinks) and activated in
        topological order; a cycle or a sink written twice raises before
        any write.

        Node kinds and how each is maintained:

        - **join** (the ``f.* + d.<col>`` lookup-join shape): the join IVM
          arm, compaction deferred. The FACT side may be a raw stream OR
          another node's sink (r13 — the mid-graph join stage,
          :meth:`_run_downstream_join_stage`: the upstream's change log is
          consumed as a keyed CDC stream); the DIM side must read a raw
          change stream (an SCD-correct maintained dim over a change log
          is the temporal arm's semantics, not the lookup join's).
        - **temporal join** (``FOR SYSTEM_TIME AS OF`` — the reference's
          change-stream dim semantics): the SCD2-temporal IVM arm
          (:meth:`activate_pipeline_temporal_incremental`); its view log
          composes downstream exactly like a join node's. Same raw-stream
          restriction; per-node options ``fact_order``/``fact_delete_col``/
          ``dim_valid_from``.
        - **aggregate over a raw stream**: the aggregate IVM arm
          (:meth:`activate_pipeline_incremental`). With consumers it
          emits its own change log (``_ivm_<name>/out``) batch-by-batch,
          so a chain may be ROOTED at a plain GROUP-BY model — the
          reference's ``model → model`` composition with no join anywhere
          (``impl.py:419-447``).
        - **aggregate over another node's sink**: a downstream stage
          (:meth:`_run_downstream_stage`) consuming the upstream's CHANGE
          LOG — a join node's view log, or an aggregate node's emitted
          ``out/`` log (the deltas-only shape ``ivm_dag`` auto-detects).
          A node with consumers emits its own change log automatically,
          so ``join → rollup → rollup-consumer → …`` composes to any
          depth; each edge is O(|changes|) per activation, never a view
          recompute.

        Cross-stage invariants, held by ordering inside ONE activation:
        every consumer stage runs BEFORE its producer's log compacts
        (join logs via the deferred :meth:`_compact_join_pipeline_logs`
        pass; emitted out logs via ``compact_change_log(upto_seq=`` the
        MINIMUM consumer watermark``)`` — Kafka's delete-retention floor,
        never past a lagging consumer in this set). A consumer NOT in
        this activation that lags a later compaction hits the
        ``DownstreamLagError`` guard and rebuilds — the same recovery
        contract as the two-stage method.

        Cascade key contract: a stage consuming a rollup's change log is
        keyed by the rollup's GROUP columns, so those must be non-null in
        the data (the reference's primary-key-constraint stance on change
        streams, ``decodable/client/schema.py:109-111``; a NULL group
        would break the keyed old-image join).

        Returns {pipeline name: consumed watermark} for every
        log-consuming stage."""
        from collections import deque

        from dbt_decodable_spark.operators import ivm_join as ij
        from dbt_decodable_spark.operators import ivm_temporal
        from dbt_decodable_spark.operators.ivm import agg_spec_from_sql
        from dbt_decodable_spark.operators.ivm_log import ivm_log_read
        from dbt_decodable_spark.streaming.changelog import (
            CompactionLockHeld,
            compact_change_log,
            list_deltas,
        )

        if not self.warehouse_dir:
            raise CatalogError("incremental activation needs a warehouse_dir engine")
        if not isinstance(nodes, dict):
            nodes = {n: {} for n in nodes}
        info: dict[str, dict] = {}
        for short, opts in nodes.items():
            qn = self.qualify(short)
            p = self.pipelines[qn]
            try:
                _jspec, ftbl, dtbl = ij.join_spec_from_sql(p.sql, ())
                nd = dict(kind="join", srcs=(ftbl, dtbl), aspec=None)
            except ValueError:
                try:
                    _tspec, ftbl, dtbl = ivm_temporal.temporal_spec_from_sql(
                        p.sql, (), "__pending__"
                    )
                    nd = dict(kind="temporal", srcs=(ftbl, dtbl), aspec=None)
                except ValueError:
                    try:
                        aspec, src = agg_spec_from_sql(p.sql)
                        nd = dict(kind="agg", srcs=(src,), aspec=aspec)
                    except ValueError:
                        raise CatalogError(
                            f"pipeline {short!r} is none of the "
                            "maintainable shapes (lookup join, FOR "
                            "SYSTEM_TIME AS OF temporal join, GROUP BY) — "
                            "see join_spec_from_sql / "
                            "temporal_spec_from_sql / agg_spec_from_sql"
                        ) from None
            nd.update(p=p, short=short, opts=dict(opts or {}))
            info[qn] = nd
        producers: dict[str, str] = {}
        for qn, nd in info.items():
            if nd["p"].sink in producers:
                raise CatalogError(
                    f"two pipelines in the set write sink {nd['p'].sink!r}"
                )
            producers[nd["p"].sink] = qn
        indeg = {qn: 0 for qn in info}
        consumers: dict[str, list[str]] = {qn: [] for qn in info}
        for qn, nd in info.items():
            for s in nd["srcs"]:
                up = producers.get(s)
                if up is not None:
                    indeg[qn] += 1
                    consumers[up].append(qn)
        ready = deque(sorted(q for q, d in indeg.items() if d == 0))
        topo: list[str] = []
        while ready:
            qn = ready.popleft()
            topo.append(qn)
            for c in sorted(consumers[qn]):
                indeg[c] -= 1
                if indeg[c] == 0:
                    ready.append(c)
        if len(topo) != len(info):
            cyc = sorted(info[q]["short"] for q, d in indeg.items() if d > 0)
            raise CatalogError(f"pipeline graph has a cycle through {cyc}")
        # fire-before-write: every shape violation raises before ANY node
        # creates roots or advances checkpoints (the join/agg arms'
        # standing invariant, lifted to the graph)
        view_reserved = {"__g", "__k", "__gbucket", "__mult"}
        for qn in topo:
            nd = info[qn]
            if nd["kind"] == "join":
                # the FACT side may consume another node's change log (the
                # mid-graph join stage); the DIM side must stay a raw
                # stream — an SCD-correct maintained dim over a change log
                # is the temporal arm's job, not the lookup join's
                if nd["srcs"][1] in producers:
                    raise CatalogError(
                        f"join stage {nd['short']!r} reads "
                        f"{nd['srcs'][1]!r}, another model's sink, as its "
                        "DIM side — maintained join dims must read raw "
                        "change streams (the fact side may consume a "
                        "model's sink)"
                    )
                continue
            if nd["kind"] == "temporal":
                for s in nd["srcs"]:
                    if s in producers:
                        raise CatalogError(
                            f"temporal stage {nd['short']!r} reads "
                            f"{s!r}, another model's sink — maintained "
                            "temporal joins must read raw change streams"
                        )
                continue
            src = nd["srcs"][0]
            if bool(consumers[qn]) or bool(nd["opts"].get("emit_changes")):
                # an emitting rollup stacks __seq/__deleted onto its view
                # outputs — raise here, before ANY graph node writes
                bad_out = sorted(
                    set(nd["aspec"].outputs()) & {"__seq", "__deleted"}
                )
                if bad_out:
                    raise CatalogError(
                        f"aggregate {nd['short']!r} output name(s) "
                        f"{bad_out} collide with reserved change-log "
                        "columns — rename the aggregate aliases"
                    )
            if src not in producers:
                continue
            bad = sorted(
                {f.name for f in self.streams[src].schema.fields}
                & view_reserved
            )
            if bad:
                raise CatalogError(
                    f"consumed stream {src!r} column(s) {bad} collide "
                    "with reserved downstream aggregate state names"
                )
        watermarks: dict[str, int] = {}
        for qn in topo:
            nd = info[qn]
            short, opts, p = nd["short"], nd["opts"], nd["p"]
            if nd["kind"] == "join":
                # kind pin (raises if a persisted root contradicts the set)
                jroot = self._join_node_root(info, nd)
                if jroot.startswith("_ivmjd_"):
                    up = info[producers[nd["srcs"][0]]]
                    up_log, up_keys = self._upstream_change_log(info, up)
                    w = self._run_downstream_join_stage(
                        p, up_log, up_keys,
                        dim_order=opts.get("dim_order"),
                        dim_delete_col=opts.get("dim_delete_col"),
                        n_buckets=n_buckets,
                    )
                    watermarks[short] = w
                else:
                    self.activate_pipeline_join_incremental(
                        short,
                        fact_order=opts.get("fact_order"),
                        dim_order=opts.get("dim_order"),
                        fact_delete_col=opts.get("fact_delete_col"),
                        dim_delete_col=opts.get("dim_delete_col"),
                        n_buckets=n_buckets,
                        compact=False,  # deferred past every consumer
                    )
                continue
            if nd["kind"] == "temporal":
                self.activate_pipeline_temporal_incremental(
                    short,
                    fact_order=opts.get("fact_order"),
                    dim_valid_from=opts.get("dim_valid_from"),
                    fact_delete_col=opts.get("fact_delete_col"),
                    n_buckets=n_buckets,
                    compact=False,  # deferred past every consumer
                )
                continue
            src = nd["srcs"][0]
            up = producers.get(src)
            # kind pin: a persisted root that contradicts this set's
            # classification raises here, BEFORE either arm re-inits the
            # node's state under the other prefix
            self._agg_node_root(info, nd)
            if up is None:
                self.activate_pipeline_incremental(
                    short,
                    order=opts.get("order"),
                    delete_col=opts.get("delete_col"),
                    bucket_expr=opts.get("agg_bucket_expr"),
                    compact_every=agg_compact_every,
                    emit_changes=bool(consumers[qn])
                    or bool(opts.get("emit_changes")),
                )
                continue
            und = info[up]
            log, keys = self._upstream_change_log(info, und)
            w = self._run_downstream_stage(
                p, nd["aspec"], log, keys,
                emit_changes=bool(consumers[qn])
                or bool(opts.get("emit_changes")),
                agg_bucket_expr=opts.get("agg_bucket_expr"),
                agg_compact_every=agg_compact_every,
            )
            watermarks[short] = w
            droot = os.path.join(self.warehouse_dir, f"_ivmd_{p.name}")
            self._materialize(
                self.streams[p.sink],
                ivm_log_read(self.spark, droot, nd["aspec"]),
            )
            p.active = True
        if compact:
            # one deferred pass, AFTER every consumer in the set advanced
            for qn in topo:
                nd = info[qn]
                if nd["kind"] == "join":
                    if nd["srcs"][0] in producers:
                        self._compact_downstream_join_logs(
                            nd["p"],
                            up_keys=self._node_view_keys(info, nd),
                            dim_order=nd["opts"].get("dim_order"),
                            n_buckets=n_buckets,
                            compact_min_deltas=compact_min_deltas,
                        )
                    else:
                        self._compact_join_pipeline_logs(
                            nd["p"], n_buckets=n_buckets,
                            compact_min_deltas=compact_min_deltas,
                            fact_order=nd["opts"].get("fact_order"),
                            dim_order=nd["opts"].get("dim_order"),
                        )
                elif nd["kind"] == "temporal":
                    self._compact_temporal_pipeline_logs(
                        nd["p"], n_buckets=n_buckets,
                        compact_min_deltas=compact_min_deltas,
                        fact_order=nd["opts"].get("fact_order"),
                        dim_valid_from=nd["opts"].get("dim_valid_from"),
                    )
                elif consumers[qn]:
                    upto = min(
                        watermarks[info[c]["short"]] for c in consumers[qn]
                    )
                    out_log = os.path.join(
                        self.warehouse_dir,
                        self._agg_node_root(info, nd),
                        "out",
                    )
                    if len(list_deltas(out_log)) >= compact_min_deltas:
                        try:
                            compact_change_log(
                                self.spark, out_log,
                                list(nd["aspec"].group_cols),
                                upto_seq=upto,
                            )
                        except CompactionLockHeld:
                            pass  # another process compacting; next pass
        return watermarks

    def read_pipeline_changes(self, name: str) -> DataFrame:
        """The change stream a DAG-activated aggregate pipeline emitted
        (``activate_pipeline_dag_incremental(..., emit_changes=True)``):
        raw group-keyed upserts/tombstones with ``__seq``/``__deleted``,
        in log order. A consumer folds it (``fold_last_image`` by the
        group columns over ``__seq``) or stacks on it (SCD2, MERGE) — the
        fold equals the rollup view at every point (pytest-pinned)."""
        from dbt_decodable_spark.streaming.changelog import list_deltas

        p = self.pipelines[self.qualify(name)]
        # a log-consuming stage's root is _ivmd_<name>; a raw-stream
        # aggregate's is _ivm_<name> — whichever exists holds the out log
        droot = os.path.join(self.warehouse_dir, f"_ivmd_{p.name}")
        if not os.path.isdir(droot) and os.path.isdir(
            os.path.join(self.warehouse_dir, f"_ivm_{p.name}")
        ):
            droot = os.path.join(self.warehouse_dir, f"_ivm_{p.name}")
        out_log = os.path.join(droot, "out")
        deltas = list_deltas(out_log)
        if not deltas:
            # distinguish "emission never enabled" from "log exists but
            # every retained delta was compacted away" (ADVICE r10 — a
            # fully-tombstoned fold deletes all deltas; the old error
            # wrongly told the caller to re-activate with emit_changes)
            emit_file = os.path.join(droot, "_emit_changes")
            emitting = False
            if os.path.exists(emit_file):
                with open(emit_file) as fh:
                    emitting = fh.read().strip() == "1"
            if emitting:
                from pyspark.sql.types import (
                    BooleanType, LongType, StructField, StructType,
                )

                sink = self.streams[p.sink]
                schema = StructType(
                    list(sink.schema.to_struct_type().fields)
                    + [
                        StructField("__seq", LongType(), True),
                        StructField("__deleted", BooleanType(), True),
                    ]
                )
                return self.spark.createDataFrame([], schema)
            raise CatalogError(
                f"pipeline {name!r} has no emitted change log — activate "
                "with emit_changes=True"
            )
        return self.spark.read.parquet(*deltas)

    def rebuild_pipeline_downstream(
        self, name: str, upstream: str, agg_bucket_expr: str | None = None
    ) -> int:
        """The :class:`~.ivm_dag.DownstreamLagError` recovery through the
        engine: drop the DAG downstream's root and re-initialize it from
        the CURRENT upstream state — O(|view|), nothing upstream re-runs.
        The upstream may be ANY producer node kind (r12): a lookup-join
        pipeline (its view log), a temporal-join pipeline (its view log),
        or another rollup (its emitted out log — the pure-delta shape).
        The root's persisted emission choice is honored: an emitting
        root's out log (which lives under the root and dies with it) is
        re-seeded with the new floor image, so ``fold(out log) == the
        rollup view`` holds from the new floor onward. Mid-stream
        consumers of the old out log must re-bootstrap from the floor —
        the lag error means history they never consumed is already
        unreconstructible."""
        from dbt_decodable_spark.operators import ivm_dag
        from dbt_decodable_spark.operators import ivm_join as ij
        from dbt_decodable_spark.operators import ivm_temporal
        from dbt_decodable_spark.operators.ivm import agg_spec_from_sql
        from dbt_decodable_spark.operators.ivm_log import ivm_log_read

        if not self.warehouse_dir:
            raise CatalogError("incremental activation needs a warehouse_dir engine")
        p_agg = self.pipelines[self.qualify(name)]
        p_up = self.pipelines[self.qualify(upstream)]
        agg_spec, src_tbl = agg_spec_from_sql(p_agg.sql)
        if src_tbl != p_up.sink:
            raise CatalogError(
                f"DAG shape: {p_agg.name!r} must aggregate the upstream's "
                f"sink stream {p_up.sink!r}, not {src_tbl!r}"
            )
        # resolve the upstream's change log + its key, by node kind
        try:
            ij.join_spec_from_sql(p_up.sql, ())
            up_log = os.path.join(
                self.warehouse_dir, f"_ivmj_{p_up.name}", "view"
            )
            keys = list(
                self.streams[self._dag_fact_stream(p_up)].schema.primary_key
            )
        except ValueError:
            try:
                _t, t_ftbl, _d = ivm_temporal.temporal_spec_from_sql(
                    p_up.sql, (), "__pending__"
                )
                up_log = os.path.join(
                    self.warehouse_dir, f"_ivmt_{p_up.name}", "view"
                )
                keys = list(
                    self.streams[self.qualify(t_ftbl)].schema.primary_key
                )
            except ValueError:
                up_spec, _src = agg_spec_from_sql(p_up.sql)
                keys = list(up_spec.group_cols)
                uproot = os.path.join(
                    self.warehouse_dir, f"_ivmd_{p_up.name}"
                )
                if not os.path.isdir(uproot) and os.path.isdir(
                    os.path.join(self.warehouse_dir, f"_ivm_{p_up.name}")
                ):
                    uproot = os.path.join(
                        self.warehouse_dir, f"_ivm_{p_up.name}"
                    )
                up_log = os.path.join(uproot, "out")
        droot = os.path.join(self.warehouse_dir, f"_ivmd_{p_agg.name}")
        out_log = os.path.join(droot, "out")
        emit_file = os.path.join(droot, "_emit_changes")
        # read the persisted emission choice BEFORE the rebuild clears it
        if os.path.exists(emit_file):
            with open(emit_file) as fh:
                emitting = fh.read().strip() == "1"
        else:
            emitting = os.path.isdir(out_log + ".__deltas__")
        floor = ivm_dag.rebuild_downstream(
            self.spark, droot, up_log, keys, agg_spec,
            bucket_expr=agg_bucket_expr,
            emit_log=out_log if emitting else None,
        )
        _write_atomic(emit_file, "1" if emitting else "0")
        _write_atomic(os.path.join(droot, "_init_done"), "1")
        self._materialize(
            self.streams[p_agg.sink],
            ivm_log_read(self.spark, droot, agg_spec),
        )
        return floor

    def compact_pipeline_changes(
        self, name: str, upto_seq: int | None = None
    ) -> dict:
        """Kafka-style compaction of the change log a DAG-activated
        aggregate pipeline emits (:meth:`read_pipeline_changes`): fold the
        emitted history up to ``upto_seq`` (default: all of it) into one
        live-rows-only floor image keyed by the group columns, dropping
        tombstoned groups. Without this the out log grows with every
        change ever emitted; compacted, its size is O(|groups| + changes
        since the floor) and a fresh consumer bootstraps from the floor
        image instead of replaying history. The caller owns the floor:
        compact only past a sequence every mid-stream consumer has passed
        (a consumer parked below it would miss the dropped tombstones) —
        the same contract as the view-log/downstream watermark ordering.
        ``fold(out log) == the rollup view`` holds unchanged after
        compaction (pytest-pinned)."""
        from dbt_decodable_spark.operators.ivm import agg_spec_from_sql
        from dbt_decodable_spark.streaming.changelog import (
            compact_change_log,
            list_deltas,
        )

        p = self.pipelines[self.qualify(name)]
        spec, _ = agg_spec_from_sql(p.sql)
        # log-consuming stage roots are _ivmd_<name>; raw-stream aggregate
        # roots are _ivm_<name> (r12) — same resolution as
        # read_pipeline_changes
        out_log = os.path.join(self.warehouse_dir, f"_ivmd_{p.name}", "out")
        if not list_deltas(out_log):
            alt = os.path.join(self.warehouse_dir, f"_ivm_{p.name}", "out")
            if list_deltas(alt):
                out_log = alt
        if not list_deltas(out_log):
            raise CatalogError(
                f"pipeline {name!r} has no emitted change log — activate "
                "with emit_changes=True"
            )
        return compact_change_log(
            self.spark, out_log, list(spec.group_cols), upto_seq=upto_seq
        )

    def _dag_fact_stream(self, p_join) -> str:
        """The fact-side stream of a join pipeline (the side whose primary
        key keys the view log)."""
        from dbt_decodable_spark.operators import ivm_join as ij

        _, ftbl, _ = ij.join_spec_from_sql(p_join.sql, ())
        return ftbl

    @staticmethod
    def _change_order(
        given: list[str] | None, sdef, keys: list[str], side: str
    ) -> list[str]:
        """Change-order columns for one side of a maintained join/aggregate:
        the caller's list (or the side's watermark columns), with the
        primary key appended as the deterministic tiebreak. ONE derivation
        for the activation and compaction paths — a maintained log must be
        compacted with the same order its merges folded by."""
        if given is None:
            if not sdef.schema.watermarks:
                raise CatalogError(
                    f"pass {side}_order= (change-order columns): the "
                    "source has no watermark column to default to"
                )
            given = [w.name for w in sdef.schema.watermarks]
        return list(given) + [k for k in keys if k not in given]

    def _compact_join_pipeline_logs(
        self,
        p_join,
        n_buckets: int,
        compact_min_deltas: int,
        fact_order: list[str] | None,
        dim_order: list[str] | None,
    ) -> None:
        """The join arm's LSM compaction step — the inline trigger in
        :meth:`activate_pipeline_join_incremental` and the DAG's deferred
        stage-3 call share this one implementation. LSM trigger, not every
        activation: folding deltas into the snapshot is the amortized
        O(|state|) step — running it while only a handful of batch-sized
        deltas are pending pays the full-state rewrite for nothing (reads
        fold pending deltas anyway)."""
        from dbt_decodable_spark.operators import ivm_join as ij
        from dbt_decodable_spark.streaming.changelog import (
            compact_and_vacuum,
            list_deltas,
        )

        _, ftbl, dtbl = ij.join_spec_from_sql(p_join.sql, ())
        fdef, ddef = self.streams[ftbl], self.streams[dtbl]
        fkeys = list(fdef.schema.primary_key)
        dkeys = list(ddef.schema.primary_key)
        forder = self._change_order(fact_order, fdef, fkeys, "fact")
        dorder = self._change_order(dim_order, ddef, dkeys, "dim")
        root = os.path.join(self.warehouse_dir, f"_ivmj_{p_join.name}")
        for log, keys_, ord_ in (
            (os.path.join(root, "fact"), fkeys, [F.col(c) for c in forder]),
            (os.path.join(root, "dim"), dkeys, [F.col(c) for c in dorder]),
            (os.path.join(root, "view"), fkeys, [F.col("__seq")]),
        ):
            if len(list_deltas(log)) >= compact_min_deltas:
                compact_and_vacuum(self.spark, log, keys_, ord_, n_buckets)

    def deactivate_pipeline(self, name: str) -> None:
        p = self.pipelines[self.qualify(name)]
        p.active = False

    def delete_pipeline(self, name: str) -> None:
        name = self.qualify(name)
        if name in self.pipelines:
            self.deactivate_pipeline(name)
            del self.pipelines[name]

    # -- connection lifecycle (api.py:36-48, client.py:455-491) --------------

    def create_connection(
        self,
        name: str,
        connector: str,
        stream: str | None = None,
        conn_type: str = "source",
        schema: StreamSchema | None = None,
        properties: dict[str, str] | None = None,
    ) -> ConnectionDef:
        """Create a connection bound to a stream. Mirrors
        ``client.create_connection(name, schema, stream_name)``
        (client.py:455-471): the bound stream is created from ``schema`` when
        it doesn't exist yet (the seed path relies on this — one call yields
        the connection *and* its stream, impl.py:537-546)."""
        if connector not in CONNECTORS:
            raise CatalogError(
                f"unknown connector {connector!r} (expected one of {CONNECTORS})"
            )
        if conn_type not in ("source", "sink"):
            raise CatalogError(f"connection type must be source|sink, got {conn_type!r}")
        name = self.qualify(name)
        stream = self.qualify(stream or name)
        if stream not in self.streams:
            if schema is None:
                raise CatalogError(
                    f"connection {name!r}: bound stream {stream!r} does not exist "
                    "and no schema was given to create it"
                )
            self.create_stream(stream, schema=schema)
        cdef = ConnectionDef(
            name=name,
            connector=connector,
            conn_type=conn_type,
            stream=stream,
            properties=dict(properties or {}),
            fingerprint=_fingerprint(
                f"{connector}|{conn_type}|{stream}", dict(properties or {})
            ),
        )
        self.connections[name] = cdef
        return cdef

    def get_connection(self, name: str) -> ConnectionDef:
        name = self.qualify(name)
        try:
            return self.connections[name]
        except KeyError:
            raise CatalogError(f"no such connection: {name}") from None

    def activate_connection(self, name: str) -> None:
        """client.activate_connection (client.py:474-479): events flow only
        while active — ``send_events`` enforces this."""
        self.get_connection(name).active = True

    def deactivate_connection(self, name: str) -> None:
        self.get_connection(name).active = False

    def delete_connection(self, name: str) -> None:
        name = self.qualify(name)
        if name in self.connections:
            self.connections[name].active = False
            del self.connections[name]

    def send_events(self, name: str, events: list[dict[str, Any]]) -> int:
        """REST-connection ingest (client.py:492-501 → /events): values are
        stringified by the sender and coerced to the bound stream's declared
        schema on ingest (impl.py:560-566) — appended to the stream."""
        from dbt_decodable_spark import ftypes

        cdef = self.get_connection(name)
        if not cdef.active:
            raise CatalogError(f"connection {cdef.name!r} is not active")
        sdef = self.streams[cdef.stream]
        cols = [
            (f.name, f.type or "STRING")
            for f in sdef.schema.fields
            if f.kind == "physical"
        ]
        str_rows = [
            [None if e.get(c) is None else str(e.get(c)) for c, _ in cols]
            for e in events
        ]
        from pyspark.sql import functions as F, types as T

        raw = self.spark.createDataFrame(
            str_rows, T.StructType([T.StructField(c, T.StringType()) for c, _ in cols])
        )
        typed = raw.select(
            *[F.col(c).cast(ftypes.to_spark(t)).alias(c) for c, t in cols]
        )
        typed = sdef.schema.apply_computed_fields(typed)
        current = self.read_stream(cdef.stream)
        # localCheckpoint breaks lineage: the union must not lazily re-read
        # the same view/parquet path that _materialize is about to overwrite
        self._materialize(sdef, current.unionByName(typed).localCheckpoint(eager=True))
        return len(events)

    # -- declarative apply (client.py:510-529 / impl.py:402-417) ------------

    def apply(self, resources: list[dict[str, Any]], dry_run: bool = False) -> list[dict]:
        """Reconcile a YAML-shaped resource list; per-resource result ∈
        {created, updated, unchanged}. ``has_changed`` = any non-unchanged."""
        results = []
        for res in resources:
            kind = res.get("kind")
            meta = res.get("metadata", {})
            spec = res.get("spec", {})
            name = self.qualify(meta["name"])
            if kind == "stream":
                schema = StreamSchema.from_dict(spec.get("schema", spec))
                current = self.streams.get(name)
                if current is None:
                    result = "created"
                elif current.schema != schema:
                    result = "updated"
                else:
                    result = "unchanged"
                if not dry_run and result != "unchanged":
                    self.create_stream(name, schema=schema)
            elif kind == "connection":
                connector = spec["connector"]
                conn_type = spec.get("type", "source")
                stream = self.qualify(spec.get("stream", meta["name"]))
                props = dict(spec.get("properties", {}))
                fp = _fingerprint(f"{connector}|{conn_type}|{stream}", props)
                current_c = self.connections.get(name)
                if current_c is None:
                    result = "created"
                elif current_c.fingerprint != fp:
                    result = "updated"
                else:
                    result = "unchanged"
                if not dry_run and result != "unchanged":
                    schema = (
                        StreamSchema.from_dict(spec["schema"])
                        if spec.get("schema")
                        else None
                    )
                    was_active = current_c.active if current_c else False
                    cdef = self.create_connection(
                        name,
                        connector,
                        stream=spec.get("stream", meta["name"]),
                        conn_type=conn_type,
                        schema=schema,
                        properties=props,
                    )
                    if spec.get("active", was_active):
                        self.activate_connection(cdef.name)
            elif kind == "pipeline":
                sql = normalize(spec["sql"])
                target_sink = self.qualify(spec.get("sink", meta["name"]))
                # fingerprint over (sql, inferred output schema incl. PK) —
                # the SAME pair create_pipeline stores (a spec-provided
                # schema dict is NOT a substitute: its byte shape differs
                # from the inferred to_dict, which made every re-apply
                # report "updated" forever). Inference needs the source
                # streams to resolve — under dry_run they may only exist as
                # earlier "created" entries in this very list, so a failed
                # analysis means "cannot compare yet" ⇒ changed.
                current_p = self.pipelines.get(name)
                try:
                    out_schema = self.infer_output_schema(sql)
                    if spec.get("primary_key"):
                        out_schema = StreamSchema(
                            fields=out_schema.fields,
                            watermarks=out_schema.watermarks,
                            primary_key=tuple(spec["primary_key"]),
                        )
                    fp = _fingerprint(sql, out_schema.to_dict())
                except Exception:
                    fp = None  # sources not materialized yet (dry-run order)
                if current_p is None:
                    result = "created"
                elif fp is None or current_p.fingerprint != fp or current_p.sink != target_sink:
                    result = "updated"
                else:
                    result = "unchanged"
                if not dry_run and result != "unchanged":
                    self.create_pipeline(
                        name,
                        sql,
                        sink=spec.get("sink", meta["name"]),
                        primary_key=spec.get("primary_key"),
                        activate=spec.get("active", True),
                    )
            else:
                raise CatalogError(f"unknown resource kind {kind!r}")
            results.append({"name": name, "kind": kind, "result": result})
        return results

    def has_changed(self, resources: list[dict[str, Any]]) -> bool:
        """Dry-run apply; any non-unchanged ⇒ rebuild (impl.py:402-417)."""
        return any(r["result"] != "unchanged" for r in self.apply(resources, dry_run=True))

    # -- run-operations (operations.sql:17-127) ------------------------------

    def stop_pipelines(self, names: list[str] | None = None) -> int:
        targets = [self.qualify(n) for n in names] if names else list(self.pipelines)
        n = 0
        for t in targets:
            if t in self.pipelines and self.pipelines[t].active:
                self.deactivate_pipeline(t)
                n += 1
        return n

    def delete_pipelines(self, names: list[str] | None = None) -> int:
        targets = [self.qualify(n) for n in names] if names else list(self.pipelines)
        n = 0
        for t in targets:
            if t in self.pipelines:
                self.delete_pipeline(t)
                n += 1
        return n

    def delete_streams(self, names: list[str] | None = None) -> int:
        targets = [self.qualify(n) for n in names] if names else list(self.streams)
        n = 0
        for t in targets:
            if t in self.streams:
                self.drop_stream(t, cascade=False)
                n += 1
        return n

    def delete_connections(self, names: list[str] | None = None) -> int:
        targets = [self.qualify(n) for n in names] if names else list(self.connections)
        n = 0
        for t in targets:
            if t in self.connections:
                self.delete_connection(t)
                n += 1
        return n

    def cleanup(self) -> dict[str, int]:
        """Project-wide GC: everything in this namespace (the reference's
        cleanup deletes connections too, operations.sql:66-105)."""
        nc = self.delete_connections()
        np = self.delete_pipelines()
        ns = self.delete_streams()
        return {"connections": nc, "pipelines": np, "streams": ns}

    def count_resources(self) -> dict[str, int]:
        """operations.sql:107-127 counts streams, pipelines AND connections."""
        return {
            "streams": len(self.streams),
            "pipelines": len(self.pipelines),
            "connections": len(self.connections),
        }
