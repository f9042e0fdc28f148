"""The CDC merge core: LSN-ordered last-writer-wins as a pure Arrow fold.

Semantics (must match ``oracle.replay``): the final state of a key is
decided solely by its highest-LSN event — I/U upsert the full payload, D
deletes. Because that fold is associative and commutative (max-by-lsn),
it can run in three shrinking stages without ever seeing a key's full
history in one place:

  1. **per-batch partial reduce** (stateless ``map_batches``, zero-copy
     Arrow): collapse each block to one row per ``doc_id`` — this is what
     tames hot keys (a doc_id with 1M events leaves each block as 1 row)
     *before* the shuffle, the combiner the reference lacks (its skew
     "solution" is a static batch-shrink ratio, config.py:32-34);
  2. optional **salted stage** for pathological keys (salt = lsn %
     salt_factor spreads ONE key's events over sub-groups);
  3. **per-partition merge** (``groupby(part).map_groups`` actor pool):
     concat the partition's committed state — whose rows carry their
     last-applied ``_lsn`` and ``_deleted`` tombstone flag, making them
     replay-equivalent pseudo-events — with the new events, reduce again,
     write the next snapshot atomically.

Keeping ``_lsn``/``_deleted`` in the materialized state means applying
*any* subset of old events again (duplicated batches, crash-replay,
late segments) is a no-op — exactly-once by algebra, not by bookkeeping.
Reference analogs: best-record-wins dedup ``ROW_NUMBER() OVER (PARTITION
BY cnpj_basico ORDER BY ...)=1`` (db_patch.py:60-87) generalized to LSN
rank; ``INSERT OR IGNORE`` first-writer-wins (sqlite_loader.py:56)
upgraded to last-writer-wins.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from rfb_cnpj_etl_ray.hashing import partition_ids
from rfb_cnpj_etl_ray.spec import conform_table
from rfb_cnpj_etl_ray.state.commitlog import atomic_write_table

INTERNAL_LSN = "_lsn"
INTERNAL_DELETED = "_deleted"
PART_COL = "__part"
SALT_COL = "__salt"

_WORKER_THREADS_SET = False


def tune_worker_threads(n: int = 1) -> None:
    """Pin Arrow's internal CPU/IO pools inside a Ray worker process.

    By default every worker sizes Arrow's pool to all machine cores, so a
    nominally-1-CPU task silently borrows every idle core — great for a
    single job, but it oversubscribes under full load and falsifies
    scaling measurements (a 4-CPU run secretly uses 16 cores). One call
    per worker process; idempotent."""
    global _WORKER_THREADS_SET
    if not _WORKER_THREADS_SET:
        n = max(1, int(n))
        pa.set_cpu_count(n)
        pa.set_io_thread_count(max(2, n))
        _WORKER_THREADS_SET = True


def internal_schema(payload_schema: pa.Schema) -> pa.Schema:
    """Materialized partition-file schema: payload + merge bookkeeping."""
    return pa.schema(
        list(payload_schema)
        + [pa.field(INTERNAL_LSN, pa.int64()), pa.field(INTERNAL_DELETED, pa.bool_())]
    )


def strip_internal(table: pa.Table, drop_tombstones: bool = True) -> pa.Table:
    """Public view of a partition snapshot: live rows, payload columns."""
    if drop_tombstones and INTERNAL_DELETED in table.schema.names:
        table = table.filter(pc.equal(table[INTERNAL_DELETED], False))
    keep = [n for n in table.schema.names
            if n not in (INTERNAL_LSN, INTERNAL_DELETED, PART_COL, SALT_COL)]
    return table.select(keep)


def lww_reduce(table: pa.Table, key: str = "doc_id", lsn: str = INTERNAL_LSN) -> pa.Table:
    """Keep the max-``lsn`` row per ``key`` — one stable C++ sort + a
    vectorized run-boundary mask; no hashing (no collision risk at 1e10
    keys), no Python per-row work. Ties on (key, lsn) — duplicated events
    — keep one arbitrary copy (payloads are identical by definition)."""
    if table.num_rows == 0:
        return table
    srt = table.sort_by([(key, "ascending"), (lsn, "ascending")])
    keys = srt.column(key).combine_chunks()
    if isinstance(keys, pa.ChunkedArray):  # 0- or 1-chunk cases
        keys = keys.chunk(0) if keys.num_chunks else pa.array([], type=keys.type)
    n = len(keys)
    boundary = pc.not_equal(keys.slice(1), keys.slice(0, n - 1))
    mask = pa.concat_arrays(
        [boundary.cast(pa.bool_()), pa.array([True], type=pa.bool_())]
    )
    return srt.filter(mask)


class ToInternal:
    """Stateless map_batches fn: change-event batch → partition-routed
    internal rows, partially LWW-reduced.

    Input batch schema: (lsn, op, *payload) — already unified/cast by the
    reader (schema evolution happens at read time via the evolved schema).
    Output: (*payload, _lsn, _deleted, __part[, __salt]).
    """

    def __init__(self, payload_schema: pa.Schema, num_partitions: int,
                 salt_factor: int = 1, min_lsn_exclusive: int | None = None):
        self.payload_schema = payload_schema
        self.num_partitions = num_partitions
        self.salt_factor = salt_factor
        # GC safety (same rule as the staged path): events at or below the
        # compaction watermark must never re-apply — the tombstones they
        # would have LWW-lost to were already garbage-collected, so
        # replaying them could resurrect deleted keys.
        self.min_lsn_exclusive = min_lsn_exclusive
        self._out_schema = internal_schema(payload_schema)

    def convert_only(self, batch: pa.Table) -> pa.Table:
        """Change rows → internal+part rows without the partial reduce."""
        return self(batch, reduce=False)

    def __call__(self, batch: pa.Table, reduce: bool = True) -> pa.Table:
        if self.min_lsn_exclusive is not None and batch.num_rows:
            batch = batch.filter(
                pc.greater(batch.column("lsn"), self.min_lsn_exclusive)
            )
        if batch.num_rows == 0:
            return self._empty()
        lsn = batch.column("lsn")
        deleted = pc.equal(batch.column("op"), "D")
        cols = {n: batch.column(n) for n in self.payload_schema.names}
        cols[INTERNAL_LSN] = lsn
        cols[INTERNAL_DELETED] = deleted
        internal = pa.Table.from_arrays(
            [cols[f.name] for f in self._out_schema], schema=self._out_schema
        )
        reduced = lww_reduce(internal) if reduce else internal
        parts = partition_ids(reduced.column("doc_id"), self.num_partitions)
        reduced = reduced.append_column(PART_COL, pa.array(parts, type=pa.int32()))
        if self.salt_factor > 1:
            salt = (reduced.column(INTERNAL_LSN).to_numpy() % self.salt_factor)
            reduced = reduced.append_column(
                SALT_COL, pa.array(salt.astype(np.int32), type=pa.int32())
            )
        return reduced

    def _empty(self) -> pa.Table:
        sch = internal_schema(self.payload_schema).append(pa.field(PART_COL, pa.int32()))
        if self.salt_factor > 1:
            sch = sch.append(pa.field(SALT_COL, pa.int32()))
        return sch.empty_table()


def salted_reduce(group: pa.Table) -> pa.Table:
    """Stage-2a reducer for hot keys: one LWW pass per (part, salt) group;
    drops the salt column so the final per-partition merge regroups."""
    out = lww_reduce(group)
    if SALT_COL in out.schema.names:
        out = out.drop_columns([SALT_COL])
    return out


# ---------------------------------------------------------------------------
# staged filesystem shuffle (the default merge path)
# ---------------------------------------------------------------------------
#
# Ray's sort/hash groupby is a synchronous object-store all-to-all — at our
# merge's shape (fixed small partition count, associative fold) a staged
# two-phase exchange through storage is both faster single-node and the
# shape real lakehouse ingest uses multi-node (staging dir = shared
# storage). Phase 1: stateless tasks split each internal batch by
# partition and append `staging/part=K/<uuid>.parquet`. Phase 2: one task
# per touched partition merges staged chunks + committed snapshot and
# stages the next snapshot. Task retries are harmless: duplicate staged
# chunks collapse in the LWW fold ((doc_id,lsn) ties keep one copy), and
# snapshot writes are atomic-rename.

def make_stage_partitioner(
    payload_schema: pa.Schema,
    num_partitions: int,
    staging_dir: str,
    partial_reduce: bool = True,
    compression: str = "lz4",  # retained for API compat; staging is IPC
    prep: str = "events",
    min_lsn_exclusive: int | None = None,
    worker_threads: int = 1,
    salt_factor: int = 1,
    progress_counter=None,
):
    """Build the phase-1 map_batches closure (plain function → elastic
    task pool, no actor startup cost). ``prep``: "events" converts change
    batches (lsn, op, payload) to internal rows; "base" stamps snapshot
    batches with _lsn=0/_deleted=False (lake init).

    One combined sort by (partition, doc_id, lsn) yields both the
    partial-reduce run boundaries and contiguous partition slices — a
    single payload gather per batch. Staged chunks are UNCOMPRESSED Arrow
    IPC files: transient shuffle data, written at memory-bandwidth and
    mmap'd zero-copy by phase 2 (the lake snapshots stay zstd Parquet).

    ``salt_factor > 1`` (events prep only): every partition slice is
    further split into key-hash salt buckets (``doc_salt_ids`` — each
    doc_id wholly in one bucket) and staged as
    ``salt{S}-stage-*.arrow``; phase 2 then runs as a TWO-stage fold
    (``make_salt_reducer`` per bucket in parallel, then the partition
    merger over the reduced buckets) so one pathologically hot
    partition's fold work spreads over ``salt_factor`` tasks."""
    import uuid as _uuid
    from pathlib import Path as _Path

    from rfb_cnpj_etl_ray.hashing import doc_salt_ids

    to_internal = ToInternal(payload_schema, num_partitions)

    def stage(batch: pa.Table) -> pa.Table:
        tune_worker_threads(worker_threads)
        if progress_counter is not None:  # fire-and-forget, off data path
            progress_counter.add.remote(batch.num_rows)
        n_dropped_late = 0
        if prep == "events":
            if min_lsn_exclusive is not None:
                # GC safety: a compaction dropped tombstones up to the
                # watermark, so events at or below it must never re-apply
                # (they could resurrect deleted keys). Late arrivals below
                # the watermark are dropped here, like any CDC system
                # past its retention horizon.
                before = batch.num_rows
                batch = batch.filter(
                    pc.greater(batch.column("lsn"), min_lsn_exclusive)
                )
                n_dropped_late = before - batch.num_rows
            routed = to_internal.convert_only(batch)
        else:
            n = batch.num_rows
            b = conform_table(batch, payload_schema)
            b = b.append_column(INTERNAL_LSN, pa.array(np.zeros(n, np.int64)))
            b = b.append_column(INTERNAL_DELETED,
                                pa.array(np.zeros(n, bool)))
            parts = partition_ids(b.column("doc_id"), num_partitions)
            routed = b.append_column(PART_COL, pa.array(parts, pa.int32()))
        if routed.num_rows == 0:
            if n_dropped_late:
                # sentinel row: part=-1 carries the late-drop count so the
                # driver can report it (M6 metrics analog, progress.py)
                return pa.Table.from_pylist(
                    [{"part": -1, "rows": n_dropped_late}],
                    schema=_stage_stats_schema(),
                )
            return _stage_stats_schema().empty_table()
        salted = salt_factor > 1 and prep == "events"
        if salted:
            routed = routed.append_column(
                SALT_COL,
                pa.array(doc_salt_ids(routed.column("doc_id"), salt_factor),
                         type=pa.int32()),
            )
        sort_prefix = [(PART_COL, "ascending")] + (
            [(SALT_COL, "ascending")] if salted else []
        )
        if partial_reduce and prep == "events":
            srt = routed.sort_by(
                sort_prefix + [("doc_id", "ascending"),
                               (INTERNAL_LSN, "ascending")]
            )
            keys = srt.column("doc_id").combine_chunks()
            n = len(keys)
            boundary = pc.not_equal(keys.slice(1), keys.slice(0, n - 1))
            mask = pa.concat_arrays(
                [boundary.cast(pa.bool_()), pa.array([True], type=pa.bool_())]
            )
            srt = srt.filter(mask)
        else:
            # no reduce → only partition-contiguity is needed: a single
            # int32-key sort, far cheaper than the 3-key string sort
            srt = routed.sort_by(sort_prefix)
        parts = srt.column(PART_COL).to_numpy()
        if salted:
            salts = srt.column(SALT_COL).to_numpy()
            composite = parts.astype(np.int64) * salt_factor + salts
            drop_cols = [PART_COL, SALT_COL]
        else:
            salts = None
            composite = parts
            drop_cols = [PART_COL]
        bounds = np.flatnonzero(np.diff(composite)) + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(parts)]])
        rows = []
        body = srt.drop_columns(drop_cols)
        uid = _uuid.uuid4().hex
        for s, e in zip(starts, ends):
            p = int(parts[s])
            chunk = body.slice(int(s), int(e - s))
            pdir = _Path(staging_dir) / f"part={p:04d}"
            pdir.mkdir(parents=True, exist_ok=True)
            if salted:
                name = pdir / f"salt{int(salts[s]):03d}-stage-{uid}-{s}.arrow"
            else:
                name = pdir / f"stage-{uid}-{s}.arrow"
            with pa.OSFile(str(name), "wb") as f:
                with pa.ipc.new_file(f, chunk.schema) as w:
                    w.write_table(chunk)
            rows.append({"part": p, "rows": chunk.num_rows})
        if n_dropped_late:
            rows.append({"part": -1, "rows": n_dropped_late})
        return pa.Table.from_pylist(rows, schema=_stage_stats_schema())

    return stage


def _stage_stats_schema() -> pa.Schema:
    return pa.schema([pa.field("part", pa.int32()), pa.field("rows", pa.int64())])


def load_partition_state(
    table_dir: str, rels: list[str], int_sch: pa.Schema
) -> pa.Table:
    """Materialize one partition's logical state: fold the base snapshot
    plus any delta files (merge-on-read) with the LWW reduce. With a
    single (cow) snapshot this is just a conforming read."""
    import os

    import pyarrow.parquet as pq

    tables = [
        conform_table(pq.read_table(os.path.join(table_dir, rel)), int_sch)
        for rel in rels
    ]
    if not tables:
        return int_sch.empty_table()
    if len(tables) == 1:
        return tables[0]
    return lww_reduce(pa.concat_tables(tables))


def make_salt_reducer(staging_dir: str, worker_threads: int = 1):
    """Phase-2a of the salted staged merge: one task per (part, salt)
    bucket folds that bucket's staged chunks to one reduced chunk
    (``stage2-{salt}.arrow``, atomic rename — a retried task recomputes
    identical content). Because the salt is a doc_id hash, the fold is
    COMPLETE per key; phase 2b only merges buckets against the base."""
    import os as _os
    import uuid as _uuid
    from pathlib import Path as _Path

    def reduce_bucket(batch: pa.Table) -> pa.Table:
        tune_worker_threads(worker_threads)
        out = []
        for row in batch.to_pylist():
            part, salt = int(row["part"]), int(row["salt"])
            pdir = _Path(staging_dir) / f"part={part:04d}"
            chunks = sorted(pdir.glob(f"salt{salt:03d}-stage-*.arrow"))
            if not chunks:
                continue
            pieces = []
            for p in chunks:
                with pa.memory_map(str(p), "r") as src:
                    pieces.append(pa.ipc.open_file(src).read_all())
            folded = lww_reduce(pa.concat_tables(pieces))
            final = pdir / f"stage2-{salt:03d}.arrow"
            tmp = pdir / f"stage2-{salt:03d}.tmp-{_uuid.uuid4().hex[:8]}"
            with pa.OSFile(str(tmp), "wb") as f:
                with pa.ipc.new_file(f, folded.schema) as w:
                    w.write_table(folded)
            _os.replace(tmp, final)
            out.append({"part": part, "rows": folded.num_rows})
        if not out:
            return _stage_stats_schema().empty_table()
        return pa.Table.from_pylist(out, schema=_stage_stats_schema())

    return reduce_bucket


def make_partition_merger(
    table_dir: str,
    staging_dir: str,
    epoch: int,
    current_files: dict[int, list[str]],
    payload_schema_json: list[list[str]],
    compression: str = "zstd",
    row_group_size: int = 64 * 1024,
    write_mode: str = "cow",
    worker_threads: int = 1,
    chunk_glob: str = "stage-*.arrow",
):
    """Build the phase-2 closure: merge one partition per input row
    (feed it a Dataset of {"part": k} items with batch_size=1).

    ``write_mode="cow"``: fold staged events with the partition's current
    state (base + any deltas) and write the next full snapshot.
    ``write_mode="delta"``: write only the LWW-reduced NEW events as a
    delta file — no base read, no O(partition) rewrite; readers and the
    next cow/compact fold it in (merge-on-read)."""
    from rfb_cnpj_etl_ray.spec import schema_from_jsonable

    payload_schema = schema_from_jsonable(payload_schema_json)
    int_sch = internal_schema(payload_schema)
    files = {int(k): list(v) for k, v in current_files.items()}

    def merge(batch: pa.Table) -> pa.Table:
        tune_worker_threads(worker_threads)
        from pathlib import Path as _Path

        out_rows = []
        for part in batch.column("part").to_pylist():
            part = int(part)
            staged_paths = sorted((_Path(staging_dir) / f"part={part:04d}").glob(
                chunk_glob))
            pieces = []
            for p in staged_paths:
                with pa.memory_map(str(p), "r") as src:  # zero-copy read
                    pieces.append(
                        conform_table(pa.ipc.open_file(src).read_all(), int_sch)
                    )
            if not pieces:
                continue
            events = lww_reduce(pa.concat_tables(pieces))
            lsns = events.column(INTERNAL_LSN)
            if write_mode == "delta":
                merged = events
                rel = f"part={part:04d}/delta-{epoch:06d}.parquet"
                live = None
            else:
                base = load_partition_state(table_dir, files.get(part, []),
                                            int_sch)
                merged = lww_reduce(pa.concat_tables([base, events])) \
                    if base.num_rows else events
                # lww_reduce output is already doc_id-sorted (sort+filter
                # preserve order) — no extra gather before writing.
                rel = f"part={part:04d}/epoch-{epoch:06d}.parquet"
                live = int(pc.sum(pc.invert(merged[INTERNAL_DELETED])).as_py() or 0)
            size = atomic_write_table(
                merged, _Path(table_dir) / rel,
                compression=compression, row_group_size=row_group_size,
            )
            keys = merged.column("doc_id")
            out_rows.append(
                {
                    "part": part,
                    "file": rel,
                    "rows": merged.num_rows,
                    "live_rows": live,
                    "bytes": size,
                    "lsn_high": int(pc.max(lsns).as_py()),
                    "events_applied": events.num_rows,
                    # zone-map stats: snapshots are doc_id-sorted, so the
                    # range prunes point lookups / range scans (the
                    # engine's secondary-index analog, SURVEY P9)
                    "doc_id_min": keys[0].as_py() if merged.num_rows else None,
                    "doc_id_max": keys[-1].as_py() if merged.num_rows else None,
                }
            )
        if not out_rows:
            return _manifest_schema().empty_table()
        return pa.Table.from_pylist(out_rows, schema=_manifest_schema())

    return merge


class PartitionMerger:
    """Actor-pool ``map_groups`` fn: merge one partition's new events into
    its committed snapshot and stage the next snapshot file.

    Stateful-stage shape per SURVEY.md §2.3 ST1/ST4: constructed once per
    actor (holds table paths, schemas, epoch — the analog of the loader
    thread's long-lived DB connection, sqlite_loader.py:26-39); each call
    handles one partition group.

    Emits one manifest row per staged partition; the driver-side commit
    (state.commitlog) is the only global synchronization point.
    """

    def __init__(
        self,
        table_dir: str,
        epoch: int,
        current_files: dict[int, "list[str] | str"],
        payload_schema_json: list[list[str]],
        compression: str = "zstd",
        row_group_size: int = 64 * 1024,
    ):
        from rfb_cnpj_etl_ray.spec import schema_from_jsonable

        self.table_dir = table_dir
        self.epoch = epoch
        self.current_files = {
            int(k): ([v] if isinstance(v, str) else list(v))
            for k, v in current_files.items()
        }
        self.payload_schema = schema_from_jsonable(payload_schema_json)
        self.int_schema = internal_schema(self.payload_schema)
        self.compression = compression
        self.row_group_size = row_group_size

    def __call__(self, group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return _manifest_schema().empty_table()
        part = int(group.column(PART_COL)[0].as_py())
        events = conform_table(
            group.drop_columns([c for c in (PART_COL, SALT_COL) if c in group.schema.names]),
            self.int_schema,
        )
        base = load_partition_state(
            self.table_dir, self.current_files.get(part, []), self.int_schema
        )
        if base.num_rows:
            merged = lww_reduce(pa.concat_tables([base, events]))
        else:
            merged = lww_reduce(events)
        merged = merged.sort_by([("doc_id", "ascending")])

        rel = f"part={part:04d}/epoch-{self.epoch:06d}.parquet"
        from pathlib import Path

        size = atomic_write_table(
            merged,
            Path(self.table_dir) / rel,
            compression=self.compression,
            row_group_size=self.row_group_size,
        )
        live = int(pc.sum(pc.invert(merged[INTERNAL_DELETED])).as_py() or 0)
        lsns = events.column(INTERNAL_LSN)
        keys = merged.column("doc_id")
        return pa.Table.from_pylist(
            [
                {
                    "part": part,
                    "file": rel,
                    "rows": merged.num_rows,
                    "live_rows": live,
                    "bytes": size,
                    "lsn_high": int(pc.max(lsns).as_py()),
                    "events_applied": events.num_rows,
                    "doc_id_min": keys[0].as_py() if merged.num_rows else None,
                    "doc_id_max": keys[-1].as_py() if merged.num_rows else None,
                }
            ],
            schema=_manifest_schema(),
        )


def _manifest_schema() -> pa.Schema:
    return pa.schema(
        [
            pa.field("part", pa.int32()),
            pa.field("file", pa.string()),
            pa.field("rows", pa.int64()),
            pa.field("live_rows", pa.int64()),
            pa.field("bytes", pa.int64()),
            pa.field("lsn_high", pa.int64()),
            pa.field("events_applied", pa.int64()),
            pa.field("doc_id_min", pa.string()),
            pa.field("doc_id_max", pa.string()),
        ]
    )
