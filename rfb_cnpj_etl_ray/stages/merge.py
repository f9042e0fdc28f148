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
                 salt_factor: int = 1):
        self.payload_schema = payload_schema
        self.num_partitions = num_partitions
        self.salt_factor = salt_factor
        self._out_schema = internal_schema(payload_schema)

    def __call__(self, batch: pa.Table) -> pa.Table:
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
        reduced = lww_reduce(internal)
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
        current_files: dict[int, str],
        payload_schema_json: list[list[str]],
        compression: str = "zstd",
        row_group_size: int = 64 * 1024,
    ):
        from rfb_cnpj_etl_ray.spec import schema_from_jsonable

        self.table_dir = table_dir
        self.epoch = epoch
        self.current_files = {int(k): v for k, v in current_files.items()}
        self.payload_schema = schema_from_jsonable(payload_schema_json)
        self.int_schema = internal_schema(self.payload_schema)
        self.compression = compression
        self.row_group_size = row_group_size

    def __call__(self, group: pa.Table) -> pa.Table:
        import os

        if group.num_rows == 0:
            return _manifest_schema().empty_table()
        part = int(group.column(PART_COL)[0].as_py())
        events = conform_table(
            group.drop_columns([c for c in (PART_COL, SALT_COL) if c in group.schema.names]),
            self.int_schema,
        )
        base_rel = self.current_files.get(part)
        if base_rel is not None:
            import pyarrow.parquet as pq

            base = conform_table(
                pq.read_table(os.path.join(self.table_dir, base_rel)), self.int_schema
            )
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
        ]
    )
