"""Patch-phase operators — P1-P6 of the reference inventory
(``utils/db_patch.py``), as generic vectorized table ops.

The reference runs these as SQL once after load; the engine runs them as
columnar kernels inside ``map_batches`` / per-partition merges. Each
carries the exact documented semantics (docs/normalizacao.md)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def upsert_if_absent(table: pa.Table, rows: pa.Table, key: str) -> pa.Table:
    """P1 (``INSERT … ON CONFLICT (pk) DO NOTHING``, db_patch.py:23-57):
    append only the rows whose key is not already present. First-writer
    wins; duplicate keys inside ``rows`` are also collapsed (first kept).
    """
    existing = table.column(key).combine_chunks()
    fresh = rows.filter(
        pc.invert(pc.is_in(rows.column(key), value_set=existing))
    )
    # collapse dup keys within the incoming rows (keep first occurrence)
    if fresh.num_rows:
        keys = fresh.column(key).to_pandas()
        fresh = fresh.take(pa.array(np.flatnonzero(~keys.duplicated())))
    return pa.concat_tables([table, fresh.cast(table.schema)])


def dedup_best_record(
    table: pa.Table,
    key: str,
    quality_column: str,
) -> pa.Table:
    """P2 (best-record-wins dedup, db_patch.py:60-87): keep one row per
    key, preferring rows whose ``quality_column`` is non-empty, then the
    earliest physical row (the reference's ``ctid/rowid`` order).

    Exactly ``ROW_NUMBER() OVER (PARTITION BY key ORDER BY CASE WHEN
    quality non-empty THEN 0 ELSE 1 END, rowid) = 1``. This is the same
    rank-and-keep fold the CDC merge generalizes to LSN order
    (stages/merge.lww_reduce)."""
    quality = pc.fill_null(table.column(quality_column), "")
    bad = pc.equal(quality, "").combine_chunks().to_numpy(zero_copy_only=False)
    rowid = np.arange(table.num_rows, dtype=np.int64)
    keys = table.column(key).to_pandas()
    # stable sort by (key, bad, rowid): first row of each key run wins
    order = np.lexsort((rowid, bad.astype(np.int8), keys.to_numpy(dtype=object)))
    sorted_keys = keys.to_numpy(dtype=object)[order]
    first_of_run = np.ones(len(order), dtype=bool)
    first_of_run[1:] = sorted_keys[1:] != sorted_keys[:-1]
    keep = np.sort(order[first_of_run])  # preserve original row order
    return table.take(pa.array(keep))


def null_out_value(table: pa.Table, column: str, sentinel: str) -> pa.Table:
    """P3 (``SET cod_pais=NULL WHERE cod_pais='0'``, db_patch.py:89)."""
    idx = table.schema.get_field_index(column)
    col = table.column(idx)
    out = pc.if_else(
        pc.equal(col, sentinel), pa.nulls(table.num_rows, col.type), col
    )
    return table.set_column(idx, table.schema.field(idx), out)


def default_fill(table: pa.Table, column: str, default: str,
                 empty: str = "") -> pa.Table:
    """P4 (``SET cod_porte='00' WHERE cod_porte=''``, db_patch.py:91)."""
    idx = table.schema.get_field_index(column)
    col = table.column(idx)
    out = pc.if_else(pc.equal(col, empty), pa.scalar(default), col)
    return table.set_column(idx, table.schema.field(idx), out)


def zero_pad(table: pa.Table, column: str, width: int) -> pa.Table:
    """P5 (LPAD to 3, db_patch.py:93-106) — nulls pass through."""
    idx = table.schema.get_field_index(column)
    out = pc.utf8_lpad(table.column(idx), width, "0")
    return table.set_column(idx, table.schema.field(idx), out)


def anti_join_delete(
    table: pa.Table, parents: list[pa.Table], key: str, parent_key: str | None = None
) -> pa.Table:
    """P6 (orphan delete, db_patch.py:108-115): drop rows whose key has no
    correspondence in ANY of the parent tables (the reference deletes
    `simples` rows absent from both `empresa` and `estabelecimento`)."""
    pk = parent_key or key
    keep = np.zeros(table.num_rows, dtype=bool)
    child = table.column(key)
    for parent in parents:
        mask = pc.is_in(child, value_set=parent.column(pk).combine_chunks())
        keep |= mask.combine_chunks().to_numpy(zero_copy_only=False)
    return table.filter(pa.array(keep))


def referential_violations(
    child: pa.Table, parent: pa.Table, key: str, parent_key: str | None = None
) -> pa.Table:
    """P8 (FK gate, sqlite_builder.py:109-125 / postgres_builder.py:138-184):
    the validation form of the anti-join — returns the violating child
    rows; an empty result is the pass condition."""
    pk = parent_key or key
    mask = pc.is_in(child.column(key), value_set=parent.column(pk).combine_chunks())
    return child.filter(pc.invert(mask))
