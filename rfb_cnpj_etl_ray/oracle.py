"""Single-threaded reference replayer — the correctness oracle.

Defines the semantics the distributed engine must reproduce (north rule:
"correctness defined against a single-threaded reference replayer",
BASELINE.json): starting from the base snapshot, apply change events in
global LSN order to a dict ``doc_id -> row``; duplicate (doc_id, lsn)
events are applied at most once; I/U upsert the full payload, D deletes
(absent key -> no-op). The final state is the table; engine output must
match per-row with token-array equality (FIXTURES.md F5).

Deliberately simple and slow (per-event Python loop) — it is the spec,
not the engine. Reference analogs: PK upsert + best-record-wins dedup
done in SQL after load (sqlite_loader.py:56, db_patch.py:60-87).
"""

from __future__ import annotations

import pyarrow as pa

from rfb_cnpj_etl_ray.spec import conform_table, evolve_schema


def replay(base: pa.Table, events: pa.Table) -> pa.Table:
    """Replay ``events`` onto ``base``; return the final state sorted by
    doc_id. Payload schema evolves via the engine's evolution rules when
    events carry extra/widened columns."""
    payload_names = [n for n in events.schema.names if n not in ("lsn", "op")]
    event_payload_schema = pa.schema([events.schema.field(n) for n in payload_names])
    final_schema = evolve_schema(base.schema, event_payload_schema)

    state: dict[str, tuple] = {}
    base_c = conform_table(base, final_schema)
    base_rows = base_c.to_pylist()
    for row in base_rows:
        state[row["doc_id"]] = row

    ev = events.sort_by([("lsn", "ascending")])
    seen: set[tuple[str, int]] = set()
    cols = {n: ev.column(n).to_pylist() for n in ev.schema.names}
    n = ev.num_rows
    for i in range(n):
        doc_id = cols["doc_id"][i]
        lsn = cols["lsn"][i]
        key = (doc_id, lsn)
        if key in seen:  # duplicated-batch injection: apply at most once
            continue
        seen.add(key)
        if cols["op"][i] == "D":
            state.pop(doc_id, None)
        else:
            row = {f.name: None for f in final_schema}
            for name in payload_names:
                row[name] = cols[name][i]
            state[doc_id] = row

    rows = [state[k] for k in sorted(state)]
    if not rows:
        return final_schema.empty_table()
    return pa.Table.from_pylist(rows, schema=final_schema)


def assert_states_equal(expected: pa.Table, actual: pa.Table) -> None:
    """Per-row token-array equality check (order-insensitive by doc_id)."""
    exp = expected.sort_by([("doc_id", "ascending")])
    act = conform_table(
        actual.sort_by([("doc_id", "ascending")]), exp.schema
    )
    if exp.num_rows != act.num_rows:
        raise AssertionError(f"row count mismatch: {exp.num_rows} != {act.num_rows}")
    if not exp.equals(act):
        # locate first differing row for a useful message
        e, a = exp.to_pylist(), act.to_pylist()
        for i, (er, ar) in enumerate(zip(e, a)):
            if er != ar:
                raise AssertionError(f"row {i} differs:\n expected={er}\n actual  ={ar}")
        raise AssertionError("tables differ (metadata/schema level)")
