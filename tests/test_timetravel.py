"""Time-travel reads + change-data feed over the commit log.

The layout is immutable-by-epoch (each commit references a complete file
list), so a historical commit record IS a consistent snapshot, and the
difference between two commits is derivable without replaying the log.
Correctness is defined against the oracle replayer at each LSN prefix.
"""

import json

import pyarrow as pa
import pytest

from rfb_cnpj_etl_ray.config import EngineConfig
from rfb_cnpj_etl_ray.oracle import assert_states_equal, replay
from rfb_cnpj_etl_ray.pipelines.ingest import (
    ingest,
    lake_changes,
    read_lake,
    read_lake_table,
)
from rfb_cnpj_etl_ray.pipelines.maintenance import gc_snapshots
from rfb_cnpj_etl_ray.spec import PAYLOAD_SCHEMA, TableSpec
from rfb_cnpj_etl_ray.state.commitlog import init_lake
from rfb_cnpj_etl_ray.synth import (
    make_base,
    make_changelog,
    write_changelog_segments,
)

SPEC = TableSpec(name="sequences", schema=PAYLOAD_SCHEMA)


def _two_epoch_lake(tmp_path, n_docs=300, n_events=2400, n_segments=6):
    """Ingest the first half of the segments as epoch 1, the rest as
    epoch 2 (manifest rewritten per epoch, like a producer appending)."""
    base = make_base(n_docs, seed=11, max_len=48)
    events = make_changelog(n_events, n_docs, seed=12, max_len=48)
    log_dir = tmp_path / "log"
    write_changelog_segments(events, log_dir, n_segments=n_segments)
    lake = tmp_path / "lake"
    cfg = EngineConfig(num_partitions=8)
    init_lake(lake, SPEC, base=base, num_partitions=8)

    manifest = json.loads((log_dir / "manifest.json").read_text())
    full = manifest["segments"]
    names = sorted(s["name"] for s in full)
    for upto in (n_segments // 2, n_segments):
        manifest["segments"] = [s for s in full if s["name"] in names[:upto]]
        (log_dir / "manifest.json").write_text(json.dumps(manifest))
        ingest(lake, log_dir, cfg=cfg)

    import pyarrow.parquet as pq

    prefix = pa.concat_tables(
        [pq.read_table(log_dir / n) for n in names[: n_segments // 2]]
    )
    return base, events, prefix, lake


def _live_state(table: pa.Table) -> dict:
    """doc_id -> payload tuple for a replayer output table."""
    return {r["doc_id"]: tuple(sorted(r.items())) for r in table.to_pylist()}


def test_read_lake_as_of_matches_prefix_replay(ray_session, tmp_path):
    base, events, prefix, lake = _two_epoch_lake(tmp_path)
    # epoch 1 snapshot == oracle replay of the first-half events
    assert_states_equal(replay(base, prefix), read_lake_table(lake, as_of=1))
    # the streaming Dataset path agrees with the driver helper
    assert read_lake(lake, as_of=1).count() == replay(base, prefix).num_rows
    # as_of latest == plain read
    assert_states_equal(replay(base, events), read_lake_table(lake, as_of=2))
    assert_states_equal(replay(base, events), read_lake_table(lake))


def test_read_lake_as_of_unknown_epoch_raises(ray_session, tmp_path):
    _, _, _, lake = _two_epoch_lake(tmp_path)
    with pytest.raises(RuntimeError, match="never committed"):
        read_lake(lake, as_of=99)


def test_read_lake_as_of_gc_pruned_epoch_raises(ray_session, tmp_path):
    _, _, _, lake = _two_epoch_lake(tmp_path)
    gc_snapshots(lake, keep_commits=1)
    with pytest.raises(RuntimeError, match="retention"):
        read_lake(lake, as_of=1)


def test_lake_changes_matches_replayer_diff(ray_session, tmp_path):
    base, events, prefix, lake = _two_epoch_lake(tmp_path)
    s1 = replay(base, prefix)
    s2 = replay(base, events)
    old = _live_state(s1)
    new = _live_state(s2)

    by_type = {}
    for row in lake_changes(lake, 1, 2).take_all():
        kind = row.pop("change_type")
        by_type.setdefault(kind, {})[row["doc_id"]] = tuple(sorted(row.items()))

    expect_inserts = {k: v for k, v in new.items() if k not in old}
    expect_deletes = {k: v for k, v in old.items() if k not in new}
    assert by_type.get("insert", {}) == expect_inserts
    assert by_type.get("delete", {}) == expect_deletes
    # updates: emitted iff the winning LSN changed; every emitted update
    # must carry the NEW payload, and every doc whose payload changed
    # must be emitted (LSN change is implied by a payload change)
    updates = by_type.get("update", {})
    changed_payload = {
        k for k in old.keys() & new.keys() if old[k] != new[k]
    }
    assert changed_payload <= set(updates)
    for k, v in updates.items():
        assert v == new[k]
    # the feed never mentions untouched docs
    untouched = {k for k in old.keys() & new.keys() if old[k] == new[k]}
    assert not (set(updates) - (old.keys() & new.keys()))
    # deletes carry the pre-image
    for k, v in by_type.get("delete", {}).items():
        assert v == old[k]
    # feed has at least one of each kind at this size (sanity of fixture)
    assert expect_inserts and expect_deletes and changed_payload
    del untouched


def test_lake_changes_from_init_epoch_is_full_diff_vs_base(ray_session, tmp_path):
    base, events, prefix, lake = _two_epoch_lake(tmp_path)
    old = _live_state(base)  # epoch 0 == the init snapshot
    new = _live_state(replay(base, events))
    kinds = {}
    for row in lake_changes(lake, 0).take_all():
        kinds.setdefault(row["change_type"], set()).add(row["doc_id"])
    assert kinds.get("insert", set()) == set(new) - set(old)
    assert kinds.get("delete", set()) == set(old) - set(new)


def test_lake_changes_same_epoch_is_empty(ray_session, tmp_path):
    _, _, _, lake = _two_epoch_lake(tmp_path)
    assert lake_changes(lake, 2, 2).count() == 0


def test_changes_cli_summary_and_export(ray_session, tmp_path, capsys):
    _, _, _, lake = _two_epoch_lake(tmp_path)
    from rfb_cnpj_etl_ray.cli import main as cli_main

    rc = cli_main(["changes", str(lake), "1", "2"])
    assert rc in (0, None)
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(out["changes"]) <= {"insert", "update", "delete"}
    assert sum(out["changes"].values()) == lake_changes(lake, 1, 2).count()

    out_dir = tmp_path / "feed"
    rc = cli_main(["changes", str(lake), "1", "2", "--out-dir", str(out_dir)])
    assert rc in (0, None)
    import pyarrow.parquet as pq

    written = pa.concat_tables(
        [pq.read_table(p) for p in sorted(out_dir.glob("*.parquet"))])
    assert written.num_rows == lake_changes(lake, 1, 2).count()


def test_lake_changes_bad_epochs(ray_session, tmp_path):
    _, _, _, lake = _two_epoch_lake(tmp_path)
    with pytest.raises(ValueError):
        lake_changes(lake, 2, 1)
    with pytest.raises(RuntimeError, match="never committed"):
        lake_changes(lake, 1, 42)


def test_lake_token_stats_matches_replay(ray_session, tmp_path):
    """Corpus stats off the lake equal the same histogram over the
    oracle-replayed state (and respect as_of time travel)."""
    import numpy as np

    from rfb_cnpj_etl_ray.config import EngineConfig
    from rfb_cnpj_etl_ray.oracle import replay
    from rfb_cnpj_etl_ray.pipelines.ingest import (
        ingest,
        lake_token_stats,
    )
    from rfb_cnpj_etl_ray.spec import PAYLOAD_SCHEMA, TableSpec
    from rfb_cnpj_etl_ray.state.commitlog import init_lake
    from rfb_cnpj_etl_ray.synth import (
        make_base,
        make_changelog,
        write_changelog_segments,
    )

    base = make_base(300, seed=77, max_len=200)
    events = make_changelog(2000, 300, seed=78, max_len=200)
    log = tmp_path / "log"
    write_changelog_segments(events, log, 2)
    lake = tmp_path / "lake"
    init_lake(lake, TableSpec(name="sequences", schema=PAYLOAD_SCHEMA),
              base=base, num_partitions=4)
    ingest(lake, log, cfg=EngineConfig(num_partitions=4))

    def hist(state, bucket=64):
        n = np.asarray(state.column("n_tok").to_pylist(), dtype=np.int64)
        lo = (n // bucket) * bucket
        out = {}
        for b, t in zip(lo, n):
            d = out.setdefault(int(b), [0, 0])
            d[0] += 1
            d[1] += int(t)
        return {b: tuple(v) for b, v in sorted(out.items())}

    expected = hist(replay(base, events))
    got_tbl = lake_token_stats(lake)
    got = {int(b): (int(d), int(t)) for b, d, t in zip(
        got_tbl.column("bucket_lo").to_pylist(),
        got_tbl.column("n_docs").to_pylist(),
        got_tbl.column("n_tokens").to_pylist())}
    assert got == expected

    # as_of epoch 0 = the base snapshot alone
    got0_tbl = lake_token_stats(lake, as_of=0)
    got0 = {int(b): (int(d), int(t)) for b, d, t in zip(
        got0_tbl.column("bucket_lo").to_pylist(),
        got0_tbl.column("n_docs").to_pylist(),
        got0_tbl.column("n_tokens").to_pylist())}
    assert got0 == hist(base)
