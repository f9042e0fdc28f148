"""Lake-to-lake incremental replication: CDC-out chained into CDC-in.

Correctness = the downstream lake's final state token-equals the oracle
replay of the upstream changelog, across snapshot bootstrap, incremental
rounds, crash-duplicated shipping, compacted-away tombstones and a
different downstream partition count.
"""

import json

import pyarrow.parquet as pq
import pytest

from rfb_cnpj_etl_ray.config import EngineConfig
from rfb_cnpj_etl_ray.oracle import assert_states_equal, replay
from rfb_cnpj_etl_ray.pipelines.ingest import (
    ingest,
    read_lake_table,
    replicate,
)
from rfb_cnpj_etl_ray.spec import PAYLOAD_SCHEMA, TableSpec
from rfb_cnpj_etl_ray.state.commitlog import CommitLog, init_lake
from rfb_cnpj_etl_ray.synth import (
    make_base,
    make_changelog,
    write_changelog_segments,
)

SPEC = TableSpec(name="sequences", schema=PAYLOAD_SCHEMA)


def _src_lake(tmp_path, n_docs=250, n_events=2000, n_segments=4):
    base = make_base(n_docs, seed=21, max_len=48)
    events = make_changelog(n_events, n_docs, seed=22, max_len=48)
    log_dir = tmp_path / "log"
    write_changelog_segments(events, log_dir, n_segments=n_segments)
    src = tmp_path / "src"
    init_lake(src, SPEC, base=base, num_partitions=8)
    manifest = json.loads((log_dir / "manifest.json").read_text())
    return base, events, log_dir, manifest, src


def _ingest_upto(log_dir, manifest, src, upto):
    names = sorted(s["name"] for s in manifest["segments"])
    m = dict(manifest)
    m["segments"] = [s for s in manifest["segments"]
                     if s["name"] in names[:upto]]
    (log_dir / "manifest.json").write_text(json.dumps(m))
    return ingest(src, log_dir, cfg=EngineConfig(num_partitions=8))


def test_bootstrap_then_incremental_matches_oracle(ray_session, tmp_path):
    base, events, log_dir, manifest, src = _src_lake(tmp_path)
    dst = tmp_path / "dst"

    _ingest_upto(log_dir, manifest, src, 2)
    r1 = replicate(src, dst, num_partitions=4)  # snapshot bootstrap
    assert r1["mode"] == "snapshot" and not r1["noop"]
    names = sorted(s["name"] for s in manifest["segments"])
    prefix = __import__("pyarrow").concat_tables(
        [pq.read_table(log_dir / n) for n in names[:2]])
    assert_states_equal(replay(base, prefix), read_lake_table(dst))
    assert CommitLog(dst / "sequences").latest()["num_partitions"] == 4

    _ingest_upto(log_dir, manifest, src, 4)
    r2 = replicate(src, dst)
    assert r2["mode"] == "incremental" and not r2["noop"]
    assert_states_equal(replay(base, events), read_lake_table(dst))


def test_replicate_is_idempotent_and_crash_safe(ray_session, tmp_path):
    base, events, log_dir, manifest, src = _src_lake(tmp_path)
    dst = tmp_path / "dst"
    _ingest_upto(log_dir, manifest, src, 4)
    replicate(src, dst)
    assert replicate(src, dst)["noop"]

    # crash between dst ingest and the marker write: delete the marker,
    # re-run — the re-shipped events are absorbed by the LSN checkpoints
    (dst / "sequences" / "_replication.json").unlink()
    r = replicate(src, dst)
    assert not r["noop"]  # it re-ships…
    assert_states_equal(replay(base, events), read_lake_table(dst))  # …harmlessly


def test_deletes_propagate_after_src_tombstone_compaction(ray_session, tmp_path):
    base, events, log_dir, manifest, src = _src_lake(tmp_path)
    dst = tmp_path / "dst"
    _ingest_upto(log_dir, manifest, src, 2)
    replicate(src, dst)

    _ingest_upto(log_dir, manifest, src, 4)
    # drop every tombstone from the src snapshot files BEFORE replicating:
    # the feed must fall back to the partition lsn_high for delete LSNs
    from rfb_cnpj_etl_ray.pipelines.maintenance import compact

    lsns = [s["max_lsn"] for s in manifest["segments"]]
    compact(src, "sequences", watermark_lsn=max(lsns) + 1)
    r = replicate(src, dst)
    assert not r["noop"]
    assert_states_equal(replay(base, events), read_lake_table(dst))


def test_replicate_cli(ray_session, tmp_path, capsys):
    base, events, log_dir, manifest, src = _src_lake(tmp_path)
    _ingest_upto(log_dir, manifest, src, 4)
    from rfb_cnpj_etl_ray.cli import main as cli_main

    dst = tmp_path / "dst"
    rc = cli_main(["replicate", str(src), str(dst)])
    assert rc in (0, None)
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["mode"] == "snapshot" and not out["noop"]
    assert_states_equal(replay(base, events), read_lake_table(dst))


def test_replicate_uninitialized_src_raises(ray_session, tmp_path):
    with pytest.raises(RuntimeError, match="not initialized"):
        replicate(tmp_path / "nope", tmp_path / "dst")
