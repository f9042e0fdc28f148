"""Resumable segment fetcher (S3/S4 as real I/O): byte-offset resume,
bounded retries, atomic finalize, manifest mirror → ingest."""

import os

import pytest

from rfb_cnpj_etl_ray.config import EngineConfig
from rfb_cnpj_etl_ray.oracle import assert_states_equal, replay
from rfb_cnpj_etl_ray.pipelines.ingest import ingest, read_lake_table
from rfb_cnpj_etl_ray.sources.fetcher import (
    FileTransport,
    FlakyTransport,
    fetch_manifest_segments,
    fetch_segment,
    fetch_segments,
)
from rfb_cnpj_etl_ray.spec import PAYLOAD_SCHEMA, TableSpec
from rfb_cnpj_etl_ray.state.commitlog import init_lake
from rfb_cnpj_etl_ray.synth import make_base, make_changelog, write_changelog_segments


def _remote(tmp_path, n_bytes=300_000):
    remote = tmp_path / "remote"
    remote.mkdir()
    data = os.urandom(n_bytes)
    (remote / "seg-0.bin").write_bytes(data)
    return remote, data


def test_fetch_resumes_after_mid_transfer_fault(tmp_path):
    remote, data = _remote(tmp_path)
    t = FlakyTransport(str(remote), fail_after=120_000, fail_times=1)
    report = fetch_segment(t, "seg-0.bin", tmp_path / "local",
                           chunk_size=50_000)
    assert report["attempts"] == 2  # one fault, one successful resume
    assert (tmp_path / "local" / "seg-0.bin").read_bytes() == data
    assert not (tmp_path / "local" / "seg-0.bin.part").exists()


def test_fetch_kill_then_new_process_resumes_from_part(tmp_path):
    """A hard crash leaves a .part file; a fresh fetcher must resume from
    its byte offset (not restart) and produce identical bytes."""
    remote, data = _remote(tmp_path)
    t = FlakyTransport(str(remote), fail_after=120_000, fail_times=5)
    with pytest.raises(RuntimeError, match="after 1 attempts"):
        fetch_segment(t, "seg-0.bin", tmp_path / "local",
                      chunk_size=50_000, max_retries=1)
    part = tmp_path / "local" / "seg-0.bin.part"
    assert part.exists() and 0 < part.stat().st_size < len(data)
    resumed_at = part.stat().st_size
    report = fetch_segment(FileTransport(str(remote)), "seg-0.bin",
                           tmp_path / "local", chunk_size=50_000)
    assert report["resumed_from"] == resumed_at
    assert (tmp_path / "local" / "seg-0.bin").read_bytes() == data


def test_fetch_idempotent_and_size_validated(tmp_path):
    remote, data = _remote(tmp_path)
    t = FileTransport(str(remote))
    fetch_segment(t, "seg-0.bin", tmp_path / "local")
    report = fetch_segment(t, "seg-0.bin", tmp_path / "local")
    assert report["skipped"]
    with pytest.raises(RuntimeError, match="manifest"):
        fetch_segment(t, "seg-0.bin", tmp_path / "local2",
                      expected_bytes=len(data) + 1)


def test_fetch_manifest_then_ingest_matches_oracle(ray_session, tmp_path):
    """The full S3/S4 story: mirror a remote change-log (with a fault on
    the wire) and replay it — final state equals the oracle."""
    base = make_base(200, seed=7, max_len=32)
    events = make_changelog(1200, 200, seed=8, max_len=32)
    remote_log = tmp_path / "remote_log"
    write_changelog_segments(events, remote_log, n_segments=4)
    local_log = tmp_path / "local_log"
    t = FlakyTransport(str(remote_log), fail_after=50_000, fail_times=1)
    reports = fetch_manifest_segments(remote_log, local_log, transport=t)
    assert len(reports) == 4
    lake = tmp_path / "lake"
    init_lake(lake, TableSpec(name="sequences", schema=PAYLOAD_SCHEMA),
              base=base, num_partitions=4)
    ingest(lake, local_log, cfg=EngineConfig(num_partitions=4))
    assert_states_equal(replay(base, events), read_lake_table(lake))


def test_fetch_segments_parallel(ray_session, tmp_path):
    remote = tmp_path / "remote"
    remote.mkdir()
    blobs = {}
    for i in range(6):
        data = os.urandom(10_000 + i)
        (remote / f"seg-{i}.bin").write_bytes(data)
        blobs[f"seg-{i}.bin"] = data
    reports = fetch_segments(FileTransport(str(remote)), list(blobs),
                             tmp_path / "local")
    assert {r["name"] for r in reports} == set(blobs)
    for name, data in blobs.items():
        assert (tmp_path / "local" / name).read_bytes() == data
