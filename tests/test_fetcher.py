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


# ---------------------------------------------------------------------------
# HttpTransport against a local http.server (loopback only)
# ---------------------------------------------------------------------------

class _RangeHandler(__import__("http.server", fromlist=["x"]).SimpleHTTPRequestHandler):
    """SimpleHTTPRequestHandler + minimal RFC 7233 single-range support
    (the stdlib handler ignores Range; real mirrors honor it)."""

    def send_head(self):
        rng = self.headers.get("Range")
        if not rng or not rng.startswith("bytes="):
            return super().send_head()
        import os as _os
        import posixpath
        path = self.translate_path(self.path)
        try:
            f = open(path, "rb")
        except OSError:
            self.send_error(404)
            return None
        size = _os.fstat(f.fileno()).st_size
        lo, hi = rng[len("bytes="):].split("-")
        lo = int(lo)
        hi = min(int(hi), size - 1) if hi else size - 1
        self.send_response(206)
        self.send_header("Content-Type", "application/octet-stream")
        self.send_header("Content-Range", f"bytes {lo}-{hi}/{size}")
        self.send_header("Content-Length", str(hi - lo + 1))
        self.end_headers()
        f.seek(lo)
        import io
        return io.BytesIO(f.read(hi - lo + 1))

    def log_message(self, *a):  # quiet
        pass


@pytest.fixture()
def http_dir(tmp_path):
    import functools
    import http.server
    import threading

    serve = tmp_path / "serve"
    serve.mkdir()
    (serve / "seg-a.parquet").write_bytes(b"A" * 300_000)
    handler = functools.partial(_RangeHandler, directory=str(serve))
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield serve, f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_http_transport_fetch_with_ranges(http_dir, tmp_path):
    from rfb_cnpj_etl_ray.sources.fetcher import HttpTransport, fetch_segment

    serve, url = http_dir
    tr = HttpTransport(url)
    assert tr.size("seg-a.parquet") == 300_000
    assert tr.read_range("seg-a.parquet", 10, 5) == b"AAAAA"
    dest = tmp_path / "dest"
    rep = fetch_segment(tr, "seg-a.parquet", dest, chunk_size=64 * 1024)
    assert rep["bytes"] == 300_000 and not rep["skipped"]
    assert (dest / "seg-a.parquet").read_bytes() == b"A" * 300_000
    # idempotent re-run short-circuits
    rep2 = fetch_segment(tr, "seg-a.parquet", dest)
    assert rep2["skipped"]


def test_http_transport_resume_from_part_offset(http_dir, tmp_path):
    from rfb_cnpj_etl_ray.sources.fetcher import HttpTransport, fetch_segment

    serve, url = http_dir
    dest = tmp_path / "dest"
    dest.mkdir()
    # a crashed earlier attempt left a partial file
    (dest / "seg-a.parquet.part").write_bytes(b"A" * 120_000)
    rep = fetch_segment(HttpTransport(url), "seg-a.parquet", dest,
                        chunk_size=64 * 1024)
    assert rep["resumed_from"] == 120_000
    assert (dest / "seg-a.parquet").read_bytes() == b"A" * 300_000


def test_http_transport_range_ignoring_server(tmp_path):
    """Plain SimpleHTTPRequestHandler ignores Range (200 + full body):
    the transport slices locally and the fetch still lands correct."""
    import functools
    import http.server
    import threading

    from rfb_cnpj_etl_ray.sources.fetcher import HttpTransport, fetch_segment

    serve = tmp_path / "serve"
    serve.mkdir()
    (serve / "f.bin").write_bytes(bytes(range(256)) * 100)
    handler = functools.partial(
        http.server.SimpleHTTPRequestHandler, directory=str(serve))
    handler.log_message = lambda *a: None
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        tr = HttpTransport(f"http://127.0.0.1:{srv.server_address[1]}")
        assert tr.read_range("f.bin", 3, 4) == bytes([3, 4, 5, 6])
        rep = fetch_segment(tr, "f.bin", tmp_path / "dest")
        assert rep["bytes"] == 25_600
    finally:
        srv.shutdown()
