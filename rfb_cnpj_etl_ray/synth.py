"""Deterministic synthetic data: base snapshot + change-log segments.

Implements FIXTURES.md F1/F2/F3 — the engine's test/bench inputs, fully
vectorized with numpy (no external data, no per-row Python). All outputs
are functions of (seed, sizes) only; a cached dataset directory is keyed
by those parameters so bench runs at two parallelism levels reuse one
generation.

Reference analogs: the downloaded monthly zip set + its scraped manifest
(cnpj_public_data.py:113-171); segments here play the role of the zip
files, ``manifest.json`` the role of the remote {filename,size} manifest
validated in zip_metadata.py:16-58.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from rfb_cnpj_etl_ray.spec import CHANGE_SCHEMA, PAYLOAD_SCHEMA

VOCAB = 50_257
SOURCES = np.array(["web", "books", "code", "wiki"])


def _token_lists(rng: np.random.Generator, n: int, min_len: int, max_len: int
                 ) -> tuple[pa.ListArray, np.ndarray]:
    """n random token lists + their lengths, as one flat int32 buffer."""
    lens = rng.integers(min_len, max_len + 1, size=n)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    flat = rng.integers(0, VOCAB, size=int(offsets[-1]), dtype=np.int32)
    arr = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32() if offsets[-1] < 2**31 else pa.int64()),
                                   pa.array(flat, type=pa.int32()))
    if not arr.type.equals(pa.list_(pa.int32())):
        arr = arr.cast(pa.list_(pa.int32()))
    return arr, lens.astype(np.int32)


def _doc_ids(idx: np.ndarray) -> pa.Array:
    """doc{i:08d} for each index — pure digit arithmetic into a fixed-width
    byte matrix (np.char.* is ~µs/row; this is ~ns/row, which matters when
    synthesizing 10^7+ events)."""
    idx = np.asarray(idx, dtype=np.int64)
    if idx.size and idx.max() >= 100_000_000:
        raise ValueError("doc index space exceeds the doc{i:08d} format")
    ndig = 8
    n = len(idx)
    width = 3 + ndig
    out = np.empty((n, width), dtype=np.uint8)
    out[:, 0], out[:, 1], out[:, 2] = ord("d"), ord("o"), ord("c")
    # cumulative uint32 divmod (2 vector ops per digit) instead of a 2D
    # int64 //powers broadcast — ~5x faster at 10^7 rows, same bytes
    rem = idx.astype(np.uint32)
    for col in range(width - 1, 2, -1):
        out[:, col] = rem % 10 + ord("0")
        rem //= 10
    # build the utf8 array straight from (offsets, data) buffers — skips
    # the S11 fixed-binary detour and its cast-copy
    if (n + 1) * width >= 2**31:  # int32 offset ceiling (~195M ids/call)
        raise ValueError("single _doc_ids call exceeds int32 utf8 offsets")
    offsets = np.arange(0, (n + 1) * width, width, dtype=np.int32)
    return pa.Array.from_buffers(
        pa.utf8(), n,
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(out.tobytes())],
    )


def make_base(n_docs: int, seed: int = 42, min_len: int = 8, max_len: int = 256) -> pa.Table:
    """F1 base snapshot: unique doc_id, random tokens, n_tok invariant."""
    rng = np.random.default_rng(seed)
    tokens, lens = _token_lists(rng, n_docs, min_len, max_len)
    return pa.Table.from_arrays(
        [
            _doc_ids(np.arange(n_docs, dtype=np.int64)),
            tokens,
            pa.array(lens, type=pa.int32()),
            pa.array(SOURCES[rng.integers(0, len(SOURCES), n_docs)]),
        ],
        schema=PAYLOAD_SCHEMA,
    )


def make_changelog(
    n_events: int,
    n_base_docs: int,
    seed: int = 43,
    start_lsn: int = 1_000_000,
    zipf_a: float = 1.1,
    op_mix: tuple[float, float, float] = (0.6, 0.3, 0.1),
    new_key_frac: float = 0.5,
    min_len: int = 8,
    max_len: int = 256,
) -> pa.Table:
    """F2 change-log: lsn strictly increasing at generation time, op mix
    ≈ I/U/D = ``op_mix``, Zipf(α≈1.1)-skewed doc_ids for hot-key pressure.

    Semantics contract (shared with oracle + engine): I and U both carry a
    full payload and UPSERT; D carries nulls and deletes (absent key →
    no-op). ``new_key_frac`` of I events target fresh keys beyond the base
    key space; everything else hits the skewed existing range.
    """
    rng = np.random.default_rng(seed)
    lsn = start_lsn + np.arange(n_events, dtype=np.int64)
    u = rng.random(n_events)
    op_codes = np.where(u < op_mix[0], 0, np.where(u < op_mix[0] + op_mix[1], 1, 2))

    # key choice: Zipf ranks folded into the live key space; a slice of the
    # I events mint fresh keys so the table grows over the replay.
    key_space = max(n_base_docs, 1)
    ranks = rng.zipf(zipf_a, size=n_events).astype(np.int64)
    idx = (ranks - 1) % key_space
    is_insert = op_codes == 0
    fresh = is_insert & (rng.random(n_events) < new_key_frac)
    n_fresh = int(fresh.sum())
    idx[fresh] = n_base_docs + rng.integers(0, max(n_fresh, 1) * 2, size=n_fresh)

    tokens, lens = _token_lists(rng, n_events, min_len, max_len)
    is_delete = op_codes == 2
    mask = pa.array(~is_delete)
    ops = pa.array(np.array(["I", "U", "D"])[op_codes])
    tbl = pa.Table.from_arrays(
        [
            pa.array(lsn, type=pa.int64()),
            ops,
            _doc_ids(idx),
            _masked(tokens, mask),
            _masked(pa.array(lens, type=pa.int32()), mask),
            _masked(pa.array(SOURCES[rng.integers(0, len(SOURCES), n_events)]), mask),
        ],
        schema=CHANGE_SCHEMA,
    )
    return tbl


def _masked(arr: pa.Array, keep: pa.Array) -> pa.Array:
    """Null out entries where ``keep`` is False (payload of D events)."""
    import pyarrow.compute as pc

    return pc.if_else(keep, arr, pa.nulls(len(arr), arr.type))


def write_changelog_segments(
    events: pa.Table,
    log_dir: str | Path,
    n_segments: int,
    shuffle_seed: int | None = 7,
) -> dict:
    """Write arrival-order-shuffled segments ``seg-{k:05d}.parquet`` plus a
    ``manifest.json`` (name, rows, min/max lsn, bytes) — F2 layout.

    Shuffling arrival order within/across segments exercises the engine's
    sort-within-group (events must be applied in LSN order regardless of
    arrival order, SURVEY.md §2.6).
    """
    log_dir = Path(log_dir)
    log_dir.mkdir(parents=True, exist_ok=True)
    n = events.num_rows
    if shuffle_seed is not None:
        perm = np.random.default_rng(shuffle_seed).permutation(n)
        events = events.take(pa.array(perm))
    bounds = np.linspace(0, n, n_segments + 1, dtype=np.int64)
    segs = []
    for k in range(n_segments):
        part = events.slice(int(bounds[k]), int(bounds[k + 1] - bounds[k]))
        name = f"seg-{k:05d}.parquet"
        path = log_dir / name
        pq.write_table(part, path, compression="zstd")
        lsns = part.column("lsn").to_numpy()
        segs.append(
            {
                "name": name,
                "rows": part.num_rows,
                "min_lsn": int(lsns.min()) if len(lsns) else None,
                "max_lsn": int(lsns.max()) if len(lsns) else None,
                "bytes": os.path.getsize(path),
            }
        )
    manifest = {"segments": segs}
    tmp = log_dir / "manifest.json.tmp"
    tmp.write_text(json.dumps(manifest, indent=2))
    os.replace(tmp, log_dir / "manifest.json")
    return manifest


def synth_dataset_big(
    root: str | Path,
    n_docs: int,
    n_events: int,
    n_segments: int,
    seed: int = 42,
    min_len: int = 8,
    max_len: int = 64,
) -> Path:
    """Chunked variant for 10^8-scale logs: each segment is generated and
    written independently (own RNG substream, contiguous lsn range,
    intra-segment arrival shuffle), so no single Arrow array ever exceeds
    the 2^31 list-offset limit and peak memory stays ~one segment."""
    root = Path(root)
    stamp = {
        "n_docs": n_docs, "n_events": n_events, "n_segments": n_segments,
        "seed": seed, "min_len": min_len, "max_len": max_len, "v": 2,
        "chunked": True,
    }
    stamp_path = root / "_synth.json"
    if stamp_path.exists() and json.loads(stamp_path.read_text()) == stamp:
        return root
    root.mkdir(parents=True, exist_ok=True)
    base = make_base(n_docs, seed=seed, min_len=min_len, max_len=max_len)
    pq.write_table(base, root / "base.parquet", compression="zstd")
    log_dir = root / "log"
    log_dir.mkdir(parents=True, exist_ok=True)
    per_seg = n_events // n_segments

    def seg_plan(k: int) -> tuple[int, int]:
        n = per_seg if k < n_segments - 1 else \
            n_events - per_seg * (n_segments - 1)
        return n, 10_000_000 + per_seg * k

    def make_seg(k: int) -> dict:
        n, start = seg_plan(k)
        ev = make_changelog(
            n, n_docs, seed=seed + 100 + k, start_lsn=start,
            min_len=min_len, max_len=max_len,
        )
        perm = np.random.default_rng(seed + 500 + k).permutation(n)
        ev = ev.take(pa.array(perm))
        name = f"seg-{k:05d}.parquet"
        pq.write_table(ev, log_dir / name, compression="zstd")
        lsns = ev.column("lsn").to_numpy()
        return {"name": name, "rows": n,
                "min_lsn": int(lsns.min()), "max_lsn": int(lsns.max()),
                "bytes": os.path.getsize(log_dir / name)}

    # segments are independent (own RNG substream, contiguous lsn range)
    # → generate them as parallel Ray tasks when a session is up; the
    # serial fallback keeps the function usable without Ray.
    import ray as _ray

    if _ray.is_initialized():
        @_ray.remote(num_cpus=1)
        def _gen(k: int) -> dict:
            return make_seg(k)

        segs = _ray.get([_gen.remote(k) for k in range(n_segments)])
    else:
        segs = [make_seg(k) for k in range(n_segments)]
    segs.sort(key=lambda s: s["name"])
    tmp = log_dir / "manifest.json.tmp"
    tmp.write_text(json.dumps({"segments": segs}, indent=2))
    os.replace(tmp, log_dir / "manifest.json")
    stamp_path.write_text(json.dumps(stamp))
    return root


def synth_dataset(
    root: str | Path,
    n_docs: int,
    n_events: int,
    n_segments: int = 8,
    seed: int = 42,
    min_len: int = 8,
    max_len: int = 256,
) -> Path:
    """Materialize (and cache) a full F1+F2 dataset under
    ``root/base.parquet`` + ``root/log/``. Idempotent: if the directory
    already carries a matching ``_synth.json`` stamp it is reused — so the
    two bench parallelism levels read identical bytes."""
    root = Path(root)
    stamp = {
        "n_docs": n_docs, "n_events": n_events, "n_segments": n_segments,
        "seed": seed, "min_len": min_len, "max_len": max_len, "v": 1,
    }
    stamp_path = root / "_synth.json"
    if stamp_path.exists() and json.loads(stamp_path.read_text()) == stamp:
        return root
    root.mkdir(parents=True, exist_ok=True)
    base = make_base(n_docs, seed=seed, min_len=min_len, max_len=max_len)
    pq.write_table(base, root / "base.parquet", compression="zstd")
    events = make_changelog(
        n_events, n_docs, seed=seed + 1, min_len=min_len, max_len=max_len
    )
    write_changelog_segments(events, root / "log", n_segments, shuffle_seed=seed + 2)
    stamp_path.write_text(json.dumps(stamp))
    return root
