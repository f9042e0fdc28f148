"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as Arrow ``binary`` columns with a
metadata struct; decode / feature-extract / resize / frame-sample run as
actor-pool ``map_batches`` stages (decoder state loaded once per actor).
The actual codecs are NOT in this container, so the decode step is
STUBBED: ``RealDecoder`` raises ``NotImplementedError`` with the install
hint, and ``FakeDecoder`` produces deterministic features from the bytes
— the Ray-side plumbing (schema, batch sizing, actor signature, output
layout) is real and tested either way.

Batch-size note (100 TB): binary rows are wide — a 1 MB payload means
``batch_size`` of a few hundred, not 32k; pass ``batch_size`` explicitly
at call sites and keep ``batch_format="pyarrow"`` (binary columns do not
round-trip pandas well).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

#: schema of a multimodal payload table.
MEDIA_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.int64()),
        pa.field("payload", pa.binary()),
        pa.field("media_type", pa.string()),   # "image" | "audio" | "video"
        pa.field("n_bytes", pa.int64()),
    ]
)


class RealDecoder:
    """Placeholder for a real decoder actor (PIL / libav / torchaudio).

    Keeps the exact actor signature the fake uses, so swapping it in is a
    one-line change at the call site."""

    def __init__(self, media_type: str = "image"):
        self.media_type = media_type
        try:
            import PIL.Image  # noqa: F401  (not installed in this container)
            self._available = True
        except ImportError:
            self._available = False

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self._available:
            raise NotImplementedError(
                "media decoding requires Pillow/libav which are not in this "
                "environment; use FakeDecoder for the plumbing path"
            )
        raise NotImplementedError("real decode path not implemented")


class FakeDecoder:
    """Deterministic stand-in 'decoder': derives pseudo features (width,
    height, mean 'luminance') from the payload bytes — pure numpy over a
    flat buffer, stable across runs, exercising the same Arrow plumbing
    a real decoder would."""

    def __init__(self, media_type: str = "image"):
        self.media_type = media_type

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload")
        lens = pc.binary_length(payloads).to_numpy().astype(np.int64)
        flat = np.frombuffer(b"".join(payloads.to_pylist()), dtype=np.uint8) \
            if batch.num_rows else np.array([], dtype=np.uint8)
        offsets = np.zeros(len(lens), dtype=np.int64)
        np.cumsum(lens[:-1], out=offsets[1:])
        means = np.zeros(len(lens))
        nonempty = lens > 0
        if flat.size:
            sums = np.add.reduceat(flat.astype(np.int64), offsets[nonempty])
            means[nonempty] = sums / lens[nonempty]
        width = (lens % 640 + 1).astype(np.int32)
        height = (lens % 480 + 1).astype(np.int32)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "media_type": batch.column("media_type"),
                "width": pa.array(width),
                "height": pa.array(height),
                "mean_luma": pa.array(np.round(means, 3)),
                "n_bytes": batch.column("n_bytes"),
            }
        )


def attach_payloads(sf_dir: str):
    """Build a MEDIA_SCHEMA dataset from documents (text bytes stand in
    for media payloads — deterministic, no external data)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def to_media(batch: pa.Table) -> pa.Table:
        payload = batch.column("text").cast(pa.binary())
        n = pc.binary_length(payload).cast(pa.int64())
        kinds = pa.array(
            np.array(["image", "audio", "video"])[
                batch.column("doc_id").to_numpy() % 3
            ]
        )
        return pa.Table.from_arrays(
            [batch.column("doc_id"), payload, kinds, n], schema=MEDIA_SCHEMA
        )

    return ds.map_batches(to_media, batch_format="pyarrow", zero_copy_batch=True)


def multimodal_features(sf_dir: str, batch_size: int = 512):
    """The full plumbing pipeline: attach payloads → actor-pool decode
    (fake) → feature table. rows-only oracle (features are stub-defined).
    """
    media = attach_payloads(sf_dir)
    return media.map_batches(
        FakeDecoder,
        fn_constructor_kwargs={"media_type": "image"},
        batch_format="pyarrow",
        batch_size=batch_size,   # small: binary rows are wide
        concurrency=(1, 4),
    )
