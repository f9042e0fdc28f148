"""Keyed block exchange: hash-partition a Dataset so every row of a key
lands in exactly one block, enabling per-BATCH vectorized group work
(``map_batches(fn, batch_size=None)`` with pandas/Arrow kernels over the
whole frame) instead of one Python ``map_groups`` dispatch per group —
the difference between O(keys) Python calls and O(blocks) at 1e8+ keys.

Ray's ``groupby().map_groups`` is the per-group path; this is the
per-block path the engine's own LWW merge uses (stages/merge.py): shuffle
once by key hash, then every downstream reduce is a columnar kernel over
run boundaries.
"""

from __future__ import annotations

import ray
import ray.data
from ray.data.context import ShuffleStrategy


def repartition_by_key(
    ds: "ray.data.Dataset",
    keys: list[str],
    num_blocks: int | None = None,
) -> "ray.data.Dataset":
    """Hash-partition ``ds`` on ``keys`` into ``num_blocks`` blocks (one
    key never spans two blocks). Uses Ray's hash-shuffle operator; the
    required ``shuffle_strategy`` override is applied to THIS pipeline's
    captured DataContext only (each root read captures its own copy), so
    other datasets in the session keep the default sort-shuffle.

    ``num_blocks`` defaults to half the cluster CPU count (each hash
    partition costs a long-lived shuffle-actor slot, and fewer/larger
    blocks amortize that fixed setup — measured 3.7s→2.3s on the lww
    bench going 32→8 blocks at sf0.1) — at multi-node scale pass an
    explicit count sized so a block fits a worker's heap.
    """
    if num_blocks is None:
        num_blocks = max(8, int(ray.cluster_resources().get("CPU", 8)) // 2)

    def _strip_meta(t):
        # blocks inherit parquet/pandas schema metadata that defeats the
        # shuffle aggregator's schema-hash dedup (it logs "Failed to
        # hash the schemas"); a metadata-only rewrite is zero-copy and
        # gives every block the same clean schema
        return t.replace_schema_metadata(None) if t.schema.metadata else t

    ds = ds.map_batches(_strip_meta, batch_format="pyarrow",
                        zero_copy_batch=True)
    ds.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    return ds.repartition(num_blocks=num_blocks, keys=list(keys))
