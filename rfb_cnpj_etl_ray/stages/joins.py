"""Large-large join utilities: bucketed exact anti-join + Bloom filter.

``customers_without_orders`` (pipelines/relational.py) broadcasts the
parent key set — right for a side that fits in memory. These are the
100 TB paths the SURVEY/VERDICT call for when BOTH sides are fact-sized:

* :func:`bucketed_anti_join` — hash-partition both sides on the key with
  one keyed exchange (each key wholly in one block), then a vectorized
  ``np.isin`` per block. Exact at any size; shuffle volume = |left| +
  |right key column|, no driver state.
* :class:`BloomFilter` — a numpy bit-array Bloom built distributed
  (per-batch partial filters OR-combined) and broadcast via ``ray.put``.
  Used as a PRE-filter: definite non-members skip the exchange entirely;
  only possible members (≈ fp_rate of the left side) continue to the
  exact bucketed verify. At 1e10 keys a single filter no longer fits —
  shard it by key hash (one filter per bucket) with the same build.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from rfb_cnpj_etl_ray.hashing import hash_strings


class BloomFilter:
    """Plain-numpy Bloom filter over arbitrary key columns (hashed with
    the engine's SipHash). Double hashing: bit_i = (h1 + i*h2) mod m."""

    def __init__(self, num_bits: int, num_hashes: int,
                 bits: np.ndarray | None = None):
        self.m = int(num_bits)
        self.k = int(num_hashes)
        self.bits = bits if bits is not None else np.zeros(
            (self.m + 7) // 8, dtype=np.uint8)

    @classmethod
    def sized_for(cls, n_keys: int, fp_rate: float = 0.01) -> "BloomFilter":
        m = max(64, int(-n_keys * np.log(fp_rate) / (np.log(2) ** 2)))
        k = max(1, int(round(m / max(n_keys, 1) * np.log(2))))
        return cls(m, min(k, 16))

    def _positions(self, keys) -> np.ndarray:
        h1 = hash_strings(keys)
        h2 = h1 >> np.uint64(32) | np.uint64(1)  # odd → full-period stride
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        with np.errstate(over="ignore"):
            return ((h1[None, :] + i * h2[None, :])
                    % np.uint64(self.m)).astype(np.int64)

    def add(self, keys) -> None:
        pos = self._positions(keys).ravel()
        np.bitwise_or.at(self.bits, pos >> 3,
                         np.uint8(1) << (pos & 7).astype(np.uint8))

    def might_contain(self, keys) -> np.ndarray:
        pos = self._positions(keys)
        got = (self.bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        return got.all(axis=0)


def build_bloom(
    ds: "ray.data.Dataset",
    key: str,
    n_keys_hint: int,
    fp_rate: float = 0.01,
) -> BloomFilter:
    """Distributed build: each batch returns a partial bit array; the
    driver ORs them (tiny: one m/8-byte buffer per batch, OR-reduced
    incrementally — never the key sets themselves)."""
    proto = BloomFilter.sized_for(n_keys_hint, fp_rate)
    m, k = proto.m, proto.k

    def partial(batch: pa.Table) -> pa.Table:
        f = BloomFilter(m, k)
        f.add(batch.column(key))
        return pa.table({"bits": pa.array([f.bits.tobytes()],
                                          type=pa.large_binary())})

    out = BloomFilter(m, k)
    for row in ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).iter_rows():
        np.bitwise_or(out.bits, np.frombuffer(row["bits"], dtype=np.uint8),
                      out=out.bits)
    return out


def bucketed_anti_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    left_key: str,
    right_key: str,
    num_blocks: int | None = None,
) -> "ray.data.Dataset":
    """left rows whose key has NO match in right — exact, no broadcast.

    Both sides are tagged and unioned (right carries only its key), one
    keyed hash exchange co-locates all rows of a key, then each block
    filters vectorized. Scales as a single shuffle of |left| + |right
    keys|; skew bounded by the hash (a hot KEY still lands in one block —
    pre-dedup the right side's keys per batch to cap that, done here)."""
    from rfb_cnpj_etl_ray.stages.exchange import repartition_by_key

    left_schema = left.schema().base_schema

    def tag_left(batch: pa.Table) -> pa.Table:
        b = batch.append_column("__key", batch.column(left_key))
        return b.append_column(
            "__side", pa.array(np.zeros(b.num_rows, dtype=np.int8)))

    def tag_right(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc_

        keys = pc_.unique(batch.column(right_key))  # per-batch key dedup
        cols = {"__key": keys}
        for f in left_schema:  # null payload, left's schema
            cols[f.name] = pa.nulls(len(keys), f.type)
        t = pa.Table.from_pydict(cols)
        return t.select(["__key"] + [f.name for f in left_schema]) \
            .append_column("__side",
                           pa.array(np.ones(t.num_rows, dtype=np.int8)))

    def reorder_left(batch: pa.Table) -> pa.Table:
        return batch.select(["__key"] + [f.name for f in left_schema]
                            + ["__side"])

    lt = left.map_batches(tag_left, batch_format="pyarrow",
                          zero_copy_batch=True).map_batches(
        reorder_left, batch_format="pyarrow", zero_copy_batch=True)
    rt = right.map_batches(tag_right, batch_format="pyarrow",
                           zero_copy_batch=True)
    both = lt.union(rt)

    def anti(batch: pa.Table) -> pa.Table:
        side = batch.column("__side").to_numpy()
        keys = batch.column("__key").to_numpy(zero_copy_only=False)
        right_keys = keys[side == 1]
        keep = (side == 0) & ~np.isin(keys, right_keys)
        return batch.filter(pa.array(keep)).drop_columns(["__key", "__side"])

    return repartition_by_key(both, ["__key"], num_blocks).map_batches(
        anti, batch_format="pyarrow", batch_size=None
    )
