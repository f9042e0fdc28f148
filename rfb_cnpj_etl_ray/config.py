"""Engine tunables.

Analog of the reference's ``config.py`` knob sheet (batch size, per-table
batch ratios, worker counts, queue size, retries — see SURVEY.md §2.8 and
reference ``src/rfb_cnpj_etl/config.py:27-60``), redesigned for Ray Data:
batch/block sizing instead of queue sizes, partition counts instead of
thread counts, and explicit skew (salting) knobs instead of the static
``BATCH_RATIO`` shrink factor.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class EngineConfig:
    # --- partitioning -----------------------------------------------------
    #: number of hash partitions of the lake table (by ``doc_id``). At 100 TB
    #: this should be ≫ total cores (e.g. 4–16× cluster cores) so work-stealing
    #: hides stragglers; partition count is fixed at table-init time.
    num_partitions: int = 32

    #: rows per Arrow batch handed to map_batches stages. Bigger batches
    #: amortize the per-batch sort and produce fewer staged chunks
    #: (measured: 2× throughput from 16k→128k at ~170 B/row); size so
    #: batch_bytes × concurrent tasks fits worker heap — at ~1 KB/row
    #: payloads (max-length token lists) 64k rows ≈ 64 MB per batch.
    batch_size: int = 65_536

    # --- shuffle strategy -------------------------------------------------
    #: "staged" (default): two-phase exchange through the staging dir —
    #: phase-1 tasks append per-partition chunk files, phase-2 tasks merge
    #: one partition each. No global sort barrier; multi-node the staging
    #: dir lives on shared storage. "groupby": Ray-native
    #: groupby(part).map_groups sort shuffle (object-store all-to-all) —
    #: kept for comparison and for clusters without shared storage.
    shuffle: str = "staged"

    #: run the per-batch partial LWW reduce in phase 1 (shrinks shuffled
    #: bytes and collapses hot keys before the exchange).
    partial_reduce: bool = True

    #: staging chunks are transient — favor speed over ratio.
    staging_compression: str = "lz4"

    #: "cow" (copy-on-write): every touched partition is rewritten as a
    #: full snapshot per epoch — best for one big replay or read-heavy
    #: tables. "delta" (merge-on-read): each epoch appends only the
    #: LWW-reduced new events per partition; readers (and later merges)
    #: fold base+deltas on the fly, and ``compact`` folds them back into
    #: one snapshot. Delta mode removes the O(table size) write
    #: amplification per epoch — the steady-state CDC configuration.
    write_mode: str = "cow"

    # --- skew handling ----------------------------------------------------
    #: two-stage salted merge on BOTH shuffle paths. staged: phase-1
    #: writes per-(partition, doc-hash-salt) chunk buckets, phase-2a
    #: folds each bucket in parallel, phase-2b merges (a pathologically
    #: hot partition's fold spreads over salt_factor tasks). groupby:
    #: lsn-salted (partition, salt) pre-reduce then per-partition merge.
    #: 1 = disabled. Only useful when a single partition's event group
    #: exceeds a worker; the per-batch partial LWW reduce already
    #: collapses hot KEYS to ≤1 row per block.
    salt_factor: int = 1

    # --- merge stage sizing ----------------------------------------------
    #: actor-pool size for the partition merger stage; None → let Ray size
    #: stateless tasks. A (min, max) tuple autoscales the pool.
    merge_concurrency: int | tuple[int, int] | None = None

    #: CPUs reserved per merger actor/task.
    merge_num_cpus: float = 1.0

    #: CPUs reserved per heavy task in the staged exchange. None → auto:
    #: 2 when the node advertises SMT-inflated CPU counts (>16), else 1.
    #: Memory-bandwidth-bound sort/copy kernels gain nothing from
    #: hyperthread siblings and collapse under 2× oversubscription — one
    #: task per physical core is the fast configuration.
    staged_task_num_cpus: float | None = None

    # --- sink -------------------------------------------------------------
    #: parquet compression for staged partition files.
    compression: str = "zstd"

    #: rows per row-group in written parquet (bounds reader memory).
    row_group_size: int = 64 * 1024

    # --- progress ---------------------------------------------------------
    #: live progress lines during ingest (reference: utils/progress.py
    #: bar). One fire-and-forget counter call per staged batch; off by
    #: default to keep benches clean.
    progress: bool = False

    # --- failure injection (tests only) -----------------------------------
    #: when True, ``ingest`` stages all partition files but raises before the
    #: commit-log append — simulates a crash between staging and commit
    #: (reference analog: interrupted download leaving ``.part`` files,
    #: cnpj_downloader.py:84-96).
    fail_before_commit: bool = field(default=False, repr=False)

    def validate(self) -> None:
        if self.shuffle not in ("staged", "groupby"):
            raise ValueError("shuffle must be 'staged' or 'groupby'")
        if self.write_mode not in ("cow", "delta"):
            raise ValueError("write_mode must be 'cow' or 'delta'")
        if self.write_mode == "delta" and self.shuffle != "staged":
            raise ValueError("write_mode='delta' requires shuffle='staged'")
        if self.num_partitions < 1:
            raise ValueError("num_partitions must be >= 1")
        if self.salt_factor < 1:
            raise ValueError("salt_factor must be >= 1")
        if self.batch_size < 1:
            raise ValueError("batch_size must be >= 1")
