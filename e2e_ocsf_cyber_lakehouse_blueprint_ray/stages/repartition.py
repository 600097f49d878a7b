"""Salted repartitioning for skewed keys.

BASELINE.json north_star: "Skewed conversations (hot conv_ids with millions
of turns) are handled by salted repartitioning and per-partition sort on
(conv_id, turn_idx)". The fixture's hot set (conv-00000000..07,
FIXTURES.md §1) would pin a naive hash-by-conv_id exchange onto single
reducers; here every row gets

    shard = (hash64(conv_id) ⊕ mix(turn_idx // salt_chunk_rows)) % num_shards

so a conversation with fewer than ``salt_chunk_rows`` turns stays on ONE
shard (salt term = 0 → plain hash partitioning) while a hot conversation
spreads across ceil(turns/chunk) shards in contiguous turn ranges — no hot
key detection pass needed, and per-shard sorting by (conv_id, turn_idx)
keeps each chunk internally ordered; the global scan order is restored by
ordering shards/(files) by their (conv_id, min turn) stats, which is how the
stable-order invariant survives salting (SURVEY.md §7 hard part (b)).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import EngineConfig
from ..hashing import hash64_column

_MIX = np.uint64(0x9E3779B97F4A7C15)  # Fibonacci hashing constant


def salted_shard(batch: pa.Table, *, num_shards: int, salt_chunk_rows: int) -> np.ndarray:
    h = hash64_column(batch["conv_id"])
    salt = (batch["turn_idx"].to_numpy(zero_copy_only=False).astype(np.uint64)) // np.uint64(
        salt_chunk_rows
    )
    mixed = h ^ (salt * _MIX)
    return (mixed % np.uint64(num_shards)).astype(np.int32)


def add_salted_shard(batch: pa.Table, *, num_shards: int, salt_chunk_rows: int) -> pa.Table:
    s = salted_shard(batch, num_shards=num_shards, salt_chunk_rows=salt_chunk_rows)
    return batch.append_column("_shard", pa.array(s))


def salted_map_shards(
    ds,
    fn,
    *,
    config: EngineConfig,
    num_shards: int | None = None,
    batch_format: str = "pyarrow",
):
    """groupby-shard → per-shard fn, with hot conv_ids salted across shards.

    ``fn`` receives each shard's rows sorted by (conv_id, turn_idx); its
    output keeps the ``_shard`` column dropped. This is the skew-safe
    replacement for ``ds.groupby("conv_id").map_groups(fn)``.
    """
    shards = num_shards or config.num_partitions * 4

    ds = ds.map_batches(
        add_salted_shard,
        fn_kwargs=dict(num_shards=shards, salt_chunk_rows=config.salt_chunk_rows),
        batch_format="pyarrow",
        batch_size=config.batch_size,
    )

    def per_shard(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]
        )
        t = t.take(idx).drop_columns(["_shard"])
        return fn(t)

    return ds.groupby("_shard").map_groups(per_shard, batch_format=batch_format)
