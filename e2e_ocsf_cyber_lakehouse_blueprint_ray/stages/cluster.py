"""Z-order / Hilbert clustering job — the engine's liquid clustering.

Reference analog: ``cluster_by=["_event_date"]`` on bronze/silver
(/root/reference/transformations/pipelines/github/audit_logs/
bronze_github_audit_logs.py:32) and ``ALTER TABLE ... CLUSTER BY (time)`` on
the six gold tables (utilities/post_setup_ocsf_tables.py:40-53). Our key is
the bit-interleave of (high bits of hash64(conv_id), ts-bucket) with a
Hilbert-curve fallback (hashing.curve_key) so scans filtering on either
conv_id or time ranges prune files via manifest min/max stats.

Two execution modes:

``mode="global"`` — ONE Ray Data pipeline over every live file:
    read → map_batches(add _part,_zkey) → sort(["_part","_zkey"]) →
    actor-pool writer (split each sorted batch at partition boundaries,
    write target-size files, emit manifest entries) → single commit.
    The sort is Ray's range-partitioned shuffle: this is the op's intended
    scale path (spills via the object store; skewed hot conv_ids are fine
    because their rows spread across ts-buckets of the curve).

``mode="partition"`` — one bin per table partition, rewritten independently
    on the actor pool with an in-memory zkey sort; per-partition lineage →
    mid-job crash resume. Right choice when partitions are modest and
    resumability matters more than cross-partition pipelining.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import EngineConfig
from ..hashing import curve_key, hash64_column
from ..state import lineage
from ..state.manifest import ENTRY_SCHEMA
from ..table import Table
from . import compact, rewrite


def add_cluster_key(batch: pa.Table, *, config: EngineConfig, curve: str, num_partitions: int) -> pa.Table:
    h = hash64_column(batch["conv_id"])
    zk = curve_key(
        h,
        batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False),
        bucket_s=config.zorder_ts_bucket_s,
        curve=curve,
        bits=config.curve_bits,
    )
    part = (h % np.uint64(num_partitions)).astype(np.int32)
    return batch.append_column("_part", pa.array(part)).append_column("_zkey", pa.array(zk))


class _ClusterWriter:
    """Writes sorted batches as data files, splitting at partition
    boundaries; one Parquet writer context per actor."""

    def __init__(self, table_dir: str, config: EngineConfig, bytes_per_row: float):
        import uuid

        self.table = Table(table_dir, config)
        self.stats_cols = self.table.stats_cols() or None
        self.rows_per_file = max(
            1,
            min(
                config.max_rows_per_file,
                int(config.target_file_bytes / max(1.0, bytes_per_row)),
            ),
        )
        self.wid = uuid.uuid4().hex[:10]
        self.seq = 0

    def __call__(self, batch: pa.Table) -> pa.Table:
        entries = []
        parts = batch["_part"].to_numpy(zero_copy_only=False)
        data = batch.drop_columns(["_part", "_zkey"])
        bounds = np.flatnonzero(np.r_[True, parts[1:] != parts[:-1]])
        for i, b in enumerate(bounds):
            e = bounds[i + 1] if i + 1 < len(bounds) else len(parts)
            chunk = data.slice(b, e - b)
            pdir = f"part-{int(parts[b])}"
            for off in range(0, chunk.num_rows, self.rows_per_file):
                sl = chunk.slice(off, self.rows_per_file)
                name = f"z-{self.wid}-{self.seq:06d}.parquet"
                self.seq += 1
                entries.append(self.table.write_file(sl, pdir, name, self.stats_cols))
        if not entries:
            return ENTRY_SCHEMA.empty_table()
        return pa.Table.from_pylist(entries, schema=ENTRY_SCHEMA)


def cluster(
    table: Table,
    *,
    mode: str = "global",
    curve: str | None = None,
    concurrency: int | None = None,
    use_actor: bool = False,
    fail_after: int | None = None,
) -> int | None:
    cfg = table.config
    curve = curve or cfg.curve
    parent = table.current_snapshot_id()
    ents = table.entries(parent)
    if ents.num_rows == 0:
        return None
    removed = ents["path"].to_pylist()
    job_id = lineage.job_id_for(f"cluster-{curve}-{mode}", parent)

    if mode == "partition":
        bins = compact.plan_compaction(table, recluster=True, snapshot_id=parent)
        added = rewrite.run_bins(
            table,
            bins,
            job_id,
            concurrency=concurrency,
            sort_mode="zorder",
            curve=curve,
            fail_after=fail_after,
        )
    elif mode == "global":
        spec = table.partition_spec(parent)
        num_partitions = int(spec.rsplit(":", 1)[1]) if spec.startswith("hash:") else 1
        total_rows = int(pc.sum(ents["rows"]).as_py() or 0)
        total_bytes = int(pc.sum(ents["bytes"]).as_py() or 0)
        bpr = total_bytes / max(1, total_rows)
        ds = table.scan(snapshot_id=parent)
        ds = ds.map_batches(
            add_cluster_key,
            fn_kwargs=dict(config=cfg, curve=curve, num_partitions=num_partitions),
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
        )
        ds = ds.sort(["_part", "_zkey"])
        ent_ds = ds.map_batches(
            _ClusterWriter,
            fn_constructor_args=(table.dir, cfg, bpr),
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
            concurrency=max(1, concurrency or cfg.rewrite_concurrency),
        )
        rows = ent_ds.take_all()  # manifest entries only — data stays distributed
        added = (
            pa.Table.from_pylist(rows, schema=ENTRY_SCHEMA) if rows else ENTRY_SCHEMA.empty_table()
        )
    else:
        raise ValueError(f"unknown mode {mode!r}")

    return table.commit(
        added=added,
        removed=removed,
        operation=f"cluster-{curve}",
        expected_parent=parent,
        use_actor=use_actor,
        job_id=job_id,
    )
