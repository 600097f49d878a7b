"""Scan pruning via manifest stats — the payoff of clustering + per-file
min/max (Delta data-skipping analog)."""

import numpy as np
import pyarrow.compute as pc

from e2e_ocsf_cyber_lakehouse_blueprint_ray import config as cfg, synth
from e2e_ocsf_cyber_lakehouse_blueprint_ray.schema import TRANSCRIPT, TRANSCRIPT_STATS_COLS
from e2e_ocsf_cyber_lakehouse_blueprint_ray.stages import cluster, compact
from e2e_ocsf_cyber_lakehouse_blueprint_ray.table import Table
from tests.test_table import CONF, make_table

#: small target files so clustering splits each partition into several
#: zkey-ordered files — that's what makes ts min/max stats selective
SMALL = cfg.test_config(num_partitions=4, target_file_bytes=32 * 1024)


def test_time_range_scan_prunes_after_clustering(tmp_table_dir, ray_session):
    base = synth.transcripts(0.001)
    t = Table.create(
        tmp_table_dir,
        TRANSCRIPT,
        partition_spec=f"hash:conv_id:{SMALL.num_partitions}",
        config=SMALL,
        stats_cols=TRANSCRIPT_STATS_COLS,
    )
    t.write_table(base, rows_per_file=300)
    cluster.cluster(t, mode="partition", curve="zorder")
    total_files = t.entries().num_rows
    assert total_files > SMALL.num_partitions  # several files per partition

    ts = base["ts"].cast("int64").to_numpy(zero_copy_only=False)
    lo = int(np.quantile(ts, 0.40))
    hi = int(np.quantile(ts, 0.45))
    pruned = t.pruned_entries(predicates={"ts": (lo, hi)})
    assert pruned.num_rows < total_files  # stats skipped some files

    # pruning is SOUND: pruned scan + residual filter == brute-force filter
    got = t.read_arrow(predicates={"ts": (lo, hi)})
    got_ts = got["ts"].cast("int64").to_numpy(zero_copy_only=False)
    got = got.filter((got_ts >= lo) & (got_ts <= hi))
    expect = base.filter((ts >= lo) & (ts <= hi))
    assert got.num_rows == expect.num_rows


def test_conv_scan_prunes_to_single_partition(tmp_table_dir, ray_session):
    """Point lookups prune by PARTITION (hash(conv_id) % P), then by conv_id
    min/max stats within it — conv ranges overlap across hash partitions by
    construction, so stats alone can't skip them."""
    from e2e_ocsf_cyber_lakehouse_blueprint_ray.hashing import hash64_str

    base = synth.transcripts(0.001)
    t = make_table(tmp_table_dir, base, rows_per_file=300)
    compact.compact(t)
    conv = "conv-00000321"
    part = f"part-{hash64_str(conv) % CONF.num_partitions}"
    pruned = t.pruned_entries(
        predicates={"conv_id": (conv, conv)}, partitions=[part]
    )
    assert 0 < pruned.num_rows < t.entries().num_rows
    assert set(pruned["partition"].to_pylist()) == {part}
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    got = pa.concat_tables(
        pq.read_table(os.path.join(t.dir, p)) for p in pruned["path"].to_pylist()
    )
    got = got.filter(pc.equal(got["conv_id"], conv))
    assert got.num_rows == base.filter(pc.equal(base["conv_id"], conv)).num_rows


def test_bloom_prunes_point_lookup_beyond_minmax(tmp_table_dir, ray_session):
    """Interleave conversations so every file's conv_id [min, max] range
    overlaps every other's — range stats alone keep all files; the per-file
    bloom still isolates the one file holding the probed conversation."""
    import pyarrow as pa

    from e2e_ocsf_cyber_lakehouse_blueprint_ray.state import manifest

    base = synth.transcripts(0.001)
    t = Table.create(
        tmp_table_dir,
        TRANSCRIPT,
        partition_spec="none",  # one dir: file ranges interleave maximally
        config=SMALL,
        stats_cols=TRANSCRIPT_STATS_COLS,
    )
    # shard WHOLE conversations round-robin across files: each conv lives in
    # one file, but every file's [min, max] conv range spans the whole table
    codes = base["conv_id"].dictionary_encode().combine_chunks().indices.to_numpy(
        zero_copy_only=False
    )
    for shard in range(7):
        part = base.filter(pa.array(codes % 7 == shard))
        t.write_table(part, rows_per_file=part.num_rows, name_prefix=f"s{shard}")
    ents = t.entries()
    assert ents.num_rows >= 6

    conv = base["conv_id"][0].as_py()
    files_with_conv = 0
    import json

    for s in ents["stats"].to_pylist():
        st = json.loads(s)
        assert "bloom" in st["conv_id"], "string stats should carry a bloom"
        if manifest.bloom_may_contain(st["conv_id"]["bloom"], conv):
            files_with_conv += 1

    pruned = t.pruned_entries(predicates={"conv_id": (conv, conv)})
    # min/max alone keeps everything (interleaved); bloom must do better
    assert pruned.num_rows == files_with_conv < ents.num_rows

    # soundness: the pruned scan still returns every row of the conv
    got = t.read_arrow(predicates={"conv_id": (conv, conv)})
    got = got.filter(pc.equal(got["conv_id"], conv))
    expected = base.filter(pc.equal(base["conv_id"], conv))
    assert got.num_rows == expected.num_rows
