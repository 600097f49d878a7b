"""The medallion pipeline: bronze → silver → gold OCSF fan-out.

Re-expression of the reference's three entry points (SURVEY.md §3):

EP1 bronze ingest  — Auto Loader JSONL → variant + 7 metadata columns
    (bronze_<src>_audit_logs.py); here: sources.jsonl.ingest_jsonl +
    functions.meta.BronzeMeta into an ``_event_date``-partitioned Table.
EP2 silver parse   — readStream.table(bronze) → 17-26 ``try_variant_get``
    extractions (silver_<src>_audit_logs.py:29-82); here: incremental
    bronze-file scan → functions.variant.SilverExtract actor pool.
EP3 gold fan-out   — 15 ``@sdp.append_flow`` → 6 shared Delta sinks with
    mergeSchema + pre-created minimal ``time TIMESTAMP`` schema
    (gold_ocsf_iam_event_classes_delta_sinks.py:117-179,184-305;
    utilities/pre_setup_ocsf_tables.py:96-116); here: 15 GoldTransform
    flows appending to 6 Tables whose commits are serialized by each
    table's metastore actor, with schema evolution on first append.

Incremental ("streaming table") semantics: each downstream flow records the
upstream files it consumed in its target's lineage log; a re-run processes
only upstream files added since — the S3 ``spark.readStream.table``
exactly-once analog at file granularity.
"""

from __future__ import annotations

import os

import pyarrow as pa

from ..config import EngineConfig, DEFAULT
from ..functions.meta import BronzeMeta
from ..functions.ocsf import GoldTransform, flows
from ..functions.variant import SilverExtract
from ..schema import BRONZE
from ..sources.jsonl import ingest_jsonl
from ..state import lineage
from ..table import Table

SOURCES = ("github", "slack", "atlassian")
GOLD_TABLES = {
    # reference utilities/utils.py:53-60
    "account_change": "ocsf_iam_account_change",
    "authentication": "ocsf_iam_authentication",
    "authorize_session": "ocsf_iam_authorize_session",
    "entity_management": "ocsf_iam_entity_management",
    "user_access": "ocsf_iam_user_access",
    "group_management": "ocsf_iam_group_management",
}

#: gold tables are pre-created with this minimal schema (the reference's
#: ``CREATE TABLE ... (time TIMESTAMP)``, pre_setup_ocsf_tables.py:103-107)
MINIMAL_GOLD = pa.schema([("time", pa.timestamp("us"))])


class Medallion:
    def __init__(self, root: str, config: EngineConfig | None = None):
        self.root = root
        self.config = config or DEFAULT

    # -- DDL pre-setup (S7) ---------------------------------------------

    def table(self, name: str) -> Table:
        return Table(os.path.join(self.root, name), self.config)

    def setup(self) -> None:
        for src in SOURCES:
            Table.create(
                os.path.join(self.root, f"bronze_{src}_audit_logs"),
                BRONZE,
                partition_spec="col:_event_date",
                config=self.config,
                stats_cols=["_event_time", "_event_date", "_source"],
            )
            # silver schema is established on first write (evolution), but the
            # table object + snapshot-0 exist up front, like pre-setup DDL.
            Table.create(
                os.path.join(self.root, f"silver_{src}_audit_logs"),
                BRONZE,  # superset grows via evolve_schema on first append
                partition_spec="col:_event_date",
                config=self.config,
                stats_cols=["_event_time", "_event_date", "_source", "action"],
            )
        for cls, name in GOLD_TABLES.items():
            Table.create(
                os.path.join(self.root, name),
                MINIMAL_GOLD,
                partition_spec="col:_event_date",
                config=self.config,
                stats_cols=["time", "_source", "class_uid"],
            )

    # -- incremental flow helper (S3 streaming-table analog) -------------

    def _new_upstream_files(self, upstream: Table, downstream: Table, tag: str) -> list[str]:
        import json

        from ..state import manifest

        log = lineage.read_log(downstream.dir)
        seen: set[str] = set()
        max_logged = -1
        if log.num_rows:
            for files, job, snap in zip(
                log["input_files"].to_pylist(),
                log["job_id"].to_pylist(),
                log["snapshot_id"].to_pylist(),
            ):
                if job.startswith(f"flow-{tag}"):
                    seen.update(files)
                    max_logged = max(max_logged, int(snap))
        # crash-window safety (mirrors sources/jsonl.consumed_files): commits
        # record their consumed upstream files atomically in snapshot extras
        for sid in manifest.list_snapshot_ids(downstream.dir):
            if sid <= max_logged:
                continue
            raw = manifest.snapshot_extra(downstream.dir, sid).get("flow_inputs")
            if raw:
                seen.update(json.loads(raw).get(tag, []))
        return [p for p in upstream.live_files() if p not in seen]

    def _run_flow(
        self,
        upstream: Table,
        downstream: Table,
        tag: str,
        transform,
        *,
        use_actor: bool,
        evolve: bool,
        schema: pa.Schema | None = None,
    ) -> int | None:
        import ray.data as rd

        new_files = self._new_upstream_files(upstream, downstream, tag)
        if not new_files:
            return None
        from ..table import DATASET_CONSTRUCT_LOCK

        with DATASET_CONSTRUCT_LOCK:
            ds = rd.read_parquet(sorted(new_files))
        out = ds.map_batches(
            transform,
            batch_format="pyarrow",
            batch_size=self.config.batch_size,
            concurrency=self.config.rewrite_concurrency,
        )
        # writer schemas are STATIC (silver_schema / class_schema) — no
        # dataset-plan probe, no partial execution per flow
        schema_probe = schema if evolve else None
        import json

        parent = downstream.current_snapshot_id()
        sid = downstream.append_dataset(
            out,
            operation=f"flow-{tag}",
            use_actor=use_actor,
            evolve_schema=schema_probe,
            extra={"flow_inputs": json.dumps({tag: sorted(new_files)})},
        )
        job_id = lineage.job_id_for(f"flow-{tag}", parent, params="|".join(sorted(new_files)))
        lineage.save_unit(
            downstream.dir,
            job_id,
            lineage.unit_id(new_files),
            {"partition": "", "inputs": new_files, "input_rows": 0, "entries": []},
        )
        lineage.finalize_job(downstream.dir, job_id, sid)
        return sid

    # -- entry points ----------------------------------------------------

    @staticmethod
    def _run_parallel(jobs: dict, parallel: bool) -> dict:
        """Run {key: thunk} concurrently (driver threads, one Ray streaming
        job each — the reference's N-concurrent-flows execution shape) or
        sequentially."""
        if not parallel or len(jobs) <= 1:
            return {k: fn() for k, fn in jobs.items()}
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=len(jobs)) as ex:
            futs = {k: ex.submit(fn) for k, fn in jobs.items()}
            return {k: f.result() for k, f in futs.items()}

    def run_bronze(
        self, fixture_root: str, *, use_actor: bool = False, parallel: bool = True
    ) -> dict[str, int | None]:
        def job(src):
            def run():
                t = self.table(f"bronze_{src}_audit_logs")
                sid, _ = ingest_jsonl(
                    t, os.path.join(fixture_root, src), BronzeMeta(src), use_actor=use_actor
                )
                return sid

            return run

        return self._run_parallel({src: job(src) for src in SOURCES}, parallel)

    def run_silver(
        self, *, use_actor: bool = False, parallel: bool = True
    ) -> dict[str, int | None]:
        from ..functions.variant import silver_schema

        def job(src):
            return lambda: self._run_flow(
                self.table(f"bronze_{src}_audit_logs"),
                self.table(f"silver_{src}_audit_logs"),
                f"silver-{src}",
                SilverExtract(src),
                use_actor=use_actor,
                evolve=True,
                schema=silver_schema(src),
            )

        return self._run_parallel({src: job(src) for src in SOURCES}, parallel)

    def run_gold(
        self, *, use_actor: bool = True, union: bool = False, parallel: bool = True
    ) -> dict[tuple[str, str], int | None]:
        """15 flows → 6 sinks, launched CONCURRENTLY like the reference's 15
        ``@append_flow`` streams in one pipeline; commits to a shared sink
        are serialized by its metastore actor (multi-writer path, S5) — or
        by the flock'd optimistic file protocol when ``use_actor=False``.
        ``union=True`` takes the S6 alternative shape: per class,
        ``Dataset.union`` the 3 per-source transformed streams and append
        once (one commit per sink instead of three)."""
        from ..functions.ocsf import class_schema

        if union:
            return self._run_gold_union(use_actor=use_actor)

        def job(src, cls):
            return lambda: self._run_flow(
                self.table(f"silver_{src}_audit_logs"),
                self.table(GOLD_TABLES[cls]),
                f"gold-{src}-{cls}",
                GoldTransform(src, cls),
                use_actor=use_actor,
                evolve=True,
                schema=class_schema(cls),
            )

        return self._run_parallel(
            {(src, cls): job(src, cls) for src, cls in flows()}, parallel
        )

    def _run_gold_union(self, *, use_actor: bool) -> dict[tuple[str, str], int | None]:
        by_class: dict[str, list[str]] = {}
        for src, cls in flows():
            by_class.setdefault(cls, []).append(src)
        # the 6 per-class union jobs touch DISJOINT sinks — run them
        # concurrently like the flow mode's 15 streams (they were serial,
        # which made union mode slower end-to-end despite fewer commits)
        jobs = {
            cls: (lambda c=cls, s=srcs: self._run_gold_union_class(c, s, use_actor))
            for cls, srcs in sorted(by_class.items())
        }
        results = self._run_parallel(jobs, parallel=True)
        out: dict[tuple[str, str], int | None] = {}
        for cls_result in results.values():
            out.update(cls_result)
        return out

    def _run_gold_union_class(
        self, cls: str, srcs: list[str], use_actor: bool
    ) -> dict[tuple[str, str], int | None]:
        import ray.data as rd

        out: dict[tuple[str, str], int | None] = {}
        sink = self.table(GOLD_TABLES[cls])
        parent = sink.current_snapshot_id()
        parts: list = []
        for src in srcs:
            upstream = self.table(f"silver_{src}_audit_logs")
            tag = f"gold-{src}-{cls}"
            new_files = self._new_upstream_files(upstream, sink, tag)
            if not new_files:
                out[(src, cls)] = None
                continue
            from ..table import DATASET_CONSTRUCT_LOCK

            # same guard as _run_flow: Ray's lazy fsspec import inside
            # read_parquet races when dataset plans are built from threads
            with DATASET_CONSTRUCT_LOCK:
                ds = rd.read_parquet(sorted(new_files))
            ds = ds.map_batches(
                GoldTransform(src, cls),
                batch_format="pyarrow",
                batch_size=self.config.batch_size,
            )
            parts.append((src, ds, new_files))
        if not parts:
            return out
        unioned = parts[0][1]
        for _, ds, _ in parts[1:]:
            unioned = unioned.union(ds)
        import json

        from ..functions.ocsf import class_schema

        sid = sink.append_dataset(
            unioned,
            operation=f"flow-gold-union-{cls}",
            use_actor=use_actor,
            evolve_schema=class_schema(cls),
            extra={
                "flow_inputs": json.dumps(
                    {f"gold-{src}-{cls}": sorted(nf) for src, _, nf in parts}
                )
            },
        )
        for src, _, new_files in parts:
            tag = f"gold-{src}-{cls}"
            job_id = lineage.job_id_for(
                f"flow-{tag}", parent, params="|".join(sorted(new_files))
            )
            lineage.save_unit(
                sink.dir,
                job_id,
                lineage.unit_id(new_files),
                {"partition": "", "inputs": new_files, "input_rows": 0, "entries": []},
            )
            lineage.finalize_job(sink.dir, job_id, sid)
            out[(src, cls)] = sid
        return out

    def run_all(
        self, fixture_root: str, *, use_actor_gold: bool = True, union_gold: bool = False
    ) -> None:
        self.setup()
        self.run_bronze(fixture_root)
        self.run_silver()
        self.run_gold(use_actor=use_actor_gold, union=union_gold)

    def summary(self) -> pa.Table:
        """The reference's unified-table analytical query
        (``SELECT _source, class_name, ... COUNT(*) ... GROUP BY``,
        _resources/PIPELINE_OVERVIEW.md:299-302) over all six gold sinks."""
        rows: list[dict] = []
        for cls, name in sorted(GOLD_TABLES.items()):
            t = self.table(name)
            got = t.read_arrow(columns=["_source", "class_name"])
            if got.num_rows == 0:
                continue
            agg = got.group_by(["_source", "class_name"]).aggregate([([], "count_all")])
            for r in agg.to_pylist():
                rows.append(
                    {
                        "_source": r["_source"],
                        "class_name": r["class_name"],
                        "n_events": r["count_all"],
                    }
                )
        if not rows:
            return pa.table(
                {
                    "_source": pa.array([], pa.string()),
                    "class_name": pa.array([], pa.string()),
                    "n_events": pa.array([], pa.int64()),
                }
            )
        return pa.Table.from_pylist(rows)
