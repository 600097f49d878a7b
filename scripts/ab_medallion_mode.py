"""A/B: medallion gold in flow mode (15 concurrent per-class flows) vs
union mode (single unioned pass, concurrent gold classes).

Round-4 verdict stretch item 8: bench flow-mode vs union-mode at the 20k
driver fixture and make the faster one the bench default (target
``medallion_all`` <= 10 s in BENCH_r05). Interleaved repeats on one
fixture so ambient load lands on both arms.

Usage: [AB_EVENTS=20000] [AB_REPEAT=3] python scripts/ab_medallion_mode.py
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import ray

    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    n_events = int(os.environ.get("AB_EVENTS", "20000"))
    repeat = int(os.environ.get("AB_REPEAT", "3"))

    ray.init(
        address="local",
        num_cpus=ncpu,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from e2e_ocsf_cyber_lakehouse_blueprint_ray import config as cfg, synth
    from e2e_ocsf_cyber_lakehouse_blueprint_ray.pipelines.medallion import Medallion

    root = (
        "/dev/shm/lakeray-ab-med" if os.path.isdir("/dev/shm") else "/tmp/lakeray-ab-med"
    )
    shutil.rmtree(root, ignore_errors=True)
    synth.write_audit_fixture(
        f"{root}/raw", n_per_source=n_events, files_per_source=8
    )

    samples = {"flow": [], "union": []}
    # one untimed warm run per arm (worker spin-up), then interleaved timing
    for k in range(repeat + 1):
        for mode, union in (("flow", False), ("union", True)):
            tbl_dir = f"{root}/tables-{mode}-{k}"
            m = Medallion(tbl_dir, cfg.test_config())
            t0 = time.time()
            m.run_all(f"{root}/raw", use_actor_gold=True, union_gold=union)
            dt = time.time() - t0
            shutil.rmtree(tbl_dir, ignore_errors=True)
            if k > 0:
                samples[mode].append(round(dt, 3))
    shutil.rmtree(root, ignore_errors=True)

    total = 3 * n_events
    out = {
        "metric": "medallion gold flow-mode vs union-mode A/B",
        "events": total,
        "num_cpus": ncpu,
        "flow_sec": min(samples["flow"]),
        "union_sec": min(samples["union"]),
        "flow_events_per_sec": round(total / min(samples["flow"]), 1),
        "union_events_per_sec": round(total / min(samples["union"]), 1),
        "samples": samples,
    }
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
