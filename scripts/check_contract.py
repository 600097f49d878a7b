"""Self-check of the driver contract: run every queries() entry at a given
sf and compare against oracle_sql() via DuckDB the way the driver does
(row count + column names + order-insensitive value hash).

Usage: python scripts/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res):
    import pandas as pd
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)


def value_hash(df) -> str:
    import pandas as pd

    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    h = hashlib.blake2b(digest_size=12)
    for col in df.columns:
        s = df[col]
        if pd.api.types.is_datetime64_any_dtype(s):
            s = s.astype("datetime64[ns]").astype("int64")
        elif s.dtype == object and len(s) and all(
            type(v).__name__ in ("date", "Timestamp", "datetime") for v in s.head(3)
        ):
            s = pd.to_datetime(s).astype("datetime64[ns]").astype("int64")
        h.update(pd.util.hash_pandas_object(s, index=False).values.tobytes())
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb
    import ray

    ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 8)),
             include_dashboard=False, ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = e.queries(), e.oracle_sql()
    ok = fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"FAIL  {name}: ray error: {type(ex).__name__}: {str(ex)[:200]}")
            fail += 1
            continue
        dt = time.time() - t0
        sql = oracles.get(name)
        if sql is None:
            print(f"rows  {name}: {len(got)} rows ({dt:.1f}s) [rows-only]")
            ok += 1
            continue
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as ex:
            print(f"FAIL  {name}: oracle error: {ex}")
            fail += 1
            continue
        problems = []
        if len(got) != len(exp):
            problems.append(f"rows {len(got)} != {len(exp)}")
        if sorted(got.columns) != sorted(exp.columns):
            problems.append(f"cols {sorted(got.columns)} != {sorted(exp.columns)}")
        if not problems and value_hash(got) != value_hash(exp):
            problems.append("value-hash mismatch")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)} ({dt:.1f}s)")
            import pandas as pd

            with pd.option_context("display.max_columns", 20, "display.width", 200):
                print("  got:", got.sort_values(by=list(sorted(got.columns))).head(3).to_string())
                print("  exp:", exp.sort_values(by=list(sorted(exp.columns))).head(3).to_string())
            fail += 1
        else:
            print(f"OK    {name}: {len(got)} rows ({dt:.1f}s)")
            ok += 1
    print(f"\n{ok} ok, {fail} fail")
    ray.shutdown()
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
