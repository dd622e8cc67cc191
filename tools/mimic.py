"""Driver-mimic: run Ray query + DuckDB oracle side-by-side, compare
row count, schema (column names), and a value hash over name-sorted
columns — the same comparison shape as CORRECTNESS_r*.json.

OPERATIONAL LIMIT: one process exhausts vm.max_map_count (65530) after
roughly 100 query executions — Ray Data + Arrow + DuckDB accumulate
memory maps per dataset run, and at the ceiling mmap-backed allocations
fail as DuckDB "Out of Memory ... bad allocation" and Python "can't
start new thread" REGARDLESS of the query. Run the full sweep in chunks
of ≤~60 names per process:

    python tools/mimic.py <sf_dir> "name1,name2,..."

(the driver's 50-query prefix sample is safely under the ceiling).
"""
import hashlib
import json
import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")
SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
NAMES = sys.argv[2].split(",") if len(sys.argv) > 2 else None

import ray

ray.init(address="local", num_cpus=8, include_dashboard=False,
         log_to_driver=False)

import __ray_entry__ as e

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()
con = duckdb.connect()
# Bound DuckDB's budget explicitly: its default (80% of RAM) collides
# with Ray's object-store reservation and the heaviest w24g recursive
# CTEs then die with bad_alloc instead of spilling. A hard limit plus a
# temp_directory makes them spill to disk and finish.
con.execute("SET memory_limit='40GB'")
os.makedirs("/tmp/duckdb_spill", exist_ok=True)
con.execute("SET temp_directory='/tmp/duckdb_spill'")
for t in TABLES:
    p = os.path.join(SF, f"{t}.parquet")
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")


def to_df(res):
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    return pd.DataFrame(res)


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    sort_cols = list(df.columns)
    try:
        df = df.sort_values(sort_cols).reset_index(drop=True)
    except Exception:
        pass
    h = hashlib.sha256()
    for c in df.columns:
        col = df[c]
        if col.dtype.kind == "f":
            h.update(np.round(col.to_numpy(dtype="d"), 6).tobytes())
        else:
            h.update(col.astype(str).str.cat(sep="\x1f").encode())
    return h.hexdigest()


oracles = e.oracle_sql()
qs = e.queries()
names = NAMES or list(oracles)
out = {}
for name in names:
    try:
        import time as _time
        _t0 = _time.time()
        got = to_df(qs[name](SF))
        _t1 = _time.time()
        want = con.execute(oracles[name]).df()
        print(f"[mimic] {name}: ray {_t1 - _t0:.1f}s "
              f"oracle {_time.time() - _t1:.1f}s",
              file=sys.stderr, flush=True)
        rows = len(got) == len(want)
        schema = sorted(got.columns) == sorted(want.columns)
        hm = value_hash(got) == value_hash(want) if rows and schema else False
        out[name] = {"rows_match": rows, "schema_match": schema,
                     "hash_match": hm, "ray_rows": len(got),
                     "oracle_rows": len(want)}
        if not hm:
            print(f"--- {name} MISMATCH")
            print("ray cols:", list(got.columns))
            print("sql cols:", list(want.columns))
            print(got.head(3))
            print(want.head(3))
    except Exception as ex:
        out[name] = {"err": f"{type(ex).__name__}: {ex}"}
        print(f"--- {name} ERROR: {ex}")

print(json.dumps(out, indent=1))
ray.shutdown()
