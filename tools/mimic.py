"""Driver-mimic: run Ray query + DuckDB oracle side-by-side, compare
row count, schema (column names), and a value hash over name-sorted
columns — the same comparison shape as CORRECTNESS_r*.json."""
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
        got = to_df(qs[name](SF))
        want = con.execute(oracles[name]).df()
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
