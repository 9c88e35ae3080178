#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate: run each oracle
SQL from a Verify outDir in DuckDB over the same sf parquet tables and
compare rows/schema/values to the Spark result parquet. Mirrors the
driver's compare (sort columns by name, order-insensitive row hash).

Usage: python3 tools/local_compare.py <sfDir> <verifyOutDir> [query ...]
"""
import json, sys, duckdb

sf = sys.argv[1]
out = sys.argv[2]
only = set(sys.argv[3:])

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracles = json.load(open(f"{out}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracles.items()):
    if only and name not in only:
        continue
    try:
        o = con.execute(sql).fetch_df()
        s = con.execute(f"SELECT * FROM '{out}/{name}/*.parquet'").fetch_df()
        o = o.reindex(sorted(o.columns), axis=1)
        s = s.reindex(sorted(s.columns), axis=1)
        rows = len(o) == len(s)
        schema = list(o.columns) == list(s.columns)
        def canon(df):
            return sorted(tuple(f"{v:.9g}" if isinstance(v, float) else str(v)
                                for v in row) for row in df.itertuples(index=False))
        values = canon(o) == canon(s)
        ok = rows and schema and values
        if not ok:
            fail += 1
            print(f"FAIL {name}: rows={rows} ({len(s)} vs {len(o)}) schema={schema} values={values}")
            if not schema:
                print(f"  spark  : {list(s.columns)}\n  oracle : {list(o.columns)}")
            if schema and not values:
                co, cs = canon(o), canon(s)
                diff = [(a, b) for a, b in zip(co, cs) if a != b][:3]
                for a, b in diff:
                    print(f"  oracle={a}\n  spark ={b}")
        else:
            print(f"ok   {name}: {len(s)} rows")
    except Exception as e:
        fail += 1
        print(f"ERROR {name}: {e}")
sys.exit(1 if fail else 0)
