#!/usr/bin/env python3
"""Replay the driver's DuckDB compare over a graft.Verify output dir.

Usage: python3 tools/oracle_compare.py [verify_out_dir] [sf_dir]
"""
import duckdb, json, sys

out = sys.argv[1] if len(sys.argv) > 1 else '/tmp/verify_out'
d = sys.argv[2] if len(sys.argv) > 2 else '/root/testdata/sf0.01'
con = duckdb.connect()
for t in ['lineitem', 'orders', 'customer', 'supplier', 'part', 'nation',
          'region', 'events', 'documents', 'embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'")
bad = 0
for name, sql in sorted(json.load(open(f'{out}/oracle_sql.json')).items()):
    try:
        got = con.execute(f"SELECT * FROM '{out}/{name}/*.parquet'").df()
        exp = con.execute(sql).df()
    except Exception as e:
        bad += 1
        print(name, 'ERR', str(e)[:120])
        continue

    def canon(df):
        df = df[sorted(df.columns)]
        return df.sort_values(by=list(df.columns)).reset_index(drop=True)
    g, e = canon(got), canon(exp)
    ok = (list(g.columns) == list(e.columns) and len(g) == len(e)
          and list(g.dtypes) == list(e.dtypes) and g.equals(e))
    if not ok:
        bad += 1
        print(name, f'MISMATCH rows={len(g)}/{len(e)}')
print('ALL OK' if bad == 0 else f'{bad} MISMATCHES')
sys.exit(1 if bad else 0)
