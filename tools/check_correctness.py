#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: runs each oracle SQL in
DuckDB over the same parquet tables and compares rows/schema/values (dtype-
and order-sensitive) against the Verify parquet dumps."""
import duckdb, json, os, sys

outdir = sys.argv[1] if len(sys.argv) > 1 else '/tmp/verify_out'
sf = sys.argv[2] if len(sys.argv) > 2 else '/root/testdata/sf0.01'
oracle = json.load(open(f'{outdir}/oracle_sql.json'))
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders',
          'lineitem','events','documents','embeddings']:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
fails = 0
for name, sql in sorted(oracle.items()):
    pdir = f'{outdir}/{name}'
    if not os.path.isdir(pdir):
        print(f'{name:25s} NO_SPARK_OUTPUT'); fails += 1; continue
    try:
        a = con.sql(f"SELECT * FROM '{pdir}/*.parquet'").df()
        b = con.sql(sql).df()
    except Exception as e:
        print(f'{name:25s} ORACLE_ERR {str(e)[:160]}'); fails += 1; continue
    a = a[sorted(a.columns)]; b = b[sorted(b.columns)]
    if list(a.columns) != list(b.columns):
        print(f'{name:25s} SCHEMA {list(a.columns)} vs {list(b.columns)}'); fails += 1; continue
    if list(a.dtypes) != list(b.dtypes):
        print(f'{name:25s} DTYPES {dict(a.dtypes)} vs {dict(b.dtypes)}'); fails += 1; continue
    if len(a) != len(b):
        print(f'{name:25s} ROWS {len(a)} vs {len(b)}'); fails += 1; continue
    if not a.reset_index(drop=True).equals(b.reset_index(drop=True)):
        print(f'{name:25s} VALUE_MISMATCH'); fails += 1; continue
    print(f'{name:25s} OK rows={len(a)}')
print(f'\n{len(oracle)-fails}/{len(oracle)} green')
sys.exit(1 if fails else 0)
