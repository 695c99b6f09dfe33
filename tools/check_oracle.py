#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run graft.Verify first
(writes <outdir>/<query>/ parquet + oracle_sql.json), then this script runs
each oracle SQL in DuckDB over the same sf dir and diffs the value sets
(columns sorted by name, rows sorted, values stringified). Dev tool only."""
import sys, glob, json, math
import duckdb
import pandas as pd

outdir, sfdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
          'lineitem', 'events', 'documents', 'embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f'{outdir}/oracle_sql.json'))


def canon_val(v):
    if v is None:
        return 'NULL'
    if isinstance(v, float):
        if math.isnan(v):
            return 'NaN'
        if v == int(v) and abs(v) < 2**53:
            return str(int(v))
        return repr(v)
    return str(v)


def norm(df):
    df = df[sorted(df.columns)]
    rows = [tuple(canon_val(v) for v in row)
            for row in df.itertuples(index=False, name=None)]
    return sorted(rows)


queries = sorted(d.split('/')[-1] for d in glob.glob(f'{outdir}/*') if not d.endswith('.json'))
n_fail = 0
for name in queries:
    files = glob.glob(f'{outdir}/{name}/*.parquet')
    if not files:
        print(f'{name:24s} NO-OUTPUT'); n_fail += 1; continue
    got = pd.concat([pd.read_parquet(p) for p in files], ignore_index=True)
    if name not in oracle:
        print(f'{name:24s} rows-only ({len(got)} rows)'); continue
    try:
        exp = con.execute(oracle[name]).df()
    except Exception as e:
        print(f'{name:24s} ORACLE-SQL-ERROR: {e}'); n_fail += 1; continue
    if sorted(got.columns) != sorted(exp.columns):
        print(f'{name:24s} COLS-MISMATCH got={sorted(got.columns)} exp={sorted(exp.columns)}')
        n_fail += 1; continue
    g, e = norm(got), norm(exp)
    # Driver-style strictness: a column that is int64 on one side and
    # float64/object on the other (e.g. an uncast DuckDB HUGEINT window
    # SUM) hash-mismatches in the real gate even when canon_val coerces
    # the values equal. Surface it as a failure here too.
    dtype_drift = [c for c in sorted(got.columns)
                   if str(got[c].dtype) != str(exp[c].dtype)]
    if g == e and dtype_drift:
        n_fail += 1
        print(f'{name:24s} DTYPE-DRIFT '
              + ', '.join(f'{c}: spark={got[c].dtype} duck={exp[c].dtype}'
                          for c in dtype_drift))
    elif g == e:
        print(f'{name:24s} OK ({len(g)} rows)')
    else:
        n_fail += 1
        print(f'{name:24s} MISMATCH got={len(g)} exp={len(e)} rows')
        only_g = [r for r in g if r not in set(e)][:3]
        only_e = [r for r in e if r not in set(g)][:3]
        print(f'   only-in-spark: {only_g}')
        print(f'   only-in-duck : {only_e}')

print(f'== {n_fail} failures / {len(queries)} queries ==')
sys.exit(1 if n_fail else 0)
