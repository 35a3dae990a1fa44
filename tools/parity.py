#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: compare Verify.scala's
parquet dumps against DuckDB running oracle_sql.json on the same tables."""
import sys, json, glob, os
import duckdb, pandas as pd, numpy as np

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
names = sorted([os.path.basename(p) for p in glob.glob(f"{out_dir}/*") if os.path.isdir(p)])
fails = 0
for name in names:
    try:
        got = con.execute(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf()
    except Exception as e:
        print(f"FAIL {name}: cannot read spark output: {e}"); fails += 1; continue
    if name not in oracle:
        print(f"SKIP {name}: no oracle (rows={len(got)})"); continue
    try:
        exp = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {str(e).splitlines()[0][:160]}"); fails += 1; continue
    g = got.reindex(sorted(got.columns), axis=1)
    e = exp.reindex(sorted(exp.columns), axis=1)
    if list(g.columns) != list(e.columns):
        print(f"FAIL {name}: columns {list(g.columns)} != {list(e.columns)}"); fails += 1; continue
    g = g.sort_values(by=list(g.columns), na_position='first').reset_index(drop=True)
    e = e.sort_values(by=list(e.columns), na_position='first').reset_index(drop=True)
    if len(g) != len(e):
        print(f"FAIL {name}: rows {len(g)} != {len(e)}"); fails += 1; continue
    bad = None
    for c in g.columns:
        gv, ev = g[c], e[c]
        if gv.dtype.kind == 'f' or ev.dtype.kind == 'f':
            ok = ((gv.isna() & ev.isna()) | (gv == ev)).all()
        else:
            ok = (gv.astype(object).where(~gv.isna(), None) == ev.astype(object).where(~ev.isna(), None)).all()
        if not ok:
            mism = (~((gv.isna() & ev.isna()) | (gv.astype(object) == ev.astype(object)))).to_numpy().nonzero()[0][:3]
            bad = (c, [(int(i), gv.iloc[i], ev.iloc[i]) for i in mism]); break
    if bad:
        print(f"FAIL {name}: col {bad[0]} mismatches {bad[1]}  dtypes g={g[bad[0]].dtype} e={e[bad[0]].dtype}"); fails += 1
    else:
        print(f"OK   {name}: {len(g)} rows")
print(f"\n{len(names)-fails}/{len(names)} pass")
sys.exit(1 if fails else 0)
