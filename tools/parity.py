#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: compare Verify.scala's
parquet dumps against DuckDB running oracle_sql.json on the same tables.

Hardened (round 9) to the driver's typed-hash semantics after the round-8
verdict proved the old pandas-only compare was blind to exactly the two
divergence classes the driver catches:
  1. TYPE equality at the arrow level — DuckDB types SUM(BIGINT) as
     DECIMAL128(38,0) while Spark emits int64; the driver's typed value
     hash fails there even when every value is numerically equal. The old
     fetchdf() path coerced both to float64/int64 and passed.
  2. Float columns compared BITWISE (uint64 views of the IEEE doubles) —
     catches -0.0 vs +0.0, which `==` cannot see.
Null count is compared per column, and null positions participate in the
row-wise pandas check as before (NaN vs null stays distinct at the arrow
layer via null-count equality plus bitwise value compare over non-nulls).

Usage: parity.py [--json OUT.json] SF_DIR OUT_DIR [name1,name2,...]

--json OUT.json additionally writes a driver-format record
  {name: {"rows_match": bool, "schema_match": bool, "hash_match": bool,
          "err": str|None}}
so the round's correctness record survives even when the driver's own
CORRECTNESS_r{N}.json comes back empty (observed r10 and r11). Commit the
output as CORRECTNESS_LOCAL_r{N}.json (VERDICT r11 "Next round" #1).
"""
import sys, json, glob, os
import duckdb, pandas as pd, numpy as np
import pyarrow as pa

argv = sys.argv[1:]
json_out = None
itercc = False
while argv and argv[0].startswith("--"):
    if argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    elif argv[0] == "--itercc":
        # r15 verdict item 3: the four doc-cluster oracles
        # (dedup_clusters / dedup_canonical / dedup_cluster_sizes /
        # text_split_nodup) carry a recursive transitive-closure CTE
        # whose DuckDB plan exceeds the 40-minute single-query budget at
        # the 10x decade. With this flag the reach CTE is evaluated as
        # an ITERATIVE min-label-propagation loop with pointer jumping
        # over temp tables (the same fixpoint: labels only decrease,
        # stay ids of reachable nodes, and converge to the component
        # min — identical to min(reachable id)); the surrounding oracle
        # SQL runs verbatim against the materialized labels. Off by
        # default so the small-SF gate keeps the one-statement oracle.
        itercc = True
        argv = argv[1:]
    else:
        raise SystemExit(f"unknown flag {argv[0]}")
sf_dir, out_dir = argv[0], argv[1]
only = set(argv[2].split(",")) if len(argv) > 2 else None
record = {}

REACH_MARKER = "reach(doc_id, lbl) AS ("


def run_oracle(sql):
    """Execute an oracle; under --itercc, recursive reach CTEs are
    materialized iteratively first (see the flag comment above)."""
    if not itercc or REACH_MARKER not in sql:
        return con.execute(sql).fetch_arrow_table()
    at = sql.index(REACH_MARKER)
    # prefix = the WITH chain up to (not incl.) ",reach(...)": keeps the
    # verbatim simhash/pair/edge CTEs incl. `e AS (...)`.
    prefix = sql[:at].rstrip().rstrip(",")
    # skip the balanced-paren reach body; suffix = what follows it
    # (either ",lab AS (...)" + final select, or the final select).
    i = at + len(REACH_MARKER)
    depth = 1
    while depth:
        if sql[i] == "(":
            depth += 1
        elif sql[i] == ")":
            depth -= 1
        i += 1
    suffix = sql[i:].lstrip().lstrip(",").lstrip()
    body = prefix.replace("WITH RECURSIVE", "WITH", 1)
    con.execute("DROP TABLE IF EXISTS graft_cc_e")
    con.execute("DROP TABLE IF EXISTS graft_cc_lab")
    con.execute(f"CREATE TEMP TABLE graft_cc_e AS {body} SELECT x, y FROM e")
    con.execute("CREATE TEMP TABLE graft_cc_lab AS "
                "SELECT DISTINCT x AS doc_id, x AS lbl FROM graft_cc_e")
    rounds = 0
    while True:
        rounds += 1
        con.execute("""CREATE TEMP TABLE graft_cc_lab2 AS
            SELECT doc_id, min(lbl) AS lbl FROM (
              SELECT doc_id, lbl FROM graft_cc_lab
              UNION ALL
              SELECT e.y AS doc_id, l.lbl
              FROM graft_cc_e e JOIN graft_cc_lab l ON e.x = l.doc_id
              UNION ALL
              SELECT a.doc_id, b.lbl
              FROM graft_cc_lab a JOIN graft_cc_lab b ON a.lbl = b.doc_id
            ) GROUP BY doc_id""")
        changed = con.execute(
            "SELECT count(*) FROM graft_cc_lab2 n JOIN graft_cc_lab o "
            "USING (doc_id) WHERE n.lbl != o.lbl").fetchone()[0]
        con.execute("DROP TABLE graft_cc_lab")
        con.execute("ALTER TABLE graft_cc_lab2 RENAME TO graft_cc_lab")
        if changed == 0:
            break
        if rounds > 64:
            raise RuntimeError("itercc failed to converge in 64 rounds")
    rewritten = ("WITH reach AS (SELECT doc_id, lbl FROM graft_cc_lab)"
                 + (",\n" if not suffix.upper().startswith("SELECT") else "\n")
                 + suffix)
    return con.execute(rewritten).fetch_arrow_table()


def rec(name, rows=False, schema=False, hsh=False, err=None):
    record[name] = {"rows_match": rows, "schema_match": schema,
                    "hash_match": hsh, "err": err}
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
names = sorted([os.path.basename(p) for p in glob.glob(f"{out_dir}/*") if os.path.isdir(p)])
if only:
    names = [n for n in names if n in only]
fails = 0


def bits_sorted(arr: pa.ChunkedArray, typ: pa.DataType) -> np.ndarray:
    """Sorted multiset of the column's non-null values, floats as raw bits."""
    a = arr.combine_chunks().drop_null()
    if pa.types.is_floating(typ):
        v = a.to_numpy(zero_copy_only=False)
        u = v.view(np.uint64) if v.dtype == np.float64 else v.view(np.uint32)
        return np.sort(u)
    try:
        v = a.to_numpy(zero_copy_only=False)
        return np.sort(v)
    except Exception:
        # lists/structs: fall back to string form
        return np.sort(np.array([str(x) for x in a.to_pylist()]))


for name in names:
    try:
        got_t = con.execute(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetch_arrow_table()
    except Exception as e:
        print(f"FAIL {name}: cannot read spark output: {e}"); fails += 1
        rec(name, err=f"cannot read spark output: {e}"); continue
    if name not in oracle:
        print(f"SKIP {name}: no oracle (rows={got_t.num_rows})")
        rec(name, rows=got_t.num_rows > 0, err="SKIP: declared no-oracle (rows-only check)"); continue
    try:
        exp_t = run_oracle(oracle[name])
    except Exception as e:
        msg = f"oracle SQL error: {str(e).splitlines()[0][:160]}"
        print(f"FAIL {name}: {msg}"); fails += 1; rec(name, err=msg); continue

    cols = sorted(got_t.column_names)
    if cols != sorted(exp_t.column_names):
        print(f"FAIL {name}: columns {cols} != {sorted(exp_t.column_names)}"); fails += 1
        rec(name, rows=got_t.num_rows == exp_t.num_rows,
            err=f"columns {cols} != {sorted(exp_t.column_names)}"); continue

    # --- 1. typed schema compare (driver's hash is typed) ---
    bad = None
    for c in cols:
        gt, et = got_t.schema.field(c).type, exp_t.schema.field(c).type
        if str(gt) != str(et):
            bad = f"col {c} TYPE spark={gt} oracle={et}"
            break
    if bad:
        print(f"FAIL {name}: {bad}"); fails += 1
        rec(name, rows=got_t.num_rows == exp_t.num_rows, err=bad); continue

    if got_t.num_rows != exp_t.num_rows:
        print(f"FAIL {name}: rows {got_t.num_rows} != {exp_t.num_rows}"); fails += 1
        rec(name, schema=True, err=f"rows {got_t.num_rows} != {exp_t.num_rows}"); continue

    # --- 2. per-column null-count + bitwise multiset compare ---
    for c in cols:
        ga, ea = got_t.column(c), exp_t.column(c)
        if ga.null_count != ea.null_count:
            bad = f"col {c} null-count spark={ga.null_count} oracle={ea.null_count}"
            break
        typ = got_t.schema.field(c).type
        gb, eb = bits_sorted(ga, typ), bits_sorted(ea, typ)
        if len(gb) != len(eb) or not np.array_equal(gb, eb):
            i = int(np.nonzero(gb != eb)[0][0]) if len(gb) == len(eb) else -1
            detail = f"first bit-diff at sorted idx {i}: {gb[i]!r} vs {eb[i]!r}" if i >= 0 else "length"
            bad = f"col {c} BITWISE mismatch ({detail})"
            break
    if bad:
        print(f"FAIL {name}: {bad}"); fails += 1
        rec(name, rows=True, schema=True, err=bad); continue

    # --- 3. legacy row-wise compare (cross-column row integrity) ---
    got = got_t.to_pandas()
    exp = exp_t.to_pandas()
    g = got.reindex(cols, axis=1)
    e = exp.reindex(cols, axis=1)
    try:
        g = g.sort_values(by=cols, na_position='first').reset_index(drop=True)
        e = e.sort_values(by=cols, na_position='first').reset_index(drop=True)
    except Exception:
        g = g.astype(str).sort_values(by=cols).reset_index(drop=True)
        e = e.astype(str).sort_values(by=cols).reset_index(drop=True)
    for c in cols:
        gv, ev = g[c], e[c]
        if gv.dtype.kind == 'f' or ev.dtype.kind == 'f':
            ok = ((gv.isna() & ev.isna()) | (gv == ev)).all()
        else:
            try:
                ok = (gv.astype(object).where(~gv.isna(), None) == ev.astype(object).where(~ev.isna(), None)).all()
            except Exception:
                ok = (gv.astype(str) == ev.astype(str)).all()
        if not ok:
            mism = (~((gv.isna() & ev.isna()) | (gv.astype(object) == ev.astype(object)))).to_numpy().nonzero()[0][:3]
            bad = f"col {c} row-wise mismatches {[(int(i), gv.iloc[i], ev.iloc[i]) for i in mism]}"
            break
    if bad:
        print(f"FAIL {name}: {bad}"); fails += 1
        rec(name, rows=True, schema=True, err=bad)
    else:
        print(f"OK   {name}: {got_t.num_rows} rows")
        rec(name, rows=True, schema=True, hsh=True)
if json_out:
    with open(json_out, "w") as f:
        json.dump(record, f, indent=1, sort_keys=True)
    print(f"wrote {json_out} ({len(record)} entries)")
print(f"\n{len(names)-fails}/{len(names)} pass")
sys.exit(1 if fails else 0)
