#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify,
then for each query compare its parquet output against the DuckDB oracle
(row count, schema, canonicalized value hash). Usage:
    python3 tools/selfcheck.py [sfDir] [outDir] [--skip-verify] [names...]
"""
import json, math, subprocess, sys
from pathlib import Path

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
FLAGS = set(a for a in sys.argv[3:] if a.startswith("--"))
ONLY = [a for a in sys.argv[3:] if not a.startswith("--")]

if "--skip-verify" not in FLAGS:
    # restricted names forward to Verify: only those queries re-dump
    # (the compare below is restricted to the same set)
    extra = (" " + " ".join(ONLY)) if ONLY else ""
    r = subprocess.run(
        ["sbt", f'runMain graft.Verify {SF_DIR} {OUT_DIR}{extra}'],
        cwd="/root/repo", capture_output=True, text=True)
    sys.stdout.write(r.stdout[-3000:])
    if r.returncode != 0:
        sys.stderr.write(r.stderr[-3000:])
        sys.exit(1)

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{SF_DIR}/{t}.parquet"
    if Path(p).exists():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracles = json.loads(Path(f"{OUT_DIR}/oracle_sql.json").read_text())

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # Keep floatness visible: the driver distinguishes int64 3 from
        # float64 3.0 (e.g. DuckDB sum(INTEGER) -> HUGEINT -> pandas float).
        s = f"{v:.10g}"
        return s if ("." in s or "e" in s or "inf" in s) else s + ".0"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)

def table_sig(df):
    cols = sorted(df.columns)
    rows = sorted(tuple(canon(v) for v in row) for row in
                  df[cols].itertuples(index=False, name=None))
    return cols, rows

fails = []
all_outputs = sorted(p.name for p in Path(OUT_DIR).iterdir() if p.is_dir())
qlist_path = Path(f"{OUT_DIR}/queries.json")
declared = json.loads(qlist_path.read_text()) if qlist_path.exists() else []
names = ONLY or sorted(set(oracles) | set(all_outputs) | set(declared))
for name in names:
    sql = oracles.get(name)
    got_path = f"{OUT_DIR}/{name}"
    if not Path(got_path).exists():
        fails.append(name); print(f"FAIL {name}: no output written"); continue
    try:
        got = con.sql(f"SELECT * FROM read_parquet('{got_path}/*.parquet')").df()
    except Exception as e:
        fails.append(name); print(f"FAIL {name}: cannot read output: {e}"); continue
    if sql is None:
        status = "ok(rows-only)" if len(got) > 0 else "FAIL(rows=0)"
        if len(got) == 0: fails.append(name)
        print(f"{status:18s} {name}: rows={len(got)}")
        continue
    try:
        exp = con.sql(sql).df()
    except Exception as e:
        fails.append(name); print(f"FAIL {name}: oracle SQL error: {e}"); continue
    gc, gr = table_sig(got)
    ec, er = table_sig(exp)
    if gc != ec:
        fails.append(name)
        print(f"FAIL {name}: columns {gc} != {ec}")
    elif len(gr) != len(er):
        fails.append(name)
        print(f"FAIL {name}: rows {len(gr)} != {len(er)}")
    elif gr != er:
        fails.append(name)
        bad = next(i for i, (a, b) in enumerate(zip(gr, er)) if a != b)
        print(f"FAIL {name}: values differ, first at sorted-row {bad}:")
        print(f"   got: {gr[bad]}")
        print(f"   exp: {er[bad]}")
    else:
        print(f"{'ok':18s} {name}: rows={len(gr)}")

print(f"\n{len(fails)} failures" + (f": {fails}" if fails else ""))
sys.exit(1 if fails else 0)
