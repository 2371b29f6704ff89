#!/usr/bin/env python3
"""Local replica of the driver's t2 compare: run each oracle_sql.json entry in
DuckDB over the sf tables, load the corresponding Spark parquet dump, sort
columns by name + rows by all columns, and diff. Usage:
    python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json, os, sys, glob
import duckdb, pandas as pd, numpy as np

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
# iterative-oracle spill control (q94/q117-class rows): DuckDB defaults to
# one thread per core, and 32-way out-of-core recursion spills past this
# box's ~94 GB effective disk. The driver-side defaults stay untouched.
if os.environ.get("GRAFT_ORACLE_THREADS"):
    con.execute(f"SET threads={int(os.environ['GRAFT_ORACLE_THREADS'])}")
if os.environ.get("GRAFT_ORACLE_MEMLIMIT"):
    con.execute(f"SET memory_limit='{os.environ['GRAFT_ORACLE_MEMLIMIT']}'")
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = p.split("/")[-1].removesuffix(".parquet")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    try:
        want = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: duckdb error {e}")
        fails.append(name); continue
    try:
        got = pd.concat([pd.read_parquet(f) for f in
                         glob.glob(f"{outdir}/{name}/*.parquet")])
    except Exception as e:
        print(f"FAIL {name}: spark output missing {e}")
        fails.append(name); continue
    wc, gc = sorted(want.columns), sorted(got.columns)
    if wc != gc:
        print(f"FAIL {name}: columns {gc} != {wc}")
        fails.append(name); continue
    want, got = want[wc], got[wc]
    if len(want) != len(got):
        print(f"FAIL {name}: rows {len(got)} != {len(want)}")
        fails.append(name); continue
    want = want.sort_values(wc).reset_index(drop=True)
    got = got.sort_values(wc).reset_index(drop=True)
    ok = True
    for c in wc:
        w, g = want[c], got[c]
        if np.issubdtype(w.dtype, np.floating) or np.issubdtype(g.dtype, np.floating):
            close = np.allclose(w.astype(float), g.astype(float),
                                rtol=1e-9, atol=1e-12, equal_nan=True)
            exact = (w.astype(float).values == g.astype(float).values).all()
            if not close:
                bad = (~np.isclose(w.astype(float), g.astype(float),
                                   rtol=1e-9, atol=1e-12)).to_numpy().nonzero()[0][:3]
                print(f"FAIL {name}.{c}: e.g. rows {bad.tolist()} "
                      f"want {w.iloc[bad].tolist()} got {g.iloc[bad].tolist()}")
                ok = False
            elif not exact:
                print(f"  note {name}.{c}: close but not bit-exact")
        else:
            if not (w.astype(str).values == g.astype(str).values).all():
                bad = (w.astype(str).values != g.astype(str).values).nonzero()[0][:3]
                print(f"FAIL {name}.{c}: e.g. rows {bad.tolist()} "
                      f"want {w.iloc[bad].tolist()} got {g.iloc[bad].tolist()}")
                ok = False
    if not ok:
        fails.append(name)
    else:
        print(f"ok   {name} ({len(got)} rows)")
print(f"\n{len(oracle) - len(fails)}/{len(oracle)} pass; fails: {fails}")
