#!/usr/bin/env python3
"""Per-query wrapper around check_oracle.py: runs each oracle entry in its
own subprocess under a wall-clock timeout, so one DuckDB-side quadratic
oracle (a 600k-doc all-pairs SQL at sf1) cannot stall the whole gate.
Results stream to stdout as they complete. Usage:
    python3 tools/check_oracle_each.py <sfDir> <verifyOutDir> [timeoutSec]
A TIMEOUT row means the ORACLE side exceeded the budget — the Spark result
exists; the row is adjudicated separately (see NOTES_r9 section 7).
"""
import json, os, subprocess, sys, tempfile, time

sfdir, outdir = sys.argv[1], sys.argv[2]
budget = int(sys.argv[3]) if len(sys.argv) > 3 else 300
tool = os.path.join(os.path.dirname(os.path.abspath(__file__)), "check_oracle.py")
oracle = json.load(open(f"{outdir}/oracle_sql.json"))
passed, failed, timed_out = [], [], []
for name in sorted(oracle):
    if not os.path.isdir(f"{outdir}/{name}"):
        print(f"SKIP {name}: no spark output dir", flush=True)
        continue
    with tempfile.TemporaryDirectory() as td:
        json.dump({name: oracle[name]}, open(f"{td}/oracle_sql.json", "w"))
        os.symlink(f"{outdir}/{name}", f"{td}/{name}")
        t0 = time.time()
        try:
            r = subprocess.run(
                [sys.executable, tool, sfdir, td],
                capture_output=True, text=True, timeout=budget)
            out = r.stdout.strip().splitlines()
            verdict = [l for l in out if l.startswith(("ok", "FAIL", "  note"))]
            ok = any(l.startswith("ok") for l in out) and \
                not any(l.startswith("FAIL") for l in out)
            (passed if ok else failed).append(name)
            tag = "ok  " if ok else "FAIL"
            print(f"{tag} {name} ({time.time()-t0:.1f}s) "
                  f"{'; '.join(verdict)}", flush=True)
        except subprocess.TimeoutExpired:
            timed_out.append(name)
            print(f"TIMEOUT {name} (oracle side exceeded {budget}s)", flush=True)
print(f"\npass={len(passed)} fail={len(failed)} timeout={len(timed_out)}")
print(f"fails: {failed}")
print(f"timeouts: {timed_out}")
