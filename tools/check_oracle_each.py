#!/usr/bin/env python3
"""Per-query wrapper around check_oracle.py: runs each oracle entry in its
own subprocess under a wall-clock timeout, so one DuckDB-side quadratic
oracle cannot stall the whole gate. Results stream to stdout as they
complete, and (since round 10) the whole tally is emitted as a JSON
artifact so scale-gate claims are machine-checkable from the repo alone
(VERDICT r9 task 3). Usage:
    python3 tools/check_oracle_each.py <sfDir> <verifyOutDir> [timeoutSec] [jsonOut]
Row statuses in the JSON artifact:
  pass          rows+schema+values matched (the note-only "close but not
                bit-exact" case still counts as pass, mirroring the driver)
  fail          compared and mismatched (or oracle SQL errored)
  oracle_timeout  the ORACLE side exceeded the budget — the Spark result
                exists; the row is adjudicated separately (NOTES_r9 §7)
  no_spark_output  Verify skipped or failed the query (SPARK_GRAFT_VERIFY_SKIP
                rows land here; the skip reason lives in the gate notes)
If jsonOut already exists, rows recorded there as `pass` are carried
over and skipped (resume after an interrupted/partial run — fail,
timeout and no_spark_output rows re-run, e.g. after an oracle_sql.json
refresh swaps an infeasible formulation). A carried-over pass must also
match on `oracle_sha` — the sha256 of the row's oracle SQL recorded at
validation time — so a row whose FORMULATION changed since it passed is
re-validated instead of resuming a stale verdict against SQL that never
ran (ADVICE r10).
"""
import hashlib, json, os, subprocess, sys, tempfile, time

def sql_sha(entry):
    return hashlib.sha256(
        json.dumps(entry, sort_keys=True).encode()).hexdigest()[:16]

def _sh(*cmd):
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=30)
        return r.stdout.strip() if r.returncode == 0 else "unknown"
    except Exception:
        return "unknown"

def provenance(outdir):
    """VERDICT r13 task 1: the artifact must record the tree it gates,
    IN the artifact — a gate claim without a tree_head stamp is
    unverifiable (the r13 failure mode). Records the gate-time head, a
    combined sha of src/main/scala (guards dirty-tree runs), and the
    engine side's own verify_meta.json (written by graft.Verify) so the
    Spark session confs the dump ran under are carried verbatim."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = _sh("git", "-C", repo, "ls-files", "src/main/scala")
    src_sha = "unknown"
    if files != "unknown":
        h = hashlib.sha256()
        for f in sorted(files.splitlines()):
            p = os.path.join(repo, f)
            if os.path.exists(p):
                h.update(f.encode() + b"\0" + open(p, "rb").read() + b"\0")
        src_sha = h.hexdigest()[:16]
    meta = {"tree_head": _sh("git", "-C", repo, "rev-parse", "HEAD"),
            "tree_dirty": _sh("git", "-C", repo, "status", "--porcelain") != "",
            "gate_date_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "src_main_sha": src_sha}
    vm = os.path.join(outdir, "verify_meta.json")
    if os.path.exists(vm):
        try:
            meta["verify_meta"] = json.load(open(vm))
        except Exception as e:
            meta["verify_meta"] = f"unreadable: {e}"
    return meta

sfdir, outdir = sys.argv[1], sys.argv[2]
budget = int(sys.argv[3]) if len(sys.argv) > 3 else 300
json_out = sys.argv[4] if len(sys.argv) > 4 else None
tool = os.path.join(os.path.dirname(os.path.abspath(__file__)), "check_oracle.py")
oracle = json.load(open(f"{outdir}/oracle_sql.json"))
passed, failed, timed_out = [], [], []
rows = {}
if json_out and os.path.exists(json_out):
    prior = json.load(open(json_out)).get("queries", {})
    for name, row in prior.items():
        if row.get("status") != "pass" or name not in oracle:
            continue
        if row.get("oracle_sha") != sql_sha(oracle[name]):
            print(f"RERUN {name}: prior pass invalidated — oracle SQL "
                  f"changed since it was validated", flush=True)
            continue
        rows[name] = row
        passed.append(name)
        print(f"ok   {name} (resumed: prior pass, {row['secs']}s)",
              flush=True)
PROVENANCE = None  # computed once, at gate start

def flush():
    if json_out:
        art = {"sf_dir": sfdir, "verify_dir": outdir, "budget_sec": budget,
               **(PROVENANCE or {}),
               "pass": sum(1 for r in rows.values() if r["status"] == "pass"),
               "fail": sum(1 for r in rows.values() if r["status"] == "fail"),
               "oracle_timeout": sum(1 for r in rows.values()
                                     if r["status"] == "oracle_timeout"),
               "no_spark_output": sum(1 for r in rows.values()
                                      if r["status"] == "no_spark_output"),
               "queries": rows}
        tmp = json_out + ".tmp"
        with open(tmp, "w") as f:
            json.dump(art, f, indent=1, sort_keys=True)
        os.replace(tmp, json_out)

PROVENANCE = provenance(outdir)
for name in sorted(oracle):
    if name in rows:
        continue
    if not os.path.isdir(f"{outdir}/{name}"):
        print(f"SKIP {name}: no spark output dir", flush=True)
        rows[name] = {"status": "no_spark_output", "secs": 0.0, "note": ""}
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
            secs = time.time() - t0
            print(f"{tag} {name} ({secs:.1f}s) "
                  f"{'; '.join(verdict)}", flush=True)
            rows[name] = {"status": "pass" if ok else "fail",
                          "secs": round(secs, 1),
                          "oracle_sha": sql_sha(oracle[name]),
                          "note": "; ".join(verdict)[:400]}
        except subprocess.TimeoutExpired:
            timed_out.append(name)
            print(f"TIMEOUT {name} (oracle side exceeded {budget}s)", flush=True)
            rows[name] = {"status": "oracle_timeout", "secs": float(budget),
                          "note": f"oracle side exceeded {budget}s"}
    flush()
print(f"\npass={len(passed)} fail={len(failed)} timeout={len(timed_out)}")
print(f"fails: {failed}")
print(f"timeouts: {timed_out}")
flush()
if json_out:
    print(f"wrote {json_out}")
