#!/usr/bin/env python3
"""Post-gate adjudication pass for the sf1 scale-gate artifact.

check_oracle_each.py records raw compare outcomes; two classes of row
are EXPECTED not to hash-match at sf1 and carry a documented
adjudication instead (NOTES_r9 §7, NOTES_r10 §4/§10):

  q71/q90   Misra-Gries top-k rows: the sf1 scale-up multiplies the
            vocabulary ~10x past the capacity-64 sketch's exact regime,
            so the exact-top-10 oracle premise is void BY DESIGN. The
            contract that does hold at any scale (undercount within
            (N-S)/(k+1), Misra & Gries 1982) is machine-checked here via
            check_mg_contract.py and its verdict embedded in the row.
  q113      tf-idf neighbors: the fixture vocabulary makes the posting
            join ~all-pairs on BOTH engines (Σ df² ≈ 0.45·N²), a
            documented operator precondition (SparseSimilarity scaladoc,
            NOTES_r10 §4); the row is a deliberate engine-side skip.

Rows q71/q90 become status "adjudicated_regime" (only from fail — a
pass would mean the premise held after all and is left alone); q113's
no_spark_output row gains the precondition note. Everything else is
untouched. Usage:

    python3 tools/adjudicate_sf1.py <artifact.json> <sfDir> <verifyOutDir>
"""
import json, os, subprocess, sys

art_path, sfdir, outdir = sys.argv[1], sys.argv[2], sys.argv[3]
tool = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "check_mg_contract.py")
art = json.load(open(art_path))
rows = art["queries"]

for q in sorted(rows):
    if not q.startswith(("q71", "q90")):
        continue
    row = rows[q]
    if row["status"] != "fail":
        continue
    r = subprocess.run([sys.executable, tool, sfdir, outdir, q],
                       capture_output=True, text=True)
    verdict = r.stdout.strip().replace("\n", "; ")
    if r.returncode == 0:
        row["status"] = "adjudicated_regime"
        row["note"] = ("exact-top-10 premise void past MG capacity at this "
                       "scale; Misra-Gries undercount contract verified: "
                       + verdict)[:800]
    else:
        row["note"] = ("MG CONTRACT VIOLATION (adjudication failed): "
                       + verdict)[:800]
    print(f"{q}: {row['status']}\n  {row['note']}")

for q in sorted(rows):
    if q.startswith("q113") and rows[q]["status"] == "no_spark_output":
        rows[q]["note"] = (
            "deliberate engine-side skip: degenerate fixture vocabulary "
            "makes the tf-idf posting join ~all-pairs on BOTH engines "
            "(Σ df² ≈ 0.45·N² measured; subquadratic iff Σ df² ≪ N² — "
            "the SparseSimilarity operator contract, which the operator "
            "itself measures and warns on)")
        print(f"{q}: skip marker annotated")

art["adjudicated_regime"] = sum(
    1 for r in rows.values() if r["status"] == "adjudicated_regime")
art["pass"] = sum(1 for r in rows.values() if r["status"] == "pass")
art["fail"] = sum(1 for r in rows.values() if r["status"] == "fail")
tmp = art_path + ".tmp"
with open(tmp, "w") as f:
    json.dump(art, f, indent=1, sort_keys=True)
os.replace(tmp, art_path)
print(f"rewrote {art_path}: pass={art['pass']} fail={art['fail']} "
      f"adjudicated_regime={art['adjudicated_regime']}")
