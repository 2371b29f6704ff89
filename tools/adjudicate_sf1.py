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
row becomes an explicit "skipped_by_contract" (the raw gate records it
as no_spark_output, a status that otherwise means "Verify failed").

The artifact is also made SELF-CONTAINED (VERDICT r10 task 5): queries
present in oracle_sql.json but absent from the gate run are recorded in
an `excluded` block, each naming the gate that covers it instead — the
approximate/ANN families whose candidate sets are engine-seeded are
recall-gated by RECALL_sf1, the sketch estimate rows by their error
contracts — so a reader can reconcile the registry count against the
gate count from the artifact alone. Everything else is untouched. Usage:

    python3 tools/adjudicate_sf1.py <artifact.json> <sfDir> <verifyOutDir>
"""
import json, os, subprocess, sys

# Why each deliberately-ungated query is absent from the sf1 hash gate,
# and which gate covers it instead. A DuckDB hash oracle needs a
# deterministic row set both engines can derive; these rows' outputs
# depend on engine-seeded randomness (LSH planes, minhash seeds, KMeans
# centroids) or are estimates by construction — their sf1 gate is the
# measured quality contract, not a hash.
EXCLUDED_GATES = {
    "q13b_embed_dedup_lsh": "engine-seeded LSH planes -> recall-gated: RECALL_sf1 (dedup/lsh family protocol, floor 0.9)",
    "q20_minhash_pairs":    "engine-seeded minhash permutations -> recall-gated: RECALL_sf1 protocol; exact-Jaccard twin q15 IS hash-gated at sf1 (9.65M pairs)",
    "q21_simhash_pairs":    "engine-seeded simhash planes -> recall-gated: RECALL_sf1 protocol; exact-Jaccard twin q15 IS hash-gated at sf1",
    "q23_semantic_topk":    "engine-seeded KMeans cells -> recall-gated: RECALL_sf1 ivf family >= 0.98 at the derived operating point",
    "q25_hybrid":           "RRF fuses an engine-seeded vector ranking; BM25 half IS hash-gated (q25b) — determinism note in NOTES_r9",
    "q44_pq_topk":          "engine-seeded PQ codebooks -> recall-gated: RECALL_sf1 pq family >= 0.98 at the derived operating point",
    "q47_semdedup":         "engine-seeded KMeans clusters -> recall-gated: RECALL_sf1 protocol (SemDeDup candidate stage)",
    "q48_approx_distinct":  "HLL estimate by construction -> contract-gated: relative-error bound spec (SketchExpressions); exact twin q06 IS hash-gated",
    "q51_ivfpq_topk":       "engine-seeded cells+codebooks -> recall-gated: RECALL_sf1 ivfadc family >= 0.98 at the derived operating point",
    "q54_batch_ivfpq":      "engine-seeded cells+codebooks -> recall-gated: RECALL_sf1 ivfadc family (batch shape)",
    "q55_threshold_lsh":    "engine-seeded LSH buckets -> recall-gated: RECALL_sf1 protocol (threshold variant)",
    "q59_sq_topk":          "SQ grid is data-derived but candidate stage is an estimate -> recall-gated: RECALL_sf1 sq family >= 0.98",
    "q77_sketch_rollup":    "HLL/CMS estimates by construction -> contract-gated: error-bound specs (SketchExpressions)",
    "q87_ivfsq_topk":       "engine-seeded cells -> recall-gated: RECALL_sf1 ivfsq family >= 0.98 at the derived operating point",
    "q88_batch_ivfsq":      "engine-seeded cells -> recall-gated: RECALL_sf1 ivfsq family (batch shape)",
    "q104_sql_minhash":     "engine-seeded minhash permutations (SQL authoring twin of q20) -> recall-gated: RECALL_sf1 protocol",
}

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
    if q.startswith("q113") and rows[q]["status"] in (
            "no_spark_output", "skipped_by_contract"):
        rows[q]["status"] = "skipped_by_contract"
        rows[q]["note"] = (
            "deliberate engine-side skip: degenerate fixture vocabulary "
            "makes the tf-idf posting join ~all-pairs on BOTH engines "
            "(Σ df² ≈ 0.45·N² measured; subquadratic iff Σ df² ≪ N² — "
            "the SparseSimilarity operator contract, which the operator "
            "itself measures and warns on)")
        print(f"{q}: skipped_by_contract")

# self-containment: name every registry query absent from this gate run
# and the gate that covers it instead
oracle_path = os.path.join(outdir, "oracle_sql.json")
if os.path.exists(oracle_path):
    oracle = json.load(open(oracle_path))
    absent = sorted(set(oracle) - set(rows))
    unexplained = [q for q in absent if q not in EXCLUDED_GATES]
    if unexplained:
        print(f"WARNING: absent from gate with NO documented exclusion: "
              f"{unexplained}")
    art["excluded"] = {
        q: {"gate": EXCLUDED_GATES.get(
            q, "UNDOCUMENTED — investigate before shipping")}
        for q in absent}
    art["excluded_n"] = len(absent)
    print(f"excluded block: {len(absent)} queries "
          f"({len(unexplained)} undocumented)")

art["adjudicated_regime"] = sum(
    1 for r in rows.values() if r["status"] == "adjudicated_regime")
art["pass"] = sum(1 for r in rows.values() if r["status"] == "pass")
art["fail"] = sum(1 for r in rows.values() if r["status"] == "fail")
art["skipped_by_contract"] = sum(
    1 for r in rows.values() if r["status"] == "skipped_by_contract")
art["no_spark_output"] = sum(
    1 for r in rows.values() if r["status"] == "no_spark_output")
tmp = art_path + ".tmp"
with open(tmp, "w") as f:
    json.dump(art, f, indent=1, sort_keys=True)
os.replace(tmp, art_path)
print(f"rewrote {art_path}: pass={art['pass']} fail={art['fail']} "
      f"adjudicated_regime={art['adjudicated_regime']}")
