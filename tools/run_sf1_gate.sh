#!/bin/bash
# Full sf1 scale-gate chain (VERDICT r13 task 1), reproducible from the
# repo alone. Produces /tmp/CORRECTNESS_sf1_r14.json with tree_head /
# gate_date_utc / src_main_sha / verify_meta stamped INSIDE the artifact
# (the r13 failure mode was a gate claim with no stamp). Stages:
#   1. ScaleUp sf0.1 -> target/sf1 (deterministic; skipped if present)
#   2. graft.Verify engine dump, SKIP = 16 engine-seeded ANN/sketch rows
#      (recall/contract-gated instead — adjudicate_sf1.EXCLUDED_GATES)
#      + q113 (documented quadratic-contract skip)
#   3. oracle_sql.json refresh WITH q113 (so the gate records its
#      engine-side skip as an explicit row, not silence)
#   4. tools/check_oracle_each.py — per-query DuckDB compare, 1800 s/row
#   5. oracle_sql.json refresh with the FULL registry (the adjudicator
#      derives the `excluded` block from registry-minus-gated)
#   6. tools/adjudicate_sf1.py — MG-contract adjudication (q71/q90),
#      q113 skip marker, excluded block, tally
# Protocol (NOTES_r10 §10): the DuckDB pass runs sequentially and the
# box should be otherwise quiet during the heavy rows (q108/q115/q34).
set -uo pipefail
cd /root/repo

OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
CP="target/scala-2.13/classes:/opt/spark/jars/*"
JVMFLAGS="-Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC"

SKIP_ANN="q104_sql_minhash,q13b_embed_dedup_lsh,q20_minhash_pairs,q21_simhash_pairs,q23_semantic_topk,q25_hybrid,q44_pq_topk,q47_semdedup,q48_approx_distinct,q51_ivfpq_topk,q54_batch_ivfpq,q55_threshold_lsh,q59_sq_topk,q77_sketch_rollup,q87_ivfsq_topk,q88_batch_ivfsq"
OUT=${SF1_GATE_OUT:-/tmp/verify_sf1_r14}
ART=${SF1_GATE_ART:-/tmp/CORRECTNESS_sf1_r14.json}
SF1=target/sf1

echo "=== [gate] stage 1: ScaleUp ($(date -u +%H:%M:%S)) ==="
if [ ! -f "$SF1/documents.parquet" ]; then
  SPARK_GRAFT_CPUS=32 java -Xmx48g $OPENS $JVMFLAGS -cp "$CP" \
    graft.ScaleUp /root/testdata/sf0.1 "$SF1" || exit 1
else
  echo "[gate] $SF1 present, skipping regeneration"
fi

echo "=== [gate] stage 2: Verify engine dump ($(date -u +%H:%M:%S)) ==="
mkdir -p "$OUT"
SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SHUFFLE_PARTITIONS=256 \
SPARK_GRAFT_VERIFY_SKIP="$SKIP_ANN,q113" \
  java -Xmx${SPARK_DRIVER_MEM:-64g} $OPENS $JVMFLAGS -cp "$CP" \
  graft.Verify "$SF1" "$OUT" || exit 1
# preserve the DUMP run's provenance: the SQL-only refreshes below also
# write verify_meta.json, but the session confs that matter are the ones
# the engine results were produced under
cp "$OUT/verify_meta.json" "$OUT/verify_meta_dump.json"

echo "=== [gate] stage 3: oracle_sql refresh (+q113) ($(date -u +%H:%M:%S)) ==="
SPARK_GRAFT_VERIFY_SQL_ONLY=1 SPARK_GRAFT_CPUS=4 \
SPARK_GRAFT_VERIFY_SKIP="$SKIP_ANN" \
  java -Xmx8g $OPENS $JVMFLAGS -cp "$CP" graft.Verify "$SF1" "$OUT" || exit 1
cp "$OUT/verify_meta_dump.json" "$OUT/verify_meta.json"

echo "=== [gate] stage 4: DuckDB oracle gate ($(date -u +%H:%M:%S)) ==="
GRAFT_ORACLE_THREADS=${GRAFT_ORACLE_THREADS:-8} \
GRAFT_ORACLE_MEMLIMIT=${GRAFT_ORACLE_MEMLIMIT:-48GB} \
  python3 tools/check_oracle_each.py "$SF1" "$OUT" 1800 "$ART"

echo "=== [gate] stage 5: full-registry oracle_sql ($(date -u +%H:%M:%S)) ==="
SPARK_GRAFT_VERIFY_SQL_ONLY=1 SPARK_GRAFT_CPUS=4 \
  java -Xmx8g $OPENS $JVMFLAGS -cp "$CP" graft.Verify "$SF1" "$OUT" || exit 1
cp "$OUT/verify_meta_dump.json" "$OUT/verify_meta.json"

echo "=== [gate] stage 6: adjudication ($(date -u +%H:%M:%S)) ==="
python3 tools/adjudicate_sf1.py "$ART" "$SF1" "$OUT"
echo "=== [gate] done ($(date -u +%H:%M:%S)): $ART ==="
python3 - "$ART" <<'EOF'
import json, sys
a = json.load(open(sys.argv[1]))
print({k: a.get(k) for k in ("pass", "fail", "oracle_timeout",
      "no_spark_output", "skipped_by_contract", "adjudicated_regime",
      "excluded_n", "tree_head", "src_main_sha")})
EOF
