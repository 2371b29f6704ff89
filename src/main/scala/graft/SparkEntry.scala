package graft
import graft.embed.DeterministicEmbedder
import graft.index.VectorIndex
import graft.queries.GraftQueries
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001: build a vector index over the
    * embeddings table (the reference's delta-sync index analog) and answer a
    * top-5 similarity search — the reference's core query path
    * (`Nomic MultiModal Retrieval.py:380-390`) end-to-end. */
  def entry(spark: SparkSession): DataFrame = {
    val src = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val idx = VectorIndex.build(src, name = "flagship", primaryKey = "vec_id",
      vectorCol = "embedding")
    val qv = new DeterministicEmbedder(idx.dim).forQuery("spark vector search")
    idx.search(qv, k = 5, columns = Seq("label"))
  }

  /** One entry per implemented operator from SURVEY.md §2 / §2.4. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    GraftQueries.all

  /** DuckDB-equivalent SQL per query (same column names and value types),
    * for the driver's t2 compare at sf0.01. */
  def oracleSql: Map[String, String] = oracleSqlFor("/root/testdata/sf0.01")

  /** Oracle SQL parameterized by the fixture dir. Most entries are
    * dir-independent SQL over the named tables; q19's blob-scan path is
    * interpolated so the check holds at any sf. Queries whose engine-side
    * math has no DuckDB mirror (q20 banded minhash, q21 simhash, q23/q25
    * deterministic embedder) are closed with golden oracles pinned at
    * sf0.01 (the q26 pattern — each derived from an independent
    * recomputation, see the per-entry comments) and are only emitted for
    * that dir; q26/q33 golden tables are fixture-derived and
    * sf-independent. */
  def oracleSqlFor(dir: String): Map[String, String] = {
    val base = Map(
    "q01_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
         sum(l_quantity) AS sum_qty,
         sum(l_extendedprice) AS sum_base_price,
         sum(l_extendedprice * (1.0 - l_discount)) AS sum_disc_price,
         avg(l_quantity) AS avg_qty,
         avg(l_extendedprice) AS avg_price,
         CAST(count(*) AS BIGINT) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus""",
    "q02_filter_pushdown" ->
      """SELECT sum(l_extendedprice * l_discount) AS revenue FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate < TIMESTAMP '1997-01-01'
           AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""",
    "q03_join_agg" ->
      """SELECT c_mktsegment,
         sum(l_extendedprice * (1.0 - l_discount)) AS revenue,
         CAST(count(*) AS BIGINT) AS n_items
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment""",
    "q04_topk_orders" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "q05_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders) WHERE rn <= 3""",
    "q06_distinct_agg" ->
      """SELECT l_returnflag,
         CAST(count(DISTINCT l_partkey) AS BIGINT) AS distinct_parts,
         CAST(count(DISTINCT l_suppkey) AS BIGINT) AS distinct_supps,
         CAST(count(*) AS BIGINT) AS n
         FROM lineitem GROUP BY l_returnflag""",
    "q07_set_ops" ->
      """SELECT 'both' AS tag, k FROM
           (SELECT c_nationkey AS k FROM customer
            INTERSECT SELECT s_nationkey AS k FROM supplier)
         UNION ALL
         SELECT 'cust_only' AS tag, k FROM
           (SELECT c_nationkey AS k FROM customer
            EXCEPT SELECT s_nationkey AS k FROM supplier)""",
    "q08_regex" ->
      """SELECT p_partkey,
         regexp_extract(p_name, '^(\w+)', 1) AS first_word,
         regexp_replace(p_name, '\s+', '_', 'g') AS slug
         FROM part""",
    "q09_json_events" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         avg(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS avg_k,
         max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k,
         sum(value) AS sum_value
         FROM events GROUP BY event_type""",
    "q10_hourly_events" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
         CAST(count(*) AS BIGINT) AS n, sum(value) AS sum_value
         FROM events GROUP BY 1""",
    "q11_vec_topk" ->
      """SELECT b.vec_id AS vec_id,
         list_dot_product(CAST(a.embedding AS DOUBLE[]),
                          CAST(b.embedding AS DOUBLE[])) AS score
         FROM embeddings a JOIN embeddings b ON a.vec_id = 0
         ORDER BY score DESC, b.vec_id LIMIT 10""",
    "q105_index_saveload" -> // the PERSISTED index must equal the live one,
      // which must equal plain SQL — q11's oracle verbatim
      """SELECT b.vec_id AS vec_id,
         list_dot_product(CAST(a.embedding AS DOUBLE[]),
                          CAST(b.embedding AS DOUBLE[])) AS score
         FROM embeddings a JOIN embeddings b ON a.vec_id = 0
         ORDER BY score DESC, b.vec_id LIMIT 10""",
    "q106_fuzzy_names" -> // naive quadratic predicate join; the engine's
      // deletion-neighborhood blocking must reproduce it exactly. The
      // len > 0 predicates mirror editDistancePairs' DOCUMENTED contract
      // (empty keys are dropped, not matched at distance len) so oracle
      // and engine agree by definition, not by fixture luck
      """SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
         FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
         WHERE len(a.c_name) > 0 AND len(b.c_name) > 0
           AND abs(len(a.c_name) - len(b.c_name)) <= 1
           AND levenshtein(a.c_name, b.c_name) <= 1""",
    "q112_sql_fuzzy" -> // the SQL-authored fuzzy pipeline must reproduce
      // q106's naive quadratic oracle exactly (same engine semantics,
      // different authoring surface)
      """SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
         FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
         WHERE len(a.c_name) > 0 AND len(b.c_name) > 0
           AND abs(len(a.c_name) - len(b.c_name)) <= 1
           AND levenshtein(a.c_name, b.c_name) <= 1""",
    "q133_label_prop" -> // the SAME deterministic synchronous semantics
      // unrolled: 4 rounds of (publish labels to neighbors, count per
      // (node, label), argmax by count desc then label asc). Integer-only
      // — node ids are the labels — so the compare is exact
      """WITH bi AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
             FROM lineitem),
         und AS (SELECT DISTINCT x.i AS u, y.i AS v
                 FROM bi x JOIN bi y ON x.b = y.b AND x.i < y.i),
         adj AS (SELECT u, v FROM und UNION ALL SELECT v, u FROM und),
         l0 AS (SELECT DISTINCT u AS n, u AS lab FROM adj),
         c1 AS (SELECT adj.u AS n, l0.lab AS lab, count(*) AS c
                FROM adj JOIN l0 ON l0.n = adj.v GROUP BY 1, 2),
         l1 AS (SELECT n, lab FROM (SELECT n, lab,
                  row_number() OVER (PARTITION BY n
                    ORDER BY c DESC, lab) AS rn FROM c1) WHERE rn = 1),
         c2 AS (SELECT adj.u AS n, l1.lab AS lab, count(*) AS c
                FROM adj JOIN l1 ON l1.n = adj.v GROUP BY 1, 2),
         l2 AS (SELECT n, lab FROM (SELECT n, lab,
                  row_number() OVER (PARTITION BY n
                    ORDER BY c DESC, lab) AS rn FROM c2) WHERE rn = 1),
         c3 AS (SELECT adj.u AS n, l2.lab AS lab, count(*) AS c
                FROM adj JOIN l2 ON l2.n = adj.v GROUP BY 1, 2),
         l3 AS (SELECT n, lab FROM (SELECT n, lab,
                  row_number() OVER (PARTITION BY n
                    ORDER BY c DESC, lab) AS rn FROM c3) WHERE rn = 1),
         c4 AS (SELECT adj.u AS n, l3.lab AS lab, count(*) AS c
                FROM adj JOIN l3 ON l3.n = adj.v GROUP BY 1, 2),
         l4 AS (SELECT n, lab FROM (SELECT n, lab,
                  row_number() OVER (PARTITION BY n
                    ORDER BY c DESC, lab) AS rn FROM c4) WHERE rn = 1)
         SELECT n AS part, CAST(lab AS BIGINT) AS label FROM l4""",
    "q134_nearest_centroid" -> // identical sum/n centroid means, dot/|c|
      // directional score, (score desc, label asc) argmax — all double
      // math (the q125 positional-unnest arithmetic); output is integer
      // confusion counts, robust to fold-order float wobble
      """WITH x AS (SELECT vec_id, label,
             unnest(CAST(embedding AS DOUBLE[])) AS v,
             unnest(range(len(embedding))) AS dim FROM embeddings),
         c AS (SELECT label AS c_label, dim, sum(v) / count(*) AS m
               FROM x GROUP BY 1, 2),
         cn AS (SELECT c_label, sqrt(sum(m * m)) AS nrm FROM c GROUP BY 1),
         s AS (SELECT x.vec_id, x.label, c.c_label, sum(x.v * c.m) AS d
               FROM x JOIN c ON x.dim = c.dim GROUP BY 1, 2, 3),
         sc AS (SELECT s.vec_id, s.label, s.c_label, s.d / cn.nrm AS score
                FROM s JOIN cn USING (c_label)),
         p AS (SELECT vec_id, label, c_label FROM (
                 SELECT vec_id, label, c_label,
                   row_number() OVER (PARTITION BY vec_id
                     ORDER BY score DESC, c_label) AS rn FROM sc)
               WHERE rn = 1)
         SELECT label, c_label AS predicted,
           CAST(count(*) AS BIGINT) AS n
         FROM p GROUP BY 1, 2""",
    "q136_shuffle_shard" -> // shard = the q121 HRW replay; pos = plain
      // row_number over (shard, seeded md5 key) — the naive one-task
      // formulation IS the oracle, the engine's two-pass range rank must
      // reproduce it exactly
      """WITH sh AS (SELECT doc_id, shard FROM (
             SELECT doc_id, s AS shard, row_number() OVER (
               PARTITION BY doc_id
               ORDER BY md5(CAST(doc_id AS VARCHAR) || ':' ||
                 CAST(s AS VARCHAR)) DESC, s DESC) AS rn
             FROM documents, range(8) AS t(s)) sub
           WHERE rn = 1)
         SELECT doc_id, shard, CAST(row_number() OVER (
             PARTITION BY shard
             ORDER BY md5('r7:' || CAST(doc_id AS VARCHAR)), doc_id)
           AS BIGINT) AS pos
         FROM sh""",
    "q137_hits" -> // identical unrolled arithmetic: sum over the edge
      // join, then divide by the L2 norm of the whole half-step vector;
      // three full iterations, auth first then hub (the engine's order)
      """WITH e AS MATERIALIZED (SELECT DISTINCT l_suppkey AS s, l_partkey AS p
             FROM lineitem),
         h0 AS MATERIALIZED (SELECT DISTINCT s, CAST(1.0 AS DOUBLE) AS h FROM e),
         a1r AS MATERIALIZED (SELECT p, sum(h) AS x FROM e JOIN h0 USING (s) GROUP BY p),
         a1 AS MATERIALIZED (SELECT p, x / (SELECT sqrt(sum(x*x)) FROM a1r) AS a
                FROM a1r),
         h1r AS MATERIALIZED (SELECT s, sum(a) AS x FROM e JOIN a1 USING (p) GROUP BY s),
         h1 AS MATERIALIZED (SELECT s, x / (SELECT sqrt(sum(x*x)) FROM h1r) AS h
                FROM h1r),
         a2r AS MATERIALIZED (SELECT p, sum(h) AS x FROM e JOIN h1 USING (s) GROUP BY p),
         a2 AS MATERIALIZED (SELECT p, x / (SELECT sqrt(sum(x*x)) FROM a2r) AS a
                FROM a2r),
         h2r AS MATERIALIZED (SELECT s, sum(a) AS x FROM e JOIN a2 USING (p) GROUP BY s),
         h2 AS MATERIALIZED (SELECT s, x / (SELECT sqrt(sum(x*x)) FROM h2r) AS h
                FROM h2r),
         a3r AS MATERIALIZED (SELECT p, sum(h) AS x FROM e JOIN h2 USING (s) GROUP BY p),
         a3 AS MATERIALIZED (SELECT p, x / (SELECT sqrt(sum(x*x)) FROM a3r) AS a
                FROM a3r),
         h3r AS MATERIALIZED (SELECT s, sum(a) AS x FROM e JOIN a3 USING (p) GROUP BY s),
         h3 AS MATERIALIZED (SELECT s, x / (SELECT sqrt(sum(x*x)) FROM h3r) AS h
                FROM h3r)
         SELECT p AS n, 'auth' AS kind, CAST(a AS FLOAT) AS score FROM a3
         UNION ALL
         SELECT s AS n, 'hub' AS kind, CAST(h AS FLOAT) AS score FROM h3""",
    "q138_vec_outliers" -> // identical sum/n centroid, sqrt-sum-of-squares
      // distance, and E[x^2]-E[x]^2 population z — all double; the z > 2
      // membership cut is float-wobble-safe (no fixture value near it)
      """WITH x AS (SELECT vec_id, label,
             unnest(CAST(embedding AS DOUBLE[])) AS v,
             unnest(range(len(embedding))) AS dim FROM embeddings),
         c AS (SELECT label AS c_label, dim, sum(v) / count(*) AS m
               FROM x GROUP BY 1, 2),
         d AS (SELECT x.vec_id, x.label,
                 sqrt(sum((x.v - c.m) * (x.v - c.m))) AS dist
               FROM x JOIN c ON x.label = c.c_label AND x.dim = c.dim
               GROUP BY 1, 2),
         st AS (SELECT label, avg(dist) AS mu,
                  sqrt(avg(dist * dist) - avg(dist) * avg(dist)) AS sd
                FROM d GROUP BY 1)
         SELECT d.vec_id, d.label, d.dist,
           (d.dist - st.mu) / st.sd AS z
         FROM d JOIN st USING (label)
         WHERE st.sd > 0 AND (d.dist - st.mu) / st.sd > 2.0""",
    "q139_time_decay" -> // identical integer-micros age (epoch_us vs
      // unix_micros) and exp/sum arithmetic; float-tolerant compare
      // absorbs per-libm exp last-ulp differences
      """WITH t AS (SELECT max(ts) AS tmax FROM events)
         SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           sum(value * exp(-CAST(epoch_us(t.tmax) - epoch_us(ts) AS DOUBLE)
             / (72.0 * 3600.0 * 1000000.0))) AS decayed_sum
         FROM events, t GROUP BY event_type""",
    "q140_psi_drift" -> // identical fixed width-25 buckets clamped to
      // 0..9, add-one smoothing over the FULL bucket domain, natural log
      """WITH ev AS (SELECT event_type,
             CAST(least(greatest(floor(value / 25), 0), 9) AS INTEGER)
               AS bucket,
             ts < TIMESTAMP '2024-01-16' AS is_ref FROM events),
         r AS (SELECT event_type, bucket, count(*) AS cr FROM ev
               WHERE is_ref GROUP BY 1, 2),
         c AS (SELECT event_type, bucket, count(*) AS cc FROM ev
               WHERE NOT is_ref GROUP BY 1, 2),
         dom AS (SELECT DISTINCT event_type, CAST(s AS INTEGER) AS bucket
                 FROM ev, range(10) AS t(s)),
         j AS (SELECT dom.event_type, dom.bucket,
                 COALESCE(cr, 0) AS cr, COALESCE(cc, 0) AS cc
               FROM dom
               LEFT JOIN r ON r.event_type = dom.event_type
                 AND r.bucket = dom.bucket
               LEFT JOIN c ON c.event_type = dom.event_type
                 AND c.bucket = dom.bucket),
         tt AS (SELECT event_type, sum(cr) AS nr, sum(cc) AS nc
                FROM j GROUP BY 1)
         SELECT j.event_type,
           CAST(max(tt.nr) AS BIGINT) AS n_ref,
           CAST(max(tt.nc) AS BIGINT) AS n_cur,
           sum(((cr + 1.0) / (nr + 10.0) - (cc + 1.0) / (nc + 10.0)) *
             ln(((cr + 1.0) / (nr + 10.0)) /
                ((cc + 1.0) / (nc + 10.0)))) AS psi
         FROM j JOIN tt ON tt.event_type = j.event_type
         GROUP BY j.event_type""",
    "q141_ranking_metrics" -> // both rankings re-derived by DuckDB's own
      // list_dot_product (full dims and [1:32] slice — ranks bit-stable,
      // the q11 precedent) and the recall/MRR/NDCG formulas recomputed
      // term for term; queries the truncated list misses entirely score 0
      """WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
             FROM embeddings WHERE vec_id < 20),
         full0 AS (SELECT q.qid, b.vec_id AS id, row_number() OVER (
               PARTITION BY q.qid ORDER BY
                 list_dot_product(qv, CAST(b.embedding AS DOUBLE[])) DESC,
                 b.vec_id) AS rnk
             FROM q, embeddings b),
         fullr AS (SELECT * FROM full0 WHERE rnk <= 10),
         tr0 AS (SELECT q.qid, b.vec_id AS id, row_number() OVER (
               PARTITION BY q.qid ORDER BY
                 list_dot_product(qv[1:32],
                   CAST(b.embedding AS DOUBLE[])[1:32]) DESC,
                 b.vec_id) AS rnk
             FROM q, embeddings b),
         trr AS (SELECT * FROM tr0 WHERE rnk <= 10),
         ne AS (SELECT qid, count(*) AS n_exp FROM fullr GROUP BY qid),
         h AS (SELECT f.qid, count(*) AS n_hit, min(t.rnk) AS first_hit,
                 sum(1.0 / log2(t.rnk + 1.0)) AS dcg
               FROM fullr f JOIN trr t ON f.qid = t.qid AND f.id = t.id
               GROUP BY f.qid),
         ig AS (SELECT g1.n AS n, sum(1.0 / log2(g2.s + 1.0)) AS idcg
                FROM generate_series(1, 10) g1(n),
                     generate_series(1, 10) g2(s)
                WHERE g2.s <= g1.n GROUP BY g1.n)
         SELECT ne.qid AS query_id,
           CAST(COALESCE(n_hit, 0) AS BIGINT) AS n_hit,
           COALESCE(n_hit, 0) / CAST(least(10, n_exp) AS DOUBLE) AS recall,
           COALESCE(1.0 / first_hit, 0.0) AS mrr,
           COALESCE(dcg, 0.0) / ig.idcg AS ndcg
         FROM ne
         LEFT JOIN h ON h.qid = ne.qid
         JOIN ig ON ig.n = least(10, n_exp)""",
    "q143_substring_search" -> // the ground truth is the full-scan LIKE
      // itself; the trigram-index path must reproduce it row for row
      """SELECT doc_id FROM documents
         WHERE contains(text, 'fast merge')""",
    // q144: independent FROM-SCRATCH ground truth — recursive
    // reachability over the UNION of old+new support-2 pair sets,
    // rep = least(n, min reachable); the incremental star-edge path must
    // be bit-identical. q146 drains the SAME pairs through streaming
    // micro-batches; mergeComponents is batching-insensitive (the state
    // is a pure function of the union), so the oracle is shared verbatim
    "q144_incremental_cc" -> ccScratchSql,
    "q146_stream_cc" -> ccScratchSql,
    "q145_skyline" -> // the literal NOT EXISTS strict-dominance query
      // on the same customer slice; ties (identical value+date) are
      // mutually non-dominating and kept on both sides
      """WITH o AS (SELECT o_orderkey, o_totalprice,
             CAST(epoch_us(o_orderdate) AS BIGINT) AS order_ts
           FROM orders WHERE o_custkey % 100 = 0)
         SELECT o_orderkey, o_totalprice, order_ts FROM o a
         WHERE NOT EXISTS (SELECT 1 FROM o b
           WHERE b.o_totalprice >= a.o_totalprice
             AND b.order_ts >= a.order_ts
             AND (b.o_totalprice > a.o_totalprice
                  OR b.order_ts > a.order_ts))""",
    "q113_tfidf_neighbors" -> // sparse TF-IDF cosine top-3 per doc via the
      // posting-list self-join, df band LIVE at 0.8 (prunes the head
      // term); double math, float-cast emit and rank (the q41 rule)
      """WITH tok AS (SELECT doc_id,
             list_transform(list_filter(string_split_regex(text, '\s+'),
               x -> len(x) > 0), x -> lower(x)) AS toks FROM documents),
         t AS (SELECT doc_id, unnest(toks) AS term FROM tok),
         tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
                FROM t GROUP BY doc_id, term),
         dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
         wtd AS (SELECT term, doc_id,
             CAST(tf AS DOUBLE) *
               ln((n_docs + 1.0) / (CAST(df AS DOUBLE) + 1.0)) AS w
           FROM tf JOIN dfreq USING (term), stats
           WHERE CAST(df AS DOUBLE) <= n_docs * 0.8),
         norms AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm
                   FROM wtd GROUP BY doc_id),
         dots AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             sum(a.w * b.w) AS dot
           FROM wtd a JOIN wtd b ON a.term = b.term AND a.doc_id < b.doc_id
           GROUP BY a.doc_id, b.doc_id),
         cosp AS (SELECT id_a, id_b,
             CAST(dot / (na.nrm * nb.nrm) AS FLOAT) AS cos
           FROM dots JOIN norms na ON dots.id_a = na.doc_id
                     JOIN norms nb ON dots.id_b = nb.doc_id),
         sym AS (SELECT id_a AS doc_id, id_b AS nbr_id, cos FROM cosp
                 UNION ALL SELECT id_b, id_a, cos FROM cosp)
         SELECT doc_id, nbr_id, cos, rnk FROM (
           SELECT doc_id, nbr_id, cos,
             CAST(row_number() OVER (PARTITION BY doc_id
               ORDER BY cos DESC, nbr_id) AS BIGINT) AS rnk FROM sym)
         WHERE rnk <= 3""",
    "q114_bigram_lm" -> // add-0.5-smoothed bigram conditional log-probs,
      // corpus-fitted; docs with < 2 tokens absent (the documented
      // engine contract); per-doc mean in double, float-cast emit
      """WITH tok AS (SELECT doc_id,
             list_transform(list_filter(string_split_regex(text, '\s+'),
               x -> len(x) > 0), x -> lower(x)) AS toks FROM documents),
         idx AS (SELECT doc_id, toks, unnest(range(len(toks) - 1)) AS i
                 FROM tok WHERE len(toks) >= 2),
         big AS (SELECT doc_id, toks[i + 1] AS w1, toks[i + 2] AS w2
                 FROM idx),
         c2 AS (SELECT w1, w2, count(*) AS c2 FROM big GROUP BY w1, w2),
         c1 AS (SELECT w1, count(*) AS c1 FROM big GROUP BY w1),
         vocab AS (SELECT CAST(count(DISTINCT t) AS DOUBLE) AS v
                   FROM (SELECT unnest(toks) AS t FROM tok))
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(avg(ln((CAST(c2 AS DOUBLE) + 0.5) /
                       (CAST(c1 AS DOUBLE) + 0.5 * v))) AS FLOAT) AS avg_logp
         FROM big JOIN c2 USING (w1, w2) JOIN c1 USING (w1), vocab
         GROUP BY doc_id""",
    "q115_keep_best" -> // q108's recursive-CTE reachability clusters +
      // keep-LONGEST argmax (n_chars DESC, doc_id tie-break) — integer
      // quality, zero float risk in the rank
      """WITH RECURSIVE tok AS (SELECT doc_id,
             list_distinct(list_filter(string_split_regex(text, '\s+'),
               x -> len(x) > 0)) AS w FROM documents),
         pairs AS (SELECT a.doc_id AS u, b.doc_id AS v
           FROM tok a JOIN tok b ON a.doc_id < b.doc_id
           WHERE len(list_distinct(list_concat(a.w, b.w))) > 0
             AND CAST(len(list_intersect(a.w, b.w)) AS DOUBLE) /
               len(list_distinct(list_concat(a.w, b.w))) >= 0.9),
         edges AS (SELECT u, v FROM pairs UNION ALL SELECT v, u FROM pairs),
         reach(id, lbl) AS (
           SELECT doc_id, doc_id FROM documents
           UNION
           SELECT e.u, r.lbl FROM reach r JOIN edges e ON e.v = r.id),
         rep AS (SELECT id AS doc_id, min(lbl) AS rep FROM reach GROUP BY id),
         j AS (SELECT d.doc_id, d.n_chars, r.rep FROM documents d
               JOIN rep r USING (doc_id)),
         ranked AS (SELECT doc_id, rep, n_chars,
             row_number() OVER (PARTITION BY rep
               ORDER BY n_chars DESC, doc_id) AS rnk,
             CAST(count(*) OVER (PARTITION BY rep) AS BIGINT)
               AS cluster_size
           FROM j)
         SELECT doc_id, rep, n_chars, cluster_size FROM ranked
         WHERE rnk = 1""",
    "q116_bfs_hops" -> // multi-source BFS over the co-purchase graph;
      // recursion on DISTINCT (n, hops) pairs (UNION, not UNION ALL —
      // path enumeration would be exponential), min hops per node
      """WITH RECURSIVE bi AS (SELECT DISTINCT l_orderkey AS b,
             l_partkey AS i FROM lineitem),
         und AS (SELECT DISTINCT x.i AS u, y.i AS v
                 FROM bi x JOIN bi y ON x.b = y.b AND x.i < y.i),
         dir AS (SELECT u, v FROM und UNION ALL SELECT v, u FROM und),
         nodes AS (SELECT DISTINCT u AS n FROM dir),
         reach(n, hops) AS (
           SELECT n, CAST(0 AS BIGINT) FROM nodes WHERE n IN (1, 2, 3)
           UNION
           SELECT d.v, r.hops + 1 FROM reach r JOIN dir d ON d.u = r.n
           WHERE r.hops < 3)
         SELECT n, min(hops) AS hops FROM reach GROUP BY n""",
    "q117_ppr" -> // q94's unrolled-iteration arithmetic with the teleport
      // mass pinned to parts {1,2,3}; float cast absorbs fold order
      """WITH bi AS MATERIALIZED (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
             FROM lineitem),
         und AS MATERIALIZED (SELECT DISTINCT x.i AS u, y.i AS v
                 FROM bi x JOIN bi y ON x.b = y.b AND x.i < y.i),
         dir AS MATERIALIZED (SELECT u, v FROM und UNION ALL SELECT v, u FROM und),
         deg AS MATERIALIZED (SELECT u AS n, CAST(count(*) AS BIGINT) AS d FROM dir
                 GROUP BY u),
         tele AS MATERIALIZED (SELECT n, CASE WHEN n IN (1, 2, 3) THEN 1.0 ELSE 0.0 END
                  AS ind FROM deg),
         sc AS MATERIALIZED (SELECT sum(ind) AS ns FROM tele),
         tv AS MATERIALIZED (SELECT n, ind / (SELECT ns FROM sc) AS t FROM tele),
         r0 AS MATERIALIZED (SELECT n, t AS r FROM tv),
         s1 AS MATERIALIZED (SELECT dir.v AS n, sum(r0.r / deg.d) AS s FROM dir
                JOIN deg ON deg.n = dir.u JOIN r0 ON r0.n = dir.u
                GROUP BY dir.v),
         r1 AS MATERIALIZED (SELECT tv.n, (1 - 0.85) * tv.t + 0.85 * COALESCE(s1.s, 0)
                  AS r FROM tv LEFT JOIN s1 ON s1.n = tv.n),
         s2 AS MATERIALIZED (SELECT dir.v AS n, sum(r1.r / deg.d) AS s FROM dir
                JOIN deg ON deg.n = dir.u JOIN r1 ON r1.n = dir.u
                GROUP BY dir.v),
         r2 AS MATERIALIZED (SELECT tv.n, (1 - 0.85) * tv.t + 0.85 * COALESCE(s2.s, 0)
                  AS r FROM tv LEFT JOIN s2 ON s2.n = tv.n),
         s3 AS MATERIALIZED (SELECT dir.v AS n, sum(r2.r / deg.d) AS s FROM dir
                JOIN deg ON deg.n = dir.u JOIN r2 ON r2.n = dir.u
                GROUP BY dir.v),
         r3 AS MATERIALIZED (SELECT tv.n, (1 - 0.85) * tv.t + 0.85 * COALESCE(s3.s, 0)
                  AS r FROM tv LEFT JOIN s3 ON s3.n = tv.n),
         s4 AS MATERIALIZED (SELECT dir.v AS n, sum(r3.r / deg.d) AS s FROM dir
                JOIN deg ON deg.n = dir.u JOIN r3 ON r3.n = dir.u
                GROUP BY dir.v),
         r4 AS MATERIALIZED (SELECT tv.n, (1 - 0.85) * tv.t + 0.85 * COALESCE(s4.s, 0)
                  AS r FROM tv LEFT JOIN s4 ON s4.n = tv.n),
         s5 AS MATERIALIZED (SELECT dir.v AS n, sum(r4.r / deg.d) AS s FROM dir
                JOIN deg ON deg.n = dir.u JOIN r4 ON r4.n = dir.u
                GROUP BY dir.v),
         r5 AS MATERIALIZED (SELECT tv.n, (1 - 0.85) * tv.t + 0.85 * COALESCE(s5.s, 0)
                  AS r FROM tv LEFT JOIN s5 ON s5.n = tv.n)
         SELECT n AS part, CAST(r AS FLOAT) AS rank FROM r5""",
    "q119_cross_jaccard" -> // naive quadratic eval-vs-train cross join,
      // q15's tokenization and intersection-over-union double math; the
      // engine's shared-order cross-relation prefix filter must reproduce
      // it exactly
      """WITH tok AS (SELECT doc_id,
             list_distinct(list_filter(string_split_regex(text, '\s+'),
               x -> len(x) > 0)) AS w FROM documents)
         SELECT a.doc_id AS eval_id, b.doc_id AS train_id,
           CAST(len(list_intersect(a.w, b.w)) AS DOUBLE) /
             len(list_distinct(list_concat(a.w, b.w))) AS jaccard
         FROM tok a JOIN tok b
           ON a.doc_id % 101 = 0 AND b.doc_id % 101 <> 0
         WHERE len(a.w) > 0 AND len(b.w) > 0
           AND CAST(len(list_intersect(a.w, b.w)) AS DOUBLE) /
             len(list_distinct(list_concat(a.w, b.w))) >= 0.8""",
    "q120_norm_dedup" -> // the same two regex rewrites + md5; explicit
      // ASCII classes (not \s / \p{Punct}) so both regex engines emit
      // identical bytes into the digest
      """SELECT md5(trim(regexp_replace(regexp_replace(lower(text),
           '[^a-z0-9 \t\n\r]', '', 'g'), '[ \t\n\r]+', ' ', 'g')))
           AS norm_digest,
         CAST(count(*) AS BIGINT) AS n_docs, min(doc_id) AS rep_id
         FROM documents GROUP BY 1""",
    "q121_hrw_shard" -> // the argmax replayed as a per-doc rank over the
      // 8 suffixed md5s (DESC ties to the largest shard id, matching the
      // engine's struct-max tie-break)
      """SELECT doc_id, shard FROM (
           SELECT doc_id, s AS shard, row_number() OVER (
             PARTITION BY doc_id
             ORDER BY md5(CAST(doc_id AS VARCHAR) || ':' ||
               CAST(s AS VARCHAR)) DESC, s DESC) AS rn
           FROM documents, range(8) AS t(s)) sub
         WHERE rn = 1""",
    "q122_overlap_frac" -> // q45's gram construction, DISTINCT per doc,
      // LEFT join so zero-overlap docs stay at 0.0; double division on
      // both sides
      """WITH tok AS (SELECT doc_id, source,
             list_filter(string_split_regex(text, '\s+'),
               x -> len(x) > 0) AS toks FROM documents),
         g AS (SELECT doc_id, source,
               array_to_string(toks[s+1:s+4], ' ') AS gram
               FROM tok, UNNEST(range(0, len(toks)-3)) AS t(s)
               WHERE len(toks) >= 4),
         ev AS (SELECT DISTINCT gram FROM g WHERE source = 'src0'),
         tr AS (SELECT DISTINCT doc_id, gram FROM g WHERE source <> 'src0')
         SELECT tr.doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(count(ev.gram) AS BIGINT) AS n_hit,
           CAST(count(ev.gram) AS DOUBLE) / count(*) AS overlap_frac
         FROM tr LEFT JOIN ev ON tr.gram = ev.gram
         GROUP BY tr.doc_id""",
    "q125_vec_profile" -> // 1-based list indexing over a lateral range;
      // identical sum/n mean and E[x^2]-E[x]^2 population variance —
      // fold-order float wobble absorbed by the tolerant compare
      """WITH x AS (SELECT unnest(embedding) AS v,
             unnest(range(len(embedding))) AS dim FROM embeddings)
         SELECT CAST(dim AS BIGINT) AS dim,
           CAST(count(*) AS BIGINT) AS n,
           sum(CAST(v AS DOUBLE)) / count(*) AS mean,
           sum(CAST(v AS DOUBLE) * CAST(v AS DOUBLE)) / count(*)
             - pow(sum(CAST(v AS DOUBLE)) / count(*), 2) AS variance
         FROM x GROUP BY dim""",
    "q126_change_set" -> // literal FULL OUTER JOIN, same synthetic drift;
      // COALESCE(a, b) picks the after image for I/U, before image for D
      """WITH b AS (SELECT p_partkey, p_name, p_retailprice FROM part),
         a AS (SELECT p_partkey, p_name,
                 CASE WHEN p_partkey % 10 = 0 THEN p_retailprice + 10.0
                      ELSE p_retailprice END AS p_retailprice
               FROM part WHERE p_partkey % 13 <> 0
               UNION ALL
               SELECT p_partkey + 1000000, p_name, p_retailprice FROM part
               WHERE p_partkey % 17 = 0)
         SELECT COALESCE(a.p_partkey, b.p_partkey) AS p_partkey,
           COALESCE(a.p_name, b.p_name) AS p_name,
           COALESCE(a.p_retailprice, b.p_retailprice) AS p_retailprice,
           CASE WHEN b.p_partkey IS NULL THEN 'I'
                WHEN a.p_partkey IS NULL THEN 'D' ELSE 'U' END AS op
         FROM a FULL OUTER JOIN b ON a.p_partkey = b.p_partkey
         WHERE b.p_partkey IS NULL OR a.p_partkey IS NULL
           OR a.p_retailprice <> b.p_retailprice
           OR a.p_name <> b.p_name""",
    "q128_anomaly" -> // identical trailing frame (24 PRECEDING..1
      // PRECEDING) and E[x^2]-E[x]^2 variance; NULL z on empty/constant
      // baselines on both sides
      """WITH h AS (SELECT event_type,
             strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
             CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
         w AS (SELECT event_type, hour, n,
             avg(CAST(n AS DOUBLE)) OVER fr AS m,
             avg(CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) OVER fr AS m2
           FROM h WINDOW fr AS (PARTITION BY event_type ORDER BY hour
             ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
         SELECT event_type, hour, n, m AS baseline_mean,
           CASE WHEN m2 - m * m > 1e-9
             THEN (CAST(n AS DOUBLE) - m) / sqrt(m2 - m * m) END AS z
         FROM w""",
    "q123_k_anonymity" -> // literal HAVING mirror of the small-group audit
      """SELECT lang, source, CAST(count(*) AS BIGINT) AS group_n
         FROM documents GROUP BY lang, source HAVING count(*) < 15""",
    "q107_containment" -> // q15's tokenization, |a∩b| / |a| directed
      """WITH tok AS (SELECT doc_id,
             list_distinct(list_filter(string_split_regex(text, '\s+'),
               x -> len(x) > 0)) AS w FROM documents)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(len(list_intersect(a.w, b.w)) AS DOUBLE) / len(a.w)
             AS containment
         FROM tok a JOIN tok b ON a.doc_id <> b.doc_id
         WHERE len(a.w) > 0
           AND CAST(len(list_intersect(a.w, b.w)) AS DOUBLE) / len(a.w)
             >= 0.9""",
    "q108_leak_split" -> // q15's pair set -> recursive-CTE reachability
      // components -> md5-of-rep split buckets (the q37 hash pattern);
      // near-dup clusters must land in ONE split atomically
      """WITH RECURSIVE tok AS (SELECT doc_id,
             list_distinct(list_filter(string_split_regex(text, '\s+'),
               x -> len(x) > 0)) AS w FROM documents),
         pairs AS (SELECT a.doc_id AS u, b.doc_id AS v
           FROM tok a JOIN tok b ON a.doc_id < b.doc_id
           WHERE len(list_distinct(list_concat(a.w, b.w))) > 0
             AND CAST(len(list_intersect(a.w, b.w)) AS DOUBLE) /
               len(list_distinct(list_concat(a.w, b.w))) >= 0.9),
         edges AS (SELECT u, v FROM pairs UNION ALL SELECT v, u FROM pairs),
         reach(id, lbl) AS (
           SELECT doc_id, doc_id FROM documents
           UNION
           SELECT e.u, r.lbl FROM reach r JOIN edges e ON e.v = r.id),
         rep AS (SELECT id AS doc_id, min(lbl) AS rep FROM reach GROUP BY id)
         SELECT doc_id, rep,
           CASE WHEN substring(md5(CAST(rep AS VARCHAR)), 1, 4) < 'cccd'
                  THEN 'train'
                WHEN substring(md5(CAST(rep AS VARCHAR)), 1, 4) < 'e667'
                  THEN 'val'
                ELSE 'test' END AS split
         FROM rep""",
    "q110_index_delete" -> // post-delete serving state: q11's top-10 with
      // the deleted rank-1 row (vec_id 0, the self match) excluded — the
      // engine reaches this through ONE incremental tombstone refresh,
      // the oracle by filtering the source; rank-11 must be promoted
      """SELECT b.vec_id AS vec_id,
         list_dot_product(CAST(a.embedding AS DOUBLE[]),
                          CAST(b.embedding AS DOUBLE[])) AS score
         FROM embeddings a JOIN embeddings b
           ON a.vec_id = 0 AND b.vec_id <> 0
         ORDER BY score DESC, b.vec_id LIMIT 10""",
    "q109_maxsim" -> // late-interaction group-max: top-5 docs (labels) by
      // the best chunk-vector score; q11's dot arithmetic, max-reduced
      """SELECT CAST(label AS BIGINT) AS label, score FROM (
           SELECT b.label AS label, max(list_dot_product(
               CAST(a.embedding AS DOUBLE[]),
               CAST(b.embedding AS DOUBLE[]))) AS score
           FROM embeddings a JOIN embeddings b ON a.vec_id = 0
           GROUP BY b.label)
         ORDER BY score DESC, label LIMIT 5""",
    "q111_maxsim_ivf" -> // IVF-routed MaxSim at FULL probe: the routing
      // is lossless there, so q109's exact group-max oracle verbatim
      """SELECT CAST(label AS BIGINT) AS label, score FROM (
           SELECT b.label AS label, max(list_dot_product(
               CAST(a.embedding AS DOUBLE[]),
               CAST(b.embedding AS DOUBLE[]))) AS score
           FROM embeddings a JOIN embeddings b ON a.vec_id = 0
           GROUP BY b.label)
         ORDER BY score DESC, label LIMIT 5""",
    "q12_knn_join" ->
      """SELECT query_id, vec_id, score, rnk FROM (
           SELECT a.vec_id AS query_id, b.vec_id AS vec_id,
             list_dot_product(CAST(a.embedding AS DOUBLE[]),
                              CAST(b.embedding AS DOUBLE[])) AS score,
             row_number() OVER (PARTITION BY a.vec_id
               ORDER BY list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])) DESC,
                        b.vec_id) AS rnk
           FROM embeddings a JOIN embeddings b
             ON a.vec_id < 5 AND a.vec_id <> b.vec_id) WHERE rnk <= 3""",
    "q12b_knn_agg" -> // aggregator knn path: q12's math, self-matches kept
      """SELECT query_id, vec_id, score, rnk FROM (
           SELECT a.vec_id AS query_id, b.vec_id AS vec_id,
             list_dot_product(CAST(a.embedding AS DOUBLE[]),
                              CAST(b.embedding AS DOUBLE[])) AS score,
             row_number() OVER (PARTITION BY a.vec_id
               ORDER BY list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])) DESC,
                        b.vec_id) AS rnk
           FROM embeddings a JOIN embeddings b
             ON a.vec_id < 5) WHERE rnk <= 3""",
    "q13_embed_dedup_pairs" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         list_dot_product(CAST(a.embedding AS DOUBLE[]),
                          CAST(b.embedding AS DOUBLE[])) AS score
         FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         WHERE list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                CAST(b.embedding AS DOUBLE[])) > 0.45""",
    "q13b_embed_dedup_lsh" -> // LSH path == exact pairs at this config
      // (total candidate recall under the pinned seed + exact verify)
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         list_dot_product(CAST(a.embedding AS DOUBLE[]),
                          CAST(b.embedding AS DOUBLE[])) AS score
         FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         WHERE list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                CAST(b.embedding AS DOUBLE[])) > 0.45""",
    "q14_dedup_exact" ->
      """SELECT lang, source, min(doc_id) AS keeper,
         CAST(count(*) AS BIGINT) AS group_size
         FROM documents GROUP BY lang, source""",
    "q15_jaccard_pairs" ->
      """WITH tok AS (SELECT doc_id,
             list_distinct(list_filter(string_split_regex(text, '\s+'),
               x -> len(x) > 0)) AS w FROM documents)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(len(list_intersect(a.w, b.w)) AS DOUBLE) /
             len(list_distinct(list_concat(a.w, b.w))) AS jaccard
         FROM tok a JOIN tok b ON a.doc_id < b.doc_id
         WHERE len(list_distinct(list_concat(a.w, b.w))) > 0
           AND CAST(len(list_intersect(a.w, b.w)) AS DOUBLE) /
             len(list_distinct(list_concat(a.w, b.w))) >= 0.9""",
    "q16_text_quality" ->
      """WITH tok AS (SELECT doc_id, text,
             list_filter(string_split_regex(text, '\s+'),
               x -> len(x) > 0) AS toks FROM documents)
         SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(regexp_extract_all(text,
             '[A-Za-z0-9_]+|[^A-Za-z0-9_\s]')) AS BIGINT) AS n_bpeish,
           CASE WHEN len(toks) = 0 THEN 0.0 ELSE
             CAST(len(list_filter(toks,
               x -> list_contains(['the', 'a'], lower(x)))) AS DOUBLE) /
             len(toks) END AS stopword_ratio,
           CASE WHEN len(toks) = 0 THEN 0.0 ELSE
             CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE) /
             len(toks) END AS mean_tok_len
         FROM tok""",
    "q17_lang_stats" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS total_chars,
         avg(n_chars) AS avg_chars
         FROM documents GROUP BY lang""",
    "q18_fingerprint" ->
      """SELECT doc_id, md5(text) AS fp FROM documents""",
    "q19_binary_scan" ->
      s"""SELECT regexp_replace(filename, '^file:', '') AS path,
         CAST(size AS BIGINT) AS length
         FROM read_blob('$dir/*.parquet')""",
    "q20b_minhash_exact" -> // r=1 banding + exact verify == exact jaccard pairs
      """WITH tok AS (SELECT doc_id,
             list_distinct(list_filter(string_split_regex(text, '\s+'),
               x -> len(x) > 0)) AS w FROM documents)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(len(list_intersect(a.w, b.w)) AS DOUBLE) /
             len(list_distinct(list_concat(a.w, b.w))) AS jaccard
         FROM tok a JOIN tok b ON a.doc_id < b.doc_id
         WHERE len(list_distinct(list_concat(a.w, b.w))) > 0
           AND CAST(len(list_intersect(a.w, b.w)) AS DOUBLE) /
             len(list_distinct(list_concat(a.w, b.w))) >= 0.9""",
    "q22_lang_id" ->
      """WITH tok AS (SELECT doc_id,
             list_transform(list_filter(string_split_regex(text, '\s+'),
               x -> len(x) > 0), x -> lower(x)) AS toks FROM documents),
         scores AS (SELECT doc_id,
           len(list_filter(toks, x -> list_contains(
             ['der','die','das','und','ist','nicht','ein','zu'], x))) AS de,
           len(list_filter(toks, x -> list_contains(
             ['the','and','of','to','is','in','that','it'], x))) AS en,
           len(list_filter(toks, x -> list_contains(
             ['el','la','los','y','es','una','que','no'], x))) AS es,
           len(list_filter(toks, x -> list_contains(
             ['le','la','les','et','est','une','que','pas'], x))) AS fr,
           len(list_filter(toks, x -> list_contains(
             ['il','la','che','e','di','un','per','non'], x))) AS it,
           len(list_filter(toks, x -> list_contains(
             ['o','a','os','e','de','um','para','nao'], x))) AS pt
           FROM tok)
         SELECT doc_id, CASE
           WHEN greatest(de, en, es, fr, it, pt) = 0 THEN 'und'
           WHEN de >= en AND de >= es AND de >= fr AND de >= it AND de >= pt THEN 'de'
           WHEN en >= es AND en >= fr AND en >= it AND en >= pt THEN 'en'
           WHEN es >= fr AND es >= it AND es >= pt THEN 'es'
           WHEN fr >= it AND fr >= pt THEN 'fr'
           WHEN it >= pt THEN 'it'
           ELSE 'pt' END AS lang_guess
         FROM scores""",
    "q24_ivf_topk" -> // full-probe IVF == exact top-k (same as q11's math)
      """SELECT b.vec_id AS vec_id,
         list_dot_product(CAST(a.embedding AS DOUBLE[]),
                          CAST(b.embedding AS DOUBLE[])) AS score
         FROM embeddings a JOIN embeddings b ON a.vec_id = 0
         ORDER BY score DESC, b.vec_id LIMIT 10""",
    "q25b_bm25" -> // BM25 (k1=1.2, b=0.75) over whitespace tokens,
      // query terms: spark, vector, join — mirrors HybridSearch.bm25
      """WITH tok AS (SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'),
               x -> len(x) > 0) AS toks FROM documents),
         d AS (SELECT doc_id, toks, CAST(len(toks) AS DOUBLE) AS dl FROM tok),
         stats AS (SELECT CAST(count(*) AS DOUBLE) AS n,
             avg(dl) AS avgdl,
             CAST(sum(CASE WHEN list_contains(toks, 'spark') THEN 1 ELSE 0 END) AS DOUBLE) AS df1,
             CAST(sum(CASE WHEN list_contains(toks, 'vector') THEN 1 ELSE 0 END) AS DOUBLE) AS df2,
             CAST(sum(CASE WHEN list_contains(toks, 'join') THEN 1 ELSE 0 END) AS DOUBLE) AS df3
           FROM d),
         scored AS (SELECT doc_id,
             (CASE WHEN df1 = 0 THEN 0.0 ELSE
               ln(1 + (n - df1 + 0.5) / (df1 + 0.5)) *
               CAST(len(list_filter(toks, x -> x = 'spark')) AS DOUBLE) * 2.2 /
               (CAST(len(list_filter(toks, x -> x = 'spark')) AS DOUBLE)
                + 1.2 * (0.25 + 0.75 * dl / avgdl)) END)
             + (CASE WHEN df2 = 0 THEN 0.0 ELSE
               ln(1 + (n - df2 + 0.5) / (df2 + 0.5)) *
               CAST(len(list_filter(toks, x -> x = 'vector')) AS DOUBLE) * 2.2 /
               (CAST(len(list_filter(toks, x -> x = 'vector')) AS DOUBLE)
                + 1.2 * (0.25 + 0.75 * dl / avgdl)) END)
             + (CASE WHEN df3 = 0 THEN 0.0 ELSE
               ln(1 + (n - df3 + 0.5) / (df3 + 0.5)) *
               CAST(len(list_filter(toks, x -> x = 'join')) AS DOUBLE) * 2.2 /
               (CAST(len(list_filter(toks, x -> x = 'join')) AS DOUBLE)
                + 1.2 * (0.25 + 0.75 * dl / avgdl)) END) AS bm25
           FROM d, stats)
         SELECT doc_id, bm25 FROM scored WHERE bm25 > 0""",
    "q26_image_meta" -> // golden expected table: the fixture corpus declares
      // its dimensions by construction (ImageFixtures.images), so the
      // oracle is the spec the real decoder must recover; the corrupt
      // fixture must NOT appear (decode-failure drop)
      """SELECT * FROM (VALUES
           ('/root/repo/fixtures/images/img_00.png', 16, 12, 'png'),
           ('/root/repo/fixtures/images/img_01.png', 20, 15, 'png'),
           ('/root/repo/fixtures/images/img_02.png', 24, 18, 'png'),
           ('/root/repo/fixtures/images/img_03.png', 28, 21, 'png'),
           ('/root/repo/fixtures/images/img_04.png', 32, 24, 'png'),
           ('/root/repo/fixtures/images/img_05.png', 36, 27, 'png'),
           ('/root/repo/fixtures/images/img_06.png', 40, 30, 'png'),
           ('/root/repo/fixtures/images/img_07.png', 44, 33, 'png'),
           ('/root/repo/fixtures/images/img_08.jpg', 48, 36, 'jpeg'),
           ('/root/repo/fixtures/images/img_09.jpg', 52, 39, 'jpeg'),
           ('/root/repo/fixtures/images/img_10.jpg', 56, 42, 'jpeg'),
           ('/root/repo/fixtures/images/img_11.jpg', 60, 45, 'jpeg')
         ) AS t(path, width, height, format)""",
    "q27_rollup" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
         CAST(count(*) AS BIGINT) AS n,
         CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS grp
         FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""",
    "q28_semi_anti" ->
      """SELECT 'with_orders' AS tag, CAST(count(*) AS BIGINT) AS n
         FROM customer WHERE EXISTS
           (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         UNION ALL
         SELECT 'no_orders' AS tag, CAST(count(*) AS BIGINT) AS n
         FROM customer WHERE NOT EXISTS
           (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",
    "q29_sql_surface" -> // float-cast sum: absorbs engine summation-order
      // ulp drift on the double accumulation (see q41's note)
      """SELECT n_name, CAST(count(*) AS BIGINT) AS n_suppliers,
         CAST(sum(s_acctbal) AS FLOAT) AS total_bal
         FROM supplier JOIN nation ON s_nationkey = n_nationkey
         GROUP BY n_name""",
    "q30_case_date" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS yr,
         CASE WHEN o_totalprice > 400000 THEN 'big'
              WHEN o_totalprice > 100000 THEN 'mid'
              ELSE 'small' END AS bucket,
         CAST(count(*) AS BIGINT) AS n, sum(o_totalprice) AS total
         FROM orders GROUP BY 1, 2""",
    "q31_string_funcs" ->
      """SELECT c_custkey, upper(c_name) AS uname,
         CAST(length(c_name) AS BIGINT) AS name_len,
         substring(c_name, 1, 4) AS prefix,
         concat_ws('|', c_mktsegment, c_name) AS tagged
         FROM customer""",
    "q32_sql_vec_dot" ->
      """SELECT b.vec_id AS vec_id,
         list_dot_product(CAST(a.embedding AS DOUBLE[]),
                          CAST(b.embedding AS DOUBLE[])) AS score
         FROM embeddings a JOIN embeddings b ON a.vec_id = 1
         ORDER BY score DESC, vec_id LIMIT 5""",
    "q34_dedup_pipeline" -> // exact-jaccard edges -> recursive-CTE min-label
      // components -> survivors (mirrors Dedup.dropDuplicates semantics)
      """WITH RECURSIVE
         tok AS (SELECT doc_id,
             list_distinct(list_filter(string_split_regex(text, '\s+'),
               x -> len(x) > 0)) AS w FROM documents),
         pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
           FROM tok a JOIN tok b ON a.doc_id < b.doc_id
           WHERE len(list_distinct(list_concat(a.w, b.w))) > 0
             AND CAST(len(list_intersect(a.w, b.w)) AS DOUBLE) /
               len(list_distinct(list_concat(a.w, b.w))) >= 0.9),
         edges AS (SELECT id_a, id_b FROM pairs
           UNION SELECT id_b, id_a FROM pairs),
         cc(id, label) AS (
           SELECT DISTINCT id_a, id_a FROM edges
           UNION
           SELECT e.id_a, cc.label FROM edges e JOIN cc ON cc.id = e.id_b),
         victims AS (
           SELECT id FROM (SELECT id, min(label) AS label FROM cc GROUP BY id)
           WHERE label <> id)
         SELECT CAST(count(*) AS BIGINT) AS survivors,
           min(doc_id) AS min_id, max(doc_id) AS max_id
         FROM documents WHERE doc_id NOT IN (SELECT id FROM victims)""",
    "q35_audio_meta" -> // fixture-spec oracle (AudioFixtures.clips): the
      // real WAV decoder must recover the spec; the corrupt fixture must
      // NOT appear. duration = frames / rate computed as the same IEEE
      // double division on both sides.
      """SELECT path, sample_rate, channels, 16 AS bits,
           CAST(frames AS BIGINT) AS frames,
           CAST(frames AS DOUBLE) / sample_rate AS duration_sec
         FROM (VALUES
           ('/root/repo/fixtures/audio/aud_00.wav', 8000, 1, 800),
           ('/root/repo/fixtures/audio/aud_01.wav', 8000, 2, 1600),
           ('/root/repo/fixtures/audio/aud_02.wav', 16000, 1, 2400),
           ('/root/repo/fixtures/audio/aud_03.wav', 16000, 2, 3200),
           ('/root/repo/fixtures/audio/aud_04.wav', 44100, 1, 4410),
           ('/root/repo/fixtures/audio/aud_05.wav', 44100, 2, 8820)
         ) AS t(path, sample_rate, channels, frames)""",
    "q36_asof_join" -> // DuckDB's native ASOF JOIN is the independent
      // oracle for the union+carry-forward merge formulation
      """SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
           c.event_id AS click_event_id, epoch_us(c.ts) AS click_ts_us,
           c.value AS click_value
         FROM (SELECT * FROM events WHERE event_type = 'error') e
         ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
           ON e.user_id = c.user_id AND e.ts >= c.ts""",
    "q37_stratified_sample" -> // md5-bucket thresholds: 0.5*2^16=0x8000,
      // 0.25->0x4000, default 0.125->0x2000
      """SELECT doc_id, lang FROM documents
         WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) <
           CASE WHEN lang = 'de' THEN '4000'
                WHEN lang = 'en' THEN '8000'
                ELSE '2000' END""",
    "q38_token_quantiles" ->
      """WITH tok AS (SELECT lang,
             CAST(len(list_filter(string_split_regex(text, '\s+'),
               x -> len(x) > 0)) AS DOUBLE) AS nt FROM documents)
         SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           quantile_cont(nt, 0.25) AS p25,
           quantile_cont(nt, 0.5) AS p50,
           quantile_cont(nt, 0.75) AS p75,
           max(nt) AS max_tokens
         FROM tok GROUP BY lang""",
    "q39_span_dedup" ->
      """WITH tok AS (SELECT doc_id,
             list_filter(string_split_regex(text, '\s+'),
               x -> len(x) > 0) AS toks FROM documents),
         g AS (SELECT doc_id, md5(array_to_string(toks[s+1:s+5], ' ')) AS gram
               FROM tok, UNNEST(range(0, len(toks)-4)) AS t(s)
               WHERE len(toks) >= 5),
         d AS (SELECT gram FROM g GROUP BY gram
               HAVING count(DISTINCT doc_id) > 1)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_spans
         FROM g JOIN d USING (gram) GROUP BY doc_id""",
    "q40_pii_redact" ->
      """WITH aug AS (SELECT doc_id,
           text || ' contact user' || CAST(doc_id AS VARCHAR)
                || '@example.com from 10.0.'
                || CAST(doc_id % 256 AS VARCHAR) || '.1' AS a
           FROM documents)
         SELECT doc_id,
           CAST(len(regexp_extract_all(a,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
             AS n_emails,
           CAST(len(regexp_extract_all(a,
             '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b'))
             AS BIGINT) AS n_ips,
           regexp_replace(regexp_replace(a,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
             '<EMAIL>', 'g'),
             '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b',
             '<IP>', 'g') AS redacted
         FROM aug""",
    "q41_tfidf_terms" ->
      """WITH tok AS (SELECT doc_id,
             unnest(list_transform(list_filter(
               string_split_regex(text, '\s+'), x -> len(x) > 0),
               x -> lower(x))) AS term FROM documents),
         tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
                FROM tok GROUP BY doc_id, term),
         dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
         scored AS (SELECT doc_id, term,
             CAST(CAST(tf AS DOUBLE) *
               ln((n_docs + 1.0) / (CAST(df AS DOUBLE) + 1.0)) AS FLOAT)
               AS tfidf
           FROM tf JOIN dfreq USING (term), stats)
         SELECT doc_id, term, tfidf, rnk FROM (
           SELECT doc_id, term, tfidf,
             CAST(row_number() OVER (PARTITION BY doc_id
               ORDER BY tfidf DESC, term) AS BIGINT) AS rnk
           FROM scored) WHERE rnk <= 3""",
    "q42_sessionize" -> // 30-min gap; strictly-greater closes (matches the
      // streaming flatMapGroupsWithState semantics)
      """WITH lagd AS (SELECT user_id, ts, value,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
           FROM events),
         flag AS (SELECT user_id, ts, value,
             CASE WHEN prev IS NULL
                    OR epoch_us(ts) - epoch_us(prev) > 1800000000
                  THEN 1 ELSE 0 END AS new_s FROM lagd),
         sess AS (SELECT user_id, ts, value,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
               ROWS UNBOUNDED PRECEDING) AS sid FROM flag)
         SELECT user_id, CAST(sid AS BIGINT) AS session_id,
           min(epoch_us(ts)) AS session_start_us,
           max(epoch_us(ts)) AS session_end_us,
           CAST(count(*) AS BIGINT) AS n_events,
           sum(value) AS sum_value
         FROM sess GROUP BY user_id, sid""",
    "q43_corpus_pipeline" -> // q16 token gate + q22 lang-ID + q14-style md5
      // dedup (QUALIFY min-pk) + q37 hash sampling, composed end to end;
      // thresholds: 0.75->0xc000, 0.5->0x8000, default 0.25->0x4000
      """WITH tok AS (SELECT doc_id, source, text,
             list_transform(list_filter(string_split_regex(text, '\s+'),
               x -> len(x) > 0), x -> lower(x)) AS toks FROM documents),
         scores AS (SELECT doc_id, source, text,
           CAST(len(toks) AS BIGINT) AS nt,
           len(list_filter(toks, x -> list_contains(
             ['der','die','das','und','ist','nicht','ein','zu'], x))) AS de,
           len(list_filter(toks, x -> list_contains(
             ['the','and','of','to','is','in','that','it'], x))) AS en,
           len(list_filter(toks, x -> list_contains(
             ['el','la','los','y','es','una','que','no'], x))) AS es,
           len(list_filter(toks, x -> list_contains(
             ['le','la','les','et','est','une','que','pas'], x))) AS fr,
           len(list_filter(toks, x -> list_contains(
             ['il','la','che','e','di','un','per','non'], x))) AS it,
           len(list_filter(toks, x -> list_contains(
             ['o','a','os','e','de','um','para','nao'], x))) AS pt
           FROM tok),
         langed AS (SELECT doc_id, source, text, nt, CASE
           WHEN greatest(de, en, es, fr, it, pt) = 0 THEN 'und'
           WHEN de >= en AND de >= es AND de >= fr AND de >= it AND de >= pt THEN 'de'
           WHEN en >= es AND en >= fr AND en >= it AND en >= pt THEN 'en'
           WHEN es >= fr AND es >= it AND es >= pt THEN 'es'
           WHEN fr >= it AND fr >= pt THEN 'fr'
           WHEN it >= pt THEN 'it'
           ELSE 'pt' END AS lg FROM scores),
         gated AS (SELECT * FROM langed
           WHERE nt BETWEEN 20 AND 500 AND lg = 'en'),
         deduped AS (SELECT * FROM gated
           QUALIFY row_number() OVER (PARTITION BY md5(text)
             ORDER BY doc_id) = 1),
         sampled AS (SELECT * FROM deduped
           WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) <
             CASE WHEN source = 'src0' THEN 'c000'
                  WHEN source = 'src1' THEN '8000'
                  ELSE '4000' END)
         SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(nt) AS BIGINT) AS total_tokens, min(doc_id) AS min_id
         FROM sampled GROUP BY source""",
    "q44_pq_topk" -> // two-stage PQ == exact top-k at the pinned refine
      // depth (candidate coverage spec-verified), so the oracle is the
      // same exact-search SQL as q11
      """SELECT b.vec_id AS vec_id,
         list_dot_product(CAST(a.embedding AS DOUBLE[]),
                          CAST(b.embedding AS DOUBLE[])) AS score
         FROM embeddings a JOIN embeddings b ON a.vec_id = 0
         ORDER BY score DESC, b.vec_id LIMIT 10""",
    "q45_decontaminate" ->
      """WITH tok AS (SELECT doc_id, source,
             list_filter(string_split_regex(text, '\s+'),
               x -> len(x) > 0) AS toks FROM documents),
         g AS (SELECT doc_id, source,
               array_to_string(toks[s+1:s+4], ' ') AS gram
               FROM tok, UNNEST(range(0, len(toks)-3)) AS t(s)
               WHERE len(toks) >= 4),
         ev AS (SELECT DISTINCT gram FROM g WHERE source = 'src0'),
         tr AS (SELECT doc_id, gram FROM g WHERE source <> 'src0')
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_contam_spans,
           CAST(count(DISTINCT gram) AS BIGINT) AS n_contam_grams
         FROM tr JOIN ev USING (gram) GROUP BY doc_id""",
    "q46_repetition" ->
      """WITH tok AS (SELECT doc_id,
             list_filter(string_split_regex(text, '\s+'),
               x -> len(x) > 0) AS toks FROM documents),
         g AS (SELECT doc_id, toks,
               CASE WHEN len(toks) >= 2 THEN list_transform(
                 range(0, len(toks)-1), s -> array_to_string(toks[s+1:s+2], ' '))
                 ELSE [] END AS g2,
               CASE WHEN len(toks) >= 3 THEN list_transform(
                 range(0, len(toks)-2), s -> array_to_string(toks[s+1:s+3], ' '))
                 ELSE [] END AS g3
               FROM tok)
         SELECT doc_id,
           CASE WHEN len(toks) = 0 THEN 0.0 ELSE
             1.0 - CAST(len(list_distinct(toks)) AS DOUBLE)
               / CAST(len(toks) AS DOUBLE) END AS rep1,
           CASE WHEN len(g2) = 0 THEN 0.0 ELSE
             1.0 - CAST(len(list_distinct(g2)) AS DOUBLE)
               / CAST(len(g2) AS DOUBLE) END AS rep2,
           CASE WHEN len(g3) = 0 THEN 0.0 ELSE
             1.0 - CAST(len(list_distinct(g3)) AS DOUBLE)
               / CAST(len(g3) AS DOUBLE) END AS rep3
         FROM g""",
    "q49_cube" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS yr, o_orderstatus,
         CAST(sum(o_totalprice) AS FLOAT) AS total,
         CAST(count(*) AS BIGINT) AS n,
         CAST(GROUPING(year(o_orderdate), o_orderstatus) AS BIGINT) AS grp
         FROM orders GROUP BY CUBE(year(o_orderdate), o_orderstatus)""",
    // q50 rewrites orders z-order-clustered then scans the copy; the
    // layout is content-preserving, so the oracle is the same box filter +
    // aggregate over the ORIGINAL table. Float total absorbs the
    // summation-order ulp drift the different row placement causes.
    "q50_zorder_scan" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(o_totalprice) AS FLOAT) AS total
         FROM orders
         WHERE o_custkey BETWEEN 100 AND 600
           AND o_totalprice BETWEEN 50000 AND 100000
         GROUP BY o_orderpriority""",
    "q51_ivfpq_topk" -> // IVFADC at full probe + deep refine == exact
      // top-k (candidate coverage spec-verified), so the oracle is the
      // same exact-search SQL as q11/q24/q44
      """SELECT b.vec_id AS vec_id,
         list_dot_product(CAST(a.embedding AS DOUBLE[]),
                          CAST(b.embedding AS DOUBLE[])) AS score
         FROM embeddings a JOIN embeddings b ON a.vec_id = 0
         ORDER BY score DESC, b.vec_id LIMIT 10""",
    // q53 joins bucketed REWRITES of orders/customer; bucketing is
    // content-preserving, so the oracle is the same join + aggregate over
    // the original tables (float total absorbs summation-order drift)
    "q53_bucket_join" ->
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(o_totalprice) AS FLOAT) AS total
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment""",
    "q54_batch_ivfpq" -> // batch IVFADC at full probe + deep refine ==
      // exact multi-query knn (q12b's SQL; coverage spec-verified)
      """SELECT query_id, vec_id, score, rnk FROM (
           SELECT a.vec_id AS query_id, b.vec_id AS vec_id,
             list_dot_product(CAST(a.embedding AS DOUBLE[]),
                              CAST(b.embedding AS DOUBLE[])) AS score,
             row_number() OVER (PARTITION BY a.vec_id
               ORDER BY list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])) DESC,
                        b.vec_id) AS rnk
           FROM embeddings a JOIN embeddings b
             ON a.vec_id < 5) WHERE rnk <= 3""",
    "q88_batch_ivfsq" -> // batch IVF-SQ at full probe + the SQ default
      // refine=2 == exact multi-query knn (q54's SQL; spec-verified)
      """SELECT query_id, vec_id, score, rnk FROM (
           SELECT a.vec_id AS query_id, b.vec_id AS vec_id,
             list_dot_product(CAST(a.embedding AS DOUBLE[]),
                              CAST(b.embedding AS DOUBLE[])) AS score,
             row_number() OVER (PARTITION BY a.vec_id
               ORDER BY list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])) DESC,
                        b.vec_id) AS rnk
           FROM embeddings a JOIN embeddings b
             ON a.vec_id < 5) WHERE rnk <= 3""",
    "q89_stream_retrieval" -> // streamed queries, stream-static cell join,
      // bounded vec_topk state, AvailableNow drain; FULL probe prunes
      // nothing and scoring is exact, so equality is deterministic at any
      // sf (no gate needed) — q54's SQL verbatim
      """SELECT query_id, vec_id, score, rnk FROM (
           SELECT a.vec_id AS query_id, b.vec_id AS vec_id,
             list_dot_product(CAST(a.embedding AS DOUBLE[]),
                              CAST(b.embedding AS DOUBLE[])) AS score,
             row_number() OVER (PARTITION BY a.vec_id
               ORDER BY list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])) DESC,
                        b.vec_id) AS rnk
           FROM embeddings a JOIN embeddings b
             ON a.vec_id < 5) WHERE rnk <= 3""",
    "q55_threshold_lsh" -> // cross-relation LSH threshold join == exact
      // at the pinned deep family (miss prob ~1.5e-5, exact verify bars
      // false positives; spec-verified equality)
      """SELECT a.vec_id AS query_id, b.vec_id AS vec_id,
         list_dot_product(CAST(a.embedding AS DOUBLE[]),
                          CAST(b.embedding AS DOUBLE[])) AS score
         FROM embeddings a JOIN embeddings b
           ON a.vec_id < 16
         WHERE list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                CAST(b.embedding AS DOUBLE[])) >= 0.4""",
    "q56_boilerplate" -> // md5 gram digests on both sides (the q39 mirror);
      // boiler_frac is exact integer division — no float-order drift
      """WITH tok AS (SELECT doc_id,
             list_filter(string_split_regex(text, '\s+'),
               x -> len(x) > 0) AS toks FROM documents),
         g AS (SELECT doc_id, md5(array_to_string(toks[s+1:s+3], ' ')) AS gram
               FROM tok, UNNEST(range(0, len(toks)-2)) AS t(s)
               WHERE len(toks) >= 3),
         freq AS (SELECT gram FROM (
             SELECT gram, count(DISTINCT doc_id) AS df FROM g GROUP BY gram)
           WHERE df >= 3)
         SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
           CAST(count(f.gram) AS BIGINT) AS n_boiler,
           CAST(count(f.gram) AS DOUBLE) / count(*) AS boiler_frac
         FROM g LEFT JOIN freq f ON g.gram = f.gram
         GROUP BY g.doc_id""",
    "q57_token_budget" -> // inclusive running token total per source,
      // ROWS frame (doc_id is unique, so the kept set is well-defined)
      """WITH tok AS (SELECT doc_id, source,
             CAST(len(list_filter(string_split_regex(text, '\s+'),
               x -> len(x) > 0)) AS BIGINT) AS n_tokens FROM documents),
         c AS (SELECT doc_id, source, n_tokens,
             sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING) AS cum FROM tok)
         SELECT doc_id, source, n_tokens FROM c WHERE cum <= 700""",
    "q58_packing" -> // the literal global-window mirror of the engine's
      // two-pass prefix sum; exclusive cum via 1 PRECEDING; integer-exact
      """WITH tok AS (SELECT doc_id,
             CAST(len(list_filter(string_split_regex(text, '\s+'),
               x -> len(x) > 0)) AS BIGINT) AS n_tokens FROM documents),
         c AS (SELECT doc_id, n_tokens,
             COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
           FROM tok)
         SELECT doc_id, n_tokens,
           CAST(cum // 2048 AS BIGINT) AS chunk,
           CAST(cum % 2048 AS BIGINT) AS chunk_offset,
           CAST(CASE WHEN n_tokens = 0 THEN 0 ELSE
             (cum + n_tokens - 1) // 2048 - cum // 2048 + 1 END AS BIGINT)
             AS n_chunks
         FROM c""",
    "q59_sq_topk" -> // two-stage SQ8 == exact top-k at refine=2 (candidate
      // coverage spec-verified), so the oracle is q11's exact-search SQL
      """SELECT b.vec_id AS vec_id,
         list_dot_product(CAST(a.embedding AS DOUBLE[]),
                          CAST(b.embedding AS DOUBLE[])) AS score
         FROM embeddings a JOIN embeddings b ON a.vec_id = 0
         ORDER BY score DESC, b.vec_id LIMIT 10""",
    "q87_ivfsq_topk" -> // IVF-SQ at full probe == exact top-k at the
      // default refine=2 (the q51/q59 construction), same exact-search SQL
      """SELECT b.vec_id AS vec_id,
         list_dot_product(CAST(a.embedding AS DOUBLE[]),
                          CAST(b.embedding AS DOUBLE[])) AS score
         FROM embeddings a JOIN embeddings b ON a.vec_id = 0
         ORDER BY score DESC, b.vec_id LIMIT 10""",
    "q60_interval_join" -> // the naive inequality join IS the oracle: tiny
      // at sf0.01, the scale killer the bucketed engine path avoids
      """SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
           c.event_id AS click_event_id, epoch_us(c.ts) AS click_ts_us,
           c.value AS click_value
         FROM (SELECT * FROM events WHERE event_type = 'error') e
         JOIN (SELECT * FROM events WHERE event_type = 'click') c
           ON e.user_id = c.user_id
          AND epoch_us(c.ts) >= epoch_us(e.ts) - 7200000000
          AND epoch_us(c.ts) <= epoch_us(e.ts) + 3600000000""",
    "q61_weighted_sample" -> // Efraimidis-Spirakis keys off the shared md5
      // hash; 52-bit u is double-exact on both sides, keys float-cast
      // before ranking (the q41 rule)
      """WITH tok AS (SELECT doc_id, lang,
             CAST(len(list_filter(string_split_regex(text, '\s+'),
               x -> len(x) > 0)) AS BIGINT) AS n_tokens FROM documents),
         k AS (SELECT doc_id, lang, n_tokens,
             CAST(pow((('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT
                 + 0.5) / 4503599627370496.0,
               1.0 / n_tokens) AS FLOAT) AS wkey
           FROM tok WHERE n_tokens >= 1)
         SELECT doc_id, lang, n_tokens FROM (
           SELECT doc_id, lang, n_tokens,
             row_number() OVER (PARTITION BY lang
               ORDER BY wkey DESC, doc_id) AS rn FROM k)
         WHERE rn <= 10""",
    "q62_quantile_gate" -> // exact type-7 percentiles at binary-exact
      // fractions (the q38 rule), inclusive band
      """WITH tok AS (SELECT doc_id, lang,
             CAST(len(list_filter(string_split_regex(text, '\s+'),
               x -> len(x) > 0)) AS BIGINT) AS n_tokens FROM documents),
         band AS (SELECT lang,
             quantile_cont(CAST(n_tokens AS DOUBLE), 0.25) AS qlo,
             quantile_cont(CAST(n_tokens AS DOUBLE), 0.75) AS qhi
           FROM tok GROUP BY lang)
         SELECT doc_id, tok.lang, n_tokens
         FROM tok JOIN band ON tok.lang = band.lang
         WHERE CAST(n_tokens AS DOUBLE) >= qlo
           AND CAST(n_tokens AS DOUBLE) <= qhi""",
    // q63 scans a COMPACTED rewrite of lineitem; compaction is content-
    // preserving, so the oracle is the same scan + aggregate over the
    // original table (float total absorbs summation-order drift — q50's
    // rule)
    "q63_compact_scan" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(l_quantity) AS FLOAT) AS total_qty
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1995-01-01'
           AND l_shipdate < TIMESTAMP '1996-01-01'
         GROUP BY l_returnflag""",
    "q64_markup_strip" -> // same regex chain, Java/RE2 shared subset (no
      // backrefs: script/style each get a literal close-tag pattern)
      """WITH aug AS (SELECT doc_id,
           '<html><head><style type="text/css">body { color: red }' ||
           '</style></head><body><h1>Doc ' || CAST(doc_id AS VARCHAR) ||
           '</h1><p>' || text ||
           '</p><script>var x = 1 < 2;</script>&nbsp;&#169;</body></html>'
             AS a FROM documents),
         s AS (SELECT doc_id, trim(regexp_replace(regexp_replace(
             regexp_replace(regexp_replace(regexp_replace(a,
               '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
               '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
               '(?s)<[^>]*>', ' ', 'g'),
               '(?i)&[a-z]+;|&#[0-9]+;', ' ', 'g'),
               '\s+', ' ', 'g')) AS clean FROM aug)
         SELECT doc_id, clean,
           CAST(len(list_filter(string_split_regex(clean, '\s+'),
             x -> len(x) > 0)) AS BIGINT) AS n_tokens
         FROM s""",
    "q65_unigram_score" -> // ln(c) - ln(total) per term on both sides;
      // float-cast mean absorbs summation-order drift (q29 rule)
      """WITH tok AS (SELECT doc_id,
             unnest(list_transform(list_filter(
               string_split_regex(text, '\s+'), x -> len(x) > 0),
               x -> lower(x))) AS term FROM documents),
         freq AS (SELECT term, CAST(count(*) AS DOUBLE) AS c
           FROM tok GROUP BY term),
         total AS (SELECT CAST(count(*) AS DOUBLE) AS t FROM tok),
         lp AS (SELECT term, ln(c) - ln(t) AS logp FROM freq, total)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(avg(logp) AS FLOAT) AS avg_logprob
         FROM tok JOIN lp USING (term) GROUP BY doc_id""",
    "q66_chunk_docs" -> // 32-token windows striding 24; range() mirrors
      // the engine's sequence() starts, slices clamp at the tail
      """WITH tok AS (SELECT doc_id,
             list_filter(string_split_regex(text, '\s+'),
               x -> len(x) > 0) AS toks FROM documents),
         c AS (SELECT doc_id, CAST(s / 24 AS BIGINT) AS chunk_id,
               array_to_string(toks[s+1:s+32], ' ') AS chunk,
               CAST(len(toks[s+1:s+32]) AS BIGINT) AS n_tokens
               FROM tok, UNNEST(range(0, len(toks), 24)) AS t(s)
               WHERE len(toks) > 0)
         SELECT doc_id, chunk_id, chunk, n_tokens FROM c""",
    "q67_pivot" -> // FILTERed aggregation mirrors the pinned-values pivot;
      // float-cast value sums absorb summation-order drift (q29 rule)
      """SELECT strftime(ts, '%Y-%m-%d') AS day,
         CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click_n,
         CAST(sum(value) FILTER (WHERE event_type = 'click') AS FLOAT) AS click_val,
         CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS error_n,
         CAST(sum(value) FILTER (WHERE event_type = 'error') AS FLOAT) AS error_val,
         CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase_n,
         CAST(sum(value) FILTER (WHERE event_type = 'purchase') AS FLOAT) AS purchase_val,
         CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS signup_n,
         CAST(sum(value) FILTER (WHERE event_type = 'signup') AS FLOAT) AS signup_val,
         CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS view_n,
         CAST(sum(value) FILTER (WHERE event_type = 'view') AS FLOAT) AS view_val
         FROM events GROUP BY 1""",
    "q68_retention" -> // same lag-window formulation; date_diff guards the
      // DATE-minus-DATE representation difference across engines
      """WITH d AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
             FROM events),
         l AS (SELECT day, user_id,
             lag(day) OVER (PARTITION BY user_id ORDER BY day) AS prev
             FROM d)
         SELECT strftime(day, '%Y-%m-%d') AS day,
           CAST(count(*) AS BIGINT) AS active,
           CAST(count(CASE WHEN date_diff('day', prev, day) = 1 THEN 1 END)
             AS BIGINT) AS retained,
           CAST(CAST(count(CASE WHEN date_diff('day', prev, day) = 1 THEN 1
             END) AS DOUBLE) / count(*) AS FLOAT) AS rate
         FROM l GROUP BY day""",
    "q69_postings" -> // same bigram construction; string_agg ORDER BY
      // mirrors the engine's sorted comma-joined postings
      """WITH toks AS (SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'),
               x -> len(x) > 0) AS tk FROM documents),
         big0 AS (SELECT doc_id, unnest(list_transform(range(1, len(tk)),
             i -> tk[i] || ' ' || tk[i+1])) AS term FROM toks),
         big AS (SELECT DISTINCT doc_id, term FROM big0),
         dfc AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM big
             GROUP BY term HAVING count(*) BETWEEN 5 AND 60)
         SELECT term, df,
           string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
             AS postings
         FROM big JOIN dfc USING (term) GROUP BY term, df""",
    "q70_funnel" -> // identical chained conditional-min windows; epoch
      // micros so both engines compare at the same precision
      """WITH e0 AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us
             FROM events),
         e1 AS (SELECT *, min(CASE WHEN event_type = 'signup' THEN ts_us END)
             OVER (PARTITION BY user_id) AS s1 FROM e0),
         e2 AS (SELECT *, min(CASE WHEN event_type = 'view'
               AND ts_us > s1 THEN ts_us END)
             OVER (PARTITION BY user_id) AS s2 FROM e1),
         e3 AS (SELECT *, min(CASE WHEN event_type = 'click'
               AND ts_us > s2 THEN ts_us END)
             OVER (PARTITION BY user_id) AS s3 FROM e2),
         e4 AS (SELECT *, min(CASE WHEN event_type = 'purchase'
               AND ts_us > s3 THEN ts_us END)
             OVER (PARTITION BY user_id) AS s4 FROM e3)
         SELECT
           CAST(count(DISTINCT CASE WHEN s1 IS NOT NULL THEN user_id END)
             AS BIGINT) AS n_signup,
           CAST(count(DISTINCT CASE WHEN s2 IS NOT NULL THEN user_id END)
             AS BIGINT) AS n_view,
           CAST(count(DISTINCT CASE WHEN s3 IS NOT NULL THEN user_id END)
             AS BIGINT) AS n_click,
           CAST(count(DISTINCT CASE WHEN s4 IS NOT NULL THEN user_id END)
             AS BIGINT) AS n_purchase
         FROM e4""",
    "q71_heavy_hitters" -> // capacity 64 > the 31-term vocabulary, so the
      // MG sketch is exact and the plain top-10 is the oracle
      """WITH tok AS (SELECT
             unnest(list_transform(list_filter(string_split_regex(text,
               '\s+'), x -> len(x) > 0), x -> lower(x))) AS term
             FROM documents)
         SELECT term, CAST(count(*) AS BIGINT) AS n FROM tok
         GROUP BY term ORDER BY n DESC, term LIMIT 10""",
    "q90_stream_heavy_hitters" -> // MG sketch as streaming state; exact
      // regime (capacity 64 > 31-term vocabulary, no evictions, merge
      // order immaterial) so q71's exact top-10 SQL applies verbatim
      """WITH tok AS (SELECT
             unnest(list_transform(list_filter(string_split_regex(text,
               '\s+'), x -> len(x) > 0), x -> lower(x))) AS term
             FROM documents)
         SELECT term, CAST(count(*) AS BIGINT) AS n FROM tok
         GROUP BY term ORDER BY n DESC, term LIMIT 10""",
    "q91_copurchase" -> // basket equi-join pair mining, exact counts
      """WITH bi AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
             FROM lineitem)
         SELECT x.i AS item_a, y.i AS item_b,
           CAST(count(*) AS BIGINT) AS support
         FROM bi x JOIN bi y ON x.b = y.b AND x.i < y.i
         GROUP BY 1, 2 HAVING count(*) >= 2""",
    "q92_triangles" -> // literal three-way self-join triangle mirror;
      // counts are exact integers, coeff is the identical double
      // expression 2.0 * t / (d * (d - 1.0)) on both engines
      """WITH bi AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
             FROM lineitem),
         e AS (SELECT DISTINCT x.i AS u, y.i AS v
               FROM bi x JOIN bi y ON x.b = y.b AND x.i < y.i),
         deg AS (SELECT n, CAST(count(*) AS BIGINT) AS d FROM
                 (SELECT u AS n FROM e UNION ALL SELECT v FROM e)
                 GROUP BY n),
         tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
                 FROM e e1 JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
                 JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v),
         tn AS (SELECT n, CAST(count(*) AS BIGINT) AS t FROM
                (SELECT a AS n FROM tri UNION ALL SELECT b FROM tri
                 UNION ALL SELECT c FROM tri) GROUP BY n)
         SELECT deg.n AS part, deg.d AS degree,
           COALESCE(tn.t, 0) AS n_tri,
           CASE WHEN deg.d >= 2
             THEN 2.0 * COALESCE(tn.t, 0) / (deg.d * (deg.d - 1.0))
             ELSE 0.0 END AS coeff
         FROM deg LEFT JOIN tn ON tn.n = deg.n""",
    "q93_rollup" -> // one-pass ROLLUP; sentinel-coalesced markers, float
      // cast absorbs the grand-total double fold order (q29 rule)
      """WITH e AS (SELECT event_type,
             strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, value
             FROM events)
         SELECT COALESCE(event_type, '(all)') AS event_type,
           COALESCE(day, '(all)') AS day,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(value) AS FLOAT) AS sum_value
         FROM e GROUP BY ROLLUP (event_type, day)""",
    "q94_pagerank" -> // 5 unrolled iterations of the identical per-node
      // arithmetic; float cast absorbs double fold order (q29 rule)
      """WITH bi AS MATERIALIZED (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
             FROM lineitem),
         und AS MATERIALIZED (SELECT DISTINCT x.i AS u, y.i AS v
                 FROM bi x JOIN bi y ON x.b = y.b AND x.i < y.i),
         dir AS MATERIALIZED (SELECT u, v FROM und UNION ALL SELECT v, u FROM und),
         deg AS MATERIALIZED (SELECT u AS n, CAST(count(*) AS BIGINT) AS d FROM dir
                 GROUP BY u),
         cnt AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS nn FROM deg),
         r0 AS MATERIALIZED (SELECT n, 1.0 / (SELECT nn FROM cnt) AS r FROM deg),
         s1 AS MATERIALIZED (SELECT dir.v AS n, sum(r0.r / deg.d) AS s FROM dir
                JOIN deg ON deg.n = dir.u JOIN r0 ON r0.n = dir.u
                GROUP BY dir.v),
         r1 AS MATERIALIZED (SELECT deg.n, (1 - 0.85) / (SELECT nn FROM cnt)
                  + 0.85 * COALESCE(s1.s, 0) AS r
                FROM deg LEFT JOIN s1 ON s1.n = deg.n),
         s2 AS MATERIALIZED (SELECT dir.v AS n, sum(r1.r / deg.d) AS s FROM dir
                JOIN deg ON deg.n = dir.u JOIN r1 ON r1.n = dir.u
                GROUP BY dir.v),
         r2 AS MATERIALIZED (SELECT deg.n, (1 - 0.85) / (SELECT nn FROM cnt)
                  + 0.85 * COALESCE(s2.s, 0) AS r
                FROM deg LEFT JOIN s2 ON s2.n = deg.n),
         s3 AS MATERIALIZED (SELECT dir.v AS n, sum(r2.r / deg.d) AS s FROM dir
                JOIN deg ON deg.n = dir.u JOIN r2 ON r2.n = dir.u
                GROUP BY dir.v),
         r3 AS MATERIALIZED (SELECT deg.n, (1 - 0.85) / (SELECT nn FROM cnt)
                  + 0.85 * COALESCE(s3.s, 0) AS r
                FROM deg LEFT JOIN s3 ON s3.n = deg.n),
         s4 AS MATERIALIZED (SELECT dir.v AS n, sum(r3.r / deg.d) AS s FROM dir
                JOIN deg ON deg.n = dir.u JOIN r3 ON r3.n = dir.u
                GROUP BY dir.v),
         r4 AS MATERIALIZED (SELECT deg.n, (1 - 0.85) / (SELECT nn FROM cnt)
                  + 0.85 * COALESCE(s4.s, 0) AS r
                FROM deg LEFT JOIN s4 ON s4.n = deg.n),
         s5 AS MATERIALIZED (SELECT dir.v AS n, sum(r4.r / deg.d) AS s FROM dir
                JOIN deg ON deg.n = dir.u JOIN r4 ON r4.n = dir.u
                GROUP BY dir.v),
         r5 AS MATERIALIZED (SELECT deg.n, (1 - 0.85) / (SELECT nn FROM cnt)
                  + 0.85 * COALESCE(s5.s, 0) AS r
                FROM deg LEFT JOIN s5 ON s5.n = deg.n)
         SELECT n AS part, CAST(r AS FLOAT) AS rank FROM r5""",
    "q95_constraints" -> // exact violation counts; FK checks as NOT
      // EXISTS on non-null keys, pk check counts dup + null key tuples
      """SELECT 'pk_orders_unique' AS chk,
           CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
             AS violations FROM orders
         UNION ALL
         SELECT 'pk_customer_unique',
           CAST(count(*) - count(DISTINCT c_custkey) AS BIGINT)
           FROM customer
         UNION ALL
         SELECT 'fk_lineitem_orders', CAST(count(*) AS BIGINT)
           FROM lineitem l WHERE l.l_orderkey IS NOT NULL
             AND NOT EXISTS (SELECT 1 FROM orders o
                             WHERE o.o_orderkey = l.l_orderkey)
         UNION ALL
         SELECT 'fk_orders_customer', CAST(count(*) AS BIGINT)
           FROM orders o WHERE o.o_custkey IS NOT NULL
             AND NOT EXISTS (SELECT 1 FROM customer c
                             WHERE c.c_custkey = o.o_custkey)
         UNION ALL
         SELECT 'notnull_o_orderdate',
           CAST(count(*) FILTER (WHERE o_orderdate IS NULL) AS BIGINT)
           FROM orders
         UNION ALL
         SELECT 'pos_o_totalprice',
           CAST(count(*) FILTER (WHERE NOT COALESCE(o_totalprice > 0,
             FALSE)) AS BIGINT) FROM orders
         UNION ALL
         SELECT 'range_l_quantity',
           CAST(count(*) FILTER (WHERE NOT COALESCE(l_quantity >= 1
             AND l_quantity <= 50, FALSE)) AS BIGINT) FROM lineitem""",
    "q96_scd2" -> // identical two-stage window: lag change flag over
      // (us, value)-ordered history, lead over surviving change points;
      // epoch micros, integer-exact
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us
             FROM events),
         c AS (SELECT user_id, event_type, us FROM (
             SELECT user_id, event_type, us,
               lag(event_type) OVER (PARTITION BY user_id
                 ORDER BY us, event_type) AS prev FROM e)
           WHERE prev IS NULL OR prev <> event_type)
         SELECT user_id, event_type, us AS valid_from,
           COALESCE(lead(us) OVER (PARTITION BY user_id
             ORDER BY us, event_type), -1) AS valid_to
         FROM c""",
    "q97_edge_jaccard" -> // common neighbors per edge = triangles through
      // the edge (three-way self-join mirror); jaccard is the identical
      // integer-valued-double expression on both engines
      """WITH bi AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
             FROM lineitem),
         e AS (SELECT DISTINCT x.i AS u, y.i AS v
               FROM bi x JOIN bi y ON x.b = y.b AND x.i < y.i),
         deg AS (SELECT n, CAST(count(*) AS BIGINT) AS d FROM
                 (SELECT u AS n FROM e UNION ALL SELECT v FROM e)
                 GROUP BY n),
         tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
                 FROM e e1 JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
                 JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v),
         te AS (SELECT eu, ev, CAST(count(*) AS BIGINT) AS c FROM (
                SELECT a AS eu, b AS ev FROM tri
                UNION ALL SELECT a, c FROM tri
                UNION ALL SELECT b, c FROM tri) GROUP BY eu, ev)
         SELECT e.u AS part_a, e.v AS part_b,
           COALESCE(te.c, 0) AS common,
           CASE WHEN du.d + dv.d - 2 - COALESCE(te.c, 0) > 0
             THEN COALESCE(te.c, 0)
               / (du.d + dv.d - 2.0 - COALESCE(te.c, 0))
             ELSE 0.0 END AS jaccard
         FROM e JOIN deg du ON du.n = e.u JOIN deg dv ON dv.n = e.v
         LEFT JOIN te ON te.eu = e.u AND te.ev = e.v""",
    "q98_association_rules" -> // exact basket counts; ratios divide
      // integer-valued doubles (N and ca cast to double BEFORE the
      // products, mirroring the overflow-safe Spark shape)
      """WITH bi AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
             FROM lineitem),
         nb AS (SELECT CAST(count(DISTINCT b) AS BIGINT) AS n FROM bi),
         ic AS (SELECT i, CAST(count(*) AS BIGINT) AS ci FROM bi
                GROUP BY i),
         p AS (SELECT x.i AS item_a, y.i AS item_b,
                 CAST(count(*) AS BIGINT) AS support
               FROM bi x JOIN bi y ON x.b = y.b AND x.i < y.i
               GROUP BY 1, 2 HAVING count(*) >= 2)
         SELECT p.item_a, p.item_b, p.support,
           p.support / CAST(ca.ci AS DOUBLE) AS conf_ab,
           p.support / CAST(cb.ci AS DOUBLE) AS conf_ba,
           CAST((SELECT n FROM nb) AS DOUBLE) * p.support
             / (CAST(ca.ci AS DOUBLE) * cb.ci) AS lift
         FROM p JOIN ic ca ON ca.i = p.item_a
         JOIN ic cb ON cb.i = p.item_b""",
    "q99_transitions" -> // identical lag + count + normalizing window;
      // (us, type) ordering makes ties total; exact-count ratios
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us
             FROM events),
         l AS (SELECT event_type,
             lag(event_type) OVER (PARTITION BY user_id
               ORDER BY us, event_type) AS prev FROM e),
         c AS (SELECT prev AS prev_type, event_type AS next_type,
             CAST(count(*) AS BIGINT) AS n FROM l
             WHERE prev IS NOT NULL GROUP BY 1, 2)
         SELECT prev_type, next_type, n,
           n / CAST(sum(n) OVER (PARTITION BY prev_type) AS DOUBLE) AS p
         FROM c""",
    "q100_recommend" -> // q98's metrics symmetrized + total-order top-3
      // per item; identical doubles rank identically on both engines
      """WITH bi AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
             FROM lineitem),
         nb AS (SELECT CAST(count(DISTINCT b) AS BIGINT) AS n FROM bi),
         ic AS (SELECT i, CAST(count(*) AS BIGINT) AS ci FROM bi
                GROUP BY i),
         p AS (SELECT x.i AS item_a, y.i AS item_b,
                 CAST(count(*) AS BIGINT) AS support
               FROM bi x JOIN bi y ON x.b = y.b AND x.i < y.i
               GROUP BY 1, 2 HAVING count(*) >= 2),
         m AS (SELECT p.item_a, p.item_b,
                 CAST((SELECT n FROM nb) AS DOUBLE) * p.support
                   / (CAST(ca.ci AS DOUBLE) * cb.ci) AS lift,
                 p.support / CAST(ca.ci AS DOUBLE) AS conf_ab,
                 p.support / CAST(cb.ci AS DOUBLE) AS conf_ba
               FROM p JOIN ic ca ON ca.i = p.item_a
               JOIN ic cb ON cb.i = p.item_b),
         s AS (SELECT item_a AS item, item_b AS rec, lift,
                 conf_ab AS conf FROM m
               UNION ALL
               SELECT item_b, item_a, lift, conf_ba FROM m),
         r AS (SELECT item, rec, lift, conf,
                 CAST(row_number() OVER (PARTITION BY item
                   ORDER BY lift DESC, conf DESC, rec) AS BIGINT) AS rnk
               FROM s)
         SELECT item, rec, lift, conf, rnk FROM r WHERE rnk <= 3""",
    "q101_cohorts" -> // identical distinct-week collapse + min-week
      // cohort + exact day arithmetic (Monday-to-Monday, /7 divides
      // evenly; both engines truncate to ISO weeks)
      """WITH wk AS (SELECT DISTINCT user_id AS u,
             CAST(date_trunc('week', ts) AS DATE) AS wk FROM events),
         f AS (SELECT u, min(wk) AS cohort_week FROM wk GROUP BY u)
         SELECT f.cohort_week,
           CAST((wk.wk - f.cohort_week) / 7 AS BIGINT) AS week_offset,
           CAST(count(*) AS BIGINT) AS n_users
         FROM wk JOIN f ON f.u = wk.u
         GROUP BY 1, 2""",
    "q102_sliding_windows" -> // the 2h/1h sliding generator written out:
      // every event joins its own hour's window and the previous one
      """WITH e AS (SELECT date_trunc('hour', ts) AS h, value FROM events),
         x AS (SELECT h AS ws, value FROM e
               UNION ALL
               SELECT h - INTERVAL 1 HOUR, value FROM e)
         SELECT strftime(ws, '%Y-%m-%d %H:00') AS window_start,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(value) AS FLOAT) AS sum_value
         FROM x GROUP BY 1""",
    "q103_cdc_merge" -> // the merge semantics written out directly:
      // deletes win, updates apply off the delete set, inserts shift keys
      """SELECT o_orderkey, o_custkey,
           CAST(o_totalprice AS FLOAT) AS o_totalprice, o_orderstatus
         FROM orders WHERE o_orderkey % 17 <> 0 AND o_orderkey % 10 <> 0
         UNION ALL
         SELECT o_orderkey, o_custkey,
           CAST(o_totalprice * 1.1 AS FLOAT), o_orderstatus
         FROM orders WHERE o_orderkey % 10 = 0 AND o_orderkey % 17 <> 0
         UNION ALL
         SELECT o_orderkey + 10000000, o_custkey,
           CAST(o_totalprice AS FLOAT), o_orderstatus
         FROM orders WHERE o_orderkey % 23 = 0""",
    "q72_mixture" -> // same rollup-then-window construction; float casts
      // absorb the tiny window-sum fold order (q29 rule)
      """WITH d AS (SELECT source,
             CAST(len(list_filter(string_split_regex(text, '\s+'),
               x -> len(x) > 0)) AS BIGINT) AS n_tokens FROM documents),
         s AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tokens) AS BIGINT) AS tokens FROM d GROUP BY source),
         w AS (SELECT *, CAST(tokens AS DOUBLE) / sum(tokens) OVER ()
             AS share FROM s),
         v AS (SELECT *, sqrt(share) AS wr FROM w)
         SELECT source, n_docs, tokens, CAST(share AS FLOAT) AS share,
           CAST(wr / sum(wr) OVER () AS FLOAT) AS weight FROM v""",
    "q73_quality_deciles" -> // q65's scoring pipeline, then rank-exact
      // ntile; (score, doc_id) tiebreak makes the order total so both
      // engines bin identically
      """WITH tok AS (SELECT doc_id,
             unnest(list_transform(list_filter(
               string_split_regex(text, '\s+'), x -> len(x) > 0),
               x -> lower(x))) AS term FROM documents),
         freq AS (SELECT term, CAST(count(*) AS DOUBLE) AS c
           FROM tok GROUP BY term),
         total AS (SELECT CAST(count(*) AS DOUBLE) AS t FROM tok),
         lp AS (SELECT term, ln(c) - ln(t) AS logp FROM freq, total),
         scored AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(avg(logp) AS FLOAT) AS avg_logprob
           FROM tok JOIN lp USING (term) GROUP BY doc_id),
         b AS (SELECT *, CAST(ntile(10) OVER (ORDER BY avg_logprob, doc_id)
             AS BIGINT) AS decile FROM scored)
         SELECT decile, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS tokens,
           CAST(avg(avg_logprob) AS FLOAT) AS mean_score
         FROM b GROUP BY decile""",
    "q74_profile" -> // one UNION ALL branch per profiled column; numeric
      // min/max as doubles, string as strings (the other pair null)
      """SELECT 'o_orderkey' AS col_name,
           CAST(count(o_orderkey) AS BIGINT) AS non_nulls,
           CAST(count(*) - count(o_orderkey) AS BIGINT) AS nulls,
           CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
           CAST(min(o_orderkey) AS DOUBLE) AS min_num,
           CAST(max(o_orderkey) AS DOUBLE) AS max_num,
           CAST(NULL AS VARCHAR) AS min_str,
           CAST(NULL AS VARCHAR) AS max_str FROM orders
         UNION ALL
         SELECT 'o_totalprice',
           CAST(count(o_totalprice) AS BIGINT),
           CAST(count(*) - count(o_totalprice) AS BIGINT),
           CAST(count(DISTINCT o_totalprice) AS BIGINT),
           CAST(min(o_totalprice) AS DOUBLE),
           CAST(max(o_totalprice) AS DOUBLE),
           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR) FROM orders
         UNION ALL
         SELECT 'o_orderstatus',
           CAST(count(o_orderstatus) AS BIGINT),
           CAST(count(*) - count(o_orderstatus) AS BIGINT),
           CAST(count(DISTINCT o_orderstatus) AS BIGINT),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           min(o_orderstatus), max(o_orderstatus) FROM orders
         UNION ALL
         SELECT 'o_orderpriority',
           CAST(count(o_orderpriority) AS BIGINT),
           CAST(count(*) - count(o_orderpriority) AS BIGINT),
           CAST(count(DISTINCT o_orderpriority) AS BIGINT),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           min(o_orderpriority), max(o_orderpriority) FROM orders""",
    "q75_histogram" -> // identical double bin math on both sides; the
      // right edge clamps into the last bin
      """WITH b AS (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi
             FROM orders),
         h AS (SELECT least(CAST(floor((o_totalprice - lo) /
                 ((hi - lo) / 20.0)) AS BIGINT), 19) AS bin, lo, hi
             FROM orders, b WHERE o_totalprice IS NOT NULL)
         SELECT bin, lo + bin * ((hi - lo) / 20.0) AS bin_lo,
           lo + (bin + 1) * ((hi - lo) / 20.0) AS bin_hi,
           CAST(count(*) AS BIGINT) AS n
         FROM h GROUP BY bin, lo, hi""",
    "q76_diff" -> // value-level compare mirrors the engine's digest
      // compare (equal digests == equal casted values); +1.0 on a double
      // is exact in both engines
      """WITH after AS (
           SELECT o_orderkey,
             o_totalprice + CASE WHEN o_orderkey % 89 = 0 THEN 1.0
               ELSE 0.0 END AS o_totalprice,
             o_orderstatus, o_orderpriority
           FROM orders WHERE o_orderkey % 97 <> 0
           UNION ALL
           SELECT o_orderkey + 10000000, o_totalprice,
             o_orderstatus, o_orderpriority
           FROM orders WHERE o_orderkey % 83 = 0),
         j AS (SELECT
             coalesce(b.o_orderkey, a.o_orderkey) AS o_orderkey,
             CASE WHEN b.o_orderkey IS NULL THEN 'added'
                  WHEN a.o_orderkey IS NULL THEN 'removed'
                  WHEN b.o_totalprice IS DISTINCT FROM a.o_totalprice
                    OR b.o_orderstatus IS DISTINCT FROM a.o_orderstatus
                    OR b.o_orderpriority IS DISTINCT FROM a.o_orderpriority
                    THEN 'changed'
                  ELSE 'unchanged' END AS status
           FROM orders b FULL OUTER JOIN after a
             ON b.o_orderkey = a.o_orderkey)
         SELECT o_orderkey, status FROM j WHERE status <> 'unchanged'""",
    "q78_session_funnel" -> // q42's session CTEs + q70's chained stage
      // windows, partitioned by (user, session); DISTINCT collapse then
      // plain conditional counts, mirroring the engine
      """WITH lagd AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id
               ORDER BY epoch_us(ts)) AS prev
           FROM events),
         flag AS (SELECT user_id, event_type, ts_us,
             CASE WHEN prev IS NULL OR ts_us - prev > 1800000000
                  THEN 1 ELSE 0 END AS new_s FROM lagd),
         sess AS (SELECT user_id, event_type, ts_us,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us
               ROWS UNBOUNDED PRECEDING) AS sid FROM flag),
         e1 AS (SELECT *, min(CASE WHEN event_type = 'view' THEN ts_us END)
             OVER (PARTITION BY user_id, sid) AS s1 FROM sess),
         e2 AS (SELECT *, min(CASE WHEN event_type = 'click'
               AND ts_us > s1 THEN ts_us END)
             OVER (PARTITION BY user_id, sid) AS s2 FROM e1),
         e3 AS (SELECT *, min(CASE WHEN event_type = 'purchase'
               AND ts_us > s2 THEN ts_us END)
             OVER (PARTITION BY user_id, sid) AS s3 FROM e2),
         k AS (SELECT DISTINCT user_id, sid, s1, s2, s3 FROM e3)
         SELECT CAST(count(CASE WHEN s1 IS NOT NULL THEN 1 END) AS BIGINT)
             AS n_view,
           CAST(count(CASE WHEN s2 IS NOT NULL THEN 1 END) AS BIGINT)
             AS n_click,
           CAST(count(CASE WHEN s3 IS NOT NULL THEN 1 END) AS BIGINT)
             AS n_purchase
         FROM k""",
    "q79_hard_negatives" -> // q12b's self-kept ranking, offset past the
      // self match (rank 1) and the positive (rank 2)
      """SELECT query_id, negative_id, score,
           CAST(rnk - 2 AS BIGINT) AS neg_rank FROM (
           SELECT a.vec_id AS query_id, b.vec_id AS negative_id,
             list_dot_product(CAST(a.embedding AS DOUBLE[]),
                              CAST(b.embedding AS DOUBLE[])) AS score,
             row_number() OVER (PARTITION BY a.vec_id
               ORDER BY list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])) DESC,
                        b.vec_id) AS rnk
           FROM embeddings a JOIN embeddings b ON a.vec_id < 8)
         WHERE rnk BETWEEN 3 AND 6""",
    "q81_sql_vec_topk" -> // pure-SQL flagship search == q11's oracle: the
      // vec_topk aggregate must reproduce ORDER BY score DESC, id LIMIT k
      """SELECT b.vec_id AS vec_id,
         list_dot_product(CAST(a.embedding AS DOUBLE[]),
                          CAST(b.embedding AS DOUBLE[])) AS score
         FROM embeddings a JOIN embeddings b ON a.vec_id = 0
         ORDER BY score DESC, b.vec_id LIMIT 10""",
    "q82_stream_hourly" -> // the streaming windowed aggregation drained
      // with AvailableNow == the batch hourly rollup, split by event_type
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
         event_type, CAST(count(*) AS BIGINT) AS n, sum(value) AS sum_value
         FROM events GROUP BY 1, 2""",
    "q84_stream_sessionize" -> // q42's FULL session set (sentinel-flushed
      // AvailableNow drain — see q84StreamSessionize), without the sid
      """WITH lagd AS (SELECT user_id, ts, value,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
           FROM events),
         flag AS (SELECT user_id, ts, value,
             CASE WHEN prev IS NULL
                    OR epoch_us(ts) - epoch_us(prev) > 1800000000
                  THEN 1 ELSE 0 END AS new_s FROM lagd),
         sess AS (SELECT user_id, ts, value,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
               ROWS UNBOUNDED PRECEDING) AS sid FROM flag)
         SELECT user_id,
           min(epoch_us(ts)) AS session_start_us,
           max(epoch_us(ts)) AS session_end_us,
           CAST(count(*) AS BIGINT) AS n_events,
           sum(value) AS sum_value
         FROM sess GROUP BY user_id, sid""",
    "q85_stream_interval_join" -> // q60's oracle verbatim: a single
      // AvailableNow batch holds the watermark at zero, so the
      // stream-stream join buffers everything and emits the full result
      """SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
           c.event_id AS click_event_id, epoch_us(c.ts) AS click_ts_us,
           c.value AS click_value
         FROM (SELECT * FROM events WHERE event_type = 'error') e
         JOIN (SELECT * FROM events WHERE event_type = 'click') c
           ON e.user_id = c.user_id
          AND epoch_us(c.ts) >= epoch_us(e.ts) - 7200000000
          AND epoch_us(c.ts) <= epoch_us(e.ts) + 3600000000""",
    "q86_stream_dedup" -> // streaming first-occurrence dedup: survivor ids
      // are processing-order semantics, the surviving digest SET is exact
      """SELECT DISTINCT md5(text) AS fp FROM documents""") ++
      goldenOracles(dir) ++
      // q83 runs the bloom-prefiltered two-phase plan against q45's SQL
      // VERBATIM: approximate-then-confirm must be bit-identical to exact
      Map("q83_decontam_bloom" ->
        """WITH tok AS (SELECT doc_id, source,
             list_filter(string_split_regex(text, '\s+'),
               x -> len(x) > 0) AS toks FROM documents),
         g AS (SELECT doc_id, source,
               array_to_string(toks[s+1:s+4], ' ') AS gram
               FROM tok, UNNEST(range(0, len(toks)-3)) AS t(s)
               WHERE len(toks) >= 4),
         ev AS (SELECT DISTINCT gram FROM g WHERE source = 'src0'),
         tr AS (SELECT doc_id, gram FROM g WHERE source <> 'src0')
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_contam_spans,
           CAST(count(DISTINCT gram) AS BIGINT) AS n_contam_grams
         FROM tr JOIN ev USING (gram) GROUP BY doc_id""")
    // q13b (LSH candidate recall is total) and q44 (two-stage PQ covers the
    // exact top-k at the pinned refine depth) assert approximate-path ==
    // exact-path equality that was verified on the sf0.01 fixture; at a
    // different sf the claim is probabilistic, so omit the oracle (driver
    // records a rows-only check) rather than alarm on an expected ANN miss.
    if (graft.queries.GoldenOracles.sfPinned(dir)) base
    else (base -- Seq("q13b_embed_dedup_lsh", "q44_pq_topk",
      "q51_ivfpq_topk", "q54_batch_ivfpq", "q55_threshold_lsh",
      "q59_sq_topk", "q87_ivfsq_topk", "q88_batch_ivfsq")) ++ Map(
      // At non-pinned dirs the three exact-Jaccard rows swap their
      // deliberately-naive all-pairs oracle for the mask-grouped
      // formulation below (VERDICT r9 task 4): at sf1 the quadratic SQL
      // is a 1.25e9 list_intersect pair scan that exceeds any sane
      // DuckDB budget, so the rows previously had no 10x hash check at
      // all ("engine finished, oracle timed out"). r10 first shipped a
      // PPJoin prefix-filter form (Xiao/Wang/Lin/Yu, WWW 2008; verified
      // row-identical at sf0.01 — 9,020 pairs — and sf0.1 — 964,854
      // pairs) but on this fixture's 31-token vocabulary the prefix
      // filter only bought 2.8x (93 vs 260 s at sf0.1), which still
      // breaches the sf1 budget; the bitmask form (see maskPairsCtes)
      // exploits the same measured degeneracy exactly and is verified
      // row-identical at both dirs too. The pinned sf0.01 gate keeps
      // the independent quadratic form.
      "q15_jaccard_pairs" -> bandedJaccardPairsSql,
      "q20b_minhash_exact" -> bandedJaccardPairsSql,
      "q34_dedup_pipeline" -> bandedDedupPipelineSql,
      // Round 10: the r10 sf1 gate surfaced FOUR more rows whose oracles
      // embed the same deliberately-quadratic all-pairs scans (the r9
      // tally's prose never enumerated them): q106/q112 (150k x 150k
      // levenshtein nested loop — the length-band predicate cannot hash),
      // q107 (500k x 500k directed containment), q108/q115 (the q15
      // all-pairs CTE feeding reachability). Same treatment, same
      // losslessness standard: deletion-neighborhood blocking for edit
      // distance <= 1 (FastSS, Bocek et al. 2007 — dist(a,b) <= 1 iff
      // D<=1(a) ∩ D<=1(b) is nonempty, with the string itself in D0)
      // for q106/q112, and token-set bitmask grouping for q107 (the
      // 31-token fixture vocabulary defeats prefix filtering but makes
      // every doc set one BIGINT — see bandedContainmentSql).
      // Verified row-identical to the quadratic forms at sf0.01 + sf0.1;
      // the pinned sf0.01 gate keeps the independent quadratic forms.
      "q106_fuzzy_names" -> bandedFuzzyNamesSql,
      "q112_sql_fuzzy" -> bandedFuzzyNamesSql,
      "q107_containment" -> bandedContainmentSql,
      "q108_leak_split" -> bandedLeakSplitSql,
      "q115_keep_best" -> bandedKeepBestSql)
  }

  /** Number of 64-bit words in the token-set mask vector: 512-token
    * capacity. The /root/testdata fixtures carry 31 distinct tokens;
    * ScaleUp's text perturbation mints per-replica token variants, so
    * target/sf1 carries 310 (measured). The vocab CTE raises a loud
    * DuckDB error() past 512 rather than silently truncating. */
  private val maskWords = 8

  /** Per-word mask columns `m0..m7` for the doc's token set: word i
    * holds vocabulary positions [64i, 64i+64). DuckDB range-checks
    * `1::UBIGINT << 63`, so the bit is built in HUGEINT and cast. */
  private def maskCols: String =
    (0 until maskWords).map { i =>
      s"bit_or(CASE WHEN v.pos // 64 = $i THEN " +
        s"(1::HUGEINT << (v.pos % 64))::UBIGINT ELSE 0::UBIGINT END) AS m$i"
    }.mkString(",\n           ")

  /** `bit_count(a.m0 OP b.m0) + ...` over the word vector. */
  private def popcnt(a: String, b: String, op: String): String =
    (0 until maskWords)
      .map(i => s"bit_count($a.m$i $op $b.m$i)")
      .mkString("(", " + ", ")")

  /** Shared mask-based exact-Jaccard pair CTE chain (threshold 0.9),
    * exposing `bpairs(id_a, id_b, jaccard)`, `id_a < id_b`. Same
    * bitmask device as [[bandedContainmentSql]]: the corpus vocabulary
    * is tiny (31 tokens in the fixtures, 310 at the ScaleUp'd sf1 —
    * the degeneracy the q113 contract documents), so each doc's token
    * set is one 8-word (512-token) bit vector and the pair filter is
    * popcount arithmetic over distinct-mask pairs (3,935 at sf0.1;
    * 39,350 at sf1) before expanding back to doc pairs. This REPLACES
    * the r10 PPJoin prefix-filter form at non-pinned dirs: PPJoin is
    * lossless (Xiao et al., WWW 2008) but on a degenerate vocabulary
    * the prefix tokens keep df ~ N/|V|, so its candidate set stays
    * ~quadratic (sf0.1: 93 s vs quad 260 s — only 2.8x; extrapolated
    * ~x100 at sf1 it breaches the 1800 s oracle budget the banded
    * forms exist to meet). Lossless: sets ↔ mask vectors are a
    * bijection and the emitted value keeps the quad form's exact float
    * division. Each doc-pair is emitted exactly once: for ma <> mb the
    * (x, y) assignment with x.doc_id < y.doc_id picks one of the two
    * mpair orientations; for ma = mb it is the in-group ordered pair. */
  /** Shared prefix: tokenize, position the (guarded, ≤512-token)
    * vocabulary, build the per-doc mask word vector. */
  private val maskBaseCtes: String =
    s"""tok AS (SELECT doc_id,
           unnest(list_distinct(list_filter(string_split_regex(text, '\\s+'),
             x -> len(x) > 0))) AS tk FROM documents),
       vocab AS (SELECT tk,
           CASE WHEN rn > ${maskWords * 64} THEN
             CAST(error('documents vocabulary exceeds ${maskWords * 64} tokens: mask oracle inapplicable') AS BIGINT)
           ELSE rn - 1 END AS pos
         FROM (SELECT tk, row_number() OVER (ORDER BY tk) AS rn
               FROM (SELECT DISTINCT tk FROM tok))),
       dm AS (SELECT t.doc_id, $maskCols
         FROM tok t JOIN vocab v USING (tk) GROUP BY t.doc_id)"""

  private val maskPairsCtes: String = {
    val mAll = (0 until maskWords).map(i => s"m$i").mkString(", ")
    val joinX = (0 until maskWords).map(i => s"x.m$i = p.a$i").mkString(" AND ")
    val joinY = (0 until maskWords).map(i => s"y.m$i = p.b$i").mkString(" AND ")
    val pairCols = (0 until maskWords)
      .map(i => s"a.m$i AS a$i, b.m$i AS b$i").mkString(", ")
    s"""$maskBaseCtes,
       gm AS (SELECT $mAll FROM dm GROUP BY $mAll),
       mpair AS (SELECT $pairCols,
           CAST(${popcnt("a", "b", "&")} AS DOUBLE) /
             ${popcnt("a", "b", "|")} AS jaccard
         FROM gm a JOIN gm b
           ON CAST(${popcnt("a", "b", "&")} AS DOUBLE) /
              ${popcnt("a", "b", "|")} >= 0.9),
       bpairs AS (SELECT x.doc_id AS id_a, y.doc_id AS id_b, p.jaccard
         FROM mpair p JOIN dm x ON $joinX JOIN dm y ON $joinY
         WHERE x.doc_id < y.doc_id)"""
  }

  /** Component representatives `rep(doc_id, rep)` of the jaccard-0.9
    * doc graph, computed on the QUOTIENT mask graph. Doc-level
    * recursive reachability (the r10 first cut) is the oracle
    * bottleneck at sf1 — 50k docs with 19.3M directed pair edges blew
    * the 1800 s budget — but the doc graph is an expansion of the mask
    * graph: docs sharing a mask are pairwise connected outright
    * (jaccard = 1 ≥ 0.9), and an edge between two masks connects every
    * doc of one group to every doc of the other, so doc components =
    * mask components expanded (verified vs the doc-level recursion at
    * sf0.01 and vs an independent union-find over the verified pair
    * set at sf0.1 — zero rep mismatches). Reachability runs over
    * distinct masks (39,350 at sf1 vs 50k docs / 19.3M edges), seeded
    * with each mask's min doc_id; docs with no tokens keep themselves
    * as rep, mirroring the quadratic form's all-docs recursion base. */
  private val maskRepCtes: String = {
    val mAll = (0 until maskWords).map(i => s"m$i").mkString(", ")
    val gj = (0 until maskWords).map(i => s"d.m$i = g.m$i").mkString(" AND ")
    s"""$maskBaseCtes,
       gmi AS (SELECT $mAll, row_number() OVER (ORDER BY $mAll) AS mid
         FROM (SELECT $mAll FROM dm GROUP BY $mAll)),
       dmi AS (SELECT d.doc_id, g.mid FROM dm d JOIN gmi g ON $gj),
       mmin AS (SELECT mid, min(doc_id) AS md FROM dmi GROUP BY mid),
       medge AS (SELECT a.mid AS u, b.mid AS v FROM gmi a JOIN gmi b
         ON a.mid <> b.mid AND CAST(${popcnt("a", "b", "&")} AS DOUBLE) /
            ${popcnt("a", "b", "|")} >= 0.9),
       mreach(mid, lbl) AS (
         SELECT mid, md FROM mmin
         UNION
         SELECT e.u, r.lbl FROM mreach r JOIN medge e ON e.v = r.mid),
       mrep AS (SELECT mid, min(lbl) AS rep FROM mreach GROUP BY mid),
       rep AS (SELECT doc.doc_id, COALESCE(m.rep, doc.doc_id) AS rep
         FROM documents doc
         LEFT JOIN dmi d ON d.doc_id = doc.doc_id
         LEFT JOIN mrep m ON m.mid = d.mid)"""
  }

  private val bandedJaccardPairsSql: String =
    s"WITH $maskPairsCtes SELECT id_a, id_b, jaccard FROM bpairs"

  /** q34 at non-pinned dirs: the same recursive-CTE min-label components +
    * survivor count as the pinned oracle, but fed by the banded pair CTE
    * above instead of the all-pairs scan. */
  private val bandedDedupPipelineSql: String =
    s"""WITH RECURSIVE $maskRepCtes
       SELECT CAST(count(*) AS BIGINT) AS survivors,
         min(doc_id) AS min_id, max(doc_id) AS max_id
       FROM rep WHERE rep = doc_id"""

  /** q106/q112 at non-pinned dirs: deletion-neighborhood (FastSS)
    * blocking for edit distance <= 1 — every name joins on its D0 ∪ D1
    * variant strings (itself + each single-char deletion), candidates
    * verify with exact `levenshtein`. Lossless for k = 1: equal strings
    * meet at D0; a substitution meets where both delete the substituted
    * position; an insertion/deletion meets where the longer string
    * deletes the inserted char (yielding the shorter string's D0). The
    * quadratic form's length-band predicate cannot hash-join, so at sf1
    * it is a 1.1e10-pair nested loop. */
  private val bandedFuzzyNamesSql: String =
    """WITH nm AS (SELECT c_custkey AS id, c_name AS s FROM customer
           WHERE len(c_name) > 0),
       vr AS (SELECT id, unnest(list_prepend(s,
             list_transform(range(1, len(s) + 1), i ->
               substr(s, 1, CAST(i - 1 AS INT)) ||
               substr(s, CAST(i + 1 AS INT))))) AS v
         FROM nm),
       cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
         FROM vr a JOIN vr b ON a.v = b.v AND a.id < b.id)
       SELECT c.id_a, c.id_b,
         CAST(levenshtein(x.s, y.s) AS BIGINT) AS dist
       FROM cand c JOIN nm x ON c.id_a = x.id JOIN nm y ON c.id_b = y.id
       WHERE abs(len(x.s) - len(y.s)) <= 1 AND levenshtein(x.s, y.s) <= 1"""

  /** q107 at non-pinned dirs: directed containment via TOKEN-SET
    * BITMASKS. The prefix filter buys nothing here — the documents
    * fixture's vocabulary is 31 distinct tokens (measured; the q113
    * contract, NOTES_r10 §4), so every "rare" prefix token still has
    * df ~ N/31 and the candidate set stays ~quadratic (verified at
    * sf0.1: banded 243 s ≈ quad 240 s). What the degenerate vocabulary
    * DOES license is exact set dedup: each doc's token set is a subset
    * of a tiny universe (31 tokens in the fixtures, 310 at the
    * ScaleUp'd sf1 whose perturbation mints per-replica variants),
    * i.e. one 8-word bit vector, and containment is popcount
    * arithmetic. Group docs by mask (distinct masks ≪ docs — 3,935 at
    * sf0.1, 39,350 at sf1), evaluate the ~masks² pair filter with
    * vectorized bit ops, expand back to doc pairs by joining the
    * per-doc mask table twice. Lossless: sets ↔ masks are a
    * bijection, `bit_count(ma & mb)` == `len(list_intersect(wa, wb))`,
    * and the filter + emitted value keep the quad form's exact float
    * division (no ceil() re-rounding). Verified row-identical to the
    * quadratic form at sf0.01 and sf0.1. */
  private val bandedContainmentSql: String = {
    val mAll = (0 until maskWords).map(i => s"m$i").mkString(", ")
    val joinX = (0 until maskWords).map(i => s"x.m$i = p.a$i").mkString(" AND ")
    val joinY = (0 until maskWords).map(i => s"y.m$i = p.b$i").mkString(" AND ")
    val pairCols = (0 until maskWords)
      .map(i => s"a.m$i AS a$i, b.m$i AS b$i").mkString(", ")
    s"""WITH tok AS (SELECT doc_id,
           unnest(list_distinct(list_filter(string_split_regex(text, '\\s+'),
             x -> len(x) > 0))) AS tk FROM documents),
       vocab AS (SELECT tk,
           CASE WHEN rn > ${maskWords * 64} THEN
             CAST(error('documents vocabulary exceeds ${maskWords * 64} tokens: mask oracle inapplicable') AS BIGINT)
           ELSE rn - 1 END AS pos
         FROM (SELECT tk, row_number() OVER (ORDER BY tk) AS rn
               FROM (SELECT DISTINCT tk FROM tok))),
       dm AS (SELECT t.doc_id, $maskCols,
           count(*) AS sz
         FROM tok t JOIN vocab v USING (tk) GROUP BY t.doc_id),
       gm AS (SELECT $mAll, sz FROM dm GROUP BY $mAll, sz),
       mpair AS (SELECT $pairCols,
           CAST(${popcnt("a", "b", "&")} AS DOUBLE) / a.sz AS containment
         FROM gm a JOIN gm b
           ON CAST(${popcnt("a", "b", "&")} AS DOUBLE) / a.sz >= 0.9)
       SELECT x.doc_id AS id_a, y.doc_id AS id_b, p.containment
       FROM mpair p JOIN dm x ON $joinX JOIN dm y ON $joinY
       WHERE x.doc_id <> y.doc_id"""
  }

  /** q108 at non-pinned dirs: the md5-bucket split over the
    * quotient-graph component reps ([[maskRepCtes]]). */
  private val bandedLeakSplitSql: String =
    s"""WITH RECURSIVE $maskRepCtes
       SELECT doc_id, rep,
         CASE WHEN substring(md5(CAST(rep AS VARCHAR)), 1, 4) < 'cccd'
                THEN 'train'
              WHEN substring(md5(CAST(rep AS VARCHAR)), 1, 4) < 'e667'
                THEN 'val'
              ELSE 'test' END AS split
       FROM rep"""

  /** q115 at non-pinned dirs: keep-longest argmax per
    * quotient-graph component ([[maskRepCtes]]). */
  private val bandedKeepBestSql: String =
    s"""WITH RECURSIVE $maskRepCtes,
       j AS (SELECT d.doc_id, d.n_chars, r.rep FROM documents d
             JOIN rep r USING (doc_id)),
       ranked AS (SELECT doc_id, rep, n_chars,
           row_number() OVER (PARTITION BY rep
             ORDER BY n_chars DESC, doc_id) AS rnk,
           CAST(count(*) OVER (PARTITION BY rep) AS BIGINT)
             AS cluster_size
         FROM j)
       SELECT doc_id, rep, n_chars, cluster_size FROM ranked
       WHERE rnk = 1"""

  /** Golden oracles (q26 pattern) for the queries whose hash-family /
    * embedder math has no DuckDB twin. Emitted only for the sf0.01 fixture
    * dir they were pinned against (q33's is fixture-derived and emitted
    * everywhere). Populated by [[graft.queries.GoldenOracles]]. */
  private def goldenOracles(dir: String): Map[String, String] =
    graft.queries.GoldenOracles.forDir(dir)

  /** Shared q144/q146 ground truth (see the map entries). */
  private val ccScratchSql: String =
    """WITH RECURSIVE bi AS (SELECT DISTINCT l_orderkey AS b,
           l_partkey AS i FROM lineitem),
       po AS (SELECT x.i AS u, y.i AS v FROM bi x
              JOIN bi y ON x.b = y.b AND x.i < y.i
              WHERE x.b % 5 <> 0 GROUP BY 1, 2 HAVING count(*) >= 2),
       pn AS (SELECT x.i AS u, y.i AS v FROM bi x
              JOIN bi y ON x.b = y.b AND x.i < y.i
              WHERE x.b % 5 = 0 GROUP BY 1, 2 HAVING count(*) >= 2),
       e AS (SELECT u, v FROM po UNION SELECT u, v FROM pn),
       adj AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
       r(n, m) AS (SELECT u, v FROM adj
                   UNION
                   SELECT r.n, adj.v FROM r JOIN adj ON adj.u = r.m
                   WHERE adj.v <> r.n),
       reps AS (SELECT n AS id, least(n, min(m)) AS rep FROM r GROUP BY n)
       SELECT id AS part, rep FROM reps"""
}
