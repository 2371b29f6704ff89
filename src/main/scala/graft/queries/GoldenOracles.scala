package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Golden oracle tables (the q26 pattern) for the queries whose
  * engine-side math — minhash banding, simhash, k-means cells, HLL
  * sketches, the deterministic embedder — has no computable DuckDB twin.
  *
  *   - q20 / q47: SELF-DERIVING miss-list oracles. Banded minhash (q20)
  *     and SemDeDup cluster blocking (q47) each yield a provable SUBSET
  *     of the exact pair set (their verify stages recompute the true
  *     score, so false positives cannot enter); the blocked-out misses
  *     are an engine artifact with no DuckDB twin. Rather than pinning
  *     the miss ids (stable in practice, but riding on Spark sample /
  *     fold-order internals a version bump could silently change), the
  *     oracle is DERIVED at verify time in the same session that dumps
  *     the query results: recompute actual and exact pairs, require
  *     actual ⊆ exact (false positives abort verification loudly) and
  *     the miss fraction within the documented bound, then emit exact's
  *     independently hash-matched SQL minus the derived miss VALUES.
  *     The scores in the compared rows are DuckDB-computed, so a Spark
  *     score deviating on ANY surviving pair still hash-fails; only the
  *     identity of the missed pairs — the part that is legitimately an
  *     approximation artifact — is tolerated to move. Without an active
  *     SparkSession the round-3 pinned lists are the fallback.
  *   - q21: pinned (id_a, id_b, hamming) rows — integers only, seeded hash
  *     family, spec-guarded by the pigeonhole-recall property test.
  *   - q23/q25: pinned (doc_id, score) top-k — the deterministic embedder's
  *     scores are bit-stable (fixed left-fold dot); q25's BM25 keyword side
  *     is independently oracled by q25b and the RRF fusion is spec-checked.
  *   - q33: pinned (image_id, filepath, score) over the fixture image
  *     corpus — fixture-derived like q26, valid at ANY sf dir.
  *   - q48: pinned HLL++ counts joined to DuckDB's own exact counts with a
  *     self-auditing error guard (see the q48 comment).
  *
  * All but q33 and the self-deriving pair are pinned against the sf0.01
  * fixtures (documents, embeddings, and — for q48 — events; regenerating
  * ANY sf0.01 table invalidates the pins over it) and are emitted only for
  * that dir (a different sf would need re-pinning; the driver's t2 gate
  * always runs sf0.01).
  */
object GoldenOracles {

  /** True when `dir` is the sf0.01 fixture the pinned oracles (and the
    * exact-equality claims of q13b/q44) were verified against. */
  def sfPinned(dir: String): Boolean =
    dir.replaceAll("/+$", "").endsWith("sf0.01")

  def forDir(dir: String): Map[String, String] = {
    // q52 runs the same corpus/query/scoring through the index handle, so
    // it shares q33's fixture-derived oracle bit for bit; q80 is q33's
    // corpus after a TRIGGERED refresh appended one version-2 row
    val always = Map("q33_image_pipeline" -> q33,
      "q52_index_pipeline" -> q33,
      "q80_index_refresh" -> q80)
    // the CMS oracle derives at ANY sf with an active session (q118For);
    // sessionless it falls back to the sf0.01 pin, and for other dirs the
    // entries are omitted (driver records the weaker rows-only check)
    // rather than emitting a wrong-scale pin. q124 drains the SAME sketch
    // through streaming state; CMS counters are order-invariant sums, so
    // the result is q118's bit for bit and the oracle is shared verbatim.
    val cms = q118For(dir)
      .map(sql => Map("q118_cms_freq" -> sql, "q124_stream_cms" -> sql))
      .getOrElse(Map.empty)
    val bpe = q127For(dir)
      .map(sql => Map("q127_bpe_merges" -> sql)).getOrElse(Map.empty)
    val bpeEnc = q132For(dir)
      .map(sql => Map("q132_bpe_encode" -> sql)).getOrElse(Map.empty)
    val quant = q129For(dir)
      .map(sql => Map("q129_approx_quantiles" -> sql)).getOrElse(Map.empty)
    val core = q130For(dir)
      .map(sql => Map("q130_coreness" -> sql)).getOrElse(Map.empty)
    val rproj = q131For(dir)
      .map(sql => Map("q131_random_projection" -> sql)).getOrElse(Map.empty)
    val mmr = q135For(dir)
      .map(sql => Map("q135_mmr_rerank" -> sql)).getOrElse(Map.empty)
    val jcard = q142For(dir)
      .map(sql => Map("q142_join_cardinality" -> sql)).getOrElse(Map.empty)
    if (sfPinned(dir))
      always ++ cms ++ bpe ++ bpeEnc ++ quant ++ core ++ rproj ++ mmr ++ jcard ++ Map(
        "q20_minhash_pairs" -> q20For(dir),
        // q104 is q20's pipeline re-authored through spark.sql with the
        // registered minhash_sig/sorted_count_common — identical rows by
        // construction, so it shares the self-deriving oracle verbatim
        "q104_sql_minhash" -> q20For(dir),
        "q21_simhash_pairs" -> q21,
        "q23_semantic_topk" -> q23,
        "q25_hybrid" -> q25,
        "q47_semdedup" -> q47For(dir),
        "q48_approx_distinct" -> q48,
        "q77_sketch_rollup" -> q77)
    else always ++ cms ++ bpe ++ bpeEnc ++ quant ++ core ++ rproj ++ mmr ++ jcard
  }

  /** Self-deriving q20 oracle: recompute banded-minhash and exact-Jaccard
    * pairs, verify actual ⊆ exact and the banding miss fraction ≤ 5%
    * (round 3 measured 107 of 9020 ≈ 1.2% under the 48-hash/6-band
    * S-curve), emit exact SQL minus the derived misses. */
  private def q20For(dir: String): String =
    SparkSession.getActiveSession.map { spark =>
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      def pairs(df: org.apache.spark.sql.DataFrame) = df
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val actual = pairs(graft.ops.Dedup.minhashPairs(docs, "doc_id",
        "text", n = 1, numHashes = 48, bands = 6, threshold = 0.9))
      val exact = pairs(graft.ops.Dedup.ngramJaccardPairs(docs, "doc_id",
        "text", n = 1, threshold = 0.9))
      deriveMissOracle("q20", actual, exact, maxMissFrac = 0.05,
        exactWith = q20ExactWith, selectCols = "id_a, id_b, jaccard")
    }.getOrElse(q20Pinned)

  /** Self-deriving q47 oracle: recompute SemDeDup and exact cosine pairs,
    * verify actual ⊆ exact and the cross-cell miss fraction ≤ 80% (the
    * fixture's deliberately loose 0.45 threshold makes misses ~half the
    * pairs BY DESIGN — SemDeDup blocks for near-identical pairs, where
    * the equals-exact spec proves equality, not borderline similarity),
    * emit exact SQL minus the derived misses. */
  private def q47For(dir: String): String =
    SparkSession.getActiveSession.map { spark =>
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
      def pairs(df: org.apache.spark.sql.DataFrame) = df
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // the same pinned repartition the query itself uses (GraftQueries
      // q47): identical input layout -> identical centroids in-session
      val actual = pairs(graft.ops.Dedup.embeddingPairsSemDeDup(
        e.repartition(32, col("vec_id")), "vec_id", "embedding", 0.45,
        nClusters = 16))
      val exact = pairs(graft.ops.Dedup.embeddingPairsExact(
        e, "vec_id", "embedding", threshold = 0.45))
      deriveMissOracle("q47", actual, exact, maxMissFrac = 0.80,
        exactWith = q47ExactWith, selectCols = "id_a, id_b, score")
    }.getOrElse(q47Pinned)

  /** Shared self-deriving construction: `actual` must be a subset of
    * `exact` (anything else is a REAL wrong answer — abort verification
    * with a message naming the offending pairs) and the miss set must
    * stay inside the documented approximation budget; the emitted SQL is
    * then exact-minus-misses with all value columns DuckDB-computed. */
  private def deriveMissOracle(name: String, actual: Set[(Long, Long)],
      exact: Set[(Long, Long)], maxMissFrac: Double,
      exactWith: String, selectCols: String): String = {
    val falsePos = actual -- exact
    require(falsePos.isEmpty,
      s"$name self-deriving oracle: blocking emitted pairs NOT in the " +
        s"exact set (false positives are impossible by construction — " +
        s"this is a bug): ${falsePos.toSeq.sorted.take(20).mkString(", ")}")
    val miss = (exact -- actual).toSeq.sorted
    require(exact.isEmpty || miss.size <= (maxMissFrac * exact.size).ceil,
      s"$name self-deriving oracle: ${miss.size} of ${exact.size} exact " +
        s"pairs missed — beyond the documented ${maxMissFrac * 100}% " +
        s"approximation budget; the blocking quality regressed")
    if (miss.isEmpty)
      s"""$exactWith SELECT $selectCols FROM exact"""
    else {
      val values = miss.map { case (a, b) => s"($a,$b)" }.mkString(", ")
      s"""$exactWith,
         miss(m_a, m_b) AS (VALUES $values)
         SELECT $selectCols FROM exact
         WHERE NOT EXISTS (SELECT 1 FROM miss
           WHERE m_a = id_a AND m_b = id_b)"""
    }
  }

  /** The exact-Jaccard WITH prefix shared by the derived and pinned q20
    * oracles (q15's independently hash-matched SQL). */
  private val q20ExactWith: String =
    """WITH tok AS (SELECT doc_id,
             list_distinct(list_filter(string_split_regex(text, '\s+'),
               x -> len(x) > 0)) AS w FROM documents),
         exact AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(len(list_intersect(a.w, b.w)) AS DOUBLE) /
             len(list_distinct(list_concat(a.w, b.w))) AS jaccard
         FROM tok a JOIN tok b ON a.doc_id < b.doc_id
         WHERE len(list_distinct(list_concat(a.w, b.w))) > 0
           AND CAST(len(list_intersect(a.w, b.w)) AS DOUBLE) /
             len(list_distinct(list_concat(a.w, b.w))) >= 0.9)"""

  /** Round-3 pinned fallback (used only when no SparkSession is active to
    * self-derive): q15's exact-pair SQL minus the pinned 107-pair banding
    * miss-list, deterministic under the pinned seed. */
  private def q20Pinned: String = q20ExactWith +
    """,
         miss(m_a, m_b) AS (VALUES
           (32,154), (56,234), (56,458), (57,234), (57,458), (92,450), (98,234), (98,458),
           (100,234), (100,458), (111,234), (111,458), (127,215), (127,380), (128,197), (128,410),
           (142,234), (142,458), (147,234), (147,458), (153,201), (153,336), (154,197), (154,258),
           (154,410), (167,234), (167,458), (173,234), (173,458), (184,215), (184,380), (197,201),
           (197,217), (197,223), (197,247), (197,336), (197,415), (197,442), (201,215), (201,380),
           (201,410), (210,215), (210,380), (215,241), (215,249), (215,270), (215,276), (215,336),
           (215,346), (215,386), (215,434), (216,234), (216,458), (217,410), (223,410), (233,234),
           (233,458), (234,251), (234,264), (234,272), (234,274), (234,280), (234,294), (234,299),
           (234,311), (234,319), (234,328), (234,354), (234,417), (234,426), (234,429), (234,441),
           (234,453), (234,463), (234,466), (241,380), (247,410), (249,380), (251,458), (264,458),
           (270,380), (272,458), (274,458), (276,380), (280,458), (290,442), (290,462), (294,458),
           (299,458), (311,458), (319,458), (328,458), (336,380), (336,410), (346,380), (354,458),
           (380,386), (380,434), (410,415), (410,442), (417,458), (426,458), (429,458), (441,458),
           (453,458), (458,463), (458,466))
         SELECT id_a, id_b, jaccard FROM exact
         WHERE NOT EXISTS (SELECT 1 FROM miss
           WHERE m_a = id_a AND m_b = id_b)"""

  /** The exact-cosine WITH prefix shared by the derived and pinned q47
    * oracles (q13's independently hash-matched SQL). */
  private val q47ExactWith: String =
    """WITH exact AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           list_dot_product(CAST(a.embedding AS DOUBLE[]),
                            CAST(b.embedding AS DOUBLE[])) AS score
         FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         WHERE list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                CAST(b.embedding AS DOUBLE[])) > 0.45)"""

  /** Round-4 pinned fallback (used only when no SparkSession is active to
    * self-derive): q13's exact-pair SQL minus the pinned 9-pair
    * cross-cell miss list (re-derived after the round-4 head-of-partition
    * centroid init in [[graft.ops.SimilaritySearch.ivfBuildKMeans]]). */
  private def q47Pinned: String = q47ExactWith +
    """,
         miss(m_a, m_b) AS (VALUES
           (53,300), (75,256), (156,438), (158,452), (166,324),
           (169,466), (238,287), (290,325), (387,388))
         SELECT id_a, id_b, score FROM exact
         WHERE NOT EXISTS (SELECT 1 FROM miss
           WHERE m_a = id_a AND m_b = id_b)"""


  /** q118 (count-min point estimates): the est column is the engine's CMS
    * — deterministic (counters are sums: partitioning and merge order
    * cannot change them) but with no DuckDB twin, so it is DERIVED at
    * verify time by an independent driver-side replay of the public
    * algorithm (a plain Scala loop over the collected token stream — not
    * the aggregate's update/merge code paths); the exact counts, the
    * top-20 probe pick, and the join all come from DuckDB's own
    * computation, and the guard — `est_n >= c` (a CMS never undercounts)
    * AND `est_n <= c + slack` with `slack = ceil(4N/width)` (4x one row's
    * expected collision mass; the min over 4 rows sits far inside) —
    * makes the oracle self-auditing: a derivation drifting from the true
    * counts drops its row and fails the compare. Works at any sf dir with
    * an active session; the pinned fallback covers sessionless callers at
    * sf0.01 only (None elsewhere — the caller omits the entry). */
  private def q118For(dir: String): Option[String] =
    SparkSession.getActiveSession.map { spark =>
      val depth = 4; val width = 8192
      val toks = spark.read.parquet(s"$dir/documents.parquet")
        .select(org.apache.spark.sql.functions.explode(
          graft.functions.TextFunctions.tokens(col("text"))).as("t"))
        .collect().map(_.getString(0))
      val counters = new Array[Long](depth * width)
      toks.foreach { s =>
        val u = org.apache.spark.unsafe.types.UTF8String.fromString(s)
        var r = 0
        while (r < depth) {
          counters(r * width +
            graft.expressions.SketchHash.cmsIndex(u, r, width)) += 1
          r += 1
        }
      }
      def est(s: String): Long = {
        val u = org.apache.spark.unsafe.types.UTF8String.fromString(s)
        (0 until depth).map(r => counters(r * width +
          graft.expressions.SketchHash.cmsIndex(u, r, width))).min
      }
      val exact = toks.groupBy(identity).view.mapValues(_.size.toLong)
      val top = exact.toSeq.sortBy { case (t, c) => (-c, t) }.take(20)
      val slack = math.ceil(4.0 * toks.length / width).toLong
      top.foreach { case (t, c) =>
        require(est(t) >= c && est(t) <= c + slack,
          s"q118 self-deriving oracle: derived estimate ${est(t)} for " +
            s"'$t' outside [$c, ${c + slack}] — CMS invariant broken")
      }
      val values = top.map { case (t, _) =>
        s"('${t.replace("'", "''")}', ${est(t)})" }.mkString(", ")
      q118With(values, slack)
    }.orElse(if (sfPinned(dir)) Some(q118Pinned) else None)

  private def q118With(values: String, slack: Long): String =
    s"""WITH tok AS (SELECT list_filter(string_split_regex(text, '\\s+'),
             x -> len(x) > 0) AS toks FROM documents),
         trm AS (SELECT unnest(toks) AS term FROM tok),
         exact AS (SELECT term, count(*) AS c FROM trm
                   GROUP BY term ORDER BY c DESC, term LIMIT 20),
         est(e_term, est_n) AS (VALUES $values)
         SELECT term, CAST(c AS BIGINT) AS exact_n,
           CAST(est_n AS BIGINT) AS est_n
         FROM exact JOIN est ON term = e_term
         WHERE est_n >= c AND est_n <= c + $slack"""

  /** Sessionless fallback, pinned against the sf0.01 documents fixture
    * (regenerate via the q118For derivation if the fixture changes). */
  private val q118Pinned: String = q118With(
    "('join', 964), ('hash', 947), ('row', 943), ('batch', 937), " +
      "('scan', 936), ('column', 934), ('customer', 934), ('filter', 933), " +
      "('small', 928), ('merge', 918), ('slow', 918), ('order', 912), " +
      "('vector', 912), ('line', 910), ('data', 908), ('table', 908), " +
      "('agg', 901), ('value', 897), ('key', 896), ('stream', 888)", 14L)

  /** q127 (BPE merges): ranks 2+ depend on merged symbols no SQL engine
    * can recompute without replaying the algorithm, so the oracle is
    * DERIVED at verify time by an INDEPENDENT plain-Scala replay of the
    * public construction (fold-based leftmost merge over the collected
    * word-frequency table — not the engine's Column/aggregate code
    * paths), emitted as VALUES. Self-audit: the rank-1 row must be an
    * argmax of DuckDB's OWN first-iteration character-pair counts with
    * the exact count — a drifted derivation (or a stale pin after a
    * fixture regeneration) drops that row and fails the compare. */
  private def q127For(dir: String): Option[String] =
    SparkSession.getActiveSession.map { spark =>
      val wf = spark.read.parquet(s"$dir/documents.parquet")
        .select(org.apache.spark.sql.functions.explode(
          graft.functions.TextFunctions.tokens(col("text"))).as("w"))
        .groupBy("w").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
      val values = scalaBpe(wf, 8).map { case (rank, l, r, c) =>
        s"($rank, '${l.replace("'", "''")}', '${r.replace("'", "''")}', $c)"
      }.mkString(", ")
      q127With(values)
    }.orElse(if (sfPinned(dir)) Some(q127Pinned) else None)

  /** Reference BPE in plain Scala: adjacent-pair counts weighted by word
    * frequency, argmax with (count desc, left asc, right asc) ties,
    * greedy leftmost merge application. */
  private def scalaBpe(wf: Seq[(String, Long)],
      k: Int): Seq[(Int, String, String, Long)] = {
    def mergeOne(syms: List[String], l: String, r: String): List[String] =
      syms.foldLeft(List.empty[String]) { (acc, x) =>
        if (acc.nonEmpty && acc.last == l && x == r) acc.init :+ (l + r)
        else acc :+ x
      }
    var vocab = wf.map { case (w, f) =>
      (w.split("").filter(_.nonEmpty).toList, f) }
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= k && !done) {
      val counts = scala.collection.mutable.Map
        .empty[(String, String), Long].withDefaultValue(0L)
      vocab.foreach { case (syms, f) =>
        syms.lazyZip(syms.drop(1)).foreach((a, b) => counts((a, b)) += f) }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), c) = counts.minBy { case ((a, b), n) => (-n, a, b) }
        out += ((rank, l, r, c))
        vocab = vocab.map { case (syms, f) => (mergeOne(syms, l, r), f) }
        rank += 1
      }
    }
    out.toSeq
  }

  private def q127With(values: String): String =
    s"""WITH tok AS (SELECT list_filter(string_split_regex(text, '\\s+'),
             x -> len(x) > 0) AS toks FROM documents),
         w AS (SELECT unnest(toks) AS word FROM tok),
         wf AS (SELECT word, count(*) AS f FROM w GROUP BY word),
         cs AS (SELECT regexp_extract_all(word, '.') AS cs, f FROM wf),
         p1 AS (SELECT unnest(cs[1:len(cs)-1]) AS l,
                unnest(cs[2:len(cs)]) AS r, f FROM cs WHERE len(cs) > 1),
         c1 AS (SELECT l, r, sum(f) AS c FROM p1 GROUP BY l, r),
         m(rank, left_sym, right_sym, pair_count) AS (VALUES $values)
         SELECT CAST(rank AS INTEGER) AS rank, left_sym, right_sym,
           CAST(pair_count AS BIGINT) AS pair_count
         FROM m
         WHERE rank > 1 OR EXISTS (SELECT 1 FROM c1
           WHERE c1.l = m.left_sym AND c1.r = m.right_sym
             AND c1.c = m.pair_count
             AND c1.c = (SELECT max(c) FROM c1))"""

  /** Sessionless fallback, pinned against the sf0.01 documents fixture
    * (regenerate via q127For if the fixture changes). */
  private val q127Pinned: String = q127With(
    "(1, 'e', 'r', 4568), (2, 'i', 'n', 2760), (3, 'o', 'w', 2747), " +
      "(4, 'o', 'r', 2696), (5, 's', 't', 2676), (6, 'm', 'er', 1852), " +
      "(7, 'a', 't', 1845), (8, 'l', 'u', 1831)")

  /** q132 (BPE encode): the encoded token stream depends on the learned
    * merge table (ranks 2+ are SQL-inexpressible, the q127 argument), so
    * the oracle is DERIVED at verify time by the same independent
    * plain-Scala replay — learn 8 merges with [[scalaBpe]], apply them
    * word-by-word with the fold-based leftmost merge, count token
    * frequencies weighted by word frequency, take the engine's exact
    * (count desc, token asc) top-20 — emitted as VALUES. In-SQL audits
    * make it self-auditing against drift: every emitted token must be a
    * contiguous substring of some corpus word (BPE tokens never span
    * words), a single-character token's count can never exceed DuckDB's
    * OWN total count of that character over the corpus, and the emitted
    * counts must sum to no more than the corpus character mass — a
    * derivation that miscounts or invents symbols drops rows and fails
    * the compare. Works at any sf with an active session; sessionless
    * falls back to the sf0.01 pin. */
  private def q132For(dir: String): Option[String] =
    SparkSession.getActiveSession.map { spark =>
      val wf = spark.read.parquet(s"$dir/documents.parquet")
        .select(org.apache.spark.sql.functions.explode(
          graft.functions.TextFunctions.tokens(col("text"))).as("w"))
        .groupBy("w").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
      val merges = scalaBpe(wf, 8).map { case (_, l, r, _) => (l, r) }
      def mergeOne(syms: List[String], l: String, r: String): List[String] =
        syms.foldLeft(List.empty[String]) { (acc, x) =>
          if (acc.nonEmpty && acc.last == l && x == r) acc.init :+ (l + r)
          else acc :+ x
        }
      val counts = scala.collection.mutable.Map
        .empty[String, Long].withDefaultValue(0L)
      wf.foreach { case (w, f) =>
        val syms0 = w.split("").filter(_.nonEmpty).toList
        val syms = merges.foldLeft(syms0) { case (s, (l, r)) =>
          mergeOne(s, l, r) }
        syms.foreach(t => counts(t) += f)
      }
      val top = counts.toSeq.sortBy { case (t, n) => (-n, t) }.take(20)
      val values = top.map { case (t, n) =>
        s"('${t.replace("'", "''")}', $n)" }.mkString(", ")
      q132With(values)
    }.orElse(if (sfPinned(dir)) Some(q132Pinned) else None)

  private def q132With(values: String): String =
    s"""WITH tok AS (SELECT list_filter(string_split_regex(text, '\\s+'),
             x -> len(x) > 0) AS toks FROM documents),
         w AS (SELECT unnest(toks) AS word FROM tok),
         wf AS (SELECT word, count(*) AS f FROM w GROUP BY word),
         cc AS (SELECT c, sum(f) AS n FROM (
             SELECT unnest(regexp_extract_all(word, '.')) AS c, f FROM wf)
           GROUP BY c),
         m(token, n0) AS (VALUES $values)
         SELECT token, CAST(n0 AS BIGINT) AS n FROM m
         WHERE EXISTS (SELECT 1 FROM wf WHERE strpos(word, token) > 0)
           AND (len(token) > 1 OR n0 <= (SELECT cc.n FROM cc
                WHERE cc.c = token))
           AND (SELECT sum(n0) FROM m)
               <= (SELECT sum(len(word) * f) FROM wf)"""

  /** Sessionless fallback, pinned against the sf0.01 documents fixture
    * (regenerate via q132For if the fixture changes). */
  private val q132Pinned: String = q132With(
    "('a', 10805), ('e', 7169), ('l', 5525), ('s', 5481), " +
      "('t', 5343), ('c', 4653), ('g', 4474), ('r', 4467), " +
      "('o', 3710), ('h', 3671), ('in', 2760), ('m', 2750), " +
      "('ow', 2747), ('d', 2732), ('b', 2721), ('er', 2716), " +
      "('u', 2709), ('or', 2696), ('st', 2676), ('p', 2662)")

  /** q135 (MMR re-rank): the greedy diversified selection is inherently
    * sequential (each pick depends on the previous picks' similarity
    * mass), so no SQL engine can express it — the picks are DERIVED at
    * verify time by an independent plain-Scala replay of the public
    * algorithm (functional fold over the driver-read pool, not the
    * engine's array/while code path) and emitted as (rank, id, mmr)
    * VALUES. DuckDB then audits with its OWN computation: the `rel`
    * column is recomputed by DuckDB per emitted id (the engine's VecDot
    * left-fold must match `list_dot_product` bit for bit — the q11
    * precedent), every pick must sit inside DuckDB's own top-`fetchK`
    * relevance pool, and rank 1 must BE DuckDB's own relevance argmax
    * with `mmr = lambda·rel` exactly. A drifted derivation drops rows
    * and fails the compare. */
  private def q135For(dir: String): Option[String] =
    SparkSession.getActiveSession.map { spark =>
      val (k, fetchK, lambda) = (10, 50, 0.5)
      val rows = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding")).collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      val qv = rows.find(_._1 == 0L).get._2
      def dot(a: Array[Float], b: Array[Float]): Double = {
        var s = 0.0; var i = 0
        while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
        s
      }
      val pool = rows.map { case (id, v) => (id, dot(v, qv), v) }
        .sortBy { case (id, s, _) => (-s, id) }.take(fetchK).toList
      // functional greedy: state = (selected picks, remaining pool with
      // each candidate's running max-sim-to-selected)
      val init = pool.map { case (id, r, v) =>
        (id, r, v, Double.NegativeInfinity) }
      val picks = (1 to math.min(k, pool.size)).foldLeft(
        (List.empty[(Int, Long, Double)], init)) { case ((sel, rem), rank) =>
        val scored = rem.map { case (id, r, v, ms) =>
          val s = if (rank == 1) lambda * r else lambda * r - (1 - lambda) * ms
          (id, r, v, ms, s)
        }
        val best = scored.minBy { case (id, _, _, _, s) => (-s, id) }
        val rest = scored.filter(_._1 != best._1).map {
          case (id, r, v, ms, _) =>
            (id, r, v, math.max(ms, dot(v, best._3)))
        }
        (sel :+ ((rank, best._1, best._5)), rest)
      }._1
      val values = picks.map { case (rank, id, mmr) =>
        s"($rank, $id, ${java.lang.Double.toString(mmr)})" }.mkString(", ")
      s"""WITH rel AS (SELECT b.vec_id AS vec_id,
             list_dot_product(CAST(a.embedding AS DOUBLE[]),
                              CAST(b.embedding AS DOUBLE[])) AS rel
           FROM embeddings a JOIN embeddings b ON a.vec_id = 0),
         cand AS (SELECT vec_id FROM rel
                  ORDER BY rel DESC, vec_id LIMIT $fetchK),
         m(rank0, m_id, mmr0) AS (VALUES $values)
         SELECT CAST(rank0 AS INTEGER) AS rank, CAST(m_id AS BIGINT)
             AS vec_id, rel.rel AS rel, CAST(mmr0 AS DOUBLE) AS mmr
         FROM m JOIN rel ON rel.vec_id = m_id
         WHERE m_id IN (SELECT vec_id FROM cand)
           AND (rank0 > 1 OR (
             m_id = (SELECT vec_id FROM rel
                     ORDER BY rel DESC, vec_id LIMIT 1)
             AND abs(mmr0 - $lambda * rel.rel) <= 1e-9))"""
    }.orElse(None) // replay needs a session; no static pin (q130 class)

  /** q142 (join-cardinality scouting): the three cardinalities are
    * Datasketches HLL estimates — deterministic (register max-merge) but
    * with no DuckDB twin, so the engine row rides as derived VALUES
    * (q129's construction) and DuckDB audits every field with its OWN
    * exact computation: the row counts must match EXACTLY, each distinct
    * estimate must sit within 5% of the exact cardinality (~3 sigma at
    * lgK 12), and the inclusion-exclusion intersection within the summed
    * 5% budgets of its three constituent estimates. A drifted derivation
    * (or a stale sessionless pin) drops the row and fails the compare. */
  private def q142For(dir: String): Option[String] =
    SparkSession.getActiveSession.map { spark =>
      val r = GraftQueries.q142JoinCardinality(spark, dir).head()
      val values = (0 until 6).map(r.getLong).mkString("(", ", ", ")")
      q142With(values)
    }.orElse(if (sfPinned(dir)) Some(q142Pinned) else None)

  private def q142With(values: String): String =
    s"""WITH ex AS (SELECT
           (SELECT count(*) FROM orders) AS n_a,
           (SELECT count(*) FROM customer) AS n_b,
           (SELECT count(DISTINCT o_custkey) FROM orders) AS da,
           (SELECT count(DISTINCT c_custkey) FROM customer) AS db,
           (SELECT count(DISTINCT k) FROM (
              SELECT o_custkey AS k FROM orders
              UNION SELECT c_custkey FROM customer)) AS du),
         m(n_a0, n_b0, da0, db0, du0, ie0) AS (VALUES $values)
         SELECT CAST(n_a0 AS BIGINT) AS n_a, CAST(n_b0 AS BIGINT) AS n_b,
           CAST(da0 AS BIGINT) AS distinct_a,
           CAST(db0 AS BIGINT) AS distinct_b,
           CAST(du0 AS BIGINT) AS distinct_union,
           CAST(ie0 AS BIGINT) AS est_intersection
         FROM m, ex
         WHERE n_a0 = ex.n_a AND n_b0 = ex.n_b
           AND abs(da0 - ex.da) <= 0.05 * ex.da
           AND abs(db0 - ex.db) <= 0.05 * ex.db
           AND abs(du0 - ex.du) <= 0.05 * ex.du
           AND abs(ie0 - (ex.da + ex.db - ex.du))
               <= 0.05 * (ex.da + ex.db + ex.du)"""

  /** Sessionless fallback, pinned against the sf0.01 orders/customer
    * fixtures (regenerate via q142For if they change). */
  private val q142Pinned: String =
    q142With("(15000, 1500, 1492, 1494, 1488, 1498)")

  /** q129 (approximate quantiles): Spark's Greenwald-Khanna
    * `percentile_approx` has no DuckDB twin, and unlike the CMS/BPE
    * goldens its internals are not worth replaying — the CONTRACT is the
    * checkable thing. The emitted values ride as derived VALUES (from
    * the query itself, same session — deterministic), and DuckDB
    * independently audits each one: it must BE a data point of its
    * group (`EXISTS`) whose rank sits inside a ±0.5% band around q*N
    * (50x the sketch's N/accuracy guarantee at accuracy 10000 — wide
    * enough for discreteness, far too tight for a wrong value to
    * survive). A drifted pin drops its row and fails the compare. */
  private def q129For(dir: String): Option[String] =
    SparkSession.getActiveSession.map { spark =>
      val rows = GraftQueries.q129ApproxQuantiles(spark, dir)
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
      val values = rows.map { case (t, q, v) =>
        s"('${t.replace("'", "''")}', $q, ${java.lang.Double.toString(v)})"
      }.mkString(", ")
      q129With(values)
    }.orElse(if (sfPinned(dir)) Some(q129Pinned) else None)

  private def q129With(values: String): String =
    s"""WITH m0(e_type, q0, v0) AS (VALUES $values),
         m AS (SELECT e_type, CAST(q0 AS DOUBLE) AS q,
                 CAST(v0 AS DOUBLE) AS v FROM m0),
         g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
               FROM events GROUP BY event_type)
         SELECT e_type AS event_type, q, v
         FROM m JOIN g ON g.event_type = m.e_type
         WHERE EXISTS (SELECT 1 FROM events e
             WHERE e.event_type = m.e_type AND e.value = m.v)
           AND (SELECT count(*) FROM events e
             WHERE e.event_type = m.e_type AND e.value <= m.v)
             BETWEEN CAST(floor((m.q - 0.005) * g.n) AS BIGINT)
                 AND CAST(ceil((m.q + 0.005) * g.n) AS BIGINT)"""

  /** Sessionless fallback, pinned against the sf0.01 events fixture
    * (regenerate via q129For if the fixture changes). */
  private val q129Pinned: String = q129With(
    "('signup', 0.5, 35.92), ('signup', 0.9, 118.1), " +
      "('signup', 0.99, 233.22), ('purchase', 0.5, 33.95), " +
      "('purchase', 0.9, 107.08), ('purchase', 0.99, 223.62), " +
      "('error', 0.5, 34.38), ('error', 0.9, 112.6), " +
      "('error', 0.99, 236.27), ('view', 0.5, 33.83), " +
      "('view', 0.9, 112.04), ('view', 0.99, 210.58), " +
      "('click', 0.5, 35.28), ('click', 0.9, 123.3), " +
      "('click', 0.99, 222.07)")

  /** q130 (coreness): derived at verify time by an INDEPENDENT textbook
    * min-degree PEELING replay in plain Scala — a structurally different
    * algorithm from the engine's h-index fixpoint, so their agreement is
    * the oracle, not a mirror. The emitted SQL re-derives the edge set
    * from DuckDB's own lineitem scan and audits every VALUES row: the
    * part must BE a graph node, and must have at least `coreness`
    * neighbors whose claimed coreness is >= its own (the k-core validity
    * property) — a drifted pin drops its row and fails the compare. */
  private def q130For(dir: String): Option[String] =
    SparkSession.getActiveSession.map { spark =>
      import org.apache.spark.sql.functions.{col => c}
      val bi = spark.read.parquet(s"$dir/lineitem.parquet")
        .select(c("l_orderkey").as("b"), c("l_partkey").as("i")).distinct()
      val edges = bi.as("x").join(bi.as("y"),
          c("x.b") === c("y.b") && c("x.i") < c("y.i"))
        .select(c("x.i").as("u"), c("y.i").as("v")).distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val values = peelCoreness(edges).toSeq.sortBy(_._1)
        .map { case (n, k) => s"($n, $k)" }.mkString(", ")
      q130With(values)
    }.orElse(None) // no sessionless fallback: the VALUES table is large

  /** Textbook O(m) bucket-peeling (Batagelj-Zaversnik): repeatedly remove
    * a minimum-degree node; its coreness is the running max of removal
    * degrees. */
  private def peelCoreness(edges: Array[(Long, Long)]): Map[Long, Int] = {
    import scala.collection.mutable
    val adj = mutable.Map.empty[Long, mutable.Set[Long]]
    edges.foreach { case (u, v) =>
      adj.getOrElseUpdate(u, mutable.Set.empty) += v
      adj.getOrElseUpdate(v, mutable.Set.empty) += u
    }
    val deg = mutable.Map.empty[Long, Int] ++ adj.view.mapValues(_.size)
    val core = mutable.Map.empty[Long, Int]
    // iterator, NOT .map on the Map: a Map result would key by degree
    // and collapse every same-degree node to one entry
    val remaining = mutable.TreeSet.empty[(Int, Long)] ++
      deg.iterator.map { case (n, d) => (d, n) }
    while (remaining.nonEmpty) {
      val (d, n) = remaining.head
      remaining.remove((d, n))
      core(n) = d
      // the Batagelj-Zaversnik guard: only neighbors ABOVE the removal
      // degree lose a degree — without it a neighbor sinks below the
      // current level and later surfaces with an inflated clamped core
      adj(n).foreach { m =>
        if (!core.contains(m) && deg(m) > d) {
          remaining.remove((deg(m), m))
          deg(m) -= 1
          remaining.add((deg(m), m))
        }
      }
      adj(n).foreach(m => adj(m) -= n)
    }
    core.toMap
  }

  private def q130With(values: String): String =
    s"""WITH bi AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
           FROM lineitem),
         und AS (SELECT DISTINCT x.i AS u, y.i AS v
                 FROM bi x JOIN bi y ON x.b = y.b AND x.i < y.i),
         adj AS (SELECT u, v FROM und UNION ALL SELECT v, u FROM und),
         m(part, core) AS (VALUES $values)
         SELECT m1.part, CAST(m1.core AS BIGINT) AS coreness
         FROM m m1 JOIN (SELECT DISTINCT u FROM adj) nd ON nd.u = m1.part
         WHERE (SELECT count(*) FROM adj JOIN m m2 ON m2.part = adj.v
                WHERE adj.u = m1.part AND m2.core >= m1.core)
               >= m1.core"""

  /** q131 (JL random-projection retrieval): the hash-derived ±1 matrix
    * is not SQL-expressible, so the oracle is a replay-derived golden —
    * the driver-side plain-array projection + the same double left-fold
    * dot and (score desc, id asc) rank, independent of the Expression's
    * eval/codegen code paths. DuckDB contributes only literal VALUES
    * (q21's pinned precedent); the JL distortion and neighbor-recall
    * properties are spec-carried. */
  private def q131For(dir: String): Option[String] =
    SparkSession.getActiveSession.map { spark =>
      val rows = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      val proj = rows.map { case (id, v) =>
        id -> graft.expressions.ProjectionCore.project(v, 16, 42L) }
      val qv = proj.find(_._1 == 0L).get._2
      def dot(a: Array[Float], b: Array[Float]): Double = {
        var s = 0.0; var i = 0
        while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
        s
      }
      val top = proj.map { case (id, p) => (id, dot(p, qv)) }
        .sortBy { case (id, s) => (-s, id) }.take(10)
      val values = top.map { case (id, s) =>
        s"($id, ${java.lang.Double.toString(s)})" }.mkString(", ")
      s"""SELECT CAST(vec_id AS BIGINT) AS vec_id,
           CAST(score AS DOUBLE) AS score
         FROM (VALUES $values) AS t(vec_id, score)"""
    }.orElse(None) // replay needs a session; no static pin (fixture-sized)

  /** q48 (HLL approximate distinct): the approx column is Spark's HLL++ —
    * deterministic (register max-merge is order/partition-independent) but
    * with no DuckDB twin (different HLL implementation), so it is pinned;
    * the exact column and the join come from DuckDB's own computation, and
    * the 10% guard (~2 sigma at rsd 0.05) makes the oracle self-auditing:
    * a pin drifting from the true cardinality drops its row and fails the
    * compare. */
  private val q48: String =
    """WITH exact AS (SELECT event_type,
           strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           count(DISTINCT user_id) AS exact_users
         FROM events GROUP BY 1, 2),
         approx(a_type, a_day, approx_users) AS (VALUES
           ('click','2024-01-01',62), ('click','2024-01-02',57),
           ('click','2024-01-03',53), ('click','2024-01-04',50),
           ('click','2024-01-05',52), ('click','2024-01-06',56),
           ('click','2024-01-07',56), ('click','2024-01-08',50),
           ('click','2024-01-09',43), ('click','2024-01-10',52),
           ('click','2024-01-11',56), ('click','2024-01-12',54),
           ('click','2024-01-13',52), ('click','2024-01-14',49),
           ('click','2024-01-15',46), ('click','2024-01-16',59),
           ('click','2024-01-17',60), ('click','2024-01-18',68),
           ('click','2024-01-19',47), ('click','2024-01-20',62),
           ('click','2024-01-21',44), ('click','2024-01-22',52),
           ('click','2024-01-23',44), ('click','2024-01-24',64),
           ('click','2024-01-25',52), ('click','2024-01-26',54),
           ('click','2024-01-27',63), ('click','2024-01-28',53),
           ('click','2024-01-29',49), ('click','2024-01-30',52),
           ('error','2024-01-01',60), ('error','2024-01-02',48),
           ('error','2024-01-03',54), ('error','2024-01-04',49),
           ('error','2024-01-05',60), ('error','2024-01-06',53),
           ('error','2024-01-07',47), ('error','2024-01-08',48),
           ('error','2024-01-09',64), ('error','2024-01-10',59),
           ('error','2024-01-11',53), ('error','2024-01-12',60),
           ('error','2024-01-13',56), ('error','2024-01-14',47),
           ('error','2024-01-15',48), ('error','2024-01-16',62),
           ('error','2024-01-17',48), ('error','2024-01-18',70),
           ('error','2024-01-19',57), ('error','2024-01-20',53),
           ('error','2024-01-21',57), ('error','2024-01-22',55),
           ('error','2024-01-23',48), ('error','2024-01-24',49),
           ('error','2024-01-25',60), ('error','2024-01-26',49),
           ('error','2024-01-27',62), ('error','2024-01-28',47),
           ('error','2024-01-29',48), ('error','2024-01-30',55),
           ('purchase','2024-01-01',57), ('purchase','2024-01-02',58),
           ('purchase','2024-01-03',54), ('purchase','2024-01-04',50),
           ('purchase','2024-01-05',64), ('purchase','2024-01-06',49),
           ('purchase','2024-01-07',53), ('purchase','2024-01-08',64),
           ('purchase','2024-01-09',49), ('purchase','2024-01-10',49),
           ('purchase','2024-01-11',53), ('purchase','2024-01-12',63),
           ('purchase','2024-01-13',58), ('purchase','2024-01-14',50),
           ('purchase','2024-01-15',53), ('purchase','2024-01-16',54),
           ('purchase','2024-01-17',54), ('purchase','2024-01-18',49),
           ('purchase','2024-01-19',59), ('purchase','2024-01-20',55),
           ('purchase','2024-01-21',50), ('purchase','2024-01-22',56),
           ('purchase','2024-01-23',65), ('purchase','2024-01-24',47),
           ('purchase','2024-01-25',59), ('purchase','2024-01-26',47),
           ('purchase','2024-01-27',50), ('purchase','2024-01-28',45),
           ('purchase','2024-01-29',67), ('purchase','2024-01-30',52),
           ('signup','2024-01-01',53), ('signup','2024-01-02',53),
           ('signup','2024-01-03',52), ('signup','2024-01-04',49),
           ('signup','2024-01-05',49), ('signup','2024-01-06',62),
           ('signup','2024-01-07',50), ('signup','2024-01-08',48),
           ('signup','2024-01-09',45), ('signup','2024-01-10',63),
           ('signup','2024-01-11',55), ('signup','2024-01-12',55),
           ('signup','2024-01-13',53), ('signup','2024-01-14',70),
           ('signup','2024-01-15',53), ('signup','2024-01-16',46),
           ('signup','2024-01-17',50), ('signup','2024-01-18',65),
           ('signup','2024-01-19',45), ('signup','2024-01-20',59),
           ('signup','2024-01-21',54), ('signup','2024-01-22',57),
           ('signup','2024-01-23',53), ('signup','2024-01-24',50),
           ('signup','2024-01-25',58), ('signup','2024-01-26',54),
           ('signup','2024-01-27',53), ('signup','2024-01-28',60),
           ('signup','2024-01-29',47), ('signup','2024-01-30',54),
           ('view','2024-01-01',56), ('view','2024-01-02',53),
           ('view','2024-01-03',54), ('view','2024-01-04',53),
           ('view','2024-01-05',50), ('view','2024-01-06',46),
           ('view','2024-01-07',41), ('view','2024-01-08',52),
           ('view','2024-01-09',63), ('view','2024-01-10',48),
           ('view','2024-01-11',62), ('view','2024-01-12',65),
           ('view','2024-01-13',56), ('view','2024-01-14',54),
           ('view','2024-01-15',56), ('view','2024-01-16',52),
           ('view','2024-01-17',53), ('view','2024-01-18',54),
           ('view','2024-01-19',54), ('view','2024-01-20',53),
           ('view','2024-01-21',46), ('view','2024-01-22',52),
           ('view','2024-01-23',63), ('view','2024-01-24',46),
           ('view','2024-01-25',65), ('view','2024-01-26',60),
           ('view','2024-01-27',49), ('view','2024-01-28',54),
           ('view','2024-01-29',56), ('view','2024-01-30',63))
         SELECT event_type, day, CAST(approx_users AS BIGINT) AS approx_users,
           CAST(exact_users AS BIGINT) AS exact_users
         FROM exact JOIN approx ON event_type = a_type AND day = a_day
         WHERE abs(approx_users - exact_users) <= 0.10 * exact_users"""

  /** q77 (sketch-merge rollup): the approx column is a union of daily
    * Datasketches HLL sketches — deterministic (register max-merge) but
    * with no DuckDB twin, so pinned (q48's construction); DuckDB computes
    * the weekly exact counts and the 10% guard self-audits the pins. At
    * the fixture's <=150-user weeks the sketch sits in its exact (sparse)
    * regime, so pins equal exact — HllMergeSpec covers the estimation
    * regime. */
  private val q77: String =
    """WITH exact AS (SELECT event_type,
           strftime(date_trunc('week', ts), '%Y-%m-%d') AS week,
           count(DISTINCT user_id) AS exact_users
         FROM events GROUP BY 1, 2),
         approx(a_type, a_week, approx_users) AS (VALUES
           ('click','2024-01-01',147), ('click','2024-01-08',145),
           ('click','2024-01-15',146), ('click','2024-01-22',144),
           ('click','2024-01-29',84),
           ('error','2024-01-01',143), ('error','2024-01-08',147),
           ('error','2024-01-15',142), ('error','2024-01-22',142),
           ('error','2024-01-29',83),
           ('purchase','2024-01-01',143), ('purchase','2024-01-08',141),
           ('purchase','2024-01-15',141), ('purchase','2024-01-22',143),
           ('purchase','2024-01-29',92),
           ('signup','2024-01-01',141), ('signup','2024-01-08',144),
           ('signup','2024-01-15',146), ('signup','2024-01-22',147),
           ('signup','2024-01-29',90),
           ('view','2024-01-01',139), ('view','2024-01-08',145),
           ('view','2024-01-15',140), ('view','2024-01-22',143),
           ('view','2024-01-29',101))
         SELECT event_type, week, CAST(approx_users AS BIGINT) AS approx_users,
           CAST(exact_users AS BIGINT) AS exact_users
         FROM exact JOIN approx ON event_type = a_type AND week = a_week
         WHERE abs(approx_users - exact_users) <= 0.10 * exact_users"""

  private val q21: String =
    """SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
           CAST(hamming AS BIGINT) AS hamming
         FROM (VALUES
           (8,195,6), (8,245,4), (18,386,6), (24,216,6), (24,369,5),
           (24,447,6), (31,383,2), (32,451,6), (34,121,3), (34,200,6),
           (34,460,6), (35,60,6), (44,446,2), (45,267,1), (45,413,1),
           (58,293,2), (60,66,6), (61,185,1), (63,179,6), (63,210,6),
           (66,145,4), (66,182,6), (66,336,6), (66,344,6), (66,453,6),
           (66,473,6), (70,415,5), (70,447,2), (72,377,0), (73,177,6),
           (77,145,6), (84,489,6), (85,234,6), (92,450,3), (98,290,0),
           (102,195,4), (107,387,3), (109,426,6), (109,466,6), (120,332,2),
           (126,285,6), (126,429,6), (135,280,4), (139,415,6), (141,193,6),
           (142,197,6), (142,280,5), (145,167,5), (145,182,6), (145,235,5),
           (145,344,6), (151,369,6), (151,412,5), (151,453,6), (152,178,2),
           (156,212,6), (165,209,6), (166,323,0), (174,235,5), (174,376,6),
           (176,453,5), (182,336,6), (182,387,6), (182,429,6), (182,473,6),
           (184,356,5), (190,267,6), (190,413,6), (195,245,6), (195,280,6),
           (195,344,6), (196,320,6), (197,353,6), (205,434,5), (210,234,6),
           (217,322,5), (220,496,6), (224,280,5), (235,376,5), (241,316,6),
           (242,354,5), (249,453,6), (258,489,6), (261,429,5), (261,432,6),
           (264,498,6), (267,413,0), (270,385,6), (270,453,6), (272,352,6),
           (277,437,6), (280,344,6), (285,301,1), (285,429,6), (285,434,6),
           (301,423,6), (302,346,6), (307,344,6), (310,389,6), (311,369,6),
           (314,353,6), (318,434,6), (321,438,6), (322,434,6), (326,457,2),
           (336,429,6), (336,453,6), (336,479,6), (344,356,4), (344,369,6),
           (344,424,6), (344,452,6), (346,354,6), (346,356,5), (349,442,6),
           (354,356,5), (367,491,6), (387,473,6), (393,420,0), (417,466,6),
           (429,432,5), (434,489,6), (442,453,6), (447,470,6), (458,462,3),
           (487,490,6)) AS t(id_a, id_b, hamming)"""

  private val q23: String =
    """SELECT CAST(doc_id AS BIGINT) AS doc_id, score FROM (VALUES
           (46,5.02630101710951571e-01), (80,4.84973562372987610e-01),
           (106,5.39104913140169506e-01), (146,5.33293182738104887e-01),
           (276,4.72482786717778935e-01), (296,4.65310179987279193e-01),
           (337,4.80873025786992536e-01), (438,4.93160586296807257e-01),
           (478,5.39006048077651734e-01), (479,4.73407273309873478e-01)) AS t(doc_id, score)"""

  private val q25: String =
    """SELECT CAST(doc_id AS BIGINT) AS doc_id, rrf FROM (VALUES
           (97,3.00179211469534038e-02), (146,3.05788982259570484e-02),
           (229,2.73672687465790904e-02), (276,2.89855072463768119e-02),
           (292,2.58937520882058132e-02), (296,3.06791569086651075e-02),
           (337,3.03099885189437451e-02), (420,2.61449077238550924e-02),
           (478,3.10544053923928753e-02), (479,2.82193958664546905e-02)) AS t(doc_id, rrf)"""

  private val q33: String =
    """SELECT CAST(image_id AS BIGINT) AS image_id, filepath, score
         FROM (VALUES
           (1,'/root/repo/fixtures/images/img_01.png',8.06290007791083119e-02),
           (4,'/root/repo/fixtures/images/img_04.png',2.02169230966506075e-01),
           (6,'/root/repo/fixtures/images/img_06.png',1.40910238011360184e-01),
           (7,'/root/repo/fixtures/images/img_07.png',2.92403701356917928e-02),
           (9,'/root/repo/fixtures/images/img_09.jpg',3.87356582385107867e-02)) AS t(image_id, filepath, score)"""

  /** q80 (TRIGGERED index refresh): q33's pinned top-4 plus the appended
    * version-2 row at rank 1 — its score is the query's self-dot (the
    * float-embedding left-fold of a unit vector, not exactly 1.0), and
    * q33's rank-5 (image 7) is displaced. A refresh that misses the
    * append, double-applies it, or perturbs the v1 rows hash-fails. */
  private val q80: String =
    """SELECT CAST(image_id AS BIGINT) AS image_id, filepath, score
         FROM (VALUES
           (9999,'appended://img_9999',9.99999991299399205e-01),
           (4,'/root/repo/fixtures/images/img_04.png',2.02169230966506075e-01),
           (6,'/root/repo/fixtures/images/img_06.png',1.40910238011360184e-01),
           (1,'/root/repo/fixtures/images/img_01.png',8.06290007791083119e-02),
           (9,'/root/repo/fixtures/images/img_09.jpg',3.87356582385107867e-02)) AS t(image_id, filepath, score)"""
}
