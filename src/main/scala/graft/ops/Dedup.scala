package graft.ops

import graft.Graft.MaterializeOps
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, the self-join
  * generalization of the reference's similarity search
  * (`Nomic MultiModal Retrieval.py:380-390`; SURVEY §2.4).
  *
  * Every variant follows the same scale shape: (1) map each row to compact
  * keys/signatures (map-only, no shuffle); (2) group or join on those keys so
  * only *candidate* pairs meet (the one shuffle, on short keys — never on
  * full text/vectors); (3) verify candidates exactly; (4) pick a canonical
  * representative per duplicate group (min pk). At 100 TB the candidate-join
  * cardinality, not the corpus size, is the cost driver — bands/buckets keep
  * it near-linear.
  */
object Dedup {

  /** Exact dedup: keep the min-pk row per distinct key. One hash shuffle on
    * the (hashed) key; map-side partial aggregation applies. */
  def exact(df: DataFrame, pk: String, keyCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keyCols: _*).orderBy(col(pk))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Exact-dedup survivors by content fingerprint (md5 of a text column) —
    * groups by 128-bit digest instead of raw text so the shuffle carries 16
    * bytes per row, not documents. */
  def exactByFingerprint(df: DataFrame, pk: String, textCol: String): DataFrame =
    exact(df, pk, Seq(fingerprintMd5(col(textCol))))

  /** Candidate pairs `(pk_a, pk_b, jaccard)` with word-`n`-gram Jaccard above
    * `threshold`. Both candidate generators are lossless and ids-only —
    * the join carries `(id, sz, key)` rows, never shingle arrays; arrays are
    * re-attached to the (much smaller) candidate set before the codegen'd
    * sorted-merge verification, exactly like the minhash path.
    *
    * `blocking` picks the candidate generator:
    *   - `"prefix"` — prefix filtering (PPJoin family): order every doc's
    *     shingles by ascending global document frequency; two sets with
    *     `jaccard >= t` must share their globally-smallest common shingle
    *     inside each one's first `sz - ceil(t*sz) + 1` shingles under that
    *     order, so candidates join on prefix-shingle equality, pruned
    *     further by the PPJoin position filter. Skew story: prefix keys are
    *     each doc's RAREST shingles by construction, so join-key
    *     frequencies stay bounded on Zipfian corpora — a shingle shared by
    *     many docs is common, and common shingles never enter prefixes.
    *   - `"size"` — size banding: `jaccard >= t` forces
    *     `t*|b| <= |a| <= |b|/t`, so docs only meet partners in the
    *     admissible size band; each unordered pair is generated exactly
    *     once (no dedup stage). The build side is salted so a hot size
    *     (Zipfian doc lengths) spreads across `saltR` tasks instead of one.
    *   - `"auto"` (default) — one stats pass decides: prefix filtering
    *     needs shingles that can be rare (vocabulary at least as large as
    *     the corpus); a tiny shared vocabulary (every shingle common, sets
    *     small) makes token blocking useless, and size banding — one
    *     equi-join, no df pass, no dedup — wins.
    * At 100 TB with a real (large-vocab) corpus, auto lands on prefix
    * filtering; size banding is the degenerate-vocabulary fallback. */
  def ngramJaccardPairs(df: DataFrame, pk: String, textCol: String,
      n: Int = 3, threshold: Double = 0.8,
      blocking: String = "auto", saltR: Int = 8): DataFrame = {
    require(Set("auto", "prefix", "size")(blocking),
      s"blocking must be auto|prefix|size, got $blocking")
    val spark = df.sparkSession
    graft.GraftSession.warnIfNoRuntimeShj(spark, "Dedup.ngramJaccardPairs")
    import spark.implicits._
    import graft.expressions.VectorExpressions.sortedCountCommon
    val sh = shingleSets(df, pk, textCol, n)
    val block =
      if (blocking != "auto") blocking
      else {
        val vocab = sh.select(explode($"sh").as("tok"))
          .agg(approx_count_distinct($"tok")).head().getLong(0)
        if (vocab >= sh.count()) "prefix" else "size"
      }
    val cand = if (block == "prefix") prefixCandidates(sh, threshold)
               else sizeBandCandidates(sh, threshold, saltR)
    val shh = hashedShingles(sh)
    // payload re-attach joins: the candidate side is the blow-up (often
    // 100-1000x corpus rows) and the shingle side is corpus-sized, so a
    // sort-merge join pays an O(C log C) sort + spill on the candidates —
    // twice, the second time with the first side's array payload already
    // attached. GraftSession's AQE maxShuffledHashJoinLocalMapThreshold
    // hash-builds the SMALL side from actual map-output sizes instead
    // (the triangle closing-join rule, GraphOps.triangleFrames), while
    // toy corpora keep AQE's broadcast conversion — a static
    // shuffle_hash hint here measured 25% faster at 50k docs but blocked
    // the broadcast that wins at 5k. Same pattern at every verify stage
    // below.
    cand
      .join(shh.select($"id".as("id_a"), $"shh".as("sh_a"), $"sz".as("sz_a")),
        "id_a")
      .join(shh.select($"id".as("id_b"), $"shh".as("sh_b"), $"sz".as("sz_b")),
        "id_b")
      .withColumn("common", sortedCountCommon($"sh_a", $"sh_b").cast("double"))
      .withColumn("jaccard", $"common" / ($"sz_a" + $"sz_b" - $"common"))
      .filter($"jaccard" >= threshold)
      .select($"id_a", $"id_b", $"jaccard")
  }

  /** Directed set-CONTAINMENT pairs: `(id_a, id_b, containment)` with
    * `|G(a) ∩ G(b)| / |G(a)| >= threshold`, `id_a != id_b` — the
    * asymmetric complement of [[ngramJaccardPairs]]. Jaccard misses
    * quote/subset duplication by construction: a 50-token doc fully
    * contained in a 5000-token doc has jaccard ~0.01 but containment 1.0.
    * For a training corpus this is the "document A is mostly a quote of
    * document B" detector, and `a -> b` direction tells you which doc is
    * the redundant one.
    *
    * Blocking is the DIRECTED prefix filter: `common >= ceil(t*|a|)`
    * depends only on a's size, so a's `|a| - ceil(t*|a|) + 1` globally
    * rarest shingles form a lossless probe prefix (if none of them hit b,
    * at most `ceil(t*|a|) - 1` common shingles remain — below threshold),
    * joined against b's FULL posting list — b's size gives no prefix
    * bound in a containment join (b may be arbitrarily large), only the
    * lower bound `|b| >= ceil(t*|a|)`. Skew story: probe keys are each
    * doc's rarest shingles, so on a real (Zipfian, large-vocab) corpus
    * posting lists met by the join stay short; a degenerate shared
    * vocabulary degrades toward the verify-everything plan the same way
    * the jaccard prefix path does — and the exact verify
    * (`sortedCountCommon` over hashed sorted sets) keeps the result
    * exact regardless. */
  def containmentPairs(df: DataFrame, pk: String, textCol: String,
      n: Int = 1, threshold: Double = 0.9): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    val spark = df.sparkSession
    import spark.implicits._
    import graft.expressions.VectorExpressions.sortedCountCommon
    val sh = shingleSets(df, pk, textCol, n)
    val cand = containmentCandidates(sh, threshold)
    val shh = hashedShingles(sh)
    cand
      .join(shh.select($"id".as("id_a"), $"shh".as("sh_a"), $"sz".as("sz_a")),
        "id_a")
      .join(shh.select($"id".as("id_b"), $"shh".as("sh_b")), "id_b")
      .withColumn("common", sortedCountCommon($"sh_a", $"sh_b").cast("double"))
      .withColumn("containment", $"common" / $"sz_a")
      .filter($"containment" >= threshold)
      .select($"id_a", $"id_b", $"containment")
  }

  /** Cross-relation n-gram Jaccard threshold join: `(id_l, id_r, jaccard)`
    * over pairs drawn one from `left`, one from `right`, with word-n-gram
    * Jaccard `>= threshold` — the R-S generalization of
    * [[ngramJaccardPairs]]' self-join. This is the FUZZY decontamination
    * shape: [[Decontaminate]] catches verbatim n-gram overlap spans, but a
    * lightly paraphrased or truncated eval document shares no exact
    * 13-gram while its unigram set stays ~90% intact — this join finds
    * those. Also the "new crawl snapshot vs existing corpus" incremental
    * dedup step, where self-joining the concatenation would re-verify the
    * old corpus against itself every snapshot.
    *
    * Both [[ngramJaccardPairs]] blockers generalize, under the same
    * `auto` rule (vocabulary vs combined corpus size, measured on the
    * union):
    *   - `"prefix"` — the lossless prefix filter with ONE shared shingle
    *     order across both relations: document frequencies are counted
    *     over the UNION of both sides' shingle sets, and each side takes
    *     its `sz - ceil(t*sz) + 1` rarest shingles under that common
    *     (dcount, tok) total order. The self-join losslessness proof
    *     transfers verbatim — it only needs both members of a qualifying
    *     pair to prefix under the SAME total order (the pair's globally
    *     smallest common shingle then lies inside both prefixes, and the
    *     PPJoin position filter passes at it) — it never uses
    *     `id_a < id_b`. Candidates join prefix-vs-prefix (not
    *     prefix-vs-postings: Jaccard bounds BOTH sizes, unlike
    *     [[containmentPairs]]), ids only.
    *   - `"size"` — the degenerate-vocabulary fallback: the left explodes
    *     its admissible partner-size band `ceil(t*sz) .. floor(sz/t)`,
    *     the right is salted; one equi-join on (size, salt), no df pass.
    * Hashed shingle sets re-attach for the exact sorted-merge verify
    * either way, so the result is exact regardless of blocker. At 100 TB
    * the typical shape is a small-ish left (eval suites, fresh crawl
    * slice) against a huge right on a real large-vocab corpus: auto lands
    * on prefix, left's prefix frame is dwarfed by right's, the equi-join
    * shuffles short (tok, id, sz, rk) rows on rarest-shingle keys, and
    * the df pass over the union is one map-side combinable count. */
  def ngramJaccardJoin(left: DataFrame, right: DataFrame,
      leftPk: String, rightPk: String, textCol: String,
      n: Int = 3, threshold: Double = 0.8,
      blocking: String = "auto", saltR: Int = 8): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    require(Set("auto", "prefix", "size")(blocking),
      s"blocking must be auto|prefix|size, got $blocking")
    val spark = left.sparkSession
    import spark.implicits._
    import graft.expressions.VectorExpressions.sortedCountCommon
    val shL = shingleSets(left, leftPk, textCol, n)
    val shR = shingleSets(right, rightPk, textCol, n)
    // the self-join's auto rule, on the union: prefix filtering needs a
    // vocabulary at least as large as the combined corpus to make
    // shingles rare; a tiny shared vocabulary -> size banding (one
    // equi-join, no df pass)
    val block =
      if (blocking != "auto") blocking
      else {
        val vocab = shL.select($"sh").unionAll(shR.select($"sh"))
          .select(explode($"sh").as("tok"))
          .agg(approx_count_distinct($"tok")).head().getLong(0)
        if (vocab >= shL.count() + shR.count()) "prefix" else "size"
      }
    val cand = if (block == "prefix") crossPrefixCandidates(shL, shR, threshold)
               else crossSizeBandCandidates(shL, shR, threshold, saltR)
    cand
      .join(hashedShingles(shL).select($"id".as("id_l"), $"shh".as("sh_a"),
        $"sz".as("sz_a")), "id_l")
      .join(hashedShingles(shR).select($"id".as("id_r"), $"shh".as("sh_b"),
        $"sz".as("sz_b")), "id_r")
      .withColumn("common", sortedCountCommon($"sh_a", $"sh_b").cast("double"))
      .withColumn("jaccard", $"common" / ($"sz_a" + $"sz_b" - $"common"))
      .filter($"jaccard" >= threshold)
      .select($"id_l", $"id_r", $"jaccard")
  }

  /** [[prefixCandidates]] across two relations: one shared rarity order
    * (df counts over the union), each side prefixes under it, prefix-vs-
    * prefix equi-join with both size bands + the position filter. No
    * `id < id` constraint — (l, r) pairs are directed by relation. */
  private[graft] def crossPrefixCandidates(shL: DataFrame, shR: DataFrame,
      threshold: Double): DataFrame = {
    val spark = shL.sparkSession
    import spark.implicits._
    val dfreq = shL.select($"sh").unionAll(shR.select($"sh"))
      .select(explode($"sh").as("tok"))
      .groupBy($"tok").agg(count(lit(1)).as("dcount"))
    def prefixes(sh: DataFrame) = {
      val w = Window.partitionBy($"id").orderBy($"dcount", $"tok")
      sh.select($"id", $"sz", explode($"sh").as("tok"))
        .join(dfreq, "tok")
        .withColumn("rk", row_number().over(w))
        .filter($"rk" <= $"sz" - ceil($"sz" * lit(threshold)) + lit(1))
        .select($"id", $"sz", $"tok", $"rk")
    }
    val alpha = ceil(lit(threshold / (1.0 + threshold)) * ($"a.sz" + $"b.sz"))
    prefixes(shL).as("a").join(prefixes(shR).as("b"),
        $"a.tok" === $"b.tok" &&
          $"b.sz" >= ceil($"a.sz" * lit(threshold)) &&
          $"a.sz" >= ceil($"b.sz" * lit(threshold)) &&
          lit(1) + least($"a.sz" - $"a.rk", $"b.sz" - $"b.rk") >= alpha)
      .select($"a.id".as("id_l"), $"b.id".as("id_r"))
      .dropDuplicates("id_l", "id_r")
  }

  /** [[sizeBandCandidates]] across two relations: the left explodes one
    * probe row per admissible right size (`ceil(t*sz) .. floor(sz/t)` —
    * both directions of the band in one explode), the right is salted
    * `saltR` ways; pairs unique by construction (one bucket matches a
    * right doc's exact size). */
  private def crossSizeBandCandidates(shL: DataFrame, shR: DataFrame,
      threshold: Double, saltR: Int): DataFrame = {
    val spark = shL.sparkSession
    import spark.implicits._
    val probe = shL.select($"id", $"sz")
      .withColumn("bucket", explode(sequence(
        ceil($"sz" * lit(threshold)).cast("int"),
        floor($"sz" / lit(threshold)).cast("int"))))
      .withColumn("salt", explode(array((0 until saltR).map(lit(_)): _*)))
    val build = shR.select($"id", $"sz")
      .withColumn("salt", pmod(xxhash64($"id"), lit(saltR)).cast("int"))
    probe.as("a").join(build.as("b"),
        $"a.bucket" === $"b.sz" && $"a.salt" === $"b.salt")
      .select($"a.id".as("id_l"), $"b.id".as("id_r"))
  }

  /** The blocked candidate stage of [[containmentPairs]] — directed
    * `(id_a, id_b)` pairs where one of a's rarest-prefix shingles hits
    * b's postings under the size band, BEFORE the exact verify. Exposed
    * (like [[prefixCandidates]] and FuzzyJoin.candidatePairs) so the
    * growth-stress bench can count candidate mass per doc at two corpus
    * scales — the scale claim under test: rarest-shingle probe prefixes
    * keep posting-list hits short on a large-vocab corpus, so
    * candidates/doc stays flat as the corpus grows. */
  private[graft] def containmentCandidates(sh: DataFrame,
      threshold: Double): DataFrame = {
    val spark = sh.sparkSession
    import spark.implicits._
    val dfreq = sh.select(explode($"sh").as("tok"))
      .groupBy($"tok").agg(count(lit(1)).as("dcount"))
    val w = Window.partitionBy($"id").orderBy($"dcount", $"tok")
    val pref = sh.select($"id", $"sz", explode($"sh").as("tok"))
      .join(dfreq, "tok")
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= $"sz" - ceil($"sz" * lit(threshold)) + lit(1))
      .select($"id", $"sz", $"tok")
    val postings = sh.select($"id", $"sz", explode($"sh").as("tok"))
    pref.as("a").join(postings.as("b"),
        $"a.tok" === $"b.tok" && $"a.id" =!= $"b.id" &&
          $"b.sz" >= ceil($"a.sz" * lit(threshold)))
      .select($"a.id".as("id_a"), $"b.id".as("id_b"))
      .dropDuplicates("id_a", "id_b")
  }

  /** Sorted 64-bit xxhash shingle sets for the verify re-attach: the
    * re-attach joins ship one 8-byte long per shingle instead of the
    * shingle text (3-10x fewer shuffle bytes at word n-grams), and the
    * sorted-merge compares primitive longs instead of UTF8 bytes. The
    * intersection count differs from the string count only if two DISTINCT
    * shingles of one pair's union collide under xxhash64 — probability
    * <= u^2/2^65 for union size u (~1e-7 even at u = 10^6), and one
    * collision perturbs jaccard by ~1/u. Sizes (`sz`) stay those of the
    * true string sets (hashing is injective on each doc's set modulo the
    * same negligible event). */
  private def hashedShingles(sh: DataFrame): DataFrame = {
    val spark = sh.sparkSession
    import spark.implicits._
    sh.select($"id",
      sort_array(transform($"sh", t => xxhash64(t))).as("shh"), $"sz")
  }

  /** Sorted distinct word-shingle sets `(id, sh, sz)` — the shared first
    * stage of the Jaccard family. Repartitions the RAW docs before
    * tokenizing: tokenize parallelism must come from the shuffle, not the
    * input layout (a small parquet reads as one partition and would
    * tokenize single-threaded); 4x the core count because candidate
    * fan-out per doc is uneven — finer tasks even out stragglers that
    * otherwise serialize the verify stage. Materialized via
    * [[graft.Graft.materialize]] (locally a localCheckpoint): reused by
    * stats/prefix passes + both re-attach joins within one query. */
  private[graft] def shingleSets(df: DataFrame, pk: String, textCol: String,
      n: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val par = spark.sessionState.conf.numShufflePartitions
    df.repartition(par * 4, col(pk))
      .select(col(pk).as("id"),
        sort_array(array_distinct(wordShingles(col(textCol), n))).as("sh"))
      .withColumn("sz", size($"sh")).filter($"sz" > 0)
      .materialized
  }

  /** Prefix-filtering candidates (ids only, `id_a < id_b`, deduped).
    * Lossless: the pair's globally-smallest common shingle always lies in
    * both prefixes (the required overlap is at least `ceil(t*max(|a|,|b|))`
    * and fewer positions than that remain after a prefix), and at that
    * shingle every earlier element of either set is non-common, so the
    * PPJoin position filter `1 + min(sz-rk) >= ceil(t/(1+t)*(sz_a+sz_b))`
    * passes for it too. */
  private[graft] def prefixCandidates(sh: DataFrame, threshold: Double): DataFrame = {
    val spark = sh.sparkSession
    import spark.implicits._
    // global document frequency per shingle (map-side combinable count)
    val dfreq = sh.select(explode($"sh").as("tok"))
      .groupBy($"tok").agg(count(lit(1)).as("dcount"))
    // each doc's (sz - ceil(t*sz) + 1) rarest shingles under the global
    // (dcount, tok) total order; per-doc window — never global
    val w = Window.partitionBy($"id").orderBy($"dcount", $"tok")
    val pref = sh.select($"id", $"sz", explode($"sh").as("tok"))
      .join(dfreq, "tok")
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= $"sz" - ceil($"sz" * lit(threshold)) + lit(1))
      .select($"id", $"sz", $"tok", $"rk")
    // required overlap for a pair: jaccard >= t  =>  common >= t/(1+t)*(sa+sb)
    val alpha = ceil(lit(threshold / (1.0 + threshold)) * ($"a.sz" + $"b.sz"))
    pref.as("a").join(pref.as("b"),
        $"a.tok" === $"b.tok" && $"a.id" < $"b.id" &&
          $"b.sz" >= ceil($"a.sz" * lit(threshold)) &&
          $"a.sz" >= ceil($"b.sz" * lit(threshold)) &&
          lit(1) + least($"a.sz" - $"a.rk", $"b.sz" - $"b.rk") >= alpha)
      .select($"a.id".as("id_a"), $"b.id".as("id_b"))
      .dropDuplicates("id_a", "id_b")
  }

  /** Size-band candidates (ids only, `id_a < id_b`, unique by
    * construction): probe emits one row per admissible partner size; the
    * build side is salted `saltR` ways so Zipf-hot sizes spread across
    * tasks. Probe fan-out is `(1/t - 1)*sz * saltR` short rows per doc. */
  private[graft] def sizeBandCandidates(sh: DataFrame, threshold: Double,
      saltR: Int): DataFrame = {
    val spark = sh.sparkSession
    import spark.implicits._
    val ids = sh.select($"id", $"sz")
    val probe = ids
      .withColumn("bucket",
        explode(sequence($"sz", floor($"sz" / lit(threshold)).cast("int"))))
      .withColumn("salt", explode(array((0 until saltR).map(lit(_)): _*)))
    val build = ids.withColumn("salt", pmod(xxhash64($"id"), lit(saltR)).cast("int"))
    probe.as("a").join(build.as("b"),
        $"a.bucket" === $"b.sz" && $"a.salt" === $"b.salt" &&
          ($"a.sz" < $"b.sz" || ($"a.sz" === $"b.sz" && $"a.id" < $"b.id")))
      .select(least($"a.id", $"b.id").as("id_a"),
        greatest($"a.id", $"b.id").as("id_b"))
  }

  /** MinHash signatures in ONE codegen'd pass over the shingle set
    * ([[graft.expressions.MinHashSignature]]: double hashing `h1 + i*h2`,
    * element-wise min). The earlier HOF formulation (one interpreted
    * aggregate per permutation) rescanned the set `numHashes` times. */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    graft.expressions.SketchExpressions.minhashSignature(shingles, numHashes)

  /** MinHash-LSH near-dup candidate pairs: signatures banded into
    * `bands`; pairs sharing any band bucket are candidates, then verified
    * with true word-shingle Jaccard. The classic banding S-curve:
    * P(candidate) = 1 - (1 - j^r)^b for Jaccard j, r = hashes/band. */
  def minhashPairs(df: DataFrame, pk: String, textCol: String,
      n: Int = 3, numHashes: Int = 48, bands: Int = 6,
      threshold: Double = 0.7): DataFrame = {
    val spark = df.sparkSession
    graft.GraftSession.warnIfNoRuntimeShj(spark, "Dedup.minhashPairs")
    import spark.implicits._
    import graft.expressions.VectorExpressions.sortedCountCommon
    val sh = shingleSets(df, pk, textCol, n)
    val cand = minhashCandidates(sh, numHashes, bands)
    val shh = hashedShingles(sh)
    cand
      .join(shh.select($"id".as("id_a"), $"shh".as("sh_a"), $"sz".as("sz_a")),
        "id_a")
      .join(shh.select($"id".as("id_b"), $"shh".as("sh_b"), $"sz".as("sz_b")),
        "id_b")
      .withColumn("common", sortedCountCommon($"sh_a", $"sh_b").cast("double"))
      .withColumn("jaccard", $"common" / ($"sz_a" + $"sz_b" - $"common"))
      .filter($"jaccard" >= threshold)
      .select($"id_a", $"id_b", $"jaccard")
  }

  /** MinHash-banded candidate pairs (ids only, `id_a < id_b`, deduped):
    * band buckets carry ONLY ids through the self-join — shingle sets are
    * re-attached to the (much smaller) verified candidate set afterwards. */
  private[graft] def minhashCandidates(sh: DataFrame, numHashes: Int,
      bands: Int): DataFrame = {
    val spark = sh.sparkSession
    import spark.implicits._
    val rows = numHashes / bands
    val sig = sh.withColumn("sig", minhashSignature($"sh", numHashes))
    val banded = sig.select($"id", posexplode(
      array((0 until bands).map(b =>
        xxhash64(slice($"sig", b * rows + 1, rows), lit(b))): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    banded.as("a").join(banded.as("b"),
        $"a.band" === $"b.band" && $"a.bucket" === $"b.bucket" && $"a.id" < $"b.id")
      .select($"a.id".as("id_a"), $"b.id".as("id_b"))
      .dropDuplicates("id_a", "id_b")
  }

  /** 64-bit SimHash of a token multiset: sign-sum of per-token hash bits
    * ([[graft.expressions.SimHash64]], one codegen'd loop — the HOF
    * formulation needed 64 interpreted aggregates). Near-dup pairs =
    * signatures within `maxHamming`. Banding on 16-bit chunks (pigeonhole:
    * hamming <= 3 means at least one of 4 chunks equal) keeps the candidate
    * join linear. */
  def simhash(tokensCol: Column): Column =
    graft.expressions.SketchExpressions.simhash64(tokensCol)

  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs, multi-index banding: the 64-bit signature is
    * split into FOUR 16-bit chunks; by pigeonhole a pair within `maxHamming`
    * flips has some chunk with at most `floor(maxHamming/4)` flips, so the
    * probe side expands each chunk value by every XOR mask of that many
    * bits (1 + 16 + 120 keys per chunk at the e=2 worst case) and joins it
    * against exact chunk values. Candidate recall stays guaranteed — the
    * lightly-flipped chunk always matches one expansion — while candidates
    * scale with `N^2 / 2^16` per chunk instead of the `N^2 / 2^10` the
    * earlier `maxHamming+1`-thin-chunks scheme paid at wide budgets:
    * random-collision candidates drop ~2^6x for a bounded (~17x at e=1)
    * increase in short probe rows. Budgets needing e > 2 (maxHamming >= 12)
    * are rejected — at that radius a 64-bit simhash distinguishes little
    * and a coarser sketch (minhash) is the right tool. */
  def simhashPairs(df: DataFrame, pk: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val spark = df.sparkSession
    graft.GraftSession.warnIfNoRuntimeShj(spark, "Dedup.simhashPairs")
    import spark.implicits._
    simhashCandidates(df, pk, textCol, maxHamming)
      .filter($"hamming" <= maxHamming)
  }

  /** SimHash multi-index candidate pairs (ids + hamming, `id_a < id_b`,
    * deduped, NOT yet hamming-filtered) — split out so candidate growth is
    * measurable independently of the verify filter
    * ([[graft.DedupStress]]). */
  private[graft] def simhashCandidates(df: DataFrame, pk: String,
      textCol: String, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 12,
      s"maxHamming must be in [0, 12), got $maxHamming")
    val spark = df.sparkSession
    import spark.implicits._
    val nChunks = 4
    val width = 16
    val e = maxHamming / nChunks // per-chunk flip budget (pigeonhole)
    // all XOR masks flipping <= e of a chunk's 16 bits (driver-side, tiny)
    val masks: Seq[Long] = (0 until (1 << width))
      .filter(m => java.lang.Integer.bitCount(m) <= e).map(_.toLong)
    val sigs = df
      .repartition(spark.sessionState.conf.numShufflePartitions)
      .select(col(pk).as("id"), simhash(tokens(col(textCol))).as("sig"))
      .materialized // (id, long) rows: probe + build reuse without re-tokenizing
    def chunked(d: DataFrame) =
      d.select($"id", $"sig", posexplode(array((0 until nChunks).map { c =>
          shiftright($"sig", c * width).bitwiseAND((1L << width) - 1)
        }: _*)))
        .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "piece")
    val probe = chunked(sigs)
      .withColumn("probe",
        explode(transform(typedLit(masks), m => $"piece".bitwiseXOR(m))))
    val build = chunked(sigs)
    // probe side is the mask expansion (1+16+120 keys/chunk at e=2 — a
    // ~137x blow-up); build is 4 rows/doc. AQE's runtime SHJ conversion
    // (GraftSession) hash-builds the small side so the expansion streams
    // unsorted at scale, and broadcasts it on toy corpora.
    probe.as("a").join(build.as("b"),
        $"a.chunk" === $"b.chunk" && $"a.probe" === $"b.piece" && $"a.id" < $"b.id")
      .select($"a.id".as("id_a"), $"b.id".as("id_b"),
        hamming64($"a.sig", $"b.sig").cast("long").as("hamming"))
      .dropDuplicates("id_a", "id_b")
  }

  /** Embedding near-dup pairs: cosine above `threshold`. Exact mode scores
    * all pairs (only for modest N or as the verification oracle); the scale
    * path pre-buckets with random hyperplane signs (LSH) so only same-bucket
    * pairs are scored. Vectors must be unit-norm. */
  def embeddingPairsExact(df: DataFrame, pk: String, vecCol: String,
      threshold: Double): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val v = df.select(col(pk).as("id"), col(vecCol).as("v"))
      .repartition(spark.sessionState.conf.numShufflePartitions)
    v.as("a").join(v.as("b"), $"a.id" < $"b.id")
      .withColumn("score", cosineUnit($"a.v", $"b.v"))
      .filter($"score" > threshold)
      .select($"a.id".as("id_a"), $"b.id".as("id_b"), $"score")
  }

  /** Scale path: random-hyperplane sign buckets; pairs agreeing on all
    * `planes` signs meet, then exact cosine verify. Recall tunable via
    * multiple tables (union of `tables` independent bucketings).
    *
    * Same candidate shape as [[minhashPairs]]: the bucket self-join carries
    * ONLY `(id, table, bucket)` rows — vectors are projected away before the
    * shuffle and re-attached to the (much smaller) deduplicated candidate
    * set for the cosine verify. At 768-dim float the old vector-carrying
    * join shipped ~6 KB per candidate through the exchange; ids-only ships
    * 8 bytes. All-near-duplicate corpora collapsing into few hot buckets
    * are handled by AQE skew-join splitting (GraftSession enables it) —
    * salting a pair-generating self-join would lose cross-salt pairs. */
  def embeddingPairsLsh(df: DataFrame, pk: String, vecCol: String,
      threshold: Double, planes: Int = 8, tables: Int = 8,
      seed: Long = 42L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val dim = df.select(size(col(vecCol))).head().getInt(0)
    val rng = new scala.util.Random(seed)
    // materialized: reused by every table's bucket pass + both re-attach
    // joins (strategy per spark.graft.materialize; locally the blocks are
    // dropped with the DataFrame)
    val v = df.select(col(pk).as("id"), col(vecCol).as("v"))
      .materialized
    val bucketed = (0 until tables).map { t =>
      val planeCols = (0 until planes).map { _ =>
        val plane = Array.fill(dim)(rng.nextGaussian().toFloat)
        when(cosineUnit($"v", vecLit(plane)) >= 0, "1").otherwise("0")
      }
      // ids-only: the vector feeds the sign computation map-side and is
      // dropped before anything shuffles
      v.select($"id", lit(t).as("table"), concat(planeCols: _*).as("bucket"))
    }.reduce(_ unionByName _)
    val cand = bucketed.as("a").join(bucketed.as("b"),
        $"a.table" === $"b.table" && $"a.bucket" === $"b.bucket" && $"a.id" < $"b.id")
      .select($"a.id".as("id_a"), $"b.id".as("id_b"))
      .dropDuplicates("id_a", "id_b")
    cand
      .join(v.select($"id".as("id_a"), $"v".as("va")), "id_a")
      .join(v.select($"id".as("id_b"), $"v".as("vb")), "id_b")
      .withColumn("score", cosineUnit($"va", $"vb"))
      .filter($"score" > threshold)
      .select($"id_a", $"id_b", $"score")
  }

  /** SemDeDup-style cluster blocking (Abbas et al. 2023, *SemDeDup: Data-
    * efficient learning at web-scale through semantic deduplication*):
    * k-means cells as the blocking key — only same-cell pairs are scored.
    * This is the embedding-dedup shape that ran at LAION scale: clustering
    * cost is linear (the same distributed Lloyd build the IVF index uses,
    * shared via [[SimilaritySearch.ivfBuildKMeans]]), and candidate mass is
    * sum-of-squared-cell-sizes instead of N².
    *
    * By design it MISSES pairs whose members land in different cells —
    * near-duplicates sit near each other, far from cell boundaries, so the
    * miss rate is small for the near-identical pairs dedup targets (and
    * zero on well-separated corpora — spec-verified); use
    * [[embeddingPairsLsh]] when recall on borderline-similarity pairs
    * matters more than the single-shuffle blocking.
    *
    * Same ids-only discipline as the LSH path: the candidate self-join
    * carries `(id, cell)` rows only; vectors re-attach to the candidate set
    * for the cosine verify. Vectors must be unit-norm. */
  def embeddingPairsSemDeDup(df: DataFrame, pk: String, vecCol: String,
      threshold: Double, nClusters: Int = 16, seed: Long = 42L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // materialized: feeds the KMeans fit, the cell assignment, and both
    // re-attach joins
    val v = df.select(col(pk).as("id"), col(vecCol).as("v"))
      .materialized
    val (assigned, _) =
      SimilaritySearch.ivfBuildKMeans(v, "id", "v", nClusters, seed = seed)
    val cells = assigned.select($"id", $"cell")
    val cand = cells.as("a").join(cells.as("b"),
        $"a.cell" === $"b.cell" && $"a.id" < $"b.id")
      .select($"a.id".as("id_a"), $"b.id".as("id_b"))
    cand
      .join(v.select($"id".as("id_a"), $"v".as("va")), "id_a")
      .join(v.select($"id".as("id_b"), $"v".as("vb")), "id_b")
      .withColumn("score", cosineUnit($"va", $"vb"))
      .filter($"score" > threshold)
      .select($"id_a", $"id_b", $"score")
  }

  /** Collapse duplicate pairs into groups and keep one representative per
    * group (the min-pk member of each connected component). Two algorithms
    * behind one contract — identical survivors, different round counts:
    *
    *   - `"stars"` (default): alternating large-star/small-star (Kiveris
    *     et al. 2014, "Connected Components in MapReduce and Beyond") —
    *     O(log² n) rounds on ANY graph shape, each round two ids-only
    *     min-aggregations + joins with map-side combine and no
    *     `collect_list` (a hub node's degree never materializes in one
    *     task). The 100 TB path: a pathological chain corpus (every doc
    *     near-dup of the next) converges in ~log rounds where min-label
    *     propagation needs O(N);
    *   - `"minlabel"`: one-hop min-label propagation — O(component
    *     diameter) rounds, slightly cheaper per round; fine when duplicate
    *     clusters are known to be tiny cliques (the common near-dup case).
    *
    * The loop stops early on convergence and warns if `maxIter` was hit
    * first (in which case some clusters keep >1 representative).
    *
    * Under the DEFAULT block regime (`spark.graft.cc.distributed=block`,
    * long ids) the `"stars"` path first runs a two-level union-find —
    * one map-only per-partition pass emitting spanning-forest
    * certificates, then a guarded single-task merge
    * (`spark.graft.cc.blockEdgeThreshold`, default 8M certificate
    * edges); above the threshold the stars loop continues on the
    * reduced certificate. Identical survivors either way
    * (spec-asserted) — the regime only changes the job count.
    * Returns `df` minus non-representative rows. */
  def dropDuplicates(df: DataFrame, pk: String, pairs: DataFrame,
      maxIter: Int = 20, algorithm: String = "stars"): DataFrame = {
    val victims = algorithm match {
      case "stars" => ccAlternatingStars(pairs, maxIter)._1
      case "minlabel" => ccMinLabel(pairs, maxIter)
      case other => throw new IllegalArgumentException(
        s"algorithm must be stars or minlabel, got $other")
    }
    df.join(victims, df(pk) === victims("id"), "left_anti")
  }

  /** Alternating large-star/small-star connected components (Kiveris et
    * al. 2014). Edge state is canonical parent pointers `(u, v), v < u`;
    * each round:
    *   - large-star: every node hangs its LARGER neighbors off the
    *     smallest node it can see (`m = min(u, min N(u))`) — doubles the
    *     reach of small labels along chains;
    *   - small-star: every node re-points its smaller-or-equal neighbors
    *     (and itself) at that minimum — flattens local trees into stars.
    * Both steps are min-aggregations + equi-joins on bare ids (map-side
    * partial min, no per-node adjacency list is ever collected, so a
    * 100M-degree hub costs the same as any other key). Convergence: the
    * canonical edge set is a fixpoint — at that point every edge is
    * `(member, component-min)`.
    *
    * Returns (victims = non-representative node ids (one column `id`),
    * rounds taken). Spec-verified: a 1k-node chain converges in ≤ ~log N
    * rounds with survivors identical to min-label propagation. */
  private[graft] def ccAlternatingStars(pairs: DataFrame,
      maxIter: Int): (DataFrame, Int) = {
    val (edges, rounds) = ccFixpoint(pairs, maxIter)
    val spark = pairs.sparkSession
    import spark.implicits._
    (edges.select($"u".as("id")), rounds)
  }

  /** INCREMENTAL component maintenance — the dedup-state update a daily
    * ingest runs: fold a batch of NEW near-dup pairs into an existing
    * `(id, rep)` component map without recomputing components from the
    * original pair set. Work scales with the DELTA, not the corpus: the
    * fixpoint input is the new pairs plus the star edges (`id — rep`) of
    * only the components the batch TOUCHES — a component is touched iff
    * a new-pair endpoint is one of its members or its rep. Untouched
    * member rows pass through via a broadcast anti-join (map-only, never
    * shuffled), so the only shuffles are delta-sized (the fixpoint, one
    * delta-domain distinct) plus one map-side-combined distinct over the
    * rep column (#components rows, not #members). A star graph
    * re-converges in O(1) alternating-stars rounds, so per-batch cost
    * tracks new pairs + touched-component mass. Representatives stay
    * component MINIMA, so the result is bit-identical to a from-scratch
    * [[componentMap]] over (old pairs ∪ new pairs) — spec-proven, and the
    * q144 oracle checks it against an independent from-scratch
    * reachability.
    *
    * Contract: `existing` is a proper map (unique per id, rep = component
    * min; root/singleton self-rows optional). The delta path broadcasts
    * the batch's endpoint set and the touched reps, so it assumes the
    * batch is small relative to the map — and GUARDS that assumption:
    * when the endpoint set exceeds `maxBroadcastIds` (a streaming
    * backlog drained as one corpus-sized batch under
    * `Trigger.AvailableNow`, say) it falls back to the from-scratch
    * [[componentMap]] over the map's star edges plus the batch — same
    * bit-identical result, shuffle-sized instead of broadcast-sized.
    * Output covers every id in `existing` (both columns) plus every id
    * in `newPairs`; ids untouched by any edge keep themselves as rep. */
  def mergeComponents(existing: DataFrame, newPairs: DataFrame,
      maxIter: Int = 20, maxBroadcastIds: Long = 4000000L): DataFrame = {
    val np = newPairs.select(col("id_a"), col("id_b"))
    val newIds = np.select(col("id_a").as("nid"))
      .unionByName(np.select(col("id_b").as("nid"))).distinct()
      .materialized // counted for the guard, then reused by 3 joins
    if (newIds.count() > maxBroadcastIds) {
      // corpus-sized batch: the broadcast hints below would blow the
      // driver; rebuild from the star edges — the map IS its own
      // connectivity certificate, so this is exact, not a recompute of
      // pair history
      val star = existing.filter(col("id") =!= col("rep"))
        .select(col("id").as("id_a"), col("rep").as("id_b"))
      val merged = componentMap(star.unionByName(np), maxIter)
      val allIds = existing.select(col("id"))
        .unionByName(existing.select(col("rep").as("id")))
        .unionByName(newIds.select(col("nid").as("id")))
        .distinct()
      return allIds.join(merged, Seq("id"), "left")
        .select(col("id"), coalesce(col("rep"), col("id")).as("rep"))
    }
    // touched components: any new endpoint among the members (id side) or
    // the roots (rep side). Two broadcast SEMI joins, not one OR-join —
    // an OR condition would plan as a nested loop over n·delta
    val touchedReps = existing
      .join(broadcast(newIds), col("id") === col("nid"), "leftsemi")
      .select(col("rep"))
      .unionByName(existing
        .join(broadcast(newIds), col("rep") === col("nid"), "leftsemi")
        .select(col("rep")))
      .distinct()
    val touched = existing.join(broadcast(touchedReps), "rep")
      .select(col("id"), col("rep"))
    val star = touched.filter(col("id") =!= col("rep"))
      .select(col("id").as("id_a"), col("rep").as("id_b"))
    val merged = componentMap(star.unionByName(np), maxIter)
    // delta domain: touched members + touched roots + new endpoints. A
    // touched member ABSENT from `merged` is the merged component's new
    // root, and that root is provably its own OLD root too (the merged
    // component's min is <= every old min it absorbed), so coalesce-self
    // is exact
    val deltaIds = touched.select(col("id"))
      .unionByName(touchedReps.select(col("rep").as("id")))
      .unionByName(newIds.select(col("nid").as("id")))
      .distinct()
    val deltaRows = deltaIds.join(merged, Seq("id"), "left")
      .select(col("id"), coalesce(col("rep"), col("id")).as("rep"))
    // untouched members pass through UNSHUFFLED; untouched roots (present
    // only in the rep column when `existing` came from componentMap) are
    // re-emitted as self-rows from the rep-distinct — members with
    // rep != id are never rep VALUES in a proper min-map, so the three
    // legs are disjoint and the output stays unique per id
    val untouchedMembers = existing.filter(col("id") =!= col("rep"))
      .join(broadcast(touchedReps), Seq("rep"), "left_anti")
      .select(col("id"), col("rep"))
    val untouchedRootSelf = existing.select(col("rep")).distinct()
      .join(broadcast(touchedReps), Seq("rep"), "left_anti")
      .select(col("rep").as("id"), col("rep"))
    deltaRows.unionByName(untouchedMembers).unionByName(untouchedRootSelf)
  }

  /** Connected-component MAP from the alternating-stars fixpoint: one row
    * `(id, rep)` per NON-representative member, `rep` = the component's
    * minimum id ([[ccFixpoint]]'s edge set is exactly this map).
    * Representatives and singletons are absent (their rep = self) — cover
    * them with a left join + `coalesce(rep, id)`. Exposed for pipelines
    * that need the CLUSTER id, not just survivor filtering: e.g. the
    * leakage-safe corpus split (q108), where a near-dup cluster must land
    * in one train/val/test bucket atomically or eval leaks into train. */
  def componentMap(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val (edges, _) = ccFixpoint(pairs, maxIter)
    val spark = pairs.sparkSession
    import spark.implicits._
    // AT the fixpoint the edge set carries exactly one (member, comp-min)
    // row per member; if maxIter cut the loop short an id can still carry
    // several candidate reps, and a consumer join (q108) would duplicate
    // its rows with CONFLICTING split assignments. min(rep) keeps the map
    // single-valued either way — converged input makes this a no-op agg.
    edges.groupBy($"u".as("id")).agg(min($"v").as("rep"))
  }

  /** Canonical selection by QUALITY: among each near-duplicate cluster
    * keep the row maximizing `quality` (ties -> smaller id), not the
    * min-id row [[dropDuplicates]] keeps. The decision step real corpus
    * pipelines run after clustering — near-dup groups usually hold one
    * full document and several truncated/boilerplate-wrapped variants,
    * and min-id keeps an arbitrary one; argmax-quality keeps the best
    * (keep-longest is the common instantiation, RefinedWeb/Gopher
    * practice). Output: the surviving rows' (<idCol>, rep, cluster_size
    * LONG) plus the evaluated `quality` as column `__q` dropped — callers
    * re-join payloads by id (ids-only discipline: nothing wide rides the
    * cluster shuffle).
    *
    * Scale shape: `pairs` -> [[componentMap]] (log-round alternating
    * stars, ids only) -> one left equi-join to cover singletons -> one
    * rank window partitioned by cluster rep. The window's partition is a
    * CLUSTER (bounded by near-dup group size), never the corpus. */
  def keepBestByQuality(df: DataFrame, idCol: String, pairs: DataFrame,
      quality: Column): DataFrame = {
    val reps = componentMap(pairs).withColumnRenamed("id", idCol)
    val withRep = df.select(col(idCol), quality.as("__q"))
      .join(reps, Seq(idCol), "left")
      .withColumn("rep", coalesce(col("rep"), col(idCol)))
    val w = Window.partitionBy(col("rep"))
    val ord = w.orderBy(desc("__q"), col(idCol))
    withRep
      .withColumn("cluster_size", count(lit(1)).over(w))
      .withColumn("__rnk", row_number().over(ord))
      .filter(col("__rnk") === 1)
      .select(col(idCol), col("rep"), col("cluster_size"))
  }

  /** Per-partition union-find: folds this partition's edges into a
    * parent forest (union-by-min + path halving) and emits the
    * partition's component map `(node, local-component-min)` for every
    * non-min node — a spanning-forest connectivity certificate of AT
    * MOST `nodes_in_partition - components_in_partition` rows. Exact on
    * whatever subgraph the partition holds; composing certificates
    * preserves global components. */
  private def localUnionFind(it: Iterator[(Long, Long)])
      : Iterator[(Long, Long)] = {
    val parent = scala.collection.mutable.LongMap.empty[Long]
    def find(x0: Long): Long = {
      var x = x0
      var p = parent.getOrElse(x, x)
      while (p != x) {
        val gp = parent.getOrElse(p, p)
        parent.update(x, gp) // path halving
        x = gp
        p = parent.getOrElse(x, x)
      }
      x
    }
    it.foreach { case (a, b) =>
      if (!parent.contains(a)) parent.update(a, a)
      if (!parent.contains(b)) parent.update(b, b)
      val ra = find(a); val rb = find(b)
      // union-by-min: the surviving root is always the smaller id, so a
      // component's root IS its minimum — no canonicalization pass needed
      if (ra < rb) parent.update(rb, ra)
      else if (rb < ra) parent.update(ra, rb)
    }
    val ks = parent.keys.toArray // snapshot: find() mutates the map
    ks.iterator.map(k => (k, find(k))).filter { case (k, r) => k != r }
  }

  private def ccFixpoint(pairs: DataFrame,
      maxIter: Int): (DataFrame, Int) = {
    val spark = pairs.sparkSession
    import spark.implicits._
    // canonical (u, v): u = larger endpoint, v = smaller; self-pairs out
    var cur = pairs
      .select(greatest($"id_a", $"id_b").as("u"), least($"id_a", $"id_b").as("v"))
      .filter($"u" =!= $"v").distinct()
      .materialized
    var curCnt = cur.count()
    var i = 0
    // block regime (default): one map-only local-union-find pass turns
    // each edge partition into its spanning-forest certificate (<= its
    // distinct-node count, usually a large shrink on near-dup graphs
    // whose components are partition-local cliques), then — when the
    // combined certificate fits one task's heap — a single-partition
    // union-find finishes the job: TWO map passes + one tiny shuffle
    // instead of O(log n) rounds x (2 min-aggs + joins + distinct).
    // Same two-level shape as the coreness/LPA/HITS block supersteps:
    // per-block sequential work, O(result) exchange. Above the
    // threshold the stars loop CONTINUES on the reduced certificate
    // (strictly fewer edges, identical components), so the regime is
    // never a correctness trade: both paths emit the identical
    // (member, component-min) map, spec-asserted. Long ids only — other
    // id types take the stars loop unchanged.
    if (curCnt > 0 &&
        spark.conf.get("spark.graft.cc.distributed", "block") == "block" &&
        cur.schema.fields.forall(_.dataType ==
          org.apache.spark.sql.types.LongType)) {
      val forests = cur.as[(Long, Long)].mapPartitions(localUnionFind)
        .toDF("u", "v").materialized
      val fCnt = forests.count()
      org.apache.spark.sql.GraftSqlBridge.unpersistMaterialized(cur)
      val thresh = spark.conf
        .get("spark.graft.cc.blockEdgeThreshold", "8000000").toLong
      if (fCnt <= thresh) {
        val fin = forests.as[(Long, Long)].repartition(1)
          .mapPartitions(localUnionFind).toDF("u", "v").materialized
        fin.count()
        org.apache.spark.sql.GraftSqlBridge.unpersistMaterialized(forests)
        return (fin, 2)
      }
      cur = forests
      curCnt = fCnt
      i = 1
    }
    var converged = curCnt == 0
    while (i < maxIter && !converged) {
      // large-star: bidirectional neighborhoods, m(x) = min(x, min N(x));
      // every neighbor y > x re-hangs at (y, m(x))
      val bidir = cur.select($"u".as("x"), $"v".as("y"))
        .union(cur.select($"v".as("x"), $"u".as("y")))
      val mins = bidir.groupBy($"x")
        .agg(min($"y").as("mn"))
        .select($"x", least($"x", $"mn").as("m"))
      val ls = bidir.join(mins, "x")
        .filter($"y" > $"x")
        .select($"y".as("u"), $"m".as("v"))
        .filter($"u" =!= $"v").distinct()
      // small-star: key every edge on its larger endpoint (already
      // canonical), m(u) = min of u's smaller neighbors; re-point them
      // and u itself at m
      val sMins = ls.groupBy($"u").agg(min($"v").as("m"))
      val ss = ls.join(sMins, "u")
        .filter($"v" =!= $"m")
        .select($"v".as("u"), $"m".as("v"))
        .union(sMins.select($"u", $"m".as("v")))
        .filter($"u" =!= $"v").distinct()
        .materialized // cut lineage: each round otherwise nests
        // the previous round's joins and blows the driver long before the
        // data does
      // fixpoint test on the canonical edge set: both sides are DISTINCT
      // materialized row sets, so equal counts + one empty anti-join
      // (ss ⊆ cur) prove set equality — one fewer except job per round
      // than the symmetric test (counts on materialized data are cheap)
      val ssCnt = ss.count()
      converged = ssCnt == curCnt && ss.except(cur).isEmpty
      // the previous round's edge set is dead once the except above ran —
      // free its blocks instead of letting 15+ rounds of them pile up in
      // the block manager for the session's lifetime
      org.apache.spark.sql.GraftSqlBridge.unpersistMaterialized(cur)
      cur = ss
      curCnt = ssCnt
      i += 1
    }
    if (!converged)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"ccFixpoint (dropDuplicates/componentMap): alternating stars hit " +
          s"maxIter=$maxIter before convergence; duplicate clusters may " +
          "keep extra representatives and component reps may be split " +
          "across several ids (componentMap stays single-valued via " +
          "min(rep), but cluster atomicity is not guaranteed)")
    // at the fixpoint every edge is (member, component-min): the u side is
    // the victim set, the pair is the component map (distinct already)
    (cur, i)
  }

  /** One-hop min-label propagation — the O(diameter) small-N path of
    * [[dropDuplicates]]. Returns victims (non-representative ids). */
  private[ops] def ccMinLabel(pairs: DataFrame, maxIter: Int): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val edges = pairs.select($"id_a", $"id_b")
      .union(pairs.select($"id_b".as("id_a"), $"id_a".as("id_b")))
      .distinct().persist()
    // each round MUST cut lineage (materialize): iterating on the
    // previous round's plan otherwise nests joins exponentially and blows
    // the driver heap long before the data does
    var labels = edges.select($"id_a".as("id"))
      .union(edges.select($"id_b".as("id"))).distinct()
      .withColumn("label", col("id"))
      .materialized
    var i = 0
    var converged = false
    while (i < maxIter && !converged) {
      val next = edges.join(labels, edges("id_b") === labels("id"))
        .groupBy(edges("id_a").as("id"))
        .agg(min(col("label")).as("nlabel"))
      val merged = labels.join(next, Seq("id"), "left")
        .select(col("id"), least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
        .materialized
      val changed = merged.join(labels.withColumnRenamed("label", "old"), "id")
        .filter(col("label") =!= col("old")).limit(1).count()
      // previous round's labels are dead once the change test ran
      org.apache.spark.sql.GraftSqlBridge.unpersistMaterialized(labels)
      labels = merged
      converged = changed == 0
      i += 1
    }
    edges.unpersist()
    if (!converged)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"dropDuplicates: label propagation hit maxIter=$maxIter before " +
          "convergence; some duplicate clusters may keep extra representatives")
    labels.filter(col("id") =!= col("label")).select(col("id"))
  }
}
