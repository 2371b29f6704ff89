package graft.ops

import graft.{SparkSpec, TestSpark}
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  private lazy val docs = spark.read
    .parquet(s"${TestSpark.sf0001}/documents.parquet")

  test("containmentPairs finds the quote Jaccard misses, in the right direction") {
    import spark.implicits._
    val big = (1 to 200).map(i => s"w$i").mkString(" ") // 200 distinct words
    val quote = (1 to 20).map(i => s"w$i").mkString(" ") // fully contained
    val other = (300 to 340).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, big), (2L, quote), (3L, other)).toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(df, "doc_id", "text", n = 1,
      threshold = 0.9).collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    cont.toSeq shouldBe Seq((2L, 1L, 1.0)) // quote -> big only; never big -> quote
    // and Jaccard at the same threshold sees nothing: 20/200 = 0.1
    Dedup.ngramJaccardPairs(df, "doc_id", "text", n = 1, threshold = 0.9)
      .count() shouldBe 0L
  }

  test("componentMap: reps are component minima; survivors = dropDuplicates; " +
      "clusters split atomically") {
    import spark.implicits._
    // two chains (components {1,2,3}, {10,11}) and singletons 20, 21
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val cm = Dedup.componentMap(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    cm shouldBe Map(2L -> 1L, 3L -> 1L, 11L -> 10L) // members only, rep=min
    // consistency: ids absent from the map are exactly dropDuplicates' survivors
    val all = Seq(1L, 2L, 3L, 10L, 11L, 20L, 21L).toDF("id")
    val survivors = Dedup.dropDuplicates(all, "id", pairs)
      .collect().map(_.getLong(0)).toSet
    survivors shouldBe Set(1L, 10L, 20L, 21L)
    // atomicity on the fixture: every q108-style cluster lands in ONE split
    val split = graft.queries.GraftQueries
      .q108LeakSplit(spark, graft.TestSpark.sf0001)
    split.groupBy("rep").agg(countDistinct("split").as("n"))
      .filter($"n" > 1).count() shouldBe 0L
  }

  test("containmentPairs equals brute force on the fixture sample") {
    import spark.implicits._
    val sample = docs.filter($"doc_id" < 60)
    val got = Dedup.containmentPairs(sample, "doc_id", "text", n = 1,
        threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // Seq, NOT Map: a for-comprehension over a Map would yield back into a
    // Map and silently collapse to one pair per id_a
    val toks = sample.select($"doc_id", array_distinct(split($"text", "\\s+")).as("w"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[String](1).filter(_.nonEmpty).toSet).toSeq
    val want = (for {
      (ia, wa) <- toks; (ib, wb) <- toks
      if ia != ib && wa.nonEmpty
      c = wa.intersect(wb).size.toDouble / wa.size if c >= 0.8
    } yield (ia, ib)).toSet
    got shouldBe want
  }

  test("exact dedup keeps min-pk row per key") {
    import spark.implicits._
    val df = Seq((3L, "x"), (1L, "x"), (2L, "y"), (7L, "y"), (5L, "z"))
      .toDF("id", "k")
    val out = Dedup.exact(df, "id", Seq(col("k")))
      .collect().map(r => r.getString(1) -> r.getLong(0)).toMap
    out shouldBe Map("x" -> 1L, "y" -> 2L, "z" -> 5L)
  }

  test("exactByFingerprint: identical text collapses, distinct survives") {
    import spark.implicits._
    val df = Seq((1L, "same text"), (2L, "same text"), (3L, "other"))
      .toDF("doc_id", "text")
    val out = Dedup.exactByFingerprint(df, "doc_id", "text")
    out.count() shouldBe 2
    out.select("doc_id").collect().map(_.getLong(0)).toSet shouldBe Set(1L, 3L)
  }

  test("ngramJaccardPairs: prefix and size blockers both match brute force") {
    import spark.implicits._
    def brute(rows: Seq[(Long, String)], t: Double): Set[(Long, Long)] = {
      val sets = rows.map { case (id, txt) =>
        id -> txt.split("\\s+").filter(_.nonEmpty).toSet
      }.filter(_._2.nonEmpty)
      (for {
        (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
        if sa.intersect(sb).size.toDouble / sa.union(sb).size >= t
      } yield (ia, ib)).toSet
    }
    def got(df: org.apache.spark.sql.DataFrame, t: Double,
        blocking: String): Set[(Long, Long)] =
      Dedup.ngramJaccardPairs(df, "doc_id", "text", n = 1, threshold = t,
          blocking = blocking)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    // large vocabulary (every doc mostly unique words + near-dup partner):
    // the corpus shape where prefix filtering pays, and what auto picks
    val bigRows = (1L to 60L).flatMap { k =>
      val words = (1 to 10).map(i => s"w${k}_$i")
      Seq((2 * k - 1, words.mkString(" ")),
        (2 * k, (words.drop(1) :+ s"x$k").mkString(" ")))
    }
    val bigDf = bigRows.toDF("doc_id", "text")
    val wantBig = brute(bigRows, 0.8)
    wantBig.nonEmpty shouldBe true
    got(bigDf, 0.8, "prefix") shouldBe wantBig
    got(bigDf, 0.8, "size") shouldBe wantBig
    got(bigDf, 0.8, "auto") shouldBe wantBig

    // tiny shared vocabulary (the fixture corpus): auto falls back to size
    // banding; both blockers still agree with brute force
    val smallRows = docs.select("doc_id", "text").limit(150)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val smallDf = smallRows.toDF("doc_id", "text")
    val wantSmall = brute(smallRows, 0.9)
    wantSmall.nonEmpty shouldBe true
    got(smallDf, 0.9, "prefix") shouldBe wantSmall
    got(smallDf, 0.9, "size") shouldBe wantSmall
    got(smallDf, 0.9, "auto") shouldBe wantSmall
  }

  test("ngramJaccardJoin equals brute force cross product (synthetic + fixture)") {
    import spark.implicits._
    def brute(l: Seq[(Long, String)], r: Seq[(Long, String)],
        t: Double): Set[(Long, Long)] = {
      def sets(rows: Seq[(Long, String)]) = rows.map { case (id, txt) =>
        id -> txt.split("\\s+").filter(_.nonEmpty).toSet
      }.filter(_._2.nonEmpty)
      (for {
        (il, sl) <- sets(l); (ir, sr) <- sets(r)
        if sl.intersect(sr).size.toDouble / sl.union(sr).size >= t
      } yield (il, ir)).toSet
    }
    def got1(l: Seq[(Long, String)], r: Seq[(Long, String)],
        t: Double, blocking: String): Set[(Long, Long)] =
      Dedup.ngramJaccardJoin(l.toDF("doc_id", "text"), r.toDF("doc_id", "text"),
          "doc_id", "doc_id", "text", n = 1, threshold = t,
          blocking = blocking)
        .select("id_l", "id_r").collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
    def got(l: Seq[(Long, String)], r: Seq[(Long, String)],
        t: Double): Set[(Long, Long)] = {
      val byBlocker = Seq("prefix", "size", "auto").map(got1(l, r, t, _))
      byBlocker.distinct.size shouldBe 1 // both blockers + auto agree
      byBlocker.head
    }

    // large-vocab synthetic: left gets one member of each near-dup pair,
    // right the other, plus right-only noise — the prefix filter's corpus
    val left = (1L to 40L).map { k =>
      (k, (1 to 10).map(i => s"w${k}_$i").mkString(" ")) }
    val right = (1L to 40L).map { k =>
      (1000 + k, ((1 to 10).map(i => s"w${k}_$i").drop(1) :+ s"x$k").mkString(" ")) } ++
      (1L to 40L).map { k => (2000 + k, (1 to 10).map(i => s"n${k}_$i").mkString(" ")) }
    val want = brute(left, right, 0.8)
    want.nonEmpty shouldBe true
    got(left, right, 0.8) shouldBe want

    // fixture sample split by id parity (the q119 shape at toy scale) —
    // small shared vocabulary, the prefix filter's adversarial regime:
    // losslessness must hold regardless
    val rows = docs.select("doc_id", "text").limit(200)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val (fl, fr) = rows.partition(_._1 % 2 == 0)
    val wantF = brute(fl, fr, 0.9)
    wantF.nonEmpty shouldBe true
    got(fl, fr, 0.9) shouldBe wantF

    // a doc present in BOTH relations meets itself (cross-relation join has
    // no self-pair exclusion — by contract)
    val dup = Seq((7L, "alpha beta gamma"))
    got(dup, Seq((9L, "alpha beta gamma")), 1.0) shouldBe Set((7L, 9L))
  }

  test("minhash pairs approximate exact jaccard pairs (recall/precision)") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 1,
      threshold = 0.9).select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val mh = Dedup.minhashPairs(docs, "doc_id", "text", n = 1,
      numHashes = 16, bands = 8, threshold = 0.9)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // verification step makes precision exact; banding bounds recall
    mh.subsetOf(exact) shouldBe true
    exact.nonEmpty shouldBe true
    (mh.size.toDouble / exact.size) should be >= 0.8
  }

  test("simhash: identical docs always pair at hamming 0") {
    import spark.implicits._
    val df = Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "totally different words entirely unrelated"))
      .toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(df, "doc_id", "text", maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    pairs.toSeq shouldBe Seq((1L, 2L, 0L))
  }

  test("simhashPairs finds ALL pairs within maxHamming (pigeonhole recall)") {
    import spark.implicits._
    // brute-force ground truth from the signatures themselves
    val sigs = docs.limit(200)
      .select($"doc_id", Dedup.simhash(
        graft.functions.TextFunctions.tokens($"text")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val maxHamming = 6
    val want = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
      if java.lang.Long.bitCount(sa ^ sb) <= maxHamming
    } yield (ia, ib)).toSet
    val got = Dedup.simhashPairs(docs.limit(200), "doc_id", "text", maxHamming)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    got shouldBe want // banding must be lossless for the requested budget
    want.nonEmpty shouldBe true
  }

  test("simhash multi-index generates fewer candidates than thin-chunk banding") {
    import spark.implicits._
    val maxHamming = 6
    val sigs = docs.limit(200)
      .select($"doc_id", Dedup.simhash(
        graft.functions.TextFunctions.tokens($"text")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    // the retired scheme: maxHamming+1 thin chunks, exact-equality buckets
    val nThin = maxHamming + 1
    val wThin = (64 + nThin - 1) / nThin
    val candThin = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
      if (0 until nThin).exists { c =>
        val lo = c * wThin; val bits = math.min(wThin, 64 - lo)
        bits > 0 && ((sa >>> lo) & ((1L << bits) - 1)) ==
          ((sb >>> lo) & ((1L << bits) - 1))
      }
    } yield 1).size
    // the current scheme: four 16-bit chunks, <= floor(h/4) flips expanded
    val e = maxHamming / 4
    val candWide = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
      if (0 until 4).exists { c =>
        java.lang.Long.bitCount(((sa ^ sb) >>> (c * 16)) & 0xffffL) <= e
      }
    } yield 1).size
    withClue(s"wide=$candWide thin=$candThin: ") {
      candWide should be < candThin
    }
  }

  test("embedding LSH pairs subset of exact pairs with decent recall") {
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val exact = Dedup.embeddingPairsExact(emb, "vec_id", "embedding", 0.4)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // moderate-similarity pairs (cos>0.4) are the LSH worst case: with
    // p1 = (1 - acos(0.4)/pi)^planes ~= 0.16 per table, 16 tables give
    // expected recall ~0.94
    val lsh = Dedup.embeddingPairsLsh(emb, "vec_id", "embedding", 0.4,
      planes = 4, tables = 16)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    exact.nonEmpty shouldBe true
    lsh.subsetOf(exact) shouldBe true
    (lsh.size.toDouble / exact.size) should be >= 0.7 // candidate recall floor
  }

  test("embedding LSH ids-only rewrite: identical output to exact on a " +
      "clustered fixture where recall is ~certain") {
    import spark.implicits._
    // 20 clusters x 3 near-identical unit vectors (cos >= 0.999 within,
    // low across): P(a within-pair misses all 16 tables) ~ (1-p1^4)^16
    // with p1 = 1 - acos(0.999)/pi ~ 0.9857 -> ~1e-20, and the seed is
    // pinned — so LSH output must EQUAL exact output, pairs and scores
    val rng = new scala.util.Random(7)
    val dim = 16
    val rows = (0 until 20).flatMap { c =>
      val base = Array.fill(dim)(rng.nextGaussian().toFloat)
      (0 until 3).map { j =>
        val v = base.zipWithIndex.map { case (x, i) =>
          x + 0.001f * rng.nextGaussian().toFloat }
        (c * 3L + j, graft.functions.VectorFunctions.l2Normalize(v))
      }
    }
    val df = rows.toDF("vec_id", "embedding")
    def asMap(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val exact = asMap(Dedup.embeddingPairsExact(df, "vec_id", "embedding", 0.9))
    val lsh = asMap(Dedup.embeddingPairsLsh(df, "vec_id", "embedding", 0.9,
      planes = 4, tables = 16))
    exact.size shouldBe 60 // 3 pairs per cluster
    lsh shouldBe exact
  }

  test("embeddingPairsSemDeDup: equals exact on well-separated clusters, " +
      "subset of exact in general") {
    import spark.implicits._
    // same clustered shape as the LSH test: within-cluster cos >= 0.999,
    // across-cluster low. With nClusters <= #natural clusters, every
    // near-identical pair lands in ONE kmeans cell (members are ~the same
    // point, a cell boundary between them would mean the argmax differs on
    // a 1e-3 perturbation of the same vector against well-separated
    // centroids), so cluster blocking must recover the exact pair set.
    val rng = new scala.util.Random(11)
    val dim = 16
    val rows = (0 until 20).flatMap { c =>
      val base = Array.fill(dim)(rng.nextGaussian().toFloat)
      (0 until 3).map { j =>
        val v = base.zipWithIndex.map { case (x, i) =>
          x + 0.001f * rng.nextGaussian().toFloat }
        (c * 3L + j, graft.functions.VectorFunctions.l2Normalize(v))
      }
    }
    val df = rows.toDF("vec_id", "embedding")
    def asMap(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val exact = asMap(Dedup.embeddingPairsExact(df, "vec_id", "embedding", 0.9))
    val sem = asMap(Dedup.embeddingPairsSemDeDup(df, "vec_id", "embedding",
      0.9, nClusters = 8))
    exact.size shouldBe 60
    sem shouldBe exact

    // at a low threshold (cross-cluster pairs qualify) the output is a
    // strict SUBSET of exact with every surviving score identical — cluster
    // blocking can miss, never invent
    val exactLo = asMap(Dedup.embeddingPairsExact(df, "vec_id", "embedding", 0.0))
    val semLo = asMap(Dedup.embeddingPairsSemDeDup(df, "vec_id", "embedding",
      0.0, nClusters = 8))
    semLo.keySet.subsetOf(exactLo.keySet) shouldBe true
    semLo.size should be < exactLo.size
    semLo.foreach { case (k, s) => s shouldBe exactLo(k) }
  }

  test("dropDuplicates: connected components keep min-pk representative " +
      "(both algorithms)") {
    import spark.implicits._
    val df = (1L to 8L).map(i => (i, s"row$i")).toDF("id", "v")
    // components {1,2,3} (chain), {5,7}; 4,6,8 singletons
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 7L)).toDF("id_a", "id_b")
    Seq("stars", "minlabel").foreach { alg =>
      val out = Dedup.dropDuplicates(df, "id", pairs, algorithm = alg)
        .select("id").collect().map(_.getLong(0)).toSet
      withClue(alg) { out shouldBe Set(1L, 4L, 5L, 6L, 8L) }
    }
  }

  test("alternating stars converges in ~log N rounds on a 1k-node chain " +
      "(min-label would need N rounds) with identical survivors") {
    import spark.implicits._
    val n = 1024
    // pathological corpus: every doc a near-dup of the next — one long
    // chain, the diameter-N worst case for label propagation. Ids
    // shuffled so the component min is not adjacent to everything.
    val rnd = new scala.util.Random(13)
    val ids = rnd.shuffle((0L until n.toLong).toVector)
    val pairs = (0 until n - 1).map(i => (ids(i), ids(i + 1)))
      .toDF("id_a", "id_b")
    // pin the stars LOOP (this test measures its round count; the block
    // regime would answer in 2 supersteps and prove nothing about stars)
    spark.conf.set("spark.graft.cc.distributed", "stars")
    val (victims, rounds) =
      try Dedup.ccAlternatingStars(pairs, maxIter = 20)
      finally spark.conf.unset("spark.graft.cc.distributed")
    // everything but the global min id collapses
    victims.count() shouldBe (n - 1)
    victims.collect().map(_.getLong(0)).toSet shouldBe
      (0L until n.toLong).toSet - 0L
    // the point of the algorithm: round count is logarithmic, not O(N)
    rounds should be <= 12
    // cross-check survivors against the min-label path given enough
    // rounds on a small chain (min-label needs diameter rounds: 40 here)
    val smallIds = rnd.shuffle((100L until 140L).toVector)
    val smallPairs = (0 until 39).map(i => (smallIds(i), smallIds(i + 1)))
      .toDF("id_a", "id_b")
    val df = (100L until 140L).map(i => (i, s"d$i")).toDF("id", "v")
    val viaStars = Dedup.dropDuplicates(df, "id", smallPairs,
        maxIter = 50, algorithm = "stars")
      .collect().map(_.getLong(0)).toSet
    val viaLabels = Dedup.dropDuplicates(df, "id", smallPairs,
        maxIter = 50, algorithm = "minlabel")
      .collect().map(_.getLong(0)).toSet
    viaStars shouldBe viaLabels
    viaStars shouldBe Set(100L)
  }

  test("alternating stars round count grows ~logarithmically with chain " +
      "length (measured, not argued)") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    spark.conf.set("spark.graft.cc.distributed", "stars")
    val rounds = try Seq(256, 1024, 4096).map { n =>
      val ids = rnd.shuffle((0L until n.toLong).toVector)
      val pairs = (0 until n - 1).map(i => (ids(i), ids(i + 1)))
        .toDF("id_a", "id_b")
      val (victims, r) = Dedup.ccAlternatingStars(pairs, maxIter = 30)
      victims.count() shouldBe (n - 1)
      r
    } finally spark.conf.unset("spark.graft.cc.distributed")
    // 4x the chain may add only a couple of rounds — the log shape; a
    // linear algorithm would add ~768 and ~3072 rounds at these steps
    withClue(s"rounds at 256/1024/4096: $rounds: ") {
      rounds(1) - rounds(0) should be <= 3
      rounds(2) - rounds(1) should be <= 3
      rounds(2) should be <= 14
    }
  }

  test("alternating stars handles forests, cliques, self-pairs and empty " +
      "pair sets") {
    import spark.implicits._
    val df = (0L to 20L).map(i => (i, i)).toDF("id", "v")
    // two components: a 5-clique {2,4,6,8,10} and a star on {11..15};
    // a self-pair (12,12) must be ignored
    val clique = for {
      a <- Seq(2L, 4L, 6L, 8L, 10L); b <- Seq(2L, 4L, 6L, 8L, 10L)
      if a < b
    } yield (a, b)
    val star = Seq(15L, 14L, 13L, 12L).map(x => (11L, x))
    val pairs = (clique ++ star :+ ((12L, 12L))).toDF("id_a", "id_b")
    val out = Dedup.dropDuplicates(df, "id", pairs)
      .collect().map(_.getLong(0)).toSet
    out shouldBe ((0L to 20L).toSet -- Set(4L, 6L, 8L, 10L, 12L, 13L, 14L, 15L))
    // empty pair set: nothing dropped, no crash
    val none = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    Dedup.dropDuplicates(df, "id", none).count() shouldBe 21
  }

  test("keepBestByQuality keeps the argmax-quality member per cluster, " +
      "min-id on ties, singletons intact") {
    import spark.implicits._
    // cluster A {1,2,3} via chain, quality peaks at 2; cluster B {10,11}
    // tied quality -> min id 10; 20 is a singleton
    val rows = Seq((1L, 5.0), (2L, 9.0), (3L, 7.0),
      (10L, 4.0), (11L, 4.0), (20L, 1.0)).toDF("id", "q")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val out = Dedup.keepBestByQuality(rows, "id", pairs, col("q"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    out shouldBe Set((2L, 1L, 3L), (10L, 10L, 2L), (20L, 20L, 1L))
    // contrast: dropDuplicates' min-id pick keeps 1, not the best 2
    Dedup.dropDuplicates(rows, "id", pairs)
      .collect().map(_.getLong(0)).toSet shouldBe Set(1L, 10L, 20L)
  }

  private def cmap(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Dedup.componentMap(pairs.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def cmerge(existing: Map[Long, Long],
      newPairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Dedup.mergeComponents(existing.toSeq.toDF("id", "rep"),
        newPairs.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("mergeComponents: bridging new pairs merge old components to the " +
      "global min rep; untouched singletons survive") {
    // old: {1,2,3} and {10,11}; singleton 99 carried in the map
    val existing = cmap(Seq((1L, 2L), (2L, 3L), (10L, 11L))) + (99L -> 99L)
    existing(11L) shouldBe 10L
    // new pair 3-10 bridges the two components -> everyone reps to 1;
    // 50-51 is a brand-new component; 99 must survive untouched
    val got = cmerge(existing, Seq((3L, 10L), (50L, 51L)))
    got shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 1L, 11L -> 1L,
      50L -> 50L, 51L -> 50L, 99L -> 99L)
  }

  test("mergeComponents: new pair hitting a ROOT id (present only in the " +
      "rep column) still merges its component") {
    import spark.implicits._
    // componentMap-style existing: no self-rows, root 1 absent as an id
    val got = cmerge(Map(2L -> 1L, 3L -> 1L), Seq((1L, 0L)))
    got shouldBe Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L)
  }

  test("mergeComponents: output is unique per id (delta rows vs " +
      "untouched pass-through never overlap), self-rows tolerated") {
    import spark.implicits._
    // existing WITH explicit self-rows (the StreamingCc state shape):
    // {1,2} touched by the batch, {10,11} and singleton 99 untouched
    val existing = Seq((1L, 1L), (2L, 1L), (10L, 10L), (11L, 10L),
      (99L, 99L)).toDF("id", "rep")
    val out = Dedup.mergeComponents(existing, Seq((2L, 5L)).toDF("id_a", "id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    out.map(_._1).distinct.length shouldBe out.length
    out.toMap shouldBe Map(1L -> 1L, 2L -> 1L, 5L -> 1L, 10L -> 10L,
      11L -> 10L, 99L -> 99L)
  }

  test("mergeComponents: untouched components never enter the fixpoint " +
      "(delta-sized incremental work)") {
    import spark.implicits._
    // a big untouched component plus a tiny touched one: the fold must
    // leave the big one bit-identical (pass-through correctness; the
    // delta-shuffle SIZE claim is measured by the x_inc_cc bench row)
    val big = (1L to 500L).map(i => (i, 0L)).toMap
    val existing = big + (1000L -> 1000L) + (1001L -> 1000L)
    val got = cmerge(existing, Seq((1001L, 2000L)))
    // got additionally carries the root self-row (0 -> 0)
    got.filter(k => k._1 >= 1L && k._1 <= 500L) shouldBe big
    got(0L) shouldBe 0L
    got(2000L) shouldBe 1000L
  }

  test("mergeComponents: corpus-sized batch takes the from-scratch " +
      "fallback (maxBroadcastIds guard) with an identical result") {
    import spark.implicits._
    val existing = Seq((1L, 1L), (2L, 1L), (10L, 10L), (11L, 10L),
      (99L, 99L)).toDF("id", "rep")
    val batch = Seq((2L, 5L), (5L, 11L), (200L, 201L)).toDF("id_a", "id_b")
    val expected = Dedup.mergeComponents(existing, batch)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // maxBroadcastIds = 0 forces every batch down the fallback path
    val viaFallback = Dedup.mergeComponents(existing, batch,
        maxBroadcastIds = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    viaFallback shouldBe expected
    expected shouldBe Map(1L -> 1L, 2L -> 1L, 5L -> 1L, 10L -> 1L,
      11L -> 1L, 99L -> 99L, 200L -> 200L, 201L -> 200L)
  }

  test("mergeComponents equals from-scratch componentMap on random " +
      "pair-set splits") {
    val rnd = new scala.util.Random(37)
    (1 to 3).foreach { _ =>
      val all = (0 until 120).map(_ =>
        (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
        .filter { case (a, b) => a != b }
      val (oldP, newP) = all.splitAt(all.size / 2)
      val scratch = cmap(all)
      val incr = cmerge(cmap(oldP), newP)
      // from-scratch map covers exactly the edge-touched ids; the
      // incremental result may also carry old-map ids whose edges all
      // landed in the new half — restrict to the common domain, where
      // reps must agree bit for bit
      scratch.foreach { case (id, rep) => incr(id) shouldBe rep }
      // and every extra id the incremental map carries must be a
      // self-rep singleton consistent with scratch (no edges touch it)
      (incr.keySet -- scratch.keySet).foreach { id =>
        incr(id) shouldBe id
      }
    }
  }

  /** Mixed-shape component fixture: a long chain (worst case for label
    * propagation), cliques, isolated pairs, shuffled ids — the graph a
    * regime-equality claim should be proven on. */
  private def mixedPairs(seed: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val ids = rnd.shuffle((0L until 600L).toVector)
    val chain = (0 until 199).map(i => (ids(i), ids(i + 1)))
    val cliques = (0 until 5).flatMap { c =>
      val mem = (0 until 8).map(j => ids(200 + c * 8 + j))
      for (a <- mem; b <- mem if a < b) yield (a, b)
    }
    val pairs = (0 until 30).map(i => (ids(300 + 2 * i), ids(301 + 2 * i)))
    // repartition(7) spreads components across partitions, so the local
    // pass genuinely has to compose cross-partition certificates
    (chain ++ cliques ++ pairs).toDF("id_a", "id_b").repartition(7)
  }

  private def cmapOf(pairs: org.apache.spark.sql.DataFrame) =
    Dedup.componentMap(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("block two-level union-find emits the identical component map to " +
      "the stars loop (chain + cliques + pairs across partitions)") {
    val pairs = mixedPairs(41)
    val block = cmapOf(pairs) // default regime
    spark.conf.set("spark.graft.cc.distributed", "stars")
    val stars = try cmapOf(pairs)
      finally spark.conf.unset("spark.graft.cc.distributed")
    block shouldBe stars
    block.nonEmpty shouldBe true
  }

  test("above the certificate threshold the block regime falls back to " +
      "the stars loop on the reduced certificate — same map") {
    val pairs = mixedPairs(43)
    spark.conf.set("spark.graft.cc.distributed", "stars")
    val stars = try cmapOf(pairs)
      finally spark.conf.unset("spark.graft.cc.distributed")
    spark.conf.set("spark.graft.cc.blockEdgeThreshold", "0")
    val fallback = try cmapOf(pairs)
      finally spark.conf.unset("spark.graft.cc.blockEdgeThreshold")
    fallback shouldBe stars
  }
}
