package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import scala.util.Random

/** Seeded generative tests for the lossless-blocking claims. The fixture
  * corpus exercises one corpus shape; these sweep random vocabulary sizes,
  * document lengths, duplication structure, and thresholds, asserting that
  * candidate generation NEVER loses a pair: both jaccard blockers and the
  * simhash multi-index must reproduce the brute-force pair set exactly. */
class DedupPropertySpec extends SparkSpec {

  private def corpus(rnd: Random, nDocs: Int, vocab: Int): Seq[(Long, String)] = {
    val base = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    (1 to nDocs).foreach { i =>
      val id = i.toLong
      if (i % 3 == 0 && base.nonEmpty) {
        // near-dup of an earlier doc: replace one word
        val (_, src) = base(rnd.nextInt(base.size))
        val words = src.split(" ").toBuffer
        words(rnd.nextInt(words.size)) = "m" + rnd.nextInt(vocab)
        base += id -> words.mkString(" ")
      } else {
        val len = rnd.nextInt(18) + 4
        base += id -> Seq.fill(len)("w" + rnd.nextInt(vocab)).mkString(" ")
      }
    }
    base.toSeq
  }

  private def bruteJaccard(rows: Seq[(Long, String)], t: Double): Set[(Long, Long)] = {
    val sets = rows.map { case (id, txt) =>
      id -> txt.split("\\s+").filter(_.nonEmpty).toSet
    }.filter(_._2.nonEmpty)
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      if sa.intersect(sb).size.toDouble / sa.union(sb).size >= t
    } yield (ia, ib)).toSet
  }

  test("property: both jaccard blockers equal brute force on random corpora") {
    import spark.implicits._
    val rnd = new Random(42)
    (1 to 4).foreach { _ =>
      // vocab spans degenerate (every token common) to sparse (tokens rare)
      val vocab = Seq(8, 40, 200, 2000)(rnd.nextInt(4))
      val nDocs = rnd.nextInt(40) + 25
      val t = Seq(0.6, 0.8, 0.9)(rnd.nextInt(3))
      val rows = corpus(rnd, nDocs, vocab)
      val df = rows.toDF("doc_id", "text")
      val want = bruteJaccard(rows, t)
      def got(blocking: String): Set[(Long, Long)] =
        Dedup.ngramJaccardPairs(df, "doc_id", "text", n = 1, threshold = t,
            blocking = blocking)
          .select("id_a", "id_b").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      withClue(s"vocab=$vocab nDocs=$nDocs t=$t: ") {
        got("prefix") shouldBe want
        got("size") shouldBe want
      }
    }
  }

  test("property: simhash multi-index is lossless across hamming budgets") {
    import spark.implicits._
    val rnd = new Random(7)
    (1 to 4).foreach { _ =>
      val maxH = Seq(0, 3, 6, 11)(rnd.nextInt(4))
      val nDocs = rnd.nextInt(50) + 20
      val rows = corpus(rnd, nDocs, vocab = 60)
      val df: DataFrame = rows.toDF("doc_id", "text")
      val sigs = df.select($"doc_id", Dedup.simhash(
          graft.functions.TextFunctions.tokens($"text")).as("sig"))
        .collect().map(r => r.getLong(0) -> r.getLong(1))
      val want = (for {
        (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
        if java.lang.Long.bitCount(sa ^ sb) <= maxH
      } yield (ia, ib)).toSet
      val got = Dedup.simhashPairs(df, "doc_id", "text", maxH)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      withClue(s"maxH=$maxH nDocs=$nDocs: ") { got shouldBe want }
    }
  }

  test("alternating stars == min-label == driver-side union-find on " +
      "random graphs (sweeping density and component structure)") {
    import spark.implicits._
    val rnd = new Random(11)
    (1 to 4).foreach { round =>
      val n = rnd.nextInt(120) + 30
      val nEdges = rnd.nextInt(2 * n) + n / 4
      val edges = Seq.fill(nEdges)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      // driver-side union-find ground truth
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expectVictims = (0 until n).filter(i => find(i) != i).map(_.toLong).toSet
      val pairs = edges.toDF("id_a", "id_b")
      val df = (0L until n.toLong).map(i => (i, i)).toDF("id", "v")
      Seq("stars", "minlabel").foreach { alg =>
        val survivors = Dedup.dropDuplicates(df, "id", pairs, maxIter = 200,
          algorithm = alg).collect().map(_.getLong(0)).toSet
        withClue(s"round=$round n=$n edges=$nEdges alg=$alg: ") {
          survivors shouldBe ((0L until n.toLong).toSet -- expectVictims)
        }
      }
    }
  }
}
