package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FuzzyJoinSpec extends SparkSpec {

  /** Naive quadratic ground truth over whatever strings the test supplies. */
  private def bruteForce(rows: Seq[(Long, String)], k: Int): Set[(Long, Long, Long)] = {
    def ed(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    (for {
      (ia, sa) <- rows; (ib, sb) <- rows
      if ia < ib && sa.nonEmpty && sb.nonEmpty
      dist = ed(sa, sb) if dist <= k
    } yield (ia, ib, dist.toLong)).toSet
  }

  private def run(rows: Seq[(Long, String)], k: Int): Set[(Long, Long, Long)] = {
    import spark.implicits._
    FuzzyJoin.editDistancePairs(rows.toDF("id", "s"), "id", "s", k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("distance-1 pairs: substitution, deletion, insertion each found; far pairs absent") {
    val rows = Seq(
      1L -> "Customer#000000801", 2L -> "Customer#000000901", // substitution
      3L -> "graft", 4L -> "grft",                            // deletion
      5L -> "spark", 6L -> "sparkk",                          // insertion
      7L -> "zzzzz", 8L -> "graphs")                          // unrelated
    val got = run(rows, 1)
    got shouldBe Set((1L, 2L, 1L), (3L, 4L, 1L), (5L, 6L, 1L))
  }

  test("blocked result equals brute force on a random corpus (k=1 and k=2)") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abc" // tiny alphabet: dense near-collisions stress the blocking
    val rows = (1L to 120L).map(i =>
      i -> (0 until (3 + rnd.nextInt(5))).map(_ => alphabet(rnd.nextInt(3))).mkString)
    run(rows, 1) shouldBe bruteForce(rows, 1)
    run(rows, 2) shouldBe bruteForce(rows, 2)
  }

  test("exact duplicates pair at distance 0; empty strings are dropped") {
    val rows = Seq(1L -> "same", 2L -> "same", 3L -> "", 4L -> "x")
    // "" vs "x" IS distance 1, but empty keys carry no entity signal and are
    // excluded by contract (documented); "same"/"same" is distance 0
    run(rows, 1) shouldBe Set((1L, 2L, 0L))
  }

  test("multibyte strings: variant generation and verify agree on codepoints") {
    // 'é'/'ü' are 2 bytes in UTF-8; a byte-based deletion neighborhood
    // would disagree with Spark's codepoint-based levenshtein and lose
    // pairs. substr/length/levenshtein must all count the same units.
    val rows = Seq(
      1L -> "café", 2L -> "cafe",      // substitution é->e
      3L -> "müller", 4L -> "muller",  // substitution ü->u
      5L -> "münchen", 6L -> "munchen")
    run(rows, 1) shouldBe Set((1L, 2L, 1L), (3L, 4L, 1L), (5L, 6L, 1L))
  }

  test("maxDist outside 1..2 is rejected loudly") {
    import spark.implicits._
    val df = Seq(1L -> "a").toDF("id", "s")
    an[IllegalArgumentException] should be thrownBy
      FuzzyJoin.editDistancePairs(df, "id", "s", 0)
    an[IllegalArgumentException] should be thrownBy
      FuzzyJoin.editDistancePairs(df, "id", "s", 3)
  }

  test("mass-duplicated key: every copy pairs, count is exactly n-choose-2") {
    import spark.implicits._
    val rows = (1L to 30L).map(i => i -> "hotkey") :+ (31L -> "coldkey")
    val got = run(rows, 1)
    got.size shouldBe 30 * 29 / 2 // no coldkey pair (ed("hotkey","coldkey")=2)
    got.forall(_._3 == 0L) shouldBe true
  }
}
