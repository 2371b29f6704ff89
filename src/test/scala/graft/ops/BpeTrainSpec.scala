package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeTrainSpec extends SparkSpec {

  private def learn(docs: Seq[String], k: Int): Seq[(Int, String, String, Long)] = {
    import spark.implicits._
    BpeTrain.merges(docs.toDF("text"), "text", k)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
  }

  test("hand-computed merges: counts, feed-forward of merged symbols") {
    // "low" x3, "lower" x2: pairs lo:5 ow:5 we:2 er:2 -> the (l,o)/(o,w)
    // tie breaks to the smaller left symbol 'l'; rank 2 merges the new
    // 'lo' with 'w' at 5; rank 3 ties (low,e):2 with (e,r):2 and 'e' <
    // 'low' wins — merged symbols compete under the same total order
    val docs = Seq("low low low", "lower lower")
    val got = learn(docs, 3)
    got(0) shouldBe ((1, "l", "o", 5L))
    got(1) shouldBe ((2, "lo", "w", 5L))
    got(2) shouldBe ((3, "e", "r", 2L))
  }

  test("greedy leftmost application: 'aaaa' under (a,a) pairs as [aa][aa]") {
    // word "aaaa" x1: rank1 (a,a) count 3 (overlapping COUNTS all 3
    // adjacencies); after the leftmost merge the word is [aa, aa], so
    // rank2 is (aa, aa) with count 1 — the fold never merges overlaps
    val got = learn(Seq("aaaa"), 2)
    got(0) shouldBe ((1, "a", "a", 3L))
    got(1) shouldBe ((2, "aa", "aa", 1L))
  }

  test("matches the independent replay on a seeded random corpus") {
    val rnd = new scala.util.Random(13)
    val words = (0 until 40).map(_ =>
      (0 until 2 + rnd.nextInt(6)).map(_ => ('a' + rnd.nextInt(5)).toChar)
        .mkString)
    val docs = (0 until 200).map(_ => (0 until 8).map(_ =>
      words(rnd.nextInt(words.size))).mkString(" "))
    // plain-scala reference (mirrors GoldenOracles.scalaBpe independently)
    def mergeOne(s: List[String], l: String, r: String): List[String] =
      s.foldLeft(List.empty[String]) { (acc, x) =>
        if (acc.nonEmpty && acc.last == l && x == r) acc.init :+ (l + r)
        else acc :+ x
      }
    var vocab = docs.flatMap(_.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .map { case (w, f) => (w.split("").filter(_.nonEmpty).toList, f) }
    val want = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
    (1 to 6).foreach { rank =>
      val counts = scala.collection.mutable.Map
        .empty[(String, String), Long].withDefaultValue(0L)
      vocab.foreach { case (syms, f) =>
        syms.zip(syms.drop(1)).foreach(p => counts(p) += f) }
      val ((l, r), c) = counts.minBy { case ((a, b), n) => (-n, a, b) }
      want += ((rank, l, r, c))
      vocab = vocab.map { case (s, f) => (mergeOne(s, l, r), f) }
    }
    learn(docs, 6) shouldBe want.toSeq
  }

  test("tokenFrequencies: hand-computed encode under a given merge table") {
    import spark.implicits._
    // merges (l,o)->(lo,w): "low low lower" -> [low][low][low,e,r] with
    // vocab {low:2, lower:1}; tokens: low:3 (2 + the prefix in lower),
    // e:1, r:1. 'aaaa' under (a,a) then (aa,aa) -> [aaaa]:1
    val df = Seq("low low lower", "aaaa").toDF("text")
    val got = BpeTrain.tokenFrequencies(df, "text",
        Seq(("l", "o"), ("lo", "w"), ("a", "a"), ("aa", "aa")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    got shouldBe Map("low" -> 3L, "e" -> 1L, "r" -> 1L, "aaaa" -> 1L)
  }

  test("tokenFrequencies matches the plain replay on a seeded corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val words = (0 until 30).map(_ =>
      (0 until 2 + rnd.nextInt(6)).map(_ => ('a' + rnd.nextInt(4)).toChar)
        .mkString)
    val docs = (0 until 150).map(_ => (0 until 6).map(_ =>
      words(rnd.nextInt(words.size))).mkString(" "))
    val df = docs.toDF("text")
    val merges = BpeTrain.merges(df, "text", 5).collect()
      .sortBy(_.getInt(0)).map(r => (r.getString(1), r.getString(2))).toSeq
    def mergeOne(s: List[String], l: String, r: String): List[String] =
      s.foldLeft(List.empty[String]) { (acc, x) =>
        if (acc.nonEmpty && acc.last == l && x == r) acc.init :+ (l + r)
        else acc :+ x
      }
    val want = scala.collection.mutable.Map
      .empty[String, Long].withDefaultValue(0L)
    docs.flatMap(_.split("\\s+")).filter(_.nonEmpty).foreach { w =>
      val syms = merges.foldLeft(w.split("").filter(_.nonEmpty).toList) {
        case (s, (l, r)) => mergeOne(s, l, r) }
      syms.foreach(t => want(t) += 1L)
    }
    val got = BpeTrain.tokenFrequencies(df, "text", merges)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    got shouldBe want.toMap
  }

  test("exhaustion stops early; numMerges guard") {
    // single-char words have no adjacent pairs at all
    learn(Seq("a b c a b"), 4) shouldBe empty
    an[IllegalArgumentException] should be thrownBy
      learn(Seq("ab"), 0)
  }
}
