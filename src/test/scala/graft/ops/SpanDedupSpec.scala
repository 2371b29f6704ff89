package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SpanDedupSpec extends SparkSpec {

  private def brute(rows: Seq[(Long, String)], n: Int): Map[Long, Long] = {
    val grams = rows.map { case (id, txt) =>
      id -> txt.split("\\s+").filter(_.nonEmpty).sliding(n)
        .filter(_.size == n).map(_.mkString(" ")).toSeq
    }
    val docsPerGram = grams.flatMap { case (id, gs) => gs.distinct.map(_ -> id) }
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).distinct.size }
    grams.map { case (id, gs) =>
      id -> gs.count(g => docsPerGram(g) > 1).toLong
    }.filter(_._2 > 0).toMap
  }

  test("duplicatedSpans matches brute force on seeded random docs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps")
    val base = (0L until 40L).map(i =>
      (i, Seq.fill(6 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")))
    // inject exact copies so cross-document spans certainly exist
    val rows = base ++ Seq((100L, base(0)._2), (101L, base(1)._2))
    val out = SpanDedup.duplicatedSpans(rows.toDF("doc_id", "text"),
        "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out shouldBe brute(rows, 3)
  }

  test("a span repeated only WITHIN one document does not count") {
    import spark.implicits._
    val rows = Seq(
      (1L, "x y z x y z"), // "x y z" twice, but only in doc 1
      (2L, "totally different words here"))
    SpanDedup.duplicatedSpans(rows.toDF("doc_id", "text"),
      "doc_id", "text", n = 3).count() shouldBe 0
  }

  test("cross-document span counts every occurrence, short docs drop out") {
    import spark.implicits._
    val rows = Seq(
      (1L, "a b c d"),     // spans: "a b c", "b c d"
      (2L, "a b c"),       // span: "a b c"  -> shared with doc 1
      (3L, "a b"))         // shorter than n: no spans
    val out = SpanDedup.duplicatedSpans(rows.toDF("doc_id", "text"),
        "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out shouldBe Map(1L -> 1L, 2L -> 1L)
  }

  test("no exchange carries token arrays or document text") {
    // spans are digested to md5 BEFORE any shuffle: every Exchange input
    // must be free of array columns and of the raw text column — the
    // constant-bytes-per-span scale shape
    import org.apache.spark.sql.types.ArrayType
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // AQE wraps executedPlan in AdaptiveSparkPlanExec, hiding the Exchange
    // nodes from collect — plan without it for the shape assert
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    val exchanges = try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      SpanDedup.duplicatedSpans(df, "doc_id", "text", 5)
        .queryExecution.executedPlan.collect {
          case e: org.apache.spark.sql.execution.exchange.Exchange => e
        }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    exchanges should not be empty
    exchanges.foreach { e =>
      withClue(s"exchange input ${e.child.output.mkString(",")}: ") {
        e.child.output.filter(a => a.dataType.isInstanceOf[ArrayType]
          || a.name == "text") shouldBe empty
      }
    }
  }
}
