package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {

  private def driverPack(rows: Seq[(Long, Long)], budget: Long)
      : Map[Long, (Long, Long, Long, Long)] = {
    var cum = 0L
    rows.sortBy(_._1).map { case (id, w) =>
      val start = cum / budget
      val off = cum % budget
      val spans = if (w == 0L) 0L else (cum + w - 1) / budget - start + 1
      cum += w
      id -> ((w, start, off, spans))
    }.toMap
  }

  private def collectAssign(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap

  test("matches a driver-side sequential walk, including straddlers") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val rows = (0L until 400L).map(i => (i, rnd.nextInt(120).toLong))
    val budget = 256L
    val out = collectAssign(Packing.concatSplitAssign(
      rows.toDF("id", "w"), "id", "w", budget))
    out shouldBe driverPack(rows, budget)
  }

  test("partitioning-invariant: many partitions == one partition") {
    import spark.implicits._
    val rows = (0L until 300L).map(i => (i, (i % 37) + 1))
    val df = rows.toDF("id", "w")
    val a = collectAssign(Packing.concatSplitAssign(
      df.repartition(19), "id", "w", 100L))
    val b = collectAssign(Packing.concatSplitAssign(
      df.coalesce(1), "id", "w", 100L))
    a shouldBe b
  }

  test("stream invariants: offsets in range, chunks contiguous from 0") {
    import spark.implicits._
    val rows = (0L until 500L).map(i => (i, (i * 7 % 90) + 1))
    val budget = 128L
    val out = Packing.concatSplitAssign(rows.toDF("id", "w"), "id", "w",
      budget).collect()
    out.foreach { r =>
      r.getLong(3) should be < budget   // chunk_offset < budget
      r.getLong(3) should be >= 0L
      r.getLong(4) should be >= 1L      // every weighted row spans >= 1
    }
    val total = rows.map(_._2).sum
    val lastChunk = (total - 1) / budget
    out.map(_.getLong(2)).max should be <= lastChunk
    // every chunk in [0, lastChunk] is touched by some row's span
    val touched = out.flatMap(r =>
      r.getLong(2) until (r.getLong(2) + r.getLong(4))).toSet
    touched shouldBe (0L to lastChunk).toSet
  }

  test("zero-weight rows occupy no stream positions but keep a placement") {
    import spark.implicits._
    val rows = Seq((1L, 10L), (2L, 0L), (3L, 10L))
    val out = collectAssign(Packing.concatSplitAssign(
      rows.toDF("id", "w"), "id", "w", 16L))
    out(2L) shouldBe ((0L, 0L, 10L, 0L))  // starts at offset 10, spans 0
    out(3L) shouldBe ((10L, 0L, 10L, 2L)) // unaffected by the empty doc
  }

  test("chunkSummary: every non-tail chunk holds exactly budget weight") {
    import spark.implicits._
    val rnd = new scala.util.Random(9)
    val rows = (0L until 200L).map(i => (i, 1L + rnd.nextInt(300).toLong))
    val budget = 512L
    val assign = Packing.concatSplitAssign(rows.toDF("id", "w"), "id", "w",
      budget)
    val total = rows.map(_._2).sum
    val lastChunk = (total - 1) / budget
    val sums = Packing.chunkSummary(assign, budget).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    sums.keySet shouldBe (0L to lastChunk).toSet
    (0L until lastChunk).foreach { c => sums(c) shouldBe budget }
    sums(lastChunk) shouldBe total - lastChunk * budget
    sums.values.sum shouldBe total
  }

  test("no single-partition window: the plan has no global-order WindowExec") {
    import spark.implicits._
    val df = (0L until 100L).map(i => (i, i % 5 + 1)).toDF("id", "w")
    val plan = Packing.concatSplitAssign(df, "id", "w", 64L)
      .queryExecution.executedPlan.toString
    plan should not include "Window"
  }
}
