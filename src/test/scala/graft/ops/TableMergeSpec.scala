package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TableMergeSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("applyChanges: update, delete, insert, insert-on-existing-key") {
    import spark.implicits._
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("pk", "v")
    val changes = Seq(
      (2L, "B", "U"),  // update
      (3L, "x", "D"),  // delete (payload ignored)
      (4L, "d", "I"),  // insert new key
      (1L, "A", "I"))  // "insert" on an existing key upserts, no dup
      .toDF("pk", "v", "op")
    rows(TableMerge.applyChanges(base, changes, "pk")) shouldBe
      Map(1L -> "A", 2L -> "B", 4L -> "d")
  }

  test("applyChanges: delete on a missing key is a no-op; empty changes " +
      "return the base") {
    import spark.implicits._
    val base = Seq((1L, "a")).toDF("pk", "v")
    val ghostDelete = Seq((9L, "x", "D")).toDF("pk", "v", "op")
    rows(TableMerge.applyChanges(base, ghostDelete, "pk")) shouldBe
      Map(1L -> "a")
    val empty = Seq.empty[(Long, String, String)].toDF("pk", "v", "op")
    rows(TableMerge.applyChanges(base, empty, "pk")) shouldBe Map(1L -> "a")
  }

  test("applyChanges: NULL or unrecognized op fails loudly instead of " +
      "being silently absorbed") {
    import spark.implicits._
    val base = Seq((1L, "a")).toDF("pk", "v")
    val badOp = Seq((2L, "b", "X")).toDF("pk", "v", "op")
    val exBad = intercept[Exception] {
      TableMerge.applyChanges(base, badOp, "pk").collect()
    }
    exBad.getMessage should include("must be one of I/U/D")
    val nullOp = Seq((2L, "b", null.asInstanceOf[String]))
      .toDF("pk", "v", "op")
    val exNull = intercept[Exception] {
      TableMerge.applyChanges(base, nullOp, "pk").collect()
    }
    exNull.getMessage should include("must be one of I/U/D")
  }

  test("the anti join ships keys only (payload never joins)") {
    import spark.implicits._
    val base = Seq((1L, "a" * 200)).toDF("pk", "v")
    val changes = Seq((1L, "b" * 200, "U")).toDF("pk", "v", "op")
    val plan = TableMerge.applyChanges(base, changes, "pk")
      .queryExecution.executedPlan.toString
    // the join's build side must be the bare key projection
    plan should include("__mk")
  }
}
