package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TableChecksSpec extends SparkSpec {

  private def viol(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("pkUnique counts duplicate and null key tuples") {
    import spark.implicits._
    val t = Seq(Some(1L), Some(2L), Some(2L), Some(2L), None)
      .toDF("id")
    viol(TableChecks.pkUnique(t, Seq("id"), "pk")) shouldBe
      Map("pk" -> 3L) // 5 rows, 2 distinct non-null keys
    val clean = Seq(1L, 2L, 3L).toDF("id")
    viol(TableChecks.pkUnique(clean, Seq("id"), "pk")) shouldBe
      Map("pk" -> 0L)
    // composite key: same first column, distinct pairs
    val comp = Seq((1L, "a"), (1L, "b")).toDF("a", "b")
    viol(TableChecks.pkUnique(comp, Seq("a", "b"), "pk")) shouldBe
      Map("pk" -> 0L)
  }

  test("fkContainment counts orphans, ignores null keys") {
    import spark.implicits._
    val parent = Seq(1L, 2L).toDF("pid")
    val child = Seq(Some(1L), Some(2L), Some(2L), Some(9L), None)
      .toDF("cid")
    viol(TableChecks.fkContainment(child, "cid", parent, "pid", "fk")) shouldBe
      Map("fk" -> 1L) // only the 9L orphan; null is notNull's business
  }

  test("fkContainment works when FK and PK share a column name") {
    import spark.implicits._
    val parent = Seq(1L, 2L).toDF("custkey")
    val child = Seq(1L, 9L).toDF("custkey")
    viol(TableChecks.fkContainment(child, "custkey", parent, "custkey",
      "fk")) shouldBe Map("fk" -> 1L)
  }

  test("notNull and satisfies; null predicate result is a violation") {
    import spark.implicits._
    val t = Seq(Some(5.0), Some(-1.0), None).toDF("v")
    viol(TableChecks.notNull(t, "v", "nn")) shouldBe Map("nn" -> 1L)
    // -1 fails the predicate, NULL evaluates to unknown -> violation
    viol(TableChecks.satisfies(t, col("v") > 0, "pos")) shouldBe
      Map("pos" -> 2L)
  }

  test("kAnonymity: small groups surface with identity, null tuples are " +
      "groups, well-populated groups filter out") {
    import spark.implicits._
    val t = (Seq.fill(5)(("en", "a")) ++ Seq(("en", "b"), ("en", "b")) ++
        Seq(("fr", null)) ++ Seq.fill(3)((null, "a")))
      .toDF("lang", "source")
    val got = TableChecks.kAnonymity(t, Seq("lang", "source"), k = 4)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    // ("en","a") has 5 >= 4 rows -> absent; the rest are re-identifiable
    got shouldBe Map(("en", "b") -> 2L, ("fr", null) -> 1L,
      ((null, "a"): (String, String)) -> 3L)
    an[IllegalArgumentException] should be thrownBy
      TableChecks.kAnonymity(t, Seq("lang"), k = 1)
  }

  test("a suite unions into one (chk, violations) frame") {
    import spark.implicits._
    val t = Seq(1L, 1L).toDF("id")
    val suite = TableChecks.pkUnique(t, Seq("id"), "pk")
      .unionAll(TableChecks.notNull(t, "id", "nn"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    suite shouldBe Map("pk" -> 1L, "nn" -> 0L)
  }
}
