package graft

class GraftExtensionsSpec extends SparkSpec {

  test("registered SQL functions: vec_dot / vec_cosine / sorted_count_common") {
    import spark.implicits._
    GraftFunctions.register(spark)
    Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f), Seq("a", "b", "c"), Seq("b", "c", "d")))
      .toDF("a", "b", "sa", "sb").createOrReplaceTempView("g_funcs_test")
    val r = spark.sql(
      """SELECT vec_dot(a, b) AS d, vec_cosine(a, b) AS c,
                sorted_count_common(sa, sb) AS n FROM g_funcs_test""").head()
    r.getDouble(0) shouldBe 11.0 +- 1e-9
    r.getDouble(1) shouldBe 11.0 +- 1e-9
    r.getInt(2) shouldBe 2
  }

  test("extensions class installs the same functions at session build time") {
    // the shared test session already exists; verify the extension object
    // exposes the same builders the registry path uses
    GraftFunctions.all.map(_._1).toSet shouldBe
      Set("vec_dot", "vec_cosine", "sorted_count_common", "mg_topk",
        "vec_topk")
  }
}
