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
        "vec_topk", "minhash_sig", "simhash64", "bloom_might_contain_long",
        "cms_sketch", "cms_estimate")
  }

  test("cms_sketch / cms_estimate SQL functions match the Column twins " +
      "and guard non-literal shapes") {
    import graft.expressions.SketchExpressions
    import org.apache.spark.sql.functions._
    import spark.implicits._
    GraftFunctions.register(spark)
    val terms = (0 until 8).flatMap(i => Seq.fill(i + 1)(s"t$i"))
      .toDF("term")
    terms.createOrReplaceTempView("g_cms_test")
    val viaSql = spark.sql(
      """WITH sk AS (SELECT cms_sketch(term, 4, 64) AS s FROM g_cms_test)
         SELECT term, cms_estimate(s, term, 4, 64) AS e
         FROM (SELECT DISTINCT term FROM g_cms_test) CROSS JOIN sk""")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sk = terms.agg(
      SketchExpressions.cmsSketch(col("term"), 4, 64).as("s"))
    val viaCol = terms.distinct().crossJoin(sk)
      .select(col("term"), SketchExpressions.cmsEstimate(col("s"),
        col("term"), 4, 64).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    viaSql shouldBe viaCol
    viaSql.keySet shouldBe (0 until 8).map(i => s"t$i").toSet
    an[Exception] should be thrownBy
      spark.sql("SELECT cms_sketch(term, term, 64) FROM g_cms_test").collect()
  }

  test("minhash_sig / simhash64 SQL functions match their Column twins") {
    import graft.functions.TextFunctions.tokens
    import org.apache.spark.sql.functions._
    import spark.implicits._
    GraftFunctions.register(spark)
    Seq("the quick brown fox", "pack my box with five dozen jugs")
      .toDF("text").createOrReplaceTempView("g_sig_test")
    val viaSql = spark.sql(
      """SELECT minhash_sig(sort_array(array_distinct(
               filter(split(text, '\\s+'), x -> length(x) > 0))), 16) AS mh,
              simhash64(filter(split(text, '\\s+'),
                x -> length(x) > 0)) AS sh
         FROM g_sig_test""").collect()
    val viaCol = spark.table("g_sig_test")
      .select(
        graft.expressions.SketchExpressions.minhashSignature(
          sort_array(array_distinct(tokens(col("text")))), 16).as("mh"),
        graft.expressions.SketchExpressions.simhash64(tokens(col("text")))
          .as("sh"))
      .collect()
    viaSql.map(_.getSeq[Long](0)) shouldBe viaCol.map(_.getSeq[Long](0))
    viaSql.map(_.getLong(1)) shouldBe viaCol.map(_.getLong(1))
  }

  test("bloom_might_contain_long SQL function probes a serialized filter") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val bloom = spark.range(100).stat.bloomFilter("id", 100L, 0.01)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos); bos.toByteArray
    }
    Seq(5L, 7L).toDF("x").createOrReplaceTempView("g_bloom_test")
    // no false negatives, ever: both members must survive the probe
    spark.sql("SELECT x FROM g_bloom_test WHERE bloom_might_contain_long(" +
        s"x, ${literalFor(bytes)})")
      .collect().map(_.getLong(0)).toSet shouldBe Set(5L, 7L)
  }

  private def literalFor(bytes: Array[Byte]): String =
    "X'" + bytes.map(b => f"$b%02X").mkString + "'"
}
