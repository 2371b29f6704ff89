package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RandomProjectSpec extends SparkSpec {

  private val dim = 64
  private val outDim = 16

  private def unit(v: Array[Float]): Array[Float] = {
    val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
    v.map(_ / n)
  }

  private lazy val vectors = {
    val rnd = new scala.util.Random(23)
    (0 until 200).map(_ => unit(Array.fill(dim)(rnd.nextFloat() * 2 - 1)))
  }

  test("DataFrame projection equals the plain-array replay (codegen and " +
      "interpreted paths share the core); partition-invariant") {
    import spark.implicits._
    val df = vectors.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    def got(d: org.apache.spark.sql.DataFrame) = d
      .select(col("id"), VectorExpressions.randomProject(col("v"), outDim, 7L))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val a = got(df)
    a.foreach { case (id, p) =>
      p should contain theSameElementsInOrderAs
        ProjectionCore.project(vectors(id.toInt), outDim, 7L)
    }
    got(df.repartition(9)).map { case (k, v) => k -> v.toSeq } shouldBe
      a.map { case (k, v) => k -> v.toSeq }
  }

  test("JL norm preservation: projected squared norms concentrate at 1") {
    import spark.implicits._
    val errs = vectors.toDF("v")
      .select(VectorExpressions.randomProject(col("v"), outDim, 7L).as("p"))
      .collect().map(_.getSeq[Float](0))
      .map(p => p.map(x => x.toDouble * x).sum - 1.0)
    // E[||p||^2] = 1; per-vector sd ~ sqrt(2/outDim) ~ 0.35
    math.abs(errs.sum / errs.size) should be < 0.1  // unbiased
    errs.map(math.abs).sum / errs.size should be < 0.45 // concentrated
  }

  test("neighbor recall survives the 64 -> 16 reduction on a clustered " +
      "corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val centroids = (0 until 20).map(_ =>
      unit(Array.fill(dim)(rnd.nextFloat() * 2 - 1)))
    val corpus = (0 until 1000).map { i =>
      val c = centroids(i % 20)
      (i.toLong, unit(c.map(x => x + 0.05f * (rnd.nextFloat() * 2 - 1))))
    }
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val qv = corpus.head._2
    val pq = ProjectionCore.project(qv, outDim, 7L)
    val projTop = corpus
      .map { case (id, v) =>
        (id, dot(ProjectionCore.project(v, outDim, 7L), pq)) }
      .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1)
    // the honest JL claim at 16 dims: CLUSTER-level neighborhoods survive
    // (distortion ~ sqrt(log n / 16) ~ 0.6 >> the 0.8-ish inter-cluster
    // gaps' complement), but WITHIN-cluster sigma-0.05 ordering sits far
    // below the distortion and ranks ~randomly — the same density
    // envelope RECALL_r6 documented for the 8-bit quantizers. So assert
    // membership, not member identity: the projected top-10 all come
    // from the query's cluster (ids ≡ 0 mod 20).
    projTop.count(_ % 20 == 0) should be >= 9
  }

  test("guards: bad outDim and wrong input type fail loudly") {
    import spark.implicits._
    an[IllegalArgumentException] should be thrownBy
      RandomProject(null, 0, 7L)
    an[Exception] should be thrownBy
      Seq("x").toDF("v")
        .select(VectorExpressions.randomProject(col("v"), outDim, 7L))
        .collect()
  }
}
