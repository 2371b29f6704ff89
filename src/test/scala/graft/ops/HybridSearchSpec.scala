package graft.ops

import graft.SparkSpec
import graft.embed.DeterministicEmbedder
import graft.ingest.BinaryIngest

class HybridSearchSpec extends SparkSpec {

  test("bm25: docs containing query terms outrank docs that don't") {
    import spark.implicits._
    val df = Seq(
      (1L, "spark query engine for vectors"),
      (2L, "spark spark spark"),
      (3L, "gardening tips for spring"),
      (4L, "query planning in a distributed engine")).toDF("doc_id", "text")
    val scores = HybridSearch.bm25(df, "doc_id", "text", "spark query")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    scores.keySet shouldBe Set(1L, 2L, 4L) // doc 3 matches nothing
    scores(1L) should be > scores(2L) // both terms beat one repeated term
  }

  test("hybrid RRF fuses keyword and vector rankings") {
    import spark.implicits._
    val embedder = new DeterministicEmbedder(64)
    val docs = Seq(
      (1L, "red widget small bolt"),
      (2L, "blue casing giant ring"),
      (3L, "red widget giant panel"),
      (4L, "unrelated gardening text")).toDF("doc_id", "text")
    val withVec = BinaryIngest.embedText(docs, embedder, "text", "doc_id")
      .join(docs, "doc_id")
    val out = HybridSearch.search(withVec, "doc_id", "text", "embedding",
      "red widget", embedder.forQuery("red widget"), k = 4)
      .collect().map(_.getAs[Long]("id"))
    // docs 1 and 3 contain both query terms AND embed closest — must lead
    out.take(2).toSet shouldBe Set(1L, 3L)
  }
}
