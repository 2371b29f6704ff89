package graft.ingest

import graft.SparkSpec
import java.io.{ByteArrayInputStream, FileOutputStream}
import java.nio.file.{Files, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}

class IngestSpec extends SparkSpec {

  test("copyBlocks streams in fixed blocks with progress callbacks") {
    val data = Array.tabulate[Byte](2500)(_.toByte)
    val dest = Files.createTempDirectory("graft").resolve("out.bin")
    var calls = 0
    val n = HttpZipIngest.copyBlocks(new ByteArrayInputStream(data), dest,
      blockSize = 1024, progress = _ => calls += 1)
    n shouldBe 2500
    calls should be >= 3 // 1024 + 1024 + 452
    Files.readAllBytes(dest).toSeq shouldBe data.toSeq
  }

  test("extractAndDelete unzips, deletes archive, rejects zip-slip") {
    val dir = Files.createTempDirectory("graft-zip")
    val zipPath = dir.resolve("a.zip")
    val zout = new ZipOutputStream(new FileOutputStream(zipPath.toFile))
    zout.putNextEntry(new ZipEntry("imgs/one.jpg"))
    zout.write(Array[Byte](1, 2, 3)); zout.closeEntry()
    zout.putNextEntry(new ZipEntry("imgs/two.jpg"))
    zout.write(Array[Byte](4, 5)); zout.closeEntry()
    zout.close()

    val n = HttpZipIngest.extractAndDelete(zipPath.toString,
      dir.resolve("vol").toString)
    n shouldBe 2
    Files.exists(zipPath) shouldBe false // NB:149 cleanup
    Files.readAllBytes(dir.resolve("vol/imgs/one.jpg")).toSeq shouldBe Seq[Byte](1, 2, 3)

    // zip-slip: entry with ../ must be rejected
    val evil = dir.resolve("evil.zip")
    val zevil = new ZipOutputStream(new FileOutputStream(evil.toFile))
    zevil.putNextEntry(new ZipEntry("../escape.txt"))
    zevil.write(Array[Byte](9)); zevil.closeEntry(); zevil.close()
    an[IllegalArgumentException] should be thrownBy
      HttpZipIngest.extractAndDelete(evil.toString, dir.resolve("vol2").toString)
  }

  test("managed table sink (O5/O16): saveAsTable + TBLPROPERTIES + DDL") {
    // warehouse dir is a static conf, set at session build (SparkSpec)
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_test") // O17 schema DDL
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    BinaryIngest.saveAsTable(df, "graft_test.t1")
    spark.table("graft_test.t1").count() shouldBe 2
    // overwrite mode really overwrites
    BinaryIngest.saveAsTable(Seq((9L, "z")).toDF("id", "v"), "graft_test.t1")
    spark.table("graft_test.t1").count() shouldBe 1
    // CDF-style table property (NB:278 analog)
    spark.sql(
      "ALTER TABLE graft_test.t1 SET TBLPROPERTIES (graft.enableChangeDataFeed = true)")
    val props = spark.sql("SHOW TBLPROPERTIES graft_test.t1")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    props.get("graft.enableChangeDataFeed") shouldBe Some("true")
    spark.sql("DROP TABLE graft_test.t1")
    spark.sql("DROP DATABASE graft_test")
  }

  test("CSV and JSON source/sink round-trips preserve values") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "lang", "source", "n_chars")
    val dir = Files.createTempDirectory("graft-fmt")
    docs.write.mode("overwrite").option("header", "true").csv(s"$dir/csv")
    docs.write.mode("overwrite").json(s"$dir/json")
    val csvBack = spark.read.option("header", "true").schema(docs.schema)
      .csv(s"$dir/csv")
    val jsonBack = spark.read.schema(docs.schema).json(s"$dir/json")
    val want = docs.collect().map(_.toSeq).toSet
    csvBack.collect().map(_.toSeq).toSet shouldBe want
    jsonBack.collect().map(_.toSeq).toSet shouldBe want
  }

  test("withDenseIds: dense path-ordered ids, no single-partition stage") {
    val ids = BinaryIngest.withDenseIds(
      BinaryIngest.scan(spark, "/root/testdata/sf0.001", "*.parquet"))
    val rows = ids.select("path", "image_id").collect().sortBy(_.getLong(1))
    rows.map(_.getLong(1)).toSeq shouldBe rows.indices.map(_.toLong)
    rows.map(_.getString(0)).toSeq shouldBe
      rows.map(_.getString(0)).toSeq.sorted
    // scale guard: the old formulation was a global Window (one-partition
    // exchange carrying the binary content); the two-pass shape must never
    // reintroduce either
    // (AQE may still coalesce a tiny input to one task — that's a runtime
    // size decision, not a required-by-the-plan SinglePartition.)
    val p = ids.queryExecution.executedPlan.toString
    (p should not).include("SinglePartition")
    (p should not).include("Window")
  }

  test("full reference pipeline: binary scan -> ids -> embed -> index -> search") {
    val embedder = new graft.embed.DeterministicEmbedder(32)
    val imgDir = graft.multimodal.ImageFixtures.ensure()
    val binary = BinaryIngest.withDenseIds(
      BinaryIngest.scan(spark, imgDir, "*.{png,jpg}"))
    val embedded = BinaryIngest.embedImages(binary, embedder, version = 1L)
    // every real fixture embeds; the corrupt one fails decode and drops
    embedded.count() shouldBe graft.multimodal.ImageFixtures.images.size
    val idx = graft.index.VectorIndex.build(embedded, "pipeline-spec",
      "image_id", "embedding")
    idx.dim shouldBe 32
    // self-query: the top hit for image 0's embedding is image 0
    val qv = embedded.filter(embedded("image_id") === 0)
      .head().getSeq[Float](2).toArray
    val hits = idx.search(qv, k = 3, columns = Seq("filepath")).collect()
    hits.head.getLong(0) shouldBe 0L
    hits.head.getDouble(2) shouldBe 1.0 +- 1e-6
    hits.head.getString(1) should endWith(".png")
  }
}
