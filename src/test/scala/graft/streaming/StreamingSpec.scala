package graft.streaming

import graft.{SparkSpec, TestSpark}
import graft.index.VectorIndex
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamingSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("IndexSync: streamed change rows upsert into the index (TRIGGERED)") {
    import spark.implicits._
    val src = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val idx = VectorIndex.build(src, "stream-sync", "vec_id", "embedding")
    val n0 = idx.size

    val qv = src.filter(col("vec_id") === 2).head().getSeq[Float](1).toArray
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Array[Float], Long)]
    // one new row (vec 2's vector under pk 888888) + one changed row (vec 3
    // also gets vec 2's vector)
    stream.addData((888888L, qv, 2L), (3L, qv, 2L))
    val changes = stream.toDF()
      .select($"_1".as("vec_id"), $"_2".as("embedding"), $"_3".as("version"))
      // align vector element type with the parquet schema (float, not double)
      .withColumn("embedding", $"embedding".cast("array<float>"))
      // state carries (vec_id, embedding, label); fake a label for new rows
      .withColumn("label", lit(-1))
    val q = IndexSync.start(idx, changes.drop("version"),
      s"/tmp/graft-ckpt-${System.nanoTime()}")
    q.awaitTermination(60000)

    idx.size shouldBe n0 + 1
    val top = idx.search(qv, k = 3).collect().map(_.getLong(0)).toSet
    top shouldBe Set(2L, 3L, 888888L) // all three now carry vec 2's vector
  }

  test("IndexSync: a streamed _deleted tombstone removes its pk from the " +
      "served index; a later-versioned re-insert in the next batch wins") {
    import spark.implicits._
    val src = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val idx = VectorIndex.build(src, "stream-del", "vec_id", "embedding")
    val n0 = idx.size
    val qv = src.filter(col("vec_id") === 2).head().getSeq[Float](1).toArray

    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Array[Float], Long, Boolean)]
    val changes = stream.toDF()
      .select($"_1".as("vec_id"),
        $"_2".cast("array<float>").as("embedding"),
        $"_3".as("version"), $"_4".as("_deleted"))
      .withColumn("label", lit(-1))
    // CONTINUOUS mode (processing-time trigger): the two change batches
    // arrive after query start, which AvailableNow would never see
    val q = IndexSync.start(idx, changes,
      s"/tmp/graft-ckpt-del-${System.nanoTime()}", triggered = false)
    // batch 1: delete vec 2 (version 2). It must leave the serving set —
    // the pre-delete rank-1 self match becomes unservable.
    stream.addData((2L, Array.empty[Float], 2L, true))
    q.processAllAvailable()
    idx.size shouldBe n0 - 1
    val after = idx.search(qv, k = 3).collect().map(_.getLong(0)).toSet
    after should not contain 2L
    // batch 2: re-insert vec 2 at version 3 — latest version wins over
    // the tombstone, the pk serves again at rank 1.
    stream.addData((2L, qv, 3L, false))
    q.processAllAvailable()
    q.stop()
    idx.size shouldBe n0
    idx.search(qv, k = 1).head().getLong(0) shouldBe 2L
  }

  test("StreamingRetrieval: streamed queries == exact batch kNN at full " +
      "probe; multi-batch arrival converges to the same state; batch " +
      "relation rejected") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val (indexed, cents) = graft.ops.SimilaritySearch
      .ivfBuild(emb, "vec_id", "embedding", nCells = 4)
    val queries = emb.filter(col("vec_id") < 6)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val expected = graft.ops.SimilaritySearch
      .knnJoin(emb.filter(col("vec_id") < 6), emb, "vec_id", "vec_id",
        "embedding", k = 3)
      .select("query_id", "vec_id", "score", "rank")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    val stream = MemoryStream[(Long, Array[Float])]
    // queries arrive over TWO micro-batches — the stateful top-k must
    // carry batch-1 state, not recompute from scratch
    val df = stream.toDF()
      .select($"_1".as("vec_id"),
        $"_2".cast("array<float>").as("embedding"))
    val res = StreamingRetrieval.knnStream(df, indexed, cents,
      "vec_id", "vec_id", "embedding", k = 3, nProbe = 4)
    val q = res.writeStream.format("memory").queryName("sr_spec")
      .outputMode("complete").start()
    stream.addData(queries.take(3).toIndexedSeq)
    q.processAllAvailable()
    stream.addData(queries.drop(3).toIndexedSeq)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sr_spec")
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), col("col.id"), col("col.score"),
        (col("pos") + 1).cast("int"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    got shouldBe expected
    an[IllegalArgumentException] should be thrownBy
      StreamingRetrieval.knnStream(emb, indexed, cents, "vec_id",
        "vec_id", "embedding", k = 3)
    // a streaming corpus side would silently become an unbounded
    // stream-stream join — rejected up front
    an[IllegalArgumentException] should be thrownBy
      StreamingRetrieval.knnStream(df, df, cents, "vec_id",
        "vec_id", "embedding", k = 3)
  }

  test("StreamingRetrieval at the DERIVED ANN operating point: " +
      "recall@10 >= 0.9 vs the exact drained result") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the resolvable perturbed corpus (Recall's floor geometry): each
    // query's true top-10 is its replica neighborhood, which the probed
    // cells must cover at nProbe << nCells. Geometry unspecified on BOTH
    // the build and the stream — this floor gates what a no-args user of
    // the streaming path actually gets (round 11: derived defaults)
    val corpus = graft.Recall
      .perturbedCorpus(spark, TestSpark.sf0001, reps = 40, sigma = 0.1)
      .repartition(8).persist()
    val n = corpus.count()
    val (ix, cents) = graft.ops.SimilaritySearch.ivfBuildKMeans(
      corpus, "vec_id", "embedding", totalHint = Some(n))
    val indexed = ix.persist()
    indexed.count()
    val base = spark.read
      .parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val queries = base.filter(col("vec_id") < 16)
    val exact = graft.ops.SimilaritySearch
      .knnJoin(queries, corpus, "vec_id", "vec_id", "embedding", k = 10)
      .select("query_id", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val qrows = queries.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toIndexedSeq
    val stream = MemoryStream[(Long, Array[Float])]
    stream.addData(qrows)
    val df = stream.toDF()
      .select($"_1".as("vec_id"), $"_2".cast("array<float>").as("embedding"))
    val res = StreamingRetrieval.knnStream(df, indexed, cents,
      "vec_id", "vec_id", "embedding", k = 10)
    val q = res.writeStream.format("memory").queryName("sr_op_spec")
      .outputMode("complete").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sr_op_spec")
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), col("col.id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.keys.toSeq.map { qid =>
      (exact(qid) & got.getOrElse(qid, Set.empty)).size / 10.0
    }
    val recall10 = recalls.sum / recalls.size
    withClue(s"recall@10 $recall10: ") { recall10 should be >= 0.9 }
    corpus.unpersist(); indexed.unpersist()
  }

  test("windowed aggregate: streaming result equals batch mirror") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (ts(1), "click", 1.0), (ts(5), "click", 2.0), (ts(7), "buy", 5.0),
      (ts(61), "click", 3.0), (ts(65), "buy", 7.0))
    val stream = MemoryStream[(Timestamp, String, Double)]
    val sdf = EventStreams.windowedAggregate(
      stream.toDF().toDF("ts", "event_type", "value"), "1 hour", "2 hours")
    val q = sdf.writeStream.format("memory").queryName("winagg")
      .outputMode("append").start()
    stream.addData(rows: _*)
    q.processAllAvailable()
    // append mode only emits windows once the watermark passes them; a late
    // far-future row flushes the earlier windows
    stream.addData((Timestamp.valueOf("2024-01-02 00:00:00"), "noop", 0.0))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("winagg")
      .select("window_start", "event_type", "n", "sum_value")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    val want = EventStreams.windowedAggregateBatch(
      rows.toDF("ts", "event_type", "value"), "1 hour")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    got.filter(_._2 != "noop") shouldBe want
  }

  test("sessionize: gap splits sessions, event-time timeout closes them") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[EventStreams.Event]
    val out = EventStreams.sessionize(stream.toDS(), gapMs = 30 * 60 * 1000L)
    val q = out.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    // user 1: events at 10:01 and 10:05 (one session), then 11:30 (new
    // session after >30min gap); user 2: single event
    stream.addData(
      EventStreams.Event(1L, ts(1), 1.0),
      EventStreams.Event(1L, ts(5), 2.0),
      EventStreams.Event(1L, Timestamp.valueOf("2024-01-01 11:30:00"), 4.0),
      EventStreams.Event(2L, ts(2), 9.0))
    q.processAllAvailable()
    // advance watermark far enough to time out everything still open
    stream.addData(EventStreams.Event(99L,
      Timestamp.valueOf("2024-01-02 12:00:00"), 0.0))
    q.processAllAvailable()
    stream.addData(EventStreams.Event(98L,
      Timestamp.valueOf("2024-01-03 12:00:00"), 0.0))
    q.processAllAvailable()
    q.stop()

    val sessions = spark.table("sessions").as[EventStreams.Session].collect()
      .filter(_.user_id < 90).sortBy(s => (s.user_id, s.start_ts.getTime))
    sessions.length shouldBe 3
    sessions(0).n_events shouldBe 2 // user 1, 10:01-10:05
    sessions(0).total_value shouldBe 3.0 +- 1e-9
    sessions(1).n_events shouldBe 1 // user 1, 11:30
    sessions(2).user_id shouldBe 2L
  }

  test("streaming dedup: first occurrence per fingerprint, equals batch distinct") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(java.sql.Timestamp, String)]
    val df = stream.toDS().toDF("ts", "text")
    val out = StreamingDedup.exactByFingerprint(df, "ts", "text")
    val q = out.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    val rows = Seq(
      (Timestamp.valueOf("2024-01-01 10:00:00"), "alpha"),
      (Timestamp.valueOf("2024-01-01 10:01:00"), "beta"),
      (Timestamp.valueOf("2024-01-01 10:02:00"), "alpha"), // dup
      (Timestamp.valueOf("2024-01-01 10:03:00"), "gamma"),
      (Timestamp.valueOf("2024-01-01 10:04:00"), "beta"))  // dup
    stream.addData(rows)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("dedup_stream").select("text")
      .collect().map(_.getString(0)).toSeq
    got.sorted shouldBe Seq("alpha", "beta", "gamma")
  }

  test("streaming near-dup by simhash: token-order rewrites dedup, " +
      "distinct content survives, equals batch first-occurrence") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(java.sql.Timestamp, String)]
    val df = stream.toDS().toDF("ts", "text")
    val out = StreamingDedup.nearDupBySimhash(df, "ts", "text")
    val q = out.writeStream.format("memory").queryName("neardup_stream")
      .outputMode("append").start()
    val rows = Seq(
      (Timestamp.valueOf("2024-01-01 10:00:00"), "the quick brown fox"),
      (Timestamp.valueOf("2024-01-01 10:01:00"), "entirely different words here"),
      // same token multiset, different order -> same simhash -> dropped
      (Timestamp.valueOf("2024-01-01 10:02:00"), "brown fox the quick"),
      // extra whitespace only -> same tokens -> dropped
      (Timestamp.valueOf("2024-01-01 10:03:00"), "the  quick   brown fox"),
      (Timestamp.valueOf("2024-01-01 10:04:00"), "yet another document body"))
    stream.addData(rows)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("neardup_stream").select("text")
      .collect().map(_.getString(0)).toSeq
    got.sorted shouldBe Seq("entirely different words here",
      "the quick brown fox", "yet another document body")
    // batch mirror: first occurrence per signature over the same rows
    val batch = rows.toDF("ts", "text")
      .withColumn("__sig", graft.ops.Dedup.simhash(
        graft.functions.TextFunctions.tokens(col("text"))))
      .withColumn("__rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("__sig")
          .orderBy("ts")))
      .filter(col("__rn") === 1)
      .select("text").collect().map(_.getString(0)).toSeq
    got.sorted shouldBe batch.sorted
  }

  test("hashSample is stateless: identical rows pass on stream and batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Long]
    val ids = (0L until 2000L)
    val out = graft.ops.Sampling.hashSample(
      stream.toDS().toDF("id"), "id", 0.25)
    val q = out.writeStream.format("memory").queryName("sample_stream")
      .outputMode("append").start()
    stream.addData(ids)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sample_stream").collect().map(_.getLong(0)).toSet
    val want = graft.ops.Sampling.hashSample(ids.toDF("id"), "id", 0.25)
      .collect().map(_.getLong(0)).toSet
    got shouldBe want
  }

  test("sessionize: streaming equals the batch window mirror on the fixture") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = graft.queries.GraftQueries.normalizeEventTs(
        spark.read.parquet(s"${graft.TestSpark.sf0001}/events.parquet"))
      .select($"user_id", $"ts", $"value")
    val rows = ev.as[EventStreams.Event].collect().toSeq

    val stream = MemoryStream[EventStreams.Event]
    val out = EventStreams.sessionize(stream.toDS(), gapMs = 30 * 60 * 1000L)
    val q = out.writeStream.format("memory").queryName("sess_fixture")
      .outputMode("append").start()
    stream.addData(rows)
    q.processAllAvailable()
    // flush: push the watermark past every open session's timeout
    stream.addData(EventStreams.Event(999999L,
      Timestamp.valueOf("2030-01-01 00:00:00"), 0.0))
    q.processAllAvailable()
    stream.addData(EventStreams.Event(999998L,
      Timestamp.valueOf("2031-01-01 00:00:00"), 0.0))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("sess_fixture").as[EventStreams.Session].collect()
      .filter(_.user_id < 999000L)
      .map(s => (s.user_id, s.start_ts.getTime, s.end_ts.getTime,
        s.n_events, math.round(s.total_value * 1e6)))
      .toSet

    // batch mirror: the q42 lag/flag/cumsum formulation
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val wOrd = Window.partitionBy($"user_id").orderBy($"ts")
    val want = ev
      .withColumn("prev", lag($"ts", 1).over(wOrd))
      .withColumn("new_s", when($"prev".isNull ||
        unix_micros($"ts") - unix_micros($"prev") > 1800000000L, 1L)
        .otherwise(0L))
      .withColumn("sid", sum($"new_s").over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"sid")
      .agg(min($"ts").as("start_ts"), max($"ts").as("end_ts"),
        count(lit(1)).as("n"), sum($"value").as("total"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(2).getTime,
        r.getTimestamp(3).getTime, r.getLong(4).toInt,
        math.round(r.getDouble(5) * 1e6)))
      .toSet
    got shouldBe want
  }

  test("stream-stream interval join equals the batch interval join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // errors at :01 and :30; clicks inside/outside the [-10 min, +5 min]
    // window around each error
    val errs = Seq((1L, ts(1), 100L), (1L, ts(30), 101L), (2L, ts(30), 102L))
    val clks = Seq((1L, ts(4), 900L), (1L, ts(25), 901L), (1L, ts(50), 902L),
      (2L, ts(28), 903L), (3L, ts(30), 904L))
    val es = MemoryStream[(Long, Timestamp, Long)]
    val cs = MemoryStream[(Long, Timestamp, Long)]
    val joined = EventStreams.intervalJoinStream(
      es.toDF().toDF("user_id", "e_ts", "error_id"),
      cs.toDF().toDF("user_id", "c_ts", "click_id"),
      "user_id", "e_ts", "c_ts", "'10' MINUTE", "'5' MINUTE",
      watermark = "1 minute")
    val q = joined.writeStream.format("memory").queryName("ssjoin")
      .outputMode("append").start()
    es.addData(errs: _*); cs.addData(clks: _*)
    q.processAllAvailable()
    // advance both watermarks far enough to flush all pairs
    es.addData((8L, ts(59), 0L)); cs.addData((9L, ts(59), 0L))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ssjoin")
      .select($"error_id", $"click_id").as[(Long, Long)].collect().toSet
    // batch twin on the same rows
    val want = graft.ops.TemporalJoin.intervalJoin(
      errs.toDF("user_id", "ts_us", "error_id")
        .withColumn("ts_us", unix_micros($"ts_us")),
      clks.toDF("user_id", "ts_us", "click_id")
        .withColumn("ts_us", unix_micros($"ts_us")),
      "user_id", "ts_us", "ts_us", rightPayload = Seq("click_id"),
      before = 600000000L, after = 300000000L)
      .select($"error_id", $"matched_click_id").as[(Long, Long)]
      .collect().toSet
    want should not be empty
    got shouldBe want
  }

  test("streaming cms_sketch over multi-batch arrival equals the batch " +
      "sketch bit for bit (counters are order-invariant sums)") {
    import graft.expressions.SketchExpressions
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val terms = (0 until 12).flatMap(i => Seq.fill(i + 1)(s"t$i"))
    val batchSk = terms.toDF("term")
      .agg(SketchExpressions.cmsSketch(col("term"), 4, 128).as("sk"))
      .head().getSeq[Long](0)
    val stream = MemoryStream[String]
    val q = stream.toDF().select($"value".as("term"))
      .agg(SketchExpressions.cmsSketch(col("term"), 4, 128).as("sk"))
      .writeStream.format("memory").queryName("cms_stream_spec")
      .outputMode("complete").start()
    val (a, b) = terms.splitAt(terms.size / 3)
    stream.addData(a); q.processAllAvailable()
    stream.addData(b); q.processAllAvailable()
    q.stop()
    spark.table("cms_stream_spec").head().getSeq[Long](0) shouldBe batchSk
  }

  test("StreamingCc: multi-batch drained component map equals the " +
      "from-scratch batch componentMap, regardless of batch slicing") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(53)
    val all = (0 until 150).map(_ =>
      (rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
      .filter { case (a, b) => a != b }
    val scratch = graft.ops.Dedup.componentMap(all.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (nBatches <- Seq(1, 3, 5)) {
      val stream = MemoryStream[(Long, Long)]
      val pairs = stream.toDF().select($"_1".as("id_a"), $"_2".as("id_b"))
      val (q, stateFn) = StreamingCc.start(pairs, triggered = false)
      all.grouped(math.max(1, all.size / nBatches)).foreach { g =>
        stream.addData(g: _*)
        q.processAllAvailable() // one real micro-batch per group
      }
      q.stop()
      val state = stateFn()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // scratch keys every non-root member; the drained state also
      // carries roots as self-reps — agree on the shared domain, and
      // every extra id must be a self-rep root
      scratch.foreach { case (id, rep) => state(id) shouldBe rep }
      (state.keySet -- scratch.keySet).foreach { id =>
        state(id) shouldBe id
      }
    }
  }
}
