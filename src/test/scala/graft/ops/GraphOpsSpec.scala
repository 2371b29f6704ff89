package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphOpsSpec extends SparkSpec {

  // seeded Erdős–Rényi-ish graph: 60 nodes, ~15% of id-ordered pairs
  private lazy val randomEdges: Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    (for {
      u <- 0L until 60L
      v <- (u + 1) until 60L
      if rnd.nextDouble() < 0.15
    } yield (u, v)).toSeq
  }

  private def bruteTriangles(edges: Seq[(Long, Long)])
      : (Map[Long, Long], Map[Long, Long]) = {
    val adj = edges.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val nodes = adj.keys.toSeq.sorted
    val triPerNode = scala.collection.mutable.Map[Long, Long]()
      .withDefaultValue(0L)
    for {
      u <- nodes; v <- adj(u) if v > u; w <- adj(v) if w > v
      if adj(u).contains(w)
    } {
      triPerNode(u) += 1; triPerNode(v) += 1; triPerNode(w) += 1
    }
    (adj.map { case (n, s) => n -> s.size.toLong },
      triPerNode.toMap.withDefaultValue(0L))
  }

  test("triangleStats matches brute force on a random graph") {
    import spark.implicits._
    val (deg, tri) = bruteTriangles(randomEdges)
    val got = GraphOps.triangleStats(
      randomEdges.toDF("src", "dst").repartition(7), "src", "dst")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    got.map(_._1).toSet shouldBe deg.keySet
    got.foreach { case (n, d, t, c) =>
      d shouldBe deg(n)
      t shouldBe tri(n)
      val expC = if (d >= 2) 2.0 * t / (d * (d - 1.0)) else 0.0
      c shouldBe expC
    }
    // sanity: the fixture actually has triangles
    got.map(_._3).sum / 3 should be > 0L
  }

  test("edge direction and duplicate edges do not change the result") {
    import spark.implicits._
    val canonical = GraphOps.triangleStats(
      randomEdges.toDF("src", "dst"), "src", "dst")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val messy = randomEdges.flatMap { case (u, v) =>
      Seq((v, u), (u, v), (v, u)) } // reversed + duplicated
    val got = GraphOps.triangleStats(messy.toDF("src", "dst"), "src", "dst")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    got shouldBe canonical
  }

  test("coOccurrencePairs: support counts, threshold, basket dedup") {
    import spark.implicits._
    val baskets = Seq( // (basket, item); b1 has a dup row to dedup
      (1L, "a"), (1L, "b"), (1L, "c"), (1L, "a"),
      (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "b"), (3L, "d"))
    val all = GraphOps.coOccurrencePairs(baskets.toDF("b", "i"), "b", "i")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    all(("a", "b")) shouldBe 3L
    all(("a", "c")) shouldBe 1L
    all(("b", "d")) shouldBe 1L
    val freq = GraphOps.coOccurrencePairs(baskets.toDF("b", "i"), "b", "i",
      minSupport = 2L).collect()
    freq.map(r => (r.getString(0), r.getString(1))).toSet shouldBe
      Set(("a", "b"))
  }

  test("maxBasketSize drops oversized baskets before the pair join") {
    import spark.implicits._
    val baskets = Seq((1L, "a"), (1L, "b"),
      (2L, "a"), (2L, "b"), (2L, "c"), (2L, "d")) // basket 2 size 4
    val capped = GraphOps.coOccurrencePairs(baskets.toDF("b", "i"),
      "b", "i", maxBasketSize = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    capped shouldBe Map(("a", "b") -> 1L) // only basket 1 survives
  }

  test("edgeJaccard matches brute force; isolated edge scores 0") {
    import spark.implicits._
    val adj = randomEdges.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // append an isolated edge far from the random graph's id range
    val withIso = randomEdges :+ (1000L, 1001L)
    val got = GraphOps.edgeJaccard(
      withIso.toDF("src", "dst").repartition(6), "src", "dst")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    got.keySet shouldBe withIso.toSet
    got((1000L, 1001L)) shouldBe ((0L, 0.0))
    randomEdges.foreach { case (u, v) =>
      val c = (adj(u) & adj(v)).size.toLong
      val union = adj(u).size + adj(v).size - 2 - c
      val expJ = if (union > 0) c.toDouble / union else 0.0
      got((u, v)) shouldBe ((c, expJ))
    }
  }

  test("associationMetrics: support, confidence, lift on a hand fixture") {
    import spark.implicits._
    // 4 baskets: {a,b} x2, {a,c}, {b}; N=4, ca=3, cb=3, cc=1
    val baskets = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "c"), (4L, "b"))
    val got = GraphOps.associationMetrics(baskets.toDF("b", "i"), "b", "i")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    got(("a", "b")) shouldBe ((2L, 2.0 / 3, 2.0 / 3, 4.0 * 2 / (3.0 * 3)))
    got(("a", "c")) shouldBe ((1L, 1.0 / 3, 1.0, 4.0 * 1 / (3.0 * 1)))
    // lift > 1 iff the pair co-occurs more than independence predicts
    got(("a", "c"))._4 should be > 1.0
  }

  test("associationMetrics with maxBasketSize computes N, item counts and " +
      "supports over the SAME capped population") {
    import spark.implicits._
    // basket 2 (size 4) is dropped by the cap; the survivors are
    // {a,b}, {a,c}, {b}: N=3, ca=2, cb=2, cc=1
    val baskets = Seq((1L, "a"), (1L, "b"),
      (2L, "a"), (2L, "b"), (2L, "c"), (2L, "d"),
      (3L, "a"), (3L, "c"), (4L, "b"))
    val got = GraphOps.associationMetrics(baskets.toDF("b", "i"), "b", "i",
      maxBasketSize = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    got(("a", "b")) shouldBe ((1L, 0.5, 0.5, 3.0 * 1 / (2.0 * 2)))
    got(("a", "c")) shouldBe ((1L, 0.5, 1.0, 3.0 * 1 / (2.0 * 1)))
  }

  test("associationMetrics matches a driver mirror on random baskets " +
      "and is partition-invariant") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val baskets = (1L to 40L).flatMap { b =>
      rnd.shuffle((0 until 12).toList).take(2 + rnd.nextInt(4))
        .map(i => (b, s"i$i"))
    }
    val bySet = baskets.groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    val n = bySet.size.toDouble
    val ci = baskets.map(_._2).distinct
      .map(i => i -> bySet.values.count(_.contains(i)).toLong).toMap
    def run(parts: Int) = GraphOps.associationMetrics(
      baskets.toDF("b", "i").repartition(parts), "b", "i")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    val got = run(4)
    got shouldBe run(9) // bit-identical across partitionings
    got.foreach { case ((a, b), (sup, cab, cba, lift)) =>
      val expSup = bySet.values.count(s => s(a) && s(b)).toLong
      sup shouldBe expSup
      cab shouldBe expSup / ci(a).toDouble
      cba shouldBe expSup / ci(b).toDouble
      lift shouldBe n * expSup / (ci(a).toDouble * ci(b))
    }
  }

  test("pageRank matches the driver mirror; ranks sum to 1") {
    import spark.implicits._
    val adj = randomEdges.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val nodes = adj.keys.toSeq
    val nn = nodes.size.toDouble
    var r = nodes.map(_ -> 1.0 / nn).toMap
    for (_ <- 1 to 5) {
      val contrib = scala.collection.mutable.Map[Long, Double]()
        .withDefaultValue(0.0)
      for (u <- nodes; v <- adj(u)) contrib(v) += r(u) / adj(u).size
      r = nodes.map(n => n -> ((1.0 - 0.85) / nn + 0.85 * contrib(n))).toMap
    }
    val got = GraphOps.pageRank(
      randomEdges.toDF("src", "dst").repartition(5), "src", "dst",
      iterations = 5)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    got.keySet shouldBe r.keySet
    got.foreach { case (n, v) => v shouldBe r(n) +- 1e-12 }
    got.values.sum shouldBe 1.0 +- 1e-9 // no dangling nodes
  }

  test("pageRank: a star center outranks its leaves") {
    import spark.implicits._
    val star = (1L to 20L).map(i => (0L, i))
    val got = GraphOps.pageRank(star.toDF("src", "dst"), "src", "dst")
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val leaves = (1L to 20L).map(got)
    got(0L) should be > leaves.max * 2
    leaves.toSet.size shouldBe 1 // symmetric leaves tie exactly
  }

  test("triangleStats property sweep: three densities match brute force") {
    import spark.implicits._
    for (seed <- Seq(1, 2, 3)) {
      val rnd = new scala.util.Random(seed)
      val p = 0.05 * seed // sparse, medium, dense
      val es = (for {
        u <- 0L until 40L; v <- (u + 1) until 40L
        if rnd.nextDouble() < p
      } yield (u, v)).toSeq
      val (deg, tri) = bruteTriangles(es)
      val got = GraphOps.triangleStats(es.toDF("src", "dst"), "src", "dst")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
      got.keySet shouldBe deg.keySet
      got.foreach { case (n, (d, t)) =>
        d shouldBe deg(n); t shouldBe tri(n)
      }
    }
  }

  test("triangleStats survives a 20k-leaf celebrity node") {
    import spark.implicits._
    // degree orientation points every edge leaf->hub, so the wedge join
    // generates ZERO candidates here; the unoriented formulation would
    // enumerate C(20k, 2) ~ 2e8 wedges at the hub
    val star = (1L to 20000L).map(i => (0L, i))
    val got = GraphOps.triangleStats(star.toDF("src", "dst"), "src", "dst")
    got.filter(col("n_tri") =!= 0L).count() shouldBe 0L
    got.filter(col("n") === 0L).select("degree")
      .head().getLong(0) shouldBe 20000L
    got.count() shouldBe 20001L
  }

  test("triangle joins carry ids and degrees only (no payload columns)") {
    import spark.implicits._
    // payload column must be pruned before any exchange
    val df = randomEdges.toDF("src", "dst")
      .withColumn("payload", lit("x" * 100))
    val plan = GraphOps.triangleStats(df, "src", "dst")
      .queryExecution.executedPlan.toString
    plan should not include "payload"
  }

  test("bfsHops matches a driver BFS: min hops, maxHops bound, " +
      "unreachable and absent-seed handling") {
    import spark.implicits._
    // chain 0-1-2-3-4, branch 1-10, separate component {20, 21}
    val es = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (1L, 10L),
      (20L, 21L))
    def brute(srcs: Set[Long], cap: Int): Map[Long, Long] = {
      val adj = es.flatMap { case (u, v) => Seq(u -> v, v -> u) }
        .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      var dist = srcs.filter(adj.contains).map(_ -> 0L).toMap
      var frontier = dist.keySet
      for (h <- 1 to cap) {
        val next = frontier.flatMap(adj(_)).diff(dist.keySet)
        dist ++= next.map(_ -> h.toLong)
        frontier = next
      }
      dist
    }
    val df = es.toDF("src", "dst")
    for (cap <- Seq(0, 1, 2, 10)) {
      val got = GraphOps.bfsHops(df, "src", "dst", Seq(0L, 20L), cap)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      withClue(s"cap=$cap: ") { got shouldBe brute(Set(0L, 20L), cap) }
    }
    // node 4 unreachable within 3 hops of {0}; seed 99 not in the graph
    val g3 = GraphOps.bfsHops(df, "src", "dst", Seq(0L, 99L), 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    g3 shouldBe Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 10L -> 2L, 3L -> 3L)
  }

  test("personalizedPageRank matches the driver mirror; teleport " +
      "concentrates rank on the seeds; ranks sum to 1") {
    import spark.implicits._
    val seeds = Set(1L, 2L)
    val adj = randomEdges.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val nodes = adj.keys.toSeq
    val ns = seeds.count(adj.contains).toDouble
    val t = nodes.map(n => n -> (if (seeds(n)) 1.0 / ns else 0.0)).toMap
    var r = t
    for (_ <- 1 to 5) {
      val contrib = scala.collection.mutable.Map[Long, Double]()
        .withDefaultValue(0.0)
      for (u <- nodes; v <- adj(u)) contrib(v) += r(u) / adj(u).size
      r = nodes.map(n => n -> ((1.0 - 0.85) * t(n) + 0.85 * contrib(n))).toMap
    }
    val got = GraphOps.personalizedPageRank(
      randomEdges.toDF("src", "dst").repartition(5), "src", "dst",
      seeds = seeds.toSeq, iterations = 5)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    got.keySet shouldBe r.keySet
    got.foreach { case (n, v) => v shouldBe r(n) +- 1e-12 }
    got.values.sum shouldBe 1.0 +- 1e-9
    // seed-anchored: seeds outrank the global uniform share
    seeds.foreach(s => got(s) should be > 1.0 / nodes.size)
  }

  test("personalizedPageRank rejects an all-absent seed set") {
    import spark.implicits._
    val df = Seq((1L, 2L)).toDF("src", "dst")
    an[IllegalArgumentException] should be thrownBy
      GraphOps.personalizedPageRank(df, "src", "dst", seeds = Seq(99L))
  }

  test("coreness: hand graph, peeling-replay parity on random graphs, " +
      "maxIter guard") {
    import spark.implicits._
    def run(edges: Seq[(Long, Long)], maxIter: Int = 50): Map[Long, Long] =
      GraphOps.coreness(edges.toDF("src", "dst"), "src", "dst", maxIter)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // K4 {1..4} + a path 4-5-6: clique nodes core 3, path nodes core 1
    val k4 = for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)
    run(k4 ++ Seq((4L, 5L), (5L, 6L))) shouldBe
      Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L, 5L -> 1L, 6L -> 1L)

    // independent textbook peeling replay on seeded random graphs
    def peel(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      import scala.collection.mutable
      val adj = mutable.Map.empty[Long, mutable.Set[Long]]
      edges.foreach { case (u, v) => if (u != v) {
        adj.getOrElseUpdate(u, mutable.Set.empty) += v
        adj.getOrElseUpdate(v, mutable.Set.empty) += u
      }}
      val deg = mutable.Map.empty[Long, Int] ++ adj.view.mapValues(_.size)
      val rem = mutable.TreeSet.empty[(Int, Long)] ++
        deg.iterator.map { case (n, d) => (d, n) } // iterator: no Map-key collapse
      val core = mutable.Map.empty[Long, Long]
      while (rem.nonEmpty) {
        val (d, n) = rem.head; rem.remove((d, n))
        core(n) = d.toLong
        // BZ guard: only neighbors ABOVE the removal degree decrement
        adj(n).foreach { m => if (!core.contains(m) && deg(m) > d) {
          rem.remove((deg(m), m)); deg(m) -= 1; rem.add((deg(m), m))
        }}
        adj(n).foreach(m => adj(m) -= n)
      }
      core.toMap
    }
    val rnd = new scala.util.Random(17)
    val edges = (0 until 600).map(_ =>
      (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter { case (a, b) => a != b }.distinct
    run(edges) shouldBe peel(edges)

    // the fixpoint needs more than one round on a graph whose degrees
    // overestimate coreness — maxIter=1 must fail loudly, not return
    // upper bounds
    an[IllegalArgumentException] should be thrownBy
      run(k4 ++ Seq((4L, 5L), (5L, 6L)), maxIter = 1)
    // same loud-failure contract from the block-relaxation regime (node
    // 4's drop to 3 means superstep 0 always reports changes)
    spark.conf.set("spark.graft.coreness.localEdgeThreshold", "0")
    try an[IllegalArgumentException] should be thrownBy
      run(k4 ++ Seq((4L, 5L), (5L, 6L)), maxIter = 1)
    finally spark.conf.unset("spark.graft.coreness.localEdgeThreshold")
  }

  test("coreness: every execution regime (local pass, distributed full, " +
      "distributed tail, observe, isempty) agrees on the same graph") {
    import spark.implicits._
    // a 700-node random blob (converges in a few big-frontier rounds) +
    // a 22-node path hung off node 0: the path's coreness-1 wave settles
    // ONE node per round — ~22 deterministic tiny-frontier rounds, the
    // broadcast-tail regime's exact target (nbT a few rows vs
    // adjCnt/16 ≈ several hundred, so the graph-relative guard passes)
    val rnd = new scala.util.Random(29)
    val blob = (0 until 2800).map(_ =>
      (rnd.nextInt(700).toLong, rnd.nextInt(700).toLong))
      .filter { case (a, b) => a != b }.distinct
    val path = (0 until 22).map(i =>
      (if (i == 0) 0L else 10000L + i - 1, 10000L + i))
    val edges = blob ++ path
    def run(): Map[Long, Long] =
      GraphOps.coreness(edges.toDF("src", "dst"), "src", "dst")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = run() // local pass (default thresholds at this size)
    def withConf(kvs: (String, String)*)(f: => Map[Long, Long])
        : Map[Long, Long] =
      try { kvs.foreach { case (k, v) => spark.conf.set(k, v) }; f }
      finally kvs.foreach { case (k, _) => spark.conf.unset(k) }
    val syncRounds = GraphOps.lastCorenessTelemetry.get.rounds
    // block-relaxation regime (the round-9 distributed default)
    withConf("spark.graft.coreness.localEdgeThreshold" -> "0")(run()) shouldBe
      expected
    GraphOps.lastCorenessTelemetry.get.mode shouldBe "block"
    // each superstep makes at least one synchronous round of progress
    // (round 0 of every block's local fixpoint IS the sync update), so
    // supersteps never exceed the sync loop's rounds; this graph's path
    // appendage is the adversarial case — the one-node-per-round wave
    // crosses block boundaries on most hops, so the collapse is modest
    // here (wide parallel waves collapse much harder, see the bench rows)
    GraphOps.lastCorenessTelemetry.get.rounds should be <= syncRounds
    // block with a node threshold of 0 must fall back to the shuffle loop
    withConf("spark.graft.coreness.localEdgeThreshold" -> "0",
      "spark.graft.coreness.blockNodeThreshold" -> "0")(run()) shouldBe
      expected
    GraphOps.lastCorenessTelemetry.get.mode shouldBe "count"
    // distributed shuffle loop, full path only (tail disabled)
    withConf("spark.graft.coreness.localEdgeThreshold" -> "0",
      "spark.graft.coreness.distributed" -> "loop",
      "spark.graft.coreness.tailThreshold" -> "0")(run()) shouldBe expected
    // distributed loop with the broadcast tail engaged on the path rounds
    withConf("spark.graft.coreness.localEdgeThreshold" -> "0",
      "spark.graft.coreness.distributed" -> "loop",
      "spark.graft.coreness.tailThreshold" -> "100000")(run()) shouldBe
      expected
    // r8 observe formulation and r7 isempty formulation (bisect modes)
    withConf("spark.graft.coreness.localEdgeThreshold" -> "0",
      "spark.graft.coreness.convergence" -> "observe")(run()) shouldBe
      expected
    withConf("spark.graft.coreness.localEdgeThreshold" -> "0",
      "spark.graft.coreness.convergence" -> "isempty")(run()) shouldBe
      expected
    // the path's settle really trickles: the local pass's frontier
    // telemetry must show a run of tiny rounds once the blob has settled
    // (the wave moves one node per round while the blob still converges,
    // so only the post-blob stretch counts as tiny)
    run() shouldBe expected // refresh telemetry from the default path
    val fs = GraphOps.lastCorenessTelemetry.get.frontiers
    fs.count(f => f > 0 && f <= 4) should be >= 8
  }

  /** Plain-Scala synchronous LPA mirror: every node adopts its neighbors'
    * most frequent label, ties to the smallest label, all nodes at once. */
  private def lpaMirror(edges: Seq[(Long, Long)],
      iters: Int): Map[Long, Long] = {
    val und = edges.map { case (u, v) => (math.min(u, v), math.max(u, v)) }
      .filter { case (u, v) => u < v }.distinct
    val adj = (und ++ und.map(_.swap)).groupBy(_._1).view
      .mapValues(_.map(_._2)).toMap
    var labels = adj.keys.map(n => n -> n).toMap
    (1 to iters).foreach { _ =>
      labels = adj.map { case (n, nbs) =>
        val counts = nbs.groupBy(labels).view.mapValues(_.size).toSeq
        n -> counts.minBy { case (lab, c) => (-c, lab) }._1
      }
    }
    labels
  }

  private def runLpa(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    import spark.implicits._
    GraphOps.labelPropagation(edges.toDF("u", "v"), "u", "v", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def runHits(edges: Seq[(Long, Long)], iters: Int)
      : (Map[Long, Double], Map[Long, Double]) = {
    import spark.implicits._
    val rows = GraphOps.hits(edges.toDF("s", "p"), "s", "p", iters)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    (rows.filter(_._2 == "hub").map(r => r._1 -> r._3).toMap,
      rows.filter(_._2 == "auth").map(r => r._1 -> r._3).toMap)
  }

  test("hits: hand bipartite case walks the Fibonacci ladder") {
    // s1->{p1,p2}, s2->{p2}: the normalized power iteration produces
    // consecutive Fibonacci ratios — after 3 rounds auth=(8,13)/sqrt(233),
    // hub=(21,13)/sqrt(610)
    val (hub, auth) = runHits(Seq((1L, 101L), (1L, 102L), (2L, 102L)), 3)
    auth(101L) shouldBe (8.0 / math.sqrt(233)) +- 1e-12
    auth(102L) shouldBe (13.0 / math.sqrt(233)) +- 1e-12
    hub(1L) shouldBe (21.0 / math.sqrt(610)) +- 1e-12
    hub(2L) shouldBe (13.0 / math.sqrt(610)) +- 1e-12
  }

  test("hits matches a plain-Scala mirror on a random bipartite graph; " +
      "both score vectors end unit-norm") {
    val rnd = new scala.util.Random(31)
    val edges = (for {
      s <- 0L until 20L
      p <- 100L until 140L
      if rnd.nextDouble() < 0.2
    } yield (s, p)).distinct
    val iters = 3
    // independent mirror
    var h = edges.map(_._1).distinct.map(_ -> 1.0).toMap
    var a = Map.empty[Long, Double]
    (1 to iters).foreach { _ =>
      val a0 = edges.groupBy(_._2).view
        .mapValues(_.map(e => h(e._1)).sum).toMap
      val an = math.sqrt(a0.values.map(x => x * x).sum)
      a = a0.view.mapValues(_ / an).toMap
      val h0 = edges.groupBy(_._1).view
        .mapValues(_.map(e => a(e._2)).sum).toMap
      val hn = math.sqrt(h0.values.map(x => x * x).sum)
      h = h0.view.mapValues(_ / hn).toMap
    }
    val (hub, auth) = runHits(edges, iters)
    hub.keySet shouldBe h.keySet
    auth.keySet shouldBe a.keySet
    hub.foreach { case (n, v) => v shouldBe h(n) +- 1e-9 }
    auth.foreach { case (n, v) => v shouldBe a(n) +- 1e-9 }
    math.sqrt(hub.values.map(x => x * x).sum) shouldBe 1.0 +- 1e-9
    math.sqrt(auth.values.map(x => x * x).sum) shouldBe 1.0 +- 1e-9
    an[IllegalArgumentException] should be thrownBy runHits(edges, 0)
  }

  test("labelPropagation: hand graph — two triangles over a bridge " +
      "settle into two communities") {
    // triangles {1,2,3} and {4,5,6}, bridge 3-4; hand-run of the
    // synchronous min-tie-break dynamics converges by round 4 to the two
    // triangle communities labelled 1 and 3
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L))
    runLpa(edges, 4) shouldBe
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 3L, 5L -> 3L, 6L -> 3L)
    // the mirror agrees with the hand run too
    lpaMirror(edges, 4) shouldBe runLpa(edges, 4)
  }

  test("labelPropagation matches the synchronous mirror round for round " +
      "on a random graph; duplicate/reversed edges don't change it") {
    (1 to 4).foreach { k =>
      runLpa(randomEdges, k) shouldBe lpaMirror(randomEdges, k)
    }
    val noisy = randomEdges ++ randomEdges.map(_.swap) ++ randomEdges.take(7)
    runLpa(noisy, 3) shouldBe lpaMirror(randomEdges, 3)
    an[IllegalArgumentException] should be thrownBy runLpa(randomEdges, 0)
  }

  private def withConf[A](kvs: (String, String)*)(f: => A): A =
    try { kvs.foreach { case (k, v) => spark.conf.set(k, v) }; f }
    finally kvs.foreach { case (k, _) => spark.conf.unset(k) }

  test("labelPropagation: block-superstep and shuffle-loop regimes agree " +
      "bit for bit; a zero node threshold falls back to the loop") {
    // the mirror tests above already pin the DEFAULT (block) regime to
    // the synchronous semantics; this pins regime EQUALITY and the
    // guard's fallback path (the q130 cross-regime discipline)
    (1 to 4).foreach { k =>
      val block = runLpa(randomEdges, k)
      withConf("spark.graft.lpa.distributed" -> "loop")(
        runLpa(randomEdges, k)) shouldBe block
      // node guard 0: block regime must decline and the loop must run —
      // same answer through the fallback path
      withConf("spark.graft.lpa.blockNodeThreshold" -> "0")(
        runLpa(randomEdges, k)) shouldBe block
    }
  }

  test("hits: block-superstep and shuffle-loop regimes agree within " +
      "float ulp; a zero node threshold falls back to the loop") {
    val rnd = new scala.util.Random(37)
    val edges = (for {
      s <- 0L until 25L
      p <- 100L until 150L
      if rnd.nextDouble() < 0.15
    } yield (s, p)).distinct
    val (hubB, authB) = runHits(edges, 3)
    val (hubL, authL) =
      withConf("spark.graft.hits.distributed" -> "loop")(runHits(edges, 3))
    hubB.keySet shouldBe hubL.keySet
    authB.keySet shouldBe authL.keySet
    // double sums in different association orders: agreement is relative
    // ulp-scale, far inside the oracle's 1e-9 compare tolerance
    hubB.foreach { case (n, v) => v shouldBe hubL(n) +- 1e-12 }
    authB.foreach { case (n, v) => v shouldBe authL(n) +- 1e-12 }
    val (hubF, authF) =
      withConf("spark.graft.hits.blockNodeThreshold" -> "0")(runHits(edges, 3))
    hubF.foreach { case (n, v) => v shouldBe hubL(n) +- 1e-15 }
    authF.foreach { case (n, v) => v shouldBe authL(n) +- 1e-15 }
  }
}
