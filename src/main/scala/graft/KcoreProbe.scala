package graft

import org.apache.spark.sql.functions._

/** Scratch diagnostic for the q130 per-round constant (round 9): runs the
  * coreness fixpoint on the fixture graph under each regime and prints
  * per-round walls, so the "where does 1.1 s/round go" question is
  * answered by measurement, not plan-reading. Not part of the bench or
  * the gate. `runMain graft.KcoreProbe [variant ...]`. */
object KcoreProbe {
  def main(args: Array[String]): Unit = {
    val variants = if (args.nonEmpty) args.toSeq
      else Seq("count", "tail0", "count8", "tail0_8")
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val edges = graft.ops.GraphOps.coOccurrencePairs(
      spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet"),
      "l_orderkey", "l_partkey").persist()
    println(s"edges=${edges.count()}")
    def run(tag: String): Unit = {
      val t0 = System.nanoTime()
      val (res, rounds, fs) = graft.ops.GraphOps.corenessWithStats(
        edges, "item_a", "item_b")
      res.write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      val walls = graft.ops.GraphOps.lastCorenessTelemetry
        .map(_.roundWallsSec).getOrElse(Nil)
      println(f"[probe] $tag%s wall=$wall%.1fs rounds=$rounds " +
        s"frontiers=${fs.take(40).mkString(",")}")
      println(s"[probe] $tag roundWalls=" +
        walls.map(w => f"$w%.2f").mkString(","))
    }
    def noLocal(f: => Unit): Unit = {
      spark.conf.set("spark.graft.coreness.localEdgeThreshold", "0")
      try f
      finally spark.conf.unset("spark.graft.coreness.localEdgeThreshold")
    }
    variants.foreach {
      case "count" => // engine default: bounded-local pass at this size
        run("default_local")
      case "dist" => // distributed, adaptive partitions + tail defaults
        noLocal(run("dist_default"))
      case "tail0" => // distributed full path, never tail
        noLocal {
          spark.conf.set("spark.graft.coreness.tailThreshold", "0")
          run("dist_notail")
          spark.conf.unset("spark.graft.coreness.tailThreshold")
        }
      case "observe" =>
        noLocal {
          spark.conf.set("spark.graft.coreness.convergence", "observe")
          run("dist_observe")
          spark.conf.unset("spark.graft.coreness.convergence")
        }
      case other => println(s"[probe] unknown variant $other")
    }
    spark.stop()
  }
}
