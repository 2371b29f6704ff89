package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Executor-loss behavior of the [[Graft.materialize]] strategies on a
  * REAL multi-executor topology — the demonstration MaterializeSpec
  * cannot provide on `local[*]` (no executor to lose). Each case forks
  * [[ClusterFailureDemo]] into its own JVM (one SparkContext per JVM;
  * this suite's shared session must keep running) where it brings up
  * `local-cluster[2,1,1024]`, kills executor 0 mid-PageRank through the
  * standalone backend, and reports:
  *   - `reliable`: completes from durable checkpoint files — the
  *     round-6 strategy switch demonstrated, not just configured;
  *   - `local`: fails with the lost-checkpoint-block signature — the
  *     documented reason `localCheckpoint` is a single-JVM default, not
  *     a cluster setting.
  */
class MaterializeClusterSpec extends AnyFunSuite with Matchers {

  private def runDemo(strategy: String): (Int, String) = {
    val javaBin = s"${sys.props("java.home")}/bin/java"
    val pb = new ProcessBuilder(javaBin, "-cp", sys.props("java.class.path"),
      "-Xmx1g", "graft.ClusterFailureDemo", strategy)
    // spark-class normally exports this; the worker's launcher needs it
    // to resolve the distribution's jars dir for executor commands
    pb.environment().put("SPARK_SCALA_VERSION", "2.13")
    if (!pb.environment().containsKey("SPARK_HOME"))
      pb.environment().put("SPARK_HOME", "/opt/spark")
    pb.redirectErrorStream(true)
    val p = pb.start()
    val buf = new java.io.ByteArrayOutputStream()
    val drain = new Thread(() => p.getInputStream.transferTo(buf))
    drain.setDaemon(true)
    drain.start()
    val done = p.waitFor(300, java.util.concurrent.TimeUnit.SECONDS)
    if (!done) p.destroyForcibly()
    drain.join(5000)
    (if (done) p.exitValue() else -1, buf.toString("UTF-8"))
  }

  test("reliable materialization survives an executor killed mid-" +
      "PageRank on local-cluster[2,1,1024]") {
    val (rc, out) = runDemo("reliable")
    withClue(out.linesIterator.filter(_.contains("DEMO_"))
        .mkString("", "\n", "\n")) {
      out should include("DEMO_OUTCOME=COMPLETED")
      rc shouldBe 0
    }
  }

  test("local materialization fails under the same executor loss " +
      "(lost checkpoint blocks) — documented single-JVM-only default") {
    val (rc, out) = runDemo("local")
    withClue(out.linesIterator.filter(_.contains("DEMO_"))
        .mkString("", "\n", "\n")) {
      out should include("DEMO_OUTCOME=FAILED_AS_EXPECTED")
      rc shouldBe 0
    }
  }
}
