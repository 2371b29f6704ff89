package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Artifact-staleness guard (VERDICT r13 task 4): PLANS_sf1.md records
  * executed join strategies for the heavy family and is trusted
  * round-over-round, but twice in r13 an artifact silently went stale
  * behind later commits. The audit now stamps the SHA-256 of every
  * join-relevant source into the artifact; this spec fails when a stamp
  * mismatches the working tree, so "regenerate PLANS_sf1.md" becomes a
  * red signal instead of a memory item.
  *
  * Bootstrap rule: an artifact WITHOUT a hash section (pre-r14 format)
  * warns loudly and passes once — the failure mode guarded against is
  * divergence from recorded hashes, not the initial absence of them. */
class PlanAuditStalenessSpec extends AnyFunSuite with Matchers {

  test("PLANS_sf1.md source-hash stamps match the working tree") {
    val artifact = java.nio.file.Paths.get("PLANS_sf1.md")
    if (!java.nio.file.Files.exists(artifact)) {
      System.err.println(
        "[staleness] WARNING: no PLANS_sf1.md — run graft.PlanAudit " +
          "against target/sf1 (sf0.01 plans do not predict sf1 plans)")
    } else {
      val text = new String(java.nio.file.Files.readAllBytes(artifact), "UTF-8")
      val stamped = PlanAudit.stampedHashes(text)
      if (stamped.isEmpty) {
        System.err.println(
          "[staleness] WARNING: PLANS_sf1.md has no source-hash stamps " +
            "(pre-r14 artifact) — regenerate with graft.PlanAudit to arm " +
            "this guard")
      } else {
        val stale = stamped.collect {
          case (path, h) if PlanAudit.sourceHash(path) != h =>
            s"$path (stamped $h, tree ${PlanAudit.sourceHash(path)})"
        }
        withClue("PLANS_sf1.md is STALE — join-relevant sources changed " +
          "after the audit; re-run `SPARK_DRIVER_MEM=64g sbt \"runMain " +
          "graft.PlanAudit target/sf1\"` and commit the artifact: ") {
          stale shouldBe empty
        }
        // every join-relevant file must be covered — a new heavy-family
        // source added to auditedSources after the audit is also stale
        val stampedPaths = stamped.map(_._1).toSet
        withClue("audit stamp set out of date vs PlanAudit.auditedSources: ") {
          PlanAudit.auditedSources.filterNot(stampedPaths) shouldBe empty
        }
      }
    }
  }
}
