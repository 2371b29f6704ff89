package graft.queries

/** Golden oracle tables for the queries whose engine-side math (minhash
  * banding, simhash, deterministic embedder) has no DuckDB twin — the q26
  * pattern: pin the expected result as a literal VALUES table, derived from
  * an independent recomputation where one exists (see per-entry notes).
  * Placeholder — populated in this round once the pinned values are
  * recomputed.
  */
object GoldenOracles {
  def forDir(dir: String): Map[String, String] = Map.empty
}
