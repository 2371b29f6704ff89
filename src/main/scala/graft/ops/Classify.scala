package graft.ops

import graft.functions.VectorFunctions.vecDot
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Nearest-centroid classification over an embedding column (Rocchio /
  * nearest-class-mean) — the label-auditing pass of an embedding corpus:
  * score every vector against each class's mean direction and flag where
  * the nearest class disagrees with the stored label (mislabeled or
  * boundary examples surface as off-diagonal confusion mass).
  *
  * Scale shape: class centroids come from ONE map-side-combinable
  * [[graft.expressions.SketchExpressions.vecMoments]] pass (a 16·dim-byte
  * buffer per class per partition — never a rows×dims explode); the
  * centroid frame is class-count-sized and BROADCAST back, so scoring is
  * map-only (rows × classes codegen dots), and the per-row argmax is a
  * `min(struct(-score, label))` partial aggregate on the row key — no
  * window sort, no wide shuffle. 100 TB of vectors stream through one
  * broadcast join and two short-key partial aggregates.
  */
object Classify {

  /** Per-row nearest-centroid assignment: returns
    * `(idCol, labelCol, predicted, score)` where `predicted` is the label
    * of the highest-cosine class centroid (ties to the smallest label)
    * and `score` is that winning cosine against the UNIT-normalized
    * centroid (`dot(v, c)/|c|` — the row's own norm scales every class
    * identically, so the argmax is the full cosine's; keeping the row
    * norm out keeps the score the index-convention directional one). */
  def nearestCentroid(df: DataFrame, idCol: String, labelCol: String,
      vecCol: String): DataFrame = {
    val m = graft.expressions.SketchExpressions.vecMoments(col(vecCol))
    val cents = df.groupBy(col(labelCol).as("c_label")).agg(m.as("m"))
      .select(col("c_label"),
        transform(col("m.sum"), x => x / col("m.n")).as("c"))
      .select(col("c_label"), col("c"),
        sqrt(aggregate(col("c"), lit(0.0), (a, x) => a + x * x)).as("c_norm"))
    // class-table broadcast scan (rows × #classes) — the bounded-small-side
    // crossJoin convention the single-query-row search scans use
    val scored = df
      .select(col(idCol), col(labelCol), col(vecCol))
      .crossJoin(broadcast(cents))
      .select(col(idCol), col(labelCol), col("c_label"),
        (vecDot(col(vecCol), col("c")) / col("c_norm")).as("s"))
    scored.groupBy(col(idCol), col(labelCol))
      .agg(min(struct((-col("s")).as("ns"), col("c_label").as("pl"))).as("m"))
      .select(col(idCol), col(labelCol), col("m.pl").as("predicted"),
        (-col("m.ns")).as("score"))
  }

  /** Confusion-matrix counts of [[nearestCentroid]]:
    * `(labelCol, predicted, n)` — the corpus-level label-quality audit
    * (off-diagonal rows are the suspect label/cluster mismatches). */
  def centroidConfusion(df: DataFrame, idCol: String, labelCol: String,
      vecCol: String): DataFrame =
    nearestCentroid(df, idCol, labelCol, vecCol)
      .groupBy(col(labelCol), col("predicted"))
      .agg(count(lit(1)).as("n"))
}
