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

  /** Per-label embedding OUTLIER audit: each row's L2 distance to its own
    * label's centroid, z-scored against that label's distance
    * distribution (population variance), keeping rows with
    * `z > zThreshold` — the "this vector doesn't belong to its cluster"
    * flag (corrupt decodes, mislabeled rows, adversarial injections
    * surface here before they pollute retrieval training).
    *
    * Same scale shape as [[nearestCentroid]]: one vecMoments centroid
    * pass, a label-equi broadcast join (each row meets ONLY its own
    * centroid — not the class cross), one per-label (mu, sd) partial
    * aggregate broadcast back, map-only z and filter. Output:
    * `(idCol, labelCol, dist, z)`. */
  def centroidOutliers(df: DataFrame, idCol: String, labelCol: String,
      vecCol: String, zThreshold: Double): DataFrame = {
    val m = graft.expressions.SketchExpressions.vecMoments(col(vecCol))
    val cents = df.groupBy(col(labelCol).as("c_label")).agg(m.as("m"))
      .select(col("c_label"),
        transform(col("m.sum"), x => x / col("m.n")).as("c"))
    val d = df.select(col(idCol), col(labelCol), col(vecCol))
      .join(broadcast(cents), col(labelCol) === col("c_label"))
      .select(col(idCol), col(labelCol),
        graft.functions.VectorFunctions.l2Dist(col(vecCol), col("c"))
          .as("dist"))
    val st = d.groupBy(col(labelCol).as("s_label"))
      .agg(avg(col("dist")).as("mu"),
        sqrt(avg(col("dist") * col("dist")) - pow(avg(col("dist")), 2))
          .as("sd"))
    // sd = 0 (a degenerate identical cluster) has no outliers BY CONTRACT:
    // the z is NULL (ANSI division would throw), and NULL > t drops the row
    d.join(broadcast(st), col(labelCol) === col("s_label"))
      .select(col(idCol), col(labelCol), col("dist"),
        when(col("sd") > 0, (col("dist") - col("mu")) / col("sd")).as("z"))
      .filter(col("z") > zThreshold)
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
