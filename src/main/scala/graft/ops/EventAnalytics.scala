package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics shapes: ordered conversion funnels and
  * day-over-day retention. Extends the reference's event surface (the
  * notebook only previews rows) with the reporting queries an events table
  * exists to answer.
  *
  * Scale shape: both operators are single-shuffle. The funnel chains its
  * per-stage thresholds as window columns over ONE user partitioning
  * (Spark stacks the Window operators on the same Exchange); retention
  * uses a lag window instead of the textbook activity-to-activity
  * self-join on day+1, which would shuffle the activity table twice.
  */
object EventAnalytics {

  /** Users reaching each stage of `stages` with strictly increasing event
    * times: stage i counts a user iff an event of type `stages(i)` exists
    * after their stage i-1 time. One row, one `n_<stage>` count per stage.
    * `tsCol` should be a totally ordered column (epoch micros — portable
    * comparison precision). */
  def funnel(df: DataFrame, userCol: String, typeCol: String,
      tsCol: String, stages: Seq[String]): DataFrame =
    funnelByKeys(df, Seq(userCol), typeCol, tsCol, stages)

  /** [[funnel]] generalized to a composite entity key — e.g. (user,
    * session) for within-session conversion. A coarser existing
    * partitioning (user) satisfies the (user, session) clustering, so
    * composing after a sessionizing window adds NO exchange. */
  def funnelByKeys(df: DataFrame, keyCols: Seq[String], typeCol: String,
      tsCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val w = Window.partitionBy(keyCols.map(col): _*)
    val staged = stages.zipWithIndex.foldLeft(df) { case (d, (tpe, i)) =>
      val cond =
        if (i == 0) col(typeCol) === tpe
        else col(typeCol) === tpe && col(tsCol) > col(s"__s${i - 1}")
      d.withColumn(s"__s$i", min(when(cond, col(tsCol))).over(w))
    }
    // Collapse to one row per key BEFORE counting: the stage columns are
    // per-key constants, and dropDuplicates reuses the windows'
    // partitioning (no new exchange), so the final count is a plain
    // conditional count — a multi-column countDistinct here would compile
    // to an N-stage Expand over every event row.
    val perKey = staged
      .select(keyCols.map(col) ++ stages.indices.map(i => col(s"__s$i")): _*)
      .dropDuplicates(keyCols)
    val counts = stages.zipWithIndex.map { case (tpe, i) =>
      count(when(col(s"__s$i").isNotNull, 1)).as(s"n_$tpe")
    }
    perKey.agg(counts.head, counts.tail: _*)
  }

  /** First-order Markov transition matrix over per-user event
    * sequences: for each ordered adjacent (prev, next) event-type pair,
    * the transition count and the row-normalized probability
    * n(prev→next) / n(prev→*). One user-key shuffle for the lag, one
    * small exchange over the |types|² count matrix for the normalizing
    * window — the funnel/churn "where do users go next" primitive.
    * Ordering is (epoch micros, type) so ties are total; probabilities
    * are integer-count ratios (exact doubles). */
  def transitionMatrix(df: DataFrame, userCol: String, typeCol: String,
      tsCol: String): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col("__us"), col(typeCol))
    val counts = df
      .select(col(userCol), col(typeCol), unix_micros(col(tsCol)).as("__us"))
      .withColumn("__prev", lag(col(typeCol), 1).over(w))
      .filter(col("__prev").isNotNull)
      .groupBy(col("__prev").as("prev_type"), col(typeCol).as("next_type"))
      .agg(count(lit(1)).as("n"))
    counts.withColumn("p", col("n") /
      sum(col("n")).over(Window.partitionBy("prev_type")).cast("double"))
  }

  /** Cohort retention matrix: users grouped by their first active ISO
    * week, counted in each later week they return — the
    * (cohort_week, week_offset, n_users) triangle behind every retention
    * chart. Activity first collapses to the distinct (user, week) set
    * (bounded by users × weeks, not event volume), the per-user min week
    * is one aggregation on the same key, and offsets are exact day
    * arithmetic (both weeks are Mondays, so the /7 divides evenly). */
  def cohortRetention(df: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val wk = df.select(col(userCol).as("u"),
      to_date(date_trunc("week", col(tsCol))).as("wk")).distinct()
    val first = wk.groupBy("u").agg(min(col("wk")).as("cohort_week"))
    wk.join(first, "u")
      .groupBy(col("cohort_week"),
        (datediff(col("wk"), col("cohort_week")) / 7).cast("long")
          .as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Per-day active users and how many were also active the previous
    * calendar day. Output: (day: date, active, retained) — one lag window
    * over the distinct (day, user) activity set. */
  def dailyRetention(df: DataFrame, userCol: String,
      dayCol: String): DataFrame = {
    val d = df.select(col(dayCol).as("day"), col(userCol)).distinct()
    val w = Window.partitionBy(col(userCol)).orderBy(col("day"))
    d.withColumn("__prev", lag(col("day"), 1).over(w))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("active"),
        count(when(datediff(col("day"), col("__prev")) === 1, 1))
          .as("retained"))
  }

  /** Trailing z-score over a keyed series — the volume-anomaly monitor a
    * pipeline runs over its own ingest counts (an event type whose hourly
    * volume jumps 5 sigma off its trailing baseline is a broken producer
    * or an incident, and at 100 TB/day nobody eyeballs the counts).
    * Baseline = the `lookback` PRECEDING rows, current row excluded (an
    * anomaly must not dilute its own baseline); variance via
    * `E[x^2] - E[x]^2` over the same frame so the whole computation is
    * two `avg` windows sharing ONE key-partitioned exchange. Rows whose
    * baseline is empty or constant get a NULL z (undefined, not 0 —
    * don't alert on the series' first hours). Output: input columns +
    * (baseline_mean, z). */
  def trailingZScores(series: DataFrame, keyCol: String, orderCol: String,
      valueCol: String, lookback: Int): DataFrame = {
    require(lookback >= 2, s"lookback must be >= 2, got $lookback")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(orderCol))
      .rowsBetween(-lookback, -1)
    val x = col(valueCol).cast("double")
    val mean = avg(x).over(w)
    val m2 = avg(x * x).over(w)
    // one select, not chained withColumn: both aggregates land in ONE
    // Window operator (a Project between two Window nodes defeats
    // CollapseWindow and doubles the exchange)
    series.select(series.columns.map(col) :+ mean.as("baseline_mean") :+
      when(m2 - mean * mean > 1e-9,
        (x - mean) / sqrt(m2 - mean * mean)).as("z"): _*)
  }

  /** Exponentially time-decayed value sums per key — the recency
    * weighting a freshness-aware corpus mix or trending-signal rollup
    * uses (an event `ageHours` old contributes `value·exp(-age/tau)`,
    * with age measured against the dataset's own max timestamp so the
    * result is a pure function of the data, not of wall-clock run time).
    *
    * Scale shape: one 1-row max aggregate broadcast back (never a
    * window-over-everything), then ONE map-side-combinable groupBy —
    * two light shuffles total. Output: `(keyCol, n, decayed_sum)`. */
  def timeDecayedSum(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, tauHours: Double): DataFrame = {
    require(tauHours > 0, s"tauHours must be positive, got $tauHours")
    val tmax = df.agg(max(col(tsCol)).as("tmax"))
    // exact integer micros on both sides of the oracle compare (a
    // seconds cast would truncate sub-second event times)
    val age = unix_micros(col("tmax")) - unix_micros(col(tsCol))
    df.crossJoin(broadcast(tmax))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("double") *
          exp(-age.cast("double") / lit(tauHours * 3600.0 * 1e6)))
          .as("decayed_sum"))
  }
}
