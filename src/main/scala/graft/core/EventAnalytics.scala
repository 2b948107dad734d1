package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Classic event-stream analytics over an (user, ts_us, event_type)
  * table: ordered conversion funnels and cohort retention — the two
  * aggregate views that, with [[Sessionize]], cover the standard
  * product-analytics battery. All time math is epoch-microsecond
  * BIGINT (integer division to days, strict integer comparisons at
  * step boundaries).
  */
object EventAnalytics {

  /** Ordered first-occurrence funnel: a user reaches step k+1 with the
    * earliest event of that type STRICTLY after their step-k timestamp.
    * Returns one row per user who reached step 1: the per-step
    * timestamps (null once the funnel is exited) and the furthest
    * `stage` reached.
    *
    * Scale: one filtered partial aggregation per step (min over the
    * user key) chained through equi-joins on the high-cardinality user
    * id — no windows, no per-user event ordering; each step's input is
    * only that step's event type.
    */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val first = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col("ts_us")).as("t1_us"))
    val chained = steps.zipWithIndex.tail.foldLeft(first) {
      case (prev, (step, i)) =>
        val tPrev = s"t${i}_us"
        val tCur = s"t${i + 1}_us"
        val next = events.filter(col(typeCol) === step)
          .join(prev.select(col(userCol), col(tPrev)), Seq(userCol))
          .filter(col("ts_us") > col(tPrev))
          .groupBy(col(userCol)).agg(min(col("ts_us")).as(tCur))
        prev.join(next, Seq(userCol), "left")
    }
    // fold low→high so the HIGHEST reached step is the outermost branch
    val stage = steps.indices.tail
      .foldLeft(lit(1L)) { (acc, i) =>
        when(col(s"t${i + 1}_us").isNotNull, lit((i + 1).toLong))
          .otherwise(acc)
      }
    chained.withColumn("stage", stage)
  }

  /** Cohort retention: users cohort by the epoch-day of their first
    * event; output counts distinct active users per (cohort day,
    * day offset). `n_users` at offset 0 is the cohort size.
    *
    * Scale: a distinct (user, day) projection (partial agg), one min
    * aggregation for cohorts, one equi-join on the user key, and a
    * final small-keyed count — the matrix is days², never user-sized.
    */
  def retention(events: DataFrame, userCol: String): DataFrame = {
    val days = events
      .select(col(userCol), expr("ts_us div 86400000000").as("day"))
      .distinct()
    val cohorts = days.groupBy(col(userCol))
      .agg(min(col("day")).as("cohort_day"))
    days.join(cohorts, Seq(userCol))
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** k-sigma outlier detection WITHOUT floats: value `x` in group `g`
    * is anomalous iff `(x−μ)² > k²σ²`, which clears denominators into
    * the all-integer test `(x·n − S)² > k²·(n·ΣX² − S²)` (S = Σx,
    * n = group size — population variance). The squares ride
    * DECIMAL(38,0), so daily counts to ~10^9 over ~10^9 group members
    * cannot wrap — the "which days/shards/partitions deviate" monitor
    * a pipeline runs over its own telemetry, bit-identical in any
    * engine because no sqrt, no division, no doubles ever appear.
    *
    * Input is the pre-aggregated (group, x) frame; output adds
    * `dev_n = x·n − S` (the deviation scaled by n, sign-preserving)
    * and the `anomalous` verdict.
    *
    * Domain bound: the squared terms cap at DECIMAL(38,0), so the test
    * is exact while |x|·n < 10^19 (⇒ dev² < 10^38 and n·ΣX² < 10^38) —
    * far past any count-like telemetry. Beyond it the decimal square
    * overflows: ANSI mode (this engine's default) fails the job loudly
    * rather than mis-flagging.
    */
  def sigmaOutliers(counts: DataFrame, groupCol: String, valueCol: String,
      k: Int): DataFrame = {
    require(k >= 1, "k must be at least 1")
    // the SUMS ride decimal too, not just the final comparison — a
    // plain long sum(x²) wraps at 10 members of x = 10⁹ and a wrapped
    // negative variance flags every row
    val stats = counts.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"),
        sum(col(valueCol).cast("decimal(38,0)")).as("__s"),
        sum(col(valueCol).cast("decimal(38,0)") * col(valueCol))
          .as("__sxx"))
    // no broadcast hint: stats has one row per group — AQE broadcasts
    // it when small, but forcing it would OOM at 10^8 groups.
    // x·n rides DECIMAL(38,0) too (a plain long multiply would wrap
    // past 2^63 for x near 2^63/n); dev_n is the long-cast OUTPUT but
    // the anomaly test reads the un-cast decimal deviation.
    counts.join(stats, Seq(groupCol))
      .withColumn("__dev",
        col(valueCol).cast("decimal(38,0)") * col("__n") - col("__s"))
      .withColumn("dev_n", col("__dev").cast("long"))
      .withColumn("anomalous", expr(
        s"""__dev * __dev >
           | ${k.toLong * k} * (CAST(__n AS DECIMAL(38,0)) * __sxx - __s * __s)""".stripMargin))
      .drop("__n", "__s", "__sxx", "__dev")
  }
}
