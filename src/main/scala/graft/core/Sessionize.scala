package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Inactivity-gap sessionization — the batch analogue of the streaming
  * state folds in `streaming/StreamOps`: a user's event stream splits
  * into sessions wherever consecutive events are more than `gapUs`
  * apart, and each session aggregates to one summary row. Timestamps
  * stay epoch-microsecond BIGINTs end-to-end (integer subtraction —
  * float math near a gap boundary can flip a row into the wrong
  * session); the per-session value total sums as DECIMAL(18,4) so the
  * result is independent of aggregation order.
  *
  * Scale: both windows and the final aggregate partition on the
  * high-cardinality user key — per-user ordering is inherent to the
  * semantics, and a task holds one user's events, never the table. A
  * pathological power-user key is the standard skew caveat (AQE
  * skew-split, or pre-split by day for truly unbounded actors).
  */
object Sessionize {

  /** `events` needs (userCol, idCol, `ts_us` BIGINT, valueCol). New
    * session when `ts − prev > gapUs`; ties order by (ts_us, idCol).
    * Returns (user, session_seq, n_events, start_us, end_us,
    * duration_us, total_value).
    */
  def sessionize(events: DataFrame, userCol: String, idCol: String,
      valueCol: String, gapUs: Long): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col("ts_us"), col(idCol))
    events
      .withColumn("__prev", lag(col("ts_us"), 1).over(w))
      .withColumn("__new", when(col("__prev").isNull ||
        col("ts_us") - col("__prev") > gapUs, 1L).otherwise(0L))
      .withColumn("session_seq", sum(col("__new"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(userCol), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("end_us"),
        (max(col("ts_us")) - min(col("ts_us"))).as("duration_us"),
        sum(col(valueCol).cast("decimal(18,4)")).cast("double")
          .as("total_value"))
  }
}
