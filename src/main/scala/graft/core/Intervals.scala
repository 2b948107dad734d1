package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval algebra over keyed event streams — the two interval shapes
  * every warehouse pipeline eventually needs:
  *
  *  - SCD-2 build: collapse a change log into `[valid_from, valid_to)`
  *    dimension versions (the slowly-changing-dimension type-2 load a
  *    point-in-time feature join consumes — the producer side of
  *    [[AsOfJoin]]).
  *  - Interval merge: coalesce overlapping/touching spans per key into
  *    maximal islands (redaction-span merge, crawl-window coverage,
  *    session coalescing with explicit extents).
  *
  * Scale: every window here is PARTITIONED BY the key — per-key work
  * only, the standard scale-safe shape (a pathological single key with
  * billions of rows is the caller's salting problem, same contract as
  * sessionize). All arithmetic is integer; ties break on explicit
  * columns so results are deterministic under any partitioning.
  */
object Intervals {

  /** SCD-2 dimension build from a change log: one row per RUN of equal
    * `stateCol` per key (consecutive duplicates collapse), valid from
    * its first event until the next run starts; the current run has
    * `valid_to` NULL. `tieCol` makes same-instant ordering exact.
    *
    * Output: key, state, valid_from, valid_to, version_n (1-based run
    * index per key).
    */
  def scd2(df: DataFrame, keyCol: String, tsCol: String, stateCol: String,
      tieCol: String): DataFrame = {
    val byTs = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val changes = df
      .withColumn("__prev", lag(col(stateCol), 1).over(byTs))
      // NULL-safe inequality: a NULL state is a real SCD value, and the
      // first row per key (prev NULL) always opens a run
      .filter(!(col(stateCol) <=> col("__prev")))
    // same-instant run starts must order identically everywhere: keep
    // the tie column through the second window too
    val byFrom = Window.partitionBy(col(keyCol))
      .orderBy(col("valid_from"), col("__tie"))
    changes
      .select(col(keyCol), col(stateCol).as("state"),
        col(tsCol).as("valid_from"), col(tieCol).as("__tie"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byFrom))
      .withColumn("version_n", row_number().over(byFrom).cast("long"))
      .drop("__tie")
  }

  /** Merge overlapping or touching `[lo, hi)` intervals per key into
    * maximal islands: a new island starts where `lo` exceeds the max
    * `hi` of ALL prior intervals (the running-max guard handles nested
    * intervals that a lag-based check would split). Output: key,
    * island (1-based), lo, hi, n_merged.
    */
  def mergeIntervals(df: DataFrame, keyCol: String, loCol: String,
      hiCol: String): DataFrame = {
    val order = Window.partitionBy(col(keyCol)).orderBy(col(loCol), col(hiCol))
    val prevMax = order.rowsBetween(Window.unboundedPreceding, -1)
    val upToHere = order.rowsBetween(Window.unboundedPreceding, 0)
    df.withColumn("__pm", max(col(hiCol)).over(prevMax))
      .withColumn("__new",
        when(col("__pm").isNull || col(loCol) > col("__pm"), 1L)
          .otherwise(0L))
      .withColumn("island", sum(col("__new")).over(upToHere))
      .groupBy(col(keyCol), col("island"))
      .agg(min(col(loCol)).as("lo"), max(col(hiCol)).as("hi"),
        count(lit(1)).as("n_merged"))
  }
}
