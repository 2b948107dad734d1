package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for large joins: salt the skewed side, replicate the
  * small side per salt, join on (key, salt). Result is IDENTICAL to the
  * plain equi-join — salting only changes the physical distribution, so a
  * hot key's rows spread over `saltFactor` tasks instead of one straggler.
  *
  * AQE's skew-join split handles sort-merge skew automatically
  * (spark.sql.adaptive.skewJoin); this explicit variant is for the cases
  * AQE can't see — aggregations after the join keyed on the same hot key,
  * or deterministic-layout requirements. At 100 TB this is the difference
  * between a 10-minute stage and a task that never finishes.
  */
object Skew {

  /** Inner/left join `big ⋈ small` on `key`, salting `big` into
    * `saltFactor` buckets and replicating `small` accordingly.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      saltFactor: Int,
      joinType: String = "inner"): DataFrame = {
    val salted = big.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(saltFactor)))
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Aggregation-side salting: two-phase groupBy for a hot grouping key —
    * partial aggregate on (key, salt), final on key. For algebraic
    * aggregates Spark's partial aggregation already does this; use for
    * `collect_list`-style holistic aggregates where map-side combine
    * doesn't shrink the hot key.
    */
  def saltedCollectSet(
      df: DataFrame,
      key: String,
      valueCol: String,
      saltFactor: Int): DataFrame =
    df.withColumn("__salt", pmod(hash(col(valueCol)), lit(saltFactor)))
      .groupBy(col(key), col("__salt"))
      .agg(collect_set(col(valueCol)).as("__partial"))
      .groupBy(col(key))
      .agg(array_distinct(flatten(collect_list(col("__partial")))).as(s"${valueCol}_set"))
}
