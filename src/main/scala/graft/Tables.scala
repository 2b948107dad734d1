package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table access for the harness's TPC-H-ish synthetic parquet tables.
  *
  * All engine operators take DataFrames; this is just the parquet glue.
  * At cluster scale the same reads work unchanged — parquet scans get
  * column pruning + predicate pushdown from Catalyst, and
  * `spark.sql.files.maxPartitionBytes` controls scan parallelism.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}
