package graft.remote

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** S15 — batched-ID remote hydration (reference entrez `fetchAndLoadByIds`
  * util.js:269-303: cache partition → ≤150-id esummary batches → upsert;
  * bounded concurrency via 100-record Promise.all chunks).
  *
  * Spark shape (SURVEY §3.3): the "cache" is the dimension table — an
  * anti-join finds unresolved ids (that part is J9/`j9_fetch_union`); this
  * class is the fetch leg: ids repartitioned to bound request concurrency,
  * then per-partition batches of ≤`batchSize` ids per HTTP call through a
  * per-partition client stack (retry + cache). No mid-transform side
  * effects — fetch produces a frame that unions into the dimension.
  */
object EntrezBatch {

  val MaxIdsPerRequest = 150 // entrez/util.js:20
  val DefaultParallelism = 4 // bounds concurrent API requests cluster-wide

  /** Fetch `ids` in batches: `fetcher` maps one id batch → (id, payload)
    * pairs, and runs once per batch inside each partition. The
    * `parallelism` repartition is the concurrency bound — at most that
    * many requests in flight across the cluster.
    */
  def fetchByIds(
      ids: Dataset[String],
      fetcher: Seq[String] => Seq[(String, String)],
      batchSize: Int = MaxIdsPerRequest,
      parallelism: Int = DefaultParallelism): DataFrame = {
    import ids.sparkSession.implicits._
    ids.distinct()
      .repartition(parallelism)
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap(batch => fetcher(batch.toSeq))
      }
      .toDF("id", "payload")
  }

  /** The full dimension-hydration pattern: resolve `lookupIds` against
    * `dim(idCol)`, batch-fetch the misses, union them in (J9 + S15
    * composed). Returns the augmented dimension.
    */
  def hydrate(
      dim: DataFrame,
      idCol: String,
      payloadCol: String,
      lookupIds: Dataset[String],
      fetcher: Seq[String] => Seq[(String, String)],
      batchSize: Int = MaxIdsPerRequest): DataFrame = {
    import lookupIds.sparkSession.implicits._
    val missing = lookupIds.toDF(idCol)
      .join(dim.select(idCol), Seq(idCol), "left_anti")
      .as[String]
    val fetched = fetchByIds(missing, fetcher, batchSize)
      .withColumnRenamed("id", idCol)
      .withColumnRenamed("payload", payloadCol)
      .withColumn("fetched", lit(true))
    // allowMissingColumns: a real dim carries more than (id, payload) —
    // fetched rows fill the extra columns with null
    dim.withColumn("fetched", lit(false))
      .unionByName(fetched, allowMissingColumns = true)
  }
}
