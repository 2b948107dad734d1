package graft.core

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

/** Tiered diff-join: match an incoming batch against existing records with
  * progressively weaker keys, then deterministically zip the residue.
  *
  * Re-expresses the reference's CIViC `contentMatching`
  * (civic/statement.js:56-178): exact content match first on tight keys,
  * then looser keys, then an "artificial" pairing of whatever is left so
  * update churn beats delete+create (civic/statement.js:150-175). The
  * artificial pass is reproduced with a deterministic global zip.
  *
  * Scale notes:
  *  - each tier's match frame and both residues are persisted — the match
  *    frame feeds three consumers (result union + two anti-joins) and each
  *    residue feeds the next tier, so without persist the lineage is
  *    recomputed per consumer and compounds per tier;
  *  - tier keys are expected to be tight (high-cardinality) — the per-key
  *    zip window sorts one key-group per task. Weak keys belong in the
  *    artificial final pass, NOT in a tier;
  *  - the artificial pass avoids the single-partition `row_number()` window
  *    entirely: it is a distributed range-partitioned sort + RDD
  *    `zipWithIndex` (narrow) + an equi-join on the index, so it scales even
  *    when the residue is large.
  */
object DiffMerge {

  /** Registry for the intermediate frames one `contentMatch` call persists
    * (per-tier match + residues). A long-lived session running many diffs
    * should pass a scope and `release()` it once the result has been
    * materialized — otherwise the storage blocks live until the session's
    * cache is cleared and squeeze execution memory.
    */
  final class PersistScope {
    private val buf = scala.collection.mutable.ListBuffer.empty[DataFrame]
    private[core] def track(df: DataFrame): DataFrame = { buf += df; df }
    /** Non-blocking unpersist of every tracked frame. Only call after the
      * consuming action has run — the result's lineage reads these blocks.
      */
    def release(): Unit = { buf.foreach(_.unpersist(blocking = false)); buf.clear() }
  }

  /** Deterministic dense global index: distributed sort by `idCol`, then
    * zipWithIndex (narrow, no second shuffle). Equivalent to
    * `row_number() OVER (ORDER BY id)` without the single-partition sort.
    */
  private def globalZipIndex(df: DataFrame, idCol: String): DataFrame = {
    val sorted = df.select(col(idCol)).orderBy(col(idCol))
    val schema = StructType(sorted.schema.fields :+ StructField("__z", LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** @param incoming  new batch, must carry distinct `incomingId`
    * @param existing  current records, must carry distinct `existingId`
    * @param tiers     key-column lists, tightest first; within a tier,
    *                  multiple rows per key are zipped by id order
    * @param artificialFinal  when true, the post-tier residues are globally
    *                  zip-paired (reference's artificial matching) with
    *                  tier = tiers.size + 1
    * @param scope     registry for intermediate persists; callers running
    *                  many diffs in one session should `release()` it after
    *                  materializing the result
    * @return columns: incoming_id, existing_id, bucket, tier
    *         bucket ∈ match | create | delete;
    *         tier = 1-based tier index for matches, 0 for the 1×1
    *         auto-match, null otherwise
    */
  def contentMatch(
      incoming: DataFrame,
      incomingId: String,
      existing: DataFrame,
      existingId: String,
      tiers: Seq[Seq[String]],
      artificialFinal: Boolean = false,
      sizeHint: Option[(Long, Long)] = None,
      scope: PersistScope = new PersistScope): DataFrame = {

    // 1 incoming × 1 existing auto-matches unconditionally — BEFORE any
    // key comparison and regardless of the matching flags
    // (civic/statement.js:75-78). A caller that already knows its sizes
    // (or knows both sides are big) passes sizeHint and skips the guard
    // action entirely; otherwise BOTH limit(2) probes run as ONE job —
    // each upstream plan is materialized once for the guard, not twice.
    val (nIn, nEx) = sizeHint.getOrElse {
      val probes = incoming.select(col(incomingId).cast("string")).limit(2)
        .select(lit("i").as("side"))
        .unionByName(existing.select(col(existingId).cast("string")).limit(2)
          .select(lit("e").as("side")))
        .groupBy("side").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      (probes.getOrElse("i", 0L), probes.getOrElse("e", 0L))
    }
    if (nIn == 1 && nEx == 1) {
      return incoming.select(col(incomingId).as("incoming_id"))
        .crossJoin(broadcast(existing.select(col(existingId).as("existing_id"))))
        .select(col("incoming_id"), col("existing_id"),
          lit("match").as("bucket"), lit(0).as("tier"))
    }

    var inRest = incoming
    var exRest = existing
    var acc: Option[DataFrame] = None

    tiers.zipWithIndex.foreach { case (keys, i) =>
      // zip within key: n-th incoming row pairs n-th existing row
      val wi = Window.partitionBy(keys.map(col): _*).orderBy(col(incomingId))
      val we = Window.partitionBy(keys.map(col): _*).orderBy(col(existingId))
      val li = inRest.withColumn("__z", row_number().over(wi))
        .select(col(incomingId), struct(keys.map(col): _*).as("__k"), col("__z"))
      val le = exRest.withColumn("__z", row_number().over(we))
        .select(col(existingId), struct(keys.map(col): _*).as("__k"), col("__z"))
      val m = scope.track(li.join(le, Seq("__k", "__z"))
        .select(col(incomingId).as("incoming_id"), col(existingId).as("existing_id"),
          lit("match").as("bucket"), lit(i + 1).as("tier"))
        .persist(StorageLevel.MEMORY_AND_DISK))
      acc = Some(acc.map(_.unionByName(m)).getOrElse(m))
      inRest = scope.track(inRest
        .join(m.select(col("incoming_id").as(incomingId)), Seq(incomingId), "left_anti")
        .persist(StorageLevel.MEMORY_AND_DISK))
      exRest = scope.track(exRest
        .join(m.select(col("existing_id").as(existingId)), Seq(existingId), "left_anti")
        .persist(StorageLevel.MEMORY_AND_DISK))
    }

    if (artificialFinal) {
      val zi = globalZipIndex(inRest, incomingId)
      val ze = globalZipIndex(exRest, existingId)
      val m = scope.track(zi.join(ze, Seq("__z"))
        .select(col(incomingId).as("incoming_id"), col(existingId).as("existing_id"),
          lit("match").as("bucket"), lit(tiers.size + 1).as("tier"))
        .persist(StorageLevel.MEMORY_AND_DISK))
      acc = Some(acc.map(_.unionByName(m)).getOrElse(m))
      inRest = inRest
        .join(m.select(col("incoming_id").as(incomingId)), Seq(incomingId), "left_anti")
      exRest = exRest
        .join(m.select(col("existing_id").as(existingId)), Seq(existingId), "left_anti")
    }

    val inIdType = incoming.schema(incomingId).dataType
    val exIdType = existing.schema(existingId).dataType
    val creates = inRest.select(col(incomingId).as("incoming_id"),
      lit(null).cast(exIdType).as("existing_id"), lit("create").as("bucket"),
      lit(null).cast("int").as("tier"))
    val deletes = exRest.select(lit(null).cast(inIdType).as("incoming_id"),
      col(existingId).as("existing_id"), lit("delete").as("bucket"),
      lit(null).cast("int").as("tier"))

    acc.map(_.unionByName(creates).unionByName(deletes))
      .getOrElse(creates.unionByName(deletes))
  }
}
