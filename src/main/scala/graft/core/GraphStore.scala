package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Graph-upsert sink: vertices and edges as columnar tables with
  * MERGE-style idempotent upsert, change detection, soft delete, and audit
  * counters.
  *
  * Re-expresses the reference's REST-per-record sink (`addRecord`
  * graphkb.js:545-612, `shouldUpdate` :57-101, soft delete :521-533,
  * `edgeExists` :719-729) as set-based DataFrame merges. On a real cluster
  * the produced action frame feeds a Delta/Iceberg `MERGE INTO`; here the
  * merge result is materialized as a new snapshot — same semantics, and a
  * single shuffle on the natural key either way.
  *
  * Keys are null-safe (`<=>`): the reference pads optional variant fields
  * with explicit nulls so they join the unique key (graphkb.js:631-660 /
  * SURVEY K8) — `<=>` gives exactly that.
  */
object GraphStore {

  /** Deterministic surrogate record id — replaces OrientDB `@rid`
    * (SURVEY §1.6): stable across reruns, computable on both engines.
    */
  def rid(cols: Column*): Column = sha2(concat_ws("|", cols: _*), 256)

  val ACTION = "__action" // create | update | noop | delete
  val ACTIONS: Seq[String] = Seq("create", "update", "noop", "delete")

  /** Internal marker ([[classifyInternal]] only): true iff persisting this
    * row would CHANGE the stored bytes — non-noop action, or a noop whose
    * carry columns differ from the target's (a noop row's OUTPUT takes the
    * update's carry values). [[PersistentGraphStore]] skips rewriting
    * buckets where every row is false.
    */
  private[core] val REWRITE = "__rewrite"

  /** Classify `updates` against `target` into MERGE actions.
    *
    * @param keyCols        natural key (null-safe compared)
    * @param compareCols    change-detection columns (scalar, null-likes equal)
    * @param setCols        array columns compared as sets (order-insensitive,
    *                       reference's `subsets` semantics, graphkb.js:78-86)
    * @param softDelete     when true, target keys absent from updates become
    *                       `delete` actions (civic GC pattern); otherwise
    *                       absent keys are `noop` retained rows
    *
    * Output: one row per (key ∪ keys-only-in-target) carrying the FULL row
    * (a real MERGE keeps every column, not just the compared ones): the
    * update's value when an update row is present, the target's otherwise;
    * columns existing on only one side pass through from that side; plus
    * `__action`.
    */
  def classify(
      target: DataFrame,
      updates: DataFrame,
      keyCols: Seq[String],
      compareCols: Seq[String],
      setCols: Seq[String] = Nil,
      softDelete: Boolean = false): DataFrame =
    classifyInternal(target, updates, keyCols, compareCols, setCols,
      softDelete).drop(REWRITE)

  /** [[classify]] plus the [[REWRITE]] flag — the store's write-skip
    * predicate. Kept out of the public classify output so the K1 contract
    * schema is unchanged.
    */
  private[core] def classifyInternal(
      target: DataFrame,
      updates: DataFrame,
      keyCols: Seq[String],
      compareCols: Seq[String],
      setCols: Seq[String] = Nil,
      softDelete: Boolean = false): DataFrame = {

    val payload = (compareCols ++ setCols).distinct
    val tCols = target.columns.toSeq
    val uCols = updates.columns.toSeq
    // every non-key, non-compared column still travels through the merge
    val carry = (tCols ++ uCols).distinct.diff(keyCols ++ payload)

    val t = target.withColumn("__in_t", lit(true))
    val u = updates.withColumn("__in_u", lit(true))
    // pre-normalize set columns once, not per comparison
    val tn = setCols.foldLeft(t)((df, c) => df.withColumn(c, sort_array(col(c))))
    val un = setCols.foldLeft(u)((df, c) => df.withColumn(c, sort_array(col(c))))

    val joinCond = keyCols.map(k => tn(k) <=> un(k)).reduce(_ && _)
    val joined = tn.as("t").join(un.as("u"), joinCond, "full_outer")

    val changed = payload
      .map(c => !(col(s"t.$c") <=> col(s"u.$c")))
      .reduceOption(_ || _)
      .getOrElse(lit(false))

    val action = when(col("t.__in_t").isNull, lit("create"))
      .when(col("u.__in_u").isNull, if (softDelete) lit("delete") else lit("noop"))
      .when(changed, lit("update"))
      .otherwise(lit("noop"))

    val keyOut = keyCols.map(k => coalesce(col(s"u.$k"), col(s"t.$k")).as(k))
    val payloadOut = payload.map(c =>
      when(col("u.__in_u").isNotNull, col(s"u.$c")).otherwise(col(s"t.$c")).as(c))
    val carryOut = carry.map { c =>
      (tCols.contains(c), uCols.contains(c)) match {
        case (true, true) =>
          when(col("u.__in_u").isNotNull, col(s"u.$c")).otherwise(col(s"t.$c")).as(c)
        case (true, false) => col(s"t.$c").as(c)
        case _             => col(s"u.$c").as(c)
      }
    }
    // would persisting this row change stored bytes? noop rows still
    // rewrite when a PRESENT update row carries different carry-column
    // values (the output takes the update's); a u-only column reads null
    // off older layers via mergeSchema, so non-null output = a change.
    // Payload/key columns can't differ on a noop by definition, and the
    // store's set columns are sorted on every layer (first write
    // included), so the normalized comparison here matches stored bytes.
    val carryChanged = carry.map { c =>
      (tCols.contains(c), uCols.contains(c)) match {
        case (true, true) => !(col(s"t.$c") <=> col(s"u.$c"))
        case (true, false) => lit(false)
        case _             => col(s"u.$c").isNotNull
      }
    }.reduceOption(_ || _).getOrElse(lit(false))
    val rewrite = (action =!= "noop") ||
      (col("u.__in_u").isNotNull && carryChanged)
    joined.select(keyOut ++ payloadOut ++ carryOut :+ action.as(ACTION) :+
      rewrite.as(REWRITE): _*)
  }

  /** Apply a classification: the post-merge snapshot (deletes become
    * tombstones when `tombstoneCol` is set, else dropped).
    */
  def apply(classified: DataFrame, tombstoneCol: Option[String] = None): DataFrame =
    tombstoneCol match {
      case Some(tc) =>
        classified.withColumn(tc, col(ACTION) === "delete").drop(ACTION)
      case None =>
        classified.filter(col(ACTION) =!= "delete").drop(ACTION)
    }

  /** Audit counters (reference graphkb.js:315-330): action → count. */
  def counts(classified: DataFrame): Map[String, Long] =
    classified.groupBy(ACTION).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  /** Edge upsert candidates: edges not already present on (out, in, class)
    * — the reference's `edgeExists` adjacency check as one anti-join.
    */
  def newEdges(existing: DataFrame, candidates: DataFrame): DataFrame =
    candidates.join(existing, Seq("out", "in", "edgeClass"), "left_anti")
}
