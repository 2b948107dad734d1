package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Entity resolution: look up untrusted external keys against a candidate
  * dimension and pick exactly one winner per key by a preference ranking,
  * flagging ties and misses.
  *
  * Re-expresses the reference's `getUniqueRecordBy` (graphkb.js:395-419) +
  * `orderPreferredOntologyTerms` (graphkb.js:133-196): where the reference
  * issues one REST /query per lookup and sorts in JS, this is a single
  * broadcast-able join + window top-1 — one shuffle at most, and none when
  * the candidate side is broadcast.
  *
  * Scale: candidates are typically dimension-sized (ontologies, vocab) →
  * caller wraps them in `broadcast(...)`; the lookup side streams through
  * map-side. For dimension tables too big to broadcast, the join shuffles
  * on the key — still a single pass.
  */
object Resolver {

  /** Result of a resolution pass.
    * @param resolved   exactly one candidate row per lookup key (rank-1,
    *                   unambiguous)
    * @param ambiguous  lookup keys whose two best candidates tie under the
    *                   preference order (reference throws; we side-channel)
    * @param missing    lookup keys with no candidate at all
    */
  case class Resolution(resolved: DataFrame, ambiguous: DataFrame, missing: DataFrame)

  /** Resolve each distinct key of `lookups(keyCol)` against
    * `candidates(candKeyCol)`, ordering matches by `preference` (best
    * first). Ties at rank 1 are ambiguous — the reference's "expected a
    * single record" error (graphkb.js:404-412).
    */
  def resolveUnique(
      lookups: DataFrame,
      keyCol: String,
      candidates: DataFrame,
      candKeyCol: String,
      preference: Seq[Column]): Resolution = {

    val keys = lookups.select(col(keyCol).as("__key")).distinct()
    val joined = keys.join(candidates, col("__key") === col(candKeyCol), "left")

    val w = Window.partitionBy(col("__key")).orderBy(preference: _*)
    val ranked = joined
      .withColumn("__rnk", rank().over(w))
      .withColumn("__rn", row_number().over(w))
      // ambiguity = two rows share rank 1
      .withColumn("__nTop", count(when(col("__rnk") === 1, 1)).over(Window.partitionBy(col("__key"))))

    val missing = ranked.filter(col(candKeyCol).isNull).select(col("__key").as(keyCol))
    val ambiguous = ranked
      .filter(col(candKeyCol).isNotNull && col("__nTop") > 1 && col("__rn") === 1)
      .select(col("__key").as(keyCol))
    val resolved = ranked
      .filter(col(candKeyCol).isNotNull && col("__nTop") === 1 && col("__rn") === 1)
      .drop("__rnk", "__rn", "__nTop")
      .withColumnRenamed("__key", keyCol)

    Resolution(resolved, ambiguous, missing)
  }

  /** The reference's ontology preference ladder (graphkb.js:133-196) as a
    * sort-key list: non-deprecated > non-alias > independent > generic over
    * versioned > newer sourceIdVersion > has-description > source rank.
    * Columns missing from the frame can be dropped by the caller.
    */
  def ontologyPreference(
      deprecated: Column = col("deprecated"),
      alias: Column = col("alias"),
      dependency: Column = col("dependency"),
      sourceIdVersion: Column = col("sourceIdVersion"),
      description: Column = col("description"),
      sourceRank: Column = col("sourceRank")): Seq[Column] = Seq(
    coalesce(deprecated.cast("boolean"), lit(false)).asc, // false (kept) first
    coalesce(alias.cast("boolean"), lit(false)).asc,
    dependency.isNotNull.asc,                             // independent first
    sourceIdVersion.isNotNull.asc,                        // generic first
    sourceIdVersion.desc_nulls_last,                      // then newest version
    description.isNull.asc,                               // has-description first
    sourceRank.asc_nulls_last
  )
}
