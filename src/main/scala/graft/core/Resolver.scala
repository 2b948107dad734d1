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
  * broadcast-able join + window top-1.
  *
  * Scale: candidates are typically dimension-sized (ontologies, vocab) →
  * caller wraps them in `broadcast(...)` and the join is map-side; the
  * window then shuffles once on the lookup key. All three window columns
  * (rank, row_number, rank-1 count) are computed over the SAME sorted
  * partitioning — one exchange + one sort total; the whole-partition count
  * frame reuses the (key, preference...) child ordering so EnsureRequirements
  * inserts no second sort.
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
    // same spec, explicit whole-partition frame → no extra sort, just a
    // second Window op over the already-(key,pref)-ordered child.
    val wAll = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val ranked = joined
      .withColumn("__rnk", rank().over(w))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__nTop", count(when(col("__rnk") === 1, 1)).over(wAll))

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

  /** J4 — lookup with alternate-term fallback (reference `getTherapy`
    * graphkb.js:427-478: exact name/sourceId match first, then retry with
    * the inhibitor↔inhibitors plural swap). Only the misses of the direct
    * pass join again, on the alternate key; `via_fallback` marks which pass
    * resolved each term. Unresolved terms survive with null candidate
    * columns (the caller's error side-channel).
    */
  def resolveWithFallback(
      lookups: DataFrame,
      keyCol: String,
      alt: Column => Column,
      candidates: DataFrame,
      candKeyCol: String): DataFrame = {
    val cand = candidates.withColumnRenamed(candKeyCol, "__ckey")
    val keys = lookups.select(col(keyCol).as("__key")).distinct()
      .withColumn("__alt", alt(col("__key")))
    val direct = keys.join(cand, col("__key") === col("__ckey"), "left")
    val fallback = direct.filter(col("__ckey").isNull).select("__key", "__alt")
      .join(cand, col("__alt") === col("__ckey"), "left")
    direct.filter(col("__ckey").isNotNull)
      .withColumn("via_fallback", lit(false))
      .unionByName(fallback.withColumn("via_fallback", col("__ckey").isNotNull))
      .withColumnRenamed("__key", keyCol)
      .drop("__alt")
      .withColumnRenamed("__ckey", candKeyCol)
  }

  /** The inhibitor↔inhibitors plural swap itself (graphkb.js:451-456). */
  def pluralSwap(term: Column): Column =
    when(term.rlike("\\binhibitor\\b"),
      regexp_replace(term, "\\binhibitor\\b", "inhibitors"))
      .when(term.rlike("\\binhibitors\\b"),
        regexp_replace(term, "\\binhibitors\\b", "inhibitor"))
      .otherwise(term)

  /** The reference's full 8-rung ontology preference ladder
    * (graphkb.js:133-196) as a sort-key list: non-deprecated > non-alias >
    * independent > source rank > source.version > generic over versioned >
    * sourceIdVersion > has-description.
    *
    * The reference comparator is conditional: the sourceIdVersion /
    * description rungs only apply to pairs sharing (sourceId, source);
    * cross-source pairs order by source.sort, then source.version, then
    * description (graphkb.js:152-196, jest :73-96). A per-row sort key
    * can't branch per-pair, but hoisting sourceRank + sourceVersion ABOVE
    * the per-record rungs reproduces both branches: within one source,
    * rank and source.version are constant (they ride on the source record),
    * so same-source ordering falls through to generic/sourceIdVersion/
    * description exactly as before, while cross-source pairs are decided
    * by rank then version first.
    */
  def ontologyPreference(
      deprecated: Column = col("deprecated"),
      alias: Column = col("alias"),
      dependency: Column = col("dependency"),
      sourceIdVersion: Column = col("sourceIdVersion"),
      sourceVersion: Column = col("sourceVersion"),
      description: Column = col("description"),
      sourceRank: Column = col("sourceRank")): Seq[Column] = Seq(
    coalesce(deprecated.cast("boolean"), lit(false)).asc, // false (kept) first
    coalesce(alias.cast("boolean"), lit(false)).asc,
    dependency.isNotNull.asc,                             // independent first
    sourceRank.asc_nulls_last,                            // cross-source: rank
    // the reference's comments SAY "prefer newer/later versions" but its
    // code compares ascending (graphkb.js:160-196) and its jest corpus
    // pins that: ('2019-10-08' vs '2020-10-08') → the OLDER wins
    // (test/graphkb.test.js:41-60, :81-88). Match the behavior, not the
    // comment.
    sourceVersion.asc_nulls_first,                        // cross-source: version
    sourceIdVersion.isNotNull.asc,                        // generic first
    sourceIdVersion.asc_nulls_first,
    description.isNull.asc                                // has-description first
  )
}
