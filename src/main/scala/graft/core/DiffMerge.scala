package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tiered diff-join: match an incoming batch against existing records with
  * progressively weaker keys, then deterministically zip the residue.
  *
  * Re-expresses the reference's CIViC `contentMatching`
  * (civic/statement.js:56-178): exact singleton match first, then
  * looser content keys, then "artificial" pairing of whatever is left so
  * update churn beats delete+create. The artificial pass is reproduced with
  * a `row_number` zip — deterministic where the reference is arbitrary.
  *
  * Each tier is one join on its key; residues are carried via anti-join
  * conditions on the already-matched ids, so the whole thing is
  * O(tiers) shuffles on small-by-construction residues.
  */
object DiffMerge {

  /** @param incoming  new batch, must carry distinct `incomingId`
    * @param existing  current records, must carry distinct `existingId`
    * @param tiers     key-column lists, tightest first; within a tier,
    *                  multiple rows per key are zipped by id order
    * @return columns: incoming_id, existing_id, bucket, tier
    *         bucket ∈ match | create | delete;
    *         tier = 1-based tier index for matches, null otherwise
    */
  def contentMatch(
      incoming: DataFrame,
      incomingId: String,
      existing: DataFrame,
      existingId: String,
      tiers: Seq[Seq[String]]): DataFrame = {

    val spark = incoming.sparkSession
    import spark.implicits._

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
      val m = li.join(le, Seq("__k", "__z"))
        .select(col(incomingId).as("incoming_id"), col(existingId).as("existing_id"),
          lit("match").as("bucket"), lit(i + 1).as("tier"))
      acc = Some(acc.map(_.unionByName(m)).getOrElse(m))
      inRest = inRest.join(m.select(col("incoming_id").as(incomingId)), Seq(incomingId), "left_anti")
      exRest = exRest.join(m.select(col("existing_id").as(existingId)), Seq(existingId), "left_anti")
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
