package graft.core

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet-backed persistent graph store: vertices and edges survive the
  * job, and re-running the same merge is a no-op (idempotent upsert —
  * reference `addRecord` graphkb.js:545-612 made set-based).
  *
  * Layout: `<root>/<table>/v=NNNNN/` snapshot directories. A merge reads
  * the latest complete snapshot, classifies the incoming frame against it
  * (GraphStore.classify: null-safe keys, change detection, soft delete),
  * writes the post-merge state as the next version, and returns the audit
  * counters (K9). Readers always resolve the max version — a crashed write
  * leaves a partial higher directory without a `_SUCCESS` marker, which is
  * skipped.
  *
  * Scale: this is the Delta/Iceberg MERGE pattern without the table
  * format — one full-outer shuffle on the natural key per merge, snapshot
  * writes partitioned by the same key hash so successive merges co-locate.
  * On a production cluster the same `classify` output feeds `MERGE INTO`
  * directly; tests exercise the parquet path end-to-end.
  */
class PersistentGraphStore(spark: SparkSession, root: String) {

  private def tableDir(table: String) = s"$root/$table"

  private def versions(table: String): Seq[(Int, String)] = {
    val dir = Paths.get(tableDir(table))
    if (!Files.exists(dir)) Seq.empty
    else {
      val stream = Files.list(dir) // must be closed — leaks a directory fd otherwise
      try {
        val it = stream.iterator()
        val buf = Seq.newBuilder[(Int, String)]
        while (it.hasNext) {
          val p = it.next()
          val name = p.getFileName.toString
          if (name.startsWith("v=") && Files.exists(p.resolve("_SUCCESS")))
            buf += ((name.drop(2).toInt, p.toString))
        }
        buf.result().sortBy(_._1)
      } finally stream.close()
    }
  }

  def latestVersion(table: String): Option[Int] = versions(table).lastOption.map(_._1)

  /** Latest complete snapshot, or None before the first write. */
  def read(table: String): Option[DataFrame] =
    versions(table).lastOption.map { case (_, path) => spark.read.parquet(path) }

  /** Write the next snapshot version and return its number. */
  def write(table: String, df: DataFrame): Int = {
    val next = latestVersion(table).getOrElse(0) + 1
    df.write.mode(SaveMode.Overwrite).parquet(f"${tableDir(table)}/v=$next%05d")
    next
  }

  /** MERGE an incoming frame into `table` on `keyCols`: classify against
    * the current snapshot, persist the post-merge state, return audit
    * counters (created/updated/deleted/noop — K9).
    */
  def merge(
      table: String,
      incoming: DataFrame,
      keyCols: Seq[String],
      compareCols: Seq[String],
      setCols: Seq[String] = Nil,
      softDelete: Boolean = false): Map[String, Long] = {
    val classified = read(table) match {
      case Some(current) =>
        GraphStore.classify(current, incoming, keyCols, compareCols, setCols, softDelete)
      case None =>
        incoming.withColumn(GraphStore.ACTION, lit("create"))
    }
    // single materialization drives both the counters and the snapshot
    classified.persist()
    try {
      val counts = GraphStore.counts(classified)
      write(table, GraphStore.apply(classified))
      counts
    } finally classified.unpersist()
  }

  /** K5 — edge upsert: only candidates absent from the live edge set are
    * created (the reference's `edgeExists` anti-join, `fetchExisting:
    * false` semantics). Edges are keyed (out, in, edgeClass).
    */
  def upsertEdges(candidates: DataFrame): Map[String, Long] = {
    val fresh = read("edges") match {
      case Some(existing) => GraphStore.newEdges(existing, candidates)
      case None => candidates
    }
    fresh.persist()
    try {
      val n = fresh.count()
      val union = read("edges") match {
        case Some(existing) => existing.unionByName(fresh)
        case None => fresh
      }
      write("edges", union)
      Map("created" -> n)
    } finally fresh.unpersist()
  }

  /** K7 — source dimension upsert keyed by name (graphkb.js:614-624). */
  def upsertSource(source: DataFrame): Map[String, Long] =
    merge("sources", source, keyCols = Seq("name"),
      compareCols = source.columns.filterNot(_ == "name").toSeq)
}
