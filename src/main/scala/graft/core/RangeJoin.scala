package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join — match each point to every interval containing
  * it. The workhorse behind time-window attribution ("which campaign
  * window was this event inside"), genomic overlap, and span containment.
  *
  * Spark's built-in answer to `p BETWEEN lo AND hi` with no equi-key is
  * BroadcastNestedLoopJoin — O(points × intervals) comparisons, a scan of
  * every interval per point. This implementation is the BUCKETIZED form:
  * pick a bucket width W, explode each interval to the W-grid cells it
  * overlaps, map each point to its one cell, and equi-join on the cell id
  * — Catalyst plans a plain shuffled hash join on a high-cardinality
  * integer key. Each (interval, point) pair can only meet in the point's
  * single cell, so matches are exact with NO post-join dedup; the
  * residual `lo <= p < hi` filter discards same-cell near-misses.
  *
  * Cost model: intervals replicate ceil(len/W)+1 times — W trades
  * replication against residual-filter selectivity. For 45-min windows a
  * 15-min W means ≤4 copies per interval and ≥25% of same-cell candidates
  * survive the residual. At 100 TB the join is skew-free as long as W is
  * chosen so one cell doesn't hold a large fraction of points (cells
  * inherit the time distribution of the data; a flash-crowd cell is the
  * standard AQE skew-split case).
  *
  * Domain: `ptCol`/`loCol`/`hiCol` are integer coordinates (epoch-us
  * here). Cells use FLOOR division, so negative coordinates (pre-1970
  * timestamps, signed genome offsets) bucket correctly — a point in an
  * interval straddling 0 lands in the same cell as the interval edge,
  * never silently dropped. Intervals are half-open [lo, hi); empty
  * intervals (hi <= lo) match nothing.
  */
object RangeJoin {

  /** Inner-join `points` to the `intervals` containing them; result keeps
    * every column of both frames (caller guarantees no name clash).
    */
  def pointInInterval(points: DataFrame, ptCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // floor-div (`div` truncates toward zero, which mis-buckets negative
    // coordinates): x - pmod(x, w) is the largest multiple of w <= x
    def fdiv(e: String): String =
      s"(($e) - pmod($e, $bucketWidth)) div $bucketWidth"
    val cells = intervals
      .filter(col(hiCol) > col(loCol))
      .withColumn("__cell", explode(sequence(
        expr(fdiv(loCol)),
        expr(fdiv(s"$hiCol - 1")))))
    points
      .withColumn("__cell", expr(fdiv(ptCol)))
      .join(cells, Seq("__cell"))
      .filter(col(ptCol) >= col(loCol) && col(ptCol) < col(hiCol))
      .drop("__cell")
  }
}
