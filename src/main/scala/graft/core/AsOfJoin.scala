package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, attach the single most recent right row
  * at-or-before (or strictly before) the left row's timestamp, per key.
  * The operator a feature-store / point-in-time-correct training join
  * compiles to: "what was the last known state when this example was
  * observed" without leaking the future.
  *
  * Spark has no ASOF JOIN operator (DuckDB/Pandas do), and the naive
  * rewrite — inequality join then keep the max-ts match per left row —
  * materializes every (left, prior-right) pair before pruning: a key with
  * L lefts and R rights costs O(L·R) intermediate rows, quadratic on hot
  * keys. This implementation is the UNION-SORT form: tag both sides,
  * union, and run ONE per-key ordered window where `last(payload,
  * ignoreNulls)` carries the latest right payload forward onto each left
  * row. Cost is ONE shuffle on the key and a per-key sort of L+R rows —
  * linear, the same work sessionization already does. (`.explain` shows
  * a single Exchange: even the duplicate-instant tiebreak rides the
  * window sort key rather than a pre-aggregation shuffle.)
  *
  * Tie rules, pinned by the (ts, side, payload) sort key:
  *  - `strict = false` (default): a right row AT the left timestamp
  *    matches (right sorts before left at equal ts) — DuckDB
  *    `ASOF JOIN ... ON l.ts >= r.ts` semantics.
  *  - `strict = true`: equal-ts right rows are invisible (left sorts
  *    first) — `l.ts > r.ts`.
  *  - duplicate right rows on one (key, ts) instant: the struct-max
  *    payload wins — payload is the last component of the sort key, and
  *    the running `last` over the ROWS frame therefore reads the
  *    greatest payload of the newest visible instant. Deterministic
  *    with no extra pass.
  *
  * Scale: the only shuffle is the hash partition on the key; payloads
  * ride as one struct column. Left rows with no prior right keep NULL
  * payload (left-join semantics). A pathological hot key is the
  * standard per-key-window skew caveat — same answer as sessionize
  * (AQE skew split or day pre-split).
  */
object AsOfJoin {

  /** `left` keeps ALL its columns; the matched right row contributes
    * `asof_ts` (its timestamp as BIGINT, NULL when unmatched) and each
    * column of `payloadCols` (caller guarantees the names don't clash
    * with left's). `leftTs`/`rightTs` name integer-timestamp columns of
    * their frames (epoch-us BIGINTs in practice — integer compare, no
    * float boundary flips).
    */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, payloadCols: Seq[String],
      strict: Boolean = false): DataFrame = {
    val leftCols = left.columns.toSeq
    val (rightSide, leftSide) = if (strict) (1, 0) else (0, 1)
    // NULL-key and NULL-timestamp right rows can never match (SQL
    // semantics: NULL = NULL and NULL >= ts are both unknown — the
    // per-key window would otherwise group NULLs together / sort a
    // NULL-ts right FIRST and hand out a payload DuckDB's ASOF JOIN
    // denies); NULL-key/ts LEFT rows stay, unmatched (left join)
    val taggedRight = right
      .filter(col(key).isNotNull && col(rightTs).isNotNull)
      .select(col(key), col(rightTs).cast("long").as("__ts"),
        struct((col(rightTs).cast("long").as("asof_ts") +:
          payloadCols.map(col)): _*).as("__p"))
      .withColumn("__side", lit(rightSide))
    val taggedLeft = left
      .select(col(key), col(leftTs).cast("long").as("__ts"),
        lit(null).cast(taggedRight.schema("__p").dataType).as("__p"),
        lit(leftSide).as("__side"),
        struct(leftCols.map(col): _*).as("__l"))
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts"), col("__side"), col("__p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    taggedRight
      .withColumn("__l", lit(null).cast(taggedLeft.schema("__l").dataType))
      .unionByName(taggedLeft)
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__l").isNotNull)
      .select(
        leftCols.map(c => col(s"__l.$c").as(c)) ++
          Seq(col("__m.asof_ts").as("asof_ts")) ++
          payloadCols.map(c => col(s"__m.$c").as(c)): _*)
  }
}
