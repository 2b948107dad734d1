package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-pipeline operators for large-scale training-data curation: shingling,
  * MinHash/LSH near-dup detection, SimHash, n-gram Jaccard, language-ID,
  * quality scoring, token counting and fingerprinting — all as pure Catalyst
  * column expressions (no UDFs), so every stage stays inside whole-stage
  * codegen and distributes with the data.
  *
  * Hash design: `h64(s)` = first 15 hex chars of md5 → BIGINT (60 bits,
  * always positive). MinHash permutations are `(a_i * (h % P) + b_i) % P`
  * with P = 1e9+7, so every intermediate fits in a signed 64-bit with no
  * overflow — and the identical arithmetic is expressible in the DuckDB
  * oracle (integer ops are exact in both engines; no float drift).
  *
  * Scale: shingle/signature construction is narrow (per-row); the only
  * shuffles in near-dup detection are the band-bucket self-join (keys are
  * (band_id, band_hash) — high cardinality, skew-free) and the final
  * verification join. All-pairs comparison never happens: candidates come
  * from LSH buckets only, which is the property that survives 100 TB.
  */
object TextOps {

  /** Modulus for MinHash permutations (fits 32 bits; products with 60-bit
    * hashes stay under 2^63).
    */
  val P = 1000000007L

  /** SQL fragment: 60-bit positive hash of a string expression. */
  def h64(e: String): String = s"CAST(conv(substr(md5($e), 1, 15), 16, 10) AS BIGINT)"

  /** Lower-cased whitespace word list. */
  def words(textCol: String): Column = split(lower(col(textCol)), " ")

  /** Distinct k-gram word shingles of `ws` (empty when fewer than k words —
    * NB Spark's `sequence(1, n)` counts DOWN for n<1, hence the guard).
    */
  def shingles(k: Int = 3): Column = {
    val gram = (0 until k).map(j => s"element_at(ws, i + $j)").mkString(", ' ', ")
    expr(
      s"""CASE WHEN size(ws) < $k THEN CAST(array() AS ARRAY<STRING>)
         |ELSE array_distinct(transform(sequence(1, size(ws) - ${k - 1}),
         |  i -> concat($gram))) END""".stripMargin)
  }

  /** 60-bit hashes of the shingle set. */
  def shingleHashes: Column = expr(s"transform(shingles, s -> ${h64("s")})")

  /** Plan-time permutation constants: a_i/b_i derived from md5 of the
    * permutation index — the exact arithmetic the DuckDB oracle re-derives
    * in SQL. Hoisted to literals here: leaving the md5 inside the
    * per-shingle lambda costs rows × perms × shingles digest calls (it was
    * 95% of the near-dup wall time at sf0.1).
    */
  private def mdHash64(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(d.take(15), 16)
  }

  def permConstants(nPerm: Int): Seq[(Long, Long)] =
    (0 until nPerm).map(i =>
      (mdHash64(s"a$i") % (P - 1) + 1, mdHash64(s"b$i") % P))

  /** MinHash signature: for permutation i, min over shingle hashes of
    * `(a_i * (h % P) + b_i) % P`.
    */
  def minhashSignature(nPerm: Int = 32): Column = {
    val perms = permConstants(nPerm).map { case (a, b) =>
      s"array_min(transform(shash, h -> (${a}L * (h % $P) + ${b}L) % $P))"
    }
    expr(perms.mkString("array(", ",\n", ")"))
  }

  /** LSH band keys: md5 over each band's signature slice. One row per
    * (id, band_id, band_key) after the caller explodes.
    */
  def bandKeys(nBands: Int, rowsPerBand: Int): Column =
    expr(
      s"""transform(sequence(0, ${nBands - 1}), b -> struct(
         |  b AS band_id,
         |  md5(concat_ws(',', slice(sig, b * $rowsPerBand + 1, $rowsPerBand)))
         |    AS band_key))""".stripMargin)

  /** SimHash over the shingle hash list: bit k of the result is set when
    * the +1/-1 vote of shingle-hash bit k sums positive. 32 bits.
    */
  def simhash(nBits: Int = 32): Column =
    expr(
      s"""aggregate(sequence(0, ${nBits - 1}), CAST(0 AS BIGINT), (acc, k) ->
         |  acc + CASE WHEN aggregate(shash, CAST(0 AS BIGINT), (a, h) ->
         |      a + CASE WHEN shiftright(h, k) % 2 = 1 THEN 1 ELSE -1 END) > 0
         |    THEN shiftleft(CAST(1 AS BIGINT), k) ELSE 0 END)""".stripMargin)

  /** Exact Jaccard between two shingle-set columns (integer sizes → one
    * IEEE division; bit-identical across engines).
    */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** Candidate near-dup pairs via banded MinHash-LSH, then exact-Jaccard
    * verification. Returns (id_a, id_b, jaccard) with id_a < id_b and
    * jaccard >= threshold. `df` must carry `idCol` and `textCol`.
    */
  def minhashNearDups(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      nPerm: Int = 32,
      nBands: Int = 8,
      threshold: Double = 0.5,
      blockCols: Seq[String] = Nil): DataFrame = {
    val rowsPerBand = nPerm / nBands
    // docs shorter than k words have no shingles: without this guard
    // they all share one degenerate band key (min over empty = null →
    // identical md5), turning the bucket join quadratic and producing
    // 0/0 jaccards that the two engines treat differently (null vs NaN).
    // Filter on the CHEAP word count, not size(shingles) — referencing
    // the shingle expression in a Filter makes Catalyst inline the whole
    // construction into the predicate and re-evaluate it (measured 4x).
    def withShingles = df
      .withColumn("ws", words(textCol))
      .filter(size(col("ws")) >= k)
      .withColumn("shingles", shingles(k))
    // the band self-join carries IDS ONLY: shipping the shingle arrays
    // through it costs ~document size × nBands × 2 of shuffle at scale.
    // Candidate pairs are distinct'd FIRST, then the (small) pair set
    // joins the shingle table back once per side for exact-Jaccard
    // verification — AQE broadcasts the pair side, so the shingle table
    // never shuffles either.
    // optional blocking: folding the block columns into the band-join key
    // keeps candidates within blocks (and raises join-key cardinality)
    val blk = blockCols.map(col)
    val bands = withShingles
      .withColumn("shash", shingleHashes)
      .withColumn("sig", minhashSignature(nPerm))
      .select(col(idCol).as("id") +: explode(bandKeys(nBands, rowsPerBand)).as("band") +: blk: _*)
      .select(col("id") +: col("band.band_id") +: col("band.band_key") +: blk: _*)
    val joinKeys = Seq("band_id", "band_key") ++ blockCols
    val pairs = bands.select(col("id").as("id_a") +: (Seq("band_id", "band_key") ++ blockCols).map(col): _*)
      .join(bands.select(col("id").as("id_b") +: (Seq("band_id", "band_key") ++ blockCols).map(col): _*),
        joinKeys)
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct() // a pair can collide in several bands
    // verification rebuilds only the shingle chain, not the (much more
    // expensive) signature chain
    val shingleTbl = withShingles.select(col(idCol).as("id"), col("shingles"))
    pairs
      .join(shingleTbl.select(col("id").as("id_a"), col("shingles").as("sh_a")),
        Seq("id_a"))
      .join(shingleTbl.select(col("id").as("id_b"), col("shingles").as("sh_b")),
        Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Blocked brute-force n-gram Jaccard near-dup pairs with a block-size
    * cap. The quadratic within-block pair join is only safe while blocks
    * stay small; at 100 TB a single ("en", "web") block is most of the
    * corpus. Blocks over `maxBlockSize` rows are routed through the
    * banded MinHash-LSH path instead (same blocking, folded into the band
    * key; candidates verified with exact Jaccard, so routed pairs are
    * still true positives — LSH only trades away recall on borderline
    * pairs). Returns (id_a, id_b, jaccard) with id_a < id_b and
    * jaccard >= threshold, pairs always within one block.
    */
  def blockedNgramJaccard(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blockCols: Seq[String],
      k: Int = 3,
      threshold: Double = 0.5,
      maxBlockSize: Long = 10000L,
      nPerm: Int = 32,
      nBands: Int = 8): DataFrame = {
    val blk = blockCols.map(col)
    val ws = df.withColumn("ws", words(textCol)).filter(size(col("ws")) >= k)
    // block sizes are a tiny (blockCols, count) frame even when the corpus
    // is huge — broadcast it so tagging rows is map-side
    val sizes = ws.groupBy(blk: _*).agg(count(lit(1)).as("__bn"))
    val tagged = ws.join(broadcast(sizes), blockCols)

    val smallBase = tagged.filter(col("__bn") <= maxBlockSize)
      .withColumn("shingles", shingles(k))
      .select(col(idCol).as("id") +: col("shingles") +: blk: _*)
    val smallPairs = smallBase
      .select(col("id").as("id_a") +: col("shingles").as("sh_a") +: blk: _*)
      .join(smallBase
        .select(col("id").as("id_b") +: col("shingles").as("sh_b") +: blk: _*),
        blockCols)
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)

    val bigPairs = minhashNearDups(
      tagged.filter(col("__bn") > maxBlockSize).drop("__bn", "ws"),
      idCol, textCol, k, nPerm, nBands, threshold, blockCols)

    smallPairs.unionByName(bigPairs)
  }

  /** English/French/German stopword hit counts + argmax language guess —
    * the n-gram-free heuristic tier of a language-ID stack.
    */
  val EN = Seq("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")
  val FR = Seq("le", "la", "et", "les", "des", "un", "une", "du", "est", "dans")
  val DE = Seq("der", "die", "und", "das", "ist", "nicht", "ein", "mit", "den", "von")

  private def hitCount(stop: Seq[String]): String = {
    val arr = stop.map(w => s"'$w'").mkString("array(", ", ", ")")
    s"size(filter(ws, w -> array_contains($arr, w)))"
  }

  def langIdColumns: Seq[Column] = Seq(
    expr(hitCount(EN)).cast("long").as("en_hits"),
    expr(hitCount(FR)).cast("long").as("fr_hits"),
    expr(hitCount(DE)).cast("long").as("de_hits"))

  def predictedLang: Column =
    when(col("en_hits") >= col("fr_hits") && col("en_hits") >= col("de_hits") &&
      col("en_hits") > 0, lit("en"))
      .when(col("fr_hits") >= col("de_hits") && col("fr_hits") > 0, lit("fr"))
      .when(col("de_hits") > 0, lit("de"))
      .otherwise(lit("unknown"))

  /** Token count (whitespace) and a BPE-ish regex token count
    * (word pieces + punctuation marks).
    */
  def tokenCounts: Seq[Column] = Seq(
    size(col("ws")).cast("long").as("n_ws_tokens"),
    expr("size(regexp_extract_all(text, '[a-z0-9]+|[^a-z0-9\\\\s]', 0))")
      .cast("long").as("n_bpeish_tokens"))

  /** Quality score in [0,1]: mean of three bounded signals — length band,
    * mean word length band, alpha-character ratio. Integer inputs → exact
    * double arithmetic, reproducible in the oracle.
    */
  def qualityScore: Column =
    expr(
      """(
        |  CASE WHEN length(text) BETWEEN 100 AND 5000 THEN 1.0
        |       WHEN length(text) > 5000 THEN 0.5 ELSE 0.2 END +
        |  CASE WHEN CAST(length(replace(text, ' ', '')) AS DOUBLE) / size(ws)
        |            BETWEEN 3.0 AND 8.0 THEN 1.0 ELSE 0.4 END +
        |  CAST(length(regexp_replace(text, '[^a-zA-Z ]', '')) AS DOUBLE)
        |    / length(text)
        |) / 3.0""".stripMargin)
}
