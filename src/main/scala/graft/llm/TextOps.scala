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

  /** Column form of [[h64]] — the ONE md5→60-bit recipe every consumer
    * (shingle hashing, deterministic sampling) must share so the oracle
    * arithmetic stays in lockstep.
    */
  def h64c(e: Column): Column =
    conv(substring(md5(e), 1, 15), 16, 10).cast("long")

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
    * `(a_i * (h % P) + b_i) % P` — the native fused-loop
    * [[graft.plans.MinHashSig]] (the composed `array(array_min(
    * transform(...)), ...)` form allocated nPerm intermediate arrays per
    * row and ran interpreted).
    */
  def minhashSignature(nPerm: Int = 32): Column = {
    val (as, bs) = permConstants(nPerm).unzip
    graft.plans.MinHashSig.minhashSig(col("shash"), as, bs, P)
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
    * the +1/-1 vote of shingle-hash bit k sums positive. 32 bits — the
    * native one-pass [[graft.plans.SimHash]] (the composed
    * `aggregate(sequence(...), aggregate(shash, ...))` form re-walked the
    * hash array once per output bit, interpreted).
    */
  def simhash(nBits: Int = 32): Column =
    graft.plans.SimHash.simhash64(col("shash"), nBits)

  /** SimHash hamming near-dup pairs via the Charikar block scheme:
    * fingerprints split into `nBlocks` equal bit blocks; candidates share
    * at least one EXACT block, then verify `popcount(xor) ≤ maxHamming`.
    * With `maxHamming < nBlocks` the pigeonhole makes the decomposition
    * LOSSLESS — a pair within the radius differs in at most `maxHamming`
    * blocks, so some block matches exactly — and the result EQUALS brute
    * all-pairs (which is exactly what the oracle replays; unlike MinHash
    * banding there is no recall loss to measure). Default 60-bit
    * fingerprints: the shingle hashes are 60-bit (15 hex chars), so bits
    * 60+ would be degenerate all-zero votes.
    *
    * Scale: the join key is (block_id, 15-bit block value) — candidates
    * per bucket ~ corpus/2^15 per block; for bigger corpora raise
    * fingerprint width/blocks (the standard 64-bit/4-block layout
    * detects radius 3 at 2^16 keys). Only the 8-byte fingerprint rides
    * the self-join — never shingles; verification is one xor+popcount.
    */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, nBits: Int = 60, nBlocks: Int = 4,
      maxHamming: Int = 3): DataFrame = {
    require(nBits % nBlocks == 0, "nBlocks must divide nBits")
    require(maxHamming < nBlocks,
      "pigeonhole needs maxHamming < nBlocks (else the block join loses pairs)")
    val bw = nBits / nBlocks
    val mask = (1L << bw) - 1
    val f = df.withColumn("ws", words(textCol))
      .filter(size(col("ws")) >= k)
      .withColumn("shingles", shingles(k))
      .withColumn("shash", shingleHashes)
      .select(col(idCol).as("id"), simhash(nBits).as("sh"))
    val blocks = f.select(col("id"), col("sh"),
        explode(expr(s"""transform(sequence(0, ${nBlocks - 1}), b ->
          |  struct(b AS block_id,
          |    shiftright(sh, b * $bw) & $mask AS block_key))""".stripMargin))
          .as("blk"))
      .select(col("id"), col("sh"), col("blk.block_id"), col("blk.block_key"))
    blocks.select(col("id").as("id_a"), col("sh").as("sh_a"),
        col("block_id"), col("block_key"))
      .join(blocks.select(col("id").as("id_b"), col("sh").as("sh_b"),
        col("block_id"), col("block_key")), Seq("block_id", "block_key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        expr("CAST(bit_count(sh_a ^ sh_b) AS BIGINT)").as("hamming"))
      // a pair can collide in several blocks; hamming is functional in
      // the pair, so the dedup key is the pair alone
      .dropDuplicates("id_a", "id_b")
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact Jaccard between two array columns (integer counts → one IEEE
    * division; bit-identical across engines). Safe for ANY input: the
    * native [[graft.plans.JaccardSim]] derives |a ∪ b| as |a| + |b| −
    * |a ∩ b|, which is only valid for element-distinct arrays, so the
    * public boundary dedupes both sides first. Internal near-dup paths
    * call [[jaccardSets]] directly — their shingle sets are already
    * `array_distinct`'d, and re-deduping per candidate pair would tax the
    * hot verification loop.
    */
  def jaccard(a: Column, b: Column): Column =
    graft.plans.JaccardSim.jaccardSim(array_distinct(a), array_distinct(b))

  /** [[jaccard]] PRECONDITIONED on element-distinct inputs (shingle sets
    * are). Skips the per-pair `array_distinct`.
    */
  def jaccardSets(a: Column, b: Column): Column =
    graft.plans.JaccardSim.jaccardSim(a, b)

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
        jaccardSets(col("sh_a"), col("sh_b")).as("jaccard"))
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
        jaccardSets(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)

    val bigPairs = minhashNearDups(
      tagged.filter(col("__bn") > maxBlockSize).drop("__bn", "ws"),
      idCol, textCol, k, nPerm, nBands, threshold, blockCols)

    smallPairs.unionByName(bigPairs)
  }

  /** The per-document dedup index frames: content hashes (id, __ck),
    * id-only LSH band rows (id, band_id, band_key — shingle arrays never
    * ride the band join), and the shingle table for exact verification.
    * For a rolling-ingest deployment these three are computed ONCE per
    * corpus, persisted (bands bucketed by band_key, hashes by __ck), and
    * reused by every [[incrementalDedup]] batch — the index frames are
    * plain DataFrames precisely so they can be parquet round-tripped.
    */
  case class DedupIndex(hashes: DataFrame, bands: DataFrame, shingles: DataFrame)

  /** Build the [[DedupIndex]] for a document frame. */
  def buildDedupIndex(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, nPerm: Int = 32, nBands: Int = 8): DedupIndex = {
    val rowsPerBand = nPerm / nBands
    val prep = df.withColumn("ws", words(textCol))
    val sh = prep.filter(size(col("ws")) >= k).withColumn("shingles", shingles(k))
    val bands = sh
      .withColumn("shash", shingleHashes)
      .withColumn("sig", minhashSignature(nPerm))
      .select(col(idCol).as("id"),
        explode(bandKeys(nBands, rowsPerBand)).as("band"))
      .select(col("id"), col("band.band_id"), col("band.band_key"))
    DedupIndex(
      hashes = prep.select(col(idCol).as("id"), md5(col(textCol)).as("__ck")),
      bands = bands,
      shingles = sh.select(col(idCol).as("id"), col("shingles")))
  }

  /** Incremental dedup: admit a NEW batch against an EXISTING corpus —
    * the shape every rolling crawl ingest runs, where re-deduping the
    * whole corpus per batch is the naive O(corpus) mistake. Two tiers:
    * exact (content-hash semi join) and near-dup (the new batch's band
    * keys probe the corpus band index — not a self-join — then exact
    * Jaccard verification over one shingle join-back per side). Returns
    * one decision row per new document: (id, dup_exact, dup_near, keep).
    *
    * Scale: pass a PERSISTED `corpusIndex` — then the per-batch cost is
    * O(batch) index construction plus joins that read only the probed
    * band buckets, and the corpus text is never rescanned. The
    * convenience overload below recomputes the corpus index inline
    * (right for one-shot jobs and the correctness gate, wrong for a
    * rolling ingest — it pays O(corpus) per call).
    */
  /** Verified near-dup pairs WITHIN one [[DedupIndex]] — the same
    * band-candidate → distinct → shingle-join-back → exact-Jaccard tiering
    * as [[minhashNearDups]], but reading the (persisted) index frames
    * instead of re-deriving shingles and signatures from text. A rolling
    * deployment computes the index once per corpus and gets both its
    * standing pair list (here) and every batch probe
    * ([[incrementalNearPairs]]) from it — the corpus text is scanned once
    * ever.
    */
  def nearPairsFromIndex(idx: DedupIndex, threshold: Double): DataFrame = {
    val pairs = idx.bands.select(col("id").as("id_a"), col("band_id"), col("band_key"))
      .join(idx.bands.select(col("id").as("id_b"), col("band_id"), col("band_key")),
        Seq("band_id", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    pairs
      .join(idx.shingles.select(col("id").as("id_a"), col("shingles").as("sh_a")),
        Seq("id_a"))
      .join(idx.shingles.select(col("id").as("id_b"), col("shingles").as("sh_b")),
        Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        jaccardSets(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Verified near-dup pairs BETWEEN a new-batch index and the corpus
    * index: (id, oid) where `id` is a new doc and `oid` an existing one.
    * Id-only band probe (not a self-join), candidates distinct'd, then one
    * shingle join-back per side for exact-Jaccard verification — the same
    * tiering as [[minhashNearDups]] but against a PERSISTED index. The
    * pair detail (not just a flag) is what incremental CLUSTERING needs:
    * these edges attach new docs to existing components.
    */
  def incrementalNearPairs(
      corpusIndex: DedupIndex, newIdx: DedupIndex,
      threshold: Double): DataFrame = {
    val cand = newIdx.bands
      .join(corpusIndex.bands.withColumnRenamed("id", "oid"),
        Seq("band_id", "band_key"))
      .select(col("id"), col("oid")).distinct()
    cand
      .join(newIdx.shingles.withColumnRenamed("shingles", "sh_new"), Seq("id"))
      .join(corpusIndex.shingles.select(col("id").as("oid"),
        col("shingles").as("sh_old")), Seq("oid"))
      .filter(jaccardSets(col("sh_new"), col("sh_old")) >= threshold)
      .select(col("id"), col("oid"))
  }

  def incrementalDedup(
      corpusIndex: DedupIndex, newBatch: DataFrame,
      idCol: String, textCol: String,
      k: Int, nPerm: Int, nBands: Int,
      threshold: Double): DataFrame = {
    val newIdx = buildDedupIndex(newBatch, idCol, textCol, k, nPerm, nBands)

    // exact tier: content-hash semi join against the corpus hash set
    val exactDups = newIdx.hashes
      .join(corpusIndex.hashes.select(col("__ck")).distinct(), Seq("__ck"), "left_semi")
      .select(col("id")).withColumn("dup_exact", lit(true))

    // near tier: any verified cross pair ⇒ near-dup
    val nearDups = incrementalNearPairs(corpusIndex, newIdx, threshold)
      .select(col("id")).distinct()
      .withColumn("dup_near", lit(true))

    newBatch.select(col(idCol).as("id"))
      .join(exactDups, Seq("id"), "left")
      .join(nearDups, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("dup_exact"), lit(false)).as("dup_exact"),
        coalesce(col("dup_near"), lit(false)).as("dup_near"))
      .withColumn("keep", !col("dup_exact") && !col("dup_near"))
  }

  /** One-shot convenience form: builds the corpus index inline. */
  def incrementalDedup(
      corpus: DataFrame, newBatch: DataFrame,
      idCol: String, textCol: String,
      k: Int = 3, nPerm: Int = 32, nBands: Int = 8,
      threshold: Double = 0.5): DataFrame =
    incrementalDedup(buildDedupIndex(corpus, idCol, textCol, k, nPerm, nBands),
      newBatch, idCol, textCol, k, nPerm, nBands, threshold)

  /** Corpus-level line deduplication — the C4/Gopher boilerplate-removal
    * step: a line appearing in `minDocs`+ DISTINCT documents (cookie
    * banners, nav text, footers) is boilerplate; every document gets its
    * line/boilerplate counts and its text with those lines removed,
    * original line order preserved.
    *
    * Scale: the explode is narrow (one row per line); the global line
    * census is one groupBy on the line text — high cardinality, partial
    * aggs absorb the heavy hitters (a boilerplate line's count partials
    * combine map-side). The boilerplate set joins back WITHOUT a
    * broadcast hint: its size is corpus-dependent, so AQE picks the
    * strategy (in practice it is tiny — that is what makes it
    * boilerplate). Reassembly sorts each doc's surviving lines by
    * position inside one aggregation — no window.
    */
  def lineDedup(df: DataFrame, idCol: String, textCol: String,
      minDocs: Long): DataFrame = {
    val lines = df.select(col(idCol).as("id"),
      posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
      // census + join-back ride the 8-byte h64c(line) key, not the line
      // text: the exchange ships hashes, the full strings stay on the
      // reassembly side only (a 60-bit md5 collision would conflate two
      // distinct lines' counts — negligible below ~2^30 distinct lines)
      .withColumn("__lh", h64c(col("line")))
    val boiler = lines.groupBy(col("__lh"))
      .agg(countDistinct(col("id")).as("__nd"))
      .filter(col("__nd") >= minDocs)
      .select(col("__lh"), lit(true).as("__b"))
    lines.join(boiler, Seq("__lh"), "left")
      .groupBy(col("id"))
      .agg(
        count(lit(1)).cast("long").as("n_lines"),
        sum(when(col("__b"), 1L).otherwise(0L)).as("n_dup_lines"),
        // concat_ws skips the nulls left where boilerplate lines were
        concat_ws("\n", expr(
          """transform(array_sort(collect_list(struct(pos,
            |  CASE WHEN __b THEN CAST(NULL AS STRING) ELSE line END AS line))),
            |  x -> x.line)""".stripMargin)).as("cleaned_text"))
      .select(col("id").as(idCol), col("n_lines"), col("n_dup_lines"),
        col("cleaned_text"))
  }

  /** Exact-substring duplicate-span detection — the distributed shape of
    * Lee et al. 2022's ExactSubstr dedup (arXiv:2107.06499). A position
    * whose word-`k`-gram occurs in at least `minDocs` DISTINCT documents
    * is a duplicated span; consecutive duplicated positions chain into
    * runs, and the longest run bounds the longest duplicated substring
    * (a run of r k-grams covers r+k-1 tokens — ExactSubstr's "remove
    * repeated spans ≥50 tokens" rule is a threshold on this number).
    * Returns one row per document: (id, n_spans, n_dup_spans,
    * max_dup_run); docs shorter than `k` words report zero spans.
    *
    * Scale, 100 TB shape:
    * - Gram keys come from the native [[graft.plans.RollingGrams]]
    *   dual-modulus rolling hash over per-WORD [[h64]] hashes: each word
    *   is md5-hashed once, then every k-gram key is O(1) long arithmetic
    *   — no gram strings are ever materialized (the
    *   `md5(concat_ws(slice(...)))` form re-copies ~k words of text per
    *   position). The frequency count shuffles the 8-byte key, and
    *   partial aggregation collapses within-partition repeats
    *   (boilerplate grams are exactly the heavy hitters) before the
    *   exchange.
    * - The duplicated-gram set is the join key back to positions — a
    *   plain shuffle join on the same hash; AQE's skew split handles the
    *   one mega-gram every web crawl has.
    * - Run detection is gaps-and-islands per document (pos − row_number
    *   over the doc's dup positions): the window partitions on the
    *   high-cardinality doc id, so no straggler partition exists.
    */
  def spanDedup(df: DataFrame, idCol: String, textCol: String, k: Int = 8,
      minDocs: Long = 2L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(idCol).as("id"), words(textCol).as("ws"))
      .withColumn("n_spans",
        greatest(size(col("ws")).cast("long") - (k - 1), lit(0L)))
    // positional k-gram keys (0-based pos; only run LENGTHS are emitted,
    // so the base offset cancels against the oracle's 1-based subscripts)
    val grams = base.filter(col("n_spans") > 0)
      .withColumn("wh", expr(s"transform(ws, w -> ${h64("w")})"))
      .select(col("id"),
        posexplode(graft.plans.RollingGrams.rollingGrams(col("wh"), k))
          .as(Seq("pos", "h")))
    val dupGrams = grams.groupBy(col("h"))
      .agg(countDistinct(col("id")).as("__nd"))
      .filter(col("__nd") >= minDocs)
      .select(col("h"))
    val dupPos = grams.join(dupGrams, Seq("h"), "left_semi")
    val wd = Window.partitionBy(col("id")).orderBy(col("pos"))
    val runs = dupPos.withColumn("grp", col("pos") - row_number().over(wd))
      .groupBy(col("id"), col("grp")).agg(count(lit(1)).as("rl"))
      .groupBy(col("id"))
      .agg(sum(col("rl")).as("n_dup_spans"), max(col("rl")).as("max_dup_run"))
    base.select(col("id"), col("n_spans"))
      .join(runs, Seq("id"), "left")
      .select(col("id").as(idCol), col("n_spans"),
        coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"),
        coalesce(col("max_dup_run"), lit(0L)).as("max_dup_run"))
  }

  /** Exact-substring span REMOVAL — the transformation [[spanDedup]]
    * measures: every duplicated k-gram occurrence except the globally
    * FIRST one (min (doc id, position) per gram — Lee et al.'s
    * keep-one-copy rule, made deterministic) is removed, and each
    * document's text is rebuilt from the words no removed span covers.
    * Returns (id, n_words, n_removed_words, cleaned_text), order
    * preserved.
    *
    * Scale: the same rolling-hash gram census as [[spanDedup]] (8-byte
    * keys, partial aggs over the boilerplate heavy-hitters); the
    * canonical occurrence is one more partial-agg min(struct(id, pos))
    * on the gram key; coverage expansion is a narrow explode of rare
    * (removed) positions; reconstruction is a per-doc sort of its own
    * surviving words — all joins ride the high-cardinality (id, pos) or
    * gram-hash keys.
    */
  def spanScrub(df: DataFrame, idCol: String, textCol: String, k: Int = 8,
      minDocs: Long = 2L): DataFrame = {
    val base = df.select(col(idCol).as("id"), words(textCol).as("ws"))
      .withColumn("n_words", size(col("ws")).cast("long"))
    val grams = base.filter(size(col("ws")) >= k)
      .withColumn("wh", expr(s"transform(ws, w -> ${h64("w")})"))
      .select(col("id"),
        posexplode(graft.plans.RollingGrams.rollingGrams(col("wh"), k))
          .as(Seq("pos", "h")))
    val dupg = grams.groupBy(col("h"))
      .agg(countDistinct(col("id")).as("__nd"))
      .filter(col("__nd") >= minDocs)
      .select(col("h"))
    val occ = grams.join(dupg, Seq("h"), "left_semi")
    val canon = occ.groupBy(col("h"))
      .agg(min(struct(col("id"), col("pos"))).as("keep"))
    val removed = occ.join(canon, Seq("h"))
      .filter(!(col("id") === col("keep.id") && col("pos") === col("keep.pos")))
      .select(col("id"), col("pos"))
    val covered = removed
      .select(col("id"), explode(expr(s"sequence(pos, pos + ${k - 1})")).as("wpos"))
      .distinct()
    val kept = base
      .select(col("id"), posexplode(col("ws")).as(Seq("wpos", "word")))
      .join(covered, Seq("id", "wpos"), "left_anti")
      .groupBy(col("id"))
      .agg(count(lit(1)).cast("long").as("__nk"),
        concat_ws(" ", expr(
          "transform(array_sort(collect_list(struct(wpos, word))), x -> x.word)"))
          .as("cleaned_text"))
    base.select(col("id"), col("n_words"))
      .join(kept, Seq("id"), "left")
      .select(col("id").as(idCol), col("n_words"),
        (col("n_words") - coalesce(col("__nk"), lit(0L))).as("n_removed_words"),
        coalesce(col("cleaned_text"), lit("")).as("cleaned_text"))
  }

  /** Benchmark decontamination: flag training documents sharing any
    * word-`k`-gram with an evaluation set — the standard guard against
    * test-set leakage into training data. Returns one row per training
    * doc: (id, n_eval_grams = distinct shared k-grams, contaminated).
    *
    * Scale: eval benchmark suites are small by nature, so their distinct
    * k-gram set broadcasts; the training side is one narrow explode +
    * broadcast semi-join — the corpus never shuffles. Docs shorter than
    * `k` words have no k-grams and report clean.
    */
  def contaminationFlags(train: DataFrame, evalSet: DataFrame,
      idCol: String, textCol: String, k: Int = 8): DataFrame = {
    val evalGrams = evalSet
      .withColumn("ws", words(textCol))
      .filter(size(col("ws")) >= k)
      .withColumn("shingles", shingles(k))
      .select(explode(col("shingles")).as("g")).distinct()
    val hits = train
      .withColumn("ws", words(textCol))
      .filter(size(col("ws")) >= k)
      .withColumn("shingles", shingles(k))
      .select(col(idCol).as("id"), explode(col("shingles")).as("g"))
      .join(broadcast(evalGrams), Seq("g"))
      .groupBy(col("id"))
      .agg(count(lit(1)).cast("long").as("n_eval_grams"))
    train.select(col(idCol).as("id"))
      .join(hits, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_eval_grams"), lit(0L)).as("n_eval_grams"))
      .withColumn("contaminated", col("n_eval_grams") > 0)
  }

  /** Per-EVAL-document contamination REPORT — the inverse view of
    * [[contaminationFlags]]: for each eval doc, how much of it leaked
    * into the training corpus (distinct hit grams out of its distinct
    * grams, and how many train docs share at least one gram). Flags tell
    * you which TRAIN docs to drop; this tells you which EVALS are still
    * trustworthy after training. Eval docs shorter than `k` words carry
    * no grams and are omitted (nothing to leak).
    *
    * Scale: gram-key equi-join (shuffle on the gram hash) with
    * partial-aggregated distinct counts; works unbroadcast when the eval
    * suite itself is large.
    */
  def contaminationReport(train: DataFrame, evalSet: DataFrame,
      idCol: String, textCol: String, k: Int = 8): DataFrame = {
    def grams(df: DataFrame, as: String) = df
      .withColumn("ws", words(textCol))
      .filter(size(col("ws")) >= k)
      .withColumn("shingles", shingles(k))
      .select(col(idCol).as(as), explode(col("shingles")).as("g"))
    // single pass: left-join train grams onto eval grams and take all
    // three distinct counts in ONE aggregation — the eval set is scanned,
    // tokenized, and shingled once (the totals/hits split would replay
    // the whole eval-gram subtree twice)
    grams(evalSet, "eval_id")
      .join(grams(train, "train_id"), Seq("g"), "left")
      .groupBy(col("eval_id"))
      .agg(countDistinct(col("g")).cast("long").as("n_grams"),
        countDistinct(when(col("train_id").isNotNull, col("g")))
          .cast("long").as("n_hit_grams"),
        countDistinct(col("train_id")).cast("long").as("n_train_docs"))
      .withColumn("burned", col("n_hit_grams") > 0)
  }

  /** Corpus SNAPSHOT DIFF — the data-governance view of two corpus
    * versions: per doc id, `added` / `removed` / `changed` / `unchanged`
    * by content hash, plus both hashes for audit. The document-level
    * analogue of the store's K-family diff tiers: before retraining on a
    * refreshed crawl you want exactly this table (what entered, what
    * left, what silently mutated).
    *
    * Scale: one full-outer equi-join on the id (shuffle on the join key,
    * AQE-handled); the compared value is the 64-bit content hash, so
    * text never rides the shuffle — at 100 TB both sides prune to
    * (id, h64) projections off the parquet scan.
    */
  def corpusDiff(v1: DataFrame, v2: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    def keyed(df: DataFrame, h: String) =
      df.select(col(idCol), h64c(col(textCol)).as(h))
    keyed(v1, "h_old").join(keyed(v2, "h_new"), Seq(idCol), "full_outer")
      .withColumn("status",
        when(col("h_old").isNull, lit("added"))
          .when(col("h_new").isNull, lit("removed"))
          .when(col("h_old") === col("h_new"), lit("unchanged"))
          .otherwise(lit("changed")))
      .select(col(idCol), col("h_old"), col("h_new"), col("status"))
  }

  /** Corpus DISTRIBUTION DRIFT — the statistical companion to
    * [[corpusDiff]]'s row-level view: compare two snapshots' word
    * distributions and surface the top-k most-drifted words. Each word's
    * rate in each snapshot is ONE IEEE double division `c / N` (exact
    * and bit-identical cross-engine; an integer-scaled rate like
    * `c·10¹²` overflows 64 bits once a word passes ~9×10⁶ occurrences,
    * and the cross-product `c₁·N₂` far earlier) and drift is the
    * absolute rate difference — a fixed two-op IEEE sequence, ranked
    * with a word tie-break, so the top-k cut is deterministic. The
    * per-word |Δrate| is each word's (doubled) contribution to
    * total-variation distance. This is the "did the crawl refresh shift
    * the language" gate a retraining decision reads.
    *
    * Scale: two token-count aggregations (vocab-sized, Zipf keys
    * collapse map-side), one full-outer join on the word key, one
    * TakeOrderedAndProject for the top-k — never a global sort. Text
    * never shuffles; only (word, count) pairs move.
    */
  def corpusDrift(v1: DataFrame, v2: DataFrame, idCol: String,
      textCol: String, topK: Int): DataFrame = {
    def counts(df: DataFrame, c: String) = df
      .select(explode(words(textCol)).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as(c))
    def total(df: DataFrame, n: String) = df
      .select(explode(words(textCol)).as("word"))
      .filter(length(col("word")) > 0)
      .agg(count(lit(1)).as(n))
    counts(v1, "c1").join(counts(v2, "c2"), Seq("word"), "full_outer")
      .na.fill(0L, Seq("c1", "c2"))
      .crossJoin(broadcast(total(v1, "n1")))
      .crossJoin(broadcast(total(v2, "n2")))
      .withColumn("r1", col("c1").cast("double") / col("n1").cast("double"))
      .withColumn("r2", col("c2").cast("double") / col("n2").cast("double"))
      .withColumn("drift", abs(col("r1") - col("r2")))
      .orderBy(col("drift").desc, col("word").asc)
      .limit(topK)
      .select(col("word"), col("c1"), col("c2"), col("r1"), col("r2"),
        col("drift"))
  }

  /** Corpus vocabulary census: global term and document frequencies with
    * a deterministic top-k — the TF/DF table a tokenizer-training or IDF
    * stage starts from. Zipf skew is the defining property of this
    * workload and the plan absorbs it: partial aggregation collapses each
    * partition's heavy hitters map-side before the one shuffle on the
    * word key, and the top-k is `TakeOrderedAndProject` (per-partition
    * heaps + driver merge of topK rows), never a global sort. Tie-break
    * (count desc, word asc) makes the cut deterministic.
    */
  def vocabCensus(df: DataFrame, idCol: String, textCol: String,
      topK: Int): DataFrame = {
    val tokens = df.select(col(idCol).as("id"),
      explode(words(textCol)).as("word"))
      .filter(length(col("word")) > 0)
    val tf = tokens.groupBy(col("word"))
      .agg(count(lit(1)).as("n_occurrences"))
    val dfq = tokens.select(col("id"), col("word")).distinct()
      .groupBy(col("word")).agg(count(lit(1)).as("n_docs"))
    tf.join(dfq, Seq("word"))
      .orderBy(col("n_occurrences").desc, col("word").asc)
      .limit(topK)
      .select(col("word"), col("n_occurrences"), col("n_docs"))
  }

  /** Deterministic word-dropout augmentation: token i of document d
    * drops iff `h64(id:salt:pos) mod 100 < pct` — membership is a pure
    * function of (identity, position, salt), so the augmented corpus is
    * reproducible across engines, partitionings and re-runs, and a new
    * `salt` value gives an independent dropout mask per training epoch
    * (the property `rand()`-based augmentation can never provide).
    * Returns (id, n_words, n_dropped, augmented_text), order preserved.
    *
    * Scale: one narrow posexplode, a map-side hash predicate, and a
    * per-doc regroup keyed on the high-cardinality id — no corpus-wide
    * state, no shuffle beyond the regroup.
    */
  def wordDropout(df: DataFrame, idCol: String, textCol: String,
      pct: Int, salt: String): DataFrame = {
    val toks = df.select(col(idCol).as("id"), words(textCol).as("ws"))
      .withColumn("n_words", size(col("ws")).cast("long"))
      .select(col("id"), col("n_words"),
        posexplode(col("ws")).as(Seq("wpos", "word")))
      .withColumn("__keep",
        h64c(concat(col("id").cast("string"), lit(s":$salt:"),
          col("wpos").cast("string"))) % 100 >= pct)
    toks.groupBy(col("id"), col("n_words"))
      .agg(
        sum(when(col("__keep"), 0L).otherwise(1L)).as("n_dropped"),
        concat_ws(" ", expr(
          """transform(array_sort(collect_list(struct(wpos,
            |  CASE WHEN __keep THEN word ELSE CAST(NULL AS STRING) END AS word))),
            |  x -> x.word)""".stripMargin)).as("augmented_text"))
      .select(col("id").as(idCol), col("n_words"), col("n_dropped"),
        col("augmented_text"))
  }

  /** Text normalization — the cleanup stage that runs BEFORE any dedup or
    * quality pass (C4-style): URLs replaced with a `<URL>` token, tab/CR
    * control characters to spaces, space runs collapsed, ends trimmed.
    * Pure codegen'd column expressions (Java-regex syntax shared with the
    * oracle dialect); returns the URL count so the scrub is auditable.
    */
  def normalizeText(textCol: Column): Column = {
    val noUrl = regexp_replace(textCol, "https?://[^ ]+", "<URL>")
    val noCtl = regexp_replace(noUrl, "[\\t\\r]", " ")
    trim(regexp_replace(noCtl, " {2,}", " "))
  }

  def urlCount(textCol: Column): Column =
    regexp_count(textCol, lit("https?://[^ ]+")).cast("long")

  /** BPE merge-pair statistics: corpus-weighted counts of adjacent
    * character pairs inside words — the quantity byte-pair-encoding
    * tokenizer training maximizes at every merge step (the top pair IS
    * the next merge). One round is the demonstrable unit: subsequent
    * rounds re-run the same plan over re-segmented words.
    *
    * Scale: pair counting never touches documents twice — it rides the
    * word-frequency table (vocab-sized, the census shape), so a pair's
    * weight is `Σ word_count` over words containing it: the explode is
    * |vocab|·avg_word_len rows, not |corpus tokens|. Top-k is
    * `TakeOrderedAndProject` with the (count desc, pair asc) tie-break
    * pinned.
    */
  def bpePairStats(df: DataFrame, idCol: String, textCol: String,
      topK: Int): DataFrame = {
    val wordFreq = df.select(explode(words(textCol)).as("word"))
      .filter(length(col("word")) > 1)
      .groupBy(col("word")).agg(count(lit(1)).as("wc"))
    wordFreq
      .select(col("wc"), explode(expr(
        "transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))"))
        .as("pair"))
      .groupBy(col("pair")).agg(sum(col("wc")).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("pair").asc)
      .limit(topK)
  }

  /** BPE TOKENIZER TRAINING — `nMerges` greedy merge rules learned the
    * way a production BPE trainer learns them: iterate on the WORD
    * FREQUENCY DICT (vocab-sized — the corpus is touched exactly once,
    * by the census), each step (1) counting adjacent symbol pairs
    * weighted by word frequency, (2) picking the top pair with a pinned
    * tie-break (count desc, pair asc), (3) applying the merge greedily
    * left-to-right inside every word. Returns the merge table — the
    * artifact a tokenizer ships: (merge_rank, left_sym, right_sym,
    * token, n_occurrences).
    *
    * Greedy left-to-right application is sequential per word, but
    * reduces to window algebra: candidate positions i (sym=a, next=b)
    * that are ADJACENT only occur when a = b (runs like "aaaa"), and
    * greedy keeps alternate candidates from each run's head — so
    * `apply ⇔ (pos − run_head_pos) even`, computed with two windows
    * partitioned by word. The same algebra replays in the oracle SQL.
    *
    * Scale: every step is a handful of narrow shuffles keyed on the
    * high-cardinality word (dict rows are short), a 1-row top-pair frame
    * broadcast back, and a `localCheckpoint()` so step k+1 starts from
    * materialized state instead of replaying steps 1..k. nMerges bounded
    * passes over the VOCAB, never the corpus.
    */
  def bpeTrain(df: DataFrame, idCol: String, textCol: String,
      nMerges: Int): DataFrame =
    bpeCore(df, textCol, nMerges)._1

  /** The APPLY side of BPE training: the trained dict's final
    * segmentation — every corpus word with its frequency and learned
    * token sequence after all `nMerges` merges (what a tokenizer's
    * vocab file encodes). Same loop as [[bpeTrain]]; training is
    * deterministic so the two rows describe the same model.
    */
  def bpeEncode(df: DataFrame, idCol: String, textCol: String,
      nMerges: Int): DataFrame =
    bpeCore(df, textCol, nMerges)._2
      .select(col("word"), col("wc"),
        size(col("syms")).cast("long").as("n_tokens"),
        concat_ws(" ", col("syms")).as("tokens"))

  private def bpeCore(df: DataFrame, textCol: String,
      nMerges: Int): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    var dict = df.select(explode(words(textCol)).as("word"))
      .filter(length(col("word")) > 1)
      .groupBy(col("word")).agg(count(lit(1)).as("wc"))
      .withColumn("syms", expr(
        "transform(sequence(1, length(word)), i -> substring(word, i, 1))"))
      .localCheckpoint()
    val w = Window.partitionBy(col("word")).orderBy(col("pos"))
    val steps = (1 to nMerges).map { step =>
      // both frames feed two consumers each (pair-count + merge; merge +
      // output row) — checkpoint so neither subtree replays
      val withNext = dict
        .select(col("word"), col("wc"),
          posexplode(col("syms")).as(Seq("pos", "sym")))
        .withColumn("nxt", lead(col("sym"), 1).over(w))
        .localCheckpoint()
      val top = withNext.filter(col("nxt").isNotNull)
        .groupBy(col("sym"), col("nxt"))
        .agg(sum(col("wc")).as("n_occurrences"))
        .orderBy(col("n_occurrences").desc, col("sym").asc, col("nxt").asc)
        .limit(1)
        .select(col("sym").as("a"), col("nxt").as("b"),
          col("n_occurrences"))
        .localCheckpoint()
      val marked = withNext.crossJoin(broadcast(top))
        .withColumn("cand", col("sym") === col("a") && col("nxt") === col("b"))
      // greedy left-to-right: group consecutive candidates, keep
      // alternates from each run head
      val applied = marked.filter(col("cand"))
        .withColumn("grp", col("pos") - row_number().over(w))
        .withColumn("head",
          min(col("pos")).over(Window.partitionBy(col("word"), col("grp"))))
        .filter((col("pos") - col("head")) % 2 === 0)
        .select(col("word"), col("pos"))
      val next = marked
        .join(applied.withColumn("app", lit(true)), Seq("word", "pos"),
          "left")
        .join(applied.select(col("word"), (col("pos") + 1).as("pos"))
          .withColumn("absorbed", lit(true)), Seq("word", "pos"), "left")
        .filter(col("absorbed").isNull)
        .withColumn("sym2", when(col("app"),
          concat(col("a"), col("b"))).otherwise(col("sym")))
        .groupBy(col("word"), col("wc"))
        .agg(expr(
          "transform(array_sort(collect_list(struct(pos, sym2))), x -> x.sym2)")
          .as("syms"))
      dict = next.localCheckpoint()
      top.select(lit(step.toLong).as("merge_rank"),
        col("a").as("left_sym"), col("b").as("right_sym"),
        concat(col("a"), col("b")).as("token"), col("n_occurrences"))
    }
    (steps.reduce(_ unionByName _), dict)
  }

  /** Cross-source duplication matrix: near-dup pair counts keyed by the
    * (unordered) source pair — the audit that tells a curation run WHICH
    * feeds duplicate each other (mirror crawls, syndicated content)
    * versus which only self-duplicate. Rides the banded MinHash pair
    * pipeline, so no all-pairs work; the pair list joins back to the
    * doc→source map on the high-cardinality id, and least/greatest
    * canonicalizes the matrix to its upper triangle.
    */
  def sourceOverlap(df: DataFrame, idCol: String, textCol: String,
      srcCol: String, threshold: Double): DataFrame = {
    val pairs = minhashNearDups(df, idCol, textCol, threshold = threshold)
    val src = df.select(col(idCol).as("__sid"), col(srcCol).as("__src"))
    pairs
      .join(src.select(col("__sid").as("id_a"), col("__src").as("sa")), Seq("id_a"))
      .join(src.select(col("__sid").as("id_b"), col("__src").as("sb")), Seq("id_b"))
      .select(least(col("sa"), col("sb")).as("source_a"),
        greatest(col("sa"), col("sb")).as("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** Per-source corpus profile: document counts, token totals and mean,
    * exact DISC percentiles of document length, and per-source distinct
    * vocabulary — the data-audit table a curation run publishes.
    *
    * Percentiles are EXACT and engine-portable: the element at 1-based
    * rank `(n−1)·p/10000 + 1` of the sorted lengths (disc, no
    * interpolation — interpolated quantiles differ between engines in the
    * last ulp because the interpolation formula's operation ORDER is not
    * standardized). Computed over the length HISTOGRAM, not a per-source
    * window over documents: sources are a low-cardinality key, so ranking
    * raw docs would put an entire source's corpus in one window partition
    * (a straggler at scale), while the histogram compresses to
    * |distinct lengths| rows per source before any window runs.
    */
  def corpusProfile(df: DataFrame, idCol: String, textCol: String,
      srcCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = df.select(col(srcCol).as("source"), words(textCol).as("ws"))
      .withColumn("n_tokens", size(col("ws")).cast("long"))
    val counts = tok.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"))
    val hist = tok.groupBy(col("source"), col("n_tokens"))
      .agg(count(lit(1)).as("c"))
    val wc = Window.partitionBy(col("source")).orderBy(col("n_tokens"))
    val cum = hist.withColumn("cum", sum(col("c")).over(wc))
      .join(counts.select(col("source"), col("n_docs")), Seq("source"))
    val pctCols = Seq(5000L -> "p50_tokens", 9000L -> "p90_tokens",
      9900L -> "p99_tokens").map { case (bp, name) =>
        min(when(col("cum") >= expr(s"(n_docs - 1) * $bp div 10000 + 1"),
          col("n_tokens"))).as(name)
      }
    val pcts = cum.groupBy(col("source")).agg(pctCols.head, pctCols.tail: _*)
    val vocab = tok.select(col("source"), explode(col("ws")).as("word"))
      .filter(length(col("word")) > 0).distinct()
      .groupBy(col("source")).agg(count(lit(1)).as("vocab_size"))
    counts.join(pcts, Seq("source")).join(vocab, Seq("source"))
      .withColumn("mean_tokens",
        col("total_tokens").cast("double") / col("n_docs"))
      .select(col("source"), col("n_docs"), col("total_tokens"),
        col("mean_tokens"), col("p50_tokens"), col("p90_tokens"),
        col("p99_tokens"), col("vocab_size"))
  }

  /** Per-document top-`topK` keyword terms by tf·(N/df) — the corpus-
    * statistics keyword extractor an analysis/reporting stage runs over
    * curated data. The score uses a RATIONAL idf (N/df) rather than the
    * classical log(N/df): within one document the ranking induced is the
    * tf-idf family's, and the arithmetic stays one exact integer product
    * (tf·N < 2⁵³) plus one IEEE-correctly-rounded division — bit-identical
    * in any engine, where log's last ulp is libm-dependent and would make
    * the top-k cut nondeterministic at ties. Tie-break (score desc, word
    * asc) pins the cut.
    *
    * Scale: tf is a partial-agg groupBy on (doc, word); df reuses the
    * census shape (distinct → count on the word key). The tf⋈df join is
    * on the word key — vocab-sized, broadcast when it fits, hash join
    * otherwise; the top-k window partitions on the high-cardinality doc
    * id. The corpus body text never shuffles — only (id, word) tokens.
    */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String,
      topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tokens = df.select(col(idCol).as("id"),
      explode(words(textCol)).as("word"))
      .filter(length(col("word")) > 0)
    val tf = tokens.groupBy(col("id"), col("word"))
      .agg(count(lit(1)).as("tf"))
    val dfq = tokens.select(col("id"), col("word")).distinct()
      .groupBy(col("word")).agg(count(lit(1)).as("df"))
    val n = df.agg(count(lit(1)).as("__n"))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("score").desc, col("word").asc)
    tf.join(dfq, Seq("word"))
      .crossJoin(broadcast(n))
      .withColumn("score",
        (col("tf") * col("__n")).cast("double") / col("df"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("id").as(idCol), col("rank"), col("word"),
        col("tf"), col("df"), col("score"))
  }

  /** GPT-style sequence packing: documents are concatenated in id order
    * WITHIN a pack group and chunked into fixed `budget`-token blocks
    * (documents may straddle block boundaries — the concat-and-chunk
    * scheme). Returns per doc: its group, token count, and the first/last
    * block it lands in.
    *
    * Scale: a single global concatenation order would force one window
    * partition; instead ids hash into `nGroups` independent streams —
    * each group is one window partition packing 1/nGroups of the corpus,
    * the per-worker sequential shape a real packing job runs. All
    * arithmetic is integer (token counts, cumulative sums, floor
    * division), so the layout is deterministic and oracle-exact.
    */
  /** Target docs per pack group when `seqPack` derives its group count:
    * bounds each window partition to ~this many rows regardless of
    * corpus size (a FIXED group count makes each group corpus/nGroups —
    * a straggler partition at 100 TB).
    *
    * Derived-group mode trades LAYOUT STABILITY for balance: the group
    * count (hence every doc's pack group and block span) is a function of
    * corpus size, so two corpus snapshots pack differently once the count
    * crosses a 500k boundary. A caller that needs a reproducible layout
    * across snapshots pins `nGroups` explicitly; any oracle/replica must
    * derive its modulus from this same formula, never hardcode one.
    */
  val PackGroupTargetDocs: Long = 500000L

  def seqPack(df: DataFrame, idCol: String, textCol: String,
      budget: Long, nGroups: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // nGroups <= 0 → derive from corpus size: max(32, ceil(n / target))
    // keeps per-group rows bounded as the corpus grows; the one count()
    // is a columnless scan, the standing cost of a size-aware layout
    val groups: Long =
      if (nGroups > 0) nGroups.toLong
      else {
        val n = df.count()
        math.max(32L, (n + PackGroupTargetDocs - 1L) / PackGroupTargetDocs)
      }
    val w = Window.partitionBy(col("pack_group")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("n_tokens", size(words(textCol)).cast("long"))
      // hash the id (h64c of its string form) rather than `id % n`: works
      // for non-numeric ids and can't go negative, and hash order spreads
      // adjacent source ids across groups
      .withColumn("pack_group", h64c(col(idCol).cast("string")) % groups)
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .select(col(idCol), col("pack_group"), col("n_tokens"),
        expr(s"(cum - n_tokens) div $budget").as("start_block"),
        expr(s"(cum - 1) div $budget").as("end_block"))
  }

  /** Two-level global row number: `offset(bucket) + in-bucket rank`,
    * where `bucketCol` must be MONOTONIC in the intended global order
    * (its leading column or a shift of it) so per-bucket ranks
    * concatenate to the global rank. Offsets come from one window over
    * the bucket-count frame (bucket-cardinality rows, not corpus rows);
    * in-bucket ranks partition on the bucket — the same decomposition
    * every cumulative cut here uses, applied to ranking.
    */
  private def bucketedRowNumber(df: DataFrame, bucketCol: Column,
      order: Seq[Column]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = df.withColumn("__b", bucketCol)
    val offsets = b.groupBy(col("__b"))
      .agg(count(lit(1)).as("__bc"))
      .withColumn("__off", coalesce(
        sum(col("__bc")).over(Window.orderBy(col("__b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__b"), col("__off"))
    val w = Window.partitionBy(col("__b")).orderBy(order: _*)
    b.join(offsets, Seq("__b"))
      .withColumn("__rn", col("__off") + row_number().over(w))
  }

  /** Padding-waste audit of fixed-count batch packing: batches of
    * `batchSize` docs are padded to their longest member, and the audit
    * prices two batch orders — NAIVE (arrival/id order: long and short
    * docs share batches, maximal padding) vs SORTED (length-then-id
    * order: near-equal lengths batch together — the standard
    * sorted-batching / bucketing trick). One row per strategy:
    * `waste = Σ_batches (rows·max_len − Σ len)`, `padded = waste + Σ len`,
    * `waste_frac = waste / padded` — the measured fraction of padding
    * FLOPs sorted batching recovers on this corpus.
    *
    * Scale: both global orders rank via [[bucketedRowNumber]] — naive
    * buckets on `id >> 10` (monotonic in id), sorted buckets on the
    * token length itself (the order's leading column; the bucket frame
    * is the length histogram, bounded) — so no task ever sorts or
    * ranks the whole corpus; the per-batch and per-strategy rollups are
    * plain aggregations.
    */
  def packEfficiency(df: DataFrame, idCol: String, textCol: String,
      batchSize: Int): DataFrame = {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    val base = df.select(col(idCol).cast("long").as("__id"),
      size(words(textCol)).cast("long").as("n_tokens"))
    def audit(strategy: String, ranked: DataFrame): DataFrame =
      ranked
        .withColumn("__batch", expr(s"(__rn - 1) div $batchSize"))
        .groupBy(col("__batch"))
        .agg(count(lit(1)).as("__rows"), max(col("n_tokens")).as("__mx"),
          sum(col("n_tokens")).as("__tok"))
        .agg(count(lit(1)).cast("long").as("n_batches"),
          sum(col("__tok")).cast("long").as("total_tokens"),
          sum(col("__rows") * col("__mx")).cast("long").as("padded_tokens"))
        .select(lit(strategy).as("strategy"), col("n_batches"),
          col("total_tokens"), col("padded_tokens"),
          (col("padded_tokens") - col("total_tokens")).as("waste"),
          when(col("padded_tokens") === 0, lit(0.0))
            .otherwise((col("padded_tokens") - col("total_tokens"))
              .cast("double") / col("padded_tokens")).as("waste_frac"))
    val naive = audit("naive",
      bucketedRowNumber(base, expr("__id div 1024"), Seq(col("__id"))))
    val sorted = audit("sorted",
      bucketedRowNumber(base, col("n_tokens"), Seq(col("__id"))))
    naive.unionByName(sorted)
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

  /** Newline-split lines of `text`. */
  def docLines: Column = split(col("text"), "\n")

  /** Adjacent word 2-grams of `ws` (empty below 2 words). */
  def wordBigrams: Column =
    expr(
      """CASE WHEN size(ws) < 2 THEN CAST(array() AS ARRAY<STRING>)
        |ELSE transform(sequence(1, size(ws) - 1),
        |  i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1))) END""".stripMargin)

  /** Gopher-style repetition and composition signals (Rae et al. 2021,
    * "Scaling Language Models: ... Gopher", appendix A1.1): duplicate-line
    * fraction, most-frequent-bigram fraction, symbol-to-word ratio,
    * bullet-line fraction, stopword fraction. Expects `ws` (words),
    * `lines` (docLines) and `g2` (wordBigrams) to be bound — callers add
    * them once with withColumn so each array is built a single time per
    * row instead of per signal.
    *
    * All signals are integer counts → one double division, so the DuckDB
    * oracle reproduces them bit-exactly. The per-row bigram mode is
    * O(distinct² ) in the doc's bigrams — bounded by document length, no
    * shuffle; at 100 TB this stays embarrassingly parallel.
    */
  def repetitionColumns: Seq[Column] = Seq(
    expr(
      """1.0 - CAST(size(array_distinct(lines)) AS DOUBLE) / size(lines)"""
    ).as("dup_line_frac"),
    expr(
      """CASE WHEN size(g2) = 0 THEN 0.0 ELSE
        |  CAST(array_max(transform(array_distinct(g2),
        |    g -> size(filter(g2, x -> x = g)))) AS DOUBLE) / size(g2) END""".stripMargin
    ).as("top_bigram_frac"),
    expr(
      s"""CAST(size(regexp_extract_all(text, '#', 0))
         |   + size(regexp_extract_all(text, '\\\\.\\\\.\\\\.', 0)) AS DOUBLE)
         | / size(ws)""".stripMargin
    ).as("symbol_word_ratio"),
    expr(
      """CAST(size(filter(lines, l -> startswith(l, '-') OR startswith(l, '*')))
        |  AS DOUBLE) / size(lines)""".stripMargin
    ).as("bullet_line_frac"),
    expr(
      s"""CAST(size(filter(ws, w -> array_contains(
         |  ${EN.map(w => s"'$w'").mkString("array(", ", ", ")")}, w))) AS DOUBLE)
         | / size(ws)""".stripMargin
    ).as("stopword_frac"))

  /** The Gopher keep decision over the signal columns (thresholds from the
    * published rules: 50–100k words, mean word length 3–10, symbol ratio
    * < 0.1, duplicate-line fraction < 0.3, ≥ 2 distinct stopwords).
    */
  def gopherKeep: Column =
    size(col("ws")).between(50, 100000) &&
      (length(regexp_replace(col("text"), " ", "")).cast("double") /
        size(col("ws"))).between(3.0, 10.0) &&
      col("symbol_word_ratio") < 0.1 &&
      col("dup_line_frac") < 0.3 &&
      expr(s"size(array_intersect(ws, ${EN.map(w => s"'$w'").mkString("array(", ", ", ")")}))") >= 2

  /** Unicode SCRIPT detection — the orthographic complement to the
    * stopword [[langIdColumns]] (which only separates languages sharing
    * the Latin script): per-document codepoint counts for the major
    * script blocks plus a deterministic dominant-script verdict. Counts
    * ride `regexp_extract_all` over explicit `\x{...}` ranges — syntax
    * Java regex and RE2 (the oracle engine) interpret identically —
    * and every count is an exact integer, so the verdict (greatest
    * count, fixed precedence tie-break) hash-compares across engines.
    * Entirely map-side: at 100 TB this is a free rider on any scan.
    */
  private val ScriptRanges: Seq[(String, String)] = Seq(
    "latin" -> "[A-Za-z\\x{00C0}-\\x{024F}]",
    "cyrillic" -> "[\\x{0400}-\\x{04FF}]",
    "cjk" -> "[\\x{3040}-\\x{30FF}\\x{4E00}-\\x{9FFF}]",
    "arabic" -> "[\\x{0600}-\\x{06FF}]",
    "greek" -> "[\\x{0370}-\\x{03FF}]")

  def scriptColumns(textCol: String): Seq[Column] =
    ScriptRanges.map { case (name, re) =>
      expr(s"size(regexp_extract_all($textCol, '${re.replace("\\", "\\\\")}', 0))")
        .cast("long").as(s"n_$name")
    }

  /** Dominant script: the greatest block count wins; ties resolve by the
    * fixed [[ScriptRanges]] precedence (latin first); all-zero → 'none'.
    */
  def dominantScript: Column = {
    val names = ScriptRanges.map(_._1)
    val maxC = greatest(names.map(n => col(s"n_$n")): _*)
    names.foldRight(lit("none")) { (n, rest) =>
      when(col(s"n_$n") === maxC && maxC > 0, lit(n)).otherwise(rest)
    }
  }

  /** PII patterns — restricted to syntax Java regex and RE2 (the oracle's
    * engine) interpret identically, so scrubbed text hash-compares.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  val PhoneRe = "\\+[0-9]{1,3}[- ][0-9]{3}[- ][0-9]{4}"

  /** Per-type PII match counts over `textCol`. */
  def piiCounts(textCol: String): Seq[Column] = Seq(
    expr(s"size(regexp_extract_all($textCol, '${EmailRe.replace("\\", "\\\\")}', 0))")
      .cast("long").as("n_emails"),
    expr(s"size(regexp_extract_all($textCol, '${Ipv4Re.replace("\\", "\\\\")}', 0))")
      .cast("long").as("n_ips"),
    expr(s"size(regexp_extract_all($textCol, '${PhoneRe.replace("\\", "\\\\")}', 0))")
      .cast("long").as("n_phones"))

  /** Redact PII in place — emails first (they contain dots/digits that
    * the other patterns could partially match), then phones, then IPs.
    */
  def scrubPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      Ipv4Re, "<IP>")

  /** Quality score in [0,1]: mean of three bounded signals — length band,
    * mean word length band, alpha-character ratio. Integer inputs → exact
    * double arithmetic, reproducible in the oracle. The alpha numerator
    * is the native [[graft.plans.AlphaSpaceCount]] byte loop —
    * value-identical to `length(regexp_replace(text, '[^a-zA-Z ]', ''))`
    * (the form every oracle replays) but without Java regex's ~2.5 µs
    * per-match cost, which made that ONE expression 25.5 s of a 26 s
    * scan on the digit-heavy 500k-doc lane (PLANS.md round 13).
    */
  def qualityScore: Column =
    (expr(
      """CASE WHEN length(text) BETWEEN 100 AND 5000 THEN 1.0
        |     WHEN length(text) > 5000 THEN 0.5 ELSE 0.2 END +
        |CASE WHEN CAST(length(replace(text, ' ', '')) AS DOUBLE) / size(ws)
        |          BETWEEN 3.0 AND 8.0 THEN 1.0 ELSE 0.4 END""".stripMargin) +
      graft.plans.AlphaSpaceCount.alphaSpaceCount(col("text")).cast("double")
        / length(col("text"))) / 3.0

  /** URL canonicalization (C4/RefinedWeb-style pre-dedup cleanup) over a
    * column NAME: lowercase the scheme+authority (path stays
    * case-sensitive), strip the fragment, strip tracking parameters
    * (`utm_*`, `ref`, `fbclid`, `gclid`), then normalize the separators
    * the removals leave behind. Pure chained codegen'd regexes in the
    * Java/RE2-common dialect, so the oracle replays byte-identically.
    * Two crawls of the same page differing only in case/fragment/
    * tracking noise canonicalize to one key — the URL-level dedup tier
    * that runs BEFORE any text is even fetched at 100 TB.
    */
  def canonicalUrlCol(urlCol: String): Column = {
    val pfx = s"regexp_extract($urlCol, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*', 0)"
    val lowered = s"concat(lower($pfx), substr($urlCol, length($pfx) + 1))"
    val noFrag = s"regexp_replace($lowered, '#.*$$', '')"
    // each tracking param is replaced by its LEADING separator ($1), so
    // '?utm_x=1&id=2' keeps its '?' — the separator-run cleanup below
    // collapses what consecutive removals leave behind
    val noTrack =
      s"regexp_replace($noFrag, '([?&])(utm_[a-z]+|ref|fbclid|gclid)=[^&#]*', '$$1')"
    val fixAmp = s"regexp_replace($noTrack, '&{2,}', '&')"
    val fixQ = s"regexp_replace(regexp_replace($fixAmp, '\\\\?&', '?'), '[?&]+$$', '')"
    expr(fixQ)
  }

  /** Common multi-label public suffixes (an embedded subset of the public
    * suffix list — PUBLIC data, publicsuffix.org): hosts ending in one of
    * these need the last THREE labels to name a registrable domain
    * (`foo.co.uk`, not `co.uk`). Without this every UK/AU/JP site would
    * collapse into one "domain" and [[perDomainCapAgg]] would over-cap them
    * as a single bucket. The full list is a data file a deployment mounts;
    * this subset covers the high-traffic ccTLD second levels.
    */
  val MultiLabelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "ltd.uk", "plc.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "co.jp", "or.jp", "ne.jp", "ac.jp", "go.jp", "ad.jp", "ed.jp", "lg.jp",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "geek.nz", "gen.nz",
    "com.br", "net.br", "org.br", "gov.br", "edu.br",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "com.mx", "org.mx", "net.mx", "gob.mx", "edu.mx",
    "co.in", "net.in", "org.in", "ac.in", "edu.in", "gov.in", "res.in",
    "co.za", "net.za", "org.za", "gov.za", "ac.za", "web.za",
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg",
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk",
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw",
    "co.kr", "ne.kr", "or.kr", "re.kr", "go.kr", "ac.kr",
    "com.ar", "net.ar", "org.ar", "edu.ar", "gob.ar",
    "com.tr", "net.tr", "org.tr", "edu.tr", "gov.tr",
    "co.il", "net.il", "org.il", "ac.il", "gov.il",
    "co.id", "net.id", "or.id", "ac.id", "go.id", "web.id",
    "com.my", "net.my", "org.my", "edu.my", "gov.my",
    "com.ph", "net.ph", "org.ph", "edu.ph", "gov.ph",
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn",
    "co.th", "or.th", "ac.th", "go.th", "in.th",
    "co.ke", "or.ke", "ne.ke", "go.ke", "ac.ke", "sc.ke",
    "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua",
    "com.eg", "com.sa", "com.pk", "com.bd", "com.ng")

  /** Registrable domain from a canonical URL: last two host labels, or
    * last THREE when the two-label tail is a known multi-label public
    * suffix ([[MultiLabelSuffixes]]) — `www.foo.co.uk` → `foo.co.uk`,
    * `www.example.com` → `example.com`. Both tiers are codegen'd
    * regex/IN-list expressions in the Java/RE2-common dialect, so the
    * oracle replays the decision byte-identically. A host that IS a bare
    * public suffix falls back to the two-label form (the three-label
    * extract misses and both engines return '').
    */
  def urlDomainCol(urlCol: String): Column = {
    val host = s"regexp_extract($urlCol, '^[a-z][a-z0-9+.-]*://([^/:?#]+)', 1)"
    val last2 = s"regexp_extract($host, '[^.]+\\\\.[^.]+$$', 0)"
    val last3 = s"regexp_extract($host, '[^.]+\\\\.[^.]+\\\\.[^.]+$$', 0)"
    val suffixes = MultiLabelSuffixes.map(s => s"'$s'").mkString(", ")
    expr(
      s"CASE WHEN $last2 IN ($suffixes) AND $last3 != '' THEN $last3 ELSE $last2 END")
  }

  /** Per-domain document cap: keep at most `cap` documents per domain,
    * ranked by the deterministic (h64(id), id) order, via the bounded
    * [[graft.plans.TopKPairs]] aggregate — each map task partial-
    * aggregates its slice of a domain to ≤ `cap` (h64(id), id) pairs, the
    * shuffle ships pairs (never documents) and no task ever sorts a hot
    * domain's row set. Rows beyond the cap carry a NULL `domain_rank`
    * (their exact rank is unknowable without the full sort — and unneeded:
    * the cut only asks "in the top `cap` or not"). A window
    * (`row_number` over partitionBy(domain)) would make the same
    * decision but sorts every hot domain's FULL row set in one task — a
    * 10⁹-doc mega-domain sorts 10⁹ rows to keep `cap`; the spec pins
    * both the keep-set/rank semantics (vs a straight-line replay) and
    * the no-Window plan shape.
    *
    * The kept frame is (#domains × cap) id-pairs; the join back to the
    * corpus rides the uniformly-hashed (domain, id) pair, so even the
    * join is skew-proof. At 100 TB this is the web-scale front gate shape:
    * a mega-domain's 10⁹ rows cost each map task a `cap`-bounded buffer
    * instead of one task a 10⁹-row sort.
    */
  def perDomainCapAgg(df: DataFrame, idCol: String, domainCol: String,
      cap: Int): DataFrame = {
    val kept = df
      .select(col(domainCol), col(idCol),
        h64c(col(idCol).cast("string")).as("__h"))
      .groupBy(col(domainCol))
      .agg(graft.plans.TopKPairs.topkPairs(col("__h"), col(idCol), cap)
        .as("__kept"))
      .select(col(domainCol), posexplode(col("__kept")))
      .select(col(domainCol), col("col.id").as(idCol),
        (col("pos") + 1).cast("long").as("domain_rank"))
    df.join(kept, Seq(domainCol, idCol), "left")
      .withColumn("kept", col("domain_rank").isNotNull)
  }

  /** EXACT set-similarity join via prefix filtering (Bayardo et al.
    * 2007, "Scaling up all pairs similarity search"): all document
    * pairs with shingle-set Jaccard ≥ tNum/tDen — deterministically ALL
    * of them, the exact complement to the probabilistic MinHash/LSH
    * path (which trades recall for fewer candidates).
    *
    * The pruning theorem: order every document's shingles by one global
    * total order (here (df, token) — rarest first) and take the prefix
    * of length s − ceil(t·s) + 1. Any pair with J ≥ t has overlap
    * ≥ ceil(t·max(sa,sb)), which forces at least one SHARED PREFIX
    * token — so the equi-join on prefix tokens generates every
    * qualifying pair, and the exact verification join never misses.
    *
    * Scale: the global order is NEVER materialized as dense ranks (no
    * global row_number) — each document sorts its own (df, token)
    * structs locally after a vocab-sized df join. Prefix tokens are by
    * construction the RAREST shingles, so the candidate equi-join keys
    * are small skew-free buckets — that is the entire point of rare-
    * first ordering at 100 TB. Size filter (t·sa ≤ sb ∧ t·sb ≤ sa) and
    * the final threshold test are exact integer rational arithmetic;
    * the reported jaccard is the single float division.
    *
    * Everything past the scan rides 60-bit shingle HASHES, never the
    * shingle strings (the minhashNearDups move): join keys are 8-byte
    * longs and the verify intersects are integer-array ops. Shingles
    * are built by POSITION EXPLODE + element_at on the carried ws
    * attribute, never a transform() lambda — CollapseProject inlines
    * the split() into every element of an interpreted lambda (O(len²)
    * per doc, the llm_ngram_lm lesson); and the token stream is
    * checkpointed before fanning out to its two consumers (df census +
    * per-doc array build), which otherwise re-execute the whole scan
    * branch each. Together: 21 s → ~6 s at sf0.1. Sets are distinct'd
    * AFTER hashing so a (cosmically unlikely) 60-bit collision changes
    * both engines' answers identically rather than diverging.
    */
  def prefixFilterNearDups(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, tNum: Long = 1L, tDen: Long = 2L): DataFrame = {
    val gram = (0 until k).map(j => s"element_at(ws, i + $j)")
      .mkString(", ' ', ")
    val toks = df.select(col(idCol).as("id"), words(textCol).as("ws"))
      .filter(size(col("ws")) >= k)
      .select(col("id"), col("ws"),
        explode(expr(s"sequence(1, size(ws) - ${k - 1})")).as("i"))
      .select(col("id"), expr(h64(s"concat($gram)")).as("tok"))
      .distinct()
      .localCheckpoint()
    val dfc = toks.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val docs = toks.join(dfc, Seq("tok"))
      .groupBy(col("id"))
      .agg(sort_array(collect_list(struct(col("df"), col("tok"))))
        .as("arr"))
      .withColumn("toks", expr("transform(arr, x -> x.tok)"))
      .withColumn("s", size(col("arr")).cast("long"))
      .withColumn("p",
        col("s") - expr(s"(s * $tNum + $tDen - 1) div $tDen") + lit(1L))
      .select(col("id"), col("toks"), col("s"), col("p"))
      // three consumers (both candidate sides + the verify joins)
      .localCheckpoint()
    val prefixes = docs.select(col("id"), col("s"),
      explode(expr("slice(toks, 1, CAST(p AS INT))")).as("tok"))
    val cands = prefixes
      .select(col("id").as("id_a"), col("s").as("sa"), col("tok"))
      .join(prefixes
        .select(col("id").as("id_b"), col("s").as("sb"), col("tok")),
        Seq("tok"))
      .filter(col("id_a") < col("id_b") &&
        col("sa") * tNum <= col("sb") * tDen &&
        col("sb") * tNum <= col("sa") * tDen)
      .select(col("id_a"), col("id_b")).distinct()
    cands
      .join(docs.select(col("id").as("id_a"), col("toks").as("ta"),
        col("s").as("sa")), Seq("id_a"))
      .join(docs.select(col("id").as("id_b"), col("toks").as("tb"),
        col("s").as("sb")), Seq("id_b"))
      .withColumn("inter",
        size(array_intersect(col("ta"), col("tb"))).cast("long"))
      .filter(col("inter") * tDen >=
        (col("sa") + col("sb") - col("inter")) * tNum)
      .select(col("id_a"), col("id_b"),
        (col("inter").cast("double") /
          (col("sa") + col("sb") - col("inter")).cast("double"))
          .as("jaccard"))
  }

  /** PMI collocation mining: top-`topK` adjacent word pairs by pointwise
    * mutual information — the "new york"/"machine learning" detector a
    * tokenizer-vocabulary or phrase-mining pass feeds on.
    *
    * Determinism: PMI's log never appears — the ranking uses the RAW
    * micro-quantized ratio `(c12 · N · 10^6) div (c1 · c2)` (N = total
    * words), a monotone transform of PMI, so the cut is exact integer
    * arithmetic in both engines (the tfidf rational-idf move). The
    * numerator rides DECIMAL(38,0) (DuckDB: HUGEINT), so c12·N·10^6 is
    * exact to 10^38 — no silent 64-bit wrap at any realistic corpus
    * size (a 100 TB corpus is ~10^13 words; N²·10^6 ≈ 10^32).
    *
    * Scale: bigrams via the position-explode idiom (whole-stage codegen,
    * never an interpreted transform lambda); pairs below `minCount`
    * prune BEFORE the unigram joins (the long tail is ~all distinct
    * pairs); unigram counts derive once and broadcast-join when small;
    * the final top-k is a TakeOrderedAndProject, never a global sort.
    */
  def pmiCollocations(df: DataFrame, idCol: String, textCol: String,
      minCount: Long, topK: Int): DataFrame = {
    val toks = df.select(col(idCol).as("id"), words(textCol).as("ws"))
      .select(col("id"), expr("filter(ws, w -> length(w) > 0)").as("ws"))
      .localCheckpoint()
    val uni = toks.select(explode(col("ws")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c1"))
    val n = toks.agg(sum(size(col("ws"))).as("__n"))
    val pairs = toks
      .select(col("ws"), explode(expr(
        """CASE WHEN size(ws) < 2 THEN CAST(array() AS ARRAY<INT>)
          |ELSE sequence(1, size(ws) - 1) END""".stripMargin)).as("i"))
      .select(expr("element_at(ws, i)").as("w1"),
        expr("element_at(ws, i + 1)").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= minCount)
    pairs
      .join(uni.select(col("w").as("w1"), col("c1").as("c1_left")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("c1").as("c1_right")), Seq("w2"))
      .crossJoin(broadcast(n))
      .withColumn("pmi_ratio_micro",
        // DECIMAL(38,0) product: exact where BIGINT would wrap past
        // c12·N·10^6 > 2^63; IntegralDivide on decimals returns BIGINT
        expr("""(CAST(c12 AS DECIMAL(38,0)) * __n * 1000000)
               | div (CAST(c1_left AS DECIMAL(38,0)) * c1_right)""".stripMargin))
      .select(col("w1"), col("w2"), col("c12"), col("c1_left"),
        col("c1_right"), col("pmi_ratio_micro"))
      .orderBy(col("pmi_ratio_micro").desc, col("w1"), col("w2"))
      .limit(topK)
  }

  /** Document-level co-occurrence mining (market-basket over docs —
    * the whole-document sibling of [[pmiCollocations]]'s adjacency
    * bigrams): token pairs appearing together in ≥ `minSup` documents,
    * ranked by micro-quantized lift `(n12 · N · 10^6) div (df1 · df2)`
    * (doc counts, presence not frequency; DECIMAL(38,0) numerator —
    * the PMI overflow treatment).
    *
    * Scale = the APRIORI prune: a pair cannot reach `minSup` unless
    * BOTH tokens do, so the frequent-token set (small — it is a
    * df-threshold vocabulary cut) broadcasts and filters BEFORE the
    * per-document pair join. The pair generation is a doc_id-keyed
    * self-join whose per-doc fan-out is bounded by frequent-tokens-
    * per-doc squared — the long tail of rare tokens (≈ all of a real
    * vocabulary) never reaches it. Final top-k is a
    * TakeOrderedAndProject, never a global sort.
    */
  def cooccurPairs(df: DataFrame, idCol: String, textCol: String,
      minDf: Long, minSup: Long, topK: Int): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
        explode(array_distinct(expr(
          s"filter(split(lower($textCol), ' '), w -> length(w) > 0)")))
          .as("w"))
      .localCheckpoint() // read by the census AND the pruned join
    val freq = toks.groupBy(col("w"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
    val ft = toks.join(broadcast(freq.select(col("w"))), Seq("w"))
    val pairs = ft.select(col("id"), col("w").as("w1"))
      .join(ft.select(col("id"), col("w").as("w2")), Seq("id"))
      .filter(col("w1") < col("w2"))
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("n12"))
      .filter(col("n12") >= minSup)
    val n = df.agg(count(lit(1)).as("__n"))
    pairs
      .join(broadcast(freq.select(col("w").as("w1"), col("df").as("df1"))),
        Seq("w1"))
      .join(broadcast(freq.select(col("w").as("w2"), col("df").as("df2"))),
        Seq("w2"))
      .crossJoin(broadcast(n))
      .withColumn("lift_micro",
        expr("""CAST((CAST(n12 AS DECIMAL(38,0)) * __n * 1000000)
               | div (CAST(df1 AS DECIMAL(38,0)) * df2) AS BIGINT)""".stripMargin))
      .select(col("w1"), col("w2"), col("n12"), col("df1"), col("df2"),
        col("lift_micro"))
      .orderBy(col("lift_micro").desc, col("w1"), col("w2"))
      .limit(topK)
  }

  /** k-anonymity audit over a generalization ladder of quasi-identifiers —
    * the privacy gate a curation pipeline runs before releasing per-record
    * metadata next to scrubbed text (quasi-identifier combinations that
    * isolate fewer than `k` records re-identify them even with PII gone).
    *
    * Ladder, finest first (each step generalizes one attribute, the
    * classic full-domain lattice walk):
    *  - L0 (lang, source, n_chars quot 100)
    *  - L1 (lang, source, n_chars quot 1000)   — coarser length bin
    *  - L2 (lang, n_chars quot 1000)           — source suppressed
    *  - L3 (lang)                              — length suppressed
    *  - L4: still under k at L3 → must be suppressed outright.
    * Each record's `anon_level` is the FIRST rung whose equivalence class
    * reaches `k`; the returned histogram (anon_level, n_docs) is the
    * disclosure-risk profile of the release.
    *
    * Scale shape: four partial-aggregated census frames (map-side combine
    * to distinct-combo cardinality, low by construction at the coarser
    * rungs) joined back WITHOUT pinned broadcast hints — L0's combo count
    * is data-derived (sources × bins), so AQE decides per run; the joins
    * are key-equi and spill-safe either way.
    */
  def kAnonLevels(docs: DataFrame, k: Int = 5): DataFrame = {
    val d = docs.select(col("doc_id"), col("lang"), col("source"),
      expr("n_chars div 100").as("bin100"),
      expr("n_chars div 1000").as("bin1000"))
    val l0 = d.groupBy(col("lang"), col("source"), col("bin100"))
      .agg(count(lit(1)).as("c0"))
    val l1 = d.groupBy(col("lang"), col("source"), col("bin1000"))
      .agg(count(lit(1)).as("c1"))
    val l2 = d.groupBy(col("lang"), col("bin1000"))
      .agg(count(lit(1)).as("c2"))
    val l3 = d.groupBy(col("lang")).agg(count(lit(1)).as("c3"))
    d.join(l0, Seq("lang", "source", "bin100"))
      .join(l1, Seq("lang", "source", "bin1000"))
      .join(l2, Seq("lang", "bin1000"))
      .join(l3, Seq("lang"))
      .withColumn("anon_level",
        when(col("c0") >= k, 0L).when(col("c1") >= k, 1L)
          .when(col("c2") >= k, 2L).when(col("c3") >= k, 3L)
          .otherwise(4L))
      .groupBy(col("anon_level"))
      .agg(count(lit(1)).as("n_docs"))
  }
}
