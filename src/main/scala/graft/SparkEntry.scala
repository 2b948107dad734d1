package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2, with a DuckDB-equivalent `oracleSql` where the operator is
  * SQL-expressible.
  *
  * Determinism rules (the driver hash-compares values after sorting columns
  * by name):
  *  - money aggregates are summed as DECIMAL(18,4) (exact, order-independent)
  *    then cast to double — identical on the DuckDB side;
  *  - every computed column is aliased identically in both dialects;
  *  - timestamps are cast to DATE (or formatted strings) before output;
  *  - top-k / "pick one" always carries a total tiebreak order.
  */
object SparkEntry {

  /** Exact order-independent sum for 2-decimal money values: per-row the
    * double product is within 1e-10 of a 4-decimal grid point, so the
    * decimal(18,4) cast is deterministic; decimal addition is exact.
    */
  private def dsum(c: Column): Column = sum(c.cast("decimal(18,4)")).cast("double")

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** The reference repo's own golden input fixtures (read-only) — the scan
    * queries parse them and the DuckDB oracle re-reads them independently
    * (read_csv/read_json) or asserts a frozen golden frame (XML/OWL, which
    * DuckDB can't parse).
    */
  private val REF_DATA = "/root/reference/test/data"

  /** The embeddings corpus in quantized (nid, vq, norm2) form — the input
    * every ANN row starts from.
    */
  /** The synthetic arithmetic-neighbour doc link graph shared by the
    * graph-analytics rows (PageRank / TrustRank / communities / seed
    * distance) — the ENGINE twin of the oracle-side `graphCtes`; any
    * edge-formula change must land in BOTH or every graph row fails its
    * oracle.
    */
  /** EXACT percentiles over the value DOMAIN histogram — the audit
    * companion of `Sketches.histQuantiles`: group values (per key),
    * cumulate mass over the distinct-value window (bounded by value
    * cardinality, never a row-global sort), and pick the first value
    * whose cumulative mass reaches `q`% of the key's total. `mass` is
    * the aggregate each value contributes — `count(lit(1))` for plain
    * percentiles, `sum(weightCol)` for weighted ones. One definition
    * shared by every quantile audit row so the pick algebra cannot
    * drift between them.
    */
  private def exactValueQuantiles(d: DataFrame, keyCols: Seq[String],
      vCol: String, mass: Column, qs: Seq[Int]): DataFrame = {
    val spark = d.sparkSession
    import spark.implicits._
    val keyed = if (keyCols.nonEmpty) d else d.withColumn("__g", lit(1))
    val keys = if (keyCols.nonEmpty) keyCols else Seq("__g")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*).orderBy(col(vCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val vh = keyed.groupBy((keys :+ vCol).map(col): _*).agg(mass.as("__c"))
    val cum = vh.withColumn("__cum", sum(col("__c")).over(w))
      .join(vh.groupBy(keys.map(col): _*).agg(sum(col("__c")).as("__n")),
        keys)
    qs.toDF("q").crossJoin(cum)
      .filter(col("__cum") * 100 >= col("q") * col("__n"))
      .groupBy((keys :+ "q").map(col): _*)
      .agg(min(col(vCol)).as("exact_v"))
      .drop("__g")
  }

  /** Run-scoped scratch directory for the store-backed rows: every
    * per-invocation store (g-rows, k-rows, sketch registry) roots its
    * parquet layers under ONE JVM-lifetime temp root that a shutdown
    * hook deletes recursively — repeated bench reps / spec runs no
    * longer leak layer files into /tmp across runs.
    */
  private lazy val scratchRoot: java.nio.file.Path = {
    val root = java.nio.file.Files.createTempDirectory("graft-scratch")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory)
          Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(): Unit
      }
      rm(root.toFile)
    }))
    root
  }

  private def scratchDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(scratchRoot, tag).toString

  private def docGraphEdges(docs: DataFrame): DataFrame = {
    val n = docs.agg(count(lit(1)).as("__n"))
    val base = docs.crossJoin(broadcast(n))
    base.select(col("doc_id").as("src"),
        expr("(doc_id * 7 + 3) % __n").as("dst"))
      .unionByName(base.select(col("doc_id").as("src"),
        expr("(doc_id * 13 + 5) % __n").as("dst")))
      .unionByName(base.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id").as("src"),
          expr("(doc_id * 3 + 1) % __n").as("dst")))
  }

  private def annCorpus(s: SparkSession, dir: String): DataFrame =
    llm.Ann.withQuantized(t(s, dir, "embeddings"), "embedding")
      .select(col("vec_id").as("nid"), col("vq"), col("norm2"))

  /** The `% 50 === 0` ANN query batch (qid, vq, norm2). */
  private def annQueries(s: SparkSession, dir: String): DataFrame =
    llm.Ann.withQuantized(t(s, dir, "embeddings"), "embedding")
      .filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), col("vq"), col("norm2"))

  /** On-disk location for the shared IVF-PQ index over `dir`'s embeddings
    * table, keyed by a fingerprint of the parquet bytes (total length +
    * max mtime): regenerated testdata gets a fresh key, so a stale index
    * can never serve a changed corpus. Override the base with
    * SPARK_GRAFT_INDEX_DIR (default `target/graft-index` under the
    * project, never outside the repo).
    */
  private def annIndexPath(dir: String, kind: String = "ivfpq_v1"): String = {
    def fp(f: java.io.File): (Long, Long) =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).map(fp)
          .foldLeft((0L, 0L)) { case ((l, m), (l2, m2)) =>
            (l + l2, math.max(m, m2))
          }
      else (f.length(), f.lastModified())
    val (len, mtime) = fp(new java.io.File(s"$dir/embeddings.parquet"))
    val key = Integer.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(s"$dir|$len|$mtime"))
    val base = sys.env.getOrElse("SPARK_GRAFT_INDEX_DIR", "target/graft-index")
    s"$base/${kind}_$key"
  }

  /** Build the shared IVF-PQ index (coarse k-means step=25/iters=2 +
    * 2-subspace PQ codebooks + codes) and persist it to parquet — the
    * ONE-TIME index build of the production lifecycle. Returns the path.
    */
  private def buildSharedAnnIndex(s: SparkSession, dir: String): String = {
    val path = annIndexPath(dir)
    llm.Ann.buildIvfPqIndex(annCorpus(s, dir), step = 25, iters = 2).save(path)
    java.nio.file.Files.write(java.nio.file.Paths.get(path, "_GRAFT_OK"),
      Array.emptyByteArray)
    path
  }

  /** Build-once/probe-many: load the shared IVF-PQ index, building it
    * first only if this corpus fingerprint has never been built (so the
    * probe rows never retrain the quantizer in-query — the cost moves to
    * the one `llm_ann_index_build` row, exactly like a standing index in
    * production). Training is deterministic, so the loaded index is
    * bit-identical to what in-query training would produce and every
    * oracle's training replay still matches.
    */
  private def sharedAnnIndex(s: SparkSession, dir: String): llm.Ann.IvfPqIndex = {
    val path = annIndexPath(dir)
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(path, "_GRAFT_OK")))
      buildSharedAnnIndex(s, dir)
    llm.Ann.IvfPqIndex.load(s, path)
  }

  /** The shared SQ8 index (trained bounds + 8-bit corpus codes), same
    * fingerprint-keyed build-once/load-many lifecycle as
    * [[sharedAnnIndex]] — the SQ rows probe the LOADED index instead of
    * retraining bounds and re-encoding the corpus per call. Deterministic
    * integer training keeps every oracle's inline replay valid.
    */
  private def sharedSqIndex(s: SparkSession, dir: String): llm.Ann.SqIndex = {
    val path = annIndexPath(dir, kind = "sq_v1")
    val ok = java.nio.file.Paths.get(path, "_GRAFT_OK")
    if (!java.nio.file.Files.exists(ok)) {
      llm.Ann.buildSqIndex(annCorpus(s, dir)).save(path)
      java.nio.file.Files.write(ok, Array.emptyByteArray)
    }
    llm.Ann.SqIndex.load(s, path)
  }

  /** Salted contamination fixture (llm_decontaminate; the report row
    * builds its own two-benchmark variant of the same shape inline):
    * eval split (`doc_id % 100 == 0`), 12-word snips keyed by ref, and a
    * leak into train docs whose `doc_id % 20` hits one of `leakMods`.
    */
  private def contaminationFixture(s: SparkSession, dir: String,
      leakMods: Seq[Int]): (DataFrame, DataFrame) = {
    val docs = t(s, dir, "documents")
    val evalSet = docs.filter(col("doc_id") % 100 === 0)
      .select(col("doc_id"), col("text").as("text2"))
    val snips = evalSet.select((col("doc_id") / 100).cast("long").as("ref"),
      expr("array_join(slice(split(lower(text2), ' '), 1, 12), ' ')").as("snip"))
    val leak = leakMods.map(m => col("doc_id") % 20 === m).reduce(_ || _)
    val train = docs.filter(col("doc_id") % 100 =!= 0)
      .withColumn("ref", col("doc_id") % 5)
      .join(broadcast(snips), Seq("ref"))
      .withColumn("text2",
        when(leak, concat(col("text"), lit(" "), col("snip")))
          .otherwise(col("text")))
    (train, evalSet)
  }

  /** Flagship query on sf=0.001 (driver smoke-checks rows>0): revenue by
    * region — scan→broadcast dim joins→agg, the shape of every loader's
    * resolve-then-aggregate pipeline (SURVEY §3.1).
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val li = t(spark, dir, "lineitem")
    val o = t(spark, dir, "orders")
    val c = t(spark, dir, "customer")
    val n = t(spark, dir, "nation")
    val r = t(spark, dir, "region")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  // ---------------------------------------------------------------- queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // A-family (SURVEY §2.5): hash aggregation with exact + money sums.
    "q1_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_rows"),
          countDistinct(col("l_orderkey")).as("n_orders"))
    }),

    // P1 (rename/remap projection): util.convertRowFields equivalent.
    "p1_rename_project" -> ((s, dir) => {
      t(s, dir, "part").select(
        col("p_partkey").as("part_id"),
        lower(trim(col("p_name"))).as("name"),
        col("p_retailprice").as("retail"))
    }),

    // P2/P3 (row filters on status fields): cancerhotspots/civic-style gates.
    "p2_filter_status" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R" && col("l_quantity") >= 30 &&
          !col("l_linestatus").isin("X"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_returnflag"))
    }),

    // P7 (maxRecords limit) with total order for determinism.
    "p7_limit_topn" -> ((s, dir) => {
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100)
        .select(col("o_orderkey"), col("o_totalprice"))
    }),

    // P8 (dedup by id, first-wins): deterministic via min-key per group.
    "p8_dedup_first" -> ((s, dir) => {
      val w = Window.partitionBy(col("lang"), col("source")).orderBy(col("doc_id").asc)
      t(s, dir, "documents")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("lang"), col("source"))
    }),

    // J11 (xref joins): fact→dim→dim chain, dims broadcast.
    "j11_xref_join" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_customers"), dsum(col("c_acctbal")).as("total_bal"))
    }),

    // J13 (existence/anti join): skip-already-loaded pattern.
    "j13_anti_join" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    }),

    // T1/T2 (preference top-1 per key): newest order per customer.
    "t1_top1_per_group" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"),
          col("o_orderdate").cast("date").as("latest_date"))
    }),

    // T2 (newest-created top-1 per key, civic/therapy.js:85-97: sort by
    // createdAt desc, return first) — distinct from t1's business-date
    // ordering: the key here is the record CREATION timestamp.
    "t2_newest_top1" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_ns").desc, col("event_id").desc)
      t(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        // epoch micros as LONG: integer div, exact on both engines
        .select(col("user_id"), col("event_id"),
          expr("ts_ns div 1000").as("created_us"))
    }),

    // S9 (plain-text list scan, one value per line — HGVS notation lists,
    // src/variants/index.js:30-44). The fixture is CRLF: Spark's
    // read.text splits on \n and keeps the \r, DuckDB's read_csv strips
    // it — normalize on this side.
    "s9_text_scan" -> ((s, dir) => {
      sources.Scans.textLines(s,
        s"$REF_DATA/UNII_Records_25Oct2018_sample.txt")
        .select(regexp_replace(col("line"), "\r$", "").as("line"))
    }),

    // §2.7 set ops: EXCEPT (deprecated-id set difference, civic GC pattern).
    "set_except" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
        .except(o.filter(col("o_orderstatus") === "P").select(col("o_custkey")))
    }),

    // F13 (date/year extraction) + A-family counters.
    "f13_year_extract" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).cast("long").as("order_year"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_price"))
    }),

    // A7 (consensus aggregation): single consensus value per key else null.
    "a7_consensus" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(
          when(countDistinct(col("o_orderpriority")) === 1, min(col("o_orderpriority")))
            .as("consensus_priority"),
          count(lit(1)).as("n_orders"))
    }),

    // A1 (stable hash ids): sha2 over canonical JSON of NAMED props — the
    // reference hashes stable-stringified named props (util.js:186-193).
    // Unlike concat_ws (which silently skips nulls, colliding (a,null,b)
    // with (a,b,null)), the JSON keeps the field name next to each null.
    // ignoreNullFields=false so the null fields serialize as `"k":null` on
    // both engines.
    "a1_hash_id" -> ((s, dir) => {
      t(s, dir, "orders").select(
        col("o_orderkey"),
        sha2(to_json(struct(
          col("o_orderkey"),
          when(col("o_orderstatus") === "P", lit(null).cast("string"))
            .otherwise(col("o_orderstatus")).as("status_n"),
          col("o_orderpriority")),
          Map("ignoreNullFields" -> "false").asJava), 256).as("hash_id"))
    }),

    // J1/J2 (preference-ranked unique resolution) via core.Resolver:
    // best customer per market segment, broadcast-join + window top-1.
    "j1_resolve_unique" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val lookups = c.select(col("c_mktsegment").as("segment")).distinct()
      val r = core.Resolver.resolveUnique(
        lookups, "segment", broadcast(c), "c_mktsegment",
        preference = Seq(col("c_acctbal").desc, col("c_custkey").asc))
      r.resolved.select(col("segment"), col("c_custkey").as("best_custkey"),
        col("c_acctbal").as("best_acctbal"))
    }),

    // K1/K2 (MERGE upsert classification with change detection + soft
    // delete) via core.GraphStore: target=even orderkeys, updates=multiples
    // of 3 with a +1.00 price perturbation on multiples of 5.
    "k1_upsert_classify" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val target = o.filter(col("o_orderkey") % 2 === 0).select(
        col("o_orderkey").as("id"), col("o_orderstatus").as("status"),
        col("o_totalprice").as("total"))
      val updates = o.filter(col("o_orderkey") % 3 === 0).select(
        col("o_orderkey").as("id"), col("o_orderstatus").as("status"),
        when(col("o_orderkey") % 5 === 0, col("o_totalprice") + 1.0)
          .otherwise(col("o_totalprice")).as("total"))
      core.GraphStore.classify(target, updates,
        keyCols = Seq("id"), compareCols = Seq("status", "total"),
        softDelete = true)
        .select(col("id"), col("total"), col(core.GraphStore.ACTION).as("action"))
    }),

    // K9 (audit counters): action → count over the same classification.
    "k2_change_counts" -> ((s, dir) => {
      queries("k1_upsert_classify")(s, dir)
        .groupBy(col("action")).agg(count(lit(1)).as("n"))
    }),

    // S1 (delimited scan with ## comments + header remap, util.js:69-84):
    // distributed text filter → csv parse, quoting disabled like the
    // reference. Oracle re-reads the same TSV with DuckDB read_csv.
    "s1_delim_scan" -> ((s, dir) => {
      sources.Scans.delim(s,
        s"$REF_DATA/ensembl_biomart_export_ENSG00000139618.tsv",
        headerMap = Map(
          "Gene stable ID" -> "gene_id", "Transcript stable ID" -> "transcript_id",
          "Protein stable ID" -> "protein_id", "HGNC ID" -> "hgnc_id",
          "Gene name" -> "gene_name"))
        .select("gene_id", "transcript_id", "protein_id", "hgnc_id", "gene_name")
    }),

    // S3 (XML DOM scan via the xml2js-equivalent JSON bridge, util.js:87-114).
    "s3_xml_dom" -> ((s, dir) => {
      sources.XmlScan.domDF(s, s"$REF_DATA/drugbank_sample.xml")
        .select(
          col("drugbank.drug.name").as("name"),
          col("drugbank.drug.`cas-number`").as("cas_number"),
          col("drugbank.drug.unii").as("unii"),
          col("drugbank.drug.state").as("state"),
          size(col("drugbank.drug.groups.group")).as("n_groups"))
    }),

    // S4 (streaming rowTag XML scan, drugbank/index.js:279-333): StAX
    // fragment split (bounded memory) + typed per-fragment extraction.
    "s4_xml_rowtag" -> ((s, dir) => {
      import s.implicits._
      sources.XmlScan.rowTagFragments(s, s"$REF_DATA/drugbank_sample.xml", "drug")
        .map { frag =>
          val x = scala.xml.XML.loadString(frag)
          val primaryId = (x \ "drugbank-id")
            .collectFirst { case e if (e \@ "primary") == "true" => e.text }
            .getOrElse("")
          (primaryId, (x \ "name").text, (x \ "cas-number").text,
            (x \ "unii").text, (x \ "state").text,
            (x \ "groups" \ "group").length)
        }
        .toDF("drugbank_id", "name", "cas_number", "unii", "state", "n_groups")
    }),

    // S5 (OWL/RDF scan → triples → group-by-subject, util.js:22-66 as used
    // by vario.js:45-55): single shuffle on subject; top-10 codes frozen as
    // the golden oracle (447 classes total — asserted in OwlScanSpec).
    "s5_owl_group" -> ((s, dir) => {
      val LABEL = "http://www.w3.org/2000/01/rdf-schema#label"
      val SUB = "http://www.w3.org/2000/01/rdf-schema#subClassOf"
      val tr = sources.OwlScan.triples(s, s"$REF_DATA/vario_v2018-04-27.owl")
      tr.filter(col("predicate").isin(LABEL, SUB))
        .groupBy(col("subject"))
        .agg(
          min(when(col("predicate") === LABEL, col("obj"))).as("name"),
          sum(when(col("predicate") === SUB && col("obj").rlike("VariO_\\d+$"), 1)
            .otherwise(0)).cast("long").as("n_subclass"))
        .withColumn("source_id",
          lower(regexp_replace(
            regexp_extract(col("subject"), ".*/(VariO_\\d+)$", 1), "_", ":")))
        .filter(col("source_id") =!= "" && col("name").isNotNull)
        .select(col("source_id"), col("name"), col("n_subclass"))
        .orderBy(col("source_id"))
        .limit(10)
    }),

    // S6 (OBO-graph JSON scan, diseaseOntology/index.js:157-166 + the
    // doid:<id> parser at :22-29). Oracle re-reads with read_json_auto.
    "s6_obograph_nodes" -> ((s, dir) => {
      sources.Scans.json(s, s"$REF_DATA/doid.sample.json")
        .select(explode(col("graphs")(0)("nodes")).as("n"))
        .select(
          lower(regexp_replace(
            regexp_extract(col("n.id"), ".*/([A-Za-z]+_[0-9]+)$", 1), "_", ":"))
            .as("source_id"),
          col("n.lbl").as("name"),
          when(col("n.meta.synonyms").isNull, lit(0L))
            .otherwise(size(col("n.meta.synonyms")).cast("long")).as("n_alias"),
          coalesce(
            exists(col("n.meta.basicPropertyValues"),
              x => x("pred").endsWith("deprecated") && x("val") === "true"),
            lit(false)).as("deprecated"))
    }),

    // S8 (generic JSON scan, ontology/index.js:253-258 shape) on the ChEMBL
    // molecule dump fixture (chembl/index.js:63-71 fields).
    "s8_json_scan" -> ((s, dir) => {
      sources.Scans.json(s, s"$REF_DATA/chembl.CHEMBL553.json")
        .select(
          col("molecule_chembl_id").as("chembl_id"),
          col("pref_name").as("name"),
          col("max_phase").cast("long").as("max_phase"),
          col("molecule_properties.full_molformula").as("molformula"))
    }),

    // S16 (disk API proxy, oncokb/index.js:796-812): saved REST response
    // read as the API's stand-in; phase list folded like F12.
    "s16_api_proxy" -> ((s, dir) => {
      sources.Scans.json(s, s"$REF_DATA/clinicaltrialsgov.NCT03478891.json")
        .select(
          col("protocolSection.identificationModule.nctId").as("nct_id"),
          col("protocolSection.statusModule.overallStatus").as("status"),
          concat_ws("/", col("protocolSection.designModule.phases")).as("phase"),
          col("protocolSection.identificationModule.organization.fullName")
            .as("org"))
    }),

    // S2 (streaming scan → watermarked windowed agg, run to completion
    // with Trigger.AvailableNow): the events parquet is consumed as a
    // STREAM, aggregated per (hour window, event_type), and the finished
    // memory-sink table is the query result. Exact columns only (count,
    // min, max) — float sums are order-dependent across micro-batches.
    "s2_stream_agg" -> ((s, dir) => {
      // Tables.eventsStream normalizes the on-disk ts encoding (legacy
      // INT64 nanos vs native TIMESTAMP micros) behind one schema
      val stream = Tables.eventsStream(s, dir)
        .withWatermark("ts", "2 hours")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), min(col("value")).as("min_value"),
          max(col("value")).as("max_value"))
        .select(col("window.start").as("window_start"), col("event_type"),
          col("n_events"), col("min_value"), col("max_value"))
      val q = stream.writeStream.format("memory").queryName("s2_stream_agg_out")
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      s.table("s2_stream_agg_out")
    }),

    // Streaming session windows (the streaming twin of llm_sessionize):
    // Spark's native session_window gap-merge aggregation under
    // availableNow; oracle replays the [ts, ts+gap) overlap-merge
    // semantics (same session iff delta < gap) with integer-us lag math.
    "s2c_stream_sessions" -> ((s, dir) => {
      val stream = Tables.eventsStream(s, dir)
        .withWatermark("ts", "2 hours")
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("session_window.start").as("session_start"),
          col("session_window.end").as("session_end"),
          col("user_id"), col("n_events"))
      val q = stream.writeStream.format("memory")
        .queryName("s2c_stream_sessions_out")
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      s.table("s2c_stream_sessions_out")
    }),

    // G1 — the end-to-end loader slice as one query: OBO-graph fixture →
    // normalize → MERGE into a fresh persistent store, TWICE (the second
    // pass must be all-noop), then the stored vertex table read back off
    // disk is the result. The oracle re-derives the same vertices straight
    // from the JSON — so a broken merge, a non-idempotent rerun, or a bad
    // store round-trip all fail the row.
    "g1_loader_pipeline" -> ((s, dir) => {
      val store = new core.PersistentGraphStore(s,
        scratchDir("g1"))
      val path = s"$REF_DATA/doid.sample.json"
      sources.Loaders.loadDoid(s, store, path)
      sources.Loaders.loadDoid(s, store, path) // idempotency pass
      store.read("vertices").get
        .select(col("sourceId").as("source_id"), col("name"),
          col("deprecated"), col("nAlias").as("n_alias"))
    }),

    // G2 — the CIViC statement-sync capstone (SURVEY §3.2,
    // civic/index.js:67-500) in one query: evidence items → therapy
    // grouping by interaction type (X3, therapy.js:19-50) → molecular-
    // profile DNF (X1, profile.js) → conditions × therapy-groups cartesian
    // (X2, evidenceItem.js:237-264) → relevance translation (F6) with the
    // unsupported-combination error side-channel → content diff against the
    // existing statements (J12, statement.js:56-178) → create/match/delete
    // buckets.
    "g2_civic_sync" -> ((s, dir) => {
      import s.implicits._
      val names = Map(1L -> "V600E", 2L -> "T790M", 3L -> "AMP", 5L -> "Q157P/R")
      // (id, profileExpr, therapies, interactionType, eType, direction, significance)
      val evidence = Seq(
        (1L, "1 AND 2", Seq("trametinib", "dabrafenib"), "COMBINATION",
          "PREDICTIVE", "SUPPORTS", "SENSITIVITYRESPONSE"),
        (2L, "1 OR 3", Seq("erlotinib", "gefitinib"), "SUBSTITUTES",
          "PREDICTIVE", "SUPPORTS", "RESISTANCE"),
        (3L, "5", Seq.empty[String], null,
          "PROGNOSTIC", "SUPPORTS", "BETTER_OUTCOME"),
        (4L, "1", Seq.empty[String], null,
          "DIAGNOSTIC", "SUPPORTS", "NA"))
      val rows = evidence.flatMap { case (id, expr, therapies, interaction, et, dir0, sig) =>
        functions.Relevance.translate(dir0, et, sig) match {
          case None => Seq((id, s"$id|$et|$sig", "error"))
          case Some(relevance) =>
            val groups: Seq[Seq[String]] =
              if (therapies.isEmpty) Seq(Seq.empty)
              else if (therapies.length == 1 || interaction == "SUBSTITUTES")
                therapies.map(Seq(_))
              else Seq(therapies)
            val conditions = variant.ProfileDnf.expand(expr, names)
            for (cond <- conditions; g <- groups) yield {
              val content = cond.map(_.name).sorted.mkString("+") + "|" +
                g.sorted.mkString("+") + "|" + relevance
              (id, content, "statement")
            }
        }
      }
      val incoming = rows.zipWithIndex
        .map { case ((ev, content, kind), i) => (i.toLong, ev, content, kind) }
        .toDF("sid", "ev_id", "content", "kind")
      val statements = incoming.filter(col("kind") === "statement")
      val errors = incoming.filter(col("kind") === "error")
        .select(col("content"), lit("error").as("bucket"))
      // existing statements carry their CIViC sourceId (src_ev). The GC
      // pass (civic/index.js:426-470) runs BEFORE content matching:
      // statements whose sourceId vanished from CIViC never enter the
      // diff — they are soft-deleted wholesale ('gc' bucket).
      val existing = Seq(
        (100L, 2L, "V600E|erlotinib|resistance"),
        (101L, 2L, "AMP|erlotinib|resistance"),
        (102L, 9L, "OLD|old|resistance")).toDF("eid", "src_ev", "content")
      val liveEvIds = evidence.map(_._1)
      val gc = existing.filter(!col("src_ev").isInCollection(liveEvIds))
        .select(col("content"), lit("gc").as("bucket"))
      val existingLive = existing.filter(col("src_ev").isInCollection(liveEvIds))
      val diff = core.DiffMerge.contentMatch(
        statements, "sid", existingLive, "eid", tiers = Seq(Seq("content")))
      val withContent = diff
        .join(statements.select(col("sid").as("incoming_id"), col("content").as("ic")),
          Seq("incoming_id"), "left")
        .join(existingLive.select(col("eid").as("existing_id"), col("content").as("ec")),
          Seq("existing_id"), "left")
        .select(coalesce(col("ic"), col("ec")).as("content"),
          when(col("bucket") === "match", lit("match"))
            .otherwise(col("bucket")).as("bucket"))
      withContent.unionByName(errors).unionByName(gc)
    }),

    // G3 — the composed NCIt pipeline (ncit/index.js:199-460): flat-file
    // scan → parent-concept derivation → row normalization → deprecation
    // skip → name-collision resolution (species dups rejected, duplicate
    // groups renamed to their preferred synonym) → primary+alias vertices
    // + aliasof/SubClassOf edges → store round-trip. The fixture is built
    // inline (the reference ships no NCIt flat file) and exercises every
    // branch; the oracle is the hand-derived frozen frame.
    "g3_ncit" -> ((s, dir) => {
      val rows = Seq(
        // id, xmlTag, parents, synonyms, definition, name, status, semanticType, subset
        Seq("C1001", "<http://n/C1001>", "", "Skin Cancer Dark|Melanoma", "a skin cancer", "Melanoma", "", "Neoplastic Process", ""),
        Seq("C1002", "<http://n/C1002>", "C1001", "", "a glioma", "Glioma", "", "Neoplastic Process", ""),
        Seq("C1003", "<http://n/C1003>", "C61063", "", "", "Old Thing", "", "Neoplastic Process", ""),
        Seq("C1004", "<http://n/C1004>", "", "", "", "Gone", "Obsolete_Concept", "Neoplastic Process", ""),
        Seq("C1005", "<http://n/C1005>", "", "Aloe", "a plant", "Aloe Vera", "", "Plant", ""),
        Seq("C1006", "<http://n/C1006>", "C1005", "", "a cream", "Aloe Cream", "", "Unknown Thing", ""),
        Seq("C1007", "<http://n/C1007>", "", "", "", "Mystery", "", "Weird Category", ""),
        Seq("C1008", "<http://n/C1008>", "", "Mtum", "", "Mouse Tumor", "", "Neoplastic Process", ""),
        Seq("C1009", "<http://n/C1009>", "", "Mtm2", "", "Mouse Tumor", "", "Neoplastic Process", ""),
        Seq("C1010", "<http://n/C1010>", "", "EGFR Receptor Variant|ov1", "", "Egfr Overexpression", "", "Neoplastic Process", ""),
        Seq("C1011", "<http://n/C1011>", "", "EGFR Kinase Variant|ov2", "", "Egfr Overexpression", "", "Neoplastic Process", ""))
      val f = java.io.File.createTempFile("graft-g3", ".txt")
      java.nio.file.Files.writeString(f.toPath,
        rows.map(_.mkString("\t")).mkString("\n"))
      val store = new core.PersistentGraphStore(s,
        scratchDir("g3"))
      sources.NcitLoad.load(s, store, f.getPath)
      sources.NcitLoad.load(s, store, f.getPath) // idempotency pass
      val terms = store.read("terms").get
      val outCounts = store.read("edges").get
        .groupBy(col("out")).agg(count(lit(1)).as("n_out"))
      terms
        .join(outCounts,
          concat_ws("|", col("sourceId"), col("name")) === col("out"), "left")
        .select(col("sourceId").as("source_id"), col("name"),
          col("displayName").as("display_name"), col("endpoint"), col("alias"),
          coalesce(col("n_out"), lit(0L)).cast("long").as("n_out"))
    }),

    // G4 — oncotree tumorTypes load (oncotree/index.js:72-260) against the
    // real reference fixture: 853 diseases → store (twice — idempotency),
    // SubClassOf from the parent code, CrossReferenceOf from the NCI
    // external references; the oracle recomputes everything independently
    // with DuckDB's JSON reader.
    "g4_oncotree" -> ((s, dir) => {
      val path = s"$REF_DATA/tumorTypes-oncotree_latest_stable.json"
      val store = new core.PersistentGraphStore(s,
        scratchDir("g4"))
      sources.Loaders.loadOncotree(s, store, path)
      sources.Loaders.loadOncotree(s, store, path) // idempotency pass
      val edges = store.read("edges").get
      def outCount(cls: String, as: String) = edges
        .filter(col("edgeClass") === cls)
        .groupBy(col("out").as("sourceId")).agg(count(lit(1)).as(as))
      store.read("diseases").get
        .join(outCount("SubClassOf", "n_sub"), Seq("sourceId"), "left")
        .join(outCount("CrossReferenceOf", "n_xref"), Seq("sourceId"), "left")
        .select(col("sourceId").as("source_id"), col("name"),
          col("displayName").as("display_name"), col("subset"),
          coalesce(col("n_sub"), lit(0L)).cast("long").as("n_sub"),
          coalesce(col("n_xref"), lit(0L)).cast("long").as("n_xref"))
    }),

    // G5 — ensembl biomart TSV load (ensembl/index.js:179-470) against the
    // real reference fixture: versioned + generalized features for
    // gene/transcript/protein, generalizationof/elementof/crossreferenceof
    // edges, all through the store; the oracle recomputes the same sets
    // straight from the TSV.
    "g5_ensembl" -> ((s, dir) => {
      val path = s"$REF_DATA/ensembl_biomart_export_ENSG00000139618.tsv"
      val store = new core.PersistentGraphStore(s,
        scratchDir("g5"))
      sources.Loaders.loadEnsembl(s, store, path)
      sources.Loaders.loadEnsembl(s, store, path) // idempotency pass
      val feats = store.read("features").get
        .select(concat(lit("feature:"), col("biotype")).as("kind"),
          col("sourceId").as("a"), coalesce(col("sourceIdVersion"), lit("")).as("b"))
      val edges = store.read("edges").get
        .select(col("edgeClass").as("kind"), col("out").as("a"), col("in").as("b"))
      feats.unionByName(edges)
    }),

    // G6 — HGNC gene load (hgnc/index.js:50-180) from the recorded fetch
    // response fixture: primary + deprecated prev_symbol + alias_symbol
    // features sharing the primary sourceId, deprecatedby/aliasof edges
    // into the primary, ensembl + entrez crossreferences; oracle re-reads
    // the same JSON with DuckDB.
    "g6_hgnc" -> ((s, dir) => {
      val docs = sources.Loaders.hgncDocs(s,
        s"$REF_DATA/external_api_responses.json",
        "http://rest.genenames.org/fetch/hgnc_id/1101")
      val store = new core.PersistentGraphStore(s,
        scratchDir("g6"))
      sources.Loaders.loadHgnc(s, store, docs)
      sources.Loaders.loadHgnc(s, store, docs) // idempotency pass
      val outCounts = store.read("edges").get
        .groupBy(col("out").as("name")).agg(count(lit(1)).as("n_out"))
      store.read("genes").get
        .join(outCounts, Seq("name"), "left")
        .select(col("sourceId").as("source_id"), col("name"),
          col("displayName").as("display_name"), col("deprecated"),
          col("dependent"),
          coalesce(col("n_out"), lit(0L)).cast("long").as("n_out"))
    }),

    // G7 — fdaSrs UNII load (fdaSrs/index.js:10-110) against the real
    // reference fixture: therapy vertices keyed by UNII, NCIt
    // CrossReferenceOf edges resolved against a preloaded NCIt dimension.
    // The dim deliberately omits the smallest NCIT code in the file so the
    // reference's lookup-miss path (edge skipped, drug still created) is
    // exercised; the oracle re-derives the same exclusion in DuckDB.
    "g7_fdasrs" -> ((s, dir) => {
      val path = s"$REF_DATA/UNII_Records_25Oct2018_sample.txt"
      val store = new core.PersistentGraphStore(s,
        scratchDir("g7"))
      val withNcit = sources.FdaSrs.rows(s, path).filter(col("ncit").isNotNull)
      val minNcit = withNcit.agg(min(col("ncit"))).first.getString(0)
      val ncitDim = withNcit.filter(col("ncit") =!= minNcit)
        .select(col("ncit").as("sourceId"))
      sources.FdaSrs.load(s, store, path, ncitDim)
      sources.FdaSrs.load(s, store, path, ncitDim) // idempotency pass
      val outCounts = store.read("edges").get
        .groupBy(col("out").as("sourceId")).agg(count(lit(1)).as("n_out"))
      store.read("therapies").get
        .join(outCounts, Seq("sourceId"), "left")
        .select(col("sourceId").as("source_id"), col("name"),
          coalesce(col("n_out"), lit(0L)).cast("long").as("n_out"))
    }),

    // G8 — VariO OWL load (vario.js:45-105) against the real reference
    // fixture: 447 labeled classes → vocabulary vertices, 443 subclassof
    // edges (both endpoints labeled); the oracle re-parses the raw RDF/XML
    // in DuckDB with regex extraction over read_text.
    "g8_vario" -> ((s, dir) => {
      val path = s"$REF_DATA/vario_v2018-04-27.owl"
      val store = new core.PersistentGraphStore(s,
        scratchDir("g8"))
      sources.Vario.load(s, store, path)
      sources.Vario.load(s, store, path) // idempotency pass
      val outCounts = store.read("edges").get
        .groupBy(col("out").as("sourceId")).agg(count(lit(1)).as("n_sub"))
      store.read("vocabulary").get
        .join(outCounts, Seq("sourceId"), "left")
        .select(col("sourceId").as("source_id"), col("name"),
          col("description").isNotNull.as("has_desc"),
          coalesce(col("n_sub"), lit(0L)).cast("long").as("n_sub"))
    }),

    // G9 — clinicaltrialsgov load (clinicaltrialsgov/index.js:29-244) on
    // the NCT03478891 fixture: title fallback, status normalization, F12
    // phase fold, A7 location consensus, drug/disease resolution with the
    // Missing comment; the therapy dim resolves the trial's biological,
    // the empty-ish disease dim misses its condition.
    "g9_ctg" -> ((s, dir) => {
      import s.implicits._
      val path = s"$REF_DATA/clinicaltrialsgov.NCT03478891.json"
      val store = new core.PersistentGraphStore(s,
        scratchDir("g9"))
      val therapyDim = Seq("VRC-EBOMAB092-00-AB (MAb114)", "erlotinib").toDF("name")
      val diseaseDim = Seq("melanoma").toDF("name")
      sources.ClinicalTrials.load(s, store, path, therapyDim, diseaseDim)
      sources.ClinicalTrials.load(s, store, path, therapyDim, diseaseDim) // idempotency
      val links = store.read("edges").get
        .groupBy(col("in").as("sourceId")).agg(count(lit(1)).as("n_links"))
      store.read("trials").get
        .join(links, Seq("sourceId"), "left")
        .select(col("sourceId").as("source_id"), col("name"),
          col("recruitmentStatus").as("status"), col("phase"),
          col("startDate").as("start_date"),
          col("completionDate").as("completion_date"),
          col("sourceIdVersion").as("source_id_version"),
          col("country"), col("city"), col("comment"),
          coalesce(col("n_links"), lit(0L)).cast("long").as("n_links"))
    }),

    // G10 — RefSeq LRG tab load (refseq/index.js:23-155) with the entrez
    // gene dimension hydrated from the recorded esummary fixture
    // (J9 + S15): versioned+generalized transcript/protein features,
    // generalizationof/elementof edges, gene elementof gated on the
    // hydrated dim; oracle recomputes everything from the raw tab + JSON.
    "g10_refseq" -> ((s, dir) => {
      val path = s"$REF_DATA/LRG_RefSeqGene_d1541209245_kras.tab"
      val store = new core.PersistentGraphStore(s,
        scratchDir("g10"))
      val fetcher = sources.Entrez.fileFetcher(
        Map("3845" -> s"$REF_DATA/entrez_gene.3845.json"))
      sources.Entrez.hydrate(s, store, "genes", Seq("3845"), fetcher,
        sources.Entrez.parseGene(_), Seq("sourceId"),
        Seq("biotype", "name", "displayName", "longName", "description", "url"))
      val geneDim = store.read("genes").get
      sources.RefseqTab.load(s, store, path, geneDim)
      sources.RefseqTab.load(s, store, path, geneDim) // idempotency pass
      val feats = store.read("features").get
        .select(concat(lit("feature:"), col("biotype")).as("kind"),
          col("sourceId").as("a"), coalesce(col("sourceIdVersion"), lit("")).as("b"))
      val genes = store.read("genes").get
        .select(lit("feature:gene").as("kind"), col("sourceId").as("a"),
          col("name").as("b"))
      val edges = store.read("edges").get
        .select(col("edgeClass").as("kind"), col("out").as("a"), col("in").as("b"))
      feats.unionByName(genes).unionByName(edges)
    }),

    // G11 — ChEMBL molecule load (chembl/index.js:30-107) on the CHEMBL553
    // fixture: pref_name/formula fallback, `name [CHEMBLID]` display name,
    // the USAN-stem parent therapy and its SubClassOf edge; oracle
    // re-reads the JSON with DuckDB.
    "g11_chembl" -> ((s, dir) => {
      val path = s"$REF_DATA/chembl.CHEMBL553.json"
      val store = new core.PersistentGraphStore(s,
        scratchDir("g11"))
      sources.Chembl.load(s, store, path)
      sources.Chembl.load(s, store, path) // idempotency pass
      val outCounts = store.read("edges").get
        .groupBy(col("out").as("sourceId")).agg(count(lit(1)).as("n_out"))
      store.read("therapies").get
        .join(outCounts, Seq("sourceId"), "left")
        .select(col("sourceId").as("source_id"), col("name"),
          col("displayName").as("display_name"),
          col("molecularFormula").as("molecular_formula"),
          coalesce(col("n_out"), lit(0L)).cast("long").as("n_out"))
    }),

    // G30 — CGL variant loader (cgl/index.js:33-295): versioned refseq
    // cds reference, p.(X) strip + *→Ter-unless-fs, VCF→HGVS genomic
    // routing incl. the reference's empty-insertion quirk and first-base
    // check, per-form isolation, Infers, pathogenic statements on the
    // most specific form.
    "g30_cgl" -> ((s, dir) => {
      import s.implicits._
      import sources.Cgl.CglRecord
      val store = new core.PersistentGraphStore(s,
        scratchDir("g30"))
      val records = Seq(
        CglRecord("x1", "NM_005228.5", "c.2573T>G", "EGFR", "p.(L858R)",
          "7", "55259515", "T", "G"),
        CglRecord("x2", "", "", "TP53", "p.R306*", "", "", "", ""),
        CglRecord("x3", "NM_000546.5", "c.1000del", "TP53", "p.G12fs*3",
          "17", "", "", ""),
        CglRecord("x4", "", "", "KRAS", "", "12", "100_102", "TACG", "T"),
        CglRecord("x5", "", "", "BRAF", "", "7", "200", "T", "TAA"),
        CglRecord("x6", "", "", "X1", "", "7", "300", "A", "TG"))
      val transcripts = Seq(("NM_005228", "5"), ("NM_000546", "5"))
        .toDF("sourceId", "sourceIdVersion")
      val genes = Seq(("EGFR", "1956"), ("TP53", "7157"), ("KRAS", "3845"),
        ("BRAF", "673")).toDF("name", "sourceId")
      val chroms = Seq(("7", "chr7"), ("12", "chr12"), ("17", "chr17"))
        .toDF("sourceId", "name")
      val vocab = Seq(("substitution", "t:sub"), ("deletion", "t:del"),
        ("insertion", "t:ins"), ("indel", "t:indel"),
        ("frameshift", "t:fs")).toDF("name", "term_id")
      val run = () => sources.Cgl.load(s, store, records, transcripts,
        genes, chroms, vocab, "d:cancer")
      val c1 = run()
      run() // idempotency pass
      val vars = store.read("variants").get
        .select(concat(lit("variant:"), col("form")).as("kind"),
          col("vid").as("a"), col("term").as("b"),
          concat(coalesce(col("break1"), lit("-")), lit("|"),
            coalesce(col("assembly"), lit("-"))).as("c"))
      val edges = store.read("edges").get
        .select(lit("infers").as("kind"), col("out").as("a"),
          col("in").as("b"), lit("").as("c"))
      val stmts = store.read("statements").get
        .select(lit("statement").as("kind"), col("sourceId").as("a"),
          concat(col("relevance"), lit("|"), col("subject")).as("b"),
          array_join(col("conditions"), ",").as("c"))
      val counts = Seq(("count:error", c1("error").toString, "", ""))
        .toDF("kind", "a", "b", "c")
      vars.unionByName(edges).unionByName(stmts).unionByName(counts)
    }),

    // G31 — Sequence Ontology load (sequenceOntology.js:82-133): SO OWL →
    // vocabulary terms (label required, `_`→space names, deprecated flag)
    // + subclassof edges gated on /^so:\d+$/i parents with BOTH endpoints
    // labeled; unlabeled subjects and dangling links surface as counts.
    "g31_so" -> ((s, dir) => {
      import s.implicits._
      val owl =
        """<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
          |  xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#"
          |  xmlns:owl="http://www.w3.org/2002/07/owl#"
          |  xmlns:obo="http://purl.obolibrary.org/obo/"
          |  xmlns:oboInOwl="http://www.geneontology.org/formats/oboInOwl#">
          |  <owl:Class rdf:about="http://purl.obolibrary.org/obo/SO_0000001">
          |    <rdfs:label>region</rdfs:label>
          |    <obo:IAO_0000115>A sequence feature region</obo:IAO_0000115>
          |    <oboInOwl:hasExactSynonym>sequence</oboInOwl:hasExactSynonym>
          |    <rdfs:subClassOf rdf:resource="http://purl.obolibrary.org/obo/SO_0000110"/>
          |  </owl:Class>
          |  <owl:Class rdf:about="http://purl.obolibrary.org/obo/SO_0000110">
          |    <rdfs:label>sequence_feature</rdfs:label>
          |  </owl:Class>
          |  <owl:Class rdf:about="http://purl.obolibrary.org/obo/SO_0000002">
          |    <rdfs:label>sequence_secondary_structure</rdfs:label>
          |    <owl:deprecated>true</owl:deprecated>
          |    <rdfs:subClassOf rdf:resource="http://purl.obolibrary.org/obo/SO_0000110"/>
          |    <rdfs:subClassOf rdf:resource="http://www.w3.org/2002/07/owl#Thing"/>
          |  </owl:Class>
          |  <owl:Class rdf:about="http://purl.obolibrary.org/obo/SO_0000999">
          |    <obo:IAO_0000115>unlabeled record, parse error</obo:IAO_0000115>
          |    <rdfs:subClassOf rdf:resource="http://purl.obolibrary.org/obo/SO_0000110"/>
          |  </owl:Class>
          |  <owl:Class rdf:about="http://purl.obolibrary.org/obo/SO_0000003">
          |    <rdfs:label>G_quartet</rdfs:label>
          |    <rdfs:subClassOf rdf:resource="http://purl.obolibrary.org/obo/SO_0000999"/>
          |  </owl:Class>
          |</rdf:RDF>""".stripMargin
      val f = java.io.File.createTempFile("graft-g31", ".owl")
      java.nio.file.Files.writeString(f.toPath, owl)
      val store = new core.PersistentGraphStore(s,
        scratchDir("g31"))
      val c1 = sources.SequenceOntology.load(s, store, f.getPath)
      sources.SequenceOntology.load(s, store, f.getPath) // idempotency pass
      val ents = store.read("vocabulary").get
        .select(lit("entity").as("kind"), col("sourceId").as("a"),
          col("name").as("b"),
          concat(col("deprecated").cast("string"), lit("|"),
            coalesce(col("description"), lit("-"))).as("c"))
      val edges = store.read("edges").get
        .select(col("edgeClass").as("kind"), col("out").as("a"),
          col("in").as("b"), lit("").as("c"))
      val counts = Seq(
        ("count:errors", c1("errors").toString, "", ""),
        ("count:edge_drops", c1("edge_drops").toString, "", ""))
        .toDF("kind", "a", "b", "c")
      ents.unionByName(edges).unionByName(counts)
    }),

    // G32 — GSC therapeutic ontology load (gscTherapeuticOntology.js:
    // 13-240): inhibitors→inhibitor first-occurrence fold, drugbank→
    // chembl→new-record ladder, first-creation-wins subset tags, alias
    // split + aliasof, drug→parent→grandparent subclassof chain (both
    // grandparents hang off the parent), class→same-name-drug and
    // DrugBankID crossreferenceof, DBid-miss errors.
    "g32_gsct" -> ((s, dir) => {
      import s.implicits._
      import sources.GscTherapy.GscRow
      val store = new core.PersistentGraphStore(s,
        scratchDir("g32"))
      val rows = Seq(
        GscRow(1, "Vemurafenib", "plx4032, RG7204, vemurafenib", "DB08881",
          "RAF inhibitors", "kinase inhibitors", "MAPK pathway inhibitors"),
        GscRow(2, "Selumetinib", "AZD6244", "", "MEK inhibitors",
          "kinase inhibitors", ""),
        GscRow(3, "Kinase inhibitors", "", "", "kinase inhibitors", "", ""),
        GscRow(4, "baddrug", "", "DB99999", "", "", ""),
        GscRow(5, "Mekinist", "", "", "Trametinib", "MEK inhibitors", ""))
      val drugbank = Seq(("vemurafenib", "DB08881"), ("trametinib", "DB08911"))
        .toDF("name", "sourceId")
      val chembl = Seq(("selumetinib", "CHEMBL1614701")).toDF("name", "sourceId")
      val c1 = sources.GscTherapy.load(s, store, rows, drugbank, chembl)
      sources.GscTherapy.load(s, store, rows, drugbank, chembl) // idempotency
      val ents = store.read("therapies").get
        .select(lit("entity").as("kind"), col("sourceId").as("a"),
          col("name").as("b"), array_join(col("subsets"), ",").as("c"))
      val edges = store.read("edges").get
        .select(col("edgeClass").as("kind"), col("out").as("a"),
          col("in").as("b"), lit("").as("c"))
      val counts = Seq(("count:errors", c1("errors").toString, "", ""))
        .toDF("kind", "a", "b", "c")
      ents.unionByName(edges).unionByName(counts)
    }),

    // G33 — HGVS variant-list upload (variants/index.js:9-81): S9 text
    // scan → feature-required parse → vocabulary-type resolve → entrez
    // gene resolve with by-symbol fetch fallback (the fetched gene is
    // upserted; a biotype!=gene dim row with the same name must NOT
    // satisfy the lookup) → variant upsert; each failure rung counts.
    "g33_variants" -> ((s, dir) => {
      import s.implicits._
      val txt = Seq("KRAS:p.G12D", "EGFR:c.2573T>G",
        "(BCR,ABL1):fusion(e.13,e.3)", "badnotation", "  ",
        "NOVEL1:p.V600E", "MISSING9:p.V1M", "KRAS:c.100dup", "")
        .mkString("\n")
      val f = java.io.File.createTempFile("graft-g33", ".txt")
      java.nio.file.Files.writeString(f.toPath, txt)
      val json = """{"result":{"uids":["9999"],"9999":{"uid":"9999",
        |"name":"NOVEL1","description":"novel gene 1","summary":"fake"}}}"""
        .stripMargin.replace("\n", "")
      val fj = java.io.File.createTempFile("graft-g33", ".json")
      java.nio.file.Files.writeString(fj.toPath, json)
      val store = new core.PersistentGraphStore(s,
        scratchDir("g33"))
      val geneCols = Seq("biotype", "name", "displayName", "longName",
        "description", "url")
      val seed = Seq(
        ("3845", "gene", "KRAS"), ("1956", "gene", "EGFR"),
        ("613", "gene", "BCR"), ("25", "gene", "ABL1"),
        ("555", "transcript", "NOVEL1"))
        .map { case (sid, bt, n) => (sid, bt, n, n,
          null.asInstanceOf[String], null.asInstanceOf[String],
          null.asInstanceOf[String]) }
        .toDF(("sourceId" +: geneCols): _*)
      store.merge("genes", seed, Seq("sourceId"), geneCols)
      val seeded = Set("KRAS", "EGFR", "BCR", "ABL1")
      val fetcher: Seq[String] => Seq[(String, String)] = ids => {
        require(!ids.exists(seeded), // J9 runtime guard: dim hits never fetch
          s"anti-join must prune dim-resolved symbols, got $ids")
        sources.Entrez.fileFetcher(Map("NOVEL1" -> fj.getPath))(ids)
      }
      val vocab = Seq(("substitution", "t:sub"), ("fusion", "t:fusion"))
        .toDF("name", "term_id")
      val c1 = sources.VariantsList.load(s, store, f.getPath, vocab, fetcher)
      sources.VariantsList.load(s, store, f.getPath, vocab, fetcher) // idempotency
      val vars = store.read("variants").get
        .select(lit("variant").as("kind"), col("vid").as("a"),
          col("term").as("b"),
          concat(col("break1"), lit("|"), coalesce(col("break2"), lit("-"))).as("c"))
      val genes = store.read("genes").get
        .select(lit("gene").as("kind"), col("sourceId").as("a"),
          col("name").as("b"), col("biotype").as("c"))
      val counts = Seq(
        ("count:parse_errors", c1("parse_errors").toString, "", ""),
        ("count:vocab_errors", c1("vocab_errors").toString, "", ""),
        ("count:gene_errors", c1("gene_errors").toString, "", ""))
        .toDF("kind", "a", "b", "c")
      vars.unionByName(genes).unionByName(counts)
    }),

    // G34 — all_sources seeder (all_sources/index.js:1-20 + sources.js):
    // the full 39-definition catalog through upsertSource (K7), then a
    // composed J2 resolve whose sourceRank rung reads the LOADED `sort`
    // field (drugbank 0 beats chembl 1, do 1 beats ncit 2, a ranked
    // 99999 source beats an unranked one via nulls-last).
    "g34_all_sources" -> ((s, dir) => {
      import s.implicits._
      val store = new core.PersistentGraphStore(s,
        scratchDir("g34"))
      sources.SourceCatalog.load(s, store)
      sources.SourceCatalog.load(s, store) // idempotency pass
      val src = store.read("sources").get
      val srcRows = src.select(lit("source").as("kind"),
        col("name").as("a"), coalesce(col("displayName"), lit("-")).as("b"),
        coalesce(col("sort").cast("string"), lit("-")).as("c"))
      // candidates: one term present in two sources each; rank rides in
      // from the loaded dimension, not a literal
      val cands = Seq(
        ("imatinib", "drugbank"), ("imatinib", "chembl"),
        ("melanoma", "disease ontology"), ("melanoma", "ncit"),
        ("kras", "oncokb"), ("kras", "vario"))
        .toDF("ck", "source")
        .join(broadcast(src.select(col("name").as("source"),
          col("sort").as("sourceRank"))), Seq("source"), "left")
        .withColumn("deprecated", lit(false)).withColumn("alias", lit(false))
        .withColumn("dependency", lit(null).cast("string"))
        .withColumn("sourceIdVersion", lit(null).cast("string"))
        .withColumn("sourceVersion", lit(null).cast("string"))
        .withColumn("description", lit(null).cast("string"))
      val lookups = cands.select(col("ck")).distinct()
      val res = core.Resolver.resolveUnique(lookups, "ck",
        cands.withColumnRenamed("ck", "cand_key"), "cand_key",
        core.Resolver.ontologyPreference())
      val resolves = res.resolved.select(lit("resolve").as("kind"),
        col("ck").as("a"), col("source").as("b"), lit("").as("c"))
      srcRows.unionByName(resolves)
    }),

    // G35 — the drugbank loader isolated (drugbank/index.js:38-249 over
    // the shipped drugbank_sample.xml): streaming rowTag scan → full
    // record parse (primary id / body fields / IUPAC + formula from
    // calculated-properties / categories→subsets) → alias explosion
    // (simple-word product names) → ATC therapy ladder (4 level vertices,
    // drug→lowest subclassof + 3 ladder rungs, index.js:91-133)
    // → FDA-UNII + ChEMBL CrossReferenceOf → targetof gene→drug
    // with the action comment → store round trip, TWICE — the rerun's
    // mutation counters ride the output, so a non-idempotent pass fails
    // the row. Dependency dims are seeded the way the corpus DAG provides
    // them: the fdaSrs sample TSV (plus the erlotinib UNII row the full
    // production file carries — the 100-row sample stops at 'C'), the
    // recorded chembl.CHEMBL553 molecule fetch, and the hgnc:3236
    // resolution the reference's fetchAndLoadBySymbol performs.
    "g35_drugbank" -> ((s, dir) => {
      import s.implicits._
      val store = new core.PersistentGraphStore(s, scratchDir("g35"))
      val fdaDim = sources.FdaSrs
        .therapies(s, s"$REF_DATA/UNII_Records_25Oct2018_sample.txt")
        .unionByName(Seq(("J4T82NDH7E", "ERLOTINIB")).toDF("sourceId", "name"))
      val chemblDim = sources.Chembl
        .molecules(s, s"$REF_DATA/chembl.CHEMBL553.json")
        .select("sourceId", "name")
      val geneDim = Seq(("HGNC:3236", "egfr")).toDF("hgncId", "symbol")
      val run = () => sources.Loaders.loadDrugbankFull(s, store,
        s"$REF_DATA/drugbank_sample.xml", fdaDim, chemblDim, geneDim)
      run()
      val c2 = run() // idempotency pass: no create/update/delete, no edges
      val mutations = Seq("create", "update", "delete", "edges_created")
        .map(k => c2.getOrElse(k, 0L)).sum
      val stored = store.read("therapies").get
      val therapies = stored
        .select(lit("therapy").as("kind"), col("sourceId").as("a"),
          col("name").as("b"), col("alias").cast("string").as("c"),
          coalesce(col("dependency"), lit("-")).as("d"))
      val fields = stored.filter(!col("alias") && !col("atc"))
        .select(col("sourceId"), map(
          lit("sourceIdVersion"), col("sourceIdVersion"),
          lit("iupacName"), col("iupacName"),
          lit("molecularFormula"), col("molecularFormula"),
          lit("mechanismOfAction"), substring(col("mechanismOfAction"), 1, 40),
          lit("description"), substring(col("description"), 1, 40),
          lit("subsets"), array_join(col("subsets"), ";")).as("m"))
        .select(col("sourceId"), explode(col("m")))
        .select(lit("field").as("kind"), col("sourceId").as("a"),
          col("key").as("b"), coalesce(col("value"), lit("-")).as("c"),
          lit("").as("d"))
      val edges = store.read("edges").get
        .select(lit("edge").as("kind"), col("edgeClass").as("a"),
          col("out").as("b"), col("in").as("c"),
          coalesce(col("comment"), lit("-")).as("d"))
      val rerun = Seq(("rerun", "mutations", mutations.toString, "", ""))
        .toDF("kind", "a", "b", "c", "d")
      therapies.unionByName(fields).unionByName(edges).unionByName(rerun)
    }),

    // g36: the dbSNP loader (entrez/snp.js) on a recorded esummary
    // fixture — docsum parse (sort-reverse transcript pick, &gt;
    // unescape), CatalogueVariant upsert, refseq/gene dimension
    // hydration, the cds→protein→gene-alt PositionalVariant ladder with
    // its Infers chain, the per-leg error + API-miss side-channels, and
    // the catalogue-cache idempotent rerun.
    "g36_snp" -> ((s, dir) => {
      import s.implicits._
      val store = new core.PersistentGraphStore(s, scratchDir("g36"))
      val snpFixture = sources.Snp.fixturePath("/fixtures/entrez_snp.esummary.json")
      val snpFetcher = sources.Snp.rsFetcher(
        Seq("121434568", "28934576", "1042522", "9999999")
          .map(u => u -> snpFixture).toMap)
      val refseqFetcher = sources.Entrez.fileFetcher(Map(
        "NM_005228.5" -> s"$REF_DATA/entrez_refseq.NM_005228.5.json",
        "NP_005219.2" ->
          sources.Snp.fixturePath("/fixtures/entrez_refseq.NP_005219.2.json"),
        "NP_000537.3" ->
          sources.Snp.fixturePath("/fixtures/entrez_refseq.NP_000537.3.json")))
      val geneFetcher = sources.Entrez.fileFetcher(
        Map("1956" -> sources.Snp.fixturePath("/fixtures/entrez_gene.1956.json")))
      val vocab = Seq(("substitution", "so:substitution")).toDF("name", "term_id")
      val run = () => sources.Snp.fetchAndLoad(s, store,
        Seq("rs121434568", "rs28934576", "rs1042522", "rs9999999",
          "rs404040404").toDS(),
        snpFetcher, refseqFetcher, geneFetcher, vocab)
      val c1 = run()
      val c2 = run() // catalogue cache hit → no fetch, all-noop
      val mutations = c2.collect {
        case (k, v) if k.endsWith("create") || k.endsWith("update") ||
          k.endsWith("delete") || k == "edges_created" => v
      }.sum
      val cat = store.read("catalogue_variants").get
        .select(lit("catalogue").as("kind"), col("sourceId").as("a"),
          col("name").as("b"), col("sourceIdVersion").as("c"), col("url").as("d"))
      val refs = store.read("refseq").get
        .select(lit("feature:refseq").as("kind"), col("sourceId").as("a"),
          col("biotype").as("b"), coalesce(col("name"), lit("-")).as("c"),
          col("displayName").as("d"))
      val genes = store.read("genes").get
        .select(lit("feature:gene").as("kind"), col("sourceId").as("a"),
          col("biotype").as("b"), col("name").as("c"), col("displayName").as("d"))
      val vars = store.read("variants").get
        .select(lit("variant").as("kind"), col("vid").as("a"),
          col("notation").as("b"), col("break1").as("c"), col("reference1").as("d"))
      val edges = store.read("edges").get
        .select(lit("edge").as("kind"), col("edgeClass").as("a"),
          col("out").as("b"), col("in").as("c"), lit("").as("d"))
      val counts = Seq(
        ("count", "hgvs_errors", c1.getOrElse("hgvs_errors", 0L).toString, "", ""),
        ("count", "misses", c1.getOrElse("misses", 0L).toString, "", ""),
        ("rerun", "mutations", mutations.toString, "", ""))
        .toDF("kind", "a", "b", "c", "d")
      cat.unionByName(refs).unionByName(genes).unionByName(vars)
        .unionByName(edges).unionByName(counts)
    }),

    // LDR_FUSION_SCALE — the cosmic-fusions three-level recurrence rollup
    // (the exact CosmicFusions plan g24 pins on its fixture) over an
    // sf-PROPORTIONAL synthetic fusion corpus derived from `events`:
    // ~50 rows per fusion key at every sf (key count grows with the
    // table), exon split in 3, 'NS' folds, `_`-suffix genes, a
    // disease-miss stripe (D3/F3/F4) and an under-threshold stripe
    // (k%11: ≤2 distinct samples). Unlike the fixture g-rows this one
    // MEASURES the rollup: its cost scales with sf, it runs in the
    // median-of-reps headline loop, and a plan regression (lost
    // broadcast, lost map-side distinct) moves its time.
    "ldr_fusion_scale" -> ((s, dir) => {
      import s.implicits._
      val store = new core.PersistentGraphStore(s, scratchDir("ldrf"))
      val ev = t(s, dir, "events").select(col("event_id"), col("user_id"))
      val n = ev.agg(count(lit(1)).as("__n"))
      val rows = ev.crossJoin(broadcast(n))
        .withColumn("k", col("event_id") % greatest(expr("__n div 50"), lit(1L)))
        .select(
          concat(lit("r"), col("event_id")).as("recId"),
          concat(lit("f"), col("k")).as("fusionId"),
          concat(lit("s"), col("user_id") %
            when(col("k") % 11 === 0, 2L).otherwise(40L)).as("sampleId"),
          concat(lit("G"), col("k"),
            when(col("k") % 6 === 0, lit("_v1")).otherwise(lit(""))).as("gene1"),
          concat(lit("H"), col("k")).as("gene2"),
          // the k%7==1 stripe scatters exons across the 101-residue ring
          // (prime modulus × coprime multiplier, so the spread survives
    // any key modulus — a plain event_id%50 is CONSTANT inside a key
          // whenever 50 divides the modulus): its exon-specific groups
          // fall below the 3-sample threshold and only the LEVEL-1
          // non-specific rollup wins — without it the level-1 path would
          // be structurally empty at every sf
          when(col("k") % 7 === 1, col("event_id") * 37 % 101 + 1)
            .otherwise(col("event_id") % 3 + 1).cast("string").as("exon1"),
          when(col("k") % 7 === 1, col("event_id") * 37 % 101 + 1)
            .otherwise(col("event_id") % 3 + 1).cast("string").as("exon2"),
          when(col("k") % 4 === 0, lit("NS"))
            .otherwise(concat(lit("D"), col("k") % 4)).as("disease"),
          when(col("k") % 5 === 0, lit("NS"))
            .otherwise(concat(lit("F"), col("k") % 5)).as("diseaseFamily"),
          lit("").as("pubmed"))
      // D3 / F3 / F4 deliberately absent: their groups take the
      // disease-miss error path at levels 0-1 and fall through to the
      // level-2 cancer rollup
      val diseases = Seq(("D1", "d:1"), ("D2", "d:2"),
        ("cancer", "d:c"), ("F1", "d:f1"), ("F2", "d:f2"))
        .toDF("name", "sourceId")
      val c = sources.CosmicFusions.loadDf(s, store, rows, diseases)
      store.read("statements").get
        .select(col("sourceId"), col("level"), col("relevance"),
          col("condition"), col("subject"), col("n_samples"))
        .unionByName(Seq(("__errors", -1L, "", "", "",
          c.getOrElse("error", 0L))).toDF("sourceId", "level", "relevance",
          "condition", "subject", "n_samples"))
    }),

    // LDR_HOTSPOT_SCALE — the cancerhotspots three-form ladder (the exact
    // CancerHotspots plan g19 pins on its 4-row fixture) over an
    // sf-PROPORTIONAL synthetic record set from `events`: one record per
    // event, all four HGVS shapes (sub/ins/del/indel) with sf-varying
    // positions, both chromosome dim forms (sourceId + name), an
    // unresolved-gene stripe (1/6 fatal), an unresolved-transcript
    // stripe (1/5 → genomic links to protein), a disease-miss stripe
    // (1/5 no statement). Measures the executor-side HGVS grammar + the
    // broadcast dim ladder + statement merge at sf scale.
    "ldr_hotspot_scale" -> ((s, dir) => {
      import s.implicits._
      import sources.CancerHotspots.HotspotRecord
      val store = new core.PersistentGraphStore(s, scratchDir("ldrh"))
      val recs = t(s, dir, "events").select(col("event_id"))
        .withColumn("m", col("event_id") % 4)
        .withColumn("start", col("event_id") + 100L)
        .select(
          concat(lit("h"), col("event_id")).as("sourceId"),
          when(col("event_id") % 2 === 0,
            concat(lit("chr"), col("event_id") % 22 + 1))
            .otherwise(concat(lit("nm"), col("event_id") % 22 + 1))
            .as("chromosome"),
          col("start"),
          (col("start") + when(col("m") === 0, 0L).otherwise(1L)).as("stop"),
          when(col("m") === 0, lit("A")).when(col("m") === 1, lit("-"))
            .when(col("m") === 2, lit("TG")).otherwise(lit("AA")).as("refSeq"),
          when(col("m") === 0, lit("T")).when(col("m") === 1, lit("AG"))
            .when(col("m") === 2, lit("-")).otherwise(lit("CGG"))
            .as("untemplatedSeq"),
          concat(lit("G"), col("event_id") % 300).as("geneId"),
          when(col("m") === 0,
            concat(lit("p.G"), col("event_id") % 50 + 13, lit("D")))
            .when(col("m") === 1,
              concat(lit("p.P"), col("event_id") % 50 + 2, lit("fs*?")))
            .when(col("m") === 2, lit("p.E3_A4delEA"))
            .otherwise(lit("p.K5delKinsRG")).as("protein"),
          concat(lit("T"), col("event_id") % 100).as("transcriptId"),
          when(col("m") === 0,
            concat(lit("c."), col("event_id") % 500 + 1, lit("G>A")))
            .when(col("m") === 1, lit("c.4_5insAG"))
            .when(col("m") === 2, lit("c.7_12delGAAGCA"))
            .otherwise(lit("c.13_15delAAGinsCG")).as("cds"),
          concat(lit("d"), col("event_id") % 10).as("diseaseId"))
        .as[HotspotRecord]
      val genes = s.range(250).select(concat(lit("G"), col("id")).as("sourceId"))
      val chroms = s.range(1, 23)
        .select(concat(lit("chr"), col("id")).as("sourceId"),
          concat(lit("nm"), col("id")).as("name"))
      val transcripts = s.range(100)
        .select(concat(lit("T"), col("id")).as("sourceId"),
          when(col("id") < 80, lit("transcript")).otherwise(lit("gene"))
            .as("biotype"))
      val diseases = s.range(8).select(concat(lit("d"), col("id")).as("sourceId"))
      val vocab = Seq(("substitution", "t:sub"), ("deletion", "t:del"),
        ("insertion", "t:ins"), ("indel", "t:indel"),
        ("frameshift", "t:fs")).toDF("name", "term_id")
      val c = sources.CancerHotspots.loadDs(s, store, recs, genes, chroms,
        transcripts, diseases, vocab)
      val vars = store.read("variants").get
        .select(concat(lit("variant:"), col("form")).as("kind"),
          col("vid").as("a"), col("term").as("b"),
          coalesce(col("break1"), lit("-")).as("c"), col("reference1").as("d"))
      val edges = store.read("edges").get
        .select(lit("infers").as("kind"), col("out").as("a"),
          col("in").as("b"), lit("").as("c"), lit("").as("d"))
      val stmts = store.read("statements").get
        .select(lit("statement").as("kind"), col("sourceId").as("a"),
          col("subject").as("b"), array_join(col("conditions"), ",").as("c"),
          lit("").as("d"))
      val counts = Seq(("count:record_errors",
        c("record_errors").toString, "", "", "")).toDF("kind", "a", "b", "c", "d")
      vars.unionByName(edges).unionByName(stmts).unionByName(counts)
    }),

    // LDR_NCIT_SCALE — the NCIt normalize + collision-resolution pipeline
    // (the exact NcitLoad plan g3 pins on its 11-row fixture) over an
    // sf-PROPORTIONAL synthetic concept set from `events`: one concept
    // per event, binary-tree parents (the parent self-join scales), 3-way
    // engineered name collisions (the collision window scales), a
    // synonym stripe (alias explosion + preferred-name reassignment), a
    // deprecation stripe (%23), then the (sourceId,name)-keyed store
    // merge + edge upsert at sf size. The fixture g3 stays the branch-
    // coverage row; THIS row is the one whose time moves when the
    // collision window or the parent join loses its plan shape.
    "ldr_ncit_scale" -> ((s, dir) => {
      val store = new core.PersistentGraphStore(s, scratchDir("ldrn"))
      val raw = t(s, dir, "events").select(col("event_id"))
        .select(
          concat(lit("C"), col("event_id")).as("id"),
          concat(lit("<http://n/C"), col("event_id"), lit(">")).as("xmlTag"),
          when(col("event_id") > 0,
            concat(lit("C"), expr("event_id div 2"))).otherwise(lit(""))
            .as("parents"),
          when(col("event_id") % 5 === 0,
            concat(lit("Syn "), col("event_id"), lit("|Alt "), col("event_id")))
            .otherwise(lit("")).as("synonyms"),
          lit("a concept").as("definition"),
          concat(lit("Name "), expr("event_id div 3")).as("name"),
          when(col("event_id") % 23 === 0, lit("Obsolete_Concept"))
            .otherwise(lit("")).as("conceptStatus"),
          lit("Neoplastic Process").as("semanticType"),
          lit("").as("conceptInSubset"))
      sources.NcitLoad.loadFrom(s, store, raw)
      val v = store.read("terms").get
        .select(lit("v").as("kind"), col("sourceId").as("a"),
          col("name").as("b"), col("displayName").as("c"),
          col("alias").cast("string").as("d"))
      val e = store.read("edges").get
        .select(lit("e").as("kind"), col("edgeClass").as("a"),
          col("out").as("b"), col("in").as("c"), lit("").as("d"))
      v.unionByName(e)
    }),

    // G29 — PMC4468049 recurrent fusions (PMC4468049/index.js:32-185,
    // Table S7): low-frequency skip, first-matching-count-column disease
    // specificity with the cancer fallback, disease-miss skips,
    // gene-miss errors, fusion variants + recurrent statements.
    "g29_pmc4468049" -> ((s, dir) => {
      import s.implicits._
      import sources.Pmc4468049.{CodeCount, FusionRow}
      val store = new core.PersistentGraphStore(s,
        scratchDir("g29"))
      val rows = Seq(
        FusionRow("r1", "EML4__ALK", "4",
          Seq(CodeCount("LUAD", "4"), CodeCount("SKCM", "0"))),
        FusionRow("r2", "BCR__ABL1", "3",
          Seq(CodeCount("LUAD", "2"), CodeCount("SKCM", "1"))),
        FusionRow("r3", "X__Y", "2", Seq(CodeCount("LUAD", "2"))),
        FusionRow("r4", "TMPRSS2__ERG", "3", Seq(CodeCount("PRAD", "3"))),
        FusionRow("r5", "NOGENE__ALK", "3", Seq(CodeCount("SKCM", "3"))))
      val codeNames = Map("LUAD" -> "Lung adenocarcinoma",
        "SKCM" -> "cutaneous melanoma", "PRAD" -> "Prostate adenocarcinoma")
      val diseases = Seq(("d:luad", "Lung adenocarcinoma"),
        ("d:cancer", "cancer"), ("d:mel", "cutaneous melanoma"))
        .toDF("sourceId", "name")
      val genes = Seq(("EML4", "27436"), ("ALK", "238"), ("BCR", "613"),
        ("ABL1", "25")).toDF("symbol", "sourceId")
      val vocab = Seq(("in-frame fusion", "t:fus"), ("recurrent", "t:rec"))
        .toDF("name", "term_id")
      val run = () => sources.Pmc4468049.load(s, store, rows, codeNames,
        diseases, genes, vocab)
      val c1 = run()
      run() // idempotency pass
      val vars = store.read("variants").get
        .select(lit("variant").as("kind"), col("vid").as("a"),
          concat(col("reference1"), lit("|"), col("reference2")).as("b"),
          lit("").as("c"))
      val stmts = store.read("statements").get
        .select(lit("statement").as("kind"), col("sourceId").as("a"),
          concat(col("relevance"), lit("|"), col("subject")).as("b"),
          array_join(col("conditions"), ",").as("c"))
      val counts = Seq(
        ("count:skip", c1("skip").toString, "", ""),
        ("count:error", c1("error").toString, "", ""))
        .toDF("kind", "a", "b", "c")
      vars.unionByName(stmts).unionByName(counts)
    }),

    // G28 — the generic local-ontology JSON loader (ontology/index.js:
    // 106-242) on the REAL data/vocab.json DAG root: 247 vocabulary
    // records (sourceId/name defaulting, source defaulting) + 278 typed
    // links; the oracle re-derives everything from the raw JSON with
    // DuckDB's MAP reader.
    "g28_vocab_file" -> ((s, dir) => {
      val path = "/root/reference/data/vocab.json"
      val store = new core.PersistentGraphStore(s,
        scratchDir("g28"))
      sources.OntologyFile.load(s, store, path, "vocabulary")
      sources.OntologyFile.load(s, store, path, "vocabulary") // idempotency
      val outCounts = store.read("edges").get
        .groupBy(col("out").as("sourceId"), col("edgeClass"))
        .agg(count(lit(1)).as("n"))
        .groupBy(col("sourceId"))
        .agg(sum(col("n")).as("n_links"))
      store.read("vocabulary").get
        .join(outCounts, Seq("sourceId"), "left")
        .select(col("sourceId").as("source_id"), col("name"),
          col("deprecated"), col("source"),
          coalesce(col("n_links"), lit(0L)).cast("long").as("n_links"))
    }),

    // G27 — ASCO abstracts dedup-and-load (asco/index.js:47-93): the
    // fill-score collapse with the last-encountered tie-break, upserted
    // by the duplicate key.
    "g27_asco" -> ((s, dir) => {
      import sources.Asco.Abstract
      val store = new core.PersistentGraphStore(s,
        scratchDir("g27"))
      val abstracts = Seq(
        // dup group: fuller record wins regardless of order
        Abstract(1L, "100", "2020", "am", "T cells", "Smith", "", ""),
        Abstract(2L, "100", "2020", "am", "T cells", "Smith", "cit-a", "doi-a"),
        Abstract(3L, "100", "2020", "am", "T cells", "Smith", "cit-b", ""),
        // tie group: equal fill → LAST input record wins
        Abstract(4L, "200", "2021", "gi", "B cells", "Jones", "cit-1", ""),
        Abstract(5L, "200", "2021", "gi", "B cells", "Jones", "cit-2", ""),
        // singleton
        Abstract(6L, "300", "2022", "am", "NK cells", "Wu", "", "doi-z"))
      val run = () => sources.Asco.load(s, store, abstracts)
      run(); run() // idempotency pass
      store.read("abstracts").get
        .select(col("sourceId").as("source_id"), col("citation"),
          col("doi"))
    }),

    // G26 — PMC4232638 supplementary-table loader (PMC4232638/index.js:
    // 24-170) over an inline super-header workbook: the relevance
    // decision table (kinase oncogenes, the 'no '-prefix falsiness,
    // multi-category skip), PMID cell parse with annotations kept in the
    // comment, and one protein variant + statement per surviving row.
    "g26_pmc4232638" -> ((s, dir) => {
      import s.implicits._
      val f = java.io.File.createTempFile("graft-g26", ".xlsx")
      val zos = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(f))
      def entry(name: String, content: String): Unit = {
        zos.putNextEntry(new java.util.zip.ZipEntry(name))
        zos.write(content.getBytes("UTF-8")); zos.closeEntry()
      }
      entry("[Content_Types].xml",
        """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>""")
      def cell(r: Int, c: Int, v: String) =
        if (v.isEmpty) ""
        else s"""<c r="${('A' + c).toChar}$r" t="inlineStr"><is><t>$v</t></is></c>"""
      val kinase = "Change in kinase, GTPase, or other enzymatic activity (i.e. RNase)"
      val rows = Seq(
        Seq("Additional file 2"),
        Seq("Gene", "Amino acid change", "Type", "Functional classification",
          "Functional categories for oncogenes/ new cancer genes",
          "Functional categories for TP53", "", "", "PubMed ID (PMID)"),
        Seq("", "", "", "", kinase, "Gain of function", "Loss of function",
          "Dominant negative activity", ""),
        Seq("TP53", "R175H", "Tumour suppressor", "non-neutral", "",
          "yes", "no effect", "", "123, 456 (in vitro)"),
        Seq("TP53", "R273H", "Tumour suppressor", "non-neutral", "",
          "no effect", "yes", "yes", ""),
        Seq("TP53", "P72R", "Tumour suppressor", "non-neutral", "",
          "yes", "yes", "", ""),
        Seq("KRAS", "G12D", "Oncogene", "non-neutral", "yes",
          "", "", "", "789"),
        Seq("BRAF", "V600E", "Oncogene", "neutral", "yes", "", "", "", ""),
        Seq("TP53", "R282W", "Tumour suppressor", "non-neutral", "",
          "no effect", "yes", "no effect", "abc"))
      val body = rows.zipWithIndex.map { case (r, ri) =>
        s"""<row r="${ri + 1}">${r.zipWithIndex.map { case (v, ci) => cell(ri + 1, ci, v) }.mkString}</row>"""
      }.mkString
      entry("xl/worksheets/sheet1.xml",
        s"""<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>$body</sheetData></worksheet>""")
      zos.close()
      val grid = sources.XlsxScan.df(s, f.getPath, superHeader = true)
      val store = new core.PersistentGraphStore(s,
        scratchDir("g26"))
      val genes = Seq(("TP53", "7157"), ("KRAS", "3845")).toDF("symbol", "sourceId")
      val vocab = Seq(("gain of function", "t:gof"),
        ("loss of function", "t:lof"), ("dominant negative", "t:domneg"),
        ("likely gain of function", "t:lgof"), ("substitution", "t:sub"))
        .toDF("name", "term_id")
      val run = () => sources.Pmc4232638.load(s, store, grid, genes, vocab)
      run(); run() // idempotency pass
      val vars = store.read("variants").get
        .select(lit("variant").as("kind"), col("vid").as("a"),
          col("type_term").as("b"), col("break1").as("c"))
      val stmts = store.read("statements").get
        .select(lit("statement").as("kind"), col("sourceId").as("a"),
          concat(col("relevance"), lit("|"), col("subject"), lit("|"),
            array_join(col("conditions"), ",")).as("b"),
          concat(array_join(col("evidence"), ","), lit("|"),
            col("comment")).as("c"))
      vars.unionByName(stmts)
    }),

    // G25 — FDA approvals announcement scrape (fdaApprovals/index.js:
    // 40-137): blacklisted-link harvest, h1/article extraction, the
    // one-distinct-year rule, CuratedContent upsert, missing-page errors.
    "g25_fda_approvals" -> ((s, dir) => {
      import s.implicits._
      val index =
        """<html><body><nav><a href="/drugs">Drugs</a>
          |<a href="/drugs/development-approval-process-drugs">Process</a></nav>
          |<main><a href="/drugs/resources/announce-1">One</a>
          |<a href="/drugs/resources/announce-1">One again</a>
          |<a href="/drugs/resources/announce-2">Two</a>
          |<a href="/drugs/resources/announce-404">Gone</a>
          |<a href="/vaccines/other">Other</a></main></body></html>""".stripMargin
      val p1 =
        """<html><body><h1 class="content-title">FDA approves drugx for melanoma</h1>
          |<article><p>On January 15, 2020 the FDA approved drugx.</p>
          |<p>Submitted Jan. 3, 2020 under priority review.</p></article>
          |</body></html>""".stripMargin
      val p2 =
        """<html><body><h1 class="content-title">FDA approves drugy</h1>
          |<article><p>On May 1, 2019 the FDA granted approval.</p>
          |<p>The confirmatory trial read out June 2, 2021.</p></article>
          |</body></html>""".stripMargin
      val store = new core.PersistentGraphStore(s,
        scratchDir("g25"))
      val pages = Map("/drugs/resources/announce-1" -> p1,
        "/drugs/resources/announce-2" -> p2)
      val run = () => sources.FdaApprovals.load(s, store, index, pages)
      val c1 = run()
      run() // idempotency pass
      val curated = store.read("curated").get
        .select(lit("curated").as("kind"), col("sourceId").as("a"),
          col("name").as("b"),
          concat(coalesce(col("year"), lit("-")), lit("|"),
            col("url")).as("c"))
      val counts = Seq(("count:error", c1("error").toString, "", ""))
        .toDF("kind", "a", "b", "c")
      curated.unionByName(counts)
    }),

    // G24 — COSMIC fusions recurrence rollup (cosmic/fusions.js:36-225):
    // three specificity levels with >=3-distinct-sample gating,
    // success-only suppression of less-specific groups, NS folds, the
    // level-2 cancer override, and per-group disease-miss errors.
    "g24_cosmic_fusions" -> ((s, dir) => {
      import s.implicits._
      import sources.CosmicFusions.FusionRow
      val store = new core.PersistentGraphStore(s,
        scratchDir("g24"))
      val rows = Seq(
        FusionRow("a1", "f1", "s1", "BRAF_ENST00000288602", "MEK1", "10", "2",
          "melanoma", "skin", "p1"),
        FusionRow("a2", "f1", "s2", "BRAF_ENST00000288602", "MEK1", "10", "2",
          "melanoma", "skin", "p1"),
        FusionRow("a3", "f1", "s3", "BRAF_ENST00000288602", "MEK1", "10", "2",
          "melanoma", "skin", "p2"),
        FusionRow("a4", "f1", "s3", "BRAF_ENST00000288602", "MEK1", "10", "2",
          "melanoma", "skin", "p2"),
        FusionRow("b1", "f2", "s10", "EWSR1", "FLI1_X", "7", "6",
          "sarcoma", "soft tissue", "p3"),
        FusionRow("b2", "f2", "s11", "EWSR1", "FLI1_X", "7", "6",
          "sarcoma", "soft tissue", "p3"),
        FusionRow("b3", "f2", "s12", "EWSR1", "FLI1_X", "8", "6",
          "sarcoma", "soft tissue", "p3"),
        FusionRow("c1", "f3", "s20", "BCR", "ABL1", "1", "2",
          "aml", "blood", "p4"),
        FusionRow("c2", "f3", "s21", "BCR", "ABL1", "3", "4",
          "cml", "blood", "p4"),
        FusionRow("c3", "f3", "s22", "BCR", "ABL1", "5", "6",
          "NS", "NS", "p4"),
        FusionRow("d1", "f4", "s30", "GX", "GY", "1", "1",
          "braintumor", "cns", "p5"),
        FusionRow("d2", "f4", "s31", "GX", "GY", "1", "1",
          "braintumor", "cns", "p5"),
        FusionRow("e1", "f5", "s40", "AA", "BB", "2", "3",
          "mysterydisease", "", "p6"),
        FusionRow("e2", "f5", "s41", "AA", "BB", "2", "3",
          "mysterydisease", "", "p6"),
        FusionRow("e3", "f5", "s42", "AA", "BB", "2", "3",
          "mysterydisease", "", "p6"))
      val diseases = Seq(("melanoma", "d:mel"), ("sarcoma", "d:sarc"),
        ("cancer", "d:cancer")).toDF("name", "sourceId")
      val run = () => sources.CosmicFusions.load(s, store, rows, diseases)
      val c1 = run()
      run() // idempotency pass
      val vars = store.read("variants").get
        .select(concat(lit("variant:"), col("form")).as("kind"),
          col("vid").as("a"),
          concat(coalesce(col("break1"), lit("-")), lit("|"),
            coalesce(col("break2"), lit("-"))).as("b"), lit("").as("c"))
      val edges = store.read("edges").get
        .select(lit("infers").as("kind"), col("out").as("a"),
          col("in").as("b"), lit("").as("c"))
      val stmts = store.read("statements").get
        .select(lit("statement").as("kind"), col("sourceId").as("a"),
          concat(col("level"), lit("|"), col("condition"), lit("|"),
            col("subject")).as("b"),
          col("n_samples").cast("string").as("c"))
      val counts = Seq(("count:error", c1("error").toString, "", ""))
        .toDF("kind", "a", "b", "c")
      vars.unionByName(edges).unionByName(stmts).unionByName(counts)
    }),

    // G23 — COSMIC resistance variant ladder (cosmic/resistance.js:
    // 56-206): ensembl-referenced protein/cds forms, the entrez-first
    // hgnc-fallback general protein, chromosome-gated genomic with
    // GRCh38, the catalog variant, and the four Infers link rules.
    "g23_cosmic_resistance" -> ((s, dir) => {
      import s.implicits._
      import sources.CosmicResistance.ResistanceRecord
      val store = new core.PersistentGraphStore(s,
        scratchDir("g23"))
      val records = Seq(
        ResistanceRecord("m1", "BRAF_ENST00000288602",
          "ENSP00000288602.7:p.V600E", "ENST00000288602.11:c.1799T>A",
          "7:g.140753336A>T", "COSM476"),
        ResistanceRecord("m2", "NOGENE_ENST00000000001",
          "ENSP00000000001.1:p.G12D", "", "", "COSM1"),
        ResistanceRecord("m3", "LEGACY_ENST00000000002",
          "ENSP00000000002.1:p.L858R", "", "7:g.55191822T>G", "COSM2"),
        ResistanceRecord("m4", "KRAS_ENST00000311936",
          "ENSP00000308495.3:p.G12C", "ENST00000311936.7:c.34G>T",
          "MT:g.100A>T", "COSM3"))
      val genes = Seq(("BRAF", "673"), ("KRAS", "3845")).toDF("symbol", "sourceId")
      val hgnc = Seq(("LEGACY", "hgnc:9999")).toDF("symbol", "sourceId")
      val chroms = Seq("7").toDF("sourceId")
      val vocab = Seq(("substitution", "t:sub")).toDF("name", "term_id")
      val run = () => sources.CosmicResistance.load(s, store, records,
        genes, hgnc, chroms, vocab)
      run(); run() // idempotency pass
      val vars = store.read("variants").get
        .select(concat(lit("variant:"), col("form")).as("kind"),
          col("vid").as("a"), coalesce(col("term"), lit("-")).as("b"),
          concat(coalesce(col("break1"), lit("-")), lit("|"),
            coalesce(col("assembly"), lit("-"))).as("c"))
      val edges = store.read("edges").get
        .select(lit("infers").as("kind"), col("out").as("a"),
          col("in").as("b"), lit("").as("c"))
      vars.unionByName(edges)
    }),

    // G22 — uberon OWL load (uberon/index.js:36-207) on an inline RDF/XML
    // sample: label-gated entities, subset URL parsing, deprecated flag,
    // both-ends-loaded subclassof, ncit-gated crossreferenceof.
    "g22_uberon" -> ((s, dir) => {
      import s.implicits._
      val owl =
        """<?xml version="1.0"?>
          |<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
          |    xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#"
          |    xmlns:owl="http://www.w3.org/2002/07/owl#"
          |    xmlns:obo="http://purl.obolibrary.org/obo/"
          |    xmlns:oboInOwl="http://www.geneontology.org/formats/oboInOwl#">
          |  <owl:Class rdf:about="http://purl.obolibrary.org/obo/UBERON_0000001">
          |    <rdfs:label>anatomical structure</rdfs:label>
          |    <obo:IAO_0000115>a structure</obo:IAO_0000115>
          |    <oboInOwl:inSubset rdf:resource="http://purl.obolibrary.org/obo/uberon/core#uberon_slim"/>
          |    <oboInOwl:hasDbXref>NCIT:C12345</oboInOwl:hasDbXref>
          |  </owl:Class>
          |  <owl:Class rdf:about="http://purl.obolibrary.org/obo/UBERON_0000002">
          |    <rdfs:label>lung</rdfs:label>
          |    <owl:deprecated>true</owl:deprecated>
          |    <rdfs:subClassOf rdf:resource="http://purl.obolibrary.org/obo/UBERON_0000001"/>
          |    <oboInOwl:hasDbXref>NCIT:C99999</oboInOwl:hasDbXref>
          |  </owl:Class>
          |  <owl:Class rdf:about="http://purl.obolibrary.org/obo/UBERON_0000003">
          |    <obo:IAO_0000115>no label here</obo:IAO_0000115>
          |  </owl:Class>
          |  <owl:Class rdf:about="http://purl.obolibrary.org/obo/UBERON_0000004">
          |    <rdfs:label>heart</rdfs:label>
          |    <rdfs:subClassOf rdf:resource="http://purl.obolibrary.org/obo/UBERON_0000003"/>
          |    <rdfs:subClassOf rdf:resource="http://purl.obolibrary.org/obo/UBERON_0000001"/>
          |  </owl:Class>
          |</rdf:RDF>""".stripMargin
      val f = java.io.File.createTempFile("graft-g22", ".owl")
      java.nio.file.Files.writeString(f.toPath, owl)
      val store = new core.PersistentGraphStore(s,
        scratchDir("g22"))
      val ncitDim = Seq("c12345").toDF("sourceId")
      sources.Uberon.load(s, store, f.getPath, ncitDim)
      sources.Uberon.load(s, store, f.getPath, ncitDim) // idempotency pass
      val ents = store.read("anatomy").get
        .select(lit("entity").as("kind"), col("sourceId").as("a"),
          col("name").as("b"),
          concat(col("deprecated").cast("string"), lit("|"),
            array_join(col("subsets"), ","), lit("|"),
            coalesce(col("description"), lit("-"))).as("c"))
      val edges = store.read("edges").get
        .select(col("edgeClass").as("kind"), col("out").as("a"),
          col("in").as("b"), lit("").as("c"))
      ents.unionByName(edges)
    }),

    // G21 — CGI row parsing (cancergenomeinterpreter/index.js:73-190):
    // concomitant-biomarker cartesian expansion, protein-list rewrite
    // with the variantClass suffix, exon phrases, fusion pairs, evidence
    // routing with guideline drops, therapy drugFamily fallback; errors
    // to the K10 side-channel.
    "g21_cgi" -> ((s, dir) => {
      import sources.Cgi.CgiRow
      val rows = Seq(
        CgiRow("c1", "BRAF (V600E)", "BRAF", "MUT", "BRAF:V600E",
          "[Vemurafenib]", "", "PMID:21639808"),
        CgiRow("c2", "KRAS (G12,G13)", "KRAS", "MUT", "",
          "[]", "[MEK inhibitors]", "PMID:1;NCT00112233;FDA guidelines"),
        CgiRow("c3", "EGFR exon 19 deletions", "EGFR", "MUT", "",
          "[Gefitinib]", "", "PMC1234"),
        CgiRow("c4", "CDKN2A deletion", "CDKN2A", "CNA", "",
          "[X]", "", "PMID:2"),
        CgiRow("c5", "BCR-ABL1 fusion", "BCR", "FUS", "",
          "[Imatinib]", "", "PMID:3"),
        CgiRow("c6", "BRAF (V600E) + MEK1 (P124S)", "BRAF", "MUT", "",
          "[Trametinib]", "", "PMID:4"),
        CgiRow("c7", "A (V1E) + B (V2E) + C (V3E)", "A", "MUT", "",
          "[Y]", "", "PMID:5"),
        CgiRow("c8", "MET amplification", "MET", "CNA", "",
          "[Z]", "", "WEIRD:1"))
      sources.Cgi.parse(s, rows)
    }),

    // G20 — OncoKB variant loader (oncokb/index.js:199-312): F3 grammar
    // into the category-first routing, fusion reference2 resolve + flip,
    // Other Biomarkers signature path, raw-name vocabulary fallback,
    // unsupported/unresolvable records counted as errors.
    "g20_oncokb" -> ((s, dir) => {
      import s.implicits._
      import sources.OncoKb.OncoKbVariant
      val store = new core.PersistentGraphStore(s,
        scratchDir("g20"))
      val records = Seq(
        OncoKbVariant("r1", "BRAF", "V600E", "673"),
        OncoKbVariant("r2", "BCR", "BCR-ABL1 Fusion", "613"),
        OncoKbVariant("r3", "ABL1", "BCR-ABL1 Fusion", "25"),
        OncoKbVariant("r4", "EGFR", "Amplification", "1956"),
        OncoKbVariant("r5", "KRAS", "Oncogenic Mutations", "3845"),
        OncoKbVariant("r6", "MET", "Exon 14 splice mutation", "4233"),
        OncoKbVariant("r7", "Other Biomarkers",
          "Microsatellite Instability-High", ""),
        OncoKbVariant("r8", "Other Biomarkers", "TMB-H", ""))
      val genes = Seq(("673", "BRAF"), ("25", "ABL1"), ("613", "BCR"),
        ("1956", "EGFR"), ("3845", "KRAS"), ("4233", "MET"))
        .toDF("sourceId", "symbol")
      val signatures = Seq(("microsatellite instability", "sig:msi"))
        .toDF("name", "sourceId")
      val vocab = Seq(("fusion", "t:fusion"), ("amplification", "t:amp"),
        ("oncogenic mutation", "t:onco"), ("strong signature", "t:sig"),
        ("substitution", "t:sub"), ("splice-site", "t:spl"))
        .toDF("name", "term_id")
      val run = () => sources.OncoKb.load(s, store, records, genes,
        signatures, vocab)
      val c1 = run()
      run() // idempotency pass
      val vars = store.read("variants").get
        .select(concat(lit("variant:"), col("form")).as("kind"),
          col("vid").as("a"), col("term").as("b"),
          concat(coalesce(col("break1"), lit("-")), lit("|"),
            coalesce(col("reference2"), lit("-"))).as("c"))
      val counts = Seq(("count:error", c1("error").toString, "", ""))
        .toDF("kind", "a", "b", "c")
      vars.unionByName(counts)
    }),

    // G19 — cancerhotspots loader (cancerhotspots/index.js:56-243):
    // genomic notation routing on '-'-normalized sequences, fs*? trim,
    // per-form failure isolation (protein fatal, genomic/cds not),
    // conditional Infers topology, statement with the oncotree disease as
    // condition AND subject, previous-load sourceId skip.
    "g19_cancerhotspots" -> ((s, dir) => {
      import s.implicits._
      import sources.CancerHotspots.HotspotRecord
      val store = new core.PersistentGraphStore(s,
        scratchDir("g19"))
      val records = Seq(
        HotspotRecord("h1", "7", 140453136L, 140453136L, "A", "T",
          "673", "p.V600E", "ENST00000288602", "c.1799T>A", "mel"),
        HotspotRecord("h2", "7", 100L, 101L, "-", "AG",
          "673", "p.P2fs*?", "ENSTMISSING", "c.4_5insAG", "mel"),
        HotspotRecord("h3", "X", 200L, 201L, "TG", "-",
          "1956", "p.E3_A4delEA", "ENST00000288602", "c.7_12delGAAGCA",
          "unknown_d"),
        HotspotRecord("h4", "7", 300L, 301L, "AA", "CGG",
          "9999", "p.K5delKinsRG", "ENST00000288602", "c.13_15delAAGinsCG",
          "mel"))
      val genes = Seq("673", "1956").toDF("sourceId")
      val chroms = Seq(("7", "chr7")).toDF("sourceId", "name")
      val transcripts = Seq(("ENST00000288602", "transcript"))
        .toDF("sourceId", "biotype")
      val diseases = Seq("mel").toDF("sourceId")
      val vocab = Seq(("substitution", "t:sub"), ("deletion", "t:del"),
        ("insertion", "t:ins"), ("indel", "t:indel"),
        ("frameshift", "t:fs")).toDF("name", "term_id")
      val run = () => sources.CancerHotspots.load(s, store, records,
        genes, chroms, transcripts, diseases, vocab)
      val c1 = run()
      run() // idempotency + previous-load skip pass
      val vars = store.read("variants").get
        .select(concat(lit("variant:"), col("form")).as("kind"),
          col("vid").as("a"), col("term").as("b"),
          coalesce(col("break1"), lit("-")).as("c"))
      val edges = store.read("edges").get
        .select(lit("infers").as("kind"), col("out").as("a"),
          col("in").as("b"), lit("").as("c"))
      val stmts = store.read("statements").get
        .select(lit("statement").as("kind"), col("sourceId").as("a"),
          concat(col("relevance"), lit("|"), col("subject")).as("b"),
          array_join(col("conditions"), ",").as("c"))
      val counts = Seq(("count:record_errors",
        c1("record_errors").toString, "", "")).toDF("kind", "a", "b", "c")
      vars.unionByName(edges).unionByName(stmts).unionByName(counts)
    }),

    // G18 — DOCM variant loader (docm/index.js:33-165): F4 notation
    // fixes, variant_type-routed genomic composition, chromosome
    // sourceId-OR-name resolve (J7), protein-fatal vs genomic-non-fatal
    // failure isolation, genomic→protein Infers.
    "g18_docm" -> ((s, dir) => {
      import s.implicits._
      import sources.Docm.DocmRecord
      val store = new core.PersistentGraphStore(s,
        scratchDir("g18"))
      val records = Seq(
        DocmRecord("r1", "p.G12D", "KRAS", "12", "GRCh37",
          25398284L, 25398284L, "C", "T", "SNV"),
        DocmRecord("r2", "p.W22-", "KRAS", "12", "GRCh37",
          100L, 100L, "A", "-", "DEL"),
        DocmRecord("r3", "p.GG12GV", "KRAS", "chr12", "GRCh37",
          200L, 201L, "GG", "GV", "DELINS"),
        DocmRecord("r4", "p.M1_A2insK", "KRAS", "12", "GRCh37",
          300L, 301L, "-", "AAG", "INS"),
        DocmRecord("r5", "p.V600E", "BRAF", "MT", "GRCh37",
          1L, 1L, "A", "T", "SNV"),
        DocmRecord("r6", "p.G12D", "UNKNOWN", "12", "GRCh37",
          1L, 1L, "A", "T", "SNV"))
      val genes = Seq(("KRAS", "3845"), ("BRAF", "673")).toDF("symbol", "sourceId")
      val chroms = Seq(("12", "chr12")).toDF("sourceId", "name")
      val vocab = Seq(("substitution", "t:sub"), ("deletion", "t:del"),
        ("insertion", "t:ins"), ("indel", "t:indel"))
        .toDF("name", "term_id")
      val run = () => sources.Docm.load(s, store, records, genes, chroms, vocab)
      val c1 = run()
      run() // idempotency pass
      val vars = store.read("variants").get
        .select(concat(lit("variant:"), col("form")).as("kind"),
          col("vid").as("a"), col("term").as("b"),
          concat(coalesce(col("break1"), lit("-")), lit("|"),
            coalesce(col("assembly"), lit("-"))).as("c"))
      val edges = store.read("edges").get
        .select(lit("infers").as("kind"), col("out").as("a"),
          col("in").as("b"), lit("").as("c"))
      val counts = Seq(("count:record_errors",
        c1("record_errors").toString, "", "")).toDF("kind", "a", "b", "c")
      vars.unionByName(edges).unionByName(counts)
    }),

    // G17 — DGIdb interactions (dgidb/index.js:30-86) composed over the
    // entrez hydrate + chembl load: gene + drug resolved against the
    // pre-loaded dims, TargetOf edges with the canonical sorted
    // actionType, unresolvable records counted as errors and skipped.
    "g17_dgidb" -> ((s, dir) => {
      import s.implicits._
      import sources.Dgidb.Interaction
      val store = new core.PersistentGraphStore(s,
        scratchDir("g17"))
      sources.Entrez.hydrate(s, store, "genes", Seq("3845"),
        sources.Entrez.fileFetcher(
          Map("3845" -> s"$REF_DATA/entrez_gene.3845.json")),
        sources.Entrez.parseGene(_), Seq("sourceId"),
        Seq("biotype", "name", "displayName", "longName", "description", "url"))
      sources.Chembl.load(s, store, s"$REF_DATA/chembl.CHEMBL553.json")
      val records = Seq(
        Interaction("u1", "3845", "chembl:CHEMBL553",
          Seq("Inhibitor", " antagonist ")),
        Interaction("u2", "9999", "chembl:CHEMBL553", Seq("inhibitor")),
        Interaction("u3", "3845", "chembl:MISSING", Seq("agonist")))
      val run = () => sources.Dgidb.load(s, store, records,
        store.read("genes").get, store.read("therapies").get)
      val c1 = run()
      run() // idempotency pass: the TargetOf edge must not duplicate
      val edges = store.read("edges").get.filter(col("edgeClass") === "TargetOf")
        .select(lit("targetof").as("kind"), col("out").as("a"),
          col("in").as("b"),
          concat(col("actionType"), lit("|"), col("uuid")).as("c"))
      val counts = Seq(
        ("count:success", c1("success").toString, "", ""),
        ("count:error", c1("error").toString, "", ""))
        .toDF("kind", "a", "b", "c")
      edges.unionByName(counts)
    }),

    // G16 — MOAlmanac small-mutation loader (moa/index.js:48-188) over
    // the four jest `loadSmallMutation` cases (test/moa.test.js:140-221)
    // plus a full genomic+cds+protein+exon ladder and a germline
    // frameshift: forms fan-out, chromosome parseInt normalization,
    // annotation-first vocab double-lookup, Infers chain in join order.
    "g16_moa" -> ((s, dir) => {
      import s.implicits._
      import sources.Moa.MoaVariant
      val store = new core.PersistentGraphStore(s,
        scratchDir("g16"))
      val records = Seq(
        MoaVariant(1L, "KRAS", "somatic_variant", None, None, None, None,
          None, None, None, None, Some("some variant type")),
        MoaVariant(2L, "EGFR", "somatic_variant", None, None, None, None,
          None, None, None, Some(2L), Some("some variant type")),
        MoaVariant(3L, "EGFR", "somatic_variant", None, None, None, None,
          None, None, None, Some(2L), None),
        MoaVariant(4L, "TP53", "somatic_variant", None, None, None, None,
          None, None, None, None, None),
        MoaVariant(5L, "BRAF", "somatic_variant", Some("07"),
          Some(140453136L), Some(140453136L), Some("A"), Some("T"),
          Some("c.1799T>A"), Some("p.V600E"), Some(15L), None),
        MoaVariant(6L, "CHEK2", "germline_variant", None, None, None, None,
          None, None, Some("p.T367fs"), None, None))
      val genes = Seq(("KRAS", "3845"), ("EGFR", "1956"), ("TP53", "7157"),
        ("BRAF", "673"), ("CHEK2", "11200")).toDF("symbol", "sourceId")
      val chroms = Seq("7").toDF("sourceId")
      val vocab = Seq(
        ("substitution", "graphkb", "t:substitution"),
        ("frameshift", "graphkb", "t:frameshift"),
        ("mutation", "graphkb", "t:mutation"),
        ("some variant type", "moa", "t:moa:svt"),
        ("some variant type", "graphkb", "t:any:svt"))
        .toDF("name", "source", "term_id")
      sources.Moa.load(s, store, records, genes, chroms, vocab)
      sources.Moa.load(s, store, records, genes, chroms, vocab) // idempotency
      val vars = store.read("variants").get
        .select(concat(lit("variant:"), col("form")).as("kind"),
          col("vid").as("a"), col("term").as("b"),
          concat(coalesce(col("break1"), lit("-")), lit("|"),
            col("germline").cast("string")).as("c"))
      val edges = store.read("edges").get
        .select(lit("infers").as("kind"), col("out").as("a"),
          col("in").as("b"), lit("").as("c"))
      vars.unionByName(edges)
    }),

    // G15 — Entrez refseq esummary hydration (entrez/refseq.js:41-67
    // parseRecord) on all four recorded fixtures: accessionversion split,
    // biomol → biotype routing (genomic→chromosome, peptide→protein,
    // else transcript), chromosome name from subname. Requests are
    // ACCESSION ids (uid-keyed responses), so the dedup match is on
    // displayName; the unversioned NC_000003 request resolves to the
    // LATEST version (.12) alongside the pinned .11.
    "g15_entrez_refseq" -> ((s, dir) => {
      val store = new core.PersistentGraphStore(s,
        scratchDir("g15"))
      val ids = Seq("NC_000003.11", "NC_000003", "NM_005228.5", "NP_008819.1")
      val fetcher = sources.Entrez.fileFetcher(
        ids.map(i => i -> s"$REF_DATA/entrez_refseq.$i.json").toMap)
      (1 to 2).foreach { _ => // second pass: versioned ids prune, merge noops
        sources.Entrez.hydrate(s, store, "refseqs", ids, fetcher,
          sources.Entrez.parseRefseq(_),
          Seq("sourceId", "sourceIdVersion"),
          Seq("biotype", "name", "displayName", "longName"),
          matchCol = "displayName")
      }
      store.read("refseqs").get
        .select(col("sourceId").as("source_id"),
          col("sourceIdVersion").as("source_id_version"),
          col("biotype"), col("name"),
          col("displayName").as("display_name"),
          col("longName").as("long_name"))
    }),

    // G14 — the whole-corpus dependency DAG (Snakefile:206-420 + per-
    // loader dependencies exports) over every implemented loader into ONE
    // shared store, run twice (second pass must create nothing); the
    // readout is per-table row counts plus orchestration summary, each
    // re-derived independently from the raw fixtures by the oracle.
    "g14_full_dag" -> ((s, dir) => {
      import s.implicits._
      val store = new core.PersistentGraphStore(s,
        scratchDir("g14"))
      val ncit = orchestrate.FullCorpus.writeNcitSample()
      val r1 = orchestrate.FullCorpus.run(s, store, ncit)
      val r2 = orchestrate.FullCorpus.run(s, store, ncit)
      def creates(r: orchestrate.Orchestrator.Report): Long =
        r.statuses.values.collect {
          case orchestrate.Orchestrator.Succeeded(c) =>
            c.collect { case (k, v) if k.contains("create") => v }.sum
        }.sum
      // every loader's error side-channel (K10), summed across the DAG:
      // the intentionally-bad in-situ records land here, not in tables
      def errors(r: orchestrate.Orchestrator.Report): Long =
        r.statuses.values.collect {
          case orchestrate.Orchestrator.Succeeded(c) =>
            c.collect { case (k, v) if k.contains("error") => v }.sum
        }.sum
      val tables = Seq("vocabulary", "terms", "vertices", "diseases",
        "therapies", "genes", "genes_hgnc", "features", "articles", "trials",
        "variants", "vario_terms", "signatures", "chromosomes",
        "evidence_levels", "abstracts_aacr", "abstracts_asco", "anatomy",
        "refseqs", "abstracts", "curated", "statements", "edges", "sources")
      val counts = tables.map(t => ("table:" + t,
        store.read(t).map(_.count()).getOrElse(0L)))
      val summary = Seq(
        ("loaders:succeeded", r1.succeeded.size.toLong),
        ("rerun:succeeded", r2.succeeded.size.toLong),
        ("rerun:creates", creates(r2)),
        ("errors:total", errors(r1))) ++ counts
      summary.toDF("kind", "n").orderBy("kind")
    }),

    // G13 — Entrez composed pipeline (entrez/gene.js:56-121,
    // entrez/pubmed.js:44-62 fetchAndLoadByIds): the J9 anti-join + S15
    // batched fetch + F17 display name, against both recorded esummary
    // fixtures. The gene dim is pre-seeded with a cached id whose fetcher
    // THROWS if consulted — a broken anti-join fails the query rather
    // than silently refetching; both hydrates run twice (second pass
    // all-cached).
    "g13_entrez" -> ((s, dir) => {
      import s.implicits._
      val store = new core.PersistentGraphStore(s,
        scratchDir("g13"))
      val geneCols = Seq("biotype", "name", "displayName", "longName",
        "description", "url")
      val seed = Seq(("4869", "gene", "stub-npm1", "stub-npm1",
        null.asInstanceOf[String], null.asInstanceOf[String],
        null.asInstanceOf[String]))
        .toDF(("sourceId" +: geneCols): _*)
      store.merge("genes", seed, Seq("sourceId"), geneCols)
      val geneFetcher: Seq[String] => Seq[(String, String)] = ids => {
        require(!ids.contains("4869"), "anti-join must prune cached ids")
        sources.Entrez.fileFetcher(
          Map("3845" -> s"$REF_DATA/entrez_gene.3845.json"))(ids)
      }
      val pubmedFetcher = sources.Entrez.fileFetcher(
        Map("30016509" -> s"$REF_DATA/entrez_pubmed.30016509.json"))
      (1 to 2).foreach { _ =>
        sources.Entrez.hydrate(s, store, "genes", Seq("3845", "4869"),
          geneFetcher, sources.Entrez.parseGene(_), Seq("sourceId"), geneCols)
        sources.Entrez.hydrate(s, store, "articles", Seq("30016509"),
          pubmedFetcher, sources.Entrez.parsePubmed(_), Seq("sourceId"),
          Seq("name", "journalName", "year", "displayName"))
      }
      val genes = store.read("genes").get.select(lit("gene").as("kind"),
        col("sourceId").as("source_id"), col("name"),
        col("displayName").as("display_name"),
        lit(null).cast("long").as("year"), lit(null).cast("string").as("journal"))
      val arts = store.read("articles").get.select(lit("article").as("kind"),
        col("sourceId").as("source_id"), col("name"),
        col("displayName").as("display_name"),
        col("year").cast("long").as("year"), col("journalName").as("journal"))
      genes.unionByName(arts)
    }),

    // G12 — CIViC variant hydration (civic/variant.js:410-553) on the
    // real civic_variant.json fixture: name grammar → HGVS parse → vocab
    // term double-lookup (civic source preferred) → store upsert of the
    // variant and its gene reference; oracle re-derives the exon-mutation
    // normalization from the raw JSON.
    "g12_civic_variant" -> ((s, dir) => {
      import s.implicits._
      // the real fixture record + an rsID variant (the uploadVariant
      // exception path, civic/variant.js:508-522): the rsID routes to the
      // dbSNP loader — a CatalogueVariant + docsum ladder, NO gene
      // feature and NO category variant for it
      val fixture = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$REF_DATA/civic_variant.json")), "UTF-8")
      val rsRec = """{"id": 999, "entrez_name": "EGFR", "entrez_id": 1956,
        |"name": "RS121434568", "description": ""}""".stripMargin
      val tmp = java.io.File.createTempFile("graft-g12", ".json")
      tmp.deleteOnExit()
      java.nio.file.Files.write(tmp.toPath,
        s"[$fixture,\n$rsRec]".getBytes("UTF-8"))
      val path = tmp.getPath
      val store = new core.PersistentGraphStore(s,
        scratchDir("g12"))
      val vocab = Seq(
        ("mutation", "civic", "civic:mutation"),
        ("mutation", "sequence ontology", "so:mutation"),
        ("exon_variant", "sequence ontology", "so:exon_variant"),
        ("substitution", "sequence ontology", "so:substitution"))
        .toDF("name", "source", "term_id")
      val snpFixture = sources.Snp.fixturePath("/fixtures/entrez_snp.esummary.json")
      val rsidLoad = (ids: org.apache.spark.sql.Dataset[String]) =>
        sources.Snp.fetchAndLoad(s, store, ids,
          sources.Snp.rsFetcher(Map("121434568" -> snpFixture)),
          sources.Entrez.fileFetcher(Map(
            "NM_005228.5" -> s"$REF_DATA/entrez_refseq.NM_005228.5.json",
            "NP_005219.2" -> sources.Snp.fixturePath(
              "/fixtures/entrez_refseq.NP_005219.2.json"))),
          sources.Entrez.fileFetcher(Map(
            "1956" -> sources.Snp.fixturePath("/fixtures/entrez_gene.1956.json"))),
          vocab.select("name", "term_id"))
      sources.CivicVariants.load(s, store, path, vocab, rsidLoad = Some(rsidLoad))
      // idempotency pass (the rsID leg is a catalogue cache hit)
      sources.CivicVariants.load(s, store, path, vocab, rsidLoad = Some(rsidLoad))
      val feats = store.read("features").get
        .select(lit("feature:gene").as("kind"), col("sourceId").as("a"),
          col("name").as("b"))
      val vars = store.read("variants").get
      val vRows = vars.select(lit("variant").as("kind"),
        col("notation").as("a"), col("term").as("b"))
      val bRows = vars.filter(col("break1").isNotNull)
        .select(lit("variant:break1").as("kind"), col("notation").as("a"),
          col("break1").as("b"))
      val rsRows = store.read("catalogue_variants").get
        .select(lit("variant:rsid").as("kind"), col("name").as("a"),
          col("sourceId").as("b"))
      feats.unionByName(vRows).unionByName(bRows).unionByName(rsRows)
    }),

    // S7 (XLSX scan with super-header flattening, PMC4232638/index.js:
    // 24-60): a minimal OOXML workbook is written with the JDK zip inside
    // the query, then read back through the scan — fully self-contained.
    "s7_xlsx_scan" -> ((s, dir) => {
      val f = java.io.File.createTempFile("graft-s7", ".xlsx")
      val zos = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(f))
      def entry(name: String, content: String): Unit = {
        zos.putNextEntry(new java.util.zip.ZipEntry(name))
        zos.write(content.getBytes("UTF-8")); zos.closeEntry()
      }
      entry("[Content_Types].xml",
        """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>""")
      def cell(r: Int, c: Int, v: String) =
        if (v.isEmpty) ""
        else s"""<c r="${('A' + c).toChar}$r" t="inlineStr"><is><t>$v</t></is></c>"""
      val rows = Seq(
        Seq("Supplementary Table 2"),
        Seq("", "Functional categories for TP53", "", "Other"),
        Seq("Gene", "Gain of function", "Loss of function", ""),
        Seq("TP53", "yes", "no effect", "x"),
        Seq("KRAS", "----", "", "y"))
      val body = rows.zipWithIndex.map { case (r, ri) =>
        s"""<row r="${ri + 1}">${r.zipWithIndex.map { case (v, ci) => cell(ri + 1, ci, v) }.mkString}</row>"""
      }.mkString
      entry("xl/worksheets/sheet1.xml",
        s"""<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>$body</sheetData></worksheet>""")
      zos.close()
      sources.XlsxScan.df(s, f.getPath, superHeader = true)
        .select(col("Gene").as("gene"),
          col("`Functional categories for TP53 - Gain of function`").as("gof"),
          col("`Functional categories for TP53 - Loss of function`").as("lof"),
          col("Other").as("other"))
    }),

    // S12 (token pagination, clinicaltrialsgov/index.js:301-371): follow
    // nextPageToken until absent.
    "s12_token_scan" -> ((s, dir) => {
      import remote.Http._
      val pages = Map(
        "api/studies" ->
          """{"studies":[{"nctId":"NCT01","phase":"PHASE1"}],"nextPageToken":"t1"}""",
        "GET api/studies?pageToken=t1 " ->
          """{"studies":[{"nctId":"NCT02","phase":"PHASE2"},{"nctId":"NCT03","phase":"PHASE3"}]}""")
      def tokenOf(b: String): Option[String] =
        "\"nextPageToken\":\"([^\"]+)\"".r.findFirstMatchIn(b).map(_.group(1))
      val bodies = remote.Paginator.tokenPages(
        new FixtureClient(pages), "api/studies", tokenOf)
      remote.Paginator.toDF(s, bodies)
        .select(explode(col("studies")).as("st"))
        .select(col("st.nctId").as("nct_id"),
          functions.Scalars.normalizePhases(col("st.phase")).as("phase"))
    }),

    // S13 (numbered-page links, dgidb/index.js:48-86): each page names the
    // next request.
    "s13_link_scan" -> ((s, dir) => {
      import remote.Http._
      val pages = Map(
        "api/interactions?page=1" ->
          """{"items":[{"gene":"EGFR","drug":"erlotinib"}],"_meta":{"links":{"next":"api/interactions?page=2"}}}""",
        "api/interactions?page=2" ->
          """{"items":[{"gene":"ALK","drug":"crizotinib"}],"_meta":{"links":{}}}""")
      def nextOf(b: String): Option[String] =
        "\"next\":\"([^\"]+)\"".r.findFirstMatchIn(b).map(_.group(1))
      val bodies = remote.Paginator.linkPages(
        new FixtureClient(pages), "api/interactions?page=1", nextOf)
      remote.Paginator.toDF(s, bodies)
        .select(explode(col("items")).as("i"))
        .select(col("i.gene").as("gene"), col("i.drug").as("drug"))
    }),

    // S14 (solr offset paging by numFound, asco/index.js:72-92).
    "s14_solr_scan" -> ((s, dir) => {
      import remote.Http._
      val pages = Map(
        "GET api/abstracts?rows=2&start=0 " ->
          """{"numFound":5,"docs":[{"id":10},{"id":11}]}""",
        "GET api/abstracts?rows=2&start=2 " ->
          """{"numFound":5,"docs":[{"id":12},{"id":13}]}""",
        "GET api/abstracts?rows=2&start=4 " ->
          """{"numFound":5,"docs":[{"id":14}]}""")
      def numFound(b: String): Int =
        "\"numFound\":(\\d+)".r.findFirstMatchIn(b).get.group(1).toInt
      val bodies = remote.Paginator.solrPages(
        new FixtureClient(pages), "api/abstracts", 2, numFound)
      remote.Paginator.toDF(s, bodies)
        .select(explode(col("docs")).as("d"))
        .select(col("d.id").as("abstract_id"))
    }),

    // S15 (batched-ID fetch, entrez/util.js:269-303): ids repartitioned,
    // fetched in <=batchSize chunks per partition through a deterministic
    // fetcher (the offline stand-in for esummary).
    "s15_entrez_batch" -> ((s, dir) => {
      import s.implicits._
      val ids = t(s, dir, "customer").filter(col("c_custkey") % 37 === 0)
        .select(col("c_custkey").cast("string")).as[String]
      remote.EntrezBatch.fetchByIds(ids,
        batch => batch.map(id => (id, s"gene-record-$id")),
        batchSize = 10, parallelism = 2)
        .select(col("id").cast("long").as("custkey"), col("payload"))
    }),

    // J2 (the full 8-rung ontology preference ladder, graphkb.js:133-196)
    // over a fixture dimension with one discriminating pair per rung.
    "j2_preference_ladder" -> ((s, dir) => {
      import s.implicits._
      // (key, name, deprecated, alias, dependency, sourceIdVersion,
      //  sourceVersion, description, sourceRank)
      val candidates = Seq(
        ("r1", "keep", false, false, null, null, null, "d", 1),
        ("r1", "drop", true, false, null, null, null, "d", 1),
        ("r2", "keep", false, false, null, null, null, "d", 1),
        ("r2", "drop", false, true, null, null, null, "d", 1),
        ("r3", "keep", false, false, null, null, null, "d", 1),
        ("r3", "drop", false, false, "dep", null, null, "d", 1),
        ("r4", "keep", false, false, null, null, null, "d", 1),
        ("r4", "drop", false, false, null, "2020", null, "d", 1),
        // reference behavior: the OLDER sourceIdVersion / source.version
        // wins (its code compares ascending despite the "prefer newer"
        // comment — pinned by its jest corpus)
        ("r5", "keep", false, false, null, "2020", null, "d", 1),
        ("r5", "drop", false, false, null, "2021", null, "d", 1),
        ("r6", "keep", false, false, null, null, "8", "d", 1),
        ("r6", "drop", false, false, null, null, "9", "d", 1),
        ("r7", "keep", false, false, null, null, null, "d", 1),
        ("r7", "drop", false, false, null, null, null, null, 1),
        ("r8", "keep", false, false, null, null, null, "d", 1),
        ("r8", "drop", false, false, null, null, null, "d", 2))
        .toDF("k", "name", "deprecated", "alias", "dependency",
          "sourceIdVersion", "sourceVersion", "description", "sourceRank")
      val lookups = candidates.select(col("k").as("rung")).distinct()
      val pref = core.Resolver.ontologyPreference(
        sourceVersion = col("sourceVersion")) :+ col("name").asc
      core.Resolver.resolveUnique(lookups, "rung",
        broadcast(candidates.withColumnRenamed("k", "ck")), "ck", pref)
        .resolved.select(col("rung"), col("name").as("winner"))
    }),

    // S10 (offset-paginated REST scan, graphkb.js:341-372) driven through
    // the full remote stack — fixture transport (the reference's recorded-
    // request test style), retry client, cache — then pages → DataFrame.
    "s10_paginated_scan" -> ((s, dir) => {
      import remote.Http._
      val pages = Map(
        "GET api/records?limit=2&skip=0 " ->
          """{"result":[{"id":1,"name":"alpha"},{"id":2,"name":"beta"}]}""",
        "GET api/records?limit=2&skip=2 " ->
          """{"result":[{"id":3,"name":"gamma"}]}""")
      val client = new CachingClient(new RetryingClient(
        new FixtureClient(pages, failures = Seq(Response(429, "rate"))),
        sleeper = _ => ()))
      val bodies = remote.Paginator.offsetPages(client, "api/records",
        limit = 2, b => "\"id\":".r.findAllIn(b).length)
      remote.Paginator.toDF(s, bodies)
        .select(explode(col("result")).as("r"))
        .select(col("r.id").as("id"), col("r.name").as("name"))
    }),

    // S11 (GraphQL cursor pagination, civic/evidenceItem.js:28-53): follow
    // endCursor while hasNextPage through the fixture transport.
    "s11_cursor_scan" -> ((s, dir) => {
      import remote.Http._
      val pages = Map(
        "api/evidence" ->
          """{"nodes":[{"id":1,"status":"ACCEPTED"},{"id":2,"status":"SUBMITTED"}],"endCursor":"c1","hasNextPage":true}""",
        "GET api/evidence?after=c1 " ->
          """{"nodes":[{"id":3,"status":"ACCEPTED"}],"endCursor":"c2","hasNextPage":false}""")
      def cursorOf(b: String): Option[String] =
        if (b.contains("\"hasNextPage\":true"))
          "\"endCursor\":\"([^\"]+)\"".r.findFirstMatchIn(b).map(_.group(1))
        else None
      val bodies = remote.Paginator.cursorPages(
        new FixtureClient(pages), "api/evidence", cursorOf)
      remote.Paginator.toDF(s, bodies)
        .select(explode(col("nodes")).as("n"))
        .select(col("n.id").as("id"), col("n.status").as("status"))
    }),

    // S17 (HTML scrape: link harvest + text + consensus year,
    // fdaApprovals/index.js:13-105).
    "s17_html_scrape" -> ((s, dir) => {
      import s.implicits._
      val docs = Seq(
        (1L, """<html><body><a href="/news/2021/x">FDA approves X</a>
               |<p>Approved 2021; filed 2019; again 2021.</p></body></html>""".stripMargin),
        (2L, """<div><a href="/about">about</a><p>no years here</p></div>"""))
      s.createDataset(docs).map { case (id, html) =>
        (id, remote.Scrape.links(html, containing = "news").length.toLong,
          remote.Scrape.consensusYear(html).map(_.toLong),
          remote.Scrape.text(html).length.toLong)
      }.toDF("page_id", "n_news_links", "year", "text_len")
    }),

    // F1 (HGVS variant-notation parser — SURVEY §2.8, the reference's
    // graphkb-parser): parse a fixture corpus covering every grammar branch
    // into the flat upsert-key shape of graphkb.js:631-660. The oracle is a
    // frozen literal-VALUES table (generated once from the parser, then
    // pinned) so regressions fail the DuckDB compare. At scale the parser
    // runs inside Dataset.map over notation columns — pure function, no
    // shuffle, fully distributed.
    "f1_hgvs_parse" -> ((s, dir) => {
      import s.implicits._
      s.createDataset(variant.F1Corpus.notations)
        .map(variant.HgvsParser.flat)
        .toDF()
    }),

    // X1 (molecular-profile boolean expression → DNF condition sets,
    // civic/profile.js:19-255): recursive parse + implicit-or
    // disambiguation inside flatMap — one row in, N condition sets out.
    "x1_dnf" -> ((s, dir) => {
      import s.implicits._
      val names = Map(1L -> "V600E", 2L -> "T790M", 3L -> "AMP",
        4L -> "DEL", 5L -> "Q157P/R")
      val exprs = Seq(
        (1L, "1 AND 2"), (2L, "1 OR 2"), (3L, "1 AND ( 2 OR 3 )"),
        (4L, "( 1 AND 2 ) OR ( 3 AND 4 )"),
        (5L, "1 AND ( 2 OR ( 3 AND 4 ) )"), (6L, "5 AND 2"))
      s.createDataset(exprs).flatMap { case (eid, expr) =>
        variant.ProfileDnf.expand(expr, names).zipWithIndex.map {
          case (set, i) => (eid, i.toLong, set.map(_.name).mkString("+"))
        }
      }.toDF("expr_id", "set_id", "variants")
    }),

    // X2 (conditions × therapies cartesian, civic/evidenceItem.js:237-264):
    // collect both sets per entity then double-explode — one shuffle, then
    // narrow generators.
    "x2_cartesian" -> ((s, dir) => {
      t(s, dir, "lineitem").filter(col("l_orderkey") % 97 === 0)
        .groupBy(col("l_orderkey").as("order_id"))
        .agg(collect_set(col("l_linenumber")).as("conditions"),
          collect_set(col("l_returnflag")).as("therapies"))
        .select(col("order_id"), explode(col("conditions")).as("condition"),
          col("therapies"))
        .select(col("order_id"), col("condition"),
          explode(col("therapies")).as("therapy"))
    }),

    // X3 (therapy grouping by interaction type, civic/therapy.js:19-50):
    // SUBSTITUTES → one group per therapy; COMBINATION/SEQUENTIAL → a
    // single group of all, canonicalized by sort (T4).
    "x3_therapy_groups" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val li = t(s, dir, "lineitem").filter(col("l_orderkey") % 97 === 0)
      val isCombo = col("o_orderpriority").like("1-%") ||
        col("o_orderpriority").like("2-%")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderpriority"))
        .agg(sort_array(collect_set(col("l_suppkey"))).as("ts"))
        .select(
          col("l_orderkey").as("order_id"),
          when(isCombo, lit("COMBINATION")).otherwise(lit("SUBSTITUTES"))
            .as("interaction"),
          explode(when(isCombo,
            array(concat_ws("+",
              expr("transform(ts, x -> CAST(x AS STRING))"))))
            .otherwise(expr("transform(ts, x -> CAST(x AS STRING))")))
            .as("therapy_group"))
    }),

    // X4 (CGI multi-variant biomarker expansion,
    // cancergenomeinterpreter/index.js:122-189) via variant.Biomarkers.
    "x4_biomarker_expand" -> ((s, dir) => {
      import s.implicits._
      val rows = Seq(
        (1L, "KRAS (G12,G13)", "MUT", ""),
        (2L, "EGFR exon 19 deletions", "DEL", ""),
        (3L, "BCR-ABL1 fusion", "FUS", ""),
        (4L, "KRAS (G12,G13) + TP53 oncogenic mutation", "MUT", ""),
        (5L, "whatever", "MUT", "KRAS:G12D"),
        (6L, "EGFR (746-750)", "DEL", ""))
      s.createDataset(rows).flatMap { case (id, bio, cls, prot) =>
        variant.Biomarkers.expand(bio, cls, prot).zipWithIndex.map {
          case (set, i) => (id, i.toLong, set.mkString(" & "))
        }
      }.toDF("rec_id", "combo_id", "variants")
    }),

    // X5 (statement-per-drug explode of a delimited list,
    // oncokb/index.js:563-580).
    "x5_per_drug" -> ((s, dir) => {
      t(s, dir, "part").filter(col("p_partkey") % 11 === 0)
        .select(col("p_partkey").as("part_id"),
          explode(split(col("p_type"), " ")).as("drug"))
    }),

    // X6 (two statements per annotation — mutation-effect with the gene
    // subject + oncogenicity with the variant subject,
    // oncokb/index.js:583-609).
    "x6_two_statements" -> ((s, dir) => {
      t(s, dir, "orders").filter(col("o_orderkey") % 199 === 0)
        .select(col("o_orderkey").as("order_id"), explode(array(
          struct(lit("mutation-effect").as("stmt_type"),
            col("o_custkey").cast("string").as("subject")),
          struct(lit("oncogenicity").as("stmt_type"),
            col("o_orderkey").cast("string").as("subject")))).as("s"))
        .select(col("order_id"), col("s.stmt_type"), col("s.subject"))
    }),

    // X7 (one statement per applicable relevance term,
    // moa/index.js:519-553).
    "x7_per_relevance" -> ((s, dir) => {
      t(s, dir, "orders").filter(col("o_orderkey") % 101 === 0)
        .select(col("o_orderkey").as("order_id"), explode(
          when(col("o_orderstatus") === "F",
            array(lit("sensitivity"), lit("resistance")))
            .when(col("o_orderstatus") === "O", array(lit("sensitivity")))
            .otherwise(array(lit("prognosis")))).as("relevance"))
    }),

    // X8 (variant-form ladder: genomic→cds→protein rows chained by Infers
    // edges, moa/index.js:48-188): build the present forms, posexplode,
    // parent = previous present form.
    "x8_variant_ladder" -> ((s, dir) => {
      import s.implicits._
      val rows = Seq(
        (1L, "KRAS", "g.1A>T", "c.2B>C", "p.G12D"),
        (2L, "EGFR", null, "c.2573T>G", "p.L858R"),
        (3L, "ALK", null, null, "p.F1174L"))
      s.createDataset(rows).toDF("rec_id", "gene", "genomic", "cds", "protein")
        .withColumn("arr", expr(
          """filter(array(
            |  struct('genomic' AS form, genomic AS notation),
            |  struct('cds' AS form, cds AS notation),
            |  struct('protein' AS form, protein AS notation)),
            |x -> x.notation IS NOT NULL)""".stripMargin))
        .select(col("rec_id"), col("gene"), col("arr"),
          posexplode(col("arr")).as(Seq("pos", "v")))
        .select(col("rec_id"), col("v.form").as("form"),
          concat(col("gene"), lit(":"), col("v.notation")).as("notation"),
          when(col("pos") > 0, element_at(col("arr"), col("pos"))("form"))
            .as("infers_parent"))
    }),

    // X9 (alias/synonym explosion → one alias row per synonym,
    // ncit/index.js:391-432).
    "x9_alias_explode" -> ((s, dir) => {
      t(s, dir, "part").filter(col("p_partkey") % 11 === 0)
        .select(col("p_partkey").as("part_id"),
          explode(array_distinct(array(col("p_brand"), col("p_type"),
            col("p_size").cast("string")))).as("alias"))
    }),

    // J4 (therapy lookup with plural fallback, graphkb.js:427-478): direct
    // name join, misses retry on the inhibitor↔inhibitors swapped term.
    "j4_plural_fallback" -> ((s, dir) => {
      val p = t(s, dir, "part")
      val dim = p.groupBy(
        concat(lower(col("p_type")),
          when(col("p_size") % 2 === 0, lit(" inhibitor"))
            .otherwise(lit(" inhibitors"))).as("name"))
        .agg(min(col("p_partkey")).as("therapy_id"))
      val lookups = p.filter(col("p_partkey") % 13 === 0)
        .select(concat(lower(col("p_type")), lit(" inhibitor")).as("term"))
      core.Resolver.resolveWithFallback(
        lookups, "term", core.Resolver.pluralSwap, broadcast(dim), "name")
        .select(col("term"), col("therapy_id"), col("via_fallback"))
    }),

    // J5 (vocabulary term lookup by sourceId + source-name subquery filter,
    // graphkb.js:484-498): broadcast dim join.
    "j5_vocab_lookup" -> ((s, dir) => {
      val vocab = t(s, dir, "nation")
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "AMERICA")
        .select(col("n_nationkey").as("term_sid"), col("n_name").as("term"))
      t(s, dir, "customer").filter(col("c_custkey") % 31 === 0)
        .join(broadcast(vocab), col("c_nationkey") === col("term_sid"), "left")
        .select(col("c_custkey"), col("term"))
    }),

    // J6 (therapy-combination resolution, graphkb.js:673-713 +
    // civic/therapy.js:145-194): split the combo, resolve each element
    // against the dim, regroup with canonical sourceId/name sort.
    "j6_therapy_combo" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").filter(col("l_orderkey") % 251 === 0)
      val p = t(s, dir, "part")
      val dim = p.groupBy(lower(col("p_type")).as("elem_name"))
        .agg(min(col("p_partkey")).as("elem_id"))
      val w = Window.partitionBy(col("l_orderkey")).orderBy(col("l_linenumber"))
      val elems = li.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
        .join(p, Seq("l_partkey") zip Seq("p_partkey") map { case (a, b) =>
          col(a) === col(b) } reduce (_ && _))
        .select(col("l_orderkey").as("order_id"), lower(col("p_type")).as("elem_name"))
        .join(broadcast(dim), Seq("elem_name"))
      elems.groupBy(col("order_id"))
        .agg(
          concat_ws(" + ", sort_array(collect_list(col("elem_id")))).as("combo_source_id"),
          concat_ws(" + ", sort_array(collect_list(col("elem_name")))).as("combo_name"),
          count(lit(1)).as("n_elems"))
        .filter(col("n_elems") === 2)
        .drop("n_elems")
    }),

    // J7 (disease resolution by id else name, civic/disease.js:13-37):
    // two-stage left join + coalesce.
    "j7_coalesce_resolve" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val lookups = t(s, dir, "orders").filter(col("o_orderkey") % 41 === 0)
        .join(c, col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"),
          when(col("o_orderkey") % 2 === 0, col("o_custkey")).as("cust_id"),
          col("c_name").as("cust_name"))
      val byId = c.select(col("c_custkey").as("id_key"))
      val byName = c.select(col("c_custkey").as("name_key"), col("c_name").as("nm"))
      lookups
        .join(broadcast(byId), col("cust_id") === col("id_key"), "left")
        .join(broadcast(byName), col("cust_name") === col("nm"), "left")
        .select(col("o_orderkey"),
          coalesce(col("id_key"), col("name_key")).as("resolved_custkey"),
          when(col("id_key").isNotNull, lit("id")).otherwise(lit("name")).as("via"))
    }),

    // J8 (cascading mapping+clean joins, cosmic/resistance.js:211-266,
    // cancergenomeinterpreter/index.js:46-58): exact → case-cleaned →
    // mapping-table rewrite, first hit wins.
    "j8_cascade_resolve" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val lookups = t(s, dir, "orders").filter(col("o_orderkey") % 43 === 0)
        .join(c, col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"),
          when(col("o_orderkey") % 3 === 0, col("c_name"))
            .when(col("o_orderkey") % 3 === 1, upper(col("c_name")))
            .otherwise(regexp_replace(col("c_name"), "Customer#", "CUST-"))
            .as("term"))
      val dim = c.select(col("c_custkey").as("dim_key"), col("c_name").as("dim_name"))
      val s1 = broadcast(dim.withColumnRenamed("dim_key", "k1")
        .withColumnRenamed("dim_name", "n1"))
      val s2 = broadcast(dim.withColumnRenamed("dim_key", "k2")
        .withColumnRenamed("dim_name", "n2"))
      val s3 = broadcast(dim.withColumnRenamed("dim_key", "k3")
        .withColumnRenamed("dim_name", "n3"))
      lookups
        .join(s1, col("term") === col("n1"), "left")
        .join(s2, lower(col("term")) === lower(col("n2")), "left")
        .join(s3, regexp_replace(col("term"), "CUST-", "Customer#") === col("n3"), "left")
        .select(col("o_orderkey"),
          coalesce(col("k1"), col("k2"), col("k3")).as("resolved_custkey"),
          when(col("k1").isNotNull, lit(1))
            .when(col("k2").isNotNull, lit(2))
            .when(col("k3").isNotNull, lit(3)).as("stage"))
    }),

    // J9 (Entrez dimension pattern, entrez/util.js:269-303): anti-join the
    // preloaded dim for misses, "fetch" them (from the full table standing
    // in for the remote API), union into the dim, re-join.
    "j9_fetch_union" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val dim0 = c.filter(col("c_custkey") % 2 === 0)
        .select(col("c_custkey").as("key"), col("c_name").as("name"))
      val lookups = t(s, dir, "orders").filter(col("o_orderkey") % 61 === 0)
        .select(col("o_custkey").as("key")).distinct()
      val missing = lookups.join(dim0, Seq("key"), "left_anti")
      val fetched = missing.join(
        c.select(col("c_custkey").as("key"), col("c_name").as("name")), Seq("key"))
        .withColumn("fetched", lit(true))
      val dim = dim0.withColumn("fetched", lit(false)).unionByName(fetched)
      lookups.join(dim, Seq("key"))
        .select(col("key").as("custkey"), col("name"), col("fetched"))
    }),

    // J10 (feature lookup by (biotype, sourceId), moa/index.js:63-75):
    // typed dimension union + broadcast join on the composite key.
    "j10_biotype_lookup" -> ((s, dir) => {
      val dim = t(s, dir, "nation")
        .select(lit("nation").as("biotype"), col("n_nationkey").as("sid"),
          col("n_name").as("feature_name"))
        .unionByName(t(s, dir, "region")
          .select(lit("region").as("biotype"), col("r_regionkey").as("sid"),
            col("r_name").as("feature_name")))
      t(s, dir, "customer").filter(col("c_custkey") % 17 === 0)
        .select(col("c_custkey"), lit("nation").as("biotype"),
          col("c_nationkey").as("sid"))
        .join(broadcast(dim), Seq("biotype", "sid"))
        .select(col("c_custkey"), col("feature_name"))
    }),

    // A2 (recurrence threshold + specificity suppression,
    // cosmic/fusions.js:143-226): three specificity levels, distinct-sample
    // count >= 3, a passing specific group suppresses its less-specific
    // projections via left_anti.
    "a2_recurrence" -> ((s, dir) => {
      // all three specificity levels from ONE scan via rollup + grouping_id
      // (0 = (p,rf,ls), 1 = (p,rf), 3 = (p); grand total dropped), then the
      // suppression rule ("a passing specific group blocks its projections")
      // as window counts over the rollup output — no anti-joins, no second
      // scan, no recompute. The old shape scanned lineitem three times.
      val li = t(s, dir, "lineitem")
      val levels = li
        .rollup(col("l_partkey"), col("l_returnflag"), col("l_linestatus"))
        .agg(countDistinct(col("l_orderkey")).as("n_samples"),
          grouping_id().as("gid"))
        .filter(col("n_samples") >= 3 && col("gid") < 7 &&
          col("l_partkey").isNotNull)
      val wPrf = Window.partitionBy(col("l_partkey"), col("l_returnflag"))
      val wP = Window.partitionBy(col("l_partkey"))
      val flagged = levels
        .withColumn("n0_prf", count(when(col("gid") === 0, 1)).over(wPrf))
        .withColumn("n0_p", count(when(col("gid") === 0, 1)).over(wP))
        .withColumn("n1_p", count(when(col("gid") === 1, 1)).over(wP))
      flagged.filter(
        col("gid") === 0 ||
          (col("gid") === 1 && col("n0_prf") === 0) ||
          (col("gid") === 3 && col("n0_p") === 0 && col("n1_p") === 0))
        .select(
          when(col("gid") === 0, 0).when(col("gid") === 1, 1).otherwise(2)
            .as("level"),
          col("l_partkey"),
          when(col("gid") <= 1, col("l_returnflag")).as("disease"),
          when(col("gid") === 0, col("l_linestatus")).as("status"),
          col("n_samples"))
    }),

    // A4 (dup collapse by fill score, asco/index.js:41-69): per key keep
    // the most-filled record, deterministic tiebreak.
    "a4_fill_collapse" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val fill = (col("o_orderstatus") =!= "P").cast("int") +
        (col("o_orderpriority") =!= "3-MEDIUM").cast("int")
      val w = Window.partitionBy(col("o_custkey"), year(col("o_orderdate")))
        .orderBy(col("fill").desc, col("o_orderkey").asc)
      o.withColumn("fill", fill)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), year(col("o_orderdate")).cast("long").as("order_year"),
          col("o_orderkey").as("picked_orderkey"), col("fill").cast("long").as("fill"))
    }),

    // A5 (name-collision resolution, ncit/index.js:221-308): group by
    // normalized name, resolve to the unique best member else reject.
    "a5_name_collision" -> ((s, dir) => {
      val c = t(s, dir, "customer")
        .withColumn("name", concat(lit("cust-"), col("c_custkey") % 500))
      val withMax = c.withColumn("mx",
        max(col("c_acctbal")).over(Window.partitionBy(col("name"))))
      withMax.groupBy(col("name"))
        .agg(count(lit(1)).as("n_members"),
          count(when(col("c_acctbal") === col("mx"), 1)).as("n_win"),
          min(when(col("c_acctbal") === col("mx"), col("c_custkey"))).as("winner"))
        .select(col("name"), col("n_members"),
          when(col("n_win") === 1, col("winner")).as("resolved_custkey"),
          (col("n_win") === 1).as("resolved"))
    }),

    // A6 (multi-version ontology fold, oncotree/index.js:72-175): versions
    // oldest→latest, first-seen code wins, history chained.
    "a6_version_fold" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(year(col("o_orderdate")).asc, col("o_orderkey").asc)
      o.withColumn("rn", row_number().over(w))
        .groupBy(col("o_custkey"))
        .agg(
          min(year(col("o_orderdate"))).cast("long").as("first_year"),
          max(year(col("o_orderdate"))).cast("long").as("last_year"),
          countDistinct(year(col("o_orderdate"))).as("n_years"),
          min(when(col("rn") === 1, col("o_orderkey"))).as("first_orderkey"))
    }),

    // A9 (pivot-ish column scan, PMC4468049/index.js:95-105): find which
    // column of a fixed set matches the target value.
    "a9_column_scan" -> ((s, dir) => {
      t(s, dir, "lineitem").filter(col("l_orderkey") % 89 === 0)
        .select(col("l_orderkey"), col("l_linenumber"),
          when(round(col("l_quantity")).cast("long") === col("l_linenumber"), lit("l_quantity"))
            .when(round(col("l_discount") * 100).cast("long") === col("l_linenumber"), lit("l_discount"))
            .when(round(col("l_tax") * 100).cast("long") === col("l_linenumber"), lit("l_tax"))
            .as("matching_col"))
    }),

    // F5 (genomic HGVS composer, moa/index.js:19-45).
    "f5_genomic_compose" -> ((s, dir) => {
      import s.implicits._
      val rows = Seq(
        (1L, "A", "T", 100L, 100L), (2L, "-", "TT", 100L, 101L),
        (3L, "GG", "-", 100L, 101L), (4L, "G", "-", 100L, 100L),
        (5L, "AA", "TT", 100L, 100L), (6L, "AA", "T", 100L, 101L))
      rows.toDF("rec_id", "ref", "alt", "start_pos", "end_pos")
        .select(col("rec_id"), functions.Scalars.composeGenomicHgvs(
          col("ref"), col("alt"), col("start_pos"), col("end_pos")).as("hgvs_g"))
    }),

    // F6 (relevance translation, civic/relevance.js:11-333): full decision
    // tree as a broadcast dimension; unsupported combos → null (error
    // side-channel).
    "f6_relevance" -> ((s, dir) => {
      import s.implicits._
      val inputs = (functions.Relevance.table.map(_._1) ++ Seq(
        ("SUPPORTS", "DIAGNOSTIC", "NA"),
        ("DOES_NOT_SUPPORT", "PROGNOSTIC", "BETTER_OUTCOME")))
        .zipWithIndex.map { case ((d, ty, sg), i) => (i.toLong, d, ty, sg) }
      inputs.toDF("case_id", "direction", "evidence_type", "significance")
        .join(broadcast(functions.Relevance.dimension(s)),
          Seq("direction", "evidence_type", "significance"), "left")
        .select(col("case_id"), col("direction"), col("evidence_type"),
          col("significance"), col("relevance"))
    }),

    // F7 (evidence level → relevance regex, oncokb/index.js:555-562).
    "f7_level_relevance" -> ((s, dir) => {
      import s.implicits._
      Seq((1L, "R1"), (2L, "r2"), (3L, "1"), (4L, "2A"), (5L, "3b"), (6L, "X9"))
        .toDF("case_id", "level")
        .select(col("case_id"), col("level"),
          functions.Scalars.levelToRelevance(col("level")).as("relevance"))
    }),

    // F8 (name cleaning: squash/plural/locale folds).
    "f8_name_clean" -> ((s, dir) => {
      import s.implicits._
      Seq((1L, "  EGFR   Inhibitors  "), (2L, "acute lymphoblastic leukaemia"),
        (3L, "MEK\tinhibitor"), (4L, "Trametinib"))
        .toDF("case_id", "raw")
        .select(col("case_id"), functions.Scalars.cleanName(col("raw")).as("cleaned"))
    }),

    // F9 (title matching, civic/publication.js:17-21).
    "f9_title_match" -> ((s, dir) => {
      import s.implicits._
      Seq((1L, "The Title.", "the title"), (2L, "A <i>Gene</i> Study", "a gene study"),
        (3L, "Different", "titles"))
        .toDF("case_id", "title_a", "title_b")
        .select(col("case_id"),
          (functions.Scalars.titleNorm(col("title_a")) ===
            functions.Scalars.titleNorm(col("title_b"))).as("matches"))
    }),

    // F10 (abstract citation parse, oncokb/index.js:389-397).
    "f10_citation_parse" -> ((s, dir) => {
      import s.implicits._
      val df = Seq((1L, "Abstract# 8001, ASCO 2014"), (2L, "abstract 102, AACR 2020"))
        .toDF("case_id", "citation")
      df.select(col("case_id") +: functions.Scalars.citationFields(col("citation")): _*)
    }),

    // F11 (id parsing: DOID urls, versioned ids).
    "f11_id_parse" -> ((s, dir) => {
      import s.implicits._
      Seq((1L, "http://purl.obolibrary.org/obo/DOID_8718", "ENSG00000139618.17"),
        (2L, "http://purl.obolibrary.org/obo/doid_14566", "NM_005228.5"),
        (3L, "not-a-doid", "NP_008819"))
        .toDF("case_id", "url", "vid")
        .select(col("case_id"),
          functions.Scalars.doidFromUrl(col("url")).as("doid"),
          functions.Scalars.versionedIdBase(col("vid")).as("base_id"),
          functions.Scalars.versionedIdVersion(col("vid")).as("id_version"))
    }),

    // F12 (phase normalization, clinicaltrialsgov/index.js:92-110).
    "f12_phase_norm" -> ((s, dir) => {
      import s.implicits._
      Seq((1L, "PHASE1/EARLY_PHASE1,NA"), (2L, "PHASE2,PHASE1"), (3L, "PHASE3"),
        (4L, "NA"))
        .toDF("case_id", "raw_phase")
        .select(col("case_id"),
          functions.Scalars.normalizePhases(col("raw_phase")).as("phase"))
    }),

    // F14 (species detection, ncit/index.js:141-166).
    "f14_species" -> ((s, dir) => {
      import s.implicits._
      Seq((1L, "Mouse Tp53"), (2L, "murine model antigen"), (3L, "TP53 human"),
        (4L, "stratum"))
        .toDF("case_id", "name")
        .select(col("case_id"),
          functions.Scalars.nonHumanSpecies(col("name")).as("non_human"))
    }),

    // F17 (display-name builders) over real rows — oracle recomputes.
    "f17_display_name" -> ((s, dir) => {
      t(s, dir, "part").filter(col("p_partkey") % 23 === 0)
        .select(col("p_partkey"),
          functions.Scalars.nameWithSourceId(col("p_name"), col("p_brand"))
            .as("display_name"),
          functions.Scalars.pmidDisplay(col("p_partkey")).as("pmid_style"))
    }),

    // T3 (version sort): numeric-run padded sort key makes lexicographic
    // order match component-wise numeric order.
    "t3_version_sort" -> ((s, dir) => {
      import s.implicits._
      val w = Window.orderBy(col("sort_key").asc, col("version").asc)
      Seq((1L, "NM_005228.5"), (2L, "NM_005228.10"), (3L, "v1.2.10"),
        (4L, "v1.10.2"), (5L, "2018-04-27"), (6L, "2018-4-5"))
        .toDF("case_id", "version")
        .withColumn("sort_key", functions.Scalars.versionSortKey(col("version")))
        .withColumn("pos", row_number().over(w).cast("long"))
        .select(col("case_id"), col("version"), col("pos"))
    }),

    // P5 (deprecation filter via array_intersect, ncit/index.js:55-58).
    "p5_deprecation_filter" -> ((s, dir) => {
      t(s, dir, "part").filter(col("p_partkey") % 19 === 0)
        .withColumn("subsets", split(col("p_type"), " "))
        .filter(size(array_intersect(col("subsets"),
          array(lit("BRUSHED"), lit("ANODIZED")))) === 0)
        .select(col("p_partkey"), col("p_type"))
    }),

    // P6 (None/''→null normalization, moa/index.js:489-515).
    "p6_null_normalize" -> ((s, dir) => {
      t(s, dir, "part").filter(col("p_partkey") % 19 === 0)
        .withColumn("raw",
          when(col("p_size") % 3 === 0, lit("None"))
            .when(col("p_size") % 3 === 1, lit(""))
            .otherwise(col("p_brand")))
        .select(col("p_partkey"),
          nullif(nullif(trim(col("raw")), lit("None")), lit("")).as("cleaned"))
    }),

    // P9 (jsonpath extraction from a JSON string column, util.js:210).
    "p9_jsonpath" -> ((s, dir) => {
      t(s, dir, "events").filter(col("event_id") % 97 === 0)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
    }),

    // §2.7 union + dedupe (unionByName + dropDuplicates,
    // civic/evidenceItem.js:67-92).
    "set_union_dedup" -> ((s, dir) => {
      t(s, dir, "customer").filter(col("c_custkey") % 2 === 0)
        .select(col("c_custkey").as("key"))
        .unionByName(t(s, dir, "orders").filter(col("o_orderkey") % 3 === 0)
          .select(col("o_custkey").as("key")))
        .dropDuplicates()
    }),

    // J3 (record → filter-tree join keys, graphkb.js:114-123): an
    // AND/OR tree compiled to one Column predicate — pushed into the scan
    // like any native filter.
    "j3_filter_tree" -> ((s, dir) => {
      import core.Filters._
      val tree = Or(Seq(
        fromRecord(Map("c_mktsegment" -> "BUILDING", "c_nationkey" -> 5)),
        And(Seq(Eq("c_mktsegment", "MACHINERY"), In("c_nationkey", Seq(1, 2, 3))))))
      t(s, dir, "customer").filter(compile(tree))
        .select(col("c_custkey"), col("c_mktsegment"), col("c_nationkey"))
    }),

    // J14 (JSON-struct equality join key, civic/statement.js:14-16): match
    // records on (sorted condition set, subject) — the struct key is the
    // join key, serialization stays engine-internal.
    "j14_struct_key" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      def contentKey(filterExpr: Column) = li.filter(filterExpr)
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderkey"), col("o_custkey"))
        .agg(sort_array(collect_set(col("l_partkey"))).as("conditions"))
      val incoming = contentKey(col("l_orderkey") % 2 === 0)
        .select(col("o_orderkey").as("iid"), col("o_custkey").as("subject"),
          col("conditions"))
      val existing = contentKey(col("l_orderkey") % 3 === 0)
        .select(col("o_orderkey").as("eid"), col("o_custkey").as("subject"),
          col("conditions"))
      incoming.join(existing, Seq("subject", "conditions"))
        .filter(col("iid") =!= col("eid"))
        .select(col("iid"), col("eid"), col("subject"))
    }),

    // P4 (spec-validation split: valid side) — named Column rules, one
    // codegen'd pass.
    "p4_validation_split" -> ((s, dir) => {
      val rules = Seq(
        "max_price" -> (col("o_totalprice") <= 150000),
        "not_urgent" -> (col("o_orderpriority") =!= "1-URGENT"))
      core.Specs.validate(
        t(s, dir, "orders").filter(col("o_orderkey") % 29 === 0), rules)
        .valid.select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
    }),

    // K10 (error side-channel): the invalid rows land in a parquet error
    // sink with their violated-rule list; the query output is the sink
    // read back off disk.
    "k10_error_sink" -> ((s, dir) => {
      val rules = Seq(
        "max_price" -> (col("o_totalprice") <= 150000),
        "not_urgent" -> (col("o_orderpriority") =!= "1-URGENT"))
      val v = core.Specs.validate(
        t(s, dir, "orders").filter(col("o_orderkey") % 29 === 0), rules)
      val sink = scratchDir("k10") + "/errors"
      core.Specs.writeErrors(
        v.errors.select(col("o_orderkey"), col("violations")), sink)
      s.read.parquet(sink)
        .select(col("o_orderkey"), concat_ws(",", col("violations")).as("violations"))
    }),

    // K5 (edge upsert through the PERSISTENT store): seed the edge table,
    // upsert a second batch (anti-join dedup on (out,in,edgeClass)), read
    // the final state back OFF DISK — the query output is the durable edge
    // set, so the oracle checks store round-trip + merge semantics.
    "k5_edge_upsert" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val existing = li.filter(col("l_orderkey") % 3 === 0)
        .select(col("l_orderkey").as("out"), col("l_partkey").as("in"),
          lit("contains").as("edgeClass")).dropDuplicates()
      val candidates = li.filter(col("l_orderkey") % 2 === 0)
        .select(col("l_orderkey").as("out"), col("l_partkey").as("in"),
          lit("contains").as("edgeClass")).dropDuplicates()
      val store = new core.PersistentGraphStore(s,
        scratchDir("k5"))
      store.write("edges", existing, store.EdgeKey)
      store.upsertEdges(candidates)
      store.read("edges").get
        .select(col("out"), col("in"), col("edgeClass").as("edge_class"))
    }),

    // K7 (source-dimension upsert keyed by name, graphkb.js:614-624):
    // two successive merges through the persistent store; output is the
    // final dimension state read back from parquet.
    "k7_source_upsert" -> ((s, dir) => {
      val sup = t(s, dir, "supplier")
      val target = sup.filter(col("s_suppkey") % 2 === 0).select(
        col("s_name").as("name"), col("s_nationkey").as("nation"),
        col("s_acctbal").as("bal"))
      val updates = sup.filter(col("s_suppkey") % 3 === 0).select(
        col("s_name").as("name"), col("s_nationkey").as("nation"),
        when(col("s_suppkey") % 5 === 0, col("s_acctbal") + 1.0)
          .otherwise(col("s_acctbal")).as("bal"))
      val store = new core.PersistentGraphStore(s,
        scratchDir("k7"))
      store.upsertSource(target)
      store.upsertSource(updates)
      store.read("sources").get.select("name", "nation", "bal")
    }),

    // K8 (null-padded composite upsert key): a nullable column participates in
    // the unique key via null-safe equality — (id, NULL) matches (id, NULL)
    // instead of never-matching (graphkb.js:631-660 pads variant keys with
    // explicit nulls for exactly this).
    "k8_nullkey_upsert" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val nkey = nullif(col("o_orderstatus"), lit("P"))
      val target = o.filter(col("o_orderkey") % 2 === 0).select(
        col("o_orderkey").as("id"), nkey.as("nkey"),
        col("o_totalprice").as("total"))
      val updates = o.filter(col("o_orderkey") % 3 === 0).select(
        col("o_orderkey").as("id"), nkey.as("nkey"),
        when(col("o_orderkey") % 5 === 0, col("o_totalprice") + 1.0)
          .otherwise(col("o_totalprice")).as("total"))
      core.GraphStore.classify(target, updates,
        keyCols = Seq("id", "nkey"), compareCols = Seq("total"),
        softDelete = true)
        .select(col("id"), col("nkey"), col(core.GraphStore.ACTION).as("action"))
    }),

    // ---- LLM training-data pipeline operators (documents/embeddings) ----

    // Exact content dedup: hash-groupBy on full text, canonical = min id.
    "llm_exact_dedup" -> ((s, dir) => {
      val w = Window.partitionBy(col("content_key"))
      t(s, dir, "documents")
        .select(col("doc_id"), md5(col("text")).as("content_key"))
        .withColumn("is_canonical", col("doc_id") === min(col("doc_id")).over(w))
    }),

    // MinHash + banded LSH near-dup pairs with exact-Jaccard verification:
    // candidates only ever come from shared (band, key) buckets — the
    // all-pairs comparison that kills 100 TB runs never happens.
    "llm_minhash_neardup" -> ((s, dir) => {
      llm.TextOps.minhashNearDups(
        t(s, dir, "documents"), "doc_id", "text", threshold = 0.5)
    }),

    // MinHash BANDING recall gate — the dedup-family analogue of the ANN
    // recall rows: candidates are exact-verified, so precision is 1.0 by
    // construction and the only loss channel is a true near-dup pair
    // whose signatures never collide in any band. Truth = brute exact
    // Jaccard over a FIXED-COUNT hash-order query sample × corpus — the
    // production recall-audit shape: 64 sample docs regardless of corpus
    // size, so the truth side is O(64·corpus) and the broadcast(sample)
    // is constant-size at any scale (TakeOrderedAndProject picks the
    // sample without a global sort). Recall = banded pairs touching the
    // sample / true pairs touching the sample.
    "llm_minhash_recall" -> ((s, dir) => {
      val thr = 0.5
      val ws = t(s, dir, "documents")
        .withColumn("ws", llm.TextOps.words("text"))
        .filter(size(col("ws")) >= 3)
        .withColumn("shingles", llm.TextOps.shingles(3))
      val sample = ws
        .select(col("doc_id").as("qa"), col("shingles").as("sh_a"))
        .orderBy(llm.TextOps.h64c(col("qa").cast("string")), col("qa"))
        .limit(64)
        .localCheckpoint() // read by the truth join AND both semi-joins
      val corpus = ws.select(col("doc_id").as("qb"), col("shingles").as("sh_b"))
      // lossless length-ratio prune before the intersect: J ≥ 0.5 forces
      // min(|A|,|B|) ≥ max(|A|,|B|)/2, so pairs outside 2× never qualify
      val truth = corpus.join(broadcast(sample), col("qa") =!= col("qb") &&
          size(col("sh_b")) * 2 >= size(col("sh_a")) &&
          size(col("sh_b")) <= size(col("sh_a")) * 2)
        .filter(llm.TextOps.jaccardSets(col("sh_a"), col("sh_b")) >= thr)
        .select(least(col("qa"), col("qb")).as("qid"),
          greatest(col("qa"), col("qb")).as("nid"))
        .distinct()
      val sampleIds = sample.select(col("qa").as("sid"))
      val found0 = llm.TextOps.minhashNearDups(
        t(s, dir, "documents"), "doc_id", "text", threshold = thr)
      val found = found0
        .join(broadcast(sampleIds), col("id_a") === col("sid"), "left_semi")
        .unionByName(found0
          .join(broadcast(sampleIds), col("id_b") === col("sid"), "left_semi"))
        .distinct()
        .select(col("id_a").as("qid"), col("id_b").as("nid"))
      llm.Ann.recallAtK("minhash_bands", truth, found)
    }),

    // SimHash hamming near-dup pairs: Charikar 4×15-bit block scheme over
    // 60-bit fingerprints, radius 3 — pigeonhole makes the block join
    // LOSSLESS at this radius, so the oracle replays brute all-pairs and
    // the decomposition must equal it exactly.
    "llm_simhash_neardup" -> ((s, dir) => {
      llm.TextOps.simhashNearDups(t(s, dir, "documents"), "doc_id", "text")
    }),

    // SimHash document fingerprint (32-bit, +1/-1 bit votes over shingles).
    "llm_simhash" -> ((s, dir) => {
      t(s, dir, "documents")
        .withColumn("ws", llm.TextOps.words("text"))
        .withColumn("shingles", llm.TextOps.shingles(3))
        .withColumn("shash", llm.TextOps.shingleHashes)
        .select(col("doc_id"), llm.TextOps.simhash(32).as("simhash"))
    }),

    // n-gram Jaccard near-dup within (lang, source) blocks — the blocked
    // brute-force tier, with a block-size cap: blocks over the cap are
    // routed through the MinHash-LSH path so no single giant block can
    // make the pair join quadratic at scale. (At this sf every block is
    // under the cap, so the result is the exact brute-force answer.)
    "llm_ngram_jaccard" -> ((s, dir) => {
      llm.TextOps.blockedNgramJaccard(
        t(s, dir, "documents"), "doc_id", "text",
        blockCols = Seq("lang", "source"), threshold = 0.5)
    }),

    // Token counts, quality score, rolling fingerprint, content key.
    "llm_text_stats" -> ((s, dir) => {
      t(s, dir, "documents")
        .withColumn("ws", llm.TextOps.words("text"))
        .withColumn("shingles", llm.TextOps.shingles(3))
        .withColumn("shash", llm.TextOps.shingleHashes)
        .select(Seq(col("doc_id")) ++ llm.TextOps.tokenCounts ++ Seq(
          llm.TextOps.qualityScore.as("quality"),
          array_min(col("shash")).as("fingerprint"),
          md5(col("text")).as("content_key")): _*)
    }),

    // Exact top-20% quality cut: threshold = k-th largest micro-quantized
    // quality score read off a bounded histogram (no global sort; ties at
    // the threshold kept — the cut is a pure function of the score).
    "llm_quality_cut" -> ((s, dir) => {
      val scored = t(s, dir, "documents")
        .withColumn("ws", llm.TextOps.words("text"))
        .withColumn("q", llm.TextOps.qualityScore)
      llm.Sampling.qualityCut(scored, "doc_id", "q", pct = 20)
    }),

    // Language-ID heuristic: stopword hit counts + argmax guess.
    "llm_langid" -> ((s, dir) => {
      t(s, dir, "documents")
        .withColumn("ws", llm.TextOps.words("text"))
        .select(Seq(col("doc_id")) ++ llm.TextOps.langIdColumns: _*)
        .withColumn("pred_lang", llm.TextOps.predictedLang)
    }),

    // Unicode SCRIPT detection — the orthographic signal the stopword
    // langid can't see (it only separates Latin-script languages): per-doc
    // codepoint counts over the major script blocks + dominant-script
    // verdict. Fixture salts in pure-Cyrillic/CJK/Arabic docs and Greek
    // tails so every branch and the tie-break get real work.
    "llm_script_detect" -> ((s, dir) => {
      val salted = t(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 11 === 0,
          lit("привет мир это документ на русском языке"))
          .when(col("doc_id") % 13 === 0, lit("你好世界这是一份中文文档测试"))
          .when(col("doc_id") % 17 === 0, lit("مرحبا بالعالم هذا نص عربي"))
          .otherwise(concat(col("text"),
            when(col("doc_id") % 5 === 0, lit(" αβγδε")).otherwise(lit(""))))
          .as("t2"))
      salted.select(Seq(col("doc_id")) ++ llm.TextOps.scriptColumns("t2"): _*)
        .withColumn("script", llm.TextOps.dominantScript)
    }),

    // Brute-force cosine top-3 (integer-quantized → bit-exact ranking).
    "llm_ann_topk" -> ((s, dir) => {
      val e = llm.Ann.withQuantized(t(s, dir, "embeddings"), "embedding")
      val q = e.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("qid"), col("vq"), col("norm2"))
      val c = e.select(col("vec_id").as("nid"), col("vq"), col("norm2"))
      llm.Ann.bruteTopK(q, c, 3)
    }),

    // LSH-bucketed ANN: difference-hyperplane sign bucket, top-3 within
    // the query's bucket.
    "llm_ann_lsh" -> ((s, dir) => {
      val e = llm.Ann.withBucket(
        llm.Ann.withQuantized(t(s, dir, "embeddings"), "embedding"),
        llm.Ann.DefaultPairs)
      val q = e.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("qid"), col("vq"), col("norm2"), col("bucket"))
      val c = e.select(col("vec_id").as("nid"), col("vq"), col("norm2"),
        col("bucket"))
      llm.Ann.lshTopK(q, c, 3)
    }),

    // IVF-partitioned ANN: TRAINED coarse quantizer — deterministic
    // spherical k-means (seed = vec_id%25, 2 iterations, integer centroid
    // components so the oracle reproduces training) — one-cell corpus
    // assignment, 2-probe queries, exact re-rank within probed cells.
    "llm_ann_ivf" -> ((s, dir) => {
      // standing-index probe: shared coarse quantizer + prebuilt cell
      // assignment (identical deterministic training → same oracle)
      val idx = sharedAnnIndex(s, dir)
      llm.Ann.ivfTopK(annQueries(s, dir), annCorpus(s, dir), idx.coarse,
        idx.cells, k = 3, nProbe = 2)
    }),

    // IVF × SQ8 composition: coarse cells prune (2-probe), SQ8
    // reconstructions rank within probed cells — the compute cut and the
    // memory cut stacked, proving the composition the SQ docs claim.
    // Standing-index form: bounds/codes come off the LOADED shared SQ
    // index, cells off the shared IVF index — nothing trains in-query.
    "llm_ivf_sq_search" -> ((s, dir) => {
      val idx = sharedAnnIndex(s, dir)
      llm.Ann.ivfSqSearch(annQueries(s, dir), sharedSqIndex(s, dir),
        idx.coarse, idx.cells, k = 3, nProbe = 2)
    }),

    // Recall gate for the composed path: what cell pruning AND 8-bit
    // reconstruction together cost vs brute truth.
    "llm_ivf_sq_recall" -> ((s, dir) => {
      val idx = sharedAnnIndex(s, dir)
      val queries = annQueries(s, dir)
      val corpus = annCorpus(s, dir)
      val truth = llm.Ann.bruteTopK(queries, corpus, 3)
      llm.Ann.recallAtK("ivf_sq", truth,
        llm.Ann.ivfSqSearch(queries, corpus, idx.coarse, idx.cells,
          k = 3, nProbe = 2))
    }),

    // Filtered ANN (hybrid search): top-3 cosine neighbors restricted to
    // a METADATA predicate — "nearest docs from these sources only", the
    // retrieval-with-filters shape every RAG/curation stack needs. The
    // predicate semi-joins the corpus BEFORE the similarity join, so
    // search cost scales with the filtered subset, not the corpus; at
    // 100 TB the filter would prune source-partitioned parquet before a
    // single dot product runs.
    "llm_ann_filtered" -> ((s, dir) => {
      val allowed = t(s, dir, "documents")
        .filter(col("source").isin("src0", "src1", "src2", "src3"))
        .select(col("doc_id").as("nid"))
      val corpus = annCorpus(s, dir).join(allowed, Seq("nid"), "left_semi")
      llm.Ann.bruteTopK(annQueries(s, dir), corpus, 3)
    }),

    // ANN recall gate: recall@3 of the LSH and trained-IVF paths against
    // brute-force ground truth on the same queries — the measurement that
    // keeps bucket/probe tuning honest. Exact integer hit counting.
    "llm_ann_recall" -> ((s, dir) => {
      val e = llm.Ann.withQuantized(t(s, dir, "embeddings"), "embedding")
      val corpus = e.select(col("vec_id").as("nid"), col("vq"), col("norm2"))
      val queries = e.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("qid"), col("vq"), col("norm2"))
      val truth = llm.Ann.bruteTopK(queries, corpus, 3)
      val eb = llm.Ann.withBucket(e, llm.Ann.DefaultPairs)
      val lq = eb.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("qid"), col("vq"), col("norm2"), col("bucket"))
      val lc = eb.select(col("vec_id").as("nid"), col("vq"), col("norm2"), col("bucket"))
      val lsh = llm.Ann.lshTopK(lq, lc, 3)
      val lshMp = llm.Ann.lshMultiProbeTopK(lq, lc, 3, bits = 6)
      // ivf branch probes the shared prebuilt index (same training)
      val idx = sharedAnnIndex(s, dir)
      val ivf = llm.Ann.ivfTopK(queries, corpus, idx.coarse, idx.cells,
        k = 3, nProbe = 2)
      llm.Ann.recallAtK("lsh", truth, lsh)
        .unionByName(llm.Ann.recallAtK("lsh_multiprobe", truth, lshMp))
        .unionByName(llm.Ann.recallAtK("ivf", truth, ivf))
    }),

    // One-time ANN index build — the BUILD stage of the production
    // build-once/probe-many lifecycle: train the coarse quantizer
    // (k-means step=25/iters=2) + both PQ subspace codebooks, encode the
    // corpus, persist everything to parquet keyed by a corpus
    // fingerprint. Every IVF/IVF-PQ gate row below LOADS this index
    // instead of retraining in-query. Emits per-component row counts;
    // the oracle replays both trainings and re-derives the same counts.
    "llm_ann_index_build" -> ((s, dir) => {
      val path = buildSharedAnnIndex(s, dir)
      val idx = llm.Ann.IvfPqIndex.load(s, path)
      Seq(
        ("book0", idx.pq.book0), ("book1", idx.pq.book1),
        ("cells", idx.cells), ("coarse", idx.coarse),
        ("codes", idx.pq.codes))
        .map { case (name, df) =>
          df.agg(count(lit(1)).cast("long").as("n_rows"))
            .select(lit(name).as("component"), col("n_rows"))
        }
        .reduce(_ unionByName _)
    }),

    // IVF probe-sweep recall curve: recall@3 at nProbe ∈ {1,2,4} against
    // brute truth — the recall-vs-cost curve a production deployment
    // tunes nProbe with (each probe step costs corpus/nCells more
    // candidates per query). Centroids AND corpus cell assignment come
    // off the prebuilt index (build-once/probe-many); training is
    // deterministic, so the loaded index equals the oracle's replay.
    "llm_ivf_probe_curve" -> ((s, dir) => {
      val corpus = annCorpus(s, dir)
      val queries = annQueries(s, dir)
      val truth = llm.Ann.bruteTopK(queries, corpus, 3)
      val idx = sharedAnnIndex(s, dir)
      Seq(1, 2, 4).map { p =>
        llm.Ann.recallAtK(s"ivf_p$p", truth,
          llm.Ann.ivfTopK(queries, corpus, idx.coarse, idx.cells,
            k = 3, nProbe = p))
      }.reduce(_ unionByName _)
    }),

    // IVF index statistics: per-cell population of the trained coarse
    // quantizer — the measurable form of the "trained cells stay
    // balanced" claim every IVF probe-cost estimate rests on. Reads the
    // prebuilt index's cell assignment (one partial-agg count per cell);
    // the spec pins a max/mean ceiling.
    "llm_ivf_stats" -> ((s, dir) => {
      sharedAnnIndex(s, dir).cells
        .groupBy(col("cell")).agg(count(lit(1)).cast("long").as("n_vectors"))
        .select(col("cell"), col("n_vectors"))
    }),

    // Embedding-cosine near-dup pairs blocked by label.
    "llm_embed_neardup" -> ((s, dir) => {
      val e = llm.Ann.withQuantized(t(s, dir, "embeddings"), "embedding")
        .withColumnRenamed("vec_id", "id")
      llm.Ann.nearDupPairs(e, "id", "label", 0.45)
    }),

    // Multimodal plumbing: binary payload + typed metadata → batched
    // decode-stub features, resize metadata, frame-sample counts.
    // Real JDK image decode: synthetic PNGs generated executor-side with
    // LYING metadata (0×0), decoded back via ImageIO — dimensions and the
    // pixel-sum feature must come off the raster; a garbage payload takes
    // the decoded=false sentinel path instead of killing the partition.
    "llm_image_decode" -> ((s, dir) => {
      import s.implicits._
      import llm.Multimodal.{MediaItem, MediaMeta}
      val pngs = s.range(1, 5).map { id =>
        MediaItem(id, "image/png",
          llm.Multimodal.syntheticPng(id, 16 + id.toInt * 3, 16 + id.toInt * 2),
          MediaMeta(0, 0, 0L, "png"))
      }
      val junk = s.range(99, 100).map { id =>
        MediaItem(id, "image/png", "not an image".getBytes("UTF-8"),
          MediaMeta(0, 0, 0L, "png"))
      }
      llm.Multimodal.decodeImage(pngs.union(junk)).toDF()
        .select(col("mediaId").as("media_id"), col("decoded"),
          col("width"), col("height"), col("pixelSum").as("pixel_sum"))
    }),

    // Real JDK audio decode: synthetic 16-bit PCM WAVs (one stereo)
    // generated executor-side, decoded back via AudioSystem — format
    // fields and the Σ sample² energy feature must come off the decoded
    // PCM frames; a garbage payload takes the decoded=false sentinel.
    "llm_audio_decode" -> ((s, dir) => {
      import s.implicits._
      import llm.Multimodal.{MediaItem, MediaMeta}
      val wavs = s.range(1, 4).map { id =>
        MediaItem(id, "audio/wav",
          llm.Multimodal.syntheticWav(id, 500 + 101 * id.toInt),
          MediaMeta(0, 0, 0L, "wav"))
      }
      val stereo = s.range(4, 5).map { id =>
        MediaItem(id, "audio/wav",
          llm.Multimodal.syntheticWav(id, 800, channels = 2),
          MediaMeta(0, 0, 0L, "wav"))
      }
      val junk = s.range(99, 100).map { id =>
        MediaItem(id, "audio/wav", "not audio at all".getBytes("UTF-8"),
          MediaMeta(0, 0, 0L, "wav"))
      }
      llm.Multimodal.decodeAudio(wavs.union(stereo).union(junk)).toDF()
        .select(col("mediaId").as("media_id"), col("decoded"),
          col("sampleRate").as("sample_rate"), col("channels"),
          col("nSamples").as("n_samples"), col("sumSq").as("sum_sq"))
    }),

    // G.711 companded audio (µ-law + A-law — the one compressed-audio
    // family the JDK ships codecs for): the same deterministic PCM
    // pattern companded to 8-bit telephony WAVs, transcoded back to
    // 16-bit PCM inside decodeAudio. G.711 is lossy but table-driven, so
    // the oracle recomputes the exact compand→expand round trip per
    // sample in SQL (verified against the JDK codec sample-by-sample) —
    // a real independent oracle, not a pinned constant.
    "llm_audio_g711" -> ((s, dir) => {
      import s.implicits._
      import llm.Multimodal.{MediaItem, MediaMeta}
      val ulaw = s.range(1, 4).map { id =>
        MediaItem(id, "audio/wav",
          llm.Multimodal.syntheticWavCompanded(id, 500 + 101 * id.toInt),
          MediaMeta(0, 0, 0L, "ulaw"))
      }
      val alaw = s.range(11, 14).map { id =>
        MediaItem(id, "audio/wav",
          llm.Multimodal.syntheticWavCompanded(id - 10,
            500 + 101 * (id.toInt - 10), alaw = true),
          MediaMeta(0, 0, 0L, "alaw"))
      }
      val junk = s.range(99, 100).map { id =>
        MediaItem(id, "audio/wav", "not audio".getBytes("UTF-8"),
          MediaMeta(0, 0, 0L, "ulaw"))
      }
      llm.Multimodal.decodeAudio(ulaw.union(alaw).union(junk)).toDF()
        .select(col("mediaId").as("media_id"),
          when(col("mediaId") < 10, lit("ulaw"))
            .when(col("mediaId") < 90, lit("alaw"))
            .otherwise(lit("junk")).as("codec"),
          col("decoded"), col("sampleRate").as("sample_rate"),
          col("channels"), col("nSamples").as("n_samples"),
          col("sumSq").as("sum_sq"))
    }),

    // IMA ADPCM (WAVE tag 0x11) — the third real compressed-audio family,
    // decoded by the hand-rolled two-table state machine (the JDK ships
    // no ADPCM codec): single-block files whose header predictor, step
    // index and nibble stream are pure formulas, so the oracle replays
    // the IMA recursion sample-by-sample. A truncated-RIFF payload takes
    // the sentinel.
    "llm_audio_adpcm" -> ((s, dir) => {
      import s.implicits._
      import llm.Multimodal.{MediaItem, MediaMeta}
      val adpcm = s.range(1, 4).map { id =>
        MediaItem(id, "audio/wav",
          llm.Multimodal.syntheticWavAdpcm(id, 400 + 37 * id.toInt),
          MediaMeta(0, 0, 0L, "adpcm"))
      }
      // stereo blocks: two per-channel headers + word-interleaved nibble
      // streams the decoder must de-interleave back to the per-channel
      // formulas the oracle recursion replays
      val stereo = s.range(11, 14).map { id =>
        MediaItem(id, "audio/wav",
          llm.Multimodal.syntheticWavAdpcmStereo(id, 300 + 41 * (id.toInt - 10)),
          MediaMeta(0, 0, 0L, "adpcm"))
      }
      val junk = s.range(99, 100).map { id =>
        MediaItem(id, "audio/wav", "RIFFjunkWAVEnope".getBytes("UTF-8"),
          MediaMeta(0, 0, 0L, "adpcm"))
      }
      llm.Multimodal.decodeAudio(adpcm.union(stereo).union(junk)).toDF()
        .select(col("mediaId").as("media_id"), col("decoded"),
          col("sampleRate").as("sample_rate"), col("channels"),
          col("nSamples").as("n_samples"), col("sumSq").as("sum_sq"))
    }),

    // REAL video frame decode: MJPEG-in-AVI built + decoded with
    // JDK-only code (RIFF chunk walk, per-frame ImageIO JPEG inflate).
    // Frame count and raster dims are codec-exact; the raw decoded
    // pixel sum is emitted as-is and the oracle pins the GOLDEN sums
    // (655713 / 1424018 / 2709614) measured once on this JDK's ImageIO
    // (decode is deterministic for a fixed JDK) — a silent decoder
    // change now fails the hash instead of drifting inside a tolerance
    // band. The lossless pattern sums (655200 / 1425408 / 2711520) sit
    // within 0.1% of the pinned decoded values, bounding the JPEG
    // round-trip error; the spec keeps the decoder-portable 1% check.
    "llm_video_frames" -> ((s, dir) => {
      import s.implicits._
      import llm.Multimodal.{MediaItem, MediaMeta}
      val avis = s.range(1, 4).map { id =>
        MediaItem(id, "video/x-msvideo",
          llm.Multimodal.syntheticAvi(id, 32 + id.toInt * 8, 24 + id.toInt * 4,
            2 + id.toInt),
          MediaMeta(0, 0, 0L, "mjpeg"))
      }
      val junk = s.range(99, 100).map { id =>
        MediaItem(id, "video/x-msvideo", "not a video".getBytes("UTF-8"),
          MediaMeta(0, 0, 0L, "mjpeg"))
      }
      llm.Multimodal.decodeVideoFrames(avis.union(junk)).toDF()
        .select(col("mediaId").as("media_id"), col("decoded"),
          col("nFrames").as("n_frames"), col("width"), col("height"),
          col("pixelSum").as("pixel_sum"))
    }),

    // REAL raster resize: same synthetic PNGs as llm_image_decode,
    // nearest-neighbor downscale in exact integer index math — the oracle
    // re-derives the resized pixel sum arithmetically from the pattern.
    "llm_image_resize" -> ((s, dir) => {
      import s.implicits._
      import llm.Multimodal.{MediaItem, MediaMeta}
      val pngs = s.range(1, 5).map { id =>
        MediaItem(id, "image/png",
          llm.Multimodal.syntheticPng(id, 16 + id.toInt * 3, 16 + id.toInt * 2),
          MediaMeta(0, 0, 0L, "png"))
      }
      val junk = s.range(99, 100).map { id =>
        MediaItem(id, "image/png", "not an image".getBytes("UTF-8"),
          MediaMeta(0, 0, 0L, "png"))
      }
      llm.Multimodal.resizeImage(pngs.union(junk), maxDim = 12).toDF()
        .select(col("mediaId").as("media_id"), col("decoded"),
          col("inWidth").as("in_width"), col("inHeight").as("in_height"),
          col("outWidth").as("out_width"), col("outHeight").as("out_height"),
          col("outPixelSum").as("out_pixel_sum"))
    }),

    "llm_multimodal" -> ((s, dir) => {
      val items = llm.Multimodal.fromDocuments(s, t(s, dir, "documents"))
      val feats = llm.Multimodal.decodeStub(items).toDF()
      val resized = llm.Multimodal.resizeMeta(items.toDF(), 256)
        .select(col("mediaId"), col("out_width"), col("out_height"))
      val frames = llm.Multimodal.sampleFrames(items.toDF(), 1000)
        .groupBy(col("media_id")).agg(count(lit(1)).as("n_frames"))
      feats.join(resized, Seq("mediaId"))
        .join(frames, feats("mediaId") === frames("media_id"))
        .select(col("media_id"), col("kind"), col("nBytes").as("n_bytes"),
          col("contentMd5").as("content_md5"), col("head8Hex").as("head8_hex"),
          col("out_width"), col("out_height"), col("n_frames"))
    }),

    // Dedup-cluster formation: near-dup similarity is NOT transitive, so
    // the keep/drop decision needs connected components over the pair
    // list — min-label propagation + pointer jumping (O(log d) rounds,
    // lineage-truncated per round). Every document gets a cluster;
    // the min doc id is canonical, matching the exact-dedup rule.
    "llm_dedup_clusters" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = llm.TextOps.minhashNearDups(docs, "doc_id", "text",
        threshold = 0.5)
      llm.Clusters.dedupClusters(docs.select(col("doc_id")), "doc_id",
        pairs, "id_a", "id_b")
    }),

    // Gopher-style repetition/composition signals + keep decision (Rae et
    // al. 2021 appendix A1.1) — pure column expressions; the word, line
    // and bigram arrays are bound once per row.
    "llm_quality_gopher" -> ((s, dir) => {
      t(s, dir, "documents")
        .withColumn("ws", llm.TextOps.words("text"))
        .withColumn("lines", llm.TextOps.docLines)
        .withColumn("g2", llm.TextOps.wordBigrams)
        .select(Seq(col("doc_id"), col("text"), col("ws")) ++
          llm.TextOps.repetitionColumns: _*)
        .withColumn("gopher_keep", llm.TextOps.gopherKeep)
        .drop("text", "ws")
    }),

    // PII detection + redaction. The corpus is synthetic prose, so each
    // row is salted with a deterministic email/phone/IP derived from its
    // id — the scrub then has real work to do and the oracle re-derives
    // the identical salted text.
    "llm_pii_scrub" -> ((s, dir) => {
      val salted = t(s, dir, "documents")
        .withColumn("text2", concat(col("text"),
          lit(" contact user"), col("doc_id"), lit("@example.com call +1 555 "),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
          lit(" from 10.0.0."), (col("doc_id") % 250).cast("string")))
      salted.select(Seq(col("doc_id")) ++ llm.TextOps.piiCounts("text2") ++
        Seq(llm.TextOps.scrubPii(col("text2")).as("scrubbed")): _*)
    }),

    // Deterministic stratified sampling: membership is a pure function of
    // the doc id (md5 bucket), so the sample reproduces under any
    // partitioning/engine — downsample dominant-language text, keep the
    // rest at higher rates. Narrow map-side predicate + broadcast rates.
    "llm_hash_sample" -> ((s, dir) => {
      llm.Sampling.stratifiedSample(t(s, dir, "documents"), "doc_id", "lang",
        Map("en" -> 10, "fr" -> 100), defaultPct = 40)
        .select(col("doc_id"), col("lang"), col("source"))
    }),

    // Incremental dedup: a "new batch" (doc_id % 5 = 0) admitted against
    // the existing corpus — exact content-hash tier + LSH band-index
    // probe tier with exact-Jaccard verification. The corpus contributes
    // only its (id, band, key) index to the join; O(batch) per ingest.
    "llm_incremental_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      llm.TextOps.incrementalDedup(
        docs.filter(col("doc_id") % 5 =!= 0),
        docs.filter(col("doc_id") % 5 === 0),
        "doc_id", "text")
    }),

    // Domain mixing: resample sources toward target token shares (src0
    // oversampled to 50% of budget, src1 to 20%, the rest share the
    // default) — rates derived from the data's own token sums, membership
    // a pure id-hash function, all integer arithmetic.
    "llm_domain_mix" -> ((s, dir) => {
      llm.Sampling.domainMix(t(s, dir, "documents"), "doc_id", "text",
        "source", Map("src0" -> 5000L, "src1" -> 2000L), defaultBp = 100L)
    }),

    // Temperature-scaled mixing (α = 0.5): target shares derived from the
    // data itself — share ∝ √tokens, damping token-rich heads and lifting
    // tails. The input is deliberately SKEWED (src0/src1 keep all docs,
    // other sources only every 3rd) so the √-damping has real work; with
    // the uniform synthetic corpus it would be a no-op.
    "llm_domain_mix_temp" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .filter(col("doc_id") % 3 === 0 || col("source").isin("src0", "src1"))
      llm.Sampling.domainMixTemperature(docs, "doc_id", "text", "source")
    }),

    // Corpus vocabulary census: top-100 terms by global frequency with
    // per-term document frequency — distributed top-k over a Zipf
    // distribution (partial aggs absorb the head; no global sort).
    "llm_vocab_census" -> ((s, dir) => {
      llm.TextOps.vocabCensus(t(s, dir, "documents"), "doc_id", "text", 100)
    }),

    // Sequence packing (concat-and-chunk): docs stream in id order within
    // hash groups (count derived from corpus size; 32 at this sf), chunked
    // into 512-token blocks; each doc reports the block span it occupies.
    // Integer-exact layout.
    "llm_seq_pack" -> ((s, dir) => {
      llm.TextOps.seqPack(t(s, dir, "documents"), "doc_id", "text",
        budget = 512L)
    }),

    // Corpus-level line dedup (C4/Gopher boilerplate removal): lines in
    // >= 10 distinct docs are boilerplate, removed per-doc with order
    // preserved. The synthetic corpus shares no natural lines, so
    // deterministic boilerplate footers are salted in (every 3rd doc a
    // newsletter line, every 7th a copyright line) and the oracle
    // re-derives the identical salt.
    "llm_line_dedup" -> ((s, dir) => {
      val salted = t(s, dir, "documents")
        .withColumn("text2", concat(col("text"),
          when(col("doc_id") % 3 === 0,
            lit("\nsubscribe to our newsletter today")).otherwise(lit("")),
          when(col("doc_id") % 7 === 0,
            lit("\nall rights reserved by example corp")).otherwise(lit(""))))
      llm.TextOps.lineDedup(salted, "doc_id", "text2", minDocs = 10L)
    }),

    // Benchmark decontamination: training docs sharing any word-8-gram
    // with the eval split (doc_id%100=0) are flagged. Every 20th training
    // doc is salted with the first 12 words of one eval doc — a real
    // leak the oracle reproduces.
    "llm_decontaminate" -> ((s, dir) => {
      val (train, evalSet) = contaminationFixture(s, dir, leakMods = Seq(1))
      llm.TextOps.contaminationFlags(train, evalSet, "doc_id", "text2", k = 8)
    }),

    // The INVERSE contamination view: per EVAL doc, how much of it leaked
    // into training (hit grams / total grams, distinct leaking train
    // docs) — the "which benchmarks are burned" audit table, over TWO
    // independent benchmark families: family A (docs %100==0, head snips,
    // leak stripes %20∈{1,7} keyed doc_id%5 — the llm_decontaminate
    // fixture shape) and family B (docs %100==50, snips from word 3,
    // leak stripe %20==13 keyed (doc_id+2)%5). Disjoint leak residues →
    // a train doc carries at most one family's snip; the report runs
    // over the UNION and tags each eval row with its benchmark source,
    // so the per-eval breakdown is proven on ≥2 distinct suites at once
    // (burned and clean rows in both).
    "llm_contamination_report" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val evalA = docs.filter(col("doc_id") % 100 === 0)
        .select(col("doc_id"), col("text").as("text2"))
      val evalB = docs.filter(col("doc_id") % 100 === 50)
        .select(col("doc_id"), col("text").as("text2"))
      val snipsA = evalA.select((col("doc_id") / 100).cast("long").as("refA"),
        expr("array_join(slice(split(lower(text2), ' '), 1, 12), ' ')").as("snipA"))
      val snipsB = evalB.select((col("doc_id") / 100).cast("long").as("refB"),
        expr("array_join(slice(split(lower(text2), ' '), 3, 12), ' ')").as("snipB"))
      val train = docs
        .filter(col("doc_id") % 100 =!= 0 && col("doc_id") % 100 =!= 50)
        .withColumn("refA", col("doc_id") % 5)
        .withColumn("refB", (col("doc_id") + 2) % 5)
        .join(broadcast(snipsA), Seq("refA"))
        .join(broadcast(snipsB), Seq("refB"))
        .withColumn("text2",
          when(col("doc_id") % 20 === 1 || col("doc_id") % 20 === 7,
            concat(col("text"), lit(" "), col("snipA")))
            .when(col("doc_id") % 20 === 13,
              concat(col("text"), lit(" "), col("snipB")))
            .otherwise(col("text")))
      llm.TextOps.contaminationReport(train, evalA.unionByName(evalB),
          "doc_id", "text2", k = 8)
        .withColumn("benchmark",
          when(col("eval_id") % 100 === 0, lit("benchA")).otherwise(lit("benchB")))
    }),

    // Corpus snapshot diff — before retraining on a refreshed crawl:
    // what entered, what left, what silently mutated. v2 is a synthetic
    // refresh of the documents table (every 17th doc dropped, every 13th
    // rewritten, 20 new ids appended); the compared value is the 64-bit
    // content hash, so text never rides the full-outer join's shuffle.
    // Fresh ids are NEGATIVE (-20..-1): real doc_ids are dense 0..N-1,
    // so a positive literal range would collide with existing docs at a
    // larger sf and silently break the 'added' semantics.
    "llm_corpus_diff" -> ((s, dir) => {
      val v1 = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val v2 = t(s, dir, "documents")
        .filter(col("doc_id") % 17 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 13 === 0,
            concat(col("text"), lit(" [rev2]"))).otherwise(col("text"))
            .as("text"))
        .unionByName(s.range(-20, 0).toDF("doc_id")
          .select(col("doc_id"),
            concat(lit("fresh crawl doc "), col("doc_id").cast("string"))
              .as("text")))
      llm.TextOps.corpusDiff(v1, v2, "doc_id", "text")
    }),

    // Corpus word-distribution drift between the same two snapshots the
    // corpus_diff row compares — top-20 most-drifted words by |Δ(c/N)|
    // (one IEEE division per rate; word tie-break pins the cut).
    "llm_corpus_drift" -> ((s, dir) => {
      val v1 = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val v2 = t(s, dir, "documents")
        .filter(col("doc_id") % 17 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 13 === 0,
            concat(col("text"), lit(" [rev2]"))).otherwise(col("text"))
            .as("text"))
        .unionByName(s.range(-20, 0).toDF("doc_id")
          .select(col("doc_id"),
            concat(lit("fresh crawl doc "), col("doc_id").cast("string"))
              .as("text")))
      llm.TextOps.corpusDrift(v1, v2, "doc_id", "text", topK = 20)
    }),

    // Overlapping token-window chunking (RAG/embedding front gate):
    // 32-token chunks every 24 tokens — pure map-side transform+explode,
    // zero shuffles, layout a pure function of (doc id, offsets).
    "llm_chunking" -> ((s, dir) => {
      llm.Retrieval.chunk(t(s, dir, "documents"), "doc_id", "text",
        window = 32, stride = 24)
    }),

    // Inactivity-gap sessionization over the events stream (30-min gap):
    // per-user epoch-us windows, integer gap math, decimal value sums.
    "llm_sessionize" -> ((s, dir) => {
      core.Sessionize.sessionize(
        t(s, dir, "events").withColumn("ts_us", expr("ts_ns div 1000")),
        "user_id", "event_id", "value", gapUs = 1800000000L)
    }),

    // Ordered conversion funnel view→click→purchase: per-step min
    // aggregations chained on the user key, strict integer-us ordering.
    "llm_funnel" -> ((s, dir) => {
      core.EventAnalytics.funnel(
        t(s, dir, "events").withColumn("ts_us", expr("ts_ns div 1000")),
        "user_id", "event_type", Seq("view", "click", "purchase"))
    }),

    // Cohort retention matrix: first-event epoch-day cohorts × activity
    // day offsets, distinct active users per cell.
    "llm_retention" -> ((s, dir) => {
      core.EventAnalytics.retention(
        t(s, dir, "events").withColumn("ts_us", expr("ts_ns div 1000")),
        "user_id")
    }),

    // Unicode NFC normalization (native expression, JDK Normalizer):
    // decomposed salt sequences (e+U+0301, A+U+030A, o+U+0308) compose
    // to single codepoints — the pre-hash cleanup exact dedup needs.
    // Oracle is DuckDB's independent nfc_normalize of the same salts.
    "llm_unicode_nfc" -> ((s, dir) => {
      val nfc = plans.NfcNormalize.nfc _
      val salted = t(s, dir, "documents").select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 3 === 0,
            lit(" cafe\u0301 re\u0301sume\u0301")).otherwise(lit("")),
          when(col("doc_id") % 7 === 0,
            lit(" A\u030A ngstro\u0308m")).otherwise(lit(""))).as("t2"))
      salted.select(col("doc_id"),
        length(col("t2")).cast("long").as("n_chars_before"),
        length(nfc(col("t2"))).cast("long").as("n_chars_after"),
        (col("t2") =!= nfc(col("t2"))).as("changed"),
        nfc(col("t2")).as("normalized"))
    }),

    // BPE tokenizer training: 6 greedy merges learned on the word dict
    // (corpus touched once by the census); output is the merge table.
    "llm_bpe_train" -> ((s, dir) => {
      llm.TextOps.bpeTrain(t(s, dir, "documents"), "doc_id", "text", 6)
    }),

    // BPE APPLY: the trained dict's final segmentation (word → learned
    // token sequence) after the same 6 merges.
    "llm_bpe_encode" -> ((s, dir) => {
      llm.TextOps.bpeEncode(t(s, dir, "documents"), "doc_id", "text", 6)
    }),

    // End-to-end RAG retrieval pipeline: chunk (32/24 overlap) →
    // feature-hashing embedding (16-dim signed integer projection — the
    // deterministic stand-in sharing the (id, vq, norm2) contract a
    // neural embedder would fill) → integer-exact brute cosine top-3.
    // Chunk key cid = doc_id·1024 + chunk_id; queries are chunk 0 of
    // every doc_id % 173 == 0 document.
    "llm_rag_pipeline" -> ((s, dir) => {
      val chunks = llm.Retrieval
        .chunk(t(s, dir, "documents"), "doc_id", "text", 32, 24)
        .withColumn("cid", col("doc_id") * 1024 + col("chunk_id"))
      val emb = llm.Retrieval.hashEmbed(chunks, "cid", "chunk_text", 16)
        .filter(col("norm2") > 0)
        // two consumers (query slice + corpus side of the brute join)
        // would otherwise each re-run the chunk+embed chain
        .localCheckpoint()
      // cid % (1024·173) == 0 ⇔ chunk_id == 0 && doc_id % 173 == 0
      val queries = emb.filter(col("nid") % lit(1024L * 173) === 0)
        .select(col("nid").as("qid"), col("vq"), col("norm2"))
      llm.Ann.bruteTopK(queries, emb, 3)
    }),

    // Okapi BM25 top-5 keyword retrieval: queries are the first 5 words
    // of every doc_id % 97 == 0 document (query-by-example, self
    // excluded). Rational idf + micro-quantized integer term scores keep
    // the ranking bit-exact cross-engine; corpus tokens are pruned by the
    // broadcast query-term set before any aggregation.
    "llm_bm25" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val queries = docs.filter(col("doc_id") % 97 === 0)
        .select(col("doc_id").as("qid"),
          expr("array_join(slice(filter(split(lower(text), ' '), " +
            "w -> length(w) > 0), 1, 5), ' ')").as("qtext"))
      llm.Retrieval.bm25TopK(docs, "doc_id", "text",
        queries, "qid", "qtext", k = 5, excludeIdEq = true)
    }),

    // Hybrid retrieval: reciprocal-rank fusion (C=60, pure integer) of
    // dense brute-force cosine top-10 and sparse BM25 top-10 over the
    // SAME query set (vec_id % 50 == 0; query text = that doc's first 5
    // words) — the standard sparse+dense production shape; fusion cost
    // is O(queries × k), the corpus is never touched again.
    "llm_hybrid_search" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val queries = docs.filter(col("doc_id") % 50 === 0)
        .select(col("doc_id").as("qid"),
          expr("array_join(slice(filter(split(lower(text), ' '), " +
            "w -> length(w) > 0), 1, 5), ' ')").as("qtext"))
      val dense = llm.Ann.bruteTopK(annQueries(s, dir), annCorpus(s, dir), 10)
        .select(col("qid"), col("nid"), col("rank"))
      val sparse = llm.Retrieval.bm25TopK(docs, "doc_id", "text",
        queries, "qid", "qtext", k = 10, excludeIdEq = true)
        .select(col("query_id").as("qid"), col("doc_id").as("nid"),
          col("rank"))
      llm.Retrieval.rrfFuse(dense, sparse, k = 5)
    }),

    // Corpus-trained bigram-LM quality score (CCNet-style bucketing,
    // determinism-safe arithmetic-mean form): add-one-smoothed
    // p(w2|w1) trained on the corpus itself, per-doc mean token
    // probability in ppb, head/tail vs the corpus mean.
    "llm_ngram_lm" -> ((s, dir) => {
      llm.Retrieval.bigramLmScore(t(s, dir, "documents"), "doc_id", "text")
    }),

    // Per-domain exact token budgets — the primitive a domain-mix plan
    // compiles to ("exactly N tokens per source"): per-source budgets
    // 400/700/1000 by source number mod 3; the per-group bucketed
    // cumsum never serializes a mega-domain through one task. Oracle is
    // the NAIVE per-source global window — the bucketed decomposition
    // must reproduce it exactly.
    "llm_domain_budget" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val budgets = docs.select(col("source")).distinct()
        .withColumn("budget",
          lit(400L) + (expr("CAST(substr(source, 4) AS BIGINT)") % 3) * 300L)
      llm.Sampling.tokenBudgetPerGroup(docs, "doc_id", "text", "source",
        budgets)
    }),

    // Rolling ingest composition: a persisted dedup index admits a new
    // batch AND updates cluster assignments incrementally — new docs
    // attach to existing components via their verified pairs (index
    // probe), closing only the SMALL graph of new ids + touched cluster
    // labels. Result is pinned identical to a full re-cluster of the
    // unioned corpus (the recursive-CTE oracle), at O(batch) cost.
    "llm_rolling_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val corpus = docs.filter(col("doc_id") % 5 =!= 0)
      val batch = docs.filter(col("doc_id") % 5 === 0)
      // ONE index per side supplies everything: the corpus's standing pair
      // list, the batch's internal pairs, and the cross probe — corpus
      // text is scanned once (persisted parquet in a real deployment)
      val cIdx = llm.TextOps.buildDedupIndex(corpus, "doc_id", "text")
      val nIdx = llm.TextOps.buildDedupIndex(batch, "doc_id", "text")
      val corpusCC = llm.Clusters.connectedComponents(
        corpus.select(col("doc_id")), "doc_id",
        llm.TextOps.nearPairsFromIndex(cIdx, 0.5), "id_a", "id_b")
      val newOld = llm.TextOps.incrementalNearPairs(cIdx, nIdx, 0.5)
      val newNew = llm.TextOps.nearPairsFromIndex(nIdx, 0.5)
      llm.Clusters.incrementalClusters(corpusCC,
        batch.select(col("doc_id").as("id")), newNew, "id_a", "id_b", newOld)
        .select(col("id").as("doc_id"), col("comp").as("cluster_id"),
          (col("id") % 5 === 0).as("is_new"))
    }),

    // SemDeDup (Abbas et al. 2023): semantic near-dedup — trained k-means
    // cells as the blocking key, exact integer cosine within cells, then
    // connected components for the keep/drop decision. Reuses the
    // llm_ann_ivf quantizer, so the oracle replays identical training.
    "llm_semantic_dedup" -> ((s, dir) => {
      val e = llm.Ann.withQuantized(t(s, dir, "embeddings"), "embedding")
      val corpus = e.select(col("vec_id").as("nid"), col("vq"), col("norm2"))
      // blocking cells come off the prebuilt index (build-once/probe-many)
      val mem = corpus.join(sharedAnnIndex(s, dir).cells, Seq("nid"))
        .withColumnRenamed("nid", "vec_id")
      val pairs = llm.Ann.nearDupPairs(mem, "vec_id", "cell", threshold = 0.35)
      llm.Clusters.dedupClusters(e.select(col("vec_id")), "vec_id",
        pairs, "id_a", "id_b")
    }),

    // Exact-substring duplicate spans (Lee et al. 2022 ExactSubstr shape):
    // word-8-grams shared by >= 2 distinct docs mark duplicated positions;
    // runs of consecutive duplicated positions bound the longest shared
    // substring. Deterministic boilerplate is salted in (every 5th doc a
    // fox sentence, every 7th a legal footer) so real cross-doc spans
    // exist; the oracle re-derives the identical salt.
    "llm_span_dedup" -> ((s, dir) => {
      val salted = t(s, dir, "documents")
        .withColumn("text2", concat(col("text"),
          when(col("doc_id") % 5 === 0,
            lit(" the quick brown fox jumps over the lazy dog again")).otherwise(lit("")),
          when(col("doc_id") % 7 === 0,
            lit(" all rights reserved this document is provided without any warranty")).otherwise(lit(""))))
      llm.TextOps.spanDedup(salted, "doc_id", "text2", k = 8, minDocs = 2L)
    }),

    // Deterministic train/val/test split: the id-hash bucket gate cut at
    // 90/95 — membership is a pure function of identity, so the split
    // never leaks across re-runs, engines or repartitions.
    "llm_split" -> ((s, dir) => {
      val b = llm.Sampling.hashBucket(col("doc_id"))
      t(s, dir, "documents").select(col("doc_id"), col("source"),
        when(b < 90, "train").when(b < 95, "val").otherwise("test").as("split"))
    }),

    // URL-level curation: canonicalize (lowercase authority, strip
    // fragment + tracking params), extract the registrable domain
    // (public-suffix aware: .CO.UK hosts resolve to distinct three-label
    // domains, not one shared "co.uk"), cap documents per domain in
    // deterministic hash order via the SCALE-SAFE bounded top-k aggregate
    // (perDomainCapAgg — no hot-domain sort window; rows beyond the cap
    // carry a NULL rank). Messy URLs are salted in deterministically;
    // 7 .com + 3 .co.uk synthetic hosts make both tiers bind.
    "llm_url_ops" -> ((s, dir) => {
      val withUrl = t(s, dir, "documents").select(col("doc_id"),
        concat(lit("HTTPS://"),
          when(col("doc_id") % 11 === 0,
            concat(lit("WWW.Site"), (col("doc_id") % 3).cast("string"),
              lit(".CO.UK")))
            .otherwise(concat(lit("WWW.Example"),
              (col("doc_id") % 7).cast("string"), lit(".COM"))),
          lit("/Path"), col("doc_id").cast("string"),
          lit("?utm_source=feed&id="), (col("doc_id") % 30).cast("string"),
          lit("&fbclid=xyz#frag")).as("url"))
      val canon = withUrl
        .withColumn("canon_url", llm.TextOps.canonicalUrlCol("url"))
        .withColumn("domain", llm.TextOps.urlDomainCol("canon_url"))
      llm.TextOps.perDomainCapAgg(canon, "doc_id", "domain", cap = 40)
        .select(col("doc_id"), col("canon_url"), col("domain"),
          col("domain_rank"), col("kept"))
    }),

    // Skew-mitigated join + holistic aggregate on a DELIBERATELY skewed
    // key (80% of documents share one 'hot' key): `Skew.saltedJoin`
    // spreads the hot key over 8 salt buckets instead of one straggler
    // task, and `Skew.saltedCollectSet` two-phases the hot key's
    // collect_set so no single task materializes the full hot set. The
    // oracle is the PLAIN join + grouped distinct-list — salting must be
    // physically different but semantically invisible.
    "llm_salted_join" -> ((s, dir) => {
      import s.implicits._
      val big = t(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 10 < 8, lit("hot"))
          .otherwise(concat(lit("cold"), (col("doc_id") % 10).cast("string")))
          .as("skew_key"))
      val dim = Seq(("hot", "tier-a"), ("cold8", "tier-b"), ("cold9", "tier-c"))
        .toDF("skew_key", "tier")
      val joined = core.Skew.saltedJoin(big, broadcast(dim), "skew_key",
        saltFactor = 8)
      val sets = core.Skew.saltedCollectSet(
        joined.select(col("skew_key"), (col("doc_id") % 100).as("bucket")),
        "skew_key", "bucket", saltFactor = 8)
      joined.groupBy(col("skew_key"), col("tier"))
        .agg(count(lit(1)).as("n_docs"))
        .join(sets, Seq("skew_key"))
        .select(col("skew_key"), col("tier"), col("n_docs"),
          // joined to a flat string: the driver's comparator sorts/hashes
          // pandas cells, and ndarray cells are unhashable there
          concat_ws(",", array_sort(col("bucket_set"))).as("buckets"))
    }),

    // QUANTILE SKETCH (llm.Sketches.logHistogram/histQuantiles): P50/
    // P90/P99 doc length from a ≤ ~1000-bucket log-linear histogram —
    // DDSketch-style guaranteed ≤ 1/16 relative error, all integer
    // bit-length arithmetic, SUM-mergeable across shards. The in-row
    // audit compares against the EXACT percentile computed over the
    // value-domain histogram (window over distinct lengths — bounded
    // cardinality, never a row-global sort).
    "llm_quantile_sketch" -> ((s, dir) => {
      // the v >= 1 cut applies to BOTH the sketch and the exact audit:
      // the populations must match or the q·N thresholds diverge
      val v = t(s, dir, "documents")
        .select(length(col("text")).cast("long").as("v"))
        .filter(col("v") >= 1L)
        .localCheckpoint() // consumed by the histogram AND the audit
      val sk = llm.Sketches.histQuantiles(
        llm.Sketches.logHistogram(v, "v"), Seq(50, 90, 99))
      val exact = exactValueQuantiles(v, Nil, "v", count(lit(1)),
        Seq(50, 90, 99))
      sk.join(exact, Seq("q"))
        .select(col("q").cast("long").as("q"), col("sketch_v"), col("exact_v"),
          (abs(col("sketch_v") - col("exact_v")) * 16 <= col("exact_v"))
            .as("within_bound"))
    }),

    // TOKEN-WEIGHTED QUANTILES: "P50 of TOKENS sits in docs of length
    // ≤ X" — the curriculum/packing planner's view of the corpus (doc-
    // count quantiles mislead when long docs carry most of the mass).
    // Same bucket algebra with Σ tokens as bucket mass; exact audit
    // over the token-weighted value-domain histogram.
    "llm_weighted_quantile" -> ((s, dir) => {
      // same population rule as llm_quantile_sketch: v >= 1 everywhere
      val d = t(s, dir, "documents")
        .select(length(col("text")).cast("long").as("v"),
          size(split(lower(col("text")), " ")).cast("long").as("tok"))
        .filter(col("v") >= 1L)
        .localCheckpoint() // histogram + audit both read it
      val sk = llm.Sketches.histQuantiles(
        llm.Sketches.logHistogramWeighted(d, "v", "tok"), Seq(50, 90, 99))
      val exact = exactValueQuantiles(d, Nil, "v", sum(col("tok")),
        Seq(50, 90, 99))
      sk.join(exact, Seq("q"))
        .select(col("q").cast("long").as("q"), col("sketch_v"), col("exact_v"),
          (abs(col("sketch_v") - col("exact_v")) * 16 <= col("exact_v"))
            .as("within_bound"))
    }),

    // WINSORIZE (sketch consumed downstream): clamp doc lengths to the
    // sketch's [P1, P99] — the outlier-taming normalization a quality
    // pipeline runs before ratio features. The bounds come from the
    // ≤ ~1000-bucket histogram (broadcast back as two scalars), so the
    // whole pass is one scan + one tiny side computation at any scale.
    "llm_winsorize" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), length(col("text")).cast("long").as("v"))
      val bounds = llm.Sketches.histQuantiles(
        llm.Sketches.logHistogram(docs, "v"), Seq(1, 99))
        .groupBy()
        .agg(min(when(col("q") === 1, col("sketch_v"))).as("p1"),
          min(when(col("q") === 99, col("sketch_v"))).as("p99"))
      docs.crossJoin(broadcast(bounds))
        .select(col("doc_id"), col("v"),
          least(greatest(col("v"), col("p1")), col("p99")).as("w"),
          (col("v") < col("p1") || col("v") > col("p99")).as("clamped"))
    }),

    // CORPUS CUBE REPORT: Spark native `cube` (one Expand + one hash
    // agg — partial-aggregated map-side, no per-grouping-set rescan)
    // over (length class × shard) with doc and token totals; the
    // grouping_id bitmask disambiguates subtotal rows. The standard
    // "corpus composition dashboard" rollup at any scale.
    "llm_corpus_report" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(
        expr("CAST(length(text) AS BIGINT) div 128").as("len_class"),
        (col("doc_id") % 4).cast("long").as("shard"),
        size(split(lower(col("text")), " ")).cast("long").as("__tok"))
      d.cube(col("len_class"), col("shard"))
        .agg(grouping_id().cast("long").as("gid"),
          count(lit(1)).as("n_docs"), sum(col("__tok")).as("n_tokens"))
        .select(col("len_class"), col("shard"), col("gid"),
          col("n_docs"), col("n_tokens"))
    }),

    // Z-ORDER LAYOUT (llm.Layout): Morton-interleave (hash(doc), length
    // scaled to 16 bits) and audit the per-cell bounding rectangles —
    // every 10-bit z-cell MUST cover < 2048 of each dimension, the
    // guarantee multi-dimensional file-skipping consumes. The oracle
    // replays the interleave bit-for-bit.
    "llm_zorder_layout" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(
        (llm.TextOps.h64c(concat(col("doc_id").cast("string"), lit(":dom")))
          % 65536L).as("x"),
        (least(length(col("text")).cast("long"), lit(1023L)) * 64L + 32L)
          .as("y"))
      llm.Layout.zLayoutStats(d, "x", "y", prefixBits = 5)
    }),

    // COMPACTION PLAN (llm.Layout): pack order-adjacent files of a
    // synthetic listing (one "file" per (source, doc_id div 100) slice,
    // sized by its char sum) into ~4 KiB bins, preserving layout order —
    // the small-file compaction step a z-ordered/range-sharded table
    // needs without interleaving distant key ranges. The running fill is
    // the tokenBudget two-level bucketed cumsum (no global-window task);
    // the oracle replays it as one plain global window.
    "llm_compaction_plan" -> ((s, dir) => {
      val files = t(s, dir, "documents")
        .groupBy((expr("CAST(substr(source, 4) AS BIGINT)") * 1000L +
          expr("doc_id div 100")).as("fid"))
        .agg(sum(col("n_chars")).as("bytes"))
      llm.Layout.compactionPlan(files, "fid", "bytes", targetBytes = 4096L)
    }),

    // Epoch/repeat-factor mixture plan: per-source token supply vs the
    // budget·weight target — exact integer epochs (millionths), the
    // repeat cap, and the deficit where supply runs out. The planner a
    // mixture designer iterates on before any sampler runs.
    "llm_epoch_plan" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val weights = docs.select(col("source")).distinct()
        .withColumn("weight_bp",
          lit(100L) + (expr("CAST(substr(source, 4) AS BIGINT)") % 5) * 50L)
      llm.Sampling.epochPlan(docs, "doc_id", "text", "source", weights,
        budgetTokens = 100000L, maxEpochsMicro = 1000000L)
    }),

    // Padding-waste audit of fixed-count batch packing: naive (id-order)
    // vs length-sorted batching, one summary row each — the measured
    // padding-FLOP fraction sorted batching recovers. Both global orders
    // rank via the two-level bucketed decomposition (no global sort).
    "llm_pack_efficiency" -> ((s, dir) => {
      llm.TextOps.packEfficiency(t(s, dir, "documents"), "doc_id", "text",
        batchSize = 16)
    }),

    // Exact token-budget cut: keep documents in deterministic hash order
    // until the cumulative token count crosses the budget — the
    // "exactly N training tokens" sampler. The running sum decomposes
    // into 1024 hash-prefix range buckets (offsets via one tiny window),
    // so no task ever sums the whole corpus.
    "llm_token_budget" -> ((s, dir) => {
      llm.Sampling.tokenBudget(t(s, dir, "documents"), "doc_id", "text",
        budget = 10000L)
    }),

    // Deterministic word-dropout augmentation: token drops iff
    // h64(id:salt:pos) % 100 < 15 — reproducible across engines and
    // re-runs; a new salt = a fresh epoch mask.
    "llm_word_dropout" -> ((s, dir) => {
      llm.TextOps.wordDropout(t(s, dir, "documents"), "doc_id", "text",
        pct = 15, salt = "ep1")
    }),

    // Text normalization (C4-style pre-dedup cleanup): URLs → <URL>,
    // tabs/CRs → spaces, space runs collapsed, trimmed. The corpus is
    // clean prose, so messy URLs + runs are salted in deterministically
    // and the oracle re-derives the identical salt.
    "llm_text_normalize" -> ((s, dir) => {
      val salted = t(s, dir, "documents")
        .withColumn("text2", concat(col("text"),
          when(col("doc_id") % 4 === 0,
            concat(lit("  visit   https://example.com/page"),
              (col("doc_id") % 50).cast("string"), lit("?ref=rss  now")))
            .otherwise(lit("")),
          when(col("doc_id") % 9 === 0, lit("\ttabbed\rtail")).otherwise(lit(""))))
      salted.select(col("doc_id"),
        llm.TextOps.urlCount(col("text2")).as("n_urls"),
        llm.TextOps.normalizeText(col("text2")).as("normalized_text"))
    }),

    // Exact-substring span REMOVAL: every duplicated 8-gram occurrence
    // except the globally first (min (doc, pos) per gram) is cut and the
    // text rebuilt from uncovered words — the transformation
    // llm_span_dedup measures, same salt.
    "llm_span_scrub" -> ((s, dir) => {
      val salted = t(s, dir, "documents")
        .withColumn("text2", concat(col("text"),
          when(col("doc_id") % 5 === 0,
            lit(" the quick brown fox jumps over the lazy dog again")).otherwise(lit("")),
          when(col("doc_id") % 7 === 0,
            lit(" all rights reserved this document is provided without any warranty")).otherwise(lit(""))))
      llm.TextOps.spanScrub(salted, "doc_id", "text2", k = 8, minDocs = 2L)
    }),

    // Per-doc top-3 keywords by tf·(N/df) — rational idf keeps every step
    // exact (integer product + one IEEE division), where log(N/df)'s last
    // ulp is libm-dependent and would make the top-k cut nondeterministic.
    "llm_tfidf_terms" -> ((s, dir) => {
      llm.TextOps.tfidfTopTerms(t(s, dir, "documents"), "doc_id", "text", 3)
    }),

    // Deterministic global shuffle + shard layout for training export:
    // shard = h64(id) mod 8, seq = rank by (h64, id) within the shard —
    // membership and order are pure functions of identity, reproducible
    // across engines and re-runs (what orderBy(rand()) can never give).
    "llm_shard_plan" -> ((s, dir) => {
      llm.Sampling.shardPlan(t(s, dir, "documents"), "doc_id", "text", 8)
    }),

    // Per-source corpus profile: doc/token counts, exact disc percentiles
    // computed off the length HISTOGRAM (no per-source window over docs —
    // sources are low-cardinality, a raw-rank window would straggle), and
    // per-source distinct vocabulary.
    "llm_corpus_profile" -> ((s, dir) => {
      llm.TextOps.corpusProfile(t(s, dir, "documents"), "doc_id", "text",
        "source")
    }),

    // Product quantization encode: code pairs + the exact reconstruction
    // cosine (storage honesty metric) against the SHARED prebuilt
    // codebooks — the standing-index encode path for new corpus batches
    // (one assignment pass per subspace, training lives in
    // llm_ann_index_build; deterministic training keeps the oracle's
    // replay identical).
    "llm_pq_encode" -> ((s, dir) => {
      llm.Ann.pqEncode(annCorpus(s, dir), sharedAnnIndex(s, dir).pq)
    }),

    // Standing-index UPDATE — the third verb of the index lifecycle
    // (build once / probe many / update incrementally): a new batch
    // (vec_id % 7 == 0) arrives AFTER the codebooks were trained on the
    // base corpus, and is encoded against those frozen books in one
    // assignment pass — genuine out-of-sample encode, no retraining. At
    // 100 TB this is the nightly-ingest path: train monthly, encode every
    // new shard against the standing books. The oracle replays the
    // base-only training, then encodes the batch.
    "llm_index_update" -> ((s, dir) => {
      val all = annCorpus(s, dir)
      val base = all.filter(col("nid") % 7 =!= 0)
      val batch = all.filter(col("nid") % 7 === 0)
      val idx = llm.Ann.buildPqIndex(base, step = 25, iters = 2)
      llm.Ann.pqEncode(batch, idx)
    }),

    // SQ8 standing-index UPDATE path: an out-of-sample batch (nid%7==0)
    // encoded against bounds trained on the REST of the corpus — new
    // vectors arrive, bounds stay frozen, out-of-range values saturate
    // to code 0/255 (the clamp in sqEncode). The PQ analogue is
    // llm_index_update.
    "llm_sq_update" -> ((s, dir) => {
      val all = annCorpus(s, dir)
      val bounds = llm.Ann.sqTrain(all.filter(col("nid") % 7 =!= 0))
      llm.Ann.sqEncode(all.filter(col("nid") % 7 === 0), bounds)
        .select(col("nid").as("vec_id"),
          posexplode(col("codes")).as(Seq("pos", "code")))
        .select(col("vec_id"), col("pos").cast("long").as("pos"), col("code"))
    }),

    // DSIR-style hashed-feature importance reweighting: documents scored
    // by how target-like (lang = 'en' as the trusted slice) their hashed
    // token distribution is — bucket census → Laplace-smoothed
    // BIT-RESOLUTION log-likelihood ratios (integer floor-log2 via the
    // binary string; no floating logarithm) → per-doc summed weight.
    // The 1024-row llr table broadcasts at any corpus size.
    "llm_importance_weights" -> ((s, dir) => {
      llm.Sampling.importanceWeights(t(s, dir, "documents"), "doc_id",
        "text", col("lang") === "en", buckets = 1024)
    }),

    // DSIR importance weights with the published recipe's FULL feature
    // set — unigrams plus adjacent-pair bigrams of the filtered token
    // sequence (lead() per doc; the 1024-cell llr table still broadcasts).
    "llm_importance_bigram" -> ((s, dir) => {
      llm.Sampling.importanceWeights(t(s, dir, "documents"), "doc_id",
        "text", col("lang") === "en", buckets = 1024, bigrams = true)
    }),

    // DSIR selection: the importance weights fed through the exact
    // top-p% histogram cut — "keep the 10% most target-like documents",
    // the composed data-selection pipeline (score → threshold → flag)
    // with no row ever sorted globally.
    "llm_importance_cut" -> ((s, dir) => {
      val w = llm.Sampling.importanceWeights(t(s, dir, "documents"),
          "doc_id", "text", col("lang") === "en", buckets = 1024)
        .withColumn("imp", col("imp_bits").cast("double"))
      llm.Sampling.qualityCut(w, "doc_id", "imp", pct = 10)
    }),

    // Hard-negative mining for contrastive training: a query's top
    // cosine neighbors EXCLUDING its own semantic-dedup cluster — near
    // but not duplicate, the pairs an embedding model learns most from.
    // Brute top-10 → drop clustermates → re-rank to 3.
    "llm_hard_negatives" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = llm.Ann.withQuantized(t(s, dir, "embeddings"), "embedding")
      val corpus = e.select(col("vec_id").as("nid"), col("vq"), col("norm2"))
      val queries = e.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("qid"), col("vq"), col("norm2"))
      // semantic-dedup blocking cells off the prebuilt index
      val mem = corpus.join(sharedAnnIndex(s, dir).cells, Seq("nid"))
        .withColumnRenamed("nid", "vec_id")
      val pairs = llm.Ann.nearDupPairs(mem, "vec_id", "cell", threshold = 0.35)
      val comp = llm.Clusters.connectedComponents(
        e.select(col("vec_id")), "vec_id", pairs, "id_a", "id_b")
      val cand = llm.Ann.bruteTopK(queries, corpus, 10)
        .join(comp.select(col("id").as("qid"), col("comp").as("qc")), Seq("qid"))
        .join(comp.select(col("id").as("nid"), col("comp").as("nc")), Seq("nid"))
        .filter(col("qc") =!= col("nc"))
      val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)
      cand.withColumn("neg_rank", row_number().over(w).cast("long"))
        .filter(col("neg_rank") <= 3)
        .select(col("qid"), col("neg_rank"), col("nid"), col("cos"))
    }),

    // PQ asymmetric-distance search: queries score the ENCODED corpus
    // through broadcast per-subspace lookup tables (two lookups + an add
    // per corpus vector — never a d-dim dot), ranked by cosine-against-
    // reconstruction. At scale this composes with IVF cells (IVF-PQ).
    "llm_pq_search" -> ((s, dir) => {
      // standing-index ADC search: probes the shared prebuilt codebooks
      llm.Ann.pqSearch(annQueries(s, dir), sharedAnnIndex(s, dir).pq, k = 3)
    }),

    // IVF-PQ search: the production ANN layout — coarse cells prune the
    // corpus, PQ codes + broadcast LUTs score the survivors. Per query:
    // (corpus/nCells)·nProbe lookup-adds, never a d-dim dot.
    "llm_ivfpq_search" -> ((s, dir) => {
      // the standing-index search path: probes the parquet-loaded index,
      // no training inside the call (build-once/probe-many)
      llm.Ann.ivfPqSearch(annQueries(s, dir), sharedAnnIndex(s, dir),
        k = 3, nProbe = 2)
    }),

    // PQ recall gate: recall@3 of ADC search against brute-force truth —
    // what two 20-centroid subspace codebooks actually buy (measured 0.40
    // at sf0.01); the same honesty metric the ANN paths carry.
    "llm_pq_recall" -> ((s, dir) => {
      val corpus = annCorpus(s, dir)
      val queries = annQueries(s, dir)
      val truth = llm.Ann.bruteTopK(queries, corpus, 3)
      // standing-index search (shared prebuilt codebooks, no retraining)
      val pq = llm.Ann.pqSearch(queries, sharedAnnIndex(s, dir).pq, k = 3)
      llm.Ann.recallAtK("pq_adc", truth, pq)
    }),

    // IVF-PQ recall gate + the exact re-rank tier: recall@3 of (a) raw
    // cell-restricted ADC and (b) ADC top-20 shortlist → exact
    // integer-cosine re-rank → top-3, both against brute truth. The
    // re-rank stage is how production PQ recovers accuracy: within
    // probed cells it returns exactly what brute force would, so its
    // recall equals the coarse tier's cell recall.
    "llm_ivfpq_recall" -> ((s, dir) => {
      val corpus = annCorpus(s, dir)
      val queries = annQueries(s, dir)
      val truth = llm.Ann.bruteTopK(queries, corpus, 3)
      // probes the shared prebuilt index (build-once/probe-many)
      val idx = sharedAnnIndex(s, dir)
      val adc = llm.Ann.ivfPqSearch(queries, idx, k = 3, nProbe = 2)
      val rr = llm.Ann.ivfPqSearchRerank(queries, corpus, idx, k = 3,
        nProbe = 2, shortlist = 20)
      llm.Ann.recallAtK("ivfpq_adc", truth, adc)
        .unionByName(llm.Ann.recallAtK("ivfpq_rerank", truth, rr))
    }),

    // Scalar quantization (SQ8) encode: per-dimension trained min/max
    // bounds → 8-bit codes, the storage tier between raw vectors and PQ
    // (per-coordinate fidelity at 8 bits/dim). Exploded (vec_id, pos,
    // mn, mx, code) rows for the %25 sample pin the trained bounds AND
    // every code against the oracle's replay of the same train+encode.
    "llm_sq_encode" -> ((s, dir) => {
      val corpus = annCorpus(s, dir)
      val bounds = llm.Ann.sqTrain(corpus)
      llm.Ann.sqEncode(corpus.filter(col("nid") % 25 === 0), bounds)
        .select(col("nid").as("vec_id"), col("mns"), col("mxs"),
          posexplode(col("codes")).as(Seq("pos", "code")))
        .select(col("vec_id"), col("pos").cast("long").as("pos"),
          expr("element_at(mns, pos + 1)").as("mn"),
          expr("element_at(mxs, pos + 1)").as("mx"),
          col("code"))
    }),

    // SQ8 asymmetric search: queries score the encoded corpus through the
    // exact 255-scaled integer reconstruction (the SQ analogue of PQ's
    // ADC) — corpus never shuffles, query batch broadcasts. Standing-index
    // form: probes the LOADED shared SQ index (build-once/probe-many);
    // deterministic training keeps the oracle's inline replay identical.
    "llm_sq_search" -> ((s, dir) => {
      llm.Ann.sqSearch(annQueries(s, dir), sharedSqIndex(s, dir), k = 3)
    }),

    // SQ8 standing-index build: the one-time bounds-train + corpus-encode
    // cost every probe row amortizes (mirrors llm_ann_index_build) —
    // component row counts of the persisted parquet artifacts.
    "llm_sq_index" -> ((s, dir) => {
      val idx = sharedSqIndex(s, dir)
      Seq(("bounds", idx.bounds), ("codes", idx.codes))
        .map { case (name, df) =>
          df.agg(count(lit(1)).cast("long").as("n_rows"))
            .select(lit(name).as("component"), col("n_rows"))
        }
        .reduce(_ unionByName _)
    }),

    // SQ8 recall gate: recall@3 of reconstruction-ranked search against
    // brute truth — what 8-bit per-coordinate storage actually costs
    // (SQ recall runs far above PQ's: per-dim bounds lose only grid
    // resolution, not subspace structure).
    "llm_sq_recall" -> ((s, dir) => {
      val corpus = annCorpus(s, dir)
      val queries = annQueries(s, dir)
      val truth = llm.Ann.bruteTopK(queries, corpus, 3)
      llm.Ann.recallAtK("sq_adc", truth, llm.Ann.sqSearch(queries, corpus, 3))
    }),

    // Sparse random projection (Johnson–Lindenstrauss) to 16 dims: signs
    // from an explicit integer LCG over (j,k) — no stored matrix, any
    // engine replays it bit-exactly. Exploded (vec_id, k, y) for the %25
    // sample pins every projected coordinate.
    "llm_rp_project" -> ((s, dir) => {
      llm.Ann.rpProject(annCorpus(s, dir).filter(col("nid") % 25 === 0), 16)
        .select(col("nid").as("vec_id"), posexplode(col("rp")).as(Seq("k", "y")))
        .select(col("vec_id"), col("k").cast("long").as("k"), col("y"))
    }),

    // Brute top-k in the projected space: the d/dOut× cheaper scoring
    // tier reduction buys — same ranking law, 16-dim integer dots.
    "llm_rp_topk" -> ((s, dir) => {
      llm.Ann.rpTopK(annQueries(s, dir), annCorpus(s, dir), dOut = 16, k = 3)
    }),

    // 64-bit binary sign sketch (two 32-bit words — engine-safe shifts):
    // 8 bytes per vector, the cheapest ANN storage tier. %25 sample pins
    // every packed word against the oracle's replay.
    "llm_bin_sketch" -> ((s, dir) => {
      llm.Ann.binSketch(annCorpus(s, dir).filter(col("nid") % 25 === 0))
        .select(col("nid").as("vec_id"), col("blo"), col("bhi"))
    }),

    // Hamming top-k over the sign sketches: two XOR+POPCNT per candidate
    // pair — the binary shortlist tier, same (distance, nid) tie law.
    "llm_hamming_topk" -> ((s, dir) => {
      llm.Ann.hammingTopK(annQueries(s, dir), annCorpus(s, dir), k = 3)
    }),

    // Hamming recall gate: what 1-bit-per-dimension quantization costs
    // vs exact cosine truth — the price tag on the 64× memory cut.
    "llm_hamming_recall" -> ((s, dir) => {
      val corpus = annCorpus(s, dir)
      val queries = annQueries(s, dir)
      val truth = llm.Ann.bruteTopK(queries, corpus, 3)
      llm.Ann.recallAtK("hamming64", truth,
        llm.Ann.hammingTopK(queries, corpus, 3))
    }),

    // Two-stage binary search: Hamming shortlist-16 → exact cosine
    // re-rank to top-3 (full-precision vectors touched only for
    // |q|·16 candidates), plus the recall the refine stage recovers
    // over the raw Hamming tier — one frame, both rows.
    "llm_hamming_rerank" -> ((s, dir) => {
      llm.Ann.hammingRerank(annQueries(s, dir), annCorpus(s, dir),
        k = 3, shortlist = 16)
    }),
    "llm_hamming_rerank_recall" -> ((s, dir) => {
      val corpus = annCorpus(s, dir)
      val queries = annQueries(s, dir)
      val truth = llm.Ann.bruteTopK(queries, corpus, 3)
      llm.Ann.recallAtK("hamming64_rerank16", truth,
        llm.Ann.hammingRerank(queries, corpus, k = 3, shortlist = 16))
    }),

    // Hamming recall CURVE: rerank recall@3 vs shortlist breadth
    // k × {2, 4, 8} — the cost/recall price list of the 8-byte tier,
    // mirroring llm_ivf_probe_curve's nProbe sweep. Each widening of the
    // shortlist multiplies only the full-precision re-rank work
    // (|q|·shortlist exact dots); the corpus-wide scan stays 8 B/vector.
    "llm_hamming_curve" -> ((s, dir) => {
      val corpus = annCorpus(s, dir)
      val queries = annQueries(s, dir)
      val truth = llm.Ann.bruteTopK(queries, corpus, 3)
      Seq(6, 12, 24).map { sl =>
        llm.Ann.recallAtK(s"hamming_sl$sl", truth,
          llm.Ann.hammingRerank(queries, corpus, k = 3, shortlist = sl))
      }.reduce(_ unionByName _)
    }),

    // JL recall gate: recall@3 of projected-space ranking against
    // original-space brute truth at dOut = 16 AND 32 — the measured
    // distortion/dimension tradeoff curve the reduction is priced by.
    "llm_rp_recall" -> ((s, dir) => {
      val corpus = annCorpus(s, dir)
      val queries = annQueries(s, dir)
      val truth = llm.Ann.bruteTopK(queries, corpus, 3)
      llm.Ann.recallAtK("rp16", truth,
          llm.Ann.rpTopK(queries, corpus, dOut = 16, k = 3))
        .unionByName(llm.Ann.recallAtK("rp32", truth,
          llm.Ann.rpTopK(queries, corpus, dOut = 32, k = 3)))
    }),

    // Distributed Gram/covariance: ONE corpus pass through a mergeable
    // constant-state aggregator (d(d+1)/2 + d + 1 longs) — upper-triangle
    // products + sums + count, with exact-integer mean centering
    // ncov = N·G − S_j·S_k. The frame is d² rows regardless of corpus size.
    "llm_gram_matrix" -> ((s, dir) => {
      llm.Pca.gramRows(s, llm.Pca.fit(annCorpus(s, dir)))
    }),

    // Two-pass SHIFTED Gram — the overflow-regime production form: pass 1
    // aggregates integer per-dim means (d+1 longs of state), pass 2 runs
    // the same Gram aggregator over the mean-shifted grid. `g` here is the
    // SHIFTED Gram (magnitudes re-centered, the 64-bit headroom win) while
    // `ncov` equals the one-pass row's ncov EXACTLY — the shift-invariance
    // law the oracle re-derives relationally from scratch.
    "llm_gram_shifted" -> ((s, dir) => {
      llm.Pca.gramRows(s, llm.Pca.fitShifted(annCorpus(s, dir)).model)
    }),

    // Incremental Gram maintenance: the corpus is fitted as two DISJOINT
    // halves and the models merged (moments are plain sums) — while the
    // ORACLE replays one whole-corpus Gram directly, so the hash match
    // proves base+delta merge ≡ full refit end to end (the law that lets
    // a daily ingest update the covariance without rescanning history).
    "llm_gram_incremental" -> ((s, dir) => {
      val corpus = annCorpus(s, dir)
      val base = llm.Pca.fit(corpus.filter(col("nid") % 2 === 0), iters = 0)
      val delta = llm.Pca.fit(corpus.filter(col("nid") % 2 === 1), iters = 0)
      llm.Pca.gramRows(s, llm.Pca.merge(base, delta))
    }),

    // PCA dominant direction: 12 fixed integer power-iteration sweeps over
    // the scaled covariance (sign-truncating rescale to |c| ≤ 1e6,
    // |w| ≤ 1e5 per sweep) — Rayleigh ≥ 0.9·λ1 even on this corpus's
    // near-isotropic spectrum (PcaSpec pins the quality contract).
    "llm_pca_power" -> ((s, dir) => {
      llm.Pca.componentRows(s, llm.Pca.fit(annCorpus(s, dir)))
    }),

    // The G'-eigensolve: power iteration over the SHIFTED Gram alone —
    // the billion-row production path where the N²-scale centered ncov
    // no longer fits 64 bits but the N-scale shifted Gram does (rank-1
    // residual < N² per entry, negligible on any non-degenerate corpus).
    // The oracle replays means → shifted Gram → the identical
    // scale-and-sweep chain from scratch.
    "llm_pca_shifted_power" -> ((s, dir) => {
      llm.Pca.componentRows(s,
        llm.Pca.componentFromShiftedGram(llm.Pca.fitShifted(annCorpus(s, dir))))
    }),

    // Projection onto the fitted component: a broadcast-literal integer
    // dot per row — map-side only, the corpus never shuffles. %5 sample.
    "llm_pca_project" -> ((s, dir) => {
      val corpus = annCorpus(s, dir)
      llm.Pca.project(corpus.filter(col("nid") % 5 === 0),
          llm.Pca.fit(corpus))
        .select(col("nid").as("vec_id"), col("y"))
    }),

    // MMR-diversified rerank: brute top-8 candidates per query, then 3
    // greedy picks maximizing rel − max-sim-to-picked — the standard
    // diversification pass between retrieval and a context window. The
    // corpus is scanned once; the greedy steps run on the checkpointed
    // |q|·m candidate frame with m²-per-query sims, never corpus pairs.
    "llm_mmr_rerank" -> ((s, dir) => {
      llm.Ann.mmrRerank(annQueries(s, dir), annCorpus(s, dir), m = 8, k = 3)
    }),

    // k-anonymity audit over a quasi-identifier generalization ladder
    // (lang/source/length-bin, coarsening rung by rung): per-record
    // minimal safe rung, returned as the disclosure-risk histogram.
    // Four partial-aggregated census frames, AQE-decided joins (no
    // pinned broadcasts — L0 combo cardinality is data-derived).
    "llm_kanon_audit" -> ((s, dir) => {
      llm.TextOps.kAnonLevels(t(s, dir, "documents"), k = 5)
    }),

    // Cross-source quantile calibration: each source's micro-quantized
    // quality score maps onto the pooled distribution via exact integer
    // rank arithmetic — histograms rank, rows never sort; the only
    // non-equi join is histogram × broadcast-histogram. %20 sample.
    "llm_score_calibrate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("ws", llm.TextOps.words("text"))
        .withColumn("score_micro",
          floor(llm.TextOps.qualityScore * lit(1000000.0)).cast("long"))
      llm.Sampling.calibrateScores(docs, "doc_id", "source", "score_micro")
        .filter(col("doc_id") % 20 === 0)
        .select(col("doc_id"), col("source"), col("score_micro"),
          col("src_rank"), col("mapped_rank"), col("calib_micro"))
    }),

    // Calibration-effect gate: per-source exact integer KS statistic of
    // the calibrated distribution vs the pooled distribution — the "did
    // calibration align the feeds" audit (it caught min-rank tie
    // collapse: 0.49 max gap vs midrank's 0.10). Cross-multiplied
    // integers, one row per source.
    "llm_calibrate_ks" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("ws", llm.TextOps.words("text"))
        .withColumn("score_micro",
          floor(llm.TextOps.qualityScore * lit(1000000.0)).cast("long"))
      val calibrated = llm.Sampling.calibrateScores(docs, "doc_id",
        "source", "score_micro")
      llm.Sampling.calibrationKs(calibrated, "source", "calib_micro")
    }),

    // Leakage-safe split: near-dup CLUSTERS (not documents) hash into
    // train/test, so no near-duplicate pair straddles the split — the
    // audit column proves it (n_cross_pairs is COMPUTED, and 0).
    "llm_cluster_split" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = llm.TextOps.minhashNearDups(docs, "doc_id", "text",
        threshold = 0.5).localCheckpoint()
      val asg = llm.Clusters.leakageSafeSplit(docs.select(col("doc_id")),
        "doc_id", pairs, "id_a", "id_b", trainPct = 80).localCheckpoint()
      val cross = pairs
        .join(asg.select(col("doc_id").as("id_a"), col("split").as("__sa")),
          Seq("id_a"))
        .join(asg.select(col("doc_id").as("id_b"), col("split").as("__sb")),
          Seq("id_b"))
        .filter(col("__sa") =!= col("__sb"))
        .agg(count(lit(1)).as("n_cross_pairs"))
      asg.groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("cluster_id")).as("n_clusters"))
        .crossJoin(broadcast(cross))
    }),

    // Robust outlier gate: exact median + MAD off a ONE-scan value
    // histogram (deviation histogram derives from the value histogram,
    // never from rows), k = 2 fence, one audit row.
    "llm_mad_outliers" -> ((s, dir) => {
      llm.Sketches.madOutliers(t(s, dir, "documents"), "n_chars", k = 2)
    }),

    // Per-source robust fence: the same exact median/MAD law WITHIN each
    // feed — a clean feed's outliers vanish inside a global gate when
    // another feed's tail dominates. Keyed two-level folds; one row per
    // source.
    "llm_mad_by_source" -> ((s, dir) => {
      llm.Sketches.madOutliersByKey(t(s, dir, "documents"), "source",
        "n_chars", k = 2)
    }),

    // Quality-aware canonical pick: each multi-member near-dup cluster
    // elects its highest-scoring member (tie → lowest id) via a
    // skew-absorbing max(struct) partial aggregate — the representative
    // selection real curation runs instead of keep-min-id.
    "llm_best_of_cluster" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("ws", llm.TextOps.words("text"))
        .withColumn("score_micro",
          floor(llm.TextOps.qualityScore * lit(1000000.0)).cast("long"))
      val pairs = llm.TextOps.minhashNearDups(docs, "doc_id", "text",
        threshold = 0.5)
      llm.Clusters.bestOfCluster(docs, "doc_id", "score_micro",
        pairs, "id_a", "id_b")
    }),

    // Class-prototype similarity: integer centroid SUMS per label (one
    // posexplode partial agg — cosine is scale-invariant, so sums need
    // no division), then the |labels|² broadcast pair cosine audit.
    "llm_label_centroids" -> ((s, dir) => {
      val e = llm.Ann.withQuantized(t(s, dir, "embeddings"), "embedding")
        .select(col("label"), col("vq"))
      llm.Ann.labelCentroidCosine(e, "label")
    }),

    // Perceptual image near-dup: REAL ImageIO decode → 8×8 integer aHash
    // (two 32-bit words) → pairwise hamming. Seed 3 reappears at 26×22
    // (a recrop of image 3's 25×22) and lands at hamming 6; unrelated
    // seeds sit 13–30 apart; the junk payload takes the sentinel and is
    // excluded. At corpus scale the pair join routes the words through
    // the Charikar block scheme (simhashNearDups) instead.
    "llm_image_phash" -> ((s, dir) => {
      import s.implicits._
      import llm.Multimodal.{MediaItem, MediaMeta}
      val pngs = s.range(1, 5).map { id =>
        MediaItem(id, "image/png",
          llm.Multimodal.syntheticPng2(id, 16 + id.toInt * 3, 16 + id.toInt * 2),
          MediaMeta(0, 0, 0L, "png"))
      }
      val variant = s.range(103, 104).map { id =>
        MediaItem(id, "image/png", llm.Multimodal.syntheticPng2(3, 26, 22),
          MediaMeta(0, 0, 0L, "png"))
      }
      val junk = s.range(99, 100).map { id =>
        MediaItem(id, "image/png", "not an image".getBytes("UTF-8"),
          MediaMeta(0, 0, 0L, "png"))
      }
      val h = llm.Multimodal.aHash(pngs.union(variant).union(junk)).toDF()
        .filter(col("decoded"))
      val a = h.select(col("mediaId").as("id_a"), col("hashHi").as("ha"),
        col("hashLo").as("la"))
      val b = h.select(col("mediaId").as("id_b"), col("hashHi").as("hb"),
        col("hashLo").as("lb"))
      a.join(b, col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          expr("CAST(bit_count(ha ^ hb) + bit_count(la ^ lb) AS BIGINT)")
            .as("hamming"))
        .withColumn("near", col("hamming") <= 8)
    }),

    // Perceptual near-dup at CORPUS scale: one synthetic raster per
    // document row (sf-proportional — real ImageIO decode per image),
    // aHash words, then the Charikar BLOCK join (never all-pairs; the
    // pigeonhole makes radius ≤ 3 lossless over 4 16-bit blocks).
    // Pattern seeds cycle mod 256 and crop sizes cycle with doc_id, so
    // exact-dup pairs are planted throughout; output is the hamming
    // histogram + an id checksum — constant-size however many pairs the
    // corpus plants.
    "llm_image_phash_scale" -> ((s, dir) => {
      import s.implicits._
      import llm.Multimodal.{MediaItem, MediaMeta}
      val items = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .map { id =>
          val m = id / 256
          MediaItem(id, "image/png",
            llm.Multimodal.syntheticPng2(id % 256,
              16 + (m % 5).toInt, 16 + (m % 3).toInt),
            MediaMeta(0, 0, 0L, "png"))
        }
      val h = llm.Multimodal.aHash(items).toDF().filter(col("decoded"))
      llm.Multimodal.aHashNearDups(h, maxHamming = 3)
        .groupBy(col("hamming"))
        .agg(count(lit(1)).cast("long").as("n_pairs"),
          sum(col("id_a") + col("id_b")).as("id_checksum"))
    }),

    // Tokenizer fertility audit: chars-per-token by language, for both
    // the whitespace and BPE-ish tokenizations — the fairness check run
    // before trusting a shared token budget across languages (a
    // tokenizer that fragments one language inflates its effective
    // cost). One partial aggregation; ratios as exact integer micros.
    "llm_token_fertility" -> ((s, dir) => {
      t(s, dir, "documents")
        .withColumn("ws", llm.TextOps.words("text"))
        .select(Seq(col("lang"), col("n_chars")) ++ llm.TextOps.tokenCounts: _*)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          sum(col("n_ws_tokens")).as("sum_ws_tokens"),
          sum(col("n_bpeish_tokens")).as("sum_bpeish_tokens"))
        .withColumn("chars_per_ws_micro",
          expr("sum_chars * 1000000 div sum_ws_tokens"))
        .withColumn("chars_per_bpeish_micro",
          expr("sum_chars * 1000000 div sum_bpeish_tokens"))
    }),

    // Language confusion matrix: declared `lang` vs the stopword-census
    // prediction — the label-noise audit a mixed-source corpus runs
    // before trusting per-language budgets. Two partial aggs + a
    // lang-cardinality join; shares as integer basis points.
    "llm_lang_confusion" -> ((s, dir) => {
      val pred = t(s, dir, "documents")
        .withColumn("ws", llm.TextOps.words("text"))
        .select(Seq(col("doc_id"), col("lang")) ++ llm.TextOps.langIdColumns: _*)
        .withColumn("pred_lang", llm.TextOps.predictedLang)
      val conf = pred.groupBy(col("lang"), col("pred_lang"))
        .agg(count(lit(1)).as("n"))
      val tot = pred.groupBy(col("lang")).agg(count(lit(1)).as("__t"))
      conf.join(tot, Seq("lang"))
        .withColumn("pct_bp", expr("n * 10000 div __t"))
        .select(col("lang"), col("pred_lang"), col("n"), col("pct_bp"))
    }),

    // MMR over IVF candidates: the diversification pass fed by the
    // standing index's cell-pruned top-8 instead of brute force — the
    // tier-agnostic composition mmrRerankFrom exists for. Corpus-side
    // cost is the IVF probe; the greedy runs on the |q|·m frame.
    "llm_mmr_ivf" -> ((s, dir) => {
      val idx = sharedAnnIndex(s, dir)
      val queries = annQueries(s, dir)
      val corpus = annCorpus(s, dir)
      val top = llm.Ann.ivfTopK(queries, corpus, idx.coarse, idx.cells,
        k = 8, nProbe = 2)
      llm.Ann.mmrRerankFrom(top, corpus, k = 3)
    }),

    // Retrieval evaluation harness: label-relevance MRR / precision@k of
    // the brute ranking — all-integer per query (rr_micro = 1e6 div
    // first relevant rank), the eval row any ANN tier slots into.
    "llm_retrieval_eval" -> ((s, dir) => {
      val e = llm.Ann.withQuantized(t(s, dir, "embeddings"), "embedding")
      val q = e.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("qid"), col("vq"), col("norm2"),
          col("label").as("qlabel"))
      val c = e.select(col("vec_id").as("nid"), col("vq"), col("norm2"))
      val top = llm.Ann.bruteTopK(
        q.select(col("qid"), col("vq"), col("norm2")), c, 3)
      val labeled = top
        .join(e.select(col("vec_id").as("nid"), col("label").as("nlabel")),
          Seq("nid"))
        .join(broadcast(q.select(col("qid"), col("qlabel"))), Seq("qid"))
        .withColumn("rel", (col("nlabel") === col("qlabel")).cast("long"))
      labeled.groupBy(col("qid"))
        .agg(sum(col("rel")).as("n_rel_at_3"),
          min(when(col("rel") === 1L, col("rank"))).as("first_rel_rank"))
        .withColumn("rr_micro",
          coalesce(expr("1000000 div first_rel_rank"), lit(0L)))
        .withColumn("first_rel_rank", coalesce(col("first_rel_rank"), lit(0L)))
    }),

    // BPE merge-pair statistics: the corpus-weighted adjacent-char-pair
    // counts tokenizer training maximizes — top-32, counted over the
    // vocab-sized word-frequency table, never the raw token stream.
    "llm_bpe_pairs" -> ((s, dir) => {
      llm.TextOps.bpePairStats(t(s, dir, "documents"), "doc_id", "text", 32)
    }),

    // Cross-source duplication matrix: which feeds duplicate each other —
    // banded MinHash pairs (no all-pairs) joined back to doc→source,
    // least/greatest canonicalizes to the upper triangle.
    "llm_source_overlap" -> ((s, dir) => {
      llm.TextOps.sourceOverlap(t(s, dir, "documents"), "doc_id", "text",
        "source", threshold = 0.5)
    }),

    // Streaming ingest dedup: content-hash keyed min-id fold via
    // flatMapGroupsWithState — first-crawled copy wins, re-crawls drop.
    // A deterministic re-crawl is salted in (every doc_id%10=3 re-arrives
    // under id+1000000 through a self-union of the stream), and the
    // update-mode sink is folded to the per-key minimum so the result is
    // micro-batch-boundary-proof and equals SQL min(id) GROUP BY hash.
    "llm_stream_dedup" -> ((s, dir) => {
      import s.implicits._
      val stream = s.readStream
        .schema("doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG")
        .option("pathGlobFilter", "documents.parquet")
        .parquet(dir)
        .select(col("doc_id"), col("text"))
      val recrawl = stream.filter(col("doc_id") % 10 === 3)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      val keyed = stream.unionByName(recrawl)
        .select(llm.TextOps.h64c(col("text")).as("_1"), col("doc_id").as("_2"))
        .as[(Long, Long)]
      val q = streaming.StreamOps.minIdPerKey(keyed)
        .writeStream.format("memory").queryName("llm_stream_dedup_out")
        .outputMode("update")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      s.table("llm_stream_dedup_out")
        .groupBy(col("key").as("content_hash"))
        .agg(min(col("min_id")).as("first_doc_id"))
        .select(col("content_hash"), col("first_doc_id"))
    }),

    // Curriculum-ordered export: shard layout as llm_shard_plan, but
    // within-shard order is (quality bin DESC, hash, id) — every shard
    // streams its best documents first (easy-to-hard schedule).
    "llm_curriculum_plan" -> ((s, dir) => {
      llm.Sampling.curriculumPlan(t(s, dir, "documents"), "doc_id",
        nShards = 8, nBins = 10)
    }),

    // End-to-end curation pipeline — the g14_full_dag analogue for the
    // LLM surface: URL front gate (canonicalize → registrable domain →
    // per-domain cap, the web-scale crawl tamer) → normalize → line dedup
    // → span scrub → Gopher quality gate → MinHash cluster dedup
    // (canonical keeps) → decontaminate against the eval split → domain
    // mixing → curriculum-ordered shard plan. One shared deterministic
    // salt gives every stage real work; each stage's contract is what its
    // standalone row already pins, so this row exists to catch
    // COMPOSITION bugs (column contracts, lost rows, double transforms).
    // The oracle recomputes the entire chain. The eval split and source
    // lookup read the RAW table — decontamination guards against the
    // full eval set, not just the part that survived the crawl gate.
    "llm_full_pipeline" -> ((s, dir) => {
      val docsAll = t(s, dir, "documents")
      // 0. URL front gate: same synthetic-URL scheme + cap as llm_url_ops
      val withUrl = docsAll.select(col("doc_id"),
        concat(lit("HTTPS://"),
          when(col("doc_id") % 11 === 0,
            concat(lit("WWW.Site"), (col("doc_id") % 3).cast("string"),
              lit(".CO.UK")))
            .otherwise(concat(lit("WWW.Example"),
              (col("doc_id") % 7).cast("string"), lit(".COM"))),
          lit("/Path"), col("doc_id").cast("string"),
          lit("?utm_source=feed&id="), (col("doc_id") % 30).cast("string"),
          lit("&fbclid=xyz#frag")).as("url"))
      val canon0 = withUrl
        .withColumn("canon_url", llm.TextOps.canonicalUrlCol("url"))
        .withColumn("domain", llm.TextOps.urlDomainCol("canon_url"))
      val kept0 = llm.TextOps.perDomainCapAgg(canon0, "doc_id", "domain",
          cap = 40)
        .filter(col("kept")).select(col("doc_id"))
      val docs = docsAll.join(kept0, Seq("doc_id"))
      val salted = docs.withColumn("text0", concat(col("text"),
        when(col("doc_id") % 4 === 0,
          concat(lit("  visit   https://example.com/page"),
            (col("doc_id") % 50).cast("string"), lit("?ref=rss  now")))
          .otherwise(lit("")),
        when(col("doc_id") % 5 === 0,
          lit(" the quick brown fox jumps over the lazy dog again")).otherwise(lit("")),
        when(col("doc_id") % 3 === 0,
          lit("\nsubscribe to our newsletter today")).otherwise(lit(""))))
      // 1. C4-style normalization (URLs → <URL>, ctl chars, space runs)
      val norm = salted.select(col("doc_id"),
        llm.TextOps.normalizeText(col("text0")).as("t1"))
      // 2. corpus-level line dedup (boilerplate removal)
      val ld = llm.TextOps.lineDedup(norm, "doc_id", "t1", minDocs = 10L)
        .select(col("doc_id"), col("cleaned_text").as("t2"))
        // spanScrub consumes its input from several internal branches
        // (gram census, occurrence join, word rebuild) — truncate so the
        // normalize+lineDedup chain runs once
        .localCheckpoint()
      // 3. exact-substring span removal (keep-first canonical)
      val ss = llm.TextOps.spanScrub(ld, "doc_id", "t2", k = 8, minDocs = 2L)
        .select(col("doc_id"), col("cleaned_text").as("text"))
      // 4. Gopher quality gate
      val q = ss
        .withColumn("ws", llm.TextOps.words("text"))
        .withColumn("lines", llm.TextOps.docLines)
        .withColumn("g2", llm.TextOps.wordBigrams)
        .select(Seq(col("doc_id"), col("text"), col("ws")) ++
          llm.TextOps.repetitionColumns: _*)
        .filter(llm.TextOps.gopherKeep)
        .select(col("doc_id"), col("text"))
        // stage boundary with THREE consumers (pair mining, the cluster
        // universe, the canonical join): truncate lineage so the
        // normalize→lineDedup→spanScrub chain runs once, not per branch —
        // the in-query analogue of materializing stage outputs between
        // pipeline steps (which is what a real 100 TB run does)
        .localCheckpoint()
      // 5. near-dup cluster dedup: the min-id canonical member survives
      val pairs = llm.TextOps.minhashNearDups(q, "doc_id", "text",
        threshold = 0.5)
      val cc = llm.Clusters.dedupClusters(q.select(col("doc_id")), "doc_id",
        pairs, "id_a", "id_b")
      val canon = q.join(cc.filter(col("is_canonical")).select(col("doc_id")),
          Seq("doc_id"))
        // two consumers (contamination flags + the clean join) and the
        // iterative cluster closure upstream — truncate again
        .localCheckpoint()
      // 6. decontamination vs the RAW eval split: the eval docs
      // themselves (still near-identical post-transform) and anything
      // sharing an 8-gram with them drop out of training
      val evalSet = docsAll.filter(col("doc_id") % 100 === 0)
        .select(col("doc_id"), col("text"))
      val flags = llm.TextOps.contaminationFlags(canon, evalSet,
        "doc_id", "text", k = 8)
      val clean = canon.join(
        flags.filter(!col("contaminated")).select(col("doc_id")), Seq("doc_id"))
      // 7. domain mixing toward target token shares
      val withSrc = clean.join(docsAll.select(col("doc_id"), col("source")),
          Seq("doc_id"))
        // two consumers: the mix-rate derivation and the final plan join
        .localCheckpoint()
      val mixed = llm.Sampling.domainMix(withSrc, "doc_id", "text", "source",
        Map("src0" -> 5000L, "src1" -> 2000L), defaultBp = 100L)
      // 8. curriculum-ordered shard plan over the final corpus
      llm.Sampling.curriculumPlan(
        withSrc.join(mixed.filter(col("keep")).select(col("doc_id")),
          Seq("doc_id")),
        "doc_id", nShards = 8, nBins = 10)
    }),

    // S2b — stateful streaming reduction via mapGroupsWithState: the
    // EARLIEST event per user by (event time, event id). Unlike
    // arrival-order first-wins, the fold is deterministic across
    // micro-batch boundaries, so it verifies against an exact SQL oracle.
    "s2b_stream_state" -> ((s, dir) => {
      import s.implicits._
      // micros, matching the oracle's timestamp precision; encoding
      // normalization (legacy nanos vs native micros) lives in Tables
      val stream = Tables.eventsStream(s, dir)
        .select(col("user_id"), col("ts_us").as("ts"), col("event_id"),
          col("event_type"))
        .as[streaming.StreamOps.Event]
      val q = streaming.StreamOps.firstEventPerKey(stream)
        .writeStream.format("memory").queryName("s2b_stream_state_out")
        .outputMode("update")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      // Update-mode sinks append one row per (key, improving batch): if the
      // AvailableNow source ever splits events.parquet into >1 micro-batch,
      // superseded per-key rows would remain in the table. Fold the sink to
      // each key's (ts, event_id)-minimum so the result is one row per key
      // regardless of micro-batch boundaries.
      s.table("s2b_stream_state_out").toDF()
        .groupBy(col("user_id"))
        .agg(min(struct(col("first_ts"), col("first_event_id"),
          col("first_event_type"))).as("m"))
        .select(col("user_id"), col("m.first_ts").as("first_ts"),
          col("m.first_event_id").as("first_event_id"),
          col("m.first_event_type").as("first_event_type"))
    }),

    // F2 (CIViC variant-name normalization grammar,
    // civic/variant.js:20-257): one raw name → N normalized records inside
    // flatMap; jest corpus transcribed in CivicNamesSpec, output frozen in
    // the oracle.
    "f2_civic_names" -> ((s, dir) => {
      import s.implicits._
      import variant.CivicNames._
      // one case per non-skipped jest family in
      // test/civic/civic.variant.test.js (normalizeGeneVariant :124-777,
      // normalizeFactorVariant :80-93, normalizeFusionVariant :94-123)
      val cases: Seq[(Long, String, String)] = Seq(
        (1L, "EXON 12 MUTATION", "gene"), (2L, "ALK FUSION G1202R", "ALK"),
        (3L, "EML4-ALK G1202R-L1198F", "alk"), (4L, "S111C (c.330CA>TT)", "NTRK1"),
        (5L, "t(9;22)(q34;q11)", "ABL1"), (6L, "R132H", "NTRK1"),
        (7L, "EML4-ALK E20;A20", "ALK"), (8L, "NRG1 fusions", "NRG1"),
        (9L, "DELETRIOUS MUTATION", "gene"), (10L, "Y1234 phosphorylation", "gene"),
        (11L, "UNDEREXPRESSION", "NTRK1"), (12L, "E46* (c.136G>T)", "ALK"),
        (13L, "DNA BINDING DOMAIN MUTATION", "NTRK1"), (14L, "c.123G>T", "ABL1"),
        (15L, "exon 2-3 deletion", "ABL1"), (16L, "t133lfs*26 (c.397dela)", "ALK"),
        (17L, "ABL1 mutations", "ABL1"), (18L, "mutations", "ABL1"),
        (19L, "exon 3 mutations", "ABL1"), (20L, "F547 SPLICE SITE MUTATION", "ALK"),
        (21L, "r79_s80del (c.236_241delgcagtc)", "ALK"),
        (22L, "r82_v84del (c.244_252del)", "ALK"),
        (23L, "p.s193_c196dupstsc (c.577_588dupagcaccagctgc)", "ALK"),
        (24L, "G12/G13", "KRAS"), (25L, "p26.3-25.3 11mb del", "GENE"),
        (26L, "A50A (c.150C>G); Splicing alteration (c.463-1G>T)", "ALK"),
        (27L, "ERBB2 G776INSV_G/C", "ERBB2"),
        (28L, "exon1 151nt del; Null (Partial deletion of Exon 1)", "ERBB2"),
        (29L, "CD74-NRG1", "NRG1"), (30L, "LMNA::NTRK1 G595R AND G667C", "NTRK1"),
        (31L, "EWSR1-FLI1 e7-e6", "FLI1"), (32L, "EML4-ALK E20;A20", "EML4"),
        (33L, "BCR-ABL", "ABL1"))
      // encode each feature flavour as a plain tuple so the grammar runs
      // executor-side: (id, kind, name, gene, f5name, f5id, f3name, f3id)
      val features: Seq[(Long, String, String, String, String, Option[Long], String, Option[Long])] =
        cases.map { case (id, n, g) => (id, "gene", n, g, "", None, "", None) } ++ Seq(
          (40L, "factor", "abc", "TMB", "", None, "", None),
          (41L, "fusion", "", "", "BRAF", Some(673L), "ALK", Some(238L)))
      s.createDataset(features).flatMap {
        case (id, kind, name, gene, f5n, f5id, f3n, f3id) =>
          val feature: CivicFeature = kind match {
            case "gene" => GeneF(Some(1L), gene, name)
            case "factor" => FactorF(gene, name)
            case _ => FusionF(
              if (f5n.isEmpty) None else Some(FusionGene(f5n, f5id)),
              if (f3n.isEmpty) None else Some(FusionGene(f3n, f3id)))
          }
          normalizeFeature(feature).zipWithIndex.map { case (v, i) =>
            (id, i.toLong, v.reference1.name, v.reference1.sourceId,
              v.reference1.refClass, v.reference2.map(_.name),
              v.reference2.flatMap(_.sourceId), v.positional, v.variant,
              v.vtype, v.inferredByCds, v.infersType)
          }
      }.toDF("case_id", "seq", "ref1_name", "ref1_sid", "ref1_class",
        "ref2_name", "ref2_sid", "positional", "variant", "vtype",
        "inferred_cds", "infers_type")
    }),

    // F3 (OncoKB variant-name parser, oncokb/index.js:131-193): protein
    // fallback, splice shorthands, en-dash fusions with flip detection.
    "f3_oncokb_names" -> ((s, dir) => {
      import s.implicits._
      val cases = Seq(
        (1L, "V600_K601insFGLAT", Some("braf")), (2L, "BCR-ABL1 Fusion", None),
        (3L, "BCR-ABL1 Fusion", Some("ABL1")), (4L, "GOPC–ROS1 Fusion", Some("ros1")),
        (5L, "X100_A101splice", None), (6L, "Exon 12 mutations", None),
        (7L, "Truncating Mutations", None), (8L, "K550_W557trunc", None))
      s.createDataset(cases).map { case (id, name, r1) =>
        val p = variant.OncoKbNames.parse(name, r1)
        (id, p.vtype, p.reference2, p.flipped)
      }.toDF("case_id", "parsed_type", "reference2", "flipped")
    }),

    // F4 (DOCM notation fixes, docm/index.js:33-67).
    "f4_docm_fixes" -> ((s, dir) => {
      import s.implicits._
      Seq((1L, "p.W802-"), (2L, "p.DIM842-"), (3L, "p.DI842VM"),
        (4L, "p.AB100AC"), (5L, "p.G12D"), (6L, "p.ABC100X"))
        .toDF("case_id", "raw")
        .as[(Long, String)]
        .map { case (id, v) => (id, v, variant.DocmFixes.fix(v)) }
        .toDF("case_id", "raw", "fixed")
    }),

    // J12 (tiered content diff with deterministic residue zip) via
    // core.DiffMerge: incoming=even keys, existing=multiples of 3. Tiers
    // join on tight (high-cardinality) keys; the weak residual pairing is
    // the artificial final pass (distributed zip, no skewed window).
    "j12_diff_tiers" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val incoming = o.filter(col("o_orderkey") % 2 === 0).select(
        col("o_orderkey").as("iid"), col("o_custkey").as("cust"),
        col("o_orderpriority").as("prio"))
      val existing = o.filter(col("o_orderkey") % 3 === 0).select(
        col("o_orderkey").as("eid"), col("o_custkey").as("cust"),
        col("o_orderpriority").as("prio"))
      core.DiffMerge.contentMatch(incoming, "iid", existing, "eid",
        tiers = Seq(Seq("cust", "prio"), Seq("cust")), artificialFinal = true)
    }),

    // AS-OF JOIN (core.AsOfJoin): attribute each purchase to the user's
    // most recent at-or-before view — the point-in-time-correct
    // "last known state" join, as ONE union + per-key window (linear),
    // never the quadratic inequality-join-then-prune rewrite. Oracle is
    // DuckDB's NATIVE ASOF LEFT JOIN — an independent implementation of
    // the same semantics.
    "llm_asof_join" -> ((s, dir) => {
      val e = t(s, dir, "events").withColumn("ts_us", expr("ts_ns div 1000"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts_us"), col("value"))
      val views = e.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts_us"),
          col("event_id").as("view_event_id"))
      core.AsOfJoin.asOfJoin(purchases, views, "user_id", "ts_us", "ts_us",
          Seq("view_event_id"))
        .withColumn("gap_us", col("ts_us") - col("asof_ts"))
    }),

    // RANGE JOIN (core.RangeJoin): events inside recurring 45-minute
    // windows every 3 hours — bucketized interval join (15-min grid) →
    // plain shuffled hash join on the cell id, never a nested-loop scan
    // of every window per event. Oracle is the naive inequality join.
    "llm_range_join" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .select(col("user_id"), col("value"), expr("ts_ns div 1000").as("ts_us"))
      val t0 = e.agg(min(col("ts_us")).as("__t0"))
      val intervals = t0
        .select(explode(sequence(lit(0L), lit(239L))).as("window_id"),
          col("__t0"))
        .select(col("window_id"),
          (col("__t0") + col("window_id") * 10800000000L).as("lo_us"),
          (col("__t0") + col("window_id") * 10800000000L + 2700000000L)
            .as("hi_us"))
      core.RangeJoin.pointInInterval(e, "ts_us", intervals,
          "lo_us", "hi_us", bucketWidth = 900000000L)
        .groupBy(col("window_id"), col("lo_us"), col("hi_us"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          sum(col("value").cast("decimal(18,4)")).cast("double")
            .as("total_value"))
    }),

    // HLL DISTINCT SKETCH (llm.Sketches): unique daily-active users per
    // event type — the canonical sketch telemetry — from 512 one-byte
    // registers: constant state per group, bucket-wise-max MERGEABLE
    // (the '__all__' row is the union of the per-type sketches,
    // registers only, rows untouched). Exact distinct alongside so the
    // row itself audits the ±4.6% estimator. Every op is integer/string
    // (rank via length(bin()), harmonic sum as an exact scaled BIGINT);
    // the single float division replays IEEE-identically in the oracle.
    "llm_distinct_sketch" -> ((s, dir) => {
      val uday = t(s, dir, "events")
        .withColumn("ts_us", expr("ts_ns div 1000"))
        .select(col("event_type"),
          concat(col("user_id").cast("string"), lit("@"),
            expr("ts_us div 86400000000").cast("string")).as("uday"))
        // three consumers (registers + two exact counts) — checkpoint
        .localCheckpoint()
      val regs = llm.Sketches.hllRegisters(uday, "event_type", "uday")
        .localCheckpoint() // consumed by the merge AND the estimate union
      val all = llm.Sketches.hllMerge(regs, "event_type", "__all__")
      val est = llm.Sketches.hllEstimate(regs.unionByName(all), "event_type")
      val exact = uday.groupBy(col("event_type"))
        .agg(countDistinct(col("uday")).as("exact_distinct"))
      val exactAll = uday.agg(countDistinct(col("uday"))
        .as("exact_distinct")).withColumn("event_type", lit("__all__"))
      est.join(exact.unionByName(exactAll), Seq("event_type"))
    }),

    // HLL SET OVERLAP: |A ∩ B| between two crawls WITHOUT joining —
    // inclusion–exclusion over three mergeable sketches (E(A) + E(B) −
    // E(A ∪ B), union = bucket-wise max of the same registers). Each
    // doc fans out to 20 sub-ids so all three cardinalities sit above
    // the 2.5m small-range cutoff where the raw estimator is honest;
    // ratio_micro audits the estimate against the exact overlap.
    "llm_sketch_overlap" -> ((s, dir) => {
      val ids = t(s, dir, "documents")
        .select(col("doc_id"),
          explode(sequence(lit(0), lit(19))).as("k"))
        .select(col("doc_id"),
          (col("doc_id") * 20 + col("k")).cast("string").as("id"))
        .localCheckpoint() // consumed by both sources + the exact count
      val a = ids.filter(col("doc_id") % 3 =!= 0)
        .select(lit("a").as("src"), col("id"))
      val b = ids.filter(col("doc_id") % 2 === 0)
        .select(lit("b").as("src"), col("id"))
      val regs = llm.Sketches.hllRegisters(a.unionByName(b), "src", "id")
        .localCheckpoint() // merge + estimate both read the registers
      val union = llm.Sketches.hllMerge(regs, "src", "u")
      val est = llm.Sketches.hllEstimate(regs.unionByName(union), "src")
      val p = est.groupBy()
        .agg(min(when(col("src") === "a", col("hll_estimate"))).as("est_a"),
          min(when(col("src") === "b", col("hll_estimate"))).as("est_b"),
          min(when(col("src") === "u", col("hll_estimate"))).as("est_union"))
        .withColumn("overlap_est",
          col("est_a") + col("est_b") - col("est_union"))
      val exact = ids
        .filter(col("doc_id") % 3 =!= 0 && col("doc_id") % 2 === 0)
        .agg(count(lit(1)).as("exact_overlap"))
      p.crossJoin(exact)
        .withColumn("ratio_micro",
          floor(col("overlap_est") * 1000000 / col("exact_overlap")))
    }),

    // DOC-LEVEL CO-OCCURRENCE (TextOps.cooccurPairs): token pairs
    // sharing ≥ 50 documents, apriori-pruned (only df ≥ 50 tokens ever
    // reach the pair join — the rare-token long tail never pays the
    // quadratic step), ranked by micro-quantized doc-count lift.
    "llm_cooccur" -> ((s, dir) => {
      llm.TextOps.cooccurPairs(t(s, dir, "documents"), "doc_id", "text",
        minDf = 50L, minSup = 50L, topK = 25)
    }),

    // LAST-TOUCH ATTRIBUTION (core.AsOfJoin composition): each purchase
    // attributes to the user's most recent STRICTLY-earlier non-purchase
    // touch within 7 days (same-instant touches pre-collapsed to the
    // max-event-id row so the as-of pick is deterministic); the
    // single-shuffle as-of form vs DuckDB's native ASOF with a strict
    // inequality. Unattributed purchases land in 'none'.
    "llm_attribution" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          expr("ts_ns div 1000").as("ts_us"), col("event_id"))
        .localCheckpoint() // purchases + touches both read it
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_us").as("p_ts"),
          col("event_id").as("p_id"))
      val touches = e.filter(col("event_type") =!= "purchase")
        .groupBy(col("user_id"), col("ts_us"))
        .agg(max(struct(col("event_id"), col("event_type")))
          .getField("event_type").as("touch_type"))
      val j = core.AsOfJoin.asOfJoin(purchases, touches, "user_id",
        "p_ts", "ts_us", Seq("touch_type"), strict = true)
      val attributed = j.select(
        when(col("asof_ts").isNotNull &&
          col("p_ts") - col("asof_ts") <= 604800000000L,
          col("touch_type")).otherwise(lit("none")).as("attributed_type"),
        when(col("asof_ts").isNotNull &&
          col("p_ts") - col("asof_ts") <= 604800000000L,
          col("p_ts") - col("asof_ts")).otherwise(lit(0L)).as("delay_us"))
      attributed.groupBy(col("attributed_type"))
        .agg(count(lit(1)).as("n_purchases"),
          sum(col("delay_us")).cast("long").as("total_delay_us"))
    }),

    // TRIANGLE COUNTS (llm.Graphs.triangleCounts): exact per-node
    // triangle participation with DEGREE ORIENTATION — every edge
    // points low-degree → high-degree, bounding each node's wedge
    // fan-out by O(√m) so a hub cannot quadratically explode the join
    // (the scale formulation). Graph = arithmetic links + consecutive
    // (i−1, i−2) links, whose sliding triples carry a known triangle
    // per node; each triangle counted once, credited to all 3 corners.
    "llm_triangles" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"))
      val n = docs.agg(count(lit(1)).as("__n"))
      val base = docs.crossJoin(broadcast(n))
      val edges = base
        .select(col("doc_id").as("src"),
          expr("(doc_id * 7 + 3) % __n").as("dst"))
        .unionByName(docs.filter(col("doc_id") >= 1)
          .select(col("doc_id").as("src"), (col("doc_id") - 1).as("dst")))
        .unionByName(docs.filter(col("doc_id") >= 2)
          .select(col("doc_id").as("src"), (col("doc_id") - 2).as("dst")))
      llm.Graphs.triangleCounts(edges, "src", "dst")
        .select(col("id").as("doc_id"), col("n_triangles"))
    }),

    // k-SIGMA ANOMALY DAYS (core.EventAnalytics.sigmaOutliers): which
    // (event_type, day) volumes deviate > 2σ from their type's mean —
    // detected with ZERO floats: (x·n − S)² > k²(n·ΣX² − S²) in
    // DECIMAL(38,0), the pipeline-telemetry monitor that replays
    // bit-identically in any engine (no sqrt/division/doubles).
    "llm_anomaly_days" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .groupBy(col("event_type"),
          expr("(ts_ns div 1000) div 86400000000").as("day"))
        .agg(count(lit(1)).as("x"))
      core.EventAnalytics.sigmaOutliers(daily, "event_type", "x", k = 2)
        .select(col("event_type"), col("day"), col("x"), col("dev_n"),
          col("anomalous"))
    }),

    // PERSISTED SKETCH REGISTRY: per-source distinct-user telemetry
    // maintained INCREMENTALLY in the store — each ingest batch folds
    // its own HLL registers into the registry table (bucket-max of
    // old ∪ new: O(sketch size) work per batch, history NEVER
    // rescanned; a store layer must carry its buckets' complete
    // content, so the fold happens at write time). Register max is
    // associative, so the incrementally-maintained registry is EXACTLY
    // the sketch of all data ever seen — the oracle recomputes the
    // full-data registers directly and every column hashes equal.
    "llm_sketch_registry" -> ((s, dir) => {
      val store = new core.PersistentGraphStore(s,
        scratchDir("skreg"))
      val users = t(s, dir, "events")
        .select(col("event_type").as("src"),
          col("user_id").cast("string").as("uid"))
      // two ingest batches split by user parity — overlapping sources
      val batch1 = users.filter(col("uid").cast("long") % 2 === 0)
      val batch2 = users.filter(col("uid").cast("long") % 2 =!= 0)
      def fold(batch: DataFrame): Unit = {
        val incoming = llm.Sketches.hllRegisters(batch, "src", "uid")
        val merged = store.read("sketch_registry")
          .map(_.unionByName(incoming)).getOrElse(incoming)
          .groupBy(col("src"), col("bucket"))
          .agg(max(col("reg")).as("reg"))
        store.write("sketch_registry", merged, Seq("src"), full = true)
      }
      fold(batch1)
      fold(batch2)
      val est = llm.Sketches.hllEstimate(
        store.read("sketch_registry").get, "src")
      val exact = users.groupBy(col("src"))
        .agg(countDistinct(col("uid")).as("exact_distinct"))
      est.join(exact, Seq("src"))
    }),

    // CM JOIN-SIZE ESTIMATE (Sketches.cmInnerProduct): predict
    // |events ⋈ purchases| on user_id from two 4×1024 count-min grids
    // — the AGMS inner-product planner probe that sizes a join's
    // output BEFORE shuffling either side's keys. One-sided (hash
    // collisions only add), audited in-row against the exact
    // Σ nA(u)·nB(u).
    "llm_join_estimate" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .select(col("user_id").cast("string").as("v"), col("event_type"))
        .localCheckpoint() // two grids + two exact censuses read it
      val a = e.select(col("v"))
      val b = e.filter(col("event_type") === "purchase").select(col("v"))
      val est = llm.Sketches.cmInnerProduct(
        llm.Sketches.countMinCounters(a, "v"),
        llm.Sketches.countMinCounters(b, "v"))
      val exact = a.groupBy(col("v")).agg(count(lit(1)).as("na"))
        .join(b.groupBy(col("v")).agg(count(lit(1)).as("nb")), Seq("v"))
        .agg(coalesce(sum(col("na") * col("nb")), lit(0L)).cast("long")
          .as("exact_join_size"))
      est.crossJoin(exact)
        .select(col("cm_join_estimate"), col("exact_join_size"),
          (col("cm_join_estimate") >= col("exact_join_size")).as("one_sided"),
          expr("(cm_join_estimate * 1000000) div exact_join_size")
            .as("ratio_micro"))
    }),

    // PAGERANK (llm.Graphs): link authority over a deterministic
    // synthetic hyperlink graph (each doc links to 2-3 arithmetic
    // neighbours) — fixed-point INTEGER ranks (ppb), 8 iterations,
    // bit-identical in any engine. The oracle replays all 8 supersteps
    // as generated materialized CTEs.
    "llm_pagerank" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"))
      val edges = docGraphEdges(docs)
      llm.Graphs.pageRankPpb(docs, "doc_id", edges, "src", "dst", iters = 8)
    }),

    // S2d — STREAM-STREAM JOIN: clicks ⋈ views within a 30-minute
    // lookback per user, both sides watermarked (state stays bounded by
    // the watermark delay + join range, the production shape). Inner
    // join, append mode; oracle is the batch inequality join.
    "s2d_stream_join" -> ((s, dir) => {
      val views = Tables.eventsStream(s, dir)
        .filter(col("event_type") === "view")
        .select(col("user_id").as("v_user"), col("ts").as("view_ts"),
          col("event_id").as("view_event_id"))
        .withWatermark("view_ts", "2 hours")
      val clicks = Tables.eventsStream(s, dir)
        .filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("click_ts"),
          col("event_id").as("click_event_id"))
        .withWatermark("click_ts", "2 hours")
      val joined = clicks.join(views,
          col("user_id") === col("v_user") &&
            col("view_ts") <= col("click_ts") &&
            col("view_ts") >= col("click_ts") - expr("INTERVAL 30 MINUTES"))
        .select(col("user_id"), col("click_event_id"), col("view_event_id"),
          (unix_micros(col("click_ts")) - unix_micros(col("view_ts")))
            .as("gap_us"))
      val q = joined.writeStream.format("memory")
        .queryName("s2d_stream_join_out")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      s.table("s2d_stream_join_out")
    }),

    // COUNT-MIN HEAVY HITTERS (llm.Sketches): word-frequency estimates
    // from a 4×1024 counter grid — constant sketch state, counters merge
    // by addition, estimates one-sided (never undercount). Probes are the
    // exact top-20 so the row audits the overcount directly.
    "llm_heavy_hitters" -> ((s, dir) => {
      val words = t(s, dir, "documents")
        .select(explode(llm.TextOps.words("text")).as("word"))
        .filter(length(col("word")) > 0)
        .localCheckpoint() // two consumers: the grid and the exact top-20
      val counters = llm.Sketches.countMinCounters(words, "word")
      val probes = words.groupBy(col("word"))
        .agg(count(lit(1)).as("exact_count"))
        .orderBy(col("exact_count").desc, col("word")).limit(20)
      llm.Sketches.countMinLookup(counters, probes.select(col("word")), "word")
        .join(probes, Seq("word"))
        .withColumn("overcount", col("cm_estimate") - col("exact_count"))
    }),

    // BLOOM MEMBERSHIP PRE-GATE (llm.Sketches): 2^16-bit filter over the
    // eval split's content keys, probed by every doc — the 8 KB
    // broadcast gate a decontamination pass runs before any exact join.
    // False positives only; the row reports them against exact
    // membership so the FP contract is auditable.
    "llm_bloom_filter" -> ((s, dir) => {
      val keyed = t(s, dir, "documents")
        .select(col("doc_id"), md5(col("text")).as("ck"))
        .localCheckpoint() // three consumers: eval slice, probes, output join
      val evalKeys = keyed.filter(col("doc_id") % 100 === 0)
        .select(col("ck")).distinct()
      val bloom = llm.Sketches.bloomBuild(evalKeys, "ck")
      val probed = llm.Sketches.bloomProbe(bloom,
        keyed.select(col("ck")).distinct(), "ck")
      keyed.join(probed, Seq("ck"))
        .join(evalKeys.withColumn("in_eval_texts", lit(true)), Seq("ck"), "left")
        .select(col("doc_id"), col("in_bloom").as("flagged"),
          coalesce(col("in_eval_texts"), lit(false)).as("in_eval_texts"))
        .withColumn("false_positive", col("flagged") && !col("in_eval_texts"))
    }),

    // PMI COLLOCATIONS (TextOps.pmiCollocations): top adjacent pairs by
    // the log-free micro-quantized PMI ratio — exact integer ranking,
    // long tail pruned before any join, top-k via TakeOrderedAndProject.
    "llm_pmi_pairs" -> ((s, dir) => {
      llm.TextOps.pmiCollocations(t(s, dir, "documents"), "doc_id", "text",
        minCount = 3L, topK = 30)
    }),

    // EVENT TRANSITION MATRIX: per-user next-event Markov counts +
    // micro-quantized transition probabilities — one lag window on the
    // high-cardinality user key, then type²-sized aggregates.
    "llm_event_transitions" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      val pairs = t(s, dir, "events")
        .withColumn("ts_us", expr("ts_ns div 1000"))
        .select(col("user_id"), col("event_type").as("next_type"),
          col("ts_us"), col("event_id"))
        .withColumn("prev_type", lag(col("next_type"), 1).over(w))
        .filter(col("prev_type").isNotNull)
        .groupBy(col("prev_type"), col("next_type"))
        .agg(count(lit(1)).as("n_transitions"))
      val totals = pairs.groupBy(col("prev_type"))
        .agg(sum(col("n_transitions")).as("n_from"))
      pairs.join(totals, Seq("prev_type"))
        .withColumn("p_micro",
          expr("(n_transitions * 1000000) div n_from"))
        .select(col("prev_type"), col("next_type"), col("n_transitions"),
          col("p_micro"))
    }),

    // POINT-IN-TIME FEATURE SNAPSHOT: the feature-store materialization
    // an as-of join exists for — a (user × day) grid forward-filled with
    // each user's last event state as of end-of-day. One AsOfJoin
    // shuffle; days before a user's first event stay NULL (no future
    // leak). The oracle replays the grid and DuckDB's native ASOF join.
    "llm_feature_snapshot" -> ((s, dir) => {
      val e = t(s, dir, "events").withColumn("ts_us", expr("ts_ns div 1000"))
      val bounds = e.agg(expr("min(ts_us) div 86400000000").as("d0"),
        expr("max(ts_us) div 86400000000").as("d1"))
      val days = bounds.select(explode(sequence(col("d0"), col("d1")))
        .as("day"))
      val grid = e.select(col("user_id")).distinct()
        .crossJoin(broadcast(days))
        .withColumn("eod_us", (col("day") + 1) * 86400000000L - 1)
      core.AsOfJoin.asOfJoin(grid,
          e.select(col("user_id"), col("ts_us"),
            col("event_id").as("last_event_id"),
            col("value").as("last_value")),
          "user_id", "eod_us", "ts_us",
          Seq("last_event_id", "last_value"))
        .select(col("user_id"), col("day"), col("asof_ts"),
          col("last_event_id"), col("last_value"))
    }),

    // S2e — NATIVE STREAMING DEDUP (dropDuplicatesWithinWatermark): the
    // stream doubled by self-union, then deduped on the event id inside
    // the watermark window — Spark's built-in state-bounded dedup
    // operator (state expires with the watermark, unlike plain
    // dropDuplicates whose state grows forever). Oracle: the original
    // rows, exactly once.
    "s2e_stream_dedup_wm" -> ((s, dir) => {
      val base = Tables.eventsStream(s, dir)
        .select(col("event_id"), col("event_type"), col("user_id"), col("ts"))
      val doubled = base.unionByName(base)
        .withWatermark("ts", "2 hours")
        .dropDuplicatesWithinWatermark("event_id")
        .select(col("event_id"), col("event_type"), col("user_id"))
      val q = doubled.writeStream.format("memory")
        .queryName("s2e_stream_dedup_wm_out")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      s.table("s2e_stream_dedup_wm_out")
    }),

    // EXACT SET-SIMILARITY JOIN (TextOps.prefixFilterNearDups): ALL
    // shingle-Jaccard ≥ 0.5 pairs via prefix filtering — the exact
    // complement of the probabilistic MinHash path; rare-first prefix
    // tokens keep the candidate join skew-free. Oracle is the full
    // brute-force quadratic join, so any missed pair fails the row.
    "llm_set_join" -> ((s, dir) => {
      llm.TextOps.prefixFilterNearDups(t(s, dir, "documents"),
        "doc_id", "text", k = 3, tNum = 1L, tDen = 2L)
    }),

    // TRUSTRANK (llm.Graphs.trustRankPpb): personalized PageRank whose
    // teleport mass returns only to a trusted seed whitelist (doc_id %
    // 97 == 0) — authority flows outward from seeds, spam clusters with
    // no seed in-path starve. Same integer-ppb fixed-point arithmetic;
    // oracle replays all 8 supersteps with the seed-scaled teleport.
    "llm_trustrank" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"))
      val edges = docGraphEdges(docs)
      llm.Graphs.trustRankPpb(docs, "doc_id", edges, "src", "dst",
        docs.filter(col("doc_id") % 97 === 0), iters = 8)
    }),

    // COMMUNITIES (llm.Graphs.labelPropagation): deterministic
    // synchronous LPA over the undirected doc link graph — most-frequent
    // neighbour label, smallest-label tie-break, 4 supersteps; the
    // "template family / mirror farm" clustering signal.
    "llm_communities" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"))
      val edges = docGraphEdges(docs)
      llm.Graphs.labelPropagation(docs, "doc_id", edges, "src", "dst",
        iters = 4)
    }),

    // SEED DISTANCE (llm.Graphs.bfsDistance): multi-source BFS hop
    // count from the trusted frontier, capped at 4 — the "how far from
    // a whitelisted page" crawl-curation signal; unreached nodes are
    // absent, min over equal paths is order-free.
    "llm_seed_distance" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"))
      val edges = docGraphEdges(docs)
      llm.Graphs.bfsDistance(edges, "src", "dst",
        docs.filter(col("doc_id") % 97 === 0), "doc_id", maxDepth = 4)
    }),

    // DOMAIN SIMILARITY MATRIX: pairwise cosine between per-label MEAN
    // embeddings — the "which corpus domains overlap semantically" map a
    // mixture planner reads. Counts cancel in the cosine, so mean
    // vectors never materialize: per-label integer SUM vectors (a
    // posexplode partial agg, 10×64 state), native qdot pairwise, one
    // sqrt each (IEEE-exact in both engines).
    "llm_domain_similarity" -> ((s, dir) => {
      val e = llm.Ann.withQuantized(t(s, dir, "embeddings"), "embedding")
        .select(col("label").cast("long").as("label"), col("vq"))
      val sums = e.select(col("label"), posexplode(col("vq")))
        .groupBy(col("label"), col("pos"))
        .agg(sum(col("col")).as("sv"))
        .groupBy(col("label"))
        .agg(expr(
          "transform(array_sort(collect_list(struct(pos, sv))), x -> x.sv)")
          .as("sv"))
        .withColumn("n2",
          expr("aggregate(sv, 0L, (acc, v) -> acc + v * v)"))
      val cnt = e.groupBy(col("label")).agg(count(lit(1)).as("n_vecs"))
      val lab = sums.join(cnt, Seq("label"))
      lab.select(col("label").as("label_a"), col("sv").as("va"),
          col("n2").as("n2a"), col("n_vecs").as("n_a"))
        .crossJoin(lab.select(col("label").as("label_b"), col("sv").as("vb"),
          col("n2").as("n2b"), col("n_vecs").as("n_b")))
        .filter(col("label_a") < col("label_b"))
        .withColumn("dp", plans.QuantizedDot.qdot(col("va"), col("vb")))
        .select(col("label_a"), col("label_b"), col("n_a"), col("n_b"),
          (col("dp").cast("double") /
            (sqrt(col("n2a").cast("double")) * sqrt(col("n2b").cast("double"))))
            .as("cos"))
    }),

    // S2f — STREAM-STATIC JOIN: the streaming dimension-enrichment shape
    // (a broadcast static dim joined into an unbounded stream — no
    // watermark needed, no state: each row enriches map-side).
    "s2f_stream_enrich" -> ((s, dir) => {
      import s.implicits._
      val dim = Seq(("view", 1L), ("click", 5L), ("purchase", 20L),
        ("signup", 2L), ("error", 0L)).toDF("event_type", "weight")
      // LEFT join + coalesce(0): an out-of-dim (or NULL) event type
      // keeps its row with weight 0 — the oracle's CASE ... ELSE 0
      // semantics, not a silent drop
      val enriched = Tables.eventsStream(s, dir)
        .select(col("event_id"), col("event_type"), col("user_id"))
        .join(broadcast(dim), Seq("event_type"), "left")
        .select(col("event_id"), col("event_type"), col("user_id"),
          coalesce(col("weight"), lit(0L)).as("weight"))
      val q = enriched.writeStream.format("memory")
        .queryName("s2f_stream_enrich_out")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      s.table("s2f_stream_enrich_out")
    }),

    // S2g — STREAMING HLL SKETCH: per-event-type daily-active-user
    // cardinality as mapGroupsWithState with 512-byte CONSTANT state
    // per key (exact streaming distinct grows state forever — the
    // sketch is the production shape). Same register algebra as the
    // batch row; the min(register_sum) fold picks the final sketch
    // across any micro-batching.
    "s2g_stream_hll" -> ((s, dir) => {
      import s.implicits._
      val stream = Tables.eventsStream(s, dir)
        .select(col("event_type"),
          concat(col("user_id").cast("string"), lit("@"),
            expr("ts_us div 86400000000").cast("string")).as("uday"))
        .as[(String, String)]
      val q = streaming.StreamOps.hllPerKey(stream)
        .writeStream.format("memory").queryName("s2g_stream_hll_out")
        .outputMode("update")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      s.table("s2g_stream_hll_out")
        .groupBy(col("key").as("event_type"))
        .agg(min(struct(col("register_sum"), col("n_occupied"))).as("m"))
        .select(col("event_type"), col("m.n_occupied").as("n_occupied"),
          col("m.register_sum").as("register_sum"))
        .withColumn("hll_estimate",
          lit(0.7213) / (lit(1.0) + lit(1.079) / lit(512.0)) *
            lit(262144.0) * lit(4503599627370496.0) /
            col("register_sum").cast("double"))
    }),

    // SYSTEMATIC PPS SAMPLE (Sampling.ppsSample): exactly-50-pointer
    // weight-proportional sample over the token-count line — bucketed
    // cumsum (no global window), pointer hits counted by inverting the
    // pointer arithmetic, Σ n_hits = 50 exactly, zero randomness
    // beyond the salt.
    "llm_pps_sample" -> ((s, dir) => {
      llm.Sampling.ppsSample(
        t(s, dir, "documents").withColumn("w0",
          size(split(lower(col("text")), " ")).cast("long")),
        "doc_id", "w0", n = 50L, salt = "pps:r8")
    }),

    // S2h — STREAMING COUNT-MIN: the frequency sibling of the streaming
    // HLL — (j, slot) computed column-side with the batch hash family,
    // per-depth 1024-counter state rows, max-fold across emissions; the
    // final grid is probed with the exact top-20 user-days. Streamed
    // counters are bit-identical to batch ones, so estimates stay
    // one-sided.
    "s2h_stream_cm" -> ((s, dir) => {
      import s.implicits._
      val stream = Tables.eventsStream(s, dir)
        .select(concat(col("user_id").cast("string"), lit("@"),
          expr("ts_us div 86400000000").cast("string")).as("uday"))
        .select(col("uday"), explode(array((0 until 4).map(lit): _*)).as("j"))
        .select(col("j"),
          (llm.TextOps.h64c(concat(col("j").cast("string"), lit(":"),
            col("uday"))) % 1024L).as("slot"))
        .as[(Int, Long)]
      val q = streaming.StreamOps.countMinRows(stream)
        .writeStream.format("memory").queryName("s2h_stream_cm_out")
        .outputMode("update")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      // counters only grow → max per (j, slot) is the final grid
      val counters = s.table("s2h_stream_cm_out")
        .groupBy(col("j"), col("slot")).agg(max(col("cnt")).as("cnt"))
      val uday = t(s, dir, "events")
        .withColumn("ts_us", expr("ts_ns div 1000"))
        .select(concat(col("user_id").cast("string"), lit("@"),
          expr("ts_us div 86400000000").cast("string")).as("uday"))
      val probes = uday.groupBy(col("uday"))
        .agg(count(lit(1)).as("exact_count"))
        .orderBy(col("exact_count").desc, col("uday")).limit(20)
      llm.Sketches.countMinLookup(counters, probes.select(col("uday")), "uday")
        .join(probes, Seq("uday"))
        .withColumn("overcount", col("cm_estimate") - col("exact_count"))
    }),

    // S2i — STREAMING QUANTILE: the percentile sibling of the streamed
    // HLL/count-min pair — per-event-type log-linear histogram state
    // (fixed 1024-long grid per key, bucket computed column-side with
    // the batch algebra), max-fold across update emissions, then P50/
    // P95/P99 from the streamed grid audited against the exact batch
    // percentile. Values are cents: floor(value·100), IEEE-identical
    // in both engines.
    "s2i_stream_quantile" -> ((s, dir) => {
      import s.implicits._
      val stream = Tables.eventsStream(s, dir)
        .select(col("event_type"),
          floor(col("value") * 100).cast("long").as("v"))
        .filter(col("v") >= 1L)
        .select(col("event_type"), llm.Sketches.logBucket("v").as("bucket_id"))
        .as[(String, Long)]
      val q = streaming.StreamOps.histogramRows(stream)
        .writeStream.format("memory").queryName("s2i_stream_quantile_out")
        .outputMode("update")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      // counters only grow → max per (key, bucket) is the final histogram
      val hist = s.table("s2i_stream_quantile_out")
        .groupBy(col("key").as("event_type"), col("bucket_id"))
        .agg(max(col("c")).as("c"))
      val sk = llm.Sketches.histQuantilesPerKey(hist, "event_type",
        Seq(50, 95, 99))
      val e = t(s, dir, "events")
        .select(col("event_type"),
          floor(col("value") * 100).cast("long").as("v"))
        .filter(col("v") >= 1L)
      val exact = exactValueQuantiles(e, Seq("event_type"), "v",
        count(lit(1)), Seq(50, 95, 99))
      sk.withColumn("q", col("q").cast("long"))
        .join(exact.withColumn("q", col("q").cast("long")),
          Seq("event_type", "q"))
        .select(col("event_type"), col("q"), col("sketch_v"), col("exact_v"),
          (abs(col("sketch_v") - col("exact_v")) * 16 <= col("exact_v"))
            .as("within_bound"))
    }),

    // SCD-2 DIMENSION BUILD (core.Intervals.scd2): collapse the event
    // change log into [valid_from, valid_to) state versions per user —
    // the producer side of the as-of/feature-snapshot joins. Windows
    // are user-partitioned (per-key work only); consecutive duplicate
    // states collapse into one run.
    "llm_scd2_build" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          expr("ts_ns div 1000").as("ts_us"), col("event_id"))
      core.Intervals.scd2(e, "user_id", "ts_us", "event_type", "event_id")
        .select(col("user_id"), col("state"), col("valid_from"),
          col("valid_to"), col("version_n"))
    }),

    // INTERVAL MERGE (core.Intervals.mergeIntervals): coalesce each
    // user's 30-minute activity spans into maximal islands — the
    // running-max island detector that handles nested intervals a
    // lag-only check would split. Per-user windows; integer epoch-us.
    "llm_interval_merge" -> ((s, dir) => {
      val iv = t(s, dir, "events")
        .select(col("user_id"),
          expr("ts_ns div 1000").as("lo"),
          expr("ts_ns div 1000 + 1800000000").as("hi"))
      core.Intervals.mergeIntervals(iv, "user_id", "lo", "hi")
        .select(col("user_id"), col("island"), col("lo"), col("hi"),
          col("n_merged"))
    }),

    // PPS → HORVITZ-THOMPSON ESTIMATE: why weighted sampling exists —
    // estimate the corpus's TOTAL CHARACTERS from the 50-pointer PPS
    // sample: Ŷ = (W/n)·Σ n_hits·(y/w), all micro-quantized integer
    // arithmetic (per-doc quotient truncates identically in both
    // engines). ratio_micro audits the estimator against the exact sum.
    "llm_pps_estimate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("w0", size(split(lower(col("text")), " ")).cast("long"))
        .withColumn("chars", length(col("text")).cast("long"))
        .localCheckpoint() // three consumers: sample, totals, chars join
      val samp = llm.Sampling.ppsSample(docs, "doc_id", "w0",
        n = 50L, salt = "pps:r8")
      val tot = docs.agg(sum(col("w0")).as("__tw"),
        sum(col("chars")).as("exact_total_chars"))
      samp.join(docs.select(col("doc_id"), col("chars")), Seq("doc_id"))
        .agg(sum(expr("n_hits * ((chars * 1000000) div weight)")).as("__c"),
          sum(col("n_hits")).as("n_sampled"))
        .crossJoin(broadcast(tot))
        .select(col("n_sampled"),
          expr("(__tw * __c) div (50 * 1000000)").as("est_total_chars"),
          col("exact_total_chars"))
        .withColumn("ratio_micro",
          expr("(est_total_chars * 1000000) div exact_total_chars"))
    }),

    // RECENCY-DECAYED ACTIVITY SCORE: per-user Σ 2^(30 − age_days) over
    // a 30-day horizon — exponential decay in EXACT shifted integers
    // (power-of-two half-life, no float pow), map-side partial agg.
    "llm_decayed_score" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .withColumn("day", expr("(ts_ns div 1000) div 86400000000"))
      val mx = e.agg(max(col("day")).as("__maxd"))
      e.crossJoin(broadcast(mx))
        .withColumn("age", col("__maxd") - col("day"))
        .withColumn("contrib", expr(
          """CASE WHEN age <= 30
            |THEN shiftleft(CAST(1 AS BIGINT), CAST(30 - age AS INT))
            |ELSE CAST(0 AS BIGINT) END""".stripMargin))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("contrib")).as("decay_score"))
    })
  )

  // ------------------------------------------------------------- oracle SQL

  /** Shared CTE chain for the PCA oracles: quantize → relational Gram →
    * exact-integer centering → mirror to the full symmetric covariance →
    * one |c| ≤ 1e6 rescale → 12 unrolled power-iteration sweeps, each a
    * mat-vec plus a sign-wrapped |w| ≤ 1e5 rescale (DuckDB `//` floors
    * while Spark `div` truncates — the `CASE WHEN x < 0 THEN -((-x)//sc)`
    * form makes both truncate toward zero). Ends at CTE `w12`.
    */
  /** The shared scale-then-sweep tail of the power-iteration oracles:
    * from a `cov (j, k, c)` CTE — one |c| ≤ 1e6 rescale, diagonal start,
    * 12 mat-vec sweeps each with the sign-wrapped |w| ≤ 1e5 rescale
    * (DuckDB `//` floors, the CASE form truncates toward zero like
    * Spark `div`/Scala `/`).
    */
  private val pcaSweepSql: String = {
    val scale =
      """,
        |csc AS (SELECT max(abs(c)) // 1000000 + 1 AS sc FROM cov),
        |cs AS MATERIALIZED (SELECT j, k,
        |    CASE WHEN c < 0 THEN -((-c) // sc) ELSE c // sc END AS c
        |  FROM cov CROSS JOIN csc),
        |w0 AS MATERIALIZED (SELECT j AS pos, c AS w FROM cs WHERE j = k)""".stripMargin
    val sweeps = (1 to 12).map { t =>
      s""",
         |m$t AS (SELECT cs.j AS pos, sum(cs.c * w${t - 1}.w) AS m FROM cs JOIN w${t - 1} ON w${t - 1}.pos = cs.k GROUP BY 1),
         |sc$t AS (SELECT max(abs(m)) // 100000 + 1 AS sc FROM m$t),
         |w$t AS MATERIALIZED (SELECT pos, CASE WHEN m < 0 THEN -((-m) // sc) ELSE m // sc END AS w FROM m$t CROSS JOIN sc$t)""".stripMargin
    }.mkString
    scale + sweeps
  }

  /** Shared CTE chain of the DSIR importance oracles: tokenize → md5
    * bucket grid → target/raw census → smoothed bit-resolution llr.
    */
  private val importanceSqlCtes: String =
    """WITH t AS (SELECT doc_id, lang = 'en' AS tgt, unnest(string_split(lower(text), ' ')) AS w FROM documents),
      |t2 AS (SELECT doc_id, tgt, w FROM t WHERE length(w) > 0),
      |g AS (SELECT doc_id, tgt, CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT) % 1024 AS b, count(*) AS c
      |      FROM t2 GROUP BY 1, 2, 3),
      |cen AS (SELECT b, sum(CASE WHEN tgt THEN c ELSE 0 END) AS tgt_c,
      |               sum(CASE WHEN tgt THEN 0 ELSE c END) AS raw_c
      |        FROM g GROUP BY 1),
      |tot AS (SELECT sum(tgt_c) AS rt, sum(raw_c) AS rr FROM cen),
      |llr AS (SELECT b,
      |    (length(bin(CAST((tgt_c + 1) * (rr + 1024) AS BIGINT))) - 1)
      |  - (length(bin(CAST((raw_c + 1) * (rt + 1024) AS BIGINT))) - 1) AS llr
      |  FROM cen CROSS JOIN tot)""".stripMargin

  /** The two packed sign words of the binary sketch, as margin-carrying
    * SQL select-list lines (shifts below bit 32 — engine-safe) — shared
    * by every Hamming-tier oracle; callers splice it into a
    * `SELECT vec_id, <this> FROM e` CTE before `.stripMargin` runs.
    */
  private val binPackColsSql: String =
    """CAST(list_sum(list_transform(range(0, 32), j ->
      |    CASE WHEN vq[j + 1] > 0 THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS blo,
      |  CAST(list_sum(list_transform(range(0, 32), j ->
      |    CASE WHEN vq[j + 33] > 0 THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS bhi""".stripMargin

  /** Shared CTE chain for the two-stage binary-search oracles: sign
    * sketches → Hamming shortlist-16 (`short`) → exact cosine over all
    * query-corpus pairs (`exsc`, reused as ground truth by the recall
    * row) → shortlist-restricted re-rank (`rr`).
    */
  private val hammingShortlistSql: String =
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS vq FROM embeddings),
      |en AS (SELECT vec_id, vq, CAST(list_sum(list_transform(vq, x -> x * x)) AS BIGINT) AS norm2 FROM e),
      |b AS (SELECT vec_id,
      |  ${binPackColsSql}
      |  FROM e),
      |hq AS (SELECT vec_id AS qid, blo AS qlo, bhi AS qhi FROM b WHERE vec_id % 50 = 0),
      |hs AS (SELECT qid, b.vec_id AS nid,
      |    bit_count(xor(b.blo, qlo)) + bit_count(xor(b.bhi, qhi)) AS ham
      |  FROM b CROSS JOIN hq WHERE b.vec_id <> qid),
      |short AS (SELECT qid, nid FROM (SELECT qid, nid,
      |    row_number() OVER (PARTITION BY qid ORDER BY ham ASC, nid ASC) AS rank FROM hs)
      |  WHERE rank <= 16),
      |bq AS (SELECT vec_id AS qid, vq AS qv, norm2 AS qn FROM en WHERE vec_id % 50 = 0),
      |exsc AS (SELECT qid, en.vec_id AS nid,
      |    CAST(CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * en.vq[i])) AS BIGINT) AS DOUBLE)
      |      / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(en.norm2 AS DOUBLE))) AS cos
      |  FROM en CROSS JOIN bq WHERE en.vec_id <> qid),
      |rr AS (SELECT exsc.qid, exsc.nid, cos,
      |    row_number() OVER (PARTITION BY exsc.qid ORDER BY cos DESC, exsc.nid ASC) AS rank
      |  FROM exsc JOIN short ON short.qid = exsc.qid AND short.nid = exsc.nid)""".stripMargin

  /** The recall-vs-shortlist sweep oracle (llm_hamming_curve): sketches →
    * ONE Hamming rank pass (`hr`) → per-breadth shortlist cuts re-ranked
    * by exact cosine → recall@3 of each against the shared exact truth.
    * Breadths are k × {2, 4, 8} = 6/12/24 at k = 3, mirroring the IVF
    * probe sweep.
    */
  private val hammingCurveSql: String = {
    val breadths = Seq(6, 12, 24)
    val rrCtes = breadths.map { sl =>
      s"""rr$sl AS (SELECT qid, nid FROM (
         |  SELECT exsc.qid, exsc.nid,
         |    row_number() OVER (PARTITION BY exsc.qid ORDER BY cos DESC, exsc.nid ASC) AS rank
         |  FROM exsc JOIN hr ON hr.qid = exsc.qid AND hr.nid = exsc.nid AND hr.hrank <= $sl)
         |  WHERE rank <= 3),
         |h$sl AS (SELECT count(*) AS n_hits FROM truth JOIN rr$sl USING (qid, nid))"""
        .stripMargin
    }.mkString(",\n")
    val legs = breadths.map { sl =>
      s"""SELECT 'hamming_sl$sl' AS path, CAST(n_hits AS BIGINT) AS n_hits,
         |  CAST(n_truth AS BIGINT) AS n_truth,
         |  CASE WHEN n_truth = 0 THEN 0.0 ELSE CAST(n_hits AS DOUBLE) / n_truth END AS recall
         |FROM h$sl CROSS JOIN tot""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS vq FROM embeddings),
       |en AS (SELECT vec_id, vq, CAST(list_sum(list_transform(vq, x -> x * x)) AS BIGINT) AS norm2 FROM e),
       |b AS (SELECT vec_id,
       |  ${binPackColsSql}
       |  FROM e),
       |hq AS (SELECT vec_id AS qid, blo AS qlo, bhi AS qhi FROM b WHERE vec_id % 50 = 0),
       |hs AS (SELECT qid, b.vec_id AS nid,
       |    bit_count(xor(b.blo, qlo)) + bit_count(xor(b.bhi, qhi)) AS ham
       |  FROM b CROSS JOIN hq WHERE b.vec_id <> qid),
       |hr AS (SELECT qid, nid,
       |    row_number() OVER (PARTITION BY qid ORDER BY ham ASC, nid ASC) AS hrank FROM hs),
       |bq AS (SELECT vec_id AS qid, vq AS qv, norm2 AS qn FROM en WHERE vec_id % 50 = 0),
       |exsc AS (SELECT qid, en.vec_id AS nid,
       |    CAST(CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * en.vq[i])) AS BIGINT) AS DOUBLE)
       |      / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(en.norm2 AS DOUBLE))) AS cos
       |  FROM en CROSS JOIN bq WHERE en.vec_id <> qid),
       |truth AS (SELECT qid, nid FROM (SELECT qid, nid,
       |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rank FROM exsc)
       |  WHERE rank <= 3),
       |tot AS (SELECT count(*) AS n_truth FROM truth),
       |$rrCtes
       |$legs""".stripMargin
  }

  private val pcaPowerSqlPrefix: String = {
    val head =
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS vq FROM embeddings),
        |u AS (SELECT vec_id, unnest(vq) AS v, generate_subscripts(vq, 1) AS pos FROM e),
        |g AS (SELECT a.pos - 1 AS j, b.pos - 1 AS k, sum(a.v * b.v) AS g
        |      FROM u a JOIN u b ON a.vec_id = b.vec_id AND b.pos >= a.pos
        |      GROUP BY 1, 2),
        |s AS (SELECT pos - 1 AS j, sum(v) AS s FROM u GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM e),
        |cov0 AS (SELECT g.j, g.k, CAST(n.n * g.g - sj.s * sk.s AS BIGINT) AS c
        |  FROM g JOIN s sj ON sj.j = g.j JOIN s sk ON sk.j = g.k CROSS JOIN n),
        |cov AS MATERIALIZED (
        |  SELECT j, k, c FROM cov0
        |  UNION ALL
        |  SELECT k AS j, j AS k, c FROM cov0 WHERE j <> k)""".stripMargin
    head + pcaSweepSql
  }

  /** The G'-eigensolve oracle head (llm_pca_shifted_power): integer
    * per-dim means with the sign-wrapped truncating division, Gram of
    * the SHIFTED grid, mirrored to the full symmetric matrix — then the
    * identical scale-and-sweep tail. This is the billion-row production
    * path ([[graft.llm.Pca.componentFromShiftedGram]]): no N²-scale
    * centering anywhere, so every stored magnitude stays a factor N
    * below the one-pass form's.
    */
  private val pcaShiftedPowerSqlPrefix: String = {
    val head =
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS vq FROM embeddings),
        |u AS (SELECT vec_id, unnest(vq) AS v, generate_subscripts(vq, 1) AS pos FROM e),
        |n AS (SELECT count(*) AS n FROM e),
        |s0 AS (SELECT pos - 1 AS j, sum(v) AS s FROM u GROUP BY 1),
        |mm AS (SELECT j, CASE WHEN s < 0 THEN -((-s) // n.n) ELSE s // n.n END AS m
        |      FROM s0 CROSS JOIN n),
        |sh AS (SELECT u.vec_id, u.pos, u.v - mm.m AS v
        |      FROM u JOIN mm ON mm.j = u.pos - 1),
        |g0 AS (SELECT a.pos - 1 AS j, b.pos - 1 AS k, sum(a.v * b.v) AS g
        |      FROM sh a JOIN sh b ON a.vec_id = b.vec_id AND b.pos >= a.pos
        |      GROUP BY 1, 2),
        |cov AS MATERIALIZED (
        |  SELECT j, k, g AS c FROM g0
        |  UNION ALL
        |  SELECT k AS j, j AS k, g AS c FROM g0 WHERE j <> k)""".stripMargin
    head + pcaSweepSql
  }

  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  count(*) AS n_rows,
        |  count(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem GROUP BY 1, 2""".stripMargin,
    "p1_rename_project" ->
      "SELECT p_partkey AS part_id, lower(trim(p_name)) AS name, p_retailprice AS retail FROM part",
    "p2_filter_status" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        |FROM lineitem
        |WHERE l_returnflag = 'R' AND l_quantity >= 30 AND l_linestatus NOT IN ('X')""".stripMargin,
    "p7_limit_topn" ->
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100",
    "p8_dedup_first" ->
      """SELECT doc_id, lang, source FROM (
        |  SELECT doc_id, lang, source,
        |    row_number() OVER (PARTITION BY lang, source ORDER BY doc_id ASC) AS rn
        |  FROM documents) WHERE rn = 1""".stripMargin,
    "j11_xref_join" ->
      """SELECT r_name, count(*) AS n_customers,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1""".stripMargin,
    "j13_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')""".stripMargin,
    "t1_top1_per_group" ->
      """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS latest_date FROM (
        |  SELECT o_custkey, o_orderkey, o_orderdate,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders) WHERE rn = 1""".stripMargin,
    "t2_newest_top1" ->
      """SELECT user_id, event_id, epoch_us(ts) AS created_us FROM (
        |  SELECT user_id, event_id, ts,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1""".stripMargin,
    "s9_text_scan" ->
      """SELECT CAST(line AS VARCHAR) AS line
        |FROM read_csv('/root/reference/test/data/UNII_Records_25Oct2018_sample.txt',
        |  delim=chr(1), header=false, quote='', escape='',
        |  columns={'line': 'VARCHAR'})""".stripMargin,
    "set_except" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'""".stripMargin,
    "f13_year_extract" ->
      """SELECT year(o_orderdate) AS order_year, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
        |FROM orders GROUP BY 1""".stripMargin,
    "a7_consensus" ->
      """SELECT o_custkey,
        |  CASE WHEN count(DISTINCT o_orderpriority) = 1 THEN min(o_orderpriority) END AS consensus_priority,
        |  count(*) AS n_orders
        |FROM orders GROUP BY 1""".stripMargin,
    "a1_hash_id" ->
      """SELECT o_orderkey,
        |  sha256(to_json(struct_pack(
        |    o_orderkey := o_orderkey,
        |    status_n := nullif(o_orderstatus, 'P'),
        |    o_orderpriority := o_orderpriority))::VARCHAR) AS hash_id
        |FROM orders""".stripMargin,
    // x1/x4/x8 are frozen golden frames (hand-derived DNF / expansion /
    // ladder expectations, cross-checked against the reference's jest
    // corpus semantics in ProfileDnfSpec).
    "j4_plural_fallback" ->
      """WITH dim AS (
        |  SELECT lower(p_type) || CASE WHEN p_size % 2 = 0 THEN ' inhibitor' ELSE ' inhibitors' END AS name,
        |         min(p_partkey) AS therapy_id
        |  FROM part GROUP BY 1),
        |lk AS (SELECT DISTINCT lower(p_type) || ' inhibitor' AS term FROM part WHERE p_partkey % 13 = 0),
        |direct AS (SELECT term, therapy_id FROM lk LEFT JOIN dim ON term = name)
        |SELECT term, therapy_id, false AS via_fallback FROM direct WHERE therapy_id IS NOT NULL
        |UNION ALL
        |SELECT d.term, d2.therapy_id, d2.name IS NOT NULL AS via_fallback
        |FROM direct d LEFT JOIN dim d2
        |  ON regexp_replace(d.term, '\binhibitor\b', 'inhibitors', 'g') = d2.name
        |WHERE d.therapy_id IS NULL""".stripMargin,
    "j5_vocab_lookup" ->
      """WITH vocab AS (
        |  SELECT n_nationkey AS term_sid, n_name AS term
        |  FROM nation JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'AMERICA')
        |SELECT c_custkey, term FROM customer LEFT JOIN vocab ON c_nationkey = term_sid
        |WHERE c_custkey % 31 = 0""".stripMargin,
    "j6_therapy_combo" ->
      """WITH dim AS (SELECT lower(p_type) AS elem_name, min(p_partkey) AS elem_id FROM part GROUP BY 1),
        |fl AS (SELECT l_orderkey, l_partkey,
        |         row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) AS rn
        |       FROM lineitem WHERE l_orderkey % 251 = 0),
        |elems AS (SELECT l_orderkey AS order_id, elem_id, lower(p_type) AS elem_name
        |          FROM fl JOIN part ON l_partkey = p_partkey
        |          JOIN dim ON lower(p_type) = dim.elem_name
        |          WHERE rn <= 2),
        |g AS (SELECT order_id,
        |        array_to_string(list_sort(list(elem_id)), ' + ') AS combo_source_id,
        |        array_to_string(list_sort(list(elem_name)), ' + ') AS combo_name,
        |        count(*) AS n
        |      FROM elems GROUP BY 1)
        |SELECT order_id, combo_source_id, combo_name FROM g WHERE n = 2""".stripMargin,
    "j7_coalesce_resolve" ->
      """WITH lk AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 2 = 0 THEN o_custkey END AS cust_id,
        |    c_name AS cust_name
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  WHERE o_orderkey % 41 = 0)
        |SELECT o_orderkey,
        |  coalesce(i.c_custkey, n.c_custkey) AS resolved_custkey,
        |  CASE WHEN i.c_custkey IS NOT NULL THEN 'id' ELSE 'name' END AS via
        |FROM lk
        |LEFT JOIN customer i ON lk.cust_id = i.c_custkey
        |LEFT JOIN customer n ON lk.cust_name = n.c_name""".stripMargin,
    "j8_cascade_resolve" ->
      """WITH lk AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 3 = 0 THEN c_name
        |         WHEN o_orderkey % 3 = 1 THEN upper(c_name)
        |         ELSE replace(c_name, 'Customer#', 'CUST-') END AS term
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  WHERE o_orderkey % 43 = 0)
        |SELECT o_orderkey,
        |  coalesce(s1.c_custkey, s2.c_custkey, s3.c_custkey) AS resolved_custkey,
        |  CASE WHEN s1.c_custkey IS NOT NULL THEN 1
        |       WHEN s2.c_custkey IS NOT NULL THEN 2
        |       WHEN s3.c_custkey IS NOT NULL THEN 3 END AS stage
        |FROM lk
        |LEFT JOIN customer s1 ON lk.term = s1.c_name
        |LEFT JOIN customer s2 ON lower(lk.term) = lower(s2.c_name)
        |LEFT JOIN customer s3 ON replace(lk.term, 'CUST-', 'Customer#') = s3.c_name""".stripMargin,
    "j9_fetch_union" ->
      """WITH lk AS (SELECT DISTINCT o_custkey AS key FROM orders WHERE o_orderkey % 61 = 0)
        |SELECT key AS custkey, c_name AS name, key % 2 <> 0 AS fetched
        |FROM lk JOIN customer ON key = c_custkey""".stripMargin,
    "j10_biotype_lookup" ->
      """SELECT c_custkey, n_name AS feature_name
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE c_custkey % 17 = 0""".stripMargin,
    "a2_recurrence" ->
      """WITH l0 AS (SELECT l_partkey, l_returnflag, l_linestatus, count(DISTINCT l_orderkey) AS n_samples
        |            FROM lineitem GROUP BY 1,2,3 HAVING n_samples >= 3),
        |l1a AS (SELECT l_partkey, l_returnflag, count(DISTINCT l_orderkey) AS n_samples
        |        FROM lineitem GROUP BY 1,2 HAVING n_samples >= 3),
        |l2a AS (SELECT l_partkey, count(DISTINCT l_orderkey) AS n_samples
        |        FROM lineitem GROUP BY 1 HAVING n_samples >= 3),
        |l1 AS (SELECT * FROM l1a WHERE NOT EXISTS (
        |         SELECT 1 FROM l0 WHERE l0.l_partkey = l1a.l_partkey AND l0.l_returnflag = l1a.l_returnflag)),
        |l2 AS (SELECT * FROM l2a WHERE NOT EXISTS (SELECT 1 FROM l0 WHERE l0.l_partkey = l2a.l_partkey)
        |                           AND NOT EXISTS (SELECT 1 FROM l1a WHERE l1a.l_partkey = l2a.l_partkey))
        |SELECT CAST(0 AS INT) AS level, l_partkey, l_returnflag AS disease, l_linestatus AS status, n_samples FROM l0
        |UNION ALL SELECT 1, l_partkey, l_returnflag, NULL, n_samples FROM l1
        |UNION ALL SELECT 2, l_partkey, NULL, NULL, n_samples FROM l2""".stripMargin,
    "a4_fill_collapse" ->
      """WITH f AS (SELECT o_custkey, year(o_orderdate) AS order_year, o_orderkey,
        |    CAST(o_orderstatus <> 'P' AS INT) + CAST(o_orderpriority <> '3-MEDIUM' AS INT) AS fill
        |  FROM orders),
        |r AS (SELECT *, row_number() OVER (PARTITION BY o_custkey, order_year ORDER BY fill DESC, o_orderkey ASC) AS rn FROM f)
        |SELECT o_custkey, CAST(order_year AS BIGINT) AS order_year, o_orderkey AS picked_orderkey, CAST(fill AS BIGINT) AS fill
        |FROM r WHERE rn = 1""".stripMargin,
    "a5_name_collision" ->
      """WITH c AS (SELECT c_custkey, c_acctbal, 'cust-' || CAST(c_custkey % 500 AS VARCHAR) AS name FROM customer),
        |m AS (SELECT *, max(c_acctbal) OVER (PARTITION BY name) AS mx FROM c)
        |SELECT name, count(*) AS n_members,
        |  CASE WHEN count(CASE WHEN c_acctbal = mx THEN 1 END) = 1
        |       THEN min(CASE WHEN c_acctbal = mx THEN c_custkey END) END AS resolved_custkey,
        |  count(CASE WHEN c_acctbal = mx THEN 1 END) = 1 AS resolved
        |FROM m GROUP BY name""".stripMargin,
    "a6_version_fold" ->
      """WITH r AS (SELECT o_custkey, year(o_orderdate) AS y, o_orderkey,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY year(o_orderdate) ASC, o_orderkey ASC) AS rn
        |  FROM orders)
        |SELECT o_custkey, CAST(min(y) AS BIGINT) AS first_year, CAST(max(y) AS BIGINT) AS last_year,
        |  count(DISTINCT y) AS n_years, min(CASE WHEN rn = 1 THEN o_orderkey END) AS first_orderkey
        |FROM r GROUP BY 1""".stripMargin,
    "a9_column_scan" ->
      """SELECT l_orderkey, l_linenumber,
        |  CASE WHEN CAST(round(l_quantity) AS BIGINT) = l_linenumber THEN 'l_quantity'
        |       WHEN CAST(round(l_discount * 100) AS BIGINT) = l_linenumber THEN 'l_discount'
        |       WHEN CAST(round(l_tax * 100) AS BIGINT) = l_linenumber THEN 'l_tax' END AS matching_col
        |FROM lineitem WHERE l_orderkey % 89 = 0""".stripMargin,
    "f2_civic_names" ->
      """SELECT CAST(case_id AS BIGINT) AS case_id, CAST(seq AS BIGINT) AS seq,
        |  CAST(ref1_name AS VARCHAR) AS ref1_name, CAST(ref1_sid AS VARCHAR) AS ref1_sid,
        |  CAST(ref1_class AS VARCHAR) AS ref1_class,
        |  CAST(ref2_name AS VARCHAR) AS ref2_name, CAST(ref2_sid AS VARCHAR) AS ref2_sid,
        |  CAST("positional" AS BOOLEAN) AS "positional", CAST(variant AS VARCHAR) AS variant, CAST(vtype AS VARCHAR) AS vtype,
        |  CAST(inferred_cds AS VARCHAR) AS inferred_cds, CAST(infers_type AS VARCHAR) AS infers_type
        |FROM (VALUES
        |(1, 0, 'gene', '1', NULL, NULL, NULL, TRUE, 'e.12mut', NULL, NULL, NULL),
        |(2, 0, 'alk', '1', NULL, NULL, NULL, FALSE, NULL, 'fusion', NULL, NULL),
        |(2, 1, 'alk', '1', NULL, NULL, NULL, TRUE, 'p.g1202r', NULL, NULL, NULL),
        |(3, 0, 'eml4', NULL, NULL, 'alk', '1', FALSE, NULL, 'fusion', NULL, NULL),
        |(3, 1, 'alk', '1', NULL, NULL, NULL, TRUE, 'p.g1202r', NULL, NULL, NULL),
        |(3, 2, 'alk', '1', NULL, NULL, NULL, TRUE, 'p.l1198f', NULL, NULL, NULL),
        |(4, 0, 'ntrk1', '1', NULL, NULL, NULL, TRUE, 'p.s111c', NULL, 'c.330_331delcainstt', NULL),
        |(5, 0, '9', NULL, NULL, '22', NULL, TRUE, 'translocation(q34, q11)', NULL, NULL, NULL),
        |(6, 0, 'ntrk1', '1', NULL, NULL, NULL, TRUE, 'p.r132h', NULL, NULL, NULL),
        |(7, 0, 'eml4', NULL, NULL, 'alk', '1', TRUE, 'fusion(e.20,e.20)', NULL, NULL, NULL),
        |(8, 0, 'nrg1', '1', NULL, NULL, NULL, FALSE, NULL, 'fusion', NULL, NULL),
        |(9, 0, 'gene', '1', NULL, NULL, NULL, FALSE, NULL, 'deletrious mutation', NULL, NULL),
        |(10, 0, 'gene', '1', NULL, NULL, NULL, TRUE, 'p.y1234phos', NULL, NULL, NULL),
        |(11, 0, 'ntrk1', '1', NULL, NULL, NULL, FALSE, NULL, 'underexpression', NULL, NULL),
        |(12, 0, 'alk', '1', NULL, NULL, NULL, TRUE, 'p.e46*', NULL, 'c.136g>t', NULL),
        |(13, 0, 'ntrk1', '1', NULL, NULL, NULL, FALSE, NULL, 'dna binding domain mutation', NULL, NULL),
        |(14, 0, 'abl1', '1', NULL, NULL, NULL, TRUE, 'c.123g>t', NULL, NULL, NULL),
        |(15, 0, 'abl1', '1', NULL, NULL, NULL, TRUE, 'e.2_3del', NULL, NULL, NULL),
        |(16, 0, 'alk', '1', NULL, NULL, NULL, TRUE, 'p.t133lfs*26', NULL, 'c.397dela', NULL),
        |(17, 0, 'abl1', '1', NULL, NULL, NULL, FALSE, NULL, 'mutation', NULL, NULL),
        |(18, 0, 'abl1', '1', NULL, NULL, NULL, FALSE, NULL, 'mutation', NULL, NULL),
        |(19, 0, 'abl1', '1', NULL, NULL, NULL, TRUE, 'e.3mut', NULL, NULL, NULL),
        |(20, 0, 'alk', '1', NULL, NULL, NULL, TRUE, 'p.f547spl', NULL, NULL, NULL),
        |(21, 0, 'alk', '1', NULL, NULL, NULL, TRUE, 'p.r79_s80del', NULL, 'c.236_241delgcagtc', NULL),
        |(22, 0, 'alk', '1', NULL, NULL, NULL, TRUE, 'p.r82_v84del', NULL, 'c.244_252del', NULL),
        |(23, 0, 'alk', '1', NULL, NULL, NULL, TRUE, 'p.s193_c196dupstsc', NULL, 'c.577_588dupagcaccagctgc', NULL),
        |(24, 0, 'kras', '1', NULL, NULL, NULL, TRUE, 'p.(g12_g13)mut', NULL, NULL, NULL),
        |(25, 0, 'gene', '1', NULL, NULL, NULL, TRUE, 'y.p26.3_p25.3del', NULL, NULL, NULL),
        |(26, 0, 'alk', '1', NULL, NULL, NULL, TRUE, 'p.a50a', NULL, 'c.150c>g', NULL),
        |(26, 1, 'alk', '1', NULL, NULL, NULL, TRUE, 'c.463-1g>t', NULL, NULL, 'splicing alteration'),
        |(27, 0, 'erbb2', '1', NULL, NULL, NULL, FALSE, NULL, 'erbb2 g776insv_g/c', NULL, NULL),
        |(28, 0, 'erbb2', '1', NULL, NULL, NULL, FALSE, NULL, 'exon1 151nt del', NULL, NULL),
        |(28, 1, 'erbb2', '1', NULL, NULL, NULL, FALSE, NULL, 'null (partial deletion of exon 1)', NULL, NULL),
        |(29, 0, 'cd74', NULL, NULL, 'nrg1', '1', FALSE, NULL, 'fusion', NULL, NULL),
        |(30, 0, 'lmna', NULL, NULL, 'ntrk1', '1', FALSE, NULL, 'fusion', NULL, NULL),
        |(30, 1, 'ntrk1', '1', NULL, NULL, NULL, TRUE, 'p.g595r', NULL, NULL, NULL),
        |(30, 2, 'ntrk1', '1', NULL, NULL, NULL, TRUE, 'p.g667c', NULL, NULL, NULL),
        |(31, 0, 'ewsr1', NULL, NULL, 'fli1', '1', TRUE, 'fusion(e.7,e.6)', NULL, NULL, NULL),
        |(32, 0, 'eml4', '1', NULL, 'alk', NULL, TRUE, 'fusion(e.20,e.20)', NULL, NULL, NULL),
        |(33, 0, 'bcr', NULL, NULL, 'abl1', '1', FALSE, NULL, 'fusion', NULL, NULL),
        |(40, 0, 'high mutation burden', NULL, 'Signature', NULL, NULL, FALSE, NULL, 'high signature', NULL, NULL),
        |(41, 0, 'braf', '673', NULL, 'alk', '238', FALSE, NULL, 'fusion', NULL, NULL)
        |) AS t(case_id, seq, ref1_name, ref1_sid, ref1_class, ref2_name, ref2_sid, "positional", variant, vtype, inferred_cds, infers_type)""".stripMargin,
    "f3_oncokb_names" ->
      """SELECT CAST(case_id AS BIGINT) AS case_id, CAST(parsed_type AS VARCHAR) AS parsed_type,
        |  CAST(reference2 AS VARCHAR) AS reference2, CAST(flipped AS BOOLEAN) AS flipped
        |FROM (VALUES
        |(1, 'p.v600_k601insfglat', NULL, NULL),
        |(2, 'fusion', 'abl1', FALSE),
        |(3, 'fusion', 'bcr', TRUE),
        |(4, 'fusion', 'gopc', TRUE),
        |(5, 'p.(x100_a101)spl', NULL, NULL),
        |(6, 'e.12mut', NULL, NULL),
        |(7, 'truncating', NULL, NULL),
        |(8, 'p.(k550_w557)*', NULL, NULL)
        |) AS t(case_id, parsed_type, reference2, flipped)""".stripMargin,
    "f4_docm_fixes" ->
      """SELECT CAST(case_id AS BIGINT) AS case_id, CAST(raw AS VARCHAR) AS raw,
        |  CAST(fixed AS VARCHAR) AS fixed FROM (VALUES
        |(1, 'p.W802-', 'p.W802delW'),
        |(2, 'p.DIM842-', 'p.D842_M844delDIM'),
        |(3, 'p.DI842VM', 'p.D842_I843delDIinsVM'),
        |(4, 'p.AB100AC', 'p.B101delBinsC'),
        |(5, 'p.G12D', 'p.G12D'),
        |(6, 'p.ABC100X', 'p.ABC100X')) AS t(case_id, raw, fixed)""".stripMargin,
    "f5_genomic_compose" ->
      """SELECT CAST(rec_id AS BIGINT) AS rec_id, CAST(hgvs_g AS VARCHAR) AS hgvs_g FROM (VALUES
        |(1, 'g.100A>T'), (2, 'g.100_101insTT'), (3, 'g.100_101delGG'),
        |(4, 'g.100delG'), (5, 'g.100_101delAAinsTT'), (6, 'g.100_101delAAinsT')
        |) AS t(rec_id, hgvs_g)""".stripMargin,
    "f6_relevance" ->
      """SELECT CAST(case_id AS BIGINT) AS case_id, CAST(direction AS VARCHAR) AS direction,
        |  CAST(evidence_type AS VARCHAR) AS evidence_type, CAST(significance AS VARCHAR) AS significance,
        |  CAST(relevance AS VARCHAR) AS relevance FROM (VALUES
        |(0, 'DOES_NOT_SUPPORT', 'FUNCTIONAL', 'DOMINANT_NEGATIVE', 'no dominant negative'),
        |(1, 'DOES_NOT_SUPPORT', 'FUNCTIONAL', 'GAIN_OF_FUNCTION', 'no gain of function'),
        |(2, 'DOES_NOT_SUPPORT', 'FUNCTIONAL', 'NEOMORPHIC', 'no neomorphic'),
        |(3, 'DOES_NOT_SUPPORT', 'ONCOGENIC', 'ONCOGENICITY', 'likely benign'),
        |(4, 'DOES_NOT_SUPPORT', 'PREDICTIVE', 'RESISTANCE', 'no resistance'),
        |(5, 'DOES_NOT_SUPPORT', 'PREDICTIVE', 'SENSITIVITYRESPONSE', 'no response'),
        |(6, 'SUPPORTS', 'DIAGNOSTIC', 'NEGATIVE', 'opposes diagnosis'),
        |(7, 'SUPPORTS', 'DIAGNOSTIC', 'POSITIVE', 'favours diagnosis'),
        |(8, 'SUPPORTS', 'FUNCTIONAL', 'DOMINANT_NEGATIVE', 'dominant negative'),
        |(9, 'SUPPORTS', 'FUNCTIONAL', 'GAIN_OF_FUNCTION', 'gain of function'),
        |(10, 'SUPPORTS', 'FUNCTIONAL', 'LOSS_OF_FUNCTION', 'loss of function'),
        |(11, 'SUPPORTS', 'FUNCTIONAL', 'NEOMORPHIC', 'neomorphic'),
        |(12, 'SUPPORTS', 'FUNCTIONAL', 'UNALTERED_FUNCTION', 'unaltered function'),
        |(13, 'SUPPORTS', 'ONCOGENIC', 'ONCOGENICITY', 'likely oncogenic'),
        |(14, 'SUPPORTS', 'PREDICTIVE', 'ADVERSE_RESPONSE', 'adverse response'),
        |(15, 'SUPPORTS', 'PREDICTIVE', 'REDUCED_SENSITIVITY', 'reduced sensitivity'),
        |(16, 'SUPPORTS', 'PREDICTIVE', 'RESISTANCE', 'resistance'),
        |(17, 'SUPPORTS', 'PREDICTIVE', 'SENSITIVITYRESPONSE', 'sensitivity'),
        |(18, 'SUPPORTS', 'PREDISPOSING', 'LIKELY_PATHOGENIC', 'likely pathogenic'),
        |(19, 'SUPPORTS', 'PREDISPOSING', 'PATHOGENIC', 'pathogenic'),
        |(20, 'SUPPORTS', 'PREDISPOSING', 'POSITIVE', 'predisposing'),
        |(21, 'SUPPORTS', 'PREDISPOSING', 'PREDISPOSITION', 'likely predisposing'),
        |(22, 'SUPPORTS', 'PREDISPOSING', 'PROTECTIVENESS', 'likely protective'),
        |(23, 'SUPPORTS', 'PREDISPOSING', 'UNCERTAIN_SIGNIFICANCE', 'likely predisposing'),
        |(24, 'SUPPORTS', 'PROGNOSTIC', 'BETTER_OUTCOME', 'favourable prognosis'),
        |(25, 'SUPPORTS', 'PROGNOSTIC', 'POOR_OUTCOME', 'unfavourable prognosis'),
        |(26, 'NA', 'PREDISPOSING', 'NA', 'likely predisposing'),
        |(27, 'NA', 'ONCOGENIC', 'NA', 'likely oncogenic'),
        |(28, 'SUPPORTS', 'DIAGNOSTIC', 'NA', NULL),
        |(29, 'DOES_NOT_SUPPORT', 'PROGNOSTIC', 'BETTER_OUTCOME', NULL)) AS t(case_id, direction, evidence_type, significance, relevance)""".stripMargin,
    "f7_level_relevance" ->
      """SELECT CAST(case_id AS BIGINT) AS case_id, CAST(level AS VARCHAR) AS level,
        |  CAST(relevance AS VARCHAR) AS relevance FROM (VALUES
        |(1, 'R1', 'resistance'), (2, 'r2', 'resistance'), (3, '1', 'sensitivity'),
        |(4, '2A', 'sensitivity'), (5, '3b', 'sensitivity'), (6, 'X9', NULL)
        |) AS t(case_id, level, relevance)""".stripMargin,
    "f8_name_clean" ->
      """SELECT CAST(case_id AS BIGINT) AS case_id, CAST(cleaned AS VARCHAR) AS cleaned FROM (VALUES
        |(1, 'egfr inhibitor'), (2, 'acute lymphoblastic leukemia'),
        |(3, 'mek inhibitor'), (4, 'trametinib')) AS t(case_id, cleaned)""".stripMargin,
    "f9_title_match" ->
      """SELECT CAST(case_id AS BIGINT) AS case_id, matches FROM (VALUES
        |(1, true), (2, true), (3, false)) AS t(case_id, matches)""".stripMargin,
    "f10_citation_parse" ->
      """SELECT CAST(case_id AS BIGINT) AS case_id, CAST(abstract_number AS VARCHAR) AS abstract_number,
        |  CAST(meeting AS VARCHAR) AS meeting, CAST(cit_year AS VARCHAR) AS cit_year FROM (VALUES
        |(1, '8001', 'ASCO', '2014'), (2, '102', 'AACR', '2020')) AS t(case_id, abstract_number, meeting, cit_year)""".stripMargin,
    "f11_id_parse" ->
      """SELECT CAST(case_id AS BIGINT) AS case_id, CAST(doid AS VARCHAR) AS doid,
        |  CAST(base_id AS VARCHAR) AS base_id, CAST(id_version AS VARCHAR) AS id_version FROM (VALUES
        |(1, 'doid:8718', 'ENSG00000139618', '17'),
        |(2, 'doid:14566', 'NM_005228', '5'),
        |(3, '', 'NP_008819', NULL)) AS t(case_id, doid, base_id, id_version)""".stripMargin,
    "f12_phase_norm" ->
      """SELECT CAST(case_id AS BIGINT) AS case_id, CAST(phase AS VARCHAR) AS phase FROM (VALUES
        |(1, '1'), (2, '1/2'), (3, '3'), (4, '')) AS t(case_id, phase)""".stripMargin,
    "f14_species" ->
      """SELECT CAST(case_id AS BIGINT) AS case_id, non_human FROM (VALUES
        |(1, true), (2, true), (3, false), (4, false)) AS t(case_id, non_human)""".stripMargin,
    "f17_display_name" ->
      """SELECT p_partkey, lower(trim(p_name)) || ' [' || upper(p_brand) || ']' AS display_name,
        |  'pmid:' || CAST(p_partkey AS VARCHAR) AS pmid_style
        |FROM part WHERE p_partkey % 23 = 0""".stripMargin,
    "t3_version_sort" ->
      """SELECT CAST(case_id AS BIGINT) AS case_id, CAST(version AS VARCHAR) AS version,
        |  CAST(pos AS BIGINT) AS pos FROM (VALUES
        |(1, 'NM_005228.5', 5), (2, 'NM_005228.10', 6), (3, 'v1.2.10', 1),
        |(4, 'v1.10.2', 2), (5, '2018-04-27', 4), (6, '2018-4-5', 3)) AS t(case_id, version, pos)""".stripMargin,
    "p5_deprecation_filter" ->
      """SELECT p_partkey, p_type FROM part
        |WHERE p_partkey % 19 = 0
        |  AND len(list_intersect(string_split(p_type, ' '), ['BRUSHED', 'ANODIZED'])) = 0""".stripMargin,
    "p6_null_normalize" ->
      """SELECT p_partkey,
        |  nullif(nullif(trim(CASE WHEN p_size % 3 = 0 THEN 'None'
        |                          WHEN p_size % 3 = 1 THEN ''
        |                          ELSE p_brand END), 'None'), '') AS cleaned
        |FROM part WHERE p_partkey % 19 = 0""".stripMargin,
    "p9_jsonpath" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events WHERE event_id % 97 = 0""".stripMargin,
    "set_union_dedup" ->
      """SELECT c_custkey AS key FROM customer WHERE c_custkey % 2 = 0
        |UNION
        |SELECT o_custkey FROM orders WHERE o_orderkey % 3 = 0""".stripMargin,
    "j3_filter_tree" ->
      """SELECT c_custkey, c_mktsegment, c_nationkey FROM customer
        |WHERE (c_mktsegment = 'BUILDING' AND c_nationkey = 5)
        |   OR (c_mktsegment = 'MACHINERY' AND c_nationkey IN (1, 2, 3))""".stripMargin,
    "j14_struct_key" ->
      """WITH ck AS (
        |  SELECT o_orderkey, o_custkey, l_orderkey % 2 = 0 AS even, l_orderkey % 3 = 0 AS tri,
        |         l_partkey
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |inc AS (SELECT o_orderkey AS iid, o_custkey AS subject,
        |          list_sort(list(DISTINCT l_partkey)) AS conditions
        |        FROM ck WHERE even GROUP BY 1, 2),
        |ex AS (SELECT o_orderkey AS eid, o_custkey AS subject,
        |          list_sort(list(DISTINCT l_partkey)) AS conditions
        |        FROM ck WHERE tri GROUP BY 1, 2)
        |SELECT iid, eid, subject FROM inc JOIN ex USING (subject, conditions)
        |WHERE iid <> eid""".stripMargin,
    "p4_validation_split" ->
      """SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
        |WHERE o_orderkey % 29 = 0 AND o_totalprice <= 150000
        |  AND o_orderpriority <> '1-URGENT'""".stripMargin,
    "k10_error_sink" ->
      """SELECT o_orderkey,
        |  array_to_string(list_filter(
        |    [CASE WHEN NOT (o_totalprice <= 150000) THEN 'max_price' END,
        |     CASE WHEN NOT (o_orderpriority <> '1-URGENT') THEN 'not_urgent' END],
        |    x -> x IS NOT NULL), ',') AS violations
        |FROM orders
        |WHERE o_orderkey % 29 = 0
        |  AND (o_totalprice > 150000 OR o_orderpriority = '1-URGENT')""".stripMargin,
    "k5_edge_upsert" ->
      """SELECT DISTINCT l_orderkey AS out, l_partkey AS "in", 'contains' AS edge_class
        |FROM lineitem WHERE l_orderkey % 3 = 0 OR l_orderkey % 2 = 0""".stripMargin,
    "k7_source_upsert" ->
      """WITH target AS (
        |  SELECT s_name AS name, s_nationkey AS nation, s_acctbal AS bal
        |  FROM supplier WHERE s_suppkey % 2 = 0),
        |updates AS (
        |  SELECT s_name AS name, s_nationkey AS nation,
        |    CASE WHEN s_suppkey % 5 = 0 THEN s_acctbal + 1.0 ELSE s_acctbal END AS bal
        |  FROM supplier WHERE s_suppkey % 3 = 0)
        |SELECT coalesce(u.name, t.name) AS name,
        |  CASE WHEN u.name IS NOT NULL THEN u.nation ELSE t.nation END AS nation,
        |  CASE WHEN u.name IS NOT NULL THEN u.bal ELSE t.bal END AS bal
        |FROM target t FULL OUTER JOIN updates u ON t.name = u.name""".stripMargin,
    "k8_nullkey_upsert" ->
      """WITH target AS (
        |  SELECT o_orderkey AS id, nullif(o_orderstatus, 'P') AS nkey,
        |         o_totalprice AS total
        |  FROM orders WHERE o_orderkey % 2 = 0),
        |updates AS (
        |  SELECT o_orderkey AS id, nullif(o_orderstatus, 'P') AS nkey,
        |    CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1.0 ELSE o_totalprice END AS total
        |  FROM orders WHERE o_orderkey % 3 = 0)
        |SELECT coalesce(u.id, t.id) AS id,
        |  CASE WHEN u.id IS NOT NULL THEN u.nkey ELSE t.nkey END AS nkey,
        |  CASE WHEN t.id IS NULL THEN 'create'
        |       WHEN u.id IS NULL THEN 'delete'
        |       WHEN t.total IS DISTINCT FROM u.total THEN 'update'
        |       ELSE 'noop' END AS action
        |FROM target t FULL OUTER JOIN updates u
        |  ON t.id = u.id AND t.nkey IS NOT DISTINCT FROM u.nkey""".stripMargin,
    "llm_exact_dedup" ->
      """SELECT doc_id, md5(text) AS content_key,
        |  doc_id = min(doc_id) OVER (PARTITION BY md5(text)) AS is_canonical
        |FROM documents""".stripMargin,
    "llm_minhash_neardup" ->
      """WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
        |sh AS (SELECT doc_id, CASE WHEN len(ws) < 3 THEN CAST([] AS VARCHAR[])
        |  ELSE list_distinct(list_transform(generate_series(1, len(ws)-2),
        |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) END AS shingles FROM w),
        |hs AS (SELECT doc_id, shingles,
        |  list_transform(shingles, s -> CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)) AS shash
        |  FROM sh WHERE len(shingles) > 0),
        |sig AS (SELECT doc_id, shingles, list_transform(generate_series(0, 31), i ->
        |  list_min(list_transform(shash, h ->
        |    ((CAST(('0x' || substr(md5('a' || CAST(i AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000006 + 1)
        |      * (h % 1000000007)
        |     + CAST(('0x' || substr(md5('b' || CAST(i AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000007) % 1000000007))) AS sig
        |  FROM hs),
        |bands AS (SELECT doc_id, shingles, b AS band_id,
        |  md5(array_to_string(sig[b*4+1 : b*4+4], ',')) AS band_key
        |  FROM sig, (SELECT unnest(generate_series(0, 7)) AS b)),
        |cand AS (SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
        |    CAST(len(list_intersect(a.shingles, c.shingles)) AS DOUBLE)
        |      / len(list_distinct(list_concat(a.shingles, c.shingles))) AS jaccard
        |  FROM bands a JOIN bands c
        |    ON a.band_id = c.band_id AND a.band_key = c.band_key AND a.doc_id < c.doc_id)
        |SELECT id_a, id_b, jaccard FROM cand WHERE jaccard >= 0.5""".stripMargin,
    // llm_minhash_recall oracle: the full band chain + the brute
    // sample-restricted truth + the hit/recall summary row
    "llm_minhash_recall" ->
      """WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
        |sh AS (SELECT doc_id, CASE WHEN len(ws) < 3 THEN CAST([] AS VARCHAR[])
        |  ELSE list_distinct(list_transform(generate_series(1, len(ws)-2),
        |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) END AS shingles FROM w),
        |hs AS (SELECT doc_id, shingles,
        |  list_transform(shingles, s -> CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)) AS shash
        |  FROM sh WHERE len(shingles) > 0),
        |sig AS (SELECT doc_id, shingles, list_transform(generate_series(0, 31), i ->
        |  list_min(list_transform(shash, h ->
        |    ((CAST(('0x' || substr(md5('a' || CAST(i AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000006 + 1)
        |      * (h % 1000000007)
        |     + CAST(('0x' || substr(md5('b' || CAST(i AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000007) % 1000000007))) AS sig
        |  FROM hs),
        |bands AS (SELECT doc_id, shingles, b AS band_id,
        |  md5(array_to_string(sig[b*4+1 : b*4+4], ',')) AS band_key
        |  FROM sig, (SELECT unnest(generate_series(0, 7)) AS b)),
        |cand AS (SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
        |    CAST(len(list_intersect(a.shingles, c.shingles)) AS DOUBLE)
        |      / len(list_distinct(list_concat(a.shingles, c.shingles))) AS jaccard
        |  FROM bands a JOIN bands c
        |    ON a.band_id = c.band_id AND a.band_key = c.band_key AND a.doc_id < c.doc_id),
        |smp AS (SELECT doc_id, shingles FROM hs
        |  ORDER BY CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT), doc_id LIMIT 64),
        |found AS (SELECT id_a AS qid, id_b AS nid FROM cand
        |  WHERE jaccard >= 0.5 AND (id_a IN (SELECT doc_id FROM smp) OR id_b IN (SELECT doc_id FROM smp))),
        |truth AS (SELECT DISTINCT least(s.doc_id, c.doc_id) AS qid, greatest(s.doc_id, c.doc_id) AS nid
        |  FROM smp s JOIN hs c ON s.doc_id <> c.doc_id
        |    AND len(c.shingles) * 2 >= len(s.shingles) AND len(c.shingles) <= len(s.shingles) * 2
        |  WHERE CAST(len(list_intersect(s.shingles, c.shingles)) AS DOUBLE)
        |      / len(list_distinct(list_concat(s.shingles, c.shingles))) >= 0.5),
        |hits AS (SELECT count(*) AS n_hits FROM truth JOIN found USING (qid, nid)),
        |tot AS (SELECT count(*) AS n_truth FROM truth)
        |SELECT 'minhash_bands' AS path, CAST(n_hits AS BIGINT) AS n_hits, CAST(n_truth AS BIGINT) AS n_truth,
        |  CASE WHEN n_truth = 0 THEN 0.0 ELSE CAST(n_hits AS DOUBLE) / n_truth END AS recall
        |FROM hits CROSS JOIN tot""".stripMargin,
    // llm_simhash_neardup oracle: brute all-pairs hamming over the 60-bit
    // fingerprint chain — the block decomposition is provably lossless at
    // radius 3 < 4 blocks, so exact equality is the contract
    "llm_simhash_neardup" ->
      """WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
        |sh AS (SELECT doc_id, CASE WHEN len(ws) < 3 THEN CAST([] AS VARCHAR[])
        |  ELSE list_distinct(list_transform(generate_series(1, len(ws)-2),
        |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) END AS shingles FROM w),
        |hs AS (SELECT doc_id,
        |  list_transform(shingles, s -> CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)) AS shash
        |  FROM sh WHERE len(shingles) > 0),
        |f AS (SELECT doc_id, CAST(list_sum(list_transform(generate_series(0, 59), k ->
        |  CASE WHEN list_sum(list_transform(shash, h ->
        |      CASE WHEN (h >> k) & 1 = 1 THEN 1 ELSE -1 END)) > 0
        |    THEN (CAST(1 AS BIGINT) << k) ELSE 0 END)) AS BIGINT) AS sh FROM hs)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
        |FROM f a JOIN f b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.sh, b.sh)) <= 3""".stripMargin,
    "llm_simhash" ->
      """WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
        |sh AS (SELECT doc_id, CASE WHEN len(ws) < 3 THEN CAST([] AS VARCHAR[])
        |  ELSE list_distinct(list_transform(generate_series(1, len(ws)-2),
        |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) END AS shingles FROM w),
        |hs AS (SELECT doc_id, shingles,
        |  list_transform(shingles, s -> CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)) AS shash FROM sh)
        |SELECT doc_id, CAST(list_sum(list_transform(generate_series(0, 31), k ->
        |  CASE WHEN list_sum(list_transform(shash, h ->
        |      CASE WHEN (h >> k) & 1 = 1 THEN 1 ELSE -1 END)) > 0
        |    THEN (CAST(1 AS BIGINT) << k) ELSE 0 END)) AS BIGINT) AS simhash
        |FROM hs""".stripMargin,
    "llm_ngram_jaccard" ->
      """WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
        |sh AS (SELECT doc_id, CASE WHEN len(ws) < 3 THEN CAST([] AS VARCHAR[])
        |  ELSE list_distinct(list_transform(generate_series(1, len(ws)-2),
        |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) END AS shingles FROM w),
        |hs AS (SELECT doc_id, shingles,
        |  list_transform(shingles, s -> CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)) AS shash FROM sh),
        |b AS (SELECT d.lang, d.source, hs.doc_id, hs.shingles FROM hs JOIN documents d USING (doc_id) WHERE len(hs.shingles) > 0)
        |SELECT a.doc_id AS id_a, c.doc_id AS id_b,
        |  CAST(len(list_intersect(a.shingles, c.shingles)) AS DOUBLE)
        |    / len(list_distinct(list_concat(a.shingles, c.shingles))) AS jaccard
        |FROM b a JOIN b c ON a.lang = c.lang AND a.source = c.source AND a.doc_id < c.doc_id
        |WHERE CAST(len(list_intersect(a.shingles, c.shingles)) AS DOUBLE)
        |    / len(list_distinct(list_concat(a.shingles, c.shingles))) >= 0.5""".stripMargin,
    "llm_text_stats" ->
      """WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
        |sh AS (SELECT doc_id, CASE WHEN len(ws) < 3 THEN CAST([] AS VARCHAR[])
        |  ELSE list_distinct(list_transform(generate_series(1, len(ws)-2),
        |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) END AS shingles FROM w),
        |hs AS (SELECT doc_id, shingles,
        |  list_transform(shingles, s -> CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)) AS shash FROM sh)
        |SELECT hs.doc_id,
        |  CAST(len(ws) AS BIGINT) AS n_ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z0-9]+|[^a-z0-9\s]')) AS BIGINT) AS n_bpeish_tokens,
        |  (CASE WHEN length(text) BETWEEN 100 AND 5000 THEN 1.0
        |        WHEN length(text) > 5000 THEN 0.5 ELSE 0.2 END +
        |   CASE WHEN CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(ws)
        |             BETWEEN 3.0 AND 8.0 THEN 1.0 ELSE 0.4 END +
        |   CAST(length(regexp_replace(text, '[^a-zA-Z ]', '', 'g')) AS DOUBLE) / length(text)
        |  ) / 3.0 AS quality,
        |  list_min(shash) AS fingerprint,
        |  md5(text) AS content_key
        |FROM hs JOIN w ON hs.doc_id = w.doc_id JOIN documents d ON d.doc_id = hs.doc_id""".stripMargin,
    // llm_quality_cut oracle: same score formula as llm_text_stats, same
    // floor(q*1e6) quantize, threshold off the descending cumulative
    // histogram with integer-exact k = ceil(n*pct/100)
    "llm_quality_cut" ->
      """WITH w AS (SELECT doc_id, text, string_split(lower(text), ' ') AS ws FROM documents),
        |s AS (SELECT doc_id, CAST(floor((
        |    (CASE WHEN length(text) BETWEEN 100 AND 5000 THEN 1.0
        |          WHEN length(text) > 5000 THEN 0.5 ELSE 0.2 END +
        |     CASE WHEN CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(ws)
        |               BETWEEN 3.0 AND 8.0 THEN 1.0 ELSE 0.4 END +
        |     CAST(length(regexp_replace(text, '[^a-zA-Z ]', '', 'g')) AS DOUBLE) / length(text)
        |    ) / 3.0) * 1000000.0) AS BIGINT) AS score_micro FROM w),
        |h AS (SELECT score_micro, CAST(count(*) AS BIGINT) AS c FROM s GROUP BY score_micro),
        |n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM h),
        |cum AS (SELECT score_micro, sum(c) OVER (ORDER BY score_micro DESC ROWS UNBOUNDED PRECEDING) AS cum FROM h),
        |t AS (SELECT max(score_micro) AS threshold FROM cum CROSS JOIN n WHERE cum >= (n * 20 + 99) // 100)
        |SELECT doc_id, score_micro, threshold, score_micro >= threshold AS keep
        |FROM s CROSS JOIN t""".stripMargin,
    "llm_langid" ->
      """WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
        |h AS (SELECT doc_id,
        |  CAST(len(list_filter(ws, w -> list_contains(['the','a','of','and','to','in','is','it','for','on'], w))) AS BIGINT) AS en_hits,
        |  CAST(len(list_filter(ws, w -> list_contains(['le','la','et','les','des','un','une','du','est','dans'], w))) AS BIGINT) AS fr_hits,
        |  CAST(len(list_filter(ws, w -> list_contains(['der','die','und','das','ist','nicht','ein','mit','den','von'], w))) AS BIGINT) AS de_hits
        |FROM w)
        |SELECT doc_id, en_hits, fr_hits, de_hits,
        |  CASE WHEN en_hits >= fr_hits AND en_hits >= de_hits AND en_hits > 0 THEN 'en'
        |       WHEN fr_hits >= de_hits AND fr_hits > 0 THEN 'fr'
        |       WHEN de_hits > 0 THEN 'de' ELSE 'unknown' END AS pred_lang
        |FROM h""".stripMargin,
    // llm_script_detect oracle: same \x{...} block ranges (RE2 and Java
    // regex read them identically), exact integer counts, fixed-precedence
    // dominant verdict
    "llm_script_detect" ->
      """WITH s AS (SELECT doc_id,
        |  CASE WHEN doc_id % 11 = 0 THEN 'привет мир это документ на русском языке'
        |       WHEN doc_id % 13 = 0 THEN '你好世界这是一份中文文档测试'
        |       WHEN doc_id % 17 = 0 THEN 'مرحبا بالعالم هذا نص عربي'
        |       ELSE text || CASE WHEN doc_id % 5 = 0 THEN ' αβγδε' ELSE '' END END AS t2
        |  FROM documents),
        |c AS (SELECT doc_id,
        |  CAST(len(regexp_extract_all(t2, '[A-Za-z\x{00C0}-\x{024F}]', 0)) AS BIGINT) AS n_latin,
        |  CAST(len(regexp_extract_all(t2, '[\x{0400}-\x{04FF}]', 0)) AS BIGINT) AS n_cyrillic,
        |  CAST(len(regexp_extract_all(t2, '[\x{3040}-\x{30FF}\x{4E00}-\x{9FFF}]', 0)) AS BIGINT) AS n_cjk,
        |  CAST(len(regexp_extract_all(t2, '[\x{0600}-\x{06FF}]', 0)) AS BIGINT) AS n_arabic,
        |  CAST(len(regexp_extract_all(t2, '[\x{0370}-\x{03FF}]', 0)) AS BIGINT) AS n_greek
        |FROM s),
        |m AS (SELECT *, greatest(n_latin, n_cyrillic, n_cjk, n_arabic, n_greek) AS mx FROM c)
        |SELECT doc_id, n_latin, n_cyrillic, n_cjk, n_arabic, n_greek,
        |  CASE WHEN n_latin = mx AND mx > 0 THEN 'latin'
        |       WHEN n_cyrillic = mx AND mx > 0 THEN 'cyrillic'
        |       WHEN n_cjk = mx AND mx > 0 THEN 'cjk'
        |       WHEN n_arabic = mx AND mx > 0 THEN 'arabic'
        |       WHEN n_greek = mx AND mx > 0 THEN 'greek'
        |       ELSE 'none' END AS script
        |FROM m""".stripMargin,
    "llm_ann_topk" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS vq FROM embeddings),
        |en AS (SELECT vec_id, vq, CAST(list_sum(list_transform(vq, x -> x * x)) AS BIGINT) AS norm2 FROM e),
        |q AS (SELECT vec_id AS qid, vq AS qv, norm2 AS qn FROM en WHERE vec_id % 50 = 0),
        |c AS (SELECT vec_id AS nid, vq AS nv, norm2 AS nn FROM en),
        |scored AS (SELECT qid, nid,
        |    CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * nv[i])) AS BIGINT) AS dp,
        |    qn, nn
        |  FROM c CROSS JOIN q WHERE nid <> qid),
        |ranked AS (SELECT qid, nid,
        |    CAST(dp AS DOUBLE) / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(nn AS DOUBLE))) AS cos,
        |    row_number() OVER (PARTITION BY qid ORDER BY
        |      CAST(dp AS DOUBLE) / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(nn AS DOUBLE))) DESC,
        |      nid ASC) AS rank
        |  FROM scored)
        |SELECT qid, CAST(rank AS BIGINT) AS rank, nid, cos FROM ranked WHERE rank <= 3""".stripMargin,
    // llm_sq_encode oracle: per-dimension min/max over the quantized
    // grid, then floor-division codes for the %25 sample. DuckDB
    // subscripts are 1-based → pos - 1 matches Spark's posexplode;
    // numerator is non-negative so `//` (truncation) IS floor.
    "llm_sq_encode" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS vq FROM embeddings),
        |u AS (SELECT vec_id, unnest(vq) AS v, generate_subscripts(vq, 1) AS pos FROM e),
        |b AS (SELECT pos, min(v) AS mn, max(v) AS mx FROM u GROUP BY pos)
        |SELECT u.vec_id, CAST(u.pos - 1 AS BIGINT) AS pos, b.mn, b.mx,
        |  CASE WHEN b.mx = b.mn THEN CAST(0 AS BIGINT)
        |       ELSE CAST(((u.v - b.mn) * 255) // (b.mx - b.mn) AS BIGINT) END AS code
        |FROM u JOIN b USING (pos) WHERE u.vec_id % 25 = 0""".stripMargin,
    // llm_sq_search oracle: the same train+encode chain, 255-scaled exact
    // integer reconstruction (rv = mn*255 + code*(mx-mn); the 255 cancels
    // in cosine), then the brute ranking law over (query, reconstruction)
    "llm_sq_search" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS vq FROM embeddings),
        |u AS (SELECT vec_id, unnest(vq) AS v, generate_subscripts(vq, 1) AS pos FROM e),
        |b AS (SELECT pos, min(v) AS mn, max(v) AS mx FROM u GROUP BY pos),
        |enc AS (SELECT u.vec_id, list(CASE WHEN b.mx = b.mn THEN b.mn * 255
        |      ELSE b.mn * 255 + (((u.v - b.mn) * 255) // (b.mx - b.mn)) * (b.mx - b.mn) END ORDER BY u.pos) AS rv
        |  FROM u JOIN b USING (pos) GROUP BY u.vec_id),
        |rn AS (SELECT vec_id AS nid, rv, CAST(list_sum(list_transform(rv, x -> x * x)) AS BIGINT) AS rn2 FROM enc),
        |q AS (SELECT vec_id AS qid, vq AS qv, CAST(list_sum(list_transform(vq, x -> x * x)) AS BIGINT) AS qn FROM e WHERE vec_id % 50 = 0),
        |scored AS (SELECT qid, nid,
        |    CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * rv[i])) AS BIGINT) AS dp, qn, rn2
        |  FROM rn CROSS JOIN q WHERE nid <> qid),
        |ranked AS (SELECT qid, nid,
        |    CAST(dp AS DOUBLE) / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(rn2 AS DOUBLE))) AS cos,
        |    row_number() OVER (PARTITION BY qid ORDER BY
        |      CAST(dp AS DOUBLE) / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(rn2 AS DOUBLE))) DESC,
        |      nid ASC) AS rank
        |  FROM scored)
        |SELECT qid, CAST(rank AS BIGINT) AS rank, nid, cos FROM ranked WHERE rank <= 3""".stripMargin,
    // llm_sq_recall oracle: brute truth + the sq_search chain + the hit
    // count / recall summary row
    "llm_sq_recall" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS vq FROM embeddings),
        |en AS (SELECT vec_id, vq, CAST(list_sum(list_transform(vq, x -> x * x)) AS BIGINT) AS norm2 FROM e),
        |bq AS (SELECT vec_id AS qid, vq AS qv, norm2 AS qn FROM en WHERE vec_id % 50 = 0),
        |bscored AS (SELECT qid, en.vec_id AS nid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * en.vq[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(en.norm2 AS DOUBLE))) AS cos
        |  FROM en CROSS JOIN bq WHERE en.vec_id <> qid),
        |truth AS (SELECT qid, nid FROM (SELECT qid, nid,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rank FROM bscored)
        |  WHERE rank <= 3),
        |u AS (SELECT vec_id, unnest(vq) AS v, generate_subscripts(vq, 1) AS pos FROM e),
        |b AS (SELECT pos, min(v) AS mn, max(v) AS mx FROM u GROUP BY pos),
        |enc AS (SELECT u.vec_id, list(CASE WHEN b.mx = b.mn THEN b.mn * 255
        |      ELSE b.mn * 255 + (((u.v - b.mn) * 255) // (b.mx - b.mn)) * (b.mx - b.mn) END ORDER BY u.pos) AS rv
        |  FROM u JOIN b USING (pos) GROUP BY u.vec_id),
        |rn AS (SELECT vec_id AS nid, rv, CAST(list_sum(list_transform(rv, x -> x * x)) AS BIGINT) AS rn2 FROM enc),
        |sscored AS (SELECT qid, nid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * rv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(rn2 AS DOUBLE))) AS cos
        |  FROM rn CROSS JOIN bq WHERE nid <> qid),
        |sq AS (SELECT qid, nid FROM (SELECT qid, nid,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rank FROM sscored)
        |  WHERE rank <= 3),
        |hits AS (SELECT count(*) AS n_hits FROM truth JOIN sq USING (qid, nid)),
        |tot AS (SELECT count(*) AS n_truth FROM truth)
        |SELECT 'sq_adc' AS path, CAST(n_hits AS BIGINT) AS n_hits, CAST(n_truth AS BIGINT) AS n_truth,
        |  CASE WHEN n_truth = 0 THEN 0.0 ELSE CAST(n_hits AS DOUBLE) / n_truth END AS recall
        |FROM hits CROSS JOIN tot""".stripMargin,
    // llm_rp_project oracle: the multiply–xorshift sign derivation
    // replayed as a relational CTE chain (one row per flattened (j,k)
    // index), then the projection as an explicit unnest × sign join ×
    // group-by — structurally independent of the Spark side's literal
    // sign vectors, so a mixer transcription error on either side fails
    // the hash compare. DuckDB's 1-based j maps via (j-1).
    "llm_rp_project" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS vq FROM embeddings),
        |s0 AS (SELECT generate_series AS idx, (2654435761 * generate_series) % 2147483648 AS h FROM generate_series(0, 1023)),
        |s1 AS (SELECT idx, xor(h, h >> 13) AS h FROM s0),
        |s2 AS (SELECT idx, (h * 1274126177) % 2147483648 AS h FROM s1),
        |sg AS (SELECT idx, xor(h, h >> 16) % 3 - 1 AS s FROM s2),
        |u AS (SELECT vec_id, unnest(vq) AS v, generate_subscripts(vq, 1) AS j FROM e WHERE vec_id % 25 = 0),
        |ks AS (SELECT generate_series AS k FROM generate_series(0, 15))
        |SELECT u.vec_id, CAST(ks.k AS BIGINT) AS k, CAST(sum(u.v * sg.s) AS BIGINT) AS y
        |FROM u CROSS JOIN ks JOIN sg ON sg.idx = (u.j - 1) * 16 + ks.k
        |GROUP BY u.vec_id, ks.k""".stripMargin,
    // llm_bin_sketch oracle: the sign pack replayed per 32-bit word —
    // shifts stay below bit 32 (an engine-checked 1<<63 overflows BIGINT)
    "llm_bin_sketch" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS vq FROM embeddings)
        |SELECT vec_id,
        |  ${binPackColsSql}
        |FROM e WHERE vec_id % 25 = 0""".stripMargin,
    // llm_hamming_topk oracle: popcount of the XORed words, (ham ASC,
    // nid ASC) tie law
    "llm_hamming_topk" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS vq FROM embeddings),
        |b AS (SELECT vec_id,
        |  ${binPackColsSql}
        |  FROM e),
        |q AS (SELECT vec_id AS qid, blo AS qlo, bhi AS qhi FROM b WHERE vec_id % 50 = 0),
        |s AS (SELECT qid, b.vec_id AS nid,
        |    CAST(bit_count(xor(b.blo, qlo)) + bit_count(xor(b.bhi, qhi)) AS BIGINT) AS ham
        |  FROM b CROSS JOIN q WHERE b.vec_id <> qid),
        |r AS (SELECT qid, nid, ham,
        |    row_number() OVER (PARTITION BY qid ORDER BY ham ASC, nid ASC) AS rank FROM s)
        |SELECT qid, CAST(rank AS BIGINT) AS rank, nid, ham FROM r WHERE rank <= 3""".stripMargin,
    // llm_hamming_recall oracle: exact cosine truth (the brute chain) vs
    // the Hamming top-3, counted by semi-join — what 1 bit/dim costs
    "llm_hamming_recall" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS vq FROM embeddings),
        |en AS (SELECT vec_id, vq, CAST(list_sum(list_transform(vq, x -> x * x)) AS BIGINT) AS norm2 FROM e),
        |bq AS (SELECT vec_id AS qid, vq AS qv, norm2 AS qn FROM en WHERE vec_id % 50 = 0),
        |bscored AS (SELECT qid, en.vec_id AS nid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * en.vq[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(en.norm2 AS DOUBLE))) AS cos
        |  FROM en CROSS JOIN bq WHERE en.vec_id <> qid),
        |truth AS (SELECT qid, nid FROM (SELECT qid, nid,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rank FROM bscored)
        |  WHERE rank <= 3),
        |b AS (SELECT vec_id,
        |  ${binPackColsSql}
        |  FROM e),
        |hq AS (SELECT vec_id AS qid, blo AS qlo, bhi AS qhi FROM b WHERE vec_id % 50 = 0),
        |hs AS (SELECT qid, b.vec_id AS nid,
        |    bit_count(xor(b.blo, qlo)) + bit_count(xor(b.bhi, qhi)) AS ham
        |  FROM b CROSS JOIN hq WHERE b.vec_id <> qid),
        |hm AS (SELECT qid, nid FROM (SELECT qid, nid,
        |    row_number() OVER (PARTITION BY qid ORDER BY ham ASC, nid ASC) AS rank FROM hs)
        |  WHERE rank <= 3),
        |hits AS (SELECT count(*) AS n_hits FROM truth JOIN hm USING (qid, nid)),
        |tot AS (SELECT count(*) AS n_truth FROM truth)
        |SELECT 'hamming64' AS path, CAST(n_hits AS BIGINT) AS n_hits, CAST(n_truth AS BIGINT) AS n_truth,
        |  CASE WHEN n_truth = 0 THEN 0.0 ELSE CAST(n_hits AS DOUBLE) / n_truth END AS recall
        |FROM hits CROSS JOIN tot""".stripMargin,
    // llm_hamming_rerank oracle: sketch → Hamming shortlist-16 → exact
    // cosine re-rank to top-3, each stage replayed relationally
    "llm_hamming_rerank" ->
      (hammingShortlistSql + """
        |SELECT qid, CAST(rank AS BIGINT) AS rank, nid, cos
        |FROM rr WHERE rank <= 3""".stripMargin),
    // llm_hamming_rerank_recall oracle: the same two-stage chain scored
    // against exact cosine truth
    "llm_hamming_rerank_recall" ->
      (hammingShortlistSql + """,
        |truth AS (SELECT qid, nid FROM (SELECT qid, nid,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rank FROM exsc)
        |  WHERE rank <= 3),
        |rr3 AS (SELECT qid, nid FROM rr WHERE rank <= 3),
        |hits AS (SELECT count(*) AS n_hits FROM truth JOIN rr3 USING (qid, nid)),
        |tot AS (SELECT count(*) AS n_truth FROM truth)
        |SELECT 'hamming64_rerank16' AS path, CAST(n_hits AS BIGINT) AS n_hits,
        |  CAST(n_truth AS BIGINT) AS n_truth,
        |  CASE WHEN n_truth = 0 THEN 0.0 ELSE CAST(n_hits AS DOUBLE) / n_truth END AS recall
        |FROM hits CROSS JOIN tot""".stripMargin),
    // llm_hamming_curve oracle: one Hamming rank pass, three shortlist
    // cuts, each re-ranked by exact cosine and scored against the same
    // exact truth — the relational replay of the shortlist sweep
    "llm_hamming_curve" -> hammingCurveSql,
    // llm_rp_topk oracle: both sides projected with the same mixer-CTE
    // signs, then the brute ranking law over the 16-dim integer dots
    "llm_rp_topk" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS vq FROM embeddings),
        |s0 AS (SELECT generate_series AS idx, (2654435761 * generate_series) % 2147483648 AS h FROM generate_series(0, 1023)),
        |s1 AS (SELECT idx, xor(h, h >> 13) AS h FROM s0),
        |s2 AS (SELECT idx, (h * 1274126177) % 2147483648 AS h FROM s1),
        |sg AS (SELECT idx, xor(h, h >> 16) % 3 - 1 AS s FROM s2),
        |u AS (SELECT vec_id, unnest(vq) AS v, generate_subscripts(vq, 1) AS j FROM e),
        |ks AS (SELECT generate_series AS k FROM generate_series(0, 15)),
        |py AS (SELECT u.vec_id, ks.k, CAST(sum(u.v * sg.s) AS BIGINT) AS y
        |  FROM u CROSS JOIN ks JOIN sg ON sg.idx = (u.j - 1) * 16 + ks.k
        |  GROUP BY u.vec_id, ks.k),
        |p AS (SELECT vec_id, list(y ORDER BY k) AS rp FROM py GROUP BY vec_id),
        |pn AS (SELECT vec_id, rp, CAST(list_sum(list_transform(rp, x -> x * x)) AS BIGINT) AS rpn2 FROM p),
        |q AS (SELECT vec_id AS qid, rp AS qv, rpn2 AS qn FROM pn WHERE vec_id % 50 = 0),
        |c AS (SELECT vec_id AS nid, rp AS nv, rpn2 AS nn FROM pn),
        |scored AS (SELECT qid, nid,
        |    CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * nv[i])) AS BIGINT) AS dp, qn, nn
        |  FROM c CROSS JOIN q WHERE nid <> qid),
        |ranked AS (SELECT qid, nid,
        |    CAST(dp AS DOUBLE) / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(nn AS DOUBLE))) AS cos,
        |    row_number() OVER (PARTITION BY qid ORDER BY
        |      CAST(dp AS DOUBLE) / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(nn AS DOUBLE))) DESC,
        |      nid ASC) AS rank
        |  FROM scored)
        |SELECT qid, CAST(rank AS BIGINT) AS rank, nid, cos FROM ranked WHERE rank <= 3""".stripMargin,
    // llm_rp_recall oracle: brute truth in the ORIGINAL space + the
    // projected ranking at dOut = 16 and 32 + one summary row per dOut
    "llm_rp_recall" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS vq FROM embeddings),
        |en AS (SELECT vec_id, vq, CAST(list_sum(list_transform(vq, x -> x * x)) AS BIGINT) AS norm2 FROM e),
        |bq AS (SELECT vec_id AS qid, vq AS qv, norm2 AS qn FROM en WHERE vec_id % 50 = 0),
        |bscored AS (SELECT qid, en.vec_id AS nid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * en.vq[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(en.norm2 AS DOUBLE))) AS cos
        |  FROM en CROSS JOIN bq WHERE en.vec_id <> qid),
        |truth AS (SELECT qid, nid FROM (SELECT qid, nid,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rank FROM bscored)
        |  WHERE rank <= 3),
        |s0a AS (SELECT generate_series AS idx, (2654435761 * generate_series) % 2147483648 AS h FROM generate_series(0, 1023)),
        |s1a AS (SELECT idx, xor(h, h >> 13) AS h FROM s0a),
        |s2a AS (SELECT idx, (h * 1274126177) % 2147483648 AS h FROM s1a),
        |sg16 AS (SELECT idx, xor(h, h >> 16) % 3 - 1 AS s FROM s2a),
        |u AS (SELECT vec_id, unnest(vq) AS v, generate_subscripts(vq, 1) AS j FROM e),
        |k16 AS (SELECT generate_series AS k FROM generate_series(0, 15)),
        |py16 AS (SELECT u.vec_id, k16.k, CAST(sum(u.v * sg16.s) AS BIGINT) AS y
        |  FROM u CROSS JOIN k16 JOIN sg16 ON sg16.idx = (u.j - 1) * 16 + k16.k
        |  GROUP BY u.vec_id, k16.k),
        |p16 AS (SELECT vec_id, list(y ORDER BY k) AS rp FROM py16 GROUP BY vec_id),
        |pn16 AS (SELECT vec_id, rp, CAST(list_sum(list_transform(rp, x -> x * x)) AS BIGINT) AS rpn2 FROM p16),
        |q16 AS (SELECT vec_id AS qid, rp AS qv, rpn2 AS qn FROM pn16 WHERE vec_id % 50 = 0),
        |s16 AS (SELECT qid, pn16.vec_id AS nid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * pn16.rp[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(pn16.rpn2 AS DOUBLE))) AS cos
        |  FROM pn16 CROSS JOIN q16 WHERE pn16.vec_id <> qid),
        |r16 AS (SELECT qid, nid FROM (SELECT qid, nid,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rank FROM s16)
        |  WHERE rank <= 3),
        |s0b AS (SELECT generate_series AS idx, (2654435761 * generate_series) % 2147483648 AS h FROM generate_series(0, 2047)),
        |s1b AS (SELECT idx, xor(h, h >> 13) AS h FROM s0b),
        |s2b AS (SELECT idx, (h * 1274126177) % 2147483648 AS h FROM s1b),
        |sg32 AS (SELECT idx, xor(h, h >> 16) % 3 - 1 AS s FROM s2b),
        |k32 AS (SELECT generate_series AS k FROM generate_series(0, 31)),
        |py32 AS (SELECT u.vec_id, k32.k, CAST(sum(u.v * sg32.s) AS BIGINT) AS y
        |  FROM u CROSS JOIN k32 JOIN sg32 ON sg32.idx = (u.j - 1) * 32 + k32.k
        |  GROUP BY u.vec_id, k32.k),
        |p32 AS (SELECT vec_id, list(y ORDER BY k) AS rp FROM py32 GROUP BY vec_id),
        |pn32 AS (SELECT vec_id, rp, CAST(list_sum(list_transform(rp, x -> x * x)) AS BIGINT) AS rpn2 FROM p32),
        |q32 AS (SELECT vec_id AS qid, rp AS qv, rpn2 AS qn FROM pn32 WHERE vec_id % 50 = 0),
        |s32 AS (SELECT qid, pn32.vec_id AS nid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * pn32.rp[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(pn32.rpn2 AS DOUBLE))) AS cos
        |  FROM pn32 CROSS JOIN q32 WHERE pn32.vec_id <> qid),
        |r32 AS (SELECT qid, nid FROM (SELECT qid, nid,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rank FROM s32)
        |  WHERE rank <= 3),
        |h16 AS (SELECT count(*) AS n_hits FROM truth JOIN r16 USING (qid, nid)),
        |h32 AS (SELECT count(*) AS n_hits FROM truth JOIN r32 USING (qid, nid)),
        |tot AS (SELECT count(*) AS n_truth FROM truth)
        |SELECT 'rp16' AS path, CAST(h16.n_hits AS BIGINT) AS n_hits, CAST(tot.n_truth AS BIGINT) AS n_truth,
        |  CASE WHEN tot.n_truth = 0 THEN 0.0 ELSE CAST(h16.n_hits AS DOUBLE) / tot.n_truth END AS recall
        |FROM h16 CROSS JOIN tot
        |UNION ALL
        |SELECT 'rp32' AS path, CAST(h32.n_hits AS BIGINT) AS n_hits, CAST(tot.n_truth AS BIGINT) AS n_truth,
        |  CASE WHEN tot.n_truth = 0 THEN 0.0 ELSE CAST(h32.n_hits AS DOUBLE) / tot.n_truth END AS recall
        |FROM h32 CROSS JOIN tot""".stripMargin,
    // llm_gram_matrix oracle: the Gram/covariance replayed RELATIONALLY —
    // an unnest self-join within vec_id grouped on (j, k), structurally
    // independent of the Spark side's single-buffer aggregator, plus the
    // exact-integer centering ncov = N·G − S_j·S_k
    "llm_gram_matrix" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS vq FROM embeddings),
        |u AS (SELECT vec_id, unnest(vq) AS v, generate_subscripts(vq, 1) AS pos FROM e),
        |g AS (SELECT a.pos - 1 AS j, b.pos - 1 AS k, sum(a.v * b.v) AS g
        |      FROM u a JOIN u b ON a.vec_id = b.vec_id AND b.pos >= a.pos
        |      GROUP BY 1, 2),
        |s AS (SELECT pos - 1 AS j, sum(v) AS s FROM u GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM e)
        |SELECT CAST(g.j AS BIGINT) AS j, CAST(g.k AS BIGINT) AS k,
        |  CAST(g.g AS BIGINT) AS g,
        |  CAST(n.n * g.g - sj.s * sk.s AS BIGINT) AS ncov
        |FROM g JOIN s sj ON sj.j = g.j JOIN s sk ON sk.j = g.k CROSS JOIN n""".stripMargin,
    // llm_gram_shifted oracle: integer means with the sign-wrapped
    // truncating division (DuckDB `//` floors, the CASE form truncates
    // toward zero like Scala Long `/`), then the Gram of the SHIFTED
    // values and the centering over the residual sums — ncov must equal
    // llm_gram_matrix's ncov exactly (shift invariance), while g pins the
    // actual two-pass computation, not just the final covariance
    "llm_gram_shifted" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS vq FROM embeddings),
        |u AS (SELECT vec_id, unnest(vq) AS v, generate_subscripts(vq, 1) AS pos FROM e),
        |n AS (SELECT count(*) AS n FROM e),
        |s0 AS (SELECT pos - 1 AS j, sum(v) AS s FROM u GROUP BY 1),
        |m AS (SELECT j, CASE WHEN s < 0 THEN -((-s) // n.n) ELSE s // n.n END AS m
        |      FROM s0 CROSS JOIN n),
        |w AS (SELECT u.vec_id, u.pos, u.v - m.m AS v
        |      FROM u JOIN m ON m.j = u.pos - 1),
        |g AS (SELECT a.pos - 1 AS j, b.pos - 1 AS k, sum(a.v * b.v) AS g
        |      FROM w a JOIN w b ON a.vec_id = b.vec_id AND b.pos >= a.pos
        |      GROUP BY 1, 2),
        |sr AS (SELECT pos - 1 AS j, sum(v) AS s FROM w GROUP BY 1)
        |SELECT CAST(g.j AS BIGINT) AS j, CAST(g.k AS BIGINT) AS k,
        |  CAST(g.g AS BIGINT) AS g,
        |  CAST(n.n * g.g - sj.s * sk.s AS BIGINT) AS ncov
        |FROM g JOIN sr sj ON sj.j = g.j JOIN sr sk ON sk.j = g.k CROSS JOIN n""".stripMargin,
    // llm_gram_incremental oracle: IDENTICAL to llm_gram_matrix by
    // design — the Spark side merges two disjoint-half fits, the oracle
    // computes the whole corpus directly; equal hashes ARE the
    // base+delta ≡ full-refit merge law
    "llm_gram_incremental" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS vq FROM embeddings),
        |u AS (SELECT vec_id, unnest(vq) AS v, generate_subscripts(vq, 1) AS pos FROM e),
        |g AS (SELECT a.pos - 1 AS j, b.pos - 1 AS k, sum(a.v * b.v) AS g
        |      FROM u a JOIN u b ON a.vec_id = b.vec_id AND b.pos >= a.pos
        |      GROUP BY 1, 2),
        |s AS (SELECT pos - 1 AS j, sum(v) AS s FROM u GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM e)
        |SELECT CAST(g.j AS BIGINT) AS j, CAST(g.k AS BIGINT) AS k,
        |  CAST(g.g AS BIGINT) AS g,
        |  CAST(n.n * g.g - sj.s * sk.s AS BIGINT) AS ncov
        |FROM g JOIN s sj ON sj.j = g.j JOIN s sk ON sk.j = g.k CROSS JOIN n""".stripMargin,
    // llm_pca_power oracle: the full 12-sweep integer power iteration
    // unrolled as CTEs — sign-wrapped `//` everywhere a numerator can be
    // negative (DuckDB `//` floors, Spark div truncates; the sign-abs form
    // makes both truncate), covariance mirrored from the upper triangle,
    // |c| rescaled to ≤ 1e6 once and |w| to ≤ 1e5 per sweep
    "llm_pca_power" ->
      (pcaPowerSqlPrefix + """
        |SELECT CAST(pos AS BIGINT) AS pos, CAST(w AS BIGINT) AS w FROM w12""".stripMargin),
    // llm_pca_shifted_power oracle: the same 12-sweep chain over the
    // SHIFTED Gram (means → shifted grid → Gram, no N²-scale centering)
    "llm_pca_shifted_power" ->
      (pcaShiftedPowerSqlPrefix + """
        |SELECT CAST(pos AS BIGINT) AS pos, CAST(w AS BIGINT) AS w FROM w12""".stripMargin),
    // llm_pca_project oracle: the same derived w8 joined back against the
    // unnested %5 sample — one integer dot per vector
    "llm_pca_project" ->
      (pcaPowerSqlPrefix + """
        |SELECT u.vec_id, CAST(sum(u.v * w12.w) AS BIGINT) AS y
        |FROM u JOIN w12 ON w12.pos = u.pos - 1
        |WHERE u.vec_id % 5 = 0 GROUP BY 1""".stripMargin),
    // llm_mmr_rerank oracle: brute top-8 candidates, m²-per-query pairwise
    // sims, then the k = 3 greedy unrolled as three pick CTEs with the
    // (score DESC, nid ASC) tie law at every step
    "llm_mmr_rerank" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS vq FROM embeddings),
        |en AS MATERIALIZED (SELECT vec_id, vq, CAST(list_sum(list_transform(vq, x -> x * x)) AS BIGINT) AS n2 FROM e),
        |q AS (SELECT vec_id AS qid, vq AS qv, n2 AS qn FROM en WHERE vec_id % 50 = 0),
        |scored AS (SELECT qid, en.vec_id AS nid, en.vq AS nv, en.n2 AS nn,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * en.vq[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(en.n2 AS DOUBLE))) AS rel
        |  FROM en CROSS JOIN q WHERE en.vec_id <> qid),
        |cand AS MATERIALIZED (SELECT qid, nid, nv, nn, rel FROM (
        |    SELECT *, row_number() OVER (PARTITION BY qid ORDER BY rel DESC, nid ASC) AS rnk FROM scored)
        |  WHERE rnk <= 8),
        |sims AS MATERIALIZED (SELECT a.qid, a.nid AS a, b.nid AS b,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(a.nv)), i -> a.nv[i] * b.nv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(a.nn AS DOUBLE)) * sqrt(CAST(b.nn AS DOUBLE))) AS sim
        |  FROM cand a JOIN cand b ON a.qid = b.qid AND a.nid <> b.nid),
        |p1 AS MATERIALIZED (SELECT qid, nid, rel AS score FROM (
        |    SELECT qid, nid, rel, row_number() OVER (PARTITION BY qid ORDER BY rel DESC, nid ASC) AS rnk FROM cand)
        |  WHERE rnk = 1),
        |c2 AS (SELECT c.qid, c.nid, c.rel - s.sim AS score
        |  FROM cand c JOIN p1 ON p1.qid = c.qid AND c.nid <> p1.nid
        |  JOIN sims s ON s.qid = c.qid AND s.a = c.nid AND s.b = p1.nid),
        |p2 AS MATERIALIZED (SELECT qid, nid, score FROM (
        |    SELECT qid, nid, score, row_number() OVER (PARTITION BY qid ORDER BY score DESC, nid ASC) AS rnk FROM c2)
        |  WHERE rnk = 1),
        |c3 AS (SELECT c.qid, c.nid, c.rel - greatest(s1.sim, s2.sim) AS score
        |  FROM cand c
        |  JOIN p1 ON p1.qid = c.qid JOIN p2 ON p2.qid = c.qid
        |  JOIN sims s1 ON s1.qid = c.qid AND s1.a = c.nid AND s1.b = p1.nid
        |  JOIN sims s2 ON s2.qid = c.qid AND s2.a = c.nid AND s2.b = p2.nid
        |  WHERE c.nid <> p1.nid AND c.nid <> p2.nid),
        |p3 AS (SELECT qid, nid, score FROM (
        |    SELECT qid, nid, score, row_number() OVER (PARTITION BY qid ORDER BY score DESC, nid ASC) AS rnk FROM c3)
        |  WHERE rnk = 1)
        |SELECT qid, CAST(1 AS BIGINT) AS mmr_rank, nid, score FROM p1
        |UNION ALL SELECT qid, CAST(2 AS BIGINT), nid, score FROM p2
        |UNION ALL SELECT qid, CAST(3 AS BIGINT), nid, score FROM p3""".stripMargin,
    // llm_score_calibrate oracle: the same min-rank / pooled-position law
    // via window functions — rank() IS min-rank under ties, and the
    // pooled value at position p is position-unique regardless of the
    // row_number tiebreak (equal scores share the value)
    "llm_score_calibrate" ->
      """WITH w AS (SELECT doc_id, source, text, string_split(lower(text), ' ') AS ws FROM documents),
        |sc AS (SELECT doc_id, source, CAST(floor((
        |   CASE WHEN length(text) BETWEEN 100 AND 5000 THEN 1.0
        |        WHEN length(text) > 5000 THEN 0.5 ELSE 0.2 END +
        |   CASE WHEN CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(ws)
        |             BETWEEN 3.0 AND 8.0 THEN 1.0 ELSE 0.4 END +
        |   CAST(length(regexp_replace(text, '[^a-zA-Z ]', '', 'g')) AS DOUBLE) / length(text)
        |  ) / 3.0 * 1000000) AS BIGINT) AS score_micro FROM w),
        |r AS (SELECT *, CAST(rank() OVER (PARTITION BY source ORDER BY score_micro) AS BIGINT) AS src_rank,
        |       CAST(count(*) OVER (PARTITION BY source, score_micro) AS BIGINT) AS ce,
        |       count(*) OVER (PARTITION BY source) AS n_s, count(*) OVER () AS n FROM sc),
        |m AS (SELECT *, CAST(((2 * (src_rank - 1) + ce - 1) * n) // (2 * n_s) + 1 AS BIGINT) AS mapped_rank FROM r),
        |pooled AS (SELECT score_micro AS calib_micro, row_number() OVER (ORDER BY score_micro, doc_id) AS pos FROM sc)
        |SELECT doc_id, source, score_micro, src_rank, mapped_rank, calib_micro
        |FROM m JOIN pooled ON pooled.pos = m.mapped_rank WHERE doc_id % 20 = 0""".stripMargin,
    // llm_calibrate_ks oracle: the midrank calibrate chain + per-source
    // and pooled window cums + the cross-multiplied max gap
    "llm_calibrate_ks" ->
      """WITH w AS (SELECT doc_id, source, text, string_split(lower(text), ' ') AS ws FROM documents),
        |sc AS (SELECT doc_id, source, CAST(floor(((CASE WHEN length(text) BETWEEN 100 AND 5000 THEN 1.0
        |        WHEN length(text) > 5000 THEN 0.5 ELSE 0.2 END +
        |   CASE WHEN CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(ws)
        |             BETWEEN 3.0 AND 8.0 THEN 1.0 ELSE 0.4 END +
        |   CAST(length(regexp_replace(text, '[^a-zA-Z ]', '', 'g')) AS DOUBLE) / length(text)
        |  ) / 3.0) * 1000000) AS BIGINT) AS score_micro FROM w),
        |r AS (SELECT *, CAST(rank() OVER (PARTITION BY source ORDER BY score_micro) AS BIGINT) - 1 AS cs,
        |       CAST(count(*) OVER (PARTITION BY source, score_micro) AS BIGINT) AS ce,
        |       count(*) OVER (PARTITION BY source) AS n_s0, count(*) OVER () AS n0 FROM sc),
        |m AS (SELECT *, CAST(((2 * cs + ce - 1) * n0) // (2 * n_s0) + 1 AS BIGINT) AS mapped_rank FROM r),
        |pooled AS (SELECT score_micro AS calib_micro, row_number() OVER (ORDER BY score_micro, doc_id) AS pos FROM sc),
        |cal AS (SELECT m.source, pooled.calib_micro AS v FROM m JOIN pooled ON pooled.pos = m.mapped_rank),
        |h AS (SELECT source, v, CAST(count(*) AS BIGINT) AS c FROM cal GROUP BY 1, 2),
        |cums AS (SELECT source, v, CAST(sum(c) OVER (PARTITION BY source ORDER BY v) AS BIGINT) AS cum FROM h),
        |g AS (SELECT v, CAST(sum(c) AS BIGINT) AS gc FROM h GROUP BY 1),
        |gcum AS (SELECT v, CAST(sum(gc) OVER (ORDER BY v) AS BIGINT) AS gcum FROM g),
        |ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_s FROM h GROUP BY 1),
        |n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM h),
        |ks AS (SELECT cums.source, ns.n_s, n.n,
        |    CAST(max(abs(cum * n.n - gcum.gcum * ns.n_s)) AS BIGINT) AS ks_scaled
        |  FROM cums JOIN gcum ON gcum.v = cums.v JOIN ns ON ns.source = cums.source CROSS JOIN n
        |  GROUP BY 1, 2, 3)
        |SELECT source, n_s, ks_scaled, CAST(ks_scaled * 1000000 // (n_s * n) AS BIGINT) AS ks_micro
        |FROM ks""".stripMargin,
    // llm_cluster_split oracle: the llm_dedup_clusters recursive-CC chain,
    // then the cluster-root hash split (%100 < 80) and the cross-split
    // near-dup pair audit (0 by construction — clusters move whole)
    "llm_cluster_split" ->
      """WITH RECURSIVE w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
        |sh AS (SELECT doc_id, CASE WHEN len(ws) < 3 THEN CAST([] AS VARCHAR[])
        |  ELSE list_distinct(list_transform(generate_series(1, len(ws)-2),
        |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) END AS shingles FROM w),
        |hs AS (SELECT doc_id, shingles,
        |  list_transform(shingles, s -> CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)) AS shash
        |  FROM sh WHERE len(shingles) > 0),
        |sig AS (SELECT doc_id, shingles, list_transform(generate_series(0, 31), i ->
        |  list_min(list_transform(shash, h ->
        |    ((CAST(('0x' || substr(md5('a' || CAST(i AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000006 + 1)
        |      * (h % 1000000007)
        |     + CAST(('0x' || substr(md5('b' || CAST(i AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000007) % 1000000007))) AS sig
        |  FROM hs),
        |bands AS (SELECT doc_id, shingles, b AS band_id,
        |  md5(array_to_string(sig[b*4+1 : b*4+4], ',')) AS band_key
        |  FROM sig, (SELECT unnest(generate_series(0, 7)) AS b)),
        |cand AS (SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
        |    CAST(len(list_intersect(a.shingles, c.shingles)) AS DOUBLE)
        |      / len(list_distinct(list_concat(a.shingles, c.shingles))) AS jaccard
        |  FROM bands a JOIN bands c
        |    ON a.band_id = c.band_id AND a.band_key = c.band_key AND a.doc_id < c.doc_id),
        |pairs AS (SELECT id_a, id_b FROM cand WHERE jaccard >= 0.5),
        |edges AS (SELECT id_a AS u, id_b AS v FROM pairs UNION SELECT id_b, id_a FROM pairs),
        |reach(id, r) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT e.u, reach.r FROM edges e JOIN reach ON reach.id = e.v),
        |comp AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id),
        |asg AS (SELECT doc_id, cluster_id,
        |  CASE WHEN CAST(('0x' || substr(md5(CAST(cluster_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 80
        |       THEN 'train' ELSE 'test' END AS split
        |  FROM comp),
        |cross_pairs AS (SELECT CAST(count(*) AS BIGINT) AS n_cross FROM pairs
        |  JOIN asg a ON a.doc_id = pairs.id_a JOIN asg b ON b.doc_id = pairs.id_b
        |  WHERE a.split <> b.split)
        |SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(DISTINCT cluster_id) AS BIGINT) AS n_clusters,
        |  (SELECT n_cross FROM cross_pairs) AS n_cross_pairs
        |FROM asg GROUP BY 1""".stripMargin,
    // llm_best_of_cluster oracle: the recursive-CC chain + the quality
    // score + the per-cluster (score DESC, id ASC) election at rank 1,
    // multi-member clusters only
    "llm_best_of_cluster" ->
      """WITH RECURSIVE w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
        |sc0 AS (SELECT w.doc_id, CAST(floor((
        |   CASE WHEN length(text) BETWEEN 100 AND 5000 THEN 1.0
        |        WHEN length(text) > 5000 THEN 0.5 ELSE 0.2 END +
        |   CASE WHEN CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(ws)
        |             BETWEEN 3.0 AND 8.0 THEN 1.0 ELSE 0.4 END +
        |   CAST(length(regexp_replace(text, '[^a-zA-Z ]', '', 'g')) AS DOUBLE) / length(text)
        |  ) / 3.0 * 1000000) AS BIGINT) AS score_micro
        |  FROM w JOIN documents d ON d.doc_id = w.doc_id),
        |sh AS (SELECT doc_id, CASE WHEN len(ws) < 3 THEN CAST([] AS VARCHAR[])
        |  ELSE list_distinct(list_transform(generate_series(1, len(ws)-2),
        |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) END AS shingles FROM w),
        |hs AS (SELECT doc_id, shingles,
        |  list_transform(shingles, s -> CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)) AS shash
        |  FROM sh WHERE len(shingles) > 0),
        |sig AS (SELECT doc_id, shingles, list_transform(generate_series(0, 31), i ->
        |  list_min(list_transform(shash, h ->
        |    ((CAST(('0x' || substr(md5('a' || CAST(i AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000006 + 1)
        |      * (h % 1000000007)
        |     + CAST(('0x' || substr(md5('b' || CAST(i AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000007) % 1000000007))) AS sig
        |  FROM hs),
        |bands AS (SELECT doc_id, shingles, b AS band_id,
        |  md5(array_to_string(sig[b*4+1 : b*4+4], ',')) AS band_key
        |  FROM sig, (SELECT unnest(generate_series(0, 7)) AS b)),
        |cand AS (SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
        |    CAST(len(list_intersect(a.shingles, c.shingles)) AS DOUBLE)
        |      / len(list_distinct(list_concat(a.shingles, c.shingles))) AS jaccard
        |  FROM bands a JOIN bands c
        |    ON a.band_id = c.band_id AND a.band_key = c.band_key AND a.doc_id < c.doc_id),
        |pairs AS (SELECT id_a, id_b FROM cand WHERE jaccard >= 0.5),
        |edges AS (SELECT id_a AS u, id_b AS v FROM pairs UNION SELECT id_b, id_a FROM pairs),
        |reach(id, r) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT e.u, reach.r FROM edges e JOIN reach ON reach.id = e.v),
        |comp AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id),
        |sized AS (SELECT doc_id, cluster_id,
        |    count(*) OVER (PARTITION BY cluster_id) AS cluster_size FROM comp),
        |ranked AS (SELECT s.cluster_id, s.cluster_size, s.doc_id, sc0.score_micro,
        |    row_number() OVER (PARTITION BY s.cluster_id
        |      ORDER BY sc0.score_micro DESC, s.doc_id ASC) AS rnk
        |  FROM sized s JOIN sc0 ON sc0.doc_id = s.doc_id
        |  WHERE s.cluster_size >= 2)
        |SELECT cluster_id, CAST(cluster_size AS BIGINT) AS cluster_size,
        |  doc_id AS rep_id, score_micro AS rep_score,
        |  CAST(cluster_size - 1 AS BIGINT) AS n_dropped
        |FROM ranked WHERE rnk = 1""".stripMargin,
    // llm_label_centroids oracle: per-label integer sum-vectors via
    // unnest + (label, pos) group, pair cosine over exact integer dots —
    // sums, not means: cosine is scale-invariant, zero division
    "llm_label_centroids" ->
      """WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS vq FROM embeddings),
        |u AS (SELECT label, unnest(vq) AS v, generate_subscripts(vq, 1) AS pos FROM e),
        |s AS (SELECT label, pos, CAST(sum(v) AS BIGINT) AS s FROM u GROUP BY 1, 2),
        |c AS (SELECT label, list(s ORDER BY pos) AS sv FROM s GROUP BY 1),
        |n AS (SELECT label, CAST(count(*) AS BIGINT) AS n FROM e GROUP BY 1),
        |cn AS (SELECT c.label, sv, n,
        |    CAST(list_sum(list_transform(sv, x -> x * x)) AS BIGINT) AS sn
        |  FROM c JOIN n ON n.label = c.label)
        |SELECT CAST(a.label AS BIGINT) AS label_a, CAST(b.label AS BIGINT) AS label_b,
        |  a.n AS n_a, b.n AS n_b,
        |  CAST(CAST(list_sum(list_transform(generate_series(1, len(a.sv)), i -> a.sv[i] * b.sv[i])) AS BIGINT) AS DOUBLE)
        |    / (sqrt(CAST(a.sn AS DOUBLE)) * sqrt(CAST(b.sn AS DOUBLE))) AS cos
        |FROM cn a JOIN cn b ON a.label < b.label""".stripMargin,
    // llm_image_phash oracle: the aHash replayed from the synthetic
    // pattern formula alone — NN indices, integer mean threshold
    // (64·g ≥ Σ, ties up), two-word packing (no shift past bit 31),
    // xor+popcount hamming; the decoded rasters never leave Spark
    "llm_image_phash" ->
      """WITH imgs AS (
        |  SELECT CAST(i AS BIGINT) AS id, CAST(i AS BIGINT) AS seed, 16 + i*3 AS w, 16 + i*2 AS h FROM generate_series(1, 4) t(i)
        |  UNION ALL SELECT 103, 3, 26, 22),
        |cells AS (SELECT id, cy*8 + cx AS k,
        |    ((cx*w)//8*(7 + seed*5)) % 256 + ((cy*h)//8*(11 + seed*3)) % 256
        |      + (((cx*w)//8 + (cy*h)//8) * (1 + seed)) % 256 AS g
        |  FROM imgs, generate_series(0, 7) gx(cx), generate_series(0, 7) gy(cy)),
        |sums AS (SELECT id, CAST(sum(g) AS BIGINT) AS s FROM cells GROUP BY 1),
        |bits AS (SELECT cells.id, k, CASE WHEN g*64 >= s THEN 1 ELSE 0 END AS bit
        |  FROM cells JOIN sums ON sums.id = cells.id),
        |hashes AS (SELECT id,
        |    CAST(sum(CASE WHEN k >= 32 THEN bit * (CAST(1 AS BIGINT) << (k - 32)) ELSE 0 END) AS BIGINT) AS hi,
        |    CAST(sum(CASE WHEN k < 32 THEN bit * (CAST(1 AS BIGINT) << k) ELSE 0 END) AS BIGINT) AS lo
        |  FROM bits GROUP BY 1)
        |SELECT a.id AS id_a, b.id AS id_b,
        |  CAST(bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) AS BIGINT) AS hamming,
        |  bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 8 AS near
        |FROM hashes a JOIN hashes b ON a.id < b.id""".stripMargin,
    // llm_image_phash_scale oracle: the same formula-replayed hashes for
    // every document row, brute all-pairs at radius ≤ 3 (= what the
    // lossless block join must equal), folded to the hamming histogram
    "llm_image_phash_scale" ->
      """WITH imgs AS (SELECT doc_id AS id, doc_id % 256 AS seed,
        |    16 + (doc_id // 256) % 5 AS w, 16 + (doc_id // 256) % 3 AS h FROM documents),
        |cells AS (SELECT id, cy*8 + cx AS k,
        |    ((cx*w)//8*(7 + seed*5)) % 256 + ((cy*h)//8*(11 + seed*3)) % 256
        |      + (((cx*w)//8 + (cy*h)//8) * (1 + seed)) % 256 AS g
        |  FROM imgs, generate_series(0, 7) gx(cx), generate_series(0, 7) gy(cy)),
        |sums AS (SELECT id, CAST(sum(g) AS BIGINT) AS s FROM cells GROUP BY 1),
        |bits AS (SELECT cells.id, k, CASE WHEN g*64 >= s THEN 1 ELSE 0 END AS bit
        |  FROM cells JOIN sums ON sums.id = cells.id),
        |hashes AS (SELECT id,
        |    CAST(sum(CASE WHEN k >= 32 THEN bit * (CAST(1 AS BIGINT) << (k - 32)) ELSE 0 END) AS BIGINT) AS hi,
        |    CAST(sum(CASE WHEN k < 32 THEN bit * (CAST(1 AS BIGINT) << k) ELSE 0 END) AS BIGINT) AS lo
        |  FROM bits GROUP BY 1),
        |pairs AS (SELECT a.id AS id_a, b.id AS id_b,
        |    bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) AS hamming
        |  FROM hashes a JOIN hashes b ON a.id < b.id)
        |SELECT CAST(hamming AS BIGINT) AS hamming, CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(sum(id_a + id_b) AS BIGINT) AS id_checksum
        |FROM pairs WHERE hamming <= 3 GROUP BY 1""".stripMargin,
    // llm_token_fertility oracle: the same two token censuses grouped by
    // declared lang, ratios as exact integer micros
    "llm_token_fertility" ->
      """WITH w AS (SELECT lang, n_chars,
        |  CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_ws,
        |  CAST(len(regexp_extract_all(text, '[a-z0-9]+|[^a-z0-9\s]')) AS BIGINT) AS n_bp
        |FROM documents)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(sum(n_ws) AS BIGINT) AS sum_ws_tokens,
        |  CAST(sum(n_bp) AS BIGINT) AS sum_bpeish_tokens,
        |  CAST(sum(n_chars) * 1000000 // sum(n_ws) AS BIGINT) AS chars_per_ws_micro,
        |  CAST(sum(n_chars) * 1000000 // sum(n_bp) AS BIGINT) AS chars_per_bpeish_micro
        |FROM w GROUP BY 1""".stripMargin,
    // llm_lang_confusion oracle: the langid stopword census + declared
    // lang, grouped to the confusion matrix with basis-point shares
    "llm_lang_confusion" ->
      """WITH w AS (SELECT doc_id, lang, string_split(lower(text), ' ') AS ws FROM documents),
        |h AS (SELECT doc_id, lang,
        |  CAST(len(list_filter(ws, w -> list_contains(['the','a','of','and','to','in','is','it','for','on'], w))) AS BIGINT) AS en_hits,
        |  CAST(len(list_filter(ws, w -> list_contains(['le','la','et','les','des','un','une','du','est','dans'], w))) AS BIGINT) AS fr_hits,
        |  CAST(len(list_filter(ws, w -> list_contains(['der','die','und','das','ist','nicht','ein','mit','den','von'], w))) AS BIGINT) AS de_hits
        |FROM w),
        |p AS (SELECT doc_id, lang,
        |  CASE WHEN en_hits >= fr_hits AND en_hits >= de_hits AND en_hits > 0 THEN 'en'
        |       WHEN fr_hits >= de_hits AND fr_hits > 0 THEN 'fr'
        |       WHEN de_hits > 0 THEN 'de' ELSE 'unknown' END AS pred_lang
        |FROM h),
        |conf AS (SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS n FROM p GROUP BY 1, 2),
        |tot AS (SELECT lang, CAST(count(*) AS BIGINT) AS t FROM p GROUP BY 1)
        |SELECT conf.lang, pred_lang, n, CAST(n * 10000 // t AS BIGINT) AS pct_bp
        |FROM conf JOIN tot ON tot.lang = conf.lang""".stripMargin,
    // llm_mmr_ivf oracle: the 2-iteration k-means cell chain feeding
    // cell-pruned top-8 candidates, then the k = 3 greedy unrolled
    // with the (score DESC, nid ASC) tie law per pick
    "llm_mmr_ivf" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS vq FROM embeddings),
        |en AS (SELECT vec_id, vq, CAST(list_sum(list_transform(vq, x -> x * x)) AS BIGINT) AS norm2 FROM e),
        |cent0 AS (SELECT vec_id AS cid, vq AS cv, norm2 AS cn FROM en WHERE vec_id % 25 = 0),
        |a1 AS (SELECT en.vec_id, cent0.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en CROSS JOIN cent0),
        |r1 AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM a1),
        |asg1 AS (SELECT vec_id AS nid, cid AS cell FROM r1 WHERE rn = 1),
        |u1 AS (SELECT asg1.cell, unnest(vq) AS v, generate_subscripts(vq, 1) AS d FROM en JOIN asg1 ON en.vec_id = asg1.nid),
        |m1 AS (SELECT cell, d, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS vc FROM u1 GROUP BY cell, d),
        |cent1 AS (SELECT cell AS cid, list(vc ORDER BY d) AS cv FROM m1 GROUP BY cell),
        |cent1n AS (SELECT cid, cv, CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn FROM cent1),
        |a2 AS (SELECT en.vec_id, cent1n.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en CROSS JOIN cent1n),
        |r2 AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM a2),
        |asg2 AS (SELECT vec_id AS nid, cid AS cell FROM r2 WHERE rn = 1),
        |u2 AS (SELECT asg2.cell, unnest(vq) AS v, generate_subscripts(vq, 1) AS d FROM en JOIN asg2 ON en.vec_id = asg2.nid),
        |m2 AS (SELECT cell, d, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS vc FROM u2 GROUP BY cell, d),
        |cent2 AS (SELECT cell AS cid, list(vc ORDER BY d) AS cv FROM m2 GROUP BY cell),
        |cent AS (SELECT cid, cv, CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn FROM cent2),
        |ascore AS (
        |  SELECT en.vec_id, cent.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en CROSS JOIN cent),
        |ranked_assign AS (
        |  SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn
        |  FROM ascore),
        |cells AS (SELECT vec_id AS nid, cid AS cell FROM ranked_assign WHERE rn = 1),
        |probes AS (SELECT vec_id AS qid, cid AS cell FROM ranked_assign WHERE rn <= 2 AND vec_id % 50 = 0),
        |c AS (SELECT en.vec_id AS nid, vq AS nv, norm2 AS nn, cell FROM en JOIN cells ON en.vec_id = cells.nid),
        |q0 AS (SELECT en.vec_id AS qid, vq AS qv, norm2 AS qn, probes.cell FROM en JOIN probes ON en.vec_id = probes.qid),
        |iscored AS (SELECT qid, nid, nv, nn,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * nv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(nn AS DOUBLE))) AS rel
        |  FROM c JOIN q0 USING (cell) WHERE nid <> qid),
        |cand AS MATERIALIZED (SELECT qid, nid, nv, nn, rel FROM (
        |    SELECT *, row_number() OVER (PARTITION BY qid ORDER BY rel DESC, nid ASC) AS rnk FROM iscored)
        |  WHERE rnk <= 8),
        |sims AS MATERIALIZED (SELECT a.qid, a.nid AS a, b.nid AS b,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(a.nv)), i -> a.nv[i] * b.nv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(a.nn AS DOUBLE)) * sqrt(CAST(b.nn AS DOUBLE))) AS sim
        |  FROM cand a JOIN cand b ON a.qid = b.qid AND a.nid <> b.nid),
        |p1 AS MATERIALIZED (SELECT qid, nid, rel AS score FROM (
        |    SELECT qid, nid, rel, row_number() OVER (PARTITION BY qid ORDER BY rel DESC, nid ASC) AS rnk FROM cand)
        |  WHERE rnk = 1),
        |c2 AS (SELECT cnd.qid, cnd.nid, cnd.rel - s.sim AS score
        |  FROM cand cnd JOIN p1 ON p1.qid = cnd.qid AND cnd.nid <> p1.nid
        |  JOIN sims s ON s.qid = cnd.qid AND s.a = cnd.nid AND s.b = p1.nid),
        |p2 AS MATERIALIZED (SELECT qid, nid, score FROM (
        |    SELECT qid, nid, score, row_number() OVER (PARTITION BY qid ORDER BY score DESC, nid ASC) AS rnk FROM c2)
        |  WHERE rnk = 1),
        |c3 AS (SELECT cnd.qid, cnd.nid, cnd.rel - greatest(s1.sim, s2.sim) AS score
        |  FROM cand cnd
        |  JOIN p1 ON p1.qid = cnd.qid JOIN p2 ON p2.qid = cnd.qid
        |  JOIN sims s1 ON s1.qid = cnd.qid AND s1.a = cnd.nid AND s1.b = p1.nid
        |  JOIN sims s2 ON s2.qid = cnd.qid AND s2.a = cnd.nid AND s2.b = p2.nid
        |  WHERE cnd.nid <> p1.nid AND cnd.nid <> p2.nid),
        |p3 AS (SELECT qid, nid, score FROM (
        |    SELECT qid, nid, score, row_number() OVER (PARTITION BY qid ORDER BY score DESC, nid ASC) AS rnk FROM c3)
        |  WHERE rnk = 1)
        |SELECT qid, CAST(1 AS BIGINT) AS mmr_rank, nid, score FROM p1
        |UNION ALL SELECT qid, CAST(2 AS BIGINT), nid, score FROM p2
        |UNION ALL SELECT qid, CAST(3 AS BIGINT), nid, score FROM p3""".stripMargin,
    // llm_retrieval_eval oracle: the brute ranking law + label joins +
    // all-integer MRR (1e6 // first relevant rank, 0-when-none)
    "llm_retrieval_eval" ->
      """WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS vq FROM embeddings),
        |en AS (SELECT vec_id, label, vq, CAST(list_sum(list_transform(vq, x -> x * x)) AS BIGINT) AS n2 FROM e),
        |q AS (SELECT vec_id AS qid, vq AS qv, n2 AS qn, label AS qlabel FROM en WHERE vec_id % 50 = 0),
        |scored AS (SELECT qid, qlabel, en.vec_id AS nid, en.label AS nlabel,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * en.vq[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(en.n2 AS DOUBLE))) AS cos
        |  FROM en CROSS JOIN q WHERE en.vec_id <> qid),
        |ranked AS (SELECT qid, qlabel, nid, nlabel,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rank FROM scored)
        |SELECT qid,
        |  CAST(sum(CASE WHEN nlabel = qlabel THEN 1 ELSE 0 END) AS BIGINT) AS n_rel_at_3,
        |  CAST(coalesce(min(CASE WHEN nlabel = qlabel THEN rank END), 0) AS BIGINT) AS first_rel_rank,
        |  CAST(coalesce(1000000 // min(CASE WHEN nlabel = qlabel THEN rank END), 0) AS BIGINT) AS rr_micro
        |FROM ranked WHERE rank <= 3 GROUP BY 1""".stripMargin,
    // llm_mad_outliers oracle: the same histogram-median law — lower
    // median = min v with cum >= (n+1)//2, deviation histogram derived
    // from the value histogram, k = 2 fence
    "llm_mad_outliers" ->
      """WITH h AS (SELECT n_chars AS v, count(*) AS c FROM documents GROUP BY 1),
        |n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM h),
        |cum AS (SELECT v, CAST(sum(c) OVER (ORDER BY v) AS BIGINT) AS cum FROM h),
        |med AS (SELECT min(v) AS med FROM cum CROSS JOIN n WHERE cum >= (n + 1) // 2),
        |dh AS (SELECT abs(h.v - med.med) AS dv, CAST(sum(c) AS BIGINT) AS c FROM h CROSS JOIN med GROUP BY 1),
        |dcum AS (SELECT dv, CAST(sum(c) OVER (ORDER BY dv) AS BIGINT) AS cum FROM dh),
        |mad AS (SELECT min(dv) AS mad FROM dcum CROSS JOIN n WHERE cum >= (n + 1) // 2),
        |outl AS (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS n_outliers FROM dh CROSS JOIN mad WHERE dv > 2 * mad)
        |SELECT n.n AS n_rows, med.med AS median, mad.mad AS mad, outl.n_outliers
        |FROM n CROSS JOIN med CROSS JOIN mad CROSS JOIN outl""".stripMargin,
    // llm_mad_by_source oracle: the keyed histogram-median law — per-key
    // lower medians via partitioned window cumsum, k = 2 fence
    "llm_mad_by_source" ->
      """WITH h AS (SELECT source, n_chars AS v, count(*) AS c FROM documents GROUP BY 1, 2),
        |n AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM h GROUP BY 1),
        |cum AS (SELECT source, v, CAST(sum(c) OVER (PARTITION BY source ORDER BY v) AS BIGINT) AS cum FROM h),
        |med AS (SELECT cum.source, min(v) AS med FROM cum JOIN n ON n.source = cum.source
        |  WHERE cum >= (n + 1) // 2 GROUP BY 1),
        |dh AS (SELECT h.source, abs(h.v - med.med) AS dv, CAST(sum(c) AS BIGINT) AS c
        |  FROM h JOIN med ON med.source = h.source GROUP BY 1, 2),
        |dcum AS (SELECT source, dv, CAST(sum(c) OVER (PARTITION BY source ORDER BY dv) AS BIGINT) AS cum FROM dh),
        |mad AS (SELECT dcum.source, min(dv) AS mad FROM dcum JOIN n ON n.source = dcum.source
        |  WHERE cum >= (n + 1) // 2 GROUP BY 1),
        |outl AS (SELECT dh.source, CAST(sum(c) AS BIGINT) AS n_outliers
        |  FROM dh JOIN mad ON mad.source = dh.source WHERE dv > 2 * mad GROUP BY 1)
        |SELECT n.source, n.n AS n_rows, med.med AS median, mad.mad AS mad,
        |  coalesce(outl.n_outliers, CAST(0 AS BIGINT)) AS n_outliers
        |FROM n JOIN med ON med.source = n.source JOIN mad ON mad.source = n.source
        |LEFT JOIN outl ON outl.source = n.source""".stripMargin,
    // llm_kanon_audit oracle: the four-rung census joined back per record,
    // CASE cascade to the first rung reaching k = 5, histogram
    "llm_kanon_audit" ->
      """WITH d AS (SELECT doc_id, lang, source, n_chars // 100 AS bin100, n_chars // 1000 AS bin1000 FROM documents),
        |l0 AS (SELECT lang, source, bin100, count(*) AS c FROM d GROUP BY 1, 2, 3),
        |l1 AS (SELECT lang, source, bin1000, count(*) AS c FROM d GROUP BY 1, 2, 3),
        |l2 AS (SELECT lang, bin1000, count(*) AS c FROM d GROUP BY 1, 2),
        |l3 AS (SELECT lang, count(*) AS c FROM d GROUP BY 1),
        |lv AS (SELECT d.doc_id,
        |    CASE WHEN l0.c >= 5 THEN 0 WHEN l1.c >= 5 THEN 1 WHEN l2.c >= 5 THEN 2
        |         WHEN l3.c >= 5 THEN 3 ELSE 4 END AS anon_level
        |  FROM d
        |  JOIN l0 ON l0.lang = d.lang AND l0.source = d.source AND l0.bin100 = d.bin100
        |  JOIN l1 ON l1.lang = d.lang AND l1.source = d.source AND l1.bin1000 = d.bin1000
        |  JOIN l2 ON l2.lang = d.lang AND l2.bin1000 = d.bin1000
        |  JOIN l3 ON l3.lang = d.lang)
        |SELECT CAST(anon_level AS BIGINT) AS anon_level, CAST(count(*) AS BIGINT) AS n_docs
        |FROM lv GROUP BY 1""".stripMargin,
    // llm_ann_filtered oracle: identical brute ranking, corpus
    // pre-restricted by the metadata predicate
    "llm_ann_filtered" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS vq FROM embeddings),
        |en AS (SELECT vec_id, vq, CAST(list_sum(list_transform(vq, x -> x * x)) AS BIGINT) AS norm2 FROM e),
        |allowed AS (SELECT doc_id FROM documents WHERE source IN ('src0', 'src1', 'src2', 'src3')),
        |q AS (SELECT vec_id AS qid, vq AS qv, norm2 AS qn FROM en WHERE vec_id % 50 = 0),
        |c AS (SELECT vec_id AS nid, vq AS nv, norm2 AS nn FROM en JOIN allowed ON en.vec_id = allowed.doc_id),
        |scored AS (SELECT qid, nid,
        |    CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * nv[i])) AS BIGINT) AS dp,
        |    qn, nn
        |  FROM c CROSS JOIN q WHERE nid <> qid),
        |ranked AS (SELECT qid, nid,
        |    CAST(dp AS DOUBLE) / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(nn AS DOUBLE))) AS cos,
        |    row_number() OVER (PARTITION BY qid ORDER BY
        |      CAST(dp AS DOUBLE) / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(nn AS DOUBLE))) DESC,
        |      nid ASC) AS rank
        |  FROM scored)
        |SELECT qid, CAST(rank AS BIGINT) AS rank, nid, cos FROM ranked WHERE rank <= 3""".stripMargin,
    "llm_ann_lsh" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS vq FROM embeddings),
        |en AS (SELECT vec_id, vq, CAST(list_sum(list_transform(vq, x -> x * x)) AS BIGINT) AS norm2 FROM e),
        |eb AS (SELECT vec_id, vq, norm2,
        |  CAST(CASE WHEN vq[1] >= vq[33] THEN 1 ELSE 0 END
        |     + CASE WHEN vq[2] >= vq[34] THEN 2 ELSE 0 END
        |     + CASE WHEN vq[3] >= vq[35] THEN 4 ELSE 0 END
        |     + CASE WHEN vq[4] >= vq[36] THEN 8 ELSE 0 END
        |     + CASE WHEN vq[5] >= vq[37] THEN 16 ELSE 0 END
        |     + CASE WHEN vq[6] >= vq[38] THEN 32 ELSE 0 END AS BIGINT) AS bucket FROM en),
        |q AS (SELECT vec_id AS qid, vq AS qv, norm2 AS qn, bucket FROM eb WHERE vec_id % 50 = 0),
        |c AS (SELECT vec_id AS nid, vq AS nv, norm2 AS nn, bucket FROM eb),
        |scored AS (SELECT qid, c.bucket, nid,
        |    CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * nv[i])) AS BIGINT) AS dp,
        |    qn, nn
        |  FROM c JOIN q USING (bucket) WHERE nid <> qid),
        |ranked AS (SELECT qid, bucket, nid,
        |    CAST(dp AS DOUBLE) / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(nn AS DOUBLE))) AS cos,
        |    row_number() OVER (PARTITION BY qid ORDER BY
        |      CAST(dp AS DOUBLE) / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(nn AS DOUBLE))) DESC,
        |      nid ASC) AS rank
        |  FROM scored)
        |SELECT qid, bucket, CAST(rank AS BIGINT) AS rank, nid, cos FROM ranked WHERE rank <= 3""".stripMargin,
    // trained-IVF oracle: re-derives the 2-iteration deterministic k-means
    // (seed = vec_id%25, integer floor-mean centroid updates) before the
    // assign/probe/re-rank — training itself is oracle-checked
    "llm_ann_ivf" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS vq FROM embeddings),
        |en AS (SELECT vec_id, vq, CAST(list_sum(list_transform(vq, x -> x * x)) AS BIGINT) AS norm2 FROM e),
        |cent0 AS (SELECT vec_id AS cid, vq AS cv, norm2 AS cn FROM en WHERE vec_id % 25 = 0),
        |a1 AS (SELECT en.vec_id, cent0.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en CROSS JOIN cent0),
        |r1 AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM a1),
        |asg1 AS (SELECT vec_id AS nid, cid AS cell FROM r1 WHERE rn = 1),
        |u1 AS (SELECT asg1.cell, unnest(vq) AS v, generate_subscripts(vq, 1) AS d FROM en JOIN asg1 ON en.vec_id = asg1.nid),
        |m1 AS (SELECT cell, d, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS vc FROM u1 GROUP BY cell, d),
        |cent1 AS (SELECT cell AS cid, list(vc ORDER BY d) AS cv FROM m1 GROUP BY cell),
        |cent1n AS (SELECT cid, cv, CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn FROM cent1),
        |a2 AS (SELECT en.vec_id, cent1n.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en CROSS JOIN cent1n),
        |r2 AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM a2),
        |asg2 AS (SELECT vec_id AS nid, cid AS cell FROM r2 WHERE rn = 1),
        |u2 AS (SELECT asg2.cell, unnest(vq) AS v, generate_subscripts(vq, 1) AS d FROM en JOIN asg2 ON en.vec_id = asg2.nid),
        |m2 AS (SELECT cell, d, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS vc FROM u2 GROUP BY cell, d),
        |cent2 AS (SELECT cell AS cid, list(vc ORDER BY d) AS cv FROM m2 GROUP BY cell),
        |cent AS (SELECT cid, cv, CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn FROM cent2),
        |ascore AS (
        |  SELECT en.vec_id, cent.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en CROSS JOIN cent),
        |ranked_assign AS (
        |  SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn
        |  FROM ascore),
        |cells AS (SELECT vec_id AS nid, cid AS cell FROM ranked_assign WHERE rn = 1),
        |probes AS (SELECT vec_id AS qid, cid AS cell FROM ranked_assign WHERE rn <= 2 AND vec_id % 50 = 0),
        |c AS (SELECT en.vec_id AS nid, vq AS nv, norm2 AS nn, cell FROM en JOIN cells ON en.vec_id = cells.nid),
        |q AS (SELECT en.vec_id AS qid, vq AS qv, norm2 AS qn, probes.cell FROM en JOIN probes ON en.vec_id = probes.qid),
        |scored AS (
        |  SELECT qid, nid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * nv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(nn AS DOUBLE))) AS cos
        |  FROM c JOIN q USING (cell) WHERE nid <> qid),
        |ranked AS (
        |  SELECT qid, nid, cos, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rank
        |  FROM scored)
        |SELECT qid, CAST(rank AS BIGINT) AS rank, nid, cos FROM ranked WHERE rank <= 3""".stripMargin,
    // llm_ivf_sq_search oracle: the full 2-iteration k-means cell
    // chain (identical to llm_ann_ivf) + the SQ8 encode/reconstruct
    // chain (identical to llm_sq_search), composed: probed cells
    // restrict, reconstructions rank
    "llm_ivf_sq_search" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS vq FROM embeddings),
        |en AS (SELECT vec_id, vq, CAST(list_sum(list_transform(vq, x -> x * x)) AS BIGINT) AS norm2 FROM e),
        |cent0 AS (SELECT vec_id AS cid, vq AS cv, norm2 AS cn FROM en WHERE vec_id % 25 = 0),
        |a1 AS (SELECT en.vec_id, cent0.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en CROSS JOIN cent0),
        |r1 AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM a1),
        |asg1 AS (SELECT vec_id AS nid, cid AS cell FROM r1 WHERE rn = 1),
        |u1 AS (SELECT asg1.cell, unnest(vq) AS v, generate_subscripts(vq, 1) AS d FROM en JOIN asg1 ON en.vec_id = asg1.nid),
        |m1 AS (SELECT cell, d, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS vc FROM u1 GROUP BY cell, d),
        |cent1 AS (SELECT cell AS cid, list(vc ORDER BY d) AS cv FROM m1 GROUP BY cell),
        |cent1n AS (SELECT cid, cv, CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn FROM cent1),
        |a2 AS (SELECT en.vec_id, cent1n.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en CROSS JOIN cent1n),
        |r2 AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM a2),
        |asg2 AS (SELECT vec_id AS nid, cid AS cell FROM r2 WHERE rn = 1),
        |u2 AS (SELECT asg2.cell, unnest(vq) AS v, generate_subscripts(vq, 1) AS d FROM en JOIN asg2 ON en.vec_id = asg2.nid),
        |m2 AS (SELECT cell, d, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS vc FROM u2 GROUP BY cell, d),
        |cent2 AS (SELECT cell AS cid, list(vc ORDER BY d) AS cv FROM m2 GROUP BY cell),
        |cent AS (SELECT cid, cv, CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn FROM cent2),
        |ascore AS (
        |  SELECT en.vec_id, cent.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en CROSS JOIN cent),
        |ranked_assign AS (
        |  SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn
        |  FROM ascore),
        |cells AS (SELECT vec_id AS nid, cid AS cell FROM ranked_assign WHERE rn = 1),
        |probes AS (SELECT vec_id AS qid, cid AS cell FROM ranked_assign WHERE rn <= 2 AND vec_id % 50 = 0),
        |u AS (SELECT vec_id, unnest(vq) AS v, generate_subscripts(vq, 1) AS pos FROM e),
        |b AS (SELECT pos, min(v) AS mn, max(v) AS mx FROM u GROUP BY pos),
        |enc AS (SELECT u.vec_id, list(CASE WHEN b.mx = b.mn THEN b.mn * 255
        |      ELSE b.mn * 255 + (((u.v - b.mn) * 255) // (b.mx - b.mn)) * (b.mx - b.mn) END ORDER BY u.pos) AS rv
        |  FROM u JOIN b USING (pos) GROUP BY u.vec_id),
        |rn AS (SELECT vec_id AS nid, rv, CAST(list_sum(list_transform(rv, x -> x * x)) AS BIGINT) AS rn2 FROM enc),
        |c AS (SELECT rn.nid, rv, rn2, cell FROM rn JOIN cells ON rn.nid = cells.nid),
        |q AS (SELECT en.vec_id AS qid, vq AS qv, norm2 AS qn, probes.cell FROM en JOIN probes ON en.vec_id = probes.qid),
        |scored AS (
        |  SELECT qid, nid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * rv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(rn2 AS DOUBLE))) AS cos
        |  FROM c JOIN q USING (cell) WHERE nid <> qid),
        |ranked AS (
        |  SELECT qid, nid, cos, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rank
        |  FROM scored)
        |SELECT qid, CAST(rank AS BIGINT) AS rank, nid, cos FROM ranked WHERE rank <= 3""".stripMargin,
    // llm_ivf_sq_recall oracle: brute truth + the composed
    // ivf_sq chain + the hit-count summary row
    "llm_ivf_sq_recall" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS vq FROM embeddings),
        |en AS (SELECT vec_id, vq, CAST(list_sum(list_transform(vq, x -> x * x)) AS BIGINT) AS norm2 FROM e),
        |cent0 AS (SELECT vec_id AS cid, vq AS cv, norm2 AS cn FROM en WHERE vec_id % 25 = 0),
        |a1 AS (SELECT en.vec_id, cent0.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en CROSS JOIN cent0),
        |r1 AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM a1),
        |asg1 AS (SELECT vec_id AS nid, cid AS cell FROM r1 WHERE rn = 1),
        |u1 AS (SELECT asg1.cell, unnest(vq) AS v, generate_subscripts(vq, 1) AS d FROM en JOIN asg1 ON en.vec_id = asg1.nid),
        |m1 AS (SELECT cell, d, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS vc FROM u1 GROUP BY cell, d),
        |cent1 AS (SELECT cell AS cid, list(vc ORDER BY d) AS cv FROM m1 GROUP BY cell),
        |cent1n AS (SELECT cid, cv, CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn FROM cent1),
        |a2 AS (SELECT en.vec_id, cent1n.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en CROSS JOIN cent1n),
        |r2 AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM a2),
        |asg2 AS (SELECT vec_id AS nid, cid AS cell FROM r2 WHERE rn = 1),
        |u2 AS (SELECT asg2.cell, unnest(vq) AS v, generate_subscripts(vq, 1) AS d FROM en JOIN asg2 ON en.vec_id = asg2.nid),
        |m2 AS (SELECT cell, d, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS vc FROM u2 GROUP BY cell, d),
        |cent2 AS (SELECT cell AS cid, list(vc ORDER BY d) AS cv FROM m2 GROUP BY cell),
        |cent AS (SELECT cid, cv, CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn FROM cent2),
        |ascore AS (
        |  SELECT en.vec_id, cent.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en CROSS JOIN cent),
        |ranked_assign AS (
        |  SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn
        |  FROM ascore),
        |cells AS (SELECT vec_id AS nid, cid AS cell FROM ranked_assign WHERE rn = 1),
        |probes AS (SELECT vec_id AS qid, cid AS cell FROM ranked_assign WHERE rn <= 2 AND vec_id % 50 = 0),
        |u AS (SELECT vec_id, unnest(vq) AS v, generate_subscripts(vq, 1) AS pos FROM e),
        |b AS (SELECT pos, min(v) AS mn, max(v) AS mx FROM u GROUP BY pos),
        |enc AS (SELECT u.vec_id, list(CASE WHEN b.mx = b.mn THEN b.mn * 255
        |      ELSE b.mn * 255 + (((u.v - b.mn) * 255) // (b.mx - b.mn)) * (b.mx - b.mn) END ORDER BY u.pos) AS rv
        |  FROM u JOIN b USING (pos) GROUP BY u.vec_id),
        |rn AS (SELECT vec_id AS nid, rv, CAST(list_sum(list_transform(rv, x -> x * x)) AS BIGINT) AS rn2 FROM enc),
        |c AS (SELECT rn.nid, rv, rn2, cell FROM rn JOIN cells ON rn.nid = cells.nid),
        |q AS (SELECT en.vec_id AS qid, vq AS qv, norm2 AS qn, probes.cell FROM en JOIN probes ON en.vec_id = probes.qid),
        |scored AS (
        |  SELECT qid, nid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * rv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(rn2 AS DOUBLE))) AS cos
        |  FROM c JOIN q USING (cell) WHERE nid <> qid),
        |ranked AS (
        |  SELECT qid, nid, cos, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rank
        |  FROM scored),
        |isq AS (SELECT qid, nid FROM (SELECT qid, nid,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rank FROM scored)
        |  WHERE rank <= 3),
        |bq AS (SELECT vec_id AS qid, vq AS qv, norm2 AS qn FROM en WHERE vec_id % 50 = 0),
        |bscored AS (SELECT qid, en.vec_id AS bnid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * en.vq[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(en.norm2 AS DOUBLE))) AS bcos
        |  FROM en CROSS JOIN bq WHERE en.vec_id <> qid),
        |truth AS (SELECT qid, bnid AS nid FROM (SELECT qid, bnid,
        |    row_number() OVER (PARTITION BY qid ORDER BY bcos DESC, bnid ASC) AS rank FROM bscored)
        |  WHERE rank <= 3),
        |hits AS (SELECT count(*) AS n_hits FROM truth JOIN isq USING (qid, nid)),
        |tot AS (SELECT count(*) AS n_truth FROM truth)
        |SELECT 'ivf_sq' AS path, CAST(n_hits AS BIGINT) AS n_hits, CAST(n_truth AS BIGINT) AS n_truth,
        |  CASE WHEN n_truth = 0 THEN 0.0 ELSE CAST(n_hits AS DOUBLE) / n_truth END AS recall
        |FROM hits CROSS JOIN tot""".stripMargin,
    // recall gate: re-derives brute truth + all three approximate paths
    // and counts hit-set intersections (exact integer work)
    "llm_ann_recall" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS vq FROM embeddings),
        |en AS (SELECT vec_id, vq, CAST(list_sum(list_transform(vq, x -> x * x)) AS BIGINT) AS norm2 FROM e),
        |bq AS (SELECT vec_id AS qid, vq AS qv, norm2 AS qn FROM en WHERE vec_id % 50 = 0),
        |bscored AS (SELECT qid, en.vec_id AS nid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * en.vq[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(en.norm2 AS DOUBLE))) AS cos
        |  FROM en CROSS JOIN bq WHERE en.vec_id <> qid),
        |truth AS (SELECT qid, nid FROM (SELECT qid, nid,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rank FROM bscored)
        |  WHERE rank <= 3),
        |eb AS (SELECT vec_id, vq, norm2,
        |  CAST(CASE WHEN vq[1] >= vq[33] THEN 1 ELSE 0 END
        |     + CASE WHEN vq[2] >= vq[34] THEN 2 ELSE 0 END
        |     + CASE WHEN vq[3] >= vq[35] THEN 4 ELSE 0 END
        |     + CASE WHEN vq[4] >= vq[36] THEN 8 ELSE 0 END
        |     + CASE WHEN vq[5] >= vq[37] THEN 16 ELSE 0 END
        |     + CASE WHEN vq[6] >= vq[38] THEN 32 ELSE 0 END AS BIGINT) AS bucket FROM en),
        |lq AS (SELECT vec_id AS qid, vq AS qv, norm2 AS qn, bucket FROM eb WHERE vec_id % 50 = 0),
        |lscored AS (SELECT qid, eb.vec_id AS nid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * eb.vq[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(eb.norm2 AS DOUBLE))) AS cos
        |  FROM eb JOIN lq USING (bucket) WHERE eb.vec_id <> qid),
        |lsh AS (SELECT qid, nid FROM (SELECT qid, nid,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rank FROM lscored)
        |  WHERE rank <= 3),
        |mpq AS (SELECT qid, qv, qn,
        |    unnest(list_concat([bucket], list_transform(generate_series(0, 5), m -> xor(bucket, CAST(1 AS BIGINT) << m)))) AS bucket
        |  FROM lq),
        |mscored AS (SELECT qid, eb.vec_id AS nid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * eb.vq[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(eb.norm2 AS DOUBLE))) AS cos
        |  FROM eb JOIN mpq USING (bucket) WHERE eb.vec_id <> qid),
        |mp AS (SELECT qid, nid FROM (SELECT qid, nid,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rank FROM mscored)
        |  WHERE rank <= 3),
        |cent0 AS (SELECT vec_id AS cid, vq AS cv, norm2 AS cn FROM en WHERE vec_id % 25 = 0),
        |a1 AS (SELECT en.vec_id, cent0.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en CROSS JOIN cent0),
        |r1 AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM a1),
        |asg1 AS (SELECT vec_id AS nid, cid AS cell FROM r1 WHERE rn = 1),
        |u1 AS (SELECT asg1.cell, unnest(vq) AS v, generate_subscripts(vq, 1) AS d FROM en JOIN asg1 ON en.vec_id = asg1.nid),
        |m1 AS (SELECT cell, d, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS vc FROM u1 GROUP BY cell, d),
        |cent1 AS (SELECT cell AS cid, list(vc ORDER BY d) AS cv FROM m1 GROUP BY cell),
        |cent1n AS (SELECT cid, cv, CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn FROM cent1),
        |a2 AS (SELECT en.vec_id, cent1n.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en CROSS JOIN cent1n),
        |r2 AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM a2),
        |asg2 AS (SELECT vec_id AS nid, cid AS cell FROM r2 WHERE rn = 1),
        |u2 AS (SELECT asg2.cell, unnest(vq) AS v, generate_subscripts(vq, 1) AS d FROM en JOIN asg2 ON en.vec_id = asg2.nid),
        |m2 AS (SELECT cell, d, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS vc FROM u2 GROUP BY cell, d),
        |cent2 AS (SELECT cell AS cid, list(vc ORDER BY d) AS cv FROM m2 GROUP BY cell),
        |cent AS (SELECT cid, cv, CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn FROM cent2),
        |ascore AS (SELECT en.vec_id, cent.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en CROSS JOIN cent),
        |ranked_assign AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM ascore),
        |cells AS (SELECT vec_id AS nid, cid AS cell FROM ranked_assign WHERE rn = 1),
        |probes AS (SELECT vec_id AS qid, cid AS cell FROM ranked_assign WHERE rn <= 2 AND vec_id % 50 = 0),
        |ic AS (SELECT en.vec_id AS nid, vq AS nv, norm2 AS nn, cell FROM en JOIN cells ON en.vec_id = cells.nid),
        |iq AS (SELECT en.vec_id AS qid, vq AS qv, norm2 AS qn, probes.cell FROM en JOIN probes ON en.vec_id = probes.qid),
        |iscored AS (SELECT qid, nid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * nv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(nn AS DOUBLE))) AS cos
        |  FROM ic JOIN iq USING (cell) WHERE nid <> qid),
        |ivf AS (SELECT qid, nid FROM (SELECT qid, nid,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rank FROM iscored)
        |  WHERE rank <= 3),
        |nt AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM truth)
        |SELECT 'lsh' AS path,
        |  CAST((SELECT count(*) FROM truth SEMI JOIN lsh USING (qid, nid)) AS BIGINT) AS n_hits,
        |  n_truth,
        |  CAST((SELECT count(*) FROM truth SEMI JOIN lsh USING (qid, nid)) AS DOUBLE) / n_truth AS recall
        |FROM nt
        |UNION ALL
        |SELECT 'lsh_multiprobe',
        |  CAST((SELECT count(*) FROM truth SEMI JOIN mp USING (qid, nid)) AS BIGINT),
        |  n_truth,
        |  CAST((SELECT count(*) FROM truth SEMI JOIN mp USING (qid, nid)) AS DOUBLE) / n_truth
        |FROM nt
        |UNION ALL
        |SELECT 'ivf',
        |  CAST((SELECT count(*) FROM truth SEMI JOIN ivf USING (qid, nid)) AS BIGINT),
        |  n_truth,
        |  CAST((SELECT count(*) FROM truth SEMI JOIN ivf USING (qid, nid)) AS DOUBLE) / n_truth
        |FROM nt""".stripMargin,
    // llm_ivf_probe_curve oracle: one training replay, probe sets per
    // nProbe from the same ranked assignment, per-p hit counting
    "llm_ivf_probe_curve" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS vq FROM embeddings),
        |en AS (SELECT vec_id, vq, CAST(list_sum(list_transform(vq, x -> x * x)) AS BIGINT) AS norm2 FROM e),
        |bq AS (SELECT vec_id AS qid, vq AS qv, norm2 AS qn FROM en WHERE vec_id % 50 = 0),
        |bscored AS (SELECT qid, en.vec_id AS nid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * en.vq[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(en.norm2 AS DOUBLE))) AS cos
        |  FROM en CROSS JOIN bq WHERE en.vec_id <> qid),
        |truth AS (SELECT qid, nid FROM (SELECT qid, nid,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rank FROM bscored)
        |  WHERE rank <= 3),
        |cent0 AS (SELECT vec_id AS cid, vq AS cv, norm2 AS cn FROM en WHERE vec_id % 25 = 0),
        |a1 AS (SELECT en.vec_id, cent0.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en CROSS JOIN cent0),
        |r1 AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM a1),
        |asg1 AS (SELECT vec_id AS nid, cid AS cell FROM r1 WHERE rn = 1),
        |u1 AS (SELECT asg1.cell, unnest(vq) AS v, generate_subscripts(vq, 1) AS d FROM en JOIN asg1 ON en.vec_id = asg1.nid),
        |m1 AS (SELECT cell, d, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS vc FROM u1 GROUP BY cell, d),
        |cent1 AS (SELECT cell AS cid, list(vc ORDER BY d) AS cv FROM m1 GROUP BY cell),
        |cent1n AS (SELECT cid, cv, CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn FROM cent1),
        |a2 AS (SELECT en.vec_id, cent1n.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en CROSS JOIN cent1n),
        |r2 AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM a2),
        |asg2 AS (SELECT vec_id AS nid, cid AS cell FROM r2 WHERE rn = 1),
        |u2 AS (SELECT asg2.cell, unnest(vq) AS v, generate_subscripts(vq, 1) AS d FROM en JOIN asg2 ON en.vec_id = asg2.nid),
        |m2 AS (SELECT cell, d, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS vc FROM u2 GROUP BY cell, d),
        |cent2 AS (SELECT cell AS cid, list(vc ORDER BY d) AS cv FROM m2 GROUP BY cell),
        |cent AS (SELECT cid, cv, CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn FROM cent2),
        |ascore AS (SELECT en.vec_id, cent.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en CROSS JOIN cent),
        |ranked_assign AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM ascore),
        |cells AS (SELECT vec_id AS nid, cid AS cell FROM ranked_assign WHERE rn = 1),
        |ic AS (SELECT en.vec_id AS nid, vq AS nv, norm2 AS nn, cell FROM en JOIN cells ON en.vec_id = cells.nid),
        |plist AS (SELECT unnest([1, 2, 4]) AS p),
        |probesp AS (SELECT p, vec_id AS qid, cid AS cell FROM ranked_assign CROSS JOIN plist
        |  WHERE rn <= p AND vec_id % 50 = 0),
        |iqp AS (SELECT p, en.vec_id AS qid, vq AS qv, norm2 AS qn, probesp.cell
        |  FROM en JOIN probesp ON en.vec_id = probesp.qid),
        |iscoredp AS (SELECT p, qid, nid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * nv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(nn AS DOUBLE))) AS cos
        |  FROM ic JOIN iqp USING (cell) WHERE nid <> qid),
        |ivfp AS (SELECT p, qid, nid FROM (SELECT p, qid, nid,
        |    row_number() OVER (PARTITION BY p, qid ORDER BY cos DESC, nid ASC) AS rank FROM iscoredp)
        |  WHERE rank <= 3),
        |hits AS (SELECT p, CAST(count(*) AS BIGINT) AS c FROM truth JOIN ivfp USING (qid, nid) GROUP BY p),
        |tt AS (SELECT CAST(count(*) AS BIGINT) AS c FROM truth)
        |SELECT 'ivf_p' || CAST(plist.p AS VARCHAR) AS path,
        |  coalesce(hits.c, 0) AS n_hits, tt.c AS n_truth,
        |  CAST(coalesce(hits.c, 0) AS DOUBLE) / tt.c AS recall
        |FROM plist LEFT JOIN hits ON plist.p = hits.p CROSS JOIN tt""".stripMargin,
    "llm_embed_neardup" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS vq FROM embeddings),
        |en AS (SELECT vec_id, vq, CAST(list_sum(list_transform(vq, x -> x * x)) AS BIGINT) AS norm2 FROM e),
        |b AS (SELECT en.vec_id AS id, label, vq, norm2 FROM en JOIN embeddings USING (vec_id))
        |SELECT a.id AS id_a, c.id AS id_b, CAST(a.label AS INT) AS block,
        |  CAST(CAST(list_sum(list_transform(generate_series(1, len(a.vq)), i -> a.vq[i] * c.vq[i])) AS BIGINT) AS DOUBLE)
        |    / (sqrt(CAST(a.norm2 AS DOUBLE)) * sqrt(CAST(c.norm2 AS DOUBLE))) AS cos
        |FROM b a JOIN b c ON a.label = c.label AND a.id < c.id
        |WHERE CAST(CAST(list_sum(list_transform(generate_series(1, len(a.vq)), i -> a.vq[i] * c.vq[i])) AS BIGINT) AS DOUBLE)
        |    / (sqrt(CAST(a.norm2 AS DOUBLE)) * sqrt(CAST(c.norm2 AS DOUBLE))) >= 0.45""".stripMargin,
    // llm_image_decode: the oracle re-derives each PNG's pixel sum
    // ARITHMETICALLY from the generator formula — the Spark side must
    // round-trip the actual encoded bytes through a real decoder to match
    "llm_image_decode" ->
      """WITH imgs AS (
        |  SELECT i AS id, 16 + i*3 AS w, 16 + i*2 AS h
        |  FROM generate_series(1, 4) AS t(i)
        |), px AS (
        |  SELECT id, ((x*7+id)%256) + ((y*11)%256) + ((x+y)%256) AS v
        |  FROM imgs, generate_series(0, 100) gx(x), generate_series(0, 100) gy(y)
        |  WHERE x < w AND y < h
        |)
        |SELECT CAST(id AS BIGINT) AS media_id, true AS decoded,
        |  CAST(16+id*3 AS INT) AS width, CAST(16+id*2 AS INT) AS height,
        |  CAST(sum(v) AS BIGINT) AS pixel_sum
        |FROM px GROUP BY id
        |UNION ALL SELECT 99, false, -1, -1, -1""".stripMargin,
    // llm_image_resize: out dims + nearest-neighbor source indices are
    // pure integer arithmetic, so the resized pixel sum re-derives from
    // the pattern formula alone — no image library on the oracle side
    "llm_image_resize" ->
      """WITH imgs AS (
        |  SELECT i AS id, 16 + i*3 AS w, 16 + i*2 AS h FROM generate_series(1, 4) AS t(i)
        |), od AS (
        |  SELECT id, w, h,
        |    CASE WHEN greatest(w, h) <= 12 THEN w ELSE greatest(1, w * 12 // greatest(w, h)) END AS ow,
        |    CASE WHEN greatest(w, h) <= 12 THEN h ELSE greatest(1, h * 12 // greatest(w, h)) END AS oh
        |  FROM imgs
        |), px AS (
        |  SELECT id, w, h, ow, oh,
        |    (((x * w) // ow) * 7 + id) % 256 + (((y * h) // oh) * 11) % 256
        |      + ((x * w) // ow + (y * h) // oh) % 256 AS v
        |  FROM od, generate_series(0, 100) gx(x), generate_series(0, 100) gy(y)
        |  WHERE x < ow AND y < oh
        |)
        |SELECT CAST(id AS BIGINT) AS media_id, true AS decoded,
        |  CAST(w AS INT) AS in_width, CAST(h AS INT) AS in_height,
        |  CAST(ow AS INT) AS out_width, CAST(oh AS INT) AS out_height,
        |  CAST(sum(v) AS BIGINT) AS out_pixel_sum
        |FROM px GROUP BY id, w, h, ow, oh
        |UNION ALL SELECT 99, false, -1, -1, -1, -1, -1""".stripMargin,
    // llm_audio_decode: the oracle re-derives each WAV's sample count and
    // Σ sample² ARITHMETICALLY from the generator formula — the Spark side
    // must round-trip the actual RIFF/WAVE bytes through a real decoder
    "llm_audio_decode" ->
      """WITH cfg AS (
        |  SELECT * FROM (VALUES (1, 601, 1), (2, 702, 1), (3, 803, 1), (4, 800, 2)) AS t(id, n, ch)
        |), px AS (
        |  SELECT id, ch, n, ((i*31 + id*7) % 2003) - 1001 AS v
        |  FROM cfg, generate_series(0, 2000) g(i) WHERE i < n
        |)
        |SELECT CAST(id AS BIGINT) AS media_id, true AS decoded,
        |  CAST(8000 AS INT) AS sample_rate, CAST(ch AS INT) AS channels,
        |  CAST(n AS BIGINT) AS n_samples, CAST(sum(v*v) AS BIGINT) AS sum_sq
        |FROM px GROUP BY id, ch, n
        |UNION ALL SELECT 99, false, -1, -1, -1, -1""".stripMargin,
    // llm_audio_adpcm oracle: the IMA two-table state machine replayed
    // sample-by-sample as a recursive CTE (step/index tables verbatim
    // from the IMA 1992 recommended practice) over the formula-derived
    // header state and nibble stream — an independent decode, not a
    // pinned constant. The recursion ranges over (id, ch): mono ids 1-3
    // have ch=0 only, stereo ids 11-13 run both channels' formulas
    // independently (per-channel energies sum) — correct word
    // de-interleave is the ONLY way the engine reproduces them.
    "llm_audio_adpcm" ->
      """WITH RECURSIVE
        |cfg AS (
        |  SELECT id, ch, nch, n,
        |    CAST((id*7 + ch*11) % 2003 - 1001 AS INT) AS p0,
        |    CAST((id*5 + ch*7) % 60 AS INT) AS s0
        |  FROM (
        |    SELECT id, 0 AS ch, 1 AS nch, 400 + 37*id AS n
        |    FROM generate_series(1, 3) g(id)
        |    UNION ALL
        |    SELECT id, ch, 2 AS nch, 300 + 41*(id - 10) AS n
        |    FROM generate_series(11, 13) g(id), generate_series(0, 1) c(ch)
        |  ) b),
        |st AS (
        |  SELECT id, ch, 0 AS k, p0 AS pred, s0 AS sidx,
        |    CAST(p0 AS BIGINT)*p0 AS acc FROM cfg
        |  UNION ALL
        |  SELECT id, ch, k + 1,
        |    greatest(-32768, least(32767,
        |      CASE WHEN (nib & 8) > 0 THEN pred - delta ELSE pred + delta END)) AS pred,
        |    greatest(0, least(88, sidx +
        |      [-1,-1,-1,-1,2,4,6,8,-1,-1,-1,-1,2,4,6,8][nib + 1])) AS sidx,
        |    acc + CAST(greatest(-32768, least(32767,
        |      CASE WHEN (nib & 8) > 0 THEN pred - delta ELSE pred + delta END)) AS BIGINT)
        |        * greatest(-32768, least(32767,
        |      CASE WHEN (nib & 8) > 0 THEN pred - delta ELSE pred + delta END)) AS acc
        |  FROM (
        |    SELECT st.id, st.ch, st.k, st.pred, st.sidx, st.acc, cfg.n,
        |      CAST((st.k*13 + st.id*5 + st.ch*3) % 16 AS INT) AS nib,
        |      (st_tab.s >> 3)
        |        + CASE WHEN ((st.k*13 + st.id*5 + st.ch*3) % 16 & 4) > 0 THEN st_tab.s ELSE 0 END
        |        + CASE WHEN ((st.k*13 + st.id*5 + st.ch*3) % 16 & 2) > 0 THEN st_tab.s >> 1 ELSE 0 END
        |        + CASE WHEN ((st.k*13 + st.id*5 + st.ch*3) % 16 & 1) > 0 THEN st_tab.s >> 2 ELSE 0 END AS delta
        |    FROM st JOIN cfg USING (id, ch)
        |    JOIN LATERAL (SELECT [7,8,9,10,11,12,13,14,16,17,19,21,23,25,28,31,34,37,
        |      41,45,50,55,60,66,73,80,88,97,107,118,130,143,157,173,190,209,230,253,
        |      279,307,337,371,408,449,494,544,598,658,724,796,876,963,1060,1166,1282,
        |      1411,1552,1707,1878,2066,2272,2499,2749,3024,3327,3660,4026,4428,4871,
        |      5358,5894,6484,7132,7845,8630,9493,10442,11487,12635,13899,15289,16818,
        |      18500,20350,22385,24623,27086,29794,32767][st.sidx + 1] AS s) st_tab ON true
        |    WHERE st.k + 1 < cfg.n) q)
        |SELECT CAST(id AS BIGINT) AS media_id, true AS decoded, CAST(8000 AS INT) AS sample_rate,
        |  CAST(max(nch) AS INT) AS channels, CAST(sum(n) AS BIGINT) AS n_samples,
        |  CAST(sum(acc) AS BIGINT) AS sum_sq
        |FROM st JOIN cfg USING (id, ch) WHERE k = n - 1
        |GROUP BY id
        |UNION ALL SELECT 99, false, -1, -1, -1, -1
        |""".stripMargin,
    // llm_audio_g711 oracle: recomputes the G.711 compand→expand round
    // trip per sample — µ-law (bias 132, exponent/mantissa extraction)
    // and A-law (negative bias -8, seg boundaries 255/511/...) exactly as
    // the ITU tables specify; verified sample-by-sample against the JDK
    // codec before pinning. sum(r²) over the round-tripped samples must
    // equal the engine's transcoded-PCM energy.
    "llm_audio_g711" ->
      """WITH cfg AS (SELECT * FROM (VALUES
        |    (1, 1, 601, 'ulaw'), (2, 2, 702, 'ulaw'), (3, 3, 803, 'ulaw'),
        |    (11, 1, 601, 'alaw'), (12, 2, 702, 'alaw'), (13, 3, 803, 'alaw'))
        |  t(id, seed, n, codec)),
        |s AS (SELECT id, codec, ((i*31 + seed*7) % 2003) - 1001 AS v
        |      FROM cfg, generate_series(0, 1000) g(i) WHERE i < n),
        |ux AS (SELECT id, codec, v, least(abs(v), 32635) + 132 AS x1,
        |         CASE WHEN v >= 0 THEN v ELSE -v - 8 END AS lin FROM s),
        |ee AS (SELECT *, CAST(floor(log2(x1)) AS INT) - 7 AS ue,
        |         CASE WHEN lin <= 255 THEN 0
        |              ELSE CAST(floor(log2(lin)) AS INT) - 7 END AS aseg FROM ux),
        |mm AS (SELECT *, (x1 >> (ue + 3)) & 15 AS um,
        |         CASE WHEN aseg < 2 THEN (lin >> 4) & 15
        |              ELSE (lin >> (aseg + 3)) & 15 END AS am FROM ee),
        |rr AS (SELECT id, codec,
        |         CASE WHEN codec = 'ulaw'
        |           THEN (CASE WHEN v < 0 THEN -1 ELSE 1 END) *
        |                (((um * 8 + 132) << ue) - 132)
        |           ELSE (CASE WHEN v >= 0 THEN 1 ELSE -1 END) *
        |                (CASE WHEN aseg = 0 THEN (am << 4) + 8
        |                      WHEN aseg = 1 THEN (am << 4) + 264
        |                      ELSE ((am << 4) + 264) << (aseg - 1) END) END AS r
        |       FROM mm)
        |SELECT CAST(id AS BIGINT) AS media_id, codec, true AS decoded,
        |  CAST(8000 AS INT) AS sample_rate, CAST(1 AS INT) AS channels,
        |  CAST(count(*) AS BIGINT) AS n_samples,
        |  CAST(sum(r*r) AS BIGINT) AS sum_sq
        |FROM rr GROUP BY id, codec
        |UNION ALL SELECT 99, 'junk', false, -1, -1, -1, -1""".stripMargin,
    // llm_video_frames oracle: structural facts (frame count, raster
    // dims) are exact; pixel_sum pins the GOLDEN decoded sums measured
    // once on this JDK's ImageIO (deterministic for a fixed JDK), so a
    // silent decoder change fails the hash outright. The pattern sums
    // (655200/1425408/2711520) bound the JPEG error at ~0.1%.
    "llm_video_frames" ->
      """WITH cfg AS (SELECT * FROM (VALUES
        |  (1, 3, 40, 28, 655713),
        |  (2, 4, 48, 32, 1424018),
        |  (3, 5, 56, 36, 2709614)) t(id, nf, w, h, ps))
        |SELECT CAST(id AS BIGINT) AS media_id, true AS decoded,
        |  CAST(nf AS INT) AS n_frames, CAST(w AS INT) AS width,
        |  CAST(h AS INT) AS height, CAST(ps AS BIGINT) AS pixel_sum
        |FROM cfg
        |UNION ALL SELECT 99, false, -1, -1, -1, -1""".stripMargin,
    "llm_multimodal" ->
      """SELECT doc_id AS media_id, 'text-as-image-stub' AS kind,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  md5(text) AS content_md5,
        |  lower(substr(hex(encode(text)), 1, 16)) AS head8_hex,
        |  CAST(floor(((n_chars % 640) + 32) * least(1.0, 256.0 / greatest((n_chars % 640) + 32, ((n_chars * 7) % 480) + 32))) AS INT) AS out_width,
        |  CAST(floor((((n_chars * 7) % 480) + 32) * least(1.0, 256.0 / greatest((n_chars % 640) + 32, ((n_chars * 7) % 480) + 32))) AS INT) AS out_height,
        |  CAST(greatest(n_chars * 10 - 1, 0) // 1000 + 1 AS BIGINT) AS n_frames
        |FROM documents""".stripMargin,
    // Connected components via recursive transitive closure over the same
    // MinHash-LSH pair pipeline the llm_minhash_neardup oracle derives;
    // component id = min reachable doc id.
    "llm_dedup_clusters" ->
      """WITH RECURSIVE w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
        |sh AS (SELECT doc_id, CASE WHEN len(ws) < 3 THEN CAST([] AS VARCHAR[])
        |  ELSE list_distinct(list_transform(generate_series(1, len(ws)-2),
        |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) END AS shingles FROM w),
        |hs AS (SELECT doc_id, shingles,
        |  list_transform(shingles, s -> CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)) AS shash
        |  FROM sh WHERE len(shingles) > 0),
        |sig AS (SELECT doc_id, shingles, list_transform(generate_series(0, 31), i ->
        |  list_min(list_transform(shash, h ->
        |    ((CAST(('0x' || substr(md5('a' || CAST(i AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000006 + 1)
        |      * (h % 1000000007)
        |     + CAST(('0x' || substr(md5('b' || CAST(i AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000007) % 1000000007))) AS sig
        |  FROM hs),
        |bands AS (SELECT doc_id, shingles, b AS band_id,
        |  md5(array_to_string(sig[b*4+1 : b*4+4], ',')) AS band_key
        |  FROM sig, (SELECT unnest(generate_series(0, 7)) AS b)),
        |cand AS (SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
        |    CAST(len(list_intersect(a.shingles, c.shingles)) AS DOUBLE)
        |      / len(list_distinct(list_concat(a.shingles, c.shingles))) AS jaccard
        |  FROM bands a JOIN bands c
        |    ON a.band_id = c.band_id AND a.band_key = c.band_key AND a.doc_id < c.doc_id),
        |pairs AS (SELECT id_a, id_b FROM cand WHERE jaccard >= 0.5),
        |edges AS (SELECT id_a AS u, id_b AS v FROM pairs UNION SELECT id_b, id_a FROM pairs),
        |reach(id, r) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT e.u, reach.r FROM edges e JOIN reach ON reach.id = e.v),
        |comp AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id)
        |SELECT doc_id, cluster_id,
        |  count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
        |  doc_id = cluster_id AS is_canonical
        |FROM comp""".stripMargin,
    "llm_quality_gopher" ->
      """WITH w AS (SELECT doc_id, text, string_split(lower(text), ' ') AS ws,
        |    string_split(text, chr(10)) AS lines FROM documents),
        |g AS (SELECT *, CASE WHEN len(ws) < 2 THEN CAST([] AS VARCHAR[])
        |    ELSE list_transform(generate_series(1, len(ws)-1), i -> ws[i] || ' ' || ws[i+1]) END AS g2 FROM w),
        |sig AS (SELECT doc_id, text, ws,
        |  1.0 - CAST(len(list_distinct(lines)) AS DOUBLE) / len(lines) AS dup_line_frac,
        |  CASE WHEN len(g2) = 0 THEN 0.0 ELSE CAST(list_max(list_transform(list_distinct(g2),
        |     x -> len(list_filter(g2, y -> y = x)))) AS DOUBLE) / len(g2) END AS top_bigram_frac,
        |  CAST(len(regexp_extract_all(text, '#')) + len(regexp_extract_all(text, '\.\.\.')) AS DOUBLE)
        |    / len(ws) AS symbol_word_ratio,
        |  CAST(len(list_filter(lines, l -> starts_with(l, '-') OR starts_with(l, '*'))) AS DOUBLE)
        |    / len(lines) AS bullet_line_frac,
        |  CAST(len(list_filter(ws, x -> list_contains(['the','a','of','and','to','in','is','it','for','on'], x))) AS DOUBLE)
        |    / len(ws) AS stopword_frac
        |  FROM g)
        |SELECT doc_id, dup_line_frac, top_bigram_frac, symbol_word_ratio, bullet_line_frac, stopword_frac,
        |  (len(ws) BETWEEN 50 AND 100000)
        |  AND (CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(ws) BETWEEN 3.0 AND 10.0)
        |  AND symbol_word_ratio < 0.1 AND dup_line_frac < 0.3
        |  AND len(list_intersect(ws, ['the','a','of','and','to','in','is','it','for','on'])) >= 2 AS gopher_keep
        |FROM sig""".stripMargin,
    "llm_pii_scrub" ->
      """WITH p AS (SELECT doc_id, text || ' contact user' || doc_id || '@example.com call +1 555 ' ||
        |    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' from 10.0.0.' || CAST(doc_id % 250 AS VARCHAR) AS text2
        |  FROM documents)
        |SELECT doc_id,
        |  len(regexp_extract_all(text2, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
        |  len(regexp_extract_all(text2, '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS n_ips,
        |  len(regexp_extract_all(text2, '\+[0-9]{1,3}[- ][0-9]{3}[- ][0-9]{4}')) AS n_phones,
        |  regexp_replace(regexp_replace(regexp_replace(text2,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\+[0-9]{1,3}[- ][0-9]{3}[- ][0-9]{4}', '<PHONE>', 'g'),
        |    '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g') AS scrubbed
        |FROM p""".stripMargin,
    "llm_hash_sample" ->
      """WITH r AS (SELECT doc_id, lang, source,
        |  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS b
        |  FROM documents)
        |SELECT doc_id, lang, source FROM r
        |WHERE b < CASE lang WHEN 'en' THEN 10 WHEN 'fr' THEN 100 ELSE 40 END""".stripMargin,
    "llm_incremental_dedup" ->
      """WITH w AS (SELECT doc_id, text, doc_id % 5 = 0 AS isnew,
        |    string_split(lower(text), ' ') AS ws FROM documents),
        |ck AS (SELECT doc_id, isnew, md5(text) AS c FROM w),
        |sh AS (SELECT doc_id, isnew, CASE WHEN len(ws) < 3 THEN CAST([] AS VARCHAR[])
        |  ELSE list_distinct(list_transform(generate_series(1, len(ws)-2),
        |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) END AS shingles FROM w),
        |hs AS (SELECT doc_id, isnew, shingles,
        |  list_transform(shingles, s -> CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)) AS shash
        |  FROM sh WHERE len(shingles) > 0),
        |sig AS (SELECT doc_id, isnew, shingles, list_transform(generate_series(0, 31), i ->
        |  list_min(list_transform(shash, h ->
        |    ((CAST(('0x' || substr(md5('a' || CAST(i AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000006 + 1)
        |      * (h % 1000000007)
        |     + CAST(('0x' || substr(md5('b' || CAST(i AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000007) % 1000000007))) AS sig
        |  FROM hs),
        |bands AS (SELECT doc_id, isnew, shingles, b AS band_id,
        |  md5(array_to_string(sig[b*4+1 : b*4+4], ',')) AS band_key
        |  FROM sig, (SELECT unnest(generate_series(0, 7)) AS b)),
        |cand AS (SELECT DISTINCT a.doc_id AS id, c.doc_id AS oid
        |  FROM bands a JOIN bands c
        |    ON a.band_id = c.band_id AND a.band_key = c.band_key
        |  WHERE a.isnew AND NOT c.isnew),
        |near AS (SELECT DISTINCT cand.id FROM cand
        |  JOIN hs a ON a.doc_id = cand.id JOIN hs c ON c.doc_id = cand.oid
        |  WHERE CAST(len(list_intersect(a.shingles, c.shingles)) AS DOUBLE)
        |    / len(list_distinct(list_concat(a.shingles, c.shingles))) >= 0.5),
        |ex AS (SELECT DISTINCT n.doc_id AS id FROM ck n
        |  JOIN ck o ON n.c = o.c AND NOT o.isnew WHERE n.isnew)
        |SELECT w.doc_id,
        |  w.doc_id IN (SELECT id FROM ex) AS dup_exact,
        |  w.doc_id IN (SELECT id FROM near) AS dup_near,
        |  NOT (w.doc_id IN (SELECT id FROM ex)) AND NOT (w.doc_id IN (SELECT id FROM near)) AS keep
        |FROM w WHERE isnew""".stripMargin,
    "llm_domain_mix" ->
      """WITH w AS (SELECT doc_id, source, CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens FROM documents),
        |ps AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS src_tokens FROM w GROUP BY source),
        |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens FROM w),
        |wt AS (SELECT * FROM (VALUES ('src0', CAST(5000 AS BIGINT)), ('src1', CAST(2000 AS BIGINT))) v(source, w_bp)),
        |r AS (SELECT ps.source,
        |    least(CAST(10000 AS BIGINT), (total_tokens * coalesce(w_bp, 100) // 10000) * 10000 // src_tokens) AS rate_bp
        |  FROM ps CROSS JOIN tot LEFT JOIN wt ON ps.source = wt.source)
        |SELECT w.doc_id, w.source, w.n_tokens,
        |  CAST(('0x' || substr(md5(CAST(w.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000 < r.rate_bp AS keep
        |FROM w JOIN r ON w.source = r.source""".stripMargin,
    // llm_domain_mix_temp oracle: √-damped shares — s = floor(sqrt(src
    // tokens)) exact integer (IEEE sqrt is correctly rounded in both
    // engines), then the same integer basis-point chain as domain_mix
    "llm_domain_mix_temp" ->
      """WITH d AS (SELECT doc_id, source, CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens
        |  FROM documents WHERE doc_id % 3 = 0 OR source IN ('src0', 'src1')),
        |ps AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS st FROM d GROUP BY source),
        |pss AS (SELECT source, st, CAST(floor(sqrt(CAST(st AS DOUBLE))) AS BIGINT) AS s FROM ps),
        |tot AS (SELECT CAST(sum(st) AS BIGINT) AS tt, CAST(sum(s) AS BIGINT) AS ss FROM pss),
        |r AS (SELECT source, st, s * 10000 // ss AS w_bp,
        |    least(CAST(10000 AS BIGINT), (tt * (s * 10000 // ss) // 10000) * 10000 // st) AS rate_bp
        |  FROM pss CROSS JOIN tot)
        |SELECT d.doc_id, d.source, d.n_tokens, r.w_bp,
        |  CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000 < r.rate_bp AS keep
        |FROM d JOIN r ON d.source = r.source""".stripMargin,
    "llm_vocab_census" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word FROM documents),
        |t2 AS (SELECT doc_id, word FROM t WHERE length(word) > 0),
        |tf AS (SELECT word, CAST(count(*) AS BIGINT) AS n_occurrences FROM t2 GROUP BY word),
        |dfq AS (SELECT word, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs FROM t2 GROUP BY word)
        |SELECT tf.word, n_occurrences, n_docs FROM tf JOIN dfq USING (word)
        |ORDER BY n_occurrences DESC, word ASC LIMIT 100""".stripMargin,
    // pack-group modulus derived from the SAME formula as the engine
    // (max(32, ceil(n/500k))), not a hardcoded 32 — engine and oracle stay
    // in lockstep when the corpus outgrows 16M docs
    "llm_seq_pack" ->
      """WITH g AS (SELECT GREATEST(32, CAST(ceil(count(*) / 500000.0) AS BIGINT)) AS n FROM documents),
        |w AS (SELECT doc_id,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % (SELECT n FROM g) AS pack_group,
        |    CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens FROM documents),
        |c AS (SELECT *, sum(n_tokens) OVER (PARTITION BY pack_group ORDER BY doc_id) AS cum FROM w)
        |SELECT doc_id, CAST(pack_group AS BIGINT) AS pack_group, n_tokens,
        |  CAST((cum - n_tokens) // 512 AS BIGINT) AS start_block,
        |  CAST((cum - 1) // 512 AS BIGINT) AS end_block
        |FROM c""".stripMargin,
    "llm_line_dedup" ->
      """WITH s AS (SELECT doc_id, text ||
        |    CASE WHEN doc_id % 3 = 0 THEN chr(10) || 'subscribe to our newsletter today' ELSE '' END ||
        |    CASE WHEN doc_id % 7 = 0 THEN chr(10) || 'all rights reserved by example corp' ELSE '' END AS t2
        |  FROM documents),
        |l AS (SELECT doc_id, generate_subscripts(ls, 1) AS pos, unnest(ls) AS line
        |  FROM (SELECT doc_id, string_split(t2, chr(10)) AS ls FROM s)),
        |b AS (SELECT line FROM (SELECT line, count(DISTINCT doc_id) AS nd FROM l GROUP BY line) WHERE nd >= 10),
        |t AS (SELECT doc_id, pos, line, line IN (SELECT line FROM b) AS isb FROM l)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(sum(CASE WHEN isb THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_lines,
        |  coalesce(string_agg(CASE WHEN isb THEN NULL ELSE line END, chr(10) ORDER BY pos), '') AS cleaned_text
        |FROM t GROUP BY doc_id""".stripMargin,
    "llm_decontaminate" ->
      """WITH ev AS (SELECT doc_id, lower(text) AS lt FROM documents WHERE doc_id % 100 = 0),
        |snips AS (SELECT doc_id // 100 AS ref, array_to_string((string_split(lt, ' '))[1:12], ' ') AS snip FROM ev),
        |tr AS (SELECT d.doc_id, CASE WHEN d.doc_id % 20 = 1 THEN d.text || ' ' || s.snip ELSE d.text END AS t2
        |  FROM documents d JOIN snips s ON s.ref = d.doc_id % 5 WHERE d.doc_id % 100 <> 0),
        |eg AS (SELECT DISTINCT unnest(g8) AS g FROM (
        |  SELECT CASE WHEN len(ws) < 8 THEN CAST([] AS VARCHAR[])
        |    ELSE list_distinct(list_transform(generate_series(1, len(ws)-7), i -> array_to_string(ws[i:i+7], ' '))) END AS g8
        |  FROM (SELECT string_split(lt, ' ') AS ws FROM ev))),
        |tg AS (SELECT doc_id, unnest(g8) AS g FROM (
        |  SELECT doc_id, CASE WHEN len(ws) < 8 THEN CAST([] AS VARCHAR[])
        |    ELSE list_distinct(list_transform(generate_series(1, len(ws)-7), i -> array_to_string(ws[i:i+7], ' '))) END AS g8
        |  FROM (SELECT doc_id, string_split(lower(t2), ' ') AS ws FROM tr))),
        |h AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM tg SEMI JOIN eg USING (g) GROUP BY doc_id)
        |SELECT tr.doc_id, coalesce(h.n, 0) AS n_eval_grams, coalesce(h.n, 0) > 0 AS contaminated
        |FROM tr LEFT JOIN h ON tr.doc_id = h.doc_id""".stripMargin,
    // llm_contamination_report oracle: BOTH benchmark families' salted
    // leaks independently recomputed (family A head snips keyed %5,
    // family B word-3 snips keyed (id+2)%5), inverted to the per-EVAL
    // view: distinct-gram totals, hit grams, distinct leaking train docs,
    // benchmark tag.
    "llm_contamination_report" ->
      """WITH evA AS (SELECT doc_id, lower(text) AS lt FROM documents WHERE doc_id % 100 = 0),
        |evB AS (SELECT doc_id, lower(text) AS lt FROM documents WHERE doc_id % 100 = 50),
        |snA AS (SELECT doc_id // 100 AS refA, array_to_string((string_split(lt, ' '))[1:12], ' ') AS snipA FROM evA),
        |snB AS (SELECT doc_id // 100 AS refB, array_to_string((string_split(lt, ' '))[3:14], ' ') AS snipB FROM evB),
        |tr AS (
        |  SELECT d.doc_id,
        |    CASE WHEN d.doc_id % 20 = 1 OR d.doc_id % 20 = 7 THEN d.text || ' ' || a.snipA
        |         WHEN d.doc_id % 20 = 13 THEN d.text || ' ' || b.snipB
        |         ELSE d.text END AS t2
        |  FROM documents d
        |  JOIN snA a ON a.refA = d.doc_id % 5
        |  JOIN snB b ON b.refB = (d.doc_id + 2) % 5
        |  WHERE d.doc_id % 100 <> 0 AND d.doc_id % 100 <> 50),
        |ev AS (SELECT * FROM evA UNION ALL SELECT * FROM evB),
        |egd AS (SELECT doc_id AS eval_id, unnest(g8) AS g FROM (
        |  SELECT doc_id, CASE WHEN len(ws) < 8 THEN CAST([] AS VARCHAR[])
        |    ELSE list_distinct(list_transform(generate_series(1, len(ws)-7), i -> array_to_string(ws[i:i+7], ' '))) END AS g8
        |  FROM (SELECT doc_id, string_split(lt, ' ') AS ws FROM ev))),
        |tg AS (SELECT doc_id, unnest(g8) AS g FROM (
        |  SELECT doc_id, CASE WHEN len(ws) < 8 THEN CAST([] AS VARCHAR[])
        |    ELSE list_distinct(list_transform(generate_series(1, len(ws)-7), i -> array_to_string(ws[i:i+7], ' '))) END AS g8
        |  FROM (SELECT doc_id, string_split(lower(t2), ' ') AS ws FROM tr))),
        |hit AS (SELECT eval_id, CAST(count(DISTINCT egd.g) AS BIGINT) AS n_hit_grams,
        |    CAST(count(DISTINCT tg.doc_id) AS BIGINT) AS n_train_docs
        |  FROM egd JOIN tg ON egd.g = tg.g GROUP BY eval_id),
        |tot AS (SELECT eval_id, CAST(count(*) AS BIGINT) AS n_grams FROM egd GROUP BY eval_id)
        |SELECT tot.eval_id, tot.n_grams,
        |  coalesce(hit.n_hit_grams, 0) AS n_hit_grams,
        |  coalesce(hit.n_train_docs, 0) AS n_train_docs,
        |  coalesce(hit.n_hit_grams, 0) > 0 AS burned,
        |  CASE WHEN tot.eval_id % 100 = 0 THEN 'benchA' ELSE 'benchB' END AS benchmark
        |FROM tot LEFT JOIN hit ON tot.eval_id = hit.eval_id
        |""".stripMargin,
    // llm_corpus_diff oracle: same synthetic refresh + md5-prefix content
    // hashes, full-outer joined on the id
    "llm_corpus_diff" ->
      """WITH v1 AS (SELECT doc_id, CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS h_old FROM documents),
        |v2d AS (SELECT doc_id, CASE WHEN doc_id % 13 = 0 THEN text || ' [rev2]' ELSE text END AS t2
        |  FROM documents WHERE doc_id % 17 <> 0
        |  UNION ALL SELECT i AS doc_id, 'fresh crawl doc ' || CAST(i AS VARCHAR) AS t2
        |  FROM generate_series(-20, -1) g(i)),
        |v2 AS (SELECT doc_id, CAST(('0x' || substr(md5(t2), 1, 15)) AS BIGINT) AS h_new FROM v2d)
        |SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id, h_old, h_new,
        |  CASE WHEN h_old IS NULL THEN 'added'
        |       WHEN h_new IS NULL THEN 'removed'
        |       WHEN h_old = h_new THEN 'unchanged'
        |       ELSE 'changed' END AS status
        |FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id""".stripMargin,
    // llm_corpus_drift oracle: same v2 perturbation as llm_corpus_diff,
    // same one-division-per-rate IEEE sequence, same (drift, word) cut
    "llm_corpus_drift" ->
      """WITH v2d AS (SELECT doc_id, CASE WHEN doc_id % 13 = 0 THEN text || ' [rev2]' ELSE text END AS t2
        |  FROM documents WHERE doc_id % 17 <> 0
        |  UNION ALL SELECT i AS doc_id, 'fresh crawl doc ' || CAST(i AS VARCHAR) AS t2
        |  FROM generate_series(-20, -1) g(i)),
        |t1 AS (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents),
        |t1f AS (SELECT word FROM t1 WHERE len(word) > 0),
        |t2 AS (SELECT unnest(string_split(lower(t2), ' ')) AS word FROM v2d),
        |t2f AS (SELECT word FROM t2 WHERE len(word) > 0),
        |cc1 AS (SELECT word, CAST(count(*) AS BIGINT) AS c1 FROM t1f GROUP BY word),
        |cc2 AS (SELECT word, CAST(count(*) AS BIGINT) AS c2 FROM t2f GROUP BY word),
        |n1 AS (SELECT CAST(count(*) AS BIGINT) AS n1 FROM t1f),
        |n2 AS (SELECT CAST(count(*) AS BIGINT) AS n2 FROM t2f),
        |j AS (SELECT coalesce(cc1.word, cc2.word) AS word,
        |    coalesce(c1, 0) AS c1, coalesce(c2, 0) AS c2
        |  FROM cc1 FULL OUTER JOIN cc2 ON cc1.word = cc2.word),
        |r AS (SELECT word, c1, c2,
        |    CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS r1,
        |    CAST(c2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS r2
        |  FROM j CROSS JOIN n1 CROSS JOIN n2)
        |SELECT word, c1, c2, r1, r2, abs(r1 - r2) AS drift
        |FROM r ORDER BY drift DESC, word ASC LIMIT 20""".stripMargin,
    // llm_chunking oracle: same window/stride arithmetic over the same
    // filtered token list; DuckDB list slice [a:b] is inclusive = Spark
    // slice(ws, a, 32) = elements a..a+31
    "llm_chunking" ->
      """WITH w AS (SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> len(x) > 0) AS ws FROM documents),
        |st AS (SELECT doc_id, ws, unnest(CASE WHEN len(ws) < 1 THEN [] ELSE generate_series(0, len(ws) - 1, 24) END) AS start FROM w)
        |SELECT doc_id, CAST(start // 24 AS BIGINT) AS chunk_id,
        |  CAST(start AS BIGINT) AS start_token,
        |  CAST(least(32, len(ws) - start) AS BIGINT) AS n_tokens,
        |  array_to_string(ws[start + 1:start + 32], ' ') AS chunk_text
        |FROM st""".stripMargin,
    // llm_bpe_train oracle: the same 6 merge steps replayed as chained
    // CTE blocks (mechanically generated per step — census → pair count →
    // pinned-tie-break top pair → greedy run-parity application), with
    // MATERIALIZED hints so multiply-referenced steps evaluate once
    "llm_bpe_train" ->
      """WITH w0 AS (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents),
        |wf AS (SELECT word, CAST(count(*) AS BIGINT) AS wc FROM w0 WHERE len(word) > 1 GROUP BY word),
        |d0 AS MATERIALIZED (SELECT word, wc, list_transform(generate_series(1, len(word)), i -> word[i:i]) AS syms FROM wf),
        |p1 AS (SELECT word, wc, generate_subscripts(syms, 1) - 1 AS pos, unnest(syms) AS sym FROM d0),
        |n1 AS (SELECT word, wc, pos, sym, lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt FROM p1),
        |t1 AS MATERIALIZED (SELECT sym AS a, nxt AS b, CAST(sum(wc) AS BIGINT) AS n FROM n1 WHERE nxt IS NOT NULL
        |  GROUP BY sym, nxt ORDER BY n DESC, a ASC, b ASC LIMIT 1),
        |m1 AS MATERIALIZED (SELECT n1.*, t1.a, t1.b, (sym = a AND nxt = b) AS cand FROM n1 CROSS JOIN t1),
        |c1 AS (SELECT word, pos, pos - row_number() OVER (PARTITION BY word ORDER BY pos) AS grp FROM m1 WHERE cand),
        |ap1 AS MATERIALIZED (SELECT word, pos FROM (SELECT word, pos, min(pos) OVER (PARTITION BY word, grp) AS h FROM c1) WHERE (pos - h) % 2 = 0),
        |d1 AS MATERIALIZED (SELECT m.word, m.wc,
        |    list(CASE WHEN ap.pos IS NOT NULL THEN m.a || m.b ELSE m.sym END ORDER BY m.pos) AS syms
        |  FROM m1 m
        |  LEFT JOIN ap1 ap ON m.word = ap.word AND m.pos = ap.pos
        |  LEFT JOIN ap1 ab ON m.word = ab.word AND m.pos = ab.pos + 1
        |  WHERE ab.pos IS NULL GROUP BY m.word, m.wc),
        |p2 AS (SELECT word, wc, generate_subscripts(syms, 1) - 1 AS pos, unnest(syms) AS sym FROM d1),
        |n2 AS (SELECT word, wc, pos, sym, lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt FROM p2),
        |t2 AS MATERIALIZED (SELECT sym AS a, nxt AS b, CAST(sum(wc) AS BIGINT) AS n FROM n2 WHERE nxt IS NOT NULL
        |  GROUP BY sym, nxt ORDER BY n DESC, a ASC, b ASC LIMIT 1),
        |m2 AS MATERIALIZED (SELECT n2.*, t2.a, t2.b, (sym = a AND nxt = b) AS cand FROM n2 CROSS JOIN t2),
        |c2 AS (SELECT word, pos, pos - row_number() OVER (PARTITION BY word ORDER BY pos) AS grp FROM m2 WHERE cand),
        |ap2 AS MATERIALIZED (SELECT word, pos FROM (SELECT word, pos, min(pos) OVER (PARTITION BY word, grp) AS h FROM c2) WHERE (pos - h) % 2 = 0),
        |d2 AS MATERIALIZED (SELECT m.word, m.wc,
        |    list(CASE WHEN ap.pos IS NOT NULL THEN m.a || m.b ELSE m.sym END ORDER BY m.pos) AS syms
        |  FROM m2 m
        |  LEFT JOIN ap2 ap ON m.word = ap.word AND m.pos = ap.pos
        |  LEFT JOIN ap2 ab ON m.word = ab.word AND m.pos = ab.pos + 1
        |  WHERE ab.pos IS NULL GROUP BY m.word, m.wc),
        |p3 AS (SELECT word, wc, generate_subscripts(syms, 1) - 1 AS pos, unnest(syms) AS sym FROM d2),
        |n3 AS (SELECT word, wc, pos, sym, lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt FROM p3),
        |t3 AS MATERIALIZED (SELECT sym AS a, nxt AS b, CAST(sum(wc) AS BIGINT) AS n FROM n3 WHERE nxt IS NOT NULL
        |  GROUP BY sym, nxt ORDER BY n DESC, a ASC, b ASC LIMIT 1),
        |m3 AS MATERIALIZED (SELECT n3.*, t3.a, t3.b, (sym = a AND nxt = b) AS cand FROM n3 CROSS JOIN t3),
        |c3 AS (SELECT word, pos, pos - row_number() OVER (PARTITION BY word ORDER BY pos) AS grp FROM m3 WHERE cand),
        |ap3 AS MATERIALIZED (SELECT word, pos FROM (SELECT word, pos, min(pos) OVER (PARTITION BY word, grp) AS h FROM c3) WHERE (pos - h) % 2 = 0),
        |d3 AS MATERIALIZED (SELECT m.word, m.wc,
        |    list(CASE WHEN ap.pos IS NOT NULL THEN m.a || m.b ELSE m.sym END ORDER BY m.pos) AS syms
        |  FROM m3 m
        |  LEFT JOIN ap3 ap ON m.word = ap.word AND m.pos = ap.pos
        |  LEFT JOIN ap3 ab ON m.word = ab.word AND m.pos = ab.pos + 1
        |  WHERE ab.pos IS NULL GROUP BY m.word, m.wc),
        |p4 AS (SELECT word, wc, generate_subscripts(syms, 1) - 1 AS pos, unnest(syms) AS sym FROM d3),
        |n4 AS (SELECT word, wc, pos, sym, lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt FROM p4),
        |t4 AS MATERIALIZED (SELECT sym AS a, nxt AS b, CAST(sum(wc) AS BIGINT) AS n FROM n4 WHERE nxt IS NOT NULL
        |  GROUP BY sym, nxt ORDER BY n DESC, a ASC, b ASC LIMIT 1),
        |m4 AS MATERIALIZED (SELECT n4.*, t4.a, t4.b, (sym = a AND nxt = b) AS cand FROM n4 CROSS JOIN t4),
        |c4 AS (SELECT word, pos, pos - row_number() OVER (PARTITION BY word ORDER BY pos) AS grp FROM m4 WHERE cand),
        |ap4 AS MATERIALIZED (SELECT word, pos FROM (SELECT word, pos, min(pos) OVER (PARTITION BY word, grp) AS h FROM c4) WHERE (pos - h) % 2 = 0),
        |d4 AS MATERIALIZED (SELECT m.word, m.wc,
        |    list(CASE WHEN ap.pos IS NOT NULL THEN m.a || m.b ELSE m.sym END ORDER BY m.pos) AS syms
        |  FROM m4 m
        |  LEFT JOIN ap4 ap ON m.word = ap.word AND m.pos = ap.pos
        |  LEFT JOIN ap4 ab ON m.word = ab.word AND m.pos = ab.pos + 1
        |  WHERE ab.pos IS NULL GROUP BY m.word, m.wc),
        |p5 AS (SELECT word, wc, generate_subscripts(syms, 1) - 1 AS pos, unnest(syms) AS sym FROM d4),
        |n5 AS (SELECT word, wc, pos, sym, lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt FROM p5),
        |t5 AS MATERIALIZED (SELECT sym AS a, nxt AS b, CAST(sum(wc) AS BIGINT) AS n FROM n5 WHERE nxt IS NOT NULL
        |  GROUP BY sym, nxt ORDER BY n DESC, a ASC, b ASC LIMIT 1),
        |m5 AS MATERIALIZED (SELECT n5.*, t5.a, t5.b, (sym = a AND nxt = b) AS cand FROM n5 CROSS JOIN t5),
        |c5 AS (SELECT word, pos, pos - row_number() OVER (PARTITION BY word ORDER BY pos) AS grp FROM m5 WHERE cand),
        |ap5 AS MATERIALIZED (SELECT word, pos FROM (SELECT word, pos, min(pos) OVER (PARTITION BY word, grp) AS h FROM c5) WHERE (pos - h) % 2 = 0),
        |d5 AS MATERIALIZED (SELECT m.word, m.wc,
        |    list(CASE WHEN ap.pos IS NOT NULL THEN m.a || m.b ELSE m.sym END ORDER BY m.pos) AS syms
        |  FROM m5 m
        |  LEFT JOIN ap5 ap ON m.word = ap.word AND m.pos = ap.pos
        |  LEFT JOIN ap5 ab ON m.word = ab.word AND m.pos = ab.pos + 1
        |  WHERE ab.pos IS NULL GROUP BY m.word, m.wc),
        |p6 AS (SELECT word, wc, generate_subscripts(syms, 1) - 1 AS pos, unnest(syms) AS sym FROM d5),
        |n6 AS (SELECT word, wc, pos, sym, lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt FROM p6),
        |t6 AS MATERIALIZED (SELECT sym AS a, nxt AS b, CAST(sum(wc) AS BIGINT) AS n FROM n6 WHERE nxt IS NOT NULL
        |  GROUP BY sym, nxt ORDER BY n DESC, a ASC, b ASC LIMIT 1),
        |m6 AS MATERIALIZED (SELECT n6.*, t6.a, t6.b, (sym = a AND nxt = b) AS cand FROM n6 CROSS JOIN t6),
        |c6 AS (SELECT word, pos, pos - row_number() OVER (PARTITION BY word ORDER BY pos) AS grp FROM m6 WHERE cand),
        |ap6 AS MATERIALIZED (SELECT word, pos FROM (SELECT word, pos, min(pos) OVER (PARTITION BY word, grp) AS h FROM c6) WHERE (pos - h) % 2 = 0),
        |d6 AS MATERIALIZED (SELECT m.word, m.wc,
        |    list(CASE WHEN ap.pos IS NOT NULL THEN m.a || m.b ELSE m.sym END ORDER BY m.pos) AS syms
        |  FROM m6 m
        |  LEFT JOIN ap6 ap ON m.word = ap.word AND m.pos = ap.pos
        |  LEFT JOIN ap6 ab ON m.word = ab.word AND m.pos = ab.pos + 1
        |  WHERE ab.pos IS NULL GROUP BY m.word, m.wc)
        |SELECT CAST(1 AS BIGINT) AS merge_rank, a AS left_sym, b AS right_sym, a || b AS token, n AS n_occurrences FROM t1 UNION ALL SELECT CAST(2 AS BIGINT) AS merge_rank, a AS left_sym, b AS right_sym, a || b AS token, n AS n_occurrences FROM t2 UNION ALL SELECT CAST(3 AS BIGINT) AS merge_rank, a AS left_sym, b AS right_sym, a || b AS token, n AS n_occurrences FROM t3 UNION ALL SELECT CAST(4 AS BIGINT) AS merge_rank, a AS left_sym, b AS right_sym, a || b AS token, n AS n_occurrences FROM t4 UNION ALL SELECT CAST(5 AS BIGINT) AS merge_rank, a AS left_sym, b AS right_sym, a || b AS token, n AS n_occurrences FROM t5 UNION ALL SELECT CAST(6 AS BIGINT) AS merge_rank, a AS left_sym, b AS right_sym, a || b AS token, n AS n_occurrences FROM t6""".stripMargin,
    // llm_sessionize oracle: identical lag/cumsum session algebra in
    // epoch-us integers, decimal value sums
    "llm_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, value FROM events),
        |l AS (SELECT *, lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_us FROM e),
        |f AS (SELECT *, CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000 THEN 1 ELSE 0 END AS ns FROM l),
        |c AS (SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS session_seq FROM f)
        |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(min(ts_us) AS BIGINT) AS start_us,
        |  CAST(max(ts_us) AS BIGINT) AS end_us,
        |  CAST(max(ts_us) - min(ts_us) AS BIGINT) AS duration_us,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        |FROM c GROUP BY user_id, session_seq""".stripMargin,
    // llm_funnel oracle: identical chained min-after-strictly-after steps
    "llm_funnel" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_type FROM events),
        |s1 AS (SELECT user_id, CAST(min(ts_us) AS BIGINT) AS t1_us FROM e WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, CAST(min(ts_us) AS BIGINT) AS t2_us FROM e JOIN s1 ON e.user_id = s1.user_id
        |  WHERE event_type = 'click' AND ts_us > t1_us GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, CAST(min(ts_us) AS BIGINT) AS t3_us FROM e JOIN s2 ON e.user_id = s2.user_id
        |  WHERE event_type = 'purchase' AND ts_us > t2_us GROUP BY e.user_id)
        |SELECT s1.user_id, t1_us, t2_us, t3_us,
        |  CAST(CASE WHEN t3_us IS NOT NULL THEN 3 WHEN t2_us IS NOT NULL THEN 2 ELSE 1 END AS BIGINT) AS stage
        |FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
        |LEFT JOIN s3 ON s1.user_id = s3.user_id""".stripMargin,
    // llm_retention oracle: identical epoch-day cohort/offset counts
    "llm_retention" ->
      """WITH d AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
        |c AS (SELECT user_id, CAST(min(day) AS BIGINT) AS cohort_day FROM d GROUP BY user_id)
        |SELECT cohort_day, CAST(day - cohort_day AS BIGINT) AS day_offset,
        |  CAST(count(*) AS BIGINT) AS n_users
        |FROM d JOIN c ON d.user_id = c.user_id
        |GROUP BY cohort_day, day - cohort_day""".stripMargin,
    // llm_unicode_nfc oracle: identical salts built from chr() codepoints,
    // DuckDB's own nfc_normalize as the independent Unicode implementation
    "llm_unicode_nfc" ->
      """WITH s AS (SELECT doc_id, text ||
        |    CASE WHEN doc_id % 3 = 0 THEN ' cafe' || chr(769) || ' re' || chr(769) || 'sume' || chr(769) ELSE '' END ||
        |    CASE WHEN doc_id % 7 = 0 THEN ' A' || chr(778) || ' ngstro' || chr(776) || 'm' ELSE '' END AS t2
        |  FROM documents)
        |SELECT doc_id, CAST(length(t2) AS BIGINT) AS n_chars_before,
        |  CAST(length(nfc_normalize(t2)) AS BIGINT) AS n_chars_after,
        |  t2 <> nfc_normalize(t2) AS changed,
        |  nfc_normalize(t2) AS normalized
        |FROM s""".stripMargin,
    // llm_bpe_encode oracle: the same 6 materialized merge steps, final
    // dict state selected instead of the merge table
    "llm_bpe_encode" ->
      """WITH w0 AS (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents),
        |wf AS (SELECT word, CAST(count(*) AS BIGINT) AS wc FROM w0 WHERE len(word) > 1 GROUP BY word),
        |d0 AS MATERIALIZED (SELECT word, wc, list_transform(generate_series(1, len(word)), i -> word[i:i]) AS syms FROM wf),
        |p1 AS (SELECT word, wc, generate_subscripts(syms, 1) - 1 AS pos, unnest(syms) AS sym FROM d0),
        |n1 AS (SELECT word, wc, pos, sym, lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt FROM p1),
        |t1 AS MATERIALIZED (SELECT sym AS a, nxt AS b, CAST(sum(wc) AS BIGINT) AS n FROM n1 WHERE nxt IS NOT NULL
        |  GROUP BY sym, nxt ORDER BY n DESC, a ASC, b ASC LIMIT 1),
        |m1 AS MATERIALIZED (SELECT n1.*, t1.a, t1.b, (sym = a AND nxt = b) AS cand FROM n1 CROSS JOIN t1),
        |c1 AS (SELECT word, pos, pos - row_number() OVER (PARTITION BY word ORDER BY pos) AS grp FROM m1 WHERE cand),
        |ap1 AS MATERIALIZED (SELECT word, pos FROM (SELECT word, pos, min(pos) OVER (PARTITION BY word, grp) AS h FROM c1) WHERE (pos - h) % 2 = 0),
        |d1 AS MATERIALIZED (SELECT m.word, m.wc,
        |    list(CASE WHEN ap.pos IS NOT NULL THEN m.a || m.b ELSE m.sym END ORDER BY m.pos) AS syms
        |  FROM m1 m
        |  LEFT JOIN ap1 ap ON m.word = ap.word AND m.pos = ap.pos
        |  LEFT JOIN ap1 ab ON m.word = ab.word AND m.pos = ab.pos + 1
        |  WHERE ab.pos IS NULL GROUP BY m.word, m.wc),
        |p2 AS (SELECT word, wc, generate_subscripts(syms, 1) - 1 AS pos, unnest(syms) AS sym FROM d1),
        |n2 AS (SELECT word, wc, pos, sym, lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt FROM p2),
        |t2 AS MATERIALIZED (SELECT sym AS a, nxt AS b, CAST(sum(wc) AS BIGINT) AS n FROM n2 WHERE nxt IS NOT NULL
        |  GROUP BY sym, nxt ORDER BY n DESC, a ASC, b ASC LIMIT 1),
        |m2 AS MATERIALIZED (SELECT n2.*, t2.a, t2.b, (sym = a AND nxt = b) AS cand FROM n2 CROSS JOIN t2),
        |c2 AS (SELECT word, pos, pos - row_number() OVER (PARTITION BY word ORDER BY pos) AS grp FROM m2 WHERE cand),
        |ap2 AS MATERIALIZED (SELECT word, pos FROM (SELECT word, pos, min(pos) OVER (PARTITION BY word, grp) AS h FROM c2) WHERE (pos - h) % 2 = 0),
        |d2 AS MATERIALIZED (SELECT m.word, m.wc,
        |    list(CASE WHEN ap.pos IS NOT NULL THEN m.a || m.b ELSE m.sym END ORDER BY m.pos) AS syms
        |  FROM m2 m
        |  LEFT JOIN ap2 ap ON m.word = ap.word AND m.pos = ap.pos
        |  LEFT JOIN ap2 ab ON m.word = ab.word AND m.pos = ab.pos + 1
        |  WHERE ab.pos IS NULL GROUP BY m.word, m.wc),
        |p3 AS (SELECT word, wc, generate_subscripts(syms, 1) - 1 AS pos, unnest(syms) AS sym FROM d2),
        |n3 AS (SELECT word, wc, pos, sym, lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt FROM p3),
        |t3 AS MATERIALIZED (SELECT sym AS a, nxt AS b, CAST(sum(wc) AS BIGINT) AS n FROM n3 WHERE nxt IS NOT NULL
        |  GROUP BY sym, nxt ORDER BY n DESC, a ASC, b ASC LIMIT 1),
        |m3 AS MATERIALIZED (SELECT n3.*, t3.a, t3.b, (sym = a AND nxt = b) AS cand FROM n3 CROSS JOIN t3),
        |c3 AS (SELECT word, pos, pos - row_number() OVER (PARTITION BY word ORDER BY pos) AS grp FROM m3 WHERE cand),
        |ap3 AS MATERIALIZED (SELECT word, pos FROM (SELECT word, pos, min(pos) OVER (PARTITION BY word, grp) AS h FROM c3) WHERE (pos - h) % 2 = 0),
        |d3 AS MATERIALIZED (SELECT m.word, m.wc,
        |    list(CASE WHEN ap.pos IS NOT NULL THEN m.a || m.b ELSE m.sym END ORDER BY m.pos) AS syms
        |  FROM m3 m
        |  LEFT JOIN ap3 ap ON m.word = ap.word AND m.pos = ap.pos
        |  LEFT JOIN ap3 ab ON m.word = ab.word AND m.pos = ab.pos + 1
        |  WHERE ab.pos IS NULL GROUP BY m.word, m.wc),
        |p4 AS (SELECT word, wc, generate_subscripts(syms, 1) - 1 AS pos, unnest(syms) AS sym FROM d3),
        |n4 AS (SELECT word, wc, pos, sym, lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt FROM p4),
        |t4 AS MATERIALIZED (SELECT sym AS a, nxt AS b, CAST(sum(wc) AS BIGINT) AS n FROM n4 WHERE nxt IS NOT NULL
        |  GROUP BY sym, nxt ORDER BY n DESC, a ASC, b ASC LIMIT 1),
        |m4 AS MATERIALIZED (SELECT n4.*, t4.a, t4.b, (sym = a AND nxt = b) AS cand FROM n4 CROSS JOIN t4),
        |c4 AS (SELECT word, pos, pos - row_number() OVER (PARTITION BY word ORDER BY pos) AS grp FROM m4 WHERE cand),
        |ap4 AS MATERIALIZED (SELECT word, pos FROM (SELECT word, pos, min(pos) OVER (PARTITION BY word, grp) AS h FROM c4) WHERE (pos - h) % 2 = 0),
        |d4 AS MATERIALIZED (SELECT m.word, m.wc,
        |    list(CASE WHEN ap.pos IS NOT NULL THEN m.a || m.b ELSE m.sym END ORDER BY m.pos) AS syms
        |  FROM m4 m
        |  LEFT JOIN ap4 ap ON m.word = ap.word AND m.pos = ap.pos
        |  LEFT JOIN ap4 ab ON m.word = ab.word AND m.pos = ab.pos + 1
        |  WHERE ab.pos IS NULL GROUP BY m.word, m.wc),
        |p5 AS (SELECT word, wc, generate_subscripts(syms, 1) - 1 AS pos, unnest(syms) AS sym FROM d4),
        |n5 AS (SELECT word, wc, pos, sym, lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt FROM p5),
        |t5 AS MATERIALIZED (SELECT sym AS a, nxt AS b, CAST(sum(wc) AS BIGINT) AS n FROM n5 WHERE nxt IS NOT NULL
        |  GROUP BY sym, nxt ORDER BY n DESC, a ASC, b ASC LIMIT 1),
        |m5 AS MATERIALIZED (SELECT n5.*, t5.a, t5.b, (sym = a AND nxt = b) AS cand FROM n5 CROSS JOIN t5),
        |c5 AS (SELECT word, pos, pos - row_number() OVER (PARTITION BY word ORDER BY pos) AS grp FROM m5 WHERE cand),
        |ap5 AS MATERIALIZED (SELECT word, pos FROM (SELECT word, pos, min(pos) OVER (PARTITION BY word, grp) AS h FROM c5) WHERE (pos - h) % 2 = 0),
        |d5 AS MATERIALIZED (SELECT m.word, m.wc,
        |    list(CASE WHEN ap.pos IS NOT NULL THEN m.a || m.b ELSE m.sym END ORDER BY m.pos) AS syms
        |  FROM m5 m
        |  LEFT JOIN ap5 ap ON m.word = ap.word AND m.pos = ap.pos
        |  LEFT JOIN ap5 ab ON m.word = ab.word AND m.pos = ab.pos + 1
        |  WHERE ab.pos IS NULL GROUP BY m.word, m.wc),
        |p6 AS (SELECT word, wc, generate_subscripts(syms, 1) - 1 AS pos, unnest(syms) AS sym FROM d5),
        |n6 AS (SELECT word, wc, pos, sym, lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt FROM p6),
        |t6 AS MATERIALIZED (SELECT sym AS a, nxt AS b, CAST(sum(wc) AS BIGINT) AS n FROM n6 WHERE nxt IS NOT NULL
        |  GROUP BY sym, nxt ORDER BY n DESC, a ASC, b ASC LIMIT 1),
        |m6 AS MATERIALIZED (SELECT n6.*, t6.a, t6.b, (sym = a AND nxt = b) AS cand FROM n6 CROSS JOIN t6),
        |c6 AS (SELECT word, pos, pos - row_number() OVER (PARTITION BY word ORDER BY pos) AS grp FROM m6 WHERE cand),
        |ap6 AS MATERIALIZED (SELECT word, pos FROM (SELECT word, pos, min(pos) OVER (PARTITION BY word, grp) AS h FROM c6) WHERE (pos - h) % 2 = 0),
        |d6 AS MATERIALIZED (SELECT m.word, m.wc,
        |    list(CASE WHEN ap.pos IS NOT NULL THEN m.a || m.b ELSE m.sym END ORDER BY m.pos) AS syms
        |  FROM m6 m
        |  LEFT JOIN ap6 ap ON m.word = ap.word AND m.pos = ap.pos
        |  LEFT JOIN ap6 ab ON m.word = ab.word AND m.pos = ab.pos + 1
        |  WHERE ab.pos IS NULL GROUP BY m.word, m.wc)
        |SELECT word, wc, CAST(len(syms) AS BIGINT) AS n_tokens,
        |  array_to_string(syms, ' ') AS tokens FROM d6""".stripMargin,
    // llm_rag_pipeline oracle: chunk slices, the same h64(token:d)
    // hashing-trick projection, then the standard integer brute ranking
    "llm_rag_pipeline" ->
      """WITH w AS (SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> len(x) > 0) AS ws FROM documents),
        |st AS (SELECT doc_id, ws, unnest(CASE WHEN len(ws) < 1 THEN [] ELSE generate_series(0, len(ws) - 1, 24) END) AS start FROM w),
        |ch AS (SELECT doc_id * 1024 + (start // 24) AS cid, ws[start + 1:start + 32] AS cws FROM st),
        |e AS (SELECT cid, list_transform(generate_series(0, 15), d ->
        |    CAST(list_sum(list_transform(cws, w2 ->
        |      ((CAST(('0x' || substr(md5(w2), 1, 15)) AS BIGINT) % 1000000007)
        |        * (2 * d + 1) + 7919 * d) % 1000000007 % 2001 - 1000)) AS BIGINT)) AS vq
        |  FROM ch),
        |en AS (SELECT cid, vq, CAST(list_sum(list_transform(vq, x -> x * x)) AS BIGINT) AS norm2 FROM e),
        |q AS (SELECT cid AS qid, vq AS qv, norm2 AS qn FROM en WHERE cid % (1024 * 173) = 0 AND norm2 > 0),
        |c AS (SELECT cid AS nid, vq AS nv, norm2 AS nn FROM en WHERE norm2 > 0),
        |scored AS (SELECT qid, nid,
        |    CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * nv[i])) AS BIGINT) AS dp,
        |    qn, nn
        |  FROM c CROSS JOIN q WHERE nid <> qid),
        |ranked AS (SELECT qid, nid,
        |    CAST(dp AS DOUBLE) / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(nn AS DOUBLE))) AS cos,
        |    row_number() OVER (PARTITION BY qid ORDER BY
        |      CAST(dp AS DOUBLE) / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(nn AS DOUBLE))) DESC,
        |      nid ASC) AS rank
        |  FROM scored)
        |SELECT qid, CAST(rank AS BIGINT) AS rank, nid, cos FROM ranked WHERE rank <= 3""".stripMargin,
    // llm_bm25 oracle: identical rational-idf BM25 with the SAME IEEE op
    // sequence (left-assoc multiplies, each division written once) and
    // the same micro-quantize-then-integer-sum, so scores are bit-exact
    "llm_bm25" ->
      """WITH w AS (SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> len(x) > 0) AS ws FROM documents),
        |tok AS (SELECT doc_id AS nid, unnest(ws) AS word FROM w),
        |dl AS (SELECT doc_id AS nid, CAST(len(ws) AS BIGINT) AS dl FROM w WHERE len(ws) > 0),
        |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS total_tokens FROM dl),
        |qt AS (SELECT DISTINCT query_id, word FROM
        |  (SELECT doc_id AS query_id, unnest(ws[1:5]) AS word FROM w WHERE doc_id % 97 = 0)),
        |qw AS (SELECT DISTINCT word FROM qt),
        |m AS (SELECT nid, tok.word FROM tok JOIN qw ON tok.word = qw.word),
        |tf AS (SELECT nid, word, CAST(count(*) AS BIGINT) AS tf FROM m GROUP BY nid, word),
        |dfq AS (SELECT word, CAST(count(*) AS BIGINT) AS df FROM (SELECT DISTINCT nid, word FROM m) GROUP BY word),
        |terms AS (SELECT qt.query_id, tf.nid, tf.tf, dfq.df, dl.dl, stats.n_docs, stats.total_tokens
        |  FROM tf JOIN dfq USING (word) JOIN dl USING (nid) CROSS JOIN stats JOIN qt ON tf.word = qt.word
        |  WHERE tf.nid <> qt.query_id),
        |sc AS (SELECT query_id, nid,
        |    CAST(floor(((CAST(n_docs - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
        |      * ((CAST(tf AS DOUBLE) * (1.2 + 1.0)) / (CAST(tf AS DOUBLE) + 1.2 * ((1.0 - 0.75) + 0.75 * (CAST(dl AS DOUBLE) / (CAST(total_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE))))))
        |      * 1000000.0) AS BIGINT) AS term_micro
        |  FROM terms),
        |agg AS (SELECT query_id, nid, CAST(sum(term_micro) AS BIGINT) AS score_micro FROM sc GROUP BY query_id, nid),
        |r AS (SELECT query_id, nid, score_micro,
        |    row_number() OVER (PARTITION BY query_id ORDER BY score_micro DESC, nid ASC) AS rank FROM agg)
        |SELECT query_id, CAST(rank AS BIGINT) AS rank, nid AS doc_id, score_micro
        |FROM r WHERE rank <= 5""".stripMargin,
    // llm_hybrid_search oracle: brute dense top-10 (llm_ann_topk shape)
    // + BM25 top-10 over the shared query set, fused by pure-integer RRF
    "llm_hybrid_search" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS vq FROM embeddings),
        |en AS (SELECT vec_id, vq, CAST(list_sum(list_transform(vq, x -> x * x)) AS BIGINT) AS norm2 FROM e),
        |q AS (SELECT vec_id AS qid, vq AS qv, norm2 AS qn FROM en WHERE vec_id % 50 = 0),
        |c AS (SELECT vec_id AS nid, vq AS nv, norm2 AS nn FROM en),
        |scored AS (SELECT qid, nid,
        |    CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * nv[i])) AS BIGINT) AS dp,
        |    qn, nn
        |  FROM c CROSS JOIN q WHERE nid <> qid),
        |dense AS (SELECT qid, nid, rank FROM (SELECT qid, nid,
        |    row_number() OVER (PARTITION BY qid ORDER BY
        |      CAST(dp AS DOUBLE) / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(nn AS DOUBLE))) DESC,
        |      nid ASC) AS rank
        |  FROM scored) WHERE rank <= 10),
        |w AS (SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> len(x) > 0) AS ws FROM documents),
        |tok AS (SELECT doc_id AS nid, unnest(ws) AS word FROM w),
        |dl AS (SELECT doc_id AS nid, CAST(len(ws) AS BIGINT) AS dl FROM w WHERE len(ws) > 0),
        |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS total_tokens FROM dl),
        |qt AS (SELECT DISTINCT query_id, word FROM
        |  (SELECT doc_id AS query_id, unnest(ws[1:5]) AS word FROM w WHERE doc_id % 50 = 0)),
        |qw AS (SELECT DISTINCT word FROM qt),
        |m AS (SELECT nid, tok.word FROM tok JOIN qw ON tok.word = qw.word),
        |tf AS (SELECT nid, word, CAST(count(*) AS BIGINT) AS tf FROM m GROUP BY nid, word),
        |dfq AS (SELECT word, CAST(count(*) AS BIGINT) AS df FROM (SELECT DISTINCT nid, word FROM m) GROUP BY word),
        |terms AS (SELECT qt.query_id, tf.nid, tf.tf, dfq.df, dl.dl, stats.n_docs, stats.total_tokens
        |  FROM tf JOIN dfq USING (word) JOIN dl USING (nid) CROSS JOIN stats JOIN qt ON tf.word = qt.word
        |  WHERE tf.nid <> qt.query_id),
        |sc2 AS (SELECT query_id, nid,
        |    CAST(floor(((CAST(n_docs - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
        |      * ((CAST(tf AS DOUBLE) * (1.2 + 1.0)) / (CAST(tf AS DOUBLE) + 1.2 * ((1.0 - 0.75) + 0.75 * (CAST(dl AS DOUBLE) / (CAST(total_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE))))))
        |      * 1000000.0) AS BIGINT) AS term_micro
        |  FROM terms),
        |agg AS (SELECT query_id, nid, CAST(sum(term_micro) AS BIGINT) AS score_micro FROM sc2 GROUP BY query_id, nid),
        |sparse AS (SELECT query_id AS qid, nid, rank FROM (SELECT query_id, nid,
        |    row_number() OVER (PARTITION BY query_id ORDER BY score_micro DESC, nid ASC) AS rank FROM agg)
        |  WHERE rank <= 10),
        |fused AS (SELECT coalesce(dense.qid, sparse.qid) AS query_id,
        |    coalesce(dense.nid, sparse.nid) AS nid,
        |    CAST(coalesce(1000000 // (60 + dense.rank), 0)
        |      + coalesce(1000000 // (60 + sparse.rank), 0) AS BIGINT) AS rrf_micro
        |  FROM dense FULL OUTER JOIN sparse
        |    ON dense.qid = sparse.qid AND dense.nid = sparse.nid),
        |r AS (SELECT query_id, nid, rrf_micro,
        |    row_number() OVER (PARTITION BY query_id ORDER BY rrf_micro DESC, nid ASC) AS rank FROM fused)
        |SELECT query_id, CAST(rank AS BIGINT) AS rank, nid AS doc_id, rrf_micro
        |FROM r WHERE rank <= 5""".stripMargin,
    // llm_ngram_lm oracle: same add-one-smoothed bigram training, same
    // one-division-one-multiply-one-floor per token, same integer means
    "llm_ngram_lm" ->
      """WITH w AS (SELECT doc_id AS id, list_filter(string_split(lower(text), ' '), x -> len(x) > 0) AS ws FROM documents),
        |bgidx AS (SELECT id, ws, unnest(generate_series(1, len(ws) - 1)) AS i FROM w WHERE len(ws) >= 2),
        |bg AS (SELECT id, ws[i] AS w1, ws[i + 1] AS w2 FROM bgidx),
        |c2 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2 FROM bg GROUP BY w1, w2),
        |c1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM bg GROUP BY w1),
        |v AS (SELECT CAST(count(DISTINCT word) AS BIGINT) AS v FROM (SELECT unnest(ws) AS word FROM w)),
        |sc AS (SELECT bg.id,
        |    CAST(floor((CAST(c2.c2 + 1 AS DOUBLE) / CAST(c1.c1 + v.v AS DOUBLE)) * 1000000000.0) AS BIGINT) AS ppb
        |  FROM bg JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v),
        |pd AS (SELECT id, CAST(count(*) AS BIGINT) AS n_bigrams, CAST(sum(ppb) AS BIGINT) AS sum_ppb FROM sc GROUP BY id),
        |pd2 AS (SELECT id, n_bigrams, CAST(sum_ppb // n_bigrams AS BIGINT) AS mean_prob_ppb FROM pd),
        |cm AS (SELECT CAST(sum(sum_ppb) // sum(n_bigrams) AS BIGINT) AS corpus_mean FROM pd)
        |SELECT id AS doc_id, n_bigrams, mean_prob_ppb,
        |  CASE WHEN mean_prob_ppb >= corpus_mean THEN 'head' ELSE 'tail' END AS bucket
        |FROM pd2 CROSS JOIN cm""".stripMargin,
    // llm_domain_budget oracle: the naive per-source running-sum window
    // the bucketed per-group decomposition must reproduce exactly
    "llm_domain_budget" ->
      """WITH h AS (SELECT source, doc_id,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hh,
        |    CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens FROM documents),
        |b AS (SELECT DISTINCT source,
        |    400 + (CAST(substr(source, 4) AS BIGINT) % 3) * 300 AS budget FROM documents),
        |c AS (SELECT source, doc_id, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY source ORDER BY hh, doc_id ROWS UNBOUNDED PRECEDING) AS cum FROM h)
        |SELECT c.source, doc_id, n_tokens, CAST(cum AS BIGINT) AS cum_tokens,
        |  cum - n_tokens < budget AS keep
        |FROM c JOIN b ON c.source = b.source""".stripMargin,
    // llm_rolling_dedup oracle: a FULL re-cluster of the unioned corpus —
    // the incremental path must reproduce it exactly (same pair set: LSH
    // candidates depend only on per-doc signatures, so old-old, new-old
    // and new-new pairs partition the full run's pairs)
    "llm_rolling_dedup" ->
      """WITH RECURSIVE w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
        |sh AS (SELECT doc_id, CASE WHEN len(ws) < 3 THEN CAST([] AS VARCHAR[])
        |  ELSE list_distinct(list_transform(generate_series(1, len(ws)-2),
        |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) END AS shingles FROM w),
        |hs AS (SELECT doc_id, shingles,
        |  list_transform(shingles, s -> CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)) AS shash
        |  FROM sh WHERE len(shingles) > 0),
        |sig AS (SELECT doc_id, shingles, list_transform(generate_series(0, 31), i ->
        |  list_min(list_transform(shash, h ->
        |    ((CAST(('0x' || substr(md5('a' || CAST(i AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000006 + 1)
        |      * (h % 1000000007)
        |     + CAST(('0x' || substr(md5('b' || CAST(i AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000007) % 1000000007))) AS sig
        |  FROM hs),
        |bands AS (SELECT doc_id, shingles, b AS band_id,
        |  md5(array_to_string(sig[b*4+1 : b*4+4], ',')) AS band_key
        |  FROM sig, (SELECT unnest(generate_series(0, 7)) AS b)),
        |cand AS (SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
        |    CAST(len(list_intersect(a.shingles, c.shingles)) AS DOUBLE)
        |      / len(list_distinct(list_concat(a.shingles, c.shingles))) AS jaccard
        |  FROM bands a JOIN bands c
        |    ON a.band_id = c.band_id AND a.band_key = c.band_key AND a.doc_id < c.doc_id),
        |pairs AS (SELECT id_a, id_b FROM cand WHERE jaccard >= 0.5),
        |edges AS (SELECT id_a AS u, id_b AS v FROM pairs UNION SELECT id_b, id_a FROM pairs),
        |reach(id, r) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT e.u, reach.r FROM edges e JOIN reach ON reach.id = e.v),
        |comp AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id)
        |SELECT doc_id, cluster_id, doc_id % 5 = 0 AS is_new FROM comp""".stripMargin,
    "s2b_stream_state" ->
      """WITH r AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn FROM events)
        |SELECT user_id, ts_us AS first_ts, event_id AS first_event_id, event_type AS first_event_type
        |FROM r WHERE rn = 1""".stripMargin,
    // llm_semantic_dedup oracle: replays the llm_ann_ivf k-means training
    // (identical CTE chain), pairs within cells by exact integer cosine,
    // closes components with the recursive-CTE reach
    "llm_semantic_dedup" ->
      """WITH RECURSIVE e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS vq FROM embeddings),
        |en AS (SELECT vec_id, vq, CAST(list_sum(list_transform(vq, x -> x * x)) AS BIGINT) AS norm2 FROM e),
        |cent0 AS (SELECT vec_id AS cid, vq AS cv, norm2 AS cn FROM en WHERE vec_id % 25 = 0),
        |a1 AS (SELECT en.vec_id, cent0.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en CROSS JOIN cent0),
        |r1 AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM a1),
        |asg1 AS (SELECT vec_id AS nid, cid AS cell FROM r1 WHERE rn = 1),
        |u1 AS (SELECT asg1.cell, unnest(vq) AS v, generate_subscripts(vq, 1) AS d FROM en JOIN asg1 ON en.vec_id = asg1.nid),
        |m1 AS (SELECT cell, d, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS vc FROM u1 GROUP BY cell, d),
        |cent1 AS (SELECT cell AS cid, list(vc ORDER BY d) AS cv FROM m1 GROUP BY cell),
        |cent1n AS (SELECT cid, cv, CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn FROM cent1),
        |a2 AS (SELECT en.vec_id, cent1n.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en CROSS JOIN cent1n),
        |r2 AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM a2),
        |asg2 AS (SELECT vec_id AS nid, cid AS cell FROM r2 WHERE rn = 1),
        |u2 AS (SELECT asg2.cell, unnest(vq) AS v, generate_subscripts(vq, 1) AS d FROM en JOIN asg2 ON en.vec_id = asg2.nid),
        |m2 AS (SELECT cell, d, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS vc FROM u2 GROUP BY cell, d),
        |cent2 AS (SELECT cell AS cid, list(vc ORDER BY d) AS cv FROM m2 GROUP BY cell),
        |cent AS (SELECT cid, cv, CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn FROM cent2),
        |ascore AS (
        |  SELECT en.vec_id, cent.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en CROSS JOIN cent),
        |ranked_assign AS (
        |  SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn
        |  FROM ascore),
        |cells AS (SELECT vec_id AS nid, cid AS cell FROM ranked_assign WHERE rn = 1),
        |mem AS (SELECT en.vec_id AS nid, vq, norm2, cell FROM en JOIN cells ON en.vec_id = cells.nid),
        |pr AS (SELECT a.nid AS id_a, b.nid AS id_b
        |  FROM mem a JOIN mem b ON a.cell = b.cell AND a.nid < b.nid
        |  WHERE CAST(CAST(list_sum(list_transform(generate_series(1, len(a.vq)), i -> a.vq[i] * b.vq[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(a.norm2 AS DOUBLE)) * sqrt(CAST(b.norm2 AS DOUBLE))) >= 0.35),
        |edges AS (SELECT id_a AS u, id_b AS v FROM pr UNION SELECT id_b, id_a FROM pr),
        |reach(id, r) AS (
        |  SELECT vec_id, vec_id FROM embeddings
        |  UNION
        |  SELECT eg.u, reach.r FROM edges eg JOIN reach ON reach.id = eg.v),
        |comp AS (SELECT id AS vec_id, min(r) AS cluster_id FROM reach GROUP BY id),
        |sz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size FROM comp GROUP BY cluster_id)
        |SELECT comp.vec_id, comp.cluster_id, sz.cluster_size,
        |  comp.vec_id = comp.cluster_id AS is_canonical
        |FROM comp JOIN sz USING (cluster_id)""".stripMargin,
    // llm_span_dedup oracle: positional 8-gram keys re-derived via the
    // Σ-form of the dual-modulus rolling hash (per-word md5 → polynomial
    // combination with interpolated power tables — independent of the
    // engine's O(1) recurrence), then corpus document frequency and
    // gaps-and-islands runs. 1-based subscripts: only run LENGTHS are
    // compared, so the base offset cancels.
    "llm_span_dedup" ->
      s"""WITH s AS (SELECT doc_id, text
        |    || CASE WHEN doc_id % 5 = 0 THEN ' the quick brown fox jumps over the lazy dog again' ELSE '' END
        |    || CASE WHEN doc_id % 7 = 0 THEN ' all rights reserved this document is provided without any warranty' ELSE '' END AS t2
        |  FROM documents),
        |w AS (SELECT doc_id, string_split(lower(t2), ' ') AS ws FROM s),
        |wh AS (SELECT doc_id, list_transform(ws, x -> CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)) AS wh FROM w),
        |pw AS (SELECT [${plans.RollingGrams.powTable(plans.RollingGrams.B1, 8, plans.RollingGrams.P1).mkString(", ")}] AS pw1,
        |    [${plans.RollingGrams.powTable(plans.RollingGrams.B2, 8, plans.RollingGrams.P2).mkString(", ")}] AS pw2),
        |gl AS (SELECT doc_id, CASE WHEN len(wh) < 8 THEN CAST([] AS BIGINT[])
        |  ELSE list_transform(generate_series(1, len(wh)-7), i ->
        |    (list_sum(list_transform(generate_series(0, 7), j -> ((wh[i+j] % ${plans.RollingGrams.P1}) * pw1[j+1]) % ${plans.RollingGrams.P1})) % ${plans.RollingGrams.P1}) * ${plans.RollingGrams.P2}
        |  + (list_sum(list_transform(generate_series(0, 7), j -> ((wh[i+j] % ${plans.RollingGrams.P2}) * pw2[j+1]) % ${plans.RollingGrams.P2})) % ${plans.RollingGrams.P2})) END AS gs
        |  FROM wh CROSS JOIN pw),
        |g AS (SELECT doc_id, generate_subscripts(gs, 1) AS pos, unnest(gs) AS h FROM gl),
        |dupg AS (SELECT h FROM g GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
        |d AS (SELECT doc_id, pos FROM g SEMI JOIN dupg USING (h)),
        |runs AS (SELECT doc_id, pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp FROM d),
        |rl AS (SELECT doc_id, grp, count(*) AS rl FROM runs GROUP BY doc_id, grp),
        |st AS (SELECT doc_id, CAST(sum(rl) AS BIGINT) AS n_dup_spans,
        |    CAST(max(rl) AS BIGINT) AS max_dup_run FROM rl GROUP BY doc_id),
        |ns AS (SELECT doc_id, CAST(CASE WHEN len(ws) >= 8 THEN len(ws) - 7 ELSE 0 END AS BIGINT) AS n_spans FROM w)
        |SELECT ns.doc_id, ns.n_spans, coalesce(st.n_dup_spans, 0) AS n_dup_spans,
        |  coalesce(st.max_dup_run, 0) AS max_dup_run
        |FROM ns LEFT JOIN st ON ns.doc_id = st.doc_id""".stripMargin,
    "llm_split" ->
      """SELECT doc_id, source,
        |  CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 90 THEN 'train'
        |       WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 95 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents""".stripMargin,
    // llm_url_ops oracle: the same regex chain in the RE2 dialect (\1
    // backreference, 'g' flags) + the md5-hash domain ranking
    // llm_url_ops oracle: canonicalize chain + public-suffix-aware domain
    // (same embedded suffix subset — shared DATA, publicsuffix.org) + the
    // window-form cap; the engine's bounded top-k aggregate must agree on
    // the kept set, with NULL rank beyond the cap (the agg form doesn't
    // rank what it drops)
    "llm_url_ops" ->
      s"""WITH u AS (SELECT doc_id,
        |    'HTTPS://' || CASE WHEN doc_id % 11 = 0
        |      THEN 'WWW.Site' || CAST(doc_id % 3 AS VARCHAR) || '.CO.UK'
        |      ELSE 'WWW.Example' || CAST(doc_id % 7 AS VARCHAR) || '.COM' END
        |    || '/Path' || CAST(doc_id AS VARCHAR) ||
        |    '?utm_source=feed&id=' || CAST(doc_id % 30 AS VARCHAR) || '&fbclid=xyz#frag' AS url
        |  FROM documents),
        |p AS (SELECT doc_id, url, regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*', 0) AS pfx FROM u),
        |c1 AS (SELECT doc_id, lower(pfx) || substr(url, length(pfx) + 1) AS c FROM p),
        |c2 AS (SELECT doc_id, regexp_replace(c, '#.*$$', '') AS c FROM c1),
        |c3 AS (SELECT doc_id, regexp_replace(c, '([?&])(utm_[a-z]+|ref|fbclid|gclid)=[^&#]*', '\\1', 'g') AS c FROM c2),
        |c4 AS (SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(c, '&{2,}', '&', 'g'), '\\?&', '?'), '[?&]+$$', '') AS canon_url FROM c3),
        |hx AS (SELECT doc_id, canon_url,
        |    regexp_extract(canon_url, '^[a-z][a-z0-9+.-]*://([^/:?#]+)', 1) AS host,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hh
        |  FROM c4),
        |d AS (SELECT doc_id, canon_url, hh,
        |    CASE WHEN regexp_extract(host, '[^.]+\\.[^.]+$$', 0) IN (${llm.TextOps.MultiLabelSuffixes.map(x => s"'$x'").mkString(", ")})
        |           AND regexp_extract(host, '[^.]+\\.[^.]+\\.[^.]+$$', 0) != ''
        |      THEN regexp_extract(host, '[^.]+\\.[^.]+\\.[^.]+$$', 0)
        |      ELSE regexp_extract(host, '[^.]+\\.[^.]+$$', 0) END AS domain
        |  FROM hx),
        |r AS (SELECT doc_id, canon_url, domain,
        |    row_number() OVER (PARTITION BY domain ORDER BY hh, doc_id) AS rn FROM d)
        |SELECT doc_id, canon_url, domain,
        |  CASE WHEN rn <= 40 THEN CAST(rn AS BIGINT) END AS domain_rank,
        |  rn <= 40 AS kept
        |FROM r""".stripMargin,
    // llm_salted_join oracle: the PLAIN equi-join + grouped distinct-list.
    // The engine's salted join (+ two-phase salted collect_set) must be
    // row-identical — salting changes the physical distribution only.
    "llm_salted_join" ->
      """WITH big AS (SELECT doc_id,
        |    CASE WHEN doc_id % 10 < 8 THEN 'hot'
        |         ELSE 'cold' || CAST(doc_id % 10 AS VARCHAR) END AS skew_key
        |  FROM documents),
        |dim(skew_key, tier) AS (SELECT * FROM (VALUES
        |  ('hot', 'tier-a'), ('cold8', 'tier-b'), ('cold9', 'tier-c')) v(k, t)),
        |j AS (SELECT b.doc_id, b.skew_key, d.tier
        |  FROM big b JOIN dim d USING (skew_key))
        |SELECT skew_key, tier, CAST(count(*) AS BIGINT) AS n_docs,
        |  array_to_string(list_sort(list(DISTINCT doc_id % 100)), ',') AS buckets
        |FROM j GROUP BY skew_key, tier""".stripMargin,
    // llm_quantile_sketch oracle: replays the integer log-linear bucket
    // algebra (bitlen via length(bin(v)) — the HLL rank trick) and the
    // exact value-domain percentile it is audited against.
    "llm_quantile_sketch" ->
      """WITH v AS (SELECT CAST(length(text) AS BIGINT) AS v FROM documents),
        |hb AS (SELECT v, CAST(length(bin(v)) AS BIGINT) AS b FROM v WHERE v >= 1),
        |hist AS (SELECT b * 16 + (v * 16) // (1::BIGINT << (b - 1)) - 16 AS bucket_id,
        |    count(*) AS c FROM hb GROUP BY 1),
        |tot AS (SELECT sum(c) AS n FROM hist),
        |cum AS (SELECT bucket_id, sum(c) OVER (ORDER BY bucket_id) AS cum FROM hist),
        |qs AS (SELECT CAST(unnest([50, 90, 99]) AS BIGINT) AS q),
        |pick AS (SELECT q, min(bucket_id) AS bk
        |  FROM qs, cum, tot WHERE cum.cum * 100 >= q * tot.n GROUP BY q),
        |skv AS (SELECT q, (1::BIGINT << (bk // 16 - 1))
        |    + ((bk % 16) * (1::BIGINT << (bk // 16 - 1))) // 16 AS sketch_v FROM pick),
        |vh AS (SELECT v, count(*) AS c FROM v WHERE v >= 1 GROUP BY v),
        |vc AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum FROM vh),
        |ex AS (SELECT q, min(v) AS exact_v FROM qs, vc, tot
        |  WHERE vc.cum * 100 >= q * tot.n GROUP BY q)
        |SELECT s.q, s.sketch_v, e.exact_v,
        |  abs(s.sketch_v - e.exact_v) * 16 <= e.exact_v AS within_bound
        |FROM skv s JOIN ex e USING (q)""".stripMargin,
    // llm_weighted_quantile oracle: token-weighted bucket mass + the
    // token-weighted exact value-domain percentile.
    "llm_weighted_quantile" ->
      """WITH d AS (SELECT CAST(length(text) AS BIGINT) AS v,
        |    CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS tok FROM documents),
        |hb AS (SELECT v, tok, CAST(length(bin(v)) AS BIGINT) AS b FROM d WHERE v >= 1),
        |hist AS (SELECT b * 16 + (v * 16) // (1::BIGINT << (b - 1)) - 16 AS bucket_id,
        |    sum(tok) AS c FROM hb GROUP BY 1),
        |tot AS (SELECT sum(c) AS n FROM hist),
        |cum AS (SELECT bucket_id, sum(c) OVER (ORDER BY bucket_id) AS cum FROM hist),
        |qs AS (SELECT CAST(unnest([50, 90, 99]) AS BIGINT) AS q),
        |pick AS (SELECT q, min(bucket_id) AS bk
        |  FROM qs, cum, tot WHERE cum.cum * 100 >= q * tot.n GROUP BY q),
        |skv AS (SELECT q, (1::BIGINT << (bk // 16 - 1))
        |    + ((bk % 16) * (1::BIGINT << (bk // 16 - 1))) // 16 AS sketch_v FROM pick),
        |vh AS (SELECT v, sum(tok) AS c FROM d WHERE v >= 1 GROUP BY v),
        |vc AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum FROM vh),
        |ex AS (SELECT q, min(v) AS exact_v FROM qs, vc, tot
        |  WHERE vc.cum * 100 >= q * tot.n GROUP BY q)
        |SELECT s.q, s.sketch_v, e.exact_v,
        |  abs(s.sketch_v - e.exact_v) * 16 <= e.exact_v AS within_bound
        |FROM skv s JOIN ex e USING (q)""".stripMargin,
    // llm_winsorize oracle: same sketch-bound derivation (P1/P99 bucket
    // lower bounds) and clamp.
    "llm_winsorize" ->
      """WITH v AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS v FROM documents),
        |hb AS (SELECT v, CAST(length(bin(v)) AS BIGINT) AS b FROM v WHERE v >= 1),
        |hist AS (SELECT b * 16 + (v * 16) // (1::BIGINT << (b - 1)) - 16 AS bucket_id,
        |    count(*) AS c FROM hb GROUP BY 1),
        |tot AS (SELECT sum(c) AS n FROM hist),
        |cum AS (SELECT bucket_id, sum(c) OVER (ORDER BY bucket_id) AS cum FROM hist),
        |qs AS (SELECT CAST(unnest([1, 99]) AS BIGINT) AS q),
        |pick AS (SELECT q, min(bucket_id) AS bk
        |  FROM qs, cum, tot WHERE cum.cum * 100 >= q * tot.n GROUP BY q),
        |skv AS (SELECT q, (1::BIGINT << (bk // 16 - 1))
        |    + ((bk % 16) * (1::BIGINT << (bk // 16 - 1))) // 16 AS sketch_v FROM pick),
        |b AS (SELECT min(CASE WHEN q = 1 THEN sketch_v END) AS p1,
        |    min(CASE WHEN q = 99 THEN sketch_v END) AS p99 FROM skv)
        |SELECT doc_id, v, least(greatest(v, p1), p99) AS w,
        |  v < p1 OR v > p99 AS clamped
        |FROM v, b""".stripMargin,
    // llm_corpus_report oracle: native GROUP BY CUBE + GROUPING bitmask
    // (same first-column-is-MSB convention as Spark's grouping_id).
    "llm_corpus_report" ->
      """WITH d AS (SELECT CAST(length(text) AS BIGINT) // 128 AS len_class,
        |    CAST(doc_id % 4 AS BIGINT) AS shard,
        |    CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS tok FROM documents)
        |SELECT len_class, shard, CAST(grouping(len_class, shard) AS BIGINT) AS gid,
        |  CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(tok) AS BIGINT) AS n_tokens
        |FROM d GROUP BY CUBE (len_class, shard)""".stripMargin,
    // llm_zorder_layout oracle: bit-for-bit Morton interleave (scalar
    // subquery over 16 bit positions) and the same per-cell rectangle
    // audit — every 10-bit cell spans < 2048 in BOTH dimensions.
    "llm_zorder_layout" ->
      """WITH d AS (SELECT
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':dom'), 1, 15)) AS BIGINT) % 65536 AS x,
        |    least(CAST(length(text) AS BIGINT), 1023) * 64 + 32 AS y
        |  FROM documents),
        |z AS (SELECT x, y,
        |    (SELECT CAST(sum((((x >> i) & 1) << (2 * i)) + (((y >> i) & 1) << (2 * i + 1))) AS BIGINT)
        |     FROM unnest(generate_series(0, 15)) t(i)) AS zval
        |  FROM d)
        |SELECT zval >> 22 AS cell_id, CAST(count(*) AS BIGINT) AS n_rows,
        |  max(x) - min(x) AS x_span, max(y) - min(y) AS y_span,
        |  max(x) - min(x) < 2048 AND max(y) - min(y) < 2048 AS bounded
        |FROM z GROUP BY 1""".stripMargin,
    // llm_epoch_plan oracle: per-source token sums, the same basis-point
    // weights, and the integer epoch/planned/deficit arithmetic
    "llm_epoch_plan" ->
      """WITH s AS (SELECT source, CAST(sum(len(string_split(lower(text), ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY source),
        |w AS (SELECT source, n_tokens,
        |    100 + (CAST(substr(source, 4) AS BIGINT) % 5) * 50 AS weight_bp FROM s),
        |p AS (SELECT source, n_tokens, CAST(weight_bp AS BIGINT) AS weight_bp,
        |    (100000 * weight_bp) // 10000 AS target_tokens FROM w)
        |SELECT source, n_tokens, weight_bp, CAST(target_tokens AS BIGINT) AS target_tokens,
        |  CAST(CASE WHEN n_tokens = 0 THEN 0
        |       ELSE least(1000000, (target_tokens * 1000000) // n_tokens) END AS BIGINT) AS epochs_micro,
        |  CAST(least(target_tokens, (n_tokens * 1000000) // 1000000) AS BIGINT) AS planned_tokens,
        |  CAST(target_tokens - least(target_tokens, (n_tokens * 1000000) // 1000000) AS BIGINT) AS deficit
        |FROM p""".stripMargin,
    // llm_pack_efficiency oracle: both batch orders as plain global
    // row_numbers (what the two-level decomposition must equal), then
    // the per-batch padding rollup and the one-row-per-strategy summary
    "llm_pack_efficiency" ->
      """WITH d AS (SELECT doc_id AS id, CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens FROM documents),
        |rn AS (SELECT id, n_tokens,
        |    row_number() OVER (ORDER BY id) AS rn_naive,
        |    row_number() OVER (ORDER BY n_tokens, id) AS rn_sorted FROM d),
        |bn AS (SELECT (rn_naive - 1) // 16 AS b, count(*) AS rows_, max(n_tokens) AS mx, sum(n_tokens) AS tok FROM rn GROUP BY 1),
        |bs AS (SELECT (rn_sorted - 1) // 16 AS b, count(*) AS rows_, max(n_tokens) AS mx, sum(n_tokens) AS tok FROM rn GROUP BY 1),
        |an AS (SELECT CAST(count(*) AS BIGINT) AS n_batches, CAST(sum(tok) AS BIGINT) AS total_tokens,
        |    CAST(sum(rows_ * mx) AS BIGINT) AS padded_tokens FROM bn),
        |asx AS (SELECT CAST(count(*) AS BIGINT) AS n_batches, CAST(sum(tok) AS BIGINT) AS total_tokens,
        |    CAST(sum(rows_ * mx) AS BIGINT) AS padded_tokens FROM bs)
        |SELECT 'naive' AS strategy, n_batches, total_tokens, padded_tokens,
        |  padded_tokens - total_tokens AS waste,
        |  CASE WHEN padded_tokens = 0 THEN 0.0
        |       ELSE CAST(padded_tokens - total_tokens AS DOUBLE) / padded_tokens END AS waste_frac FROM an
        |UNION ALL
        |SELECT 'sorted' AS strategy, n_batches, total_tokens, padded_tokens,
        |  padded_tokens - total_tokens AS waste,
        |  CASE WHEN padded_tokens = 0 THEN 0.0
        |       ELSE CAST(padded_tokens - total_tokens AS DOUBLE) / padded_tokens END AS waste_frac FROM asx""".stripMargin,
    // llm_compaction_plan oracle: the same listing, the same fill rule,
    // as ONE global window cumsum (DuckDB's single node replays what the
    // two-level bucket decomposition must equal exactly)
    "llm_compaction_plan" ->
      """WITH f AS (SELECT CAST(substr(source, 4) AS BIGINT) * 1000 + doc_id // 100 AS fid,
        |    CAST(sum(n_chars) AS BIGINT) AS bytes
        |  FROM documents GROUP BY 1),
        |c AS (SELECT fid, bytes,
        |    CAST(sum(bytes) OVER (ORDER BY fid ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_bytes
        |  FROM f)
        |SELECT fid, bytes, cum_bytes, (cum_bytes - bytes) // 4096 AS bin FROM c""".stripMargin,
    // s2i_stream_quantile oracle: batch replay of the per-key log-linear
    // histogram + percentile pick + exact value-domain audit (streamed
    // buckets are bit-identical to batch by construction).
    "s2i_stream_quantile" ->
      """WITH e AS (SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS v
        |    FROM events WHERE floor(value * 100) >= 1),
        |hb AS (SELECT event_type, v, CAST(length(bin(v)) AS BIGINT) AS b FROM e),
        |hist AS (SELECT event_type, b * 16 + (v * 16) // (1::BIGINT << (b - 1)) - 16 AS bucket_id,
        |    count(*) AS c FROM hb GROUP BY 1, 2),
        |tot AS (SELECT event_type, sum(c) AS n FROM hist GROUP BY 1),
        |cum AS (SELECT event_type, bucket_id,
        |    sum(c) OVER (PARTITION BY event_type ORDER BY bucket_id) AS cum FROM hist),
        |qs AS (SELECT CAST(unnest([50, 95, 99]) AS BIGINT) AS q),
        |pick AS (SELECT c.event_type AS event_type, q, min(bucket_id) AS bk
        |  FROM qs, cum c JOIN tot t ON c.event_type = t.event_type
        |  WHERE c.cum * 100 >= q * t.n GROUP BY 1, 2),
        |skv AS (SELECT event_type, q, (1::BIGINT << (bk // 16 - 1))
        |    + ((bk % 16) * (1::BIGINT << (bk // 16 - 1))) // 16 AS sketch_v FROM pick),
        |vh AS (SELECT event_type, v, count(*) AS c FROM e GROUP BY 1, 2),
        |vc AS (SELECT event_type, v, sum(c) OVER (PARTITION BY event_type ORDER BY v) AS cum FROM vh),
        |ex AS (SELECT c.event_type AS event_type, q, min(v) AS exact_v
        |  FROM qs, vc c JOIN tot t ON c.event_type = t.event_type
        |  WHERE c.cum * 100 >= q * t.n GROUP BY 1, 2)
        |SELECT s.event_type AS event_type, s.q AS q, s.sketch_v, e2.exact_v,
        |  abs(s.sketch_v - e2.exact_v) * 16 <= e2.exact_v AS within_bound
        |FROM skv s JOIN ex e2 ON s.event_type = e2.event_type AND s.q = e2.q""".stripMargin,
    // llm_scd2_build oracle: identical lag-collapse + lead/row_number
    // windows (event_id tie-break carried through both).
    "llm_scd2_build" ->
      """WITH e AS (SELECT user_id, event_type AS state, epoch_us(ts) AS ts_us, event_id FROM events),
        |l AS (SELECT user_id, state, ts_us, event_id,
        |    lag(state) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_state
        |  FROM e),
        |ch AS (SELECT user_id, state, ts_us, event_id FROM l
        |  WHERE state IS DISTINCT FROM prev_state)
        |SELECT user_id, state, ts_us AS valid_from,
        |  lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS valid_to,
        |  CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS BIGINT) AS version_n
        |FROM ch""".stripMargin,
    // llm_interval_merge oracle: running-max island detection over the
    // same per-user 30-minute spans.
    "llm_interval_merge" ->
      """WITH iv AS (SELECT user_id, epoch_us(ts) AS lo, epoch_us(ts) + 1800000000 AS hi FROM events),
        |o AS (SELECT user_id, lo, hi,
        |    max(hi) OVER (PARTITION BY user_id ORDER BY lo, hi
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS max_prev_hi
        |  FROM iv),
        |f AS (SELECT user_id, lo, hi,
        |    CASE WHEN max_prev_hi IS NULL OR lo > max_prev_hi THEN 1 ELSE 0 END AS new_island
        |  FROM o),
        |g AS (SELECT user_id, lo, hi,
        |    sum(new_island) OVER (PARTITION BY user_id ORDER BY lo, hi
        |      ROWS UNBOUNDED PRECEDING) AS island
        |  FROM f)
        |SELECT user_id, CAST(island AS BIGINT) AS island, min(lo) AS lo, max(hi) AS hi,
        |  CAST(count(*) AS BIGINT) AS n_merged
        |FROM g GROUP BY user_id, island""".stripMargin,
    // llm_token_budget oracle: one GLOBAL running sum in hash order —
    // the engine's bucket decomposition must reproduce it exactly
    // (bucket = hh >> 50 is monotonic in hh, so per-bucket order
    // concatenates to this global order)
    "llm_token_budget" ->
      """WITH h AS (SELECT doc_id,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hh,
        |    CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens FROM documents),
        |c AS (SELECT doc_id, n_tokens,
        |    sum(n_tokens) OVER (ORDER BY hh, doc_id ROWS UNBOUNDED PRECEDING) AS cum FROM h)
        |SELECT doc_id, n_tokens, CAST(cum AS BIGINT) AS cum_tokens, cum - n_tokens < 10000 AS keep FROM c""".stripMargin,
    // llm_word_dropout oracle: same md5 position gate, string_agg skips
    // the dropped (NULL) words exactly as concat_ws does
    "llm_word_dropout" ->
      """WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
        |tk AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_words,
        |    generate_subscripts(ws, 1) - 1 AS wpos, unnest(ws) AS word FROM w),
        |k AS (SELECT doc_id, n_words, wpos, word,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':ep1:' || CAST(wpos AS VARCHAR)), 1, 15)) AS BIGINT) % 100 >= 15 AS keep
        |  FROM tk)
        |SELECT doc_id, n_words,
        |  CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped,
        |  coalesce(string_agg(CASE WHEN keep THEN word END, ' ' ORDER BY wpos), '') AS augmented_text
        |FROM k GROUP BY doc_id, n_words""".stripMargin,
    "llm_text_normalize" ->
      """WITH s AS (SELECT doc_id, text ||
        |    CASE WHEN doc_id % 4 = 0 THEN '  visit   https://example.com/page' || CAST(doc_id % 50 AS VARCHAR) || '?ref=rss  now' ELSE '' END ||
        |    CASE WHEN doc_id % 9 = 0 THEN chr(9) || 'tabbed' || chr(13) || 'tail' ELSE '' END AS t2
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(t2, 'https?://[^ ]+')) AS BIGINT) AS n_urls,
        |  trim(regexp_replace(regexp_replace(regexp_replace(t2,
        |    'https?://[^ ]+', '<URL>', 'g'), '[\t\r]', ' ', 'g'), ' {2,}', ' ', 'g')) AS normalized_text
        |FROM s""".stripMargin,
    // llm_span_scrub oracle: span_dedup gram chain + first-occurrence
    // canonicalization, coverage expansion, per-doc text rebuild
    "llm_span_scrub" ->
      s"""WITH s AS (SELECT doc_id, text
        |    || CASE WHEN doc_id % 5 = 0 THEN ' the quick brown fox jumps over the lazy dog again' ELSE '' END
        |    || CASE WHEN doc_id % 7 = 0 THEN ' all rights reserved this document is provided without any warranty' ELSE '' END AS t2
        |  FROM documents),
        |w AS (SELECT doc_id, string_split(lower(t2), ' ') AS ws FROM s),
        |wh AS (SELECT doc_id, list_transform(ws, x -> CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)) AS wh FROM w),
        |pw AS (SELECT [${plans.RollingGrams.powTable(plans.RollingGrams.B1, 8, plans.RollingGrams.P1).mkString(", ")}] AS pw1,
        |    [${plans.RollingGrams.powTable(plans.RollingGrams.B2, 8, plans.RollingGrams.P2).mkString(", ")}] AS pw2),
        |gl AS (SELECT doc_id, CASE WHEN len(wh) < 8 THEN CAST([] AS BIGINT[])
        |  ELSE list_transform(generate_series(1, len(wh)-7), i ->
        |    (list_sum(list_transform(generate_series(0, 7), j -> ((wh[i+j] % ${plans.RollingGrams.P1}) * pw1[j+1]) % ${plans.RollingGrams.P1})) % ${plans.RollingGrams.P1}) * ${plans.RollingGrams.P2}
        |  + (list_sum(list_transform(generate_series(0, 7), j -> ((wh[i+j] % ${plans.RollingGrams.P2}) * pw2[j+1]) % ${plans.RollingGrams.P2})) % ${plans.RollingGrams.P2})) END AS gs
        |  FROM wh CROSS JOIN pw),
        |g AS (SELECT doc_id, generate_subscripts(gs, 1) AS pos, unnest(gs) AS h FROM gl),
        |dupg AS (SELECT h FROM g GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
        |occ AS (SELECT doc_id, pos, h FROM g SEMI JOIN dupg USING (h)),
        |rkd AS (SELECT doc_id, pos, row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn FROM occ),
        |removed AS (SELECT doc_id, pos FROM rkd WHERE rn > 1),
        |covered AS (SELECT DISTINCT doc_id, unnest(generate_series(pos, pos + 7)) AS wpos FROM removed),
        |wordpos AS (SELECT doc_id, generate_subscripts(ws, 1) AS wpos, unnest(ws) AS word FROM w),
        |kept AS (SELECT wordpos.doc_id, CAST(count(*) AS BIGINT) AS nk,
        |    array_to_string(list(word ORDER BY wpos), ' ') AS cleaned
        |  FROM wordpos ANTI JOIN covered USING (doc_id, wpos) GROUP BY wordpos.doc_id),
        |nw AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_words FROM w)
        |SELECT nw.doc_id, nw.n_words,
        |  nw.n_words - coalesce(kept.nk, 0) AS n_removed_words,
        |  coalesce(kept.cleaned, '') AS cleaned_text
        |FROM nw LEFT JOIN kept ON nw.doc_id = kept.doc_id""".stripMargin,
    "llm_tfidf_terms" ->
      """WITH tok AS (SELECT doc_id AS id, unnest(string_split(lower(text), ' ')) AS word FROM documents),
        |tok2 AS (SELECT id, word FROM tok WHERE len(word) > 0),
        |tf AS (SELECT id, word, CAST(count(*) AS BIGINT) AS tf FROM tok2 GROUP BY id, word),
        |dfq AS (SELECT word, CAST(count(*) AS BIGINT) AS df FROM (SELECT DISTINCT id, word FROM tok2) GROUP BY word),
        |n AS (SELECT count(*) AS nn FROM documents),
        |sc AS (SELECT id, word, tf, df, CAST(tf * nn AS DOUBLE) / df AS score
        |  FROM tf JOIN dfq USING (word) CROSS JOIN n),
        |r AS (SELECT id, word, tf, df, score,
        |    row_number() OVER (PARTITION BY id ORDER BY score DESC, word ASC) AS rank FROM sc)
        |SELECT id AS doc_id, CAST(rank AS BIGINT) AS rank, word, tf, df, score
        |FROM r WHERE rank <= 3""".stripMargin,
    // llm_pq_encode oracle: BOTH subspace codebooks replayed in one CTE
    // chain over a `sub` dimension (training math is independent per
    // subspace, so partitioned training ≡ separate trainings), then the
    // code join and exact reconstruction cosine
    "llm_pq_encode" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS fq FROM embeddings),
        |fn AS (SELECT vec_id, CAST(list_sum(list_transform(fq, x -> x * x)) AS BIGINT) AS fnorm FROM e),
        |hv AS (SELECT vec_id, 0 AS sub, fq[1:len(fq)//2] AS vq FROM e
        |  UNION ALL SELECT vec_id, 1 AS sub, fq[len(fq)//2+1:len(fq)] AS vq FROM e),
        |en AS (SELECT vec_id, sub, vq, CAST(list_sum(list_transform(vq, x -> x * x)) AS BIGINT) AS norm2 FROM hv),
        |cent0 AS (SELECT sub, vec_id AS cid, vq AS cv, norm2 AS cn FROM en WHERE vec_id % 25 = 0),
        |a1 AS (SELECT en.vec_id, en.sub, cent0.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en JOIN cent0 ON en.sub = cent0.sub),
        |r1 AS (SELECT vec_id, sub, cid, row_number() OVER (PARTITION BY sub, vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM a1),
        |asg1 AS (SELECT vec_id AS nid, sub, cid AS cell FROM r1 WHERE rn = 1),
        |u1 AS (SELECT asg1.sub, asg1.cell, unnest(vq) AS v, generate_subscripts(vq, 1) AS d
        |  FROM en JOIN asg1 ON en.vec_id = asg1.nid AND en.sub = asg1.sub),
        |m1 AS (SELECT sub, cell, d, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS vc FROM u1 GROUP BY sub, cell, d),
        |cent1 AS (SELECT sub, cell AS cid, list(vc ORDER BY d) AS cv FROM m1 GROUP BY sub, cell),
        |cent1n AS (SELECT sub, cid, cv, CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn FROM cent1),
        |a2 AS (SELECT en.vec_id, en.sub, cent1n.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en JOIN cent1n ON en.sub = cent1n.sub),
        |r2 AS (SELECT vec_id, sub, cid, row_number() OVER (PARTITION BY sub, vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM a2),
        |asg2 AS (SELECT vec_id AS nid, sub, cid AS cell FROM r2 WHERE rn = 1),
        |u2 AS (SELECT asg2.sub, asg2.cell, unnest(vq) AS v, generate_subscripts(vq, 1) AS d
        |  FROM en JOIN asg2 ON en.vec_id = asg2.nid AND en.sub = asg2.sub),
        |m2 AS (SELECT sub, cell, d, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS vc FROM u2 GROUP BY sub, cell, d),
        |cent2 AS (SELECT sub, cell AS cid, list(vc ORDER BY d) AS cv FROM m2 GROUP BY sub, cell),
        |cent AS (SELECT sub, cid, cv, CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn FROM cent2),
        |af AS (SELECT en.vec_id, en.sub, cent.cid, cent.cn,
        |    CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS dpv,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en JOIN cent ON en.sub = cent.sub),
        |rf AS (SELECT vec_id, sub, cid, cn, dpv,
        |    row_number() OVER (PARTITION BY sub, vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM af),
        |sel AS (SELECT vec_id, sub, cid, cn, dpv FROM rf WHERE rn = 1),
        |p AS (SELECT s0.vec_id, s0.cid AS code0, s1.cid AS code1,
        |    s0.dpv + s1.dpv AS dp, s0.cn + s1.cn AS cnsum
        |  FROM sel s0 JOIN sel s1 ON s0.vec_id = s1.vec_id AND s0.sub = 0 AND s1.sub = 1)
        |SELECT p.vec_id, p.code0, p.code1,
        |  CAST(p.dp AS DOUBLE) / (sqrt(CAST(fn.fnorm AS DOUBLE)) * sqrt(CAST(p.cnsum AS DOUBLE))) AS recon_cos
        |FROM p JOIN fn ON p.vec_id = fn.vec_id""".stripMargin,
    // llm_index_update oracle: the pq_encode chain with training
    // restricted to the BASE corpus (vec_id % 7 <> 0, seeds likewise) and
    // the final encode restricted to the NEW batch (vec_id % 7 = 0) — the
    // out-of-sample encode the standing-index update runs
    // llm_sq_update oracle: bounds trained over the base slice only
    // (vec_id % 7 <> 0), the held-out batch encoded against them with
    // saturation — greatest/least clamp makes the floor-vs-truncate
    // division difference moot on out-of-range values (both land <= 0
    // or >= 255 before the clamp)
    "llm_sq_update" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS vq FROM embeddings),
        |u AS (SELECT vec_id, unnest(vq) AS v, generate_subscripts(vq, 1) - 1 AS j FROM e WHERE vec_id % 7 <> 0),
        |b AS (SELECT j, min(v) AS mn, max(v) AS mx FROM u GROUP BY 1),
        |t AS (SELECT vec_id, unnest(vq) AS v, generate_subscripts(vq, 1) - 1 AS j FROM e WHERE vec_id % 7 = 0)
        |SELECT t.vec_id, CAST(t.j AS BIGINT) AS pos,
        |  CAST(CASE WHEN b.mx = b.mn THEN 0
        |       ELSE greatest(0, least(255, ((t.v - b.mn) * 255) // (b.mx - b.mn)))
        |  END AS BIGINT) AS code
        |FROM t JOIN b ON b.j = t.j""".stripMargin,
    // llm_importance_weights oracle: the full DSIR-style pipeline
    // re-derived relationally — md5-bucket census, Laplace-smoothed
    // bit-resolution llr (length(bin(n)) - 1 = floor log2, identical in
    // both engines), per-doc summed weight
    "llm_importance_weights" ->
      (importanceSqlCtes + """
        |SELECT g.doc_id, CAST(sum(g.c) AS BIGINT) AS n_tokens,
        |  CAST(sum(g.c * llr.llr) AS BIGINT) AS imp_bits
        |FROM g JOIN llr ON llr.b = g.b GROUP BY 1""".stripMargin),
    // llm_importance_bigram oracle: the unigram chain PLUS adjacent-pair
    // bigrams over the filtered token sequence (lead() per doc), then the
    // same census → smoothed bit-resolution llr → per-doc fold
    "llm_importance_bigram" ->
      """WITH t0 AS (SELECT doc_id, lang = 'en' AS tgt,
        |    list_filter(string_split(lower(text), ' '), w -> len(w) > 0) AS ws FROM documents),
        |tk AS (SELECT doc_id, tgt, unnest(ws) AS w, generate_subscripts(ws, 1) AS p FROM t0),
        |bg AS (SELECT doc_id, tgt,
        |    w || ' ' || lead(w) OVER (PARTITION BY doc_id ORDER BY p) AS w FROM tk),
        |feat AS (SELECT doc_id, tgt, w FROM tk
        |  UNION ALL SELECT doc_id, tgt, w FROM bg WHERE w IS NOT NULL),
        |g AS (SELECT doc_id, tgt, CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT) % 1024 AS b, count(*) AS c
        |      FROM feat GROUP BY 1, 2, 3),
        |cen AS (SELECT b, sum(CASE WHEN tgt THEN c ELSE 0 END) AS tgt_c,
        |               sum(CASE WHEN tgt THEN 0 ELSE c END) AS raw_c
        |        FROM g GROUP BY 1),
        |tot AS (SELECT sum(tgt_c) AS rt, sum(raw_c) AS rr FROM cen),
        |llr AS (SELECT b,
        |    (length(bin(CAST((tgt_c + 1) * (rr + 1024) AS BIGINT))) - 1)
        |  - (length(bin(CAST((raw_c + 1) * (rt + 1024) AS BIGINT))) - 1) AS llr
        |  FROM cen CROSS JOIN tot)
        |SELECT g.doc_id, CAST(sum(g.c) AS BIGINT) AS n_tokens,
        |  CAST(sum(g.c * llr.llr) AS BIGINT) AS imp_bits
        |FROM g JOIN llr ON llr.b = g.b GROUP BY 1""".stripMargin,
    // llm_importance_cut oracle: the importance pipeline + the k-th
    // largest threshold law (cum >= ceil(n*pct/100) over the desc
    // cumulative histogram — same chain as llm_quality_cut)
    "llm_importance_cut" ->
      (importanceSqlCtes + """,
        |s AS (SELECT g.doc_id, CAST(sum(g.c * llr.llr) * 1000000 AS BIGINT) AS score_micro
        |  FROM g JOIN llr ON llr.b = g.b GROUP BY 1),
        |h AS (SELECT score_micro, CAST(count(*) AS BIGINT) AS c FROM s GROUP BY score_micro),
        |n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM h),
        |cum AS (SELECT score_micro, sum(c) OVER (ORDER BY score_micro DESC ROWS UNBOUNDED PRECEDING) AS cum FROM h),
        |th AS (SELECT max(score_micro) AS threshold FROM cum CROSS JOIN n WHERE cum >= (n * 10 + 99) // 100)
        |SELECT doc_id, score_micro, threshold, score_micro >= threshold AS keep
        |FROM s CROSS JOIN th""".stripMargin),
    "llm_index_update" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS fq FROM embeddings),
        |fn AS (SELECT vec_id, CAST(list_sum(list_transform(fq, x -> x * x)) AS BIGINT) AS fnorm FROM e),
        |hv AS (SELECT vec_id, 0 AS sub, fq[1:len(fq)//2] AS vq FROM e
        |  UNION ALL SELECT vec_id, 1 AS sub, fq[len(fq)//2+1:len(fq)] AS vq FROM e),
        |en AS (SELECT vec_id, sub, vq, CAST(list_sum(list_transform(vq, x -> x * x)) AS BIGINT) AS norm2 FROM hv),
        |base AS (SELECT * FROM en WHERE vec_id % 7 <> 0),
        |cent0 AS (SELECT sub, vec_id AS cid, vq AS cv, norm2 AS cn FROM base WHERE vec_id % 25 = 0),
        |a1 AS (SELECT base.vec_id, base.sub, cent0.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM base JOIN cent0 ON base.sub = cent0.sub),
        |r1 AS (SELECT vec_id, sub, cid, row_number() OVER (PARTITION BY sub, vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM a1),
        |asg1 AS (SELECT vec_id AS nid, sub, cid AS cell FROM r1 WHERE rn = 1),
        |u1 AS (SELECT asg1.sub, asg1.cell, unnest(vq) AS v, generate_subscripts(vq, 1) AS d
        |  FROM base JOIN asg1 ON base.vec_id = asg1.nid AND base.sub = asg1.sub),
        |m1 AS (SELECT sub, cell, d, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS vc FROM u1 GROUP BY sub, cell, d),
        |cent1 AS (SELECT sub, cell AS cid, list(vc ORDER BY d) AS cv FROM m1 GROUP BY sub, cell),
        |cent1n AS (SELECT sub, cid, cv, CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn FROM cent1),
        |a2 AS (SELECT base.vec_id, base.sub, cent1n.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM base JOIN cent1n ON base.sub = cent1n.sub),
        |r2 AS (SELECT vec_id, sub, cid, row_number() OVER (PARTITION BY sub, vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM a2),
        |asg2 AS (SELECT vec_id AS nid, sub, cid AS cell FROM r2 WHERE rn = 1),
        |u2 AS (SELECT asg2.sub, asg2.cell, unnest(vq) AS v, generate_subscripts(vq, 1) AS d
        |  FROM base JOIN asg2 ON base.vec_id = asg2.nid AND base.sub = asg2.sub),
        |m2 AS (SELECT sub, cell, d, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS vc FROM u2 GROUP BY sub, cell, d),
        |cent2 AS (SELECT sub, cell AS cid, list(vc ORDER BY d) AS cv FROM m2 GROUP BY sub, cell),
        |cent AS (SELECT sub, cid, cv, CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn FROM cent2),
        |af AS (SELECT en.vec_id, en.sub, cent.cid, cent.cn,
        |    CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS dpv,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en JOIN cent ON en.sub = cent.sub WHERE en.vec_id % 7 = 0),
        |rf AS (SELECT vec_id, sub, cid, cn, dpv,
        |    row_number() OVER (PARTITION BY sub, vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM af),
        |sel AS (SELECT vec_id, sub, cid, cn, dpv FROM rf WHERE rn = 1),
        |p AS (SELECT s0.vec_id, s0.cid AS code0, s1.cid AS code1,
        |    s0.dpv + s1.dpv AS dp, s0.cn + s1.cn AS cnsum
        |  FROM sel s0 JOIN sel s1 ON s0.vec_id = s1.vec_id AND s0.sub = 0 AND s1.sub = 1)
        |SELECT p.vec_id, p.code0, p.code1,
        |  CAST(p.dp AS DOUBLE) / (sqrt(CAST(fn.fnorm AS DOUBLE)) * sqrt(CAST(p.cnsum AS DOUBLE))) AS recon_cos
        |FROM p JOIN fn ON p.vec_id = fn.vec_id""".stripMargin,
    // llm_hard_negatives oracle: semantic-dedup chain (training + pair
    // closure) + brute top-10 + clustermate exclusion + re-rank
    "llm_hard_negatives" ->
      """WITH RECURSIVE e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS vq FROM embeddings),
        |en AS (SELECT vec_id, vq, CAST(list_sum(list_transform(vq, x -> x * x)) AS BIGINT) AS norm2 FROM e),
        |cent0 AS (SELECT vec_id AS cid, vq AS cv, norm2 AS cn FROM en WHERE vec_id % 25 = 0),
        |a1 AS (SELECT en.vec_id, cent0.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en CROSS JOIN cent0),
        |r1 AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM a1),
        |asg1 AS (SELECT vec_id AS nid, cid AS cell FROM r1 WHERE rn = 1),
        |u1 AS (SELECT asg1.cell, unnest(vq) AS v, generate_subscripts(vq, 1) AS d FROM en JOIN asg1 ON en.vec_id = asg1.nid),
        |m1 AS (SELECT cell, d, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS vc FROM u1 GROUP BY cell, d),
        |cent1 AS (SELECT cell AS cid, list(vc ORDER BY d) AS cv FROM m1 GROUP BY cell),
        |cent1n AS (SELECT cid, cv, CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn FROM cent1),
        |a2 AS (SELECT en.vec_id, cent1n.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en CROSS JOIN cent1n),
        |r2 AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM a2),
        |asg2 AS (SELECT vec_id AS nid, cid AS cell FROM r2 WHERE rn = 1),
        |u2 AS (SELECT asg2.cell, unnest(vq) AS v, generate_subscripts(vq, 1) AS d FROM en JOIN asg2 ON en.vec_id = asg2.nid),
        |m2 AS (SELECT cell, d, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS vc FROM u2 GROUP BY cell, d),
        |cent2 AS (SELECT cell AS cid, list(vc ORDER BY d) AS cv FROM m2 GROUP BY cell),
        |cent AS (SELECT cid, cv, CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn FROM cent2),
        |ascore AS (
        |  SELECT en.vec_id, cent.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en CROSS JOIN cent),
        |ranked_assign AS (
        |  SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn
        |  FROM ascore),
        |cells AS (SELECT vec_id AS nid, cid AS cell FROM ranked_assign WHERE rn = 1),
        |mem AS (SELECT en.vec_id AS nid, vq, norm2, cell FROM en JOIN cells ON en.vec_id = cells.nid),
        |pr AS (SELECT a.nid AS id_a, b.nid AS id_b
        |  FROM mem a JOIN mem b ON a.cell = b.cell AND a.nid < b.nid
        |  WHERE CAST(CAST(list_sum(list_transform(generate_series(1, len(a.vq)), i -> a.vq[i] * b.vq[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(a.norm2 AS DOUBLE)) * sqrt(CAST(b.norm2 AS DOUBLE))) >= 0.35),
        |edges AS (SELECT id_a AS u, id_b AS v FROM pr UNION SELECT id_b, id_a FROM pr),
        |reach(id, r) AS (
        |  SELECT vec_id, vec_id FROM embeddings
        |  UNION
        |  SELECT eg.u, reach.r FROM edges eg JOIN reach ON reach.id = eg.v),
        |comp AS (SELECT id AS vec_id, min(r) AS cluster_id FROM reach GROUP BY id),
        |bq AS (SELECT vec_id AS qid, vq AS qv, norm2 AS qn FROM en WHERE vec_id % 50 = 0),
        |bsc AS (SELECT bq.qid, en.vec_id AS nid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * en.vq[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(en.norm2 AS DOUBLE))) AS cos
        |  FROM en CROSS JOIN bq WHERE en.vec_id <> bq.qid),
        |top10 AS (SELECT qid, nid, cos FROM (SELECT qid, nid, cos,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS r FROM bsc) WHERE r <= 10),
        |neg AS (SELECT t.qid, t.nid, t.cos FROM top10 t
        |  JOIN comp cq ON cq.vec_id = t.qid JOIN comp cn ON cn.vec_id = t.nid
        |  WHERE cq.cluster_id <> cn.cluster_id),
        |rk AS (SELECT qid, nid, cos,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS neg_rank FROM neg)
        |SELECT qid, CAST(neg_rank AS BIGINT) AS neg_rank, nid, cos FROM rk WHERE neg_rank <= 3""".stripMargin,
    // llm_ann_index_build oracle: replay BOTH trainings — the
    // full-vector coarse k-means (cent2 = distinct populated cells after
    // iteration 2) and the two subspace codebooks (scent2) — and
    // re-derive the persisted component row counts
    // llm_sq_index oracle: component row counts of the persisted SQ8
    // artifacts — the collapsed bounds frame is one row by construction,
    // the code table is one row per corpus vector (the deep per-code
    // check is llm_sq_encode; the probe checks are llm_sq_search /
    // llm_ivf_sq_search, which read THIS loaded index)
    "llm_sq_index" ->
      """SELECT 'bounds' AS component, CAST(1 AS BIGINT) AS n_rows
        |UNION ALL
        |SELECT 'codes' AS component, CAST(count(*) AS BIGINT) AS n_rows
        |FROM embeddings""".stripMargin,
    "llm_ann_index_build" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS vq FROM embeddings),
        |en AS (SELECT vec_id, vq, CAST(list_sum(list_transform(vq, x -> x * x)) AS BIGINT) AS norm2 FROM e),
        |cent0 AS (SELECT vec_id AS cid, vq AS cv, norm2 AS cn FROM en WHERE vec_id % 25 = 0),
        |a1 AS (SELECT en.vec_id, cent0.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en CROSS JOIN cent0),
        |r1 AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM a1),
        |asg1 AS (SELECT vec_id AS nid, cid AS cell FROM r1 WHERE rn = 1),
        |u1 AS (SELECT asg1.cell, unnest(vq) AS v, generate_subscripts(vq, 1) AS d FROM en JOIN asg1 ON en.vec_id = asg1.nid),
        |m1 AS (SELECT cell, d, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS vc FROM u1 GROUP BY cell, d),
        |cent1 AS (SELECT cell AS cid, list(vc ORDER BY d) AS cv FROM m1 GROUP BY cell),
        |cent1n AS (SELECT cid, cv, CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn FROM cent1),
        |a2 AS (SELECT en.vec_id, cent1n.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en CROSS JOIN cent1n),
        |r2 AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM a2),
        |asg2 AS (SELECT vec_id AS nid, cid AS cell FROM r2 WHERE rn = 1),
        |cent2 AS (SELECT cell FROM asg2 GROUP BY cell),
        |hv AS (SELECT vec_id, 0 AS sub, vq[1:len(vq)//2] AS svq FROM e
        |  UNION ALL SELECT vec_id, 1 AS sub, vq[len(vq)//2+1:len(vq)] AS svq FROM e),
        |sen AS (SELECT vec_id, sub, svq, CAST(list_sum(list_transform(svq, x -> x * x)) AS BIGINT) AS norm2 FROM hv),
        |scent0 AS (SELECT sub, vec_id AS cid, svq AS cv, norm2 AS cn FROM sen WHERE vec_id % 25 = 0),
        |sa1 AS (SELECT sen.vec_id, sen.sub, scent0.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(svq)), i -> svq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(sen.norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM sen JOIN scent0 ON sen.sub = scent0.sub),
        |sr1 AS (SELECT vec_id, sub, cid, row_number() OVER (PARTITION BY sub, vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM sa1),
        |sasg1 AS (SELECT vec_id AS nid, sub, cid AS cell FROM sr1 WHERE rn = 1),
        |su1 AS (SELECT sasg1.sub, sasg1.cell, unnest(svq) AS v, generate_subscripts(svq, 1) AS d
        |  FROM sen JOIN sasg1 ON sen.vec_id = sasg1.nid AND sen.sub = sasg1.sub),
        |sm1 AS (SELECT sub, cell, d, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS vc FROM su1 GROUP BY sub, cell, d),
        |scent1 AS (SELECT sub, cell AS cid, list(vc ORDER BY d) AS cv FROM sm1 GROUP BY sub, cell),
        |scent1n AS (SELECT sub, cid, cv, CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn FROM scent1),
        |sa2 AS (SELECT sen.vec_id, sen.sub, scent1n.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(svq)), i -> svq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(sen.norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM sen JOIN scent1n ON sen.sub = scent1n.sub),
        |sr2 AS (SELECT vec_id, sub, cid, row_number() OVER (PARTITION BY sub, vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM sa2),
        |sasg2 AS (SELECT vec_id AS nid, sub, cid AS cell FROM sr2 WHERE rn = 1),
        |scent2 AS (SELECT sub, cell FROM sasg2 GROUP BY sub, cell)
        |SELECT 'book0' AS component, CAST((SELECT count(*) FROM scent2 WHERE sub = 0) AS BIGINT) AS n_rows
        |UNION ALL SELECT 'book1', CAST((SELECT count(*) FROM scent2 WHERE sub = 1) AS BIGINT)
        |UNION ALL SELECT 'cells', CAST((SELECT count(*) FROM embeddings) AS BIGINT)
        |UNION ALL SELECT 'coarse', CAST((SELECT count(*) FROM cent2) AS BIGINT)
        |UNION ALL SELECT 'codes', CAST((SELECT count(*) FROM embeddings) AS BIGINT)""".stripMargin,
    // llm_ivf_stats oracle: the full-vector k-means training replay
    // (same chain as llm_hard_negatives) + a per-cell count
    "llm_ivf_stats" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS vq FROM embeddings),
        |en AS (SELECT vec_id, vq, CAST(list_sum(list_transform(vq, x -> x * x)) AS BIGINT) AS norm2 FROM e),
        |cent0 AS (SELECT vec_id AS cid, vq AS cv, norm2 AS cn FROM en WHERE vec_id % 25 = 0),
        |a1 AS (SELECT en.vec_id, cent0.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en CROSS JOIN cent0),
        |r1 AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM a1),
        |asg1 AS (SELECT vec_id AS nid, cid AS cell FROM r1 WHERE rn = 1),
        |u1 AS (SELECT asg1.cell, unnest(vq) AS v, generate_subscripts(vq, 1) AS d FROM en JOIN asg1 ON en.vec_id = asg1.nid),
        |m1 AS (SELECT cell, d, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS vc FROM u1 GROUP BY cell, d),
        |cent1 AS (SELECT cell AS cid, list(vc ORDER BY d) AS cv FROM m1 GROUP BY cell),
        |cent1n AS (SELECT cid, cv, CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn FROM cent1),
        |a2 AS (SELECT en.vec_id, cent1n.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en CROSS JOIN cent1n),
        |r2 AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM a2),
        |asg2 AS (SELECT vec_id AS nid, cid AS cell FROM r2 WHERE rn = 1),
        |u2 AS (SELECT asg2.cell, unnest(vq) AS v, generate_subscripts(vq, 1) AS d FROM en JOIN asg2 ON en.vec_id = asg2.nid),
        |m2 AS (SELECT cell, d, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS vc FROM u2 GROUP BY cell, d),
        |cent2 AS (SELECT cell AS cid, list(vc ORDER BY d) AS cv FROM m2 GROUP BY cell),
        |cent AS (SELECT cid, cv, CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn FROM cent2),
        |ascore AS (
        |  SELECT en.vec_id, cent.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en CROSS JOIN cent),
        |ranked_assign AS (
        |  SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn
        |  FROM ascore),
        |cells AS (SELECT vec_id AS nid, cid AS cell FROM ranked_assign WHERE rn = 1),
        |cnt AS (SELECT cell, CAST(count(*) AS BIGINT) AS n_vectors FROM cells GROUP BY cell)
        |SELECT cell, n_vectors FROM cnt""".stripMargin,
    // llm_pq_search oracle: the pq_encode chain (codebooks + codes)
    // extended with query-side LUTs and ADC ranking
    "llm_pq_search" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS fq FROM embeddings),
        |fn AS (SELECT vec_id, CAST(list_sum(list_transform(fq, x -> x * x)) AS BIGINT) AS fnorm FROM e),
        |hv AS (SELECT vec_id, 0 AS sub, fq[1:len(fq)//2] AS vq FROM e
        |  UNION ALL SELECT vec_id, 1 AS sub, fq[len(fq)//2+1:len(fq)] AS vq FROM e),
        |en AS (SELECT vec_id, sub, vq, CAST(list_sum(list_transform(vq, x -> x * x)) AS BIGINT) AS norm2 FROM hv),
        |cent0 AS (SELECT sub, vec_id AS cid, vq AS cv, norm2 AS cn FROM en WHERE vec_id % 25 = 0),
        |a1 AS (SELECT en.vec_id, en.sub, cent0.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en JOIN cent0 ON en.sub = cent0.sub),
        |r1 AS (SELECT vec_id, sub, cid, row_number() OVER (PARTITION BY sub, vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM a1),
        |asg1 AS (SELECT vec_id AS nid, sub, cid AS cell FROM r1 WHERE rn = 1),
        |u1 AS (SELECT asg1.sub, asg1.cell, unnest(vq) AS v, generate_subscripts(vq, 1) AS d
        |  FROM en JOIN asg1 ON en.vec_id = asg1.nid AND en.sub = asg1.sub),
        |m1 AS (SELECT sub, cell, d, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS vc FROM u1 GROUP BY sub, cell, d),
        |cent1 AS (SELECT sub, cell AS cid, list(vc ORDER BY d) AS cv FROM m1 GROUP BY sub, cell),
        |cent1n AS (SELECT sub, cid, cv, CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn FROM cent1),
        |a2 AS (SELECT en.vec_id, en.sub, cent1n.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en JOIN cent1n ON en.sub = cent1n.sub),
        |r2 AS (SELECT vec_id, sub, cid, row_number() OVER (PARTITION BY sub, vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM a2),
        |asg2 AS (SELECT vec_id AS nid, sub, cid AS cell FROM r2 WHERE rn = 1),
        |u2 AS (SELECT asg2.sub, asg2.cell, unnest(vq) AS v, generate_subscripts(vq, 1) AS d
        |  FROM en JOIN asg2 ON en.vec_id = asg2.nid AND en.sub = asg2.sub),
        |m2 AS (SELECT sub, cell, d, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS vc FROM u2 GROUP BY sub, cell, d),
        |cent2 AS (SELECT sub, cell AS cid, list(vc ORDER BY d) AS cv FROM m2 GROUP BY sub, cell),
        |cent AS (SELECT sub, cid, cv, CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn FROM cent2),
        |af AS (SELECT en.vec_id, en.sub, cent.cid, cent.cn,
        |    CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS dpv,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en JOIN cent ON en.sub = cent.sub),
        |rf AS (SELECT vec_id, sub, cid, cn, dpv,
        |    row_number() OVER (PARTITION BY sub, vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM af),
        |sel AS (SELECT vec_id, sub, cid, cn, dpv FROM rf WHERE rn = 1),
        |p AS (SELECT s0.vec_id, s0.cid AS code0, s1.cid AS code1,
        |    s0.dpv + s1.dpv AS dp, s0.cn + s1.cn AS cnsum
        |  FROM sel s0 JOIN sel s1 ON s0.vec_id = s1.vec_id AND s0.sub = 0 AND s1.sub = 1),
        |qh AS (SELECT vec_id AS qid, sub, vq FROM en WHERE vec_id % 50 = 0),
        |lut AS (SELECT qh.qid, qh.sub, cent.cid,
        |    CAST(list_sum(list_transform(generate_series(1, len(qh.vq)), i -> qh.vq[i] * cent.cv[i])) AS BIGINT) AS ld
        |  FROM qh JOIN cent ON qh.sub = cent.sub),
        |qn AS (SELECT vec_id AS qid, fnorm FROM fn WHERE vec_id % 50 = 0),
        |sc AS (SELECT l0.qid, p.vec_id AS nid,
        |    CAST(l0.ld + l1.ld AS DOUBLE) / (sqrt(CAST(qn.fnorm AS DOUBLE)) * sqrt(CAST(p.cnsum AS DOUBLE))) AS approx_cos
        |  FROM p JOIN lut l0 ON l0.sub = 0 AND l0.cid = p.code0
        |       JOIN lut l1 ON l1.sub = 1 AND l1.cid = p.code1 AND l1.qid = l0.qid
        |       JOIN qn ON qn.qid = l0.qid
        |  WHERE p.vec_id <> l0.qid),
        |rk AS (SELECT qid, nid, approx_cos,
        |    row_number() OVER (PARTITION BY qid ORDER BY approx_cos DESC, nid ASC) AS rank FROM sc)
        |SELECT qid, CAST(rank AS BIGINT) AS rank, nid, approx_cos FROM rk WHERE rank <= 3""".stripMargin,
    // llm_pq_recall oracle: pq_search chain + brute truth + exact
    // hit-set intersection counting
    "llm_pq_recall" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS fq FROM embeddings),
        |fn AS (SELECT vec_id, CAST(list_sum(list_transform(fq, x -> x * x)) AS BIGINT) AS fnorm FROM e),
        |hv AS (SELECT vec_id, 0 AS sub, fq[1:len(fq)//2] AS vq FROM e
        |  UNION ALL SELECT vec_id, 1 AS sub, fq[len(fq)//2+1:len(fq)] AS vq FROM e),
        |en AS (SELECT vec_id, sub, vq, CAST(list_sum(list_transform(vq, x -> x * x)) AS BIGINT) AS norm2 FROM hv),
        |cent0 AS (SELECT sub, vec_id AS cid, vq AS cv, norm2 AS cn FROM en WHERE vec_id % 25 = 0),
        |a1 AS (SELECT en.vec_id, en.sub, cent0.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en JOIN cent0 ON en.sub = cent0.sub),
        |r1 AS (SELECT vec_id, sub, cid, row_number() OVER (PARTITION BY sub, vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM a1),
        |asg1 AS (SELECT vec_id AS nid, sub, cid AS cell FROM r1 WHERE rn = 1),
        |u1 AS (SELECT asg1.sub, asg1.cell, unnest(vq) AS v, generate_subscripts(vq, 1) AS d
        |  FROM en JOIN asg1 ON en.vec_id = asg1.nid AND en.sub = asg1.sub),
        |m1 AS (SELECT sub, cell, d, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS vc FROM u1 GROUP BY sub, cell, d),
        |cent1 AS (SELECT sub, cell AS cid, list(vc ORDER BY d) AS cv FROM m1 GROUP BY sub, cell),
        |cent1n AS (SELECT sub, cid, cv, CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn FROM cent1),
        |a2 AS (SELECT en.vec_id, en.sub, cent1n.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en JOIN cent1n ON en.sub = cent1n.sub),
        |r2 AS (SELECT vec_id, sub, cid, row_number() OVER (PARTITION BY sub, vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM a2),
        |asg2 AS (SELECT vec_id AS nid, sub, cid AS cell FROM r2 WHERE rn = 1),
        |u2 AS (SELECT asg2.sub, asg2.cell, unnest(vq) AS v, generate_subscripts(vq, 1) AS d
        |  FROM en JOIN asg2 ON en.vec_id = asg2.nid AND en.sub = asg2.sub),
        |m2 AS (SELECT sub, cell, d, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS vc FROM u2 GROUP BY sub, cell, d),
        |cent2 AS (SELECT sub, cell AS cid, list(vc ORDER BY d) AS cv FROM m2 GROUP BY sub, cell),
        |cent AS (SELECT sub, cid, cv, CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn FROM cent2),
        |af AS (SELECT en.vec_id, en.sub, cent.cid, cent.cn,
        |    CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS dpv,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en JOIN cent ON en.sub = cent.sub),
        |rf AS (SELECT vec_id, sub, cid, cn, dpv,
        |    row_number() OVER (PARTITION BY sub, vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM af),
        |sel AS (SELECT vec_id, sub, cid, cn, dpv FROM rf WHERE rn = 1),
        |p AS (SELECT s0.vec_id, s0.cid AS code0, s1.cid AS code1,
        |    s0.dpv + s1.dpv AS dp, s0.cn + s1.cn AS cnsum
        |  FROM sel s0 JOIN sel s1 ON s0.vec_id = s1.vec_id AND s0.sub = 0 AND s1.sub = 1),
        |qh AS (SELECT vec_id AS qid, sub, vq FROM en WHERE vec_id % 50 = 0),
        |lut AS (SELECT qh.qid, qh.sub, cent.cid,
        |    CAST(list_sum(list_transform(generate_series(1, len(qh.vq)), i -> qh.vq[i] * cent.cv[i])) AS BIGINT) AS ld
        |  FROM qh JOIN cent ON qh.sub = cent.sub),
        |qn AS (SELECT vec_id AS qid, fnorm FROM fn WHERE vec_id % 50 = 0),
        |sc AS (SELECT l0.qid, p.vec_id AS nid,
        |    CAST(l0.ld + l1.ld AS DOUBLE) / (sqrt(CAST(qn.fnorm AS DOUBLE)) * sqrt(CAST(p.cnsum AS DOUBLE))) AS approx_cos
        |  FROM p JOIN lut l0 ON l0.sub = 0 AND l0.cid = p.code0
        |       JOIN lut l1 ON l1.sub = 1 AND l1.cid = p.code1 AND l1.qid = l0.qid
        |       JOIN qn ON qn.qid = l0.qid
        |  WHERE p.vec_id <> l0.qid),
        |rk AS (SELECT qid, nid, approx_cos,
        |    row_number() OVER (PARTITION BY qid ORDER BY approx_cos DESC, nid ASC) AS rank FROM sc),
        |bq AS (SELECT vec_id AS qid, fq AS qv, fnorm AS qn FROM e JOIN fn USING (vec_id) WHERE vec_id % 50 = 0),
        |bsc AS (SELECT bq.qid, e.vec_id AS nid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * e.fq[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(fn.fnorm AS DOUBLE))) AS cos
        |  FROM e JOIN fn USING (vec_id) CROSS JOIN bq WHERE e.vec_id <> bq.qid),
        |btr AS (SELECT qid, nid FROM (SELECT qid, nid,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS r FROM bsc) WHERE r <= 3),
        |ph AS (SELECT qid, nid FROM rk WHERE rank <= 3),
        |h AS (SELECT count(*) AS c FROM btr SEMI JOIN ph USING (qid, nid)),
        |tt AS (SELECT count(*) AS c FROM btr)
        |SELECT 'pq_adc' AS path, CAST(h.c AS BIGINT) AS n_hits, CAST(tt.c AS BIGINT) AS n_truth,
        |  CAST(h.c AS DOUBLE) / tt.c AS recall FROM h, tt""".stripMargin,
    // llm_ivfpq_search oracle: ONE training chain over sub∈{0,1,2} —
    // subs 0/1 are the PQ codebooks, sub 2 the full-vector coarse
    // quantizer (partitioned training ≡ separate trainings) — then
    // cell-restricted ADC ranking
    "llm_ivfpq_search" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS fq FROM embeddings),
        |fn AS (SELECT vec_id, CAST(list_sum(list_transform(fq, x -> x * x)) AS BIGINT) AS fnorm FROM e),
        |hv AS (SELECT vec_id, 0 AS sub, fq[1:len(fq)//2] AS vq FROM e
        |  UNION ALL SELECT vec_id, 1 AS sub, fq[len(fq)//2+1:len(fq)] AS vq FROM e
        |  UNION ALL SELECT vec_id, 2 AS sub, fq AS vq FROM e),
        |en AS (SELECT vec_id, sub, vq, CAST(list_sum(list_transform(vq, x -> x * x)) AS BIGINT) AS norm2 FROM hv),
        |cent0 AS (SELECT sub, vec_id AS cid, vq AS cv, norm2 AS cn FROM en WHERE vec_id % 25 = 0),
        |a1 AS (SELECT en.vec_id, en.sub, cent0.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en JOIN cent0 ON en.sub = cent0.sub),
        |r1 AS (SELECT vec_id, sub, cid, row_number() OVER (PARTITION BY sub, vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM a1),
        |asg1 AS (SELECT vec_id AS nid, sub, cid AS cell FROM r1 WHERE rn = 1),
        |u1 AS (SELECT asg1.sub, asg1.cell, unnest(vq) AS v, generate_subscripts(vq, 1) AS d
        |  FROM en JOIN asg1 ON en.vec_id = asg1.nid AND en.sub = asg1.sub),
        |m1 AS (SELECT sub, cell, d, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS vc FROM u1 GROUP BY sub, cell, d),
        |cent1 AS (SELECT sub, cell AS cid, list(vc ORDER BY d) AS cv FROM m1 GROUP BY sub, cell),
        |cent1n AS (SELECT sub, cid, cv, CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn FROM cent1),
        |a2 AS (SELECT en.vec_id, en.sub, cent1n.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en JOIN cent1n ON en.sub = cent1n.sub),
        |r2 AS (SELECT vec_id, sub, cid, row_number() OVER (PARTITION BY sub, vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM a2),
        |asg2 AS (SELECT vec_id AS nid, sub, cid AS cell FROM r2 WHERE rn = 1),
        |u2 AS (SELECT asg2.sub, asg2.cell, unnest(vq) AS v, generate_subscripts(vq, 1) AS d
        |  FROM en JOIN asg2 ON en.vec_id = asg2.nid AND en.sub = asg2.sub),
        |m2 AS (SELECT sub, cell, d, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS vc FROM u2 GROUP BY sub, cell, d),
        |cent2 AS (SELECT sub, cell AS cid, list(vc ORDER BY d) AS cv FROM m2 GROUP BY sub, cell),
        |cent AS (SELECT sub, cid, cv, CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn FROM cent2),
        |af AS (SELECT en.vec_id, en.sub, cent.cid, cent.cn,
        |    CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS dpv,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en JOIN cent ON en.sub = cent.sub),
        |rf AS (SELECT vec_id, sub, cid, cn, dpv,
        |    row_number() OVER (PARTITION BY sub, vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM af),
        |sel AS (SELECT vec_id, sub, cid, cn, dpv FROM rf WHERE rn = 1),
        |p AS (SELECT s0.vec_id, s0.cid AS code0, s1.cid AS code1,
        |    s0.dpv + s1.dpv AS dp, s0.cn + s1.cn AS cnsum
        |  FROM sel s0 JOIN sel s1 ON s0.vec_id = s1.vec_id AND s0.sub = 0 AND s1.sub = 1),
        |cellsc AS (SELECT vec_id, cid AS cell FROM sel WHERE sub = 2),
        |probes AS (SELECT vec_id AS qid, cid AS cell FROM rf WHERE sub = 2 AND vec_id % 50 = 0 AND rn <= 2),
        |qh AS (SELECT vec_id AS qid, sub, vq FROM en WHERE sub < 2 AND vec_id % 50 = 0),
        |lut AS (SELECT qh.qid, qh.sub, cent.cid,
        |    CAST(list_sum(list_transform(generate_series(1, len(qh.vq)), i -> qh.vq[i] * cent.cv[i])) AS BIGINT) AS ld
        |  FROM qh JOIN cent ON qh.sub = cent.sub),
        |qn AS (SELECT vec_id AS qid, fnorm FROM fn WHERE vec_id % 50 = 0),
        |sc AS (SELECT probes.qid, p.vec_id AS nid,
        |    CAST(l0.ld + l1.ld AS DOUBLE) / (sqrt(CAST(qn.fnorm AS DOUBLE)) * sqrt(CAST(p.cnsum AS DOUBLE))) AS approx_cos
        |  FROM p JOIN cellsc ON cellsc.vec_id = p.vec_id
        |       JOIN probes ON probes.cell = cellsc.cell
        |       JOIN lut l0 ON l0.sub = 0 AND l0.qid = probes.qid AND l0.cid = p.code0
        |       JOIN lut l1 ON l1.sub = 1 AND l1.qid = probes.qid AND l1.cid = p.code1
        |       JOIN qn ON qn.qid = probes.qid
        |  WHERE p.vec_id <> probes.qid),
        |rk AS (SELECT qid, nid, approx_cos,
        |    row_number() OVER (PARTITION BY qid ORDER BY approx_cos DESC, nid ASC) AS rank FROM sc)
        |SELECT qid, CAST(rank AS BIGINT) AS rank, nid, approx_cos FROM rk WHERE rank <= 3""".stripMargin,
    // llm_ivfpq_recall oracle: the ivfpq_search chain (training + cell-
    // restricted ADC ranking) extended with the ADC top-20 shortlist →
    // exact full-vector re-rank, brute truth, and hit-set counting for
    // both paths
    "llm_ivfpq_recall" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS fq FROM embeddings),
        |fn AS (SELECT vec_id, CAST(list_sum(list_transform(fq, x -> x * x)) AS BIGINT) AS fnorm FROM e),
        |hv AS (SELECT vec_id, 0 AS sub, fq[1:len(fq)//2] AS vq FROM e
        |  UNION ALL SELECT vec_id, 1 AS sub, fq[len(fq)//2+1:len(fq)] AS vq FROM e
        |  UNION ALL SELECT vec_id, 2 AS sub, fq AS vq FROM e),
        |en AS (SELECT vec_id, sub, vq, CAST(list_sum(list_transform(vq, x -> x * x)) AS BIGINT) AS norm2 FROM hv),
        |cent0 AS (SELECT sub, vec_id AS cid, vq AS cv, norm2 AS cn FROM en WHERE vec_id % 25 = 0),
        |a1 AS (SELECT en.vec_id, en.sub, cent0.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en JOIN cent0 ON en.sub = cent0.sub),
        |r1 AS (SELECT vec_id, sub, cid, row_number() OVER (PARTITION BY sub, vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM a1),
        |asg1 AS (SELECT vec_id AS nid, sub, cid AS cell FROM r1 WHERE rn = 1),
        |u1 AS (SELECT asg1.sub, asg1.cell, unnest(vq) AS v, generate_subscripts(vq, 1) AS d
        |  FROM en JOIN asg1 ON en.vec_id = asg1.nid AND en.sub = asg1.sub),
        |m1 AS (SELECT sub, cell, d, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS vc FROM u1 GROUP BY sub, cell, d),
        |cent1 AS (SELECT sub, cell AS cid, list(vc ORDER BY d) AS cv FROM m1 GROUP BY sub, cell),
        |cent1n AS (SELECT sub, cid, cv, CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn FROM cent1),
        |a2 AS (SELECT en.vec_id, en.sub, cent1n.cid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en JOIN cent1n ON en.sub = cent1n.sub),
        |r2 AS (SELECT vec_id, sub, cid, row_number() OVER (PARTITION BY sub, vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM a2),
        |asg2 AS (SELECT vec_id AS nid, sub, cid AS cell FROM r2 WHERE rn = 1),
        |u2 AS (SELECT asg2.sub, asg2.cell, unnest(vq) AS v, generate_subscripts(vq, 1) AS d
        |  FROM en JOIN asg2 ON en.vec_id = asg2.nid AND en.sub = asg2.sub),
        |m2 AS (SELECT sub, cell, d, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS vc FROM u2 GROUP BY sub, cell, d),
        |cent2 AS (SELECT sub, cell AS cid, list(vc ORDER BY d) AS cv FROM m2 GROUP BY sub, cell),
        |cent AS (SELECT sub, cid, cv, CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn FROM cent2),
        |af AS (SELECT en.vec_id, en.sub, cent.cid, cent.cn,
        |    CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS dpv,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(vq)), i -> vq[i] * cv[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS ccos
        |  FROM en JOIN cent ON en.sub = cent.sub),
        |rf AS (SELECT vec_id, sub, cid, cn, dpv,
        |    row_number() OVER (PARTITION BY sub, vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM af),
        |sel AS (SELECT vec_id, sub, cid, cn, dpv FROM rf WHERE rn = 1),
        |p AS (SELECT s0.vec_id, s0.cid AS code0, s1.cid AS code1,
        |    s0.dpv + s1.dpv AS dp, s0.cn + s1.cn AS cnsum
        |  FROM sel s0 JOIN sel s1 ON s0.vec_id = s1.vec_id AND s0.sub = 0 AND s1.sub = 1),
        |cellsc AS (SELECT vec_id, cid AS cell FROM sel WHERE sub = 2),
        |probes AS (SELECT vec_id AS qid, cid AS cell FROM rf WHERE sub = 2 AND vec_id % 50 = 0 AND rn <= 2),
        |qh AS (SELECT vec_id AS qid, sub, vq FROM en WHERE sub < 2 AND vec_id % 50 = 0),
        |lut AS (SELECT qh.qid, qh.sub, cent.cid,
        |    CAST(list_sum(list_transform(generate_series(1, len(qh.vq)), i -> qh.vq[i] * cent.cv[i])) AS BIGINT) AS ld
        |  FROM qh JOIN cent ON qh.sub = cent.sub),
        |qn AS (SELECT vec_id AS qid, fnorm FROM fn WHERE vec_id % 50 = 0),
        |sc AS (SELECT probes.qid, p.vec_id AS nid,
        |    CAST(l0.ld + l1.ld AS DOUBLE) / (sqrt(CAST(qn.fnorm AS DOUBLE)) * sqrt(CAST(p.cnsum AS DOUBLE))) AS approx_cos
        |  FROM p JOIN cellsc ON cellsc.vec_id = p.vec_id
        |       JOIN probes ON probes.cell = cellsc.cell
        |       JOIN lut l0 ON l0.sub = 0 AND l0.qid = probes.qid AND l0.cid = p.code0
        |       JOIN lut l1 ON l1.sub = 1 AND l1.qid = probes.qid AND l1.cid = p.code1
        |       JOIN qn ON qn.qid = probes.qid
        |  WHERE p.vec_id <> probes.qid),
        |rk AS (SELECT qid, nid, approx_cos,
        |    row_number() OVER (PARTITION BY qid ORDER BY approx_cos DESC, nid ASC) AS rank FROM sc),
        |shortl AS (SELECT qid, nid FROM rk WHERE rank <= 20),
        |rrsc AS (SELECT s.qid, s.nid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(eq.fq)), i -> eq.fq[i] * ec.fq[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(fq2.fnorm AS DOUBLE)) * sqrt(CAST(fc2.fnorm AS DOUBLE))) AS cos
        |  FROM shortl s JOIN e eq ON eq.vec_id = s.qid JOIN e ec ON ec.vec_id = s.nid
        |    JOIN fn fq2 ON fq2.vec_id = s.qid JOIN fn fc2 ON fc2.vec_id = s.nid),
        |rr3 AS (SELECT qid, nid FROM (SELECT qid, nid,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS r FROM rrsc) WHERE r <= 3),
        |adc3 AS (SELECT qid, nid FROM rk WHERE rank <= 3),
        |bq AS (SELECT vec_id AS qid, fq AS qv, fnorm AS qn FROM e JOIN fn USING (vec_id) WHERE vec_id % 50 = 0),
        |bsc AS (SELECT bq.qid, e.vec_id AS nid,
        |    CAST(CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * e.fq[i])) AS BIGINT) AS DOUBLE)
        |      / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(fn.fnorm AS DOUBLE))) AS cos
        |  FROM e JOIN fn USING (vec_id) CROSS JOIN bq WHERE e.vec_id <> bq.qid),
        |btr AS (SELECT qid, nid FROM (SELECT qid, nid,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS r FROM bsc) WHERE r <= 3),
        |h1 AS (SELECT count(*) AS c FROM btr SEMI JOIN adc3 USING (qid, nid)),
        |h2 AS (SELECT count(*) AS c FROM btr SEMI JOIN rr3 USING (qid, nid)),
        |tt AS (SELECT count(*) AS c FROM btr)
        |SELECT 'ivfpq_adc' AS path, CAST(h1.c AS BIGINT) AS n_hits, CAST(tt.c AS BIGINT) AS n_truth,
        |  CAST(h1.c AS DOUBLE) / tt.c AS recall FROM h1, tt
        |UNION ALL
        |SELECT 'ivfpq_rerank' AS path, CAST(h2.c AS BIGINT) AS n_hits, CAST(tt.c AS BIGINT) AS n_truth,
        |  CAST(h2.c AS DOUBLE) / tt.c AS recall FROM h2, tt""".stripMargin,
    "llm_bpe_pairs" ->
      """WITH wf AS (SELECT word, count(*) AS wc FROM
        |  (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
        |  WHERE len(word) > 1 GROUP BY word),
        |pr AS (SELECT unnest(list_transform(generate_series(1, len(word) - 1),
        |    i -> substr(word, i, 2))) AS pair, wc FROM wf),
        |agg AS (SELECT pair, CAST(sum(wc) AS BIGINT) AS n_occurrences FROM pr GROUP BY pair)
        |SELECT pair, n_occurrences FROM agg
        |ORDER BY n_occurrences DESC, pair ASC LIMIT 32""".stripMargin,
    // llm_source_overlap oracle: independent re-derivation of the banded
    // MinHash pair pipeline (same CTE chain as llm_dedup_clusters), then
    // the doc→source join and canonicalized pair counting
    "llm_source_overlap" ->
      """WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
        |sh AS (SELECT doc_id, CASE WHEN len(ws) < 3 THEN CAST([] AS VARCHAR[])
        |  ELSE list_distinct(list_transform(generate_series(1, len(ws)-2),
        |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) END AS shingles FROM w),
        |hs AS (SELECT doc_id, shingles,
        |  list_transform(shingles, s -> CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)) AS shash
        |  FROM sh WHERE len(shingles) > 0),
        |sig AS (SELECT doc_id, shingles, list_transform(generate_series(0, 31), i ->
        |  list_min(list_transform(shash, h ->
        |    ((CAST(('0x' || substr(md5('a' || CAST(i AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000006 + 1)
        |      * (h % 1000000007)
        |     + CAST(('0x' || substr(md5('b' || CAST(i AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000007) % 1000000007))) AS sig
        |  FROM hs),
        |bands AS (SELECT doc_id, shingles, b AS band_id,
        |  md5(array_to_string(sig[b*4+1 : b*4+4], ',')) AS band_key
        |  FROM sig, (SELECT unnest(generate_series(0, 7)) AS b)),
        |cand AS (SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
        |    CAST(len(list_intersect(a.shingles, c.shingles)) AS DOUBLE)
        |      / len(list_distinct(list_concat(a.shingles, c.shingles))) AS jaccard
        |  FROM bands a JOIN bands c
        |    ON a.band_id = c.band_id AND a.band_key = c.band_key AND a.doc_id < c.doc_id),
        |pairs AS (SELECT id_a, id_b FROM cand WHERE jaccard >= 0.5),
        |ps AS (SELECT least(da.source, db.source) AS source_a,
        |    greatest(da.source, db.source) AS source_b
        |  FROM pairs p JOIN documents da ON p.id_a = da.doc_id
        |    JOIN documents db ON p.id_b = db.doc_id)
        |SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS n_pairs
        |FROM ps GROUP BY source_a, source_b""".stripMargin,
    // llm_stream_dedup oracle: the streaming min-fold must equal plain
    // min(id) per content hash over the salted union
    "llm_stream_dedup" ->
      """WITH all_docs AS (SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 3),
        |k AS (SELECT CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS content_hash,
        |    doc_id FROM all_docs)
        |SELECT content_hash, CAST(min(doc_id) AS BIGINT) AS first_doc_id
        |FROM k GROUP BY content_hash""".stripMargin,
    "llm_corpus_profile" ->
      """WITH t2 AS (SELECT source, doc_id, string_split(lower(text), ' ') AS ws,
        |    CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens FROM documents),
        |cnt AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n_tokens) AS BIGINT) AS total_tokens FROM t2 GROUP BY source),
        |hist AS (SELECT source, n_tokens, count(*) AS c FROM t2 GROUP BY source, n_tokens),
        |cum AS (SELECT source, n_tokens,
        |    sum(c) OVER (PARTITION BY source ORDER BY n_tokens) AS cum FROM hist),
        |j AS (SELECT cum.source, cum.n_tokens, cum.cum, cnt.n_docs FROM cum JOIN cnt USING (source)),
        |p AS (SELECT source,
        |    min(CASE WHEN cum >= (n_docs - 1) * 5000 // 10000 + 1 THEN n_tokens END) AS p50_tokens,
        |    min(CASE WHEN cum >= (n_docs - 1) * 9000 // 10000 + 1 THEN n_tokens END) AS p90_tokens,
        |    min(CASE WHEN cum >= (n_docs - 1) * 9900 // 10000 + 1 THEN n_tokens END) AS p99_tokens
        |  FROM j GROUP BY source),
        |v AS (SELECT source, CAST(count(*) AS BIGINT) AS vocab_size FROM
        |  (SELECT DISTINCT source, unnest(ws) AS w FROM t2) WHERE len(w) > 0 GROUP BY source)
        |SELECT cnt.source, cnt.n_docs, cnt.total_tokens,
        |  CAST(cnt.total_tokens AS DOUBLE) / cnt.n_docs AS mean_tokens,
        |  p.p50_tokens, p.p90_tokens, p.p99_tokens, v.vocab_size
        |FROM cnt JOIN p USING (source) JOIN v USING (source)""".stripMargin,
    "llm_curriculum_plan" ->
      """WITH w AS (SELECT doc_id, text, string_split(lower(text), ' ') AS ws FROM documents),
        |q AS (SELECT doc_id,
        |    least(CAST(9 AS BIGINT), CAST(floor(((CASE WHEN length(text) BETWEEN 100 AND 5000 THEN 1.0
        |          WHEN length(text) > 5000 THEN 0.5 ELSE 0.2 END +
        |     CASE WHEN CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(ws)
        |               BETWEEN 3.0 AND 8.0 THEN 1.0 ELSE 0.4 END +
        |     CAST(length(regexp_replace(text, '[^a-zA-Z ]', '', 'g')) AS DOUBLE) / length(text)
        |    ) / 3.0) * 10) AS BIGINT)) AS q_bin,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hh,
        |    CAST(len(ws) AS BIGINT) AS n_tokens
        |  FROM w)
        |SELECT doc_id, hh % 8 AS shard, q_bin,
        |  CAST(row_number() OVER (PARTITION BY hh % 8 ORDER BY q_bin DESC, hh, doc_id) AS BIGINT) AS seq,
        |  n_tokens
        |FROM q""".stripMargin,
    // llm_full_pipeline oracle: the ENTIRE curation chain recomputed —
    // URL canonicalize + public-suffix domain + per-domain cap (window
    // form) → salt → normalize → line dedup → rolling-gram span scrub →
    // Gopher gate → MinHash/LSH cluster closure (recursive CTE) →
    // eval-gram decontamination → token-share domain mix → curriculum
    // shard plan, each stage consuming the previous stage's text
    "llm_full_pipeline" ->
      s"""WITH RECURSIVE
        |u0 AS (SELECT doc_id,
        |    'HTTPS://' || CASE WHEN doc_id % 11 = 0
        |      THEN 'WWW.Site' || CAST(doc_id % 3 AS VARCHAR) || '.CO.UK'
        |      ELSE 'WWW.Example' || CAST(doc_id % 7 AS VARCHAR) || '.COM' END
        |    || '/Path' || CAST(doc_id AS VARCHAR) ||
        |    '?utm_source=feed&id=' || CAST(doc_id % 30 AS VARCHAR) || '&fbclid=xyz#frag' AS url
        |  FROM documents),
        |up AS (SELECT doc_id, url, regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*', 0) AS pfx FROM u0),
        |uc1 AS (SELECT doc_id, lower(pfx) || substr(url, length(pfx) + 1) AS c FROM up),
        |uc2 AS (SELECT doc_id, regexp_replace(c, '#.*$$', '') AS c FROM uc1),
        |uc3 AS (SELECT doc_id, regexp_replace(c, '([?&])(utm_[a-z]+|ref|fbclid|gclid)=[^&#]*', '\\1', 'g') AS c FROM uc2),
        |uc4 AS (SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(c, '&{2,}', '&', 'g'), '\\?&', '?'), '[?&]+$$', '') AS canon_url FROM uc3),
        |uhx AS (SELECT doc_id,
        |    regexp_extract(canon_url, '^[a-z][a-z0-9+.-]*://([^/:?#]+)', 1) AS host,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hh
        |  FROM uc4),
        |ud AS (SELECT doc_id, hh,
        |    CASE WHEN regexp_extract(host, '[^.]+\\.[^.]+$$', 0) IN (${llm.TextOps.MultiLabelSuffixes.map(x => s"'$x'").mkString(", ")})
        |           AND regexp_extract(host, '[^.]+\\.[^.]+\\.[^.]+$$', 0) != ''
        |      THEN regexp_extract(host, '[^.]+\\.[^.]+\\.[^.]+$$', 0)
        |      ELSE regexp_extract(host, '[^.]+\\.[^.]+$$', 0) END AS domain
        |  FROM uhx),
        |ur AS (SELECT doc_id,
        |    row_number() OVER (PARTITION BY domain ORDER BY hh, doc_id) AS rn FROM ud),
        |keep0 AS (SELECT doc_id FROM ur WHERE rn <= 40),
        |s0 AS (SELECT doc_id, source, text ||
        |    CASE WHEN doc_id % 4 = 0 THEN '  visit   https://example.com/page' || CAST(doc_id % 50 AS VARCHAR) || '?ref=rss  now' ELSE '' END ||
        |    CASE WHEN doc_id % 5 = 0 THEN ' the quick brown fox jumps over the lazy dog again' ELSE '' END ||
        |    CASE WHEN doc_id % 3 = 0 THEN chr(10) || 'subscribe to our newsletter today' ELSE '' END AS t0
        |  FROM documents SEMI JOIN keep0 USING (doc_id)),
        |n1 AS (SELECT doc_id, trim(regexp_replace(regexp_replace(regexp_replace(t0,
        |    'https?://[^ ]+', '<URL>', 'g'), '[\\t\\r]', ' ', 'g'), ' {2,}', ' ', 'g')) AS t1 FROM s0),
        |l AS (SELECT doc_id, generate_subscripts(ls, 1) AS pos, unnest(ls) AS line
        |  FROM (SELECT doc_id, string_split(t1, chr(10)) AS ls FROM n1)),
        |lb AS (SELECT line FROM (SELECT line, count(DISTINCT doc_id) AS nd FROM l GROUP BY line) WHERE nd >= 10),
        |lt AS (SELECT doc_id, pos, line, line IN (SELECT line FROM lb) AS isb FROM l),
        |t2d AS (SELECT doc_id, coalesce(string_agg(CASE WHEN isb THEN NULL ELSE line END, chr(10) ORDER BY pos), '') AS t2 FROM lt GROUP BY doc_id),
        |w3 AS (SELECT doc_id, string_split(lower(t2), ' ') AS ws FROM t2d),
        |wh3 AS (SELECT doc_id, list_transform(ws, x -> CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)) AS wh FROM w3),
        |pw AS (SELECT [${plans.RollingGrams.powTable(plans.RollingGrams.B1, 8, plans.RollingGrams.P1).mkString(", ")}] AS pw1,
        |    [${plans.RollingGrams.powTable(plans.RollingGrams.B2, 8, plans.RollingGrams.P2).mkString(", ")}] AS pw2),
        |gl AS (SELECT doc_id, CASE WHEN len(wh) < 8 THEN CAST([] AS BIGINT[])
        |  ELSE list_transform(generate_series(1, len(wh)-7), i ->
        |    (list_sum(list_transform(generate_series(0, 7), j -> ((wh[i+j] % ${plans.RollingGrams.P1}) * pw1[j+1]) % ${plans.RollingGrams.P1})) % ${plans.RollingGrams.P1}) * ${plans.RollingGrams.P2}
        |  + (list_sum(list_transform(generate_series(0, 7), j -> ((wh[i+j] % ${plans.RollingGrams.P2}) * pw2[j+1]) % ${plans.RollingGrams.P2})) % ${plans.RollingGrams.P2})) END AS gs
        |  FROM wh3 CROSS JOIN pw),
        |g3 AS (SELECT doc_id, generate_subscripts(gs, 1) AS pos, unnest(gs) AS h FROM gl),
        |dupg AS (SELECT h FROM g3 GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
        |occ AS (SELECT doc_id, pos, h FROM g3 SEMI JOIN dupg USING (h)),
        |rkd AS (SELECT doc_id, pos, row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn FROM occ),
        |removed AS (SELECT doc_id, pos FROM rkd WHERE rn > 1),
        |covered AS (SELECT DISTINCT doc_id, unnest(generate_series(pos, pos + 7)) AS wpos FROM removed),
        |wordpos AS (SELECT doc_id, generate_subscripts(ws, 1) AS wpos, unnest(ws) AS word FROM w3),
        |t3d AS (SELECT w3.doc_id, coalesce(k.t3, '') AS t3 FROM w3 LEFT JOIN
        |  (SELECT wordpos.doc_id, array_to_string(list(word ORDER BY wpos), ' ') AS t3
        |   FROM wordpos ANTI JOIN covered USING (doc_id, wpos) GROUP BY wordpos.doc_id) k
        |  ON w3.doc_id = k.doc_id),
        |w4 AS (SELECT doc_id, t3 AS text, string_split(lower(t3), ' ') AS ws,
        |    string_split(t3, chr(10)) AS lines FROM t3d),
        |sig4 AS (SELECT doc_id, text, ws,
        |  1.0 - CAST(len(list_distinct(lines)) AS DOUBLE) / len(lines) AS dup_line_frac,
        |  CAST(len(regexp_extract_all(text, '#')) + len(regexp_extract_all(text, '\\.\\.\\.')) AS DOUBLE)
        |    / len(ws) AS symbol_word_ratio
        |  FROM w4),
        |q4 AS (SELECT doc_id, text FROM sig4
        |  WHERE (len(ws) BETWEEN 50 AND 100000)
        |    AND (CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(ws) BETWEEN 3.0 AND 10.0)
        |    AND symbol_word_ratio < 0.1 AND dup_line_frac < 0.3
        |    AND len(list_intersect(ws, ['the','a','of','and','to','in','is','it','for','on'])) >= 2),
        |w5 AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM q4),
        |sh5 AS (SELECT doc_id, CASE WHEN len(ws) < 3 THEN CAST([] AS VARCHAR[])
        |  ELSE list_distinct(list_transform(generate_series(1, len(ws)-2),
        |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) END AS shingles FROM w5),
        |hs5 AS (SELECT doc_id, shingles,
        |  list_transform(shingles, s -> CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)) AS shash
        |  FROM sh5 WHERE len(shingles) > 0),
        |sig5 AS (SELECT doc_id, shingles, list_transform(generate_series(0, 31), i ->
        |  list_min(list_transform(shash, h ->
        |    ((CAST(('0x' || substr(md5('a' || CAST(i AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000006 + 1)
        |      * (h % 1000000007)
        |     + CAST(('0x' || substr(md5('b' || CAST(i AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000007) % 1000000007))) AS sig
        |  FROM hs5),
        |bands5 AS (SELECT doc_id, shingles, b AS band_id,
        |  md5(array_to_string(sig[b*4+1 : b*4+4], ',')) AS band_key
        |  FROM sig5, (SELECT unnest(generate_series(0, 7)) AS b)),
        |cand5 AS (SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
        |    CAST(len(list_intersect(a.shingles, c.shingles)) AS DOUBLE)
        |      / len(list_distinct(list_concat(a.shingles, c.shingles))) AS jaccard
        |  FROM bands5 a JOIN bands5 c
        |    ON a.band_id = c.band_id AND a.band_key = c.band_key AND a.doc_id < c.doc_id),
        |pairs5 AS (SELECT id_a, id_b FROM cand5 WHERE jaccard >= 0.5),
        |edges5 AS (SELECT id_a AS u, id_b AS v FROM pairs5 UNION SELECT id_b, id_a FROM pairs5),
        |reach(id, r) AS (
        |  SELECT doc_id, doc_id FROM q4
        |  UNION
        |  SELECT e.u, reach.r FROM edges5 e JOIN reach ON reach.id = e.v),
        |comp5 AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id),
        |canon AS (SELECT q4.doc_id, q4.text FROM q4 JOIN comp5 USING (doc_id) WHERE comp5.cluster_id = q4.doc_id),
        |ev AS (SELECT doc_id, lower(text) AS lt FROM documents WHERE doc_id % 100 = 0),
        |eg AS (SELECT DISTINCT unnest(g8) AS g FROM (
        |  SELECT CASE WHEN len(ws) < 8 THEN CAST([] AS VARCHAR[])
        |    ELSE list_distinct(list_transform(generate_series(1, len(ws)-7), i -> array_to_string(ws[i:i+7], ' '))) END AS g8
        |  FROM (SELECT string_split(lt, ' ') AS ws FROM ev))),
        |tg AS (SELECT doc_id, unnest(g8) AS g FROM (
        |  SELECT doc_id, CASE WHEN len(ws) < 8 THEN CAST([] AS VARCHAR[])
        |    ELSE list_distinct(list_transform(generate_series(1, len(ws)-7), i -> array_to_string(ws[i:i+7], ' '))) END AS g8
        |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM canon))),
        |cont AS (SELECT DISTINCT doc_id FROM tg SEMI JOIN eg USING (g)),
        |clean AS (SELECT canon.doc_id, canon.text FROM canon ANTI JOIN cont USING (doc_id)),
        |wm AS (SELECT c.doc_id, d.source, c.text,
        |    CAST(len(string_split(lower(c.text), ' ')) AS BIGINT) AS n_tokens
        |  FROM clean c JOIN documents d USING (doc_id)),
        |ps AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS src_tokens FROM wm GROUP BY source),
        |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens FROM wm),
        |wt AS (SELECT * FROM (VALUES ('src0', CAST(5000 AS BIGINT)), ('src1', CAST(2000 AS BIGINT))) v(source, w_bp)),
        |rr AS (SELECT ps.source,
        |    least(CAST(10000 AS BIGINT), (total_tokens * coalesce(w_bp, 100) // 10000) * 10000 // src_tokens) AS rate_bp
        |  FROM ps CROSS JOIN tot LEFT JOIN wt ON ps.source = wt.source),
        |kept7 AS (SELECT wm.doc_id, wm.text FROM wm JOIN rr ON wm.source = rr.source
        |  WHERE CAST(('0x' || substr(md5(CAST(wm.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000 < rr.rate_bp),
        |w8 AS (SELECT doc_id, text, string_split(lower(text), ' ') AS ws FROM kept7),
        |q8 AS (SELECT doc_id,
        |    least(CAST(9 AS BIGINT), CAST(floor(((CASE WHEN length(text) BETWEEN 100 AND 5000 THEN 1.0
        |          WHEN length(text) > 5000 THEN 0.5 ELSE 0.2 END +
        |     CASE WHEN CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(ws)
        |               BETWEEN 3.0 AND 8.0 THEN 1.0 ELSE 0.4 END +
        |     CAST(length(regexp_replace(text, '[^a-zA-Z ]', '', 'g')) AS DOUBLE) / length(text)
        |    ) / 3.0) * 10) AS BIGINT)) AS q_bin,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hh,
        |    CAST(len(ws) AS BIGINT) AS n_tokens
        |  FROM w8)
        |SELECT doc_id, hh % 8 AS shard, q_bin,
        |  CAST(row_number() OVER (PARTITION BY hh % 8 ORDER BY q_bin DESC, hh, doc_id) AS BIGINT) AS seq,
        |  n_tokens
        |FROM q8""".stripMargin,
    "llm_shard_plan" ->
      """WITH h AS (SELECT doc_id,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hh,
        |    CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens
        |  FROM documents)
        |SELECT doc_id, hh % 8 AS shard,
        |  CAST(row_number() OVER (PARTITION BY hh % 8 ORDER BY hh, doc_id) AS BIGINT) AS seq,
        |  n_tokens
        |FROM h""".stripMargin,
    "x1_dnf" ->
      """SELECT CAST(expr_id AS BIGINT) AS expr_id, CAST(set_id AS BIGINT) AS set_id,
        |  CAST(variants AS VARCHAR) AS variants
        |FROM (VALUES
        |(1, 0, 'V600E+T790M'),
        |(2, 0, 'V600E'), (2, 1, 'T790M'),
        |(3, 0, 'V600E+T790M'), (3, 1, 'V600E+AMP'),
        |(4, 0, 'V600E+T790M'), (4, 1, 'AMP+DEL'),
        |(5, 0, 'V600E+T790M'), (5, 1, 'V600E+AMP+DEL'),
        |(6, 0, 'Q157P+T790M'), (6, 1, 'Q157R+T790M')) AS t(expr_id, set_id, variants)""".stripMargin,
    "x2_cartesian" ->
      """WITH c AS (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem WHERE l_orderkey % 97 = 0),
        |     t AS (SELECT DISTINCT l_orderkey, l_returnflag FROM lineitem WHERE l_orderkey % 97 = 0)
        |SELECT c.l_orderkey AS order_id, c.l_linenumber AS condition, t.l_returnflag AS therapy
        |FROM c JOIN t ON c.l_orderkey = t.l_orderkey""".stripMargin,
    "x3_therapy_groups" ->
      """WITH ths AS (
        |  SELECT l_orderkey, o_orderpriority,
        |         list_sort(list(DISTINCT l_suppkey)) AS ts
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_orderkey % 97 = 0 GROUP BY 1, 2),
        |g AS (
        |  SELECT l_orderkey,
        |    CASE WHEN o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '2-%'
        |         THEN 'COMBINATION' ELSE 'SUBSTITUTES' END AS interaction,
        |    CASE WHEN o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '2-%'
        |         THEN [array_to_string(ts, '+')]
        |         ELSE list_transform(ts, x -> CAST(x AS VARCHAR)) END AS groups
        |  FROM ths)
        |SELECT l_orderkey AS order_id, interaction, unnest(groups) AS therapy_group FROM g""".stripMargin,
    "x4_biomarker_expand" ->
      """SELECT CAST(rec_id AS BIGINT) AS rec_id, CAST(combo_id AS BIGINT) AS combo_id,
        |  CAST(variants AS VARCHAR) AS variants
        |FROM (VALUES
        |(1, 0, 'KRAS:p.G12mut'), (1, 1, 'KRAS:p.G13mut'),
        |(2, 0, 'EGFR:e.19del'),
        |(3, 0, '(BCR,ABL1):fusion'),
        |(4, 0, 'KRAS:p.G12mut & TP53:cat:oncogenic mutation'),
        |(4, 1, 'KRAS:p.G13mut & TP53:cat:oncogenic mutation'),
        |(5, 0, 'KRAS:p.G12D'),
        |(6, 0, 'EGFR:p.(?746_?750)del')) AS t(rec_id, combo_id, variants)""".stripMargin,
    "x5_per_drug" ->
      """SELECT p_partkey AS part_id, unnest(string_split(p_type, ' ')) AS drug
        |FROM part WHERE p_partkey % 11 = 0""".stripMargin,
    "x6_two_statements" ->
      """SELECT o_orderkey AS order_id, 'mutation-effect' AS stmt_type,
        |       CAST(o_custkey AS VARCHAR) AS subject
        |FROM orders WHERE o_orderkey % 199 = 0
        |UNION ALL
        |SELECT o_orderkey, 'oncogenicity', CAST(o_orderkey AS VARCHAR)
        |FROM orders WHERE o_orderkey % 199 = 0""".stripMargin,
    "x7_per_relevance" ->
      """SELECT o_orderkey AS order_id,
        |  unnest(CASE WHEN o_orderstatus = 'F' THEN ['sensitivity', 'resistance']
        |              WHEN o_orderstatus = 'O' THEN ['sensitivity']
        |              ELSE ['prognosis'] END) AS relevance
        |FROM orders WHERE o_orderkey % 101 = 0""".stripMargin,
    "x8_variant_ladder" ->
      """SELECT CAST(rec_id AS BIGINT) AS rec_id, CAST(form AS VARCHAR) AS form,
        |  CAST(notation AS VARCHAR) AS notation, CAST(infers_parent AS VARCHAR) AS infers_parent
        |FROM (VALUES
        |(1, 'genomic', 'KRAS:g.1A>T', NULL),
        |(1, 'cds', 'KRAS:c.2B>C', 'genomic'),
        |(1, 'protein', 'KRAS:p.G12D', 'cds'),
        |(2, 'cds', 'EGFR:c.2573T>G', NULL),
        |(2, 'protein', 'EGFR:p.L858R', 'cds'),
        |(3, 'protein', 'ALK:p.F1174L', NULL)) AS t(rec_id, form, notation, infers_parent)""".stripMargin,
    "x9_alias_explode" ->
      """SELECT p_partkey AS part_id,
        |  unnest(list_distinct([p_brand, p_type, CAST(p_size AS VARCHAR)])) AS alias
        |FROM part WHERE p_partkey % 11 = 0""".stripMargin,
    "s2_stream_agg" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |  count(*) AS n_events, min(value) AS min_value, max(value) AS max_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    // s2c oracle: session_window merges [ts, ts+gap) overlaps — same
    // session iff delta < gap (half-open), end = last + gap
    "s2c_stream_sessions" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events),
        |l AS (SELECT *, lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) AS prev FROM e),
        |f AS (SELECT *, CASE WHEN prev IS NULL OR ts_us - prev >= 1800000000 THEN 1 ELSE 0 END AS ns FROM l),
        |c AS (SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY ts_us ROWS UNBOUNDED PRECEDING) AS sid FROM f)
        |SELECT make_timestamp(min(ts_us)) AS session_start,
        |  make_timestamp(max(ts_us) + 1800000000) AS session_end,
        |  user_id, CAST(count(*) AS BIGINT) AS n_events
        |FROM c GROUP BY user_id, sid""".stripMargin,
    "g1_loader_pipeline" ->
      """SELECT lower(replace(regexp_extract(n.id, '.*/([A-Za-z]+_[0-9]+)$', 1), '_', ':')) AS source_id,
        |  n.lbl AS name,
        |  coalesce(len(list_filter(n.meta.basicPropertyValues,
        |    x -> x.pred LIKE '%deprecated' AND x.val = 'true')) > 0, false) AS deprecated,
        |  CAST(coalesce(len(n.meta.synonyms), 0) AS BIGINT) AS n_alias
        |FROM (SELECT unnest(graphs[1].nodes) AS n
        |      FROM read_json_auto('/root/reference/test/data/doid.sample.json',
        |                          maximum_object_size=20000000))""".stripMargin,
    "g2_civic_sync" ->
      """SELECT CAST(content AS VARCHAR) AS content, CAST(bucket AS VARCHAR) AS bucket FROM (VALUES
        |('T790M+V600E|dabrafenib+trametinib|sensitivity', 'create'),
        |('V600E|gefitinib|resistance', 'create'),
        |('AMP|gefitinib|resistance', 'create'),
        |('Q157P||favourable prognosis', 'create'),
        |('Q157R||favourable prognosis', 'create'),
        |('V600E|erlotinib|resistance', 'match'),
        |('AMP|erlotinib|resistance', 'match'),
        |('OLD|old|resistance', 'gc'),
        |('4|DIAGNOSTIC|NA', 'error')) AS t(content, bucket)""".stripMargin,
    // hand-derived from the 11-row inline fixture: C1003/C1004 deprecated,
    // C1007 unroutable semantic type (error), C1008/C1009 species-dup
    // rejected, C1010/C1011 renamed to their preferred synonyms (keeping
    // the pre-reassignment displayName), the renamed synonym dropped from
    // each alias list.
    "g3_ncit" ->
      """SELECT CAST(source_id AS VARCHAR) AS source_id, CAST(name AS VARCHAR) AS name,
        |  CAST(display_name AS VARCHAR) AS display_name, CAST(endpoint AS VARCHAR) AS endpoint,
        |  alias, CAST(n_out AS BIGINT) AS n_out FROM (VALUES
        |('c1001', 'melanoma', 'Melanoma [c1001]', 'Disease', false, 0),
        |('c1002', 'glioma', 'Glioma [c1002]', 'Disease', false, 1),
        |('c1005', 'aloe vera', 'Aloe Vera [c1005]', 'Therapy', false, 0),
        |('c1006', 'aloe cream', 'Aloe Cream [c1006]', 'Therapy', false, 1),
        |('c1010', 'EGFR Receptor Variant', 'Egfr Overexpression [c1010]', 'Disease', false, 0),
        |('c1011', 'EGFR Kinase Variant', 'Egfr Overexpression [c1011]', 'Disease', false, 0),
        |('c1001', 'skin cancer dark', 'skin cancer dark [c1001]', 'Disease', true, 1),
        |('c1005', 'aloe', 'aloe [c1005]', 'Therapy', true, 1),
        |('c1010', 'ov1', 'ov1 [c1010]', 'Disease', true, 1),
        |('c1011', 'ov2', 'ov2 [c1011]', 'Disease', true, 1)
        |) AS t(source_id, name, display_name, endpoint, alias, n_out)""".stripMargin,
    "g4_oncotree" ->
      """WITH raw AS (
        |  SELECT lower(code) AS source_id, name,
        |         mainType AS subset, lower(parent) AS parent,
        |         coalesce(len(externalReferences.NCI), 0) AS n_nci,
        |         upper(code) AS code_u
        |  FROM read_json_auto('/root/reference/test/data/tumorTypes-oncotree_latest_stable.json')
        |)
        |SELECT source_id, name, name || ' [' || code_u || ']' AS display_name, subset,
        |  CAST(CASE WHEN parent IS NOT NULL AND parent IN (SELECT source_id FROM raw)
        |       THEN 1 ELSE 0 END AS BIGINT) AS n_sub,
        |  CAST(n_nci AS BIGINT) AS n_xref
        |FROM raw""".stripMargin,
    "g5_ensembl" ->
      """WITH r AS (
        |  SELECT split_part(lower("Gene stable ID version"),'.',1) AS gid,
        |         split_part(lower("Gene stable ID version"),'.',2) AS gv,
        |         split_part(lower("Transcript stable ID version"),'.',1) AS tid,
        |         split_part(lower("Transcript stable ID version"),'.',2) AS tv,
        |         split_part(lower("Protein stable ID version"),'.',1) AS pid,
        |         split_part(lower("Protein stable ID version"),'.',2) AS pv,
        |         lower("HGNC ID") AS hgnc
        |  FROM read_csv('/root/reference/test/data/ensembl_biomart_export_ENSG00000139618.tsv',
        |                delim='\t', header=true)
        |)
        |SELECT DISTINCT kind, a, b FROM (
        |  SELECT 'feature:gene' AS kind, gid AS a, gv AS b FROM r
        |  UNION ALL SELECT 'feature:gene', gid, '' FROM r
        |  UNION ALL SELECT 'feature:transcript', tid, tv FROM r
        |  UNION ALL SELECT 'feature:transcript', tid, '' FROM r
        |  UNION ALL SELECT 'feature:protein', pid, pv FROM r
        |  UNION ALL SELECT 'feature:protein', pid, '' FROM r
        |  UNION ALL SELECT 'generalizationof', gid, gid||'.'||gv FROM r
        |  UNION ALL SELECT 'generalizationof', tid, tid||'.'||tv FROM r
        |  UNION ALL SELECT 'generalizationof', pid, pid||'.'||pv FROM r
        |  UNION ALL SELECT 'elementof', tid, gid FROM r
        |  UNION ALL SELECT 'elementof', tid||'.'||tv, gid||'.'||gv FROM r
        |  UNION ALL SELECT 'elementof', pid, tid FROM r
        |  UNION ALL SELECT 'elementof', pid||'.'||pv, tid||'.'||tv FROM r
        |  UNION ALL SELECT 'crossreferenceof', gid, hgnc FROM r WHERE hgnc IS NOT NULL
        |) AS u""".stripMargin,
    "g6_hgnc" ->
      """WITH doc AS (
        |  SELECT unnest("http://rest.genenames.org/fetch/hgnc_id/1101".response.docs) AS d
        |  FROM read_json_auto('/root/reference/test/data/external_api_responses.json')
        |)
        |SELECT d.hgnc_id AS source_id, d.symbol AS name, upper(d.symbol) AS display_name,
        |       false AS deprecated, false AS dependent,
        |       CAST((CASE WHEN d.ensembl_gene_id IS NOT NULL THEN 1 ELSE 0 END)
        |          + (CASE WHEN d.entrez_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_out
        |FROM doc
        |UNION ALL
        |SELECT d.hgnc_id, p, upper(p), true, true, CAST(1 AS BIGINT)
        |FROM doc, unnest(d.prev_symbol) AS t(p)
        |UNION ALL
        |SELECT d.hgnc_id, a, upper(a), false, true, CAST(1 AS BIGINT)
        |FROM doc, unnest(d.alias_symbol) AS t(a)""".stripMargin,
    "g7_fdasrs" ->
      """WITH raw AS (
        |  SELECT UNII AS id, PT AS name, NCIT AS ncit
        |  FROM read_csv('/root/reference/test/data/UNII_Records_25Oct2018_sample.txt',
        |                delim='\t', header=true, all_varchar=true)
        |  WHERE UNII IS NOT NULL AND PT IS NOT NULL
        |)
        |SELECT id AS source_id, name,
        |  CAST(CASE WHEN ncit IS NOT NULL
        |            AND ncit <> (SELECT min(ncit) FROM raw)
        |       THEN 1 ELSE 0 END AS BIGINT) AS n_out
        |FROM raw""".stripMargin,
    "g8_vario" ->
      """WITH txt AS (
        |  SELECT content FROM read_text('/root/reference/test/data/vario_v2018-04-27.owl')
        |), block AS (
        |  SELECT unnest(regexp_extract_all(content,
        |    '<owl:Class rdf:about="http://purl\.obolibrary\.org/obo/VariO_[0-9]+">.*?</owl:Class>',
        |    0, 's')) AS b
        |  FROM txt
        |), parsed AS (
        |  SELECT
        |    lower(replace(regexp_extract(b, 'obo/(VariO_[0-9]+)"', 1), '_', ':')) AS source_id,
        |    trim(regexp_extract(b, '<rdfs:label[^>]*>(.*?)</rdfs:label>', 1, 's')) AS name,
        |    regexp_matches(b, '<obo:IAO_0000115') AS has_desc,
        |    list_transform(
        |      regexp_extract_all(b,
        |        '<rdfs:subClassOf rdf:resource="http://purl\.obolibrary\.org/obo/(VariO_[0-9]+)"', 1),
        |      s -> lower(replace(s, '_', ':'))) AS subs
        |  FROM block
        |), labeled AS (SELECT * FROM parsed WHERE name <> ''
        |), edge AS (
        |  SELECT l.source_id, t.s AS tgt FROM labeled l, unnest(l.subs) AS t(s)
        |), good AS (
        |  SELECT source_id, count(*) AS n_sub FROM edge
        |  WHERE tgt IN (SELECT source_id FROM labeled) GROUP BY 1
        |)
        |SELECT l.source_id, l.name, l.has_desc,
        |  CAST(coalesce(g.n_sub, 0) AS BIGINT) AS n_sub
        |FROM labeled l LEFT JOIN good g USING (source_id)""".stripMargin,
    "g9_ctg" ->
      """WITH raw AS (
        |  SELECT protocolSection AS p
        |  FROM read_json_auto('/root/reference/test/data/clinicaltrialsgov.NCT03478891.json')
        |)
        |SELECT p.identificationModule.nctId AS source_id,
        |  coalesce(p.identificationModule.officialTitle,
        |           p.identificationModule.briefTitle) AS name,
        |  CASE WHEN lower(replace(p.statusModule.overallStatus, '_', ' ')) = 'active not recruiting'
        |         THEN 'active, not recruiting'
        |       WHEN lower(replace(p.statusModule.overallStatus, '_', ' ')) = 'unknown status'
        |         THEN 'unknown'
        |       ELSE replace(p.statusModule.overallStatus, '_', ' ') END AS status,
        |  regexp_extract(lower(p.designModule.phases[1]), 'phase([0-9]+)', 1) AS phase,
        |  strftime(p.statusModule.startDateStruct.date, '%Y-%m-%d') AS start_date,
        |  strftime(p.statusModule.completionDateStruct.date, '%Y-%m-%d') AS completion_date,
        |  strftime(p.statusModule.lastUpdatePostDateStruct.date, '%Y-%m-%d') AS source_id_version,
        |  lower(p.contactsLocationsModule.locations[1].country) AS country,
        |  lower(p.contactsLocationsModule.locations[1].city) AS city,
        |  'Missing: Disease(' || p.conditionsModule.conditions[1] || ')' AS comment,
        |  CAST(1 AS BIGINT) AS n_links
        |FROM raw""".stripMargin,
    "g10_refseq" ->
      """WITH r AS (
        |  SELECT GeneID,
        |         split_part(RNA, '.', 1) AS rna, split_part(RNA, '.', 2) AS rnav,
        |         split_part(coalesce(Protein, ''), '.', 1) AS prot,
        |         split_part(coalesce(Protein, ''), '.', 2) AS protv
        |  FROM read_csv('/root/reference/test/data/LRG_RefSeqGene_d1541209245_kras.tab',
        |                delim='\t', header=true, all_varchar=true)
        |  WHERE RNA IS NOT NULL AND RNA <> ''
        |), gene AS (
        |  SELECT r1."3845".uid AS uid, r1."3845".name AS name
        |  FROM (SELECT result AS r1
        |        FROM read_json_auto('/root/reference/test/data/entrez_gene.3845.json'))
        |)
        |SELECT DISTINCT kind, a, b FROM (
        |  SELECT 'feature:transcript' AS kind, rna AS a, rnav AS b FROM r
        |  UNION ALL SELECT 'feature:transcript', rna, '' FROM r
        |  UNION ALL SELECT 'feature:protein', prot, protv FROM r WHERE prot <> ''
        |  UNION ALL SELECT 'feature:protein', prot, '' FROM r WHERE prot <> ''
        |  UNION ALL SELECT 'feature:gene', uid, name FROM gene
        |  UNION ALL SELECT 'generalizationof', rna, rna || '.' || rnav FROM r
        |  UNION ALL SELECT 'generalizationof', prot, prot || '.' || protv FROM r WHERE prot <> ''
        |  UNION ALL SELECT 'elementof', prot, rna FROM r WHERE prot <> ''
        |  UNION ALL SELECT 'elementof', prot || '.' || protv, rna || '.' || rnav FROM r WHERE prot <> ''
        |  UNION ALL SELECT 'elementof', rna, 'entrez:' || GeneID FROM r
        |    WHERE GeneID IN (SELECT uid FROM gene)
        |) AS u""".stripMargin,
    "g11_chembl" ->
      """WITH m AS (
        |  SELECT * FROM read_json_auto('/root/reference/test/data/chembl.CHEMBL553.json')
        |)
        |SELECT molecule_chembl_id AS source_id,
        |  coalesce(pref_name, molecule_properties.full_molformula) AS name,
        |  coalesce(pref_name, molecule_properties.full_molformula)
        |    || ' [' || upper(molecule_chembl_id) || ']' AS display_name,
        |  molecule_properties.full_molformula AS molecular_formula,
        |  CAST(1 AS BIGINT) AS n_out
        |FROM m
        |UNION ALL
        |SELECT usan_stem_definition, usan_stem_definition, usan_stem_definition,
        |  NULL, CAST(0 AS BIGINT)
        |FROM m WHERE usan_stem_definition IS NOT NULL""".stripMargin,
    // g30: frozen from the implementation once, cross-checked against
    // cgl/index.js:33-295 (paren strip + Ter rewrite on x2, fs star kept
    // on x3, VCF deletion span on x4, the empty-insertion quirk on x5,
    // the first-base mismatch error on x6).
    "g30_cgl" ->
      """SELECT CAST(kind AS VARCHAR) AS kind, CAST(a AS VARCHAR) AS a,
        |  CAST(b AS VARCHAR) AS b, CAST(c AS VARCHAR) AS c FROM (VALUES
        |('count:error', '1', '', ''),
        |('infers', '7:g.55259515T>G@t:sub', 'NM_005228.5:c.2573T>G@t:sub', ''),
        |('infers', 'NM_000546.5:c.1000del@t:del', '7157:p.G12fs*3@t:fs', ''),
        |('infers', 'NM_005228.5:c.2573T>G@t:sub', '1956:p.L858R@t:sub', ''),
        |('statement', 'x1', 'pathogenic|d:cancer', '1956:p.L858R@t:sub,d:cancer'),
        |('statement', 'x2', 'pathogenic|d:cancer', '7157:p.R306Ter@t:sub,d:cancer'),
        |('statement', 'x3', 'pathogenic|d:cancer', '7157:p.G12fs*3@t:fs,d:cancer'),
        |('statement', 'x4', 'pathogenic|d:cancer', '12:g.100_102delACG@t:del,d:cancer'),
        |('statement', 'x5', 'pathogenic|d:cancer', '7:g.200_201ins@t:ins,d:cancer'),
        |('variant:cds', 'NM_000546.5:c.1000del@t:del', 't:del', 'c.1000|-'),
        |('variant:cds', 'NM_005228.5:c.2573T>G@t:sub', 't:sub', 'c.2573|-'),
        |('variant:genomic', '12:g.100_102delACG@t:del', 't:del', 'g.100|hg19'),
        |('variant:genomic', '7:g.200_201ins@t:ins', 't:ins', 'g.200|hg19'),
        |('variant:genomic', '7:g.55259515T>G@t:sub', 't:sub', 'g.55259515|hg19'),
        |('variant:protein', '1956:p.L858R@t:sub', 't:sub', 'p.L858|-'),
        |('variant:protein', '7157:p.G12fs*3@t:fs', 't:fs', 'p.G12|-'),
        |('variant:protein', '7157:p.R306Ter@t:sub', 't:sub', 'p.R306|-')
        |) AS t(kind, a, b, c)""".stripMargin,
    // g31: frozen from the implementation once, cross-checked against
    // sequenceOntology.js:51-129 by hand (unlabeled SO_0000999 errors out,
    // `_`→space names, deprecated literal, owl#Thing parent fails the
    // /^so:\d+$/i gate, both dangling links dropped).
    "g31_so" ->
      """SELECT CAST(kind AS VARCHAR) AS kind, CAST(a AS VARCHAR) AS a,
        |  CAST(b AS VARCHAR) AS b, CAST(c AS VARCHAR) AS c FROM (VALUES
        |('count:edge_drops', '2', '', ''),
        |('count:errors', '1', '', ''),
        |('entity', 'so:0000001', 'region', 'false|A sequence feature region'),
        |('entity', 'so:0000002', 'sequence secondary structure', 'true|-'),
        |('entity', 'so:0000003', 'G quartet', 'false|-'),
        |('entity', 'so:0000110', 'sequence feature', 'false|-'),
        |('subclassof', 'so:0000001', 'so:0000110', ''),
        |('subclassof', 'so:0000002', 'so:0000110', '')
        |) AS t(kind, a, b, c)""".stripMargin,
    // g32: frozen from the implementation once, cross-checked against
    // gscTherapeuticOntology.js:31-233 by hand (r1 ladder hit on drugbank
    // with self-alias filtered, r2 chembl rung, r3 drug==parent edge
    // guard + first-wins 'general' tag from r1's gp1 creation, r4 DBid
    // miss error with the record kept, r5 class→drug crossref).
    "g32_gsct" ->
      """SELECT CAST(kind AS VARCHAR) AS kind, CAST(a AS VARCHAR) AS a,
        |  CAST(b AS VARCHAR) AS b, CAST(c AS VARCHAR) AS c FROM (VALUES
        |('aliasof', 'gsct:azd6244', 'chembl:CHEMBL1614701', ''),
        |('aliasof', 'gsct:plx4032', 'drugbank:DB08881', ''),
        |('aliasof', 'gsct:rg7204', 'drugbank:DB08881', ''),
        |('count:errors', '1', '', ''),
        |('crossreferenceof', 'gsct:trametinib', 'drugbank:DB08911', ''),
        |('entity', 'azd6244', 'azd6244', ''),
        |('entity', 'baddrug', 'baddrug', ''),
        |('entity', 'kinase inhibitor', 'kinase inhibitor', 'general drug class'),
        |('entity', 'mapk pathway inhibitor', 'mapk pathway inhibitor', 'pathway drug class'),
        |('entity', 'mek inhibitor', 'mek inhibitor', 'specific drug class'),
        |('entity', 'mekinist', 'mekinist', ''),
        |('entity', 'plx4032', 'plx4032', ''),
        |('entity', 'raf inhibitor', 'raf inhibitor', 'specific drug class'),
        |('entity', 'rg7204', 'rg7204', ''),
        |('entity', 'trametinib', 'trametinib', 'specific drug class'),
        |('subclassof', 'chembl:CHEMBL1614701', 'gsct:mek inhibitor', ''),
        |('subclassof', 'drugbank:DB08881', 'gsct:raf inhibitor', ''),
        |('subclassof', 'gsct:mek inhibitor', 'gsct:kinase inhibitor', ''),
        |('subclassof', 'gsct:mekinist', 'gsct:trametinib', ''),
        |('subclassof', 'gsct:raf inhibitor', 'gsct:kinase inhibitor', ''),
        |('subclassof', 'gsct:raf inhibitor', 'gsct:mapk pathway inhibitor', ''),
        |('subclassof', 'gsct:trametinib', 'gsct:mek inhibitor', '')
        |) AS t(kind, a, b, c)""".stripMargin,
    // g34: VALUES derived mechanically from sources.js:1-298 (independent
    // re-extraction of the structural fields), resolve rows re-derived
    // from graphkb.js:152-159 rank-compare semantics by hand.
    "g34_all_sources" ->
      """SELECT CAST(kind AS VARCHAR) AS kind, CAST(a AS VARCHAR) AS a,
        |  CAST(b AS VARCHAR) AS b, CAST(c AS VARCHAR) AS c FROM (VALUES
        |('resolve', 'imatinib', 'drugbank', ''),
        |('resolve', 'kras', 'oncokb', ''),
        |('resolve', 'melanoma', 'disease ontology', ''),
        |('source', 'PMC4232638-supp', 'PMC4232638-supp', '-'),
        |('source', 'PMC4468049-supp', 'PMC4468049-supp', '-'),
        |('source', 'Variant Interpretation for Cancer Consortium', 'VICC', '-'),
        |('source', 'amp', 'AMP', '-'),
        |('source', 'asco', 'ASCO', '-'),
        |('source', 'cancer genome interpreter', 'CGI', '-'),
        |('source', 'cancerhotspots.org', 'cancerhotspots.org', '-'),
        |('source', 'cgl', 'CGL', '-'),
        |('source', 'chembl', 'ChEMBL', '1'),
        |('source', 'civic', 'CIViC', '4'),
        |('source', 'clinicaltrials.gov', '-', '-'),
        |('source', 'cosmic', 'COSMIC', '-'),
        |('source', 'cpic', 'CPIC', '-'),
        |('source', 'database of curated mutations', 'DoCM', '-'),
        |('source', 'dbsnp', 'dbSNP', '-'),
        |('source', 'dgidb', 'DGIdb', '-'),
        |('source', 'disease ontology', 'Disease Ontology', '1'),
        |('source', 'drugbank', 'DrugBank', '0'),
        |('source', 'ensembl', 'Ensembl', '3'),
        |('source', 'entrez gene', '-', '1'),
        |('source', 'esmo', 'ESMO', '1'),
        |('source', 'fda approvals', 'FDA Approvals', '-'),
        |('source', 'fda srs', 'FDA-SRS', '3'),
        |('source', 'graphkb', 'GraphKB', '0'),
        |('source', 'gsc therapeutic ontology', 'GSC-TO', '5'),
        |('source', 'hgnc', 'HGNC', '2'),
        |('source', 'ipr', 'IPR', '-'),
        |('source', 'iprkb', 'IPRKB', '-'),
        |('source', 'moa', 'MOAlmanac', '-'),
        |('source', 'ncit', 'NCIt', '2'),
        |('source', 'oncokb', 'OncoKB', '99999'),
        |('source', 'oncotree', 'OncoTree', '0'),
        |('source', 'profyle', 'PROFYLE', '99999'),
        |('source', 'pubmed', 'PubMed', '-'),
        |('source', 'refseq', 'RefSeq', '-'),
        |('source', 'sequence ontology', '-', '-'),
        |('source', 'tso500', 'TSO500', '99999'),
        |('source', 'uberon', 'Uberon', '-'),
        |('source', 'vario', '-', '-')
        |) AS t(kind, a, b, c)""".stripMargin,
    // ldr_ncit_scale: full replay of the synthetic concept derivation,
    // cleanRawRow on this palette (lowercase ids/names, original-case
    // displayName, Deprecated-code parent filter), the collision window
    // rename, alias explosion and both edge families (ncit/index.js:
    // 61-189, 231-463 semantics on the branches this palette hits).
    "ldr_ncit_scale" ->
      """WITH ev AS (SELECT event_id AS i FROM events),
        |st AS MATERIALIZED (
        |  SELECT 'c'||i AS sourceId, i,
        |    i%23=0 OR (i>0 AND ('C'||(i//2)) IN ('C61063','C85834')) AS deprecated,
        |    CASE WHEN i>0 AND NOT ('C'||(i//2)) IN ('C61063','C85834')
        |      THEN 'c'||(i//2) END AS parent,
        |    'name '||(i//3) AS name0,
        |    'Name '||(i//3)||' [c'||i||']' AS displayName,
        |    CASE WHEN i%5=0 THEN 'Syn '||i END AS osyn1,
        |    CASE WHEN i%5=0 THEN 'syn '||i END AS syn1,
        |    CASE WHEN i%5=0 THEN 'alt '||i END AS syn2
        |  FROM ev),
        |live AS MATERIALIZED (
        |  SELECT *, count(*) OVER (PARTITION BY name0) AS d FROM st WHERE NOT deprecated),
        |res AS MATERIALIZED (
        |  SELECT *, CASE WHEN d>1 THEN coalesce(osyn1, name0) ELSE name0 END AS name FROM live),
        |syns AS MATERIALIZED (
        |  SELECT sourceId, name, s FROM (
        |    SELECT sourceId, name, unnest([syn1, syn2]) AS s FROM res)
        |  WHERE s IS NOT NULL AND lower(s) != lower(name)),
        |prims AS (SELECT 'v' AS kind, sourceId AS a, name AS b, displayName AS c, 'false' AS d FROM res),
        |aliases AS (SELECT 'v', sourceId, s, s||' ['||sourceId||']', 'true' FROM syns),
        |aliasEdges AS (
        |  SELECT 'e', 'aliasof', sourceId||'|'||s, sourceId||'|'||name, '' FROM syns),
        |subEdges AS (
        |  SELECT 'e', 'SubClassOf', c.sourceId||'|'||c.name, p.sourceId||'|'||p.name, ''
        |  FROM res c JOIN res p ON c.parent = p.sourceId)
        |SELECT * FROM prims
        |UNION ALL SELECT * FROM aliases
        |UNION ALL SELECT * FROM aliasEdges
        |UNION ALL SELECT * FROM subEdges
        |""".stripMargin,
    // ldr_hotspot_scale: full replay of the synthetic hotspot records,
    // the four HGVS shape parses (notation/term/break1 are pure
    // functions of the m=event_id%4 palette), the dim ladder, fatal-
    // gene census and statement build (cancerhotspots/index.js:56-243).
    "ldr_hotspot_scale" ->
      """WITH ev AS (SELECT event_id FROM events),
        |rec AS MATERIALIZED (
        |  SELECT 'h'||event_id AS recId, event_id, event_id % 4 AS m,
        |    event_id + 100 AS strt, event_id + 100 + (CASE WHEN event_id%4=0 THEN 0 ELSE 1 END) AS stp,
        |    event_id % 22 + 1 AS ci,
        |    'chr'||(event_id%22+1) AS chr_sid,
        |    CASE WHEN event_id%2=0 THEN 'chr'||(event_id%22+1) ELSE 'nm'||(event_id%22+1) END AS chr_raw,
        |    'G'||(event_id%300) AS geneId,
        |    'T'||(event_id%100) AS txId,
        |    'd'||(event_id%10) AS diseaseId,
        |    event_id % 300 < 250 AS gene_ok,
        |    event_id % 100 < 80 AS tx_ok,
        |    event_id % 10 < 8 AS dis_ok
        |  FROM ev),
        |forms AS MATERIALIZED (
        |  SELECT *,
        |    -- genomic: notation from the shape palette, chromosome always resolves
        |    chr_raw||':g.'||(CASE WHEN m=0 THEN strt||'A>T'
        |      WHEN m=1 THEN strt||'_'||stp||'insAG'
        |      WHEN m=2 THEN strt||'_'||stp||'delTG'
        |      ELSE strt||'_'||stp||'delAAinsCGG' END) AS g_notation,
        |    CASE m WHEN 0 THEN 't:sub' WHEN 1 THEN 't:ins' WHEN 2 THEN 't:del' ELSE 't:indel' END AS g_term,
        |    'g.'||strt AS g_break1,
        |    CASE m WHEN 0 THEN 'p.G'||(event_id%50+13)||'D'
        |      WHEN 1 THEN 'p.P'||(event_id%50+2)||'fs'
        |      WHEN 2 THEN 'p.E3_A4delEA' ELSE 'p.K5delKinsRG' END AS p_notation,
        |    CASE m WHEN 0 THEN 't:sub' WHEN 1 THEN 't:fs' WHEN 2 THEN 't:del' ELSE 't:indel' END AS p_term,
        |    CASE m WHEN 0 THEN 'p.G'||(event_id%50+13) WHEN 1 THEN 'p.P'||(event_id%50+2)
        |      WHEN 2 THEN 'p.E3' ELSE 'p.K5' END AS p_break1,
        |    CASE m WHEN 0 THEN 'c.'||(event_id%500+1)||'G>A'
        |      WHEN 1 THEN 'c.4_5insAG' WHEN 2 THEN 'c.7_12delGAAGCA'
        |      ELSE 'c.13_15delAAGinsCG' END AS c_notation,
        |    CASE m WHEN 0 THEN 't:sub' WHEN 1 THEN 't:ins' WHEN 2 THEN 't:del' ELSE 't:indel' END AS c_term,
        |    CASE m WHEN 0 THEN 'c.'||(event_id%500+1) WHEN 1 THEN 'c.4' WHEN 2 THEN 'c.7' ELSE 'c.13' END AS c_break1
        |  FROM rec),
        |-- protein failure is fatal to the record
        |live AS MATERIALIZED (SELECT * FROM forms WHERE gene_ok),
        |vids AS MATERIALIZED (
        |  SELECT *,
        |    chr_sid||':'||g_notation||'@'||g_term AS genomic_vid,
        |    geneId||':'||p_notation||'@'||p_term AS protein_vid,
        |    CASE WHEN tx_ok THEN txId||':'||c_notation||'@'||c_term END AS cds_vid
        |  FROM live),
        |vars AS (
        |  SELECT DISTINCT 'variant:genomic' AS kind, genomic_vid AS a, g_term AS b, g_break1 AS c, chr_sid AS d FROM vids
        |  UNION ALL
        |  SELECT DISTINCT 'variant:protein', protein_vid, p_term, p_break1, geneId FROM vids
        |  UNION ALL
        |  SELECT DISTINCT 'variant:cds', cds_vid, c_term, c_break1, txId FROM vids WHERE cds_vid IS NOT NULL),
        |edges AS (
        |  SELECT DISTINCT 'infers' AS kind, cds_vid AS a, protein_vid AS b, '' AS c, '' AS d FROM vids WHERE cds_vid IS NOT NULL
        |  UNION
        |  SELECT DISTINCT 'infers', genomic_vid, coalesce(cds_vid, protein_vid), '', '' FROM vids),
        |stmts AS (
        |  SELECT 'statement' AS kind, recId AS a, diseaseId AS b,
        |    array_to_string(list_sort([protein_vid, diseaseId]), ',') AS c, '' AS d
        |  FROM vids WHERE dis_ok),
        |errs AS (
        |  SELECT 'count:record_errors' AS kind, CAST(count(*) AS VARCHAR) AS a, '' AS b, '' AS c, '' AS d
        |  FROM rec WHERE NOT gene_ok)
        |SELECT * FROM vars UNION ALL SELECT * FROM edges UNION ALL SELECT * FROM stmts UNION ALL SELECT * FROM errs
        |""".stripMargin,
    // ldr_fusion_scale: full replay of the synthetic fusion corpus
    // derivation + the three-level rollup, threshold, suppression and
    // disease resolution (fusions.js:163-221 semantics).
    "ldr_fusion_scale" ->
      """WITH ev AS (SELECT event_id, user_id FROM events),
        |nn AS (SELECT count(*) AS n FROM ev),
        |base AS (
        |  SELECT event_id % greatest(nn.n // 50, 1) AS k, event_id, user_id FROM ev, nn),
        |raw AS (
        |  SELECT 'r'||event_id AS recId,
        |    's'||(user_id % (CASE WHEN k%11=0 THEN 2 ELSE 40 END)) AS sampleId,
        |    'G'||k||(CASE WHEN k%6=0 THEN '_v1' ELSE '' END) AS gene1,
        |    'H'||k AS gene2,
        |    CAST(CASE WHEN k%7=1 THEN event_id*37%101+1 ELSE event_id%3+1 END AS VARCHAR) AS exon1,
        |    CAST(CASE WHEN k%7=1 THEN event_id*37%101+1 ELSE event_id%3+1 END AS VARCHAR) AS exon2,
        |    CASE WHEN k%4=0 THEN 'NS' ELSE 'D'||(k%4) END AS disease,
        |    CASE WHEN k%5=0 THEN 'NS' ELSE 'F'||(k%5) END AS diseaseFamily
        |  FROM base),
        |-- preprocess (fusions.js:163-186 semantics as implemented)
        |pre AS MATERIALIZED (
        |  SELECT recId, sampleId,
        |    split_part(gene1, '_', 1) AS g1, split_part(gene2, '_', 1) AS g2,
        |    exon1, exon2,
        |    CASE WHEN upper(disease)='NS' THEN '' ELSE disease END AS disease,
        |    CASE WHEN (CASE WHEN upper(disease)='NS' THEN '' ELSE disease END)=''
        |           AND (CASE WHEN upper(diseaseFamily)='NS' THEN '' ELSE diseaseFamily END)=''
        |         THEN 'cancer'
        |         ELSE (CASE WHEN upper(diseaseFamily)='NS' THEN '' ELSE diseaseFamily END) END AS diseaseFamily,
        |    '('||split_part(gene1,'_',1)||','||split_part(gene2,'_',1)||').fus(e.'||exon1||',e.'||exon2||')' AS variant,
        |    '('||split_part(gene1,'_',1)||','||split_part(gene2,'_',1)||').fus(e.?,e.?)' AS nonSpecificVariant
        |  FROM raw),
        |dis AS (SELECT * FROM (VALUES ('D1','d:1'),('D2','d:2'),('cancer','d:c'),('F1','d:f1'),('F2','d:f2')) d(diseaseName, disease_sid)),
        |-- level 0 winners
        |w0 AS (
        |  SELECT variant, diseaseFamily, disease,
        |    count(DISTINCT sampleId) AS n_samples, min(recId) AS repId
        |  FROM pre GROUP BY 1,2,3 HAVING count(DISTINCT sampleId) >= 3),
        |r0 AS (
        |  SELECT 0 AS level, w.n_samples, p.recId AS rep_recId, p.g1, p.g2, p.exon1, p.exon2,
        |    p.disease AS rep_disease, p.diseaseFamily AS rep_family, p.nonSpecificVariant AS rep_nonspec,
        |    d.disease_sid
        |  FROM w0 w JOIN pre p ON p.recId = w.repId
        |  LEFT JOIN dis d ON d.diseaseName = coalesce(nullif(p.disease,''), nullif(p.diseaseFamily,''))),
        |s0 AS (SELECT * FROM r0 WHERE disease_sid IS NOT NULL),
        |-- level 1: nonspec/fam/dis groups not blocked by a successful level-0 winner
        |w1 AS (
        |  SELECT nonSpecificVariant, diseaseFamily, disease,
        |    count(DISTINCT sampleId) AS n_samples, min(recId) AS repId
        |  FROM pre GROUP BY 1,2,3 HAVING count(DISTINCT sampleId) >= 3),
        |w1b AS (
        |  SELECT w.* FROM w1 w
        |  WHERE NOT EXISTS (SELECT 1 FROM s0 WHERE s0.rep_nonspec = w.nonSpecificVariant
        |    AND s0.rep_family = w.diseaseFamily AND s0.rep_disease = w.disease)),
        |r1 AS (
        |  SELECT 1 AS level, w.n_samples, p.recId AS rep_recId, p.g1, p.g2, p.exon1, p.exon2,
        |    p.disease AS rep_disease, p.diseaseFamily AS rep_family, p.nonSpecificVariant AS rep_nonspec,
        |    d.disease_sid
        |  FROM w1b w JOIN pre p ON p.recId = w.repId
        |  LEFT JOIN dis d ON d.diseaseName = coalesce(nullif(p.disease,''), nullif(p.diseaseFamily,''))),
        |s1 AS (SELECT * FROM r1 WHERE disease_sid IS NOT NULL),
        |-- level 2: nonspec groups not blocked by any successful earlier winner
        |w2 AS (
        |  SELECT nonSpecificVariant, count(DISTINCT sampleId) AS n_samples, min(recId) AS repId
        |  FROM pre GROUP BY 1 HAVING count(DISTINCT sampleId) >= 3),
        |w2b AS (
        |  SELECT w.* FROM w2 w
        |  WHERE w.nonSpecificVariant NOT IN (SELECT rep_nonspec FROM s0)
        |    AND w.nonSpecificVariant NOT IN (SELECT rep_nonspec FROM s1)),
        |r2 AS (
        |  SELECT 2 AS level, w.n_samples, p.recId AS rep_recId, p.g1, p.g2, p.exon1, p.exon2,
        |    p.disease AS rep_disease, p.diseaseFamily AS rep_family, p.nonSpecificVariant AS rep_nonspec,
        |    d.disease_sid
        |  FROM w2b w JOIN pre p ON p.recId = w.repId
        |  LEFT JOIN dis d ON d.diseaseName = 'cancer'),
        |resolved AS (SELECT * FROM r0 UNION ALL SELECT * FROM r1 UNION ALL SELECT * FROM r2),
        |live AS (
        |  SELECT *,
        |    g1||'::'||g2||':fusion' AS general_vid,
        |    CASE WHEN level=0 THEN g1||'::'||g2||':fus(e.'||exon1||',e.'||exon2||')' END AS specific_vid
        |  FROM resolved WHERE disease_sid IS NOT NULL),
        |stmts AS (
        |  SELECT rep_recId AS sourceId, CAST(level AS BIGINT) AS level,
        |    'recurrent' AS relevance, coalesce(specific_vid, general_vid) AS condition,
        |    disease_sid AS subject, CAST(n_samples AS BIGINT) AS n_samples
        |  FROM live),
        |errs AS (
        |  SELECT '__errors' AS sourceId, CAST(-1 AS BIGINT) AS level, '' AS relevance,
        |    '' AS condition, '' AS subject,
        |    CAST(count(*) AS BIGINT) AS n_samples
        |  FROM resolved WHERE disease_sid IS NULL)
        |SELECT * FROM stmts UNION ALL SELECT * FROM errs
        |""".stripMargin,
    // g35: VALUES re-derived independently from the raw fixture (regex
    // over drugbank_sample.xml: one drug DB00530/Erlotinib updated
    // 2019-07-02; product names Apo-/Nat-/PMS-/Teva-erlotinib fail
    // ^[a-zA-Z]\w+$, 'Erlotinib'+'Erlotinib Hydrochloride' excluded →
    // tarceva is the only alias; unii J4T82NDH7E; ChEMBL CHEMBL553; one
    // HGNC:3236 target with action 'antagonist'; IUPAC + formula from
    // calculated-properties; atc-code L01XE03 → 4 levels most-specific
    // first, codes lowercased, drug→l01xe + 3 ladder rungs; 2 categories
    // → subsets) and drugbank/index.js:38-249 semantics.
    "g35_drugbank" ->
      """SELECT CAST(kind AS VARCHAR) AS kind, CAST(a AS VARCHAR) AS a,
        |  CAST(b AS VARCHAR) AS b, CAST(c AS VARCHAR) AS c,
        |  CAST(d AS VARCHAR) AS d FROM (VALUES
        |('therapy', 'DB00530', 'Erlotinib', 'false', '-'),
        |('therapy', 'DB00530', 'tarceva', 'true', 'DB00530|Erlotinib'),
        |('therapy', 'l01xe', 'Protein kinase inhibitors', 'false', '-'),
        |('therapy', 'l01x', 'OTHER ANTINEOPLASTIC AGENTS', 'false', '-'),
        |('therapy', 'l01', 'ANTINEOPLASTIC AGENTS', 'false', '-'),
        |('therapy', 'l', 'ANTINEOPLASTIC AND IMMUNOMODULATING AGENTS', 'false', '-'),
        |('field', 'DB00530', 'sourceIdVersion', '2019-07-02', ''),
        |('field', 'DB00530', 'iupacName', 'N-(3-ethynylphenyl)-6,7-bis(2-methoxyethoxy)quinazolin-4-amine', ''),
        |('field', 'DB00530', 'molecularFormula', 'C22H23N3O4', ''),
        |('field', 'DB00530', 'mechanismOfAction', 'The mechanism of clinical antitumor acti', ''),
        |('field', 'DB00530', 'description', 'Erlotinib is an inhibitor of the epiderm', ''),
        |('field', 'DB00530', 'subsets', 'Antineoplastic Agents;Antineoplastic and Immunomodulating Agents', ''),
        |('edge', 'aliasof', 'DB00530|tarceva', 'DB00530|Erlotinib', '-'),
        |('edge', 'CrossReferenceOf', 'DB00530|Erlotinib', 'J4T82NDH7E|ERLOTINIB', '-'),
        |('edge', 'CrossReferenceOf', 'DB00530|Erlotinib', 'CHEMBL553|ERLOTINIB', '-'),
        |('edge', 'targetof', 'egfr', 'DB00530|Erlotinib', 'antagonist'),
        |('edge', 'subclassof', 'DB00530|Erlotinib', 'l01xe|Protein kinase inhibitors', '-'),
        |('edge', 'subclassof', 'l01xe|Protein kinase inhibitors', 'l01x|OTHER ANTINEOPLASTIC AGENTS', '-'),
        |('edge', 'subclassof', 'l01x|OTHER ANTINEOPLASTIC AGENTS', 'l01|ANTINEOPLASTIC AGENTS', '-'),
        |('edge', 'subclassof', 'l01|ANTINEOPLASTIC AGENTS', 'l|ANTINEOPLASTIC AND IMMUNOMODULATING AGENTS', '-'),
        |('rerun', 'mutations', '0', '', '')
        |) AS t(kind, a, b, c, d)""".stripMargin,
    // g33: frozen from the implementation once, cross-checked against
    // variants/index.js:9-81 by hand (badnotation parse rung, c.100dup
    // vocab rung, MISSING9 gene rung, NOVEL1 fetched past the transcript
    // homonym, fusion double-reference key).
    // g36: frozen from the implementation once, cross-checked against
    // entrez/snp.js by hand (parseRecord docsum split :107-130 — the
    // sort().reverse() transcript pick and &gt; unescape; the
    // loadFromDocsumHgvs ladder :45-104 — cds leg, protein leg with
    // |GENE= alternate, per-leg error catch; loadSnpRecord Infers chain
    // :118-131; fetchAndLoadByIds cache skip :139-150).
    "g36_snp" ->
      """SELECT CAST(kind AS VARCHAR) AS kind, CAST(a AS VARCHAR) AS a,
        |  CAST(b AS VARCHAR) AS b, CAST(c AS VARCHAR) AS c,
        |  CAST(d AS VARCHAR) AS d FROM (VALUES
        |('catalogue','121434568','rs121434568','2022/10/13 16:44','https://www.ncbi.nlm.nih.gov/snp/rs121434568'),
        |('catalogue','28934576','rs28934576','2022/10/13 17:02','https://www.ncbi.nlm.nih.gov/snp/rs28934576'),
        |('catalogue','1042522','rs1042522','2022/10/13 17:02','https://www.ncbi.nlm.nih.gov/snp/rs1042522'),
        |('catalogue','9999999','rs9999999','2022/10/13 17:02','https://www.ncbi.nlm.nih.gov/snp/rs9999999'),
        |('feature:refseq','NM_005228','transcript','-','NM_005228.5'),
        |('feature:refseq','NP_005219','protein','-','NP_005219.2'),
        |('feature:refseq','NP_000537','protein','-','NP_000537.3'),
        |('feature:gene','1956','gene','EGFR','EGFR'),
        |('variant','NM_005228:NM_005228.5:c.2573T>G@so:substitution','NM_005228.5:c.2573T>G','c.2573','NM_005228'),
        |('variant','NP_005219:NP_005219.2:p.Leu858Arg@so:substitution','NP_005219.2:p.Leu858Arg','p.L858','NP_005219'),
        |('variant','1956:NP_005219.2:p.Leu858Arg@so:substitution','NP_005219.2:p.Leu858Arg','p.L858','1956'),
        |('variant','NP_000537:NP_000537.3:p.Arg273His@so:substitution','NP_000537.3:p.Arg273His','p.R273','NP_000537'),
        |('edge','Infers','NM_005228:NM_005228.5:c.2573T>G@so:substitution','NP_005219:NP_005219.2:p.Leu858Arg@so:substitution',''),
        |('edge','Infers','NP_005219:NP_005219.2:p.Leu858Arg@so:substitution','1956:NP_005219.2:p.Leu858Arg@so:substitution',''),
        |('edge','Infers','NM_005228:NM_005228.5:c.2573T>G@so:substitution','rs121434568',''),
        |('edge','Infers','NP_000537:NP_000537.3:p.Arg273His@so:substitution','rs28934576',''),
        |('count','hgvs_errors','1','',''),
        |('count','misses','1','',''),
        |('rerun','mutations','0','','')
        |) AS t(kind, a, b, c, d)""".stripMargin,
    "g33_variants" ->
      """SELECT CAST(kind AS VARCHAR) AS kind, CAST(a AS VARCHAR) AS a,
        |  CAST(b AS VARCHAR) AS b, CAST(c AS VARCHAR) AS c FROM (VALUES
        |('count:gene_errors', '1', '', ''),
        |('count:parse_errors', '1', '', ''),
        |('count:vocab_errors', '1', '', ''),
        |('gene', '1956', 'EGFR', 'gene'),
        |('gene', '25', 'ABL1', 'gene'),
        |('gene', '3845', 'KRAS', 'gene'),
        |('gene', '555', 'NOVEL1', 'transcript'),
        |('gene', '613', 'BCR', 'gene'),
        |('gene', '9999', 'NOVEL1', 'gene'),
        |('variant', '1956:c.2573T>G@t:sub', 't:sub', 'c.2573|-'),
        |('variant', '3845:p.G12D@t:sub', 't:sub', 'p.G12|-'),
        |('variant', '613::25:fusion(e.13,e.3)@t:fusion', 't:fusion', 'e.13|e.3'),
        |('variant', '9999:p.V600E@t:sub', 't:sub', 'p.V600|-')
        |) AS t(kind, a, b, c)""".stripMargin,
    // g29: frozen from the implementation once, cross-checked against
    // PMC4468049/index.js:126-180 (r1 specific LUAD, r2 cancer fallback,
    // r3 low-freq + r4 disease-miss skips, r5 gene-miss error).
    "g29_pmc4468049" ->
      """SELECT CAST(kind AS VARCHAR) AS kind, CAST(a AS VARCHAR) AS a,
        |  CAST(b AS VARCHAR) AS b, CAST(c AS VARCHAR) AS c FROM (VALUES
        |('count:error', '1', '', ''),
        |('count:skip', '2', '', ''),
        |('statement', 'r1', 'recurrent|d:luad', '27436::238:fusion@t:fus,d:luad'),
        |('statement', 'r2', 'recurrent|d:cancer', '613::25:fusion@t:fus,d:cancer'),
        |('variant', '27436::238:fusion@t:fus', '27436|238', ''),
        |('variant', '613::25:fusion@t:fus', '613|25', '')
        |) AS t(kind, a, b, c)""".stripMargin,
    "g28_vocab_file" ->
      """WITH raw AS (
        |  SELECT records FROM read_json('/root/reference/data/vocab.json',
        |    columns={records: 'MAP(VARCHAR, JSON)'})
        |), entries AS (
        |  SELECT unnest(map_keys(records)) AS key, unnest(map_values(records)) AS v
        |  FROM raw
        |), recs AS (
        |  SELECT key,
        |    coalesce(json_extract_string(v, '$.sourceId'), key) AS source_id,
        |    coalesce(json_extract_string(v, '$.name'),
        |             coalesce(json_extract_string(v, '$.sourceId'), key)) AS name,
        |    coalesce(CAST(json_extract(v, '$.deprecated') AS BOOLEAN), false) AS deprecated,
        |    coalesce(json_extract_string(v, '$.source'), 'default') AS source,
        |    json_extract(v, '$.links') AS links
        |  FROM entries
        |), lnk AS (
        |  SELECT key, count(*) AS n_links
        |  FROM (SELECT key, unnest(CAST(links AS JSON[])) AS l
        |        FROM recs WHERE links IS NOT NULL)
        |  GROUP BY key
        |)
        |SELECT r.source_id, r.name, r.deprecated, r.source,
        |  CAST(coalesce(l.n_links, 0) AS BIGINT) AS n_links
        |FROM recs r LEFT JOIN lnk l USING (key)""".stripMargin,
    // g27: frozen from the implementation once, cross-checked against
    // asco/index.js:47-93 (fill-score win for rec 2, last-wins tie for
    // rec 5, singleton kept).
    "g27_asco" ->
      """SELECT CAST(source_id AS VARCHAR) AS source_id,
        |  CAST(citation AS VARCHAR) AS citation, CAST(doi AS VARCHAR) AS doi
        |FROM (VALUES
        |('100|2020|am|T cells|Smith', 'cit-a', 'doi-a'),
        |('200|2021|gi|B cells|Jones', 'cit-2', ''),
        |('300|2022|am|NK cells|Wu', '', 'doi-z')
        |) AS t(source_id, citation, doi)""".stripMargin,
    // g26: frozen from the implementation once, cross-checked against
    // PMC4232638/index.js:46-110 (decision table incl. multi-category
    // P72R drop, neutral filter, bad-PMID fallback to the paper id).
    "g26_pmc4232638" ->
      """SELECT CAST(kind AS VARCHAR) AS kind, CAST(a AS VARCHAR) AS a,
        |  CAST(b AS VARCHAR) AS b, CAST(c AS VARCHAR) AS c FROM (VALUES
        |('statement', '3845:p.G12D@t:lgof', 't:lgof|3845|3845,3845:p.G12D@t:sub', '25348012,789|PMID:789'),
        |('statement', '7157:p.R175H@t:gof', 't:gof|7157|7157,7157:p.R175H@t:sub', '123,25348012,456|PMID:123; PMID:456 (in vitro)'),
        |('statement', '7157:p.R273H@t:domneg', 't:domneg|7157|7157,7157:p.R273H@t:sub', '25348012|'),
        |('statement', '7157:p.R282W@t:lof', 't:lof|7157|7157,7157:p.R282W@t:sub', '25348012|'),
        |('variant', '3845:p.G12D@t:sub', 't:sub', 'p.G12'),
        |('variant', '7157:p.R175H@t:sub', 't:sub', 'p.R175'),
        |('variant', '7157:p.R273H@t:sub', 't:sub', 'p.R273'),
        |('variant', '7157:p.R282W@t:sub', 't:sub', 'p.R282')
        |) AS t(kind, a, b, c)""".stripMargin,
    // g25: frozen from the implementation once, cross-checked against
    // fdaApprovals/index.js:49-105 (blacklist + dedup, one-distinct-year
    // rule: p1 agrees on 2020, p2 conflicts -> null, missing page = 1).
    "g25_fda_approvals" ->
      """SELECT CAST(kind AS VARCHAR) AS kind, CAST(a AS VARCHAR) AS a,
        |  CAST(b AS VARCHAR) AS b, CAST(c AS VARCHAR) AS c FROM (VALUES
        |('count:error', '1', '', ''),
        |('curated', '/drugs/resources/announce-1', 'FDA approves drugx for melanoma',
        |  '2020|https://www.fda.gov/drugs/resources/announce-1'),
        |('curated', '/drugs/resources/announce-2', 'FDA approves drugy',
        |  '-|https://www.fda.gov/drugs/resources/announce-2')
        |) AS t(kind, a, b, c)""".stripMargin,
    // g24: frozen from the implementation once, cross-checked against
    // cosmic/fusions.js:36-225 (level gating A/B/C, success-only
    // suppression with E erroring at levels 0-1 then landing at level 2).
    "g24_cosmic_fusions" ->
      """SELECT CAST(kind AS VARCHAR) AS kind, CAST(a AS VARCHAR) AS a,
        |  CAST(b AS VARCHAR) AS b, CAST(c AS VARCHAR) AS c FROM (VALUES
        |('count:error', '2', '', ''),
        |('infers', 'BRAF::MEK1:fus(e.10,e.2)', 'BRAF::MEK1:fusion', ''),
        |('statement', 'a1', '0|BRAF::MEK1:fus(e.10,e.2)|d:mel', '3'),
        |('statement', 'b1', '1|EWSR1::FLI1:fusion|d:sarc', '3'),
        |('statement', 'c1', '2|BCR::ABL1:fusion|d:cancer', '3'),
        |('statement', 'e1', '2|AA::BB:fusion|d:cancer', '3'),
        |('variant:category', 'AA::BB:fusion', '-|-', ''),
        |('variant:category', 'BCR::ABL1:fusion', '-|-', ''),
        |('variant:category', 'BRAF::MEK1:fusion', '-|-', ''),
        |('variant:category', 'EWSR1::FLI1:fusion', '-|-', ''),
        |('variant:positional', 'BRAF::MEK1:fus(e.10,e.2)', 'e.10|e.2', '')
        |) AS t(kind, a, b, c)""".stripMargin,
    // g23: frozen from the implementation once, cross-checked against
    // cosmic/resistance.js:56-206 (per-form ladders of m1-m4, hgnc
    // fallback on m3, chromosome miss on m4, catalog link coalesce).
    "g23_cosmic_resistance" ->
      """SELECT CAST(kind AS VARCHAR) AS kind, CAST(a AS VARCHAR) AS a,
        |  CAST(b AS VARCHAR) AS b, CAST(c AS VARCHAR) AS c FROM (VALUES
        |('infers', '7:7:g.140753336A>T@t:sub', 'ENST00000288602.11:ENST00000288602.11:c.1799T>A@t:sub', ''),
        |('infers', '7:7:g.55191822T>G@t:sub', 'ENSP00000000002.1:ENSP00000000002.1:p.L858R@t:sub', ''),
        |('infers', 'COSM1:COSM1@-', 'ENSP00000000001.1:ENSP00000000001.1:p.G12D@t:sub', ''),
        |('infers', 'COSM2:COSM2@-', '7:7:g.55191822T>G@t:sub', ''),
        |('infers', 'COSM3:COSM3@-', 'ENST00000311936.7:ENST00000311936.7:c.34G>T@t:sub', ''),
        |('infers', 'COSM476:COSM476@-', '7:7:g.140753336A>T@t:sub', ''),
        |('infers', 'ENSP00000000002.1:ENSP00000000002.1:p.L858R@t:sub', 'hgnc:9999:ENSP00000000002.1:p.L858R@t:sub', ''),
        |('infers', 'ENSP00000288602.7:ENSP00000288602.7:p.V600E@t:sub', '673:ENSP00000288602.7:p.V600E@t:sub', ''),
        |('infers', 'ENSP00000308495.3:ENSP00000308495.3:p.G12C@t:sub', '3845:ENSP00000308495.3:p.G12C@t:sub', ''),
        |('infers', 'ENST00000288602.11:ENST00000288602.11:c.1799T>A@t:sub', 'ENSP00000288602.7:ENSP00000288602.7:p.V600E@t:sub', ''),
        |('infers', 'ENST00000311936.7:ENST00000311936.7:c.34G>T@t:sub', 'ENSP00000308495.3:ENSP00000308495.3:p.G12C@t:sub', ''),
        |('variant:catalog', 'COSM1:COSM1@-', '-', '-|-'),
        |('variant:catalog', 'COSM2:COSM2@-', '-', '-|-'),
        |('variant:catalog', 'COSM3:COSM3@-', '-', '-|-'),
        |('variant:catalog', 'COSM476:COSM476@-', '-', '-|-'),
        |('variant:cds', 'ENST00000288602.11:ENST00000288602.11:c.1799T>A@t:sub', 't:sub', 'c.1799|-'),
        |('variant:cds', 'ENST00000311936.7:ENST00000311936.7:c.34G>T@t:sub', 't:sub', 'c.34|-'),
        |('variant:general', '3845:ENSP00000308495.3:p.G12C@t:sub', 't:sub', 'p.G12|-'),
        |('variant:general', '673:ENSP00000288602.7:p.V600E@t:sub', 't:sub', 'p.V600|-'),
        |('variant:general', 'hgnc:9999:ENSP00000000002.1:p.L858R@t:sub', 't:sub', 'p.L858|-'),
        |('variant:genomic', '7:7:g.140753336A>T@t:sub', 't:sub', 'g.140753336|grch38'),
        |('variant:genomic', '7:7:g.55191822T>G@t:sub', 't:sub', 'g.55191822|grch38'),
        |('variant:protein', 'ENSP00000000001.1:ENSP00000000001.1:p.G12D@t:sub', 't:sub', 'p.G12|-'),
        |('variant:protein', 'ENSP00000000002.1:ENSP00000000002.1:p.L858R@t:sub', 't:sub', 'p.L858|-'),
        |('variant:protein', 'ENSP00000288602.7:ENSP00000288602.7:p.V600E@t:sub', 't:sub', 'p.V600|-'),
        |('variant:protein', 'ENSP00000308495.3:ENSP00000308495.3:p.G12C@t:sub', 't:sub', 'p.G12|-')
        |) AS t(kind, a, b, c)""".stripMargin,
    // g22: frozen from the implementation once, cross-checked against
    // uberon/index.js:36-207 (label gate on 0000003, both-ends subclass
    // gate, ncit-dim xref gate, parseSubsetName keeping the fragment).
    "g22_uberon" ->
      """SELECT CAST(kind AS VARCHAR) AS kind, CAST(a AS VARCHAR) AS a,
        |  CAST(b AS VARCHAR) AS b, CAST(c AS VARCHAR) AS c FROM (VALUES
        |('crossreferenceof', 'uberon:0000001', 'c12345', ''),
        |('entity', 'uberon:0000001', 'anatomical structure', 'false|core#uberon_slim|a structure'),
        |('entity', 'uberon:0000002', 'lung', 'true||-'),
        |('entity', 'uberon:0000004', 'heart', 'false||-'),
        |('subclassof', 'uberon:0000002', 'uberon:0000001', ''),
        |('subclassof', 'uberon:0000004', 'uberon:0000001', '')
        |) AS t(kind, a, b, c)""".stripMargin,
    // g21: frozen from the implementation once, cross-checked against
    // cgi/index.js:73-190 by hand (cartesian c6, dead CNA fold on c4,
    // guideline drop on c2, error isolation c7/c8).
    "g21_cgi" ->
      """SELECT CAST(rowId AS VARCHAR) AS "rowId", CAST(kind AS VARCHAR) AS kind,
        |  CAST(comboIdx AS BIGINT) AS "comboIdx", CAST(value AS VARCHAR) AS value
        |FROM (VALUES
        |('c1', 'combo', 0, 'BRAF:p.V600E'),
        |('c1', 'evidence', 0, '21639808'),
        |('c1', 'therapy', 0, 'Vemurafenib'),
        |('c2', 'combo', 0, 'KRAS:p.G12mut'),
        |('c2', 'combo', 1, 'KRAS:p.G13mut'),
        |('c2', 'evidence', 0, '1,NCT00112233'),
        |('c2', 'therapy', 0, 'MEK inhibitors'),
        |('c3', 'combo', 0, 'EGFR:e.19del'),
        |('c3', 'evidence', 0, 'PMC1234'),
        |('c3', 'therapy', 0, 'Gefitinib'),
        |('c4', 'combo', 0, 'CDKN2A deletion'),
        |('c4', 'evidence', 0, '2'),
        |('c4', 'therapy', 0, 'X'),
        |('c5', 'combo', 0, 'BCR::ABL1:fusion'),
        |('c5', 'evidence', 0, '3'),
        |('c5', 'therapy', 0, 'Imatinib'),
        |('c6', 'combo', 0, 'BRAF:p.V600E AND MEK1:p.P124S'),
        |('c6', 'evidence', 0, '4'),
        |('c6', 'therapy', 0, 'Trametinib'),
        |('c7', 'error', 0, 'Missing logic to process variant combinations of 3 or more'),
        |('c8', 'error', 0, 'cannot process non-pubmed/nct/aacr/asco evidence WEIRD:1')
        |) AS t("rowId", kind, "comboIdx", value)""".stripMargin,
    // g20: frozen from the implementation once, cross-checked against
    // oncokb/index.js:199-312 (category-first routing, r2/r3 flipped
    // fusion dedup to one variant, biomarker signature path, r8 error).
    "g20_oncokb" ->
      """SELECT CAST(kind AS VARCHAR) AS kind, CAST(a AS VARCHAR) AS a,
        |  CAST(b AS VARCHAR) AS b, CAST(c AS VARCHAR) AS c FROM (VALUES
        |('count:error', '1', '', ''),
        |('variant:category', '1956:Amplification@t:amp', 't:amp', '-|-'),
        |('variant:category', '3845:oncogenic mutation@t:onco', 't:onco', '-|-'),
        |('variant:category', '613::25:fusion@t:fusion', 't:fusion', '-|25'),
        |('variant:category', 'sig:msi:strong signature@t:sig', 't:sig', '-|-'),
        |('variant:positional', '4233:e.14spl@t:spl', 't:spl', 'e.14|-'),
        |('variant:positional', '673:p.v600e@t:sub', 't:sub', 'p.V600|-')
        |) AS t(kind, a, b, c)""".stripMargin,
    // g19: frozen from the implementation once, cross-checked against
    // cancerhotspots/index.js:80-201 by hand (notation routing, fs trim,
    // h3's lost genomic + skipped statement, h4's fatal gene miss).
    "g19_cancerhotspots" ->
      """SELECT CAST(kind AS VARCHAR) AS kind, CAST(a AS VARCHAR) AS a,
        |  CAST(b AS VARCHAR) AS b, CAST(c AS VARCHAR) AS c FROM (VALUES
        |('count:record_errors', '1', '', ''),
        |('infers', '7:7:g.100_101insAG@t:ins', '673:p.P2fs@t:fs', ''),
        |('infers', '7:7:g.140453136A>T@t:sub', 'ENST00000288602:c.1799T>A@t:sub', ''),
        |('infers', 'ENST00000288602:c.1799T>A@t:sub', '673:p.V600E@t:sub', ''),
        |('infers', 'ENST00000288602:c.7_12delGAAGCA@t:del', '1956:p.E3_A4delEA@t:del', ''),
        |('statement', 'h1', 'mutation hotspot|mel', '673:p.V600E@t:sub,mel'),
        |('statement', 'h2', 'mutation hotspot|mel', '673:p.P2fs@t:fs,mel'),
        |('variant:cds', 'ENST00000288602:c.1799T>A@t:sub', 't:sub', 'c.1799'),
        |('variant:cds', 'ENST00000288602:c.7_12delGAAGCA@t:del', 't:del', 'c.7'),
        |('variant:genomic', '7:7:g.100_101insAG@t:ins', 't:ins', 'g.100'),
        |('variant:genomic', '7:7:g.140453136A>T@t:sub', 't:sub', 'g.140453136'),
        |('variant:protein', '1956:p.E3_A4delEA@t:del', 't:del', 'p.E3'),
        |('variant:protein', '673:p.P2fs@t:fs', 't:fs', 'p.P2'),
        |('variant:protein', '673:p.V600E@t:sub', 't:sub', 'p.V600')
        |) AS t(kind, a, b, c)""".stripMargin,
    // g18: frozen from the implementation once, cross-checked against
    // docm/index.js:33-90 by hand (fix rewrites, variant_type routing,
    // assembly lowercase, failure isolation of r5/r6).
    "g18_docm" ->
      """SELECT CAST(kind AS VARCHAR) AS kind, CAST(a AS VARCHAR) AS a,
        |  CAST(b AS VARCHAR) AS b, CAST(c AS VARCHAR) AS c FROM (VALUES
        |('count:record_errors', '1', '', ''),
        |('infers', '12:12:g.100delA@t:del', '3845:p.W22delW@t:del', ''),
        |('infers', '12:12:g.25398284C>T@t:sub', '3845:p.G12D@t:sub', ''),
        |('infers', '12:12:g.300_301insAAG@t:ins', '3845:p.M1_A2insK@t:ins', ''),
        |('infers', '12:chr12:g.200_201delGGinsGV@t:indel', '3845:p.G13delGinsV@t:indel', ''),
        |('variant:genomic', '12:12:g.100delA@t:del', 't:del', 'g.100|grch37'),
        |('variant:genomic', '12:12:g.25398284C>T@t:sub', 't:sub', 'g.25398284|grch37'),
        |('variant:genomic', '12:12:g.300_301insAAG@t:ins', 't:ins', 'g.300|grch37'),
        |('variant:genomic', '12:chr12:g.200_201delGGinsGV@t:indel', 't:indel', 'g.200|grch37'),
        |('variant:protein', '3845:p.G12D@t:sub', 't:sub', 'p.G12|-'),
        |('variant:protein', '3845:p.G13delGinsV@t:indel', 't:indel', 'p.G13|-'),
        |('variant:protein', '3845:p.M1_A2insK@t:ins', 't:ins', 'p.M1|-'),
        |('variant:protein', '3845:p.W22delW@t:del', 't:del', 'p.W22|-'),
        |('variant:protein', '673:p.V600E@t:sub', 't:sub', 'p.V600|-')
        |) AS t(kind, a, b, c)""".stripMargin,
    "g17_dgidb" ->
      """WITH g AS (
        |  SELECT r."3845".uid AS uid FROM (SELECT result AS r
        |    FROM read_json_auto('/root/reference/test/data/entrez_gene.3845.json'))
        |), m AS (
        |  SELECT molecule_chembl_id AS cid
        |  FROM read_json_auto('/root/reference/test/data/chembl.CHEMBL553.json')
        |)
        |SELECT 'targetof' AS kind, uid AS a, cid AS b,
        |       'antagonist;inhibitor|u1' AS c
        |FROM g, m
        |UNION ALL SELECT 'count:success', '1', '', ''
        |UNION ALL SELECT 'count:error', '2', '', ''""".stripMargin,
    // g16: frozen from the implementation once, cross-checked against the
    // jest expectations (test/moa.test.js:140-221: category content,
    // break1Repr 'e.2', annotation-term double lookup) and the Infers
    // join order (moa/index.js:164-181).
    "g16_moa" ->
      """SELECT CAST(kind AS VARCHAR) AS kind, CAST(a AS VARCHAR) AS a,
        |  CAST(b AS VARCHAR) AS b, CAST(c AS VARCHAR) AS c FROM (VALUES
        |('infers', '673:c.1799T>A@t:substitution', '673:p.V600E@t:substitution', ''),
        |('infers', '673:p.V600E@t:substitution', '673:e.15mut@t:mutation', ''),
        |('infers', '7:g.140453136A>T@t:substitution', '673:c.1799T>A@t:substitution', ''),
        |('variant:category', '3845:KRAS some variant type@t:moa:svt', 't:moa:svt', '-|false'),
        |('variant:category', '7157:TP53 mutation@t:mutation', 't:mutation', '-|false'),
        |('variant:cds', '673:c.1799T>A@t:substitution', 't:substitution', 'c.1799|false'),
        |('variant:exon', '1956:e.2mut@t:moa:svt', 't:moa:svt', 'e.2|false'),
        |('variant:exon', '1956:e.2mut@t:mutation', 't:mutation', 'e.2|false'),
        |('variant:exon', '673:e.15mut@t:mutation', 't:mutation', 'e.15|false'),
        |('variant:genomic', '7:g.140453136A>T@t:substitution', 't:substitution', 'g.140453136|false'),
        |('variant:protein', '11200:p.T367fs@t:frameshift', 't:frameshift', 'p.T367|true'),
        |('variant:protein', '673:p.V600E@t:substitution', 't:substitution', 'p.V600|false')
        |) AS t(kind, a, b, c)""".stripMargin,
    "g15_entrez_refseq" ->
      """WITH recs AS (
        |  SELECT r."224589815".accessionversion AS acc, r."224589815".biomol AS biomol,
        |         r."224589815".subname AS subname, r."224589815".title AS title
        |  FROM (SELECT result AS r
        |    FROM read_json_auto('/root/reference/test/data/entrez_refseq.NC_000003.11.json'))
        |  UNION ALL
        |  SELECT r."568815595".accessionversion, r."568815595".biomol,
        |         r."568815595".subname, r."568815595".title
        |  FROM (SELECT result AS r
        |    FROM read_json_auto('/root/reference/test/data/entrez_refseq.NC_000003.json'))
        |  UNION ALL
        |  SELECT r."1519245592".accessionversion, r."1519245592".biomol,
        |         r."1519245592".subname, r."1519245592".title
        |  FROM (SELECT result AS r
        |    FROM read_json_auto('/root/reference/test/data/entrez_refseq.NM_005228.5.json'))
        |  UNION ALL
        |  SELECT r."5901912".accessionversion, r."5901912".biomol,
        |         r."5901912".subname, r."5901912".title
        |  FROM (SELECT result AS r
        |    FROM read_json_auto('/root/reference/test/data/entrez_refseq.NP_008819.1.json'))
        |), parsed AS (
        |  SELECT split_part(acc, '.', 1) AS source_id,
        |    nullif(split_part(acc, '.', 2), '') AS source_id_version,
        |    CASE WHEN biomol = 'genomic' THEN 'chromosome'
        |         WHEN biomol = 'peptide' THEN 'protein'
        |         ELSE 'transcript' END AS biotype,
        |    subname,
        |    upper(acc) AS display_name,
        |    title AS long_name
        |  FROM recs
        |)
        |SELECT source_id, source_id_version, biotype,
        |  CASE WHEN biotype = 'chromosome' THEN subname END AS name,
        |  display_name, long_name
        |FROM parsed""".stripMargin,
    // g14: per-table counts re-derived from the raw fixtures; constants are
    // local seed data (vocabulary = the 5-term seed, terms = the 10 rows
    // g3's oracle pins, ncit edges = the sum of g3's pinned n_out) and DAG
    // semantics (14 loaders, rerun creates nothing).
    "g14_full_dag" ->
      """WITH vocab_recs AS (
        |  SELECT unnest(map_values(records)) AS v
        |  FROM read_json('/root/reference/data/vocab.json',
        |    columns={records: 'MAP(VARCHAR, JSON)'})
        |), sig_recs AS (
        |  SELECT unnest(map_values(records)) AS v
        |  FROM read_json('/root/reference/data/signatures.json',
        |    columns={records: 'MAP(VARCHAR, JSON)'})
        |), chrom_recs AS (
        |  SELECT unnest(map_values(records)) AS v
        |  FROM read_json('/root/reference/data/chromosomes.json',
        |    columns={records: 'MAP(VARCHAR, JSON)'})
        |), ev_recs AS (
        |  SELECT unnest(map_values(records)) AS v
        |  FROM read_json('/root/reference/data/evidenceLevels.json',
        |    columns={records: 'MAP(VARCHAR, JSON)'})
        |), aacr_recs AS (
        |  SELECT unnest(map_values(records)) AS v
        |  FROM read_json('/root/reference/data/aacr.json',
        |    columns={records: 'MAP(VARCHAR, JSON)'})
        |), ascoL_recs AS (
        |  SELECT unnest(map_values(records)) AS v
        |  FROM read_json('/root/reference/data/asco.json',
        |    columns={records: 'MAP(VARCHAR, JSON)'})
        |), doid_nodes AS (
        |  SELECT unnest(graphs[1].nodes) AS n
        |  FROM read_json_auto('/root/reference/test/data/doid.sample.json',
        |                      maximum_object_size=20000000)
        |), doid_edges AS (
        |  SELECT unnest(graphs[1].edges) AS e
        |  FROM read_json_auto('/root/reference/test/data/doid.sample.json',
        |                      maximum_object_size=20000000)
        |), onc AS (
        |  SELECT lower(code) AS sid, lower(parent) AS parent,
        |         coalesce(len(externalReferences.NCI), 0) AS n_nci
        |  FROM read_json_auto('/root/reference/test/data/tumorTypes-oncotree_latest_stable.json')
        |), ens_r AS (
        |  SELECT split_part(lower("Gene stable ID version"),'.',1) AS gid,
        |         split_part(lower("Gene stable ID version"),'.',2) AS gv,
        |         split_part(lower("Transcript stable ID version"),'.',1) AS tid,
        |         split_part(lower("Transcript stable ID version"),'.',2) AS tv,
        |         split_part(lower("Protein stable ID version"),'.',1) AS pid,
        |         split_part(lower("Protein stable ID version"),'.',2) AS pv,
        |         lower("HGNC ID") AS hgnc
        |  FROM read_csv('/root/reference/test/data/ensembl_biomart_export_ENSG00000139618.tsv',
        |                delim='\t', header=true)
        |), ens_u AS (
        |  SELECT DISTINCT kind, a, b FROM (
        |    SELECT 'feature:gene' AS kind, gid AS a, gv AS b FROM ens_r
        |    UNION ALL SELECT 'feature:gene', gid, '' FROM ens_r
        |    UNION ALL SELECT 'feature:transcript', tid, tv FROM ens_r
        |    UNION ALL SELECT 'feature:transcript', tid, '' FROM ens_r
        |    UNION ALL SELECT 'feature:protein', pid, pv FROM ens_r
        |    UNION ALL SELECT 'feature:protein', pid, '' FROM ens_r
        |    UNION ALL SELECT 'generalizationof', gid, gid||'.'||gv FROM ens_r
        |    UNION ALL SELECT 'generalizationof', tid, tid||'.'||tv FROM ens_r
        |    UNION ALL SELECT 'generalizationof', pid, pid||'.'||pv FROM ens_r
        |    UNION ALL SELECT 'elementof', tid, gid FROM ens_r
        |    UNION ALL SELECT 'elementof', tid||'.'||tv, gid||'.'||gv FROM ens_r
        |    UNION ALL SELECT 'elementof', pid, tid FROM ens_r
        |    UNION ALL SELECT 'elementof', pid||'.'||pv, tid||'.'||tv FROM ens_r
        |    UNION ALL SELECT 'crossreferenceof', gid, hgnc FROM ens_r WHERE hgnc IS NOT NULL
        |  ) AS x
        |), rs_r AS (
        |  SELECT GeneID,
        |         split_part(RNA,'.',1) AS rna, split_part(RNA,'.',2) AS rnav,
        |         split_part(coalesce(Protein,''),'.',1) AS prot,
        |         split_part(coalesce(Protein,''),'.',2) AS protv
        |  FROM read_csv('/root/reference/test/data/LRG_RefSeqGene_d1541209245_kras.tab',
        |                delim='\t', header=true, all_varchar=true)
        |  WHERE RNA IS NOT NULL AND RNA <> ''
        |), rs_u AS (
        |  SELECT DISTINCT kind, a, b FROM (
        |    SELECT 'f' AS kind, rna AS a, rnav AS b FROM rs_r
        |    UNION ALL SELECT 'f', rna, '' FROM rs_r
        |    UNION ALL SELECT 'f', prot, protv FROM rs_r WHERE prot <> ''
        |    UNION ALL SELECT 'f', prot, '' FROM rs_r WHERE prot <> ''
        |    UNION ALL SELECT 'generalizationof', rna, rna||'.'||rnav FROM rs_r
        |    UNION ALL SELECT 'generalizationof', prot, prot||'.'||protv FROM rs_r WHERE prot <> ''
        |    UNION ALL SELECT 'elementof', prot, rna FROM rs_r WHERE prot <> ''
        |    UNION ALL SELECT 'elementof', prot||'.'||protv, rna||'.'||rnav FROM rs_r WHERE prot <> ''
        |    UNION ALL SELECT 'elementof', rna, 'entrez:'||GeneID FROM rs_r WHERE GeneID = '3845'
        |  ) AS x
        |), vario_block AS (
        |  SELECT unnest(regexp_extract_all(content,
        |    '<owl:Class rdf:about="http://purl\.obolibrary\.org/obo/VariO_[0-9]+">.*?</owl:Class>',
        |    0, 's')) AS b
        |  FROM read_text('/root/reference/test/data/vario_v2018-04-27.owl')
        |), vario_lab AS (
        |  SELECT * FROM (
        |    SELECT lower(replace(regexp_extract(b, 'obo/(VariO_[0-9]+)"', 1), '_', ':')) AS sid,
        |      trim(regexp_extract(b, '<rdfs:label[^>]*>(.*?)</rdfs:label>', 1, 's')) AS name,
        |      list_transform(regexp_extract_all(b,
        |        '<rdfs:subClassOf rdf:resource="http://purl\.obolibrary\.org/obo/(VariO_[0-9]+)"', 1),
        |        s -> lower(replace(s, '_', ':'))) AS subs
        |    FROM vario_block) WHERE name <> ''
        |), vario_edge AS (
        |  SELECT DISTINCT l.sid, t.s FROM vario_lab l, unnest(l.subs) AS t(s)
        |  WHERE t.s IN (SELECT sid FROM vario_lab)
        |), hgnc_doc AS (
        |  SELECT unnest("http://rest.genenames.org/fetch/hgnc_id/1101".response.docs) AS d
        |  FROM read_json_auto('/root/reference/test/data/external_api_responses.json')
        |), fda AS (
        |  SELECT count(*) AS n
        |  FROM read_csv('/root/reference/test/data/UNII_Records_25Oct2018_sample.txt',
        |                delim='\t', header=true, all_varchar=true)
        |  WHERE UNII IS NOT NULL AND PT IS NOT NULL
        |)
        |SELECT 'loaders:succeeded' AS kind, CAST(35 AS BIGINT) AS n
        |UNION ALL SELECT 'rerun:succeeded', CAST(35 AS BIGINT)
        |UNION ALL SELECT 'rerun:creates', CAST(0 AS BIGINT)
        |-- in-situ error side-channel: dgidb unknown-gene 1, cgi 3-plus
        |-- combination 1, docm protein-fatal 1, oncokb unresolvable id 1,
        |-- hotspots protein-fatal 1, cgl no-loadable-form 1 (moa's two bad
        |-- records are DROP-based — no counter — pinned by the variant
        |-- count instead)
        |UNION ALL SELECT 'errors:total', CAST(6 AS BIGINT)
        |-- all_sources seeder: the 39 sources.js definitions
        |UNION ALL SELECT 'table:sources', CAST(39 AS BIGINT)
        |UNION ALL SELECT 'table:vocabulary',
        |  CAST((SELECT count(*) FROM vocab_recs) AS BIGINT)
        |UNION ALL SELECT 'table:terms', CAST(10 AS BIGINT)
        |UNION ALL SELECT 'table:vertices', CAST((SELECT count(*) FROM doid_nodes
        |  WHERE regexp_extract(n.id, '.*/([A-Za-z]+_[0-9]+)$', 1) <> '') AS BIGINT)
        |UNION ALL SELECT 'table:diseases', CAST((SELECT count(*) FROM onc) AS BIGINT)
        |-- + 1: the cgi node's therapy miss creates cgi:vemurafenib
        |-- (vemurafenib appears in none of the three therapy fixtures)
        |UNION ALL SELECT 'table:therapies', CAST((SELECT n FROM fda)
        |  + (SELECT len(regexp_extract_all(content, '<drug type='))
        |     FROM read_text('/root/reference/test/data/drugbank_sample.xml'))
        |  + (SELECT 1 + CASE WHEN usan_stem_definition IS NOT NULL THEN 1 ELSE 0 END
        |     FROM read_json_auto('/root/reference/test/data/chembl.CHEMBL553.json'))
        |  + 1 AS BIGINT)
        |UNION ALL SELECT 'table:genes', CAST((SELECT len(r.uids) FROM
        |    (SELECT result AS r
        |     FROM read_json_auto('/root/reference/test/data/entrez_gene.3845.json')))
        |  + (SELECT count(*)
        |     FROM read_json_auto('/root/reference/test/data/civic_variant.json')
        |     WHERE CAST(entrez_id AS VARCHAR) <> '3845') AS BIGINT)
        |UNION ALL SELECT 'table:genes_hgnc', CAST((SELECT count(*)
        |  + sum(len(d.prev_symbol) + len(d.alias_symbol)) FROM hgnc_doc) AS BIGINT)
        |UNION ALL SELECT 'table:features',
        |  CAST((SELECT count(*) FROM ens_u WHERE kind LIKE 'feature:%')
        |     + (SELECT count(*) FROM rs_u WHERE kind = 'f') AS BIGINT)
        |UNION ALL SELECT 'table:articles', CAST((SELECT len(r.uids) FROM
        |  (SELECT result AS r
        |   FROM read_json_auto('/root/reference/test/data/entrez_pubmed.30016509.json'))) AS BIGINT)
        |UNION ALL SELECT 'table:trials', CAST((SELECT count(*)
        |  FROM read_json_auto('/root/reference/test/data/clinicaltrialsgov.NCT03478891.json')) AS BIGINT)
        |-- variants: civic (from the fixture) + the record-level loaders'
        |-- disjoint demo ladders: moa 6 (9103's protein lands while its
        |-- chrom-99 genomic drops; 9104 drops whole), docm 2, oncokb 2,
        |-- hotspots 3, cosmic resistance 5, cosmic fusions 2,
        |-- pmc4232638 1, pmc4468049 1, cgl 2, cgi 1
        |UNION ALL SELECT 'table:variants', CAST((SELECT count(*)
        |  FROM read_json_auto('/root/reference/test/data/civic_variant.json'))
        |  + 25 AS BIGINT)
        |-- asco dedup collapses its 2 demo records to 1; one scraped
        |-- announcement; statements: hotspots + cosmic fusions +
        |-- pmc4232638 + pmc4468049 + cgl + cgi (dag-c1's one combo;
        |-- dag-c2 is the 3-plus-combination error)
        |UNION ALL SELECT 'table:abstracts', CAST(1 AS BIGINT)
        |UNION ALL SELECT 'table:curated', CAST(1 AS BIGINT)
        |UNION ALL SELECT 'table:statements', CAST(6 AS BIGINT)
        |UNION ALL SELECT 'table:vario_terms', CAST((SELECT count(*) FROM vario_lab) AS BIGINT)
        |UNION ALL SELECT 'table:signatures', CAST((SELECT count(*) FROM sig_recs) AS BIGINT)
        |UNION ALL SELECT 'table:chromosomes', CAST((SELECT count(*) FROM chrom_recs) AS BIGINT)
        |UNION ALL SELECT 'table:evidence_levels', CAST((SELECT count(*) FROM ev_recs) AS BIGINT)
        |UNION ALL SELECT 'table:abstracts_aacr', CAST((SELECT count(*) FROM aacr_recs) AS BIGINT)
        |UNION ALL SELECT 'table:abstracts_asco', CAST((SELECT count(*) FROM ascoL_recs) AS BIGINT)
        |-- uberon inline sample: 3 labeled classes; refseq: one uid per
        |-- recorded esummary fixture (4 files)
        |UNION ALL SELECT 'table:anatomy', CAST(3 AS BIGINT)
        |UNION ALL SELECT 'table:refseqs', CAST(4 AS BIGINT)
        |UNION ALL SELECT 'table:edges', CAST(
        |    (SELECT count(*) FROM doid_edges WHERE e.pred = 'is_a'
        |      AND regexp_extract(e.sub, '.*/([A-Za-z]+_[0-9]+)$', 1) <> ''
        |      AND regexp_extract(e.obj, '.*/([A-Za-z]+_[0-9]+)$', 1) <> '')
        |  + (SELECT count(*) FROM onc
        |      WHERE parent IS NOT NULL AND parent IN (SELECT sid FROM onc))
        |  + (SELECT sum(n_nci) FROM onc)
        |  + (SELECT count(*) FROM ens_u WHERE kind NOT LIKE 'feature:%')
        |  + (SELECT count(*) FROM rs_u WHERE kind <> 'f')
        |  + (SELECT count(*) FROM vario_edge)
        |  + (SELECT sum(len(d.prev_symbol) + len(d.alias_symbol)
        |      + CASE WHEN d.ensembl_gene_id IS NOT NULL THEN 1 ELSE 0 END
        |      + CASE WHEN d.entrez_id IS NOT NULL THEN 1 ELSE 0 END) FROM hgnc_doc)
        |  + (SELECT count(*) FROM (
        |      SELECT unnest(CAST(json_extract(v, '$.links') AS JSON[]))
        |      FROM vocab_recs WHERE json_extract(v, '$.links') IS NOT NULL))
        |  + (SELECT count(*) FROM (
        |      SELECT unnest(CAST(json_extract(v, '$.links') AS JSON[]))
        |      FROM sig_recs WHERE json_extract(v, '$.links') IS NOT NULL))
        |  + (SELECT count(*) FROM (
        |      SELECT unnest(CAST(json_extract(v, '$.links') AS JSON[]))
        |      FROM ev_recs WHERE json_extract(v, '$.links') IS NOT NULL))
        |-- + ncit 6 + chembl 1 + uberon subclass 2 + dgidb TargetOf 1
        |-- + record-loader Infers: moa 3, docm 1, hotspots 2,
        |--   cosmic resistance 4, cosmic fusions 1, cgl 1
        |  + 6 + 1 + 2 + 1 + 3 + 1 + 2 + 4 + 1 + 1 AS BIGINT)""".stripMargin,
    "g13_entrez" ->
      """WITH g AS (
        |  SELECT r."3845" AS d
        |  FROM (SELECT result AS r
        |        FROM read_json_auto('/root/reference/test/data/entrez_gene.3845.json'))
        |), p AS (
        |  SELECT r."30016509" AS d
        |  FROM (SELECT result AS r
        |        FROM read_json_auto('/root/reference/test/data/entrez_pubmed.30016509.json'))
        |)
        |SELECT 'gene' AS kind, d.uid AS source_id, d.name AS name,
        |  d.name AS display_name, CAST(NULL AS BIGINT) AS year,
        |  CAST(NULL AS VARCHAR) AS journal
        |FROM g
        |UNION ALL
        |SELECT 'gene', '4869', 'stub-npm1', 'stub-npm1', NULL, NULL
        |UNION ALL
        |SELECT 'article', d.uid, d.title, 'pmid:' || d.uid,
        |  CAST(regexp_extract(d.sortpubdate, '^([0-9]{4})/', 1) AS BIGINT),
        |  d.fulljournalname
        |FROM p""".stripMargin,
    "g12_civic_variant" ->
      """WITH v AS (
        |  SELECT id, name, entrez_name, entrez_id
        |  FROM read_json_auto('/root/reference/test/data/civic_variant.json')
        |), n AS (
        |  SELECT lower(entrez_name) AS gene, CAST(entrez_id AS VARCHAR) AS gid,
        |    regexp_extract(lower(name), '^exon ([0-9]+) mutation$', 1) AS brk
        |  FROM v
        |)
        |SELECT 'feature:gene' AS kind, gid AS a, gene AS b FROM n
        |UNION ALL
        |SELECT 'variant', gene || ':e.' || brk || 'mut', 'civic:mutation' FROM n
        |UNION ALL
        |SELECT 'variant:break1', gene || ':e.' || brk || 'mut', 'e.' || brk FROM n
        |UNION ALL
        |-- the rsID record's dbSNP ladder (frozen; the NP notation appears
        |-- twice: the refseq-referenced protein and the gene-alt variant)
        |SELECT * FROM (VALUES
        |('variant', 'NM_005228.5:c.2573T>G', 'so:substitution'),
        |('variant', 'NP_005219.2:p.Leu858Arg', 'so:substitution'),
        |('variant', 'NP_005219.2:p.Leu858Arg', 'so:substitution'),
        |('variant:break1', 'NM_005228.5:c.2573T>G', 'c.2573'),
        |('variant:break1', 'NP_005219.2:p.Leu858Arg', 'p.L858'),
        |('variant:break1', 'NP_005219.2:p.Leu858Arg', 'p.L858'),
        |('variant:rsid', 'rs121434568', '121434568')) AS r(kind, a, b)""".stripMargin,
    "s7_xlsx_scan" ->
      """SELECT CAST(gene AS VARCHAR) AS gene, CAST(gof AS VARCHAR) AS gof,
        |  CAST(lof AS VARCHAR) AS lof, CAST(other AS VARCHAR) AS other FROM (VALUES
        |('TP53', 'yes', 'no effect', 'x'),
        |('KRAS', '', '', 'y')) AS t(gene, gof, lof, other)""".stripMargin,
    "s12_token_scan" ->
      """SELECT CAST(nct_id AS VARCHAR) AS nct_id, CAST(phase AS VARCHAR) AS phase FROM (VALUES
        |('NCT01', '1'), ('NCT02', '2'), ('NCT03', '3')) AS t(nct_id, phase)""".stripMargin,
    "s13_link_scan" ->
      """SELECT CAST(gene AS VARCHAR) AS gene, CAST(drug AS VARCHAR) AS drug FROM (VALUES
        |('EGFR', 'erlotinib'), ('ALK', 'crizotinib')) AS t(gene, drug)""".stripMargin,
    "s14_solr_scan" ->
      """SELECT CAST(abstract_id AS BIGINT) AS abstract_id FROM (VALUES
        |(10), (11), (12), (13), (14)) AS t(abstract_id)""".stripMargin,
    "s15_entrez_batch" ->
      """SELECT c_custkey AS custkey, 'gene-record-' || CAST(c_custkey AS VARCHAR) AS payload
        |FROM customer WHERE c_custkey % 37 = 0""".stripMargin,
    "j2_preference_ladder" ->
      """SELECT CAST(rung AS VARCHAR) AS rung, CAST(winner AS VARCHAR) AS winner FROM (VALUES
        |('r1', 'keep'), ('r2', 'keep'), ('r3', 'keep'), ('r4', 'keep'),
        |('r5', 'keep'), ('r6', 'keep'), ('r7', 'keep'), ('r8', 'keep')
        |) AS t(rung, winner)""".stripMargin,
    "s10_paginated_scan" ->
      """SELECT CAST(id AS BIGINT) AS id, CAST(name AS VARCHAR) AS name FROM (VALUES
        |(1, 'alpha'), (2, 'beta'), (3, 'gamma')) AS t(id, name)""".stripMargin,
    "s11_cursor_scan" ->
      """SELECT CAST(id AS BIGINT) AS id, CAST(status AS VARCHAR) AS status FROM (VALUES
        |(1, 'ACCEPTED'), (2, 'SUBMITTED'), (3, 'ACCEPTED')) AS t(id, status)""".stripMargin,
    "s17_html_scrape" ->
      """SELECT CAST(page_id AS BIGINT) AS page_id, CAST(n_news_links AS BIGINT) AS n_news_links,
        |  CAST(year AS BIGINT) AS year, CAST(text_len AS BIGINT) AS text_len FROM (VALUES
        |(1, 1, 2021, 53), (2, 0, NULL, 19)) AS t(page_id, n_news_links, year, text_len)""".stripMargin,
    "s1_delim_scan" ->
      """SELECT "Gene stable ID" AS gene_id,
        |  "Transcript stable ID" AS transcript_id,
        |  "Protein stable ID" AS protein_id,
        |  "HGNC ID" AS hgnc_id,
        |  "Gene name" AS gene_name
        |FROM read_csv('/root/reference/test/data/ensembl_biomart_export_ENSG00000139618.tsv',
        |              delim='	', header=true)""".stripMargin,
    "s3_xml_dom" ->
      """SELECT CAST(name AS VARCHAR) AS name, CAST(cas_number AS VARCHAR) AS cas_number,
        |  CAST(unii AS VARCHAR) AS unii, CAST(state AS VARCHAR) AS state,
        |  CAST(n_groups AS INT) AS n_groups
        |FROM (VALUES ('Erlotinib', '183321-74-6', 'J4T82NDH7E', 'solid', 2))
        |  AS t(name, cas_number, unii, state, n_groups)""".stripMargin,
    "s4_xml_rowtag" ->
      """SELECT CAST(drugbank_id AS VARCHAR) AS drugbank_id, CAST(name AS VARCHAR) AS name,
        |  CAST(cas_number AS VARCHAR) AS cas_number, CAST(unii AS VARCHAR) AS unii,
        |  CAST(state AS VARCHAR) AS state, CAST(n_groups AS INT) AS n_groups
        |FROM (VALUES ('DB00530', 'Erlotinib', '183321-74-6', 'J4T82NDH7E', 'solid', 2))
        |  AS t(drugbank_id, name, cas_number, unii, state, n_groups)""".stripMargin,
    // Frozen golden frame (DuckDB can't parse OWL); independently
    // cross-checked against the raw RDF/XML with a regex extractor.
    "s5_owl_group" ->
      """SELECT CAST(source_id AS VARCHAR) AS source_id, CAST(name AS VARCHAR) AS name,
        |  CAST(n_subclass AS BIGINT) AS n_subclass
        |FROM (VALUES
        |('vario:0001', 'variation', 0),
        |('vario:0002', 'variation affecting protein', 1),
        |('vario:0003', 'variation affecting protein function', 1),
        |('vario:0004', 'effect on protein movement', 1),
        |('vario:0005', 'effect on protein storage', 1),
        |('vario:0006', 'effect on structural protein', 1),
        |('vario:0007', 'effect on protein recognition', 1),
        |('vario:0008', 'effect on catalytic protein function', 1),
        |('vario:0009', 'effect on transport function of protein', 1),
        |('vario:0010', 'effect on RNA abundance', 1)) AS t(source_id, name, n_subclass)""".stripMargin,
    "s6_obograph_nodes" ->
      """SELECT lower(replace(regexp_extract(n.id, '.*/([A-Za-z]+_[0-9]+)$', 1), '_', ':')) AS source_id,
        |  n.lbl AS name,
        |  CAST(coalesce(len(n.meta.synonyms), 0) AS BIGINT) AS n_alias,
        |  coalesce(len(list_filter(n.meta.basicPropertyValues,
        |    x -> x.pred LIKE '%deprecated' AND x.val = 'true')) > 0, false) AS deprecated
        |FROM (SELECT unnest(graphs[1].nodes) AS n
        |      FROM read_json_auto('/root/reference/test/data/doid.sample.json',
        |                          maximum_object_size=20000000))""".stripMargin,
    "s8_json_scan" ->
      """SELECT molecule_chembl_id AS chembl_id, pref_name AS name,
        |  CAST(max_phase AS BIGINT) AS max_phase,
        |  molecule_properties.full_molformula AS molformula
        |FROM read_json_auto('/root/reference/test/data/chembl.CHEMBL553.json')""".stripMargin,
    "s16_api_proxy" ->
      """SELECT protocolSection.identificationModule.nctId AS nct_id,
        |  protocolSection.statusModule.overallStatus AS status,
        |  array_to_string(protocolSection.designModule.phases, '/') AS phase,
        |  protocolSection.identificationModule.organization.fullName AS org
        |FROM read_json_auto('/root/reference/test/data/clinicaltrialsgov.NCT03478891.json',
        |                    maximum_object_size=20000000)""".stripMargin,
    "f1_hgvs_parse" ->
      """SELECT
        |  CAST(notation AS VARCHAR) AS notation,
        |  CAST(ref1 AS VARCHAR) AS ref1,
        |  CAST(ref2 AS VARCHAR) AS ref2,
        |  CAST(prefix AS VARCHAR) AS prefix,
        |  CAST(vtype AS VARCHAR) AS vtype,
        |  CAST(b1s_pos AS BIGINT) AS b1s_pos,
        |  CAST(b1s_refaa AS VARCHAR) AS b1s_refaa,
        |  CAST(b1s_off AS BIGINT) AS b1s_off,
        |  CAST(b1s_arm AS VARCHAR) AS b1s_arm,
        |  CAST(b1s_major AS INT) AS b1s_major,
        |  CAST(b1s_minor AS INT) AS b1s_minor,
        |  CAST(b1e_pos AS BIGINT) AS b1e_pos,
        |  CAST(b2s_pos AS BIGINT) AS b2s_pos,
        |  CAST(b2e_pos AS BIGINT) AS b2e_pos,
        |  CAST(b1_repr AS VARCHAR) AS b1_repr,
        |  CAST(b2_repr AS VARCHAR) AS b2_repr,
        |  CAST(ref_seq AS VARCHAR) AS ref_seq,
        |  CAST(ut_seq AS VARCHAR) AS ut_seq,
        |  CAST(ut_size AS INT) AS ut_size,
        |  CAST(trunc AS INT) AS trunc,
        |  CAST(multi AS BOOLEAN) AS multi
        |FROM (VALUES
        |('KRAS:p.G12D', 'KRAS', NULL, 'p', 'substitution', 12, 'G', NULL, NULL, NULL, NULL, NULL, NULL, NULL, 'p.G12', NULL, 'G', 'D', 1, NULL, FALSE),
        |('p.v600e', NULL, NULL, 'p', 'substitution', 600, 'V', NULL, NULL, NULL, NULL, NULL, NULL, NULL, 'p.V600', NULL, 'V', 'E', 1, NULL, FALSE),
        |('p.G12*', NULL, NULL, 'p', 'substitution', 12, 'G', NULL, NULL, NULL, NULL, NULL, NULL, NULL, 'p.G12', NULL, 'G', '*', 1, NULL, FALSE),
        |('p.*807Gext*101', NULL, NULL, 'p', 'extension', 807, '*', NULL, NULL, NULL, NULL, NULL, NULL, NULL, 'p.*807', NULL, NULL, 'G', 1, 101, FALSE),
        |('EGFR:c.2573T>G', 'EGFR', NULL, 'c', 'substitution', 2573, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, 'c.2573', NULL, 'T', 'G', 1, NULL, FALSE),
        |('c.100+2spl', NULL, NULL, 'c', 'splice-site', 100, NULL, 2, NULL, NULL, NULL, NULL, NULL, NULL, 'c.100+2', NULL, NULL, NULL, NULL, NULL, FALSE),
        |('c.100-2del', NULL, NULL, 'c', 'deletion', 100, NULL, -2, NULL, NULL, NULL, NULL, NULL, NULL, 'c.100-2', NULL, NULL, NULL, NULL, NULL, FALSE),
        |('c.100_102delTTT', NULL, NULL, 'c', 'deletion', 100, NULL, NULL, NULL, NULL, NULL, NULL, 102, NULL, 'c.100', 'c.102', 'TTT', NULL, NULL, NULL, FALSE),
        |('c.100_101insAAG', NULL, NULL, 'c', 'insertion', 100, NULL, NULL, NULL, NULL, NULL, NULL, 101, NULL, 'c.100', 'c.101', NULL, 'AAG', 3, NULL, FALSE),
        |('c.1_2ins5', NULL, NULL, 'c', 'insertion', 1, NULL, NULL, NULL, NULL, NULL, NULL, 2, NULL, 'c.1', 'c.2', NULL, NULL, 5, NULL, FALSE),
        |('p.E746_T751delinsI', NULL, NULL, 'p', 'indel', 746, 'E', NULL, NULL, NULL, NULL, NULL, 751, NULL, 'p.E746', 'p.T751', NULL, 'I', 1, NULL, FALSE),
        |('p.K558delKinsNP', NULL, NULL, 'p', 'indel', 558, 'K', NULL, NULL, NULL, NULL, NULL, NULL, NULL, 'p.K558', NULL, 'K', 'NP', 2, NULL, FALSE),
        |('p.S193_C196dupSTSC', NULL, NULL, 'p', 'duplication', 193, 'S', NULL, NULL, NULL, NULL, NULL, 196, NULL, 'p.S193', 'p.C196', 'STSC', NULL, NULL, NULL, FALSE),
        |('p.G12fs', NULL, NULL, 'p', 'frameshift', 12, 'G', NULL, NULL, NULL, NULL, NULL, NULL, NULL, 'p.G12', NULL, NULL, NULL, NULL, NULL, FALSE),
        |('p.G12Vfs*3', NULL, NULL, 'p', 'frameshift', 12, 'G', NULL, NULL, NULL, NULL, NULL, NULL, NULL, 'p.G12', NULL, NULL, 'V', 1, 3, FALSE),
        |('p.(G12_G13)mut', NULL, NULL, 'p', 'mutation', 12, 'G', NULL, NULL, NULL, NULL, 13, NULL, NULL, 'p.(G12_G13)', NULL, NULL, NULL, NULL, NULL, FALSE),
        |('p.?755_?759del', NULL, NULL, 'p', 'deletion', 755, '?', NULL, NULL, NULL, NULL, NULL, 759, NULL, 'p.?755', 'p.?759', NULL, NULL, NULL, NULL, FALSE),
        |('y.p26.3_p25.3del', NULL, NULL, 'y', 'deletion', NULL, NULL, NULL, 'p', 26, 3, NULL, NULL, NULL, 'y.p26.3', 'y.p25.3', NULL, NULL, NULL, NULL, FALSE),
        |('y.q22copygain', NULL, NULL, 'y', 'copy gain', NULL, NULL, NULL, 'q', 22, NULL, NULL, NULL, NULL, 'y.q22', NULL, NULL, NULL, NULL, NULL, FALSE),
        |('e.19del', NULL, NULL, 'e', 'deletion', 19, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, 'e.19', NULL, NULL, NULL, NULL, NULL, FALSE),
        |('e.19mut', NULL, NULL, 'e', 'mutation', 19, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, 'e.19', NULL, NULL, NULL, NULL, NULL, FALSE),
        |('i.4spl', NULL, NULL, 'i', 'splice-site', 4, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, 'i.4', NULL, NULL, NULL, NULL, NULL, FALSE),
        |('g.1234567A>T', NULL, NULL, 'g', 'substitution', 1234567, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, 'g.1234567', NULL, 'A', 'T', 1, NULL, FALSE),
        |('g.123456_123457dup', NULL, NULL, 'g', 'duplication', 123456, NULL, NULL, NULL, NULL, NULL, NULL, 123457, NULL, 'g.123456', 'g.123457', NULL, NULL, NULL, NULL, FALSE),
        |('g.109_110delAAinsTG', NULL, NULL, 'g', 'indel', 109, NULL, NULL, NULL, NULL, NULL, NULL, 110, NULL, 'g.109', 'g.110', 'AA', 'TG', 2, NULL, FALSE),
        |('n.54del', NULL, NULL, 'n', 'deletion', 54, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, 'n.54', NULL, NULL, NULL, NULL, NULL, FALSE),
        |('r.100_101insAU', NULL, NULL, 'r', 'insertion', 100, NULL, NULL, NULL, NULL, NULL, NULL, 101, NULL, 'r.100', 'r.101', NULL, 'AU', 2, NULL, FALSE),
        |('(EML4,ALK):fusion(e.6,e.20)', 'EML4', 'ALK', NULL, 'fusion', 6, NULL, NULL, NULL, NULL, NULL, NULL, 20, NULL, 'e.6', 'e.20', NULL, NULL, NULL, NULL, TRUE),
        |('trans(g.100,g.200)', NULL, NULL, NULL, 'translocation', 100, NULL, NULL, NULL, NULL, NULL, NULL, 200, NULL, 'g.100', 'g.200', NULL, NULL, NULL, NULL, TRUE),
        |('(BCR,ABL1):fusion(e.13,e.3)TT', 'BCR', 'ABL1', NULL, 'fusion', 13, NULL, NULL, NULL, NULL, NULL, NULL, 3, NULL, 'e.13', 'e.3', NULL, 'TT', 2, NULL, TRUE),
        |('KRAS:p.G12', 'KRAS', NULL, 'p', 'mutation', 12, 'G', NULL, NULL, NULL, NULL, NULL, NULL, NULL, 'p.G12', NULL, NULL, NULL, NULL, NULL, FALSE)) AS t(notation, ref1, ref2, prefix, vtype, b1s_pos, b1s_refaa, b1s_off, b1s_arm, b1s_major, b1s_minor, b1e_pos, b2s_pos, b2e_pos, b1_repr, b2_repr, ref_seq, ut_seq, ut_size, trunc, multi)""".stripMargin,
    "j1_resolve_unique" ->
      """SELECT c_mktsegment AS segment, c_custkey AS best_custkey, c_acctbal AS best_acctbal
        |FROM (SELECT c_mktsegment, c_custkey, c_acctbal,
        |        row_number() OVER (PARTITION BY c_mktsegment
        |                           ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
        |      FROM customer)
        |WHERE rn = 1""".stripMargin,
    "k1_upsert_classify" ->
      """WITH target AS (
        |  SELECT o_orderkey AS id, o_orderstatus AS status, o_totalprice AS total
        |  FROM orders WHERE o_orderkey % 2 = 0),
        |updates AS (
        |  SELECT o_orderkey AS id, o_orderstatus AS status,
        |    CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1.0 ELSE o_totalprice END AS total
        |  FROM orders WHERE o_orderkey % 3 = 0)
        |SELECT coalesce(u.id, t.id) AS id,
        |  CASE WHEN u.id IS NOT NULL THEN u.total ELSE t.total END AS total,
        |  CASE WHEN t.id IS NULL THEN 'create'
        |       WHEN u.id IS NULL THEN 'delete'
        |       WHEN (t.status IS DISTINCT FROM u.status)
        |         OR (t.total IS DISTINCT FROM u.total) THEN 'update'
        |       ELSE 'noop' END AS action
        |FROM target t FULL OUTER JOIN updates u ON t.id = u.id""".stripMargin,
    "k2_change_counts" ->
      """WITH target AS (
        |  SELECT o_orderkey AS id, o_orderstatus AS status, o_totalprice AS total
        |  FROM orders WHERE o_orderkey % 2 = 0),
        |updates AS (
        |  SELECT o_orderkey AS id, o_orderstatus AS status,
        |    CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1.0 ELSE o_totalprice END AS total
        |  FROM orders WHERE o_orderkey % 3 = 0),
        |classified AS (
        |  SELECT CASE WHEN t.id IS NULL THEN 'create'
        |              WHEN u.id IS NULL THEN 'delete'
        |              WHEN (t.status IS DISTINCT FROM u.status)
        |                OR (t.total IS DISTINCT FROM u.total) THEN 'update'
        |              ELSE 'noop' END AS action
        |  FROM target t FULL OUTER JOIN updates u ON t.id = u.id)
        |SELECT action, count(*) AS n FROM classified GROUP BY 1""".stripMargin,
    "j12_diff_tiers" ->
      """WITH incoming AS (
        |  SELECT o_orderkey AS iid, o_custkey AS cust, o_orderpriority AS prio
        |  FROM orders WHERE o_orderkey % 2 = 0),
        |existing AS (
        |  SELECT o_orderkey AS eid, o_custkey AS cust, o_orderpriority AS prio
        |  FROM orders WHERE o_orderkey % 3 = 0),
        |li1 AS (SELECT iid, cust, prio,
        |          row_number() OVER (PARTITION BY cust, prio ORDER BY iid) AS z FROM incoming),
        |le1 AS (SELECT eid, cust, prio,
        |          row_number() OVER (PARTITION BY cust, prio ORDER BY eid) AS z FROM existing),
        |m1 AS (SELECT li1.iid, le1.eid FROM li1 JOIN le1
        |        ON li1.cust = le1.cust AND li1.prio = le1.prio AND li1.z = le1.z),
        |ir1 AS (SELECT * FROM incoming WHERE iid NOT IN (SELECT iid FROM m1)),
        |er1 AS (SELECT * FROM existing WHERE eid NOT IN (SELECT eid FROM m1)),
        |li2 AS (SELECT iid, cust,
        |          row_number() OVER (PARTITION BY cust ORDER BY iid) AS z FROM ir1),
        |le2 AS (SELECT eid, cust,
        |          row_number() OVER (PARTITION BY cust ORDER BY eid) AS z FROM er1),
        |m2 AS (SELECT li2.iid, le2.eid FROM li2 JOIN le2
        |        ON li2.cust = le2.cust AND li2.z = le2.z),
        |ir2 AS (SELECT * FROM ir1 WHERE iid NOT IN (SELECT iid FROM m2)),
        |er2 AS (SELECT * FROM er1 WHERE eid NOT IN (SELECT eid FROM m2)),
        |li3 AS (SELECT iid, row_number() OVER (ORDER BY iid) AS z FROM ir2),
        |le3 AS (SELECT eid, row_number() OVER (ORDER BY eid) AS z FROM er2),
        |m3 AS (SELECT li3.iid, le3.eid FROM li3 JOIN le3 ON li3.z = le3.z)
        |SELECT iid AS incoming_id, eid AS existing_id, 'match' AS bucket, 1 AS tier FROM m1
        |UNION ALL SELECT iid, eid, 'match', 2 FROM m2
        |UNION ALL SELECT iid, eid, 'match', 3 FROM m3
        |UNION ALL SELECT iid, NULL, 'create', NULL FROM ir2
        |  WHERE iid NOT IN (SELECT iid FROM m3)
        |UNION ALL SELECT NULL, eid, 'delete', NULL FROM er2
        |  WHERE eid NOT IN (SELECT eid FROM m3)""".stripMargin,

    // llm_asof_join oracle: DuckDB's NATIVE ASOF LEFT JOIN — an
    // independent implementation of most-recent-at-or-before semantics —
    // after the same per-(user, instant) max-event collapse.
    "llm_asof_join" ->
      """WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
        |  FROM events WHERE event_type = 'purchase'),
        |v0 AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id
        |  FROM events WHERE event_type = 'view'),
        |v AS (SELECT user_id, ts_us, CAST(max(event_id) AS BIGINT) AS view_event_id
        |  FROM v0 GROUP BY user_id, ts_us)
        |SELECT p.event_id, p.user_id, p.ts_us, p.value,
        |  v.ts_us AS asof_ts, v.view_event_id, p.ts_us - v.ts_us AS gap_us
        |FROM p ASOF LEFT JOIN v
        |  ON p.user_id = v.user_id AND p.ts_us >= v.ts_us""".stripMargin,

    // llm_range_join oracle: the same recurring windows off min(ts), as
    // the naive inequality join the bucketized form must equal.
    "llm_range_join" ->
      """WITH t0 AS (SELECT min(epoch_us(ts)) AS t0 FROM events),
        |w AS (SELECT g.i AS window_id, t0.t0 + g.i * 10800000000 AS lo_us,
        |    t0.t0 + g.i * 10800000000 + 2700000000 AS hi_us
        |  FROM t0, generate_series(0, 239) g(i)),
        |e AS (SELECT user_id, value, epoch_us(ts) AS ts_us FROM events)
        |SELECT w.window_id, w.lo_us, w.hi_us,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users,
        |  CAST(sum(CAST(e.value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        |FROM w JOIN e ON e.ts_us >= w.lo_us AND e.ts_us < w.hi_us
        |GROUP BY w.window_id, w.lo_us, w.hi_us""".stripMargin,

    // llm_distinct_sketch oracle: identical 512-register HLL algebra —
    // same h64 split (top 9 bits bucket, low 51 rank field), rank via
    // length(bin()) (never float log2), harmonic sum as the exact scaled
    // BIGINT, one final double division with CAST-pinned DOUBLE literals.
    // llm_cooccur oracle: same apriori-pruned doc-level pair census +
    // HUGEINT lift.
    "llm_cooccur" ->
      """WITH toks AS (SELECT doc_id, unnest(list_distinct(list_filter(string_split(lower(text), ' '), x -> len(x) > 0))) AS w
        |  FROM documents),
        |dfreq AS (SELECT w, CAST(count(*) AS BIGINT) AS df FROM toks GROUP BY w),
        |freq AS (SELECT w, df FROM dfreq WHERE df >= 50),
        |ft AS (SELECT t.doc_id, t.w FROM toks t JOIN freq f ON t.w = f.w),
        |pairs AS (SELECT a.w AS w1, b.w AS w2, CAST(count(*) AS BIGINT) AS n12
        |  FROM ft a JOIN ft b ON a.doc_id = b.doc_id AND a.w < b.w
        |  GROUP BY 1, 2 HAVING count(*) >= 50),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents)
        |SELECT p.w1, p.w2, p.n12, fa.df AS df1, fb.df AS df2,
        |  CAST((CAST(p.n12 AS HUGEINT) * nn.n * 1000000) // (CAST(fa.df AS HUGEINT) * fb.df) AS BIGINT) AS lift_micro
        |FROM pairs p JOIN freq fa ON p.w1 = fa.w JOIN freq fb ON p.w2 = fb.w, nn
        |ORDER BY lift_micro DESC, w1, w2 LIMIT 25""".stripMargin,
    // llm_attribution oracle: DuckDB's native ASOF LEFT JOIN with the
    // strict inequality, same max-event-id per-instant collapse.
    "llm_attribution" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id FROM events),
        |p AS (SELECT user_id, ts_us AS p_ts, event_id AS p_id FROM e WHERE event_type = 'purchase'),
        |t0 AS (SELECT user_id, ts_us, max_by(event_type, event_id) AS touch_type
        |  FROM e WHERE event_type != 'purchase' GROUP BY user_id, ts_us),
        |j AS (SELECT p.user_id, p.p_ts, p.p_id, t0.ts_us AS touch_ts, t0.touch_type
        |  FROM p ASOF LEFT JOIN t0 ON p.user_id = t0.user_id AND p.p_ts > t0.ts_us),
        |a AS (SELECT CASE WHEN touch_ts IS NOT NULL AND p_ts - touch_ts <= 604800000000
        |    THEN touch_type ELSE 'none' END AS attributed_type,
        |  CASE WHEN touch_ts IS NOT NULL AND p_ts - touch_ts <= 604800000000
        |    THEN p_ts - touch_ts ELSE 0 END AS delay_us
        |  FROM j)
        |SELECT attributed_type, CAST(count(*) AS BIGINT) AS n_purchases,
        |  CAST(sum(delay_us) AS BIGINT) AS total_delay_us
        |FROM a GROUP BY attributed_type""".stripMargin,
    // llm_triangles oracle: same undirect → degree-orient → wedge →
    // close construction over the enriched doc graph.
    "llm_triangles" ->
      """WITH nn AS (SELECT count(*) AS n FROM documents),
        |e AS MATERIALIZED (
        |  SELECT doc_id AS src, (doc_id * 7 + 3) % nn.n AS dst FROM documents, nn
        |  UNION ALL SELECT doc_id, doc_id - 1 FROM documents WHERE doc_id >= 1
        |  UNION ALL SELECT doc_id, doc_id - 2 FROM documents WHERE doc_id >= 2),
        |und AS (SELECT DISTINCT u, v FROM (
        |  SELECT src AS u, dst AS v FROM e WHERE src != dst
        |  UNION ALL SELECT dst, src FROM e WHERE src != dst)),
        |deg AS (SELECT u AS n, CAST(count(*) AS BIGINT) AS d FROM und GROUP BY u),
        |o AS MATERIALIZED (SELECT und.u, und.v FROM und
        |  JOIN deg da ON und.u = da.n JOIN deg db ON und.v = db.n
        |  WHERE da.d < db.d OR (da.d = db.d AND und.u < und.v)),
        |w AS (SELECT o1.u AS a, o1.v AS b, o2.v AS c FROM o o1 JOIN o o2 ON o1.v = o2.u),
        |tri AS (SELECT w.a, w.b, w.c FROM w JOIN o ON w.a = o.u AND w.c = o.v),
        |ex AS (SELECT unnest([a, b, c]) AS id FROM tri)
        |SELECT id AS doc_id, CAST(count(*) AS BIGINT) AS n_triangles
        |FROM ex GROUP BY id""".stripMargin,
    // llm_anomaly_days oracle: same cleared-denominator integer sigma
    // test over HUGEINT.
    "llm_anomaly_days" ->
      """WITH d AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(x AS HUGEINT) * x) AS sxx
        |  FROM d GROUP BY 1)
        |SELECT d.event_type, d.day, d.x,
        |  CAST(d.x * s.n - s.sx AS BIGINT) AS dev_n,
        |  CAST(d.x * s.n - s.sx AS HUGEINT) * (d.x * s.n - s.sx)
        |    > 4 * (CAST(s.n AS HUGEINT) * s.sxx - CAST(s.sx AS HUGEINT) * s.sx) AS anomalous
        |FROM d JOIN s ON d.event_type = s.event_type""".stripMargin,
    // llm_sketch_registry oracle: registers of ALL data computed
    // directly — register max is associative, so the incrementally
    // layered registry must hash identical.
    "llm_sketch_registry" ->
      """WITH u AS (SELECT event_type AS src, CAST(user_id AS VARCHAR) AS uid FROM events),
        |h AS (SELECT src, uid, CAST(('0x' || substr(md5(uid), 1, 15)) AS BIGINT) AS h FROM u),
        |b AS (SELECT src, h >> 51 AS bucket, h % 2251799813685248 AS rem FROM h),
        |rk AS (SELECT src, bucket,
        |  CASE WHEN rem = 0 THEN 52 ELSE 52 - length(bin(rem)) END AS rnk FROM b),
        |regs AS (SELECT src, bucket, CAST(max(rnk) AS BIGINT) AS reg
        |  FROM rk GROUP BY 1, 2),
        |est AS (SELECT src, CAST(count(*) AS BIGINT) AS n_occupied,
        |    sum(CAST(1 AS BIGINT) << CAST(52 - reg AS INT)) AS occ_sum
        |  FROM regs GROUP BY 1),
        |fin AS (SELECT src, n_occupied,
        |  CAST(occ_sum + (512 - n_occupied) * 4503599627370496 AS BIGINT) AS register_sum
        |  FROM est),
        |fin2 AS (SELECT src, n_occupied, register_sum,
        |  CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + CAST(1.079 AS DOUBLE) / CAST(512.0 AS DOUBLE))
        |    * CAST(262144.0 AS DOUBLE) * CAST(4503599627370496.0 AS DOUBLE)
        |    / CAST(register_sum AS DOUBLE) AS hll_estimate
        |  FROM fin),
        |ex AS (SELECT src, CAST(count(DISTINCT uid) AS BIGINT) AS exact_distinct
        |  FROM u GROUP BY src)
        |SELECT fin2.src, fin2.n_occupied, fin2.register_sum, fin2.hll_estimate,
        |  fin2.hll_estimate < CAST(1280.0 AS DOUBLE) AS small_range,
        |  ex.exact_distinct
        |FROM fin2 JOIN ex ON fin2.src = ex.src""".stripMargin,
    // llm_join_estimate oracle: both grids replayed with the standard
    // CM hash family, per-depth inner products, min fold, exact census.
    "llm_join_estimate" ->
      """WITH a AS (SELECT CAST(user_id AS VARCHAR) AS v FROM events),
        |b AS (SELECT CAST(user_id AS VARCHAR) AS v FROM events WHERE event_type = 'purchase'),
        |ga AS (SELECT j, CAST(('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || v), 1, 15)) AS BIGINT) % 1024 AS slot,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM a, unnest(generate_series(0, 3)) t(j) GROUP BY 1, 2),
        |gb AS (SELECT j, CAST(('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || v), 1, 15)) AS BIGINT) % 1024 AS slot,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM b, unnest(generate_series(0, 3)) t(j) GROUP BY 1, 2),
        |ip AS (SELECT ga.j, sum(ga.cnt * gb.cnt) AS prod
        |  FROM ga JOIN gb ON ga.j = gb.j AND ga.slot = gb.slot GROUP BY 1),
        |ipd AS (SELECT d.j, coalesce(ip.prod, 0) AS prod
        |  FROM unnest(generate_series(0, 3)) d(j) LEFT JOIN ip ON d.j = ip.j),
        |est AS (SELECT CAST(min(prod) AS BIGINT) AS cm_join_estimate FROM ipd),
        |na AS (SELECT v, count(*) AS n FROM a GROUP BY v),
        |nb AS (SELECT v, count(*) AS n FROM b GROUP BY v),
        |x AS (SELECT CAST(coalesce(sum(na.n * nb.n), 0) AS BIGINT) AS exact_join_size
        |  FROM na JOIN nb ON na.v = nb.v)
        |SELECT cm_join_estimate, exact_join_size,
        |  cm_join_estimate >= exact_join_size AS one_sided,
        |  CAST((cm_join_estimate * 1000000) // exact_join_size AS BIGINT) AS ratio_micro
        |FROM est, x""".stripMargin,
    // llm_sketch_overlap oracle: full register replay for a, b, and the
    // bucket-max union, then the same inclusion–exclusion and ratio.
    "llm_sketch_overlap" ->
      """WITH ids AS (SELECT doc_id, CAST(doc_id * 20 + k AS VARCHAR) AS id
        |  FROM documents, unnest(generate_series(0, 19)) t(k)),
        |srcs AS (SELECT 'a' AS src, id FROM ids WHERE doc_id % 3 != 0
        |  UNION ALL SELECT 'b', id FROM ids WHERE doc_id % 2 = 0),
        |h AS (SELECT src, CAST(('0x' || substr(md5(id), 1, 15)) AS BIGINT) AS h FROM srcs),
        |b2 AS (SELECT src, h >> 51 AS bucket, h % 2251799813685248 AS rem FROM h),
        |rk AS (SELECT src, bucket,
        |  CASE WHEN rem = 0 THEN 52 ELSE 52 - length(bin(rem)) END AS rnk FROM b2),
        |regs0 AS (SELECT src, bucket, CAST(max(rnk) AS BIGINT) AS reg
        |  FROM rk GROUP BY 1, 2),
        |regs AS (SELECT * FROM regs0 UNION ALL
        |  SELECT 'u', bucket, CAST(max(reg) AS BIGINT) FROM regs0 GROUP BY bucket),
        |est AS (SELECT src, CAST(count(*) AS BIGINT) AS n_occupied,
        |    sum(CAST(1 AS BIGINT) << CAST(52 - reg AS INT)) AS occ_sum
        |  FROM regs GROUP BY 1),
        |fin AS (SELECT src,
        |  CAST(occ_sum + (512 - n_occupied) * 4503599627370496 AS BIGINT) AS register_sum
        |  FROM est),
        |e2 AS (SELECT src,
        |  CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + CAST(1.079 AS DOUBLE) / CAST(512.0 AS DOUBLE))
        |    * CAST(262144.0 AS DOUBLE) * CAST(4503599627370496.0 AS DOUBLE)
        |    / CAST(register_sum AS DOUBLE) AS hll_estimate FROM fin),
        |p AS (SELECT min(CASE WHEN src = 'a' THEN hll_estimate END) AS est_a,
        |  min(CASE WHEN src = 'b' THEN hll_estimate END) AS est_b,
        |  min(CASE WHEN src = 'u' THEN hll_estimate END) AS est_union FROM e2),
        |x AS (SELECT CAST(count(*) AS BIGINT) AS exact_overlap FROM ids
        |  WHERE doc_id % 3 != 0 AND doc_id % 2 = 0)
        |SELECT est_a, est_b, est_union, est_a + est_b - est_union AS overlap_est,
        |  exact_overlap,
        |  CAST(floor((est_a + est_b - est_union) * 1000000 / exact_overlap) AS BIGINT) AS ratio_micro
        |FROM p, x""".stripMargin,
    "llm_distinct_sketch" ->
      """WITH ud AS (SELECT event_type,
        |    CAST(user_id AS VARCHAR) || '@' || CAST(epoch_us(ts) // 86400000000 AS VARCHAR) AS uday
        |  FROM events),
        |h AS (SELECT event_type, CAST(('0x' || substr(md5(uday), 1, 15)) AS BIGINT) AS h FROM ud),
        |b AS (SELECT event_type, h >> 51 AS bucket, h % 2251799813685248 AS rem FROM h),
        |rk AS (SELECT event_type, bucket,
        |  CASE WHEN rem = 0 THEN 52 ELSE 52 - length(bin(rem)) END AS rnk FROM b),
        |regs0 AS (SELECT event_type, bucket, CAST(max(rnk) AS BIGINT) AS reg
        |  FROM rk GROUP BY event_type, bucket),
        |regs AS (SELECT * FROM regs0 UNION ALL
        |  SELECT '__all__' AS event_type, bucket, CAST(max(reg) AS BIGINT) AS reg
        |  FROM regs0 GROUP BY bucket),
        |est AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_occupied,
        |    sum(CAST(1 AS BIGINT) << CAST(52 - reg AS INT)) AS occ_sum
        |  FROM regs GROUP BY event_type),
        |fin AS (SELECT event_type, n_occupied,
        |  CAST(occ_sum + (512 - n_occupied) * 4503599627370496 AS BIGINT) AS register_sum
        |  FROM est),
        |fin2 AS (SELECT event_type, n_occupied, register_sum,
        |  CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + CAST(1.079 AS DOUBLE) / CAST(512.0 AS DOUBLE))
        |    * CAST(262144.0 AS DOUBLE) * CAST(4503599627370496.0 AS DOUBLE)
        |    / CAST(register_sum AS DOUBLE) AS hll_estimate
        |  FROM fin),
        |ex AS (SELECT event_type, CAST(count(DISTINCT uday) AS BIGINT) AS exact_distinct
        |    FROM ud GROUP BY event_type
        |  UNION ALL SELECT '__all__', CAST(count(DISTINCT uday) AS BIGINT) FROM ud)
        |SELECT fin2.event_type, fin2.n_occupied, fin2.register_sum,
        |  fin2.hll_estimate,
        |  fin2.hll_estimate < CAST(1280.0 AS DOUBLE) AS small_range,
        |  ex.exact_distinct
        |FROM fin2 JOIN ex ON fin2.event_type = ex.event_type""".stripMargin,

    // llm_pagerank oracle: all 8 integer-ppb supersteps replayed as
    // generated MATERIALIZED CTE blocks (see pagerankOracle) — same
    // arithmetic-neighbour edge set, same (85·Σ(rank div deg)) div 100
    // damping, exact BIGINT throughout.
    "llm_pagerank" -> pagerankOracle(8),

    // llm_trustrank oracle: same superstep replay with the seed-scaled
    // per-node teleport instead of the uniform constant.
    "llm_trustrank" -> trustrankOracle(8),

    // llm_seed_distance oracle: 4 BFS supersteps as generated CTEs —
    // frontier join + min fold each.
    "llm_seed_distance" -> seedDistanceOracle(4),

    // llm_communities oracle: 4 synchronous LPA supersteps as generated
    // CTEs — neighbour-label counts, (cnt DESC, label ASC) top-1 via
    // QUALIFY, isolated nodes carried by the left join.
    "llm_communities" -> lpaOracle(4),

    // s2d_stream_join oracle: the batch inequality join the watermarked
    // stream-stream join must equal (30-min inclusive lookback).
    "s2d_stream_join" ->
      """WITH v AS (SELECT user_id, epoch_us(ts) AS vus, event_id AS view_event_id
        |  FROM events WHERE event_type = 'view'),
        |c AS (SELECT user_id, epoch_us(ts) AS cus, event_id AS click_event_id
        |  FROM events WHERE event_type = 'click')
        |SELECT c.user_id, c.click_event_id, v.view_event_id,
        |  c.cus - v.vus AS gap_us
        |FROM c JOIN v ON c.user_id = v.user_id
        |  AND v.vus <= c.cus AND v.vus >= c.cus - 1800000000""".stripMargin,

    // llm_heavy_hitters oracle: identical 4×1024 count-min grid (same
    // "j:value" md5 hash family), same exact-top-20 probe set, row-wise
    // min with missing slots reading 0.
    "llm_heavy_hitters" ->
      """WITH tok AS (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents),
        |t2 AS (SELECT word FROM tok WHERE length(word) > 0),
        |cnt AS (SELECT word, CAST(count(*) AS BIGINT) AS exact_count FROM t2 GROUP BY word),
        |probe AS (SELECT word, exact_count FROM cnt
        |  ORDER BY exact_count DESC, word LIMIT 20),
        |grid AS (SELECT g.j,
        |    CAST(('0x' || substr(md5(CAST(g.j AS VARCHAR) || ':' || t2.word), 1, 15)) AS BIGINT) % 1024 AS slot
        |  FROM t2, generate_series(0, 3) g(j)),
        |counters AS (SELECT j, slot, CAST(count(*) AS BIGINT) AS cnt
        |  FROM grid GROUP BY j, slot),
        |pl AS (SELECT p.word, p.exact_count, g.j,
        |    CAST(('0x' || substr(md5(CAST(g.j AS VARCHAR) || ':' || p.word), 1, 15)) AS BIGINT) % 1024 AS slot
        |  FROM probe p, generate_series(0, 3) g(j)),
        |est AS (SELECT pl.word, pl.exact_count,
        |    CAST(min(COALESCE(c.cnt, 0)) AS BIGINT) AS cm_estimate
        |  FROM pl LEFT JOIN counters c ON pl.j = c.j AND pl.slot = c.slot
        |  GROUP BY pl.word, pl.exact_count)
        |SELECT word, cm_estimate, exact_count,
        |  cm_estimate - exact_count AS overcount FROM est""".stripMargin,

    // llm_bloom_filter oracle: identical 2^16-bit / 4-hash filter
    // (bit_or-folded 32-bit-packed words — bit 63 overflows DuckDB's
    // checked <<), bool_and over the probe bits,
    // exact membership via the eval content-key set.
    "llm_bloom_filter" ->
      """WITH k AS (SELECT doc_id, md5(text) AS ck FROM documents),
        |ev AS (SELECT DISTINCT ck FROM k WHERE doc_id % 100 = 0),
        |pos AS (SELECT CAST(('0x' || substr(md5(CAST(g.j AS VARCHAR) || ':' || ev.ck), 1, 15)) AS BIGINT) % 65536 AS p
        |  FROM ev, generate_series(0, 3) g(j)),
        |bloom AS (SELECT p // 32 AS word_idx,
        |    bit_or(CAST(1 AS BIGINT) << CAST(p % 32 AS INT)) AS bits
        |  FROM pos GROUP BY p // 32),
        |pr AS (SELECT DISTINCT ck FROM k),
        |ppos AS (SELECT pr.ck,
        |    CAST(('0x' || substr(md5(CAST(g.j AS VARCHAR) || ':' || pr.ck), 1, 15)) AS BIGINT) % 65536 AS p
        |  FROM pr, generate_series(0, 3) g(j)),
        |hit AS (SELECT ppos.ck,
        |    bool_and(b.bits IS NOT NULL AND
        |      (b.bits & (CAST(1 AS BIGINT) << CAST(ppos.p % 32 AS INT))) != 0) AS in_bloom
        |  FROM ppos LEFT JOIN bloom b ON ppos.p // 32 = b.word_idx
        |  GROUP BY ppos.ck)
        |SELECT k.doc_id, h.in_bloom AS flagged,
        |  (k.ck IN (SELECT ck FROM ev)) AS in_eval_texts,
        |  h.in_bloom AND NOT (k.ck IN (SELECT ck FROM ev)) AS false_positive
        |FROM k JOIN hit h ON k.ck = h.ck""".stripMargin,

    // llm_pmi_pairs oracle: identical log-free micro-quantized PMI
    // ratio over the same pruned bigram table; exact integer ranking.
    "llm_pmi_pairs" ->
      """WITH d AS (SELECT list_filter(string_split(lower(text), ' '), x -> len(x) > 0) AS ws FROM documents),
        |uni AS (SELECT unnest(ws) AS w FROM d),
        |c1t AS (SELECT w, CAST(count(*) AS BIGINT) AS c1 FROM uni GROUP BY w),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM uni),
        |bgidx AS (SELECT ws, unnest(generate_series(1, len(ws) - 1)) AS i FROM d WHERE len(ws) >= 2),
        |bg AS (SELECT ws[i] AS w1, ws[i + 1] AS w2 FROM bgidx),
        |bgc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM bg
        |  GROUP BY w1, w2 HAVING count(*) >= 3)
        |SELECT bgc.w1, bgc.w2, bgc.c12, a.c1 AS c1_left, b.c1 AS c1_right,
        |  CAST((CAST(bgc.c12 AS HUGEINT) * n.n * 1000000) // (CAST(a.c1 AS HUGEINT) * b.c1) AS BIGINT) AS pmi_ratio_micro
        |FROM bgc JOIN c1t a ON bgc.w1 = a.w JOIN c1t b ON bgc.w2 = b.w
        |CROSS JOIN n
        |ORDER BY pmi_ratio_micro DESC, w1, w2 LIMIT 30""".stripMargin,

    // llm_event_transitions oracle: identical lag window + quantized
    // transition rates.
    "llm_event_transitions" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id FROM events),
        |l AS (SELECT user_id, event_type AS next_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_type
        |  FROM e),
        |p AS (SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n_transitions
        |  FROM l WHERE prev_type IS NOT NULL GROUP BY prev_type, next_type),
        |tot AS (SELECT prev_type, CAST(sum(n_transitions) AS BIGINT) AS n_from
        |  FROM p GROUP BY prev_type)
        |SELECT p.prev_type, p.next_type, p.n_transitions,
        |  CAST((p.n_transitions * 1000000) // t.n_from AS BIGINT) AS p_micro
        |FROM p JOIN tot t ON p.prev_type = t.prev_type""".stripMargin,

    // llm_feature_snapshot oracle: same user×day grid off the event-time
    // bounds, DuckDB's native ASOF LEFT JOIN after the same max-event-id
    // per-instant collapse.
    "llm_feature_snapshot" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, value FROM events),
        |b AS (SELECT min(ts_us) // 86400000000 AS d0, max(ts_us) // 86400000000 AS d1 FROM e),
        |days AS (SELECT unnest(generate_series(b.d0, b.d1)) AS day FROM b),
        |u AS (SELECT DISTINCT user_id FROM e),
        |grid AS (SELECT u.user_id, days.day,
        |    (days.day + 1) * 86400000000 - 1 AS eod_us FROM u, days),
        |ed AS (SELECT user_id, ts_us, event_id AS last_event_id, value AS last_value FROM e
        |  QUALIFY row_number() OVER (PARTITION BY user_id, ts_us ORDER BY event_id DESC) = 1)
        |SELECT g.user_id, g.day, ed.ts_us AS asof_ts, ed.last_event_id, ed.last_value
        |FROM grid g ASOF LEFT JOIN ed
        |  ON g.user_id = ed.user_id AND g.eod_us >= ed.ts_us""".stripMargin,

    // s2e_stream_dedup_wm oracle: the original rows exactly once — the
    // self-union duplicates must all collapse.
    "s2e_stream_dedup_wm" ->
      "SELECT event_id, event_type, user_id FROM events",

    // llm_set_join oracle: the FULL brute-force quadratic join over the
    // same distinct-shingle sets — exact integer threshold test, one
    // float division for the reported jaccard. The prefix-filtered
    // engine result must equal it pair for pair.
    "llm_set_join" ->
      """WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
        |sh AS (SELECT doc_id, CASE WHEN len(ws) < 3 THEN CAST([] AS VARCHAR[])
        |  ELSE list_distinct(list_transform(generate_series(1, len(ws)-2),
        |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) END AS shingles FROM w),
        |hsh AS (SELECT doc_id, list_distinct(list_transform(shingles,
        |    s -> CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT))) AS shingles
        |  FROM sh WHERE len(shingles) > 0),
        |d AS (SELECT doc_id, shingles, CAST(len(shingles) AS BIGINT) AS s FROM hsh),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    CAST(len(list_intersect(a.shingles, b.shingles)) AS BIGINT) AS inter,
        |    a.s AS sa, b.s AS sb
        |  FROM d a JOIN d b ON a.doc_id < b.doc_id)
        |SELECT id_a, id_b,
        |  CAST(inter AS DOUBLE) / CAST(sa + sb - inter AS DOUBLE) AS jaccard
        |FROM p WHERE inter * 2 >= (sa + sb - inter) * 1""".stripMargin,

    // llm_domain_similarity oracle: same quantize → per-label component
    // sums → pairwise integer dot / sqrt·sqrt (IEEE sqrt is correctly
    // rounded, so the one float step is engine-exact).
    "llm_domain_similarity" ->
      """WITH e AS (SELECT CAST(label AS BIGINT) AS label,
        |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0) AS BIGINT)) AS vq
        |  FROM embeddings),
        |px AS (SELECT label, unnest(generate_series(1, len(vq))) AS pos, vq FROM e),
        |comp AS (SELECT label, pos, CAST(sum(vq[pos]) AS BIGINT) AS sv
        |  FROM px GROUP BY label, pos),
        |sums AS (SELECT label, list(sv ORDER BY pos) AS sv FROM comp GROUP BY label),
        |n2s AS (SELECT label, sv,
        |    CAST(list_sum(list_transform(sv, x -> x * x)) AS BIGINT) AS n2 FROM sums),
        |cnt AS (SELECT CAST(label AS BIGINT) AS label, CAST(count(*) AS BIGINT) AS n_vecs
        |  FROM embeddings GROUP BY label),
        |lab AS (SELECT n2s.label, sv, n2, n_vecs FROM n2s JOIN cnt ON n2s.label = cnt.label)
        |SELECT a.label AS label_a, b.label AS label_b, a.n_vecs AS n_a, b.n_vecs AS n_b,
        |  CAST(list_sum(list_transform(generate_series(1, len(a.sv)),
        |      i -> a.sv[i] * b.sv[i])) AS DOUBLE)
        |    / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE))) AS cos
        |FROM lab a JOIN lab b ON a.label < b.label""".stripMargin,

    // s2f_stream_enrich oracle: the same 5-row dim as a CASE lookup.
    "s2f_stream_enrich" ->
      """SELECT event_id, event_type, user_id,
        |  CAST(CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 5
        |    WHEN 'purchase' THEN 20 WHEN 'signup' THEN 2 ELSE 0 END AS BIGINT) AS weight
        |FROM events""".stripMargin,

    // s2g_stream_hll oracle: the batch HLL replay per event type — the
    // streaming registers must land bit-identical.
    "s2g_stream_hll" ->
      """WITH ud AS (SELECT event_type,
        |    CAST(user_id AS VARCHAR) || '@' || CAST(epoch_us(ts) // 86400000000 AS VARCHAR) AS uday
        |  FROM events),
        |h AS (SELECT event_type, CAST(('0x' || substr(md5(uday), 1, 15)) AS BIGINT) AS h FROM ud),
        |b AS (SELECT event_type, h >> 51 AS bucket, h % 2251799813685248 AS rem FROM h),
        |rk AS (SELECT event_type, bucket,
        |  CASE WHEN rem = 0 THEN 52 ELSE 52 - length(bin(rem)) END AS rnk FROM b),
        |regs AS (SELECT event_type, bucket, CAST(max(rnk) AS BIGINT) AS reg
        |  FROM rk GROUP BY event_type, bucket),
        |est AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_occupied,
        |    sum(CAST(1 AS BIGINT) << CAST(52 - reg AS INT)) AS occ_sum
        |  FROM regs GROUP BY event_type),
        |fin AS (SELECT event_type, n_occupied,
        |  CAST(occ_sum + (512 - n_occupied) * 4503599627370496 AS BIGINT) AS register_sum
        |  FROM est)
        |SELECT event_type, n_occupied, register_sum,
        |  CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + CAST(1.079 AS DOUBLE) / CAST(512.0 AS DOUBLE))
        |    * CAST(262144.0 AS DOUBLE) * CAST(4503599627370496.0 AS DOUBLE)
        |    / CAST(register_sum AS DOUBLE) AS hll_estimate
        |FROM fin""".stripMargin,

    // llm_pps_sample oracle: the naive global-window replay of the same
    // integer pointer arithmetic (engine side is bucketed — same line).
    "llm_pps_sample" ->
      """WITH d0 AS (SELECT doc_id,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h,
        |    CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS weight
        |  FROM documents),
        |d AS (SELECT * FROM d0 WHERE weight > 0),
        |c AS (SELECT doc_id, weight,
        |    sum(weight) OVER (ORDER BY h, doc_id ROWS UNBOUNDED PRECEDING) AS e FROM d),
        |tw AS (SELECT CAST(sum(weight) AS BIGINT) AS w FROM d),
        |op AS (SELECT CAST(('0x' || substr(md5('pps:r8'), 1, 15)) AS BIGINT)
        |    % greatest(tw.w // 50, 1) AS o, tw.w AS w FROM tw),
        |m AS (SELECT c.doc_id, c.weight, greatest(c.e - c.weight - op.o, 0) AS x,
        |    c.e - op.o AS y, op.w AS w FROM c, op),
        |hh AS (SELECT doc_id, weight,
        |    CASE WHEN y <= 0 THEN 0
        |      ELSE greatest(least((y * 50 + w - 1) // w - 1, 49)
        |        - ((x * 50 + w - 1) // w) + 1, 0) END AS n_hits
        |  FROM m)
        |SELECT doc_id, weight, CAST(n_hits AS BIGINT) AS n_hits,
        |  n_hits > 0 AS selected FROM hh""".stripMargin,

    // s2h_stream_cm oracle: the batch count-min replay over user-days —
    // the streamed grid must land bit-identical.
    "s2h_stream_cm" ->
      """WITH ud AS (SELECT CAST(user_id AS VARCHAR) || '@' || CAST(epoch_us(ts) // 86400000000 AS VARCHAR) AS uday
        |  FROM events),
        |cnt AS (SELECT uday, CAST(count(*) AS BIGINT) AS exact_count FROM ud GROUP BY uday),
        |probe AS (SELECT uday, exact_count FROM cnt
        |  ORDER BY exact_count DESC, uday LIMIT 20),
        |grid AS (SELECT g.j,
        |    CAST(('0x' || substr(md5(CAST(g.j AS VARCHAR) || ':' || ud.uday), 1, 15)) AS BIGINT) % 1024 AS slot
        |  FROM ud, generate_series(0, 3) g(j)),
        |counters AS (SELECT j, slot, CAST(count(*) AS BIGINT) AS cnt
        |  FROM grid GROUP BY j, slot),
        |pl AS (SELECT p.uday, p.exact_count, g.j,
        |    CAST(('0x' || substr(md5(CAST(g.j AS VARCHAR) || ':' || p.uday), 1, 15)) AS BIGINT) % 1024 AS slot
        |  FROM probe p, generate_series(0, 3) g(j)),
        |est AS (SELECT pl.uday, pl.exact_count,
        |    CAST(min(COALESCE(c.cnt, 0)) AS BIGINT) AS cm_estimate
        |  FROM pl LEFT JOIN counters c ON pl.j = c.j AND pl.slot = c.slot
        |  GROUP BY pl.uday, pl.exact_count)
        |SELECT uday, cm_estimate, exact_count,
        |  cm_estimate - exact_count AS overcount FROM est""".stripMargin,

    // llm_pps_estimate oracle: the pps replay + the same micro-quantized
    // Horvitz-Thompson estimator.
    "llm_pps_estimate" ->
      """WITH d0 AS (SELECT doc_id,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h,
        |    CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS weight,
        |    CAST(length(text) AS BIGINT) AS chars
        |  FROM documents),
        |d AS (SELECT * FROM d0 WHERE weight > 0),
        |c AS (SELECT doc_id, weight, chars,
        |    sum(weight) OVER (ORDER BY h, doc_id ROWS UNBOUNDED PRECEDING) AS e FROM d),
        |tw AS (SELECT CAST(sum(weight) AS BIGINT) AS w,
        |    CAST(sum(chars) AS BIGINT) AS exact_total_chars FROM d),
        |op AS (SELECT CAST(('0x' || substr(md5('pps:r8'), 1, 15)) AS BIGINT)
        |    % greatest(tw.w // 50, 1) AS o, tw.w AS w FROM tw),
        |m AS (SELECT c.doc_id, c.weight, c.chars, greatest(c.e - c.weight - op.o, 0) AS x,
        |    c.e - op.o AS y, op.w AS w FROM c, op),
        |hh AS (SELECT doc_id, weight, chars,
        |    CASE WHEN y <= 0 THEN 0
        |      ELSE greatest(least((y * 50 + w - 1) // w - 1, 49)
        |        - ((x * 50 + w - 1) // w) + 1, 0) END AS n_hits
        |  FROM m),
        |agg AS (SELECT CAST(sum(n_hits * ((chars * 1000000) // weight)) AS BIGINT) AS c,
        |    CAST(sum(n_hits) AS BIGINT) AS n_sampled FROM hh)
        |SELECT agg.n_sampled,
        |  CAST((tw.w * agg.c) // (50 * 1000000) AS BIGINT) AS est_total_chars,
        |  tw.exact_total_chars,
        |  CAST(((tw.w * agg.c) // (50 * 1000000)) * 1000000 // tw.exact_total_chars AS BIGINT) AS ratio_micro
        |FROM agg, tw""".stripMargin,

    // llm_decayed_score oracle: identical shifted-integer decay.
    "llm_decayed_score" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
        |m AS (SELECT max(day) AS maxd FROM e)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CASE WHEN maxd - day <= 30
        |    THEN CAST(1 AS BIGINT) << CAST(30 - (maxd - day) AS INT)
        |    ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS decay_score
        |FROM e, m GROUP BY user_id""".stripMargin
  )

  /** DuckDB replay of [[llm.Graphs.pageRankPpb]] over the synthetic
    * arithmetic-neighbour doc graph: one MATERIALIZED CTE per superstep
    * (without the hint DuckDB re-inlines each multiply-referenced step —
    * the llm_bpe_train lesson), exact BIGINT `//` arithmetic.
    */
  private def pagerankOracle(iters: Int): String = {
    val steps = (1 to iters).map { k =>
      s"""r$k AS MATERIALIZED (SELECT doc.doc_id,
         |    CAST(150000000 + (85 * COALESCE(s.c, 0)) // 100 AS BIGINT) AS rank_ppb
         |  FROM documents doc LEFT JOIN (
         |    SELECT e.dst AS dst, sum(r.rank_ppb // d.deg) AS c
         |    FROM e JOIN r${k - 1} r ON e.src = r.doc_id
         |    JOIN d ON d.src = e.src
         |    GROUP BY e.dst) s ON doc.doc_id = s.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH $graphCtes,
       |d AS MATERIALIZED (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src),
       |r0 AS (SELECT doc_id, CAST(1000000000 AS BIGINT) AS rank_ppb FROM documents),
       |$steps
       |SELECT doc_id, rank_ppb FROM r$iters""".stripMargin
  }

  /** The shared synthetic-graph CTE prefix (edges + out-degrees). */
  private val graphCtes: String =
    s"""nn AS (SELECT count(*) AS n FROM documents),
       |e AS MATERIALIZED (
       |  SELECT doc_id AS src, (doc_id * 7 + 3) % nn.n AS dst FROM documents, nn
       |  UNION ALL
       |  SELECT doc_id AS src, (doc_id * 13 + 5) % nn.n AS dst FROM documents, nn
       |  UNION ALL
       |  SELECT doc_id AS src, (doc_id * 3 + 1) % nn.n AS dst FROM documents, nn
       |    WHERE doc_id % 2 = 0)""".stripMargin

  /** DuckDB replay of [[llm.Graphs.trustRankPpb]]: seed-scaled teleport
    * (doc_id % 97 seeds), otherwise the pagerankOracle superstep shape.
    */
  private def trustrankOracle(iters: Int): String = {
    val steps = (1 to iters).map { k =>
      s"""r$k AS MATERIALIZED (SELECT t.doc_id,
         |    CAST(t.tele + (85 * COALESCE(s.c, 0)) // 100 AS BIGINT) AS rank_ppb
         |  FROM tele t LEFT JOIN (
         |    SELECT e.dst AS dst, sum(r.rank_ppb // d.deg) AS c
         |    FROM e JOIN r${k - 1} r ON e.src = r.doc_id
         |    JOIN d ON d.src = e.src
         |    GROUP BY e.dst) s ON t.doc_id = s.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH $graphCtes,
       |d AS MATERIALIZED (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src),
       |ss AS (SELECT count(*) AS s FROM documents WHERE doc_id % 97 = 0),
       |tele AS MATERIALIZED (SELECT doc_id,
       |  CAST(CASE WHEN doc_id % 97 = 0 THEN (150000000 * nn.n) // ss.s ELSE 0 END AS BIGINT) AS tele
       |  FROM documents, nn, ss),
       |r0 AS (SELECT doc_id, CAST(1000000000 AS BIGINT) AS rank_ppb FROM documents),
       |$steps
       |SELECT doc_id, rank_ppb FROM r$iters""".stripMargin
  }

  /** DuckDB replay of [[llm.Graphs.labelPropagation]]: symmetrized
    * edges, then one CTE per superstep — (node, label) counts, top-1 by
    * (cnt DESC, label ASC), isolated nodes keep their label.
    */
  private def lpaOracle(iters: Int): String = {
    val steps = (1 to iters).map { k =>
      s"""c$k AS (SELECT s.u AS doc_id, p.community, count(*) AS cnt
         |  FROM sym s JOIN l${k - 1} p ON s.v = p.doc_id
         |  GROUP BY s.u, p.community),
         |p$k AS (SELECT doc_id, community FROM c$k
         |  QUALIFY row_number() OVER (PARTITION BY doc_id
         |    ORDER BY cnt DESC, community ASC) = 1),
         |l$k AS MATERIALIZED (SELECT p.doc_id,
         |    CAST(COALESCE(pk.community, p.community) AS BIGINT) AS community
         |  FROM l${k - 1} p LEFT JOIN p$k pk ON p.doc_id = pk.doc_id)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH $graphCtes,
       |sym AS MATERIALIZED (SELECT src AS u, dst AS v FROM e
       |  UNION ALL SELECT dst AS u, src AS v FROM e),
       |l0 AS (SELECT doc_id, CAST(doc_id AS BIGINT) AS community FROM documents),
       |$steps
       |SELECT doc_id, community FROM l$iters""".stripMargin
  }

  /** DuckDB replay of [[llm.Graphs.bfsDistance]]: each superstep is the
    * frontier join + min fold over (previous ∪ relaxed) distances.
    */
  private def seedDistanceOracle(maxDepth: Int): String = {
    val steps = (1 to maxDepth).map { k =>
      s"""d$k AS MATERIALIZED (SELECT doc_id, CAST(min(dist) AS BIGINT) AS dist FROM (
         |    SELECT doc_id, dist FROM d${k - 1}
         |    UNION ALL
         |    SELECT e.dst AS doc_id, p.dist + 1 AS dist
         |    FROM e JOIN d${k - 1} p ON e.src = p.doc_id
         |  ) GROUP BY doc_id)""".stripMargin
    }.mkString(",\n")
    s"""WITH $graphCtes,
       |d0 AS (SELECT doc_id, CAST(0 AS BIGINT) AS dist FROM documents WHERE doc_id % 97 = 0),
       |$steps
       |SELECT doc_id, dist FROM d$maxDepth""".stripMargin
  }
}
