package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._
import EntryHelpers._

/** Reference-surface query registry (SURVEY §2.1–2.11: scans, sinks, projections, joins, aggregations, scalars, combinatorial expansions, loader pipelines g1–g36 and the sf-scaled ldr_* replays). */
private[graft] object QueriesRef {

  /** The K1 classification frame — shared by k1_upsert_classify and
    * k2_change_counts (extracting it avoids rebuilding the whole
    * concatenated registry to look up a sibling row).
    */
  private def upsertClassify(s: SparkSession, dir: String): DataFrame = {
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
  }

  def registry: Map[String, (SparkSession, String) => DataFrame] = Map(


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
    "k1_upsert_classify" -> (upsertClassify(_, _)),

    // K9 (audit counters): action → count over the same classification.
    "k2_change_counts" -> ((s, dir) => {
      upsertClassify(s, dir)
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
  )
}
