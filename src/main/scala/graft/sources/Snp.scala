package graft.sources

import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.PersistentGraphStore
import graft.remote.EntrezBatch
import graft.variant.HgvsParser

/** dbSNP esummary loader (reference `src/entrez/snp.js`): rsIDs are
  * hydrated through the entrez esummary API into `CatalogueVariant`
  * vertices, and each record's docsum HGVS annotations become a ladder of
  * `PositionalVariant`s chained with `Infers` edges —
  *
  *   cds (NM_) → protein (NP_) → gene-based protein   (snp.js:45-104)
  *   (cds || protein) → catalogue variant             (snp.js:118-131)
  *
  * with the transcript / protein / gene reference records themselves
  * hydrated on-demand through the refseq and gene esummary loaders
  * (snp.js:51-53, 66-68, 85-87 `fetchAndLoadByIds`).
  *
  * Spark shape: the catalogue "cache" is the store dimension — an
  * anti-join on the rs-name finds unresolved ids (J9), the fetch leg is
  * the batched S15 pattern, the docsum parse is pure column expressions
  * (filter/sort_array/reverse over the `;`/`,` tag splits — codegen'd),
  * and only the HGVS grammar runs in a typed flatMap. Reference
  * resolution (vocab term, refseq dim, gene dim) is declarative joins;
  * per-leg failures (parse error, vocab miss, unfetchable reference)
  * degrade to a dropped leg + the `hgvs_errors` side-channel, mirroring
  * the reference's per-leg try/catch + logger.error (snp.js:56-58,
  * 98-100).
  */
object Snp {

  val LinkUrl = "https://www.ncbi.nlm.nih.gov/snp" // snp.js:18

  /** Materialize a classpath-packaged recorded fixture (the repo's
    * analog of the reference's `test/data/entrez_*.json` recordings) to a
    * local file so the disk-proxy fetchers can read it. Local-replay by
    * design, like every `remote/` fixture path.
    */
  def fixturePath(resource: String): String = {
    val in = getClass.getResourceAsStream(resource)
    require(in != null, s"missing resource $resource")
    try {
      val f = java.io.File.createTempFile("graft-fixture", ".json")
      f.deleteOnExit()
      java.nio.file.Files.copy(in, f.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      f.getPath
    } finally in.close()
  }

  /** esummary docsum parse (snp.js:107-130 `parseRecord`): identity
    * fields from the payload, plus the HGVS tag split — unescape `&gt;`,
    * split on `;`, take the FIRST `HGVS=` tag (the reference `break`s),
    * split on `,`, `.sort().reverse()` (descending lexicographic — the
    * highest accession version wins), then cds = first `^NM_\d+.*:c\..*`
    * entry, protein = first `^NP_\d+.*:p\..*` entry.
    */
  def parseSnp(fetched: DataFrame, payloadCol: String = "payload"): DataFrame = {
    val p = col(payloadCol)
    def g(field: String) = get_json_object(p, "$." + field)
    val docsum = regexp_replace(g("docsum"), "&gt;", ">")
    // get() (not apply) — a docsum without an HGVS tag yields null, the
    // reference's no-match fall-through, instead of an ANSI index error
    val hgvsTag = get(filter(split(docsum, ";"), t => t.startsWith("HGVS=")), lit(0))
    val notations = reverse(array_sort(
      split(regexp_replace(hgvsTag, "^HGVS=", ""), ",")))
    fetched.select(
      g("uid").as("sourceId"),
      concat(lit("rs"), g("snp_id")).as("name"),
      concat(lit("rs"), g("snp_id")).as("displayName"),
      g("updatedate").as("sourceIdVersion"),
      concat(lit(LinkUrl + "/rs"), g("snp_id")).as("url"),
      from_json(g("genes"), org.apache.spark.sql.types.DataType.fromDDL(
        "array<struct<name:string,gene_id:string>>"))("gene_id").as("genes"),
      get(filter(notations, n => n.rlike("^NM_\\d+.*:c\\..*")), lit(0)).as("cds"),
      get(filter(notations, n => n.rlike("^NP_\\d+.*:p\\..*")), lit(0)).as("protein"))
  }

  /** Disk-proxy fetcher for rs-named requests: the civic path requests
    * `rs\d+` strings (civic/variant.js:510-512) while the recorded
    * esummary response is keyed by numeric uid — strip the prefix for
    * the lookup and return the uid-keyed document.
    */
  def rsFetcher(files: Map[String, String]): Seq[String] => Seq[(String, String)] =
    ids => ids.flatMap { id0 =>
      val uid = id0.trim.toLowerCase.stripPrefix("rs")
      files.get(uid).toSeq.flatMap { path =>
        val body = new String(
          java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8")
        Entrez.esummaryDocs(body).filter(_._1 == uid)
      }
    }

  /** One docsum-HGVS ladder leg. `ref1` is the raw parsed feature — the
    * versioned accession for cds/protein legs, the entrez gene uid for
    * the alternate-protein leg; `err` carries a parse failure.
    */
  private[sources] case class SnpLeg(
      snp: String, snpName: String, leg: String, notation: String,
      vtype: String, ref1: String, break1: String, err: String)

  /** loadFromDocsumHgvs leg extraction (snp.js:45-104): `|`-separated
    * annotation suffixes are tolerated (`split('|')[0]` is the notation,
    * a `GENE=SYM:ID` element routes the alternate gene-based protein,
    * snp.js:66-71, 85-88); a parse failure yields an error leg (the
    * reference's per-leg catch). The alternate leg is only emitted when
    * the protein notation parsed — downstream survival joins enforce the
    * rest of the reference's throw-before-alt ordering.
    */
  private[sources] def legsOf(
      snp: String, name: String, cds: String, protein: String): Seq[SnpLeg] = {
    val out = Seq.newBuilder[SnpLeg]
    if (cds != null) {
      val n0 = cds.split('|')(0)
      Try(HgvsParser.parse(n0, requireFeatures = true)) match {
        case Success(v) => out += SnpLeg(snp, name, "cds", n0, v.vtype,
          v.reference1.orNull, v.break1Repr.orNull, null)
        case Failure(e) => out += SnpLeg(snp, name, "cds", n0, null, null,
          null, e.getMessage)
      }
    }
    if (protein != null) {
      val parts = protein.split('|')
      val n0 = parts(0)
      // gene.split(':')[1] — "GENE=SYM:ID" → ID (snp.js:86)
      val geneUid = parts.find(_.startsWith("GENE=")).map(_.split(':')(1))
      Try(HgvsParser.parse(n0, requireFeatures = true)) match {
        case Success(v) =>
          out += SnpLeg(snp, name, "protein", n0, v.vtype,
            v.reference1.orNull, v.break1Repr.orNull, null)
          geneUid.foreach { gid =>
            out += SnpLeg(snp, name, "alt", n0, v.vtype, gid,
              v.break1Repr.orNull, null)
          }
        case Failure(e) => out += SnpLeg(snp, name, "protein", n0, null,
          null, null, e.getMessage)
      }
    }
    out.result()
  }

  /** The composed `fetchAndLoadByIds` (snp.js:139-150 + loadSnpRecord):
    * resolve rs-names against the catalogue dimension, batch-fetch the
    * misses, upsert `CatalogueVariant`s, hydrate the refseq / gene
    * reference dimensions the docsum legs need, upsert the
    * `PositionalVariant` ladder and its `Infers` chain.
    *
    * `vocab` is (name, term_id) — the any-source `getVocabularyTerm`
    * resolution (min term wins, same as the civic loader's fallback).
    */
  def fetchAndLoad(
      spark: SparkSession,
      store: PersistentGraphStore,
      ids: Dataset[String],
      snpFetcher: Seq[String] => Seq[(String, String)],
      refseqFetcher: Seq[String] => Seq[(String, String)],
      geneFetcher: Seq[String] => Seq[(String, String)],
      vocab: DataFrame,
      catalogueTable: String = "catalogue_variants",
      refseqTable: String = "refseq",
      genesTable: String = "genes",
      variantsTable: String = "variants"): Map[String, Long] = {
    import spark.implicits._

    val requested = ids.map(_.trim.toLowerCase).distinct()
    // the preLoadCache / cache-hit skip (snp.js:139-147): already-stored
    // catalogue names are not re-fetched
    val missing = store.read(catalogueTable) match {
      case Some(dim) => requested.toDF("name")
        .join(dim.select(lower(col("name")).as("name")), Seq("name"), "left_anti")
        .as[String]
      case None => requested
    }
    // full cache hit → the reference returns per-id from preLoadCache
    // with NO fetch and NO writes (snp.js:139-147); mirroring that skip
    // here avoids version-bumping four store tables with all-noop merges
    // on every idempotent re-run (a pure re-load would otherwise cost the
    // whole merge cycle just to record zero changes)
    if (missing.isEmpty) return Map.empty
    val parsed = parseSnp(EntrezBatch.fetchByIds(missing, snpFetcher)).persist()
    try {
      val catCounts = store.merge(catalogueTable,
        parsed.select(col("sourceId"), col("name"), col("displayName"),
          col("sourceIdVersion"), col("url")),
        keyCols = Seq("sourceId"),
        compareCols = Seq("name", "displayName", "sourceIdVersion", "url"))
      // ids the API returned nothing for — the civic path treats these as
      // an error ("unable to fetch variant by RSID", civic/variant.js:519)
      val misses = missing.toDF("name")
        .join(parsed.select(lower(col("name")).as("name")), Seq("name"), "left_anti")
        .count()

      val legs = parsed.select(col("sourceId"), col("name"), col("cds"),
        col("protein")).as[(String, String, String, String)]
        .flatMap { case (s, n, c, p) => legsOf(s, n, c, p) }
        .toDF().persist()
      try {
        val parseErrors = legs.filter(col("err").isNotNull).count()
        val terms = vocab.groupBy(col("name").as("vtype"))
          .agg(min(col("term_id")).as("term"))
        val typed = legs.filter(col("err").isNull)
          .join(broadcast(terms), Seq("vtype"), "left")
        val termMisses = typed.filter(col("term").isNull).count()
        val ok = typed.filter(col("term").isNotNull)
          .withColumn("ref1Resolved",
            when(col("leg") === "alt", col("ref1"))
              .otherwise(split_part(col("ref1"), lit("."), lit(1))))

        // reference-dimension hydration (snp.js:51-53, 66-68 refseq;
        // :85-87 entrez gene) — fetch only accessions / uids absent from
        // the store dimension, exactly the J9+S15 hydrate pattern
        def hydrateDim(table: String, legFilter: Column, idCol: Column,
            fetcher: Seq[String] => Seq[(String, String)],
            parser: DataFrame => DataFrame, compareCols: Seq[String]): Unit = {
          val want = ok.filter(legFilter).select(idCol.as("id")).distinct()
          val miss = store.read(table) match {
            case Some(dim) => want.join(
              dim.select(col("sourceId").as("idKey")),
              split_part(col("id"), lit("."), lit(1)) === col("idKey"),
              "left_anti").select("id")
            case None => want
          }
          val fetched = EntrezBatch.fetchByIds(miss.as[String], fetcher)
          store.merge(table, parser(fetched), Seq("sourceId"), compareCols)
          ()
        }
        hydrateDim(refseqTable, col("leg").isin("cds", "protein"), col("ref1"),
          refseqFetcher, Entrez.parseRefseq(_),
          Seq("sourceIdVersion", "biotype", "name", "displayName", "longName"))
        hydrateDim(genesTable, col("leg") === "alt", col("ref1"),
          geneFetcher, Entrez.parseGene(_),
          Seq("biotype", "name", "displayName", "longName", "description", "url"))

        // survival: a leg whose reference record could not be fetched is
        // dropped (the reference's rid(undefined) throw inside the leg
        // try, snp.js:52-55 / 67-73), and the alternate leg additionally
        // requires its protein leg to have survived (the throw happens
        // before the gene branch, snp.js:66-92)
        val refDim = store.read(refseqTable).map(_.select(col("sourceId")))
          .getOrElse(Seq.empty[String].toDF("sourceId"))
        val geneDim = store.read(genesTable).map(_.select(col("sourceId")))
          .getOrElse(Seq.empty[String].toDF("sourceId"))
        val refLegs = ok.filter(col("leg").isin("cds", "protein"))
          .join(refDim, col("ref1Resolved") === col("sourceId"), "left_semi")
        val altLegs = ok.filter(col("leg") === "alt")
          .join(geneDim, col("ref1Resolved") === col("sourceId"), "left_semi")
          .join(refLegs.filter(col("leg") === "protein").select(col("snp").as("__ps")),
            col("snp") === col("__ps"), "left_semi")
        val survivors = refLegs.unionByName(altLegs).persist()
        try {
          val refMisses = ok.count() - survivors.count()
          val vids = survivors.withColumn("vid",
            concat(col("ref1Resolved"), lit(":"), col("notation"),
              lit("@"), col("term")))
          val varCounts = store.merge(variantsTable,
            vids.select(col("vid"), col("notation"), lit(true).as("positional"),
              col("term"), col("break1"), col("ref1Resolved").as("reference1")),
            keyCols = Seq("vid"),
            compareCols = Seq("notation", "positional", "term", "break1",
              "reference1"))

          // the Infers chain (snp.js:76-79 cds→protein, :89-92
          // protein→alternate, :124-130 (cds||protein)→catalogue)
          val per = vids.groupBy(col("snp"), col("snpName")).agg(
            max(when(col("leg") === "cds", col("vid"))).as("cdsVid"),
            max(when(col("leg") === "protein", col("vid"))).as("protVid"),
            max(when(col("leg") === "alt", col("vid"))).as("altVid"))
          val nullS = lit(null).cast("string")
          val e1 = per.filter(col("cdsVid").isNotNull && col("protVid").isNotNull)
            .select(col("cdsVid").as("out"), col("protVid").as("in"),
              lit("Infers").as("edgeClass"), nullS.as("comment"))
          val e2 = per.filter(col("protVid").isNotNull && col("altVid").isNotNull)
            .select(col("protVid").as("out"), col("altVid").as("in"),
              lit("Infers").as("edgeClass"), nullS.as("comment"))
          val e3 = per.filter(coalesce(col("cdsVid"), col("protVid")).isNotNull)
            .select(coalesce(col("cdsVid"), col("protVid")).as("out"),
              col("snpName").as("in"),
              lit("Infers").as("edgeClass"), nullS.as("comment"))
          val edgeCounts = store.upsertEdges(e1.unionByName(e2).unionByName(e3))

          val errors = parseErrors + termMisses + refMisses
          catCounts.map { case (k, v) => s"catalogue_$k" -> v } ++
            varCounts.map { case (k, v) => s"variants_$k" -> v } ++
            edgeCounts.map { case (k, v) => s"edges_$k" -> v } ++
            (if (errors > 0) Map("hgvs_errors" -> errors) else Map.empty) ++
            (if (misses > 0) Map("misses" -> misses) else Map.empty)
        } finally { survivors.unpersist(); () }
      } finally { legs.unpersist(); () }
    } finally { parsed.unpersist(); () }
  }
}
