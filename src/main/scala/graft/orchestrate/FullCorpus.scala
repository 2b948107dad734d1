package graft.orchestrate

import org.apache.spark.sql.{SparkSession}
import org.apache.spark.sql.functions._

import graft.core.PersistentGraphStore
import graft.sources._
import Orchestrator.Loader

/** The reference's whole-corpus dependency DAG wired over every
  * implemented end-to-end loader, all into ONE shared store.
  *
  * Dependency edges transcribed from the reference's Snakemake rules and
  * per-loader `dependencies` exports:
  *  - load_ncit ← vocab, load_fda_srs ← vocab (Snakefile:214-232; the
  *    UNII→NCIt xref additionally needs the NCIt terms, fdaSrs/index.js:66)
  *  - load_do / load_uberon / load_oncotree ← ncit (Snakefile:261-296)
  *  - load_drugbank ← fda_srs (Snakefile:279-287)
  *  - load_refseq ← vocab (Snakefile:243-251; entrez gene hydration is
  *    implicit via fetchAndLoadByIds, refseq/index.js:72)
  *  - load_ensembl ← refseq (Snakefile:252-260)
  *  - hgnc dependencies: [ensembl] (hgnc/index.js:296)
  *  - load_civic ← local vocab (Snakefile:367-376); its gene references
  *    hydrate through entrez (civic/variant.js:447-466)
  *  - clinicaltrialsgov ← the drug + disease dimensions it resolves
  *    against (clinicaltrialsgov/index.js:155-180)
  *  - vario / chembl: no upstream inputs (vario.js, chembl/index.js —
  *    fetched on demand)
  *
  * Dimensions flow THROUGH the store between loaders — fdaSrs resolves
  * NCIt codes against the terms the ncit loader merged, refseq gates its
  * gene edges on the entrez-hydrated dimension, clinicaltrialsgov resolves
  * interventions/conditions against the loaded therapy/disease tables —
  * exactly how the reference loaders resolve against the live graph.
  *
  * Shared class tables: `therapies` takes fdaSrs + drugbank + chembl
  * (same natural key, different payload columns — the store's schema
  * evolution aligns them), `features` takes ensembl + refseq, `genes`
  * takes entrez + civic references, `edges` takes every loader's edge
  * candidates. Sources whose natural key DIFFERS from the table's
  * (bucket-pruning requires one key per table) get their own table:
  * hgnc genes are keyed (sourceId, name) → `genes_hgnc`; VariO terms are
  * keyed sourceId while the seed vocabulary is keyed name → `vario_terms`.
  */
object FullCorpus {

  val RefData = "/root/reference/test/data"

  /** The NCIt Thesaurus sample (same rows the g3 oracle pins). */
  val NcitSample: Seq[Seq[String]] = Seq(
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

  def writeNcitSample(): String = {
    val f = java.io.File.createTempFile("graft-ncit-corpus", ".txt")
    java.nio.file.Files.writeString(f.toPath,
      NcitSample.map(_.mkString("\t")).mkString("\n"))
    f.getPath
  }

  /** Inline uberon RDF/XML sample (no reference fixture exists): three
    * labeled classes, one unlabeled, one ncit xref that misses the NCIt
    * sample's codes — the lookup-miss path at DAG scale.
    */
  def writeUberonSample(): String = {
    val owl =
      """<?xml version="1.0"?>
        |<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
        |    xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#"
        |    xmlns:owl="http://www.w3.org/2002/07/owl#"
        |    xmlns:obo="http://purl.obolibrary.org/obo/"
        |    xmlns:oboInOwl="http://www.geneontology.org/formats/oboInOwl#">
        |  <owl:Class rdf:about="http://purl.obolibrary.org/obo/UBERON_0000001">
        |    <rdfs:label>anatomical structure</rdfs:label>
        |    <oboInOwl:hasDbXref>NCIT:C12345</oboInOwl:hasDbXref>
        |  </owl:Class>
        |  <owl:Class rdf:about="http://purl.obolibrary.org/obo/UBERON_0000002">
        |    <rdfs:label>lung</rdfs:label>
        |    <rdfs:subClassOf rdf:resource="http://purl.obolibrary.org/obo/UBERON_0000001"/>
        |  </owl:Class>
        |  <owl:Class rdf:about="http://purl.obolibrary.org/obo/UBERON_0000003">
        |    <obo:IAO_0000115>no label</obo:IAO_0000115>
        |  </owl:Class>
        |  <owl:Class rdf:about="http://purl.obolibrary.org/obo/UBERON_0000004">
        |    <rdfs:label>heart</rdfs:label>
        |    <rdfs:subClassOf rdf:resource="http://purl.obolibrary.org/obo/UBERON_0000001"/>
        |  </owl:Class>
        |</rdf:RDF>""".stripMargin
    val f = java.io.File.createTempFile("graft-uberon-corpus", ".owl")
    java.nio.file.Files.writeString(f.toPath, owl)
    f.getPath
  }

  def loaders(store: PersistentGraphStore, ncitPath: String,
      refData: String = RefData): Seq[Loader] = Seq(

    // the REAL local-data DAG roots (Snakefile rule all_local: vocab,
    // signatures, chromosomes, evidenceLevels, aacr, asco)
    Loader("vocab", Seq.empty, sp => OntologyFile.load(sp, store,
      "/root/reference/data/vocab.json", "vocabulary")),
    Loader("signatures", Seq.empty, sp => OntologyFile.load(sp, store,
      "/root/reference/data/signatures.json", "signatures")),
    Loader("chromosomes", Seq.empty, sp => OntologyFile.load(sp, store,
      "/root/reference/data/chromosomes.json", "chromosomes")),
    Loader("evidenceLevels", Seq.empty, sp => OntologyFile.load(sp, store,
      "/root/reference/data/evidenceLevels.json", "evidence_levels")),
    Loader("aacr", Seq.empty, sp => OntologyFile.load(sp, store,
      "/root/reference/data/aacr.json", "abstracts_aacr")),
    Loader("ascoLocal", Seq.empty, sp => OntologyFile.load(sp, store,
      "/root/reference/data/asco.json", "abstracts_asco")),

    Loader("ncit", Seq("vocab"), sp => NcitLoad.load(sp, store, ncitPath)),

    Loader("fdaSrs", Seq("vocab", "ncit"), sp => FdaSrs.load(sp, store,
      s"$refData/UNII_Records_25Oct2018_sample.txt",
      store.read("terms").get.select("sourceId"))),

    Loader("do", Seq("ncit"), sp =>
      Loaders.loadDoid(sp, store, s"$refData/doid.sample.json")),

    Loader("oncotree", Seq("ncit"), sp => Loaders.loadOncotree(sp, store,
      s"$refData/tumorTypes-oncotree_latest_stable.json")),

    Loader("drugbank", Seq("fdaSrs"), sp =>
      Loaders.loadDrugbank(sp, store, s"$refData/drugbank_sample.xml")),

    Loader("entrez", Seq.empty, sp => {
      val g = Entrez.hydrate(sp, store, "genes", Seq("3845"),
        Entrez.fileFetcher(Map("3845" -> s"$refData/entrez_gene.3845.json")),
        Entrez.parseGene(_), Seq("sourceId"),
        Seq("biotype", "name", "displayName", "longName", "description", "url"))
      val p = Entrez.hydrate(sp, store, "articles", Seq("30016509"),
        Entrez.fileFetcher(
          Map("30016509" -> s"$refData/entrez_pubmed.30016509.json")),
        Entrez.parsePubmed(_), Seq("sourceId"),
        Seq("name", "journalName", "year", "displayName"))
      g ++ p.map { case (k, v) => s"pubmed_$k" -> v }
    }),

    Loader("refseq", Seq("vocab", "entrez"), sp => RefseqTab.load(sp, store,
      s"$refData/LRG_RefSeqGene_d1541209245_kras.tab",
      store.read("genes").get)),

    Loader("ensembl", Seq("refseq"), sp => Loaders.loadEnsembl(sp, store,
      s"$refData/ensembl_biomart_export_ENSG00000139618.tsv")),

    Loader("hgnc", Seq("ensembl"), sp => Loaders.loadHgnc(sp, store,
      Loaders.hgncDocs(sp, s"$refData/external_api_responses.json",
        "http://rest.genenames.org/fetch/hgnc_id/1101"),
      table = "genes_hgnc")),

    Loader("vario", Seq.empty, sp => Vario.load(sp, store,
      s"$refData/vario_v2018-04-27.owl", table = "vario_terms")),

    Loader("chembl", Seq.empty, sp =>
      Chembl.load(sp, store, s"$refData/chembl.CHEMBL553.json")),

    Loader("civic", Seq("vocab", "entrez"), sp => {
      val vocabDim = store.read("vocabulary").get.select(col("name"),
        lit("graphkb").as("source"), col("name").as("term_id"))
      CivicVariants.load(sp, store, s"$refData/civic_variant.json",
        vocabDim, featuresTable = "genes")
    }),

    Loader("clinicaltrialsgov", Seq("drugbank", "do", "oncotree"), sp => {
      val therapyDim = store.read("therapies").get.select("name")
      val diseaseDim = store.read("vertices").get.select("name")
        .unionByName(store.read("diseases").get.select("name")).distinct()
      ClinicalTrials.load(sp, store,
        s"$refData/clinicaltrialsgov.NCT03478891.json", therapyDim, diseaseDim)
    }),

    // uberon ← ncit (Snakefile:270-278): the xref gate resolves against
    // the loaded terms — the sample's NCIT code misses them, exercising
    // the skip path
    Loader("uberon", Seq("ncit"), sp => Uberon.load(sp, store,
      writeUberonSample(), store.read("terms").get.select("sourceId"))),

    // refseq esummary hydration on all four recorded fixtures
    Loader("entrezRefseq", Seq.empty, sp => {
      val ids = Seq("NC_000003.11", "NC_000003", "NM_005228.5", "NP_008819.1")
      Entrez.hydrate(sp, store, "refseqs", ids,
        Entrez.fileFetcher(
          ids.map(i => i -> s"$refData/entrez_refseq.$i.json").toMap),
        Entrez.parseRefseq(_), Seq("sourceId", "sourceIdVersion"),
        Seq("biotype", "name", "displayName", "longName"),
        matchCol = "displayName")
    }),

    // dgidb ← entrez + chembl (dgidb/index.js:91 dependencies export):
    // interactions resolve against the store-loaded gene and drug dims
    Loader("dgidb", Seq("entrez", "chembl"), sp => Dgidb.load(sp, store,
      Seq(
        Dgidb.Interaction("dag-u1", "3845", "chembl:CHEMBL553",
          Seq("Inhibitor", " antagonist ")),
        Dgidb.Interaction("dag-u2", "9999", "chembl:CHEMBL553",
          Seq("inhibitor"))),
      store.read("genes").get, store.read("therapies").get)))

  /** Run the whole corpus DAG into `store`; returns the report. */
  def run(spark: SparkSession, store: PersistentGraphStore,
      ncitPath: String): Orchestrator.Report =
    Orchestrator.run(spark, loaders(store, ncitPath))
}
