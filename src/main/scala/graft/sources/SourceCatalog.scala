package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.PersistentGraphStore

/** The reference's source catalog (src/sources.js:1-298) and its seeder
  * (src/all_sources/index.js:1-20): every loader's source definition,
  * upserted into the `sources` dimension keyed by name (graphkb.js
  * addSource:614-624 fetches by name and upserts).
  *
  * The `sort` ranks here are what the ontology preference ladder's
  * sourceRank rung consumes (graphkb.js orderPreferredOntologyTerms:
  * 152-159 compares `source.sort`): drugbank/oncotree/graphkb 0 beat
  * chembl/do/entrez 1 beat hgnc/ncit 2 beat ensembl/fdaSrs 3 beat civic 4
  * beat gsc-to 5 beat the 99999 sinks (oncokb/profyle/tso500). Sources
  * without a sort rank order last (ladder `asc_nulls_last`).
  *
  * Free-text `description` / license-body fields are intentionally not
  * transcribed — they are display-only strings with no query semantics
  * (nothing in the reference reads them back).
  */
object SourceCatalog {

  /** One sources.js entry; Options mirror the JS object's missing keys. */
  case class SourceDef(key: String, name: String,
      displayName: Option[String], longName: Option[String],
      sort: Option[Int], url: Option[String], usage: Option[String])

  private def s(key: String, name: String, displayName: String = null,
      longName: String = null, sort: Integer = null, url: String = null,
      usage: String = null): SourceDef =
    SourceDef(key, name, Option(displayName), Option(longName),
      Option(sort).map(_.intValue), Option(url), Option(usage))

  /** sources.js:2-298, structural fields. */
  val all: Seq[SourceDef] = Seq(
    s("PMC4232638", "PMC4232638-supp", displayName = "PMC4232638-supp",
      url = "https://www.ncbi.nlm.nih.gov/pmc/articles/PMC4232638/bin/13059_2014_484_MOESM2_ESM.xlsx"),
    s("PMC4468049", "PMC4468049-supp", displayName = "PMC4468049-supp",
      url = "https://www.ncbi.nlm.nih.gov/pmc/articles/PMC4468049/bin/NIHMS632238-supplement-2.xlsx"),
    s("amp", "amp", displayName = "AMP",
      longName = "association for molecular pathology", url = "https://www.amp.org"),
    s("asco", "asco", displayName = "ASCO",
      longName = "American Society of Clinical Oncology",
      url = "https://meetinglibrary.asco.org"),
    s("cancerhotspots", "cancerhotspots.org", displayName = "cancerhotspots.org",
      url = "https://www.cancerhotspots.org"),
    s("cgi", "cancer genome interpreter", displayName = "CGI",
      longName = "cancer genome interpreter - Cancer Biomarkers database",
      url = "https://www.cancergenomeinterpreter.org/biomarkers"),
    s("cgl", "cgl", displayName = "CGL",
      longName = "BC Cancer Genetics and Genomics Laboratory",
      url = "https://www.cancergenomeinterpreter.org"),
    s("chembl", "chembl", displayName = "ChEMBL", sort = 1,
      url = "https://www.ebi.ac.uk/chembl",
      usage = "https://creativecommons.org/licenses/by-sa/3.0"),
    s("civic", "civic", displayName = "CIViC", sort = 4,
      url = "https://civicdb.org",
      usage = "https://creativecommons.org/publicdomain/zero/1.0"),
    s("clinicalTrialsGov", "clinicaltrials.gov",
      url = "https://clinicaltrials.gov",
      usage = "https://clinicaltrials.gov/ct2/about-site/terms-conditions#Use"),
    s("cosmic", "cosmic", displayName = "COSMIC",
      url = "https://cancer.sanger.ac.uk/cosmic",
      usage = "https://cancer.sanger.ac.uk/cosmic/license"),
    s("cpic", "cpic", displayName = "CPIC",
      longName = "clinical pharmacogenetics implementation consortium",
      url = "https://cpicpgx.org", usage = "https://cpicpgx.org/license"),
    s("dbSnp", "dbsnp", displayName = "dbSNP",
      url = "https://www.ncbi.nlm.nih.gov/snp",
      usage = "https://www.ncbi.nlm.nih.gov/home/about/policies"),
    s("dgidb", "dgidb", displayName = "DGIdb",
      longName = "Drug Gene Interaction Database", usage = "http://dgidb.org/faq"),
    s("diseaseOntology", "disease ontology", displayName = "Disease Ontology",
      longName = "Human Disease Ontology", sort = 1,
      url = "http://disease-ontology.org"),
    s("docm", "database of curated mutations", displayName = "DoCM",
      url = "http://www.docm.info", usage = "http://www.docm.info/terms"),
    s("drugbank", "drugbank", displayName = "DrugBank", sort = 0,
      url = "https://www.drugbank.ca",
      usage = "https://creativecommons.org/licenses/by-nc/4.0/legalcode"),
    s("ensembl", "ensembl", displayName = "Ensembl", sort = 3,
      url = "https://uswest.ensembl.org",
      usage = "https://uswest.ensembl.org/info/about/legal/disclaimer.html"),
    s("entrezGene", "entrez gene", sort = 1,
      url = "https://www.ncbi.nlm.nih.gov/gene",
      usage = "https://www.ncbi.nlm.nih.gov/home/about/policies"),
    s("esmo", "esmo", displayName = "ESMO",
      longName = "European Society for Medical Oncology", sort = 1,
      url = "https://www.esmo.org",
      usage = "https://www.esmo.org/terms-of-use/website-terms-conditions"),
    s("fdaApprovals", "fda approvals", displayName = "FDA Approvals",
      longName = "FDA Hematology/Oncology (Cancer) Approvals & Safety Notifications",
      url = "https://www.fda.gov/drugs/resources-information-approved-drugs/hematologyoncology-cancer-approvals-safety-notifications"),
    s("fdaSrs", "fda srs", displayName = "FDA-SRS",
      longName = "FDA Substance Registration System", sort = 3,
      url = "https://fdasis.nlm.nih.gov/srs"),
    s("graphkb", "graphkb", displayName = "GraphKB",
      longName = "Graph Knowledgebase", sort = 0, url = "https://graphkb.bcgsc.ca"),
    s("gscTherapeuticOntology", "gsc therapeutic ontology",
      displayName = "GSC-TO", sort = 5),
    s("hgnc", "hgnc", displayName = "HGNC",
      longName = "HUGO Gene Nomenclature Committee", sort = 2,
      url = "https://www.genenames.org/about",
      usage = "https://www.ebi.ac.uk/about/terms-of-use"),
    s("ipr", "ipr", displayName = "IPR",
      longName = "Integrated Pipeline Reports (IPR) Aggregated Evidence Levels",
      url = "https://ipr.bcgsc.ca"),
    s("iprkb", "iprkb", displayName = "IPRKB",
      url = "https://ipr.bcgsc.ca/knowledgebase/references"),
    s("moa", "moa", displayName = "MOAlmanac",
      longName = "Molecular Oncology Almanac", url = "https://moalmanac.org",
      usage = "https://moalmanac.org/terms"),
    s("ncit", "ncit", displayName = "NCIt", longName = "NCI Thesaurus",
      sort = 2, url = "https://ncit.nci.nih.gov/ncitbrowser",
      usage = "https://evs.nci.nih.gov/ftp1/NCI_Thesaurus/ThesaurusTermsofUse.pdf"),
    s("oncokb", "oncokb", displayName = "OncoKB", sort = 99999,
      url = "https://oncokb.org", usage = "https://oncokb.org/terms"),
    s("oncotree", "oncotree", displayName = "OncoTree", sort = 0,
      url = "http://oncotree.mskcc.org"),
    s("profyle", "profyle", displayName = "PROFYLE", sort = 99999,
      url = "https://www.profyle.ca/"),
    s("pubmed", "pubmed", displayName = "PubMed",
      url = "https://pubmed.ncbi.nlm.nih.gov",
      usage = "https://www.ncbi.nlm.nih.gov/home/about/policies"),
    s("refseq", "refseq", displayName = "RefSeq",
      longName = "RefSeq: NCBI Reference Sequence Database",
      url = "https://www.ncbi.nlm.nih.gov/refseq",
      usage = "https://www.ncbi.nlm.nih.gov/home/about/policies"),
    s("sequenceOntology", "sequence ontology",
      url = "http://www.sequenceontology.org",
      usage = "http://www.sequenceontology.org/?page_id=269"),
    s("tso500", "tso500", displayName = "TSO500",
      longName = "TruSight Oncology 500", sort = 99999,
      url = "https://www.illumina.com",
      usage = "https://www.illumina.com/products/by-type/clinical-research-products/trusight-oncology-500.html"),
    s("uberon", "uberon", displayName = "Uberon", url = "http://uberon.github.io",
      usage = "http://obofoundry.github.io/principles/fp-001-open.html"),
    s("vario", "vario", url = "http://variationontology.org",
      usage = "http://variationontology.org/citing.shtml"),
    s("vicc", "Variant Interpretation for Cancer Consortium",
      displayName = "VICC", url = "https://cancervariants.org"))

  def toDF(spark: SparkSession): DataFrame = {
    import spark.implicits._
    all.toDF()
  }

  /** all_sources/index.js uploadFile: upsert every definition (K7). */
  def load(spark: SparkSession, store: PersistentGraphStore): Map[String, Long] =
    store.upsertSource(toDF(spark))
}
