package graft.variant

/** Notation corpus for the `f1_hgvs_parse` correctness query — one case per
  * grammar branch of [[HgvsParser]], reconstructed from the reference's
  * call-site notations (`src/civic/variant.js:244-248` SUBS table,
  * `src/docm/index.js:33-90`, `src/moa/index.js:19-45`,
  * `src/cancerhotspots/index.js:87-104`).
  *
  * The expected-output oracle is frozen as literal VALUES SQL in
  * `SparkEntry.oracleSql("f1_hgvs_parse")`, so a parser regression fails the
  * driver's DuckDB compare (not just the unit suite).
  */
object F1Corpus {
  val notations: Seq[String] = Seq(
    "KRAS:p.G12D",
    "p.v600e",
    "p.G12*",
    "p.*807Gext*101",
    "EGFR:c.2573T>G",
    "c.100+2spl",
    "c.100-2del",
    "c.100_102delTTT",
    "c.100_101insAAG",
    "c.1_2ins5",
    "p.E746_T751delinsI",
    "p.K558delKinsNP",
    "p.S193_C196dupSTSC",
    "p.G12fs",
    "p.G12Vfs*3",
    "p.(G12_G13)mut",
    "p.?755_?759del",
    "y.p26.3_p25.3del",
    "y.q22copygain",
    "e.19del",
    "e.19mut",
    "i.4spl",
    "g.1234567A>T",
    "g.123456_123457dup",
    "g.109_110delAAinsTG",
    "n.54del",
    "r.100_101insAU",
    "(EML4,ALK):fusion(e.6,e.20)",
    "trans(g.100,g.200)",
    "(BCR,ABL1):fusion(e.13,e.3)TT",
    "KRAS:p.G12")
}
