package graft.variant

import org.scalatest.funsuite.AnyFunSuite
import HgvsParser._

/** Grammar cases reconstructed from the reference call sites:
  * civic/variant.js SUBS table + composed notations, docm/index.js:33-90,
  * moa/index.js:19-45, oncokb/index.js:131-193, cancerhotspots usage.
  */
class HgvsParserSpec extends AnyFunSuite {

  test("protein substitution with feature") {
    val v = parse("KRAS:p.G12D")
    assert(v.reference1.contains("KRAS"))
    assert(v.prefix.contains("p"))
    assert(v.vtype == "substitution")
    assert(v.break1Start.get.pos.contains(12L))
    assert(v.break1Start.get.refAA.contains("G"))
    assert(v.break1Repr.contains("p.G12"))
    assert(v.refSeq.contains("G"))
    assert(v.untemplatedSeq.contains("D"))
    assert(v.untemplatedSeqSize.contains(1))
    assert(!v.noFeatures)
  }

  test("lowercased civic-style input canonicalizes") {
    val v = parse("p.v600e")
    assert(v.break1Repr.contains("p.V600"))
    assert(v.untemplatedSeq.contains("E"))
    assert(v.noFeatures)
  }

  test("three-letter amino-acid codes canonicalize to one letter") {
    // dbSNP docsum spelling (snp.js:49-55 feeds NP_...:p.Gly12Asp into
    // the parser; the public parser's convert3to1 behavior)
    val v = parse("NP_004976.2:p.Gly12Asp")
    assert(v.reference1.contains("NP_004976.2"))
    assert(v.break1Start.get.refAA.contains("G"))
    assert(v.break1Repr.contains("p.G12"))
    assert(v.refSeq.contains("G") && v.untemplatedSeq.contains("D"))
    // lowercased civic-style input
    val l = parse("p.val600glu")
    assert(l.break1Repr.contains("p.V600") && l.untemplatedSeq.contains("E"))
    // Ter as position refAA and as alt
    val t = parse("p.Ter807Trp")
    assert(t.break1Start.get.refAA.contains("*") && t.untemplatedSeq.contains("W"))
    // unknown 3-letter code is rejected, and all-caps seq tails keep
    // their 1-letter reading (delVAL = V,A,L — no 3-letter decode)
    assert(parseOpt("p.Xyz12Asp").isEmpty)
    assert(parse("p.K23_V25delVAL").refSeq.contains("VAL"))
    // 3-letter code before `?` tokenizes like the position grammar
    // (protPos accepts `Gly?`; the break-token alternation must too,
    // or the token splits as 1-letter and misreads `Gly`)
    val q = parse("p.Gly?")
    assert(q.break1Start.get.refAA.contains("G"))
    assert(q.break1Start.get.pos.isEmpty)
  }

  test("nonsense and stop positions") {
    assert(parse("p.G12*").untemplatedSeq.contains("*"))
    val ext = parse("p.*807Gext*101")
    assert(ext.vtype == "extension")
    assert(ext.break1Start.get.refAA.contains("*"))
    assert(ext.break1Start.get.pos.contains(807L))
    assert(ext.untemplatedSeq.contains("G"))
    assert(ext.truncation.contains(101))
  }

  test("cds substitution, splice, offsets") {
    val v = parse("EGFR:c.2573T>G")
    assert(v.vtype == "substitution" && v.refSeq.contains("T") && v.untemplatedSeq.contains("G"))
    val s = parse("c.100+2spl")
    assert(s.vtype == "splice-site")
    assert(s.break1Start.get.offset.contains(2L))
    assert(s.break1Repr.contains("c.100+2"))
    val d = parse("c.100-2del")
    assert(d.vtype == "deletion" && d.break1Start.get.offset.contains(-2L))
  }

  test("ranged deletion / insertion / indel / duplication") {
    val del = parse("c.100_102delTTT")
    assert(del.vtype == "deletion" && del.refSeq.contains("TTT"))
    assert(del.break2Start.get.pos.contains(102L))
    assert(del.break2Repr.contains("c.102"))
    val ins = parse("c.100_101insAAG")
    assert(ins.vtype == "insertion" && ins.untemplatedSeq.contains("AAG") &&
      ins.untemplatedSeqSize.contains(3))
    val insN = parse("c.1_2ins5")
    assert(insN.untemplatedSeq.isEmpty && insN.untemplatedSeqSize.contains(5))
    val di = parse("p.E746_T751delinsI") // SUBS 'E746_T751>I'
    assert(di.vtype == "indel" && di.untemplatedSeq.contains("I"))
    val di2 = parse("p.K558delKinsNP")   // SUBS 'K558NP'
    assert(di2.refSeq.contains("K") && di2.untemplatedSeq.contains("NP"))
    val dup = parse("p.S193_C196dupSTSC")
    assert(dup.vtype == "duplication" && dup.refSeq.contains("STSC"))
  }

  test("frameshift with and without truncation") {
    val fs = parse("p.G12fs")
    assert(fs.vtype == "frameshift" && fs.truncation.isEmpty && fs.untemplatedSeq.isEmpty)
    val fs2 = parse("p.G12Vfs*3")
    assert(fs2.untemplatedSeq.contains("V") && fs2.truncation.contains(3))
    assertThrows[ParseException](parse("c.100fs"))
  }

  test("uncertain positions and ranges") {
    val m = parse("p.(G12_G13)mut") // SUBS 'G12/G13'
    assert(m.vtype == "mutation")
    assert(m.break1Start.get.pos.contains(12L) && m.break1End.get.pos.contains(13L))
    assert(m.break1Repr.contains("p.(G12_G13)"))
    val q = parse("p.?755_?759del") // SUBS 'del 755-759'
    assert(q.break1Start.get.refAA.contains("?") && q.break1Start.get.pos.contains(755L))
    assert(q.break2Start.get.pos.contains(759L))
    val i = parse("p.T1151_?1152insT") // SUBS 'T1151insT'
    assert(i.vtype == "insertion" && i.untemplatedSeq.contains("T"))
  }

  test("cytoband variants") {
    val v = parse("y.p26.3_p25.3del") // SUBS 'p26.3-25.3 11mb del'
    assert(v.vtype == "deletion")
    val b1 = v.break1Start.get
    assert(b1.arm.contains("p") && b1.majorBand.contains(26) && b1.minorBand.contains(3))
    assert(v.break1Repr.contains("y.p26.3") && v.break2Repr.contains("y.p25.3"))
    val g = parse("y.q22copygain")
    assert(g.vtype == "copy gain" && g.break1Start.get.arm.contains("q"))
  }

  test("exonic and intronic") {
    assert(parse("e.19del").vtype == "deletion")     // SUBS 'Ex19 del'
    assert(parse("e.19mut").vtype == "mutation")     // moa e.<n>mut
    assert(parse("e.4_5dup").vtype == "duplication")
    assert(parse("i.4spl").vtype == "splice-site")
  }

  test("genomic forms (moa composeGenomicHgvs shapes)") {
    val sub = parse("g.1234567A>T")
    assert(sub.vtype == "substitution" && sub.break1Start.get.posClass == "GenomicPosition")
    assert(parse("g.123456_123457dup").vtype == "duplication")
    assert(parse("g.109_110delAAinsTG").vtype == "indel")
  }

  test("multi-feature fusion / translocation") {
    val f = parse("(EML4,ALK):fusion(e.6,e.20)")
    assert(f.multiFeature && f.vtype == "fusion")
    assert(f.reference1.contains("EML4") && f.reference2.contains("ALK"))
    assert(f.break1Start.get.pos.contains(6L) && f.break2Start.get.pos.contains(20L))
    assert(f.break1Repr.contains("e.6") && f.break2Repr.contains("e.20"))
    val t = parse("trans(g.100,g.200)")
    assert(t.vtype == "translocation" && t.noFeatures)
    val fu = parse("(BCR,ABL1):fusion(e.13,e.3)TT")
    assert(fu.untemplatedSeq.contains("TT") && fu.untemplatedSeqSize.contains(2))
  }

  test("malformed inputs throw") {
    assertThrows[ParseException](parse(""))
    assertThrows[ParseException](parse("z.100del"))
    assertThrows[ParseException](parse("p.G12>T"))   // '>' invalid for protein
    assertThrows[ParseException](parse("c.100"))     // bare non-protein position
    assertThrows[ParseException](parse("GENE:"))
    assert(parseOpt("nonsense").isEmpty)
  }

  test("requireFeatures") {
    assertThrows[ParseException](parse("p.G12D", requireFeatures = true))
    assert(parseOpt("KRAS:p.G12D", requireFeatures = true).nonEmpty)
  }
}
