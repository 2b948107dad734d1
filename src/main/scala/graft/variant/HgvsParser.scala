package graft.variant

import scala.util.matching.Regex

/** Parser for the HGVS-like variant-notation DSL the reference consumes via
  * `@bcgsc-pori/graphkb-parser` (`parseVariant`/`jsonifyVariant`).
  *
  * The grammar is reconstructed from the PUBLIC HGVS nomenclature standard
  * plus the reference's call sites and the notation strings that flow
  * through them: `src/civic/variant.js:244-248` (SUBS fix table + composed
  * notations like `p.(G12_G13)mut`, `y.p26.3_p25.3del`,
  * `T1151_?1152insT`), `src/docm/index.js:33-90`, `src/moa/index.js:19-45`
  * (`e.<n>mut`, composed `g.` notation), `src/cancerhotspots/index.js:87-104`,
  * `src/oncokb/index.js:131-193` and the upsert-key fields at
  * `src/graphkb.js:631-660` (break1Repr/break2Repr/refSeq/untemplatedSeq/
  * truncation/...).
  *
  * Case handling: the CIViC loader lowercases names before parsing
  * (`src/civic/variant.js:86`), so sequence/AA tokens are accepted in
  * either case and canonicalized to uppercase; prefixes, type keywords and
  * cytoband arms stay lowercase.
  *
  * Supported forms:
  *  - prefixes: g c p e i n r y (genomic, cds, protein, exon, intron,
  *    non-coding, rna, cytoband)
  *  - breakpoints: plain (`100`), offset (`100+2`, `100-2` for c/n/r),
  *    protein (`G12`, `?755`, `*807`), cytoband (`p26.3`), uncertain range
  *    (`(100_102)`)
  *  - two-breakpoint spans: `break1_break2`
  *  - variant tails: `A>T` substitution, protein substitution (`D`, `*`),
  *    `del[seq|count]`, `ins[seq|count]`, `del[seq]ins[seq|count]` (indel),
  *    `dup[seq]`, `[seq]fs[*truncation]`, `[seq]ext[*pos]`, `spl`, `mut`,
  *    `copygain`, `copyloss`, `methyl`
  *  - multi-feature: `fusion(e.1,e.2)`, `trans(g.1,g.2)`, `itrans(...)`
  *    with optional untemplated seq/count suffix
  *  - leading feature(s): `GENE:p.G12D`, `(GENE1,GENE2):fusion(e.1,e.2)`
  */
object HgvsParser {

  /** A parsed breakpoint position (one of the per-prefix classes). */
  case class Pos(
      posClass: String,
      pos: Option[Long],          // None = uncertain '?'
      offset: Option[Long],       // cds/non-coding/rna +N/-N
      refAA: Option[String],      // protein reference amino acid ('?' kept)
      arm: Option[String],        // cytoband p/q
      majorBand: Option[Int],
      minorBand: Option[Int]) {

    def repr: String = posClass match {
      case "ProteinPosition" =>
        refAA.getOrElse("?") + pos.map(_.toString).getOrElse("?")
      case "CytobandPosition" =>
        arm.getOrElse("?") + majorBand.map(_.toString).getOrElse("?") +
          minorBand.map("." + _).getOrElse("")
      case "CdsPosition" | "NonCdsPosition" | "RnaPosition" =>
        pos.map(_.toString).getOrElse("?") +
          offset.map(o => if (o > 0) s"+$o" else o.toString).getOrElse("")
      case _ => pos.map(_.toString).getOrElse("?")
    }
  }

  /** jsonifyVariant-equivalent flat record (SURVEY F1; upsert-key fields of
    * graphkb.js:631-660).
    */
  case class ParsedVariant(
      reference1: Option[String],
      reference2: Option[String],
      prefix: Option[String],
      notationType: String,       // short token: > del ins delins dup fs ...
      vtype: String,              // long name: substitution, deletion, ...
      break1Start: Option[Pos],
      break1End: Option[Pos],
      break2Start: Option[Pos],
      break2End: Option[Pos],
      break1Repr: Option[String],
      break2Repr: Option[String],
      refSeq: Option[String],
      untemplatedSeq: Option[String],
      untemplatedSeqSize: Option[Int],
      truncation: Option[Int],
      multiFeature: Boolean,
      noFeatures: Boolean)

  case class ParseException(msg: String) extends Exception(msg)

  private val PREFIX_CLASS = Map(
    "g" -> "GenomicPosition", "c" -> "CdsPosition", "p" -> "ProteinPosition",
    "e" -> "ExonicPosition", "i" -> "IntronicPosition",
    "n" -> "NonCdsPosition", "r" -> "RnaPosition", "y" -> "CytobandPosition")

  private val TYPE_NAMES = Map(
    ">" -> "substitution", "del" -> "deletion", "ins" -> "insertion",
    "delins" -> "indel", "dup" -> "duplication", "fs" -> "frameshift",
    "ext" -> "extension", "spl" -> "splice-site", "mut" -> "mutation",
    "fusion" -> "fusion", "trans" -> "translocation",
    "itrans" -> "inverted translocation", "copygain" -> "copy gain",
    "copyloss" -> "copy loss", "methyl" -> "methylation")

  /** Three-letter → one-letter amino-acid codes (the public HGVS standard
    * spelling; the reference's parser converts them the same way — its
    * `convert3to1` util — which is how dbSNP docsum notations like
    * `NP_004976.2:p.Gly12Asp` flow through `src/entrez/snp.js:49-55`).
    * Accepted in protein POSITIONS (any case — the civic path lowercases)
    * and as the single-code substitution ALT; multi-code sequence fields
    * (delins/ins/dup tails) stay 1-letter — an all-letter tail like
    * `delVAL` already means the V,A,L sequence and a 3-letter reading
    * would be ambiguous.
    */
  private val AA3: Map[String, String] = Map(
    "ala" -> "A", "arg" -> "R", "asn" -> "N", "asp" -> "D", "cys" -> "C",
    "gln" -> "Q", "glu" -> "E", "gly" -> "G", "his" -> "H", "ile" -> "I",
    "leu" -> "L", "lys" -> "K", "met" -> "M", "phe" -> "F", "pro" -> "P",
    "ser" -> "S", "thr" -> "T", "trp" -> "W", "tyr" -> "Y", "val" -> "V",
    "ter" -> "*", "sec" -> "U")

  // per-prefix single-position patterns (anchored via Regex pattern match)
  private val protPos: Regex = """([A-Za-z]{3}|[A-Za-z?*])?(\d+|\?)""".r
  private val cytoPos: Regex = """([pq])(?:(\d+)(?:\.(\d+))?)?|\?""".r
  private val offsetPos: Regex = """(\d+|\?)([-+]\d+)?""".r
  private val plainPos: Regex = """(\d+|\?)""".r

  private def parsePos(prefix: String, s: String): Pos = {
    val cls = PREFIX_CLASS(prefix)
    prefix match {
      case "p" => s match {
        case protPos(aa, p) =>
          val refAA = Option(aa).map { a =>
            if (a.length == 3)
              AA3.getOrElse(a.toLowerCase,
                throw ParseException(s"unknown amino acid '$a'"))
            else a.toUpperCase
          }
          Pos(cls, if (p == "?") None else Some(p.toLong), None,
            refAA, None, None, None)
        case _ => throw ParseException(s"bad protein position '$s'")
      }
      case "y" => s match {
        case cytoPos(arm, maj, min) =>
          Pos(cls, None, None, None, Option(arm),
            Option(maj).map(_.toInt), Option(min).map(_.toInt))
        case _ => throw ParseException(s"bad cytoband position '$s'")
      }
      case "c" | "n" | "r" => s match {
        case offsetPos(p, off) =>
          Pos(cls, if (p == "?") None else Some(p.toLong),
            Option(off).map(_.toLong), None, None, None, None)
        case _ => throw ParseException(s"bad $prefix position '$s'")
      }
      case _ => s match {
        case plainPos(p) =>
          Pos(cls, if (p == "?") None else Some(p.toLong), None, None, None, None, None)
        case _ => throw ParseException(s"bad $prefix position '$s'")
      }
    }
  }

  /** One breakpoint: `pos` or uncertain `(pos_pos)`. Returns
    * (start, endOpt, repr-without-prefix).
    */
  private def parseBreak(prefix: String, s: String): (Pos, Option[Pos], String) =
    if (s.startsWith("(") && s.endsWith(")")) {
      val inner = s.substring(1, s.length - 1)
      val parts = inner.split("_", 2)
      if (parts.length != 2) throw ParseException(s"bad uncertain breakpoint '$s'")
      val a = parsePos(prefix, parts(0))
      val b = parsePos(prefix, parts(1))
      (a, Some(b), s"(${a.repr}_${b.repr})")
    } else {
      val p = parsePos(prefix, s)
      (p, None, p.repr)
    }

  // prefix-aware breakpoint token (cytoband `p26.3` and protein `P26`
  // would collide in a prefix-agnostic alternation)
  private val breakTokByPrefix: Map[String, String] = {
    val paren = """\((?:[^()_]+)_(?:[^()_]+)\)"""
    Map(
      // 3-letter codes accepted before BOTH a digit and `?`, matching
      // protPos (which allows `Gly?`) — without the `{3}\?` branch a
      // notation like `p.Gly?` fell to the 1-letter alternative and
      // tokenized `Gly` inconsistently with the position grammar
      "p" -> s"""$paren|[A-Za-z]{3}\\d+|[A-Za-z]{3}\\?|[A-Za-z?*]?\\d+|[A-Za-z?*]?\\?""",
      "y" -> s"""$paren|[pq](?:\\d+(?:\\.\\d+)?)?|\\?""",
      "c" -> s"""$paren|(?:\\d+|\\?)(?:[-+]\\d+)?""",
      "n" -> s"""$paren|(?:\\d+|\\?)(?:[-+]\\d+)?""",
      "r" -> s"""$paren|(?:\\d+|\\?)(?:[-+]\\d+)?""",
      "g" -> s"""$paren|\\d+|\\?""",
      "e" -> s"""$paren|\\d+|\\?""",
      "i" -> s"""$paren|\\d+|\\?""")
  }
  private val continuousReByPrefix: Map[String, Regex] =
    breakTokByPrefix.map { case (p, tok) => p -> s"""($tok)(?:_($tok))?(.*)""".r }

  private val delinsRe: Regex = """del([A-Za-z*]+|\d+)?ins([A-Za-z*]+|\d+)?""".r
  private val delRe: Regex = """del([A-Za-z*]+|\d+)?""".r
  private val insRe: Regex = """ins([A-Za-z*]+|\d+)?""".r
  private val dupRe: Regex = """dup([A-Za-z*]+|\d+)?""".r
  private val fsRe: Regex = """([A-Za-z*]*?)fs(?:\*(\d+|\?)?)?""".r
  private val extRe: Regex = """([A-Za-z*]*?)ext(?:\*?(\d+|\?)?)?""".r
  private val subRe: Regex = """([A-Za-z*]+)>([A-Za-z*]+)""".r
  private val protSubRe: Regex = """([A-Za-z*?]+)""".r

  private def seqFields(s: Option[String]): (Option[String], Option[Int]) =
    s match {
      case None => (None, None)
      case Some(v) if v.forall(_.isDigit) => (None, Some(v.toInt))
      case Some(v) => (Some(v.toUpperCase), Some(v.length))
    }

  /** Parse a full notation string. Throws ParseException on malformed
    * input — callers route failures to the error side-channel (P4/K10).
    */
  def parse(notation0: String, requireFeatures: Boolean = false): ParsedVariant = {
    val notation = Option(notation0).map(_.trim).getOrElse("")
    if (notation.isEmpty) throw ParseException("empty notation")

    // strip feature prefix: 'GENE:rest' or '(G1,G2):rest'
    val colonIdx = notation.indexOf(':')
    val (ref1, ref2, rest) =
      if (colonIdx > 0) {
        val feat = notation.substring(0, colonIdx)
        val r = notation.substring(colonIdx + 1)
        if (feat.startsWith("(") && feat.endsWith(")") && feat.contains(",")) {
          val Array(a, b) = feat.substring(1, feat.length - 1).split(",", 2)
          (Some(a.trim), Some(b.trim), r)
        } else (Some(feat.trim), None, r)
      } else (None, None, notation)
    if (requireFeatures && ref1.isEmpty)
      throw ParseException(s"feature required in '$notation'")
    val noFeatures = ref1.isEmpty

    // multi-feature: type(prefix.pos[_pos], prefix.pos[_pos])[seq|count]
    val multiRe = """(fusion|trans|itrans)\(([^,]+),\s*([^)]+)\)([A-Za-z*]+|\d+)?""".r
    rest match {
      case multiRe(tok, argA, argB, ut) =>
        def parseArg(a: String): (Pos, Option[Pos], String) = {
          val t = a.trim
          if (t.length < 3 || t.charAt(1) != '.')
            throw ParseException(s"bad multi-feature position '$a'")
          val pfx = t.substring(0, 1)
          if (!PREFIX_CLASS.contains(pfx)) throw ParseException(s"bad prefix '$pfx'")
          val parts = t.substring(2).split("_", 2)
          if (parts.length == 2) {
            val s = parsePos(pfx, parts(0)); val e = parsePos(pfx, parts(1))
            (s, Some(e), s"$pfx.(${s.repr}_${e.repr})")
          } else {
            val s = parsePos(pfx, parts(0))
            (s, None, s"$pfx.${s.repr}")
          }
        }
        val (b1s, b1e, r1) = parseArg(argA)
        val (b2s, b2e, r2) = parseArg(argB)
        val (utSeq, utSize) = seqFields(Option(ut))
        return ParsedVariant(ref1, ref2, None, tok, TYPE_NAMES(tok),
          Some(b1s), b1e, Some(b2s), b2e, Some(r1), Some(r2),
          None, utSeq, utSize, None, multiFeature = true, noFeatures = noFeatures)
      case _ => ()
    }

    // continuous: prefix.break1[_break2]tail
    if (rest.length < 3 || rest.charAt(1) != '.')
      throw ParseException(s"missing prefix in '$notation'")
    val prefix = rest.substring(0, 1)
    if (!PREFIX_CLASS.contains(prefix))
      throw ParseException(s"unknown prefix '$prefix'")
    val body = rest.substring(2)

    val continuousRe = continuousReByPrefix(prefix)
    val (b1s, b1e, b1r, b2s, b2e, b2r, tail) = body match {
      case continuousRe(brk1, brk2, t) =>
        val (s1, e1, r1) = parseBreak(prefix, brk1)
        if (brk2 != null) {
          val (s2, e2, r2) = parseBreak(prefix, brk2)
          (s1, e1, r1, Some(s2), e2, Some(r2), t)
        } else (s1, e1, r1, None, None, None, t)
      case _ => throw ParseException(s"unparseable body '$body'")
    }
    val b1Repr = s"$prefix.$b1r"
    val b2Repr = b2r.map(r => s"$prefix.$r")

    def base(tok: String, refSeq: Option[String] = None,
        utSeq: Option[String] = None, utSize: Option[Int] = None,
        trunc: Option[Int] = None): ParsedVariant =
      ParsedVariant(ref1, ref2, Some(prefix), tok, TYPE_NAMES(tok),
        Some(b1s), b1e, b2s, b2e, Some(b1Repr), b2Repr,
        refSeq, utSeq, utSize, trunc, multiFeature = false, noFeatures = noFeatures)

    tail match {
      case "" =>
        // bare position: allowed for protein/exon/cytoband as a
        // position-only "mutation" (the oncokb alt-name path probes
        // `p.<name>` validity this way, oncokb/index.js:131-140)
        if (prefix == "p" || prefix == "e" || prefix == "y") base("mut")
        else throw ParseException(s"missing variant type in '$notation'")
      case delinsRe(del, ins) =>
        val (utSeq, utSize) = seqFields(Option(ins))
        val refSeq = Option(del).filter(!_.forall(_.isDigit)).map(_.toUpperCase)
        base("delins", refSeq, utSeq, utSize)
      case delRe(seq) =>
        base("del",
          refSeq = Option(seq).filter(!_.forall(_.isDigit)).map(_.toUpperCase))
      case insRe(seq) =>
        val (utSeq, utSize) = seqFields(Option(seq))
        base("ins", utSeq = utSeq, utSize = utSize)
      case dupRe(seq) =>
        base("dup",
          refSeq = Option(seq).filter(!_.forall(_.isDigit)).map(_.toUpperCase))
      case fsRe(seq, tr) =>
        if (prefix != "p") throw ParseException("frameshift requires protein prefix")
        // fs anchors one breakpoint; an uncertain span is written
        // p.(A_B)fs (break1 range), never A_Bfs
        if (b2s.isDefined) throw ParseException("frameshift takes a single breakpoint")
        val (utSeq, utSize) = seqFields(Option(seq).filter(_.nonEmpty))
        base("fs", utSeq = utSeq, utSize = utSize,
          trunc = Option(tr).filter(_ != "?").map(_.toInt))
      case extRe(seq, tr) =>
        if (prefix != "p") throw ParseException("extension requires protein prefix")
        val (utSeq, utSize) = seqFields(Option(seq).filter(_.nonEmpty))
        base("ext", utSeq = utSeq, utSize = utSize,
          trunc = Option(tr).filter(_ != "?").map(_.toInt))
      case "spl" => base("spl")
      case "mut" => base("mut")
      case "copygain" => base("copygain")
      case "copyloss" => base("copyloss")
      case "methyl" => base("methyl")
      case subRe(r, u) =>
        if (prefix == "p") throw ParseException("'>' not valid for protein")
        base(">", refSeq = Some(r.toUpperCase),
          utSeq = Some(u.toUpperCase), utSize = Some(u.length))
      case protSubRe(u) if prefix == "p" && b2s.isEmpty &&
          (u.length == 1 || AA3.contains(u.toLowerCase)) =>
        // protein substitution: single alt AA after a single position
        // (G12D, G12*) — any single three-letter HGVS code is accepted
        // and canonicalized to one letter ('Ter' is the spelling cgl
        // rewrites '*' into, cgl/index.js:69-71; dbSNP docsums write
        // `p.Gly12Asp`, snp.js:49-55); multi-AA changes must use delins,
        // and ranged positions take no bare AA tail — otherwise junk
        // tails like `x100_a101splice` would "parse"
        val alt = if (u.length == 1) u.toUpperCase else AA3(u.toLowerCase)
        base(">", refSeq = b1s.refAA.filter(_ != "?"),
          utSeq = Some(alt), utSize = Some(alt.length))
      case other => throw ParseException(s"unparseable tail '$other' in '$notation'")
    }
  }

  def parseOpt(notation: String, requireFeatures: Boolean = false): Option[ParsedVariant] =
    try Some(parse(notation, requireFeatures)) catch { case _: Exception => None }

  /** Flat scalar projection of a parse — the shape the `f1_hgvs_parse`
    * query emits (one row per notation, nullable scalars only, so a
    * literal-VALUES oracle can assert it exactly).
    */
  case class Flat(
      notation: String,
      ref1: Option[String], ref2: Option[String], prefix: Option[String],
      vtype: String,
      b1s_pos: Option[Long], b1s_refaa: Option[String], b1s_off: Option[Long],
      b1s_arm: Option[String], b1s_major: Option[Int], b1s_minor: Option[Int],
      b1e_pos: Option[Long], b2s_pos: Option[Long], b2e_pos: Option[Long],
      b1_repr: Option[String], b2_repr: Option[String],
      ref_seq: Option[String], ut_seq: Option[String], ut_size: Option[Int],
      trunc: Option[Int], multi: Boolean)

  def flat(notation: String): Flat = {
    val v = parse(notation)
    Flat(notation, v.reference1, v.reference2, v.prefix, v.vtype,
      v.break1Start.flatMap(_.pos), v.break1Start.flatMap(_.refAA),
      v.break1Start.flatMap(_.offset), v.break1Start.flatMap(_.arm),
      v.break1Start.flatMap(_.majorBand), v.break1Start.flatMap(_.minorBand),
      v.break1End.flatMap(_.pos), v.break2Start.flatMap(_.pos),
      v.break2End.flatMap(_.pos), v.break1Repr, v.break2Repr,
      v.refSeq, v.untemplatedSeq, v.untemplatedSeqSize, v.truncation,
      v.multiFeature)
  }
}
