package graft.variant

/** F4 — DOCM notation fixes (reference `parseDocmVariant`
  * docm/index.js:33-67): `p.ABC123-` trailing-dash deletions and
  * multi-AA substitutions rewritten as delins with the common prefix
  * trimmed (X is excluded from alt sequences — DOCM uses it to mean
  * frameshift). Anything else passes through unchanged.
  */
object DocmFixes {

  private val TrailingDashDel = "^p\\.([A-Z]+)(\\d+)-$".r
  private val MultiAaSub = "^p\\.([A-Z][A-Z]+)(\\d+)([A-WYZ]+)$".r

  def fix(variant: String): String = variant match {
    case TrailingDashDel(seq, posStr) =>
      val pos = posStr.toInt
      if (seq.length == 1) s"p.$seq${pos}del$seq"
      else s"p.${seq.head}${pos}_${seq.last}${pos + seq.length - 1}del$seq"
    case MultiAaSub(refSeq0, posStr, altSeq0) =>
      val prefix = refSeq0.zip(altSeq0).takeWhile { case (a, b) => a == b }.length
      val pos = posStr.toInt + prefix
      val refSeq = refSeq0.drop(prefix)
      val altSeq = altSeq0.drop(prefix)
      if (refSeq.nonEmpty && altSeq.nonEmpty) {
        if (refSeq.length > 1)
          s"p.${refSeq.head}${pos}_${refSeq.last}${pos + refSeq.length - 1}del${refSeq}ins$altSeq"
        else s"p.${refSeq.head}${pos}del${refSeq}ins$altSeq"
      } else variant
    case _ => variant
  }
}
