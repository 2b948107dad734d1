package graft.variant

/** X1 — CIViC molecular-profile boolean expression → DNF condition sets
  * (reference `MolecularProfile` src/civic/profile.js:19-255; jest corpus
  * test/civic/civic.profile.test.js).
  *
  * A profile's `parsedName` is a token stream of variant references and
  * operators (`AND`/`OR`/parens; `NOT` unsupported → error). Parsing expands
  * it into an array of condition-sets (disjunctive normal form): one GraphKB
  * statement per set. Variant names with an implicit or (`Q157P/R`) split
  * into one set per alternative (`_split`/`_disambiguate`).
  *
  * Pure driver-/executor-side function; in pipelines it runs inside
  * `flatMap` over evidence-item rows (one input row → N condition sets), so
  * it distributes with the data and adds no shuffle.
  */
object ProfileDnf {

  sealed trait Tok
  case class Vid(id: Long) extends Tok
  case class Op(text: String) extends Tok

  case class Variant(id: Long, name: String)

  case class NotSupported(msg: String) extends Exception(msg)

  /** Fixture convenience: `"1 AND (2 OR 3)"` → token stream. */
  def tokenize(expr: String): Seq[Tok] =
    expr.replace("(", " ( ").replace(")", " ) ").trim.split("\\s+").toSeq
      .filter(_.nonEmpty)
      .map {
        case t if t.forall(_.isDigit) => Vid(t.toLong)
        case t => Op(t)
      }

  /** profile.js `_compile`: fold one parsed part into the accumulated
    * conditions under the current operator.
    */
  private def compile(arr: Seq[Seq[Long]], op: String, part: Seq[Seq[Long]]): Seq[Seq[Long]] =
    op match {
      case "AND" => for (a <- arr; p <- part) yield a ++ p
      case "OR" => if (arr.headOption.exists(_.isEmpty)) part else arr ++ part
      case _ => arr
    }

  /** profile.js `_parse`: token block → DNF id sets. Default operator OR. */
  def parse(block: Seq[Tok]): Seq[Seq[Long]] = {
    if (block.exists { case Op("NOT") => true; case _ => false })
      throw NotSupported("NOT operator not supported")
    var conditions: Seq[Seq[Long]] = Seq(Seq.empty)
    var op = "OR"
    var i = 0
    while (i < block.length) {
      block(i) match {
        case Vid(id) =>
          conditions = compile(conditions, op, Seq(Seq(id)))
          i += 1
        case Op("(") =>
          var depth = 1
          var j = i + 1
          while (depth > 0) {
            block(j) match {
              case Op("(") => depth += 1
              case Op(")") => depth -= 1
              case _ => ()
            }
            j += 1
          }
          conditions = compile(conditions, op, parse(block.slice(i + 1, j - 1)))
          i = j
        case Op(o) if o == "AND" || o == "OR" =>
          op = o
          i += 1
        case _ => i += 1
      }
    }
    conditions
  }

  private val ImplicitOr = "(?i)^([a-z]\\d+)([a-z])/([a-z])$".r

  /** profile.js `_split`: `Q157P/R` → two alternative variants. */
  def split(v: Variant): Seq[Seq[Variant]] = v.name match {
    case ImplicitOr(prefix, t1, t2) =>
      Seq(Seq(v.copy(name = s"$prefix$t1")), Seq(v.copy(name = s"$prefix$t2")))
    case _ => Seq(Seq(v))
  }

  /** profile.js `_combine`: cross-product accumulate. */
  def combine(arr1: Seq[Seq[Variant]], arr2: Seq[Seq[Variant]]): Seq[Seq[Variant]] =
    if (arr1.headOption.exists(_.isEmpty)) arr2
    else if (arr2.headOption.exists(_.isEmpty)) arr1
    else for (e1 <- arr1; e2 <- arr2; v <- e2) yield e1 :+ v

  /** profile.js `_disambiguate`: split implicit-or names within every
    * condition set and recombine.
    */
  def disambiguate(conditions: Seq[Seq[Variant]]): Seq[Seq[Variant]] =
    conditions.flatMap { condition =>
      condition.map(split).foldLeft(Seq(Seq.empty[Variant]))(combine)
    }

  /** Full pipeline: expression tokens + variant names → DNF of named
    * variant sets (profile.js `process`).
    */
  def expand(block: Seq[Tok], names: Map[Long, String]): Seq[Seq[Variant]] = {
    val idSets = parse(block)
    val withNames = idSets.map(_.map(id =>
      Variant(id, names.getOrElse(id,
        throw new IllegalArgumentException(s"missing variant $id")))))
    disambiguate(withNames)
  }

  def expand(expr: String, names: Map[Long, String]): Seq[Seq[Variant]] =
    expand(tokenize(expr), names)
}
