package graft

import org.scalatest.funsuite.AnyFunSuite

/** Meta-guards over the query/oracle/bench registries: `Bench` silently
  * filters its headline list through `queries.contains`, so a typo'd
  * name would just vanish from the bench — and a `queries` entry
  * without an `oracleSql` twin only gets the driver's weaker rows-only
  * check. Pin both wirings so drift fails a spec instead of silently
  * weakening a gate.
  */
class BenchConsistencySpec extends AnyFunSuite {

  test("every bench headline name is a real query") {
    val missing = Bench.headline.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"headline names with no query: $missing")
  }

  test("headline names are unique") {
    val dups = Bench.headline.groupBy(identity).collect {
      case (n, occ) if occ.size > 1 => n
    }
    assert(dups.isEmpty, s"duplicated headline names: $dups")
  }

  test("every query has an oracle, and no oracle is orphaned") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle SQL: ${q -- o}")
    assert((o -- q).isEmpty, s"oracles without a query: ${o -- q}")
  }

  test("every query is timed: headline, loader bucket, or fixture bucket") {
    // Bench buckets everything not in headline; this just pins that the
    // partition rule (gN prefix = loader) covers what we think it does
    val rest = SparkEntry.queries.keySet -- Bench.headline.toSet
    val (loaders, fixtures) = rest.partition(_.matches("^g\\d+_.*"))
    assert(loaders.nonEmpty && fixtures.nonEmpty)
    assert(rest.size + Bench.headline.size == SparkEntry.queries.size)
  }
}
