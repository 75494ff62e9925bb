package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench.headline is filtered against SparkEntry.queries before running —
  * a typo'd name would silently vanish from the benchmark instead of
  * failing. This pins every headline name to a declared query.
  */
class BenchHeadlineSpec extends AnyFunSuite {
  test("every bench headline name is a declared query") {
    val declared = SparkEntry.queries.keySet
    val missing = Bench.headline.filterNot(declared.contains)
    assert(missing.isEmpty, s"headline names not declared: $missing")
    val dupes = Bench.headline.groupBy(identity).filter(_._2.size > 1).keys
    assert(dupes.isEmpty, s"duplicate headline names: $dupes")
  }

  test("declared-query census matches the documented count") {
    // README/SURVEY cite these numbers; they drifted twice in round 6 as
    // queries landed. Pinning them here means adding a query without
    // updating the docs (or vice versa) fails the build instead of
    // silently disagreeing with the contract. Update BOTH on change.
    assert(SparkEntry.queries.size == 182,
      s"declared queries: ${SparkEntry.queries.size}, docs say 182")
    assert(SparkEntry.oracleSql.size == 181,
      s"oracled queries: ${SparkEntry.oracleSql.size}, docs say 181 " +
        "(q_approx_distinct_users is no_oracle by design)")
  }
}
