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
}
