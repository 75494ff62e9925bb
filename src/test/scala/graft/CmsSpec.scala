package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Count-Min-Sketch invariants, independent of the DuckDB oracle:
  * the estimate is ONE-SIDED (est ≥ exact always — a CMS never
  * undercounts) and within the ε·N additive bound (width 1024, depth 4:
  * with N total tokens, P[err > e·N/1024] ≤ (1/e)^4 per query — on this
  * corpus the top-word estimates should be exact or near-exact).
  */
class CmsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  for (sf <- Seq("0.001", "0.01")) {
    test(s"CMS estimates are one-sided and within the additive bound at sf$sf") {
      val dir = s"/root/testdata/sf$sf"
      val rows = CorpusOps.cmsTopk.run(spark, dir)
        .select("word", "exact_cnt", "est_cnt").collect()
      assert(rows.length == 10)
      val totalTokens = spark.read.parquet(s"$dir/documents.parquet")
        .selectExpr("sum(size(filter(split(text, ' '), x -> x != '')))")
        .collect().head.getLong(0)
      rows.foreach { r =>
        val (exact, est) = (r.getLong(1), r.getLong(2))
        assert(est >= exact, s"${r.getString(0)}: CMS undercounted $est < $exact")
        // 3·N/width: far looser than the expected error, tight enough to
        // catch a broken hash or a mis-keyed sketch join.
        assert(est - exact <= 3 * totalTokens / 1024,
          s"${r.getString(0)}: error ${est - exact} above bound")
      }
    }
  }
}
