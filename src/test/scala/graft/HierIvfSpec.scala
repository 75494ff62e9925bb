package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The two-level hierarchical coarse quantizer (sim_hier_assign /
  * sim_knn_graph_hier, `Similarity.hierCellRanks` over CellTopK +
  * GroupCellTopK):
  *
  *  - BIT-EXACTNESS on a corpus wide enough that the adaptive split is
  *    live (m ≥ 1): the map-only two-expression projection must emit
  *    exactly the rows of the join+window plan it replaces — same cells,
  *    same raw doubles (bit-compared), same ranks — because that plan IS
  *    the DuckDB oracle's shape;
  *  - m = 0 DEGENERACY on the real table: with no sub-splitting every
  *    group holds exactly one cell, so the hierarchical graph must equal
  *    sim_knn_graph row-for-row — any drift is a bug in the descent, not
  *    a recall trade;
  *  - GroupCellTopK edge semantics: duplicate probe ids cannot enter a
  *    cell twice, unknown probe ids contribute nothing, and probing all
  *    groups reproduces the flat CellTopK ranking;
  *  - recall@3 vs exhaustive truth, measured honestly on the isotropic
  *    (ANN-hostile) synthetic corpus next to the flat ranking's number.
  */
class HierIvfSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import graft.functions.{CellTopK, GroupCellTopK}
  import org.apache.spark.sql.GraftShim.{column, expression}

  /** Deterministic isotropic corpus, N = 2000 > KnnSubCellThreshold so
    * the adaptive split bits are live (m = 1, 20 sub-cells / 10 labels).
    */
  private lazy val synthDir: String = {
    val dir = graft.TempDirs.create("graft_hier_emb")
    val r = new java.util.Random(20260816L + SparkTestBase.stressSeed)
    val rows = (0L until 2000L).map { id =>
      val v = Array.fill(64)(r.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      (id, v.map(x => (x / n).toFloat), (id % 10).toInt)
    }
    import spark.implicits._
    rows.toDF("vec_id", "embedding", "label")
      .repartition(4)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  private def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    graft.functions.Vectors.arrDot(a, b)

  /** The join+window plan hierCellRanks replaces — the oracle's shape:
    * level-1 rank over a cross join with the group-centroid table, then a
    * group-filtered cross join with the cell table ranked per vector.
    * Same association `(e·e − 2·e·c) + c·c`, same `round(+1e-9, 6)`
    * ordering, same id tie-breaks.
    */
  private def refHierRanks(v: DataFrame, supCent: DataFrame,
      cent: DataFrame, m: Int, sprobe: Int, p: Int): DataFrame = {
    val sup = supCent.select(col("cell").cast("long").as("sup"),
      col("centroid").as("sc"))
    val sw = Window.partitionBy(col("vec_id"))
      .orderBy(round(col("d2s") + lit(1e-9), 6), col("sup"))
    val sprobes = v.crossJoin(broadcast(sup))
      .withColumn("d2s",
        dot(col("e"), col("e")) - lit(2) * dot(col("e"), col("sc"))
          + dot(col("sc"), col("sc")))
      .withColumn("srk", row_number().over(sw))
      .filter(col("srk") <= sprobe)
      .select(col("vec_id"), col("sup"))
    val cw = Window.partitionBy(col("vec_id"))
      .orderBy(round(col("d2_raw") + lit(1e-9), 6), col("cell"))
    v.crossJoin(broadcast(cent.select(col("cell").cast("long").as("cell"),
        col("centroid"))))
      .withColumn("d2_raw",
        dot(col("e"), col("e")) - lit(2) * dot(col("e"), col("centroid"))
          + dot(col("centroid"), col("centroid")))
      .join(sprobes, Seq("vec_id"))
      .filter(shiftright(col("cell"), m) === col("sup"))
      .select(col("vec_id"), col("cell"), col("d2_raw"))
      .distinct() // a cell's group is unique, but two probes of the same
                  // sup (impossible by rk) would dup — keep the ref honest
      .withColumn("rk", row_number().over(cw))
      .filter(col("rk") <= p)
  }

  private def keyed(df: DataFrame): Set[(Long, Long, Long, Int)] =
    df.select(col("vec_id").cast("long"), col("cell").cast("long"),
        col("d2_raw"), col("rk").cast("int"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        java.lang.Double.doubleToLongBits(r.getDouble(2)), r.getInt(3)))
      .toSet

  test("hierCellRanks is bit-exact vs the join+window oracle shape (m >= 1)") {
    val v = Similarity.vecs(spark, synthDir).localCheckpoint()
    assert(v.count() == 2000)
    val m = 1 // (2000 - 1) div 1280 = 1 → floor(log2(1)) + 1
    val cent = Similarity.knnCentroids(v).localCheckpoint()
    val sup = Similarity.centroidsOver(v, "label").localCheckpoint()
    assert(cent.count() == 20 && sup.count() == 10,
      "synthetic corpus did not produce the expected 20-cell/10-group split")
    for ((sprobe, p) <- Seq((1, 1), (2, 2), (2, 4))) {
      val fast = keyed(Similarity.hierCellRanks(v, sup, cent,
        c => c >> m, sprobe, p))
      val ref = keyed(refHierRanks(v, sup, cent, m, sprobe, p))
      assert(fast == ref,
        s"sprobe=$sprobe p=$p: ${(fast -- ref).size} extra, " +
          s"${(ref -- fast).size} missing of ${ref.size}")
    }
  }

  test("m = 0 degeneracy: hierarchical graph equals sim_knn_graph exactly") {
    // sf0.01 has 500 vectors ≤ the 1280 threshold → m = 0: every group is
    // its own single cell, so level-1 ranking IS the flat ranking and the
    // two graphs must agree row-for-row (same rounding, same tie-breaks).
    val dir = "/root/testdata/sf0.01"
    val flat = Similarity.knnGraphTopk(spark, dir, nprobe = 2)
      .collect().map(_.toSeq).toSet
    val hier = Similarity.knnGraphHierTopk(spark, dir, sprobe = 2, nprobe = 2)
      .collect().map(_.toSeq).toSet
    assert(hier == flat,
      s"m=0 degeneracy broken: ${(hier -- flat).size} extra, " +
        s"${(flat -- hier).size} missing of ${flat.size}")
  }

  test("GroupCellTopK: duplicate probes dedup, unknown groups skip, " +
      "all-groups probe equals flat CellTopK") {
    import spark.implicits._
    // 4 cells in 2 groups (ids 10, 20; ranges [0,2) and [2,4)), d = 2.
    val cells = Array(100L, 101L, 200L, 201L)
    val flat = Array(1.0, 0.0, 0.0, 1.0, -1.0, 0.0, 0.0, -1.0)
    val groupIds = Array(10L, 20L)
    val groupOff = Array(0, 2, 4)
    def run(probes: Seq[Long]): Seq[(Long, Double)] = {
      val df = Seq((Seq(0.9, 0.1), probes)).toDF("e", "gs")
      val c = column(GroupCellTopK(expression(col("e")), expression(col("gs")),
        cells, flat, 2, 4, groupIds, groupOff))
      df.select(explode(c).as("t")).select("t.cell", "t.d2_raw")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    }
    val dup = run(Seq(10L, 10L))
    assert(dup.map(_._1) == Seq(100L, 101L),
      s"duplicate probe corrupted the ranking: $dup")
    assert(run(Seq(99L)).isEmpty, "unknown group id produced candidates")
    val all = run(Seq(20L, 10L))
    val flatRef = {
      val df = Seq(Tuple1(Seq(0.9, 0.1))).toDF("e")
      val c = column(CellTopK(expression(col("e")), cells, flat, 2, 4))
      df.select(explode(c).as("t")).select("t.cell", "t.d2_raw")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    }
    assert(all == flatRef, s"all-groups probe != flat ranking: $all vs $flatRef")
  }

  test("recall@3 vs exhaustive truth on the live-split corpus, next to flat") {
    def l2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val vecs = spark.read.parquet(s"$synthDir/embeddings.parquet")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) e")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val truth: Map[Long, Set[Long]] = vecs.keys.map { q =>
      q -> vecs.keys.filter(_ != q).toSeq
        .sortBy(n => (l2(vecs(q), vecs(n)), n)).take(3).toSet
    }.toMap
    def recall(df: DataFrame): Double = {
      val byQ = df.select("qid", "nid").collect().groupBy(_.getLong(0))
      truth.map { case (q, t) =>
        byQ.getOrElse(q, Array.empty).map(_.getLong(1)).toSet
          .intersect(t).size
      }.sum.toDouble / (3 * truth.size)
    }
    val rFlat = recall(Similarity.knnGraphTopk(spark, synthDir, nprobe = 2))
    val rHier = recall(
      Similarity.knnGraphHierTopk(spark, synthDir, sprobe = 2, nprobe = 2))
    info(f"kNN-graph recall@3 at m=1: flat $rFlat%.3f, hier $rHier%.3f")
    // Committed floor on the ANN-hostile isotropic corpus — the
    // hierarchical descent trades recall for the k1 + sprobe·k/k1 scan;
    // clustered production data sits far higher on both.
    assert(rHier >= 0.2, f"hier recall $rHier%.3f below the committed floor")
  }
}
