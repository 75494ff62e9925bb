package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Convergence check of the distributed power-iteration round on PLANTED
  * anisotropic data (the shipped sim_power_iteration runs on isotropic
  * noise, where no dominant direction exists — its doc says so; this spec
  * proves the machinery finds one when it exists): vectors = s·d + noise
  * with a fixed unit direction d, alignment |cos(v_k, d)| must improve
  * monotonically over rounds and end near 1.
  */
class PowerIterationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("power iteration aligns with a planted dominant direction") {
    import spark.implicits._
    val dim = 8
    val rnd = new scala.util.Random(42)
    val dRaw = Array.fill(dim)(rnd.nextGaussian())
    val dNorm = math.sqrt(dRaw.map(x => x * x).sum)
    val d = dRaw.map(_ / dNorm)
    val rows = (0 until 300).map { i =>
      val scale = 3.0 * rnd.nextGaussian()
      (i.toLong, (0 until dim).map(j =>
        scale * d(j) + 0.5 * rnd.nextGaussian()).toArray)
    }
    val vecs = rows.toDF("vec_id", "e")
    val v0 = spark.range(dim)
      .select(col("id").cast("int").as("pos"),
        lit(1.0 / math.sqrt(dim)).as("v"))

    def align(v: org.apache.spark.sql.DataFrame): Double = {
      val comps = v.orderBy("pos").select("v").collect().map(_.getDouble(0))
      math.abs(comps.zip(d).map { case (a, b) => a * b }.sum)
    }

    var v = v0
    var prev = -1.0
    val aligns = (1 to 4).map { _ =>
      v = Similarity.powerIterate(vecs, v)
      align(v)
    }
    // Strictly improving and convergent: each round is at least as aligned
    // (tolerance for the 6-decimal per-round rounding), final ≈ 1.
    aligns.sliding(2).foreach {
      case Seq(a, b) => assert(b >= a - 1e-4, s"alignment regressed: $aligns")
      case _ =>
    }
    assert(aligns.last > 0.97, s"did not converge to the planted axis: $aligns")
  }
}
