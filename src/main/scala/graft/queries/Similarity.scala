package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (64-dim float vectors):
  * brute-force cosine top-k as the correctness baseline, an IVF-style
  * partition-probed variant as the scale path, embedding-cosine near-dup
  * pairs, and a pair-distance histogram.
  *
  * Vector math is the native codegen `graft.functions.ArrayDot` loop over
  * double-cast arrays — an ascending-index IEEE fold, bit-identical to
  * DuckDB's `list_dot_product` (and ~20× faster than the interpreted
  * `aggregate(zip_with(...))` formulation it replaced), so cosines compare
  * exactly across engines (outputs are still epsilon-rounded; ranks order
  * by the rounded cosine with id tie-breaks).
  *
  * Scale shape: brute force is O(Q×N) — fine for a query batch against a
  * broadcast candidate set, wrong for N×N. The IVF variant joins only
  * within a coarse cell (here the `label` column standing in for a k-means
  * assignment), turning the product into per-bucket blocks — the same
  * partition-pruning contract a real IVF index gives at 100 TB.
  */
object Similarity {
  import Tables.t
  import Det.r4e

  /** Embeddings with doubles + precomputed norm. */
  private def vecs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("e"))
      .withColumn("nrm", graft.functions.Vectors.arrNorm(col("e")))

  private val VecsSql = """
    SELECT vec_id, label, embedding::DOUBLE[] AS e,
           sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
    FROM embeddings"""

  private def dot(a: Column, b: Column): Column =
    graft.functions.Vectors.arrDot(a, b)

  val topkBrute = Q(
    "sim_topk_bruteforce",
    "Brute-force cosine top-5 for a 20-query batch against all candidates. " +
      "The query side is tiny → broadcast; candidates stream once. Rank by " +
      "rounded cosine + id tie-break; ties can't reorder across engines.",
    Some(s"""
      WITH n AS ($VecsSql),
           scored AS (
             SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                    list_dot_product(q.e, c.e) / (q.nrm * c.nrm) AS cos_raw
             FROM n q JOIN n c ON q.vec_id < 20 AND c.vec_id <> q.vec_id)
      SELECT query_id, neighbor_id, rank,
             round(cos_raw + 1e-8, 4) AS cosine
      FROM (SELECT *, row_number() OVER (
              PARTITION BY query_id
              ORDER BY round(cos_raw + 1e-9, 6) DESC, neighbor_id) AS rank
            FROM scored)
      WHERE rank <= 5""".stripMargin),
    (spark, dir) => {
      val v = vecs(spark, dir)
      val q = v.filter(col("vec_id") < 20)
        .select(col("vec_id").as("query_id"), col("e").as("qe"),
          col("nrm").as("qn"))
      val c = v.select(col("vec_id").as("neighbor_id"), col("e").as("ce"),
        col("nrm").as("cn"))
      val scored = broadcast(q)
        .join(c, col("neighbor_id") =!= col("query_id"))
        .withColumn("cos_raw", dot(col("qe"), col("ce")) / (col("qn") * col("cn")))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(round(col("cos_raw") + lit(1e-9), 6).desc, col("neighbor_id"))
      scored.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("neighbor_id"), col("rank"),
          r4e(col("cos_raw")).as("cosine"))
    })

  val topkIvf = Q(
    "sim_topk_ivf",
    "IVF-style probed top-5: candidates restricted to the query's coarse " +
      "cell (label = the quantizer assignment), so the join is equi on the " +
      "cell key — a hash join over buckets instead of a cross product. " +
      "This is the plan shape that survives 100 TB: per-cell blocks, " +
      "partition-prunable.",
    Some(s"""
      WITH n AS ($VecsSql),
           scored AS (
             SELECT q.vec_id AS query_id, q.label AS label,
                    c.vec_id AS neighbor_id,
                    list_dot_product(q.e, c.e) / (q.nrm * c.nrm) AS cos_raw
             FROM n q JOIN n c ON q.label = c.label AND c.vec_id <> q.vec_id
             WHERE q.vec_id < 20)
      SELECT query_id, label, neighbor_id, rank,
             round(cos_raw + 1e-8, 4) AS cosine
      FROM (SELECT *, row_number() OVER (
              PARTITION BY query_id
              ORDER BY round(cos_raw + 1e-9, 6) DESC, neighbor_id) AS rank
            FROM scored)
      WHERE rank <= 5""".stripMargin),
    (spark, dir) => {
      val v = vecs(spark, dir)
      val q = v.filter(col("vec_id") < 20)
        .select(col("vec_id").as("query_id"), col("label"),
          col("e").as("qe"), col("nrm").as("qn"))
      val c = v.select(col("vec_id").as("neighbor_id"),
        col("label").as("clabel"), col("e").as("ce"), col("nrm").as("cn"))
      val scored = broadcast(q)
        .join(c, col("label") === col("clabel") &&
          col("neighbor_id") =!= col("query_id"))
        .withColumn("cos_raw", dot(col("qe"), col("ce")) / (col("qn") * col("cn")))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(round(col("cos_raw") + lit(1e-9), 6).desc, col("neighbor_id"))
      scored.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("label"), col("neighbor_id"), col("rank"),
          r4e(col("cos_raw")).as("cosine"))
    })

  val nearDup = Q(
    "dedup_embedding_cosine",
    "Embedding near-dup pairs: all pairs with cosine ≥ 0.45. At this " +
      "dataset the full product is the honest baseline; the scale path is " +
      "the IVF/LSH bucketing above (bounded blocks instead of N²).",
    Some(s"""
      WITH n AS ($VecsSql)
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             round(list_dot_product(a.e, b.e) / (a.nrm * b.nrm) + 1e-8, 4)
               AS cosine
      FROM n a JOIN n b ON a.vec_id < b.vec_id
      WHERE list_dot_product(a.e, b.e) / (a.nrm * b.nrm) >= 0.45""".stripMargin),
    (spark, dir) => {
      val v = vecs(spark, dir)
      val a = v.select(col("vec_id").as("vec_a"), col("e").as("ae"),
        col("nrm").as("an"))
      val b = v.select(col("vec_id").as("vec_b"), col("e").as("be"),
        col("nrm").as("bn"))
      val cosRaw = dot(col("ae"), col("be")) / (col("an") * col("bn"))
      a.join(b, col("vec_a") < col("vec_b"))
        .withColumn("cos_raw", cosRaw)
        .filter(col("cos_raw") >= 0.45)
        .select(col("vec_a"), col("vec_b"), r4e(col("cos_raw")).as("cosine"))
    })

  val histogram = Q(
    "sim_cosine_histogram",
    "Pairwise cosine distribution in 0.1 buckets — the similarity-space " +
      "summary used to pick dedup thresholds. Bucket on the epsilon-shifted " +
      "product (floor boundaries).",
    Some(s"""
      WITH n AS ($VecsSql)
      SELECT floor((list_dot_product(a.e, b.e) / (a.nrm * b.nrm) + 1e-9) * 10)::BIGINT
               AS bucket,
             count(*) AS n_pairs
      FROM n a JOIN n b ON a.vec_id < b.vec_id
      GROUP BY bucket""".stripMargin),
    (spark, dir) => {
      val v = vecs(spark, dir)
      val a = v.select(col("vec_id").as("vec_a"), col("e").as("ae"),
        col("nrm").as("an"))
      val b = v.select(col("vec_id").as("vec_b"), col("e").as("be"),
        col("nrm").as("bn"))
      val cosRaw = dot(col("ae"), col("be")) / (col("an") * col("bn"))
      a.join(b, col("vec_a") < col("vec_b"))
        .select(floor((cosRaw + lit(1e-9)) * 10).cast("long").as("bucket"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_pairs"))
    })

  val labelCentroid = Q(
    "sim_label_centroid",
    "Per-cell centroids (mean pooling per dimension) — the IVF training " +
      "step and the embedding-aggregation primitive. posexplode + " +
      "(label, dim) aggregation: one shuffle, dims stay distributed (no " +
      "collect of vectors).",
    Some("""
      SELECT label, i::BIGINT AS pos,
             round(avg(embedding[i + 1]::DOUBLE) + 1e-9, 6) AS c,
             count(*) AS n
      FROM (SELECT label, embedding,
                   unnest(range(0, len(embedding))) AS i
            FROM embeddings)
      GROUP BY label, pos""".stripMargin),
    (spark, dir) =>
      t(spark, dir, "embeddings")
        .select(col("label"),
          posexplode(transform(col("embedding"), x => x.cast("double"))))
        .groupBy(col("label"), col("pos").cast("long").as("pos"))
        .agg(round(avg(col("col")) + lit(1e-9), 6).as("c"),
          count(lit(1)).as("n")))

  val all: Seq[Q] = Seq(topkBrute, topkIvf, nearDup, histogram, labelCentroid)
}
