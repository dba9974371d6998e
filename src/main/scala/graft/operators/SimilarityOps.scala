package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Similarity search over the embeddings table (Array[Float], 64-dim).
  *
  * Vector math is pure column expressions (zip_with + aggregate over
  * doubles — codegen'd, deterministic left-to-right accumulation so the
  * DuckDB oracle can reproduce it bit-for-bit).
  *
  * Scale path: brute-force top-k is the exactness baseline (fine when the
  * query set is small — it broadcasts); the LSH variant buckets vectors by
  * random-hyperplane signature so candidate generation is an equi-join on
  * 16-bit keys, not a cross join.
  */
object SimilarityOps {

  /** Element-wise double cast. */
  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Sequential-order dot product of two double arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** L2 norms — sanity primitive. */
  def norms(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "embeddings")
      .withColumn("v", asDouble(col("embedding")))
      .select(col("vec_id"), l2norm(col("v")).as("norm"))
      .orderBy("vec_id")

  /** Cosine similarity between consecutive vectors — deterministic pair
    * set exercising the full vector kernel against the oracle. */
  def pairCosine(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "embeddings").withColumn("v", asDouble(col("embedding")))
    val a = e.select(col("vec_id").as("id_a"), col("v").as("va"))
    val b = e.select(col("vec_id").as("id_b"), col("v").as("vb"))
    a.join(b, col("id_b") === col("id_a") + 1)
      .select(col("id_a"), col("id_b"), cosine(col("va"), col("vb")).as("cos"))
      .orderBy("id_a")
  }

  /** Brute-force cosine top-k (k=5) for query vectors vec_id < 20 —
    * the exact ANN baseline. Queries broadcast against the corpus scan;
    * ranking is per-query top-k (TakeOrdered shape), not a global sort. */
  def annBruteForce(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables(spark, dir, "embeddings").withColumn("v", asDouble(col("embedding")))
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val scored = e.select(col("vec_id").as("neighbor_id"), col("v").as("nv"))
      .join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("qv"), col("nv")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select("query_id", "rank", "neighbor_id", "cos")
      .orderBy("query_id", "rank")
  }

  /** Random-hyperplane LSH: 16-bit signature from seeded deterministic
    * hyperplanes; neighbor candidates share the signature bucket. Returns
    * per-bucket stats (the candidate-generation contract). */
  def annLshBuckets(spark: SparkSession, dir: String): DataFrame = {
    val planes: Array[Array[Double]] = {
      val rnd = new scala.util.Random(42)
      Array.fill(16, 64)(rnd.nextGaussian())
    }
    val planesLit = typedLit(planes.map(_.toSeq).toSeq)
    Tables(spark, dir, "embeddings")
      .withColumn("v", asDouble(col("embedding")))
      .withColumn("planes", planesLit)
      .withColumn("sig",
        aggregate(
          transform(col("planes"), p => when(dot(p, col("v")) > 0, lit(1L)).otherwise(lit(0L))),
          lit(0L), (acc, bit) => acc * 2 + bit))
      .groupBy("sig")
      .agg(count(lit(1)).as("n_vectors"), min(col("vec_id")).as("min_vec_id"))
      .orderBy("sig")
  }
}
