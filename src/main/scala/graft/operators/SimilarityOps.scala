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
  private[graft] def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Sequential-order dot product of two double arrays — the native
    * codegen'd expression (graft.functions.DotProduct); same
    * left-to-right accumulation as the composable
    * aggregate(zip_with(...)) form, which Spark would evaluate
    * interpreted per element. */
  def dot(a: Column, b: Column): Column = graft.functions.DotProduct.dot(a, b)

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

  /** LSH-accelerated near-duplicate vector search — the ANN scale path.
    * Candidates = vectors sharing an 8-bit random-hyperplane signature in
    * any of 8 hash tables (an equi-join on (table, signature), never a
    * cross join); candidates are verified with exact cosine and pairs
    * >= 0.99 are emitted. Twins are planted (vec_id % 10 == 0, embedding
    * scaled x2 — cosine 1 and hyperplane signs invariant under positive
    * scaling), so recall is exactly 1.0 by construction and the output
    * matches the brute-force oracle deterministically.
    *
    * Scale shape (100 TB): signatures are computed once per vector in a
    * typed map; only (vec_id, table, sig) rows shuffle for candidate
    * generation; the fat vectors stay in the persisted stage and join back
    * only for the candidate set. Table count / bits per table tune the
    * recall-vs-candidate-volume tradeoff; at cluster scale the persisted
    * stage becomes staged parquet and the bucket join is salted on hot
    * buckets. */
  /** Corpus + planted twins (vec_id % 10 == 0, embedding scaled x2 —
    * cosine 1 with the parent, and both hyperplane signs and IVF cell
    * assignment are invariant under positive scaling, so recall is 1.0 by
    * construction for every bucketing scheme built on top). Spread with
    * an explicit partition count — AQE would coalesce the small shuffle
    * bytes and serialize the signature/cosine compute into 1-2 tasks. */
  private def corpusWithTwins(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "embeddings").withColumn("v", asDouble(col("embedding")))
    // the stage is shared across the ANN query family, filled in ONE
    // job (racing consumers would each recompute the union) —
    // [[SharedStage.cached]]
    SharedStage.cached(e.select(col("vec_id"), col("v"))
      .union(e.filter(col("vec_id") % 10 === 0)
        .select((col("vec_id") + 1000000L).as("vec_id"),
          transform(col("v"), x => x * lit(2.0d)).as("v")))
      .repartition(spark.sparkContext.defaultParallelism, col("vec_id")))
  }

  /** Top-k search over int8-QUANTIZED vectors — the memory-bound scale
    * path: the candidate store holds 8x fewer bytes per vector (the
    * broadcast/shuffle payload shrinks identically), scores rank on
    * dequantized values, and the spec bounds recall against the
    * full-precision top-k. Re-ranking survivors with full-precision
    * vectors is the standard refinement; at this fixture's scale the
    * quantized ranking alone already holds recall near 1. */
  /** Per-vector affine int8 quantize→dequantize: (vec_id, dv) where dv
    * is the value the int8 code reconstructs to — the SHARED arithmetic
    * of both quantized search paths, so their scale claims rest on
    * provably identical rounding. */
  private def dequantized(df: DataFrame): DataFrame = df
    .withColumn("vmin", array_min(col("v")))
    .withColumn("vmax", array_max(col("v")))
    .withColumn("scale",
      when(col("vmax") > col("vmin"),
        (col("vmax") - col("vmin")) / lit(255.0)).otherwise(lit(1.0)))
    // store int8 codes; dequantize at score time
    .withColumn("qv", expr(
      "transform(v, x -> cast(floor((x - vmin) / scale + 0.5d) as bigint))"))
    .withColumn("dv", expr("transform(qv, c -> c * scale + vmin)"))
    .select(col("vec_id"), col("dv"))

  def annBruteForceQuantized(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = dequantized(Tables(spark, dir, "embeddings")
      .withColumn("v", asDouble(col("embedding"))))
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("dv").as("qv"))
    val scored = e.select(col("vec_id").as("neighbor_id"), col("dv").as("nv"))
      .join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("qv"), col("nv")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select("query_id", "rank", "neighbor_id", "cos")
      .orderBy("query_id", "rank")
  }

  /** Two-stage ANN serving — the standard memory-bound search shape: the
    * FIRST pass ranks on int8-dequantized vectors (8× smaller candidate
    * store — what actually fits in memory at a billion vectors) and keeps
    * only a 20-candidate shortlist per query; the SECOND pass touches the
    * full-precision vectors for the shortlist alone and re-ranks to the
    * final top-5. Both passes are exact double arithmetic with integer
    * tie-breaks, so the full two-stage pipeline carries a DuckDB oracle.
    * At scale: the full-precision side is a slim (query, candidate)
    * equi-join — 20 rows per query, never the corpus. */
  def annTopKRerank(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val full = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val e = dequantized(full)
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("dv").as("qdv"))
    val wShort = Window.partitionBy("query_id").orderBy(col("qcos").desc, col("neighbor_id"))
    val shortlist = e.select(col("vec_id").as("neighbor_id"), col("dv").as("ndv"))
      .join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("qcos", cosine(col("qdv"), col("ndv")))
      .withColumn("srank", row_number().over(wShort))
      .filter(col("srank") <= 20)
      .select("query_id", "neighbor_id")
    val wFinal = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    shortlist
      .join(full.select(col("vec_id").as("query_id"), col("v").as("qv")), "query_id")
      .join(full.select(col("vec_id").as("neighbor_id"), col("v").as("nv")), "neighbor_id")
      .withColumn("cos", cosine(col("qv"), col("nv")))
      .withColumn("rank", row_number().over(wFinal).cast("long"))
      .filter(col("rank") <= 5)
      .select("query_id", "rank", "neighbor_id", "cos")
      .orderBy("query_id", "rank")
  }

  /** Per-vector int8-style quantization — the memory-compression step a
    * billion-vector ANN index applies before sharding: affine-map each
    * vector onto 0..255 with its own (min, scale), report the first/max
    * quantized levels and the mean absolute reconstruction error. A
    * narrow map over the scan (codegen'd HOFs, zero shuffle); rounding
    * is floor(x + 0.5) so both engines round identically on exact
    * doubles. */
  /** EMBEDDING-SPACE drift monitor — the representation-side twin of the
    * token-distribution drift op: per label, the cosine between the
    * centroids of two snapshot slices (even vs odd vec_id — stand-ins
    * for consecutive corpus snapshots). A drifting embedding pipeline
    * (model swap, preprocessing change, domain shift) moves centroids
    * apart long before nearest-neighbor quality visibly degrades, so
    * this is the cheap canary a serving stack alerts on.
    *
    * Determinism discipline: float sums are NOT associative, so the
    * centroid accumulates in 1e3 FIXED POINT — floor(x·1000 + 0.5) per
    * component, exact long sums — and cosine is scale-invariant, so the
    * raw integer sums stand in for the means with no division. The
    * single double op is the final dot/(√·√), exactly reproducible from
    * the integer sums on both engines (round(6) absorbs last-ulp √
    * differences). Scale shape: one narrow posexplode over the vector
    * scan, one shuffle on (label, slice, dim), then dim-sized frames —
    * never a vector collect, layout-independent on any cluster. */
  def embedDrift(spark: SparkSession, dir: String): DataFrame = {
    val comp = Tables(spark, dir, "embeddings")
      .select(col("label"), (col("vec_id") % 2).as("slice"),
        posexplode(expr(
          "transform(embedding, x -> cast(floor(cast(x as double) * 1000d + 0.5d) as bigint))")))
      .toDF("label", "slice", "i", "xq")
    val sums = comp.groupBy("label", "slice", "i")
      .agg(sum(col("xq")).as("sv"))
    val piv = sums.groupBy("label", "i").agg(
      sum(when(col("slice") === 0, col("sv"))).as("sa"),
      sum(when(col("slice") === 1, col("sv"))).as("sb"))
    val geom = piv.groupBy("label").agg(
      sum(col("sa") * col("sb")).as("dot"),
      sum(col("sa") * col("sa")).as("na"),
      sum(col("sb") * col("sb")).as("nb"))
    val counts = Tables(spark, dir, "embeddings")
      .groupBy("label").agg(
        sum(when(col("vec_id") % 2 === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("vec_id") % 2 === 1, 1L).otherwise(0L)).as("n_b"))
    geom.join(counts, Seq("label"))
      .select(col("label"), col("n_a"), col("n_b"),
        when(col("na") > 0L && col("nb") > 0L,
          round(col("dot").cast("double") /
            (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))), 6))
          .as("cos_centroid"))
      .orderBy("label")
  }

  def quantize(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "embeddings")
      .withColumn("v", asDouble(col("embedding")))
      .withColumn("vmin", array_min(col("v")))
      .withColumn("vmax", array_max(col("v")))
      .withColumn("scale",
        when(col("vmax") > col("vmin"),
          (col("vmax") - col("vmin")) / lit(255.0)).otherwise(lit(1.0)))
      .withColumn("q",
        expr("transform(v, x -> cast(floor((x - vmin) / scale + 0.5d) as bigint))"))
      .withColumn("mae", expr(
        """aggregate(
             transform(sequence(1, size(v)),
               i -> abs(element_at(v, i) - (vmin + element_at(q, i) * scale))),
             0d, (acc, x) -> acc + x) / size(v)"""))
      .select(col("vec_id"), col("vmin"), col("vmax"),
        element_at(col("q"), 1).as("q0"), array_max(col("q")).as("qmax"),
        col("mae"))
      .orderBy("vec_id")

  /** The shared candidate-join tail: self-join the bucket keying, keep
    * ordered id pairs, dedup the slim pairs, spread them, then join the
    * fat vectors back ONLY for the exact-cosine verification — the
    * discipline every bucketed ANN variant shares.
    *
    * `maxBucket` is the degenerate-bucket guard for cluster scale: a
    * bucket of n vectors contributes n^2 candidate pairs, so one hot
    * bucket (all-zero vectors, a constant embedding bug, a hash pileup)
    * can dominate the whole job quadratically. Buckets over the cap are
    * dropped whole — the standard LSH practice, trading bounded recall
    * loss on pathological keys for a hard bound on candidate volume. The
    * per-bucket sizes are |buckets| rows, broadcast back. */
  private[graft] def verifiedCosinePairs(corpus: DataFrame, keyed: DataFrame,
      bucketCols: Seq[String], maxBucket: Option[Long] = None): DataFrame = {
    val spark = corpus.sparkSession
    val bounded = maxBucket.fold(keyed) { cap =>
      val ok = keyed.groupBy(bucketCols.map(col): _*)
        .agg(count(lit(1)).as("_n")).filter(col("_n") <= cap)
        .select(bucketCols.map(col): _*)
      keyed.join(broadcast(ok), bucketCols, "left_semi")
    }
    val l = bounded.select((bucketCols.map(col) :+ col("vec_id").as("id_a")): _*)
    val r = bounded.select((bucketCols.map(col) :+ col("vec_id").as("id_b")): _*)
    val pairs = l.join(r, bucketCols)
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
      .repartition(spark.sparkContext.defaultParallelism, col("id_a"))
    pairs
      .join(corpus.select(col("vec_id").as("id_a"), col("v").as("va")), "id_a")
      .join(corpus.select(col("vec_id").as("id_b"), col("v").as("vb")), "id_b")
      .select(col("id_a"), col("id_b"), cosine(col("va"), col("vb")).as("cos"))
      .filter(col("cos") >= 0.99)
      .orderBy("id_a", "id_b")
  }

  def annLshPairs(spark: SparkSession, dir: String): DataFrame = {
    val spark0 = spark
    import spark0.implicits._
    val nTables = 8
    val bitsPerTable = 8
    val planes: Array[Array[Double]] = {
      val rnd = new scala.util.Random(42)
      Array.fill(nTables * bitsPerTable, 64)(rnd.nextGaussian())
    }
    val corpus = corpusWithTwins(spark, dir)
    val sigs = corpus.as[(Long, Seq[Double])].mapPartitions(_.flatMap { case (id, v) =>
      val arr = v.toArray
      Iterator.tabulate(nTables) { t =>
        var sig = 0
        var b = 0
        while (b < bitsPerTable) {
          val p = planes(t * bitsPerTable + b)
          var d = 0.0
          var i = 0
          while (i < arr.length) { d += p(i) * arr(i); i += 1 }
          sig = (sig << 1) | (if (d > 0) 1 else 0)
          b += 1
        }
        (id, t, sig)
      }
    }).toDF("vec_id", "tbl", "sig")
    verifiedCosinePairs(corpus, sigs, Seq("tbl", "sig"))
  }

  /** Recall of the IVF top-k search against the brute-force exact
    * baseline — the honesty metric every approximate index owes its
    * users: per query, how many of the true top-5 the bucketed search
    * returned. Both sides are deterministic, so the oracle recomputes
    * the same number exactly. */
  def annIvfRecall(spark: SparkSession, dir: String): DataFrame = {
    val exact = annBruteForce(spark, dir).select("query_id", "neighbor_id")
    val approx = annIvfTopK(spark, dir).select("query_id", "neighbor_id")
    val hits = exact.join(approx, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("hits"))
    exact.select("query_id").distinct()
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        (coalesce(col("hits"), lit(0L)) / lit(5.0)).as("recall"))
      .orderBy("query_id")
  }

  /** Embedding-cosine near-duplicate GROUPS — the vector-space analog of
    * [[DedupOps.nearDupGroups]]: hyperplane-LSH candidate pairs verified
    * by exact cosine (>= 0.99), then min-label connected components, so
    * each vector maps to the smallest vec_id in its near-dup cluster (the
    * survivor a dedup pass keeps). Planted twins make recall 1.0 by
    * construction, so the brute-force DuckDB truth reproduces the exact
    * same pair set and components. */
  def embedNearDupGroups(spark: SparkSession, dir: String): DataFrame =
    DedupOps.connectedComponents(annLshPairs(spark, dir).select("id_a", "id_b"))
      .select(col("doc_id").as("vec_id"), col("canonical_id"))
      .orderBy("vec_id")

  /** SemDeDup-style semantic deduplication (Abbas et al., 2023,
    * arXiv:2303.09540): cluster the embedding corpus (here the IVF
    * coarse cells — at scale the k-means cells [[kmeansIterate]]
    * refines), find near-duplicate pairs ONLY within a cell (the whole
    * point: candidate generation is a cell equi-join, never corpus ×
    * corpus), connect them into groups, and keep exactly ONE member per
    * group — the member LEAST similar to its cell centroid, SemDeDup's
    * keep-low-centroid-similarity rule (the most "marginal" exemplar
    * preserves diversity; ties break to the lowest vec_id). Every
    * vector gets a verdict row: its group, cell, centroid cosine, and
    * keep/drop flag — the columns a curation pipeline filters on.
    *
    * Determinism: dot products fold left-to-right in both engines
    * (bit-identical doubles), the keep rule is a lexicographic min over
    * (cell_cos, vec_id), and planted ×2 twins share their parent's cell
    * (cosine assignment is scale-invariant), so brute-force DuckDB
    * truth reproduces the exact pair set, groups, and keeps.
    *
    * Scale: centroid frame is k rows (broadcast); assignment a narrow
    * map; the wide ops are the cell-key candidate join, the slim-pair
    * CC, and one group-key shuffle for the keeper election. */
  def semanticDedup(spark: SparkSession, dir: String): DataFrame = {
    val corpus = corpusWithTwins(spark, dir)
    val cells = ivfCells(spark, dir, corpus)
    val pairs = verifiedCosinePairs(corpus, cells, Seq("cell"))
    val groups = DedupOps.connectedComponents(pairs.select("id_a", "id_b"))
      .select(col("doc_id").as("vec_id"), col("canonical_id").as("group_id"))
    val cents = Tables(spark, dir, "embeddings")
      .filter(col("vec_id") < 64)
      .select(col("vec_id").cast("int").as("cell"),
        asDouble(col("embedding")).as("cv"))
    val verdictBase = corpus.join(cells, "vec_id")
      .join(broadcast(cents), "cell")
      .select(col("vec_id"), col("cell").cast("long").as("cell"),
        cosine(col("v"), col("cv")).as("cell_cos"))
      .join(groups, Seq("vec_id"), "left")
      .withColumn("group_id", coalesce(col("group_id"), col("vec_id")))
    val keepers = verdictBase.groupBy("group_id")
      .agg(min(struct(col("cell_cos"), col("vec_id"))).as("k"))
      .select(col("group_id"), col("k.vec_id").as("keep_id"))
    verdictBase.join(keepers, "group_id")
      .select(col("vec_id"), col("group_id"), col("cell"), col("cell_cos"),
        (col("vec_id") === col("keep_id")).cast("long").as("keep"))
      .orderBy("vec_id")
  }

  /** IVF-style ANN — the coarse-quantizer scale path: vectors are
    * assigned to their max-cosine centroid cell (centroids = the first 64
    * corpus vectors, deterministic; k-means iterations would refine them
    * the same way at scale), candidates share a cell (equi-join on the
    * cell id, nprobe=1), and exact cosine verifies. Cell assignment by
    * cosine is scale-invariant, so a planted x2 twin lands in its
    * parent's cell — recall 1.0 by construction, same brute-force oracle
    * as the hyperplane-LSH variant.
    *
    * At 100 TB: centroids are a driver-side artifact (k x d doubles)
    * broadcast in the closure; assignment is a narrow map; the only wide
    * ops are the cell-key candidate join and the slim-pair dedup. */
  def annIvfPairs(spark: SparkSession, dir: String): DataFrame = {
    val corpus = corpusWithTwins(spark, dir)
    verifiedCosinePairs(corpus, ivfCells(spark, dir, corpus), Seq("cell"))
  }

  /** Max-cosine centroid assignment over a (vec_id, v) corpus — the IVF
    * coarse quantizer shared by the pairs and top-k paths. Centroids (the
    * first 64 corpus vectors, deterministic) are a driver-side k x d
    * artifact broadcast in the closure; assignment is a narrow map. Ties
    * keep the lowest centroid id (strict `>` in the scan). `probes` > 1
    * emits one row per top-cell — the query-side nprobe knob that trades
    * candidate volume for recall. */
  private def ivfCells(spark: SparkSession, dir: String, corpus: DataFrame,
      probes: Int = 1): DataFrame =
    assignCells(
      collectCentroids(Tables(spark, dir, "embeddings")
        .withColumn("v", asDouble(col("embedding")))
        .filter(col("vec_id") < 64)),
      corpus, probes)

  /** The k×d centroid artifact — driver-sized by construction. */
  private[graft] def collectCentroids(src: DataFrame): Array[Array[Double]] = {
    val spark0 = src.sparkSession
    import spark0.implicits._
    src.orderBy("vec_id").select("v").as[Seq[Double]].collect().map(_.toArray)
  }

  private[graft] def assignCells(centroids: Array[Array[Double]], corpus: DataFrame,
      probes: Int): DataFrame =
    assignCellsRanked(centroids, corpus, probes).select("vec_id", "cell")

  /** [[assignCells]] with the probe RANK kept (0 = argmax): one pass
    * serves both a gate's claim side (rank 0 only) and its multi-cell
    * probe side — the streaming gate assigns each batch's vectors once,
    * not once per consumer. */
  private[graft] def assignCellsRanked(centroids: Array[Array[Double]],
      corpus: DataFrame, probes: Int): DataFrame = {
    val spark0 = corpus.sparkSession
    import spark0.implicits._
    corpus.select("vec_id", "v").as[(Long, Seq[Double])].mapPartitions { it =>
      val norms = centroids.map(c => math.sqrt(c.map(x => x * x).sum))
      it.flatMap { case (id, v) =>
        val arr = v.toArray
        val cos = new Array[Double](centroids.length)
        var c = 0
        while (c < centroids.length) {
          val cen = centroids(c)
          var d = 0.0
          var i = 0
          while (i < arr.length) { d += cen(i) * arr(i); i += 1 }
          cos(c) = d / norms(c) // vector norm constant across cells — omit
          c += 1
        }
        // selection of the top `probes` cells, lowest id on ties —
        // probes is tiny (1-2), so the repeated scan beats a sort
        val taken = new Array[Int](probes)
        var p = 0
        while (p < probes) {
          var best = -1
          var bestCos = Double.MinValue
          var j = 0
          while (j < cos.length) {
            val already = { var t = 0; var hit = false
              while (t < p) { if (taken(t) == j) hit = true; t += 1 }; hit }
            if (!already && cos(j) > bestCos) { bestCos = cos(j); best = j }
            j += 1
          }
          taken(p) = best
          p += 1
        }
        Iterator.range(0, probes).map(r => (id, taken(r), r))
      }
    }.toDF("vec_id", "cell", "rank")
  }

  /** One distributed k-means (Lloyd) iteration over the embedding corpus —
    * the clustering step under IVF index builds and corpus bucketing.
    * Assignment (nearest centroid by squared L2, lowest-id tie-break) is a
    * narrow map against a broadcast k×d centroid artifact; the centroid
    * update is ONE shuffle on (cluster, dim) after a posexplode fan-out.
    *
    * Reproducibility at cluster scale: floating-point sums are
    * order-dependent, and a 1000-executor aggregation adds in whatever
    * order tasks finish — so per-dimension coordinates accumulate as
    * 1e-6 FIXED-POINT integers (exact, associative, deterministic on any
    * layout), and only the final mean divides back into doubles. The
    * DuckDB oracle reproduces the iteration bit-for-bit. */
  def kmeansIterate(spark: SparkSession, dir: String, k: Int = 8): DataFrame = {
    val spark0 = spark
    import spark0.implicits._
    val e = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val centroids: Array[Array[Double]] = e.filter(col("vec_id") < k)
      .orderBy("vec_id").select("v").as[Seq[Double]].collect().map(_.toArray)
    val assigned = e.as[(Long, Seq[Double])].mapPartitions { it =>
      it.map { case (id, v) =>
        val arr = v.toArray
        var best = -1
        var bestD = Double.MaxValue
        var c = 0
        while (c < centroids.length) {
          val cen = centroids(c)
          var d = 0.0
          var i = 0
          while (i < arr.length) { val t = arr(i) - cen(i); d += t * t; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        (id, best.toLong)
      }
    }.toDF("vec_id", "cluster")
    val sums = assigned.join(e, "vec_id")
      .select(col("cluster"), posexplode(col("v")).as(Seq("dim0", "x")))
      .select(col("cluster"), (col("dim0") + 1).as("dim"),
        floor(col("x") * lit(1000000.0) + lit(0.5)).cast("long").as("qx"))
      .groupBy("cluster", "dim")
      .agg(sum(col("qx")).as("sq"), count(lit(1)).as("n"))
      .withColumn("mu",
        col("sq").cast("double") / lit(1000000.0) / col("n").cast("double"))
    val mus = sums.groupBy("cluster")
      .agg(max(col("n")).as("n_members"),
        transform(sort_array(collect_list(struct(col("dim"), col("mu")))),
          s => s.getField("mu")).as("mus"))
    val cenDf = spark.createDataFrame(
      centroids.toIndexedSeq.zipWithIndex.map { case (cv, i) => (i.toLong, cv.toSeq) })
      .toDF("cluster", "cv")
    mus.join(broadcast(cenDf), "cluster")
      .select(
        col("cluster"), col("n_members"),
        element_at(col("mus"), 1).as("mu0"),
        sqrt(aggregate(transform(col("mus"), x => x * x),
          lit(0.0), (a, b) => a + b)).as("new_norm"),
        sqrt(aggregate(zip_with(col("mus"), col("cv"), (a, b) => (a - b) * (a - b)),
          lit(0.0), (a, b) => a + b)).as("shift"))
      .orderBy("cluster")
  }

  /** IVF top-k SEARCH — the complete scale-path search contract: query
    * vectors (vec_id < 20) probe their cell (nprobe=1), candidates are the
    * cell's members, exact cosine ranks them, row_number keeps the top 5.
    * Same output shape as [[annBruteForce]], so recall against the exact
    * baseline is directly comparable; the DuckDB oracle recomputes the
    * cell assignment exactly (deterministic centroids + lowest-id
    * tie-break), making this bucketed search bit-for-bit checkable. */
  def annIvfTopK(spark: SparkSession, dir: String): DataFrame =
    annIvfTopKProbes(spark, dir, nprobe = 1)

  /** nprobe > 1 probes the query's next-best cells too — more candidate
    * joins bought for more recall, the standard IVF accuracy knob
    * (spec-asserted: nprobe=2 recall dominates nprobe=1). */
  def annIvfTopKProbes(spark: SparkSession, dir: String, nprobe: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val cells = ivfCells(spark, dir, e).join(e, "vec_id")
    val q = ivfCells(spark, dir, e.filter(col("vec_id") < 20), probes = nprobe)
      .join(e, "vec_id")
      .select(col("cell"), col("vec_id").as("query_id"), col("v").as("qv"))
    val scored = cells.select(col("cell"), col("vec_id").as("neighbor_id"), col("v").as("nv"))
      .join(broadcast(q), "cell")
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("qv"), col("nv")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select("query_id", "rank", "neighbor_id", "cos")
      .orderBy("query_id", "rank")
  }

  /** Quantized IVF top-k — the memory-bound scale path WITH the plan to
    * match: candidates come from the IVF cell EQUI-JOIN (brute force
    * nowhere in the plan), the cell store holds int8 codes so the
    * shuffled/stored payload is 8x smaller, and scores rank on the
    * dequantized values. Cell assignment runs on the full-precision
    * vectors — the assignment artifact is built at index time, before
    * the codes replace the vectors — so the cells match q_ann_ivf_topk
    * exactly and the whole search stays bit-for-bit DuckDB-checkable
    * (the affine dequantize is exact double arithmetic). */
  def annIvfTopKQuantized(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val dq = dequantized(e)
    val cells = ivfCells(spark, dir, e).join(dq, "vec_id")
    // the query side's nprobe-1 assignments are exactly the corpus
    // cells' rows for vec_id < 20 — no second centroid collect or
    // assignment pass (annIvfTopKProbes needs a separate call only
    // because its probes differ per side)
    val q = cells.filter(col("vec_id") < 20)
      .select(col("cell"), col("vec_id").as("query_id"), col("dv").as("qv"))
    val scored = cells
      .select(col("cell"), col("vec_id").as("neighbor_id"), col("dv").as("nv"))
      .join(broadcast(q), "cell")
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("qv"), col("nv")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select("query_id", "rank", "neighbor_id", "cos")
      .orderBy("query_id", "rank")
  }

  /** STAGED-INDEX IVF serving — [[annIvfTopKQuantized]] with the index
    * persisted between build and search, closing the build→persist→serve
    * lifecycle every production ANN deployment has (the ANN analog of
    * q_staged_table_search_doc). INDEX TIME: cell assignment runs on the
    * full-precision vectors, then the serving store is written as
    * (vec_id, int8 codes, vmin, scale) parquet PARTITIONED BY cell — at
    * corpus scale a query's probe prunes the scan to its cell's files
    * (partition pruning in the parquet source; no per-query index pass).
    * SERVE TIME: everything — queries included — reads ONLY the staged
    * store; codes and affine params round-trip parquet exactly (int64 +
    * doubles), and the dequantize is the same exact affine arithmetic,
    * so the staged search is bit-identical to the in-memory twin and
    * SHARES its DuckDB oracle. The store path is keyed by BOTH the JVM pid
    * (concurrent graft JVMs — Verify while Bench runs — must not overwrite
    * each other mid-read) and a hash of the dataset dir (two staged
    * searches over different SF dirs interleaved on threads in one JVM get
    * disjoint stores), and the pid-scoped root is deleted on JVM exit so
    * staged stores do not accumulate in tmp across runs. */
  private lazy val stagedIvfRoot: java.nio.file.Path =
    graft.sources.TmpStores.pidScopedRoot("graft-staged-ivf")

  private[graft] def stagedIvfDir(dir: String): String =
    s"$stagedIvfRoot/${java.lang.Integer.toHexString(dir.hashCode)}"

  /** int8 affine quantization of a (vec_id, v) frame — the serving-store
    * payload: (vec_id, codes, vmin, scale). */
  private def int8Codes(e: DataFrame): DataFrame = e
    .withColumn("vmin", array_min(col("v")))
    .withColumn("vmax", array_max(col("v")))
    .withColumn("scale",
      when(col("vmax") > col("vmin"),
        (col("vmax") - col("vmin")) / lit(255.0)).otherwise(lit(1.0)))
    .withColumn("codes", expr(
      "transform(v, x -> cast(floor((x - vmin) / scale + 0.5d) as bigint))"))
    .select(col("vec_id"), col("codes"), col("vmin"), col("scale"))

  /** The serve-time search over a cell-partitioned staged store: read,
    * dequantize, bucket equi-join the 20-query set, top-5 per query. */
  private def searchStagedCells(spark: SparkSession, cellsPath: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val staged = spark.read.parquet(cellsPath)
      .withColumn("dv", expr("transform(codes, c -> c * scale + vmin)"))
      .select(col("cell"), col("vec_id"), col("dv"))
    val q = staged.filter(col("vec_id") < 20)
      .select(col("cell"), col("vec_id").as("query_id"), col("dv").as("qv"))
    val scored = staged
      .select(col("cell"), col("vec_id").as("neighbor_id"), col("dv").as("nv"))
      .join(broadcast(q), "cell")
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("qv"), col("nv")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select("query_id", "rank", "neighbor_id", "cos")
      .orderBy("query_id", "rank")
  }

  def annIvfTopKStaged(spark: SparkSession, dir: String): DataFrame = {
    val out = stagedIvfDir(dir)
    val e = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    ivfCells(spark, dir, e).join(int8Codes(e), "vec_id")
      .write.mode("overwrite").partitionBy("cell").parquet(s"$out/cells")
    searchStagedCells(spark, s"$out/cells")
  }

  // ------------------------------------------ incremental IVF upsert

  private[graft] def ivfUpsertStore(dir: String): String =
    s"${stagedIvfDir(dir)}-upsert/cells"

  private def ivfUpsertCorpus(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val all = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    // incoming = genuinely new ids (% 10 == 0) + a re-upsert of existing
    // ids (% 97 == 3) exercising the replace path
    (all.filter(col("vec_id") % 10 =!= 0),
      all.filter(col("vec_id") % 10 === 0 || col("vec_id") % 97 === 3))
  }

  private def ivfUpsertCentroids(spark: SparkSession, dir: String): Array[Array[Double]] = {
    val (base, _) = ivfUpsertCorpus(spark, dir)
    collectCentroids(base.filter(col("vec_id") < 64))
  }

  private def ivfUpsertBuildWith(base: DataFrame,
      centroids: Array[Array[Double]], store: String): String = {
    assignCells(centroids, base, 1)
      .join(int8Codes(base), "vec_id")
      .write.mode("overwrite").partitionBy("cell").parquet(store)
    store
  }

  /** BUILD phase of the upsert lifecycle: stage the base corpus (all ids
    * with vec_id % 10 != 0) into a cell-partitioned store whose centroid
    * artifact is fixed at build time. Returns the store path. */
  private[graft] def ivfUpsertBuild(spark: SparkSession, dir: String): String = {
    val (base, _) = ivfUpsertCorpus(spark, dir)
    ivfUpsertBuildWith(base, ivfUpsertCentroids(spark, dir), ivfUpsertStore(dir))
  }

  /** UPSERT phase: assign the incoming batch with the STORED centroid
    * artifact (never re-clustered — the index contract), then rewrite
    * ONLY the touched cell partitions: the touched cell ids (bounded by
    * the centroid count — a driver artifact by design) become a LITERAL
    * partition filter so the store scan statically prunes to those
    * directories (plan-asserted; a semi-join here would scan every
    * cell), surviving rows drop the re-upserted ids via anti-join (no
    * driver id set — the batch is data-sized), and the union with the
    * incoming rows commits under dynamic partition overwrite so
    * untouched cell directories keep their exact files. The rewrite
    * frame is localCheckpointed before the write because it reads the
    * store it overwrites; its size is bounded by the refresh batch's
    * touched cells, not the corpus. */
  private[graft] def ivfUpsertApply(spark: SparkSession, dir: String): Unit = {
    val (_, incoming) = ivfUpsertCorpus(spark, dir)
    ivfUpsertApplyWith(spark, incoming, ivfUpsertCentroids(spark, dir), ivfUpsertStore(dir))
  }

  private def ivfUpsertApplyWith(spark: SparkSession, incoming: DataFrame,
      centroids: Array[Array[Double]], store: String): Unit = {
    val spark0 = spark
    import spark0.implicits._
    val incCells = assignCells(centroids, incoming, 1)
      .join(int8Codes(incoming), "vec_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val touched = incCells.select("cell").distinct().as[Int].collect().sorted
    val staged = touchedCellRows(spark, store, touched.toSeq)
    val rewritten = staged
      .join(incCells.select("vec_id"), Seq("vec_id"), "left_anti")
      .unionByName(incCells.select(staged.columns.map(col): _*))
      .localCheckpoint(true)
    incCells.unpersist()
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try rewritten.write.mode("overwrite").partitionBy("cell").parquet(store)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** The touched-cell read: a LITERAL cell filter so the partitioned
    * store scan statically prunes to the touched directories — the
    * partitionFilters-level contract the spec asserts. */
  private[graft] def touchedCellRows(spark: SparkSession, store: String,
      touched: Seq[Int]): DataFrame =
    spark.read.parquet(store)
      .filter(col("cell").isin(touched.map(c => c: Any): _*))

  /** INCREMENTAL index maintenance — IVF UPSERT: the refresh path every
    * production ANN deployment needs between full rebuilds. Build the
    * store from the base corpus, upsert an incoming batch (new ids +
    * replacements) touching only the affected cell partitions, then
    * serve from the refreshed store. The post-upsert corpus equals the
    * full embedding table (replacements carry identical vectors), so
    * the search shares the staged-IVF oracle shape with the centroid
    * set pinned to the BUILD corpus — a drifted centroid artifact or a
    * cell leak would break the hash compare. Untouched-partition
    * byte-identity is spec-asserted (the StreamPublish discipline
    * applied to index maintenance). */
  def annIvfUpsert(spark: SparkSession, dir: String): DataFrame = {
    // the corpus split and the centroid artifact are computed ONCE and
    // threaded through both phases (build scans + the ~k×d driver
    // collect are identical by construction — no reason to pay them per
    // phase)
    val (base, incoming) = ivfUpsertCorpus(spark, dir)
    val centroids = collectCentroids(base.filter(col("vec_id") < 64))
    val store = ivfUpsertStore(dir)
    ivfUpsertBuildWith(base, centroids, store)
    ivfUpsertApplyWith(spark, incoming, centroids, store)
    searchStagedCells(spark, store)
  }

  // ------------------------------------- centroid refresh + migration

  private[graft] def reclusterStore(dir: String): String =
    s"${stagedIvfDir(dir)}-recluster/cells"

  /** BUILD phase of the recluster lifecycle: the FULL corpus staged on
    * the pinned first-64 centroid artifact — the store whose recall the
    * drift canary will eventually erode. */
  private[graft] def reclusterBuild(spark: SparkSession, dir: String): String = {
    val e = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    ivfUpsertBuildWith(e, collectCentroids(e.filter(col("vec_id") < 64)),
      reclusterStore(dir))
  }

  /** REFRESH phase — CENTROID LIFECYCLE for the cell-partitioned store,
    * the standard production-ANN maintenance the pinned artifact
    * otherwise lacks: after enough distribution shift, recall quietly
    * decays because vectors sit in cells whose centroid no longer
    * represents them. The phase CONSUMES the drift canary and migrates:
    *
    *  1. per-cell means of the store's CURRENT members accumulate as
    *     1e-6 fixed-point integers (exact, associative — deterministic
    *     on any layout, the [[kmeansIterate]] discipline), and only the
    *     k×d driver artifact divides back into doubles;
    *  2. the canary is the centroid SHIFT — the L2 distance between each
    *     pinned centroid and its members' mean; if no cell shifted past
    *     `shiftThreshold`, the store is left byte-untouched;
    *  3. on a tripped canary the means become the new centroid artifact
    *     (one Lloyd update; empty cells keep their pinned centroid), all
    *     vectors re-assign by max-cosine, and ONLY the vectors whose
    *     cell CHANGED migrate: touched cells (old ∪ new of every mover)
    *     become a LITERAL partition filter, survivors keep their rows,
    *     movers rewrite under the new cell, and the union commits by
    *     dynamic partition overwrite — untouched cell directories keep
    *     their exact files (byte-identity spec-asserted). A touched cell
    *     that lost every member writes no rows under dynamic overwrite,
    *     so its stale directory is dropped explicitly.
    *
    * Returns the per-cell lifecycle report: members before/after,
    * out/in-migration counts, the new centroid's first coordinate in
    * fixed-point micros (truncating integer division — replays exactly),
    * and the raw shift. Everything driver-side is k×d-bounded; the
    * migration rewrite is bounded by the touched cells, not the corpus. */
  private[graft] def reclusterApply(spark: SparkSession, dir: String,
      shiftThreshold: Double = 0.5): DataFrame = {
    val spark0 = spark
    import spark0.implicits._
    val store = reclusterStore(dir)
    val e = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val pinned = collectCentroids(e.filter(col("vec_id") < 64))
    spark.catalog.refreshByPath(store)
    // localCheckpoint, not persist: the store is overwritten below, and
    // the post-overwrite refreshByPath RECACHES any cached plan that
    // still reads the store path — the pre-state must be lineage-free
    val cells0 = spark.read.parquet(store).select(col("vec_id"), col("cell"))
      .localCheckpoint(true)
    // per-cell fixed-point means: k×d rows — a driver artifact by design
    val sums = cells0.join(e, "vec_id")
      .select(col("cell"), posexplode(col("v")).as(Seq("dim0", "x")))
      .select(col("cell"), (col("dim0") + 1).as("dim"),
        floor(col("x") * lit(1000000.0) + lit(0.5)).cast("long").as("qx"))
      .groupBy("cell", "dim")
      .agg(sum(col("qx")).as("sq"), count(lit(1)).as("n"))
      .collect()
    val byCell = sums.groupBy(_.getAs[Int]("cell"))
    val newCen = pinned.zipWithIndex.map { case (cv, c) =>
      byCell.get(c).fold(cv) { rows =>
        val mu = new Array[Double](cv.length)
        rows.foreach(r => mu(r.getAs[Int]("dim") - 1) =
          r.getAs[Long]("sq").toDouble / 1000000.0 / r.getAs[Long]("n").toDouble)
        mu
      }
    }
    val shiftOf: Map[Int, Double] = byCell.keySet.map { c =>
      var s = 0.0
      var i = 0
      while (i < pinned(c).length) {
        val t = newCen(c)(i) - pinned(c)(i); s += t * t; i += 1
      }
      c -> math.sqrt(s)
    }.toMap
    val mu0Of: Map[Int, Long] = byCell.map { case (c, rows) =>
      val r1 = rows.find(_.getAs[Int]("dim") == 1).get
      c -> r1.getAs[Long]("sq") / r1.getAs[Long]("n") // truncating micros
    }
    val drifted = shiftOf.values.exists(_ > shiftThreshold)
    val cells1 =
      if (drifted) assignCells(newCen, e, 1)
      else cells0 // canary quiet: the store stays byte-untouched
    val moved = cells0.withColumnRenamed("cell", "old_cell")
      .join(cells1.withColumnRenamed("cell", "new_cell"), "vec_id")
      .filter(col("old_cell") =!= col("new_cell"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val touched = moved.select(col("old_cell").as("c"))
      .unionByName(moved.select(col("new_cell").as("c")))
      .distinct().as[Int].collect().sorted
    if (touched.nonEmpty) {
      val staged = touchedCellRows(spark, store, touched.toSeq)
      val rewritten = staged
        .join(moved.select("vec_id"), Seq("vec_id"), "left_anti")
        .unionByName(staged.join(moved.select(col("vec_id"), col("new_cell")), Seq("vec_id"))
          .withColumn("cell", col("new_cell")).drop("new_cell")
          .select(staged.columns.map(col): _*))
        .localCheckpoint(true)
      overwriteCellsDynamic(spark, rewritten, store)
      // dynamic overwrite only replaces partitions PRESENT in the frame:
      // a cell that lost every member writes no rows, so its stale
      // directory drops explicitly
      val kept = rewritten.select("cell").distinct().as[Int].collect().toSet
      dropCellDirs(spark, store, touched.filterNot(kept).toSeq)
    }
    spark.catalog.refreshByPath(store)
    val after = spark.read.parquet(store)
      .groupBy("cell").agg(count(lit(1)).as("n_after"))
    val before = cells0.groupBy("cell").agg(count(lit(1)).as("n_before"))
    val outs = moved.groupBy(col("old_cell").as("cell"))
      .agg(count(lit(1)).as("n_out"))
    val ins = moved.groupBy(col("new_cell").as("cell"))
      .agg(count(lit(1)).as("n_in"))
    val stats = byCell.keySet.toSeq.sorted
      .map(c => (c, mu0Of(c), shiftOf(c))).toDF("cell", "mu0_micros", "shift")
    val out = spark.range(pinned.length).select(col("id").cast("int").as("cell"))
      .join(before, Seq("cell"), "left")
      .join(outs, Seq("cell"), "left")
      .join(ins, Seq("cell"), "left")
      .join(after, Seq("cell"), "left")
      .join(stats, Seq("cell"), "left")
      .select(col("cell").cast("long").as("cell"),
        coalesce(col("n_before"), lit(0L)).as("n_before"),
        coalesce(col("n_out"), lit(0L)).as("n_out"),
        coalesce(col("n_in"), lit(0L)).as("n_in"),
        coalesce(col("n_after"), lit(0L)).as("n_after"),
        col("mu0_micros"), col("shift"))
      .orderBy("cell")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count() // materialize the 64-row report, then drop the caches
    moved.unpersist()
    out
  }

  /** One Lloyd centroid update from an explicit (vec_id, cell)
    * assignment: per-cell means accumulate as 1e-6 fixed-point integers
    * (exact, associative — deterministic on any layout) and divide back
    * into doubles driver-side; cells with no members keep their pinned
    * centroid. The k×d collect is driver-sized by construction. Shared
    * by the batch recluster ([[reclusterApply]] inlines it alongside its
    * shift/mu0 accounting) and the streaming claim migration
    * (`EmbedDedupStream.migrateClaims` callers). */
  private[graft] def lloydCentroidUpdate(assigned: DataFrame,
      vectors: DataFrame, pinned: Array[Array[Double]]): Array[Array[Double]] = {
    val sums = assigned.join(vectors, "vec_id")
      .select(col("cell"), posexplode(col("v")).as(Seq("dim0", "x")))
      .select(col("cell"), (col("dim0") + 1).as("dim"),
        floor(col("x") * lit(1000000.0) + lit(0.5)).cast("long").as("qx"))
      .groupBy("cell", "dim")
      .agg(sum(col("qx")).as("sq"), count(lit(1)).as("n"))
      .collect()
    val byCell = sums.groupBy(_.getAs[Int]("cell"))
    pinned.zipWithIndex.map { case (cv, c) =>
      byCell.get(c).fold(cv) { rows =>
        val mu = new Array[Double](cv.length)
        rows.foreach(r => mu(r.getAs[Int]("dim") - 1) =
          r.getAs[Long]("sq").toDouble / 1000000.0 / r.getAs[Long]("n").toDouble)
        mu
      }
    }
  }

  private def overwriteCellsDynamic(spark: SparkSession, frame: DataFrame,
      store: String): Unit = {
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try frame.write.mode("overwrite").partitionBy("cell").parquet(store)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  private def dropCellDirs(spark: SparkSession, store: String,
      cells: Seq[Int]): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      java.net.URI.create("file:///"), spark.sparkContext.hadoopConfiguration)
    cells.foreach(c =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$store/cell=$c"), true))
  }

  /** CENTROID REFRESH — the recluster lifecycle end to end: build the
    * pinned-centroid store, consume the drift canary (it trips on this
    * corpus: a single pinned vector sits ~0.7 L2 from its members'
    * mean, well past the 0.5 threshold), migrate exactly the vectors whose max-cosine cell
    * changes under the one-Lloyd-update centroids, and report per cell.
    * The oracle replays the pinned assignment, the fixed-point means,
    * the re-assignment against the recomputed centroids, and the
    * migration counts — n_after comes from the REFRESHED store read
    * back from disk, so a cell leak, a missed migrant, or a stale
    * emptied directory flips a row red. */
  def annRecluster(spark: SparkSession, dir: String): DataFrame = {
    reclusterBuild(spark, dir)
    reclusterApply(spark, dir)
  }

  // ------------------------------------------ IVF delete (tombstones)

  private[graft] def ivfDeleteStore(dir: String): String =
    s"${stagedIvfDir(dir)}-delete/cells"

  /** BUILD phase of the delete lifecycle — the full corpus on the
    * pinned first-64 centroid artifact, in the delete store. */
  private[graft] def ivfDeleteBuild(spark: SparkSession, dir: String): String = {
    val e = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    ivfUpsertBuildWith(e, collectCentroids(e.filter(col("vec_id") < 64)),
      ivfDeleteStore(dir))
  }

  /** DELETE path — the GDPR shape for the cell-partitioned serving
    * store: the request carries only ids; their cells recompute from
    * the corpus vectors under the PINNED centroid artifact (exactly the
    * assignment the store was built with), the touched cells become a
    * LITERAL partition filter, survivors rewrite via anti-join, and the
    * commit is the same dynamic partition overwrite as
    * [[annIvfUpsert]] — untouched cell directories keep their exact
    * files, and a cell emptied by the delete drops its directory
    * explicitly. Rewrite volume is bounded by the touched cells. */
  private[graft] def ivfDeleteApply(spark: SparkSession, deleted: DataFrame,
      centroids: Array[Array[Double]], store: String): Unit = {
    val spark0 = spark
    import spark0.implicits._
    val delCells = assignCells(centroids, deleted, 1)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val touched = delCells.select("cell").distinct().as[Int].collect().sorted
    if (touched.isEmpty) { delCells.unpersist(); return }
    val rewritten = touchedCellRows(spark, store, touched.toSeq)
      .join(delCells.select("vec_id"), Seq("vec_id"), "left_anti")
      .localCheckpoint(true)
    delCells.unpersist()
    overwriteCellsDynamic(spark, rewritten, store)
    val kept = rewritten.select("cell").distinct().as[Int].collect().toSet
    dropCellDirs(spark, store, touched.filterNot(kept).toSeq)
  }

  /** IVF DELETE lifecycle: build the full-corpus pinned-centroid store,
    * remove the vec_id % 9 == 4 cohort (ids only — the vectors are
    * looked up for cell recomputation, never trusted for membership),
    * then serve from the post-delete store. The search shares the
    * staged-IVF oracle with the removed ids excluded on BOTH query and
    * neighbor sides while centroids stay pinned to the full build
    * corpus (deleting a centroid's source vector does not move the
    * cells — the index contract). Untouched-cell byte identity is
    * spec-asserted. */
  def annIvfDelete(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val store = ivfDeleteBuild(spark, dir)
    ivfDeleteApply(spark, e.filter(col("vec_id") % 9 === 4),
      collectCentroids(e.filter(col("vec_id") < 64)), store)
    spark.catalog.refreshByPath(store)
    searchStagedCells(spark, store)
  }

  /** PRODUCT-QUANTIZATION top-k — the byte-code scale path that completes
    * the compression ladder (full 64×8B → int8 64B → PQ 7B per vector):
    * the 64-dim space splits into m=8 subspaces of 8 dims, each with a
    * 128-codeword codebook, so a stored vector is 8 7-bit codes — the
    * FAISS IndexPQ layout (uniform-random embeddings are the PQ
    * worst case, hence 7 bits/subspace rather than the classic 4).
    * Codebook = the sub-vectors of the first 128 corpus vectors, a
    * deterministic m×128×8 driver artifact (the production refinement
    * is [[kmeansIterate]] per subspace — same plumbing, still a
    * driver-sized artifact). ENCODE is a narrow
    * mapPartitions: per subspace, nearest codeword by L2 with
    * lowest-code-id tie-break. SEARCH scores dot(query, reconstruct(codes))
    * — mathematically asymmetric-distance computation, since the dot
    * decomposes per subspace into the classic ADC lookup table; scoring
    * the reconstruction keeps the floating-point accumulation order
    * identical to the DuckDB oracle, so the whole index→encode→search
    * path is bit-for-bit checkable. Recall floor vs the exact baseline
    * is spec-asserted.
    *
    * At scale: codes shrink every shuffle/broadcast/storage payload ~73×;
    * the 20-query ranking is the same intentional broadcast brute-force
    * baseline as [[annBruteForce]] (at corpus scale the candidate set
    * would come from the IVF cell join — [[annIvfTopKQuantized]] shows
    * that composition). */
  def annPqTopK(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark0 = spark
    import spark0.implicits._
    val m = 8; val sub = 8; val kCodes = 128
    val e = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val seed: Array[Array[Double]] = e.filter(col("vec_id") < kCodes)
      .orderBy("vec_id").select("v").as[Seq[Double]].collect().map(_.toArray)
    // codebook[mm][cid] = the cid-th seed vector's mm-th 8-dim slice
    val codebook: Array[Array[Array[Double]]] =
      Array.tabulate(m, kCodes)((mm, cid) => seed(cid).slice(mm * sub, mm * sub + sub))
    // encode to 8 codes and reconstruct in one narrow pass — the stored
    // artifact at scale is (vec_id, codes); rv here feeds the scorer
    val recon = e.select("vec_id", "v").as[(Long, Seq[Double])].mapPartitions { it =>
      it.map { case (id, v) =>
        val arr = v.toArray
        val rv = new Array[Double](m * sub)
        var mm = 0
        while (mm < m) {
          var best = 0
          var bestD = Double.MaxValue
          var cid = 0
          while (cid < kCodes) {
            var d = 0.0
            var i = 0
            while (i < sub) {
              val diff = arr(mm * sub + i) - codebook(mm)(cid)(i)
              d += diff * diff
              i += 1
            }
            if (d < bestD) { bestD = d; best = cid } // ties keep lowest cid
            cid += 1
          }
          System.arraycopy(codebook(mm)(best), 0, rv, mm * sub, sub)
          mm += 1
        }
        (id, rv.toSeq)
      }
    }.toDF("vec_id", "rv")
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val scored = recon.select(col("vec_id").as("neighbor_id"), col("rv").as("nv"))
      .join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("qv"), col("nv")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select("query_id", "rank", "neighbor_id", "cos")
      .orderBy("query_id", "rank")
  }
}
