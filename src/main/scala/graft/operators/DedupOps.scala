package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
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
  private[graft] def shingles(n: Int): Column =
    when(size(col("toks")) < n, array().cast("array<string>"))
      .otherwise(array_distinct(expr(
        s"transform(sequence(0, size(toks) - $n), i -> array_join(slice(toks, i + 1, $n), ' '))")))

  private def withShingles(spark: SparkSession, dir: String): DataFrame =
    withShingles(Tables(spark, dir, "documents"))

  private def withShingles(docs: DataFrame): DataFrame =
    docs
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

  /** Cross-document shared-n-gram detection — the repeated-passage /
    * contamination primitive: for each document, the fraction of its
    * distinct trigram shingles that also occur in at least one other
    * document. Two key-shuffles (corpus-wide shingle counts, then the
    * join back to per-doc grain), both linear in total shingle volume —
    * never a doc×doc comparison, so a 100 TB corpus shards cleanly on
    * the shingle key. Docs too short to shingle are excluded. */
  def sharedNgrams(spark: SparkSession, dir: String): DataFrame = {
    // Materialize the slim (doc_id, sh) frame BEFORE the explode. Without
    // the cache barrier, InferFiltersFromGenerate derives a
    // `size(sh) > 0 AND sh IS NOT NULL` filter, pushes it to the scan
    // side, and evaluates the full interpreted shingle HOF chain several
    // times per row inside the un-eliminated conjuncts (measured 8 s of a
    // 12 s query — the round-1 MinHash recomputation pathology in filter
    // form). Cached arrays make that inferred filter a column reference.
    // The raw scan is repartitioned below the projection so the one real
    // shingle evaluation spreads across the cores, and the eager count
    // fills the cache before the two consumers (corpus-wide count + join
    // back) fan out.
    val shingled = withShingles(
        Tables(spark, dir, "documents")
          .repartition(spark.sparkContext.defaultParallelism, col("doc_id")))
      .select(col("doc_id"), col("sh"))
      // no explicit size(sh)>0 filter here: it would be pushed into the
      // cache-build plan where the filter re-derives the whole shingle
      // expression per row; explode already drops empty arrays, and the
      // generate's own inferred filter runs cheaply on the cached column
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    shingled.count()
    val x = shingled.select(col("doc_id"), explode(col("sh")).as("g"))
    val counts = x.groupBy("g").agg(countDistinct("doc_id").as("nd"))
    x.join(counts, "g")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("n_shared"))
      .withColumn("shared_frac",
        col("n_shared").cast("double") / col("n_shingles").cast("double"))
      .orderBy("doc_id")
  }

  /** Benchmark decontamination — the eval-set overlap check a training-data
    * build runs before shipping: flag corpus documents sharing word 5-grams
    * with any benchmark document. The eval set is planted by construction
    * (a 200-char excerpt of every 50th document, offset ids), so recall is
    * verifiable: every excerpt's source document must be flagged.
    *
    * Scale shape (100 TB corpus × small benchmark): corpus shingles explode
    * to (doc_id, shingle) and join the benchmark shingle set on the shingle
    * key — the benchmark side is tiny and broadcasts, so the check is one
    * narrow pass over the corpus plus one aggregation shuffle on doc_id;
    * never doc×doc, and corpus-side shingles are computed exactly once
    * (persisted slim frame, same barrier pattern as [[sharedNgrams]]). */
  /** The benchmark EVAL-SHINGLE SET — ONE construction site for every
    * consumer (decontaminateBloom/Spans, the streaming gates'
    * decontamination probe, the curation-flags contamination stage), so
    * the session cache is shared BY PLAN across all of them
    * ([[SharedStage]]: the CacheManager keys on the canonical plan —
    * two sites drifting by one expression silently stop sharing). The
    * eval docs spread across cores before the tokenize+shingle pass:
    * the benchmark slice reads as one input split, and the single-task
    * fill was the one multi-second stage left in several gate queries. */
  private[graft] def evalShingleSet(spark: SparkSession, dir: String): DataFrame =
    SharedStage.cached(Tables(spark, dir, "documents")
      .filter(col("doc_id") % 50 === 0)
      .repartition(spark.sparkContext.defaultParallelism)
      .select(expr("substring(text, 21, 200)").as("text"))
      .withColumn("toks", TextOps.tokens(col("text")))
      .withColumn("sh", shingles(5))
      .select(explode(col("sh")).as("g"))
      .distinct())

  def decontaminate(spark: SparkSession, dir: String): DataFrame = {
    // the corpus-shingle stage and the benchmark shingle set are SHARED
    // across the decontamination family (flag / bloom / spans) and stay
    // session-cached like every other family stage — [[SharedStage]]
    val corpus = SharedStage.cached(Tables(spark, dir, "documents")
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .withColumn("toks", TextOps.tokens(col("text")))
      .withColumn("sh", shingles(5))
      .select(col("doc_id"), col("sh")))
    val evalDocs = Tables(spark, dir, "documents")
      .filter(col("doc_id") % 50 === 0)
      .select((col("doc_id") + 2000000L).as("doc_id"),
        expr("substring(text, 21, 200)").as("text"))
      .withColumn("toks", TextOps.tokens(col("text")))
      .withColumn("sh", shingles(5))
      .select(col("doc_id").as("eval_id"), explode(col("sh")).as("g"))
    val hits = corpus.select(col("doc_id"), explode(col("sh")).as("g"))
      .join(broadcast(evalDocs), "g")
      .groupBy("doc_id")
      .agg(
        countDistinct(col("g")).as("n_overlap"),
        countDistinct(col("eval_id")).as("n_eval_docs"))
    corpus.filter(size(col("sh")) > 0)
      .select(col("doc_id"), size(col("sh")).cast("long").as("n_shingles"))
      .join(hits, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("n_shingles"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        coalesce(col("n_eval_docs"), lit(0L)).as("n_eval_docs"),
        (coalesce(col("n_overlap"), lit(0L)).cast("double") /
          col("n_shingles").cast("double")).as("overlap_frac"),
        (coalesce(col("n_overlap"), lit(0L)) >= 8).as("contaminated"))
      .orderBy("doc_id")
  }

  /** SPAN-LEVEL decontamination — the surgical variant of
    * [[decontaminate]]: instead of dropping a whole contaminated
    * document (wasteful for a long doc with one quoted benchmark
    * passage), excise exactly the overlapping token ranges. Every
    * POSITIONAL word 5-gram (duplicates kept — position matters here,
    * unlike the set-semantics flag pass) that occurs in the benchmark
    * shingle set marks tokens [i, i+4]; overlapping/adjacent marks merge
    * into maximal excision spans by the gaps-and-islands fold (the
    * [[dupSpans]] pattern): a span breaks where a hit position exceeds
    * the running max end + 1. Output is one row per excision span.
    *
    * Scale shape: positional shingles are a narrow posexplode off the
    * corpus scan, the benchmark probe is a broadcast join, and the
    * island fold is two windows partitioned BY DOC over only the hit
    * rows (benchmark-overlap-sized, tiny vs the corpus) — nothing wide
    * ever carries full documents. */
  def decontaminateSpans(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val evalSh = evalShingleSet(spark, dir)
    val pos = Tables(spark, dir, "documents")
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .withColumn("toks", TextOps.tokens(col("text")))
      .filter(size(col("toks")) >= 5)
      .select(col("doc_id"), posexplode(expr(
        "transform(sequence(0, size(toks) - 5), i -> array_join(slice(toks, i + 1, 5), ' '))")))
      .toDF("doc_id", "i", "g")
    val hits = pos.join(broadcast(evalSh), Seq("g"))
      .select(col("doc_id"), col("i")).distinct()
    val wPrev = Window.partitionBy("doc_id").orderBy("i")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy("doc_id").orderBy("i")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = hits
      .withColumn("prev_end", max(col("i") + 4).over(wPrev))
      .withColumn("flag",
        when(col("prev_end").isNull || col("i") > col("prev_end") + 1, 1L).otherwise(0L))
      .withColumn("island", sum(col("flag")).over(wRun))
      .groupBy("doc_id", "island")
      .agg(min(col("i")).cast("long").as("span_start"),
        (max(col("i")) + 4).cast("long").as("span_end"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1L).as("n_tokens_removed"))
      .orderBy("doc_id", "span_start")
      .persist(StorageLevel.MEMORY_AND_DISK)
    out.count()
    out
  }

  /** CONTAINMENT dedup — the asymmetric near-dup case Jaccard-based
    * MinHash structurally misses: a short document embedded verbatim in a
    * much longer one has Jaccard ≈ |short|/|long| (tiny, never crosses an
    * 0.8 band threshold) but containment |A∩B|/|A| ≈ 1. Quote farms,
    * syndicated excerpts, and chunk-level re-publication all look like
    * this, so a dedup pass that only checks symmetric similarity ships
    * the duplicates. Scored here as distinct-5-gram containment of the
    * smaller side, in exact integer ppm.
    *
    * Candidate generation is the usual bucket equi-join on the shingle
    * key (fragment shingles × corpus shingles), never fragment×doc —
    * shuffle volume is linear in total shingle count, sharded cleanly by
    * the 5-gram key at 100 TB; the per-pair score then reads only the
    * joined rows. The LSH hot-bucket-cap discipline applies to the join
    * key: a shingle's corpus document frequency is counted first
    * (map-side-combined agg; the over-cap set is boilerplate-sized, so
    * it broadcasts), and shingles in more than `maxShingleDf` documents
    * are dropped before the join — a corpus-wide boilerplate 5-gram
    * would otherwise make one key's join output quadratic
    * (|frag-side| × |corpus-side|), and a shingle present in thousands
    * of documents carries no containment signal anyway. The oracle
    * replays the cap rule, so the gate covers the capped semantics.
    * Fixture: every 10th document contributes a fragment of
    * its tokens 5..44 (token-aligned, so every fragment shingle occurs
    * in its source and the planted pair scores exactly 1000000 ppm —
    * spec-proven recall). */
  def containmentDedup(spark: SparkSession, dir: String,
      maxShingleDf: Long = 256L): DataFrame =
    containmentPairs(
      Tables(spark, dir, "documents")
        .repartition(spark.sparkContext.defaultParallelism, col("doc_id")),
      maxShingleDf)

  /** [[containmentDedup]]'s core over an explicit (doc_id, text) corpus —
    * exposed so specs can plant a boilerplate shingle and assert the DF
    * cap bounds the join. */
  private[graft] def containmentPairs(docs: DataFrame,
      maxShingleDf: Long): DataFrame = {
    val base = docs
      .withColumn("toks", TextOps.tokens(col("text")))
    val corpusSh = base
      .withColumn("sh", shingles(5))
      .select(col("doc_id").as("src_id"), col("sh"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    corpusSh.count()
    val fragSh = base.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 3000000L).as("frag_id"),
        expr("slice(toks, 5, 40)").as("toks"))
      .withColumn("sh", shingles(5))
      .select(col("frag_id"), col("sh"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    fragSh.count()
    val corpusG = corpusSh.select(col("src_id"), explode(col("sh")).as("g"))
    // DF cap: shingle sets are per-doc distinct, so DF(g) = count(g).
    // The over-cap set is tiny (boilerplate only) — broadcast anti-join.
    val hot = corpusG.groupBy("g").agg(count(lit(1)).as("df"))
      .filter(col("df") > maxShingleDf).select("g")
    val out = fragSh
      .select(col("frag_id"), size(col("sh")).cast("long").as("n_frag"),
        explode(col("sh")).as("g"))
      .join(corpusG.join(broadcast(hot), Seq("g"), "left_anti"), Seq("g"))
      .groupBy("frag_id", "n_frag", "src_id")
      .agg(countDistinct(col("g")).as("n_shared"))
      .filter(col("n_shared") >= 3)
      .withColumn("containment_ppm", expr("n_shared * 1000000L div n_frag"))
      .select(col("frag_id"), col("src_id"), col("n_shared"), col("n_frag"),
        col("containment_ppm"),
        (col("containment_ppm") >= 600000L).as("contained"))
      .orderBy("frag_id", "src_id")
      .persist(StorageLevel.MEMORY_AND_DISK)
    out.count() // materialize the pair verdicts, then drop the fat caches
    corpusSh.unpersist()
    fragSh.unpersist()
    out
  }

  /** Bloom-prefiltered twin of [[decontaminate]] — the 100 TB shape of
    * the benchmark-overlap check. [[decontaminate]] joins EVERY corpus
    * shingle against the benchmark set; at corpus scale that shuffle/probe
    * stream is billions of rows of which almost none hit. Here a Bloom
    * filter built over the benchmark shingles (scalar subquery, the
    * `InjectRuntimeFilter` expression pair — no UDF, no driver-side
    * filter bytes in the plan) gates the exploded corpus shingles BEFORE
    * the join: ~99% of shingles die inside the codegen'd scan stage and
    * never reach the exact verify join, so the verify join's probe side
    * shrinks from |corpus shingles| to |hits| + 1% false positives. The
    * exact broadcast join then removes the false positives — the final
    * answer is identical to the exact pass (same contamination rule:
    * ≥8 distinct shared word 5-grams), the bloom only prices the path.
    *
    * Output: every doc sharing ≥1 benchmark shingle, with its overlap
    * count and verdict (reference analog: the before-shipping eval-set
    * leak audit; same planted-excerpt fixture as [[decontaminate]]). */
  def decontaminateBloom(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge.{analyzedPlan, column, expression}
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, ScalarSubquery, XxHash64}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.util.sketch.BloomFilter
    val evalSh = evalShingleSet(spark, dir)
    val nEval = math.max(evalSh.count(), 1L)
    val bloomDF = evalSh.select(column(
      new BloomFilterAggregate(
        new XxHash64(Seq(expression(col("g")))),
        Literal(nEval),
        Literal(BloomFilter.optimalNumOfBits(nEval, 0.01))
      ).toAggregateExpression()).as("bloom"))
    val mightContain = column(BloomFilterMightContain(
      ScalarSubquery(analyzedPlan(bloomDF)),
      new XxHash64(Seq(expression(col("g"))))))
    // cache barrier before the explode+filter: without it,
    // InferFiltersFromGenerate pushes derived conjuncts below the
    // projection and the interpreted shingle HOF chain re-evaluates per
    // row (the sharedNgrams pathology — measured 15x here)
    val corpus = SharedStage.cached(Tables(spark, dir, "documents")
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .withColumn("toks", TextOps.tokens(col("text")))
      .withColumn("sh", shingles(5))
      .select(col("doc_id"), col("sh")))
    val out = corpus
      .select(col("doc_id"), explode(col("sh")).as("g"))
      .filter(mightContain) // bloom gate: kills ~99% before the join
      .join(broadcast(evalSh), Seq("g")) // exact verify removes bloom FPs
      .groupBy("doc_id")
      .agg(countDistinct(col("g")).as("n_overlap"))
      .select(col("doc_id"), col("n_overlap"),
        (col("n_overlap") >= 8).as("contaminated"))
      .orderBy("doc_id")
      .persist(StorageLevel.MEMORY_AND_DISK)
    // materialize the small verdict; the corpus/eval family stages stay
    // session-cached by the SharedStage contract
    out.count()
    out
  }

  // ---- deterministic 64-bit hashing for MinHash permutations ----
  // Signature hashes only affect candidate *recall* (the emitted pairs are
  // exact Jaccard on candidates, oracle-checked), so a cheap FNV-1a +
  // splitmix64 pipeline is used instead of interpreted-HOF xxhash64 — the
  // round-1 pathology recomputed that expression ~16x per doc (1524 s at
  // sf0.1).

  private def fnv64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i); h *= 0x100000001b3L; i += 1 }
    h
  }

  private def splitmix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private val NumPerms = 32
  private val NumBands = 16 // 16 bands x 2 rows: P(miss | J>=0.8) = 0.36^16 ~ 8.5e-8

  /** 32-perm MinHash signature folded into 16 band hashes (2 rows/band),
    * computed imperatively once per document. */
  private[operators] def bandHashes(sh: Seq[String]): Array[Long] = {
    val sig = Array.fill(NumPerms)(Long.MaxValue)
    sh.foreach { s =>
      val h = fnv64(s)
      var i = 0
      while (i < NumPerms) {
        val v = splitmix64(h + (i + 1) * 0x9e3779b97f4a7c15L)
        if (v < sig(i)) sig(i) = v
        i += 1
      }
    }
    val rows = NumPerms / NumBands
    Array.tabulate(NumBands) { b =>
      var bh = 1125899906842597L
      var j = 0
      while (j < rows) { bh = splitmix64(bh ^ sig(b * rows + j)); j += 1 }
      bh
    }
  }

  /** Documents plus planted near-dup twins: every 10th doc re-appears as
    * id + 1,000,000 with its last 20 chars truncated (trigram Jaccard
    * ~0.9 against the parent), so candidate recall is 1.0 by construction
    * for both the MinHash and SimHash paths. */
  private def docsWithTwins(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables(spark, dir, "documents").select(col("doc_id"), col("text"))
    base.union(base.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        expr("substring(text, 1, length(text) - 20)").as("text")))
  }

  /** MinHash+LSH near-dup pairs: signatures once per doc (typed map, no
    * expression recomputation), band bucket equi-join on slim
    * (doc_id, band, band_hash) rows only, exact-Jaccard verification on
    * deduped candidate id-pairs.
    *
    * Scale shape (100 TB): one shuffle to spread the scan, one on the band
    * key, one on the candidate pair — shuffled payloads are ids and 64-bit
    * hashes; the fat shingle arrays stay in the persisted stage and are
    * joined back only for the (tiny) candidate set. At cluster scale the
    * persisted stage becomes a staged parquet write. */
  def minhashLshPairs(spark: SparkSession, dir: String): DataFrame =
    minhashLshPairsWithCorpus(spark, dir)._2

  /** [[minhashLshPairs]] plus the persisted slim (doc_id, text) corpus it
    * builds internally — so downstream verify tiers ([[editDistVerify]])
    * can fetch candidate texts from the already-cached stage instead of
    * re-deriving the twin corpus per join side. */
  private[graft] def minhashLshPairsWithCorpus(
      spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val spark0 = spark
    import spark0.implicits._
    // Repartition off the single-file scan and persist the SLIM
    // (doc_id, text) rows first: the persist is a pushdown barrier, so
    // the expensive tokenize+shingle projection below is evaluated above
    // the exchange, spread over all partitions. (Without the barrier
    // Catalyst pushes the projection below the repartition and the whole
    // shingle build runs on the 1-2 scan partitions of the single-file
    // input; the partition count is explicit because AQE sizes by
    // shuffle bytes, which are tiny here relative to the compute.)
    // the stage is SHARED across the near-dup query family (pairs,
    // groups, keep-best, edit-distance verify) — [[SharedStage.cached]]
    val spread = SharedStage.cached(docsWithTwins(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id")),
      eager = false)
    // derived above the cache (so the barrier holds) and persisted once,
    // filled in ONE job before fan-out: the band join's two sides and
    // the two verify-join sides otherwise race to fill it and each
    // recomputes the full tokenize+shingle pass (measured 4x)
    val shingled = SharedStage.cached(spread
      .withColumn("toks", TextOps.tokens(col("text")))
      .withColumn("sh", shingles(3))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), col("sh")))
    val bands = shingled.as[(Long, Seq[String])]
      .mapPartitions(_.flatMap { case (id, sh) =>
        val bh = bandHashes(sh)
        Iterator.tabulate(bh.length)(b => (id, b, bh(b)))
      })
      .toDF("doc_id", "band", "band_hash")
    val l = bands.select(col("band"), col("band_hash"), col("doc_id").as("doc_a"))
    val r = bands.select(col("band"), col("band_hash"), col("doc_id").as("doc_b"))
    val pairs = l.join(r, Seq("band", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .dropDuplicates("doc_a", "doc_b")
    val verified = pairs
      .join(shingled.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(shingled.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .select(
        col("doc_a"), col("doc_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= 0.8)
      .orderBy("doc_a", "doc_b")
    (spread, verified)
  }

  /** Near-duplicate GROUPS: connected components over the verified
    * MinHash pair set, by iterative min-label propagation — each doc's
    * canonical id is the smallest doc_id reachable through near-dup
    * pairs, i.e. the survivor a dedup pass would keep.
    *
    * Scale shape: the loop is the standard large-graph CC pattern (one
    * shuffle per iteration on doc_id; iterations ~ component diameter,
    * which for near-dup clusters is small). The driver only sees the
    * convergence count, never the data. */
  def nearDupGroups(spark: SparkSession, dir: String): DataFrame =
    connectedComponents(minhashLshPairs(spark, dir).select("doc_a", "doc_b"))
      .orderBy("doc_id")

  /** Canonical SELECTION policy over the near-dup groups: instead of
    * min-id-wins, keep the highest-quality member (type-token ratio,
    * doc_id as the deterministic tie-break) — the "keep the best copy"
    * step a real dedup pass applies before dropping the rest. One extra
    * shuffle on the (tiny) group id beyond the group computation. */
  def nearDupKeepBest(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val quality = docsWithTwins(spark, dir)
      .withColumn("toks", TextOps.tokens(col("text")))
      .select(col("doc_id"),
        (size(array_distinct(col("toks"))).cast("double") /
          size(col("toks")).cast("double")).as("ttr"))
    val w = Window.partitionBy("canonical_id").orderBy(col("ttr").desc, col("doc_id"))
    nearDupGroups(spark, dir)
      .join(quality, "doc_id")
      .withColumn("rk", row_number().over(w))
      .groupBy("canonical_id")
      .agg(
        count(lit(1)).as("n_members"),
        max(when(col("rk") === 1, col("doc_id"))).as("keep_doc_id"),
        max(when(col("rk") === 1, col("ttr"))).as("keep_ttr"))
      .orderBy("canonical_id")
  }

  /** Byte-level EDIT-DISTANCE confirmation over the verified MinHash pair
    * set — the strictest dedup verdict. Shingle Jaccard is
    * order-insensitive (a reshuffled document keeps its shingle bag);
    * edit similarity is not — so a fuzzy-dedup pass that must not drop
    * reordered-but-distinct documents re-verifies its candidates at the
    * byte level (1 − levenshtein/max_len ≥ 0.8, each pair's verdict
    * reported either way).
    *
    * Scale shape: the O(len²) levenshtein runs ONLY on the pairs the
    * band index + Jaccard gate already admitted — never on a corpus
    * cross product — plus one narrow join per side to fetch the two
    * texts; the same candidates-then-verify stack as every dedup path
    * here, with one more (strictly cheaper) verify tier on top. The
    * oracle inherits q_minhash_lsh's brute-force pair set and applies
    * the identical levenshtein arithmetic. */
  def editDistVerify(spark: SparkSession, dir: String): DataFrame = {
    // both text-fetch join sides read the pair pipeline's persisted
    // (doc_id, text) stage — the twin corpus is built and cached once
    val (texts, pairs) = minhashLshPairsWithCorpus(spark, dir)
    pairs
      .join(texts.select(col("doc_id").as("doc_a"), col("text").as("text_a")), "doc_a")
      .join(texts.select(col("doc_id").as("doc_b"), col("text").as("text_b")), "doc_b")
      .withColumn("dist", levenshtein(col("text_a"), col("text_b")).cast("long"))
      .withColumn("mx",
        greatest(length(col("text_a")), length(col("text_b"))).cast("long"))
      .select(col("doc_a"), col("doc_b"), col("jaccard"), col("dist"),
        // integer ppm similarity and an integer-exact 0.8 threshold
        // (dist*5 <= mx ⟺ 1 - dist/mx >= 0.8) — no float compare at the
        // boundary, no round(double, 6) decimal-tie hazard
        expr("(mx - dist) * 1000000L div mx").as("edit_sim_ppm"),
        expr("dist * 5L <= mx").as("confirmed"))
      .orderBy("doc_a", "doc_b")
  }

  /** Min-label propagation with pointer jumping over an undirected pair
    * set: (doc_id, canonical_id) where canonical is the component
    * minimum. Each round takes the min over neighbors' labels, then
    * shortcuts label -> label-of-label, so chains converge in O(log
    * diameter) rounds instead of O(diameter); one persisted frame and at
    * most ONE action per round (the convergence count — skipped in round
    * 1, which always changes), nothing on the driver. */
  /** Partition count for the CC loop state: enough tasks that no task
    * holds more than `rowsPerTask` edges, floored at 4 so tiny graphs
    * still parallelize past a single core. At bench scale (thousands of
    * edges) this lands on the floor and per-round driver dispatch stays
    * cheap; a billion-pair corpus gets pair-count-proportional tasks
    * instead of serializing every round through 4. */
  private[graft] def ccPartitions(edgeCount: Long, rowsPerTask: Long): Int =
    math.max(4L, (edgeCount + rowsPerTask - 1) / rowsPerTask).toInt

  private[graft] def connectedComponents(
      pairs: DataFrame, rowsPerTask: Long = 2000000L): DataFrame = {
    // The loop state is |near-dup docs|-sized — orders of magnitude
    // smaller than the corpus — so size its partitioning to that volume
    // rather than inheriting the corpus-wide partition count: every round
    // dispatches tasks per cached partition, and at bench scale the
    // dispatch would dominate the (tiny) per-round work. The volume is
    // not known until the candidate pipeline runs, so persist first, let
    // the count fill the cache, then coalesce the cached frame down to a
    // count-derived layout (coalesce on a cached frame is a narrow read —
    // never a recompute, never a shuffle).
    // Both directions come from ONE pass over the pair set (explode, not
    // union-of-swapped): a union's branches would each execute the whole
    // upstream candidate pipeline, racing to populate its caches before
    // they exist — measured as the full signature build running twice.
    val exploded = pairs.toDF("src", "dst")
      .select(explode(array(
        struct(col("src"), col("dst")),
        struct(col("dst").as("src"), col("src").as("dst")))).as("e"))
      .select("e.src", "e.dst")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val parts = ccPartitions(exploded.count(), rowsPerTask)
    // upstream partitioning is data-proportional already, so only ever
    // narrow down to `parts`; never shuffle up
    val edges =
      if (parts < exploded.rdd.getNumPartitions) exploded.coalesce(parts)
      else exploded
    var labels = edges.select(col("src").as("doc_id")).distinct()
      .withColumn("label", col("doc_id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < 25) {
      val viaNeighbor = edges.join(labels, edges("src") === labels("doc_id"))
        .groupBy(col("dst").as("doc_id")).agg(min(col("label")).as("nlabel"))
      val stepped = labels.join(viaNeighbor, Seq("doc_id"), "left")
        .select(col("doc_id"), col("label").as("old"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
      // localCheckpoint truncates the lineage — without it every round
      // re-analyzes a plan that grows with the iteration count, and the
      // driver, not the executors, becomes the bottleneck
      val jumped = stepped
        .join(stepped.select(col("doc_id").as("label"), col("label").as("ll")),
          Seq("label"), "left")
        .select(col("doc_id"), col("old"),
          least(col("label"), coalesce(col("ll"), col("label"))).as("label"))
        .localCheckpoint(false) // lazy: the convergence count below is
                                // the one job that materializes the round
      // Round 1 always changes when any edge exists (every pair member
      // adopts the smaller id), so its convergence count is a wasted job
      // — defer it and let round 2's count materialize both rounds. For
      // the common near-dup shape (small-diameter clusters) this halves
      // the number of driver-scheduled jobs in the loop.
      if (iter > 0) changed = jumped.filter(col("label") =!= col("old")).count()
      labels.unpersist()
      labels = jumped
      iter += 1
    }
    exploded.unpersist()
    labels.select(col("doc_id"), col("label").as("canonical_id"))
  }

  /** Near-dup admission GATE — the training-pipeline shape the pairwise
    * dedup is not: a batch of INCOMING documents is checked against an
    * EXISTING corpus index and each doc gets an admit/reject verdict with
    * its best-matching corpus doc. Candidates come from the same MinHash
    * band join (incoming bands ⋈ corpus bands — never incoming × corpus),
    * verification is exact Jaccard on the candidate set only.
    *
    * Scale shape: the corpus side's band index is buildable once and
    * staged (at 100 TB it IS the staged artifact, refreshed as the corpus
    * grows); each incoming batch shuffles |batch|×16 slim band rows plus
    * the (tiny) candidate set. Nothing pairwise, nothing driver-side. */
  /** Shingle index for one side of the gate: spread the source rows,
    * shingle once, persist, and fill the cache in ONE job before the
    * multi-consumer fan-out (band join + verify join both read it). The
    * `spread` persist is the pushdown BARRIER, not a cache: without it
    * Catalyst pushes the shingle projection below the repartition and
    * the whole compute runs on the source's 1-2 scan partitions (the
    * round-1 minhash pathology — reinstated after it re-cost ~2 s/query
    * when dropped). It is released as soon as the shingle cache is
    * filled, so only the slim (doc_id, sh) frame outlives this call;
    * the caller owns that frame's unpersist. */
  private[graft] def gateShingles(docs: DataFrame): DataFrame = {
    val spread = docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism, col("doc_id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val sh = spread
      .withColumn("toks", TextOps.tokens(col("text")))
      .withColumn("sh", shingles(3))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), col("sh"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    sh.count()
    spread.unpersist() // barrier job done — drop the text copy
    sh
  }

  def dedupGateFrames(corpus: DataFrame, incoming: DataFrame): DataFrame = {
    val cSh = gateShingles(corpus)
    try dedupGateOnIndex(cSh, incoming)
    finally cSh.unpersist()
  }

  /** Gate a batch of incoming docs against a PRE-BUILT (persisted) corpus
    * shingle index — the streaming entry point: the corpus index lives
    * across micro-batches (its lifecycle belongs to the stream), the
    * incoming side's cache is scoped to this call, and the returned
    * verdict frame is already materialized (persisted + counted, it is
    * |incoming| rows), so callers may unpersist it once sunk. */
  private[graft] def dedupGateOnIndex(cSh: DataFrame, incoming: DataFrame): DataFrame = {
    val iSh = gateShingles(incoming)
    try dedupGateScored(cSh, iSh, incoming)
    finally iSh.unpersist()
  }

  /** (doc_id, band, band_hash) fan-out of a (doc_id, sh) shingle index —
    * the MinHash-LSH candidate keying, computed imperatively once per
    * document. Exposed so the accreting stream gate can PERSIST the
    * static corpus side's band rows across micro-batches and lay its
    * admitted-doc side store out on the band-hash probe key, instead of
    * recomputing/rescanning per batch. */
  private[graft] def bandRows(sh: DataFrame): DataFrame = {
    val spark0 = sh.sparkSession
    import spark0.implicits._
    sh.as[(Long, Seq[String])]
      .mapPartitions(_.flatMap { case (id, s) =>
        val bh = bandHashes(s)
        Iterator.tabulate(bh.length)(b => (id, b, bh(b)))
      })
      .toDF("doc_id", "band", "band_hash")
  }

  /** Candidate pairs from the band-keyed equi-join: incoming band rows
    * vs corpus band rows, slim (in_id, corpus_id) out. `maxBandFreq` is
    * the hot-key guard (the perceptual joins' capHotKeys discipline): a
    * corpus full of identical boilerplate piles one (band, band_hash)
    * key with N rows and yields N×|batch| candidates for that key —
    * over-cap keys drop WHOLE (bounded recall loss on pathological keys
    * for a hard bound on candidate volume). Off (None) in the oracle
    * queries — the fixtures are boilerplate-free. */
  private[graft] def gateCandidates(iBands: DataFrame, cBands: DataFrame,
      maxBandFreq: Option[Long] = None): DataFrame =
    iBands
      .select(col("band"), col("band_hash"), col("doc_id").as("in_id"))
      .join(graft.operators.MultimodalOps.capHotKeys(
        cBands.select(col("band"), col("band_hash"),
          col("doc_id").as("corpus_id")),
        Seq("band", "band_hash"), maxBandFreq),
        Seq("band", "band_hash"))
      .select("in_id", "corpus_id")
      .dropDuplicates("in_id", "corpus_id")

  /** The gate kernel over two PRE-BUILT (persisted) shingle indexes; the
    * caller owns both indexes' lifecycles — the accreting stream keeps
    * the batch's shingles to fold admitted docs into the corpus index.
    * Returns the verdict frame already materialized. */
  private[graft] def dedupGateScored(
      cSh: DataFrame, iSh: DataFrame, incoming: DataFrame): DataFrame =
    gateVerdicts(
      gateCandidates(bandRows(iSh), bandRows(cSh)),
      iSh,
      cSh.select(col("doc_id").as("corpus_id"), col("sh").as("sh_c")),
      incoming)

  /** Exact-Jaccard verify + per-incoming verdict over candidate pairs:
    * `cShById` supplies the corpus side's shingle sets keyed by
    * corpus_id (the full index for the batch gate; a probe-key-pruned
    * store read for the accreting stream). Returns the verdict frame
    * already materialized. */
  private[graft] def gateVerdicts(candidates: DataFrame, iSh: DataFrame,
      cShById: DataFrame, incoming: DataFrame): DataFrame = {
    val verified = candidates
      .join(iSh.select(col("doc_id").as("in_id"), col("sh").as("sh_i")), "in_id")
      .join(cShById, "corpus_id")
      .select(col("in_id"), col("corpus_id"),
        (size(array_intersect(col("sh_i"), col("sh_c"))).cast("double") /
          size(array_union(col("sh_i"), col("sh_c"))).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= 0.8)
    // per-incoming verdict: best match by (jaccard desc, corpus_id asc)
    val matches = verified
      .groupBy(col("in_id").as("doc_id"))
      .agg(
        count(lit(1)).as("n_matches"),
        max(struct(col("jaccard"), (-col("corpus_id")).as("neg_id"))).as("best"))
      .select(col("doc_id"), col("n_matches"),
        (-col("best.neg_id")).cast("long").as("best_match"),
        col("best.jaccard").as("best_jaccard"))
    val verdict = incoming.select(col("doc_id"))
      .join(matches, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("n_matches").isNotNull, "reject").otherwise("admit").as("decision"),
        coalesce(col("n_matches"), lit(0L)).as("n_matches"),
        coalesce(col("best_match"), lit(0L)).as("best_match"),
        coalesce(col("best_jaccard"), lit(0.0)).as("best_jaccard"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // materialize the verdict while both shingle caches are hot
    verdict.count()
    verdict
  }

  /** Oracle-gated gate query: corpus = the documents table; incoming =
    * the truncated twins of every 10th doc (near-dups → reject) plus
    * reversed copies of every (10k+5)th doc (novel shingles → admit). */
  def dedupGate(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables(spark, dir, "documents").select(col("doc_id"), col("text"))
    val incoming = base.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        expr("substring(text, 1, length(text) - 20)").as("text"))
      .union(base.filter(col("doc_id") % 10 === 5)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          reverse(col("text")).as("text")))
    dedupGateFrames(base, incoming).orderBy("doc_id")
  }

  /** Paragraph-level exact dedup — the CCNet/C4 line-dedup shape: split
    * each document into paragraphs, keep only the FIRST corpus-wide
    * occurrence of each paragraph (order by (doc_id, position) — the
    * deterministic survivor a re-run reproduces), and report per
    * document how much of it survived. Boilerplate (headers, cookie
    * banners, license blocks) dies here before any near-dup pass runs.
    *
    * The fixture's documents carry no newlines, so the splitter is a
    * fixed 12-token chunking; in production it is the '\n\n' split and
    * everything downstream is identical.
    *
    * Scale shape: explode to (paragraph, doc, pos) rows, ONE shuffle on
    * the paragraph key for the first-occurrence window, one on doc_id
    * for the rollup. The paragraph text itself is the window key here
    * for oracle exactness; at 100 TB the key is its 128-bit hash and
    * the window a min-aggregate + join, same plan shape. */
  def paragraphDedup(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val p = 12
    // slim tokenized frame behind a cache barrier: the explode below
    // derives its range AND the slice from `toks`, and without the
    // barrier the tokenize HOF is re-evaluated per consumer expression
    // (the round-1 shared-ngrams pathology)
    val tok = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .withColumn("toks", TextOps.tokens(col("text")))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"), col("toks"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    tok.count()
    val paras = tok
      .select(col("doc_id"), col("toks"),
        explode(expr(s"sequence(0, cast(ceil(size(toks) / $p.0) as int) - 1)")).as("pos"))
      .select(col("doc_id"), col("pos"),
        expr(s"array_join(slice(toks, pos * $p + 1, $p), ' ')").as("para"))
    val w = Window.partitionBy("para").orderBy("doc_id", "pos")
    val out = paras.withColumn("rn", row_number().over(w))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_paras"),
        sum(when(col("rn") === 1, 1L).otherwise(0L)).as("n_kept"))
      .select(col("doc_id"), col("n_paras"), col("n_kept"),
        (col("n_kept").cast("double") / col("n_paras").cast("double")).as("kept_frac"))
      .orderBy("doc_id")
      .persist(StorageLevel.MEMORY_AND_DISK)
    out.count() // materialize the |docs|-row report, then drop the fat cache
    tok.unpersist()
    out
  }

  /** Exact-duplicate membership gate with a BLOOM pre-filter — the cheap
    * front door before any join: aggregate a Bloom filter over the
    * corpus's text fingerprints with Spark's NATIVE
    * `BloomFilterAggregate` (one distributed pass, mergeable sketch),
    * hand it to the probe side as a scalar subquery, and drop every
    * incoming doc `BloomFilterMightContain` rules out (no shuffle at all
    * for the novel majority) before a semi-join verifies the survivors —
    * so false positives cannot leak into the verdict; the result is
    * EXACT, the bloom only prices the fast path.
    *
    * This is exactly the expression pair Catalyst's own
    * `InjectRuntimeFilter` plants (subquery-fed bloom build + codegen'd
    * `might_contain` probe over `xxhash64`): no UDF, no driver-side
    * filter construction, no plan-embedded filter bytes — the subquery
    * result is computed once by the engine and shipped like any other
    * subquery scalar.
    *
    * Scale: ~1.2 GB of bits per 10^9 keys at 1% fpp (raise
    * `spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold`-
    * family caps accordingly); beyond that, shard the filter by
    * fingerprint prefix and probe the shard, same plan shape. Incoming
    * fixture: verbatim copies of every 10th doc (dups) + reversed text
    * of every (10k+5)th (novel). */
  def exactGateBloom(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge.{analyzedPlan, column, expression}
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, ScalarSubquery, XxHash64}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.util.sketch.BloomFilter
    val docs = Tables(spark, dir, "documents").select(col("doc_id"), col("text"))
    val incoming = docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      .union(docs.filter(col("doc_id") % 10 === 5)
        .select((col("doc_id") + 2000000L).as("doc_id"), reverse(col("text")).as("text")))
    // one corpus scan: the fingerprint frame is cached once and feeds
    // the count, the bloom aggregation, and the verify semi-join —
    // uncached this is 3x the corpus I/O and hashing
    val corpusFp = docs.select(md5(col("text")).as("fp"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nCorpus = math.max(corpusFp.count(), 1L)
    val bloomDF = corpusFp.select(column(
      new BloomFilterAggregate(
        new XxHash64(Seq(expression(col("fp")))),
        Literal(nCorpus),
        Literal(BloomFilter.optimalNumOfBits(nCorpus, 0.01))
      ).toAggregateExpression()).as("bloom"))
    val mightContain = column(BloomFilterMightContain(
      ScalarSubquery(analyzedPlan(bloomDF)),
      new XxHash64(Seq(expression(col("fp"))))))
    val inc = incoming.select(col("doc_id"), md5(col("text")).as("fp"))
    val verified = inc.filter(mightContain)
      .join(corpusFp.distinct(), Seq("fp"), "left_semi")
    val out = inc
      .join(verified.select(col("doc_id"), lit(1L).as("hit")), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("hit"), lit(0L)).as("is_dup"))
      .orderBy("doc_id")
      .persist(StorageLevel.MEMORY_AND_DISK)
    out.count() // materialize the small verdict, then drop the fat cache
    corpusFp.unpersist()
    out
  }

  /** SimHash core: (doc_id, simhash, bucket) over an input with doc_id +
    * text. The token hash is the first 15 hex chars of md5 (60 bits,
    * always positive) so the DuckDB oracle reproduces it exactly; hashes
    * are computed as codegen'd column expressions, only the bit-vote runs
    * in a typed map. */
  private def simhashOf(spark: SparkSession, docs: DataFrame): DataFrame = {
    val spark0 = spark
    import spark0.implicits._
    val hashed = docs
      .withColumn("toks", TextOps.tokens(col("text")))
      .withColumn("th", expr(
        "transform(array_distinct(toks), t -> cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint))"))
      .select(col("doc_id"), col("th")).as[(Long, Seq[Long])]
    hashed.map { case (id, hs) =>
      var sh = 0L
      var b = 0
      while (b < 60) {
        var vote = 0
        hs.foreach(h => vote += (if (((h >>> b) & 1L) == 1L) 1 else -1))
        if (vote > 0) sh |= (1L << b)
        b += 1
      }
      (id, sh, sh >>> 44)
    }.toDF("doc_id", "simhash", "bucket")
  }

  /** Cross-signal dedup agreement — the three near-dup signals (word
    * n-gram Jaccard, SimHash Hamming distance, embedding cosine) side by
    * side on the deterministic consecutive-pair probe set, with a
    * majority vote. Real ensemble dedup thresholds one signal and
    * verifies with another; this query is that calibration table. Each
    * signal is a narrow per-pair kernel; the three pair frames co-join
    * on the pair id. */
  def dedupSignals(spark: SparkSession, dir: String): DataFrame = {
    val jac = ngramJaccard(spark, dir) // doc_a, doc_b, jaccard
    val sim = simhashOf(spark, Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text")))
    val ham = sim.select(col("doc_id").as("doc_a"), col("simhash").as("sim_a"))
      .join(sim.select((col("doc_id") - 1).as("doc_a"), col("simhash").as("sim_b")),
        "doc_a")
      .select(col("doc_a"),
        graft.functions.HammingDistance.hamming(col("sim_a"), col("sim_b"))
          .cast("int").as("hamming"))
    val cos = SimilarityOps.pairCosine(spark, dir)
      .select(col("id_a").as("doc_a"), col("cos"))
    jac.join(ham, "doc_a").join(cos, "doc_a")
      .select(col("doc_a"), col("doc_b"), col("jaccard"), col("hamming"), col("cos"),
        ((col("jaccard") >= 0.8).cast("long") + (col("hamming") <= 10).cast("long") +
          (col("cos") >= 0.95).cast("long")).as("dup_votes"))
      .orderBy("doc_a")
  }

  /** 60-bit SimHash + high-16 bucket per document. */
  def simhashBuckets(spark: SparkSession, dir: String): DataFrame =
    simhashOf(spark, Tables(spark, dir, "documents").select(col("doc_id"), col("text")))
      .orderBy("doc_id")

  /** SimHash near-dup pairs: same twin-planted corpus as MinHash;
    * candidates share the high-16 bucket (equi-join), then the native
    * codegen'd [[graft.functions.HammingDistance]] expression ranks and
    * filters candidates (<= 10 of 60 bits). Both the bucketing and the
    * distance are deterministic functions both engines compute
    * identically, so the oracle is exact by construction. */
  def simhashPairs(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.HammingDistance.hamming
    val sim = simhashOf(spark, docsWithTwins(spark, dir)
        .repartition(spark.sparkContext.defaultParallelism, col("doc_id")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // one fill job before the self-join's two sides fan out — racing
    // consumers would each recompute the simhash pass (see :232-235)
    sim.count()
    val l = sim.select(col("bucket"), col("doc_id").as("doc_a"), col("simhash").as("sh_a"))
    val r = sim.select(col("bucket"), col("doc_id").as("doc_b"), col("simhash").as("sh_b"))
    val out = l.join(r, Seq("bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), hamming(col("sh_a"), col("sh_b")).as("hamming"))
      .filter(col("hamming") <= 10)
      .orderBy("doc_a", "doc_b")
      .persist(StorageLevel.MEMORY_AND_DISK)
    // materialize the (tiny) pair set while the simhash cache is hot,
    // then release the fat cache — the result frame is KBs, the cache
    // is the whole corpus's simhashes
    out.count()
    sim.unpersist()
    out
  }

  /** EXACT-SUBSTRING duplicate spans (the ExactSubstr dedup of Lee et
    * al. 2021, "Deduplicating Training Data Makes Language Models
    * Better"): find every maximal token span that appears verbatim in
    * more than one document. Their suffix array reports all repeats of
    * ≥ k tokens; hashing every k-token WINDOW and keeping windows whose
    * hash occurs in ≥ 2 distinct docs reports exactly the same spans
    * (any shared run of ≥ k tokens is a run of shared windows), with the
    * suffix array replaced by two equi-key shuffles — the
    * Spark-shaped equivalent.
    *
    * Pipeline: slide a k=20-token window per doc (narrow, O(n·k)
    * chars hashed), hash each window to a 60-bit integer (slim shuffle
    * payload — doc_id, start, int64; never the window text), count
    * distinct docs per hash (map-side combined), join the ≥2-doc
    * hashes back, then merge overlapping/adjacent windows per doc into
    * maximal spans with the islands-and-gaps window (per-doc partitions
    * — no global sort). Output is the span mask a cut pass consumes. */
  /** INTRA-document repeated-span excision — the self-repetition half
    * of ExactSubstr dedup (Lee et al. 2021): a k-token run appearing
    * twice WITHIN one document (boilerplate repeated on a page,
    * model-looped text) keeps its FIRST occurrence and marks every
    * later occurrence for excision. Same machinery as [[dupSpans]] with
    * the duplicate test scoped to the document: hash every k-token
    * window, keep (doc, hash) groups of ≥ 2 occurrences, drop each
    * group's first start, merge the surviving starts into maximal spans
    * with the islands-and-gaps fold. Every wide op is keyed on
    * (doc_id[, h]) — the corpus never pairs across documents and only
    * slim (doc_id, start, int64) rows shuffle. Planted fixture: every
    * 7th document re-appends its own first k tokens (token-aligned
    * boilerplate), which must surface as an excision span at the tail
    * (spec-asserted); the oracle replays hashing, the within-doc
    * first-occurrence rule, and the span merge. */
  def selfDupSpans(spark: SparkSession, dir: String, w: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toked0 = Tables(spark, dir, "documents")
      .select(col("doc_id"), graft.operators.TextOps.tokens(col("text")).as("t0"))
      .filter(size(col("t0")) >= w)
    val toked = toked0.select(col("doc_id"),
      when(col("doc_id") % 7 === 0, concat(col("t0"), slice(col("t0"), 1, w)))
        .otherwise(col("t0")).as("toks"))
    val wins = toked.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), size(col("toks")) - w),
        i => conv(substring(md5(array_join(slice(col("toks"), i + 1, lit(w)), " ")), 1, 15),
          16, 10).cast("long"))).as(Seq("start", "h")))
    val byDocHash = Window.partitionBy("doc_id", "h")
    val rep = wins
      .withColumn("cnt", count(lit(1)).over(byDocHash))
      .withColumn("first_start", min(col("start")).over(byDocHash))
      .filter(col("cnt") >= 2 && col("start") > col("first_start"))
      .select("doc_id", "start")
    val byStart = Window.partitionBy("doc_id").orderBy("start")
    rep
      .withColumn("prev_end", lag(col("start") + w, 1).over(byStart))
      .withColumn("ni",
        (col("prev_end").isNull || col("start") > col("prev_end")).cast("int"))
      .withColumn("island", sum(col("ni")).over(
        byStart.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("doc_id", "island")
      .agg(min(col("start")).as("s"), max(col("start")).as("m"))
      .select(col("doc_id"), col("island").cast("long").as("span_id"),
        col("s").cast("long").as("start_tok"),
        (col("m") + w).cast("long").as("end_tok"),
        (col("m") + w - col("s")).cast("long").as("n_dup_tokens"))
      .orderBy("doc_id", "span_id")
  }

  def dupSpans(spark: SparkSession, dir: String, w: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toked = docsWithTwins(spark, dir)
      .select(col("doc_id"), graft.operators.TextOps.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= w)
    val wins = toked.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), size(col("toks")) - w),
        i => conv(substring(md5(array_join(slice(col("toks"), i + 1, lit(w)), " ")), 1, 15),
          16, 10).cast("long"))).as(Seq("start", "h")))
    val dupHash = wins.groupBy("h")
      .agg(countDistinct("doc_id").as("nd")).filter(col("nd") >= 2).select("h")
    val dup = wins.join(dupHash, "h").select("doc_id", "start")
    val byStart = Window.partitionBy("doc_id").orderBy("start")
    dup
      .withColumn("prev_end", lag(col("start") + w, 1).over(byStart))
      .withColumn("ni",
        (col("prev_end").isNull || col("start") > col("prev_end")).cast("int"))
      .withColumn("island", sum(col("ni")).over(
        byStart.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("doc_id", "island")
      .agg(min(col("start")).as("s"), max(col("start")).as("m"))
      .select(col("doc_id"), col("island").cast("long").as("span_id"),
        col("s").cast("long").as("start_tok"),
        (col("m") + w).cast("long").as("end_tok"),
        (col("m") + w - col("s")).cast("long").as("n_dup_tokens"))
      .orderBy("doc_id", "span_id")
  }
}
