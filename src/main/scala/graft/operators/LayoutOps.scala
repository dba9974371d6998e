package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Physical-layout operators: multi-dimensional clustering for scan
  * pruning. At 100 TB the difference between "scan everything" and
  * "prune 15/16 buckets" is the layout the writer chose — these ops are
  * the write-side half of that bargain.
  */
object LayoutOps {

  /** One shard's loader manifest row. */
  private[graft] case class ShardManifest(shard: Long, n_docs: Long,
      n_tokens: Long, min_pos: Long, max_pos: Long, order_digest: String)

  /** One md5-chain step: acc' = md5(acc ++ "," ++ payload), lowercase hex —
    * the same bytes Spark's `md5()` and DuckDB's `md5()` hash, so the
    * oracle replays the chain with
    * `list_reduce(list_prepend('', list(payload ORDER BY pos)), (a,x) -> md5(a||','||x))`. */
  private[graft] def digestStepStr(md: java.security.MessageDigest,
      acc: String, payload: String): String = {
    md.reset()
    val bytes = md.digest((acc + "," + payload).getBytes("UTF-8"))
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < bytes.length) {
      val v = bytes(i) & 0xff
      if (v < 16) sb.append('0')
      sb.append(java.lang.Integer.toHexString(v))
      i += 1
    }
    sb.toString
  }

  /** The doc-id digest step of [[foldShardManifests]]. */
  private[graft] def digestStep(md: java.security.MessageDigest,
      acc: String, docId: Long): String =
    digestStepStr(md, acc, java.lang.Long.toString(docId))

  /** Partition-local manifest fold: rows arrive sorted by (shard, pos);
    * the state per in-flight shard is ONE running digest plus five
    * counters — O(1) regardless of shard size (the collect_list digest
    * this replaces held a whole shard in a single aggregation buffer,
    * an executor-killer at corpus scale). Output is one manifest row per
    * shard seen by the partition. */
  private[graft] def foldShardManifests(
      it: Iterator[(Long, Long, Long, Long)]): Iterator[ShardManifest] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = scala.collection.mutable.ArrayBuffer.empty[ShardManifest]
    var cur = -1L; var acc = ""; var n = 0L; var toks = 0L
    var minP = Long.MaxValue; var maxP = Long.MinValue
    def flush(): Unit =
      if (cur >= 0) out += ShardManifest(cur, n, toks, minP, maxP, acc)
    while (it.hasNext) {
      val (shard, pos, docId, nWords) = it.next()
      if (shard != cur) {
        flush()
        cur = shard; acc = ""; n = 0L; toks = 0L
        minP = Long.MaxValue; maxP = Long.MinValue
      }
      acc = digestStep(md, acc, docId)
      n += 1L; toks += nWords
      if (pos < minP) minP = pos
      if (pos > maxP) maxP = pos
    }
    flush()
    out.iterator
  }

  /** Per-shard manifest over a written store, computed as a pos-ordered
    * STREAMING fold: one slim (shard, pos, doc_id, n_words) shuffle onto
    * the shard key, a partition-local sort, then [[foldShardManifests]] —
    * k tasks each streaming one sorted shard with O(1) digest state.
    * `tokensCol` is null for stores without a token column. */
  private[graft] def shardManifest(spark: SparkSession, store: DataFrame,
      nShards: Int, tokensCol: String = null): DataFrame = {
    val spark0 = spark
    import spark0.implicits._
    val toks =
      if (tokensCol == null) lit(0L) else col(tokensCol).cast("long")
    store
      .select(col("shard").cast("long").as("_1"), col("pos").cast("long").as("_2"),
        col("doc_id").cast("long").as("_3"), toks.as("_4"))
      .as[(Long, Long, Long, Long)]
      .repartition(nShards, col("_1"))
      .sortWithinPartitions("_1", "_2")
      .mapPartitions(foldShardManifests)
      .toDF()
  }

  /** The interleave Σ_i ((x>>i)&1)<<2i | ((y>>i)&1)<<(2i+1) over `bits`
    * bit positions, as a generated SQL expression — unrolled so it stays
    * one codegen'd integer expression (no array fold at runtime). */
  private[graft] def zInterleaveSql(x: String, y: String, bits: Int): String =
    (0 until bits).map { i =>
      s"(shiftleft(shiftright($x, $i) & 1, ${2 * i}) + " +
        s"shiftleft(shiftright($y, $i) & 1, ${2 * i + 1}))"
    }.mkString(" + ")

  /** Z-ORDER CLUSTERING stats — the Delta/Iceberg `OPTIMIZE ZORDER BY`
    * layout decision, verifiable: normalize two clustering dimensions to
    * a fixed 10-bit range (exact integer scaling against the dimension
    * max — a 1-row broadcast, no sampling, so the assignment is
    * deterministic on any layout, unlike range-partitioner boundaries),
    * interleave the bits into a 20-bit Z-value, and bucket by the
    * Z-value's TOP 4 bits — 16 buckets, each covering a bounded
    * rectangle of the 2-D key space. The emitted per-bucket min/max of
    * BOTH dimensions is exactly the footer/manifest statistic that lets
    * a reader prune on either predicate — the point of Z-ordering over
    * single-column sort (which bounds only its leading column).
    *
    * Scale shape: one narrow map computes zval (unrolled integer
    * expression, whole-stage codegen), one shuffle on the 16-way bucket
    * key for the stats; the production write is
    * `repartitionByRange(bucket, zval).sortWithinPartitions(zval)` +
    * per-file stats — same arithmetic, file-grain buckets. */
  /** Deterministic GLOBAL TRAINING-ORDER SHUFFLE — the last layout step
    * before a training run: every document gets a reproducible position
    * in a corpus-wide pseudo-random order (rank of md5(doc_id)) and a
    * round-robin shard (`pos % k`, balanced to ±1 row with every shard an
    * interleaved sample of the shuffled order — no shard is "the tail").
    * Any rerun, any cluster size, any input layout produces the SAME
    * order — the property that makes a training run resumable and its
    * data order auditable.
    *
    * Scale shape: NOT a global sort-to-one-partition. The corpus is
    * bucketed on the leading byte of the shuffle key, ranks are computed
    * bucket-locally, and bucket offsets (a 256-row broadcast) compose
    * the global position — the same two-pass prefix-sum used by the
    * token sharder, so the only wide ops are one hash shuffle and a
    * 256-row window. The production write is then
    * `partitionBy(shard)` with `sortWithinPartitions(pos)`. */
  /** The rank core of [[corpusShuffle]]: (doc_id, pos) where pos is the
    * global rank of (md5(doc_id), doc_id), computed as a two-pass prefix
    * sum over 256 DATA-DERIVED buckets — the first byte of the md5 key.
    * The bucket is monotone in the key, so (bucket, rk, doc_id) is the
    * same total order as (rk, doc_id); per-bucket ranks plus a 256-row
    * broadcast offset window compose the global position. Critically the
    * bucket is a pure FUNCTION OF THE ROW, not of physical placement:
    * the earlier `repartitionByRange + spark_partition_id` form computed
    * its partition id from a SAMPLED range exchange that appears twice
    * in the joined plan (window side + offset side), and when exchange
    * reuse does not kick in — observed under streaming foreachBatch —
    * the two executions sample different boundaries and the offsets
    * misalign, duplicating and holing positions. A row-derived bucket
    * cannot disagree with itself, whatever the planner does. */
  private[graft] def shuffleRanks(spark: SparkSession, docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = docs
      .select(col("doc_id"), md5(col("doc_id").cast("string")).as("rk"))
      .withColumn("pid", expr("cast(conv(substring(rk, 1, 2), 16, 10) as int)"))
    val local = base.withColumn("lr",
      row_number().over(Window.partitionBy("pid").orderBy("rk", "doc_id")))
    // the offsets frame is <=256 rows BY CONSTRUCTION (one per md5
    // leading-byte bucket), so its cumulative sum runs in one partition
    // either way; a constant NON-FOLDABLE partition key (pmod(pid, 1) —
    // a plain literal would be folded back out by Spark's
    // EliminateWindowPartitions) keeps the partition spec non-empty:
    // same single-partition execution, byte-identical output, and
    // WindowExec stops flooding every run with the "No Partition
    // Defined" warning that buries real ones
    val offsets = local.groupBy("pid").agg(count(lit(1)).as("n"))
      .withColumn("offset",
        coalesce(sum(col("n")).over(
          Window.partitionBy(pmod(col("pid"), lit(1))).orderBy("pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("pid", "offset")
    local.join(broadcast(offsets), "pid")
      .withColumn("pos", (col("lr").cast("long") + col("offset")) - 1L)
      .select(col("doc_id"), col("pos"))
  }

  def corpusShuffle(spark: SparkSession, dir: String, nShards: Int = 8): DataFrame =
    shuffleRanks(spark, Tables(spark, dir, "documents"))
      .select(col("doc_id"), col("pos"), (col("pos") % nShards).as("shard"))
      .orderBy("doc_id")

  /** Streaming fold of one epoch-ordered shard: rows arrive sorted by
    * (shard, epoch key, doc_id); state is ONE running digest + a counter
    * per in-flight shard — the [[foldShardManifests]] discipline without
    * the position fields (an epoch permutation has no storage positions
    * of its own). */
  private def foldEpochShards(
      it: Iterator[(Long, String, Long)]): Iterator[(Long, Long, String)] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String)]
    var cur = -1L; var acc = ""; var n = 0L
    def flush(): Unit = if (cur >= 0) out += ((cur, n, acc))
    while (it.hasNext) {
      val (shard, _, docId) = it.next()
      if (shard != cur) { flush(); cur = shard; acc = ""; n = 0L }
      acc = digestStep(md, acc, docId)
      n += 1L
    }
    flush()
    out.iterator
  }

  /** EPOCH RE-SHUFFLE CONTRACT over the immutable training store: the
    * curated store's physical order is write-once (positions are
    * immutable, shard files append-only), but a multi-epoch training run
    * must not revisit documents in the same order every epoch. Epoch e
    * is served as a MANIFEST over the unchanged shards: within each
    * store shard, visit documents in the order of md5(doc_id ‖ ':' ‖ e)
    * — a deterministic, epoch-salted permutation that needs NO shard
    * rewrite, no data movement, and is reproducible on any cluster (the
    * corpusShuffle determinism contract lifted to epochs). Epoch 0's key
    * is md5(doc_id) — exactly the store's own training order, so the
    * epoch-0 manifest digest EQUALS the store manifest digest
    * (spec-asserted), anchoring the contract to the layout it serves.
    *
    * Scale shape: per epoch, one narrow map adds the salted key, one
    * hash shuffle onto the k shard keys, a partition-local sort, and the
    * O(1)-state digest fold — no global sort, no per-epoch store
    * rewrite; the manifest is k rows per epoch. */
  def epochOrderManifest(spark: SparkSession, dir: String,
      epochs: Int = 3, nShards: Int = 4): DataFrame = {
    val spark0 = spark
    import spark0.implicits._
    val base = shuffleRanks(spark,
      Tables(spark, dir, "documents").select("doc_id"))
      .select(col("doc_id"), (col("pos") % nShards).as("shard"))
    val perEpoch = (0 until epochs).map { e =>
      base
        .withColumn("ek", md5(concat(col("doc_id").cast("string"),
          lit(if (e == 0) "" else s":$e"))))
        .select(col("shard").cast("long").as("_1"), col("ek").as("_2"),
          col("doc_id").cast("long").as("_3"))
        .as[(Long, String, Long)]
        .repartition(nShards, col("_1"))
        .sortWithinPartitions("_1", "_2", "_3")
        .mapPartitions(foldEpochShards)
        .toDF("shard", "n_docs", "order_digest")
        .select(lit(e.toLong).as("epoch"), col("shard"),
          col("n_docs").cast("long").as("n_docs"), col("order_digest"))
    }
    perEpoch.reduce(_ union _).orderBy("epoch", "shard")
  }

  /** INCREMENTAL extension of the training order — the epoch-over-epoch
    * maintenance story of [[corpusShuffle]] (the staged-IVF-upsert
    * discipline applied to the layout): positions already assigned are
    * IMMUTABLE (a training run that consumed shard files up to pos p can
    * resume/extend without any re-read), and newly arrived documents
    * slot in deterministically at the tail — ranked among themselves by
    * the same md5 order, offset by the existing corpus size. Round-robin
    * sharding then interleaves the tail across all shards, so every
    * shard receives ~1/k of the new docs and stays an unbiased sample of
    * the shuffled order; no existing shard file is rewritten, each only
    * gains an appended tail segment. Fixture: doc_id % 5 == 0 is the
    * arriving batch, the rest the existing corpus (immutability vs the
    * standalone shuffle of the existing set is spec-proven). */
  def corpusShuffleUpsert(spark: SparkSession, dir: String, nShards: Int = 8): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val existing = docs.filter(col("doc_id") % 5 =!= 0)
    val old = shuffleRanks(spark, existing)
    // the tail offset = |existing| folds into the plan as a broadcast
    // 1-row aggregate (no driver-side count, no second filtered scan)
    val nOld = existing.agg(count(lit(1)).as("n_old"))
    val fresh = shuffleRanks(spark, docs.filter(col("doc_id") % 5 === 0))
      .crossJoin(broadcast(nOld))
      .select(col("doc_id"), (col("pos") + col("n_old")).as("pos"))
    old.select(col("doc_id"), col("pos"), lit(false).as("is_new"))
      .union(fresh.select(col("doc_id"), col("pos"), lit(true).as("is_new")))
      .select(col("doc_id"), col("pos"), (col("pos") % nShards).as("shard"),
        col("is_new"))
      .orderBy("doc_id")
  }

  /** Write-side LIFECYCLE of [[corpusShuffle]] — performs the production
    * claim instead of just describing it: the shuffled assignment is
    * written as a `shard=`-partitioned parquet store with rows
    * pos-sorted inside every shard (one writer task per shard via an
    * exact `pos % k` partitioner — `repartition(col)` would hash-collide
    * shards into one task and leave others idle), then READ BACK from
    * disk and folded to a per-shard manifest: row count, pos range, and
    * an order-sensitive md5 digest of the doc-id sequence. The digest is
    * what the training loader checks before consuming a shard — any
    * dropped, duplicated, or re-ordered document changes it. The oracle
    * recomputes every manifest field from the raw corpus, so the gate
    * covers the whole write→read round trip. Correctness of the layout
    * does not depend on task placement: `partitionBy` guarantees the
    * per-shard directories and `sortWithinPartitions` the in-file pos
    * order however shards land on writer tasks; the range partition on
    * the shard id only balances the writers (~one shard each).
    *
    * At 100 TB this is the same plan: k writer tasks each streaming one
    * sorted shard to its own directory, a manifest fold that shuffles
    * only (shard, doc_id, pos) triples, and readers that prune to
    * `shard=i` by partition directory. */
  def corpusShuffleStore(spark: SparkSession, dir: String, nShards: Int = 8): DataFrame = {
    val root = graft.sources.TmpStores.pidScopedRoot("graft-shardstore")
      .resolve("corpus_shuffle").toString
    val assigned = corpusShuffle(spark, dir, nShards)
    val placed = assigned
      .repartitionByRange(nShards, col("shard"))
      .sortWithinPartitions("shard", "pos")
    placed.write.mode("overwrite").partitionBy("shard").parquet(root)
    shardManifest(spark, spark.read.parquet(root), nShards)
      .select(col("shard"), col("n_docs"), col("min_pos"), col("max_pos"),
        col("order_digest"))
      .orderBy("shard")
  }

  /** The END-TO-END corpus build product — what a training run actually
    * consumes: the curation funnel's surviving documents
    * (quality ∧ dedup-winner ∧ decontaminated, per
    * `TextOps.curationFlags`) are given the deterministic training
    * order ([[shuffleRanks]] over the survivor set), written as a
    * shard=-partitioned pos-sorted parquet store, and read back into
    * the per-shard loader manifest (doc count, token sum, pos range,
    * order-sensitive doc-id digest). One query performs select → order
    * → layout → manifest; the oracle replays the entire chain — the
    * curation CTEs, the survivor ranking, and every manifest field —
    * so a regression anywhere in the composition flips the row red.
    * 4 shards (vs the raw store's 8) so the two lifecycles also differ
    * structurally. */
  def curatedStore(spark: SparkSession, dir: String, nShards: Int = 4): DataFrame = {
    val root = graft.sources.TmpStores.pidScopedRoot("graft-shardstore")
      .resolve("curated").toString
    val flags = TextOps.curationFlags(spark, dir)
    val survivors = flags.filter(col("r3")).select(col("doc_id"), col("n_words"))
    val assigned = shuffleRanks(spark, survivors.select(col("doc_id")))
      .join(survivors, Seq("doc_id"))
      .select(col("doc_id"), col("pos"), (col("pos") % nShards).as("shard"),
        col("n_words"))
    assigned
      .repartitionByRange(nShards, col("shard"))
      .sortWithinPartitions("shard", "pos")
      .write.mode("overwrite").partitionBy("shard").parquet(root)
    val out = shardManifest(spark, spark.read.parquet(root), nShards,
        tokensCol = "n_words")
      .select(col("shard"), col("n_docs"), col("n_tokens"), col("min_pos"),
        col("max_pos"), col("order_digest"))
      .orderBy("shard")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    // flags is the SHARED family stage - never unpersisted by a consumer
    out
  }

  /** TEMPERATURE/TARGET-MIXED curated store — the DATA-MIXING step
    * composed into the corpus build product: curation survivors are
    * further downsampled to the per-language target rates
    * (`TextOps.MixRates`, the deterministic md5-uniform admission of
    * `domainMix` — no RNG state, the same keep/drop on any layout or
    * rerun), and only the mixed survivor set is ranked into the training
    * order, written as the shard=-partitioned pos-sorted store, and
    * folded to the per-shard loader manifest. One query performs
    * curate → mix → order → layout → manifest; the oracle replays the
    * curation CTE chain, the language-ID scores, the md5 admission
    * arithmetic, the survivor ranking and every manifest field. Scale
    * shape: the mix is a narrow filter over the language-ID map joined
    * on doc_id; everything else is [[curatedStore]]'s plan. */
  def curatedStoreMixed(spark: SparkSession, dir: String,
      nShards: Int = 4): DataFrame = {
    val root = graft.sources.TmpStores.pidScopedRoot("graft-shardstore")
      .resolve("curated-mix").toString
    val flags = TextOps.curationFlags(spark, dir)
    val survivors = flags.filter(col("r3"))
      .join(TextOps.domainMixKeeps(spark, dir).select("doc_id"), Seq("doc_id"))
      .select(col("doc_id"), col("n_words"))
    val assigned = shuffleRanks(spark, survivors.select(col("doc_id")))
      .join(survivors, Seq("doc_id"))
      .select(col("doc_id"), col("pos"), (col("pos") % nShards).as("shard"),
        col("n_words"))
    assigned
      .repartitionByRange(nShards, col("shard"))
      .sortWithinPartitions("shard", "pos")
      .write.mode("overwrite").partitionBy("shard").parquet(root)
    val out = shardManifest(spark, spark.read.parquet(root), nShards,
        tokensCol = "n_words")
      .select(col("shard"), col("n_docs"), col("n_tokens"), col("min_pos"),
        col("max_pos"), col("order_digest"))
      .orderBy("shard")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    // flags is the SHARED family stage - never unpersisted by a consumer
    out
  }

  /** EPOCH RE-SHUFFLE at the WINDOW grain — [[epochOrderManifest]]'s
    * contract applied to the unit a dataloader actually consumes: the
    * tokenized stream's fixed `ctx`-token context windows. Epoch 0
    * visits each shard's windows in STORAGE ORDER (sequential window
    * ids — the order the packed shards were written); epoch e ≥ 1
    * permutes them by md5(win ‖ ':' ‖ e). No shard is rewritten for a
    * new epoch; the manifest is k rows per epoch.
    *
    * Scale shape: the window-id universe derives from ONE corpus
    * aggregate (the survivors' total BPE token count — a single bounded
    * driver scalar) and `spark.range`, so the universe is distributed
    * at any corpus size; per epoch the plan is a narrow key map, one
    * hash shuffle onto the k shard keys, a partition-local sort and the
    * O(1)-state digest fold. */
  def epochWindowManifest(spark: SparkSession, dir: String,
      epochs: Int = 3, nShards: Int = 4, ctx: Long = 2048L): DataFrame = {
    val spark0 = spark
    import spark0.implicits._
    val flags = TextOps.curationFlags(spark, dir)
    val surv = flags.filter(col("r3")).select("doc_id")
    val totalTokens = bpeEncodeDocs(
      Tables(spark, dir, "documents").join(surv, Seq("doc_id")))
      .agg(coalesce(sum(col("n_bpe")), lit(0L)).cast("long"))
      .as[Long].head()
    // flags is the SHARED family stage - never unpersisted by a consumer
    val nWins = (totalTokens + ctx - 1) / ctx
    val base = spark.range(nWins)
      .select(col("id").as("win"), (col("id") % nShards).as("shard"))
    val perEpoch = (0 until epochs).map { e =>
      base
        .withColumn("ek",
          if (e == 0) format_string("%020d", col("win")) // storage order
          else md5(concat(col("win").cast("string"), lit(s":$e"))))
        .select(col("shard").cast("long").as("_1"), col("ek").as("_2"),
          col("win").cast("long").as("_3"))
        .as[(Long, String, Long)]
        .repartition(nShards, col("_1"))
        .sortWithinPartitions("_1", "_2", "_3")
        .mapPartitions(foldEpochShards)
        .toDF("shard", "n_windows", "order_digest")
        .select(lit(e.toLong).as("epoch"), col("shard"),
          col("n_windows").cast("long").as("n_windows"), col("order_digest"))
    }
    perEpoch.reduce(_ union _).orderBy("epoch", "shard")
  }

  /** CURRICULUM-ORDERED curated store — the data-ordering alternative to
    * the uniform training shuffle (curriculum learning, Bengio et al.
    * 2009): curation survivors are laid out in QUALITY-DESCENDING order
    * (highest classifier logit first, doc_id tie-break) so a training
    * run consumes easy/clean documents before hard/noisy ones, then
    * written and manifested exactly like [[curatedStore]].
    *
    * The global curriculum position is composed WITHOUT a sampled range
    * partitioner or a data-sized single-partition sort: the bucket is a
    * FIXED-BOUNDARY value range of the integer score (a pure function of
    * the row, monotone in the sort key — deterministic on any layout,
    * the [[shuffleRanks]] discipline with value ranges instead of md5
    * bytes), ranks are bucket-local, and a ~128-row broadcast offset
    * window composes the global rank. Value buckets can be skewed when
    * scores cluster — at corpus scale the fix is more boundaries, not a
    * different algorithm; correctness never depends on balance. */
  def curriculumStore(spark: SparkSession, dir: String,
      nShards: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val root = graft.sources.TmpStores.pidScopedRoot("graft-shardstore")
      .resolve("curriculum").toString
    val flags = TextOps.curationFlags(spark, dir)
    val surv = flags.filter(col("r3")).select(col("doc_id"), col("n_words"))
    val scored = surv
      .join(TextOps.qualityLogit(spark, dir)
        .select(col("doc_id"), col("quality_logit_ppm")), Seq("doc_id"))
      // ascending ck = descending quality; ppm is bounded in ±1e6 by
      // construction (a mean of ±1000 weights, scaled 1000x)
      .withColumn("ck", -col("quality_logit_ppm"))
      .withColumn("bk", expr("cast((ck + 1000000L) div 15700 as int)"))
    val local = scored.withColumn("lr",
      row_number().over(Window.partitionBy("bk").orderBy("ck", "doc_id")))
    val offsets = local.groupBy("bk").agg(count(lit(1)).as("n"))
      .withColumn("off",
        // <=128 bucket-summary rows; see shuffleRanks on the constant
        // non-foldable partition key
        coalesce(sum(col("n")).over(
          Window.partitionBy(pmod(col("bk"), lit(1))).orderBy("bk")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("bk", "off")
    val assigned = local.join(broadcast(offsets), "bk")
      .select(col("doc_id"), (col("lr") - 1L + col("off")).as("pos"),
        col("n_words"))
      .withColumn("shard", col("pos") % nShards)
    assigned
      .repartitionByRange(nShards, col("shard"))
      .sortWithinPartitions("shard", "pos")
      .write.mode("overwrite").partitionBy("shard").parquet(root)
    val out = shardManifest(spark, spark.read.parquet(root), nShards,
        tokensCol = "n_words")
      .select(col("shard"), col("n_docs"), col("n_tokens"), col("min_pos"),
        col("max_pos"), col("order_digest"))
      .orderBy("shard")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    // flags is the SHARED family stage - never unpersisted by a consumer
    out
  }

  /** One tokenized shard's loader manifest row. */
  private[graft] case class TokenShardManifest(shard: Long, n_windows: Long,
      n_docs: Long, n_tokens: Long, min_window: Long, max_window: Long,
      token_digest: String)

  /** Partition-local token-manifest fold: rows arrive sorted by
    * (shard, window, pos); state per in-flight shard is ONE running
    * digest plus six counters — O(1) regardless of shard size. The
    * digest chains over each document's PIECE-SEQUENCE payload (the
    * encoded token stream), not the doc id, so a re-tokenization under a
    * different merge table flips the manifest even when the doc-id
    * sequence is unchanged — the property a training loader needs before
    * memory-mapping a token shard it didn't write. */
  private[graft] def foldTokenManifests(
      it: Iterator[(Long, Long, Long, Long, String)]): Iterator[TokenShardManifest] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = scala.collection.mutable.ArrayBuffer.empty[TokenShardManifest]
    var cur = -1L; var acc = ""; var nDocs = 0L; var toks = 0L
    var nWin = 0L; var lastWin = Long.MinValue
    var minW = Long.MaxValue; var maxW = Long.MinValue
    def flush(): Unit =
      if (cur >= 0) out += TokenShardManifest(cur, nWin, nDocs, toks, minW, maxW, acc)
    while (it.hasNext) {
      val (shard, win, _, nBpe, tokStr) = it.next()
      if (shard != cur) {
        flush(); cur = shard; acc = ""; nDocs = 0L; toks = 0L
        nWin = 0L; lastWin = Long.MinValue
        minW = Long.MaxValue; maxW = Long.MinValue
      }
      acc = digestStepStr(md, acc, tokStr)
      nDocs += 1L; toks += nBpe
      if (win != lastWin) { nWin += 1L; lastWin = win }
      if (win < minW) minW = win
      if (win > maxW) maxW = win
    }
    flush()
    out.iterator
  }

  /** TOKENIZED PACKED SHARD STORE — the last mile between curation and a
    * training run: the funnel's survivors (`TextOps.curationFlags` r3)
    * are BPE-encoded under the pinned merge table
    * ([[TextOps.bpePieceArr]] — one codegen'd expression, zero shuffle),
    * laid into the deterministic training order ([[shuffleRanks]]),
    * packed into fixed `ctx`-token context windows by global token
    * offset (doc → window containing its first token — the
    * document-boundary-respecting greedy chunking a dataloader performs,
    * made deterministic), written as a `shard=`-partitioned window-grain
    * parquet store, and read BACK into a per-shard loader manifest whose
    * digest chains over the encoded token stream itself.
    *
    * Scale shape: the encode is a narrow map; the token prefix sum is
    * the same two-pass 256-bucket discipline as [[shuffleRanks]] (the
    * md5-leading-byte bucket is monotone in pos, so a bucket-local
    * running sum plus a 256-row broadcast offset window composes the
    * global token offset — never a single-partition window); the store
    * write is k sorted writer tasks; the manifest fold streams each
    * sorted shard with O(1) state. The oracle replays the ENTIRE chain —
    * curation CTEs, md5 ranking, the unrolled merge-table replace chain,
    * the windowed prefix sum, and every manifest field including the
    * token digest — so a regression anywhere from quality rules to
    * tokenizer flips a row red. */
  /** BPE-encode a (doc_id, text) frame under the pinned merge table —
    * one codegen'd expression, zero shuffle: (doc_id, n_bpe, tok_str). */
  private[graft] def bpeEncodeDocs(docs: DataFrame): DataFrame =
    bpeEncodeDocsWith(docs, TextOps.BpeMergeTable)

  /** [[bpeEncodeDocs]] under an ARBITRARY merge table — the committed
    * vocab artifact read back from its versioned store, so a streaming
    * gate encodes each batch under whatever tokenizer is CURRENT. The
    * encode routes through [[TextOps.withBpePieces]]: a fixture-sized
    * table stays a codegen'd expression; a production-sized vocab runs
    * the partition-local encoder (a 32k-merge table cannot compile as a
    * 32k-deep replace chain). */
  private[graft] def bpeEncodeDocsWith(docs: DataFrame,
      table: Seq[(String, String)]): DataFrame =
    TextOps.withBpePieces(
      docs.withColumn("toks", TextOps.tokens(col("text"))), table)
      .select(col("doc_id"), size(col("pcs")).cast("long").as("n_bpe"),
        array_join(col("pcs"), " ").as("tok_str"))

  /** Pack ranked, encoded documents into fixed `ctx`-token context
    * windows by global token offset: `ranked` carries (doc_id, pos,
    * n_bpe, tok_str); `baseTokens` is a broadcastable 1-row frame with a
    * `t_old` column — the token count already in the store (0 for a
    * batch build, the store's running total for a streaming tail append,
    * so a partially-filled last window keeps filling across appends).
    * The token prefix sum is the same two-pass 256-bucket discipline as
    * [[shuffleRanks]]: the md5-leading-byte bucket is monotone in pos,
    * so a bucket-local running sum plus a 256-row broadcast offset
    * window composes the global token offset — never a single-partition
    * window. Output adds (win, shard = win % nShards). */
  private[graft] def assignWindows(ranked0: DataFrame, ctx: Long,
      nShards: Int, baseTokens: DataFrame): DataFrame =
    withTokenStart(ranked0)
      .crossJoin(broadcast(baseTokens))
      .withColumn("win", expr(s"(start + t_old) div $ctx"))
      .select(col("doc_id"), col("pos"), col("n_bpe"), col("tok_str"),
        col("win"), (col("win") % nShards).as("shard"))

  /** [[assignWindows]] with the accreted token offset as a PLAN LITERAL —
    * for callers that already hold the counter value on the driver (the
    * streaming tail path reads its counter once per batch): same output,
    * no broadcast crossJoin exchange in the per-batch plan. */
  private[graft] def assignWindows(ranked0: DataFrame, ctx: Long,
      nShards: Int, baseTokens: Long): DataFrame =
    withTokenStart(ranked0)
      .withColumn("win", expr(s"(start + ${baseTokens}L) div $ctx"))
      .select(col("doc_id"), col("pos"), col("n_bpe"), col("tok_str"),
        col("win"), (col("win") % nShards).as("shard"))

  /** Add each document's global token START offset — the running token
    * sum before it in pos order — via the two-pass 256-bucket prefix
    * sum: the md5-leading-byte bucket is monotone in pos, so a
    * bucket-local running sum plus a 256-row broadcast offset window
    * composes the global offset without a single-partition window.
    *
    * CONTRACT: holds only when pos IS the md5 rank of the input rows
    * (one ranking cohort) — a frame spanning SEVERAL cohorts (the
    * repacked multi-era store, where each era restarts its md5 ranking
    * at its own offset) breaks the monotonicity and must use
    * [[withTokenStartBy]] with a pos-derived bucket instead. */
  private[graft] def withTokenStart(ranked0: DataFrame): DataFrame =
    withTokenStartBy(ranked0,
      expr("cast(conv(substring(md5(cast(doc_id as string)), 1, 2), 16, 10) as int)"))

  /** [[withTokenStart]] under an arbitrary bucket column — `pidCol` MUST
    * be monotone nondecreasing in pos and of bounded cardinality (the
    * offsets frame broadcasts). */
  private[graft] def withTokenStartBy(ranked0: DataFrame,
      pidCol: org.apache.spark.sql.Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranked = ranked0.withColumn("pid", pidCol)
    val wIn = Window.partitionBy("pid").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withLocal = ranked.withColumn("local_cum", sum(col("n_bpe")).over(wIn))
    val offsets = withLocal.groupBy("pid").agg(max(col("local_cum")).as("psum"))
      .withColumn("offset",
        // <=256 bucket-summary rows; see shuffleRanks on the constant
        // non-foldable partition key
        coalesce(sum(col("psum")).over(
          Window.partitionBy(pmod(col("pid"), lit(1))).orderBy("pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("pid", "offset")
    withLocal.join(broadcast(offsets), "pid")
      .withColumn("start", col("local_cum") + col("offset") - col("n_bpe"))
      .drop("pid", "local_cum", "offset")
  }

  /** Fold a window-grain token store into its per-shard loader manifest
    * ([[foldTokenManifests]]): k streaming tasks, O(1) state each. */
  private[graft] def tokenShardManifest(spark: SparkSession, store: DataFrame,
      nShards: Int): DataFrame = {
    val spark0 = spark
    import spark0.implicits._
    store
      .select(col("shard").cast("long").as("_1"), col("win").cast("long").as("_2"),
        col("pos").cast("long").as("_3"), col("n_bpe").cast("long").as("_4"),
        col("tok_str").as("_5"))
      .as[(Long, Long, Long, Long, String)]
      .repartition(nShards, col("_1"))
      .sortWithinPartitions("_1", "_2", "_3")
      .mapPartitions(foldTokenManifests)
      .toDF()
      .select(col("shard"), col("n_windows"), col("n_docs"), col("n_tokens"),
        col("min_window"), col("max_window"), col("token_digest"))
      .orderBy("shard")
  }

  def tokenizedShardStore(spark: SparkSession, dir: String,
      ctx: Long = 2048L, nShards: Int = 4): DataFrame = {
    val spark0 = spark
    import spark0.implicits._
    val root = graft.sources.TmpStores.pidScopedRoot("graft-shardstore")
      .resolve("tokenized").toString
    val flags = TextOps.curationFlags(spark, dir)
    val surv = flags.filter(col("r3")).select("doc_id")
    // survivors carry ≥10 words by the quality rule, so the encode needs
    // no emptiness guard; ranks come from the slim cached survivor set
    // (not the encoded frame) so the BPE expressions evaluate once
    val enc = bpeEncodeDocs(Tables(spark, dir, "documents").join(surv, Seq("doc_id")))
    val ranked = shuffleRanks(spark, surv).join(enc, Seq("doc_id"))
    assignWindows(ranked, ctx, nShards, Seq(0L).toDF("t_old"))
      .repartitionByRange(nShards, col("shard"))
      .sortWithinPartitions("shard", "win", "pos")
      .write.mode("overwrite").partitionBy("shard").parquet(root)
    val out = tokenShardManifest(spark, spark.read.parquet(root), nShards)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    // flags is the SHARED family stage - never unpersisted by a consumer
    out
  }

  /** CONTEXT-WINDOW SLICES — the dataloader contract on the packed
    * token stream: every training sample is the EXACT `ctx`-token slice
    * `[w·ctx, (w+1)·ctx)` of the continuous stream, split mid-document
    * where the boundary falls (what the training loop actually consumes;
    * [[tokenizedShardStore]] stores at document grain and this
    * materializes the window grain). Output is one row per window with
    * its exact token count (== ctx everywhere but the tail window), the
    * spanned document range, and an order-sensitive digest of the
    * window's token sequence.
    *
    * Scale shape: per-document token START offsets come from the same
    * two-pass 256-bucket prefix sum as [[assignWindows]]; the
    * token-grain fan-out is one `posexplode` (narrow); the per-window
    * fold's state is BOUNDED BY CONSTRUCTION at ctx tokens — a window is
    * a training sample, so the sort_array(collect_list) buffer is O(ctx)
    * per group, never O(corpus). The oracle replays the curation chain,
    * the encode, the global token index, and the per-window string
    * aggregation. */
  def windowSlices(spark: SparkSession, dir: String, ctx: Long = 2048L): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val flags = TextOps.curationFlags(spark, dir)
    val surv = flags.filter(col("r3")).select("doc_id")
    val pieces = TextOps.bpePieceArr
    val enc = Tables(spark, dir, "documents")
      .join(surv, Seq("doc_id"))
      .withColumn("toks", TextOps.tokens(col("text")))
      .withColumn("pcs", flatten(transform(col("toks"), w => pieces(w))))
      .select(col("doc_id"), size(col("pcs")).cast("long").as("n_bpe"), col("pcs"))
    // the prefix-sum window sorts slim (doc_id, pos, n_bpe) rows; the
    // piece arrays join back on doc_id afterwards instead of riding
    // through the window sort
    val ranked = shuffleRanks(spark, surv)
      .join(enc.select(col("doc_id"), col("n_bpe")), Seq("doc_id"))
    val staged = withTokenStart(ranked)
      .join(enc.select(col("doc_id"), col("pcs")), Seq("doc_id"))
      .select(col("doc_id"), col("start"), col("pcs"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    staged.count() // barrier: keep InferFiltersFromGenerate off the HOF encode
    val out = staged
      .select(col("doc_id"), col("start"),
        posexplode(col("pcs")).as(Seq("pi", "piece")))
      .withColumn("idx", col("start") + col("pi"))
      .withColumn("win", expr(s"idx div $ctx"))
      .groupBy("win")
      .agg(
        count(lit(1)).as("n_tokens"),
        min(col("idx")).as("first_idx"),
        max(col("idx")).as("last_idx"),
        countDistinct(col("doc_id")).as("n_docs"),
        md5(array_join(
          transform(array_sort(collect_list(struct(col("idx"), col("piece")))),
            x => x.getField("piece")), " ")).as("window_digest"))
      .orderBy("win")
      .persist(StorageLevel.MEMORY_AND_DISK)
    out.count()
    staged.unpersist()
    // flags is the SHARED family stage - never unpersisted by a consumer
    out
  }

  // ------------------------------------- tokenizer refresh lifecycle

  private[graft] def bpeRefreshRoot(): java.nio.file.Path =
    graft.sources.TmpStores.pidScopedRoot("graft-bperefresh")

  /** Encode one ERA's documents into store rows: md5 training order
    * within the era offset by the store's current size, the vocab
    * version stamped on every row. One codegen'd expression, zero
    * shuffle beyond the rank's 256-bucket discipline. */
  private def encodeEra(docs: DataFrame, table: Seq[(String, String)],
      era: Long, vocab: Long, offset: Long, nShards: Int): DataFrame = {
    val spark = docs.sparkSession
    val ids = docs
      .withColumn("toks", TextOps.tokens(col("text")))
      .filter(size(col("toks")) > 0)
      .select("doc_id")
    TextOps.withBpePieces(
      shuffleRanks(spark, ids)
        .join(docs, Seq("doc_id"))
        .withColumn("toks", TextOps.tokens(col("text"))), table)
      .select(col("doc_id"), (col("pos") + offset).as("pos"),
        size(col("pcs")).cast("long").as("n_bpe"),
        array_join(col("pcs"), " ").as("tok_str"),
        lit(vocab).as("vocab"),
        ((col("pos") + offset) % nShards).as("shard"),
        lit(era).as("era"))
  }

  /** Corpus-level BPE FERTILITY (pieces per word, integer ppm) under an
    * arbitrary merge table — the tokenizer-quality scalar the refresh
    * canary compares: one codegen'd narrow aggregation, no shuffle
    * beyond the final 1-row fold. */
  private[graft] def fertilityPpm(docs: DataFrame,
      table: Seq[(String, String)]): Long = {
    TextOps.withBpePieces(
      docs
        .withColumn("toks", TextOps.tokens(col("text")))
        .filter(size(col("toks")) > 0), table)
      .select(
        size(col("pcs")).cast("long").as("b"),
        size(col("toks")).cast("long").as("w"))
      // decimal(38) intermediate: sum(b) * 1e6 overflows Long around
      // 9.2e12 total pieces — inside the corpus scale this canary
      // targets — and a wrapped comparison would ship a worse vocab
      .agg(expr(
        "CAST((CAST(sum(b) AS DECIMAL(38,0)) * 1000000) DIV sum(w) AS BIGINT)"))
      .collect()(0).getLong(0)
  }

  /** VOCAB-DRIFT CANARY + conditional ship: a candidate merge table
    * replaces the committed artifact ONLY when it actually tokenizes the
    * accreted corpus better (strictly lower fertility ppm by at least
    * `minGainPpm`) — the tokenizer analog of the recluster shift canary:
    * an artifact refresh that buys nothing must not trigger an
    * era-rewrite fleet-wide. Ships as `gen=<version+1>` + CURRENT swap;
    * returns true when shipped. */
  private[graft] def shipVocabIfBetter(spark: SparkSession, docs: DataFrame,
      vocabDir: String, candidate: DataFrame,
      minGainPpm: Long = 1L): Boolean = {
    val spark0 = spark
    import spark0.implicits._
    val cand = candidate.orderBy("merge_rank").select("lhs", "rhs")
      .as[(String, String)].collect().toSeq
    val cur = currentVocab(spark, vocabDir)
    val (curF, candF) = (fertilityPpm(docs, cur), fertilityPpm(docs, cand))
    if (candF > curF - minGainPpm) false
    else {
      val next = s"$vocabDir/gen=${currentVocabVersion(vocabDir) + 1}"
      candidate.coalesce(1).write.mode("overwrite").parquet(next)
      graft.sources.Stage.atomicRepoint(vocabDir, next)
      // the superseded artifact generations drop with the ship (the
      // blue/green old-index delete): encoded rows reference versions by
      // NUMBER, never by re-reading old bytes, so history is dead weight
      graft.sources.Stage.dropStaleGenerations(vocabDir)
      true
    }
  }

  /** BUILD phase of the TOKENIZER REFRESH lifecycle — the vocab-drift
    * analog of the ANN centroid refresh (`SimilarityOps.annRecluster`):
    *
    *  1. the PINNED v0 merge table ([[TextOps.BpeMergeTable]]) ships as
    *     `gen=0` of the versioned vocab artifact (blue/green CURRENT
    *     swap — `Stage.atomicRepoint`), and era 0 (even doc_ids) lands
    *     in the encoded-corpus store under the artifact READ BACK from
    *     its committed bytes — rows are (doc_id, pos, n_bpe, tok_str,
    *     vocab), laid out `era=`/`shard=`-partitioned, positions
    *     immutable;
    *  2. the vocabulary RETRAINS on the accreted corpus
    *     ([[TextOps.bpeMergesFromTokens]], deterministic rounds) and the
    *     candidate ships ONLY through the [[shipVocabIfBetter]] fertility
    *     canary (spec-asserted to trip on every gated corpus — the
    *     oracle-coupling discipline the recluster canary follows);
    *  3. era 1 (odd doc_ids) appends under the committed artifact,
    *     positions continuing the store's tail.
    *
    * Returns the store path; [[bpeRefreshApply]] is the refresh pass. */
  private[graft] def bpeRefreshBuild(spark: SparkSession, dir: String,
      k: Int = 6, nShards: Int = 4): String = {
    val spark0 = spark
    import spark0.implicits._
    val root = bpeRefreshRoot()
    Seq("store", "vocab").foreach(d =>
      graft.sources.TmpStores.deleteRecursively(root.resolve(d)))
    val store = root.resolve("store").toString
    val vocabDir = root.resolve("vocab").toString
    val docs = Tables(spark, dir, "documents").select("doc_id", "text")
    // v0 ships as a real artifact generation — era 0 encodes under the
    // committed bytes, not the in-memory literal
    TextOps.BpeMergeTable.zipWithIndex
      .map { case ((a, b), i) => (i.toLong + 1, a, b) }
      .toDF("merge_rank", "lhs", "rhs")
      .coalesce(1).write.mode("overwrite").parquet(s"$vocabDir/gen=0")
    graft.sources.Stage.atomicRepoint(vocabDir, s"$vocabDir/gen=0")
    val evens = docs.filter(col("doc_id") % 2 === 0)
    val sel = Seq("doc_id", "pos", "n_bpe", "tok_str", "vocab", "shard", "era")
      .map(col)
    encodeEra(evens, currentVocab(spark, vocabDir), era = 0L, vocab = 0L,
      offset = 0L, nShards = nShards)
      .select(sel: _*)
      .repartitionByRange(nShards, col("shard"))
      .sortWithinPartitions("shard", "pos")
      .write.mode("append").partitionBy("era", "shard").parquet(store)
    // retrain on the full accreted corpus; the candidate ships only
    // through the fertility canary
    val merges = TextOps.bpeMergesFromTokens(
      docs.select(explode(TextOps.tokens(col("text"))).as("word")), k)
    shipVocabIfBetter(spark, docs, vocabDir, merges)
    val vNow = currentVocabVersion(vocabDir)
    val nEra0 = spark.read.parquet(store).count()
    val odds = docs.filter(col("doc_id") % 2 === 1)
    encodeEra(odds, currentVocab(spark, vocabDir), era = 1L, vocab = vNow,
      offset = nEra0, nShards = nShards)
      .select(sel: _*)
      .repartitionByRange(nShards, col("shard"))
      .sortWithinPartitions("shard", "pos")
      .write.mode("append").partitionBy("era", "shard").parquet(store)
    store
  }

  /** The committed artifact's version — the `gen=N` the CURRENT marker
    * names. */
  private[graft] def currentVocabVersion(vocabDir: String): Long =
    graft.sources.Stage.currentTarget(vocabDir)
      .map(t => new org.apache.hadoop.fs.Path(t).getName
        .stripPrefix("gen=").toLong)
      .getOrElse(throw new IllegalStateException(
        s"no committed vocab artifact in $vocabDir"))

  /** The committed merge table, read back from the versioned artifact. */
  private[graft] def currentVocab(spark: SparkSession,
      vocabDir: String): Seq[(String, String)] = {
    val spark0 = spark
    import spark0.implicits._
    spark.read.parquet(graft.sources.Stage.currentTarget(vocabDir).get)
      .orderBy("merge_rank").select("lhs", "rhs")
      .as[(String, String)].collect().toSeq
  }

  /** REFRESH phase: re-encode ONLY the eras written under a stale vocab
    * — the touched-partition overwrite discipline
    * (`SimilarityOps.reclusterApply`): per-era min(vocab) finds the
    * stale eras (a slim column agg), their documents re-encode under
    * the CURRENT artifact with doc_id/pos/era/shard untouched (positions
    * are immutable — only the payload and its vocab stamp move), and
    * the rewrite commits by dynamic partition overwrite on exactly the
    * stale `era=`/`shard=` directories — every era already on the
    * current vocab keeps its exact files (byte-identity spec-asserted).
    * Returns the rows re-encoded. */
  private[graft] def bpeRefreshApply(spark: SparkSession, dir: String,
      nShards: Int = 4): Long = {
    val root = bpeRefreshRoot()
    bpeRefreshApplyAt(spark,
      Tables(spark, dir, "documents").select("doc_id", "text"),
      root.resolve("store").toString, root.resolve("vocab").toString, nShards)
  }

  /** The REFRESH pass against an ARBITRARY encoded store + versioned
    * vocab artifact — the path-parameterized core of [[bpeRefreshApply]],
    * also wired into the PRODUCTION incremental tokenized store
    * ([[graft.streaming.CurationStream]]'s `tokenStoreDir` with a
    * `vocabDir`). `carry` names extra per-row columns that ride the
    * rewrite untouched — the windowed store carries `win`: the context-
    * window grid is the training loop's RESUME CONTRACT (positions and
    * window ids are immutable), so a refresh moves only the payload
    * (tok_str, n_bpe) and its vocab stamp; the next full repack — a
    * batch rebuild — restores exact ctx-token packing under the new
    * fertility. */
  private[graft] def bpeRefreshApplyAt(spark: SparkSession, docs: DataFrame,
      store: String, vocabDir: String, nShards: Int = 4,
      carry: Seq[String] = Nil): Long = {
    val spark0 = spark
    import spark0.implicits._
    healRepackSwap(store)
    val v1 = currentVocab(spark, vocabDir)
    val currentVersion = currentVocabVersion(vocabDir)
    // the refresh rewrites IN PLACE inside the committed generation
    // (dynamic partition overwrite of exactly the stale eras' dirs) —
    // resolve the marker once; reads and the overwrite share the dir
    val dataDir = storeDataDir(store)
    // Head-of-pass staging sweep, BEFORE the stale.isEmpty early return:
    // a crash after the dynamic overwrite committed but before the
    // staging delete below orphans a data-sized dir, and the next pass
    // would otherwise early-return on stale.isEmpty without ever
    // sweeping it. For a flat legacy store the staging path
    // (store.refresh.tmp) sits OUTSIDE the store root, where no
    // generation GC reclaims it — sweep the flat-root spelling too in
    // case the store migrated to gen= layout after such a crash. Both
    // deletes are no-op cheap when nothing is orphaned.
    graft.sources.Hfs.delete(
      new org.apache.hadoop.fs.Path(dataDir + RefreshStagingSuffix))
    if (dataDir != store) graft.sources.Hfs.delete(
      new org.apache.hadoop.fs.Path(store + RefreshStagingSuffix))
    spark.catalog.refreshByPath(dataDir)
    val all = spark.read.parquet(dataDir)
    val stale = all.groupBy("era").agg(min(col("vocab")).as("v"))
      .filter(col("v") < currentVersion)
      .select(col("era").cast("long")).as[Long].collect().sorted.toSeq
    if (stale.isEmpty) return 0L
    val rewritten0 = TextOps.withBpePieces(
      all
        .filter(col("era").isin(stale.map(java.lang.Long.valueOf): _*))
        .select((Seq("doc_id", "pos", "shard", "era") ++ carry).map(col): _*)
        .join(docs, Seq("doc_id"))
        .withColumn("toks", TextOps.tokens(col("text"))), v1)
      .select(Seq(col("doc_id"), col("pos"),
        size(col("pcs")).cast("long").as("n_bpe"),
        array_join(col("pcs"), " ").as("tok_str"),
        lit(currentVersion).as("vocab"), col("shard"), col("era")) ++
        carry.map(col): _*)
    // Lineage-free before the overwrite (the dynamic write replaces the
    // very partitions this frame reads) via DURABLE staging beside the
    // data dir — not a localCheckpoint: the rewrite is data-sized (every
    // stale era), and executor block-manager storage is neither sized
    // for that at corpus scale nor replayable on executor loss. A crash
    // leaves only the staging dir (swept at the head of the next pass
    // here, or with its generation by the rewrite GC); a crash mid-
    // overwrite leaves some eras rewritten and others stale — the vocab
    // stamp rides in the data, so the next refresh re-derives exactly
    // the remaining stale eras (idempotent).
    val staging = new org.apache.hadoop.fs.Path(dataDir + RefreshStagingSuffix)
    graft.sources.Hfs.delete(staging)
    rewritten0.write.parquet(staging.toString)
    val rewritten = spark.read.parquet(staging.toString)
    // metadata-only count over the staged bytes — the rows the
    // overwrite commits
    val n = rewritten.count()
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try rewritten
      .repartitionByRange(nShards, col("shard"))
      .sortWithinPartitions("shard", "pos")
      .write.mode("overwrite").partitionBy("era", "shard").parquet(dataDir)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    graft.sources.Hfs.delete(staging)
    spark.catalog.refreshByPath(dataDir)
    n
  }

  private val RefreshStagingSuffix = ".refresh.tmp"

  /** Per-(era, shard) manifest fold — [[foldTokenManifests]]'s O(1)-state
    * streaming discipline keyed on the era/shard pair, digest chained
    * over the encoded piece streams in pos order. */
  private[graft] def foldEraManifests(
      it: Iterator[(Long, Long, Long, Long, String, Long)])
      : Iterator[(Long, Long, Long, Long, Long, Long, Long, String)] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Long, Long, Long, Long, String)]
    var curE = -1L; var curS = -1L; var acc = ""; var n = 0L; var toks = 0L
    var minP = Long.MaxValue; var maxP = Long.MinValue; var voc = -1L
    def flush(): Unit =
      if (curE >= 0) out += ((curE, curS, n, toks, minP, maxP, voc, acc))
    while (it.hasNext) {
      val (era, shard, pos, nBpe, tokStr, vocab) = it.next()
      if (era != curE || shard != curS) {
        flush(); curE = era; curS = shard; acc = ""; n = 0L; toks = 0L
        minP = Long.MaxValue; maxP = Long.MinValue; voc = -1L
      }
      acc = digestStepStr(md, acc, tokStr)
      n += 1L; toks += nBpe
      if (pos < minP) minP = pos
      if (pos > maxP) maxP = pos
      if (vocab > voc) voc = vocab
    }
    flush()
    out.iterator
  }

  /** OFFLINE WINDOW REPACK — the deliberate O(store) completion of the
    * tokenizer-refresh story: [[bpeRefreshApplyAt]] moves only the
    * payload (the window grid is the training loop's resume contract),
    * so after a refresh the grid still reflects the OLD vocab's token
    * counts — windows drift from exact `ctx`-token packing by the
    * fertility delta. Between training runs (when no resume state pins
    * the grid) this pass recomputes the ENTIRE window assignment from
    * the refreshed payload's token counts: positions stay immutable
    * (the training order is the corpus's identity), windows and shards
    * re-derive from the same two-pass prefix sum the incremental writer
    * uses, and the store rewrites in one shuffle keyed on the new shard.
    * Returns the rows repacked. Run rarely by design — the batch
    * rebuild's cost with the incremental store's lineage.
    *
    * COMMIT discipline: the repacked store lands complete in a FRESH
    * `gen=` dir FIRST — never an in-place overwrite of the path being
    * read (which would need the whole store materialized in executor
    * storage and would lose the store to a JVM death mid-write) — then
    * the CURRENT marker atomically repoints ([[storeDataDir]]) and the
    * superseded bytes GC. The store path is never absent mid-swap; a
    * crash before the repoint leaves the old generation committed and
    * the half-written one as garbage the next commit sweeps. A flat
    * legacy store migrates to the marker layout on its first repack. */
  private[graft] def repackTokenizedStore(spark: SparkSession, store: String,
      ctx: Long, nShards: Int): Long = {
    val spark0 = spark
    import spark0.implicits._
    healRepackSwap(store)
    spark.catalog.refreshByPath(store)
    val all = spark.read.parquet(storeDataDir(store))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("n_bpe").cast("long").as("n_bpe"), col("tok_str"),
        col("vocab").cast("long").as("vocab"), col("era").cast("long").as("era"))
    // the prefix-sum bucket must be monotone in pos — and the store
    // spans SEVERAL ranking cohorts (each era restarted its md5 ranking
    // at its own offset), so the md5 bucket of the incremental writer
    // does NOT qualify here. pos is dense by construction, so bucket =
    // pos div ceil(N/256): exactly ≤256 buckets, monotone trivially.
    // empty store: agg(max(pos)) is a null row — a token store with no
    // rows yet is a no-op repack, not an NPE out of the nightly pass
    val maxPos = all.agg(max(col("pos"))).collect()(0)
    if (maxPos.isNullAt(0)) return 0L
    val nPos = maxPos.getLong(0) + 1L
    val posBucket = math.max(1L, (nPos + 255L) / 256L)
    // vocab/era RIDE THROUGH the prefix sum (withTokenStartBy keeps
    // every input column) — one FileSourceScan of the store, not a
    // second scan + shuffle to re-join them on doc_id
    val repacked = withTokenStartBy(
      all.select("doc_id", "pos", "n_bpe", "tok_str", "vocab", "era"),
      expr(s"cast(pos div ${posBucket}L as int)"))
      .withColumn("win", expr(s"start div $ctx"))
      .select(col("doc_id"), col("pos"), col("n_bpe"), col("tok_str"),
        col("win"), (col("win") % nShards).as("shard"),
        col("vocab"), col("era"))
    // complete in a FRESH generation first (reads the old generation,
    // writes elsewhere — no in-memory checkpoint of the whole store),
    // then the marker-atomic commit: repoint CURRENT, GC the rest. The
    // store path is never absent mid-swap, a crash before the repoint
    // leaves the old generation committed and the half-written one as
    // garbage for the next commit's GC.
    val nextGen = nextStoreGen(store)
    repacked
      .repartitionByRange(nShards, col("shard"))
      .sortWithinPartitions("shard", "win", "pos")
      .write.mode("overwrite").partitionBy("era", "shard").parquet(nextGen)
    // metadata-only count over the durable new-generation bytes — the
    // value the swap actually commits
    val n = spark.read.parquet(nextGen).count()
    commitStoreGen(spark, store, nextGen)
    n
  }

  private val RepackTmpSuffix = ".repack.tmp"

  // ---------------- marker-indirect training-store layout (gen=/CURRENT)

  /** Resolve a training store's LIVE data dir: the CURRENT marker's
    * target for a marker-indirected store, the path itself for a flat
    * legacy store (pre-first-repack). Every reader and writer of the
    * incremental curated/tokenized stores resolves through here, which
    * is what makes the offline rewrites' swaps marker-atomic: a repack
    * commits a fresh `gen=N` dir and atomically repoints CURRENT (the
    * [[graft.sources.Stage.publishBlueGreen]] discipline) — the store
    * path is NEVER absent, and a pre-swap reader that resolved the old
    * generation keeps reading it until the post-swap GC drops it. */
  private[graft] def storeDataDir(store: String): String =
    graft.sources.Stage.currentTarget(store).getOrElse(store)

  /** The next generation dir a store rewrite commits into: one past the
    * highest existing `.gen=` child (a crashed rewrite's half-written
    * generation is never reused — it is garbage the next commit's GC
    * sweeps). A flat legacy store starts at `.gen=0`.
    *
    * The DOT prefix is load-bearing: Spark's partition discovery skips
    * dot-hidden children, so a generation half-written INSIDE a still-
    * flat store (first migration crashed before its repoint, or a
    * concurrent reader racing a live first migration) can never collide
    * with the flat `era=/shard=` layout and poison the read root with
    * conflicting partition structures — an explicit read of the
    * committed `store/.gen=N` root itself is unaffected (roots are
    * exempt from the hidden-name filter). */
  private[graft] val StoreGenPrefix = ".gen="

  private def nextStoreGen(store: String): String = {
    val maxGen =
      (if (graft.sources.Hfs.isDir(store))
        graft.sources.Hfs.children(store)(_.startsWith(StoreGenPrefix))
          .flatMap(p => scala.util.Try(
            p.getName.stripPrefix(StoreGenPrefix).toLong).toOption)
      else Nil).foldLeft(-1L)(math.max)
    s"$store/$StoreGenPrefix${maxGen + 1}"
  }

  /** Drop every child of `store` that is not the committed generation
    * or the marker — superseded generations, a crashed rewrite's
    * half-written generation, and (after the first migration) the
    * legacy flat partition dirs. Runs AFTER the atomic repoint, so a
    * pre-swap reader never loses a reachable byte mid-swap; compares by
    * FILE NAME against the committed target (the ClaimStore generation-
    * cleanup discipline). */
  private[graft] def dropStaleStoreData(store: String): Unit =
    graft.sources.Stage.currentTarget(store)
      .map(t => new org.apache.hadoop.fs.Path(t).getName)
      .foreach { keep =>
        graft.sources.Hfs.children(store)(n =>
          n != keep && n != "CURRENT" && n != "CURRENT.tmp")
          .foreach(p => graft.sources.Hfs.delete(p))
      }

  /** Commit a rewritten generation: atomic marker repoint, then GC. */
  private def commitStoreGen(spark: SparkSession, store: String,
      gen: String): Unit = {
    graft.sources.Stage.atomicRepoint(store, gen)
    dropStaleStoreData(store)
    spark.catalog.refreshByPath(store)
  }

  /** SMALL-FILES COMPACTION for the INCREMENTAL training stores — the
    * file-count bound the claim stores get from their leveled folds,
    * applied to the append-only curated/tokenized shard stores: every
    * micro-batch appends one tail file per shard, so a long-running
    * stream accretes batches×shards files whose per-file open/footer
    * cost eventually dominates the training read (and whose count
    * swamps the namenode). This pass rewrites the store into
    * ~one well-sized file per partition dir — rows, positions, windows
    * all byte-equal (the per-shard manifests are spec-asserted
    * identical); only the file layout moves. Commit is the
    * [[repackTokenizedStore]] discipline: complete in a fresh `gen=`
    * dir, marker-atomic repoint, GC. Run BETWEEN
    * training runs — like the repack, it invalidates file-grain resume
    * state, never row-grain state. Returns (files before, files after).
    *
    * `partitionCols` is the store's physical layout (`shard` for the
    * flat stores, `era, shard` for the vocab-versioned token store);
    * `sortCols` the within-partition order the writers maintain. */
  private[graft] def compactShardStore(spark: SparkSession, store: String,
      partitionCols: Seq[String], sortCols: Seq[String],
      nShards: Int): (Long, Long) = {
    healRepackSwap(store)
    spark.catalog.refreshByPath(store)
    def dataFiles(p: String): Long = {
      val root = new org.apache.hadoop.fs.Path(p)
      val f = graft.sources.Hfs.fs(root)
      def walk(st: org.apache.hadoop.fs.FileStatus): Long =
        if (st.isDirectory) f.listStatus(st.getPath).map(walk).sum
        else if (st.getPath.getName.endsWith(".parquet")) 1L else 0L
      if (!f.exists(root)) 0L else walk(f.getFileStatus(root))
    }
    val before = dataFiles(storeDataDir(store))
    val all = spark.read.parquet(storeDataDir(store))
    // one shuffle keyed on the leading partition column routes each
    // partition dir to one task → one well-sized file per dir (the
    // Stage.stageNodes small-files discipline); a partition that
    // outgrows a single task would raise nShards, not this pass.
    // Commit is the repack's marker-atomic discipline: complete in a
    // fresh generation, repoint CURRENT, GC the superseded bytes.
    val nextGen = nextStoreGen(store)
    all
      .repartitionByRange(nShards, partitionCols.map(col): _*)
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      .write.mode("overwrite").partitionBy(partitionCols: _*)
      .parquet(nextGen)
    commitStoreGen(spark, store, nextGen)
    (before, dataFiles(storeDataDir(store)))
  }

  /** Finish a crashed LEGACY repack swap (the pre-marker delete+rename
    * discipline): the old store was removed but the rename never ran —
    * every byte is still in the tmp dir, so move it into place. The
    * marker-indirect commit ([[storeDataDir]]) has no such window; this
    * stays at the head of the repack/refresh passes only to heal a
    * store a pre-migration deployment crashed mid-swap. */
  private[graft] def healRepackSwap(store: String): Unit = {
    val sp = new org.apache.hadoop.fs.Path(store)
    val tmp = new org.apache.hadoop.fs.Path(store + RepackTmpSuffix)
    val f = graft.sources.Hfs.fs(sp)
    if (!f.exists(sp) && f.exists(tmp)) {
      if (!f.rename(f.makeQualified(tmp), f.makeQualified(sp)))
        throw new java.io.IOException(
          s"could not finish the crashed repack swap $tmp -> $store")
    }
  }

  /** [[foldEraManifests]] for the WINDOWED production store: same
    * O(1)-state streaming fold keyed on (era, shard), plus the window
    * fields — win is monotone in pos within a shard (the window id is a
    * running-token-offset quotient), so the distinct-window count is a
    * transition count, never a buffered set. Input rows sorted by
    * (era, shard, pos): (era, shard, pos, win, n_bpe, tok_str, vocab). */
  private[graft] def foldEraWindowManifests(
      it: Iterator[(Long, Long, Long, Long, Long, String, Long)])
      : Iterator[(Long, Long, Long, Long, Long, Long, Long, Long, Long, Long, String)] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Long, Long, Long, Long, Long, Long, Long, String)]
    var curE = -1L; var curS = -1L; var acc = ""; var n = 0L; var toks = 0L
    var wins = 0L; var lastWin = Long.MinValue
    var minP = Long.MaxValue; var maxP = Long.MinValue
    var minW = Long.MaxValue; var maxW = Long.MinValue; var voc = -1L
    def flush(): Unit =
      if (curE >= 0) out += ((curE, curS, n, wins, toks, minP, maxP, minW, maxW, voc, acc))
    while (it.hasNext) {
      val (era, shard, pos, win, nBpe, tokStr, vocab) = it.next()
      if (era != curE || shard != curS) {
        flush(); curE = era; curS = shard; acc = ""; n = 0L; toks = 0L
        wins = 0L; lastWin = Long.MinValue
        minP = Long.MaxValue; maxP = Long.MinValue
        minW = Long.MaxValue; maxW = Long.MinValue; voc = -1L
      }
      acc = digestStepStr(md, acc, tokStr)
      n += 1L; toks += nBpe
      if (win != lastWin) { wins += 1L; lastWin = win }
      if (pos < minP) minP = pos
      if (pos > maxP) maxP = pos
      if (win < minW) minW = win
      if (win > maxW) maxW = win
      if (vocab > voc) voc = vocab
    }
    flush()
    out.iterator
  }

  /** Fold the era/vocab-stamped WINDOWED token store into its
    * per-(era, shard) loader manifest — k streaming tasks, O(1) state. */
  private[graft] def tokenizedEraManifest(spark: SparkSession,
      store: DataFrame, nShards: Int): DataFrame = {
    val spark0 = spark
    import spark0.implicits._
    store
      .select(col("era").cast("long").as("_1"), col("shard").cast("long").as("_2"),
        col("pos").cast("long").as("_3"), col("win").cast("long").as("_4"),
        col("n_bpe").cast("long").as("_5"), col("tok_str").as("_6"),
        col("vocab").cast("long").as("_7"))
      .as[(Long, Long, Long, Long, Long, String, Long)]
      .repartition(nShards, col("_1"), col("_2"))
      .sortWithinPartitions("_1", "_2", "_3")
      .mapPartitions(foldEraWindowManifests)
      .toDF("era", "shard", "n_docs", "n_windows", "n_tokens", "min_pos",
        "max_pos", "min_win", "max_win", "vocab", "token_digest")
      .orderBy("era", "shard")
  }

  /** TOKENIZER REFRESH LIFECYCLE, oracle-gated end to end: era 0 (evens)
    * encodes under the pinned v0 table, the vocabulary retrains on the
    * accreted corpus into a versioned blue/green artifact, era 1 (odds)
    * appends under the committed artifact, and the refresh pass
    * re-encodes ONLY the stale era's partitions (positions immutable,
    * current-vocab partitions byte-identical — spec-asserted). The
    * output is the per-(era, shard) loader manifest of the refreshed
    * store read back from disk; the DuckDB oracle replays the
    * deterministic merge training rounds, the per-era md5 ranking, the
    * unrolled retrained-table encode of EVERY document, and each
    * manifest field including the pos-ordered token digest — a
    * regression in the trainer, the artifact round trip, the stale-era
    * detection, or the touched-partition rewrite flips a row red. */
  def bpeRefreshStore(spark: SparkSession, dir: String): DataFrame = {
    val spark0 = spark
    import spark0.implicits._
    val nShards = 4
    val store = bpeRefreshBuild(spark, dir, k = 6, nShards = nShards)
    bpeRefreshApply(spark, dir, nShards = nShards)
    spark.read.parquet(store)
      .select(col("era").cast("long").as("_1"), col("shard").cast("long").as("_2"),
        col("pos").cast("long").as("_3"), col("n_bpe").cast("long").as("_4"),
        col("tok_str").as("_5"), col("vocab").cast("long").as("_6"))
      .as[(Long, Long, Long, Long, String, Long)]
      .repartition(nShards, col("_1"), col("_2"))
      .sortWithinPartitions("_1", "_2", "_3")
      .mapPartitions(foldEraManifests)
      .toDF("era", "shard", "n_docs", "n_tokens", "min_pos", "max_pos",
        "vocab", "token_digest")
      .orderBy("era", "shard")
  }

  def zorderStats(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val maxes = docs.agg(
      max(col("n_chars")).as("max_x"), max(col("doc_id")).as("max_y"))
    val z = zInterleaveSql("xs", "ys", 10)
    docs.crossJoin(broadcast(maxes))
      .select(col("doc_id"), col("n_chars"),
        expr("(n_chars * 1024) div (max_x + 1)").as("xs"),
        expr("(doc_id * 1024) div (max_y + 1)").as("ys"))
      .withColumn("zval", expr(z))
      .withColumn("bucket", expr("shiftright(zval, 16)"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_chars")).as("min_chars"), max(col("n_chars")).as("max_chars"),
        min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
      .orderBy("bucket")
  }
}
