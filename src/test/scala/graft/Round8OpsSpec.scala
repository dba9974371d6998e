package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{DedupOps, LayoutOps, SimilarityOps, TextOps}
import graft.sources.Tables

/** Golden semantics for the round-8 operators: the deterministic global
  * training-order shuffle, the HLL++ distinct-count sketch gate, the
  * bloom-prefiltered decontamination twin, and the composed curation
  * funnel.
  */
class Round8OpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"

  test("corpusShuffle emits a permutation matching the md5 rank order, with ±1-balanced shards") {
    val out = LayoutOps.corpusShuffle(spark, dir).collect()
    val n = out.length
    assert(out.map(_.getLong(1)).sorted.toSeq == (0L until n).toSeq,
      "pos must be a permutation of 0..n-1")
    // driver reference: rank by (md5(doc_id), doc_id)
    val ref = out.map(_.getLong(0)).sorted
      .map(id => (org.apache.commons.codec.digest.DigestUtils.md5Hex(id.toString), id))
      .sorted.zipWithIndex.map { case ((_, id), i) => id -> i.toLong }.toMap
    out.foreach { r =>
      assert(r.getLong(1) == ref(r.getLong(0)),
        s"doc ${r.getLong(0)}: pos ${r.getLong(1)} != reference ${ref(r.getLong(0))}")
    }
    val sizes = out.groupBy(_.getLong(2)).view.mapValues(_.length).values.toSeq
    assert(sizes.max - sizes.min <= 1, s"round-robin shards must balance to ±1, got $sizes")
  }

  test("corpusShuffleUpsert keeps existing positions immutable and appends arrivals at the tail") {
    val docs = Tables(spark, dir, "documents")
    val upsert = LayoutOps.corpusShuffleUpsert(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    val standalone = LayoutOps.shuffleRanks(spark, docs.filter(col("doc_id") % 5 =!= 0))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    standalone.foreach { case (id, pos) =>
      assert(upsert(id) == ((pos, pos % 8, false)),
        s"doc $id: existing position must be immutable under the upsert")
    }
    val nOld = standalone.size
    val tail = upsert.collect { case (_, (pos, _, true)) => pos }.toSeq.sorted
    assert(tail == (nOld.toLong until (nOld + tail.size).toLong).toSeq,
      "arrivals must occupy exactly the contiguous tail positions")
    val newShards = upsert.collect { case (_, (_, s, true)) => s }
      .groupBy(identity).view.mapValues(_.size).values.toSeq
    assert(newShards.max - newShards.min <= 1,
      "tail interleave must spread arrivals across shards to ±1")
  }

  test("distinctTokensSketch: exact counts match a driver recount and the HLL gate holds") {
    val out = TextOps.distinctTokensSketch(spark, dir).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getBoolean(3)), "within_eps must hold on every group")
    val docs = Tables(spark, dir, "documents")
      .select(col("lang"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val exact = docs.groupBy(_._1).map { case (lang, rs) =>
      val toks = rs.flatMap(_._2.split("\\s+")).filter(_.nonEmpty)
      lang -> (toks.length.toLong, toks.distinct.length.toLong)
    }
    out.foreach { r =>
      val (nTok, nDis) = exact(r.getString(0))
      assert(r.getLong(1) == nTok && r.getLong(2) == nDis,
        s"lang ${r.getString(0)}: (${r.getLong(1)}, ${r.getLong(2)}) != ($nTok, $nDis)")
    }
  }

  test("sketchMergeParity: union path is bit-exact and agrees with the exact distinct counts") {
    val merged = TextOps.sketchMergeParity(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2), r.getBoolean(3))).toMap
    val exact = TextOps.distinctTokensSketch(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(merged.keySet == exact.keySet)
    merged.foreach { case (lang, (nd, mergeExact, withinEps)) =>
      assert(nd == exact(lang), s"$lang: cross-operator n_distinct mismatch")
      assert(mergeExact, s"$lang: sharded union must equal the direct build")
      assert(withinEps, s"$lang: estimate must sit within the 5-sigma bound")
    }
  }

  test("bigram-interpolated surprisal beats the unigram model on natural text") {
    val uni = TextOps.unigramLogprob(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val bi = TextOps.bigramLogprob(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(bi.keySet == uni.keySet)
    bi.foreach { case (id, (n, _)) =>
      assert(n == uni(id)._1, s"doc $id: token counts must agree across the two models")
    }
    val meanUni = uni.values.map(_._2).sum / uni.size
    val meanBi = bi.values.map(_._2).sum / bi.size
    assert(meanBi < meanUni,
      f"word order must carry information: bigram $meanBi%.3f !< unigram $meanUni%.3f")
  }

  test("embedDrift matches a driver recompute of the fixed-point centroid cosine") {
    val out = SimilarityOps.embedDrift(spark, dir).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val vecs = Tables(spark, dir, "embeddings")
      .select("label", "vec_id", "embedding").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Float](2)))
    val ref = vecs.groupBy(_._1).map { case (label, rs) =>
      def centroid(par: Int): Array[Long] = {
        val slice = rs.filter(_._2 % 2 == par)
        val d = rs.head._3.length
        val acc = Array.fill(d)(0L)
        slice.foreach(_._3.zipWithIndex.foreach { case (x, i) =>
          acc(i) += math.floor(x.toDouble * 1000d + 0.5d).toLong })
        acc
      }
      val (a, b) = (centroid(0), centroid(1))
      val dot = a.zip(b).map { case (x, y) => x * y }.sum.toDouble
      val na = math.sqrt(a.map(x => x * x).sum.toDouble)
      val nb = math.sqrt(b.map(x => x * x).sum.toDouble)
      label -> (rs.count(_._2 % 2 == 0).toLong, rs.count(_._2 % 2 == 1).toLong,
        BigDecimal(dot / (na * nb)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    assert(out == ref, "distributed fixed-point drift must equal the driver reference")
  }

  test("decontaminateBloom returns exactly the exact pass's hit set (bloom is only a prefilter)") {
    val exact = DedupOps.decontaminate(spark, dir)
      .filter(col("n_overlap") >= 1)
      .select("doc_id", "n_overlap", "contaminated")
      .collect().map(_.toSeq).toSet
    val bloomed = DedupOps.decontaminateBloom(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(bloomed == exact, "bloom-gated verdicts must be identical to the exact join")
  }

  test("decontaminateBloom plan carries the native might_contain gate, not a UDF") {
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => p +: flatten(a.executedPlan)
      case q: QueryStageExec        => p +: flatten(q.plan)
      case c: InMemoryTableScanExec => p +: flatten(c.relation.cachedPlan)
      case _                        => p +: p.children.flatMap(flatten)
    }
    val df = DedupOps.decontaminateBloom(spark, dir)
    df.count()
    val exprs = flatten(df.queryExecution.executedPlan)
      .flatMap(_.expressions).flatMap(_.collect { case x => x })
    assert(exprs.exists(_.isInstanceOf[BloomFilterMightContain]),
      "expected a native BloomFilterMightContain in the executed plan")
  }

  test("decontaminateSpans: spans are disjoint, maximal, and cover exactly the flagged docs") {
    val spans = DedupOps.decontaminateSpans(spark, dir).collect()
    val flagged = DedupOps.decontaminate(spark, dir)
      .filter(col("n_overlap") >= 1).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(spans.map(_.getLong(0)).toSet == flagged,
      "span docs must be exactly the docs the flag pass finds overlapping")
    spans.groupBy(_.getLong(0)).foreach { case (id, ss) =>
      val sorted = ss.sortBy(_.getLong(1))
      sorted.foreach { s =>
        assert(s.getLong(2) >= s.getLong(1) + 4, s"doc $id: span shorter than one shingle")
        assert(s.getLong(3) == s.getLong(2) - s.getLong(1) + 1)
      }
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getLong(1) > a.getLong(2) + 1,
            s"doc $id: adjacent/overlapping spans must have merged")
        case _ => ()
      }
    }
  }

  test("containmentDedup: every planted fragment scores exactly 1e6 ppm against its source") {
    val out = DedupOps.containmentDedup(spark, dir).collect()
    val pairs = out.map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    // sources whose token-5..44 slice yields >=3 distinct 5-gram shingles
    // (the pair-emission floor), recomputed on the driver
    val expected = Tables(spark, dir, "documents")
      .filter(col("doc_id") % 10 === 0)
      .select("doc_id", "text").collect()
      .filter { r =>
        val frag = r.getString(1).split("\\s+").filter(_.nonEmpty).slice(4, 44)
        frag.sliding(5).filter(_.length == 5).map(_.mkString(" ")).toSet.size >= 3
      }
      .map(_.getLong(0))
    assert(expected.nonEmpty)
    expected.foreach { id =>
      val r = pairs.getOrElse((id + 3000000L, id),
        fail(s"planted pair for doc $id missing"))
      assert(r.getLong(4) == 1000000L && r.getBoolean(5),
        s"doc $id: token-aligned fragment must be fully contained, got ${r.getLong(4)} ppm")
    }
    // asymmetry check: the planted pairs are exactly the case Jaccard misses
    out.filter(r => r.getLong(1) + 3000000L == r.getLong(0)).foreach { r =>
      assert(r.getLong(3) <= 40L, "fragment shingle set stays fragment-sized")
    }
  }

  test("corpusShuffleStore writes pos-sorted per-shard files whose union is the assignment") {
    val manifest = LayoutOps.corpusShuffleStore(spark, dir).collect()
    assert(manifest.length == 8 && manifest.map(_.getLong(1)).sum ==
      Tables(spark, dir, "documents").count())
    val root = new java.io.File(
      sys.props("java.io.tmpdir"),
      s"graft-shardstore-${ProcessHandle.current().pid()}/corpus_shuffle")
    val shardDirs = root.listFiles().filter(_.getName.startsWith("shard="))
    assert(shardDirs.map(_.getName).sorted.toSeq ==
      (0 until 8).map(i => s"shard=$i"))
    shardDirs.foreach { sd =>
      val shard = sd.getName.stripPrefix("shard=").toLong
      sd.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
        val rows = spark.read.parquet(f.getAbsolutePath)
          .select("pos").collect().map(_.getLong(0))
        assert(rows.sameElements(rows.sorted),
          s"file ${f.getName} in shard=$shard must be pos-sorted on disk")
        assert(rows.forall(_ % 8 == shard),
          s"every pos in shard=$shard must satisfy pos % 8 == $shard")
      }
    }
  }

  test("curation stream rejects duplicates across batches AND across restarts via the claim store") {
    import org.apache.spark.sql.SaveMode
    val spark0 = spark
    import spark0.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-curation-spec")
    def p(s: String) = root.resolve(s).toString
    // synthetic quality-passing text: >=10 words, 3..10 chars mean, >=2 markers
    val textA = "the quick brown fox jumps over a lazy dog and that is fine today"
    val textB = "a small bird sings of spring and the garden is full of light now"
    val evalSh = Seq.empty[String].toDF("g").persist()
    Seq((1L, textA), (2L, textB)).toDF("doc_id", "text")
      .coalesce(1).write.mode(SaveMode.Append).parquet(p("in"))
    Seq((3L, textA)).toDF("doc_id", "text")
      .coalesce(1).write.mode(SaveMode.Append).parquet(p("in"))
    val schema = spark.read.parquet(p("in")).schema
    val src1 = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(p("in"))
    graft.streaming.CurationStream.run(src1, evalSh, p("out"), p("ckpt1"))
      .awaitTermination()
    val v1 = spark.read.parquet(p("out")).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2), r.getBoolean(4))).toMap
    assert(v1(1L) == ((true, false, true)), "first copy admits")
    assert(v1(2L) == ((true, false, true)), "distinct doc admits")
    assert(v1(3L) == ((true, true, false)), "cross-batch duplicate must be rejected")
    // restart: a NEW stream over a new input dir, same claim store
    Seq((4L, textA), (5L, textB)).toDF("doc_id", "text")
      .coalesce(1).write.mode(SaveMode.Append).parquet(p("in2"))
    val src2 = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(p("in2"))
    graft.streaming.CurationStream.run(src2, evalSh, p("out"), p("ckpt2"))
      .awaitTermination()
    val v2 = spark.read.parquet(p("out")).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(2), r.getBoolean(4))).toMap
    assert(v2(4L) == ((true, false)) && v2(5L) == ((true, false)),
      "claims must survive a restart: duplicates of ever-claimed classes stay rejected")
    evalSh.unpersist()
    graft.sources.TmpStores.deleteRecursively(root)
  }

  test("curation stream read-back resolves a redelivered batch: own claims prove admission") {
    import org.apache.spark.sql.SaveMode
    val spark0 = spark
    import spark0.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-curation-redeliver")
    def p(s: String) = root.resolve(s).toString
    val textA = "the quick brown fox jumps over a lazy dog and that is fine today"
    val evalSh = Seq.empty[String].toDF("g").persist()
    Seq((1L, textA)).toDF("doc_id", "text")
      .coalesce(1).write.mode(SaveMode.Append).parquet(p("in"))
    val schema = spark.read.parquet(p("in")).schema
    def deliver(ckpt: String): Unit =
      graft.streaming.CurationStream.run(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(p("in")),
        evalSh, p("out"), p(ckpt)).awaitTermination()
    deliver("ckpt1")
    deliver("ckpt2") // same input, fresh checkpoint = an at-least-once redelivery
    val raw = spark.read.parquet(p("out")).collect()
    assert(raw.length == 2 && raw.map(_.getBoolean(4)).toSet == Set(true, false),
      "the redelivery must have emitted a conflicting (dup-of-own-claim) row")
    val resolved = spark.read.parquet(p("out"))
      .groupBy("doc_id")
      .agg(max(col("keep_quality")), min(col("is_dup")),
        max(col("is_contaminated")), max(col("admitted")))
      .collect()(0)
    assert(resolved.getBoolean(1) && !resolved.getBoolean(2) && resolved.getBoolean(4),
      "claim-respecting resolution must report the doc admitted, not duplicated")
    evalSh.unpersist()
    graft.sources.TmpStores.deleteRecursively(root)
  }

  test("curation stream admits exactly as many docs as the batch funnel's decontam stage") {
    val streamed = graft.streaming.CurationStream.curationStreamQuery(spark, dir)
    val admitted = streamed.filter(col("admitted")).count()
    val funnel = TextOps.curationPipeline(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(admitted == funnel("03_decontam"),
      "one admit per clean class with a quality-passing member, same as the batch funnel")
    streamed.unpersist()
  }

  test("curatedStore ships exactly the funnel's surviving docs/tokens, pos-sorted on disk") {
    val manifest = LayoutOps.curatedStore(spark, dir).collect()
    val funnel = TextOps.curationPipeline(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(manifest.map(_.getLong(1)).sum == funnel("03_decontam")._1,
      "store doc count must equal the funnel's decontam stage")
    assert(manifest.map(_.getLong(2)).sum == funnel("03_decontam")._2,
      "store token sum must equal the funnel's decontam stage")
    assert(manifest.map(_.getLong(0)).sorted.toSeq == (0L until 4L),
      "all 4 shards must be present")
    val root = new java.io.File(
      sys.props("java.io.tmpdir"),
      s"graft-shardstore-${ProcessHandle.current().pid()}/curated")
    root.listFiles().filter(_.getName.startsWith("shard=")).foreach { sd =>
      sd.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
        val pos = spark.read.parquet(f.getAbsolutePath)
          .select("pos").collect().map(_.getLong(0))
        assert(pos.sameElements(pos.sorted),
          s"curated ${sd.getName}/${f.getName} must be pos-sorted on disk")
      }
    }
  }

  test("mediaCuration verdicts come from real decodes and both modalities gate") {
    import graft.operators.MultimodalOps
    val out = MultimodalOps.mediaCuration(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3))).toMap
    assert(out.values.exists(v => !v._1), "some images must fail the min-dims rule")
    assert(out.values.exists(v => !v._2), "some audio must fail the duration rule")
    assert(out.values.exists(_._3), "some asset pairs must be admitted")
    out.foreach { case (id, (img, aud, keep)) =>
      assert(keep == (img && aud), s"doc $id: keep must be the conjunction")
      // rules replay the generator arithmetic the codecs round-trip
      assert(img == (16 + id % 48 >= 32 && 16 + id % 32 >= 24))
      val n = (64 + id % 128).toInt
      val peak = (0 until n).map(i => math.abs((id * 31 + i * 17) % 2003 - 1001)).max
      assert(aud == (n.toLong * 125 >= 12000 && peak >= 200))
    }
  }

  test("curationPipeline funnel is monotone and the splits partition the decontaminated set") {
    val out = TextOps.curationPipeline(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.keySet == Set("00_ingest", "01_quality", "02_dedup", "03_decontam",
      "04_split_train", "05_split_val", "06_split_test"))
    val stages = Seq("00_ingest", "01_quality", "02_dedup", "03_decontam").map(out)
    stages.sliding(2).foreach { case Seq((d1, t1), (d2, t2)) =>
      assert(d2 <= d1 && t2 <= t1, "each stage may only drop documents/tokens")
    }
    assert(stages.head._1 > 0 && stages.last._1 > 0, "the funnel must not drain to zero")
    assert(stages.head._1 > stages.last._1, "the fixture must exercise at least one drop")
    val (d3, t3) = out("03_decontam")
    val splits = Seq("04_split_train", "05_split_val", "06_split_test").map(out)
    assert(splits.map(_._1).sum == d3 && splits.map(_._2).sum == t3,
      "train/val/test must partition the surviving set exactly")
    // ingest row equals the raw corpus
    val docs = Tables(spark, dir, "documents")
      .agg(count(lit(1)), sum(size(TextOps.tokens(col("text")))).cast("long"))
      .collect()(0)
    assert(out("00_ingest") == ((docs.getLong(0), docs.getLong(1))))
  }
}
