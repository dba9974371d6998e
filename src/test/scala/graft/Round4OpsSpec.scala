package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.MisraGriesAgg
import graft.operators.{GraphBuild, LayoutOps, SimilarityOps, TextOps}

/** Golden semantics for the round-4 operators: BPE encode vs the pinned
  * merge table, Misra-Gries sketch guarantee + mergeability, UniMax
  * distributed prefix sum vs the naive window, and fixed-point PageRank
  * vs a driver-side reference implementation.
  */
class Round4OpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"

  private def docsDf(rows: Seq[(Long, String, String)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text", "lang")
  }

  // ---- BPE encode ----

  test("bpeEncode applies the pinned merges with trainer semantics") {
    // merge chain: t+a, ta+b, tab+l, tabl+e, r+o, ro+w, d+a, da+t
    //   "table" -> 1 piece, "row" -> 1, "data" -> "dat"+"a" = 2,
    //   "xyz" (no merges) -> 3, "tart" -> "ta"+"r"+"t" = 3
    val out = TextOps.bpeEncodeFrame(docsDf(Seq(
      (1L, "table table row", "en"),
      (2L, "data xyz tart", "en"))))
      .select("doc_id", "n_words", "n_bpe_tokens")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((1L, 3L, 3L), (2L, 3L, 8L)))
  }

  test("bpeEncode greedy replace is left-to-right non-overlapping") {
    // "dada": d+a twice -> "da da" = 2 pieces (da+t never fires);
    // "tata": t+a twice -> "ta ta" = 2; then no ta+b -> stays 2
    val out = TextOps.bpeEncodeFrame(docsDf(Seq((1L, "dada tata", "en"))))
      .select("n_bpe_tokens").collect().head.getLong(0)
    assert(out == 4L)
  }

  // ---- Misra-Gries ----

  test("MisraGries sketch keeps every item above the N/(k+1) guarantee") {
    val s = spark
    import s.implicits._
    // 600 a, 300 b, 60 distinct fillers ×2: N = 1020, k = 9 -> any item
    // with freq > 102 must survive (a and b)
    val items = Seq.fill(600)("a") ++ Seq.fill(300)("b") ++
      (1 to 60).flatMap(i => Seq(s"f$i", s"f$i"))
    val ds = items.toDS().repartition(4) // merge path across partitions
    val survivors = ds.select(new MisraGriesAgg(9).toColumn).head()
    assert(survivors.contains("a") && survivors.contains("b"))
    assert(survivors.size <= 9)
  }

  test("heavyHitters output is the exact threshold set on any layout") {
    val phiPpm = 700L
    val exact = TextOps.heavyHitters(spark, dir, phiPpm = phiPpm)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val toks = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(TextOps.tokens(col("text"))).as("token"))
    val n = toks.count()
    val truth = toks
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .filter(col("freq") * 1000000L >= n * phiPpm).orderBy("token")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(exact == truth && exact.nonEmpty)
  }

  test("heavyHitters plan: broadcast semi-join, no driver-embedded InSet") {
    val plan = TextOps.heavyHitters(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"candidate filter is not a broadcast semi-join:\n$plan")
    assert(!plan.contains("INSET") && !plan.contains("isInCollection"),
      s"candidate set embedded in the plan as literals:\n$plan")
  }

  // ---- UniMax sampling ----

  test("unimaxSample matches the naive single-window prefix sum") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val got = TextOps.unimaxSampleFrame(docs, budget = 500L)
    import org.apache.spark.sql.expressions.Window
    val naive = docs
      .select(col("doc_id"), col("lang"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"),
        expr("cast(conv(substring(md5(concat('unimax', cast(doc_id as string))), 1, 15), 16, 10) as bigint)")
          .as("shuffle_key"))
      .withColumn("cum_before",
        coalesce(sum(col("n_tokens")).over(
          Window.partitionBy("lang").orderBy("shuffle_key", "doc_id")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("kept", col("cum_before") + col("n_tokens") <= 500L)
      .select("doc_id", "lang", "n_tokens", "cum_before", "kept")
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty)
  }

  test("unimaxSample kept set respects the per-language budget") {
    val out = TextOps.unimaxSample(spark, dir, budget = 500L)
    val sums = out.filter(col("kept"))
      .groupBy("lang").agg(sum(col("n_tokens")).as("total"))
      .collect().map(_.getLong(1))
    assert(sums.nonEmpty && sums.forall(_ <= 500L))
  }

  // ---- PageRank ----

  test("pageRankLineage matches a driver-side reference on sf0.001") {
    val got = GraphBuild.pageRankLineage(spark, dir, iters = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val edges = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(concat(lit("tpch://part/"), col("l_partkey")).as("src"),
        concat(lit("tpch://sup/"), col("l_suppkey")).as("dst"))
      .distinct().collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val outdeg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val scale = 1000000000L
    var rank = nodes.map(_ -> scale).toMap
    for (_ <- 1 to 3) {
      val in = edges
        .map { case (s, d) => d -> (rank(s) * 85L) / (100L * outdeg(s)) }
        .groupBy(_._1).map { case (d, cs) => d -> cs.map(_._2).sum }
      rank = nodes.map(n => n -> (15L * scale / 100L + in.getOrElse(n, 0L))).toMap
    }
    assert(got == rank)
    // sources have no in-edges: exactly the damping base after iter 1+
    val sinks = edges.map(_._2).toSet
    assert(nodes.filterNot(sinks).forall(n => got(n) == 150000000L))
  }

  // ---- PMI collocations ----

  test("pmiBigrams matches a driver-side count on sf0.001") {
    val got = TextOps.pmiBigrams(spark, dir)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(5))).toMap
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("text")).collect().map(_.getString(0))
    val toks = docs.map(_.split("\\s+").filter(_.nonEmpty).toSeq)
    val uni = toks.flatten.groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    val n = uni.values.sum
    val ab = toks.flatMap(t => t.zip(t.drop(1))).groupBy(identity)
      .map { case (p, ps) => p -> ps.size.toLong }.filter(_._2 >= 5L)
    val want = ab.map { case ((a, b), nab) =>
      (a, b) -> nab * n * 1000000L / (uni(a) * uni(b)) }
    assert(got == want && got.nonEmpty)
  }

  // ---- Chunking ----

  test("chunkSplit windows cover every token with the declared stride") {
    val rows = TextOps.chunkSplit(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val lens = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), size(TextOps.tokens(col("text"))).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byDoc = rows.groupBy(_._1)
    assert(byDoc.keySet == lens.filter(_._2 > 0).keySet)
    byDoc.foreach { case (doc, cs) =>
      val n = lens(doc)
      val sorted = cs.sortBy(_._2)
      // starts advance by the stride from 0; all-but-last are full windows;
      // the last window reaches exactly the end of the doc
      assert(sorted.zipWithIndex.forall { case ((_, cid, start, _), i) =>
        cid == i && start == i * 48L })
      assert(sorted.init.forall(_._4 == 64L))
      val (_, _, lastStart, lastLen) = sorted.last
      assert(lastStart + lastLen == n || (n <= 64 && lastLen == n))
      assert(if (n <= 64) sorted.length == 1
             else sorted.length == (n - 64 + 47) / 48 + 1)
    }
  }

  // ---- Temperature mixing ----

  test("temperatureMix weights are a proper distribution that flattens") {
    val rows = TextOps.temperatureMix(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(2) / 1e6, r.getDouble(3), r.getDouble(4)))
    assert(math.abs(rows.map(_._2).sum - 1.0) < 1e-4)
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4)
    // α=0.5 flattens: every language's temperature weight sits between
    // its proportional share and the uniform share, so tail languages
    // up-sample (factor > 1) and head languages down-sample (factor < 1)
    val uniform = 1.0 / rows.length
    rows.foreach { case (_, p, pt, factor) =>
      if (p < uniform) assert(pt >= p - 1e-9 && factor >= 1.0 - 1e-6)
      if (p > uniform) assert(pt <= p + 1e-9 && factor <= 1.0 + 1e-6)
    }
  }

  // ---- BPE fertility ----

  test("bpeFertility is the lang-grain rollup of bpeEncode") {
    val fert = TextOps.bpeFertility(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val byLang = TextOps.bpeEncode(spark, dir)
      .join(spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "lang"), "doc_id")
      .groupBy("lang")
      .agg(sum("n_words").as("w"), sum("n_bpe_tokens").as("b"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(fert == byLang && fert.nonEmpty)
  }

  // ---- Exact-substring duplicate spans ----

  test("dupSpans finds the planted twins' shared prefix as one span") {
    import graft.operators.DedupOps
    val spans = DedupOps.dupSpans(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).groupBy(_._1)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), size(TextOps.tokens(col("text"))).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // every twin (doc_id % 10 == 0, text truncated by 20 chars) shares
    // its full token stream minus a few tail tokens with its original:
    // both sides must carry a span starting at 0 covering most of the doc
    val twins = docs.keys.filter(_ % 10 == 0).filter(id => docs(id) >= 30)
    assert(twins.nonEmpty)
    twins.foreach { id =>
      for (side <- Seq(id, id + 1000000L)) {
        val ss = spans.getOrElse(side, Array.empty)
        assert(ss.exists { case (_, s, e) => s == 0L && e >= docs(id) - 25L },
          s"doc $side missing the twin prefix span")
      }
    }
  }

  // ---- DSIR importance weighting ----

  test("dsirWeight scores en docs higher than non-en on average") {
    val rows = TextOps.dsirWeight(spark, dir)
      .join(spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "lang"), "doc_id")
      .select("lang", "log_importance")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val (en, rest) = rows.partition(_._1 == "en")
    def mean(xs: Array[(String, Double)]) = xs.map(_._2).sum / xs.length
    assert(en.nonEmpty && rest.nonEmpty)
    // the target model is trained ON the en slice: its own docs must
    // score above the source-only remainder
    assert(mean(en) > mean(rest))
  }

  // ---- Z-order clustering ----

  test("zorderStats buckets bound both dimensions (the pruning contract)") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val n = docs.count()
    val stats = LayoutOps.zorderStats(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(stats.map(_._2).sum == n)
    assert(stats.forall { case (b, _, _, _, _, _) => b >= 0 && b < 16 })
    // Z-order property: a bucket (top 4 bits = 2 bits per dimension)
    // confines each dimension's SCALED value to one of 4 quarters — so
    // each bucket's min/max span at most a quarter of either dimension's
    // range (+1 for the integer-scaling boundary)
    val maxX = docs.agg(max("n_chars")).head().getLong(0)
    val maxY = docs.agg(max("doc_id")).head().getLong(0)
    stats.foreach { case (_, _, minC, maxC, minI, maxI) =>
      assert(maxC - minC <= (maxX + 1) / 4 + 1)
      assert(maxI - minI <= (maxY + 1) / 4 + 1)
    }
  }

  // ---- Product quantization ----

  test("PQ ANN holds usable recall against full-precision top-k") {
    def topk(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val full = topk(SimilarityOps.annBruteForce(spark, dir))
    val pq = topk(SimilarityOps.annPqTopK(spark, dir))
    assert(pq.keySet == full.keySet)
    val recalls = full.map { case (q, exact) =>
      pq(q).intersect(exact).size.toDouble / exact.size }
    val avg = recalls.sum / recalls.size
    // 7 bytes/vector is a ~73x compression, and uniform-random
    // embeddings are the PQ worst case: the recall bar is accordingly
    // lower than the int8 twin's 0.85 — the two-stage rerank pattern
    // (q_ann_topk_rerank) is how a PQ shortlist becomes exact
    assert(avg >= 0.4, s"avg recall@5 of PQ ranking was $avg")
  }

  // ---- C4 line filter ----

  test("c4LineFilter keeps punctuated >=5-word non-js lines; doc rules fire first") {
    val words32 = Seq.fill(32)("alpha").mkString(" ")
    val out = TextOps.c4LineFilterFrame(docsDf(Seq(
      (0L, words32, "en"),  // js boilerplate planted -> excluded from kept, doc still keeps
      (1L, Seq.fill(8)("beta").mkString(" "), "en"), // single line -> too few sentences
      (3L, words32, "en"),  // lorem ipsum planted -> whole page dropped
      (7L, words32, "en"))))  // curly-brace line planted -> whole page dropped
      .select("doc_id", "n_lines", "n_kept", "reason", "keep")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getBoolean(4)))
      .toSeq
    assert(out == Seq(
      (0L, 5L, 3L, "keep", true),            // line i=0 lacks the period; js line dropped
      (1L, 1L, 1L, "too_few_sentences", false),
      (3L, 5L, 4L, "lorem_ipsum", false),    // lorem line itself passes the line rules
      (7L, 5L, 3L, "brace", false)))         // brace line fails line rules too (no period)
  }

  // ---- Corpus drift ----

  test("corpusDrift is zero for balanced tokens and positive for one-sided ones") {
    // A (even doc_ids) and B (odd) have equal token totals, so a token
    // with equal counts has p == q -> contributes exactly 0; "skew" /
    // "drift" each appear on one side only -> strictly positive
    val out = TextOps.corpusDriftFrame(docsDf(Seq(
      (0L, "alpha beta gamma", "en"),
      (2L, "skew", "en"),
      (1L, "alpha beta gamma", "en"),
      (3L, "drift", "en"))))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    val byTok = out.map(t => t._1 -> t).toMap
    assert(byTok("alpha") == (("alpha", 1L, 1L, 0.0)))
    assert(byTok("beta")._4 == 0.0 && byTok("gamma")._4 == 0.0)
    assert(byTok("drift")._2 == 0L && byTok("drift")._3 == 1L && byTok("drift")._4 > 0.0)
    assert(byTok("skew")._2 == 1L && byTok("skew")._3 == 0L && byTok("skew")._4 > 0.0)
  }

  // ---- Gopher rules ----

  test("gopherRules verdicts are the integer-exact forms of the paper's thresholds") {
    val good = "the cat sat and dog ran off with one two big red" // 12 words, required: the+and
    val out = TextOps.gopherRulesFrame(docsDf(Seq(
      (8L, good, "en"),   // doc_id % 8 == 0 -> no planted symbols, all rules pass
      (7L, good, "en"),   // 7 planted '#' on 12 words -> symbol + alpha rules fail
      (16L, "the a", "en")))) // 2 words -> word-count rule fails (required still passes)
      .select("doc_id", "n_words", "pass_word_count", "pass_symbol", "pass_alpha",
        "pass_required", "keep")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getBoolean(3),
        r.getBoolean(4), r.getBoolean(5), r.getBoolean(6)))
      .toSeq
    assert(out == Seq(
      (7L, 19L, true, false, false, true, false),
      (8L, 12L, true, true, true, true, true),
      (16L, 2L, false, true, true, true, false)))
  }
}
