package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{LayoutOps, TextOps}
import graft.streaming.Maintenance

/** Round-17 specs: the BPE long-word guard (words past
  * [[TextOps.BpeWordLenCap]] code points pre-split into cap-sized
  * segments on BOTH encode paths — the input-robustness fix for
  * megabyte unbroken "words" in web crawls), the planted
  * megabyte-token time bound, the corpus-under-cap invariant that
  * keeps the unrolled per-word oracle replays exact, the merge-table
  * broadcast cache, the sweep-whole-fleet-then-rethrow maintenance
  * contract, and the orphaned refresh-staging sweep on the
  * stale.isEmpty early-return path. */
class Round17OpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.sources.Tables.nanosAsLongConf, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s
  }

  private val dir = "/root/testdata/sf0.001"

  private def tmpRoot(tag: String): java.nio.file.Path =
    Files.createTempDirectory(
      graft.sources.TmpStores.pidScopedRoot("graft-testtmp"), tag)

  private def docsWithToks =
    graft.sources.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
      .withColumn("toks", TextOps.tokens(col("text")))

  /** Ground truth for UNCAPPED single-segment encode semantics (the
    * expression chain's literal replace sequence, verbatim). */
  private def naiveChain(w: String, table: Seq[(String, String)]): Seq[String] = {
    val chars = {
      val out = Seq.newBuilder[String]
      var i = 0
      while (i < w.length) {
        val n = Character.charCount(w.codePointAt(i))
        out += w.substring(i, i + n)
        i += n
      }
      out.result()
    }
    var enc = "  " + chars.mkString("  ") + "  "
    table.foreach { case (a, b) => enc = enc.replace(s" $a  $b ", s" $a$b ") }
    enc.trim.split("  ").toSeq
  }

  /** Ground truth for the CAPPED semantics: segment to cap-sized
    * code-point chunks, encode each independently, concatenate. */
  private def cappedNaive(w: String, table: Seq[(String, String)]): Seq[String] =
    TextOps.cappedSegmentsOf(w).flatMap(naiveChain(_, table))

  /** Pad a table with provably-inert pairs (U+00A4-prefixed symbols
    * outside any test alphabet) past the expression/partition-local
    * threshold, so `withBpePieces` routes to the scale path. */
  private def padPastExprLimit(t: Seq[(String, String)]): Seq[(String, String)] =
    t ++ (0 to TextOps.BpeExprMergeLimit).map(i => (s"¤a$i", s"¤b$i"))

  test("long words pre-split into cap-sized segments on both encode paths") {
    val spark0 = spark
    import spark0.implicits._
    val cap = TextOps.BpeWordLenCap
    val table = Seq(("a", "a"), ("aa", "aa"), ("𝕒", "a"))
    // boundary lengths, a cross-boundary merge candidate, and a
    // surrogate-pair alphabet (code-point counting must match Spark's)
    val words = Seq(
      "a" * (cap - 1), "a" * cap, "a" * (cap + 1), "a" * 300,
      "a" * (2 * cap), "a" * (2 * cap + 1),
      ("𝕒a" * (cap / 2 + 2)), // > cap code points, 2x in UTF-16 units
      "short")
    val docs = words.zipWithIndex.map { case (w, i) => (i.toLong, Seq(w)) }
      .toDF("doc_id", "toks")
    for (force <- Seq(false, true)) {
      val got = TextOps.withBpePieces(docs,
          if (force) padPastExprLimit(table) else table,
          forcePartitionLocal = force)
        .select(col("doc_id"), col("pcs")).as[(Long, Seq[String])]
        .collect().toMap
      words.zipWithIndex.foreach { case (w, i) =>
        assert(got(i.toLong) == cappedNaive(w, table),
          s"word $i (len ${w.length}) diverged (forcePartitionLocal=$force)")
      }
    }
    // pin the boundary semantics explicitly: a segment boundary is a
    // hard piece boundary — "a"*(cap+1) is [aa x cap/2] ++ [a], never
    // the uncapped [aa x (cap+1)/2 rounded]
    assert(cappedNaive("a" * (cap + 1), table) ==
      Seq.fill(cap / 4)("aaaa") :+ "a")
    // in-cap words are untouched by the guard
    assert(cappedNaive("a" * cap, table) == naiveChain("a" * cap, table))
  }

  test("a planted megabyte unbroken token encodes in bounded time on both paths") {
    val spark0 = spark
    import spark0.implicits._
    val mega = "ab" * 500000 // one 1,000,000-char "word" — base64-blob shape
    val docs = Seq((0L, Seq(mega, "the", "of")), (1L, Seq("normal", "words")))
      .toDF("doc_id", "toks")
    val firing = Seq(("a", "b"), ("ab", "ab"), ("abab", "abab"))
    for ((table, label, budgetSec) <- Seq(
        (firing, "expression", 120.0),
        (padPastExprLimit(firing), "partition-local", 60.0))) {
      val t0 = System.nanoTime()
      val got = TextOps.withBpePieces(docs, table)
        .select(col("doc_id"), col("pcs")).as[(Long, Seq[String])]
        .collect().toMap
      val secs = (System.nanoTime() - t0) / 1e9
      info(f"$label%s path over the megabyte token: $secs%.1f s")
      assert(secs < budgetSec,
        s"$label path must stay bounded on a pathological token")
      // expected: distinct segments are few — memoize the ground truth
      val memo = scala.collection.mutable.Map.empty[String, Seq[String]]
      val expect0 = TextOps.cappedSegmentsOf(mega)
        .flatMap(s => memo.getOrElseUpdate(s, naiveChain(s, firing))) ++
        naiveChain("the", firing) ++ naiveChain("of", firing)
      assert(got(0L) == expect0, s"$label path diverged on the megabyte doc")
      assert(got(1L) == cappedNaive("normal", firing) ++ cappedNaive("words", firing))
    }
  }

  test("fixture corpora never reach the word-length cap (unrolled oracle replays stay exact)") {
    // The per-word unrolled replace chains in the DuckDB oracles
    // (q_bpe_encode, q_tokenized_*) do NOT replay the segmentation —
    // they stay exact because capped and uncapped semantics coincide
    // below the cap, which this invariant pins for every corpus the
    // driver runs them on. The scale-path oracle (q_bpe_encode_scaled)
    // replays the segmentation itself.
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val path = s"/root/testdata/$sf"
      if (new java.io.File(s"$path/documents.parquet").exists) {
        val mx = graft.sources.Tables(spark, path, "documents")
          .select(explode(TextOps.tokens(col("text"))).as("w"))
          .agg(max(length(col("w")))).head.getInt(0)
        info(s"$sf max word length: $mx (cap ${TextOps.BpeWordLenCap})")
        assert(mx < TextOps.BpeWordLenCap,
          s"$sf corpus reaches the cap — per-word oracle replays would diverge")
      }
    }
  }

  test("the scale-path merge-table broadcast is cached per table content") {
    val t1 = padPastExprLimit(Seq(("a", "b")))
    val t2 = padPastExprLimit(Seq(("b", "c")))
    val b1 = TextOps.broadcastMergeTable(spark, t1)
    val b1again = TextOps.broadcastMergeTable(spark, t1.map(identity))
    val b2 = TextOps.broadcastMergeTable(spark, t2)
    assert(b1 eq b1again,
      "same table content must reuse the broadcast (per-batch accretion)")
    assert(!(b1 eq b2), "different vocabularies must never share a broadcast")
    assert(b1.value.toSeq == t1)
  }

  test("maintenance sweeps the whole fleet before rethrowing a non-guardrail failure") {
    val ran = scala.collection.mutable.ArrayBuffer.empty[String]
    val boom = new IllegalStateException("store B: missing CURRENT marker")
    val boom2 = new IllegalStateException("store D: missing probe-key layout")
    val actions = Seq(
      Maintenance.Action("A", "sweep", () => { ran += "A"; 1L }),
      Maintenance.Action("B", "sweep", () => { ran += "B"; throw boom }),
      Maintenance.Action("C", "sweep", () => { ran += "C"; 2L }),
      Maintenance.Action("D", "sweep", () => { ran += "D"; throw boom2 }))
    val thrown = intercept[IllegalStateException](Maintenance.run(actions))
    assert(thrown eq boom, "the FIRST non-guardrail failure rethrows")
    assert(ran == Seq("A", "B", "C", "D"),
      "every store's action must still run — one broken store cannot leave the fleet unswept")
    assert(thrown.getSuppressed.toSeq == Seq(boom2),
      "later failures ride along as suppressed")
  }

  test("a 32k-merge production vocab refreshes the store and sustains encode throughput") {
    val spark0 = spark
    import spark0.implicits._
    val vocabSize = 32768 // the stated production range is 32k-50k merges
    val root = tmpRoot("graft-vocab32k")
    val store = root.resolve("store").toString
    val vocabDir = root.resolve("vocab").toString
    val docs = graft.sources.Tables(spark, dir, "documents")
      .select("doc_id", "text")
    LayoutOps.bpeEncodeDocsWith(docs, TextOps.BpeMergeTable)
      .select(col("doc_id"), col("doc_id").as("pos"), col("n_bpe"),
        col("tok_str"), lit(0L).as("vocab"),
        (col("doc_id") % 2).as("shard"), lit(0L).as("era"))
      .write.partitionBy("era", "shard").parquet(store)
    // production-shaped artifact: corpus prefix chains (these fire) +
    // inert ¤-pairs to 32768 ranks (real-vocab long-tail table size)
    val freq = docs
      .select(explode(TextOps.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(desc("c"), asc("w")).limit(200)
      .select("w").as[String].collect().toSeq
    val firing = freq.flatMap { w =>
      val cps = w.toSeq.map(_.toString)
      (1 until cps.length).map(i => (cps.take(i).mkString, cps(i)))
    }.distinct
    val table = (firing ++
      (0 until (vocabSize - firing.size)).map(i => (s"¤a$i", s"¤b$i")))
      .take(vocabSize)
    assert(table.size == vocabSize)
    table.zipWithIndex
      .map { case ((l, r), i) => (i + 1L, l, r) }
      .toDF("merge_rank", "lhs", "rhs")
      .coalesce(1).write.parquet(s"$vocabDir/gen=1")
    graft.sources.Stage.atomicRepoint(vocabDir, s"$vocabDir/gen=1")

    val nDocs = docs.count()
    val t0 = System.nanoTime()
    assert(LayoutOps.bpeRefreshApplyAt(spark, docs, store, vocabDir,
      nShards = 2) == nDocs)
    val refreshSecs = (System.nanoTime() - t0) / 1e9
    info(f"32k-merge refresh over sf0.001 ($nDocs%d docs): $refreshSecs%.1f s")
    assert(refreshSecs < 300.0,
      "the production-size refresh must stay interactive at fixture scale")
    // payload equals the naive replay of the FIRING merges — the ¤-pad
    // ranks are provably inert (a pad symbol contains U+00A4, outside
    // the corpus alphabet, so its pair can never match adjacent word
    // symbols), which is exactly why a 32k table encodes like its
    // firing head on any one document
    val got = spark.read.parquet(LayoutOps.storeDataDir(store))
      .select(col("doc_id"), col("n_bpe").cast("long"), col("tok_str"),
        col("vocab").cast("long"))
      .as[(Long, Long, String, Long)].collect()
    assert(got.length == nDocs && got.forall(_._4 == 1L))
    val toks = docs.withColumn("toks", TextOps.tokens(col("text")))
      .select(col("doc_id"), col("toks")).as[(Long, Seq[String])]
      .collect().toMap
    val memo = scala.collection.mutable.Map.empty[String, Seq[String]]
    got.foreach { case (id, nBpe, tokStr, _) =>
      val pcs = toks(id).flatMap(w =>
        memo.getOrElseUpdate(w, naiveChain(w, firing)))
      assert(nBpe == pcs.size.toLong && tokStr == pcs.mkString(" "),
        s"doc $id diverged under the committed 32k-merge vocab")
    }
    // encoder-core throughput + memo economics at production table
    // size, measured on the corpus token stream (repeats included —
    // repeated words are natural text's shape and the memo's lever)
    val stream = toks.values.flatten.toArray
    val enc = new graft.operators.BpeWordEncoder(table.toArray)
    val t1 = System.nanoTime()
    var i = 0
    while (i < stream.length) { enc.encode(stream(i)); i += 1 }
    val encSecs = (System.nanoTime() - t1) / 1e9
    val wps = stream.length / math.max(encSecs, 1e-9)
    val hitRate = enc.memoHits.toDouble /
      math.max(enc.memoHits + enc.memoMisses, 1L)
    info(f"32k-table encoder core: ${stream.length}%d words in $encSecs%.2f s " +
      f"(${wps / 1000}%.0f k words/s), memo hit rate $hitRate%.3f")
    assert(wps > 10000.0,
      "the encoder core must sustain >10k words/s under a 32k-rank table")
    assert(hitRate > 0.5,
      "natural-text repeats must mostly hit the per-partition memo")

    // the ID-MAPPING scale path under the same production-sized
    // artifact: a 32k+ vocab routes the piece→id lookup through the
    // broadcast partition-local branch; ids must equal the driver-side
    // map over the naive pieces, and the broadcast must be cached
    val vocab = graft.operators.TokenizerArtifact.vocabOf(table).zipWithIndex
    assert(vocab.size > TextOps.BpeExprMergeLimit)
    val vmap = vocab.toMap
    val gotIds = TextOps.withPieceIds(
        TextOps.withBpePieces(
          docs.withColumn("toks", TextOps.tokens(col("text"))), table),
        vocab)
      .select(col("doc_id"), col("ids")).as[(Long, Seq[Int])]
      .collect().toMap
    toks.foreach { case (id, ws) =>
      val expectIds = ws.flatMap(w =>
        memo.getOrElseUpdate(w, naiveChain(w, firing)))
        .map(p => vmap.getOrElse(p, -1))
      assert(gotIds(id) == expectIds, s"doc $id id stream diverged at 32k vocab")
    }
    assert(TextOps.broadcastVocabMap(spark, vocab)
      eq TextOps.broadcastVocabMap(spark, vocab.map(identity)),
      "the vocab broadcast must be content-cached like the merge table's")
  }

  test("the tokenizer.json artifact round-trips the trained table and its encode") {
    val spark0 = spark
    import spark0.implicits._
    val trained = TextOps
      .bpeMergesFromTokens(graft.sources.Tables(spark, dir, "documents")
        .select(explode(TextOps.tokens(col("text"))).as("word")), k = 8)
      .orderBy("merge_rank").select("lhs", "rhs")
      .as[(String, String)].collect().toSeq
    val root = tmpRoot("graft-artifact")
    val path = root.resolve("tokenizer.json").toString
    graft.operators.TokenizerArtifact.exportTokenizerJson(trained, path)
    val imported = graft.operators.TokenizerArtifact.importMerges(path)
    assert(imported == trained, "rank-ordered merge list must survive the round trip")
    // encode under imported == encode under trained, piece for piece
    val base = docsWithToks
    val a = TextOps.withBpePieces(base, trained)
      .select(col("doc_id"), col("pcs")).as[(Long, Seq[String])].collect().toMap
    val b = TextOps.withBpePieces(base, imported)
      .select(col("doc_id"), col("pcs")).as[(Long, Seq[String])].collect().toMap
    assert(a == b)
    // the artifact parses as the public shape: model.type/vocab/merges
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = m.readTree(graft.sources.Hfs.readString(
      new org.apache.hadoop.fs.Path(path)))
    assert(node.path("model").path("type").asText() == "BPE")
    assert(node.path("model").path("merges").size() == trained.size)
    val vocab = node.path("model").path("vocab")
    assert(vocab.size() >= trained.size, "vocab must cover every merge output")
    trained.foreach { case (l, r) =>
      assert(vocab.has(l + r), s"merge output ${l + r} missing from vocab") }
    // ids dense from 0
    val ids = vocab.properties().iterator()
    val seen = scala.collection.mutable.Set.empty[Int]
    while (ids.hasNext) seen += ids.next().getValue.asInt()
    assert(seen == (0 until vocab.size()).toSet)
    // pair-array merges spelling (newer published shape) imports too
    val alt = root.resolve("tokenizer_pairs.json")
    val altJson = m.readTree(graft.sources.Hfs.readString(
      new org.apache.hadoop.fs.Path(path))).asInstanceOf[
      com.fasterxml.jackson.databind.node.ObjectNode]
    val rebuilt = m.createArrayNode()
    trained.foreach { case (l, r) =>
      val pair = m.createArrayNode(); pair.add(l); pair.add(r); rebuilt.add(pair) }
    altJson.path("model").asInstanceOf[
      com.fasterxml.jackson.databind.node.ObjectNode].set("merges", rebuilt)
    java.nio.file.Files.writeString(alt, m.writeValueAsString(altJson))
    assert(graft.operators.TokenizerArtifact.importMerges(alt.toString) == trained)
  }

  test("a family stage past the row threshold spills to a staged parquet scan with identical rows") {
    val spark0 = spark
    import spark0.implicits._
    val base = graft.sources.Tables(spark, dir, "documents")
      .select(col("doc_id"), length(col("text")).as("n"))
      .filter(col("doc_id") % 3 === 0)
    val expect = base.orderBy("doc_id").as[(Long, Int)].collect().toSeq
    // threshold 0 forces the staged-write route
    val staged = graft.operators.SharedStage.stagedPast(
      base.filter(col("doc_id") % 3 === 0), rowThreshold = 0L)
    assert(staged.orderBy("doc_id").as[(Long, Int)].collect().toSeq == expect,
      "the staged path must return identical rows")
    assert(staged.queryExecution.executedPlan.toString.contains("FileScan"),
      "past the threshold the stage must read back as a file scan, not a cache")
    assert(staged.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
    // a plan-identical repeat caller gets the SAME resolved frame —
    // no rewrite, no recompute
    val again = graft.operators.SharedStage.stagedPast(
      base.filter(col("doc_id") % 3 === 0), rowThreshold = 0L)
    assert(again eq staged)
    // under the threshold the stage stays in the session cache
    val small = base.limit(5)
    val inCache = graft.operators.SharedStage.stagedPast(small, rowThreshold = 1000000L)
    assert(inCache.storageLevel != org.apache.spark.storage.StorageLevel.NONE)
  }

  test("piece-to-id mapping agrees across the literal-map and broadcast paths, OOV as -1") {
    val spark0 = spark
    import spark0.implicits._
    val docs = Seq((0L, Seq("ab", "zq", "a")), (1L, Seq[String]()), (2L, Seq("ba")))
      .toDF("doc_id", "pcs")
    val vocab = Seq("a" -> 0, "b" -> 1, "ab" -> 2, "ba" -> 3)
    for (force <- Seq(false, true)) {
      val got = TextOps.withPieceIds(docs, vocab, forcePartitionLocal = force)
        .select(col("doc_id"), col("ids")).as[(Long, Seq[Int])]
        .collect().toMap
      assert(got(0L) == Seq(2, -1, 0), s"force=$force") // zq is OOV
      assert(got(1L) == Seq.empty[Int], s"force=$force")
      assert(got(2L) == Seq(3), s"force=$force")
    }
    // a production-sized vocab routes partition-local by size alone
    val big = vocab ++ (0 to TextOps.BpeExprMergeLimit).map(i => (s"¤$i", 100 + i))
    val gotBig = TextOps.withPieceIds(docs, big)
      .select(col("doc_id"), col("ids")).as[(Long, Seq[Int])].collect().toMap
    assert(gotBig(0L) == Seq(2, -1, 0))
  }

  test("fixture-sized id mapping stays a codegen'd expression; big vocabs go partition-local") {
    val spark0 = spark
    import spark0.implicits._
    val docs = Seq((0L, Seq("a", "b"))).toDF("doc_id", "pcs")
    val small = Seq("a" -> 0, "b" -> 1)
    val smallPlan = TextOps.withPieceIds(docs, small)
      .queryExecution.executedPlan.toString
    assert(!smallPlan.contains("MapPartitions"),
      "a fixture-sized vocab must stay in the expression plan (whole-stage codegen)")
    val big = small ++ (0 to TextOps.BpeExprMergeLimit).map(i => (s"¤$i", 10 + i))
    val bigPlan = TextOps.withPieceIds(docs, big)
      .queryExecution.executedPlan.toString
    assert(bigPlan.contains("MapPartitions"),
      "a production-sized vocab must route partition-local, not build a giant literal")
  }

  test("the artifact vocab covers alphabet, underivable operands, and outputs with dense ids") {
    // hand-built table: b's operand 'cd' is underivable (no merge
    // produces it), output 'ab' repeats (dedup keeps first rank), and
    // the alphabet sorts by CODE POINT (𝕒 U+1D552 sorts after z even
    // though its UTF-16 lead surrogate is below 'z' + 0x8000 range)
    val table = Seq(("a", "b"), ("cd", "a"), ("a", "b"), ("z", "𝕒"))
    val v = graft.operators.TokenizerArtifact.vocabOf(table)
    assert(v == Seq("a", "b", "z", "𝕒", "cd", "ab", "cda", "z𝕒"))
  }

  test("repack and refresh queries stay order-independent under the shared fixture build") {
    // the adversarial order: repack runs FIRST (it both triggers the
    // shared build and mutates — refresh-applies AND repacks — its own
    // copy), then refresh; refresh must still equal a ground-truth
    // UNSHARED build+apply, proving the copies isolate every mutation
    val repack = graft.streaming.CurationStream
      .tokenizedStoreRepackQuery(spark, dir).collect().toSeq
    val refresh = graft.streaming.CurationStream
      .tokenizedStoreRefreshQuery(spark, dir).collect().toSeq
    val (store, vocabDir) = graft.streaming.CurationStream
      .tokenizedStoreRefreshBuild(spark, dir, tag = "graft-curation-tokref-solo")
    graft.operators.LayoutOps.bpeRefreshApplyAt(spark,
      graft.sources.Tables(spark, dir, "documents").select("doc_id", "text"),
      store, vocabDir, nShards = 4, carry = Seq("win"))
    spark.catalog.refreshByPath(store)
    val solo = graft.operators.LayoutOps.tokenizedEraManifest(spark,
      spark.read.parquet(graft.operators.LayoutOps.storeDataDir(store)), 4)
      .collect().toSeq
    assert(refresh == solo,
      "refresh after a first-touch repack must match the unshared ground truth")
    assert(repack.nonEmpty && repack != refresh,
      "the repack result is the re-derived grid, not the refresh grid riding through")
  }

  test("the shared fixture build survives interleaved corpus dirs (A-B-A)") {
    // the shared root is per corpus dir: a build for a second dir must
    // not delete-and-replace the first dir's built state while the
    // memo still serves its paths (the bench interleaves a sf0.001
    // warm pass with the measured sf in one JVM)
    val dirB = "/root/testdata/sf0.01"
    assume(new java.io.File(s"$dirB/documents.parquet").exists)
    val first = graft.streaming.CurationStream
      .tokenizedStoreRefreshQuery(spark, dir).collect().toSeq
    graft.streaming.CurationStream
      .tokenizedStoreRepackQuery(spark, dirB).collect()
    val again = graft.streaming.CurationStream
      .tokenizedStoreRefreshQuery(spark, dir).collect().toSeq
    assert(again == first,
      "a dir-A query after a dir-B build must still copy dir A's pristine build")
  }

  test("a crashed refresh's orphaned staging dir is swept on the stale.isEmpty early-return path") {
    val spark0 = spark
    import spark0.implicits._
    val root = tmpRoot("graft-stagingsweep")
    val store = root.resolve("store").toString
    val vocabDir = root.resolve("vocab").toString
    val docs = graft.sources.Tables(spark, dir, "documents")
      .select("doc_id", "text").limit(20)
    // flat legacy store, every row already on the committed vocab
    // version (0) — the refresh early-returns on stale.isEmpty
    TextOps.BpeMergeTable.zipWithIndex
      .map { case ((a, b), i) => (i.toLong + 1, a, b) }
      .toDF("merge_rank", "lhs", "rhs")
      .coalesce(1).write.parquet(s"$vocabDir/gen=0")
    graft.sources.Stage.atomicRepoint(vocabDir, s"$vocabDir/gen=0")
    LayoutOps.bpeEncodeDocsWith(docs, TextOps.BpeMergeTable)
      .select(col("doc_id"), col("doc_id").as("pos"), col("n_bpe"),
        col("tok_str"), lit(0L).as("vocab"),
        (col("doc_id") % 2).as("shard"), lit(0L).as("era"))
      .write.partitionBy("era", "shard").parquet(store)
    // plant the orphan a crash between the dynamic overwrite and the
    // staging delete leaves behind — for a flat store it sits OUTSIDE
    // the store root, where no generation GC ever looks
    val staging = new java.io.File(store + ".refresh.tmp")
    assert(staging.mkdirs())
    Files.write(staging.toPath.resolve("part-orphan.parquet"),
      "orphaned-bytes".getBytes("UTF-8"))
    val n = LayoutOps.bpeRefreshApplyAt(spark, docs, store, vocabDir)
    assert(n == 0L, "nothing stale — the early-return path must be the one swept")
    assert(!staging.exists,
      "the head-of-pass sweep must reclaim the orphaned staging dir before the early return")
  }
}
