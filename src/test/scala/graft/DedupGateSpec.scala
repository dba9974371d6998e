package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.DedupOps
import graft.sources.Tables
import graft.streaming.DedupGateStream
import java.nio.file.Files

/** The near-dup admission gate: verdict semantics on known dup/novel
  * cohorts, and streaming batch-parity — micro-batched incoming docs
  * against the static corpus index produce exactly the batch decisions.
  */
class DedupGateSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"
  private def tmp(name: String): String =
    Files.createTempDirectory(graft.sources.TmpStores.pidScopedRoot("graft-testtmp"), s"graft-$name").toString

  private def incoming = {
    val base = Tables(spark, dir, "documents").select(col("doc_id"), col("text"))
    base.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        expr("substring(text, 1, length(text) - 20)").as("text"))
      .union(base.filter(col("doc_id") % 10 === 5)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          reverse(col("text")).as("text")))
  }

  test("truncated twins reject against their parent; reversed docs admit") {
    val got = DedupOps.dedupGate(spark, dir).collect()
    val twins = got.filter(_.getAs[Long]("doc_id") < 2000000L)
    val fresh = got.filter(_.getAs[Long]("doc_id") >= 2000000L)
    assert(twins.nonEmpty && fresh.nonEmpty)
    // truncated twins are near-dups of their parents — rejected, except
    // where sf0.001's shortest docs lose enough text that true Jaccard
    // drops under the 0.8 threshold (the oracle gate confirms those
    // admits are CORRECT, not missed); every rejection names the parent
    val rejected = twins.filter(_.getAs[String]("decision") == "reject")
    assert(rejected.length * 2 > twins.length,
      s"only ${rejected.length}/${twins.length} twins rejected")
    assert(rejected.forall(_.getAs[Long]("n_matches") >= 1L))
    assert(rejected.forall(_.getAs[Double]("best_jaccard") >= 0.8))
    // the best match is usually the planted parent; corpus-internal
    // duplicates can legitimately outrank it (equal jaccard, smaller id)
    assert(rejected.count(r =>
      r.getAs[Long]("best_match") == r.getAs[Long]("doc_id") - 1000000L) * 2
      > rejected.length)
    // reversed text shares no shingles with the corpus — admitted clean
    assert(fresh.forall(_.getAs[String]("decision") == "admit"))
    assert(fresh.forall(_.getAs[Long]("n_matches") == 0L))
  }

  test("streamed micro-batches produce exactly the batch decisions") {
    val in = tmp("gate-in")
    val out = tmp("gate-out")
    // two micro-batches split by doc_id parity of the incoming set
    incoming.filter(col("doc_id") % 2 === 0).coalesce(1)
      .write.mode("append").parquet(in)
    incoming.filter(col("doc_id") % 2 === 1).coalesce(1)
      .write.mode("append").parquet(in)
    val corpus = Tables(spark, dir, "documents").select(col("doc_id"), col("text"))
    val q = DedupGateStream.run(corpus,
      spark.readStream.schema(incoming.schema)
        .option("maxFilesPerTrigger", "1").parquet(in),
      out, tmp("gate-ckpt"))
    q.awaitTermination()
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("doc_id"), r.getAs[String]("decision"),
        r.getAs[Long]("n_matches"), r.getAs[Long]("best_match"))
    val streamed = spark.read.parquet(out).collect().map(key).toSet
    val batch = DedupOps.dedupGate(spark, dir).collect().map(key).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("accreting gate rejects a later batch's duplicate of an admitted doc") {
    val corpus = Tables(spark, dir, "documents").select(col("doc_id"), col("text"))
    // batch 1: a novel doc (reversed corpus text shares no shingles);
    // batch 2: an identical copy of it + another novel doc. Sequential
    // writes order the micro-batches (FileStreamSource sorts by mtime).
    val novel1 = corpus.filter(col("doc_id") === 5)
      .select(lit(9000001L).as("doc_id"), reverse(col("text")).as("text"))
    val copy = novel1.select(lit(9000002L).as("doc_id"), col("text"))
    val novel2 = corpus.filter(col("doc_id") === 15)
      .select(lit(9000003L).as("doc_id"), reverse(col("text")).as("text"))
    def stage(in: String): Unit = {
      import scala.jdk.CollectionConverters._
      def setMtimes(epochMs: Long): Unit =
        Files.list(java.nio.file.Paths.get(in)).iterator().asScala
          .filter(_.getFileName.toString.endsWith(".parquet"))
          .foreach(p => Files.setLastModifiedTime(p,
            java.nio.file.attribute.FileTime.fromMillis(epochMs)))
      // FileStreamSource orders batches by mtime — pin them explicitly so
      // the novel doc is ALWAYS batch 0 and its copy batch 1
      novel1.coalesce(1).write.mode("append").parquet(in)
      setMtimes(1000000000000L)
      copy.union(novel2).coalesce(1).write.mode("append").parquet(in)
      Files.list(java.nio.file.Paths.get(in)).iterator().asScala
        .filter(p => p.getFileName.toString.endsWith(".parquet") &&
          Files.getLastModifiedTime(p).toMillis != 1000000000000L)
        .foreach(p => Files.setLastModifiedTime(p,
          java.nio.file.attribute.FileTime.fromMillis(2000000000000L)))
    }
    def runGate(accrete: Boolean, out: String): Map[Long, (String, Long, Double)] = {
      val in = tmp("acc-in")
      stage(in)
      val q = DedupGateStream.run(corpus,
        spark.readStream.schema(corpus.schema)
          .option("maxFilesPerTrigger", "1").parquet(in),
        out, tmp("acc-ckpt"), accrete = accrete)
      q.awaitTermination()
      spark.read.parquet(out).collect().map(r =>
        r.getAs[Long]("doc_id") -> ((r.getAs[String]("decision"),
          r.getAs[Long]("best_match"), r.getAs[Double]("best_jaccard")))).toMap
    }
    val out1 = tmp("acc-out")
    val accreted = runGate(accrete = true, out1)
    // the novel doc admitted in batch 1, entered the index, and its
    // batch-2 copy is rejected AGAINST IT; the other novel doc admits
    assert(accreted(9000001L)._1 == "admit")
    assert(accreted(9000002L) == (("reject", 9000001L, 1.0)))
    assert(accreted(9000003L)._1 == "admit")
    // RESTART: a fresh run() against the same decision store must fold
    // the persisted accretion index back in — another copy of the
    // admitted doc, arriving in a brand-new stream, still rejects
    val in2 = tmp("acc-in2")
    novel1.select(lit(9000004L).as("doc_id"), col("text"))
      .coalesce(1).write.mode("append").parquet(in2)
    val q2 = DedupGateStream.run(corpus,
      spark.readStream.schema(corpus.schema)
        .option("maxFilesPerTrigger", "1").parquet(in2),
      out1, tmp("acc-ckpt2"), accrete = true)
    q2.awaitTermination()
    val afterRestart = spark.read.parquet(out1).collect().map(r =>
      r.getAs[Long]("doc_id") -> ((r.getAs[String]("decision"),
        r.getAs[Long]("best_match"), r.getAs[Double]("best_jaccard")))).toMap
    assert(afterRestart(9000004L) == (("reject", 9000001L, 1.0)))
    // contrast: the static-index gate admits the copy (batch 2 never
    // sees batch 1's admissions)
    val static = runGate(accrete = false, tmp("acc-out-s"))
    assert(static(9000002L)._1 == "admit")
  }
}
