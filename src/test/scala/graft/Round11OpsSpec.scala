package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.MultimodalOps
import graft.operators.MultimodalOps.MediaCodec

/** Round-11 capability depth: perceptual (pixel-level) media dedup and
  * the incremental curated-store / tokenized-shard compositions.
  */
class Round11OpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"

  test("planted re-encoded and resized twins differ in bytes but are recalled perceptually") {
    // byte level: every planted transform produces bytes a byte-exact
    // (content-hash) dedup would treat as novel
    val id = 6L // reencode twin id: 6%6==0, gray 28+6*37%200=250 -> contrast 245
    assert(MultimodalOps.reencodeTwinIds(id))
    val orig = MediaCodec.encode(id)
    val jpeg = MediaCodec.transcodeJpeg(id, orig)
    assert(!java.util.Arrays.equals(orig, jpeg), "transcode must change bytes")
    val rid = 9L // 9%6==3, gray 28+9*37%200=161 -> contrast 67
    assert(MultimodalOps.resizeTwinIds(rid))
    val rOrig = MediaCodec.encode(rid)
    val small = MediaCodec.resizeBytes(rid, rOrig,
      MediaCodec.widthOf(rid) * 3 / 4, MediaCodec.heightOf(rid) * 3 / 4)
    assert(!java.util.Arrays.equals(rOrig, small), "resize must change bytes")
    // perceptual level: the dedup join recalls every planted twin
    val out = MultimodalOps.imageDedup(spark, dir).collect()
    assert(out.nonEmpty)
    val byKind = out.groupBy(_.getAs[String]("kind")).view.mapValues(_.length).toMap
    assert(byKind.getOrElse("reencode", 0) > 0 && byKind.getOrElse("resize", 0) > 0)
    val missed = out.filterNot(_.getAs[Boolean]("found"))
    assert(missed.isEmpty, s"unrecalled twins: ${missed.take(5).mkString(",")}")
  }

  test("multiprobe banding recalls a twin that shares no exact 8-bit band") {
    // id 21's 3/4 downscale lands at Hamming 12 with >=2 flipped bits in
    // every band — plain 8-band LSH misses it; the one-bit multiprobe must
    // not (pigeonhole: <=15 flips over 8 bands leave some band with <=1)
    val id = 21L
    assert(MultimodalOps.resizeTwinIds(id))
    val orig = MediaCodec.encode(id)
    val o = MediaCodec.dhashOf(id, orig)
    val t = MediaCodec.dhashOf(id, MediaCodec.resizeBytes(id, orig,
      MediaCodec.widthOf(id) * 3 / 4, MediaCodec.heightOf(id) * 3 / 4))
    val ham = java.lang.Long.bitCount(o ^ t)
    assert(ham > 0 && ham <= 15, s"fixture drifted: hamming=$ham")
    val sharesBand = (0 until 8).exists(b =>
      ((o >>> (b * 8)) & 255) == ((t >>> (b * 8)) & 255))
    assert(!sharesBand, "fixture drifted: twin now shares an exact band")
    val row = MultimodalOps.imageDedup(spark, dir)
      .filter(col("twin_id") === 4000021L).collect()
    assert(row.length == 1 && row.head.getAs[Boolean]("found"),
      "multiprobe banding must recall the no-shared-band twin")
  }

  test("dHash is invariant under JPEG transcode of checkerboard assets") {
    // the DCT-block-aligned checkerboard survives the lossy path with
    // box averages intact — transcoded hashes are bit-identical, which
    // is what anchors the reencode twins' structural recall
    (0L until 60L by 6L).filter(MultimodalOps.reencodeTwinIds).foreach { id =>
      val orig = MediaCodec.encode(id)
      assert(MediaCodec.dhashOf(id, orig) ==
        MediaCodec.dhashOf(id, MediaCodec.transcodeJpeg(id, orig)))
    }
  }
}
