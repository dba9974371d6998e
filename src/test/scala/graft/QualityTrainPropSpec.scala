package graft

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextOps

/** Property test: the distributed fixed-point quality trainer must agree
  * with a plain in-memory reference implementation on arbitrary random
  * corpora — degenerate docs (all-stopword, no-alpha, single-token),
  * label imbalance, mean-centering edge cases, and negative gradients
  * (where toward-zero division differs from floor division). The
  * reference recomputes features, means, the hard-sigmoid GD loop, and
  * the accuracy trace entirely with Scala Long arithmetic.
  */
class QualityTrainPropSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val FP = 1000000L
  private val gain = 6L
  private val markers = Seq("the", "a", "of", "and", "is")

  /** In-memory replay of rawQualityFeatures + centering + the GD loop. */
  private def refTrain(texts: Seq[String], iters: Int): Seq[Seq[Long]] = {
    val raw = texts.flatMap { text =>
      val toks = text.split("\\s+").filter(_.nonEmpty).toSeq
      val n = toks.length.toLong
      if (n < 1) None
      else {
        val nd = toks.distinct.length.toLong
        val ns = toks.count(markers.contains).toLong
        val na = toks.count(_.exists(c =>
          (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z'))).toLong
        val nreq = markers.count(toks.contains).toLong
        val y = if (n >= 10 && n <= 1000 && na * 5 >= n * 4 && nreq >= 2) 1L else 0L
        Some((y, Vector(math.min(n, 256) * FP / 256, nd * FP / n, ns * FP / n, na * FP / n)))
      }
    }
    val nDocs = math.max(raw.length.toLong, 1L)
    val m = (0 to 3).map(j => raw.map(_._2(j)).sum / nDocs)
    val feats = raw.map { case (y, r) =>
      (y, Vector(FP) ++ (0 to 3).map(j => r(j) - m(j)))
    }
    var w = Vector(0L, 0L, 0L, 0L, 0L)
    val trace = Vector.newBuilder[Seq[Long]]
    for (i <- 0 to iters) {
      val g = Array.fill(5)(0L)
      var correct = 0L
      feats.foreach { case (y, x) =>
        val z = (0 to 4).map(j => w(j) * x(j)).sum / FP
        val sig = math.max(0L, math.min(FP, FP / 2 + z / 4))
        val err = y * FP - sig
        (0 to 4).foreach(j => g(j) += err * x(j) / FP)
        if ((sig * 2 >= FP) == (y == 1L)) correct += 1
      }
      trace += (Seq(i.toLong) ++ w ++ Seq(correct))
      if (i < iters) w = Vector.tabulate(5)(j => w(j) + g(j) * gain / nDocs)
    }
    trace.result()
  }

  private val word: Gen[String] = Gen.frequency(
    3 -> Gen.oneOf(markers),
    4 -> Gen.oneOf("fox", "dog", "jumps", "quick", "lazy", "Brown", "river"),
    1 -> Gen.oneOf("42", "###", "---", "7"),
    1 -> Gen.oneOf("x", "y"))

  private val doc: Gen[String] = for {
    n <- Gen.chooseNum(1, 40)
    ws <- Gen.listOfN(n, word)
  } yield ws.mkString(" ")

  test("distributed trainer trace equals the in-memory reference on random corpora") {
    val s = spark
    import s.implicits._
    val prop = Prop.forAll(Gen.chooseNum(3, 30).flatMap(Gen.listOfN(_, doc))) { texts =>
      val df = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = TextOps.trainQualityModelFrame(df, 4)
        .collect().map(_.toSeq.map(_.asInstanceOf[Long])).toSeq
      val want = refTrain(texts, 4)
      got == want
    }
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }
}
