package graft

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextOps

/** Property tests: the C4 line filter, the Gopher rule set, and the
  * corpus-drift monitor must agree with plain in-memory reference
  * implementations on arbitrary random corpora — including texts that
  * contain the boilerplate trigger words themselves ("javascript",
  * "lorem" "ipsum" adjacently), sub-8-token documents, empty documents
  * (C4's single-empty-line edge), and every doc_id modulo branch of the
  * planted structure. The references recompute rounding through the same
  * BigDecimal HALF_UP path Catalyst's round() uses, so equality is
  * exact, not approximate. */
class FilterOpsPropSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docsDf(rows: Seq[(Long, String)]) = {
    val s = spark
    import s.implicits._
    rows.map { case (id, t) => (id, t, "en") }.toDF("doc_id", "text", "lang")
  }

  private def toks(text: String): Array[String] =
    text.split("\\s+").filter(_.nonEmpty)

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble

  // vocabulary deliberately includes the C4 trigger words so base lines
  // can themselves contain "javascript" or an adjacent "lorem ipsum"
  private val vocab = Seq("alpha", "beta", "gamma", "the", "a", "of", "and",
    "is", "delta", "x1", "y2", "lorem", "ipsum", "javascript")

  private val genDocs: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(1, 10)
    ids <- Gen.listOfN(n, Gen.choose(0L, 120L))
    texts <- Gen.listOfN(n, for {
      w <- Gen.choose(0, 40)
      ws <- Gen.listOfN(w, Gen.oneOf(vocab))
    } yield ws.mkString(" "))
  } yield ids.distinct.zip(texts)

  // ---- C4 line filter reference ----

  private def refC4(id: Long, text: String): (Long, Long, String, Boolean, String) = {
    val t = toks(text)
    val nLines = math.max(1, math.ceil(t.length / 8.0).toInt)
    val base = (0 until nLines).map { i =>
      t.slice(i * 8, i * 8 + 8).mkString(" ") +
        (if ((id + i) % 4 == 0) "" else ".")
    }
    val lines = base ++
      (if (id % 5 == 0) Seq("please enable javascript to view this page.") else Nil) ++
      (if (id % 7 == 3) Seq("lorem ipsum dolor sit amet.") else Nil) ++
      (if (id % 11 == 7) Seq("function() { return; }") else Nil)
    val kept = lines.filter(l =>
      l.endsWith(".") && l.split(" ").length >= 5 && !l.contains("javascript"))
    val reason =
      if (lines.exists(_.contains("lorem ipsum"))) "lorem_ipsum"
      else if (lines.exists(_.contains("{"))) "brace"
      else if (kept.length < 3) "too_few_sentences"
      else "keep"
    (lines.length.toLong, kept.length.toLong, reason, reason == "keep",
      md5hex(kept.mkString(" | ")))
  }

  test("c4LineFilterFrame equals the in-memory reference on random corpora") {
    val prop = Prop.forAll(genDocs) { docs =>
      val got = TextOps.c4LineFilterFrame(docsDf(docs)).collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getString(3), r.getBoolean(4), r.getString(5))))
        .toMap
      val want = docs.map { case (id, t) => id -> refC4(id, t) }.toMap
      got == want
    }
    val result = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(result.passed, result.status.toString)
  }

  // ---- Gopher rules reference ----

  private def refGopher(id: Long, text: String):
      (Long, Long, Long, Long, Long, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean) = {
    val planted = text +
      (if (id % 8 > 0) " " + ("# " * (id % 8).toInt).stripTrailing() else "")
    val words = toks(planted)
    val nWords = words.length.toLong
    val sumLen = words.map(_.length.toLong).sum
    val nSymbol = words.count(w => w == "#" || w == "...").toLong
    val nAlpha = words.count(
      _.exists(c => (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z'))).toLong
    // the operator's required-stopword set (TextOps.EnMarkers, package-private)
    val nRequired = Seq("the", "a", "of", "and", "is").count(words.contains(_)).toLong
    val pwc = nWords >= 10L && nWords <= 1000L
    val pwl = sumLen >= nWords * 3L && sumLen <= nWords * 10L
    val psy = nSymbol * 10L <= nWords
    val pal = nAlpha * 5L >= nWords * 4L
    val prq = nRequired >= 2L
    (nWords,
      sumLen * 1000000L / nWords,
      nSymbol * 1000000L / nWords,
      nAlpha * 1000000L / nWords,
      nRequired, pwc, pwl, psy, pal, prq, pwc && pwl && psy && pal && prq)
  }

  test("gopherRulesFrame equals the in-memory reference on random corpora") {
    // >=1 word per doc: an empty doc's integer ratios divide by zero
    // (null columns) and the corpus never ships empty documents
    val genNonEmpty = genDocs.map(_.map { case (id, t) =>
      (id, if (toks(t).isEmpty) "alpha" else t) })
    val prop = Prop.forAll(genNonEmpty) { docs =>
      val got = TextOps.gopherRulesFrame(docsDf(docs)).collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
            r.getBoolean(6), r.getBoolean(7), r.getBoolean(8), r.getBoolean(9),
            r.getBoolean(10), r.getBoolean(11))))
        .toMap
      val want = docs.map { case (id, t) => id -> refGopher(id, t) }.toMap
      got == want
    }
    val result = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(result.passed, result.status.toString)
  }

  // ---- Corpus drift reference ----

  test("corpusDriftFrame equals the reference and every contribution is non-negative") {
    val prop = Prop.forAll(genDocs) { docs =>
      val withToken = docs.filter { case (_, t) => toks(t).nonEmpty }
      val counts = scala.collection.mutable.Map.empty[String, (Long, Long)]
      withToken.foreach { case (id, t) =>
        toks(t).foreach { w =>
          val (a, b) = counts.getOrElse(w, (0L, 0L))
          counts(w) = if (id % 2 == 0) (a + 1, b) else (a, b + 1)
        }
      }
      val totA = counts.values.map(_._1).sum
      val totB = counts.values.map(_._2).sum
      val v = counts.size.toLong
      val want = counts.map { case (tok, (na, nb)) =>
        val p = (na + 1).toDouble / (totA + v).toDouble
        val q = (nb + 1).toDouble / (totB + v).toDouble
        val m = (p + q) / 2.0
        tok -> ((na, nb, round6((p * math.log(p / m) + q * math.log(q / m)) * 0.5)))
      }.toMap
      val got = TextOps.corpusDriftFrame(docsDf(docs)).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
        .toMap
      got == want && got.values.forall(_._3 >= 0.0)
    }
    val result = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(result.passed, result.status.toString)
  }
}
