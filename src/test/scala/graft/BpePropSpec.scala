package graft

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextOps

/** Property test: the distributed BPE trainer must agree with a plain
  * in-memory reference implementation on arbitrary random corpora —
  * repeated words, overlap runs ("aaaa"), count ties, single-char words,
  * early exhaustion. The string-encoded merge (double-space symbols +
  * literal replace) is the one place a representation bug could silently
  * diverge from the standard list-walk semantics, so the reference walks
  * symbol LISTS and never strings.
  */
class BpePropSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Reference BPE over symbol vectors: greedy left-to-right merge. */
  private def refBpe(words: Seq[String], k: Int): Seq[(Long, String, String, Long)] = {
    def applyMerge(s: Vector[String], a: String, b: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < s.length) {
        if (i + 1 < s.length && s(i) == a && s(i + 1) == b) { out += (a + b); i += 2 }
        else { out += s(i); i += 1 }
      }
      out.result()
    }
    var cur: Seq[(Vector[String], Long)] = words.groupBy(identity).toSeq
      .map { case (w, occ) => (w.toVector.map(_.toString), occ.size.toLong) }
    val out = scala.collection.mutable.ListBuffer.empty[(Long, String, String, Long)]
    for (r <- 1 to k) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      cur.foreach { case (s, f) =>
        var i = 0
        while (i + 1 < s.length) { counts((s(i), s(i + 1))) =
          counts.getOrElse((s(i), s(i + 1)), 0L) + f; i += 1 }
      }
      if (counts.nonEmpty && out.size == r - 1) {
        val ((a, b), c) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        out += ((r.toLong, a, b, c))
        cur = cur.map { case (s, f) => (applyMerge(s, a, b), f) }
      }
    }
    out.toList
  }

  test("bpeMergesFromTokens equals the in-memory reference on random corpora") {
    import spark.implicits._
    val genWords: Gen[List[String]] = for {
      n <- Gen.choose(1, 12)
      words <- Gen.listOfN(n, for {
        len <- Gen.choose(1, 6)
        cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c'))
      } yield cs.mkString)
    } yield words
    val prop = Prop.forAll(genWords) { words =>
      val got = TextOps.bpeMergesFromTokens(words.toDF("word"), k = 6)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
      got == refBpe(words, 6)
    }
    val result = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(result.passed, result.status.toString)
  }

  test("incremental pair maintenance sustains a 64-merge vocabulary build") {
    import spark.implicits._
    // a corpus rich enough that 64 true merges exist: the incremental
    // trainer's maintained pair table must track 64 rounds of deltas
    // without drifting from the full-recount semantics
    val rnd = new scala.util.Random(42)
    val words = List.fill(300)(
      (0 until (3 + rnd.nextInt(8))).map(_ => ('a' + rnd.nextInt(8)).toChar).mkString)
    val got = TextOps.bpeMergesFromTokens(words.toDF("word"), k = 64)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val want = refBpe(words, 64)
    assert(got.size == 64, s"corpus must sustain 64 merges, got ${got.size}")
    assert(got == want)
  }

  /** Ground truth for ENCODE semantics: the expression chain's literal
    * replace sequence verbatim — each merge ONE `String.replace` pass
    * (all non-overlapping occurrences, left to right) in table order. */
  private def naiveChain(w: String, table: Seq[(String, String)]): Seq[String] = {
    var enc = "  " + w.toSeq.map(_.toString).mkString("  ") + "  "
    table.foreach { case (a, b) => enc = enc.replace(s" $a  $b ", s" $a$b ") }
    enc.trim.split("  ").toSeq
  }

  test("BpeWordEncoder equals the replace chain on arbitrary merge tables") {
    // random tables INCLUDING duplicates, never-firing pairs, and
    // collision-prone shapes (a merge whose output string equals another
    // merge's operand) — the cases where the fast min-rank-above-done
    // loop could diverge from strict pass-in-rank-order semantics
    val genWord: Gen[String] = for {
      len <- Gen.choose(1, 9)
      cs <- Gen.listOfN(len, Gen.oneOf('a', 'b'))
    } yield cs.mkString
    val genSym: Gen[String] = for {
      len <- Gen.choose(1, 3)
      cs <- Gen.listOfN(len, Gen.oneOf('a', 'b'))
    } yield cs.mkString
    val genTable: Gen[List[(String, String)]] = for {
      n <- Gen.choose(0, 40)
      t <- Gen.listOfN(n, Gen.zip(genSym, genSym))
    } yield t
    val prop = Prop.forAll(Gen.listOfN(20, genWord), genTable) { (words, table) =>
      val enc = new graft.operators.BpeWordEncoder(table.toArray)
      words.forall { w =>
        enc.encode(w).toSeq == naiveChain(w, table)
      }
    }
    val result = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(result.passed, result.status.toString)
  }

  test("withBpePieces paths agree on a random table (expression vs partition-local)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(7)
    val words = List.fill(120)(
      (0 until (1 + rnd.nextInt(8))).map(_ => ('a' + rnd.nextInt(2)).toChar).mkString)
    def sym() = (0 until (1 + rnd.nextInt(3))).map(_ => ('a' + rnd.nextInt(2)).toChar).mkString
    val table = List.fill(40)((sym(), sym()))
    val df = words.zipWithIndex
      .map { case (w, i) => (i.toLong, Seq(w, w.reverse)) }
      .toDF("doc_id", "toks")
    val viaExpr = graft.operators.TextOps.withBpePieces(df, table)
      .select(col("doc_id"), col("pcs")).as[(Long, Seq[String])].collect().toMap
    val viaMap = graft.operators.TextOps.withBpePieces(df, table, forcePartitionLocal = true)
      .select(col("doc_id"), col("pcs")).as[(Long, Seq[String])].collect().toMap
    assert(viaExpr == viaMap)
    // and both equal the naive chain
    words.zipWithIndex.foreach { case (w, i) =>
      val want = naiveChain(w, table) ++ naiveChain(w.reverse, table)
      assert(viaExpr(i.toLong) == want, s"word $w")
    }
  }
}
