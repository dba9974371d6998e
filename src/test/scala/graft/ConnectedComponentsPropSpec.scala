package graft

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.DedupOps

/** Property test: the distributed min-label connected components must
  * agree with a driver-side union-find on arbitrary random pair sets —
  * cliques, chains, stars, singletons, whatever the generator produces.
  * This is the one loop in the repo with nontrivial convergence logic
  * (pointer jumping + deferred convergence counts), so it gets the
  * strongest oracle we can state: exact component-minimum labels.
  */
class ConnectedComponentsPropSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val members = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    members.map(m => m -> find(m)).toMap
  }

  test("connectedComponents equals a driver union-find on random graphs") {
    import spark.implicits._
    val genPairs: Gen[List[(Long, Long)]] = for {
      n <- Gen.choose(1, 40)          // node universe size
      m <- Gen.choose(1, 60)          // edge count
      edges <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n.toLong)
        b <- Gen.choose(0L, n.toLong) if a != b
      } yield (math.min(a, b), math.max(a, b)))
    } yield edges
    val prop = Prop.forAll(genPairs) { pairs =>
      pairs.isEmpty || {
        val expected = unionFind(pairs)
        val got = DedupOps.connectedComponents(
            pairs.toDF("doc_a", "doc_b"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        got == expected
      }
    }
    val result = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(result.passed, result.status.toString)
  }

  test("cc loop partitioning is adaptive: floor of 4, pair-count proportional above") {
    // bench scale: thousands of edges land on the floor
    assert(DedupOps.ccPartitions(0L, 2000000L) == 4)
    assert(DedupOps.ccPartitions(5000L, 2000000L) == 4)
    // corpus scale: a billion-pair edge set gets ~1000 tasks, not 4
    assert(DedupOps.ccPartitions(2000000000L, 2000000L) == 1000)
    assert(DedupOps.ccPartitions(2000000001L, 2000000L) == 1001)
  }

  test("connectedComponents stays correct when >4 partitions engage") {
    import spark.implicits._
    // a long chain (worst case for label propagation) plus cliques, with
    // rowsPerTask tiny enough that the loop state spreads over many tasks
    val chain = (0L until 400L).map(i => (i, i + 1))
    val clique = for (a <- 1000L to 1010L; b <- (a + 1) to 1010L) yield (a, b)
    val pairs = (chain ++ clique).toDF("doc_a", "doc_b")
    val got = DedupOps.connectedComponents(pairs, rowsPerTask = 100L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = unionFind(chain ++ clique)
    assert(got == expected)
  }
}
