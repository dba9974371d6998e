package graft

import java.sql.DriverManager
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Metastore
import graft.sources.Jdbc

/** End-to-end JDBC integration over embedded Derby (shipped with Spark):
  * the SQLAlchemy/DBAPI-analog source layer reads a real database through
  * a real JDBC driver, the partitioned read stripes it across executors,
  * writeTable round-trips a staged frame, and the dialect metastore fold
  * consumes JDBC-read Frames exactly as it would in production.
  * (Derby uppercases unquoted identifiers, so reads re-alias to the
  * lowercase shapes the pipelines expect.)
  */
class JdbcDerbySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val url = "jdbc:derby:memory:graftdb;create=true"

  private lazy val seeded: Unit = {
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE TABLE tbls (tbl_id BIGINT, db_id BIGINT, name VARCHAR(64), tbl_type VARCHAR(32))")
    st.execute("CREATE TABLE dbs (db_id BIGINT, schema_name VARCHAR(64))")
    st.execute("CREATE TABLE cols (tbl_id BIGINT, col_name VARCHAR(64), col_type VARCHAR(32), col_sort_order BIGINT)")
    st.execute("INSERT INTO tbls VALUES (1, 10, 'orders', 'MANAGED_TABLE'), (2, 10, 'v_daily', 'VIRTUAL_VIEW')")
    st.execute("INSERT INTO dbs VALUES (10, 'sales')")
    st.execute(
      "INSERT INTO cols VALUES (1, 'id', 'bigint', 1), (1, 'amount', 'double', 2), (2, 'day', 'date', 1)")
    st.close(); conn.close()
  }

  private def lower(df: org.apache.spark.sql.DataFrame) =
    df.toDF(df.columns.map(_.toLowerCase): _*)

  test("whole-query read pushes dialect SQL to the database") {
    seeded
    val out = lower(Jdbc.read(spark, url,
      "SELECT t.tbl_id, t.name, d.schema_name FROM tbls t JOIN dbs d ON t.db_id = d.db_id"))
    assert(out.columns.toSeq == Seq("tbl_id", "name", "schema_name"))
    assert(out.count() == 2)
  }

  test("partitioned read stripes the table across tasks") {
    seeded
    val out = Jdbc.readPartitioned(spark, url, "cols",
      partitionColumn = "tbl_id", lowerBound = 0L, upperBound = 3L, numPartitions = 3)
    assert(out.rdd.getNumPartitions == 3)
    assert(out.count() == 3)
  }

  test("writeTable round-trips a staged frame") {
    seeded
    import spark.implicits._
    Jdbc.writeTable(Seq((1L, "t1"), (2L, "t2")).toDF("id", "val"), url, "staged")
    // the Spark JDBC writer quotes its column names, so Derby stores them
    // case-sensitively — read back with quoted identifiers
    val back = lower(Jdbc.read(spark, url, "SELECT \"id\", \"val\" FROM staged"))
    assert(back.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((1L, "t1"), (2L, "t2")))
  }

  test("metastore fold consumes JDBC-read frames end-to-end") {
    seeded
    val frames = Metastore.Frames(
      tbls = lower(Jdbc.read(spark, url, "SELECT tbl_id, db_id, name, tbl_type FROM tbls")),
      dbs = lower(Jdbc.read(spark, url, "SELECT db_id, schema_name FROM dbs")),
      cols = lower(Jdbc.read(spark, url,
        "SELECT tbl_id, col_name, col_type, col_sort_order FROM cols")),
      partitionKeys = None,
      tableParams = None)
    val out = Metastore.foldTableMetadata(frames, "postgres", "gold")
      .orderBy("key").collect()
    assert(out.map(_.getAs[String]("key")).toSeq ==
      Seq("postgres://gold.sales/orders", "postgres://gold.sales/v_daily"))
    val orders = out.head
    assert(orders.getAs[Long]("n_cols") == 2L)
    assert(orders.getAs[String]("columns") == "id:bigint:,amount:double:")
    assert(out(1).getAs[Boolean]("is_view"))
  }
}
