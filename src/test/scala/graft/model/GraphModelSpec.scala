package graft.model

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Golden assertions for the graph fan-out — mirrors the reference's unit
  * pattern (tests/unit/models/test_graph_serializable.py and
  * test_table_metadata.py): hand-written record in, exact node/edge set out.
  */
class GraphModelSpec extends AnyFunSuite {

  val table = TableMetadata(
    database = "hive", cluster = "gold", schema = "core", name = "fact_orders",
    description = Some("orders fact"),
    columns = Seq(
      ColumnMetadata("id", Some("pk"), "bigint", 0),
      ColumnMetadata("ts", None, "timestamp", 1)),
    tags = Seq("finance"))

  val ser = TableMetadata.serializer

  test("table key formats match the reference layout") {
    assert(table.tableKey == "hive://gold.core/fact_orders")
    assert(table.schemaKey == "hive://gold.core")
    assert(table.clusterKey == "hive://gold")
    assert(table.databaseKey == "database://hive")
    assert(table.columnKey(table.columns.head) == "hive://gold.core/fact_orders/id")
    assert(table.descriptionKey == "hive://gold.core/fact_orders/_description")
  }

  test("programmatic description label/key chosen by source") {
    val t = table.copy(descriptionSource = Some("quality"))
    assert(t.descriptionLabel == "Programmatic_Description")
    assert(t.descriptionKey == "hive://gold.core/fact_orders/_quality_description")
  }

  test("node fan-out: hierarchy + table + descriptions + tags + columns") {
    val nodes = ser.nodes(table)
    val byLabel = nodes.groupBy(_.label).view.mapValues(_.size).toMap
    assert(byLabel == Map(
      "Database" -> 1, "Cluster" -> 1, "Schema" -> 1, "Table" -> 1,
      "Description" -> 2, // table desc + 1 column desc (ts has none)
      "Tag" -> 1, "Column" -> 2))
    val tableNode = nodes.find(_.label == "Table").get
    assert(tableNode.key == "hive://gold.core/fact_orders")
    assert(tableNode.attributes == Map("name" -> "fact_orders", "is_view" -> "false"))
    val colNode = nodes.find(n => n.label == "Column" && n.attributes("name") == "id").get
    assert(colNode.attributes("sort_order") == "0")
    assert(nodes.forall(Graph.nodeValid))
  }

  test("edge fan-out: chain + desc + tag + column edges, all valid") {
    val rels = ser.relationships(table)
    val byType = rels.groupBy(_.relType).view.mapValues(_.size).toMap
    assert(byType == Map(
      "CLUSTER" -> 1, "SCHEMA" -> 1, "TABLE" -> 1,
      "DESCRIPTION" -> 2, "TAGGED_BY" -> 1, "COLUMN" -> 2))
    assert(rels.forall(Graph.relationshipValid))
    // every edge endpoint exists in the node set (serializer law)
    val keys = ser.nodes(table).map(_.key).toSet
    assert(rels.forall(r => keys.contains(r.startKey) && keys.contains(r.endKey)))
  }

  test("no description -> no description node or edge") {
    val t = table.copy(description = None, columns = Nil)
    assert(!ser.nodes(t).exists(_.label == "Description"))
    assert(!ser.relationships(t).exists(_.relType == "DESCRIPTION"))
  }

  test("user fan-out: manager edge only when manager present") {
    val u = User("a@x.com", managerEmail = Some("boss@x.com"))
    // the manager gets a relation but NO stub node (user.py:202-214)
    assert(User.serializer.nodes(u).map(_.key) == Seq("a@x.com"))
    val rel = User.serializer.relationships(u).head
    assert((rel.relType, rel.reverseType) == ("MANAGE_BY", "MANAGE"))
    assert(User.serializer.relationships(User("b@x.com")).isEmpty)
  }

  test("user attrs carry reference defaults; empty-attr option trims falsy") {
    val attrs = User.serializer.nodes(User("a@x.com")).head.attributes
    // every string field defaults to '' and updated_at to 0 (user.py:131-150)
    assert(attrs == Map(
      "email" -> "a@x.com", "is_active" -> "true", "first_name" -> "",
      "last_name" -> "", "full_name" -> "", "github_username" -> "",
      "team_name" -> "", "employee_type" -> "", "slack_id" -> "",
      "role_name" -> "", "updated_at" -> "0"))
    val trimmed = User.serializer.nodes(User("a@x.com",
      firstName = Some("Ann"), isActive = false,
      doNotUpdateEmptyAttribute = true)).head.attributes
    // do_not_update_empty_attribute deletes ALL falsy values — including
    // is_active=false, the reference's own quirk (user.py:154-157)
    assert(trimmed == Map("email" -> "a@x.com", "first_name" -> "Ann"))
  }

  test("usage / lineage / watermark / last-updated fan-outs") {
    val usage = TableUsage("hive://gold.core/t", "a@x.com", 7L)
    val uRel = TableUsage.serializer.relationships(usage).head
    assert(uRel.attributes("read_count") == "7")

    val lin = TableLineage("hive://gold.core/a", "hive://gold.core/b")
    assert(TableLineage.serializer.nodes(lin).isEmpty)
    assert(TableLineage.serializer.relationships(lin).head.relType == "HAS_DOWNSTREAM")

    val cl = ColumnLineage("hive://gold.core/a/c1", "hive://gold.core/b/c2")
    assert(ColumnLineage.serializer.nodes(cl).isEmpty)
    val clRel = ColumnLineage.serializer.relationships(cl).head
    assert(clRel.startLabel == TableMetadata.ColumnLabel &&
      clRel.endLabel == TableMetadata.ColumnLabel)
    assert((clRel.relType, clRel.reverseType) == ("HAS_DOWNSTREAM", "HAS_UPSTREAM"))

    val wm = Watermark("hive", "gold", "core", "t", "ds=2024-01-01", "high_watermark", "1700000000")
    assert(wm.key == "hive://gold.core/t/high_watermark/")
    assert(wm.partitionKey == "ds" && wm.partitionValue == "2024-01-01")

    val lu = TableLastUpdated("hive://gold.core/t", 123L)
    assert(TableLastUpdated.serializer.nodes(lu).head.key == "hive://gold.core/t/timestamp")

    val src = TableSource("hive", "gold", "core", "t", "github.com/x/y.sql")
    assert(src.key == "hive://gold.core/t/_source")
    val srcNode = TableSource.serializer.nodes(src).head
    assert(srcNode.label == "Source" && srcNode.attributes("source_type") == "github")
    val srcRel = TableSource.serializer.relationships(src).head
    assert((srcRel.relType, srcRel.reverseType) == ("SOURCE_OF", "SOURCE") &&
      srcRel.endKey == "hive://gold.core/t")
  }
}

/** Property tests: serializer laws hold for arbitrary inputs
  * (SURVEY §5 "ours"). */
class GraphModelProps extends AnyFunSuite {
  val namePart: Gen[String] = Gen.alphaNumStr.suchThat(_.nonEmpty).map(_.take(12))

  test("every edge endpoint exists among emitted nodes, for any table") {
    val genTable = for {
      db <- namePart; cl <- namePart; sc <- namePart; tb <- namePart
      nCols <- Gen.choose(0, 5)
      cols <- Gen.listOfN(nCols, for {
        cn <- namePart; d <- Gen.option(namePart); ct <- namePart; so <- Gen.choose(0, 100)
      } yield ColumnMetadata(cn, d, ct, so))
      desc <- Gen.option(namePart)
      tags <- Gen.listOf(namePart).map(_.take(3))
    } yield TableMetadata(db, cl, sc, tb, desc, cols, isView = false, tags)

    val ser = TableMetadata.serializer
    (0 until 200).foreach { i =>
      genTable.apply(Gen.Parameters.default, Seed(i.toLong)).foreach { t =>
        val keys = ser.nodes(t).map(_.key).toSet
        assert(ser.relationships(t).forall(r => keys.contains(r.startKey) && keys.contains(r.endKey)))
        assert(ser.nodes(t).forall(Graph.nodeValid))
        assert(ser.relationships(t).forall(Graph.relationshipValid))
      }
    }
  }
}
