package graft.model

import org.scalatest.funsuite.AnyFunSuite

/** Golden fan-out tests for the dashboard family and the Badge / Watermark
  * / Stats / Application / Schema models — the reference's unit pattern:
  * one record in, exact nodes + relations out. */
class ModelFanoutSpec extends AnyFunSuite {

  test("DashboardMetadata fans out cluster/group/dashboard/description/tag") {
    val d = DashboardMetadata("gore", "d7", Some("weekly"), tags = Seq("finance"),
      product = "mode")
    val ns = Dashboard.metadataSerializer.nodes(d)
    assert(ns.map(n => (n.label, n.key)) == Seq(
      ("Cluster", "mode_dashboard://gold"),
      ("Dashboardgroup", "mode_dashboard://gold.gore"),
      ("Dashboard", "mode_dashboard://gold.gore/d7"),
      ("Description", "mode_dashboard://gold.gore/d7/_description"),
      ("Tag", "finance")))
    val rs = Dashboard.metadataSerializer.relationships(d)
    assert(rs.map(r => (r.relType, r.reverseType)) == Seq(
      ("DASHBOARD_GROUP", "DASHBOARD_GROUP_OF"),
      ("DASHBOARD", "DASHBOARD_OF"),
      ("DESCRIPTION", "DESCRIPTION_OF"),
      ("TAG", "TAG_OF")))
    assert(ns.forall(Graph.nodeValid) && rs.forall(Graph.relationshipValid))
  }

  test("query → chart → execution key chain nests correctly") {
    val q = DashboardQuery("g", "d", "q1", "revenue", product = "mode")
    assert(q.queryKey == "mode_dashboard://gold.g/d/query/q1")
    val c = DashboardChart("g", "d", "q1", "c1", "bars", product = "mode")
    assert(c.chartKey == "mode_dashboard://gold.g/d/query/q1/chart/c1")
    val e = DashboardExecution("g", "d", "_last_successful_execution", 123L,
      "succeeded", product = "mode")
    assert(e.executionKey ==
      "mode_dashboard://gold.g/d/execution/_last_successful_execution")
    assert(Dashboard.executionSerializer.nodes(e).head.attributes("timestamp") == "123")
  }

  test("usage and table-link models are relation-only") {
    val u = DashboardUsage("g", "d", "a@b.c", 5, product = "mode")
    assert(Dashboard.usageSerializer.nodes(u).isEmpty)
    val ur = Dashboard.usageSerializer.relationships(u).head
    assert(ur.relType == "READ_BY" && ur.attributes("read_count") == "5")
    val t = DashboardTable("g", "d", "hive://gold.public/users", product = "mode")
    assert(Dashboard.tableSerializer.relationships(t).head.relType == "DASHBOARD_WITH_TABLE")
  }

  test("owner and last-modified complete the dashboard family") {
    val o = DashboardOwner("g", "d", "a@b.c", product = "mode")
    assert(Dashboard.ownerSerializer.nodes(o).isEmpty)
    val or = Dashboard.ownerSerializer.relationships(o).head
    assert((or.relType, or.reverseType) == ("OWNER", "OWNER_OF") && or.endKey == "a@b.c")

    val m = DashboardLastModified("g", "d", 456L, product = "mode")
    assert(m.key == "mode_dashboard://gold.g/d/_last_modified_timestamp")
    val mn = Dashboard.lastModifiedSerializer.nodes(m).head
    assert(mn.label == "Timestamp" && mn.attributes("timestamp") == "456")
    val mr = Dashboard.lastModifiedSerializer.relationships(m).head
    assert((mr.relType, mr.reverseType) == ("LAST_UPDATED_AT", "LAST_UPDATED_TIME_OF"))
  }

  test("BadgeMetadata validates start keys per label") {
    val ok = BadgeMetadata("Table", "hive://gold.public/users", Seq("beta"))
    assert(BadgeMetadata.serializer.nodes(ok).map(_.key) == Seq("beta"))
    assert(BadgeMetadata.serializer.relationships(ok).head.relType == "HAS_BADGE")
    intercept[IllegalArgumentException] {
      BadgeMetadata("Table", "not-a-table-key", Seq("beta"))
    }
    intercept[IllegalArgumentException] {
      BadgeMetadata("User", "hive://gold.public/users", Seq("beta"))
    }
    // dashboard keys need the _dashboard scheme
    BadgeMetadata("Dashboard", "mode_dashboard://gold.g/d7", Seq("beta"))
    intercept[IllegalArgumentException] {
      BadgeMetadata("Dashboard", "hive://gold.public/users", Seq("beta"))
    }
  }

  test("Watermark parses part_name and keys with the part type") {
    val w = Watermark("hive", "gold", "public", "sales", "ds=2024-01-01",
      "high_watermark", "")
    assert(w.partitionKey == "ds" && w.partitionValue == "2024-01-01")
    // nested part names split on the FIRST '=' only (watermark.py:46-49)
    val nested = w.copy(partName = "ds=2017-09-18/feature_id=9")
    assert(nested.partitionKey == "ds")
    assert(nested.partitionValue == "2017-09-18/feature_id=9")
    val n = Watermark.serializer.nodes(w).head
    assert(n.key == "hive://gold.public/sales/high_watermark/")
    assert(Watermark.serializer.relationships(w).head.relType == "BELONG_TO_TABLE")
  }

  test("TableColumnStats keys per (column, stat)") {
    val s = TableColumnStats("hive", "gold", "public", "sales", "amount",
      "max", "99.5", 100L, 200L)
    assert(TableColumnStats.serializer.nodes(s).head.key ==
      "hive://gold.public/sales/amount/max/")
    assert(TableColumnStats.serializer.relationships(s).head.relType == "STAT_OF")
  }

  test("Application keys with airflow dag/task and generates the table") {
    val a = Application("load_sales", "daily", "hive", "gold", "public", "sales")
    assert(a.key == "application://gold.airflow/daily/load_sales")
    val r = Application.serializer.relationships(a).head
    assert(r.relType == "GENERATES" && r.endKey == "hive://gold.public/sales")
  }

  test("SchemaModel emits schema + optional description") {
    val s = SchemaModel("hive://gold.public", "public", Some("main schema"))
    assert(SchemaModel.serializer.nodes(s).map(_.label) == Seq("Schema", "Description"))
    val prog = SchemaModel("hive://gold.public", "public", Some("gen"), Some("quality"))
    assert(SchemaModel.serializer.nodes(prog).map(_.label) ==
      Seq("Schema", "Programmatic_Description"))
    assert(prog.descriptionKey == "hive://gold.public/_quality_description")
  }
}
