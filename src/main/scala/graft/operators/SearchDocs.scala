package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions._
import graft.model.{GraphNode, GraphRelationship}
import graft.sources.Tables

/** The three search-document queries — the correctness centerpiece
  * (reference: databuilder/extractor/neo4j_search_data_extractor.py:23-115;
  * SURVEY §2.6). The Cypher MATCH chains become inner joins over the
  * star-schema's hierarchy, OPTIONAL MATCH branches become pre-aggregated
  * left joins, and COLLECT/SUM/COUNT DISTINCT map to Spark aggregates.
  *
  * Entity mapping (same catalog mapping as GraphBuild): table=customer,
  * schema=nation, cluster=region, database='tpch'; usage comes from the
  * customer's orders' lineitems (user=supplier, read_count=#lineitems).
  *
  * Scale notes: each branch pre-aggregates to table grain BEFORE joining —
  * at 100 TB the join inputs are |tables|-sized, not |usage-events|-sized;
  * dimension sides broadcast.
  */
object SearchDocs {

  /** DEFAULT_NEO4J_TABLE_CYPHER_QUERY analog (reference :23-60), computed
    * over the published graph exactly as the reference does (its Cypher
    * reads Neo4j, neo4j_search_data_extractor.py:161-175): every MATCH hop
    * navigates node/edge tables, never the raw star schema. */
  def tableDocsFromGraph(nodesDf: DataFrame, edgesDf: DataFrame): DataFrame = {
    def nodesOf(label: String, attrs: (String, String)*): DataFrame =
      nodesDf.filter(col("label") === label)
        .select(col("key") +: attrs.map { case (a, out) => col("attributes")(a).as(out) }: _*)
    def edgesOf(relType: String): DataFrame =
      edgesDf.filter(col("relType") === relType)
        .select("startLabel", "endLabel", "startKey", "endKey")

    // MATCH (db)-[:CLUSTER]->(cl)-[:SCHEMA]->(sch)-[:TABLE]->(tbl)
    val hierarchy = nodesOf("Table", "name" -> "name")
      .withColumnRenamed("key", "table_key")
      .join(edgesOf("TABLE").select(col("startKey").as("schema_key"),
        col("endKey").as("table_key")), "table_key")
      .join(broadcast(nodesOf("Schema", "name" -> "schema")
        .withColumnRenamed("key", "schema_key")), "schema_key")
      .join(broadcast(edgesOf("SCHEMA").select(col("startKey").as("cluster_key"),
        col("endKey").as("schema_key"))), "schema_key")
      .join(broadcast(nodesOf("Cluster", "name" -> "cluster")
        .withColumnRenamed("key", "cluster_key")), "cluster_key")
      .join(broadcast(edgesOf("CLUSTER").select(col("startKey").as("database_key"),
        col("endKey").as("cluster_key"))), "cluster_key")
      .join(broadcast(nodesOf("Database", "name" -> "database")
        .withColumnRenamed("key", "database_key")), "database_key")

    // OPTIONAL MATCH branches: instead of five per-branch groupBys + five
    // left joins (five shuffles on the same table key), the branches are
    // normalized to one tall (table_key, kind, str_val, num_val) frame and
    // folded in a SINGLE groupBy — one shuffle regardless of how many
    // branches the document has. The three branches that need a node
    // lookup (description text, column name, timestamp value) join on
    // their co-filtered key sets first (narrow inputs).
    def tall(df: DataFrame, kind: String, s: Column, n: Column): DataFrame =
      df.select(col("table_key"), lit(kind).as("kind"), s.as("str_val"), n.as("num_val"))

    val descs = edgesOf("DESCRIPTION")
      .filter(col("startLabel") === "Table" && col("endLabel") === "Description")
      .select(col("startKey").as("table_key"), col("endKey").as("desc_key"))
      .join(nodesOf("Description", "description" -> "description")
        .withColumnRenamed("key", "desc_key"), "desc_key")
    // programmatic descriptions → COLLECT (reference :36-38)
    val progDescs = edgesOf("DESCRIPTION")
      .filter(col("startLabel") === "Table" && col("endLabel") === "Programmatic_Description")
      .select(col("startKey").as("table_key"), col("endKey").as("pdesc_key"))
      .join(nodesOf("Programmatic_Description", "description" -> "pdesc")
        .withColumnRenamed("key", "pdesc_key"), "pdesc_key")
    // badges → COLLECT DISTINCT badges.key (reference :50-52)
    val badges = edgesOf("HAS_BADGE")
      .select(col("startKey").as("table_key"), col("endKey").as("badge"))
    val tags = edgesOf("TAGGED_BY")
      .select(col("startKey").as("table_key"), col("endKey").as("tag"))
    val cols = edgesOf("COLUMN")
      .select(col("startKey").as("table_key"), col("endKey").as("col_key"))
      .join(nodesOf("Column", "name" -> "col_name").withColumnRenamed("key", "col_key"),
        "col_key")
    // two-hop (table)-[:COLUMN]->(col)-[:DESCRIPTION]->(d) — the ES doc's
    // column_descriptions COLLECT (table_elasticsearch_document.py:9-49)
    val colDescs = edgesOf("COLUMN")
      .select(col("startKey").as("table_key"), col("endKey").as("col_key"))
      .join(edgesOf("DESCRIPTION").filter(col("startLabel") === "Column")
        .select(col("startKey").as("col_key"), col("endKey").as("cdesc_key")), "col_key")
      .join(nodesOf("Description", "description" -> "cdesc")
        .withColumnRenamed("key", "cdesc_key"), "cdesc_key")
    val ts = edgesOf("LAST_UPDATED_AT")
      .select(col("startKey").as("table_key"), col("endKey").as("ts_key"))
      .join(nodesOf("Timestamp", "last_updated_timestamp" -> "ts_val")
        .withColumnRenamed("key", "ts_key"), "ts_key")
    val usage = edgesDf.filter(col("relType") === "READ_BY")
      .select(col("startKey").as("table_key"),
        col("attributes")("read_count").cast("long").as("read_count"))

    val branches =
      tall(descs, "desc", col("description"), lit(null).cast("long"))
        .union(tall(progDescs, "prog", col("pdesc"), lit(null).cast("long")))
        .union(tall(badges, "badge", col("badge"), lit(null).cast("long")))
        .union(tall(tags, "tag", col("tag"), lit(null).cast("long")))
        .union(tall(cols, "col", col("col_name"), lit(null).cast("long")))
        .union(tall(colDescs, "col_desc", col("cdesc"), lit(null).cast("long")))
        .union(tall(ts, "ts", lit(null).cast("string"), col("ts_val").cast("long")))
        .union(tall(usage, "usage", lit(null).cast("string"), col("read_count")))
      .groupBy("table_key")
      .agg(
        max(when(col("kind") === "desc", col("str_val"))).as("description"),
        array_join(sort_array(collect_list(when(col("kind") === "prog", col("str_val")))),
          ",").as("programmatic_descriptions"),
        array_join(sort_array(collect_set(when(col("kind") === "badge", col("str_val")))),
          ",").as("badges"),
        max(when(col("kind") === "tag", col("str_val"))).as("tags"),
        array_join(sort_array(collect_list(when(col("kind") === "col", col("str_val")))),
          ",").as("column_names"),
        array_join(sort_array(collect_list(when(col("kind") === "col_desc", col("str_val")))),
          ",").as("column_descriptions"),
        max(when(col("kind") === "ts", col("num_val"))).as("last_updated_timestamp"),
        sum(when(col("kind") === "usage", col("num_val"))).as("total_usage"),
        count(when(col("kind") === "usage", col("num_val"))).as("unique_usage"))

    // schema_description rides the already-matched schema node
    // (reference :33-35) — a broadcast dimension joined at the end.
    val schemaDescs = edgesOf("DESCRIPTION").filter(col("startLabel") === "Schema")
      .select(col("startKey").as("schema_key"), col("endKey").as("sdesc_key"))
      .join(nodesOf("Description", "description" -> "schema_description")
        .withColumnRenamed("key", "sdesc_key"), "sdesc_key")
      .select("schema_key", "schema_description")

    hierarchy
      .join(branches, Seq("table_key"), "left")
      .join(broadcast(schemaDescs), Seq("schema_key"), "left")
      .select(
        col("database"), col("cluster"), col("schema"), col("name"),
        // table_elasticsearch_document.py:30 display_name = schema.name
        concat(col("schema"), lit("."), col("name")).as("display_name"),
        col("table_key").as("key"),
        col("description"), col("tags"),
        coalesce(col("schema_description"), lit("")).as("schema_description"),
        coalesce(col("programmatic_descriptions"), lit("")).as("programmatic_descriptions"),
        coalesce(col("badges"), lit("")).as("badges"),
        coalesce(col("column_names"), lit("")).as("column_names"),
        coalesce(col("column_descriptions"), lit("")).as("column_descriptions"),
        coalesce(col("last_updated_timestamp"), lit(0L)).as("last_updated_timestamp"),
        coalesce(col("total_usage"), lit(0L)).as("total_usage"),
        coalesce(col("unique_usage"), lit(0L)).as("unique_usage"))
      .orderBy("name")
  }

  /** Builds the published graph (GraphBuild.searchGraph) and runs the
    * table-document query over it end-to-end. The node/edge frames are
    * passed as PLANS, not persisted caches: each MATCH branch filters on a
    * literal label/relType, so Catalyst prunes every untouched fan-out
    * branch and folds `map(...)[attr]` down to the underlying column —
    * the branches the query touches compile to pure columnar work with no
    * map construction at all. (Persisting the generic frames was measured
    * 2× slower: it materializes every attribute map for every branch and
    * the broadcast builds then race to populate the cache.) At scale the
    * same queries run over the staged parquet via tableDocsFromGraph. */
  def tableDocs(spark: SparkSession, dir: String): DataFrame = {
    val (nodes, edges) = GraphBuild.searchGraph(spark, dir)
    tableDocsFromGraph(nodes.toDF(), edges.toDF())
  }

  /** The full reference lifecycle (SURVEY §3.1→§3.2) end to end: build the
    * graph, STAGE it to parquet exactly as the loader/publisher would
    * (Stage.stageNodes/stageEdges — partitioned by label/relType, the
    * per-shard file contract of file_system_neo4j_csv_loader.py:153-198),
    * READ the staged store back, and run the table-document query over
    * what was read — the same path the reference takes when
    * neo4j_search_data_extractor.py:161-175 queries the *published* store
    * rather than the in-flight records. Same oracle as q_table_search_doc:
    * the round trip must be lossless.
    *
    * The staging dir is fixed (overwritten each run) so the query is
    * idempotent; label/relType partitioning means every branch filter in
    * tableDocsFromGraph becomes partition pruning on the read side. */
  def tableDocsStaged(spark: SparkSession, dir: String): DataFrame = {
    val (nodes, edges) = GraphBuild.searchGraph(spark, dir)
    val (n, e) = stageAndReadBack(spark, nodes, edges, "search")
    tableDocsFromGraph(n, e)
  }

  /** Publish-tag-scoped table extraction — the reference's
    * `_add_publish_tag_filter` substitutes
    * `WHERE table.published_tag = '<tag>'` into the primary MATCH of the
    * table query (neo4j_search_data_extractor.py:163-180), so a run
    * extracts only the entities the named publish stamped. Here the
    * stamps arrive the same way they do in the reference: a first
    * publish MERGEs every node (tag `batch_1`), a second publish
    * re-MERGEs the tier-0 tables' Table nodes — `Publish.mergeUpsert`
    * re-stamps exactly the touched rows to `batch_2`, untouched rows
    * retain their stamp — and the extraction then filters the PRIMARY
    * entity nodes on the tag, leaving every other label untouched
    * (the reference's WHERE binds only the `table` variable). */
  def tableDocsTagged(spark: SparkSession, dir: String): DataFrame = {
    val (nodes, edges) = GraphBuild.searchGraph(spark, dir)
    val nodesDf = nodes.toDF()
    // The WHERE binds only the `table` variable, so only the Table nodes
    // go through the publish-stamp machinery — every other label keeps
    // its ORIGINAL plan, preserving the literal-label branch pruning
    // tableDocsFromGraph relies on (merging the whole node set instead
    // was measured 5x slower: all eight OPTIONAL branches re-derived the
    // full-outer merge).
    val tableNodes = nodesDf.filter(col("label") === "Table")
    // second publish's batch: the Table nodes of every third customer —
    // the customer id is the digit suffix of the table's name attribute
    // ('Customer#%09d'), so the batch is a narrow filter on the node set
    // itself, no extra scans or joins
    val incoming = tableNodes.filter(
      expr("cast(substring(attributes['name'], 10) as bigint) % 3 = 0"))
    // MERGE stamps exactly the touched rows batch_2; untouched Table
    // nodes keep their first-publish stamp (blank here — retention is
    // immaterial to a batch_2 filter) and drop out of the scoped set
    val merged = Publish.mergeUpsert(tableNodes, incoming, "key",
      Seq("label", "attributes"), "batch_2", epochMs = 2L)
    // not persisted: exactly ONE branch of tableDocsFromGraph reads
    // Table-labeled nodes (the hierarchy MATCH), so the merge subplan is
    // derived once — a cache would only add a fill job. The label is
    // re-emitted as a LITERAL (it is 'Table' by construction on both
    // merge sides) so every other branch's label filter constant-folds
    // to false and statically prunes the merge subplan out of its union
    // child — without it all eight branches would execute the merge.
    val scopedTables = merged.filter(col("published_tag") === "batch_2")
      .select(col("key"), lit("Table").as("label"), col("attributes"))
    val scoped = scopedTables.union(nodesDf.filter(col("label") =!= "Table"))
    tableDocsFromGraph(scoped, edges.toDF())
  }

  /** Stage a built graph to parquet exactly as the loader/publisher would
    * (label/relType-partitioned shards) and read it back — the shared
    * write→read half of every staged-lifecycle query. pid-suffixed dirs:
    * concurrent graft JVMs (Verify while Bench runs) must not overwrite
    * each other's staged files mid-read. The two staged outputs are
    * independent jobs over the SAME graph build — submitted concurrently
    * so the writes overlap instead of serializing; Spark's scheduler
    * interleaves independent jobs safely. */
  private def stageAndReadBack(
      spark: SparkSession,
      nodes: Dataset[GraphNode],
      edges: Dataset[GraphRelationship],
      tag: String): (DataFrame, DataFrame) = {
    val out =
      graft.sources.TmpStores.pidScopedRoot(s"graft-staged-$tag-graph").toString
    // session-pinning dedicated pool (StreamPar), NOT the global EC:
    // global-pool workers inherit the active-session thread-local from
    // whichever thread forced the pool first — the round-17 NPE class
    graft.streaming.StreamPar.runAll(Seq(
      () => graft.sources.Stage.stageNodes(nodes, out),
      () => graft.sources.Stage.stageEdges(edges, out)))
    (graft.sources.Stage.readNodes(spark, out),
      graft.sources.Stage.readEdges(spark, out))
  }

  /** DEFAULT_NEO4J_USER_CYPHER_QUERY analog (reference :64-82) over the
    * published user graph: READ/OWNER_OF/FOLLOWED_BY are edge tables, the
    * WHERE full_name IS NOT NULL filter and REDUCE/count(distinct)
    * aggregates run against User nodes — same tall-union single-shuffle
    * fold as the table-document query. */
  def userDocsFromGraph(nodesDf: DataFrame, edgesDf: DataFrame): DataFrame =
    userDocsScoped(nodesDf, nodesDf, edgesDf)

  /** [[userDocsFromGraph]] with the PRIMARY entity scoped separately:
    * the reference's `{publish_tag_filter}` WHERE binds only the `user`
    * variable (neo4j_search_data_extractor.py:71,161-175), so the
    * primary User nodes come from `primaryNodes` while every other
    * lookup — the OPTIONAL MATCH manager-email hop — still reads the
    * FULL node set: a tag-scoped user whose manager was published under
    * an earlier tag keeps their manager_email. */
  private def userDocsScoped(primaryNodes: DataFrame, nodesDf: DataFrame,
      edgesDf: DataFrame): DataFrame = {
    val users = primaryNodes.filter(col("label") === "User" &&
        col("attributes")("full_name").isNotNull)
      .select(col("key").as("user_key"),
        col("attributes")("email").as("email"),
        col("attributes")("first_name").as("first_name"),
        col("attributes")("last_name").as("last_name"),
        col("attributes")("full_name").as("full_name"),
        col("attributes")("team_name").as("team_name"),
        col("attributes")("is_active").as("is_active"),
        col("attributes")("github_username").as("github_username"),
        col("attributes")("slack_id").as("slack_id"),
        col("attributes")("role_name").as("role_name"),
        col("attributes")("employee_type").as("employee_type"))
    def tall(relType: String, userKey: Column, kind: String, n: Column) =
      edgesDf.filter(col("relType") === relType)
        .select(userKey.as("user_key"), lit(kind).as("kind"), n.as("n"))
    val branches =
      tall("READ_BY", col("endKey"), "read",
        col("attributes")("read_count").cast("long"))
        .union(tall("OWNER_OF", col("startKey"), "own", lit(1L)))
        .union(tall("FOLLOWED_BY", col("startKey"), "follow", lit(1L)))
      .groupBy("user_key")
      .agg(
        sum(when(col("kind") === "read", col("n"))).as("total_read"),
        count(when(col("kind") === "own", col("n"))).as("total_own"),
        count(when(col("kind") === "follow", col("n"))).as("total_follow"))
    // OPTIONAL MATCH (user)-[:MANAGE_BY]->(manager) → manager.email
    // (reference :70,77) — navigate the edge, then read the manager node.
    val managers = edgesDf.filter(col("relType") === "MANAGE_BY")
      .select(col("startKey").as("user_key"), col("endKey").as("mgr_key"))
      .join(nodesDf.filter(col("label") === "User")
        .select(col("key").as("mgr_key"),
          col("attributes")("email").as("manager_email")), "mgr_key")
      .select("user_key", "manager_email")
    users.join(branches, Seq("user_key"), "left")
      .join(managers, Seq("user_key"), "left")
      .select(
        col("email"), col("first_name"), col("last_name"), col("full_name"),
        col("team_name"), col("manager_email"), col("is_active"),
        col("github_username"), col("slack_id"), col("role_name"),
        col("employee_type"),
        coalesce(col("total_read"), lit(0L)).as("total_read"),
        coalesce(col("total_own"), lit(0L)).as("total_own"),
        coalesce(col("total_follow"), lit(0L)).as("total_follow"))
      .orderBy("email")
  }

  /** Builds the user graph and runs the user-document query over it. */
  def userDocs(spark: SparkSession, dir: String): DataFrame = {
    val (nodes, edges) = GraphBuild.userGraph(spark, dir)
    userDocsFromGraph(nodes, edges)
  }

  /** The ES PUBLISH lifecycle for table documents, end to end and
    * oracle-gated: build the documents, publish them blue/green as
    * sorted-key NDJSON with the index-mapping artifact and _id routing
    * contract (fs_elasticsearch_json_loader + elasticsearch_publisher's
    * create-index → bulk-load → alias-flip), then read CURRENT back with
    * the declared schema — the _MAPPING artifact is underscore-prefixed,
    * so readers skip it like _SUCCESS. Every field in the table document
    * is a string or long, so the JSON round trip is exact and the oracle
    * is q_table_search_doc's. */
  def tableDocsEsPublished(spark: SparkSession, dir: String): DataFrame = {
    val docs = tableDocs(spark, dir)
    val base =
      graft.sources.TmpStores.pidScopedRoot("graft-es-table-docs").toString
    graft.sources.Stage.publishBlueGreen(docs, base, "r", docType = "table",
      idCol = "key")
    val target = graft.sources.Stage.currentTarget(base).get
    spark.read.schema(docs.schema).json(target)
      .select(docs.columns.map(col): _*)
      .orderBy("name")
  }

  /** The staged lifecycle for USER documents, mirroring tableDocsStaged:
    * build → stage as the loader would → read back → query. The reference
    * reads all three document types from the published store
    * (neo4j_search_data_extractor.py:23-115), so each type gets the
    * round-trip gate. Same oracle as q_user_search_doc: lossless. */
  def userDocsStaged(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (nodes, edges) = GraphBuild.userGraph(spark, dir)
    val (n, e) = stageAndReadBack(spark,
      nodes.as[GraphNode], edges.as[GraphRelationship], "user")
    userDocsFromGraph(n, e)
  }

  /** Publish-tag-scoped USER extraction — the reference substitutes the
    * same `{publish_tag_filter}` into the user query's primary MATCH
    * (neo4j_search_data_extractor.py:71 `WHERE user.full_name IS NOT
    * NULL {publish_tag_filter}`, `_add_publish_tag_filter`:161-175), so
    * only the `user` variable is tag-bound. Stamps arrive exactly as in
    * [[tableDocsTagged]]: a second publish re-MERGEs every third user's
    * node — `Publish.mergeUpsert` re-stamps the touched rows `batch_2`,
    * untouched rows keep their first-publish stamp and drop out of the
    * scoped PRIMARY set — while the manager-email OPTIONAL MATCH keeps
    * reading the full published node set (the WHERE binds only `user`). */
  def userDocsTagged(spark: SparkSession, dir: String): DataFrame = {
    val (nodesDf, edgesDf) = GraphBuild.userGraph(spark, dir)
    val userNodes = nodesDf.filter(col("label") === "User")
    // second publish's batch: every third user — the supplier id is the
    // digit suffix of the user key ('s<suppkey>'), a narrow filter on
    // the node set itself
    val incoming = userNodes.filter(
      expr("cast(substring(key, 2) as bigint) % 3 = 0"))
    val merged = Publish.mergeUpsert(userNodes, incoming, "key",
      Seq("label", "attributes"), "batch_2", epochMs = 2L)
    val scopedUsers = merged.filter(col("published_tag") === "batch_2")
      .select(col("key"), lit("User").as("label"), col("attributes"))
    userDocsScoped(scopedUsers, nodesDf, edgesDf)
  }

  /** DEFAULT_NEO4J_DASHBOARD_CYPHER_QUERY analog (reference :85-115) over
    * the published dashboard graph: group→dashboard via DASHBOARD edges,
    * description via Description nodes, chart names + usage via the
    * HAS_QUERY→HAS_CHART two-hop, last run via EXECUTED→Execution nodes —
    * every MATCH hop is a node/edge table navigation. */
  def dashboardDocsFromGraph(nodesDf: DataFrame, edgesDf: DataFrame): DataFrame = {
    def nodesOf(label: String, attrs: (String, String)*): DataFrame =
      nodesDf.filter(col("label") === label)
        .select(col("key") +: attrs.map { case (a, out) => col("attributes")(a).as(out) }: _*)
    def edgesOf(relType: String): DataFrame =
      edgesDf.filter(col("relType") === relType).select("startLabel", "startKey", "endKey")

    // MATCH (dashboard)-[:DASHBOARD_OF]->(dbg)-[:DASHBOARD_GROUP_OF]->
    // (cluster) — the full hierarchy walk of the reference query, with
    // the url attributes riding their nodes
    // (neo4j_search_data_extractor.py:85-113)
    val hierarchy = nodesOf("Dashboard", "name" -> "name", "dashboard_url" -> "url")
      .withColumnRenamed("key", "dash_key")
      .join(edgesOf("DASHBOARD").select(col("startKey").as("group_key"),
        col("endKey").as("dash_key")), "dash_key")
      .join(broadcast(nodesOf("Dashboardgroup", "name" -> "group_name",
        "dashboard_group_url" -> "group_url")
        .withColumnRenamed("key", "group_key")), "group_key")
      .join(broadcast(edgesOf("DASHBOARD_GROUP")
        .select(col("startKey").as("cluster_key"), col("endKey").as("group_key"))),
        "group_key")
      .join(broadcast(nodesOf("Cluster", "name" -> "cluster")
        .withColumnRenamed("key", "cluster_key")), "cluster_key")

    // OPTIONAL MATCH (dbg)-[:DESCRIPTION]->(descr) — group description
    val groupDescs = edgesOf("DESCRIPTION").filter(col("startLabel") === "Dashboardgroup")
      .select(col("startKey").as("group_key"), col("endKey").as("gdesc_key"))
      .join(nodesOf("Description", "description" -> "group_description")
        .withColumnRenamed("key", "gdesc_key"), "gdesc_key")
      .select("group_key", "group_description")

    val descs = edgesOf("DESCRIPTION").filter(col("startLabel") === "Dashboard")
      .select(col("startKey").as("dash_key"), col("endKey").as("desc_key"))
      .join(nodesOf("Description", "description" -> "description")
        .withColumnRenamed("key", "desc_key"), "desc_key")
    // OPTIONAL MATCH (dashboard)-[:HAS_QUERY]->(query:Query) — query names
    val queries = edgesOf("HAS_QUERY")
      .select(col("startKey").as("dash_key"), col("endKey").as("query_key"))
      .join(nodesOf("Query", "name" -> "query_name").withColumnRenamed("key", "query_key"),
        "query_key")
    // the two-hop: dashboard -> query -> chart
    val charts = edgesOf("HAS_QUERY")
      .select(col("startKey").as("dash_key"), col("endKey").as("query_key"))
      .join(edgesOf("HAS_CHART").select(col("startKey").as("query_key"),
        col("endKey").as("chart_key")), "query_key")
      .join(nodesOf("Chart", "name" -> "chart_name").withColumnRenamed("key", "chart_key"),
        "chart_key")
    // WHERE split(last_exec.key, '/')[5] = '_last_successful_execution'
    // (reference :94) — the execution id is the key's 6th slash segment
    val execs = edgesOf("EXECUTED")
      .select(col("startKey").as("dash_key"), col("endKey").as("exec_key"))
      .filter(element_at(split(col("exec_key"), "/"), 6) === "_last_successful_execution")
      .join(nodesOf("Execution", "timestamp" -> "ts").withColumnRenamed("key", "exec_key"),
        "exec_key")

    val tags = edgesOf("TAG")
      .select(col("startKey").as("dash_key"), col("endKey").as("tag"))
    val badges = edgesOf("HAS_BADGE").filter(col("startLabel") === "Dashboard")
      .select(col("startKey").as("dash_key"), col("endKey").as("badge"))

    def tall(df: DataFrame, kind: String, s: Column, n: Column) =
      df.select(col("dash_key"), lit(kind).as("kind"), s.as("str_val"), n.as("num_val"))
    val branches =
      tall(descs, "desc", col("description"), lit(null).cast("long"))
        .union(tall(queries, "query", col("query_name"), lit(null).cast("long")))
        .union(tall(charts, "chart", col("chart_name"), lit(null).cast("long")))
        .union(tall(execs, "exec", lit(null).cast("string"), col("ts").cast("long")))
        .union(tall(tags, "tag", col("tag"), lit(null).cast("long")))
        .union(tall(badges, "badge", col("badge"), lit(null).cast("long")))
      .groupBy("dash_key")
      .agg(
        max(when(col("kind") === "desc", col("str_val"))).as("description"),
        count(when(col("kind") === "chart", col("str_val"))).as("total_usage"),
        array_join(sort_array(collect_set(when(col("kind") === "query", col("str_val")))),
          ",").as("query_names"),
        array_join(sort_array(collect_set(when(col("kind") === "chart", col("str_val")))),
          ",").as("chart_names"),
        max(when(col("kind") === "exec", col("num_val"))).as("last_successful_run_timestamp"),
        array_join(sort_array(collect_set(when(col("kind") === "tag", col("str_val")))),
          ",").as("tags"),
        array_join(sort_array(collect_set(when(col("kind") === "badge", col("str_val")))),
          ",").as("badges"))

    // full reference RETURN list (neo4j_search_data_extractor.py:105-113):
    // product = split(key, '_')[0], uri = the dashboard key itself
    hierarchy.join(branches, Seq("dash_key"), "left")
      .join(broadcast(groupDescs), Seq("group_key"), "left")
      .select(
        col("group_name"), col("name"), col("cluster"),
        coalesce(col("description"), lit("")).as("description"),
        coalesce(col("group_description"), lit("")).as("group_description"),
        col("group_url"), col("url"), col("dash_key").as("uri"),
        element_at(split(col("dash_key"), "_"), 1).as("product"),
        coalesce(col("last_successful_run_timestamp"), lit(0L)).as("last_successful_run_timestamp"),
        coalesce(col("query_names"), lit("")).as("query_names"),
        coalesce(col("chart_names"), lit("")).as("chart_names"),
        coalesce(col("total_usage"), lit(0L)).as("total_usage"),
        coalesce(col("tags"), lit("")).as("tags"),
        coalesce(col("badges"), lit("")).as("badges"))
      .orderBy("group_name", "name")
  }

  /** Builds the dashboard graph and runs the dashboard-document query over
    * it. Usage = chart count (one chart per view event in the mapping),
    * last run = the last-successful-execution node. */
  def dashboardDocs(spark: SparkSession, dir: String): DataFrame =
    dashboardDocsFromGraph(
      DashboardBuild.nodes(spark, dir).toDF(),
      DashboardBuild.edges(spark, dir).toDF())

  /** The staged lifecycle for DASHBOARD documents (see userDocsStaged).
    * The graph build keeps the inline fact path: per-branch column
    * pruning over the concurrent narrow re-scans beats both staging the
    * facts first (+10%) and persisting the fact projection (+30% —
    * materializes every column for branches that each read a few); the
    * staged-facts 100 TB shape is priced separately by
    * q_dashboard_graph_nodes_staged. Same oracle as
    * q_dashboard_search_doc: lossless round trip. */
  def dashboardDocsStaged(spark: SparkSession, dir: String): DataFrame = {
    val (n, e) = stageAndReadBack(spark,
      DashboardBuild.nodes(spark, dir),
      DashboardBuild.edges(spark, dir), "dashboard")
    dashboardDocsFromGraph(n, e)
  }

  /** Publish-tag-scoped DASHBOARD extraction — the reference substitutes
    * `{publish_tag_filter}` into the dashboard query's primary MATCH
    * (neo4j_search_data_extractor.py:88 `WHERE dashboard ...
    * {publish_tag_filter}`, `_add_publish_tag_filter`:161-175): the
    * WHERE binds only the `dashboard` variable, and Dashboard-labeled
    * nodes are read by exactly ONE branch (the hierarchy MATCH), so the
    * [[tableDocsTagged]] node-substitution pattern applies verbatim —
    * the merge subplan derives once, the label re-emitted as a LITERAL
    * keeps every other branch's label filter statically pruned. */
  def dashboardDocsTagged(spark: SparkSession, dir: String): DataFrame = {
    val nodesDf = DashboardBuild.nodes(spark, dir).toDF()
    val edgesDf = DashboardBuild.edges(spark, dir).toDF()
    val dashNodes = nodesDf.filter(col("label") === "Dashboard")
    // second publish's batch: every third dashboard — the part id is the
    // digit suffix of the dashboard's name attribute ('d<partkey>')
    val incoming = dashNodes.filter(
      expr("cast(substring(attributes['name'], 2) as bigint) % 3 = 0"))
    val merged = Publish.mergeUpsert(dashNodes, incoming, "key",
      Seq("label", "attributes"), "batch_2", epochMs = 2L)
    val scopedDash = merged.filter(col("published_tag") === "batch_2")
      .select(col("key"), lit("Dashboard").as("label"), col("attributes"))
    val scoped = scopedDash.union(nodesDf.filter(col("label") =!= "Dashboard"))
    dashboardDocsFromGraph(scoped, edgesDf)
  }
}
