package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions._
import graft.sources.Tables

/** Publisher semantics as deterministic set operations.
  *
  * The reference publishes with per-statement MERGE upserts and batched
  * transactions (databuilder/publisher/neo4j_csv_publisher.py:271-447);
  * re-expressed as a full-outer join merge: incoming attributes win,
  * existing fill the gaps, every surviving row is stamped with the publish
  * tag + epoch. Staleness removal (task/neo4j_staleness_removal_task.py)
  * becomes a filter + per-label guardrail + anti-join — no delete loops.
  *
  * Scale notes: the merge shuffles both sides once on the key — at 100 TB
  * the current-state table should be bucketed by key so only the (much
  * smaller) incoming batch shuffles; the guardrail aggregates to |labels|
  * rows and broadcasts back, never collecting node rows to the driver.
  */
object Publish {

  /** MERGE upsert: `MERGE (n {key}) ON CREATE SET … ON MATCH SET …` over
    * whole tables. `attrCols` must exist in both inputs.
    *
    * Fidelity options mirroring the reference publisher:
    *  - `createOnly`: the label's ON MATCH SET is skipped — existing
    *    attributes win, and the publish tag/epoch stamp only lands on
    *    newly created rows (neo4j_csv_publisher.py:271-287);
    *  - `ignoreEmptyIncoming`: an empty-string incoming attribute does not
    *    overwrite a populated existing one — the User model's
    *    `do_not_update_empty_attribute` option (user.py:53,72-74). */
  def mergeUpsert(
      existing: DataFrame,
      incoming: DataFrame,
      keyCol: String,
      attrCols: Seq[String],
      publishTag: String,
      epochMs: Long,
      createOnly: Boolean = false,
      ignoreEmptyIncoming: Boolean = false): DataFrame = {
    val ex = existing.select((keyCol +: attrCols).map(c => col(c).as(s"ex_$c")): _*)
    val in = incoming.select((keyCol +: attrCols).map(c => col(c).as(s"in_$c")): _*)
    val merged = ex.join(in, col(s"ex_$keyCol") === col(s"in_$keyCol"), "full_outer")
    def mergeAttr(c: String): Column = {
      val inc =
        if (ignoreEmptyIncoming) when(col(s"in_$c") =!= "", col(s"in_$c"))
        else col(s"in_$c")
      // create-only skips ON MATCH SET entirely: a matched row keeps its
      // existing attributes AS THEY ARE (even nulls) — coalesce would
      // back-fill a null existing attribute from the incoming batch
      if (createOnly)
        when(col(s"ex_$keyCol").isNotNull, col(s"ex_$c")).otherwise(inc)
      else coalesce(inc, col(s"ex_$c"))
    }
    val stamped =
      if (createOnly) col(s"in_$keyCol").isNotNull && col(s"ex_$keyCol").isNull
      else col(s"in_$keyCol").isNotNull
    val outCols =
      coalesce(col(s"in_$keyCol"), col(s"ex_$keyCol")).as(keyCol) +:
      attrCols.map(c => mergeAttr(c).as(c)) :+
      when(stamped, lit(publishTag)).otherwise(lit("")).as("published_tag") :+
      when(stamped, lit(epochMs)).otherwise(lit(0L)).as("publisher_last_updated_epoch_ms")
    merged.select(outCols: _*)
  }

  /** Within-batch last-write-wins: the reference applies MERGEs in file
    * order so a later record for the same key overwrites an earlier one;
    * with set-oriented publishing the incoming batch is pre-deduped to
    * its latest record per key (row_number over the batch order). */
  def lastWriteWins(incoming: DataFrame, keyCol: String, orderCols: Seq[Column]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCol).orderBy(orderCols.map(_.desc): _*)
    incoming.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }

  /** DeleteRelationPreprocessor analog: pre-delete relations matching the
    * replace-set before publishing new ones — desired-state push
    * (neo4j_preprocessor.py:120-205). A left anti-join, no delete loops. */
  def deleteRelations(current: DataFrame, toDelete: DataFrame, keys: Seq[String]): DataFrame =
    current.join(toDelete.select(keys.map(col): _*), keys, "left_anti")

  /** Publisher relation MATCH — the reference's edge MERGE starts with
    * `MATCH (n1 {key}), (n2 {key})`, so an edge publishes only when both
    * endpoints exist (neo4j_csv_publisher.py:346-371). Returns
    * (publishable, dangling): two semi-joins against the distinct node
    * keys for the valid set, the anti complement for alerting. */
  def validateEndpoints(edges: DataFrame, nodeKeys: DataFrame): (DataFrame, DataFrame) = {
    // Using-column joins put the join key FIRST in the output, so every
    // branch is re-projected to the caller's column order — otherwise the
    // positional union below would swap startKey/endKey for end-dangling
    // edges and the two frames' layouts would differ from the input's.
    def ordered(df: DataFrame): DataFrame = df.select(edges.columns.map(col): _*)
    val keys = nodeKeys.select(col("key")).distinct()
    val startOk = ordered(edges.join(keys.withColumnRenamed("key", "startKey"),
      Seq("startKey"), "left_semi"))
    val valid = ordered(startOk.join(keys.withColumnRenamed("key", "endKey"),
      Seq("endKey"), "left_semi"))
    val dangling = ordered(edges
      .join(keys.withColumnRenamed("key", "startKey"), Seq("startKey"), "left_anti"))
      .union(ordered(startOk.join(keys.withColumnRenamed("key", "endKey"),
        Seq("endKey"), "left_anti")))
    (valid, dangling)
  }

  /** Endpoint-validation query shape: nodes = customers with custkey % 5
    * != 0 plus all order nodes; edges = orders (customer → order). Only
    * edges whose customer endpoint survives are publishable. */
  def endpointCheckQuery(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables(spark, dir, "orders")
    val nodeKeys = Tables(spark, dir, "customer")
      .filter(col("c_custkey") % 5 =!= 0)
      .select(concat(lit("c"), col("c_custkey")).as("key"))
      .union(orders.select(concat(lit("o"), col("o_orderkey")).as("key")))
    val edges = orders.select(
      concat(lit("c"), col("o_custkey")).as("startKey"),
      concat(lit("o"), col("o_orderkey")).as("endKey"))
    val (valid, _) = validateEndpoints(edges, nodeKeys)
    valid.select(col("startKey").as("start_key"), col("endKey").as("end_key"))
      .orderBy("start_key", "end_key")
  }

  /** Guardrail violation — mirrors the reference's job abort when a
    * label's stale ratio meets the threshold
    * (task/neo4j_staleness_removal_task.py:187-253). */
  final class StaleGuardrailException(msg: String) extends RuntimeException(msg)

  /** Per-label stale ratios — the guardrail's input, |labels| rows. */
  def staleRatios(nodes: DataFrame, staleCond: Column, labelCol: String): DataFrame =
    nodes.withColumn("_stale", staleCond.cast("int"))
      .groupBy(labelCol)
      .agg((sum(col("_stale")) / count(lit(1))).as("stale_ratio"))

  /** Reference abort semantics: raise when any label's stale ratio meets
    * `maxStalePct`. A driver-side action over the aggregated per-label
    * report (never over node rows), so it is safe at any scale. */
  def assertStaleGuardrail(
      nodes: DataFrame,
      staleCond: Column,
      labelCol: String,
      maxStalePct: Double): Unit = {
    val over = staleRatios(nodes, staleCond, labelCol)
      .filter(col("stale_ratio") >= maxStalePct)
      .collect()
    if (over.nonEmpty) {
      val detail = over.map(r => s"${r.get(0)}=${r.getDouble(1)}").mkString(", ")
      throw new StaleGuardrailException(
        s"stale ratio >= $maxStalePct for label(s): $detail — aborting sweep")
    }
  }

  /** RDS stale-record condition — the MySQL task's two expiry modes
    * (task/mysql_staleness_removal_task.py:172-184): epoch cutoff when
    * `msToExpire` is configured, else publish-tag mismatch (one mode or
    * the other, never both — matching the reference's if/else). */
  def rdsStaleCondition(
      marker: String,
      nowMs: Long,
      msToExpire: Option[Long],
      tagCol: String = "published_tag",
      epochCol: String = "publisher_last_updated_epoch_ms"): Column =
    msToExpire match {
      case Some(ms) => col(epochCol) < lit(nowMs - ms)
      case None     => col(tagCol) =!= lit(marker)
    }

  /** Neptune stale condition — job-created AND last extracted before the
    * cutoff (task/neptune_staleness_removal_task.py:103-117): records a
    * user created by hand are never swept regardless of age. */
  def neptuneStaleCondition(
      cutoffEpochMs: Long,
      creationTypeCol: String = "creation_type",
      lastExtractedCol: String = "last_extracted_epoch_ms"): Column =
    col(creationTypeCol) === "job" && col(lastExtractedCol) < lit(cutoffEpochMs)

  /** MySQLStalenessRemovalTask analog
    * (task/mysql_staleness_removal_task.py:105-170): per-RDS-table stale
    * ratios with per-table threshold overrides (`staleness_max_pct_dict`);
    * any table at or over its threshold aborts the WHOLE sweep before
    * anything is deleted — the reference raises inside validate, rolling
    * back the session. Returns the surviving records.
    *
    * The guardrail is a |tables|-row aggregate collected to the driver;
    * survivors are a plain filter — no row-level data leaves the
    * executors, so this holds at any scale. Callers sweeping the same
    * frame they then re-stage should persist it across the two passes. */
  def rdsStaleSweep(
      recs: DataFrame,
      staleCond: Column,
      tableCol: String,
      defaultMaxPct: Double,
      perTablePct: Map[String, Double] = Map.empty): DataFrame = {
    val flagged = recs.withColumn("_stale", staleCond.cast("int"))
    val over = flagged.groupBy(tableCol)
      .agg((sum(col("_stale")) / count(lit(1))).as("stale_ratio"))
      .collect()
      .filter { r =>
        r.getDouble(1) >= perTablePct.getOrElse(r.getString(0), defaultMaxPct)
      }
    if (over.nonEmpty) {
      val detail = over.map(r => s"${r.getString(0)}=${r.getDouble(1)}").mkString(", ")
      throw new StaleGuardrailException(
        s"stale ratio over threshold for table(s): $detail — aborting sweep")
    }
    flagged.filter(col("_stale") === 0).drop("_stale")
  }

  /** Mark-and-sweep staleness removal with the 5%-style guardrail:
    * a label whose stale ratio reaches `maxStalePct` is NOT swept (the
    * label is kept whole — callers wanting the reference's hard abort use
    * [[assertStaleGuardrail]] first). Returns surviving rows. */
  def staleSweep(
      nodes: DataFrame,
      staleCond: Column,
      labelCol: String,
      maxStalePct: Double): DataFrame = {
    val flagged = nodes.withColumn("_stale", staleCond.cast("int"))
    val ratios = flagged.groupBy(labelCol)
      .agg((sum(col("_stale")) / count(lit(1))).as("_stale_ratio"))
    flagged
      .join(broadcast(ratios), Seq(labelCol))
      .filter(col("_stale") === 0 || col("_stale_ratio") >= maxStalePct)
      .drop("_stale", "_stale_ratio")
  }

  // ---- oracle-checkable query shapes ----

  /** Snapshot diff — classify every key across two published snapshots as
    * added / removed / changed / unchanged, the change-data-capture report
    * an incremental publish emits (and the audit trail behind the
    * reference's publish-tag watermarking: what did this tag actually
    * touch?). One full-outer join on the key; attribute comparison is a
    * fingerprint over the declared attribute columns computed on each
    * side BEFORE the join, so only (key, fingerprint) shuffles, not the
    * attribute payload. */
  def snapshotDiff(
      before: DataFrame,
      after: DataFrame,
      keyCol: String,
      attrCols: Seq[String]): DataFrame = {
    // IS-DISTINCT-FROM semantics per column (the comparison the oracle
    // runs): NULL fingerprints differently from empty string AND from
    // any value, so NULL↔'' and NULL↔value transitions classify as
    // 'changed' — a bare <> would NULL-propagate them to 'unchanged'.
    // Encoding: "\u0002N" when NULL vs "\u0002V" + value otherwise —
    // concat returns NULL on a NULL input, so the coalesce picks the
    // sentinel exactly for NULLs, and \u0002 cannot appear in data.
    def fp(df: DataFrame, as: String): DataFrame =
      df.select(col(keyCol),
        md5(concat_ws("\u0001",
          attrCols.map(c => coalesce(concat(lit("\u0002V"), col(c)), lit("\u0002N"))): _*)).as(as))
    val b = fp(before, "fp_before")
    val a = fp(after, "fp_after")
    b.join(a, Seq(keyCol), "full_outer")
      .select(col(keyCol),
        when(col("fp_before").isNull, "added")
          .when(col("fp_after").isNull, "removed")
          .when(col("fp_before") =!= col("fp_after"), "changed")
          .otherwise("unchanged").as("status"))
  }

  /** Oracle-gated snapshot-diff query: before = custkey % 3 != 0, after =
    * custkey % 2 == 0 with the segment rewritten for every 4th key —
    * exercising all four statuses. */
  def snapshotDiffQuery(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer")
    val before = c.filter(col("c_custkey") % 3 =!= 0)
      .select(col("c_custkey").as("key"), col("c_name").as("name"),
        col("c_mktsegment").as("segment"))
    val after = c.filter(col("c_custkey") % 2 === 0)
      .select(col("c_custkey").as("key"), col("c_name").as("name"),
        // every 8th key NULLs the segment: the nullable-attr case — the
        // fingerprint must classify NULL-vs-value as 'changed'
        when(col("c_custkey") % 8 === 0, lit(null).cast("string"))
          .when(col("c_custkey") % 4 === 0, lower(col("c_mktsegment")))
          .otherwise(col("c_mktsegment")).as("segment"))
    snapshotDiff(before, after, "key", Seq("name", "segment"))
      .orderBy("key")
  }

  /** Upsert of a customer attribute batch over an existing snapshot:
    * existing = custkey % 3 != 0 (old tag), incoming = custkey % 2 == 0
    * with rewritten segment. */
  def upsertQuery(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer")
    val existing = c.filter(col("c_custkey") % 3 =!= 0)
      .select(col("c_custkey").as("key"), col("c_name").as("name"),
        col("c_mktsegment").as("segment"))
    val incoming = c.filter(col("c_custkey") % 2 === 0)
      .select(col("c_custkey").as("key"), col("c_name").as("name"),
        lower(col("c_mktsegment")).as("segment"))
    mergeUpsert(existing, incoming, "key", Seq("name", "segment"), "tag_2", 2000L)
      .orderBy("key")
  }

  /** Within-batch LWW upsert: the incoming batch is each customer's orders
    * (many rows per key); the latest by (orderdate, orderkey) wins before
    * the merge — the reference's apply-in-order MERGE semantics. */
  def lwwUpsertQuery(spark: SparkSession, dir: String): DataFrame = {
    val existing = Tables(spark, dir, "customer").filter(col("c_custkey") % 3 =!= 0)
      .select(col("c_custkey").as("key"), col("c_name").as("name"),
        col("c_mktsegment").as("segment"))
    val batch = Tables(spark, dir, "orders")
      .select(col("o_custkey").as("key"), col("o_orderstatus").as("name"),
        col("o_orderpriority").as("segment"), col("o_orderdate"), col("o_orderkey"))
    val incoming = lastWriteWins(batch, "key", Seq(col("o_orderdate"), col("o_orderkey")))
      .select("key", "name", "segment")
    mergeUpsert(existing, incoming, "key", Seq("name", "segment"), "tag_3", 3000L)
      .orderBy("key")
  }

  /** Create-only-label upsert: matched rows keep every existing attribute
    * and are not re-stamped; only newly created rows get incoming attrs +
    * publish tag (neo4j_csv_publisher.py:271-287). */
  def createOnlyUpsertQuery(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer")
    val existing = c.filter(col("c_custkey") % 3 =!= 0)
      .select(col("c_custkey").as("key"), col("c_name").as("name"),
        col("c_mktsegment").as("segment"))
    val incoming = c.filter(col("c_custkey") % 2 === 0)
      .select(col("c_custkey").as("key"), col("c_name").as("name"),
        lower(col("c_mktsegment")).as("segment"))
    mergeUpsert(existing, incoming, "key", Seq("name", "segment"), "tag_2", 2000L,
        createOnly = true)
      .orderBy("key")
  }

  /** do_not_update_empty_attribute upsert: incoming rows with an empty
    * segment must not blank out the existing value (user.py:53,72-74). */
  def emptyAttrUpsertQuery(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer")
    val existing = c.filter(col("c_custkey") % 3 =!= 0)
      .select(col("c_custkey").as("key"), col("c_name").as("name"),
        col("c_mktsegment").as("segment"))
    val incoming = c.filter(col("c_custkey") % 2 === 0)
      .select(col("c_custkey").as("key"), col("c_name").as("name"),
        when(col("c_custkey") % 4 === 0, lit(""))
          .otherwise(lower(col("c_mktsegment"))).as("segment"))
    mergeUpsert(existing, incoming, "key", Seq("name", "segment"), "tag_2", 2000L,
        ignoreEmptyIncoming = true)
      .orderBy("key")
  }

  /** DeleteRelationPreprocessor over lineitem-as-relations: distinct
    * (order, supplier) pairs minus the replace-set (returned lines). */
  def deleteRelationQuery(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val current = li.select(col("l_orderkey").as("start_key"),
      col("l_suppkey").as("end_key")).distinct()
    val toDelete = li.filter(col("l_returnflag") === "R")
      .select(col("l_orderkey").as("start_key"), col("l_suppkey").as("end_key"))
      .distinct()
    deleteRelations(current, toDelete, Seq("start_key", "end_key"))
      .orderBy("start_key", "end_key")
  }

  /** RDS staleness sweep (epoch-expiry mode) over a stamped two-table
    * record universe: orders and lineitems as RDS records whose publish
    * epoch is their order/ship date; everything last published before
    * 1995-01-01 is expired. Thresholds are set above the actual ratios so
    * the guardrail passes (the abort path is spec-tested). Output is the
    * per-table survivor count. */
  def rdsStaleSweepQuery(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders").select(
      lit("orders_rec").as("rds_table"),
      concat(lit("o"), col("o_orderkey")).as("rk"),
      (unix_timestamp(col("o_orderdate")) * 1000).as("publisher_last_updated_epoch_ms"))
    val l = Tables(spark, dir, "lineitem").select(
      lit("lineitem_rec").as("rds_table"),
      concat(lit("l"), col("l_orderkey"), lit("-"), col("l_linenumber")).as("rk"),
      (unix_timestamp(col("l_shipdate")) * 1000).as("publisher_last_updated_epoch_ms"))
    val nowMs = 912470400000L                       // 1998-12-01 UTC
    val cutoffMs = 788918400000L                    // 1995-01-01 UTC
    val cond = rdsStaleCondition("cur", nowMs, Some(nowMs - cutoffMs))
    rdsStaleSweep(o.union(l), cond, "rds_table", 0.99,
        Map("orders_rec" -> 0.95))
      .groupBy("rds_table").agg(count(lit(1)).as("n_kept"))
      .orderBy("rds_table")
  }

  /** Neptune staleness sweep over lineitems-as-edges: creation_type is
    * 'user' for every 4th line (never swept), 'job' otherwise; last
    * extracted = ship date, cutoff 1996-01-01. Labels (return flags) at or
    * over 75% stale are kept whole — both guardrail branches fire across
    * the three flags. Output is the per-label survivor count. */
  def neptuneStaleSweepQuery(spark: SparkSession, dir: String): DataFrame = {
    val edges = Tables(spark, dir, "lineitem").select(
      col("l_returnflag").as("label"),
      concat(col("l_orderkey"), lit("-"), col("l_linenumber")).as("key"),
      when(col("l_linenumber") % 4 === 0, lit("user")).otherwise(lit("job"))
        .as("creation_type"),
      (unix_timestamp(col("l_shipdate")) * 1000).as("last_extracted_epoch_ms"))
    staleSweep(edges, neptuneStaleCondition(820454400000L /* 1996-01-01 UTC */),
        "label", 0.75)
      .groupBy("label").agg(count(lit(1)).as("n_kept"))
      .orderBy("label")
  }

  /** Staleness sweep over orders-as-nodes: label = order priority, stale =
    * status 'F'; labels with ≥40% stale abort (are kept whole). Output is
    * the per-label survivor count — the guardrail report. */
  def staleSweepQuery(spark: SparkSession, dir: String): DataFrame = {
    val nodes = Tables(spark, dir, "orders")
      .select(col("o_orderkey").as("key"), col("o_orderpriority").as("label"),
        col("o_orderstatus").as("status"))
    staleSweep(nodes, col("status") === "F", "label", 0.40)
      .groupBy("label").agg(count(lit(1)).as("n_kept"))
      .orderBy("label")
  }

  /** COMPOSED staleness lifecycle — the phases the reference runs as one
    * flow (task/neo4j_staleness_removal_task.py:125-185): publish →
    * second tagged publish (untouched rows RETAIN their old stamp) →
    * staleness sweep keyed on the current tag with the per-label
    * guardrail → re-publish re-creating swept rows. One oracle-gated
    * query replaying all four phases:
    *
    *  1. tag_1 publishes every c_custkey % 3 != 0 customer into empty
    *     state;
    *  2. tag_2 re-publishes a 60% churn slice ((key·7)%10 < 6) that
    *     skips FURNITURE entirely and uppercases the name — touched rows
    *     re-stamp, untouched keep tag_1;
    *  3. the sweep (threshold 0.5) deletes tag_1 leftovers in the
    *     churned labels (stale ratio ≈ 0.3) but the guardrail REFUSES
    *     the fully-stale FURNITURE label (ratio 1.0 ≥ 0.5) — both
    *     guardrail branches execute;
    *  4. tag_3 re-publishes every key % 5 == 0 customer, re-creating
    *     swept rows and re-stamping survivors.
    *
    * Output: per (label, published_tag) row counts + the uppercase-name
    * count (publish-2's attribute change surviving the merges) + epoch
    * range. */
  def publishLifecycleQuery(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer")
    def snap(f: Column => Column, nameCol: Column): DataFrame = c
      .filter(f(col("c_custkey")))
      .select(col("c_custkey").as("key"), nameCol.as("name"),
        col("c_mktsegment").as("segment"))
    // a publish where untouched rows retain their previous stamp: the
    // merge stamps touched rows; the left join back fills the rest from
    // the prior state (the reference's MERGE only rewrites rows it hits)
    def publish(current: DataFrame, incoming: DataFrame, tag: String, epoch: Long): DataFrame = {
      val merged = mergeUpsert(current.select("key", "name", "segment"),
        incoming, "key", Seq("name", "segment"), tag, epoch)
      merged
        .join(current.select(col("key"),
          col("published_tag").as("prev_tag"),
          col("publisher_last_updated_epoch_ms").as("prev_e")), Seq("key"), "left")
        .withColumn("published_tag",
          when(col("published_tag") === "", coalesce(col("prev_tag"), lit("")))
            .otherwise(col("published_tag")))
        .withColumn("publisher_last_updated_epoch_ms",
          when(col("publisher_last_updated_epoch_ms") === 0L, coalesce(col("prev_e"), lit(0L)))
            .otherwise(col("publisher_last_updated_epoch_ms")))
        .drop("prev_tag", "prev_e")
    }
    val empty = snap(_ => lit(false), col("c_name"))
      .withColumn("published_tag", lit(""))
      .withColumn("publisher_last_updated_epoch_ms", lit(0L))
    val cur1 = publish(empty, snap(k => k % 3 =!= 0, col("c_name")), "tag_1", 1000L)
    val churn = c.filter(col("c_mktsegment") =!= "FURNITURE" &&
        (col("c_custkey") * 7) % 10 < 6)
      .select(col("c_custkey").as("key"), upper(col("c_name")).as("name"),
        col("c_mktsegment").as("segment"))
    val cur2 = publish(cur1, churn, "tag_2", 2000L)
    val cur3 = staleSweep(cur2, col("published_tag") =!= "tag_2", "segment", 0.5)
    val cur4 = publish(cur3, snap(k => k % 5 === 0, col("c_name")), "tag_3", 3000L)
    cur4.groupBy(col("segment").as("label"), col("published_tag"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("name") === upper(col("name")), 1L).otherwise(0L)).as("n_upper"),
        min(col("publisher_last_updated_epoch_ms")).as("min_epoch"),
        max(col("publisher_last_updated_epoch_ms")).as("max_epoch"))
      .orderBy("label", "published_tag")
  }
}
