package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.{GraphNode, GraphRelationship}

/** Staged-output layer — the loader/publisher file contracts (SURVEY §2.7).
  *
  *  - Node/edge staging ← FsNeo4jCSVLoader's per-(label, key-set) shards
  *    (databuilder/loader/file_system_neo4j_csv_loader.py:153-198): here one
  *    parquet/csv directory partitioned by label / relType — the schema-
  *    per-shard behavior falls out of partitioning, and downstream
  *    publishers get partition pruning for free.
  *  - NDJSON documents ← FSElasticsearchJSONLoader
  *    (loader/file_system_elasticsearch_json_loader.py:12), sorted keys.
  *  - Blue/green publish ← ElasticsearchPublisher's new-index + alias swap
  *    (publisher/elasticsearch_publisher.py:74-123): write a new suffixed
  *    directory, then atomically repoint a CURRENT marker.
  */
object Stage {

  // partitionBy writes one file per (task × partition value) — the classic
  // small-files trap: a 32-task graph build × 7 labels = 200+ tiny files,
  // and at cluster scale thousands of tasks × labels would swamp the
  // namenode. Repartitioning BY THE PARTITION COLUMN first routes each
  // label to one shuffle partition, so each label directory gets one
  // well-sized file (raise the partition count per label via a salt if a
  // single label outgrows a task — not the case for catalog-sized data).
  def stageNodes(nodes: Dataset[GraphNode], outDir: String): Unit =
    nodes.toDF()
      .select(col("key"), col("label"), col("attributes"))
      .repartition(col("label"))
      .write.mode(SaveMode.Overwrite).partitionBy("label").parquet(s"$outDir/nodes")

  def stageEdges(edges: Dataset[GraphRelationship], outDir: String): Unit =
    edges.toDF()
      .repartition(col("relType"))
      .write.mode(SaveMode.Overwrite).partitionBy("relType").parquet(s"$outDir/edges")

  def readNodes(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(s"$outDir/nodes")

  def readEdges(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(s"$outDir/edges")

  /** Bucketed staging for co-located joins: two tables bucketed (and
    * sorted) on the same join key join with NO shuffle — bucket-aware
    * sort-merge join reads matching buckets side by side. This is the
    * pre-partitioning strategy for repeated big⋈big joins at 100 TB
    * (SURVEY §4): pay the bucketing shuffle once at staging, never at
    * query time. Files land in the session warehouse. */
  def stageBucketed(df: DataFrame, table: String, bucketCol: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    val (db, tbl) = table.split('.') match {
      case Array(t)    => (spark.catalog.currentDatabase, t)
      case Array(d, t) => (d, t)
      case _ => throw new IllegalArgumentException(
        s"stageBucketed takes `table` or `db.table`, got '$table'")
    }
    spark.sql(s"DROP TABLE IF EXISTS `$db`.`$tbl`")
    // an in-memory catalog forgets tables between sessions but their
    // files survive in the warehouse — clear an orphaned location so the
    // staging write is idempotent. Resolve the managed location through
    // the catalog; a database the catalog doesn't know yet has no
    // orphaned files to clean.
    if (spark.catalog.databaseExists(db)) {
      val dbDir = new org.apache.hadoop.fs.Path(spark.catalog.getDatabase(db).locationUri)
      val loc = new org.apache.hadoop.fs.Path(dbDir, tbl.toLowerCase)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)
  }

  /** FileSystemCSVLoader analog — generic header CSV output
    * (loader/file_system_csv_loader.py:15). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  /** Neptune bulk-CSV typed headers: each column becomes `name:Type` with
    * Type ∈ String/Long/Double/Bool derived from the Spark type
    * (serializers/neptune_serializer.py:155-165); the Neo4j loader's
    * `:UNQUOTED` int/bool key suffix (neo4_serializer.py:52-59) is the
    * same typed-at-the-CSV-edge decision. */
  def typedHeader(schema: org.apache.spark.sql.types.StructType): Seq[String] = {
    import org.apache.spark.sql.types._
    schema.fields.toSeq.map { f =>
      val t = f.dataType match {
        case LongType | IntegerType | ShortType | ByteType => "Long"
        case DoubleType | FloatType => "Double"
        case BooleanType => "Bool"
        case _ => "String"
      }
      s"${f.name}:$t"
    }
  }

  /** Neptune-format CSV write with typed headers. */
  def writeNeptuneCsv(df: DataFrame, path: String): Unit =
    df.toDF(typedHeader(df.schema): _*)
      .write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  /** The consumer side of the typed-header contract: parse `name:Type`
    * headers back into typed columns — what the bulk loader does with
    * the same header line. The pair proves the typed-at-the-CSV-edge
    * decision is lossless. */
  def readNeptuneCsv(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("header", "true").csv(path)
    raw.select(raw.columns.toIndexedSeq.map { c =>
      val (name, t) = c.splitAt(c.lastIndexOf(':'))
      val typed = t.drop(1) match {
        case "Long"   => raw.col(c).cast("long")
        case "Double" => raw.col(c).cast("double")
        case "Bool"   => raw.col(c).cast("boolean")
        case _        => raw.col(c)
      }
      typed.as(name)
    }: _*)
  }

  /** Oracle-gated CSV loader round trip: write the generic header CSV,
    * read it back under the declared schema — lossless, so the oracle is
    * the plain source query. */
  def csvLoaderRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    val src = graft.sources.Tables(spark, dir, "orders")
      .filter(col("o_orderkey") % 50 === 0)
      .select(col("o_orderkey").cast("long").as("order_id"),
        col("o_orderstatus").as("status"),
        col("o_totalprice").cast("double").as("total"))
    val out = TmpStores.pidScopedRoot("graft-csv-loader").toString
    writeCsv(src, out)
    spark.read.option("header", "true").schema(src.schema).csv(out)
      .orderBy("order_id")
  }

  /** Oracle-gated Neptune typed-header round trip: the writer stamps
    * `name:Type` headers, the reader derives the column types from them
    * alone (no external schema) — Long/Double/Bool/String all survive.
    * The boolean is cast to long only at the output edge (oracle-hash
    * stability); the typed round trip itself carries it as Bool. */
  def neptuneCsvRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    val src = graft.sources.Tables(spark, dir, "orders")
      .filter(col("o_orderkey") % 50 === 0)
      .select(col("o_orderkey").cast("long").as("order_id"),
        col("o_orderstatus").as("status"),
        col("o_totalprice").cast("double").as("total"),
        (col("o_orderpriority") === "1-URGENT").as("urgent"))
    val out = TmpStores.pidScopedRoot("graft-neptune-csv").toString
    writeNeptuneCsv(src, out)
    readNeptuneCsv(spark, out)
      .select(col("order_id"), col("status"), col("total"),
        col("urgent").cast("long").as("urgent"))
      .orderBy("order_id")
  }

  /** The ES index-mapping artifact the publisher creates the new index
    * with (reference publisher/elasticsearch_publisher.py:94 +
    * elasticsearch_constants.py's TABLE_ELASTICSEARCH_INDEX_MAPPING):
    * derived deterministically from the document schema — text fields get
    * the simple analyzer plus a `raw` keyword subfield (the searchable-
    * and-aggregatable double mapping of the reference), epoch columns map
    * to `date/epoch_second`, numerics to long/double — and the `_id`
    * routing contract (`idCol`) is recorded so a consumer knows which
    * source column keys each document. */
  def esIndexMapping(
      schema: org.apache.spark.sql.types.StructType,
      docType: String,
      idCol: String): String = {
    import org.apache.spark.sql.types._
    def fieldJson(name: String, dt: DataType): String = dt match {
      case LongType | IntegerType if name.endsWith("timestamp") =>
        """{"type":"date","format":"epoch_second"}"""
      case LongType | IntegerType | ShortType => """{"type":"long"}"""
      case DoubleType | FloatType => """{"type":"double"}"""
      case BooleanType => """{"type":"boolean"}"""
      case ArrayType(el, _) => fieldJson(name, el)
      case _ =>
        """{"type":"text","analyzer":"simple","fields":{"raw":{"type":"keyword"}}}"""
    }
    val props = schema.fields.sortBy(_.name)
      .map(f => s""""${f.name}":${fieldJson(f.name, f.dataType)}""").mkString(",")
    s"""{"mappings":{"$docType":{"properties":{$props}}},"_id_from":"$idCol"}"""
  }

  /** NDJSON with deterministic (sorted) column order — the ES document
    * contract (models/elasticsearch_document.py:14-22 sorts keys). When
    * `idCol` is given, the column must exist and be non-null — the
    * document-id routing contract — and the index-mapping artifact lands
    * beside the documents as `_MAPPING.json`. */
  def writeSearchDocs(docs: DataFrame, outDir: String, docType: String = null,
      idCol: String = null): Unit = {
    if (idCol != null)
      require(docs.columns.contains(idCol),
        s"id routing column '$idCol' missing from ${docs.columns.mkString(",")}")
    docs.select(docs.columns.sorted.map(col): _*)
      .write.mode(SaveMode.Overwrite).json(outDir)
    if (idCol != null) {
      val mapping = esIndexMapping(docs.schema,
        Option(docType).getOrElse("table"), idCol)
      Hfs.writeString(
        new org.apache.hadoop.fs.Path(outDir, "_MAPPING.json"), mapping)
    }
  }

  /** Size-aware small-files compaction — the table-maintenance pass every
    * long-lived 100 TB dataset needs: streaming/publisher micro-batches
    * and per-label staging leave directories of KB-sized files whose
    * per-file open/footer cost eventually dominates scans (and whose
    * count swamps the namenode). The compactor sizes its shuffle from the
    * DATA, not a constant: list the input's bytes, target
    * ceil(bytes / targetBytes) output files (≥ 1), and rewrite through
    * one repartition. Returns (inFiles, outFiles, the reloaded frame) so
    * callers can gate on the shrink; the rewrite is lossless, which the
    * oracle-checked round-trip query pins. */
  def compactParquet(spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long = 128L * 1024 * 1024): (Long, Long, DataFrame) = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val in = new org.apache.hadoop.fs.Path(inDir)
    val fs = in.getFileSystem(hconf)
    val dataFiles = fs.listStatus(in).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
    val bytes = dataFiles.map(_.getLen).sum
    val nOut = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(inDir)
      .repartition(nOut)
      .write.mode(SaveMode.Overwrite).parquet(outDir)
    val outFiles = fs.listStatus(new org.apache.hadoop.fs.Path(outDir)).toSeq
      .count(s => s.isFile && !s.getPath.getName.startsWith("_")).toLong
    (dataFiles.size.toLong, outFiles, spark.read.parquet(outDir))
  }

  /** Oracle-gated compaction round trip: fragment a table the way a
    * micro-batch publisher would (64 task-sized shards), compact it
    * size-aware, and return the reloaded rows with the file shrink
    * stamped on each — proving both losslessness (the oracle is the
    * plain source query) and that the pass actually compacts
    * (in=64 → out=1 at this volume; the spec asserts the general
    * ratio). */
  def compactionRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables(spark, dir, "orders")
      .filter(col("o_orderkey") % 10 === 0)
      .select(col("o_orderkey").cast("long").as("order_id"),
        col("o_orderstatus").as("status"),
        col("o_totalprice").cast("double").as("total"))
    val base = TmpStores.pidScopedRoot("graft-compact").toString
    src.repartition(64).write.mode(SaveMode.Overwrite).parquet(s"$base/frag")
    val (inFiles, outFiles, compacted) =
      compactParquet(spark, s"$base/frag", s"$base/compact")
    require(outFiles < inFiles,
      s"compaction did not shrink the file count: $inFiles -> $outFiles")
    compacted
      .withColumn("in_files", lit(inFiles))
      .withColumn("out_files", lit(outFiles))
      .orderBy("order_id")
  }

  /** The single-logical-commit marker swap shared by every blue/green
    * consumer (search-doc publish, the streaming snapshot publisher,
    * every ClaimStore generation): write CURRENT.tmp, then rename ONTO
    * CURRENT — readers see the old target or the new one, never a
    * partial write. Goes through the Hadoop FileSystem API ([[Hfs]]) so
    * the marker lives beside the data wherever the store does
    * (HDFS/S3A/local). */
  def atomicRepoint(baseDir: String, target: String): Unit =
    Hfs.writeStringAtomic(
      new org.apache.hadoop.fs.Path(baseDir, "CURRENT"), target)

  /** The committed target CURRENT points at, or None before any publish.
    *
    * Swap-window discipline: on a filesystem without an atomic-rename
    * binding, [[Hfs.writeStringAtomic]] falls back to delete-then-rename,
    * leaving an instant where CURRENT is absent but the fully-written
    * CURRENT.tmp holds the NEW marker. Treating that instant as "no
    * committed target" would silently drop the whole committed generation
    * from a reader's union (a claim-store probe would wrongly re-admit
    * duplicates rather than fail loudly) — so when the marker is absent
    * but its .tmp exists, retry briefly, and if the window persists (the
    * swap crashed between the delete and the rename) resolve the .tmp:
    * its content is complete before the swap ever starts, so it IS the
    * committed target. */
  def currentTarget(baseDir: String): Option[String] = {
    val marker = new org.apache.hadoop.fs.Path(baseDir, "CURRENT")
    val tmp = new org.apache.hadoop.fs.Path(baseDir, "CURRENT.tmp")
    def readOpt(p: org.apache.hadoop.fs.Path): Option[String] =
      try Some(Hfs.readString(p).trim)
      catch { case _: java.io.FileNotFoundException => None } // lost a race with a concurrent swap — loop
    var attempt = 0
    while (attempt < 5) {
      if (Hfs.exists(marker.toString)) {
        readOpt(marker) match {
          case some @ Some(_) => return some
          case None => // deleted under us; fall through to the tmp check
        }
      }
      val tmpExists = Hfs.exists(tmp.toString)
      // re-check the marker: the rename may have landed between the two
      // exists probes, which would make an absent tmp mean "committed",
      // not "never published"
      if (Hfs.exists(marker.toString)) {
        readOpt(marker).foreach(t => return Some(t))
      } else if (!tmpExists) return None
      attempt += 1
      if (attempt >= 5) {
        // the window PERSISTED: the swap crashed between the delete and
        // the rename. Roll it FORWARD (the healRepackSwap discipline) —
        // the tmp's content is complete before the swap starts, so the
        // rename just finishes the committed repoint — instead of
        // re-resolving the tmp on every call: currentTarget is a hot
        // path (ClaimStore.read probes it per query) and a store stuck
        // in this state would otherwise pay the full retry loop's
        // sleeps and exists() round-trips forever. Best-effort: losing
        // a race with a (very slow) live swapper's own rename is fine —
        // both renames commit identical content.
        try {
          val f = Hfs.fs(marker)
          if (!f.exists(marker) && f.exists(tmp))
            f.rename(f.makeQualified(tmp), f.makeQualified(marker))
        } catch { case _: java.io.IOException => () }
        return readOpt(marker).orElse(readOpt(tmp))
      }
      Thread.sleep(5L * attempt)
    }
    None
  }

  /** Blue/green swap: write to a fresh versioned dir, atomically repoint
    * CURRENT, then DROP the old generations — the reference deletes the
    * old index in the same atomic alias update that flips the alias
    * (elasticsearch_publisher.py:24 "Old index is deleted after the
    * alias swap", :111-122 remove_index actions alongside the alias
    * actions), so a nightly publish never accretes a full corpus copy
    * per run. The swap itself stays atomic for in-flight readers: a
    * reader that resolved the old target BEFORE the repoint can still
    * read it until [[dropStaleGenerations]] runs after the swap —
    * identical failure semantics to the reference's alias flip. The new
    * generation carries its mapping artifact + id contract when given. */
  def publishBlueGreen(docs: DataFrame, baseDir: String, generation: String,
      docType: String = null, idCol: String = null): String = {
    val target = s"$baseDir/gen=$generation"
    writeSearchDocs(docs, target, docType, idCol)
    atomicRepoint(baseDir, target)
    dropStaleGenerations(baseDir)
    target
  }

  /** Delete every non-CURRENT `gen=` directory under `baseDir` — the
    * old-index delete of the reference's publish
    * (elasticsearch_publisher.py:111-122), run AFTER the CURRENT swap so
    * readers resolving the marker never lose a reachable byte.
    * Generations compare by FILE NAME against the committed target's
    * name (the ClaimStore generation-cleanup discipline) — a raw-string
    * compare would mis-normalize a caller-supplied dir (trailing slash,
    * scheme qualification) and delete the just-committed generation. */
  def dropStaleGenerations(baseDir: String): Unit =
    currentTarget(baseDir)
      .map(t => new org.apache.hadoop.fs.Path(t).getName)
      .foreach { keep =>
        Hfs.children(baseDir)(n => n.startsWith("gen=") && n != keep)
          .foreach(p => Hfs.delete(p))
      }

  /** Read the committed generation. Pass the document `schema` (the writer
    * knows it — writeSearchDocs also records it in `_MAPPING.json`): with a
    * schema the read is a single lazy scan; without one, Spark's JSON
    * schema inference costs a FULL extra pass over the published store
    * before the DataFrame even exists — acceptable only for ad-hoc
    * exploration, never in a registered pipeline. */
  def current(spark: SparkSession, baseDir: String,
      schema: org.apache.spark.sql.types.StructType = null): DataFrame = {
    val target = currentTarget(baseDir).getOrElse(
      throw new IllegalStateException(s"no CURRENT marker in $baseDir"))
    if (schema != null) spark.read.schema(schema).json(target)
    else spark.read.json(target)
  }
}
