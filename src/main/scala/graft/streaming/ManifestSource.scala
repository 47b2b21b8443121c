package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.sources.Manifest

/** `spark.readStream.format("graft-manifest")` — TAIL a
  * manifest-maintained table as a structured stream (the Delta
  * streaming-source role): OFFSETS ARE MANIFEST SEQS, and each
  * micro-batch is [[Manifest.readChanges]] between the last processed
  * and the latest committed snapshot — so the consumer sees exactly
  * the file sets the writer committed, never a torn half-batch and
  * never an in-flight rewrite (the committed-snapshot guarantee,
  * continuously). This closes the table ecosystem loop: ingest with
  * [[StreamingPipeline.selfClusteringSink]], maintain with
  * `Layout.clusterPartitions`, consume downstream with this source.
  *
  * Options:
  *  - `path` (required): the manifest-maintained table directory.
  *  - `startingSeq`: `latest` (default — only commits after the stream
  *    starts), `earliest` (first batch = the full latest snapshot,
  *    then deltas), or an explicit retained seq.
  *  - `onRewrite`: `redeliver` (default) or `fail`. File-level CDC
  *    means a maintenance rewrite (which replaces every file)
  *    re-delivers the whole table; `fail` detects removed files
  *    between the two offsets and stops the query instead — the Delta
  *    `ignoreChanges` trade, surfaced explicitly. Consumers that keep
  *    `redeliver` deduplicate on the sink's `batch_id` (it survives
  *    rewrites) or a row key.
  *  - `onSchemaDrift`: `warn` (default) or `fail`. The stream serves
  *    the schema pinned at construction; a LATER commit that widened
  *    the table would otherwise have its new columns silently dropped
  *    from every batch. `warn` logs the dropped columns once per
  *    batch; `fail` stops the query naming them (restart the stream to
  *    adopt the widened schema).
  *  - `cdc`: `files` (default) or `rows`. `rows` delivers ROW-level
  *    change-data capture ([[Manifest.readChangeRows]]): each batch is
  *    the exact multiset of rows inserted/deleted by the commit range,
  *    labelled in a trailing `_change_type` column — a maintenance
  *    rewrite cancels to ZERO rows (so `onRewrite` becomes moot), a
  *    delete delivers exactly the deleted rows as `delete`. The diff
  *    MATERIALIZES per batch (localCheckpoint over the changed files
  *    only — bounded by the delta, never the table); `earliest`'s
  *    first batch is the full snapshot labelled `insert`.
  *
  * Exactly-once: the engine checkpoints offsets; a restarted query
  * re-resolves its LAST batch's start offset (V1 recovery) and then
  * replays deterministic file-set diffs — so size
  * `spark.graft.manifest.keep` (on the WRITER) to cover the consumer's
  * maximum lag in maintenance cycles INCLUDING that restart replay
  * (keep ≥ lag + 2; the spec runs keep=10). A vacuumed-away offset
  * fails loudly, never silently skips. */
class ManifestSourceProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-manifest"

  /** The table dir: a path, or a [[graft.GraftCatalog]]-registered NAME
    * (`.load("docs")` / `.option("path", "docs")`) — resolved HERE, at
    * stream construction, so the binding is fixed for the run (a
    * re-registration mid-stream never re-points a running query). */
  private def pathOf(sqlContext: SQLContext,
                     parameters: Map[String, String]): String = {
    val raw = parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-manifest source requires .option(\"path\", <table dir or " +
        "registered name>)"))
    if (raw.contains('/')) raw
    else graft.GraftCatalog.dirOf(sqlContext.sparkSession, raw).getOrElse(
      throw new IllegalArgumentException(
        s"graft-manifest source: '$raw' is neither a path nor a registered " +
          "graft table name (GraftCatalog.register, CREATE TABLE ... USING " +
          "graft, or a spark.graft.catalog.registry entry)"))
  }

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) = {
    val m = Manifest.info(sqlContext.sparkSession, pathOf(sqlContext, parameters))
    val base = StructType(m.dataSchema.fields ++ m.partSchema.fields)
    val s =
      if (parameters.getOrElse("cdc", "files") == "rows")
        StructType(base.fields :+ org.apache.spark.sql.types.StructField(
          "_change_type", org.apache.spark.sql.types.StringType, nullable = false))
      else base
    (shortName(), s)
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source =
    new ManifestSource(sqlContext.sparkSession, pathOf(sqlContext, parameters),
      parameters.getOrElse("startingSeq", "latest"),
      parameters.getOrElse("onRewrite", "redeliver"),
      parameters.getOrElse("onSchemaDrift", "warn"),
      parameters.getOrElse("cdc", "files"))
}

class ManifestSource(spark: SparkSession, path: String,
                     starting: String, onRewrite: String,
                     onSchemaDrift: String = "warn",
                     cdc: String = "files")
    extends Source with org.apache.spark.internal.Logging {

  require(Set("redeliver", "fail").contains(onRewrite),
    s"graft-manifest: onRewrite must be redeliver|fail, got '$onRewrite'")
  require(Set("warn", "fail").contains(onSchemaDrift),
    s"graft-manifest: onSchemaDrift must be warn|fail, got '$onSchemaDrift'")
  require(Set("files", "rows").contains(cdc),
    s"graft-manifest: cdc must be files|rows, got '$cdc'")

  /** The seq AFTER which changes flow ("latest" pins the head at stream
    * construction; -1 means the first batch is the full snapshot). */
  private val startSeq: Long = starting match {
    case "latest" => Manifest.latestSeq(spark, path).getOrElse(
      throw new IllegalArgumentException(
        s"graft-manifest: $path has no committed manifest"))
    case "earliest" => -1L
    case n => n.toLong
  }

  private val pinnedSchema: StructType = {
    val m = Manifest.info(spark, path)
    val base = StructType(m.dataSchema.fields ++ m.partSchema.fields)
    require(!(cdc == "rows" && base.fieldNames.contains("_change_type")),
      s"graft-manifest: cdc=rows reserves the _change_type column; $path already has one")
    if (cdc == "rows")
      StructType(base.fields :+ org.apache.spark.sql.types.StructField(
        "_change_type", org.apache.spark.sql.types.StringType, nullable = false))
    else base
  }

  override def schema: StructType = pinnedSchema

  override def getOffset: Option[Offset] =
    Manifest.latestSeq(spark, path).map(LongOffset(_)) match {
      // no new commit since the pinned start → no batch yet
      case Some(LongOffset(s)) if s <= startSeq && starting == "latest" => None
      case other => other
    }

  private def seqOf(o: Offset): Long = o match {
    case LongOffset(s) => s
    case s: SerializedOffset => s.json.trim.toLong
    case other => throw new IllegalArgumentException(
      s"graft-manifest: unexpected offset $other")
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val endSeq = seqOf(end)
    if (cdc == "rows") return getRowsBatch(start.map(seqOf), endSeq)
    val df = start.map(seqOf).orElse(Some(startSeq).filter(_ >= 0)) match {
      case None => Manifest.read(spark, path, Some(endSeq)) // earliest: full snapshot
      case Some(from) =>
        if (onRewrite == "fail") {
          val fromFiles = Manifest.info(spark, path, Some(from)).files.toSet
          val toFiles = Manifest.info(spark, path, Some(endSeq)).files
          val removed = fromFiles -- toFiles.toSet
          require(removed.isEmpty,
            s"graft-manifest: commits $from..$endSeq of $path removed ${removed.size} " +
              "file(s) - a maintenance rewrite; file-level CDC would re-deliver the " +
              "table. Restart from a fresh startingSeq, or use onRewrite=redeliver " +
              "and deduplicate on batch_id")
        }
        Manifest.readChanges(spark, path, from, Some(endSeq))
    }
    // pin the column set/order across schema drift between commits, and
    // flag the relation streaming (the engine asserts getBatch's plan is)
    // — but never SILENTLY: a later commit's added columns are about to
    // be dropped from this batch, which downstream has no way to notice
    val dropped = df.columns.filterNot(pinnedSchema.fieldNames.contains)
    if (dropped.nonEmpty) {
      val msg = s"graft-manifest: commits up to seq $endSeq of $path added " +
        s"column(s) ${dropped.mkString(", ")} not in this stream's pinned " +
        "schema; they are dropped from the batch. Restart the stream to " +
        "adopt the widened schema (onSchemaDrift=fail stops instead)."
      if (onSchemaDrift == "fail") throw new IllegalStateException(msg)
      logWarning(msg)
    }
    val projected = df.select(pinnedSchema.fieldNames.map(col).toSeq: _*)
    // DV-carrying tables read through a single-relation probe FILTER
    // since round 18 (no join — the batch plan streams directly); the
    // guard below stays as a defensive net for any future multi-relation
    // read shape, where flipping both relations streaming would plan a
    // stream-stream join
    val hasJoin = projected.queryExecution.analyzed.collectFirst {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.nonEmpty
    org.apache.spark.sql.GraftBridge.asStreamingRelation(spark,
      if (hasJoin) projected.localCheckpoint(true) else projected)
  }

  /** ROW-level CDC batch: the multiset diff of the commit range
    * ([[Manifest.readChangeRows]]), materialized per batch — the diff
    * plan carries an Except, which must not land under streaming
    * planning, and its cost is bounded by the CHANGED files only. The
    * `earliest` first batch is the full snapshot labelled `insert`. */
  private def getRowsBatch(start: Option[Long], endSeq: Long): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val diff = start.orElse(Some(startSeq).filter(_ >= 0)) match {
      case None =>
        Manifest.read(spark, path, Some(endSeq)).withColumn("_change_type", lit("insert"))
      case Some(from) =>
        Manifest.readChangeRows(spark, path, from, Some(endSeq))
    }
    val dropped = diff.columns.filterNot(pinnedSchema.fieldNames.contains)
    if (dropped.nonEmpty) {
      val msg = s"graft-manifest: commits up to seq $endSeq of $path added " +
        s"column(s) ${dropped.mkString(", ")} not in this stream's pinned schema; " +
        "they are dropped from the batch. Restart the stream to adopt the " +
        "widened schema (onSchemaDrift=fail stops instead)."
      if (onSchemaDrift == "fail") throw new IllegalStateException(msg)
      logWarning(msg)
    }
    val materialized = diff.select(pinnedSchema.fieldNames.map(col).toSeq: _*)
      .localCheckpoint(true)
    org.apache.spark.sql.GraftBridge.asStreamingRelation(spark, materialized)
  }

  override def stop(): Unit = ()
}
