package graft.io

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Structured-Streaming SOURCE over a [[TableFormat]] table — the
  * consumption half the format was missing: [[TableFormat.appendBatch]]
  * lets a stream WRITE the table exactly-once, and this lets another
  * stream FOLLOW it, so two pipelines compose through the table instead
  * of a queue (the Delta streaming-source idea on this format's
  * manifest log).
  *
  * The offset IS the manifest version — already a totally-ordered,
  * atomically-published long, so the source needs no tracking state of
  * its own: `getOffset` = latest version, `getBatch(a, b)` = what
  * changed in `(a, b]`, replay-deterministic because manifests and data
  * dirs are immutable. Two modes:
  *
  *   - `mode=appends` (default): new data dirs' rows, read under the TO
  *     schema. REFUSES a window containing a rewrite or deletion-vector
  *     commit unless `ignoreChanges=true` — replaying rewritten rows as
  *     fresh appends is how downstream counts silently drift (the
  *     contract the Delta source enforces).
  *   - `mode=cdc`: the row-level change feed
  *     ([[TableFormat.readChanges]]) with its `change_type` column —
  *     insert / delete / update_preimage / update_postimage — for
  *     consumers that maintain state through rewrites (requires
  *     `keyCol`). The initial batch is the full snapshot as inserts.
  *
  * Usage:
  * {{{
  *   spark.readStream
  *     .format("graft.io.TableFormatSourceProvider") // or "graft-table"
  *     .option("mode", "cdc").option("keyCol", "k")
  *     .load(tableRoot)
  * }}}
  *
  * Scale: `getOffset` lists one directory; `getBatch` plans from the
  * two manifests' diff, so per-trigger planning cost ∝ changed files,
  * never table size — the same bound the batch CDC carries. A trigger
  * spanning many versions coalesces into ONE batch (manifest diff
  * against the window's endpoints), which is what lets a restarted
  * consumer catch up in O(changed data).
  */
final class TableFormatSourceProvider
    extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-table"

  private def tableSchema(parameters: Map[String, String],
                          user: Option[StructType]): StructType = {
    val root = parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-table source needs a table root: .load(<root>)"))
    val base = user.orElse(TableFormat.latestSchema(root)).getOrElse(
      throw new IllegalArgumentException(
        s"no committed snapshot at $root and no user schema — create the " +
          "table first or pass .schema(...)"))
    if (parameters.getOrElse("mode", "appends") == "cdc")
      StructType(base.fields :+ StructField("change_type", StringType))
    else base
  }

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), tableSchema(parameters, schema))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new TableFormatStreamSource(sqlContext,
      parameters("path"), parameters, tableSchema(parameters, schema))
}

private[io] final class TableFormatStreamSource(sqlContext: SQLContext,
    root: String, parameters: Map[String, String],
    override val schema: StructType) extends Source {

  private val mode = parameters.getOrElse("mode", "appends")
  require(mode == "appends" || mode == "cdc",
    s"graft-table mode must be appends|cdc, got $mode")
  private val ignoreChanges =
    parameters.getOrElse("ignorechanges",
      parameters.getOrElse("ignoreChanges", "false")).toBoolean
  private val keyCol = parameters.get("keycol")
    .orElse(parameters.get("keyCol"))
  require(mode != "cdc" || keyCol.nonEmpty,
    "graft-table cdc mode needs option keyCol=<row key column>")

  override def getOffset: Option[Offset] = {
    val v = TableFormat.latestVersion(root)
    if (v < 0) None else Some(LongOffset(v.toLong))
  }

  private def version(o: Offset): Int = o match {
    case l: LongOffset => l.offset.toInt
    case other => other.json.trim.toInt // SerializedOffset after restart
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val spark = sqlContext.sparkSession
    val from = start.map(version).getOrElse(-1)
    val to = version(end)
    val batch: DataFrame = mode match {
      case "cdc" if from < 0 =>
        // initial batch: the whole snapshot enters the feed as inserts
        TableFormat.readSnapshot(spark, root, to)
          .withColumn("change_type", lit("insert"))
      case "cdc" =>
        TableFormat.readChanges(spark, root, from, to, keyCol.get)
      case _ =>
        TableFormat.readAppends(spark, root, from, to, ignoreChanges)
    }
    // order columns exactly as the planned source schema — a streaming
    // batch is consumed POSITIONALLY against it
    val aligned = batch.select(schema.fieldNames.map(col).toSeq: _*)
    // a v1 Source's batch must be a STREAMING frame; the sql-package
    // bridge forwards to the constructor Spark's own file stream
    // source uses for its batches
    org.apache.spark.sql.GraftStreamingBridge.streamingFrame(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      aligned.queryExecution.toRdd, aligned.schema)
  }

  override def stop(): Unit = ()

  override def toString: String = s"TableFormatStreamSource[$root, $mode]"
}
