package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.io.Sources

/** Multimodal-column pipeline: media payloads ride through the engine as
  * opaque `binary` columns with typed metadata, and decode / feature
  * extraction runs batched per partition — the Scala equivalent of a
  * pandas-batch UDF stage.
  *
  * This container ships no image/audio codecs, so the decoder itself is a
  * clearly-marked deterministic STUB ([[DecoderStub]]); everything around
  * it — binary schema, partition-batched execution, feature-struct output
  * shape — is real and tested. Swapping the stub for a JNI/codec
  * implementation changes no plumbing.
  */
object Multimodal {

  /** A media row as it would arrive from ingestion: payload + metadata. */
  final case class MediaRow(doc_id: Long, content: Array[Byte], mime: String)

  /** Extracted features (what a real decoder would emit). */
  final case class MediaFeatures(
      doc_id: Long, n_bytes: Long, width: Long, height: Long,
      n_frames: Long, checksum: Long)

  /** STUB decoder: stands in for image/audio decode (libs absent in this
    * environment). Deterministic pure function of the bytes, so tests and
    * oracle runs are stable. A real implementation would decode `content`
    * per `mime` and emit true dimensions; batch shape and signature stay
    * identical.
    */
  object DecoderStub {
    def decode(rows: Iterator[MediaRow]): Iterator[MediaFeatures] =
      rows.map { r =>
        val n = r.content.length.toLong
        // cheap rolling checksum of the payload (deterministic fake for a
        // perceptual hash)
        var ck = 0L
        var i = 0
        while (i < r.content.length) {
          ck = (ck * 31 + (r.content(i) & 0xff)) & 0x7fffffffL
          i += 1
        }
        MediaFeatures(r.doc_id, n, n % 640 + 1, (n * 7) % 480 + 1,
          n % 30 + 1, ck)
      }
  }

  /** Media table synthesized from `documents`: UTF-8 payload as the binary
    * column (the testdata carries no real media; the *column shape* is the
    * point).
    */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    Sources.table(s, dir, "documents")
      .select(col("doc_id"),
        col("text").cast(BinaryType).as("content"),
        lit("image/fake").as("mime"))

  /** Metadata extraction as pure column expressions (no decode needed) —
    * oracle-verified. At 100 TB this is the cheap scan-side pass that
    * routes payloads to the right decoder pool.
    */
  private def qMmMeta(s: SparkSession, dir: String): DataFrame =
    mediaTable(s, dir)
      .select(col("doc_id"), col("mime"),
        octet_length(col("content")).cast(LongType).as("n_bytes"))
      .withColumn("width", col("n_bytes") % 640 + 1)
      .withColumn("height", (col("n_bytes") * 7) % 480 + 1)
      .withColumn("n_frames", col("n_bytes") % 30 + 1)
      .orderBy("doc_id")

  /** Partition-batched decode through [[DecoderStub]] — the mapPartitions
    * stage a real decoder would run in (one decoder init per partition,
    * rows streamed through in batch). Rows-only check: the stub checksum
    * is not SQL-expressible, which is the point of the stage.
    *
    * Encoder-boundary hygiene: the scan is pre-projected to the two
    * columns the decoder consumes and crosses into JVM objects via a lean
    * (Long, Array[Byte]) product encoder — the constant `mime` column is
    * attached object-side, so no literal string is deserialized per row.
    * mapPartitions breaks whole-stage codegen by nature; keeping the
    * serialized footprint minimal is what bounds that cost at scale.
    */
  private def qMmFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Sources.table(s, dir, "documents")
      .select(col("doc_id"), col("text").cast(BinaryType).as("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        DecoderStub.decode(it.map { case (id, bytes) =>
          MediaRow(id, bytes, "image/fake")
        })
      }
      .toDF()
      .orderBy("doc_id")
  }

  /** Resize stage STUB: bounds each payload to `maxBytes` (a real
    * implementation re-encodes to a target resolution; the batch shape —
    * binary in, binary out, one init per partition — is identical).
    */
  object ResizeStub {
    def resize(rows: Iterator[MediaRow], maxBytes: Int): Iterator[MediaRow] =
      rows.map(r =>
        if (r.content.length <= maxBytes) r
        else r.copy(content = r.content.take(maxBytes)))
  }

  /** Frame sampling: every 5th frame index per payload with its byte
    * offset — the generate/explode stage that fans one video row out to
    * its sampled frames before decode. Pure integer arithmetic over the
    * metadata, so it is oracle-verified; at scale this is where you size
    * the decoder pool (rows out = Σ n_frames/5, not corpus rows).
    */
  private def qMmFrames(s: SparkSession, dir: String): DataFrame =
    mediaTable(s, dir)
      .select(col("doc_id"),
        octet_length(col("content")).cast(LongType).as("n_bytes"))
      .withColumn("n_frames", col("n_bytes") % 30 + 1)
      .select(col("doc_id"), col("n_bytes"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(5L)))
          .as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        (col("frame_idx") * expr("n_bytes div n_frames")).as("byte_offset"))
      .orderBy("doc_id", "frame_idx")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_mm_meta" -> qMmMeta,
    "q_mm_features" -> qMmFeatures,
    "q_mm_frames" -> qMmFrames)

  val oracleSql: Map[String, String] = Map(
    "q_mm_meta" ->
      """SELECT doc_id, 'image/fake' AS mime,
        |CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |CAST(octet_length(encode(text)) AS BIGINT) % 640 + 1 AS width,
        |CAST(octet_length(encode(text)) AS BIGINT) * 7 % 480 + 1 AS height,
        |CAST(octet_length(encode(text)) AS BIGINT) % 30 + 1 AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_mm_frames" ->
      """WITH f AS (SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  CAST(octet_length(encode(text)) AS BIGINT) % 30 + 1 AS n_frames
        |  FROM documents)
        |SELECT doc_id, CAST(fi AS BIGINT) AS frame_idx,
        |CAST(fi * (n_bytes // n_frames) AS BIGINT) AS byte_offset
        |FROM f, unnest(range(0, n_frames, 5)) AS t(fi)
        |ORDER BY doc_id, frame_idx""".stripMargin)
}
