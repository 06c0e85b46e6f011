package graft

import graft.ops.Multimodal
import graft.ops.Multimodal.{AudioCodec, ImageCodec, MediaRow}

/** Multimodal specs: real PNG codec round-trip, resize bounds, batch
  * shape, binary-column schema through the engine.
  */
class MultimodalSpec extends TestSpark {

  test("png codec round-trips the deterministic image losslessly") {
    for (docId <- Seq(0L, 7L, 123L); n <- Seq(0L, 5L, 100L, 12345L)) {
      val png = ImageCodec.encodePng(docId, n)
      // real PNG bytes: magic header
      assert(png.take(4).toSeq === Seq[Byte](0x89.toByte, 'P', 'N', 'G'))
      val Seq(f) = ImageCodec.decode(
        Iterator(MediaRow(docId, png, "image/png"))).toSeq
      val (w, h) = ImageCodec.dims(n)
      assert(f.width === w.toLong && f.height === h.toLong)
      // decoded stats equal the generator formula exactly (lossless)
      val vals = for (y <- 0 until h; x <- 0 until w)
        yield ImageCodec.pixel(docId, x, y).toLong
      assert(f.px_sum === vals.sum)
      assert(f.px_min === vals.min && f.px_max === vals.max)
    }
  }

  test("decode is deterministic across repeated batches") {
    val rows = Seq(
      MediaRow(1L, ImageCodec.encodePng(1L, 42L), "image/png"),
      MediaRow(2L, ImageCodec.encodePng(2L, 7L), "image/png"))
    val out1 = ImageCodec.decode(rows.iterator).toSeq
    val out2 = ImageCodec.decode(rows.iterator).toSeq
    assert(out1 === out2)
  }

  test("resize bounds dimensions, keeps small images intact, is idempotent") {
    val big = ImageCodec.encodePng(3L, 12L)      // 13 x 1 — width over 8
    val small = ImageCodec.encodePng(3L, 2L)     // 3 x 3 — within 8
    val shrunk = ImageCodec.resizePng(big, 8)
    val Seq(f) = ImageCodec.decode(
      Iterator(MediaRow(0L, shrunk, "image/png"))).toSeq
    assert(f.width <= 8 && f.height <= 8)
    // within-bounds payloads pass through untouched (same bytes)
    assert(ImageCodec.resizePng(small, 8).toSeq === small.toSeq)
    // idempotent: resizing the resized payload changes nothing
    assert(ImageCodec.resizePng(shrunk, 8).toSeq === shrunk.toSeq)
    // nearest-neighbor samples come from the source image
    val Seq(g) = ImageCodec.decode(
      Iterator(MediaRow(0L, big, "image/png"))).toSeq
    assert(f.px_min >= g.px_min && f.px_max <= g.px_max)
  }

  test("wav codec round-trips the deterministic waveform losslessly") {
    for (docId <- Seq(0L, 42L, 999L); n <- Seq(0L, 13L, 12345L)) {
      val wav = AudioCodec.encodeWav(docId, n)
      // real RIFF/WAVE container
      assert(new String(wav.take(4), "US-ASCII") === "RIFF")
      val Seq(f) = AudioCodec.decode(
        Iterator(MediaRow(docId, wav, "audio/wav"))).toSeq
      val ns = AudioCodec.nSamples(n)
      assert(f.n_samples === ns.toLong)
      assert(f.sample_rate === AudioCodec.SampleRate.toLong)
      val vals = (0 until ns).map(i => AudioCodec.sample(docId, i).toLong)
      assert(f.amp_sum === vals.sum)
      assert(f.amp_min === vals.min && f.amp_max === vals.max)
    }
  }

  test("frame sampling fans each payload out to its every-5th frames") {
    val frames = graft.SparkEntry.queries("q_mm_frames")(spark, Sf)
    val meta = graft.SparkEntry.queries("q_mm_meta")(spark, Sf)
      .selectExpr("doc_id", "n_frames")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byDoc = frames.groupBy("doc_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byDoc.keySet === meta.keySet)
    byDoc.foreach { case (d, n) =>
      assert(n === (meta(d) - 1) / 5 + 1, s"doc $d")
    }
  }

  test("media tables carry real binary columns through a Spark plan") {
    val mt = Multimodal.mediaTable(spark, Sf)
    assert(mt.schema("content").dataType ===
      org.apache.spark.sql.types.BinaryType)
    val pt = Multimodal.pngTable(spark, Sf)
    assert(pt.schema("content").dataType ===
      org.apache.spark.sql.types.BinaryType)
    val features = graft.SparkEntry.queries("q_mm_features")(spark, Sf)
    assert(features.count() ===
      graft.io.Sources.table(spark, Sf, "documents").count())
  }
}
