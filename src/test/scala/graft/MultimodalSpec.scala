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

  test("block mosaic: thumbnails hash near, distinct docs hash far") {
    def ham(a: String, b: String): Int =
      a.zip(b).count { case (x, y) => x != y }
    val lens = (0L until 50L).map(d => (d * 37 + 113 * d * d) % 400 + 20)
    val origs = (0L until 50L).map(d =>
      ImageCodec.encodeBlockPng(d, lens(d.toInt)))
    val hashes = origs.map(ImageCodec.aHashPng)
    val thumbHams = origs.zipWithIndex.map { case (png, d) =>
      val thumb = ImageCodec.resizePng(png, 16)
      // dedup dims are always > 16, so every thumbnail is a genuinely
      // different payload
      assert(!java.util.Arrays.equals(png, thumb))
      val byteHash = ImageCodec.aHashPng(thumb)
      // the in-memory downscale the hash stage uses must agree with the
      // full byte path bit-for-bit (PNG grayscale losslessness)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(png))
      assert(ImageCodec.aHash(ImageCodec.downscale(img, 16)) === byteHash)
      ham(hashes(d), byteHash)
    }
    assert(thumbHams.count(_ <= 10) >= 30,
      s"thumbnail hamming too high: $thumbHams")
    // independent md5 mosaics: cross-doc hashes ~32 bits apart, never
    // inside the near-dup threshold at this sample size
    val cross = for {
      i <- hashes.indices; j <- (i + 1) until hashes.size
    } yield ham(hashes(i), hashes(j))
    assert(cross.min > 10, s"cross-doc hash collision: min ${cross.min}")
  }

  test("q_mm_dedup surfaces original↔thumbnail pairs under the threshold") {
    val rows = SparkEntry.queries("q_mm_dedup")(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty, "no near-dup pairs found")
    assert(rows.forall(_._3 <= 10), "verified pair above the threshold")
    val thumb = rows.count { case (a, b, _) =>
      b - a == Multimodal.ResizeIdOffset
    }
    // measured at sf0.001: 319 thumbnail pairs of 324 total (the rest are
    // the honest banded-LSH near-collision tail)
    assert(thumb * 10 >= rows.length * 9,
      s"thumbnail pairs $thumb of ${rows.length} — precision collapsed")
    val nDocs = spark.read.parquet(s"$Sf/documents.parquet").count()
    assert(thumb * 10 >= nDocs * 5,
      s"recovered $thumb of $nDocs thumbnails — recall collapsed")
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
