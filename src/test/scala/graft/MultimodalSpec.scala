package graft

import graft.ops.Multimodal
import graft.ops.Multimodal.{DecoderStub, MediaRow, ResizeStub}

/** Multimodal plumbing specs: stub decoder determinism and batch shape,
  * binary-column schema through the engine.
  */
class MultimodalSpec extends TestSpark {

  test("decoder stub is deterministic and total") {
    val rows = Seq(
      MediaRow(1L, "hello".getBytes("UTF-8"), "image/fake"),
      MediaRow(2L, Array.empty[Byte], "image/fake"))
    val out1 = DecoderStub.decode(rows.iterator).toSeq
    val out2 = DecoderStub.decode(rows.iterator).toSeq
    assert(out1 === out2)
    assert(out1.head.n_bytes === 5L)
    assert(out1(1).n_bytes === 0L) // empty payload doesn't crash
    out1.foreach { f =>
      assert(f.width >= 1 && f.width <= 640)
      assert(f.height >= 1 && f.height <= 480)
      assert(f.n_frames >= 1 && f.n_frames <= 30)
    }
  }

  test("resize stub bounds payloads, keeps small ones intact, is idempotent") {
    val rows = Seq(
      MediaRow(1L, Array.fill[Byte](1000)(7), "image/fake"),
      MediaRow(2L, "tiny".getBytes("UTF-8"), "image/fake"))
    val out = ResizeStub.resize(rows.iterator, 256).toSeq
    assert(out.head.content.length === 256)
    assert(out(1).content.sameElements("tiny".getBytes("UTF-8")))
    val again = ResizeStub.resize(out.iterator, 256).toSeq
    assert(again.map(_.content.toSeq) === out.map(_.content.toSeq))
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

  test("media table carries a real binary column through a Spark plan") {
    val mt = Multimodal.mediaTable(spark, Sf)
    assert(mt.schema("content").dataType ===
      org.apache.spark.sql.types.BinaryType)
    val features = graft.SparkEntry.queries("q_mm_features")(spark, Sf)
    assert(features.count() ===
      graft.io.Sources.table(spark, Sf, "documents").count())
    // checksum distributes: different payloads, different checksums (spot)
    val cks = features.select("checksum").limit(100)
      .collect().map(_.getLong(0))
    assert(cks.distinct.length > 90)
  }
}
