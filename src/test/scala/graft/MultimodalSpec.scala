package graft

import graft.ops.Multimodal
import graft.ops.Multimodal.{DecoderStub, MediaRow}

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
