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
  * The container ships no external media libraries, but the JDK's own
  * `javax.imageio` is a real PNG codec — so the decode stage is REAL
  * ([[ImageCodec]]): actual PNG bytes in the binary column, actual ImageIO
  * decode in the partition-batched stage. The *test images* are synthesized
  * deterministically from document metadata (there is no true media in the
  * testdata), which is exactly what makes the decoded pixel statistics
  * oracle-checkable: DuckDB recomputes them from the same generator
  * formula, and the hash match proves the encode→decode round-trip is
  * lossless in the engine.
  */
object Multimodal {

  /** A media row as it would arrive from ingestion: payload + metadata. */
  final case class MediaRow(doc_id: Long, content: Array[Byte], mime: String)

  /** Features decoded from a real image payload. */
  final case class DecodedFeatures(
      doc_id: Long, width: Long, height: Long,
      px_sum: Long, px_min: Long, px_max: Long)

  /** Real PNG codec on `javax.imageio` (JDK-native, headless-safe).
    *
    * Images are 8-bit grayscale: PNG is lossless there, so
    * raster-sample-level equality between what [[encodePng]] wrote and what
    * [[decode]] reads back is guaranteed — the property the q_mm_features
    * oracle checks end-to-end. Samples are read/written through the raster
    * (never `getRGB`, whose color-space conversion is not portable).
    */
  object ImageCodec {

    // ImageIO's default stream cache is DISK-backed: every read/write
    // spills the stream through a temp FILE, so per-image cost rides the
    // state of the local filesystem — measured here as the mm bench tier
    // drifting 0.7 → 2.4 s between otherwise identical runs. These
    // payloads are KB-sized in-memory byte arrays; cache them in memory.
    // (Executor-side: the flag is static per JVM, set when the codec
    // class loads on each executor — one line, no per-task cost.)
    javax.imageio.ImageIO.setUseCache(false)

    /** Deterministic image dimensions for a doc with `n` payload bytes. */
    def dims(n: Long): (Int, Int) =
      ((n % 16 + 1).toInt, ((n * 7) % 12 + 1).toInt)

    /** Deterministic grayscale value at (x, y) for `docId`. */
    def pixel(docId: Long, x: Int, y: Int): Int =
      ((docId * 31 + x * 7 + y * 13) % 256).toInt

    /** Encode the deterministic test image for (docId, n) as real PNG
      * bytes.
      */
    def encodePng(docId: Long, n: Long): Array[Byte] = {
      val (w, h) = dims(n)
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { raster.setSample(x, y, 0, pixel(docId, x, y)); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Decode PNG payloads batched per partition (one codec context per
      * partition, rows streamed through) and emit per-image pixel
      * statistics — the real form of the decode/feature-extract stage.
      */
    def decode(rows: Iterator[MediaRow]): Iterator[DecodedFeatures] =
      rows.map { r =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.content))
        require(img != null, s"undecodable payload for doc ${r.doc_id}")
        val raster = img.getRaster
        val (w, h) = (img.getWidth, img.getHeight)
        var (sum, mn, mx) = (0L, 256L, -1L)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v = raster.getSample(x, y, 0).toLong
            sum += v; if (v < mn) mn = v; if (v > mx) mx = v
            x += 1
          }
          y += 1
        }
        DecodedFeatures(r.doc_id, w.toLong, h.toLong, sum, mn, mx)
      }

    /** Deterministic block value for the near-dup test mosaic: byte 0 of
      * md5("d:bi:bj") — the same engine-portable digest convention as
      * [[graft.ops.Dedup.HyperPlanes]], so the DuckDB oracle regenerates
      * every pixel without out-of-band data.
      */
    def blockVal(docId: Long, bi: Int, bj: Int): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(s"$docId:$bi:$bj".getBytes("UTF-8"))(0) & 0xff
    }

    /** Image dimensions for the near-dup mosaic fixture: 17..32 × 17..28.
      * Strictly larger than both the 8×8 hash grid and the 16-px thumbnail
      * bound — at the [[dims]] sizes (1..16) an 8×8 grid has almost no
      * entropy (a 2-px-wide image yields one of three aHash patterns) and
      * perceptual hashing rightly collapses, so the dedup fixture gets its
      * own size regime.
      */
    def dedupDims(n: Long): (Int, Int) =
      ((n % 16 + 17).toInt, ((n * 7) % 12 + 17).toInt)

    /** Encode the deterministic 8×8 block-mosaic test image for (docId, n):
      * piecewise-constant blocks with md5-pseudorandom per-doc values.
      * Piecewise-constant content is what makes the fixture honest for
      * near-dup work — a nearest-neighbor downscale samples the same
      * blocks, so a thumbnail aHashes within a few bits of its source,
      * while different docs' mosaics are independent and collide only by
      * 2^-64 chance.
      */
    def encodeBlockPng(docId: Long, n: Long): Array[Byte] = {
      val (w, h) = dedupDims(n)
      val blocks = Array.tabulate(8, 8)((bi, bj) => blockVal(docId, bi, bj))
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          raster.setSample(x, y, 0, blocks(x * 8 / w)(y * 8 / h))
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** 64-bit average hash (aHash) of a decoded image: sample a fixed 8×8
      * grid by nearest neighbor (`g(x,y) = in(x·w/8, y·h/8)` — integer
      * index arithmetic, no interpolation, so the oracle regenerates it
      * exactly), then bit k = y·8+x is 1 iff the sample exceeds the grid
      * mean. The mean compare is the overflow-free integer form
      * `v·64 > Σv` — no division, bit-portable across engines. Stable
      * under resize by construction: the grid of a nearest-neighbor-
      * downscaled image samples (nearly) the same source pixels, so a
      * thumbnail hashes within a few bits of its original — exactly the
      * property perceptual-hash dedup exploits.
      */
    def aHash(img: java.awt.image.BufferedImage): String = {
      val (w, h) = (img.getWidth, img.getHeight)
      val raster = img.getRaster
      val g = new Array[Long](64)
      var sum = 0L
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          val v = raster.getSample(x * w / 8, y * h / 8, 0).toLong
          g(y * 8 + x) = v; sum += v
          x += 1
        }
        y += 1
      }
      val sb = new java.lang.StringBuilder(64)
      var i = 0
      while (i < 64) { sb.append(if (g(i) * 64L > sum) '1' else '0'); i += 1 }
      sb.toString
    }

    /** Decode + [[aHash]] in one step (the partition-batched stage form). */
    def aHashPng(bytes: Array[Byte]): String = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      require(img != null, "undecodable payload")
      aHash(img)
    }

    /** Nearest-neighbor downscale to at most `maxDim` on each side, then
      * re-encode — a real resize with deterministic integer sampling
      * (library scalers vary by platform; `out(x,y) = in(x·w/ow, y·h/oh)`
      * does not). Payloads already within bounds pass through untouched,
      * which also makes the operation idempotent.
      */
    def resizePng(bytes: Array[Byte], maxDim: Int): Array[Byte] = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      require(img != null, "undecodable payload")
      if (img.getWidth <= maxDim && img.getHeight <= maxDim) bytes
      else {
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(downscale(img, maxDim), "png", bos)
        bos.toByteArray
      }
    }

    /** The raster half of [[resizePng]]: nearest-neighbor downscale of a
      * decoded image (identity when already within bounds). Shared so
      * in-memory consumers (the q_mm_dedup hash stage) use bit-identical
      * sampling arithmetic without paying the dead encode→decode pair —
      * PNG grayscale is lossless, so the two paths agree sample-for-
      * sample.
      */
    def downscale(img: java.awt.image.BufferedImage,
                  maxDim: Int): java.awt.image.BufferedImage = {
      val (w, h) = (img.getWidth, img.getHeight)
      if (w <= maxDim && h <= maxDim) img
      else {
        val scale = math.max(
          (w + maxDim - 1) / maxDim, (h + maxDim - 1) / maxDim)
        val (ow, oh) = (math.max(1, w / scale), math.max(1, h / scale))
        val out = new java.awt.image.BufferedImage(
          ow, oh, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        var y = 0
        while (y < oh) {
          var x = 0
          while (x < ow) {
            out.getRaster.setSample(x, y, 0,
              img.getRaster.getSample(x * w / ow, y * h / oh, 0))
            x += 1
          }
          y += 1
        }
        out
      }
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

  /** Features decoded from a real audio payload. */
  final case class AudioFeatures(
      doc_id: Long, n_samples: Long, sample_rate: Long,
      amp_sum: Long, amp_min: Long, amp_max: Long)

  /** Real WAV codec on `javax.sound.sampled` (JDK-native, headless-safe).
    * 16-bit signed PCM mono: the WAVE container is lossless, so decoded
    * sample values equal what [[encodeWav]] wrote — the property the
    * q_mm_audio oracle checks end-to-end against the generator formula.
    */
  object AudioCodec {

    val SampleRate = 8000

    /** Deterministic sample count for a doc with `n` payload bytes. */
    def nSamples(n: Long): Int = (n % 100 + 10).toInt

    /** Deterministic 16-bit sample value at index `i` for `docId`. */
    def sample(docId: Long, i: Int): Int =
      ((docId * 7919 + i * 337) % 65536 - 32768).toInt

    /** Encode the deterministic test waveform for (docId, n) as real WAV
      * bytes (RIFF/WAVE, 16-bit LE PCM mono).
      */
    def encodeWav(docId: Long, n: Long): Array[Byte] = {
      val ns = nSamples(n)
      val pcm = new Array[Byte](ns * 2)
      var i = 0
      while (i < ns) {
        val v = sample(docId, i)
        pcm(2 * i) = (v & 0xff).toByte
        pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(
        SampleRate.toFloat, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, ns.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    /** Decode WAV payloads batched per partition and emit amplitude
      * statistics — the audio half of the decode/feature-extract stage.
      */
    def decode(rows: Iterator[MediaRow]): Iterator[AudioFeatures] =
      rows.map { r =>
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.content))
        val fmt = ais.getFormat
        require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
          s"unexpected wav format for doc ${r.doc_id}: $fmt")
        val data = ais.readAllBytes()
        val ns = data.length / 2
        var (sum, mn, mx) = (0L, Long.MaxValue, Long.MinValue)
        var i = 0
        while (i < ns) {
          val v = (((data(2 * i + 1).toInt) << 8) |
            (data(2 * i).toInt & 0xff)).toShort.toLong
          sum += v; if (v < mn) mn = v; if (v > mx) mx = v
          i += 1
        }
        AudioFeatures(r.doc_id, ns.toLong, fmt.getSampleRate.toLong,
          sum, mn, mx)
      }
  }

  /** Real-PNG media table: one deterministic grayscale PNG per document,
    * encoded by [[ImageCodec.encodePng]] in a partition-batched stage —
    * genuine image bytes riding the binary column (the testdata carries no
    * true media, so the images are synthesized from document metadata).
    */
  def pngTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Sources.table(s, dir, "documents")
      .select(col("doc_id"),
        octet_length(col("text")).cast(LongType).as("n_bytes"))
      .as[(Long, Long)]
      .mapPartitions(it =>
        it.map { case (id, n) => (id, ImageCodec.encodePng(id, n)) })
      .toDF("doc_id", "content")
  }

  /** Real-WAV media table: one deterministic 16-bit PCM waveform per
    * document, encoded by [[AudioCodec.encodeWav]] in a partition-batched
    * stage — the audio twin of [[pngTable]].
    */
  def wavTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Sources.table(s, dir, "documents")
      .select(col("doc_id"),
        octet_length(col("text")).cast(LongType).as("n_bytes"))
      .as[(Long, Long)]
      .mapPartitions(it =>
        it.map { case (id, n) => (id, AudioCodec.encodeWav(id, n)) })
      .toDF("doc_id", "content")
  }

  /** Materialized binary media fixtures — parquet with a binary `content`
    * column, written ONCE per (sf dir, documents fingerprint) and read by
    * the decode-stage queries. Synthesizing + encoding the media inside
    * each query timed fixture creation with the decode it is supposed to
    * measure (round-5 VERDICT: most of q_mm_features' 6.7 s); at 100 TB
    * the payload bytes are an at-rest input, so the honest query shape is
    * scan(binary) → decode. The path is keyed on the source table's
    * content fingerprint like [[Sources.partitionedEventsPath]], so
    * regenerated testdata invalidates the fixture instead of silently
    * reusing it.
    */
  private def fixturePath(dir: String, kind: String): String =
    s"/tmp/graft_mm_${kind}_" + dir.replaceAll("[^A-Za-z0-9]", "_") +
      "_" + Sources.fingerprint(dir, "documents")

  private def materialized(s: SparkSession, dir: String, kind: String,
                           build: => DataFrame): DataFrame = {
    val path = fixturePath(dir, kind)
    this.synchronized {
      if (!new java.io.File(path, "_SUCCESS").exists())
        build.write.mode("overwrite").parquet(path)
    }
    s.read.parquet(path)
  }

  /** Block-mosaic media table for near-dup dedup: one deterministic
    * [[ImageCodec.encodeBlockPng]] mosaic per document — the same
    * binary-column shape as [[pngTable]], with content designed to carry
    * per-doc entropy through an 8×8 perceptual hash (see
    * [[ImageCodec.dedupDims]] for why the gradient fixture cannot).
    */
  def blockPngTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Sources.table(s, dir, "documents")
      .select(col("doc_id"),
        octet_length(col("text")).cast(LongType).as("n_bytes"))
      .as[(Long, Long)]
      .mapPartitions(it =>
        it.map { case (id, n) => (id, ImageCodec.encodeBlockPng(id, n)) })
      .toDF("doc_id", "content")
  }

  private[graft] def pngFixture(s: SparkSession, dir: String): DataFrame =
    materialized(s, dir, "png", pngTable(s, dir))

  private[graft] def wavFixture(s: SparkSession, dir: String): DataFrame =
    materialized(s, dir, "wav", wavTable(s, dir))

  private[graft] def blockPngFixture(s: SparkSession, dir: String): DataFrame =
    materialized(s, dir, "blockpng", blockPngTable(s, dir))

  /** Force the media fixtures into existence — [[graft.Bench]] runs this
    * in its prepare step so the timed queries measure decode only.
    */
  def prepareFixtures(s: SparkSession, dir: String): Unit = {
    pngFixture(s, dir)
    wavFixture(s, dir)
    blockPngFixture(s, dir)
  }

  /** Partition-batched REAL decode: PNG bytes from [[pngFixture]] through
    * `javax.imageio` ([[ImageCodec.decode]]) to per-image pixel statistics.
    * Oracle-checked end-to-end — DuckDB regenerates the expected stats from
    * the deterministic image formula, so a hash match proves the PNG
    * encode→binary-column→decode chain is lossless.
    *
    * Encoder-boundary hygiene: the scan is pre-projected to the two
    * columns the codec consumes and crosses into JVM objects via a lean
    * (Long, Array[Byte]) product encoder — the constant `mime` column is
    * attached object-side, so no literal string is deserialized per row.
    * mapPartitions breaks whole-stage codegen by nature; keeping the
    * serialized footprint minimal is what bounds that cost at scale.
    */
  private def qMmFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    pngFixture(s, dir)
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        ImageCodec.decode(it.map { case (id, bytes) =>
          MediaRow(id, bytes, "image/png")
        })
      }
      .toDF()
      .orderBy("doc_id")
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

  /** Resize-then-decode: each PNG payload through
    * [[ImageCodec.resizePng]] (bound 8×8) and back through the decoder —
    * the typical thumbnail/normalization stage before feature extraction.
    * Oracle-verified: nearest-neighbor sampling is pure integer index
    * arithmetic, so DuckDB recomputes the post-resize pixel statistics
    * from the image formula and the hash match proves the full
    * encode→resize→re-encode→decode chain.
    */
  private def qMmResize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    pngFixture(s, dir)
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        ImageCodec.decode(it.map { case (id, bytes) =>
          MediaRow(id, ImageCodec.resizePng(bytes, 8), "image/png")
        })
      }
      .toDF()
      .orderBy("doc_id")
  }

  /** Audio half of the decode stage: deterministic 16-bit PCM waveforms
    * encoded as real WAV bytes in the binary column, decoded back through
    * `javax.sound` ([[AudioCodec]]), emitting amplitude statistics the
    * oracle regenerates from the waveform formula.
    */
  private def qMmAudio(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    wavFixture(s, dir)
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        AudioCodec.decode(it.map { case (id, bytes) =>
          MediaRow(id, bytes, "audio/wav")
        })
      }
      .toDF()
      .orderBy("doc_id")
  }

  /** Offset distinguishing the resized variant's img_id from its source
    * doc_id in [[qMmDedup]]'s variant corpus.
    */
  private[graft] val ResizeIdOffset = 100000L

  /** Memoized per-(session, dir) aHash signatures of the variant corpus
    * (original + thumbnail per document): the LSH self-join and the
    * Hamming verification would otherwise re-run the PNG decode once per
    * consuming branch. The frame is (long, 64-char string) per image —
    * hundreds of bytes/doc, safe to persist at any scale the corpus fits.
    * Registered in [[graft.Caches]] (released by `Dedup.clearCaches()`);
    * [[clearMemos]] drops the memo so a released session rebuilds cleanly.
    */
  private val hashCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), DataFrame]

  private[graft] def clearMemos(): Unit = hashCache.clear()

  private def aHashSigs(s: SparkSession, dir: String): DataFrame =
    hashCache.getOrElseUpdate((s, dir), {
      import s.implicits._
      // ONE decode per image, both hashes emitted from it. The semantic
      // contract is hash(decode(resizePng(bytes, 16))) — but PNG grayscale
      // is lossless, so decode∘encode is the identity on raster samples
      // and the thumbnail hash equals aHash(downscale(img)) computed
      // in-memory: the dead encode→decode pair is skipped (a first cut
      // that re-encoded per variant decoded every payload 3× and wrote
      // 5000 PNGs per pass — 5.8 s at sf0.1). The byte-level resize path
      // stays exercised by q_mm_resize, and the oracle pins this plan to
      // the same values the byte path produces.
      graft.Caches.register(
        blockPngFixture(s, dir).as[(Long, Array[Byte])]
          .mapPartitions(it => it.flatMap { case (id, b) =>
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(b))
            require(img != null, s"undecodable payload for img $id")
            Iterator(
              (id, ImageCodec.aHash(img)),
              (id + ResizeIdOffset,
                ImageCodec.aHash(ImageCodec.downscale(img, 16))))
          })
          .toDF("img_id", "ahash")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    })

  /** Image near-dup dedup via perceptual hash (round-8/9 VERDICT task 2):
    * the variant corpus is every document's block-mosaic PNG
    * ([[blockPngFixture]]) plus its real [[ImageCodec.resizePng]]
    * thumbnail (bound 16 — every image resizes, so the thumbnail bytes
    * genuinely differ); each image is reduced to a 64-bit
    * [[ImageCodec.aHash]] in the partition-batched decode stage, candidate
    * pairs come from a 4-band×16-bit sign-band equi-join over the hash —
    * the SAME banded-LSH shape as the MinHash text pipeline and the
    * embedding sign-LSH, never all-pairs — and every candidate is verified
    * by exact Hamming distance ≤ 10. A thumbnail of piecewise-constant
    * content samples the same blocks as its source (up to index-rounding
    * noise), so original↔thumbnail pairs surface at Hamming ≈ 0-4 while
    * unrelated mosaics stay ≈ 32 apart (mean of independent 64-bit
    * hashes): at 500 docs (sf0.001) the measured result is 319/500
    * thumbnails recovered, 5 near-collision cross pairs (Hamming 6-10 —
    * the honest tail of banded LSH), candidates ≈ 1% of all pairs.
    * Deterministic integer pixels make the whole chain oracle-able:
    * DuckDB regenerates grids, hashes, bands, and Hamming from the
    * mosaic generator formula.
    */
  private def qMmDedup(s: SparkSession, dir: String): DataFrame = {
    val sigs = aHashSigs(s, dir)
    val bands = sigs.select(col("img_id"), explode(array((0 until 4).map(b =>
        struct(lit(b).as("band_id"),
          substring(col("ahash"), b * 16 + 1, 16).as("bkey"))): _*)).as("b"))
      .select(col("img_id"), col("b.band_id"), col("b.bkey"))
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band_id") === col("b.band_id") &&
          col("a.bkey") === col("b.bkey") &&
          col("a.img_id") < col("b.img_id"))
      .select(col("a.img_id").as("img_a"), col("b.img_id").as("img_b"))
      .distinct()
    // codegen'd byte-wise Hamming (StringHamming) — the zip_with/filter
    // composition it replaced allocated two char arrays + two lambda
    // dispatches per candidate pair, interpreted
    val ham = graft.functions.HammingExprs.hamming(
      col("ha.ahash"), col("hb.ahash"))
    cand.join(sigs.as("ha"), col("img_a") === col("ha.img_id"))
      .join(sigs.as("hb"), col("img_b") === col("hb.img_id"))
      .select(col("img_a"), col("img_b"), ham.as("hamming"))
      .filter(col("hamming") <= 10)
      .orderBy("img_a", "img_b")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_mm_dedup" -> qMmDedup,
    "q_mm_meta" -> qMmMeta,
    "q_mm_features" -> qMmFeatures,
    "q_mm_resize" -> qMmResize,
    "q_mm_audio" -> qMmAudio,
    "q_mm_frames" -> qMmFrames)

  val oracleSql: Map[String, String] = Map(
    // replays the full perceptual-hash chain from the mosaic generator:
    // dedup dims + the nearest-neighbor resize composition (bound 16,
    // same arithmetic as resizePng), the 8×8 grid sample whose value is
    // byte 0 of md5("d:bi:bj") (hex chars → int via strpos), the
    // v·64 > Σv mean bits in k = y·8+x order, 4×16 banding, and the
    // per-position Hamming verification
    "q_mm_dedup" ->
      """WITH d AS (SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n FROM documents),
        |dims AS (SELECT doc_id, n % 16 + 17 AS w0, (n * 7) % 12 + 17 AS h0
        |  FROM d),
        |sc AS (SELECT doc_id, w0, h0,
        |  CASE WHEN w0 <= 16 AND h0 <= 16 THEN 1
        |       ELSE greatest((w0 + 15) // 16, (h0 + 15) // 16) END AS s
        |  FROM dims),
        |imgs AS (
        |  SELECT doc_id AS img_id, doc_id AS dd, w0 AS w, h0 AS h, w0, h0
        |  FROM dims
        |  UNION ALL
        |  SELECT doc_id + 100000, doc_id, greatest(1, w0 // s),
        |    greatest(1, h0 // s), w0, h0 FROM sc),
        |bv AS (SELECT img_id, i, j,
        |  md5(dd || ':' || (((i * w // 8) * w0 // w) * 8 // w0)
        |     || ':' || (((j * h // 8) * h0 // h) * 8 // h0)) AS m
        |  FROM imgs, unnest(range(0, 8)) AS tx(i),
        |  unnest(range(0, 8)) AS ty(j)),
        |grid AS (SELECT img_id, j * 8 + i AS k,
        |  (strpos('0123456789abcdef', substring(m, 1, 1)) - 1) * 16
        |  + strpos('0123456789abcdef', substring(m, 2, 1)) - 1 AS v
        |  FROM bv),
        |st AS (SELECT img_id, sum(v) AS sv FROM grid GROUP BY img_id),
        |bits AS (SELECT g.img_id,
        |  string_agg(CASE WHEN v * 64 > sv THEN '1' ELSE '0' END,
        |    '' ORDER BY k) AS ahash
        |  FROM grid g JOIN st ON g.img_id = st.img_id GROUP BY g.img_id),
        |bands AS (SELECT img_id, b AS band_id,
        |  substring(ahash, CAST(b * 16 + 1 AS INTEGER), 16) AS bkey
        |  FROM bits, unnest(range(0, 4)) AS t(b)),
        |cand AS (SELECT DISTINCT a.img_id AS img_a, b.img_id AS img_b
        |  FROM bands a JOIN bands b ON a.band_id = b.band_id
        |  AND a.bkey = b.bkey AND a.img_id < b.img_id)
        |SELECT img_a, img_b,
        |CAST(len(list_filter(range(0, 64), k ->
        |  substring(ha.ahash, CAST(k + 1 AS INTEGER), 1)
        |  <> substring(hb.ahash, CAST(k + 1 AS INTEGER), 1))) AS BIGINT)
        |  AS hamming
        |FROM cand JOIN bits ha ON img_a = ha.img_id
        |JOIN bits hb ON img_b = hb.img_id
        |WHERE len(list_filter(range(0, 64), k ->
        |  substring(ha.ahash, CAST(k + 1 AS INTEGER), 1)
        |  <> substring(hb.ahash, CAST(k + 1 AS INTEGER), 1))) <= 10
        |ORDER BY img_a, img_b""".stripMargin,
    // regenerate the expected pixel statistics from the deterministic image
    // formula (dims + pixel in ImageCodec) — a hash match proves the real
    // PNG encode→decode chain reproduced every sample exactly
    "q_mm_features" ->
      """WITH d AS (SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n FROM documents),
        |dims AS (SELECT doc_id, n % 16 + 1 AS w, (n * 7) % 12 + 1 AS h
        |  FROM d),
        |px AS (SELECT doc_id, w, h, (doc_id * 31 + x * 7 + y * 13) % 256 AS v
        |  FROM dims, unnest(range(0, w)) AS tx(x),
        |  unnest(range(0, h)) AS ty(y))
        |SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |CAST(sum(v) AS BIGINT) AS px_sum, CAST(min(v) AS BIGINT) AS px_min,
        |CAST(max(v) AS BIGINT) AS px_max
        |FROM px GROUP BY doc_id, w, h ORDER BY doc_id""".stripMargin,
    // post-resize stats: nearest-neighbor is out(x,y) = in(x·w0/ow,
    // y·h0/oh) with integer division, so the expected pixels are index
    // arithmetic over the same generator formula
    "q_mm_resize" ->
      """WITH d AS (SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n FROM documents),
        |dims AS (SELECT doc_id, n % 16 + 1 AS w0, (n * 7) % 12 + 1 AS h0
        |  FROM d),
        |sc AS (SELECT doc_id, w0, h0,
        |  CASE WHEN w0 <= 8 AND h0 <= 8 THEN 1
        |       ELSE greatest((w0 + 7) // 8, (h0 + 7) // 8) END AS s
        |  FROM dims),
        |od AS (SELECT doc_id, w0, h0, greatest(1, w0 // s) AS ow,
        |  greatest(1, h0 // s) AS oh FROM sc),
        |px AS (SELECT doc_id, ow, oh,
        |  (doc_id * 31 + (x * w0 // ow) * 7 + (y * h0 // oh) * 13) % 256 AS v
        |  FROM od, unnest(range(0, ow)) AS tx(x),
        |  unnest(range(0, oh)) AS ty(y))
        |SELECT doc_id, CAST(ow AS BIGINT) AS width,
        |CAST(oh AS BIGINT) AS height,
        |CAST(sum(v) AS BIGINT) AS px_sum, CAST(min(v) AS BIGINT) AS px_min,
        |CAST(max(v) AS BIGINT) AS px_max
        |FROM px GROUP BY doc_id, ow, oh ORDER BY doc_id""".stripMargin,
    // amplitude stats of the deterministic PCM waveform — WAV is a
    // lossless container, so decode must reproduce every 16-bit sample
    "q_mm_audio" ->
      """WITH d AS (SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n FROM documents),
        |dims AS (SELECT doc_id, n % 100 + 10 AS ns FROM d),
        |sm AS (SELECT doc_id, ns,
        |  (doc_id * 7919 + i * 337) % 65536 - 32768 AS v
        |  FROM dims, unnest(range(0, ns)) AS t(i))
        |SELECT doc_id, CAST(ns AS BIGINT) AS n_samples,
        |CAST(8000 AS BIGINT) AS sample_rate,
        |CAST(sum(v) AS BIGINT) AS amp_sum, CAST(min(v) AS BIGINT) AS amp_min,
        |CAST(max(v) AS BIGINT) AS amp_max
        |FROM sm GROUP BY doc_id, ns ORDER BY doc_id""".stripMargin,
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
