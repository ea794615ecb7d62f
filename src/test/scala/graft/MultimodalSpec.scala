package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.{DecodedMedia, Multimodal}

/** The codec seam: the multimodal queries take any `MediaCodec`, so a
  * real decoder drops in without touching query code. The stub stays the
  * default (its outputs are what the DuckDB oracle verifies); this spec
  * proves an injected alternative actually flows through the
  * mapPartitions plumbing to the result. */
class MultimodalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  /** A deliberately different (still deterministic) codec. */
  private object AltCodec extends Multimodal.MediaCodec {
    def decode(bytes: Array[Byte]): DecodedMedia =
      DecodedMedia(width = 7, height = 9, channels = 1)
    def resize(bytes: Array[Byte], target: Int): Array[Byte] =
      bytes.take(math.min(3, target))
    def grayGrid(bytes: Array[Byte], w: Int, h: Int): Array[Int] =
      new Array[Int](w * h)
  }

  test("default codec is the stub — results match the oracle-checked shape") {
    val rows = Multimodal.q36MediaFeatures(spark, dir).limit(5).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_bytes")
      assert(r.getAs[Long]("width") == (n % 64) + 1)
      assert(r.getAs[Long]("height") == (n % 48) + 1)
    }
  }

  test("an injected codec flows through decode (q36) without query changes") {
    val rows = Multimodal.q36MediaFeatures(spark, dir, AltCodec).limit(10).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("width") == 7L)
      assert(r.getAs[Long]("height") == 9L)
    }
  }

  /** PNG bytes of a w×h image, generated with the same JDK encoder any
    * user could run — no fixture files, no external libs. */
  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until w).foreach(x => (0 until h).foreach(y => img.setRGB(x, y, (x * 31 + y * 7) & 0xFFFFFF)))
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  test("ImageIOCodec decodes real PNG bytes through the q36 pipeline (true dimensions)") {
    import spark.implicits._
    val media = Seq(
      graft.multimodal.MediaRecord(1L, pngBytes(20, 10), "image/png"),
      graft.multimodal.MediaRecord(2L, pngBytes(3, 48), "image/png"))
      .toDS().repartition(2)
    val rows = Multimodal.mediaFeatures(media, Multimodal.ImageIOCodec).collect()
    assert(rows.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("width"), r.getAs[Long]("height"))).toSeq
      == Seq((1L, 20L, 10L), (2L, 3L, 48L)))
    // n_bytes is the encoded payload, not the pixel count
    assert(rows.forall(r => r.getAs[Long]("n_bytes") > 0))
  }

  test("ImageIOCodec resize bounds the longest side and preserves aspect ratio") {
    val in = pngBytes(64, 16)
    val out = Multimodal.ImageIOCodec.resize(in, target = 32)
    val d = Multimodal.ImageIOCodec.decode(out)
    assert((d.width, d.height) == (32, 8)) // 64x16 scaled by 0.5
    assert(d.channels == 3)
    // an image already within bounds is not upscaled
    val same = Multimodal.ImageIOCodec.decode(Multimodal.ImageIOCodec.resize(pngBytes(5, 4), 32))
    assert((same.width, same.height) == (5, 4))
    // undecodable payloads fail loudly, not silently
    intercept[IllegalArgumentException](Multimodal.ImageIOCodec.decode(Array[Byte](1, 2, 3)))
  }

  test("ImageIOCodec resize preserves the alpha channel of RGBA sources") {
    val img = new java.awt.image.BufferedImage(16, 8, java.awt.image.BufferedImage.TYPE_INT_ARGB)
    (0 until 16).foreach(x => (0 until 8).foreach { y =>
      // left half transparent, right half opaque
      img.setRGB(x, y, if (x < 8) 0x00000000 else 0xFF00FF00)
    })
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val src = baos.toByteArray
    assert(Multimodal.ImageIOCodec.decode(src).channels == 4)
    val out = Multimodal.ImageIOCodec.resize(src, 8)
    val d = Multimodal.ImageIOCodec.decode(out)
    // transparency survives the downscale instead of compositing to black
    assert(d.channels == 4, "alpha channel dropped by resize")
    assert((d.width, d.height) == (8, 4))
  }

  test("an injected codec flows through resize (q67) without query changes") {
    val rows = Multimodal.q67MediaResize(spark, dir, AltCodec)
      .filter(col("out_len") > 0).limit(10).collect()
    assert(rows.nonEmpty)
    // AltCodec caps output at 3 bytes; the stub would emit up to 256
    rows.foreach(r => assert(r.getAs[Long]("out_len") <= 3L))
  }

  /** Grayscale PNG from a pixel-value function — perceptual-hash inputs
    * whose similarity the test controls exactly. */
  private def pngOf(f: (Int, Int) => Int, w: Int = 64, h: Int = 64): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) {
      val v = math.max(0, math.min(255, f(x, y)))
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  test("real-codec dHash: perturbed image pairs with its source, distinct image doesn't; pairs drive the keep-list") {
    import spark.implicits._
    import graft.multimodal.MediaRecord
    // base: horizontal gradient + checkerboard; near: base + tiny
    // deterministic pixel noise (what a re-encode/slight edit does);
    // diff: an unrelated high-frequency pattern (NOT the mirrored
    // gradient — this base's comparison pattern is mirror-symmetric, so
    // a horizontal flip dHashes identically; measured ham(base,diff)=33)
    def base(x: Int, y: Int): Int = x * 3 + (if ((x / 8 + y / 8) % 2 == 0) 48 else 0)
    def near(x: Int, y: Int): Int = base(x, y) + (x * 31 + y * 17) % 3
    def diff(x: Int, y: Int): Int = ((x * 13 + y * 29) % 7) * 36 + (if ((x / 4) % 2 == 0) 60 else 0)
    val media = Seq(
      MediaRecord(1L, pngOf(base), "image/png"),
      MediaRecord(2L, pngOf(near), "image/png"),
      MediaRecord(3L, pngOf(diff), "image/png")).toDS()
    val bands = Multimodal.dhashBands(media, Multimodal.ImageIOCodec)
    val bw = bands.collect().map(r => r.getLong(0) ->
      Seq(r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))).toMap
    def ham(a: Long, b: Long): Int =
      bw(a).zip(bw(b)).map { case (p, q) => Integer.bitCount(p ^ q) }.sum
    assert(ham(1L, 2L) <= 6, s"near-dup hamming ${ham(1L, 2L)}")
    assert(ham(1L, 3L) > 6, s"distinct hamming ${ham(1L, 3L)}")
    assert(ham(2L, 3L) > 6, s"distinct hamming ${ham(2L, 3L)}")
    val pairs = Multimodal.mediaNeardupPairs(bands)
    assert(pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      == Set((1L, 2L)))
    // the pairs feed the SAME keep-list chain as text/embedding dedup:
    // the perturbed copy is dropped, its keeper is the original
    val keep = dedup.Dedup.keepList(
        media.toDF().select(col("doc_id")),
        pairs.select(col("id_a"), col("id_b")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(keep == Set((1L, 1L), (2L, 1L), (3L, 3L)))
    Caches.drain()
  }

  test("stub-codec dHash chain is deterministic and self-consistent on the corpus") {
    // the oracle checks q83's VALUES; this pins run-to-run determinism
    // (seedless arithmetic only) and the pair contract (ordered, bounded)
    val a = Multimodal.q83MediaNeardup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val b = Multimodal.q83MediaNeardup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(a.toSeq == b.toSeq)
    a.foreach { case (ia, ib, h) => assert(ia < ib && h >= 0 && h <= 6) }
  }

  /** Build a minimal PCM WAV container around raw sample bytes. */
  private def wav(bits: Int, channels: Int, data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Int) = out.write(Array(v, v >> 8, v >> 16, v >> 24).map(_.toByte))
    def le16(v: Int) = out.write(Array(v, v >> 8).map(_.toByte))
    out.write("RIFF".getBytes); le32(36 + data.length); out.write("WAVE".getBytes)
    out.write("fmt ".getBytes); le32(16); le16(1); le16(channels)
    le32(8000); le32(8000 * channels * bits / 8); le16(channels * bits / 8); le16(bits)
    out.write("data".getBytes); le32(data.length); out.write(data)
    out.toByteArray
  }

  test("WavCodec parses 8-bit and 16-bit PCM WAV (first channel, centered)") {
    // 8-bit unsigned: 128 → 0, 228 → 100, 28 → -100
    val s8 = Multimodal.WavCodec.pcm(wav(8, 1, Array(128, 228, 28).map(_.toByte)))
    assert(s8.toSeq == Seq(0, 100, -100))
    // 16-bit signed LE stereo: takes channel 0 only
    val s16data = Array[Byte](
      0x39, 0x30, 0, 0, // L=12345, R=0
      (0xC7 & 0xFF).toByte, (0xCF & 0xFF).toByte, 1, 0) // L=-12345, R=1
    val s16 = Multimodal.WavCodec.pcm(wav(16, 2, s16data))
    assert(s16.toSeq == Seq(12345, -12345))
    // non-WAV payloads fail soft: no samples, no exception
    assert(Multimodal.WavCodec.pcm("not a wav file at all".getBytes).isEmpty)
    assert(Multimodal.WavCodec.pcm(Array.empty[Byte]).isEmpty)
  }

  test("audio frame features: energy / zero crossings / peak per 64-sample frame") {
    import spark.implicits._
    // 130 samples → frames of 64, 64, 2; alternating signs inside frame 0
    val samples = Array.tabulate(130)(i => if (i < 64) (if (i % 2 == 0) 3 else -3) else i % 5)
    val bytes = samples.map(v => ((v + 97) & 0xFF).toByte) // stub codec inverts -97
    val ds = Seq(graft.multimodal.MediaRecord(7L, bytes, "audio/pcm")).toDS()
    val rows = Multimodal.audioFrames(ds, Multimodal.PcmStubCodec)
      .orderBy(col("frame_idx")).collect()
    assert(rows.length == 3)
    val f0 = rows(0)
    assert(f0.getAs[Long]("n_samples") == 64L)
    assert(f0.getAs[Long]("sum_sq") == 64L * 9)   // all ±3
    assert(f0.getAs[Long]("n_zcross") == 63L)     // every adjacent pair flips
    assert(f0.getAs[Long]("peak") == 3L)
    assert(rows(2).getAs[Long]("n_samples") == 2L)
    // WAV payloads flow through the same operator via the real codec
    val wavDs = Seq(graft.multimodal.MediaRecord(8L,
      wav(8, 1, Array.tabulate(70)(i => ((if (i % 2 == 0) 138 else 118) & 0xFF).toByte)), "audio/wav")).toDS()
    val wrows = Multimodal.audioFrames(wavDs, Multimodal.WavCodec)
      .orderBy(col("frame_idx")).collect()
    assert(wrows.length == 2 && wrows(0).getAs[Long]("n_zcross") == 63L)
    assert(wrows(0).getAs[Long]("peak") == 10L) // 138-128 / 118-128
  }

  test("q87 stub chain over the corpus: frame count per doc matches ceil(bytes/64)") {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), length(col("text")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val frames = Multimodal.q87AudioFrames(spark, dir)
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(frames.keySet == docs.filter(_._2 > 0).keySet)
    frames.foreach { case (id, nf) => assert(nf == (docs(id) + 63) / 64, s"doc $id") }
  }

  /** Driver-side replay of the q116 frame-hash → cut chain for one payload:
    * frame hashes with the same stub grid + dHash packing, scenes opened
    * where consecutive-frame Hamming exceeds 16. Returns per-scene
    * (start_frame, n_frames). */
  private def refScenes(bytes: Array[Byte]): Seq[(Long, Long)] = {
    def hash(f: Int): Long = {
      def g(i: Int): Int = if (i < 64) bytes(f * 32 + i) & 0xFF else 0
      var h = 0L
      for (r <- 0 until 8; c <- 0 until 8)
        if (g(r * 9 + c) > g(r * 9 + c + 1)) h |= 1L << (r * 8 + c)
      h
    }
    val n = if (bytes.length >= 64) (bytes.length - 64) / 32 + 1 else 0
    val hs = (0 until n).map(hash)
    val cuts = (0 until n).map(f =>
      if (f == 0) 0 else if (java.lang.Long.bitCount(hs(f) ^ hs(f - 1)) > 16) 1 else 0)
    val sid = cuts.scanLeft(0)(_ + _).tail
    (0 until n).groupBy(sid).toSeq.sortBy(_._1)
      .map { case (_, fs) => (fs.min.toLong, fs.size.toLong) }
  }

  test("video scenes (q116): corpus run matches a driver-side replay doc-for-doc") {
    val payloads = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).getBytes("UTF-8")).toMap
    val got = Multimodal.q116VideoScenes(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .groupBy(_._1)
    val expectDocs = payloads.filter(_._2.length >= 64).keySet
    assert(got.keySet == expectDocs, "one scene set per doc with >= 1 frame")
    got.foreach { case (id, scenes) =>
      val ref = refScenes(payloads(id))
      val byIdx = scenes.sortBy(_._2)
      assert(byIdx.map(s => (s._3, s._4)).toSeq == ref, s"doc $id scene layout")
      // scene_idx is dense from 0; keyframe hash is 16 lowercase hex chars
      assert(byIdx.map(_._2).toSeq == byIdx.indices.map(_.toLong), s"doc $id scene ids")
      byIdx.foreach(s => assert(s._5.matches("[0-9a-f]{16}"), s"doc $id keyframe"))
    }
    // non-vacuous in both directions at this SF: some scene spans multiple
    // frames (repetitive content held) and some doc has more than one scene
    assert(got.values.exists(_.exists(_._4 > 1)), "no multi-frame scene anywhere")
    assert(got.values.exists(_.size > 1), "no doc with a cut anywhere")
  }

  test("video scenes: periodic payload is one static scene, aperiodic payload cuts every frame") {
    import spark.implicits._
    val static = Array.tabulate(256)(i => (i % 32).toByte)      // period divides stride
    // scrambled bytes (constant-gradient ramps hash alike — dHash is
    // gradient-based — so "different content" needs real variation)
    val moving = Array.tabulate(256) { i =>
      val v = (i * 0x9E3779B9L) & 0xFFFFFFFFL
      ((v ^ (v >>> 16)) & 0xFF).toByte
    }
    val ds = Seq(
      graft.multimodal.MediaRecord(1L, static, "video/fake"),
      graft.multimodal.MediaRecord(2L, moving, "video/fake")).toDS()
    val scenes = Multimodal.videoScenesOf(ds).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val nFrames = (256 - 64) / 32 + 1
    assert(scenes.filter(_._1 == 1L).toSeq == Seq((1L, 0L, 0L, nFrames.toLong)),
      "periodic payload must collapse to a single scene spanning all frames")
    val cuts = scenes.filter(_._1 == 2L).sortBy(_._2)
    assert(cuts.length == nFrames, "aperiodic payload must cut on every frame")
    assert(cuts.map(s => (s._3, s._4)).toSeq == (0 until nFrames).map(f => (f.toLong, 1L)),
      "each aperiodic frame is its own scene")
  }

  /** Real JPEG frame from a pixel-value function (JDK JPEG encoder). */
  private def jpegOf(f: (Int, Int) => Int, w: Int = 64, h: Int = 64): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) {
      val v = math.max(0, math.min(255, f(x, y)))
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpeg", baos)
    baos.toByteArray
  }

  test("MjpegVideoCodec: marker-exact frame split + real decode; q116 cuts scenes at content changes") {
    import spark.implicits._
    import graft.multimodal.MediaRecord
    // two held scenes (identical consecutive frames) + one noise frame;
    // gradients are strong so JPEG artifacts can't flip dHash bits
    def gradA(x: Int, y: Int): Int = math.min(255, x * 4)
    def gradB(x: Int, y: Int): Int = 255 - math.min(255, x * 4)
    def noise(x: Int, y: Int): Int = ((x * 31 + y * 57) % 16) * 17
    val (fa, fb, fn) = (jpegOf(gradA), jpegOf(gradB), jpegOf(noise))
    val mj = fa ++ fa ++ fb ++ fb ++ fn
    // the walker finds exactly the five frame boundaries, each a full
    // SOI..EOI span — FF bytes inside entropy data never desync it
    val ranges = Multimodal.MjpegVideoCodec.frameRanges(mj).toSeq
    assert(ranges.size == 5, s"got ${ranges.size} frames")
    assert(ranges.head._1 == 0 && ranges.last._2 == mj.length)
    assert(ranges == Seq(fa, fa, fb, fb, fn).scanLeft((0, 0)) {
      case ((_, e), f) => (e, e + f.length) }.tail)
    ranges.foreach { case (s, e) =>
      assert((mj(s) & 0xFF) == 0xFF && (mj(s + 1) & 0xFF) == 0xD8)
      assert((mj(e - 2) & 0xFF) == 0xFF && (mj(e - 1) & 0xFF) == 0xD9)
    }
    // frames decode through the real ImageIO grayscale path
    val grids = Multimodal.MjpegVideoCodec.frameGrids(mj, 9, 8).toSeq
    assert(grids.size == 5 && grids.forall(_.length == 72))
    assert(grids(0).sameElements(grids(1)) && grids(2).sameElements(grids(3)),
      "identical JPEG frames must decode to identical grids")
    // the unchanged q116 chain over the REAL codec: held frames share a
    // scene, content changes cut — and a single-frame clip is one scene
    val media = Seq(
      MediaRecord(1L, mj, "video/x-motion-jpeg"),
      MediaRecord(2L, fa, "video/x-motion-jpeg")).toDS()
    val scenes = Multimodal.videoScenesOf(media, Multimodal.MjpegVideoCodec).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(scenes.filter(_._1 == 1L).sortBy(_._2).toSeq ==
      Seq((1L, 0L, 0L, 2L), (1L, 1L, 2L, 2L), (1L, 2L, 4L, 1L)),
      s"scene layout: ${scenes.toSeq}")
    assert(scenes.filter(_._1 == 2L).toSeq == Seq((2L, 0L, 0L, 1L)))
  }

  test("q154: golden scene rows regenerate through the real MJPEG decode (board-row twin of the oracle VALUES)") {
    // end-to-end regeneration: if the JDK JPEG encoder or decoder ever
    // drifted, this fails BEFORE the driver board desyncs from the
    // golden oracle
    val got = Multimodal.q154MjpegScenes(spark, "").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .toSeq
    assert(got == Multimodal.q154Golden, s"q154 drifted from golden: $got")
    // the fixture exercises BOTH regimes: held shots (multi-frame
    // scenes) and shot boundaries (multiple scenes per doc), plus the
    // single-frame-clip edge
    assert(got.count(_._1 == 1L) == 3 && got.count(_._1 == 2L) == 2 &&
      got.count(_._1 == 3L) == 1)
    assert(got.filter(_._1 == 1L).map(_._4) == Seq(4L, 3L, 4L),
      "doc 1 scene lengths must match its 4+3+4 shot structure")
    // and the oracle carries the same rows as literal VALUES
    Multimodal.q154Golden.foreach { case (_, _, _, _, k) =>
      assert(Multimodal.q154Sql.contains(s"'$k'"))
    }
  }

  test("q167: golden near-dup pairs regenerate through the real PNG decode (board-row twin of the oracle VALUES)") {
    // the image half of the real-codec matrix (q154 is the video half):
    // the q83 banded dHash chain through ImageIOCodec over the
    // deterministic PNG fixture. PNG is lossless, so decoded pixels —
    // and therefore the bilinear 9×8 grid — cannot drift with encoder
    // filter/compression choices; a JDK raster change WOULD fail here
    // before the board desynced from the golden oracle.
    val got = Multimodal.q167PngNeardup(spark, "").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Multimodal.q167Golden, s"q167 drifted from golden: $got")
    // structure, not just values: the ramp clique pairs all three ways,
    // the chevron pair verifies at nonzero Hamming (a REAL perturbation
    // survived the threshold — not byte-identical images), and no
    // singleton (bars / V / reversed ramp) pairs with anything
    assert(got.count { case (a, b, _) => a <= 3 && b <= 3 } == 3)
    assert(got.contains((4L, 5L, 2L)))
    assert(got.forall { case (a, b, _) => b <= 5 },
      s"a singleton doc paired: $got")
    assert(got.exists(_._3 > 0), "all pairs at Hamming 0 — the near-dup band went unexercised")
    // and the full-matrix separation the blocking relies on: every
    // cross-group Hamming is far ABOVE the verify threshold (the
    // reversed ramp flips all 60+ comparisons against the ramp clique)
    val bands = Multimodal.dhashBands(
      spark.createDataset(Multimodal.PngFixture.records)(
        org.apache.spark.sql.Encoders.product[graft.multimodal.MediaRecord]),
      Multimodal.ImageIOCodec).collect()
      .map(r => r.getLong(0) -> Seq(r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))).toMap
    val group = Map(1L -> 0, 2L -> 0, 3L -> 0, 4L -> 1, 5L -> 1, 6L -> 2, 7L -> 3, 8L -> 4)
    for (a <- bands.keys; b <- bands.keys if a < b && group(a) != group(b)) {
      val h = bands(a).zip(bands(b)).map { case (x, y) => Integer.bitCount(x ^ y) }.sum
      assert(h > 6, s"cross-group pair ($a,$b) at Hamming $h — fixture separation broken")
    }
    Multimodal.q167Golden.foreach { case (a, b, h) =>
      assert(Multimodal.q167Sql.contains(s"($a, $b, $h)"))
    }
  }

  test("q169: golden audio frames regenerate through the real WAV decode (board-row twin of the oracle VALUES)") {
    // the audio third of the real-codec matrix (q154 video, q167 image):
    // the q87 frame-feature chain through WavCodec over hand-assembled
    // RIFF containers — byte-exact on BOTH sides (no encoder in the
    // loop), so any RIFF-walk regression fails here before the board
    // desyncs from the golden oracle.
    val got = Multimodal.q169WavFrames(spark, "").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == Multimodal.q169Golden, s"q169 drifted from golden: $got")
    // structure, not just values:
    // - the non-WAV payload (doc 4) decodes to ZERO frames, fail-soft
    assert(!got.exists(_._1 == 4L), "garbage payload produced frames")
    // - every declared sample width ran: 16-bit mono (doc 1), 8-bit
    //   unsigned (doc 2: peak 128 is the u8-128 floor, impossible for a
    //   zero-centered source), 16-bit stereo (doc 3)
    assert(Set(1L, 2L, 3L).subsetOf(got.map(_._1).toSet))
    assert(got.find(r => r._1 == 2L && r._2 == 0L).exists(_._6 == 128L))
    // - first-channel selection on the stereo doc: channel 2 is a
    //   CONSTANT 1000 — had the codec read it (or averaged, or
    //   mis-strided), frame 1 could not report 0 crossings with peak
    //   4000 and sum_sq 86_000_000 = 16 x sum over one 500-step cycle
    assert(got.find(r => r._1 == 3L && r._2 == 1L)
      .exists(r => r._4 == 86000000L && r._5 == 0L && r._6 == 4000L))
    // - zero crossings are non-trivial where the waveform alternates
    assert(got.filter(_._1 == 1L).forall(_._5 > 0))
    Multimodal.q169Golden.foreach { case (d, f, n, ss, zc, pk) =>
      assert(Multimodal.q169Sql.contains(s"($d, $f, $n, $ss, $zc, $pk)"))
    }
  }
}
