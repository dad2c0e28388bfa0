package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Multimodal tests: byte plumbing + REAL codec round trips (PNG, GIF, WAV)
  * checked against plain-Scala closed-form references. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Multimodal.withPayload(
    Seq(1L -> "hello world", 2L -> "abcd").toDF("id", "txt"), "txt")

  private lazy val ids = Seq(0L, 1L, 7L, 254L, 255L, 256L, 4242L).toDF("id")

  test("withPayload produces binary utf8 bytes") {
    val r = df.select("payload").head().getAs[Array[Byte]](0)
    assert(new String(r, "UTF-8") === "hello world")
  }

  test("extractMeta: size, magic (first 4 bytes hex), content hash") {
    val rows = Multimodal.extractMeta(df, "id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(rows === Set(
      (1L, 11L, "68656c6c"),  // 'hell'
      (2L, 4L, "61626364")))  // 'abcd'
  }

  // closed-form reference of the synthetic gradient
  private def grad(id: Long, x: Int, y: Int): (Int, Int, Int) =
    (((id + x) % 256).toInt, ((id + y) % 256).toInt, ((id + x + y) % 256).toInt)
  private def hex(p: (Int, Int, Int)): String = f"${p._1}%02x${p._2}%02x${p._3}%02x"

  test("synthPng -> decodeImage: real PNG round trip matches the closed form") {
    val out = Multimodal.decodeImage(Multimodal.synthPng(ids, "id").toDF(), "id")
      .collect().map(d => d.id -> d).toMap
    for (id <- Seq(0L, 1L, 7L, 254L, 255L, 256L, 4242L)) {
      val w = (4 + id % 13).toInt
      val h = (3 + id % 11).toInt
      val d = out(id)
      assert(d.format === "png")
      assert(d.width === w && d.height === h)
      assert(d.px00 === hex(grad(id, 0, 0)))
      assert(d.pxc === hex(grad(id, w - 1, h - 1)))
      val esum = (for (y <- 0 until h; x <- 0 until w) yield {
        val (r, g, b) = grad(id, x, y); (r + g + b).toLong
      }).sum
      assert(d.px_sum === esum, s"raster checksum for id=$id")
    }
  }

  test("extractMeta over synthPng sees the real PNG magic") {
    val magics = Multimodal.extractMeta(
        Multimodal.synthPng(ids, "id").toDF(), "id")
      .select("magic").distinct().collect().map(_.getString(0)).toSet
    assert(magics === Set("89504e47")) // \x89PNG
  }

  test("resizeImage: nearest-neighbor pixels, re-encoded PNG decodable") {
    val resized = Multimodal.resizeImage(
      Multimodal.synthPng(ids, "id").toDF(), "id", 3, 2)
    val out = Multimodal.decodeImage(resized.toDF(), "id")
      .collect().map(d => d.id -> d).toMap
    for (id <- Seq(0L, 255L, 4242L)) {
      val w = (4 + id % 13).toInt
      val h = (3 + id % 11).toInt
      val d = out(id)
      assert(d.format === "png" && d.width === 3 && d.height === 2)
      def src(x: Int, y: Int) = grad(id, x * w / 3, y * h / 2)
      assert(d.px00 === hex(src(0, 0)))
      assert(d.pxc === hex(src(2, 1)))
      val esum = (for (y <- 0 until 2; x <- 0 until 3) yield {
        val (r, g, b) = src(x, y); (r + g + b).toLong
      }).sum
      assert(d.px_sum === esum)
    }
  }

  test("dHash: matches the closed-form gradient reference; corrupt payloads drop") {
    // plain-Scala reference of decode -> 9x8 nearest-neighbor gray -> dHash
    def refDHash(id: Long): Long = {
      val w = (4 + id % 13).toInt
      val h = (3 + id % 11).toInt
      def gray(x: Int, y: Int): Long = {
        val (r, g, b) = grad(id, x * w / 9, y * h / 8)
        299L * r + 587L * g + 114L * b
      }
      (for (y <- 0 until 8; x <- 0 until 8 if gray(x + 1, y) > gray(x, y))
        yield 1L << (y * 8 + x)).foldLeft(0L)(_ | _)
    }
    val out = Multimodal.dHash(Multimodal.synthPng(ids, "id").toDF(), "id")
      .collect().map(d => d.id -> d.dhash).toMap
    for (id <- Seq(0L, 1L, 7L, 254L, 255L, 256L, 4242L))
      assert(out(id) === refDHash(id), s"dhash for id=$id")
    // corrupt bytes: dropped, not failed
    val junk = Seq((9L, Array[Byte](1, 2, 3))).toDF("id", "payload")
    assert(Multimodal.dHash(junk, "id").count() === 0)
  }

  test("dHash near-dup: banded pairs == brute-force hamming pairs (pigeonhole recall)") {
    // distinct-looking ids still collapse to few gradient classes — exactly
    // the near-dup signal; the 4-band join must find every pair at <= 3 that
    // an all-pairs scan finds, no more, no fewer (multiplicity included)
    val many = (0L until 80L).toDF("id")
    val hashes = Multimodal.dHash(Multimodal.synthPng(many, "id").toDF(), "id")
      .collect().map(d => d.id -> d.dhash).toMap
    val expect = (for {
      l <- hashes.keys; r <- hashes.keys if l < r
      hd = java.lang.Long.bitCount(hashes(l) ^ hashes(r)) if hd <= 3
    } yield (l, r, hd.toLong)).toSet
    val got = Dedup.hammingPairs64(
        Multimodal.dHash(Multimodal.synthPng(many, "id").toDF(), "id").toDF(),
        "id", "dhash", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong))
    assert(got.length === got.toSet.size, "duplicate pair emissions")
    assert(got.toSet === expect)
  }

  test("wavHash: matches the closed-form energy-envelope reference; corrupt payloads drop") {
    // plain-Scala reference of decode -> 65-segment energy envelope ->
    // sign-of-delta bits (the dHash recipe on PCM)
    def refWavHash(id: Long): Long = {
      val ns = (100 + id % 50).toInt
      def sample(i: Int): Long = (id * 31 + i * 17L) % 20001 - 10000
      val en = (0 until 65).map { j =>
        (j * ns / 65 until (j + 1) * ns / 65).map(i => sample(i) * sample(i)).sum
      }
      (0 until 64).filter(b => en(b + 1) > en(b))
        .foldLeft(0L)((h, b) => h | (1L << b))
    }
    val out = Multimodal.wavHash(Multimodal.synthWav(ids, "id").toDF(), "id")
      .collect().map(d => d.id -> d.whash).toMap
    for (id <- Seq(0L, 1L, 7L, 254L, 255L, 256L, 4242L))
      assert(out(id) === refWavHash(id), s"whash for id=$id")
    val junk = Seq((9L, Array[Byte](1, 2, 3))).toDF("id", "payload")
    assert(Multimodal.wavHash(junk, "id").count() === 0)
  }

  test("wavHash: gain invariance — scaling every sample preserves the hash") {
    // doubling every sample quadruples every segment energy EXACTLY (integer
    // math), preserving each adjacent comparison — the property the
    // signature exists for, asserted on real WAV payloads
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    def wav(samples: Array[Short]): Array[Byte] = {
      val pcm = new Array[Byte](samples.length * 2)
      samples.zipWithIndex.foreach { case (s, i) =>
        pcm(2 * i) = (s & 255).toByte; pcm(2 * i + 1) = ((s >> 8) & 255).toByte
      }
      val fmt = new AudioFormat(8000f, 16, 1, true, false)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(new AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong),
        AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val rnd = new scala.util.Random(7)
    val base = Array.fill(130)((rnd.nextInt(16001) - 8000).toShort)
    val doubled = base.map(s => (s * 2).toShort) // |s| <= 8000, so 2x fits 16-bit
    val other = Array.fill(130)((rnd.nextInt(16001) - 8000).toShort)
    val out = Multimodal.wavHash(
        Seq((1L, wav(base)), (2L, wav(doubled)), (3L, wav(other)))
          .toDF("id", "payload"), "id")
      .collect().map(d => d.id -> d.whash).toMap
    assert(out(1L) === out(2L), "2x gain must preserve the energy-envelope hash")
    assert(out(1L) !== out(3L), "an unrelated signal must hash differently")
  }

  test("wav near-dup: banded pairs == brute-force hamming pairs (pigeonhole recall)") {
    // same contract as the dHash test: the 4-band join must find every pair
    // at <= 3 that an all-pairs scan finds, no more, no fewer
    val many = (0L until 80L).toDF("id")
    val hashes = Multimodal.wavHash(Multimodal.synthWav(many, "id").toDF(), "id")
      .collect().map(d => d.id -> d.whash).toMap
    val expect = (for {
      l <- hashes.keys; r <- hashes.keys if l < r
      hd = java.lang.Long.bitCount(hashes(l) ^ hashes(r)) if hd <= 3
    } yield (l, r, hd.toLong)).toSet
    val got = Dedup.hammingPairs64(
        Multimodal.wavHash(Multimodal.synthWav(many, "id").toDF(), "id").toDF(),
        "id", "whash", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong))
    assert(got.length === got.toSet.size, "duplicate pair emissions")
    assert(got.toSet === expect)
  }

  test("wav R×S near-dup: banded cross pairs == brute force; indexed == direct") {
    val docs = (0L until 80L).toDF("id")
    def sig(d: org.apache.spark.sql.DataFrame) =
      Multimodal.wavHash(Multimodal.synthWav(d, "id").toDF(), "id").toDF()
    val corpus = docs.where($"id" % 10 =!= 0)
    val incoming = docs.where($"id" % 10 === 0)
    val cHash = sig(corpus).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val iHash = sig(incoming).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = (for {
      l <- cHash.keys; r <- iHash.keys
      hd = java.lang.Long.bitCount(cHash(l) ^ iHash(r)) if hd <= 3
    } yield (l, r, hd.toLong)).toSet
    val direct = Dedup.hammingPairsRs64(sig(corpus), sig(incoming), "id", "whash", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong))
    assert(direct.length === direct.toSet.size, "duplicate pair emissions")
    assert(direct.toSet === expect)
    val indexed = Dedup.hammingPairsRs64Indexed(
        Dedup.hammingIndex64(sig(corpus), "id", "whash"),
        sig(incoming), "id", "whash", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong))
    assert(indexed.sorted.toSeq === direct.sorted.toSeq, "indexed != direct")
  }

  test("synthGif -> decodeFrames: frame count and exact solid colors") {
    val out = Multimodal.decodeFrames(Multimodal.synthGif(ids, "id").toDF(), "id")
      .collect().groupBy(_.id)
    for (id <- Seq(0L, 1L, 7L, 4242L)) {
      val nf = (1 + id % 4).toInt
      val frames = out(id).sortBy(_.frame_idx)
      assert(frames.length === nf)
      frames.zipWithIndex.foreach { case (f, i) =>
        assert(f.frame_idx === i && f.width === 5 && f.height === 4)
        assert(f.px === f"${(id + i) % 256}%02x${(id + 2L * i) % 256}%02x${(id + 3L * i) % 256}%02x")
      }
    }
  }

  test("synthWav -> decodeWav: container header and exact PCM sample sum") {
    val out = Multimodal.decodeWav(Multimodal.synthWav(ids, "id").toDF(), "id")
      .collect().map(d => d.id -> d).toMap
    for (id <- Seq(0L, 1L, 255L, 4242L)) {
      val ns = (100 + id % 50).toInt
      val d = out(id)
      assert(d.sample_rate === 8000L && d.channels === 1L && d.bits === 16L)
      assert(d.n_frames === ns.toLong)
      val esum = (0 until ns).map(i => (id * 31 + i * 17L) % 20001 - 10000).sum
      assert(d.sample_sum === esum)
    }
  }

  test("wavFrameFeatures: per-frame energy and zero crossings match the closed form") {
    val out = Multimodal.wavFrameFeatures(
        Multimodal.synthWav(ids, "id").toDF(), "id", 50)
      .collect().groupBy(_.id)
    for (id <- Seq(0L, 1L, 255L, 4242L)) {
      val ns = (100 + id % 50).toInt
      val samples = (0 until ns).map(i => ((id * 31 + i * 17L) % 20001 - 10000).toInt)
      val frames = out(id).sortBy(_.frame_idx)
      assert(frames.length === (ns + 49) / 50)
      frames.zipWithIndex.foreach { case (f, fi) =>
        val fr = samples.slice(fi * 50, fi * 50 + 50)
        assert(f.n_samples === fr.length.toLong)
        assert(f.sum_sq === fr.map(s => s.toLong * s.toLong).sum)
        assert(f.n_zero_cross ===
          fr.zip(fr.tail).count { case (a, b) => (a >= 0) != (b >= 0) }.toLong)
      }
    }
    // at least one doc in this sweep must actually CROSS zero, or the
    // feature is untested signal-wise: the synth ramp (start id·31 % 20001
    // − 10000, +17/sample) crosses zero exactly when the start lies in
    // [−2533, 0), i.e. id·31 % 20001 ∈ [7467, 10000) — ids ~241–322
    val wide = Multimodal.wavFrameFeatures(
        Multimodal.synthWav((230L until 330L).toDF("id"), "id").toDF(), "id", 50)
      .collect()
    assert(wide.exists(_.n_zero_cross > 0))
  }

  test("corrupt payloads: decodeImage flags, frames/resize drop, wav zeroes") {
    val junk = df // utf8 text bytes — not an image, not a wav
    val dec = Multimodal.decodeImage(junk, "id").collect()
    assert(dec.length === 2 && dec.forall(_.format === "unreadable"))
    assert(Multimodal.decodeFrames(junk, "id").count() === 0L)
    assert(Multimodal.resizeImage(junk, "id", 4, 4).count() === 0L)
    val wav = Multimodal.decodeWav(junk, "id").collect()
    assert(wav.length === 2 && wav.forall(w => w.sample_rate === 0L && w.n_frames === 0L))
  }

  // ------------------------------------------------------------------
  // Video (Y4M)
  // ------------------------------------------------------------------

  // closed-form reference of the synthetic video: decade-derived geometry,
  // full-id luma
  private def vdims(id: Long): (Int, Int, Int) =
    ((4 + (id / 10) % 13).toInt, (3 + (id / 10) % 11).toInt, (1 + (id / 10) % 4).toInt)
  private def vluma(id: Long, x: Int, y: Int, f: Int): Int =
    ((id + 3 * x + 7 * y + 11 * f) % 256).toInt
  private def refFrameHash(id: Long, f: Int): Long = {
    val (w, h, _) = vdims(id)
    (for (y <- 0 until 8; x <- 0 until 8
          if vluma(id, (x + 1) * w / 9, y * h / 8, f) > vluma(id, x * w / 9, y * h / 8, f))
      yield 1L << (y * 8 + x)).foldLeft(0L)(_ | _)
  }

  test("synthY4m -> decodeY4m: real YUV4MPEG2 round trip matches the closed form") {
    val out = Multimodal.decodeY4m(Multimodal.synthY4m(ids, "id").toDF(), "id")
      .collect().map(d => d.id -> d).toMap
    for (id <- Seq(0L, 1L, 7L, 254L, 255L, 256L, 4242L)) {
      val (w, h, nf) = vdims(id)
      val d = out(id)
      assert(d.width === w && d.height === h, s"geometry for id=$id")
      assert(d.fps_num === 25L && d.fps_den === 1L)
      assert(d.n_frames === nf.toLong)
      assert(d.px00 === vluma(id, 0, 0, 0).toLong)
      assert(d.pxl === vluma(id, w - 1, h - 1, nf - 1).toLong)
      val esum = (for (f <- 0 until nf; y <- 0 until h; x <- 0 until w)
        yield vluma(id, x, y, f).toLong).sum
      assert(d.y_sum === esum, s"luma checksum for id=$id")
    }
  }

  test("y4mFrameHashes + y4mHash: closed form per frame; middle-frame signature; corrupt drops") {
    val frames = Multimodal.y4mFrameHashes(Multimodal.synthY4m(ids, "id").toDF(), "id")
      .collect().groupBy(_.id)
    for (id <- Seq(0L, 1L, 7L, 254L, 255L, 256L, 4242L)) {
      val (_, _, nf) = vdims(id)
      val fh = frames(id).sortBy(_.frame_idx)
      assert(fh.length === nf)
      fh.zipWithIndex.foreach { case (f, i) =>
        assert(f.frame_idx === i.toLong && f.fhash === refFrameHash(id, i),
          s"frame hash for id=$id f=$i")
      }
    }
    val vh = Multimodal.y4mHash(Multimodal.synthY4m(ids, "id").toDF(), "id")
      .collect().map(d => d.id -> d.vhash).toMap
    for (id <- Seq(0L, 1L, 7L, 254L, 255L, 256L, 4242L)) {
      val (_, _, nf) = vdims(id)
      assert(vh(id) === refFrameHash(id, nf / 2), s"video hash for id=$id")
    }
    val junk = Seq((9L, Array[Byte](1, 2, 3))).toDF("id", "payload")
    assert(Multimodal.y4mHash(junk, "id").count() === 0)
    assert(Multimodal.y4mFrameHashes(junk, "id").count() === 0)
    val dec = Multimodal.decodeY4m(junk, "id").collect()
    assert(dec.length === 1 && dec.head.width === 0L && dec.head.n_frames === 0L)
  }

  test("y4m near-dup: banded pairs == brute force; same-decade fixture has real pairs") {
    // 0..300 spans 30 decades: the first 1..3-bit same-decade pairs appear
    // around id 170 (wrap-flip count depends on where the 255→0 boundary
    // lands on the sampled grid — verified against the closed form)
    val many = (0L until 300L).toDF("id")
    val hashes = Multimodal.y4mHash(Multimodal.synthY4m(many, "id").toDF(), "id")
      .collect().map(d => d.id -> d.vhash).toMap
    val expect = (for {
      l <- hashes.keys; r <- hashes.keys if l < r
      hd = java.lang.Long.bitCount(hashes(l) ^ hashes(r)) if hd <= 3
    } yield (l, r, hd.toLong)).toSet
    // the decade fixture must yield a non-degenerate neardup set: at least
    // one pair at Hamming 0 < d <= 3 (small luma shift, few wrap flips) and
    // at least one same-decade pair EXCLUDED (enough wrap flips) — otherwise
    // the threshold isn't exercised in both directions
    assert(expect.nonEmpty, "fixture produced no near-dup pairs at all")
    assert(expect.exists(_._3 > 0L), "no pair with 0 < hamming <= 3")
    val sameDecadeOut = (for {
      l <- hashes.keys; r <- hashes.keys
      if l < r && l / 10 === r / 10
      hd = java.lang.Long.bitCount(hashes(l) ^ hashes(r)) if hd > 3
    } yield (l, r)).toSet
    assert(sameDecadeOut.nonEmpty, "every same-decade pair fell inside the radius")
    val got = Dedup.hammingPairs64(
        Multimodal.y4mHash(Multimodal.synthY4m(many, "id").toDF(), "id").toDF(),
        "id", "vhash", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong))
    assert(got.length === got.toSet.size, "duplicate pair emissions")
    assert(got.toSet === expect)
  }

  test("y4m R×S near-dup: banded cross pairs == brute force; indexed == direct") {
    val docs = (0L until 80L).toDF("id")
    def sig(d: org.apache.spark.sql.DataFrame) =
      Multimodal.y4mHash(Multimodal.synthY4m(d, "id").toDF(), "id").toDF()
    val corpus = docs.where($"id" % 10 =!= 0)
    val incoming = docs.where($"id" % 10 === 0)
    val cHash = sig(corpus).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val iHash = sig(incoming).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = (for {
      l <- cHash.keys; r <- iHash.keys
      hd = java.lang.Long.bitCount(cHash(l) ^ iHash(r)) if hd <= 3
    } yield (l, r, hd.toLong)).toSet
    val direct = Dedup.hammingPairsRs64(sig(corpus), sig(incoming), "id", "vhash", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong))
    assert(direct.length === direct.toSet.size, "duplicate pair emissions")
    assert(direct.toSet === expect)
    val indexed = Dedup.hammingPairsRs64Indexed(
        Dedup.hammingIndex64(sig(corpus), "id", "vhash"),
        sig(incoming), "id", "vhash", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong))
    assert(indexed.sorted.toSeq === direct.sorted.toSeq, "indexed != direct")
  }

  test("y4mScenes: cuts match the closed-form consecutive-frame deltas") {
    // ids 0..500 include multi-frame videos with both cut and non-cut
    // transitions at threshold 3 (verified against the closed form)
    val many = (0L until 500L).toDF("id")
    val expect = (for {
      id <- 0L until 500L
      (_, _, nf) = vdims(id)
      f <- 1 until nf
      d = java.lang.Long.bitCount(refFrameHash(id, f) ^ refFrameHash(id, f - 1))
      if d > 3
    } yield (id, f.toLong, d.toLong)).toSet
    assert(expect.nonEmpty, "fixture has no cuts at threshold 3")
    val got = Multimodal.y4mScenes(
        Multimodal.synthY4m(many, "id").toDF(), "id", 3)
      .collect().map(s => (s.id, s.frame_idx, s.hamming_prev)).toSet
    assert(got === expect)
    // and some multi-frame transition must be BELOW threshold too
    val all = (for {
      id <- 0L until 500L
      (_, _, nf) = vdims(id)
      f <- 1 until nf
    } yield (id, f)).size
    assert(expect.size < all, "every transition was a cut — threshold untested")
  }

  test("y4mKeyframes: real gray PNGs whose image dHash equals the frame's luma hash") {
    val kf = Multimodal.y4mKeyframes(Multimodal.synthY4m(ids, "id").toDF(), "id", 2)
    // (id, frame_idx) stay separate columns — collision-free at any frame
    // count; downstream single-key passes get a caller-built composite
    val kfKeyed = kf.toDF()
      .select((col("id") * 10 + col("frame_idx")).as("id"), col("payload"))
    // payloads are REAL PNGs (magic) decodable by the image pipeline
    val magics = Multimodal.extractMeta(kfKeyed, "id")
      .select("magic").distinct().collect().map(_.getString(0)).toSet
    assert(magics === Set("89504e47"))
    // the video→image bridge: downstream IMAGE dHash == the frame's luma
    // dHash (BT.601 of (l,l,l) is 1000·l, order-preserving)
    val got = Multimodal.dHash(kfKeyed, "id")
      .collect().map(d => d.id -> d.dhash).toMap
    val expect = (for {
      id <- Seq(0L, 1L, 7L, 254L, 255L, 256L, 4242L)
      (_, _, nf) = vdims(id)
      f <- 0 until nf if f % 2 == 0
    } yield (id * 10 + f) -> refFrameHash(id, f)).toMap
    assert(got === expect)
    // decode witnesses: keyframe dims match the video's geometry
    val dec = Multimodal.decodeImage(kfKeyed, "id").collect()
    assert(dec.forall(_.format === "png"))
    dec.foreach { d =>
      val (w, h, _) = vdims(d.id / 10)
      assert(d.width === w.toLong && d.height === h.toLong)
    }
  }

  // CCITT G.711 µ-law from spec (exact vs the JDK codec on [−32503, 32767])
  private def ulawEncode(v: Int): Int = {
    val sign = if (v < 0) 0x80 else 0
    var m = math.min(math.abs(v), 32635) + 132
    var ex = 7
    var mask = 0x4000
    while ((m & mask) == 0 && ex > 0) { ex -= 1; mask >>= 1 }
    val man = (m >> (ex + 3)) & 0x0F
    (~(sign | (ex << 4) | man)) & 0xFF
  }
  private def ulawDecode(u0: Int): Int = {
    val u = (~u0) & 0xFF
    val s = ((((u & 0x0F) << 3) + 0x84) << ((u >> 4) & 7)) - 0x84
    if ((u & 0x80) != 0) -s else s
  }

  test("synthUlawWav -> decodeUlaw: real G.711 companding round trip matches spec arithmetic") {
    val out = Multimodal.decodeUlaw(
      Multimodal.synthUlawWav(ids, "id").toDF(), "id")
      .collect().map(d => d.id -> d).toMap
    for (id <- Seq(0L, 1L, 7L, 254L, 255L, 256L, 4242L)) {
      val d = out(id)
      val ns = (100 + id % 50).toInt
      assert(d.sample_rate === 8000L && d.channels === 1L && d.bits === 8L)
      assert(d.n_frames === ns.toLong)
      val samples = (0 until ns).map(i => ((id * 31 + i * 17L) % 20001 - 10000).toInt)
      val expect = samples.map(s => ulawDecode(ulawEncode(s)).toLong).sum
      assert(d.sample_sum === expect, s"companded sum id=$id")
      // the codec is genuinely LOSSY on this fixture: the companded sum
      // must differ from the raw PCM sum, or the witness proves nothing
      assert(d.sample_sum !== samples.map(_.toLong).sum, s"lossless?! id=$id")
    }
    // a plain PCM WAV is NOT µ-law: flagged, not decoded
    val pcm = Multimodal.decodeUlaw(
      Multimodal.synthWav(ids, "id").toDF(), "id").collect()
    assert(pcm.forall(_.sample_rate === 0L))
    // garbage payloads flag too
    val bad = Multimodal.decodeUlaw(
      Seq((3L, Array[Byte](1, 2, 3))).toDF("id", "payload"), "id").collect().head
    assert(bad.sample_rate === 0L)
  }

  // closed-form reference of the AVI fixture's frame rasters
  private def aviDims(id: Long): (Int, Int, Int) =
    ((8 * (2 + id % 5)).toInt, (8 * (2 + id % 3)).toInt, (1 + id % 4).toInt)
  private def aviLuma(id: Long, f: Int)(sx: Long, sy: Long): Long =
    (id + 5 * (sx / 8) + 9 * (sy / 8) + 17 * f) % 256
  private def refAviFrameHash(id: Long, f: Int): Long = {
    val (w, h, _) = aviDims(id)
    val luma = aviLuma(id, f) _
    var hash = 0L
    for (y <- 0 until 8; x <- 0 until 8)
      if (luma((x + 1) * w / 9, y * h / 8) > luma(x * w / 9, y * h / 8))
        hash |= 1L << (y * 8 + x)
    hash
  }

  test("synthAvi -> decodeAvi: real RIFF/MJPEG container round trip matches closed form") {
    val avi = Multimodal.synthAvi(ids, "id")
    // payloads are REAL RIFF containers
    val magics = Multimodal.extractMeta(avi.toDF(), "id")
      .select("magic").distinct().collect().map(_.getString(0)).toSet
    assert(magics === Set("52494646")) // 'RIFF'
    val dec = Multimodal.decodeAvi(avi.toDF(), "id").collect().map(d => d.id -> d).toMap
    for (id <- Seq(0L, 1L, 7L, 254L, 255L, 256L, 4242L)) {
      val (w, h, nf) = aviDims(id)
      val d = dec(id)
      assert(d.width === w.toLong && d.height === h.toLong, s"dims id=$id")
      assert(d.fps_num === 25L && d.fps_den === 1L && d.codec === "MJPG")
      assert(d.n_frames === nf.toLong)
      assert(d.px00 === id % 256)
      val ySum = (for { f <- 0 until nf; bx <- 0L until w / 8; by <- 0L until h / 8 }
        yield 64 * ((id + 5 * bx + 9 * by + 17 * f) % 256)).sum
      assert(d.y_sum === ySum, s"luma sum id=$id")
    }
    // malformed containers flag, not fail
    val bad = Multimodal.decodeAvi(
      Seq((9L, "RIFFxxxxJUNK".getBytes("US-ASCII"))).toDF("id", "payload"), "id")
      .collect().head
    assert(bad.codec === "unreadable" && bad.n_frames === 0L)
    // a TRUNCATED movi chunk (frame bytes cut mid-JPEG) is malformed too
    val whole = avi.collect().head
    val cut = Multimodal.decodeAvi(
      Seq((whole.id, whole.payload.dropRight(10))).toDF("id", "payload"), "id")
      .collect().head
    assert(cut.codec === "unreadable")
  }

  test("aviFrameHashes + aviHash: per-frame closed form; middle-frame signature") {
    val avi = Multimodal.synthAvi(ids, "id")
    val got = Multimodal.aviFrameHashes(avi.toDF(), "id")
      .collect().map(f => (f.id, f.frame_idx) -> f.fhash).toMap
    val expect = (for {
      id <- Seq(0L, 1L, 7L, 254L, 255L, 256L, 4242L)
      (_, _, nf) = aviDims(id)
      f <- 0 until nf
    } yield (id, f.toLong) -> refAviFrameHash(id, f)).toMap
    assert(got === expect)
    val vh = Multimodal.aviHash(avi.toDF(), "id")
      .collect().map(v => v.id -> v.vhash).toMap
    for (id <- Seq(0L, 1L, 7L, 254L, 255L, 256L, 4242L)) {
      val (_, _, nf) = aviDims(id)
      assert(vh(id) === refAviFrameHash(id, nf / 2), s"video hash id=$id")
    }
    // the mod-15 geometry classes carry constant luma shifts: near-dup
    // structure exists (some same-class pair within hamming 3) without
    // being universal
    val sweep = Multimodal.aviHash(
      Multimodal.synthAvi((0L until 120L).toDF("id"), "id").toDF(), "id")
      .collect().map(v => v.id -> v.vhash).toMap
    val dists = for {
      a <- 0L until 120L; b <- (a + 1) until 120L
    } yield java.lang.Long.bitCount(sweep(a) ^ sweep(b))
    assert(dists.exists(_ <= 3) && dists.exists(_ > 3),
      "fixture must have both near-dup and far pairs")
  }

  test("synthJpeg: real entropy-coded JPEGs that decode back bit-exactly") {
    val jp = Multimodal.synthJpeg(ids, "id")
    // payloads are REAL JPEGs: JFIF SOI marker, and SMALLER than raw (the
    // entropy coder is actually running)
    val meta = Multimodal.extractMeta(jp.toDF(), "id")
      .select("magic").collect().map(_.getString(0))
    assert(meta.forall(_.startsWith("ffd8")))
    // exact decode witnesses: block-constant gray at quality 1.0 round-trips
    val dec = Multimodal.decodeImage(jp.toDF(), "id").collect()
    assert(dec.nonEmpty && dec.forall(_.format === "jpeg"))
    dec.foreach { d =>
      val id = d.id
      val w = 8 * (2 + id % 5); val h = 8 * (2 + id % 3)
      assert(d.width === w && d.height === h)
      val l00 = id % 256
      assert(d.px00 === f"$l00%02x$l00%02x$l00%02x")
      val lc = (id + 5 * (w / 8 - 1) + 9 * (h / 8 - 1)) % 256
      assert(d.pxc === f"$lc%02x$lc%02x$lc%02x")
      val sum = (for { bx <- 0L until w / 8; by <- 0L until h / 8 }
        yield 3 * 64 * ((id + 5 * bx + 9 * by) % 256)).sum
      assert(d.px_sum === sum)
    }
    // dHash closed form: sampled pixel (x·w//9, y·h//8) lands in block
    // (sx//8, sy//8) of luma (id + 5bx + 9by) % 256; gray = 1000·luma
    val got = Multimodal.dHash(jp.toDF(), "id")
      .collect().map(d => d.id -> d.dhash).toMap
    def refJpegHash(id: Long): Long = {
      val w = 8 * (2 + id % 5); val h = 8 * (2 + id % 3)
      def luma(sx: Long, sy: Long): Long = (id + 5 * (sx / 8) + 9 * (sy / 8)) % 256
      var hash = 0L
      for (y <- 0 until 8; x <- 0 until 8)
        if (luma((x + 1) * w / 9, y * h / 8) > luma(x * w / 9, y * h / 8))
          hash |= 1L << (y * 8 + x)
      hash
    }
    got.foreach { case (id, dh) => assert(dh === refJpegHash(id), s"id=$id") }
  }

  test("decodeY4m: non-mono colorspaces walk chroma planes correctly") {
    // hand-built C420 stream (the spec default when no C param is present):
    // 4x4 luma plane = bytes 0..15 per frame, then 2x2 U + 2x2 V planes of
    // 0xEE — the luma sum must EXCLUDE chroma, and the frame walk must stay
    // aligned across 2 frames
    def frame(lumaBase: Int): Array[Byte] =
      "FRAME\n".getBytes("US-ASCII") ++
        (0 until 16).map(i => (lumaBase + i).toByte).toArray ++
        Array.fill[Byte](8)(0xEE.toByte)
    val bytes = "YUV4MPEG2 W4 H4 F30:1 Ip A1:1\n".getBytes("US-ASCII") ++
      frame(0) ++ frame(100)
    val d = Multimodal.decodeY4m(Seq((5L, bytes)).toDF("id", "payload"), "id")
      .collect().head
    assert(d.width === 4L && d.height === 4L && d.n_frames === 2L)
    assert(d.fps_num === 30L && d.fps_den === 1L)
    assert(d.px00 === 0L && d.pxl === 115L)
    assert(d.y_sum === (0 until 16).sum + (100 until 116).sum)
    // truncated chroma = malformed stream, not a short read: zero row
    val cut = bytes.dropRight(3)
    val bad = Multimodal.decodeY4m(Seq((6L, cut)).toDF("id", "payload"), "id")
      .collect().head
    assert(bad.width === 0L && bad.n_frames === 0L)
  }
}
