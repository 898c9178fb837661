package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{FakeMediaCodec, MediaCodec, MediaOps}

/** Multimodal plumbing: mime sniffing on real magic bytes, the batched
  * codec boundary (batch shape + ordering), schema of the meta struct,
  * resize math, frame explosion, and the stub-parity contract between
  * FakeMediaCodec (JVM) and MediaQueries' SQL-expression fake. */
class MultimodalSpec extends AnyFunSuite {

  lazy val spark = GraftSession.build(4, "multimodal-spec")
  import spark.implicits._

  private val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a, 1, 2, 3)
  private val jpg = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte, 9, 9)
  private val wav = "RIFFxxxxWAVEdata".getBytes("UTF-8")
  private val txt = "just some text".getBytes("UTF-8")

  private def mediaDf = Seq(
    (1L, png), (2L, jpg), (3L, wav), (4L, txt))
    .toDF("id", "content")

  test("sniffMime detects containers by magic bytes") {
    val got = mediaDf.select(col("id"), MediaOps.sniffMime(col("content")).as("mime"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(
      1L -> "image/png", 2L -> "image/jpeg", 3L -> "audio/wav",
      4L -> "application/octet-stream"))
  }

  test("withMediaMeta: meta struct schema, values, and row order") {
    val out = MediaOps.withMediaMeta(mediaDf, "content", FakeMediaCodec, batchSize = 2)
    assert(out.schema.fieldNames.toSeq == Seq("id", "content", "meta"))
    assert(out.select("meta.*").schema.fieldNames.toSeq ==
      Seq("mime", "content_len", "width", "height", "n_frames", "sample_rate_hz"))
    val rows = out.select("id", "meta.mime", "meta.content_len", "meta.width")
      .as[(Long, String, Long, Int)].collect().sortBy(_._1)
    assert(rows.map(_._2).toSeq == Seq("image/png", "image/jpeg", "audio/wav", "application/octet-stream"))
    assert(rows.map(_._3).toSeq == Seq(png.length.toLong, jpg.length.toLong, wav.length.toLong, txt.length.toLong))
    val h = FakeMediaCodec.seed(png)
    assert(rows.head._4 == FakeMediaCodec.widthOf(h))
  }

  test("codec sees mapInPandas-shaped batches: size bounded, order kept") {
    // the codec runs in the task, so report the observed batch size
    // through the decoded metadata rather than a driver-side collector
    object SpyCodec extends MediaCodec {
      def decodeBatch(contents: Seq[Array[Byte]]) =
        FakeMediaCodec.decodeBatch(contents).map(_.copy(width = contents.size))
    }
    val df = (1 to 10).map(i => (i.toLong, Array(i.toByte))).toDF("id", "content").coalesce(1)
    val out = MediaOps.withMediaMeta(df, "content", SpyCodec, batchSize = 4)
    assert(out.select("id").as[Long].collect().sorted.toSeq == (1L to 10L))
    val batchSizes = out.select("meta.width").as[Int].collect().toSeq
    assert(batchSizes.sorted == Seq(2, 2, 4, 4, 4, 4, 4, 4, 4, 4),
      "10 rows in batches of 4 → two rows saw a 2-batch, eight saw 4-batches")
  }

  test("resizeMeta clamps into the box, preserving aspect ratio") {
    val df = MediaOps.withMediaMeta(mediaDf, "content", FakeMediaCodec)
    val out = MediaOps.resizeMeta(df, 32, 32)
      .select("meta.width", "meta.height").as[(Int, Int)].collect()
    assert(out.forall { case (w, h) => w <= 32 && h <= 32 && w >= 1 && h >= 1 })
    // an already-small image must not be upscaled
    val h0 = FakeMediaCodec.seed(png)
    val (w0, ht0) = (FakeMediaCodec.widthOf(h0), FakeMediaCodec.heightOf(h0))
    val big = MediaOps.resizeMeta(MediaOps.withMediaMeta(mediaDf, "content", FakeMediaCodec), 10000, 10000)
      .filter(col("id") === 1).select("meta.width", "meta.height").as[(Int, Int)].head()
    assert(big == ((w0, ht0)))
  }

  test("sampleFrames explodes every k-th frame") {
    val df = MediaOps.withMediaMeta(mediaDf, "content", FakeMediaCodec)
    val out = MediaOps.sampleFrames(df, 5)
    val counts = out.groupBy("id").count().as[(Long, Long)].collect().toMap
    val expected = mediaDf.as[(Long, Array[Byte])].collect().map { case (id, c) =>
      val n = FakeMediaCodec.framesOf(FakeMediaCodec.seed(c))
      id -> (0 until n by 5).size.toLong
    }.toMap
    assert(counts == expected)
    assert(out.schema("frame").dataType == org.apache.spark.sql.types.BinaryType)
  }

  test("SQL-expression fake (MediaQueries) ≡ FakeMediaCodec derivation") {
    // the oracle-checked query derives width/height/frames/rate from the
    // md5 seed in SQL; the codec derives them on the JVM — one contract
    val df = mediaDf.select(col("id"), col("content"),
      conv(substring(md5(hex(col("content"))), 1, 8), 16, 10).cast("long").as("h"))
      .select(col("id"), col("content"),
        (lit(16) + col("h").bitwiseAND(lit(255L))).as("width"),
        (lit(1) + shiftright(col("h"), 16).bitwiseAND(lit(31L))).as("n_frames"))
      .as[(Long, Array[Byte], Long, Long)].collect()
    df.foreach { case (_, content, w, n) =>
      val h = FakeMediaCodec.seed(content)
      assert(w == FakeMediaCodec.widthOf(h), "width derivations must agree")
      assert(n == FakeMediaCodec.framesOf(h), "frame derivations must agree")
    }
  }

  test("withMediaEmbedding: batch contract, dims enforced, vectors ≡ expression fake") {
    import graft.multimodal.FakeMediaEmbedder
    val emb = FakeMediaEmbedder(dims = 16)
    val out = MediaOps.withMediaEmbedding(mediaDf, "content", emb, batchSize = 3)
    assert(out.schema.fieldNames.toSeq == Seq("id", "content", "embedding"))
    val byId = out.select("id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(byId.size == 4 && byId.values.forall(_.length == 16))
    // JVM batch path ≡ the SQL-expression fake mmEmbedTopk scores with
    val viaExpr = mediaDf.select(col("id"),
        transform(sequence(lit(0), lit(15)),
          j => (conv(substring(md5(concat(hex(col("content")), lit(":"), j.cast("string"))), 1, 4), 16, 10)
            .cast("double") / lit(65535.0)).cast("float")).as("e"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    byId.foreach { case (id, e) =>
      assert(e == viaExpr(id), s"embedder and expression fake diverge for payload $id")
    }
    // values are genuinely spread over [0,1], not degenerate
    val flat = byId.values.flatten
    assert(flat.forall(v => v >= 0f && v <= 1f))
    assert(flat.max - flat.min > 0.5f, "fake embedding collapsed")
  }

  test("aHash32 through the codec path equals the closed-form fingerprint") {
    // the perceptual fingerprint mm_phash_dedup keys on must be the
    // SAME whether computed from decoded pixel bytes (real plumbing)
    // or from the seed's closed form (the oracle-facing expression)
    val decoded = FakeMediaCodec.decodeBatch(Seq(png, jpg, wav, txt))
    Seq(png, jpg, wav, txt).zip(decoded).foreach { case (payload, d) =>
      val viaCodec = MediaOps.aHash32(d.pixels)
      val h = FakeMediaCodec.seed(payload)
      val px = (0 until 32).map(i => (h + i) % 256)
      val sum = px.sum
      val closed = px.zipWithIndex.foldLeft(0L) { case (acc, (p, i)) =>
        if (p * 32 > sum) acc | (1L << i) else acc
      }
      assert(viaCodec == closed, s"codec $viaCodec vs closed-form $closed")
    }
  }

  test("aHash32 separates distinct gradients and is stable") {
    val a = MediaOps.aHash32(Array.tabulate[Byte](32)(i => i.toByte))
    val b = MediaOps.aHash32(Array.tabulate[Byte](32)(i => (255 - i).toByte))
    assert(a == MediaOps.aHash32(Array.tabulate[Byte](40)(i => i.toByte)),
      "extra pixels beyond 32 changed the hash")
    assert(a != b, "ascending and descending gradients collide")
  }

  test("audioFp32 through the codec path equals the closed-form fingerprint") {
    // second-modality twin of the aHash32 parity test: the fingerprint
    // mm_audio_dedup keys on must be the SAME whether computed from
    // decoded sample bytes (codec plumbing) or from the seed's closed
    // form (the oracle-facing expression) — this is what proves the
    // codec boundary generalizes beyond images
    val decoded = FakeMediaCodec.decodeBatch(Seq(png, jpg, wav, txt))
    Seq(png, jpg, wav, txt).zip(decoded).foreach { case (payload, d) =>
      val viaCodec = MediaOps.audioFp32(d.pixels)
      val h = FakeMediaCodec.seed(payload)
      val e = Array.tabulate(32)(i => (0 until 8).map(j => (h + 8 * i + j) % 256).sum)
      val closed = (0 until 32).foldLeft(0L) { (acc, i) =>
        if (e(i) > e((i + 1) % 32)) acc | (1L << i) else acc
      }
      assert(viaCodec == closed, s"codec $viaCodec vs closed-form $closed")
    }
  }

  test("mm_clip_filter: towers genuinely differ, keep tracks the threshold, mixed verdicts") {
    val sf = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("mm_clip_filter")(spark, sf)
      .as[(Long, Double, Int)].collect()
    assert(rows.nonEmpty)
    // scores are cosines of non-negative vectors: [0, 1]
    assert(rows.forall { case (_, s, _) => s >= 0.0 && s <= 1.0 })
    // keep is the threshold verdict (6-dp rounding can't flip it unless
    // a score lands within 5e-7 of the threshold — assert it doesn't)
    rows.foreach { case (id, s, keep) =>
      assert(math.abs(s - 0.78) > 1e-6, s"doc $id scored ON the threshold")
      assert(keep == (if (s >= 0.78) 1 else 0), s"doc $id keep flag disagrees with score $s")
    }
    // the gate must actually filter: both verdicts present (a salted
    // text tower identical to the media tower would score 1.0 for every
    // row and keep everything)
    assert(rows.exists(_._3 == 1) && rows.exists(_._3 == 0),
      "clip filter is degenerate — one-sided verdicts")
    assert(rows.forall(_._2 < 0.9999), "towers collapsed to identical embeddings")
  }

  test("crossmodal IVF recall eval is non-degenerate and honest about tower alignment") {
    // the fake towers are independent md5 hashes, so text→media-centroid
    // routing is weakly informative — the eval must REPORT that (recall
    // well below 1.0 with NProbe≪C), not mask it; with real aligned CLIP
    // towers the same query reads high. Degenerate shapes (0 everywhere =
    // broken join; 1e6 everywhere = accidentally probing all lists) are
    // what this pins against.
    val rows = SparkEntry.queries("mm_crossmodal_ivf_recall")(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (p, k, hits, e6) =>
      assert(k == 3 && hits >= 0 && hits <= k, s"probe $p: $hits of $k")
      assert(e6 == hits * 1000000L / k, s"probe $p recall arithmetic drifted")
    }
    assert(rows.exists(_._3 > 0), "no probe recalled anything — candidate join broken")
    assert(rows.exists(_._3 < 3),
      "every probe at full recall with NProbe << C — probing is not pruning")
  }

  test("mm_crossmodal_ivf_topk_cached (persisted media tower) ≡ the self-contained query") {
    // build/query split: the persisted inverted-list table must answer
    // bit-identically to the build-inline form — the vec_ivf_topk_cached
    // acceptance bar, now on the cross-modal path (and the centroid
    // frame re-derived FROM the persisted lists must equal the one
    // sampled from the raw corpus, or the probe routing silently drifts)
    val sf = "/root/testdata/sf0.001"
    val inline = SparkEntry.queries("mm_crossmodal_ivf_topk")(spark, sf)
      .collect().map(_.toSeq).toSet
    val cached = SparkEntry.queries("mm_crossmodal_ivf_topk_cached")(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(inline.nonEmpty, "fixture degenerate: inline crossmodal IVF returned nothing")
    assert(cached == inline, "persisted-media-tower query diverged from inline build")
  }

  test("mm_frame_neardup ≡ brute-force frame-set Jaccard on the JVM") {
    val sf = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("mm_frame_neardup")(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
      .map { case (a, b, n, j) => (a, b) -> ((n, j)) }.toMap
    // brute-force oracle: payload → FakeMediaCodec.seed → (cid, sampled
    // frame indices); md5 fingerprint equality ⟺ (cid, idx) equality
    val magic = Map(
      0L -> Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a),
      1L -> Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte),
      2L -> "RIFFxxxxWAVE".getBytes("UTF-8"),
      3L -> Array.emptyByteArray)
    val frames = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, text) =>
        val h = FakeMediaCodec.seed(magic(id % 4) ++ text.getBytes("UTF-8"))
        val cid = h % 256
        val n = FakeMediaCodec.framesOf(h)
        id -> (0 until n by 4).map(i => (cid, i.toLong)).toSet
      }.toMap
    val want = (for {
      (a, fa) <- frames.toSeq; (b, fb) <- frames.toSeq if a < b
      shared = (fa intersect fb).size.toLong if shared >= 2
    } yield (a, b) -> ((shared, shared * 1000000L / (fa.size + fb.size - shared)))).toMap
    assert(got == want,
      s"pair sets diverge: spark-only=${(got.keySet -- want.keySet).take(3)}, " +
        s"oracle-only=${(want.keySet -- got.keySet).take(3)}")
    assert(want.nonEmpty, "fixture produced no near-dup pairs — test is vacuous")
  }

  test("audioFp32: gain-invariant to constant offsets, sensitive to shape") {
    // the energy-DELTA-SIGN construction is what real audio
    // fingerprints key on because uniform gain cancels in every
    // comparison — pin that property on the JVM kernel
    val base = Array.tabulate[Byte](256)(i => ((i * 7) % 101).toByte)
    val gained = base.map(s => ((s & 0xff) + 20).toByte) // +20 "gain"
    assert(base.forall(s => (s & 0xff) <= 235), "fixture would wrap under +20 gain")
    assert(MediaOps.audioFp32(base) == MediaOps.audioFp32(gained),
      "constant gain changed the fingerprint")
    val reversed = base.reverse
    assert(MediaOps.audioFp32(base) != MediaOps.audioFp32(reversed),
      "reversed waveform collided")
    // short payloads must fail loudly, not fingerprint garbage
    val e = intercept[IllegalArgumentException] {
      MediaOps.audioFp32(Array.fill[Byte](100)(1))
    }
    assert(e.getMessage.contains("256"))
  }
}
