package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column operations: media as opaque `binary` + typed
  * metadata, Spark-side plumbing real, decode stubbed
  * ([[FakeMediaCodec]]).
  *
  * Scale notes (100 TB of media): payload rows are MB-scale, so
  * `spark.sql.files.maxPartitionBytes` governs scan parallelism, not
  * row counts; every transform here is per-row/mapPartitions (no
  * shuffle), and decode batches amortize codec setup exactly like
  * `mapInPandas` batches do. Frame explosion multiplies rows — sample
  * BEFORE shuffling frames anywhere.
  */
object MediaOps {

  /** Typed metadata carried beside every media payload. */
  val metaSchema: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("content_len", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("sample_rate_hz", IntegerType)))

  /** Magic-byte container sniffing over a binary column — REAL (no
    * stub): prefix compares stay in codegen; unknown containers fall
    * through to application/octet-stream. */
  def sniffMime(content: Column): Column = {
    def pfx(hexMagic: String, at: Int = 1): Column =
      substring(content, at, hexMagic.length / 2) === unhex(lit(hexMagic))
    when(pfx("89504E470D0A1A0A"), "image/png")
      .when(pfx("FFD8FF"), "image/jpeg")
      .when(pfx("474946383761").or(pfx("474946383961")), "image/gif")
      .when(pfx("52494646").and(pfx("57415645", 9)), "audio/wav") // RIFF....WAVE
      .when(pfx("52494646").and(pfx("57454250", 9)), "image/webp") // RIFF....WEBP
      .when(pfx("494433").or(pfx("FFFB")), "audio/mpeg")
      .when(pfx("66747970", 5), "video/mp4") // ....ftyp
      .otherwise("application/octet-stream")
  }

  /** Decode a batch-at-a-time and attach [[metaSchema]] as a `meta`
    * struct column. The mapPartitions body groups rows into
    * `batchSize`-element batches before calling the codec — the batch
    * shape, not the codec, is the contract (a real decoder sees the
    * same `Seq[Array[Byte]]` the fake does). */
  def withMediaMeta(
      df: DataFrame,
      contentCol: String,
      codec: MediaCodec,
      batchSize: Int = 64): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField("meta", metaSchema))
    val idx = df.schema.fieldIndex(contentCol)
    val mimed = df.withColumn("_mime", sniffMime(col(contentCol)))
    val mimeIdx = mimed.schema.fieldIndex("_mime")
    val result = mimed.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { rows =>
        val decoded = codec.decodeBatch(rows.map(_.getAs[Array[Byte]](idx)))
        rows.lazyZip(decoded).map { (r, d) =>
          val meta = Row(r.getString(mimeIdx), r.getAs[Array[Byte]](idx).length.toLong,
            d.width, d.height, d.nFrames, d.sampleRateHz)
          Row.fromSeq(r.toSeq.dropRight(1) :+ meta) // drop _mime, add meta
        }
      }
    }
    df.sparkSession.createDataFrame(result, schema)
  }

  /** "Resize" every image payload: re-encode through the codec at the
    * target box, updating width/height in meta. The fake codec keeps
    * the payload and scales metadata — the real plumbing is the
    * schema-preserving per-row transform. */
  def resizeMeta(df: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val scale = least(
      lit(1.0),
      lit(maxW) / col("meta.width"), lit(maxH) / col("meta.height"))
    df.withColumn("meta", struct(
      col("meta.mime").as("mime"),
      col("meta.content_len").as("content_len"),
      floor(col("meta.width") * scale).cast(IntegerType).as("width"),
      floor(col("meta.height") * scale).cast(IntegerType).as("height"),
      col("meta.n_frames").as("n_frames"),
      col("meta.sample_rate_hz").as("sample_rate_hz")))
  }

  /** 32-bit average-hash over decoded pixel bytes — the perceptual
    * fingerprint image dedup keys on (aHash: bit i set iff pixel i is
    * above the mean). All-integer (`32·px > Σpx` instead of a mean
    * divide), so the codec path and any closed-form expression mirror
    * agree bit-for-bit. A real decoder feeds real (downsampled 8×4)
    * luma here; the contract is bytes-in → long-out. */
  def aHash32(pixels: Array[Byte]): Long = {
    require(pixels.length >= 32, s"aHash32 needs ≥32 pixels, got ${pixels.length}")
    val px = Array.tabulate(32)(i => (pixels(i) & 0xff).toLong)
    val sum = px.sum
    px.zipWithIndex.foldLeft(0L) { case (acc, (p, i)) =>
      if (32L * p > sum) acc | (1L << i) else acc
    }
  }

  /** 32-bit audio fingerprint over decoded sample bytes — the
    * Haitsma–Kalker-style energy-delta sign hash in time-domain form:
    * frame the first 256 samples into 32 8-sample frames, per-frame
    * energy = Σ samples, bit i set iff frame i's energy exceeds frame
    * (i+1 mod 32)'s. Delta SIGNS (not magnitudes) survive gain changes,
    * which is why every published audio fingerprint keys on them.
    * All-integer, so the codec path, any closed-form expression mirror,
    * and the DuckDB oracle agree bit-for-bit — the same contract as
    * [[aHash32]] for images. A real decoder feeds real PCM frames here;
    * the contract is bytes-in → long-out. */
  def audioFp32(samples: Array[Byte]): Long = {
    require(samples.length >= 256, s"audioFp32 needs ≥256 samples, got ${samples.length}")
    val e = Array.tabulate(32)(i =>
      (0 until 8).map(j => (samples(8 * i + j) & 0xff).toLong).sum)
    (0 until 32).foldLeft(0L) { (acc, i) =>
      if (e(i) > e((i + 1) % 32)) acc | (1L << i) else acc
    }
  }

  /** Attach a `dims`-length `embedding` column extracted by `embedder`,
    * batch-at-a-time — the feature-extract stage between decode and the
    * vector operators. Same mapPartitions batch contract as
    * [[withMediaMeta]]: the embedder sees `Seq[Array[Byte]]` batches of
    * ≤ `batchSize`, rows keep their order, and the output column is the
    * `array<float>` shape every `vec_*` query consumes. */
  def withMediaEmbedding(
      df: DataFrame,
      contentCol: String,
      embedder: MediaEmbedder,
      batchSize: Int = 64): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("embedding", ArrayType(FloatType, containsNull = false)))
    val idx = df.schema.fieldIndex(contentCol)
    val result = df.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { rows =>
        val embs = embedder.embedBatch(rows.map(_.getAs[Array[Byte]](idx)))
        require(embs.length == rows.length,
          s"embedder returned ${embs.length} vectors for ${rows.length} payloads")
        rows.lazyZip(embs).map { (r, e) =>
          require(e.length == embedder.dims,
            s"embedder returned ${e.length} dims, declared ${embedder.dims}")
          Row.fromSeq(r.toSeq :+ e.toSeq)
        }
      }
    }
    df.sparkSession.createDataFrame(result, schema)
  }

  /** Sample every `everyK`-th frame of each video payload into one row
    * per frame `(… , frame_idx, frame)` — the explode side of a
    * frame-level training pipeline. Frame EXTRACTION is stubbed (the
    * fake "frame" is the payload's md5-seeded slice); the row
    * multiplication, ordering, and pruning are real. */
  def sampleFrames(df: DataFrame, everyK: Int): DataFrame = {
    require(everyK > 0, "everyK must be positive")
    df.withColumn("frame_idx",
        explode(sequence(lit(0), col("meta.n_frames") - 1, lit(everyK))))
      // STUB frame bytes: deterministic 16-byte slice keyed by index —
      // a real codec returns the decoded frame here
      .withColumn("frame", substring(
        md5(concat(col("meta.mime"), col("frame_idx").cast(StringType))).cast(BinaryType), 1, 16))
  }
}
