package graft.multimodal

/** Decoded-media surface for the multimodal pipeline (BASELINE north
  * star: image/audio/video columns in a training-data engine).
  *
  * The engine treats media as opaque `binary` columns plus typed
  * metadata; decoding is behind this batch-oriented codec interface —
  * the Scala analog of a `mapInPandas` UDF: one call per BATCH of
  * payloads so a real implementation (JNI ffmpeg/libjpeg, a GPU
  * decoder, an RPC to a sidecar) amortizes per-call setup across the
  * batch instead of paying it per row.
  */
final case class DecodedMedia(
    width: Int,
    height: Int,
    nFrames: Int,
    sampleRateHz: Int,
    pixels: Array[Byte])

trait MediaCodec extends Serializable {
  /** Decode one batch of payloads. MUST return exactly one element per
    * input, in order (the caller zips results back onto rows). */
  def decodeBatch(contents: Seq[Array[Byte]]): Seq[DecodedMedia]
}

/** Feature-extraction surface — the "CLIP tower" slot of the multimodal
  * pipeline, batch-shaped exactly like [[MediaCodec]]: one call per
  * batch of payloads so a real extractor (an ONNX session, a GPU model
  * server, an RPC sidecar) amortizes setup across the batch. Extracted
  * vectors flow straight into the existing ANN/dedup operators — the
  * embedding column is the SAME `array<float>` shape `embeddings.vec`
  * queries consume. */
trait MediaEmbedder extends Serializable {
  /** Embedding dimensionality — constant per extractor. */
  def dims: Int
  /** Embed one batch. MUST return exactly one `dims`-length vector per
    * input, in order. */
  def embedBatch(contents: Seq[Array[Byte]]): Seq[Array[Float]]
}

/** Deterministic fake extractor: dim `j` is the first-16-bit md5 prefix
  * of `hex(content) ++ ":" ++ j`, scaled into [0, 1] — bit-identical to
  * the SQL-expression fake in `MediaQueries.mmEmbedTopk`, so the DuckDB
  * oracle checks the extract→ANN plumbing end-to-end. Swap in a real
  * model by implementing [[MediaEmbedder]]; nothing else changes. */
final case class FakeMediaEmbedder(dims: Int = 16) extends MediaEmbedder {
  def embedBatch(contents: Seq[Array[Byte]]): Seq[Array[Float]] =
    contents.map { c =>
      val hexStr = c.map(b => f"${b & 0xff}%02X").mkString
      Array.tabulate(dims) { j =>
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(s"$hexStr:$j".getBytes("US-ASCII"))
        val h = ((d(0) & 0xffL) << 8) | (d(1) & 0xffL)
        (h.toDouble / 65535.0).toFloat
      }
    }
}

/** ======================= DETERMINISTIC FAKE =======================
  * This container ships no image/audio/video libraries, so the decode
  * step is STUBBED: metadata is derived from the md5 of the payload and
  * "pixels" are a synthetic gradient. The derivation is bit-identical
  * to the SQL-expression fake in `MediaQueries` (same md5-prefix → same
  * width/height/frames/rate), which is what lets the DuckDB oracle
  * check the full pipeline plumbing end-to-end. Swap in a real codec by
  * implementing [[MediaCodec]]; nothing else changes.
  * ================================================================== */
object FakeMediaCodec extends MediaCodec {

  /** First 8 hex chars of md5-over-the-HEX-RENDERING as an unsigned
    * 32-bit value — the shared seed for every fake-derived field. The
    * digest input is the payload's uppercase hex string, not the raw
    * bytes, because the DuckDB oracle's md5() only accepts VARCHAR;
    * both engines hash the identical ASCII rendering. */
  def seed(content: Array[Byte]): Long = {
    val hexStr = content.map(b => f"${b & 0xff}%02X").mkString
    val d = java.security.MessageDigest.getInstance("MD5").digest(hexStr.getBytes("US-ASCII"))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  def widthOf(h: Long): Int = (16 + (h & 0xff)).toInt
  def heightOf(h: Long): Int = (16 + ((h >> 8) & 0xff)).toInt
  def framesOf(h: Long): Int = (1 + ((h >> 16) & 0x1f)).toInt
  def rateOf(h: Long): Int = (8000 + ((h >> 21) & 0x7fff)).toInt

  def decodeBatch(contents: Seq[Array[Byte]]): Seq[DecodedMedia] =
    contents.map { c =>
      val h = seed(c)
      val w = widthOf(h)
      val ht = heightOf(h)
      // tiny deterministic "pixel" gradient, capped so a fake decode
      // never materializes width*height bytes of garbage
      val px = Array.tabulate(math.min(w * ht, 256))(i => ((h + i) & 0xff).toByte)
      DecodedMedia(w, ht, framesOf(h), rateOf(h), px)
    }
}
