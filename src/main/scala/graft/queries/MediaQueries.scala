package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.multimodal.{FrameNeardupIndex, MediaOps}

/** Multimodal-column query family (BASELINE north star): media payloads
  * as opaque binary + typed metadata, exercised end-to-end against the
  * DuckDB oracle.
  *
  * The payloads are synthesized deterministically from `documents.text`
  * (this sandbox ships no media files or codecs): each doc gets a real
  * container magic prefix by `doc_id % 4` — PNG / JPEG / WAV / none —
  * so the magic-byte sniffing is exercised for real, and the "decode"
  * is the documented md5-seeded fake shared bit-for-bit with
  * [[graft.multimodal.FakeMediaCodec]] (MultimodalSpec asserts the
  * expression path and the batch-codec path agree). Everything here is
  * per-row and codegen-friendly: at 100 TB the scan parallelism comes
  * from maxPartitionBytes, and nothing shuffles until the explicit
  * frame explode.
  */
object MediaQueries {

  // sampling stride shared with the frame-neardup index so the two
  // faces can never drift apart
  private val FrameStride = FrameNeardupIndex.FrameStride

  /** payload = magic(doc_id % 4) ++ utf8(text). */
  private def payload: Column = {
    val m = pmod(col("doc_id"), lit(4))
    val magic = when(m === 0, unhex(lit("89504E470D0A1A0A"))) // PNG
      .when(m === 1, unhex(lit("FFD8FFE0"))) // JPEG/JFIF
      .when(m === 2, concat(unhex(lit("52494646")), encode(lit("xxxxWAVE"), "UTF-8"))) // RIFF....WAVE
      .otherwise(encode(lit(""), "UTF-8"))
    concat(magic, encode(col("text"), "UTF-8"))
  }

  /** md5-prefix seed over the payload's hex rendering — the same
    * unsigned-32-bit value [[graft.multimodal.FakeMediaCodec.seed]]
    * derives on the JVM (hex because DuckDB md5 only takes VARCHAR). */
  private def seed(c: Column): Column =
    conv(substring(md5(hex(c)), 1, 8), 16, 10).cast("long")

  def mmDecodeMeta(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val withPayload = docs.select(col("doc_id"), payload.as("content"))
    val h = seed(col("content"))
    withPayload.select(
        col("doc_id"),
        MediaOps.sniffMime(col("content")).as("mime"),
        length(col("content")).cast("long").as("content_len"),
        (lit(16) + h.bitwiseAND(lit(255L))).as("width"),
        (lit(16) + shiftright(h, 8).bitwiseAND(lit(255L))).as("height"),
        (lit(1) + shiftright(h, 16).bitwiseAND(lit(31L))).as("n_frames"),
        (lit(8000) + shiftright(h, 21).bitwiseAND(lit(32767L))).as("sample_rate_hz"))
      .orderBy(col("doc_id"))
  }

  val mmDecodeMetaSql: String =
    """WITH media AS (
      |  SELECT doc_id,
      |    (CASE doc_id % 4
      |       WHEN 0 THEN from_hex('89504E470D0A1A0A')
      |       WHEN 1 THEN from_hex('FFD8FFE0')
      |       WHEN 2 THEN from_hex('52494646') || encode('xxxxWAVE')
      |       ELSE encode('') END) || encode(text) AS content
      |  FROM documents),
      |seeded AS (
      |  SELECT doc_id, content, hex(content) AS hx,
      |    CAST(('0x' || substr(md5(hex(content)), 1, 8)) AS BIGINT) AS h
      |  FROM media)
      |SELECT doc_id,
      |  CASE -- magic sniff on the hex rendering (byte i = hex chars 2i-1..2i)
      |    WHEN substr(hx, 1, 16) = '89504E470D0A1A0A' THEN 'image/png'
      |    WHEN substr(hx, 1, 6) = 'FFD8FF' THEN 'image/jpeg'
      |    WHEN substr(hx, 1, 8) = '52494646'
      |         AND substr(hx, 17, 8) = '57415645' THEN 'audio/wav'
      |    ELSE 'application/octet-stream' END AS mime,
      |  octet_length(content) AS content_len,
      |  16 + (h & 255) AS width,
      |  16 + ((h >> 8) & 255) AS height,
      |  1 + ((h >> 16) & 31) AS n_frames,
      |  8000 + ((h >> 21) & 32767) AS sample_rate_hz
      |FROM seeded ORDER BY doc_id""".stripMargin

  /** Frame sampling: one row per every-`FrameStride`-th frame, with a
    * deterministic frame fingerprint standing in for decoded frame
    * bytes. The row-multiplying explode + downstream-prunable layout is
    * the real operator; frame extraction is the stub. */
  def mmFrameSample(spark: SparkSession, sfDir: String): DataFrame = {
    val meta = mmDecodeMeta(spark, sfDir)
    meta.select(col("doc_id"), col("mime"), col("n_frames"))
      .select(col("doc_id"), col("mime"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(FrameStride.toLong))).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        md5(concat(col("mime"), lit(":"), col("frame_idx").cast("string"))).as("frame_id"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  val mmFrameSampleSql: String =
    s"""WITH meta AS (${mmDecodeMetaSql.replace("ORDER BY doc_id", "")})
      |SELECT doc_id, frame_idx, md5(mime || ':' || CAST(frame_idx AS VARCHAR)) AS frame_id
      |FROM (SELECT doc_id, mime, unnest(range(0, n_frames, $FrameStride)) AS frame_idx FROM meta)
      |ORDER BY doc_id, frame_idx""".stripMargin

  // --- perceptual-hash duplicate groups --------------------------------
  // Image dedup by average-hash: bit i of the 32-bit fingerprint is set
  // iff decoded pixel i sits above the image mean (all-integer form
  // 32·pxᵢ > Σpx — no divide, so JVM codec, Spark expression, and the
  // DuckDB oracle agree bit-for-bit). The fake codec's "pixels" are the
  // documented (seed + i) & 255 gradient, so the closed-form expression
  // below IS the decode result (MultimodalSpec pins codec ≡ expression);
  // a real decoder slots in behind [[MediaOps.aHash32]] unchanged.
  //
  // Scale shape: the hash is a per-row projection at ingest (the decode
  // already happened for meta extraction — at 100 TB you hash then,
  // never re-decode for dedup), and grouping is ONE hash-agg keyed on
  // the 32-bit fingerprint — bounded output (≤2³² groups, in practice
  // ≤ distinct hashes). Hamming-near duplicates reuse the simhash
  // banded path; exact-fingerprint groups are the fast first pass.
  def mmPhashDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    // layered projections keep the expression tree linear: seed once,
    // the 32 pixel terms once, the sum once — inlining everything into
    // one phash expression repeats the md5 seed and the 32-term sum
    // inside every bit term (a ~1000-node tree that codegen chokes on)
    val withSeed = docs.select(col("doc_id"), seed(payload).as("h"))
    val withPx = withSeed.select(col("doc_id") +:
      (0 until 32).map(i => pmod(col("h") + lit(i.toLong), lit(256L)).as(s"p$i")): _*)
    val withSum = withPx.withColumn("s",
      (0 until 32).map(i => col(s"p$i")).reduce(_ + _))
    val phash = (0 until 32).map { i =>
      when(col(s"p$i") * 32 > col("s"), lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    withSum.select(col("doc_id"), phash.as("phash"))
      .groupBy(col("phash"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("canonical_doc_id"))
      .filter(col("n_docs") >= 2)
      .orderBy(col("phash"))
  }

  val mmPhashDedupSql: String = {
    val px = (0 until 32).map(i => s"(h + $i) % 256")
    val sum = px.mkString(" + ")
    val bits = px.zipWithIndex
      .map { case (p, i) => s"CASE WHEN ($p) * 32 > s THEN ${1L << i} ELSE 0 END" }
      .mkString(" + ")
    s"""WITH media AS (
      |  SELECT doc_id,
      |    (CASE doc_id % 4
      |       WHEN 0 THEN from_hex('89504E470D0A1A0A')
      |       WHEN 1 THEN from_hex('FFD8FFE0')
      |       WHEN 2 THEN from_hex('52494646') || encode('xxxxWAVE')
      |       ELSE encode('') END) || encode(text) AS content
      |  FROM documents),
      |seeded AS (
      |  SELECT doc_id,
      |    CAST(('0x' || substr(md5(hex(content)), 1, 8)) AS BIGINT) AS h
      |  FROM media),
      |summed AS (SELECT doc_id, h, $sum AS s FROM seeded),
      |hashed AS (SELECT doc_id, $bits AS phash FROM summed)
      |SELECT phash, count(*) AS n_docs, min(doc_id) AS canonical_doc_id
      |FROM hashed GROUP BY phash HAVING count(*) >= 2
      |ORDER BY phash""".stripMargin
  }

  // --- media similarity through extracted features ---------------------
  // The extract→ANN path: a batched embedder (the CLIP-tower slot,
  // [[graft.multimodal.MediaEmbedder]]) turns each payload into the
  // same `array<float>` the vector operators consume, then media top-k
  // runs the brute-cosine plan `vec_topk` uses — probes broadcast,
  // per-probe ranking through the bounded partial-merge TopKAgg, never
  // a window. Extraction here is the documented md5-chain fake
  // (expression path ≡ FakeMediaEmbedder batch path, pinned by
  // MultimodalSpec), so the oracle certifies the full pipeline.
  private val EmbedDims = 16
  private val EmbedTopK = 3
  private val EmbedProbeStride = 100

  /** The SQL-expression twin of [[graft.multimodal.FakeMediaEmbedder]]:
    * dim j = md5(hex ++ ":" ++ j) first 16 bits, scaled to [0,1]. */
  private[graft] def embedExpr(content: Column): Column =
    transform(sequence(lit(0), lit(EmbedDims - 1)),
      j => (conv(substring(md5(concat(hex(content), lit(":"), j.cast("string"))), 1, 4), 16, 10)
        .cast("double") / lit(65535.0)).cast("float"))

  def mmEmbedTopk(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.{TopKAgg, VectorFunctions}
    VectorFunctions.register(spark)
    val docs = Tables.load(spark, sfDir, "documents")
    val media = docs.select(col("doc_id"), embedExpr(payload).as("embedding"))
    val probes = media.filter(col("doc_id") % EmbedProbeStride === 0)
      .select(col("doc_id").as("probe_id"), col("embedding").as("pemb"))
    val topk = udaf(new TopKAgg(EmbedTopK))
    media.join(broadcast(probes), col("doc_id") =!= col("probe_id"))
      .select(col("probe_id"),
        call_function("cosine_sim", col("pemb"), col("embedding")).as("sim"),
        col("doc_id").as("id"))
      .groupBy(col("probe_id"))
      .agg(topk(col("sim"), col("id")).as("nn"))
      .select(col("probe_id"), posexplode(col("nn")).as(Seq("pos", "n")))
      .select(col("probe_id"), (col("pos") + 1).cast("int").as("rank"),
        col("n.id").as("neighbor_id"), round(col("n.sim"), 6).as("sim"))
      .orderBy(col("probe_id"), col("rank"))
  }

  val mmEmbedTopkSql: String =
    s"""WITH media AS (
      |  SELECT doc_id,
      |    (CASE doc_id % 4
      |       WHEN 0 THEN from_hex('89504E470D0A1A0A')
      |       WHEN 1 THEN from_hex('FFD8FFE0')
      |       WHEN 2 THEN from_hex('52494646') || encode('xxxxWAVE')
      |       ELSE encode('') END) || encode(text) AS content
      |  FROM documents),
      |embedded AS (
      |  SELECT doc_id,
      |    CAST([CAST(CAST(('0x' || substr(md5(hex(content) || ':' || j), 1, 4)) AS BIGINT) AS DOUBLE)
      |            / 65535.0
      |          for j in range(0, $EmbedDims)] AS REAL[]) AS embedding
      |  FROM media),
      |probes AS (
      |  SELECT doc_id AS probe_id, embedding AS pemb FROM embedded
      |  WHERE doc_id % $EmbedProbeStride = 0),
      |scored AS (
      |  SELECT p.probe_id, e.doc_id,
      |    list_cosine_similarity(CAST(p.pemb AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) AS sim
      |  FROM probes p JOIN embedded e ON e.doc_id != p.probe_id),
      |ranked AS (
      |  SELECT probe_id, doc_id, sim,
      |    row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, doc_id) AS rank
      |  FROM scored)
      |SELECT probe_id, rank, doc_id AS neighbor_id, round(sim, 6) AS sim
      |FROM ranked WHERE rank <= $EmbedTopK ORDER BY probe_id, rank""".stripMargin

  // --- cross-modal alignment filter (CLIP-score shape) ------------------
  // The LAION recipe: a text↔image pair survives ingest only if the two
  // towers' embeddings agree (cosine ≥ threshold) — the pair-quality
  // gate every large image-text corpus is built with. Re-expressed:
  // both towers are batched [[graft.multimodal.MediaEmbedder]] slots
  // (here the documented md5-chain fakes, text tower salted ":t:" so
  // the towers genuinely differ), the score is ONE cosine per row, and
  // the output is (doc_id, clip_score, keep). Per-row projection,
  // ZERO shuffle — at 100 TB this runs at scan speed and the keep flag
  // feeds the same corpus_filter/funnel machinery as every other gate.
  private[graft] val ClipThreshold = 0.78

  /** Text-tower twin of [[embedExpr]]: dim j = md5(text ‖ ":t:" ‖ j)
    * first 16 bits scaled to [0,1]. */
  private[graft] def textEmbedExpr(text: Column): Column =
    transform(sequence(lit(0), lit(EmbedDims - 1)),
      j => (conv(substring(md5(concat(text, lit(":t:"), j.cast("string"))), 1, 4), 16, 10)
        .cast("double") / lit(65535.0)).cast("float"))

  def mmClipFilter(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.VectorFunctions
    VectorFunctions.register(spark)
    val docs = Tables.load(spark, sfDir, "documents")
    docs.select(col("doc_id"),
        textEmbedExpr(col("text")).as("temb"),
        embedExpr(payload).as("memb"))
      .select(col("doc_id"),
        call_function("cosine_sim", col("temb"), col("memb")).as("s"))
      .select(col("doc_id"), round(col("s"), 6).as("clip_score"),
        when(col("s") >= ClipThreshold, lit(1)).otherwise(lit(0)).as("keep"))
      .orderBy(col("doc_id"))
  }

  val mmClipFilterSql: String =
    s"""WITH media AS (
      |  SELECT doc_id, text,
      |    (CASE doc_id % 4
      |       WHEN 0 THEN from_hex('89504E470D0A1A0A')
      |       WHEN 1 THEN from_hex('FFD8FFE0')
      |       WHEN 2 THEN from_hex('52494646') || encode('xxxxWAVE')
      |       ELSE encode('') END) || encode(text) AS content
      |  FROM documents),
      |embs AS (
      |  SELECT doc_id,
      |    CAST([CAST(CAST(('0x' || substr(md5(text || ':t:' || j), 1, 4)) AS BIGINT) AS DOUBLE)
      |            / 65535.0 for j in range(0, $EmbedDims)] AS REAL[]) AS temb,
      |    CAST([CAST(CAST(('0x' || substr(md5(hex(content) || ':' || j), 1, 4)) AS BIGINT) AS DOUBLE)
      |            / 65535.0 for j in range(0, $EmbedDims)] AS REAL[]) AS memb
      |  FROM media),
      |scored AS (
      |  SELECT doc_id,
      |    list_cosine_similarity(CAST(temb AS DOUBLE[]), CAST(memb AS DOUBLE[])) AS s
      |  FROM embs)
      |SELECT doc_id, round(s, 6) AS clip_score,
      |  CAST(CASE WHEN s >= $ClipThreshold THEN 1 ELSE 0 END AS INT) AS keep
      |FROM scored ORDER BY doc_id""".stripMargin

  // --- cross-modal retrieval (text probes → media corpus) ---------------
  // The other half of the CLIP lifecycle: where mm_clip_filter GATES
  // aligned pairs, this RETRIEVES — a strided sample of text-tower
  // probe embeddings ranks the media-tower corpus by cosine, the
  // text-searches-images serving shape. Same scale plan as every top-k
  // in the family: probes broadcast (|N/stride| rows), the corpus is
  // scanned once at projection speed, and ranking runs through the
  // bounded partial-merge TopKAgg — no window over probe×corpus rows.
  def mmCrossmodalTopk(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.{TopKAgg, VectorFunctions}
    VectorFunctions.register(spark)
    val docs = Tables.load(spark, sfDir, "documents")
    val media = docs.select(col("doc_id"), embedExpr(payload).as("memb"))
    val probes = docs.filter(col("doc_id") % EmbedProbeStride === 0)
      .select(col("doc_id").as("probe_id"), textEmbedExpr(col("text")).as("temb"))
    val topk = udaf(new TopKAgg(EmbedTopK))
    media.join(broadcast(probes), col("doc_id") =!= col("probe_id"))
      .select(col("probe_id"),
        call_function("cosine_sim", col("temb"), col("memb")).as("sim"),
        col("doc_id").as("id"))
      .groupBy(col("probe_id"))
      .agg(topk(col("sim"), col("id")).as("nn"))
      .select(col("probe_id"), posexplode(col("nn")).as(Seq("pos", "n")))
      .select(col("probe_id"), (col("pos") + 1).cast("int").as("rank"),
        col("n.id").as("neighbor_id"), round(col("n.sim"), 6).as("sim"))
      .orderBy(col("probe_id"), col("rank"))
  }

  val mmCrossmodalTopkSql: String =
    s"""WITH media AS (
      |  SELECT doc_id, text,
      |    (CASE doc_id % 4
      |       WHEN 0 THEN from_hex('89504E470D0A1A0A')
      |       WHEN 1 THEN from_hex('FFD8FFE0')
      |       WHEN 2 THEN from_hex('52494646') || encode('xxxxWAVE')
      |       ELSE encode('') END) || encode(text) AS content
      |  FROM documents),
      |membs AS (
      |  SELECT doc_id,
      |    CAST([CAST(CAST(('0x' || substr(md5(hex(content) || ':' || j), 1, 4)) AS BIGINT) AS DOUBLE)
      |            / 65535.0 for j in range(0, $EmbedDims)] AS REAL[]) AS memb
      |  FROM media),
      |probes AS (
      |  SELECT doc_id AS probe_id,
      |    CAST([CAST(CAST(('0x' || substr(md5(text || ':t:' || j), 1, 4)) AS BIGINT) AS DOUBLE)
      |            / 65535.0 for j in range(0, $EmbedDims)] AS REAL[]) AS temb
      |  FROM media WHERE doc_id % $EmbedProbeStride = 0),
      |scored AS (
      |  SELECT p.probe_id, e.doc_id,
      |    list_cosine_similarity(CAST(p.temb AS DOUBLE[]), CAST(e.memb AS DOUBLE[])) AS sim
      |  FROM probes p JOIN membs e ON e.doc_id != p.probe_id),
      |ranked AS (
      |  SELECT probe_id, doc_id, sim,
      |    row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, doc_id) AS rank
      |  FROM scored)
      |SELECT probe_id, rank, doc_id AS neighbor_id, round(sim, 6) AS sim
      |FROM ranked WHERE rank <= $EmbedTopK ORDER BY probe_id, rank""".stripMargin

  // --- cross-modal IVF: the retrieval scale path -------------------------
  // `mm_crossmodal_topk` is probes × corpus (the ground truth); at scale
  // the media corpus is IVF-partitioned ONCE and each text probe pays
  // only its NProbe inverted lists. The machinery is SHARED with the
  // vector family ([[VectorQueries.assignNearest]]/`probeListsFrom` —
  // one hash-agg assignment, bounded TopKAgg ranking, never a window
  // over probe×corpus rows); only the towers differ: media-tower lists,
  // text-tower probes. `mm_crossmodal_ivf_recall` grades it against the
  // brute query through the same shared recall core as every ANN path.
  def mmCrossmodalIvfTopk(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.VectorFunctions
    VectorFunctions.register(spark)
    val docs = Tables.load(spark, sfDir, "documents")
    val media = docs.select(col("doc_id").as("vec_id"), embedExpr(payload).as("embedding"))
    val cents = VectorQueries.sampledCentroids(media)
    val assigned = VectorQueries.assignNearest(media, cents)
    val probes = docs.filter(col("doc_id") % EmbedProbeStride === 0)
      .select(col("doc_id").as("probe_id"), textEmbedExpr(col("text")).as("pemb"))
    VectorQueries.probeListsFrom(probes, cents, assigned, EmbedTopK)
  }

  val mmCrossmodalIvfTopkSql: String =
    s"""WITH media AS (
      |  SELECT doc_id, text,
      |    (CASE doc_id % 4
      |       WHEN 0 THEN from_hex('89504E470D0A1A0A')
      |       WHEN 1 THEN from_hex('FFD8FFE0')
      |       WHEN 2 THEN from_hex('52494646') || encode('xxxxWAVE')
      |       ELSE encode('') END) || encode(text) AS content
      |  FROM documents),
      |membs AS MATERIALIZED (
      |  SELECT doc_id,
      |    CAST([CAST(CAST(('0x' || substr(md5(hex(content) || ':' || j), 1, 4)) AS BIGINT) AS DOUBLE)
      |            / 65535.0 for j in range(0, $EmbedDims)] AS REAL[]) AS memb
      |  FROM media),
      |cents AS (
      |  SELECT doc_id AS cent_id, memb AS cemb FROM membs
      |  WHERE doc_id % ${VectorQueries.CentroidStride} = 0),
      |assigned AS (
      |  SELECT doc_id, memb, cent_id FROM (
      |    SELECT e.doc_id, e.memb, c.cent_id,
      |      row_number() OVER (PARTITION BY e.doc_id
      |        ORDER BY list_cosine_similarity(CAST(e.memb AS DOUBLE[]), CAST(c.cemb AS DOUBLE[])) DESC, c.cent_id) AS rn
      |    FROM membs e CROSS JOIN cents c)
      |  WHERE rn = 1),
      |probes AS (
      |  SELECT doc_id AS probe_id,
      |    CAST([CAST(CAST(('0x' || substr(md5(text || ':t:' || j), 1, 4)) AS BIGINT) AS DOUBLE)
      |            / 65535.0 for j in range(0, $EmbedDims)] AS REAL[]) AS pemb
      |  FROM media WHERE doc_id % $EmbedProbeStride = 0),
      |probe_cents AS (
      |  SELECT probe_id, pemb, cent_id FROM (
      |    SELECT p.probe_id, p.pemb, c.cent_id,
      |      row_number() OVER (PARTITION BY p.probe_id
      |        ORDER BY list_cosine_similarity(CAST(p.pemb AS DOUBLE[]), CAST(c.cemb AS DOUBLE[])) DESC, c.cent_id) AS rn
      |    FROM probes p CROSS JOIN cents c)
      |  WHERE rn <= ${VectorQueries.NProbe}),
      |scored AS (
      |  SELECT pc.probe_id, a.doc_id,
      |    list_cosine_similarity(CAST(pc.pemb AS DOUBLE[]), CAST(a.memb AS DOUBLE[])) AS sim
      |  FROM probe_cents pc JOIN assigned a ON a.cent_id = pc.cent_id
      |  WHERE a.doc_id != pc.probe_id),
      |ranked AS (
      |  SELECT probe_id, doc_id, sim,
      |    row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, doc_id) AS rank
      |  FROM scored)
      |SELECT probe_id, rank, doc_id AS neighbor_id, round(sim, 6) AS sim
      |FROM ranked WHERE rank <= $EmbedTopK ORDER BY probe_id, rank""".stripMargin

  // Build/query split for the cross-modal path — the `vec_ivf_topk_cached`
  // recipe on the media tower: the N×C media-tower assignment (the
  // expensive leg: every corpus payload embedded and scored against
  // every centroid) is built ONCE per corpus and persisted as the
  // inverted-list table; a query then pays only its probed lists plus
  // the text-tower projection of its own probes. Same result, same
  // oracle — the index is a deterministic function of the corpus.
  private val crossmodalIvfDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Build (once per sfDir) and persist the media-tower inverted-list
    * table `(vec_id, embedding, cent_id)`; returns its directory. */
  def prepareCrossmodalIvfIndex(spark: SparkSession, sfDir: String): String =
    crossmodalIvfDirs.computeIfAbsent(sfDir, { _ =>
      val dir = java.nio.file.Files.createTempDirectory("graft-mm-ivf").toString
      val docs = Tables.load(spark, sfDir, "documents")
      val media = docs.select(col("doc_id").as("vec_id"), embedExpr(payload).as("embedding"))
      VectorQueries.assignNearest(media, VectorQueries.sampledCentroids(media))
        .write.mode("overwrite").parquet(dir)
      dir
    })

  /** `mm_crossmodal_ivf_topk` over the persisted media-tower index —
    * the query-path cost (text-tower probes only; the media corpus is
    * never re-embedded). */
  def mmCrossmodalIvfTopkCached(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.VectorFunctions
    VectorFunctions.register(spark)
    val dir = prepareCrossmodalIvfIndex(spark, sfDir)
    val assigned = spark.read.parquet(dir)
    // the bounded centroid frame re-derives from the persisted lists
    // (cent_id rows carry their members' embeddings; the centroid's own
    // row is its self-assignment) — no second scan of the raw corpus
    val cents = assigned
      .filter(col("vec_id") % VectorQueries.CentroidStride === 0)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cemb"))
    val docs = Tables.load(spark, sfDir, "documents")
    // eager checkpoint: probeListsFrom reads the probe frame twice
    // (centroid routing + candidate scoring) — one strided scan and
    // one text-tower projection instead of two, and the served plan's
    // ONLY raw-table read
    val probes = docs.filter(col("doc_id") % EmbedProbeStride === 0)
      .select(col("doc_id").as("probe_id"), textEmbedExpr(col("text")).as("pemb"))
      .localCheckpoint(true)
    VectorQueries.probeListsFrom(probes, cents, assigned, EmbedTopK)
  }

  def mmCrossmodalIvfRecall(spark: SparkSession, sfDir: String): DataFrame =
    VectorQueries.recallOf(
      mmCrossmodalTopk(spark, sfDir), mmCrossmodalIvfTopk(spark, sfDir))

  val mmCrossmodalIvfRecallSql: String =
    VectorQueries.recallSqlOf(mmCrossmodalTopkSql, mmCrossmodalIvfTopkSql)

  // --- sampled-frame near-duplicate detection ---------------------------
  // Video/animation near-dup: two payloads are near-duplicates when
  // their SAMPLED FRAMES' fingerprints overlap — the frame-level
  // recall that a whole-file hash misses (re-encodes, trims). Shape is
  // the LSH-banding pattern applied to frames: explode each payload's
  // sampled frames (≤ ⌈32/stride⌉ rows per doc, bounded by the fake
  // metadata cap exactly as real frame sampling is bounded by the
  // sampler), fingerprint each frame, and generate candidate pairs ONLY
  // within a fingerprint bucket — cost ∝ Σ bucket², never all-pairs.
  // Per-pair overlap then scores an integer frame-Jaccard. The fake
  // frame fingerprint derives from the payload seed (h mod 256 — the
  // documented "content id" granularity of the fake codec) and the
  // frame index, so re-used content shares frames exactly as re-encoded
  // video would.
  private val NeardupMinShared = FrameNeardupIndex.MinShared

  def mmFrameNeardup(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    // the shared index core (also the incremental query's and the
    // streaming face's backend): the corpus is scanned ONCE into the
    // ≤⌈32/stride⌉-rows/doc checkpointed frame index, then self-joined
    val idx = FrameNeardupIndex.build(docs.select(col("doc_id"), payload.as("content")))
    val frames = idx.frames
    val counts = idx.fpsets.select(col("doc_id"), size(col("fps")).cast("long").as("nf"))
    val pairs = frames.select(col("frame_fp"), col("doc_id").as("doc_a"))
      .join(frames.select(col("frame_fp"), col("doc_id").as("doc_b")), Seq("frame_fp"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= NeardupMinShared)
    pairs
      .join(counts.select(col("doc_id").as("doc_a"), col("nf").as("fa")), Seq("doc_a"))
      .join(counts.select(col("doc_id").as("doc_b"), col("nf").as("fb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("n_shared"),
        (col("n_shared") * lit(1000000L) /
          (col("fa") + col("fb") - col("n_shared"))).cast("long").as("frame_jaccard_e6"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val mmFrameNeardupSql: String =
    s"""WITH media AS (
      |  SELECT doc_id,
      |    (CASE doc_id % 4
      |       WHEN 0 THEN from_hex('89504E470D0A1A0A')
      |       WHEN 1 THEN from_hex('FFD8FFE0')
      |       WHEN 2 THEN from_hex('52494646') || encode('xxxxWAVE')
      |       ELSE encode('') END) || encode(text) AS content
      |  FROM documents),
      |seeded AS (
      |  SELECT doc_id,
      |    CAST(('0x' || substr(md5(hex(content)), 1, 8)) AS BIGINT) AS h
      |  FROM media),
      |meta AS (
      |  SELECT doc_id, h % 256 AS cid, 1 + ((h >> 16) & 31) AS n_frames
      |  FROM seeded),
      |frames AS MATERIALIZED (
      |  SELECT doc_id,
      |    md5(CAST(cid AS VARCHAR) || ':' || CAST(frame_idx AS VARCHAR)) AS frame_fp
      |  FROM (SELECT doc_id, cid, unnest(range(0, n_frames, $FrameStride)) AS frame_idx
      |        FROM meta)),
      |counts AS MATERIALIZED (SELECT doc_id, CAST(count(*) AS BIGINT) AS nf FROM frames GROUP BY 1),
      |pairs AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    CAST(count(*) AS BIGINT) AS n_shared
      |  FROM frames a JOIN frames b
      |    ON a.frame_fp = b.frame_fp AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2 HAVING count(*) >= $NeardupMinShared)
      |SELECT p.doc_a, p.doc_b, p.n_shared,
      |  CAST(p.n_shared * 1000000 // (ca.nf + cb.nf - p.n_shared) AS BIGINT) AS frame_jaccard_e6
      |FROM pairs p
      |  JOIN counts ca ON ca.doc_id = p.doc_a
      |  JOIN counts cb ON cb.doc_id = p.doc_b
      |ORDER BY p.doc_a, p.doc_b""".stripMargin

  // --- incremental (new-batch-vs-corpus) frame near-dup ------------------
  // The continuous-ingest shape for media, mirroring dedup_incremental:
  // a NEW batch of payloads (one source, ~5% of rows) is checked against
  // the EXISTING corpus index without re-pairing the corpus against
  // itself. Built inline here because the oracle query owns no persisted
  // state — production builds [[FrameNeardupIndex]] once, `save`s it,
  // and every increment (or the streaming face) matches against the load.
  private val IncrementalSource = "src0"

  def mmFrameNeardupIncremental(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val media = docs.select(col("doc_id"), col("source"), payload.as("content"))
    val newMedia = media.filter(col("source") === IncrementalSource)
      .select(col("doc_id"), col("content"))
    val corpus = media.filter(col("source") =!= IncrementalSource)
      .select(col("doc_id"), col("content"))
    FrameNeardupIndex.matchBatch(FrameNeardupIndex.build(corpus), newMedia)
      .select(col("new_id").as("new_doc_id"), col("dup_of"),
        col("n_shared"), col("frame_jaccard_e6"))
      .orderBy(col("new_doc_id"), col("dup_of"))
  }

  val mmFrameNeardupIncrementalSql: String =
    s"""WITH media AS (
      |  SELECT doc_id, source,
      |    (CASE doc_id % 4
      |       WHEN 0 THEN from_hex('89504E470D0A1A0A')
      |       WHEN 1 THEN from_hex('FFD8FFE0')
      |       WHEN 2 THEN from_hex('52494646') || encode('xxxxWAVE')
      |       ELSE encode('') END) || encode(text) AS content
      |  FROM documents),
      |seeded AS (
      |  SELECT doc_id, source,
      |    CAST(('0x' || substr(md5(hex(content)), 1, 8)) AS BIGINT) AS h
      |  FROM media),
      |meta AS (
      |  SELECT doc_id, source, h % 256 AS cid, 1 + ((h >> 16) & 31) AS n_frames
      |  FROM seeded),
      |frames AS MATERIALIZED (
      |  SELECT doc_id, source,
      |    md5(CAST(cid AS VARCHAR) || ':' || CAST(frame_idx AS VARCHAR)) AS frame_fp
      |  FROM (SELECT doc_id, source, cid, unnest(range(0, n_frames, $FrameStride)) AS frame_idx
      |        FROM meta)),
      |counts AS MATERIALIZED (SELECT doc_id, CAST(count(*) AS BIGINT) AS nf FROM frames GROUP BY 1),
      |pairs AS (
      |  SELECT a.doc_id AS new_doc_id, b.doc_id AS dup_of,
      |    CAST(count(*) AS BIGINT) AS n_shared
      |  FROM frames a JOIN frames b ON a.frame_fp = b.frame_fp
      |  WHERE a.source = '$IncrementalSource' AND b.source != '$IncrementalSource'
      |  GROUP BY 1, 2 HAVING count(*) >= $NeardupMinShared)
      |SELECT p.new_doc_id, p.dup_of, p.n_shared,
      |  CAST(p.n_shared * 1000000 // (ca.nf + cb.nf - p.n_shared) AS BIGINT) AS frame_jaccard_e6
      |FROM pairs p
      |  JOIN counts ca ON ca.doc_id = p.new_doc_id
      |  JOIN counts cb ON cb.doc_id = p.dup_of
      |ORDER BY p.new_doc_id, p.dup_of""".stripMargin

  // --- audio fingerprint dedup -----------------------------------------
  // The image pHash recipe applied to the SECOND modality, proving the
  // codec boundary generalizes: rows are first FILTERED to audio by the
  // real magic-byte sniff (modality routing is a codegen'd prefix
  // compare, not metadata trust), then each payload's decoded samples
  // are fingerprinted by the Haitsma–Kalker-style energy-delta sign
  // hash ([[graft.multimodal.MediaOps.audioFp32]]): 32 8-sample frame
  // energies, bit i = sign(eᵢ − e₍ᵢ₊₁ mod ₃₂₎). Delta signs survive
  // gain changes — the property every published audio fingerprint keys
  // on. The fake codec's samples are the documented (seed + i) & 255
  // gradient, so the closed-form expression below IS the decode result
  // (MultimodalSpec pins codec ≡ expression bit-for-bit); a real PCM
  // decoder slots in behind audioFp32 unchanged.
  //
  // Scale shape: sniff + fingerprint are per-row projections at ingest
  // (hash at decode time, never re-decode for dedup), grouping is ONE
  // hash-agg on the 32-bit fingerprint — bounded output, no window, no
  // join. Same plan as mm_phash_dedup, different modality.
  /** Sniff-to-audio + layered energy projections + 32 delta-sign bits —
    * the ONE fingerprint derivation shared by the batch dedup, the
    * corpus index build, and the continuous probe
    * ([[graft.streaming.StreamAudioDedup]]), so stream ≡ batch holds by
    * construction. `keep` columns pass through; emits keep :+ `afp`.
    * Layered projections (the mmPhashDedup lesson): energies once over
    * named columns, then the sign bits — inlining the 8-term sums into
    * every comparison makes a codegen-hostile tree. */
  private[graft] def audioFingerprints(media: DataFrame, keep: Seq[String]): DataFrame = {
    val wav = media.filter(MediaOps.sniffMime(col("content")) === "audio/wav")
    val withSeed = wav.select(keep.map(col) :+ seed(col("content")).as("h"): _*)
    val withE = withSeed.select(keep.map(col) ++
      (0 until 32).map { i =>
        (0 until 8).map(j => pmod(col("h") + lit((8 * i + j).toLong), lit(256L)))
          .reduce(_ + _).as(s"e$i")
      }: _*)
    val afp = (0 until 32).map { i =>
      when(col(s"e$i") > col(s"e${(i + 1) % 32}"), lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    withE.select(keep.map(col) :+ afp.as("afp"): _*)
  }

  /** The corpus fingerprint index: one row per distinct audio
    * fingerprint with its canonical (min) doc — EVERY fingerprint, not
    * just duplicated ones, because a probe must also catch the first
    * re-arrival of a unique payload. Shared by the incremental query
    * and the continuous face ([[graft.streaming.StreamAudioDedup]]). */
  private[graft] def audioFingerprintIndex(corpus: DataFrame): DataFrame =
    audioFingerprints(corpus, Seq("doc_id"))
      .groupBy(col("afp")).agg(min(col("doc_id")).as("dup_of"))

  def mmAudioDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    audioFingerprints(docs.select(col("doc_id"), payload.as("content")), Seq("doc_id"))
      .groupBy(col("afp"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("canonical_doc_id"))
      .filter(col("n_docs") >= 2)
      .orderBy(col("afp"))
  }

  /** The sniff + fingerprint chain as DuckDB CTEs ending in
    * `hashed(doc_id, source, afp)` — shared by the one-shot dedup and
    * the incremental oracle so both mirror [[audioFingerprints]]'s
    * derivation exactly. */
  private val audioHashedCtes: String = {
    val energies = (0 until 32).map { i =>
      (0 until 8).map(j => s"(h + ${8 * i + j}) % 256").mkString(" + ") + s" AS e$i"
    }.mkString(",\n    ")
    val bits = (0 until 32)
      .map(i => s"CASE WHEN e$i > e${(i + 1) % 32} THEN ${1L << i} ELSE 0 END")
      .mkString(" + ")
    s"""media AS (
      |  SELECT doc_id, source,
      |    (CASE doc_id % 4
      |       WHEN 0 THEN from_hex('89504E470D0A1A0A')
      |       WHEN 1 THEN from_hex('FFD8FFE0')
      |       WHEN 2 THEN from_hex('52494646') || encode('xxxxWAVE')
      |       ELSE encode('') END) || encode(text) AS content
      |  FROM documents),
      |wav AS (
      |  SELECT doc_id, source, content FROM (SELECT doc_id, source, content, hex(content) AS hx FROM media)
      |  WHERE substr(hx, 1, 8) = '52494646' AND substr(hx, 17, 8) = '57415645'),
      |seeded AS (
      |  SELECT doc_id, source,
      |    CAST(('0x' || substr(md5(hex(content)), 1, 8)) AS BIGINT) AS h
      |  FROM wav),
      |energies AS (
      |  SELECT doc_id, source,
      |    $energies
      |  FROM seeded),
      |hashed AS MATERIALIZED (SELECT doc_id, source, $bits AS afp FROM energies)""".stripMargin
  }

  val mmAudioDedupSql: String =
    s"""WITH $audioHashedCtes
      |SELECT afp, count(*) AS n_docs, min(doc_id) AS canonical_doc_id
      |FROM hashed GROUP BY afp HAVING count(*) >= 2
      |ORDER BY afp""".stripMargin

  // --- incremental audio dedup ------------------------------------------
  // The batch oracle face of [[graft.streaming.StreamAudioDedup]]'s
  // probe, completing the modality's lifecycle (one-shot query →
  // persisted index → INCREMENTAL query → streaming face, the
  // mm_frame_neardup set): arrivals are fingerprinted and probe the
  // index built from the REST of the corpus — one per-row projection
  // per side, one hash-agg for the index, one equi-join on the 32-bit
  // fingerprint (afp is unique in the index, so each arrival emits at
  // most one row). The audio lane's incremental source is src2, not
  // the text family's src0: sources ride doc_id % 20 and the audio
  // payload rides doc_id % 4, so src0 contains NO audio rows.
  private val AudioIncrementalSource = "src2"

  def mmAudioDedupIncremental(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val media = docs.select(col("doc_id"), col("source"), payload.as("content"))
    val corpus = media.filter(col("source") =!= AudioIncrementalSource)
      .select(col("doc_id"), col("content"))
    val arrivals = media.filter(col("source") === AudioIncrementalSource)
      .select(col("doc_id"), col("content"))
    audioFingerprints(arrivals, Seq("doc_id"))
      .select(col("doc_id").as("new_doc_id"), col("afp"))
      .join(audioFingerprintIndex(corpus), Seq("afp"))
      .select(col("new_doc_id"), col("afp"), col("dup_of"))
      .orderBy(col("new_doc_id"))
  }

  val mmAudioDedupIncrementalSql: String =
    s"""WITH $audioHashedCtes,
      |idx AS (
      |  SELECT afp, min(doc_id) AS dup_of FROM hashed
      |  WHERE source != '$AudioIncrementalSource' GROUP BY afp)
      |SELECT a.doc_id AS new_doc_id, a.afp, i.dup_of
      |FROM hashed a JOIN idx i ON i.afp = a.afp
      |WHERE a.source = '$AudioIncrementalSource'
      |ORDER BY new_doc_id""".stripMargin
}
