package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorFunctions

/** Hybrid retrieval — the RAG-serving face of the curation stack: fuse a
  * LEXICAL ranking (BM25, [[CurationQueries.bm25Scored]]) with a SEMANTIC
  * ranking (cosine over the document embeddings) by reciprocal-rank
  * fusion, `rrf(d) = Σ_systems 1/(K + rank_s(d))` (Cormack et al.'s
  * parameter K=60). Documents strong in either signal surface; documents
  * present in both dominate.
  *
  * Scale shape at 100 TB:
  *   - Each ranking is the already-scale-shaped single-scan operator:
  *     BM25 is one corpus scan + one broadcast stats row; the semantic
  *     side is one embedding scan against a broadcast query vector (at
  *     scale the brute-force scan swaps for the IVF probe path —
  *     `vec_ivf_topk` — without touching the fusion logic).
  *   - Ranks are assigned AFTER each side's `ORDER BY … LIMIT k`
  *     (partial top-k per partition, merged on one reducer), so the
  *     row_number window only ever sees ≤ k rows — bounded by
  *     construction, never a window over the corpus.
  *   - The fusion itself is a full-outer join of two ≤k-row frames —
  *     broadcastable at any corpus size.
  *
  * Cross-engine float parity: rrf contributions are single IEEE
  * divisions of integer-valued doubles (1.0/(60+rank)) summed in fixed
  * operand order, then fixed-point `floor(x·2^20)` — the BM25/kmeans
  * recipe. Ranks themselves are integers, so the only doubles compared
  * across engines before ranking are the BM25 score and `cosine_sim`,
  * both already hash-green in their own oracles.
  */
object RetrievalQueries {

  private val FuseK = 50 // per-system candidate depth
  private val RrfK = 60 // standard RRF dampening constant
  private val QueryVecId = 0L // the probe document (its embedding = the query)
  private val FuseOut = 20

  def retrievalFusion(spark: SparkSession, sfDir: String): DataFrame = {
    VectorFunctions.register(spark)
    // lexical candidates: top-FuseK BM25, rank over the post-limit frame
    val lex = CurationQueries.bm25Scored(spark, sfDir)
      .filter(col("score") > 0)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(FuseK)
      .select(col("doc_id"),
        row_number().over(Window.orderBy(col("score").desc, col("doc_id"))).as("lrank"))
    // semantic candidates: cosine vs the broadcast query embedding
    val vecs = Tables.load(spark, sfDir, "embeddings")
    val query = vecs.filter(col("vec_id") === QueryVecId)
      .select(col("embedding").as("qemb"))
    val sem = vecs.filter(col("vec_id") =!= QueryVecId)
      .join(broadcast(query))
      .select(col("vec_id").as("doc_id"),
        call_function("cosine_sim", col("embedding"), col("qemb")).as("sim"))
      .orderBy(col("sim").desc, col("doc_id"))
      .limit(FuseK)
      .select(col("doc_id"),
        row_number().over(Window.orderBy(col("sim").desc, col("doc_id"))).as("srank"))
    lex.join(sem, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("lrank"), lit(0)).cast("long").as("lex_rank"),
        coalesce(col("srank"), lit(0)).cast("long").as("sem_rank"),
        // integer add, ONE cast to double, one IEEE division — mirrored
        // verbatim in the oracle (a bare 1.0/(60.0+r) would be DECIMAL
        // division in DuckDB, not IEEE)
        floor((coalesce(lit(1.0) / (lit(RrfK) + col("lrank")).cast("double"), lit(0.0)) +
          coalesce(lit(1.0) / (lit(RrfK) + col("srank")).cast("double"), lit(0.0))) *
          lit(1048576.0)).cast("long").as("rrf_fp"))
      .orderBy(col("rrf_fp").desc, col("doc_id"))
      .limit(FuseOut)
  }

  val retrievalFusionSql: String =
    s"""WITH ${CurationQueries.bm25WithClauses},
      |lexall AS (
      |  SELECT doc_id, (${CurationQueries.bm25ScoreExpr}) AS score
      |  FROM base CROSS JOIN stats),
      |lexranked AS (
      |  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS lrank
      |  FROM (SELECT doc_id, score FROM lexall WHERE score > 0
      |        ORDER BY score DESC, doc_id LIMIT $FuseK)),
      |q AS (SELECT embedding AS qemb FROM embeddings WHERE vec_id = $QueryVecId),
      |semranked AS (
      |  SELECT doc_id, row_number() OVER (ORDER BY sim DESC, doc_id) AS srank
      |  FROM (SELECT e.vec_id AS doc_id,
      |          list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
      |                                 CAST(q.qemb AS DOUBLE[])) AS sim
      |        FROM embeddings e CROSS JOIN q WHERE e.vec_id != $QueryVecId
      |        ORDER BY sim DESC, doc_id LIMIT $FuseK))
      |SELECT coalesce(l.doc_id, s.doc_id) AS doc_id,
      |  CAST(coalesce(lrank, 0) AS BIGINT) AS lex_rank,
      |  CAST(coalesce(srank, 0) AS BIGINT) AS sem_rank,
      |  CAST(floor((coalesce(1.0 / CAST($RrfK + lrank AS DOUBLE), 0.0) +
      |              coalesce(1.0 / CAST($RrfK + srank AS DOUBLE), 0.0)) * 1048576.0) AS BIGINT) AS rrf_fp
      |FROM lexranked l FULL OUTER JOIN semranked s ON l.doc_id = s.doc_id
      |ORDER BY rrf_fp DESC, doc_id LIMIT $FuseOut""".stripMargin

  // --- ANN quality evaluation -----------------------------------------
  // The eval harness every ANN deployment runs before swapping an index
  // in: per-probe recall@k and reciprocal rank of the approximate index
  // (IVF probe path) against brute-force ground truth. Ground truth is
  // the expensive side BY DESIGN — eval always runs on a bounded probe
  // SAMPLE (here the same stride probe set both vec queries use), so
  // the brute-force cost is probes × corpus scan, independent of how
  // many production queries the index will serve. Both inputs are
  // already-oracle-green top-k frames of ≤ probes×k rows; the eval
  // itself is a join + hash-agg over those bounded frames —
  // broadcastable at any corpus size.
  //
  // Float parity: recall = hits/5.0 and rr = 1.0/best are single IEEE
  // divisions of small integers — bit-identical cross-engine. nDCG's
  // 1/log2(rank+1) discounts are transcendental, so they are NOT
  // computed in either engine: both sides share the same 14-decimal
  // LITERALS (generated once on the JVM), summed through
  // DECIMAL(28,14) so merge order can't perturb the total, with one
  // final double divide by the same-literal ideal DCG.
  private val EvalK = 5 // = VectorQueries' TopK
  private val NdcgDisc: Seq[(Int, String)] = (1 to EvalK).map { r =>
    r -> BigDecimal(1.0 / (math.log(r + 1.0) / math.log(2.0)))
      .setScale(14, BigDecimal.RoundingMode.HALF_UP).toString
  }
  private val NdcgIdcg: String = NdcgDisc.map(d => BigDecimal(d._2)).sum.toString

  /** Per-row nDCG discount of an ann `rank` column — the literal table
    * as a when-chain; misses (null rank) contribute nothing. */
  private def ndcgDiscount(rank: Column): Column =
    NdcgDisc.foldLeft(lit(null).cast("double")) { case (acc, (r, d)) =>
      when(rank === r, lit(d.toDouble)).otherwise(acc)
    }

  /** The shared metric block: hits → recall, best → rr, discount sum →
    * ndcg (exact decimal route, divided once by the literal IDCG). */
  private def evalMetrics(grouped: DataFrame): DataFrame =
    grouped.select(col("*"),
      (col("hits") / lit(EvalK.toDouble)).as("recall"),
      coalesce(lit(1.0) / col("best"), lit(0.0)).as("rr"),
      round(coalesce(col("dcg").cast("double"), lit(0.0)) /
        lit(NdcgIdcg.toDouble), 9).as("ndcg"))
      .drop("best", "dcg")

  def retrievalEval(spark: SparkSession, sfDir: String): DataFrame = {
    val truth = VectorQueries.vecTopk(spark, sfDir)
      .select(col("probe_id"), col("neighbor_id"))
    val ann = VectorQueries.vecIvfTopk(spark, sfDir)
      .select(col("probe_id"), col("neighbor_id"), col("rank"))
    evalMetrics(truth
      .join(ann, Seq("probe_id", "neighbor_id"), "left")
      .groupBy(col("probe_id"))
      .agg(count(col("rank")).as("hits"), min(col("rank")).as("best"),
        sum(ndcgDiscount(col("rank"))
          .cast(org.apache.spark.sql.types.DecimalType(28, 14))).as("dcg")))
      .orderBy(col("probe_id"))
  }

  // --- index-served lexical retrieval ---------------------------------
  // BM25 top-k answered FROM the impact-ordered inverted index
  // (`text_inverted_index`'s exact shape) instead of a corpus scan —
  // the WAND-family serving path: only the QUERY TERMS' posting rows
  // (df + top-[[LexPostK]] docs by tf) are read, joined to the
  // doc-length table, scored with the same operand-ordered BM25 chain
  // `text_bm25` uses, and top-k'd. Scale shape: query cost is
  // Σ postings(query terms) + a broadcast stats row — independent of
  // corpus size; the full-scan `text_bm25` is the indexing-time /
  // batch-scoring twin. Truncated-posting semantics are the index
  // contract (a term contributes only for its impact-ordered prefix),
  // and the oracle mirrors the SAME truncation, so the hash match
  // certifies the index path scores exactly what it claims to.
  // Per-doc contribution sums route through DECIMAL(28,14): with
  // multiple query terms per doc, a float sum's merge order would
  // otherwise perturb the fixed-point score.
  private[graft] val LexTerms = Seq("spark", "merge", "window")
  private[graft] val LexPostK = 16
  private[graft] val LexTopN = 10

  def retrievalLexicalTopk(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.TopKAgg
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val docs = Tables.load(spark, sfDir, "documents")
    def toksOf = filter(split(col("text"), " "), t => t =!= "")
    val tf = docs.select(col("doc_id"), explode_outer(toksOf).as("term"))
      .filter(col("term").isNotNull)
      .groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("tf"))
    val topk = udaf(new TopKAgg(LexPostK))
    val post = tf.filter(col("term").isin(LexTerms: _*))
      .groupBy(col("term"))
      .agg(count(lit(1)).cast(DoubleType).as("df"),
        topk(col("tf").cast(DoubleType), col("doc_id")).as("pk"))
      .select(col("term"), col("df"), explode(col("pk")).as("p"))
      .select(col("term"), col("df"), col("p.id").as("doc_id"), col("p.sim").as("tf"))
    val dl = docs.select(col("doc_id"), size(toksOf).cast(DoubleType).as("dl"))
    val stats = dl.agg(count(lit(1)).cast(DoubleType).as("n"), sum(col("dl")).as("sumdl"))
    val scored = post.join(dl, Seq("doc_id")).crossJoin(broadcast(stats))
    val idf = (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))
    val contrib = idf * (col("tf") * lit(2.2)) /
      (col("tf") + lit(1.2) * (lit(1.0) - lit(0.75) +
        lit(0.75) * (col("dl") / (col("sumdl") / col("n")))))
    scored.select(col("doc_id"), contrib.cast(DecimalType(28, 14)).as("c"))
      .groupBy(col("doc_id")).agg(sum(col("c")).as("s"))
      .select(col("doc_id"),
        floor(col("s").cast(DoubleType) * lit(1048576.0)).cast("long").as("score_fp"))
      .filter(col("score_fp") > 0)
      .orderBy(col("score_fp").desc, col("doc_id"))
      .limit(LexTopN)
  }

  val retrievalLexicalTopkSql: String = {
    val terms = LexTerms.map(t => s"'$t'").mkString(", ")
    s"""WITH tf AS (
      |  SELECT tok AS term, doc_id, count(*) AS tf
      |  FROM (SELECT doc_id,
      |          unnest(list_filter(string_split(text, ' '), x -> x != '')) AS tok
      |        FROM documents)
      |  GROUP BY 1, 2),
      |seldf AS (
      |  SELECT term, count(*)::DOUBLE AS df FROM tf
      |  WHERE term IN ($terms) GROUP BY 1),
      |r AS (
      |  SELECT term, doc_id, tf,
      |    row_number() OVER (PARTITION BY term ORDER BY tf DESC, doc_id) AS rn
      |  FROM tf WHERE term IN ($terms)),
      |post AS (
      |  SELECT r.term, seldf.df, r.doc_id, CAST(r.tf AS DOUBLE) AS tf
      |  FROM r JOIN seldf USING (term) WHERE rn <= $LexPostK),
      |dlt AS (
      |  SELECT doc_id,
      |    len(list_filter(string_split(text, ' '), x -> x != ''))::DOUBLE AS dl
      |  FROM documents),
      |stats AS (SELECT count(*)::DOUBLE AS n, sum(dl) AS sumdl FROM dlt),
      |contrib AS (
      |  SELECT post.doc_id,
      |    CAST((n - df + 0.5) / (df + 0.5) * (tf * 2.2) /
      |      (tf + 1.2 * (1.0 - 0.75 + 0.75 * (dl / (sumdl / n)))) AS DECIMAL(28,14)) AS c
      |  FROM post JOIN dlt USING (doc_id) CROSS JOIN stats),
      |summed AS (
      |  SELECT doc_id,
      |    CAST(floor(CAST(sum(c) AS DOUBLE) * 1048576.0) AS BIGINT) AS score_fp
      |  FROM contrib GROUP BY doc_id)
      |SELECT doc_id, score_fp FROM summed WHERE score_fp > 0
      |ORDER BY score_fp DESC, doc_id LIMIT $LexTopN""".stripMargin
  }

  // --- index-SERVED lexical retrieval over a PERSISTED index ----------
  // The true serving path: `retrieval_lexical_topk` above recomputes tf
  // and doc lengths from the raw corpus inline (the oracle-gate form);
  // here the index is BUILT ONCE — `text_inverted_index`'s exact output
  // with each posting's doc length denormalized in, plus a one-row
  // corpus-stats table — and the query reads ONLY the query terms'
  // posting rows (parquet filter pushdown on `term`/`rank`) plus the
  // broadcast stats row. Query cost is Σ postings(query terms),
  // independent of corpus size; the documents table is never touched
  // (pinned in PlanGuaranteesSpec). Same result, same oracle — the
  // index is a deterministic function of the corpus (the
  // vec_ivf_topk_cached pattern).
  private val lexIndexDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Build (once per sfDir) and persist the serving index: `postings` =
    * inverted-index rows with doc length attached, `stats` = one row
    * `(n, sumdl)`. Returns the index directory. */
  def prepareLexIndex(spark: SparkSession, sfDir: String): String =
    lexIndexDirs.computeIfAbsent(sfDir, { _ =>
      import org.apache.spark.sql.types.DoubleType
      val dir = java.nio.file.Files.createTempDirectory("graft-lexidx").toString
      val docs = Tables.load(spark, sfDir, "documents")
      def toksOf = filter(split(col("text"), " "), t => t =!= "")
      val dl = docs.select(col("doc_id"), size(toksOf).cast(DoubleType).as("dl"))
      TextQueries.textInvertedIndex(spark, sfDir)
        .join(dl, Seq("doc_id"))
        .select(col("term"), col("df"), col("rank"), col("doc_id"),
          col("tf"), col("dl"))
        .write.mode("overwrite").parquet(s"$dir/postings")
      dl.agg(count(lit(1)).cast(DoubleType).as("n"), sum(col("dl")).as("sumdl"))
        .write.mode("overwrite").parquet(s"$dir/stats")
      dir
    })

  /** BM25 top-k answered from the persisted index — the query-path
    * cost. Scoring chain operand-for-operand identical to
    * [[retrievalLexicalTopk]] (tf/df are integer-valued doubles either
    * way), so the result and oracle are shared. */
  def retrievalLexicalTopkCached(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = prepareLexIndex(spark, sfDir)
    val post = spark.read.parquet(s"$dir/postings")
      .filter(col("term").isin(LexTerms: _*) && col("rank") <= LexPostK)
    val stats = spark.read.parquet(s"$dir/stats")
    scoreLexIndex(post, stats)
  }

  /** The shared BM25 serving core: score a `(term, df, doc_id, tf, dl)`
    * posting frame against a one-row `(n, sumdl)` stats frame —
    * operand-for-operand the [[retrievalLexicalTopk]] chain, used by
    * the persisted-index path above AND the continuously-maintained
    * index ([[graft.streaming.StreamLexicalIndex]]), so every serving
    * face scores identically by construction. */
  private[graft] def scoreLexIndex(post: DataFrame, stats: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val df = col("df").cast(DoubleType)
    val tf = col("tf").cast(DoubleType)
    val idf = (col("n") - df + lit(0.5)) / (df + lit(0.5))
    val contrib = idf * (tf * lit(2.2)) /
      (tf + lit(1.2) * (lit(1.0) - lit(0.75) +
        lit(0.75) * (col("dl") / (col("sumdl") / col("n")))))
    post.crossJoin(broadcast(stats))
      .select(col("doc_id"), contrib.cast(DecimalType(28, 14)).as("c"))
      .groupBy(col("doc_id")).agg(sum(col("c")).as("s"))
      .select(col("doc_id"),
        floor(col("s").cast(DoubleType) * lit(1048576.0)).cast("long").as("score_fp"))
      .filter(col("score_fp") > 0)
      .orderBy(col("score_fp").desc, col("doc_id"))
      .limit(LexTopN)
  }

  // --- pseudo-relevance feedback: RM1-style query expansion -----------
  // The classic two-pass retrieval trick: run the query, treat the
  // top-k docs as (pseudo-)relevant, and mine THEM for expansion terms
  // — the relevance-model weight collapses to feedback-set term
  // frequency here (uniform doc prior), which keeps every output an
  // exact integer. Query terms and stopwords are excluded (expanding a
  // query with itself or with "the" is noise).
  //
  // Scale shape: the feedback set is the bounded LexTopN result — it
  // BROADCASTS, so mining is one corpus scan with a broadcast hash
  // semi-join (no shuffle of the corpus), one (term) hash agg whose
  // input is only the feedback docs' tokens, and a TakeOrdered top-15.
  // A serving deployment would fetch the k docs by id from the doc
  // store instead of scanning; the agg/ranking shape is identical.
  private val PrfTopTerms = 15

  def retrievalPrfExpand(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val fb = retrievalLexicalTopk(spark, sfDir).select(col("doc_id"))
    def toksOf = filter(split(col("text"), " "), t => t =!= "")
    docs.join(broadcast(fb), "doc_id")
      .select(col("doc_id"), explode_outer(toksOf).as("term"))
      .filter(col("term").isNotNull)
      .filter(!col("term").isin(LexTerms: _*))
      .filter(!col("term").isin(TextQueries.stopEn: _*))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("fb_tf"), countDistinct(col("doc_id")).as("fb_df"))
      .orderBy(col("fb_tf").desc, col("term"))
      .limit(PrfTopTerms)
  }

  val retrievalPrfExpandSql: String = {
    val qTerms = LexTerms.map(t => s"'$t'").mkString(", ")
    val stops = TextQueries.stopEn.map(t => s"'$t'").mkString(", ")
    s"""WITH topdocs AS ($retrievalLexicalTopkSql),
      |fbterms AS (
      |  SELECT d.doc_id, d.tok AS term
      |  FROM (SELECT doc_id,
      |          unnest(list_filter(string_split(text, ' '), x -> x != '')) AS tok
      |        FROM documents) d
      |  JOIN topdocs USING (doc_id)
      |  WHERE d.tok NOT IN ($qTerms) AND d.tok NOT IN ($stops))
      |SELECT term, CAST(count(*) AS BIGINT) AS fb_tf,
      |  CAST(count(DISTINCT doc_id) AS BIGINT) AS fb_df
      |FROM fbterms GROUP BY term
      |ORDER BY fb_tf DESC, term LIMIT $PrfTopTerms""".stripMargin
  }

  // --- late-interaction (multi-vector) retrieval ----------------------
  // The ColBERT scoring shape: a document is MANY chunk vectors, and
  // score(q, d) = Σ_{p ∈ q.chunks} max_{c ∈ d.chunks} sim(p, c) — finer
  // than one pooled vector because each query chunk independently finds
  // its best-matching passage. Chunk "embeddings" are the same
  // deterministic md5 int stub vec_chunk_pool uses (real encoders slot
  // into the identical plumbing), and sim is an INTEGER dot product, so
  // the whole maxsim chain is exact and hash-oracle-checked.
  //
  // Scale shape: the probe's chunks broadcast (a query is a handful of
  // vectors); the corpus side is one chunk scan; maxsim is TWO hash
  // aggs — max per (doc, probe-chunk), then sum per doc — never a
  // window, and the exchange carries one row per (doc, probe-chunk).
  private val LiProbeDoc = 1L
  private val LiTopN = 10
  private val LiDims = 16 // md5 hex yields 16 byte-pairs

  private def liEmbCols(h: org.apache.spark.sql.Column): Seq[org.apache.spark.sql.Column] =
    (0 until LiDims).map(d =>
      (conv(substring(h, 2 * d + 1, 2), 16, 10).cast("long") % 16).as(s"e$d"))

  def vecLateInteraction(spark: SparkSession, sfDir: String): DataFrame = {
    val chunks = TextQueries.chunkFrame(Tables.load(spark, sfDir, "documents"))
    val emb = chunks
      .select(col("doc_id"), col("chunk_idx"), md5(col("chunk_text")).as("h"))
      .select(col("doc_id") +: col("chunk_idx") +: liEmbCols(col("h")): _*)
    val probe = emb.filter(col("doc_id") === LiProbeDoc)
      .select(col("chunk_idx").as("p_idx") +:
        (0 until LiDims).map(d => col(s"e$d").as(s"p$d")): _*)
    val dot = (0 until LiDims).foldLeft(lit(0L)) { (acc, d) =>
      acc + col(s"e$d") * col(s"p$d")
    }
    emb.filter(col("doc_id") =!= LiProbeDoc)
      .join(broadcast(probe))
      .select(col("doc_id"), col("p_idx"), dot.as("dp"))
      .groupBy(col("doc_id"), col("p_idx"))
      .agg(max(col("dp")).as("best"))
      .groupBy(col("doc_id"))
      .agg(sum(col("best")).as("li_score"))
      .orderBy(col("li_score").desc, col("doc_id"))
      .limit(LiTopN)
  }

  val vecLateInteractionSql: String = {
    val es = (0 until LiDims).map(d =>
      s"CAST(('0x' || substr(md5(chunk_text), ${2 * d + 1}, 2)) AS BIGINT) % 16 AS e$d")
      .mkString(",\n    ")
    val dot = (0 until LiDims).foldLeft("0") { (acc, d) => s"$acc + c.e$d * p.p$d" }
    val ps = (0 until LiDims).map(d => s"e$d AS p$d").mkString(", ")
    s"""WITH chunks AS (${TextQueries.textChunkBodySql}),
      |emb AS (
      |  SELECT doc_id, chunk_idx, $es
      |  FROM chunks),
      |probe AS (SELECT chunk_idx AS p_idx, $ps FROM emb WHERE doc_id = $LiProbeDoc),
      |best AS (
      |  SELECT c.doc_id, p.p_idx, max($dot) AS best
      |  FROM emb c CROSS JOIN probe p WHERE c.doc_id != $LiProbeDoc
      |  GROUP BY c.doc_id, p.p_idx)
      |SELECT doc_id, CAST(sum(best) AS BIGINT) AS li_score
      |FROM best GROUP BY doc_id ORDER BY li_score DESC, doc_id LIMIT $LiTopN""".stripMargin
  }

  /** DuckDB mirror of [[ndcgDiscount]] + the decimal sum, over `a.rank`. */
  private def ndcgSumSql: String = {
    val cases = NdcgDisc
      .map { case (r, d) => s"WHEN $r THEN CAST($d AS DECIMAL(28,14))" }
      .mkString(" ")
    s"sum(CASE a.rank $cases END)"
  }

  val retrievalEvalSql: String =
    s"""WITH truth AS (
      |  SELECT probe_id, neighbor_id FROM (${VectorQueries.vecTopkSql}) t),
      |ann0 AS (
      |  SELECT probe_id, neighbor_id, rank FROM (${VectorQueries.vecIvfTopkSql}) x),
      |per AS (
      |  SELECT t.probe_id, count(a.rank) AS hits, min(a.rank) AS best,
      |    $ndcgSumSql AS dcg
      |  FROM truth t LEFT JOIN ann0 a
      |    ON t.probe_id = a.probe_id AND t.neighbor_id = a.neighbor_id
      |  GROUP BY t.probe_id)
      |SELECT probe_id, hits, hits / $EvalK.0 AS recall,
      |  CASE WHEN best IS NULL THEN 0.0 ELSE 1.0 / best END AS rr,
      |  round(coalesce(CAST(dcg AS DOUBLE), 0.0) / $NdcgIdcg, 9) AS ndcg
      |FROM per ORDER BY probe_id""".stripMargin

  // --- multi-method ANN comparison -------------------------------------
  // The index-SELECTION harness: every candidate method scored with the
  // same per-probe recall@k / reciprocal-rank metrics against the same
  // brute-force truth, one row per (method, probe) — what an index swap
  // decision actually reads (IVF's coarse-quantizer loss vs SQ8's
  // compression loss, side by side). Truth is computed once and
  // broadcast-joined to each method's bounded top-k frame; adding a
  // method is one more union leg.
  def retrievalEvalMulti(spark: SparkSession, sfDir: String): DataFrame = {
    val truth = VectorQueries.vecTopk(spark, sfDir)
      .select(col("probe_id"), col("neighbor_id"))
      .cache() // joined once per evaluated method
    def evalOf(ann: DataFrame, method: String): DataFrame =
      evalMetrics(truth
        .join(ann.select(col("probe_id"), col("neighbor_id"), col("rank")),
          Seq("probe_id", "neighbor_id"), "left")
        .groupBy(col("probe_id"))
        .agg(count(col("rank")).as("hits"), min(col("rank")).as("best"),
          sum(ndcgDiscount(col("rank"))
            .cast(org.apache.spark.sql.types.DecimalType(28, 14))).as("dcg"))
        .select(lit(method).as("method"), col("*")))
    evalOf(VectorQueries.vecIvfTopk(spark, sfDir), "ivf")
      .unionByName(evalOf(VectorQueries.vecSqTopk(spark, sfDir), "sq8"))
      .orderBy(col("method"), col("probe_id"))
  }

  val retrievalEvalMultiSql: String = {
    def leg(annSql: String, method: String) =
      s"""SELECT '$method' AS method, probe_id, hits, hits / $EvalK.0 AS recall,
        |  CASE WHEN best IS NULL THEN 0.0 ELSE 1.0 / best END AS rr,
        |  round(coalesce(CAST(dcg AS DOUBLE), 0.0) / $NdcgIdcg, 9) AS ndcg
        |FROM (
        |  SELECT t.probe_id, count(a.rank) AS hits, min(a.rank) AS best,
        |    $ndcgSumSql AS dcg
        |  FROM truth t LEFT JOIN ($annSql) a
        |    ON t.probe_id = a.probe_id AND t.neighbor_id = a.neighbor_id
        |  GROUP BY t.probe_id)""".stripMargin
    s"""WITH truth AS (
      |  SELECT probe_id, neighbor_id FROM (${VectorQueries.vecTopkSql}) t)
      |${leg(VectorQueries.vecIvfTopkSql, "ivf")}
      |UNION ALL
      |${leg(VectorQueries.vecSqTopkSql, "sq8")}
      |ORDER BY method, probe_id""".stripMargin
  }

  // --- margin-based bitext mining (CCMatrix/LASER shape) ------------------
  // Parallel-corpus mining across a language boundary: candidate (en, de)
  // pairs are scored by the RATIO MARGIN — cos(x,y) over the mean of
  // each side's top-k neighbor similarities — so a pair is accepted
  // only when x and y are closer to EACH OTHER than to their average
  // nearest neighbors (margin ≥ 1). Raw cosine can't do this: in any
  // real embedding space some regions are dense (every pair scores
  // high), and the margin normalizes that density away. The labeled
  // `lang` column plays the upstream language gate; the md5 fake plays
  // the multilingual encoder (both sides embedded by ONE function —
  // the cross-lingual-space contract).
  //
  // Scale shape: the forward pass broadcasts the (strided, bounded)
  // probe side into ONE scan of the other language; the backward
  // averages touch only the ≤ probes×k candidate set, broadcast into
  // ONE scan of the probe language; both rankings run through the
  // bounded partial-merge TopKAgg — no window ever sees a corpus. At
  // 100 TB the forward brute leg swaps for the IVF probe path
  // (`vec_ivf_topk`'s inverted lists over the de side) without touching
  // the margin logic. Both top-k means are fixed-operand-order sums
  // ((s1+s2+s3)/3, rank order), so Spark and DuckDB compute the margin
  // through identical IEEE chains.
  private[graft] val MineK = 3
  private val MineAStride = 10
  private val MineMargin = 1.0 // accept iff closer than your average NN

  private[graft] def bitextEmb(text: Column): Column =
    transform(sequence(lit(0), lit(15)),
      j => (conv(substring(md5(concat(text, lit(":b:"), j.cast("string"))), 1, 4), 16, 10)
        .cast("double") / lit(65535.0)).cast("float"))

  /** Rank-ordered top-k mean, fixed operand order ((s1+s2)+s3)/3 — the
    * engine-portable margin denominator, shared with the continuous
    * index face (`graft.streaming.StreamBitextIndex`). `try_element_at`
    * (not ANSI `element_at`, which throws on a missing rank): an
    * under-full top-k — a corpus smaller than MineK — yields a NULL
    * mean, the documented undefined-margin bootstrap region, instead
    * of failing the whole mining job. */
  private[graft] def topkAvg(nn: Column): Column =
    (0 until MineK).map(i => try_element_at(nn, lit(i + 1)).getField("sim"))
      .reduce(_ + _) / lit(MineK.toDouble)

  /** Forward pass: each probe's top-k candidates in `de` plus the
    * forward average — (a_id, avg_a, rank, b_id, sim). */
  private[graft] def forwardPairs(probes: DataFrame, de: DataFrame): DataFrame = {
    import graft.functions.TopKAgg
    val topk = udaf(new TopKAgg(MineK))
    de.join(broadcast(probes))
      .select(col("a_id"),
        call_function("cosine_sim", col("ea"), col("eb")).as("sim"),
        col("b_id").as("id"))
      .groupBy(col("a_id")).agg(topk(col("sim"), col("id")).as("nn"))
      .select(col("a_id"), topkAvg(col("nn")).as("avg_a"),
        posexplode(col("nn")).as(Seq("pos", "n")))
      .select(col("a_id"), col("avg_a"), (col("pos") + 1).cast("int").as("rank"),
        col("n.id").as("b_id"), col("n.sim").as("sim"))
  }

  /** Margin scoring over a forward-pairs frame and a (b_id, avg_b)
    * frame — the final mile shared by the one-shot query and the
    * index-serving path. */
  private[graft] def marginFrame(fwdPairs: DataFrame, avgB: DataFrame): DataFrame = {
    val margin = col("sim") / ((col("avg_a") + col("avg_b")) / lit(2.0))
    fwdPairs.join(avgB, Seq("b_id"))
      .select(col("a_id"), col("b_id"), col("rank"),
        round(margin, 6).as("margin"),
        when(margin >= MineMargin, lit(1)).otherwise(lit(0)).as("accept"))
      .orderBy(col("a_id"), col("rank"))
  }

  /** The full mining core over explicit language frames — the one-shot
    * query calls it with loaded tables; specs call it with fixtures to
    * pin index-serving ≡ batch.
    *
    * BOOTSTRAP PRECONDITION: margins are defined only when `de` has at
    * least [[MineK]] rows — `topkAvg`'s fixed k-term operand chain (the
    * cross-engine IEEE contract) has no value on an under-full top-k,
    * so a smaller corpus yields forward pairs with NULL margins here
    * and NO rows from `StreamBitextIndex.serve` (which filters to full
    * lists rather than serve NULL margins). Divergence pinned in
    * `StreamBitextIndexSpec`. */
  private[graft] def mineCore(en: DataFrame, de: DataFrame, probes: DataFrame): DataFrame = {
    val fwdPairs = forwardPairs(probes, de)
    marginFrame(fwdPairs, backwardAvg(en, de, fwdPairs))
  }

  /** Backward averages for the candidate de docs a forward pass
    * surfaced: ≤ probes × k candidates broadcast into ONE en scan —
    * shared by the exact and IVF mining faces (the backward leg is
    * already candidate-bounded, so it never needs an index). */
  private[graft] def backwardAvg(en: DataFrame, de: DataFrame,
      fwdPairs: DataFrame): DataFrame = {
    import graft.functions.TopKAgg
    val topk = udaf(new TopKAgg(MineK))
    val ys = fwdPairs.select(col("b_id")).distinct()
    en.join(broadcast(de.join(broadcast(ys), Seq("b_id"))))
      .select(col("b_id"),
        call_function("cosine_sim", col("eb"), col("ea")).as("sim"),
        col("a_id").as("id"))
      .groupBy(col("b_id")).agg(topk(col("sim"), col("id")).as("nn"))
      .select(col("b_id"), topkAvg(col("nn")).as("avg_b"))
  }

  /** Both language sides embedded and checkpointed — each frame feeds
    * the forward and backward passes; eager localCheckpoint = ONE corpus
    * scan per language (in production the embeddings are a precomputed
    * table anyway — the checkpoint stands in for reading it). Shared by
    * the exact face, the IVF face, and the recall row (which runs BOTH
    * faces and would otherwise re-embed each side twice). */
  private def bitextFrames(spark: SparkSession, sfDir: String): (DataFrame, DataFrame) = {
    val docs = Tables.load(spark, sfDir, "documents")
    val en = docs.filter(col("lang") === "en")
      .select(col("doc_id").as("a_id"), bitextEmb(col("text")).as("ea"))
      .localCheckpoint(true)
    val de = docs.filter(col("lang") === "de")
      .select(col("doc_id").as("b_id"), bitextEmb(col("text")).as("eb"))
      .localCheckpoint(true)
    (en, de)
  }

  def retrievalBitextMine(spark: SparkSession, sfDir: String): DataFrame = {
    VectorFunctions.register(spark)
    val (en, de) = bitextFrames(spark, sfDir)
    mineCore(en, de, en.filter(col("a_id") % MineAStride === 0))
  }

  val retrievalBitextMineSql: String = {
    val avgSql: String =
      (1 to MineK).map(i => s"max(CASE WHEN rn = $i THEN sim END)").mkString("(", " + ", s") / $MineK.0")
    s"""WITH embs AS MATERIALIZED (
      |  SELECT doc_id, lang,
      |    CAST([CAST(CAST(('0x' || substr(md5(text || ':b:' || j), 1, 4)) AS BIGINT) AS DOUBLE)
      |            / 65535.0 for j in range(0, 16)] AS REAL[]) AS e
      |  FROM documents WHERE lang IN ('en', 'de')),
      |a AS (SELECT doc_id AS a_id, e AS ea FROM embs WHERE lang = 'en'),
      |b AS (SELECT doc_id AS b_id, e AS eb FROM embs WHERE lang = 'de'),
      |probes AS (SELECT * FROM a WHERE a_id % $MineAStride = 0),
      |fwd AS MATERIALIZED (
      |  SELECT a_id, b_id, sim, rn FROM (
      |    SELECT p.a_id, b.b_id,
      |      list_cosine_similarity(CAST(p.ea AS DOUBLE[]), CAST(b.eb AS DOUBLE[])) AS sim,
      |      row_number() OVER (PARTITION BY p.a_id
      |        ORDER BY list_cosine_similarity(CAST(p.ea AS DOUBLE[]), CAST(b.eb AS DOUBLE[])) DESC, b.b_id) AS rn
      |    FROM probes p CROSS JOIN b)
      |  WHERE rn <= $MineK),
      |avga AS (SELECT a_id, $avgSql AS avg_a FROM fwd GROUP BY 1),
      |bwd AS (
      |  SELECT b_id, sim, rn FROM (
      |    SELECT yb.b_id, aa.a_id,
      |      list_cosine_similarity(CAST(yb.eb AS DOUBLE[]), CAST(aa.ea AS DOUBLE[])) AS sim,
      |      row_number() OVER (PARTITION BY yb.b_id
      |        ORDER BY list_cosine_similarity(CAST(yb.eb AS DOUBLE[]), CAST(aa.ea AS DOUBLE[])) DESC, aa.a_id) AS rn
      |    FROM (SELECT DISTINCT f.b_id, bb.eb FROM fwd f JOIN b bb USING (b_id)) yb
      |    CROSS JOIN a aa)
      |  WHERE rn <= $MineK),
      |avgb AS (SELECT b_id, $avgSql AS avg_b FROM bwd GROUP BY 1)
      |SELECT f.a_id, f.b_id, CAST(f.rn AS INT) AS rank,
      |  round(f.sim / ((avga.avg_a + avgb.avg_b) / 2.0), 6) AS margin,
      |  CAST(CASE WHEN f.sim / ((avga.avg_a + avgb.avg_b) / 2.0) >= $MineMargin
      |    THEN 1 ELSE 0 END AS INT) AS accept
      |FROM fwd f JOIN avga USING (a_id) JOIN avgb USING (b_id)
      |ORDER BY a_id, rank""".stripMargin
  }

  // --- bitext mining, IVF forward leg -------------------------------------
  // The 100 TB form of the forward pass, previously only narrated: the
  // GROWING language side is IVF-partitioned once (the vec_ivf_topk
  // recipe — sampled coarse centroids + one assignment scan), and each
  // en probe scores only its NProbe inverted lists instead of the whole
  // de corpus. The backward leg stays EXACT ([[backwardAvg]]) — it is
  // already bounded by the ≤ probes × k candidates the forward pass
  // surfaced, so it never needs an index. Margin math, tie-breaks, and
  // the fixed-operand-order top-k mean are all shared with the exact
  // face; probes whose probed lists can't fill a MineK top-k are
  // DROPPED (the StreamBitextIndex.serve bootstrap rule: no NULL
  // margins served), and the oracle mirrors the drop via HAVING.
  /** Forward pass over probed inverted lists: (a_id, avg_a, rank, b_id,
    * sim) for every probe whose lists fill a MineK top-k. */
  private[graft] def forwardPairsIvf(probes: DataFrame, cents: DataFrame,
      assigned: DataFrame): DataFrame = {
    import graft.functions.TopKAgg
    val topk = udaf(new TopKAgg(MineK))
    // the vec family's shared routing block, on the cross-language tower
    val probeCents = VectorQueries
      .routeProbes(probes, cents, "a_id", "ea", VectorQueries.NProbe)
      .drop("cent_rank")
    probeCents.join(assigned, Seq("cent_id"))
      .select(col("a_id"),
        call_function("cosine_sim", col("ea"), col("embedding")).as("sim"),
        col("vec_id").as("id"))
      .groupBy(col("a_id")).agg(topk(col("sim"), col("id")).as("nn"))
      .filter(size(col("nn")) >= MineK)
      .select(col("a_id"), topkAvg(col("nn")).as("avg_a"),
        posexplode(col("nn")).as(Seq("pos", "n")))
      .select(col("a_id"), col("avg_a"), (col("pos") + 1).cast("int").as("rank"),
        col("n.id").as("b_id"), col("n.sim").as("sim"))
  }

  def retrievalBitextMineIvf(spark: SparkSession, sfDir: String): DataFrame = {
    VectorFunctions.register(spark)
    val (en, de) = bitextFrames(spark, sfDir)
    mineIvfCore(en, de)
  }

  /** The IVF mining face over already-embedded language frames — split
    * out so the recall row can run both faces on ONE pair of embedded
    * checkpoints. */
  private def mineIvfCore(en: DataFrame, de: DataFrame): DataFrame = {
    val probes = en.filter(col("a_id") % MineAStride === 0)
    // the growing side's one-time index: sampled coarse quantizer +
    // one assignment scan (persistable exactly like prepareIvfIndex)
    val cents = de.filter(col("b_id") % VectorQueries.CentroidStride === 0)
      .select(col("b_id").as("cent_id"), col("eb").as("cemb"))
    val assigned = VectorQueries.assignNearest(
      de.select(col("b_id").as("vec_id"), col("eb").as("embedding")), cents)
    val fwdPairs = forwardPairsIvf(probes, cents, assigned)
      // read by the margin join AND the backward candidates; lazy — the
      // backward leg's broadcast subquery materializes it first
      .localCheckpoint(false)
    marginFrame(fwdPairs, backwardAvg(en, de, fwdPairs))
  }

  val retrievalBitextMineIvfSql: String = {
    val avgSql: String =
      (1 to MineK).map(i => s"max(CASE WHEN rn = $i THEN sim END)").mkString("(", " + ", s") / $MineK.0")
    s"""WITH embs AS MATERIALIZED (
      |  SELECT doc_id, lang,
      |    CAST([CAST(CAST(('0x' || substr(md5(text || ':b:' || j), 1, 4)) AS BIGINT) AS DOUBLE)
      |            / 65535.0 for j in range(0, 16)] AS REAL[]) AS e
      |  FROM documents WHERE lang IN ('en', 'de')),
      |a AS (SELECT doc_id AS a_id, e AS ea FROM embs WHERE lang = 'en'),
      |b AS (SELECT doc_id AS b_id, e AS eb FROM embs WHERE lang = 'de'),
      |mprobes AS (SELECT * FROM a WHERE a_id % $MineAStride = 0),
      |mcents AS (SELECT b_id AS cent_id, eb AS cemb FROM b
      |  WHERE b_id % ${VectorQueries.CentroidStride} = 0),
      |massigned AS MATERIALIZED (
      |  SELECT b_id, eb, cent_id FROM (
      |    SELECT bb.b_id, bb.eb, c.cent_id,
      |      row_number() OVER (PARTITION BY bb.b_id
      |        ORDER BY list_cosine_similarity(CAST(bb.eb AS DOUBLE[]), CAST(c.cemb AS DOUBLE[])) DESC, c.cent_id) AS rn
      |    FROM b bb CROSS JOIN mcents c)
      |  WHERE rn = 1),
      |mprobe_cents AS (
      |  SELECT a_id, ea, cent_id FROM (
      |    SELECT p.a_id, p.ea, c.cent_id,
      |      row_number() OVER (PARTITION BY p.a_id
      |        ORDER BY list_cosine_similarity(CAST(p.ea AS DOUBLE[]), CAST(c.cemb AS DOUBLE[])) DESC, c.cent_id) AS rn
      |    FROM mprobes p CROSS JOIN mcents c)
      |  WHERE rn <= ${VectorQueries.NProbe}),
      |fwd AS MATERIALIZED (
      |  SELECT a_id, b_id, sim, rn FROM (
      |    SELECT pc.a_id, s.b_id,
      |      list_cosine_similarity(CAST(pc.ea AS DOUBLE[]), CAST(s.eb AS DOUBLE[])) AS sim,
      |      row_number() OVER (PARTITION BY pc.a_id
      |        ORDER BY list_cosine_similarity(CAST(pc.ea AS DOUBLE[]), CAST(s.eb AS DOUBLE[])) DESC, s.b_id) AS rn
      |    FROM mprobe_cents pc JOIN massigned s ON s.cent_id = pc.cent_id)
      |  WHERE rn <= $MineK),
      |avga AS MATERIALIZED (SELECT a_id, $avgSql AS avg_a FROM fwd GROUP BY 1 HAVING count(*) >= $MineK),
      |bwd AS (
      |  SELECT b_id, sim, rn FROM (
      |    SELECT yb.b_id, aa.a_id,
      |      list_cosine_similarity(CAST(yb.eb AS DOUBLE[]), CAST(aa.ea AS DOUBLE[])) AS sim,
      |      row_number() OVER (PARTITION BY yb.b_id
      |        ORDER BY list_cosine_similarity(CAST(yb.eb AS DOUBLE[]), CAST(aa.ea AS DOUBLE[])) DESC, aa.a_id) AS rn
      |    FROM (SELECT DISTINCT f.b_id, bb.eb FROM fwd f
      |          JOIN avga USING (a_id) JOIN b bb USING (b_id)) yb
      |    CROSS JOIN a aa)
      |  WHERE rn <= $MineK),
      |avgb AS (SELECT b_id, $avgSql AS avg_b FROM bwd GROUP BY 1)
      |SELECT f.a_id, f.b_id, CAST(f.rn AS INT) AS rank,
      |  round(f.sim / ((avga.avg_a + avgb.avg_b) / 2.0), 6) AS margin,
      |  CAST(CASE WHEN f.sim / ((avga.avg_a + avgb.avg_b) / 2.0) >= $MineMargin
      |    THEN 1 ELSE 0 END AS INT) AS accept
      |FROM fwd f JOIN avga USING (a_id) JOIN avgb USING (b_id)
      |ORDER BY a_id, rank""".stripMargin
  }

  // Accepted-pair recall of the IVF leg vs the exact face, as ONE
  // oracle row — the price of pruning, measured by the engine that
  // serves (the vec_*_recall discipline applied to mining): both faces
  // run, accepted (a,b) pairs intersect through one keyed join, and
  // the single integer row is hash-gated cross-engine every round.
  def retrievalBitextIvfRecall(spark: SparkSession, sfDir: String): DataFrame = {
    VectorFunctions.register(spark)
    // embed each language side ONCE and run both faces on the shared
    // checkpoints — calling the two public queries would re-scan the
    // corpus and recompute both embedding projections a second time
    val (en, de) = bitextFrames(spark, sfDir)
    val exact = mineCore(en, de, en.filter(col("a_id") % MineAStride === 0))
      .filter(col("accept") === 1).select(col("a_id"), col("b_id"))
      // lazy: the broadcast `common`/count subqueries run first and
      // materialize both faces before the main plan streams them
      .localCheckpoint(false) // read by the intersect and its own count
    val ivf = mineIvfCore(en, de)
      .filter(col("accept") === 1).select(col("a_id"), col("b_id"))
      .localCheckpoint(false)
    val common = exact.join(ivf, Seq("a_id", "b_id"))
      .agg(count(lit(1)).as("n_common"))
    exact.agg(count(lit(1)).as("n_exact"))
      .crossJoin(broadcast(ivf.agg(count(lit(1)).as("n_ivf"))))
      .crossJoin(broadcast(common))
      .select(col("n_exact"), col("n_ivf"), col("n_common"),
        expr("CASE WHEN n_exact = 0 THEN 0 ELSE n_common * 1000000 div n_exact END")
          .as("recall_e6"))
  }

  val retrievalBitextIvfRecallSql: String =
    s"""WITH ex AS MATERIALIZED (
      |  SELECT a_id, b_id FROM ($retrievalBitextMineSql) WHERE accept = 1),
      |iv AS MATERIALIZED (
      |  SELECT a_id, b_id FROM ($retrievalBitextMineIvfSql) WHERE accept = 1),
      |c AS (SELECT CAST(count(*) AS BIGINT) AS n_common
      |  FROM ex JOIN iv USING (a_id, b_id)),
      |e AS (SELECT CAST(count(*) AS BIGINT) AS n_exact FROM ex),
      |i AS (SELECT CAST(count(*) AS BIGINT) AS n_ivf FROM iv)
      |SELECT e.n_exact, i.n_ivf, c.n_common,
      |  CAST(CASE WHEN e.n_exact = 0 THEN 0
      |    ELSE c.n_common * 1000000 // e.n_exact END AS BIGINT) AS recall_e6
      |FROM e CROSS JOIN i CROSS JOIN c""".stripMargin
}
