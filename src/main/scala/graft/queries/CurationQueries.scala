package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Corpus-curation operators — the steps between "deduplicated documents"
  * and "training shards" in an LLM data pipeline: benchmark
  * decontamination, relevance scoring, canonical-corpus selection, and
  * sequence packing. All DataFrame-declarative; the one driver-side loop
  * (cluster propagation) is inherited from [[DedupQueries.dedupClusters]].
  *
  * Cross-engine float parity: scores avoid transcendentals entirely
  * (rational idf instead of log) so every arithmetic step is an IEEE
  * op with identical operand order in Spark and DuckDB, then fixed-point
  * `floor(x * 2^20)` for the hashed output — the vec_ivf_kmeans recipe.
  */
object CurationQueries {

  private def toks(c: Column): Column = filter(split(c, " "), t => t =!= "")

  // --- benchmark decontamination ---------------------------------------
  // GPT-3-style test-set decontamination: flag training documents that
  // share any n-gram with a benchmark/eval set. n is corpus-relative
  // (13 for web scale; 3 here so the small-vocab fixtures actually
  // collide). The benchmark split is a deterministic doc_id slice
  // standing in for "the eval sets".
  private val DecontamN = 3
  private val BenchMod = 25

  /** Scale shape: benchmark gram sets are tiny next to a 100 TB corpus
    * (eval suites are fixed-size), so the gram join BROADCASTS the
    * benchmark side — the corpus is scanned once, shuffle-free, and
    * per-doc gram explosion happens executor-side after the scan. */
  def textDecontaminate(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), toks(col("text")).as("tk"))
      .filter(size(col("tk")) >= DecontamN)
      .select(col("doc_id"), array_distinct(expr(
        s"transform(sequence(0, size(tk) - $DecontamN), i -> " +
          s"concat_ws(' ', ${(0 until DecontamN).map(j => s"tk[i + $j]").mkString(", ")}))"))
        .as("t"))
    // explode_outer, NOT explode: for a plain explode the optimizer
    // infers a `size(t) > 0` pre-filter and pushes it below the gram
    // projection, where alias substitution inlines the token split into
    // every tk[i] access — re-splitting each document O(grams×n) times
    // just to evaluate the inferred filter (measured 12→1 s at sf0.1).
    // No inference happens for outer generate; `size(tk) >= n` already
    // guarantees ≥1 gram, so the null-row filter is a no-op semantically.
    val bench = docs.filter(col("doc_id") % BenchMod === 0)
      .select(explode_outer(col("t")).as("g"))
      .filter(col("g").isNotNull).distinct()
    docs.filter(col("doc_id") % BenchMod =!= 0)
      .select(col("doc_id"), explode_outer(col("t")).as("g"))
      .filter(col("g").isNotNull)
      .join(broadcast(bench), Seq("g"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("hits"))
      .orderBy(col("doc_id"))
  }

  val textDecontaminateSql: String =
    s"""WITH d AS (
      |  SELECT doc_id,
      |    list_distinct([array_to_string(toks[i:i+${DecontamN - 1}], ' ')
      |                   for i in range(1, len(toks) - ${DecontamN - 2})]) AS t
      |  FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS toks
      |        FROM documents)
      |  WHERE len(toks) >= $DecontamN),
      |bench AS (SELECT DISTINCT unnest(t) AS g FROM d WHERE doc_id % $BenchMod = 0),
      |train AS (SELECT doc_id, unnest(t) AS g FROM d WHERE doc_id % $BenchMod != 0)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS hits
      |FROM train JOIN bench USING (g)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // --- FUZZY benchmark decontamination (MinHash-LSH) -------------------
  // Verbatim n-gram overlap ([[textDecontaminate]]) misses lightly
  // paraphrased/reformatted test material; the published fix (GPT-4,
  // Llama-style decontamination) is near-duplicate matching between the
  // training corpus and the eval sets. Same benchmark slice as the exact
  // query; detection is the repo's MinHash-LSH core ([[NearDupIndex]])
  // with the TRAIN side as the indexed "corpus" and the (tiny, fixed-
  // size) benchmark as the broadcast batch — the corpus is scanned once,
  // shuffle-keyed only by its own band keys, so at 100 TB this costs one
  // corpus pass + candidate verifies, exactly like `dedup_incremental`.
  def textDecontaminateFuzzy(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val bench = docs.filter(col("doc_id") % BenchMod === 0)
    val train = docs.filter(col("doc_id") % BenchMod =!= 0)
    NearDupIndex.matchBatch(NearDupIndex.build(train), bench)
      // one row per CONTAMINATED TRAIN doc: its best benchmark match
      // (max jaccard, ties to the lowest bench id) via one hash-agg
      .groupBy(col("dup_of"))
      .agg(max(struct(col("jaccard"), (-col("new_id")).as("nid"))).as("best"))
      .select(col("dup_of").as("doc_id"), (-col("best.nid")).as("bench_id"),
        col("best.jaccard").as("jaccard"))
      .orderBy(col("doc_id"))
  }

  val textDecontaminateFuzzySql: String = {
    import DedupQueries.{minhashBandsCte, MinhashBucketCap}
    // shares the shingle→sig→bands→hsets prefix with the LSH oracles
    // (DedupQueries.minhashBandsCte) — only the capped/cand tail differs:
    // the cap sits on the CORPUS side and candidates come from the
    // batch-vs-corpus band join, mirroring NearDupIndex build/matchBatch
    s"""WITH $minhashBandsCte,
      |batch AS (SELECT b.* FROM bands b WHERE b.doc_id % $BenchMod = 0),
      |corpus AS (SELECT b.* FROM bands b WHERE b.doc_id % $BenchMod != 0),
      |capped AS (
      |  SELECT doc_id, band, bkey FROM (
      |    SELECT *, count(*) OVER (PARTITION BY band, bkey) AS bsz FROM corpus)
      |  WHERE bsz <= $MinhashBucketCap),
      |cand AS (
      |  SELECT DISTINCT batch.doc_id AS new_id, c.doc_id AS dup_of
      |  FROM batch JOIN capped c ON batch.band = c.band AND batch.bkey = c.bkey),
      |verified AS (
      |  SELECT new_id, dup_of, jaccard FROM (
      |    SELECT new_id, dup_of,
      |      len(list_intersect(a.hs, b.hs))::DOUBLE
      |        / (len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs))) AS jaccard
      |    FROM cand JOIN hsets a ON cand.new_id = a.doc_id JOIN hsets b ON cand.dup_of = b.doc_id)
      |  WHERE jaccard >= 0.5)
      |SELECT dup_of AS doc_id, new_id AS bench_id, jaccard FROM (
      |  SELECT *, row_number() OVER (PARTITION BY dup_of ORDER BY jaccard DESC, new_id) AS rn
      |  FROM verified)
      |WHERE rn = 1 ORDER BY doc_id""".stripMargin
  }

  // --- BM25 relevance scoring ------------------------------------------
  // Okapi BM25 with k1=1.2, b=0.75 over a fixed query, with a RATIONAL
  // idf (N - df + 0.5)/(df + 0.5) instead of its log: same per-term
  // monotonicity, zero transcendentals, so Spark and DuckDB compute
  // bit-identical doubles. Score emitted as floor(x * 2^20) fixed-point.
  private val Bm25Terms = Seq("spark", "merge", "window")
  private val Bm25K1 = "1.2"
  private val Bm25B = "0.75"

  /** Raw BM25 doubles, (doc_id, score) — the shared lexical-relevance
    * core consumed by [[textBm25]] (fixed-point top-20) and
    * [[RetrievalQueries.retrievalFusion]] (rank fusion). Exact operand
    * order is mirrored in BOTH consumers' oracles, so the double is
    * cross-engine bit-identical. */
  private[queries] def bm25Scored(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id") +: toks(col("text")).as("tk") +: Bm25Terms.zipWithIndex.map {
        case (t, i) => size(filter(toks(col("text")), x => x === t)).as(s"tf$i")
      }: _*)
      .withColumn("dl", size(col("tk")).cast("double"))
      .drop("tk")
    val stats = base.agg(
      count(lit(1)).cast("double").as("n"),
      sum(col("dl")).cast("double").as("sumdl") +:
        Bm25Terms.indices.map(i =>
          sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).cast("double").as(s"df$i")): _*)
    val scored = base.crossJoin(broadcast(stats))
    // per-term contribution, operand order mirrored EXACTLY in the oracle
    val contrib = Bm25Terms.indices.map { i =>
      val tf = col(s"tf$i").cast("double")
      val idf = (col("n") - col(s"df$i") + lit(0.5)) / (col(s"df$i") + lit(0.5))
      idf * (tf * lit(2.2)) /
        (tf + lit(Bm25K1.toDouble) * (lit(1.0) - lit(Bm25B.toDouble) +
          lit(Bm25B.toDouble) * (col("dl") / (col("sumdl") / col("n")))))
    }
    scored.select(col("doc_id"), contrib.reduce(_ + _).as("score"))
  }

  /** Scale shape: per-doc tf/len are per-row expressions; the corpus
    * stats (N, avgdl, per-term df) are ONE aggregate row broadcast back
    * over the corpus — two scans total, no shuffle beyond the scalar
    * agg, top-k via ORDER BY LIMIT (partial top-k per partition). */
  def textBm25(spark: SparkSession, sfDir: String): DataFrame =
    bm25Scored(spark, sfDir)
      .select(col("doc_id"),
        floor(col("score") * lit(1048576.0)).cast("long").as("score_fp"))
      .filter(col("score_fp") > 0)
      .orderBy(col("score_fp").desc, col("doc_id"))
      .limit(20)

  /** The bm25 WITH-clause prefix (`base`, `stats`) and the per-doc score
    * expression — shared between [[textBm25Sql]] and the retrieval-fusion
    * oracle so both mirror [[bm25Scored]]'s arithmetic verbatim. */
  private[queries] val bm25WithClauses: String = {
    val tfDefs = Bm25Terms.zipWithIndex.map { case (t, i) =>
      s"len(list_filter(toks, x -> x = '$t'))::DOUBLE AS tf$i"
    }.mkString(",\n      |    ")
    val dfDefs = Bm25Terms.indices.map(i =>
      s"sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END)::DOUBLE AS df$i").mkString(", ")
    s"""base AS (
      |  SELECT doc_id,
      |    $tfDefs,
      |    len(toks)::DOUBLE AS dl
      |  FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS toks
      |        FROM documents)),
      |stats AS (
      |  SELECT count(*)::DOUBLE AS n, sum(dl)::DOUBLE AS sumdl, $dfDefs FROM base)""".stripMargin
  }

  private[queries] val bm25ScoreExpr: String =
    Bm25Terms.indices.map(i =>
      s"((n - df$i + 0.5) / (df$i + 0.5)) * (tf$i * 2.2) / " +
        s"(tf$i + $Bm25K1 * (1.0 - $Bm25B + $Bm25B * (dl / (sumdl / n))))")
      .mkString("\n    + ")

  val textBm25Sql: String =
    s"""WITH $bm25WithClauses
      |SELECT doc_id, score_fp FROM (
      |  SELECT doc_id, CAST(floor((
      |    $bm25ScoreExpr
      |  ) * 1048576.0) AS BIGINT) AS score_fp
      |  FROM base CROSS JOIN stats)
      |WHERE score_fp > 0
      |ORDER BY score_fp DESC, doc_id LIMIT 20""".stripMargin

  // --- canonical corpus after near-dup clustering ------------------------
  /** The curation payoff of the dedup family: one representative per
    * near-dup cluster (the min-id member, [[DedupQueries.dedupClusters]])
    * plus every unclustered doc. In production the cluster labels are
    * computed once and PERSISTED; recomputing them inline here keeps the
    * query self-contained for the oracle gate. The final step is an
    * anti-join against the (tiny relative to corpus) non-representative
    * set — broadcast-sized at any scale where dup rate is sane. */
  def corpusCanonical(spark: SparkSession, sfDir: String): DataFrame =
    corpusCanonicalFromLabels(
      Tables.load(spark, sfDir, "documents"),
      DedupQueries.dedupClusters(spark, sfDir))

  /** The REAL canonical operator, separated from label production:
    * `labels` is a `(doc_id, cluster_id)` frame — persisted by the dedup
    * job in production — and the operator is just one corpus scan plus an
    * anti-join against the demoted ids. This is what
    * `corpus_canonical_cached` benches: labels from a temp table, no
    * inline minhash/propagation recompute. */
  def corpusCanonicalFromLabels(docs: DataFrame, labels: DataFrame): DataFrame = {
    val demoted = labels
      .filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id"))
    docs
      .join(demoted, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  /** One-time per-corpus label materialization (the production "dedup
    * job writes its labels" step) — memoized per sfDir so Verify/Bench
    * measure the canonical OPERATOR, not a label recompute. */
  private val labelDirs = new java.util.concurrent.ConcurrentHashMap[String, String]()

  def prepareCanonicalLabels(spark: SparkSession, sfDir: String): String =
    labelDirs.computeIfAbsent(sfDir, { _ =>
      val dir = java.nio.file.Files.createTempDirectory("graft-labels").toString
      DedupQueries.dedupClusters(spark, sfDir).write.mode("overwrite").parquet(dir)
      dir
    })

  /** `corpus_canonical` over PERSISTED labels (same result, same oracle —
    * the labels are a deterministic function of the corpus). */
  def corpusCanonicalCached(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = prepareCanonicalLabels(spark, sfDir)
    corpusCanonicalFromLabels(
      Tables.load(spark, sfDir, "documents"), spark.read.parquet(dir))
  }

  val corpusCanonicalSql: String =
    s"""SELECT doc_id, source, n_chars FROM documents
      |WHERE doc_id NOT IN (
      |  SELECT doc_id FROM (${DedupQueries.dedupClustersSql})
      |  WHERE doc_id != cluster_id)
      |ORDER BY doc_id""".stripMargin

  // --- quality-aware canonical selection --------------------------------
  // `corpus_canonical` keeps each near-dup cluster's MIN-ID member — a
  // deterministic but quality-blind choice. Real curation keeps the BEST
  // member: near-dup clusters usually mix a clean original with mangled
  // re-crawls (boilerplate injections, encoding damage), and keeping the
  // min id keeps whichever got crawled first. This operator picks, per
  // cluster, the member with the highest heuristic quality (ties to the
  // lowest doc_id so the choice is total). Scale: the label frame holds
  // only clustered docs (≪ corpus at any sane dup rate), the quality
  // join is keyed on doc_id, and both aggs are cluster-count-sized; no
  // windows — argmax is max-then-filter-then-min, three hash aggs.
  // Outputs are exact integers (quality through the proven bit-identical
  // chain, then floor ×1e6).
  def corpusCanonicalQuality(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val labels = DedupQueries.dedupClusters(spark, sfDir)
    // Join FIRST, score SECOND: the quality expression is the expensive
    // part, and only cluster members (≪ corpus at any sane dup rate) need
    // it — scoring before the join pays the full battery on every doc.
    // The explicit repartition floors the scoring stage's parallelism at
    // the session's core count (defaultParallelism — env/cluster-derived,
    // not a local constant): without it AQE coalesces the bounded member
    // slice to ~1 partition and the per-row expression serializes (the
    // round-9 measurement that reverted the join-first shape).
    val m = labels
      .join(docs.select(col("doc_id"), col("text")), Seq("doc_id"))
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("cluster_id"), col("doc_id"),
        floor(TextQueries.qualityExpr(col("text")) * lit(1000000.0))
          .cast("long").as("quality_e6"))
    val best = m.groupBy(col("cluster_id"))
      .agg(max(col("quality_e6")).as("best_quality_e6"),
        count(lit(1)).as("n_members"))
    m.join(best, Seq("cluster_id"))
      .filter(col("quality_e6") === col("best_quality_e6"))
      .groupBy(col("cluster_id"), col("n_members"), col("best_quality_e6"))
      .agg(min(col("doc_id")).as("keep_id"))
      .select(col("cluster_id"), col("keep_id"), col("n_members"),
        col("best_quality_e6"))
      .orderBy(col("cluster_id"))
  }

  val corpusCanonicalQualitySql: String =
    s"""WITH labels AS (${DedupQueries.dedupClustersSql}),
      |q AS (
      |  SELECT doc_id,
      |    CAST(floor((${TextQueries.qualitySqlExpr("toks", "text")}) * 1000000.0) AS BIGINT) AS quality_e6
      |  FROM (SELECT doc_id, text, list_filter(string_split(text, ' '), t -> t != '') AS toks
      |        FROM documents)),
      |m AS MATERIALIZED (SELECT l.cluster_id, l.doc_id, q.quality_e6
      |      FROM labels l JOIN q ON l.doc_id = q.doc_id),
      |best AS (
      |  SELECT cluster_id, CAST(max(quality_e6) AS BIGINT) AS best_quality_e6,
      |    CAST(count(*) AS BIGINT) AS n_members
      |  FROM m GROUP BY 1)
      |SELECT m.cluster_id, CAST(min(m.doc_id) AS BIGINT) AS keep_id,
      |  best.n_members, best.best_quality_e6
      |FROM m JOIN best USING (cluster_id)
      |WHERE m.quality_e6 = best.best_quality_e6
      |GROUP BY m.cluster_id, best.n_members, best.best_quality_e6
      |ORDER BY cluster_id""".stripMargin

  // --- leakage-safe train/validation split ------------------------------
  // The naive split — hash each doc_id — leaks: near-duplicate pairs
  // land on opposite sides and the validation set scores memorization.
  // The split UNIT must be the near-dup CLUSTER: every member of a
  // cluster hashes by its cluster label (unclustered docs are their own
  // unit), so no near-dup pair ever straddles the boundary. Deterministic
  // (md5 of the unit), so the split is reproducible run to run.
  // Scale: one left join against the (pairs-only, small) label frame +
  // a per-row hash — the cluster labels are the same persisted artifact
  // the canonical operator reads.
  private val SplitMod = 10
  private val ValBuckets = 1 // 1-in-10 → 10 % validation

  def corpusSplit(spark: SparkSession, sfDir: String): DataFrame =
    corpusSplitFromLabels(
      Tables.load(spark, sfDir, "documents"),
      DedupQueries.dedupClusters(spark, sfDir))

  /** Split over persisted labels — pair with
    * [[corpusCanonicalFromLabels]]'s production shape. */
  def corpusSplitFromLabels(docs: DataFrame, labels: DataFrame): DataFrame =
    docs
      .join(labels.select(col("doc_id"), col("cluster_id")), Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"),
        coalesce(col("cluster_id"), col("doc_id")).as("unit"))
      .select(col("doc_id"), col("source"),
        when(
          pmod(conv(substring(md5(col("unit").cast("string")), 1, 8), 16, 10)
            .cast("long"), lit(SplitMod)) < ValBuckets, "val")
          .otherwise("train").as("split"))
      .orderBy(col("doc_id"))

  /** `corpus_split` over PERSISTED labels (same result, same oracle —
    * the production shape: the dedup job's label artifact feeds both the
    * canonical corpus and the split, so the bench measures the split
    * operator itself: one left join + a per-row hash). */
  def corpusSplitCached(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = prepareCanonicalLabels(spark, sfDir)
    corpusSplitFromLabels(
      Tables.load(spark, sfDir, "documents"), spark.read.parquet(dir))
  }

  val corpusSplitSql: String =
    s"""WITH labels AS (${DedupQueries.dedupClustersSql}),
      |u AS (
      |  SELECT d.doc_id, d.source, coalesce(l.cluster_id, d.doc_id) AS unit
      |  FROM documents d LEFT JOIN labels l ON d.doc_id = l.doc_id)
      |SELECT doc_id, source,
      |  CASE WHEN CAST(('0x'||substr(md5(CAST(unit AS VARCHAR)),1,8)) AS BIGINT)
      |            % $SplitMod < $ValBuckets
      |       THEN 'val' ELSE 'train' END AS split
      |FROM u ORDER BY doc_id""".stripMargin

  // --- sequence packing ---------------------------------------------------
  // Pretraining shard assembly: shard documents by a portable hash,
  // order deterministically within the shard, and pack consecutive docs
  // into fixed token-budget bins (concat-and-split packing: a bin is
  // `budget` tokens of contiguous stream; `bin = start_offset div budget`).
  private val PackShards = 8
  private val PackBudget = 128

  /** Scale shape: one shuffle (by shard), per-shard sort feeds a single
    * running-sum window, bins aggregate map-side after that. Shard count
    * is the parallelism knob — at 100 TB you run thousands of shards, and
    * each shard's window sorts only its own partition. */
  /** The packed-bin frame (unordered) — shared by `corpus_pack` and the
    * fill-efficiency report so both describe the same packing. */
  private def packBins(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10).cast("long"),
          lit(PackShards)).as("shard"),
        size(toks(col("text"))).cast("long").as(s"tokens"))
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
    docs
      .withColumn("offset", sum(col("tokens")).over(w) - col("tokens"))
      .withColumn("bin", expr(s"offset div $PackBudget"))
      .groupBy(col("shard"), col("bin"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("tokens")).as("bin_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
  }

  def corpusPack(spark: SparkSession, sfDir: String): DataFrame =
    packBins(spark, sfDir).orderBy(col("shard"), col("bin"))

  // --- packing-efficiency report ----------------------------------------
  // The number a training job actually pays for: how FULL are the packed
  // sequences? Under-filled bins are padding (wasted step compute);
  // >100 % bins mark documents spanning a bin boundary (truncation or
  // carry-over work). One |bins|-row agg over the shared packed frame —
  // decile histogram of fill ratio with doc/token mass per decile, all
  // exact integers.
  def corpusPackEfficiency(spark: SparkSession, sfDir: String): DataFrame =
    packBins(spark, sfDir)
      .select(least(expr(s"bin_tokens * 10 div $PackBudget"), lit(10L))
          .cast("int").as("fill_decile"),
        col("n_docs"), col("bin_tokens"))
      .groupBy(col("fill_decile"))
      .agg(count(lit(1)).as("n_bins"), sum(col("n_docs")).as("n_docs"),
        sum(col("bin_tokens")).as("tokens"))
      .orderBy(col("fill_decile"))

  // --- atomic sequence packing (docs never split) -------------------------
  // The Llama-style packer next to corpus_pack's GPT concat-and-chunk:
  // a document is ATOMIC — it joins the current bin only if it fits
  // whole, else a new bin opens (an oversized doc sits alone in an
  // overfull bin rather than truncating). Greedy first-fit in doc_id
  // order is inherently SEQUENTIAL (each bin boundary depends on the
  // whole prefix), so no window/cumsum can express it; the scale shape
  // is the secondary-sort pattern: ONE shuffle by shard, a
  // sort-within-partitions, and a streaming mapPartitions that carries
  // (bin, fill) per shard in O(1) memory — never materializing a shard.
  // Shard count is the parallelism knob exactly as in corpus_pack. The
  // DuckDB oracle replays the same recursion as a recursive CTE.
  def corpusPackAtomic(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10).cast("long"),
          lit(PackShards)).as("shard"),
        size(toks(col("text"))).cast("long").as("tokens"))
    val assigned = docs
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("doc_id"))
      .select(col("shard"), col("doc_id"), col("tokens"))
      .as[(Long, Long, Long)]
      .mapPartitions { it =>
        var curShard = Long.MinValue; var bin = 0L; var fill = 0L
        it.map { case (sh, id, t) =>
          if (sh != curShard) { curShard = sh; bin = 0L; fill = t }
          else if (fill + t <= PackBudget) { fill += t }
          else { bin += 1L; fill = t }
          (sh, bin, id, t)
        }
      }
      .toDF("shard", "bin", "doc_id", "tokens")
    assigned.groupBy(col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tokens")).as("bin_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy(col("shard"), col("bin"))
  }

  /** The shared recursive-greedy CTE chain (→ `packed` rows), composed
    * by both the assignment query and the fill-efficiency report. */
  private val packAtomicCteSql: String =
    s"""WITH RECURSIVE d AS MATERIALIZED (
      |  SELECT shard, doc_id, tokens,
      |    row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
      |  FROM (
      |    SELECT doc_id,
      |      CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
      |        % $PackShards AS shard,
      |      CAST(len(list_filter(string_split(text, ' '), x -> x != '')) AS BIGINT) AS tokens
      |    FROM documents)),
      |packed AS (
      |  SELECT shard, rn, doc_id, tokens, CAST(0 AS BIGINT) AS bin, tokens AS fill
      |  FROM d WHERE rn = 1
      |  UNION ALL
      |  SELECT d.shard, d.rn, d.doc_id, d.tokens,
      |    CASE WHEN p.fill + d.tokens <= $PackBudget THEN p.bin ELSE p.bin + 1 END,
      |    CASE WHEN p.fill + d.tokens <= $PackBudget THEN p.fill + d.tokens ELSE d.tokens END
      |  FROM packed p JOIN d ON d.shard = p.shard AND d.rn = p.rn + 1)""".stripMargin

  val corpusPackAtomicSql: String =
    s"""$packAtomicCteSql
      |SELECT shard, bin,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(tokens) AS BIGINT) AS bin_tokens,
      |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
      |FROM packed GROUP BY 1, 2 ORDER BY shard, bin""".stripMargin

  // --- atomic-packing efficiency report -----------------------------------
  // The padding number the ATOMIC packer actually pays: concat-and-chunk
  // fills every bin by construction, but a docs-never-split packer
  // leaves real headroom in each bin (and >100 % bins mark oversized
  // docs sitting alone). Same decile-histogram shape as
  // corpus_pack_efficiency, over the atomic assignment — one
  // |bins|-row agg, all exact integers.
  def corpusPackAtomicEfficiency(spark: SparkSession, sfDir: String): DataFrame =
    corpusPackAtomic(spark, sfDir)
      .select(least(expr(s"bin_tokens * 10 div $PackBudget"), lit(10L))
          .cast("int").as("fill_decile"),
        col("n_docs"), col("bin_tokens"))
      .groupBy(col("fill_decile"))
      .agg(count(lit(1)).as("n_bins"), sum(col("n_docs")).as("n_docs"),
        sum(col("bin_tokens")).as("tokens"))
      .orderBy(col("fill_decile"))

  val corpusPackAtomicEfficiencySql: String =
    s"""$packAtomicCteSql,
      |bins AS (
      |  SELECT shard, bin,
      |    CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(tokens) AS BIGINT) AS bin_tokens
      |  FROM packed GROUP BY 1, 2)
      |SELECT CAST(least(bin_tokens * 10 // $PackBudget, 10) AS INT) AS fill_decile,
      |  CAST(count(*) AS BIGINT) AS n_bins,
      |  CAST(sum(n_docs) AS BIGINT) AS n_docs,
      |  CAST(sum(bin_tokens) AS BIGINT) AS tokens
      |FROM bins GROUP BY 1 ORDER BY fill_decile""".stripMargin

  // --- exact-quota stratified sampling ---------------------------------
  // "Exactly n documents per source, reproducibly" — the mixture query's
  // rate-based cousin for when the recipe demands exact counts. Rank
  // within each source by a doc_id-derived hash (deterministic, replay-
  // stable, cross-engine) and keep the first `SampleQuota`.
  //
  // Scale shape: NO per-group window sort — the per-source top-n runs
  // through the bounded partial-merge TopKAgg (each partition keeps at
  // most n candidates, the exchange carries partitions × n rows, the
  // merge is n-bounded), so a source with 10^10 docs costs the same
  // shuffle as one with 10^4. The hash order also makes the sample a
  // uniform draw regardless of how doc_ids cluster per source.
  private val SampleQuota = 40

  def corpusSampleQuota(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.TopKAgg
    val docs = Tables.load(spark, sfDir, "documents")
    // ascending hash order = descending negated hash for the max-k agg;
    // ties (same 32-bit prefix) break by doc_id asc — TopKAgg's own
    // tie-break, mirrored in the oracle's ORDER BY.
    val score = -conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("double")
    val topq = udaf(new TopKAgg(SampleQuota))
    docs.select(col("source"), score.as("s"), col("doc_id"))
      .groupBy(col("source"))
      .agg(topq(col("s"), col("doc_id")).as("picked"))
      .select(col("source"), posexplode(col("picked")).as(Seq("pos", "p")))
      .select(col("source"), (col("pos") + 1).cast("int").as("rank"),
        col("p.id").as("doc_id"))
      .orderBy(col("source"), col("rank"))
  }

  val corpusSampleQuotaSql: String =
    s"""SELECT source, CAST(rn AS INT) AS rank, doc_id FROM (
      |  SELECT source, doc_id,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT),
      |               doc_id) AS rn
      |  FROM documents)
      |WHERE rn <= $SampleQuota
      |ORDER BY source, rank""".stripMargin

  val corpusPackSql: String =
    s"""WITH docs AS (
      |  SELECT doc_id,
      |    CAST('0x' || substr(md5(doc_id::VARCHAR), 1, 8) AS BIGINT) % $PackShards AS shard,
      |    len(list_filter(string_split(text, ' '), x -> x != ''))::BIGINT AS tokens
      |  FROM documents),
      |offsets AS (
      |  SELECT shard, doc_id, tokens,
      |    CAST(sum(tokens) OVER (PARTITION BY shard ORDER BY doc_id) AS BIGINT) - tokens AS off
      |  FROM docs)
      |SELECT shard, off // $PackBudget AS bin,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(tokens) AS BIGINT) AS bin_tokens,
      |  min(doc_id) AS first_doc,
      |  max(doc_id) AS last_doc
      |FROM offsets
      |GROUP BY shard, off // $PackBudget
      |ORDER BY shard, bin""".stripMargin

  val corpusPackEfficiencySql: String =
    s"""WITH bins AS (SELECT * FROM ($corpusPackSql))
      |SELECT CAST(least(bin_tokens * 10 // $PackBudget, 10) AS INT) AS fill_decile,
      |  CAST(count(*) AS BIGINT) AS n_bins,
      |  CAST(sum(n_docs) AS BIGINT) AS n_docs,
      |  CAST(sum(bin_tokens) AS BIGINT) AS tokens
      |FROM bins GROUP BY 1 ORDER BY fill_decile""".stripMargin

  // --- content-blocklist filtering via a Bloom pre-filter ----------------
  // "Remove every document whose CONTENT appears in a blocklist" — the
  // takedown/opt-out shape of corpus curation. The naive plan anti-joins
  // the whole corpus against the blocklist: at 100 TB that shuffles (or
  // at best probes) every corpus row. Here the blocklist builds a
  // FIXED-SIZE deterministic Bloom filter (one map-side-combinable agg →
  // m/64 longs of driver-held model state, embedded as a literal), the
  // corpus splits per-row into bloom-negative (DEFINITELY clean — kept
  // with no join at all) and bloom-positive (true matches + ~1% false
  // positives — only these pay the exact verify anti-join). The verify
  // join makes the operator EXACT: the oracle is the plain anti-join and
  // must hash-match.
  private val BlockSource = "src0"

  def corpusBlocklist(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.{Bloom, BloomAgg}
    val docs = Tables.load(spark, sfDir, "documents")
    val fp = md5(col("text"))
    val block = docs.filter(col("source") === BlockSource)
      .select(fp.as("bfp")).distinct()
    val bloomAgg = udaf(new BloomAgg())
    val words = block.select(xxhash64(col("bfp")).as("h"))
      .agg(bloomAgg(col("h")).as("w"))
      .head().getSeq[Long](0).toArray
    val tagged = docs.select(col("doc_id"), col("source"), col("n_chars"), fp.as("fp"))
    // `fp` is md5(text) inlined by projection collapse — Once keeps it
    // one digest per row instead of one per bloom-probe reference
    val maybe = Bloom.mayContainOnce(words, xxhash64(col("fp")))
    // negatives skip the join entirely; only positives enter the exchange
    val cleared = tagged.filter(maybe)
      .join(block, col("fp") === col("bfp"), "left_anti")
    tagged.filter(!maybe)
      .unionByName(cleared)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  val corpusBlocklistSql: String =
    s"""WITH block AS (
      |  SELECT DISTINCT md5(text) AS bfp FROM documents WHERE source = '$BlockSource')
      |SELECT doc_id, source, n_chars FROM documents
      |WHERE md5(text) NOT IN (SELECT bfp FROM block)
      |ORDER BY doc_id""".stripMargin

  // --- the nightly corpus job, composed --------------------------------
  // The whole curation pipeline as ONE declarative query: quality/
  // language filtering + whitespace-normalized exact dedup
  // (corpus_filter) → benchmark decontamination drop
  // (text_decontaminate) → token-budget sequence packing (corpus_pack).
  // Each stage is individually oracle-checked; this composition proves
  // they actually CHAIN — a user runs their end-to-end job as one plan,
  // and Catalyst sees every stage at once (one documents scan feeds the
  // filter and the gram explode; the pack window runs only over
  // survivors). Scale properties are inherited: broadcast benchmark
  // grams, per-shard windows, map-side bin aggregation.
  def corpusCurate(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val survivors = TextQueries.corpusFilter(spark, sfDir).select(col("doc_id"))
    val contaminated = textDecontaminate(spark, sfDir).select(col("doc_id"))
    val curated = survivors.join(contaminated, Seq("doc_id"), "left_anti")
    val docs = Tables.load(spark, sfDir, "documents")
      .join(curated, Seq("doc_id"), "left_semi")
      .select(col("doc_id"),
        pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10).cast("long"),
          lit(PackShards)).as("shard"),
        size(toks(col("text"))).cast("long").as("tokens"))
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
    docs
      .withColumn("offset", sum(col("tokens")).over(w) - col("tokens"))
      .withColumn("bin", expr(s"offset div $PackBudget"))
      .groupBy(col("shard"), col("bin"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("tokens")).as("bin_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy(col("shard"), col("bin"))
  }

  val corpusCurateSql: String =
    s"""WITH filtered AS (
      |  SELECT doc_id FROM (${TextQueries.corpusFilterSql})),
      |contaminated AS (
      |  SELECT doc_id FROM (${textDecontaminateSql})),
      |curated AS (
      |  SELECT doc_id FROM filtered
      |  WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)),
      |cdocs AS (
      |  SELECT d.doc_id,
      |    CAST('0x' || substr(md5(d.doc_id::VARCHAR), 1, 8) AS BIGINT) % $PackShards AS shard,
      |    len(list_filter(string_split(d.text, ' '), x -> x != ''))::BIGINT AS tokens
      |  FROM documents d JOIN curated USING (doc_id)),
      |offsets AS (
      |  SELECT shard, doc_id, tokens,
      |    CAST(sum(tokens) OVER (PARTITION BY shard ORDER BY doc_id) AS BIGINT) - tokens AS off
      |  FROM cdocs)
      |SELECT shard, off // $PackBudget AS bin,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(tokens) AS BIGINT) AS bin_tokens,
      |  min(doc_id) AS first_doc,
      |  max(doc_id) AS last_doc
      |FROM offsets
      |GROUP BY shard, off // $PackBudget
      |ORDER BY shard, bin""".stripMargin

  // --- cluster-balanced (semantic-diversity) sampling -------------------
  // `corpus_sample_quota` balances by SOURCE metadata; this balances by
  // EMBEDDING-SPACE coverage — per-cluster quotas over a coarse k-means
  // partition, so dense regions (near-duplicate topical blobs) can't
  // crowd out the corpus tails. The D4/SemDeDup-style selection step.
  // Scale: the assignment is the IVF coarse quantizer (broadcast C
  // centroids, one max_by hash-agg — exchange carries 1 row/vector) and
  // each cluster's quota runs through the bounded partial-merge TopKAgg,
  // so nothing anywhere is ∝N² or per-group-sorted.
  private val DivStride = 25 // ~N/25 coarse clusters, the IVF default
  private val DivQuota = 10

  def corpusDiversitySample(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.TopKAgg
    val vecs = Tables.load(spark, sfDir, "embeddings")
    val cents = vecs.filter(col("vec_id") % DivStride === 0)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cemb"))
    val assigned = VectorQueries.assignNearest(vecs, cents)
    // deterministic per-doc priority (hash order), ties → doc_id asc:
    // TopKAgg keeps max-k, so negate for ascending-hash selection
    val prio = -conv(substring(md5(col("vec_id").cast("string")), 1, 8), 16, 10)
      .cast("double")
    val topq = udaf(new TopKAgg(DivQuota))
    val sampled = assigned
      .select(col("cent_id"), prio.as("s"), col("vec_id"))
      .groupBy(col("cent_id"))
      .agg(topq(col("s"), col("vec_id")).as("picked"))
      .select(col("cent_id").as("cluster"), explode(col("picked")).as("p"))
      .select(col("cluster"), col("p.id").as("doc_id"))
    sampled
      .join(Tables.load(spark, sfDir, "documents"), Seq("doc_id"))
      .select(col("cluster"), col("doc_id"), col("source"), col("n_chars"))
      .orderBy(col("cluster"), col("doc_id"))
  }

  val corpusDiversitySampleSql: String =
    s"""WITH cents AS (
      |  SELECT vec_id AS cent_id, embedding AS cemb FROM embeddings
      |  WHERE vec_id % $DivStride = 0),
      |assigned AS (
      |  SELECT vec_id, cent_id FROM (
      |    SELECT e.vec_id, c.cent_id,
      |      row_number() OVER (PARTITION BY e.vec_id
      |        ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(c.cemb AS DOUBLE[])) DESC, c.cent_id) AS rn
      |    FROM embeddings e CROSS JOIN cents c)
      |  WHERE rn = 1),
      |sampled AS (
      |  SELECT cent_id AS cluster, vec_id FROM (
      |    SELECT cent_id, vec_id,
      |      row_number() OVER (PARTITION BY cent_id
      |        ORDER BY CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8)) AS BIGINT),
      |                 vec_id) AS rn
      |    FROM assigned)
      |  WHERE rn <= $DivQuota)
      |SELECT s.cluster, s.vec_id AS doc_id, d.source, d.n_chars
      |FROM sampled s JOIN documents d ON d.doc_id = s.vec_id
      |ORDER BY s.cluster, doc_id""".stripMargin

  // --- importance resampling by quality weight -------------------------
  // Soft quality curation: instead of a hard keep/drop threshold, keep
  // each document with probability proportional to its quality score
  // (high-quality docs always survive, mediocre ones are thinned, junk
  // is dropped) — the standard way to reweight a web corpus toward
  // quality without discarding the distribution's tail entirely.
  // Acceptance is a pure per-row function — `md5(doc_id) mod 2^20 / 2^20
  // < weight` — NOT `rand()`: replays, incremental refreshes, and the
  // cross-engine oracle all see the identical sample, and the operator
  // is a shuffle-free scan at any scale. Weight reuses the corpus_filter
  // quality signal, affinely squashed to [0, 1].
  private val RsScale = 1 << 20

  def corpusResample(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val quality = TextQueries.qualityExpr(col("text"))
    val weight = greatest(lit(0.0), least(lit(1.0), quality / lit(2.0)))
    val u = conv(substring(md5(concat(lit("rs:"), col("doc_id").cast("string"))), 1, 5), 16, 10)
      .cast("long").cast("double") / lit(RsScale.toDouble)
    docs.select(col("doc_id"), weight.as("weight"), u.as("u"))
      .filter(col("u") < col("weight"))
      .select(col("doc_id"), round(col("weight"), 6).as("weight"))
      .orderBy(col("doc_id"))
  }

  val corpusResampleSql: String = {
    s"""WITH scored AS (
      |  SELECT doc_id,
      |    ${TextQueries.qualitySqlExpr("toks", "text")} AS quality
      |  FROM (SELECT doc_id, text, list_filter(string_split(text, ' '), t -> t != '') AS toks
      |        FROM documents)),
      |weighted AS (
      |  SELECT doc_id,
      |    greatest(0.0, least(1.0, quality / 2.0)) AS weight,
      |    CAST(('0x' || substr(md5('rs:' || CAST(doc_id AS VARCHAR)), 1, 5)) AS BIGINT)::DOUBLE
      |      / $RsScale.0 AS u
      |  FROM scored)
      |SELECT doc_id, round(weight, 6) AS weight
      |FROM weighted WHERE u < weight ORDER BY doc_id""".stripMargin
  }

  // --- per-source corpus health dashboard ------------------------------
  // The rollup every curation run reports per upstream source (crawl,
  // dump, registry): volume, token mass, exact-dup rate, and pooled
  // (token-weighted) quality. Drives the keep/boost/drop decision per
  // source before any per-document work. ONE hash agg over a single
  // scan — partial aggregation map-side, |sources| result rows, so the
  // exchange carries per-source partials regardless of corpus size.
  // Parity: every summed column is an exact long from
  // [[TextQueries.qualityCounts]]; the quality double chain runs ONCE
  // per source over the five exact sums (never sum computed doubles —
  // the round-4 DECIMAL(18,4) lesson), so the agg is exact and
  // order-independent in both engines. The gated OUTPUT is integer-only
  // (`dup_e6` by pure integer division, `quality_e6` = floor of the
  // bit-identical chain ×1e6) and every oracle aggregate is cast to
  // BIGINT — DuckDB's `sum(BIGINT)` returns HUGEINT, and a
  // dtype-sensitive result hash reads that as red even when every
  // value matches.
  def corpusSourceStats(spark: SparkSession, sfDir: String): DataFrame =
    sourceStats(Tables.load(spark, sfDir, "documents"))

  /** The dashboard over any `(source, lang, text)` frame — shared with
    * the continuous face ([[graft.streaming.StreamSourceStats]]'s spec
    * compares the merged stream state against this exact chain). */
  private[graft] def sourceStats(docs: DataFrame): DataFrame = {
    val counts = TextQueries.qualityCounts(col("text"))
    docs
      .select(Seq(col("source"), col("lang"),
        md5(lower(regexp_replace(col("text"), "\\s+", " "))).as("fp")) ++ counts: _*)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("total_tokens"),
        countDistinct(col("fp")).as("distinct_docs"),
        countDistinct(col("lang")).as("n_langs"),
        sum(col("stop_hits")).as("s_stop"),
        sum(col("distinct_toks")).as("s_dist"),
        sum(col("alnum_chars")).as("s_alnum"),
        sum(col("n_chars")).as("s_chars"))
      .select(col("source"), col("n_docs"), col("total_tokens"),
        expr("(n_docs - distinct_docs) * 1000000 div n_docs").as("dup_e6"),
        col("n_langs"),
        floor(TextQueries.qualityFromCounts(col("s_stop"), col("total_tokens"),
          col("s_dist"), col("s_alnum"), col("s_chars")) * lit(1000000.0))
          .as("quality_e6"))
      .orderBy(col("source"))
  }

  val corpusSourceStatsSql: String = {
    val comps = TextQueries.qualityCountsSql("toks", "text")
      .map { case (name, sql) => s"$sql AS $name" }.mkString(",\n      |    ")
    s"""WITH scored AS (
      |  SELECT source, lang,
      |    md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS fp,
      |    $comps
      |  FROM (SELECT source, lang, text, list_filter(string_split(text, ' '), t -> t != '') AS toks
      |        FROM documents))
      |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(n_tok) AS BIGINT) AS total_tokens,
      |  CAST((count(*) - count(DISTINCT fp)) * 1000000 // count(*) AS BIGINT) AS dup_e6,
      |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
      |  CAST(floor((CAST(sum(stop_hits) AS DOUBLE) / CAST(sum(n_tok) AS DOUBLE) * 2.0
      |    + CAST(sum(distinct_toks) AS DOUBLE) / CAST(sum(n_tok) AS DOUBLE)
      |    + CAST(sum(alnum_chars) AS DOUBLE) / CAST(sum(n_chars) AS DOUBLE)
      |    - 1.0) * 1000000.0) AS BIGINT) AS quality_e6
      |FROM scored GROUP BY source ORDER BY source""".stripMargin
  }

  // --- token-budget mixture: quality-ordered waterfill ------------------
  // "We can afford B training tokens — how much of each source do we
  // take?" The static allocation pass a mixture plan starts from:
  // sources are ranked by pooled quality (the exact-integer
  // corpus_source_stats signal), the budget fills greedily down the
  // ranking — full sources while they fit, a fractional rate for the
  // marginal source, zero below it. Budget here is 3/5 of the corpus in
  // exact integer arithmetic so the query is scale-relative.
  //
  // Scale shape: one corpus scan → per-source exact sums (the one hash
  // agg corpus_source_stats already pays); the waterfill window runs
  // over |sources| rows — model-sized, not corpus-sized — exactly like
  // events_anomaly windowing the hourly aggregate. Every allocated
  // quantity is a long; the only doubles are the final ranked-by
  // quality chain (bit-identical, exact operands) and the one rate
  // divide.
  def corpusBudgetMixture(spark: SparkSession, sfDir: String): DataFrame =
    budgetRates(Tables.load(spark, sfDir, "documents"))
      .select(col("source"), col("n_docs"), col("tokens"),
        floor(col("quality") * lit(1000000.0)).as("quality_e6"),
        col("allocated_tokens"),
        // pure integer micro-rate; `allocated * 1e6` fits a long while
        // a source holds < 2^43 ≈ 9e12 tokens (DECIMAL territory past
        // that — the fixture and any per-source shard are far below)
        expr("allocated_tokens * 1000000L div tokens").as("rate_e6"))
      .orderBy(col("source"))

  /** The waterfill's per-source rate frame (unrounded quality carried
    * through) — shared by the mixture report and [[corpusBudgetApply]]. */
  private def budgetRates(docs: DataFrame): DataFrame = {
    val perSrc = docs
      .select(col("source") +: TextQueries.qualityCounts(col("text")): _*)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("tokens"),
        sum(col("stop_hits")).as("s_stop"), sum(col("distinct_toks")).as("s_dist"),
        sum(col("alnum_chars")).as("s_alnum"), sum(col("n_chars")).as("s_chars"))
      .select(col("source"), col("n_docs"), col("tokens"),
        TextQueries.qualityFromCounts(col("s_stop"), col("tokens"),
          col("s_dist"), col("s_alnum"), col("s_chars")).as("quality"))
      // feeds the budget total AND the waterfill — unshared, the corpus
      // scan would run twice for a |sources|-row frame. An EAGER
      // localCheckpoint (not cache) so the materialized blocks are
      // context-cleaned when the frame is unreferenced — repeated
      // Verify/Bench invocations must not accumulate storage memory.
      .localCheckpoint(true)
    val tot = perSrc.agg(sum(col("tokens")).as("corpus_tokens"))
    val fill = Window.orderBy(col("quality").desc, col("source"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val alloc = greatest(lit(0L), least(col("tokens"),
      col("budget") - col("prev_cum")))
    perSrc.crossJoin(broadcast(tot))
      .withColumn("budget", expr("corpus_tokens * 3 div 5"))
      .withColumn("prev_cum", coalesce(sum(col("tokens")).over(fill), lit(0L)))
      .select(col("source"), col("n_docs"), col("tokens"), col("quality"),
        alloc.as("allocated_tokens"),
        (alloc.cast("double") / col("tokens").cast("double")).as("rate"))
  }

  /** The waterfill WITH-clause prefix (`c`, `s`, `t`, `r`) shared by the
    * mixture report and the apply oracle — mirrors [[budgetRates]]. */
  private val budgetRatesSqlCore: String = {
    val comps = TextQueries.qualityCountsSql("toks", "text")
      .map { case (name, sql) => s"$sql AS $name" }.mkString(",\n      |    ")
    s"""c AS (
      |  SELECT source,
      |    $comps
      |  FROM (SELECT source, text, list_filter(string_split(text, ' '), t -> t != '') AS toks
      |        FROM documents)),
      |s AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(n_tok) AS BIGINT) AS tokens,
      |    CAST(sum(stop_hits) AS DOUBLE) / CAST(sum(n_tok) AS DOUBLE) * 2.0
      |      + CAST(sum(distinct_toks) AS DOUBLE) / CAST(sum(n_tok) AS DOUBLE)
      |      + CAST(sum(alnum_chars) AS DOUBLE) / CAST(sum(n_chars) AS DOUBLE)
      |      - 1.0 AS quality
      |  FROM c GROUP BY source),
      |t AS (SELECT CAST(sum(tokens) AS BIGINT) AS corpus_tokens FROM s),
      |r AS (
      |  SELECT s.*, corpus_tokens * 3 // 5 AS budget,
      |    CAST(coalesce(sum(tokens) OVER (ORDER BY quality DESC, source
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS prev_cum
      |  FROM s CROSS JOIN t)""".stripMargin
  }

  val corpusBudgetMixtureSql: String =
    s"""WITH $budgetRatesSqlCore
      |SELECT source, n_docs, tokens,
      |  CAST(floor(quality * 1000000.0) AS BIGINT) AS quality_e6,
      |  CAST(greatest(0, least(tokens, budget - prev_cum)) AS BIGINT) AS allocated_tokens,
      |  CAST(greatest(0, least(tokens, budget - prev_cum)) * 1000000 // tokens AS BIGINT) AS rate_e6
      |FROM r ORDER BY source""".stripMargin

  // --- budget application: the plan executed as a keep manifest ---------
  // The waterfill's output is a PLAN (per-source rates); this is its
  // EXECUTION: every document accepts or drops by the same deterministic
  // md5 acceptance corpus_resample uses (`u(doc) < rate(source)`), so
  // replays, incremental refreshes, and the oracle all keep the
  // identical manifest. One corpus scan + one broadcast join of the
  // |sources|-row rate frame — shuffle-free at any scale; the kept token
  // mass converges to each source's allocation by construction.
  def corpusBudgetApply(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val rates = budgetRates(docs).select(col("source"), col("rate"))
    val u = conv(substring(md5(concat(lit("bm:"), col("doc_id").cast("string"))), 1, 5), 16, 10)
      .cast("long").cast("double") / lit(RsScale.toDouble)
    docs
      .select(col("doc_id"), col("source"),
        size(toks(col("text"))).cast("long").as("n_tok"), u.as("u"))
      .join(broadcast(rates), Seq("source"))
      .filter(col("u") < col("rate"))
      .select(col("doc_id"), col("source"), col("n_tok"))
      .orderBy(col("doc_id"))
  }

  val corpusBudgetApplySql: String =
    s"""WITH $budgetRatesSqlCore,
      |rates AS (
      |  SELECT source,
      |    CAST(greatest(0, least(tokens, budget - prev_cum)) AS DOUBLE)
      |      / CAST(tokens AS DOUBLE) AS rate
      |  FROM r),
      |d AS (
      |  SELECT doc_id, source,
      |    len(list_filter(string_split(text, ' '), t -> t != '')) AS n_tok,
      |    CAST(('0x' || substr(md5('bm:' || CAST(doc_id AS VARCHAR)), 1, 5)) AS BIGINT)::DOUBLE
      |      / $RsScale.0 AS u
      |  FROM documents)
      |SELECT doc_id, source, n_tok
      |FROM d JOIN rates USING (source)
      |WHERE u < rate ORDER BY doc_id""".stripMargin

  // --- curation funnel report ------------------------------------------
  // The survival accounting every production pipeline publishes: how
  // many documents (and tokens) each curation stage admits, in pipeline
  // order — Gopher rules → language+quality gate → exact dedup →
  // benchmark decontamination. Stages are CUMULATIVE (stage i counts
  // docs that passed 1..i), so the rows read as the funnel chart and
  // docs_in(i) ≡ docs_out(i−1) by construction.
  //
  // Scale shape: every scalar flag rides ONE projection over one corpus
  // scan (the Gopher and quality signal definitions are shared with
  // their standalone queries, so the funnel can never disagree with the
  // gates it reports on); the only joins are the fp-keyed canonical agg
  // (same exchange the dedup itself pays) and a broadcast of the
  // decontamination hits (eval-suite-sized). Output is stages-sized.
  /** Per-doc cumulative stage flags `(doc_id, source, n_tok, s1..s4)` —
    * the shared core of [[corpusFunnel]] and [[corpusFunnelBySource]]. */
  private def funnelFlags(spark: SparkSession, sfDir: String): DataFrame = {
    val base = TextQueries.scoredDocs(
        Tables.load(spark, sfDir, "documents"), extra = Seq("source"))
      .select(Seq(col("doc_id"), col("source"), col("fp"), col("quality"), col("is_en"),
        size(toks(col("text"))).cast("long").as("n_tok")) ++
        TextQueries.gopherSignals(col("text")): _*)
      // base feeds BOTH the canonical min-id agg and the flags join below;
      // un-materialized, the whole scan + quality/langid/gopher signal
      // battery runs twice (Catalyst does not dedup common subtrees).
      // EAGER checkpoint (narrow per-doc rows, no text): the two consumers
      // sit in concurrent stages of one action, where a lazy checkpoint
      // risks double-compute.
      .localCheckpoint(true)
    val canon = base.groupBy(col("fp")).agg(min(col("doc_id")).as("canon_id"))
    val contam = textDecontaminate(spark, sfDir)
      .select(col("doc_id"), lit(true).as("contam"))
    base
      .join(canon, Seq("fp"))
      .join(broadcast(contam), Seq("doc_id"), "left")
      .withColumn("s1", TextQueries.gopherPassFromSignals(col("n_words"),
        col("sum_word_len"), col("alpha_words"), col("stop_present"), col("n_sym")))
      .withColumn("s2", col("s1") &&
        col("quality") >= TextQueries.QualityThreshold && col("is_en"))
      .withColumn("s3", col("s2") && col("doc_id") === col("canon_id"))
      .withColumn("s4", col("s3") && coalesce(col("contam"), lit(false)) === false)
  }

  def corpusFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    funnelFlags(spark, sfDir)
      .agg(
        count(lit(1)).as("total"), sum(col("n_tok")).as("t0"),
        sum(when(col("s1"), 1L).otherwise(0L)).as("c1"),
        sum(when(col("s1"), col("n_tok")).otherwise(0L)).as("t1"),
        sum(when(col("s2"), 1L).otherwise(0L)).as("c2"),
        sum(when(col("s2"), col("n_tok")).otherwise(0L)).as("t2"),
        sum(when(col("s3"), 1L).otherwise(0L)).as("c3"),
        sum(when(col("s3"), col("n_tok")).otherwise(0L)).as("t3"),
        sum(when(col("s4"), 1L).otherwise(0L)).as("c4"),
        sum(when(col("s4"), col("n_tok")).otherwise(0L)).as("t4"))
      .selectExpr(
        """stack(5,
          |  '0_ingest', total, total, t0,
          |  '1_gopher_rules', total, c1, t1,
          |  '2_lang_quality', c1, c2, t2,
          |  '3_exact_dedup', c2, c3, t3,
          |  '4_decontaminate', c3, c4, t4)
          |AS (stage, docs_in, docs_out, tokens_out)""".stripMargin)
      .withColumn("kept_frac",
        when(col("docs_in") === 0L, lit(null))
          .otherwise(round(col("docs_out").cast("double") / col("docs_in").cast("double"), 6)))
      .orderBy(col("stage"))
  }

  /** The shared base/canon/contam/flags CTE chain (flags carry
    * `source` so the by-source variant groups the same frame). */
  private def funnelFlagsCte: String = {
    val signals = TextQueries.gopherSignalsSql("toks", "text")
      .map { case (n, e) => s"$e AS $n" }.mkString(",\n      |    ")
    s"""base AS (
      |  SELECT doc_id, source,
      |    md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS fp,
      |    ${TextQueries.qualitySqlExpr("toks", "text")} AS quality,
      |    ${TextQueries.isEnSqlExpr("toks")} AS is_en,
      |    CAST(len(toks) AS BIGINT) AS n_tok,
      |    $signals
      |  FROM (SELECT doc_id, source, text, list_filter(string_split(text, ' '), t -> t != '') AS toks
      |        FROM documents)),
      |canon AS (SELECT fp, min(doc_id) AS canon_id FROM base GROUP BY fp),
      |contam AS (SELECT doc_id FROM ($textDecontaminateSql)),
      |flags AS (
      |  SELECT b.doc_id, b.source, b.n_tok,
      |    ${TextQueries.gopherPassSql} AS s1,
      |    (${TextQueries.gopherPassSql}
      |      AND quality >= ${TextQueries.QualityThreshold} AND is_en) AS s2,
      |    (${TextQueries.gopherPassSql}
      |      AND quality >= ${TextQueries.QualityThreshold} AND is_en
      |      AND b.doc_id = c.canon_id) AS s3,
      |    (${TextQueries.gopherPassSql}
      |      AND quality >= ${TextQueries.QualityThreshold} AND is_en
      |      AND b.doc_id = c.canon_id AND ct.doc_id IS NULL) AS s4
      |  FROM base b JOIN canon c USING (fp) LEFT JOIN contam ct ON b.doc_id = ct.doc_id)""".stripMargin
  }

  val corpusFunnelSql: String =
    s"""WITH $funnelFlagsCte,
      |agg AS (
      |  SELECT CAST(count(*) AS BIGINT) AS total, CAST(sum(n_tok) AS BIGINT) AS t0,
      |    CAST(sum(CASE WHEN s1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
      |    CAST(sum(CASE WHEN s1 THEN n_tok ELSE 0 END) AS BIGINT) AS t1,
      |    CAST(sum(CASE WHEN s2 THEN 1 ELSE 0 END) AS BIGINT) AS c2,
      |    CAST(sum(CASE WHEN s2 THEN n_tok ELSE 0 END) AS BIGINT) AS t2,
      |    CAST(sum(CASE WHEN s3 THEN 1 ELSE 0 END) AS BIGINT) AS c3,
      |    CAST(sum(CASE WHEN s3 THEN n_tok ELSE 0 END) AS BIGINT) AS t3,
      |    CAST(sum(CASE WHEN s4 THEN 1 ELSE 0 END) AS BIGINT) AS c4,
      |    CAST(sum(CASE WHEN s4 THEN n_tok ELSE 0 END) AS BIGINT) AS t4
      |  FROM flags),
      |funnel AS (
      |  SELECT '0_ingest' AS stage, total AS docs_in, total AS docs_out, t0 AS tokens_out FROM agg
      |  UNION ALL SELECT '1_gopher_rules', total, c1, t1 FROM agg
      |  UNION ALL SELECT '2_lang_quality', c1, c2, t2 FROM agg
      |  UNION ALL SELECT '3_exact_dedup', c2, c3, t3 FROM agg
      |  UNION ALL SELECT '4_decontaminate', c3, c4, t4 FROM agg)
      |SELECT stage, docs_in, docs_out, tokens_out,
      |  CASE WHEN docs_in = 0 THEN NULL
      |       ELSE round(CAST(docs_out AS DOUBLE) / CAST(docs_in AS DOUBLE), 6) END AS kept_frac
      |FROM funnel ORDER BY stage""".stripMargin

  // --- per-source funnel breakdown -------------------------------------
  // The same cumulative stages grouped by source — which corpora lose
  // documents at which gate, the table a mixture owner reads before
  // re-weighting. One extra grouping key on the same flags frame; output
  // is sources × stages rows.
  def corpusFunnelBySource(spark: SparkSession, sfDir: String): DataFrame = {
    funnelFlags(spark, sfDir)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("total"), sum(col("n_tok")).as("t0"),
        sum(when(col("s1"), 1L).otherwise(0L)).as("c1"),
        sum(when(col("s1"), col("n_tok")).otherwise(0L)).as("t1"),
        sum(when(col("s2"), 1L).otherwise(0L)).as("c2"),
        sum(when(col("s2"), col("n_tok")).otherwise(0L)).as("t2"),
        sum(when(col("s3"), 1L).otherwise(0L)).as("c3"),
        sum(when(col("s3"), col("n_tok")).otherwise(0L)).as("t3"),
        sum(when(col("s4"), 1L).otherwise(0L)).as("c4"),
        sum(when(col("s4"), col("n_tok")).otherwise(0L)).as("t4"))
      .select(col("source"), expr(
        """stack(5,
          |  '0_ingest', total, total, t0,
          |  '1_gopher_rules', total, c1, t1,
          |  '2_lang_quality', c1, c2, t2,
          |  '3_exact_dedup', c2, c3, t3,
          |  '4_decontaminate', c3, c4, t4)
          |AS (stage, docs_in, docs_out, tokens_out)""".stripMargin))
      .withColumn("kept_frac",
        when(col("docs_in") === 0L, lit(null))
          .otherwise(round(col("docs_out").cast("double") / col("docs_in").cast("double"), 6)))
      .orderBy(col("source"), col("stage"))
  }

  val corpusFunnelBySourceSql: String =
    s"""WITH $funnelFlagsCte,
      |agg AS (
      |  SELECT source,
      |    CAST(count(*) AS BIGINT) AS total, CAST(sum(n_tok) AS BIGINT) AS t0,
      |    CAST(sum(CASE WHEN s1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
      |    CAST(sum(CASE WHEN s1 THEN n_tok ELSE 0 END) AS BIGINT) AS t1,
      |    CAST(sum(CASE WHEN s2 THEN 1 ELSE 0 END) AS BIGINT) AS c2,
      |    CAST(sum(CASE WHEN s2 THEN n_tok ELSE 0 END) AS BIGINT) AS t2,
      |    CAST(sum(CASE WHEN s3 THEN 1 ELSE 0 END) AS BIGINT) AS c3,
      |    CAST(sum(CASE WHEN s3 THEN n_tok ELSE 0 END) AS BIGINT) AS t3,
      |    CAST(sum(CASE WHEN s4 THEN 1 ELSE 0 END) AS BIGINT) AS c4,
      |    CAST(sum(CASE WHEN s4 THEN n_tok ELSE 0 END) AS BIGINT) AS t4
      |  FROM flags GROUP BY source),
      |funnel AS (
      |  SELECT source, '0_ingest' AS stage, total AS docs_in, total AS docs_out, t0 AS tokens_out FROM agg
      |  UNION ALL SELECT source, '1_gopher_rules', total, c1, t1 FROM agg
      |  UNION ALL SELECT source, '2_lang_quality', c1, c2, t2 FROM agg
      |  UNION ALL SELECT source, '3_exact_dedup', c2, c3, t3 FROM agg
      |  UNION ALL SELECT source, '4_decontaminate', c3, c4, t4 FROM agg)
      |SELECT source, stage, docs_in, docs_out, tokens_out,
      |  CASE WHEN docs_in = 0 THEN NULL
      |       ELSE round(CAST(docs_out AS DOUBLE) / CAST(docs_in AS DOUBLE), 6) END AS kept_frac
      |FROM funnel ORDER BY source, stage""".stripMargin

  // --- domain/URL-scoped curation --------------------------------------
  // Real crawl pipelines gate on WHERE a document came from before they
  // look at what it says: URL-canonicalization exact dedup (the same
  // page crawled as http/https, with/without www, with tracking params,
  // trailing slashes, fragments), per-registrable-domain health stats,
  // and domain blocklists (spam/SEO-farm lists are domain-keyed, not
  // content-keyed). The fixture carries no url column, so a
  // DETERMINISTIC synthetic URL is derived per document — doc_id-hash
  // domains, and crawl-noise decorations (scheme flips, www, tracking
  // query, trailing slash, fragment) keyed off doc_id residues so
  // canonicalization genuinely merges distinct raw URLs. The derivation
  // is mirrored verbatim in the oracles; everything DOWNSTREAM of the
  // url column is the real operator and would run unchanged on a true
  // url field.
  //
  // Scale shape: url synthesis + canonicalization are pure per-row
  // projections; url dedup is one hash agg keyed on the canonical url;
  // the domain funnel is the shared funnelFlags frame with one more
  // grouping key; the domain blocklist is the corpusBlocklist bloom
  // gate keyed on domain (bounded model state — a domain list, not a
  // corpus), so bloom-negative rows never pay the join.
  private val UrlGroup = 4L // docs per canonical page
  private val NumDomains = 64L

  /** Synthetic crawl URL for a `doc_id` row — deterministic, mirrored
    * by [[urlSqlExpr]]. Four consecutive doc_ids share a canonical page
    * (same domain + path) but differ in crawl noise. */
  private[graft] def urlOf: Column = {
    val gid = expr(s"doc_id div $UrlGroup")
    val dom = concat(lit("d"),
      pmod(conv(substring(md5(concat(lit("dom:"), gid.cast("string"))), 1, 8), 16, 10)
        .cast("long"), lit(NumDomains)).cast("string"),
      lit(".example.com"))
    concat(
      when(col("doc_id") % 2 === 0, lit("http://")).otherwise(lit("https://")),
      when(col("doc_id") % 3 === 0, lit("www.")).otherwise(lit("")),
      dom, lit("/p/"), gid.cast("string"),
      when(col("doc_id") % 7 === 0, lit("/")).otherwise(lit("")),
      when(col("doc_id") % 5 === 0,
        concat(lit("?utm_source=crawl&ref="), col("doc_id").cast("string")))
        .otherwise(lit("")),
      when(col("doc_id") % 11 === 0,
        concat(lit("#s"), (col("doc_id") % 4).cast("string"))).otherwise(lit("")))
  }

  // NOTE: written with concat(...) and no line-leading "||" — this
  // fragment is spliced through further stripMargin'd templates, which
  // would eat a pipe at the start of a continuation line.
  private[graft] val urlSqlExpr: String =
    s"""concat(
      |    CASE WHEN doc_id % 2 = 0 THEN 'http://' ELSE 'https://' END,
      |    CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END,
      |    'd', CAST(CAST(('0x'||substr(md5('dom:'||CAST(doc_id // $UrlGroup AS VARCHAR)),1,8)) AS BIGINT) % $NumDomains AS VARCHAR),
      |    '.example.com/p/', CAST(doc_id // $UrlGroup AS VARCHAR),
      |    CASE WHEN doc_id % 7 = 0 THEN '/' ELSE '' END,
      |    CASE WHEN doc_id % 5 = 0 THEN '?utm_source=crawl&ref=' || CAST(doc_id AS VARCHAR) ELSE '' END,
      |    CASE WHEN doc_id % 11 = 0 THEN '#s' || CAST(doc_id % 4 AS VARCHAR) ELSE '' END)""".stripMargin

  /** RFC-ish URL canonicalization: drop the fragment, strip tracking
    * params (utm_*, ref) and any dangling separators, fold http→https,
    * strip a leading www. and a trailing slash. Pure regex chain — the
    * same six rewrites, in the same order, both engines. */
  private[graft] def canonicalUrl(u: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(u, "#.*", ""),
              "(utm_[a-z_]+|ref)=[^&#]*", ""),
            "[?&]+$", ""),
          "^http://", "https://"),
        "^https://www\\.", "https://"),
      "/$", "")

  private[graft] def canonicalUrlSql(u: String): String =
    s"""regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      |      $u, '#.*', '', 'g'),
      |      '(utm_[a-z_]+|ref)=[^&#]*', '', 'g'),
      |      '[?&]+${"$"}', '', 'g'),
      |      '^http://', 'https://', 'g'),
      |      '^https://www\\.', 'https://', 'g'),
      |      '/${"$"}', '', 'g')""".stripMargin

  /** Registrable domain of a CANONICAL url (scheme already https). */
  private[graft] def domainOf(curl: Column): Column =
    regexp_extract(curl, "^https://([^/]+)", 1)

  private[graft] def domainSql(curl: String): String =
    s"regexp_extract($curl, '^https://([^/]+)', 1)"

  /** Per-doc `(doc_id, source, n_chars, url, curl, domain)` frame every
    * domain-scoped operator starts from — one projection, no joins. */
  private def urlFrame(docs: DataFrame): DataFrame = {
    val withUrl = docs.select(col("doc_id"), col("source"), col("n_chars"),
      urlOf.as("url"))
    val withCanon = withUrl.withColumn("curl", canonicalUrl(col("url")))
    withCanon.withColumn("domain", domainOf(col("curl")))
  }

  private val urlFrameCte: String =
    s"""urls AS (
      |  SELECT doc_id, source, n_chars, $urlSqlExpr AS url
      |  FROM documents),
      |canon AS (
      |  SELECT doc_id, source, n_chars, url,
      |    ${canonicalUrlSql("url")} AS curl
      |  FROM urls),
      |framed AS (
      |  SELECT *, ${domainSql("curl")} AS domain FROM canon)""".stripMargin

  /** URL-canonicalization exact dedup: one row per canonical page with
    * its keeper (min doc_id) and the crawl-noise variant count. */
  def corpusUrlDedup(spark: SparkSession, sfDir: String): DataFrame =
    urlFrame(Tables.load(spark, sfDir, "documents"))
      .groupBy(col("curl").as("canon_url"))
      .agg(min(col("doc_id")).as("canon_id"),
        count(lit(1)).as("n_docs"),
        countDistinct(col("url")).as("n_raw_urls"))
      .orderBy(col("canon_url"))

  val corpusUrlDedupSql: String =
    s"""WITH $urlFrameCte
      |SELECT curl AS canon_url, min(doc_id) AS canon_id,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(count(DISTINCT url) AS BIGINT) AS n_raw_urls
      |FROM framed GROUP BY curl ORDER BY canon_url""".stripMargin

  /** The curation funnel grouped by registrable domain — which domains
    * lose documents at which gate. Same shared flags frame as
    * [[corpusFunnel]], one more grouping key; output domains × stages. */
  def corpusDomainFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    val flags = funnelFlags(spark, sfDir)
      .withColumn("domain", domainOf(canonicalUrl(urlOf)))
    flags.groupBy(col("domain"))
      .agg(
        count(lit(1)).as("total"), sum(col("n_tok")).as("t0"),
        sum(when(col("s1"), 1L).otherwise(0L)).as("c1"),
        sum(when(col("s1"), col("n_tok")).otherwise(0L)).as("t1"),
        sum(when(col("s2"), 1L).otherwise(0L)).as("c2"),
        sum(when(col("s2"), col("n_tok")).otherwise(0L)).as("t2"),
        sum(when(col("s3"), 1L).otherwise(0L)).as("c3"),
        sum(when(col("s3"), col("n_tok")).otherwise(0L)).as("t3"),
        sum(when(col("s4"), 1L).otherwise(0L)).as("c4"),
        sum(when(col("s4"), col("n_tok")).otherwise(0L)).as("t4"))
      .select(col("domain"), expr(
        """stack(5,
          |  '0_ingest', total, total, t0,
          |  '1_gopher_rules', total, c1, t1,
          |  '2_lang_quality', c1, c2, t2,
          |  '3_exact_dedup', c2, c3, t3,
          |  '4_decontaminate', c3, c4, t4)
          |AS (stage, docs_in, docs_out, tokens_out)""".stripMargin))
      .withColumn("kept_frac",
        when(col("docs_in") === 0L, lit(null))
          .otherwise(round(col("docs_out").cast("double") / col("docs_in").cast("double"), 6)))
      .orderBy(col("domain"), col("stage"))
  }

  val corpusDomainFunnelSql: String =
    s"""WITH $funnelFlagsCte,
      |agg AS (
      |  SELECT ${domainSql(canonicalUrlSql(s"($urlSqlExpr)"))} AS domain,
      |    CAST(count(*) AS BIGINT) AS total, CAST(sum(n_tok) AS BIGINT) AS t0,
      |    CAST(sum(CASE WHEN s1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
      |    CAST(sum(CASE WHEN s1 THEN n_tok ELSE 0 END) AS BIGINT) AS t1,
      |    CAST(sum(CASE WHEN s2 THEN 1 ELSE 0 END) AS BIGINT) AS c2,
      |    CAST(sum(CASE WHEN s2 THEN n_tok ELSE 0 END) AS BIGINT) AS t2,
      |    CAST(sum(CASE WHEN s3 THEN 1 ELSE 0 END) AS BIGINT) AS c3,
      |    CAST(sum(CASE WHEN s3 THEN n_tok ELSE 0 END) AS BIGINT) AS t3,
      |    CAST(sum(CASE WHEN s4 THEN 1 ELSE 0 END) AS BIGINT) AS c4,
      |    CAST(sum(CASE WHEN s4 THEN n_tok ELSE 0 END) AS BIGINT) AS t4
      |  FROM flags GROUP BY 1),
      |funnel AS (
      |  SELECT domain, '0_ingest' AS stage, total AS docs_in, total AS docs_out, t0 AS tokens_out FROM agg
      |  UNION ALL SELECT domain, '1_gopher_rules', total, c1, t1 FROM agg
      |  UNION ALL SELECT domain, '2_lang_quality', c1, c2, t2 FROM agg
      |  UNION ALL SELECT domain, '3_exact_dedup', c2, c3, t3 FROM agg
      |  UNION ALL SELECT domain, '4_decontaminate', c3, c4, t4 FROM agg)
      |SELECT domain, stage, docs_in, docs_out, tokens_out,
      |  CASE WHEN docs_in = 0 THEN NULL
      |       ELSE round(CAST(docs_out AS DOUBLE) / CAST(docs_in AS DOUBLE), 6) END AS kept_frac
      |FROM funnel ORDER BY domain, stage""".stripMargin

  // The blocked-domain set is a deterministic hash slice of the domain
  // space (a stand-in for the SEO-spam/farm lists crawl pipelines
  // subscribe to) — bounded model state, like the content blocklist's.
  private val DomainBlockMod = 5L

  /** Drop every document whose registrable domain is blocklisted —
    * the bloom-prefiltered exact gate of [[corpusBlocklist]], keyed on
    * domain instead of content fingerprint. */
  def corpusDomainBlocklist(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.{Bloom, BloomAgg}
    val framed = urlFrame(Tables.load(spark, sfDir, "documents"))
    val blocked = framed.select(col("domain")).distinct()
      .filter(pmod(
        conv(substring(md5(concat(lit("blk:"), col("domain"))), 1, 8), 16, 10)
          .cast("long"), lit(DomainBlockMod)) === 0)
      .select(col("domain").as("bfp"))
    val bloomAgg = udaf(new BloomAgg())
    val words = blocked.select(xxhash64(col("bfp")).as("h"))
      .agg(bloomAgg(col("h")).as("w"))
      .head().getSeq[Long](0).toArray
    val tagged = framed.select(col("doc_id"), col("source"), col("domain"))
    // `domain` is the full url→canonical→domain regex chain after
    // projection collapse — Once runs it one time per row, not 10×
    val maybe = Bloom.mayContainOnce(words, xxhash64(col("domain")))
    val cleared = tagged.filter(maybe)
      .join(blocked, col("domain") === col("bfp"), "left_anti")
    tagged.filter(!maybe)
      .unionByName(cleared)
      .select(col("doc_id"), col("source"), col("domain"))
      .orderBy(col("doc_id"))
  }

  val corpusDomainBlocklistSql: String =
    s"""WITH $urlFrameCte,
      |blocked AS (
      |  SELECT DISTINCT domain FROM framed
      |  WHERE CAST(('0x'||substr(md5('blk:'||domain),1,8)) AS BIGINT) % $DomainBlockMod = 0)
      |SELECT doc_id, source, domain FROM framed
      |WHERE domain NOT IN (SELECT domain FROM blocked)
      |ORDER BY doc_id""".stripMargin

  // --- per-domain document cap -----------------------------------------
  // Crawl pipelines cap how many pages any single registrable domain
  // may contribute (SEO farms and mirror sites otherwise dominate the
  // token mass). Keep the [[DomainCapK]] best docs per domain by the
  // shared quality score, ties by doc_id. Plan: one projection
  // (synthetic url → domain + quality_e6) → ONE bounded TopKAgg hash
  // agg keyed on domain — partial-merge map-side, so the exchange
  // carries ≤ |domains|×K rows no matter the corpus size — then a
  // posexplode of the ≤K keeper list. No window over N (the
  // vec_topk shuffle argument, applied to curation). quality_e6 rides
  // the aggregate as an exact-integer-valued double (< 2^53), so the
  // TopKAgg ordering is identical to BIGINT ordering and the output
  // column is a hashing-proof BIGINT.
  private val DomainCapK = 8

  def corpusDomainCap(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.TopKAgg
    import org.apache.spark.sql.types.DoubleType
    val topk = udaf(new TopKAgg(DomainCapK))
    val docs = Tables.load(spark, sfDir, "documents")
    val qE6 = floor(TextQueries.qualityExpr(col("text")) * lit(1000000.0)).cast("long")
    val framed = docs
      .select(col("doc_id"), qE6.as("quality_e6"), urlOf.as("url"))
      .withColumn("domain", domainOf(canonicalUrl(col("url"))))
    framed.groupBy(col("domain"))
      .agg(count(lit(1)).as("domain_docs"),
        topk(col("quality_e6").cast(DoubleType), col("doc_id")).as("pk"))
      .select(col("domain"), col("domain_docs"),
        posexplode(col("pk")).as(Seq("pos", "p")))
      .select(col("domain"), (col("pos") + 1).cast("int").as("rank"),
        col("p.id").as("doc_id"), col("p.sim").cast("long").as("quality_e6"),
        col("domain_docs"))
      .orderBy(col("domain"), col("rank"))
  }

  val corpusDomainCapSql: String = {
    val q = TextQueries.qualitySqlExpr("toks", "text")
    s"""WITH framed AS (
      |  SELECT doc_id,
      |    CAST(floor(($q) * 1000000.0) AS BIGINT) AS quality_e6,
      |    ${domainSql(canonicalUrlSql(s"($urlSqlExpr)"))} AS domain
      |  FROM (SELECT doc_id, text,
      |          list_filter(string_split(text, ' '), t -> t != '') AS toks
      |        FROM documents)),
      |ranked AS (
      |  SELECT domain, doc_id, quality_e6,
      |    row_number() OVER (PARTITION BY domain
      |                       ORDER BY quality_e6 DESC, doc_id) AS rank,
      |    count(*) OVER (PARTITION BY domain) AS domain_docs
      |  FROM framed)
      |SELECT domain, CAST(rank AS INT) AS rank, doc_id, quality_e6,
      |  CAST(domain_docs AS BIGINT) AS domain_docs
      |FROM ranked WHERE rank <= $DomainCapK
      |ORDER BY domain, rank""".stripMargin
  }
}
