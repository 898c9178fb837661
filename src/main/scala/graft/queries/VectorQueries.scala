package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables
import graft.functions.{ScoredId, TopKAgg, VectorFunctions}

/** Similarity search over the `embeddings` table (BASELINE north star:
  * ANN for a training-data pipeline).
  *
  * Two paths, same contract as the dedup family:
  *  - `vec_topk` — brute-force cosine top-k for a small probe set. The
  *    probe set is broadcast, the corpus is scanned exactly once, and
  *    the per-probe top-k is a partial-merge `Aggregator` (TopKAgg), so
  *    the shuffle carries `partitions × probes × k` rows — at 100 TB the
  *    cost is one embedding scan, never an N×P exchange.
  *  - `vec_ann_lsh` — random-hyperplane (sign-bit) LSH: 24 sign bits per
  *    vector, banded 4×6, candidates = pairs sharing a band bucket, then
  *    exact-cosine verification. Cost scales with candidate count, not
  *    pairs². Degenerate buckets (skew: near-identical or zero vectors)
  *    are dropped via an oversized-bucket anti-join, bounding the
  *    self-join at any scale.
  *
  * The hyperplanes are coordinate-difference planes (bit i = emb[i] >
  * emb[i+32]) — deterministic, genuinely random w.r.t. the data, and
  * expressible identically in the DuckDB oracle (no RNG in either
  * engine). Similarities are computed by the codegen'd `cosine_sim`
  * Catalyst expression (functions/VectorFunctions.scala) and rounded to
  * 6 decimals in the OUTPUT only (ranking/thresholding uses the exact
  * double), which makes the cross-engine hash compare robust to last-ulp
  * float noise.
  */
object VectorQueries {

  private val TopK = 5
  private val ProbeStride = 100 // vec_id % 100 == 0 → 5 probes at sf0.01
  private val Bits = 24
  private val BandBits = 6
  private val NumBands = Bits / BandBits // 4
  private val BucketCap = 200 // skew guard: drop degenerate LSH buckets
  private val SimThreshold = 0.35

  private[graft] def cosine(a: Column, b: Column): Column =
    call_function("cosine_sim", a, b)

  // --- brute-force top-k neighbors for a probe set ---------------------
  def vecTopk(spark: SparkSession, sfDir: String): DataFrame = {
    VectorFunctions.register(spark)
    val vecs = Tables.load(spark, sfDir, "embeddings")
    val probes = vecs.filter(col("vec_id") % ProbeStride === 0)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_emb"))
    val topk = udaf(new TopKAgg(TopK))
    val scored = vecs.join(broadcast(probes), col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"),
        cosine(col("probe_emb"), col("embedding")).as("sim"),
        col("vec_id").as("id"))
    scored.groupBy(col("probe_id"))
      .agg(topk(col("sim"), col("id")).as("nn"))
      .select(col("probe_id"), posexplode(col("nn")).as(Seq("pos", "n")))
      .select(col("probe_id"), (col("pos") + 1).as("rank"),
        col("n.id").as("neighbor_id"), round(col("n.sim"), 6).as("sim"))
      .orderBy(col("probe_id"), col("rank"))
  }

  val vecTopkSql: String =
    s"""WITH probes AS (
      |  SELECT vec_id AS probe_id, embedding AS probe_emb
      |  FROM embeddings WHERE vec_id % $ProbeStride = 0),
      |scored AS (
      |  SELECT p.probe_id, e.vec_id,
      |    list_cosine_similarity(CAST(p.probe_emb AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) AS sim
      |  FROM probes p JOIN embeddings e ON e.vec_id != p.probe_id),
      |ranked AS (
      |  SELECT probe_id, vec_id, sim,
      |    row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, vec_id) AS rank
      |  FROM scored)
      |SELECT probe_id, rank, vec_id AS neighbor_id, round(sim, 6) AS sim
      |FROM ranked WHERE rank <= $TopK ORDER BY probe_id, rank""".stripMargin

  // --- kNN label propagation from a labeled seed set -------------------
  // The semi-supervised labeling operator every corpus-annotation
  // pipeline runs: a small human/model-labeled seed set assigns labels
  // to the whole corpus by majority vote of each document's k nearest
  // labeled neighbors. The seed set is bounded by construction (it is
  // the labeled data, not the corpus), so it broadcasts; the corpus is
  // scanned ONCE and the per-target top-k is a hash aggregation
  // (`TopKAgg` partial-aggregates map-side) — no window over N×S scored
  // rows, no shuffle of the corpus itself. Votes aggregate N×k rows.
  private val SeedStride = 10 // vec_id % 10 == 0 → the labeled seed set

  def vecKnnLabel(spark: SparkSession, sfDir: String): DataFrame = {
    VectorFunctions.register(spark)
    val vecs = Tables.load(spark, sfDir, "embeddings")
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"))
    val seeds = vecs.filter(col("vec_id") % SeedStride === 0)
      .join(docs, col("vec_id") === col("doc_id"))
      .select(col("vec_id").as("seed_id"), col("embedding").as("seed_emb"),
        col("lang").as("seed_lang"))
    val targets = vecs.filter(col("vec_id") % SeedStride =!= 0)
    val topk = udaf(new TopKAgg(TopK))
    val scored = targets.join(broadcast(seeds))
      .select(col("vec_id"),
        cosine(col("embedding"), col("seed_emb")).as("sim"),
        col("seed_id").as("id"))
    val knn = scored.groupBy(col("vec_id"))
      .agg(topk(col("sim"), col("id")).as("nn"))
      .select(col("vec_id"), explode(col("nn")).as("n"))
      .select(col("vec_id"), col("n.id").as("seed_id"))
    // Majority vote; ties break to the lexicographically smallest label
    // via min_by over (-votes, label) — one more hash agg, window-free.
    knn.join(broadcast(seeds.select(col("seed_id"), col("seed_lang"))), Seq("seed_id"))
      .groupBy(col("vec_id"), col("seed_lang"))
      .agg(count(lit(1)).as("votes"))
      .groupBy(col("vec_id"))
      .agg(min_by(
        struct(col("seed_lang").as("lang"), col("votes").as("votes")),
        struct((-col("votes")).as("neg_votes"), col("seed_lang").as("lang"))).as("win"))
      .select(col("vec_id").as("doc_id"), col("win.lang").as("pred_lang"),
        col("win.votes").as("votes"))
      .orderBy(col("doc_id"))
  }

  val vecKnnLabelSql: String =
    s"""WITH seeds AS (
      |  SELECT e.vec_id AS seed_id, e.embedding AS seed_emb, d.lang AS seed_lang
      |  FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
      |  WHERE e.vec_id % $SeedStride = 0),
      |targets AS (
      |  SELECT vec_id, embedding FROM embeddings WHERE vec_id % $SeedStride != 0),
      |scored AS (
      |  SELECT t.vec_id, s.seed_id, s.seed_lang,
      |    list_cosine_similarity(CAST(t.embedding AS DOUBLE[]), CAST(s.seed_emb AS DOUBLE[])) AS sim
      |  FROM targets t CROSS JOIN seeds s),
      |knn AS (
      |  SELECT vec_id, seed_lang,
      |    row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, seed_id) AS rnk
      |  FROM scored),
      |votes AS (
      |  SELECT vec_id, seed_lang, count(*) AS votes
      |  FROM knn WHERE rnk <= $TopK GROUP BY vec_id, seed_lang)
      |SELECT vec_id AS doc_id, seed_lang AS pred_lang, votes
      |FROM votes
      |QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY votes DESC, seed_lang) = 1
      |ORDER BY doc_id""".stripMargin

  /** Label-propagation quality report: per TRUE language, how many
    * documents the kNN vote labeled correctly. Exact-integer counts with
    * one final mirrored divide (the classifier_eval recipe). */
  def vecKnnLabelEval(spark: SparkSession, sfDir: String): DataFrame = {
    val truth = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"))
    vecKnnLabel(spark, sfDir).join(truth, Seq("doc_id"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("pred_lang") === col("lang"), 1L).otherwise(0L)).as("n_correct"))
      .select(col("lang"), col("n_docs"), col("n_correct"),
        round(col("n_correct").cast("double") / col("n_docs").cast("double"), 6)
          .as("accuracy"))
      .orderBy(col("lang"))
  }

  val vecKnnLabelEvalSql: String =
    s"""WITH preds AS ($vecKnnLabelSql)
      |SELECT d.lang, count(*) AS n_docs,
      |  CAST(sum(CASE WHEN p.pred_lang = d.lang THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
      |  round(CAST(sum(CASE WHEN p.pred_lang = d.lang THEN 1 ELSE 0 END) AS DOUBLE)
      |    / CAST(count(*) AS DOUBLE), 6) AS accuracy
      |FROM preds p JOIN documents d ON d.doc_id = p.doc_id
      |GROUP BY d.lang ORDER BY d.lang""".stripMargin

  // --- IVF-flat ANN: coarse quantizer + inverted lists -----------------
  // Build: one scan of the corpus assigns every vector to its nearest
  // centroid (centroids broadcast — an IVF quantizer is BOUNDED by
  // construction; here deterministically sampled by id stride so the
  // DuckDB oracle mirrors it exactly, where a real deployment would
  // train k-means once and broadcast the same way). Query: probe the
  // `NProbe` nearest inverted lists only — cost scales with list size,
  // not corpus size. Recall < 1 by design; the oracle mirrors the same
  // probe policy so parity is exact.
  private[graft] val CentroidStride = 25

  /** The sampled coarse quantizer every IVF path shares: one (cent_id,
    * cemb) row per strided corpus vector — bounded model-sized frame. */
  private[graft] def sampledCentroids(vecs: DataFrame): DataFrame =
    vecs.filter(col("vec_id") % CentroidStride === 0)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cemb"))
  private[graft] val NProbe = 2

  /** Nearest-centroid assignment as ONE hash aggregation: `max_by`
    * partial-aggregates map-side, so the exchange carries one row per
    * VECTOR — a `row_number` window here would re-shuffle all N×C
    * scored rows (at 1 B vectors × 10 k centroids, 10^13 rows). The
    * `(sim, -cent_id)` ordering key reproduces the window's
    * `sim DESC, cent_id ASC` tie-break deterministically. */
  private[graft] def assignNearest(vecs: DataFrame, cents: DataFrame): DataFrame =
    vecs.join(broadcast(cents))
      .select(col("vec_id"), col("embedding"), col("cent_id"),
        cosine(col("embedding"), col("cemb")).as("csim"))
      .groupBy(col("vec_id"))
      .agg(max_by(struct(col("cent_id"), col("embedding")),
        struct(col("csim"), (-col("cent_id")).as("tb"))).as("a"))
      .select(col("vec_id"), col("a.embedding").as("embedding"), col("a.cent_id").as("cent_id"))

  /** Probe the `NProbe` nearest inverted lists and rank exact cosine —
    * both per-probe rankings run through the bounded partial-merge
    * [[TopKAgg]] (shuffle ≤ probes × k rows), never a per-probe window
    * shuffle. */
  private[graft] def probeLists(vecs: DataFrame, cents: DataFrame, assigned: DataFrame): DataFrame =
    probeListsFrom(
      vecs.filter(col("vec_id") % ProbeStride === 0)
        .select(col("vec_id").as("probe_id"), col("embedding").as("pemb")),
      cents, assigned, TopK)

  /** Probe→centroid routing — the ONE block every IVF face shares
    * (vec/crossmodal probeListsFrom, the NProbe sweep, the bitext
    * forward leg): rank the bounded broadcast centroid frame per probe
    * through TopKAgg(`width`) and emit the probe frame rejoined with
    * (cent_rank, cent_id). A tie-break or routing-policy change edits
    * exactly here, never per face. */
  private[graft] def routeProbes(probes: DataFrame, cents: DataFrame,
      idCol: String, embCol: String, width: Int): DataFrame = {
    val topW = udaf(new TopKAgg(width))
    probes.join(broadcast(cents))
      .select(col(idCol), cosine(col(embCol), col("cemb")).as("csim"), col("cent_id"))
      .groupBy(col(idCol))
      .agg(topW(col("csim"), col("cent_id")).as("pc"))
      .select(col(idCol), posexplode(col("pc")).as(Seq("pos", "pc")))
      .select(col(idCol), (col("pos") + 1).cast("int").as("cent_rank"),
        col("pc.id").as("cent_id"))
      .join(probes, Seq(idCol))
  }

  /** The IVF query core over an EXPLICIT probe frame (`probe_id`,
    * `pemb`) — lets the probes live in a different embedding space than
    * the corpus (the cross-modal text-tower case) while sharing the
    * exact probed-list + TopKAgg machinery. */
  private[graft] def probeListsFrom(probes: DataFrame, cents: DataFrame,
      assigned: DataFrame, k: Int): DataFrame = {
    val probeCents = routeProbes(probes, cents, "probe_id", "pemb", NProbe)
      .drop("cent_rank")
    val scored = probeCents.join(assigned, Seq("cent_id"))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("id"),
        cosine(col("pemb"), col("embedding")).as("sim"))
    val topk = udaf(new TopKAgg(k))
    scored.groupBy(col("probe_id"))
      .agg(topk(col("sim"), col("id")).as("nn"))
      .select(col("probe_id"), posexplode(col("nn")).as(Seq("pos", "n")))
      .select(col("probe_id"), (col("pos") + 1).cast("int").as("rank"),
        col("n.id").as("neighbor_id"), round(col("n.sim"), 6).as("sim"))
      .orderBy(col("probe_id"), col("rank"))
  }

  def vecIvfTopk(spark: SparkSession, sfDir: String): DataFrame = {
    VectorFunctions.register(spark)
    val vecs = Tables.load(spark, sfDir, "embeddings")
    val cents = sampledCentroids(vecs)
    probeLists(vecs, cents, assignNearest(vecs, cents))
  }

  // Build/query split: at 100 TB the IVF index (the N×C assignment
  // scan) is built ONCE and persisted as the inverted-list table; every
  // query then pays only the probed-list scans. `vec_ivf_topk` is the
  // self-contained oracle-gate form (build + query in one plan);
  // `vec_ivf_topk_cached` reads the PERSISTED assignment — the shape a
  // production query actually runs, benchable separately from the
  // build. Same result, same oracle (the index is a deterministic
  // function of the corpus) — the corpus_canonical_cached pattern.
  private val ivfIndexDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Build (once per sfDir) and persist the inverted-list table
    * `(vec_id, embedding, cent_id)`; returns its directory. */
  def prepareIvfIndex(spark: SparkSession, sfDir: String): String =
    ivfIndexDirs.computeIfAbsent(sfDir, { _ =>
      val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
      val vecs = Tables.load(spark, sfDir, "embeddings")
      val cents = vecs.filter(col("vec_id") % CentroidStride === 0)
        .select(col("vec_id").as("cent_id"), col("embedding").as("cemb"))
      assignNearest(vecs, cents).write.mode("overwrite").parquet(dir)
      dir
    })

  /** `vec_ivf_topk` over the persisted index — the query-path cost. */
  def vecIvfTopkCached(spark: SparkSession, sfDir: String): DataFrame = {
    VectorFunctions.register(spark)
    val dir = prepareIvfIndex(spark, sfDir)
    val vecs = Tables.load(spark, sfDir, "embeddings")
    val cents = sampledCentroids(vecs)
    probeLists(vecs, cents, spark.read.parquet(dir))
  }

  val vecIvfTopkSql: String =
    s"""WITH cents AS (
      |  SELECT vec_id AS cent_id, embedding AS cemb FROM embeddings
      |  WHERE vec_id % $CentroidStride = 0),
      |assigned AS (
      |  SELECT vec_id, embedding, cent_id FROM (
      |    SELECT e.vec_id, e.embedding, c.cent_id,
      |      row_number() OVER (PARTITION BY e.vec_id
      |        ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(c.cemb AS DOUBLE[])) DESC, c.cent_id) AS rn
      |    FROM embeddings e CROSS JOIN cents c)
      |  WHERE rn = 1),
      |probes AS (
      |  SELECT vec_id AS probe_id, embedding AS pemb FROM embeddings
      |  WHERE vec_id % $ProbeStride = 0),
      |probe_cents AS (
      |  SELECT probe_id, pemb, cent_id FROM (
      |    SELECT p.probe_id, p.pemb, c.cent_id,
      |      row_number() OVER (PARTITION BY p.probe_id
      |        ORDER BY list_cosine_similarity(CAST(p.pemb AS DOUBLE[]), CAST(c.cemb AS DOUBLE[])) DESC, c.cent_id) AS rn
      |    FROM probes p CROSS JOIN cents c)
      |  WHERE rn <= $NProbe),
      |scored AS (
      |  SELECT probe_id, a.vec_id,
      |    list_cosine_similarity(CAST(pemb AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])) AS sim
      |  FROM probe_cents pc JOIN assigned a ON pc.cent_id = a.cent_id AND a.vec_id != pc.probe_id),
      |ranked AS (
      |  SELECT probe_id, vec_id, sim,
      |    row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, vec_id) AS rank FROM scored)
      |SELECT probe_id, rank, vec_id AS neighbor_id, round(sim,6) AS sim
      |FROM ranked WHERE rank <= $TopK ORDER BY probe_id, rank""".stripMargin

  // --- ANN recall, self-measured ---------------------------------------
  // "Measure, don't guess": recall@k of the IVF path against the
  // brute-force ground truth, per probe, as ONE query — the number an
  // index owner watches when tuning NProbe / the centroid count. The
  // ground truth is exact only over the probe SAMPLE, which is the
  // point: evaluation cost is |probes|·N (the brute leg), bounded by
  // the sample, while the production path being graded stays
  // probed-list-priced. Integer outputs (hits, recall_e6 by integer
  // division) keep the row hashing-proof.
  /** Shared recall core: per probe, how many of brute force's true
    * top-k the `approx` frame returned. Both frames are
    * probe-count-sized; the compare is one keyed left join + one hash
    * agg. recall_e6 by integer division — hashing-proof. */
  private def recallVsBrute(spark: SparkSession, sfDir: String,
      approx: DataFrame): DataFrame =
    recallOf(vecTopk(spark, sfDir), approx)

  /** The recall agg over EXPLICIT ground-truth/approx frames, both
    * carrying (probe_id, neighbor_id, …) — shared with the cross-modal
    * eval in [[MediaQueries]]. */
  private[graft] def recallOf(brute: DataFrame, approx: DataFrame): DataFrame = {
    brute.select(col("probe_id"), col("neighbor_id"))
      .join(approx.select(col("probe_id"), col("neighbor_id"), lit(1).as("hit")),
        Seq("probe_id", "neighbor_id"), "left")
      .groupBy(col("probe_id"))
      .agg(count(lit(1)).as("k"),
        sum(coalesce(col("hit"), lit(0))).as("hits"))
      .select(col("probe_id"), col("k"), col("hits"),
        expr("hits * 1000000 div k").as("recall_e6"))
      .orderBy(col("probe_id"))
  }

  /** The oracle template over any approx-top-k SQL producing
    * (probe_id, neighbor_id, …). */
  private def recallSqlOver(approxSql: String): String =
    recallSqlOf(vecTopkSql, approxSql)

  /** Same, over an EXPLICIT ground-truth SQL — the cross-modal eval's
    * oracle composes its own brute leg. */
  private[graft] def recallSqlOf(bruteSql: String, approxSql: String): String =
    s"""WITH brute AS ($bruteSql),
      |approx AS ($approxSql)
      |SELECT b.probe_id, CAST(count(*) AS BIGINT) AS k,
      |  CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits,
      |  CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) * 1000000
      |    // count(*) AS BIGINT) AS recall_e6
      |FROM brute b LEFT JOIN approx a
      |  ON a.probe_id = b.probe_id AND a.neighbor_id = b.neighbor_id
      |GROUP BY b.probe_id ORDER BY b.probe_id""".stripMargin

  def vecIvfRecall(spark: SparkSession, sfDir: String): DataFrame =
    recallVsBrute(spark, sfDir, vecIvfTopk(spark, sfDir))

  val vecIvfRecallSql: String = recallSqlOver(vecIvfTopkSql)

  // --- IVF recall/cost frontier: the NProbe sweep -----------------------
  // One query grades EVERY operating point 1..SweepMaxNProbe against the
  // brute truth: aggregate recall (hits over the truth set) plus the
  // probed-candidate count that setting pays — the frontier an index
  // owner reads to pick NProbe, measured by the engine that serves
  // (the `dedup_threshold_sweep` shape applied to ANN).
  //
  // Scale shape: the sweep costs ONE pipeline, not SweepMaxNProbe of
  // them — centroids are ranked once per probe through a bounded
  // TopKAgg(SweepMaxNProbe), every probed candidate is scored ONCE
  // tagged with its list's rank, and the per-setting expansion joins an
  // 8-row literal frame (candidate × ≤SweepMaxNProbe rows, still
  // probed-list-priced). Per-(setting, probe) top-k and probed-row
  // counts come out of the SAME hash agg; recall joins the truth frame
  // once. Outputs are integers (hits, probed_rows, recall_e6 by integer
  // division) — hashing-proof across engines.
  private[graft] val SweepMaxNProbe = 8

  def vecIvfNprobeSweep(spark: SparkSession, sfDir: String): DataFrame = {
    VectorFunctions.register(spark)
    val vecs = Tables.load(spark, sfDir, "embeddings")
    val cents = sampledCentroids(vecs)
    val assigned = assignNearest(vecs, cents)
    val probes = vecs.filter(col("vec_id") % ProbeStride === 0)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pemb"))
    // rank the sweep's full centroid budget once per probe — the same
    // shared routing block every IVF face runs, just wider
    val probeCents = routeProbes(probes, cents, "probe_id", "pemb", SweepMaxNProbe)
    // score each probed candidate ONCE, tagged with its list's rank;
    // a candidate in list rank r belongs to every setting n >= r.
    // Eager checkpoint: the scoring pass (probed-list-sized) feeds the
    // per-setting agg twice downstream (answers + costs) — without it
    // every consumer replans the whole scan→assign→score subtree and
    // the "one pipeline" claim silently becomes N pipelines
    val scored = probeCents.join(assigned, Seq("cent_id"))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("cent_rank"), col("vec_id").as("id"),
        cosine(col("pemb"), col("embedding")).as("sim"))
      .localCheckpoint(true)
    val settings = spark.range(1, SweepMaxNProbe + 1)
      .select(col("id").cast("int").as("nprobe"))
    val topk = udaf(new TopKAgg(TopK))
    // ONE hash agg yields both the setting's answer list and its cost
    val perProbe = scored
      .join(broadcast(settings), col("nprobe") >= col("cent_rank"))
      .groupBy(col("nprobe"), col("probe_id"))
      .agg(topk(col("sim"), col("id")).as("nn"), count(lit(1)).as("probed"))
      .localCheckpoint(true) // settings × probes rows, read twice
    val approxIds = perProbe
      .select(col("nprobe"), col("probe_id"), explode(col("nn")).as("n"))
      .select(col("nprobe"), col("probe_id"), col("n.id").as("neighbor_id"))
    // the truth frame (probes × k rows) joins hits AND counts the
    // denominator — one brute pass, not two
    val brute = vecTopk(spark, sfDir).select(col("probe_id"), col("neighbor_id"))
      .localCheckpoint(true)
    val hits = approxIds.join(brute, Seq("probe_id", "neighbor_id"))
      .groupBy(col("nprobe")).agg(count(lit(1)).as("hits"))
    val kTotal = brute.agg(count(lit(1)).as("k_total"))
    perProbe.groupBy(col("nprobe")).agg(sum(col("probed")).as("probed_rows"))
      .join(hits, Seq("nprobe"), "left")
      .crossJoin(broadcast(kTotal))
      .select(col("nprobe"), col("probed_rows"),
        coalesce(col("hits"), lit(0L)).as("hits"), col("k_total"),
        expr("coalesce(hits, 0) * 1000000 div k_total").as("recall_e6"))
      .orderBy(col("nprobe"))
  }

  val vecIvfNprobeSweepSql: String =
    s"""WITH sw_cents AS (
      |  SELECT vec_id AS cent_id, embedding AS cemb FROM embeddings
      |  WHERE vec_id % $CentroidStride = 0),
      |sw_assigned AS (
      |  SELECT vec_id, embedding, cent_id FROM (
      |    SELECT e.vec_id, e.embedding, c.cent_id,
      |      row_number() OVER (PARTITION BY e.vec_id
      |        ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(c.cemb AS DOUBLE[])) DESC, c.cent_id) AS rn
      |    FROM embeddings e CROSS JOIN sw_cents c)
      |  WHERE rn = 1),
      |sw_probes AS (
      |  SELECT vec_id AS probe_id, embedding AS pemb FROM embeddings
      |  WHERE vec_id % $ProbeStride = 0),
      |sw_probe_cents AS (
      |  SELECT probe_id, pemb, cent_id, rn AS cent_rank FROM (
      |    SELECT p.probe_id, p.pemb, c.cent_id,
      |      row_number() OVER (PARTITION BY p.probe_id
      |        ORDER BY list_cosine_similarity(CAST(p.pemb AS DOUBLE[]), CAST(c.cemb AS DOUBLE[])) DESC, c.cent_id) AS rn
      |    FROM sw_probes p CROSS JOIN sw_cents c)
      |  WHERE rn <= $SweepMaxNProbe),
      |settings AS (SELECT CAST(n AS INT) AS nprobe FROM generate_series(1, $SweepMaxNProbe) t(n)),
      |sw_scored AS MATERIALIZED (
      |  SELECT s.nprobe, pc.probe_id, a.vec_id,
      |    list_cosine_similarity(CAST(pc.pemb AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])) AS sim
      |  FROM sw_probe_cents pc
      |  JOIN settings s ON s.nprobe >= pc.cent_rank
      |  JOIN sw_assigned a ON pc.cent_id = a.cent_id AND a.vec_id != pc.probe_id),
      |approx AS (
      |  SELECT nprobe, probe_id, vec_id FROM (
      |    SELECT nprobe, probe_id, vec_id,
      |      row_number() OVER (PARTITION BY nprobe, probe_id ORDER BY sim DESC, vec_id) AS rank
      |    FROM sw_scored)
      |  WHERE rank <= $TopK),
      |brute AS MATERIALIZED ($vecTopkSql),
      |hits AS (
      |  SELECT a.nprobe, CAST(count(*) AS BIGINT) AS hits
      |  FROM approx a JOIN brute b
      |    ON b.probe_id = a.probe_id AND b.neighbor_id = a.vec_id
      |  GROUP BY a.nprobe),
      |cost AS (
      |  SELECT nprobe, CAST(count(*) AS BIGINT) AS probed_rows
      |  FROM sw_scored GROUP BY nprobe),
      |ktotal AS (SELECT CAST(count(*) AS BIGINT) AS k_total FROM brute)
      |SELECT c.nprobe, c.probed_rows,
      |  CAST(coalesce(h.hits, 0) AS BIGINT) AS hits, k.k_total,
      |  CAST(coalesce(h.hits, 0) * 1000000 // k.k_total AS BIGINT) AS recall_e6
      |FROM cost c LEFT JOIN hits h ON h.nprobe = c.nprobe CROSS JOIN ktotal k
      |ORDER BY c.nprobe""".stripMargin

  // --- graph-ANN recall vs brute force ----------------------------------
  // The same in-engine recall measurement `vec_ivf_recall` gives the
  // quantization path, for the graph/beam path: per probe, how many of
  // brute force's true top-k the beam search returned. The two answer
  // frames are probe-count-sized; the compare is one keyed left join +
  // one hash agg. recall_e6 by integer division — hashing-proof.
  def vecGraphRecall(spark: SparkSession, sfDir: String): DataFrame =
    recallVsBrute(spark, sfDir, vecGraphTopk(spark, sfDir))

  // lazy: vecGraphTopkSql is declared later in the object, and a strict
  // val here would capture null during initialization
  lazy val vecGraphRecallSql: String = recallSqlOver(vecGraphTopkSql)

  // --- quantization-path recall: PQ and IVF-PQ --------------------------
  // Completing the in-engine eval matrix: every approximate top-k path
  // (IVF, graph, PQ, IVF-PQ) grades itself against the same brute-force
  // ground truth, so an index owner tuning codebook size / NProbe /
  // refine pool reads recall and cost from the SAME engine that serves.
  // The PQ-family oracles are GENERATED (the approx leg embeds the
  // trained codebooks as literals), so these exist only after the query
  // has trained — the same `…SqlOpt` contract as `vec_pq_topk` itself.
  def vecPqRecall(spark: SparkSession, sfDir: String): DataFrame =
    recallVsBrute(spark, sfDir, vecPqTopk(spark, sfDir))

  def vecPqRecallSqlOpt: Option[String] = vecPqTopkSqlOpt.map(recallSqlOver)

  def vecIvfPqRecall(spark: SparkSession, sfDir: String): DataFrame =
    recallVsBrute(spark, sfDir, vecIvfPqTopk(spark, sfDir))

  def vecIvfPqRecallSqlOpt: Option[String] = vecIvfPqTopkSqlOpt.map(recallSqlOver)

  // --- IVF with a TRAINED coarse quantizer: one Lloyd iteration --------
  // The sampled-seed quantizer above is the bootstrap; real IVF trains
  // k-means. One Lloyd step, all DataFrame ops: assign every vector to
  // its seed centroid (the same one-row-per-vector hash agg), recompute
  // each centroid as the member mean, re-assign, probe. The mean is
  // computed in FIXED POINT — `floor(v * 2^20)` is bit-exact in every
  // engine (a power-of-two multiply only shifts the exponent, and floor
  // has no rounding-mode ambiguity), the int sums are exact, and the
  // final divide + float cast are single deterministic IEEE ops — so the
  // DuckDB oracle reproduces the trained centroids bit-for-bit, with
  // none of the float-sum order-dependence that breaks naive means.
  // Scale: the dim-explode multiplies rows ×D but partial-aggregates
  // map-side; the exchange carries C×D cells, the trained centroid set
  // stays broadcast-sized by construction.
  private val Dims = 64
  private val FixedPoint = 1048576L // 2^20

  /** One Lloyd step: assign every vector to its nearest centroid, then
    * recompute each centroid as its members' fixed-point-exact mean.
    * Empty clusters vanish (standard k-means semantics). Exchange costs:
    * one row per vector for assignment, C×D cells for the means. */
  private[graft] def lloydStep(vecs: DataFrame, cents: DataFrame): DataFrame = {
    val cells = assignNearest(vecs, cents)
      .select(col("cent_id"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .select(col("cent_id"), col("dim"),
        floor(col("v").cast("double") * FixedPoint).cast("long").as("qv"))
    cells.groupBy(col("cent_id"), col("dim"))
      .agg(sum(col("qv")).as("s"), count(lit(1)).as("n"))
      .select(col("cent_id"), col("dim"),
        (col("s").cast("double") / (col("n") * lit(FixedPoint.toDouble))).cast("float").as("m"))
      .groupBy(col("cent_id"))
      .agg(map_from_entries(collect_list(struct(col("dim"), col("m")))).as("mm"))
      .select(col("cent_id"),
        transform(sequence(lit(0), lit(Dims - 1)), i => element_at(col("mm"), i)).as("cemb"))
  }

  /** Multi-iteration k-means over (vec_id, embedding): seeds by id
    * stride, then `iters` Lloyd steps. Intermediate centroid frames are
    * materialized to the driver (bounded — an IVF quantizer IS
    * driver-held model state, same as the broadcast in assignNearest)
    * so the lineage does not stack `iters` corpus joins into one plan;
    * the final step stays lazy for the caller's own plan. */
  def trainCentroids(vecs: DataFrame, seedStride: Int, iters: Int): DataFrame = {
    require(iters >= 0, s"iters must be non-negative: $iters")
    var cents = vecs.filter(col("vec_id") % seedStride === 0)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cemb"))
    (0 until iters).foreach { i =>
      val next = lloydStep(vecs, cents)
      cents =
        if (i < iters - 1)
          vecs.sparkSession.createDataFrame(next.collectAsList(), next.schema)
        else next
    }
    cents
  }

  /** Epsilon-terminated k-means — the production trainer whose round
    * count is data-dependent (the `pagerankConverged` pattern): Lloyd
    * steps repeat until total centroid L2 movement drops below `eps`,
    * failing loudly when `maxIters` can't reach it. Each round's
    * centroid frame materializes to the driver (bounded — the quantizer
    * IS model state, exactly like [[trainCentroids]]), so movement is
    * plain driver-side model math and lineage never stacks rounds.
    * A centroid whose cluster empties counts as movement 1.0 that round
    * and is carried forward at its old position — the loop can't
    * "converge" by silently losing cells, and the cell may re-acquire
    * members later. Returns the trained quantizer and the rounds it
    * took. */
  def kmeansConverged(vecs: DataFrame, seedStride: Int,
      eps: Double = 1e-4, maxIters: Int = 50): (DataFrame, Int) = {
    def collectCents(df: DataFrame): Map[Long, Array[Float]] =
      df.collect().map(r => r.getLong(0) ->
        r.getSeq[Float](1).toArray).toMap
    var cents = vecs.filter(col("vec_id") % seedStride === 0)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cemb"))
    var prev = collectCents(cents)
    var emptied = Set.empty[Long]
    var moved = Double.MaxValue
    var it = 0
    while (moved >= eps && it < maxIters) {
      val next = collectCents(lloydStep(vecs, cents))
      moved = prev.map { case (id, old) =>
        next.get(id) match {
          case Some(nw) =>
            math.sqrt(old.zip(nw).map { case (a, b) =>
              (a - b).toDouble * (a - b).toDouble }.sum)
          // NEWLY emptied: count full movement — forces another round in
          // which the carried centroid may re-acquire members
          case None if !emptied.contains(id) => 1.0
          // still empty, parked at its old position: zero movement — an
          // empty cell held in place is a legitimate k-means fixed point
          case None => 0.0
        }
      }.sum
      // carry emptied centroids forward AT THEIR OLD POSITION instead of
      // dropping them: dropped, the id would vanish from `prev`, the next
      // round would see zero movement for it, and the loop would
      // "converge" with the cell silently gone from the quantizer.
      emptied = prev.keySet -- next.keySet
      prev = prev.map { case (id, old) => id -> next.getOrElse(id, old) }
      cents = vecs.sparkSession.createDataFrame(
        java.util.Arrays.asList(prev.toSeq.sortBy(_._1).map { case (id, e) =>
          org.apache.spark.sql.Row(id, e.toSeq) }: _*),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("cent_id",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("cemb",
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.FloatType, containsNull = true)))))
      it += 1
    }
    require(moved < eps,
      s"k-means failed to converge after $maxIters rounds (last movement = $moved)")
    (cents, it)
  }

  def vecIvfKmeans(spark: SparkSession, sfDir: String): DataFrame = {
    VectorFunctions.register(spark)
    val vecs = Tables.load(spark, sfDir, "embeddings")
    val trained = trainCentroids(vecs, CentroidStride, iters = 1)
    probeLists(vecs, trained, assignNearest(vecs, trained))
  }

  /** Shared DuckDB CTE chain: seed → one Lloyd step → assign-all — the
    * oracle mirror of `trainCentroids(_, CentroidStride, 1)` +
    * [[assignNearest]], used by both [[vecIvfKmeansSql]] and
    * [[corpusClusterBalanceSql]]. */
  private val kmeansAssignCte: String =
    s"""seeds AS (
      |  SELECT vec_id AS cent_id, embedding AS cemb FROM embeddings
      |  WHERE vec_id % $CentroidStride = 0),
      |a0 AS (
      |  SELECT vec_id, embedding, cent_id FROM (
      |    SELECT e.vec_id, e.embedding, c.cent_id,
      |      row_number() OVER (PARTITION BY e.vec_id
      |        ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(c.cemb AS DOUBLE[])) DESC, c.cent_id) AS rn
      |    FROM embeddings e CROSS JOIN seeds c)
      |  WHERE rn = 1),
      |cells AS (
      |  SELECT cent_id, u.dim AS dim,
      |    CAST(floor(CAST(u.v AS DOUBLE) * $FixedPoint) AS BIGINT) AS qv
      |  FROM a0, LATERAL (SELECT unnest(embedding) AS v, generate_subscripts(embedding, 1) - 1 AS dim) u),
      |means AS (
      |  SELECT cent_id, dim,
      |    CAST(CAST(sum(qv) AS DOUBLE) / (count(*) * $FixedPoint.0) AS REAL) AS m
      |  FROM cells GROUP BY cent_id, dim),
      |cents AS (
      |  SELECT cent_id, array_agg(m ORDER BY dim) AS cemb FROM means GROUP BY cent_id),
      |assigned AS (
      |  SELECT vec_id, embedding, cent_id FROM (
      |    SELECT e.vec_id, e.embedding, c.cent_id,
      |      row_number() OVER (PARTITION BY e.vec_id
      |        ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(c.cemb AS DOUBLE[])) DESC, c.cent_id) AS rn
      |    FROM embeddings e CROSS JOIN cents c)
      |  WHERE rn = 1)""".stripMargin

  val vecIvfKmeansSql: String =
    s"""WITH $kmeansAssignCte,
      |probes AS (
      |  SELECT vec_id AS probe_id, embedding AS pemb FROM embeddings
      |  WHERE vec_id % $ProbeStride = 0),
      |probe_cents AS (
      |  SELECT probe_id, pemb, cent_id FROM (
      |    SELECT p.probe_id, p.pemb, c.cent_id,
      |      row_number() OVER (PARTITION BY p.probe_id
      |        ORDER BY list_cosine_similarity(CAST(p.pemb AS DOUBLE[]), CAST(c.cemb AS DOUBLE[])) DESC, c.cent_id) AS rn
      |    FROM probes p CROSS JOIN cents c)
      |  WHERE rn <= $NProbe),
      |scored AS (
      |  SELECT probe_id, a.vec_id,
      |    list_cosine_similarity(CAST(pemb AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])) AS sim
      |  FROM probe_cents pc JOIN assigned a ON pc.cent_id = a.cent_id AND a.vec_id != pc.probe_id),
      |ranked AS (
      |  SELECT probe_id, vec_id, sim,
      |    row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, vec_id) AS rank FROM scored)
      |SELECT probe_id, rank, vec_id AS neighbor_id, round(sim,6) AS sim
      |FROM ranked WHERE rank <= $TopK ORDER BY probe_id, rank""".stripMargin

  // --- Matryoshka (MRL) prefix ANN -------------------------------------
  // Matryoshka Representation Learning (Kusupati et al. 2022) trains
  // embeddings whose PREFIX is itself a valid lower-dim embedding, so
  // ANN can coarse-rank on the first `MrlDims` dims (4× fewer flops and
  // — with the prefix stored as its own column, as a production layout
  // would — 4× fewer bytes scanned) and exact-rerank only a bounded
  // candidate pool on the full vector. Same skeleton as `vec_sq_topk`:
  // probes broadcast, coarse top `TopK×MrlRefine` and final top-k both
  // through the bounded partial-merge TopKAgg, never a window.
  private val MrlDims = 32
  private val MrlRefine = 8

  def vecMatryoshkaTopk(spark: SparkSession, sfDir: String): DataFrame = {
    VectorFunctions.register(spark)
    val vecs = Tables.load(spark, sfDir, "embeddings")
    val probeBase = vecs.filter(col("vec_id") % ProbeStride === 0)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pemb"))
    val probes = probeBase
      .select(col("probe_id"), slice(col("pemb"), 1, MrlDims).as("pemb16"))

    val candK = udaf(new TopKAgg(TopK * MrlRefine))
    val cands = vecs
      .select(col("vec_id"), slice(col("embedding"), 1, MrlDims).as("emb16"))
      .join(broadcast(probes), col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"),
        cosine(col("pemb16"), col("emb16")).as("approx_cos"),
        col("vec_id").as("id"))
      .groupBy(col("probe_id"))
      .agg(candK(col("approx_cos"), col("id")).as("nn"))
      .select(col("probe_id"), explode(col("nn")).as("n"))
      .select(col("probe_id"), col("n.id").as("vec_id"))

    val topk = udaf(new TopKAgg(TopK))
    cands
      .join(vecs, Seq("vec_id"))
      .join(probeBase, Seq("probe_id"))
      .select(col("probe_id"), col("vec_id").as("id"),
        cosine(col("pemb"), col("embedding")).as("sim"))
      .groupBy(col("probe_id"))
      .agg(topk(col("sim"), col("id")).as("nn"))
      .select(col("probe_id"), posexplode(col("nn")).as(Seq("pos", "n")))
      .select(col("probe_id"), (col("pos") + 1).cast("int").as("rank"),
        col("n.id").as("neighbor_id"), round(col("n.sim"), 6).as("sim"))
      .orderBy(col("probe_id"), col("rank"))
  }

  val vecMatryoshkaTopkSql: String =
    s"""WITH probes AS (
      |  SELECT vec_id AS probe_id, embedding AS pemb FROM embeddings
      |  WHERE vec_id % $ProbeStride = 0),
      |coarse AS (
      |  SELECT p.probe_id, e.vec_id,
      |    list_cosine_similarity(CAST(p.pemb[1:$MrlDims] AS DOUBLE[]),
      |      CAST(e.embedding[1:$MrlDims] AS DOUBLE[])) AS ac
      |  FROM probes p JOIN embeddings e ON e.vec_id != p.probe_id),
      |cand AS (
      |  SELECT probe_id, vec_id FROM (
      |    SELECT probe_id, vec_id,
      |      row_number() OVER (PARTITION BY probe_id ORDER BY ac DESC, vec_id) AS rn
      |    FROM coarse)
      |  WHERE rn <= ${TopK * MrlRefine}),
      |scored AS (
      |  SELECT c.probe_id, c.vec_id,
      |    list_cosine_similarity(CAST(p.pemb AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) AS sim
      |  FROM cand c JOIN probes p USING (probe_id) JOIN embeddings e USING (vec_id)),
      |ranked AS (
      |  SELECT probe_id, vec_id, sim,
      |    row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, vec_id) AS rank
      |  FROM scored)
      |SELECT probe_id, rank, vec_id AS neighbor_id, round(sim,6) AS sim
      |FROM ranked WHERE rank <= $TopK ORDER BY probe_id, rank""".stripMargin

  // --- cluster-balanced corpus sampling --------------------------------
  // The SemDeDup / DataComp curation move: cluster the corpus embeddings
  // (same trained quantizer as `vec_ivf_kmeans`) and keep a bounded,
  // deterministic per-cluster quota so no topic dominates the training
  // mix. Selection within a cluster is ranked by a doc-id hash (stable
  // across reruns and engines), and ranking runs through the bounded
  // partial-merge [[graft.functions.TopKAgg]] — the shuffle carries
  // ≤ clusters × cap rows at ANY corpus size, where the window
  // formulation would shuffle every corpus row into one partition per
  // cluster. Cluster sizes ride along from a clusters-sized broadcast.
  private val BalanceCap = 10

  def corpusClusterBalance(spark: SparkSession, sfDir: String): DataFrame = {
    VectorFunctions.register(spark)
    val vecs = Tables.load(spark, sfDir, "embeddings")
    val cents = trainCentroids(vecs, CentroidStride, iters = 1)
    val assigned = assignNearest(vecs, cents).select(col("vec_id"), col("cent_id"))
    val sizes = assigned.groupBy(col("cent_id")).agg(count(lit(1)).as("n_docs"))
    val hkey = conv(substring(md5(col("vec_id").cast("string")), 1, 8), 16, 10)
      .cast("long")
    val topCap = udaf(new TopKAgg(BalanceCap))
    assigned
      .select(col("cent_id"), (-hkey).cast("double").as("s"), col("vec_id"))
      .groupBy(col("cent_id"))
      .agg(topCap(col("s"), col("vec_id")).as("kept"))
      .join(broadcast(sizes), Seq("cent_id"))
      .select(col("cent_id").as("cluster_id"), col("n_docs"),
        posexplode(col("kept")).as(Seq("pos", "kv")))
      .select(col("cluster_id"), col("n_docs"),
        (col("pos") + 1).cast("int").as("rank"), col("kv.id").as("doc_id"))
      .orderBy(col("cluster_id"), col("rank"))
  }

  val corpusClusterBalanceSql: String =
    s"""WITH $kmeansAssignCte,
      |sizes AS (SELECT cent_id, count(*) AS n_docs FROM assigned GROUP BY cent_id),
      |ranked AS (
      |  SELECT cent_id, vec_id,
      |    row_number() OVER (PARTITION BY cent_id
      |      ORDER BY CAST(('0x'||substr(md5(CAST(vec_id AS VARCHAR)),1,8)) AS BIGINT), vec_id)
      |      AS rank
      |  FROM assigned)
      |SELECT cent_id AS cluster_id, n_docs, rank, vec_id AS doc_id
      |FROM ranked JOIN sizes USING (cent_id)
      |WHERE rank <= $BalanceCap
      |ORDER BY cluster_id, rank""".stripMargin


  /** Sign-bit LSH candidate pairs `(id_a, id_b)` for ANY frame carrying
    * an id column and a ≥56-dim numeric array column — shared by
    * `vec_ann_lsh` (raw embeddings) and `dedup_embedding` (feature-
    * hashed TF vectors). 24 sign bits, banded 4×6, degenerate buckets
    * dropped (skew guard; the oversized list is ≤ bands × 2^bits rows →
    * always broadcastable). */
  private[queries] def lshCandidates(vecs: DataFrame, idCol: String, embCol: String): DataFrame = {
    val sig = (0 until Bits).map { i =>
      (element_at(col(embCol), i + 1) > element_at(col(embCol), i + 33))
        .cast(LongType) * lit(1L << i)
    }.reduce(_ + _)
    val sigs = vecs.select(col(idCol), sig.as("sig"))
    // all band keys in ONE pass over the signature (explode of an array
    // of structs, not an N-way union re-evaluating the 24-bit sig), and
    // cached: the tiny (id, band, bkey) frame is read three times below
    // (oversized agg + both sides of the self-join)
    val bandArr = array((0 until NumBands).map { b =>
      struct(lit(b).as("band"),
        shiftright(col("sig"), b * BandBits).bitwiseAND(lit((1 << BandBits) - 1)).as("bkey"))
    }: _*)
    val bands = sigs.select(col(idCol), explode(bandArr).as("bb"))
      .select(col(idCol), col("bb.band").as("band"), col("bb.bkey").as("bkey"))
      .cache()
    val oversized = bands.groupBy(col("band"), col("bkey"))
      .agg(count(lit(1)).as("bsz")).filter(col("bsz") > BucketCap)
      .select(col("band"), col("bkey"))
    val capped = bands.join(broadcast(oversized), Seq("band", "bkey"), "left_anti")
    val l = capped.select(col("band"), col("bkey"), col(idCol).as("id_a"))
    val r = capped.select(col("band"), col("bkey"), col(idCol).as("id_b"))
    l.join(r, Seq("band", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** The DuckDB mirror of [[lshCandidates]]: CTEs `sig`→`bands`→`capped`→
    * `cand` over a source CTE/table. Splice after a `WITH ...,`. */
  private[queries] def lshCandSql(src: String, idCol: String, embCol: String): String = {
    val bits = (0 until Bits).map { i =>
      s"(CASE WHEN list_extract($embCol,${i + 1}) > list_extract($embCol,${i + 33}) THEN 1 ELSE 0 END) * ${1L << i}"
    }.mkString("\n      |    + ")
    val bandList = (0 until NumBands).mkString("[", ",", "]")
    s"""sig AS (
      |  SELECT $idCol, $bits AS sig
      |  FROM $src),
      |bands AS (
      |  SELECT $idCol, band, (sig >> (band*$BandBits)) & ${(1 << BandBits) - 1} AS bkey
      |  FROM sig, (SELECT unnest($bandList) AS band)),
      |capped AS (
      |  SELECT $idCol, band, bkey FROM (
      |    SELECT *, count(*) OVER (PARTITION BY band, bkey) AS bsz FROM bands)
      |  WHERE bsz <= $BucketCap),
      |cand AS (
      |  SELECT DISTINCT a.$idCol AS id_a, b.$idCol AS id_b
      |  FROM capped a JOIN capped b
      |    ON a.band = b.band AND a.bkey = b.bkey AND a.$idCol < b.$idCol)""".stripMargin
  }

  // --- bucketed ANN via sign-bit (random-hyperplane) LSH ---------------
  def vecAnnLsh(spark: SparkSession, sfDir: String): DataFrame = {
    VectorFunctions.register(spark)
    val vecs = Tables.load(spark, sfDir, "embeddings")
    val cand = lshCandidates(vecs, "vec_id", "embedding")
    val emb = vecs.select(col("vec_id"), col("embedding"))
    cand
      .join(emb.select(col("vec_id").as("id_a"), col("embedding").as("ea")), Seq("id_a"))
      .join(emb.select(col("vec_id").as("id_b"), col("embedding").as("eb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), cosine(col("ea"), col("eb")).as("sim"))
      .filter(col("sim") >= SimThreshold)
      .select(col("id_a"), col("id_b"), round(col("sim"), 6).as("sim"))
      .orderBy(col("id_a"), col("id_b"))
  }

  val vecAnnLshSql: String = {
    s"""WITH ${lshCandSql("embeddings", "vec_id", "embedding")},
      |scored AS (
      |  SELECT id_a, id_b,
      |    list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) AS sim
      |  FROM cand JOIN embeddings a ON cand.id_a = a.vec_id
      |            JOIN embeddings b ON cand.id_b = b.vec_id)
      |SELECT id_a, id_b, round(sim, 6) AS sim
      |FROM scored WHERE sim >= $SimThreshold ORDER BY id_a, id_b""".stripMargin
  }

  // --- product-quantization ANN (ADC scoring + exact rerank) -----------
  // The compressed-domain scale path: each vector is encoded as M
  // subspace code ids against per-subspace codebooks (trained on the
  // driver over an ABSOLUTE-size sample — see pqCodebooks). Query
  // scoring is asymmetric-distance (ADC): the probe computes one
  // K-entry distance table per subspace, and each corpus vector costs M
  // table LOOKUPS on its codes — at 100 TB the scan reads M ints per
  // vector instead of D floats (16× compression at M=8, D=64), which is
  // the entire point of PQ. Top candidates are reranked with exact
  // cosine so the emitted sims are true.
  //
  // Plan shape: codebooks are driver-held model state (bounded:
  // M×K×subDim floats) embedded as literals, so ENCODING is a pure
  // per-row projection — one corpus scan, no join, no shuffle. Probes
  // broadcast; candidate top-k and final top-k both run through the
  // bounded partial-merge TopKAgg. The DuckDB oracle is GENERATED from
  // the trained codebooks (vecPqTopkSqlOpt) with every arithmetic chain
  // mirrored left-associated, so the driver hash-checks the full
  // encode→ADC→rerank pipeline; VectorSpec additionally bounds recall@5
  // against brute force.
  private val PqM = 8 // subspaces
  private val PqSubDim = Dims / PqM // 8 dims each
  private val PqK = 64 // codes per subspace — FIXED, like real PQ's 256:
  // encode cost is M×K×subDim flops per row, so K must not grow with
  // the corpus
  private val PqRefine = 4 // rerank pool = PqRefine × TopK
  private val PqPoolTarget = 4096 // training-pool size — ABSOLUTE, not ∝N

  /** Dot product of two float-array columns — HOF form, used only on
    * per-probe frames (a handful of rows); the per-corpus-row norm and
    * encode kernels run through the fused codegen expressions `vec_dot`
    * and `pq_encode` (functions/VectorFunctions.scala), which compute
    * the identical left-fold IEEE chains without per-row allocation. */
  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Trained per-subspace PQ codebooks for the corpus at `sfDir` —
    * driver-held model state, memoized so [[vecPqTopkSqlOpt]] can emit a
    * DuckDB oracle embedding EXACTLY the codebooks the query ran with.
    *
    * The training pool is an absolute-size deterministic sample: a
    * hash-mod filter whose modulus is derived from a cheap `count()` so
    * the pool targets ~[[PqPoolTarget]] rows at ANY corpus size. Unlike
    * a stride sample (N/stride rows — linear in N, a driver OOM at
    * 100 TB), the collect here is O(1) in the corpus: ~4–8 k rows
    * whether the table holds 50 k or 50 B vectors. Training is then
    * plain driver-side Scala over sample-sized model data — the cluster
    * never sees the Lloyd iteration, only the final M×K×subDim floats
    * broadcast as literals. */
  private val pqCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[Seq[Seq[Float]]]]()
  @volatile private var pqLastDir: Option[String] = None

  private[graft] def pqCodebooks(spark: SparkSession, sfDir: String): Seq[Seq[Seq[Float]]] = {
    val cbs = pqCache.computeIfAbsent(
      sfDir, _ => trainPqCodebooks(Tables.load(spark, sfDir, "embeddings")))
    pqLastDir = Some(sfDir)
    cbs
  }

  private def trainPqCodebooks(vecs: DataFrame): Seq[Seq[Seq[Float]]] = {
    val n = vecs.count()
    val poolMod = math.max(1L, n / PqPoolTarget)
    val pool = vecs
      .filter(pmod(xxhash64(col("vec_id")), lit(poolMod)) === 0)
      .orderBy(col("vec_id"))
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble))
    trainSubspaceCodebooks(pool)
  }

  /** K seeds thinned evenly from the id-ordered pool (deterministic),
    * then ONE driver-side Lloyd iteration per subspace over the pool —
    * shared by flat PQ (raw-embedding pool) and IVF-PQ (residual pool).
    * Float→double widening is exact, so the flat-PQ path computes the
    * identical codebooks it did when it trained on floats. */
  private def trainSubspaceCodebooks(pool: Array[Seq[Double]]): Seq[Seq[Seq[Float]]] = {
    val seeds =
      if (pool.length <= PqK) pool.toSeq
      else (0 until PqK).map(i => pool((i.toLong * pool.length / PqK).toInt))
    def subOf(e: Seq[Double], m: Int): Seq[Double] =
      e.slice(m * PqSubDim, (m + 1) * PqSubDim)
    def l2s(a: Seq[Double], b: Seq[Double]): Double =
      a.iterator.zip(b.iterator).map { case (x, y) => (x - y) * (x - y) }.sum
    (0 until PqM).map { m =>
      val subPool = pool.map(subOf(_, m))
      val subSeeds = seeds.map(subOf(_, m))
      val members = subPool.groupBy(v => subSeeds.indices.minBy(i => l2s(v, subSeeds(i))))
      subSeeds.indices.map { i =>
        members.get(i) match {
          case Some(vs) => // fixed-order mean, empty clusters keep their seed
            (0 until PqSubDim).map(d => (vs.map(_(d)).sum / vs.size).toFloat)
          case None => subSeeds(i).map(_.toFloat)
        }
      }
    }
  }

  def vecPqTopk(spark: SparkSession, sfDir: String): DataFrame = {
    VectorFunctions.register(spark)
    val vecs = Tables.load(spark, sfDir, "embeddings")
    val codebooks = pqCodebooks(spark, sfDir)
    def cb(m: Int): Column = typedLit(codebooks(m))
    def sub(emb: Column, m: Int): Column = slice(emb, m * PqSubDim + 1, PqSubDim)

    // encode: all M argmin-L2 codes in ONE fused codegen pass
    // (functions/VectorFunctions.scala PqEncode — identical IEEE chain
    // and first-min tie-break as the compositional
    // array_position/array_min form, without its ~M×K allocations per
    // row), plus the vector's norm — one extra float per vector keeps
    // COSINE ranking available in the compressed domain (codes alone
    // only rank dot products). Pure projection: one corpus scan, no
    // join, no shuffle. Two-step select so the code array is computed
    // once (CollapseProject never inlines a non-cheap expr used M times).
    val enc0 = vecs.select(
      col("vec_id"),
      sqrt(call_function("vec_dot", col("embedding"), col("embedding"))).as("vnorm"),
      call_function("pq_encode", col("embedding"), typedLit(codebooks)).as("codes"))
    val encoded = enc0.select(
      col("vec_id") +: col("vnorm") +:
        (0 until PqM).map(m => element_at(col("codes"), m + 1).as(s"c$m")): _*)

    // probes: one K-entry ADC dot-product table per subspace, then
    // broadcast against the encoded corpus; approx cosine = M table
    // lookups divided by the stored corpus-vector norm (the probe's own
    // norm is constant per probe group and cannot change its ranking).
    val probes = vecs.filter(col("vec_id") % ProbeStride === 0)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pemb"))
    val withTables = probes.select(
      col("probe_id") +: col("pemb") +:
        (0 until PqM).map(m =>
          transform(cb(m), c => dot(sub(col("pemb"), m), c)).as(s"dt$m")): _*)
    val approx = (0 until PqM)
      .map(m => element_at(col(s"dt$m"), col(s"c$m") + 1))
      .reduce(_ + _) / col("vnorm")
    val candK = udaf(new TopKAgg(TopK * PqRefine))
    val cands = encoded.join(broadcast(withTables), col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), approx.as("approx_cos"), col("vec_id").as("id"))
      .groupBy(col("probe_id"))
      .agg(candK(col("approx_cos"), col("id")).as("nn"))
      .select(col("probe_id"), explode(col("nn")).as("n"))
      .select(col("probe_id"), col("n.id").as("vec_id"))

    // exact rerank of the bounded candidate pool
    val topk = udaf(new TopKAgg(TopK))
    cands
      .join(vecs, Seq("vec_id"))
      .join(probes, Seq("probe_id"))
      .select(col("probe_id"), col("vec_id").as("id"),
        cosine(col("pemb"), col("embedding")).as("sim"))
      .groupBy(col("probe_id"))
      .agg(topk(col("sim"), col("id")).as("nn"))
      .select(col("probe_id"), posexplode(col("nn")).as(Seq("pos", "n")))
      .select(col("probe_id"), (col("pos") + 1).cast("int").as("rank"),
        col("n.id").as("neighbor_id"), round(col("n.sim"), 6).as("sim"))
      .orderBy(col("probe_id"), col("rank"))
  }

  // --- generated DuckDB oracle for vec_pq_topk -------------------------
  // Bit-exact mirroring strategy: every double chain the Spark side
  // builds with `aggregate(..., lit(0.0), acc + v)` (a LEFT fold in
  // element order) is emitted as a left-associated `0.0 + t1 + t2 + …`
  // SQL chain; the ADC sum mirrors `reduce(_ + _)` (no 0.0 seed); argmin
  // is `array_position(d, array_min(d))` on both engines (first-min
  // tie-break); codebook floats are emitted as E-notation literals
  // (DuckDB parses E-notation as DOUBLE, never DECIMAL) whose text
  // round-trips to the exact widened-float double Spark computes with.
  // Identical inputs + identical IEEE op order = identical bits, so the
  // candidate sets and final ranking agree exactly.

  /** DuckDB DOUBLE literal carrying the exact value of float `f`. */
  private def dlit(f: Float): String = {
    val s = f.toDouble.toString
    if (s.contains('E') || s.contains('e')) s else s + "E0"
  }

  private def cbLit(cb: Seq[Seq[Float]]): String =
    cb.map(_.map(dlit).mkString("[", ",", "]")).mkString("[", ",", "]")

  private def pqSql(cbs: Seq[Seq[Seq[Float]]]): String = {
    def x(c: String, i: Int) = s"CAST(list_extract($c, $i) AS DOUBLE)"
    val normExpr = "sqrt(" + (1 to Dims).foldLeft("0.0") { (acc, i) =>
      s"$acc + ${x("embedding", i)}*${x("embedding", i)}"
    } + ")"
    def distList(m: Int): String = {
      val body = (1 to PqSubDim).foldLeft("0.0") { (acc, d) =>
        val xi = x("embedding", m * PqSubDim + d)
        s"$acc + ($xi - c[$d])*($xi - c[$d])"
      }
      s"list_transform(${cbLit(cbs(m))}, c -> $body)"
    }
    def dtList(m: Int): String = {
      val body = (1 to PqSubDim).foldLeft("0.0") { (acc, d) =>
        s"$acc + ${x("pemb", m * PqSubDim + d)} * c[$d]"
      }
      s"list_transform(${cbLit(cbs(m))}, c -> $body)"
    }
    val ms = 0 until PqM
    s"""WITH enc0 AS (
      |  SELECT vec_id, $normExpr AS vnorm,
      |    ${ms.map(m => s"${distList(m)} AS d$m").mkString(",\n    ")}
      |  FROM embeddings),
      |enc AS (
      |  SELECT vec_id, vnorm,
      |    ${ms.map(m => s"CAST(list_position(d$m, list_min(d$m)) - 1 AS INTEGER) AS c$m").mkString(",\n    ")}
      |  FROM enc0),
      |probes AS (
      |  SELECT vec_id AS probe_id, embedding AS pemb FROM embeddings
      |  WHERE vec_id % $ProbeStride = 0),
      |pt AS (
      |  SELECT probe_id,
      |    ${ms.map(m => s"${dtList(m)} AS dt$m").mkString(",\n    ")}
      |  FROM probes),
      |approx AS (
      |  SELECT pt.probe_id, e.vec_id,
      |    (${ms.map(m => s"list_extract(dt$m, c$m + 1)").mkString(" + ")}) / e.vnorm AS approx_cos
      |  FROM pt JOIN enc e ON e.vec_id != pt.probe_id),
      |cand AS (
      |  SELECT probe_id, vec_id FROM (
      |    SELECT probe_id, vec_id,
      |      row_number() OVER (PARTITION BY probe_id ORDER BY approx_cos DESC, vec_id) AS rn
      |    FROM approx) WHERE rn <= ${TopK * PqRefine}),
      |rer AS (
      |  SELECT c.probe_id, c.vec_id,
      |    list_cosine_similarity(CAST(p.pemb AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) AS sim
      |  FROM cand c JOIN embeddings e ON c.vec_id = e.vec_id
      |       JOIN probes p ON c.probe_id = p.probe_id),
      |ranked AS (
      |  SELECT probe_id, vec_id, sim,
      |    row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, vec_id) AS rank FROM rer)
      |SELECT probe_id, rank, vec_id AS neighbor_id, round(sim,6) AS sim
      |FROM ranked WHERE rank <= $TopK ORDER BY probe_id, rank""".stripMargin
  }

  /** The generated `vec_pq_topk` oracle — defined once the query has
    * trained for some sfDir (Verify runs every query BEFORE dumping
    * `oracleSql`, so the key is always present in `oracle_sql.json`;
    * a fresh JVM that never ran the query degrades to the driver's
    * rows-only check, never to a wrong oracle). */
  def vecPqTopkSqlOpt: Option[String] =
    pqLastDir.flatMap(d => Option(pqCache.get(d))).map(pqSql)

  // --- IVF-PQ: inverted lists + residual product quantization ----------
  // The full large-scale ANN architecture (what FAISS calls IVFPQ): the
  // coarse quantizer partitions the corpus into inverted lists, and each
  // vector's RESIDUAL (v − centroid) is PQ-encoded — residuals are
  // tighter-distributed than raw vectors, so the same codebook budget
  // quantizes them better. Query: probe the NProbe nearest lists;
  // approx cosine needs dot(q,v)/‖v‖ = (dot(q,c) + dot(q,res))/‖v‖ —
  // dot(q,c) is exact per probed centroid and dot(q,res) is M ADC table
  // lookups, with ONE table set per probe (the tables depend on q only,
  // not the centroid). Scale: scoring touches only probed lists (the
  // IVF win) and reads M ints + 1 float per member (the PQ win); both
  // top-k stages run through the bounded partial-merge TopKAgg.
  private val ivfPqCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[Seq[Seq[Float]]]]()
  @volatile private var ivfPqLastDir: Option[String] = None

  /** Corpus joined with its coarse assignment: one row per vector with
    * its centroid id, the centroid embedding, and the double residual. */
  private def residualFrame(spark: SparkSession, sfDir: String): DataFrame = {
    val vecs = Tables.load(spark, sfDir, "embeddings")
    val cents = sampledCentroids(vecs)
    assignNearest(vecs, cents).join(broadcast(cents), Seq("cent_id"))
      .select(col("vec_id"), col("cent_id"), col("embedding"),
        zip_with(col("embedding"), col("cemb"),
          (x, y) => x.cast("double") - y.cast("double")).as("res"))
  }

  /** Residual codebooks — same absolute-size pool contract as
    * [[pqCodebooks]] (hash-mod sample targeting [[PqPoolTarget]] rows at
    * any corpus size; driver Lloyd over sample-sized model data). Takes
    * the residual frame so training reads the SAME materialization the
    * caller encodes from, instead of re-running the assignment. */
  private[graft] def ivfPqCodebooks(spark: SparkSession, sfDir: String,
      rf: DataFrame): Seq[Seq[Seq[Float]]] = {
    val cbs = ivfPqCache.computeIfAbsent(sfDir, { _ =>
      val n = Tables.load(spark, sfDir, "embeddings").count()
      val poolMod = math.max(1L, n / PqPoolTarget)
      val pool = rf.filter(pmod(xxhash64(col("vec_id")), lit(poolMod)) === 0)
        .orderBy(col("vec_id"))
        .select(col("res")).collect()
        .map(_.getSeq[Double](0))
      trainSubspaceCodebooks(pool)
    })
    ivfPqLastDir = Some(sfDir)
    cbs
  }

  def vecIvfPqTopk(spark: SparkSession, sfDir: String): DataFrame = {
    VectorFunctions.register(spark)
    val vecs = Tables.load(spark, sfDir, "embeddings")
    val cents = sampledCentroids(vecs)
    // ONE assignment pass feeds both codebook training (the pool collect
    // materializes it into the cache) and encoding — unshared, each side
    // would pay its own N×C scoring plus an N-row shuffle. MEMORY_AND_DISK:
    // at corpus scale the residuals exceed executor memory and must spill,
    // not recompute.
    val rf = residualFrame(spark, sfDir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val codebooks = ivfPqCodebooks(spark, sfDir, rf)
    def cb(m: Int): Column = typedLit(codebooks(m))
    def sub(c: Column, m: Int): Column = slice(c, m * PqSubDim + 1, PqSubDim)

    // encode: one scan of the assigned corpus — all M residual codes in
    // one fused PqEncode pass (same IEEE chain/tie-break as the
    // compositional form, none of its per-row allocations), plus the
    // stored vector norm
    val enc0 = rf.select(
      col("vec_id"), col("cent_id"),
      sqrt(call_function("vec_dot", col("embedding"), col("embedding"))).as("vnorm"),
      call_function("pq_encode", col("res"), typedLit(codebooks)).as("codes"))
    val encoded = enc0.select(
      col("vec_id") +: col("cent_id") +: col("vnorm") +:
        (0 until PqM).map(m => element_at(col("codes"), m + 1).as(s"c$m")): _*)

    // probes → NProbe nearest lists, each carrying the exact dot(q,c)
    // and the per-subspace ADC tables (computed once per probe)
    val probes = vecs.filter(col("vec_id") % ProbeStride === 0)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pemb"))
    val topNProbe = udaf(new TopKAgg(NProbe))
    val probeCents = probes.join(broadcast(cents))
      .select(col("probe_id"), cosine(col("pemb"), col("cemb")).as("csim"), col("cent_id"))
      .groupBy(col("probe_id"))
      .agg(topNProbe(col("csim"), col("cent_id")).as("pc"))
      .select(col("probe_id"), explode(col("pc")).as("pc"))
      .select(col("probe_id"), col("pc.id").as("cent_id"))
      .join(probes, Seq("probe_id"))
      .join(broadcast(cents), Seq("cent_id"))
    val withTables = probeCents.select(
      Seq(col("probe_id"), col("cent_id"), dot(col("pemb"), col("cemb")).as("qc")) ++
        (0 until PqM).map(m =>
          transform(cb(m), c => dot(sub(col("pemb"), m), c)).as(s"dt$m")): _*)

    val approx = (Seq(col("qc")) ++ (0 until PqM)
      .map(m => element_at(col(s"dt$m"), col(s"c$m") + 1)))
      .reduce(_ + _) / col("vnorm")
    val candK = udaf(new TopKAgg(TopK * PqRefine))
    val cands = encoded.join(broadcast(withTables), Seq("cent_id"))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), approx.as("approx_cos"), col("vec_id").as("id"))
      .groupBy(col("probe_id"))
      .agg(candK(col("approx_cos"), col("id")).as("nn"))
      .select(col("probe_id"), explode(col("nn")).as("n"))
      .select(col("probe_id"), col("n.id").as("vec_id"))

    // exact rerank of the bounded candidate pool
    val topk = udaf(new TopKAgg(TopK))
    cands
      .join(vecs, Seq("vec_id"))
      .join(probes, Seq("probe_id"))
      .select(col("probe_id"), col("vec_id").as("id"),
        cosine(col("pemb"), col("embedding")).as("sim"))
      .groupBy(col("probe_id"))
      .agg(topk(col("sim"), col("id")).as("nn"))
      .select(col("probe_id"), posexplode(col("nn")).as(Seq("pos", "n")))
      .select(col("probe_id"), (col("pos") + 1).cast("int").as("rank"),
        col("n.id").as("neighbor_id"), round(col("n.sim"), 6).as("sim"))
      .orderBy(col("probe_id"), col("rank"))
  }

  private def ivfPqSql(cbs: Seq[Seq[Seq[Float]]]): String = {
    def x(c: String, i: Int) = s"CAST(list_extract($c, $i) AS DOUBLE)"
    val normExpr = "sqrt(" + (1 to Dims).foldLeft("0.0") { (acc, i) =>
      s"$acc + ${x("embedding", i)}*${x("embedding", i)}"
    } + ")"
    val qcExpr = (1 to Dims).foldLeft("0.0") { (acc, i) =>
      s"$acc + ${x("pemb", i)}*${x("cemb", i)}"
    }
    def distList(m: Int): String = {
      val body = (1 to PqSubDim).foldLeft("0.0") { (acc, d) =>
        val i = m * PqSubDim + d
        val ri = s"(${x("embedding", i)} - ${x("cemb", i)})"
        s"$acc + ($ri - c[$d])*($ri - c[$d])"
      }
      s"list_transform(${cbLit(cbs(m))}, c -> $body)"
    }
    def dtList(m: Int): String = {
      val body = (1 to PqSubDim).foldLeft("0.0") { (acc, d) =>
        s"$acc + ${x("pemb", m * PqSubDim + d)} * c[$d]"
      }
      s"list_transform(${cbLit(cbs(m))}, c -> $body)"
    }
    val ms = 0 until PqM
    val approxChain = ms.foldLeft("qc") { (acc, m) =>
      s"$acc + list_extract(dt$m, c$m + 1)"
    }
    s"""WITH cents AS (
      |  SELECT vec_id AS cent_id, embedding AS cemb FROM embeddings
      |  WHERE vec_id % $CentroidStride = 0),
      |assigned AS (
      |  SELECT vec_id, embedding, cent_id, cemb FROM (
      |    SELECT e.vec_id, e.embedding, c.cent_id, c.cemb,
      |      row_number() OVER (PARTITION BY e.vec_id
      |        ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(c.cemb AS DOUBLE[])) DESC, c.cent_id) AS rn
      |    FROM embeddings e CROSS JOIN cents c)
      |  WHERE rn = 1),
      |enc0 AS (
      |  SELECT vec_id, cent_id, $normExpr AS vnorm,
      |    ${ms.map(m => s"${distList(m)} AS d$m").mkString(",\n    ")}
      |  FROM assigned),
      |enc AS (
      |  SELECT vec_id, cent_id, vnorm,
      |    ${ms.map(m => s"CAST(list_position(d$m, list_min(d$m)) - 1 AS INTEGER) AS c$m").mkString(",\n    ")}
      |  FROM enc0),
      |probes AS (
      |  SELECT vec_id AS probe_id, embedding AS pemb FROM embeddings
      |  WHERE vec_id % $ProbeStride = 0),
      |pc AS (
      |  SELECT probe_id, pemb, cent_id, cemb FROM (
      |    SELECT p.probe_id, p.pemb, c.cent_id, c.cemb,
      |      row_number() OVER (PARTITION BY p.probe_id
      |        ORDER BY list_cosine_similarity(CAST(p.pemb AS DOUBLE[]), CAST(c.cemb AS DOUBLE[])) DESC, c.cent_id) AS rn
      |    FROM probes p CROSS JOIN cents c)
      |  WHERE rn <= $NProbe),
      |pt AS (
      |  SELECT probe_id, cent_id, $qcExpr AS qc,
      |    ${ms.map(m => s"${dtList(m)} AS dt$m").mkString(",\n    ")}
      |  FROM pc),
      |approx AS (
      |  SELECT pt.probe_id, e.vec_id, ($approxChain) / e.vnorm AS approx_cos
      |  FROM pt JOIN enc e ON pt.cent_id = e.cent_id AND e.vec_id != pt.probe_id),
      |cand AS (
      |  SELECT probe_id, vec_id FROM (
      |    SELECT probe_id, vec_id,
      |      row_number() OVER (PARTITION BY probe_id ORDER BY approx_cos DESC, vec_id) AS rn
      |    FROM approx) WHERE rn <= ${TopK * PqRefine}),
      |rer AS (
      |  SELECT c.probe_id, c.vec_id,
      |    list_cosine_similarity(CAST(p.pemb AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) AS sim
      |  FROM cand c JOIN embeddings e ON c.vec_id = e.vec_id
      |       JOIN probes p ON c.probe_id = p.probe_id),
      |ranked AS (
      |  SELECT probe_id, vec_id, sim,
      |    row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, vec_id) AS rank FROM rer)
      |SELECT probe_id, rank, vec_id AS neighbor_id, round(sim,6) AS sim
      |FROM ranked WHERE rank <= $TopK ORDER BY probe_id, rank""".stripMargin
  }

  /** Generated `vec_ivfpq_topk` oracle — same availability contract as
    * [[vecPqTopkSqlOpt]]. */
  def vecIvfPqTopkSqlOpt: Option[String] =
    ivfPqLastDir.flatMap(d => Option(ivfPqCache.get(d))).map(ivfPqSql)

  // --- semantic benchmark decontamination -------------------------------
  // `text_decontaminate` catches VERBATIM n-gram overlap with the eval
  // sets; paraphrased contamination (same content, different words)
  // only shows in embedding space. Flag every corpus vector whose best
  // cosine against ANY benchmark vector clears the threshold — the
  // benchmark slice stands in for "the eval-set embeddings", exactly
  // like `textDecontaminate`'s doc_id slice.
  // Scale shape: eval suites are FIXED-SIZE next to a 100 TB corpus, so
  // the benchmark side broadcasts whole and best-match is the same
  // one-max_by hash-agg as centroid assignment — exchange carries one
  // row per corpus vector, no LSH recall risk on the compliance path
  // (for a benchmark too big to broadcast, the capped-LSH path of
  // `vec_ann_lsh` is the drop-in). Threshold is domain-tuned;
  // production sweeps it against a labeled contamination sample.
  private val SemBenchMod = 25
  private val SemT = 0.35

  def vecDecontaminate(spark: SparkSession, sfDir: String): DataFrame = {
    val vecs = Tables.load(spark, sfDir, "embeddings")
    val bench = vecs.filter(col("vec_id") % SemBenchMod === 0)
      .select(col("vec_id").as("bench_id"), col("embedding").as("bemb"))
    vecs.filter(col("vec_id") % SemBenchMod =!= 0)
      .join(broadcast(bench))
      .select(col("vec_id"), col("bench_id"),
        cosine(col("embedding"), col("bemb")).as("sim"))
      .groupBy(col("vec_id"))
      .agg(max_by(struct(col("bench_id"), col("sim")),
        struct(col("sim"), (-col("bench_id")).as("tb"))).as("m"))
      .select(col("vec_id"), col("m.bench_id").as("bench_id"),
        round(col("m.sim"), 6).as("sim"))
      .filter(col("m.sim") >= SemT)
      .orderBy(col("vec_id"))
  }

  val vecDecontaminateSql: String =
    s"""WITH bench AS (
      |  SELECT vec_id AS bench_id, embedding AS bemb FROM embeddings
      |  WHERE vec_id % $SemBenchMod = 0),
      |scored AS (
      |  SELECT e.vec_id, b.bench_id,
      |    list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(b.bemb AS DOUBLE[])) AS sim
      |  FROM embeddings e CROSS JOIN bench b
      |  WHERE e.vec_id % $SemBenchMod != 0),
      |best AS (
      |  SELECT vec_id, bench_id, sim FROM (
      |    SELECT vec_id, bench_id, sim,
      |      row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, bench_id) AS rn
      |    FROM scored)
      |  WHERE rn = 1)
      |SELECT vec_id, bench_id, round(sim, 6) AS sim
      |FROM best WHERE sim >= $SemT ORDER BY vec_id""".stripMargin

  // --- hard-negative mining for contrastive training -------------------
  // For each probe (anchor), the top-k most-similar vectors whose label
  // DIFFERS from the probe's — the "hard negatives" that make
  // contrastive/embedding training data informative (easy negatives are
  // uninformative; same-label vectors would be false negatives). Same
  // scale shape as vec_topk: broadcast the bounded probe set, score
  // per-row, and reduce through the bounded partial-merge TopKAgg — one
  // hash agg, no per-group window, exchange carries one row per
  // (corpus row × probe).
  def vecHardNegatives(spark: SparkSession, sfDir: String): DataFrame = {
    VectorFunctions.register(spark)
    val vecs = Tables.load(spark, sfDir, "embeddings")
    val probes = vecs.filter(col("vec_id") % ProbeStride === 0)
      .select(col("vec_id").as("probe_id"), col("label").as("probe_label"),
        col("embedding").as("probe_emb"))
    val topk = udaf(new TopKAgg(TopK))
    val scored = vecs
      .join(broadcast(probes), col("label") =!= col("probe_label"))
      .select(col("probe_id"),
        cosine(col("probe_emb"), col("embedding")).as("sim"),
        col("vec_id").as("id"))
    scored.groupBy(col("probe_id"))
      .agg(topk(col("sim"), col("id")).as("nn"))
      .select(col("probe_id"), posexplode(col("nn")).as(Seq("pos", "n")))
      .select(col("probe_id"), (col("pos") + 1).as("rank"),
        col("n.id").as("negative_id"), round(col("n.sim"), 6).as("sim"))
      .orderBy(col("probe_id"), col("rank"))
  }

  val vecHardNegativesSql: String =
    s"""WITH probes AS (
      |  SELECT vec_id AS probe_id, label AS probe_label, embedding AS probe_emb
      |  FROM embeddings WHERE vec_id % $ProbeStride = 0),
      |scored AS (
      |  SELECT p.probe_id, e.vec_id,
      |    list_cosine_similarity(CAST(p.probe_emb AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) AS sim
      |  FROM probes p JOIN embeddings e ON e.label != p.probe_label),
      |ranked AS (
      |  SELECT probe_id, vec_id, sim,
      |    row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, vec_id) AS rank
      |  FROM scored)
      |SELECT probe_id, rank, vec_id AS negative_id, round(sim, 6) AS sim
      |FROM ranked WHERE rank <= $TopK ORDER BY probe_id, rank""".stripMargin

  // --- SQ8 scalar-quantization ANN -------------------------------------
  // The third compression family next to IVF (partitioning) and PQ
  // (vector quantization): uniform per-dimension 8-bit scalar
  // quantization. Each float becomes one byte via the dimension's
  // [min, max] range — 4× memory compression with NO trained model at
  // all, which is why SQ8 is the default first step production ANN
  // systems take before reaching for PQ.
  //
  // Scale shape at 100 TB:
  //  - "Training" is per-dim min/max: ONE hash aggregation with 2×D
  //    bounded state, partial-merged map-side — the exchange carries a
  //    single row at any corpus size, and the row broadcasts back.
  //    Nothing is ever collected to the driver (unlike PQ's pool
  //    sample, there is no model to train).
  //  - Quantization is a pure projection: vec_id, the float norm, and D
  //    int codes per row — materialized as plain int columns so the
  //    whole encode stays inside whole-stage codegen (no HOF, no
  //    per-row allocation; the same reasoning that moved PQ's encode
  //    into the fused pq_encode expression).
  //  - Scoring is the SQ brute scan over codes: per (row, probe) pair a
  //    single codegen'd 64-term dequantize-dot chain — the win is
  //    memory bandwidth (codes are 1/4 the bytes), not fewer flops.
  //    Probes broadcast; candidate and final top-k both run through the
  //    bounded partial-merge TopKAgg; exact rerank on the float
  //    embeddings restores true cosines.
  //
  // Cross-engine parity: min/max over floats is exact, so the oracle
  // re-derives the identical ranges in a CTE (this oracle is fully
  // self-contained — no generated literals). Quantize/dequantize are
  // fixed-order IEEE double chains mirrored term-for-term, with
  // floor(x + 0.5) instead of round() because the two engines disagree
  // on rounding mode at exact .5 ties while floor is unambiguous.
  private val SqLevels = 255 // codes 0..255 → (x-mn)·255/(mx-mn)
  private val SqRefine = 4 // rerank pool = SqRefine × TopK

  def vecSqTopk(spark: SparkSession, sfDir: String): DataFrame = {
    VectorFunctions.register(spark)
    val vecs = Tables.load(spark, sfDir, "embeddings")
    def x(c: Column, d: Int): Column = element_at(c, d).cast("double")

    // per-dim ranges: one agg row (bounded 2×D state), broadcast back
    // as ONE array<double> of [mins ++ maxes] — never driver state
    val mmCols = (1 to Dims).flatMap(d => Seq(
      min(x(col("embedding"), d)).as(s"mn$d"),
      max(x(col("embedding"), d)).as(s"mx$d")))
    val mm = vecs.agg(mmCols.head, mmCols.tail: _*)
      .select(array(
        (1 to Dims).map(d => col(s"mn$d")) ++
          (1 to Dims).map(d => col(s"mx$d")): _*).as("ranges"))

    // encode: pure projection → ONE array<int> of codes + the float
    // norm, through the fused sq_encode kernel (identical floor/cast
    // chain as the compositional per-dim columns — the oracle mirrors
    // the exact association, scale_d = (mx-mn)/255, dequant mn+q·scale)
    val encoded = vecs.join(broadcast(mm))
      .select(col("vec_id"),
        sqrt(call_function("vec_dot", col("embedding"), col("embedding"))).as("vnorm"),
        call_function("sq_encode", col("embedding"), col("ranges"), lit(SqLevels)).as("codes"))

    // probes carry the ranges (one broadcast row) so the pair expression
    // has everything it needs; the bare projection is shared with the
    // exact-rerank join below
    val probeBase = vecs.filter(col("vec_id") % ProbeStride === 0)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pemb"))
    val probes = probeBase.join(broadcast(mm))

    // dequantized dot: the fused sq_score kernel computes the same
    // left-fold 0.0 + (mn1+q1·s1)·p1 + … chain in one loop
    val approx = call_function("sq_score",
      col("codes"), col("pemb"), col("ranges"), lit(SqLevels)) / col("vnorm")

    val candK = udaf(new TopKAgg(TopK * SqRefine))
    val cands = encoded.join(broadcast(probes), col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), approx.as("approx_cos"), col("vec_id").as("id"))
      .groupBy(col("probe_id"))
      .agg(candK(col("approx_cos"), col("id")).as("nn"))
      .select(col("probe_id"), explode(col("nn")).as("n"))
      .select(col("probe_id"), col("n.id").as("vec_id"))

    // exact rerank of the bounded candidate pool
    val topk = udaf(new TopKAgg(TopK))
    cands
      .join(vecs, Seq("vec_id"))
      .join(probeBase, Seq("probe_id"))
      .select(col("probe_id"), col("vec_id").as("id"),
        cosine(col("pemb"), col("embedding")).as("sim"))
      .groupBy(col("probe_id"))
      .agg(topk(col("sim"), col("id")).as("nn"))
      .select(col("probe_id"), posexplode(col("nn")).as(Seq("pos", "n")))
      .select(col("probe_id"), (col("pos") + 1).cast("int").as("rank"),
        col("n.id").as("neighbor_id"), round(col("n.sim"), 6).as("sim"))
      .orderBy(col("probe_id"), col("rank"))
  }

  val vecSqTopkSql: String = {
    def xs(c: String, d: Int) = s"CAST(list_extract($c, $d) AS DOUBLE)"
    val normExpr = "sqrt(" + (1 to Dims).foldLeft("0.0") { (acc, d) =>
      s"$acc + ${xs("embedding", d)}*${xs("embedding", d)}"
    } + ")"
    val mmCols = (1 to Dims).map(d =>
      s"min(${xs("embedding", d)}) AS mn$d, max(${xs("embedding", d)}) AS mx$d").mkString(",\n    ")
    val qCols = (1 to Dims).map { d =>
      s"CASE WHEN mx$d = mn$d THEN 0 ELSE CAST(floor((${xs("embedding", d)} - mn$d) * ${SqLevels}.0 / (mx$d - mn$d) + 0.5) AS INTEGER) END AS q$d"
    }.mkString(",\n    ")
    val approxChain = (1 to Dims).foldLeft("0.0") { (acc, d) =>
      s"$acc + (mn$d + q$d * ((mx$d - mn$d) / ${SqLevels}.0)) * ${xs("pemb", d)}"
    }
    s"""WITH mm AS (
      |  SELECT
      |    $mmCols
      |  FROM embeddings),
      |enc AS (
      |  SELECT vec_id, $normExpr AS vnorm,
      |    $qCols
      |  FROM embeddings CROSS JOIN mm),
      |probes AS (
      |  SELECT vec_id AS probe_id, embedding AS pemb FROM embeddings
      |  WHERE vec_id % $ProbeStride = 0),
      |approx AS (
      |  SELECT p.probe_id, e.vec_id, ($approxChain) / e.vnorm AS approx_cos
      |  FROM probes p CROSS JOIN mm JOIN enc e ON e.vec_id != p.probe_id),
      |cand AS (
      |  SELECT probe_id, vec_id FROM (
      |    SELECT probe_id, vec_id,
      |      row_number() OVER (PARTITION BY probe_id ORDER BY approx_cos DESC, vec_id) AS rn
      |    FROM approx) WHERE rn <= ${TopK * SqRefine}),
      |rer AS (
      |  SELECT c.probe_id, c.vec_id,
      |    list_cosine_similarity(CAST(p.pemb AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) AS sim
      |  FROM cand c JOIN embeddings e ON c.vec_id = e.vec_id
      |       JOIN probes p ON c.probe_id = p.probe_id),
      |ranked AS (
      |  SELECT probe_id, vec_id, sim,
      |    row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, vec_id) AS rank FROM rer)
      |SELECT probe_id, rank, vec_id AS neighbor_id, round(sim,6) AS sim
      |FROM ranked WHERE rank <= $TopK ORDER BY probe_id, rank""".stripMargin
  }

  // --- chunk → document embedding pooling -------------------------------
  // The assembly step between chunk-level embedding and document-level
  // retrieval: chunk each document ([[TextQueries.chunkFrame]] — the
  // same 64-token/48-stride windows `text_chunk` ships), embed each
  // chunk, MEAN-POOL the chunk embeddings into one document vector, and
  // summarize it (L2 norm + dominant dimension). The per-chunk encoder
  // is the sandbox's deterministic stand-in (no embedding model here):
  // dim d = one md5 of the chunk text, hex-sliced to an integer in
  // [0,16) — the [[MediaQueries]] codec-seed trick, mirrored digit-for-
  // digit in DuckDB, so the whole chunk→pool→summary pipeline is
  // hash-oracle-checked; a real encoder slots in at the e$d projection
  // without touching the pooling shape.
  //
  // Scale shape at 100 TB: chunking is the shuffle-free explode
  // projection `text_chunk` already pins; embedding is a pure per-chunk
  // projection to D integer columns (columns, not an array — everything
  // stays in whole-stage codegen); pooling is ONE hash agg of D avg()s
  // keyed on doc_id — partial-aggregated map-side, so the exchange
  // carries one D-wide row per document, never the chunks. Integer
  // values make every per-dim sum exact regardless of partial-merge
  // order, so avg = the identical division in both engines and the
  // oracle hash-checks the pooled vectors themselves.
  private val PoolDims = 16

  def vecChunkPool(spark: SparkSession, sfDir: String): DataFrame = {
    val chunks = TextQueries.chunkFrame(Tables.load(spark, sfDir, "documents"))
    val h = md5(col("chunk_text"))
    val emb = chunks.select(
      col("doc_id") +:
        (0 until PoolDims).map(d =>
          (conv(substring(h, 2 * d + 1, 2), 16, 10).cast("long") % 16).as(s"e$d")): _*)
    val aggs = count(lit(1)).as("n_chunks") +:
      (0 until PoolDims).map(d => avg(col(s"e$d")).as(s"m$d"))
    val pooled = emb.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
    val means = array((0 until PoolDims).map(d => col(s"m$d")): _*)
    val norm = sqrt((0 until PoolDims).foldLeft(lit(0.0)) { (acc, d) =>
      acc + col(s"m$d") * col(s"m$d")
    })
    pooled.select(col("doc_id"), col("n_chunks"),
      round(norm, 6).as("pool_norm"),
      (array_position(means, array_max(means)) - 1).cast("int").as("top_dim"))
      .orderBy(col("doc_id"))
  }

  val vecChunkPoolSql: String = {
    def e(d: Int) =
      s"CAST(('0x' || substr(md5(chunk_text), ${2 * d + 1}, 2)) AS BIGINT) % 16 AS e$d"
    val ms = (0 until PoolDims).map(d => s"avg(e$d) AS m$d").mkString(", ")
    val normChain = (0 until PoolDims).foldLeft("0.0") { (acc, d) => s"$acc + m$d*m$d" }
    val meanList = (0 until PoolDims).map(d => s"m$d").mkString("[", ", ", "]")
    s"""WITH chunks AS (${TextQueries.textChunkBodySql}),
      |emb AS (
      |  SELECT doc_id, ${(0 until PoolDims).map(e).mkString(",\n    ")}
      |  FROM chunks),
      |pooled AS (
      |  SELECT doc_id, count(*) AS n_chunks, $ms
      |  FROM emb GROUP BY doc_id)
      |SELECT doc_id, n_chunks, round(sqrt($normChain), 6) AS pool_norm,
      |  CAST(list_position($meanList, list_max($meanList)) - 1 AS INTEGER) AS top_dim
      |FROM pooled ORDER BY doc_id""".stripMargin
  }

  // --- embedding-distribution drift: quantizer staleness monitor -------
  // The vector-side sibling of `corpus_drift`: split the corpus into a
  // reference and a current slice, assign BOTH through the same coarse
  // quantizer, and χ²-score each centroid's assignment share. A drifting
  // embedding distribution (new domain, new encoder version) shows up as
  // mass moving between inverted lists long before recall degrades —
  // the retrain-the-quantizer alarm every production ANN index needs.
  //
  // Scale shape: assignment is the shared broadcast max_by hash-agg (one
  // row per vector through the exchange); the χ² table is centroid-sized
  // (model-sized, not corpus-sized). Parity: counts are exact longs and
  // the χ² chain is the corpus_drift recipe — num/den assembled in
  // DECIMAL(38,0), squared in double, no transcendentals.
  def vecDrift(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    VectorFunctions.register(spark)
    val dec = DecimalType(38, 0)
    val vecs = Tables.load(spark, sfDir, "embeddings")
    val counts = assignNearest(vecs, sampledCentroids(vecs))
      .select(col("cent_id"), (pmod(col("vec_id"), lit(2L)) === 0).as("a"))
      .groupBy(col("cent_id"))
      .agg(sum(when(col("a"), 1L).otherwise(0L)).as("o1"),
        sum(when(!col("a"), 1L).otherwise(0L)).as("o2"))
      .cache() // feeds totals AND scoring — centroid-sized frame
    val tot = counts.agg(sum(col("o1")).as("n1"), sum(col("o2")).as("n2"))
    val num = (col("o1").cast(dec) * col("n2").cast(dec) -
      col("o2").cast(dec) * col("n1").cast(dec)).cast(DoubleType)
    val den = ((col("o1") + col("o2")).cast(dec) *
      col("n1").cast(dec) * col("n2").cast(dec)).cast(DoubleType)
    counts.crossJoin(broadcast(tot))
      .select(col("cent_id"), col("o1"), col("o2"),
        round(num * num / den, 6).as("chi2"))
      .orderBy(col("cent_id"))
  }

  val vecDriftSql: String =
    s"""WITH cents AS (
      |  SELECT vec_id AS cent_id, embedding AS cemb FROM embeddings
      |  WHERE vec_id % $CentroidStride = 0),
      |assigned AS (
      |  SELECT vec_id, cent_id FROM (
      |    SELECT e.vec_id, c.cent_id,
      |      row_number() OVER (PARTITION BY e.vec_id
      |        ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(c.cemb AS DOUBLE[])) DESC, c.cent_id) AS rn
      |    FROM embeddings e CROSS JOIN cents c)
      |  WHERE rn = 1),
      |tf AS (
      |  SELECT cent_id,
      |    sum(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END) AS o1,
      |    sum(CASE WHEN vec_id % 2 != 0 THEN 1 ELSE 0 END) AS o2
      |  FROM assigned GROUP BY cent_id),
      |tot AS (SELECT sum(o1) AS n1, sum(o2) AS n2 FROM tf)
      |SELECT cent_id, CAST(o1 AS BIGINT) AS o1, CAST(o2 AS BIGINT) AS o2,
      |  round(CAST(CAST(o1 AS HUGEINT) * n2 - CAST(o2 AS HUGEINT) * n1 AS DOUBLE)
      |      * CAST(CAST(o1 AS HUGEINT) * n2 - CAST(o2 AS HUGEINT) * n1 AS DOUBLE)
      |    / CAST(CAST(o1 + o2 AS HUGEINT) * n1 * n2 AS DOUBLE), 6) AS chi2
      |FROM tf CROSS JOIN tot ORDER BY cent_id""".stripMargin

  // --- graph ANN: bounded-degree neighbor graph + beam search ----------
  // The industry-default graph-traversal ANN shape (HNSW / DiskANN):
  // instead of probing quantizer cells, the index is a bounded-degree
  // proximity graph and a query walks it — start at entry points, expand
  // the current beam's out-edges, keep the best `GraphBeam`, repeat.
  // Re-expressed Spark-first:
  //
  //  BUILD (once, persisted like the IVF index): every vector joins its
  //  `GraphMemb` nearest coarse cells (the second membership is what
  //  gives the graph its cross-cluster links — the role HNSW's long
  //  edges play), candidate edges are generated CLUSTER-KEYED (the
  //  dedup_semantic move — cost ∝ N × bucket size, never all-pairs),
  //  and each node keeps its `GraphDegree` best neighbors through the
  //  bounded partial-merge [[TopKAgg]] — the adjacency is exactly
  //  N × degree rows at any corpus size, and no window ever shuffles
  //  the scored candidate set.
  //
  //  QUERY: entry points are the probe's nearest centroids (centroids
  //  ARE corpus vectors here, so they are graph nodes); each hop is one
  //  equi-join frontier→adjacency plus one bounded TopKAgg per probe —
  //  the pagerankConverged loop pattern, with an eager localCheckpoint
  //  per round so plan depth stays constant however many hops run. Beam
  //  state is probes × beam rows; the visited set is ≤ probes ×
  //  (entries + beam × degree × hops) rows — driver-safe at any N. The
  //  per-hop embedding lookup is an equi-join the candidates broadcast
  //  into; a production serving layout would bucket `embeddings` by
  //  vec_id so each hop prunes to the touched buckets (the
  //  vec_ivf_topk_cached build/query split applies verbatim).
  //
  // The whole pipeline is deterministic (ties break sim DESC, id ASC in
  // both engines), so the DuckDB oracle mirrors build + walk exactly,
  // with the hop CTEs unrolled at the same fixed `GraphHops`.
  private[graft] val GraphMemb = 2 // coarse cells per vector (cross-cluster links)
  private[graft] val GraphDegree = 8 // out-degree cap
  private val GraphBeam = 8 // frontier width per hop
  private val GraphHops = 3 // fixed expansion rounds (oracle unrolls these)
  private val GraphEntries = 2 // entry centroids per probe

  /** Bounded-degree neighbor graph `(src, dst)` — the persistable index. */
  private[graft] def graphAdjacency(vecs: DataFrame): DataFrame = {
    val cents = sampledCentroids(vecs)
    val topMemb = udaf(new TopKAgg(GraphMemb))
    val memb = vecs.join(broadcast(cents))
      .select(col("vec_id"),
        cosine(col("embedding"), col("cemb")).as("csim"), col("cent_id"))
      .groupBy(col("vec_id"))
      .agg(topMemb(col("csim"), col("cent_id")).as("m"))
      .select(col("vec_id"), explode(col("m")).as("m"))
      .select(col("vec_id"), col("m.id").as("cent_id"))
    val cand = memb.select(col("cent_id"), col("vec_id").as("src"))
      .join(memb.select(col("cent_id"), col("vec_id").as("dst")), Seq("cent_id"))
      .filter(col("src") =!= col("dst"))
      .select("src", "dst").distinct() // a pair can share both cells
    val emb = vecs.select(col("vec_id"), col("embedding"))
    val topM = udaf(new TopKAgg(GraphDegree))
    cand
      .join(emb.select(col("vec_id").as("src"), col("embedding").as("se")), Seq("src"))
      .join(emb.select(col("vec_id").as("dst"), col("embedding").as("de")), Seq("dst"))
      .select(col("src"), cosine(col("se"), col("de")).as("esim"), col("dst"))
      .groupBy(col("src"))
      .agg(topM(col("esim"), col("dst")).as("nn"))
      .select(col("src"), explode(col("nn")).as("n"))
      .select(col("src"), col("n.id").as("dst"))
  }

  // Shared beam-walk machinery, used by BOTH the fixed-hop oracle face
  // ([[graphBeamSearch]]) and the converged production face
  // ([[graphBeamSearchConverged]]) so the two can never drift: probes,
  // entry frontier, one expand round, final exact top-k.
  private def beamProbes(vecs: DataFrame): DataFrame =
    vecs.filter(col("vec_id") % ProbeStride === 0)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pemb"))

  private def beamEntry(vecs: DataFrame, probes: DataFrame): DataFrame = {
    val cents = sampledCentroids(vecs)
    val topE = udaf(new TopKAgg(GraphEntries))
    probes.join(broadcast(cents))
      .select(col("probe_id"),
        cosine(col("pemb"), col("cemb")).as("csim"), col("cent_id"))
      .groupBy(col("probe_id"))
      .agg(topE(col("csim"), col("cent_id")).as("e"))
      .select(col("probe_id"), explode(col("e")).as("e"))
      .select(col("probe_id"), col("e.id").as("node"))
  }

  private def beamScore(cands: DataFrame, emb: DataFrame, probes: DataFrame): DataFrame =
    cands.join(emb, col("node") === col("vec_id"))
      .join(broadcast(probes), Seq("probe_id"))
      .select(col("probe_id"), col("node"),
        cosine(col("pemb"), col("embedding")).as("sim"))

  /** One hop: beam-prune the visited set, expand out-edges, drop already-
    * visited nodes, score the rest. Returns ONLY the newly scored rows. */
  private def beamExpand(visited: DataFrame, adj: DataFrame,
      emb: DataFrame, probes: DataFrame): DataFrame = {
    val topB = udaf(new TopKAgg(GraphBeam))
    val frontier = visited.groupBy(col("probe_id"))
      .agg(topB(col("sim"), col("node")).as("f"))
      .select(col("probe_id"), explode(col("f")).as("f"))
      .select(col("probe_id"), col("f.id").as("src"))
    val cand = frontier.join(adj, Seq("src"))
      .select(col("probe_id"), col("dst").as("node")).distinct()
      .join(visited.select("probe_id", "node"), Seq("probe_id", "node"), "left_anti")
    beamScore(cand, emb, probes)
  }

  private def beamTopk(visited: DataFrame): DataFrame = {
    val topk = udaf(new TopKAgg(TopK))
    visited.filter(col("node") =!= col("probe_id"))
      .groupBy(col("probe_id"))
      .agg(topk(col("sim"), col("node")).as("nn"))
      .select(col("probe_id"), posexplode(col("nn")).as(Seq("pos", "n")))
      .select(col("probe_id"), (col("pos") + 1).cast("int").as("rank"),
        col("n.id").as("neighbor_id"), round(col("n.sim"), 6).as("sim"))
      .orderBy(col("probe_id"), col("rank"))
  }

  /** Beam search over a prebuilt adjacency: entry → `GraphHops` rounds of
    * expand/score/prune → exact top-k over everything visited. */
  private[graft] def graphBeamSearch(vecs: DataFrame, adj: DataFrame): DataFrame = {
    val probes = beamProbes(vecs)
    val emb = vecs.select(col("vec_id"), col("embedding"))
    // lazy checkpoints: each still truncates the plan to a LogicalRDD
    // (bounding plan growth per hop); the single final action
    // materializes hop h before hop h+1's stages consume it, so no
    // per-hop eager job is spent (fixed-hop face only — the converged
    // face keeps eager checkpoints around its per-round driver actions)
    var visited = beamScore(beamEntry(vecs, probes), emb, probes).localCheckpoint(false)
    for (_ <- 1 to GraphHops)
      visited = visited.union(beamExpand(visited, adj, emb, probes)).localCheckpoint(false)
    beamTopk(visited)
  }

  /** Beam search to CONVERGENCE — the production face (spec-gated; the
    * oracle row stays on the fixed-hop schedule, the `kcoreConverged` /
    * `pagerankConverged` split). Hops continue until the per-probe top-k
    * SET is unchanged by a hop (or the frontier stops producing unvisited
    * nodes — the stronger guarantee); fails loudly past `maxHops`,
    * because a silently truncated walk under-reports recall. This is the
    * standard graph-ANN termination rule (HNSW's "no candidate improves
    * the result set" stop), and each hop's bill is identical to the
    * fixed-hop form: one equi-join frontier→adjacency + one bounded
    * TopKAgg per probe, with an eager `localCheckpoint` per round keeping
    * plan depth constant. The convergence probe itself is cheap — the
    * top-k frames are probes × k rows, compared with one anti join.
    * Returns (result, hops actually run). */
  private[graft] def graphBeamSearchConverged(vecs: DataFrame, adj: DataFrame,
      maxHops: Int = 30): (DataFrame, Int) = {
    val probes = beamProbes(vecs)
    val emb = vecs.select(col("vec_id"), col("embedding"))
    var visited = beamScore(beamEntry(vecs, probes), emb, probes).localCheckpoint(true)
    var prevTopk = beamTopk(visited).localCheckpoint(true)
    var stable = false
    var hops = 0
    while (!stable && hops < maxHops) {
      val fresh = beamExpand(visited, adj, emb, probes).localCheckpoint(true)
      hops += 1
      if (fresh.isEmpty) stable = true // frontier exhausted: fixpoint
      else {
        visited = visited.union(fresh).localCheckpoint(true)
        val curTopk = beamTopk(visited).localCheckpoint(true)
        stable = curTopk.join(prevTopk,
          Seq("probe_id", "rank", "neighbor_id"), "left_anti").isEmpty
        prevTopk = curTopk
      }
    }
    require(stable,
      s"graph beam search did not reach a stable top-$TopK in $maxHops hops")
    (prevTopk, hops)
  }

  def vecGraphTopk(spark: SparkSession, sfDir: String): DataFrame = {
    VectorFunctions.register(spark)
    val vecs = Tables.load(spark, sfDir, "embeddings")
    // build materialized ONCE (the hop loop's eager checkpoints would
    // otherwise re-run the whole graph build every round)
    graphBeamSearch(vecs, graphAdjacency(vecs).localCheckpoint(true))
  }

  // Build/query split for the graph index — the vec_ivf_topk_cached
  // pattern applied to the adjacency: at 100 TB the bounded-degree graph
  // (N × GraphDegree rows) is built once, persisted partitioned by a
  // src-hash bucket, and every query's per-hop frontier→adjacency join
  // reads only the index table. Same walk, same oracle (the adjacency is
  // a deterministic function of the corpus).
  private val graphIndexDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Build (once per sfDir) and persist the bounded-degree neighbor
    * graph `(src, dst)`; returns its directory. */
  def prepareGraphIndex(spark: SparkSession, sfDir: String): String =
    graphIndexDirs.computeIfAbsent(sfDir, { _ =>
      val dir = java.nio.file.Files.createTempDirectory("graft-graph").toString
      val vecs = Tables.load(spark, sfDir, "embeddings")
      graphAdjacency(vecs).write.mode("overwrite").parquet(dir)
      dir
    })

  /** `vec_graph_topk` over the persisted adjacency — the query-path
    * cost, benchable separately from the build. */
  def vecGraphTopkCached(spark: SparkSession, sfDir: String): DataFrame = {
    VectorFunctions.register(spark)
    val dir = prepareGraphIndex(spark, sfDir)
    val vecs = Tables.load(spark, sfDir, "embeddings")
    graphBeamSearch(vecs, spark.read.parquet(dir))
  }

  val vecGraphTopkSql: String = {
    def cos(a: String, b: String) =
      s"list_cosine_similarity(CAST($a AS DOUBLE[]), CAST($b AS DOUBLE[]))"
    val hops = (1 to GraphHops).map { h =>
      val prev = s"v${h - 1}"
      s"""f$h AS (
        |  SELECT probe_id, node FROM (
        |    SELECT probe_id, node,
        |      row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, node) AS rn
        |    FROM $prev) WHERE rn <= $GraphBeam),
        |n$h AS (
        |  SELECT DISTINCT f.probe_id, a.dst AS node
        |  FROM f$h f JOIN adj a ON a.src = f.node
        |  WHERE NOT EXISTS (SELECT 1 FROM $prev v
        |                    WHERE v.probe_id = f.probe_id AND v.node = a.dst)),
        |v$h AS (
        |  SELECT * FROM $prev UNION ALL
        |  SELECT n.probe_id, n.node, ${cos("p.pemb", "e.embedding")} AS sim
        |  FROM n$h n JOIN embeddings e ON e.vec_id = n.node
        |            JOIN probes p ON p.probe_id = n.probe_id)""".stripMargin
    }.mkString(",\n")
    s"""WITH cents AS (
      |  SELECT vec_id AS cent_id, embedding AS cemb FROM embeddings
      |  WHERE vec_id % $CentroidStride = 0),
      |memb AS (
      |  SELECT vec_id, cent_id FROM (
      |    SELECT e.vec_id, c.cent_id,
      |      row_number() OVER (PARTITION BY e.vec_id
      |        ORDER BY ${cos("e.embedding", "c.cemb")} DESC, c.cent_id) AS rn
      |    FROM embeddings e CROSS JOIN cents c)
      |  WHERE rn <= $GraphMemb),
      |cand AS (
      |  SELECT DISTINCT a.vec_id AS src, b.vec_id AS dst
      |  FROM memb a JOIN memb b ON a.cent_id = b.cent_id AND a.vec_id != b.vec_id),
      |adj AS (
      |  SELECT src, dst FROM (
      |    SELECT c.src, c.dst,
      |      row_number() OVER (PARTITION BY c.src
      |        ORDER BY ${cos("sa.embedding", "sb.embedding")} DESC, c.dst) AS rn
      |    FROM cand c JOIN embeddings sa ON sa.vec_id = c.src
      |                JOIN embeddings sb ON sb.vec_id = c.dst)
      |  WHERE rn <= $GraphDegree),
      |probes AS (
      |  SELECT vec_id AS probe_id, embedding AS pemb FROM embeddings
      |  WHERE vec_id % $ProbeStride = 0),
      |entry AS (
      |  SELECT probe_id, cent_id AS node FROM (
      |    SELECT p.probe_id, c.cent_id,
      |      row_number() OVER (PARTITION BY p.probe_id
      |        ORDER BY ${cos("p.pemb", "c.cemb")} DESC, c.cent_id) AS rn
      |    FROM probes p CROSS JOIN cents c)
      |  WHERE rn <= $GraphEntries),
      |v0 AS (
      |  SELECT en.probe_id, en.node, ${cos("p.pemb", "e.embedding")} AS sim
      |  FROM entry en JOIN embeddings e ON e.vec_id = en.node
      |               JOIN probes p ON p.probe_id = en.probe_id),
      |$hops,
      |ranked AS (
      |  SELECT probe_id, node, sim,
      |    row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, node) AS rank
      |  FROM v$GraphHops WHERE node != probe_id)
      |SELECT probe_id, rank, node AS neighbor_id, round(sim, 6) AS sim
      |FROM ranked WHERE rank <= $TopK ORDER BY probe_id, rank""".stripMargin
  }
}
