package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Graph analytics over the near-dup candidate graph — the corpus as a
  * similarity graph, beyond the connected components `dedup_clusters`
  * already extracts.
  *
  * PageRank gives each document a CENTRALITY inside its near-dup
  * neighborhood: the canonical-selection and importance-sampling signal
  * ("keep the version everything else points at") that min-doc-id or
  * max-length canonical picks cannot express.
  *
  * Scale shape: power iteration, each round = one join of the edge list
  * against the |V|-row rank frame plus one dst-keyed hash-agg — O(|V|+|E|)
  * per round, the same per-round bill as `clusterLabels`, never a
  * transitive closure, never a window. Rounds are FIXED here (3) so the
  * whole computation is one declarative plan the oracle can mirror
  * CTE-for-CTE; production iterates to an epsilon with the
  * `localCheckpoint` lineage truncation `clusterLabels` demonstrates.
  * Undirected near-dup edges mean every node has in- and out-degree ≥ 1,
  * so there is no dangling-mass term.
  *
  * Cross-engine float parity: per-edge contributions are one IEEE
  * divide, then every SUM goes through DECIMAL(28,14) so partial-agg
  * merge order cannot perturb it (float sums are the one
  * order-dependent op in the chain), and the damping update is an
  * identical literal multiply/add both sides.
  */
object GraphQueries {

  private val PrIters = 3

  /** The near-dup graph as `(edges with out-degree, degree frame, |V|
    * scalar frame)` — shared by the fixed-round oracle query and the
    * epsilon-terminated production loop. */
  private def degreeEdges(spark: SparkSession, sfDir: String): (DataFrame, DataFrame, DataFrame) = {
    val pairs = DedupQueries.minhashLsh(spark, sfDir).select(col("doc_a"), col("doc_b"))
    // both directions in ONE explode pass (a union would evaluate the
    // minhash subtree once per branch); localCheckpoint MATERIALIZES the
    // edge set and truncates lineage, so each iteration's plan starts at
    // the edges instead of re-optimizing the whole minhash chain —
    // same recipe as clusterLabels' propagation loop
    val e = pairs.select(explode(array(
        struct(col("doc_a").as("src"), col("doc_b").as("dst")),
        struct(col("doc_b").as("src"), col("doc_a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      // lazy: the EAGER `edges` checkpoint right below materializes it
      // (e is read twice inside that one plan), saving a separate job
      .localCheckpoint(false)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val edges = e.join(deg, Seq("src")).localCheckpoint()
    val nF = deg.agg(count(lit(1)).as("n"))
    (edges, deg, nF)
  }

  /** One damped power-iteration step over `(src, dst, deg)` edges. */
  private def prStep(edges: DataFrame, pr: DataFrame, nF: DataFrame): DataFrame = {
    val dec = DecimalType(28, 14)
    edges
      .join(pr.withColumnRenamed("doc_id", "src"), Seq("src"))
      .select(col("dst"), (col("pr") / col("deg").cast(DoubleType)).cast(dec).as("c"))
      .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      .crossJoin(broadcast(nF))
      .select(col("dst").as("doc_id"),
        (lit(0.15d) / col("n").cast(DoubleType)
          + lit(0.85d) * col("s").cast(DoubleType)).as("pr"))
  }

  def graphPagerank(spark: SparkSession, sfDir: String): DataFrame = {
    val (edges, deg, nF) = degreeEdges(spark, sfDir)
    var pr = deg.crossJoin(broadcast(nF))
      .select(col("src").as("doc_id"), (lit(1.0d) / col("n").cast(DoubleType)).as("pr"))
    for (_ <- 1 to PrIters) pr = prStep(edges, pr, nF)
    pr.select(col("doc_id"), round(col("pr"), 9).as("pr"))
      .orderBy(col("doc_id"))
  }

  // --- epsilon-terminated production loop -------------------------------
  // The fixed-round form above exists so the oracle can mirror the plan
  // CTE-for-CTE; production does not know the round count up front — it
  // iterates until the rank vector stops moving (Σ|Δpr| < ε). Per-round
  // bill is identical (one edge join + one dst hash-agg, O(|V|+|E|));
  // each round's result is localCheckpoint'd so lineage stays one round
  // deep (the clusterLabels recipe), and the one driver-side value per
  // round is the 1-row Σ|Δ| scalar. Fails loudly when maxIters rounds
  // don't converge — a silently-unconverged centrality is worse than an
  // error at 100 TB.

  /** Iterate [[prStep]] from `init` until `Σ|Δpr| < eps`. `edges` must
    * carry `(src, dst, deg)`; `init` is `(doc_id, pr)`. */
  private[graft] def pagerankLoop(edges: DataFrame, init: DataFrame, nF: DataFrame,
      eps: Double, maxIters: Int): DataFrame = {
    val dec = DecimalType(28, 14)
    var pr = init.localCheckpoint()
    var delta = Double.MaxValue
    var it = 0
    while (delta >= eps && it < maxIters) {
      // lazy: the Σ|Δ| action below materializes the checkpoint — one
      // job per round instead of two
      val next = prStep(edges, pr, nF).localCheckpoint(false)
      delta = next.join(pr.withColumnRenamed("pr", "pr_old"), Seq("doc_id"))
        .agg(sum(abs(col("pr") - col("pr_old")).cast(dec)).as("d"))
        .head.getDecimal(0).doubleValue()
      pr = next
      it += 1
    }
    require(delta < eps,
      s"pagerank failed to converge after $maxIters rounds (last round Σ|Δpr| = $delta)")
    pr
  }

  /** Epsilon-terminated PageRank over the near-dup graph — the
    * production face of [[graphPagerank]] (spec-gated; the oracle row
    * stays on the fixed-round query). */
  def pagerankConverged(spark: SparkSession, sfDir: String,
      eps: Double = 1e-9, maxIters: Int = 60): DataFrame = {
    val (edges, deg, nF) = degreeEdges(spark, sfDir)
    val init = deg.crossJoin(broadcast(nF))
      .select(col("src").as("doc_id"), (lit(1.0d) / col("n").cast(DoubleType)).as("pr"))
    pagerankLoop(edges, init, nF, eps, maxIters)
  }

  // --- weighted variant -------------------------------------------------
  // Same power iteration with edges weighted by their verified Jaccard:
  // a document's rank flows to near-duplicates in PROPORTION to how
  // similar they are, so the centrality signal weighs a 0.95-overlap
  // neighbor above a barely-over-threshold one. Per-edge share
  // w/Σw(src) replaces 1/deg; every float SUM (the per-src weight
  // total and the per-dst contribution fold) routes through
  // DECIMAL(28,14) so partial-agg merge order cannot perturb it —
  // jaccard itself is one IEEE divide of exact integers, identical in
  // both engines. Same O(|V|+|E|)-per-round bill as the unweighted
  // walk.
  def graphPagerankWeighted(spark: SparkSession, sfDir: String): DataFrame = {
    val dec = DecimalType(28, 14)
    val pairs = DedupQueries.minhashLsh(spark, sfDir)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
    val e = pairs.select(explode(array(
        struct(col("doc_a").as("src"), col("doc_b").as("dst"), col("jaccard").as("w")),
        struct(col("doc_b").as("src"), col("doc_a").as("dst"), col("jaccard").as("w")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"), col("e.w").as("w"))
      // lazy: materialized by the eager `edges` checkpoint below
      .localCheckpoint(false)
    val wsum = e.groupBy(col("src"))
      .agg(sum(col("w").cast(dec)).as("wsum"))
    val edges = e.join(wsum, Seq("src"))
      .select(col("src"), col("dst"),
        (col("w") / col("wsum").cast(DoubleType)).as("share"))
      .localCheckpoint()
    val nF = wsum.agg(count(lit(1)).as("n"))
    var pr = wsum.crossJoin(broadcast(nF))
      .select(col("src").as("doc_id"), (lit(1.0d) / col("n").cast(DoubleType)).as("pr"))
    for (_ <- 1 to PrIters) {
      pr = edges
        .join(pr.withColumnRenamed("doc_id", "src"), Seq("src"))
        .select(col("dst"), (col("pr") * col("share")).cast(dec).as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
        .crossJoin(broadcast(nF))
        .select(col("dst").as("doc_id"),
          (lit(0.15d) / col("n").cast(DoubleType)
            + lit(0.85d) * col("s").cast(DoubleType)).as("pr"))
    }
    pr.select(col("doc_id"), round(col("pr"), 9).as("pr"))
      .orderBy(col("doc_id"))
  }

  val graphPagerankWeightedSql: String = {
    val iters = (1 to PrIters).map { i =>
      val prev = if (i == 1) "p0" else s"it${i - 1}"
      s"""it${i}s AS (
        |  SELECT e.dst AS doc_id,
        |    sum(CAST(p.pr * e.share AS DECIMAL(28,14))) AS s
        |  FROM e2 e JOIN $prev p ON e.src = p.doc_id GROUP BY 1),
        |it$i AS (
        |  SELECT doc_id, 0.15 / CAST(n AS DOUBLE) + 0.85 * CAST(s AS DOUBLE) AS pr
        |  FROM it${i}s CROSS JOIN n)""".stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS (
      |  SELECT doc_a, doc_b, jaccard FROM (${DedupQueries.minhashLshSql})
      |),
      |e AS (SELECT doc_a AS src, doc_b AS dst, jaccard AS w FROM pairs
      |      UNION ALL SELECT doc_b, doc_a, jaccard FROM pairs),
      |ws AS (SELECT src, sum(CAST(w AS DECIMAL(28,14))) AS wsum FROM e GROUP BY 1),
      |e2 AS (SELECT e.src, e.dst, e.w / CAST(ws.wsum AS DOUBLE) AS share
      |       FROM e JOIN ws USING (src)),
      |n AS (SELECT count(*) AS n FROM ws),
      |p0 AS (SELECT src AS doc_id, 1.0 / CAST(n AS DOUBLE) AS pr
      |       FROM ws CROSS JOIN n),
      |$iters
      |SELECT doc_id, round(pr, 9) AS pr FROM it$PrIters ORDER BY doc_id""".stripMargin
  }

  val graphPagerankSql: String = {
    val iters = (1 to PrIters).map { i =>
      val prev = if (i == 1) "p0" else s"it${i - 1}"
      s"""it${i}s AS (
        |  SELECT e.dst AS doc_id,
        |    sum(CAST(p.pr / CAST(e.deg AS DOUBLE) AS DECIMAL(28,14))) AS s
        |  FROM e2 e JOIN $prev p ON e.src = p.doc_id GROUP BY 1),
        |it$i AS (
        |  SELECT doc_id, 0.15 / CAST(n AS DOUBLE) + 0.85 * CAST(s AS DOUBLE) AS pr
        |  FROM it${i}s CROSS JOIN n)""".stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS (
      |  SELECT doc_a, doc_b FROM (${DedupQueries.minhashLshSql})
      |),
      |e AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
      |      UNION ALL SELECT doc_b, doc_a FROM pairs),
      |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
      |e2 AS (SELECT e.src, e.dst, d.deg FROM e JOIN deg d USING (src)),
      |n AS (SELECT count(*) AS n FROM deg),
      |p0 AS (SELECT src AS doc_id, 1.0 / CAST(n AS DOUBLE) AS pr
      |       FROM deg CROSS JOIN n),
      |$iters
      |SELECT doc_id, round(pr, 9) AS pr FROM it$PrIters ORDER BY doc_id""".stripMargin
  }

  // --- triangle counting + global clustering coefficient ---------------
  // How clique-ish is the near-dup graph? Template families (boiler-
  // plate, mirrored sites) show up as dense triangle clusters; a high
  // clustering coefficient says transitive closure (dedup_clusters)
  // will fold aggressively. Algorithm: DEGREE-ORIENTED counting — each
  // undirected edge points from its (deg, id)-smaller endpoint, wedges
  // are built only from each source's out-neighbors ordered by the same
  // key, and a triangle closes when the (v, w) wedge matches an
  // oriented v→w edge. The orientation is the standard hub-taming
  // trick: out-degree is O(√E) even at a celebrity vertex, so wedge
  // volume — the cost driver — is Σ out-deg² instead of Σ deg²; all
  // three joins are hash equi-joins (the key ordering rides along as a
  // join residual). Outputs are pure integers (cc_e6 by integer
  // division), so the row is hashing-proof.
  def graphTriangles(spark: SparkSession, sfDir: String): DataFrame = {
    val pairs = DedupQueries.minhashLsh(spark, sfDir).select(col("doc_a"), col("doc_b"))
    val und = pairs
      .select(least(col("doc_a"), col("doc_b")).as("lo"),
        greatest(col("doc_a"), col("doc_b")).as("hi"))
      // all three checkpoints below are LAZY: the query has exactly one
      // action, which materializes them in dependency order — eager
      // checkpoints would add one driver-blocking job each for nothing
      .distinct().localCheckpoint(false)
    val deg = und.select(explode(array(col("lo"), col("hi"))).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))
      .localCheckpoint(false)
    val loFirst = col("dlo") < col("dhi") ||
      (col("dlo") === col("dhi") && col("lo") < col("hi"))
    val oriented = und
      .join(deg.select(col("v").as("lo"), col("deg").as("dlo")), "lo")
      .join(deg.select(col("v").as("hi"), col("deg").as("dhi")), "hi")
      .select(
        when(loFirst, col("lo")).otherwise(col("hi")).as("src"),
        when(loFirst, col("hi")).otherwise(col("lo")).as("dst"),
        when(loFirst, col("dhi")).otherwise(col("dlo")).as("ddst"))
      .localCheckpoint(false)
    val o1 = oriented.select(col("src"), col("dst").as("v"), col("ddst").as("dv"))
    val o2 = oriented.select(col("src"), col("dst").as("w"), col("ddst").as("dw"))
    val wedges = o1.join(o2,
      o1("src") === o2("src") &&
        (col("dv") < col("dw") || (col("dv") === col("dw") && col("v") < col("w"))))
      .select(col("v"), col("w"))
    val tri = wedges
      .join(oriented, col("v") === col("src") && col("w") === col("dst"))
      .agg(count(lit(1)).as("n_tri"))
    // one agg per source frame; the 1-row results combine via (benign,
    // single-row) nested-loop crosses
    val degStats = deg.agg(count(lit(1)).as("n_vertices"),
      sum(expr("deg * (deg - 1) div 2")).as("n_wedges"))
    val ne = und.agg(count(lit(1)).as("n_edges"))
    degStats.crossJoin(ne).crossJoin(tri)
      .select(col("n_vertices"), col("n_edges"),
        col("n_tri").as("n_triangles"), col("n_wedges"),
        when(col("n_wedges") === 0, lit(0L))
          .otherwise(expr("3 * n_tri * 1000000 div n_wedges")).as("cc_e6"))
  }

  // --- k-core peel over the near-dup graph ------------------------------
  // Template families (mirrored sites, boilerplate chains) are DENSE in
  // the near-dup graph; the k-core — the maximal subgraph where every
  // vertex keeps degree ≥ k — is the standard way to isolate those cores
  // from incidental pairwise matches. The oracle row is the PEEL
  // SCHEDULE (per round: vertices meeting the degree bar, edges among
  // them) over a fixed round count, so the plan is one declarative chain
  // the oracle mirrors CTE-for-CTE; [[kcoreConverged]] is the production
  // face that peels to the fixpoint. Per round: one degree hash-agg +
  // two keyed semi-join-shaped edge filters — O(|V|+|E|), never a
  // window; the graph here is the (already skew-capped) simhash pair
  // set, the densest near-dup graph the engine builds. All outputs are
  // exact integers.
  private val KcoreK = 3
  private val KcoreRounds = 4

  private def undirectedSimhashEdges(spark: SparkSession, sfDir: String): DataFrame =
    DedupQueries.simhash(spark, sfDir)
      .select(least(col("doc_a"), col("doc_b")).as("lo"),
        greatest(col("doc_a"), col("doc_b")).as("hi"))
      // lazy: first consumer materializes it; later consumers hit cache
      .distinct().localCheckpoint(false)

  /** One peel round: (surviving-degree frame, filtered edge frame). */
  private def peelOnce(e: DataFrame, k: Int): (DataFrame, DataFrame) = {
    val deg = e.select(explode(array(col("lo"), col("hi"))).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))
    val keep = deg.filter(col("deg") >= k).select(col("v"))
    val e2 = e.join(keep.select(col("v").as("lo")), Seq("lo"))
      .join(keep.select(col("v").as("hi")), Seq("hi"))
      .select(col("lo"), col("hi"))
    (keep, e2)
  }

  def graphKcorePeel(spark: SparkSession, sfDir: String): DataFrame = {
    var e = undirectedSimhashEdges(spark, sfDir)
    val rounds = (1 to KcoreRounds).map { r =>
      val (keep, e2) = peelOnce(e, KcoreK)
      // lazy: the plan is truncated to a LogicalRDD either way; the one
      // final action materializes each round's blocks in dependency
      // order, so no per-round eager job is needed (the round count is
      // FIXED here — the converged face keeps its per-round action)
      e = e2.localCheckpoint(false)
      keep.agg(count(lit(1)).as("vertices"))
        .crossJoin(e.agg(count(lit(1)).as("edges")))
        .select(lit(r).as("round"), col("vertices"), col("edges"))
    }
    rounds.reduce(_ unionByName _).orderBy(col("round"))
  }

  val graphKcorePeelSql: String = {
    // every peel CTE is referenced 2-4 times by its successors; without
    // MATERIALIZED, DuckDB inlines them and re-evaluates the whole
    // simhash subtree exponentially in the round count (measured: >10
    // min at sf0.01 inlined vs seconds materialized)
    val rounds = (1 to KcoreRounds).map { i =>
      val prev = if (i == 1) "e0" else s"e${i - 1}"
      s"""k$i AS MATERIALIZED (
        |  SELECT v FROM (SELECT v, count(*) AS deg
        |    FROM (SELECT lo AS v FROM $prev UNION ALL SELECT hi FROM $prev)
        |    GROUP BY 1) WHERE deg >= $KcoreK),
        |e$i AS MATERIALIZED (SELECT e.lo, e.hi FROM $prev e
        |        JOIN k$i a ON e.lo = a.v JOIN k$i b ON e.hi = b.v),
        |r$i AS (SELECT $i AS round,
        |  (SELECT CAST(count(*) AS BIGINT) FROM k$i) AS vertices,
        |  (SELECT CAST(count(*) AS BIGINT) FROM e$i) AS edges)""".stripMargin
    }.mkString(",\n")
    val sel = (1 to KcoreRounds).map(i => s"SELECT * FROM r$i").mkString(" UNION ALL ")
    s"""WITH e0 AS MATERIALIZED (
      |  SELECT DISTINCT least(doc_a, doc_b) AS lo, greatest(doc_a, doc_b) AS hi
      |  FROM (${DedupQueries.simhashSql})),
      |$rounds
      |$sel ORDER BY round""".stripMargin
  }

  /** Peel to the FIXPOINT — the production face (spec-gated; the oracle
    * row stays on the fixed-round schedule). Returns the k-core's
    * membership with each member's within-core degree; fails loudly if
    * `maxIters` rounds don't reach a fixpoint (a silently-unfinished
    * peel under-reports the core). Per-round bill identical to the
    * fixed-round form; `localCheckpoint` keeps lineage one round deep
    * and the one driver-side value per round is the edge count. */
  def kcoreConverged(spark: SparkSession, sfDir: String,
      k: Int = KcoreK, maxIters: Int = 60): DataFrame = {
    var e = undirectedSimhashEdges(spark, sfDir)
    var nEdges = e.count()
    var stable = false
    var it = 0
    while (!stable && it < maxIters) {
      val (_, e2) = peelOnce(e, k)
      // lazy: the count below materializes the checkpoint in one job
      val next = e2.localCheckpoint(false)
      val n2 = next.count()
      stable = n2 == nEdges
      e = next; nEdges = n2
      it += 1
    }
    require(stable, s"k-core peel did not reach a fixpoint in $maxIters rounds")
    e.select(explode(array(col("lo"), col("hi"))).as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("core_degree"))
  }

  // --- domain authority: PageRank over the cross-domain near-dup graph --
  // Crawl pipelines weight documents by DOMAIN authority (the
  // RefinedWeb/CommonCrawl harmonic-centrality prior): a domain whose
  // content is re-hosted by many other domains is a syndication hub, and
  // that signal lives at the domain level, not the document level. Nodes
  // are registrable domains (the corpus_domain_* derivation), an
  // undirected edge connects two DIFFERENT domains that share at least
  // one verified near-dup pair, and the walk is the same damped
  // fixed-round power iteration as `graph_pagerank` with the identical
  // DECIMAL(28,14) float-parity recipe. Scale: the doc→domain map is a
  // pure projection, pair→domain is two keyed joins against it, and the
  // graph itself is domain-count-sized (≪ corpus) — every per-round
  // frame is |domains| rows, so the iteration cost is dwarfed by the one
  // corpus-scan LSH pass that feeds it.
  def graphDomainAuthority(spark: SparkSession, sfDir: String): DataFrame = {
    import CurationQueries.{canonicalUrl, domainOf, urlOf}
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val dom = docs.select(col("doc_id"), domainOf(canonicalUrl(urlOf)).as("domain"))
    val pairs = DedupQueries.minhashLsh(spark, sfDir).select(col("doc_a"), col("doc_b"))
    val dp = pairs
      .join(dom.select(col("doc_id").as("doc_a"), col("domain").as("dom_a")), Seq("doc_a"))
      .join(dom.select(col("doc_id").as("doc_b"), col("domain").as("dom_b")), Seq("doc_b"))
      .filter(col("dom_a") =!= col("dom_b"))
      .select(least(col("dom_a"), col("dom_b")).as("lo"),
        greatest(col("dom_a"), col("dom_b")).as("hi"))
      .distinct()
    val e = dp.select(explode(array(
        struct(col("lo").as("src"), col("hi").as("dst")),
        struct(col("hi").as("src"), col("lo").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      // lazy: materialized by the eager `edges` checkpoint below
      .localCheckpoint(false)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val edges = e.join(deg, Seq("src")).localCheckpoint(true)
    val nF = deg.agg(count(lit(1)).as("n"))
    var pr = deg.crossJoin(broadcast(nF))
      .select(col("src").as("doc_id"), (lit(1.0d) / col("n").cast(DoubleType)).as("pr"))
    for (_ <- 1 to PrIters) pr = prStep(edges, pr, nF)
    pr.select(col("doc_id").as("domain"), round(col("pr"), 9).as("pr"))
      .orderBy(col("domain"))
  }

  val graphDomainAuthoritySql: String = {
    import CurationQueries.{canonicalUrlSql, domainSql, urlSqlExpr}
    val iters = (1 to PrIters).map { i =>
      val prev = if (i == 1) "p0" else s"it${i - 1}"
      s"""it${i}s AS (
        |  SELECT e.dst AS domain,
        |    sum(CAST(p.pr / CAST(e.deg AS DOUBLE) AS DECIMAL(28,14))) AS s
        |  FROM e2 e JOIN $prev p ON e.src = p.domain GROUP BY 1),
        |it$i AS (
        |  SELECT domain, 0.15 / CAST(n AS DOUBLE) + 0.85 * CAST(s AS DOUBLE) AS pr
        |  FROM it${i}s CROSS JOIN n)""".stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS (
      |  SELECT doc_a, doc_b FROM (${DedupQueries.minhashLshSql})
      |),
      |dom AS (
      |  SELECT doc_id, ${domainSql(canonicalUrlSql(s"($urlSqlExpr)"))} AS domain
      |  FROM documents),
      |dp AS (
      |  SELECT DISTINCT least(a.domain, b.domain) AS lo, greatest(a.domain, b.domain) AS hi
      |  FROM pairs JOIN dom a ON pairs.doc_a = a.doc_id
      |             JOIN dom b ON pairs.doc_b = b.doc_id
      |  WHERE a.domain != b.domain),
      |e AS (SELECT lo AS src, hi AS dst FROM dp UNION ALL SELECT hi, lo FROM dp),
      |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
      |e2 AS (SELECT e.src, e.dst, d.deg FROM e JOIN deg d USING (src)),
      |n AS (SELECT count(*) AS n FROM deg),
      |p0 AS (SELECT src AS domain, 1.0 / CAST(n AS DOUBLE) AS pr
      |       FROM deg CROSS JOIN n),
      |$iters
      |SELECT domain, round(pr, 9) AS pr FROM it$PrIters ORDER BY domain""".stripMargin
  }

  val graphTrianglesSql: String =
    s"""WITH pairs AS (
      |  SELECT doc_a, doc_b FROM (${DedupQueries.minhashLshSql})
      |),
      |und AS (SELECT DISTINCT least(doc_a, doc_b) AS lo, greatest(doc_a, doc_b) AS hi
      |        FROM pairs),
      |deg AS (SELECT v, CAST(count(*) AS BIGINT) AS deg
      |        FROM (SELECT lo AS v FROM und UNION ALL SELECT hi FROM und)
      |        GROUP BY 1),
      |o AS (
      |  SELECT
      |    CASE WHEN dl.deg < dh.deg OR (dl.deg = dh.deg AND u.lo < u.hi)
      |         THEN u.lo ELSE u.hi END AS src,
      |    CASE WHEN dl.deg < dh.deg OR (dl.deg = dh.deg AND u.lo < u.hi)
      |         THEN u.hi ELSE u.lo END AS dst,
      |    CASE WHEN dl.deg < dh.deg OR (dl.deg = dh.deg AND u.lo < u.hi)
      |         THEN dh.deg ELSE dl.deg END AS ddst
      |  FROM und u JOIN deg dl ON dl.v = u.lo JOIN deg dh ON dh.v = u.hi),
      |w AS (
      |  SELECT o1.dst AS v, o2.dst AS w2
      |  FROM o o1 JOIN o o2 ON o1.src = o2.src
      |   AND (o1.ddst < o2.ddst OR (o1.ddst = o2.ddst AND o1.dst < o2.dst))),
      |tri AS (SELECT CAST(count(*) AS BIGINT) AS n_tri
      |        FROM w JOIN o ON o.src = w.v AND o.dst = w.w2),
      |wt AS (SELECT CAST(sum(deg * (deg - 1) // 2) AS BIGINT) AS n_wedges FROM deg),
      |nv AS (SELECT CAST(count(*) AS BIGINT) AS n_vertices FROM deg),
      |ne AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM und)
      |SELECT n_vertices, n_edges, n_tri AS n_triangles, n_wedges,
      |  CAST(CASE WHEN n_wedges = 0 THEN 0
      |       ELSE 3 * n_tri * 1000000 // n_wedges END AS BIGINT) AS cc_e6
      |FROM nv, ne, tri, wt""".stripMargin
}
