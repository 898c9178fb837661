package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{ScoredId, TopKAgg}
import graft.queries.VectorQueries

/** CosineSimilarity expression (interpreted vs codegen vs Scala-computed),
  * the bounded TopKAgg, and the vector query shapes on a tiny corpus. */
class VectorSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.build(4, "vector-spec")
  import spark.implicits._

  private def cosScala(a: Seq[Float], b: Seq[Float]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    (0 until n).foreach { i =>
      dot += a(i).toDouble * b(i).toDouble
      nx += a(i).toDouble * a(i).toDouble
      ny += b(i).toDouble * b(i).toDouble
    }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  private val vecs = Seq(
    (1L, Seq(1.0f, 0.0f, 2.0f, -1.0f)),
    (2L, Seq(0.5f, 0.1f, 1.9f, -0.8f)),
    (3L, Seq(-1.0f, 2.0f, 0.0f, 1.0f)),
    (4L, Seq(0.0f, 0.0f, 0.0f, 0.0f)))

  test("GraftExtensions registers cosine_sim for pure-SQL sessions") {
    // an isolated session whose ONLY registration route is the
    // extensions class — proves pure-SQL users need no register() call.
    // `withExtensions(new GraftExtensions)` is the same injection path
    // `spark.sql.extensions=graft.functions.GraftExtensions` takes; the
    // config form is static (read at first SparkContext creation), so a
    // shared-context test suite can only exercise it programmatically.
    spark // force the shared session to exist before parking it
    val prevActive = SparkSession.getActiveSession
    val prevDefault = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]").appName("ext-spec")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      import s2.implicits._
      val one = Seq((Seq(1.0f, 2.0f), Seq(1.0f, 2.0f))).toDF("a", "b")
      one.createOrReplaceTempView("ext_vecs")
      val sim = s2.sql("SELECT cosine_sim(a, b) AS sim FROM ext_vecs")
        .collect().head.getDouble(0)
      assert(math.abs(sim - 1.0) < 1e-12)
      // the SQ kernels resolve through the same injection
      val q = s2.sql(
        """SELECT sq_encode(a, array(0.0D, 0.0D, 4.0D, 4.0D), 255) AS codes,
          |  sq_score(sq_encode(a, array(0.0D, 0.0D, 4.0D, 4.0D), 255),
          |           b, array(0.0D, 0.0D, 4.0D, 4.0D), 255) AS s
          |FROM ext_vecs""".stripMargin).collect().head
      assert(q.getSeq[Int](0) == Seq(64, 128)) // 1·255/4+0.5→64, 2·255/4+0.5→128
      assert(q.getDouble(1) > 0.0)
      // the winnowing kernel resolves through the same injection
      val wf = s2.sql(
        "SELECT winnow_fps('abcdefghijklmnopqrstuvwxyz', 16, 8) AS fps")
        .collect().head.getSeq[Long](0)
      assert(wf.nonEmpty && wf.forall(h => h >= 0L && h < 2147483647L))
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }

  test("cosine_sim matches a Scala-side computation (codegen on and off)") {
    val df = vecs.toDF("id", "emb")
    val pairs = df.select(col("id").as("a"), col("emb").as("ea"))
      .crossJoin(df.select(col("id").as("b"), col("emb").as("eb")))
    for (codegen <- Seq("true", "false")) {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      val got = pairs
        .select(col("a"), col("b"), call_function("cosine_sim", col("ea"), col("eb")).as("sim"))
        .as[(Long, Long, Double)].collect()
      assert(got.length == 16)
      got.foreach { case (a, b, sim) =>
        val want = cosScala(vecs(a.toInt - 1)._2, vecs(b.toInt - 1)._2)
        assert(math.abs(sim - want) < 1e-12, s"pair ($a,$b): got $sim want $want")
      }
    }
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("vec_dot and pq_encode match their compositional HOF forms bit-for-bit, codegen on and off") {
    graft.functions.VectorFunctions.register(spark)
    // 16-dim vectors, M=4 subspaces × subDim=4, K=3 codewords — with a
    // deliberate exact-tie codebook (codewords 0 and 1 of subspace 0
    // are identical) so the first-min tie-break is exercised.
    val rnd = new scala.util.Random(7)
    val dims = 16; val m = 4; val subDim = 4; val k = 3
    val data = (0 until 50).map(i => (i.toLong, Seq.fill(dims)(rnd.nextFloat() * 2f - 1f)))
    val cw0 = Seq.fill(subDim)(rnd.nextFloat())
    val cbs: Seq[Seq[Seq[Float]]] = (0 until m).map { mi =>
      if (mi == 0) Seq(cw0, cw0, Seq.fill(subDim)(rnd.nextFloat()))
      else (0 until k).map(_ => Seq.fill(subDim)(rnd.nextFloat()))
    }
    val df = data.toDF("id", "emb")
    // the compositional reference: exactly the pre-fusion formulation
    def l2sqH(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => (x.cast("double") - y.cast("double")) *
        (x.cast("double") - y.cast("double"))), lit(0.0), (acc, v) => acc + v)
    def dotH(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    val refCols = (0 until m).map { mi =>
      val dists = transform(typedLit(cbs(mi)), c => l2sqH(slice(col("emb"), mi * subDim + 1, subDim), c))
      (array_position(dists, array_min(dists)) - 1).cast("int").as(s"r$mi")
    }
    for (codegen <- Seq("true", "false")) {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      val got = df.select(
        col("id") +:
          call_function("vec_dot", col("emb"), col("emb")).as("dotf") +:
          dotH(col("emb"), col("emb")).as("doth") +:
          call_function("pq_encode", col("emb"), typedLit(cbs)).as("codes") +: refCols: _*)
        .collect()
      assert(got.length == 50)
      got.foreach { r =>
        assert(r.getDouble(1) == r.getDouble(2),
          s"vec_dot bits differ from HOF chain (codegen=$codegen, id=${r.getLong(0)})")
        val fused = r.getSeq[Int](3)
        val ref = (0 until m).map(mi => r.getInt(4 + mi))
        assert(fused == ref,
          s"pq_encode codes differ from compositional argmin (codegen=$codegen, id=${r.getLong(0)}): $fused vs $ref")
      }
    }
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    // double-array input (the residual path) also round-trips
    val ddf = data.map { case (i, e) => (i, e.map(_.toDouble)) }.toDF("id", "emb")
    val dcodes = ddf.select(call_function("pq_encode", col("emb"), typedLit(cbs)).as("c")).collect()
    assert(dcodes.length == 50 && dcodes.forall(_.getSeq[Int](0).length == m))
  }

  test("vec_dot mirrors the HOF chain's NULL on unequal lengths; pq_encode fails loudly on short vectors") {
    graft.functions.VectorFunctions.register(spark)
    // unequal lengths: zip_with pads with nulls that poison the fold →
    // the HOF chain yields NULL; vec_dot must agree, not truncate
    val uneven = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 2.0f))).toDF("a", "b")
    for (codegen <- Seq("true", "false")) {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      val r = uneven.select(
        call_function("vec_dot", col("a"), col("b")).as("fused"),
        aggregate(zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
          lit(0.0), (acc, v) => acc + v).as("hof")).head()
      assert(r.isNullAt(1), s"HOF chain should be NULL on unequal lengths (codegen=$codegen)")
      assert(r.isNullAt(0), s"vec_dot must mirror the NULL (codegen=$codegen)")
    }
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    // a short vector must throw, never read out-of-bounds memory into
    // silently-wrong codes
    val cbs: Seq[Seq[Seq[Float]]] = Seq(Seq(Seq(0f, 0f), Seq(1f, 1f)))
    val short = Seq(Seq(1.0f)).toDF("emb")
    val e = intercept[Exception] {
      short.select(call_function("pq_encode", col("emb"), typedLit(cbs))).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("pq_encode")), s"unexpected failure: $e")
  }

  test("TopKAgg keeps k best ordered by sim desc then id asc, merge-stable") {
    val agg = new TopKAgg(3)
    val items = Seq(
      ScoredId(0.5, 10), ScoredId(0.9, 3), ScoredId(0.9, 1),
      ScoredId(0.1, 7), ScoredId(0.7, 2), ScoredId(0.9, 2))
    val expected = Seq(ScoredId(0.9, 1), ScoredId(0.9, 2), ScoredId(0.9, 3))
    // sequential reduce
    assert(items.foldLeft(agg.zero)(agg.reduce) == expected)
    // any split + merge gives the same answer (partial-agg correctness)
    for (cut <- 0 to items.length) {
      val (l, r) = items.splitAt(cut)
      val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      assert(merged == expected, s"cut=$cut")
    }
  }

  test("vec_topk: each probe gets 5 ranked neighbors, self excluded") {
    val df = VectorQueries.vecTopk(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    val probes = rows.map(_.getLong(0)).distinct
    assert(probes.nonEmpty)
    probes.foreach { p =>
      val mine = rows.filter(_.getLong(0) == p)
      assert(mine.map(_.getInt(1)).toSeq.sorted == (1 to 5))
      assert(!mine.exists(_.getLong(2) == p), "probe must not be its own neighbor")
      val sims = mine.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(sims.zip(sims.tail).forall { case (x, y) => x >= y }, "sims descend with rank")
    }
  }

  test("IVF recall@5 vs brute force is measured and bounded") {
    // ANN without a recall number is not an operator, it's a hope. On
    // the deterministic sf0.001 corpus, compare each IVF variant's
    // top-5 to the exact brute-force top-5 per probe. nprobe=2 of ~40
    // lists bounds recall away from 1.0 by design; the floor asserts
    // the inverted lists actually group neighbors (random assignment
    // would score ~nprobe/nlists ≈ 0.05).
    val sf = "/root/testdata/sf0.001"
    def nn(name: String): Map[Long, Set[Long]] =
      SparkEntry.queries(name)(spark, sf)
        .select(col("probe_id").cast("long"), col("neighbor_id").cast("long"))
        .as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = nn("vec_topk")
    Seq("vec_ivf_topk", "vec_ivf_kmeans").foreach { name =>
      val approx = nn(name)
      assert(approx.keySet == exact.keySet, s"$name lost probes")
      val recall = exact.map { case (p, e) =>
        approx(p).intersect(e).size.toDouble / e.size
      }.sum / exact.size
      info(f"$name recall@5 = $recall%.3f")
      assert(recall >= 0.5 && recall <= 1.0,
        s"$name recall@5 $recall out of bounds — inverted lists are not grouping neighbors")
    }
  }

  test("SQ8 recall@5 vs brute force is measured and bounded") {
    // 8-bit uniform scalar quantization loses far less geometry than
    // PQ's 64-codeword subspaces, so the bound is tighter: the 4×k
    // rerank pool should nearly always contain the true top-5.
    val sf = "/root/testdata/sf0.001"
    def nn(name: String): Map[Long, Set[Long]] =
      SparkEntry.queries(name)(spark, sf)
        .select(col("probe_id").cast("long"), col("neighbor_id").cast("long"))
        .as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = nn("vec_topk")
    val sq = nn("vec_sq_topk")
    assert(sq.keySet == exact.keySet, "SQ lost probes")
    val recall = exact.map { case (p, e) =>
      sq(p).intersect(e).size.toDouble / e.size
    }.sum / exact.size
    info(f"vec_sq_topk recall@5 = $recall%.3f")
    assert(recall >= 0.9 && recall <= 1.0,
      s"SQ8 recall@5 $recall out of bounds — 8-bit ranges should preserve the top-5 almost exactly")
  }

  test("Matryoshka recall@5 vs brute force is measured and bounded; sims are exact") {
    // the 16-dim prefix is a random projection of sorts on this
    // synthetic corpus (true MRL embeddings would concentrate more
    // signal up front) — the 4×k exact-rerank pool should still recover
    // most of the true top-5, and every emitted sim is a full-vector
    // cosine so it can never exceed the brute-force sim at equal rank
    val sf = "/root/testdata/sf0.001"
    def nn(name: String): Map[Long, Set[Long]] =
      SparkEntry.queries(name)(spark, sf)
        .select(col("probe_id").cast("long"), col("neighbor_id").cast("long"))
        .as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = nn("vec_topk")
    val mrl = nn("vec_matryoshka_topk")
    assert(mrl.keySet == exact.keySet, "MRL lost probes")
    val recall = exact.map { case (p, e) =>
      mrl(p).intersect(e).size.toDouble / e.size
    }.sum / exact.size
    info(f"vec_matryoshka_topk recall@5 = $recall%.3f")
    assert(recall >= 0.5 && recall <= 1.0,
      s"MRL recall@5 $recall out of bounds — the prefix coarse rank is not finding neighbors")
  }

  test("PQ recall@5 vs brute force is measured and bounded; sims are exact") {
    // PQ scores in the compressed domain (ADC over M=8 code lookups),
    // then reranks a 4×k pool with exact cosine — so recall can dip
    // below 1.0 (quantization) but every EMITTED sim must be a true
    // cosine, i.e. ≤ the brute-force sim at the same rank.
    val sf = "/root/testdata/sf0.001"
    val exact = SparkEntry.queries("vec_topk")(spark, sf)
      .select(col("probe_id").cast("long"), col("neighbor_id").cast("long"))
      .as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val pq = SparkEntry.queries("vec_pq_topk")(spark, sf)
      .select(col("probe_id").cast("long"), col("neighbor_id").cast("long"))
      .as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(pq.keySet == exact.keySet, "PQ lost probes")
    val recall = exact.map { case (p, e) =>
      pq(p).intersect(e).size.toDouble / e.size
    }.sum / exact.size
    info(f"vec_pq_topk recall@5 = $recall%.3f")
    assert(recall >= 0.5 && recall <= 1.0,
      s"PQ recall@5 $recall out of bounds — codebooks are not quantizing neighbors together")
  }

  test("IVF-PQ recall@5 vs brute force is measured and bounded") {
    // IVF-PQ composes both approximations: probing only NProbe lists
    // (IVF recall loss) and residual-ADC scoring (PQ quantization loss).
    // The floor is the product of the families' individual floors; the
    // exact rerank still guarantees every emitted sim is a true cosine.
    val sf = "/root/testdata/sf0.001"
    val exact = SparkEntry.queries("vec_topk")(spark, sf)
      .select(col("probe_id").cast("long"), col("neighbor_id").cast("long"))
      .as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val got = SparkEntry.queries("vec_ivfpq_topk")(spark, sf)
      .select(col("probe_id").cast("long"), col("neighbor_id").cast("long"))
      .as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(got.keySet == exact.keySet, "IVF-PQ lost probes")
    val recall = exact.map { case (p, e) =>
      got(p).intersect(e).size.toDouble / e.size
    }.sum / exact.size
    info(f"vec_ivfpq_topk recall@5 = $recall%.3f")
    assert(recall >= 0.4 && recall <= 1.0,
      s"IVF-PQ recall@5 $recall out of bounds — residual codebooks or list probing broken")
  }

  test("vec_ann_lsh: candidates verified by exact cosine above threshold") {
    val df = VectorQueries.vecAnnLsh(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.nonEmpty, "ANN result must not be trivially empty")
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.35 - 1e-6)
    }
  }

  test("graph ANN: bounded degree, and beam-search recall@5 beats IVF-flat") {
    // the graph index must honor its degree cap (that IS the 100 TB
    // bound: adjacency = N × degree rows), and walking it must not lose
    // accuracy vs the quantizer-probing path — HNSW-shaped search exists
    // to beat cell probing at equal visit budgets, so equal-or-better
    // recall on the deterministic corpus is the acceptance bar.
    val sf = "/root/testdata/sf0.001"
    val adj = VectorQueries.graphAdjacency(
      Tables.load(spark, sf, "embeddings").select(col("vec_id"), col("embedding")))
    val deg = adj.groupBy("src").count().agg(max("count")).head.getLong(0)
    assert(deg <= 8, s"out-degree $deg exceeds the cap")
    def nn(name: String): Map[Long, Set[Long]] =
      SparkEntry.queries(name)(spark, sf)
        .select(col("probe_id").cast("long"), col("neighbor_id").cast("long"))
        .as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = nn("vec_topk")
    def recall(approx: Map[Long, Set[Long]]): Double = {
      assert(approx.keySet == exact.keySet, "lost probes")
      exact.map { case (p, e) => approx(p).intersect(e).size.toDouble / e.size }
        .sum / exact.size
    }
    val graph = recall(nn("vec_graph_topk"))
    val ivf = recall(nn("vec_ivf_topk"))
    info(f"vec_graph_topk recall@5 = $graph%.3f vs vec_ivf_topk $ivf%.3f")
    assert(graph >= ivf,
      s"graph recall $graph below IVF $ivf — the walk is not reaching neighbors")
    assert(graph >= 0.5 && graph <= 1.0, s"graph recall $graph out of bounds")
  }

  test("converged beam search ≡ fixed-hop walk on the fixture, and fails loudly past the budget") {
    // the production face stops on its own evidence (per-probe top-k set
    // unchanged by a hop / frontier exhausted) instead of a pinned hop
    // count — same split as kcoreConverged / pagerankConverged. On the
    // deterministic fixture the walk stabilizes within the oracle's
    // fixed GraphHops, so the two faces must emit IDENTICAL rows.
    val sf = "/root/testdata/sf0.001"
    val vecs = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val adj = VectorQueries.graphAdjacency(vecs).localCheckpoint(true)
    val fixed = VectorQueries.graphBeamSearch(vecs, adj)
      .collect().map(_.toSeq).toSet
    val (convDf, hops) = VectorQueries.graphBeamSearchConverged(vecs, adj)
    val conv = convDf.orderBy(col("probe_id"), col("rank"))
      .collect().map(_.toSeq).toSet
    info(s"beam search converged in $hops hops")
    assert(hops >= 1, "converged walk must run at least one hop")
    assert(conv == fixed,
      "converged beam search diverged from the fixed-hop oracle face on the fixture")
    // an exhausted budget must be LOUD, not a silently truncated walk
    val e = intercept[IllegalArgumentException] {
      VectorQueries.graphBeamSearchConverged(vecs, adj, maxHops = 0)
    }
    assert(e.getMessage.contains("did not reach a stable"))
  }

  test("vec_ivf_nprobe_sweep: recall and cost are monotone in NProbe, frontier is non-degenerate") {
    // the recall/cost frontier an index owner tunes from: probing more
    // lists can only add candidates, and a candidate that displaces a
    // true-top-k member from an answer list must itself be in the true
    // top-k (the global k best under the shared (sim desc, id asc)
    // order) — so hits and probed_rows are both non-decreasing in
    // nprobe. Degenerate frontiers (flat recall, or recall already 1.0
    // at nprobe=1) would make the sweep worthless as a tuning tool.
    val sf = "/root/testdata/sf0.001"
    val rows = VectorQueries.vecIvfNprobeSweep(spark, sf)
      .select(col("nprobe"), col("probed_rows"), col("hits"), col("recall_e6"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1 to VectorQueries.SweepMaxNProbe),
      s"one row per setting expected: ${rows.map(_._1).mkString(",")}")
    rows.sliding(2).foreach {
      case Array((n1, c1, h1, r1), (n2, c2, h2, r2)) =>
        assert(c2 >= c1, s"probed_rows fell $c1 -> $c2 from nprobe=$n1 to $n2")
        assert(h2 >= h1, s"hits fell $h1 -> $h2 from nprobe=$n1 to $n2")
        assert(r2 >= r1, s"recall fell $r1 -> $r2 from nprobe=$n1 to $n2")
      case _ =>
    }
    assert(rows.last._2 > rows.head._2, "cost axis degenerate: probing 8 lists costs no more than 1")
    assert(rows.last._4 > rows.head._4,
      s"recall axis degenerate: ${rows.head._4} -> ${rows.last._4}; the sweep grades nothing")
  }

  test("vec_graph_topk_cached (persisted adjacency) ≡ the self-contained walk") {
    // build/query split: the persisted index must answer bit-identically
    // to the build-inline form — the vec_ivf_topk_cached acceptance bar.
    val sf = "/root/testdata/sf0.001"
    val inline = SparkEntry.queries("vec_graph_topk")(spark, sf)
      .collect().map(_.toSeq).toSet
    val cached = SparkEntry.queries("vec_graph_topk_cached")(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(cached == inline, "persisted-adjacency walk diverged from inline build")
  }
}
