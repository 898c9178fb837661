package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized-geometry equivalence for the fused kernels: across many
  * random (M, K, subDim) codebook geometries and vector distributions,
  * `pq_encode` must produce exactly the codes of the compositional
  * `array_position(array_min)` form and `vec_dot` exactly the HOF fold —
  * the fixed-seed case in `VectorSpec` pins one geometry; this pins the
  * flat-indexing arithmetic over the geometry space. */
class KernelPropertySpec extends AnyFunSuite {

  lazy val spark = GraftSession.build(4, "kernel-prop-spec")
  import spark.implicits._

  private def l2sqH(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => (x.cast("double") - y.cast("double")) *
      (x.cast("double") - y.cast("double"))), lit(0.0), (acc, v) => acc + v)
  private def dotH(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  test("winnow_fps ≡ the compositional hash→window-min→distinct chain across random texts") {
    graft.functions.VectorFunctions.register(spark)
    val rnd = new scala.util.Random(7)
    // half ASCII (the allocation-free byte path), half with multi-byte
    // codepoints (umlauts, CJK, an astral emoji — surrogate pairs): the
    // kernel must hash CODEPOINTS, the semantics the DuckDB
    // ascii(substr(…)) oracle and the char-counting prefilter share —
    // a byte-positional kernel diverges on every non-ASCII text
    val alphabets: Seq[Seq[String]] = Seq(
      "abcdefgh ".map(_.toString),
      Seq("a", "b", "c", "d", "é", " ", "ö", "字", "🎉")) // whole codepoints
    val texts = (0 until 60).map { i =>
      val alphabet = alphabets(i % 2)
      i.toLong -> ((0 until (23 + rnd.nextInt(160)))
        .map(_ => alphabet(rnd.nextInt(alphabet.size))).mkString +
        (if (i % 2 == 1) "🎉字ö" else "")) // force multi-byte + astral tails
    }
    val k = 16; val w = 8
    val kernel = texts.toDF("id", "text")
      .select(col("id"), call_function("winnow_fps", col("text"), lit(k), lit(w)).as("fps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    // reference: plain Scala Horner + window-min + distinct, over codepoints
    def ref(t: String): Set[Long] = {
      val cs = t.codePoints().toArray
      val hs = (0 to cs.length - k).map { p =>
        cs.slice(p, p + k).map(_.toLong)
          .reduceLeft((a, c) => (a * 257L + c) % 2147483647L)
      }
      if (hs.length < w) Set.empty
      else (0 to hs.length - w).map(i => hs.slice(i, i + w).min).toSet
    }
    texts.foreach { case (id, t) =>
      assert(kernel(id) == ref(t), s"kernel diverges from reference on text $id")
    }
  }

  test("pq_encode ≡ compositional argmin and vec_dot ≡ HOF fold across random geometries") {
    graft.functions.VectorFunctions.register(spark)
    val rnd = new scala.util.Random(20260813)
    // 6 geometries spanning degenerate and irregular shapes; values from
    // mixed scales (±1, tiny, large) to stress the double chains
    val geometries = Seq((1, 1, 1), (1, 4, 7), (3, 2, 1), (4, 16, 3), (8, 5, 8), (2, 64, 2))
    geometries.foreach { case (m, k, subDim) =>
      val dims = m * subDim
      def v(): Float = {
        val scale = rnd.nextInt(3) match {
          case 0 => 1f
          case 1 => 1e-4f
          case _ => 1e4f
        }
        (rnd.nextFloat() * 2f - 1f) * scale
      }
      val cbs: Seq[Seq[Seq[Float]]] =
        (0 until m).map(_ => (0 until k).map(_ => Seq.fill(subDim)(v())))
      val rows = (0 until 40).map(i => (i.toLong, Seq.fill(dims)(v())))
      val df = rows.toDF("id", "emb")
      val refCols = (0 until m).map { mi =>
        val dists = transform(typedLit(cbs(mi)),
          c => l2sqH(slice(col("emb"), mi * subDim + 1, subDim), c))
        (array_position(dists, array_min(dists)) - 1).cast("int").as(s"r$mi")
      }
      val got = df.select(
        col("id") +:
          call_function("vec_dot", col("emb"), col("emb")).as("df_") +:
          dotH(col("emb"), col("emb")).as("dh") +:
          call_function("pq_encode", col("emb"), typedLit(cbs)).as("codes") +: refCols: _*)
        .collect()
      got.foreach { r =>
        assert(r.getDouble(1) == r.getDouble(2),
          s"vec_dot mismatch at geometry (m=$m,k=$k,subDim=$subDim), id=${r.getLong(0)}")
        val fused = r.getSeq[Int](3)
        val ref = (0 until m).map(mi => r.getInt(4 + mi))
        assert(fused == ref,
          s"pq_encode mismatch at geometry (m=$m,k=$k,subDim=$subDim), id=${r.getLong(0)}: $fused vs $ref")
      }
    }
  }

  test("sq_encode/sq_score ≡ the compositional when/floor and fold chains across random dims") {
    graft.functions.VectorFunctions.register(spark)
    val rnd = new scala.util.Random(20260814)
    val levels = 255
    // include a constant dim (mx==mn) and mixed scales
    Seq(1, 3, 16, 64).foreach { dims =>
      def v(): Float = {
        val scale = rnd.nextInt(3) match {
          case 0 => 1f
          case 1 => 1e-4f
          case _ => 1e4f
        }
        (rnd.nextFloat() * 2f - 1f) * scale
      }
      val rows = (0 until 40).map { i =>
        val e = Seq.fill(dims)(v()).zipWithIndex
          .map { case (x, d) => if (d == 1 && dims > 1) 7.5f else x } // dim 1 constant
        (i.toLong, e)
      }
      val probe = Seq.fill(dims)(v())
      val df = rows.toDF("id", "emb")
      val mmCols = (1 to dims).flatMap(d => Seq(
        min(element_at(col("emb"), d).cast("double")).as(s"mn$d"),
        max(element_at(col("emb"), d).cast("double")).as(s"mx$d")))
      val mm = df.agg(mmCols.head, mmCols.tail: _*)
      val ranges = mm.select(array(
        (1 to dims).map(d => col(s"mn$d")) ++
          (1 to dims).map(d => col(s"mx$d")): _*).as("ranges"))
      val joined = df.crossJoin(broadcast(ranges)).crossJoin(broadcast(mm))
      def scale(d: Int) = (col(s"mx$d") - col(s"mn$d")) / lit(levels.toDouble)
      val refCodes = (1 to dims).map { d =>
        when(col(s"mx$d") === col(s"mn$d"), lit(0))
          .otherwise(floor((element_at(col("emb"), d).cast("double") - col(s"mn$d")) *
            lit(levels.toDouble) / (col(s"mx$d") - col(s"mn$d")) + lit(0.5)).cast("int"))
          .as(s"r$d")
      }
      val refScore = (1 to dims).foldLeft(lit(0.0)) { (acc, d) =>
        acc + (col(s"mn$d") + col(s"r$d") * scale(d)) * lit(probe(d - 1)).cast("double")
      }
      val withCodes = joined.select(
        Seq(col("id"), col("ranges")) ++
          (1 to dims).flatMap(d => Seq(col(s"mn$d"), col(s"mx$d"))) ++
          Seq(call_function("sq_encode", col("emb"), col("ranges"), lit(levels)).as("codes")) ++
          refCodes: _*)
      val out = withCodes.select(
        col("id"), col("codes"),
        call_function("sq_score",
          col("codes"), typedLit(probe), col("ranges"), lit(levels)).as("fscore"),
        refScore.as("rscore"),
        array((1 to dims).map(d => col(s"r$d")): _*).as("refcodes"))
        .collect()
      out.foreach { r =>
        val fused = r.getSeq[Int](1)
        val ref = r.getSeq[Int](4)
        assert(fused == ref,
          s"sq_encode mismatch at dims=$dims, id=${r.getLong(0)}: $fused vs $ref")
        assert(r.getAs[Double]("fscore") == r.getAs[Double]("rscore"),
          s"sq_score mismatch at dims=$dims, id=${r.getLong(0)}")
      }
    }
  }
}
