package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ClassicConversions._
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Cosine similarity over two `array<float>` embedding columns as a
  * native Catalyst expression with whole-stage codegen.
  *
  * This is the hot inner loop of brute-force ANN (SURVEY §7.5 /
  * BASELINE north star): a higher-order-function formulation
  * (`aggregate(zip_with(...))`) falls out of whole-stage codegen
  * (HOFs are CodegenFallback) and allocates a zipped array per row;
  * this expression runs one fused primitive loop over the two
  * `ArrayData`, accumulating in double, no allocation.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects array<float>, got (${left.dataType.sql}, ${right.dataType.sql})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv
      nx += xv * xv
      ny += yv * yv
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = (double) $x.getFloat($i);
         |  double $yv = (double) $y.getFloat($i);
         |  $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
         |}
         |${ev.value} = ($nx == 0.0 || $ny == 0.0) ? 0.0 : $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Dot product over two equal-length `array<float>`/`array<double>`
  * columns — the per-row norm/score kernel of the PQ family.
  *
  * The HOF formulation (`aggregate(zip_with(a,b,x*y), 0.0, acc+v)`) is
  * CodegenFallback and allocates a zipped array per row; this runs one
  * fused primitive loop. The accumulation is the SAME left fold in
  * element order (`0.0 + x0*y0 + x1*y1 + …`), so results are
  * bit-identical to the HOF chain and to the generated DuckDB oracle's
  * left-associated `0.0 + …` expression.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects array<float|double>, got (${left.dataType.sql}, ${right.dataType.sql})")
  }

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  // The HOF chain this replaces returns NULL for unequal lengths
  // (zip_with pads with nulls that poison the fold) and for any null
  // element — mirror both exactly so "bit-identical" covers the edge
  // rows too. The null-element scan is skipped entirely when the input
  // types declare containsNull=false (the parquet embeddings path).
  private def mayHaveNulls: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, cn) => cn
    case _ => false
  })
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    if (mayHaveNulls) {
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        i += 1
      }
    }
    val lf = isFloat(left); val rf = isFloat(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      def rd(arr: String, fl: Boolean) =
        if (fl) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
      val nullElemCheck =
        if (mayHaveNulls)
          s"""
             |for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
             |  if ($x.isNullAt($i) || $y.isNullAt($i)) ${ev.isNull} = true;
             |}
           """.stripMargin
        else ""
      s"""
         |int $n = $x.numElements();
         |if ($y.numElements() != $n) ${ev.isNull} = true;
         |$nullElemCheck
         |if (!${ev.isNull}) {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += ${rd(x, isFloat(left))} * ${rd(y, isFloat(right))};
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Product-quantization encoder: all M subspace codes of one vector in a
  * single fused loop.
  *
  * `left` is the vector (`array<float>` raw embedding or `array<double>`
  * residual); `right` is the FOLDABLE codebook literal
  * (`array<array<array<float>>>`, rectangular M×K×subDim — the
  * `typedLit` of the driver-trained model). Output: `array<int>` of M
  * codes, `codes[m] = argmin_k Σ_d (x[m·subDim+d] − cb[m][k][d])²`,
  * first-min tie-break.
  *
  * Why an Expression: the compositional form — per subspace, a
  * `transform` over K codewords of `aggregate(zip_with(slice…))` — is
  * CodegenFallback and allocates ~M×K small arrays PER ROW (512 at
  * M=8, K=64); on the encode pass that dominates the whole PQ pipeline.
  * This loop allocates one int[] per row. Arithmetic is the identical
  * IEEE chain (subtract-widen, square, left-fold add in d order;
  * strict-< keeps the FIRST minimum exactly like
  * `array_position(d, array_min(d))`), so the generated DuckDB oracle
  * and the recall bounds are unchanged.
  */
case class PqEncode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val vecOk = left.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    val cbOk = right.foldable && (right.dataType match {
      case ArrayType(ArrayType(ArrayType(FloatType, _), _), _) => true
      case _ => false
    })
    if (vecOk && cbOk) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      "pq_encode expects (array<float|double> vec, foldable array<array<array<float>>> codebooks), " +
        s"got (${left.dataType.sql}, ${right.dataType.sql}, foldable=${right.foldable})")
  }

  private def vecIsFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** Codebooks flattened to `[m·K·subDim + k·subDim + d]` doubles —
    * evaluated ONCE from the foldable literal (model state, bounded
    * M×K×subDim), shared by interpreted eval and codegen via a
    * reference object. */
  @transient private lazy val model: (Array[Double], Int, Int, Int) = {
    val cbs = right.eval(null).asInstanceOf[ArrayData]
    val m = cbs.numElements()
    require(m > 0, "pq_encode: empty codebooks")
    val first = cbs.getArray(0)
    val k = first.numElements()
    require(k > 0, "pq_encode: empty subspace codebook")
    val subDim = first.getArray(0).numElements()
    val flat = new Array[Double](m * k * subDim)
    var mi = 0
    while (mi < m) {
      val sub = cbs.getArray(mi)
      require(sub.numElements() == k, "pq_encode: ragged codebooks (K differs by subspace)")
      var ki = 0
      while (ki < k) {
        val cw = sub.getArray(ki)
        require(cw.numElements() == subDim, "pq_encode: ragged codeword length")
        var d = 0
        while (d < subDim) {
          flat((mi * k + ki) * subDim + d) = cw.getFloat(d).toDouble
          d += 1
        }
        ki += 1
      }
      mi += 1
    }
    (flat, m, k, subDim)
  }

  private def encode(x: ArrayData): Array[Int] = {
    val (flat, m, k, subDim) = model
    // a short (corrupt) vector must fail loudly, not read adjacent
    // UnsafeArrayData memory into nondeterministic codes
    require(x.numElements() >= m * subDim,
      s"pq_encode: vector has ${x.numElements()} elements, codebooks need ${m * subDim}")
    val fl = vecIsFloat
    val codes = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      var best = Double.PositiveInfinity
      var bestK = 0
      var ki = 0
      while (ki < k) {
        var acc = 0.0
        var d = 0
        while (d < subDim) {
          val i = mi * subDim + d
          val xv = if (fl) x.getFloat(i).toDouble else x.getDouble(i)
          val diff = xv - flat((mi * k + ki) * subDim + d)
          acc += diff * diff
          d += 1
        }
        if (acc < best) { best = acc; bestK = ki }
        ki += 1
      }
      codes(mi) = bestK
      mi += 1
    }
    codes
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(encode(a.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, _) => {
      val (flat, m, k, subDim) = model
      val flatRef = ctx.addReferenceObj("pqFlat", flat, "double[]")
      val codes = ctx.freshName("codes")
      val mi = ctx.freshName("mi")
      val ki = ctx.freshName("ki")
      val d = ctx.freshName("d")
      val best = ctx.freshName("best")
      val bestK = ctx.freshName("bestK")
      val acc = ctx.freshName("acc")
      val diff = ctx.freshName("diff")
      val rd =
        if (vecIsFloat) s"(double) $x.getFloat($mi * $subDim + $d)"
        else s"$x.getDouble($mi * $subDim + $d)"
      s"""
         |if ($x.numElements() < ${m * subDim}) {
         |  throw new IllegalArgumentException("pq_encode: vector has " +
         |    $x.numElements() + " elements, codebooks need ${m * subDim}");
         |}
         |int[] $codes = new int[$m];
         |for (int $mi = 0; $mi < $m; $mi++) {
         |  double $best = Double.POSITIVE_INFINITY; int $bestK = 0;
         |  for (int $ki = 0; $ki < $k; $ki++) {
         |    double $acc = 0.0;
         |    for (int $d = 0; $d < $subDim; $d++) {
         |      double $diff = $rd - $flatRef[($mi * $k + $ki) * $subDim + $d];
         |      $acc += $diff * $diff;
         |    }
         |    if ($acc < $best) { $best = $acc; $bestK = $ki; }
         |  }
         |  $codes[$mi] = $bestK;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($codes);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** SQ8 scalar-quantization encoder: all D int codes of one vector in a
  * single fused loop.
  *
  * `vec` is the embedding (`array<float|double>`); `ranges` holds the
  * per-dim bounds as ONE `array<double>` of length 2D (mins then
  * maxes — the broadcast agg row, NOT driver state); `levels` is the
  * foldable code count (255). Output `array<int>`:
  * `q[d] = floor((x[d] − mn[d]) · L / (mx[d] − mn[d]) + 0.5)`, 0 when
  * the dim is constant — the IDENTICAL association and floor/cast
  * chain as the compositional `when/floor` column form (and the DuckDB
  * oracle), so swapping the kernel in changes no hash. Why an
  * Expression: the column form projects D separate `when(floor(...))`
  * columns — a codegen method per column and a 64-wide row; this emits
  * one int[] per row in one loop. */
case class SqEncode(vec: Expression, ranges: Expression, levels: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def first: Expression = vec
  override def second: Expression = ranges
  override def third: Expression = levels
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  private def vecIsFloat: Boolean = vec.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(v: Any, r: Any, l: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val rg = r.asInstanceOf[ArrayData]
    val lv = l.asInstanceOf[Int].toDouble
    val n = x.numElements()
    require(rg.numElements() == 2 * n,
      s"sq_encode: ranges has ${rg.numElements()} elements, vector needs ${2 * n}")
    val codes = new Array[Int](n)
    var d = 0
    while (d < n) {
      val xv = if (vecIsFloat) x.getFloat(d).toDouble else x.getDouble(d)
      val mn = rg.getDouble(d)
      val mx = rg.getDouble(n + d)
      codes(d) = if (mx == mn) 0 else math.floor((xv - mn) * lv / (mx - mn) + 0.5).toInt
      d += 1
    }
    ArrayData.toArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, rg, lv) => {
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val codes = ctx.freshName("codes")
      val mn = ctx.freshName("mn")
      val mx = ctx.freshName("mx")
      val xv = ctx.freshName("xv")
      val rd = if (vecIsFloat) s"(double) $x.getFloat($d)" else s"$x.getDouble($d)"
      s"""
         |int $n = $x.numElements();
         |if ($rg.numElements() != 2 * $n) {
         |  throw new IllegalArgumentException("sq_encode: ranges has " +
         |    $rg.numElements() + " elements, vector needs " + (2 * $n));
         |}
         |int[] $codes = new int[$n];
         |for (int $d = 0; $d < $n; $d++) {
         |  double $xv = $rd;
         |  double $mn = $rg.getDouble($d);
         |  double $mx = $rg.getDouble($n + $d);
         |  $codes[$d] = ($mx == $mn) ? 0
         |    : (int) Math.floor(($xv - $mn) * (double) $lv / ($mx - $mn) + 0.5);
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($codes);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(vec = f, ranges = s, levels = t)
}

/** SQ8 dequantized dot product: `Σ_d (mn[d] + q[d]·((mx[d]−mn[d])/L)) ·
  * p[d]` in one fused loop — the scoring half of [[SqEncode]], the
  * identical left-fold IEEE chain as the 64-term column fold it
  * replaces (scale = (mx−mn)/L FIRST, then mn + q·scale, then ·p, then
  * fold in d order), so the generated plan shrinks from a ~4·D-node
  * expression tree per pair to one loop with zero allocation. */
case class SqScore(codes: Expression, probe: Expression, ranges: Expression, levels: Expression)
    extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {

  override def first: Expression = codes
  override def second: Expression = probe
  override def third: Expression = ranges
  override def fourth: Expression = levels
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def probeIsFloat: Boolean = probe.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(c: Any, p: Any, r: Any, l: Any): Any = {
    val q = c.asInstanceOf[ArrayData]
    val pe = p.asInstanceOf[ArrayData]
    val rg = r.asInstanceOf[ArrayData]
    val lv = l.asInstanceOf[Int].toDouble
    val n = q.numElements()
    require(pe.numElements() == n && rg.numElements() == 2 * n,
      s"sq_score: codes=$n probe=${pe.numElements()} ranges=${rg.numElements()}")
    var acc = 0.0
    var d = 0
    while (d < n) {
      val mn = rg.getDouble(d)
      val mx = rg.getDouble(n + d)
      val pv = if (probeIsFloat) pe.getFloat(d).toDouble else pe.getDouble(d)
      acc += (mn + q.getInt(d) * ((mx - mn) / lv)) * pv
      d += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, p, rg, lv) => {
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      val mn = ctx.freshName("mn")
      val mx = ctx.freshName("mx")
      val pv = if (probeIsFloat) s"(double) $p.getFloat($d)" else s"$p.getDouble($d)"
      s"""
         |int $n = $q.numElements();
         |if ($p.numElements() != $n || $rg.numElements() != 2 * $n) {
         |  throw new IllegalArgumentException("sq_score: codes=" + $n +
         |    " probe=" + $p.numElements() + " ranges=" + $rg.numElements());
         |}
         |double $acc = 0.0;
         |for (int $d = 0; $d < $n; $d++) {
         |  double $mn = $rg.getDouble($d);
         |  double $mx = $rg.getDouble($n + $d);
         |  $acc += ($mn + $q.getInt($d) * (($mx - $mn) / (double) $lv)) * $pv;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, fo: Expression): Expression =
    copy(codes = f, probe = s, ranges = t, levels = fo)
}

object VectorFunctions {
  /** Register the native expressions (`cosine_sim`, `vec_dot`,
    * `pq_encode`, `sq_encode`, `sq_score`) with the session so
    * `expr(...)`/`call_function` and SQL all resolve to the codegen'd
    * forms. Idempotent. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "vec_dot", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "pq_encode", exprs => PqEncode(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "sq_encode", exprs => SqEncode(exprs(0), exprs(1), exprs(2)), "built-in")
    reg.createOrReplaceTempFunction(
      "sq_score", exprs => SqScore(exprs(0), exprs(1), exprs(2), exprs(3)), "built-in")
    reg.createOrReplaceTempFunction(
      "winnow_fps", exprs => WinnowFpsExpr(exprs(0),
        exprs(1).eval().asInstanceOf[Int], exprs(2).eval().asInstanceOf[Int]),
      "built-in")
  }
}
