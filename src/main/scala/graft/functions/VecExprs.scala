package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for embedding math — the builder brief's
  * preferred extension tier (custom `Expression` WITH `doGenCode`, above
  * any UDF): the generated code is a primitive float loop inlined into
  * whole-stage codegen, so vector scoring stays inside the same generated
  * function as the surrounding join/filter — no HOF interpreter, no row
  * codec, no boxing.
  *
  * [[FloatVecDot]] replaces the `aggregate(zip_with(...))` higher-order
  * fold (measured ~45 µs/pair in round 2 — the reason the broadcast arms
  * carry hand-written JVM kernels) with the SAME left-to-right IEEE-754
  * accumulation: each element pair is widened to double, multiplied, and
  * added in index order, so results are bit-identical to both the HOF
  * form and the JVM kernels (asserted in VecExprsSpec / SimilaritySpec).
  * Contract: null-free `array<float>` inputs of equal length (embedding
  * columns); a null ARRAY yields null (BinaryExpression null-safety), and
  * a LENGTH MISMATCH yields null too — matching the HOF twin, where
  * `zip_with` pads the shorter array with nulls and the `aggregate` fold
  * then returns null — rather than a plausible-looking truncated dot. */
case class FloatVecDot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def isFloatArray(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (isFloatArray(left.dataType) && isFloatArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"float_vec_dot needs two array<float> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "float_vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** [[FloatVecDot]]'s integer sibling for quantized-code arrays
  * (`array<long>`, e.g. [[graft.ops.Quantize]] SQ8 codes): Σ a_i·b_i as a
  * primitive long loop in whole-stage codegen. Integer arithmetic — the
  * result is exactly the HOF fold's by definition (no rounding anywhere);
  * caller guarantees products/sums fit a Long (SQ8: |code| ≤ 127). A
  * length mismatch yields null, like [[FloatVecDot]]. */
case class LongVecDot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def isLongArray(dt: DataType): Boolean = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (isLongArray(left.dataType) && isLongArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"long_vec_dot needs two array<bigint> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "long_vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $a.getLong($i) * $b.getLong($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** SQ8 scalar quantization of an `array<float>` embedding to `array<long>`
  * codes in ONE pass per row: scale = max(max|v_i|, 1e-30)/127, then
  * code_i = floor(v_i/scale + 0.5) — the exact IEEE-754 op sequence of the
  * column-HOF reference twin ([[graft.ops.Quantize.sq8CodesRef]], which
  * the DuckDB oracle replays), but with the scale computed ONCE instead of
  * re-evaluating the array_max scan inside the per-element lambda (O(d)
  * vs O(d²) per vector — invisible at the gated 16 dims, dominant at
  * 768+). Bit-parity with the twin asserted in QuantizeSpec. Input
  * contract: elements FINITE (no NaN) — the native max scan skips NaN
  * (`>` is false) while the twin's `array_max` orders NaN greatest, so
  * NaN-bearing vectors diverge between the two spellings (and the twin's
  * long cast of NaN errors under ANSI). Holds for [[FloatVecSq8Recon]]
  * and [[FloatVecSq8Bytes]] too (same scale scan). */
case class FloatVecSq8(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"float_vec_sq8 needs an array<float> argument, got ${dt.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "float_vec_sq8"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var mx = Double.NegativeInfinity
    var i = 0
    while (i < n) {
      val ab = math.abs(x.getFloat(i).toDouble)
      if (ab > mx) mx = ab
      i += 1
    }
    val s = math.max(mx, 1e-30) / 127.0
    val out = new Array[Long](n)
    i = 0
    while (i < n) {
      out(i) = math.floor(x.getFloat(i).toDouble / s + 0.5).toLong
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val mx = ctx.freshName("mx")
      val s = ctx.freshName("s")
      val arr = ctx.freshName("arr")
      val ab = ctx.freshName("ab")
      s"""
         |int $n = $a.numElements();
         |double $mx = Double.NEGATIVE_INFINITY;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $ab = java.lang.Math.abs((double) $a.getFloat($i));
         |  if ($ab > $mx) $mx = $ab;
         |}
         |double $s = java.lang.Math.max($mx, 1e-30) / 127.0;
         |long[] $arr = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $arr[$i] = (long) java.lang.Math.floor((double) $a.getFloat($i) / $s + 0.5);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** SQ8 de-quantization v̂_i = code_i · scale as one pass per row (scale
  * recomputed from the ORIGINAL float vector exactly as [[FloatVecSq8]]
  * does, codes implied) — the distortion-bound twin of the quantizer with
  * the same single-scan scale fix. Output `array<double>`. */
case class FloatVecSq8Recon(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"float_vec_sq8_recon needs an array<float> argument, got ${dt.simpleString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = "float_vec_sq8_recon"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var mx = Double.NegativeInfinity
    var i = 0
    while (i < n) {
      val ab = math.abs(x.getFloat(i).toDouble)
      if (ab > mx) mx = ab
      i += 1
    }
    val s = math.max(mx, 1e-30) / 127.0
    val out = new Array[Double](n)
    i = 0
    while (i < n) {
      out(i) = math.floor(x.getFloat(i).toDouble / s + 0.5) * s
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val mx = ctx.freshName("mx")
      val s = ctx.freshName("s")
      val arr = ctx.freshName("arr")
      val ab = ctx.freshName("ab")
      s"""
         |int $n = $a.numElements();
         |double $mx = Double.NEGATIVE_INFINITY;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $ab = java.lang.Math.abs((double) $a.getFloat($i));
         |  if ($ab > $mx) $mx = $ab;
         |}
         |double $s = java.lang.Math.max($mx, 1e-30) / 127.0;
         |double[] $arr = new double[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $arr[$i] = java.lang.Math.floor((double) $a.getFloat($i) / $s + 0.5) * $s;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** [[FloatVecSq8]]'s AT-REST sibling: the SQ8 codes packed as BINARY —
  * one signed byte per dimension (codes are in [-127, 127] by
  * construction), so a parquet embedding table stores exactly d bytes
  * per vector instead of 4d float bytes. Same scale/floor op sequence as
  * [[FloatVecSq8]] (byte-parity asserted in QuantizeSpec). */
case class FloatVecSq8Bytes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"float_vec_sq8_bytes needs an array<float> argument, got ${dt.simpleString}")
  }

  override def dataType: DataType = BinaryType

  override def prettyName: String = "float_vec_sq8_bytes"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var mx = Double.NegativeInfinity
    var i = 0
    while (i < n) {
      val ab = math.abs(x.getFloat(i).toDouble)
      if (ab > mx) mx = ab
      i += 1
    }
    val s = math.max(mx, 1e-30) / 127.0
    val out = new Array[Byte](n)
    i = 0
    while (i < n) {
      out(i) = math.floor(x.getFloat(i).toDouble / s + 0.5).toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val mx = ctx.freshName("mx")
      val s = ctx.freshName("s")
      val arr = ctx.freshName("arr")
      val ab = ctx.freshName("ab")
      s"""
         |int $n = $a.numElements();
         |double $mx = Double.NEGATIVE_INFINITY;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $ab = java.lang.Math.abs((double) $a.getFloat($i));
         |  if ($ab > $mx) $mx = $ab;
         |}
         |double $s = java.lang.Math.max($mx, 1e-30) / 127.0;
         |byte[] $arr = new byte[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $arr[$i] = (byte) java.lang.Math.floor((double) $a.getFloat($i) / $s + 0.5);
         |}
         |${ev.value} = $arr;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Unpack BINARY SQ8 codes back to `array<long>` (signed bytes widened) —
  * the read-side bridge from the at-rest layout to the `array<long>`
  * scoring tier ([[LongVecDot]]). */
case class Sq8BytesToLongs(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"sq8_bytes_to_longs needs a binary argument, got ${dt.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "sq8_bytes_to_longs"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val out = new Array[Long](x.length)
    var i = 0
    while (i < x.length) { out(i) = x(i).toLong; i += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val arr = ctx.freshName("arr")
      s"""
         |long[] $arr = new long[$a.length];
         |for (int $i = 0; $i < $a.length; $i++) {
         |  $arr[$i] = (long) $a[$i];
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Integer dot product DIRECTLY over two BINARY SQ8 code columns (signed
  * bytes, widened to long) — quantized scoring straight off the at-rest
  * layout, no array materialization per row. Null on length mismatch,
  * like the other dot expressions. */
case class BytesVecDot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bytes_vec_dot needs two binary arguments, got ${l.simpleString} and ${r.simpleString}")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "bytes_vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    if (x.length != y.length) return null
    var acc = 0L
    var i = 0
    while (i < x.length) { acc += x(i).toLong * y(i).toLong; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.length != $b.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $a.length; $i++) {
         |    $acc += (long) $a[$i] * (long) $b[$i];
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** PQ symmetric-distance (SDC) scoring directly over two BINARY code
  * columns: dist = Σ_s tbl[s][a_s][b_s], the per-subspace codebook-pair
  * L2 table flattened to one double array (`flat((s·ksub + a_s)·ksub +
  * b_s)`) and looped in subspace order — the identical left-to-right
  * fold the HOF spelling and the JVM twin compute, inlined into
  * whole-stage codegen (the HOF pays an interpreted lambda + three
  * nested `element_at`s per subspace per PAIR on the hottest path of a
  * PQ self-join). The table rides along as a codegen reference object —
  * m·ksub² doubles, broadcast-trivial (2 K at the gate geometry). NULL
  * on length mismatch (ragged-input contract of every dot in this
  * file). */
case class BytesSdcDist(left: Expression, right: Expression,
                        flat: Array[Double], ksub: Int)
  extends BinaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bytes_sdc_dist needs two binary arguments, got ${l.simpleString} and ${r.simpleString}")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "bytes_sdc_dist"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    if (x.length != y.length || x.length * ksub * ksub != flat.length) return null
    var acc = 0.0
    var s = 0
    while (s < x.length) {
      // range-check the CODE VALUES too (ADVICE r05): a corrupt or
      // codebook-mismatched at-rest byte must yield null like every other
      // ragged input in this file, not an ArrayIndexOutOfBounds task crash
      if (x(s) < 0 || x(s) >= ksub || y(s) < 0 || y(s) >= ksub) return null
      acc += flat((s * ksub + x(s)) * ksub + y(s))
      s += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tblRef = ctx.addReferenceObj("sdcTbl", flat, "double[]")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val s = ctx.freshName("s")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      s"""
         |if ($a.length != $b.length || $a.length * $ksub * $ksub != $tblRef.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  boolean $bad = false;
         |  for (int $s = 0; $s < $a.length; $s++) {
         |    if ($a[$s] < 0 || $a[$s] >= $ksub || $b[$s] < 0 || $b[$s] >= $ksub) {
         |      $bad = true; break;
         |    }
         |    $acc += $tblRef[($s * $ksub + $a[$s]) * $ksub + $b[$s]];
         |  }
         |  if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** All `bands` SRP-LSH band keys of an `array<float>` embedding in ONE
  * expression evaluation: key b packs `rowsPerBand` sign bits of the
  * deterministic hyperplane projections for planes
  * [b·rowsPerBand, (b+1)·rowsPerBand). Identical IEEE-754 op sequence to
  * [[graft.ops.Similarity.bandKeyKernel]] and the column-HOF
  * [[graft.ops.Similarity.bandKeyCol]] (plane component
  * ((p·2654435761 + i·40503) mod 1000)/1000 − 0.5, left-to-right double
  * fold) — bit-parity asserted in SimilaritySpec — but inlined into
  * whole-stage codegen: signature generation stays in the same generated
  * function as the projection, no HOF interpreter per (vector, plane) and
  * no mapPartitions row codec. Output `array<long>` of length `bands`. */
case class FloatVecSrpKeys(child: Expression, bands: Int, rowsPerBand: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"float_vec_srp_keys needs an array<float> argument, got ${dt.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "float_vec_srp_keys"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var key = 0L
      var j = 0
      while (j < rowsPerBand) {
        val p = (b * rowsPerBand + j).toLong
        var proj = 0.0
        var i = 0
        while (i < n) {
          val pc = ((p * 2654435761L + i * 40503L) % 1000L).toDouble / 1000.0 - 0.5
          proj += x.getFloat(i).toDouble * pc
          i += 1
        }
        if (proj > 0) key |= (1L << j)
        j += 1
      }
      out(b) = key
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val arr = ctx.freshName("arr")
      val b = ctx.freshName("b")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val pc = ctx.freshName("pc")
      val proj = ctx.freshName("proj")
      val key = ctx.freshName("key")
      s"""
         |int $n = $a.numElements();
         |long[] $arr = new long[$bands];
         |for (int $b = 0; $b < $bands; $b++) {
         |  long $key = 0L;
         |  for (int $j = 0; $j < $rowsPerBand; $j++) {
         |    long $p = (long) ($b * $rowsPerBand + $j);
         |    double $proj = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      double $pc = (double) (($p * 2654435761L + $i * 40503L) % 1000L) / 1000.0 - 0.5;
         |      $proj += (double) $a.getFloat($i) * $pc;
         |    }
         |    if ($proj > 0) $key |= (1L << $j);
         |  }
         |  $arr[$b] = $key;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VecExprs {
  /** dot(a, b) over `array<float>` columns as a codegen'd native
    * expression — bit-identical to the HOF fold and the JVM kernels. */
  def dotF(a: Column, b: Column): Column =
    Bridge.column(FloatVecDot(Bridge.expression(a), Bridge.expression(b)))

  /** L2 norm via [[dotF]] (sqrt of the same fold — bit order preserved). */
  def normF(a: Column): Column =
    org.apache.spark.sql.functions.sqrt(dotF(a, a))

  /** integer dot over `array<long>` code columns ([[LongVecDot]]) */
  def dotL(a: Column, b: Column): Column =
    Bridge.column(LongVecDot(Bridge.expression(a), Bridge.expression(b)))

  /** SQ8 codes of an `array<float>` column ([[FloatVecSq8]]): one scale
    * scan per row, bit-identical to the column-HOF twin. */
  def sq8(a: Column): Column =
    Bridge.column(FloatVecSq8(Bridge.expression(a)))

  /** SQ8 reconstruction of an `array<float>` column ([[FloatVecSq8Recon]]). */
  def sq8Recon(a: Column): Column =
    Bridge.column(FloatVecSq8Recon(Bridge.expression(a)))

  /** All SRP-LSH band keys of an `array<float>` column in one codegen'd
    * pass ([[FloatVecSrpKeys]]) — bit-identical to the kernel/HOF twins. */
  def srpKeys(a: Column, bands: Int, rowsPerBand: Int): Column =
    Bridge.column(FloatVecSrpKeys(Bridge.expression(a), bands, rowsPerBand))

  /** SQ8 codes packed as binary — one byte per dim ([[FloatVecSq8Bytes]]). */
  def sq8Bytes(a: Column): Column =
    Bridge.column(FloatVecSq8Bytes(Bridge.expression(a)))

  /** binary SQ8 codes → `array<long>` ([[Sq8BytesToLongs]]). */
  def sq8BytesToLongs(a: Column): Column =
    Bridge.column(Sq8BytesToLongs(Bridge.expression(a)))

  /** integer dot directly over binary SQ8 code columns ([[BytesVecDot]]). */
  def dotB(a: Column, b: Column): Column =
    Bridge.column(BytesVecDot(Bridge.expression(a), Bridge.expression(b)))

  /** PQ symmetric distance directly over binary code columns
    * ([[BytesSdcDist]]); `tbl` is the m×ksub×ksub SDC table
    * ([[graft.ops.Quantize.pqSdcTable]]). */
  def sdcDist(a: Column, b: Column, tbl: Array[Array[Array[Double]]]): Column = {
    val ksub = tbl.head.length
    val flat = tbl.flatMap(_.flatMap(_.toSeq))
    Bridge.column(BytesSdcDist(Bridge.expression(a), Bridge.expression(b), flat, ksub))
  }
}
