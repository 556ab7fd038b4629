package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native expression tier for the ANN index-build kernels (round-6
  * optimization; guide §1.2 step 2 / §4.1): the IVF list assignment, PQ
  * encode and PQ LUT projections previously ran as `mapPartitions` row
  * kernels — every corpus row paid the full row codec
  * (DeserializeToObject → Scala kernel → SerializeFromObject, visible as
  * three extra operators per side in the round-5 q63/q70/q71 plans) and
  * the stage fell out of whole-stage codegen. Each expression here wraps
  * the UNCHANGED JVM kernel (`Similarity.nearestIn`,
  * `Quantize.pqEncodeKernel/pqLutKernel`) behind a Catalyst expression
  * whose generated code calls the kernel directly on the columnar input —
  * identical arithmetic (same object code in both eval modes, trivially
  * bit-identical to the round-5 path), no row codec, and the projection
  * fuses into the surrounding scan/join stage.
  *
  * The centroid/codebook tables ride along as codegen reference objects
  * (same pattern as [[BytesSdcDist]]'s SDC table): nLists·dim floats —
  * broadcast-trivial at any realistic geometry (16×64 at the gate; think
  * 4096×768 ≈ 12 MB at production scale, shipped once per executor with
  * the task binary, not per row). */

/** kernel wrapper: m nearest IVF list ids of an embedding, by exact
  * cosine (desc, list asc) — delegates to [[graft.ops.Similarity.nearestIn]] */
final class NearestListsKernel(
    cents: Array[(Int, Array[Float], Double)], m: Int) extends Serializable {
  def apply(v: ArrayData): ArrayData =
    new GenericArrayData(graft.ops.Similarity.nearestIn(cents, v.toFloatArray(), m))
}

/** kernel wrapper: PQ codes (one int per subspace) — delegates to
  * [[graft.ops.Quantize.pqEncodeKernel]] */
final class PqEncodeKernelWrap(
    cb: Array[Array[Array[Float]]]) extends Serializable {
  def apply(v: ArrayData): ArrayData =
    new GenericArrayData(graft.ops.Quantize.pqEncodeKernel(v.toFloatArray(), cb))
}

/** kernel wrapper: PQ codes packed as signed bytes (the at-rest layout) */
final class PqEncodeBytesKernelWrap(
    cb: Array[Array[Array[Float]]]) extends Serializable {
  def apply(v: ArrayData): Array[Byte] = {
    val codes = graft.ops.Quantize.pqEncodeKernel(v.toFloatArray(), cb)
    val out = new Array[Byte](codes.length)
    var i = 0
    while (i < codes.length) { out(i) = codes(i).toByte; i += 1 }
    out
  }
}

/** kernel wrapper: per-query ADC lookup table (m × ksub subspace L2s) —
  * delegates to [[graft.ops.Quantize.pqLutKernel]] */
final class PqLutKernelWrap(
    cb: Array[Array[Array[Float]]]) extends Serializable {
  def apply(v: ArrayData): ArrayData =
    new GenericArrayData(graft.ops.Quantize.pqLutKernel(v.toFloatArray(), cb)
      .map(row => new GenericArrayData(row): AnyRef))
}

/** shared shape for the kernel-backed unary expressions over
  * `array<float>` embeddings */
private[functions] trait FloatVecKernelExpr extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs an array<float> argument, got ${dt.simpleString}")
  }
}

/** `array<int>` of the `m` nearest IVF list ids (exact cosine desc, list
  * asc — [[graft.ops.Similarity.nearestIn]] verbatim). */
case class FloatVecNearestLists(child: Expression,
                                cents: Array[(Int, Array[Float], Double)],
                                m: Int)
  extends FloatVecKernelExpr {
  @transient private lazy val kernel = new NearestListsKernel(cents, m)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "float_vec_nearest_lists"

  override protected def nullSafeEval(a: Any): Any =
    kernel.apply(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kern = ctx.addReferenceObj("nearestKern", new NearestListsKernel(cents, m),
      classOf[NearestListsKernel].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $kern.apply($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** PQ encode: `array<int>` of m per-subspace argmin-L2 codes
  * ([[graft.ops.Quantize.pqEncodeKernel]] verbatim). */
case class FloatVecPqEncode(child: Expression, cb: Array[Array[Array[Float]]])
  extends FloatVecKernelExpr {
  @transient private lazy val kernel = new PqEncodeKernelWrap(cb)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "float_vec_pq_encode"

  override protected def nullSafeEval(a: Any): Any =
    kernel.apply(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kern = ctx.addReferenceObj("pqEncKern", new PqEncodeKernelWrap(cb),
      classOf[PqEncodeKernelWrap].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $kern.apply($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** PQ encode to the BINARY at-rest layout: one signed byte per subspace
  * (same kernel as [[FloatVecPqEncode]], packed — requires ksub ≤ 128). */
case class FloatVecPqEncodeBytes(child: Expression, cb: Array[Array[Array[Float]]])
  extends FloatVecKernelExpr {
  @transient private lazy val kernel = new PqEncodeBytesKernelWrap(cb)

  override def dataType: DataType = BinaryType
  override def prettyName: String = "float_vec_pq_encode_bytes"

  override protected def nullSafeEval(a: Any): Any =
    kernel.apply(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kern = ctx.addReferenceObj("pqEncBKern", new PqEncodeBytesKernelWrap(cb),
      classOf[PqEncodeBytesKernelWrap].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $kern.apply($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-query ADC LUT: `array<array<double>>` of m × ksub exact subspace
  * L2 distances ([[graft.ops.Quantize.pqLutKernel]] verbatim). */
case class FloatVecPqLut(child: Expression, cb: Array[Array[Array[Float]]])
  extends FloatVecKernelExpr {
  @transient private lazy val kernel = new PqLutKernelWrap(cb)

  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def prettyName: String = "float_vec_pq_lut"

  override protected def nullSafeEval(a: Any): Any =
    kernel.apply(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kern = ctx.addReferenceObj("pqLutKern", new PqLutKernelWrap(cb),
      classOf[PqLutKernelWrap].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $kern.apply($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ADC distance: Σ_s lut[s][codes_s] — the per-pair scoring loop of
  * [[graft.ops.Quantize.annPq]]/[[graft.ops.Quantize.annIvfPq]], as a
  * primitive loop inlined into whole-stage codegen. Replaces the
  * `aggregate(zip_with(codes, lut, (c,l) -> element_at(l, c+1)))`
  * higher-order spelling (a CodegenFallback interpreted per PAIR on the
  * hottest path of the PQ join): identical left-to-right double fold from
  * 0.0 in subspace order, so distances are bit-identical. NULL on a
  * length mismatch or an out-of-range code (the ragged-input contract of
  * every native expression in this tier). */
case class IntVecAdcDist(left: Expression, right: Expression)
  extends BinaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"int_vec_adc_dist needs (array<int>, array<array<double>>), got " +
          s"${l.simpleString} and ${r.simpleString}")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "int_vec_adc_dist"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val lut = b.asInstanceOf[ArrayData]
    val n = codes.numElements()
    if (n != lut.numElements()) return null
    var acc = 0.0
    var s = 0
    while (s < n) {
      val c = codes.getInt(s)
      val row = lut.getArray(s)
      if (c < 0 || c >= row.numElements()) return null
      acc += row.getDouble(c)
      s += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val row = ctx.freshName("row")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  boolean $bad = false;
         |  for (int $s = 0; $s < $n; $s++) {
         |    int $c = $a.getInt($s);
         |    org.apache.spark.sql.catalyst.util.ArrayData $row = $b.getArray($s);
         |    if ($c < 0 || $c >= $row.numElements()) { $bad = true; break; }
         |    $acc += $row.getDouble($c);
         |  }
         |  if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object AnnExprs {
  /** `m` nearest IVF list ids of an `array<float>` column. */
  def nearestLists(v: Column, cents: Array[(Int, Array[Float], Double)],
                   m: Int): Column =
    Bridge.column(FloatVecNearestLists(Bridge.expression(v), cents, m))

  /** single nearest IVF list id (the corpus-assignment projection) */
  def nearestList(v: Column, cents: Array[(Int, Array[Float], Double)]): Column =
    org.apache.spark.sql.functions.element_at(nearestLists(v, cents, 1), 1)

  /** PQ codes (`array<int>`) of an `array<float>` column. */
  def pqEncode(v: Column, cb: Array[Array[Array[Float]]]): Column =
    Bridge.column(FloatVecPqEncode(Bridge.expression(v), cb))

  /** PQ codes packed as BINARY (at-rest layout, ksub ≤ 128). */
  def pqEncodeBytes(v: Column, cb: Array[Array[Array[Float]]]): Column =
    Bridge.column(FloatVecPqEncodeBytes(Bridge.expression(v), cb))

  /** per-query ADC LUT (`array<array<double>>`). */
  def pqLut(v: Column, cb: Array[Array[Array[Float]]]): Column =
    Bridge.column(FloatVecPqLut(Bridge.expression(v), cb))

  /** ADC distance Σ_s lut[s][codes_s] over (codes, lut) columns. */
  def adcDist(codes: Column, lut: Column): Column =
    Bridge.column(IntVecAdcDist(Bridge.expression(codes), Bridge.expression(lut)))
}
