package graft.ops

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Partial/final SimHash vote aggregator (see [[Dedup.simhash]]): buffer =
  * int[60] signed vote counts, reduce folds one token's 60 bit votes in a
  * tight primitive loop, merge is elementwise sum — commutative and
  * associative, so Spark's partial (map-side) + final split never changes
  * the result. Finish packs bits with positive vote sums (ties → 0) into
  * one Long, matching the per-bit column formula bit-for-bit.
  */
object SimhashAgg extends Aggregator[Long, Array[Int], Long] {

  val Bits = 60

  override def zero: Array[Int] = new Array[Int](Bits)

  override def reduce(b: Array[Int], vid: Long): Array[Int] = {
    var k = 0
    while (k < Bits) {
      val bit = ((vid * 2654435761L + k * 40503L) >> 13) & 1L
      b(k) += (2L * bit - 1L).toInt
      k += 1
    }
    b
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var k = 0
    while (k < Bits) { a(k) += b(k); k += 1 }
    a
  }

  override def finish(b: Array[Int]): Long = {
    var h = 0L
    var k = 0
    while (k < Bits) { if (b(k) > 0) h |= (1L << k); k += 1 }
    h
  }

  override def bufferEncoder: Encoder[Array[Int]] = ExpressionEncoder[Array[Int]]()
  override def outputEncoder: Encoder[Long] = ExpressionEncoder[Long]()

  /** Untyped column form for DataFrame `.agg`. */
  private lazy val asUdaf = udaf(this, ExpressionEncoder[Long]())
  def udafCol(vid: Column): Column = asUdaf(vid)
}
