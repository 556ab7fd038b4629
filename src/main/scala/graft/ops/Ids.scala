package graft.ops

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dense global id assignment without a single-partition window
  * (SURVEY.md §4.5, A11). The reference uses in-memory sequence positions
  * (coordinates.py:246, batch re-index batch_geojson2coco.py:399-450);
  * `row_number() over (order by …)` reproduces that but collapses to one
  * partition. This operator keeps the same output with a scalable plan:
  *
  * 1. range-repartition + in-partition sort by the order columns,
  * 2. one cheap count-per-partition job,
  * 3. per-partition prefix-sum offsets broadcast, ids = offset + local rank.
  *
  * Exactness requires the order key to be a total order (unique); ties
  * would make the id assignment partition-dependent — same caveat as
  * `row_number` with a non-unique key.
  */
object Ids {

  def denseId(df: DataFrame, idName: String, orderCols: Seq[String],
              numPartitions: Int = 0): DataFrame = {
    val parts = if (numPartitions > 0) numPartitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val cols = orderCols.map(col)
    // RangePartitioner samples with a per-RDD seed, so an unpersisted plan
    // can land rows on different partitions in the count pass vs the emit
    // pass — persist pins one materialization for both.
    val sorted = df.repartitionByRange(parts, cols: _*).sortWithinPartitions(cols: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // pass 1: rows per partition (cheap: count(1) per partition)
    val counts = sorted.mapPartitions { it =>
      Iterator((TaskContext.getPartitionId(), it.size.toLong))
    }(ExpressionEncoder[(Int, Long)]()).collect().toMap

    val nParts = (counts.keySet + (-1)).max + 1
    val offsets = new Array[Long](math.max(nParts, 0) + 1)
    for (p <- 0 until nParts) offsets(p + 1) = offsets(p) + counts.getOrElse(p, 0L)
    val bc = df.sparkSession.sparkContext.broadcast(offsets)

    // pass 2: emit offset + local ordinal
    val outSchema = sorted.schema.add(idName, LongType, nullable = false)
    implicit val enc = org.apache.spark.sql.Encoders.row(outSchema)
    sorted.mapPartitions { it =>
      var i = bc.value(TaskContext.getPartitionId())
      it.map { r => val out = Row.fromSeq(r.toSeq :+ i); i += 1; out }
    }
  }
}
