package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (`Aggregator[IN, BUF, OUT]`): element-wise centroid of
  * embedding vectors. The buffer is (runningSum[dim], count) — merges are
  * associative/commutative, so Spark runs it partial+final like any built-in
  * aggregate (map-side combine, one shuffle of dim-sized buffers, never the
  * raw vectors).
  *
  * Double accumulation order varies with partitioning, so results are
  * deterministic only to fp tolerance — the oracle-hashed centroid query
  * (v05) routes through DECIMAL instead; this Aggregator is the typed-API
  * surface, spec-checked against it to 1e-9.
  */
object CentroidAgg extends Aggregator[Seq[Float], (Array[Double], Long), Seq[Double]] {

  override def zero: (Array[Double], Long) = (Array.empty[Double], 0L)

  override def reduce(b: (Array[Double], Long), v: Seq[Float]): (Array[Double], Long) = {
    val sums = if (b._1.isEmpty) new Array[Double](v.length) else b._1
    require(v.length == sums.length,
      s"centroid over ragged embeddings: got dim ${v.length}, expected ${sums.length}")
    var i = 0
    while (i < sums.length) { sums(i) += v(i); i += 1 }
    (sums, b._2 + 1)
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
    if (a._1.isEmpty) b
    else if (b._1.isEmpty) a
    else {
      require(a._1.length == b._1.length,
        s"centroid merge of mismatched dims: ${a._1.length} vs ${b._1.length}")
      var i = 0
      while (i < a._1.length) { a._1(i) += b._1(i); i += 1 }
      (a._1, a._2 + b._2)
    }
  }

  override def finish(r: (Array[Double], Long)): Seq[Double] =
    if (r._2 == 0) Seq.empty else r._1.map(_ / r._2).toSeq

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Long)]()
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
