package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, Row}
import org.apache.spark.sql.expressions.Aggregator

/** Single-pass per-dimension moments as a typed [[Aggregator]] (the UDAF
  * surface of SURVEY §2.12): one (count, sum[dims], sumsq[dims]) buffer per
  * partition, merged pairwise — the `array<float>` column is consumed
  * directly, with no MLlib vector conversion and no explode.
  *
  * Reference semantics: per-dimension mean/std over the embedding matrix
  * (`gbr.py:273,511-512`, numpy `mean(axis=0)` / `std(axis=0)`).
  *
  * Scale shape: each task reduces its rows to one 2×dims+1 buffer; the
  * driver (or final reduce) merges #partitions buffers. Shuffled bytes are
  * O(partitions × dims), independent of row count — same contract as
  * `Summarizer` but usable anywhere an `Aggregator` is (typed Datasets,
  * `agg(...)` on groups, SQL via `udaf(...)`).
  *
  * Variance uses the (sum, sumsq) form, numerically fine for unit-scale
  * embedding values; sample (n-1) normalization to match DuckDB/Spark
  * `stddev`.
  */
object VectorMoments {

  final case class Buffer(var n: Long, var sum: Array[Double], var sumsq: Array[Double])

  final case class DimMoments(dim: Int, mean: Double, std: Double)

  val aggregator: Aggregator[Seq[Float], Buffer, Seq[DimMoments]] =
    new Aggregator[Seq[Float], Buffer, Seq[DimMoments]] {

      override def zero: Buffer = Buffer(0L, Array.empty, Array.empty)

      private def ensure(b: Buffer, dims: Int): Unit =
        if (b.sum.length < dims) {
          b.sum = java.util.Arrays.copyOf(b.sum, dims)
          b.sumsq = java.util.Arrays.copyOf(b.sumsq, dims)
        }

      override def reduce(b: Buffer, v: Seq[Float]): Buffer = {
        if (v != null) {
          ensure(b, v.length)
          var i = 0
          val it = v.iterator
          while (it.hasNext) {
            val x = it.next().toDouble
            b.sum(i) += x
            b.sumsq(i) += x * x
            i += 1
          }
          b.n += 1
        }
        b
      }

      override def merge(a: Buffer, c: Buffer): Buffer = {
        ensure(a, c.sum.length)
        var i = 0
        while (i < c.sum.length) {
          a.sum(i) += c.sum(i); a.sumsq(i) += c.sumsq(i); i += 1
        }
        a.n += c.n
        a
      }

      override def finish(b: Buffer): Seq[DimMoments] =
        (0 until b.sum.length).map { i =>
          val mean = if (b.n == 0) Double.NaN else b.sum(i) / b.n
          val variance =
            if (b.n < 2) Double.NaN
            else math.max(0.0, (b.sumsq(i) - b.sum(i) * b.sum(i) / b.n) / (b.n - 1))
          DimMoments(i, mean, math.sqrt(variance))
        }

      override def bufferEncoder: Encoder[Buffer] = Encoders.product[Buffer]

      override def outputEncoder: Encoder[Seq[DimMoments]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[DimMoments]]()
    }
}
