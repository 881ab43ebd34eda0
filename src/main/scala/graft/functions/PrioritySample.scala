package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.catalyst.expressions.XXH64

/** Deterministic bounded per-group sampling as a typed `Aggregator`
  * (the UDAF surface of SURVEY.md §2.2) — keep the k items with the
  * smallest xxhash64(seed, item) priority. Hash-priority sampling is
  * the distributed form of reservoir sampling: commutative/associative
  * merges (any partitioning, any order → same result), deterministic
  * across reruns, and uniform over distinct items. The training-data
  * use is per-domain/per-class subsampling: one shuffle, bounded state
  * per group, no second pass.
  *
  * Buffer is a bounded max-heap of (priority, item): O(k) memory per
  * group regardless of group size — the property that makes it safe
  * under a 10⁹-row monster group.
  */
object PrioritySample {

  type Buf = mutable.PriorityQueue[(Long, String)]

  /** Sample k strings per group, priority-ordered by seeded xxhash. */
  def topK(k: Int, seed: Long = 42L): Aggregator[String, Buf, Seq[String]] =
    new Aggregator[String, Buf, Seq[String]] {

      private def priority(s: String): Long = {
        val b = s.getBytes("UTF-8")
        XXH64.hashUnsafeBytes(b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
          b.length, seed)
      }

      // max-heap on priority: the ROOT is the worst (largest) kept item
      override def zero: Buf = mutable.PriorityQueue.empty(Ordering.by(_._1))

      private def offer(b: Buf, p: Long, v: String): Buf = {
        if (b.size < k) b.enqueue((p, v))
        else if (p < b.head._1) { b.dequeue(); b.enqueue((p, v)) }
        b
      }

      override def reduce(b: Buf, s: String): Buf = offer(b, priority(s), s)

      override def merge(a: Buf, b: Buf): Buf = {
        b.foreach { case (p, v) => offer(a, p, v) }
        a
      }

      override def finish(b: Buf): Seq[String] =
        b.toSeq.sortBy(_._1).map(_._2)

      override def bufferEncoder: Encoder[Buf] =
        Encoders.kryo[Buf]
      override def outputEncoder: Encoder[Seq[String]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
    }
}
