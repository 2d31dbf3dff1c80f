package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed gap-rule interval-merge aggregator — the custom-aggregate
  * promotion planned in SURVEY.md §4: pygr's `groupByIntervals` with
  * `matchIntervals` retention (`cnestedlist.pyx:722-845`) as an
  * `Aggregator[(start,end), buffer, merged]` usable with
  * `groupByKey(...).agg(SessionMergeAggregator(maxGap).toColumn)`.
  *
  * The buffer keeps intervals sorted and gap-merged at every insert,
  * so `reduce` and `merge` are both O(buffer) and the aggregation is
  * associative/commutative — safe under partial aggregation. Output
  * is the list of merged sessions with their member counts (the
  * `matchIntervals` cardinality).
  */
case class MergedIval(start: Long, end: Long, n: Long)

class SessionMergeAggregator(maxGap: Long)
    extends Aggregator[(Long, Long), List[MergedIval], Seq[MergedIval]] {

  override def zero: List[MergedIval] = Nil

  private def insert(buf: List[MergedIval], iv: MergedIval): List[MergedIval] = {
    // keep sorted by start; merge neighbours within maxGap
    val (before, rest) = buf.span(_.start < iv.start)
    merged(before ::: iv :: rest)
  }

  private def merged(sorted: List[MergedIval]): List[MergedIval] =
    sorted.foldRight(List.empty[MergedIval]) {
      case (cur, next :: tail) if next.start <= cur.end + maxGap =>
        MergedIval(cur.start, math.max(cur.end, next.end), cur.n + next.n) :: tail
      case (cur, acc) => cur :: acc
    }

  override def reduce(buf: List[MergedIval], in: (Long, Long)): List[MergedIval] =
    insert(buf, MergedIval(in._1, in._2, 1L))

  override def merge(a: List[MergedIval], b: List[MergedIval]): List[MergedIval] =
    b.foldLeft(a)(insert)

  override def finish(buf: List[MergedIval]): Seq[MergedIval] = buf

  override def bufferEncoder: Encoder[List[MergedIval]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[MergedIval]]()
  override def outputEncoder: Encoder[Seq[MergedIval]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[MergedIval]]()
}
