package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One query-graph edge: bind `from` → `to` by rows of `edges`
  * (a DataFrame whose FIRST two columns are source and target node
  * id). Different edges may draw from different DataFrames — the
  * analog of the reference's pluggable edge-source GQIs
  * (`graphquery.py:592-682`: container / attribute / callable /
  * subquery sources). `filter` is the per-step user predicate
  * (`graphquery.py:500-503`), applied over the bound node columns.
  */
case class MotifEdge(from: String, to: String, edges: DataFrame,
                     filter: Option[Column] = None)

/** Subgraph-isomorphism matcher (pygr `GraphQuery`,
  * `graphquery.py:425-806`; SURVEY.md J5): the reference's
  * backtracking DFS becomes a chain of equi-joins, one per query
  * edge in bind order; an edge whose endpoints are both already
  * bound becomes an existence (left-semi) filter — exactly the
  * closure-edge re-check of `graphquery.py:465-472`; injectivity
  * (`dataMatch` marking, `graphquery.py:577-587`) becomes pairwise
  * inequality filters. Catalyst then reorders/broadcasts the joins
  * and codegens the whole pipeline — the moral equivalent of the
  * reference's Pyrex query compiler (`graphquery.py:239-422`),
  * for free.
  *
  * Cyclic query graphs work (closure edges are filters, not joins),
  * matching `tests/graph_test.py:114-130`.
  */
object MotifQuery {

  /** `maxHits` caps the solution count like the reference's `maxhit`
    * batching (`graphquery.py:354-365`; SURVEY.md W5) — applied as a
    * plan-level limit so Catalyst can short-circuit the joins.
    */
  def find(motif: Seq[MotifEdge], injective: Boolean = true,
           maxHits: Option[Int] = None): DataFrame = {
    val df = findAll(motif, injective)
    maxHits.map(df.limit).getOrElse(df)
  }

  private def findAll(motif: Seq[MotifEdge], injective: Boolean): DataFrame = {
    require(motif.nonEmpty)
    var bound = List.empty[String]
    var result: DataFrame = null

    motif.zipWithIndex.foreach { case (me, i) =>
      val Array(s, d) = me.edges.columns.take(2)
      val step = me.edges.select(col(s).as(s"__s$i"), col(d).as(s"__d$i"))
      (bound.contains(me.from), bound.contains(me.to)) match {
        case (false, false) =>
          require(result == null,
            s"motif edge ${me.from}->${me.to} is disconnected from earlier edges")
          result = step.select(col(s"__s$i").as(me.from), col(s"__d$i").as(me.to))
          bound = me.to :: me.from :: bound
        case (true, false) =>
          result = result.join(step, result(me.from) === step(s"__s$i"))
            .withColumnRenamed(s"__d$i", me.to).drop(s"__s$i")
          bound = me.to :: bound
        case (false, true) =>
          result = result.join(step, result(me.to) === step(s"__d$i"))
            .withColumnRenamed(s"__s$i", me.from).drop(s"__d$i")
          bound = me.from :: bound
        case (true, true) => // closure edge → existence filter
          result = result.join(step,
            result(me.from) === step(s"__s$i") && result(me.to) === step(s"__d$i"),
            "left_semi")
      }
      me.filter.foreach(f => result = result.where(f))
    }

    if (injective) {
      val vars = bound.reverse
      for {
        (a, i) <- vars.zipWithIndex
        b <- vars.drop(i + 1)
      } result = result.where(col(a) =!= col(b))
    }
    result
  }
}
