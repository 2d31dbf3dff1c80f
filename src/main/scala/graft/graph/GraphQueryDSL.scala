package graft.graph

import org.apache.spark.sql.{Column, DataFrame}

/** The reference's top-level query API shape (pygr
  * `GraphQuery(dataGraph, queryGraph)`, `graphquery.py:719-771`):
  * a query graph given as adjacency (node → targets), BFS-ordered
  * from root nodes (no incoming edges) into a bind order, then
  * executed by `MotifQuery`. Edges whose endpoints are both already
  * bound become closure filters automatically (cyclic and headless
  * query graphs both work — a headless graph starts from its
  * lexicographically smallest node, making results deterministic).
  */
object GraphQueryDSL {

  def find(dataEdges: DataFrame, queryGraph: Map[String, Seq[String]],
           filters: Map[(String, String), Column] = Map.empty,
           injective: Boolean = true): DataFrame = {
    val nodes = (queryGraph.keySet ++ queryGraph.values.flatten).toSeq.sorted
    val incoming = queryGraph.values.flatten.toSet
    val roots = nodes.filterNot(incoming.contains)
    val starts = if (roots.nonEmpty) roots else nodes.take(1) // headless

    // BFS from the roots over the query graph, collecting edges in
    // visit order (graphquery.py BFS ordering); unreached edges
    // (disconnected or back-edges) appended afterwards become
    // closure/filter steps in MotifQuery.
    val ordered = Seq.newBuilder[(String, String)]
    val seen = scala.collection.mutable.Set.empty[String]
    val queue = scala.collection.mutable.Queue.empty[String]
    starts.foreach { r => seen += r; queue += r }
    while (queue.nonEmpty) {
      val n = queue.dequeue()
      queryGraph.getOrElse(n, Seq.empty).sorted.foreach { t =>
        ordered += ((n, t))
        if (!seen.contains(t)) { seen += t; queue += t }
      }
    }
    // any edges out of never-visited nodes (disconnected subqueries)
    nodes.filterNot(seen.contains).foreach { n =>
      queryGraph.getOrElse(n, Seq.empty).sorted.foreach(t => ordered += ((n, t)))
    }
    val motif = ordered.result().distinct.map { case (f, t) =>
      MotifEdge(f, t, dataEdges, filters.get((f, t)))
    }
    MotifQuery.find(motif, injective)
  }
}
