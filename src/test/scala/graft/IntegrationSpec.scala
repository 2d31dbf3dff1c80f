package graft

import java.nio.file.Files

import graft.align.AlignmentStore
import graft.graph.EdgeGraph
import graft.sources.Maf

class IntegrationSpec extends SparkSuite {

  test("MAF ingest → AlignmentStore → slice end-to-end") {
    import spark.implicits._
    val maf =
      """##maf version=1
        |a score=1.0
        |s hg.chr1 100 8 + 1000 ACGTACGT
        |s mm.chr2 500 8 + 2000 ACGTACGT
        |
        |a score=2.0
        |s hg.chr1 300 4 + 1000 GGGG
        |s mm.chr3  10 4 - 100  GGGG
        |""".stripMargin
    val dir = Files.createTempDirectory("mafint").toFile
    Files.writeString(new java.io.File(dir, "x.maf").toPath, maf)
    val store = new AlignmentStore(Maf.read(spark, dir.getAbsolutePath))
    val q = Seq((1L, "hg.chr1", 104L, 302L)).toDF("q_id", "src_id", "q_start", "q_end")
    val got = store.slice(q).orderBy("src_start")
      .collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3),
                 r.getString(4), r.getLong(5), r.getLong(6), r.getInt(7)))
      .toList
    assert(got === List(
      // first block clipped [104,108): dest follows forward
      ("hg.chr1", 104L, 108L, "mm.chr2", 504L, 508L, 1),
      // second block clipped [300,302): '-' strand dest, trimmed from LOW end
      ("hg.chr1", 300L, 302L, "mm.chr3", 88L, 90L, -1)))
  }

  test("EdgeGraph append/save/load snapshot semantics") {
    import spark.implicits._
    val g = new EdgeGraph(Seq((1L, 2L)).toDF("src", "dst"))
    val g2 = g.append(Seq((2L, 3L)).toDF("src", "dst"))
    assert(g.edges.count() === 1) // original snapshot unchanged
    assert(g2.edges.count() === 2)
    val path = Files.createTempDirectory("eg").toString + "/edges"
    g2.save(path)
    val loaded = EdgeGraph.load(spark, path)
    assert(loaded.adjacency(2L).collect().map(_.getLong(1)).toSet === Set(3L))
    assert(loaded.outDegrees.count() === 2)
  }
}
