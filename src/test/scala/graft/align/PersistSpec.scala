package graft.align

import java.nio.file.Files

import graft.SparkSuite

class PersistSpec extends SparkSuite {

  test("persist → load roundtrip preserves slices (S9/S10)") {
    import spark.implicits._
    val store = AlignmentStore.fromCoords(spark, Seq(
      (("a", 0L, 10L), ("b", 100L, 110L, 1)),
      (("a", 50L, 60L), ("c", 0L, 10L, -1)),
      (("z", 5L, 25L), ("b", 200L, 220L, 1))))
    val path = Files.createTempDirectory("alnstore").toString + "/blocks"
    store.persist(path, buckets = 4)
    val loaded = AlignmentStore.load(spark, path)
    val q = Seq((0L, "a", 0L, 100L)).toDF("q_id", "src_id", "q_start", "q_end")
    def slices(s: AlignmentStore) =
      s.slice(q).orderBy("block_id").collect().map(_.toSeq).toSeq
    assert(slices(loaded) === slices(store))
    assert(loaded.blocks.count() === store.blocks.count())
  }
}
