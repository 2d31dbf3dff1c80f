package graft.catalog

import java.nio.file.Files

import graft.SparkSuite

class CatalogSpec extends SparkSuite {

  test("register/resolve/relations roundtrip (worldbase semantics)") {
    val dir = Files.createTempDirectory("catalog").toString
    val cat = new Catalog(dir)
    cat.register(Resource("Test.TPCH.customer", "table", "parquet",
      "/root/testdata/sf0.001/customer.parquet"))
    cat.register(Resource("Test.TPCH.nation", "table", "parquet",
      "/root/testdata/sf0.001/nation.parquet"))
    cat.addRelation(Relation("customer_nation", "Test.TPCH.customer", "c_nationkey",
      "Test.TPCH.nation", "n_nationkey", "one-to-many"))

    // a fresh Catalog instance sees the persisted metadata
    val cat2 = new Catalog(dir)
    assert(cat2.ls("Test.TPCH") ===
      Seq("Test.TPCH.customer", "Test.TPCH.nation"))
    val c = cat2.resolve(spark, "Test.TPCH.customer")
    assert(c.count() > 0)
    val joined = cat2.bind(spark, "customer_nation")
    assert(joined.count() === c.count()) // left join keeps all customers
    assert(joined.columns.contains("n_name"))
    // replace keeps the map keyed by name
    cat2.register(Resource("Test.TPCH.customer", "table", "parquet",
      "/root/testdata/sf0.01/customer.parquet"))
    assert(new Catalog(dir).resources("Test.TPCH.customer").path.contains("sf0.01"))
    intercept[NoSuchElementException](cat2.resolve(spark, "Nope.Missing"))
  }
}
