package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.seq.SeqFunctions

class ReverseComplementSpec extends SparkSuite {

  test("native expression matches the composed translate/reverse form") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val data = Seq("", "A", "atggcagg", "ACGTNacgtn", "UraciL") ++
      (1 to 200).map(_ => (1 to rnd.nextInt(80)).map(_ => "ACGTNacgtnXY-"(rnd.nextInt(13))).mkString)
    val df = data.toDF("s")
    val got = df.select(
      ReverseComplement.reverse_complement(col("s")).as("fast"),
      SeqFunctions.reverseComplement(col("s")).as("ref")).collect()
    got.foreach(r => assert(r.getString(0) === r.getString(1)))
  }

  test("native codon translation matches the declarative form") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val data = Seq("", "AT", "ATG", "ATGTAAG", "atgnnn", "ATGXXXTAA") ++
      (1 to 200).map(_ => (1 to rnd.nextInt(90)).map(_ => "ACGTNacgtn-"(rnd.nextInt(11))).mkString)
    val got = data.toDF("s").select(
      TranslateCodons.translate_codons(col("s")).as("fast"),
      SeqFunctions.translateCodonsDeclarative(col("s")).as("ref")).collect()
    got.foreach(r => assert(r.getString(0) === r.getString(1)))
  }

  test("SQL registration works and stays in codegen") {
    import spark.implicits._
    ReverseComplement.register(spark)
    Seq("atggcagg").toDF("s").createOrReplaceTempView("rc_in")
    val out = spark.sql("SELECT reverse_complement(s) AS rc FROM rc_in")
      .as[String].collect()
    assert(out.toSeq === Seq("cctgccat"))
  }
}
