package graft

import graft.catalyst.{Functions, GraftExtensions}

/** The custom expressions exposed through the SQL surface. */
class SqlFunctionsSpec extends SparkTestBase {

  test("registered functions work from spark.sql") {
    Functions.register(spark)
    val row = spark.sql(
      """SELECT graft_simhash64(split('alpha beta gamma', ' ')) AS h,
        |  graft_word_shingles(split('a b c d', ' '), 3) AS sh,
        |  graft_minhash_chunks(
        |    graft_word_shingles(split('a b c d', ' '), 3)) AS mh""".stripMargin)
      .collect().head
    assert(row.getAs[String]("h").length == 16)
    assert(row.getSeq[String](1) == Seq("a b c", "b c d"))
    assert(row.getSeq[String](2).length == 8)
    // parity with the Column API on the same input
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val viaColumn = Seq("alpha beta gamma").toDF("text")
      .select(graft.catalyst.HashExpressions.simhash64(split($"text", " ")))
      .collect().head.getString(0)
    assert(row.getAs[String]("h") == viaColumn)
    // graft_dot from SQL: 1*4 + 2*5 + 3*6 = 32
    val dot = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .collect().head.getDouble(0)
    assert(dot == 32.0)
  }

  test("extensions injector wires the same builders without error") {
    val e = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(e) // would throw on a bad registration
  }
}
