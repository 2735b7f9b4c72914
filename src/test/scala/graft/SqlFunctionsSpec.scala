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

  test("HammingHex kernel matches the HOF instr/bit_count formulation " +
    "over the corpus simhashes; SQL form registered") {
    import org.apache.spark.sql.functions._
    Functions.register(spark)
    // all pairs of the sf0.001 corpus's first 40 distinct signatures —
    // covers the full nibble alphabet
    val hs = graft.ext.TextDedup.simhash(spark, "/root/testdata/sf0.001")
      .select(col("simhash")).distinct().orderBy(col("simhash"))
      .limit(40)
    val pairs = hs.select(col("simhash").as("h1"))
      .crossJoin(hs.select(col("simhash").as("h2")))
    val both = pairs.select(
      graft.catalyst.HashExpressions.hammingHex(col("h1"), col("h2"))
        .as("kernel"),
      expr(
        """aggregate(sequence(1, 16), 0, (acc, i) -> acc + bit_count(
          |  (instr('0123456789abcdef', substring(h1, i, 1)) - 1) ^
          |  (instr('0123456789abcdef', substring(h2, i, 1)) - 1)))"""
          .stripMargin).as("hof")).collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getInt(0) == r.getInt(1)))
    val viaSql = spark.sql(
      "SELECT graft_hamming_hex('00ff', '0f0f') AS d").collect().head.getInt(0)
    assert(viaSql == 8)
  }

  test("wrong arity fails with the function's signature, not an index error") {
    Functions.register(spark)
    val e1 = intercept[Exception](
      spark.sql("SELECT graft_dot(array(1.0D))").collect())
    assert(e1.getMessage.contains("graft_dot") &&
      e1.getMessage.contains("2 argument"), e1.getMessage)
    val e2 = intercept[Exception](
      spark.sql("SELECT graft_simhash64(array('a'), array('b'))").collect())
    assert(e2.getMessage.contains("graft_simhash64"), e2.getMessage)
  }

  test("wrong input types fail analysis cleanly") {
    Functions.register(spark)
    // array<int> embeddings: analysis-time failure, not a runtime cast/IAE
    val e1 = intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("SELECT graft_dot(array(1, 2), array(3, 4))").collect())
    assert(e1.getMessage.contains("array<float|double>"), e1.getMessage)
    val e2 = intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("SELECT graft_simhash64('not an array')").collect())
    assert(e2.getMessage.contains("array<string>"), e2.getMessage)
    val e3 = intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("SELECT graft_minhash_chunks(array(1, 2))").collect())
    assert(e3.getMessage.contains("array<string>"), e3.getMessage)
  }

  test("extensions injector wires the same builders without error") {
    val e = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(e) // would throw on a bad registration
  }

  test("DSIR kernel expressions match the HOF formulations element-wise") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = Seq("alpha beta gamma delta", "one", "", "x  y",
      "alpha beta alpha beta").toDF("text")
      .select(split($"text", " ").as("toks"))
    def gramsOf(c: org.apache.spark.sql.Column) = transform(
      sequence(lit(1), greatest(size(c) - 1, lit(1))),
      i => concat_ws(" ", slice(c, i, lit(2))))
    val hof = docs.select(transform(gramsOf($"toks"),
      g => conv(substring(md5(g), 1, 2), 16, 10).cast("long")).as("bs"))
      .collect().map(_.getSeq[Long](0))
    val kern = docs.select(
      graft.catalyst.HashExpressions.dsirBuckets($"toks").as("bs"))
      .collect().map(_.getSeq[Long](0))
    assert(kern.toSeq == hof.toSeq)
    // DsirScore folds the same buckets against given count arrays
    val t = (0L until 256L).toArray
    val s = (0L until 256L).map(_ * 3).toArray
    val scored = docs.select(graft.catalyst.HashExpressions.dsirScore(
      $"toks", lit(t), lit(s)).as("sc"))
      .select($"sc.n_grams", $"sc.num", $"sc.den").collect()
    scored.zip(hof).foreach { case (row, bs) =>
      assert(row.getLong(0) == bs.length)
      assert(row.getLong(1) == bs.map(b => t(b.toInt) + 1L).sum)
      assert(row.getLong(2) == bs.map(b => s(b.toInt) + 1L).sum)
    }
  }

  test("DSIR kernel equals a naive driver-side reference over seeded " +
    "random token arrays (incl. multi-byte tokens and empty docs)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import scala.util.Random
    val rnd = new Random(43)
    val alphabet = Seq("a", "bb", "λ", "Ωx", "", "mid word")
    val cases = (0 until 150).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(9))(alphabet(rnd.nextInt(alphabet.length))))
    }
    def bucket(g: String): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(g.getBytes("UTF-8"))
      d(0) & 0xff
    }
    def naive(toks: Seq[String]): Seq[Long] = {
      val m = math.max(toks.length - 1, 1)
      (0 until m).map { i =>
        val parts = Seq(toks.lift(i), toks.lift(i + 1)).flatten
        bucket(parts.mkString(" ")).toLong
      }
    }
    val got = cases.toDF("id", "toks")
      .select(col("id"),
        graft.catalyst.HashExpressions.dsirBuckets(col("toks")).as("bs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    cases.foreach { case (id, toks) =>
      assert(got(id) == naive(toks),
        s"case $id: buckets($toks) = ${got(id)}, expected ${naive(toks)}")
    }
  }

  test("dsirWeights kernel form is bit-for-bit with the HOF parity oracle") {
    val sf = "/root/testdata/sf0.001"
    val a = graft.ext.Curation.dsirWeights(spark, sf).collect()
    val b = graft.ext.Curation.dsirWeightsViaHof(spark, sf).collect()
    assert(a.length == b.length && a.nonEmpty)
    a.zip(b).foreach { case (x, y) => assert(x == y) }
  }

  test("RepetitionStats kernel equals a naive driver-side reference over " +
    "seeded random token arrays (repetitive and diverse, incl. " +
    "multi-byte tokens and short docs)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import scala.util.Random
    val rnd = new Random(53)
    // a small alphabet forces real gram/span repetition; a larger one
    // gives diverse docs — both regimes covered
    val alphabets = Seq(Seq("a", "b"), Seq("a", "bb", "λ", "Ωx", "c", "d",
      "e", "f", "gg", "hh", "ij", "kl"))
    val cases = (0 until 120).map { i =>
      val ab = alphabets(i % 2)
      (i.toLong,
        Seq.fill(1 + rnd.nextInt(40))(ab(rnd.nextInt(ab.length))))
    }
    val spanLen = 3; val topN = 2; val dupN = 5
    def grams(toks: Seq[String], from: Int, n: Int): String =
      toks.slice(from, math.min(from + n, toks.length)).mkString(" ")
    def naive(toks: Seq[String]): (Long, Long, String, Long, Long, Long) = {
      val nSpans = math.max((toks.length + spanLen - 1) / spanLen, 1)
      val spans = (0 until nSpans).map(i => grams(toks, i * spanLen, spanLen))
      val spanC = spans.groupBy(identity).map { case (_, v) => v.size }
      val nDup = spanC.filter(_ >= 2).map(_.toLong).sum
      val m2 = math.max(toks.length - topN + 1, 1)
      val g2 = (0 until m2).map(i => grams(toks, i, topN))
      val c2 = g2.groupBy(identity).view.mapValues(_.size).toMap
      val (tg, tc) = c2.toSeq.minBy { case (g, c) => (-c, g) }
      val m5 = math.max(toks.length - dupN + 1, 1)
      val g5 = (0 until m5).map(i => grams(toks, i, dupN))
      val dupChars = g5.groupBy(identity).collect {
        case (g, v) if v.size >= 2 =>
          v.size.toLong * g.codePointCount(0, g.length)
      }.sum
      (nSpans.toLong, nDup, tg, tc.toLong,
        tg.codePointCount(0, tg.length).toLong, dupChars)
    }
    val got = cases.toDF("id", "toks")
      .select(col("id"), graft.catalyst.HashExpressions
        .repetitionStats(col("toks"), spanLen, topN, dupN).as("rs"))
      .select(col("id"), col("rs.n_spans"), col("rs.n_dup_spans"),
        col("rs.top_gram"), col("rs.top_cnt"), col("rs.top_chars"),
        col("rs.dup_chars"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    cases.foreach { case (id, toks) =>
      assert(got(id) == naive(toks),
        s"case $id: stats($toks) = ${got(id)}, expected ${naive(toks)}")
    }
  }

  test("round6/round9 floor-form parity on adversarial terminating " +
    "quotients (the round(int/int) defect class, retired wholesale r13)") {
    import org.apache.spark.sql.functions._
    import graft.ops.Exact.{round6, round9, sqlRound6, sqlRound9}
    import spark.implicits._
    // Quotients that terminate exactly ON a half-way decimal at digit 7
    // (resp. 10) — the inputs on which Spark's round() (HALF_UP on the
    // shortest decimal of the double) and DuckDB's round() (scaled
    // double) historically split (text_bigram_lm, r12). The floor form
    // floor(q*1e6 + 0.5)/1e6 is one fixed IEEE op sequence, so any
    // engine computing it on the same double q gets the same bits.
    val cases = Seq[(Long, Long)](
      (1L, 2000000L),        // 0.0000005
      (3L, 2000000L),        // 0.0000015
      (1234565L, 10000000L), // 0.1234565
      (-1234565L, 10000000L),
      (987654321L, 2000000000L), // ~0.4938271605 (9-digit half-way)
      (5L, 10000000000L),    // 0.0000000005 (10-digit half-way, round9)
      (-5L, 10000000000L),
      (7L, 8L), (1L, 3L), (2L, 7L), // non-terminating controls
      (123456789L, 1000000L), // >1 magnitudes
      (0L, 5L))
    val df = cases.toDF("a", "b")
      .select(col("a"), col("b"),
        (col("a").cast("double") / col("b").cast("double")).as("q"))
    val got = df.select(col("a"), col("b"),
        round6(col("q")).as("r6"), round9(col("q")).as("r9"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    cases.foreach { case (a, b) =>
      val q = a.toDouble / b.toDouble
      // the JVM runs the identical IEEE sequence — bit-equality expected
      val want6 = math.floor(q * 1e6 + 0.5) / 1e6
      val want9 = math.floor(q * 1e9 + 0.5) / 1e9
      assert(got((a, b)) == ((want6, want9)),
        s"floor-form mismatch on $a/$b: got ${got((a, b))}, " +
          s"want ($want6, $want9)")
    }
    // the SQL-text twins (what the oracle runs) evaluate to the same
    // doubles through Spark's SQL parser — and DuckDB parses the very
    // same text into the very same op sequence
    val viaSql = df.selectExpr("a", "b",
        s"${sqlRound6("q")} AS r6", s"${sqlRound9("q")} AS r9")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    assert(viaSql == got, "sqlRound6/9 text form diverges from Column form")
    // the defect is real: on at least one half-way case the retired
    // round() disagrees with the floor form in this very engine —
    // proving the class could never be fixed by auditing round() users
    val legacy = df.select(col("a"), col("b"), round(col("q"), 6).as("l6"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(cases.exists { case (a, b) =>
      legacy((a, b)) != got((a, b))._1 },
      "expected >=1 half-way case where legacy round() != floor form")
  }

  test("the r14 kernels are SQL-reachable: pack/dot int8 round-trip and " +
    "the total double floor") {
    graft.catalyst.Functions.register(spark)
    val r = spark.sql(
      """SELECT graft_dot_int8(graft_pack_int8(array(1.0D, -2.0D, 127.0D)),
        |         graft_pack_int8(array(3.0D, 4.0D, -1.0D))) AS d,
        |       graft_floor_double(CAST('NaN' AS DOUBLE)) AS nanf,
        |       graft_floor_double(2.7D) AS f""".stripMargin)
      .collect().head
    assert(r.getDouble(0) == (3.0 - 8.0 - 127.0))
    assert(r.getDouble(1).isNaN)
    assert(r.getDouble(2) == 2.0)
  }

  test("round6 is total over doubles (ADVICE r13): NaN/±Inf propagate " +
    "and huge values pass the SAME IEEE floor DuckDB runs — no LongType " +
    "saturation; on the historical grid it equals the long-floor form") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, floor, lit}
    import graft.ops.Exact.round6
    // token-count magnitudes from the 100 TB design point (ADVICE: the
    // mixture_epochs target/effective/deficit columns exceed 9.2e12),
    // plus the long-floor saturation points and the non-finite edge
    val edge = Seq(Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity, 1.23456785e13, 9.3e12, 2.0e14,
      Double.MaxValue)
    val got = edge.toDF("x").select(round6(col("x")).as("r"))
      .collect().map(_.getDouble(0))
    // the reference semantics: the identical Math op chain in the JVM
    val want = edge.map(x => Math.floor(x * 1e6 + 0.5) / 1e6)
    got.zip(want).zip(edge).foreach { case ((g, w), x) =>
      assert(java.lang.Double.compare(g, w) == 0,
        s"round6($x) = $g, want $w")
    }
    assert(got(0).isNaN && got(1).isPosInfinity && got(2).isNegInfinity)
    // Spark's LongType floor would have produced 0 / ±9.223372036854776e12
    // for the first three — the saturation this pin retires
    assert(got(3) != 9.223372036854776e12)
    // on the registry's historical domain (|x·1e6+0.5| < 2^53) the
    // double floor changes NOTHING vs the long floor, ties included
    val grid = Seq(0.0, 1.0, -1.0, 0.1234565, -0.1234565, 0.9999995,
      -0.9999995, 8.9e9, -8.9e9, 1.0 / 3.0, -2.0 / 7.0)
    val both = grid.toDF("x")
      .select(round6(col("x")).as("d"),
        (floor(col("x") * lit(1e6) + lit(0.5)) / lit(1e6)).as("l"))
      .collect()
    both.zip(grid).foreach { case (r, x) =>
      assert(java.lang.Double.compare(r.getDouble(0), r.getDouble(1)) == 0,
        s"double-floor vs long-floor diverge on in-grid $x: " +
          s"${r.getDouble(0)} vs ${r.getDouble(1)}")
    }
  }

  test("sqlRound6Spark/sqlRound9Spark Spark-parse to the TOTAL double " +
    "floor — NaN/±Inf/huge match the Column form bit-for-bit, where the " +
    "plain oracle text form saturates through Spark's LongType floor " +
    "(ADVICE r14: the two parses of sqlRound6 diverge at the edges)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.ops.Exact.{round6, round9, sqlRound6, sqlRound6Spark,
      sqlRound9Spark}
    graft.catalyst.Functions.register(spark)
    val edge = Seq(Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity, 1.23456785e13, 2.0e14, 0.1234565,
      -0.1234565, 1.0 / 3.0)
    val df = edge.toDF("x")
    val viaCol = df.select(round6(col("x")).as("r6"),
        round9(col("x")).as("r9")).collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
    val viaSpark = df.selectExpr(s"${sqlRound6Spark("x")} AS r6",
        s"${sqlRound9Spark("x")} AS r9").collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
    viaCol.zip(viaSpark).zip(edge).foreach { case (((c6, c9), (s6, s9)), x) =>
      assert(java.lang.Double.compare(c6, s6) == 0 &&
        java.lang.Double.compare(c9, s9) == 0,
        s"Spark text form diverges from Column form on $x: " +
          s"($s6,$s9) vs ($c6,$c9)")
    }
    // the documented bounded-domain caveat is REAL: Spark-parsing the
    // plain oracle text form maps NaN through the LongType floor to 0.0
    val plain = Seq(Double.NaN).toDF("x")
      .selectExpr(s"${sqlRound6("x")} AS r6").collect().head.getDouble(0)
    assert(plain == 0.0,
      "expected Spark's parse of the plain text form to saturate NaN — " +
        "if this changed, the sqlRound6 scaladoc caveat is stale")
  }

  test("no round(x, 6|9) call sites remain in src/main (defect class " +
    "retired wholesale; graft.ops.Exact is the only rounding path)") {
    val root = new java.io.File("src/main/scala")
    assert(root.isDirectory, s"run tests from the repo root: $root missing")
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".scala")) Seq(f) else Nil
    val hits = for {
      f <- walk(root)
      if f.getName != "Exact.scala"
      (raw, i) <- scala.io.Source.fromFile(f)(scala.io.Codec.UTF8)
        .getLines().zipWithIndex
      // comments may still NAME round() in prose; code may not CALL it
      line = raw.replaceAll("//.*$", "").trim
      if !line.startsWith("*")
      // flag call sites rounding to a literal digit count, including
      // call opens that spill the second arg to the next line
      if line.matches(""".*\bround\(.*""") &&
        (line.matches(""".*\bround\(.*,\s*[0-9]+\).*""") ||
          line.matches(""".*\bround\([^)]*$"""))
    } yield s"${f.getPath}:${i + 1}: ${raw.trim}"
    assert(hits.isEmpty,
      s"round() call sites must use graft.ops.Exact:\n${hits.mkString("\n")}")
  }
}
