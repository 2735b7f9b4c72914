package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.ops.{AsOf, Serve}

/** As-of join property test: the union+window implementation must agree
  * with a naive per-row scan on random data, including unmatched keys and
  * inclusive-tie semantics.
  */
class AsOfSpec extends SparkTestBase {
  import spark.implicits._

  test("asOfJoin equals the naive latest-at-or-before scan") {
    val rnd = new Random(7)
    for (_ <- 1 to 5) {
      val lefts = Seq.fill(60)((rnd.nextInt(6).toLong, rnd.nextInt(100).toLong,
        rnd.nextInt(1000)))
        .zipWithIndex.map { case ((k, t, v), i) => (i.toLong, k, t, v) }
      val rights = Seq.fill(25)((rnd.nextInt(8).toLong, rnd.nextInt(100).toLong,
        rnd.nextInt(1000)))
        .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq // unique (key, time)
        .zipWithIndex.map { case ((k, t, p), i) => (1000L + i, k, t, p) }

      val l = lefts.toDF("lid", "k", "lt", "lv")
      val r = rights.toDF("rid", "rk", "rt", "rp")
      val got = AsOf.asOfJoin(l, r, "k", "rk", "lt", "rt",
          Seq("rid", "rp", "rt"))
        .select(col("lid"), col("rid"))
        .collect().map(row => row.getLong(0) ->
          (if (row.isNullAt(1)) -1L else row.getLong(1))).toMap

      val expected = lefts.map { case (lid, k, lt, _) =>
        val cands = rights.filter(r => r._2 == k && r._3 <= lt)
        lid -> (if (cands.isEmpty) -1L else cands.maxBy(_._3)._1)
      }.toMap

      assert(got == expected)
    }
  }

  test("withTolerance: stale matches null all payload columns together; " +
    "infinite tolerance is the identity") {
    val rnd = new Random(11)
    val lefts = Seq.tabulate(40)(i =>
      (i.toLong, rnd.nextInt(4).toLong, rnd.nextInt(100).toLong))
    val rights = Seq.fill(15)((rnd.nextInt(4).toLong, rnd.nextInt(100).toLong,
      rnd.nextInt(1000)))
      .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      .zipWithIndex.map { case ((k, t, p), i) => (1000L + i, k, t, p) }
    val l = lefts.toDF("lid", "k", "lt")
    val r = rights.toDF("rid", "rk", "rt", "rp")
    val joined = AsOf.asOfJoin(l, r, "k", "rk", "lt", "rt",
      Seq("rid", "rp", "rt"))
    val tol = 20L
    val got = AsOf.withTolerance(joined, "lt", "rt",
      Seq("rid", "rp", "rt"), tol).collect()
    got.foreach { row =>
      val nulls = Seq("rid", "rp", "rt").map(c => row.isNullAt(row.fieldIndex(c)))
      assert(nulls.distinct.length == 1, s"payload must null together: $row")
      if (!row.isNullAt(row.fieldIndex("rt")))
        assert(row.getLong(row.fieldIndex("lt")) -
          row.getLong(row.fieldIndex("rt")) <= tol)
    }
    // naive cross-check of which rows survive
    val survivors = got.filter(!_.isNullAt(got.head.fieldIndex("rid")))
      .map(r => r.getLong(r.fieldIndex("lid"))).toSet
    val expected = lefts.filter { case (_, k, lt) =>
      rights.exists(r => r._2 == k && r._3 <= lt && lt - r._3 <= tol)
    }.map(_._1).toSet
    assert(survivors == expected)
    // tol = MaxValue: identical to the plain join
    val ident = AsOf.withTolerance(joined, "lt", "rt",
      Seq("rid", "rp", "rt"), Long.MaxValue).collect().map(_.toSeq).toSet
    assert(ident == joined.collect().map(_.toSeq).toSet)
  }

  test("asOfJoinForward equals the naive earliest-at-or-after scan") {
    val rnd = new Random(13)
    for (_ <- 1 to 5) {
      val lefts = Seq.fill(60)((rnd.nextInt(6).toLong, rnd.nextInt(100).toLong,
        rnd.nextInt(1000)))
        .zipWithIndex.map { case ((k, t, v), i) => (i.toLong, k, t, v) }
      val rights = Seq.fill(25)((rnd.nextInt(8).toLong, rnd.nextInt(100).toLong,
        rnd.nextInt(1000)))
        .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq // unique (key, time)
        .zipWithIndex.map { case ((k, t, p), i) => (1000L + i, k, t, p) }

      val l = lefts.toDF("lid", "k", "lt", "lv")
      val r = rights.toDF("rid", "rk", "rt", "rp")
      val got = AsOf.asOfJoinForward(l, r, "k", "rk", "lt", "rt",
          Seq("rid", "rp", "rt"))
        .select(col("lid"), col("rid"))
        .collect().map(row => row.getLong(0) ->
          (if (row.isNullAt(1)) -1L else row.getLong(1))).toMap

      val expected = lefts.map { case (lid, k, lt, _) =>
        val cands = rights.filter(r => r._2 == k && r._3 >= lt)
        lid -> (if (cands.isEmpty) -1L else cands.minBy(_._3)._1)
      }.toMap

      assert(got == expected)
    }
  }

  test("Serve.page slices deterministically and withDocId mirrors the key") {
    val df = (1L to 50L).map(i => (i, s"u$i")).toDF("id", "name")
    val page2 = Serve.page(df, Seq(col("id")), pageNo = 2, pageSize = 10)
      .select("id").as[Long].collect().toSeq
    assert(page2 == (11L to 20L))
    val withId = Serve.withDocId(df, "name").select("name", "_id")
      .collect().forall(r => r.getString(0) == r.getString(1))
    assert(withId)
  }

  test("minuteBucket floors epoch millis into 180-second buckets") {
    import graft.ops.Ingest
    val df = Seq(0L, 179999L, 180000L, 359999L).toDF("ms")
      .select(Ingest.minuteBucket(col("ms")).as("b")).as[Long].collect().toSeq
    assert(df == Seq(0L, 0L, 1L, 1L))
  }
}
