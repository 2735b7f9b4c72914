package graft

import org.apache.spark.sql.functions._

import graft.ext.{Curation, Layout, TextAnalysis}
import graft.ops.{Ingest, SkewJoin}

/** Round-7 additions: Z-order layout, salted/bloom-pruned joins,
  * boilerplate removal, inverted index — value parity plus the specific
  * scale claims each operator's scaladoc makes.
  */
class LayoutJoinsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("zValue is a bijection on (a, b) pairs within the bit budget") {
    import spark.implicits._
    val pairs = (0 until 32).flatMap(a => (0 until 32).map(b => (a.toLong, b.toLong)))
      .toDF("a", "b")
    val z = pairs.select(Layout.zValue(col("a"), col("b"), 5).as("z"))
    assert(z.distinct().count() === 32L * 32L)
    // interleave bound: 5+5 bits → z < 2^10
    assert(z.agg(max(col("z"))).head.getLong(0) < (1L << 10))
  }

  test("zValue is monotone in each coordinate when the other is fixed") {
    import spark.implicits._
    val df = (0 until 64).map(_.toLong).toDF("v")
    val alongA = df.select(Layout.zValue(col("v"), lit(7L), 6).as("z"), col("v"))
      .orderBy(col("v")).collect().map(_.getLong(0))
    assert(alongA.sliding(2).forall(w => w(0) < w(1)))
    val alongB = df.select(Layout.zValue(lit(7L), col("v"), 6).as("z"), col("v"))
      .orderBy(col("v")).collect().map(_.getLong(0))
    assert(alongB.sliding(2).forall(w => w(0) < w(1)))
  }

  test("shuffleLayout emits a 1..n permutation per shard, is " +
    "deterministic, and never plans a single-partition exchange") {
    val df = Layout.shuffleLayout(spark, sf, nShards = 4)
    val rows = df.collect()
    // exhaustive: every doc placed exactly once
    val total = Ingest.table(spark, sf, "documents").count()
    assert(rows.length.toLong == total)
    assert(rows.map(_.getLong(0)).distinct.length.toLong == total)
    // per shard: positions are exactly 1..n_shard (hash keys unique)
    rows.groupBy(_.getLong(1)).foreach { case (shard, rs) =>
      val pos = rs.map(_.getLong(2)).sorted.toSeq
      assert(pos == (1L to rs.length.toLong), s"shard $shard")
    }
    // pure hash permutation: a re-run reproduces every placement
    val again = Layout.shuffleLayout(spark, sf, nShards = 4).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      again.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq)
    // a different salt yields a different permutation (not a re-label)
    val other = Layout.shuffleLayout(spark, sf, nShards = 4, salt = "s43")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val moved = rows.count(r => other(r.getLong(0)) !=
      ((r.getLong(1), r.getLong(2))))
    assert(moved > rows.length / 2)
    // scale guard: the within-shard rank rides the block prefix sum —
    // no stage may collapse a shard (or the corpus) into one task
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"), plan.take(2000))
  }

  test("curriculumLayout phases each shard ascending by quality band " +
    "and shuffles within a band") {
    val rows = Layout.curriculumLayout(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val total = Ingest.table(spark, sf, "documents").count()
    assert(rows.length.toLong == total)
    // per shard: pos is a 1..n permutation and phases read in
    // ascending order — the annealing property
    rows.groupBy(_._3).foreach { case (shard, rs) =>
      val byPos = rs.sortBy(_._4)
      assert(byPos.map(_._4).toSeq == (1L to rs.length.toLong), s"shard $shard")
      val phases = byPos.map(_._2)
      assert(phases.sliding(2).forall(w => w.length < 2 || w(0) <= w(1)),
        s"shard $shard reads a lower band after a higher one")
    }
    // bands are quality-ordered globally: every phase-p score is <= every
    // phase-(p+1) score (ties may straddle only equal scores)
    val qs = TextAnalysis.quality(spark, sf)
      .select("doc_id", "quality_score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val byPhase = rows.groupBy(_._2).view
      .mapValues(_.map(r => qs(r._1))).toMap
    assert(byPhase.keySet == Set(0L, 1L, 2L))
    // strict: tied scores share one cumulative count, hence one band —
    // a score can never straddle two phases
    assert(byPhase(0L).max < byPhase(1L).min)
    assert(byPhase(1L).max < byPhase(2L).min)
    // within a band, order is the hash shuffle: not doc_id order
    val p0 = rows.filter(r => r._2 == 0L && r._3 == 0L).sortBy(_._4)
      .map(_._1)
    assert(p0.length > 2 && p0.toSeq != p0.sorted.toSeq)
    // one band = no curriculum: the degenerate form must be EXACTLY the
    // plain shuffle (phase 0 everywhere, identical placements)
    val flat = Layout.curriculumLayout(spark, sf, nPhases = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(flat.forall(_._2 == 0L))
    val plain = Layout.shuffleLayout(spark, sf).collect()
      .map(r => (r.getLong(0), 0L, r.getLong(1), r.getLong(2)))
    assert(flat.toSeq == plain.toSeq)
  }

  test("interleave layout: every prefix of the order stays within a " +
    "couple of docs per source of exact proportionality") {
    val rows = Layout.interleaveLayout(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    val n = rows.length
    assert(n > 0)
    val nSrc = rows.groupBy(_._2).view.mapValues(_.length).toMap
    // ipos nondecreasing down the emitted order
    rows.map(_._4).sliding(2).foreach {
      case Array(a, b) => assert(a <= b)
      case _ =>
    }
    // stride placement: every prefix is proportional to within ±2 docs
    // per source (the interleave's whole point: no mid-epoch shift)
    Seq(n / 7, n / 3, n / 2, 2 * n / 3, n - 1).foreach { cut =>
      val pref = rows.take(cut).groupBy(_._2).view.mapValues(_.length)
      nSrc.foreach { case (s, total) =>
        val expect = cut.toDouble * total / n
        val got = pref.getOrElse(s, 0)
        assert(math.abs(got - expect) <= 2.0,
          s"source $s at prefix $cut: $got vs $expect")
      }
    }
    // per-source ranks are the dense sequence 1..n_src in emitted order
    rows.groupBy(_._2).foreach { case (s, rs) =>
      assert(rs.map(_._3).toSeq == (1L to rs.length).toSeq, s)
    }
    // deterministic: a second invocation is byte-identical
    val again = Layout.interleaveLayout(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    assert(rows.toSeq == again.toSeq)
  }

  test("property (seeded): interleave prefix proportionality holds on " +
    "skewed synthetic corpora and under salt changes") {
    import spark.implicits._
    val rng = new scala.util.Random(1234)
    (1 to 5).foreach { trial =>
      // skewed mixture: one dominant source, several small ones
      val shares = Seq(60 + rng.nextInt(40)) ++
        Seq.fill(2 + rng.nextInt(4))(1 + rng.nextInt(12))
      val docs = shares.zipWithIndex.flatMap { case (sz, s) =>
        Seq.fill(sz)(s"src$s")
      }.zipWithIndex.map { case (src, i) => (i.toLong + 1000L, src) }
      val df = docs.toDF("doc_id", "source")
      Seq("s42", s"t$trial").foreach { salt =>
        val rows = graft.ext.Layout.interleaveOf(df, salt).collect()
          .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        val n = rows.length
        assert(n == docs.length, s"trial $trial")
        val sizes = docs.groupBy(_._2).view.mapValues(_.size).toMap
        Seq(n / 5, n / 3, n / 2, 3 * n / 4, n - 1).foreach { cut =>
          val pref = rows.take(cut).groupBy(_._2).view.mapValues(_.length)
          sizes.foreach { case (s, tot) =>
            val expect = cut.toDouble * tot / n
            assert(math.abs(pref.getOrElse(s, 0) - expect) <= 2.0,
              s"trial $trial salt $salt source $s cut $cut")
          }
        }
        rows.groupBy(_._2).foreach { case (s, rs) =>
          assert(rs.map(_._3).toSeq == (1L to rs.length).toSeq,
            s"trial $trial $s ranks")
        }
      }
      // different salts permute WITHIN sources: same doc sets, and for
      // a multi-doc source some order differs with high probability
      val a = graft.ext.Layout.interleaveOf(df, "s42").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      val b = graft.ext.Layout.interleaveOf(df, "zz").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      assert(a.toSet == b.toSet)
    }
  }

  test("zorder manifest files have narrower time extents than range files") {
    val m = Layout.zOrderManifest(spark, sf).collect()
    val zSpans = m.filter(_.getString(0) == "zorder").map(_.getLong(7))
    val rSpans = m.filter(_.getString(0) == "range").map(_.getLong(7))
    assert(zSpans.nonEmpty && rSpans.nonEmpty)
    // every z-order file's tslot extent is narrower than every range
    // file's — the file-skipping claim, pinned as data not prose
    assert(zSpans.max < rSpans.min,
      s"zorder spans ${zSpans.toSeq} vs range ${rSpans.toSeq}")
  }

  test("salted join is value-identical to the plain join") {
    val salted = SkewJoin.saltedJoin(spark, sf).collect()
    val li = Ingest.table(spark, sf, "lineitem")
    val ord = Ingest.table(spark, sf, "orders")
    val plain = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("decimal(27,4)")).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(27,4)")).cast("double").as("sum_price"))
      .orderBy(col("o_orderpriority")).collect()
    assert(salted.toSeq === plain.toSeq)
  }

  test("salted join shuffles on (key, salt) when broadcast is impossible") {
    // at bench scale AQE broadcasts the tiny replicated dim (the right
    // call — salting is inert there); the salted key must engage exactly
    // when broadcast is off, i.e. the real-skew regime
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = SkewJoin.saltedJoin(spark, sf)
      df.collect()
      val finalPlan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(!finalPlan.contains("BroadcastHashJoin"), finalPlan)
      // the join keys include the salt — the hot-key spread claim
      assert("(SortMergeJoin|ShuffledHashJoin)".r.findFirstIn(finalPlan).isDefined,
        finalPlan)
      assert(finalPlan.contains("salt"), finalPlan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("bloom-pruned join equals the plain join and plans the bloom probe") {
    val df = SkewJoin.bloomPrunedJoin(spark, sf)
    val rows = df.collect()
    val li = Ingest.table(spark, sf, "lineitem")
    val ord = Ingest.table(spark, sf, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
    val plain = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("decimal(27,4)")).cast("double").as("sum_qty"))
      .orderBy(col("l_returnflag")).collect()
    assert(rows.toSeq === plain.toSeq)
    // the probe must sit in the plan as a pre-join filter (the native
    // might_contain expression), not get optimized away
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan)
  }

  test("bloom filter built from the dim side rejects most foreign keys") {
    graft.catalyst.Functions.register(spark)
    Ingest.table(spark, sf, "orders").createOrReplaceTempView("bf_ord")
    // keys NOT in the filtered dim should mostly fail the bloom probe —
    // i.e. the map-side prune does real work, it's not a pass-through
    val res = spark.sql(
      """WITH dim AS (SELECT o_orderkey FROM bf_ord
        |  WHERE o_orderpriority = '1-URGENT'),
        |probe AS (SELECT o_orderkey, o_orderpriority = '1-URGENT' AS in_dim,
        |  graft_bloom_contains(
        |    (SELECT graft_bloom_agg(xxhash64(o_orderkey)) FROM dim),
        |    xxhash64(o_orderkey)) AS hit FROM bf_ord)
        |SELECT
        |  sum(CASE WHEN in_dim AND NOT hit THEN 1 ELSE 0 END) AS false_neg,
        |  sum(CASE WHEN NOT in_dim AND hit THEN 1 ELSE 0 END) AS false_pos,
        |  sum(CASE WHEN NOT in_dim THEN 1 ELSE 0 END) AS negatives
        |FROM probe""".stripMargin).head
    assert(res.getLong(0) === 0L, "bloom filters never have false negatives")
    assert(res.getLong(1) < res.getLong(2) / 10,
      s"bloom should prune >90% of non-members: fp=${res.getLong(1)} of ${res.getLong(2)}")
  }

  test("boilerplate removal reconstructs documents exactly when nothing is dropped") {
    // minDfFrac > 1 means no span can qualify — reassembly must be the
    // identity (spans partition the token list; order restored by pos)
    val out = Curation.cleanBoilerplate(spark, sf, k = 3, minDfFrac = 1.1)
    val expected = Ingest.table(spark, sf, "documents")
      .select(col("doc_id"), md5(col("text")).as("want_md5"))
    val joined = out.join(expected, Seq("doc_id"))
    assert(joined.filter(col("n_spans_dropped") =!= 0L).count() === 0L)
    assert(joined.filter(col("cleaned_md5") =!= col("want_md5")).count() === 0L)
  }

  test("boilerplate removal drops shared spans but keeps every document") {
    val out = Curation.cleanBoilerplate(spark, sf).cache()
    val nDocs = Ingest.table(spark, sf, "documents").count()
    assert(out.count() === nDocs)
    val dropped = out.agg(sum(col("n_spans_dropped"))).head.getLong(0)
    assert(dropped > 0, "the sf0.001 corpus is known to share trigram spans")
    // untouched docs still hash to their original text
    val expected = Ingest.table(spark, sf, "documents")
      .select(col("doc_id"), md5(col("text")).as("want_md5"))
    val clean = out.filter(col("n_spans_dropped") === 0L)
      .join(expected, Seq("doc_id"))
    assert(clean.filter(col("cleaned_md5") =!= col("want_md5")).count() === 0L)
    out.unpersist()
  }

  test("inverted index: df counts every posting, the list is capped and sorted") {
    val idx = TextAnalysis.invertedIndex(spark, sf, maxPostings = 8,
      topTerms = 50).collect()
    // the sf0.001 vocabulary is smaller than the term limit — every
    // distinct token must then be present
    val vocab = TextAnalysis.documents(spark, sf)
      .select(explode(split(col("text"), " "))).distinct().count()
    assert(idx.length === math.min(vocab, 50L).toInt)
    idx.foreach { r =>
      val df = r.getLong(1)
      val postings = r.getString(2).split(",").filter(_.nonEmpty).map(_.toLong)
      assert(postings.length === math.min(df, 8L).toInt, r.toString)
      assert(postings.toSeq === postings.sorted.toSeq, r.toString)
    }
    // df ordering is descending
    val dfs = idx.map(_.getLong(1)).toSeq
    assert(dfs === dfs.sortBy(-_))
  }

  test("inverted index reuses one token exchange for window + aggregate") {
    val df = TextAnalysis.invertedIndex(spark, sf)
    df.collect()
    val finalPlan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val exchanges = "Exchange [a-z]*partitioning".r.findAllIn(finalPlan).size
    // one hash exchange on token (window + groupBy share it); the top-k
    // tail is TakeOrderedAndProject, not a global sort exchange
    assert(exchanges === 1, s"expected 1 exchange, got $exchanges\n$finalPlan")
    assert(finalPlan.contains("TakeOrderedAndProject"), finalPlan)
  }
}
