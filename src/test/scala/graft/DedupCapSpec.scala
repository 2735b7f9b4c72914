package graft

import org.apache.spark.sql.functions._

import graft.ext.TextDedup

/** Pathological-boilerplate coverage for the deterministic bucket caps:
  * a degenerate LSH band bucket / simhash class far larger than the cap
  * must produce a bounded, deterministic candidate set (VERDICT r2 items
  * 1-2). Expected values follow the oracle semantics literally
  * (keep-first-K of the sorted ids == rank ≤ K over the same ordering),
  * so these double as cross-engine parity proxies for the capped regime
  * the sf data never reaches.
  */
class DedupCapSpec extends SparkTestBase {
  import spark.implicits._

  test("minhash band cap: >cap bucket keeps first K sorted ids only") {
    // ids deliberately unsorted on input; bucket of 8 with cap 5
    val bandRows = Seq(7L, 3L, 0L, 5L, 1L, 6L, 2L, 4L)
      .map(id => (id, 0, "deadbeef"))
      .toDF("doc_id", "band", "band_hash")
    val pairs = TextDedup.candidatePairsFromBands(bandRows, 5)
      .orderBy("d1", "d2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val expected = (for (a <- 0L to 4L; b <- (a + 1) to 4L) yield (a, b)).toSeq
    assert(pairs == expected) // 10 pairs over ids 0..4; ids 5..7 dropped
  }

  test("minhash band cap: production cap bounds a 1030-doc boilerplate bucket") {
    val k = TextDedup.maxBucket
    val bandRows = (0L until 1030L).map(id => (id, 1, "cafebabe"))
      .toDF("doc_id", "band", "band_hash")
    val pairs = TextDedup.candidatePairsFromBands(bandRows, k)
    val agg = pairs.agg(count(lit(1)), max(col("d2"))).collect()(0)
    assert(agg.getLong(0) == k.toLong * (k - 1) / 2) // ≤ K·(K−1)/2, exactly
    assert(agg.getLong(1) == k - 1L) // survivors are the first K sorted ids
  }

  test("simhash collapse: within-class, cross-class, and non-candidate classes") {
    // class X: 5 docs, class Y (hamming 1 from X, shares 3 chunks): 2 docs,
    // class Z (no shared chunk with X/Y): 1 doc
    val x = "0000000000000000"
    val y = "0000000000000001"
    val z = "ffffffffffffffff"
    val sh = (Seq(1L, 2L, 3L, 4L, 5L).map((_, x)) ++
      Seq(6L, 7L).map((_, y)) ++ Seq((8L, z))).toDF("doc_id", "simhash")
    val got = TextDedup.simhashPairsFromHashes(sh, 3, TextDedup.maxBucket)
      .orderBy("d1", "d2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    val withinX = for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b, 0)
    val withinY = Seq((6L, 7L, 0))
    val crossXY = for (a <- 1L to 5L; b <- 6L to 7L) yield (a, b, 1)
    val expected = (withinX ++ withinY ++ crossXY).sorted
    assert(got == expected)
  }

  test("simhash caps: member lists and chunk buckets keep first K sorted") {
    // class X overflows the member cap (5 members, cap 3): only docs
    // 1..3 survive; chunk bucket over reps overflows too (5 distinct
    // signatures sharing chunk 0 "aaaa", cap 3): only the 3 smallest
    // reps pair.
    val x = "aaaa000000000000" // docs 1..5 (rep 1)
    val hashes = Seq(
      "aaaa000000000001", // doc 10 (rep), hamming 1 vs x
      "aaaa000000000003", // doc 11 (rep), hamming 2 vs x
      "aaaa000000000007", // doc 12 (rep), hamming 3 vs x — bucket-capped out
      "aaaa00000000000f") // doc 13 (rep), hamming 4 vs x — bucket-capped out
    val sh = (Seq(1L, 2L, 3L, 4L, 5L).map((_, x)) ++
      hashes.zipWithIndex.map { case (h, i) => (10L + i, h) })
      .toDF("doc_id", "simhash")
    val got = TextDedup.simhashPairsFromHashes(sh, 4, cap = 3)
      .orderBy("d1", "d2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    // member cap: X members [1,2,3]; every shared chunk bucket holds reps
    // sorted [1,10,11,12,13] → cap 3 keeps [1,10,11], so 12/13 never pair
    def ham(a: String, b: String): Int = a.zip(b).map { case (c1, c2) =>
      Integer.bitCount(Integer.parseInt(c1.toString, 16) ^
        Integer.parseInt(c2.toString, 16))
    }.sum
    val withinX = Seq((1L, 2L, 0), (1L, 3L, 0), (2L, 3L, 0))
    val expected = (withinX ++
      Seq(1L, 2L, 3L).map(a => (a, 10L, ham(x, hashes(0)))) ++
      Seq(1L, 2L, 3L).map(a => (a, 11L, ham(x, hashes(1)))) ++
      Seq((10L, 11L, ham(hashes(0), hashes(1))))).sorted
    assert(got == expected)
  }

  test("simhash collapse+expand == uncapped brute force when no cap binds") {
    // deterministic pseudo-random 16-hex signatures incl. some duplicates
    val hashes = (0L until 40L).map { i =>
      val base = f"${i % 7}%x" * 4 + f"${(i * 31) % 16}%x" * 4 +
        f"${(i * 17) % 16}%x" * 4 + f"${(i * 13) % 16}%x" * 4
      (i, base)
    }
    val sh = hashes.toDF("doc_id", "simhash")
    val got = TextDedup.simhashPairsFromHashes(sh, 3, TextDedup.maxBucket)
      .orderBy("d1", "d2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    def chunks(h: String): Seq[String] = (0 until 4).map(c => h.substring(4 * c, 4 * c + 4))
    def ham(a: String, b: String): Int = a.zip(b).map { case (c1, c2) =>
      Integer.bitCount(Integer.parseInt(c1.toString, 16) ^
        Integer.parseInt(c2.toString, 16))
    }.sum
    val expected = (for {
      (a, ha) <- hashes; (b, hb) <- hashes
      if a < b
      if chunks(ha).zip(chunks(hb)).exists { case (x, y) => x == y }
      h = ham(ha, hb) if h <= 3
    } yield (a, b, h)).sorted
    assert(got == expected)
  }
}
