package graft

import org.apache.spark.sql.functions._

import graft.ext.TextDedup

/** Connected-components clustering over near-dup pair graphs
  * (TextDedup.clusters / nearDupClusters). Unit graphs exercise shapes
  * the sf corpora never produce (long paths, min-id at the far end);
  * the end-to-end case cross-checks the distributed label propagation
  * against a driver-side union-find on the same verified pairs.
  */
class DedupClusterSpec extends SparkTestBase {
  import spark.implicits._

  private def clustersOf(edges: Seq[(Long, Long)]): Map[Long, Long] =
    TextDedup.clusters(edges.toDF("d1", "d2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("path graph converges to the global min label") {
    // chain 1-2-…-8: diameter 7 forces multiple propagation rounds
    val labels = clustersOf((1L to 7L).map(i => (i, i + 1)))
    assert(labels == (1L to 8L).map(_ -> 1L).toMap)
  }

  test("min id at the far end of a path still wins") {
    val labels = clustersOf(Seq((5L, 6L), (4L, 5L), (3L, 4L), (9L, 6L), (2L, 9L)))
    assert(labels.values.toSet == Set(2L) && labels.keySet ==
      Set(2L, 3L, 4L, 5L, 6L, 9L))
  }

  test("disjoint components keep distinct labels") {
    val labels = clustersOf(Seq(
      (10L, 11L), (11L, 12L), (10L, 12L), // clique
      (20L, 21L),                         // pair
      (31L, 30L)))                        // reversed input order
    assert(labels == Map(10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L, 30L -> 30L, 31L -> 30L))
  }

  test("random graphs: label propagation equals union-find (seeded)") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 5) {
      val nodes = 5 + rnd.nextInt(36)
      val edges = (1 to nodes * 2).map { _ =>
        val a = rnd.nextInt(nodes).toLong
        val b = rnd.nextInt(nodes).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(e => e._1 != e._2).distinct
      if (edges.nonEmpty) {
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        // canonicalize union-find roots to the component MIN (find() roots
        // are order-dependent; min-label is what clusters() guarantees)
        val byRoot = parent.keys.toSeq.groupBy(find)
        val expected = byRoot.values.flatMap { ms =>
          val m = ms.min; ms.map(_ -> m)
        }.toMap
        assert(clustersOf(edges) == expected, s"trial $trial, $edges")
      }
    }
  }

  test("empty pair graph yields an empty result, not an NPE") {
    val empty = Seq.empty[(Long, Long)].toDF("d1", "d2")
    val labels = TextDedup.clusters(empty)
    assert(labels.collect().isEmpty)
    assert(labels.columns.toSeq == Seq("node", "lbl"))
    // end-to-end: a threshold no pair can reach → no pairs, no clusters
    assert(TextDedup.nearDupClusters(spark, "/root/testdata/sf0.001", 1.1)
      .collect().isEmpty)
  }

  test("nearDupClusters matches driver-side union-find at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val pairs = TextDedup.nearDupPairs(spark, dir, 0.5)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    // naive union-find oracle
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.toSeq.map(x => (find(x), x))
      .groupBy(_._1)
      .map { case (c, ms) => (c, ms.size.toLong, ms.map(_._2).max) }
      .toSeq.sortBy(_._1)
    val got = TextDedup.nearDupClusters(spark, dir, 0.5)
      .orderBy("cluster_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
    // every cluster is a genuine duplicate group
    assert(got.forall(_._2 >= 2))
  }

  test("survivorship partitions the corpus: every doc counted once, " +
    "keepers are cluster minima") {
    val dir = "/root/testdata/sf0.001"
    val surv = TextDedup.survivors(spark, dir, 0.5).collect()
    val nDocs = graft.ops.Ingest.table(spark, dir, "documents").count()
    // exhaustive and disjoint: member counts sum to the corpus
    assert(surv.map(_.getAs[Long]("n_members")).sum == nDocs)
    // the keeper is the least member: never above latest_member
    surv.foreach { r =>
      assert(r.getAs[Long]("keeper_doc_id") <= r.getAs[Long]("latest_member"))
      assert(r.getAs[String]("langs").nonEmpty)
    }
    // clustered keepers agree with nearDupClusters' labels
    val clusterIds = TextDedup.nearDupClusters(spark, dir, 0.5)
      .select("cluster_id").collect().map(_.getLong(0)).toSet
    val multi = surv.filter(_.getAs[Long]("n_members") >= 2)
      .map(_.getAs[Long]("keeper_doc_id")).toSet
    assert(clusterIds.subsetOf(multi))
  }
}
