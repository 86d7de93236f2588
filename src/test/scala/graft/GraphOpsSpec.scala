package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.GraphOps

class GraphOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** Scalar twin of GraphOps.pageRank — same fixed-point formula, plain
    * Scala Maps. The spec's ground truth.
    */
  private def refPageRank(edges: Seq[(String, String)], iters: Int): Map[String, Long] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    val outdeg = e.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    var rank = nodes.map(_ -> GraphOps.Scale).toMap
    for (_ <- 1 to iters) {
      val in = e
        .map { case (s, d) => d -> rank(s) / outdeg(s) }
        .groupBy(_._1)
        .map { case (d, cs) => d -> cs.map(_._2).sum }
      rank = nodes.map(n => n -> (150000L + 85L * in.getOrElse(n, 0L) / 100L)).toMap
    }
    rank
  }

  private val diamond = Seq(
    ("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("d", "a")
  )

  test("pageRank matches the scalar fixed-point reference on a small graph") {
    val got = GraphOps
      .pageRank(diamond.toDF("src", "dst"), "src", "dst", iters = 4)
      .as[(String, Long)]
      .collect()
      .toMap
    assert(got == refPageRank(diamond, 4))
  }

  test("pageRank is bit-identical across partitionings and duplicate edges") {
    // duplicated edge rows must collapse (DISTINCT) before degree counting
    val dup = (diamond ++ diamond ++ Seq(("b", "d"))).toDF("src", "dst")
    val r1 = GraphOps.pageRank(dup.repartition(1), "src", "dst", 3).as[(String, Long)].collect().toMap
    val r7 = GraphOps.pageRank(dup.repartition(7), "src", "dst", 3).as[(String, Long)].collect().toMap
    assert(r1 == r7)
    assert(r1 == refPageRank(diamond, 3))
  }

  test("dangling nodes keep base rank; sinks accumulate") {
    // x -> y : y is dangling (no outgoing). After 1 round:
    //   x = 150000 (no incoming), y = 150000 + 85 * (Scale / 1) / 100
    val got = GraphOps
      .pageRank(Seq(("x", "y")).toDF("src", "dst"), "src", "dst", iters = 1)
      .as[(String, Long)]
      .collect()
      .toMap
    assert(got("x") == 150000L)
    assert(got("y") == 150000L + 85L * GraphOps.Scale / 100L)
  }

  test("pageRank == scalar reference on seeded random graphs (incl. self-loops)") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 4) {
      val n = 5 + rnd.nextInt(8)
      val edges = (1 to n * 2).map(_ => (s"n${rnd.nextInt(n)}", s"n${rnd.nextInt(n)}"))
      val iters = 1 + rnd.nextInt(3)
      val got = GraphOps
        .pageRank(edges.toDF("src", "dst"), "src", "dst", iters)
        .as[(String, Long)]
        .collect()
        .toMap
      assert(got == refPageRank(edges, iters), s"trial $trial: n=$n iters=$iters")
    }
  }

  test("personalized PageRank: mass flows only from seeds; unreachable nodes rank 0") {
    // a -> b -> c, plus isolated pair x -> y. Seed = {a}.
    val edges = Seq(("a", "b"), ("b", "c"), ("x", "y")).toDF("src", "dst")
    val g = graft.operators.GraphOps.prepare(edges, "src", "dst")
    val got = graft.operators.GraphOps
      .pageRankOn(g, iters = 3, seeds = Some(Seq("a").toDF("node")))
      .as[(String, Long)]
      .collect()
      .toMap
    // scalar twin with seed-gated base/init
    val e = Seq(("a", "b"), ("b", "c"), ("x", "y"))
    val outdeg = e.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    var rank = Map("a" -> 1000000L, "b" -> 0L, "c" -> 0L, "x" -> 0L, "y" -> 0L)
    for (_ <- 1 to 3) {
      val in = e.map { case (s, d) => d -> rank(s) / outdeg(s) }
        .groupBy(_._1).map { case (d, cs) => d -> cs.map(_._2).sum }
      rank = rank.keys.map { n =>
        val base = if (n == "a") 150000L else 0L
        n -> (base + 85L * in.getOrElse(n, 0L) / 100L)
      }.toMap
    }
    assert(got == rank, s"got $got expected $rank")
    // the x/y component never receives mass
    assert(got("x") == 0L && got("y") == 0L)
    assert(got("a") > 0L && got("b") > 0L && got("c") > 0L)
  }

  test("reliable-checkpoint mode: identical results, durable files written") {
    // durability contract (VERDICT r4 #4): with a checkpoint dir set on
    // the context, iterative operators pin rounds via reliable
    // checkpoint() (survives executor loss on a cluster) instead of
    // executor-local blocks. Results must be bit-identical in both modes.
    val sc = spark.sparkContext
    val edges = diamond.toDF("src", "dst")
    val pairs = Seq(("a", "b"), ("b", "c"), ("x", "y")).toDF("id_a", "id_b")
    val nodes = Seq("a", "b", "c", "x", "y", "z").toDF("id")

    val ranksLocal = GraphOps.pageRank(edges, "src", "dst", 3).as[(String, Long)].collect().toMap
    val ccLocal = graft.operators.Dedup.nearDupClusters(nodes, "id", pairs)
      .as[(String, String)].collect().toMap

    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt")
    sc.setCheckpointDir(dir.toString)
    try {
      val ranksRel = GraphOps.pageRank(edges, "src", "dst", 3).as[(String, Long)].collect().toMap
      val ccRel = graft.operators.Dedup.nearDupClusters(nodes, "id", pairs)
        .as[(String, String)].collect().toMap
      assert(ranksRel == ranksLocal, "pageRank must not depend on checkpoint mode")
      assert(ccRel == ccLocal, "nearDupClusters must not depend on checkpoint mode")
      // the reliable mode REALLY wrote checkpoint data to the dir
      val wrote = java.nio.file.Files.walk(dir)
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(wrote > 0, "reliable mode must write checkpoint files")
      // superseded rounds' FILES were deleted too (Checkpoints.release):
      // only the final rounds + prepared-graph pins remain, not one
      // file-set per iteration
      val rddDirs = java.nio.file.Files.walk(dir, 2)
        .filter(p => p.getFileName.toString.startsWith("rdd-")).count()
      assert(rddDirs <= 10, s"released rounds must delete their checkpoint files (found $rddDirs rdd dirs)")
    } finally {
      // restore block-based mode for the rest of the shared-session suite
      classOf[org.apache.spark.SparkContext]
        .getMethod("checkpointDir_$eq", classOf[Option[_]])
        .invoke(sc, None)
    }
  }

  test("null endpoints are dropped, not nodes") {
    val withNulls = Seq(
      (Some("a"), Some("b")),
      (None, Some("z")),
      (Some("z"), None)
    ).toDF("src", "dst")
    val nodes = GraphOps.pageRank(withNulls, "src", "dst", 1).select("node").as[String].collect().toSet
    assert(nodes == Set("a", "b"))
  }

  test("triangles: K4 has 4, squares have none, duplicates/direction don't matter") {
    def tri(edges: Seq[(Long, Long)]) =
      GraphOps.triangles(edges.toDF("s", "d"), "s", "d")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(tri(k4) == Set((1L, 2L, 3L), (1L, 2L, 4L), (1L, 3L, 4L), (2L, 3L, 4L)))
    // 4-cycle: no triangle; adding one diagonal makes exactly two
    val square = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    assert(tri(square).isEmpty)
    assert(tri(square :+ (1L -> 3L)) == Set((1L, 2L, 3L), (1L, 3L, 4L)))
    // reversed duplicates, self-loops, repeats: normalized away
    val messy = k4 ++ k4.map(_.swap) ++ Seq((2L, 2L), (1L, 2L))
    assert(tri(messy) == tri(k4))
  }

  test("triangles match a brute-force reference on a random graph") {
    val rnd = new scala.util.Random(13)
    val edges = (1 to 120).map(_ => (rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
    val got = GraphOps.triangles(edges.toDF("s", "d"), "s", "d")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val und = edges.collect { case (a, b) if a != b => (math.min(a, b), math.max(a, b)) }.toSet
    val nodes = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val expected = (for {
      a <- nodes; b <- nodes if a < b && und((a, b))
      c <- nodes if b < c && und((b, c)) && und((a, c))
    } yield (a, b, c)).toSet
    assert(got == expected, s"got ${got.size}, expected ${expected.size}")
  }

  test("triangles edgesAreDistinct=true equals the default on a pre-distinct edge list (r18)") {
    val rnd = new scala.util.Random(29)
    val edges = (1 to 150)
      .map(_ => (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
      .collect { case (a, b) if a != b => (math.min(a, b), math.max(a, b)) }
      .distinct // one row per undirected pair, u < v — the caller contract
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val slow = collect(GraphOps.triangles(edges.toDF("s", "d"), "s", "d"))
    val fast = collect(
      GraphOps.triangles(edges.toDF("s", "d"), "s", "d", edgesAreDistinct = true))
    assert(fast == slow, s"fast ${fast.size} vs slow ${slow.size}")
  }
}
