package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.graph.GraphOps

class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  private def edges(pairs: (Long, Long)*): DataFrame =
    pairs.toDF("src", "dst")

  // --- coPurchaseEdges ---

  test("coPurchaseEdges: basket pairs, src<dst, multi-edges collapse") {
    val li = Seq(
      (8L, 3L), (8L, 1L), (8L, 5L), // basket 8 -> (1,3),(1,5),(3,5)
      (9L, 1L), (9L, 3L),           // basket 9 -> (1,3) again (collapses)
      (10L, 7L)                     // singleton basket -> no pair
    ).toDF("l_orderkey", "l_partkey")
    val e = GraphOps.coPurchaseEdges(li).as[(Long, Long)].collect().toSet
    assert(e === Set((1L, 3L), (1L, 5L), (3L, 5L)))
  }

  test("coPurchaseEdges: modulus keeps only matching baskets") {
    val li = Seq((8L, 1L), (8L, 2L), (9L, 3L), (9L, 4L))
      .toDF("l_orderkey", "l_partkey")
    val e = GraphOps.coPurchaseEdges(li, modulus = 4)
      .as[(Long, Long)].collect().toSet
    assert(e === Set((1L, 2L))) // basket 9 % 4 != 0 dropped
  }

  // --- triangleStats ---

  private def triMap(e: DataFrame): Map[Long, (Long, Long, Option[Double])] =
    GraphOps.triangleStats(e)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))))
      .toMap

  test("triangles: K4 — every node 3 triangles, lcc 1.0") {
    val k4 = edges((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val m = triMap(k4)
    assert(m.keySet === Set(1L, 2L, 3L, 4L))
    m.values.foreach { case (deg, tri, lcc) =>
      assert(deg === 3L); assert(tri === 3L); assert(lcc === Some(1.0))
    }
  }

  test("triangles: path has none; deg-1 node gets null lcc") {
    val path = edges((1L, 2L), (2L, 3L), (3L, 4L))
    val m = triMap(path)
    assert(m.values.forall(_._2 == 0L))
    assert(m(1L)._3 === None) // deg 1: no wedge
    assert(m(2L)._3 === Some(0.0))
  }

  test("triangles: triangle + pendant — lcc drops on the loaded node") {
    // 1-2-3 triangle, 4 pendant on 1: node 1 deg 3, tri 1, lcc 1/3
    val g = edges((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L))
    val m = triMap(g)
    assert(m(1L) === ((3L, 1L, Some(0.333333))))
    assert(m(2L) === ((2L, 1L, Some(1.0))))
    assert(m(4L) === ((1L, 0L, None)))
  }

  test("triangles: degree-oriented count equals brute-force triple scan") {
    // deterministic pseudo-random graph on 12 nodes
    val pairs = (for {
      a <- 1L to 12L; b <- (a + 1) to 12L
      if ((a * 31 + b * 17) % 3) == 0
    } yield (a, b)).toSeq
    val adj = pairs.toSet
    val brute = (for {
      a <- 1L to 12L; b <- (a + 1) to 12L; c <- (b + 1) to 12L
      if adj((a, b)) && adj((b, c)) && adj((a, c))
    } yield (a, b, c)).toSeq
    val perNode = brute.flatMap(t => Seq(t._1, t._2, t._3))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val m = triMap(edges(pairs: _*))
    assert(brute.nonEmpty, "fixture must contain triangles")
    m.foreach { case (node, (_, tri, _)) =>
      assert(tri === perNode.getOrElse(node, 0L), s"node $node")
    }
  }

  // --- pageRank ---

  test("pageRank: ranks sum to ~1 and stay positive") {
    val g = edges((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
    val pr = GraphOps.pageRank(g, iters = 3).as[(Long, Double)].collect()
    val total = pr.map(_._2).sum
    assert(math.abs(total - 1.0) < 1e-6, s"sum $total")
    assert(pr.forall(_._2 > 0))
  }

  test("pageRank: vertex-transitive cycle gives equal ranks") {
    val cycle = edges((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 1L))
    val pr = GraphOps.pageRank(cycle, iters = 3)
      .as[(Long, Double)].collect().toMap
    assert(pr.values.toSet.size === 1)
    assert(pr(1L) === 0.2)
  }

  test("pageRank: star center outranks leaves") {
    val star = edges((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))
    val pr = GraphOps.pageRank(star, iters = 3)
      .as[(Long, Double)].collect().toMap
    assert(Seq(2L, 3L, 4L, 5L).forall(l => pr(1L) > pr(l)))
    assert(pr(2L) === pr(5L))
  }

  test("pageRank is structural: node relabeling permutes ranks exactly") {
    val g = edges((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L))
    val shifted = edges((1001L, 1002L), (1001L, 1003L), (1002L, 1003L),
                        (1003L, 1004L), (1004L, 1005L))
    val a = GraphOps.pageRank(g, iters = 3)
      .as[(Long, Double)].collect().toMap
    val b = GraphOps.pageRank(shifted, iters = 3)
      .as[(Long, Double)].collect().toMap
    assert(a.map { case (n, v) => (n + 1000L, v) } === b)
  }

  test("triangles: hub stress — star center collects exactly the " +
       "planted triangles, leaves at most one") {
    // star 1-(2..40) + a triangle-closing ring edge between leaves 2-3
    // and 4-5: center sits on exactly 2 triangles
    val star = (2L to 40L).map(l => (1L, l))
    val m = triMap(edges(star ++ Seq((2L, 3L), (4L, 5L)): _*))
    assert(m(1L)._2 === 2L)
    assert(m(2L) === ((2L, 1L, Some(1.0))))
    assert(m(6L)._2 === 0L)
  }

  // --- personalizedPageRank ---

  test("ppr: total mass stays ~1 (no dangling nodes, teleport to seeds)") {
    val g = edges((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
    val pr = GraphOps.personalizedPageRank(g, Seq(1L, 3L).toDF("node"),
        iters = 3)
      .as[(Long, Double)].collect()
    assert(math.abs(pr.map(_._2).sum - 1.0) < 1e-6)
  }

  test("ppr: mass stays reachable-from-seeds; other component ranks 0") {
    val g = edges((1L, 2L), (2L, 3L), (10L, 11L))
    val seeds = Seq(1L).toDF("node")
    val pr = GraphOps.personalizedPageRank(g, seeds, iters = 3)
      .as[(Long, Double)].collect().toMap
    assert(pr(10L) === 0.0 && pr(11L) === 0.0)
    assert(pr(1L) > 0 && pr(2L) > 0 && pr(3L) > 0)
  }

  test("ppr: out-of-graph seeds are ignored (teleport over the " +
       "intersection, the oracle's seed-spine semantics)") {
    val g = edges((1L, 2L), (2L, 3L))
    val withGhost = GraphOps.personalizedPageRank(g,
      Seq(1L, 99L).toDF("node"), iters = 3)
      .as[(Long, Double)].collect().toMap
    val plain = GraphOps.personalizedPageRank(g,
      Seq(1L).toDF("node"), iters = 3)
      .as[(Long, Double)].collect().toMap
    assert(withGhost === plain)
  }

  test("ppr: matches an independent scalar replica on the same grid") {
    val g = edges((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
    val seedSet = Set(1L, 4L)
    val adj = Map(1L -> Seq(2L, 3L), 2L -> Seq(1L, 3L),
                  3L -> Seq(1L, 2L, 4L), 4L -> Seq(3L))
    def rnd(x: Double): Double =
      java.math.BigDecimal.valueOf(x)
        .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
    val c = seedSet.size.toDouble
    def tele(v: Long) = if (seedSet(v)) (1.0 - 0.85) / c else 0.0
    var r = adj.keys.map(v =>
      v -> (if (seedSet(v)) rnd(1.0 / c) else 0.0)).toMap
    for (_ <- 1 to 3) {
      r = adj.keys.map { v =>
        val s = adj.filter(_._2.contains(v))
          .map { case (u, nb) => r(u) / nb.size }.sum
        v -> rnd(tele(v) + 0.85 * s)
      }.toMap
    }
    val got = GraphOps.personalizedPageRank(g, seedSet.toSeq.toDF("node"),
        iters = 3)
      .as[(Long, Double)].collect().toMap
    assert(got === r)
  }

  test("pageRank: matches an independent scalar replica on the same grid") {
    val g = edges((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
    val iters = 3
    // replica: adjacency + the exact update/rounding the operator does
    val adj = Map(1L -> Seq(2L, 3L), 2L -> Seq(1L, 3L),
                  3L -> Seq(1L, 2L, 4L), 4L -> Seq(3L))
    val n = adj.size.toDouble
    // Spark's Round(double) goes through BigDecimal.valueOf (shortest
    // decimal repr), not the exact binary expansion — replicate that.
    def rnd(x: Double): Double =
      java.math.BigDecimal.valueOf(x)
        .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
    var r = adj.keys.map(_ -> rnd(1.0 / n)).toMap
    for (_ <- 1 to iters) {
      r = adj.keys.map { v =>
        val s = adj.filter(_._2.contains(v))
          .map { case (u, nb) => r(u) / nb.size }.sum
        v -> rnd((1.0 - 0.85) / n + 0.85 * s)
      }.toMap
    }
    val pr = GraphOps.pageRank(g, iters = iters)
      .as[(Long, Double)].collect().toMap
    assert(pr === r)
  }
}
