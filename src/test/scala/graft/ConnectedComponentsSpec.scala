package graft

import org.apache.spark.sql.functions._

import graft.dedup.ConnectedComponents

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  // gate 0 forces the DISTRIBUTED star rounds — the spec's directed
  // cases (chains, paths, maxIter exhaustion) are about that path; the
  // size-gated local union-find has its own tests below
  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents
      .connectedComponents(edges.toDF("a", "b"), "a", "b",
                           localSolveMaxEdges = 0L)
      .as[(Long, Long)].collect().toMap

  test("single edge → one component rooted at min") {
    assert(cc(Seq((5L, 3L))) === Map(5L -> 3L, 3L -> 3L))
  }

  test("transitive chain collapses (the case pairwise dedup misses)") {
    // 1-3, 3-2: no direct 1-2 edge, still one cluster rooted at 1
    assert(cc(Seq((3L, 1L), (3L, 2L))) ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("long path needs multiple rounds and still roots at min") {
    // path 9-8-7-…-0 (diameter 9): exercises the iteration, not just
    // one large/small-star pass
    val path = (0L until 9L).map(i => (i, i + 1))
    val got = cc(path)
    assert(got === (0L to 9L).map(_ -> 0L).toMap)
  }

  test("separate components stay separate; duplicate + swapped edges ok") {
    val got = cc(Seq((1L, 2L), (2L, 1L), (1L, 2L), (7L, 9L), (9L, 8L)))
    assert(got === Map(1L -> 1L, 2L -> 1L, 7L -> 7L, 8L -> 7L, 9L -> 7L))
  }

  test("maxIter exhaustion fails loudly instead of returning a wrong map") {
    val path = (0L until 9L).map(i => (i, i + 1)) // needs several rounds
    val ex = intercept[IllegalStateException] {
      ConnectedComponents.connectedComponents(
        path.toDF("a", "b"), "a", "b", maxIter = 1,
        localSolveMaxEdges = 0L).collect()
    }
    assert(ex.getMessage.contains("did not converge"))
    spark.catalog.clearCache()
  }

  test("size-gated local solve ≡ distributed rounds (the default path)") {
    // under the default gate every tiny non-star graph takes the driver
    // union-find; both paths must produce the identical (id, comp) set
    val graphs = Seq(
      (0L until 9L).map(i => (i, i + 1)),              // long path
      Seq((3L, 1L), (3L, 2L), (7L, 9L)),               // chain + pair
      (1L to 6L).map(i => (100L, i)))                  // max-id hub
    graphs.foreach { g =>
      val local = ConnectedComponents.connectedComponents(
        g.toDF("a", "b"), "a", "b")
        .as[(Long, Long)].collect().toMap
      assert(local === cc(g), s"paths disagree on $g")
    }
    spark.catalog.clearCache()
  }

  test("self-loops ignored; empty input → empty output") {
    assert(cc(Seq((4L, 4L))) === Map.empty)
    assert(cc(Seq.empty[(Long, Long)]) === Map.empty)
  }

  test("already-star-forest input converges with ZERO star rounds") {
    // disjoint pairs are a star forest; the round-0 structural check
    // accepts them immediately, so even maxIter=1 never throws and the
    // whole call costs one action
    val got = ConnectedComponents.connectedComponents(
      Seq((5L, 3L), (9L, 7L)).toDF("a", "b"), "a", "b", maxIter = 1,
      assumeDistinct = true)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(3L -> 3L, 5L -> 3L, 7L -> 7L, 9L -> 7L))
    spark.catalog.clearCache()
  }

  test("assumeDistinct abused with duplicate edges: still correct") {
    // a repeated edge reads as a spurious star violation → one extra
    // round (which distincts) — never a wrong component map
    val got = ConnectedComponents.connectedComponents(
      Seq((5L, 3L), (5L, 3L), (3L, 1L)).toDF("a", "b"), "a", "b",
      assumeDistinct = true)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 3L -> 1L, 5L -> 1L))
    spark.catalog.clearCache()
  }

  test("duplicateClusters elects canonical member with sorted members") {
    val pairs = Seq((10L, 30L), (30L, 20L), (40L, 50L))
      .toDF("id_a", "id_b")
    val got = ConnectedComponents.duplicateClusters(pairs)
      .orderBy("cluster_id")
      .as[(Long, Long, Seq[Long])].collect().toSeq
    assert(got === Seq((10L, 3L, Seq(10L, 20L, 30L)),
                       (40L, 2L, Seq(40L, 50L))))
    spark.catalog.clearCache() // release the internally persisted stars
  }

  test("randomized graphs match a union-find reference (3 seeds)") {
    for (seed <- Seq(7, 23, 101)) {
      val rnd = new scala.util.Random(seed)
      val n = 60
      // ~mixed topology: sparse random edges + one long chain + a clique
      val edges =
        Seq.fill(40)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)) ++
          (60L until 70L).sliding(2).map(s => (s(0), s(1))).toSeq ++
          (for (a <- 70L to 74L; b <- (a + 1) to 74L) yield (a, b))
      val valid = edges.filter { case (a, b) => a != b }

      // reference: classic union-find
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      valid.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      // canonical reference labels: min member per root group
      val expect = parent.keys.toSeq
        .groupBy(find).flatMap { case (_, members) =>
          val m = members.min
          members.map(_ -> m)
        }

      assert(cc(valid) === expect, s"seed=$seed")

      // the assumeDistinct fast path on properly canonical deduped
      // edges must agree with the reference too (the pair-generator
      // deployment shape)
      val canonical = valid.map { case (a, b) =>
        (math.max(a, b), math.min(a, b))
      }.distinct
      val gotFast = ConnectedComponents.connectedComponents(
        canonical.toDF("a", "b"), "a", "b", assumeDistinct = true)
        .as[(Long, Long)].collect().toMap
      assert(gotFast === expect, s"assumeDistinct seed=$seed")
      // same random graph through the forced-distributed rounds: the
      // size-gated local path (what gotFast took) and the star rounds
      // must agree exactly
      val gotDist = ConnectedComponents.connectedComponents(
        canonical.toDF("a", "b"), "a", "b", assumeDistinct = true,
        localSolveMaxEdges = 0L)
        .as[(Long, Long)].collect().toMap
      assert(gotDist === expect, s"distributed seed=$seed")
      spark.catalog.clearCache()
    }
  }

  test("star graph with hub as max id (stress on large-star direction)") {
    // hub 100 connected to 1..6 — one component rooted at 1
    val star = (1L to 6L).map(i => (100L, i))
    val got = cc(star)
    assert(got === ((1L to 6L) :+ 100L).map(_ -> 1L).toMap)
    spark.catalog.clearCache()
  }
}
