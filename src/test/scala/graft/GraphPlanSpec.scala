package graft

import org.apache.spark.sql.DataFrame

import graft.graph.GraphOps

/** The edgeParts scale dial (GraphOps scaladoc): default 0 leaves the
  * plan adaptive (AQE coalesces/broadcasts the right-sized demo graph);
  * a positive width pins the canonical web-scale shape — edges cached
  * hash-partitioned on the join key, per-iteration joins shuffle-hash
  * with only the node-sized mass moving. Both regimes must be
  * bit-identical in RESULTS (same math, same rounding grid) and the
  * pinned regime must actually plan the shapes it promises.
  */
class GraphPlanSpec extends SparkSpec {
  import spark.implicits._

  private lazy val edges: DataFrame =
    GraphOps.coPurchaseEdges(
      Tables.load(spark, sfDir, "lineitem"), modulus = 6)

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("pageRank: adaptive and pinned regimes are bit-identical") {
    assert(rows(GraphOps.pageRank(edges)) ===
           rows(GraphOps.pageRank(edges, edgeParts = 4)))
  }

  test("personalizedPageRank: adaptive ≡ pinned") {
    val seeds = Seq(1L, 100L, 200L, 300L).toDF("node")
    assert(rows(GraphOps.personalizedPageRank(edges, seeds)) ===
           rows(GraphOps.personalizedPageRank(edges, seeds, edgeParts = 4)))
  }

  test("triangleStats: adaptive ≡ pinned") {
    assert(rows(GraphOps.triangleStats(edges)) ===
           rows(GraphOps.triangleStats(edges, edgeParts = 4)))
  }

  test("edge construction prunes the lineitem scan to the two keys") {
    val df = GraphOps.coPurchaseEdges(
      Tables.load(spark, sfDir, "lineitem"), modulus = 6)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("l_orderkey") && plan.contains("l_partkey"),
      s"basket/key columns must reach the scan:\n$plan")
    assert(!plan.contains("l_extendedprice") && !plan.contains("l_comment"),
      s"non-key lineitem columns must be pruned from the scan:\n$plan")
  }

  test("pinned pageRank plans shuffle-hash mass joins over the cache") {
    val df = GraphOps.pageRank(edges, edgeParts = 4)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"),
      s"pinned regime must keep the mass join shuffle-hash:\n$plan")
    assert(plan.contains("InMemoryTableScan"),
      s"edges must serve from cache:\n$plan")
    assert(!plan.contains("SortMergeJoin(src"),
      s"the cached edge side must never re-sort per iteration:\n$plan")
  }
}
