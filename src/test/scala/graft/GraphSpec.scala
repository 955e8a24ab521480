package graft

import graft.operators.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank one round, hand-computed: star inflow, dangling leak") {
    // a→b, c→b; N=3, base = 1e9/3 = 333333333
    // teleport = 15·base/100 = 49999999
    // r1(b) = teleport + 85·(333333333+333333333)/100 = 49999999+566666666
    // r1(a) = r1(c) = teleport (no in-edges; b's mass leaks — dangling)
    val edges = Seq((0L, 1L), (2L, 1L)).toDF("src", "dst")
    val got = Graph.pageRank(edges, "src", "dst", iters = 1)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 49999999L, 1L -> 616666665L, 2L -> 49999999L))
  }

  test("pageRank on a cycle stays near-uniform and deterministic across runs") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L)).toDF("src", "dst")
    val r5a = Graph.pageRank(edges, "src", "dst", iters = 5)
      .as[(Long, Long)].collect().toMap
    val r5b = Graph.pageRank(edges, "src", "dst", iters = 5)
      .as[(Long, Long)].collect().toMap
    assert(r5a == r5b) // integer arithmetic: bit-stable across runs
    // cycle symmetry: all three ranks identical
    assert(r5a.values.toSet.size == 1)
  }

  test("pageRank ranks a hub above leaves") {
    // everyone links to node 9
    val edges = (0L until 9L).map(i => (i, 9L)).toDF("src", "dst")
    val r = Graph.pageRank(edges, "src", "dst", iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(r(9L) > r(0L) * 5, s"hub should dominate: $r")
  }
}
