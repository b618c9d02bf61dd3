package graft.operators

import graft.SparkSpec

/** Unit coverage for the large-star/small-star connected-components core
  * behind `dedup_cluster_cc` (DedupOps.ccRoots): the oracle pins the
  * end-to-end query; these pin the graph algorithm on shapes the testdata
  * does not contain — long chains (many rounds), multiple components,
  * cycles, and an empty edge set.
  */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def roots(edges: Seq[(Long, Long)]): Map[Long, Long] =
    DedupOps.ccRoots(edges.toDF("u", "v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain collapses to its minimum (diameter >> rounds)") {
    // path 0-1-2-...-40: min-label propagation would need 40 rounds; the
    // star alternation must finish inside ccRoots' 15-round guard
    val chain = (0L until 40L).map(i => (i, i + 1))
    val r = roots(chain)
    assert((1L to 40L).forall(r(_) == 0L))
    assert(!r.contains(0L)) // the root is not its own child
  }

  test("multiple components, cycles, and duplicate edges") {
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 1L), (3L, 1L), // triangle + dup edge
      (10L, 11L),                             // pair
      (20L, 22L), (22L, 21L), (21L, 20L))     // cycle listed out of order
    val r = roots(edges)
    assert(r == Map(2L -> 1L, 3L -> 1L, 11L -> 10L, 21L -> 20L, 22L -> 20L))
  }

  test("empty edge set yields no roots") {
    assert(roots(Seq.empty).isEmpty)
  }

  test("star input is already a fixpoint") {
    val r = roots(Seq((5L, 6L), (5L, 7L), (5L, 8L)))
    assert(r == Map(6L -> 5L, 7L -> 5L, 8L -> 5L))
  }
}
