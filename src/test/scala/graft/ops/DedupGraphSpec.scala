package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Connected components: correctness on known graphs, including a chain
  * whose diameter forces multiple propagation rounds.
  */
class DedupGraphSpec extends SparkSpec {

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    DedupGraph.connectedComponents(edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("two separate components + a bridge node") {
    val got = cc(Seq((1L, 2L), (2L, 3L), (10L, 11L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("long chain converges to the min endpoint (diameter > 1 round)") {
    val chain = (1L until 12L).map(i => (i, i + 1))
    val got = cc(chain)
    assert(got.values.toSet == Set(1L))
    assert(got.keySet == (1L to 12L).toSet)
  }

  test("cycle plus tail, min id in the middle") {
    val got = cc(Seq((5L, 7L), (7L, 9L), (9L, 5L), (9L, 2L), (30L, 31L)))
    assert(got(5L) == 2L && got(7L) == 2L && got(9L) == 2L && got(2L) == 2L)
    assert(got(30L) == 30L && got(31L) == 30L)
  }

  test("isolated edge keeps both endpoints") {
    val got = cc(Seq((42L, 41L)))
    assert(got == Map(42L -> 41L, 41L -> 41L))
  }
}
