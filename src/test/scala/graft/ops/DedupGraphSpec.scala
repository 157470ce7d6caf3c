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

  test("random graphs match a driver-side union-find oracle") {
    val rnd = new scala.util.Random(7)
    (1 to 3).foreach { _ =>
      val n = 40
      val edges = Seq.fill(50)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // union-find reference
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val want = nodes.map { v =>
        v -> nodes.filter(u => find(u) == find(v)).min
      }.toMap
      assert(cc(edges) == want)
    }
  }
}
