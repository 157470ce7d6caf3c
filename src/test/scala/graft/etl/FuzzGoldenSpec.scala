package graft.etl

import graft.SparkSpec

/** Regression: 60 randomized documents (tools/fuzz_parity.py seed 42) whose
  * goldens were captured from the live reference pipeline — the corpus that
  * surfaced the json_normalize column-order rule, the is_numeric_dtype
  * dtype-name quirk, the single/multi/empty-list notna behaviors, the
  * post-normalize float coercion, and pandas' exact NA-token matching.
  */
class FuzzGoldenSpec extends SparkSpec {
  test("all 60 fuzz fixtures match the reference cell-for-cell") {
    val in = getClass.getResourceAsStream("/goldens/fuzz_goldens.json")
    val goldens = Json.parse(new String(in.readAllBytes(), "UTF-8")).asInstanceOf[JObj]
    val failures = goldens.fields.flatMap { case (name, g) =>
      val ps = graft.FuzzCheck.compareFixture(spark, g.asInstanceOf[JObj])
      if (ps.nonEmpty) Some(s"$name: ${ps.take(3).mkString("; ")}") else None
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
