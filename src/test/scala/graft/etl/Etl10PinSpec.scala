package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** etl10_doc_pipeline has no SQL oracle (the doc pipeline is not
  * SQL-expressible); this spec pins its ENTIRE sf0.01 output — row count,
  * column list, and an md5 over the sorted rendered table — so any pipeline
  * drift fails fast and cell-exactly, not just rows>0.
  *
  * Regenerate the pin after an INTENDED semantics change with:
  *   GRAFT_PIN=1 sbt "testOnly graft.etl.Etl10PinSpec"
  */
class Etl10PinSpec extends SparkSpec {

  private val pinFile = "src/test/resources/goldens/etl10_sf0.01.pin"

  test("etl10 sf0.01 output matches the pinned fingerprint") {
    val res = DocumentEtl.run(
      spark,
      spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        .select(col("doc_id"), col("text")))
    val cols = Seq("doc_id", "row_idx") ++ res.columns
    val rows = res.table
      .orderBy(col("row_idx"))
      .select(cols.map(c => col(s"`$c`")): _*)
      .collect()
    val rendered = rows.map(r =>
      cols.indices.map(i => if (r.isNullAt(i)) "NULL" else r.get(i).toString)
        .mkString(""))
      .mkString("\n")
    val md = java.security.MessageDigest.getInstance("MD5")
    val hash = md.digest(rendered.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val actual = s"rows=${rows.length}\ncols=${cols.mkString(",")}\nmd5=$hash\n"

    if (sys.env.contains("GRAFT_PIN")) {
      Files.createDirectories(Paths.get(pinFile).getParent)
      Files.writeString(Paths.get(pinFile), actual)
      info(s"pinned: $actual")
    } else {
      assert(Files.exists(Paths.get(pinFile)),
        s"pin file missing — run GRAFT_PIN=1 sbt 'testOnly graft.etl.Etl10PinSpec'")
      val pinned = Files.readString(Paths.get(pinFile))
      assert(actual == pinned,
        s"etl10 output drifted from pin.\npinned:\n$pinned\nactual:\n$actual")
    }
  }
}
