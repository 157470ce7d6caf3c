package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** End-to-end golden test: DocumentEtl vs the reference pipeline's actual
  * output (extract → normalize → flatten → schema) on the fixture corpus,
  * captured by tools/ref_golden.py. Exact on every cell, column order, and
  * schema field except the explicitly listed deviations.
  */
class PipelineGoldenSpec extends SparkSpec {

  private val goldens: JObj = {
    val in = getClass.getResourceAsStream("/goldens/pipeline_goldens.json")
    Json.parse(new String(in.readAllBytes(), "UTF-8")).asInstanceOf[JObj]
  }

  /** fixture → column → expected voted type where we consciously deviate.
    * Empty since the battery gained the dateutil negative-number shapes
    * (Dates.NegNumDateRe) — "-5"/"-12.5" now vote date, like the reference.
    */
  private val typeDeviations: Map[String, Map[String, String]] = Map.empty

  /** golden JSON value → expected JSON-cell string (None/NaN → null cell). */
  private def expectedCell(v: JVal): Option[String] = v match {
    case JNull => None
    case JObj(Vector(("__nan__", JBool(true)))) => None
    case other => Some(Json.render(other))
  }

  for (fixtureName <- Seq("f1_flat_json", "f2_nested_json", "f3_mixed_no_html",
      "f4_norm_torture", "f5_empty")) {
    test(s"pipeline matches reference golden: $fixtureName") {
      val g = goldens.fields.toMap.apply(fixtureName).asInstanceOf[JObj].fields.toMap
      val inputText = g("input").asInstanceOf[JStr].s
      val expCols = g("columns").asInstanceOf[JArr].items.map(_.asInstanceOf[JStr].s)
      val expRows = g("rows").asInstanceOf[JArr].items.map(_.asInstanceOf[JObj])
      val expSchema = g("schema").asInstanceOf[JObj].fields.toMap

      import spark.implicits._
      val docs = Seq((0L, inputText)).toDF("doc_id", "text")
      val res = DocumentEtl.run(spark, docs)

      assert(res.columns == expCols, s"column mismatch: got ${res.columns}")

      val rows = res.table.orderBy(col("row_idx")).collect()
      assert(rows.length == expRows.length, s"row count: got ${rows.length} want ${expRows.length}")
      val failures = Vector.newBuilder[String]
      rows.zip(expRows).zipWithIndex.foreach { case ((row, exp), i) =>
        val expMap = exp.fields.toMap
        expCols.foreach { c =>
          val got = Option(row.getAs[String](c))
          val want = expectedCell(expMap(c))
          if (got != want)
            failures += s"row $i col $c: got ${got.orNull} want ${want.orNull}"
        }
      }
      assert(failures.result().isEmpty, failures.result().take(20).mkString("\n"))

      // schema fields
      val dev = typeDeviations.getOrElse(fixtureName, Map.empty)
      val expFields = expSchema("fields").asInstanceOf[JArr].items.map(_.asInstanceOf[JObj].fields.toMap)
      assert(res.schema.fields.length == expFields.length)
      res.schema.fields.zip(expFields).foreach { case (mine, expF) =>
        val name = expF("name").asInstanceOf[JStr].s
        assert(mine.name == name)
        val expType = dev.getOrElse(name, expF("type").asInstanceOf[JStr].s)
        assert(mine.tpe == expType, s"col $name type: got ${mine.tpe} want $expType")
        assert(mine.nullable == expF("nullable").asInstanceOf[JBool].b, s"col $name nullable")
        val expConf = expF("confidence") match {
          case JFloat(d) => d; case JInt(i) => i.toDouble; case _ => 1.0
        }
        assert(math.abs(mine.confidence - expConf) < 1e-12, s"col $name confidence: got ${mine.confidence} want $expConf")
        val expExamples = expF("examples").asInstanceOf[JArr].items.map {
          case JObj(Vector(("__nan__", JBool(true)))) => JNull
          case x => x
        }
        assert(mine.examples == expExamples, s"col $name examples: got ${mine.examples.map(Json.render)} want ${expExamples.map(Json.render)}")
      }
      val expPk = expSchema("primary_key_candidates").asInstanceOf[JArr].items.map(_.asInstanceOf[JStr].s)
      assert(res.schema.primaryKeyCandidates == expPk,
        s"pk: got ${res.schema.primaryKeyCandidates} want $expPk")
    }
  }

  test("schema registry round-trip + diff detects drift") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-registry").toString
    val docs1 = Seq((0L, """[{"id": 1, "name": "A"}, {"id": 2, "name": "B"}]""")).toDF("doc_id", "text")
    val r1 = DocumentEtl.run(spark, docs1, "src1", Some(dir))
    assert(r1.diff.isEmpty)
    val reg = new SchemaRegistry(dir)
    assert(reg.load("src1").map(_.fields.map(_.name)).contains(r1.schema.fields.map(_.name)))

    val docs2 = Seq((0L, """[{"id": 1, "extra": true}, {"id": 2, "extra": false}]""")).toDF("doc_id", "text")
    val r2 = DocumentEtl.run(spark, docs2, "src1", Some(dir))
    assert(r2.diff.isDefined)
    val rendered = Json.render(r2.diff.get)
    assert(rendered.contains("values_changed") || rendered.contains("iterable_item"))
  }
}
