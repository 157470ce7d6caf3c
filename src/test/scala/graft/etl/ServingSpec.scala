package graft.etl

import graft.SparkSpec

/** §2.5 serving shims: V1 extension classify, V4 result marshal, V7 table
  * render — the data-transformation halves of server.js / table.js.
  */
class ServingSpec extends SparkSpec {

  test("V1: extension classification matches server.js:20-24") {
    assert(Serving.classifyExtension("a.csv") == "csv")
    assert(Serving.classifyExtension("B.JSON") == "json")
    assert(Serving.classifyExtension("notes.txt") == "txt")
    assert(Serving.classifyExtension("doc.pdf") == "txt") // else-branch
    assert(Serving.classifyExtension("noext") == "txt")
  }

  test("V4/V7: marshal + render serve the pipeline output string-typed with NA as ''") {
    import spark.implicits._
    val docs = Seq((1L, """[{"a": 1, "b": "x"}, {"a": null, "b": "True"}]"""))
      .toDF("doc_id", "text")
    val result = DocumentEtl.run(spark, docs)

    val m = Serving.marshal(result).asInstanceOf[JObj].fields.toMap
    assert(m("success") == JBool(true))
    val rows = m("table").asInstanceOf[JArr].items.map(_.asInstanceOf[JObj].fields.toMap)
    assert(rows.nonEmpty)
    // every served value is a string; NA cells render '' like `?? ''`
    assert(rows.forall(_.values.forall(_.isInstanceOf[JStr])))
    val aVals = rows.map(r => r("a").asInstanceOf[JStr].s)
    assert(aVals.contains(""), aVals) // the null "a" cell serves as ''
    assert(m("schema").asInstanceOf[JObj].fields.exists(_._1 == "fields"))

    val html = Serving.renderHtmlTable(result)
    assert(html.startsWith("<table><thead><tr><th>"))
    result.columns.foreach(c => assert(html.contains(s"<th>$c</th>"), c))
    assert(html.contains("<td></td>")) // the NA cell
    assert(html.endsWith("</tbody></table>"))
    // row count: one <tr> per served row plus the header row
    assert(html.sliding(4).count(_ == "<tr>") == rows.size + 1)
  }
}
