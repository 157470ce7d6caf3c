package graft.etl

import org.apache.spark.sql.functions._

/** Engine-side analogues of the reference's serving shims (SURVEY §2.5) —
  * the pieces of `server.js` / `frontend/table.js` whose behavior is data
  * transformation rather than HTTP plumbing:
  *
  *   - V1 upload classify: extension → csv/json/txt (server.js:20-24);
  *   - V4 result marshal: served rows as JSON objects with the schema
  *     attached (server.js:58-66, csvjson().fromFile semantics — every
  *     cell a string, missing → '');
  *   - V7 table render: first row's keys as the header, `val ?? ''` per
  *     cell, NO escaping (table.js:56-68 writes template literals raw —
  *     reproduced faithfully, so treat the output as trusted-content HTML
  *     exactly like the reference does).
  *
  * The upload/rename/spawn/download halves of V1-V6 are HTTP orchestration
  * (multer, fs.renameSync, child spawn) — out of engine scope by SURVEY
  * §2.5; V2's config mutation is [[RunConfig]] as a per-run parameter.
  */
object Serving {

  /** V1 — the reference's extension classifier: `.csv` → csv, `.json` →
    * json, anything else (including no extension) → txt.
    */
  def classifyExtension(filename: String): String = {
    val dot = filename.lastIndexOf('.')
    val ext = if (dot < 0) "" else filename.substring(dot).toLowerCase(java.util.Locale.ROOT)
    ext match {
      case ".csv" => "csv"
      case ".json" => "json"
      case _ => "txt"
    }
  }

  /** Serving rows: the first `n` output rows in `row_idx` order, cells
    * rendered exactly like the CSV sink (pandas to_csv semantics) — the
    * string-typed view a reader of output.csv gets. NA renders '' (the
    * `?? ''` / csvjson missing-value reading).
    */
  private def servedRows(result: DocumentEtl.Result, n: Int): Seq[Seq[String]] = {
    import graft.etl.{EtlUdfs => U}
    result.table
      .orderBy(col("row_idx"))
      .limit(n)
      .select(result.columns.map(c => coalesce(U.renderCell(col(s"`$c`")), lit("")).as(c)): _*)
      .collect()
      .map(r => result.columns.map(c => r.getAs[String](c)))
  }

  /** V4 — `{success: true, table: [...], schema: {...}}` exactly like the
    * reference's success response: rows as objects keyed by column, every
    * value a string.
    */
  def marshal(result: DocumentEtl.Result, n: Int = 1000): JVal = {
    val rows = servedRows(result, n).map { cells =>
      JObj(result.columns.zip(cells.map(JStr.apply)).toVector)
    }
    JObj(Vector(
      "success" -> JBool(true),
      "table" -> JArr(rows.toVector),
      "schema" -> result.schema.toJson))
  }

  /** V7 — `renderTable` (table.js:56-68): `<th>` per first-row key, `<td>`
    * per cell with `val ?? ''`, raw (unescaped) values.
    */
  def renderHtmlTable(result: DocumentEtl.Result, n: Int = 1000): String = {
    val rows = servedRows(result, n)
    val sb = new StringBuilder("<table><thead><tr>")
    result.columns.foreach(c => sb.append("<th>").append(c).append("</th>"))
    sb.append("</tr></thead><tbody>")
    rows.foreach { cells =>
      sb.append("<tr>")
      cells.foreach(v => sb.append("<td>").append(v).append("</td>"))
      sb.append("</tr>")
    }
    sb.append("</tbody></table>").toString
  }
}
