package graft.etl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** One extracted record on the wire: extraction sequence number + ordered
  * (key, JSON-encoded cell) entries. Arrays (not maps) so key ORDER survives
  * — the reference's output column order is first-appearance order.
  */
final case class RecEntry(k: String, v: String)
final case class ExtractedRec(seq: Int, entries: Seq[RecEntry])

/** Spark UDF wrappers around the pure-Scala ETL core. Each runs once per
  * document/cell on executors — no driver round-trips, no shuffle; the heavy
  * string work stays parallel and scales with input size.
  */
object EtlUdfs {

  /** document text → all extracted records (E1-E9). */
  val extractBlocks = udf { (text: String) =>
    Extract.extractAll(Option(text).getOrElse("")).zipWithIndex.map {
      case (rec, i) =>
        // python-dict semantics on key collisions (possible after `.`-path
        // flattening): keep LAST value, FIRST position.
        val order = scala.collection.mutable.LinkedHashMap.empty[String, JVal]
        rec.foreach { case (k, v) => order.update(k, v) }
        ExtractedRec(i, order.iterator.map { case (k, v) => RecEntry(k, Json.render(v)) }.toSeq)
    }
  }

  /** JSON cell → python `str(x)` rendering (null for NA cells). */
  val pyStrCell = udf { (cell: String) =>
    if (cell == null || cell == "null" || cell == "NaN") null
    else Json.parseOpt(cell).map(PyRender.pyStr).orNull
  }

  /** faithful `normalize_value` over a JSON cell (branch a/b columns). */
  val normalizeCell = udf { (cell: String) =>
    if (cell == null || cell == "null" || cell == "NaN") null
    else Json.parseOpt(cell) match {
      case Some(v) =>
        Normalize.normalizeCell(v) match {
          case JNull => null
          case out => Json.render(out)
        }
      case None => null
    }
  }

  /** branch (c): fillna('') + str(x).strip().lower() over a JSON cell.
    * Quirk: an EMPTY list fails `pd.notna` (empty-array truthiness is
    * False) → the lambda's else-branch emits None.
    */
  val stripLowerCell = udf { (cell: String) =>
    if (cell == null || cell == "null" || cell == "NaN") Json.quote("")
    else Json.parseOpt(cell) match {
      case Some(JArr(items)) if items.isEmpty => null
      case Some(JArr(Vector(JNull))) => null // pd.notna([None]) → False
      case Some(JArr(Vector(JFloat(d)))) if d.isNaN => null
      case Some(v) => Json.quote(PyRender.pyStr(v).strip().toLowerCase(java.util.Locale.ROOT))
      case None => Json.quote("")
    }
  }

  /** classification of normalize_value's OUTPUT for a cell — drives the
    * post-normalize pandas dtype coercion: "i"/"f"/"b"/"s"/"n"(ull).
    */
  val normOutTag = udf { (cell: String) =>
    if (cell == null || cell == "null" || cell == "NaN") "n"
    else Json.parseOpt(cell) match {
      case Some(v) =>
        Normalize.normalizeCell(v) match {
          case JNull => "n"
          case _: JInt => "i"
          case _: JFloat => "f"
          case _: JBool => "b"
          case _ => "s"
        }
      case None => "n"
    }
  }

  /** does a list cell have ≥2 elements? (`pd.notna(multi-element list)`
    * raises → the reference SKIPS that column entirely)
    */
  val isMultiList = udf { (cell: String) =>
    if (cell == null || !cell.startsWith("[")) false
    else Json.parseOpt(cell) match {
      case Some(JArr(items)) => items.length >= 2
      case _ => false
    }
  }

  /** sane-mode `normalize_value` over a JSON cell. */
  val normalizeCellSane = udf { (cell: String) =>
    if (cell == null || cell == "null" || cell == "NaN") null
    else Json.parseOpt(cell) match {
      case Some(v) =>
        Normalize.normalizeCellSane(v) match {
          case JNull => null
          case out => Json.render(out)
        }
      case None => null
    }
  }

  /** T2 list flatten: a list cell comma-joins its elements' python `str()`
    * renderings; scalars pass through.
    */
  val flattenCell = udf { (cell: String) =>
    if (cell == null || !cell.startsWith("[")) cell
    else Json.parseOpt(cell) match {
      case Some(JArr(items)) => Json.quote(items.map(PyRender.pyStr).mkString(","))
      case _ => cell
    }
  }

  /** `infer_type` tag of a JSON cell. */
  val inferTypeCell = udf { (cell: String) =>
    if (cell == null) "null"
    else Json.parseOpt(cell).map(Normalize.inferType).getOrElse("string")
  }

  /** final serving rendering of a JSON cell (pandas to_csv semantics:
    * None → empty, True/False capitalized, python float repr, strings raw).
    */
  val renderCell = udf { (cell: String) =>
    if (cell == null || cell == "null" || cell == "NaN") null
    else Json.parseOpt(cell).map(PyRender.pyStr).orNull
  }

  def isNa(c: Column): Column = c.isNull || c === "null" || c === "NaN"
}
