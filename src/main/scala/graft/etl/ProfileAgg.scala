package graft.etl

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** One-pass column profiler as a custom `TypedImperativeAggregate`:
  * `field_profile(cell, row_idx)` computes, in a single aggregation buffer,
  * everything `generate_schema` needs for one column — value counts (exact
  * confidence + distinct count), per-value first-seen row (examples order +
  * vote tie-break), null count, and the infer_type vote.
  *
  * Why: the long-format profiler (Profile.valueStats) shuffles
  * #cols × #rows unpivoted cells. This aggregate profiles EVERY column of a
  * wide table in ONE pass over the data — buffers merge map-side like any
  * partial aggregate, so the shuffle carries only per-column value maps
  * (the same information, minus the unpivot blow-up of the row envelopes).
  * The value map is exact by design — `confidence` is defined on exact
  * value_counts (SURVEY.md §2.4 A5) — so memory matches what the groupBy
  * shuffle would hold for that column anyway.
  *
  * Output struct mirrors Profile.profileStats: (voted_type, nullable,
  * n_distinct, confidence, is_pk) — the equivalence is asserted in
  * ProfileAggSpec on real data.
  */
case class FieldProfileAgg(
    cell: Expression,
    rowIdx: Expression,
    jsonCells: Boolean = false,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ProfileBuffer] {

  override def children: Seq[Expression] = Seq(cell, rowIdx)
  override def nullable: Boolean = false
  override def dataType: DataType = FieldProfileAgg.schema

  override def createAggregationBuffer(): ProfileBuffer = new ProfileBuffer

  override def update(buf: ProfileBuffer, input: InternalRow): ProfileBuffer = {
    val c = cell.eval(input)
    val r = rowIdx.eval(input)
    val row = r match { case l: Long => l; case i: Int => i.toLong; case _ => 0L }
    if (c == null) buf.nulls += 1
    else {
      val s = c.toString
      if (s == "null" || s == "NaN") buf.nulls += 1
      else buf.add(s, row)
    }
    buf
  }

  override def merge(a: ProfileBuffer, b: ProfileBuffer): ProfileBuffer = a.mergeWith(b)

  override def eval(buf: ProfileBuffer): Any = {
    val s = buf.summarize(jsonCells)
    InternalRow(UTF8String.fromString(s.votedType), s.nullable, s.nDistinct,
      s.confidence, s.isPk)
  }

  override def serialize(buf: ProfileBuffer): Array[Byte] = buf.encode()
  override def deserialize(bytes: Array[Byte]): ProfileBuffer = ProfileBuffer.decode(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): FieldProfileAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FieldProfileAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): FieldProfileAgg =
    copy(cell = newChildren(0), rowIdx = newChildren(1))
  override def prettyName: String = "field_profile"
}

object FieldProfileAgg {
  val schema: StructType = StructType(Seq(
    StructField("voted_type", StringType, nullable = false),
    StructField("nullable", BooleanType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("confidence", DoubleType, nullable = false),
    StructField("is_pk", BooleanType, nullable = false)))

  /** Column builder: `field_profile(cell, row_idx)`. `jsonCells = true` for
    * pipeline JSON-encoded cells; false (default) tags the raw string with
    * the same regex battery as [[NormalizeCol.inferType]] (a plain-string
    * '1e5' is a string, NOT a JSON float).
    */
  def apply(cell: Column, rowIdx: Column): Column =
    apply(cell, rowIdx, jsonCells = false)

  def apply(cell: Column, rowIdx: Column, jsonCells: Boolean): Column =
    Bridge.column(
      FieldProfileAgg(Bridge.expression(cell), Bridge.expression(rowIdx), jsonCells)
        .toAggregateExpression())
}

final case class ProfileSummary(
    votedType: String, nullable: Boolean, nDistinct: Long,
    confidence: Double, isPk: Boolean)

/** value → (count, first-seen row), plus null count. */
final class ProfileBuffer {
  val values: mutable.HashMap[String, (Long, Long)] = mutable.HashMap.empty
  var nulls: Long = 0L

  /** vote + stats: ties break (count desc, first-seen asc, tag asc) — same
    * as Profile.profileStats. `jsonCells` selects the tagger: JSON-decode for
    * pipeline wire cells, else the raw-string regex battery (same battery as
    * NormalizeCol.inferType — a plain string '1e5' must NOT JSON-parse into
    * a float vote).
    */
  def summarize(jsonCells: Boolean = false): ProfileSummary = {
    val nonNull = values.valuesIterator.map(_._1).sum
    val nDistinct = values.size.toLong
    val maxCnt = if (values.isEmpty) 1L else values.valuesIterator.map(_._1).max
    val tagStats = mutable.Map.empty[String, (Long, Long)]
    values.foreach { case (v, (cnt, first)) =>
      val tag =
        if (jsonCells) Normalize.inferType(Json.parseOpt(v).getOrElse(JStr(v)))
        else ProfileBuffer.rawTag(v)
      if (tag != "null") {
        val (c0, f0) = tagStats.getOrElse(tag, (0L, Long.MaxValue))
        tagStats(tag) = (c0 + cnt, math.min(f0, first))
      }
    }
    val voted =
      if (tagStats.isEmpty) "string"
      else tagStats.toSeq.minBy { case (t, (c, f)) => (-c, f, t) }._1
    ProfileSummary(
      voted, nulls > 0, nDistinct,
      if (nonNull > 0) maxCnt.toDouble / nonNull else 1.0,
      nulls == 0 && nDistinct == nonNull && nonNull > 0)
  }

  def add(v: String, row: Long): Unit = {
    val (c, f) = values.getOrElse(v, (0L, Long.MaxValue))
    values(v) = (c + 1, math.min(f, row))
  }

  def mergeWith(o: ProfileBuffer): ProfileBuffer = {
    nulls += o.nulls
    o.values.foreach { case (v, (c, f)) =>
      val (c0, f0) = values.getOrElse(v, (0L, Long.MaxValue))
      values(v) = (c0 + c, math.min(f0, f))
    }
    this
  }

  def encode(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(nulls)
    out.writeInt(values.size)
    values.foreach { case (v, (c, f)) =>
      val b = v.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c); out.writeLong(f)
    }
    out.flush()
    bos.toByteArray
  }
}

object ProfileBuffer {
  /** Raw-string `infer_type` tag — the SAME decision chain as the Column
    * vote, via [[InferTypeKernel.tagString]]. Round 10 closed a latent
    * divergence here: the old inline probes ran the date battery on the
    * raw trimmed string WITHOUT the charset gate or the jump-token
    * normalization, so a date cell like "Mon, 10 Feb 2025" would tag
    * `date` through `NormalizeCol.inferType` (etl03's path and the
    * DuckDB oracle) but `string` through this one-pass path (etl09) —
    * unobservable on the date-free orders fixture, but a real split.
    * Sharing the kernel makes the two paths identical by construction
    * (and InferTypeSpec pins kernel ≡ Column chain on the parity
    * corpus).
    */
  def rawTag(v: String): String = InferTypeKernel.tagString(v)

  def decode(bytes: Array[Byte]): ProfileBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new ProfileBuffer
    buf.nulls = in.readLong()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      buf.values(new String(b, "UTF-8")) = (in.readLong(), in.readLong())
      i += 1
    }
    buf
  }
}
