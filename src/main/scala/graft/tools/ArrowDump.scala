package graft.tools

import graft.ops.ArrowIpc._

/** Dev-time differential for the [[graft.ops.ArrowIpc]] WRITER: emits a
  * stream exercising every supported type (nulls at column and
  * list-element level, multi-byte UTF-8, -0.0f) for pyarrow to read
  * back:
  *
  *   sbt "runMain graft.tools.ArrowDump /tmp/graft.arrows"
  *   python3 -c "import pyarrow as pa; \
  *     print(pa.ipc.open_stream('/tmp/graft.arrows').read_all().to_pydict())"
  *
  * (Verified against pyarrow 16.1.0 in round 12: schema, nullability,
  * and every value round-trip exactly. The reverse direction — our
  * reader on real pyarrow bytes — is pinned permanently by
  * ArrowIpcSpec's fixtures.)
  */
object ArrowDump {
  def main(args: Array[String]): Unit = {
    val fields = Vector(
      AField("id", "i64", nullable = false),
      AField("k", "i32", nullable = true),
      AField("s", "f64", nullable = true),
      AField("w", "f32", nullable = true),
      AField("b", "bool", nullable = true),
      AField("t", "utf8", nullable = true),
      AField("v", "list<f32>", nullable = true))
    val cols = Vector[ACol](
      ALongCol("id", null, Array(1L, 2L, -9L)),
      AIntCol("k", Array(true, false, true), Array(5, 0, -7)),
      ADoubleCol("s", null, Array(0.5, -1e300, 42.0)),
      AFloatCol("w", Array(false, true, true), Array(0f, 1.5f, -0.0f)),
      ABoolCol("b", Array(true, true, false), Array(true, false, false)),
      AStrCol("t", Array(true, false, true), Array("héllo", null, "")),
      AFloatListCol("v", Array(true, false, true),
        Array(Array(1f, 2f), null, Array.emptyFloatArray),
        Array(Array(false, true), null, Array.emptyBooleanArray)))
    val bytes = graft.ops.ArrowIpc.write(fields, Seq(cols, cols))
    java.nio.file.Files.write(java.nio.file.Paths.get(args(0)), bytes)
    println(s"wrote ${bytes.length}")
  }
}
