package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private def blobs = {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    Multimodal.attachBlobs(df, "doc_id", "text", "image/png")
  }

  test("attachBlobs produces the canonical multimodal schema") {
    val ds = blobs
    val f = ds.schema.fields.map(x => x.name -> x.dataType.simpleString).toMap
    assert(f("content") == "binary")
    assert(f("mime") == "string")
    assert(f("meta") == "map<string,string>")
    val first = ds.head()
    assert(first.meta("bytes").toInt == first.content.length)
  }

  test("decode is deterministic and partition-parallel") {
    val d1 = Multimodal.decode(blobs).collect().sortBy(_.blob_id)
    val d2 = Multimodal.decode(blobs.repartition(7)).collect().sortBy(_.blob_id)
    assert(d1.length == d2.length && d1.length > 0)
    d1.zip(d2).foreach { case (a, b) =>
      assert(a.blob_id == b.blob_id && a.width == b.width &&
        a.features.toSeq == b.features.toSeq)
    }
    assert(d1.forall(x => x.width >= 16 && x.features.length == 8))
  }

  test("resize replaces payload and updates metadata, deterministically") {
    val r1 = Multimodal.resize(blobs, 32, 16).collect().sortBy(_.blob_id)
    val r2 = Multimodal.resize(blobs.repartition(5), 32, 16).collect().sortBy(_.blob_id)
    assert(r1.length == r2.length && r1.nonEmpty)
    r1.zip(r2).foreach { case (a, b) =>
      assert(a.blob_id == b.blob_id && a.content.toSeq == b.content.toSeq)
    }
    r1.foreach { b =>
      assert(b.content.length == 32 * 16 / 64)
      assert(b.meta("width") == "32" && b.meta("height") == "16")
    }
  }

  test("video frame sampling emits <= n evenly spaced frames") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val vids = Multimodal.attachBlobs(df, "doc_id", "text", "video/mp4")
    val frames = Multimodal.sampleFrames(vids, 4).collect()
    assert(frames.nonEmpty)
    val byBlob = frames.groupBy(_.blob_id)
    assert(byBlob.values.forall(f => f.length <= 4))
    // deterministic frame bytes
    val again = Multimodal.sampleFrames(vids, 4).collect()
    assert(frames.map(f => (f.blob_id, f.frame_idx, f.content.toSeq)).toSet ==
      again.map(f => (f.blob_id, f.frame_idx, f.content.toSeq)).toSet)
  }
}
