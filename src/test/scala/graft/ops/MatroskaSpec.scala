package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.US_ASCII

import graft.etl.{JArr, JInt, JObj, JStr, Json}

/** Locks on the Matroska/WebM EBML walk (graft.ops.Matroska) against
  * fixtures from the independent python transcription
  * (tools/make_mkv_fixture.py): VINT id/size grammar, definite and
  * unknown-size (streaming) segment/cluster forms, track video/audio
  * fields, NUL-padded strings, 4- and 8-byte float durations, plus the
  * typed-refusal contract and writer/fixture byte identity.
  */
class MatroskaSpec extends AnyFunSuite {

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/fixtures/$name")
    assert(in != null, s"missing fixture $name")
    try in.readAllBytes() finally in.close()
  }

  private val expected = Json.parse(new String(
    fixture("mkv_expected.json"), US_ASCII)).asInstanceOf[JObj].fields.toMap

  private def check(name: String): Unit = {
    val w = expected(name).asInstanceOf[JObj].fields.toMap
    def i(k: String): Long = w(k).asInstanceOf[JInt].i.toLong
    val m = Matroska.parse(fixture(name))
    assert(m.docType == w("doc_type").asInstanceOf[JStr].s, s"$name docType")
    assert(m.docTypeVersion == i("doc_type_version"), s"$name version")
    assert(m.timestampScale == i("timestamp_scale"), s"$name scale")
    assert(m.durationMs == i("duration_ms"), s"$name duration")
    assert(m.nClusters == i("n_clusters"), s"$name clusters")
    assert(m.firstClusterTs == i("first_ts"), s"$name first ts")
    assert(m.lastClusterTs == i("last_ts"), s"$name last ts")
    assert(m.nBlocks == i("n_blocks"), s"$name blocks")
    assert(m.blockBytes == i("block_bytes"), s"$name block bytes")
    val ts = w("tracks").asInstanceOf[JArr].items.map(
      _.asInstanceOf[JObj].fields.toMap)
    assert(m.tracks.length == ts.length, s"$name track count")
    m.tracks.zip(ts).foreach { case (got, t) =>
      def ti(k: String): Long = t(k).asInstanceOf[JInt].i.toLong
      assert(got.number == ti("number") && got.trackType == ti("type") &&
        got.codecId == t("codec").asInstanceOf[JStr].s &&
        got.width == ti("w") && got.height == ti("h") &&
        got.sampleRate.toLong == ti("rate") && got.channels == ti("ch"),
        s"$name track ${got.number}: $got")
    }
  }

  test("webm / matroska / streaming / padded fixtures parse exactly") {
    Seq("mkv_webm.webm", "mkv_matroska.mkv", "mkv_stream.webm",
      "mkv_padded.webm").foreach(check)
  }

  test("writer is byte-identical to the python layout") {
    val got = Matroska.write("webm", 4, 1000000L, 5000.0,
      Seq(Matroska.TrackSpec(1, 1, "V_VP9", width = 1280, height = 720),
        Matroska.TrackSpec(2, 2, "A_OPUS", sampleRate = 48000.0, channels = 2)),
      Seq(Matroska.ClusterSpec(1000, Seq(20, 30)),
        Matroska.ClusterSpec(2000, Seq(25)),
        Matroska.ClusterSpec(3000, Seq(40, 10, 15))))
    assert(java.util.Arrays.equals(got, fixture("mkv_webm.webm")))
  }

  test("streaming writer round trip (unknown-size segment)") {
    val bytes = Matroska.write("webm", 2, 1000000L, 750.0,
      Seq(Matroska.TrackSpec(1, 1, "V_AV1", width = 320, height = 180)),
      Seq(Matroska.ClusterSpec(0, Seq(12))), streamingSegment = true)
    val m = Matroska.parse(bytes)
    assert(m.docType == "webm" && m.durationMs == 750 && m.nClusters == 1 &&
      m.tracks.head.codecId == "V_AV1")
  }

  test("unknown-size cluster ends at trailing level-1 siblings (Cues/Tags)") {
    // RFC 8794: an unknown-size element ends at ANY valid sibling —
    // streamed files legally trail SeekHead/Cues/Tags after the last
    // cluster (round-16 advice: only Cluster/Tracks/Info stopped the
    // walk, absorbing the trailing index into the last cluster)
    val base = Matroska.write("webm", 2, 1000000L, 900.0,
      Seq(Matroska.TrackSpec(1, 1, "V_VP9", width = 640, height = 360)),
      Seq(Matroska.ClusterSpec(100, Seq(12))), streamingSegment = true)
    val at = goodIndexOf(base, Array(0x1f, 0x43, 0xb6, 0x75))
    assert((base(at + 4) & 0xff) >= 0x80) // 1-byte definite size vint
    val mut = base.clone()
    mut(at + 4) = 0xff.toByte // make the cluster unknown-size in place
    // trailing Cues (CuePoint payload) and Tags elements after it
    import Matroska.W
    val cues = W.el(0x1C53BB6BL, W.uint(0xB3L, 100))
    val tags = W.el(0x1254C367L, W.str(0x45A3L, "t"))
    val streamed = mut.slice(0, at + 5 + (base(at + 4) & 0x7f)) ++ cues ++ tags
    val m = Matroska.parse(streamed)
    assert(m.nClusters == 1 && m.nBlocks == 1 && m.blockBytes == 16 &&
      m.firstClusterTs == 100 && m.lastClusterTs == 100)
  }

  test("refusals are typed: magic, doctype, lying sizes, bad vints, cuts") {
    val good = fixture("mkv_webm.webm")
    assert(Matroska.parseSafe("not ebml".getBytes(US_ASCII)) == Left("bad_magic"))
    assert(Matroska.parseSafe(Array.emptyByteArray) == Left("bad_magic"))
    // foreign DocType refuses unsupported, never walks on
    val foreign = Matroska.write("webm", 4, 1000000L, 1.0, Nil, Nil)
    val at = foreign.indexOfSlice("webm".getBytes(US_ASCII))
    val other = foreign.clone()
    "webb".getBytes(US_ASCII).copyToArray(other, at)
    assert(Matroska.parseSafe(other) == Left("unsupported"))
    // a size lying past the parent refuses (Info size byte inflated)
    val infoAt = goodIndexOf(good, Array(0x15, 0x49, 0xa9, 0x66))
    val lie = good.clone()
    lie(infoAt + 4) = (0x80 | 0x7e).toByte // definite size 126, crosses
    assert(Matroska.parseSafe(lie).isLeft)
    // 0x00 first byte of a vint is invalid
    val zero = good.clone(); zero(infoAt) = 0
    assert(Matroska.parseSafe(zero) == Left("bad_frame"))
    // truncation mid-cluster
    assert(Matroska.parseSafe(
      java.util.Arrays.copyOf(good, good.length - 7)).isLeft)
  }

  private def goodIndexOf(hay: Array[Byte], needle: Array[Int]): Int = {
    val n = needle.map(_.toByte)
    val at = hay.indexOfSlice(n)
    assert(at > 0)
    at
  }
}
