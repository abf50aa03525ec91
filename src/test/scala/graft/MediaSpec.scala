package graft

import java.nio.charset.StandardCharsets.UTF_8

import graft.media.MediaKernel
import graft.media.MediaKernel.{MediaRow, md5Hex}
import org.scalatest.funsuite.AnyFunSuite

class MediaSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val img = MediaRow("u1", "image", "fake image bytes".getBytes(UTF_8))
  private val aud = MediaRow("u2", "audio", "fake audio bytes".getBytes(UTF_8))
  private val vid = MediaRow("u3", "video", "fake video bytes that are a bit longer".getBytes(UTF_8))

  test("decodeMeta: deterministic, kind-dependent fields, md5 carried") {
    val m1 = MediaKernel.decodeMeta(img)
    assert(m1 == MediaKernel.decodeMeta(img)) // deterministic
    assert(m1.status == "ok" && m1.kind == "image")
    assert(m1.width >= 320 && m1.width < 320 + 1024)
    assert(m1.height >= 240 && m1.height < 240 + 768)
    assert(m1.duration_ms == -1 && m1.channels == 3)
    assert(m1.content_md5 == md5Hex(img.media))
    val m2 = MediaKernel.decodeMeta(aud)
    assert(m2.width == -1 && m2.height == -1 && m2.duration_ms >= 1000 && (m2.channels == 1 || m2.channels == 2))
    val m3 = MediaKernel.decodeMeta(vid)
    assert(m3.width > 0 && m3.duration_ms >= 1000)
  }

  test("decodeMeta: empty payload → error row, never a throw") {
    val m = MediaKernel.decodeMeta(MediaRow("u", "image", Array.emptyByteArray))
    assert(m.status == "error" && m.error.nonEmpty)
    assert(MediaKernel.decodeMeta(MediaRow("u", "image", null)).status == "error")
  }

  test("resizeDims preserves aspect ratio, never upsizes") {
    val meta = MediaKernel.decodeMeta(img)
    val (w, h) = MediaKernel.resizeDims(meta, 100)
    assert(math.max(w, h) == 100 || (meta.width <= 100 && meta.height <= 100))
    assert(w <= meta.width && h <= meta.height)
    // audio (-1 dims) passes through
    assert(MediaKernel.resizeDims(MediaKernel.decodeMeta(aud), 100) == (-1L, -1L))
  }

  test("sampleFrames: deterministic slices covering the payload prefix") {
    val frames = MediaKernel.sampleFrames(vid, 4)
    assert(frames.length == 4)
    assert(frames.map(_.frame_idx) == Seq(0, 1, 2, 3))
    assert(frames.map(_.frame.length).sum <= vid.media.length)
    assert(MediaKernel.sampleFrames(MediaRow("u", "video", Array.emptyByteArray), 4).isEmpty)
  }

  test("feature: unit-norm, dimension, deterministic") {
    val f = MediaKernel.feature(img.media, 16)
    assert(f.length == 16)
    val n = math.sqrt(f.map(v => v.toDouble * v).sum)
    assert(math.abs(n - 1.0) < 1e-5)
    assert(f.toSeq == MediaKernel.feature(img.media, 16).toSeq)
  }

  test("typed Dataset plumbing: decodeAll / featuresAll / framesAll") {
    implicit val s = spark
    import s.implicits._
    val ds = Seq(img, aud, vid).toDS().repartition(2)
    val metas = MediaKernel.decodeAll(ds).collect()
    assert(metas.length == 3 && metas.forall(_.status == "ok"))
    val feats = MediaKernel.featuresAll(ds).collect()
    assert(feats.forall(_.feature.length == 16))
    val frames = MediaKernel.framesAll(ds, 3).collect()
    assert(frames.length == 9)
  }
}
