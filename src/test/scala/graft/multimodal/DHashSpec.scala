package graft.multimodal

import org.apache.spark.sql.functions._

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

/** dHash discrimination: the fixture gradients are deliberately similar
  * (they exercise the banding join), so discrimination is pinned here on
  * constructed images — identical content re-encoded must collide,
  * opposite gradients must be far apart, and a mild rescale must stay
  * near.
  */
class DHashSpec extends graft.SparkSpec {
  import spark.implicits._

  private def png(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def gradient(w: Int, h: Int, horizontal: Boolean,
      invert: Boolean): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val t = if (horizontal) x * 255 / (w - 1) else y * 255 / (h - 1)
      val v = if (invert) 255 - t else t
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  private def dhashOf(payloads: Seq[(Long, Array[Byte])]): Map[Long, Long] =
    MultimodalQueries
      .imageDHash(payloads.toDF("img_id", "payload"))
      .collect()
      .map(f => f.img_id -> ((f.dhash_hi << 32) | f.dhash_lo))
      .toMap

  private def hamming(a: Long, b: Long): Int =
    java.lang.Long.bitCount(a ^ b)

  test("re-encode collides; rescale stays near; inversion is far") {
    val base = gradient(64, 48, horizontal = true, invert = false)
    val hashes = dhashOf(Seq(
      1L -> png(base),
      // same pixels, new encoder pass (PNG is lossless): must be exact
      2L -> png(gradient(64, 48, horizontal = true, invert = false)),
      // mild rescale of the same scene: dHash is resolution-invariant
      // up to cell-boundary jitter
      3L -> png(gradient(80, 60, horizontal = true, invert = false)),
      // reversed gradient: every comparison flips
      4L -> png(gradient(64, 48, horizontal = true, invert = true)),
      // orthogonal gradient: rows become constant → bits scatter
      5L -> png(gradient(64, 48, horizontal = false, invert = false)),
    ))
    assert(hamming(hashes(1L), hashes(2L)) == 0)
    assert(hamming(hashes(1L), hashes(3L)) <= 8,
      s"rescale moved ${hamming(hashes(1L), hashes(3L))} bits")
    assert(hamming(hashes(1L), hashes(4L)) >= 48,
      s"inversion only moved ${hamming(hashes(1L), hashes(4L))} bits")
    assert(hamming(hashes(1L), hashes(5L)) >= 24,
      s"orthogonal gradient only moved ${hamming(hashes(1L), hashes(5L))} bits")
  }

  test("pairs plan: banded equi join, no cartesian") {
    val p = graft.Registry.byName("m_image_dhash_pairs")
      .run(spark, sf("sf0.001")).queryExecution.executedPlan.toString()
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.linesIterator.take(8).mkString("\n"))
  }
}
