package graft.llm

import org.scalatest.funsuite.AnyFunSuite

/** The real-pixel half of dedup_image: BMP encode → ImageIO decode must be
  * an exact round-trip (pixels are the planted bytes — the property the
  * oracle leans on), PNG decode must agree with BMP decode on the same
  * matrix (lossless codec cross-check), and the aHash/dHash arithmetic
  * must match its integer spec bit-for-bit.
  */
class ImageHashSpec extends AnyFunSuite {

  private def randGray(w: Int, h: Int, seed: Long): Array[Int] = {
    val r = new scala.util.Random(seed)
    Array.fill(w * h)(r.nextInt(256))
  }

  test("BMP encode → ImageIO decode round-trips pixels exactly") {
    // widths exercise all 4-byte row paddings: 16*3=48 (0 pad), 5*3=15
    // (1 pad), 6*3=18 (2 pad), 7*3=21 (3 pad)
    for ((w, h) <- Seq((16, 16), (5, 3), (6, 4), (7, 2), (1, 1), (8, 13))) {
      val gray = randGray(w, h, seed = w * 100L + h)
      val bmp = Multimodal.encodeBmpGray(w, h, gray)
      val out = Multimodal.decodeGrayPixels(bmp)
      assert(out.isDefined, s"decode failed at ${w}x$h")
      val (dw, dh, dg) = out.get
      assert(dw == w && dh == h)
      assert(dg.sameElements(gray), s"pixels drifted at ${w}x$h")
    }
  }

  test("PNG decode agrees with BMP decode on the same matrix") {
    val w = 16; val h = 16
    val gray = randGray(w, h, seed = 42L)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = gray(y * w + x)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = Multimodal.decodeGrayPixels(bos.toByteArray)
    assert(png.isDefined, "PNG decode failed")
    assert(png.get._3.sameElements(gray), "PNG pixels drifted")
    val bmp = Multimodal.decodeGrayPixels(Multimodal.encodeBmpGray(w, h, gray))
    assert(bmp.get._3.sameElements(png.get._3))
  }

  test("aHash matches its integer spec on a 16x16 matrix") {
    val gray = randGray(16, 16, seed = 7L)
    // independent replica of the spec: sample p = 32y + 2x, integer mean,
    // bit y*8+x set iff v > mean
    val samples = (0 until 64).map { i =>
      val x = i % 8; val y = i / 8
      gray(32 * y + 2 * x)
    }
    val mean = samples.map(_.toLong).sum / 64
    var expected = 0L
    for (i <- 0 until 64) if (samples(i) > mean) expected |= 1L << i
    assert(Multimodal.aHash64(16, 16, gray) == expected)
    // and through the full payload pipeline
    val viaBmp = Multimodal.imageAHash(Multimodal.encodeBmpGray(16, 16, gray))
    assert(viaBmp.contains(expected))
  }

  test("aHash is stable under small perturbation, dHash under brightness shift") {
    val gray = randGray(16, 16, seed = 11L)
    val h0 = Multimodal.aHash64(16, 16, gray)
    // flip one UNSAMPLED pixel (odd coordinates are never sampled by the
    // 16→8 nearest-neighbor map) — hash must not move at all
    val g1 = gray.clone(); g1(1 * 16 + 1) = 255 - g1(1 * 16 + 1)
    assert(Multimodal.aHash64(16, 16, g1) == h0)
    // global +20 brightness (clamped): dHash compares neighbors, so at
    // most the clamped cells move — hamming stays small
    val g2 = gray.map(v => math.min(255, v + 20))
    val d0 = Multimodal.dHash64(16, 16, gray)
    val d2 = Multimodal.dHash64(16, 16, g2)
    assert(java.lang.Long.bitCount(d0 ^ d2) <= 8,
      s"dHash moved ${java.lang.Long.bitCount(d0 ^ d2)} bits on brightness shift")
  }

  test("corrupt payload decodes to None, not an exception") {
    assert(Multimodal.decodeGrayPixels(Array[Byte](1, 2, 3, 4)).isEmpty)
    assert(Multimodal.imageAHash(Array.fill[Byte](100)(0x42)).isEmpty)
  }
}
