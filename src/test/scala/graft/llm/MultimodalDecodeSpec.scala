package graft.llm

import org.scalatest.funsuite.AnyFunSuite

/** Real javax.imageio decode: magic sniff, actual dimensions, pixel-mean
  * features; non-image payloads fall back to the stub (None here). */
class MultimodalDecodeSpec extends AnyFunSuite {
  private def png(w: Int, h: Int, rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("solid-color PNG decodes with real dimensions and channel means") {
    val Some((fmt, w, h, f)) = Multimodal.decodeImage(png(6, 4, (_, _) => 0xFF8000))
    assert(fmt === "image/png" && w === 6 && h === 4)
    assert(f(0) === 1.0f) // R
    assert(Math.abs(f(1) - 128f / 255f) < 1e-6) // G
    assert(f(2) === 0.0f) // B
    assert(Math.abs(f(3) - (0.299 + 0.587 * 128 / 255.0)) < 1e-6) // luma
  }

  test("half-black/half-white PNG yields quadrant luminance split") {
    val Some((_, _, _, f)) =
      Multimodal.decodeImage(png(8, 8, (x, _) => if (x < 4) 0x000000 else 0xFFFFFF))
    assert(f(3) === 0.5f) // global luma
    assert(f(4) === 0.0f && f(5) === 1.0f) // top-left black, top-right white
    assert(f(6) === 0.0f && f(7) === 1.0f) // bottom quadrants likewise
  }

  test("non-image payloads are rejected, not mis-decoded") {
    assert(Multimodal.decodeImage("just some text".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodeImage(null).isEmpty)
    assert(Multimodal.decodeImage(Array[Byte](0x89.toByte, 'P', 'N')).isEmpty)
    // PNG magic with garbage body: sniff passes, decode fails cleanly
    val junk = Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26, 10, 1, 2, 3)
    assert(Multimodal.decodeImage(junk).isEmpty)
  }
}
