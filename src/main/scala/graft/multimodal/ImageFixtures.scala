package graft.multimodal

import java.awt.image.BufferedImage
import java.io.File
import javax.imageio.ImageIO

/** Deterministic real-image fixture corpus for the multimodal operators —
  * the engine-side analog of the reference's downloaded photo volume
  * (`Nomic MultiModal Retrieval.py:131-149`): 8 PNGs + 4 JPEGs with known
  * dimensions and a deterministic pixel pattern, plus one corrupt file that
  * every decode stage must drop. Generation is idempotent (missing files
  * are re-created, existing ones left alone), so queries and specs can call
  * [[ensure]] freely.
  */
object ImageFixtures {

  val DefaultDir = "/root/repo/fixtures/images"

  /** (name, width, height, format) for every decodable fixture. */
  val images: Seq[(String, Int, Int, String)] =
    (0 until 8).map(i => (f"img_$i%02d.png", 16 + 4 * i, 12 + 3 * i, "png")) ++
      (8 until 12).map(i => (f"img_$i%02d.jpg", 16 + 4 * i, 12 + 3 * i, "jpeg"))

  val corruptName = "zz_corrupt.png"

  def ensure(dir: String = DefaultDir): String = synchronized {
    val d = new File(dir)
    if (!d.exists()) d.mkdirs()
    images.foreach { case (name, w, h, fmt) =>
      val f = new File(d, name)
      if (!f.exists()) {
        val idx = name.slice(4, 6).toInt
        ImageIO.write(pattern(idx, w, h), if (fmt == "jpeg") "jpg" else fmt, f)
      }
    }
    val corrupt = new File(d, corruptName)
    if (!corrupt.exists()) {
      // a PNG-named file that is not a PNG: every reader must return None
      java.nio.file.Files.write(corrupt.toPath,
        "definitely not an image bitstream".getBytes("UTF-8"))
    }
    dir
  }

  /** Deterministic RGB test card: gradients + an index-dependent offset so
    * every fixture embeds differently. */
  private def pattern(idx: Int, w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = (x * 7 + idx * 13) % 256
        val g = (y * 5 + idx * 29) % 256
        val b = (x + y + idx * 3) % 256
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    img
  }
}
