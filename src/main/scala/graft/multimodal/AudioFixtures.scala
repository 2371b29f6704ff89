package graft.multimodal

import java.io.{ByteArrayInputStream, File}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** Deterministic real-audio fixture corpus for the multimodal operators —
  * the audio sibling of [[ImageFixtures]]: 6 PCM-16 WAV clips with known
  * (sample rate, channels, frame count) and a deterministic sine-wave
  * payload, plus one corrupt file every decode stage must drop. Idempotent
  * like the image fixtures.
  */
object AudioFixtures {

  val DefaultDir = "/root/repo/fixtures/audio"

  /** (name, sampleRate, channels, frames) for every decodable clip;
    * duration_sec = frames / sampleRate by definition. */
  val clips: Seq[(String, Int, Int, Long)] = Seq(
    ("aud_00.wav", 8000, 1, 800L),
    ("aud_01.wav", 8000, 2, 1600L),
    ("aud_02.wav", 16000, 1, 2400L),
    ("aud_03.wav", 16000, 2, 3200L),
    ("aud_04.wav", 44100, 1, 4410L),
    ("aud_05.wav", 44100, 2, 8820L))

  val corruptName = "zz_corrupt.wav"

  /** Per-clip sine frequency: full periods inside every clip so the RMS of
    * the decoded signal is analytically ~amplitude/sqrt(2). */
  def freqOf(idx: Int): Double = 200.0 * (idx + 1)

  val amplitude: Short = 12000

  def ensure(dir: String = DefaultDir): String = synchronized {
    val d = new File(dir)
    if (!d.exists()) d.mkdirs()
    clips.zipWithIndex.foreach { case ((name, sr, ch, frames), idx) =>
      val f = new File(d, name)
      if (!f.exists()) {
        val fmt = new AudioFormat(sr.toFloat, 16, ch, true, false) // PCM16 LE
        val bytes = new Array[Byte](frames.toInt * ch * 2)
        var n = 0
        var o = 0
        while (n < frames) {
          val v = (math.sin(2 * math.Pi * freqOf(idx) * n / sr) * amplitude).toInt
          var c = 0
          while (c < ch) {
            bytes(o) = (v & 0xff).toByte
            bytes(o + 1) = ((v >> 8) & 0xff).toByte
            c += 1; o += 2
          }
          n += 1
        }
        val ais = new AudioInputStream(
          new ByteArrayInputStream(bytes), fmt, frames)
        AudioSystem.write(ais, AudioFileFormat.Type.WAVE, f)
      }
    }
    val corrupt = new File(d, corruptName)
    if (!corrupt.exists())
      java.nio.file.Files.write(corrupt.toPath,
        "definitely not a RIFF bitstream".getBytes("UTF-8"))
    dir
  }
}
