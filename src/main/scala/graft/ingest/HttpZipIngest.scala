package graft.ingest

import java.io.{BufferedInputStream, FileOutputStream, InputStream}
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Path, Paths}
import java.util.zip.ZipInputStream

/** Driver-side raw-data acquisition utilities — the reference's O1/O2
  * (`Nomic MultiModal Retrieval.py:128-151`): block-streamed HTTP download
  * with progress, zip extraction into a volume directory, archive cleanup.
  * Deliberately NOT query operators: acquisition happens once, outside the
  * Spark plan; the engine's entry point is the binaryFile scan over the
  * extracted directory ([[BinaryIngest.scan]]).
  */
object HttpZipIngest {

  /** Stream a URL to a local file in fixed-size blocks (`NB:128-142`;
    * reference uses 1024-byte blocks). Returns bytes written. */
  def download(url: String, destination: String, blockSize: Int = 1024,
      progress: Long => Unit = _ => ()): Long = {
    val client = HttpClient.newBuilder()
      .followRedirects(HttpClient.Redirect.NORMAL).build()
    val req = HttpRequest.newBuilder(URI.create(url)).GET().build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofInputStream())
    try copyBlocks(resp.body(), Paths.get(destination), blockSize, progress)
    finally resp.body().close()
  }

  private[ingest] def copyBlocks(in: InputStream, dest: Path, blockSize: Int,
      progress: Long => Unit): Long = {
    Files.createDirectories(dest.toAbsolutePath.getParent)
    val out = new FileOutputStream(dest.toFile)
    val buf = new Array[Byte](blockSize)
    var total = 0L
    try {
      var n = in.read(buf)
      while (n >= 0) {
        out.write(buf, 0, n)
        total += n
        progress(total)
        n = in.read(buf)
      }
    } finally out.close()
    total
  }

  /** Extract a zip archive into `targetDir`, then delete the archive
    * (`NB:145-149`). Rejects entries escaping the target (zip-slip).
    * Returns extracted file count. */
  def extractAndDelete(archive: String, targetDir: String): Int = {
    val target = Paths.get(targetDir).toAbsolutePath.normalize()
    Files.createDirectories(target)
    val zin = new ZipInputStream(
      new BufferedInputStream(Files.newInputStream(Paths.get(archive))))
    var count = 0
    try {
      var e = zin.getNextEntry
      while (e != null) {
        val out = target.resolve(e.getName).normalize()
        require(out.startsWith(target), s"zip entry escapes target: ${e.getName}")
        if (e.isDirectory) Files.createDirectories(out)
        else {
          Files.createDirectories(out.getParent)
          copyBlocks(zin, out, 8192, _ => ())
          count += 1
        }
        zin.closeEntry()
        e = zin.getNextEntry
      }
    } finally zin.close()
    Files.deleteIfExists(Paths.get(archive))
    count
  }
}
