package graft.embed

import graft.functions.VectorFunctions

/** Pluggable embedding boundary.
  *
  * The reference uses two HuggingFace models sharing one aligned space
  * (`Nomic MultiModal Retrieval.py:188-189, 350-360`): vision (bytes ->
  * 768-d) and text (string -> 768-d), both ending in L2-normalization so
  * cosine == L2 ranking (`NB:209, 376`). Query text carries a task prefix
  * (`"search_query: ..."`, `NB:399, 403`).
  *
  * This trait keeps that contract; the default implementation is a
  * deterministic, dependency-free featurizer (no model weights in this
  * environment) that exercises the *exact* post-processing math of the
  * reference: token hash features -> masked mean-pool (`NB:364-367`) ->
  * layer-norm (`NB:375`) -> L2-normalize (`NB:376`). A real ONNX/Torch
  * embedder slots in behind the same trait.
  */
trait Embedder extends Serializable {
  def dim: Int

  /** Image bytes -> unit vector (`NB:202-213`); None on decode failure
    * (reference returns None and drops the row, `NB:211-213, 239`). */
  def embedImage(content: Array[Byte]): Option[Array[Float]]

  /** Document text -> unit vector (`NB:369-378`). */
  def embedText(text: String): Array[Float]

  /** Query-side embedding with the task-instruction prefix (`NB:399`).
    * Query vectors are ephemeral — never persisted (`NB:26`). */
  def forQuery(query: String): Array[Float] = embedText("search_query: " + query)
}

/** Deterministic hash-projection featurizer.
  *
  * Text path: tokenize on whitespace; each token contributes a pseudo-random
  * (hash-seeded) unit pattern into `dim` buckets — a stand-in for per-token
  * transformer states — then masked mean-pool, layer-norm, L2-norm exactly as
  * `NB:364-378`.
  *
  * Image path: REAL decode (JDK `javax.imageio`) to 32x32 RGB, then pixel
  * 64-grams hashed the same way (stand-in for patch embeddings -> CLS
  * token, `NB:206-209`); undecodable content -> None.
  */
final class DeterministicEmbedder(override val dim: Int = 64) extends Embedder {

  private def tokenVector(seed: Long): Array[Float] = {
    // splitmix64 stream — deterministic, well-distributed, public-domain alg
    val out = new Array[Float](dim)
    var x = seed
    var i = 0
    while (i < dim) {
      x += 0x9e3779b97f4a7c15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z = z ^ (z >>> 31)
      // map to [-1, 1)
      out(i) = ((z >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0).toFloat
      i += 1
    }
    out
  }

  private def hashSeed(s: String): Long = {
    var h = 1125899906842597L
    var i = 0
    while (i < s.length) { h = 31 * h + s.charAt(i); i += 1 }
    h
  }

  override def embedText(text: String): Array[Float] = {
    val toks = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
    if (toks.isEmpty) return new Array[Float](dim)
    val tokenVecs = toks.map(t => tokenVector(hashSeed(t)))
    val mask = Array.fill(toks.length)(1)
    val pooled = VectorFunctions.maskedMeanPool(tokenVecs, mask) // NB:364-367
    VectorFunctions.l2Normalize(VectorFunctions.layerNorm(pooled)) // NB:375-376
  }

  /** Real decode (`javax.imageio`) -> 32x32 RGB resample -> 64-byte pixel
    * grams hashed into the feature space (stand-in for patch embeddings ->
    * CLS token, `NB:206-209`). Undecodable bytes -> None, mirroring the
    * reference's PIL decode-failure drop (`NB:211-213`); the model consumes
    * PIXELS, never the container bytes. */
  override def embedImage(content: Array[Byte]): Option[Array[Float]] =
    graft.multimodal.Multimodal.MediaCodec.decodePixels(content, 32, 32).map { px =>
      val grams = px.grouped(64).map { g =>
        var h = 1125899906842597L
        var i = 0
        while (i < g.length) { h = 31 * h + g(i); i += 1 }
        tokenVector(h)
      }.toArray
      val pooled = VectorFunctions.maskedMeanPool(grams, Array.fill(grams.length)(1))
      VectorFunctions.l2Normalize(VectorFunctions.layerNorm(pooled))
    }
}
