package graft.sources

/** The embedding-model boundary — the compile-time contract behind "swap
  * in a real model". The reference embeds product fields with
  * bge-small-en-v1.5 at 384 dims per field (reference `README.md:53-54`);
  * this zero-egress engine ships [[StubFieldEmbedder]], a deterministic
  * stand-in honoring the same shape contract (one unit-norm `segDim`-wide
  * segment per field, concatenated in field order — a 7-field row has
  * vector norm √7).
  *
  * Implementations must be Serializable: the engine calls [[embedBatch]]
  * from executor-side UDFs (distributed embedding inside
  * [[ProductGen.withDerived]]) and from the driver thread (the
  * single-object re-embed on the streaming upsert path,
  * [[ProductGen.localRow]]). A production adapter wraps a JNI or HTTP
  * inference client here — the batch signature exists precisely so such an
  * adapter can amortize per-call overhead; the engine never assumes
  * batch size 1.
  */
trait FieldEmbedder extends Serializable {

  /** Embed a batch of rows' text fields. One input element = one row's
    * fields in embedding order; the output element is that row's
    * concatenated per-field vector of length `fields.size * segDim`,
    * each `segDim`-wide segment unit-norm (zero for an empty field).
    */
  def embedBatch(rows: Seq[Seq[String]]): Seq[Array[Float]]

  /** Per-field segment width (a row's vector is nFields × segDim). */
  def segDim: Int

  /** Model identifier, for provenance in reports and manifests. */
  def name: String
}

/** The deterministic stub: per field, a splitmix64 stream seeded by the
  * field text, normalized to unit length per segment — same distributional
  * shape as a real encoder (dense, unit-norm segments), fully reproducible
  * with no model weights. Delegates to the single shared kernel
  * ([[ProductGen.embedFields]]) also used by the driver-local row
  * generator, so the distributed and local paths can never drift.
  */
final case class StubFieldEmbedder(segDim: Int) extends FieldEmbedder {
  override def embedBatch(rows: Seq[Seq[String]]): Seq[Array[Float]] =
    rows.map(fields => ProductGen.embedFields(fields, segDim))
  override def name: String = "stub-splitmix64"
}
