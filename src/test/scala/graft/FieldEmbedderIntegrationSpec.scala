package graft

import graft.sources.{HttpFieldEmbedder, StubFieldEmbedder}
import org.scalatest.funsuite.AnyFunSuite

/** Integration spec for the REAL embedding adapter
  * ([[graft.sources.HttpFieldEmbedder]]) — CANCELLED unless
  * GRAFT_EMBED_ENDPOINT is set (this build environment has zero egress,
  * so CI can never reach a model server; the first user with one runs:
  *
  *   GRAFT_EMBED_ENDPOINT=http://localhost:8080/v1/embeddings \
  *   GRAFT_EMBED_MODEL=bge-small-en-v1.5 \
  *   GRAFT_EMBED_SEGDIM=384 sbt "testOnly graft.FieldEmbedderIntegrationSpec"
  *
  * and gets the adapter seam verified against the live endpoint). The
  * contract cases mirror what ProductGenSpec pins for the stub, so a
  * real model drops into ProductGen.withDerived with the same shape
  * guarantees the engine relies on everywhere.
  */
class FieldEmbedderIntegrationSpec extends AnyFunSuite {

  private def endpoint = sys.env.get("GRAFT_EMBED_ENDPOINT")

  private def embedder: HttpFieldEmbedder = HttpFieldEmbedder(
    endpoint.get,
    sys.env.getOrElse("GRAFT_EMBED_MODEL", "bge-small-en-v1.5"),
    sys.env.getOrElse("GRAFT_EMBED_SEGDIM", "384").toInt)

  test("live endpoint honors the segment contract (shape, unit norms, zero for empty)") {
    assume(endpoint.isDefined, "GRAFT_EMBED_ENDPOINT not set — skipping")
    val e = embedder
    val rows = Seq(
      Seq("a red bicycle", "outdoor sports", ""),
      Seq("a red bicycle", "kitchen appliance", "stainless steel"))
    val out = e.embedBatch(rows)
    assert(out.length == 2)
    out.foreach(v => assert(v.length == 3 * e.segDim))
    // per-segment unit norm for non-empty fields, zero for the empty one
    def segNorm(v: Array[Float], i: Int): Double =
      math.sqrt(v.slice(i * e.segDim, (i + 1) * e.segDim)
        .map(x => x.toDouble * x).sum)
    assert(math.abs(segNorm(out(0), 0) - 1.0) < 1e-3)
    assert(math.abs(segNorm(out(0), 1) - 1.0) < 1e-3)
    assert(segNorm(out(0), 2) == 0.0)
    // identical field text embeds identically across rows (the adapter
    // deduplicates per batch; a real model is deterministic per text)
    assert(out(0).slice(0, e.segDim).sameElements(out(1).slice(0, e.segDim)))
  }

  test("live endpoint: batch call equals singleton calls (amortization must not change values)") {
    assume(endpoint.isDefined, "GRAFT_EMBED_ENDPOINT not set — skipping")
    val e = embedder
    val fields = Seq("portable bluetooth speaker", "electronics")
    val batched = e.embedBatch(Seq(fields)).head
    val single = fields.zipWithIndex.map { case (f, i) =>
      e.embedBatch(Seq(Seq(f))).head
    }
    fields.indices.foreach { i =>
      val seg = batched.slice(i * e.segDim, (i + 1) * e.segDim)
      val solo = single(i).slice(0, e.segDim)
      seg.zip(solo).foreach { case (a, b) => assert(math.abs(a - b) < 1e-4) }
    }
  }

  test("stub embedder remains the zero-egress stand-in with the same contract") {
    // always runs: pins that the stub and the HTTP adapter share the
    // shape contract this spec checks live — a swap cannot change shapes.
    // One DOCUMENTED divergence: the stub unit-norms EVERY segment,
    // including the empty string (it hashes "" like any text — the √7
    // whole-row norm contract ProductGenSpec pins depends on it, and the
    // product generator never emits an empty field), while a real
    // adapter zeroes empty fields per the trait scaladoc (a model has no
    // meaningful direction for no text).
    val e = StubFieldEmbedder(segDim = 8)
    val out = e.embedBatch(Seq(Seq("x", "", "y"))).head
    assert(out.length == 24)
    (0 until 3).foreach { i =>
      val n = math.sqrt(out.slice(i * 8, (i + 1) * 8)
        .map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-5, s"segment $i norm $n")
    }
  }
}
