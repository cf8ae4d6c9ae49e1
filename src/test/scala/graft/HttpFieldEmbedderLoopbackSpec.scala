package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.sources.{HttpFieldEmbedder, ProductGen}
import org.apache.spark.sql.functions._

/** Always-on wire-shape coverage for [[graft.sources.HttpFieldEmbedder]]
  * against an in-process loopback `/v1/embeddings` server (127.0.0.1,
  * ephemeral port — zero egress), the same treatment
  * HttpDatasetSourceSpec gives the dataset source: per-batch dedup into
  * ONE request, index-keyed response reordering, unit normalization of
  * unnormalized server vectors, the Bearer-auth header path, fail-fast
  * on 5xx and on a dimension mismatch, and the full
  * `ProductGen.withDerived` path embedding through Spark tasks. The
  * REAL-endpoint cases stay in the env-gated
  * FieldEmbedderIntegrationSpec.
  */
class HttpFieldEmbedderLoopbackSpec extends SparkSpec {

  private val mapper = new ObjectMapper()

  /** Deterministic UNNORMALIZED embedding for a text: seeded by the
    * text's hash, scaled ×3 so the adapter's normalization is load-
    * bearing. Mirrored in the assertions below.
    */
  private def serverVec(text: String, dim: Int): Array[Double] = {
    val r = new scala.util.Random(text.hashCode.toLong)
    Array.fill(dim)((r.nextDouble() * 2 - 1) * 3.0)
  }

  private def expectedUnit(text: String, dim: Int): Array[Float] = {
    val v = serverVec(text, dim)
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(x => (x / n).toFloat)
  }

  /** Serve /v1/embeddings: parse the OpenAI request shape, return one
    * vector per input, data array in REVERSED index order (the adapter
    * must key on `index`, not array position). `failFirst` requests get
    * 500; `dims < 0` echoes `-dims` (a wrong width) to trip the
    * adapter's segDim check.
    */
  private def withServer(dim: Int, failFirst: Int = 0)(
      body: (String, AtomicInteger,
        java.util.List[String], java.util.List[String]) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val hits = new AtomicInteger(0)
    val bodies =
      java.util.Collections.synchronizedList(new java.util.ArrayList[String]())
    val auths =
      java.util.Collections.synchronizedList(new java.util.ArrayList[String]())
    server.createContext("/v1/embeddings", (ex: HttpExchange) => {
      val n = hits.incrementAndGet()
      auths.add(
        Option(ex.getRequestHeaders.getFirst("Authorization")).getOrElse(""))
      val reqBody = new String(ex.getRequestBody.readAllBytes(),
        StandardCharsets.UTF_8)
      bodies.add(reqBody)
      try {
        if (n <= failFirst) {
          ex.sendResponseHeaders(500, -1)
        } else {
          val root = mapper.readTree(reqBody)
          val inputs = root.get("input")
          val resp = mapper.createObjectNode()
          val data = resp.putArray("data")
          // reversed order on purpose — index-keyed consumers only
          (inputs.size() - 1) to 0 by -1 foreach { i =>
            val item = data.addObject()
            item.put("index", i)
            val emb = item.putArray("embedding")
            serverVec(inputs.get(i).asText(), dim).foreach(emb.add)
          }
          val payload = mapper.writeValueAsString(resp)
            .getBytes(StandardCharsets.UTF_8)
          ex.getResponseHeaders.set("Content-Type", "application/json")
          ex.sendResponseHeaders(200, payload.length.toLong)
          ex.getResponseBody.write(payload)
        }
      } finally ex.close()
    })
    server.start()
    try body(
      s"http://127.0.0.1:${server.getAddress.getPort}/v1/embeddings",
      hits, bodies, auths)
    finally server.stop(0)
  }

  test("embedBatch: one deduplicated request, index-keyed order, unit segments, zero for empty") {
    val segDim = 16
    withServer(segDim) { (url, hits, bodies, _) =>
      val e = HttpFieldEmbedder(url, "fake-model", segDim)
      val rows = Seq(
        Seq("red bicycle", "outdoor", ""),
        Seq("red bicycle", "kitchen", "steel"))
      val out = e.embedBatch(rows)
      // 4 distinct non-empty texts across both rows → exactly ONE POST
      assert(hits.get() == 1, s"expected 1 request, got ${hits.get()}")
      val sent = mapper.readTree(bodies.get(0))
      assert(sent.get("model").asText() == "fake-model")
      val inputs = (0 until sent.get("input").size())
        .map(sent.get("input").get(_).asText())
      assert(inputs == Seq("red bicycle", "outdoor", "kitchen", "steel"))
      assert(out.length == 2 && out.forall(_.length == 3 * segDim))
      // each non-empty segment equals the normalized server vector for
      // ITS text — even though the server answered in reversed order
      def seg(v: Array[Float], i: Int) = v.slice(i * segDim, (i + 1) * segDim)
      def approxEq(a: Array[Float], b: Array[Float]): Boolean =
        a.length == b.length && a.zip(b).forall {
          case (x, y) => math.abs(x - y) < 1e-5
        }
      assert(approxEq(seg(out(0), 0), expectedUnit("red bicycle", segDim)))
      assert(approxEq(seg(out(0), 1), expectedUnit("outdoor", segDim)))
      assert(approxEq(seg(out(1), 2), expectedUnit("steel", segDim)))
      // empty field → zero segment; non-empty segments are unit-norm
      assert(seg(out(0), 2).forall(_ == 0.0f))
      val norm = math.sqrt(seg(out(1), 1).map(x => x.toDouble * x).sum)
      assert(math.abs(norm - 1.0) < 1e-5, s"segment norm $norm")
      // identical text in both rows embeds identically (served once)
      assert(seg(out(0), 0).sameElements(seg(out(1), 0)))
    }
  }

  test("Bearer auth header rides exactly when a key is configured") {
    val segDim = 8
    withServer(segDim) { (url, _, _, auths) =>
      val e = HttpFieldEmbedder(url, "fake-model", segDim)
      // this sandbox never sets the env var, so absence is testable
      assert(!sys.env.contains("GRAFT_EMBED_API_KEY"))
      e.embedBatch(Seq(Seq("no auth")))
      assert(auths.get(0) == "", s"unexpected auth '${auths.get(0)}'")
      // property fallback — the in-process stand-in for the env var
      sys.props.put("GRAFT_EMBED_API_KEY", "sk-test-123")
      try {
        e.embedBatch(Seq(Seq("with auth")))
        assert(auths.get(1) == "Bearer sk-test-123")
      } finally sys.props.remove("GRAFT_EMBED_API_KEY")
      e.embedBatch(Seq(Seq("after removal")))
      assert(auths.get(2) == "")
    }
  }

  test("fail-fast: 5xx and dimension mismatch both throw, never mix vectors") {
    val segDim = 8
    withServer(segDim, failFirst = 1) { (url, _, _, _) =>
      val e = HttpFieldEmbedder(url, "fake-model", segDim)
      val ex = intercept[IllegalArgumentException] {
        e.embedBatch(Seq(Seq("boom")))
      }
      assert(ex.getMessage.contains("500"), ex.getMessage)
      // server healthy again: same adapter recovers on the next call
      assert(e.embedBatch(Seq(Seq("ok"))).head.length == segDim)
    }
    // server speaks 24-dim, adapter expects 8 → contract violation
    withServer(24) { (url, _, _, _) =>
      val e = HttpFieldEmbedder(url, "fake-model", segDim)
      val ex = intercept[IllegalArgumentException] {
        e.embedBatch(Seq(Seq("wrong width")))
      }
      assert(ex.getMessage.contains("24 dims"), ex.getMessage)
    }
  }

  test("withDerived embeds through Spark tasks against the loopback endpoint") {
    import spark.implicits._
    val segDim = 4
    withServer(segDim) { (url, hits, _, _) =>
      val e = HttpFieldEmbedder(url, "bge-small-en-v1.5", segDim)
      val derived = ProductGen.withDerived(
        ProductGen.baseColumns((0L until 16L).toDF("id")), e)
      val rows = derived.select(col("parent_asin"), col("embedding")).collect()
      assert(rows.length == 16)
      rows.foreach { r =>
        val v = r.getSeq[Float](1)
        assert(v.length == 7 * segDim)
        // every 384→4 segment of generated products is non-empty text →
        // all 7 segments unit-norm, whole-row norm √7
        val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
        assert(math.abs(norm - math.sqrt(7.0)) < 1e-3, s"row norm $norm")
      }
      // batched per task partition: far fewer requests than rows
      assert(hits.get() >= 1 && hits.get() <= 16, s"hits ${hits.get()}")
    }
  }
}
