package graft.sources

/** A REAL [[FieldEmbedder]] adapter: posts field texts to an
  * OpenAI-compatible `/v1/embeddings` HTTP endpoint (the wire shape
  * llama.cpp, vLLM, Ollama, text-embeddings-inference and the hosted
  * APIs all speak — authenticated endpoints additionally need
  * `GRAFT_EMBED_API_KEY`, sent as `Authorization: Bearer` when set;
  * without it the adapter only works against unauthenticated local
  * servers) and reshapes the response into the engine's segment
  * contract — one `segDim`-wide UNIT-NORM segment per field, empty
  * fields embedding to the zero segment, concatenated in field order.
  * This is the executable example behind the adapter seam: point
  * `endpoint` at a bge-small-en-v1.5 server (the reference's model,
  * 384 dims) and [[graft.sources.ProductGen.withDerived]] embeds with
  * the real model instead of [[StubFieldEmbedder]].
  *
  * Ships UNUSED BY DEFAULT in this zero-egress build — nothing
  * constructs it except FieldEmbedderIntegrationSpec, which cancels
  * unless GRAFT_EMBED_ENDPOINT is set (README "Real embedding model").
  *
  * Serializable per the trait's contract: executors construct their own
  * HTTP client lazily (clients don't serialize); per-call overhead is
  * amortized by sending each [[embedBatch]]'s DISTINCT non-empty field
  * texts as ONE request — the batch signature exists for exactly this.
  * Failures throw (fail-fast): a training pipeline must never silently
  * mix stub and real vectors.
  */
final case class HttpFieldEmbedder(endpoint: String, model: String,
    segDim: Int, timeoutSeconds: Int = 60) extends FieldEmbedder {

  @transient private lazy val client: java.net.http.HttpClient =
    java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(timeoutSeconds.toLong))
      .build()

  // jackson rides on Spark's classpath — no extra dependency
  @transient private lazy val mapper =
    new com.fasterxml.jackson.databind.ObjectMapper()

  override def name: String = s"http:$model"

  override def embedBatch(rows: Seq[Seq[String]]): Seq[Array[Float]] = {
    val distinct = rows.flatten.filter(_.nonEmpty).distinct
    val byText: Map[String, Array[Float]] =
      if (distinct.isEmpty) Map.empty
      else distinct.zip(requestEmbeddings(distinct)).toMap
    rows.map { fields =>
      val out = new Array[Float](fields.length * segDim)
      fields.zipWithIndex.foreach { case (f, i) =>
        if (f.nonEmpty) {
          val v = byText(f)
          require(v.length == segDim,
            s"endpoint returned ${v.length} dims, segDim is $segDim")
          System.arraycopy(v, 0, out, i * segDim, segDim)
        } // empty field → zero segment, per the trait contract
      }
      out
    }
  }

  /** One POST for the whole distinct-text batch; unit-normalizes each
    * returned vector (the engine's segment contract — some servers
    * return unnormalized embeddings). Response order follows the
    * OpenAI shape's `index` field, not array order.
    */
  private def requestEmbeddings(texts: Seq[String]): Seq[Array[Float]] = {
    val payload = mapper.createObjectNode()
    payload.put("model", model)
    val arr = payload.putArray("input")
    texts.foreach(arr.add)
    val builder = java.net.http.HttpRequest.newBuilder(java.net.URI.create(endpoint))
      .timeout(java.time.Duration.ofSeconds(timeoutSeconds.toLong))
      .header("Content-Type", "application/json")
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
        mapper.writeValueAsString(payload)))
    // bearer auth for hosted OpenAI-compatible endpoints; env-sourced
    // (JVM system property accepted as a fallback — the common conf
    // override shape, and the only way an in-process spec can exercise
    // this path) so the key never rides in a serialized task closure
    val req = sys.env.get("GRAFT_EMBED_API_KEY")
      .orElse(sys.props.get("GRAFT_EMBED_API_KEY")).filter(_.nonEmpty)
      .fold(builder)(k => builder.header("Authorization", s"Bearer $k"))
      .build()
    val resp = client.send(req,
      java.net.http.HttpResponse.BodyHandlers.ofString())
    require(resp.statusCode() == 200,
      s"embedding endpoint ${resp.statusCode()}: ${resp.body().take(500)}")
    val root = mapper.readTree(resp.body())
    val data = root.get("data")
    require(data != null && data.isArray && data.size() == texts.length,
      s"expected ${texts.length} embeddings, got ${if (data == null) "none" else data.size().toString}")
    val out = new Array[Array[Float]](texts.length)
    data.forEach { item =>
      val idx = item.get("index").asInt()
      val emb = item.get("embedding")
      val v = new Array[Float](emb.size())
      var i = 0
      while (i < v.length) { v(i) = emb.get(i).floatValue(); i += 1 }
      var norm = 0.0
      v.foreach(x => norm += x.toDouble * x)
      val n = math.sqrt(norm)
      if (n > 0) { var j = 0; while (j < v.length) { v(j) = (v(j) / n).toFloat; j += 1 } }
      out(idx) = v
    }
    scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
  }
}
