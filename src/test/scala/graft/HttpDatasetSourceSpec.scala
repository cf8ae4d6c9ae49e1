package graft

import java.io.ByteArrayOutputStream
import java.net.InetSocketAddress
import java.nio.file.{Files, Path}
import java.util.concurrent.atomic.AtomicInteger
import java.util.zip.GZIPOutputStream

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.sources.HttpDatasetSource
import org.apache.spark.sql.functions._

/** Exercises the HTTPS dataset source end-to-end against an in-process
  * loopback server (127.0.0.1, ephemeral port — no egress): plain fetch
  * into spark.read, Range resume of a partial file, retry-after-5xx,
  * gzip decode, checksum rejection, idempotent re-fetch, and the
  * distributed many-shard pull.
  */
class HttpDatasetSourceSpec extends SparkSpec {

  /** Serve `bytes` at `/data`, honoring Range when `ranges`; count
    * requests and fail the first `failFirst` with 500.
    */
  private def withServer(bytes: Array[Byte], ranges: Boolean = false,
      failFirst: Int = 0, gzip: Boolean = false)(
      body: (String, AtomicInteger, java.util.List[String]) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val hits = new AtomicInteger(0)
    val rangeHeaders =
      java.util.Collections.synchronizedList(new java.util.ArrayList[String]())
    server.createContext("/data", (ex: HttpExchange) => {
      val n = hits.incrementAndGet()
      val rangeHdr = Option(ex.getRequestHeaders.getFirst("Range"))
      rangeHdr.foreach(rangeHeaders.add)
      try {
        if (n <= failFirst) {
          ex.sendResponseHeaders(500, -1)
        } else if (gzip) {
          val bos = new ByteArrayOutputStream()
          val gz = new GZIPOutputStream(bos)
          gz.write(bytes); gz.close()
          val payload = bos.toByteArray
          ex.getResponseHeaders.set("Content-Encoding", "gzip")
          ex.sendResponseHeaders(200, payload.length.toLong)
          ex.getResponseBody.write(payload)
        } else rangeHdr match {
          case Some(r) if ranges =>
            val from = r.stripPrefix("bytes=").takeWhile(_ != '-').toInt
            val rest = bytes.drop(from)
            ex.getResponseHeaders.set("Content-Range",
              s"bytes $from-${bytes.length - 1}/${bytes.length}")
            ex.sendResponseHeaders(206, rest.length.toLong)
            ex.getResponseBody.write(rest)
          case _ =>
            ex.sendResponseHeaders(200, bytes.length.toLong)
            ex.getResponseBody.write(bytes)
        }
      } finally ex.close()
    })
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}/data",
      hits, rangeHeaders)
    finally server.stop(0)
  }

  private def tmpDir(): Path = Files.createTempDirectory("http_src")

  private def parquetBytes(): Array[Byte] = {
    val dir = Files.createTempDirectory("http_src_gen")
    spark.range(0, 100).select(col("id"),
        (col("id") % 7).cast("string").as("k"))
      .coalesce(1).write.mode("overwrite").parquet(dir.toString)
    val f = Files.list(dir).filter(_.toString.endsWith(".parquet"))
      .findFirst().get()
    Files.readAllBytes(f)
  }

  test("fetch + spark.read round trip, and re-fetch is a no-op") {
    val bytes = parquetBytes()
    withServer(bytes) { (url, hits, _) =>
      val dest = tmpDir()
      val f1 = HttpDatasetSource.fetch(url, dest,
        fileName = Some("t.parquet"))
      assert(f1.bytes == bytes.length && f1.attempts == 1)
      val df = spark.read.parquet(f1.path)
      assert(df.count() == 100)
      assert(df.select(sum("id")).head().getLong(0) == 4950L)
      // complete file short-circuits: no second HTTP request
      val before = hits.get()
      val f2 = HttpDatasetSource.fetch(url, dest,
        fileName = Some("t.parquet"))
      assert(f2.attempts == 0 && hits.get() == before)
    }
  }

  test("a leftover .part resumes with a Range request, bytes land intact") {
    val bytes = parquetBytes()
    withServer(bytes, ranges = true) { (url, _, rangeHeaders) =>
      val dest = tmpDir()
      val cut = bytes.length / 3
      Files.write(dest.resolve("t.parquet.part"), bytes.take(cut))
      val f = HttpDatasetSource.fetch(url, dest, fileName = Some("t.parquet"))
      assert(f.resumed)
      assert(rangeHeaders.get(0) == s"bytes=$cut-")
      assert(Files.readAllBytes(java.nio.file.Paths.get(f.path))
        .sameElements(bytes))
      assert(spark.read.parquet(f.path).count() == 100)
    }
  }

  test("server ignoring Range restarts the download cleanly") {
    val bytes = parquetBytes()
    withServer(bytes, ranges = false) { (url, _, _) =>
      val dest = tmpDir()
      Files.write(dest.resolve("t.parquet.part"),
        Array.fill[Byte](17)(0x5a)) // garbage prefix a blind append would keep
      val f = HttpDatasetSource.fetch(url, dest, fileName = Some("t.parquet"))
      assert(Files.readAllBytes(java.nio.file.Paths.get(f.path))
        .sameElements(bytes))
    }
  }

  test("transient 500s are retried with backoff; 404 is not") {
    val bytes = "hello dataset".getBytes
    withServer(bytes, failFirst = 2) { (url, hits, _) =>
      val f = HttpDatasetSource.fetch(url, tmpDir(), maxRetries = 4,
        backoffMs = 1L)
      assert(f.attempts == 3 && hits.get() == 3)
    }
    withServer(bytes) { (url, hits, _) =>
      val bad = url.replace("/data", "/missing")
      val e = intercept[IllegalArgumentException] {
        HttpDatasetSource.fetch(bad, tmpDir(), maxRetries = 4, backoffMs = 1L)
      }
      assert(e.getMessage.contains("404"))
      assert(hits.get() == 0) // /missing never reaches the /data context
    }
  }

  test("Content-Encoding gzip decodes transparently") {
    val text = (1 to 50).map(i => s"""{"id":$i}""").mkString("\n")
    withServer(text.getBytes, gzip = true) { (url, _, _) =>
      val f = HttpDatasetSource.fetch(url, tmpDir(),
        fileName = Some("d.jsonl"))
      assert(Files.readString(java.nio.file.Paths.get(f.path)) == text)
      assert(spark.read.json(f.path).count() == 50)
    }
  }

  test("sha256 mismatch rejects the download; match passes") {
    val bytes = "payload".getBytes
    val good = java.security.MessageDigest.getInstance("SHA-256")
      .digest(bytes).map("%02x".format(_)).mkString
    withServer(bytes) { (url, _, _) =>
      intercept[java.io.IOException] {
        HttpDatasetSource.fetch(url, tmpDir(), maxRetries = 1,
          expectedSha256 = Some("0" * 64), backoffMs = 1L)
      }
      val f = HttpDatasetSource.fetch(url, tmpDir(),
        expectedSha256 = Some(good))
      assert(f.bytes == bytes.length)
    }
  }

  test("fetchDistributed pulls every shard via tasks") {
    val bytes = parquetBytes()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val hits = new AtomicInteger(0)
    (0 until 4).foreach { i =>
      server.createContext(s"/shard$i.parquet", (ex: HttpExchange) => {
        hits.incrementAndGet()
        try {
          ex.sendResponseHeaders(200, bytes.length.toLong)
          ex.getResponseBody.write(bytes)
        } finally ex.close()
      })
    }
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val dest = tmpDir()
      val shards = (0 until 4).map(i => s"$base/shard$i.parquet")
      val rows = HttpDatasetSource
        .fetchDistributed(spark, shards, dest.toString)
        .collect()
      assert(rows.length == 4)
      assert(hits.get() == 4)
      assert(rows.forall(_.getAs[Long]("bytes") == bytes.length.toLong))
      val df = spark.read.parquet(dest.toString)
      assert(df.count() == 400) // 4 shards × 100 rows
    } finally server.stop(0)
  }

  test("readParquet composes fetchAll + spark.read over several URLs") {
    val bytes = parquetBytes()
    withServer(bytes) { (url, _, _) =>
      val df = HttpDatasetSource.readParquet(spark, Seq(url), tmpDir())
      assert(df.count() == 100)
    }
  }

  test("fileNameFor decodes exactly once and never yields a traversal name") {
    // double-encoded traversal: one decode leaves literal "%2F" text, a
    // second would have produced "../../etc/crontab"
    val doubled = HttpDatasetSource.fileNameFor(
      "http://host/d/..%252F..%252Fetc%252Fcrontab")
    assert(doubled == "..%2F..%2Fetc%2Fcrontab")
    assert(!doubled.contains("/"))
    // '+' is NOT application/x-www-form-urlencoded space in a URL path
    assert(HttpDatasetSource.fileNameFor("http://host/a+b.parquet")
      == "a+b.parquet")
    // single-encoded slash decodes inside getPath; the separator is
    // neutralized rather than resolved
    val single = HttpDatasetSource.fileNameFor("http://host/a%2Fb.parquet")
    assert(!single.contains("/") && single.endsWith("b.parquet"))
    // a segment that decodes to dots-only cannot name a directory
    assert(HttpDatasetSource.fileNameFor("http://host/%2E%2E") == "download")
  }

  test("fetch refuses a fileName that resolves outside destDir") {
    val bytes = parquetBytes()
    withServer(bytes) { (url, hits, _) =>
      val dest = tmpDir()
      val ex = intercept[java.io.IOException] {
        HttpDatasetSource.fetch(url, dest,
          fileName = Some("../escaped.parquet"))
      }
      assert(ex.getMessage.contains("refusing to write outside"))
      assert(hits.get() == 0) // rejected before any request
      assert(!Files.exists(dest.getParent.resolve("escaped.parquet")))
    }
  }
}
