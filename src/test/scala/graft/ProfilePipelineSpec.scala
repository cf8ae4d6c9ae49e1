package graft

import graft.operators.ProfilePipeline
import java.nio.file.{Files, Paths}

class ProfilePipelineSpec extends SparkSpec {
  import spark.implicits._

  test("pipeline writes per-dataset reports and a summary") {
    val root = Files.createTempDirectory("profpipe").toString
    val small = Seq((1L, 10.0, "x"), (2L, 20.0, "y")).toDF("id", "v", "c")
    val large = Seq((1L, 12.0, "x"), (2L, 22.0, "y"), (3L, 32.0, "x"))
      .toDF("id", "v", "c")
    small.write.parquet(s"$root/data_small")
    large.write.parquet(s"$root/data_large")

    val out = s"$root/reports"
    val reports = ProfilePipeline.run(spark,
      Seq("small" -> s"$root/data_small", "large" -> s"$root/data_large"), out)

    assert(reports.map(_.name) == Seq("small", "large"))
    assert(reports.map(_.profile.rows) == Seq(2L, 3L))
    assert(reports.forall(_.sizeMb > 0))
    val md = Files.readString(Paths.get(out, "small", "README.md"))
    assert(md.contains("# Dataset profile: small"))
    val json = Files.readString(Paths.get(out, "small", "stats.json"))
    assert(json.contains("\"rows\": 2"))
    val summary = Files.readString(Paths.get(out, "summary_report.md"))
    assert(summary.contains("| small | 2 |") && summary.contains("| large | 3 |"))
  }

  test("cross-scale consistency: documents profile stable from sf0.001 to sf0.01") {
    // the reference's sampling-validation surface (SURVEY §2.10): the same
    // profile run at two scales must agree on distributional stats
    val small = ProfilePipeline.analyzeDataset(spark, "sf0.001",
      "/root/testdata/sf0.001/lineitem.parquet")
    val large = ProfilePipeline.analyzeDataset(spark, "sf0.01",
      "/root/testdata/sf0.01/lineitem.parquet")
    assert(large.profile.rows > small.profile.rows)
    val smallPrice = small.profile.numeric.find(_.column == "l_extendedprice").get
    val largePrice = large.profile.numeric.find(_.column == "l_extendedprice").get
    // means within 15% across a 10x scale step
    assert(math.abs(smallPrice.mean - largePrice.mean) /
      largePrice.mean < 0.15,
      s"mean l_extendedprice drifted: ${smallPrice.mean} vs ${largePrice.mean}")
    val md = ProfilePipeline.run(spark,
      Seq("sf0.001" -> "/root/testdata/sf0.001/lineitem.parquet",
        "sf0.01" -> "/root/testdata/sf0.01/lineitem.parquet"),
      java.nio.file.Files.createTempDirectory("xscale").toString)
    assert(md.length == 2)
  }

  test("pipeline renders the PNG report figures") {
    val root = Files.createTempDirectory("profplots").toString
    val df = (0 until 60).map { i =>
      val c = i % 3
      (i.toLong, 10.0 + i % 7, if (i % 5 == 0) null else s"cat$c",
        Array.tabulate(6)(j =>
          (if (j == c * 2) 5.0f else 0.1f) + (math.sin(i * 6 + j) * 0.2).toFloat))
    }.toDF("id", "v", "c", "embedding")
    df.write.parquet(s"$root/data")
    val out = s"$root/reports"
    ProfilePipeline.run(spark, Seq("d" -> s"$root/data"), out,
      embeddingCol = Some("embedding"), labelCol = Some("c"),
      plotSampleN = 50, idCol = Some("id"))
    val dir = Paths.get(out, "d")
    val expected = Seq("category_analysis.png", "null_analysis.png",
      "correlation_analysis.png", "embedding_norms.png",
      "embedding_dim_mean.png", "embedding_dim_std.png",
      "pca_projection.png", "tsne_projection.png", "umap_projection.png",
      "cosine_similarity.png", "cosine_distribution.png")
    expected.foreach { f =>
      val p = dir.resolve(f)
      assert(Files.exists(p), s"missing figure $f")
      assert(javax.imageio.ImageIO.read(p.toFile) != null,
        s"figure $f did not decode as a PNG")
    }
    // at least one per-numeric-column histogram rendered
    assert(Files.list(dir).toArray.map(_.toString)
      .exists(_.endsWith("_hist.png")))
    // plots = false renders nothing extra
    val out2 = s"$root/reports2"
    ProfilePipeline.run(spark, Seq("d" -> s"$root/data"), out2,
      embeddingCol = Some("embedding"), plots = false)
    assert(!Files.list(Paths.get(out2, "d")).toArray.map(_.toString)
      .exists(_.endsWith(".png")))
  }

  test("embedding stats included when the column exists") {
    val root = Files.createTempDirectory("profpipe2").toString
    Seq((1L, Array(3.0f, 4.0f)), (2L, Array(0.0f, 5.0f)))
      .toDF("id", "embedding").write.parquet(s"$root/vecs")
    val r = ProfilePipeline.analyzeDataset(spark, "vecs", s"$root/vecs",
      embeddingCol = Some("embedding"))
    assert(r.embedding.exists(e => e.count == 2 && e.dims == 2))
    // the non-vector profile must not include the embedding column
    assert(!r.profile.nulls.contains("embedding"))
  }
}
