package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** End-to-end profiling pipeline — the reference's `run_full_analysis`
  * (`gbr.py:816-848`): profile each dataset, render a markdown + JSON report
  * per dataset, then a cross-dataset summary.
  *
  * Execution shape per dataset: the §2.4 aggregation passes (each a narrow
  * multi-agg job; only the categorical top-k and embedding stats shuffle,
  * both on tiny key spaces), a few collected stat rows, then driver-side
  * rendering. The embedding column is read ONLY by the embedding stats pass
  * (column pruning keeps it out of every other scan — it is ~90% of the
  * bytes at the reference's 10M scale).
  */
object ProfilePipeline {

  final case class DatasetReport(name: String, profile: Profile.TableProfile,
      embedding: Option[Profile.EmbeddingStats], sizeMb: Double)

  /** Profile one parquet dataset; `embeddingCol` adds vector analytics. */
  def analyzeDataset(spark: SparkSession, name: String, path: String,
      embeddingCol: Option[String] = None): DatasetReport = {
    val df = spark.read.parquet(path)
    val nonVec = embeddingCol.foldLeft(df)((d, c) => d.drop(c))
    val profile = Profile.profile(nonVec)
    val emb = embeddingCol
      .filter(df.columns.contains)
      .map(c => Profile.embeddingStats(df, c))
    DatasetReport(name, profile, emb, Profile.fileSizeMb(df, path))
  }

  /** Analyze every (name → path) dataset and write
    * `outDir/<name>/README.md`, `outDir/<name>/stats.json` and a top-level
    * `outDir/summary_report.md` — the reference's report tree
    * (`reports/benchmark_{10k,100k,1M,10M}/README.md` and
    * `reports/summary_report.md`).
    */
  def run(spark: SparkSession, datasets: Seq[(String, String)], outDir: String,
      embeddingCol: Option[String] = None): Seq[DatasetReport] = {
    val reports = datasets.map { case (name, path) =>
      val r = analyzeDataset(spark, name, path, embeddingCol)
      val dir = Paths.get(outDir, name)
      Files.createDirectories(dir)
      val md = new StringBuilder(Profile.renderMarkdown(name, r.profile))
      md.append(f"\n## Dataset file\n\n- size: ${r.sizeMb}%.1f MB\n")
      r.embedding.foreach { e =>
        md.append(s"\n## Embedding\n\n- vectors: ${e.count}\n- dims: ${e.dims}\n")
        md.append(f"- mean L2 norm: ${e.normMean}%.4f ± ${e.normStd}%.4f\n")
      }
      Files.writeString(dir.resolve("README.md"), md.toString)
      Files.writeString(dir.resolve("stats.json"),
        Profile.renderJson(name, r.profile))
      r
    }
    Files.createDirectories(Paths.get(outDir))
    Files.writeString(Paths.get(outDir, "summary_report.md"),
      Profile.renderSummaryMarkdown(reports.map(r => r.name -> r.profile)))
    reports
  }
}
