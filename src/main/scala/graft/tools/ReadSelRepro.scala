package graft.tools
import graft.operators.VectorSearch
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
object ReadSelRepro {
  def main(args: Array[String]): Unit = {
    val builder = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
    graft.GraftSession.defaults.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.prepare(spark)
    val path = "/tmp/readsel_products2"
    graft.FsUtil.deleteRecursively(java.nio.file.Paths.get(path))
    graft.ProductWorkload.writeIndexed(spark, 100000, 2688, 32, path)
    try { new ProcessBuilder("sync").start().waitFor(); () } catch { case _: Throwable => () }
    Thread.sleep(3000)
    val products = spark.read.parquet(path)
    val queryVec = products.select(col("embedding")).head().getSeq[Float](0).toArray
    def topk(filter: Column): DataFrame =
      VectorSearch.topK(products, "embedding", queryVec, 100,
        Some(filter), projection = Seq("parent_asin"))
    val preds = graft.ProductWorkload.selPreds
    val selCounts = products.agg(
      count(lit(1)).as("total"),
      preds.map { case (n, p) => sum(p.cast("long")).as(n) }: _*).head()
    println("selCounts done " + selCounts.getLong(0))
    preds.foreach { case (n, p) =>
      (1 to 4).foreach { r =>
        val t0 = System.nanoTime()
        topk(p).collect()
        println(f"[$n] rep$r ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    spark.stop()
  }
}
