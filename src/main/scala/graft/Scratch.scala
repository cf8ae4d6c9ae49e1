package graft

import org.apache.spark.sql.SparkSession

/** Flagship smoke: run SparkEntry.entry and show rows (driver checks rows>0). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val builder = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
    GraftSession.defaults.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(10, truncate = false)
    println(s"flagship rows=$n")
    require(n > 0, "flagship query returned 0 rows")
    spark.stop()
  }
}
