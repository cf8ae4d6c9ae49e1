package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Pins searchMulti's PLAN-COMPILE cost at serving-scale fan-out: Q=64
  * queries × nprobe=128 over a 256-cell index. The repo's round-7 finding
  * is that large literal `In` lists are plan-compile bombs (a 500-literal
  * isin measured 13.7 s of first-call analysis+codegen); searchMulti's
  * per-query probe masks are literal `isin` lists, so at serving Q the
  * mask array carries Q × nprobe literals across Q `when` branches.
  * This bench separates analysis+planning (`queryExecution.executedPlan`)
  * from first execution (codegen + run) and prints both, at the bench's
  * own Q=3 and at serving Q=64. Conclusions land in SCALE.md.
  */
object MaskCompileBench {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .appName("mask-compile-bench").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.prepare(spark)
    import spark.implicits._

    val dims = 64
    val n = 20000
    val rnd = new scala.util.Random(42)
    val df = (0 until n).map { i =>
      (i.toLong, Array.fill(dims)(rnd.nextFloat()))
    }.toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("mask_bench").toString
    val idx = graft.operators.VectorSearch.buildIvf(
      df, "embedding", 256, dir, sampleFraction = 1.0)
    // warm the machinery once (tiny Q) so the measured rows exclude
    // one-off session/codegen-framework startup
    idx.searchMulti(spark, Seq(Array.fill(dims)(rnd.nextFloat())), 10, 4,
      "vec_id").collect()

    Seq(3 -> 16, 64 -> 128).foreach { case (q, np) =>
      val queries = (0 until q).map(_ => Array.fill(dims)(rnd.nextFloat()))
      val t0 = System.nanoTime()
      val res = idx.searchMulti(spark, queries, 10, np, "vec_id")
      val tBuild = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      res.queryExecution.executedPlan // analysis + optimization + planning
      val tPlan = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime()
      val rows = res.collect().length // codegen + execution
      val tExec = (System.nanoTime() - t2) / 1e9
      // identical second invocation: codegen cache hits, so this is the
      // steady-state compute; (exec - exec2) is the one-off compile tail
      val res2 = idx.searchMulti(spark, queries, 10, np, "vec_id")
      val t3 = System.nanoTime()
      res2.collect()
      val tExec2 = (System.nanoTime() - t3) / 1e9
      println(f"[mask] Q=$q%-3d nprobe=$np%-4d build=$tBuild%6.2f s  plan=$tPlan%6.2f s  exec1=$tExec%6.2f s  exec2=$tExec2%6.2f s  (rows=$rows)")
    }

    // r9: mask-MECHANISM envelope at cap-scale unions. The MapType
    // literal's element_at is a LINEAR key scan — O(|union|) comparisons
    // per scanned row — so its cost grows with the probed-cell union
    // while the broadcast (cluster → bitmap) hash join stays O(1)/row.
    // This section isolates the two mechanisms on an in-memory frame
    // (2M rows, Q=64 bit-tests per row — the real searchMulti's per-row
    // shape minus the dot products) and prints the crossover that sets
    // VectorSearch.maskLiteralMaxCells.
    import org.apache.spark.sql.DataFrame
    val q64 = 64
    val words = (q64 + 63) / 64
    val maxCells = 16384
    val rows = spark.range(2000000L).select(col("id"),
        pmod(hash(col("id")), lit(maxCells)).cast("int").as("__cluster"),
        rand(7).as("x"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    rows.count()
    def qsums(masked: DataFrame): DataFrame =
      masked.select((0 until q64).map { qi =>
        sum(when(
          shiftright(element_at(col("__mask"), qi / 64 + 1), qi % 64)
            .bitwiseAND(1L) === 1L, col("x"))).as(s"s$qi")
      }: _*)
    Seq(256, 1024, 4096, 10240, 16384).foreach { cells =>
      val maskMap: Map[Int, Seq[Long]] =
        (0 until cells).map(c => c -> Seq.fill(words)(-1L)).toMap
      val base = rows.filter(col("__cluster") < cells)
      def timeBoth(label: String, masked: => DataFrame): Unit = {
        val t0 = System.nanoTime()
        qsums(masked).collect()
        val e1 = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        qsums(masked).collect()
        val e2 = (System.nanoTime() - t1) / 1e9
        println(f"[maskmech] union=$cells%-6d $label%-9s exec1=$e1%6.2f s  exec2=$e2%6.2f s")
      }
      timeBoth("literal", base.withColumn("__mask",
        element_at(typedLit(maskMap), col("__cluster"))))
      timeBoth("bcastjoin", {
        import spark.implicits._
        base.join(broadcast(maskMap.toSeq.toDF("__cluster", "__mask")),
          Seq("__cluster"))
      })
    }
    spark.stop()
    graft.FsUtil.deleteRecursively(java.nio.file.Paths.get(dir))
  }
}
