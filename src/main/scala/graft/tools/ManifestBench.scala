package graft.tools

import org.apache.spark.sql.SparkSession

/** Pins the IVF manifest checkpoint at the 65536-cell cap — the r8
  * watch-list item: the pre-r9 saveManifest materialized EVERY cell row
  * on the driver before `parallelize` (~700 MB of centroid floats plus
  * Row boxing at 65536 × 2688 — a multi-GB transient spike on every
  * append at the old checkpoint-every-append default). The r9 writer
  * slices cell rows at 4096 cells per write, so the transient boxed
  * footprint is bounded by the slice regardless of cell count; this
  * bench builds a synthetic cap-sized index handle (no data files, no
  * KMeans — the manifest path only touches driver state), checkpoints
  * it, reloads it, and prints wall time + the driver heap-use delta
  * across the write (coarse, via MemoryMXBean after a System.gc(), but
  * a multi-GB spike would dwarf its noise). Conclusions land in
  * SCALE.md; the cadence default (max(1, cells/8192)) in BASELINE.md.
  */
object ManifestBench {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .appName("manifest-bench").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cells = 65536
    val dims = 2688
    val rnd = new scala.util.Random(42)
    val centroids = Array.fill(cells)(Array.fill(dims)(rnd.nextFloat()))
    val radii = Array.fill(cells)(rnd.nextDouble())
    val counts = Array.fill(cells)(1000L)
    // a plausible occupancy table: one registered column, 32 values
    // spread across all cells — cells × 32 rows, the occupancy slicer's
    // real shape
    val occ = Map("cat" -> (for {
      c <- 0 until cells; v <- 0 until 32 if (c + v) % 8 == 0
    } yield (c, s"v$v") -> 50L).toMap)
    val dir = java.nio.file.Files.createTempDirectory("manifest_bench").toString
    val idx = graft.operators.VectorSearch.IvfIndex(dir, centroids, 1.0,
      radii, radii, counts, occ, Map("cat" -> "string"))
    println(s"[manifest] cells=$cells dims=$dims " +
      s"checkpointEveryDefault=${idx.manifestCheckpointEvery} " +
      s"occRows=${occ("cat").size}")

    val mem = java.lang.management.ManagementFactory.getMemoryMXBean
    def heapUsedMb(): Long = {
      System.gc(); Thread.sleep(200)
      mem.getHeapMemoryUsage.getUsed / (1024 * 1024)
    }
    (1 to 2).foreach { rep =>
      val before = heapUsedMb()
      // sample used-heap every 50 ms during the save: the PEAK minus the
      // baseline is the transient allocation the slicing bounds (the
      // pre-r9 writer's one-shot Row Seq would show up here as +GBs)
      val peak = new java.util.concurrent.atomic.AtomicLong(0L)
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val sampler = new Thread(() => {
        while (!stop.get()) {
          val u = mem.getHeapMemoryUsage.getUsed / (1024 * 1024)
          peak.accumulateAndGet(u, math.max(_, _))
          Thread.sleep(50)
        }
      })
      sampler.setDaemon(true)
      sampler.start()
      val t0 = System.nanoTime()
      idx.saveManifest(spark)
      val tSave = (System.nanoTime() - t0) / 1e9
      stop.set(true)
      sampler.join()
      val after = heapUsedMb()
      println(f"[manifest] rep=$rep save=$tSave%6.2f s  " +
        f"heapBefore=${before}MB peakDuringSave=${peak.get()}MB " +
        f"heapAfter=${after}MB transientPeakDelta=${peak.get() - before}MB")
    }
    val t1 = System.nanoTime()
    val loaded = graft.operators.VectorSearch.IvfIndex.load(spark, dir)
    val tLoad = (System.nanoTime() - t1) / 1e9
    println(f"[manifest] load=$tLoad%6.2f s  cells=${loaded.centroids.length} " +
      s"occRows=${loaded.occupancyTable("cat").size} ok=${
        loaded.centroids.length == cells &&
        loaded.occupancyTable("cat").size == occ("cat").size}")
    spark.stop()
    graft.FsUtil.deleteRecursively(java.nio.file.Paths.get(dir))
  }
}
