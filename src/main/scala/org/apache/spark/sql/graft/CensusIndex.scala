package org.apache.spark.sql.graft

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.{
  FileStatusCache, HadoopFsRelation, LogicalRelation, NoopCache,
  PartitionPath, PartitionSpec, PartitioningAwareFileIndex}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** A persisted FILE CENSUS for a cluster-partitioned parquet layout, and
  * the machinery to open the layout as a DataFrame FROM the census —
  * zero directory listing, zero footer reads.
  *
  * Why this exists: `spark.read.parquet(indexPath)` on an IVF index must
  * discover the partition tree before the first byte of data is read —
  * at 4,096 cluster directories that discovery ran as a multi-second
  * listing job (measured 5.64 s at 4,099 files, 10.31 s at 8,192 —
  * BENCH_scale_idx2m/idx4m_r14 `ann10m_plan_cold_*`), linear in file
  * count and headed to minute-scale at the 65536-cell cap on an object
  * store. The build already KNOWS every file it wrote; persisting that
  * knowledge next to the index manifest makes a fresh process's first
  * read cost ~the warm cost.
  *
  * This lives under `org.apache.spark.sql` because the construction path
  * is Spark-internal by necessity: a [[PartitioningAwareFileIndex]]
  * subclass serving `listFiles` from the resident census (partition
  * pruning included — the base class prunes on the supplied
  * [[PartitionSpec]] exactly as the listed variant would), wrapped in a
  * [[HadoopFsRelation]]. Delta Lake's `TahoeFileIndex` is the public
  * precedent for this exact shape.
  */
object CensusIndex {

  /** One data file: the partition value, path RELATIVE to the index root
    * (the census survives relocating the index), length and modtime.
    */
  final case class CensusFile(cluster: Int, relPath: String, length: Long,
      modTime: Long)

  /** Pull (dataSchema, census) out of an ALREADY-LISTED parquet relation
    * — free when the caller holds a DataFrame it just read: the
    * InMemoryFileIndex behind it is resident. None when `df` isn't a
    * single HadoopFsRelation over `root` with a one-int partition column
    * (the IVF layout), or when any file sits outside `root`.
    */
  def extract(df: DataFrame, root: String): Option[(StructType, Seq[CensusFile])] = {
    val rootUri = new Path(root).toUri
    def relativize(p: Path): Option[String] = {
      val s = p.toUri.getPath
      val r = rootUri.getPath
      if (s.startsWith(r + "/")) Some(s.substring(r.length + 1)) else None
    }
    df.queryExecution.analyzed.collectFirst {
      case LogicalRelation(rel: HadoopFsRelation, _, _, _, _)
          if rel.partitionSchema.length == 1 &&
            rel.partitionSchema.head.dataType == IntegerType =>
        val dirs = rel.location.listFiles(Nil, Nil)
        val files = dirs.flatMap { pd =>
          val c = pd.values.getInt(0)
          pd.files.map(f => relativize(f.getPath).map(rp =>
            CensusFile(c, rp, f.getLen, f.getModificationTime)))
        }
        if (files.exists(_.isEmpty)) None
        else Some((rel.dataSchema, files.map(_.get).toSeq))
    }.flatten
  }

  /** Open the layout at `root` as a DataFrame constructed purely from
    * the census: partition-pruning scans, pushed filters and column
    * pruning all behave exactly as on a listed relation — only the
    * discovery work is gone.
    */
  def relation(spark: SparkSession, root: String, partCol: String,
      dataSchema: StructType, files: Seq[CensusFile]): DataFrame = {
    val rootPath = new Path(root)
    val idx = new CensusFileIndex(spark, rootPath, partCol, files)
    val relation = HadoopFsRelation(
      idx,
      partitionSchema = StructType(Seq(
        StructField(partCol, IntegerType, nullable = true))),
      dataSchema = dataSchema,
      bucketSpec = None,
      fileFormat = new ParquetFileFormat,
      options = Map.empty)(spark)
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      LogicalRelation(relation, isStreaming = false))
  }

  /** [[PartitioningAwareFileIndex]] whose listing IS the census. The base
    * class supplies `listFiles` (with partition pruning against
    * [[partitionSpec]]), `allFiles`, `inputFiles` and `sizeInBytes`; this
    * class only materializes the maps those read from.
    */
  private final class CensusFileIndex(spark: SparkSession, root: Path,
      partCol: String, files: Seq[CensusFile])
      extends PartitioningAwareFileIndex(spark, Map.empty, None, NoopCache) {

    // Everything below is PRECOMPUTED ONCE. The base class calls
    // `leafDirToChildrenFiles` once per selected partition per
    // execution, so a `def` here rebuilds the whole dir map — with a
    // fresh `new Path` (URI parse) per entry — cells × plannedCells
    // times per query: measured 1.6 s of pure driver Path construction
    // per 384-cell probe on a 2048-cell index before these were vals.
    private val byCluster: Map[Int, Array[FileStatus]] =
      files.groupBy(_.cluster).map { case (c, fs) =>
        c -> fs.map(f => new FileStatus(f.length, false, 1, 128L << 20,
          f.modTime, new Path(root, f.relPath))).toArray
      }

    private val partDirs: Map[Int, Path] =
      byCluster.keys.map(c => c -> new Path(root, s"$partCol=$c")).toMap

    private val spec: PartitionSpec = PartitionSpec(
      StructType(Seq(StructField(partCol, IntegerType, nullable = true))),
      byCluster.keys.toSeq.sorted.map { c =>
        PartitionPath(InternalRow(c), partDirs(c))
      })

    override def partitionSpec(): PartitionSpec = spec

    private val leafFiles0: scala.collection.mutable.LinkedHashMap[Path, FileStatus] = {
      val m = scala.collection.mutable.LinkedHashMap.empty[Path, FileStatus]
      byCluster.toSeq.sortBy(_._1).foreach { case (_, fs) =>
        fs.foreach(f => m.put(f.getPath, f))
      }
      m
    }

    private val leafDirs0: Map[Path, Array[FileStatus]] =
      byCluster.map { case (c, fs) => partDirs(c) -> fs }

    override protected def leafFiles
        : scala.collection.mutable.LinkedHashMap[Path, FileStatus] = leafFiles0

    override protected def leafDirToChildrenFiles: Map[Path, Array[FileStatus]] =
      leafDirs0

    override def rootPaths: Seq[Path] = Seq(root)

    // the census is immutable driver state — freshness is the owning
    // handle's job (epoch check at load; append/refresh drop the handle's
    // census and fall back to a real listing)
    override def refresh(): Unit = ()
  }

  /** The current census EPOCH of an index directory — a tiny root-level
    * `_graft_epoch` file (underscore-hidden from parquet scans) bumped by
    * every writer BEFORE it adds data files. A persisted census tagged
    * with epoch E is trustworthy iff the file still reads E: an appender
    * that crashed after the bump but before re-persisting leaves a
    * mismatch, and the reader falls back to a real listing instead of
    * serving a file list that silently misses rows. None when the file is
    * absent or unreadable (pre-census layouts) — never trust, always
    * fall back.
    */
  def readEpoch(spark: SparkSession, root: String): Option[Long] = {
    val p = new Path(root, "_graft_epoch")
    try {
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        try {
          // read to EOF: a single read() may return a PREFIX ("12" → "1")
          // which parses as a VALID smaller epoch instead of garbage —
          // the one torn-read shape that would admit a stale census. A
          // legitimate epoch is ≤ 20 digits; anything longer is garbage
          // and overflowing the buffer surfaces as a parse failure → None.
          val buf = new Array[Byte](32)
          var off = 0
          var n = in.read(buf, off, buf.length - off)
          while (n > 0 && off < buf.length) {
            off += n
            n = if (off < buf.length) in.read(buf, off, buf.length - off) else -1
          }
          if (off <= 0 || (off >= buf.length && in.read() >= 0)) None
          else Some(new String(buf, 0, off, "UTF-8").trim.toLong)
        } finally in.close()
      }
    } catch { case _: Exception => None }
  }

  /** Overwrite the epoch file. Not atomic — a torn read parses as
    * garbage, [[readEpoch]] returns None, readers fall back to listing:
    * fail-safe by construction. Single writer per index, as everywhere.
    */
  def writeEpoch(spark: SparkSession, root: String, epoch: Long): Unit = {
    val p = new Path(root, "_graft_epoch")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(epoch.toString.getBytes("UTF-8"))
    finally out.close()
  }
}
