package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}

/** Versioned, crash-atomic manifest directory layout shared by the
  * engine's durable index artifacts
  * ([[VectorSearch.IvfIndex.saveManifest]]/`load` since r9, and
  * [[Dedup.NearDupIndex.save]]/`load` since r12): every checkpoint
  * writes a FRESH `v########` directory and makes it visible with a
  * `_graft_commit` marker written LAST — never an in-place overwrite.
  * A crash mid-write leaves an uncommitted dir readers ignore (the
  * previous committed version keeps serving), and a concurrent reader
  * can never observe a half-replaced artifact. The two newest committed
  * versions are kept as a grace window for in-flight readers; older
  * versions and sub-floor crashed dirs are vacuumed on the next commit.
  * Single writer per artifact root, by contract.
  */
private[graft] object ManifestLayout {
  private val VersionRe = "^v(\\d{8})$".r
  val CommitMarker = "_graft_commit"

  /** (version, committed) for every `v########` directory under `root` —
    * committed = its commit marker exists. Empty when the root is absent
    * or holds no versioned dirs.
    */
  def versions(fs: FileSystem, root: Path): Seq[(Long, Boolean)] =
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.flatMap { st =>
      st.getPath.getName match {
        case VersionRe(n) if st.isDirectory =>
          Seq(n.toLong -> fs.exists(new Path(st.getPath, CommitMarker)))
        case _ => Seq.empty
      }
    }

  def versionDir(root: String, v: Long): String = f"$root/v$v%08d"

  /** The version number a new checkpoint should write. */
  def nextVersion(versions: Seq[(Long, Boolean)]): Long =
    (versions.map(_._1) :+ 0L).max + 1

  /** Directory of the newest COMMITTED version, if any. */
  def newestCommittedDir(fs: FileSystem, root: String): Option[String] = {
    val committed = versions(fs, new Path(root)).filter(_._2).map(_._1)
    if (committed.isEmpty) None else Some(versionDir(root, committed.max))
  }

  /** Write the commit marker for `next` (making it visible to readers),
    * then vacuum everything older than the two newest committed
    * versions. Call ONLY after every payload file of `next` is on disk.
    */
  def commitAndVacuum(fs: FileSystem, root: String, next: Long,
      priorVersions: Seq[(Long, Boolean)]): Unit = {
    fs.create(new Path(versionDir(root, next), CommitMarker)).close()
    val committed = (priorVersions.filter(_._2).map(_._1) :+ next).sorted
    val keepFrom = committed.takeRight(2).head
    priorVersions.foreach { case (v, _) =>
      if (v < keepFrom) { fs.delete(new Path(versionDir(root, v)), true); () }
    }
  }
}
