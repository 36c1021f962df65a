package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Object-store-safe atomic pointer for published table versions — the
  * commit protocol a table format provides, without the dependency.
  *
  * Layout under a store root:
  * {{{
  *   <root>/v-<n>/...            immutable data directories
  *   <root>/_pub/manifest-<n>    tiny pointer files, content = "v-<n>"
  * }}}
  *
  * A publish writes the new data directory FIRST, then makes it visible by
  * creating the next-numbered manifest (staged as a dot-file, renamed into
  * place). Readers list `_pub`, take the highest manifest number, and read
  * the directory it names. Safety argument, step by step:
  *
  *  - crash while writing `v-<n>`: no manifest names it — readers still
  *    resolve the previous version; the orphan directory is overwritten by
  *    the next publish (same number) or removed by [[vacuum]];
  *  - crash while writing the staged manifest: its dot-name is ignored by
  *    readers; the publish never happened;
  *  - the commit point is a single create-rename of a tiny immutable file
  *    to a name that does not exist yet — atomic on HDFS/local, and on
  *    copy-emulated object stores the copy of a closed killobyte file is
  *    all-or-nothing from a reader's perspective (a reader either lists
  *    the name or doesn't; a finished single-object PUT of a kilobyte file
  *    is never partially visible on any real object store);
  *  - manifests are never modified or renamed over — no delete-then-rename
  *    window anywhere, unlike a `.bak` swap of the data directory itself.
  *
  * Scale: the pointer file is O(bytes) regardless of table size; publishing
  * 100 TB moves no data at commit time. Concurrent publishers race on the
  * manifest name and exactly one rename wins; the loser's staged file is
  * removed and the publish retried against the new head.
  */
object ManifestStore {

  private val PubDir = "_pub"
  private val Prefix = "manifest-"

  private def fsOf(s: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(s.sparkContext.hadoopConfiguration)

  /** Highest published (number, data dir), if any. Staged dot-files and
    * foreign names are ignored.
    */
  def currentVersion(s: SparkSession, root: String): Option[(Long, String)] = {
    val fs = fsOf(s, root)
    val pub = new Path(root, PubDir)
    if (!fs.exists(pub)) return None
    val heads = fs.listStatus(pub).iterator
      .map(_.getPath.getName)
      .filter(n => n.startsWith(Prefix) && n.drop(Prefix.length).forall(_.isDigit))
      .map(_.drop(Prefix.length).toLong)
    if (!heads.hasNext) None
    else {
      val n = heads.max
      val in = fs.open(new Path(pub, s"$Prefix$n"))
      val body =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
      Some((n, s"$root/$body"))
    }
  }

  /** Resolve the current version's data as a DataFrame. */
  def resolve(s: SparkSession, root: String): DataFrame =
    currentVersion(s, root) match {
      case Some((_, dir)) => s.read.parquet(dir)
      case None => sys.error(s"ManifestStore: nothing published under $root")
    }

  /** Publish `df` as the next version: data first, pointer last. Returns
    * the published data directory.
    */
  def publish(df: DataFrame, root: String): String =
    publishWith(df.sparkSession, root)(dir =>
      df.write.mode("overwrite").parquet(dir))

  /** Publish whatever `write` produces at the handed-out directory. The
    * directory only becomes visible to readers if `write` completes and
    * the manifest rename succeeds.
    */
  def publishWith(s: SparkSession, root: String)(write: String => Unit): String = {
    val fs = fsOf(s, root)
    val n = currentVersion(s, root).map(_._1).getOrElse(0L) + 1L
    val name = s"v-$n"
    val dir = s"$root/$name"
    write(dir)
    val pub = new Path(root, PubDir)
    fs.mkdirs(pub)
    val staged = new Path(pub, s".$Prefix$n-${java.util.UUID.randomUUID()}")
    val out = fs.create(staged, false)
    try out.write(s"$name\n".getBytes(StandardCharsets.UTF_8))
    finally out.close()
    val target = new Path(pub, s"$Prefix$n")
    if (!fs.rename(staged, target)) {
      fs.delete(staged, false): Unit
      sys.error(s"ManifestStore: lost the publish race for $target")
    }
    dir
  }

  /** Drop versions older than the newest `keep` (data dirs + manifests +
    * any orphan/staged leftovers below the horizon). The current version
    * is always kept.
    */
  def vacuum(s: SparkSession, root: String, keep: Int = 2): Unit = {
    require(keep >= 1, "must keep at least the current version")
    val fs = fsOf(s, root)
    currentVersion(s, root).foreach { case (head, _) =>
      val horizon = head - keep + 1
      val pub = new Path(root, PubDir)
      fs.listStatus(pub).foreach { st =>
        val nm = st.getPath.getName
        val keepIt = nm.startsWith(Prefix) &&
          nm.drop(Prefix.length).forall(_.isDigit) &&
          nm.drop(Prefix.length).toLong >= horizon
        if (!keepIt) fs.delete(st.getPath, false): Unit
      }
      fs.listStatus(new Path(root)).foreach { st =>
        val nm = st.getPath.getName
        if (nm.startsWith("v-") && nm.drop(2).forall(_.isDigit) &&
          nm.drop(2).toLong < horizon)
          fs.delete(st.getPath, true): Unit
      }
    }
  }
}
