package graft

import java.nio.file.{Files, Paths}

import graft.sources.ManifestStore

/** Crash-safety of the manifest pointer: whatever step a publisher dies at,
  * a reader always resolves a complete, previously-published version.
  */
class ManifestStoreSpec extends SparkSpec {

  private def freshRoot(): String = {
    val p = Files.createTempDirectory("graft-manifest").toString
    Files.delete(Paths.get(p))
    p
  }

  private def payload(n: Int) = {
    import spark.implicits._
    (1 to n).map(i => (i.toLong, s"v$n-$i")).toDF("id", "s")
  }

  private def readIds(root: String): Set[Long] =
    ManifestStore.resolve(spark, root).collect().map(_.getLong(0)).toSet

  test("publish then read: versions advance, current always complete") {
    val root = freshRoot()
    ManifestStore.publish(payload(3), root)
    assert(readIds(root) == Set(1L, 2L, 3L))
    ManifestStore.publish(payload(5), root)
    assert(readIds(root) == Set(1L, 2L, 3L, 4L, 5L))
    assert(ManifestStore.currentVersion(spark, root).get._1 == 2L)
  }

  test("crash between data write and pointer publish: old version reads") {
    val root = freshRoot()
    ManifestStore.publish(payload(2), root)
    // simulate the crash: the next version's data lands fully, but the
    // publisher dies before the manifest — exactly the window the old
    // bak/rename swap could NOT survive on an object store
    payload(9).write.mode("overwrite").parquet(s"$root/v-2")
    assert(readIds(root) == Set(1L, 2L), "orphan data dir is invisible")
    // recovery: the next publish reuses the orphaned number and wins
    ManifestStore.publish(payload(4), root)
    assert(readIds(root) == Set(1L, 2L, 3L, 4L))
  }

  test("crash mid-manifest-write: staged dot-file never resolves") {
    val root = freshRoot()
    ManifestStore.publish(payload(2), root)
    // a torn staged manifest (the rename never happened)
    Files.write(Paths.get(s"$root/_pub/.manifest-2-deadbeef"),
      "v-".getBytes("UTF-8"))
    assert(readIds(root) == Set(1L, 2L))
    assert(ManifestStore.currentVersion(spark, root).get._1 == 1L)
  }

  test("vacuum keeps the newest versions and the pointer chain readable") {
    val root = freshRoot()
    (1 to 4).foreach(i => ManifestStore.publish(payload(i), root))
    ManifestStore.vacuum(spark, root, keep = 2)
    assert(readIds(root) == (1L to 4L).toSet, "head survives vacuum")
    val dirs = new java.io.File(root).listFiles()
      .map(_.getName).filter(_.startsWith("v-")).toSet
    assert(dirs == Set("v-3", "v-4"), s"old data dirs dropped: $dirs")
    // resolve still works after another publish on the vacuumed store
    ManifestStore.publish(payload(6), root)
    assert(readIds(root) == (1L to 6L).toSet)
  }
}
