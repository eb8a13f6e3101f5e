package graft

/** Local-filesystem scratch cleanup shared by the bench/tooling paths.
  * LOCAL-ONLY by design (bench scratch stores, SfGen part-dirs, test
  * temp state): anything that can live on a URI-schemed or remote path
  * must go through Hadoop `FileSystem` instead — see
  * `state/DigestIndex.append`'s replay wipe. */
object LocalFiles {
  /** Recursive delete; tolerates concurrent removal (null listFiles). */
  def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) {
      val children = f.listFiles()
      if (children != null) children.foreach(deleteRec)
    }
    f.delete()
  }
}
