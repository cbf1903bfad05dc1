package graft.operators

/** The cheap at-rest integrity token shared by the append-validated
  * stores (band index, corpus text store, and — since idx7 — the
  * components artifact's shingle/sizes index dirs): data-file COUNT +
  * total BYTES from one parallel listing of a store's partition dirs.
  *
  * Why a listing and not a row count: the torn-append failure mode both
  * stores guard against is a crash between a committed row append and
  * its meta rewrite — which leaves whole committed FILES beyond what
  * meta records, never a partial file (the committer publishes files
  * atomically per task). A (file count, byte sum) mismatch therefore
  * detects every tear a footer row-count did, but costs one listing
  * instead of opening every file's row-group footer — and the footer
  * pass is O(store files) per APPEND: the round-14 cstore_append probe
  * measured it growing 8.8 → 42 → 92 s across ×1/×10/×100 (a ~9k-file
  * store pays ~7-9 s of pure footer opens per append) on an operation
  * whose write side is increment-bounded. Row-count validation remains
  * where it belongs: build time and the compaction's row-preserving
  * invariant, both already corpus-scale maintenance ops.
  *
  * Listing is parallel on a bounded driver pool for the same
  * object-storage argument as [[PartitionCompaction]]'s drift
  * detection (10⁵ dirs × ~50 ms/list serial ≈ hours; ~minutes at
  * 32-way). Underscore/dot-prefixed entries are invisible, matching
  * Spark's own file-listing rules. */
private[graft] object StoreManifest {

  /** (data file count, total data bytes) under `root`'s immediate
    * partition dirs (one level: `partPrefix=value/files`), plus any
    * data files directly at root. */
  def list(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): (Long, Long) = {
    val d = listDetailed(fs, root)
    (d.files, d.bytes)
  }

  /** [[list]] plus the per-partition-dir fragmentation maximum —
    * `maxPerDir` is the largest data-file count among the immediate
    * partition dirs (0 when there are none). One parallel listing
    * serves BOTH the torn-append manifest and a store's
    * file-fragmentation drift check; before round 15 the components
    * append paid a SECOND, serial O(buckets) listing of the same dirs
    * for the drift direction-(c) probe — ~minutes per append at 4096
    * object-storage dirs, on an increment-bounded operation. */
  final case class Detailed(files: Long, bytes: Long, maxPerDir: Int)

  def listDetailed(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Detailed = {
    import scala.jdk.CollectionConverters._
    def visible(n: String): Boolean = !n.startsWith("_") && !n.startsWith(".")
    val top = fs.listStatus(root).filter(st => visible(st.getPath.getName))
    val (dirs, rootFiles) = top.partition(_.isDirectory)
    var files = rootFiles.length.toLong
    var bytes = rootFiles.map(_.getLen).sum
    var maxPerDir = 0
    if (dirs.nonEmpty) {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(32, dirs.length))
      try {
        val parts = pool.invokeAll(dirs.toSeq.map { st =>
          new java.util.concurrent.Callable[(Long, Long)] {
            def call(): (Long, Long) = {
              val fsFiles = fs.listStatus(st.getPath)
                .filter(f => f.isFile && visible(f.getPath.getName))
              (fsFiles.length.toLong, fsFiles.map(_.getLen).sum)
            }
          }
        }.asJava).asScala.map(_.get()) // rethrows any listing failure
        files += parts.map(_._1).sum
        bytes += parts.map(_._2).sum
        maxPerDir = parts.map(_._1).foldLeft(0L)(math.max).toInt
      } finally pool.shutdown()
    }
    Detailed(files, bytes, maxPerDir)
  }
}
