package graft.sources

import org.apache.spark.sql.SparkSession

/** Exclusion-pruned directory discovery shared by every batch file leg
  * (text, PDF, JSONL — reference: src/indexer.ts:350-387 `discoverFiles`
  * skips excluded folders during its walk, it does not list-then-filter).
  *
  * `recursiveFileLookup` + a plan-side segment filter gets the right ANSWER
  * but lists the excluded subtrees anyway — at 100 TB the listing itself is
  * object-store RPC cost, and a `node_modules`-shaped tree can hold more
  * FILES than the corpus. This walk enforces exclusion at DESCENT: an
  * excluded directory is never entered, so listing cost is proportional to
  * the INCLUDED tree. The included directories then feed `spark.read` as
  * explicit non-recursive load paths (each lists exactly its own files;
  * nested loads don't duplicate because no listed dir is descended twice).
  *
  * Scale shape: the walk is breadth-first over directory FRONTIERS — small
  * frontiers list driver-side, wide ones distribute as one Spark job per
  * level (the same escalation Spark's own InMemoryFileIndex applies), so a
  * million-directory tree never serializes through a single thread. Only
  * directory PATHS ever come back to the driver, bounded by the included
  * tree's directory count — the same driver state Spark's file index holds
  * for the identical read.
  *
  * Parity with the `recursiveFileLookup` shape it replaces: exclusion is by
  * exact directory NAME ("redist" survives `excludedFolders = ["dist"]`),
  * and '.'/'_'-prefixed directories are skipped like Spark's hidden-path
  * convention skips them during recursive listing (the root itself is
  * always included, also like Spark). A root that is missing or a plain
  * file passes through as the sole load path so `spark.read` raises its
  * standard error (or reads the single file) exactly as before.
  */
object PrunedListing {

  /** Frontier size above which a level's listing runs as a Spark job. */
  private val DriverFrontierMax = 32

  def includedDirs(spark: SparkSession, root: String,
                   excludedFolders: Seq[String], maxDepth: Int = 128): Seq[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(conf)
    if (!fs.exists(rootPath) || fs.getFileStatus(rootPath).isFile)
      return Seq(root)
    val rootQ = fs.makeQualified(rootPath).toString
    val excluded = excludedFolders.toSet
    val out = scala.collection.mutable.ArrayBuffer(rootQ)
    var frontier: Seq[String] = Seq(rootQ)
    var depth = 0
    var confBc: Option[org.apache.spark.broadcast.Broadcast[SerializableHadoopConf]] = None
    try {
      while (frontier.nonEmpty && depth < maxDepth) {
        val next =
          if (frontier.size <= DriverFrontierMax)
            frontier.flatMap(d => subdirsOf(d, conf, excluded))
          else {
            if (confBc.isEmpty)
              confBc = Some(spark.sparkContext.broadcast(new SerializableHadoopConf(conf)))
            val bc = confBc.get
            val ex = excluded // don't capture the outer object graph
            spark.sparkContext
              .parallelize(frontier, math.min(frontier.size, 64))
              .flatMap(d => subdirsOf(d, bc.value.value, ex))
              .collect().toSeq
          }
        out ++= next
        frontier = next
        depth += 1
      }
      // a deeper tree silently dropped would silently drop corpus files;
      // 128 real levels means a layout (or symlink cycle) worth surfacing
      require(frontier.isEmpty,
        s"directory tree deeper than $maxDepth levels under $root")
      out.toSeq
    } finally confBc.foreach(_.destroy())
  }

  /** One directory's immediate included subdirectories. Serializable (used
    * from both the driver loop and the distributed frontier tasks).
    */
  private def subdirsOf(dir: String, conf: org.apache.hadoop.conf.Configuration,
                        excluded: Set[String]): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(conf).listStatus(p).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter { d =>
        val n = d.getName
        !excluded.contains(n) && !n.startsWith(".") && !n.startsWith("_")
      }
      .map(_.toString)
  }
}
