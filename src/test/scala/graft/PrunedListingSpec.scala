package graft

import java.nio.file.{Files, Paths}

import graft.sources.{PrunedListing, TextCorpus}

/** Listing-time folder exclusion ([[graft.sources.PrunedListing]]): excluded
  * subtrees are never DESCENDED (not listed-then-filtered), by exact segment
  * name, with Spark's hidden-path convention preserved; and the read legs
  * built on the pruned directory list return the same corpus the recursive
  * shape did.
  */
class PrunedListingSpec extends SparkSpecBase {

  private def write(root: String, rel: String, text: String): Unit = {
    val p = Paths.get(root, rel)
    Files.createDirectories(p.getParent)
    Files.write(p, text.getBytes("UTF-8"))
  }

  test("includedDirs prunes excluded subtrees at descent, by exact name") {
    val root = Files.createTempDirectory("pruned").toString
    write(root, "a.txt", "top")
    write(root, "docs/b.txt", "mid")
    write(root, "docs/deep/c.txt", "deep")
    write(root, "dist/skip.txt", "excluded")
    write(root, "dist/nested/skip2.txt", "excluded nested")
    write(root, "redist/keep.txt", "exact-segment match only")
    write(root, ".hidden/h.txt", "spark hidden convention")
    write(root, "_meta/m.txt", "spark hidden convention")
    val dirs = PrunedListing.includedDirs(spark, root, Seq("dist"))
    val rels = dirs.map(_.replaceFirst("^file:", "").stripPrefix(root).stripPrefix("/")).toSet
    assert(rels === Set("", "docs", "docs/deep", "redist"),
      "root + included dirs only; dist (and everything under it), .hidden, _meta never listed")
    // the read built on the pruned list sees exactly the included files
    val paths = TextCorpus.read(spark, root, Seq("txt"), Seq("dist"))
      .select("path").collect().map(_.getString(0)).toSet
    assert(paths === Set("a.txt", "docs/b.txt", "docs/deep/c.txt", "redist/keep.txt"))
  }

  test("wide frontier takes the distributed listing path and agrees") {
    val root = Files.createTempDirectory("prunedwide").toString
    // 40 sibling dirs > the 32-dir driver threshold: the second level lists
    // as a Spark job; content must be identical to a driver-side walk
    (0 until 40).foreach { i =>
      write(root, f"d$i%02d/f.txt", s"doc $i")
      write(root, f"d$i%02d/sub/g.txt", s"sub $i")
    }
    write(root, "d00/dist/x.txt", "excluded below a wide level")
    val dirs = PrunedListing.includedDirs(spark, root, Seq("dist"))
    assert(dirs.size === 1 + 40 + 40, "root + 40 dirs + 40 subdirs, dist pruned")
    val n = TextCorpus.read(spark, root, Seq("txt"), Seq("dist")).count()
    assert(n === 80L)
  }

  test("missing root and file root fall through to spark.read semantics") {
    val root = Files.createTempDirectory("prunededge").toString
    intercept[Exception] {
      TextCorpus.read(spark, root + "/nope", Seq("txt"), Nil).collect()
    }
    // a root that is itself a file reads as that single file
    write(root, "solo.txt", "single file root")
    val solo = TextCorpus.read(spark, root + "/solo.txt", Seq("txt"), Nil).collect()
    assert(solo.length === 1 && solo.head.getString(1) === "single file root")
  }
}
