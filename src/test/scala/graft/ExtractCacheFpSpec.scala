package graft

import graft.functions.Png
import graft.sources.ImageCorpus
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import java.nio.file.{Files, Path}

/** Receipt for the r19 ExtractCache listing-fingerprint short-circuit: a
  * warm round over a stable tree must answer from the cache WITHOUT the
  * listing checkpoint + cache full-outer join + pricing aggregate (fewer
  * scheduled jobs than the join round, zero cache-dir writes), and a
  * sidecar lost to a crash between cache swap and sidecar write must
  * self-heal on the next full round — never a wrong answer.
  */
class ExtractCacheFpSpec extends SparkSpecBase {

  private def raster(w: Int, h: Int, ch: Int, seed: Int): Png.Image = {
    val px = new Array[Byte](w * h * ch)
    var i = 0
    while (i < px.length) { px(i) = ((i * 31 + seed * 17) % 256).toByte; i += 1 }
    Png.Image(w, h, ch, px)
  }

  private def write(p: Path, bytes: Array[Byte]): Unit = {
    Files.createDirectories(p.getParent)
    Files.write(p, bytes)
  }

  private class JobCounter extends SparkListener {
    val n = new java.util.concurrent.atomic.AtomicInteger(0)
    override def onJobStart(jobStart: SparkListenerJobStart): Unit = n.incrementAndGet()
  }

  private def countJobs[T](body: => T): (T, Int) = {
    val c = new JobCounter
    spark.sparkContext.addSparkListener(c)
    try {
      val r = body
      Thread.sleep(300) // async listener bus settle (Rm3BatchEconomicsSpec)
      (r, c.n.get())
    } finally spark.sparkContext.removeSparkListener(c)
  }

  private def statsFor(root: String, cache: String) =
    ImageCorpus.readImageStats(spark, root, cachePath = Some(cache))
      .collect().map(r => r.getAs[String]("path") -> r).toMap

  test("short-circuit: stable-tree warm round skips the join (job receipt, no dir writes); lost sidecar self-heals") {
    val root = Files.createTempDirectory("graft_fp_tree")
    val cache = Files.createTempDirectory("graft_fp_cache").toString + "/stats"
    write(root.resolve("a.png"), Png.encode(raster(10, 10, 3, seed = 1)))
    write(root.resolve("b.png"), Png.encode(raster(6, 7, 1, seed = 2)))
    val cold = statsFor(root.toString, cache)
    assert(cold.size == 2)
    val fs = new org.apache.hadoop.fs.Path(cache)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val fpPath = new org.apache.hadoop.fs.Path(cache, "_graft_listing_fp")
    assert(fs.exists(fpPath), "cold write must leave the listing sidecar")

    // crash simulation: sidecar lost after the cache swap — the next warm
    // round must take the full join path, serve the same rows, and rewrite
    // the sidecar (self-heal)
    fs.delete(fpPath, false)
    val (joinRound, joinJobs) = countJobs(statsFor(root.toString, cache))
    assert(joinRound.keySet == cold.keySet)
    assert(fs.exists(fpPath), "unchanged full round must heal the sidecar")

    // sidecar present, tree unchanged: the short-circuit round must run
    // strictly fewer jobs than the join round (it drops the listing
    // checkpoint, the full-outer join's aggregate, and the heal write) and
    // must not touch the cache directory at all
    val before = fs.listStatus(new org.apache.hadoop.fs.Path(cache))
      .map(s => s.getPath.getName -> s.getModificationTime).toMap
    val (fastRound, fastJobs) = countJobs(statsFor(root.toString, cache))
    val after = fs.listStatus(new org.apache.hadoop.fs.Path(cache))
      .map(s => s.getPath.getName -> s.getModificationTime).toMap
    assert(fastRound.keySet == cold.keySet)
    assert(fastRound("a.png").getAs[Double]("mean_luma") ==
      cold("a.png").getAs[Double]("mean_luma"))
    assert(after == before, "short-circuit round must not write the cache dir")
    assert(fastJobs < joinJobs,
      s"short-circuit must schedule fewer jobs ($fastJobs) than the join round ($joinJobs)")

    // a NEW file flips the fingerprint: the full round runs and caches it
    write(root.resolve("c.png"), Png.encode(raster(4, 4, 3, seed = 3)))
    val grown = statsFor(root.toString, cache)
    assert(grown.keySet == Set("a.png", "b.png", "c.png"))
  }
}
