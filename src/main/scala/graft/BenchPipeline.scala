package graft

import org.apache.spark.sql.SparkSession

/**
 * Single pipeline measurement in a clean JVM (launched by [[Bench]]
 * via ProcessBuilder): prints `BENCH_TPM <pagesPerMinute>`.
 *
 * Protocol (BASELINE.md): step 1 synthesizes the page corpus to
 * Parquet OUTSIDE the timed window; the measured job is the identical
 * spatial-join + tiling pipeline (extract → PIP join → tile →
 * rasterize) over the same input files at each parallelism level.
 *
 * A fresh JVM per measurement keeps the two scaling runs comparable —
 * sequential SparkSessions in one JVM accumulate heap/GC debt. The
 * fixed pre-touched heap avoids the sandbox kernel's page-fault storm
 * (38x CPU inflation measured with a growing heap at 32 threads).
 */
object BenchPipeline {
  def main(args: Array[String]): Unit = {
    val threads = args(0).toInt
    val pages = args(1).toLong
    val shm = java.nio.file.Paths.get("/dev/shm")
    val base = if (java.nio.file.Files.isDirectory(shm)) shm
      else java.nio.file.Paths.get("/tmp")
    val localDir = java.nio.file.Files.createTempDirectory(base, "graft_local").toString
    val spark = SparkSession.builder()
      .master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", localDir) // shuffle/broadcast off the bursty disk
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sql.functions.register(spark)

    val dir = java.nio.file.Files.createTempDirectory(base, s"graft_bench_$threads").toString
    val cp = new pipeline.Checkpoint(spark, dir)

    // ---- step 1 (UNTIMED): synthesize the corpus to parquet
    cp.stage("s1_pages") { pipeline.WebCorpus.pages(spark, pages) }

    // ---- JIT warmup on a small copy of the job
    val warmDir = java.nio.file.Files.createTempDirectory(base, "graft_warm").toString
    pipeline.GeoPipeline.run(spark, math.min(pages / 20, 100000), warmDir)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(warmDir))

    import scala.jdk.CollectionConverters._
    def gcMs: Long = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime).sum
    def cpuNs: Long = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean].getProcessCpuTime
    val gc0 = gcMs
    val cpu0 = cpuNs

    // ---- step 2 (TIMED): the spatial-join + tiling job over the
    // pre-materialized input (s1 resumes from its checkpoint manifest)
    val t0 = System.nanoTime()
    val res = pipeline.GeoPipeline.run(spark, pages, dir)
    val wallSec = (System.nanoTime() - t0) / 1e9

    println(s"BENCH_GC ${gcMs - gc0} ms")
    println(s"BENCH_CPU ${(cpuNs - cpu0) / 1000000} ms over ${(wallSec * 1000).round} ms wall" +
      s" => ${((cpuNs - cpu0) / 1e6 / (wallSec * 1000) * 100).round}% of one core x$threads")
    for (st <- Seq("s2_entities", "s3_pip_join", "s4_tiles", "s5_raster")) {
      val ms = """"wall_ms":(\d+)""".r.findFirstMatchIn(cp.readManifest(st)).map(_.group(1)).getOrElse("?")
      println(s"BENCH_STAGE $st $ms")
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    println(s"BENCH_TPM ${(res.pages / wallSec * 60.0).round}")
    spark.stop()
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(localDir))
  }
}
