package graft

import org.apache.spark.sql.SparkSession

/** Scratch: time named driver queries at a given SF dir (not a test). */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args.drop(1)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("timeq")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      // warm
      val t0 = System.nanoTime(); val c0 = fn(spark, dir).count(); val w0 = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime(); val c1 = fn(spark, dir).count(); val w1 = (System.nanoTime() - t1) / 1e9
      println(f"$n%-20s rows=$c1%10d cold=$w0%8.2fs warm=$w1%8.2fs")
    }
    spark.stop()
  }
}
