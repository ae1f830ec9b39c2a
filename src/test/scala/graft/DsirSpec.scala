package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TrainingData

/** DSIR importance scores: direction, smoothing, exact parallelism
  * invariance (integer-scaled LLR sums). */
class DsirSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def corpus = Seq(
    (1L, "science physics quantum theory experiment"),
    (2L, "science biology cell gene experiment"),
    (3L, "buy cheap pills now click here now"),
    (4L, "click buy now cheap deal click"),
    (5L, "physics theory gene experiment science"),
    (6L, "random words about nothing in particular")
  ).toDF("doc_id", "text")

  test("docs resembling the target outscore off-target docs") {
    val target = corpus.filter(col("doc_id").isin(1L, 2L))
    val scores = TrainingData.dsirScores(corpus, "doc_id", "text",
        target, "text", buckets = 512)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // per-token normalization not needed: docs are similar length
    assert(scores(5L) > scores(3L), s"on-target 5 vs spam 3: $scores")
    assert(scores(1L) > scores(4L))
    assert(scores(2L) > scores(6L))
  }

  test("bit-identical at any parallelism") {
    val target = corpus.filter(col("doc_id") % 2 === 0)
    def run(parts: Int) = TrainingData.dsirScores(
        corpus.repartition(parts), "doc_id", "text", target, "text", 256)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(run(1) == run(7))
  }

  test("token counts are exact") {
    val out = TrainingData.dsirScores(corpus, "doc_id", "text",
        corpus, "text", 128)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == 5 && out(3L) == 7 && out(4L) == 6)
  }
}
