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

  test("lmScores: in-domain bigrams beat scrambled ones per pair") {
    val ref = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"),
      (11L, "the quick brown fox runs over the lazy cat"),
      (12L, "a quick brown fox jumps over a lazy dog")
    ).toDF("doc_id", "text")
    val probes = Seq(
      (1L, "the quick brown fox jumps"), // fluent (seen bigrams)
      (2L, "fox the brown jumps quick") // scrambled (unseen bigrams)
    ).toDF("doc_id", "text")
    val out = TrainingData.lmScores(probes, "doc_id", "text",
        ref, "doc_id", "text", buckets = 512)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L)._1 == 4 && out(2L)._1 == 4)
    // per-pair average log-likelihood: fluent > scrambled
    assert(out(1L)._2 > out(2L)._2, s"got $out")
  }

  test("lmScores: bit-identical at any parallelism") {
    val ref = corpus.filter(col("doc_id") <= 3)
    def run(parts: Int) = TrainingData.lmScores(
        corpus.repartition(parts), "doc_id", "text", ref, "doc_id", "text", 256)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(run(1) == run(5))
  }
}

/** HTML -> text extraction chain. */
class HtmlTextSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ext(html: String): String =
    Seq(html).toDF("h")
      .select(TrainingData.htmlToText(col("h")).as("t"))
      .collect()(0).getString(0)

  test("scripts, styles, comments vanish; blocks break lines") {
    val out = ext("<html><head><script>if (a < b) { x(); }</script>" +
      "<style>p { margin: 0; }</style></head>" +
      "<body><!-- hi --><h2>Title</h2><p>one</p><p>two</p></body></html>")
    assert(out == "Title\none\ntwo", out)
  }

  test("entity decode order: &amp;lt; stays literal '&lt;'") {
    assert(ext("<p>a &amp;lt; b</p>") == "a &lt; b")
    assert(ext("<p>1 &lt; 2 &amp; 3 &gt; 2 &quot;q&quot; &#39;s&#39;</p>") ==
      "1 < 2 & 3 > 2 \"q\" 's'")
  }

  test("whitespace: CRLF, tabs, runs of blank lines collapse") {
    // source newlines inside a block are honored as line breaks
    val out = ext("<p>a\r\n\t b</p>\n\n\n<p>   c   </p>")
    assert(out == "a\nb\nc", out)
  }

  test("br variants and attribute-carrying tags") {
    assert(ext("line1<br>line2<br />line3<BR class=\"x\">line4") ==
      "line1\nline2\nline3\nline4")
    assert(ext("<a href=\"http://x\">link</a> <img src='y'/> end") == "link  end"
      || ext("<a href=\"http://x\">link</a> <img src='y'/> end") == "link end")
  }
}
