package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Warc

/** WARC/1.0 codec: record grammar, multi-record scan, gzip members,
  * payload opacity, truncation tolerance. */
class WarcSpec extends AnyFunSuite {

  private def mkRec(uri: String, text: String,
      date: String = "2024-01-01T00:00:00Z"): Array[Byte] =
    Warc.record("response", uri, date, text.getBytes(UTF_8))

  test("single record roundtrip: all header fields + payload bytes") {
    val bytes = mkRec("http://example.test/a", "hello warc")
    val recs = Warc.parseRecords(bytes)
    assert(recs.length == 1)
    val r = recs.head
    assert(r.warcType == "response")
    assert(r.targetUri == "http://example.test/a")
    assert(r.date == "2024-01-01T00:00:00Z")
    assert(r.contentType == "text/plain")
    assert(r.recordId.startsWith("<urn:graft:") && r.recordId.endsWith(">"))
    assert(new String(r.payload, UTF_8) == "hello warc")
  }

  test("record id is deterministic and content-addressed") {
    assert(mkRec("u", "t").toSeq == mkRec("u", "t").toSeq)
    assert(Warc.parseRecords(mkRec("u", "t")).head.recordId !=
      Warc.parseRecords(mkRec("u", "t2")).head.recordId)
  }

  test("multi-record blob parses in order") {
    val blob = mkRec("http://a", "one") ++ mkRec("http://b", "two") ++
      mkRec("http://c", "three")
    val recs = Warc.parseRecords(blob)
    assert(recs.map(_.targetUri) == Seq("http://a", "http://b", "http://c"))
    assert(recs.map(r => new String(r.payload, UTF_8)) ==
      Seq("one", "two", "three"))
  }

  test("payload is opaque: embedded CRLFs and fake WARC headers don't resync") {
    val evil = "line1\r\n\r\nWARC/1.0\r\nWARC-Type: fake\r\n\r\nrest"
    val blob = mkRec("http://x", evil) ++ mkRec("http://y", "tail")
    val recs = Warc.parseRecords(blob)
    assert(recs.length == 2)
    assert(new String(recs(0).payload, UTF_8) == evil)
    assert(recs(1).targetUri == "http://y")
  }

  test("non-ASCII payload: Content-Length counts UTF-8 bytes") {
    val s = "héllo wörld — ünïcodé ✓"
    val recs = Warc.parseRecords(mkRec("http://u", s))
    assert(new String(recs.head.payload, UTF_8) == s)
    assert(recs.head.payload.length == s.getBytes(UTF_8).length)
  }

  test("folded continuation header lines join with a space") {
    val rec = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: http://long\r\n very/deep/path\r\n" +
      "Content-Length: 2\r\n\r\nok\r\n\r\n").getBytes(UTF_8)
    val r = Warc.parseRecords(rec).head
    assert(r.targetUri == "http://long very/deep/path")
    assert(new String(r.payload, UTF_8) == "ok")
  }

  test("truncated tail: complete records parse, garbage stops cleanly") {
    val good = mkRec("http://a", "fine")
    val blob = good ++ "WARC/1.0\r\nContent-Length: 999\r\n\r\nshort".getBytes(UTF_8)
    val recs = Warc.parseRecords(blob)
    assert(recs.length == 1 && recs.head.targetUri == "http://a")
    assert(Warc.parseRecords("not a warc at all".getBytes(UTF_8)).isEmpty)
  }

  test("gzip: concatenated members (Common Crawl layout) decompress") {
    def gz(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(b); g.close(); bos.toByteArray
    }
    // one member per record, concatenated — the CC convention
    val blob = gz(mkRec("http://m1", "alpha")) ++ gz(mkRec("http://m2", "beta"))
    val recs = Warc.parseRecords(blob)
    assert(recs.map(_.targetUri) == Seq("http://m1", "http://m2"))
    assert(recs.map(r => new String(r.payload, UTF_8)) == Seq("alpha", "beta"))
  }
}

/** Streaming WARC source vs its batch twin on real files. */
class WarcStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("readWarcStream matches batch readWarc on plain + gzip files") {
    def gz(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(b); g.close(); bos.toByteArray
    }
    def rec(u: String, t: String) =
      Warc.record("response", u, "2024-01-01T00:00:00Z", t.getBytes(UTF_8))
    val dir = java.nio.file.Files.createTempDirectory("graft_warc").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "a.warc"),
      rec("http://a/1", "one") ++ rec("http://a/2", "two"))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "b.warc.gz"),
      gz(rec("http://b/1", "three")) ++ gz(rec("http://b/2", "four")))

    val batch = Warc.readWarc(spark, dir)
      .select("url", "payload").collect()
      .map(r => (r.getString(0), new String(r.getAs[Array[Byte]](1), UTF_8)))
      .sortBy(_._1).toSeq
    assert(batch == Seq("http://a/1" -> "one", "http://a/2" -> "two",
      "http://b/1" -> "three", "http://b/2" -> "four"))

    val q = Warc.readWarcStream(spark, dir).writeStream
      .outputMode("append").format("memory").queryName("warc_stream").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("warc_stream")
      .select("url", "payload").collect()
      .map(r => (r.getString(0), new String(r.getAs[Array[Byte]](1), UTF_8)))
      .sortBy(_._1).toSeq
    assert(streamed == batch)
  }
}

/** WARC file writer: write → read roundtrip, gzip, manifest. */
class WarcWriteSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def corpus = Seq(
    ("http://w/1", "2024-01-01T00:00:00Z", "alpha"),
    ("http://w/2", "2024-01-01T00:00:00Z", "beta — ünïcode"),
    ("http://w/3", "2024-01-01T00:00:00Z", "gamma\nmultiline"))
    .toDF("url", "date", "text")

  test("write then read recovers every record byte-for-byte") {
    for (gz <- Seq(false, true)) {
      val dir = java.nio.file.Files.createTempDirectory("graft_wwr").toString
      val manifest = Warc.writeWarcFiles(
        corpus.repartition(2), "url", "date", "text", dir, gzip = gz).collect()
      assert(manifest.map(_.getLong(1)).sum == 3, s"gz=$gz")
      val back = Warc.readWarc(spark, dir)
        .select("url", "payload").collect()
        .map(r => (r.getString(0), new String(r.getAs[Array[Byte]](1), UTF_8)))
        .sortBy(_._1).toSeq
      assert(back == Seq("http://w/1" -> "alpha",
        "http://w/2" -> "beta — ünïcode", "http://w/3" -> "gamma\nmultiline"),
        s"gz=$gz: $back")
    }
  }

  test("empty partitions leave no files behind") {
    val dir = java.nio.file.Files.createTempDirectory("graft_wwe").toString
    val manifest = Warc.writeWarcFiles(
      corpus.repartition(8), "url", "date", "text", dir).collect()
    val files = new java.io.File(dir).list().toSeq
    assert(files.size == manifest.length && manifest.length <= 3)
  }
}

/** Streaming MVT tiles vs the batch twin (byte equality per tile). */
class MvtStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import org.apache.spark.sql.functions._

  test("mvtTilesStream (complete mode) equals the batch aggregate") {
    val dir = "/root/testdata/sf0.001"
    val staged = java.nio.file.Files.createTempDirectory("graft_mvt_src").toString
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("lon", pmod(col("event_id") * 7919L, lit(7200L)) / 20.0 - 180.0)
      .withColumn("lat", pmod(col("event_id") * 104729L, lit(3400L)) / 20.0 - 85.0)
      .write.mode("overwrite").parquet(staged)
    def tiles(df: org.apache.spark.sql.DataFrame) =
      graft.streaming.GeoStream.mvtTilesStream(df, "lon", "lat", "event_id", z = 2)
    val streamed = graft.streaming.GeoStream.runOnce(spark, staged, staged,
        tiles, "mvt_tiles", mode = "complete")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Array[Byte]](2).toSeq)).sortBy(t => (t._1, t._2)).toSeq
    val batch = tiles(spark.read.parquet(staged))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Array[Byte]](2).toSeq)).sortBy(t => (t._1, t._2)).toSeq
    assert(streamed.nonEmpty && streamed == batch)
    // and the tiles decode
    val d = graft.kernels.MvtCodec.decodeTile(batch.head._3.toArray)
    assert(d.extent == 4096 && d.features.nonEmpty)
  }
}
