package graft.pipeline

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.GZIPInputStream

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * WARC (ISO 28500 / WARC/1.0) ingestion — the wire format the public
 * web-crawl corpora (Common Crawl) ship in. The reference has nothing
 * here; this is the crawl-side mouth of the training-data pipeline.
 *
 * Design for 100 TB: a crawl is millions of ~1 GB WARC files;
 * parallelism comes from files (and from Common Crawl's
 * gzip-member-per-record layout, which decompresses sequentially per
 * file) — each task parses its file streaming, record by record, and
 * emits rows. No driver-side work, no whole-corpus state.
 *
 * Record grammar implemented (WARC/1.0, public spec):
 *   version line "WARC/1.0\r\n", header lines "Name: value\r\n"
 *   (folded continuations supported), blank line, Content-Length
 *   payload bytes, "\r\n\r\n" record separator. Gzip input is
 *   detected by magic bytes and decompressed across concatenated
 *   members (the Common Crawl layout).
 */
object Warc {

  final case class WarcRecord(
      warcType: String, targetUri: String, date: String,
      recordId: String, contentType: String, payload: Array[Byte])

  // ------------------------------------------------------------ writer

  /** One spec-correct WARC/1.0 record. Deterministic: the record id is
    * a pure function of (uri, date, payload) — re-synthesis is
    * byte-identical (the checkpoint/resume discipline). */
  def record(warcType: String, uri: String, date: String,
      payload: Array[Byte], contentType: String = "text/plain"): Array[Byte] = {
    val idHash = {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      md.update(uri.getBytes(UTF_8)); md.update(date.getBytes(UTF_8))
      md.update(payload)
      md.digest().take(16).map(b => f"$b%02x").mkString
    }
    val header = new StringBuilder()
      .append("WARC/1.0\r\n")
      .append(s"WARC-Type: $warcType\r\n")
      .append(s"WARC-Record-ID: <urn:graft:$idHash>\r\n")
      .append(s"WARC-Date: $date\r\n")
      .append(s"WARC-Target-URI: $uri\r\n")
      .append(s"Content-Type: $contentType\r\n")
      .append(s"Content-Length: ${payload.length}\r\n")
      .append("\r\n")
      .toString.getBytes(UTF_8)
    val out = new Array[Byte](header.length + payload.length + 4)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(payload, 0, out, header.length, payload.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  // ------------------------------------------------------------ parser

  /** Parse a (possibly gzipped, possibly multi-member) WARC blob into
    * its records, streaming — tolerant of trailing garbage after the
    * last complete record (truncated tail files happen in real
    * crawls; we never throw mid-corpus, we stop). */
  def parseRecords(blob: Array[Byte]): Seq[WarcRecord] = {
    val bytes =
      if (blob.length >= 2 && (blob(0) & 0xff) == 0x1f && (blob(1) & 0xff) == 0x8b)
        gunzipAll(blob)
      else blob
    val out = new ArrayBuffer[WarcRecord]()
    var pos = 0
    while (pos < bytes.length) {
      parseOne(bytes, pos) match {
        case Some((rec, next)) => out += rec; pos = next
        case None => pos = bytes.length // stop at garbage/truncation
      }
    }
    out.toSeq
  }

  /** Decompress concatenated gzip members (Common Crawl layout). */
  private def gunzipAll(blob: Array[Byte]): Array[Byte] = {
    val in = new GZIPInputStream(new ByteArrayInputStream(blob), 1 << 16)
    val out = new java.io.ByteArrayOutputStream(blob.length * 4)
    val buf = new Array[Byte](1 << 16)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }

  private def parseOne(b: Array[Byte], start: Int): Option[(WarcRecord, Int)] = {
    var pos = start
    // skip inter-record CRLFs
    while (pos < b.length && (b(pos) == '\r' || b(pos) == '\n')) pos += 1
    if (pos >= b.length) return None
    val vEnd = lineEnd(b, pos)
    if (vEnd < 0) return None
    val version = new String(b, pos, vEnd - pos, UTF_8)
    if (!version.startsWith("WARC/")) return None
    pos = vEnd + 2
    var wtype = ""; var uri = ""; var date = ""; var rid = ""; var ctype = ""
    var clen = -1L
    var done = false
    while (!done) {
      if (pos >= b.length) return None
      val e = lineEnd(b, pos)
      if (e < 0) return None
      if (e == pos) { done = true; pos += 2 } // blank line: headers end
      else {
        var line = new String(b, pos, e - pos, UTF_8)
        pos = e + 2
        // folded continuation lines (spec: leading SP/HT continues)
        while (pos < b.length && (b(pos) == ' ' || b(pos) == '\t')) {
          val e2 = lineEnd(b, pos)
          if (e2 < 0) return None
          line += " " + new String(b, pos, e2 - pos, UTF_8).trim
          pos = e2 + 2
        }
        val ci = line.indexOf(':')
        if (ci > 0) {
          val k = line.substring(0, ci).trim.toLowerCase
          val v = line.substring(ci + 1).trim
          k match {
            case "warc-type" => wtype = v
            case "warc-target-uri" => uri = v
            case "warc-date" => date = v
            case "warc-record-id" => rid = v
            case "content-type" => ctype = v
            case "content-length" =>
              clen = try v.toLong catch { case _: NumberFormatException => -1L }
            case _ => ()
          }
        }
      }
    }
    if (clen < 0 || pos + clen > b.length) return None
    val payload = java.util.Arrays.copyOfRange(b, pos, (pos + clen).toInt)
    Some((WarcRecord(wtype, uri, date, rid, ctype, payload), (pos + clen).toInt))
  }

  /** Index of the '\r' of the next CRLF at/after pos; -1 if none. */
  private def lineEnd(b: Array[Byte], pos: Int): Int = {
    var i = pos
    while (i + 1 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n') return i
      i += 1
    }
    -1
  }

  // ------------------------------------------------------ Spark surface

  val recordSchema: StructType = StructType(Seq(
    StructField("warc_type", StringType, nullable = false),
    StructField("url", StringType, nullable = false),
    StructField("date", StringType, nullable = false),
    StructField("record_id", StringType, nullable = false),
    StructField("content_type", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  /** Read WARC files (plain or gzip) into records. One task per file
    * (binaryFile source); crawl-scale parallelism = file count, the
    * Common Crawl layout. maxPartitionBytes has no effect on
    * binaryFile (whole-file rows) — cap file size upstream. */
  def readWarc(spark: SparkSession, path: String): DataFrame = {
    val files = spark.read.format("binaryFile").load(path)
      .select(col("content"))
    fromBlobs(files, "content")
  }

  /** Streaming-compatible record explode: typed mapPartitions (legal
    * on a streaming DataFrame, unlike toRdd). Stateless — scales with
    * the micro-batch's file count. */
  def fromBlobsStream(df: DataFrame, blobCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(blobCol)).as[Array[Byte]]
      .mapPartitions(_.flatMap(b => parseRecords(b).iterator.map(r =>
        (r.warcType, r.targetUri, r.date, r.recordId, r.contentType, r.payload))))
      .toDF("warc_type", "url", "date", "record_id", "content_type", "payload")
  }

  /** Streaming WARC ingestion: every file that lands in `path` parses
    * into records within its micro-batch. */
  def readWarcStream(spark: SparkSession, path: String): DataFrame = {
    // the streaming file source wants the (fixed) binaryFile schema
    val binaryFileSchema = StructType(Seq(
      StructField("path", StringType),
      StructField("modificationTime", TimestampType),
      StructField("length", LongType),
      StructField("content", BinaryType)))
    fromBlobsStream(
      spark.readStream.format("binaryFile").schema(binaryFileSchema)
        .load(path).select(col("content")),
      "content")
  }

  /** Parse a binary column of WARC blobs into exploded records. */
  def fromBlobs(df: DataFrame, blobCol: String): DataFrame = {
    val spark = df.sparkSession
    val idx = df.schema.fieldIndex(blobCol)
    val rows = df.queryExecution.toRdd.mapPartitions { it =>
      it.flatMap { ir =>
        val blob = ir.getBinary(idx)
        Warc.parseRecords(blob).iterator.map { r =>
          Row(r.warcType, r.targetUri, r.date, r.recordId, r.contentType,
            r.payload)
        }
      }
    }
    spark.createDataFrame(rows, recordSchema)
  }

  /**
   * Write a corpus out as WARC files, one per partition (the CC
   * layout: parallelism = file count). Deterministic naming
   * (`part-NNNNN.warc[.gz]`); rows serialize in partition order, so
   * pre-sort/repartition for a canonical layout. Files land on a
   * filesystem path visible to executors (local/POSIX mount;
   * object stores would swap in their client here — same shape).
   * Returns one manifest row per file: (file, records, bytes).
   */
  def writeWarcFiles(df: DataFrame, urlCol: String, dateCol: String,
      textCol: String, dir: String, gzip: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val ui = df.schema.fieldIndex(urlCol)
    val di = df.schema.fieldIndex(dateCol)
    val ti = df.schema.fieldIndex(textCol)
    val out = df.queryExecution.toRdd.mapPartitionsWithIndex { (pid, it) =>
      val name = f"part-$pid%05d.warc" + (if (gzip) ".gz" else "")
      val path = java.nio.file.Paths.get(dir, name)
      val fos = java.nio.file.Files.newOutputStream(path)
      val os = if (gzip) new java.util.zip.GZIPOutputStream(fos, 1 << 16) else fos
      var n = 0L
      var bytes = 0L
      try {
        it.foreach { ir =>
          val rec = record("response", ir.getUTF8String(ui).toString,
            ir.getUTF8String(di).toString,
            ir.getUTF8String(ti).toString.getBytes(UTF_8))
          os.write(rec); n += 1; bytes += rec.length
        }
      } finally os.close()
      if (n == 0) { java.nio.file.Files.deleteIfExists(path); Iterator.empty }
      else Iterator.single((name, n, bytes))
    }
    spark.createDataset(out).toDF("file", "records", "bytes")
  }

  /** Serialize (url, date, text) rows into WARC response-record bytes
    * (one binary cell per row) — pure, deterministic, mapPartitions
    * (no UDF); concatenate per-file downstream. */
  def toRecords(df: DataFrame, urlCol: String, dateCol: String,
      textCol: String): DataFrame = {
    val spark = df.sparkSession
    val ui = df.schema.fieldIndex(urlCol)
    val di = df.schema.fieldIndex(dateCol)
    val ti = df.schema.fieldIndex(textCol)
    val schema = StructType(Seq(
      StructField("url", StringType, nullable = false),
      StructField("date", StringType, nullable = false),
      StructField("warc_record", BinaryType, nullable = false)))
    val rows = df.queryExecution.toRdd.mapPartitions { it =>
      it.map { ir =>
        val u = ir.getUTF8String(ui).toString
        val dt = ir.getUTF8String(di).toString
        val tx = ir.getUTF8String(ti).toString
        Row(u, dt, record("response", u, dt, tx.getBytes(UTF_8)))
      }
    }
    spark.createDataFrame(rows, schema)
  }
}
