package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TemporalJoins

/** As-of join vs closed forms + brute force; interval join vs brute
  * force at several bucket sizes. */
class TemporalJoinsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("asof: latest at-or-before, inclusive ties, tolerance, key isolation") {
    val left = Seq((1L, 100L, "a"), (1L, 200L, "b"), (1L, 50L, "c"),
      (2L, 100L, "d"), (3L, 100L, "e"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, 100L, 10.0), (1L, 150L, 20.0), (2L, 40L, 30.0))
      .toDF("k", "rts", "payload")
    val out = TemporalJoins.asofJoin(left, right, "k", "ts", "rts", Seq("payload"))
      .collect().map(r => (r.getString(2), Option(r.get(3)))).toMap
    assert(out("a") == Some(10.0)) // inclusive: rts == ts matches
    assert(out("b") == Some(20.0)) // latest of the two
    assert(out("c") == None)       // nothing at or before
    assert(out("d") == Some(30.0))
    assert(out("e") == None)       // key 3 has no right rows
    val tol = TemporalJoins.asofJoin(left, right, "k", "ts", "rts",
        Seq("payload"), toleranceSec = 30L)
      .collect().map(r => (r.getString(2), Option(r.get(3)))).toMap
    assert(tol("a") == Some(10.0)) // dt 0 <= 30
    assert(tol("b") == None)       // dt 200-150 = 50 > 30
    assert(tol("d") == None)       // dt 60 > 30
  }

  test("asof: null keys/timestamps pass through left with null values") {
    val left = Seq((Some(1L), Some(100L), "a"), (None, Some(100L), "b"),
      (Some(1L), None, "c")).toDF("k", "ts", "tag")
    val right = Seq((Some(1L), Some(50L), 10.0), (None, Some(10L), 99.0))
      .toDF("k", "rts", "payload")
    val out = TemporalJoins.asofJoin(left, right, "k", "ts", "rts", Seq("payload"))
      .collect().map(r => (r.getString(2), Option(r.get(3)))).toMap
    assert(out("a") == Some(10.0)) // null-key right row is ignored
    assert(out("b") == None && out("c") == None)
    assert(out.size == 3)
  }

  test("asof matches a brute-force computation on random data") {
    val lrows = (0 until 500).map { i =>
      var h = 11L + i * 2654435761L
      h ^= h >>> 33; h *= -49064778989728563L; h ^= h >>> 33
      (math.abs(h % 20), math.abs(h % 100000), i.toLong)
    }
    val rrows = (0 until 300).map { i =>
      var h = 77L + i * 2654435761L
      h ^= h >>> 33; h *= -49064778989728563L; h ^= h >>> 33
      // unique (k, ts) per row by construction of the value
      (math.abs(h % 20), math.abs(h % 100000), math.abs(h % 1000).toDouble)
    }.groupBy(t => (t._1, t._2)).map(_._2.maxBy(_._3)).toSeq
    val want = lrows.map { case (k, ts, id) =>
      val cand = rrows.filter(r => r._1 == k && r._2 <= ts)
      id -> (if (cand.isEmpty) None else Some(cand.maxBy(r => (r._2, r._3))._3))
    }.toMap
    val out = TemporalJoins.asofJoin(
        lrows.toDF("k", "ts", "id").repartition(7),
        rrows.toDF("k", "rts", "payload").repartition(3),
        "k", "ts", "rts", Seq("payload"))
      .collect().map(r => (r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]))).toMap
    assert(out == want)
  }

  test("stream interval join drops null key/ts events instead of crashing") {
    val ev = Seq((Some(1L), Some(10L)), (None, Some(10L)), (Some(2L), None))
      .toDF("k", "ts")
    val iv = Seq((7L, 5L, 15L)).toDF("jid", "st", "en")
    val out = graft.streaming.GeoStream
      .intervalJoinStream(ev, "k", "ts", iv, "jid", "st", "en")
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 7L)))
    // duplicate key name gets a disambiguated output column
    val out2 = graft.streaming.GeoStream
      .intervalJoinStream(ev.withColumnRenamed("k", "jid"), "jid", "ts",
        iv, "jid", "st", "en")
    assert(out2.columns.toSeq == Seq("jid", "ts_sec", "interval_jid"))
  }

  test("streaming dimension collect fails fast past the size guard") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val left = Seq((1L, 10L)).toDF("k", "ts")
    val right = (0L until 50L).map(i => (i % 5, i, i.toDouble)).toDF("k", "rts", "v")
    spark.conf.set("spark.graft.stream.maxDimensionRows", "10")
    try {
      val e = intercept[IllegalArgumentException] {
        graft.streaming.GeoStream.asofJoinStream(left, "k", "ts", right, "rts", Seq("v"))
      }
      assert(e.getMessage.contains("TemporalJoins.asofJoin"),
        s"error must name the batch twin: ${e.getMessage}")
    } finally spark.conf.unset("spark.graft.stream.maxDimensionRows")
    // within the bound the same call succeeds
    assert(graft.streaming.GeoStream
      .asofJoinStream(left, "k", "ts", right, "rts", Seq("v")).count() == 1)
  }

  test("stream as-of drops null-key/ts REFERENCE rows instead of crashing") {
    val left = Seq((1L, 10L)).toDF("k", "ts")
    val right = Seq((Some(1L), Some(5L), 1.5), (None, Some(7L), 9.9),
      (Some(1L), None, 8.8)).toDF("k", "rts", "v")
    val out = graft.streaming.GeoStream
      .asofJoinStream(left, "k", "ts", right, "rts", Seq("v"))
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(out.toSeq == Seq((1L, 1.5)))
  }

  test("as-of join rejects non-integral key types loudly") {
    val left = Seq(("a", 10L)).toDF("k", "ts")
    val right = Seq(("a", 5L, 1.0)).toDF("k", "rts", "v")
    val e = intercept[IllegalArgumentException] {
      TemporalJoins.asofJoin(left, right, "k", "ts", "rts", Seq("v"))
    }
    assert(e.getMessage.contains("integral"))
  }

  test("interval join equals brute force at several bucket sizes") {
    val ev = (0 until 400).map { i =>
      var h = 5L + i * 2654435761L
      h ^= h >>> 33; h *= -49064778989728563L; h ^= h >>> 33
      (i.toLong, math.abs(h % 50000))
    }
    val iv = (0 until 40).map { j =>
      var h = 13L + j * 2654435761L
      h ^= h >>> 33; h *= -49064778989728563L; h ^= h >>> 33
      val s = math.abs(h % 45000)
      (j.toLong, s, s + 100 + math.abs(h % 8000))
    }
    val want = (for ((eid, t) <- ev; (jid, s, e) <- iv if t >= s && t <= e)
      yield (eid, jid)).toSet
    for (bucket <- Seq(500L, 3600L, 100000L)) {
      val got = TemporalJoins.intervalJoin(
          ev.toDF("eid", "ts"), "ts",
          iv.toDF("jid", "st", "en"), "st", "en", bucketSec = bucket)
        .select("eid", "jid")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want && got.nonEmpty, s"bucket $bucket: ${got.size} vs ${want.size}")
    }
  }
}
