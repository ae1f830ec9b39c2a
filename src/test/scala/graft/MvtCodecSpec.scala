package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{FlatGeom, Wkt}
import graft.kernels.MvtCodec

/** MVT 2.1 wire codec vs the spec's own worked examples (§4.3.5,
  * github.com/mapbox/vector-tile-spec) + byte-level tile goldens +
  * encode∘decode identity. */
class MvtCodecSpec extends AnyFunSuite {

  test("spec §4.3.5.1: point (25, 17) encodes to [9, 50, 34]") {
    val cmds = MvtCodec.encodeGeometry(FlatGeom.point(25, 17))
    assert(cmds.toSeq == Seq(9L, 50L, 34L))
  }

  test("spec §4.3.5.2: multipoint (5,7) (3,2) encodes to [17, 10, 14, 3, 9]") {
    val cmds = MvtCodec.encodeGeometry(
      FlatGeom.multiPoint(Array(5.0, 7.0, 3.0, 2.0)))
    assert(cmds.toSeq == Seq(17L, 10L, 14L, 3L, 9L))
  }

  test("spec §4.3.5.3: linestring (2,2)-(2,10)-(10,10)") {
    val cmds = MvtCodec.encodeGeometry(
      FlatGeom.lineString(Array(2.0, 2.0, 2.0, 10.0, 10.0, 10.0)))
    assert(cmds.toSeq == Seq(9L, 4L, 4L, 18L, 0L, 16L, 16L, 0L))
  }

  test("spec §4.3.5.3 multi: second line (1,1)-(3,5)") {
    val cmds = MvtCodec.encodeGeometry(FlatGeom.multiLineString(Seq(
      Array(2.0, 2.0, 2.0, 10.0, 10.0, 10.0),
      Array(1.0, 1.0, 3.0, 5.0))))
    // spec example: [9 4 4 18 0 16 16 0 9 17 17 10 4 8]
    assert(cmds.toSeq ==
      Seq(9L, 4L, 4L, 18L, 0L, 16L, 16L, 0L, 9L, 17L, 17L, 10L, 4L, 8L))
  }

  test("spec §4.3.5.4: polygon (3,6)(8,12)(20,34) closes with ClosePath") {
    // stored closed; wire drops the closing vertex
    val cmds = MvtCodec.encodeGeometry(FlatGeom.polygon(
      Array(3.0, 6.0, 8.0, 12.0, 20.0, 34.0, 3.0, 6.0), Nil))
    assert(cmds.toSeq == Seq(9L, 6L, 12L, 18L, 10L, 12L, 24L, 44L, 15L))
  }

  test("spec §4.3.5.5: multipolygon with hole — exact command stream") {
    // two polygons; second carries a hole (spec worked example)
    val p1 = FlatGeom.polygon(
      Array(0.0, 0, 10, 0, 10, 10, 0, 10, 0, 0), Nil)
    val p2 = FlatGeom.polygon(
      Array(11.0, 11, 20, 11, 20, 20, 11, 20, 11, 11),
      Seq(Array(13.0, 13, 13, 17, 17, 17, 17, 13, 13, 13)))
    val cmds = MvtCodec.encodeGeometry(FlatGeom.multiPolygon(Seq(p1, p2)))
    assert(cmds.toSeq == Seq[Long](9, 0, 0, 26, 20, 0, 0, 20, 19, 0, 15,
      9, 22, 2, 26, 18, 0, 0, 18, 17, 0, 15,
      9, 4, 13, 26, 0, 8, 8, 0, 0, 7, 15).map(_.toLong))
  }

  test("encode-decode identity across geometry shapes") {
    val shapes = Seq(
      "POINT(100 200)",
      "MULTIPOINT((1 2),(3 4),(5 6))",
      "LINESTRING(0 0,50 40,80 10)",
      "MULTILINESTRING((0 0,10 0),(5 5,5 25,30 25))",
      "POLYGON((0 0,40 0,40 40,0 40,0 0))",
      // shell positive-shoelace in y-down space + CCW hole (MVT winding)
      "POLYGON((0 0,40 0,40 40,0 40,0 0),(10 10,10 20,20 20,20 10,10 10))",
      "MULTIPOLYGON(((0 0,10 0,10 10,0 10,0 0)),((20 20,35 20,35 35,20 35,20 20)))")
    for (w <- shapes) {
      val g = Wkt.read(w)
      val t = MvtCodec.mvtType(g)
      val rt = MvtCodec.decodeGeometry(t, MvtCodec.encodeGeometry(g))
      assert(Wkt.write(rt) == w, s"roundtrip $w -> ${Wkt.write(rt)}")
    }
  }

  test("tile bytes: hand-computed golden for one point feature") {
    val tile = MvtCodec.encodeTile("pts", 4096, Seq((1L, FlatGeom.point(25, 17))))
    // feature: id=1 (08 01), type=1 point (18 01), geometry [9,50,34]
    // (22 03 09 32 22); layer: version 2 (78 02), name "pts"
    // (0A 03 70 74 73), feature (12 09 ...), extent 4096 (28 80 20);
    // tile: field 3 (1A len ...)
    val expected = Array[Int](
      0x1a, 0x15,
      0x78, 0x02,
      0x0a, 0x03, 'p', 't', 's',
      0x12, 0x09, 0x08, 0x01, 0x18, 0x01, 0x22, 0x03, 0x09, 0x32, 0x22,
      0x28, 0x80, 0x20).map(_.toByte)
    assert(tile.toSeq == expected.toSeq,
      tile.map(b => f"${b & 0xff}%02x").mkString(" "))
  }

  test("tile roundtrip: layer name, extent, ascending-id feature order") {
    val feats = Seq(
      (42L, Wkt.read("LINESTRING(0 0,10 10)")),
      (7L, FlatGeom.point(1, 2)),
      (99L, Wkt.read("POLYGON((0 0,8 0,8 8,0 8,0 0))")))
    val tile = MvtCodec.encodeTile("roads", 512, feats)
    val d = MvtCodec.decodeTile(tile)
    assert(d.layer == "roads" && d.extent == 512)
    assert(d.features.map(_._1) == Seq(7L, 42L, 99L)) // sorted by id
    assert(Wkt.write(d.features(1)._2) == "LINESTRING(0 0,10 10)")
    // byte determinism: input order must not matter
    assert(MvtCodec.encodeTile("roads", 512, feats.reverse).toSeq == tile.toSeq)
  }

  test("null/empty/unsupported features are skipped, not poison") {
    val tile = MvtCodec.encodeTile("l", 4096, Seq(
      (1L, null), (2L, Wkt.read("LINESTRING EMPTY")), (3L, FlatGeom.point(0, 0))))
    assert(MvtCodec.decodeTile(tile).features.map(_._1) == Seq(3L))
  }
}

/** Tagged features: typed values, table dedup, determinism. */
class MvtTagsSpec extends AnyFunSuite {
  test("typed tag roundtrip incl. negative sint and double bits") {
    val tags: MvtCodec.Tags = Seq(
      "name" -> "café №5", "pop" -> java.lang.Long.valueOf(123456L),
      "delta" -> java.lang.Long.valueOf(-42L),
      "area" -> java.lang.Double.valueOf(3.14159265358979),
      "cap" -> java.lang.Boolean.valueOf(true))
    val tile = MvtCodec.encodeTileTagged("l", 4096,
      Seq((1L, FlatGeom.point(5, 5), tags)))
    val d = MvtCodec.decodeTile(tile)
    assert(d.tagged.head._3 == tags)
  }

  test("keys and values tables dedupe across features") {
    val t1: MvtCodec.Tags = Seq("cls" -> "road", "lanes" -> java.lang.Long.valueOf(2L))
    val t2: MvtCodec.Tags = Seq("cls" -> "road", "lanes" -> java.lang.Long.valueOf(4L))
    val tile = MvtCodec.encodeTileTagged("l", 4096, Seq(
      (1L, FlatGeom.point(0, 0), t1), (2L, FlatGeom.point(1, 1), t2)))
    val d = MvtCodec.decodeTile(tile)
    assert(d.tagged.map(_._3) == Seq(t1, t2))
    // shared key "cls"/value "road" must appear once: tile stays small
    val dup = MvtCodec.encodeTileTagged("l", 4096, Seq(
      (1L, FlatGeom.point(0, 0), t1), (2L, FlatGeom.point(1, 1), t1)))
    val uniq = MvtCodec.encodeTileTagged("l", 4096, Seq(
      (1L, FlatGeom.point(0, 0), t1),
      (2L, FlatGeom.point(1, 1), Seq("xyz" -> "other", "abcd" -> java.lang.Long.valueOf(9L)))))
    assert(dup.length < uniq.length)
  }

  test("tagged bytes are input-order invariant") {
    val f = Seq(
      (7L, FlatGeom.point(0, 0), Seq("a" -> ("x": Any))),
      (3L, FlatGeom.point(1, 1), Seq("b" -> (java.lang.Long.valueOf(1L): Any))))
    assert(MvtCodec.encodeTileTagged("l", 512, f).toSeq ==
      MvtCodec.encodeTileTagged("l", 512, f.reverse).toSeq)
  }

  test("untagged encodeTile bytes unchanged by the tags extension") {
    val tile = MvtCodec.encodeTile("pts", 4096, Seq((1L, FlatGeom.point(25, 17))))
    // same golden as the base spec: no keys/values fields emitted
    assert(tile.length == 23 && (tile(1) & 0xff) == 0x15)
  }
}
