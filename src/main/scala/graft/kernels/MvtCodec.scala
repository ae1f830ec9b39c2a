package graft.kernels

import scala.collection.mutable.ArrayBuffer

import graft.core.{FlatGeom, GeomKind}

/**
 * Mapbox Vector Tile 2.1 wire codec — the binary face of the tiling
 * surface ([[Mvt]] prepares integer tile-local geometry; this encodes
 * finished tiles). Implemented from the PUBLIC spec
 * (github.com/mapbox/vector-tile-spec, v2.1: protobuf wire format,
 * §4.3 geometry command encoding) — the reference geo crate has no
 * tile codec at all.
 *
 * Scope: one layer per tile, features carry an int64 id and a
 * geometry (no attribute keys/values — the training-pipeline surface
 * carries attributes in columns, not in the tile). Features are
 * written in ascending id order so tile bytes are a pure function of
 * the feature SET (deterministic at any parallelism).
 *
 * Wire layout (proto2, all public):
 *   Tile:    layers = 3 (len-delim, repeated)
 *   Layer:   version = 15 (varint, MUST be 2), name = 1 (string),
 *            features = 2 (len-delim, repeated), extent = 5 (varint)
 *   Feature: id = 1 (varint), type = 3 (varint: 1 point / 2 line /
 *            3 polygon), geometry = 4 (packed uint32)
 *   Geometry: command integer = (id & 0x7) | (count << 3) with
 *            MoveTo=1 LineTo=2 ClosePath=7; parameters are zigzag-
 *            encoded deltas from a running cursor (spec §4.3.3).
 */
object MvtCodec {

  final val CmdMoveTo = 1
  final val CmdLineTo = 2
  final val CmdClosePath = 7

  // ------------------------------------------------- protobuf primitives

  private def zigzag(v: Long): Long = (v << 1) ^ (v >> 63)
  private def unzigzag(v: Long): Long = (v >>> 1) ^ -(v & 1)

  private final class Buf {
    val bytes = new ArrayBuffer[Byte](256)
    def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) { bytes += ((v & 0x7f) | 0x80).toByte; v >>>= 7 }
      bytes += (v & 0x7f).toByte
    }
    /** field header: (fieldNumber << 3) | wireType */
    def key(field: Int, wire: Int): Unit = varint((field << 3) | wire)
    def lenDelim(field: Int, payload: Array[Byte]): Unit = {
      key(field, 2); varint(payload.length); bytes ++= payload
    }
    def toArray: Array[Byte] = bytes.toArray
  }

  private final class Reader(val b: Array[Byte], var pos: Int, val end: Int) {
    def varint(): Long = {
      var shift = 0; var v = 0L
      while ({
        val x = b(pos) & 0xff; pos += 1
        v |= (x & 0x7fL) << shift; shift += 7
        (x & 0x80) != 0
      }) ()
      v
    }
    def hasMore: Boolean = pos < end
    def skip(wire: Int): Unit = wire match {
      case 0 => varint()
      case 1 => pos += 8
      case 2 => val n = varint().toInt; pos += n
      case 5 => pos += 4
      case _ => throw new IllegalArgumentException(s"MVT: wire type $wire")
    }
  }

  // ------------------------------------------------- geometry commands

  /** MVT geometry type: 1 point, 2 linestring, 3 polygon; 0 = not
    * encodable (null caller contract). */
  def mvtType(g: FlatGeom): Int = g.kind match {
    case GeomKind.Point | GeomKind.MultiPoint => 1
    case GeomKind.LineString | GeomKind.MultiLineString => 2
    case GeomKind.Polygon | GeomKind.MultiPolygon => 3
    case _ => 0
  }

  /** Encode a tile-local integer geometry (the [[Mvt.asMvtGeom]]
    * output contract) into the packed command array (spec §4.3.5).
    * Polygon rings drop the redundant closing vertex and emit
    * ClosePath; the cursor runs across the whole geometry. */
  def encodeGeometry(g: FlatGeom): Array[Long] = {
    val out = new ArrayBuffer[Long](g.coords.length + 4)
    var cx = 0L; var cy = 0L
    def emitMove(coords: Array[Double], from: Int, n: Int): Unit = {
      out += ((CmdMoveTo | (n << 3)).toLong)
      var i = 0
      while (i < n) {
        val px = coords(from + 2 * i).toLong; val py = coords(from + 2 * i + 1).toLong
        out += zigzag(px - cx); out += zigzag(py - cy)
        cx = px; cy = py; i += 1
      }
    }
    def emitLine(coords: Array[Double], from: Int, n: Int): Unit = {
      out += ((CmdLineTo | (n << 3)).toLong)
      var i = 0
      while (i < n) {
        val px = coords(from + 2 * i).toLong; val py = coords(from + 2 * i + 1).toLong
        out += zigzag(px - cx); out += zigzag(py - cy)
        cx = px; cy = py; i += 1
      }
    }
    g.kind match {
      case GeomKind.Point | GeomKind.MultiPoint =>
        emitMove(g.coords, 0, g.coords.length >> 1)
      case GeomKind.LineString | GeomKind.MultiLineString =>
        var prev = 0
        for (end <- g.rings) {
          val n = end - prev
          emitMove(g.coords, prev * 2, 1)
          emitLine(g.coords, prev * 2 + 2, n - 1)
          prev = end
        }
      case GeomKind.Polygon | GeomKind.MultiPolygon =>
        var ri = 0
        while (ri < g.rings.length) {
          val s = g.ringStart(ri); val e = g.ringEnd(ri)
          // ring is stored closed; wire format drops the closing vertex
          val n = e - s - 1
          emitMove(g.coords, s * 2, 1)
          emitLine(g.coords, s * 2 + 2, n - 1)
          out += ((CmdClosePath | (1 << 3)).toLong)
          ri += 1
        }
      case _ => return null
    }
    out.toArray
  }

  /** Decode a packed command array back into a FlatGeom (integer
    * coords as doubles). Polygons: a ring with positive shoelace in
    * screen space starts a new polygon (spec §4.3.4.4), negative rings
    * are its holes. */
  def decodeGeometry(gtype: Int, cmds: Array[Long]): FlatGeom = {
    var cx = 0L; var cy = 0L
    var i = 0
    val rings = new ArrayBuffer[Array[Double]]()
    var cur = new ArrayBuffer[Double]()
    var closed = false
    while (i < cmds.length) {
      val cmd = (cmds(i) & 0x7).toInt
      val count = (cmds(i) >> 3).toInt
      i += 1
      cmd match {
        case CmdMoveTo =>
          if (gtype != 1 && cur.nonEmpty) { rings += cur.toArray; cur = new ArrayBuffer[Double]() }
          var k = 0
          while (k < count) {
            cx += unzigzag(cmds(i)); cy += unzigzag(cmds(i + 1)); i += 2
            cur += cx.toDouble; cur += cy.toDouble; k += 1
          }
        case CmdLineTo =>
          var k = 0
          while (k < count) {
            cx += unzigzag(cmds(i)); cy += unzigzag(cmds(i + 1)); i += 2
            cur += cx.toDouble; cur += cy.toDouble; k += 1
          }
        case CmdClosePath =>
          // reclose the ring explicitly (internal representation)
          cur += cur(0); cur += cur(1)
          rings += cur.toArray; cur = new ArrayBuffer[Double]()
          closed = true
        case other =>
          throw new IllegalArgumentException(s"MVT: command $other")
      }
    }
    if (cur.nonEmpty) rings += cur.toArray
    gtype match {
      case 1 =>
        val cs = rings.headOption.map(_.toSeq).getOrElse(cur.toSeq).toArray
        if (cs.length == 2) FlatGeom.point(cs(0), cs(1)) else FlatGeom.multiPoint(cs)
      case 2 =>
        if (rings.length == 1) FlatGeom.lineString(rings(0))
        else FlatGeom.multiLineString(rings.toSeq)
      case 3 =>
        require(closed, "MVT: polygon without ClosePath")
        val polys = new ArrayBuffer[FlatGeom]()
        var shell: Array[Double] = null
        var holes = new ArrayBuffer[Array[Double]]()
        for (r <- rings) {
          val a2 = Planar.twiceSignedRingArea(r, 0, r.length >> 1)
          if (a2 > 0) { // exterior in screen space
            if (shell != null) polys += FlatGeom.polygon(shell, holes.toSeq)
            shell = r; holes = new ArrayBuffer[Array[Double]]()
          } else if (shell != null) holes += r
        }
        if (shell != null) polys += FlatGeom.polygon(shell, holes.toSeq)
        if (polys.length == 1) polys(0) else FlatGeom.multiPolygon(polys.toSeq)
      case other =>
        throw new IllegalArgumentException(s"MVT: geometry type $other")
    }
  }

  // --------------------------------------------------------- tile codec

  /** A feature's attributes: (name, value) with value one of String /
    * java.lang.Long / java.lang.Double / java.lang.Boolean (the MVT
    * Value variants this codec writes; nulls skipped). */
  type Tags = Seq[(String, Any)]

  /** Encode one single-layer tile. Features sorted by id (determinism
    * at any parallelism); null/empty/unencodable geometries skipped. */
  def encodeTile(layer: String, extent: Int,
      features: Seq[(Long, FlatGeom)]): Array[Byte] =
    encodeTileTagged(layer, extent, features.map { case (i, g) => (i, g, Nil) })

  /** Tagged form: layer keys/values tables build in first-occurrence
    * order over the id-sorted features — byte-deterministic for a
    * given feature set. */
  def encodeTileTagged(layer: String, extent: Int,
      features: Seq[(Long, FlatGeom, Tags)]): Array[Byte] = {
    val lb = new Buf
    lb.key(15, 0); lb.varint(2) // version = 2 (spec: MUST be first-class)
    lb.lenDelim(1, layer.getBytes("UTF-8"))
    val keyIdx = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    val valIdx = scala.collection.mutable.LinkedHashMap.empty[Any, Int]
    for ((id, g, tags) <- features.sortBy(_._1)) {
      val t = if (g == null || g.isEmpty) 0 else mvtType(g)
      if (t != 0) {
        val cmds = encodeGeometry(g)
        if (cmds != null) {
          val fb = new Buf
          fb.key(1, 0); fb.varint(id)
          val tagPairs = tags.filter(_._2 != null)
          if (tagPairs.nonEmpty) {
            val tb0 = new Buf
            for ((k, v) <- tagPairs) {
              val ki = keyIdx.getOrElseUpdate(k, keyIdx.size)
              val vi = valIdx.getOrElseUpdate(v, valIdx.size)
              tb0.varint(ki); tb0.varint(vi)
            }
            fb.lenDelim(2, tb0.toArray)
          }
          fb.key(3, 0); fb.varint(t)
          val gb = new Buf
          cmds.foreach(gb.varint)
          fb.lenDelim(4, gb.toArray)
          lb.lenDelim(2, fb.toArray)
        }
      }
    }
    keyIdx.keysIterator.foreach(k => lb.lenDelim(3, k.getBytes("UTF-8")))
    valIdx.keysIterator.foreach(v => lb.lenDelim(4, encodeValue(v)))
    lb.key(5, 0); lb.varint(extent)
    val tb = new Buf
    tb.lenDelim(3, lb.toArray)
    tb.toArray
  }

  /** MVT Value message: string(1) / double(3, fixed64) /
    * int(4, varint, v >= 0) / sint(6, zigzag, v < 0) / bool(7). */
  private def encodeValue(v: Any): Array[Byte] = {
    val b = new Buf
    v match {
      case s: String => b.lenDelim(1, s.getBytes("UTF-8"))
      case d: java.lang.Double =>
        b.key(3, 1)
        val bits = java.lang.Double.doubleToLongBits(d)
        var i = 0
        while (i < 8) { b.bytes += ((bits >>> (8 * i)) & 0xff).toByte; i += 1 }
      case l: java.lang.Long =>
        if (l >= 0) { b.key(4, 0); b.varint(l) }
        else { b.key(6, 0); b.varint(zigzag(l)) }
      case x: java.lang.Boolean =>
        b.key(7, 0); b.varint(if (x) 1 else 0)
      case other =>
        throw new IllegalArgumentException(s"MVT: tag value type $other")
    }
    b.toArray
  }

  private def decodeValue(r: Reader): Any = {
    var out: Any = null
    while (r.hasMore) {
      val k = r.varint()
      val field = (k >> 3).toInt; val wire = (k & 0x7).toInt
      field match {
        case 1 =>
          val len = r.varint().toInt
          out = new String(r.b, r.pos, len, "UTF-8"); r.pos += len
        case 2 => // float32
          var bits = 0L; var i = 0
          while (i < 4) { bits |= (r.b(r.pos + i) & 0xffL) << (8 * i); i += 1 }
          r.pos += 4
          out = java.lang.Float.intBitsToFloat(bits.toInt).toDouble: java.lang.Double
        case 3 =>
          var bits = 0L; var i = 0
          while (i < 8) { bits |= (r.b(r.pos + i) & 0xffL) << (8 * i); i += 1 }
          r.pos += 8
          out = java.lang.Double.longBitsToDouble(bits): java.lang.Double
        case 4 | 5 => out = r.varint(): java.lang.Long
        case 6 => out = unzigzag(r.varint()): java.lang.Long
        case 7 => out = (r.varint() != 0): java.lang.Boolean
        case _ => r.skip(wire)
      }
    }
    out
  }

  /** Decoded tile: (layerName, extent, features). `features` keeps
    * the untagged pair view; `tagged` adds resolved attributes. */
  final case class DecodedTile(layer: String, extent: Int,
      features: Seq[(Long, FlatGeom)],
      tagged: Seq[(Long, FlatGeom, Seq[(String, Any)])] = Nil)

  /** Decode the FIRST layer of a tile (this codec writes exactly one). */
  def decodeTile(bytes: Array[Byte]): DecodedTile = {
    val top = new Reader(bytes, 0, bytes.length)
    while (top.hasMore) {
      val k = top.varint()
      val field = (k >> 3).toInt; val wire = (k & 0x7).toInt
      if (field == 3 && wire == 2) {
        val len = top.varint().toInt
        return decodeLayer(new Reader(top.b, top.pos, top.pos + len))
      } else top.skip(wire)
    }
    throw new IllegalArgumentException("MVT: no layer")
  }

  private def decodeLayer(r: Reader): DecodedTile = {
    var name = ""; var extent = 4096
    val raw = new ArrayBuffer[(Long, FlatGeom, Array[Long])]()
    val keys = new ArrayBuffer[String]()
    val vals = new ArrayBuffer[Any]()
    while (r.hasMore) {
      val k = r.varint()
      val field = (k >> 3).toInt; val wire = (k & 0x7).toInt
      field match {
        case 1 =>
          val len = r.varint().toInt
          name = new String(r.b, r.pos, len, "UTF-8"); r.pos += len
        case 2 =>
          val len = r.varint().toInt
          raw += decodeFeature(new Reader(r.b, r.pos, r.pos + len))
          r.pos += len
        case 3 =>
          val len = r.varint().toInt
          keys += new String(r.b, r.pos, len, "UTF-8"); r.pos += len
        case 4 =>
          val len = r.varint().toInt
          vals += decodeValue(new Reader(r.b, r.pos, r.pos + len))
          r.pos += len
        case 5 => extent = r.varint().toInt
        case 15 =>
          val v = r.varint()
          require(v == 2, s"MVT: layer version $v")
        case _ => r.skip(wire)
      }
    }
    val tagged = raw.map { case (id, g, tagIdx) =>
      val tags = tagIdx.grouped(2).collect {
        case Array(ki, vi) if ki < keys.length && vi < vals.length =>
          (keys(ki.toInt), vals(vi.toInt))
      }.toSeq
      (id, g, tags)
    }.toSeq
    DecodedTile(name, extent, tagged.map(t => (t._1, t._2)), tagged)
  }

  private def decodeFeature(r: Reader): (Long, FlatGeom, Array[Long]) = {
    var id = 0L; var gtype = 0; var cmds: Array[Long] = Array.emptyLongArray
    var tagIdx: Array[Long] = Array.emptyLongArray
    while (r.hasMore) {
      val k = r.varint()
      val field = (k >> 3).toInt; val wire = (k & 0x7).toInt
      field match {
        case 1 => id = r.varint()
        case 2 =>
          val len = r.varint().toInt
          val end = r.pos + len
          val buf = new ArrayBuffer[Long]()
          while (r.pos < end) buf += r.varint()
          tagIdx = buf.toArray
        case 3 => gtype = r.varint().toInt
        case 4 =>
          val len = r.varint().toInt
          val end = r.pos + len
          val buf = new ArrayBuffer[Long]()
          while (r.pos < end) buf += r.varint()
          cmds = buf.toArray
        case _ => r.skip(wire)
      }
    }
    (id, decodeGeometry(gtype, cmds), tagIdx)
  }
}
