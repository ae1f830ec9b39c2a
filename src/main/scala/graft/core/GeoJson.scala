package graft.core

/**
 * GeoJSON (RFC 7946) geometry codec — the third interop wire format
 * beside WKT/WKB/EWKB. Writer emits the six geometry types with the
 * same double formatting as the WKT writer (integral values without a
 * decimal point, shortest round-trip otherwise); the reader is a
 * minimal recursive-descent JSON parser for the geometry subset —
 * keys in any order, arbitrary whitespace, nested number arrays.
 *
 * Contract notes (mirrors the WKT/WKB codecs):
 *  - positions must be exactly 2-D: a third ordinate rejects with the
 *    engine's Z/M contract (None from readOpt), never a garbled parse;
 *  - empty coordinate arrays parse to the empty geometry (PostGIS
 *    emits {"type":"Point","coordinates":[]} for empties);
 *  - GeometryCollection is rejected here — collections live as
 *    array<geom> on the SQL surface (st_collection_fromtext).
 */
object GeoJson {

  // ---------------------------------------------------------------- writer

  private def fmt(d: Double, sb: java.lang.StringBuilder): Unit = {
    if (d == Math.rint(d) && Math.abs(d) < 1e15 && !d.isInfinite) sb.append(d.toLong)
    else sb.append(java.lang.Double.toString(d))
  }

  private def writePos(g: FlatGeom, i: Int, sb: java.lang.StringBuilder): Unit = {
    sb.append('[')
    fmt(g.x(i), sb); sb.append(',')
    fmt(g.y(i), sb)
    sb.append(']')
  }

  private def writeSeq(g: FlatGeom, from: Int, to: Int, sb: java.lang.StringBuilder): Unit = {
    sb.append('[')
    var i = from
    while (i < to) {
      if (i > from) sb.append(',')
      writePos(g, i, sb)
      i += 1
    }
    sb.append(']')
  }

  def write(g: FlatGeom): String = {
    val sb = new java.lang.StringBuilder
    sb.append("{\"type\":\"")
    sb.append(g.kind match {
      case GeomKind.Point => "Point"
      case GeomKind.LineString => "LineString"
      case GeomKind.Polygon => "Polygon"
      case GeomKind.MultiPoint => "MultiPoint"
      case GeomKind.MultiLineString => "MultiLineString"
      case GeomKind.MultiPolygon => "MultiPolygon"
      case k => throw new IllegalArgumentException(s"unknown geometry kind $k")
    })
    sb.append("\",\"coordinates\":")
    g.kind match {
      case GeomKind.Point =>
        if (g.isEmpty) sb.append("[]") else writePos(g, 0, sb)
      case GeomKind.MultiPoint =>
        writeSeq(g, 0, g.numPoints, sb)
      case GeomKind.LineString =>
        writeSeq(g, 0, g.numPoints, sb)
      case GeomKind.MultiLineString =>
        sb.append('[')
        var r = 0
        while (r < g.rings.length) {
          if (r > 0) sb.append(',')
          writeSeq(g, g.ringStart(r), g.ringEnd(r), sb)
          r += 1
        }
        sb.append(']')
      case GeomKind.Polygon =>
        sb.append('[')
        var r = 0
        while (r < g.numRings) {
          if (r > 0) sb.append(',')
          writeSeq(g, g.ringStart(r), g.ringEnd(r), sb)
          r += 1
        }
        sb.append(']')
      case GeomKind.MultiPolygon =>
        sb.append('[')
        var p = 0
        while (p < g.numParts) {
          if (p > 0) sb.append(',')
          sb.append('[')
          var r = g.partStart(p)
          while (r < g.partEnd(p)) {
            if (r > g.partStart(p)) sb.append(',')
            writeSeq(g, g.ringStart(r), g.ringEnd(r), sb)
            r += 1
          }
          sb.append(']')
          p += 1
        }
        sb.append(']')
    }
    sb.append('}')
    sb.toString
  }

  // ---------------------------------------------------------------- parser

  /** Parsed JSON value: Double | String | Vector[Any] | Map[String, Any]. */
  private final class P(s: String) {
    private var i = 0
    private def err(msg: String): Nothing =
      throw new IllegalArgumentException(s"GeoJSON parse error at $i: $msg")
    private def ws(): Unit =
      while (i < s.length && (s.charAt(i) == ' ' || s.charAt(i) == '\t' ||
        s.charAt(i) == '\n' || s.charAt(i) == '\r')) i += 1
    private def expect(c: Char): Unit = {
      ws()
      if (i >= s.length || s.charAt(i) != c) err(s"expected '$c'")
      i += 1
    }
    private def peek(): Char = { ws(); if (i >= s.length) err("eof"); s.charAt(i) }

    def value(): Any = peek() match {
      case '{' => obj()
      case '[' => arr()
      case '"' => str()
      case 't' => lit("true", java.lang.Boolean.TRUE)
      case 'f' => lit("false", java.lang.Boolean.FALSE)
      case 'n' => lit("null", null)
      case _ => num()
    }
    private def lit(word: String, v: Any): Any = {
      if (!s.startsWith(word, i)) err(s"expected $word")
      i += word.length; v
    }
    private def obj(): Map[String, Any] = {
      expect('{')
      val m = Map.newBuilder[String, Any]
      if (peek() == '}') { i += 1; return m.result() }
      var done = false
      while (!done) {
        val k = str()
        expect(':')
        m += k -> value()
        peek() match {
          case ',' => i += 1
          case '}' => i += 1; done = true
          case _ => err("expected ',' or '}'")
        }
      }
      m.result()
    }
    private def arr(): Vector[Any] = {
      expect('[')
      val b = Vector.newBuilder[Any]
      if (peek() == ']') { i += 1; return b.result() }
      var done = false
      while (!done) {
        b += value()
        peek() match {
          case ',' => i += 1
          case ']' => i += 1; done = true
          case _ => err("expected ',' or ']'")
        }
      }
      b.result()
    }
    private def str(): String = {
      expect('"')
      val sb = new java.lang.StringBuilder
      while (i < s.length && s.charAt(i) != '"') {
        val c = s.charAt(i)
        if (c == '\\') {
          i += 1
          if (i >= s.length) err("bad escape")
          s.charAt(i) match {
            case '"' => sb.append('"')
            case '\\' => sb.append('\\')
            case '/' => sb.append('/')
            case 'b' => sb.append('\b')
            case 'f' => sb.append('\f')
            case 'n' => sb.append('\n')
            case 'r' => sb.append('\r')
            case 't' => sb.append('\t')
            case 'u' =>
              if (i + 4 >= s.length) err("bad unicode escape")
              sb.append(Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar)
              i += 4
            case c2 => err(s"bad escape \\$c2")
          }
        } else sb.append(c)
        i += 1
      }
      if (i >= s.length) err("unterminated string")
      i += 1
      sb.toString
    }
    private def num(): Double = {
      ws()
      val start = i
      if (i < s.length && (s.charAt(i) == '-' || s.charAt(i) == '+')) i += 1
      while (i < s.length && (s.charAt(i).isDigit || s.charAt(i) == '.' ||
        s.charAt(i) == 'e' || s.charAt(i) == 'E' ||
        ((s.charAt(i) == '-' || s.charAt(i) == '+') &&
          (s.charAt(i - 1) == 'e' || s.charAt(i - 1) == 'E')))) i += 1
      if (i == start) err("expected number")
      try java.lang.Double.parseDouble(s.substring(start, i))
      catch { case _: NumberFormatException => err("bad number") }
    }
    def atEnd: Boolean = { ws(); i >= s.length }
  }

  private def pos(v: Any): (Double, Double) = v match {
    case a: Vector[_] if a.length == 2 =>
      (posOrd(a(0)), posOrd(a(1)))
    case a: Vector[_] if a.length > 2 =>
      throw new IllegalArgumentException("Z/M dimensions unsupported (2-D engine)")
    case _ => throw new IllegalArgumentException("position must be [x, y]")
  }
  private def posOrd(v: Any): Double = v match {
    case d: Double => d
    case _ => throw new IllegalArgumentException("ordinate must be a number")
  }
  private def seq(v: Any): Array[Double] = v match {
    case a: Vector[_] =>
      val out = new Array[Double](a.length * 2)
      var i = 0
      a.foreach { p => val (x, y) = pos(p); out(2 * i) = x; out(2 * i + 1) = y; i += 1 }
      out
    case _ => throw new IllegalArgumentException("expected coordinate array")
  }
  private def seqs(v: Any): Seq[Array[Double]] = v match {
    case a: Vector[_] => a.map(seq)
    case _ => throw new IllegalArgumentException("expected nested coordinate array")
  }

  def read(s: String): FlatGeom = {
    val p = new P(s)
    val root = p.value() match {
      case m: Map[String @unchecked, Any @unchecked] => m
      case _ => throw new IllegalArgumentException("GeoJSON geometry must be an object")
    }
    if (!p.atEnd) throw new IllegalArgumentException("trailing content after geometry")
    val tpe = root.getOrElse("type", null) match {
      case t: String => t
      case _ => throw new IllegalArgumentException("missing \"type\"")
    }
    if (tpe == "GeometryCollection")
      throw new IllegalArgumentException(
        "GeometryCollection maps to array<geom> (use the collection surface)")
    val coords = root.getOrElse("coordinates",
      throw new IllegalArgumentException("missing \"coordinates\""))
    def emptyIf(v: Any)(build: => FlatGeom): FlatGeom = v match {
      case a: Vector[_] if a.isEmpty => FlatGeom.empty
      case _ => build
    }
    tpe match {
      case "Point" => emptyIf(coords) {
        val (x, y) = pos(coords); FlatGeom.point(x, y)
      }
      case "MultiPoint" => emptyIf(coords)(FlatGeom.multiPoint(seq(coords)))
      case "LineString" => emptyIf(coords)(FlatGeom.lineString(seq(coords)))
      case "MultiLineString" => emptyIf(coords)(FlatGeom.multiLineString(seqs(coords)))
      case "Polygon" => emptyIf(coords) {
        val rings = seqs(coords)
        FlatGeom.polygon(rings.head, rings.tail)
      }
      case "MultiPolygon" => emptyIf(coords) {
        val polys = coords match {
          case a: Vector[_] => a.map { pv =>
            val rings = seqs(pv)
            FlatGeom.polygon(rings.head, rings.tail)
          }
          case _ => throw new IllegalArgumentException("expected polygon array")
        }
        FlatGeom.multiPolygon(polys)
      }
      case t => throw new IllegalArgumentException(s"unknown geometry type \"$t\"")
    }
  }

  def readOpt(s: String): Option[FlatGeom] =
    try Some(read(s)) catch { case _: IllegalArgumentException => None }
}
