package graft.kernels

import graft.core.{FlatGeom, GeomKind}

/**
 * Vector-tile surface: XYZ tile envelopes (EPSG:3857), Mapbox-Vector-
 * Tile geometry preparation (`ST_AsMVTGeom` semantics) and square-grid
 * generation (`ST_SquareGrid`).
 *
 * Beyond the reference: the geo crate has no tiling surface at all —
 * its only grid-adjacent op is the private rect helpers
 * (geo-types/src/geometry/rect.rs). The semantics implemented here are
 * the public PostGIS contracts (ST_TileEnvelope / ST_AsMVTGeom /
 * ST_SquareGrid) restated with one deliberate, documented difference:
 * MVT clipping runs in the SNAPPED integer tile grid (transform → snap
 * → clip → snap crossings → clean) rather than PostGIS's
 * clip-then-snap, so output coordinates are always exact integers and
 * the pipeline never re-degenerates after snapping.
 *
 * Every double computation uses a FIXED op order so a SQL oracle can
 * replay the arithmetic bit-for-bit (same discipline as
 * index/HexGrid.scala).
 */
object Mvt {

  /** Half the Web-Mercator world: π·a for the WGS-84 semi-major axis —
    * the EPSG:3857 projection bound (20037508.342789244…). */
  final val HalfWorld: Double = 6378137.0 * math.Pi

  /** Tile side length in metres at zoom z (power-of-two division —
    * exact in IEEE). */
  def tileSize(z: Int): Double = (HalfWorld * 2) / (1L << z).toDouble

  /** (xmin, ymin, xmax, ymax) of the XYZ tile in EPSG:3857. Y follows
    * the slippy-map convention: y=0 is the TOP (north) row. */
  def tileBounds(z: Int, x: Long, y: Long): Array[Double] = {
    val size = tileSize(z)
    Array(
      -HalfWorld + x * size,        // xmin
      HalfWorld - (y + 1) * size,   // ymin
      -HalfWorld + (x + 1) * size,  // xmax
      HalfWorld - y * size)         // ymax
  }

  /** ST_TileEnvelope(z, x, y[, margin]): the tile rectangle, expanded
    * by `margin`·size on every side (PostGIS margin semantics; margin
    * ≥ 0, 0 = exact tile). Null (caller maps) for out-of-range z/x/y. */
  def tileEnvelope(z: Int, x: Long, y: Long, margin: Double): FlatGeom = {
    if (z < 0 || z > 31) return null
    val n = 1L << z
    if (x < 0 || y < 0 || x >= n || y >= n) return null
    val b = tileBounds(z, x, y)
    val m = tileSize(z) * margin
    FlatGeom.rect(b(0) - m, b(1) - m, b(2) + m, b(3) + m)
  }

  // ------------------------------------------------------- ST_AsMVTGeom

  /**
   * Transform `g` (EPSG:3857 coords) into integer tile-local
   * coordinates of tile (z, x, y):
   *
   *   tx = (mx - xmin) / size * extent          (fixed op order)
   *   ty = (ymax - my) / size * extent          (Y FLIPPED: screen-down)
   *   snapped = floor(t + 0.5)                  (round-half-up)
   *
   * then (when `clipGeom`) clip to the buffered tile square
   * [-buffer, extent+buffer]², snap the fractional clip crossings,
   * drop collapsed parts (rings < 4 points or zero area, lines < 2
   * points), and orient polygon shells CW in screen space (positive
   * shoelace on the stored y-down coords), holes opposite. Returns
   * null when nothing survives.
   */
  def asMvtGeom(g: FlatGeom, z: Int, x: Long, y: Long,
      extent: Int, buffer: Int, clipGeom: Boolean): FlatGeom = {
    if (g.isEmpty || z < 0 || z > 31) return null
    val b = tileBounds(z, x, y)
    val xmin = b(0); val ymax = b(3)
    val size = tileSize(z)

    // 1. transform + snap every coordinate (fixed op order)
    val cs = new Array[Double](g.coords.length)
    var i = 0
    while (i < g.coords.length) {
      cs(i) = math.floor((g.coords(i) - xmin) / size * extent + 0.5)
      cs(i + 1) = math.floor((ymax - g.coords(i + 1)) / size * extent + 0.5)
      i += 2
    }
    var snapped = rebuild(g, cs)
    if (snapped == null) return null

    // 2. clip to the buffered tile square in integer space
    if (clipGeom) {
      val lo = -buffer.toDouble
      val hi = extent.toDouble + buffer
      snapped = clipToRect(snapped, lo, hi)
      if (snapped == null || snapped.isEmpty) return null
      // clip crossings on non-axis-parallel segments are fractional —
      // snap them (idempotent for the integer vertices), re-clean
      val cs2 = snapped.coords
      var j = 0
      var frac = false
      while (j < cs2.length) {
        val r = math.floor(cs2(j) + 0.5)
        if (r != cs2(j)) { cs2(j) = r; frac = true }
        j += 1
      }
      if (frac) {
        snapped = rebuild(snapped, cs2)
        if (snapped == null) return null
        // a ≤0.5px snap displacement can in principle fold a ring —
        // repair only when it actually did (bounded, rare)
        if ((snapped.kind == GeomKind.Polygon || snapped.kind == GeomKind.MultiPolygon)
            && Validation.invalidReason(snapped).isDefined)
          snapped = MakeValid.makeValid(snapped)
      }
    }
    if (snapped == null || snapped.isEmpty) return null

    // 3. MVT winding: shells positive-shoelace on stored (y-down)
    // coords = clockwise on screen; holes opposite.
    orientForScreen(snapped)
  }

  /** Rebuild a geometry of the same shape from (already transformed)
    * coords, deduplicating consecutive identical points and dropping
    * collapsed rings/lines. Returns null when nothing survives. */
  private def rebuild(g: FlatGeom, cs: Array[Double]): FlatGeom = g.kind match {
    case GeomKind.Point =>
      FlatGeom.point(cs(0), cs(1))
    case GeomKind.MultiPoint =>
      val seen = scala.collection.mutable.LinkedHashSet.empty[(Double, Double)]
      var i = 0
      while (i < cs.length) { seen += ((cs(i), cs(i + 1))); i += 2 }
      val out = new Array[Double](seen.size * 2)
      var k = 0
      seen.foreach { p => out(k) = p._1; out(k + 1) = p._2; k += 2 }
      if (out.length == 2) FlatGeom.point(out(0), out(1)) else FlatGeom.multiPoint(out)
    case GeomKind.LineString | GeomKind.MultiLineString =>
      val lines = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
      var prev = 0
      for (end <- g.rings) {
        val l = dedupe(cs, prev * 2, end * 2)
        if (l.length >= 4) lines += l
        prev = end
      }
      if (lines.isEmpty) null
      else if (lines.length == 1 && g.kind == GeomKind.LineString) FlatGeom.lineString(lines(0))
      else FlatGeom.multiLineString(lines.toSeq)
    case GeomKind.Polygon | GeomKind.MultiPolygon =>
      val polys = scala.collection.mutable.ArrayBuffer.empty[FlatGeom]
      FlatGeom.foreachPart(g) { (_, r0, r1) =>
        var shell: Array[Double] = null
        val holes = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
        var ri = r0
        while (ri < r1) {
          val r = dedupeRing(cs, g.ringStart(ri) * 2, g.ringEnd(ri) * 2)
          val ok = r != null && (r.length >> 1) >= 4 &&
            Planar.twiceSignedRingArea(r, 0, r.length >> 1) != 0.0
          if (ri == r0) { if (ok) shell = r }
          else if (ok && shell != null) holes += r
          ri += 1
        }
        if (shell != null) polys += FlatGeom.polygon(shell, holes.toSeq)
      }
      if (polys.isEmpty) null
      else if (polys.length == 1 && g.kind == GeomKind.Polygon) polys(0)
      else FlatGeom.multiPolygon(polys.toSeq)
    case _ => null
  }

  /** Drop consecutive duplicate points in cs[from,until). */
  private def dedupe(cs: Array[Double], from: Int, until: Int): Array[Double] = {
    val out = new Array[Double](until - from)
    var k = 0
    var i = from
    while (i < until) {
      if (k == 0 || cs(i) != out(k - 2) || cs(i + 1) != out(k - 1)) {
        out(k) = cs(i); out(k + 1) = cs(i + 1); k += 2
      }
      i += 2
    }
    java.util.Arrays.copyOf(out, k)
  }

  /** Dedupe a ring slice and keep it explicitly closed; null when it
    * collapses below a triangle. */
  private def dedupeRing(cs: Array[Double], from: Int, until: Int): Array[Double] = {
    var r = dedupe(cs, from, until)
    // closing vertex may have collapsed onto the start — reclose
    if (r.length >= 4 && (r(0) != r(r.length - 2) || r(1) != r(r.length - 1))) {
      r = java.util.Arrays.copyOf(r, r.length + 2)
      r(r.length - 2) = r(0); r(r.length - 1) = r(1)
    }
    if ((r.length >> 1) < 4) null else r
  }

  /** Clip to the axis-aligned square [lo,hi]² (inclusive borders). */
  private def clipToRect(g: FlatGeom, lo: Double, hi: Double): FlatGeom = {
    val rect = FlatGeom.rect(lo, lo, hi, hi)
    g.kind match {
      case GeomKind.Point =>
        if (g.x(0) >= lo && g.x(0) <= hi && g.y(0) >= lo && g.y(0) <= hi) g else null
      case GeomKind.MultiPoint =>
        val keep = scala.collection.mutable.ArrayBuffer.empty[Double]
        var i = 0
        while (i < g.coords.length) {
          val px = g.coords(i); val py = g.coords(i + 1)
          if (px >= lo && px <= hi && py >= lo && py <= hi) { keep += px; keep += py }
          i += 2
        }
        if (keep.isEmpty) null
        else if (keep.length == 2) FlatGeom.point(keep(0), keep(1))
        else FlatGeom.multiPoint(keep.toArray)
      case GeomKind.LineString | GeomKind.MultiLineString =>
        val c = Overlay.clip(rect, g, invert = false)
        if (c == null || c.isEmpty) null else c
      case GeomKind.Polygon | GeomKind.MultiPolygon =>
        val c = Overlay.booleanOp(g, rect, Overlay.OpIntersection)
        if (c == null || c.isEmpty) null else c
      case _ => null
    }
  }

  /** Force shells to positive shoelace on the stored (y-down) coords
    * (screen-CW, the MVT spec winding), holes negative. */
  private def orientForScreen(g: FlatGeom): FlatGeom = g.kind match {
    case GeomKind.Polygon | GeomKind.MultiPolygon =>
      val polys = scala.collection.mutable.ArrayBuffer.empty[FlatGeom]
      FlatGeom.foreachPart(g) { (_, r0, r1) =>
        var shell: Array[Double] = null
        val holes = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
        var ri = r0
        while (ri < r1) {
          val r = java.util.Arrays.copyOfRange(
            g.coords, g.ringStart(ri) * 2, g.ringEnd(ri) * 2)
          val area2 = Planar.twiceSignedRingArea(r, 0, r.length >> 1)
          val want = if (ri == r0) area2 > 0 else area2 < 0
          val fixed = if (want || area2 == 0) r else reverseRing(r)
          if (ri == r0) shell = fixed else holes += fixed
          ri += 1
        }
        if (shell != null) polys += FlatGeom.polygon(shell, holes.toSeq)
      }
      if (polys.length == 1 && g.kind == GeomKind.Polygon) polys(0)
      else FlatGeom.multiPolygon(polys.toSeq)
    case _ => g
  }

  private def reverseRing(r: Array[Double]): Array[Double] = {
    val n = r.length >> 1
    val out = new Array[Double](r.length)
    var i = 0
    while (i < n) {
      out(2 * i) = r(2 * (n - 1 - i))
      out(2 * i + 1) = r(2 * (n - 1 - i) + 1)
      i += 1
    }
    out
  }

  // ------------------------------------------------------ ST_SquareGrid

  /** Cap on generated cells per geometry: a mis-sized grid over a
    * world-extent envelope must fail typed (null), not OOM a task. */
  final val MaxGridCells = 1 << 20

  /**
   * ST_SquareGrid(size, g): the (i, j) indices of every size×size grid
   * cell — cell (i, j) spans [i·size, (i+1)·size) × [j·size, (j+1)·size)
   * — whose half-open extent intersects g's envelope. Index range is
   * floor(min/size) .. floor(max/size) inclusive on each axis (exact
   * IEEE division + floor, SQL-mirrorable). Null for empty input or
   * when the grid would exceed [[MaxGridCells]].
   */
  def squareGrid(g: FlatGeom, size: Double): Array[Array[Long]] = {
    if (g.isEmpty || !(size > 0) || size.isInfinite) return null
    val b = Planar.boundingRect(g)
    // guard in the DOUBLE domain: absurd-magnitude coordinates (1e300)
    // would overflow Long index arithmetic (j += 1 wraps -> runaway)
    val fi0 = math.floor(b(0) / size); val fi1 = math.floor(b(2) / size)
    val fj0 = math.floor(b(1) / size); val fj1 = math.floor(b(3) / size)
    val fin = fi0.isFinite && fi1.isFinite && fj0.isFinite && fj1.isFinite
    if (!fin || math.abs(fi0).max(math.abs(fi1)).max(math.abs(fj0))
        .max(math.abs(fj1)) > 4.0e18) return null
    if ((fi1 - fi0 + 1) * (fj1 - fj0 + 1) > MaxGridCells) return null
    val i0 = fi0.toLong; val i1 = fi1.toLong
    val j0 = fj0.toLong; val j1 = fj1.toLong
    val ni = i1 - i0 + 1
    val nj = j1 - j0 + 1
    if (ni <= 0 || nj <= 0 || ni * nj > MaxGridCells) return null
    val out = new Array[Array[Long]]((ni * nj).toInt)
    var k = 0
    var j = j0
    while (j <= j1) {
      var i = i0
      while (i <= i1) { out(k) = Array(i, j); k += 1; i += 1 }
      j += 1
    }
    out
  }

  /** The polygon of square-grid cell (i, j) at `size`. */
  def gridCell(i: Long, j: Long, size: Double): FlatGeom =
    FlatGeom.rect(i * size, j * size, (i + 1) * size, (j + 1) * size)

  // -------------------------------------------------------- quadkeys

  /** Bing-maps quadkey of XYZ tile (z, x, y): one base-4 digit per
    * level, digit = x-bit | (y-bit << 1), most significant level
    * first (the published Microsoft tile-system scheme). Null for
    * out-of-range tiles; z = 0 is the empty string (the root tile). */
  def quadkey(z: Int, x: Long, y: Long): String = {
    if (z < 0 || z > 31) return null
    val n = 1L << z
    if (x < 0 || y < 0 || x >= n || y >= n) return null
    val sb = new java.lang.StringBuilder(z)
    var i = z
    while (i > 0) {
      val d = (((x >> (i - 1)) & 1) | (((y >> (i - 1)) & 1) << 1)).toInt
      sb.append(('0' + d).toChar)
      i -= 1
    }
    sb.toString
  }

  /** Inverse: quadkey → [z, x, y]; null on any non-[0-3] character
    * or length > 31. */
  def quadkeyDecode(qk: String): Array[Long] = {
    if (qk == null || qk.length > 31) return null
    var x = 0L; var y = 0L
    var i = 0
    while (i < qk.length) {
      val c = qk.charAt(i) - '0'
      if (c < 0 || c > 3) return null
      x = (x << 1) | (c & 1)
      y = (y << 1) | (c >> 1)
      i += 1
    }
    Array(qk.length.toLong, x, y)
  }
}
