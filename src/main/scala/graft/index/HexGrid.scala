package graft.index

import graft.core.FlatGeom

/**
 * Pointy-top hexagonal binning in axial coordinates (q, r) — the
 * hex analogue of the square cell grid for density maps and
 * aggregation (PostGIS ST_HexagonGrid's addressing; Red Blob Games'
 * published axial/cube-rounding formulation).
 *
 * `size` is the hex circumradius in coordinate units. Every formula
 * below is written in a FIXED operation order and uses
 * floor(v + 0.5) rounding (never a half-even/away library round), so
 * a SQL oracle can reproduce each double bit-for-bit.
 */
object HexGrid {

  /** Axial q of the hex containing (x, y). */
  def hexQ(x: Double, y: Double, size: Double): Long = round2(x, y, size)._1

  /** Axial r of the hex containing (x, y). */
  def hexR(x: Double, y: Double, size: Double): Long = round2(x, y, size)._2

  private def round2(x: Double, y: Double, size: Double): (Long, Long) = {
    val q = (Math.sqrt(3.0) / 3.0 * x - y / 3.0) / size
    val r = (2.0 / 3.0 * y) / size
    // cube rounding: (q, -q-r, r), fix the axis with the largest delta
    val cy = -q - r
    val rx = Math.floor(q + 0.5)
    val ry = Math.floor(cy + 0.5)
    val rz = Math.floor(r + 0.5)
    val dx = Math.abs(rx - q)
    val dy = Math.abs(ry - cy)
    val dz = Math.abs(rz - r)
    if (dx > dy && dx > dz) ((-ry - rz).toLong, rz.toLong)
    else if (dy > dz) (rx.toLong, rz.toLong)
    else (rx.toLong, (-rx - ry).toLong)
  }

  /** Center x of hex (q, r). */
  def centerX(q: Long, r: Long, size: Double): Double =
    size * Math.sqrt(3.0) * (q + r / 2.0)

  /** Center y of hex (q, r). */
  def centerY(q: Long, r: Long, size: Double): Double =
    size * 1.5 * r

  /** The hexagon polygon of cell (q, r): six pointy-top vertices at
    * angles 30° + 60°k from the center, closed ring, CCW. */
  def hexagon(q: Long, r: Long, size: Double): FlatGeom = {
    val cx = centerX(q, r, size)
    val cy = centerY(q, r, size)
    val ring = new Array[Double](14)
    var k = 0
    while (k < 6) {
      val a = Math.PI / 6.0 + Math.PI / 3.0 * k
      ring(2 * k) = cx + size * Math.cos(a)
      ring(2 * k + 1) = cy + size * Math.sin(a)
      k += 1
    }
    ring(12) = ring(0); ring(13) = ring(1)
    FlatGeom.polygon(ring)
  }

  /** Hex (axial) grid distance: (|dq| + |dr| + |dq+dr|) / 2 — pure
    * integer arithmetic (cube-coordinate L1/2 norm). */
  def hexDistance(q1: Long, r1: Long, q2: Long, r2: Long): Long = {
    val dq = q1 - q2; val dr = r1 - r2
    (math.abs(dq) + math.abs(dr) + math.abs(dq + dr)) / 2
  }

  /** Axial direction vectors in ring-walk order (pointy-top). */
  private val Dirs = Array((1L, 0L), (1L, -1L), (0L, -1L),
    (-1L, 0L), (-1L, 1L), (0L, 1L))

  /** The ring of cells at hex distance EXACTLY k (H3 hexRing shape):
    * start k steps in direction 4 ((-1, 1)·k), walk 6 sides of k
    * steps. k = 0 yields the cell itself; 6k cells otherwise. */
  def hexRing(q: Long, r: Long, k: Int): Array[Array[Long]] = {
    if (k < 0) return null
    if (k == 0) return Array(Array(q, r))
    val out = new Array[Array[Long]](6 * k)
    var cq = q + Dirs(4)._1 * k
    var cr = r + Dirs(4)._2 * k
    var i = 0
    var side = 0
    while (side < 6) {
      var step = 0
      while (step < k) {
        out(i) = Array(cq, cr); i += 1
        cq += Dirs(side)._1; cr += Dirs(side)._2
        step += 1
      }
      side += 1
    }
    out
  }
}
