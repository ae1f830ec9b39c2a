package graft.kernels

import scala.collection.mutable.ArrayBuffer

/**
 * Ear-clipping triangulation with holes, following the well-known
 * earcut algorithm family (FIST / mapbox-earcut shape, written from
 * the published algorithm description): polygon rings become circular
 * doubly-linked vertex lists; holes are eliminated by bridging each
 * hole's leftmost vertex to a visible outer vertex (leftward ray cast
 * + reflex refinement); ears are clipped with an inclusive
 * point-in-triangle blocking test over list NODES (bridge twins are
 * distinct nodes, so zero-width corridors behave); when no ear is
 * found the list is repaired by removing local self-intersections and,
 * failing that, split along a valid internal diagonal and the halves
 * triangulated independently. Robust for the weakly-simple rings the
 * bridging produces (triangulate_earcut.rs:6 semantics).
 */
object Earcut {

  private final class Node(val x: Double, val y: Double) {
    var prev: Node = _
    var next: Node = _
    var steiner: Boolean = false
  }

  /** rings: first = outer, rest = holes; each a flat open or closed
    * coord list. Returns flat triangles (6 doubles each). */
  def triangulate(rings: Seq[Array[Double]]): Array[Array[Double]] = {
    if (rings.isEmpty || rings.head.length < 6) return Array.empty
    // Orientation: area(p,q,r) below is the NEGATIVE of the standard
    // cross product, and ears require area < 0 (= standard-CCW
    // corners), so the outer ring is linked standard-COUNTER-clockwise
    // and holes clockwise; every predicate's inequality direction
    // assumes exactly this pairing.
    var outer = linkedList(rings.head, wantStdCcw = true)
    if (outer == null) return Array.empty
    val holes = rings.tail.filter(_.length >= 6)
    if (holes.nonEmpty) outer = eliminateHoles(holes, outer)
    val tris = new ArrayBuffer[Array[Double]]()
    earcutLinked(outer, tris, 0)
    tris.toArray
  }

  // ------------------------------------------------------ list building

  private def signedArea2(cs: Array[Double]): Double = {
    var s = 0.0
    val n = cs.length / 2
    var i = 0
    while (i < n) {
      val j = (i + 1) % n
      s += cs(2 * i) * cs(2 * j + 1) - cs(2 * j) * cs(2 * i + 1)
      i += 1
    }
    s
  }

  private def linkedList(csIn: Array[Double], wantStdCcw: Boolean): Node = {
    // drop closing duplicate
    var cs = csIn
    val n0 = cs.length / 2
    if (n0 >= 2 && cs(0) == cs(2 * (n0 - 1)) && cs(1) == cs(2 * (n0 - 1) + 1))
      cs = java.util.Arrays.copyOfRange(cs, 0, cs.length - 2)
    val isCcw = signedArea2(cs) > 0
    val forward = isCcw == wantStdCcw
    var last: Node = null
    val n = cs.length / 2
    var k = 0
    while (k < n) {
      val i = if (forward) k else n - 1 - k
      last = insertNode(cs(2 * i), cs(2 * i + 1), last)
      k += 1
    }
    filterPoints(last, null)
  }

  private def insertNode(x: Double, y: Double, last: Node): Node = {
    val p = new Node(x, y)
    if (last == null) { p.prev = p; p.next = p }
    else {
      p.next = last.next
      p.prev = last
      last.next.prev = p
      last.next = p
    }
    p
  }

  private def removeNode(p: Node): Unit = {
    p.next.prev = p.prev
    p.prev.next = p.next
  }

  /** Remove collinear and duplicate points. */
  private def filterPoints(startIn: Node, endIn: Node): Node = {
    if (startIn == null) return null
    var end = if (endIn == null) startIn else endIn
    var p = startIn
    var again = false
    do {
      again = false
      if (!p.steiner && (equalsNode(p, p.next) || area(p.prev, p, p.next) == 0)) {
        removeNode(p)
        p = p.prev
        end = p
        if (p == p.next) return null
        again = true
      } else {
        p = p.next
      }
    } while (again || p != end)
    end
  }

  // ------------------------------------------------------ hole removal

  private def eliminateHoles(holes: Seq[Array[Double]], outerIn: Node): Node = {
    var outer = outerIn
    val queue = new ArrayBuffer[Node]()
    holes.foreach { h =>
      val list = linkedList(h, wantStdCcw = false)
      if (list != null) {
        if (list == list.next) list.steiner = true
        queue += leftmost(list)
      }
    }
    queue.sortInPlaceBy(n => (n.x, n.y))
    queue.foreach { m =>
      outer = eliminateHole(m, outer)
    }
    outer
  }

  private def leftmost(start: Node): Node = {
    var p = start.next
    var best = start
    while (p != start) {
      if (p.x < best.x || (p.x == best.x && p.y < best.y)) best = p
      p = p.next
    }
    best
  }

  private def eliminateHole(hole: Node, outer: Node): Node = {
    val bridge = findHoleBridge(hole, outer)
    if (bridge == null) return outer
    val bridgeReverse = splitPolygon(bridge, hole)
    filterPoints(bridgeReverse, bridgeReverse.next)
    val filtered = filterPoints(bridge, bridge.next)
    if (filtered != null) filtered else outer
  }

  /** David Eberly's visible-vertex search: leftward ray from the
    * hole's leftmost vertex. */
  private def findHoleBridge(hole: Node, outer: Node): Node = {
    var p = outer
    val hx = hole.x
    val hy = hole.y
    var qx = Double.NegativeInfinity
    var m: Node = null
    // find the edge the leftward ray hits first; remember its lower-x
    // endpoint on the ray's right side
    do {
      if (hy <= p.y && hy >= p.next.y && p.next.y != p.y) {
        val x = p.x + (hy - p.y) * (p.next.x - p.x) / (p.next.y - p.y)
        if (x <= hx && x > qx) {
          qx = x
          m = if (p.x < p.next.x) p else p.next
          if (x == hx) return m // ray hits a vertex exactly
        }
      }
      p = p.next
    } while (p != outer)
    if (m == null) return null
    // refine: reflex vertices inside the triangle (h, intersection, m)
    // with the smallest tangential angle win
    val stop = m
    val mx = m.x
    val my = m.y
    var tanMin = Double.PositiveInfinity
    p = m
    do {
      if (hx >= p.x && p.x >= mx && hx != p.x &&
          pointInTriangle(if (hy < my) hx else qx, hy,
            mx, my, if (hy < my) qx else hx, hy, p.x, p.y)) {
        val tan = Math.abs(hy - p.y) / (hx - p.x)
        if (locallyInside(p, hole) &&
            (tan < tanMin || (tan == tanMin &&
              (p.x > m.x || (p.x == m.x && sectorContainsSector(m, p)))))) {
          m = p
          tanMin = tan
        }
      }
      p = p.next
    } while (p != stop)
    m
  }

  private def sectorContainsSector(m: Node, p: Node): Boolean =
    area(m.prev, m, p.prev) < 0 && area(p.next, m, m.next) < 0

  /** Link a <-> b with a bridge (duplicating both); returns the new
    * node of the second ring half. */
  private def splitPolygon(a: Node, b: Node): Node = {
    val a2 = new Node(a.x, a.y)
    val b2 = new Node(b.x, b.y)
    val an = a.next
    val bp = b.prev
    a.next = b
    b.prev = a
    a2.next = an
    an.prev = a2
    b2.next = a2
    a2.prev = b2
    bp.next = b2
    b2.prev = bp
    b2
  }

  // ------------------------------------------------------ ear clipping

  private def earcutLinked(earIn: Node, tris: ArrayBuffer[Array[Double]], pass: Int): Unit = {
    var ear = earIn
    if (ear == null) return
    var stop = ear
    while (ear.prev != ear.next) {
      val prev = ear.prev
      val next = ear.next
      if (isEar(ear)) {
        tris += Array(prev.x, prev.y, ear.x, ear.y, next.x, next.y)
        removeNode(ear)
        ear = next.next
        stop = next.next
      } else {
        ear = next
        if (ear == stop) {
          if (pass == 0) {
            earcutLinked(filterPoints(ear, null), tris, 1)
          } else if (pass == 1) {
            val cured = cureLocalIntersections(filterPoints(ear, null), tris)
            earcutLinked(cured, tris, 2)
          } else if (pass == 2) {
            splitEarcut(ear, tris)
          }
          return
        }
      }
    }
  }

  private def isEar(ear: Node): Boolean = {
    val a = ear.prev
    val b = ear
    val c = ear.next
    if (area(a, b, c) >= 0) return false // reflex or degenerate
    var p = ear.next.next
    while (p != ear.prev) {
      if (pointInTriangle(a.x, a.y, b.x, b.y, c.x, c.y, p.x, p.y) &&
          area(p.prev, p, p.next) >= 0) return false
      p = p.next
    }
    true
  }

  private def cureLocalIntersections(startIn: Node, tris: ArrayBuffer[Array[Double]]): Node = {
    if (startIn == null) return null
    var start = startIn
    var p = start
    do {
      val a = p.prev
      val b = p.next.next
      if (!equalsNode(a, b) && intersectsSeg(a, p, p.next, b) &&
          locallyInside(a, b) && locallyInside(b, a)) {
        tris += Array(a.x, a.y, p.x, p.y, b.x, b.y)
        removeNode(p)
        removeNode(p.next)
        p = b; start = b
      }
      p = p.next
    } while (p != start)
    filterPoints(p, null)
  }

  private def splitEarcut(start: Node, tris: ArrayBuffer[Array[Double]]): Unit = {
    var a = start
    do {
      var b = a.next.next
      while (b != a.prev) {
        if (a.x != b.x || a.y != b.y) {
          if (isValidDiagonal(a, b)) {
            var c = splitPolygon(a, b)
            val a2 = filterPoints(a, a.next)
            c = filterPoints(c, c.next)
            earcutLinked(a2, tris, 0)
            earcutLinked(c, tris, 0)
            return
          }
        }
        b = b.next
      }
      a = a.next
    } while (a != start)
  }

  // ------------------------------------------------------ predicates

  @inline private def area(p: Node, q: Node, r: Node): Double =
    (q.y - p.y) * (r.x - q.x) - (q.x - p.x) * (r.y - q.y)

  @inline private def equalsNode(a: Node, b: Node): Boolean =
    a.x == b.x && a.y == b.y

  @inline private def pointInTriangle(ax: Double, ay: Double, bx: Double, by: Double,
      cx: Double, cy: Double, px: Double, py: Double): Boolean =
    (cx - px) * (ay - py) >= (ax - px) * (cy - py) &&
    (ax - px) * (by - py) >= (bx - px) * (ay - py) &&
    (bx - px) * (cy - py) >= (cx - px) * (by - py)

  private def isValidDiagonal(a: Node, b: Node): Boolean =
    a.next != b && a.prev != b &&
      !intersectsPolygon(a, b) &&
      ((locallyInside(a, b) && locallyInside(b, a) && middleInside(a, b) &&
        (area(a.prev, a, b.prev) != 0 || area(a, b.prev, b) != 0)) ||
        (equalsNode(a, b) && area(a.prev, a, a.next) > 0 && area(b.prev, b, b.next) > 0))

  private def sign(v: Double): Int = if (v > 0) 1 else if (v < 0) -1 else 0

  private def onSegment(p: Node, q: Node, r: Node): Boolean =
    q.x <= Math.max(p.x, r.x) && q.x >= Math.min(p.x, r.x) &&
      q.y <= Math.max(p.y, r.y) && q.y >= Math.min(p.y, r.y)

  private def intersectsSeg(p1: Node, q1: Node, p2: Node, q2: Node): Boolean = {
    val o1 = sign(area(p1, q1, p2))
    val o2 = sign(area(p1, q1, q2))
    val o3 = sign(area(p2, q2, p1))
    val o4 = sign(area(p2, q2, q1))
    if (o1 != o2 && o3 != o4) return true
    if (o1 == 0 && onSegment(p1, p2, q1)) return true
    if (o2 == 0 && onSegment(p1, q2, q1)) return true
    if (o3 == 0 && onSegment(p2, p1, q2)) return true
    if (o4 == 0 && onSegment(p2, q1, q2)) return true
    false
  }

  private def intersectsPolygon(a: Node, b: Node): Boolean = {
    var p = a
    do {
      if (p != a && p.next != a && p != b && p.next != b &&
          intersectsSeg(p, p.next, a, b)) return true
      p = p.next
    } while (p != a)
    false
  }

  private def locallyInside(a: Node, b: Node): Boolean =
    if (area(a.prev, a, a.next) < 0)
      area(a, b, a.next) >= 0 && area(a, a.prev, b) >= 0
    else
      area(a, b, a.prev) < 0 || area(a, a.next, b) < 0

  private def middleInside(a: Node, b: Node): Boolean = {
    val px = (a.x + b.x) / 2
    val py = (a.y + b.y) / 2
    var inside = false
    var p = a
    do {
      if ((p.y > py) != (p.next.y > py) && p.next.y != p.y &&
          px < (p.next.x - p.x) * (py - p.y) / (p.next.y - p.y) + p.x)
        inside = !inside
      p = p.next
    } while (p != a)
    inside
  }
}
