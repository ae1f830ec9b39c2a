package graft

import graft.core.Wkt
import graft.kernels.{Geodesic, GeodesicArea, Planar, Topo, Vincenty}

/**
 * Golden-value generator for the geodesic driver queries
 * (q_geodesic_gold / q_geodesic_area_gold) plus a one-off check that
 * every star polygon's interior point is its centroid (which makes
 * q_interiorpoint's SQL oracle the shoelace centroid).
 *
 * Gold provenance: distances come from OUR Karney implementation but
 * are only accepted when (a) they agree with the independent Vincenty
 * solver to < 1 mm, and (b) the rounded output sits ≥ 0.05 units away
 * from its rounding boundary (no ULP flip risk). Case 1 additionally
 * matches the reference's published doc value (geodesic.rs:122 —
 * NYC→London 5_585_234 m), and the area cases match the published
 * geodesic_area.rs doc values.
 */
object GeoGoldGen {

  val DistCases: Seq[(Int, Double, Double, Double, Double)] = Seq(
    (0, -74.006, 40.7128, -0.1278, 51.5074), // NYC→London (published)
    (1, 0.0, 0.0, 1.0, 0.0),                 // equatorial degree
    (2, 0.0, 0.0, 0.0, 1.0),                 // meridional degree
    (3, 2.3522, 48.8566, 13.405, 52.52),     // Paris→Berlin
    (4, 151.2093, -33.8688, -70.6693, -33.4489), // Sydney→Santiago
    (5, 0.0, 0.0, 179.5, 0.5),               // near-antipodal
    (6, 0.0, 89.0, 180.0, 89.0),             // over the pole
    (7, 10.0, 70.0, 30.0, -70.0),            // trans-hemisphere
    (8, 139.6917, 35.6895, -122.4194, 37.7749), // Tokyo→SF
    (9, 0.0, -30.0, 0.25, -30.25))           // short oblique

  def main(args: Array[String]): Unit = {
    println("== geodesic distance gold ==")
    DistCases.foreach { case (id, x1, y1, x2, y2) =>
      val k = Geodesic.inverseDistance(x1, y1, x2, y2)
      val v = Vincenty.distance(x1, y1, x2, y2)
      val frac = math.abs(k - math.rint(k))
      val margin = math.abs(frac - 0.5)
      println(f"($id, ${math.rint(k).toLong}) karney=$k%.6f vincenty-delta=${k - v}%.6f boundary-margin=$margin%.3f")
    }

    println("== geodesic area gold ==")
    val o2 = "POLYGON((0.00388383 51.501574,0.00538587 51.502278,0.00553607 51.503299," +
      "0.00467777 51.504181,0.00327229 51.504435,0.00187754 51.504168," +
      "0.00087976 51.503380,0.00107288 51.502324,0.00185608 51.501770," +
      "0.00388383 51.501574))"
    val aus = "POLYGON((125 -15,113 -22,117 -37,130 -33,148 -39,154 -27,144 -15,125 -15))"
    val ausCw = "POLYGON((125 -15,144 -15,154 -27,148 -39,130 -33,117 -37,113 -22,125 -15))"
    Seq("o2" -> o2, "aus_ccw" -> aus, "aus_cw" -> ausCw).foreach { case (name, wkt) =>
      val g = Wkt.read(wkt)
      val s = GeodesicArea.signedArea(g)
      val u = GeodesicArea.unsignedArea(g)
      println(f"$name signed=$s%.2f unsigned=$u%.2f signed_round=${math.rint(s).toLong} unsigned_round=${math.rint(u).toLong}")
    }

    println("== star interior point vs centroid ==")
    var allCentroid = true
    (0 until 25).foreach { i =>
      val g = Wkt.read(Queries.starWkt(i))
      val ip = Topo.interiorPointApprox(g)
      val c = Planar.centroid(g)
      val same = math.abs(ip(0) - c(0)) < 1e-12 && math.abs(ip(1) - c(1)) < 1e-12
      if (!same) { allCentroid = false; println(s"star $i: ip=${ip.toSeq} centroid=${c.toSeq}") }
    }
    println(s"all stars interior-point==centroid: $allCentroid")
  }
}
