package graft

import org.locationtech.jts.geom.{Geometry, GeometryFactory}
import org.locationtech.jts.io.WKTReader
import java.math.{BigDecimal => JBigDecimal, RoundingMode}

/**
 * Golden-oracle generator (TEST scope only — JTS is the independent
 * oracle here, never the engine): computes the expected outputs of the
 * star-polygon driver queries (q_overlay, q_relate, q_dissolve) with
 * JTS and prints them as DuckDB VALUES clauses to paste into
 * [[Queries.oracles]]. The star dimension derives from the nation
 * table (25 rows at every TPC-H SF), so these goldens are
 * SF-independent.
 *
 * Also prints, for every rounded area, its distance to the nearest
 * round-half boundary — a guard against HALF_UP flips between the
 * engine's double and JTS's double (flag anything < 1e-9).
 */
object GoldGen {

  private def round4(x: Double): JBigDecimal =
    new JBigDecimal(x).setScale(4, RoundingMode.HALF_UP)

  private def boundaryDist(x: Double, scale: Int): Double = {
    val shifted = x * math.pow(10, scale + 1)
    val frac = math.abs(shifted - math.rint(shifted))
    // distance of the (scale+1)-th digit position from ...5
    math.abs(math.abs(shifted - math.floor(shifted / 10) * 10) % 10 - 5)
  }

  def main(args: Array[String]): Unit = {
    val reader = new WKTReader(new GeometryFactory())
    val stars: Map[Int, Geometry] =
      (0 until 25).map(i => i -> reader.read(Queries.starWkt(i))).toMap

    var minBoundary = Double.MaxValue
    def r4(x: Double): String = {
      val b = boundaryDist(x, 4)
      minBoundary = math.min(minBoundary, b)
      round4(x).toPlainString
    }

    // ---- q_relate: pairs a <= b with JTS intersects
    val relRows = for {
      a <- 0 until 25; b <- a until 25
      if stars(a).intersects(stars(b))
    } yield s"($a, $b, '${stars(a).relate(stars(b)).toString}')"
    println("-- q_relate VALUES (a_id, b_id, de9im):")
    println(relRows.mkString(",\n"))

    // ---- q_overlay: pairs a < b intersecting; areas rounded 4
    val ovRows = for {
      a <- 0 until 25; b <- (a + 1) until 25
      if stars(a).intersects(stars(b))
    } yield {
      val ga = stars(a); val gb = stars(b)
      s"($a, $b, ${r4(ga.intersection(gb).getArea)}, " +
        s"${r4(ga.union(gb).getArea)}, ${r4(ga.difference(gb).getArea)})"
    }
    println("-- q_overlay VALUES (a_id, b_id, inter_area, union_area, diff_area):")
    println(ovRows.mkString(",\n"))

    // ---- q_dissolve: groups pid % 5, unary-union area rounded 4
    val disRows = (0 until 5).map { g =>
      val members = (0 until 25).filter(_ % 5 == g).map(stars)
      val union = new org.locationtech.jts.operation.union.CascadedPolygonUnion(
        scala.jdk.CollectionConverters.SeqHasAsJava(members).asJava).union()
      s"($g, ${r4(union.getArea)})"
    }
    println("-- q_dissolve VALUES (grp, dissolved_area):")
    println(disRows.mkString(",\n"))

    println(f"-- min distance of any 5th-decimal digit from the HALF_UP boundary: $minBoundary%.6f (flag if < 1e-6)")
  }
}
