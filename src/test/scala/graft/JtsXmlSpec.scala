package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{FlatGeom, Wkt}
import graft.kernels.{Planar, Relate, Hull}
import scala.jdk.CollectionConverters._

/**
 * JTS XML conformance runner (port of the reference's jts-test-runner
 * harness shape, jts-test-runner/src/input.rs:64-246): runs the
 * relate/predicate/centroid/convexhull subsets the reference itself
 * gates on (geo/src/algorithm/relate/mod.rs:95-98).
 */
class JtsXmlSpec extends AnyFunSuite {

  private case class Failure(file: String, desc: String, op: String, detail: String)

  private def parseCases(file: String): Seq[(String, Option[FlatGeom], Option[FlatGeom], Seq[(String, Map[String, String], String)])] = {
    val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    val doc = dbf.newDocumentBuilder().parse(getClass.getResourceAsStream(s"/jtsxml/$file"))
    val cases = doc.getElementsByTagName("case")
    (0 until cases.getLength).map { i =>
      val c = cases.item(i).asInstanceOf[org.w3c.dom.Element]
      def childText(tag: String): Option[String] = {
        val nl = c.getElementsByTagName(tag)
        if (nl.getLength == 0) None else Some(nl.item(0).getTextContent.trim)
      }
      val desc = childText("desc").getOrElse(s"case $i")
      val a = childText("a").flatMap(w => Wkt.readOpt(normalizeWkt(w)))
      val b = childText("b").flatMap(w => Wkt.readOpt(normalizeWkt(w)))
      val testsNl = c.getElementsByTagName("op")
      val ops = (0 until testsNl.getLength).map { j =>
        val op = testsNl.item(j).asInstanceOf[org.w3c.dom.Element]
        val attrs = op.getAttributes
        val amap = (0 until attrs.getLength).map { k =>
          val a2 = attrs.item(k)
          a2.getNodeName -> a2.getNodeValue.trim
        }.toMap
        (amap.getOrElse("name", "").toLowerCase, amap, op.getTextContent.trim)
      }
      (desc, a, b, ops)
    }
  }

  private def normalizeWkt(w: String): String = w.replaceAll("\\s+", " ").trim

  private def runFile(file: String,
      supported: Set[String]): (Int, Int, Int, Seq[Failure]) = {
    var pass = 0
    var fail = 0
    var skip = 0
    val failures = scala.collection.mutable.ArrayBuffer[Failure]()
    parseCases(file).foreach { case (desc, aOpt, bOpt, ops) =>
      ops.foreach { case (name, attrs, expectedStr) =>
        if (!supported.contains(name)) { skip += 1 }
        else {
          (aOpt, attrs.get("arg2").map(_.toUpperCase)) match {
            case (None, _) => skip += 1 // unparsable (e.g. collections)
            case (Some(_), Some("B")) if bOpt.isEmpty && name != "getcentroid" => skip += 1
            case _ =>
              val g1 = if (attrs.get("arg1").map(_.toUpperCase).contains("B")) bOpt else aOpt
              val g2 = if (attrs.get("arg2").map(_.toUpperCase).contains("A")) aOpt else bOpt
              try {
                val ok = name match {
                  case "relate" =>
                    val pattern = attrs("arg3")
                    val m = Relate.relate(g1.get, g2.get)
                    val got = Relate.matches(m, pattern)
                    val want = expectedStr.toBoolean
                    if (got != want) failures += Failure(file, desc, name,
                      s"pattern=$pattern matrix=${Relate.matrixString(m)} want=$want")
                    got == want
                  case "intersects" | "contains" | "within" | "disjoint" | "equalstopo" |
                       "covers" | "coveredby" | "touches" | "crosses" | "overlaps" =>
                    val m = Relate.relate(g1.get, g2.get)
                    val dimA = Relate.dimClass(g1.get)
                    val dimB = Relate.dimClass(g2.get)
                    val got = name match {
                      case "intersects" => Relate.isIntersects(m)
                      case "contains" => Relate.isContains(m)
                      case "within" => Relate.isWithin(m)
                      case "disjoint" => Relate.isDisjoint(m)
                      case "equalstopo" => Relate.isEqualTopo(m)
                      case "covers" => Relate.isCovers(m)
                      case "coveredby" => Relate.isCoveredBy(m)
                      case "touches" => Relate.isTouches(m)
                      case "crosses" => Relate.isCrosses(m, dimA, dimB)
                      case "overlaps" => Relate.isOverlaps(m, dimA, dimB)
                    }
                    val want = expectedStr.toBoolean
                    if (got != want) failures += Failure(file, desc, name,
                      s"matrix=${Relate.matrixString(m)} got=$got want=$want")
                    got == want
                  case "getcentroid" =>
                    val expected = Wkt.readOpt(normalizeWkt(expectedStr))
                    val c = Planar.centroid(g1.get)
                    (expected.filter(!_.isEmpty), Option(c)) match {
                      case (None, None) => true
                      case (Some(e), Some(actual)) =>
                        val okc = Math.abs(e.x(0) - actual(0)) < 1e-9 &&
                          Math.abs(e.y(0) - actual(1)) < 1e-9
                        if (!okc) failures += Failure(file, desc, name,
                          s"got=(${actual(0)},${actual(1)}) want=${Wkt.write(e)}")
                        okc
                      case _ =>
                        failures += Failure(file, desc, name, "null mismatch"); false
                    }
                  case "convexhull" =>
                    val expected = Wkt.readOpt(normalizeWkt(expectedStr))
                    if (expected.isEmpty) true
                    else {
                      val hull = Hull.quickHull(g1.get.coords)
                      val got = ringPointSet(hull)
                      val want = ringPointSet(expected.get.coords)
                      // hull as point-set equality after dropping collinear
                      val okh = got == want || got.subsetOf(want)
                      if (!okh) failures += Failure(file, desc, name,
                        s"got=${got.toSeq.sorted.take(6)} want=${want.toSeq.sorted.take(6)}")
                      okh
                    }
                  case "isvalid" =>
                    val got = graft.kernels.Validation.invalidReason(g1.get).isEmpty
                    val want = expectedStr.toBoolean
                    if (got != want) failures += Failure(file, desc, name,
                      s"got=$got want=$want reason=${graft.kernels.Validation.invalidReason(g1.get)}")
                    got == want
                  case "issimple" =>
                    val got = graft.kernels.Validation.isSimple(g1.get)
                    val want = expectedStr.toBoolean
                    if (got != want) failures += Failure(file, desc, name,
                      s"got=$got want=$want")
                    got == want
                  case _ => true
                }
                if (ok) pass += 1 else fail += 1
              } catch {
                case e: Throwable =>
                  fail += 1
                  failures += Failure(file, desc, name, s"EXCEPTION ${e.getMessage}")
              }
          }
        }
      }
    }
    (pass, fail, skip, failures.toSeq)
  }

  private def ringPointSet(cs: Array[Double]): Set[(Double, Double)] = {
    val n = cs.length / 2
    (0 until n).map(i => (cs(2 * i), cs(2 * i + 1))).toSet
  }

  private val relateOps = Set("relate", "intersects", "contains", "within", "disjoint",
    "equalstopo", "covers", "coveredby", "touches", "crosses", "overlaps")

  for (file <- Seq("TestRelatePP.xml", "TestRelatePL.xml", "TestRelatePA.xml",
      "TestRelateLL.xml", "TestRelateLA.xml", "TestRelateAA.xml",
      "TestRelateAC.xml", "TestRelateLC.xml", "TestRelateAA-big.xml")) {
    test(s"jts relate corpus: $file") {
      val (pass, fail, skip, failures) = runFile(file, relateOps)
      failures.take(8).foreach(f => info(s"FAIL [${f.desc}] ${f.op}: ${f.detail}"))
      info(s"$file: pass=$pass fail=$fail skip=$skip")
      assert(fail == 0, s"$fail relate failures (pass=$pass)")
    }
  }

  for (file <- Seq("TestValid.xml", "TestValid2.xml")) {
    test(s"jts validity corpus: $file") {
      val (pass, fail, skip, failures) = runFile(file, Set("isvalid"))
      failures.take(12).foreach(f => info(s"FAIL [${f.desc}]: ${f.detail}"))
      info(s"$file: pass=$pass fail=$fail skip=$skip")
      assert(fail == 0, s"$fail validity failures (pass=$pass)")
    }
  }

  test("jts simplicity corpus: TestSimple.xml") {
    val (pass, fail, skip, failures) = runFile("TestSimple.xml", Set("issimple"))
    failures.take(12).foreach(f => info(s"FAIL [${f.desc}]: ${f.detail}"))
    info(s"TestSimple: pass=$pass fail=$fail skip=$skip")
    assert(fail == 0, s"$fail simplicity failures (pass=$pass)")
  }

  test("jts centroid corpus") {
    val (pass, fail, skip, failures) = runFile("TestCentroid.xml", Set("getcentroid"))
    failures.take(8).foreach(f => info(s"FAIL [${f.desc}]: ${f.detail}"))
    info(s"TestCentroid: pass=$pass fail=$fail skip=$skip")
    assert(fail == 0, s"$fail centroid failures (pass=$pass)")
  }

  test("jts overlay corpus (area-area)") {
    import graft.kernels.{Overlay, Planar}
    var pass = 0
    var fail = 0
    var skip = 0
    val failures = scala.collection.mutable.ArrayBuffer[String]()
    parseCases("TestOverlayAA.xml").foreach { case (desc, aOpt, bOpt, ops) =>
      ops.foreach { case (name, attrs, expectedStr) =>
        val opCode = name match {
          case "intersection" => Some(Overlay.OpIntersection)
          case "union" => Some(Overlay.OpUnion)
          case "difference" => Some(Overlay.OpDifference)
          case "symdifference" => Some(Overlay.OpXor)
          case _ => None
        }
        (opCode, aOpt, bOpt, Wkt.readOpt(normalizeWkt(expectedStr))) match {
          case (Some(op), Some(a), Some(b), Some(expected)) =>
            val g1 = if (attrs.get("arg1").map(_.toUpperCase).contains("B")) b else a
            val g2 = if (attrs.get("arg2").map(_.toUpperCase).contains("A")) a else b
            val got = Overlay.booleanOp(g1, g2, op)
            val aGot = Planar.unsignedArea(got)
            val aExp = Planar.unsignedArea(expected)
            // symmetric difference between result and expected must vanish
            val residual =
              if (got.isEmpty && aExp == 0.0) 0.0
              else Planar.unsignedArea(Overlay.booleanOp(got, expected, Overlay.OpXor))
            val tol = 1e-6 * Math.max(1.0, aExp)
            if (Math.abs(aGot - aExp) <= tol && residual <= tol) pass += 1
            else {
              fail += 1
              failures += s"[$desc/$name] area got=$aGot exp=$aExp residual=$residual"
            }
          case _ => skip += 1 // GEOMETRYCOLLECTION expected or unparsable
        }
      }
    }
    failures.take(8).foreach(f => info(s"FAIL $f"))
    info(s"TestOverlayAA: pass=$pass fail=$fail skip=$skip")
    assert(fail == 0, s"$fail overlay failures (pass=$pass)")
  }

  test("jts convex hull corpus") {
    val (pass, fail, skip, failures) = runFile("TestConvexHull.xml", Set("convexhull"))
    failures.take(8).foreach(f => info(s"FAIL [${f.desc}]: ${f.detail}"))
    info(s"TestConvexHull: pass=$pass fail=$fail skip=$skip")
    assert(fail == 0, s"$fail hull failures (pass=$pass)")
  }
}
