package graft.sql

import graft.core.FlatGeom
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * The columnar geometry type: one flat struct usable from Catalyst
 * without ser/deser round-trips (SURVEY.md §1.2). Kernels read the
 * arrays straight out of the InternalRow.
 *
 *   geom STRUCT<kind: TINYINT,
 *               coords: ARRAY<DOUBLE>,   -- x,y interleaved
 *               rings:  ARRAY<INT>,      -- cumulative ring end offsets
 *               parts:  ARRAY<INT>>      -- cumulative part end offsets
 */
object GeomSchema {

  val dataType: StructType = StructType(Seq(
    StructField("kind", ByteType, nullable = false),
    StructField("coords", ArrayType(DoubleType, containsNull = false), nullable = false),
    StructField("rings", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("parts", ArrayType(IntegerType, containsNull = false), nullable = false)))

  def toRow(g: FlatGeom): InternalRow =
    new GenericInternalRow(Array[Any](
      g.kind,
      new GenericArrayData(g.coords),
      new GenericArrayData(g.rings),
      new GenericArrayData(g.parts)))

  def fromRow(r: InternalRow): FlatGeom =
    new FlatGeom(
      r.getByte(0),
      r.getArray(1).toDoubleArray(),
      r.getArray(2).toIntArray(),
      r.getArray(3).toIntArray())

  /** Result row for 2-coordinate outputs (x, y as a POINT geom). */
  def pointRow(x: Double, y: Double): InternalRow = toRow(FlatGeom.point(x, y))
}
