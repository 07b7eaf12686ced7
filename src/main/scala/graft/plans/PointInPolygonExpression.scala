package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for the spatial-join predicate: ray-casting
  * point-in-polygon over an `array<struct<lon:double,lat:double>>` vertex
  * column (J1, `04_worker_script.sql:12-16`'s `ST_Intersects`).
  *
  * vs the UDF form in [[graft.functions.Geo]]: reads Catalyst `ArrayData`
  * directly (no Row materialization per evaluation) and stays inside
  * whole-stage codegen via a static-call `doGenCode` — the predicate runs
  * rows × polygons times inside the broadcast nested-loop join, so the
  * per-call overhead is the join's multiplier.
  */
case class PointInPolygonExpression(lon: Expression, lat: Expression,
    vertices: Expression) extends TernaryExpression {

  override def first: Expression = lon
  override def second: Expression = lat
  override def third: Expression = vertices
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true

  override def nullSafeEval(lonV: Any, latV: Any, vertsV: Any): Any =
    PointInPolygonExpression.contains(
      lonV.asInstanceOf[Double], latV.asInstanceOf[Double],
      vertsV.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cls = PointInPolygonExpression.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, (lo, la, vs) => s"$cls.contains($lo, $la, $vs)")
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(lon = newFirst, lat = newSecond, vertices = newThird)
}

object PointInPolygonExpression {

  /** Even-odd crossing test over ArrayData of (lon, lat) structs — the
    * same math as `Geo.pointInPolygon`, shared by interpreted eval and
    * generated code. */
  def contains(lon: Double, lat: Double, verts: ArrayData): Boolean = {
    val n = verts.numElements()
    var inside = false
    var j = n - 1
    var i = 0
    while (i < n) {
      // user-supplied vertex arrays may carry null elements; treat the
      // polygon as not containing anything rather than NPE inside codegen
      if (verts.isNullAt(i) || verts.isNullAt(j)) return false
      val vi = verts.getStruct(i, 2)
      val vj = verts.getStruct(j, 2)
      val xi = vi.getDouble(0); val yi = vi.getDouble(1)
      val xj = vj.getDouble(0); val yj = vj.getDouble(1)
      if ((yi > lat) != (yj > lat) &&
          lon < (xj - xi) * (lat - yi) / (yj - yi) + xi)
        inside = !inside
      j = i
      i += 1
    }
    inside
  }

  /** Column form via the registered SQL function (see
    * [[GraftExtensions]]). */
  def pointInPolygonNative(lon: Column, lat: Column,
      verts: Column): Column =
    org.apache.spark.sql.functions.call_function(
      "point_in_polygon", lon, lat, verts)
}
