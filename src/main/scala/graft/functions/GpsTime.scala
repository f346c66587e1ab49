package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, TimestampNTZType, TimestampType}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult

/** GPS seconds from a UTC timestamp — the one scalar in the reference
  * surface with no Spark built-in (`display_time`, utils.py:191-193, via
  * astropy `Time.gps`).
  *
  * GPS time = atomic seconds since 1980-01-06T00:00:00 UTC. Unlike Unix
  * time it does NOT absorb leap seconds, so the conversion needs the
  * published IERS leap-second table (public data): gps = unix - 315964800 +
  * (leap seconds introduced since GPS epoch, 18 since 2017-01-01).
  *
  * Implemented as a native Catalyst UnaryExpression WITH codegen (the
  * generated code calls the static converter) so it fuses into
  * whole-stage-codegen pipelines instead of breaking them the way a Scala
  * UDF would.
  */
object GpsTime {
  // (UTC unix seconds when the leap took effect, cumulative GPS-UTC offset)
  // IERS Bulletin C, public data, complete through 2026 (no leap since 2017).
  private val leaps: Array[(Long, Int)] = Array(
    362793600L -> 1,  // 1981-07-01
    394329600L -> 2,  // 1982-07-01
    425865600L -> 3,  // 1983-07-01
    489024000L -> 4,  // 1985-07-01
    567993600L -> 5,  // 1988-01-01
    631152000L -> 6,  // 1990-01-01
    662688000L -> 7,  // 1991-01-01
    709948800L -> 8,  // 1992-07-01
    741484800L -> 9,  // 1993-07-01
    773020800L -> 10, // 1994-07-01
    820454400L -> 11, // 1996-01-01
    867715200L -> 12, // 1997-07-01
    915148800L -> 13, // 1999-01-01
    1136073600L -> 14, // 2006-01-01
    1230768000L -> 15, // 2009-01-01
    1341100800L -> 16, // 2012-07-01
    1435708800L -> 17, // 2015-07-01
    1483228800L -> 18) // 2017-01-01

  private val gpsEpochUnix = 315964800L

  def leapSecondsAt(unixSeconds: Long): Int = {
    var i = leaps.length - 1
    while (i >= 0) {
      if (unixSeconds >= leaps(i)._1) return leaps(i)._2
      i -= 1
    }
    0
  }

  /** micros-since-epoch -> GPS seconds (fractional). Evaluation order
    * matches `epoch_us(ts)/1e6 - 315964800 + leaps` so results are
    * bit-identical to the SQL-arithmetic oracle formulation. */
  def gpsFromMicros(us: Long): Double =
    us / 1e6 - gpsEpochUnix + leapSecondsAt(Math.floorDiv(us, 1000000L))

  /** Column API. */
  def gps_seconds(c: Column): Column =
    Bridge.column(GpsSeconds(Bridge.expression(c)))
}

case class GpsSeconds(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == TimestampType || child.dataType == TimestampNTZType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"gps_seconds requires a timestamp input, got ${child.dataType.sql}")
  override def dataType: DataType = DoubleType
  override def nullSafeEval(v: Any): Any =
    GpsTime.gpsFromMicros(v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GpsTime.gpsFromMicros($c)")
  override protected def withNewChildInternal(newChild: Expression): GpsSeconds =
    copy(child = newChild)
}
