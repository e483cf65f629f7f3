package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** Probe a serialized count-min sketch (the binary produced by Spark's
  * `count_min_sketch` aggregate) for a key's estimated frequency —
  * the read side Spark itself does not expose as an expression.
  *
  * Together with the builtin aggregate this gives the engine the classic
  * 100 TB heavy-hitters pattern: build ONE mergeable, constant-size
  * sketch over the full fact table (map-side combinable, a few KB per
  * partition on the wire), broadcast the 1-row result, and probe it for
  * a candidate key set — no shuffle of the fact table on the key, no
  * exact per-key groupBy. Estimates are deterministic for a fixed seed
  * (counter updates commute), so declared output is stable across
  * partitionings; the guarantee est ≥ exact and est ≤ exact + eps·N
  * (w.p. ≥ confidence) is asserted in CmsSpec against exact counts.
  *
  * The probe side is a tiny candidate list, so this expression is
  * `CodegenFallback` by design (it never sits in a hot loop); the
  * deserialized sketch is cached per byte-array instance so a broadcast
  * sketch is decoded once per task, not once per row.
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_cms_estimate"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == BinaryType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (binary sketch, bigint key), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  // per-task single-entry decode cache: all rows of a task see the same
  // broadcast byte array object, so reference equality is the right key
  @transient private var lastBytes: AnyRef = _
  @transient private var lastSketch: CountMinSketch = _

  override def nullSafeEval(sk: Any, key: Any): Any = {
    val bytes = sk.asInstanceOf[Array[Byte]]
    if (!(bytes eq lastBytes)) {
      lastSketch = CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
      lastBytes = bytes
    }
    lastSketch.estimateCount(key.asInstanceOf[java.lang.Long])
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}

object CmsFunctions {

  /** `cms_estimate(sketchBinary, key)` as a Column. */
  def estimate(sketch: Column, key: Column): Column =
    Bridge.column(CmsEstimate(
      Bridge.expression(sketch),
      Bridge.expression(key.cast("bigint"))))

  private[functions] val builder: Seq[Expression] => Expression = { children =>
    require(children.length == 2, "graft_cms_estimate takes exactly 2 arguments")
    CmsEstimate(children.head, Cast(children(1), LongType))
  }
}
