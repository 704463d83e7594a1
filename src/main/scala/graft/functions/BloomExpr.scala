package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Membership gate against a driver-built [[org.apache.spark.util.sketch
  * .BloomFilter]] that rides to executors as a BROADCAST of its serialized
  * bytes — the expression itself serializes per task, so it must carry only
  * the handle: an eval-set bloom is MBs, and embedding it as a literal would
  * re-ship it with every task closure. Each executor deserializes the sketch
  * once (lazy, cached in the expression instance per task thread — the
  * sketch's read path is cheap relative to one task).
  *
  * No false negatives (every inserted key answers true), so gating a join
  * input with this keeps the join's result EXACT — false positives are
  * eliminated by the join equality itself. That makes it a pure plan
  * optimization: semantics stay oracle-checkable against the ungated SQL.
  */
case class BloomMightContainExpr(child: Expression, bloomBc: Broadcast[Array[Byte]])
    extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = BooleanType

  @transient private lazy val bloom =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bloomBc.value))

  override def nullSafeEval(v: Any): Any =
    java.lang.Boolean.valueOf(bloom.mightContainString(v.toString))

  override protected def withNewChildInternal(c: Expression): BloomMightContainExpr =
    copy(child = c)
  override def prettyName: String = "bloom_might_contain"
}

object BloomExpr {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** `col` might be a member of the broadcast serialized bloom filter. */
  def mightContain(col: Column, bloomBc: Broadcast[Array[Byte]]): Column =
    ColumnBridge.column(BloomMightContainExpr(ColumnBridge.expression(col), bloomBc))

  /** Serialize a sketch BloomFilter to broadcastable bytes. */
  def serialize(bloom: org.apache.spark.util.sketch.BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    bos.toByteArray
  }
}
