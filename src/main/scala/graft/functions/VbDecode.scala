package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import graft.codec.PostingCodec

/** `vb_decode(blob)` — Catalyst expression decoding a delta+varbyte posting
  * blob into `array<struct<docId:long, tf:int>>` (SURVEY.md §2.10:
  * the protobuf varint codec of poseidon_if.proto:28-33 as a plan-level
  * function). CodegenFallback: the decode loop is byte-wise scalar work with
  * no gain from codegen, and it sits outside hot query paths (the WAND
  * kernel consumes blobs via the block-skipping Cursor instead, never fully
  * decoding). Registered for SQL so an operator can introspect the index
  * (`SELECT term, explode(vb_decode(blob)) FROM postings`).
  */
case class VbDecode(child: Expression) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = VbDecode.outType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"vb_decode requires BINARY, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val ps = PostingCodec.decode(input.asInstanceOf[Array[Byte]])
    val rows = new Array[Any](ps.length)
    var i = 0
    while (i < ps.length) {
      rows(i) = InternalRow(ps(i).docId, ps(i).tf)
      i += 1
    }
    new GenericArrayData(rows): ArrayData
  }

  override protected def withNewChildInternal(newChild: Expression): VbDecode = copy(newChild)
  override def prettyName: String = "vb_decode"
}

object VbDecode {
  val outType: DataType = ArrayType(StructType(Seq(
    StructField("docId", LongType, nullable = false),
    StructField("tf", IntegerType, nullable = false))), containsNull = false)

  /** Column form; requires register(spark) once per session. */
  def vb_decode(c: Column): Column =
    org.apache.spark.sql.functions.call_function("vb_decode", c)

  /** Shared SQL function builder (temp-function and extension registration):
    * arity-checked so `vb_decode()` fails analysis with a real message and
    * extra arguments are rejected instead of silently dropped. */
  def builder(exprs: Seq[Expression]): VbDecode = {
    require(exprs.length == 1,
      s"vb_decode requires exactly 1 argument, got ${exprs.length}")
    VbDecode(exprs.head)
  }

  /** Register `vb_decode` for SQL use in this session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vb_decode", builder, "scala_udf")
}
