package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.SparkSession

/** Native Catalyst expressions (SURVEY.md §7.2 "optional niceties"):
  * implemented as `BinaryExpression`s whose codegen is a single static
  * call, so they stay inside WholeStageCodegen — the preferred extension
  * order from the brief: built-ins > native Expression > UDF.
  */
object GraftKernels {
  private val hexDigits = "0123456789abcdef".toCharArray

  /** Deterministic UUIDv5-style id (same layout as
    * graft.functions.CleanFunctions.uuid5: md5 hex re-shaped 8-4-4-4-12
    * with version '5' / variant '8' nibbles). */
  def uuid5(ns: UTF8String, key: UTF8String): UTF8String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(ns.getBytes)
    md.update(':'.toByte)
    md.update(key.getBytes)
    val d = md.digest()
    val hex = new Array[Char](32)
    var i = 0
    while (i < 16) {
      hex(2 * i) = hexDigits((d(i) >> 4) & 0xf)
      hex(2 * i + 1) = hexDigits(d(i) & 0xf)
      i += 1
    }
    val sb = new java.lang.StringBuilder(36)
    sb.append(hex, 0, 8).append('-').append(hex, 8, 4).append("-5")
      .append(hex, 13, 3).append("-8").append(hex, 17, 3).append('-')
      .append(hex, 20, 12)
    UTF8String.fromString(sb.toString)
  }

  /** Double-precision dot product over two float arrays, index order. */
  def dotF64(a: org.apache.spark.sql.catalyst.util.ArrayData,
             b: org.apache.spark.sql.catalyst.util.ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }
}

/** SQL `uuid5(namespace, key)` — deterministic surrogate keys, replacing
  * the reference's gen_random_uuid() (All-Tasks-of-SQL.sql:97, 330). */
case class Uuid5Expr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "uuid5"

  override protected def nullSafeEval(ns: Any, key: Any): Any =
    GraftKernels.uuid5(ns.asInstanceOf[UTF8String], key.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.GraftKernels.uuid5($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Uuid5Expr =
    copy(left = l, right = r)
}

/** SQL `dot_f64(array<float>, array<float>)` — hot-path dot product that
  * fuses into WholeStageCodegen (vs. the interpreted higher-order
  * aggregate/zip_with form used where oracle exactness requires decimals). */
case class DotF64Expr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_f64"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    GraftKernels.dotF64(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.GraftKernels.dotF64($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotF64Expr =
    copy(left = l, right = r)
}

/** Registration: both as a `SparkSessionExtensions` injector (for
  * `spark.sql.extensions=graft.plans.GraftExtensions`) and as an
  * idempotent on-session registrar for sessions the driver already built. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.uuid5Fn)
    ext.injectFunction(GraftExtensions.dotF64Fn)
  }
}

object GraftExtensions {
  private val uuid5Fn = (
    FunctionIdentifier("uuid5"),
    new ExpressionInfo(classOf[Uuid5Expr].getName, "uuid5"),
    (children: Seq[Expression]) => Uuid5Expr(children(0), children(1)))
  private val dotF64Fn = (
    FunctionIdentifier("dot_f64"),
    new ExpressionInfo(classOf[DotF64Expr].getName, "dot_f64"),
    (children: Seq[Expression]) => DotF64Expr(children(0), children(1)))

  /** Register the native functions on an existing session (idempotent).
    *
    * Besides the graft kernels this exposes Spark's own (non-public-API)
    * bloom-filter pair — the exact expressions AQE's runtime row-level
    * filtering injects — so operators can build an explicit semi-join
    * bloom prune where the optimizer can't see the opportunity:
    * `bloom_agg(xxhash64(k), estItems)` → binary sketch;
    * `bloom_might_contain(sketch, xxhash64(k))` → boolean prune. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("uuid5", es => Uuid5Expr(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("dot_f64", es => DotF64Expr(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("bloom_agg",
      es => new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(es(0), es(1)),
      "built-in")
    reg.createOrReplaceTempFunction("bloom_might_contain",
      es => new org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(es(0), es(1)),
      "built-in")
  }
}
