package graft.storage

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** pk column → `_bucket` id: the codegen'd executor-side twin of the
  * driver-side `StorageBackend.bucketOf` (typed JVM hashCodes, floorMod)
  * used on bulk-load routing. Replaces the per-pk-type Scala UDFs that
  * boxed every row; the generated code is a single static-hash +
  * floorMod inline in the project stage.
  *
  * Semantics (typed keys: `1` ≠ `"1"` ≠ `true`) are pinned by
  * SourcesSpec against `bucketOf` for every pk type.
  */
case class BucketRoute(child: Expression, buckets: Int)
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "bucket_route"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType | StringType | BooleanType | DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bucket_route: unsupported pk type $other")
    }

  override def nullSafeEval(v: Any): Any = v match {
    case u: UTF8String => StorageBackend.bucketOf(u.toString, buckets)
    case other => StorageBackend.bucketOf(other, buckets)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val hash: String => String = child.dataType match {
      case LongType => c => s"java.lang.Long.hashCode($c)"
      case StringType => c => s"$c.toString().hashCode()"
      case BooleanType => c => s"java.lang.Boolean.hashCode($c)"
      case DoubleType => c => s"java.lang.Double.hashCode($c)"
      case other => throw new IllegalStateException(s"unreachable: $other")
    }
    defineCodeGen(ctx, ev, c => s"java.lang.Math.floorMod(${hash(c)}, $buckets)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object BucketRoute {
  def apply(c: Column, buckets: Int): Column =
    Bridge.column(BucketRoute(Bridge.expression(c), buckets))
}
