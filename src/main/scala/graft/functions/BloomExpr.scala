package graft.functions

import org.apache.spark.sql.{Column, GraftExprBridge}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain(x)` over a driver-built long-key Bloom filter — the
  * scale lever for x88's decontamination pre-filter (E81).
  *
  * The expression owns the SERIALIZED filter bytes (so the expression tree
  * Java-serializes into the task binary without dragging a live filter
  * through tree-copy semantics) and rebuilds the filter lazily once per
  * deserialized instance; codegen pins the rebuilt filter in the references
  * array (one virtual call per row, no per-row deserialization). Probes are
  * `mightContainLong` on the same spark-sketch filter `df.stat.bloomFilter`
  * builds, so builder and prober hash identically by construction.
  *
  * No false negatives ever (the Bloom guarantee) — callers that follow the
  * filter with an exact confirm join keep EXACT semantics; the fpp only
  * costs wasted confirm-join probes. */
case class BloomMightContainLong(child: Expression, bytes: Array[Byte])
    extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = BooleanType
  override def inputTypes: Seq[GraftExprBridge.AbstractType] = Seq(LongType)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val filter: BloomFilter = BloomFilter.readFrom(bytes)

  override def nullSafeEval(a: Any): Any =
    filter.mightContainLong(a.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", filter, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $ref.mightContainLong($x);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object BloomExpr {
  /** Serialize a driver-built filter for embedding into the expression. */
  def toBytes(bf: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  def mightContainLong(bytes: Array[Byte], c: Column): Column =
    GraftExprBridge.toColumn(BloomMightContainLong(GraftExprBridge.toExpression(c), bytes))
}
