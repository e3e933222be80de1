package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftSqlBridge.{toColumn => column, toExpression => expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot loops of the LLM-data-pipeline
  * operators (dedup / similarity). Preference order per the build rules:
  * built-ins first, then a native `Expression` (these), UDF last. These are
  * tight-loop `eval` implementations with `CodegenFallback` — no
  * serialization boundary, no boxing per element, usable from SQL and
  * `Column` alike.
  */
object Expressions {

  /** 64-bit SimHash over an array of token strings.
    *
    * Classic Charikar sketch: each token hashes to 64 bits (two murmur3
    * passes with different seeds); bit i of the result is the sign of the
    * sum over tokens of ±1 per bit. Near-duplicate documents land within a
    * small Hamming distance, so a 100 TB corpus dedups via grouping on
    * rotated prefixes instead of O(n²) comparison.
    */
  case class SimHash64(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val counts = new Array[Int](64)
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val s = arr.getUTF8String(i)
          val h1 = Murmur3_x86_32.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 0x9747b28c)
          val h2 = Murmur3_x86_32.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 0x85ebca6b)
          val h = (h1.toLong << 32) | (h2.toLong & 0xffffffffL)
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
            b += 1
          }
        }
        i += 1
      }
      var out = 0L
      var b = 0
      while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
      out
    }
    override protected def withNewChildInternal(newChild: Expression): SimHash64 = copy(newChild)
    override def prettyName: String = "simhash64"
  }

  /** Hamming distance between two 64-bit sketches. */
  case class HammingDist64(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = IntegerType
    override def nullSafeEval(l: Any, r: Any): Any =
      java.lang.Long.bitCount(l.asInstanceOf[Long] ^ r.asInstanceOf[Long])
    override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
    override def prettyName: String = "hamming64"
  }

  /** Cosine similarity of two double arrays — one fused loop instead of the
    * zip_with/aggregate expression-tree equivalent (≈3 array traversals and
    * per-element lambda dispatch). Null/zero-norm yields null. */
  case class CosineSim(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = math.min(a.numElements(), b.numElements())
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val x = a.getDouble(i); val y = b.getDouble(i)
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      if (na == 0.0 || nb == 0.0) null else dot / math.sqrt(na * nb)
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
    override def prettyName: String = "cosine_sim"
  }

  def simhash64(tokens: Column): Column = column(SimHash64(expression(tokens)))
  def hamming64(a: Column, b: Column): Column = column(HammingDist64(expression(a), expression(b)))
  def cosineSim(a: Column, b: Column): Column = column(CosineSim(expression(a), expression(b)))

  /** SQL registration: `simhash64(tokens)`, `hamming64(a,b)`, `cosine_sim(a,b)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("simhash64", es => SimHash64(es.head), "built-in")
    reg.createOrReplaceTempFunction("hamming64", es => HammingDist64(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("cosine_sim", es => CosineSim(es(0), es(1)), "built-in")
  }
}
