package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.eth.{Erc20Decoder, EthLog}

/** Table-generating ERC-20 decode — the reference's fused decode scan
  * (`EthereumRecordCursor.java:151-189`) exposed as a standalone SQL
  * generator, for users holding raw receipt logs (the `log` table or any
  * exported logs dataset) rather than reading through the `erc20` scan:
  *
  * {{{
  * SELECT t.* FROM logs
  * LATERAL VIEW erc20_transfers(log_address, log_topics, log_data,
  *                              log_txHash, log_blockNumber) t
  * }}}
  *
  * 0 or 1 output rows per log (non-Transfer topics and malformed
  * payloads yield nothing), columns identical to the `erc20` table. Same
  * decode function as the scan ([[Erc20Decoder.decode]]), so the two paths
  * cannot drift.
  */
case class Erc20TransfersGenerator(children: Seq[Expression])
    extends Generator with CodegenFallback {
  require(children.length == 5,
    "erc20_transfers(address, topics, data, tx_hash, block_number)")

  /** Analysis-time signature check — eval casts its inputs, so a
    * wrong-typed call must fail during analysis with the expected
    * signature, not at runtime with a ClassCastException. */
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    val expected = Seq(
      "address" -> StringType,
      "topics" -> ArrayType(StringType),
      "data" -> StringType,
      "tx_hash" -> StringType,
      "block_number" -> LongType)
    // exact types (ignoring nullability): eval casts directly, and a
    // Generator gets no implicit coercion, so an INT block number must be
    // cast by the caller rather than crash an executor
    def matches(got: DataType, want: DataType): Boolean = (got, want) match {
      case (ArrayType(g, _), ArrayType(w, _)) => matches(g, w)
      case _                                  => got == want
    }
    expected.zip(children).zipWithIndex.collectFirst {
      case (((name, want), child), i) if !matches(child.dataType, want) =>
        TypeCheckResult.TypeCheckFailure(
          s"erc20_transfers argument ${i + 1} ($name) requires ${want.sql}, " +
            s"got ${child.dataType.sql}; signature: erc20_transfers(" +
            "address STRING, topics ARRAY<STRING>, data STRING, " +
            "tx_hash STRING, block_number BIGINT)")
    }.getOrElse(TypeCheckResult.TypeCheckSuccess)
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("erc20_token", StringType),
    StructField("erc20_from", StringType),
    StructField("erc20_to", StringType),
    StructField("erc20_value", DoubleType),
    StructField("erc20_txHash", StringType),
    StructField("erc20_blockNumber", LongType)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val address = children(0).eval(input)
    val topics = children(1).eval(input)
    val data = children(2).eval(input)
    val txHash = children(3).eval(input)
    val blockNumber = children(4).eval(input)
    if (address == null || topics == null || txHash == null || blockNumber == null)
      return Iterator.empty
    val topicsVec = {
      val a = topics.asInstanceOf[ArrayData]
      val b = Vector.newBuilder[String]
      var i = 0
      while (i < a.numElements()) {
        if (!a.isNullAt(i)) b += a.getUTF8String(i).toString
        i += 1
      }
      b.result()
    }
    val log = EthLog(
      address = address.asInstanceOf[UTF8String].toString,
      topics = topicsVec,
      data = if (data == null) "0x" else data.asInstanceOf[UTF8String].toString,
      transactionHash = txHash.asInstanceOf[UTF8String].toString,
      blockNumber = blockNumber.asInstanceOf[Long])
    Erc20Decoder.decode(log).iterator.map { t =>
      new GenericInternalRow(Array[Any](
        UTF8String.fromString(t.token), UTF8String.fromString(t.from),
        UTF8String.fromString(t.to), t.value,
        UTF8String.fromString(t.txHash), t.blockNumber))
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Erc20TransfersGenerator =
    copy(children = newChildren)
  override def prettyName: String = "erc20_transfers"
}
