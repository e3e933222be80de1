package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.Erc20TransfersGenerator
import graft.functions.Expressions._

/** `SparkSessionExtensions` entry point: injects the graft native functions
  * into every session built with
  * `spark.sql.extensions=graft.GraftExtensions` — the deployment-grade
  * analogue of the reference's Presto `Plugin` registration
  * (`EthereumPlugin.java:11-21`); per-session `Catalog.mount` remains the
  * programmatic route.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("simhash60"),
      info("simhash60", "simhash60(tokens) - 60-bit SimHash of a token array"),
      (es: Seq[Expression]) => SimHash60(es.head)))
    ext.injectFunction((FunctionIdentifier("hamming64"),
      info("hamming64", "hamming64(a, b) - Hamming distance of two 64-bit sketches"),
      (es: Seq[Expression]) => HammingDist64(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two double arrays"),
      (es: Seq[Expression]) => CosineSim(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("erc20_transfers"),
      info("erc20_transfers",
        "erc20_transfers(address, topics, data, tx_hash, block_number) - decode ERC-20 Transfer logs"),
      (es: Seq[Expression]) => Erc20TransfersGenerator(es)))
  }
}
