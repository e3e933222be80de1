package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Streaming ingest dedup: a STREAM of new documents flagged against the
  * static band-bucket store of the already-kept corpus — the serving half
  * of the incremental near-dup story ([[graft.operators.Dedup.minhashIncremental]]
  * is the batch half; this runs the same verdict as documents arrive).
  *
  * Same architecture discipline as [[StreamingAnn]]:
  *  - signature + band keys are pure expressions (the native MinHash
  *    expression runs per incoming row, no state);
  *  - candidate generation is a stream-static LEFT join against the band
  *    store on `(band, key)` — only colliding buckets produce matches,
  *    and a doc with no collision still flows through with a null match;
  *  - the per-document verdict is the ONE stateful aggregate a streaming
  *    query admits: `max(est_jaccard)` over the doc's ≤ Bands×bucket
  *    matches (bounded state per key, mergeable across micro-batches).
  *
  * At scale the store is sketch-only (8 band rows of a 32-slot signature
  * per kept doc) and partitioned by `(band, key)`; each micro-batch
  * shuffles only its colliding rows.
  */
object StreamingDedup {

  /** `docStream` (streaming, columns `doc_id`, `text`) → one row per doc
    * `(doc_id, max_est, dup_corpus)` against the static `store`
    * ([[graft.operators.Dedup.minhashBandStore]] layout: `doc_id`, `sig`,
    * `band`, `key`). Run with update/complete output mode.
    *
    * `broadcastStore` hints the stream-static candidate join to broadcast
    * the store side, so each micro-batch's rows never shuffle for the
    * join — the right call ONLY when the caller knows the store is
    * bounded (e.g. a split-bounded demo corpus, or a per-tenant shard).
    * The default keeps the scale-safe partitioned `(band, key)` equi-join:
    * at full corpus scale the store is the whole kept archive and must
    * stay distributed. */
  def dedupStream(docStream: DataFrame, store: DataFrame,
      threshold: Double = 0.5, broadcastStore: Boolean = false): DataFrame = {
    val s = docStream.sparkSession
    import s.implicits._
    val banded = docStream
      .select($"doc_id", Dedup.minhashSignature($"text").as("sig"))
      .select($"doc_id", $"sig",
              posexplode(Dedup.bandKeys($"sig")).as(Seq("band", "key")))
    val old0 = store.select($"band", $"key",
      $"doc_id".as("old_id"), $"sig".as("old_sig"))
    val old = if (broadcastStore) broadcast(old0) else old0
    banded.join(old, Seq("band", "key"), "left")
      .select($"doc_id",
        when($"old_id".isNotNull, Dedup.estJaccard($"sig", $"old_sig"))
          .otherwise(lit(null)).as("e"))
      .groupBy($"doc_id")
      .agg(coalesce(max($"e"), lit(0.0)).as("max_est"))
      .select($"doc_id", $"max_est", ($"max_est" >= threshold).as("dup_corpus"))
  }
}
