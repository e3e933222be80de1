package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` payloads
  * with typed metadata, plus the decode / feature-extract / resize /
  * frame-sample stages a training pipeline runs over them.
  *
  * The container has no image/audio codecs, so the *decode kernels* are
  * deterministic fakes (clearly marked below) — but the Spark-side contract
  * is real and tested: schema (`binary` payload + metadata struct), batch
  * shape (`mapPartitions` over iterators, the JVM analogue of
  * `mapInPandas`-style batch UDFs — one kernel instance per partition, rows
  * streamed through it), partitioning (payloads never shuffle; features are
  * computed map-side and only the small feature columns move), and typed
  * `Dataset` encoders end-to-end.
  */
object Multimodal {

  case class MediaRow(
      media_id: Long,
      modality: String,         // image | audio | video
      payload: Array[Byte],     // opaque encoded bytes
      source: String,
      width: Int, height: Int,  // metadata as produced by ingestion
      sample_rate: Int)

  case class DecodedFeatures(
      media_id: Long,
      modality: String,
      n_bytes: Long,
      // FAKE-DECODE output: real pipeline would hold pixel/sample tensors
      decoded_width: Int,
      decoded_height: Int,
      n_frames: Int,
      byte_histogram: Array[Float], // 16-bin payload histogram = the "features"
      checksum: Long)

  /** Synthesize a media table from `documents` (payload = text bytes) —
    * stands in for an ingested multimodal corpus with the same schema. */
  def mediaTable(s: SparkSession, d: String): Dataset[MediaRow] = {
    import s.implicits._
    documents(s, d).select(
        $"doc_id".as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod($"doc_id", lit(3)) + 1).cast("int")).as("modality"),
        encode($"text", "UTF-8").as("payload"),
        $"source",
        (pmod($"doc_id", lit(640)) + 32).cast("int").as("width"),
        (pmod($"doc_id", lit(480)) + 32).cast("int").as("height"),
        when(pmod($"doc_id", lit(3)) === 1, 16000).otherwise(0).as("sample_rate"))
      .as[MediaRow]
  }

  /** Batch "decode + featurize" kernel. Deterministic FAKE decode: a real
    * deployment swaps `fakeDecode` for an actual codec; everything around
    * it (iterator batching, schema, partition-local state) is production
    * shape. */
  def decodeAndFeaturize(media: Dataset[MediaRow]): Dataset[DecodedFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition kernel init happens here (a real codec/model load)
      rows.map { m =>
        val (w, h, frames) = fakeDecode(m)
        val hist = new Array[Float](16)
        var checksum = 0L
        var i = 0
        while (i < m.payload.length) {
          val b = m.payload(i) & 0xff
          hist(b >> 4) += 1f
          checksum = checksum * 31 + b
          i += 1
        }
        val n = math.max(1, m.payload.length).toFloat
        var j = 0
        while (j < 16) { hist(j) /= n; j += 1 }
        DecodedFeatures(m.media_id, m.modality, m.payload.length.toLong,
          w, h, frames, hist, checksum)
      }
    }
  }

  /** FAKE decode kernel — deterministic stand-in for image/audio/video
    * codecs that are not present in this container. Returns
    * (width, height, n_frames) as a real decoder would. */
  private def fakeDecode(m: MediaRow): (Int, Int, Int) = m.modality match {
    case "image" => (m.width, m.height, 1)
    case "audio" => (0, 0, m.payload.length / math.max(1, m.sample_rate / 100))
    case _       => (m.width, m.height, math.max(1, m.payload.length / 1024))
  }

  /** Frame/sample extraction: every k-th 64-byte window of the payload —
    * the video-frame-sampling stage with a fake frame splitter. */
  def frameSample(media: Dataset[MediaRow], every: Int = 4): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.modality == "video").flatMap { m =>
      m.payload.grouped(64).zipWithIndex.collect {
        case (frame, idx) if idx % every == 0 =>
          (m.media_id, idx, frame.length, frame.map(_ & 0xff).sum.toLong)
      }
    }.toDF("media_id", "frame_idx", "frame_bytes", "frame_sum")
  }

  case class ResizedMeta(media_id: Long, width: Int, height: Int,
      new_width: Int, new_height: Int, scale_pct: Long, resized_bytes: Long)

  /** Resize stage: scale every image so its longest side is `maxSide`,
    * preserving aspect ratio (never upscale). The geometry/metadata
    * arithmetic is the real operator contract; the pixel resample kernel
    * is the container-forced stub (a real deployment swaps the payload
    * transform in the same mapPartitions batch). `resized_bytes` stands in
    * for the output payload size (w*h*3 for the fake RGB buffer). */
  def resizeMeta(media: Dataset[MediaRow], maxSide: Int = 224): Dataset[ResizedMeta] = {
    import media.sparkSession.implicits._
    media.filter(_.modality == "image").mapPartitions { rows =>
      // per-partition kernel init would happen here (a real resampler)
      rows.map { m =>
        val long = math.max(m.width, m.height)
        // integer percentage keeps the arithmetic exactly replayable
        val pct = if (long <= maxSide) 100L else maxSide * 100L / long
        val nw = (m.width * pct / 100L).toInt
        val nh = (m.height * pct / 100L).toInt
        ResizedMeta(m.media_id, m.width, m.height, nw, nh, pct, nw.toLong * nh * 3)
      }
    }
  }

  /** Resize query: per-bucket output-size accounting of the resize stage. */
  def resizeStats(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    resizeMeta(mediaTable(s, d))
      .groupBy(($"scale_pct" / 10).cast("long").as("scale_decile"))
      .agg(count(lit(1)).as("n_images"),
           sum($"resized_bytes").as("total_bytes"),
           max($"new_width").cast("long").as("max_w"),
           max($"new_height").cast("long").as("max_h"))
      .orderBy($"scale_decile")
  }

  /** Pipeline query: media → decode/featurize → per-modality aggregate. */
  def featureStats(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    decodeAndFeaturize(mediaTable(s, d))
      .groupBy($"modality")
      .agg(count(lit(1)).as("n_media"),
           sum($"n_bytes").as("total_bytes"),
           round(avg($"n_frames"), 4).as("avg_frames"),
           round(avg(element_at($"byte_histogram", 7)), 6).as("avg_hist_bin7"))
      .orderBy($"modality")
  }

  /** Frame-sampling query over the synthesized corpus. */
  def frameStats(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    frameSample(mediaTable(s, d))
      .groupBy($"media_id")
      .agg(count(lit(1)).as("n_sampled"), sum($"frame_sum").as("sum_bytes"))
      .orderBy($"media_id")
  }

  /** Frame query variant restricted to oracle-expressible columns (the
    * per-frame byte sums are fake-kernel detail, covered by unit tests). */
  def frameStatsOracle(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    frameSample(mediaTable(s, d))
      .groupBy($"media_id")
      .agg(count(lit(1)).as("n_sampled"))
      .orderBy($"media_id")
  }

  /** Exact CONTENT dedup over the binary payload — the first stage of any
    * image/audio dedup pipeline: identical encoded bytes are copies
    * regardless of metadata, so the md5 content digest keys the dedup.
    * One (modality, digest) hash aggregate (map-side partial — payloads
    * never shuffle, only 16-byte digests and integer sizes move), then a
    * modality roll-up reporting corpus size, distinct payloads, duplicate
    * copies, and the bytes a dedup pass reclaims. All exact integers;
    * byte totals stay under 2^63 until ~9 EB of media. */
  def contentDedupStats(s: SparkSession, d: String): DataFrame =
    contentDedupStatsOf(mediaTable(s, d).toDF())

  /** [[contentDedupStats]] over any `(modality, payload)`-shaped frame. */
  def contentDedupStatsOf(media: DataFrame): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    media
      .select($"modality", md5($"payload").as("key"),
              length($"payload").cast("long").as("len"))
      .groupBy($"modality", $"key")
      .agg(count(lit(1)).as("n_copies"), max($"len").as("len"))
      .groupBy($"modality")
      .agg(sum($"n_copies").as("n_media"),
           count(lit(1)).as("n_distinct"),
           sum($"n_copies" - 1L).as("n_dup_copies"),
           sum($"n_copies" * $"len").as("bytes_total"),
           sum($"len").as("bytes_dedup"))
      .orderBy($"modality")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "nd_multimodal_dedup" -> contentDedupStats _,
    "nd_multimodal_features" -> featureStats _,
    "nd_multimodal_frames" -> frameStatsOracle _,
    "nd_multimodal_frames_full" -> frameStats _,
    "nd_multimodal_resize" -> resizeStats _)

  /** All three queries are oracle-checkable from documents: the payload is
    * the utf-8 text bytes (ASCII in the fixture corpus, so byte == char),
    * the fake decode is deterministic integer arithmetic, and the
    * histogram/frame sums reduce to character-class counts the SQL can
    * replay (modality: doc_id%3 → image/audio/video; video frames = every
    * 4th 64-byte window). */
  val oracle: Map[String, String] = Map(
    // payload = utf-8 text bytes, so DuckDB's md5(text)/octet_length
    // replay the binary digest and size exactly
    "nd_multimodal_dedup" ->
      """WITH m AS (
           SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                  ELSE 'video' END AS modality,
                  md5(text) AS key,
                  CAST(octet_length(encode(text)) AS BIGINT) AS len
           FROM documents),
         g AS (SELECT modality, key, CAST(count(*) AS BIGINT) AS n_copies,
                      max(len) AS len
               FROM m GROUP BY 1, 2)
         SELECT modality,
                CAST(sum(n_copies) AS BIGINT) AS n_media,
                CAST(count(*) AS BIGINT) AS n_distinct,
                CAST(sum(n_copies - 1) AS BIGINT) AS n_dup_copies,
                CAST(sum(n_copies * len) AS BIGINT) AS bytes_total,
                CAST(sum(len) AS BIGINT) AS bytes_dedup
         FROM g GROUP BY modality ORDER BY modality""",
    "nd_multimodal_resize" ->
      """WITH img AS (
           SELECT doc_id AS media_id,
                  CAST(doc_id % 640 + 32 AS BIGINT) AS w,
                  CAST(doc_id % 480 + 32 AS BIGINT) AS h
           FROM documents WHERE doc_id % 3 = 0),
         r AS (
           SELECT media_id, w, h,
                  CASE WHEN greatest(w, h) <= 224 THEN 100 ELSE 224 * 100 // greatest(w, h) END AS pct
           FROM img),
         m AS (
           SELECT media_id, (w * pct // 100) AS nw, (h * pct // 100) AS nh, pct FROM r)
         SELECT pct // 10 AS scale_decile, count(*) AS n_images,
                CAST(sum(nw * nh * 3) AS BIGINT) AS total_bytes,
                max(nw) AS max_w, max(nh) AS max_h
         FROM m GROUP BY scale_decile ORDER BY scale_decile""",
    "nd_multimodal_frames" ->
      """SELECT doc_id AS media_id,
         CAST(ceil(ceil(octet_length(encode(text)) / 64.0) / 4.0) AS BIGINT) AS n_sampled
         FROM documents WHERE doc_id % 3 = 2 AND octet_length(encode(text)) > 0
         ORDER BY media_id""",
    "nd_multimodal_frames_full" ->
      """SELECT doc_id AS media_id,
         CAST(ceil(ceil(octet_length(encode(text)) / 64.0) / 4.0) AS BIGINT) AS n_sampled,
         CAST(list_sum(list_transform(range(1, length(text) + 1),
           i -> CASE WHEN ((i-1) // 64) % 4 = 0 THEN ascii(substr(text, CAST(i AS INTEGER), 1)) ELSE 0 END)) AS BIGINT) AS sum_bytes
         FROM documents WHERE doc_id % 3 = 2 AND octet_length(encode(text)) > 0
         ORDER BY media_id""",
    "nd_multimodal_features" ->
      """WITH media AS (
           SELECT doc_id AS media_id,
                  ['image', 'audio', 'video'][CAST(doc_id % 3 AS INTEGER) + 1] AS modality,
                  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                  len(regexp_extract_all(text, '[`a-o]')) AS bin7_count
           FROM documents),
         feat AS (
           SELECT media_id, modality, n_bytes,
                  CASE modality WHEN 'image' THEN 1
                                WHEN 'audio' THEN n_bytes // 160
                                ELSE greatest(1, n_bytes // 1024) END AS n_frames,
                  (bin7_count::REAL / greatest(1, n_bytes)::REAL) AS hist_bin7
           FROM media)
         SELECT modality, count(*) AS n_media,
                CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
                round(avg(n_frames), 4) AS avg_frames,
                round(avg(hist_bin7), 6) AS avg_hist_bin7
         FROM feat GROUP BY modality ORDER BY modality""")
}
