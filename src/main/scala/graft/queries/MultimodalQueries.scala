package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

/** Multimodal-pipeline coverage: binary payload + typed metadata columns,
  * stub decode / feature extraction / frame sampling (see Multimodal.scala —
  * codec stubbed, plumbing real). The oracles mirror the stub's md5-based
  * formulas, verifying the full pipeline (schema → mapPartitions → rows).
  */
object MultimodalQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_features" -> ((s, dir) => {
      Multimodal.extractFeatures(Multimodal.mediaFromDocuments(s, dir))
        .toDF()
        .orderBy(col("media_id")).limit(200)
    }),

    "multimodal_frames" -> ((s, dir) => {
      Multimodal.sampleFrames(Multimodal.mediaFromDocuments(s, dir), every = 4)
        .toDF()
        .orderBy(col("media_id"), col("frame_idx")).limit(300)
    }),

    // metadata-only aggregation: never touches payload bytes — at scale this
    // prunes to parquet column chunks of the metadata struct only
    "multimodal_meta_stats" -> ((s, dir) => {
      Multimodal.mediaFromDocuments(s, dir).toDF()
        .groupBy(col("meta.mime").as("mime"))
        .agg(count(lit(1)).as("n"),
          sum(col("meta.width").cast("long")).as("sum_w"),
          sum(col("meta.nFrames").cast("long")).as("sum_frames"))
        .orderBy(col("mime"))
    })
  )

  private def hex60(e: String) = s"('0x' || substr(md5($e), 1, 15))::BIGINT"

  def oracle: Map[String, String] = Map(
    "multimodal_features" ->
      s"""SELECT doc_id AS media_id,
         |  CAST(len(text) AS BIGINT) AS byte_len,
         |  ${hex60("text")} AS content_hash,
         |  CAST(n_chars % 640 + 1 AS INT) AS width,
         |  CAST(n_chars % 480 + 1 AS INT) AS height,
         |  floor(CAST(list_sum(list_transform(range(1, len(text) + 1),
         |      i -> ascii(substr(text, i, 1)))) AS DOUBLE)
         |    / greatest(len(text), 1) / 255.0 * 10000.0 + 0.5) / 10000.0 AS brightness
         |FROM documents ORDER BY media_id LIMIT 200""".stripMargin,

    "multimodal_frames" ->
      s"""SELECT doc_id AS media_id, CAST(f AS INT) AS frame_idx,
         |  ${hex60("text || '#' || CAST(f AS VARCHAR)")} AS frame_hash
         |FROM documents, unnest(range(0, CAST(n_chars % 16 + 1 AS INT), 4)) AS u(f)
         |ORDER BY media_id, frame_idx LIMIT 300""".stripMargin,

    "multimodal_meta_stats" ->
      """SELECT 'image/fake' AS mime, count(*) AS n,
        |  CAST(sum(CAST(n_chars % 640 + 1 AS BIGINT)) AS BIGINT) AS sum_w,
        |  CAST(sum(CAST(n_chars % 16 + 1 AS BIGINT)) AS BIGINT) AS sum_frames
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
