package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** `.tar` as a path table — WebDataset shards readable the way the
  * reference reads csv/json (`SELECT * FROM 'shard.tar'`). One row per
  * member with the WebDataset sample key (basename before the first
  * dot) and extension split out, so `GROUP BY sample_key` reassembles
  * samples and `WHERE ext = 'txt'` selects modalities.
  *
  * `data` is the raw member as binary; `text` is its UTF-8 decode (the
  * right column for .txt/.cls/.json members — binary members decode
  * lossily, use `data`).
  *
  * Implementation is the DataSourceV2 connector
  * [[graft.sources.v2.TarTableProvider]] (`graft-tar`) — one walk for
  * the SQL path-table surface and the programmatic format surface.
  * The connector plans one input partition per shard file (globs fan
  * out) and prunes columns: a name/size/offset projection walks only
  * ustar headers, never copying or decoding payloads.
  * Checksum/framing violations fail loudly with the path
  * (no-silent-caps rule).
  */
object TarTable {

  final case class TarRow(file: String, member_idx: Long, name: String,
                          sample_key: String, ext: String, size: Long,
                          data_offset: Long, data: Array[Byte],
                          text: String)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.format("graft-tar").load(path)
}
