package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** `.warc` / `.warc.gz` as a path table — crawl archives readable the
  * way the reference reads csv/json/lines (`SELECT * FROM
  * 'segment.warc'`). One output row per WARC record with the HTTP
  * block split out for request/response records.
  *
  * Implementation is the DataSourceV2 connector
  * [[graft.sources.v2.WarcTableProvider]] (`graft-warc`) — ONE walk
  * shared by the SQL path-table surface and the programmatic
  * `spark.read.format("graft-warc")` surface, so the two can never
  * diverge. The connector plans one input partition per shard file
  * (globs fan out: `segments/x*.warc.gz`) and prunes columns: a
  * header-only projection never copies block bytes or parses HTTP.
  *
  * A corrupt archive fails loudly with its path — a silent skip would
  * undercount a training corpus with no trace (the no-silent-caps
  * rule). That includes gzip members whose CRC32/ISIZE trailer
  * mismatches their payload (ADVICE r8).
  */
object WarcTable {

  /** One row per record: file, ordinal, WARC headers of record-level
    * interest, and the HTTP split (nulls where not applicable).
    * Field order is the connector's schema
    * ([[graft.sources.v2.WarcSourceTable.schema]]).
    */
  final case class WarcRow(file: String, record_idx: Long,
                           warc_type: String, record_id: String,
                           warc_date: String, target_uri: String,
                           content_length: Long, http_status: Option[Long],
                           http_content_type: String, body: String)

  def read(spark: SparkSession, path: String, gzipped: Boolean): DataFrame =
    spark.read.format("graft-warc")
      .option("gzipped", gzipped.toString)
      .load(path)
}
