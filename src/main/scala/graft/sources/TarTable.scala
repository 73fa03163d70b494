package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.Tar

/** `.tar` as a path table — WebDataset shards readable the way the
  * reference reads csv/json (`SELECT * FROM 'shard.tar'`). One row per
  * member with the WebDataset sample key (basename before the first
  * dot) and extension split out, so `GROUP BY sample_key` reassembles
  * samples and `WHERE ext = 'txt'` selects modalities.
  *
  * `data` is the raw member as binary; `text` is its UTF-8 decode (the
  * right column for .txt/.cls/.json members — binary members decode
  * lossily, use `data`). Scale shape: one task per shard file,
  * member-parallel within; checksum/framing violations fail loudly
  * with the path (no-silent-caps rule).
  */
object TarTable {

  final case class TarRow(file: String, member_idx: Long, name: String,
                          sample_key: String, ext: String, size: Long,
                          data_offset: Long, data: Array[Byte],
                          text: String)

  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select("path", "content")
      .as[(String, Array[Byte])]
      .flatMap { case (file, raw) =>
        val members = Tar.parse(raw).getOrElse(
          throw new IllegalArgumentException(
            s"corrupt tar framing in $file"))
        members.zipWithIndex.map { case (m, i) =>
          val base = m.name.split('/').last
          val dot = base.indexOf('.')
          val (key, ext) =
            if (dot < 0) (base, "")
            else (base.substring(0, dot), base.substring(dot + 1))
          TarRow(file, i.toLong, m.name, key, ext, m.size, m.dataOffset,
            m.data, new String(m.data, UTF_8))
        }
      }
      .toDF()
  }
}
