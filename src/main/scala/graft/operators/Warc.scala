package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Minimal WARC (ISO 28500) reader — the container format web crawls
  * actually ship in (Common Crawl et al.), so a pipeline that starts from
  * crawl data parses this before any text stage runs. Subset supported:
  * WARC/1.0–1.1 records with header lines terminated by CRLF, a blank
  * line, then exactly `Content-Length` payload bytes; records separated by
  * CRLF CRLF. Unknown header fields are ignored; truncated or malformed
  * trailing bytes end the walk rather than failing the task (crawl files
  * are routinely cut mid-record).
  *
  * Scale shape: one WARC file is one binary row in, its records exploded
  * out via `mapPartitions` — the same batch seam as the multimodal
  * decoders; a 100 TB crawl is a directory of ~1 GB WARC files that
  * parallelize per file, and the parser walks each byte array once.
  */
object Warc {

  final case class WarcRecord(recordIdx: Int, warcType: String,
      targetUri: String, contentLength: Long, payload: Array[Byte])

  /** Walk one WARC byte array into its records. */
  def parse(bytes: Array[Byte]): Seq[WarcRecord] = {
    val out = Seq.newBuilder[WarcRecord]
    var pos = 0
    var idx = 0

    def lineEnd(from: Int): Int = {
      var i = from
      while (i + 1 < bytes.length && !(bytes(i) == '\r' && bytes(i + 1) == '\n')) i += 1
      if (i + 1 < bytes.length) i else -1
    }

    while (pos < bytes.length) {
      // skip inter-record CRLFs
      while (pos + 1 < bytes.length && bytes(pos) == '\r' && bytes(pos + 1) == '\n') pos += 2
      val vEnd = lineEnd(pos)
      if (vEnd < 0 ||
          !new String(bytes, pos, vEnd - pos, StandardCharsets.US_ASCII).startsWith("WARC/")) {
        pos = bytes.length // not a record start: stop the walk
      } else {
        pos = vEnd + 2
        var warcType = ""
        var uri = ""
        var len = -1L
        var headerDone = false
        while (!headerDone && pos < bytes.length) {
          val e = lineEnd(pos)
          if (e < 0) { headerDone = true; pos = bytes.length }
          else if (e == pos) { headerDone = true; pos = e + 2 } // blank line
          else {
            val line = new String(bytes, pos, e - pos, StandardCharsets.UTF_8)
            val ci = line.indexOf(':')
            if (ci > 0) {
              val k = line.substring(0, ci).trim.toLowerCase
              val v = line.substring(ci + 1).trim
              k match {
                case "warc-type" => warcType = v
                case "warc-target-uri" => uri = v
                case "content-length" =>
                  len = try v.toLong catch { case _: NumberFormatException => -1L }
                case _ => ()
              }
            }
            pos = e + 2
          }
        }
        if (len >= 0 && pos + len <= bytes.length) {
          out += WarcRecord(idx, warcType, uri, len,
            java.util.Arrays.copyOfRange(bytes, pos, pos + len.toInt))
          idx += 1
          pos += len.toInt
        } else {
          pos = bytes.length // truncated payload: stop
        }
      }
    }
    out.result()
  }

  /** All records of every WARC file under `dir` as
    * (name, record_idx, warc_type, uri, content_length, payload).
    */
  def warcDirTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(dir)
      .select(col("path"), col("content"))
      .withColumn("name", element_at(split(col("path"), "/"), -1))
      .filter(col("name").endsWith(".warc"))
      .select(col("name"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (name, bytes) =>
          parse(bytes).map(r =>
            (name, r.recordIdx, r.warcType, r.targetUri, r.contentLength, r.payload))
        }
      }.toDF("name", "record_idx", "warc_type", "uri", "content_length", "payload")
  }
}
