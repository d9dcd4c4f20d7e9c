package graft.queries

import org.apache.spark.sql.functions._
import graft.model.Tables._

/** Multimodal-column plumbing: media payloads ride as opaque `binary`
  * columns with typed metadata; decode / feature-extraction runs as a
  * per-partition batch stage (the Scala analog of `mapInPandas`).
  *
  * The decode step is a DETERMINISTIC STUB (media codecs aren't in this
  * container — builder prompt): it emits byte length + md5 content hash +
  * a fixed format tag. Everything around it is real and tested: the
  * binary-column schema, the Dataset encoder, the mapPartitions batch shape
  * (one digest instance per partition, streaming iterator — at 100 TB each
  * task decodes its split without driver involvement), and the oracle.
  */
object Multimodal {

  final case class DocBin(doc_id: Long, bin: Array[Byte])

  val all: Seq[Q] = Seq(

    Q("q_multimodal_meta",
      """SELECT doc_id,
        |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
        |  md5(text) AS content_hash,
        |  'raw' AS format
        |FROM documents ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        import s.implicits._
        val ds = documents(s, d)
          .select(col("doc_id"), col("text").cast("binary").as("bin"))
          .as[DocBin]
        ds.mapPartitions { it =>
          // one digest per partition, reused across the batch (the
          // "expensive decoder init" slot of a real media pipeline)
          val md = java.security.MessageDigest.getInstance("MD5")
          it.map { r =>
            md.reset()
            val hex = md.digest(r.bin).map("%02x".format(_)).mkString
            (r.doc_id, r.bin.length.toLong, hex, "raw")
          }
        }.toDF("doc_id", "n_bytes", "content_hash", "format")
          .orderBy("doc_id")
    }
  )
}
