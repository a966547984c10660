package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata alongside.
  *
  * The real decode (JPEG/PNG/audio frames) needs codec libraries that are
  * not in this container, so the decode kernel is a clearly-marked
  * deterministic STUB — but everything Spark-side is real and tested:
  * the schema (binary payload + metadata columns), the row-local
  * metadata extraction (codegen'd expressions, no shuffle), and the
  * partition-batched decode entry point ([[decodeBatched]], the Scala
  * analog of `mapInPandas`: one iterator per partition, batch-shaped,
  * so a real decoder could amortize codec init per partition — exactly
  * how a 1000-executor cluster would run it).
  */
object Multimodal {

  /** Typed metadata record a real decoder would emit per payload. */
  final case class MediaMeta(doc_id: Long, byte_len: Long, fake_width: Long,
                             fake_height: Long)

  /** Row-local metadata extraction over a binary `payload` column —
    * pure expressions, stays inside whole-stage codegen. The "decode"
    * here is the deterministic stub: width/height derived from byte
    * length (a real build swaps these two lines for a codec call in
    * [[decodeBatched]]). */
  def withDecodedMeta(df: DataFrame): DataFrame =
    df.withColumn("byte_len", octet_length(col("payload")).cast("long"))
      .withColumn("fake_width", (col("byte_len") % 640).cast("long"))
      .withColumn("fake_height", (col("byte_len") * 7 % 480).cast("long"))

  /** Partition-batched decode: the heavy-kernel entry point. Signature and
    * batching are production-shaped; the kernel body is the stub. */
  def decodeBatched(df: DataFrame, idCol: String = "doc_id",
                    payloadCol: String = "payload"): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // A real decoder initializes its codec once per partition here.
        rows.map { case (id, bytes) => decodeStub(id, bytes) }
      }
  }

  /** STUB decode kernel — deterministic fake in place of a codec call.
    * Replace the body with e.g. `ImageIO.read(new ByteArrayInputStream
    * (bytes))` when codec libraries are available. */
  private def decodeStub(id: Long, bytes: Array[Byte]): MediaMeta = {
    val n = bytes.length.toLong
    MediaMeta(id, n, n % 640, n * 7 % 480)
  }
}
