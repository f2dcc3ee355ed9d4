package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media travels as an opaque `binary` column plus typed metadata; the
  * expensive decode/feature step runs batched per partition so a real
  * implementation can amortize model/codec setup (the standard Spark
  * pattern for inference). The decode itself is STUBBED with a
  * deterministic byte-statistics transform — the image/audio codecs are
  * not available in this environment — but the schema, batching shape,
  * and partitioning are the real production plumbing.
  */
object Binary {

  /** Lightweight per-blob metadata — pure expressions, no decode.
    * `head` decodes the blob to string FIRST and then takes 8 CHARACTERS
    * (not 8 raw bytes): byte-slicing UTF-8 text truncates mid-codepoint on
    * any non-ASCII content, diverging from a character-based oracle.
    */
  def withBlobMeta(df: DataFrame, blobCol: String): DataFrame =
    df.withColumn("n_bytes", length(col(blobCol)).cast("long"))
      .withColumn("content_md5", md5(col(blobCol)))
      .withColumn("head", substring(col(blobCol).cast("string"), 1, 8))

  case class Blob(id: Long, bytes: Array[Byte])
  case class BlobFeatures(id: Long, nBytes: Long, meanByte: Double, features: Array[Float])

  /** Batched "decode + featurize" over binary blobs.
    *
    * STUB: features are a 16-bin byte histogram (deterministic fake
    * standing in for pixel/audio features). Real use: replace
    * `decodeBatch` with the codec + model call; everything else —
    * `mapPartitions`, the batch grouping, the output schema — stays.
    */
  def featurize(blobs: Dataset[Blob], batchSize: Int = 64): Dataset[BlobFeatures] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      it.grouped(batchSize).flatMap(decodeBatch)
    }
  }

  private def decodeBatch(batch: Seq[Blob]): Seq[BlobFeatures] =
    // one "model call" per batch — the amortization point
    batch.map { b =>
      val hist = new Array[Float](16)
      var sum = 0L
      b.bytes.foreach { byte =>
        val u = byte & 0xff
        hist(u / 16) += 1f
        sum += u
      }
      val n = math.max(b.bytes.length, 1)
      BlobFeatures(b.id, b.bytes.length.toLong, sum.toDouble / n,
        hist.map(_ / n))
    }
}
