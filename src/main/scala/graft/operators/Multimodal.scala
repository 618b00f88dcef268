package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY §2.3 #32): treat media as
  * opaque `binary` payloads with typed metadata, decoded/featurized
  * per partition in batches.
  *
  * The image/audio codecs aren't in this environment, so `decodeStub`
  * is a clearly-marked deterministic fake — but everything Spark-side
  * is real and load-bearing: the binary column, the schema of the
  * feature struct, partition-batched iteration (the `mapPartitions`
  * shape a Pandas-UDF/Arrow batch pipeline has on a cluster), and the
  * downstream joinability of the features.
  */
object Multimodal {

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("byte_len", LongType, nullable = false),
    StructField("content_md5", StringType, nullable = false),
    StructField("feature", ArrayType(DoubleType, containsNull = false), nullable = false)))

  /** STUB decode: a real implementation would parse the media header
    * and run a feature extractor here. Deterministic fake: md5 + a
    * 4-dim feature derived from byte statistics.
    */
  private def decodeStub(payload: Array[Byte]): (String, Array[Double]) = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(payload).map("%02x".format(_)).mkString
    var sum = 0L; var mx = 0L; var i = 0
    while (i < payload.length) { val b = payload(i) & 0xFF; sum += b; if (b > mx) mx = b; i += 1 }
    val n = math.max(payload.length, 1)
    (hex, Array(payload.length.toDouble, sum.toDouble / n, mx.toDouble,
      (sum % 251).toDouble))
  }

  /** Binary payload pipeline: documents → utf-8 payload bytes (stand-in
    * for an image/audio blob column) → per-partition batched decode →
    * typed features.
    */
  def features(s: SparkSession, dir: String): DataFrame = {
    val withPayload = Tables.documents(s, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    val rdd = withPayload.rdd.mapPartitions { it =>
      // batch shape: decode in groups, as an Arrow/Pandas batch would
      it.grouped(256).flatMap(_.iterator.map { row =>
        val id = row.getLong(0)
        val payload = row.getAs[Array[Byte]](1)
        val (hex, feat) = decodeStub(payload)
        Row(id, payload.length.toLong, hex, feat.toIndexedSeq)
      })
    }
    s.createDataFrame(rdd, featureSchema).orderBy("doc_id")
  }
}
