package graft.operators

import org.apache.spark.sql.Dataset

/** Multimodal column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata, and decode / feature-extract runs
  * as a BATCHED per-partition stage (the Scala analog of mapInPandas batch
  * shape — a real decoder would amortize model/library init per batch).
  *
  * The actual codec is STUBBED (no image/audio libraries exist in this
  * container): [[decodeStub]] produces deterministic fake dimensions and a
  * hash-derived feature vector. The Spark-side plumbing — schema, batch
  * iteration, partitioning, typed output — is real and tested; swapping in
  * a real decoder only replaces the stub body.
  */
object Multimodal {

  /** Input row: opaque media payload + typed metadata. */
  final case class MediaRow(id: Long, media: Array[Byte], mime: String)

  /** Decoded/fake-featurized output row. */
  final case class MediaFeatures(
      id: Long,
      mime: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      features: Array[Float]
  )

  final val FeatureDim = 16
  final val BatchSize = 64

  /** STUB decoder — deterministic fake. A real implementation would parse
    * the codec headers and decode pixels/samples here.
    */
  def decodeStub(media: Array[Byte]): (Int, Int) = {
    val h = graft.functions.TextStats.mix64(
      if (media.isEmpty) 0L else media.take(64).foldLeft(0L)((acc, b) => acc * 31 + b)
    )
    val width = 64 + (java.lang.Math.floorMod(h, 16L) * 64L).toInt // 64..1024
    val height = 64 + (java.lang.Math.floorMod(h >>> 8, 16L) * 48L).toInt
    (width, height)
  }

  /** STUB feature extractor — hash-derived unit vector (a real one would run
    * an image/audio model over the decoded batch).
    */
  def featuresStub(media: Array[Byte]): Array[Float] = {
    val out = new Array[Float](FeatureDim)
    var h = if (media.isEmpty) 1L else media.foldLeft(0xCBF29CE484222325L)((acc, b) => (acc ^ b) * 0x100000001B3L)
    var i = 0
    var norm = 0.0
    while (i < FeatureDim) {
      h = graft.functions.TextStats.mix64(h)
      out(i) = ((h & 0xFFFF) / 65535.0f) - 0.5f
      norm += out(i) * out(i)
      i += 1
    }
    val inv = (1.0 / math.sqrt(math.max(norm, 1e-9))).toFloat
    i = 0
    while (i < FeatureDim) { out(i) *= inv; i += 1 }
    out
  }

  /** Batched decode + featurize. Batches inside each partition mimic the
    * arrow-batch shape of mapInPandas: a real decoder initializes once per
    * partition and processes `BatchSize` payloads per call.
    */
  def extractFeatures(rows: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.mapPartitions { it =>
      // per-partition init point (model/codec handles would be created here)
      it.grouped(BatchSize).flatMap { batch =>
        batch.map { r =>
          val media = if (r.media == null) Array.emptyByteArray else r.media
          val (w, h) = decodeStub(media)
          MediaFeatures(r.id, r.mime, media.length.toLong, w, h, featuresStub(media))
        }
      }
    }
  }
}
