package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders}

/** Multimodal columns (SURVEY §2.5 L12): image/audio/video payloads as
  * opaque `binary` columns with a typed metadata struct.
  *
  * The Spark-side plumbing is real — schema, per-partition batch
  * iteration, pruned scans — and any codec plugs in behind
  * [[MediaDecoder]]. This container ships no image/audio libraries, so
  * the default decoder is a DETERMINISTIC fake: metadata derived purely
  * from the payload bytes, reproducible on any engine (that is what makes
  * the `multimodal_meta` gate SQL-oracle-able). A deployment swaps in a
  * real codec without touching the pipeline.
  *
  * Partitioning note for 100 TB of media: payloads dominate row size, so
  * decode runs AFTER pruning/filtering (binary column stays columnar
  * parquet until the mapPartitions boundary), and the output carries only
  * the metadata — never re-shuffles the payload.
  */
object Media {

  /** Decoded media metadata (the typed struct). */
  final case class DecodedMedia(width: Int, height: Int, format: String, nBytes: Long)

  /** Codec boundary: bytes in, metadata out. Implementations must be
    * Serializable (they ship to executors) and deterministic. */
  trait MediaDecoder extends Serializable {
    def decode(content: Array[Byte]): DecodedMedia
  }

  /** Deterministic fake codec — pseudo-metadata from byte length alone,
    * arithmetic chosen to be expressible in ANSI SQL for the oracle.
    * Long arithmetic throughout so multi-GB payloads don't overflow. */
  object FakeDecoder extends MediaDecoder {
    def decode(content: Array[Byte]): DecodedMedia = {
      val n = content.length.toLong
      val width = (16L + n % 640L).toInt
      val height = (16L + (n * 7L) % 480L).toInt
      val format = (n % 3L) match {
        case 0L => "png"
        case 1L => "jpeg"
        case _  => "webp"
      }
      DecodedMedia(width, height, format, n)
    }
  }

  final case class MediaRow(media_id: Long, content: Array[Byte])
  final case class MediaMetaRow(media_id: Long, width: Int, height: Int, format: String, n_bytes: Long)

  /** Decode a binary media column to its metadata frame
    * `(media_id, width, height, format, n_bytes)`. Runs the decoder via
    * `mapPartitions` — one decoder instance per partition iterator, the
    * batch shape a real codec needs (amortized init, sequential byte
    * access), not a per-row UDF. */
  def decodeMeta(df: DataFrame, id: Column, content: Column, decoder: MediaDecoder = FakeDecoder): DataFrame =
    df.select(id.cast("long").as("media_id"), content.cast("binary").as("content"))
      .as[MediaRow](Encoders.product[MediaRow])
      .mapPartitions { it =>
        it.map { r =>
          val d = decoder.decode(r.content)
          MediaMetaRow(r.media_id, d.width, d.height, d.format, d.nBytes)
        }
      }(Encoders.product[MediaMetaRow])
      .toDF()
}
