package graft

import org.apache.spark.sql.functions.col

import graft.operators.Media

final case class Blob(media_id: Long, content: Array[Byte])

/** L12: binary payload + typed metadata plumbing; decoder swap. */
class MultimodalSpec extends SparkSpec {

  object Blobs extends GSchema {
    val media_id = col[Long]("media_id")
    val content  = col[Array[Byte]]("content")
  }

  private def df = {
    import spark.implicits._
    Tio.fromRows(spark, Blobs, Seq(
      Blob(1L, "abc".getBytes("UTF-8")),
      Blob(2L, Array.fill[Byte](700)(7)),
      Blob(3L, Array.emptyByteArray),
    )).toNative
  }

  test("decodeMeta derives deterministic metadata via mapPartitions") {
    val out = Media.decodeMeta(df, col("media_id"), col("content"))
      .collect().map(r => r.getAs[Long]("media_id") ->
        ((r.getAs[Int]("width"), r.getAs[Int]("height"), r.getAs[String]("format"), r.getAs[Long]("n_bytes")))).toMap
    assert(out(1L) == ((19, 37, "png", 3L)))     // n=3: 16+3, 16+21, 3%3=0
    assert(out(2L) == ((16 + 700 % 640, 16 + (700 * 7) % 480, "jpeg", 700L))) // 700%3=1
    assert(out(3L) == ((16, 16, "png", 0L)))
  }

  test("a custom decoder plugs in behind the MediaDecoder trait") {
    object UpperBound extends Media.MediaDecoder {
      def decode(b: Array[Byte]): Media.DecodedMedia =
        Media.DecodedMedia(1, 1, "raw", b.length.toLong)
    }
    val out = Media.decodeMeta(df, col("media_id"), col("content"), UpperBound)
      .collect().map(r => (r.getAs[String]("format"), r.getAs[Int]("width"))).toSet
    assert(out == Set(("raw", 1)))
  }
}
