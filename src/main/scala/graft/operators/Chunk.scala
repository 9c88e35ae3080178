package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}

/** Context-window chunking: split each document into consecutive
  * fixed-token windows — the step that turns a cleaned corpus into
  * training-sequence-sized rows (the companion to [[Pack.packByBudget]],
  * which then packs the chunks into shards).
  *
  * Shape: ONE narrow projection + ONE generator per row. The row count
  * grows by ~n_tokens/size but nothing shuffles — chunking must stay
  * embarrassingly parallel at 100 TB; any formulation that groups or
  * windows over token positions is wrong by construction. Chunk ids are
  * per-document ordinals, so downstream ordering is (doc_id, chunk_id)
  * without any global sequence.
  */
object Chunk {

  /** `(doc_id, chunk_id, n_tokens, chunk_text)` — whitespace tokens in
    * `size`-token windows, last window ragged. NULL text yields no
    * rows (a generator over a NULL array); empty text yields one
    * empty chunk (consistent with [[graft.functions.TextFns.tokenCountWs]]'s
    * ["" counts 1] convention). */
  def byTokens(df: DataFrame, id: Column, text: Column, size: Int): DataFrame = {
    require(size > 0, s"chunk size must be positive, got $size")
    val ws = col("_ws")
    val nChunks = expr(s"(size(_ws) + ${size - 1}) div $size")
    df.select(id.cast("long").as("doc_id"), split(text, " ").as("_ws"))
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0L), nChunks - lit(1L)),
          i => array_join(slice(ws, (i * size + 1).cast("int"), lit(size)), " "))))
      .select(col("doc_id"), col("pos").cast("int").as("chunk_id"),
        F.size(split(col("col"), " ")).as("n_tokens"),
        col("col").as("chunk_text"))
  }
}
