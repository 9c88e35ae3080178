package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.functions.TextFns
import graft.operators.{Dedup, Pack}

/** The composed corpus-preparation flow (the corpus_prep driver query):
  * quality gate -> language gate -> exact-dedup keep -> benchmark
  * decontamination -> token-budget packing, with one planted document
  * per drop reason so each stage's contribution is individually
  * visible in the final assignment. */
class PipelineSpec extends SparkSpec {

  object Docs extends GSchema {
    val doc_id = col[Long]("doc_id")
    val text   = col[String]("text")
  }

  // Survivors: 1, 7, 11. Dropped: 2 (exact dup of 1), 3 (German),
  // 4 (under the 8-word floor), 5 (carries a bench 5-gram). 10 is the
  // bench split (doc_id % 10 == 0), never corpus.
  private val docs = Seq(
    Doc(1L, "the quick brown fox jumps over a lazy dog"),
    Doc(2L, "The quick  brown fox jumps over a lazy dog"), // same normText as 1
    Doc(3L, "der hund und die katze ist nicht mit haus"),
    Doc(4L, "it is the end"),
    Doc(5L, "we saw alpha beta gamma delta epsilon here in the field"),
    Doc(7L, "a bird sings and the sun rises in morning light"),
    Doc(10L, "alpha beta gamma delta epsilon zeta"),
    Doc(11L, "the old man and a young boy walk to town"),
  )

  /** The same composition corpus_prep runs, over an arbitrary frame. */
  private def prep(all: DataFrame, budget: Long): DataFrame = {
    val bench = all.where(col("doc_id") % 10 === 0)
    val corpus = all.where(col("doc_id") % 10 =!= 0)
    // same stage boundaries as the driver query: gates materialize once,
    // pack's three passes read the narrow (id, weight) stage
    val gated = TextFns.withLangId(corpus, col("text"), "_lang")
      .where(TextFns.wordCount(col("text")) >= 8 && col("_lang") === "en")
      .select(col("doc_id"), col("text")) // prune before the boundary
      .localCheckpoint()
    val deduped = Dedup.exactKeep(gated, col("text"), col("doc_id"))
    val clean = Dedup.decontaminatedKeep(
      deduped, col("doc_id"), col("text"), bench, col("text"), k = 5)
    val weights = clean.select(col("doc_id"),
        TextFns.tokenCountWs(col("text")).cast("long").as("n_tokens"))
      .localCheckpoint()
    Pack.packByBudget(weights, col("doc_id"), col("n_tokens"), budget)
  }

  test("each stage drops exactly its planted offender; survivors pack by prefix sum") {
    import spark.implicits._
    val all = Tio.fromRows(spark, Docs, docs).toNative
    // budget 10: survivors weigh 9 (id 1), 10 (id 7), 10 (id 11) —
    // exclusive prefixes 0, 9, 19 put the first two in shard 0 and
    // id 11 across the boundary into shard 1
    val out = prep(all, budget = 10L)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("weight"), r.getAs[Long]("shard_id")))).toMap
    assert(out == Map(
      1L  -> ((9L, 0L)),
      7L  -> ((10L, 0L)),
      11L -> ((10L, 1L))))
  }

  test("stage order matters: dedup keeps the min id, decontam respects the dedup") {
    import spark.implicits._
    // the duplicate pair (1, 2): the min id survives even though both
    // pass the gates; a contaminated doc (5) is dropped even though it
    // is unique and gated-in
    val all = Tio.fromRows(spark, Docs, docs).toNative
    val kept = prep(all, budget = 1000L).collect().map(_.getAs[Long]("id")).toSet
    assert(kept == Set(1L, 7L, 11L))
  }

  test("an empty corpus (everything gated out) packs to an empty assignment") {
    import spark.implicits._
    val all = Tio.fromRows(spark, Docs, Seq(
      Doc(3L, "der hund und die katze ist nicht mit haus"),
      Doc(10L, "alpha beta gamma delta epsilon zeta"))).toNative
    assert(prep(all, budget = 10L).isEmpty)
  }
}
