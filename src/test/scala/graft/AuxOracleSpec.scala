package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Vec

/** Local mirror of the driver's PARTIAL oracles: for each of the
  * queries whose hash kernel is not SQL-expressible, re-derive the
  * final result from the corresponding `SparkEntry.auxExports` frame —
  * exactly the computation the DuckDB oracle runs over the `_aux/`
  * parquet — and assert it matches the query's own output.
  *
  * This pins the coupling the driver gate relies on: the export is
  * recomputed in a SEPARATE invocation from the query (as Verify does),
  * so this fails if (a) the export's params drift from the query's,
  * or (b) any stage stops being deterministic across invocations.
  * Runs on the sf0.001 testdata the driver smoke-checks `entry` with. */
class AuxOracleSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def q(name: String): DataFrame = SparkEntry.queries(name)(spark, dir)
  private def aux(name: String): DataFrame = SparkEntry.auxExports(name)(spark, dir)

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq.map {
      case d: Double => math.round(d * 1e6) / 1e6 // normalize float formatting
      case v => v
    }.toIndexedSeq: Seq[Any]).toSet

  test("dedup_simhash == banding + cap + hamming re-derived from simhash_sigs") {
    val sig = aux("simhash_sigs")
    val chunks = (0 until 4).map { i =>
      struct(lit(i).as("chunk"),
        shiftright(col("sig"), i * 16).bitwiseAND(lit(0xFFFFL)).as("ckey"))
    }
    val banded = sig.select(col("doc_id"), col("sig"), explode(array(chunks: _*)).as("c"))
      .select(col("doc_id"), col("sig"), col("c.chunk").as("chunk"), col("c.ckey").as("ckey"))
    val capped = banded
      .withColumn("bsz", count(lit(1)).over(Window.partitionBy("chunk", "ckey")))
      .where(col("bsz") <= graft.operators.Dedup.DefaultMaxBucket)
    val a = capped.select(col("doc_id").as("doc_id_a"), col("sig").as("sig_a"),
      col("chunk"), col("ckey"))
    val b = capped.select(col("doc_id").as("doc_id_b"), col("sig").as("sig_b"),
      col("chunk"), col("ckey"))
    val expected = a.join(b, Seq("chunk", "ckey"))
      .where(col("doc_id_a") < col("doc_id_b"))
      .select(col("doc_id_a"), col("doc_id_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).cast("int").as("hamming"))
      .distinct()
      .where(col("hamming") <= 3)
    assert(rows(q("dedup_simhash")) == rows(expected))
  }

  test("dedup_embedding == exact-cosine verify re-derived from emb_cand") {
    val e = tables.embeddings(spark, dir).toNative
    val va = e.select(col("vec_id").as("id_a"), col("embedding").as("_va"))
    val vb = e.select(col("vec_id").as("id_b"), col("embedding").as("_vb"))
    val expected = aux("emb_cand")
      .join(va, "id_a").join(vb, "id_b")
      .select(col("id_a"), col("id_b"),
        round(Vec.cosine(col("_va"), col("_vb")), 6).as("sim"))
      .where(col("sim") >= 0.4)
    assert(rows(q("dedup_embedding")) == rows(expected))
  }

  private def rerank(candName: String): DataFrame = {
    val e = tables.embeddings(spark, dir).toNative
    val nb = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("_nv"))
    val pr = e.where(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("embedding").as("_pv"))
    aux(candName)
      .join(nb, "neighbor_id").join(pr, "probe_id")
      .select(col("probe_id"), col("neighbor_id"),
        round(Vec.cosine(col("_nv"), col("_pv")), 6).as("sim"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("probe_id").orderBy(col("sim").desc, col("neighbor_id"))).cast("int"))
      .where(col("rank") <= 10)
      .select("probe_id", "neighbor_id", "sim", "rank")
  }

  test("ann_lsh == exact rerank re-derived from ann_lsh_cand") {
    assert(rows(q("ann_lsh")) == rows(rerank("ann_lsh_cand")))
  }

  test("ann_ivf == exact rerank re-derived from ann_ivf_cand") {
    assert(rows(q("ann_ivf")) == rows(rerank("ann_ivf_cand")))
  }

  test("ann_pq == exact rerank re-derived from ann_pq_cand") {
    assert(rows(q("ann_pq")) == rows(rerank("ann_pq_cand")))
  }

  test("ann_ivfpq == exact rerank re-derived from ann_ivfpq_cand") {
    assert(rows(q("ann_ivfpq")) == rows(rerank("ann_ivfpq_cand")))
  }
}
