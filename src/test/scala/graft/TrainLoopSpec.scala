package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFns
import graft.operators.{LangLR, LogReg, NgramLR}

/** The r21 driver-local training loop (TrainLoop): for every trainer,
  * the local-iteration path (sample-sized input collected once, `iters`
  * passes replayed on the driver) must produce BIT-IDENTICAL weights to
  * the distributed per-iteration loop it replaces — same partition
  * boundaries, same intra-partition row order, same partition-index
  * combine order, same update arithmetic. The distributed path is
  * forced via the -Dgraft.train.local=0 escape hatch. */
class TrainLoopSpec extends SparkSpec {
  import spark.implicits._

  private def withDistributed[A](body: => A): A = {
    System.setProperty("graft.train.local", "0")
    try body finally System.clearProperty("graft.train.local")
  }

  private lazy val labeled = {
    val docs = (0L until 400L).map { i =>
      val words =
        if (i % 3 == 0) Seq.fill(30)("the quick brown fox jumps").mkString(" ")
        else "short text " + i
      (i, words)
    }.toDF("doc_id", "text")
    docs.withColumn("_label",
      TextFns.gopherFlags(col("text"), minWords = 25, minStopwords = 1)
        .getField("keep"))
  }

  test("LogReg: local iteration ≡ distributed loop, bit-for-bit") {
    val local = LogReg.train(labeled, col("text"), col("_label"), iters = 7)
    val dist = withDistributed(
      LogReg.train(labeled, col("text"), col("_label"), iters = 7))
    assert(local.weights.toSeq == dist.weights.toSeq)
  }

  test("NgramLR: local iteration ≡ distributed loop, bit-for-bit") {
    val local = NgramLR.train(labeled, col("text"), col("_label"),
      buckets = 512, iters = 9, md5Hash = true)
    val dist = withDistributed(NgramLR.train(labeled, col("text"), col("_label"),
      buckets = 512, iters = 9, md5Hash = true))
    assert(local.bias == dist.bias && local.wLen == dist.wLen)
    assert(local.lenW.toSeq == dist.lenW.toSeq)
    assert(local.w.toSeq == dist.w.toSeq)
  }

  test("LangLR: local iteration ≡ distributed loop, bit-for-bit") {
    val fx = LangLR.fixtures(spark, perClass = 4)
    val local = LangLR.train(fx, col("text"), col("label"),
      buckets = 256, iters = 8, md5Hash = true)
    val dist = withDistributed(LangLR.train(fx, col("text"), col("label"),
      buckets = 256, iters = 8, md5Hash = true))
    assert(local.bias.toSeq == dist.bias.toSeq)
    assert(local.cntW.map(_.toSeq).toSeq == dist.cntW.map(_.toSeq).toSeq)
    assert(local.bagW.map(_.toSeq).toSeq == dist.bagW.map(_.toSeq).toSeq)
  }
}
