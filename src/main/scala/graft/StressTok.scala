package graft

import org.apache.spark.sql.functions._

/** Cost-attribution probe for the bpe_tokens_tiktoken gate (r19
  * verdict #3: 52.5 s at sf10, the heaviest non-pipeline gate, with
  * no attribution). Times the gate's three stages separately over
  * `SPARK_GRAFT_SF_DIR` and splits the apply into a REGEX-ONLY twin
  * (the cl100k pretokenizer + specials split, no segmentation) so
  * `full − regex ≈ byte_pair_merge + memo` — plus per-partition
  * distinct-word stats, which bound the best possible per-thread memo
  * hit rate. Prints one JSON line; run fresh-JVM like the other
  * stress probes. */
object StressTok {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus, "graft-stress-tok")
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.DataFrame

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    // the gate's augmented text (SparkEntry.tiktokenText, inlined —
    // that helper is private and this probe must not widen it)
    val m = pmod(col("doc_id"), lit(4))
    val gateText = concat(col("text"),
      when(m === 0, lit(" it's No  42<|endoftext|>End…  "))
        .when(m === 1, lit("  'since naïve café<|endoftext|><|endoftext|> !!"))
        .when(m === 2, lit("\tTab 12 ±3 日本語!!"))
        .otherwise(lit(" we'll 𝄞 x  y z's  ")))

    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def run(df: DataFrame): Long = df.queryExecution.toRdd.count()

    // warm the input scan so stage times measure compute, not I/O
    run(docs.select(col("doc_id"), length(col("text"))))

    import graft.operators.Bpe
    val (vocab, tFit) = timed {
      val merges = Bpe.fitMergesBytes(
        docs.select(gateText.as("_t2")), col("_t2"), numMerges = 40)
      Bpe.tiktokenFromMerges(merges, specials = Seq("<|endoftext|>"))
    }
    val (_, tWarm) = timed(run(docs.select(Bpe.countTiktoken(gateText, vocab).as("n"))))
    val (_, tFull) = timed(run(docs.select(Bpe.countTiktoken(gateText, vocab).as("n"))))

    // regex-only twin: specials split + cl100k pretokenizer matches,
    // NO segmentation — the same java.util.regex machinery the table
    // runs; also per-partition word/distinct-word tallies (the memo's
    // theoretical hit rate is 1 − distinct/total per thread)
    val pat = vocab.pattern
    val specials = vocab.specials
    val stats = docs.select(gateText.as("t"))
      .select(col("t")).rdd.mapPartitions { it =>
        val p = java.util.regex.Pattern.compile(pat)
        val sp = java.util.regex.Pattern.compile(
          specials.sortBy(s => -s.length)
            .map(java.util.regex.Pattern.quote).mkString("|"))
        var words = 0L
        var capHit = false
        val seen = new java.util.HashSet[String]()
        var t0 = System.nanoTime()
        it.foreach { row =>
          val s = row.getString(0)
          var from = 0
          val sm = sp.matcher(s)
          def span(a: Int, b: Int): Unit = if (a < b) {
            val m = p.matcher(s)
            m.region(a, b)
            while (m.find()) {
              words += 1
              if (seen.size < 2000000) seen.add(m.group()): Unit
              else capHit = true // saturated: distinct undercounted from here on
            }
          }
          while (sm.find()) { span(from, sm.start); from = sm.end }
          span(from, s.length)
        }
        val dt = (System.nanoTime() - t0) / 1e9
        Iterator.single((words, seen.size.toLong, dt, capHit))
      }.collect()
    val words = stats.map(_._1).sum
    val distinct = stats.map(_._2).sum // sum of per-PARTITION distincts = per-thread view
    val tRegexMax = stats.map(_._3).max // parallel: wall ≈ max partition time
    // no-silent-caps convention (ADVICE r20): when any partition's
    // distinct-word set saturated, memo_best_hit_rate is an OVERcount —
    // say so in the artifact instead of leaving it to forensics
    val saturated = stats.count(_._4)
    def f(v: Double) = "%.4f".formatLocal(java.util.Locale.ROOT, v)
    println(s"""{"probe":"tiktoken","sf":"$sfDir","fit_s":${f(tFit)},"count_warm_s":${f(tWarm)},"count_s":${f(tFull)},"regex_only_max_task_s":${f(tRegexMax)},"words":$words,"distinct_words_per_partition_sum":$distinct,"distinct_cap_saturated_partitions":$saturated,"memo_best_hit_rate":${f(1.0 - distinct.toDouble / math.max(1L, words))}}""")
    spark.stop()
  }
}
