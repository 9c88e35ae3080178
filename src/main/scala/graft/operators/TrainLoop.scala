package graft.operators

import org.apache.spark.rdd.RDD
import scala.reflect.ClassTag

/** Driver-local replay of the trainers' per-iteration scans (guide §1.2
  * "per-task work" + §5 "the driver"): [[LogReg]]/[[NgramLR]]/[[LangLR]]
  * run `iters` full-batch passes, each of which is ONE Spark job over a
  * persisted sample-sized RDD followed by a driver collect of the
  * per-partition gradient partials. At 25–60 iterations that is 25–60
  * sequential job round-trips (~30–50 ms each of pure scheduling) plus
  * `iters · P · 2d` doubles of collect traffic — for a training set the
  * published contract already bounds to a SAMPLE, both are overhead a
  * single up-front collect removes.
  *
  * [[localPartitions]] pulls the persisted rows to the driver ONCE,
  * preserving partition boundaries and intra-partition row order, so the
  * iteration loop can run the IDENTICAL fold locally: same adds on the
  * same doubles in the same order (per-partition accumulation in row
  * order, partials combined in partition INDEX order — exactly what
  * `mapPartitions(...).collect()` pins), hence bit-identical weights.
  * TrainLoopSpec asserts local ≡ distributed on every trainer.
  *
  * The row cap bounds driver memory (guide §5: the driver does no
  * unbounded data work): an over-cap training set returns None and the
  * caller falls back to the distributed per-iteration loop unchanged.
  * Total driver traffic in the local path (rows, once) is SMALLER than
  * the distributed path's (iters · P · 2d partial doubles) for every
  * gate in this repo. */
private[operators] object TrainLoop {

  /** Collect a persisted training RDD's partitions to the driver in
    * partition-index order when its total row count is within
    * `maxRows`; None when over the cap (caller stays distributed).
    * The count pass doubles as the cache materialization, so the
    * collect pass reads cached blocks, not the upstream featurization. */
  def localPartitions[T: ClassTag](rows: RDD[T], maxRows: Long): Option[Array[Array[T]]] = {
    // test escape hatch: -Dgraft.train.local=0 forces the distributed
    // per-iteration loop so TrainLoopSpec can assert local ≡ distributed
    if (sys.props.get("graft.train.local").contains("0")) return None
    val counts = rows.mapPartitions(it => {
      var n = 0L
      while (it.hasNext) { it.next(); n += 1L }
      Iterator.single(n)
    }, preservesPartitioning = true).collect()
    if (counts.sum > maxRows) None
    else Some(rows.mapPartitions(it => Iterator.single(it.toArray),
      preservesPartitioning = true).collect())
  }
}
