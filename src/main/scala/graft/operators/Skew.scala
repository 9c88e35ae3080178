package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for equi-joins (SURVEY §4).
  *
  * AQE's skew-join handling splits oversized post-shuffle partitions of
  * a sort-merge join at runtime — usually enough. Salting is the
  * explicit fallback for the cases AQE can't fix: a single join key so
  * hot that one task's build/stream side exceeds executor memory, or a
  * shuffled hash join where the skewed side must be spread BEFORE the
  * exchange. The classic public technique: spread the hot side's rows
  * over `salt` sub-keys and replicate the other side once per sub-key.
  */
object Skew {

  /** Inner equi-join of `left` and `right` on `key`, with the LEFT side
    * salted: every left row gets a seeded pseudo-random salt in
    * `[0, salt)` and the right side is replicated `salt` times, so the
    * join key becomes `(key, _salt)` and a pathologically hot key's
    * rows land on `salt` different reducers instead of one straggler.
    *
    * Put the LARGE/SKEWED side left and the moderate side right — the
    * right side's shuffle volume multiplies by `salt` (that is the
    * price of the technique; pick the smallest salt that spreads the
    * hot key). Result equals the plain inner join, row for row. */
  def saltedInnerJoin(
      left: DataFrame, right: DataFrame, key: String, salt: Int,
      seed: Long = 42L): DataFrame = {
    require(salt > 0, s"salt must be positive, got $salt")
    val saltCol = "__graft_salt" // prefixed: must not collide with user columns
    require(!left.columns.contains(saltCol) && !right.columns.contains(saltCol),
      s"saltedInnerJoin: input already has a $saltCol column")
    val l = left.withColumn(saltCol, (rand(seed) * salt).cast("int"))
    val r = right.withColumn(saltCol, explode(array((0 until salt).map(lit): _*)))
    l.join(r, Seq(key, saltCol)).drop(saltCol)
  }
}
