package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
    * salted: every left row gets a salt in `[0, salt)` and the right
    * side is replicated `salt` times, so the join key becomes
    * `(key, _salt)` and a pathologically hot key's rows land on `salt`
    * different reducers instead of one straggler.
    *
    * `saltBy`: pass a STABLE per-row column (a unique row id is ideal)
    * to derive the salt deterministically as
    * `xxhash64(saltBy, seed) mod salt` — the production-safe choice.
    * The `None` default salts with `rand(seed)`, which is
    * row-order-dependent: if a shuffle-map task is recomputed after a
    * fetch failure, rows can land on different `(key, salt)` reduce
    * partitions than the first attempt (the SPARK-23207-style
    * indeterminate-stage hazard). Spark marks the stage indeterminate
    * and rolls it back wholesale on such failures, so results stay
    * correct, but the retry is expensive — prefer `saltBy` whenever a
    * stable column exists. (Deriving from the row's full content is no
    * substitute: a hot key's rows are often byte-identical, which would
    * put them all back on one reducer.)
    *
    * Put the LARGE/SKEWED side left and the moderate side right — the
    * right side's shuffle volume multiplies by `salt` (that is the
    * price of the technique; pick the smallest salt that spreads the
    * hot key). Result equals the plain inner join, row for row. */
  def saltedInnerJoin(
      left: DataFrame, right: DataFrame, key: String, salt: Int,
      seed: Long = 42L, saltBy: Option[Column] = None): DataFrame =
    saltedInnerJoinWithSalt(left, right, key, salt, seed, saltBy).drop(SaltCol)

  /** Name of the internal salt column [[saltedInnerJoinWithSalt]] keeps. */
  private[graft] val SaltCol = "__graft_salt" // prefixed: must not collide with user columns

  /** [[saltedInnerJoin]] with the internal `__graft_salt` column
    * retained in the output — a test hook, so specs assert the spread
    * of the salts the join ACTUALLY assigned instead of recomputing the
    * derivation on their own (which would keep passing if the
    * derivation or default seed ever drifted). */
  private[graft] def saltedInnerJoinWithSalt(
      left: DataFrame, right: DataFrame, key: String, salt: Int,
      seed: Long = 42L, saltBy: Option[Column] = None): DataFrame = {
    require(salt > 0, s"salt must be positive, got $salt")
    require(!left.columns.contains(SaltCol) && !right.columns.contains(SaltCol),
      s"saltedInnerJoin: input already has a $SaltCol column")
    val saltExpr = saltBy match {
      case Some(c) => pmod(xxhash64(c, lit(seed)), lit(salt)).cast("int")
      case None => (rand(seed) * salt).cast("int")
    }
    val l = left.withColumn(SaltCol, saltExpr)
    val r = right.withColumn(SaltCol, explode(array((0 until salt).map(lit): _*)))
    l.join(r, Seq(key, SaltCol))
  }
}
