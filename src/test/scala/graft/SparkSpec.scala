package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole forked test JVM — mirrors the
  * reference's session-scoped pytest fixture (tests/conftest.py). */
object TestSession {
  lazy val spark: SparkSession = {
    val s = GraftSession.local(4, "graft-test")
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSession.spark
}

/** Shared test schemas + rows (the e2e "users pipeline" shape from
  * reference tests/e2e/test_basic_pipeline.py). */
object fixtures {
  object Users extends GSchema {
    val id    = col[Long]("id").field(GField(unique = true))
    val name  = col[String]("name").field(GField(minLength = Some(1)))
    val age   = colNullable[Long]("age")
    val score = col[Double]("score").field(GField(ge = Some(0.0), le = Some(100.0)))
    check("age_lt_200")(gref[Long]("age").isNull || gref[Long]("age") < 200L)
  }
  final case class UserRow(id: Long, name: String, age: Option[Long], score: Double)
  val users: Seq[UserRow] = Seq(
    UserRow(1L, "ann", Some(34L), 88.5),
    UserRow(2L, "bo", None, 41.0),
    UserRow(3L, "cy", Some(17L), 99.9),
    UserRow(4L, "dee", Some(62L), 12.25),
  )
}
