package graft

import java.nio.file.Files

final case class ExUser(id: Long, name: String, age: Long, score: Double)

/** End-to-end mirror of the reference's example workflow
  * (reference examples/basic_usage.py): define schemas → fromRows →
  * parquet round trip → filter → sort → with_columns → select +
  * cast_schema → write. A reference user following their own example
  * line-by-line lands on this exact surface. */
class E2eSpec extends SparkSpec {

  object ExUsers extends GSchema {
    val id    = col[Long]("id")
    val name  = col[String]("name")
    val age   = col[Long]("age")
    val score = col[Double]("score")
  }
  object UserSummary extends GSchema {
    val name  = col[String]("name")
    val score = col[Double]("score")
  }

  test("basic_usage pipeline: rows → parquet → filter/sort/withCols → castSchema → write") {
    import spark.implicits._
    val rows = Seq(
      ExUser(1L, "Alice", 30L, 85.0),
      ExUser(2L, "Bob", 25L, 92.5),
      ExUser(3L, "Charlie", 35L, 78.0),
      ExUser(4L, "Diana", 28L, 95.0),
      ExUser(5L, "Eve", 40L, 88.0),
    )
    val dir = Files.createTempDirectory("graft-e2e").toString

    // 2-3. create + write + typed re-read
    Tio.writeParquet(Tio.fromRows(spark, ExUsers, rows), s"$dir/users")
    val df = Tio.readParquet(spark, s"$dir/users", ExUsers)
    assert(df.height == 5L)

    // 4. filter on typed descriptors
    val adults = df.filter(ExUsers.age >= 30L)
    assert(adults.height == 3L)

    // 5. typed sort
    val byScore = df.sort(ExUsers.score.desc)
    assert(byScore.collectRows().head.getAs[String]("name") == "Diana")

    // 6. with_columns overwriting an existing column via alias-to-descriptor
    val doubled = df.withCols((ExUsers.score.tc * glit(2.0)).as_(ExUsers.score))
    assert(doubled.filter(ExUsers.id.tc === 2L).item(ExUsers.score) == 185.0)

    // 7. select + cast_schema to the output shape
    val summary = df.select(ExUsers.name, ExUsers.score).castSchema(UserSummary)
    assert(summary.df.columns.toSeq == Seq("name", "score"))

    // 8. write the bound result
    Tio.writeParquet(summary, s"$dir/summary")
    assert(Tio.readParquet(spark, s"$dir/summary", UserSummary).height == 5L)
  }
}
