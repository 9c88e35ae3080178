package graft

import org.scalatest.funsuite.AnyFunSuite

/** V6 — compile-time type safety, mirroring the reference's static
  * typing suite (reference tests/typing, checked by `ty`): graft's
  * phantom types make the same misuse a COMPILE error, verified here
  * with scalatest's in-compiler assertions. */
class TypingSpec extends AnyFunSuite {

  test("well-typed expressions compile") {
    assertCompiles("""
      import graft._, graft.fixtures.Users
      val a: TypedCol[Boolean] = Users.score > 10.0
      val b: TypedCol[Double]  = Users.score.tc * glit(2.0)
      val c: TypedCol[Boolean] = (Users.age.tc === 3L) && Users.name.tc =!= "x"
      val d: TypedCol[Int]     = Users.name.strLen
      val e: TypedCol[Double]  = Users.score.mean
    """)
  }

  test("aggregating a string with sum is rejected (Numeric evidence)") {
    assertTypeError("""
      import graft._, graft.fixtures.Users
      Users.name.sum
    """)
  }

  test("temporal methods on non-temporal columns are rejected") {
    assertTypeError("""
      import graft._, graft.fixtures.Users
      Users.name.dtYear
    """)
  }

  test("NaN methods on non-float columns are rejected") {
    assertTypeError("""
      import graft._, graft.fixtures.Users
      Users.age.isNaN
    """)
  }

  test("string methods on non-string columns are rejected") {
    assertTypeError("""
      import graft._, graft.fixtures.Users
      Users.id.strToUppercase
    """)
  }

  test("comparing a column against a literal of another type is rejected") {
    // (uses > rather than === because scalatest's own TripleEquals would
    // otherwise make the snippet compile inside this suite's scope)
    assertTypeError("""
      import graft._, graft.fixtures.Users
      Users.id.tc > "not a long"
    """)
  }

  test("logical operators require Boolean operands") {
    assertTypeError("""
      import graft._, graft.fixtures.Users
      Users.score.tc && (Users.id.tc === 1L)
    """)
  }

  test("list accessors require a Seq-typed column") {
    assertTypeError("""
      import graft._, graft.fixtures.Users
      Users.score.listLen
    """)
  }

  test("filter requires a Boolean expression and preserves the frame schema") {
    assertCompiles("""
      import graft._, graft.fixtures.Users
      def f(tf: TFrame[Users.type]): TFrame[Users.type] = tf.filter(Users.score > 1.0)
    """)
    assertTypeError("""
      import graft._, graft.fixtures.Users
      def f(tf: TFrame[Users.type]) = tf.filter(Users.name.tc)
    """)
  }

  test("schema-polymorphic functions preserve the concrete schema type") {
    // reference examples/generic_functions.py: TypeVar-bound utilities
    assertCompiles("""
      import graft._, graft.fixtures.Users
      def firstN[S <: GSchema](tf: TFrame[S], n: Int): TFrame[S] = tf.head(n)
      def dropNullRows[S <: GSchema](tf: TFrame[S]): TFrame[S] = tf.dropNulls()
      def countRows[S <: GSchema](tf: TFrame[S]): Long = tf.height
      def use(tf: TFrame[Users.type]): TFrame[Users.type] = dropNullRows(firstN(tf, 3))
    """)
  }

  test("castSchema re-binds the schema type parameter") {
    assertCompiles("""
      import graft._, graft.fixtures.Users
      object Slim extends GSchema { val id = col[Long]("id") }
      def f(tf: TFrame[Users.type]): TFrame[Slim.type] = tf.castSchema(Slim)
    """)
  }
}
