package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.{LongDot, LongL2Sq, VectorFunctions}

/** Native long-vector fold expressions (the ANN hot path): equivalence
  * with the HOF formulation they replaced, interpreted ≡ codegen, and the
  * whole-stage-codegen claim itself.
  */
class VectorExprSpec extends SparkTestBase {

  private def forAll[A](gen: Gen[A], n: Int = 200)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(7L + i)).foreach(body)
    }

  private val vecPair: Gen[(Seq[Long], Seq[Long])] = for {
    n <- Gen.choose(0, 64)
    a <- Gen.listOfN(n, Gen.choose(-1000000L, 1000000L))
    b <- Gen.listOfN(n, Gen.choose(-1000000L, 1000000L))
  } yield (a, b)

  test("long_dot / long_l2sq ≡ the aggregate(zip_with(...)) HOF fold") {
    import spark.implicits._
    val pairs = {
      val buf = scala.collection.mutable.ArrayBuffer[(Seq[Long], Seq[Long])]()
      forAll(vecPair)(p => buf += p)
      buf.toSeq
    }
    val df = pairs.toDF("a", "b").cache()
    val got = df.select(
        VectorFunctions.long_dot(col("a"), col("b")).as("dot"),
        VectorFunctions.long_l2sq(col("a"), col("b")).as("l2"))
      .as[(Long, Long)].collect()
    val hof = df.select(
        aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
          lit(0L), (acc, x) => acc + x).as("dot"),
        aggregate(zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
          lit(0L), (acc, x) => acc + x).as("l2"))
      .as[(Long, Long)].collect()
    assert(got.toSeq === hof.toSeq)
    // and against plain Scala arithmetic (64-bit wrap)
    val expected = pairs.map { case (a, b) =>
      (a.zip(b).map { case (x, y) => x * y }.sum,
        a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    }
    assert(got.toSeq === expected)
    df.unpersist()
  }

  test("interpreted eval ≡ codegen result; NULL array → NULL; codegen span") {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, LongType}

    // interpreted path: direct eval on Literal ArrayData
    def lit2(xs: Seq[Long]) =
      Literal(ArrayData.toArrayData(xs.toArray), ArrayType(LongType))
    val a = Seq(3L, -5L, 7L)
    val b = Seq(2L, 4L, -1L)
    assert(LongDot(lit2(a), lit2(b)).eval(null) === (6L - 20L - 7L))
    assert(LongL2Sq(lit2(a), lit2(b)).eval(null) === (1L + 81L + 64L))

    // codegen path (DataFrame) agrees
    val viaDf = Seq((a, b)).toDF("a", "b")
      .select(VectorFunctions.long_dot(col("a"), col("b")),
        VectorFunctions.long_l2sq(col("a"), col("b")))
      .as[(Long, Long)].head()
    assert(viaDf === ((-21L, 146L)))

    // null ARRAY propagates null (BinaryExpression null-intolerance)
    val withNull = Seq((Some(a), Option.empty[Seq[Long]]))
      .toDF("a", "b")
      .select(VectorFunctions.long_dot(col("a"), col("b")).as("d"))
    assert(withNull.filter(col("d").isNull).count() === 1)

    // the fold runs INSIDE a whole-stage-codegen span (the point of the
    // native expression: no interpreted HOF lambda on the scored-pair
    // path) — input must be non-foldable or ConstantFolding erases the op
    val df = spark.range(4)
      .select(array(col("id"), lit(2L)).as("a"), array(lit(3L), col("id")).as("b"))
      .select(VectorFunctions.long_dot(col("a"), col("b")).as("d"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), "long_dot fell out of codegen:\n" + plan)
    assert(df.as[Long].collect().toSeq === Seq(0L, 5L, 10L, 15L))
  }
}
