package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorDotSpec extends SparkSpec {
  import spark.implicits._
  import VectorExpressions.vec_dot

  test("float arrays: widened per-element, double accumulation") {
    val df = Seq((Seq(1.5f, 2.0f, -3.0f), Seq(2.0f, 0.5f, 1.0f)))
      .toDF("a", "b")
    val got = df.select(vec_dot(col("a"), col("b"))).as[Double].collect()(0)
    assert(got == 1.5 * 2.0 + 2.0 * 0.5 + (-3.0) * 1.0)
  }

  test("double arrays and matching built-in formulation bit-for-bit") {
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("embedding").cast("array<double>").as("v"))
    val native = df.select(vec_dot(col("v"), col("v")).as("d"))
      .as[Double].collect()
    val builtin = df.select(
      aggregate(zip_with(col("v"), col("v"), (x, y) => x * y),
        lit(0.0d), (s, x) => s + x).as("d")).as[Double].collect()
    assert(native.toSeq == builtin.toSeq, "must be bit-identical")
  }

  test("null array yields null; interpreted path agrees with codegen") {
    val df = Seq((Some(Seq(1.0, 2.0)), None: Option[Seq[Double]]))
      .toDF("a", "b")
    val got = df.select(vec_dot(col("a"), col("b"))).collect()(0)
    assert(got.isNullAt(0))
    // interpreted: evaluate via the expression directly
    val e = VectorDot(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(1.0f, 2.0f).toArray, org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, false)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(3.0f, 4.0f).toArray, org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, false)))
    assert(e.eval(null) == 11.0)
  }

  test("registered SQL function works end to end") {
    VectorExpressions.registerAll(spark)
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .createOrReplaceTempView("emb_sql_test")
    val got = spark.sql(
      """SELECT vec_id, vec_dot(embedding, embedding) AS nrm2
        |FROM emb_sql_test ORDER BY vec_id LIMIT 3""".stripMargin)
      .as[(Long, Double)].collect()
    assert(got.length == 3 && got.forall(_._2 > 0))
  }

  test("mismatched element types are rejected at analysis") {
    val df = Seq((Seq(1.0f), Seq(1.0))).toDF("a", "b")
    intercept[Exception] {
      df.select(vec_dot(col("a"), col("b"))).collect()
    }
  }

  test("GraftExtensions injects a working vec_dot builder") {
    // applying the extension class must register without throwing (the
    // withExtensions end-to-end path needs session construction, which a
    // shared-session test suite can't do — getOrCreate would return the
    // existing session and silently ignore new extensions)
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    // and the injected builder must produce the real expression
    val (ident, _, builder) = GraftExtensions.functions.head
    assert(ident.funcName == "vec_dot")
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val arr = (xs: Seq[Double]) =>
      Literal.create(xs.toArray, ArrayType(DoubleType, false))
    val e = builder(Seq(arr(Seq(1.0, 2.0)), arr(Seq(3.0, 4.0))))
    assert(e.eval(null) == 11.0)
  }
}
