package graft

import org.apache.spark.sql.functions._
import graft.operators.VectorOps

class VectorExprSpec extends SparkTestBase {

  test("native FloatVectorDot is bit-identical to the higher-order formulation") {
    val e = Tables.embeddings(spark, sf0001).limit(200)
    val a = e.select(col("vec_id").as("ia"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("ib"), col("embedding").as("eb"))
    val pairs = a.join(b, col("ia") < col("ib") && col("ib") < col("ia") + 3)
    val diff = pairs.select(
        VectorOps.dot(col("ea"), col("eb")).as("native"),
        VectorOps.dotHof(col("ea"), col("eb")).as("hof"))
      .where(col("native") =!= col("hof")) // exact comparison, not tolerance
    assert(diff.count() == 0, "native and HOF dot must agree bitwise")
  }

  test("native dot handles nulls and empty arrays") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1.0f, 2.0f)), Some(Seq(3.0f, 4.0f))),
      (None, Some(Seq(1.0f))),
      (Some(Seq.empty[Float]), Some(Seq.empty[Float])),
    ).toDF("a", "b")
    val got = df.select(VectorOps.dot(col("a"), col("b"))).collect()
    assert(got(0).getDouble(0) == 11.0)
    assert(got(1).isNullAt(0))
    assert(got(2).getDouble(0) == 0.0)
  }

  test("native dot returns null on dimension mismatch and null elements, like the HOF form") {
    // dimension mismatch / null slots must NOT silently truncate to a
    // partial dot — both formulations return null so the bug is loud
    val df = spark.sql(
      """SELECT * FROM VALUES
         (array(cast(1.0 as float), cast(2.0 as float)), array(cast(3.0 as float))),
         (array(cast(1.0 as float), cast(null as float)), array(cast(3.0 as float), cast(4.0 as float)))
         AS t(a, b)""")
    val got = df.select(
      VectorOps.dot(col("a"), col("b")).as("native"),
      VectorOps.dotHof(col("a"), col("b")).as("hof")).collect()
    assert(got(0).isNullAt(0), "mismatched dims: native must be null")
    assert(got(0).isNullAt(1), "mismatched dims: HOF is null (zip_with pads)")
    assert(got(1).isNullAt(0), "null element: native must be null")
    assert(got(1).isNullAt(1), "null element: HOF is null")
  }
}
