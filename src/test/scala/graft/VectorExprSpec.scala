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

  test("pair_combos matches the HOF formulation on longs, structs, and edges") {
    import graft.functions.VectorFunctions.pair_combos
    import spark.implicits._
    val df = Seq(Seq(1L, 2L, 3L, 4L), Seq(7L, 9L), Seq(5L), Seq.empty[Long])
      .toDF("xs")
    // HOF twin the native expression replaces
    val hof = flatten(transform(col("xs"), (x, i) =>
      transform(slice(col("xs"), i + lit(2), size(col("xs"))), y =>
        struct(x.as("a"), y.as("b")))))
    val both = df.select(pair_combos(col("xs")).as("native"), hof.as("hof"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[Any](0) == r.getSeq[Any](1), s"native vs hof: $r")
    }
    // i<j order and counts: C(4,2)=6 pairs, first (1,2), last (3,4)
    val first = both(0).getSeq[org.apache.spark.sql.Row](0)
    assert(first.size == 6)
    assert((first.head.getLong(0), first.head.getLong(1)) == (1L, 2L))
    assert((first.last.getLong(0), first.last.getLong(1)) == (3L, 4L))
    // null array → null (so explode() drops it, like the HOF form)
    val nul = spark.sql("SELECT cast(null as array<bigint>) AS xs")
      .select(pair_combos(col("xs"))).collect()
    assert(nul(0).isNullAt(0))
    // struct elements pass through intact
    val st = spark.sql(
      """SELECT array(named_struct('id', 1L, 'sig', 10L),
                      named_struct('id', 2L, 'sig', 20L)) AS xs""")
      .select(explode(pair_combos(col("xs"))).as("p"))
      .select(col("p.a.id"), col("p.b.sig")).collect()
    assert(st.length == 1 && st(0).getLong(0) == 1L && st(0).getLong(1) == 20L)
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
