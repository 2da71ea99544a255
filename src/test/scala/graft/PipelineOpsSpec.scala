package graft

import org.apache.spark.sql.functions._
import graft.operators.PipelineOps

class PipelineOpsSpec extends SparkTestBase {

  test("top-p coverage keeps largest docs through the inclusive 80% boundary") {
    // lengths 50,30,15,5 → total 100; runnings desc: 50,80,95,100.
    // running*5 <= total*4 keeps 50 AND the exact-80 row — the integer
    // comparison makes the boundary inclusive with no float threshold.
    val dir = documentsFixture(Seq(
      (0L, "a" * 50, "en", "s"), (1L, "a" * 30, "en", "s"),
      (2L, "a" * 15, "en", "s"), (3L, "a" * 5, "en", "s")))
    val got = PipelineOps.topPCoverage(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(3))).toSeq
    assert(got == Seq((0L, 50L), (1L, 80L)), s"got $got")
  }

  test("perceptron trainer matches an exact reference batch-update loop") {
    // Mixed labels: doc 0 fails the quality rule (5 tokens < 10 → y=-1);
    // doc 1 passes (12 distinct non-stopword tokens → y=+1); doc 2 fails
    // (all-stopword). Every arithmetic step is integer-exact, so the
    // reference loop below must agree to the last unit.
    val rows = Seq(
      (0L, "the the the a a", "en", "s"),
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12", "en", "s"),
      (2L, "the a the a the a the a the a the a", "en", "s"))
    val dir = documentsFixture(rows)
    // reference: same features/label/update computed in plain Scala
    val feats = rows.map { case (_, text, _, _) =>
      val t = text.split(" ", -1)
      val x = Array(1L, t.length.toLong, t.distinct.length.toLong,
        t.count(w => w == "the" || w == "a").toLong)
      val ok = x(1) >= 10 && x(3).toDouble / x(1) < 0.3 &&
        x(2).toDouble / x(1) > 0.2
      (x, if (ok) 1L else -1L)
    }
    var w = Array(0L, 0L, 0L, 0L)
    val expected = (1 to 3).map { step =>
      val mis = feats.filter { case (x, y) =>
        y * (w(0) * x(0) + w(1) * x(1) + w(2) * x(2) + w(3) * x(3)) <= 0 }
      w = w.zipWithIndex.map { case (wi, i) =>
        wi + mis.map { case (x, y) => y * x(i) }.sum }
      (step, mis.size.toLong, w(0), w(1), w(2), w(3))
    }
    val got = PipelineOps.perceptronTrain(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected, s"got $got expected $expected")
    // sanity: the trajectory must actually move (not all-zero weights)
    assert(expected.last._3 != 0L || expected.last._4 != 0L)
  }

  test("sessionize: 30-minute gaps split sessions, counts add up") {
    val sess = PipelineOps.sessionize(spark, sf0001).cache()
    // every event lands in exactly one session
    val total = sess.agg(sum("n_events")).head().getLong(0)
    assert(total == Tables.events(spark, sf0001).count())
    // session invariants: start <= end, contiguous per-user indexes from 1
    assert(sess.where(col("start_sec") > col("end_sec")).count() == 0)
    val idx = sess.groupBy("user_id")
      .agg(min("session_idx").as("mn"), max("session_idx").as("mx"),
        count(lit(1)).as("n"))
    assert(idx.where(col("mn") =!= 1L || col("mx") =!= col("n")).count() == 0)
  }

  test("split_assign: deterministic 80/10/10-ish content-keyed split") {
    val s1 = PipelineOps.splitAssign(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val s2 = PipelineOps.splitAssign(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(s1 == s2, "split must be deterministic")
    val n = s1.size.toDouble
    val frac = s1.values.groupBy(identity).view.mapValues(_.size / n).toMap
    assert(frac("train") > 0.7 && frac("train") < 0.9, s"train frac $frac")
    assert(frac.getOrElse("val", 0.0) < 0.2 && frac.getOrElse("test", 0.0) < 0.2)
  }

  test("pii redaction leaves no email, phone, or long digit run behind") {
    val out = PipelineOps.piiRedact(spark, sf0001)
      .collect().map(_.getString(1))
    assert(out.nonEmpty)
    out.foreach { s =>
      assert(!s.contains("@"), s"email survived: $s")
      assert(!"555-[0-9]".r.findFirstIn(s).isDefined, s"phone survived: $s")
      assert(!"[0-9]{6,}".r.findFirstIn(s).isDefined, s"id run survived: $s")
      assert(s.contains("<EMAIL>") && s.contains("<PHONE>") && s.contains("<ID>"),
        s"placeholders missing (redaction not exercised): $s")
    }
  }

  test("scrub masks every digit run") {
    val bad = PipelineOps.scrubPayload(spark, sf0001)
      .where(col("props_scrubbed").rlike("[0-9]"))
    assert(bad.count() == 0)
  }
}
