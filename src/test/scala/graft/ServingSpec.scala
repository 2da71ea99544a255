package graft

import graft.operators.ServingOps

class ServingSpec extends SparkTestBase {

  test("serving: total equals sum-consistent hourly curve for the same day") {
    val total = ServingOps.realtimeTotal(spark, sf0001, "2024-01-15")
      .head().getLong(0)
    val hourly = ServingOps.realtimeHourly(spark, sf0001, "2024-01-15")
    assert(total > 0)
    // hourly sums can exceed total (a user active in 2 hours counts twice
    // hourly but once daily) but never the other way around
    val hourlySum = hourly.collect().map(_.getLong(1)).sum
    assert(hourlySum >= total)
    assert(hourly.count() <= 24)
  }

  test("serving: yesterday column matches yesterday's own curve") {
    val yd = ServingOps.realtimeHourly(spark, sf0001, "2024-01-14")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val both = ServingOps.hourlyWithYesterday(spark, sf0001, "2024-01-15")
      .collect()
    both.foreach { r =>
      val hr = r.getString(0)
      val dauYd = if (r.isNullAt(2)) None else Some(r.getLong(2))
      assert(dauYd == yd.get(hr), s"hr=$hr")
    }
  }

  test("prevDay handles month/year boundaries") {
    assert(ServingOps.prevDay("2024-01-01") == "2023-12-31")
    assert(ServingOps.prevDay("2024-03-01") == "2024-02-29") // leap year
  }
}
