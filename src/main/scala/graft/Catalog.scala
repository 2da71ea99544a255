package graft

import org.apache.spark.sql.SparkSession

/** SQL surface: registers every testdata table as a temp view so users can
  * query the engine with `spark.sql(...)` — the reference's publisher-API
  * consumers get an ANSI SQL endpoint instead of REST.
  *
  * `SqlQueries` holds queries written in the dialect-common subset that
  * runs VERBATIM on both Spark and DuckDB — the same text is the Spark
  * implementation and the oracle, making the correctness contract
  * self-evident.
  */
object Catalog {
  val TableNames: Seq[String] = Seq("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "events", "documents",
    "embeddings")

  def registerAll(spark: SparkSession, dir: String): Unit =
    TableNames.foreach { n =>
      val df = n match {
        case "events" => Tables.events(spark, dir)
        case other    => spark.read.parquet(s"$dir/$other.parquet")
      }
      df.createOrReplaceTempView(n)
    }
}

object SqlQueries {
  /** TPC-H-Q1-style pricing summary. Exact decimal arithmetic inside the
    * sums (cast before multiply) so the doubles are bit-identical across
    * engines; `l_shipdate` predicate pushes to the scan in both. */
  val PricingSummary: String =
    """SELECT l_returnflag, l_linestatus,
              CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
              CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
              CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                       CAST(1 - l_discount AS DECIMAL(5,2))) AS DOUBLE) AS sum_disc_price,
              count(*) AS count_order
       FROM lineitem
       WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
       GROUP BY l_returnflag, l_linestatus
       ORDER BY l_returnflag, l_linestatus"""
}
