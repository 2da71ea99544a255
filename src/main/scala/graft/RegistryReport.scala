package graft

/** Prints the registry counts README/SURVEY quote — the ONE source of
  * truth (round-10 verdict flagged hand-maintained counts drifting:
  * "147 + 7" vs the actual 9 aliases). No Spark session needed; run via
  * `tools/registry_counts.sh`. */
object RegistryReport {
  def main(args: Array[String]): Unit = {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    val x = SparkEntry.benchExtras.keySet
    println(s"registry=${q.size} oracled=${(q & o).size} " +
      s"no_oracle=${(q -- o).size} bench_aliases=${x.size} " +
      s"bench_total=${q.size + x.size}")
    println("no_oracle: " + (q -- o).toSeq.sorted.mkString(", "))
    println("aliases:   " + x.toSeq.sorted.mkString(", "))
  }
}
