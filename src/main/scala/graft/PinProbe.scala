package graft

import org.apache.spark.sql.SparkSession

/** Dev utility behind every [[graft.queries.GoldenGate]] pin: prints the
  * BIT_XOR(xxhash64(row)) fold of each named query's output so a pin can
  * be DERIVED instead of hand-typed, and so determinism can be checked
  * the only way that means anything — two separate JVMs at two different
  * parallelism settings (`SPARK_GRAFT_CPUS` changes the shuffle partition
  * count, which changes partition merge order and exposes any
  * tie-breaking or float-accumulation instability the output may hide).
  *
  * Usage: runMain graft.PinProbe <sfDir> <q1,q2,...>
  * Emits one `PIN <sf> <query> <hash>` line per query; a query that
  * throws emits `ERR <sf> <query> <message>` instead.
  */
object PinProbe {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, names) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sfDir.replaceAll("/+$", "").split('/').last
    names.split(',').foreach { name =>
      try {
        // rawQueries: pin derivation must bypass the gate, or a stale pin
        // would block computing its own replacement
        val h = queries.GoldenGate.hashOf(SparkEntry.rawQueries(name)(spark, sfDir))
        println(s"PIN $sf $name $h")
      } catch {
        case e: Throwable =>
          println(s"ERR $sf $name ${e.getMessage.linesIterator.next()}")
      }
    }
    spark.stop()
  }
}
