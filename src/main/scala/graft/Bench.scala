package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // default to the full machine — the driver contract benches at local[32]
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JMH-style warm-up before measuring: the small SFs compile every plan,
    // then one pass over the target SF drives the hot loops to C2
    // steady-state — without it the first heavy query measures JIT compile
    // time, not the operator (observed 2-3x swings on the dedup queries).
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", sfDir).foreach { warmDir =>
      SparkEntry.queries.foreach { case (_, fn) =>
        try fn(spark, warmDir).count() catch { case _: Throwable => }
      }
    }
    // two measured iterations, report the per-query min: steady-state
    // latency, insulated from one-off GC/scheduler hiccups. A throwing
    // query reports -1.0 (never its elapsed time) so a broken query can't
    // masquerade as a fast one; failures are also listed under "errors".
    def once(): Map[String, Double] = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val (r1, r2) = (once(), once())
    val results = r1.map { case (k, v) =>
      k -> (if (v < 0 || r2(k) < 0) -1.0 else math.min(v, r2(k)))
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errors = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.values.filter(_ >= 0).sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errors,"sf":"$sfDir"}"""
    println(line)
    // The driver captures only a tail of stdout, which truncates per-query
    // timings past ~29 queries; persist the complete record alongside it.
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_full.json")), line)
    catch { case _: Throwable => () }
    spark.stop()
  }
}
