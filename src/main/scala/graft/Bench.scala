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
    // The round-over-round notes are generated HERE, from the artifact
    // being shipped and the previous round's committed one — the round-7
    // failure mode (hand-written notes quoting an intermediate run) is
    // structurally impossible when the bench main is the only author.
    try {
      val out = java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_full.json"))
      val prev =
        if (java.nio.file.Files.exists(out)) Some(java.nio.file.Files.readString(out))
        else None
      java.nio.file.Files.writeString(out, line)
      prev.foreach { p =>
        java.nio.file.Files.writeString(
          out.resolveSibling("BENCH_NOTES_AUTO.md"), notes(p, line, sfDir))
      }
    } catch { case _: Throwable => () }
    spark.stop()
  }

  /** Measured-noise annotations for queries whose min-of-2 is known to
    * swing across identical code, so a future regression line carries
    * its attribution instead of reading as an unexplained mover. Each
    * entry cites the probe that measured it.
    */
  private val KnownNoise: Map[String, String] = Map(
    "q_bam_fetch" -> ("JIT-depth noise, not a plan change: 10 same-JVM reps " +
      "at sf0.1 descend 7.7 (cold) / 1.69 -> 0.94 s steady-state " +
      "(graft.FetchProbe, round 9; stage split: fixture write ~0.5, bai " +
      "~0.15, fetch+agg ~0.9-1.6); min-of-2 after one warm pass lands " +
      "anywhere in 0.9-1.7 s. BamScanSpec still pins block pruning"))

  /** Markdown comparison of two Bench JSON lines (prev vs current), the
    * Scala twin of tools/bench_notes.py. Parsing is the inverse of this
    * file's own writer — flat `"name":seconds` pairs — so no JSON
    * library is needed.
    */
  private[graft] def notes(prevJson: String, curJson: String, sfDir: String): String = {
    def parse(s: String): Map[String, Double] = {
      val body = "\"queries\":\\{([^}]*)\\}".r.findFirstMatchIn(s)
        .map(_.group(1)).getOrElse("")
      "\"([^\"]+)\":(-?[0-9.Ee+-]+)".r.findAllMatchIn(body)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
    }
    val (pq, cq) = (parse(prevJson), parse(curJson))
    val shared = (pq.keySet & cq.keySet).toSeq.sorted
      .filter(q => pq(q) >= 0 && cq(q) >= 0)
    val pTot = shared.map(pq).sum
    val cTot = shared.map(cq).sum
    val newQ = (cq.keySet -- pq.keySet).toSeq.sorted
    def f(d: Double) = f"$d%.2f"
    val regress = shared.filter(q => cq(q) - pq(q) > 0.25)
      .sortBy(q => pq(q) - cq(q))
    val improve = shared.filter(q => pq(q) - cq(q) > 0.25)
      .sortBy(q => cq(q) - pq(q))
    val tail = cq.toSeq.sortBy(-_._2).take(5)
    val sb = new StringBuilder
    sb ++= s"# Bench notes (auto-generated by graft.Bench from the shipped artifact)\n\n"
    sb ++= s"sf dir: `$sfDir`; ${cq.size} queries; shared with previous artifact: ${shared.size}.\n\n"
    sb ++= f"- Shared-query total: ${f(pTot)} s -> ${f(cTot)} s (${cTot / math.max(pTot, 1e-9)}%.2fx)\n"
    if (newQ.nonEmpty)
      sb ++= s"- Newly timed: ${newQ.map(q => s"$q ${f(cq(q))}s").mkString(", ")}\n"
    sb ++= s"- Regressions > 0.25 s: ${if (regress.isEmpty) "none" else ""}\n"
    regress.foreach { q =>
      val note = KnownNoise.get(q).map(n => s" [$n]").getOrElse("")
      sb ++= s"  - $q ${f(pq(q))} -> ${f(cq(q))}$note\n"
    }
    sb ++= s"- Improvements > 0.25 s:\n"
    improve.foreach(q => sb ++= s"  - $q ${f(pq(q))} -> ${f(cq(q))}\n")
    sb ++= s"- Expensive tail: ${tail.map { case (q, v) => s"$q ${f(v)}s" }.mkString(", ")}\n"
    sb.toString
  }
}
