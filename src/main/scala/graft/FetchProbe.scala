package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler behind [[Bench.KnownNoise]]'s q_bam_fetch annotation
  * (round-9 regression attribution): stage-splits the query (cleanup /
  * fixture write / bai / fetch+agg) and, with a second arg `reps`, runs
  * ten same-JVM repetitions to expose JIT-depth variance. Measured on
  * sf0.1: cleanup 0.000 s (the stale-shard-cleanup theory is wrong —
  * q_bam_fetch never calls writeSharded), reps descend 7.7 -> 1.69 ->
  * 0.94 s monotonically, so min-of-2-after-one-warm-pass lands anywhere
  * in 0.9-1.7 s on identical code.
  */
object FetchProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STAGE $what ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    if (args.length > 1 && args(1) == "reps") {
      val fn = SparkEntry.rawQueries("q_bam_fetch")
      val times = (1 to 10).map { _ =>
        val t0 = System.nanoTime(); fn(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println("REPS " + times.map(t => f"$t%.2f").mkString(" "))
      println(f"REPS min ${times.min}%.2f median ${times.sorted.apply(5)}%.2f max ${times.max}%.2f")
      spark.stop(); return
    }
    (1 to 3).foreach { it =>
      println(s"--- iteration $it ---")
      val full = System.nanoTime()
      val fn = SparkEntry.rawQueries("q_bam_fetch")
      // stage replication of the query body:
      val NtMap = (" abcdefghijklmnopqrstuvwy", "ACGTACGTACGTACGTACGTACGTA")
      val sam = Tables(spark, dir, "documents").select(
        concat(lit("d"), col("doc_id")).as("header"),
        lit("ref1").as("rname"),
        (pmod(col("doc_id"), lit(20)) + 1).cast("int").as("pos"),
        lit("20M").as("cigar"),
        translate(rpad(substring(col("text"), 1, 20), 20, "a"),
          NtMap._1, NtMap._2).as("seq"),
        lit("*").as("qual"))
        .withColumn("flag", lit(0)).withColumn("mapq", lit(60))
        .withColumn("rnext", lit("*")).withColumn("pnext", lit(0))
        .withColumn("tlen", lit(0))
      val tmp = s"/tmp/graft_bam_fetch/${new java.io.File(dir).getName}"
      val d = new java.io.File(tmp)
      time("cleanup") { if (d.exists) d.listFiles.foreach(_.delete()) }
      time("write") {
        graft.io.Bam.write(
          sam.coalesce(1).sortWithinPartitions("rname", "pos"), tmp, blockData = 4096)
      }
      time("bai") { graft.io.Bai.buildAll(spark, tmp) }
      val bam = new java.io.File(tmp).listFiles()
        .map(_.getAbsolutePath).filter(_.endsWith(".bam")).head
      time("fetch+agg") {
        val st = graft.core.SeqTable.fromSam(graft.io.Bam.fetch(spark, bam, "ref1", 1, 12))
        graft.ops.Distributions.seqDist(st.long.filter(col("base") =!= "$"))
          .orderBy(col("position"), col("base")).count()
      }
      println(f"STAGE wholequery(ref) ${(System.nanoTime() - full) / 1e9}%.3f s")
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      println(f"STAGE registered ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
