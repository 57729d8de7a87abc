package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ScaleSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("saltedAggregate matches the direct aggregate on skewed keys") {
    // one hot key with 10k rows, long tail of singletons
    val df = ((1 to 10000).map(i => ("hot", i.toDouble)) ++
      (1 to 50).map(i => (s"k$i", i.toDouble))).toDF("k", "v")
    val direct = df.groupBy("k")
      .agg(sum("v").as("s"), count(lit(1)).as("c"), min("v").as("mn"), max("v").as("mx"))
      .collect().map(r => (r.getString(0), (r.getDouble(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    val salted = Scale.saltedAggregate(df, Seq("k"),
      Seq(("s", "v", "sum"), ("c", "v", "count"), ("mn", "v", "min"), ("mx", "v", "max")))
      .collect().map(r => (r.getString(0), (r.getDouble(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(salted == direct)
  }

  test("bucketed tables join without an exchange") {
    val left = (1 to 1000).map(i => (i.toLong, s"l$i")).toDF("id", "lv")
    val right = (1 to 1000).map(i => (i.toLong, s"r$i")).toDF("id", "rv")
    val bl = Scale.writeBucketed(left, "graft_bucket_l", "id", 4)
    val br = Scale.writeBucketed(right, "graft_bucket_r", "id", 4)
    try {
      val joined = bl.join(br, "id")
      assert(joined.count() == 1000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n${plan.take(800)}")
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bucket_l")
      spark.sql("DROP TABLE IF EXISTS graft_bucket_r")
    }
  }

  test("bloom-pruned join keeps exact semantics and prunes the big side") {
    val big = (1L to 100000L).map(i => (i, s"v$i")).toDF("id", "v")
    val small = (1L to 100L).map(i => (i * 1000L, s"s$i")).toDF("sid", "sv")
    val joined = Scale.bloomPrunedJoin(big, small, "id", "sid",
      expectedItems = 100, fpp = 0.01)
    val rows = joined.collect()
    assert(rows.length == 100)
    assert(rows.forall(r => r.getLong(0) % 1000L == 0L))
    // the bloom filter itself prunes nearly everything before the join
    val bloom = small.stat.bloomFilter("sid", 100, 0.01)
    val kept = (1L to 100000L).count(bloom.mightContainLong)
    assert(kept < 2000, s"bloom kept $kept of 100000")
  }
}

class PackingSpec extends org.scalatest.funsuite.AnyFunSuite {
  private val spark = graft.TestSpark.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("two-phase running total equals the naive global window exactly") {
    val rnd = new scala.util.Random(21)
    val df = (0 until 5000).map(i => (i.toLong, rnd.nextInt(500).toLong))
      .toDF("id", "v").repartition(8) // scrambled input partitions
    val got = Packing.runningTotal(df, "id", "v", "cum")
      .select("id", "cum").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val want = df.withColumn("cum", sum(col("v")).over(w))
      .select("id", "cum").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == want)
  }

  test("packBySize: waterfall layout, oversized docs own their bins, stats fill") {
    val df = Seq(
      (1L, 500L), (2L, 400L), (3L, 300L), // cum 500, 900, 1200
      (4L, 2500L),                        // oversized: cum 3700, starts in bin 1
      (5L, 100L)                          // cum 3800, starts bin 3 (3700/1024...)
    ).toDF("id", "tok")
    val packed = Packing.packBySize(df, "id", "tok", capacity = 1000)
      .orderBy("id").collect().map(r =>
        (r.getLong(0), r.getLong(r.fieldIndex("cum_tokens")), r.getLong(r.fieldIndex("bin"))))
    assert(packed.map(_._2).toSeq == Seq(500L, 900L, 1200L, 3700L, 3800L))
    // bin = floor(startOffset / capacity)
    assert(packed.map(_._3).toSeq == Seq(0L, 0L, 0L, 1L, 3L))
    val stats = Packing.packStats(
      Packing.packBySize(df, "id", "tok", capacity = 1000), "tok", 1000)
      .orderBy("bin").collect()
    assert(stats.map(_.getLong(0)).toSeq == Seq(0L, 1L, 3L))
    assert(stats.map(_.getLong(1)).toSeq == Seq(3L, 1L, 1L)) // n_docs per bin
  }

  test("runningTotal survives empty frames and single rows") {
    val empty = Seq.empty[(Long, Long)].toDF("id", "v")
    assert(Packing.runningTotal(empty, "id", "v", "cum").count() == 0)
    val one = Seq((7L, 42L)).toDF("id", "v")
    val r = Packing.runningTotal(one, "id", "v", "cum").head()
    assert(r.getLong(r.fieldIndex("cum")) == 42L)
  }

  test("runningTotal rejects non-integral value columns instead of truncating") {
    val doubles = Seq((1L, 0.5), (2L, 1.5)).toDF("id", "v")
    val e = intercept[IllegalArgumentException] {
      Packing.runningTotal(doubles, "id", "v", "cum")
    }
    assert(e.getMessage.contains("integral"))
  }

  test("runningTotal fails fast on NULL and duplicate order keys (advice r3)") {
    // a NULL key would silently vanish in the join back; a duplicate
    // would duplicate rows and corrupt cum_tokens — both now throw
    val withNull = Seq((Some(1L), 10L), (None, 20L), (Some(3L), 30L))
      .toDF("id", "v")
    val eN = intercept[IllegalArgumentException] {
      Packing.runningTotal(withNull, "id", "v", "cum").collect()
    }
    assert(eN.getMessage.contains("NULL"))
    val withDup = Seq((1L, 10L), (2L, 20L), (2L, 30L), (3L, 40L))
      .toDF("id", "v")
    val eD = intercept[IllegalArgumentException] {
      Packing.runningTotal(withDup, "id", "v", "cum").collect()
    }
    assert(eD.getMessage.contains("duplicate"))
  }
}
