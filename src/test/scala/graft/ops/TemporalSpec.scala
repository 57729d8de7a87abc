package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins [[Temporal]]: as-of join semantics (<=, tie to largest tie-break,
  * null when nothing precedes), interval-join exactness vs a naive
  * cross-product reference across bin widths, and funnel strict-ordering.
  */
class TemporalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("asOfJoin: most recent right row at or before each left row") {
    val left = Seq(
      (1L, 100L, "p1"), // after r@90 -> match 90
      (1L, 90L, "p2"),  // equal ts  -> <= includes it
      (1L, 10L, "p3"),  // before every right row -> null
      (2L, 500L, "p4")  // key with no right rows -> null
    ).toDF("k", "ts", "name")
    val right = Seq(
      (1L, 50L, 7L, 1.5),
      (1L, 90L, 9L, 2.5)
    ).toDF("k", "rts", "rid", "v")

    val out = Temporal.asOfJoin(left, right, Seq("k"), "ts", "rts", "rid")
      .select("name", "r_rts", "r_rid", "r_v")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) null else (r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out("p1") == ((90L, 9L, 2.5)))
    assert(out("p2") == ((90L, 9L, 2.5)))
    assert(out("p3") == null)
    assert(out("p4") == null)
  }

  test("asOfJoin: timestamp ties on the right resolve to the largest tie-break") {
    val left = Seq((1L, 100L)).toDF("k", "ts")
    val right = Seq((1L, 100L, 1L), (1L, 100L, 5L), (1L, 100L, 3L))
      .toDF("k", "rts", "rid")
    val out = Temporal.asOfJoin(left, right, Seq("k"), "ts", "rts", "rid")
      .select("r_rid").as[Long].collect()
    assert(out.toSeq == Seq(5L))
  }

  test("asOfJoin matches a naive per-left-row scan on random data") {
    val rnd = new scala.util.Random(13)
    // heavy tie density: timestamps from a small range so <=-boundary and
    // tie-break paths are exercised constantly
    val left = (0 until 250).map { i =>
      (i.toLong, (i % 7).toLong, rnd.nextInt(60).toLong)
    }
    val right = (0 until 120).map { i =>
      (1000L + i, (i % 7).toLong, rnd.nextInt(60).toLong)
    }.map { case (rid, k, ts) => (k, ts, rid) }
      // unique (k, ts): keep the max rid, mirroring the documented
      // pre-aggregation contract
      .groupBy(t => (t._1, t._2)).map(_._2.maxBy(_._3)).toSeq
    val got = Temporal.asOfJoin(
      left.toDF("id", "k", "ts"), right.toDF("k", "rts", "rid"),
      Seq("k"), "ts", "rts", "rid")
      .select($"id", $"r_rid").as[(Long, Option[Long])]
      .collect().toMap
    left.foreach { case (id, k, ts) =>
      val best = right.filter(r => r._1 == k && r._2 <= ts)
        .sortBy(r => (r._2, r._3)).lastOption.map(_._3)
      assert(got(id) == best, s"id=$id k=$k ts=$ts")
    }
  }

  test("intervalJoin matches the naive cross-product across bin widths") {
    val rnd = new scala.util.Random(7)
    val intervals = (0 until 40).map { i =>
      val s = rnd.nextInt(1000).toLong
      (i.toLong, (i % 3).toLong, s, s + 1 + rnd.nextInt(300))
    }.toDF("iid", "k", "lo", "hi")
    val events = (0 until 200).map { i =>
      (100L + i, (i % 3).toLong, rnd.nextInt(1300).toLong)
    }.toDF("eid", "k", "ts")

    val expected = intervals.as("i")
      .join(events.as("e"), $"i.k" === $"e.k" && $"ts" >= $"lo" && $"ts" < $"hi")
      .select($"iid", $"eid").as[(Long, Long)].collect().toSet
    assert(expected.nonEmpty)

    for (width <- Seq(7L, 64L, 150L, 1000L)) {
      val got = Temporal.intervalJoin(
        intervals, events, Seq("k"), "lo", "hi", "ts", width)
        .select($"iid", $"eid").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"width=$width emitted duplicates")
      assert(got.toSet == expected, s"width=$width diverged from naive join")
    }
  }

  test("trailingWindow matches a naive per-row scan; ties are peers") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 300).map { i =>
      (i.toLong, (i % 5).toLong, rnd.nextInt(100).toLong, rnd.nextInt(50).toDouble)
    }
    val df = rows.toDF("id", "k", "ts", "v")
    val got = Temporal.trailingWindow(df, Seq("k"), "ts", 10L, Seq(
      "n" -> count(lit(1)),
      "s" -> sum(col("v"))))
      .select($"id", $"n", $"s").as[(Long, Long, Double)]
      .collect().map(t => t._1 -> ((t._2, t._3))).toMap

    rows.foreach { case (id, k, ts, _) =>
      val in = rows.filter(r => r._2 == k && r._3 >= ts - 10L && r._3 <= ts)
      val (n, s) = got(id)
      assert(n == in.length, s"id=$id count")
      assert(math.abs(s - in.map(_._4).sum) < 1e-9, s"id=$id sum")
    }
    // A row tied on ts with another row of the same key must include it
    // (RANGE peers) — guaranteed by the scan above if any tie exists.
    assert(rows.groupBy(r => (r._2, r._3)).exists(_._2.size > 1),
      "fixture should contain timestamp ties")
  }

  test("cohortRetention matches a naive reference; period 0 is cohort size") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 400).map { _ =>
      ((rnd.nextInt(40) + 1).toLong, rnd.nextInt(100).toLong)
    }
    val got = Temporal.cohortRetention(
      rows.toDF("u", "ts"), "u", "ts", 10L)
      .as[(Long, Long, Long)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap

    val bins = rows.map { case (u, ts) => (u, ts / 10L) }.distinct
    val cohort = bins.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val expect = bins.groupBy { case (u, b) => (cohort(u), b - cohort(u)) }
      .view.mapValues(_.size.toLong).toMap
    assert(got == expect)
    // period 0 row of each cohort = number of users first seen in it
    val sizes = cohort.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    sizes.foreach { case (c, n) => assert(got((c, 0L)) == n, s"cohort $c") }
  }

  test("funnel matches a naive per-user replay on random data") {
    val rnd = new scala.util.Random(19)
    val types = Vector("a", "b", "c")
    val rows = (0 until 600).map { _ =>
      ((rnd.nextInt(25) + 1).toLong, rnd.nextInt(40).toLong, types(rnd.nextInt(3)))
    }
    val got = Temporal.funnel(rows.toDF("u", "ts", "t"), "u", "ts", Seq(
      "a" -> (col("t") === "a"),
      "b" -> (col("t") === "b"),
      "c" -> (col("t") === "c")))
      .orderBy("step").as[(Int, String, Long)].collect()
      .map(r => r._1 -> r._3).toMap
    // naive: per user, chain min-ts of each stage strictly after the prior
    val byUser = rows.groupBy(_._1)
    def stageTime(evs: Seq[(Long, Long, String)], t: String, after: Option[Long]): Option[Long] =
      evs.filter(e => e._3 == t && after.forall(e._2 > _)).map(_._2).minOption
    var expected = Map.empty[Int, Long]
    for ((_, evs) <- byUser) {
      var prev: Option[Long] = None
      var alive = true
      for ((t, step) <- types.zipWithIndex if alive) {
        stageTime(evs, t, if (step == 0) None else prev) match {
          case Some(ts) =>
            expected = expected.updated(step + 1, expected.getOrElse(step + 1, 0L) + 1)
            prev = Some(ts)
          case None => alive = false
        }
      }
    }
    assert((1 to 3).forall(s => got.getOrElse(s, 0L) == expected.getOrElse(s, 0L)),
      s"got=$got expected=$expected")
  }

  test("funnel: strictly-after ordering, users counted once per stage") {
    val events = Seq(
      // u1 completes a->b->c in order
      (1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "c"),
      // u2: b BEFORE first a -> never reaches stage 2
      (2L, 10L, "b"), (2L, 20L, "a"),
      // u3: b at the SAME time as a -> strict > excludes it
      (3L, 10L, "a"), (3L, 10L, "b"),
      // u4: a->b but c missing
      (4L, 5L, "a"), (4L, 6L, "b"), (4L, 7L, "b")
    ).toDF("u", "ts", "t")
    val out = Temporal.funnel(events, "u", "ts", Seq(
      "a" -> (col("t") === "a"),
      "b" -> (col("t") === "b"),
      "c" -> (col("t") === "c")))
      .orderBy("step").as[(Int, String, Long)].collect().toSeq
    assert(out == Seq((1, "a", 4L), (2, "b", 2L), (3, "c", 1L)))
  }
}
