package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.SeqTable

/** J1-J3 golden vectors transcribed from the reference's scratch test file
  * (/root/reference/tests/tests_to_make.txt): 6 reads × 4 positions against
  * the first two reads as references, in plain / treat_as_match / flip+
  * ignore variants. NaN in the reference maps to SQL NULL here.
  */
class CompareSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private val seqs = Seq("ACGT", "AAAA", "ATGA", "ATCG", "CCCC", "GGGG")
  private val st = SeqTable.fromReads(spark,
    seqs.zipWithIndex.map { case (s, i) => (i.toString, s, null) })
  private val refs = Seq(RefSeq("r0", "ACGT"), RefSeq("r1", "AAAA"))

  /** match-count matrix rows (read × ref), reads/refs in declared order. */
  private def matchCounts(treatAsMatch: Seq[Char] = Nil): Map[(String, String), Long] =
    Compare.compareToReferences(st.long, refs, treatAsMatch)
      .groupBy(col("read_id"), col("ref_name"))
      .agg(sum(col("matched").cast("long")).as("m"))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap

  test("plain equality match counts (golden)") {
    val m = matchCounts()
    val expected = Seq(4, 1, 1, 4, 2, 2, 1, 1, 1, 0, 1, 0)
    val got = for (i <- 0 to 5; r <- Seq("r0", "r1")) yield m((i.toString, r))
    assert(got == expected)
  }

  test("treat_as_match=[A] forces matches on either side (golden)") {
    val m = matchCounts(Seq('A'))
    val expected = Seq(4, 4, 4, 4, 3, 4, 1, 4, 2, 4, 2, 4)
    val got = for (i <- 0 to 5; r <- Seq("r0", "r1")) yield m((i.toString, r))
    assert(got == expected)
  }

  test("treat_as_match=[A,G] (golden)") {
    val m = matchCounts(Seq('A', 'G'))
    val expected = Seq(4, 4, 4, 4, 3, 4, 3, 4, 3, 4, 4, 4)
    val got = for (i <- 0 to 5; r <- Seq("r0", "r1")) yield m((i.toString, r))
    assert(got == expected)
  }

  test("flip + ignore_characters=[C,G] + treat_as_match=[A,T] (golden tensor)") {
    val cmp = Compare.compareToReferences(st.long, refs,
      treatAsMatch = Seq('A', 'T'), flip = true, ignoreChars = Seq('C', 'G'))
      .collect()
      .map(r => ((r.getString(0), r.getString(1), r.getInt(2)),
        if (r.isNullAt(3)) null else r.getBoolean(3)))
      .toMap
    // read 0 'ACGT' vs r0: positions 2,3 involve C/G on either side → NULL;
    // 1 and 4 are A/T treat-as-match → flipped to false (0 in the golden).
    assert(cmp(("0", "r0", 1)) == false)
    assert(cmp(("0", "r0", 2)) == null)
    assert(cmp(("0", "r0", 3)) == null)
    assert(cmp(("0", "r0", 4)) == false)
    // read 1 'AAAA' vs r1 'AAAA': no C/G anywhere → all false (0.)
    (1 to 4).foreach(p => assert(cmp(("1", "r1", p)) == false))
    // read 1 'AAAA' vs r0 'ACGT': pos 2,3 have C,G on ref side → NULL
    assert(cmp(("1", "r0", 1)) == false)
    assert(cmp(("1", "r0", 2)) == null)
    assert(cmp(("1", "r0", 3)) == null)
    assert(cmp(("1", "r0", 4)) == false)
    // read 4 'CCCC': every position involves C → all NULL
    (1 to 4).foreach(p => assert(cmp(("4", "r0", p)) == null))
    (1 to 4).foreach(p => assert(cmp(("4", "r1", p)) == null))
  }

  test("hamming distance and normalization skip NULLs like NaN-sums") {
    val d = Compare.hammingDistance(st.long, refs)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(2))).toMap
    // mismatches = 4 - matches from the golden table
    assert(d(("0", "r0")) == 0.0 && d(("0", "r1")) == 3.0)
    assert(d(("4", "r1")) == 4.0)
    val dn = Compare.hammingDistance(st.long, refs, normalized = true,
      ignoreChars = Seq('C', 'G'))
      .collect().map(r => ((r.getString(0), r.getString(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    // read 1 'AAAA' vs r0 'ACGT': compared positions = {1,4} (2,3 ignored);
    // pos 1 match, pos 4 mismatch → 1/2
    assert(dn(("1", "r0")).contains(0.5))
    // read 4 'CCCC': every position ignored → NULL (the reference's NaN)
    assert(dn(("4", "r0")).isEmpty)
  }

  test("mutation profile counts substitutions only") {
    val prof = Compare.mutationProfile(st.long, Seq(RefSeq("r0", "ACGT")))
      .collect().map(r => ((r.getString(1), r.getString(2)), r.getLong(3))).toMap
    // column 1 (ref A): reads have A,A,A,A,C,G → C:1, G:1
    assert(prof(("A", "C")) == 1L)
    assert(prof(("A", "G")) == 1L)
    // column 2 (ref C): reads C,A,T,T,C,G → A:1, T:2, G:1
    assert(prof(("C", "T")) == 2L)
    // no identity rows
    assert(!prof.contains(("A", "A")))
  }

  test("TS/TV profile classifies transitions vs transversions") {
    val row = Compare.tsTvProfile(st.long, Seq(RefSeq("r0", "ACGT"))).head()
    val ts = row.getDouble(0); val tv = row.getDouble(1)
    assert(math.abs(ts + tv - 1.0) < 1e-9)
    assert(row.getDouble(2) == ts / tv)
  }

  test("pwm score multiplies positional weights") {
    import spark.implicits._
    val pwm = (for (p <- 1 to 4; c <- Seq("A", "C", "G", "T"))
      yield (p, c, if (c == "A") 0.7 else 0.1)).toDF("position", "base", "weight")
    val scores = Compare.pwmScore(st.long, pwm)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    // read 1 'AAAA' → 4*log(0.7)
    assert(math.abs(scores("1") - 4 * math.log(0.7)) < 1e-9)
    // read 4 'CCCC' → 4*log(0.1)
    assert(math.abs(scores("4") - 4 * math.log(0.1)) < 1e-9)
  }
}
