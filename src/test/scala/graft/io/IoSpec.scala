package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class FastaSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("reads multi-line records and round-trips") {
    val dir = Files.createTempDirectory("fasta").toFile
    val f = new java.io.File(dir, "a.fa")
    Files.writeString(f.toPath,
      ">seq_1 desc here\nACGTACGT\nACGT\n>seq_2\nTTTT\n")
    val df = Fasta.read(spark, f.getAbsolutePath)
    val rows = df.orderBy("read_id").collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("seq_1", "ACGTACGTACGT"), ("seq_2", "TTTT")))
    val out = new java.io.File(dir, "out").getAbsolutePath
    Fasta.write(df, out)
    val back = Fasta.read(spark, out).orderBy("read_id").collect()
    assert(back.map(_.getString(1)).toSeq == Seq("ACGTACGTACGT", "TTTT"))
  }
}

class FastqSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("4-line record assembly incl. '@' in quality lines") {
    val dir = Files.createTempDirectory("fastq").toFile
    val f = new java.io.File(dir, "a.fq")
    // second record's quality starts with '@' — the classic parsing trap
    Files.writeString(f.toPath,
      "@r1 extra\nACGT\n+\nIIII\n@r2\nTTGG\n+\n@@II\n")
    val rows = Fastq.read(spark, f.getAbsolutePath).orderBy("read_id").collect()
    assert(rows.map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq ==
      Seq(("r1", "ACGT", "IIII"), ("r2", "TTGG", "@@II")))
  }

  test("round-trip write/read") {
    import spark.implicits._
    val df = Seq(("x", "ACGT", "IIII")).toDF("read_id", "seq", "qual")
    val dir = Files.createTempDirectory("fastq2").toFile
    val out = new java.io.File(dir, "out").getAbsolutePath
    Fastq.write(df, out)
    val back = Fastq.read(spark, out).collect()
    assert(back.head.getString(1) == "ACGT" && back.head.getString(2) == "IIII")
  }
}

class SamSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private val samText =
    """@HD	VN:1.0	SO:unsorted
      |@SQ	SN:ref1	LN:300
      |readA	0	ref1	10	42	4M	*	0	0	ACGT	IIII	NM:i:0	MD:Z:4
      |readB	16	ref1	12	7	2S2M	*	0	0	TTAC	IIII	NM:i:1
      |readC	4	*	0	0	*	*	0	0	GGGG	IIII
      |readD	0	phix174	5	40	4M	*	0	0	CCCC	IIII
      |""".stripMargin

  private def samDf = {
    val dir = Files.createTempDirectory("sam").toFile
    val f = new java.io.File(dir, "a.sam")
    Files.writeString(f.toPath, samText)
    Sam.read(spark, f.getAbsolutePath)
  }

  test("parses standard fields and optional TAG:TYPE:VALUE map") {
    val rows = samDf.orderBy("header").collect()
    assert(rows.length == 4)
    val a = rows(0)
    assert(a.getString(0) == "readA" && a.getInt(1) == 0 &&
      a.getString(2) == "ref1" && a.getInt(3) == 10 &&
      a.getString(5) == "4M" && a.getString(9) == "ACGT")
    val opt = a.getMap[String, String](11)
    assert(opt("NM") == "0" && opt("MD") == "4")
  }

  test("classifyReads flags unaligned, phix and computes pos_end") {
    val c = Sam.classifyReads(samDf).orderBy("header").collect()
    val errs = c.map(r => (r.getString(0), r.getString(r.fieldIndex("error"))))
    assert(errs.toSeq == Seq(
      ("readA", null), ("readB", null), ("readC", "unaligned"), ("readD", "phix")))
    val posEnd = c.map(r => (r.getString(0), r.getInt(r.fieldIndex("pos_end")))).toMap
    assert(posEnd("readA") == 13) // 10 + 4 - 1
    assert(posEnd("readB") == 13) // 12 + 4 - 2 clip - 1
  }

  test("flag helpers") {
    import spark.implicits._
    val df = Seq(0, 16, 4).toDF("flag")
    val got = df.select(Sam.readNum(col("flag"))).collect().map(_.getString(0))
    assert(got.toSeq == Seq("R1", "R2", "R1"))
  }
}
