package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.corpus.CorpusGen
import graft.pipeline.{DedupConfig, DedupPipeline}

class TraceSourceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("writer emits the reference byte format exactly") {
    val chunks = Seq(
      ("b.txt", 0, "aa" * 20, 100),
      ("a.txt", 1, "cc" * 20, 7),
      ("a.txt", 0, "bb" * 20, 300)
    ).toDF("path", "chunkIdx", "fp", "size")
    val f = java.nio.file.Files.createTempDirectory("trace").resolve("t.trace")
    TraceSource.write(chunks, f.toString)
    val text = new String(java.nio.file.Files.readAllBytes(f), "UTF-8")
    val expected =
      "file start 5\na.txt\n" + ("bb" * 20) + " 300\n" + ("cc" * 20) + " 7\nfile end\n" +
      "file start 5\nb.txt\n" + ("aa" * 20) + " 100\nfile end\n" +
      "stream end" // no trailing newline, like trace_phase.c:138
    assert(text === expected)
  }

  test("reader parses a reference-shaped trace (golden string)") {
    val trace =
      "file start 9\nsrc/x.c@1\n" +
      "0123456789abcdef0123456789abcdef01234567 4096\n" +
      "89abcdef0123456789abcdef0123456789abcdef 512\n" +
      "file end\n" +
      "file start 3\ny.h\n" +
      "fedcba9876543210fedcba9876543210fedcba98 64\n" +
      "file end\n" +
      "stream end"
    val parsed = TraceSource.parseTrace(trace).toList
    assert(parsed === List(
      TraceChunk("src/x.c@1", 0, "0123456789abcdef0123456789abcdef01234567", 4096),
      TraceChunk("src/x.c@1", 1, "89abcdef0123456789abcdef0123456789abcdef", 512),
      TraceChunk("y.h", 0, "fedcba9876543210fedcba9876543210fedcba98", 64)))
  }

  test("corpus chunk stream round-trips through the trace format") {
    val files = CorpusGen.generateLocal(nBases = 25).map(_._1)
    val ds = spark.createDataset(files)(
      org.apache.spark.sql.Encoders.product[graft.corpus.CorpusFile])
    val cfg = DedupConfig()
    val chunks = DedupPipeline.chunkTableDF(
        DedupPipeline.featurize(ds, cfg).toDF())
      // trace identity is the path line: make it unique per (repo,commit)
      .select(concat_ws("@", col("repo"), col("path"), col("commit")).as("path"),
        col("chunkIdx"), col("fp"), col("size"))
    val dir = java.nio.file.Files.createTempDirectory("trace_rt")
    val f = dir.resolve("corpus.trace").toString
    TraceSource.write(chunks, f)
    val back = TraceSource.read(spark, f).toDF()
    assert(back.count() === chunks.count())
    assert(chunks.except(back).count() === 0)
    assert(back.except(chunks).count() === 0)
  }
}
