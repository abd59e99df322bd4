package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.corpus.{CorpusFile, CorpusGen}
import graft.pipeline.DedupConfig

class StreamIngestSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("incremental ingest dedups across micro-batches via the persistent index") {
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_stream_").toString
    val all = CorpusGen.generateLocal(nBases = 20).map(_._1)
    val (b1, b2) = all.splitAt(all.size / 2)

    val stream = MemoryStream[CorpusFile]
    val query = StreamIngest.start(stream.toDS(), root)
    stream.addData(b1: _*); query.processAllAvailable()
    stream.addData(b1: _*); query.processAllAvailable() // pure duplicates
    stream.addData(b2: _*); query.processAllAvailable()
    query.stop()

    val batches = spark.read.parquet(s"$root/batches")
      .orderBy($"batchId").as[(Long, Long, Long, Long)].collect()
    assert(batches.length === 3)
    assert(batches(0)._4 > 0, "first batch adds uniques")
    assert(batches(1)._4 === 0, "replayed batch adds zero new fingerprints")
    assert(batches(2)._4 > 0, "new files add uniques")

    // index holds exactly the distinct fps of the whole corpus
    val idx = spark.read.parquet(s"$root/fp_index")
    assert(idx.count() === idx.select($"fp").distinct().count())
  }

  test("watermarked windowed throughput aggregates event time") {
    implicit val sqlCtx = spark.sqlContext
    val events = MemoryStream[(java.sql.Timestamp, Double)]
    val df = StreamIngest.windowedThroughput(
      events.toDF().toDF("ts", "value"), "1 minute", "2 minutes")
    val q = df.writeStream.format("memory").queryName("thr")
      .outputMode("append").start()
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$min%02d:00")
    events.addData((ts(0), 1.0), (ts(0), 2.0), (ts(1), 5.0))
    q.processAllAvailable()
    // advance watermark far enough to close the first windows
    events.addData((ts(10), 1.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.sql("SELECT events, total_value FROM thr ORDER BY window_start")
      .as[(Long, Double)].collect()
    assert(rows.take(2).toSeq === Seq((2L, 3.0), (1L, 5.0)))
  }
}
