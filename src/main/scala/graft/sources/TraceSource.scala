package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One parsed chunk record from a destor text trace: `path` is the file
  * the chunk belongs to, `chunkIdx` its position within the file, `fp`
  * the 40-hex SHA-1, `size` the chunk byte length.
  */
final case class TraceChunk(path: String, chunkIdx: Int, fp: String, size: Int)

/** destor text-trace source/sink (reference: src/trace_phase.c:96-141
  * writer, :146-207 reader) — the reference's replayable-experiment
  * format:
  *
  * {{{
  * file start <len(filename)>
  * <filename>
  * <40-hex-sha1> <size>
  * ...
  * file end
  * ...
  * stream end
  * }}}
  *
  * Read path: parallel across trace files (one task per file — a destor
  * trace is one backup job, so cross-file parallelism is the natural
  * partitioning; the format itself is stateful line-to-line and cannot be
  * split mid-file). Write path: per-file blocks are rendered in parallel,
  * then streamed to the output file one block at a time via
  * toLocalIterator (O(1) driver memory) because the trace is a single
  * sequential text artifact by definition — matching the reference's
  * single-FILE* writer byte for byte, including the newline-less final
  * `stream end`.
  */
object TraceSource {

  /** Render a chunk stream (path, chunkIdx, fp, size) as ordered per-file
    * trace blocks. Files ordered by path; chunks by chunkIdx.
    */
  def toTraceBlocks(chunks: DataFrame): Dataset[String] = {
    val spark = chunks.sparkSession
    import spark.implicits._
    chunks
      .select(col("path"), struct(col("chunkIdx"), col("fp"), col("size")).as("c"))
      .groupBy(col("path"))
      .agg(sort_array(collect_list(col("c"))).as("cs"))
      .select(col("path"), col("cs"))
      .as[(String, Seq[(Int, String, Int)])]
      .map { case (path, cs) =>
        val sb = new StringBuilder
        sb.append("file start ").append(path.length).append('\n')
        sb.append(path).append('\n')
        cs.foreach { case (_, fp, size) =>
          sb.append(fp).append(' ').append(size).append('\n')
        }
        sb.append("file end")
        (path, sb.toString)
      }
      .orderBy(col("_1"))
      .map(_._2)
  }

  /** Write the chunk stream as one destor-readable `.trace` file. */
  def write(chunks: DataFrame, outFile: String): Unit = {
    val w = new java.io.BufferedWriter(new java.io.FileWriter(outFile))
    try {
      val it = toTraceBlocks(chunks).toLocalIterator()
      while (it.hasNext) { w.write(it.next()); w.write("\n") }
      w.write("stream end") // no trailing newline (trace_phase.c:138)
    } finally w.close()
  }

  /** Parse one trace file's content into chunk records. Tolerates both a
    * newline-less final `stream end` (reference writer) and a trailing
    * newline.
    */
  def parseTrace(content: String): Iterator[TraceChunk] = {
    val lines = content.split("\n", -1).iterator.buffered
    new Iterator[TraceChunk] {
      private var path: String = null
      private var idx = 0
      private var nextChunk: TraceChunk = null
      private def advance(): Unit = {
        nextChunk = null
        while (nextChunk == null && lines.hasNext) {
          val line = lines.head
          if (line.startsWith("file start ")) {
            lines.next()
            val declaredLen = line.substring(11).trim.toInt
            path = lines.next()
            require(path.length == declaredLen,
              s"trace corrupt: declared name length $declaredLen, got '${path.length}'")
            idx = 0
          } else if (line.startsWith("file end")) {
            lines.next(); path = null
          } else if (line.startsWith("stream end") || line.isEmpty) {
            lines.next()
          } else {
            lines.next()
            require(path != null, s"trace corrupt: chunk line outside a file: $line")
            // <40-hex> <size> — reference reads fp as exactly 40 chars and
            // size from offset 41 (trace_phase.c:186-190)
            val fp = line.substring(0, 40)
            val size = line.substring(41).trim.toInt
            nextChunk = TraceChunk(path, idx, fp, size)
            idx += 1
          }
        }
      }
      advance()
      def hasNext: Boolean = nextChunk != null
      def next(): TraceChunk = { val c = nextChunk; advance(); c }
    }
  }

  /** Read trace file(s) into the chunk-stream schema — parallel across
    * files via the wholeText reader (schema: one row per trace file).
    */
  def read(spark: SparkSession, path: String): Dataset[TraceChunk] = {
    import spark.implicits._
    spark.read.option("wholeText", "true").text(path)
      .select(col("value"))
      .as[String]
      .flatMap(parseTrace)
  }
}
