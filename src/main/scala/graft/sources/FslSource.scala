package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One parsed chunk record from an FSL hashfile: `fp` is the destor-style
  * 40-hex fingerprint (the trace hash zero-padded to 20 bytes, exactly the
  * reference's `memset(fp,0,20); memcpy(fp, hash, hash_size/8)` —
  * reference src/fsl/read_fsl_trace.c:142-145), `rawHash` the unpadded hex
  * of the stored hash, `size` the chunk byte length and `cratio` the
  * stored compression ratio (0 when the version predates it).
  */
final case class FslChunk(path: String, fileSize: Long, chunkIdx: Int,
    fp: String, rawHash: String, size: Long, cratio: Int)

/** S4 FSL hashfile source/sink — the binary trace format of the SNIA/FSL
  * dedup corpus that the reference replays via its bundled libhashfile
  * (reference src/fsl/libhashfile.h:140-376 structs,
  * src/fsl/libhashfile.c:563-947 read path, :950-989 write path,
  * src/fsl/read_fsl_trace.c:50-163 destor's consumer).
  *
  * Layout (packed little-endian, byte offsets verified against a compiled
  * probe of the reference headers — see scripts/fsl_fixture.md):
  *
  *  - global header (v5-v7: 8296 B `header_v4`; v3-v4: 8288 B `header_v3`;
  *    v1-v2: 4176 B `header`): magic 0xDEADDEAD, version, file count,
  *    4096-B root path, chunk count, chunking method + params union,
  *    hashing method, hash size (bits), then (v3+) 4096-B sysid and
  *    start/end times, then (v5+) total bytes.
  *  - per file (v5-v7: 96 B `file_header_v4` + pathlen path bytes +
  *    target path if symlink; v4: 88 B; v2-v3: 20 B; v1: 4112 B fixed):
  *    size, stat fields, chunk count, pathlen.
  *  - per chunk: size (VARIABLE: u32 for v7, u64 for v3-v6; FIXED:
  *    derived from the fixed chunk size, tail-aware; v1-v2 VARIABLE:
  *    absent → 0), hash (hash_size/8 B), (v6+) cratio u8.
  *
  * Read path: parallel across hashfiles via Spark's binaryFile source —
  * one task per trace file (an FSL hashfile is one scan snapshot; the
  * stream is stateful record-to-record and cannot be split mid-file, so
  * cross-file parallelism is the natural partitioning — same story as
  * [[TraceSource]]). At 100 TB a corpus is thousands of snapshot files,
  * which is exactly the parallelism this gives.
  *
  * Write path (always v7/VARIABLE, the reference writer's version,
  * libhashfile.c:259): per-file blocks rendered in parallel, streamed to
  * one file via toLocalIterator (O(1) driver memory); the global header is
  * written first from pre-aggregated counts, so no seek-back rewrite is
  * needed (the reference rewrites headers in place because it streams an
  * unknown-length scan; a Dataset knows its totals upfront).
  */
object FslSource {

  val Magic = 0xDEADDEADL
  val MaxPath = 4096
  // chunking methods
  val Fixed = 1
  val Variable = 2
  // hashing methods (libhashfile.h:164-171)
  val Md5 = 1
  val Sha256 = 2
  val Md548 = 3
  val Murmur = 4
  val Md564 = 5
  val Sha1 = 6

  private val HeaderV1Size = 4176
  private val HeaderV3Size = 8288
  private val HeaderV4Size = 8296

  private def u8(b: ByteBuffer, off: Int): Int = b.get(off) & 0xff
  private def u32(b: ByteBuffer, off: Int): Long = b.getInt(off) & 0xffffffffL
  private def u64(b: ByteBuffer, off: Int): Long = b.getLong(off)

  private def hex(bytes: Array[Byte]): String =
    bytes.map(x => f"$x%02x").mkString

  final case class FslHeader(version: Int, files: Long, chunks: Long,
      rootPath: String, chnkMethod: Int, fixedChunkSize: Long,
      hashMethod: Int, hashBits: Int, sysid: String, bytes: Long,
      headerSize: Int)

  private def cstr(buf: Array[Byte], off: Int, max: Int): String = {
    var end = off
    val lim = off + max
    while (end < lim && buf(end) != 0) end += 1
    new String(buf, off, end - off, java.nio.charset.StandardCharsets.UTF_8)
  }

  def parseHeader(bytes: Array[Byte]): FslHeader = {
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(u32(b, 0) == Magic, f"not an FSL hashfile: magic ${u32(b, 0)}%08x")
    val version = u32(b, 4).toInt
    require(version >= 1 && version <= 7, s"unsupported hashfile version $version")
    val files = u64(b, 8)
    val rootPath = cstr(bytes, 16, MaxPath)
    val chunks = u64(b, 4112)
    val chnk = u32(b, 4120).toInt
    val fixedSize = u32(b, 4124) // union head doubles as fixed_params.chunk_size
    val hashMethod = u32(b, 4168).toInt
    val hashBits = u32(b, 4172).toInt
    val (sysid, totalBytes, hsize) =
      if (version >= 5) (cstr(bytes, 4176, MaxPath), u64(b, 8288), HeaderV4Size)
      else if (version >= 3) (cstr(bytes, 4176, MaxPath), 0L, HeaderV3Size)
      else ("", 0L, HeaderV1Size)
    FslHeader(version, files, chunks, rootPath, chnk, fixedSize,
      hashMethod, hashBits, sysid, totalBytes, hsize)
  }

  private val SIfmt = 0xf000 // S_IFMT
  private val SIflnk = 0xa000 // S_IFLNK

  /** Parse a whole hashfile's bytes into chunk records (single pass,
    * version-dispatching exactly like libhashfile.c:592-607 / 877-946).
    */
  def parse(bytes: Array[Byte]): Iterator[FslChunk] = {
    val h = parseHeader(bytes)
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val hashBytes = h.hashBits / 8
    var pos = h.headerSize
    (0L until h.files).iterator.flatMap { _ =>
      // per-version file header (libhashfile.c:592-607)
      var path = ""
      var fileSize = 0L
      var nChunks = 0L
      if (h.version >= 5) {
        fileSize = u64(b, pos)
        val perm = u64(b, pos + 24)
        nChunks = u64(b, pos + 80)
        val pathlen = u32(b, pos + 88).toInt
        val targetlen = u32(b, pos + 92).toInt
        pos += 96
        path = new String(bytes, pos, pathlen, java.nio.charset.StandardCharsets.UTF_8)
        pos += pathlen
        if ((perm & SIfmt) == SIflnk) pos += targetlen
      } else if (h.version == 4) {
        fileSize = u64(b, pos)
        val perm = u64(b, pos + 16)
        nChunks = u64(b, pos + 72)
        val pathlen = u32(b, pos + 80).toInt
        val targetlen = u32(b, pos + 84).toInt
        pos += 88
        path = new String(bytes, pos, pathlen, java.nio.charset.StandardCharsets.UTF_8)
        pos += pathlen
        if ((perm & SIfmt) == SIflnk) pos += targetlen
      } else if (h.version >= 2) {
        fileSize = u64(b, pos)
        nChunks = u64(b, pos + 8)
        val pathlen = u32(b, pos + 16).toInt
        pos += 20
        path = new String(bytes, pos, pathlen, java.nio.charset.StandardCharsets.UTF_8)
        pos += pathlen
      } else {
        path = cstr(bytes, pos, MaxPath)
        fileSize = u64(b, pos + MaxPath)
        nChunks = u64(b, pos + MaxPath + 8)
        pos += MaxPath + 16
      }
      val fs = fileSize
      val p = path
      (0L until nChunks).iterator.map { ci =>
        // chunk size field (libhashfile.c:877-921)
        val size: Long =
          if (h.chnkMethod == Variable && h.version >= 7) {
            val s = u32(b, pos); pos += 4; s
          } else if (h.chnkMethod == Variable && h.version >= 3) {
            val s = u64(b, pos); pos += 8; s
          } else if (h.chnkMethod == Fixed) {
            if (ci == nChunks - 1) { // tail chunk, tail-toggle aware
              val tail = fs - (nChunks - 1) * h.fixedChunkSize
              if (tail > h.fixedChunkSize) h.fixedChunkSize else tail
            } else h.fixedChunkSize
          } else 0L // v1-v2 VARIABLE: size not stored
        val raw = java.util.Arrays.copyOfRange(bytes, pos, pos + hashBytes)
        pos += hashBytes
        val cratio = if (h.version >= 6) { val c = u8(b, pos); pos += 1; c } else 0
        val padded = java.util.Arrays.copyOf(raw, 20) // destor fp padding
        FslChunk(p, fs, ci.toInt, hex(padded), hex(raw), size, cratio)
      }
    }
  }

  /** Read hashfile(s) into the chunk-stream schema — one task per file. */
  def read(spark: SparkSession, path: String): Dataset[FslChunk] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("content"))
      .as[Array[Byte]]
      .flatMap(parse(_))
  }

  private def putCstr(b: ByteBuffer, s: String, field: Int): Unit = {
    val raw = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(raw.length, field - 1)
    val pad = new Array[Byte](field)
    System.arraycopy(raw, 0, pad, 0, n)
    b.put(pad)
  }

  /** Write a chunk stream (path, chunkIdx, fp 40-hex, size) as one v7
    * VARIABLE/SHA-1 hashfile the reference's libhashfile can read back.
    */
  def write(chunks: DataFrame, outFile: String,
      rootPath: String = "/", sysid: String = "graft"): Unit = {
    val spark = chunks.sparkSession
    import spark.implicits._
    val totals = chunks.agg(
      countDistinct(col("path")), count(lit(1)), sum(col("size")).cast("long"))
      .as[(Long, Long, Long)].head()
    val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
      new java.io.FileOutputStream(outFile)))
    try {
      val hdr = ByteBuffer.allocate(HeaderV4Size).order(ByteOrder.LITTLE_ENDIAN)
      hdr.putInt(Magic.toInt)
      hdr.putInt(7)
      hdr.putLong(totals._1)
      putCstr(hdr, rootPath, MaxPath)
      hdr.putLong(totals._2)
      hdr.putInt(Variable)
      hdr.put(new Array[Byte](44)) // chunking params union: zeroed (algo unset)
      hdr.putInt(Sha1)
      hdr.putInt(160)
      putCstr(hdr, sysid, MaxPath)
      hdr.putLong(0L) // start_time
      hdr.putLong(0L) // end_time
      hdr.putLong(totals._3)
      out.write(hdr.array())

      val perFile = chunks
        .select(col("path"), struct(col("chunkIdx"), col("fp"), col("size")).as("c"))
        .groupBy(col("path"))
        .agg(sort_array(collect_list(col("c"))).as("cs"))
        .orderBy(col("path"))
        .as[(String, Seq[(Int, String, Int)])]
      val it = perFile.toLocalIterator()
      while (it.hasNext) {
        val (path, cs) = it.next()
        val pathBytes = path.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val fh = ByteBuffer.allocate(96).order(ByteOrder.LITTLE_ENDIAN)
        fh.putLong(cs.iterator.map(_._3.toLong).sum) // file_size
        fh.putLong(0L) // blocks
        fh.putInt(0); fh.putInt(0) // uid, gid
        fh.putLong(0x8000L | 0x1a4L) // perm: S_IFREG | 0644
        fh.putLong(0L); fh.putLong(0L); fh.putLong(0L) // atime, mtime, ctime
        fh.putLong(1L) // hardlinks
        fh.putLong(0L); fh.putLong(0L) // deviceid, inodenum
        fh.putLong(cs.length.toLong)
        fh.putInt(pathBytes.length)
        fh.putInt(0) // target_pathlen
        out.write(fh.array())
        out.write(pathBytes)
        cs.foreach { case (_, fp, size) =>
          val cb = ByteBuffer.allocate(4 + 20 + 1).order(ByteOrder.LITTLE_ENDIAN)
          cb.putInt(size)
          require(fp.length == 40, s"fp must be 40-hex, got '$fp'")
          var j = 0
          while (j < 40) {
            cb.put(java.lang.Integer.parseInt(fp.substring(j, j + 2), 16).toByte)
            j += 2
          }
          cb.put(0.toByte) // cratio: unknown at write time
          out.write(cb.array())
        }
      }
    } finally out.close()
  }
}
