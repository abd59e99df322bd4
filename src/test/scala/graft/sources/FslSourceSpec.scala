package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** S4 FSL hashfile source: golden parity against a fixture written by the
  * reference's own compiled libhashfile (src/test/resources/golden/
  * fsl_v7.hashfile + fsl_v7.expected.txt — see scripts/fsl_fixture.md),
  * plus a Scala write → Scala read round trip.
  */
class FslSourceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def resource(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/golden/$name")
    require(in != null, s"missing test resource $name")
    try in.readAllBytes() finally in.close()
  }

  test("header of the C-written golden fixture parses bit-exactly") {
    val h = FslSource.parseHeader(resource("fsl_v7.hashfile"))
    assert(h.version === 7)
    assert(h.files === 3)
    assert(h.chunks === 9)
    assert(h.rootPath === "/golden/root")
    assert(h.chnkMethod === FslSource.Variable)
    assert(h.hashMethod === FslSource.Sha1)
    assert(h.hashBits === 160)
    assert(h.bytes === (0 until 5).map(1000 + _ * 13).sum
      + (0 until 1).map(1100 + _ * 13).sum
      + (0 until 3).map(1200 + _ * 13).sum)
  }

  test("chunk records match the reference writer's own dump") {
    val got = FslSource.parse(resource("fsl_v7.hashfile")).toList
    val expected = new String(resource("fsl_v7.expected.txt"), "UTF-8")
      .split("\n").filter(_.nonEmpty).map { line =>
        val p = line.split("\\|")
        FslChunk(p(0), p(1).toLong, p(2).toInt, p(3), p(3), p(4).toLong, p(5).toInt)
      }.toList
    assert(got === expected)
  }

  test("spark read path parses the golden fixture in parallel") {
    val tmp = java.nio.file.Files.createTempDirectory("fsl")
    java.nio.file.Files.write(tmp.resolve("g.hashfile"), resource("fsl_v7.hashfile"))
    val ds = FslSource.read(spark, tmp.toString)
    assert(ds.count() === 9)
    assert(ds.filter(col("path") === "/golden/root/a.bin").count() === 5)
    val first = ds.filter(col("path") === "/golden/root/a.bin" && col("chunkIdx") === 0)
      .as[FslChunk].head()
    assert(first.fp === "00070e151c232a31383f464d545b626970777e85")
    assert(first.size === 1000L)
    assert(first.cratio === 40)
  }

  test("write → read round trip preserves the chunk stream exactly") {
    val chunks = Seq(
      ("z/late.bin", 1, "bb" * 20, 7),
      ("z/late.bin", 0, "aa" * 20, 300),
      ("a first", 0, "0123456789" * 4, 65536),
      ("a first", 1, "fedcba9876" * 4, 123)
    ).toDF("path", "chunkIdx", "fp", "size")
    val tmp = java.nio.file.Files.createTempDirectory("fslrt")
    val f = tmp.resolve("rt.hashfile").toString
    FslSource.write(chunks, f, rootPath = "/rt", sysid = "spec")
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(f))
    val h = FslSource.parseHeader(bytes)
    assert(h.version === 7)
    assert(h.files === 2)
    assert(h.chunks === 4)
    assert(h.bytes === 300 + 7 + 65536 + 123)
    assert(h.rootPath === "/rt")
    assert(h.sysid === "spec")
    val back = FslSource.parse(bytes).toList
    // files ordered by path, chunks by index; fileSize = sum of sizes
    assert(back === List(
      FslChunk("a first", 65659, 0, "0123456789" * 4, "0123456789" * 4, 65536, 0),
      FslChunk("a first", 65659, 1, "fedcba9876" * 4, "fedcba9876" * 4, 123, 0),
      FslChunk("z/late.bin", 307, 0, "aa" * 20, "aa" * 20, 300, 0),
      FslChunk("z/late.bin", 307, 1, "bb" * 20, "bb" * 20, 7, 0)))
  }

  test("v3 hashfile: 64-bit chunk sizes, 20-byte file headers, no cratio") {
    val hashBytes = 16 // MD5
    val path = "old/v3"
    val buf = java.nio.ByteBuffer.allocate(8288 + 20 + path.length + 2 * (8 + hashBytes))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putInt(0xDEADDEAD); buf.putInt(3)
    buf.putLong(1L) // files
    buf.put(new Array[Byte](4096)) // path_root
    buf.putLong(2L) // chunks
    buf.putInt(FslSource.Variable); buf.put(new Array[Byte](44))
    buf.putInt(FslSource.Md5); buf.putInt(128)
    buf.put(new Array[Byte](4096)) // sysid
    buf.putLong(0L); buf.putLong(0L) // start/end (v3 header ends here)
    // file_header_v2: size, chunks, pathlen
    buf.putLong(300L); buf.putLong(2L); buf.putInt(path.length)
    buf.put(path.getBytes("UTF-8"))
    // chunks: u64 size + 16-byte hash, NO cratio
    buf.putLong(200L); buf.put(Array.fill[Byte](16)(0x11))
    buf.putLong(100L); buf.put(Array.fill[Byte](16)(0x22))
    val got = FslSource.parse(buf.array()).toList
    assert(got === List(
      FslChunk(path, 300, 0, "11" * 16 + "00" * 4, "11" * 16, 200, 0),
      FslChunk(path, 300, 1, "22" * 16 + "00" * 4, "22" * 16, 100, 0)))
  }

  test("v5 FIXED chunking: sizes derived from chunk_size with the tail rule") {
    val hashBytes = 20
    val path = "fx"
    val buf = java.nio.ByteBuffer.allocate(8296 + 96 + path.length + 3 * hashBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putInt(0xDEADDEAD); buf.putInt(5)
    buf.putLong(1L); buf.put(new Array[Byte](4096))
    buf.putLong(3L)
    buf.putInt(FslSource.Fixed)
    buf.putInt(100) // fixed_params.chunk_size heads the union
    buf.put(new Array[Byte](40))
    buf.putInt(FslSource.Sha1); buf.putInt(160)
    buf.put(new Array[Byte](4096))
    buf.putLong(0L); buf.putLong(0L); buf.putLong(250L) // bytes (v5 header)
    // file_header_v4: size 250 → chunks 100, 100, 50 (tail)
    buf.putLong(250L); buf.putLong(0L); buf.putInt(0); buf.putInt(0)
    buf.putLong(0x8000L); buf.putLong(0L); buf.putLong(0L); buf.putLong(0L)
    buf.putLong(1L); buf.putLong(0L); buf.putLong(0L)
    buf.putLong(3L); buf.putInt(path.length); buf.putInt(0)
    buf.put(path.getBytes("UTF-8"))
    (1 to 3).foreach(i => buf.put(Array.fill[Byte](20)((i * 0x11).toByte)))
    val got = FslSource.parse(buf.array()).toList
    assert(got.map(_.size) === List(100L, 100L, 50L))
    assert(got.map(_.cratio) === List(0, 0, 0)) // v5 < v6: no cratio bytes
    assert(got.head.fp === "11" * 20)
  }

  test("destor fp padding: short hashes (MD5-48) pad to 40-hex like backup.c") {
    // synthesize a minimal v7 header + one file with a 6-byte hash
    val hashBytes = 6
    val buf = java.nio.ByteBuffer.allocate(8296 + 96 + 4 + 4 + hashBytes + 1)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putInt(0xDEADDEAD)
    buf.putInt(7)
    buf.putLong(1L) // files
    buf.put(new Array[Byte](4096))
    buf.putLong(1L) // chunks
    buf.putInt(FslSource.Variable)
    buf.put(new Array[Byte](44))
    buf.putInt(FslSource.Md548)
    buf.putInt(48)
    buf.put(new Array[Byte](4096))
    buf.putLong(0L); buf.putLong(0L); buf.putLong(42L)
    // file header v4: size, blocks, uid/gid, perm, times, links, dev, ino,
    // chunks, pathlen, targetlen, then path "f..." (4 bytes)
    buf.putLong(42L); buf.putLong(0L); buf.putInt(0); buf.putInt(0)
    buf.putLong(0x8000L); buf.putLong(0L); buf.putLong(0L); buf.putLong(0L)
    buf.putLong(1L); buf.putLong(0L); buf.putLong(0L)
    buf.putLong(1L); buf.putInt(4); buf.putInt(0)
    buf.put("f/md".getBytes("UTF-8"))
    buf.putInt(42) // chunk size u32 (v7 variable)
    buf.put(Array[Byte](0x01, 0x02, 0x03, 0x04, 0x05, 0x06))
    buf.put(9.toByte) // cratio
    val rec = FslSource.parse(buf.array()).toList
    assert(rec === List(FslChunk("f/md", 42, 0,
      "0102030405060000000000000000000000000000", "010203040506", 42, 9)))
  }
}
