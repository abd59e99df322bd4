package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Restore-locality simulation (reference: 3-phase restore with LRU /
  * OPT caches and the speed-factor metric, src/do_restore.c,
  * src/optimal_restore.c, src/restore_aware.c).
  *
  * The reference *executes* restores; we simulate the cache behaviour
  * analytically per stream (simulation-level=restore spirit,
  * src/destor.h:56-59): each stream's container access sequence is folded
  * through an exact LRU or Belady-OPT cache, in parallel across streams.
  *
  * speed factor = restored MiB per container read
  * (src/do_restore.c:274-275); CFL = ⌈restored bytes / container size⌉ /
  * container reads (src/restore_aware.c:45-68).
  */
object RestoreSim {

  final case class StreamRestoreStats(
      stream: String,
      chunks: Long,
      bytes: Long,
      containerReads: Long,
      speedFactor: Double,
      cfl: Double)

  val ContainerSize: Long = 4L * 1024 * 1024

  /** W8 forward assembly (reference: src/assembly_restore.c:13-188):
    * the recipe is consumed in assembly areas of (cacheSize-1) × 4 MiB;
    * within one area every needed container is read exactly once and all
    * its chunks in the area are filled on that read.
    */
  private def asmStats(stream: String, accesses: Iterator[(Long, Int)],
      cacheSize: Int): StreamRestoreStats = {
    var chunks = 0L
    var bytes = 0L
    var reads = 0L
    val areaCapacity = (cacheSize - 1).toLong * ContainerSize
    var areaBytes = 0L
    val areaContainers = scala.collection.mutable.Set.empty[Long]
    accesses.foreach { case (cid, size) =>
      if (areaBytes + size > areaCapacity && areaBytes > 0) {
        reads += areaContainers.size
        areaContainers.clear()
        areaBytes = 0
      }
      chunks += 1; bytes += size
      areaBytes += size
      areaContainers += cid
    }
    reads += areaContainers.size
    val sf = if (reads == 0) 0.0 else bytes / (1024.0 * 1024.0) / reads
    val cfl = if (reads == 0) 0.0
      else math.ceil(bytes.toDouble / ContainerSize) / reads
    StreamRestoreStats(stream, chunks, bytes, reads, sf, cfl)
  }

  private def stats(stream: String, accesses: Iterator[(Long, Int)],
      cacheSize: Int, opt: Boolean): StreamRestoreStats = {
    var chunks = 0L
    var bytes = 0L
    var reads = 0L
    if (!opt) {
      val cache = new java.util.LinkedHashMap[Long, java.lang.Boolean](16, 0.75f, true)
      accesses.foreach { case (cid, size) =>
        chunks += 1; bytes += size
        if (!cache.containsKey(cid)) {
          reads += 1
          cache.put(cid, java.lang.Boolean.TRUE)
          if (cache.size() > cacheSize) {
            val it = cache.keySet().iterator(); it.next(); it.remove()
          }
        } else cache.get(cid) // touch for recency
      }
    } else {
      // Belady: evict the container whose next use is farthest
      val acc = accesses.toArray
      val next = new Array[Int](acc.length)
      val lastSeen = scala.collection.mutable.Map.empty[Long, Int]
      for (i <- acc.indices.reverse) {
        next(i) = lastSeen.getOrElse(acc(i)._1, Int.MaxValue)
        lastSeen(acc(i)._1) = i
      }
      val inCache = scala.collection.mutable.Map.empty[Long, Int] // cid -> next use
      for (i <- acc.indices) {
        val (cid, size) = acc(i)
        chunks += 1; bytes += size
        if (inCache.contains(cid)) {
          inCache(cid) = next(i)
        } else {
          reads += 1
          if (inCache.size >= cacheSize) {
            val victim = inCache.maxBy(_._2)._1
            inCache.remove(victim)
          }
          inCache(cid) = next(i)
        }
      }
    }
    val sf = if (reads == 0) 0.0 else bytes / (1024.0 * 1024.0) / reads
    val cfl = if (reads == 0) 0.0
      else math.ceil(bytes.toDouble / ContainerSize) / reads
    StreamRestoreStats(stream, chunks, bytes, reads, sf, cfl)
  }

  /** Simulate the restore cache per stream. Input: recipe with
    * (stream, seq, size, containerId). policy: "lru" | "opt".
    * OPT materializes each stream's access list in memory (the reference
    * uses a 1M-entry lookahead window, src/optimal_restore.c:68-126) —
    * bound stream length accordingly at scale.
    */
  def simulate(recipe: DataFrame, cacheSize: Int = 128,
      policy: String = "lru"): Dataset[StreamRestoreStats] = {
    val spark = recipe.sparkSession
    import spark.implicits._
    require(Seq("lru", "opt", "asm").contains(policy), s"unknown policy: $policy")
    recipe.select(col("stream"), col("seq"), col("containerId"), col("size"))
      .as[(String, Long, Long, Int)]
      .groupByKey(_._1)
      .flatMapGroups { (stream: String, it: Iterator[(String, Long, Long, Int)]) =>
        // stream order: rows arrive grouped but unsorted → sort by seq
        val rows = it.map(r => (r._2, r._3, r._4)).toArray.sortBy(_._1)
        val acc = rows.iterator.map(r => (r._2, r._3))
        Iterator.single(policy match {
          case "asm" => asmStats(stream, acc, cacheSize)
          case p => stats(stream, acc, cacheSize, p == "opt")
        })
      }
  }

  /** Run-length container access records (reference S7: consecutive-dedup
    * of recipe container ids, src/recipe/recipestore.c:372-399) — the OPT
    * cache's lookahead input.
    */
  def accessRecords(recipe: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("stream")).orderBy(col("seq"))
    recipe
      .withColumn("prev", lag(col("containerId"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("containerId"))
      .select(col("stream"), col("seq"), col("containerId"))
  }
}
