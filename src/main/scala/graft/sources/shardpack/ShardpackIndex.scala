package graft.sources.shardpack

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Sidecar envelope index: one small `_graft_index` file per bucket holding
  * every shard's (name, length, [minKey, maxKey]) — the engine's analogue of
  * the reference's `BucketIndex::build`
  * (`/root/reference/src/index/bucket.rs:85-117`: list the bucket, read each
  * shard's index with caller-set parallelism, fold into one in-memory map).
  * Here the per-shard footer reads run as a SPARK JOB (one task per slice of
  * the shard list — the cluster is the `buffer_unordered` pool), and the
  * folded result is persisted so later planners read ONE file instead of N
  * footers.
  *
  * Consumers:
  *   - scan planning: a keyed scan emits input partitions ONLY for shards
  *     whose envelope may contain a requested key — on a 400k-shard bucket a
  *     point lookup schedules a handful of tasks instead of 400k
  *     self-pruning ones (task scheduling, not reading, is the bottleneck a
  *     driver faces at that shard count);
  *   - [[ShardpackOps.deleteKeys]] / [[ShardpackOps.merge]]: affected-shard
  *     selection reads the sidecar instead of probing every footer from the
  *     driver.
  *
  * Staleness is SAFE by construction: an entry is honored only if a shard
  * with the same (name, length) is present in the fresh directory listing.
  * New/changed/vanished shards simply miss the index and are handled
  * conservatively (included in scans, footer-probed by ops). Mutating ops
  * drop the sidecar after their generation swap; rebuilding is an explicit
  * maintenance step, like the reference's index build.
  */
object ShardpackIndex {

  val FileName = "_graft_index"
  // "GRFK" (v3: ranges re-derived under KeyOrd — a v2 sidecar may embed
  // UTF-16-ordered ranges, so the magic bump makes it fail to load and
  // every shard falls back to a footer probe, which distrusts v1 stamps)
  private val Magic = 0x4752464b

  final case class Entry(name: String, len: Long, range: Option[(String, String)],
      nRecords: Long)

  /** Build (or rebuild) the sidecar with distributed footer reads.
    * Returns the number of shards indexed.
    */
  def build(spark: SparkSession, dir: String): Int = {
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(HadoopConfs.session())
    val shards = ShardpackDataSource.listShards(fs, dirPath)
      .map(st => (st.getPath.toString, st.getLen))
    val hconf = HadoopConfs.serializable()
    val entries: Array[Entry] =
      if (shards.isEmpty) Array.empty
      else spark.sparkContext
        .parallelize(shards, math.min(shards.size, 64))
        .map { case (p, len) =>
          val path = new Path(p)
          val f = path.getFileSystem(hconf.value)
          val in = f.open(path)
          val footer =
            try ShardpackFormat.readFooter(len, (pos, n) => {
              val b = new Array[Byte](n); in.readFully(pos, b); b
            })
            finally in.close()
          Entry(path.getName, len,
            ShardpackFormat.ShardStats.unwrap(footer.shardMetadata)._1,
            footer.offsets.length.toLong)
        }
        .collect()
    val sorted = entries.sortBy(_.name)
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(Magic)
    out.writeInt(sorted.length)
    sorted.foreach { e =>
      out.writeUTF(e.name)
      out.writeLong(e.len)
      out.writeLong(e.nRecords)
      out.writeBoolean(e.range.isDefined)
      e.range.foreach { case (lo, hi) => out.writeUTF(lo); out.writeUTF(hi) }
    }
    out.flush()
    // atomic publish: stage dot-prefixed, rename over the destination
    val tmp = new Path(dirPath, s".$FileName-${java.util.UUID.randomUUID().toString.take(8)}")
    val os = fs.create(tmp, true)
    try os.write(bos.toByteArray) finally os.close()
    val dst = new Path(dirPath, FileName)
    fs.delete(dst, false)
    if (!fs.rename(tmp, dst))
      throw new java.io.IOException(s"shardpack index publish failed: $tmp -> $dst")
    sorted.length
  }

  /** Load the sidecar, if present and parseable. Entries are raw — callers
    * MUST validate each against a fresh listing by (name, len) before
    * trusting its envelope.
    */
  def load(fs: FileSystem, dir: Path): Option[Map[String, Entry]] = {
    val p = new Path(dir, FileName)
    try {
      if (!fs.exists(p)) None
      else {
        val st = fs.getFileStatus(p)
        val buf = new Array[Byte](st.getLen.toInt)
        val in = fs.open(p)
        try in.readFully(0, buf) finally in.close()
        val din = new DataInputStream(new ByteArrayInputStream(buf))
        if (din.readInt() != Magic) None
        else {
          val n = din.readInt()
          val b = Map.newBuilder[String, Entry]
          (0 until n).foreach { _ =>
            val name = din.readUTF()
            val len = din.readLong()
            val nRecords = din.readLong()
            val range = if (din.readBoolean()) Some((din.readUTF(), din.readUTF())) else None
            b += name -> Entry(name, len, range, nRecords)
          }
          Some(b.result())
        }
      }
    } catch {
      case _: java.io.IOException => None // unreadable sidecar = no sidecar
    }
  }

  /** Drop the sidecar (mutating ops call this after a generation swap). */
  def invalidate(fs: FileSystem, dir: Path): Unit =
    fs.delete(new Path(dir, FileName), false)

  /** Envelope per listed shard, sidecar-first: a shard matching a sidecar
    * entry by (name, len) uses the indexed range; anything else gets its
    * footer probed directly (`probe`). The unit callers build on.
    */
  def envelopes(fs: FileSystem, dir: Path,
      shards: Seq[org.apache.hadoop.fs.FileStatus])
      : Seq[(org.apache.hadoop.fs.FileStatus, Option[(String, String)])] = {
    val idx = load(fs, dir).getOrElse(Map.empty)
    shards.map { st =>
      idx.get(st.getPath.getName) match {
        case Some(e) if e.len == st.getLen => st -> e.range
        case _ =>
          val in = fs.open(st.getPath)
          val footer =
            try ShardpackFormat.readFooter(st.getLen, (pos, n) => {
              val b = new Array[Byte](n); in.readFully(pos, b); b
            })
            finally in.close()
          st -> ShardpackFormat.ShardStats.unwrap(footer.shardMetadata)._1
      }
    }
  }
}
