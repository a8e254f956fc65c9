package graft.sources.shardpack

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dataset-level operations over shardpack tables, completing the
  * reference's operation inventory (SURVEY.md §2A) beyond plain scan/write:
  *
  *   - [[pack]] — the spec's `shardpack create` CLI
  *     (`/root/reference/docs/draft.md:136-148`): pack a directory of raw
  *     files into shards, one record per file.
  *   - [[deleteKeys]] — `Bucket::delete`
  *     (`/root/reference/src/bucket.rs:171-183`), re-expressed for immutable
  *     storage as an anti-join rewrite: the reference's implementation
  *     destroyed co-located keys by deleting whole shard files (SURVEY.md
  *     §3.4 defect 5); here surviving records are rewritten and the old
  *     generation swapped out atomically-per-file.
  *   - [[alignedJoin]] — the spec's columnar-by-convention layout
  *     (`docs/draft.md:201-205`): one logical dataset stored as per-column
  *     shardpack directories joined back on key.
  *   - [[overlay]] — the spec's read-time update overlay
  *     (`docs/draft.md:207-211`): a small shardpack of updated records
  *     combined with the base at read time, overlay winning per key.
  *   - [[merge]] — the write-time counterpart of overlay: copy-on-write
  *     upsert folding updates into the bucket, rewriting only the shards
  *     whose key envelope is hit.
  *   - [[compact]] — small-shard compaction, the maintenance counterpart
  *     of the streaming sink's per-epoch appends.
  *
  * Scale notes: deleteKeys broadcast the (small) key list; alignedJoin and
  * overlay are key-equi joins that Catalyst shuffles on `key` — bucketed
  * layouts co-partition them away; pack streams file bytes through the
  * binaryFile source without driver materialization.
  */
object ShardpackOps {

  /** Pack every file under `inputDir` into a shardpack table at `outDir`.
    * Key = path relative to `inputDir`; content type inferred from the
    * extension; one entry per record named after the file. `metadata`
    * key/value pairs (the CLI's repeatable `--metadata creator=MyName`,
    * `docs/draft.md:142,147`) are stored shard-level: JSON-encoded into the
    * footer envelope's user-metadata slot via the writer's `shardMetadata`
    * option, readable back through `shardpack_metadata`'s footer path.
    */
  def pack(spark: SparkSession, inputDir: String, outDir: String,
      compression: String = ShardpackFormat.Codec.None,
      recordSizeLimit: Long = 1L << 30,
      metadata: Map[String, String] = Map.empty): Unit = {
    // binaryFile yields fully-qualified URIs (file:/…, s3a://…)
    val fs = new Path(inputDir).getFileSystem(HadoopConfs.session())
    // Path.toString matches the path column's form (file:/… single-slash)
    val prefixLen = fs.makeQualified(new Path(inputDir)).toString.length + 1
    val contentType = {
      val ext = lower(element_at(split(col("path"), "\\."), -1))
      when(ext === "json", "application/json")
        .when(ext === "txt", "text/plain")
        .when(ext.isin("jpg", "jpeg"), "image/jpeg")
        .when(ext === "png", "image/png")
        .when(ext === "npy", "application/x-npy")
        .otherwise("application/octet-stream")
    }
    spark.read.format("binaryFile").load(s"$inputDir/*")
      .filter(length(col("content")) <= recordSizeLimit) // CLI --record-size-limit
      .select(
        expr(s"substring(path, ${prefixLen + 1})").as("key"),
        lit(null).cast("binary").as("metadata"),
        array(struct(
          expr(s"substring(path, ${prefixLen + 1})").as("file_name"),
          contentType.as("content_type"),
          lit("").as("encoding"),
          col("content").as("data"))).as("entries"))
      .write.format("shardpack").option("compression", compression)
      .options(if (metadata.isEmpty) Map.empty[String, String]
        else Map("shardMetadata" -> metaJson(metadata)))
      .mode("append").save(outDir)
  }

  /** Deterministic (key-sorted) JSON object for the shard-level user
    * metadata — sorted so identical CLI invocations produce byte-identical
    * footers regardless of flag order.
    */
  private[shardpack] def metaJson(m: Map[String, String]): String =
    m.toSeq.sorted.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }
      .mkString("{", ",", "}")
  private def jstr(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Delete records by key: rewrite surviving records of the AFFECTED
    * shards only to a new generation, then swap. Never edits a shard in
    * place (shards are immutable, `docs/draft.md:207-211`).
    *
    * Shard selection uses the footer key-range stats the DSv2 writer
    * stamps ([[ShardpackFormat.ShardStats]]): a shard whose [min,max] range
    * misses every delete key is left untouched — the rewrite cost is
    * proportional to the shards actually containing deletions, not the
    * bucket size. (Stats-less shards — foreign writers — are conservatively
    * rewritten.) Footer probes run on the driver here; at very large shard
    * counts the same ranges would come from a sidecar summary built once.
    */
  /** Publish a rewritten generation over `dir`: run `write` to produce the
    * replacement shards, make them visible, then drop `old` and invalidate
    * the sidecar. On object-store schemes the write goes DIRECTLY into the
    * live dir — batch writers conditional-put to final task-unique names
    * (never clashing with live shards), so the swap performs zero
    * per-shard copies; elsewhere it stages in a sibling dir and renames in
    * (one metadata op per shard on a real filesystem). Both orders are
    * crash-safe the same way: new rows become visible before old ones
    * disappear, so a crash mid-swap leaves transient duplicates, never
    * data loss or emptiness.
    *
    * `graceMs` > 0 retires `old` via tombstones instead of deleting: the
    * bytes stay at their paths (a scan planned against generation N keeps
    * reading exactly generation N) while fresh listings see only N+1;
    * [[vacuum]] reclaims the space once the grace deadline passes. Size the
    * grace to the longest query a cluster runs against the bucket.
    */
  private def swapIn(fs: FileSystem, dir: String, old: Seq[FileStatus], tag: String,
      graceMs: Long = 0L)(
      write: String => Unit): Unit = {
    val scheme = Option(new Path(dir).toUri.getScheme).getOrElse("")
    if (ShardpackDataSource.ObjectStoreSchemes.contains(scheme)) {
      write(dir)
    } else {
      val staging = s"$dir-$tag-${java.util.UUID.randomUUID().toString.take(8)}"
      write(staging)
      ShardpackDataSource.listShards(fs, new Path(staging)).foreach { st =>
        val dst = new Path(dir, st.getPath.getName)
        if (!fs.rename(st.getPath, dst))
          throw new java.io.IOException(s"$tag: rename ${st.getPath} -> $dst failed")
      }
      fs.delete(new Path(staging), true)
    }
    if (graceMs > 0L) {
      val deadline = System.currentTimeMillis() + graceMs
      val d = new Path(dir)
      ShardpackDataSource.writeTombstones(fs, d,
        ShardpackDataSource.readTombstones(fs, d) ++
          old.map(_.getPath.getName -> deadline))
    } else old.foreach(st => fs.delete(st.getPath, false))
    ShardpackIndex.invalidate(fs, new Path(dir)) // sidecar is per-generation
  }

  def deleteKeys(spark: SparkSession, dir: String, keys: Seq[String]): Unit = {
    import spark.implicits._
    val keySet = keys.toSet
    val fs = new Path(dir).getFileSystem(HadoopConfs.session())
    // snapshot the old generation BEFORE making the new one visible;
    // envelopes come sidecar-first (one read), footer probes only for
    // shards the index doesn't cover
    val oldShards = ShardpackDataSource.listShards(fs, new Path(dir))
    val affected = ShardpackIndex.envelopes(fs, new Path(dir), oldShards).collect {
      case (st, None) => st
      case (st, Some((lo, hi))) if keySet.exists(k =>
        ShardpackFormat.KeyOrd.gteq(k, lo) && ShardpackFormat.KeyOrd.lteq(k, hi)) => st
    }
    if (affected.isEmpty) return
    // read ONLY the affected shards (each is a valid single-file table path)
    val affectedDf = affected.map(st =>
      spark.read.format("shardpack").load(st.getPath.toString)).reduce(_ union _)
    // new generation becomes visible first (task-unique names never clash),
    // then the old drops: a crash mid-swap leaves transient duplicates,
    // never an empty bucket — the previous delete-then-rename order had an
    // unbounded data-loss window
    swapIn(fs, dir, affected, "rewrite") { out =>
      affectedDf
        .join(broadcast(keys.toDF("key")), Seq("key"), "left_anti")
        .write.format("shardpack").mode("append").save(out)
    }
  }

  /** Compact undersized shards into full-cap ones: the maintenance op for
    * the small-file backlog a streaming sink accumulates (one+ shard per
    * epoch×partition). Only shards below `minFill`·cap are read and
    * rewritten — cost scales with the backlog, not the bucket — and the
    * swap follows deleteKeys' crash-safe order (new generation renamed IN
    * before old shards are dropped; a crash mid-swap leaves transient
    * duplicates, never data loss). Readers are unaffected throughout:
    * shards are immutable and appear/disappear atomically via rename.
    *
    * The reference lists compaction-adjacent work (chunked writing, file
    * locking) as open roadmap items (`/root/reference/src/lib.rs:16-26`);
    * this is the immutable-storage formulation.
    *
    * Returns the number of small shards compacted away (0 = nothing to do).
    */
  /** Remove orphaned staged temp files left by CRASHED jobs. Commit/abort
    * sweeps are deliberately job-scoped (a concurrent job's temps must
    * survive), so a writer that dies without either leaves `.graft-tmp-*`
    * files forever — vacuum deletes those older than `olderThanMs`
    * (default 24 h; any live job's temps are younger than its runtime).
    * Dot-prefixed temps are invisible to readers, so this is pure
    * space/listing hygiene and always safe at or above the threshold.
    * Returns the number of files removed.
    */
  def vacuum(dir: String, olderThanMs: Long = 24L * 3600 * 1000): Int = {
    val d = new Path(dir)
    val fs = d.getFileSystem(HadoopConfs.session())
    if (!fs.exists(d)) return 0
    val cutoff = System.currentTimeMillis() - olderThanMs
    val stale = fs.listStatus(d).filter(st =>
      st.isFile && (st.getPath.getName.startsWith(".graft-tmp-") ||
        st.getPath.getName.startsWith(".graft-tombstones-tmp-")) &&
        st.getModificationTime < cutoff)
    stale.foreach(st => fs.delete(st.getPath, false))
    // a rewrite op (deleteKeys/deleteRange/compact/merge) that crashed
    // between its staging write and the rename-in sweep leaves a sibling
    // `<dir>-<tag>-<uuid>` staging directory: invisible to readers, but a
    // disk leak — swept here under the same age guard so an IN-FLIGHT
    // op's staging is never touched
    val parent = d.getParent
    val stagingRe = (java.util.regex.Pattern.quote(d.getName) +
      "-(rewrite|compact|merge)-[0-9a-f]{8}").r
    val staleDirs =
      if (parent == null) Array.empty[FileStatus]
      else fs.listStatus(parent).filter(st =>
        st.isDirectory && stagingRe.pattern.matcher(st.getPath.getName).matches() &&
          st.getModificationTime < cutoff)
    staleDirs.foreach(st => fs.delete(st.getPath, true))
    // expired tombstones: the grace deadline each entry carries is the
    // authority (it already encodes the retire-time grace), so vacuum
    // reclaims exactly the shards whose window has closed
    val now = System.currentTimeMillis()
    val ts = ShardpackDataSource.readTombstones(fs, d)
    val (expired, live) = ts.partition(_._2 <= now)
    if (expired.nonEmpty) {
      // order matters for crash-safety: delete bytes FIRST, then shrink
      // the manifest — a crash in between leaves tombstones naming
      // already-deleted files (harmless, cleaned next vacuum), never a
      // de-tombstoned shard resurfacing beside its replacement
      expired.keys.foreach(n => fs.delete(new Path(d, n), false))
      ShardpackDataSource.writeTombstones(fs, d, live)
    }
    stale.length + staleDirs.length + expired.size
  }

  /** Sidecar-first bucket profile — the `stats` maintenance verb: one row
    * (n_shards, n_records, total_bytes, min_key, max_key) computed from
    * the INDEX alone, O(shards) with zero data bytes read — at 100 TB the
    * difference between a catalog ping and a full scan. The sidecar is
    * validated against a fresh listing (every listed shard present at its
    * listed length) and rebuilt via the distributed footer reader when
    * stale, so post-compact/delete listings never serve stale counts.
    * Driver memory is one Entry per shard (the same bound the CLI's other
    * verbs already carry).
    */
  def stats(spark: SparkSession, dir: String): DataFrame = {
    val p = new Path(dir)
    val fs = p.getFileSystem(HadoopConfs.session())
    val listed = ShardpackDataSource.listShards(fs, p)
      .map(st => (st.getPath.getName, st.getLen))
    def loadValid(): Option[Seq[ShardpackIndex.Entry]] =
      ShardpackIndex.load(fs, p).flatMap { m =>
        val es = listed.map { case (n, l) => m.get(n).filter(_.len == l) }
        if (es.forall(_.isDefined)) Some(es.map(_.get).toSeq) else None
      }
    val entries = loadValid().getOrElse {
      ShardpackIndex.build(spark, dir)
      loadValid().getOrElse(Seq.empty)
    }
    val ranges = entries.flatMap(_.range)
    import spark.implicits._
    Seq((entries.size.toLong, entries.map(_.nRecords).sum,
      entries.map(_.len).sum,
      if (ranges.isEmpty) null else ranges.map(_._1).min,
      if (ranges.isEmpty) null else ranges.map(_._2).max))
      .toDF("n_shards", "n_records", "total_bytes", "min_key", "max_key")
  }

  def compact(spark: SparkSession, dir: String, minFill: Double = 0.5,
      shardCap: Long = ShardpackFormat.DefaultShardCap,
      compression: String = ShardpackFormat.Codec.None,
      graceMs: Long = 0L): Int = {
    val fs = new Path(dir).getFileSystem(HadoopConfs.session())
    val threshold = math.max(1L, (shardCap * minFill).toLong)
    val small = ShardpackDataSource.listShards(fs, new Path(dir))
      .filter(_.getLen < threshold)
    if (small.length < 2) return 0 // one small shard compacts to itself
    // target partition count so each writer task fills ~one cap-sized shard
    val parts = math.max(1, (small.map(_.getLen).sum / shardCap).toInt + 1)
    swapIn(fs, dir, small.toSeq, "compact", graceMs) { out =>
      small.map(st => spark.read.format("shardpack").load(st.getPath.toString))
        .reduce(_ union _)
        .coalesce(parts)
        .write.format("shardpack")
        .option("compression", compression)
        .option("shardCapBytes", shardCap)
        .mode("append").save(out)
    }
    small.length
  }

  /** Rewrite a bucket Z-ORDER clustered on two integer dimensions computed
    * from its rows (SQL expressions over `key`/`metadata`/`entries`) — the
    * `OPTIMIZE … ZORDER BY` maintenance verb for shardpack: the new key is
    * the 8-hex-digit Morton code of the two dims prefixed to the original
    * key, globally range-sorted so shard envelopes tile the z-curve and a
    * 2-D box predicate ([[ZOrder.boxRanges]]) prunes shards wholesale.
    * Dims are clamped to 16 bits — clamped rows land in edge cells, which
    * box residual filters handle; original keys survive as the suffix, so
    * prefix/point access still works through the existing pushdown.
    */
  def zorder(spark: SparkSession, dir: String, outDir: String,
      xExpr: String, yExpr: String,
      compression: String = ShardpackFormat.Codec.None,
      shardCap: Long = ShardpackFormat.DefaultShardCap): Unit = {
    // destination must be fresh: appending into a non-empty bucket would
    // silently mix clustered and unclustered generations, and re-running
    // zorder over its own output would compound a second morton prefix
    // onto already-prefixed keys
    val outFs = new Path(outDir).getFileSystem(HadoopConfs.session())
    require(ShardpackDataSource.listShards(outFs, new Path(outDir)).isEmpty,
      s"zorder output $outDir already contains shards — use a fresh directory")
    def dim(e: String) =
      least(greatest(expr(e).cast("long"), lit(0L)), lit((1L << 16) - 1))
    val src = spark.read.format("shardpack").load(dir)
    val total = src.inputFiles.length.toLong.max(1L)
    spark.read.format("shardpack").load(dir)
      .select(
        concat(ZOrder.hexKeyCol(ZOrder.mortonCol(dim(xExpr), dim(yExpr))),
          lit("_"), col("key")).as("key"),
        col("metadata"), col("entries"))
      .repartitionByRange(total.toInt, col("key"))
      .sortWithinPartitions("key")
      .write.format("shardpack")
      .option("compression", compression)
      .option("shardCapBytes", shardCap)
      .mode("append").save(outDir)
  }

  /** Delete every record with `lo <= key < hi` (half-open, the retention
    * idiom: expire one day/prefix of a sorted bucket). Shard selection is
    * envelope-vs-range intersection — on a sorted layout exactly the shards
    * covering the range are rewritten; everything else is untouched. Same
    * crash-safe swap as [[deleteKeys]].
    */
  def deleteRange(spark: SparkSession, dir: String, lo: String, hi: String): Unit = {
    require(ShardpackFormat.KeyOrd.lt(lo, hi), s"deleteRange: empty range [$lo, $hi)")
    val fs = new Path(dir).getFileSystem(HadoopConfs.session())
    val oldShards = ShardpackDataSource.listShards(fs, new Path(dir))
    val affected = ShardpackIndex.envelopes(fs, new Path(dir), oldShards).collect {
      case (st, None) => st
      // envelope check in KeyOrd (Spark's UTF8String order) — the record
      // filter below runs in Spark, so the prune must be conservative
      // with respect to THAT order, not Java's UTF-16 order
      case (st, Some((mn, mx))) if ShardpackFormat.KeyOrd.gteq(mx, lo) &&
        ShardpackFormat.KeyOrd.lt(mn, hi) => st
    }
    if (affected.isEmpty) return
    swapIn(fs, dir, affected, "rewrite") { out =>
      affected.map(st => spark.read.format("shardpack").load(st.getPath.toString))
        .reduce(_ union _)
        .filter(col("key") < lo || col("key") >= hi)
        .write.format("shardpack").mode("append").save(out)
    }
  }

  /** MERGE (upsert): rows of `updates` replace same-key records in the
    * bucket at `dir`; new keys are appended. The copy-on-write counterpart
    * of [[overlay]] — overlay resolves updates at read time, merge folds
    * them into the storage once, completing the mutation surface the
    * reference sketches (`/root/reference/docs/draft.md:207-211` stops at
    * the read-time combine).
    *
    * Scale: affected-shard selection runs DISTRIBUTED — each shard's footer
    * [min,max] key envelope (driver probes, shard-count work) is broadcast
    * against the update keys, and only affected shard NAMES return to the
    * driver. Bounded by shard count, never by update cardinality, so a merge
    * batch can be arbitrarily large (unlike [[deleteKeys]]' driver key
    * list). Shards whose envelope misses every update key are untouched;
    * the rewrite cost is proportional to the shards actually hit. Stats-less
    * shards (foreign writers) are conservatively rewritten. The swap follows
    * deleteKeys' crash-safe order: new generation renamed IN before old
    * shards are dropped — a crash mid-swap leaves transient duplicates,
    * never data loss.
    *
    * `updates` must be key-unique: with no ordering column there is no
    * deterministic last-writer-wins, so duplicates are rejected loudly.
    */
  def merge(spark: SparkSession, dir: String, updates: DataFrame,
      compression: String = ShardpackFormat.Codec.None): Unit = {
    import spark.implicits._
    // materialize once: the plan is scanned three times (uniqueness check,
    // range probe, staging write), and caching before any swap makes a
    // self-referential update (CDC derived from this same bucket) safe
    val up = updates.select(col("key"), col("metadata"), col("entries")).persist()
    try {
      require(up.groupBy("key").count().filter(col("count") > lit(1)).isEmpty,
        "merge: updates must be key-unique — dedupe upstream")
      val fs = new Path(dir).getFileSystem(HadoopConfs.session())
      val oldShards = ShardpackDataSource.listShards(fs, new Path(dir))
      // sidecar-first envelopes: one index read covers the whole listing,
      // footer probes only for shards the index doesn't cover
      val ranges = ShardpackIndex.envelopes(fs, new Path(dir), oldShards)
      val statless = ranges.collect { case (st, None) => st }
      val rangeDf = ranges
        .collect { case (st, Some((lo, hi))) => (st.getPath.toString, lo, hi) }
        .toSeq.toDF("shard", "kmin", "kmax")
      val hitNames = up.select("key")
        .join(broadcast(rangeDf), col("key") >= col("kmin") && col("key") <= col("kmax"))
        .select("shard").distinct().as[String].collect().toSet
      val affected = statless ++ ranges.collect {
        case (st, Some(_)) if hitNames.contains(st.getPath.toString) => st
      }
      if (affected.isEmpty) {
        up.write.format("shardpack").option("compression", compression)
          .mode("append").save(dir)
      } else {
        val survivors = affected
          .map(st => spark.read.format("shardpack").load(st.getPath.toString))
          .reduce(_ union _)
          .join(up.select("key"), Seq("key"), "left_anti")
        swapIn(fs, dir, affected, "merge") { out =>
          survivors.union(up)
            .write.format("shardpack").option("compression", compression)
            .mode("append").save(out)
        }
      }
    } finally up.unpersist(false)
  }

  /** Join per-column shardpack tables on key, concatenating their entry
    * lists — reading the spec's columnar layout back into one logical row.
    * Inner join: the spec requires consistent key sets across columns.
    */
  def alignedJoin(parts: Seq[DataFrame]): DataFrame = {
    require(parts.nonEmpty)
    parts.reduce { (a, b) =>
      a.join(b.select(col("key"), col("entries").as("_r_entries")), Seq("key"))
        .withColumn("entries", concat(col("entries"), col("_r_entries")))
        .drop("_r_entries")
    }
  }

  /** Read-time overlay: rows from `overlayDf` replace same-key rows of
    * `base`; base rows without an update pass through.
    */
  def overlay(base: DataFrame, overlayDf: DataFrame): DataFrame = {
    val o = overlayDf.select(col("key"),
      col("metadata").as("_o_metadata"), col("entries").as("_o_entries"))
    base.join(o, Seq("key"), "left")
      .select(col("key"),
        when(col("_o_entries").isNotNull, col("_o_metadata"))
          .otherwise(col("metadata")).as("metadata"),
        coalesce(col("_o_entries"), col("entries")).as("entries"))
  }
}
