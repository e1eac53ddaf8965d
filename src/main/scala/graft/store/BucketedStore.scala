package graft.store

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hash-bucketed, manifest-versioned metadata store — the partition-pruned
  * MERGE path for fact-sized tables (run / file / *_attribute), where
  * [[MetadataStore]]'s full-snapshot commit would be O(table) I/O per
  * mutation.
  *
  * Layout:
  * {{{
  *   root/<table>/v000001/bucket=N/part-….parquet   bucket data files
  *   root/<table>/v000002/_MANIFEST                 bucket -> version map
  *   root/<table>/_CURRENT                          committed version ptr
  * }}}
  *
  * Rows hash-partition on `pmod(xxhash64(keys), numBuckets)`. A commit
  * writes parquet ONLY for buckets containing touched keys; the new
  * version's manifest points untouched buckets at the PRIOR version's
  * files, which are never rewritten, copied, or moved — upsert I/O is
  * O(touched buckets), and a reader resolving `_CURRENT` sees either the
  * old or the new manifest atomically. This is the same
  * manifest-plus-immutable-data-files shape Delta/Iceberg use for MERGE;
  * on a cluster deployment those replace this class 1:1
  * (pipelineadaptor.py:408-494 create_or_update; SURVEY §7.4).
  *
  * At 100 TB: numBuckets bounds both the per-commit rewrite amplification
  * (a single-row upsert rewrites 1/numBuckets of the table) and the
  * reader's parallelism floor — size it so a bucket is a few GB.
  */
final class BucketedStore(spark: SparkSession, root: String, numBuckets: Int = 64) {
  require(numBuckets > 0)

  private val BucketCol = "__bucket"

  private def tableDir(name: String) = Paths.get(root, name)
  private def pointer(name: String) = tableDir(name).resolve("_CURRENT")
  private def versionDir(name: String, v: Int) = tableDir(name).resolve(f"v$v%06d")
  private def manifestPath(name: String, v: Int) =
    versionDir(name, v).resolve("_MANIFEST")

  def exists(name: String): Boolean = Files.exists(pointer(name))

  /** Parse a directory name as a version number. `f"v$v%06d"` zero-pads to
    * SIX digits but widens past v999999, so match `v` + >=6 digits rather
    * than a fixed length — otherwise claims/garbage above 999999 silently
    * become invisible to versions/vacuum/recoverStaleClaims. */
  private def versionOf(fn: String): Option[Int] =
    // toIntOption: a digits-only name overflowing Int (foreign tooling,
    // corruption) must be SKIPPED like any other non-version dir, not
    // crash every maintenance path that lists the table
    if (fn.length >= 7 && fn.startsWith("v") && fn.drop(1).forall(_.isDigit))
      fn.drop(1).toIntOption
    else None

  private def currentVersion(name: String): Int =
    if (exists(name)) new String(Files.readAllBytes(pointer(name))).trim.toInt else 0

  /** bucket -> version number owning that bucket's files, as of `v`. */
  def manifestAt(name: String, v: Int): Map[Int, Int] = {
    require(Files.exists(manifestPath(name, v)),
      s"version $v of $name does not exist (vacuumed or never committed)")
    new String(Files.readAllBytes(manifestPath(name, v))).split("\n")
      .filter(_.nonEmpty)
      .map { l => val Array(b, ver) = l.split("="); b.toInt -> ver.toInt }
      .toMap
  }

  /** bucket -> version number owning that bucket's files (current). */
  def manifest(name: String): Map[Int, Int] = {
    val v = currentVersion(name)
    if (v == 0) Map.empty else manifestAt(name, v)
  }

  /** Committed versions still present on disk, oldest first. */
  def versions(name: String): Seq[Int] = {
    if (!Files.exists(tableDir(name))) return Nil
    val it = Files.list(tableDir(name)).iterator()
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    while (it.hasNext) {
      val fn = it.next().getFileName.toString
      versionOf(fn).filter(v => Files.exists(manifestPath(name, v)))
        .foreach(out += _)
    }
    out.toSeq.sorted
  }

  private def writeManifest(name: String, v: Int, m: Map[Int, Int]): Unit = {
    Files.createDirectories(versionDir(name, v))
    Files.writeString(manifestPath(name, v),
      m.toSeq.sorted.map { case (b, ver) => s"$b=$ver" }.mkString("\n"))
  }

  private def swapPointer(name: String, v: Int): Unit = {
    val tmp = tableDir(name).resolve("_CURRENT.tmp")
    Files.writeString(tmp, v.toString)
    Files.move(tmp, pointer(name), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Optimistic concurrency control: atomically CLAIM the next version by
    * creating its directory (`Files.createDirectory` is exclusive — the
    * filesystem arbitrates). Two writers racing the same commit both
    * compute `currentVersion + 1`; exactly one creates the directory, the
    * other gets [[java.util.ConcurrentModificationException]] and must
    * retry from the new current version. Commits therefore serialize —
    * the lost-update window (both write v+1, last pointer swap silently
    * discards the first commit) is closed: a concurrent writer FAILS
    * LOUDLY, never wins silently. Same shape as Delta's
    * put-if-absent commit protocol on the _delta_log entry. */
  private def claimNextVersion(name: String): Int = {
    Files.createDirectories(tableDir(name))
    val v = currentVersion(name) + 1
    try { Files.createDirectory(versionDir(name, v)); v }
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new java.util.ConcurrentModificationException(
          s"table $name: version $v already claimed by a concurrent writer " +
            "(or left by a crashed one — see recoverStaleClaims); retry the commit")
    }
  }

  /** Run a commit body holding the claim on version `v`; on failure the
    * claim dir is removed (we own it — the pointer never referenced it)
    * so a failed write doesn't wedge every later writer into
    * [[recoverStaleClaims]]. A CRASH still leaves the claim — that is the
    * unavoidable half of optimistic locking without leases. */
  private def withClaimCleanup[A](name: String, v: Int)(body: => A): A =
    try body catch {
      case e: Throwable =>
        try {
          Files.walk(versionDir(name, v))
            .sorted(java.util.Comparator.reverseOrder())
            .forEach(f => Files.delete(f))
        } catch {
          case cleanup: java.io.IOException =>
            // a swallowed cleanup failure turns a transient write error into
            // a permanent writer wedge (every later commit sees the orphan
            // claim) with no trace of why — surface it on the real error
            e.addSuppressed(cleanup)
        }
        throw e
    }

  /** Remove UNCOMMITTED version directories (claim dirs above the current
    * pointer — a crashed writer's leftovers, including ones that wrote a
    * manifest but died before the pointer swap). Only run when no writer
    * is live: an in-flight commit's claim is indistinguishable from a
    * stale one without a lease. Returns the removed versions. */
  def recoverStaleClaims(name: String): Seq[Int] = {
    val cur = currentVersion(name)
    if (!Files.exists(tableDir(name))) return Nil
    val it = Files.list(tableDir(name)).iterator()
    val doomed = scala.collection.mutable.ArrayBuffer.empty[Int]
    while (it.hasNext) {
      val fn = it.next().getFileName.toString
      versionOf(fn).filter(_ > cur).foreach(doomed += _)
    }
    doomed.sorted.foreach { v =>
      Files.walk(versionDir(name, v)).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    }
    doomed.toSeq.sorted
  }

  private def bucketOf(keys: Seq[String]) =
    pmod(xxhash64(concat_ws("", keys.map(c => col(c).cast("string")): _*)),
      lit(numBuckets)).cast("int")

  /** Physical paths of a bucket's data under the manifest (for tests and
    * vacuum tooling). */
  def bucketFiles(name: String, bucket: Int): Seq[String] = {
    manifest(name).get(bucket).toSeq.flatMap { ver =>
      val dir = versionDir(name, ver).resolve(s"$BucketCol=$bucket")
      if (!Files.exists(dir)) Nil
      else {
        val it = Files.list(dir).iterator()
        val buf = scala.collection.mutable.ArrayBuffer.empty[String]
        while (it.hasNext) {
          val p = it.next()
          if (p.getFileName.toString.endsWith(".parquet")) buf += p.toString
        }
        buf.toSeq.sorted
      }
    }
  }

  private def schemaPath(name: String) = tableDir(name).resolve("_SCHEMA")

  private def writeSchema(name: String, df: DataFrame): Unit = {
    Files.createDirectories(tableDir(name))
    Files.writeString(schemaPath(name), df.drop(BucketCol).schema.json)
  }

  /** Empty frame carrying the table's persisted schema — what a reader of
    * an existing-but-empty table (empty create, delete-all) must see
    * instead of a schemaless DataFrame. */
  private def emptyWithSchema(name: String): DataFrame = {
    val schema = org.apache.spark.sql.types.DataType
      .fromJson(new String(Files.readAllBytes(schemaPath(name))))
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      schema)
  }

  private def readBuckets(name: String, buckets: Option[Set[Int]],
                          asOf: Option[Int] = None): DataFrame = {
    val m = asOf.map(manifestAt(name, _)).getOrElse(manifest(name))
    val wanted = buckets.map(bs => m.view.filterKeys(bs).toMap).getOrElse(m)
    val paths = wanted.toSeq.map { case (b, ver) =>
      versionDir(name, ver).resolve(s"$BucketCol=$b").toString
    }.filter(p => Files.exists(Paths.get(p)))
    if (paths.isEmpty) emptyWithSchema(name)
    else spark.read.parquet(paths: _*)
  }

  /** Current table contents (all buckets). */
  def read(name: String): DataFrame = {
    require(exists(name), s"table $name does not exist under $root")
    readBuckets(name, None)
  }

  /** Time travel: the table as of commit `version` — resolved through that
    * commit's own manifest, whose data files are immutable, so this is a
    * zero-copy read exactly like Delta's `VERSION AS OF`. Available until
    * [[vacuum]] reclaims versions the CURRENT manifest no longer references.
    * Note `_SCHEMA` is not versioned: an empty historical read reports the
    * LATEST schema (only reachable when version `v` held zero rows). */
  def readAt(name: String, version: Int): DataFrame = {
    require(exists(name), s"table $name does not exist under $root")
    readBuckets(name, None, asOf = Some(version))
  }

  def create(name: String, df: DataFrame, keys: Seq[String]): Unit = {
    val v = claimNextVersion(name)
    withClaimCleanup(name, v) {
      // append into the freshly-claimed (empty) dir: an overwrite would
      // delete-and-recreate it, reopening the claim's exclusivity window
      df.withColumn(BucketCol, bucketOf(keys))
        .write.partitionBy(BucketCol).mode("append")
        .parquet(versionDir(name, v).toString)
      writeSchema(name, df)
      writeManifest(name, v, (0 until numBuckets).map(_ -> v).toMap)
      swapPointer(name, v)
    }
  }

  /** Buckets physically present in a version dir — read from the
    * filesystem listing, NOT by re-running the input pipeline. */
  private def bucketsInVersion(name: String, v: Int): Set[Int] = {
    val dir = versionDir(name, v)
    if (!Files.exists(dir)) Set.empty
    else {
      val it = Files.list(dir).iterator()
      val out = scala.collection.mutable.Set.empty[Int]
      while (it.hasNext) {
        val fn = it.next().getFileName.toString
        if (fn.startsWith(s"$BucketCol=")) out += fn.drop(BucketCol.length + 1).toInt
      }
      out.toSet
    }
  }

  /** Partition-pruned MERGE: matched rows replaced, unmatched inserted —
    * but ONLY buckets containing incoming keys are read, merged, and
    * rewritten. Returns the set of touched buckets. */
  def upsert(name: String, df: DataFrame, keys: Seq[String]): Set[Int] = {
    val fresh = df.withColumn(BucketCol, bucketOf(keys))
    if (!exists(name)) {
      create(name, df, keys)
      // touched set comes from the directories the write just produced —
      // re-running the input pipeline for a distinct() would double the
      // first batch's I/O
      bucketsInVersion(name, currentVersion(name))
    } else {
      val touched = fresh.select(BucketCol).distinct().collect()
        .map(_.getInt(0)).toSet
      if (touched.isEmpty) return Set.empty
      // claim FIRST, read state after: a successful claim of v freezes
      // the pointer at v-1 (every competitor's own claim of v fails), so
      // the prior manifest and the existing-bucket reads below are
      // guaranteed consistent with the base this commit builds on —
      // reading them pre-claim would race a competitor's commit
      val v = claimNextVersion(name)
      withClaimCleanup(name, v) {
        val prior = manifest(name)
        // touched buckets may be empty on disk (partitionBy only writes
        // non-empty buckets): readBuckets then yields the schema-typed empty
        // frame and the merge below degenerates to the insert
        val existingTouched = readBuckets(name, Some(touched))
          .withColumn(BucketCol, bucketOf(keys))
        val merged = existingTouched.join(
            fresh.select(keys.map(col): _*).distinct(), keys, "left_anti")
          .unionByName(fresh, allowMissingColumns = true)
        merged.write.partitionBy(BucketCol).mode("append")
          .parquet(versionDir(name, v).toString)
        writeSchema(name, merged.drop(BucketCol))
        writeManifest(name, v,
          prior ++ touched.map(_ -> v).toMap)
        swapPointer(name, v)
        touched
      }
    }
  }

  /** Remove version directories no longer referenced by the CURRENT
    * manifest (superseded bucket rewrites). Keeps the live version chain
    * intact; gives up time travel to vacuumed versions, like Delta VACUUM.
    * Returns the deleted version numbers. */
  def vacuum(name: String): Seq[Int] = {
    val cur = currentVersion(name)
    val live = manifest(name).values.toSet + cur
    val it = Files.list(tableDir(name)).iterator()
    val doomed = scala.collection.mutable.ArrayBuffer.empty[Int]
    while (it.hasNext) {
      val p = it.next()
      val fn = p.getFileName.toString
      versionOf(fn).foreach { v =>
        // never touch versions ABOVE the pointer: that is a concurrent
        // writer's claimed (in-flight) commit, not garbage —
        // recoverStaleClaims handles crashed ones explicitly
        if (!live.contains(v) && v < cur) doomed += v
      }
    }
    doomed.sorted.foreach { v =>
      val dir = versionDir(name, v)
      Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    }
    doomed.toSeq.sorted
  }

  /** Partition-pruned DELETE by key frame; only touched buckets rewrite. */
  def delete(name: String, keysDf: DataFrame, keys: Seq[String]): Set[Int] = {
    val doomed = keysDf.select(keys.map(col): _*).distinct()
      .withColumn(BucketCol, bucketOf(keys))
    val touched = doomed.select(BucketCol).distinct().collect()
      .map(_.getInt(0)).toSet
    if (touched.isEmpty) return Set.empty
    val v = claimNextVersion(name) // claim first (see upsert)
    withClaimCleanup(name, v) {
      val prior = manifest(name)
      val existingRaw = readBuckets(name, Some(touched))
      val remaining = existingRaw
        .join(doomed.drop(BucketCol), keys, "left_anti")
        .withColumn(BucketCol, bucketOf(keys))
      remaining.write.partitionBy(BucketCol).mode("append")
        .parquet(versionDir(name, v).toString)
      writeManifest(name, v, prior ++ touched.map(_ -> v).toMap)
      swapPointer(name, v)
      touched
    }
  }
}
