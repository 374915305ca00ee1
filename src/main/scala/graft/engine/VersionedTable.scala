package graft.engine

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** The commit protocol a [[VersionedTable]] root uses. A root's mode is
  * decided by its FIRST commit and sticky thereafter (detected from the
  * on-disk layout); [[VersionedTable.defaultMode]] picks for new roots.
  */
sealed trait CommitMode
object CommitMode {
  /** Publish-by-atomic-directory-rename: correct on local FS and HDFS,
    * where `rename` is an atomic metadata operation. WRONG on object
    * stores (S3/GCS emulate rename as copy-then-delete — a crash midway
    * leaves a PARTIAL version visible to readers).
    */
  case object Rename extends CommitMode

  /** Publish-by-conditional-put manifest log: the data dir is written
    * under a nonce name no reader ever resolves, and the commit point is
    * ONE create-if-absent of `_manifests/v=<N>.json` naming it — the
    * Delta/Iceberg-style protocol that is safe where rename is not
    * atomic. On S3/GCS the put maps to a conditional PUT
    * (If-None-Match / generation-0 precondition), which is atomic
    * whole-object; on HDFS/local, `create(path, overwrite=false)` is an
    * atomic O_EXCL create and the payload is one short buffered write.
    */
  case object ManifestLog extends CommitMode
}

/** Versioned snapshot table with time travel — a minimal Delta-style
  * commit protocol over plain parquet, giving the warehouse zone what the
  * reference's truncate-load Postgres tables cannot: every load keeps the
  * previous snapshots readable, a reader can pin a version for a whole
  * job (snapshot isolation across re-loads), and a bad load is undone by
  * reading `asOf` the prior version instead of restoring a backup.
  *
  * Two commit modes (see [[CommitMode]]):
  *
  * RENAME mode — layout: `<root>/v=<N>/` one self-contained parquet dir
  * per version. Protocol (crash-safe, single-writer-atomic):
  *   1. the snapshot writes to `<root>/.tmp-<nonce>` — dot-prefixed,
  *      so no reader ever lists it;
  *   2. ONE atomic directory rename publishes it as `<root>/v=<N>`.
  *
  * A writer that dies before step 2 leaves only an invisible tmp dir
  * (cleaned opportunistically by later commits). Two racing writers can
  * both pick N; rename alone CANNOT arbitrate, because Hadoop
  * `FileSystem.rename(src, dst)` with an existing directory `dst` moves
  * src INTO dst and returns true (HDFS and RawLocalFileSystem alike) —
  * a loser that trusted the rename's boolean would bury its snapshot as
  * a hidden child of the winner's version and believe it won. So every
  * commit carries a `_nonce-<id>` marker file, and a rename only counts
  * as winning if the published dir contains THIS writer's marker; a
  * buried loser pulls its snapshot back out of the winner's dir (dot-
  * prefixed, so readers never saw it) and retries at N+1. Readers
  * resolve versions by LISTING committed `v=*` dirs only, so they never
  * observe a partial write. This is the same publish-by-rename
  * discipline as [[Sinks.swapWrite]], with nonce-verified arbitration
  * and history retained instead of swapped.
  *
  * MANIFEST-LOG mode — layout: `<root>/data-<nonce>/` immutable parquet
  * payloads plus `<root>/_manifests/v=<N>.json`, each one line naming
  * its payload dir. Protocol:
  *   1. the snapshot writes DIRECTLY to `<root>/data-<nonce>` — visible
  *      on the store but unreachable, because readers only resolve dirs
  *      THROUGH manifests;
  *   2. ONE conditional put (create-if-absent) of `v=<N>.json` commits.
  *
  * No rename ever happens on the publish path, so the protocol is
  * correct on object stores where rename is copy-then-delete: a writer
  * crashing mid-"rename" can corrupt nothing readers resolve, and a
  * writer crashing after the data write leaves an unreferenced data dir
  * a later commit's opportunistic cleanup (or vacuum) retires. Racing
  * writers arbitrate on the create-if-absent — the loser's put fails
  * cleanly and it retries at N+1 (vs rename mode's bury-and-recover
  * dance). ObjectStoreCommitSpec demonstrates both halves under a
  * FileSystem whose rename is non-atomic with an injected crash.
  *
  * At scale the listing is one directory's metadata (versions, not
  * files); snapshots are immutable so caches/bucketing survive; `vacuum`
  * bounds storage by dropping all but the last `keepLast` versions.
  */
object VersionedTable {

  /** Commit mode for roots that do not exist yet. Existing roots keep
    * the mode their first commit chose regardless of this default —
    * mixing protocols within one root would reintroduce the rename
    * hazard through the back door. Settable process-wide (e.g. a job on
    * S3 sets ManifestLog once at startup).
    */
  @volatile var defaultMode: CommitMode = CommitMode.Rename

  private def fsOf(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val VDir = "^v=(\\d+)$".r
  private val MFile = "^v=(\\d+)\\.json$".r
  private val MDirName = "_manifests"

  private def manifestPath(root: String, v: Long) =
    new Path(s"$root/$MDirName/v=$v.json")

  /** The root's sticky mode: layout wins over the process default (a
    * root committed in one protocol must never be appended to in the
    * other — the reader contract differs).
    */
  def modeOf(spark: SparkSession, root: String): CommitMode =
    resolveMode(spark, root, None)

  private def renameVersions(fs: FileSystem, root: String): Seq[Long] = {
    val p = new Path(root)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(_.isDirectory)
      .flatMap(st => st.getPath.getName match {
        case VDir(n) => Some(n.toLong)
        case _ => None
      })
      .sorted
  }

  private def manifestVersions(fs: FileSystem, root: String): Seq[Long] = {
    val p = new Path(s"$root/$MDirName")
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      // torn (zero-length OR partially-written) = a writer died between
      // create() and close(); such a manifest is UNCOMMITTED (skipped
      // here, reclaimed by putIfAbsent)
      .filter(st => st.isFile && isCommittedManifest(fs, st))
      .flatMap(st => st.getPath.getName match {
        case MFile(n) => Some(n.toLong)
        case _ => None
      })
      .sorted
  }

  /** Committed versions at `root`, ascending. Empty if the table does not
    * exist yet. Mode-agnostic (a root is one mode in practice; the union
    * keeps readers total either way).
    */
  def versions(spark: SparkSession, root: String): Seq[Long] = {
    val fs = fsOf(spark, root)
    (renameVersions(fs, root) ++ manifestVersions(fs, root)).distinct.sorted
  }

  // -- manifest-log primitives ------------------------------------------

  /** LogStore-style pluggable commit point. The default [[putIfAbsent]]
    * below is correct on local FS (hard link) and HDFS (atomic
    * server-side create under a lease), but on STOCK S3A
    * `create(overwrite=false)` is a client-side HEAD-then-PUT: two
    * racing writers both pass the check and the later close() silently
    * overwrites the earlier manifest — both commits "succeed", one
    * snapshot is lost. This is exactly why Delta requires an external
    * LogStore on S3. Hadoop only issues a real If-None-Match
    * conditional create on S3A in 3.4.1+ with the capability explicitly
    * enabled. Deployments on such stores install their store's true
    * conditional-PUT (or a DynamoDB/ZK lock) here; receives
    * (fs, path, body) and must return true iff THIS call created the
    * file. Without an override, manifest mode must be treated as
    * SINGLE-WRITER on stock S3A (multi-writer arbitration is only as
    * strong as the store's create-if-absent).
    */
  @volatile var putIfAbsentOverride:
      Option[(FileSystem, Path, String) => Boolean] = None

  /** A manifest counts as committed only when its body PARSES (the
    * DirField names a payload dir): a writer dying between create() and
    * close() can leave a zero-length v=N.json, and on a store without
    * atomic whole-payload visibility a crash mid-write can leave a
    * PARTIAL non-empty one — both must read as UNCOMMITTED (skipped by
    * listings, reclaimable at commit time), never as a bricked version
    * or, worse, as an "already committed" replay skip that drops the
    * replayed batch's data. Positive verdicts are cached by
    * (path, length): a committed manifest is immutable, so the parse
    * cost is paid once per manifest per process, keeping version
    * listings metadata-only on the steady path.
    */
  private val committedManifestCache =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def cacheKey(p: Path, len: Long): String = s"${p.toString}#$len"

  private def readWholeFile(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try {
      val bytes = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, bytes, 4096, false)
      bytes.toString("UTF-8")
    } finally in.close()
  }

  private def isCommittedManifest(fs: FileSystem,
      st: org.apache.hadoop.fs.FileStatus): Boolean = {
    if (st.getLen == 0) return false
    val key = cacheKey(st.getPath, st.getLen)
    if (committedManifestCache.contains(key)) return true
    val ok = try {
      readWholeFile(fs, st.getPath) match {
        case DirField(_) => true
        case _ => false
      }
    } catch { case _: java.io.FileNotFoundException => false } // swept mid-list
    if (ok) committedManifestCache.add(key)
    ok
  }

  private def isCommittedManifest(fs: FileSystem, p: Path): Boolean =
    fs.exists(p) && isCommittedManifest(fs, fs.getFileStatus(p))

  /** How old (by mtime) a TORN manifest must be before an OPTIMISTIC
    * commit reclaims its name. A torn manifest younger than this may be
    * a slow-but-alive writer between its create() and close(); deleting
    * it under that writer can make BOTH commits report success for the
    * same version on stores whose close() doesn't re-arbitrate — one
    * payload silently orphaned. An optimistic writer loses nothing by
    * skipping a young torn name (it retries at the next number); only
    * the explicit replay path ([[commitIfAbsent]]) reclaims immediately,
    * because there the caller IS the version's only legitimate writer
    * (the exactly-once batchId contract) and the leftover is its own
    * prior crashed attempt.
    */
  @volatile var tornManifestGraceMillis: Long = 5L * 60L * 1000L

  /** Explicit acknowledgement that a store whose create(overwrite=false)
    * failed the conditional-create probe (see [[putIfAbsent]]) is used
    * SINGLE-WRITER per root, where arbitration is unnecessary. Without
    * this, manifest-mode commits on such a store fail fast instead of
    * silently losing snapshots under multi-writer races.
    */
  @volatile var assumeSingleWriterManifests: Boolean = false

  /** Probe verdicts per FileSystem identity (scheme+authority+class):
    * true = create(overwrite=false) arbitrates at create() time.
    */
  private val probeVerdicts =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  private[engine] def resetProbeCache(): Unit = probeVerdicts.clear()

  /** Fail-fast capability probe for stores taking the generic
    * create(overwrite=false) branch: create a probe file and, WHILE THE
    * FIRST STREAM IS STILL OPEN, attempt a second create(overwrite=false)
    * of the same path. On a store that arbitrates server-side at
    * create() time (HDFS under a NameNode lease; eager-create local
    * wrappers) the second create throws — the primitive is usable as a
    * commit point. On a HEAD-then-PUT store (stock S3A: the object only
    * materializes at close(), so the second HEAD sees nothing) the
    * second create SUCCEEDS — the primitive cannot arbitrate racing
    * writers, and commits must either install [[putIfAbsentOverride]]
    * or declare [[assumeSingleWriterManifests]]. One probe per
    * FileSystem identity per process.
    */
  private[engine] def createArbitratesAtCreate(fs: FileSystem, near: Path): Boolean =
    probeVerdicts.computeIfAbsent(
      s"${fs.getUri}#${fs.getClass.getName}",
      _ => {
        val probe = new Path(near.getParent,
          s".probe-${java.util.UUID.randomUUID().toString.take(8)}")
        val first = fs.create(probe, false)
        try {
          // ONLY an already-exists failure is evidence of server-side
          // arbitration. A transient IOException (throttle, socket
          // timeout) on a genuine HEAD-then-PUT store must NOT read as
          // "safe": the verdict is cached per-process, so one flaky call
          // would silently re-enable the lost-snapshot race the probe
          // exists to prevent. Anything else propagates — computeIfAbsent
          // records no mapping and the next commit re-probes.
          val secondFails =
            try { fs.create(probe, false).close(); false }
            catch {
              case _: org.apache.hadoop.fs.FileAlreadyExistsException => true
              case _: java.nio.file.FileAlreadyExistsException => true
              // HDFS-shaped stores surface the lease conflict as a
              // RemoteException naming AlreadyBeingCreatedException
              case e: org.apache.hadoop.ipc.RemoteException
                  if e.getClassName != null &&
                    e.getClassName.endsWith("AlreadyBeingCreatedException") =>
                true
            }
          java.lang.Boolean.valueOf(secondFails)
        } finally {
          try first.close() catch { case _: java.io.IOException => () }
          fs.delete(probe, false): Unit
        }
      }).booleanValue()

  /** The atomic commit point of manifest mode: whole-payload
    * put-if-absent. Per-filesystem strategy (the Delta LogStore
    * discipline — each store's one atomic primitive):
    *
    *   - LOCAL (incl. test shims extending RawLocalFileSystem): Hadoop's
    *     `create(overwrite=false)` is check-then-create — NOT atomic, two
    *     racing writers both pass the check. POSIX `link(2)` is the real
    *     primitive: write the payload to a hidden sibling, hard-link it
    *     into place (atomic create-if-absent, payload appears whole).
    *   - HDFS: `create(overwrite=false)` IS atomic — the NameNode
    *     arbitrates the create server-side under a lease.
    *   - object stores: install [[putIfAbsentOverride]] with the store's
    *     real conditional PUT (If-None-Match / generation-0
    *     precondition). Stock S3A's create(overwrite=false) is NOT
    *     conditional — without an override, the capability probe
    *     ([[createArbitratesAtCreate]]) detects HEAD-then-PUT semantics
    *     on first use and FAILS FAST with the remedy instead of letting
    *     multi-writer races silently lose snapshots;
    *     [[assumeSingleWriterManifests]] opts a known-single-writer
    *     deployment back in.
    *
    * A torn file at `path` (a writer that died between create() and
    * close() on the non-link branch — zero-length or unparseable) is
    * reclaimed: deleted and the put retried, so a torn manifest can
    * never permanently brick the version — it either stays invisible
    * (listings skip torn manifests) or is replaced by a whole one.
    * Reclaim is immediate only when `reclaimTornNow` (the replay path);
    * the optimistic path waits out [[tornManifestGraceMillis]] so a
    * slow-but-alive writer mid-close is never raced.
    *
    * Returns false iff someone else holds the path — with a committed
    * manifest, or with a torn one too young to reclaim.
    */
  private def putIfAbsent(fs: FileSystem, path: Path, body: String,
      reclaimTornNow: Boolean): Boolean = {
    putIfAbsentOverride match {
      case Some(put) => return put(fs, path, body)
      case None =>
    }
    if (fs.exists(path)) {
      val st = fs.getFileStatus(path)
      if (isCommittedManifest(fs, st)) return false
      // torn leftover: uncommitted by contract — reclaim the name, but
      // on the optimistic path only once it is stale enough that no
      // live writer can still be between create() and close()
      if (!reclaimTornNow && st.getModificationTime >
          System.currentTimeMillis() - tornManifestGraceMillis) return false
      fs.delete(path, false)
      committedManifestCache.remove(cacheKey(path, st.getLen)): Unit
    }
    val bytes = body.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val isLocal = fs.isInstanceOf[org.apache.hadoop.fs.RawLocalFileSystem] ||
      fs.isInstanceOf[org.apache.hadoop.fs.LocalFileSystem]
    if (isLocal) {
      val target = java.nio.file.Paths.get(path.toUri.getPath)
      val tmp = target.resolveSibling(
        s".put-${java.util.UUID.randomUUID().toString.take(8)}")
      java.nio.file.Files.write(tmp, bytes)
      try { java.nio.file.Files.createLink(target, tmp); true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
      finally java.nio.file.Files.deleteIfExists(tmp)
    } else {
      if (fs.getScheme != "hdfs" && !assumeSingleWriterManifests &&
          !createArbitratesAtCreate(fs, path))
        throw new java.io.IOException(
          s"VersionedTable: ${fs.getUri} create(overwrite=false) is " +
            "HEAD-then-PUT (no server-side arbitration at create() time) — " +
            "manifest-mode multi-writer commits would silently lose " +
            "snapshots. Install VersionedTable.putIfAbsentOverride with the " +
            "store's conditional PUT (If-None-Match / generation-0), or set " +
            "VersionedTable.assumeSingleWriterManifests = true for a " +
            "single-writer deployment.")
      val out =
        try fs.create(path, false)
        catch { case _: org.apache.hadoop.fs.FileAlreadyExistsException |
                     _: java.nio.file.FileAlreadyExistsException => return false }
      try out.write(bytes)
      finally out.close()
      true
    }
  }

  private val DirField = """"dir"\s*:\s*"([^"]+)"""".r.unanchored

  /** The payload dir a committed manifest names, relative to root. A
    * torn manifest (zero-length OR unparseable — a crash mid-write on a
    * store without atomic whole-payload visibility) is UNCOMMITTED:
    * None, the same verdict [[isCommittedManifest]] gives listings, so
    * a torn v=N.json can never brick latest-reads.
    */
  private def manifestDataDir(fs: FileSystem, root: String, v: Long): Option[String] = {
    val p = manifestPath(root, v)
    if (!fs.exists(p)) None
    else readWholeFile(fs, p) match {
      case DirField(d) => Some(d)
      case _ => None
    }
  }

  /** Physical dir of a committed version, whichever protocol wrote it. */
  private def dataPath(spark: SparkSession, root: String, v: Long): Path = {
    val fs = fsOf(spark, root)
    manifestDataDir(fs, root, v) match {
      case Some(d) => new Path(s"$root/$d")
      case None => new Path(s"$root/v=$v")
    }
  }

  /** When version `v` was committed — the manifest file's mtime in
    * manifest mode (the actual commit point), the version dir's in
    * rename mode. Used by vacuum grace windows. TOTAL: a version swept
    * by a concurrent vacuum between listing and this call reports
    * Long.MaxValue ("too new to touch"), so the caller's grace filter
    * skips it instead of aborting the whole sweep on FileNotFound.
    */
  private[engine] def versionModTime(spark: SparkSession, root: String, v: Long): Long =
    try {
      val fs = fsOf(spark, root)
      val m = manifestPath(root, v)
      if (fs.exists(m)) fs.getFileStatus(m).getModificationTime
      else fs.getFileStatus(new Path(s"$root/v=$v")).getModificationTime
    } catch {
      case _: java.io.FileNotFoundException => Long.MaxValue
    }

  /** Physically drop one committed version in either mode: the manifest
    * goes FIRST (the version disappears atomically for readers), then
    * its payload dir. Dropping a version that is ALREADY gone (a
    * concurrent vacuum won the race) is a no-op, not an error — the
    * caller's intent ("this version must not exist") holds either way.
    */
  private[graft] def dropVersion(spark: SparkSession, root: String, v: Long): Unit = {
    val fs = fsOf(spark, root)
    val m = manifestPath(root, v)
    if (!fs.exists(m) && !fs.exists(new Path(s"$root/v=$v"))) return
    // a delete that "fails" because someone else already removed the
    // path is the race above landing mid-drop — success by other means
    def deleted(p: Path, recursive: Boolean): Boolean =
      fs.delete(p, recursive) || !fs.exists(p)
    if (fs.exists(m)) {
      val dir = manifestDataDir(fs, root, v)
      try committedManifestCache.remove(
        cacheKey(m, fs.getFileStatus(m).getLen)): Unit
      catch { case _: java.io.FileNotFoundException => () }
      if (!deleted(m, recursive = false))
        throw new java.io.IOException(s"VersionedTable: cannot drop manifest $m")
      dir.foreach { d =>
        val dp = new Path(s"$root/$d")
        if (fs.exists(dp) && !deleted(dp, recursive = true))
          throw new java.io.IOException(s"VersionedTable: cannot drop payload $dp")
      }
    } else {
      if (!deleted(new Path(s"$root/v=$v"), recursive = true))
        throw new java.io.IOException(s"VersionedTable: cannot vacuum v=$v at $root")
    }
  }

  def latestVersion(spark: SparkSession, root: String): Option[Long] =
    versions(spark, root).lastOption

  /** Publish `df` as the next version; returns the committed version
    * number. Optimistic under writer races: loses the commit point
    * (rename or conditional put, per the root's mode), retries at the
    * next number.
    */
  def commit(df: DataFrame, root: String): Long =
    commit(df, root, newRootMode = None)

  /** [[commit]] with the mode a NEW root should take, threaded
    * explicitly by parents creating child roots (a compacting lane's
    * `_base`, a SnapshotSet's table roots) so the child inherits the
    * parent structure's protocol instead of whatever the mutable
    * process-wide [[defaultMode]] happens to be at child-creation time —
    * on an object store that drift would silently reintroduce the
    * torn-rename hazard on the child path. An EXISTING root keeps its
    * sticky on-disk mode regardless.
    */
  def commit(df: DataFrame, root: String,
      newRootMode: Option[CommitMode]): Long =
    resolveMode(df.sparkSession, root, newRootMode) match {
      case CommitMode.Rename => commitRename(df, root)
      case CommitMode.ManifestLog => commitManifest(df, root)
    }

  /** The root's sticky layout mode if it exists, else the caller's
    * explicit choice for a new root, else the process default.
    */
  private def resolveMode(spark: SparkSession, root: String,
      newRootMode: Option[CommitMode]): CommitMode = {
    val fs = fsOf(spark, root)
    if (fs.exists(new Path(s"$root/$MDirName"))) CommitMode.ManifestLog
    else if (renameVersions(fs, root).nonEmpty) CommitMode.Rename
    else newRootMode.getOrElse(defaultMode)
  }

  private def commitRename(df: DataFrame, root: String): Long = {
    val spark = df.sparkSession
    val fs = fsOf(spark, root)
    fs.mkdirs(new Path(root))
    // opportunistic cleanup of tmp dirs older than 1h (a crashed writer's
    // leftovers) — never a committed version, so always safe
    fs.listStatus(new Path(root)).toSeq
      .filter(st => st.getPath.getName.startsWith(".tmp-") &&
        st.getModificationTime < System.currentTimeMillis() - 3600L * 1000L)
      .foreach(st => fs.delete(st.getPath, true))
    val nonce = java.util.UUID.randomUUID().toString.take(8)
    val tmpName = s".tmp-$nonce"
    val tmp = new Path(s"$root/$tmpName")
    df.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val marker = s"_nonce-$nonce"
    fs.create(new Path(tmp, marker), true).close()
    var attempt = latestVersion(spark, root).map(_ + 1L).getOrElse(0L)
    val lastAttempt = attempt + 10000L // liveness guard: a broken FS
    // (rename false with no dest) must surface as an error, not a spin
    var published = false
    while (!published) {
      if (attempt > lastAttempt) throw new java.io.IOException(
        s"VersionedTable: gave up publishing $tmp after 10000 contested versions")
      val dest = new Path(s"$root/v=$attempt")
      if (!fs.exists(dest) && fs.rename(tmp, dest) &&
          fs.exists(new Path(dest, marker))) {
        published = true
      } else {
        // Lost the race. If the rename "succeeded" into the winner's
        // dir, our whole snapshot now sits at dest/<tmpName> — pull it
        // back out (a metadata move, no data rewrite) and retry at the
        // next number.
        val buried = new Path(dest, tmpName)
        if (fs.exists(buried) && !fs.rename(buried, tmp))
          throw new java.io.IOException(
            s"VersionedTable: cannot recover buried snapshot $buried")
        if (!fs.exists(tmp)) throw new java.io.IOException(
          s"VersionedTable: snapshot $tmp lost publishing as $dest")
        attempt += 1L
      }
    }
    attempt
  }

  /** Test seam: invoked between the data write and the manifest put —
    * ObjectStoreCommitSpec injects a crash here to prove a writer dying
    * at the worst moment leaves readers on the previous version.
    */
  @volatile private[engine] var beforeManifestPut: () => Unit = () => ()

  private def commitManifest(df: DataFrame, root: String): Long = {
    val spark = df.sparkSession
    val fs = fsOf(spark, root)
    fs.mkdirs(new Path(s"$root/$MDirName"))
    // opportunistic cleanup: data dirs no manifest references and older
    // than 1h are crashed writers' leftovers (rename mode's .tmp sweep,
    // manifest-style). Referenced set first so a dir committed between
    // the two listings can't be misjudged.
    val referenced = manifestVersions(fs, root)
      .flatMap(v => manifestDataDir(fs, root, v)).toSet
    fs.listStatus(new Path(root)).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("data-") &&
        !referenced.contains(st.getPath.getName) &&
        st.getModificationTime < System.currentTimeMillis() - 3600L * 1000L)
      .foreach(st => fs.delete(st.getPath, true))
    val nonce = java.util.UUID.randomUUID().toString.take(8)
    val dirName = s"data-$nonce"
    // the payload goes STRAIGHT to its final name — never renamed, and
    // unreachable until a manifest names it
    df.write.mode(SaveMode.Overwrite).parquet(s"$root/$dirName")
    beforeManifestPut()
    var attempt = latestVersion(spark, root).map(_ + 1L).getOrElse(0L)
    val lastAttempt = attempt + 10000L // liveness guard, as in rename mode
    while (true) {
      if (attempt > lastAttempt) throw new java.io.IOException(
        s"VersionedTable: gave up publishing $dirName after 10000 contested versions")
      if (putIfAbsent(fs, manifestPath(root, attempt),
          s"""{"version":$attempt,"dir":"$dirName"}""",
          reclaimTornNow = false)) return attempt
      attempt += 1L // lost the conditional put — no recovery dance needed
    }
    -1L // unreachable
  }

  /** Read a snapshot: the latest version, or exactly `asOf` (which must
    * be committed — reading an uncommitted/vacuumed version is an error,
    * not silent fallback).
    */
  def read(spark: SparkSession, root: String, asOf: Option[Long] = None): DataFrame = {
    val vs = versions(spark, root)
    require(vs.nonEmpty, s"VersionedTable: no committed versions at $root")
    val v = asOf match {
      case Some(n) =>
        require(vs.contains(n),
          s"VersionedTable: version $n not committed at $root (have ${vs.mkString(",")})")
        n
      case None => vs.last
    }
    spark.read.parquet(dataPath(spark, root, v).toString)
  }

  /** Publish `df` at EXACTLY `version` if that version does not already
    * exist; returns true if this call published it. The rename-if-absent
    * arbitration makes a retried publish of the same version a no-op —
    * the exactly-once hook a streaming `foreachBatch` needs: keying the
    * version by batchId turns an at-least-once replay into a skipped
    * commit (the replayed batch finds its version already on disk).
    */
  def commitIfAbsent(df: DataFrame, root: String, version: Long): Boolean =
    commitIfAbsent(df, root, version, newRootMode = None)

  /** [[commitIfAbsent]] with an explicit mode for a NEW root — see
    * [[commit]]'s three-arg overload for why parents thread this.
    */
  def commitIfAbsent(df: DataFrame, root: String, version: Long,
      newRootMode: Option[CommitMode]): Boolean =
    resolveMode(df.sparkSession, root, newRootMode) match {
      case CommitMode.Rename => commitIfAbsentRename(df, root, version)
      case CommitMode.ManifestLog => commitIfAbsentManifest(df, root, version)
    }

  private def commitIfAbsentManifest(df: DataFrame, root: String,
      version: Long): Boolean = {
    val spark = df.sparkSession
    val fs = fsOf(spark, root)
    val m = manifestPath(root, version)
    // a torn manifest is a crashed leftover, NOT a committed version —
    // reporting "already committed" here would drop the replay's data
    if (isCommittedManifest(fs, m)) return false
    fs.mkdirs(new Path(s"$root/$MDirName"))
    val nonce = java.util.UUID.randomUUID().toString.take(8)
    val dirName = s"data-$nonce"
    df.write.mode(SaveMode.Overwrite).parquet(s"$root/$dirName")
    beforeManifestPut()
    // reclaimTornNow: this version's only legitimate writer is THIS
    // caller (the exactly-once batchId contract), so a torn leftover
    // here is its own prior crashed attempt — safe to replace at once
    if (putIfAbsent(fs, m, s"""{"version":$version,"dir":"$dirName"}""",
        reclaimTornNow = true)) true
    else {
      // lost to a racing replay — its commit stands; our payload is
      // unreferenced garbage, retire it now rather than waiting for the
      // 1h sweep
      fs.delete(new Path(s"$root/$dirName"), true)
      false
    }
  }

  private def commitIfAbsentRename(df: DataFrame, root: String,
      version: Long): Boolean = {
    val spark = df.sparkSession
    val fs = fsOf(spark, root)
    val dest = new Path(s"$root/v=$version")
    if (fs.exists(dest)) return false
    fs.mkdirs(new Path(root))
    val nonce = java.util.UUID.randomUUID().toString.take(8)
    val tmpName = s".tmp-$nonce"
    val tmp = new Path(s"$root/$tmpName")
    df.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val marker = s"_nonce-$nonce"
    fs.create(new Path(tmp, marker), true).close()
    if (!fs.exists(dest) && fs.rename(tmp, dest) &&
        fs.exists(new Path(dest, marker))) true
    else {
      // Lost to a racing replay — its commit stands. The rename may
      // have buried our snapshot INSIDE the winner's dir (Hadoop
      // rename-into-existing-dir returns true); delete whichever copy
      // of ours survives, never the winner's data.
      val buried = new Path(dest, tmpName)
      if (fs.exists(buried)) fs.delete(buried, true)
      if (fs.exists(tmp)) fs.delete(tmp, true)
      // "Lost the race" is only true if SOMEONE published the version.
      // A rename that failed with dest still absent (transient/broken
      // FS) must surface as an error — returning false here would tell
      // the caller the version exists when nothing was ever committed.
      if (!fs.exists(dest)) throw new java.io.IOException(
        s"VersionedTable: rename to $dest failed but no version was published")
      false
    }
  }

  /** Targeted delete (the GDPR forget-me workflow) over immutable
    * snapshots: publishes a NEW version equal to the latest minus rows
    * matching `pred` — readers pinned to old versions are undisturbed,
    * and the physical forget completes when `vacuum` retires the
    * pre-delete snapshots. Returns the new version number. At scale this
    * is one filtered rewrite of the latest snapshot — the anti-join/
    * rewrite every snapshot store pays for row-level deletes without
    * tombstone support.
    */
  def deleteWhere(spark: SparkSession, root: String,
      pred: org.apache.spark.sql.Column): Long = {
    // `pred <=> true` so rows where pred is NULL are RETAINED: plain
    // filter(!pred) drops them under three-valued logic (NULL is not
    // true), turning e.g. col("email")===x into "also forget everyone
    // with no email".
    import org.apache.spark.sql.functions.lit
    commit(read(spark, root).filter(!(pred <=> lit(true))), root)
  }

  /** Change-data-capture diff between two committed snapshots: one row
    * per key that was INSERTED, DELETED, or UPDATED going from `vOld`
    * to `vNew` (unchanged keys are absent — a CDC feed carries changes,
    * not the table). Change detection hashes ALL non-key columns
    * (xxhash64), so any attribute edit surfaces as an update without
    * naming columns. A full-outer join of two snapshots keyed on the
    * primary key — at scale, two snapshot scans and one key shuffle,
    * which is what turns the snapshot store into an incremental-export
    * source.
    */
  def diff(spark: SparkSession, root: String, vOld: Long, vNew: Long,
      keys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    def sided(v: Long, tag: String) = {
      val df = read(spark, root, Some(v))
      val valueCols = df.columns.filterNot(keys.contains).toSeq
      df.select(keys.map(col) :+
        xxhash64((keys ++ valueCols).map(col): _*).as(s"_h_$tag"): _*)
    }
    sided(vOld, "old").join(sided(vNew, "new"), keys, "full_outer")
      .withColumn("change_type",
        when(col("_h_old").isNull, "insert")
          .when(col("_h_new").isNull, "delete")
          .when(col("_h_old") =!= col("_h_new"), "update"))
      .filter(col("change_type").isNotNull)
      .select(keys.map(col) :+ col("change_type"): _*)
      .orderBy(keys.map(col): _*)
  }

  /** Small-file compaction: publish a NEW version equal to the latest,
    * rewritten into ~`targetBytes`-sized files (the bin-packing rewrite
    * every snapshot store needs once streaming ingest has committed
    * thousands of per-batch snapshots whose union is million-file
    * metadata). Data is untouched — same rows, fewer files; readers
    * pinned to old versions are undisturbed and `vacuum` retires the
    * fragmented history. Returns (new version, files before, files
    * after). File count = ceil(current bytes / targetBytes), computed
    * from the snapshot's own listing — no data pass before the rewrite.
    */
  def compactFiles(spark: SparkSession, root: String,
      targetBytes: Long = 128L * 1024 * 1024): (Long, Int, Int) = {
    val fs = fsOf(spark, root)
    val v = latestVersion(spark, root).getOrElse(
      throw new java.util.NoSuchElementException(
        s"VersionedTable: nothing to compact at $root"))
    val parts = fs.listStatus(dataPath(spark, root, v)).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    val bytes = parts.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val newV = commit(read(spark, root).coalesce(nOut), root)
    val after = fs.listStatus(dataPath(spark, root, newV)).toSeq
      .count(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    (newV, parts.size, after)
  }

  /** Drop all but the newest `keepLast` versions; returns the versions
    * removed. The latest version is never removed.
    */
  def vacuum(spark: SparkSession, root: String, keepLast: Int): Seq[Long] =
    vacuum(spark, root, keepLast, graceMillis = 0L)

  /** [[vacuum]] with a reader grace window: versions committed within
    * the last `graceMillis` are NEVER dropped, even beyond `keepLast`.
    * An in-flight reader resolves a version number, then scans its
    * files; a vacuum landing between the two turns the scan into
    * FileNotFoundException mid-query. Age-gating superseded versions
    * (the Delta retention-check discipline, same contract as
    * [[SnapshotSet.vacuumSet]]) bounds that race to readers slower than
    * the grace window — storage stays O(versions-per-grace-window), not
    * O(history).
    */
  def vacuum(spark: SparkSession, root: String, keepLast: Int,
      graceMillis: Long): Seq[Long] = {
    require(keepLast >= 1, "vacuum must keep at least the latest version")
    val cutoff = System.currentTimeMillis() - graceMillis
    val doomed = versions(spark, root).dropRight(keepLast)
      .filter(v => versionModTime(spark, root, v) < cutoff)
    doomed.foreach(v => dropVersion(spark, root, v))
    doomed
  }
}
