package graft.engine

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.fs.{FSDataOutputStream, FileAlreadyExistsException, FilterFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.util.Progressable

/** Test-only FileSystem modelling STOCK S3A's `create(overwrite=false)`:
  * a client-side HEAD (exists check) followed by a PUT that only
  * materializes the object at close() — NOT a server-side conditional
  * create. Two racing writers both pass the HEAD (nothing is visible
  * until a close), and the later close() silently overwrites the
  * earlier object. This is the exact semantics the
  * VersionedTable capability probe must detect and reject.
  *
  * Deliberately NOT a RawLocalFileSystem subclass: putIfAbsent routes
  * local filesystems through the hard-link commit point, and this fake
  * must land on the generic create(overwrite=false) branch where the
  * probe lives. Registered per-test as scheme `htp` through
  * `fs.htp.impl` in the Hadoop conf.
  */
class HeadThenPutFileSystem extends FilterFileSystem(new HeadThenPutFileSystem.Inner()) {

  override def getScheme: String = "htp"
  override def getUri: URI = URI.create("htp:///")

  override def initialize(name: URI, conf: Configuration): Unit = {
    fs.initialize(name, conf)
    setConf(conf)
  }

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    if (!overwrite && fs.exists(f)) // the HEAD: visibility-based, client-side
      throw new FileAlreadyExistsException(s"htp: $f exists")
    // the PUT: buffer everything, materialize (unconditionally!) at close
    val buf = new java.io.ByteArrayOutputStream()
    val deferred = new java.io.FilterOutputStream(buf) {
      override def close(): Unit = {
        super.close()
        val out = fs.create(f, true) // whole-object overwrite — no re-check
        try out.write(buf.toByteArray)
        finally out.close()
      }
    }
    new FSDataOutputStream(deferred, null)
  }
}

object HeadThenPutFileSystem {
  /** The local backing store, answering to the htp scheme so delegated
    * calls pass checkPath.
    */
  private class Inner extends RawLocalFileSystem {
    override def getScheme: String = "htp"
    override def getUri: URI = URI.create("htp:///")
  }
}

/** The counterpart fake: a non-local store whose create(overwrite=false)
  * IS arbitrated at create() time (the file exists, and blocks a second
  * create, from the moment create() returns — HDFS-under-a-lease
  * semantics). The capability probe must PASS this one: fail-fast is
  * for HEAD-then-PUT stores only. Scheme `ecr` via `fs.ecr.impl`.
  */
class EagerCreateFileSystem extends FilterFileSystem(new EagerCreateFileSystem.Inner()) {
  override def getScheme: String = "ecr"
  override def getUri: URI = URI.create("ecr:///")
  override def initialize(name: URI, conf: Configuration): Unit = {
    fs.initialize(name, conf)
    setConf(conf)
  }
  // no create override: RawLocal's create is eager — the file is visible
  // (and a second create(overwrite=false) fails) before close()
}

object EagerCreateFileSystem {
  private class Inner extends RawLocalFileSystem {
    override def getScheme: String = "ecr"
    override def getUri: URI = URI.create("ecr:///")
  }
}

/** A HEAD-then-PUT store whose create(overwrite=false) can also fail
  * TRANSIENTLY (throttle/socket timeout) — the round-17 advisory case:
  * the capability probe must RETHROW such a failure instead of caching
  * it as proof of server-side arbitration (a false "safe" verdict is
  * cached per-process and silently re-enables the lost-snapshot race).
  * Scheme `fhp` via `fs.fhp.impl`; arm with
  * [[FlakyHeadThenPutFileSystem.failCreateAfter]] — the Nth
  * create(overwrite=false) call throws a plain IOException once.
  */
class FlakyHeadThenPutFileSystem extends FilterFileSystem(new FlakyHeadThenPutFileSystem.Inner()) {

  override def getScheme: String = "fhp"
  override def getUri: URI = URI.create("fhp:///")

  override def initialize(name: URI, conf: Configuration): Unit = {
    fs.initialize(name, conf)
    setConf(conf)
  }

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    if (!overwrite &&
        FlakyHeadThenPutFileSystem.createCountdown.decrementAndGet() == 0)
      throw new java.io.IOException("fhp: simulated transient throttle")
    if (!overwrite && fs.exists(f))
      throw new FileAlreadyExistsException(s"fhp: $f exists")
    // HEAD-then-PUT: materialize (unconditionally) at close only
    val buf = new java.io.ByteArrayOutputStream()
    val deferred = new java.io.FilterOutputStream(buf) {
      override def close(): Unit = {
        super.close()
        val out = fs.create(f, true)
        try out.write(buf.toByteArray)
        finally out.close()
      }
    }
    new FSDataOutputStream(deferred, null)
  }
}

object FlakyHeadThenPutFileSystem {
  /** Counts down on each create(overwrite=false); the call that lands
    * exactly on zero throws the transient IOException. <= 0 disarms.
    */
  val createCountdown = new java.util.concurrent.atomic.AtomicInteger(0)

  private class Inner extends RawLocalFileSystem {
    override def getScheme: String = "fhp"
    override def getUri: URI = URI.create("fhp:///")
  }
}
