package graft.engine

import org.scalatest.{BeforeAndAfterAll, Suite}

/** Re-runs a layout-agnostic suite with NEW roots committing in
  * manifest-log mode instead of rename mode — the cheap proof that the
  * snapshot/CDC/ingest stack above [[VersionedTable]] is protocol-
  * independent. Suites run sequentially in the forked test JVM, so
  * flipping the process-wide default here cannot leak into a
  * concurrently running suite.
  */
trait ManifestModeFixture extends BeforeAndAfterAll { this: Suite =>
  override protected def beforeAll(): Unit = {
    VersionedTable.defaultMode = CommitMode.ManifestLog
    super.beforeAll()
  }
  override protected def afterAll(): Unit = {
    try super.afterAll()
    finally VersionedTable.defaultMode = CommitMode.Rename
  }
}

/** The cross-table atomic-publish contracts, replayed over the
  * object-store-safe protocol.
  */
class SnapshotSetManifestModeSpec extends SnapshotSetSpec with ManifestModeFixture

/** The stateful CDC ingest lane, replayed over the object-store-safe
  * protocol.
  */
class CdcIngestManifestModeSpec
  extends graft.streaming.CdcIngestSpec with ManifestModeFixture

/** The streaming contamination index lane, replayed over the
  * object-store-safe protocol.
  */
class ContaminationIngestManifestModeSpec
  extends graft.streaming.ContaminationIngestSpec with ManifestModeFixture

/** The self-compacting ingest lane's crash-window invariants, replayed
  * over the object-store-safe protocol (fold + truncate + base vacuum
  * all through manifest commits).
  */
class SnapshotIngestCompactionManifestModeSpec
  extends graft.streaming.SnapshotIngestCompactionSpec with ManifestModeFixture
