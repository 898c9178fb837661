package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.CountDownLatch

import org.scalatest.funsuite.AnyFunSuite

import graft.snapshot.TargetTable

/** Single-writer enforcement on the versioned target table: the
  * tmp→swap commit protocol is crash-safe for ONE writer, so a second
  * concurrent writer must fail LOUDLY at lease acquisition instead of
  * racing the pointer swap — and a lease orphaned by a dead process
  * must expire, not wedge the table forever. */
class TargetTableLeaseSpec extends AnyFunSuite {

  lazy val spark = GraftSession.build(4, "target-lease-spec")
  import spark.implicits._

  private def tmpRoot() =
    Files.createTempDirectory("target-lease").toFile.getAbsolutePath

  private def df(n: Int) =
    (0 until n).map(i => (i.toLong, s"row $i")).toDF("k", "v")

  test("a live rival's lease makes a writer fail loudly; release unblocks it") {
    val root = tmpRoot()
    val t = new TargetTable(spark, root)
    assert(t.writeVersion(df(10), "v1"))

    // a FRESH lease held by another (live) writer
    val lease = Paths.get(root, "_lease")
    Files.writeString(lease, s"rival-owner ${System.currentTimeMillis()}")
    val e = intercept[RuntimeException] { t.writeVersion(df(10), "v2") }
    assert(e.getMessage.contains("another writer") && e.getMessage.contains("rival-owner"),
      s"loser must name the holder: ${e.getMessage}")
    // the failed attempt left no tear: still serving v1, no v2 dir
    assert(t.currentVersion.contains("data_v1"))
    assert(!t.hasVersion("v2"))
    assert(Files.readString(lease).startsWith("rival-owner"),
      "the loser must not delete a live rival's lease")

    Files.delete(lease)
    assert(t.writeVersion(df(10), "v2"))
    assert(t.currentVersion.contains("data_v2"))
  }

  test("a dead holder's lease expires by TTL and is stolen") {
    val root = tmpRoot()
    val t = new TargetTable(spark, root, leaseTtlMs = 500L)
    assert(t.writeVersion(df(5), "v1"))
    // a lease whose holder crashed long ago (mtime in the past)
    val lease = Paths.get(root, "_lease")
    Files.writeString(lease, "dead-owner 0")
    Files.setLastModifiedTime(lease,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 60000))
    assert(t.writeVersion(df(5), "v2"), "stale lease must be stolen, not block forever")
    assert(t.currentVersion.contains("data_v2"))
    assert(!Files.exists(lease), "the winner must release the stolen lease")
  }

  test("two concurrent writers: at most one holds the lease; the table never tears") {
    val root = tmpRoot()
    val a = new TargetTable(spark, root)
    new TargetTable(spark, root).writeVersion(df(5), "v0") // init
    val b = new TargetTable(spark, root)
    val start = new CountDownLatch(1)
    val results = new java.util.concurrent.ConcurrentHashMap[String, Either[String, Boolean]]()
    def writer(name: String, t: TargetTable, v: String) = new Thread(() => {
      start.await()
      try results.put(name, Right(t.writeVersion(df(2000), v)))
      catch { case e: Throwable => results.put(name, Left(e.getMessage)) }
    })
    val ta = writer("a", a, "va")
    val tb = writer("b", b, "vb")
    ta.start(); tb.start(); start.countDown()
    ta.join(120000); tb.join(120000)

    val outcomes = Seq(results.get("a"), results.get("b"))
    val wins = outcomes.count(_.isRight)
    assert(wins >= 1, s"someone must commit: $outcomes")
    // any loser lost AT THE LEASE, with the loud message — never mid-swap
    outcomes.collect { case Left(msg) =>
      assert(msg != null && msg.contains("another writer"),
        s"a loser must fail at acquisition, not mid-commit: $msg")
    }
    // whatever interleaving happened, the table is whole: the pointer
    // names a materialized version and reads succeed
    val t = new TargetTable(spark, root)
    val cur = t.currentVersion.get
    assert(Files.isDirectory(Paths.get(root, cur)), s"pointer names a missing dir: $cur")
    assert(t.read().count() > 0)
    assert(!Files.exists(Paths.get(root, "_lease")), "all leases must be released")
  }

  test("an exception mid-commit (injected crash) releases the lease for the replay") {
    import graft.tools.Failpoints
    val root = tmpRoot()
    val t = new TargetTable(spark, root)
    assert(t.writeVersion(df(5), "v1"))
    Failpoints.arm("target.before-move")
    intercept[Failpoints.InjectedCrash] { t.writeVersion(df(5), "v2") }
    assert(!Files.exists(Paths.get(root, "_lease")),
      "an in-process failure must release the lease on the way out")
    assert(t.writeVersion(df(5), "v2"), "the replay must land cleanly")
  }
}
