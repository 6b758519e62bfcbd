package graft.lake

import graft.SparkSuite

/** Persistent catalog semantics (VERDICT round-2 #3): `CREATE TABLE
  * ... USING lake LOCATION` registrations must survive a brand-new
  * session, like the reference's metastore-backed registrations
  * (etl/01:149-161, rapid:166-171).
  */
class LakeCatalogSuite extends SparkSuite {
  import spark.implicits._

  private def withCatalogDir[A](f: => A): A = {
    val prev = sys.props.get("graft.catalog.dir")
    sys.props("graft.catalog.dir") = tmpDir("graft-cat")
    try f
    finally {
      prev match {
        case Some(v) => sys.props("graft.catalog.dir") = v
        case None => sys.props.remove("graft.catalog.dir"); ()
      }
      LakeCatalog.resetForTest()
    }
  }

  test("registrations survive a session restart via the on-disk catalog") {
    withCatalogDir {
      LakeCatalog.resetForTest()
      val path = tablePath("persist-t")
      LakeWriter.write(Seq((1L, "a"), (2L, "b")).toDF("id", "k"), path)
      LakeSql.sql(spark,
        s"CREATE TABLE persist_t USING lake LOCATION '$path'")

      // "restart": wipe all in-memory state, use a fresh session with
      // its own (empty) temp-view registry
      LakeCatalog.resetForTest()
      val s2 = spark.newSession()
      assert(LakeCatalog.table(s2, "persist_t").toDF.count() === 2L)
      // plain SQL by name resolves in the new session too
      assert(LakeSql.sql(s2, "SELECT id FROM persist_t").count() === 2L)
      // and DML routes by name
      LakeSql.sql(s2, "DELETE FROM persist_t WHERE id = 1")
      assert(LakeSql.sql(s2, "SELECT id FROM persist_t").count() === 1L)

      LakeCatalog.drop(s2, "persist_t")
      // the drop persisted: a second restart no longer resolves it
      LakeCatalog.resetForTest()
      intercept[IllegalArgumentException] {
        LakeCatalog.table(spark.newSession(), "persist_t")
      }
      ()
    }
  }

  test("SHOW TABLES lists registered lake tables with locations") {
    withCatalogDir {
      LakeCatalog.resetForTest()
      val p1 = tablePath("show-a")
      val p2 = tablePath("show-b")
      LakeWriter.write(Seq(1L).toDF("id"), p1)
      LakeWriter.write(Seq(2L).toDF("id"), p2)
      LakeCatalog.register(spark, "show_a", p1)
      LakeCatalog.register(spark, "show_b", p2)
      val got = LakeSql.sql(spark, "SHOW TABLES")
        .as[(String, String)].collect().toMap
      assert(got.get("show_a").contains(p1))
      assert(got.get("show_b").contains(p2))
    }
  }

  test("merge-on-persist keeps a concurrent process's registration") {
    withCatalogDir {
      LakeCatalog.resetForTest()
      val pa = tablePath("conc-a")
      val pb = tablePath("conc-b")
      LakeWriter.write(Seq(1L).toDF("id"), pa)
      LakeWriter.write(Seq(2L).toDF("id"), pb)

      // Session B loads the (empty) catalog first...
      assert(LakeCatalog.registeredNames.isEmpty)
      // ...then "another process" registers conc_a directly on disk
      // (simulated by an out-of-band file write, the exact state a
      // concurrent JVM's persist leaves behind)...
      val f = java.nio.file.Paths.get(
        sys.props("graft.catalog.dir"), "_graft_catalog.json")
      java.nio.file.Files.createDirectories(f.getParent)
      java.nio.file.Files.write(f,
        s"""{"conc_a":"$pa"}""".getBytes("UTF-8"))
      // ...and B registers conc_b. Read-once-then-overwrite would
      // drop conc_a here; merge-on-persist must keep BOTH.
      LakeCatalog.register(spark, "conc_b", pb)

      val disk = new String(java.nio.file.Files.readAllBytes(f), "UTF-8")
      assert(disk.contains("conc_a") && disk.contains("conc_b"))
      assert(LakeCatalog.pathOf("conc_a").contains(pa))

      // a registration landing on disk AFTER this JVM's last read is
      // still resolvable without a restart: a lookup miss re-merges
      val pc = tablePath("conc-c")
      LakeWriter.write(Seq(3L).toDF("id"), pc)
      java.nio.file.Files.write(f,
        s"""{"conc_a":"$pa","conc_b":"$pb","conc_c":"$pc"}"""
          .getBytes("UTF-8"))
      assert(LakeCatalog.pathOf("conc_c").contains(pc))

      // a name dropped by this session must NOT be resurrected by the
      // merge from a stale disk map: it stays resolvable-nowhere and
      // the persisted file records it only as a tombstone, not a path
      LakeCatalog.drop(spark, "conc_a")
      LakeCatalog.register(spark, "conc_b", pb) // triggers another persist
      val disk2 = new String(java.nio.file.Files.readAllBytes(f), "UTF-8")
      assert(!disk2.contains(s""""conc_a":"$pa""""))
      assert(disk2.contains("conc_b"))
      assert(LakeCatalog.pathOf("conc_a").isEmpty)
      LakeCatalog.resetForTest()
      assert(LakeCatalog.pathOf("conc_a").isEmpty)
      ()
    }
  }

  test("cross-process drop defeats a live session's merge-on-persist") {
    withCatalogDir {
      LakeCatalog.resetForTest()
      val pa = tablePath("tomb-a")
      val pb = tablePath("tomb-b")
      LakeWriter.write(Seq(1L).toDF("id"), pa)
      LakeWriter.write(Seq(2L).toDF("id"), pb)
      // process A registers...
      LakeCatalog.register(spark, "tomb_a", pa)
      // ...process B drops it (tombstone persisted)...
      LakeCatalog.resetForTest()
      LakeCatalog.drop(spark, "tomb_a")
      // ...process A is STILL LIVE, holding its older registration in
      // memory; its next merge-on-persist must honor B's newer
      // tombstone instead of writing the name back
      LakeCatalog.resetForTest()
      LakeCatalog.seedForTest("tomb_a", pa,
        System.currentTimeMillis() - 60000)
      LakeCatalog.register(spark, "tomb_b", pb)
      assert(LakeCatalog.pathOf("tomb_a").isEmpty)
      LakeCatalog.resetForTest() // and the drop survived on disk
      assert(LakeCatalog.pathOf("tomb_a").isEmpty)
      assert(LakeCatalog.pathOf("tomb_b").contains(pb))
      // a re-registration NEWER than the tombstone wins again
      LakeCatalog.register(spark, "tomb_a", pa)
      LakeCatalog.resetForTest()
      assert(LakeCatalog.pathOf("tomb_a").contains(pa))
    }
  }

  test("drop beats a fast-clock peer's registration (monotonic stamps)") {
    withCatalogDir {
      LakeCatalog.resetForTest()
      val pa = tablePath("skew-a")
      LakeWriter.write(Seq(1L).toDF("id"), pa)
      // A peer whose clock runs an hour AHEAD registered the name; its
      // stamp is in this host's future. A drop stamped with the raw
      // local clock would lose the LWW merge and the name would
      // resurrect on the next load — stamps must be taken as
      // max(now, maxSeen + 1).
      val f = java.nio.file.Paths.get(
        sys.props("graft.catalog.dir"), "_graft_catalog.json")
      java.nio.file.Files.createDirectories(f.getParent)
      val future = System.currentTimeMillis() + 3600000L
      java.nio.file.Files.write(f,
        s"""{"tables":{"skew_a":"$pa"},"registeredAt":{"skew_a":$future},"dropped":{}}"""
          .getBytes("UTF-8"))
      assert(LakeCatalog.pathOf("skew_a").contains(pa))
      LakeCatalog.drop(spark, "skew_a")
      assert(LakeCatalog.pathOf("skew_a").isEmpty)
      // fresh session replaying the on-disk LWW state: drop still wins
      LakeCatalog.resetForTest()
      assert(LakeCatalog.pathOf("skew_a").isEmpty)
      // and a later re-registration (also stamped past the tombstone)
      // brings the name back
      LakeCatalog.register(spark, "skew_a", pa)
      LakeCatalog.resetForTest()
      assert(LakeCatalog.pathOf("skew_a").contains(pa))
      ()
    }
  }

  test("corrupt catalog file is backed up aside, never overwritten") {
    withCatalogDir {
      LakeCatalog.resetForTest()
      val f = java.nio.file.Paths.get(
        sys.props("graft.catalog.dir"), "_graft_catalog.json")
      java.nio.file.Files.createDirectories(f.getParent)
      java.nio.file.Files.write(f, "{ not json at all".getBytes("UTF-8"))
      val p = tablePath("cor-a")
      LakeWriter.write(Seq(1L).toDF("id"), p)
      LakeCatalog.register(spark, "cor_a", p) // must not throw
      // the unreadable file was preserved, byte-for-byte, as evidence
      val backup = f.resolveSibling("_graft_catalog.json.corrupt")
      assert(java.nio.file.Files.exists(backup))
      assert(new String(java.nio.file.Files.readAllBytes(backup), "UTF-8")
        .startsWith("{ not json"))
      // and the fresh catalog works
      assert(LakeCatalog.pathOf("cor_a").contains(p))
      LakeCatalog.resetForTest()
      assert(LakeCatalog.pathOf("cor_a").contains(p))
    }
  }

  test("stale entries (path no longer a lake table) are pruned on load") {
    withCatalogDir {
      LakeCatalog.resetForTest()
      val path = tablePath("ephemeral-t")
      LakeWriter.write(Seq(1L).toDF("id"), path)
      LakeCatalog.register(spark, "ephemeral_t", path)
      LakeWriter.deleteRecursively(java.nio.file.Paths.get(path))
      LakeCatalog.resetForTest()
      assert(LakeCatalog.pathOf("ephemeral_t").isEmpty)
      assert(!LakeCatalog.registeredNames.contains("ephemeral_t"))
    }
  }
}
