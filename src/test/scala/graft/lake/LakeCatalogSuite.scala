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
