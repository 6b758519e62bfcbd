package graft.lake

import graft.SparkSuite
import java.nio.file.Files

/** Protocol versioning + feature gating (Delta `protocol` analog):
  * tables declare the reader/writer versions and features their log
  * requires; an engine that does not implement them must refuse
  * loudly rather than misread.
  */
class LakeProtocolSuite extends SparkSuite {
  import spark.implicits._

  private def seed = Seq((1L, "a"), (2L, "b")).toDF("id", "k").coalesce(1)

  test("new tables declare protocol (1,1) at v0; DV tables (3,3)+feature") {
    val plain = tablePath("proto-plain")
    LakeWriter.write(seed, plain)
    val p0 = new LakeLog(plain).readVersion(0)
      .collectFirst { case p: Protocol => p }
    assert(p0 === Some(Protocol(1, 1)))
    val dv = tablePath("proto-dv")
    LakeWriter.write(seed, dv,
      properties = Map(LakeTable.PROP_ENABLE_DV -> "true"))
    val pdv = LakeTable.forPath(spark, dv).snapshot().protocol
    assert(pdv.minReaderVersion === 3 && pdv.minWriterVersion === 3)
    assert(pdv.readerFeatures === Seq(LakeProtocol.FEATURE_DELETION_VECTORS))
  }

  test("enabling DVs later ratchets the protocol in the same commit") {
    val path = tablePath("proto-ratchet")
    LakeWriter.write(seed, path)
    val t = LakeTable.forPath(spark, path)
    assert(t.snapshot().protocol === Protocol(1, 1))
    t.setTblProperties(Map(LakeTable.PROP_ENABLE_DV -> "true"))
    val p = LakeTable.forPath(spark, path).snapshot().protocol
    assert(p.minReaderVersion === 3)
    assert(p.writerFeatures === Seq(LakeProtocol.FEATURE_DELETION_VECTORS))
    // the protocol rode the SET TBLPROPERTIES commit itself
    val acts = new LakeLog(path).readVersion(1)
    assert(acts.exists(_.isInstanceOf[Protocol]))
  }

  test("a future reader protocol makes reads AND writes refuse loudly") {
    val path = tablePath("proto-future")
    LakeWriter.write(seed, path)
    val log = new LakeLog(path)
    log.commit(1L, Seq(
      Protocol(99, 99, Seq("timeTravelV2"), Seq("timeTravelV2")),
      CommitInfo(System.currentTimeMillis(), "UPGRADE", Map.empty)))
    Snapshot.clearCacheForTest()
    val eRead = intercept[IllegalStateException] {
      LakeTable.forPath(spark, path).toDF.count()
    }
    assert(eRead.getMessage.contains("reader protocol version 99"))
    val eWrite = intercept[IllegalStateException] {
      LakeWriter.write(seed, path)
    }
    assert(eWrite.getMessage.contains("99"))
  }

  test("unknown writer-only feature: reads fine, writes refuse") {
    val path = tablePath("proto-wfeature")
    LakeWriter.write(seed, path)
    val log = new LakeLog(path)
    log.commit(1L, Seq(
      Protocol(1, 3, Nil, Seq("managedCommitsV9")),
      CommitInfo(System.currentTimeMillis(), "UPGRADE", Map.empty)))
    Snapshot.clearCacheForTest()
    assert(LakeTable.forPath(spark, path).toDF.count() === 2)
    val e = intercept[IllegalStateException] {
      LakeTable.forPath(spark, path).delete("id = 1")
    }
    assert(e.getMessage.contains("managedCommitsV9"))
  }

  test("protocol survives checkpoints and clones") {
    val path = tablePath("proto-ckpt")
    LakeWriter.write(seed, path,
      properties = Map(LakeTable.PROP_ENABLE_DV -> "true"))
    // push past the checkpoint interval so a replay starts from the
    // checkpoint, then delete the pre-checkpoint version files: the
    // protocol must come from the checkpoint alone
    val t = LakeTable.forPath(spark, path)
    (1 to 10).foreach(i =>
      LakeWriter.write(Seq((10L + i, s"x$i")).toDF("id", "k")
        .coalesce(1), path))
    val log = new LakeLog(path)
    (0L to 5L).foreach(v => Files.delete(log.versionFile(v)))
    Snapshot.clearCacheForTest()
    val p = LakeTable.forPath(spark, path).snapshot().protocol
    assert(p.minReaderVersion === 3)
    // clones carry the source protocol
    val clone = tablePath("proto-clone")
    LakeTable.forPath(spark, path).shallowCloneTo(clone)
    assert(LakeTable.forPath(spark, clone).snapshot().protocol
      .minReaderVersion === 3)
  }
}
