package graft.store

import graft.SparkSpec

class VersionedSpec extends SparkSpec {

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft_versioned").toString

  test("append commits accumulate; time travel reads each snapshot") {
    val sp = spark
    import sp.implicits._
    val dir = tmpDir()
    val v1 = Versioned.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), dir)
    val v2 = Versioned.commit(Seq((3L, "c")).toDF("id", "s"), dir)
    assert(v1 == 1L && v2 == 2L)
    assert(Versioned.read(sp, dir, Some(1L)).collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L))
    assert(Versioned.read(sp, dir).collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 3L))
  }

  test("overwrite starts fresh but old versions stay readable until vacuumed") {
    val sp = spark
    import sp.implicits._
    val dir = tmpDir()
    Versioned.commit(Seq((1L, "a")).toDF("id", "s"), dir)
    Versioned.commit(Seq((9L, "z")).toDF("id", "s"), dir, mode = "overwrite")
    assert(Versioned.read(sp, dir).collect().map(_.getLong(0)).toSeq == Seq(9L))
    assert(Versioned.read(sp, dir, Some(1L)).collect().map(_.getLong(0)).toSeq == Seq(1L))
    // retain only the latest version: v1's files AND its manifest become
    // vacuum candidates (reaping the manifest makes v1 vanish from
    // versions() instead of resolving to missing parquet)
    val plan = Versioned.vacuumPlan(sp, dir, retainVersions = 1)
    assert(plan.nonEmpty &&
      plan.forall(n => n.startsWith("data-1/") || n == "manifest-1.json"), plan.toString)
    assert(plan.contains("manifest-1.json"), plan.toString)
    // retaining both versions reaps nothing
    assert(Versioned.vacuumPlan(sp, dir, retainVersions = 2).isEmpty)
  }

  test("compact merges micro-commit fragments; snapshots and vacuum cooperate") {
    val sp = spark
    import sp.implicits._
    val dir = tmpDir()
    // five 2-row micro-commits
    (0 until 5).foreach { i =>
      Versioned.commit(Seq((i * 2L, "x"), (i * 2L + 1, "x")).toDF("id", "s"),
        dir, mode = "append")
    }
    val before = Versioned.read(sp, dir)
    assert(before.count() == 10L)
    val v = Versioned.compact(sp, dir, targetRows = 10L)
    val after = Versioned.read(sp, dir)
    assert(after.count() == 10L)
    assert(after.collect().map(_.getLong(0)).sorted.toSeq == (0L until 10L))
    assert(after.inputFiles.length < before.inputFiles.length)
    // pre-compact snapshot still readable; vacuum to latest reaps fragments
    assert(Versioned.read(sp, dir, Some(v - 1)).count() == 10L)
    val reaped = Versioned.vacuumPlan(sp, dir, retainVersions = 1)
    assert(reaped.nonEmpty && reaped.forall(!_.startsWith(s"data-$v/")))
  }

  test("a torn manifest is invisible: readers only see renamed-in manifests") {
    val sp = spark
    import sp.implicits._
    val dir = tmpDir()
    Versioned.commit(Seq((1L, "a")).toDF("id", "s"), dir)
    // simulate a writer crash mid-commit: tmp manifest present, never renamed
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, ".manifest-99.json.tmp"), "[\n\"garbage\"\n]")
    assert(Versioned.versions(sp, dir) == Seq(1L))
    assert(Versioned.read(sp, dir).count() == 1L)
  }

  test("a stale tmp manifest from a crashed commit does not block the next commit") {
    val sp = spark
    import sp.implicits._
    val dir = tmpDir()
    Versioned.commit(Seq((1L, "a")).toDF("id", "s"), dir)
    // crash between tmp-create and rename: v2's tmp exists, v2 unpublished.
    // The next commit recomputes v=2 and must reclaim the tmp path.
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, ".manifest-2.json.tmp"), "[\n\"garbage\"\n]")
    val v2 = Versioned.commit(Seq((2L, "b")).toDF("id", "s"), dir)
    assert(v2 == 2L)
    assert(Versioned.read(sp, dir).collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
  }

  test("vacuum executed: reaped versions vanish; survivors read cleanly") {
    val sp = spark
    import sp.implicits._
    val dir = tmpDir()
    Versioned.commit(Seq((1L, "a")).toDF("id", "s"), dir)
    Versioned.commit(Seq((9L, "z")).toDF("id", "s"), dir, mode = "overwrite")
    val plan = Versioned.vacuumPlan(sp, dir, retainVersions = 1)
    plan.foreach(n => java.nio.file.Files.delete(java.nio.file.Paths.get(dir, n)))
    // v1 is gone from the version list — read(Some(1)) fails FAST on
    // version resolution, not mid-scan on missing parquet
    assert(Versioned.versions(sp, dir) == Seq(2L))
    intercept[IllegalArgumentException](Versioned.read(sp, dir, Some(1L)))
    assert(Versioned.read(sp, dir).collect().map(_.getLong(0)).toSeq == Seq(9L))
  }
}
