package graft.sources

import graft.SparkSpec

/** Golden parity against the reference deployment's ACTUAL production
  * cache dump (`/root/reference/sql/pvlist.txt`) — not a synthetic
  * fixture: the file's gnarly rows (embedded literal newlines at lines
  * 17-18, `\'` escapes at line 272, an id gap at 3661) are exactly what a
  * migrating user's dump contains.
  */
class CacheDumpSpec extends SparkSpec {

  private lazy val refDump = new String(
    java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/sql/pvlist.txt")),
    java.nio.charset.StandardCharsets.UTF_8)

  test("golden: the production pvlist dump parses completely") {
    val rows = CacheDump.parseCacheDump(refDump)
    assert(rows.length == 3671)
    // ids run 1..3672 with exactly one gap (3661 is absent from the file)
    assert(rows.map(_.id) == rows.map(_.id).sorted)
    assert(rows.head.id == 1L && rows.last.id == 3672L)
    assert((1L to 3672L).toSet -- rows.map(_.id).toSet == Set(3661L))
    // first and last records, field-exact
    assert(rows.head == CacheDump.CacheRow(1, "13BMA:cc1.VAL", "double",
      "1.1e-09", "1.1e-09", 1169524073L))
    assert(rows.last == CacheDump.CacheRow(3672, "13XRM:m6.SPMG", "enum",
      "3", "Go", 1169507665L))
    // embedded literal newline inside a quoted value (file lines 17-18)
    val r17 = rows.find(_.id == 17).get
    assert(r17.value == "Beamstops (BM-A) water")
    assert(r17.cvalue == "Beamstops\n(BM-A) water")
    // MySQL \' escape (file line 272)
    val r222 = rows.find(_.id == 222).get
    assert(r222.value == "Col. 99.1-105 ahu's" && r222.cvalue.contains("ahu's"))
    // empty quoted strings are values, not NULLs
    val r248 = rows.find(_.id == 248).get
    assert(r248.value == "" && r248.cvalue == "")
    // the dump's type vocabulary
    assert(rows.map(_.dtype).toSet ==
      Set("double", "string", "enum", "short", "char", "long"))
  }

  test("load: the dump becomes a typed LocalRelation frame") {
    val df = CacheDump.load(spark, "/root/reference/sql/pvlist.txt")
    assert(df.columns.toSeq == Seq("id", "pvname", "type", "value", "cvalue", "ts"))
    assert(df.count() == 3671L)
    // no corpus-shaped plan nodes: a dimension import stays a local relation
    val lint = graft.plans.PlanLint.lint(df)
    assert(!lint.exists(_.rule == "global-window"), lint.toString)
  }

  test("parseInsertTuples recovers mysqldump INSERT bodies (pvarch save)") {
    val dump =
      """-- MySQL dump 10.x
        |CREATE TABLE `pv` (`id` int, `name` varchar(64));
        |INSERT INTO `pv` VALUES (1,'X:a.VAL','double'),(2,'X:b;c','string');
        |INSERT INTO `other` VALUES (9,'nope');
        |INSERT INTO `pv` VALUES (3,'has '')'' paren','enum'),(4,NULL,'int');
        |""".stripMargin.replace("''", "\\'")
    val rows = CacheDump.parseInsertTuples(dump, "pv")
    assert(rows.length == 4)
    assert(rows(0) == Vector("1", "X:a.VAL", "double"))
    assert(rows(1)(1) == "X:b;c") // ';' inside quotes doesn't end the statement
    assert(rows(2)(1) == "has ')' paren") // escaped quotes + paren inside value
    assert(rows(3)(1) == null) // bare NULL
    assert(CacheDump.parseInsertTuples(dump, "missing").isEmpty)
  }

  test("loadRunDump: distributed mysqldump replay joins pvdat shards to the pv dimension") {
    val dump =
      """-- MySQL dump (pvarch save shape, schema.py:6-23)
        |CREATE TABLE `pv` (`id` int(10), `name` varchar(64));
        |INSERT INTO `pv` VALUES (1,'RD:a.VAL','motor a','pvdat001',10,1e-08,NULL,NULL,'normal','double','yes'),(2,'RD:b.DESC','desc b','pvdat002',30.5,0.25,'12','0','log','string','no');
        |CREATE TABLE `pvdat001` (time double, pv_id int, value varchar(4096));
        |INSERT INTO `pvdat001` VALUES (1169524073.25,1,'1.5'),(1169524083.5,1,'2.5');
        |INSERT INTO `pvdat001` VALUES (1169524093,1,'3.5');
        |INSERT INTO `pvdat002` VALUES (1169524073,2,'mo\'tor'),(1169524074,2,NULL);
        |INSERT INTO `other` VALUES (1169524073,1,'nope');
        |""".stripMargin
    val f = java.nio.file.Files.createTempDirectory("graft_rundump").resolve("run.sql")
    java.nio.file.Files.write(f, dump.getBytes("UTF-8"))
    val got = CacheDump.loadRunDump(spark, f.toString)
      .orderBy("pvname", "tsUs").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
    assert(got == Seq(
      ("RD:a.VAL", 1169524073250000L, "1.5"),
      ("RD:a.VAL", 1169524083500000L, "2.5"),
      ("RD:a.VAL", 1169524093000000L, "3.5"),
      ("RD:b.DESC", 1169524073000000L, "mo'tor"),
      ("RD:b.DESC", 1169524074000000L, null)))
    val meta = CacheDump.loadRunDumpPvMeta(spark, f.toString)
      .orderBy("id").collect()
    assert(meta.length == 2)
    assert(meta(0).getAs[String]("pvname") == "RD:a.VAL" &&
      meta(0).getAs[String]("data_table") == "pvdat001" &&
      meta(0).getAs[Double]("deadtime") == 10.0 &&
      meta(0).getAs[String]("type") == "double" &&
      meta(0).getAs[String]("active") == "yes")
    assert(meta(1).getAs[Double]("deadband") == 0.25 &&
      meta(1).getAs[String]("active") == "no")
    // the samples plan is distributed text + broadcast dimension join —
    // no global windows, no driver materialization of the data side
    val lint = graft.plans.PlanLint.lint(CacheDump.loadRunDump(spark, f.toString))
    assert(!lint.exists(f0 => f0.rule == "global-window" ||
      f0.rule == "driver-materialized-input"), lint.toString)
  }

  test("parseAllInsertTuples: per-statement bodies, duplicate tuples preserved") {
    val sql = "INSERT INTO `t1` VALUES (1,'a');INSERT INTO `t2` VALUES (2,'b'),(2,'b');" +
      "INSERT INTO `t1` VALUES (3,'c; not a terminator');"
    val got = CacheDump.parseAllInsertTuples(sql)
    assert(got == Vector(
      ("t1", Vector("1", "a")),
      ("t2", Vector("2", "b")), ("t2", Vector("2", "b")), // dup KEPT
      ("t1", Vector("3", "c; not a terminator"))))
  }

  test("scanner edge cases: escapes, NULL vs empty, unterminated input") {
    val t = CacheDump.parseTuples(
      "(1,'a\\nb','c\\\\d',NULL,'NULL','')")
    assert(t == Vector(Vector("1", "a\nb", "c\\d", null, "NULL", "")))
    intercept[IllegalArgumentException] {
      CacheDump.parseTuples("(1,'open")
    }
  }
}
