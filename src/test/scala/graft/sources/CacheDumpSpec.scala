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

  test("scanner edge cases: escapes, NULL vs empty, unterminated input") {
    val t = CacheDump.parseTuples(
      "(1,'a\\nb','c\\\\d',NULL,'NULL','')")
    assert(t == Vector(Vector("1", "a\nb", "c\\d", null, "NULL", "")))
    intercept[IllegalArgumentException] {
      CacheDump.parseTuples("(1,'open")
    }
  }
}
