package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec

class PvListFileSpec extends SparkSpec {

  private def write(lines: String*): String = {
    val f = Files.createTempFile("graft_pvlist", ".txt")
    Files.writeString(f, lines.mkString("\n"))
    f.toString
  }

  test("pvNames: comments/blank lines skipped; same-line PVs share a line_id") {
    val path = write(
      "# a comment",
      "",
      "XX:m1.VAL, XX:m2.VAL",
      "YY:solo.VAL",
      "ZZ:a.VAL ZZ:b.VAL ZZ:c.VAL  # trailing comment")
    val rows = PvListFile.pvNames(spark, path)
      .collect().map(r => (r.getAs[Long]("line_id"), r.getAs[String]("pvname")))
    val byLine = rows.groupBy(_._1).values.map(_.map(_._2).toSet).toSet
    assert(byLine == Set(
      Set("XX:m1.VAL", "XX:m2.VAL"),
      Set("YY:solo.VAL"),
      Set("ZZ:a.VAL", "ZZ:b.VAL", "ZZ:c.VAL")))
  }

  test("pvNames feeds the pair graph: same-line PVs become edges (cache.py:529-564)") {
    val path = write("A B C", "A B", "D")
    val pvs = PvListFile.pvNames(spark, path)
    val edges = graft.operators.Pairs.coOccurrence(pvs, "line_id", "pvname")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(edges == Set(("A", "B", 2L), ("A", "C", 1L), ("B", "C", 1L)))
  }

  test("template: section/hr/space/row classification (web_utils.py:269-322)") {
    val path = write(
      "[Beamline Status]",
      "XX:m1.VAL | Motor 1 | %8.3f",
      "XX:s1.VAL,XX:s2.VAL | Shutters | yes/no",
      "--",
      "<>",
      "# comment dropped")
    val rows = PvListFile.template(spark, path).collect().sortBy(_.getAs[Long]("line_id"))
    assert(rows.map(_.getAs[String]("kind")).toSeq == Seq("section", "row", "row", "hr", "space"))
    assert(rows(0).getAs[String]("section") == "Beamline Status")
    assert(rows(1).getAs[scala.collection.Seq[String]]("pvnames").toSeq == Seq("XX:m1.VAL"))
    assert(rows(1).getAs[String]("description") == "Motor 1")
    assert(rows(1).getAs[String]("format") == "%8.3f")
    assert(rows(2).getAs[scala.collection.Seq[String]]("pvnames").toSeq == Seq("XX:s1.VAL", "XX:s2.VAL"))
  }

  test("render: tmpl2jinja row-emission parity (web_utils.py:283-322 golden)") {
    val path = write(
      "# header comment",
      "[Beamline Status]",
      "S13:m1, S13:m2 | Motors | yes/no",
      "S13:v1.RBV",
      "--",
      "<>",
      "XX:temp | ")
    val rows = PvListFile.render(spark, path).collect().sortBy(_.getAs[Long]("line_id"))
    def pvs(i: Int): Seq[(String, Boolean)] =
      rows(i).getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("pvs")
        .map(r => (r.getString(0), r.getBoolean(1))).toSeq

    assert(rows.map(_.getAs[String]("kind")).toSeq ==
      Seq("section", "row", "row", "hr", "space", "row"))
    assert(rows(0).getAs[String]("section") == "Beamline Status")
    // normalize_pvname appends .VAL; 'yes/no' marks every PV in the row
    assert(pvs(1) == Seq(("S13:m1.VAL", true), ("S13:m2.VAL", true)))
    assert(rows(1).getAs[String]("description") == "Motors")
    // a name with a field suffix stays; missing description falls back to
    // the comma-joined normalized names (the reference's desc=None path)
    assert(pvs(2) == Seq(("S13:v1.RBV", false)))
    assert(rows(2).getAs[String]("description") == "S13:v1.RBV")
    // empty-after-trim description (trailing '|') also falls back
    assert(pvs(5) == Seq(("XX:temp.VAL", false)))
    assert(rows(5).getAs[String]("description") == "XX:temp.VAL")
    // non-row kinds carry no pv payload
    assert(rows(3).isNullAt(rows(3).fieldIndex("pvs")) && rows(4).isNullAt(rows(4).fieldIndex("description")))
    // every row lands under the section opened by the last [header]
    // (web_utils.py:283-322 — rows accumulate into the open section)
    assert(rows.drop(1).forall(_.getAs[String]("section") == "Beamline Status"))
  }

  test("render: section carry-forward tracks header changes; preamble rows stay null") {
    val path = write(
      "PRE:pv1 | before any section",
      "[First]",
      "A:m1 | in first",
      "--",
      "[Second]",
      "B:m1 | in second",
      "B:m2 | also second")
    val rows = PvListFile.render(spark, path).collect().sortBy(_.getAs[Long]("line_id"))
    assert(rows.map(r => Option(r.getAs[String]("section"))).toSeq == Seq(
      None, Some("First"), Some("First"), Some("First"),
      Some("Second"), Some("Second"), Some("Second")))
  }
}
