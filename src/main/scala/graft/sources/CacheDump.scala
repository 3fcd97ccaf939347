package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Importer for the reference deployment's data-at-rest — the first thing
  * a migrating user loads (r9 verdict "What's missing" #2):
  *
  *  - the cache-dump tuple format (`sql/pvlist.txt`): one
  *    `(id,'pvname','type','value','cvalue',ts)` tuple per record, `;`
  *    after the last, MySQL backslash escapes inside the single-quoted
  *    strings (`\'` appears in production rows, e.g. sql/pvlist.txt:272)
  *    and LITERAL newlines inside values (sql/pvlist.txt:17-18) — records
  *    span lines, so no line- or regex-based splitter can parse this;
  *    [[parseTuples]] is a character-level scanner with quote state.
  *  - `pvarch save` output (pvarch.py:254-272): a mysqldump `.sql` of a
  *    run database. Its `INSERT INTO ... VALUES (...),(...);` bodies use
  *    the SAME tuple grammar, so [[parseInsertTuples]] reuses the scanner
  *    to recover a named table's rows from a dump.
  *
  * Scale note: a cache dump is CACHE-TABLE-sized — one row per archived PV
  * (3,671 in the reference's production dump), a dimension by
  * construction — so [[load]] parses on the driver and returns a
  * LocalRelation, the same convention as every dimension broadcast in the
  * repo. Corpus-sized history lives in run databases, whose replay path is
  * the JDBC source (streaming/Ingest.scala) or [[parseInsertTuples]] fed
  * per-file through a distributed text read when dumps are many.
  */
object CacheDump {

  /** One cache row as dumped: `ts` is epoch SECONDS (the reference's cache
    * table stores float seconds; the dump carries integers).
    */
  final case class CacheRow(id: Long, pvname: String, dtype: String,
      value: String, cvalue: String, ts: Long)

  /** All `(...)` tuples in `text`, each as a field vector; quoted fields
    * are unescaped (MySQL semantics: `\'` `\"` `\\` `\n` `\r` `\t` `\0`;
    * an unknown escaped char stays itself), unquoted `NULL` becomes null.
    * Tuple separators (`,` between tuples, terminating `;`, whitespace,
    * newlines) are skipped outside parens.
    */
  private[sources] def parseTuples(text: String): Vector[Vector[String]] = {
    val out = Vector.newBuilder[Vector[String]]
    var i = 0
    val n = text.length
    while (i < n) {
      if (text.charAt(i) == '(') {
        i += 1
        val fields = Vector.newBuilder[String]
        val cur = new StringBuilder
        var quoted = false   // current field was quoted (so "" is a value, not NULL)
        var inQ = false
        var done = false
        while (i < n && !done) {
          val c = text.charAt(i)
          if (inQ) {
            if (c == '\\' && i + 1 < n) {
              val e = text.charAt(i + 1)
              cur.append(e match {
                case 'n' => '\n'; case 'r' => '\r'; case 't' => '\t'
                case '0' => '\u0000'; case other => other
              })
              i += 2
            } else if (c == '\'') { inQ = false; i += 1 }
            else { cur.append(c); i += 1 }
          } else c match {
            case '\'' => inQ = true; quoted = true; i += 1
            case ',' =>
              fields += field(cur, quoted); cur.clear(); quoted = false; i += 1
            case ')' =>
              fields += field(cur, quoted); done = true; i += 1
            case other => cur.append(other); i += 1
          }
        }
        require(done, s"unterminated tuple at offset ${i - cur.length}")
        out += fields.result()
      } else i += 1 // inter-tuple separators: , ; whitespace
    }
    out.result()
  }

  private def field(sb: StringBuilder, quoted: Boolean): String = {
    val s = sb.toString
    if (quoted) s
    else if (s.trim == "NULL") null
    else s.trim
  }

  /** Parse a cache dump (the `sql/pvlist.txt` shape) into typed rows. */
  def parseCacheDump(text: String): Vector[CacheRow] =
    parseTuples(text).map { f =>
      require(f.length == 6,
        s"cache dump tuple has ${f.length} fields, expected 6: $f")
      CacheRow(f(0).toLong, f(1), f(2), f(3), f(4), f(5).toLong)
    }

  /** Rows of `INSERT INTO <table> ... VALUES (...),(...);` statements for
    * one table of a mysqldump (the `pvarch save` format). Matching is on
    * the statement header (backquoted or bare table name); everything
    * between `VALUES` and the closing `;` at paren-depth zero goes through
    * the same tuple scanner.
    */
  def parseInsertTuples(sql: String, table: String): Vector[Vector[String]] = {
    val header = ("(?i)INSERT\\s+INTO\\s+`?" +
      java.util.regex.Pattern.quote(table) +
      "(?![A-Za-z0-9_])`?[^;(]*VALUES\\s*").r // boundary: pv must not match pvextra
    header.findAllMatchIn(sql)
      .flatMap(m => parseTuples(statementBody(sql, m.end))).toVector
  }

  /** Statement body from `from` to the ';' that sits OUTSIDE quotes and
    * parens (values may contain both), or end of input.
    */
  private def statementBody(sql: String, from: Int): String = {
    var i = from
    var depth = 0
    var inQ = false
    val n = sql.length
    var end = -1
    while (i < n && end < 0) {
      val c = sql.charAt(i)
      if (inQ) {
        if (c == '\\') i += 1
        else if (c == '\'') inQ = false
      } else c match {
        case '\'' => inQ = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case ';' if depth == 0 => end = i
        case _ => ()
      }
      i += 1
    }
    sql.substring(from, if (end < 0) n else end)
  }

  private val AnyInsertRe =
    "(?i)INSERT\\s+INTO\\s+`?([A-Za-z0-9_]+)`?[^;(]*VALUES\\s*".r

  /** Every `(table, tuple)` of every INSERT statement in `sql` — the
    * multi-table face of [[parseInsertTuples]] for dump lines whose table
    * name is data (the run DB's 128 `pvdatNNN` shards).
    */
  def parseAllInsertTuples(sql: String): Vector[(String, Vector[String])] =
    AnyInsertRe.findAllMatchIn(sql).flatMap { m =>
      parseTuples(statementBody(sql, m.end)).map(m.group(1) -> _)
    }.toVector

  /** DISTRIBUTED run-DB dump reader — the corpus-sized half of the
    * migration path (`pvarch save` emits one mysqldump per run database;
    * years of archives are many such files). mysqldump escapes newlines
    * as `\n` INSIDE strings — unlike the cache dump's literal newlines —
    * so every INSERT statement is one text LINE and `spark.read.textFile`
    * distributes per statement: tuple parsing runs on executors,
    * partition-parallel, nothing corpus-sized touches the driver.
    *
    * Returns the engine's samples frame `(pvname, tsUs, value)`: the
    * `pvdatNNN` shard rows `(time, pv_id, value)` joined to the
    * dimension-sized `pv` table (broadcast) with float-second times
    * quantized to the engine's micros grid.
    */
  def loadRunDump(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val lines = spark.read.textFile(path)
    val pv = lines.flatMap { l =>
      parseInsertTuples(l, "pv").map(f => (f(0).toLong, f(1)))
    }.toDF("pv_id", "pvname")
    val dat = lines.flatMap { l =>
      parseAllInsertTuples(l).collect {
        case (t, f) if t.startsWith("pvdat") && f.length >= 3 =>
          (math.round(f(0).toDouble * 1e6), f(1).toLong, f(2))
      }
    }.toDF("tsUs", "pv_id", "value")
    dat.join(org.apache.spark.sql.functions.broadcast(pv), Seq("pv_id"))
      .select(org.apache.spark.sql.functions.col("pvname"),
        org.apache.spark.sql.functions.col("tsUs"),
        org.apache.spark.sql.functions.col("value"))
  }

  /** The run dump's `pv` dimension with the archiving config a migrating
    * deployment needs downstream (deadtime/deadband feed the T2
    * downsampler's PvConfig; data_table pins shard provenance).
    */
  def loadRunDumpPvMeta(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.textFile(path).flatMap { l =>
      // run-DB pv columns (schema.py:6-18): id, name, description,
      // data_table, deadtime, deadband, graph_hi, graph_lo, graph_type,
      // type, active
      parseInsertTuples(l, "pv").map { f =>
        (f(0).toLong, f(1), f(2), f(3),
          Option(f(4)).map(_.toDouble), Option(f(5)).map(_.toDouble),
          f(9), f(10))
      }
    }.toDF("id", "pvname", "description", "data_table",
      "deadtime", "deadband", "type", "active")
  }

  /** Load a cache dump file into a DataFrame
    * `(id, pvname, type, value, cvalue, ts)` — driver-parsed (the dump is
    * pv-dimension-sized; see the object scaladoc).
    */
  def load(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val text = try new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8) finally in.close()
    parseCacheDump(text)
      .toDF("id", "pvname", "dtype", "value", "cvalue", "ts")
      .withColumnRenamed("dtype", "type")
  }
}
