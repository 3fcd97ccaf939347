package graft

/** Every `SparkEntry.queries` entry must analyze, plan, AND execute against
  * the real testdata layout.
  *
  * This is the in-repo twin of the driver's Verify dump. Verify catches
  * per-query failures and logs them to stderr, so a query that stops
  * resolving doesn't fail a build — it just silently vanishes from the
  * round's CORRECTNESS surface (round 5 lost all 53 events-based queries
  * this way when the regenerated testdata changed `events.ts` from
  * TIMESTAMP(NANOS) to TIMESTAMP(MICROS)). Executing the whole surface here
  * makes `sbt test` the tripwire: an input-schema drift or a bad refactor
  * of a shared helper fails loudly, named per query.
  *
  * sf0.001 keeps the full sweep cheap; correctness of the VALUES stays the
  * oracle gate's job — this spec only demands "runs and returns a schema".
  */
class QuerySurfaceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("every query on the surface analyzes, plans, and executes on sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val df = fn(spark, dir)
        df.queryExecution.executedPlan // force analysis + physical planning
        df.limit(1).collect()          // force a real scan through the codecs
        None
      } catch {
        case e: Throwable => Some(s"$name: ${e.getClass.getSimpleName} ${String.valueOf(e.getMessage).take(200)}")
      }
    }
    assert(failures.isEmpty, s"${failures.size} queries failed:\n${failures.mkString("\n")}")
  }

  test("every query has an oracle (static or data-dependent) and vice versa") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet ++
      SparkEntry.dataDependentOracles(spark, dir).keySet
    assert((q -- o).isEmpty, s"queries with no oracle: ${(q -- o).toSeq.sorted.mkString(", ")}")
    assert((o -- q).isEmpty, s"oracles with no query: ${(o -- q).toSeq.sorted.mkString(", ")}")
  }
}
