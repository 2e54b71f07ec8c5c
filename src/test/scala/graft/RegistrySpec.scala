package graft

/** Registry smoke: every registered query runs on sf0.001 and returns a
  * sane result; names are unique; oracle coverage stays high.
  */
class RegistrySpec extends SparkSpec {

  test("registry names are unique and non-empty") {
    val names = Registry.all.map(_.name)
    assert(names.nonEmpty && names.distinct.size == names.size)
  }

  test("every query runs on sf0.001 and returns rows") {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val failures = Await.result(
      Future.sequence(Registry.all.map { q =>
        Future {
          try {
            val n = q.run(spark, sf()).count()
            if (n > 0) None else Some(s"${q.name}: 0 rows")
          } catch {
            case e: Throwable => Some(s"${q.name}: ${e.getMessage}")
          }
        }
      }),
      Duration.Inf).flatten
    pool.shutdown()
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("entry() flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("EVERY query carries a DuckDB oracle (differential gate coverage is total)") {
    // Round 7 eliminated the rows-only class: hash-seed / float-order
    // specific operators register invariant-shaped outputs with literal
    // or exact-side oracles instead of opting out. A new query without an
    // oracle is a gate regression — make it an invariant query.
    val missing = Registry.all.filter(_.oracle.isEmpty).map(_.name)
    assert(missing.isEmpty, s"queries without oracle: ${missing.mkString(", ")}")
  }
}
