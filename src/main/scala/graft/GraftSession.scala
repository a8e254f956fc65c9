package graft

/** Session bootstrap policies shared by every gate/bench session builder.
  *
  * These are SESSION-level decisions deliberately kept out of query
  * handlers: a handler that mutates shared session conf either leaks the
  * change to every later query (disabling guards it never meant to touch)
  * or — if it restores in a try/finally — silently loses the setting
  * before the lazily-executed frame ever runs, because Spark reads most
  * execution confs at execute time, not plan time.
  */
object GraftSession {
  /** Recursion valve for `sql_recursive` (UnionLoop). Spark's default
    * 1M-row guard is a runaway valve, not a semantic bound; the sf10 gate
    * walks 2M parts. 100M keeps the valve finite while clearing every
    * registered scale (the walk is one row per part, so this covers
    * ~sf500 before tripping).
    */
  val RecursionRowLimit: String = "100000000"
  val RecursionRowLimitKey: String = "spark.sql.cteRecursionRowLimit"
}
