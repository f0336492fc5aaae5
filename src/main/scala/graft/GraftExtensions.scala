package graft

import org.apache.spark.sql.SparkSessionExtensions

/** The `spark.sql.extensions` entry point — the standard way a Spark
  * deployment adopts this library without code changes:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * registers every graft SQL function (signature kernels, bounded top-k /
  * KMV / quantile-sample / bloom aggregates, ADC scoring, murmur2) into
  * each new session's catalog, so `spark.sql("SELECT graft_simhash(...)")`
  * and the Thrift/JDBC surface see them natively. Programmatic users keep
  * the existing [[graft.functions.GraftFunctions.register]] path (invoked
  * idempotently by [[GraftSession.tune]] and the operators themselves);
  * both paths share one builder list so they cannot drift.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    graft.functions.GraftFunctions.injectInto(ext)
}
