package graft
import org.apache.spark.sql.DataFrame

/** Honest benchmark forcing: execute the query's OWN physical plan
  * and count its rows.
  *
  * `df.count()` instead wraps the plan in a count aggregate that
  * Catalyst optimizes AROUND the query: column pruning drops every
  * computed column the count doesn't need, and a row-count-stable
  * LEFT JOIN (this repo's standard "ids LEFT JOIN per-id aggregate"
  * output idiom) is eliminated outright — caught in round 12, where
  * q_lm_score and q_dsir_weights "measured" 0.26 s under count()
  * while their optimized count plans were a bare parquet row count
  * (the entire scoring chain never ran; forcing the real plan costs
  * ~3 s). The same pruning silently skips aggregate VALUE expressions
  * (groupBy(k).agg(sum(x)).count() keeps the shuffle but drops the
  * sum) and the whole body of pure projections.
  *
  * `queryExecution.toRdd` executes the analyzed plan as written —
  * every output column of every row is computed — so timing this is
  * timing the operator. Row counts are unchanged vs count() (same
  * logical output), only the measured work is honest now.
  */
object Force {
  def force(df: DataFrame): Long = df.queryExecution.toRdd.count()
}
