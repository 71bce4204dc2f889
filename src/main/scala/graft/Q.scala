package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query: a Spark build function plus (when the semantics are
  * ANSI-SQL-expressible) an equivalent DuckDB oracle statement over the
  * same parquet tables. Column names/types must match the oracle exactly
  * (the verifier sorts columns by name before hashing values).
  *
  * @param headline included in the Bench headline set
  */
final case class Q(
    name: String,
    doc: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    headline: Boolean = false)

/** All queries the engine declares, from every module. */
object Registry {
  lazy val all: Seq[Q] =
    queries.Relational.all ++ queries.Relational2.all ++
      queries.TextOps.all ++ queries.SimilarityOps.all

  lazy val byName: Map[String, Q] = all.map(q => q.name -> q).toMap
}
