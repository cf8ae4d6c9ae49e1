package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator query: a Spark implementation plus (where
  * SQL-expressible) a semantically identical DuckDB oracle statement over the
  * same parquet tables.
  *
  * Cross-engine float determinism rules used throughout (so the driver's
  * hash compare is stable):
  *   - money-ish sums go through `DECIMAL` casts (exact, order-independent)
  *     and only then to `DOUBLE`;
  *   - per-row `+ - * / sqrt floor ceil abs` on identical inputs are
  *     IEEE-deterministic in both engines and need no rounding;
  *   - transcendentals (`ln`, `log10`, `exp`) and order-dependent double
  *     aggregates are wrapped in `round(_, n)`;
  *   - every query is totally ordered (unique tiebreak under any LIMIT).
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])
