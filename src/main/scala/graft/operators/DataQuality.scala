package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality audit over a table (SURVEY.md §2.C/D0
  * extension) — the Deequ/dbt-test constraint battery a pipeline gates a
  * 100 TB ingest on: column completeness, predicate compliance, key
  * uniqueness, and referential integrity, each reported as one
  * (check_name, n_rows, violations, metric) row — `check`/`rows`
  * avoided as column names: both are reserved words in ANSI/DuckDB SQL,
  * and the audit frame must stay oracle-queryable verbatim.
  *
  * Scale shape, by check class:
  *  - Completeness + compliance checks — HOWEVER many — fold into ONE
  *    single-pass global aggregate (a `count(when(...))` per check inside
  *    one `agg`), then pivot to rows via an explode over a checks-sized
  *    literal array: one scan total, no shuffle beyond the partial/final
  *    agg, cost independent of the number of checks.
  *  - Uniqueness is one hash shuffle on the key columns (count per key,
  *    sum groups of size 1) — the same shape as exact dedup.
  *  - Referential integrity is one left-anti join per FK (broadcast when
  *    the dimension is small, AQE decides), counting orphans.
  *
  * The audit frame is data (like the LM/PCA model frames), so gating a
  * write on it is `audit.filter(metric < threshold).isEmpty` — a
  * driver-side decision over a checks-sized frame, never data-sized.
  */
object DataQuality {

  /** A named scan-level check: fraction of rows where `ok` holds.
    * Completeness is `Check(name, col.isNotNull)`; range/format compliance
    * is any boolean predicate over the row. */
  final case class Check(name: String, ok: Column)

  /** Run all scan-level checks in one pass: one row per check with the
    * total row count, violation count, and metric = passing fraction
    * (1.0 for an empty table — no row violates). */
  def audit(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "audit needs at least one check")
    val aggs = checks.zipWithIndex.map { case (c, i) =>
      count(when(!coalesce(c.ok, lit(false)), lit(1))).as(s"v$i")
    }
    val one = df.agg(count(lit(1)).as("rows"), aggs: _*)
    val rowsPerCheck = checks.zipWithIndex.map { case (c, i) =>
      struct(lit(c.name).as("check_name"), col("rows").as("n_rows"), col(s"v$i").as("violations"))
    }
    one
      .select(explode(array(rowsPerCheck: _*)).as("c"))
      .select(
        col("c.check_name").as("check_name"),
        col("c.n_rows").as("n_rows"),
        col("c.violations").as("violations"),
        round(
          when(col("c.n_rows") === 0, 1.0)
            .otherwise(lit(1.0) - col("c.violations").cast("double") / col("c.n_rows").cast("double")),
          6).as("metric"))
  }

  /** Key-uniqueness check: metric = fraction of rows whose key value
    * occurs exactly once (Deequ's UNIQUENESS); violations = rows sharing
    * their key with at least one other row. One shuffle on the key. */
  def uniqueness(df: DataFrame, name: String, keyCols: Seq[Column]): DataFrame =
    df.groupBy(keyCols: _*)
      .agg(count(lit(1)).as("n"))
      .agg(
        coalesce(sum(col("n")), lit(0L)).as("rows"),
        coalesce(sum(when(col("n") > 1, col("n")).otherwise(0L)), lit(0L)).as("violations"))
      .select(
        lit(name).as("check_name"),
        col("rows").cast("long").as("n_rows"),
        col("violations").cast("long").as("violations"),
        round(
          when(col("rows") === 0, 1.0)
            .otherwise(lit(1.0) - col("violations").cast("double") / col("rows").cast("double")),
          6).as("metric"))

  /** Referential-integrity check: violations = rows whose (non-null) FK
    * has no match in the dimension's PK column. One anti-join, broadcast
    * when the dimension is small. */
  def referential(df: DataFrame, name: String, fk: Column, dim: DataFrame, pk: Column): DataFrame =
    df.select(fk.as("__fk"))
      // LEFT OUTER against the distinct PK set: preserves every fact row
      // exactly once (the build side is unique), so one join yields both
      // the total and the orphan count — no scalar cross-join needed
      // (which would also trip the repo's no-cartesian plan guard).
      .join(dim.select(pk.as("__pk")).distinct(), col("__fk") === col("__pk"), "left_outer")
      .agg(
        count(lit(1)).as("rows"),
        count(when(col("__fk").isNotNull && col("__pk").isNull, lit(1))).as("violations"))
      .select(
        lit(name).as("check_name"),
        col("rows").as("n_rows"),
        col("violations"),
        round(
          when(col("rows") === 0, 1.0)
            .otherwise(lit(1.0) - col("violations").cast("double") / col("rows").cast("double")),
          6).as("metric"))
}
