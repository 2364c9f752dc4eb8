package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative DATA-QUALITY CONSTRAINT suite — the dbt-test/Deequ shape:
  * a rulebook of named predicates evaluated into one violations report
  * (rule, n_checked, n_violations, violation_rate) that a load gate can
  * threshold on. Complements the pipeline's inline DQ counters
  * ([[Profiling.withQualityCounters]], which rides a write): this is
  * the standalone audit pass over landed tables.
  *
  * Scale: ALL single-table rules over one frame fold into ONE wide
  * aggregate (one scan however many rules — each rule is a conditional
  * sum with map-side partials), unpivoted to rows with `stack`;
  * referential rules ([[fkOrphans]]) are LEFT ANTI equi-joins on the
  * key — the only shape that counts orphans without collecting either
  * side. Rates are exact integer ratios rounded once.
  */
object DqConstraints {

  /** Evaluate `rules` (name → violation predicate) over `df` in ONE
    * scan. Returns (rule, n_checked, n_violations, violation_rate). */
  def checkRules(df: DataFrame, rules: Seq[(String, Column)])
      : DataFrame = {
    require(rules.nonEmpty, "checkRules: empty rulebook")
    val aggs = count(lit(1)).as("__n") +: rules.zipWithIndex.map {
      case ((_, bad), i) =>
        sum(when(bad, 1L).otherwise(0L)).as(s"__v_$i")
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs: Seq[Column] = rules.zipWithIndex.flatMap {
      case ((nm, _), i) => Seq(lit(nm), col(s"__v_$i"))
    }
    wide.select(col("__n"),
        stack((lit(rules.length) +: stackArgs): _*)
          .as(Seq("rule", "n_violations")))
      .select(col("rule"), col("__n").as("n_checked"),
        col("n_violations"),
        round(col("n_violations") / col("__n").cast("double"), 9)
          .as("violation_rate"))
  }

  /** Referential-integrity rule: child rows whose `childKey` has no
    * match in `parent.parentKey` (NULL child keys are violations too —
    * a dangling FK either way). One LEFT ANTI join + two 1-row
    * aggregates. */
  def fkOrphans(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String, name: String): DataFrame = {
    val orphans = child.select(col(childKey))
      .join(parent.select(col(parentKey).as("__pk")),
        col(childKey) === col("__pk"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
    child.agg(count(lit(1)).as("n_checked"))
      .crossJoin(orphans)
      .select(lit(name).as("rule"), col("n_checked"),
        col("n_violations"),
        round(col("n_violations") / col("n_checked").cast("double"), 9)
          .as("violation_rate"))
  }
}
