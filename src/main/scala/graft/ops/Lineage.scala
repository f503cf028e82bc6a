package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Column-level lineage extraction — the data-governance introspection
  * every warehouse platform ships (impact analysis: "which source
  * columns feed this report column"): walk a query's ANALYZED logical
  * plan from its output attributes down to the base relations,
  * accumulating, per output column, the set of (source table, source
  * column) pairs it transitively references.
  *
  * The traversal is the general attribute-provenance fold: leaf
  * relations seed each attribute with its own (table, column); every
  * defining operator (Project / Aggregate / Window / Generate) maps its
  * new NamedExpressions to the union of their references' sources;
  * every other operator passes its children's map through (joins union
  * the two maps — exprIds are unique per relation instance, so there
  * are no collisions). Grouping/join/filter predicates are
  * deliberately NOT folded into output lineage — this extracts DATA
  * lineage (what values flow), not CONTROL lineage (what rows
  * survive), the standard distinction; a control-lineage variant is a
  * second fold over the same walk.
  *
  * Driver-side plan analysis only — nothing here touches data, so the
  * cost is independent of table size (the property that makes lineage
  * extraction viable over a 100 TB catalog: it reads plans, not
  * parquet). */
object Lineage {

  private def tableOf(lr: LogicalRelation): String = lr.relation match {
    case fs: HadoopFsRelation =>
      fs.location.rootPaths.headOption.map { p =>
        val name = p.getName
        if (name.endsWith(".parquet")) name.dropRight(8) else name
      }.getOrElse("<unknown>")
    case _ => "<unknown>"
  }

  /** exprId.id → source set, for every attribute the plan defines. */
  private def attrSources(p: LogicalPlan): Map[Long, Set[(String, String)]] = {
    val merged = p.children.map(attrSources)
      .foldLeft(Map.empty[Long, Set[(String, String)]])(_ ++ _)
    def refs(e: Expression): Set[(String, String)] =
      e.references.toSeq
        .flatMap(a => merged.getOrElse(a.exprId.id, Set.empty)).toSet
    def define(nes: Seq[NamedExpression]): Map[Long, Set[(String, String)]] =
      merged ++ nes.collect {
        case al: Alias => al.exprId.id -> refs(al.child)
      }
    p match {
      case lr: LogicalRelation =>
        val t = tableOf(lr)
        lr.output.map(a => a.exprId.id -> Set(t -> a.name)).toMap
      case lo: LocalRelation =>
        lo.output.map(a => a.exprId.id ->
          Set("<inline>" -> a.name)).toMap
      case pr: Project => define(pr.projectList)
      case ag: Aggregate => define(ag.aggregateExpressions)
      case w: Window => define(w.windowExpressions)
      case g: Generate =>
        merged ++ g.generatorOutput.map(a =>
          a.exprId.id -> refs(g.generator))
      case _ => merged
    }
  }

  /** Long-form lineage relation of `df`: one row per (output column,
    * source table, source column). */
  def of(spark: SparkSession, df: DataFrame): DataFrame = {
    import spark.implicits._
    val plan = df.queryExecution.analyzed
    val sources = attrSources(plan)
    val rows = plan.output.flatMap { a: Attribute =>
      val srcs = sources.getOrElse(a.exprId.id, Set.empty)
      if (srcs.isEmpty) Seq((a.name, "<none>", "<none>"))
      else srcs.toSeq.map { case (t, c) => (a.name, t, c) }
    }
    rows.toDF("out_column", "src_table", "src_column")
      .orderBy("out_column", "src_table", "src_column")
  }

  /** `rfm_column_lineage`: lineage of the RFM segmentation query —
    * a representative multi-stage plan (scan → agg → three windows →
    * case expression). The oracle is a CONTRACT: the expected
    * (out_column, src_table, src_column) rows as literals, derived by
    * reading [[graft.sql.Analytics.customerRfm]] once and pinned so
    * any refactor that silently changes what feeds a report column
    * fails the gate. (Unlike the recompute oracles, a literal oracle
    * can only catch drift, not derive truth — the honest scope of
    * lineage testing.) */
  def rfmLineage(spark: SparkSession, dir: String): DataFrame =
    of(spark, graft.sql.Analytics.customerRfm(spark, dir))

  /** The pinned contract. Notable honest edges: `n_orders` is a
    * count(*) — row-count lineage, no DATA source, reported as
    * `<none>`; the score columns carry the custkey tie-breaks their
    * window orders reference (a tie-break IS a data dependency of the
    * assigned tile). */
  val rfmLineageOracle: String =
    """SELECT * FROM (VALUES
        ('custkey', 'orders', 'o_custkey'),
        ('f_score', 'orders', 'o_custkey'),
        ('m_score', 'orders', 'o_custkey'),
        ('m_score', 'orders', 'o_totalprice'),
        ('monetary', 'orders', 'o_totalprice'),
        ('n_orders', '<none>', '<none>'),
        ('r_score', 'orders', 'o_custkey'),
        ('r_score', 'orders', 'o_orderdate'),
        ('recency_days', 'orders', 'o_orderdate'),
        ('segment', 'orders', 'o_custkey'),
        ('segment', 'orders', 'o_orderdate'),
        ('segment', 'orders', 'o_totalprice')
      ) AS t(out_column, src_table, src_column)
      ORDER BY out_column, src_table, src_column"""
}
