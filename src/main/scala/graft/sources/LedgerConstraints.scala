package graft.sources

import java.nio.file.Path

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.QueryPlanningTracker
import org.apache.spark.sql.catalyst.expressions.{BindReferences, EqualNullSafe, Expression, Literal}
import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
import org.apache.spark.sql.catalyst.plans.logical.{Filter => FilterPlan, LocalRelation}
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.types.{BooleanType, StructType}

/** CHECK constraints and NOT NULL enforcement for ledger tables — the
  * Delta invariants / constraints design at this format's scale: data
  * quality rules live in TABLE metadata and are enforced IN THE WRITE
  * PATH, distributed, on every ingest route (batch append/overwrite,
  * streaming epochs, copy-on-write and merge-on-read row-level
  * writes), so a table can promise `price_cents >= 0` to every reader
  * without a single post-hoc audit scan.
  *
  * Representation: one table property per constraint,
  * `graft.constraint.<name> = <boolean SQL expression>` — riding the
  * manifest's existing `#props` header means constraints version,
  * time-travel and survive overwrites exactly like any property, with
  * no format change.
  *
  * Semantics are SQL CHECK: a row violates only when the expression
  * evaluates to FALSE — NULL (unknown) passes, matching every SQL
  * engine and DuckDB's own CHECK. NOT NULL is the schema's own
  * nullability flag, enforced against the TABLE schema (an append
  * whose dataframe claims nullable while the table says NOT NULL is
  * exactly the case that must be caught).
  *
  * Mechanics: [[addCheck]] first validates EXISTING data with one
  * distributed scan (`WHERE NOT (expr)` — pruning and pushdown apply)
  * and refuses the constraint if any row violates; the property then
  * commits under the table lock. Writers resolve and BIND each
  * expression against the write schema on the driver (full Catalyst
  * analysis — functions, casts, the lot), ship the bound expression,
  * and evaluate per row executor-side via a compiled predicate
  * ([[violationPredicate]] wraps the condition in `<=> false` so the
  * null-passes rule survives codegen's null-to-false folding). A
  * violating row fails the TASK; the job aborts and the commit never
  * happens — the table is left exactly as before, which the
  * constraint gate pins by digest.
  *
  * Schema evolution: RENAME/DROP of a column a constraint references
  * is refused ([[referencesColumn]] — conservative word-boundary
  * match) until the constraint is dropped; the constraint text stores
  * column NAMES, and silently letting a rename orphan it would turn
  * the next append into an analysis error far from the cause.
  *
  * Reference trace: the reference pipeline's only data-quality gate is
  * `dropna` + ad-hoc filters inside each job (02_inventory_etl's
  * quantity >= 0 filter); a constraint is that same rule made a TABLE
  * fact instead of a per-job convention. */
object LedgerConstraints {

  val Prefix = "graft.constraint."

  /** (name, expression SQL) pairs, name-sorted for determinism. */
  def constraintsOf(props: Map[String, String]): Seq[(String, String)] =
    props.collect { case (k, v) if k.startsWith(Prefix) =>
      (k.stripPrefix(Prefix), v)
    }.toSeq.sortBy(_._1)

  /** Conservative "does this constraint mention column `col`": a
    * word-boundary match on the expression text. May over-match (a
    * string literal containing the name) — refusing a rename too
    * eagerly is safe; allowing one that orphans a constraint is not. */
  def referencesColumn(exprSql: String, col: String): Boolean =
    // word chars only in the boundary classes: a backtick DELIMITS an
    // identifier, so `col` must match (a backtick in the lookbehind
    // class would let backquoted references defeat the rename guard)
    ("""(?i)(?<![A-Za-z0-9_])""" + java.util.regex.Pattern.quote(col) +
      """(?![A-Za-z0-9_])""").r.findFirstIn(exprSql).isDefined

  /** Resolve `sql` against `schema` with the full Catalyst analyzer
    * (driver side) and bind its attribute references to row ordinals.
    * The bound expression is serializable — it ships to executors,
    * where [[violationPredicate]] compiles it. */
  private[sources] def bind(spark: SparkSession, schema: StructType,
      name: String, sql: String): Expression = {
    val attrs = DataTypeUtils.toAttributes(schema)
    val parsed =
      try CatalystSqlParser.parseExpression(sql)
      catch {
        case e: Exception => throw new IllegalArgumentException(
          s"constraint '$name' does not parse: $sql (${e.getMessage})")
      }
    val analyzed = spark.sessionState.analyzer.executeAndCheck(
      FilterPlan(parsed, LocalRelation(attrs)), new QueryPlanningTracker)
    val cond = analyzed.asInstanceOf[FilterPlan].condition
    if (cond.dataType != BooleanType) throw new IllegalArgumentException(
      s"constraint '$name' is not boolean: $sql")
    BindReferences.bindReference(cond, attrs)
  }

  /** The EXECUTOR-side shape: `bound <=> false` — true exactly when
    * the constraint evaluates to FALSE (violation), false on TRUE and
    * on NULL (SQL CHECK's null-passes rule), immune to BasePredicate's
    * null-to-false folding of the raw condition. */
  private[sources] def violationPredicate(bound: Expression): Expression =
    EqualNullSafe(bound, Literal(false))

  /** Everything a writer enforces, computed once on the driver:
    * bound violation expressions plus the write-schema ordinals of
    * table-NOT-NULL columns. Serializable — ships inside the writer
    * factory closure. */
  case class WriteChecks(
      constraints: Seq[(String, Expression)],
      notNull: Seq[(Int, String)]) extends Serializable {
    def isEmpty: Boolean = constraints.isEmpty && notNull.isEmpty
  }

  object WriteChecks {
    val empty: WriteChecks = WriteChecks(Seq.empty, Seq.empty)
  }

  /** Compute the checks a write against `writeSchema` must enforce,
    * given the table manifest the write binds against. A constraint
    * referencing a column the write schema lacks fails HERE, on the
    * driver, before any task runs — a narrower append simply cannot
    * prove the constraint. Truncate (overwrite) writes keep the
    * table's constraints (properties survive overwrite commits) but
    * take NOT NULL from the write schema, which is what now defines
    * the table. */
  private[sources] def writeChecks(manifest: Option[LedgerSink.Manifest],
      writeSchema: StructType, truncate: Boolean): WriteChecks = {
    val props = manifest.map(_.props).getOrElse(Map.empty)
    val cs = constraintsOf(props)
    val bound = if (cs.isEmpty) Seq.empty else {
      val spark = SparkSession.active
      cs.map { case (n, sql) =>
        (n, violationPredicate(bind(spark, writeSchema, n, sql)))
      }
    }
    val tableSchema =
      manifest.filter(_ => !truncate).map(_.schema).getOrElse(writeSchema)
    val notNull = writeSchema.fields.zipWithIndex.flatMap { case (f, i) =>
      val tf = tableSchema.fields.find(_.name == f.name).getOrElse(f)
      if (!tf.nullable) Some((i, f.name)) else None
    }.toSeq
    WriteChecks(bound, notNull)
  }

  /** Add constraint `name` = `exprSql` to the table: one distributed
    * validation scan over the CURRENT data (`WHERE NOT (expr)` —
    * fails with the violating-row count if any), then the property
    * commits under the table lock against the commit-time manifest
    * (an append landing mid-add is validated by the write path the
    * moment the property lands — writers read the manifest at factory
    * time under the same lock discipline as every commit). */
  def addCheck(spark: SparkSession, dirStr: String, name: String,
      exprSql: String): Unit = {
    require(name.nonEmpty && name.forall(c => c.isLetterOrDigit ||
      c == '-' || c == '_'), s"constraint name must be [A-Za-z0-9_-]+: $name")
    val dir = Path.of(dirStr)
    val m = LedgerSink.readManifest(dir).getOrElse(
      throw new IllegalArgumentException(s"no ledger table at $dirStr"))
    if (m.props.contains(Prefix + name)) throw new IllegalStateException(
      s"constraint '$name' already exists on $dirStr; drop it first")
    bind(spark, m.schema, name, exprSql): Unit // fail fast on nonsense
    val violations = spark.read.format(classOf[LedgerSink].getName)
      .option("path", dirStr).load()
      .where(s"NOT ($exprSql)").count()
    if (violations > 0) throw new IllegalStateException(
      s"cannot add constraint '$name' CHECK ($exprSql) on $dirStr: " +
        s"$violations existing row(s) violate it")
    // the validated STATE must still be current at commit time: a
    // commit landing between the validation scan and this property
    // commit carries rows the scan never saw (the write-side race is
    // closed symmetrically — writers conflict on constraint changes)
    val validated = m.files.map(e => (e.file, e.dv)).toSet
    LedgerSink.commitRebase(dir, {
      case None => throw new IllegalStateException(
        s"ledger table $dirStr was dropped while adding constraint '$name'")
      case Some(cur) =>
        if (cur.files.map(e => (e.file, e.dv)).toSet == validated)
          Some(cur.copy(props = cur.props + (Prefix + name -> exprSql)))
        else None
    }, s"addCheck('$name') on $dirStr raced a data commit its validation " +
      "scan never saw; re-run the add"): Unit
  }

  def dropCheck(dirStr: String, name: String): Unit =
    LedgerSink.commitRebase(Path.of(dirStr), {
      case None => throw new IllegalStateException(
        s"no ledger table at $dirStr")
      case Some(cur) =>
        require(cur.props.contains(Prefix + name),
          s"no constraint '$name' on $dirStr")
        Some(cur.copy(props = cur.props - (Prefix + name)))
    }, "unreachable: property commits always rebase"): Unit
}
