package graft.sources

import java.nio.file.{Files, Paths}

import scala.util.Random

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Cross-feature fuzz of the connector tiers (VERDICT r12 #7): every
  * tier is pinned individually (widening, ADD COLUMN DEFAULT, equality
  * deletes, branches, MoR row-level ops, vacuum/optimize), but
  * lakehouse formats historically break at PAIRWISE interactions —
  * a default read through a widened column, an equality-delete key on
  * a column that was INT when earlier rows were written, optimize
  * bin-packing files that straddle a schema evolution. This spec
  * drives seeded-random op SEQUENCES against one table and checks the
  * full table contents against an in-memory model after EVERY op, so
  * any semantic interaction bug surfaces at the op that caused it with
  * the full op log in the failure message.
  *
  * The model is deliberately naive (a Vector of rows + a Vector of
  * (name, type) columns): correctness here means "the lakehouse
  * machinery is invisible" — snapshots, DVs, equality-delete sidecars,
  * staged files, branches and file layout must never change WHAT the
  * table reads as.
  *
  * Branch episodes are atomic (fork → append → fast-forward → drop)
  * so the model never has to reason about divergent schemas on a live
  * branch; interactions between branches and DDL are covered by the
  * ops BEFORE and AFTER each episode.
  */
class LedgerFuzzSpec extends graft.SparkSpec {

  private val root = {
    val r = Files.createTempDirectory("graft_fuzz_cat").toString
    spark.conf.set("spark.sql.catalog.fuzz_cat",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.fuzz_cat.root", r)
    r
  }

  private def inMor[A](f: => A): A =
    graft.SparkSpec.rowLevelConfLock.synchronized {
      try { spark.conf.set("graft.ledger.rowLevelMode", "mor"); f }
      finally spark.conf.unset("graft.ledger.rowLevelMode")
    }

  // ---- the model ----

  // typ ∈ BIGINT|INT|DOUBLE|STRING; default tracks ADD COLUMN DEFAULT
  // state so the schema check can assert the CURRENT_DEFAULT metadata
  // (the capability INSERT materialization keys off) deliberately —
  // and require it to SURVIVE rename and INT→BIGINT widening
  private case class Col(name: String, typ: String,
      default: Option[Any] = None)

  private class Model(val table: String, val dir: java.nio.file.Path) {
    var cols: Vector[Col] = Vector(Col("k", "BIGINT"), Col("v", "BIGINT"))
    var rows: Vector[Vector[Any]] = Vector.empty
    var partitioned = false
    var nextKey = 0L
    var nextCol = 0
    val log = scala.collection.mutable.Buffer[String]()
    // version → (schema cols, row multiset) at the time the version
    // was current; last write wins (same version ⇒ same contents)
    val snaps = scala.collection.mutable.LinkedHashMap[
      Int, (Vector[Col], Vector[Vector[Any]])]()

    def keyName: String = cols.head.name
    def colIdx(name: String): Int = cols.indexWhere(_.name == name)

    def sparkType(t: String): DataType = t match {
      case "BIGINT" => LongType
      case "INT"    => IntegerType
      case "DOUBLE" => DoubleType
      case "STRING" => StringType
    }
    def schema: StructType =
      StructType(cols.map(c => StructField(c.name, sparkType(c.typ))))
  }

  private def freshModel(name: String): Model = {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS fuzz_cat.fz")
    spark.sql(s"DROP TABLE IF EXISTS fuzz_cat.fz.$name")
    spark.sql(s"CREATE TABLE fuzz_cat.fz.$name (k BIGINT, v BIGINT)")
    new Model(s"fuzz_cat.fz.$name", Paths.get(root, "fz", name))
  }

  // ---- value generation ----

  private def genValue(rnd: Random, typ: String, key: Long): Any = typ match {
    case "BIGINT" => rnd.nextInt(1000).toLong
    case "INT"    => rnd.nextInt(1000)
    case "DOUBLE" => rnd.nextInt(4000) / 4.0 // exact binary fractions
    case "STRING" =>
      if (rnd.nextInt(8) == 0) null
      else {
        val specials = Seq("a,b", "p%q", "x\ty", "emoji⭐", "plain")
        s"${specials(rnd.nextInt(specials.size))}_${rnd.nextInt(100)}"
      }
  }

  private def genRow(m: Model, rnd: Random, key: Long): Vector[Any] =
    key.asInstanceOf[Any] +: m.cols.tail.map(c => genValue(rnd, c.typ, key))

  private def genBatch(m: Model, rnd: Random, n: Int,
      uniqueOn: Seq[Int] = Nil): Vector[Vector[Any]] = {
    val existing = m.rows.map(_.head.asInstanceOf[Long])
    var batch = Vector.tabulate(n) { _ =>
      val key =
        if (existing.nonEmpty && rnd.nextBoolean())
          existing(rnd.nextInt(existing.size))
        else { m.nextKey += 1; m.nextKey }
      genRow(m, rnd, key)
    }
    if (uniqueOn.nonEmpty) // key-unique batches for upserts
      batch = batch.groupBy(r => uniqueOn.map(r(_))).map(_._2.head).toVector
    batch
  }

  private def df(m: Model, batch: Vector[Vector[Any]]) =
    spark.createDataFrame(
      java.util.Arrays.asList(batch.map(r => Row(r: _*)): _*), m.schema)

  // ---- the check ----

  private def check(m: Model, op: String): Unit = {
    m.log += op
    val got = spark.sql(s"SELECT * FROM ${m.table}").collect()
      .map(r => Vector.tabulate(r.length)(i => r.get(i)))
    val gotSchema = spark.table(m.table).schema
    // name/type/nullability equivalence, metadata aside — the catalog
    // deliberately decorates default-bearing fields (asserted next)
    val bare = StructType(gotSchema.map(f =>
      StructField(f.name, f.dataType, f.nullable)))
    assert(bare == m.schema,
      s"schema diverged after [$op]\n got: $gotSchema\nwant: ${m.schema}\n" +
        s"ops:\n  ${m.log.mkString("\n  ")}")
    gotSchema.zip(m.cols).foreach { case (f, c) =>
      assert(f.metadata.contains("CURRENT_DEFAULT") == c.default.isDefined,
        s"default metadata on ${f.name} diverged after [$op]: " +
          s"meta=${f.metadata} want default=${c.default}\n" +
          s"ops:\n  ${m.log.mkString("\n  ")}")
    }
    def counted(rs: Iterable[Vector[Any]]) =
      rs.groupBy(identity).map { case (k, v) => k -> v.size }
    val g = counted(got)
    val w = counted(m.rows)
    assert(g == w,
      s"contents diverged after [$op]\n extra=${(g.toSet -- w.toSet).take(5)}\n" +
        s" missing=${(w.toSet -- g.toSet).take(5)}\n" +
        s"ops:\n  ${m.log.mkString("\n  ")}")
    m.snaps(LedgerSink.currentVersion(m.dir)) = (m.cols, m.rows)
  }

  /** Snapshot immutability: every version that was ever current must
    * re-read EXACTLY its recorded state after all later ops — row-level
    * deletes (DV sidecars), file-rewriting OPTIMIZE, vacuum at both
    * horizons, schema evolution and branch traffic included. Each
    * version reads under ITS schema (id-based binding), so the
    * recorded column set is part of the pin. */
  private def checkTimeTravel(m: Model): Unit =
    m.snaps.foreach { case (v, (cols, rows)) =>
      val got = spark.sql(s"SELECT * FROM ${m.table} VERSION AS OF $v")
      assert(got.schema.fieldNames.toVector == cols.map(_.name),
        s"v$v schema names diverged: ${got.schema.fieldNames.toVector} " +
          s"vs ${cols.map(_.name)}\nops:\n  ${m.log.mkString("\n  ")}")
      val g = got.collect()
        .map(r => Vector.tabulate(r.length)(i => r.get(i)))
        .groupBy(identity).map { case (k, x) => k -> x.length }
      val w = rows.groupBy(identity).map { case (k, x) => k -> x.size }
      assert(g == w,
        s"v$v contents diverged after later ops\n" +
          s" extra=${(g.toSet -- w.toSet).take(5)}\n" +
          s" missing=${(w.toSet -- g.toSet).take(5)}\n" +
          s"ops:\n  ${m.log.mkString("\n  ")}")
    }

  // ---- ops ----

  private def opInsert(m: Model, rnd: Random): String = {
    val batch = genBatch(m, rnd, 1 + rnd.nextInt(8))
    df(m, batch).createOrReplaceTempView("fz_batch")
    spark.sql(s"INSERT INTO ${m.table} SELECT * FROM fz_batch")
    m.rows ++= batch
    s"insert ${batch.size}"
  }

  private def opDelete(m: Model, rnd: Random): String = {
    val mod = 2 + rnd.nextInt(4); val r = rnd.nextInt(mod)
    val mor = rnd.nextBoolean()
    val sql = s"DELETE FROM ${m.table} WHERE ${m.keyName} % $mod = $r"
    if (mor) inMor(spark.sql(sql)) else spark.sql(sql)
    m.rows = m.rows.filterNot(row => row.head.asInstanceOf[Long] % mod == r)
    s"delete k%$mod=$r mor=$mor"
  }

  private def opUpdate(m: Model, rnd: Random): String = {
    // bump a non-key integer column for a key slice
    val candidates = m.cols.zipWithIndex.tail
      .filter(c => c._1.typ == "BIGINT" || c._1.typ == "INT")
    if (candidates.isEmpty) return opInsert(m, rnd)
    val (c, ci) = candidates(rnd.nextInt(candidates.size))
    val mod = 2 + rnd.nextInt(3); val r = rnd.nextInt(mod)
    val mor = rnd.nextBoolean()
    val sql = s"UPDATE ${m.table} SET ${c.name} = ${c.name} + 3 " +
      s"WHERE ${m.keyName} % $mod = $r"
    if (mor) inMor(spark.sql(sql)) else spark.sql(sql)
    m.rows = m.rows.map { row =>
      if (row.head.asInstanceOf[Long] % mod == r)
        row.updated(ci, row(ci) match {
          case null      => null
          case l: Long   => l + 3L
          case i: Int    => i + 3
        })
      else row
    }
    s"update ${c.name}+=3 where k%$mod=$r mor=$mor"
  }

  private def opUpsert(m: Model, rnd: Random): String = {
    if (m.partitioned) return opInsert(m, rnd) // unpartitioned-only API
    // key on (k) usually; sometimes (k, c) with a non-double column —
    // the widened-column equality-delete-key composition lives here
    val extra = m.cols.zipWithIndex.tail
      .filter(c => c._1.typ == "BIGINT" || c._1.typ == "INT")
    val keyIdxs =
      if (extra.nonEmpty && rnd.nextInt(3) == 0) Seq(0, extra(rnd.nextInt(extra.size))._2)
      else Seq(0)
    val keyNames = keyIdxs.map(m.cols(_).name)
    val batch = genBatch(m, rnd, 2 + rnd.nextInt(6), uniqueOn = keyIdxs)
    LedgerMaintenance.upsertByKeys(spark, m.dir.toString, keyNames, df(m, batch))
    val batchKeys = batch.map(r => keyIdxs.map(r(_))).toSet
    m.rows = m.rows.filterNot(row => batchKeys(keyIdxs.map(row(_)))) ++ batch
    s"upsert keys=${keyNames.mkString(",")} n=${batch.size}"
  }

  private def opAddColumn(m: Model, rnd: Random): String = {
    val typ = Seq("BIGINT", "INT", "DOUBLE", "STRING")(rnd.nextInt(4))
    m.nextCol += 1
    val name = s"c${m.nextCol}"
    val withDefault = rnd.nextInt(3) != 0
    val default: Any =
      if (!withDefault) null
      else typ match {
        case "BIGINT" => 40L + m.nextCol
        case "INT"    => 70 + m.nextCol
        case "DOUBLE" => 1.25 * m.nextCol
        case "STRING" => s"dflt_${m.nextCol}"
      }
    val defaultSql = default match {
      case null      => ""
      case s: String => s" DEFAULT '$s'"
      case other     => s" DEFAULT $other"
    }
    spark.sql(s"ALTER TABLE ${m.table} ADD COLUMN $name $typ$defaultSql")
    m.cols :+= Col(name, typ, Option(default))
    m.rows = m.rows.map(_ :+ default)
    s"addcol $name $typ default=$default"
  }

  private def opWiden(m: Model, rnd: Random): String = {
    val ints = m.cols.zipWithIndex.filter(_._1.typ == "INT")
    if (ints.isEmpty) return opAddColumn(m, rnd)
    val (c, ci) = ints(rnd.nextInt(ints.size))
    spark.sql(s"ALTER TABLE ${m.table} ALTER COLUMN ${c.name} TYPE BIGINT")
    m.cols = m.cols.updated(ci, c.copy(typ = "BIGINT"))
    m.rows = m.rows.map(row => row.updated(ci, row(ci) match {
      case null   => null
      case i: Int => i.toLong
    }))
    s"widen ${c.name} INT->BIGINT"
  }

  private def opRename(m: Model, rnd: Random): String = {
    val ci = rnd.nextInt(m.cols.size)
    val c = m.cols(ci)
    m.nextCol += 1
    val name = s"r${m.nextCol}"
    spark.sql(s"ALTER TABLE ${m.table} RENAME COLUMN ${c.name} TO $name")
    m.cols = m.cols.updated(ci, c.copy(name = name))
    s"rename ${c.name}->$name"
  }

  private def opDropColumn(m: Model, rnd: Random): String = {
    if (m.cols.size <= 2) return opAddColumn(m, rnd)
    val ci = 1 + rnd.nextInt(m.cols.size - 1) // never the key
    val c = m.cols(ci)
    spark.sql(s"ALTER TABLE ${m.table} DROP COLUMN ${c.name}")
    m.cols = m.cols.patch(ci, Nil, 1)
    m.rows = m.rows.map(_.patch(ci, Nil, 1))
    s"dropcol ${c.name}"
  }

  private def opBranchEpisode(m: Model, rnd: Random): String = {
    val batch = genBatch(m, rnd, 1 + rnd.nextInt(5))
    LedgerRefs.createBranch(m.dir, "fzb")
    df(m, batch).write.format(classOf[LedgerSink].getName)
      .option("path", m.dir.toString).option("branch", "fzb")
      .mode("append").save()
    // the branch write is invisible on main until fast-forward
    assert(spark.sql(s"SELECT count(*) FROM ${m.table}").head.getLong(0)
      == m.rows.size, "branch write leaked onto main before ff")
    // fast-forward CONSUMES the branch (moves its logs onto main and
    // removes the ref) — a follow-up dropBranch must fail loud
    LedgerRefs.fastForward(m.dir, "fzb"): Unit
    intercept[IllegalArgumentException] {
      LedgerRefs.dropBranch(m.dir, "fzb")
    }
    m.rows ++= batch
    s"branch episode n=${batch.size}"
  }

  private def opMaintenance(m: Model, rnd: Random): String =
    rnd.nextInt(3) match {
      case 0 => LedgerSink.vacuum(m.dir, 0): Unit; "vacuum horizon=0"
      case 1 => LedgerSink.vacuum(m.dir): Unit; "vacuum default"
      case 2 =>
        val (bins, files) = LedgerMaintenance.optimize(spark, m.dir.toString)
        s"optimize bins=$bins files=$files"
    }

  private def opSpecEvolution(m: Model, rnd: Random): String = {
    if (m.partitioned) return opMaintenance(m, rnd)
    // partition by a bucket of the key: placement-only, rows unchanged
    LedgerMaintenance.alterPartitionSpec(m.dir.toString,
      Seq((m.keyName, "bucket", 4))): Unit
    m.partitioned = true
    s"spec evolution: bucket(4, ${m.keyName})"
  }

  // ---- the drive ----

  private def drive(seed: Long, nOps: Int): Unit = {
    val rnd = new Random(seed)
    val m = freshModel(s"t$seed")
    check(m, "create")
    (0 until nOps).foreach { i =>
      val roll = rnd.nextInt(100)
      val op =
        if (roll < 25) opInsert(m, rnd)
        else if (roll < 38) opDelete(m, rnd)
        else if (roll < 48) opUpdate(m, rnd)
        else if (roll < 62) opUpsert(m, rnd)
        else if (roll < 72) opAddColumn(m, rnd)
        else if (roll < 79) opWiden(m, rnd)
        else if (roll < 85) opRename(m, rnd)
        else if (roll < 89) opDropColumn(m, rnd)
        else if (roll < 95) opBranchEpisode(m, rnd)
        else if (roll < 98) opMaintenance(m, rnd)
        else opSpecEvolution(m, rnd)
      check(m, s"#$i $op")
    }
    checkTimeTravel(m)
    spark.sql(s"DROP TABLE fuzz_cat.fz.t$seed")
  }

  test("op-sequence fuzz, seed 1: model equivalence after every op") {
    drive(seed = 1L, nOps = 40)
  }

  test("op-sequence fuzz, seed 2: model equivalence after every op") {
    drive(seed = 2L, nOps = 40)
  }

  test("op-sequence fuzz, seed 3 (long): model equivalence + snapshot " +
      "immutability over a 60-op history") {
    drive(seed = 3L, nOps = 60)
  }
}
