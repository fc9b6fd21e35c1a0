package graft

import graft.operators.{SyncEngine, SyncFixture}
import graft.sources.StateStore
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec

/** Storage layer: auto-create, atomic overwrite-merge cycle, append sinks,
  * month-partitioned layout with real partition pruning. */
class StateStoreSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("graft-store").toString

  test("S9 auto-create: missing path reads as empty typed state") {
    val df = StateStore.readOrCreate(spark, tmpDir() + "/state")
    assert(df.count() === 0)
    assert(df.schema === StateStore.StateSchema)
  }

  test("S5 overwrite-merge cycle: sync → overwrite → read → re-sync fixpoint") {
    val dir = tmpDir() + "/state"
    val source = SyncFixture.source(spark, sf0001)
    val state0 = StateStore.readOrCreate(spark, dir)
      .drop("okey") // fixture carries okey; schema does not
    val r1 = SyncEngine.run(source, state0,
      SyncFixture.WindowStart, SyncFixture.WindowEnd)
    StateStore.overwrite(
      r1.newState.select(StateStore.StateSchema.fieldNames.map(col): _*), dir)
    val state1 = StateStore.readOrCreate(spark, dir)
    val n1 = state1.count()
    assert(n1 === source.select("folio").distinct().count())

    val r2 = SyncEngine.run(source, state1,
      SyncFixture.WindowStart, SyncFixture.WindowEnd)
    val acts2 = r2.delta.select($"action").as[String].collect().toSet
    assert(acts2 === Set(graft.model.Actions.SinCambios))
    // overwrite again — still readable, same rows (atomic swap discipline)
    StateStore.overwrite(
      r2.newState.select(StateStore.StateSchema.fieldNames.map(col): _*), dir)
    assert(StateStore.readOrCreate(spark, dir).count() === n1)
  }

  test("S9 legacy migration: old path adopted, missing columns null-fill") {
    val base = tmpDir()
    val legacy = base + "/conciliacion_bancaria"
    val live = base + "/state"
    // a state written by an older deployment: pre-protected-zone columns
    // only, under the old directory name
    Seq(("TRANSFERENCIA", "F1", "2025-11-05", "cli", "srv", "BANCOMER", 9.5))
      .toDF("partition", "folio", "fecha", "cliente", "servicio", "banco",
        "monto")
      .withColumn("fecha", to_date($"fecha"))
      .write.parquet(legacy)

    val st = StateStore.readOrCreate(spark, live, StateStore.StateSchema,
      legacyPath = Some(legacy))
    assert(st.schema === StateStore.StateSchema)
    val row = st.collect().head
    assert(row.getAs[String]("folio") === "F1")
    assert(row.getAs[Double]("monto") === 9.5)
    StateStore.StateSchema.fieldNames
      .filterNot(Seq("partition", "folio", "fecha", "cliente", "servicio",
        "banco", "monto").contains)
      .foreach(c => assert(row.isNullAt(row.fieldIndex(c)), c))
    // the rename completed: legacy gone, live path serves plain reads now
    assert(!StateStore.exists(spark, legacy))
    assert(StateStore.exists(spark, live))
    assert(StateStore.readOrCreate(spark, live).count() === 1)
  }

  test("S7 append sink accumulates") {
    val dir = tmpDir() + "/audit"
    val rows = Seq(("F1", "ACTUALIZACIÓN", "d", "", "")).toDF(
      StateStore.AuditSchema.fieldNames: _*)
    StateStore.append(rows, dir)
    StateStore.append(rows, dir)
    assert(spark.read.parquet(dir).count() === 2)
  }

  test("S1 month layout: window read prunes partitions") {
    val dir = tmpDir() + "/sales"
    val sales = graft.operators.ScalarQueries.sales(spark, sf0001)
    StateStore.writeMonthPartitioned(sales, "fecha", dir)
    val windowed = StateStore.readWindow(spark, dir,
      "2001-06-01", "2001-08-01")

    // correctness: equals a plain filter over the unpartitioned data
    val expected = sales
      .filter($"fecha".between("2001-06-01", "2001-08-01")).count()
    assert(windowed.count() === expected)

    // pruning: the scan must touch only the 3 window months, not all ~80
    val scan = windowed.queryExecution.executedPlan.collectFirst {
      case s: FileSourceScanExec => s
    }.get
    assert(scan.relation.location.inputFiles.length > 3) // layout has many
    assert(scan.partitionFilters.nonEmpty)
  }
}
