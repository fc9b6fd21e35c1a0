package graft

import graft.operators.SyncFixture
import graft.sources.StateStore
import java.nio.file.Files
import java.time.LocalDate

/** App layer: the two reference entry points are one parameterized sync;
  * repeated nightly runs are state-idempotent. */
class SyncAppSpec extends SparkSpec {

  private def paths(): SyncApp.Paths = {
    val b = Files.createTempDirectory("graft-app").toString
    SyncApp.Paths(s"$b/state", s"$b/audit", s"$b/conflicts")
  }

  test("sincronizarRango validates and parses d/M/yyyy") {
    val p = paths()
    val src = SyncFixture.source(spark, sf0001)
    val r = SyncApp.sincronizarRango(src, p, "1/6/2001", "1/8/2001")
    assert(r.actions.getOrElse("NUEVO", 0L) > 0)
    intercept[IllegalArgumentException] {
      SyncApp.sincronizarRango(src, p, "2/8/2001", "1/8/2001")
    }
  }

  test("nightly rerun is state-idempotent") {
    val p = paths()
    val src = SyncFixture.source(spark, sf0001)
    val today = LocalDate.parse(SyncFixture.WindowEnd)
    val r1 = SyncApp.sincronizarConciliacion(src, p, today, lookbackDays = 61)
    val n1 = StateStore.readOrCreate(spark, p.state).count()
    val r2 = SyncApp.sincronizarConciliacion(src, p, today, lookbackDays = 61)
    val n2 = StateStore.readOrCreate(spark, p.state).count()
    assert(r1.actions.getOrElse("NUEVO", 0L) > 0)
    assert(r2.actions.getOrElse("NUEVO", 0L) === 0)
    assert(r2.actions.getOrElse("SIN_CAMBIOS", 0L) === n1)
    assert(n1 === n2)
    // all in-window rows were inserts (audit logs only updates/moves/
    // conflicts/deletes/duplicates — SyncEngineSpec covers those)
  }
}
