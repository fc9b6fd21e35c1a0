package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** ORC corpus source — the third interchange family after JSONL and
  * TSV, with the COLUMNAR failure mode: ORC files are schema-enforced
  * binaries, so rows cannot be syntactically malformed (JSONL's broken
  * braces) or token-drifted (TSV's shifted columns); what breaks
  * instead is SCHEMA DRIFT — shards written before a column existed.
  * The read contract makes that explicit: callers read with the
  * CURRENT schema and ORC's name-based evolution fills columns absent
  * from older shards with NULL (`spark.sql.orc.forcePositionalEvolution`
  * stays false — positional matching would silently misalign renamed
  * columns instead). Downstream treats NULL-in-required as the
  * quarantine signal, same role as the corrupt-record column in the
  * text formats.
  *
  * Scale: ORC stripes are splittable and carry min/max stats, so reads
  * parallelize and prune exactly like parquet — a corpus landing as
  * ORC needs no conversion pass before the pipeline consumes it. */
object OrcCorpus {

  /** Read ORC corpus directories under the caller's current schema;
    * shards predating a column yield NULL for it (name-based
    * evolution). */
  def read(spark: SparkSession, schema: StructType,
      paths: String*): DataFrame =
    spark.read.schema(schema).orc(paths: _*)

  /** Write `docs` as ORC under `path`. */
  def write(docs: DataFrame, path: String): Unit =
    docs.write.mode("overwrite").orc(path)

  /** Build the mixed-generation fixture the ingest query reads: a
    * LEGACY shard written before `evolvedCol` existed (the column is
    * dropped) and a CURRENT shard with the full schema, split by
    * even/odd id. Marker-gated like the other persisted fixtures. */
  def ensureEvolvedFixture(docs: DataFrame, path: String,
      evolvedCol: String, idCol: String = "doc_id"): Option[Double] = {
    val spark = docs.sparkSession
    val marker = s"$path/_built.json"
    val recipe = s"""{"evolved":"$evolvedCol","id":"$idCol"}"""
    if (readText(spark, marker).contains(recipe)) None
    else {
      val t0 = System.nanoTime()
      // each generation dir is overwritten in place; a stale marker is
      // replaced after both writes land (marker-last crash safety)
      docs.filter(col(idCol) % 2 === 0).drop(evolvedCol)
        .write.mode("overwrite").orc(s"$path/legacy")
      docs.filter(col(idCol) % 2 =!= 0)
        .write.mode("overwrite").orc(s"$path/current")
      writeText(spark, marker, recipe)
      Some((System.nanoTime() - t0) / 1e9)
    }
  }

  private def fsOf(spark: SparkSession, p: String) = {
    val hp = new org.apache.hadoop.fs.Path(p)
    (hp.getFileSystem(spark.sparkContext.hadoopConfiguration), hp)
  }

  private def writeText(spark: SparkSession, p: String,
      s: String): Unit = {
    val (fs, hp) = fsOf(spark, p)
    val out = fs.create(hp, true)
    try out.write(s.getBytes("UTF-8")) finally out.close()
  }

  private def readText(spark: SparkSession, p: String): Option[String] = {
    val (fs, hp) = fsOf(spark, p)
    if (!fs.exists(hp)) None
    else {
      val buf = new Array[Byte](fs.getFileStatus(hp).getLen.toInt)
      val in = fs.open(hp)
      try in.readFully(0, buf) finally in.close()
      Some(new String(buf, "UTF-8"))
    }
  }
}
