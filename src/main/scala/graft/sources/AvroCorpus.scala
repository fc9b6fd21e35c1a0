package graft.sources

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat, AvroKeyOutputFormat}
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Avro corpus source/sink — the fourth interchange family after
  * JSONL, TSV, and ORC, with the ROW-ORIENTED schema-evolution
  * failure mode: every Avro container file embeds its WRITER schema,
  * and the reader resolves it against an explicit READER schema at
  * open time. What breaks is neither syntax (containers are
  * schema-enforced, like ORC) nor column position — it is the
  * resolution contract itself:
  *
  *  - a reader-only field backfills from the reader field's DEFAULT
  *    (shards written before the field existed), and resolution FAILS
  *    LOUDLY at open if no default is declared — Avro's promotion of
  *    "what fills the gap" into the schema, where parquet/ORC silently
  *    pick NULL;
  *  - nullability is the union-null contract `["null", T]`: a lenient
  *    writer may put null where the pipeline contract requires a
  *    value, so the reader schema accepts the union and the pipeline
  *    quarantines NULL-in-required downstream — "resolves" is not
  *    "valid", the same split the text sources make for "parses".
  *
  * Scale shape: container files are block-compressed and SPLITTABLE on
  * their sync markers — [[AvroKeyInputFormat]] hands each task a sync
  * aligned slice, so a corpus landing as Avro parallelizes like any
  * text source (row-oriented: no column pruning — the conversion pass
  * to parquet/ORC is where scans start paying only for read columns).
  * There is no spark-avro DataSource on this classpath, so the
  * source speaks the public avro-mapred container protocol through
  * the Hadoop RDD API — the one genuinely per-partition-imperative
  * layer here — and surfaces plain DataFrames above it. */
object AvroCorpus {

  /** The documents-table contract as an Avro READER schema: every
    * field union-null (lenient writers exist; the pipeline, not the
    * format, enforces required-ness) with null defaults (pre-field
    * shards backfill instead of failing resolution). */
  val DocSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Spark → Avro schema for a FLAT struct: nullable fields become
    * `["null", T]` unions with a null default (the union-null
    * contract), so every field survives both a stricter writer (plain
    * `T` matches the union branch) and an evolving reader (the default
    * backfills). Flat only by design: corpus interchange rows are
    * flat; nested evolution belongs to the lakehouse formats. */
  def avroSchemaFor(st: StructType, name: String = "row"): Schema = {
    def base(dt: DataType): Schema.Type = dt match {
      case LongType => Schema.Type.LONG
      case IntegerType => Schema.Type.INT
      case DoubleType => Schema.Type.DOUBLE
      case FloatType => Schema.Type.FLOAT
      case BooleanType => Schema.Type.BOOLEAN
      case StringType => Schema.Type.STRING
      case BinaryType => Schema.Type.BYTES
      case other => throw new IllegalArgumentException(
        s"AvroCorpus is a flat-row interchange source; unsupported $other")
    }
    val fields = new java.util.ArrayList[Schema.Field]()
    st.fields.foreach { f =>
      val b = Schema.create(base(f.dataType))
      if (f.nullable)
        fields.add(new Schema.Field(f.name,
          Schema.createUnion(Schema.create(Schema.Type.NULL), b),
          null, Schema.Field.NULL_DEFAULT_VALUE))
      else fields.add(new Schema.Field(f.name, b, null))
    }
    Schema.createRecord(name, null, "graft", false, fields)
  }

  /** Avro → Spark schema (flat records; union-null unwraps to a
    * nullable field). */
  def sparkSchemaFor(avro: Schema): StructType = {
    def unwrap(s: Schema): (Schema, Boolean) =
      if (s.getType == Schema.Type.UNION) {
        val branches = s.getTypes
        val nonNull = new java.util.ArrayList[Schema]()
        branches.forEach(b =>
          if (b.getType != Schema.Type.NULL) nonNull.add(b))
        require(nonNull.size == 1,
          s"only union-null supported, got $s")
        (nonNull.get(0), nonNull.size < branches.size)
      } else (s, false)
    def dt(s: Schema): DataType = s.getType match {
      case Schema.Type.LONG => LongType
      case Schema.Type.INT => IntegerType
      case Schema.Type.DOUBLE => DoubleType
      case Schema.Type.FLOAT => FloatType
      case Schema.Type.BOOLEAN => BooleanType
      case Schema.Type.STRING => StringType
      case Schema.Type.BYTES => BinaryType
      case other => throw new IllegalArgumentException(
        s"unsupported avro type $other")
    }
    StructType(avro.getFields.toArray.map {
      case f: Schema.Field =>
        val (b, nullable) = unwrap(f.schema())
        StructField(f.name(), dt(b), nullable)
    })
  }

  /** Write `docs` as Avro container files under `path` (overwriting),
    * one splittable container per task. The writer schema is derived
    * from the frame — intentionally: evolution fixtures write OLD
    * schemas by dropping columns first, exactly how old shards came
    * to exist. */
  def write(docs: DataFrame, path: String): Unit = {
    val spark = docs.sparkSession
    val sparkSchema = docs.schema
    val schemaJson = avroSchemaFor(sparkSchema).toString
    val job = Job.getInstance(spark.sparkContext.hadoopConfiguration)
    AvroJob.setOutputKeySchema(job, new Schema.Parser().parse(schemaJson))
    val (fs, hp) = StoreFiles.fsOf(spark, path)
    if (fs.exists(hp)) fs.delete(hp, true) // overwrite, like the others
    val names = sparkSchema.fieldNames
    docs.rdd.mapPartitions { it =>
      // Schema is parsed per task, not shipped in the closure: JSON is
      // the portable form of an Avro schema across serializers
      val schema = new Schema.Parser().parse(schemaJson)
      it.map { row =>
        val rec = new GenericData.Record(schema)
        var i = 0
        while (i < names.length) {
          rec.put(names(i), row.get(i) match {
            // Avro's datum writer wants ByteBuffer for BYTES, not the
            // bare Array[Byte] Spark rows carry
            case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
            case v => v
          })
          i += 1
        }
        (new AvroKey[GenericRecord](rec), NullWritable.get())
      }
    }.saveAsNewAPIHadoopFile(path, classOf[AvroKey[GenericRecord]],
      classOf[NullWritable], classOf[AvroKeyOutputFormat[GenericRecord]],
      job.getConfiguration)
  }

  /** Read Avro directories under an explicit READER schema: each
    * container's embedded writer schema resolves against it per the
    * Avro spec — reader-only fields backfill from their declared
    * defaults, writer-only fields drop, union-null accepts lenient
    * writers. Resolution FAILURES (a reader-only field with no
    * default, incompatible types) abort at task start, not row 4
    * billion — the format's loud-contract property this source
    * deliberately keeps. */
  def read(spark: SparkSession, readerSchema: Schema,
      paths: String*): DataFrame = {
    val schemaJson = readerSchema.toString
    val sparkSchema = sparkSchemaFor(readerSchema)
    val names = sparkSchema.fieldNames
    val rdds = paths.map { p =>
      val job = Job.getInstance(spark.sparkContext.hadoopConfiguration)
      AvroJob.setInputKeySchema(job,
        new Schema.Parser().parse(schemaJson))
      spark.sparkContext.newAPIHadoopFile(p,
        classOf[AvroKeyInputFormat[GenericRecord]],
        classOf[AvroKey[GenericRecord]], classOf[NullWritable],
        job.getConfiguration)
    }
    val rows = spark.sparkContext.union(rdds.toSeq).mapPartitions { it =>
      it.map { case (k, _) =>
        // the record reader REUSES its datum across next() calls —
        // every value is copied out (Utf8 → String) before the
        // iterator advances, never referenced lazily
        val rec = k.datum()
        val vals = new Array[Any](names.length)
        var i = 0
        while (i < names.length) {
          vals(i) = rec.get(names(i)) match {
            case u: org.apache.avro.util.Utf8 => u.toString
            case b: java.nio.ByteBuffer =>
              val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
            case v => v
          }
          i += 1
        }
        Row.fromSeq(vals.toSeq)
      }
    }
    spark.createDataFrame(rows, sparkSchema)
  }

  /** Read document directories under the [[DocSchema]] contract →
    * (clean, quarantine): rows that RESOLVED but violate the contract
    * (null doc_id from a lenient union-null writer) quarantine with a
    * reason, the same "parses ≠ valid" split the text sources make. */
  def readDocs(spark: SparkSession,
      paths: String*): (DataFrame, DataFrame) = {
    val all = read(spark, avroSchemaFor(DocSchema), paths: _*)
    val clean = all.filter(col("doc_id").isNotNull)
    val quarantine = all.filter(col("doc_id").isNull)
      .select(to_json(struct(all.columns.map(col): _*)).as("raw_record"),
        lit("missing doc_id").as("motivo_rechazo"))
    (clean, quarantine)
  }

  /** Mixed-generation fixture mirroring
    * [[OrcCorpus.ensureEvolvedFixture]], plus the Avro-only shard: a
    * LEGACY generation written before `evolvedCol` existed (reader
    * default backfills it), a CURRENT full-schema generation, and a
    * LENIENT generation whose writer allowed null ids (one
    * contract-violating record the read quarantines). */
  def ensureEvolvedFixture(docs: DataFrame, path: String,
      evolvedCol: String, idCol: String = "doc_id"): Option[Double] =
    StoreFiles.markerGate(docs.sparkSession, path,
      s"""{"fmt":"avro","evolved":"$evolvedCol","id":"$idCol"}""") {
      val spark = docs.sparkSession
      write(docs.filter(col(idCol) % 2 === 0).drop(evolvedCol),
        s"$path/legacy")
      write(docs.filter(col(idCol) % 2 =!= 0), s"$path/current")
      // the lenient shard: full schema, but its one record has a null
      // id — written through the same union-null writer path
      write(spark.createDataFrame(
        java.util.List.of(
          Row(null, "record without an id", "en", "lenient", 20L)),
        DocSchema), s"$path/lenient")
    }
}
