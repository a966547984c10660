package graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.ParquetFileWriter
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.{BINARY, DOUBLE, INT64}

/** Test-only writer for a legacy-generation `events.parquet` whose `ts`
  * column carries a REAL parquet TIMESTAMP(NANOS, adjustedToUTC) footer
  * annotation — the shape the pre-r14 driver fixtures had. Spark itself
  * cannot produce this footer (it writes MICROS/MILLIS only), so the
  * loader's nanos branch would otherwise be testable only through a
  * plain-INT64 stand-in that skips the actual footer decode: this goes
  * through parquet-mr's low-level example API instead, giving the
  * genuine `PARQUET_TYPE_ILLEGAL`-unless-`nanosAsLong` read path a
  * permanent in-repo fixture source.
  */
object NanosEventsWriter {

  /** One events row in fixture column order; `tsNanos` is epoch nanos. */
  final case class Row(eventId: Long, tsNanos: Long, userId: Long,
                       eventType: String, value: Double, props: String)

  private val schema: MessageType = Types.buildMessage()
    .required(INT64).named("event_id")
    .required(INT64)
    .as(LogicalTypeAnnotation.timestampType(true, TimeUnit.NANOS))
    .named("ts")
    .required(INT64).named("user_id")
    .required(BINARY).as(LogicalTypeAnnotation.stringType()).named("event_type")
    .required(DOUBLE).named("value")
    .required(BINARY).as(LogicalTypeAnnotation.stringType()).named("props")
    .named("spark_schema")

  /** One orders row in fixture column order; `orderdateNanos` is epoch
    * nanos (the hypothetical NANOS-generation shape of `o_orderdate`). */
  final case class OrderRow(orderkey: Long, custkey: Long, status: String,
                            totalprice: Double, orderdateNanos: Long,
                            priority: String)

  private val ordersSchema: MessageType = Types.buildMessage()
    .required(INT64).named("o_orderkey")
    .required(INT64).named("o_custkey")
    .required(BINARY).as(LogicalTypeAnnotation.stringType()).named("o_orderstatus")
    .required(DOUBLE).named("o_totalprice")
    .required(INT64)
    .as(LogicalTypeAnnotation.timestampType(true, TimeUnit.NANOS))
    .named("o_orderdate")
    .required(BINARY).as(LogicalTypeAnnotation.stringType()).named("o_orderpriority")
    .named("spark_schema")

  /** Write an orders fixture whose `o_orderdate` carries a REAL
    * TIMESTAMP(NANOS) footer — pins `Tables.normalizeDateish`'s long
    * branch through the genuine footer-decode path (same rationale as
    * the events writer above). */
  def writeOrders(path: String, rows: Seq[OrderRow]): Unit = {
    val writer = ExampleParquetWriter.builder(new Path(path))
      .withConf(new Configuration())
      .withType(ordersSchema)
      .withWriteMode(ParquetFileWriter.Mode.OVERWRITE)
      .build()
    val factory = new SimpleGroupFactory(ordersSchema)
    try rows.foreach { r =>
      val g = factory.newGroup()
      g.add("o_orderkey", r.orderkey)
      g.add("o_custkey", r.custkey)
      g.add("o_orderstatus", r.status)
      g.add("o_totalprice", r.totalprice)
      g.add("o_orderdate", r.orderdateNanos)
      g.add("o_orderpriority", r.priority)
      writer.write(g)
    } finally writer.close()
  }

  /** Write `rows` to a single parquet FILE at `path` (matching the
    * fixtures' one-file-per-table layout). */
  def write(path: String, rows: Seq[Row]): Unit = {
    val writer = ExampleParquetWriter.builder(new Path(path))
      .withConf(new Configuration())
      .withType(schema)
      .withWriteMode(ParquetFileWriter.Mode.OVERWRITE)
      .build()
    val factory = new SimpleGroupFactory(schema)
    try rows.foreach { r =>
      val g = factory.newGroup()
      g.add("event_id", r.eventId)
      g.add("ts", r.tsNanos)
      g.add("user_id", r.userId)
      g.add("event_type", r.eventType)
      g.add("value", r.value)
      g.add("props", r.props)
      writer.write(g)
    } finally writer.close()
  }
}
