package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.functions.TextHash

/** DataSource V2 deterministic vector corpus — `spark.read.format
  * ("graft.sources.VectorGen").option("n",…).option("dim", …)` — the
  * connector-API form of the splitmix64 corpus ScaleProbe synthesizes
  * by hand. Exercises the full DSv2 read stack the engine-side way:
  *
  *   - SupportsPushDownFilters: vec_id range predicates narrow the
  *     GENERATED range — a filtered read never materializes skipped
  *     rows (the source-level analogue of parquet row-group pruning);
  *   - SupportsPushDownRequiredColumns: a count() or id-only scan
  *     never computes the 64-float vectors at all;
  *   - planInputPartitions splits the (already narrowed) id range
  *     into `partitions` even slices — embarrassingly parallel,
  *     deterministic, no driver state.
  *
  * Vector formula matches ScaleProbe: component i of row id is
  * (mix64(id·dim + i) >>> 11) / 2⁵³ · 2 − 1, float-cast; label =
  * id mod 10.
  */
object VectorGen {
  val FullSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType, nullable = false),
    StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = false),
    StructField("label", IntegerType, nullable = false)))

  def component(id: Long, dim: Int, i: Int): Float =
    ((TextHash.mix64(id * dim + i) >>> 11) / 9007199254740992.0 * 2.0 - 1.0).toFloat

  /** md5-basis component (`option("basis","md5")`): same [−1,1) mapping
    * but seeded by md5_number_lower("id:i") — the convention DuckDB
    * shares, so a generated corpus is reproducible in PURE SQL and the
    * source can be value-level oracle-graded (vectorgen_source). */
  def componentMd5(id: Long, i: Int): Float =
    ((TextHash.md5Lower64(s"$id:$i".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      >>> 11) / 9007199254740992.0 * 2.0 - 1.0).toFloat
}

class VectorGen extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = VectorGen.FullSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new VectorGenTable(
      properties.getOrDefault("n", "1000").toLong,
      properties.getOrDefault("dim", "64").toInt,
      properties.getOrDefault("partitions", "8").toInt,
      properties.getOrDefault("basis", "mix"))
}

class VectorGenTable(n: Long, dim: Int, partitions: Int, basis: String)
    extends Table with SupportsRead {
  override def name(): String = s"vectorgen(n=$n, dim=$dim, basis=$basis)"
  override def schema(): StructType = VectorGen.FullSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new VectorGenScanBuilder(n, dim, partitions, basis)
}

class VectorGenScanBuilder(n: Long, dim: Int, partitions: Int, basis: String = "mix")
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var lo = 0L
  private var hi = n
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = VectorGen.FullSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case LessThan("vec_id", v: Long) => hi = math.min(hi, v); true
      case LessThanOrEqual("vec_id", v: Long) => hi = math.min(hi, v + 1); true
      case GreaterThan("vec_id", v: Long) => lo = math.max(lo, v + 1); true
      case GreaterThanOrEqual("vec_id", v: Long) => lo = math.max(lo, v); true
      case _ => false
    }
    pushed = accepted
    rejected
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new VectorGenScan(lo, hi, dim, partitions, required, basis)
}

case class VectorGenInputPartition(start: Long, end: Long) extends InputPartition

class VectorGenScan(lo: Long, hi: Long, dim: Int, partitions: Int, required: StructType,
                    basis: String = "mix")
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"VectorGenScan [range=[$lo,$hi) dim=$dim cols=${required.fieldNames.mkString(",")}]"
  override def planInputPartitions(): Array[InputPartition] = {
    val total = math.max(0L, hi - lo)
    val per = math.max(1L, (total + partitions - 1) / partitions)
    (lo until hi by per).map(s => VectorGenInputPartition(s, math.min(hi, s + per))).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new VectorGenReaderFactory(dim, required.fieldNames, basis)
}

class VectorGenReaderFactory(dim: Int, cols: Array[String], basis: String = "mix")
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[VectorGenInputPartition]
    val md5 = basis == "md5"
    new PartitionReader[InternalRow] {
      private var cur = part.start - 1
      override def next(): Boolean = { cur += 1; cur < part.end }
      override def get(): InternalRow = {
        val vals = cols.map {
          case "vec_id" => cur: java.lang.Long
          case "label" => (cur % 10).toInt: java.lang.Integer
          case "embedding" =>
            new GenericArrayData(Array.tabulate(dim)(i =>
              if (md5) VectorGen.componentMd5(cur, i)
              else VectorGen.component(cur, dim, i)))
        }
        new GenericInternalRow(vals.asInstanceOf[Array[Any]])
      }
      override def close(): Unit = ()
    }
  }
}
