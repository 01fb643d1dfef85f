package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** neo4j-admin-style CSV import (S11 — the reference's Python helper,
  * python/pyimport.py:28-120, translated to a Spark CSV reader with a
  * header-dialect parser). Header fields look like
  * `personId:ID(Person)`, `:LABEL`, `age:int`, `vector:float[]`,
  * `:START_ID`, `:END_ID`, `:TYPE`; unknown types default to string
  * (pyimport.py FieldType.from_str falls back to STRING). Array values are
  * `;`-separated per the neo4j-admin format. Output is the canonical graph
  * schema (`ID, LABELS, props…` / `START_ID, END_ID, TYPE, props…`).
  *
  * Scale: this is a plain `spark.read.csv` with per-column casts — fully
  * parallel, schema applied at scan, no driver-side parsing beyond the
  * one-line header. */
object CsvGraphImport {

  sealed trait Role
  case object IdRole extends Role
  case object LabelRole extends Role
  case object StartIdRole extends Role
  case object EndIdRole extends Role
  case object TypeRole extends Role
  final case class PropRole(dataType: DataType, isArray: Boolean) extends Role

  final case class CsvField(name: String, raw: String, role: Role,
                            idSpace: Option[String])

  private val ScalarTypes: Map[String, DataType] = Map(
    "string" -> StringType, "short" -> ShortType, "int" -> IntegerType,
    "long" -> LongType, "float" -> FloatType, "double" -> DoubleType,
    "boolean" -> BooleanType, "byte" -> ByteType)

  /** Parse one `name:type(idspace)` header field. Empty name (`:LABEL`)
    * takes the type as its column name, matching pyimport's
    * `Field(name or _type, …)`. */
  def parseField(field: String, index: Int): CsvField = {
    val (name, typeSpec) = field.split(":", 2) match {
      case Array(n, t) => (n, t)
      case Array(n) => (n, "string")
    }
    val (bareType, idSpace) =
      if (typeSpec.contains("(") && typeSpec.endsWith(")")) {
        val Array(t, space) = typeSpec.dropRight(1).split("\\(", 2)
        (t, Some(space))
      } else (typeSpec, None)
    val colName = if (name.nonEmpty) name else bareType
    val role = bareType match {
      case "ID" => IdRole
      case "LABEL" => LabelRole
      case "START_ID" => StartIdRole
      case "END_ID" => EndIdRole
      case "TYPE" => TypeRole
      case t if t.endsWith("[]") =>
        PropRole(ScalarTypes.getOrElse(t.dropRight(2), StringType),
          isArray = true)
      case t =>
        PropRole(ScalarTypes.getOrElse(t, StringType), isArray = false)
    }
    CsvField(colName, s"_c$index", role, idSpace)
  }

  def parseHeader(header: String, delimiter: String = ","): Seq[CsvField] =
    header.split(java.util.regex.Pattern.quote(delimiter), -1).toSeq
      .zipWithIndex.map { case (f, i) => parseField(f.trim, i) }

  /** Let Spark's CSV reader consume the header per file (multi-file safe),
    * parse the dialect from the resulting column names, and rename the
    * columns positionally so dialect punctuation never needs escaping. */
  private def readRaw(spark: SparkSession, path: String,
                      delimiter: String): (Seq[CsvField], DataFrame) = {
    val raw = spark.read
      .option("header", "true").option("delimiter", delimiter)
      .csv(path)
    val fields = raw.columns.toSeq.zipWithIndex
      .map { case (h, i) => parseField(h.trim, i) }
    (fields, raw.toDF(fields.indices.map(i => s"_c$i"): _*))
  }

  private def propColumn(f: CsvField) = f.role match {
    case PropRole(dt, true) =>
      split(col(f.raw), ";").cast(ArrayType(dt)).as(f.name)
    case PropRole(dt, false) => col(f.raw).cast(dt).as(f.name)
    case _ => col(f.raw).as(f.name)
  }

  /** Node CSV → canonical `(ID long, LABELS array<string>, props…)`.
    * Multi-labels are `;`-separated in the LABEL column. */
  def readNodes(spark: SparkSession, path: String,
                delimiter: String = ","): DataFrame = {
    val (fields, data) = readRaw(spark, path, delimiter)
    val idField = fields.find(_.role == IdRole)
      .getOrElse(throw new IllegalArgumentException("node CSV needs an :ID"))
    val labelField = fields.find(_.role == LabelRole)
    val props = fields.collect { case f @ CsvField(_, _, PropRole(_, _), _) => f }
    val labels = labelField
      .map(f => split(col(f.raw), ";").as("LABELS"))
      .getOrElse(array().cast("array<string>").as("LABELS"))
    data.select(
      (col(idField.raw).cast(LongType).as("ID") +: labels +:
        props.map(propColumn)): _*)
  }

  /** Relationship CSV → canonical `(START_ID, END_ID, TYPE, props…)`. */
  def readRels(spark: SparkSession, path: String,
               delimiter: String = ","): DataFrame = {
    val (fields, data) = readRaw(spark, path, delimiter)
    def need(r: Role, what: String) = fields.find(_.role == r)
      .getOrElse(throw new IllegalArgumentException(s"rel CSV needs $what"))
    val start = need(StartIdRole, ":START_ID")
    val end = need(EndIdRole, ":END_ID")
    val typ = need(TypeRole, ":TYPE")
    val props = fields.collect { case f @ CsvField(_, _, PropRole(_, _), _) => f }
    data.select(
      (col(start.raw).cast(LongType).as("START_ID") +:
        col(end.raw).cast(LongType).as("END_ID") +:
        col(typ.raw).as("TYPE") +:
        props.map(propColumn)): _*)
  }
}
