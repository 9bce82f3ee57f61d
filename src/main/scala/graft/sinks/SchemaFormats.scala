package graft.sinks

import org.apache.spark.sql.types._

/** Schema-to-schema conversions for the stencil sink (reference:
  * plugins/sinks/stencil/stencil.go:120-148): a table's column schema →
  * JSON-Schema draft 2020-12, or → an Avro record schema. Pure driver-side
  * metadata transforms (schemas are KB-sized; no Spark job involved).
  */
object SchemaFormats {

  private def jsonEscape(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  /** Spark type → JSON-Schema type keyword (stencil.go JSON mapping). */
  def jsonSchemaType(dt: DataType): String = dt match {
    case _: ByteType | _: ShortType | _: IntegerType | _: LongType => "number"
    case _: FloatType | _: DoubleType | _: DecimalType => "number"
    case _: BooleanType => "boolean"
    case _: ArrayType => "array"
    case _: StructType | _: MapType => "object"
    case _ => "string"
  }

  /** Spark type → Avro primitive type (stencil.go Avro mapping). */
  def avroType(dt: DataType): String = dt match {
    case _: ByteType | _: ShortType | _: IntegerType => "int"
    case _: LongType => "long"
    case _: FloatType => "float"
    case _: DoubleType | _: DecimalType => "double"
    case _: BooleanType => "boolean"
    case _: BinaryType => "bytes"
    case _: ArrayType => "array"
    case _: StructType | _: MapType => "record"
    case _ => "string"
  }

  /** JSON-Schema draft 2020-12 document for a struct
    * (stencil.go:120-133).
    */
  def toJsonSchema(schema: StructType, id: String, description: String = ""): String = {
    val props = schema.fields.map { f =>
      val t =
        if (f.nullable) s"""["${jsonSchemaType(f.dataType)}", "null"]"""
        else s""""${jsonSchemaType(f.dataType)}""""
      s""""${jsonEscape(f.name)}": {"type": $t}"""
    }.mkString(", ")
    s"""{"$$schema": "https://json-schema.org/draft/2020-12/schema", """ +
      s""""$$id": "${jsonEscape(id)}", "description": "${jsonEscape(description)}", """ +
      s""""type": "object", "properties": {$props}}"""
  }

  /** Avro record schema document for a struct (stencil.go:136-148). */
  def toAvroSchema(schema: StructType, name: String): String = {
    val fields = schema.fields.map { f =>
      val t =
        if (f.nullable) s"""["null", "${avroType(f.dataType)}"]"""
        else s""""${avroType(f.dataType)}""""
      s"""{"name": "${jsonEscape(f.name)}", "type": $t}"""
    }.mkString(", ")
    s"""{"type": "record", "name": "${jsonEscape(name)}", "fields": [$fields]}"""
  }
}
