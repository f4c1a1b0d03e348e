package graft

import graft.config.EntitySchema
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class EntitySchemaSpec extends AnyFunSuite {

  test("reference yaml parses into two entities with correct contract") {
    val schemas = EntitySchema.reference
    assert(schemas.map(_.entity) == Seq("vehicle", "operating_period"))
    val vehicle = schemas.head
    assert(vehicle.targetTable == "vehicle_location")
    assert(vehicle.keyColumns.map(_.srcPath) == Seq("data.id", "at"))
    assert(vehicle.columns.find(_.srcPath == "data.location.lat").get.dstName == "vehicle_latitude")
    val op = schemas(1)
    assert(op.targetTable == "operating_periods")
    assert(op.columns.find(_.srcPath == "data.start").get.sparkType == TimestampType)
  }

  test("closed type vocabulary: unknown type throws") {
    val bad = graft.config.ColumnSpec("x", "x", "geometry", isKey = false)
    assertThrows[IllegalArgumentException](bad.sparkType)
  }

  test("structFromPaths merges nested paths across entities") {
    val s = EntitySchema.structFromPaths(
      Seq("on", "data.id", "data.location.lat", "data.start", "at"))
    val data = s("data").dataType.asInstanceOf[StructType]
    assert(data.fieldNames.toSet == Set("id", "location", "start"))
    val loc = data("location").dataType.asInstanceOf[StructType]
    assert(loc.fieldNames.toSet == Set("lat"))
  }

  test("type mapping covers the full declared vocabulary") {
    val m = Map(
      "uuid" -> StringType, "varchar" -> StringType, "char" -> StringType,
      "string" -> StringType, "bigint" -> LongType, "int" -> IntegerType,
      "smallint" -> ShortType, "float" -> DoubleType, "decimal" -> DoubleType,
      "timestamp" -> TimestampType, "date" -> DateType, "bit" -> BooleanType)
    m.foreach { case (declared, expected) =>
      assert(graft.config.ColumnSpec("c", "c", declared, isKey = false).sparkType == expected)
    }
  }
}
