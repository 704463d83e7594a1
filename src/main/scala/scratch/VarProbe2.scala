import graft._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
object VarProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.builder("local[4]", 4).appName("vp2").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val df = Seq(
      """{"v":42}""", """{"v":3.14}""", """{"v":"hello"}""", """{"v":true}""",
      """{"v":false}""", """{"v":null}""", """{"v":[1,2,3]}""", """{"v":{"x":1}}""",
      """{"other":1}""", """NOT JSON"""
    ).toDF("doc")
    val v = try_variant_get(try_parse_json($"doc"), "$.v", "variant")
    df.select(
      $"doc",
      schema_of_variant(v).as("sv"),
      v.isNull.as("sqlnull"),
      is_variant_null(v).as("varnull"),
      v.try_cast(StringType).as("as_str"),
      v.try_cast(DoubleType).as("as_dbl"),
      v.try_cast(BooleanType).as("as_bool"),
      to_json(v).as("as_json")
    ).show(false)
    // array element access
    df.select(schema_of_variant(v).as("sv"),
      v.try_cast(ArrayType(VariantType)).as("arr")).where($"sv".startsWith("ARRAY")).show(false)
  }
}
