package graft.schema

import org.apache.spark.sql.types._

/** The reference's relational schema (SURVEY.md §1.2), mapped per §1.3:
  * UUID→string(36 canonical), NUMERIC(12,2)→DecimalType(12,2), etc.
  * Final layer is explicitly typed; staging is schema-on-read all-string
  * (reference TablesCreated-Imported.sql:20-75 and 81-103).
  */
object AmazonFresh {

  // Typed entity API (SURVEY.md §1.3): case-class Encoders for the 6 final
  // tables give compile-time safety at the library surface; staging stays
  // DataFrame (schema-on-read).
  final case class Supplier(supplierid: String, suppliername: String,
      contactperson: Option[String], phone: Option[String],
      city: Option[String], state: Option[String])
  final case class Product(productid: String, productname: String,
      category: Option[String], subcategory: Option[String],
      priceperunit: Option[BigDecimal], stockquantity: Option[Int],
      supplierid: Option[String])
  final case class Customer(customerid: String, name: String,
      age: Option[Int], gender: Option[String], city: Option[String],
      state: Option[String], country: Option[String],
      signupdate: Option[java.sql.Date], primemember: Option[Boolean])
  final case class Order(orderid: String, customerid: Option[String],
      orderdate: Option[java.sql.Date], shipdate: Option[java.sql.Date],
      shipmode: Option[String], totalamount: Option[BigDecimal])
  final case class OrderDetail(orderdetailid: String, orderid: Option[String],
      productid: Option[String], quantity: Option[Int],
      unitprice: Option[BigDecimal], discount: Option[BigDecimal])
  final case class Review(reviewid: String, productid: Option[String],
      customerid: Option[String], rating: Option[Int],
      reviewtext: Option[String])

  private def s(n: String, nullable: Boolean = true) = StructField(n, StringType, nullable)

  val suppliers: StructType = StructType(Seq(
    s("supplierid", nullable = false),
    s("suppliername", nullable = false),
    s("contactperson"), s("phone"), s("city"), s("state")))

  val products: StructType = StructType(Seq(
    s("productid", nullable = false),
    s("productname", nullable = false),
    s("category"), s("subcategory"),
    StructField("priceperunit", DecimalType(12, 2)),
    StructField("stockquantity", IntegerType),
    s("supplierid")))

  val customers: StructType = StructType(Seq(
    s("customerid", nullable = false),
    s("name", nullable = false),
    StructField("age", IntegerType),
    s("gender"), s("city"), s("state"), s("country"),
    StructField("signupdate", DateType),
    StructField("primemember", BooleanType)))

  val orders: StructType = StructType(Seq(
    s("orderid", nullable = false),
    s("customerid"),
    StructField("orderdate", DateType),
    StructField("shipdate", DateType),
    s("shipmode"),
    StructField("totalamount", DecimalType(12, 2))))

  val orderDetails: StructType = StructType(Seq(
    s("orderdetailid", nullable = false),
    s("orderid"), s("productid"),
    StructField("quantity", IntegerType),
    StructField("unitprice", DecimalType(12, 2)),
    StructField("discount", DecimalType(5, 2))))

  val reviews: StructType = StructType(Seq(
    s("reviewid", nullable = false),
    s("productid"), s("customerid"),
    StructField("rating", IntegerType),
    s("reviewtext")))

  /** Task-12 dims (reference All-Tasks-of-SQL.sql:328-341). */
  val categories: StructType = StructType(Seq(
    s("categoryid", nullable = false), s("category", nullable = false)))
  val subcategories: StructType = StructType(Seq(
    s("subcategoryid", nullable = false), s("categoryid", nullable = false),
    s("subcategory", nullable = false)))

  /** All-string staging shape for an entity (CSV landing zone,
    * reference TablesCreated-Imported.sql:81-103). */
  def staging(finalSchema: StructType): StructType =
    StructType(finalSchema.fields.map(f => StructField(f.name, StringType, nullable = true)))
}
