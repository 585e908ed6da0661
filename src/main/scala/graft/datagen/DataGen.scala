package graft.datagen

import java.sql.Timestamp

import scala.util.Random

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Seeded reimplementation of the reference's data generators (SURVEY.md
  * §2.10) — they define the input contracts of the pipeline:
  *  - orders: reference generate_order.py (1-5 items/order, qty 1-3,
  *    unit_price U(10,500) 2dp, total_amount = round(Σ qty·price, 2),
  *    customer_id CUST-1000..4999 vs only 1000 real customers → ~75% of
  *    orders hit the COALESCE('bronze') path, timestamps in the last 60
  *    minutes, correlated city/state pairs, payment_status ∈
  *    {completed, pending, failed});
  *  - customers: generate_customers.py (CUST-1000.., tier ∈
  *    bronze/silver/gold, registration in last 365 days);
  *  - products: generate_product.py (PROD-1000.., price U(10,500),
  *    stock 0..1000).
  *
  * Deterministic: a fixed seed and a fixed base instant (the reference uses
  * wall-clock `datetime.now()`; tests need reproducibility, so "now" is an
  * explicit parameter). Data is built driver-side (these are test fixtures,
  * thousands of rows, not a distributed workload) and parallelized into a
  * DataFrame.
  */
object DataGen {

  case class Item(product_id: String, quantity: Long, unit_price: Double)
  case class Address(street: String, city: String, state: String,
                     zipcode: String, country: String)
  case class Order(order_id: String, customer_id: String,
                   order_timestamp: Timestamp, items: Seq[Item],
                   total_amount: Double, payment_status: String,
                   shipping_address: Address)
  case class Customer(customer_id: String, name: String, email: String,
                      registration_date: java.sql.Date, customer_tier: String)
  case class Product(product_id: String, product_name: String, category: String,
                     price: Double, stock_level: Long)

  /** Correlated city/state pairs — reference generate_order.py:32,43-44. */
  private val cityStates = Seq(
    ("New York", "NY"), ("Los Angeles", "CA"), ("Chicago", "IL"),
    ("Houston", "TX"), ("Phoenix", "AZ"), ("Portland", "OR"),
    ("Seattle", "WA"), ("Boston", "MA"), ("Columbus", "OH"))

  private val statuses = Seq("completed", "pending", "failed")
  private val tiers = Seq("bronze", "silver", "gold")
  private val categories = Seq("Electronics", "Clothing", "Home", "Sports", "Books")

  val defaultBaseMs: Long = 1767225600000L // 2026-01-01T00:00:00Z

  private def round2(x: Double): Double = math.round(x * 100.0) / 100.0

  /** A deterministic UUID-shaped id (the reference uses uuid4; tests need
    * stable ids, so bits come from the seeded rng).
    */
  private def pseudoUuid(rng: Random): String =
    new java.util.UUID(rng.nextLong(), rng.nextLong()).toString

  def orders(spark: SparkSession, n: Int = 50, seed: Long = 42L,
             baseMs: Long = defaultBaseMs): DataFrame = {
    import spark.implicits._
    val rng = new Random(seed)
    val rows = Seq.fill(n) {
      val items = Seq.fill(1 + rng.nextInt(5)) {
        Item(f"PROD-${1000 + rng.nextInt(9000)}",
          1L + rng.nextInt(3),
          round2(10 + rng.nextDouble() * 490))
      }
      val (city, state) = cityStates(rng.nextInt(cityStates.size))
      Order(
        pseudoUuid(rng),
        f"CUST-${1000 + rng.nextInt(4000)}",
        new Timestamp(baseMs - rng.nextInt(3600000)),
        items,
        round2(items.map(i => i.quantity * i.unit_price).sum),
        statuses(rng.nextInt(statuses.size)),
        Address(s"${1 + rng.nextInt(9999)} Main St", city, state,
          f"${10000 + rng.nextInt(89999)}%05d", "USA"))
    }
    rows.toDF()
  }

  def customers(spark: SparkSession, n: Int = 1000, seed: Long = 7L,
                baseMs: Long = defaultBaseMs): DataFrame = {
    import spark.implicits._
    val rng = new Random(seed)
    val rows = (0 until n).map { i =>
      val id = 1000 + i
      Customer(s"CUST-$id", s"Customer $id", s"customer$id@example.com",
        new java.sql.Date(baseMs - rng.nextInt(365) * 86400000L),
        tiers(rng.nextInt(tiers.size)))
    }
    rows.toDF()
  }

  def products(spark: SparkSession, n: Int = 100, seed: Long = 13L): DataFrame = {
    import spark.implicits._
    val rng = new Random(seed)
    val rows = (0 until n).map { i =>
      val id = 1000 + i
      Product(s"PROD-$id", s"Product $id",
        categories(rng.nextInt(categories.size)),
        round2(10 + rng.nextDouble() * 490),
        rng.nextInt(1001).toLong)
    }
    rows.toDF()
  }

  /** Write orders as NDJSON into a landing dir (the generator → landing
    * contract, reference README.md:217-229) for pipeline/streaming tests.
    */
  def writeOrdersNdjson(spark: SparkSession, dir: String, n: Int, seed: Long,
                        baseMs: Long = defaultBaseMs): Unit =
    orders(spark, n, seed, baseMs).coalesce(1).write.mode("append").json(dir)

  /** Write dims as header CSVs (the generator → landing contract of
    * generate_customers.py / generate_product.py) for daily-batch tests.
    */
  def writeCustomersCsv(spark: SparkSession, dir: String, n: Int, seed: Long): Unit =
    customers(spark, n, seed).coalesce(1)
      .write.option("header", "true").mode("overwrite").csv(dir)

  def writeProductsCsv(spark: SparkSession, dir: String, n: Int, seed: Long): Unit =
    products(spark, n, seed).coalesce(1)
      .write.option("header", "true").mode("overwrite").csv(dir)
}
