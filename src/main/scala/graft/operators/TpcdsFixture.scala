package graft.operators

/** Generated-data fixture for the real-TPC-DS query family ([[Tpcds]]).
  *
  * Each entry in [[tableSql]] is ONE SQL text that parses and evaluates
  * identically in Spark SQL and DuckDB (probed constructs only: range(n)
  * with column alias, integer modular arithmetic, CAST AS STRING, date +
  * int days, lpad/substr/CASE, and DECIMAL built as integer-cents/100.0).
  * The Spark side materializes these as parquet ([[Tpcds.ensureTables]]);
  * the DuckDB oracle replays the SAME text as WITH-clauses — so both
  * engines query provably identical data with no file-path coupling, the
  * same fixture discipline as TESTDATA.md's seeded generators.
  *
  * Emitted from a dev harness that diffed every table and query across
  * both engines before this file was written; the shared texts are data,
  * not logic — [[Tpcds]] holds the executable surface.
  */
object TpcdsFixture {

  val tableSql: Map[String, String] = Map(
    "date_dim" ->
      """SELECT
  2450815 + i AS d_date_sk,
  'D' || lpad(CAST(i AS STRING), 8, '0') AS d_date_id,
  d_date,
  CAST(year(d_date) AS INT) AS d_year,
  CAST(month(d_date) AS INT) AS d_moy,
  CAST(day(d_date) AS INT) AS d_dom,
  CAST(quarter(d_date) AS INT) AS d_qoy,
  CAST((i + 4) % 7 AS INT) AS d_dow,
  CASE CAST(((i + 4) % 7) AS INT) WHEN 0 THEN 'Sunday' WHEN 1 THEN 'Monday' WHEN 2 THEN 'Tuesday' WHEN 3 THEN 'Wednesday' WHEN 4 THEN 'Thursday' WHEN 5 THEN 'Friday' ELSE 'Saturday' END AS d_day_name,
  CAST((year(d_date) - 1970) * 12 + month(d_date) - 1 AS INT) AS d_month_seq,
  CAST(floor((i + 4) / 7.0) AS INT) AS d_week_seq,
  CAST(year(d_date) * 10 + quarter(d_date) AS INT) AS d_quarter_seq,
  CASE WHEN (i + 4) % 7 IN (0, 6) THEN 'Y' ELSE 'N' END AS d_weekend
FROM (SELECT i, DATE '1998-01-01' + CAST(i AS INT) AS d_date FROM range(1826) t(i)) b""",
    "time_dim" ->
      """SELECT
  i AS t_time_sk,
  'T' || lpad(CAST(i AS STRING), 8, '0') AS t_time_id,
  CAST(i AS INT) AS t_time,
  CAST(floor(i / 3600.0) AS INT) AS t_hour,
  CAST(floor((i % 3600) / 60.0) AS INT) AS t_minute,
  CAST(i % 60 AS INT) AS t_second,
  CASE WHEN i < 43200 THEN 'AM' ELSE 'PM' END AS t_am_pm,
  CASE WHEN floor(i / 3600.0) < 8 THEN 'third' WHEN floor(i / 3600.0) < 16 THEN 'first' ELSE 'second' END AS t_shift
FROM range(86400) t(i)""",
    "item" ->
      """SELECT
  i + 1 AS i_item_sk,
  'AAAAAAAA' || lpad(CAST(i AS STRING), 8, '0') AS i_item_id,
  'item description nr ' || CAST(i AS STRING) AS i_item_desc,
  CAST(((i * 73) % 9900 + 100) / 100.0 AS DECIMAL(7,2)) AS i_current_price,
  CAST(((i * 41) % 5000 + 50) / 100.0 AS DECIMAL(7,2)) AS i_wholesale_cost,
  CAST(1000000 + (i * 7919) % 1000 AS INT) AS i_brand_id,
  'Brand#' || CAST((i * 7919) % 1000 AS STRING) AS i_brand,
  CAST(1 + (i * 13) % 16 AS INT) AS i_class_id,
  'class' || CAST((i * 13) % 16 AS STRING) AS i_class,
  CAST(1 + (i * 11) % 10 AS INT) AS i_category_id,
  CASE CAST(((i * 11) % 10) AS INT) WHEN 0 THEN 'Books' WHEN 1 THEN 'Children' WHEN 2 THEN 'Electronics' WHEN 3 THEN 'Home' WHEN 4 THEN 'Jewelry' WHEN 5 THEN 'Men' WHEN 6 THEN 'Music' WHEN 7 THEN 'Shoes' WHEN 8 THEN 'Sports' ELSE 'Women' END AS i_category,
  CAST(1 + (i * 17) % 100 AS INT) AS i_manufact_id,
  'manu' || CAST((i * 17) % 100 AS STRING) AS i_manufact,
  CAST(1 + (i * 19) % 100 AS INT) AS i_manager_id,
  'product name ' || lpad(CAST(i AS STRING), 6, '0') AS i_product_name,
  'size' || CAST(i % 7 AS STRING) AS i_size,
  'color' || CAST(i % 13 AS STRING) AS i_color,
  'unit' || CAST(i % 5 AS STRING) AS i_units
FROM range(2000) t(i)""",
    "store" ->
      """SELECT
  i + 1 AS s_store_sk,
  'S' || lpad(CAST(i AS STRING), 8, '0') AS s_store_id,
  'store' || CAST(i AS STRING) AS s_store_name,
  CAST(100 + (i * 37) % 200 AS INT) AS s_number_employees,
  CAST(5000000 + (i * 911) % 5000000 AS INT) AS s_floor_space,
  '8AM-8PM' AS s_hours,
  'manager ' || CAST(i AS STRING) AS s_manager,
  CAST(1 + i % 10 AS INT) AS s_market_id,
  'city' || CAST(i % 6 AS STRING) AS s_city,
  'county' || CAST(i % 4 AS STRING) AS s_county,
  CASE CAST(i % 5 AS INT) WHEN 0 THEN 'TN' WHEN 1 THEN 'SC' WHEN 2 THEN 'CA' WHEN 3 THEN 'TX' ELSE 'OH' END AS s_state,
  lpad(CAST(10000 + ((i * 90) % 500) * 137 AS STRING), 5, '0') AS s_zip,
  'United States' AS s_country,
  CAST(1 + i % 2 AS INT) AS s_company_id,
  CAST((-500) / 100.0 AS DECIMAL(5,2)) AS s_gmt_offset,
  CAST(((i * 7) % 11) / 100.0 AS DECIMAL(5,2)) AS s_tax_precentage
FROM range(12) t(i)""",
    "customer" ->
      """SELECT
  i + 1 AS c_customer_sk,
  'CUSTOMER' || lpad(CAST(i AS STRING), 8, '0') AS c_customer_id,
  CAST(1 + (i * 101) % 7200 AS BIGINT) AS c_current_cdemo_sk,
  CAST(1 + (i * 103) % 720 AS BIGINT) AS c_current_hdemo_sk,
  CAST(1 + (i * 107) % 2500 AS BIGINT) AS c_current_addr_sk,
  CASE CAST(i % 6 AS INT) WHEN 0 THEN 'Mr.' WHEN 1 THEN 'Mrs.' WHEN 2 THEN 'Ms.' WHEN 3 THEN 'Dr.' WHEN 4 THEN 'Miss' ELSE 'Sir' END AS c_salutation,
  'first' || CAST(i % 500 AS STRING) AS c_first_name,
  'last' || CAST(i % 700 AS STRING) AS c_last_name,
  CASE CAST(i % 3 AS INT) WHEN 0 THEN 'Y' ELSE 'N' END AS c_preferred_cust_flag,
  CAST(1 + (i * 3) % 28 AS INT) AS c_birth_day,
  CAST(1 + (i * 5) % 12 AS INT) AS c_birth_month,
  CAST(1924 + (i * 7) % 70 AS INT) AS c_birth_year,
  'country' || CAST(i % 40 AS STRING) AS c_birth_country,
  'login' || CAST(i AS STRING) AS c_login,
  'c' || CAST(i AS STRING) || '@example.com' AS c_email_address,
  2450815 + (i * 11) % 1826 AS c_first_sales_date_sk,
  2450815 + (i * 13) % 1826 AS c_first_shipto_date_sk
FROM range(5000) t(i)""",
    "customer_address" ->
      """SELECT
  i + 1 AS ca_address_sk,
  'ADDR' || lpad(CAST(i AS STRING), 8, '0') AS ca_address_id,
  CAST(1 + (i * 7) % 999 AS STRING) AS ca_street_number,
  'street' || CAST(i % 300 AS STRING) AS ca_street_name,
  'Suite ' || CAST(i % 100 AS STRING) AS ca_suite_number,
  'city' || CAST((i * 3) % 200 AS STRING) AS ca_city,
  'county' || CAST(i % 50 AS STRING) AS ca_county,
  CASE CAST(i % 10 AS INT) WHEN 0 THEN 'CA' WHEN 1 THEN 'WA' WHEN 2 THEN 'GA' WHEN 3 THEN 'TX' WHEN 4 THEN 'OH' WHEN 5 THEN 'TN' WHEN 6 THEN 'NY' WHEN 7 THEN 'FL' WHEN 8 THEN 'IL' ELSE 'MI' END AS ca_state,
  lpad(CAST(10000 + ((i * 61) % 500) * 137 AS STRING), 5, '0') AS ca_zip,
  'United States' AS ca_country,
  CAST((-500) / 100.0 AS DECIMAL(5,2)) AS ca_gmt_offset,
  CASE CAST(i % 3 AS INT) WHEN 0 THEN 'apartment' WHEN 1 THEN 'condo' ELSE 'single family' END AS ca_location_type
FROM range(2500) t(i)""",
    "customer_demographics" ->
      """SELECT
  i + 1 AS cd_demo_sk,
  CASE CAST(i % 2 AS INT) WHEN 0 THEN 'M' ELSE 'F' END AS cd_gender,
  CASE CAST(floor(i / 2.0) AS BIGINT) % 5 WHEN 0 THEN 'M' WHEN 1 THEN 'S' WHEN 2 THEN 'D' WHEN 3 THEN 'W' ELSE 'U' END AS cd_marital_status,
  CASE CAST(floor(i / 10.0) AS BIGINT) % 7 WHEN 0 THEN 'Primary' WHEN 1 THEN 'Secondary' WHEN 2 THEN 'College' WHEN 3 THEN '2 yr Degree' WHEN 4 THEN '4 yr Degree' WHEN 5 THEN 'Advanced Degree' ELSE 'Unknown' END AS cd_education_status,
  CAST(500 * (1 + CAST(floor(i / 70.0) AS BIGINT) % 20) AS INT) AS cd_purchase_estimate,
  CASE CAST(floor(i / 1400.0) AS BIGINT) % 4 WHEN 0 THEN 'Low Risk' WHEN 1 THEN 'Good' WHEN 2 THEN 'High Risk' ELSE 'Unknown' END AS cd_credit_rating,
  CAST(CAST(floor(i / 5600.0) AS BIGINT) % 7 AS INT) AS cd_dep_count,
  CAST(i % 7 AS INT) AS cd_dep_employed_count,
  CAST((i * 3) % 7 AS INT) AS cd_dep_college_count
FROM range(7200) t(i)""",
    "household_demographics" ->
      """SELECT
  i + 1 AS hd_demo_sk,
  CAST(1 + i % 20 AS BIGINT) AS hd_income_band_sk,
  CASE CAST(i % 6 AS INT) WHEN 0 THEN '>10000' WHEN 1 THEN '5001-10000' WHEN 2 THEN '1001-5000' WHEN 3 THEN '501-1000' WHEN 4 THEN '0-500' ELSE 'Unknown' END AS hd_buy_potential,
  CAST(i % 10 AS INT) AS hd_dep_count,
  CAST((i * 3) % 5 AS INT) AS hd_vehicle_count
FROM range(720) t(i)""",
    "promotion" ->
      """SELECT
  i + 1 AS p_promo_sk,
  'PROMO' || lpad(CAST(i AS STRING), 6, '0') AS p_promo_id,
  2450815 + (i * 53) % 1826 AS p_start_date_sk,
  2450815 + (i * 53) % 1826 + 30 AS p_end_date_sk,
  CAST(1 + (i * 61) % 2000 AS BIGINT) AS p_item_sk,
  CAST(((i * 977) % 100000 + 1000) / 100.0 AS DECIMAL(15,2)) AS p_cost,
  CAST(100 + i AS INT) AS p_response_target,
  'promo name ' || CAST(i AS STRING) AS p_promo_name,
  CASE CAST(i % 2 AS INT) WHEN 0 THEN 'Y' ELSE 'N' END AS p_channel_dmail,
  CASE CAST(i % 3 AS INT) WHEN 0 THEN 'Y' ELSE 'N' END AS p_channel_email,
  CASE CAST(i % 5 AS INT) WHEN 0 THEN 'Y' ELSE 'N' END AS p_channel_tv,
  CASE CAST(i % 7 AS INT) WHEN 0 THEN 'Y' ELSE 'N' END AS p_channel_radio,
  CASE CAST(i % 4 AS INT) WHEN 0 THEN 'Y' ELSE 'N' END AS p_channel_press,
  CASE CAST(i % 6 AS INT) WHEN 0 THEN 'Y' ELSE 'N' END AS p_channel_event,
  CASE CAST(i % 8 AS INT) WHEN 0 THEN 'Y' ELSE 'N' END AS p_channel_demo,
  'N' AS p_discount_active
FROM range(30) t(i)""",
    "warehouse" ->
      """SELECT
  i + 1 AS w_warehouse_sk,
  'W' || lpad(CAST(i AS STRING), 4, '0') AS w_warehouse_id,
  'warehouse ' || CAST(i AS STRING) AS w_warehouse_name,
  CAST(50000 + i * 9377 AS INT) AS w_warehouse_sq_ft,
  'city' || CAST(i AS STRING) AS w_city,
  'county' || CAST(i % 4 AS STRING) AS w_county,
  CASE CAST(i % 5 AS INT) WHEN 0 THEN 'TN' WHEN 1 THEN 'SC' WHEN 2 THEN 'CA' WHEN 3 THEN 'TX' ELSE 'OH' END AS w_state,
  'United States' AS w_country
FROM range(5) t(i)""",
    "reason" ->
      """SELECT
  i + 1 AS r_reason_sk,
  'R' || lpad(CAST(i AS STRING), 4, '0') AS r_reason_id,
  'reason ' || CAST(i AS STRING) AS r_reason_desc
FROM range(9) t(i)""",
    "ship_mode" ->
      """SELECT
  i + 1 AS sm_ship_mode_sk,
  'SM' || lpad(CAST(i AS STRING), 4, '0') AS sm_ship_mode_id,
  CASE CAST(i % 6 AS INT) WHEN 0 THEN 'EXPRESS' WHEN 1 THEN 'NEXT DAY' WHEN 2 THEN 'OVERNIGHT' WHEN 3 THEN 'TWO DAY' WHEN 4 THEN 'LIBRARY' ELSE 'REGULAR' END AS sm_type,
  CASE CAST(i % 2 AS INT) WHEN 0 THEN 'AIR' ELSE 'SURFACE' END AS sm_code,
  'carrier' || CAST(i AS STRING) AS sm_carrier,
  'contract' || CAST(i AS STRING) AS sm_contract
FROM range(12) t(i)""",
    "income_band" ->
      """SELECT
  i + 1 AS ib_income_band_sk,
  CAST(i * 10000 AS INT) AS ib_lower_bound,
  CAST((i + 1) * 10000 - 1 AS INT) AS ib_upper_bound
FROM range(20) t(i)""",
    "call_center" ->
      """SELECT
  i + 1 AS cc_call_center_sk,
  'CC' || lpad(CAST(i AS STRING), 4, '0') AS cc_call_center_id,
  'call center ' || CAST(i AS STRING) AS cc_name,
  'class' || CAST(i % 3 AS STRING) AS cc_class,
  CAST(50 + i * 7 AS INT) AS cc_employees,
  'manager ' || CAST(i AS STRING) AS cc_manager,
  'county' || CAST(i % 4 AS STRING) AS cc_county,
  CASE CAST(i % 5 AS INT) WHEN 0 THEN 'TN' WHEN 1 THEN 'SC' WHEN 2 THEN 'CA' WHEN 3 THEN 'TX' ELSE 'OH' END AS cc_state
FROM range(4) t(i)""",
    "catalog_page" ->
      """SELECT
  i + 1 AS cp_catalog_page_sk,
  'CP' || lpad(CAST(i AS STRING), 6, '0') AS cp_catalog_page_id,
  2450815 + (i * 29) % 1826 AS cp_start_date_sk,
  2450815 + (i * 29) % 1826 + 90 AS cp_end_date_sk,
  'dept' || CAST(i % 10 AS STRING) AS cp_department,
  CAST(1 + i % 12 AS INT) AS cp_catalog_number,
  CAST(1 + i % 120 AS INT) AS cp_catalog_page_number,
  'desc ' || CAST(i AS STRING) AS cp_description,
  'catalog' AS cp_type
FROM range(60) t(i)""",
    "web_site" ->
      """SELECT
  i + 1 AS web_site_sk,
  'WEB' || lpad(CAST(i AS STRING), 4, '0') AS web_site_id,
  'site ' || CAST(i AS STRING) AS web_name,
  2450815 + i * 100 AS web_open_date_sk,
  'manager ' || CAST(i AS STRING) AS web_manager,
  'United States' AS web_country
FROM range(6) t(i)""",
    "web_page" ->
      """SELECT
  i + 1 AS wp_web_page_sk,
  'WP' || lpad(CAST(i AS STRING), 6, '0') AS wp_web_page_id,
  2450815 + (i * 31) % 1826 AS wp_creation_date_sk,
  CAST(1 + (i * 11) % 5000 AS BIGINT) AS wp_customer_sk,
  'http://www.example.com/page' || CAST(i AS STRING) AS wp_url,
  CASE CAST(i % 4 AS INT) WHEN 0 THEN 'order' WHEN 1 THEN 'general' WHEN 2 THEN 'welcome' ELSE 'protected' END AS wp_type,
  CAST((i * 7) % 100 AS INT) AS wp_char_count,
  CAST(i % 10 AS INT) AS wp_link_count,
  CAST(i % 5 AS INT) AS wp_image_count
FROM range(20) t(i)""",
    "inventory" ->
      """SELECT
  2450815 + (i % 261) * 7 AS inv_date_sk,
  CAST(1 + (i * 7) % 2000 AS BIGINT) AS inv_item_sk,
  CAST(1 + i % 5 AS BIGINT) AS inv_warehouse_sk,
  CASE WHEN i % 71 = 0 THEN NULL ELSE CAST((i * 13 + (i % 261) * 17) % 1000 AS INT) END AS inv_quantity_on_hand
FROM range(50000) t(i)""",
    "store_sales" ->
      """SELECT
  CASE WHEN i % 97 = 0 THEN NULL ELSE 2450815 + (i * 131) % 1826 END AS ss_sold_date_sk,
  CASE WHEN i % 89 = 0 THEN NULL ELSE (i * 7919) % 86400 END AS ss_sold_time_sk,
  1 + (i * 61) % 2000 AS ss_item_sk,
  CASE WHEN i % 61 = 0 THEN NULL ELSE 1 + (i * 149) % 5000 END AS ss_customer_sk,
  1 + (i * 179) % 7200 AS ss_cdemo_sk,
  1 + (i * 181) % 720 AS ss_hdemo_sk,
  CASE WHEN i % 59 = 0 THEN NULL ELSE 1 + (i * 191) % 2500 END AS ss_addr_sk,
  CASE WHEN i % 101 = 0 THEN NULL ELSE 1 + (i * 7) % 12 END AS ss_store_sk,
  1 + (i * 193) % 30 AS ss_promo_sk,
  CAST(floor(i / 4.0) AS BIGINT) + 1 AS ss_ticket_number,
  CAST(qty AS INT) AS ss_quantity,
  CAST((wc) / 100.0 AS DECIMAL(7,2)) AS ss_wholesale_cost,
  CAST((lc) / 100.0 AS DECIMAL(7,2)) AS ss_list_price,
  CAST((pc) / 100.0 AS DECIMAL(7,2)) AS ss_sales_price,
  CAST((dct * qty) / 100.0 AS DECIMAL(12,2)) AS ss_ext_discount_amt,
  CAST((pc * qty) / 100.0 AS DECIMAL(12,2)) AS ss_ext_sales_price,
  CAST((wc * qty) / 100.0 AS DECIMAL(12,2)) AS ss_ext_wholesale_cost,
  CAST((lc * qty) / 100.0 AS DECIMAL(12,2)) AS ss_ext_list_price,
  CAST((CAST(floor(pc * qty * 8 / 100.0) AS BIGINT)) / 100.0 AS DECIMAL(12,2)) AS ss_ext_tax,
  CAST((cpn) / 100.0 AS DECIMAL(12,2)) AS ss_coupon_amt,
  CAST((greatest(pc * qty - cpn, 0)) / 100.0 AS DECIMAL(12,2)) AS ss_net_paid,
  CAST((greatest(pc * qty - cpn, 0) + CAST(floor(pc * qty * 8 / 100.0) AS BIGINT)) / 100.0 AS DECIMAL(12,2)) AS ss_net_paid_inc_tax,
  CAST((pc * qty - wc * qty) / 100.0 AS DECIMAL(12,2)) AS ss_net_profit
FROM (SELECT i,
        1 + (i * 17) % 100 AS qty,
        (i * 37) % 9900 + 100 AS pc,
        (i * 29) % 5000 + 50 AS wc,
        (i * 37) % 9900 + 100 + (i * 11) % 2000 AS lc,
        (i * 13) % 500 AS dct,
        (i * 23) % 3000 AS cpn
      FROM range(80000) t(i)) b""",
    "store_returns" ->
      """SELECT
  CASE WHEN k % 97 = 0 THEN NULL ELSE 2450815 + ((k * 131) % 1826 + 1 + i % 45) % 1826 END AS sr_returned_date_sk,
  (k * 7919) % 86400 AS sr_return_time_sk,
  1 + (k * 61) % 2000 AS sr_item_sk,
  CASE WHEN k % 61 = 0 THEN NULL ELSE 1 + (k * 149) % 5000 END AS sr_customer_sk,
  1 + (k * 179) % 7200 AS sr_cdemo_sk,
  1 + (k * 181) % 720 AS sr_hdemo_sk,
  1 + (k * 191) % 2500 AS sr_addr_sk,
  CASE WHEN k % 101 = 0 THEN NULL ELSE 1 + (k * 7) % 12 END AS sr_store_sk,
  1 + i % 9 AS sr_reason_sk,
  CAST(floor(k / 4.0) AS BIGINT) + 1 AS sr_ticket_number,
  CAST(1 + (i * 5) % 100 AS INT) AS sr_return_quantity,
  CAST(((i * 71) % 8000 + 100) / 100.0 AS DECIMAL(12,2)) AS sr_return_amt,
  CAST((CAST(floor(((i * 71) % 8000 + 100) * 8 / 100.0) AS BIGINT)) / 100.0 AS DECIMAL(12,2)) AS sr_return_tax,
  CAST(((i * 71) % 8000 + 100 + CAST(floor(((i * 71) % 8000 + 100) * 8 / 100.0) AS BIGINT)) / 100.0 AS DECIMAL(12,2)) AS sr_return_amt_inc_tax,
  CAST(((i * 3) % 500) / 100.0 AS DECIMAL(12,2)) AS sr_fee,
  CAST(((i * 51) % 4000) / 100.0 AS DECIMAL(12,2)) AS sr_return_ship_cost,
  CAST(((i * 31) % 2000) / 100.0 AS DECIMAL(12,2)) AS sr_refunded_cash,
  CAST(((i * 83) % 9000 + 100) / 100.0 AS DECIMAL(12,2)) AS sr_net_loss
FROM (SELECT i, i * 10 AS k FROM range(8000) t(i)) b""",
    "catalog_sales" ->
      """SELECT
  CASE WHEN i % 97 = 0 THEN NULL
       WHEN i % 5 = 0 THEN 2450815 + ((k * 131) % 1826 + 60 + i % 30) % 1826
       ELSE 2450815 + (i * 127) % 1826 END AS cs_sold_date_sk,
  (i * 6101) % 86400 AS cs_sold_time_sk,
  CASE WHEN i % 93 = 0 THEN NULL ELSE 2450815 + ((i * 127) % 1826 + 2 + i % 30) % 1826 END AS cs_ship_date_sk,
  CASE WHEN i % 67 = 0 THEN NULL
       WHEN i % 5 = 0 AND k % 61 > 0 THEN 1 + (k * 149) % 5000
       ELSE 1 + (i * 151) % 5000 END AS cs_bill_customer_sk,
  1 + (i * 157) % 7200 AS cs_bill_cdemo_sk,
  1 + (i * 159) % 720 AS cs_bill_hdemo_sk,
  1 + (i * 163) % 2500 AS cs_bill_addr_sk,
  1 + (i * 167) % 5000 AS cs_ship_customer_sk,
  1 + (i * 169) % 7200 AS cs_ship_cdemo_sk,
  1 + (i * 171) % 720 AS cs_ship_hdemo_sk,
  1 + (i * 173) % 2500 AS cs_ship_addr_sk,
  1 + i % 4 AS cs_call_center_sk,
  1 + (i * 11) % 60 AS cs_catalog_page_sk,
  1 + i % 12 AS cs_ship_mode_sk,
  1 + i % 5 AS cs_warehouse_sk,
  CASE WHEN i % 5 = 0 THEN 1 + (k * 61) % 2000 ELSE 1 + (i * 59) % 2000 END AS cs_item_sk,
  1 + (i * 197) % 30 AS cs_promo_sk,
  CAST(floor(i / 3.0) AS BIGINT) + 1 AS cs_order_number,
  CAST(qty AS INT) AS cs_quantity,
  CAST((wc) / 100.0 AS DECIMAL(7,2)) AS cs_wholesale_cost,
  CAST((lc) / 100.0 AS DECIMAL(7,2)) AS cs_list_price,
  CAST((pc) / 100.0 AS DECIMAL(7,2)) AS cs_sales_price,
  CAST((dct * qty) / 100.0 AS DECIMAL(12,2)) AS cs_ext_discount_amt,
  CAST((pc * qty) / 100.0 AS DECIMAL(12,2)) AS cs_ext_sales_price,
  CAST((wc * qty) / 100.0 AS DECIMAL(12,2)) AS cs_ext_wholesale_cost,
  CAST((lc * qty) / 100.0 AS DECIMAL(12,2)) AS cs_ext_list_price,
  CAST((CAST(floor(pc * qty * 8 / 100.0) AS BIGINT)) / 100.0 AS DECIMAL(12,2)) AS cs_ext_tax,
  CAST((cpn) / 100.0 AS DECIMAL(12,2)) AS cs_coupon_amt,
  CAST(((i * 43) % 2000) / 100.0 AS DECIMAL(12,2)) AS cs_ext_ship_cost,
  CAST((greatest(pc * qty - cpn, 0)) / 100.0 AS DECIMAL(12,2)) AS cs_net_paid,
  CAST((greatest(pc * qty - cpn, 0) + CAST(floor(pc * qty * 8 / 100.0) AS BIGINT)) / 100.0 AS DECIMAL(12,2)) AS cs_net_paid_inc_tax,
  CAST((pc * qty - wc * qty) / 100.0 AS DECIMAL(12,2)) AS cs_net_profit
FROM (SELECT i, (CAST(floor(i / 5.0) AS BIGINT) % 8000) * 10 AS k,
        1 + (i * 23) % 100 AS qty,
        (i * 43) % 9900 + 100 AS pc,
        (i * 31) % 5000 + 50 AS wc,
        (i * 43) % 9900 + 100 + (i * 17) % 2000 AS lc,
        (i * 19) % 500 AS dct,
        (i * 29) % 3000 AS cpn
      FROM range(40000) t(i)) b""",
    "catalog_returns" ->
      """SELECT
  CASE WHEN k % 97 = 0 THEN NULL ELSE 2450815 + ((k * 127) % 1826 + 1 + i % 45) % 1826 END AS cr_returned_date_sk,
  (k * 6101) % 86400 AS cr_returned_time_sk,
  CASE WHEN k % 5 = 0 THEN 1 + ((CAST(floor(k / 5.0) AS BIGINT) % 8000) * 10 * 61) % 2000 ELSE 1 + (k * 59) % 2000 END AS cr_item_sk,
  CASE WHEN k % 67 = 0 THEN NULL ELSE 1 + (k * 151) % 5000 END AS cr_refunded_customer_sk,
  CASE WHEN k % 67 = 0 THEN NULL ELSE 1 + (k * 151) % 5000 END AS cr_returning_customer_sk,
  1 + (k * 153) % 2500 AS cr_returning_addr_sk,
  1 + k % 4 AS cr_call_center_sk,
  1 + (k * 11) % 60 AS cr_catalog_page_sk,
  1 + k % 12 AS cr_ship_mode_sk,
  1 + k % 5 AS cr_warehouse_sk,
  1 + i % 9 AS cr_reason_sk,
  CAST(floor(k / 3.0) AS BIGINT) + 1 AS cr_order_number,
  CAST(1 + (i * 7) % 100 AS INT) AS cr_return_quantity,
  CAST(((i * 73) % 8000 + 100) / 100.0 AS DECIMAL(12,2)) AS cr_return_amount,
  CAST((CAST(floor(((i * 73) % 8000 + 100) * 8 / 100.0) AS BIGINT)) / 100.0 AS DECIMAL(12,2)) AS cr_return_tax,
  CAST(((i * 73) % 8000 + 100 + CAST(floor(((i * 73) % 8000 + 100) * 8 / 100.0) AS BIGINT)) / 100.0 AS DECIMAL(12,2)) AS cr_return_amt_inc_tax,
  CAST(((i * 5) % 500) / 100.0 AS DECIMAL(12,2)) AS cr_fee,
  CAST(((i * 53) % 4000) / 100.0 AS DECIMAL(12,2)) AS cr_return_ship_cost,
  CAST(((i * 37) % 2000) / 100.0 AS DECIMAL(12,2)) AS cr_refunded_cash,
  CAST(((i * 43) % 1500) / 100.0 AS DECIMAL(12,2)) AS cr_reversed_charge,
  CAST(((i * 47) % 1800) / 100.0 AS DECIMAL(12,2)) AS cr_store_credit,
  CAST(((i * 89) % 9000 + 100) / 100.0 AS DECIMAL(12,2)) AS cr_net_loss
FROM (SELECT i, i * 10 AS k FROM range(4000) t(i)) b""",
    "web_sales" ->
      """SELECT
  CASE WHEN i % 97 = 0 THEN NULL ELSE 2450815 + (i * 113) % 1826 END AS ws_sold_date_sk,
  (i * 4409) % 86400 AS ws_sold_time_sk,
  CASE WHEN i % 93 = 0 THEN NULL ELSE 2450815 + ((i * 113) % 1826 + 2 + i % 30) % 1826 END AS ws_ship_date_sk,
  1 + (i * 67) % 2000 AS ws_item_sk,
  CASE WHEN i % 71 = 0 THEN NULL ELSE 1 + (i * 139) % 5000 END AS ws_bill_customer_sk,
  1 + (i * 141) % 7200 AS ws_bill_cdemo_sk,
  1 + (i * 143) % 720 AS ws_bill_hdemo_sk,
  1 + (i * 147) % 2500 AS ws_bill_addr_sk,
  1 + (i * 151) % 5000 AS ws_ship_customer_sk,
  1 + (i * 153) % 7200 AS ws_ship_cdemo_sk,
  1 + (i * 155) % 720 AS ws_ship_hdemo_sk,
  1 + (i * 157) % 2500 AS ws_ship_addr_sk,
  1 + i % 20 AS ws_web_page_sk,
  1 + i % 6 AS ws_web_site_sk,
  1 + i % 12 AS ws_ship_mode_sk,
  1 + i % 5 AS ws_warehouse_sk,
  1 + (i * 199) % 30 AS ws_promo_sk,
  CAST(floor(i / 3.0) AS BIGINT) + 1 AS ws_order_number,
  CAST(qty AS INT) AS ws_quantity,
  CAST((wc) / 100.0 AS DECIMAL(7,2)) AS ws_wholesale_cost,
  CAST((lc) / 100.0 AS DECIMAL(7,2)) AS ws_list_price,
  CAST((pc) / 100.0 AS DECIMAL(7,2)) AS ws_sales_price,
  CAST((dct * qty) / 100.0 AS DECIMAL(12,2)) AS ws_ext_discount_amt,
  CAST((pc * qty) / 100.0 AS DECIMAL(12,2)) AS ws_ext_sales_price,
  CAST((wc * qty) / 100.0 AS DECIMAL(12,2)) AS ws_ext_wholesale_cost,
  CAST((lc * qty) / 100.0 AS DECIMAL(12,2)) AS ws_ext_list_price,
  CAST((CAST(floor(pc * qty * 8 / 100.0) AS BIGINT)) / 100.0 AS DECIMAL(12,2)) AS ws_ext_tax,
  CAST((cpn) / 100.0 AS DECIMAL(12,2)) AS ws_coupon_amt,
  CAST(((i * 47) % 2000) / 100.0 AS DECIMAL(12,2)) AS ws_ext_ship_cost,
  CAST((greatest(pc * qty - cpn, 0)) / 100.0 AS DECIMAL(12,2)) AS ws_net_paid,
  CAST((greatest(pc * qty - cpn, 0) + CAST(floor(pc * qty * 8 / 100.0) AS BIGINT)) / 100.0 AS DECIMAL(12,2)) AS ws_net_paid_inc_tax,
  CAST((pc * qty - wc * qty) / 100.0 AS DECIMAL(12,2)) AS ws_net_profit
FROM (SELECT i,
        1 + (i * 27) % 100 AS qty,
        (i * 53) % 9900 + 100 AS pc,
        (i * 33) % 5000 + 50 AS wc,
        (i * 53) % 9900 + 100 + (i * 13) % 2000 AS lc,
        (i * 21) % 500 AS dct,
        (i * 39) % 3000 AS cpn
      FROM range(30000) t(i)) b""",
    "web_returns" ->
      """SELECT
  CASE WHEN k % 97 = 0 THEN NULL ELSE 2450815 + ((k * 113) % 1826 + 1 + i % 45) % 1826 END AS wr_returned_date_sk,
  (k * 4409) % 86400 AS wr_returned_time_sk,
  1 + (k * 67) % 2000 AS wr_item_sk,
  CASE WHEN k % 71 = 0 THEN NULL ELSE 1 + (k * 139) % 5000 END AS wr_refunded_customer_sk,
  CASE WHEN k % 71 = 0 THEN NULL ELSE 1 + (k * 139) % 5000 END AS wr_returning_customer_sk,
  1 + (k * 141) % 7200 AS wr_refunded_cdemo_sk,
  1 + (k * 141) % 7200 AS wr_returning_cdemo_sk,
  1 + (k * 147) % 2500 AS wr_refunded_addr_sk,
  1 + (k * 149) % 2500 AS wr_returning_addr_sk,
  1 + k % 20 AS wr_web_page_sk,
  1 + i % 9 AS wr_reason_sk,
  CAST(floor(k / 3.0) AS BIGINT) + 1 AS wr_order_number,
  CAST(1 + (i * 9) % 100 AS INT) AS wr_return_quantity,
  CAST(((i * 79) % 8000 + 100) / 100.0 AS DECIMAL(12,2)) AS wr_return_amt,
  CAST((CAST(floor(((i * 79) % 8000 + 100) * 8 / 100.0) AS BIGINT)) / 100.0 AS DECIMAL(12,2)) AS wr_return_tax,
  CAST(((i * 79) % 8000 + 100 + CAST(floor(((i * 79) % 8000 + 100) * 8 / 100.0) AS BIGINT)) / 100.0 AS DECIMAL(12,2)) AS wr_return_amt_inc_tax,
  CAST(((i * 7) % 500) / 100.0 AS DECIMAL(12,2)) AS wr_fee,
  CAST(((i * 57) % 4000) / 100.0 AS DECIMAL(12,2)) AS wr_return_ship_cost,
  CAST(((i * 41) % 2000) / 100.0 AS DECIMAL(12,2)) AS wr_refunded_cash,
  CAST(((i * 97) % 9000 + 100) / 100.0 AS DECIMAL(12,2)) AS wr_net_loss
FROM (SELECT i, i * 10 AS k FROM range(3000) t(i)) b"""
  )

  /** Query text + the generated tables its oracle must inline. */
  val querySql: Map[String, (Seq[String], String)] = Map(
    "q3" -> (Seq("date_dim", "store_sales", "item") ->
      """
SELECT d_year, i_brand_id AS brand_id, i_brand AS brand,
       CAST(sum(ss_ext_sales_price) AS DOUBLE) AS sum_agg
FROM date_dim dt, store_sales, item
WHERE dt.d_date_sk = ss_sold_date_sk AND ss_item_sk = i_item_sk
  AND i_manufact_id = 43 AND dt.d_moy = 11
GROUP BY d_year, i_brand_id, i_brand
ORDER BY d_year, sum_agg DESC, brand_id
LIMIT 100"""),
    "q6" -> (Seq("customer_address", "customer", "store_sales", "date_dim", "item") ->
      """
SELECT a.ca_state AS state, count(*) AS cnt
FROM customer_address a, customer c, store_sales s, date_dim d, item i
WHERE a.ca_address_sk = c.c_current_addr_sk
  AND c.c_customer_sk = s.ss_customer_sk
  AND s.ss_sold_date_sk = d.d_date_sk
  AND s.ss_item_sk = i.i_item_sk
  AND d.d_month_seq = (SELECT DISTINCT d_month_seq FROM date_dim
                       WHERE d_year = 2000 AND d_moy = 1)
  AND i.i_current_price * 10 * (SELECT count(*) FROM item j
                                WHERE j.i_category = i.i_category)
      > 12 * (SELECT sum(j.i_current_price) FROM item j
              WHERE j.i_category = i.i_category)
GROUP BY a.ca_state
HAVING count(*) >= 10
ORDER BY cnt, state
LIMIT 100"""),
    "q7" -> (Seq("store_sales", "customer_demographics", "date_dim", "item", "promotion") ->
      """
SELECT i_item_id,
       CAST(sum(ss_quantity) AS DOUBLE) / count(*) AS agg1,
       CAST(sum(ss_list_price) AS DOUBLE) / count(*) AS agg2,
       CAST(sum(ss_coupon_amt) AS DOUBLE) / count(*) AS agg3,
       CAST(sum(ss_sales_price) AS DOUBLE) / count(*) AS agg4
FROM store_sales, customer_demographics, date_dim, item, promotion
WHERE ss_sold_date_sk = d_date_sk AND ss_item_sk = i_item_sk
  AND ss_cdemo_sk = cd_demo_sk AND ss_promo_sk = p_promo_sk
  AND cd_gender = 'M' AND cd_marital_status = 'S'
  AND cd_education_status = 'College'
  AND (p_channel_email = 'N' OR p_channel_event = 'N')
  AND d_year = 2000
GROUP BY i_item_id
ORDER BY i_item_id
LIMIT 100"""),
    "q11" -> (Seq("customer", "store_sales", "web_sales", "date_dim") ->
      """
WITH year_total AS (
  SELECT c_customer_id customer_id, c_first_name customer_first_name,
         c_last_name customer_last_name,
         c_preferred_cust_flag customer_preferred_cust_flag,
         c_birth_country customer_birth_country, c_login customer_login,
         c_email_address customer_email_address, d_year dyear,
         sum(ss_ext_list_price - ss_ext_discount_amt) year_total,
         's' sale_type
  FROM customer, store_sales, date_dim
  WHERE c_customer_sk = ss_customer_sk AND ss_sold_date_sk = d_date_sk
  GROUP BY c_customer_id, c_first_name, c_last_name, c_preferred_cust_flag,
           c_birth_country, c_login, c_email_address, d_year
  UNION ALL
  SELECT c_customer_id customer_id, c_first_name customer_first_name,
         c_last_name customer_last_name,
         c_preferred_cust_flag customer_preferred_cust_flag,
         c_birth_country customer_birth_country, c_login customer_login,
         c_email_address customer_email_address, d_year dyear,
         sum(ws_ext_list_price - ws_ext_discount_amt) year_total,
         'w' sale_type
  FROM customer, web_sales, date_dim
  WHERE c_customer_sk = ws_bill_customer_sk AND ws_sold_date_sk = d_date_sk
  GROUP BY c_customer_id, c_first_name, c_last_name, c_preferred_cust_flag,
           c_birth_country, c_login, c_email_address, d_year)
SELECT t_s_secyear.customer_id, t_s_secyear.customer_first_name,
       t_s_secyear.customer_last_name,
       t_s_secyear.customer_preferred_cust_flag
FROM year_total t_s_firstyear, year_total t_s_secyear,
     year_total t_w_firstyear, year_total t_w_secyear
WHERE t_s_secyear.customer_id = t_s_firstyear.customer_id
  AND t_s_firstyear.customer_id = t_w_secyear.customer_id
  AND t_s_firstyear.customer_id = t_w_firstyear.customer_id
  AND t_s_firstyear.sale_type = 's' AND t_w_firstyear.sale_type = 'w'
  AND t_s_secyear.sale_type = 's' AND t_w_secyear.sale_type = 'w'
  AND t_s_firstyear.dyear = 2000 AND t_s_secyear.dyear = 2001
  AND t_w_firstyear.dyear = 2000 AND t_w_secyear.dyear = 2001
  AND t_s_firstyear.year_total > 0 AND t_w_firstyear.year_total > 0
  AND t_w_secyear.year_total * t_s_firstyear.year_total
      > t_s_secyear.year_total * t_w_firstyear.year_total
ORDER BY t_s_secyear.customer_id, t_s_secyear.customer_first_name,
         t_s_secyear.customer_last_name,
         t_s_secyear.customer_preferred_cust_flag
LIMIT 100"""),
    "q12" -> (Seq("web_sales", "item", "date_dim") ->
      """
SELECT i_item_id, i_item_desc, i_category, i_class,
       CAST(i_current_price AS DOUBLE) AS i_current_price,
       CAST(sum(ws_ext_sales_price) AS DOUBLE) AS itemrevenue,
       CAST(sum(ws_ext_sales_price) * 100 AS DOUBLE) /
         CAST(sum(sum(ws_ext_sales_price)) OVER (PARTITION BY i_class) AS DOUBLE)
         AS revenueratio
FROM web_sales, item, date_dim
WHERE ws_item_sk = i_item_sk
  AND i_category IN ('Sports', 'Books', 'Home')
  AND ws_sold_date_sk = d_date_sk
  AND d_date BETWEEN DATE '1999-02-22' AND DATE '1999-03-24'
GROUP BY i_item_id, i_item_desc, i_category, i_class, i_current_price
ORDER BY i_category, i_class, i_item_id, i_item_desc, revenueratio
LIMIT 100"""),
    "q15" -> (Seq("catalog_sales", "customer", "customer_address", "date_dim") ->
      """
SELECT ca_zip, CAST(sum(cs_sales_price) AS DOUBLE) AS sum_sales
FROM catalog_sales, customer, customer_address, date_dim
WHERE cs_bill_customer_sk = c_customer_sk
  AND c_current_addr_sk = ca_address_sk
  AND (substr(ca_zip, 1, 5) IN ('85669', '86197', '88274', '83405', '86475',
                                '85392', '85460', '80348', '81792')
       OR ca_state IN ('CA', 'WA', 'GA')
       OR cs_sales_price > 500)
  AND cs_sold_date_sk = d_date_sk
  AND d_qoy = 2 AND d_year = 2001
GROUP BY ca_zip
ORDER BY ca_zip
LIMIT 100"""),
    "q19" -> (Seq("date_dim", "store_sales", "item", "customer", "customer_address", "store") ->
      """
SELECT i_brand_id AS brand_id, i_brand AS brand, i_manufact_id, i_manufact,
       CAST(sum(ss_ext_sales_price) AS DOUBLE) AS ext_price
FROM date_dim, store_sales, item, customer, customer_address, store
WHERE d_date_sk = ss_sold_date_sk AND ss_item_sk = i_item_sk
  AND i_manager_id = 8 AND d_moy = 11 AND d_year = 1998
  AND ss_customer_sk = c_customer_sk
  AND c_current_addr_sk = ca_address_sk
  AND substr(ca_zip, 1, 5) <> substr(s_zip, 1, 5)
  AND ss_store_sk = s_store_sk
GROUP BY i_brand_id, i_brand, i_manufact_id, i_manufact
ORDER BY ext_price DESC, brand_id, i_manufact_id
LIMIT 100"""),
    "q20" -> (Seq("catalog_sales", "item", "date_dim") ->
      """
SELECT i_item_id, i_item_desc, i_category, i_class,
       CAST(i_current_price AS DOUBLE) AS i_current_price,
       CAST(sum(cs_ext_sales_price) AS DOUBLE) AS itemrevenue,
       CAST(sum(cs_ext_sales_price) * 100 AS DOUBLE) /
         CAST(sum(sum(cs_ext_sales_price)) OVER (PARTITION BY i_class) AS DOUBLE)
         AS revenueratio
FROM catalog_sales, item, date_dim
WHERE cs_item_sk = i_item_sk
  AND i_category IN ('Sports', 'Books', 'Home')
  AND cs_sold_date_sk = d_date_sk
  AND d_date BETWEEN DATE '1999-02-22' AND DATE '1999-03-24'
GROUP BY i_item_id, i_item_desc, i_category, i_class, i_current_price
ORDER BY i_category, i_class, i_item_id, i_item_desc, revenueratio
LIMIT 100"""),
    "q25" -> (Seq("store_sales", "store_returns", "catalog_sales", "date_dim", "store", "item") ->
      """
SELECT i_item_id, i_item_desc, s_store_id, s_store_name,
       CAST(sum(ss_net_profit) AS DOUBLE) AS store_sales_profit,
       CAST(sum(sr_net_loss) AS DOUBLE) AS store_returns_loss,
       CAST(sum(cs_net_profit) AS DOUBLE) AS catalog_sales_profit
FROM store_sales, store_returns, catalog_sales, date_dim d1, date_dim d2,
     date_dim d3, store, item
WHERE d1.d_moy = 4 AND d1.d_year = 2001 AND d1.d_date_sk = ss_sold_date_sk
  AND i_item_sk = ss_item_sk AND s_store_sk = ss_store_sk
  AND ss_customer_sk = sr_customer_sk AND ss_item_sk = sr_item_sk
  AND ss_ticket_number = sr_ticket_number
  AND sr_returned_date_sk = d2.d_date_sk
  AND d2.d_moy BETWEEN 4 AND 10 AND d2.d_year = 2001
  AND sr_customer_sk = cs_bill_customer_sk AND sr_item_sk = cs_item_sk
  AND cs_sold_date_sk = d3.d_date_sk
  AND d3.d_moy BETWEEN 4 AND 10 AND d3.d_year = 2001
GROUP BY i_item_id, i_item_desc, s_store_id, s_store_name
ORDER BY i_item_id, i_item_desc, s_store_id, s_store_name
LIMIT 100"""),
    "q26" -> (Seq("catalog_sales", "customer_demographics", "date_dim", "item", "promotion") ->
      """
SELECT i_item_id,
       CAST(sum(cs_quantity) AS DOUBLE) / count(*) AS agg1,
       CAST(sum(cs_list_price) AS DOUBLE) / count(*) AS agg2,
       CAST(sum(cs_coupon_amt) AS DOUBLE) / count(*) AS agg3,
       CAST(sum(cs_sales_price) AS DOUBLE) / count(*) AS agg4
FROM catalog_sales, customer_demographics, date_dim, item, promotion
WHERE cs_sold_date_sk = d_date_sk AND cs_item_sk = i_item_sk
  AND cs_bill_cdemo_sk = cd_demo_sk AND cs_promo_sk = p_promo_sk
  AND cd_gender = 'M' AND cd_marital_status = 'D'
  AND cd_education_status = 'College'
  AND (p_channel_email = 'N' OR p_channel_event = 'N')
  AND d_year = 2000
GROUP BY i_item_id
ORDER BY i_item_id
LIMIT 100"""),
    "q42" -> (Seq("date_dim", "store_sales", "item") ->
      """
SELECT d_year, i_category_id, i_category,
       CAST(sum(ss_ext_sales_price) AS DOUBLE) AS total_sales
FROM date_dim dt, store_sales, item
WHERE dt.d_date_sk = ss_sold_date_sk AND ss_item_sk = i_item_sk
  AND i_manager_id = 1 AND dt.d_moy = 11 AND dt.d_year = 2000
GROUP BY d_year, i_category_id, i_category
ORDER BY total_sales DESC, d_year, i_category_id, i_category
LIMIT 100"""),
    "q43" -> (Seq("date_dim", "store_sales", "store") ->
      """
SELECT s_store_name, s_store_id,
       CAST(sum(CASE WHEN d_day_name = 'Sunday' THEN ss_sales_price ELSE NULL END) AS DOUBLE) AS sun_sales,
       CAST(sum(CASE WHEN d_day_name = 'Monday' THEN ss_sales_price ELSE NULL END) AS DOUBLE) AS mon_sales,
       CAST(sum(CASE WHEN d_day_name = 'Tuesday' THEN ss_sales_price ELSE NULL END) AS DOUBLE) AS tue_sales,
       CAST(sum(CASE WHEN d_day_name = 'Wednesday' THEN ss_sales_price ELSE NULL END) AS DOUBLE) AS wed_sales,
       CAST(sum(CASE WHEN d_day_name = 'Thursday' THEN ss_sales_price ELSE NULL END) AS DOUBLE) AS thu_sales,
       CAST(sum(CASE WHEN d_day_name = 'Friday' THEN ss_sales_price ELSE NULL END) AS DOUBLE) AS fri_sales,
       CAST(sum(CASE WHEN d_day_name = 'Saturday' THEN ss_sales_price ELSE NULL END) AS DOUBLE) AS sat_sales
FROM date_dim, store_sales, store
WHERE d_date_sk = ss_sold_date_sk AND s_store_sk = ss_store_sk
  AND s_gmt_offset = -5 AND d_year = 2000
GROUP BY s_store_name, s_store_id
ORDER BY s_store_name, s_store_id
LIMIT 100"""),
    "q51" -> (Seq("web_sales", "store_sales", "date_dim") ->
      """
WITH web_v1 AS (
  SELECT ws_item_sk item_sk, d_date,
         sum(sum(ws_sales_price)) OVER (PARTITION BY ws_item_sk ORDER BY d_date
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) cume_sales
  FROM web_sales, date_dim
  WHERE ws_sold_date_sk = d_date_sk AND d_month_seq BETWEEN 360 AND 371
    AND ws_item_sk IS NOT NULL
  GROUP BY ws_item_sk, d_date),
store_v1 AS (
  SELECT ss_item_sk item_sk, d_date,
         sum(sum(ss_sales_price)) OVER (PARTITION BY ss_item_sk ORDER BY d_date
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) cume_sales
  FROM store_sales, date_dim
  WHERE ss_sold_date_sk = d_date_sk AND d_month_seq BETWEEN 360 AND 371
    AND ss_item_sk IS NOT NULL
  GROUP BY ss_item_sk, d_date)
SELECT * FROM (
  SELECT CASE WHEN web.item_sk IS NOT NULL THEN web.item_sk ELSE store.item_sk END item_sk,
         CASE WHEN web.d_date IS NOT NULL THEN web.d_date ELSE store.d_date END d_date,
         CAST(web.cume_sales AS DOUBLE) web_sales,
         CAST(store.cume_sales AS DOUBLE) store_sales,
         max(CAST(web.cume_sales AS DOUBLE)) OVER (
           PARTITION BY CASE WHEN web.item_sk IS NOT NULL THEN web.item_sk ELSE store.item_sk END
           ORDER BY CASE WHEN web.d_date IS NOT NULL THEN web.d_date ELSE store.d_date END
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) web_cumulative,
         max(CAST(store.cume_sales AS DOUBLE)) OVER (
           PARTITION BY CASE WHEN web.item_sk IS NOT NULL THEN web.item_sk ELSE store.item_sk END
           ORDER BY CASE WHEN web.d_date IS NOT NULL THEN web.d_date ELSE store.d_date END
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) store_cumulative
  FROM web_v1 web FULL OUTER JOIN store_v1 store
       ON (web.item_sk = store.item_sk AND web.d_date = store.d_date)) y
WHERE web_cumulative > store_cumulative
ORDER BY item_sk, d_date
LIMIT 100"""),
    "q52" -> (Seq("date_dim", "store_sales", "item") ->
      """
SELECT d_year, i_brand_id AS brand_id, i_brand AS brand,
       CAST(sum(ss_ext_sales_price) AS DOUBLE) AS ext_price
FROM date_dim dt, store_sales, item
WHERE dt.d_date_sk = ss_sold_date_sk AND ss_item_sk = i_item_sk
  AND i_manager_id = 1 AND dt.d_moy = 11 AND dt.d_year = 2000
GROUP BY d_year, i_brand_id, i_brand
ORDER BY d_year, ext_price DESC, brand_id
LIMIT 100"""),
    "q55" -> (Seq("date_dim", "store_sales", "item") ->
      """
SELECT i_brand_id AS brand_id, i_brand AS brand,
       CAST(sum(ss_ext_sales_price) AS DOUBLE) AS ext_price
FROM date_dim, store_sales, item
WHERE d_date_sk = ss_sold_date_sk AND ss_item_sk = i_item_sk
  AND i_manager_id = 28 AND d_moy = 11 AND d_year = 1999
GROUP BY i_brand_id, i_brand
ORDER BY ext_price DESC, brand_id
LIMIT 100"""),
    "q65" -> (Seq("store", "item", "store_sales", "date_dim") ->
      """
SELECT s_store_name, i_item_desc, CAST(sc.revenue AS DOUBLE) AS revenue,
       CAST(i_current_price AS DOUBLE) AS i_current_price,
       CAST(i_wholesale_cost AS DOUBLE) AS i_wholesale_cost, i_brand
FROM store, item,
     (SELECT ss_store_sk, sum(revenue) AS sum_rev, count(*) AS cnt
      FROM (SELECT ss_store_sk, ss_item_sk, sum(ss_sales_price) AS revenue
            FROM store_sales, date_dim
            WHERE ss_sold_date_sk = d_date_sk AND d_month_seq BETWEEN 360 AND 371
            GROUP BY ss_store_sk, ss_item_sk) sa
      GROUP BY ss_store_sk) sb,
     (SELECT ss_store_sk, ss_item_sk, sum(ss_sales_price) AS revenue
      FROM store_sales, date_dim
      WHERE ss_sold_date_sk = d_date_sk AND d_month_seq BETWEEN 360 AND 371
      GROUP BY ss_store_sk, ss_item_sk) sc
WHERE sb.ss_store_sk = sc.ss_store_sk
  AND sc.revenue * 10 * sb.cnt <= sb.sum_rev
  AND s_store_sk = sc.ss_store_sk
  AND i_item_sk = sc.ss_item_sk
ORDER BY s_store_name, i_item_desc
LIMIT 100"""),
    "q67" -> (Seq("store_sales", "date_dim", "store", "item") ->
      """
SELECT * FROM (
  SELECT i_category, i_class, i_brand, i_product_name, d_year, d_qoy, d_moy,
         s_store_id, sumsales,
         rank() OVER (PARTITION BY i_category ORDER BY sumsales DESC) rk
  FROM (SELECT i_category, i_class, i_brand, i_product_name, d_year, d_qoy,
               d_moy, s_store_id,
               CAST(sum(coalesce(ss_sales_price * ss_quantity, 0)) AS DOUBLE) sumsales
        FROM store_sales, date_dim, store, item
        WHERE ss_sold_date_sk = d_date_sk AND ss_item_sk = i_item_sk
          AND ss_store_sk = s_store_sk AND d_month_seq BETWEEN 360 AND 371
        GROUP BY ROLLUP(i_category, i_class, i_brand, i_product_name, d_year,
                        d_qoy, d_moy, s_store_id)) dw1) dw2
WHERE rk <= 10
ORDER BY i_category NULLS FIRST, i_class NULLS FIRST, i_brand NULLS FIRST,
         i_product_name NULLS FIRST, d_year NULLS FIRST, d_qoy NULLS FIRST,
         d_moy NULLS FIRST, s_store_id NULLS FIRST, sumsales, rk
LIMIT 100"""),
    "q74" -> (Seq("customer", "store_sales", "web_sales", "date_dim") ->
      """
WITH year_total AS (
  SELECT c_customer_id customer_id, c_first_name customer_first_name,
         c_last_name customer_last_name, d_year year_,
         sum(ss_net_paid) year_total, 's' sale_type
  FROM customer, store_sales, date_dim
  WHERE c_customer_sk = ss_customer_sk AND ss_sold_date_sk = d_date_sk
    AND d_year IN (2000, 2001)
  GROUP BY c_customer_id, c_first_name, c_last_name, d_year
  UNION ALL
  SELECT c_customer_id customer_id, c_first_name customer_first_name,
         c_last_name customer_last_name, d_year year_,
         sum(ws_net_paid) year_total, 'w' sale_type
  FROM customer, web_sales, date_dim
  WHERE c_customer_sk = ws_bill_customer_sk AND ws_sold_date_sk = d_date_sk
    AND d_year IN (2000, 2001)
  GROUP BY c_customer_id, c_first_name, c_last_name, d_year)
SELECT t_s_secyear.customer_id, t_s_secyear.customer_first_name,
       t_s_secyear.customer_last_name
FROM year_total t_s_firstyear, year_total t_s_secyear,
     year_total t_w_firstyear, year_total t_w_secyear
WHERE t_s_secyear.customer_id = t_s_firstyear.customer_id
  AND t_s_firstyear.customer_id = t_w_secyear.customer_id
  AND t_s_firstyear.customer_id = t_w_firstyear.customer_id
  AND t_s_firstyear.sale_type = 's' AND t_w_firstyear.sale_type = 'w'
  AND t_s_secyear.sale_type = 's' AND t_w_secyear.sale_type = 'w'
  AND t_s_firstyear.year_ = 2000 AND t_s_secyear.year_ = 2001
  AND t_w_firstyear.year_ = 2000 AND t_w_secyear.year_ = 2001
  AND t_s_firstyear.year_total > 0 AND t_w_firstyear.year_total > 0
  AND t_w_secyear.year_total * t_s_firstyear.year_total
      > t_s_secyear.year_total * t_w_firstyear.year_total
ORDER BY t_s_secyear.customer_id, t_s_secyear.customer_first_name,
         t_s_secyear.customer_last_name
LIMIT 100"""),
    "q96" -> (Seq("store_sales", "household_demographics", "time_dim", "store") ->
      """
SELECT count(*) AS cnt
FROM store_sales, household_demographics, time_dim, store
WHERE ss_sold_time_sk = t_time_sk AND ss_hdemo_sk = hd_demo_sk
  AND ss_store_sk = s_store_sk
  AND t_hour = 20 AND t_minute >= 30
  AND hd_dep_count = 7 AND s_store_name = 'store3'
ORDER BY cnt
LIMIT 100"""),
    "q98" -> (Seq("store_sales", "item", "date_dim") ->
      """
SELECT i_item_id, i_item_desc, i_category, i_class,
       CAST(i_current_price AS DOUBLE) AS i_current_price,
       CAST(sum(ss_ext_sales_price) AS DOUBLE) AS itemrevenue,
       CAST(sum(ss_ext_sales_price) * 100 AS DOUBLE) /
         CAST(sum(sum(ss_ext_sales_price)) OVER (PARTITION BY i_class) AS DOUBLE)
         AS revenueratio
FROM store_sales, item, date_dim
WHERE ss_item_sk = i_item_sk
  AND i_category IN ('Sports', 'Books', 'Home')
  AND ss_sold_date_sk = d_date_sk
  AND d_date BETWEEN DATE '1999-02-22' AND DATE '1999-03-24'
GROUP BY i_item_id, i_item_desc, i_category, i_class, i_current_price
ORDER BY i_category, i_class, i_item_id, i_item_desc, revenueratio
LIMIT 100"""),
    "q9" -> (Seq("store_sales", "reason") ->
      """
SELECT CASE WHEN (SELECT count(*) FROM store_sales WHERE ss_quantity BETWEEN 1 AND 20) > 15000
            THEN (SELECT CAST(sum(ss_ext_discount_amt) AS DOUBLE) / count(*) FROM store_sales WHERE ss_quantity BETWEEN 1 AND 20)
            ELSE (SELECT CAST(sum(ss_net_paid) AS DOUBLE) / count(*) FROM store_sales WHERE ss_quantity BETWEEN 1 AND 20) END AS bucket1,
       CASE WHEN (SELECT count(*) FROM store_sales WHERE ss_quantity BETWEEN 21 AND 40) > 10000
            THEN (SELECT CAST(sum(ss_ext_discount_amt) AS DOUBLE) / count(*) FROM store_sales WHERE ss_quantity BETWEEN 21 AND 40)
            ELSE (SELECT CAST(sum(ss_net_paid) AS DOUBLE) / count(*) FROM store_sales WHERE ss_quantity BETWEEN 21 AND 40) END AS bucket2,
       CASE WHEN (SELECT count(*) FROM store_sales WHERE ss_quantity BETWEEN 41 AND 60) > 5000
            THEN (SELECT CAST(sum(ss_ext_discount_amt) AS DOUBLE) / count(*) FROM store_sales WHERE ss_quantity BETWEEN 41 AND 60)
            ELSE (SELECT CAST(sum(ss_net_paid) AS DOUBLE) / count(*) FROM store_sales WHERE ss_quantity BETWEEN 41 AND 60) END AS bucket3,
       CASE WHEN (SELECT count(*) FROM store_sales WHERE ss_quantity BETWEEN 61 AND 80) > 5000
            THEN (SELECT CAST(sum(ss_ext_discount_amt) AS DOUBLE) / count(*) FROM store_sales WHERE ss_quantity BETWEEN 61 AND 80)
            ELSE (SELECT CAST(sum(ss_net_paid) AS DOUBLE) / count(*) FROM store_sales WHERE ss_quantity BETWEEN 61 AND 80) END AS bucket4,
       CASE WHEN (SELECT count(*) FROM store_sales WHERE ss_quantity BETWEEN 81 AND 100) > 5000
            THEN (SELECT CAST(sum(ss_ext_discount_amt) AS DOUBLE) / count(*) FROM store_sales WHERE ss_quantity BETWEEN 81 AND 100)
            ELSE (SELECT CAST(sum(ss_net_paid) AS DOUBLE) / count(*) FROM store_sales WHERE ss_quantity BETWEEN 81 AND 100) END AS bucket5
FROM reason WHERE r_reason_sk = 1"""),
    "q13" -> (Seq("store_sales", "store", "customer_demographics", "household_demographics", "customer_address", "date_dim") ->
      """
SELECT CAST(sum(ss_quantity) AS DOUBLE) / count(*) AS avg_qty,
       CAST(sum(ss_ext_sales_price) AS DOUBLE) / count(*) AS avg_esp,
       CAST(sum(ss_ext_wholesale_cost) AS DOUBLE) / count(*) AS avg_ewc,
       CAST(sum(ss_ext_wholesale_cost) AS DOUBLE) AS sum_ewc
FROM store_sales, store, customer_demographics, household_demographics,
     customer_address, date_dim
WHERE s_store_sk = ss_store_sk AND ss_sold_date_sk = d_date_sk AND d_year = 2001
  AND ((ss_hdemo_sk = hd_demo_sk AND cd_demo_sk = ss_cdemo_sk
        AND cd_marital_status = 'M' AND cd_education_status = 'Advanced Degree'
        AND ss_sales_price BETWEEN 10.00 AND 60.00 AND hd_dep_count = 3)
    OR (ss_hdemo_sk = hd_demo_sk AND cd_demo_sk = ss_cdemo_sk
        AND cd_marital_status = 'S' AND cd_education_status = 'College'
        AND ss_sales_price BETWEEN 20.00 AND 70.00 AND hd_dep_count = 1)
    OR (ss_hdemo_sk = hd_demo_sk AND cd_demo_sk = ss_cdemo_sk
        AND cd_marital_status = 'W' AND cd_education_status = '2 yr Degree'
        AND ss_sales_price BETWEEN 50.00 AND 100.00 AND hd_dep_count = 1))
  AND ((ss_addr_sk = ca_address_sk AND ca_country = 'United States'
        AND ca_state IN ('TX', 'OH', 'TX') AND ss_net_profit BETWEEN 100 AND 200)
    OR (ss_addr_sk = ca_address_sk AND ca_country = 'United States'
        AND ca_state IN ('OR', 'NM', 'KY') AND ss_net_profit BETWEEN 150 AND 300)
    OR (ss_addr_sk = ca_address_sk AND ca_country = 'United States'
        AND ca_state IN ('VA', 'TX', 'MS') AND ss_net_profit BETWEEN 50 AND 250))"""),
    "q27" -> (Seq("store_sales", "customer_demographics", "date_dim", "store", "item") ->
      """
SELECT i_item_id, s_state, grouping(s_state) AS g_state,
       CAST(sum(ss_quantity) AS DOUBLE) / count(*) AS agg1,
       CAST(sum(ss_list_price) AS DOUBLE) / count(*) AS agg2,
       CAST(sum(ss_coupon_amt) AS DOUBLE) / count(*) AS agg3,
       CAST(sum(ss_sales_price) AS DOUBLE) / count(*) AS agg4
FROM store_sales, customer_demographics, date_dim, store, item
WHERE ss_sold_date_sk = d_date_sk AND ss_item_sk = i_item_sk
  AND ss_store_sk = s_store_sk AND ss_cdemo_sk = cd_demo_sk
  AND cd_gender = 'F' AND cd_marital_status = 'M'
  AND cd_education_status = '4 yr Degree'
  AND d_year = 2000 AND s_state IN ('TN', 'SC', 'CA', 'TX', 'OH')
GROUP BY ROLLUP(i_item_id, s_state)
ORDER BY i_item_id NULLS FIRST, s_state NULLS FIRST
LIMIT 100"""),
    "q36" -> (Seq("store_sales", "date_dim", "item", "store") ->
      """
SELECT CAST(sum(ss_net_profit) AS DOUBLE) / CAST(sum(ss_ext_sales_price) AS DOUBLE) AS gross_margin,
       i_category, i_class,
       grouping(i_category) + grouping(i_class) AS lochierarchy,
       rank() OVER (
         PARTITION BY grouping(i_category) + grouping(i_class),
                      CASE WHEN grouping(i_class) = 0 THEN i_category END
         ORDER BY CAST(sum(ss_net_profit) AS DOUBLE) / CAST(sum(ss_ext_sales_price) AS DOUBLE) ASC) AS rank_within_parent
FROM store_sales, date_dim d1, item, store
WHERE d1.d_year = 2001 AND d1.d_date_sk = ss_sold_date_sk
  AND i_item_sk = ss_item_sk AND s_store_sk = ss_store_sk
  AND s_state IN ('TN', 'SC', 'CA', 'TX', 'OH')
GROUP BY ROLLUP(i_category, i_class)
ORDER BY lochierarchy DESC, CASE WHEN lochierarchy = 0 THEN i_category END NULLS FIRST,
         rank_within_parent, i_category NULLS FIRST, i_class NULLS FIRST
LIMIT 100"""),
    "q53" -> (Seq("item", "store_sales", "date_dim", "store") ->
      """
SELECT manufact_id, sum_sales,
       CAST(total AS DOUBLE) / cnt AS avg_quarterly_sales
FROM (SELECT manufact_id, sum_sales, sum_sales_dec,
             sum(sum_sales_dec) OVER (PARTITION BY manufact_id) AS total,
             count(*) OVER (PARTITION BY manufact_id) AS cnt
      FROM (SELECT i_manufact_id AS manufact_id,
                   CAST(sum(ss_sales_price) AS DOUBLE) AS sum_sales,
                   sum(ss_sales_price) AS sum_sales_dec
            FROM item, store_sales, date_dim, store
            WHERE ss_item_sk = i_item_sk AND ss_sold_date_sk = d_date_sk
              AND ss_store_sk = s_store_sk
              AND d_month_seq BETWEEN 360 AND 371
              AND ((i_category IN ('Books', 'Children', 'Electronics')
                    AND i_class IN ('class1', 'class2', 'class3'))
                OR (i_category IN ('Women', 'Music', 'Men')
                    AND i_class IN ('class8', 'class9', 'class10')))
            GROUP BY i_manufact_id, d_qoy) tmp1) tmp2
WHERE total > 0 AND 10 * abs(sum_sales_dec * cnt - total) > total
ORDER BY manufact_id, sum_sales
LIMIT 100"""),
    "q59" -> (Seq("store_sales", "date_dim", "store") ->
      """
WITH wss AS (
  SELECT d_week_seq, ss_store_sk,
         sum(CASE WHEN d_day_name = 'Sunday' THEN ss_sales_price ELSE NULL END) sun_sales,
         sum(CASE WHEN d_day_name = 'Monday' THEN ss_sales_price ELSE NULL END) mon_sales,
         sum(CASE WHEN d_day_name = 'Tuesday' THEN ss_sales_price ELSE NULL END) tue_sales,
         sum(CASE WHEN d_day_name = 'Wednesday' THEN ss_sales_price ELSE NULL END) wed_sales,
         sum(CASE WHEN d_day_name = 'Thursday' THEN ss_sales_price ELSE NULL END) thu_sales,
         sum(CASE WHEN d_day_name = 'Friday' THEN ss_sales_price ELSE NULL END) fri_sales,
         sum(CASE WHEN d_day_name = 'Saturday' THEN ss_sales_price ELSE NULL END) sat_sales
  FROM store_sales, date_dim
  WHERE d_date_sk = ss_sold_date_sk
  GROUP BY d_week_seq, ss_store_sk)
SELECT s_store_name1, s_store_id1, d_week_seq1,
       CAST(sun_sales1 AS DOUBLE) / CAST(sun_sales2 AS DOUBLE) AS sun_r,
       CAST(mon_sales1 AS DOUBLE) / CAST(mon_sales2 AS DOUBLE) AS mon_r,
       CAST(tue_sales1 AS DOUBLE) / CAST(tue_sales2 AS DOUBLE) AS tue_r,
       CAST(wed_sales1 AS DOUBLE) / CAST(wed_sales2 AS DOUBLE) AS wed_r,
       CAST(thu_sales1 AS DOUBLE) / CAST(thu_sales2 AS DOUBLE) AS thu_r,
       CAST(fri_sales1 AS DOUBLE) / CAST(fri_sales2 AS DOUBLE) AS fri_r,
       CAST(sat_sales1 AS DOUBLE) / CAST(sat_sales2 AS DOUBLE) AS sat_r
FROM (SELECT s_store_name s_store_name1, wss.d_week_seq d_week_seq1,
             s_store_id s_store_id1, sun_sales sun_sales1, mon_sales mon_sales1,
             tue_sales tue_sales1, wed_sales wed_sales1, thu_sales thu_sales1,
             fri_sales fri_sales1, sat_sales sat_sales1
      FROM wss, store, date_dim d
      WHERE d.d_week_seq = wss.d_week_seq AND ss_store_sk = s_store_sk
        AND d_month_seq BETWEEN 360 AND 371) y,
     (SELECT s_store_name s_store_name2, wss.d_week_seq d_week_seq2,
             s_store_id s_store_id2, sun_sales sun_sales2, mon_sales mon_sales2,
             tue_sales tue_sales2, wed_sales wed_sales2, thu_sales thu_sales2,
             fri_sales fri_sales2, sat_sales sat_sales2
      FROM wss, store, date_dim d
      WHERE d.d_week_seq = wss.d_week_seq AND ss_store_sk = s_store_sk
        AND d_month_seq BETWEEN 372 AND 383) x
WHERE s_store_id1 = s_store_id2 AND d_week_seq1 = d_week_seq2 - 52
ORDER BY s_store_name1, s_store_id1, d_week_seq1
LIMIT 100"""),
    "q61" -> (Seq("store_sales", "store", "promotion", "date_dim", "customer", "customer_address", "item") ->
      """
SELECT CAST(promotions AS DOUBLE) AS promotions, CAST(total AS DOUBLE) AS total,
       CAST(promotions AS DOUBLE) / CAST(total AS DOUBLE) * 100 AS pct
FROM (SELECT sum(ss_ext_sales_price) promotions
      FROM store_sales, store, promotion, date_dim, customer, customer_address, item
      WHERE ss_sold_date_sk = d_date_sk AND ss_store_sk = s_store_sk
        AND ss_promo_sk = p_promo_sk AND ss_customer_sk = c_customer_sk
        AND ca_address_sk = c_current_addr_sk AND ss_item_sk = i_item_sk
        AND ca_gmt_offset = -5 AND i_category = 'Jewelry'
        AND (p_channel_dmail = 'Y' OR p_channel_email = 'Y' OR p_channel_tv = 'Y')
        AND s_gmt_offset = -5 AND d_year = 1998 AND d_moy = 11) promotional_sales,
     (SELECT sum(ss_ext_sales_price) total
      FROM store_sales, store, date_dim, customer, customer_address, item
      WHERE ss_sold_date_sk = d_date_sk AND ss_store_sk = s_store_sk
        AND ss_customer_sk = c_customer_sk AND ca_address_sk = c_current_addr_sk
        AND ss_item_sk = i_item_sk AND ca_gmt_offset = -5
        AND i_category = 'Jewelry' AND s_gmt_offset = -5
        AND d_year = 1998 AND d_moy = 11) all_sales
ORDER BY promotions, total
LIMIT 100"""),
    "q62" -> (Seq("web_sales", "warehouse", "ship_mode", "web_site", "date_dim") ->
      """
SELECT substr(w_warehouse_name, 1, 20) AS wh, sm_type, web_name,
       CAST(sum(CASE WHEN (ws_ship_date_sk - ws_sold_date_sk <= 30) THEN 1 ELSE 0 END) AS BIGINT) AS d30,
       CAST(sum(CASE WHEN (ws_ship_date_sk - ws_sold_date_sk > 30)
                      AND (ws_ship_date_sk - ws_sold_date_sk <= 60) THEN 1 ELSE 0 END) AS BIGINT) AS d60,
       CAST(sum(CASE WHEN (ws_ship_date_sk - ws_sold_date_sk > 60)
                      AND (ws_ship_date_sk - ws_sold_date_sk <= 90) THEN 1 ELSE 0 END) AS BIGINT) AS d90,
       CAST(sum(CASE WHEN (ws_ship_date_sk - ws_sold_date_sk > 90)
                      AND (ws_ship_date_sk - ws_sold_date_sk <= 120) THEN 1 ELSE 0 END) AS BIGINT) AS d120,
       CAST(sum(CASE WHEN (ws_ship_date_sk - ws_sold_date_sk > 120) THEN 1 ELSE 0 END) AS BIGINT) AS d120p
FROM web_sales, warehouse, ship_mode, web_site, date_dim
WHERE d_month_seq BETWEEN 360 AND 371
  AND ws_ship_date_sk = d_date_sk AND ws_warehouse_sk = w_warehouse_sk
  AND ws_ship_mode_sk = sm_ship_mode_sk AND ws_web_site_sk = web_site_sk
GROUP BY substr(w_warehouse_name, 1, 20), sm_type, web_name
ORDER BY wh, sm_type, web_name
LIMIT 100"""),
    "q79" -> (Seq("store_sales", "date_dim", "store", "household_demographics", "customer") ->
      """
SELECT c_last_name, c_first_name, substr(s_city, 1, 30) AS city,
       ss_ticket_number, CAST(amt AS DOUBLE) AS amt, CAST(profit AS DOUBLE) AS profit
FROM (SELECT ss_ticket_number, ss_customer_sk, store.s_city,
             sum(ss_coupon_amt) amt, sum(ss_net_profit) profit
      FROM store_sales, date_dim, store, household_demographics
      WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
        AND store_sales.ss_store_sk = store.s_store_sk
        AND store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
        AND (household_demographics.hd_dep_count = 6
             OR household_demographics.hd_vehicle_count > 2)
        AND date_dim.d_dow = 1 AND d_year = 2000
        AND store.s_number_employees BETWEEN 100 AND 295
      GROUP BY ss_ticket_number, ss_customer_sk, ss_addr_sk, store.s_city) ms,
     customer
WHERE ss_customer_sk = c_customer_sk
ORDER BY c_last_name, c_first_name, city, profit, ss_ticket_number, amt
LIMIT 100"""),
    "q89" -> (Seq("item", "store_sales", "date_dim", "store") ->
      """
SELECT i_category, i_class, i_brand, s_store_name, s_company_id, d_moy, sum_sales,
       CAST(total AS DOUBLE) / cnt AS avg_monthly_sales
FROM (SELECT i_category, i_class, i_brand, s_store_name, s_company_id, d_moy,
             sum_sales, sum_sales_dec,
             sum(sum_sales_dec) OVER (PARTITION BY i_category, i_brand,
               s_store_name, s_company_id) AS total,
             count(*) OVER (PARTITION BY i_category, i_brand,
               s_store_name, s_company_id) AS cnt
      FROM (SELECT i_category, i_class, i_brand, s_store_name, s_company_id,
                   d_moy, CAST(sum(ss_sales_price) AS DOUBLE) AS sum_sales,
                   sum(ss_sales_price) AS sum_sales_dec
            FROM item, store_sales, date_dim, store
            WHERE ss_item_sk = i_item_sk AND ss_sold_date_sk = d_date_sk
              AND ss_store_sk = s_store_sk AND d_year = 2000
              AND ((i_category IN ('Books', 'Electronics', 'Sports')
                    AND i_class IN ('class1', 'class4', 'class7'))
                OR (i_category IN ('Men', 'Jewelry', 'Women')
                    AND i_class IN ('class2', 'class5', 'class11')))
            GROUP BY i_category, i_class, i_brand, s_store_name, s_company_id,
                     d_moy) tmp1) tmp2
WHERE total > 0 AND 10 * abs(sum_sales_dec * cnt - total) > total
ORDER BY CAST(total AS DOUBLE) / cnt - sum_sales, s_store_name, i_category,
         i_class, i_brand, d_moy
LIMIT 100"""),
    "q99" -> (Seq("catalog_sales", "warehouse", "ship_mode", "call_center", "date_dim") ->
      """
SELECT substr(w_warehouse_name, 1, 20) AS wh, sm_type, cc_name,
       CAST(sum(CASE WHEN (cs_ship_date_sk - cs_sold_date_sk <= 30) THEN 1 ELSE 0 END) AS BIGINT) AS d30,
       CAST(sum(CASE WHEN (cs_ship_date_sk - cs_sold_date_sk > 30)
                      AND (cs_ship_date_sk - cs_sold_date_sk <= 60) THEN 1 ELSE 0 END) AS BIGINT) AS d60,
       CAST(sum(CASE WHEN (cs_ship_date_sk - cs_sold_date_sk > 60)
                      AND (cs_ship_date_sk - cs_sold_date_sk <= 90) THEN 1 ELSE 0 END) AS BIGINT) AS d90,
       CAST(sum(CASE WHEN (cs_ship_date_sk - cs_sold_date_sk > 90)
                      AND (cs_ship_date_sk - cs_sold_date_sk <= 120) THEN 1 ELSE 0 END) AS BIGINT) AS d120,
       CAST(sum(CASE WHEN (cs_ship_date_sk - cs_sold_date_sk > 120) THEN 1 ELSE 0 END) AS BIGINT) AS d120p
FROM catalog_sales, warehouse, ship_mode, call_center, date_dim
WHERE d_month_seq BETWEEN 360 AND 371
  AND cs_ship_date_sk = d_date_sk AND cs_warehouse_sk = w_warehouse_sk
  AND cs_ship_mode_sk = sm_ship_mode_sk AND cs_call_center_sk = cc_call_center_sk
GROUP BY substr(w_warehouse_name, 1, 20), sm_type, cc_name
ORDER BY wh, sm_type, cc_name
LIMIT 100"""),
    "q32" -> (Seq("catalog_sales", "item", "date_dim") ->
      """
SELECT CAST(sum(cs_ext_discount_amt) AS DOUBLE) AS excess_discount_amount
FROM catalog_sales, item, date_dim
WHERE i_manufact_id = 77 AND i_item_sk = cs_item_sk
  AND d_date BETWEEN DATE '2000-01-27' AND DATE '2000-04-26'
  AND d_date_sk = cs_sold_date_sk
  AND cs_ext_discount_amt * 10 * (
        SELECT count(*) FROM catalog_sales, date_dim
        WHERE cs_item_sk = i_item_sk
          AND d_date BETWEEN DATE '2000-01-27' AND DATE '2000-04-26'
          AND d_date_sk = cs_sold_date_sk)
      > 13 * (
        SELECT sum(cs_ext_discount_amt) FROM catalog_sales, date_dim
        WHERE cs_item_sk = i_item_sk
          AND d_date BETWEEN DATE '2000-01-27' AND DATE '2000-04-26'
          AND d_date_sk = cs_sold_date_sk)"""),
    "q34" -> (Seq("store_sales", "date_dim", "store", "household_demographics", "customer") ->
      """
SELECT c_last_name, c_first_name, c_salutation, c_preferred_cust_flag,
       ss_ticket_number, cnt
FROM (SELECT ss_ticket_number, ss_customer_sk, count(*) cnt
      FROM store_sales, date_dim, store, household_demographics
      WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
        AND store_sales.ss_store_sk = store.s_store_sk
        AND store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
        AND (date_dim.d_dom BETWEEN 1 AND 3 OR date_dim.d_dom BETWEEN 25 AND 28)
        AND household_demographics.hd_buy_potential IN ('>10000', 'Unknown')
        AND household_demographics.hd_vehicle_count > 0
        AND household_demographics.hd_dep_count > 2
        AND date_dim.d_year IN (2000, 2001, 2002)
        AND store.s_county IN ('county0', 'county1', 'county2', 'county3')
      GROUP BY ss_ticket_number, ss_customer_sk) dn, customer
WHERE ss_customer_sk = c_customer_sk AND cnt BETWEEN 1 AND 20
ORDER BY c_last_name, c_first_name, c_salutation, c_preferred_cust_flag DESC,
         ss_ticket_number
LIMIT 100"""),
    "q45" -> (Seq("web_sales", "customer", "customer_address", "date_dim", "item") ->
      """
SELECT ca_zip, ca_city, CAST(sum(ws_sales_price) AS DOUBLE) AS sum_sales
FROM web_sales, customer, customer_address, date_dim, item
WHERE ws_bill_customer_sk = c_customer_sk
  AND c_current_addr_sk = ca_address_sk
  AND ws_item_sk = i_item_sk
  AND (substr(ca_zip, 1, 5) IN ('85669', '86197', '88274', '83405', '86475',
                                '85392', '85460', '80348', '81792')
       OR i_item_id IN (SELECT i_item_id FROM item
                        WHERE i_item_sk IN (2, 3, 5, 7, 11, 13, 17, 19, 23)))
  AND ws_sold_date_sk = d_date_sk AND d_qoy = 2 AND d_year = 2001
GROUP BY ca_zip, ca_city
ORDER BY ca_zip, ca_city
LIMIT 100"""),
    "q48" -> (Seq("store_sales", "store", "customer_demographics", "customer_address", "date_dim") ->
      """
SELECT CAST(sum(ss_quantity) AS BIGINT) AS total_qty
FROM store_sales, store, customer_demographics, customer_address, date_dim
WHERE s_store_sk = ss_store_sk AND ss_sold_date_sk = d_date_sk AND d_year = 2000
  AND ((cd_demo_sk = ss_cdemo_sk AND cd_marital_status = 'M'
        AND cd_education_status = '4 yr Degree'
        AND ss_sales_price BETWEEN 50.00 AND 100.00)
    OR (cd_demo_sk = ss_cdemo_sk AND cd_marital_status = 'D'
        AND cd_education_status = '2 yr Degree'
        AND ss_sales_price BETWEEN 10.00 AND 60.00)
    OR (cd_demo_sk = ss_cdemo_sk AND cd_marital_status = 'S'
        AND cd_education_status = 'College'
        AND ss_sales_price BETWEEN 70.00 AND 120.00))
  AND ((ss_addr_sk = ca_address_sk AND ca_country = 'United States'
        AND ca_state IN ('CA', 'OH', 'TX') AND ss_net_profit BETWEEN 0 AND 2000)
    OR (ss_addr_sk = ca_address_sk AND ca_country = 'United States'
        AND ca_state IN ('OR', 'NM', 'KY') AND ss_net_profit BETWEEN 150 AND 3000)
    OR (ss_addr_sk = ca_address_sk AND ca_country = 'United States'
        AND ca_state IN ('TX', 'VA', 'MS') AND ss_net_profit BETWEEN 50 AND 25000))"""),
    "q68" -> (Seq("store_sales", "date_dim", "store", "household_demographics", "customer_address", "customer") ->
      """
SELECT c_last_name, c_first_name, ca_city, bought_city, ss_ticket_number,
       CAST(extended_price AS DOUBLE) AS extended_price,
       CAST(extended_tax AS DOUBLE) AS extended_tax,
       CAST(list_price AS DOUBLE) AS list_price
FROM (SELECT ss_ticket_number, ss_customer_sk, ca_city bought_city,
             sum(ss_ext_sales_price) extended_price,
             sum(ss_ext_list_price) list_price,
             sum(ss_ext_tax) extended_tax
      FROM store_sales, date_dim, store, household_demographics, customer_address
      WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
        AND store_sales.ss_store_sk = store.s_store_sk
        AND store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
        AND store_sales.ss_addr_sk = customer_address.ca_address_sk
        AND date_dim.d_dom BETWEEN 1 AND 2
        AND (household_demographics.hd_dep_count = 4
             OR household_demographics.hd_vehicle_count = 3)
        AND date_dim.d_year IN (1999, 2000, 2001)
        AND store.s_city IN ('city0', 'city1')
      GROUP BY ss_ticket_number, ss_customer_sk, ss_addr_sk, ca_city) dn,
     customer, customer_address current_addr
WHERE ss_customer_sk = c_customer_sk
  AND customer.c_current_addr_sk = current_addr.ca_address_sk
  AND current_addr.ca_city <> bought_city
ORDER BY c_last_name, c_first_name, ca_city, bought_city, ss_ticket_number,
         extended_price, extended_tax, list_price
LIMIT 100"""),
    "q73" -> (Seq("store_sales", "date_dim", "store", "household_demographics", "customer") ->
      """
SELECT c_last_name, c_first_name, c_salutation, c_preferred_cust_flag,
       ss_ticket_number, cnt
FROM (SELECT ss_ticket_number, ss_customer_sk, count(*) cnt
      FROM store_sales, date_dim, store, household_demographics
      WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
        AND store_sales.ss_store_sk = store.s_store_sk
        AND store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
        AND date_dim.d_dom BETWEEN 1 AND 2
        AND household_demographics.hd_buy_potential IN ('>10000', 'Unknown')
        AND household_demographics.hd_vehicle_count > 0
        AND household_demographics.hd_dep_count > 3
        AND date_dim.d_year IN (2000, 2001, 2002)
        AND store.s_county IN ('county0', 'county1', 'county2', 'county3')
      GROUP BY ss_ticket_number, ss_customer_sk) dj, customer
WHERE ss_customer_sk = c_customer_sk AND cnt BETWEEN 1 AND 5
ORDER BY cnt DESC, c_last_name ASC, c_first_name, c_salutation,
         c_preferred_cust_flag, ss_ticket_number
LIMIT 100"""),
    "q88" -> (Seq("store_sales", "household_demographics", "time_dim", "store") ->
      """
SELECT * FROM
 (SELECT count(*) h8_30_to_9 FROM store_sales, household_demographics, time_dim, store
  WHERE ss_sold_time_sk = t_time_sk AND ss_hdemo_sk = hd_demo_sk AND ss_store_sk = s_store_sk
    AND t_hour = 8 AND t_minute >= 30
    AND ((hd_dep_count = 4 AND hd_vehicle_count <= 6)
      OR (hd_dep_count = 2 AND hd_vehicle_count <= 4)
      OR (hd_dep_count = 0 AND hd_vehicle_count <= 2))
    AND store.s_store_name = 'store3') s1,
 (SELECT count(*) h9_to_9_30 FROM store_sales, household_demographics, time_dim, store
  WHERE ss_sold_time_sk = t_time_sk AND ss_hdemo_sk = hd_demo_sk AND ss_store_sk = s_store_sk
    AND t_hour = 9 AND t_minute < 30
    AND ((hd_dep_count = 4 AND hd_vehicle_count <= 6)
      OR (hd_dep_count = 2 AND hd_vehicle_count <= 4)
      OR (hd_dep_count = 0 AND hd_vehicle_count <= 2))
    AND store.s_store_name = 'store3') s2,
 (SELECT count(*) h9_30_to_10 FROM store_sales, household_demographics, time_dim, store
  WHERE ss_sold_time_sk = t_time_sk AND ss_hdemo_sk = hd_demo_sk AND ss_store_sk = s_store_sk
    AND t_hour = 9 AND t_minute >= 30
    AND ((hd_dep_count = 4 AND hd_vehicle_count <= 6)
      OR (hd_dep_count = 2 AND hd_vehicle_count <= 4)
      OR (hd_dep_count = 0 AND hd_vehicle_count <= 2))
    AND store.s_store_name = 'store3') s3,
 (SELECT count(*) h10_to_10_30 FROM store_sales, household_demographics, time_dim, store
  WHERE ss_sold_time_sk = t_time_sk AND ss_hdemo_sk = hd_demo_sk AND ss_store_sk = s_store_sk
    AND t_hour = 10 AND t_minute < 30
    AND ((hd_dep_count = 4 AND hd_vehicle_count <= 6)
      OR (hd_dep_count = 2 AND hd_vehicle_count <= 4)
      OR (hd_dep_count = 0 AND hd_vehicle_count <= 2))
    AND store.s_store_name = 'store3') s4"""),
    "q92" -> (Seq("web_sales", "item", "date_dim") ->
      """
SELECT CAST(sum(ws_ext_discount_amt) AS DOUBLE) AS excess_discount_amount
FROM web_sales, item, date_dim
WHERE i_manufact_id = 35 AND i_item_sk = ws_item_sk
  AND d_date BETWEEN DATE '2000-01-27' AND DATE '2000-04-26'
  AND d_date_sk = ws_sold_date_sk
  AND ws_ext_discount_amt * 10 * (
        SELECT count(*) FROM web_sales, date_dim
        WHERE ws_item_sk = i_item_sk
          AND d_date BETWEEN DATE '2000-01-27' AND DATE '2000-04-26'
          AND d_date_sk = ws_sold_date_sk)
      > 13 * (
        SELECT sum(ws_ext_discount_amt) FROM web_sales, date_dim
        WHERE ws_item_sk = i_item_sk
          AND d_date BETWEEN DATE '2000-01-27' AND DATE '2000-04-26'
          AND d_date_sk = ws_sold_date_sk)"""),
    "q93" -> (Seq("store_sales", "store_returns", "reason") ->
      """
SELECT ss_customer_sk, CAST(sum(act_sales) AS DOUBLE) AS sumsales
FROM (SELECT ss_item_sk, ss_ticket_number, ss_customer_sk,
             CASE WHEN sr_return_quantity IS NOT NULL
                  THEN (ss_quantity - sr_return_quantity) * ss_sales_price
                  ELSE ss_quantity * ss_sales_price END act_sales
      FROM store_sales
      LEFT OUTER JOIN store_returns
        ON sr_item_sk = ss_item_sk AND sr_ticket_number = ss_ticket_number
      JOIN reason ON sr_reason_sk = r_reason_sk
      WHERE r_reason_desc = 'reason 3') t
GROUP BY ss_customer_sk
HAVING ss_customer_sk IS NOT NULL
ORDER BY sumsales, ss_customer_sk
LIMIT 100"""),
    "q94" -> (Seq("web_sales", "web_returns", "date_dim", "customer_address", "web_site") ->
      """
SELECT count(DISTINCT ws1.ws_order_number) AS order_count,
       CAST(sum(ws1.ws_ext_ship_cost) AS DOUBLE) AS total_shipping_cost,
       CAST(sum(ws1.ws_net_profit) AS DOUBLE) AS total_net_profit
FROM web_sales ws1, date_dim, customer_address, web_site
WHERE d_date BETWEEN DATE '2000-02-01' AND DATE '2000-04-01'
  AND ws1.ws_ship_date_sk = d_date_sk
  AND ws1.ws_ship_addr_sk = ca_address_sk AND ca_state = 'CA'
  AND ws1.ws_web_site_sk = web_site_sk AND web_name IN ('site 0', 'site 1')
  AND EXISTS (SELECT 1 FROM web_sales ws2
              WHERE ws1.ws_order_number = ws2.ws_order_number
                AND ws1.ws_warehouse_sk <> ws2.ws_warehouse_sk)
  AND NOT EXISTS (SELECT 1 FROM web_returns wr1
                  WHERE ws1.ws_order_number = wr1.wr_order_number)"""),
    "q97" -> (Seq("store_sales", "date_dim", "catalog_sales") ->
      """
WITH ssci AS (
  SELECT ss_customer_sk customer_sk, ss_item_sk item_sk
  FROM store_sales, date_dim
  WHERE ss_sold_date_sk = d_date_sk AND d_month_seq BETWEEN 360 AND 371
  GROUP BY ss_customer_sk, ss_item_sk),
csci AS (
  SELECT cs_bill_customer_sk customer_sk, cs_item_sk item_sk
  FROM catalog_sales, date_dim
  WHERE cs_sold_date_sk = d_date_sk AND d_month_seq BETWEEN 360 AND 371
  GROUP BY cs_bill_customer_sk, cs_item_sk)
SELECT CAST(sum(CASE WHEN ssci.customer_sk IS NOT NULL AND csci.customer_sk IS NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS store_only,
       CAST(sum(CASE WHEN ssci.customer_sk IS NULL AND csci.customer_sk IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS catalog_only,
       CAST(sum(CASE WHEN ssci.customer_sk IS NOT NULL AND csci.customer_sk IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS store_and_catalog
FROM ssci FULL OUTER JOIN csci
  ON ssci.customer_sk = csci.customer_sk AND ssci.item_sk = csci.item_sk"""),
    "q1" -> (Seq("store_returns", "date_dim", "store", "customer") ->
      """
WITH customer_total_return AS (
  SELECT sr_customer_sk ctr_customer_sk, sr_store_sk ctr_store_sk,
         sum(sr_return_amt) ctr_total_return
  FROM store_returns, date_dim
  WHERE sr_returned_date_sk = d_date_sk AND d_year = 2000
  GROUP BY sr_customer_sk, sr_store_sk)
SELECT c_customer_id
FROM customer_total_return ctr1, store, customer
WHERE ctr1.ctr_total_return * 10 *
        (SELECT count(*) FROM customer_total_return ctr2
         WHERE ctr1.ctr_store_sk = ctr2.ctr_store_sk)
      > 12 * (SELECT sum(ctr_total_return) FROM customer_total_return ctr2
              WHERE ctr1.ctr_store_sk = ctr2.ctr_store_sk)
  AND s_store_sk = ctr1.ctr_store_sk AND s_state = 'TN'
  AND ctr1.ctr_customer_sk = c_customer_sk
ORDER BY c_customer_id
LIMIT 100"""),
    "q4" -> (Seq("customer", "store_sales", "catalog_sales", "web_sales", "date_dim") ->
      """
WITH year_total AS (
  SELECT c_customer_id customer_id, c_first_name customer_first_name,
         c_last_name customer_last_name, d_year dyear,
         sum(((ss_ext_list_price - ss_ext_wholesale_cost - ss_ext_discount_amt)
              + ss_ext_sales_price) / 2) year_total,
         's' sale_type
  FROM customer, store_sales, date_dim
  WHERE c_customer_sk = ss_customer_sk AND ss_sold_date_sk = d_date_sk
  GROUP BY c_customer_id, c_first_name, c_last_name, d_year
  UNION ALL
  SELECT c_customer_id, c_first_name, c_last_name, d_year,
         sum(((cs_ext_list_price - cs_ext_wholesale_cost - cs_ext_discount_amt)
              + cs_ext_sales_price) / 2),
         'c'
  FROM customer, catalog_sales, date_dim
  WHERE c_customer_sk = cs_bill_customer_sk AND cs_sold_date_sk = d_date_sk
  GROUP BY c_customer_id, c_first_name, c_last_name, d_year
  UNION ALL
  SELECT c_customer_id, c_first_name, c_last_name, d_year,
         sum(((ws_ext_list_price - ws_ext_wholesale_cost - ws_ext_discount_amt)
              + ws_ext_sales_price) / 2),
         'w'
  FROM customer, web_sales, date_dim
  WHERE c_customer_sk = ws_bill_customer_sk AND ws_sold_date_sk = d_date_sk
  GROUP BY c_customer_id, c_first_name, c_last_name, d_year)
SELECT t_s_secyear.customer_id, t_s_secyear.customer_first_name,
       t_s_secyear.customer_last_name
FROM year_total t_s_firstyear, year_total t_s_secyear,
     year_total t_c_firstyear, year_total t_c_secyear,
     year_total t_w_firstyear, year_total t_w_secyear
WHERE t_s_secyear.customer_id = t_s_firstyear.customer_id
  AND t_s_firstyear.customer_id = t_c_secyear.customer_id
  AND t_s_firstyear.customer_id = t_c_firstyear.customer_id
  AND t_s_firstyear.customer_id = t_w_firstyear.customer_id
  AND t_s_firstyear.customer_id = t_w_secyear.customer_id
  AND t_s_firstyear.sale_type = 's' AND t_c_firstyear.sale_type = 'c'
  AND t_w_firstyear.sale_type = 'w' AND t_s_secyear.sale_type = 's'
  AND t_c_secyear.sale_type = 'c' AND t_w_secyear.sale_type = 'w'
  AND t_s_firstyear.dyear = 2000 AND t_s_secyear.dyear = 2001
  AND t_c_firstyear.dyear = 2000 AND t_c_secyear.dyear = 2001
  AND t_w_firstyear.dyear = 2000 AND t_w_secyear.dyear = 2001
  AND t_s_firstyear.year_total > 0 AND t_c_firstyear.year_total > 0
  AND t_w_firstyear.year_total > 0
  AND t_c_secyear.year_total * t_s_firstyear.year_total
      > t_s_secyear.year_total * t_c_firstyear.year_total
  AND t_c_secyear.year_total * t_w_firstyear.year_total
      > t_w_secyear.year_total * t_c_firstyear.year_total
ORDER BY t_s_secyear.customer_id, t_s_secyear.customer_first_name,
         t_s_secyear.customer_last_name
LIMIT 100"""),
    "q18" -> (Seq("catalog_sales", "customer_demographics", "customer", "customer_address", "date_dim", "item") ->
      """
SELECT i_item_id, ca_country, ca_state, ca_county,
       CAST(sum(cs_quantity) AS DOUBLE) / count(*) AS agg1,
       CAST(sum(cs_list_price) AS DOUBLE) / count(*) AS agg2,
       CAST(sum(cs_coupon_amt) AS DOUBLE) / count(*) AS agg3,
       CAST(sum(cs_sales_price) AS DOUBLE) / count(*) AS agg4,
       CAST(sum(cs_net_profit) AS DOUBLE) / count(*) AS agg5,
       CAST(sum(c_birth_year) AS DOUBLE) / count(*) AS agg6,
       CAST(sum(cd1.cd_dep_count) AS DOUBLE) / count(*) AS agg7
FROM catalog_sales, customer_demographics cd1, customer_demographics cd2,
     customer, customer_address, date_dim, item
WHERE cs_sold_date_sk = d_date_sk AND cs_item_sk = i_item_sk
  AND cs_bill_cdemo_sk = cd1.cd_demo_sk AND cs_bill_customer_sk = c_customer_sk
  AND cd1.cd_gender = 'F' AND cd1.cd_education_status = 'Unknown'
  AND c_current_cdemo_sk = cd2.cd_demo_sk
  AND c_current_addr_sk = ca_address_sk
  AND c_birth_month IN (1, 6, 8, 9, 12, 2) AND d_year = 1998
  AND ca_state IN ('CA', 'TX', 'OH', 'TN', 'NY', 'FL', 'IL')
GROUP BY ROLLUP(i_item_id, ca_country, ca_state, ca_county)
ORDER BY ca_country NULLS FIRST, ca_state NULLS FIRST, ca_county NULLS FIRST,
         i_item_id NULLS FIRST
LIMIT 100"""),
    "q21" -> (Seq("inventory", "warehouse", "item", "date_dim") ->
      """
SELECT w_warehouse_name, i_item_id,
       CAST(sum(CASE WHEN d_date < DATE '2000-03-11' THEN inv_quantity_on_hand
                     ELSE 0 END) AS BIGINT) AS inv_before,
       CAST(sum(CASE WHEN d_date >= DATE '2000-03-11' THEN inv_quantity_on_hand
                     ELSE 0 END) AS BIGINT) AS inv_after
FROM inventory, warehouse, item, date_dim
WHERE i_current_price BETWEEN 0.99 AND 51.49
  AND i_item_sk = inv_item_sk AND inv_warehouse_sk = w_warehouse_sk
  AND inv_date_sk = d_date_sk
  AND d_date BETWEEN DATE '2000-02-10' AND DATE '2000-04-10'
GROUP BY w_warehouse_name, i_item_id
HAVING sum(CASE WHEN d_date < DATE '2000-03-11' THEN inv_quantity_on_hand ELSE 0 END) > 0
   AND 3 * sum(CASE WHEN d_date >= DATE '2000-03-11' THEN inv_quantity_on_hand ELSE 0 END)
       >= 2 * sum(CASE WHEN d_date < DATE '2000-03-11' THEN inv_quantity_on_hand ELSE 0 END)
   AND 2 * sum(CASE WHEN d_date >= DATE '2000-03-11' THEN inv_quantity_on_hand ELSE 0 END)
       <= 3 * sum(CASE WHEN d_date < DATE '2000-03-11' THEN inv_quantity_on_hand ELSE 0 END)
ORDER BY w_warehouse_name, i_item_id
LIMIT 100"""),
    "q22" -> (Seq("inventory", "date_dim", "item") ->
      """
SELECT i_product_name, i_brand, i_class, i_category,
       CAST(sum(inv_quantity_on_hand) AS DOUBLE) / count(inv_quantity_on_hand) AS qoh
FROM inventory, date_dim, item
WHERE inv_date_sk = d_date_sk AND inv_item_sk = i_item_sk
  AND d_month_seq BETWEEN 360 AND 371
GROUP BY ROLLUP(i_product_name, i_brand, i_class, i_category)
ORDER BY qoh NULLS FIRST, i_product_name NULLS FIRST, i_brand NULLS FIRST,
         i_class NULLS FIRST, i_category NULLS FIRST
LIMIT 100"""),
    "q29" -> (Seq("store_sales", "store_returns", "catalog_sales", "date_dim", "store", "item") ->
      """
SELECT i_item_id, i_item_desc, s_store_id, s_store_name,
       CAST(sum(ss_quantity) AS BIGINT) AS store_sales_quantity,
       CAST(sum(sr_return_quantity) AS BIGINT) AS store_returns_quantity,
       CAST(sum(cs_quantity) AS BIGINT) AS catalog_sales_quantity
FROM store_sales, store_returns, catalog_sales, date_dim d1, date_dim d2,
     date_dim d3, store, item
WHERE d1.d_moy = 4 AND d1.d_year = 2001 AND d1.d_date_sk = ss_sold_date_sk
  AND i_item_sk = ss_item_sk AND s_store_sk = ss_store_sk
  AND ss_customer_sk = sr_customer_sk AND ss_item_sk = sr_item_sk
  AND ss_ticket_number = sr_ticket_number
  AND sr_returned_date_sk = d2.d_date_sk
  AND d2.d_moy BETWEEN 4 AND 7 AND d2.d_year = 2001
  AND sr_customer_sk = cs_bill_customer_sk AND sr_item_sk = cs_item_sk
  AND cs_sold_date_sk = d3.d_date_sk AND d3.d_year IN (2001, 2002, 2003)
GROUP BY i_item_id, i_item_desc, s_store_id, s_store_name
ORDER BY i_item_id, i_item_desc, s_store_id, s_store_name
LIMIT 100"""),
    "q33" -> (Seq("store_sales", "catalog_sales", "web_sales", "date_dim", "customer_address", "item") ->
      """
WITH ss AS (
  SELECT i_manufact_id, sum(ss_ext_sales_price) total_sales
  FROM store_sales, date_dim, customer_address, item
  WHERE i_manufact_id IN (SELECT i_manufact_id FROM item WHERE i_category = 'Electronics')
    AND ss_item_sk = i_item_sk AND ss_sold_date_sk = d_date_sk
    AND d_year = 1998 AND d_moy = 5 AND ss_addr_sk = ca_address_sk
    AND ca_gmt_offset = -5
  GROUP BY i_manufact_id),
cs AS (
  SELECT i_manufact_id, sum(cs_ext_sales_price) total_sales
  FROM catalog_sales, date_dim, customer_address, item
  WHERE i_manufact_id IN (SELECT i_manufact_id FROM item WHERE i_category = 'Electronics')
    AND cs_item_sk = i_item_sk AND cs_sold_date_sk = d_date_sk
    AND d_year = 1998 AND d_moy = 5 AND cs_bill_addr_sk = ca_address_sk
    AND ca_gmt_offset = -5
  GROUP BY i_manufact_id),
ws AS (
  SELECT i_manufact_id, sum(ws_ext_sales_price) total_sales
  FROM web_sales, date_dim, customer_address, item
  WHERE i_manufact_id IN (SELECT i_manufact_id FROM item WHERE i_category = 'Electronics')
    AND ws_item_sk = i_item_sk AND ws_sold_date_sk = d_date_sk
    AND d_year = 1998 AND d_moy = 5 AND ws_bill_addr_sk = ca_address_sk
    AND ca_gmt_offset = -5
  GROUP BY i_manufact_id)
SELECT i_manufact_id, CAST(sum(total_sales) AS DOUBLE) AS total_sales
FROM (SELECT * FROM ss UNION ALL SELECT * FROM cs UNION ALL SELECT * FROM ws) tmp1
GROUP BY i_manufact_id
ORDER BY total_sales, i_manufact_id
LIMIT 100"""),
    "q37" -> (Seq("item", "inventory", "date_dim", "catalog_sales") ->
      """
SELECT i_item_id, i_item_desc, CAST(i_current_price AS DOUBLE) AS i_current_price
FROM item, inventory, date_dim, catalog_sales
WHERE i_current_price BETWEEN 20 AND 50
  AND inv_item_sk = i_item_sk AND d_date_sk = inv_date_sk
  AND d_date BETWEEN DATE '2000-02-01' AND DATE '2000-04-01'
  AND i_manufact_id IN (1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12)
  AND inv_quantity_on_hand BETWEEN 100 AND 500
  AND cs_item_sk = i_item_sk
GROUP BY i_item_id, i_item_desc, i_current_price
ORDER BY i_item_id
LIMIT 100"""),
    "q40" -> (Seq("catalog_sales", "catalog_returns", "warehouse", "item", "date_dim") ->
      """
SELECT w_state, i_item_id,
       CAST(sum(CASE WHEN d_date < DATE '2000-03-11'
                     THEN cs_sales_price - coalesce(cr_refunded_cash, 0)
                     ELSE 0 END) AS DOUBLE) AS sales_before,
       CAST(sum(CASE WHEN d_date >= DATE '2000-03-11'
                     THEN cs_sales_price - coalesce(cr_refunded_cash, 0)
                     ELSE 0 END) AS DOUBLE) AS sales_after
FROM catalog_sales
LEFT OUTER JOIN catalog_returns
  ON cs_order_number = cr_order_number AND cs_item_sk = cr_item_sk,
warehouse, item, date_dim
WHERE i_current_price BETWEEN 0.99 AND 51.49
  AND i_item_sk = cs_item_sk AND cs_warehouse_sk = w_warehouse_sk
  AND cs_sold_date_sk = d_date_sk
  AND d_date BETWEEN DATE '2000-02-10' AND DATE '2000-04-10'
GROUP BY w_state, i_item_id
ORDER BY w_state, i_item_id
LIMIT 100"""),
    "q41" -> (Seq("item") ->
      """
SELECT DISTINCT i_product_name
FROM item i1
WHERE i_manufact_id BETWEEN 70 AND 80
  AND (SELECT count(*) FROM item
       WHERE i_manufact = i1.i_manufact
         AND ((i_category = 'Women' AND i_color IN ('color1', 'color2')
               AND i_units IN ('unit0', 'unit1') AND i_size IN ('size0', 'size1'))
           OR (i_category = 'Men' AND i_color IN ('color3', 'color4')
               AND i_units IN ('unit2', 'unit3') AND i_size IN ('size2', 'size3'))
           OR (i_category = 'Women' AND i_color IN ('color5', 'color6')
               AND i_units IN ('unit4', 'unit0') AND i_size IN ('size4', 'size5'))
           OR (i_category = 'Men' AND i_color IN ('color7', 'color8')
               AND i_units IN ('unit1', 'unit2') AND i_size IN ('size6', 'size0')))) > 0
ORDER BY i_product_name
LIMIT 100"""),
    "q50" -> (Seq("store_sales", "store_returns", "store", "date_dim") ->
      """
SELECT s_store_name, s_store_id, s_state, s_zip,
       CAST(sum(CASE WHEN (sr_returned_date_sk - ss_sold_date_sk <= 30) THEN 1 ELSE 0 END) AS BIGINT) AS d30,
       CAST(sum(CASE WHEN (sr_returned_date_sk - ss_sold_date_sk > 30)
                      AND (sr_returned_date_sk - ss_sold_date_sk <= 60) THEN 1 ELSE 0 END) AS BIGINT) AS d60,
       CAST(sum(CASE WHEN (sr_returned_date_sk - ss_sold_date_sk > 60)
                      AND (sr_returned_date_sk - ss_sold_date_sk <= 90) THEN 1 ELSE 0 END) AS BIGINT) AS d90,
       CAST(sum(CASE WHEN (sr_returned_date_sk - ss_sold_date_sk > 90)
                      AND (sr_returned_date_sk - ss_sold_date_sk <= 120) THEN 1 ELSE 0 END) AS BIGINT) AS d120,
       CAST(sum(CASE WHEN (sr_returned_date_sk - ss_sold_date_sk > 120) THEN 1 ELSE 0 END) AS BIGINT) AS d120p
FROM store_sales, store_returns, store, date_dim d2
WHERE ss_ticket_number = sr_ticket_number AND ss_item_sk = sr_item_sk
  AND ss_customer_sk = sr_customer_sk
  AND sr_returned_date_sk = d2.d_date_sk
  AND d2.d_year = 2001 AND d2.d_moy = 8
  AND ss_store_sk = s_store_sk
GROUP BY s_store_name, s_store_id, s_state, s_zip
ORDER BY s_store_name, s_store_id, s_state, s_zip
LIMIT 100"""),
    "q76" -> (Seq("store_sales", "web_sales", "catalog_sales", "item", "date_dim") ->
      """
SELECT channel, col_name, d_year, d_qoy, i_category,
       count(*) AS sales_cnt, CAST(sum(ext_sales_price) AS DOUBLE) AS sales_amt
FROM (
  SELECT 'store' AS channel, 'ss_customer_sk' col_name, d_year, d_qoy,
         i_category, ss_ext_sales_price ext_sales_price
  FROM store_sales, item, date_dim
  WHERE ss_customer_sk IS NULL AND ss_sold_date_sk = d_date_sk
    AND ss_item_sk = i_item_sk
  UNION ALL
  SELECT 'web' AS channel, 'ws_bill_customer_sk' col_name, d_year, d_qoy,
         i_category, ws_ext_sales_price ext_sales_price
  FROM web_sales, item, date_dim
  WHERE ws_bill_customer_sk IS NULL AND ws_sold_date_sk = d_date_sk
    AND ws_item_sk = i_item_sk
  UNION ALL
  SELECT 'catalog' AS channel, 'cs_bill_customer_sk' col_name, d_year, d_qoy,
         i_category, cs_ext_sales_price ext_sales_price
  FROM catalog_sales, item, date_dim
  WHERE cs_bill_customer_sk IS NULL AND cs_sold_date_sk = d_date_sk
    AND cs_item_sk = i_item_sk) foo
GROUP BY channel, col_name, d_year, d_qoy, i_category
ORDER BY channel, col_name, d_year, d_qoy, i_category
LIMIT 100"""),
    "q85" -> (Seq("web_sales", "web_returns", "web_page", "customer_demographics", "customer_address", "date_dim", "reason") ->
      """
SELECT substr(r_reason_desc, 1, 20) AS reason,
       CAST(sum(ws_quantity) AS DOUBLE) / count(*) AS avg_qty,
       CAST(sum(wr_refunded_cash) AS DOUBLE) / count(*) AS avg_refunded,
       CAST(sum(wr_fee) AS DOUBLE) / count(*) AS avg_fee
FROM web_sales, web_returns, web_page, customer_demographics cd1,
     customer_demographics cd2, customer_address, date_dim, reason
WHERE ws_web_page_sk = wp_web_page_sk AND ws_item_sk = wr_item_sk
  AND ws_order_number = wr_order_number AND ws_sold_date_sk = d_date_sk
  AND d_year = 2000 AND cd1.cd_demo_sk = wr_refunded_cdemo_sk
  AND cd2.cd_demo_sk = wr_returning_cdemo_sk
  AND ca_address_sk = wr_refunded_addr_sk AND r_reason_sk = wr_reason_sk
  AND ((cd1.cd_marital_status = 'M' AND cd1.cd_marital_status = cd2.cd_marital_status
        AND cd1.cd_education_status = 'Advanced Degree'
        AND cd1.cd_education_status = cd2.cd_education_status
        AND ws_sales_price BETWEEN 60.00 AND 99.00)
    OR (cd1.cd_marital_status = 'S' AND cd1.cd_marital_status = cd2.cd_marital_status
        AND cd1.cd_education_status = 'College'
        AND cd1.cd_education_status = cd2.cd_education_status
        AND ws_sales_price BETWEEN 50.00 AND 100.00)
    OR (cd1.cd_marital_status = 'W' AND cd1.cd_marital_status = cd2.cd_marital_status
        AND cd1.cd_education_status = '2 yr Degree'
        AND cd1.cd_education_status = cd2.cd_education_status
        AND ws_sales_price BETWEEN 30.00 AND 80.00))
  AND ((ca_country = 'United States' AND ca_state IN ('CA', 'OH', 'NY')
        AND ws_net_profit BETWEEN 0 AND 2000)
    OR (ca_country = 'United States' AND ca_state IN ('WA', 'TX', 'IL')
        AND ws_net_profit BETWEEN 100 AND 5000)
    OR (ca_country = 'United States' AND ca_state IN ('GA', 'TN', 'FL')
        AND ws_net_profit BETWEEN 50 AND 3000))
GROUP BY r_reason_desc
ORDER BY reason, avg_qty, avg_refunded, avg_fee
LIMIT 100"""),
    "q90" -> (Seq("web_sales", "household_demographics", "time_dim", "web_page") ->
      """
SELECT CAST(amc AS DOUBLE) / CAST(pmc AS DOUBLE) AS am_pm_ratio
FROM (SELECT count(*) amc FROM web_sales, household_demographics, time_dim, web_page
      WHERE ws_sold_time_sk = time_dim.t_time_sk
        AND ws_ship_hdemo_sk = household_demographics.hd_demo_sk
        AND ws_web_page_sk = web_page.wp_web_page_sk
        AND time_dim.t_hour BETWEEN 8 AND 9
        AND household_demographics.hd_dep_count = 5
        AND web_page.wp_char_count BETWEEN 10 AND 90) at_,
     (SELECT count(*) pmc FROM web_sales, household_demographics, time_dim, web_page
      WHERE ws_sold_time_sk = time_dim.t_time_sk
        AND ws_ship_hdemo_sk = household_demographics.hd_demo_sk
        AND ws_web_page_sk = web_page.wp_web_page_sk
        AND time_dim.t_hour BETWEEN 19 AND 20
        AND household_demographics.hd_dep_count = 5
        AND web_page.wp_char_count BETWEEN 10 AND 90) pt
ORDER BY am_pm_ratio
LIMIT 100"""),
    "q95" -> (Seq("web_sales", "web_returns", "date_dim", "customer_address", "web_site") ->
      """
WITH ws_wh AS (
  SELECT ws1.ws_order_number
  FROM web_sales ws1, web_sales ws2
  WHERE ws1.ws_order_number = ws2.ws_order_number
    AND ws1.ws_warehouse_sk <> ws2.ws_warehouse_sk)
SELECT count(DISTINCT ws1.ws_order_number) AS order_count,
       CAST(sum(ws1.ws_ext_ship_cost) AS DOUBLE) AS total_shipping_cost,
       CAST(sum(ws1.ws_net_profit) AS DOUBLE) AS total_net_profit
FROM web_sales ws1, date_dim, customer_address, web_site
WHERE d_date BETWEEN DATE '2000-02-01' AND DATE '2000-04-01'
  AND ws1.ws_ship_date_sk = d_date_sk
  AND ws1.ws_ship_addr_sk = ca_address_sk AND ca_state = 'CA'
  AND ws1.ws_web_site_sk = web_site_sk AND web_name IN ('site 0', 'site 1')
  AND ws1.ws_order_number IN (SELECT ws_order_number FROM ws_wh)
  AND ws1.ws_order_number IN (SELECT wr_order_number
                              FROM web_returns, ws_wh
                              WHERE wr_order_number = ws_wh.ws_order_number)"""),
    "q2" -> (Seq("web_sales", "catalog_sales", "date_dim") ->
      """
WITH wscs AS (
  SELECT sold_date_sk, sales_price
  FROM (SELECT ws_sold_date_sk sold_date_sk, ws_ext_sales_price sales_price
        FROM web_sales
        UNION ALL
        SELECT cs_sold_date_sk, cs_ext_sales_price FROM catalog_sales) x),
wswscs AS (
  SELECT d_week_seq,
         sum(CASE WHEN d_day_name = 'Sunday' THEN sales_price ELSE NULL END) sun_sales,
         sum(CASE WHEN d_day_name = 'Monday' THEN sales_price ELSE NULL END) mon_sales,
         sum(CASE WHEN d_day_name = 'Tuesday' THEN sales_price ELSE NULL END) tue_sales,
         sum(CASE WHEN d_day_name = 'Wednesday' THEN sales_price ELSE NULL END) wed_sales,
         sum(CASE WHEN d_day_name = 'Thursday' THEN sales_price ELSE NULL END) thu_sales,
         sum(CASE WHEN d_day_name = 'Friday' THEN sales_price ELSE NULL END) fri_sales,
         sum(CASE WHEN d_day_name = 'Saturday' THEN sales_price ELSE NULL END) sat_sales
  FROM wscs, date_dim
  WHERE d_date_sk = sold_date_sk
  GROUP BY d_week_seq)
SELECT d_week_seq1,
       round(CAST(sun_sales1 AS DOUBLE) / CAST(sun_sales2 AS DOUBLE), 2) r1,
       round(CAST(mon_sales1 AS DOUBLE) / CAST(mon_sales2 AS DOUBLE), 2) r2,
       round(CAST(tue_sales1 AS DOUBLE) / CAST(tue_sales2 AS DOUBLE), 2) r3,
       round(CAST(wed_sales1 AS DOUBLE) / CAST(wed_sales2 AS DOUBLE), 2) r4,
       round(CAST(thu_sales1 AS DOUBLE) / CAST(thu_sales2 AS DOUBLE), 2) r5,
       round(CAST(fri_sales1 AS DOUBLE) / CAST(fri_sales2 AS DOUBLE), 2) r6,
       round(CAST(sat_sales1 AS DOUBLE) / CAST(sat_sales2 AS DOUBLE), 2) r7
FROM (SELECT wswscs.d_week_seq d_week_seq1, sun_sales sun_sales1,
             mon_sales mon_sales1, tue_sales tue_sales1, wed_sales wed_sales1,
             thu_sales thu_sales1, fri_sales fri_sales1, sat_sales sat_sales1
      FROM wswscs, date_dim
      WHERE date_dim.d_week_seq = wswscs.d_week_seq AND d_year = 2000) y,
     (SELECT wswscs.d_week_seq d_week_seq2, sun_sales sun_sales2,
             mon_sales mon_sales2, tue_sales tue_sales2, wed_sales wed_sales2,
             thu_sales thu_sales2, fri_sales fri_sales2, sat_sales sat_sales2
      FROM wswscs, date_dim
      WHERE date_dim.d_week_seq = wswscs.d_week_seq AND d_year = 2001) z
WHERE d_week_seq1 = d_week_seq2 - 52
ORDER BY d_week_seq1
LIMIT 100"""),
    "q8" -> (Seq("store_sales", "date_dim", "store", "customer_address", "customer") ->
      """
SELECT s_store_name, CAST(sum(ss_net_profit) AS DOUBLE) AS net_profit
FROM store_sales, date_dim, store,
     (SELECT ca_zip FROM (
        SELECT substr(ca_zip, 1, 5) ca_zip FROM customer_address
        WHERE substr(ca_zip, 1, 5) IN ('48634', '38633', '15343', '23700', '15617',
                                       '60827', '32468', '14110', '39455', '71513')
        INTERSECT
        SELECT ca_zip FROM (
          SELECT substr(ca_zip, 1, 5) ca_zip, count(*) cnt
          FROM customer_address, customer
          WHERE ca_address_sk = c_current_addr_sk AND c_preferred_cust_flag = 'Y'
          GROUP BY ca_zip HAVING count(*) > 1) a1) a2) v1
WHERE ss_store_sk = s_store_sk AND ss_sold_date_sk = d_date_sk
  AND d_qoy = 2 AND d_year = 1998
  AND substr(s_zip, 1, 2) = substr(v1.ca_zip, 1, 2)
GROUP BY s_store_name
ORDER BY s_store_name
LIMIT 100"""),
    "q16" -> (Seq("catalog_sales", "catalog_returns", "date_dim", "customer_address", "call_center") ->
      """
SELECT count(DISTINCT cs1.cs_order_number) AS order_count,
       CAST(sum(cs1.cs_ext_ship_cost) AS DOUBLE) AS total_shipping_cost,
       CAST(sum(cs1.cs_net_profit) AS DOUBLE) AS total_net_profit
FROM catalog_sales cs1, date_dim, customer_address, call_center
WHERE d_date BETWEEN DATE '2000-02-01' AND DATE '2000-04-01'
  AND cs1.cs_ship_date_sk = d_date_sk
  AND cs1.cs_ship_addr_sk = ca_address_sk AND ca_state = 'CA'
  AND cs1.cs_call_center_sk = cc_call_center_sk
  AND cc_county IN ('county0', 'county1', 'county2')
  AND EXISTS (SELECT 1 FROM catalog_sales cs2
              WHERE cs1.cs_order_number = cs2.cs_order_number
                AND cs1.cs_warehouse_sk <> cs2.cs_warehouse_sk)
  AND NOT EXISTS (SELECT 1 FROM catalog_returns cr1
                  WHERE cs1.cs_order_number = cr1.cr_order_number)"""),
    "q30" -> (Seq("web_returns", "date_dim", "customer_address", "customer") ->
      """
WITH customer_total_return AS (
  SELECT wr_returning_customer_sk ctr_customer_sk, ca_state ctr_state,
         sum(wr_return_amt) ctr_total_return
  FROM web_returns, date_dim, customer_address
  WHERE wr_returned_date_sk = d_date_sk AND d_year = 2000
    AND wr_returning_addr_sk = ca_address_sk
  GROUP BY wr_returning_customer_sk, ca_state)
SELECT c_customer_id, c_salutation, c_first_name, c_last_name,
       c_preferred_cust_flag, c_birth_day, c_birth_month, c_birth_year,
       c_birth_country, c_login, c_email_address,
       CAST(ctr_total_return AS DOUBLE) AS ctr_total_return
FROM customer_total_return ctr1, customer
WHERE ctr1.ctr_total_return * 10 *
        (SELECT count(*) FROM customer_total_return ctr2
         WHERE ctr1.ctr_state = ctr2.ctr_state)
      > 12 * (SELECT sum(ctr_total_return) FROM customer_total_return ctr2
              WHERE ctr1.ctr_state = ctr2.ctr_state)
  AND ctr1.ctr_customer_sk = c_customer_sk
ORDER BY c_customer_id, ctr_total_return
LIMIT 100"""),
    "q31" -> (Seq("store_sales", "web_sales", "date_dim", "customer_address") ->
      """
WITH ss AS (
  SELECT ca_county, d_qoy, d_year, sum(ss_ext_sales_price) store_sales
  FROM store_sales, date_dim, customer_address
  WHERE ss_sold_date_sk = d_date_sk AND ss_addr_sk = ca_address_sk
  GROUP BY ca_county, d_qoy, d_year),
ws AS (
  SELECT ca_county, d_qoy, d_year, sum(ws_ext_sales_price) web_sales
  FROM web_sales, date_dim, customer_address
  WHERE ws_sold_date_sk = d_date_sk AND ws_bill_addr_sk = ca_address_sk
  GROUP BY ca_county, d_qoy, d_year)
SELECT ss1.ca_county, ss1.d_year,
       CAST(ws2.web_sales AS DOUBLE) / CAST(ws1.web_sales AS DOUBLE) web_q1_q2_increase,
       CAST(ss2.store_sales AS DOUBLE) / CAST(ss1.store_sales AS DOUBLE) store_q1_q2_increase,
       CAST(ws3.web_sales AS DOUBLE) / CAST(ws2.web_sales AS DOUBLE) web_q2_q3_increase,
       CAST(ss3.store_sales AS DOUBLE) / CAST(ss2.store_sales AS DOUBLE) store_q2_q3_increase
FROM ss ss1, ss ss2, ss ss3, ws ws1, ws ws2, ws ws3
WHERE ss1.d_qoy = 1 AND ss1.d_year = 2000 AND ss1.ca_county = ss2.ca_county
  AND ss2.d_qoy = 2 AND ss2.d_year = 2000 AND ss2.ca_county = ss3.ca_county
  AND ss3.d_qoy = 3 AND ss3.d_year = 2000
  AND ss1.ca_county = ws1.ca_county AND ws1.d_qoy = 1 AND ws1.d_year = 2000
  AND ws1.ca_county = ws2.ca_county AND ws2.d_qoy = 2 AND ws2.d_year = 2000
  AND ws1.ca_county = ws3.ca_county AND ws3.d_qoy = 3 AND ws3.d_year = 2000
  AND ws2.web_sales * ss1.store_sales > ss2.store_sales * ws1.web_sales
  AND ws3.web_sales * ss2.store_sales > ss3.store_sales * ws2.web_sales
ORDER BY ss1.ca_county, ss1.d_year
LIMIT 100"""),
    "q35" -> (Seq("customer", "store_sales", "web_sales", "catalog_sales", "date_dim", "customer_address", "customer_demographics") ->
      """
SELECT ca_state, cd_gender, cd_marital_status, cd_dep_count,
       count(*) cnt1,
       CAST(sum(cd_dep_count) AS BIGINT) AS sum_dep,
       max(cd_dep_count) AS max_dep,
       cd_dep_employed_count, count(*) cnt2,
       cd_dep_college_count, count(*) cnt3
FROM customer c, customer_address ca, customer_demographics
WHERE c.c_current_addr_sk = ca.ca_address_sk
  AND cd_demo_sk = c.c_current_cdemo_sk
  AND EXISTS (SELECT 1 FROM store_sales, date_dim
              WHERE c.c_customer_sk = ss_customer_sk AND ss_sold_date_sk = d_date_sk
                AND d_year = 2000 AND d_qoy < 4)
  AND (EXISTS (SELECT 1 FROM web_sales, date_dim
               WHERE c.c_customer_sk = ws_bill_customer_sk AND ws_sold_date_sk = d_date_sk
                 AND d_year = 2000 AND d_qoy < 4)
    OR EXISTS (SELECT 1 FROM catalog_sales, date_dim
               WHERE c.c_customer_sk = cs_ship_customer_sk AND cs_sold_date_sk = d_date_sk
                 AND d_year = 2000 AND d_qoy < 4))
GROUP BY ca_state, cd_gender, cd_marital_status, cd_dep_count,
         cd_dep_employed_count, cd_dep_college_count
ORDER BY ca_state, cd_gender, cd_marital_status, cd_dep_count,
         cd_dep_employed_count, cd_dep_college_count
LIMIT 100"""),
    "q38" -> (Seq("store_sales", "catalog_sales", "web_sales", "date_dim", "customer") ->
      """
SELECT count(*) AS cnt FROM (
  SELECT DISTINCT c_last_name, c_first_name, d_date
  FROM store_sales, date_dim, customer
  WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
    AND store_sales.ss_customer_sk = customer.c_customer_sk
    AND d_month_seq BETWEEN 360 AND 371
  INTERSECT
  SELECT DISTINCT c_last_name, c_first_name, d_date
  FROM catalog_sales, date_dim, customer
  WHERE catalog_sales.cs_sold_date_sk = date_dim.d_date_sk
    AND catalog_sales.cs_bill_customer_sk = customer.c_customer_sk
    AND d_month_seq BETWEEN 360 AND 371
  INTERSECT
  SELECT DISTINCT c_last_name, c_first_name, d_date
  FROM web_sales, date_dim, customer
  WHERE web_sales.ws_sold_date_sk = date_dim.d_date_sk
    AND web_sales.ws_bill_customer_sk = customer.c_customer_sk
    AND d_month_seq BETWEEN 360 AND 371) hot_cust"""),
    "q44" -> (Seq("store_sales", "item") ->
      """
SELECT asceding.rnk, i1.i_product_name best_performing, i2.i_product_name worst_performing
FROM (SELECT * FROM (
        SELECT item_sk, rank() OVER (ORDER BY rank_col ASC, item_sk) rnk
        FROM (SELECT ss_item_sk item_sk,
                     CAST(sum(ss_net_profit) AS DOUBLE) / count(*) rank_col
              FROM store_sales ss1 WHERE ss_store_sk = 4
              GROUP BY ss_item_sk
              HAVING sum(ss_net_profit) * 10 * (
                       SELECT count(*) FROM store_sales WHERE ss_store_sk = 4
                         AND ss_addr_sk IS NULL GROUP BY ss_store_sk)
                     > 9 * count(*) * (
                       SELECT sum(ss_net_profit) FROM store_sales WHERE ss_store_sk = 4
                         AND ss_addr_sk IS NULL GROUP BY ss_store_sk)) v1) v11
      WHERE rnk < 11) asceding,
     (SELECT * FROM (
        SELECT item_sk, rank() OVER (ORDER BY rank_col DESC, item_sk) rnk
        FROM (SELECT ss_item_sk item_sk,
                     CAST(sum(ss_net_profit) AS DOUBLE) / count(*) rank_col
              FROM store_sales ss1 WHERE ss_store_sk = 4
              GROUP BY ss_item_sk
              HAVING sum(ss_net_profit) * 10 * (
                       SELECT count(*) FROM store_sales WHERE ss_store_sk = 4
                         AND ss_addr_sk IS NULL GROUP BY ss_store_sk)
                     > 9 * count(*) * (
                       SELECT sum(ss_net_profit) FROM store_sales WHERE ss_store_sk = 4
                         AND ss_addr_sk IS NULL GROUP BY ss_store_sk)) v2) v21
      WHERE rnk < 11) descending,
     item i1, item i2
WHERE asceding.rnk = descending.rnk
  AND i1.i_item_sk = asceding.item_sk AND i2.i_item_sk = descending.item_sk
ORDER BY asceding.rnk
LIMIT 100"""),
    "q46" -> (Seq("store_sales", "date_dim", "store", "household_demographics", "customer_address", "customer") ->
      """
SELECT c_last_name, c_first_name, ca_city, bought_city, ss_ticket_number,
       CAST(amt AS DOUBLE) AS amt, CAST(profit AS DOUBLE) AS profit
FROM (SELECT ss_ticket_number, ss_customer_sk, ca_city bought_city,
             sum(ss_coupon_amt) amt, sum(ss_net_profit) profit
      FROM store_sales, date_dim, store, household_demographics, customer_address
      WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
        AND store_sales.ss_store_sk = store.s_store_sk
        AND store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
        AND store_sales.ss_addr_sk = customer_address.ca_address_sk
        AND (household_demographics.hd_dep_count = 4
             OR household_demographics.hd_vehicle_count = 3)
        AND date_dim.d_dow IN (6, 0)
        AND date_dim.d_year IN (1999, 2000, 2001)
        AND store.s_city IN ('city0', 'city1', 'city2', 'city3', 'city4')
      GROUP BY ss_ticket_number, ss_customer_sk, ss_addr_sk, ca_city) dn,
     customer, customer_address current_addr
WHERE ss_customer_sk = c_customer_sk
  AND customer.c_current_addr_sk = current_addr.ca_address_sk
  AND current_addr.ca_city <> bought_city
ORDER BY c_last_name, c_first_name, ca_city, bought_city, ss_ticket_number,
         amt, profit
LIMIT 100"""),
    "q47" -> (Seq("item", "store_sales", "date_dim", "store") ->
      """
WITH v1 AS (
  SELECT i_category, i_brand, s_store_name, s_company_id, d_year, d_moy,
         sum(ss_sales_price) sum_sales_dec,
         CAST(sum(ss_sales_price) AS DOUBLE) sum_sales,
         sum(sum(ss_sales_price)) OVER (PARTITION BY i_category, i_brand,
           s_store_name, s_company_id, d_year) total,
         count(*) OVER (PARTITION BY i_category, i_brand,
           s_store_name, s_company_id, d_year) cnt,
         rank() OVER (PARTITION BY i_category, i_brand, s_store_name,
           s_company_id ORDER BY d_year, d_moy) rn
  FROM item, store_sales, date_dim, store
  WHERE ss_item_sk = i_item_sk AND ss_sold_date_sk = d_date_sk
    AND ss_store_sk = s_store_sk
    AND (d_year = 2000 OR (d_year = 1999 AND d_moy = 12)
         OR (d_year = 2001 AND d_moy = 1))
  GROUP BY i_category, i_brand, s_store_name, s_company_id, d_year, d_moy),
v2 AS (
  SELECT v1.i_category, v1.i_brand, v1.s_store_name, v1.s_company_id,
         v1.d_year, v1.d_moy, v1.sum_sales, v1.sum_sales_dec, v1.total, v1.cnt,
         v1_lag.sum_sales psum, v1_lead.sum_sales nsum
  FROM v1, v1 v1_lag, v1 v1_lead
  WHERE v1.i_category = v1_lag.i_category AND v1.i_category = v1_lead.i_category
    AND v1.i_brand = v1_lag.i_brand AND v1.i_brand = v1_lead.i_brand
    AND v1.s_store_name = v1_lag.s_store_name
    AND v1.s_store_name = v1_lead.s_store_name
    AND v1.s_company_id = v1_lag.s_company_id
    AND v1.s_company_id = v1_lead.s_company_id
    AND v1.rn = v1_lag.rn + 1 AND v1.rn = v1_lead.rn - 1)
SELECT i_category, i_brand, s_store_name, s_company_id, d_year, d_moy,
       sum_sales, CAST(total AS DOUBLE) / cnt AS avg_monthly_sales, psum, nsum
FROM v2
WHERE d_year = 2000 AND total > 0
  AND 10 * abs(sum_sales_dec * cnt - total) > total
ORDER BY CAST(total AS DOUBLE) / cnt - sum_sales, s_store_name, i_category,
         i_brand, s_company_id, d_year, d_moy
LIMIT 100"""),
    "q56" -> (Seq("store_sales", "catalog_sales", "web_sales", "date_dim", "customer_address", "item") ->
      """
WITH ss AS (
  SELECT i_item_id, sum(ss_ext_sales_price) total_sales
  FROM store_sales, date_dim, customer_address, item
  WHERE i_item_id IN (SELECT i_item_id FROM item
                      WHERE i_color IN ('color1', 'color2', 'color3'))
    AND ss_item_sk = i_item_sk AND ss_sold_date_sk = d_date_sk
    AND d_year = 2000 AND d_moy = 2 AND ss_addr_sk = ca_address_sk
    AND ca_gmt_offset = -5
  GROUP BY i_item_id),
cs AS (
  SELECT i_item_id, sum(cs_ext_sales_price) total_sales
  FROM catalog_sales, date_dim, customer_address, item
  WHERE i_item_id IN (SELECT i_item_id FROM item
                      WHERE i_color IN ('color1', 'color2', 'color3'))
    AND cs_item_sk = i_item_sk AND cs_sold_date_sk = d_date_sk
    AND d_year = 2000 AND d_moy = 2 AND cs_bill_addr_sk = ca_address_sk
    AND ca_gmt_offset = -5
  GROUP BY i_item_id),
ws AS (
  SELECT i_item_id, sum(ws_ext_sales_price) total_sales
  FROM web_sales, date_dim, customer_address, item
  WHERE i_item_id IN (SELECT i_item_id FROM item
                      WHERE i_color IN ('color1', 'color2', 'color3'))
    AND ws_item_sk = i_item_sk AND ws_sold_date_sk = d_date_sk
    AND d_year = 2000 AND d_moy = 2 AND ws_bill_addr_sk = ca_address_sk
    AND ca_gmt_offset = -5
  GROUP BY i_item_id)
SELECT i_item_id, CAST(sum(total_sales) AS DOUBLE) AS total_sales
FROM (SELECT * FROM ss UNION ALL SELECT * FROM cs UNION ALL SELECT * FROM ws) tmp1
GROUP BY i_item_id
ORDER BY total_sales, i_item_id
LIMIT 100"""),
    "q57" -> (Seq("item", "catalog_sales", "date_dim", "call_center") ->
      """
WITH v1 AS (
  SELECT i_category, i_brand, cc_name, d_year, d_moy,
         sum(cs_sales_price) sum_sales_dec,
         CAST(sum(cs_sales_price) AS DOUBLE) sum_sales,
         sum(sum(cs_sales_price)) OVER (PARTITION BY i_category, i_brand,
           cc_name, d_year) total,
         count(*) OVER (PARTITION BY i_category, i_brand, cc_name, d_year) cnt,
         rank() OVER (PARTITION BY i_category, i_brand, cc_name
           ORDER BY d_year, d_moy) rn
  FROM item, catalog_sales, date_dim, call_center
  WHERE cs_item_sk = i_item_sk AND cs_sold_date_sk = d_date_sk
    AND cc_call_center_sk = cs_call_center_sk
    AND (d_year = 2000 OR (d_year = 1999 AND d_moy = 12)
         OR (d_year = 2001 AND d_moy = 1))
  GROUP BY i_category, i_brand, cc_name, d_year, d_moy),
v2 AS (
  SELECT v1.i_category, v1.i_brand, v1.cc_name, v1.d_year, v1.d_moy,
         v1.sum_sales, v1.sum_sales_dec, v1.total, v1.cnt,
         v1_lag.sum_sales psum, v1_lead.sum_sales nsum
  FROM v1, v1 v1_lag, v1 v1_lead
  WHERE v1.i_category = v1_lag.i_category AND v1.i_category = v1_lead.i_category
    AND v1.i_brand = v1_lag.i_brand AND v1.i_brand = v1_lead.i_brand
    AND v1.cc_name = v1_lag.cc_name AND v1.cc_name = v1_lead.cc_name
    AND v1.rn = v1_lag.rn + 1 AND v1.rn = v1_lead.rn - 1)
SELECT i_category, i_brand, cc_name, d_year, d_moy, sum_sales,
       CAST(total AS DOUBLE) / cnt AS avg_monthly_sales, psum, nsum
FROM v2
WHERE d_year = 2000 AND total > 0
  AND 10 * abs(sum_sales_dec * cnt - total) > total
ORDER BY CAST(total AS DOUBLE) / cnt - sum_sales, cc_name, i_category,
         i_brand, d_year, d_moy
LIMIT 100"""),
    "q58" -> (Seq("store_sales", "catalog_sales", "web_sales", "date_dim", "item") ->
      """
WITH ss_items AS (
  SELECT i_item_id item_id, sum(ss_ext_sales_price) ss_item_rev
  FROM store_sales, item, date_dim
  WHERE ss_item_sk = i_item_sk
    AND d_date IN (SELECT d_date FROM date_dim
                   WHERE d_month_seq = (SELECT d_month_seq FROM date_dim
                                        WHERE d_date = DATE '2000-03-11'))
    AND ss_sold_date_sk = d_date_sk
  GROUP BY i_item_id),
cs_items AS (
  SELECT i_item_id item_id, sum(cs_ext_sales_price) cs_item_rev
  FROM catalog_sales, item, date_dim
  WHERE cs_item_sk = i_item_sk
    AND d_date IN (SELECT d_date FROM date_dim
                   WHERE d_month_seq = (SELECT d_month_seq FROM date_dim
                                        WHERE d_date = DATE '2000-03-11'))
    AND cs_sold_date_sk = d_date_sk
  GROUP BY i_item_id),
ws_items AS (
  SELECT i_item_id item_id, sum(ws_ext_sales_price) ws_item_rev
  FROM web_sales, item, date_dim
  WHERE ws_item_sk = i_item_sk
    AND d_date IN (SELECT d_date FROM date_dim
                   WHERE d_month_seq = (SELECT d_month_seq FROM date_dim
                                        WHERE d_date = DATE '2000-03-11'))
    AND ws_sold_date_sk = d_date_sk
  GROUP BY i_item_id)
SELECT ss_items.item_id,
       CAST(ss_item_rev AS DOUBLE) AS ss_item_rev,
       CAST(cs_item_rev AS DOUBLE) AS cs_item_rev,
       CAST(ws_item_rev AS DOUBLE) AS ws_item_rev
FROM ss_items, cs_items, ws_items
WHERE ss_items.item_id = cs_items.item_id
  AND ss_items.item_id = ws_items.item_id
  AND 2 * ss_item_rev >= 1 * cs_item_rev AND 2 * ss_item_rev <= 3 * cs_item_rev
  AND 2 * ss_item_rev >= 1 * ws_item_rev AND 2 * ss_item_rev <= 3 * ws_item_rev
  AND 2 * cs_item_rev >= 1 * ss_item_rev AND 2 * cs_item_rev <= 3 * ss_item_rev
  AND 2 * cs_item_rev >= 1 * ws_item_rev AND 2 * cs_item_rev <= 3 * ws_item_rev
  AND 2 * ws_item_rev >= 1 * ss_item_rev AND 2 * ws_item_rev <= 3 * ss_item_rev
  AND 2 * ws_item_rev >= 1 * cs_item_rev AND 2 * ws_item_rev <= 3 * cs_item_rev
ORDER BY ss_items.item_id, ss_item_rev
LIMIT 100"""),
    "q87" -> (Seq("store_sales", "catalog_sales", "web_sales", "date_dim", "customer") ->
      """
SELECT count(*) AS cnt FROM (
  (SELECT DISTINCT c_last_name, c_first_name, d_date
   FROM store_sales, date_dim, customer
   WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
     AND store_sales.ss_customer_sk = customer.c_customer_sk
     AND d_month_seq BETWEEN 360 AND 371)
  EXCEPT
  (SELECT DISTINCT c_last_name, c_first_name, d_date
   FROM catalog_sales, date_dim, customer
   WHERE catalog_sales.cs_sold_date_sk = date_dim.d_date_sk
     AND catalog_sales.cs_bill_customer_sk = customer.c_customer_sk
     AND d_month_seq BETWEEN 360 AND 371)
  EXCEPT
  (SELECT DISTINCT c_last_name, c_first_name, d_date
   FROM web_sales, date_dim, customer
   WHERE web_sales.ws_sold_date_sk = date_dim.d_date_sk
     AND web_sales.ws_bill_customer_sk = customer.c_customer_sk
     AND d_month_seq BETWEEN 360 AND 371)) cool_cust"""),
    "q63" -> (Seq("item", "store_sales", "date_dim", "store") ->
      """
SELECT i_manager_id, sum_sales, CAST(total AS DOUBLE) / cnt AS avg_monthly_sales
FROM (SELECT i_manager_id, sum_sales, sum_sales_dec,
             sum(sum_sales_dec) OVER (PARTITION BY i_manager_id) AS total,
             count(*) OVER (PARTITION BY i_manager_id) AS cnt
      FROM (SELECT i_manager_id,
                   CAST(sum(ss_sales_price) AS DOUBLE) AS sum_sales,
                   sum(ss_sales_price) AS sum_sales_dec
            FROM item, store_sales, date_dim, store
            WHERE ss_item_sk = i_item_sk AND ss_sold_date_sk = d_date_sk
              AND ss_store_sk = s_store_sk
              AND d_month_seq BETWEEN 360 AND 371
              AND ((i_category IN ('Books', 'Children', 'Electronics')
                    AND i_class IN ('class1', 'class2', 'class3'))
                OR (i_category IN ('Women', 'Music', 'Men')
                    AND i_class IN ('class8', 'class9', 'class10')))
            GROUP BY i_manager_id, d_moy) tmp1) tmp2
WHERE total > 0 AND 10 * abs(sum_sales_dec * cnt - total) > total
ORDER BY i_manager_id, avg_monthly_sales, sum_sales
LIMIT 100"""),
    "q86" -> (Seq("web_sales", "date_dim", "item") ->
      """
SELECT CAST(sum(ws_net_paid) AS DOUBLE) AS total_sum, i_category, i_class,
       grouping(i_category) + grouping(i_class) AS lochierarchy,
       rank() OVER (
         PARTITION BY grouping(i_category) + grouping(i_class),
                      CASE WHEN grouping(i_class) = 0 THEN i_category END
         ORDER BY sum(ws_net_paid) DESC) AS rank_within_parent
FROM web_sales, date_dim d1, item
WHERE d1.d_month_seq BETWEEN 360 AND 371
  AND d1.d_date_sk = ws_sold_date_sk AND i_item_sk = ws_item_sk
GROUP BY ROLLUP(i_category, i_class)
ORDER BY lochierarchy DESC, CASE WHEN lochierarchy = 0 THEN i_category END NULLS FIRST,
         rank_within_parent, i_category NULLS FIRST, i_class NULLS FIRST
LIMIT 100"""),
    "q70" -> (Seq("store_sales", "date_dim", "store") ->
      """
SELECT CAST(sum(ss_net_profit) AS DOUBLE) AS total_sum, s_state, s_county,
       grouping(s_state) + grouping(s_county) AS lochierarchy,
       rank() OVER (
         PARTITION BY grouping(s_state) + grouping(s_county),
                      CASE WHEN grouping(s_county) = 0 THEN s_state END
         ORDER BY sum(ss_net_profit) DESC) AS rank_within_parent
FROM store_sales, date_dim d1, store
WHERE d1.d_month_seq BETWEEN 360 AND 371
  AND d1.d_date_sk = ss_sold_date_sk AND s_store_sk = ss_store_sk
  AND s_state IN (SELECT s_state
                  FROM (SELECT s_state,
                               rank() OVER (PARTITION BY s_state
                                 ORDER BY sum(ss_net_profit) DESC) AS ranking
                        FROM store_sales, store, date_dim
                        WHERE d_month_seq BETWEEN 360 AND 371
                          AND d_date_sk = ss_sold_date_sk AND s_store_sk = ss_store_sk
                        GROUP BY s_state) tmp1
                  WHERE ranking <= 5)
GROUP BY ROLLUP(s_state, s_county)
ORDER BY lochierarchy DESC, CASE WHEN lochierarchy = 0 THEN s_state END NULLS FIRST,
         rank_within_parent, s_state NULLS FIRST, s_county NULLS FIRST
LIMIT 100"""),
    "q28" -> (Seq("store_sales") ->
      """
SELECT *
FROM (SELECT CAST(sum(ss_list_price) AS DOUBLE) / count(ss_list_price) AS b1_lp,
             count(ss_list_price) AS b1_cnt, count(DISTINCT ss_list_price) AS b1_cntd
      FROM store_sales
      WHERE ss_quantity BETWEEN 0 AND 5
        AND (ss_list_price BETWEEN 8 AND 18 OR ss_coupon_amt BETWEEN 4.59 AND 14.59
             OR ss_wholesale_cost BETWEEN 27 AND 47)) b1,
     (SELECT CAST(sum(ss_list_price) AS DOUBLE) / count(ss_list_price) AS b2_lp,
             count(ss_list_price) AS b2_cnt, count(DISTINCT ss_list_price) AS b2_cntd
      FROM store_sales
      WHERE ss_quantity BETWEEN 6 AND 10
        AND (ss_list_price BETWEEN 90 AND 100 OR ss_coupon_amt BETWEEN 13.23 AND 23.23
             OR ss_wholesale_cost BETWEEN 21 AND 41)) b2,
     (SELECT CAST(sum(ss_list_price) AS DOUBLE) / count(ss_list_price) AS b3_lp,
             count(ss_list_price) AS b3_cnt, count(DISTINCT ss_list_price) AS b3_cntd
      FROM store_sales
      WHERE ss_quantity BETWEEN 11 AND 15
        AND (ss_list_price BETWEEN 42 AND 52 OR ss_coupon_amt BETWEEN 12.14 AND 22.14
             OR ss_wholesale_cost BETWEEN 9 AND 29)) b3,
     (SELECT CAST(sum(ss_list_price) AS DOUBLE) / count(ss_list_price) AS b4_lp,
             count(ss_list_price) AS b4_cnt, count(DISTINCT ss_list_price) AS b4_cntd
      FROM store_sales
      WHERE ss_quantity BETWEEN 16 AND 20
        AND (ss_list_price BETWEEN 35 AND 45 OR ss_coupon_amt BETWEEN 6.71 AND 16.71
             OR ss_wholesale_cost BETWEEN 18 AND 38)) b4,
     (SELECT CAST(sum(ss_list_price) AS DOUBLE) / count(ss_list_price) AS b5_lp,
             count(ss_list_price) AS b5_cnt, count(DISTINCT ss_list_price) AS b5_cntd
      FROM store_sales
      WHERE ss_quantity BETWEEN 21 AND 25
        AND (ss_list_price BETWEEN 22 AND 32 OR ss_coupon_amt BETWEEN 8.36 AND 18.36
             OR ss_wholesale_cost BETWEEN 7 AND 27)) b5,
     (SELECT CAST(sum(ss_list_price) AS DOUBLE) / count(ss_list_price) AS b6_lp,
             count(ss_list_price) AS b6_cnt, count(DISTINCT ss_list_price) AS b6_cntd
      FROM store_sales
      WHERE ss_quantity BETWEEN 26 AND 30
        AND (ss_list_price BETWEEN 54 AND 64 OR ss_coupon_amt BETWEEN 3.26 AND 13.26
             OR ss_wholesale_cost BETWEEN 5 AND 25)) b6
LIMIT 100"""),
    "q17" -> (Seq("store_sales", "store_returns", "catalog_sales", "date_dim", "store", "item") ->
      """
SELECT i_item_id, i_item_desc, s_state,
       n_ss AS store_sales_quantitycount,
       CAST(s1_ss AS DOUBLE) / n_ss AS store_sales_quantityave,
       CASE WHEN n_ss > 1 THEN sqrt((n_ss * s2_ss - s1_ss * s1_ss) / (n_ss * (n_ss - 1.0))) END AS store_sales_quantitystdev,
       CASE WHEN n_ss > 1 THEN sqrt((n_ss * s2_ss - s1_ss * s1_ss) / (n_ss * (n_ss - 1.0))) * n_ss / s1_ss END AS store_sales_quantitycov,
       n_sr AS store_returns_quantitycount,
       CAST(s1_sr AS DOUBLE) / n_sr AS store_returns_quantityave,
       CASE WHEN n_sr > 1 THEN sqrt((n_sr * s2_sr - s1_sr * s1_sr) / (n_sr * (n_sr - 1.0))) END AS store_returns_quantitystdev,
       CASE WHEN n_sr > 1 THEN sqrt((n_sr * s2_sr - s1_sr * s1_sr) / (n_sr * (n_sr - 1.0))) * n_sr / s1_sr END AS store_returns_quantitycov,
       n_cs AS catalog_sales_quantitycount,
       CAST(s1_cs AS DOUBLE) / n_cs AS catalog_sales_quantityave,
       CASE WHEN n_cs > 1 THEN sqrt((n_cs * s2_cs - s1_cs * s1_cs) / (n_cs * (n_cs - 1.0))) END AS catalog_sales_quantitystdev,
       CASE WHEN n_cs > 1 THEN sqrt((n_cs * s2_cs - s1_cs * s1_cs) / (n_cs * (n_cs - 1.0))) * n_cs / s1_cs END AS catalog_sales_quantitycov
FROM (SELECT i_item_id, i_item_desc, s_state,
             count(ss_quantity) AS n_ss,
             sum(CAST(ss_quantity AS BIGINT)) AS s1_ss,
             sum(CAST(ss_quantity AS BIGINT) * ss_quantity) AS s2_ss,
             count(sr_return_quantity) AS n_sr,
             sum(CAST(sr_return_quantity AS BIGINT)) AS s1_sr,
             sum(CAST(sr_return_quantity AS BIGINT) * sr_return_quantity) AS s2_sr,
             count(cs_quantity) AS n_cs,
             sum(CAST(cs_quantity AS BIGINT)) AS s1_cs,
             sum(CAST(cs_quantity AS BIGINT) * cs_quantity) AS s2_cs
      FROM store_sales, store_returns, catalog_sales,
           date_dim d1, date_dim d2, date_dim d3, store, item
      WHERE d1.d_year = 2000 AND d1.d_qoy = 1
        AND d1.d_date_sk = ss_sold_date_sk
        AND i_item_sk = ss_item_sk AND s_store_sk = ss_store_sk
        AND ss_customer_sk = sr_customer_sk AND ss_item_sk = sr_item_sk
        AND ss_ticket_number = sr_ticket_number
        AND sr_returned_date_sk = d2.d_date_sk
        AND d2.d_year = 2000 AND d2.d_qoy IN (1, 2, 3)
        AND sr_customer_sk = cs_bill_customer_sk AND sr_item_sk = cs_item_sk
        AND cs_sold_date_sk = d3.d_date_sk
        AND d3.d_year = 2000 AND d3.d_qoy IN (1, 2, 3)
      GROUP BY i_item_id, i_item_desc, s_state) t
ORDER BY i_item_id, i_item_desc, s_state
LIMIT 100"""),
    "q82" -> (Seq("item", "inventory", "date_dim", "store_sales") ->
      """
SELECT i_item_id, i_item_desc, CAST(i_current_price AS DOUBLE) AS i_current_price
FROM item, inventory, date_dim, store_sales
WHERE i_current_price BETWEEN 10 AND 40
  AND inv_item_sk = i_item_sk AND d_date_sk = inv_date_sk
  AND d_date BETWEEN DATE '2000-05-25' AND DATE '2000-07-24'
  AND i_manufact_id IN (21, 23, 29, 70)
  AND inv_quantity_on_hand BETWEEN 100 AND 500
  AND ss_item_sk = i_item_sk
GROUP BY i_item_id, i_item_desc, i_current_price
ORDER BY i_item_id
LIMIT 100"""),
    "q91" -> (Seq("call_center", "catalog_returns", "date_dim", "customer",
                  "customer_address", "customer_demographics", "household_demographics") ->
      """
SELECT cc_call_center_id AS call_center, cc_name AS call_center_name,
       cc_manager AS manager, CAST(sum(cr_net_loss) AS DOUBLE) AS returns_loss
FROM call_center, catalog_returns, date_dim, customer, customer_address,
     customer_demographics, household_demographics
WHERE cr_call_center_sk = cc_call_center_sk
  AND cr_returned_date_sk = d_date_sk
  AND cr_returning_customer_sk = c_customer_sk
  AND cd_demo_sk = c_current_cdemo_sk
  AND hd_demo_sk = c_current_hdemo_sk
  AND ca_address_sk = c_current_addr_sk
  AND d_year = 2000
  AND ((cd_marital_status = 'M' AND cd_education_status = 'Unknown')
    OR (cd_marital_status = 'W' AND cd_education_status = 'Advanced Degree'))
  AND hd_buy_potential LIKE '1001-5000%'
  AND ca_gmt_offset = -5
GROUP BY cc_call_center_id, cc_name, cc_manager, cd_marital_status, cd_education_status
ORDER BY returns_loss DESC"""),
    "q84" -> (Seq("customer", "customer_address", "customer_demographics",
                  "household_demographics", "income_band", "store_returns") ->
      """
SELECT c_customer_id AS customer_id,
       coalesce(c_last_name, '') || ', ' || coalesce(c_first_name, '') AS customername
FROM customer, customer_address, customer_demographics,
     household_demographics, income_band, store_returns
WHERE ca_city = 'city30'
  AND c_current_addr_sk = ca_address_sk
  AND ib_lower_bound >= 70000 AND ib_upper_bound <= 70000 + 50000
  AND ib_income_band_sk = hd_income_band_sk
  AND cd_demo_sk = c_current_cdemo_sk
  AND hd_demo_sk = c_current_hdemo_sk
  AND sr_cdemo_sk = cd_demo_sk
ORDER BY c_customer_id
LIMIT 100"""),
    "q39a" -> (Seq("inventory", "item", "warehouse", "date_dim") ->
      """
WITH moments AS (
  SELECT w_warehouse_name, w_warehouse_sk, i_item_sk, d_moy,
         count(inv_quantity_on_hand) AS n,
         sum(CAST(inv_quantity_on_hand AS BIGINT)) AS s1,
         sum(CAST(inv_quantity_on_hand AS BIGINT) * inv_quantity_on_hand) AS s2
  FROM inventory, item, warehouse, date_dim
  WHERE inv_item_sk = i_item_sk AND inv_warehouse_sk = w_warehouse_sk
    AND inv_date_sk = d_date_sk
  GROUP BY w_warehouse_name, w_warehouse_sk, i_item_sk, d_moy),
inv AS (
  SELECT w_warehouse_sk, i_item_sk, d_moy,
         CAST(s1 AS DOUBLE) / n AS mean,
         sqrt((n * s2 - s1 * s1) / (n * (n - 1.0))) * n / s1 AS cov
  FROM moments
  WHERE n > 1 AND n * (n * s2 - s1 * s1) > (n - 1) * s1 * s1)
SELECT inv1.w_warehouse_sk AS wsk1, inv1.i_item_sk AS isk1, inv1.d_moy AS moy1,
       inv1.mean AS mean1, inv1.cov AS cov1,
       inv2.d_moy AS moy2, inv2.mean AS mean2, inv2.cov AS cov2
FROM inv inv1, inv inv2
WHERE inv1.i_item_sk = inv2.i_item_sk
  AND inv1.w_warehouse_sk = inv2.w_warehouse_sk
  AND inv1.d_moy = 1 AND inv2.d_moy = 2
ORDER BY wsk1, isk1, moy1, mean1, cov1, moy2, mean2, cov2"""),
    "q39b" -> (Seq("inventory", "item", "warehouse", "date_dim") ->
      """
WITH moments AS (
  SELECT w_warehouse_name, w_warehouse_sk, i_item_sk, d_moy,
         count(inv_quantity_on_hand) AS n,
         sum(CAST(inv_quantity_on_hand AS BIGINT)) AS s1,
         sum(CAST(inv_quantity_on_hand AS BIGINT) * inv_quantity_on_hand) AS s2
  FROM inventory, item, warehouse, date_dim
  WHERE inv_item_sk = i_item_sk AND inv_warehouse_sk = w_warehouse_sk
    AND inv_date_sk = d_date_sk
  GROUP BY w_warehouse_name, w_warehouse_sk, i_item_sk, d_moy),
inv AS (
  SELECT w_warehouse_sk, i_item_sk, d_moy,
         CAST(s1 AS DOUBLE) / n AS mean,
         sqrt((n * s2 - s1 * s1) / (n * (n - 1.0))) * n / s1 AS cov,
         n, s1, s2
  FROM moments
  WHERE n > 1 AND n * (n * s2 - s1 * s1) > (n - 1) * s1 * s1)
SELECT inv1.w_warehouse_sk AS wsk1, inv1.i_item_sk AS isk1, inv1.d_moy AS moy1,
       inv1.mean AS mean1, inv1.cov AS cov1,
       inv2.d_moy AS moy2, inv2.mean AS mean2, inv2.cov AS cov2
FROM inv inv1, inv inv2
WHERE inv1.i_item_sk = inv2.i_item_sk
  AND inv1.w_warehouse_sk = inv2.w_warehouse_sk
  AND inv1.d_moy = 1 AND inv2.d_moy = 2
  AND 4 * inv1.n * (inv1.n * inv1.s2 - inv1.s1 * inv1.s1)
      > 9 * (inv1.n - 1) * inv1.s1 * inv1.s1
ORDER BY wsk1, isk1, moy1, mean1, cov1, moy2, mean2, cov2"""),
    "q71" -> (Seq("item", "web_sales", "catalog_sales", "store_sales", "date_dim", "time_dim") ->
      """
SELECT i_brand_id AS brand_id, i_brand AS brand, t_hour, t_minute,
       CAST(sum(ext_price) AS DOUBLE) AS ext_price
FROM item,
     (SELECT ws_ext_sales_price AS ext_price, ws_sold_date_sk AS sold_date_sk,
             ws_item_sk AS sold_item_sk, ws_sold_time_sk AS time_sk
      FROM web_sales, date_dim
      WHERE d_date_sk = ws_sold_date_sk AND d_moy = 11 AND d_year = 2000
      UNION ALL
      SELECT cs_ext_sales_price, cs_sold_date_sk, cs_item_sk, cs_sold_time_sk
      FROM catalog_sales, date_dim
      WHERE d_date_sk = cs_sold_date_sk AND d_moy = 11 AND d_year = 2000
      UNION ALL
      SELECT ss_ext_sales_price, ss_sold_date_sk, ss_item_sk, ss_sold_time_sk
      FROM store_sales, date_dim
      WHERE d_date_sk = ss_sold_date_sk AND d_moy = 11 AND d_year = 2000) tmp,
     time_dim
WHERE sold_item_sk = i_item_sk AND i_manager_id = 1 AND time_sk = t_time_sk
  AND (t_shift = 'first' OR t_shift = 'second')
GROUP BY i_brand, i_brand_id, t_hour, t_minute
ORDER BY ext_price DESC, brand_id"""),
    "q66" -> (Seq("web_sales", "catalog_sales", "warehouse", "date_dim", "time_dim", "ship_mode") ->
      """
SELECT w_warehouse_name, w_warehouse_sq_ft, w_city, w_county, w_state, w_country,
       ship_carriers, yr,
       CAST(sum(jan_sales) AS DOUBLE) AS jan_sales,
       CAST(sum(feb_sales) AS DOUBLE) AS feb_sales,
       CAST(sum(mar_sales) AS DOUBLE) AS mar_sales,
       CAST(sum(apr_sales) AS DOUBLE) AS apr_sales,
       CAST(sum(may_sales) AS DOUBLE) AS may_sales,
       CAST(sum(jun_sales) AS DOUBLE) AS jun_sales,
       CAST(sum(jul_sales) AS DOUBLE) AS jul_sales,
       CAST(sum(aug_sales) AS DOUBLE) AS aug_sales,
       CAST(sum(sep_sales) AS DOUBLE) AS sep_sales,
       CAST(sum(oct_sales) AS DOUBLE) AS oct_sales,
       CAST(sum(nov_sales) AS DOUBLE) AS nov_sales,
       CAST(sum(dec_sales) AS DOUBLE) AS dec_sales,
       CAST(sum(jan_sales) AS DOUBLE) / w_warehouse_sq_ft AS jan_sales_per_sq_foot,
       CAST(sum(feb_sales) AS DOUBLE) / w_warehouse_sq_ft AS feb_sales_per_sq_foot,
       CAST(sum(mar_sales) AS DOUBLE) / w_warehouse_sq_ft AS mar_sales_per_sq_foot,
       CAST(sum(apr_sales) AS DOUBLE) / w_warehouse_sq_ft AS apr_sales_per_sq_foot,
       CAST(sum(may_sales) AS DOUBLE) / w_warehouse_sq_ft AS may_sales_per_sq_foot,
       CAST(sum(jun_sales) AS DOUBLE) / w_warehouse_sq_ft AS jun_sales_per_sq_foot,
       CAST(sum(jul_sales) AS DOUBLE) / w_warehouse_sq_ft AS jul_sales_per_sq_foot,
       CAST(sum(aug_sales) AS DOUBLE) / w_warehouse_sq_ft AS aug_sales_per_sq_foot,
       CAST(sum(sep_sales) AS DOUBLE) / w_warehouse_sq_ft AS sep_sales_per_sq_foot,
       CAST(sum(oct_sales) AS DOUBLE) / w_warehouse_sq_ft AS oct_sales_per_sq_foot,
       CAST(sum(nov_sales) AS DOUBLE) / w_warehouse_sq_ft AS nov_sales_per_sq_foot,
       CAST(sum(dec_sales) AS DOUBLE) / w_warehouse_sq_ft AS dec_sales_per_sq_foot,
       CAST(sum(jan_net) AS DOUBLE) AS jan_net,
       CAST(sum(feb_net) AS DOUBLE) AS feb_net,
       CAST(sum(mar_net) AS DOUBLE) AS mar_net,
       CAST(sum(apr_net) AS DOUBLE) AS apr_net,
       CAST(sum(may_net) AS DOUBLE) AS may_net,
       CAST(sum(jun_net) AS DOUBLE) AS jun_net,
       CAST(sum(jul_net) AS DOUBLE) AS jul_net,
       CAST(sum(aug_net) AS DOUBLE) AS aug_net,
       CAST(sum(sep_net) AS DOUBLE) AS sep_net,
       CAST(sum(oct_net) AS DOUBLE) AS oct_net,
       CAST(sum(nov_net) AS DOUBLE) AS nov_net,
       CAST(sum(dec_net) AS DOUBLE) AS dec_net
FROM (
  SELECT w_warehouse_name, w_warehouse_sq_ft, w_city, w_county, w_state, w_country,
         'carrier1' || ',' || 'carrier3' AS ship_carriers, d_year AS yr,
         sum(CASE WHEN d_moy = 1 THEN ws_ext_sales_price * ws_quantity ELSE 0 END) AS jan_sales,
         sum(CASE WHEN d_moy = 2 THEN ws_ext_sales_price * ws_quantity ELSE 0 END) AS feb_sales,
         sum(CASE WHEN d_moy = 3 THEN ws_ext_sales_price * ws_quantity ELSE 0 END) AS mar_sales,
         sum(CASE WHEN d_moy = 4 THEN ws_ext_sales_price * ws_quantity ELSE 0 END) AS apr_sales,
         sum(CASE WHEN d_moy = 5 THEN ws_ext_sales_price * ws_quantity ELSE 0 END) AS may_sales,
         sum(CASE WHEN d_moy = 6 THEN ws_ext_sales_price * ws_quantity ELSE 0 END) AS jun_sales,
         sum(CASE WHEN d_moy = 7 THEN ws_ext_sales_price * ws_quantity ELSE 0 END) AS jul_sales,
         sum(CASE WHEN d_moy = 8 THEN ws_ext_sales_price * ws_quantity ELSE 0 END) AS aug_sales,
         sum(CASE WHEN d_moy = 9 THEN ws_ext_sales_price * ws_quantity ELSE 0 END) AS sep_sales,
         sum(CASE WHEN d_moy = 10 THEN ws_ext_sales_price * ws_quantity ELSE 0 END) AS oct_sales,
         sum(CASE WHEN d_moy = 11 THEN ws_ext_sales_price * ws_quantity ELSE 0 END) AS nov_sales,
         sum(CASE WHEN d_moy = 12 THEN ws_ext_sales_price * ws_quantity ELSE 0 END) AS dec_sales,
         sum(CASE WHEN d_moy = 1 THEN ws_net_paid * ws_quantity ELSE 0 END) AS jan_net,
         sum(CASE WHEN d_moy = 2 THEN ws_net_paid * ws_quantity ELSE 0 END) AS feb_net,
         sum(CASE WHEN d_moy = 3 THEN ws_net_paid * ws_quantity ELSE 0 END) AS mar_net,
         sum(CASE WHEN d_moy = 4 THEN ws_net_paid * ws_quantity ELSE 0 END) AS apr_net,
         sum(CASE WHEN d_moy = 5 THEN ws_net_paid * ws_quantity ELSE 0 END) AS may_net,
         sum(CASE WHEN d_moy = 6 THEN ws_net_paid * ws_quantity ELSE 0 END) AS jun_net,
         sum(CASE WHEN d_moy = 7 THEN ws_net_paid * ws_quantity ELSE 0 END) AS jul_net,
         sum(CASE WHEN d_moy = 8 THEN ws_net_paid * ws_quantity ELSE 0 END) AS aug_net,
         sum(CASE WHEN d_moy = 9 THEN ws_net_paid * ws_quantity ELSE 0 END) AS sep_net,
         sum(CASE WHEN d_moy = 10 THEN ws_net_paid * ws_quantity ELSE 0 END) AS oct_net,
         sum(CASE WHEN d_moy = 11 THEN ws_net_paid * ws_quantity ELSE 0 END) AS nov_net,
         sum(CASE WHEN d_moy = 12 THEN ws_net_paid * ws_quantity ELSE 0 END) AS dec_net
  FROM web_sales, warehouse, date_dim, time_dim, ship_mode
  WHERE ws_warehouse_sk = w_warehouse_sk AND ws_sold_date_sk = d_date_sk
    AND ws_sold_time_sk = t_time_sk AND ws_ship_mode_sk = sm_ship_mode_sk
    AND d_year = 2001 AND t_time BETWEEN 30838 AND 30838 + 28800
    AND sm_carrier IN ('carrier1', 'carrier3')
  GROUP BY w_warehouse_name, w_warehouse_sq_ft, w_city, w_county, w_state,
           w_country, d_year
  UNION ALL
  SELECT w_warehouse_name, w_warehouse_sq_ft, w_city, w_county, w_state, w_country,
         'carrier1' || ',' || 'carrier3' AS ship_carriers, d_year AS yr,
         sum(CASE WHEN d_moy = 1 THEN cs_sales_price * cs_quantity ELSE 0 END) AS jan_sales,
         sum(CASE WHEN d_moy = 2 THEN cs_sales_price * cs_quantity ELSE 0 END) AS feb_sales,
         sum(CASE WHEN d_moy = 3 THEN cs_sales_price * cs_quantity ELSE 0 END) AS mar_sales,
         sum(CASE WHEN d_moy = 4 THEN cs_sales_price * cs_quantity ELSE 0 END) AS apr_sales,
         sum(CASE WHEN d_moy = 5 THEN cs_sales_price * cs_quantity ELSE 0 END) AS may_sales,
         sum(CASE WHEN d_moy = 6 THEN cs_sales_price * cs_quantity ELSE 0 END) AS jun_sales,
         sum(CASE WHEN d_moy = 7 THEN cs_sales_price * cs_quantity ELSE 0 END) AS jul_sales,
         sum(CASE WHEN d_moy = 8 THEN cs_sales_price * cs_quantity ELSE 0 END) AS aug_sales,
         sum(CASE WHEN d_moy = 9 THEN cs_sales_price * cs_quantity ELSE 0 END) AS sep_sales,
         sum(CASE WHEN d_moy = 10 THEN cs_sales_price * cs_quantity ELSE 0 END) AS oct_sales,
         sum(CASE WHEN d_moy = 11 THEN cs_sales_price * cs_quantity ELSE 0 END) AS nov_sales,
         sum(CASE WHEN d_moy = 12 THEN cs_sales_price * cs_quantity ELSE 0 END) AS dec_sales,
         sum(CASE WHEN d_moy = 1 THEN cs_net_paid_inc_tax * cs_quantity ELSE 0 END) AS jan_net,
         sum(CASE WHEN d_moy = 2 THEN cs_net_paid_inc_tax * cs_quantity ELSE 0 END) AS feb_net,
         sum(CASE WHEN d_moy = 3 THEN cs_net_paid_inc_tax * cs_quantity ELSE 0 END) AS mar_net,
         sum(CASE WHEN d_moy = 4 THEN cs_net_paid_inc_tax * cs_quantity ELSE 0 END) AS apr_net,
         sum(CASE WHEN d_moy = 5 THEN cs_net_paid_inc_tax * cs_quantity ELSE 0 END) AS may_net,
         sum(CASE WHEN d_moy = 6 THEN cs_net_paid_inc_tax * cs_quantity ELSE 0 END) AS jun_net,
         sum(CASE WHEN d_moy = 7 THEN cs_net_paid_inc_tax * cs_quantity ELSE 0 END) AS jul_net,
         sum(CASE WHEN d_moy = 8 THEN cs_net_paid_inc_tax * cs_quantity ELSE 0 END) AS aug_net,
         sum(CASE WHEN d_moy = 9 THEN cs_net_paid_inc_tax * cs_quantity ELSE 0 END) AS sep_net,
         sum(CASE WHEN d_moy = 10 THEN cs_net_paid_inc_tax * cs_quantity ELSE 0 END) AS oct_net,
         sum(CASE WHEN d_moy = 11 THEN cs_net_paid_inc_tax * cs_quantity ELSE 0 END) AS nov_net,
         sum(CASE WHEN d_moy = 12 THEN cs_net_paid_inc_tax * cs_quantity ELSE 0 END) AS dec_net
  FROM catalog_sales, warehouse, date_dim, time_dim, ship_mode
  WHERE cs_warehouse_sk = w_warehouse_sk AND cs_sold_date_sk = d_date_sk
    AND cs_sold_time_sk = t_time_sk AND cs_ship_mode_sk = sm_ship_mode_sk
    AND d_year = 2001 AND t_time BETWEEN 30838 AND 30838 + 28800
    AND sm_carrier IN ('carrier1', 'carrier3')
  GROUP BY w_warehouse_name, w_warehouse_sq_ft, w_city, w_county, w_state,
           w_country, d_year) x
GROUP BY w_warehouse_name, w_warehouse_sq_ft, w_city, w_county, w_state,
         w_country, ship_carriers, yr
ORDER BY w_warehouse_name
LIMIT 100"""),
    "q10" -> (Seq("customer", "customer_address", "customer_demographics",
                  "store_sales", "web_sales", "catalog_sales", "date_dim") ->
      """
SELECT cd_gender, cd_marital_status, cd_education_status, count(*) AS cnt1,
       cd_purchase_estimate, count(*) AS cnt2, cd_credit_rating, count(*) AS cnt3,
       cd_dep_count, count(*) AS cnt4, cd_dep_employed_count, count(*) AS cnt5,
       cd_dep_college_count, count(*) AS cnt6
FROM customer c, customer_address ca, customer_demographics
WHERE c.c_current_addr_sk = ca.ca_address_sk
  AND ca_county IN ('county1', 'county2', 'county3', 'county4', 'county5')
  AND cd_demo_sk = c.c_current_cdemo_sk
  AND EXISTS (SELECT * FROM store_sales, date_dim
              WHERE c.c_customer_sk = ss_customer_sk AND ss_sold_date_sk = d_date_sk
                AND d_year = 2000 AND d_moy BETWEEN 1 AND 4)
  AND (EXISTS (SELECT * FROM web_sales, date_dim
               WHERE c.c_customer_sk = ws_bill_customer_sk AND ws_sold_date_sk = d_date_sk
                 AND d_year = 2000 AND d_moy BETWEEN 1 AND 4)
    OR EXISTS (SELECT * FROM catalog_sales, date_dim
               WHERE c.c_customer_sk = cs_ship_customer_sk AND cs_sold_date_sk = d_date_sk
                 AND d_year = 2000 AND d_moy BETWEEN 1 AND 4))
GROUP BY cd_gender, cd_marital_status, cd_education_status, cd_purchase_estimate,
         cd_credit_rating, cd_dep_count, cd_dep_employed_count, cd_dep_college_count
ORDER BY cd_gender, cd_marital_status, cd_education_status, cd_purchase_estimate,
         cd_credit_rating, cd_dep_count, cd_dep_employed_count, cd_dep_college_count
LIMIT 100"""),
    "q69" -> (Seq("customer", "customer_address", "customer_demographics",
                  "store_sales", "web_sales", "catalog_sales", "date_dim") ->
      """
SELECT cd_gender, cd_marital_status, cd_education_status, count(*) AS cnt1,
       cd_purchase_estimate, count(*) AS cnt2, cd_credit_rating, count(*) AS cnt3
FROM customer c, customer_address ca, customer_demographics
WHERE c.c_current_addr_sk = ca.ca_address_sk
  AND ca_state IN ('CA', 'WA', 'GA')
  AND cd_demo_sk = c.c_current_cdemo_sk
  AND EXISTS (SELECT * FROM store_sales, date_dim
              WHERE c.c_customer_sk = ss_customer_sk AND ss_sold_date_sk = d_date_sk
                AND d_year = 2000 AND d_moy BETWEEN 4 AND 6)
  AND NOT EXISTS (SELECT * FROM web_sales, date_dim
                  WHERE c.c_customer_sk = ws_bill_customer_sk AND ws_sold_date_sk = d_date_sk
                    AND d_year = 2000 AND d_moy BETWEEN 4 AND 6)
  AND NOT EXISTS (SELECT * FROM catalog_sales, date_dim
                  WHERE c.c_customer_sk = cs_ship_customer_sk AND cs_sold_date_sk = d_date_sk
                    AND d_year = 2000 AND d_moy BETWEEN 4 AND 6)
GROUP BY cd_gender, cd_marital_status, cd_education_status, cd_purchase_estimate,
         cd_credit_rating
ORDER BY cd_gender, cd_marital_status, cd_education_status, cd_purchase_estimate,
         cd_credit_rating
LIMIT 100"""),
    "q49" -> (Seq("web_sales", "web_returns", "catalog_sales", "catalog_returns",
                  "store_sales", "store_returns", "date_dim") ->
      """
WITH in_web AS (
  SELECT ws.ws_item_sk AS item,
         CAST(sum(coalesce(wr.wr_return_quantity, 0)) AS DOUBLE) /
         sum(coalesce(ws.ws_quantity, 0)) AS return_ratio,
         CAST(sum(coalesce(wr.wr_return_amt, 0)) AS DOUBLE) /
         CAST(sum(coalesce(ws.ws_net_paid, 0)) AS DOUBLE) AS currency_ratio
  FROM web_sales ws LEFT OUTER JOIN web_returns wr
       ON ws.ws_order_number = wr.wr_order_number AND ws.ws_item_sk = wr.wr_item_sk,
       date_dim
  WHERE wr.wr_return_amt > 10 AND ws.ws_net_profit > 1 AND ws.ws_net_paid > 0
    AND ws.ws_quantity > 0 AND ws_sold_date_sk = d_date_sk
    AND d_year = 2000 AND d_moy = 12
  GROUP BY ws.ws_item_sk),
web AS (
  SELECT item, return_ratio, currency_ratio,
         rank() OVER (ORDER BY return_ratio) AS return_rank,
         rank() OVER (ORDER BY currency_ratio) AS currency_rank
  FROM in_web),
in_cat AS (
  SELECT cs.cs_item_sk AS item,
         CAST(sum(coalesce(cr.cr_return_quantity, 0)) AS DOUBLE) /
         sum(coalesce(cs.cs_quantity, 0)) AS return_ratio,
         CAST(sum(coalesce(cr.cr_return_amount, 0)) AS DOUBLE) /
         CAST(sum(coalesce(cs.cs_net_paid, 0)) AS DOUBLE) AS currency_ratio
  FROM catalog_sales cs LEFT OUTER JOIN catalog_returns cr
       ON cs.cs_order_number = cr.cr_order_number AND cs.cs_item_sk = cr.cr_item_sk,
       date_dim
  WHERE cr.cr_return_amount > 10 AND cs.cs_net_profit > 1 AND cs.cs_net_paid > 0
    AND cs.cs_quantity > 0 AND cs_sold_date_sk = d_date_sk
    AND d_year = 2000 AND d_moy = 12
  GROUP BY cs.cs_item_sk),
cat AS (
  SELECT item, return_ratio, currency_ratio,
         rank() OVER (ORDER BY return_ratio) AS return_rank,
         rank() OVER (ORDER BY currency_ratio) AS currency_rank
  FROM in_cat),
in_store AS (
  SELECT sts.ss_item_sk AS item,
         CAST(sum(coalesce(sr.sr_return_quantity, 0)) AS DOUBLE) /
         sum(coalesce(sts.ss_quantity, 0)) AS return_ratio,
         CAST(sum(coalesce(sr.sr_return_amt, 0)) AS DOUBLE) /
         CAST(sum(coalesce(sts.ss_net_paid, 0)) AS DOUBLE) AS currency_ratio
  FROM store_sales sts LEFT OUTER JOIN store_returns sr
       ON sts.ss_ticket_number = sr.sr_ticket_number AND sts.ss_item_sk = sr.sr_item_sk,
       date_dim
  WHERE sr.sr_return_amt > 10 AND sts.ss_net_profit > 1 AND sts.ss_net_paid > 0
    AND sts.ss_quantity > 0 AND ss_sold_date_sk = d_date_sk
    AND d_year = 2000 AND d_moy = 12
  GROUP BY sts.ss_item_sk),
store AS (
  SELECT item, return_ratio, currency_ratio,
         rank() OVER (ORDER BY return_ratio) AS return_rank,
         rank() OVER (ORDER BY currency_ratio) AS currency_rank
  FROM in_store)
SELECT channel, item, return_ratio, return_rank, currency_rank
FROM (SELECT 'web' AS channel, item, return_ratio, return_rank, currency_rank
      FROM web WHERE return_rank <= 10 OR currency_rank <= 10
      UNION
      SELECT 'catalog' AS channel, item, return_ratio, return_rank, currency_rank
      FROM cat WHERE return_rank <= 10 OR currency_rank <= 10
      UNION
      SELECT 'store' AS channel, item, return_ratio, return_rank, currency_rank
      FROM store WHERE return_rank <= 10 OR currency_rank <= 10) x
ORDER BY channel, return_rank, currency_rank, item
LIMIT 100"""),
    "q5" -> (Seq("store_sales", "store_returns", "catalog_sales", "catalog_returns",
                 "web_sales", "web_returns", "date_dim", "store", "catalog_page",
                 "web_site") ->
      """
WITH ssr AS (
  SELECT s_store_id,
         sum(sales_price) AS sales, sum(profit) AS profit,
         sum(return_amt) AS returns_amt, sum(net_loss) AS profit_loss
  FROM (SELECT ss_store_sk AS store_sk, ss_sold_date_sk AS date_sk,
               ss_ext_sales_price AS sales_price, ss_net_profit AS profit,
               CAST(0 AS DECIMAL(12,2)) AS return_amt,
               CAST(0 AS DECIMAL(12,2)) AS net_loss
        FROM store_sales
        UNION ALL
        SELECT sr_store_sk, sr_returned_date_sk,
               CAST(0 AS DECIMAL(12,2)), CAST(0 AS DECIMAL(12,2)),
               sr_return_amt, sr_net_loss
        FROM store_returns) salesreturns, date_dim, store
  WHERE date_sk = d_date_sk
    AND d_date BETWEEN DATE '2000-08-23' AND DATE '2000-09-06'
    AND store_sk = s_store_sk
  GROUP BY s_store_id),
csr AS (
  SELECT cp_catalog_page_id,
         sum(sales_price) AS sales, sum(profit) AS profit,
         sum(return_amt) AS returns_amt, sum(net_loss) AS profit_loss
  FROM (SELECT cs_catalog_page_sk AS page_sk, cs_sold_date_sk AS date_sk,
               cs_ext_sales_price AS sales_price, cs_net_profit AS profit,
               CAST(0 AS DECIMAL(12,2)) AS return_amt,
               CAST(0 AS DECIMAL(12,2)) AS net_loss
        FROM catalog_sales
        UNION ALL
        SELECT cr_catalog_page_sk, cr_returned_date_sk,
               CAST(0 AS DECIMAL(12,2)), CAST(0 AS DECIMAL(12,2)),
               cr_return_amount, cr_net_loss
        FROM catalog_returns) salesreturns, date_dim, catalog_page
  WHERE date_sk = d_date_sk
    AND d_date BETWEEN DATE '2000-08-23' AND DATE '2000-09-06'
    AND page_sk = cp_catalog_page_sk
  GROUP BY cp_catalog_page_id),
wsr AS (
  SELECT web_site_id,
         sum(sales_price) AS sales, sum(profit) AS profit,
         sum(return_amt) AS returns_amt, sum(net_loss) AS profit_loss
  FROM (SELECT ws_web_site_sk AS wsr_web_site_sk, ws_sold_date_sk AS date_sk,
               ws_ext_sales_price AS sales_price, ws_net_profit AS profit,
               CAST(0 AS DECIMAL(12,2)) AS return_amt,
               CAST(0 AS DECIMAL(12,2)) AS net_loss
        FROM web_sales
        UNION ALL
        SELECT ws_web_site_sk, wr_returned_date_sk,
               CAST(0 AS DECIMAL(12,2)), CAST(0 AS DECIMAL(12,2)),
               wr_return_amt, wr_net_loss
        FROM web_returns LEFT OUTER JOIN web_sales
             ON wr_item_sk = ws_item_sk AND wr_order_number = ws_order_number) salesreturns,
       date_dim, web_site
  WHERE date_sk = d_date_sk
    AND d_date BETWEEN DATE '2000-08-23' AND DATE '2000-09-06'
    AND wsr_web_site_sk = web_site_sk
  GROUP BY web_site_id)
SELECT channel, id, CAST(sum(sales) AS DOUBLE) AS sales,
       CAST(sum(returns_amt) AS DOUBLE) AS returns_amt,
       CAST(sum(profit) AS DOUBLE) AS profit
FROM (SELECT 'store channel' AS channel, 'store' || s_store_id AS id,
             sales, returns_amt, profit - profit_loss AS profit
      FROM ssr
      UNION ALL
      SELECT 'catalog channel' AS channel, 'catalog_page' || cp_catalog_page_id AS id,
             sales, returns_amt, profit - profit_loss AS profit
      FROM csr
      UNION ALL
      SELECT 'web channel' AS channel, 'web_site' || web_site_id AS id,
             sales, returns_amt, profit - profit_loss AS profit
      FROM wsr) x
GROUP BY ROLLUP(channel, id)
ORDER BY channel NULLS FIRST, id NULLS FIRST
LIMIT 100"""),
    "q77" -> (Seq("store_sales", "store_returns", "catalog_sales", "catalog_returns",
                  "web_sales", "web_returns", "date_dim", "store", "web_page") ->
      """
WITH ss AS (
  SELECT s_store_sk, sum(ss_ext_sales_price) AS sales, sum(ss_net_profit) AS profit
  FROM store_sales, date_dim, store
  WHERE ss_sold_date_sk = d_date_sk
    AND d_date BETWEEN DATE '2000-08-23' AND DATE '2000-09-22'
    AND ss_store_sk = s_store_sk
  GROUP BY s_store_sk),
sr AS (
  SELECT s_store_sk, sum(sr_return_amt) AS returns_amt, sum(sr_net_loss) AS profit_loss
  FROM store_returns, date_dim, store
  WHERE sr_returned_date_sk = d_date_sk
    AND d_date BETWEEN DATE '2000-08-23' AND DATE '2000-09-22'
    AND sr_store_sk = s_store_sk
  GROUP BY s_store_sk),
cs AS (
  SELECT cs_call_center_sk, sum(cs_ext_sales_price) AS sales, sum(cs_net_profit) AS profit
  FROM catalog_sales, date_dim
  WHERE cs_sold_date_sk = d_date_sk
    AND d_date BETWEEN DATE '2000-08-23' AND DATE '2000-09-22'
  GROUP BY cs_call_center_sk),
cr AS (
  SELECT cr_call_center_sk, sum(cr_return_amount) AS returns_amt, sum(cr_net_loss) AS profit_loss
  FROM catalog_returns, date_dim
  WHERE cr_returned_date_sk = d_date_sk
    AND d_date BETWEEN DATE '2000-08-23' AND DATE '2000-09-22'
  GROUP BY cr_call_center_sk),
ws AS (
  SELECT wp_web_page_sk, sum(ws_ext_sales_price) AS sales, sum(ws_net_profit) AS profit
  FROM web_sales, date_dim, web_page
  WHERE ws_sold_date_sk = d_date_sk
    AND d_date BETWEEN DATE '2000-08-23' AND DATE '2000-09-22'
    AND ws_web_page_sk = wp_web_page_sk
  GROUP BY wp_web_page_sk),
wr AS (
  SELECT wp_web_page_sk, sum(wr_return_amt) AS returns_amt, sum(wr_net_loss) AS profit_loss
  FROM web_returns, date_dim, web_page
  WHERE wr_returned_date_sk = d_date_sk
    AND d_date BETWEEN DATE '2000-08-23' AND DATE '2000-09-22'
    AND wr_web_page_sk = wp_web_page_sk
  GROUP BY wp_web_page_sk)
SELECT channel, id, CAST(sum(sales) AS DOUBLE) AS sales,
       CAST(sum(returns_amt) AS DOUBLE) AS returns_amt,
       CAST(sum(profit) AS DOUBLE) AS profit
FROM (SELECT 'store channel' AS channel, ss.s_store_sk AS id, sales,
             coalesce(returns_amt, 0) AS returns_amt,
             profit - coalesce(profit_loss, 0) AS profit
      FROM ss LEFT JOIN sr ON ss.s_store_sk = sr.s_store_sk
      UNION ALL
      SELECT /*+ BROADCAST(cr) */ 'catalog channel' AS channel, cs_call_center_sk AS id, sales,
             returns_amt, profit - profit_loss AS profit
      FROM cs, cr
      UNION ALL
      SELECT 'web channel' AS channel, ws.wp_web_page_sk AS id, sales,
             coalesce(returns_amt, 0) AS returns_amt,
             profit - coalesce(profit_loss, 0) AS profit
      FROM ws LEFT JOIN wr ON ws.wp_web_page_sk = wr.wp_web_page_sk) x
GROUP BY ROLLUP(channel, id)
ORDER BY channel NULLS FIRST, id NULLS FIRST
LIMIT 100"""),
    "q80" -> (Seq("store_sales", "store_returns", "catalog_sales", "catalog_returns",
                  "web_sales", "web_returns", "date_dim", "store", "catalog_page",
                  "web_site", "item", "promotion") ->
      """
WITH ssr AS (
  SELECT s_store_id AS store_id, sum(ss_ext_sales_price) AS sales,
         sum(coalesce(sr_return_amt, 0)) AS returns_amt,
         sum(ss_net_profit - coalesce(sr_net_loss, 0)) AS profit
  FROM store_sales LEFT OUTER JOIN store_returns
       ON ss_item_sk = sr_item_sk AND ss_ticket_number = sr_ticket_number,
       date_dim, store, item, promotion
  WHERE ss_sold_date_sk = d_date_sk
    AND d_date BETWEEN DATE '2000-08-23' AND DATE '2000-09-22'
    AND ss_store_sk = s_store_sk AND ss_item_sk = i_item_sk
    AND i_current_price > 50 AND ss_promo_sk = p_promo_sk
    AND p_channel_tv = 'N'
  GROUP BY s_store_id),
csr AS (
  SELECT cp_catalog_page_id AS catalog_page_id, sum(cs_ext_sales_price) AS sales,
         sum(coalesce(cr_return_amount, 0)) AS returns_amt,
         sum(cs_net_profit - coalesce(cr_net_loss, 0)) AS profit
  FROM catalog_sales LEFT OUTER JOIN catalog_returns
       ON cs_item_sk = cr_item_sk AND cs_order_number = cr_order_number,
       date_dim, catalog_page, item, promotion
  WHERE cs_sold_date_sk = d_date_sk
    AND d_date BETWEEN DATE '2000-08-23' AND DATE '2000-09-22'
    AND cs_catalog_page_sk = cp_catalog_page_sk AND cs_item_sk = i_item_sk
    AND i_current_price > 50 AND cs_promo_sk = p_promo_sk
    AND p_channel_tv = 'N'
  GROUP BY cp_catalog_page_id),
wsr AS (
  SELECT web_site_id, sum(ws_ext_sales_price) AS sales,
         sum(coalesce(wr_return_amt, 0)) AS returns_amt,
         sum(ws_net_profit - coalesce(wr_net_loss, 0)) AS profit
  FROM web_sales LEFT OUTER JOIN web_returns
       ON ws_item_sk = wr_item_sk AND ws_order_number = wr_order_number,
       date_dim, web_site, item, promotion
  WHERE ws_sold_date_sk = d_date_sk
    AND d_date BETWEEN DATE '2000-08-23' AND DATE '2000-09-22'
    AND ws_web_site_sk = web_site_sk AND ws_item_sk = i_item_sk
    AND i_current_price > 50 AND ws_promo_sk = p_promo_sk
    AND p_channel_tv = 'N'
  GROUP BY web_site_id)
SELECT channel, id, CAST(sum(sales) AS DOUBLE) AS sales,
       CAST(sum(returns_amt) AS DOUBLE) AS returns_amt,
       CAST(sum(profit) AS DOUBLE) AS profit
FROM (SELECT 'store channel' AS channel, 'store' || store_id AS id,
             sales, returns_amt, profit
      FROM ssr
      UNION ALL
      SELECT 'catalog channel' AS channel, 'catalog_page' || catalog_page_id AS id,
             sales, returns_amt, profit
      FROM csr
      UNION ALL
      SELECT 'web channel' AS channel, 'web_site' || web_site_id AS id,
             sales, returns_amt, profit
      FROM wsr) x
GROUP BY ROLLUP(channel, id)
ORDER BY channel NULLS FIRST, id NULLS FIRST
LIMIT 100"""),
    "q81" -> (Seq("catalog_returns", "date_dim", "customer_address", "customer") ->
      """
WITH customer_total_return AS (
  SELECT cr_returning_customer_sk AS ctr_customer_sk, ca_state AS ctr_state,
         sum(cr_return_amt_inc_tax) AS ctr_total_return
  FROM catalog_returns, date_dim, customer_address
  WHERE cr_returned_date_sk = d_date_sk AND d_year = 2000
    AND cr_returning_addr_sk = ca_address_sk
  GROUP BY cr_returning_customer_sk, ca_state)
SELECT c_customer_id, c_salutation, c_first_name, c_last_name,
       ca_street_number, ca_street_name, ca_suite_number, ca_city, ca_county,
       ca_state, ca_zip, ca_country, CAST(ca_gmt_offset AS DOUBLE) AS ca_gmt_offset,
       ca_location_type, CAST(ctr_total_return AS DOUBLE) AS ctr_total_return
FROM customer_total_return ctr1, customer_address, customer
WHERE ctr1.ctr_total_return * 10 *
        (SELECT count(*) FROM customer_total_return ctr2
         WHERE ctr1.ctr_state = ctr2.ctr_state)
      > 12 * (SELECT sum(ctr_total_return) FROM customer_total_return ctr2
              WHERE ctr1.ctr_state = ctr2.ctr_state)
  AND ca_address_sk = c_current_addr_sk
  AND ca_state = 'CA'
  AND ctr1.ctr_customer_sk = c_customer_sk
ORDER BY c_customer_id, c_salutation, c_first_name, c_last_name,
         ca_street_number, ca_street_name, ca_suite_number, ca_city, ca_county,
         ca_state, ca_zip, ca_country, ca_gmt_offset, ca_location_type,
         ctr_total_return
LIMIT 100"""),
    "q83" -> (Seq("store_returns", "catalog_returns", "web_returns", "item", "date_dim") ->
      """
WITH sr_items AS (
  SELECT i_item_id AS item_id, CAST(sum(CAST(sr_return_quantity AS BIGINT)) AS BIGINT) AS sr_item_qty
  FROM store_returns, item, date_dim
  WHERE sr_item_sk = i_item_sk
    AND d_date IN (SELECT d_date FROM date_dim
                   WHERE d_week_seq IN (SELECT d_week_seq FROM date_dim
                                        WHERE d_date IN (DATE '2000-06-30',
                                                         DATE '2000-09-27',
                                                         DATE '2000-11-17')))
    AND sr_returned_date_sk = d_date_sk
  GROUP BY i_item_id),
cr_items AS (
  SELECT i_item_id AS item_id, CAST(sum(CAST(cr_return_quantity AS BIGINT)) AS BIGINT) AS cr_item_qty
  FROM catalog_returns, item, date_dim
  WHERE cr_item_sk = i_item_sk
    AND d_date IN (SELECT d_date FROM date_dim
                   WHERE d_week_seq IN (SELECT d_week_seq FROM date_dim
                                        WHERE d_date IN (DATE '2000-06-30',
                                                         DATE '2000-09-27',
                                                         DATE '2000-11-17')))
    AND cr_returned_date_sk = d_date_sk
  GROUP BY i_item_id),
wr_items AS (
  SELECT i_item_id AS item_id, CAST(sum(CAST(wr_return_quantity AS BIGINT)) AS BIGINT) AS wr_item_qty
  FROM web_returns, item, date_dim
  WHERE wr_item_sk = i_item_sk
    AND d_date IN (SELECT d_date FROM date_dim
                   WHERE d_week_seq IN (SELECT d_week_seq FROM date_dim
                                        WHERE d_date IN (DATE '2000-06-30',
                                                         DATE '2000-09-27',
                                                         DATE '2000-11-17')))
    AND wr_returned_date_sk = d_date_sk
  GROUP BY i_item_id)
SELECT sr_items.item_id, sr_item_qty,
       CAST(sr_item_qty AS DOUBLE) / (sr_item_qty + cr_item_qty + wr_item_qty) / 3.0 * 100 AS sr_dev,
       cr_item_qty,
       CAST(cr_item_qty AS DOUBLE) / (sr_item_qty + cr_item_qty + wr_item_qty) / 3.0 * 100 AS cr_dev,
       wr_item_qty,
       CAST(wr_item_qty AS DOUBLE) / (sr_item_qty + cr_item_qty + wr_item_qty) / 3.0 * 100 AS wr_dev,
       CAST(sr_item_qty + cr_item_qty + wr_item_qty AS DOUBLE) / 3 AS average
FROM sr_items, cr_items, wr_items
WHERE sr_items.item_id = cr_items.item_id AND sr_items.item_id = wr_items.item_id
ORDER BY sr_items.item_id, sr_item_qty
LIMIT 100"""),
    "q60" -> (Seq("store_sales", "catalog_sales", "web_sales", "date_dim",
                  "customer_address", "item") ->
      """
WITH ss AS (
  SELECT i_item_id, sum(ss_ext_sales_price) total_sales
  FROM store_sales, date_dim, customer_address, item
  WHERE i_item_id IN (SELECT i_item_id FROM item WHERE i_category IN ('Music'))
    AND ss_item_sk = i_item_sk AND ss_sold_date_sk = d_date_sk
    AND d_year = 2000 AND d_moy = 9 AND ss_addr_sk = ca_address_sk
    AND ca_gmt_offset = -5
  GROUP BY i_item_id),
cs AS (
  SELECT i_item_id, sum(cs_ext_sales_price) total_sales
  FROM catalog_sales, date_dim, customer_address, item
  WHERE i_item_id IN (SELECT i_item_id FROM item WHERE i_category IN ('Music'))
    AND cs_item_sk = i_item_sk AND cs_sold_date_sk = d_date_sk
    AND d_year = 2000 AND d_moy = 9 AND cs_bill_addr_sk = ca_address_sk
    AND ca_gmt_offset = -5
  GROUP BY i_item_id),
ws AS (
  SELECT i_item_id, sum(ws_ext_sales_price) total_sales
  FROM web_sales, date_dim, customer_address, item
  WHERE i_item_id IN (SELECT i_item_id FROM item WHERE i_category IN ('Music'))
    AND ws_item_sk = i_item_sk AND ws_sold_date_sk = d_date_sk
    AND d_year = 2000 AND d_moy = 9 AND ws_bill_addr_sk = ca_address_sk
    AND ca_gmt_offset = -5
  GROUP BY i_item_id)
SELECT i_item_id, CAST(sum(total_sales) AS DOUBLE) AS total_sales
FROM (SELECT * FROM ss UNION ALL SELECT * FROM cs UNION ALL SELECT * FROM ws) tmp1
GROUP BY i_item_id
ORDER BY i_item_id, total_sales
LIMIT 100"""),
    "q54" -> (Seq("catalog_sales", "web_sales", "item", "date_dim", "customer",
                  "store_sales", "customer_address", "store") ->
      """
WITH my_customers AS (
  SELECT DISTINCT c_customer_sk, c_current_addr_sk
  FROM (SELECT cs_sold_date_sk AS sold_date_sk,
               cs_bill_customer_sk AS customer_sk, cs_item_sk AS item_sk
        FROM catalog_sales
        UNION ALL
        SELECT ws_sold_date_sk, ws_bill_customer_sk, ws_item_sk
        FROM web_sales) cs_or_ws_sales, item, date_dim, customer
  WHERE sold_date_sk = d_date_sk AND item_sk = i_item_sk
    AND i_category = 'Children' AND i_class IN ('class1', 'class5', 'class13')
    AND c_customer_sk = cs_or_ws_sales.customer_sk
    AND d_year = 2000),
my_revenue AS (
  SELECT c_customer_sk, sum(ss_ext_sales_price) AS revenue
  FROM my_customers, store_sales, customer_address, store, date_dim
  WHERE c_current_addr_sk = ca_address_sk
    AND ca_county = s_county AND ca_state = s_state
    AND ss_sold_date_sk = d_date_sk
    AND c_customer_sk = ss_customer_sk
    AND d_month_seq BETWEEN (SELECT DISTINCT d_month_seq + 1 FROM date_dim
                             WHERE d_year = 2000 AND d_moy = 12)
                        AND (SELECT DISTINCT d_month_seq + 3 FROM date_dim
                             WHERE d_year = 2000 AND d_moy = 12)
  GROUP BY c_customer_sk),
segments AS (
  SELECT CAST(floor(CAST(revenue AS DOUBLE) / 50) AS INT) AS segment
  FROM my_revenue)
SELECT segment, count(*) AS num_customers, segment * 50 AS segment_base
FROM segments
GROUP BY segment
ORDER BY segment, num_customers
LIMIT 100"""),
    "q75" -> (Seq("catalog_sales", "catalog_returns", "store_sales", "store_returns",
                  "web_sales", "web_returns", "item", "date_dim") ->
      """
WITH all_sales AS (
  SELECT d_year, i_brand_id, i_class_id, i_category_id, i_manufact_id,
         CAST(sum(sales_cnt) AS BIGINT) AS sales_cnt, sum(sales_amt) AS sales_amt
  FROM (SELECT d_year, i_brand_id, i_class_id, i_category_id, i_manufact_id,
               cs_quantity - coalesce(cr_return_quantity, 0) AS sales_cnt,
               cs_ext_sales_price - coalesce(cr_return_amount, 0.0) AS sales_amt
        FROM catalog_sales
             JOIN item ON i_item_sk = cs_item_sk
             JOIN date_dim ON d_date_sk = cs_sold_date_sk
             LEFT JOIN catalog_returns ON cs_order_number = cr_order_number
                                      AND cs_item_sk = cr_item_sk
        WHERE i_category = 'Books'
        UNION
        SELECT d_year, i_brand_id, i_class_id, i_category_id, i_manufact_id,
               ss_quantity - coalesce(sr_return_quantity, 0) AS sales_cnt,
               ss_ext_sales_price - coalesce(sr_return_amt, 0.0) AS sales_amt
        FROM store_sales
             JOIN item ON i_item_sk = ss_item_sk
             JOIN date_dim ON d_date_sk = ss_sold_date_sk
             LEFT JOIN store_returns ON ss_ticket_number = sr_ticket_number
                                    AND ss_item_sk = sr_item_sk
        WHERE i_category = 'Books'
        UNION
        SELECT d_year, i_brand_id, i_class_id, i_category_id, i_manufact_id,
               ws_quantity - coalesce(wr_return_quantity, 0) AS sales_cnt,
               ws_ext_sales_price - coalesce(wr_return_amt, 0.0) AS sales_amt
        FROM web_sales
             JOIN item ON i_item_sk = ws_item_sk
             JOIN date_dim ON d_date_sk = ws_sold_date_sk
             LEFT JOIN web_returns ON ws_order_number = wr_order_number
                                  AND ws_item_sk = wr_item_sk
        WHERE i_category = 'Books') sales_detail
  GROUP BY d_year, i_brand_id, i_class_id, i_category_id, i_manufact_id)
SELECT prev_yr.d_year AS prev_year, curr_yr.d_year AS curr_year,
       curr_yr.i_brand_id, curr_yr.i_class_id, curr_yr.i_category_id,
       curr_yr.i_manufact_id,
       prev_yr.sales_cnt AS prev_yr_cnt, curr_yr.sales_cnt AS curr_yr_cnt,
       curr_yr.sales_cnt - prev_yr.sales_cnt AS sales_cnt_diff,
       CAST(curr_yr.sales_amt - prev_yr.sales_amt AS DOUBLE) AS sales_amt_diff
FROM all_sales curr_yr, all_sales prev_yr
WHERE curr_yr.i_brand_id = prev_yr.i_brand_id
  AND curr_yr.i_class_id = prev_yr.i_class_id
  AND curr_yr.i_category_id = prev_yr.i_category_id
  AND curr_yr.i_manufact_id = prev_yr.i_manufact_id
  AND curr_yr.d_year = 2002 AND prev_yr.d_year = 2002 - 1
  AND CAST(curr_yr.sales_cnt AS DOUBLE) / nullif(prev_yr.sales_cnt, 0) < 0.9
ORDER BY sales_cnt_diff, sales_amt_diff, curr_yr.i_brand_id, curr_yr.i_class_id,
         curr_yr.i_category_id, curr_yr.i_manufact_id
LIMIT 100"""),
    "q78" -> (Seq("web_sales", "web_returns", "catalog_sales", "catalog_returns",
                  "store_sales", "store_returns", "date_dim") ->
      """
WITH ws AS (
  SELECT d_year AS ws_sold_year, ws_item_sk,
         ws_bill_customer_sk AS ws_customer_sk,
         CAST(sum(CAST(ws_quantity AS BIGINT)) AS BIGINT) AS ws_qty,
         sum(ws_wholesale_cost) AS ws_wc, sum(ws_sales_price) AS ws_sp
  FROM web_sales
       LEFT JOIN web_returns ON wr_order_number = ws_order_number
                            AND ws_item_sk = wr_item_sk
       JOIN date_dim ON ws_sold_date_sk = d_date_sk
  WHERE wr_order_number IS NULL
  GROUP BY d_year, ws_item_sk, ws_bill_customer_sk),
cs AS (
  SELECT d_year AS cs_sold_year, cs_item_sk,
         cs_bill_customer_sk AS cs_customer_sk,
         CAST(sum(CAST(cs_quantity AS BIGINT)) AS BIGINT) AS cs_qty,
         sum(cs_wholesale_cost) AS cs_wc, sum(cs_sales_price) AS cs_sp
  FROM catalog_sales
       LEFT JOIN catalog_returns ON cr_order_number = cs_order_number
                                AND cs_item_sk = cr_item_sk
       JOIN date_dim ON cs_sold_date_sk = d_date_sk
  WHERE cr_order_number IS NULL
  GROUP BY d_year, cs_item_sk, cs_bill_customer_sk),
ss AS (
  SELECT d_year AS ss_sold_year, ss_item_sk, ss_customer_sk,
         CAST(sum(CAST(ss_quantity AS BIGINT)) AS BIGINT) AS ss_qty,
         sum(ss_wholesale_cost) AS ss_wc, sum(ss_sales_price) AS ss_sp
  FROM store_sales
       LEFT JOIN store_returns ON sr_ticket_number = ss_ticket_number
                              AND ss_item_sk = sr_item_sk
       JOIN date_dim ON ss_sold_date_sk = d_date_sk
  WHERE sr_ticket_number IS NULL
  GROUP BY d_year, ss_item_sk, ss_customer_sk)
SELECT ss_sold_year, ss_item_sk, ss_customer_sk,
       CAST(ss_qty AS DOUBLE) / (coalesce(ws_qty, 0) + coalesce(cs_qty, 0)) AS ratio,
       ss_qty AS store_qty, CAST(ss_wc AS DOUBLE) AS store_wholesale_cost,
       CAST(ss_sp AS DOUBLE) AS store_sales_price,
       CAST(coalesce(ws_qty, 0) + coalesce(cs_qty, 0) AS BIGINT) AS other_chan_qty,
       CAST(coalesce(ws_wc, 0) + coalesce(cs_wc, 0) AS DOUBLE) AS other_chan_wholesale_cost,
       CAST(coalesce(ws_sp, 0) + coalesce(cs_sp, 0) AS DOUBLE) AS other_chan_sales_price
FROM ss
     LEFT JOIN ws ON ws_sold_year = ss_sold_year AND ws_item_sk = ss_item_sk
                 AND ws_customer_sk = ss_customer_sk
     LEFT JOIN cs ON cs_sold_year = ss_sold_year AND cs_item_sk = ss_item_sk
                 AND cs_customer_sk = ss_customer_sk
WHERE (coalesce(ws_qty, 0) > 0 OR coalesce(cs_qty, 0) > 0) AND ss_sold_year = 2000
ORDER BY ss_sold_year, ss_item_sk, ss_customer_sk
LIMIT 100"""),
    "q72" -> (Seq("catalog_sales", "inventory", "warehouse", "item",
                  "customer_demographics", "household_demographics", "date_dim",
                  "promotion", "catalog_returns") ->
      """
SELECT i_item_desc, w_warehouse_name, d1.d_week_seq AS week_seq,
       CAST(sum(CASE WHEN p_promo_sk IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS no_promo,
       CAST(sum(CASE WHEN p_promo_sk IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS promo,
       count(*) AS total_cnt
FROM catalog_sales
     JOIN date_dim d1 ON cs_sold_date_sk = d1.d_date_sk
     JOIN (SELECT inv_item_sk, inv_quantity_on_hand, inv_warehouse_sk,
                  d2.d_week_seq AS inv_week_seq
           FROM inventory JOIN date_dim d2 ON inv_date_sk = d2.d_date_sk) inv
       ON cs_item_sk = inv_item_sk AND d1.d_week_seq = inv_week_seq
     JOIN warehouse ON w_warehouse_sk = inv_warehouse_sk
     JOIN item ON i_item_sk = cs_item_sk
     JOIN customer_demographics ON cs_bill_cdemo_sk = cd_demo_sk
     JOIN household_demographics ON cs_bill_hdemo_sk = hd_demo_sk
     JOIN date_dim d3 ON cs_ship_date_sk = d3.d_date_sk
     LEFT OUTER JOIN promotion ON cs_promo_sk = p_promo_sk
     LEFT OUTER JOIN catalog_returns ON cr_item_sk = cs_item_sk
                                    AND cr_order_number = cs_order_number
WHERE inv_quantity_on_hand < cs_quantity
  AND d3.d_date > d1.d_date + 5
  AND hd_buy_potential = '>10000'
  AND d1.d_year = 2000
  AND cd_marital_status = 'D'
GROUP BY i_item_desc, w_warehouse_name, d1.d_week_seq
ORDER BY total_cnt DESC, i_item_desc, w_warehouse_name, week_seq
LIMIT 100"""),
    "q14a" -> (Seq("store_sales", "catalog_sales", "web_sales", "item", "date_dim") ->
      """
WITH cross_items AS (
  SELECT i_item_sk AS ss_item_sk
  FROM item,
       (SELECT iss.i_brand_id AS brand_id, iss.i_class_id AS class_id,
               iss.i_category_id AS category_id
        FROM store_sales, item iss, date_dim d1
        WHERE ss_item_sk = iss.i_item_sk AND ss_sold_date_sk = d1.d_date_sk
          AND d1.d_year BETWEEN 1999 AND 2001
        INTERSECT
        SELECT ics.i_brand_id, ics.i_class_id, ics.i_category_id
        FROM catalog_sales, item ics, date_dim d2
        WHERE cs_item_sk = ics.i_item_sk AND cs_sold_date_sk = d2.d_date_sk
          AND d2.d_year BETWEEN 1999 AND 2001
        INTERSECT
        SELECT iws.i_brand_id, iws.i_class_id, iws.i_category_id
        FROM web_sales, item iws, date_dim d3
        WHERE ws_item_sk = iws.i_item_sk AND ws_sold_date_sk = d3.d_date_sk
          AND d3.d_year BETWEEN 1999 AND 2001) x
  WHERE i_brand_id = brand_id AND i_class_id = class_id
    AND i_category_id = category_id),
avg_sales AS (
  SELECT CAST(sum(quantity * list_price) AS DOUBLE) / count(*) AS average_sales
  FROM (SELECT ss_quantity AS quantity, ss_list_price AS list_price
        FROM store_sales, date_dim
        WHERE ss_sold_date_sk = d_date_sk AND d_year BETWEEN 1999 AND 2001
        UNION ALL
        SELECT cs_quantity, cs_list_price
        FROM catalog_sales, date_dim
        WHERE cs_sold_date_sk = d_date_sk AND d_year BETWEEN 1999 AND 2001
        UNION ALL
        SELECT ws_quantity, ws_list_price
        FROM web_sales, date_dim
        WHERE ws_sold_date_sk = d_date_sk AND d_year BETWEEN 1999 AND 2001) x)
SELECT channel, i_brand_id, i_class_id, i_category_id,
       CAST(sum(sales) AS DOUBLE) AS sales,
       CAST(sum(number_sales) AS BIGINT) AS number_sales
FROM (SELECT 'store' AS channel, i_brand_id, i_class_id, i_category_id,
             sum(ss_quantity * ss_list_price) AS sales, count(*) AS number_sales
      FROM store_sales, item, date_dim
      WHERE ss_item_sk IN (SELECT ss_item_sk FROM cross_items)
        AND ss_item_sk = i_item_sk AND ss_sold_date_sk = d_date_sk
        AND d_year = 2001 AND d_moy = 11
      GROUP BY i_brand_id, i_class_id, i_category_id
      HAVING sum(ss_quantity * ss_list_price) > (SELECT average_sales FROM avg_sales)
      UNION ALL
      SELECT 'catalog' AS channel, i_brand_id, i_class_id, i_category_id,
             sum(cs_quantity * cs_list_price) AS sales, count(*) AS number_sales
      FROM catalog_sales, item, date_dim
      WHERE cs_item_sk IN (SELECT ss_item_sk FROM cross_items)
        AND cs_item_sk = i_item_sk AND cs_sold_date_sk = d_date_sk
        AND d_year = 2001 AND d_moy = 11
      GROUP BY i_brand_id, i_class_id, i_category_id
      HAVING sum(cs_quantity * cs_list_price) > (SELECT average_sales FROM avg_sales)
      UNION ALL
      SELECT 'web' AS channel, i_brand_id, i_class_id, i_category_id,
             sum(ws_quantity * ws_list_price) AS sales, count(*) AS number_sales
      FROM web_sales, item, date_dim
      WHERE ws_item_sk IN (SELECT ss_item_sk FROM cross_items)
        AND ws_item_sk = i_item_sk AND ws_sold_date_sk = d_date_sk
        AND d_year = 2001 AND d_moy = 11
      GROUP BY i_brand_id, i_class_id, i_category_id
      HAVING sum(ws_quantity * ws_list_price) > (SELECT average_sales FROM avg_sales)) y
GROUP BY ROLLUP(channel, i_brand_id, i_class_id, i_category_id)
ORDER BY channel NULLS FIRST, i_brand_id NULLS FIRST, i_class_id NULLS FIRST,
         i_category_id NULLS FIRST
LIMIT 100"""),
    "q14b" -> (Seq("store_sales", "catalog_sales", "web_sales", "item", "date_dim") ->
      """
WITH cross_items AS (
  SELECT i_item_sk AS ss_item_sk
  FROM item,
       (SELECT iss.i_brand_id AS brand_id, iss.i_class_id AS class_id,
               iss.i_category_id AS category_id
        FROM store_sales, item iss, date_dim d1
        WHERE ss_item_sk = iss.i_item_sk AND ss_sold_date_sk = d1.d_date_sk
          AND d1.d_year BETWEEN 1999 AND 2001
        INTERSECT
        SELECT ics.i_brand_id, ics.i_class_id, ics.i_category_id
        FROM catalog_sales, item ics, date_dim d2
        WHERE cs_item_sk = ics.i_item_sk AND cs_sold_date_sk = d2.d_date_sk
          AND d2.d_year BETWEEN 1999 AND 2001
        INTERSECT
        SELECT iws.i_brand_id, iws.i_class_id, iws.i_category_id
        FROM web_sales, item iws, date_dim d3
        WHERE ws_item_sk = iws.i_item_sk AND ws_sold_date_sk = d3.d_date_sk
          AND d3.d_year BETWEEN 1999 AND 2001) x
  WHERE i_brand_id = brand_id AND i_class_id = class_id
    AND i_category_id = category_id),
avg_sales AS (
  SELECT CAST(sum(quantity * list_price) AS DOUBLE) / count(*) AS average_sales
  FROM (SELECT ss_quantity AS quantity, ss_list_price AS list_price
        FROM store_sales, date_dim
        WHERE ss_sold_date_sk = d_date_sk AND d_year BETWEEN 1999 AND 2001
        UNION ALL
        SELECT cs_quantity, cs_list_price
        FROM catalog_sales, date_dim
        WHERE cs_sold_date_sk = d_date_sk AND d_year BETWEEN 1999 AND 2001
        UNION ALL
        SELECT ws_quantity, ws_list_price
        FROM web_sales, date_dim
        WHERE ws_sold_date_sk = d_date_sk AND d_year BETWEEN 1999 AND 2001) x)
SELECT this_year.channel AS ty_channel, this_year.i_brand_id AS ty_brand,
       this_year.i_class_id AS ty_class, this_year.i_category_id AS ty_category,
       CAST(this_year.sales AS DOUBLE) AS ty_sales,
       this_year.number_sales AS ty_number_sales,
       last_year.channel AS ly_channel, last_year.i_brand_id AS ly_brand,
       last_year.i_class_id AS ly_class, last_year.i_category_id AS ly_category,
       CAST(last_year.sales AS DOUBLE) AS ly_sales,
       last_year.number_sales AS ly_number_sales
FROM (SELECT 'store' AS channel, i_brand_id, i_class_id, i_category_id,
             sum(ss_quantity * ss_list_price) AS sales, count(*) AS number_sales
      FROM store_sales, item, date_dim
      WHERE ss_item_sk IN (SELECT ss_item_sk FROM cross_items)
        AND ss_item_sk = i_item_sk AND ss_sold_date_sk = d_date_sk
        AND d_week_seq = (SELECT d_week_seq FROM date_dim
                          WHERE d_year = 2001 AND d_moy = 11 AND d_dom = 11)
      GROUP BY i_brand_id, i_class_id, i_category_id
      HAVING sum(ss_quantity * ss_list_price) > (SELECT average_sales FROM avg_sales)) this_year,
     (SELECT 'store' AS channel, i_brand_id, i_class_id, i_category_id,
             sum(ss_quantity * ss_list_price) AS sales, count(*) AS number_sales
      FROM store_sales, item, date_dim
      WHERE ss_item_sk IN (SELECT ss_item_sk FROM cross_items)
        AND ss_item_sk = i_item_sk AND ss_sold_date_sk = d_date_sk
        AND d_week_seq = (SELECT d_week_seq FROM date_dim
                          WHERE d_year = 2000 AND d_moy = 11 AND d_dom = 11)
      GROUP BY i_brand_id, i_class_id, i_category_id
      HAVING sum(ss_quantity * ss_list_price) > (SELECT average_sales FROM avg_sales)) last_year
WHERE this_year.i_brand_id = last_year.i_brand_id
  AND this_year.i_class_id = last_year.i_class_id
  AND this_year.i_category_id = last_year.i_category_id
ORDER BY this_year.channel, this_year.i_brand_id, this_year.i_class_id,
         this_year.i_category_id
LIMIT 100"""),
    "q23a" -> (Seq("store_sales", "catalog_sales", "web_sales", "item", "date_dim",
                   "customer") ->
      """
WITH frequent_ss_items AS (
  SELECT substr(i_item_desc, 1, 30) AS itemdesc, i_item_sk AS item_sk,
         d_year AS soldyear, count(*) AS cnt
  FROM store_sales, date_dim, item
  WHERE ss_sold_date_sk = d_date_sk AND ss_item_sk = i_item_sk
    AND d_year IN (2000, 2001, 2002)
  GROUP BY substr(i_item_desc, 1, 30), i_item_sk, d_year
  HAVING count(*) > 4),
max_store_sales AS (
  SELECT max(csales) AS tpcds_cmax
  FROM (SELECT c_customer_sk, sum(ss_quantity * ss_sales_price) AS csales
        FROM store_sales, customer, date_dim
        WHERE ss_customer_sk = c_customer_sk AND ss_sold_date_sk = d_date_sk
          AND d_year IN (2000, 2001, 2002)
        GROUP BY c_customer_sk) x),
best_ss_customer AS (
  SELECT c_customer_sk, sum(ss_quantity * ss_sales_price) AS ssales
  FROM store_sales, customer
  WHERE ss_customer_sk = c_customer_sk
  GROUP BY c_customer_sk
  HAVING sum(ss_quantity * ss_sales_price) >
         (50 / 100.0) * (SELECT * FROM max_store_sales))
SELECT CAST(sum(sales) AS DOUBLE) AS total_sales
FROM (SELECT cs_quantity * cs_list_price AS sales
      FROM catalog_sales, date_dim
      WHERE d_year = 2000 AND d_moy = 2 AND cs_sold_date_sk = d_date_sk
        AND cs_item_sk IN (SELECT item_sk FROM frequent_ss_items)
        AND cs_bill_customer_sk IN (SELECT c_customer_sk FROM best_ss_customer)
      UNION ALL
      SELECT ws_quantity * ws_list_price AS sales
      FROM web_sales, date_dim
      WHERE d_year = 2000 AND d_moy = 2 AND ws_sold_date_sk = d_date_sk
        AND ws_item_sk IN (SELECT item_sk FROM frequent_ss_items)
        AND ws_bill_customer_sk IN (SELECT c_customer_sk FROM best_ss_customer)) y
LIMIT 100"""),
    "q23b" -> (Seq("store_sales", "catalog_sales", "web_sales", "item", "date_dim",
                   "customer") ->
      """
WITH frequent_ss_items AS (
  SELECT substr(i_item_desc, 1, 30) AS itemdesc, i_item_sk AS item_sk,
         d_year AS soldyear, count(*) AS cnt
  FROM store_sales, date_dim, item
  WHERE ss_sold_date_sk = d_date_sk AND ss_item_sk = i_item_sk
    AND d_year IN (2000, 2001, 2002)
  GROUP BY substr(i_item_desc, 1, 30), i_item_sk, d_year
  HAVING count(*) > 4),
max_store_sales AS (
  SELECT max(csales) AS tpcds_cmax
  FROM (SELECT c_customer_sk, sum(ss_quantity * ss_sales_price) AS csales
        FROM store_sales, customer, date_dim
        WHERE ss_customer_sk = c_customer_sk AND ss_sold_date_sk = d_date_sk
          AND d_year IN (2000, 2001, 2002)
        GROUP BY c_customer_sk) x),
best_ss_customer AS (
  SELECT c_customer_sk, sum(ss_quantity * ss_sales_price) AS ssales
  FROM store_sales, customer
  WHERE ss_customer_sk = c_customer_sk
  GROUP BY c_customer_sk
  HAVING sum(ss_quantity * ss_sales_price) >
         (50 / 100.0) * (SELECT * FROM max_store_sales))
SELECT c_last_name, c_first_name, CAST(sales AS DOUBLE) AS sales
FROM (SELECT c_last_name, c_first_name, sum(cs_quantity * cs_list_price) AS sales
      FROM catalog_sales, customer, date_dim
      WHERE d_year = 2000 AND d_moy = 2 AND cs_sold_date_sk = d_date_sk
        AND cs_item_sk IN (SELECT item_sk FROM frequent_ss_items)
        AND cs_bill_customer_sk IN (SELECT c_customer_sk FROM best_ss_customer)
        AND cs_bill_customer_sk = c_customer_sk
      GROUP BY c_last_name, c_first_name
      UNION ALL
      SELECT c_last_name, c_first_name, sum(ws_quantity * ws_list_price) AS sales
      FROM web_sales, customer, date_dim
      WHERE d_year = 2000 AND d_moy = 2 AND ws_sold_date_sk = d_date_sk
        AND ws_item_sk IN (SELECT item_sk FROM frequent_ss_items)
        AND ws_bill_customer_sk IN (SELECT c_customer_sk FROM best_ss_customer)
        AND ws_bill_customer_sk = c_customer_sk
      GROUP BY c_last_name, c_first_name) y
ORDER BY c_last_name, c_first_name, sales
LIMIT 100"""),
    "q24a" -> (Seq("store_sales", "store_returns", "store", "item", "customer",
                   "customer_address") ->
      """
WITH ssales AS (
  SELECT c_last_name, c_first_name, s_store_name, ca_state, s_state, i_color,
         i_current_price, i_manager_id, i_units, i_size,
         sum(ss_net_paid) AS netpaid
  FROM store_sales, store_returns, store, item, customer, customer_address
  WHERE ss_ticket_number = sr_ticket_number AND ss_item_sk = sr_item_sk
    AND ss_customer_sk = c_customer_sk AND ss_item_sk = i_item_sk
    AND ss_store_sk = s_store_sk AND c_current_addr_sk = ca_address_sk
    AND c_birth_country <> upper(ca_country) AND s_zip = ca_zip
    AND s_market_id = 9
  GROUP BY c_last_name, c_first_name, s_store_name, ca_state, s_state, i_color,
           i_current_price, i_manager_id, i_units, i_size)
SELECT c_last_name, c_first_name, s_store_name,
       CAST(sum(netpaid) AS DOUBLE) AS paid
FROM ssales
WHERE i_color = 'color1'
GROUP BY c_last_name, c_first_name, s_store_name
HAVING sum(netpaid) * 20 * (SELECT count(*) FROM ssales)
       > (SELECT sum(netpaid) FROM ssales)
ORDER BY c_last_name, c_first_name, s_store_name"""),
    "q24b" -> (Seq("store_sales", "store_returns", "store", "item", "customer",
                   "customer_address") ->
      """
WITH ssales AS (
  SELECT c_last_name, c_first_name, s_store_name, ca_state, s_state, i_color,
         i_current_price, i_manager_id, i_units, i_size,
         sum(ss_net_paid) AS netpaid
  FROM store_sales, store_returns, store, item, customer, customer_address
  WHERE ss_ticket_number = sr_ticket_number AND ss_item_sk = sr_item_sk
    AND ss_customer_sk = c_customer_sk AND ss_item_sk = i_item_sk
    AND ss_store_sk = s_store_sk AND c_current_addr_sk = ca_address_sk
    AND c_birth_country <> upper(ca_country) AND s_zip = ca_zip
    AND s_market_id = 9
  GROUP BY c_last_name, c_first_name, s_store_name, ca_state, s_state, i_color,
           i_current_price, i_manager_id, i_units, i_size)
SELECT c_last_name, c_first_name, s_store_name,
       CAST(sum(netpaid) AS DOUBLE) AS paid
FROM ssales
WHERE i_color = 'color7'
GROUP BY c_last_name, c_first_name, s_store_name
HAVING sum(netpaid) * 20 * (SELECT count(*) FROM ssales)
       > (SELECT sum(netpaid) FROM ssales)
ORDER BY c_last_name, c_first_name, s_store_name"""),
    "q64" -> (Seq("catalog_sales", "catalog_returns", "store_sales", "store_returns",
                  "date_dim", "store", "customer", "customer_demographics",
                  "promotion", "household_demographics", "customer_address",
                  "income_band", "item") ->
      """
WITH cs_ui AS (
  SELECT cs_item_sk,
         sum(cs_ext_list_price) AS sale,
         sum(cr_refunded_cash + cr_reversed_charge + cr_store_credit) AS refund
  FROM catalog_sales, catalog_returns
  WHERE cs_item_sk = cr_item_sk AND cs_order_number = cr_order_number
  GROUP BY cs_item_sk
  HAVING sum(cs_ext_list_price) >
         2 * sum(cr_refunded_cash + cr_reversed_charge + cr_store_credit)),
cross_sales AS (
  SELECT i_product_name AS product_name, i_item_sk AS item_sk,
         s_store_name AS store_name, s_zip AS store_zip,
         ad1.ca_street_number AS b_street_number, ad1.ca_street_name AS b_street_name,
         ad1.ca_city AS b_city, ad1.ca_zip AS b_zip,
         ad2.ca_street_number AS c_street_number, ad2.ca_street_name AS c_street_name,
         ad2.ca_city AS c_city, ad2.ca_zip AS c_zip,
         d1.d_year AS syear, d2.d_year AS fsyear, d3.d_year AS s2year,
         count(*) AS cnt,
         sum(ss_wholesale_cost) AS s1, sum(ss_list_price) AS s2,
         sum(ss_coupon_amt) AS s3
  FROM store_sales, store_returns, cs_ui, date_dim d1, date_dim d2, date_dim d3,
       store, customer, customer_demographics cd1, customer_demographics cd2,
       promotion, household_demographics hd1, household_demographics hd2,
       customer_address ad1, customer_address ad2, income_band ib1, income_band ib2,
       item
  WHERE ss_store_sk = s_store_sk AND ss_sold_date_sk = d1.d_date_sk
    AND ss_customer_sk = c_customer_sk AND ss_cdemo_sk = cd1.cd_demo_sk
    AND ss_hdemo_sk = hd1.hd_demo_sk AND ss_addr_sk = ad1.ca_address_sk
    AND ss_item_sk = i_item_sk AND ss_item_sk = sr_item_sk
    AND ss_ticket_number = sr_ticket_number AND ss_item_sk = cs_ui.cs_item_sk
    AND c_current_cdemo_sk = cd2.cd_demo_sk AND c_current_hdemo_sk = hd2.hd_demo_sk
    AND c_current_addr_sk = ad2.ca_address_sk AND c_first_sales_date_sk = d2.d_date_sk
    AND c_first_shipto_date_sk = d3.d_date_sk AND ss_promo_sk = p_promo_sk
    AND hd1.hd_income_band_sk = ib1.ib_income_band_sk
    AND hd2.hd_income_band_sk = ib2.ib_income_band_sk
    AND cd1.cd_marital_status = cd2.cd_marital_status
    AND i_color IN ('color1', 'color3', 'color5', 'color7', 'color9', 'color11')
    AND i_current_price BETWEEN 10 AND 60
    AND i_current_price BETWEEN 11 AND 65
  GROUP BY i_product_name, i_item_sk, s_store_name, s_zip, ad1.ca_street_number,
           ad1.ca_street_name, ad1.ca_city, ad1.ca_zip, ad2.ca_street_number,
           ad2.ca_street_name, ad2.ca_city, ad2.ca_zip, d1.d_year, d2.d_year,
           d3.d_year)
SELECT cs1.product_name, cs1.store_name, cs1.store_zip, cs1.b_street_number,
       cs1.b_street_name, cs1.b_city, cs1.b_zip, cs1.c_street_number,
       cs1.c_street_name, cs1.c_city, cs1.c_zip,
       cs1.syear AS syear1, cs1.cnt AS cnt1,
       CAST(cs1.s1 AS DOUBLE) AS s11, CAST(cs1.s2 AS DOUBLE) AS s21,
       CAST(cs1.s3 AS DOUBLE) AS s31,
       CAST(cs2.s1 AS DOUBLE) AS s12, CAST(cs2.s2 AS DOUBLE) AS s22,
       CAST(cs2.s3 AS DOUBLE) AS s32,
       cs2.syear AS syear2, cs2.cnt AS cnt2
FROM cross_sales cs1, cross_sales cs2
WHERE cs1.item_sk = cs2.item_sk AND cs1.syear = 2000 AND cs2.syear = 2001
  AND cs2.cnt <= cs1.cnt AND cs1.store_name = cs2.store_name
  AND cs1.store_zip = cs2.store_zip
ORDER BY cs1.product_name, cs1.store_name, cnt2, s11, s12""")
  )
}
