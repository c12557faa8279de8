package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Det._
import Tables._

/** Scalar function families (SURVEY.md §2.8): string, date, math, array
  * (higher-order functions), JSON extraction, map build/flatten.
  *
  * Everything here is a built-in `org.apache.spark.sql.functions` expression
  * — whole-stage-codegen'd, no UDF serialization cost, and Catalyst can push
  * or fold them. Cross-engine pitfalls handled: Spark int-typed results are
  * matched by explicit CASTs on the DuckDB side (length/year/… are BIGINT
  * there), `dayofweek` numbering is normalized to ISO, floats fold in a
  * fixed left-to-right order on both engines.
  */
object ScalarFns {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "fn_string" -> ((s, d) =>
      part(s, d)
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("uname"),
          lower(col("p_brand")).as("lbrand"),
          length(col("p_name")).as("name_len"),
          substring(col("p_name"), 1, 5).as("prefix5"),
          concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"),
          regexp_replace(col("p_name"), " ", "_").as("snake"),
          size(split(col("p_name"), " ")).as("n_words"))
        .orderBy("p_partkey")),

    "fn_date" -> ((s, d) =>
      orders(s, d)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mth"),
          (((dayofweek(col("o_orderdate")) + 5) % 7) + 1).as("isodow"),
          date_trunc("month", col("o_orderdate")).cast(TimestampNTZType).as("month_start"),
          datediff(col("o_orderdate"), lit("1995-01-01").cast(DateType)).as("days_since"))
        .orderBy("o_orderkey")),

    "fn_math" -> ((s, d) =>
      part(s, d)
        .select(
          col("p_partkey"),
          abs(col("p_size") - 25).as("abs_sz"),
          ceil(col("p_retailprice")).as("ceil_price"),
          floor(col("p_retailprice")).as("floor_price"),
          round(dec(col("p_retailprice"), 12, 2) * dec(lit(1.1), 3, 1), 1)
            .cast(DoubleType).as("round_up"),
          sqrt(col("p_retailprice")).as("sqrt_price"),
          pmod(col("p_partkey"), lit(7)).as("key_mod7"),
          (col("p_size").cast(LongType) * col("p_size").cast(LongType)).as("size_sq"))
        .orderBy("p_partkey")),

    "fn_array" -> ((s, d) =>
      embeddings(s, d)
        .select(
          col("vec_id"),
          size(col("embedding")).as("dim"),
          element_at(col("embedding"), 1).as("first_c"),
          element_at(col("embedding"), 64).as("last_c"),
          // Fixed left-to-right fold in DOUBLE: deterministic on both engines.
          expr("aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), " +
               "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)").as("norm_sq"))
        .orderBy("vec_id")),

    "fn_json_extract" -> ((s, d) =>
      events(s, d)
        .select((get_json_object(col("props"), "$.k").cast(LongType) % 10).as("k_bucket"))
        .groupBy("k_bucket")
        .agg(count(lit(1)).as("n"))
        .orderBy("k_bucket")),

    "fn_datetime_arith" -> ((s, d) =>
      orders(s, d)
        .select(col("o_orderkey"),
          date_add(col("o_orderdate").cast(DateType), 30).as("plus_30d"),
          add_months(col("o_orderdate").cast(DateType), 1).as("next_month"),
          last_day(col("o_orderdate").cast(DateType)).as("month_end"),
          quarter(col("o_orderdate")).as("qtr"))
        .orderBy("o_orderkey")),

    "fn_hash_digest" -> ((s, d) =>
      // Standard digests (unlike xxhash64/murmur3, identical across engines)
      // — the content-addressing primitive for exact dedup at 100 TB, where
      // you shuffle a 32-byte digest instead of the document.
      documents(s, d)
        .select(col("doc_id"),
          md5(col("text")).as("md5_hex"),
          sha2(col("text"), 256).as("sha256_hex"),
          length(col("text")).as("n_len"))
        .orderBy("doc_id")),

    "fn_bitwise" -> ((s, d) =>
      part(s, d)
        .select(col("p_partkey"),
          col("p_partkey").bitwiseAND(255L).as("and_lo"),
          col("p_partkey").bitwiseOR(4096L).as("or_hi"),
          col("p_partkey").bitwiseXOR(col("p_size").cast(LongType)).as("xor_sz"),
          shiftleft(col("p_size"), 2).as("shl"),
          shiftright(col("p_partkey"), 3).as("shr"))
        .orderBy("p_partkey")),

    "fn_conditional" -> ((s, d) =>
      // Null-production + null-handling semantics: nullif creates nulls,
      // coalesce/nvl recover, greatest/least ignore nothing (no nulls here).
      orders(s, d)
        .select(col("o_orderkey"),
          nullif(col("o_orderstatus"), lit("O")).as("status_or_null"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN")).as("status_filled"),
          greatest(col("o_totalprice"), lit(50000.0)).as("floor_50k"),
          least(col("o_totalprice"), lit(200000.0)).as("cap_200k"))
        .orderBy("o_orderkey")),

    "fn_collect_set" -> ((s, d) =>
      // Set semantics per group, made deterministic by sorting before the
      // join (collect_set order is partition-dependent).
      customer(s, d)
        .groupBy("c_nationkey")
        .agg(
          concat_ws(",", array_sort(collect_set(col("c_mktsegment")))).as("segments"),
          size(collect_set(col("c_mktsegment"))).as("n_segments"))
        .orderBy("c_nationkey")),

    "fn_string_agg" -> ((s, d) =>
      // Ordered string aggregation: sort the collected list before joining —
      // collect_list order is partition-dependent, array_sort restores
      // determinism (D1 inside the cell).
      customer(s, d)
        .groupBy("c_nationkey")
        .agg(
          concat_ws(",", slice(array_sort(collect_list(col("c_name"))), 1, 5)).as("first_names"),
          count(lit(1)).as("n"))
        .orderBy("c_nationkey")),

    "fn_map" -> ((s, d) =>
      // Build a per-user map(event_type -> count), then flatten back to rows
      // so the output is oracle-comparable (MapType exercised mid-plan).
      events(s, d)
        .groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("cnt"))
        .groupBy("user_id")
        .agg(map_from_entries(collect_list(struct(col("event_type"), col("cnt")))).as("m"))
        .select(col("user_id"), explode(col("m")).as(Seq("event_type", "cnt")))
        .orderBy("user_id", "event_type"))
,
    // Struct create + field access (round 10 — the §2.8 nested-type demo
    // the family lacked beside arrays and maps): a named struct built
    // mid-plan, fields projected back out so the registered output stays
    // scalar (the driver-harness flat-schema rule). Catalyst collapses
    // CreateNamedStruct(...).field to the field expression, so the struct
    // round-trip costs nothing at any scale.
    "fn_struct" -> ((s, d) =>
      customer(s, d)
        .select(col("c_custkey"),
          struct(col("c_name").as("name"), col("c_nationkey").as("nation"),
            col("c_mktsegment").as("seg")).as("prof"))
        .select(col("c_custkey"),
          col("prof.name").as("prof_name"),
          (col("prof.nation") * 2).as("nation2x"),
          upper(col("prof.seg")).as("seg_upper"))
        .orderBy("c_custkey"))
  )

  val oracles: Map[String, String] = Map(
    "fn_string" ->
      ("SELECT p_partkey, upper(p_name) AS uname, lower(p_brand) AS lbrand, " +
       "CAST(length(p_name) AS INT) AS name_len, substr(p_name, 1, 5) AS prefix5, " +
       "p_brand || ':' || p_type AS brand_type, replace(p_name, ' ', '_') AS snake, " +
       "CAST(len(string_split(p_name, ' ')) AS INT) AS n_words " +
       "FROM part ORDER BY p_partkey"),

    "fn_date" ->
      ("SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS yr, " +
       "CAST(month(o_orderdate) AS INT) AS mth, " +
       "CAST(isodow(o_orderdate) AS INT) AS isodow, " +
       "CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start, " +
       "CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since " +
       "FROM orders ORDER BY o_orderkey"),

    "fn_math" ->
      ("SELECT p_partkey, CAST(abs(p_size - 25) AS INT) AS abs_sz, " +
       "CAST(ceil(p_retailprice) AS BIGINT) AS ceil_price, " +
       "CAST(floor(p_retailprice) AS BIGINT) AS floor_price, " +
       s"${oDbl("round(CAST(p_retailprice AS DECIMAL(12,2)) * CAST(1.1 AS DECIMAL(3,1)), 1)")} AS round_up, " +
       "sqrt(p_retailprice) AS sqrt_price, " +
       "CAST(p_partkey % 7 AS BIGINT) AS key_mod7, " +
       "CAST(p_size AS BIGINT) * CAST(p_size AS BIGINT) AS size_sq " +
       "FROM part ORDER BY p_partkey"),

    "fn_array" ->
      ("SELECT vec_id, CAST(len(embedding) AS INT) AS dim, " +
       "embedding[1] AS first_c, embedding[64] AS last_c, " +
       "list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), " +
       "(acc, x) -> acc + x) AS norm_sq " +
       "FROM embeddings ORDER BY vec_id"),

    "fn_json_extract" ->
      ("SELECT CAST(props->>'k' AS BIGINT) % 10 AS k_bucket, count(*) AS n " +
       "FROM events GROUP BY 1 ORDER BY k_bucket"),

    "fn_map" ->
      ("SELECT user_id, event_type, count(*) AS cnt FROM events " +
       "GROUP BY user_id, event_type ORDER BY user_id, event_type"),

    "fn_datetime_arith" ->
      ("SELECT o_orderkey, " +
       "CAST(o_orderdate AS DATE) + 30 AS plus_30d, " +
       "CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS DATE) AS next_month, " +
       "last_day(CAST(o_orderdate AS DATE)) AS month_end, " +
       "CAST(quarter(o_orderdate) AS INT) AS qtr " +
       "FROM orders ORDER BY o_orderkey"),

    "fn_hash_digest" ->
      ("SELECT doc_id, md5(text) AS md5_hex, sha256(text) AS sha256_hex, " +
       "CAST(length(text) AS INT) AS n_len FROM documents ORDER BY doc_id"),

    "fn_bitwise" ->
      ("SELECT p_partkey, p_partkey & 255 AS and_lo, p_partkey | 4096 AS or_hi, " +
       "xor(p_partkey, CAST(p_size AS BIGINT)) AS xor_sz, " +
       "CAST(p_size AS INT) << 2 AS shl, p_partkey >> 3 AS shr " +
       "FROM part ORDER BY p_partkey"),

    "fn_conditional" ->
      ("SELECT o_orderkey, nullif(o_orderstatus, 'O') AS status_or_null, " +
       "coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_filled, " +
       "greatest(o_totalprice, 50000.0) AS floor_50k, " +
       "least(o_totalprice, 200000.0) AS cap_200k " +
       "FROM orders ORDER BY o_orderkey"),

    "fn_collect_set" ->
      ("SELECT c_nationkey, " +
       "array_to_string(list_sort(list_distinct(list(c_mktsegment))), ',') AS segments, " +
       "CAST(len(list_distinct(list(c_mktsegment))) AS INT) AS n_segments " +
       "FROM customer GROUP BY c_nationkey ORDER BY c_nationkey"),

    "fn_string_agg" ->
      ("SELECT c_nationkey, " +
       "array_to_string(list_sort(list(c_name))[1:5], ',') AS first_names, " +
       "count(*) AS n FROM customer GROUP BY c_nationkey ORDER BY c_nationkey"),

    // struct_pack + field access mirrors struct()/dot-projection
    "fn_struct" ->
      ("SELECT c_custkey, " +
       "(struct_pack(name := c_name, nation := c_nationkey, seg := c_mktsegment)).name AS prof_name, " +
       "(struct_pack(name := c_name, nation := c_nationkey, seg := c_mktsegment)).nation * 2 AS nation2x, " +
       "upper((struct_pack(name := c_name, nation := c_nationkey, seg := c_mktsegment)).seg) AS seg_upper " +
       "FROM customer ORDER BY c_custkey")
  )
}
