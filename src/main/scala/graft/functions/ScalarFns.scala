package graft.functions

import graft.Tables._
import org.apache.spark.sql.functions._

/** Scalar-function bundles (reference analog: i3cols vectorized NumPy
  * expression math, SURVEY.md §2.1 R9). Everything here is a built-in
  * Catalyst expression — whole-stage-codegen'd, pushdown-transparent;
  * no UDFs in these hot paths.
  */
object ScalarFns {

  val queries: Map[String, Q] = Map(
    "fn_string" -> ((s, dir) =>
      part(s, dir)
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("up"),
          substring(col("p_name"), 1, 8).as("pre"),
          concat(col("p_brand"), lit("#"), col("p_type")).as("cat"),
          lpad(col("p_size").cast("string"), 4, "0").as("padded"),
          regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"),
          big(length(col("p_name"))).as("n_chars"),
          big(size(split(col("p_name"), " "))).as("n_words"),
          trim(col("p_type")).as("typ"))
        .orderBy("p_partkey")),

    "fn_datetime" -> ((s, dir) =>
      events(s, dir)
        .select(
          col("event_id"),
          date_trunc("day", col("ts")).as("d"),
          date_trunc("hour", col("ts")).as("h"),
          big(hour(col("ts"))).as("hr"),
          big(dayofmonth(col("ts"))).as("dom"),
          big(datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))).as("days_since"),
          (col("ts") + expr("INTERVAL 90 MINUTES")).as("ts_plus"))
        .orderBy("event_id")),

    "fn_math" -> ((s, dir) =>
      part(s, dir)
        .select(
          col("p_partkey"),
          round(log(col("p_retailprice")), 6).as("ln_p"),
          round(sqrt(col("p_retailprice")), 6).as("sqrt_p"),
          round(pow(col("p_size").cast("double"), 2.0), 1).as("size_sq"),
          r2(abs(col("p_retailprice") - 1000.0)).as("abs_dev"),
          big(col("p_size") % 7).as("size_mod"),
          signum(col("p_retailprice") - 1000.0).cast("int").as("sgn"),
          big(ceil(col("p_retailprice"))).as("ceil_p"),
          big(floor(col("p_retailprice"))).as("floor_p"))
        .orderBy("p_partkey")),

    "fn_json" -> ((s, dir) =>
      events(s, dir)
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"),
          (get_json_object(col("props"), "$.k").cast("long") % 10).as("k_mod"),
          get_json_object(col("props"), "$.missing").as("missing"),
          big(length(col("props"))).as("props_len"))
        .orderBy("event_id")),

    // Higher-order array functions over a packed per-order array — the
    // ragged-column compute surface (no explode, no shuffle after pack).
    "fn_array" -> ((s, dir) =>
      lineitem(s, dir)
        .groupBy("l_orderkey")
        .agg(sort_array(collect_list(col("l_linenumber"))).as("lns"))
        .select(
          col("l_orderkey"),
          big(size(col("lns"))).as("n"),
          array_contains(col("lns"), 1).as("has1"),
          col("lns").getItem(0).as("first_ln"),
          big(aggregate(col("lns"), lit(0L), (acc, x) => acc + x.cast("long"))).as("ln_sum"),
          array_join(transform(col("lns"), x => (x * 2).cast("string")), ",").as("doubled"))
        .orderBy("l_orderkey")),

    // Bitwise bundle: masks, shifts, xor, popcount — the flag-field and
    // bitmap arithmetic every encoded-ID / feature-flag schema needs.
    "fn_bitwise" -> ((s, dir) =>
      part(s, dir)
        .select(
          col("p_partkey"),
          big(col("p_size").bitwiseAND(lit(15))).as("lo4"),
          big(col("p_size").bitwiseOR(lit(64))).as("with_flag"),
          big(col("p_size").bitwiseXOR(col("p_partkey"))).as("xored"),
          big(shiftleft(col("p_size"), 2)).as("shl2"),
          big(shiftright(col("p_size"), 1)).as("shr1"),
          bit_count(col("p_size")).as("popcnt"))
        .orderBy("p_partkey")),

    // Regex bundle: global replace, match-run extraction/counting,
    // boolean match, anchored extract. Patterns are plain character
    // classes + literal alternations, where Java's regex and DuckDB's
    // RE2 agree exactly (lookaround/backrefs would not).
    "fn_regex" -> ((s, dir) =>
      part(s, dir)
        .select(
          col("p_partkey"),
          regexp_replace(col("p_name"), "[aeiou]", "").as("novowel"),
          big(size(regexp_extract_all(col("p_name"), lit("[a-z]+"), lit(0)))).as("n_runs"),
          col("p_name").rlike("red|blue").as("has_color"),
          regexp_extract(col("p_name"), "([a-z]+)$", 1).as("last_word"))
        .orderBy("p_partkey")),

    // Struct surface: build, lexicographic aggregate (argmax/argmin as
    // MAX/MIN over a struct — one aggregate pass, no window, no join),
    // and field projection.
    "fn_struct" -> ((s, dir) =>
      orders(s, dir)
        .groupBy("o_orderstatus")
        .agg(
          max(struct(r2(col("o_totalprice")).as("t"), col("o_orderkey").as("k"))).as("best"),
          min(struct(col("o_orderdate").as("d"), col("o_orderkey").as("k"))).as("first"))
        .select(col("o_orderstatus"),
                col("best.t").as("best_total"), col("best.k").as("best_key"),
                col("first.d").as("first_date"), col("first.k").as("first_key"))
        .orderBy("o_orderstatus")),

    // Map construction + lookup. The projected output is all scalar
    // (lookup result + cardinality), so it IS oracle-checkable even
    // though the intermediate MAP layout is engine-specific.
    "fn_map" -> ((s, dir) =>
      events(s, dir)
        .groupBy("user_id", "event_type").agg(big(count(lit(1))).as("n"))
        .groupBy("user_id")
        .agg(map_from_entries(sort_array(collect_list(struct(col("event_type"), col("n"))))).as("type_counts"))
        .select(col("user_id"),
                element_at(col("type_counts"), "click").as("clicks"),
                big(size(col("type_counts"))).as("n_types"))
        .orderBy("user_id")),

    // Binary encode/decode bundle: base64 and hex transport encodings
    // plus a decode-of-encode roundtrip length — the interchange
    // primitives every payload pipeline (webhooks, blob sidecars,
    // audit logs) leans on. Row-local and codegen'd.
    "fn_encode" -> ((s, dir) =>
      part(s, dir)
        .select(col("p_partkey"),
          base64(col("p_name").cast("binary")).as("b64"),
          hex(col("p_name").cast("binary")).as("hx"),
          length(unbase64(base64(col("p_name").cast("binary"))))
            .cast("long").as("rt_len"),
          length(col("p_name")).cast("long").as("orig_len"))
        .orderBy("p_partkey")),

    // Null-safety bundle: the ANSI-adjacent escape hatches a pipeline
    // leans on when raw data divides by zero or mixes sentinels —
    // try_divide (null, never an exception, even under ANSI mode),
    // nullif/coalesce sentinel handling, least/greatest. All row-local
    // and codegen'd; l_discount is genuinely zero on a fraction of
    // rows, so both branches of every expression are exercised.
    "fn_null_safety" -> ((s, dir) =>
      lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"),
          fround(try_divide(col("l_extendedprice"), col("l_discount")), 2).as("safe_ratio"),
          fround(coalesce(try_divide(col("l_extendedprice"), col("l_discount")), lit(-1.0)), 2)
            .as("filled_ratio"),
          nullif(col("l_linestatus"), lit("O")).as("status_or_null"),
          r2(greatest(col("l_tax"), col("l_discount"))).as("hi_rate"),
          r2(least(col("l_tax"), col("l_discount"))).as("lo_rate"))
        .orderBy("l_orderkey", "l_linenumber")),

    // uint64 / 0.1-ns DAQ-tick fidelity (SURVEY.md §1.2): the
    // reference's event headers carry DAQ times as unsigned 64-bit
    // 0.1-ns tick counts, which exceed signed-long range (epoch-µs ×
    // 10⁴ ≈ 1.75e19 > 2⁶³−1). Spark has no unsigned long, so the
    // declared mapping is DECIMAL(20,0): exact at full uint64 range,
    // exact min/max/difference arithmetic, hash-aggregatable. Output
    // ticks as strings — the one cross-engine type both sides render
    // identically (DuckDB's HUGEINT and Spark's decimal agree on
    // digits, not on parquet physical type).
    "fn_uint64_ticks" -> ((s, dir) =>
      events(s, dir)
        .select(col("event_type"),
          (unix_micros(col("ts")).cast("decimal(20,0)") * lit(10000L)).as("tick"))
        .groupBy("event_type")
        .agg(big(count(lit(1))).as("n"),
             min(col("tick")).cast("string").as("min_tick"),
             max(col("tick")).cast("string").as("max_tick"),
             (max(col("tick")) - min(col("tick"))).cast("string").as("span_ticks"))
        .orderBy("event_type"))
  )

  val oracle: Map[String, String] = Map(
    "fn_string" ->
      ("SELECT p_partkey, UPPER(p_name) AS up, SUBSTR(p_name, 1, 8) AS pre, " +
       "p_brand || '#' || p_type AS cat, LPAD(CAST(p_size AS VARCHAR), 4, '0') AS padded, " +
       "REGEXP_EXTRACT(p_name, '([a-z]+)', 1) AS first_word, " +
       "CAST(LENGTH(p_name) AS BIGINT) AS n_chars, " +
       "CAST(LEN(STRING_SPLIT(p_name, ' ')) AS BIGINT) AS n_words, " +
       "TRIM(p_type) AS typ FROM part ORDER BY p_partkey"),
    "fn_datetime" ->
      ("SELECT event_id, DATE_TRUNC('day', ts) AS d, DATE_TRUNC('hour', ts) AS h, " +
       "CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hr, " +
       "CAST(EXTRACT(day FROM ts) AS BIGINT) AS dom, " +
       "CAST(DATEDIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT) AS days_since, " +
       "ts + INTERVAL 90 MINUTE AS ts_plus FROM events ORDER BY event_id"),
    "fn_math" ->
      ("SELECT p_partkey, ROUND(LN(p_retailprice), 6) AS ln_p, " +
       "ROUND(SQRT(p_retailprice), 6) AS sqrt_p, " +
       "ROUND(POW(CAST(p_size AS DOUBLE), 2.0), 1) AS size_sq, " +
       "ROUND(ABS(p_retailprice - 1000.0), 2) AS abs_dev, " +
       "CAST(p_size % 7 AS BIGINT) AS size_mod, " +
       "CAST(SIGN(p_retailprice - 1000.0) AS INT) AS sgn, " +
       "CAST(CEIL(p_retailprice) AS BIGINT) AS ceil_p, " +
       "CAST(FLOOR(p_retailprice) AS BIGINT) AS floor_p " +
       "FROM part ORDER BY p_partkey"),
    "fn_json" ->
      ("SELECT event_id, CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) AS k, " +
       "CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) % 10 AS k_mod, " +
       "JSON_EXTRACT_STRING(props, '$.missing') AS missing, " +
       "CAST(LENGTH(props) AS BIGINT) AS props_len FROM events ORDER BY event_id"),
    "fn_array" ->
      ("SELECT l_orderkey, CAST(LEN(lns) AS BIGINT) AS n, " +
       "LIST_CONTAINS(lns, 1) AS has1, lns[1] AS first_ln, " +
       "CAST(LIST_SUM(lns) AS BIGINT) AS ln_sum, " +
       "ARRAY_TO_STRING(LIST_TRANSFORM(lns, x -> CAST(x * 2 AS VARCHAR)), ',') AS doubled FROM " +
       "(SELECT l_orderkey, LIST(l_linenumber ORDER BY l_linenumber) AS lns " +
       "FROM lineitem GROUP BY l_orderkey) ORDER BY l_orderkey"),
    "fn_bitwise" ->
      ("SELECT p_partkey, CAST(p_size & 15 AS BIGINT) AS lo4, " +
       "CAST(p_size | 64 AS BIGINT) AS with_flag, " +
       "CAST(XOR(CAST(p_size AS BIGINT), p_partkey) AS BIGINT) AS xored, " +
       "CAST(p_size << 2 AS BIGINT) AS shl2, CAST(p_size >> 1 AS BIGINT) AS shr1, " +
       "CAST(BIT_COUNT(p_size) AS INT) AS popcnt " +
       "FROM part ORDER BY p_partkey"),
    "fn_regex" ->
      ("SELECT p_partkey, REGEXP_REPLACE(p_name, '[aeiou]', '', 'g') AS novowel, " +
       "CAST(LEN(REGEXP_EXTRACT_ALL(p_name, '[a-z]+')) AS BIGINT) AS n_runs, " +
       "REGEXP_MATCHES(p_name, 'red|blue') AS has_color, " +
       "REGEXP_EXTRACT(p_name, '([a-z]+)$', 1) AS last_word " +
       "FROM part ORDER BY p_partkey"),
    "fn_struct" ->
      ("WITH x AS (SELECT o_orderstatus, ROUND(o_totalprice, 2) AS t2, o_orderkey, o_orderdate FROM orders), " +
       "b AS (SELECT o_orderstatus, t2 AS best_total, o_orderkey AS best_key, " +
       "ROW_NUMBER() OVER (PARTITION BY o_orderstatus ORDER BY t2 DESC, o_orderkey DESC) AS rn FROM x), " +
       "f AS (SELECT o_orderstatus, o_orderdate AS first_date, o_orderkey AS first_key, " +
       "ROW_NUMBER() OVER (PARTITION BY o_orderstatus ORDER BY o_orderdate, o_orderkey) AS rn FROM x) " +
       "SELECT b.o_orderstatus, b.best_total, b.best_key, f.first_date, f.first_key " +
       "FROM b JOIN f USING (o_orderstatus) WHERE b.rn = 1 AND f.rn = 1 ORDER BY o_orderstatus"),
    "fn_map" ->
      ("WITH tc AS (SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n " +
       "FROM events GROUP BY user_id, event_type) " +
       "SELECT user_id, MAX(CASE WHEN event_type = 'click' THEN n END) AS clicks, " +
       "CAST(COUNT(*) AS BIGINT) AS n_types FROM tc GROUP BY user_id ORDER BY user_id"),
    "fn_encode" ->
      ("SELECT p_partkey, TO_BASE64(CAST(p_name AS BLOB)) AS b64, " +
       "HEX(CAST(p_name AS BLOB)) AS hx, " +
       "CAST(OCTET_LENGTH(FROM_BASE64(TO_BASE64(CAST(p_name AS BLOB)))) AS BIGINT) AS rt_len, " +
       "CAST(LENGTH(p_name) AS BIGINT) AS orig_len " +
       "FROM part ORDER BY p_partkey"),
    "fn_null_safety" ->
      ("SELECT l_orderkey, l_linenumber, " +
       froundSql("l_extendedprice / NULLIF(l_discount, 0)", 2) + " AS safe_ratio, " +
       froundSql("COALESCE(l_extendedprice / NULLIF(l_discount, 0), -1.0)", 2) + " AS filled_ratio, " +
       "NULLIF(l_linestatus, 'O') AS status_or_null, " +
       "ROUND(GREATEST(l_tax, l_discount), 2) AS hi_rate, " +
       "ROUND(LEAST(l_tax, l_discount), 2) AS lo_rate " +
       "FROM lineitem ORDER BY l_orderkey, l_linenumber"),
    // HUGEINT is DuckDB's exact >64-bit integer — the oracle twin of
    // Spark's DECIMAL(20,0) uint64 mapping; both render ticks as the
    // same digit strings
    "fn_uint64_ticks" ->
      ("WITH t AS (SELECT event_type, CAST(epoch_us(ts) AS HUGEINT) * 10000 AS tick FROM events) " +
       "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, " +
       "CAST(MIN(tick) AS VARCHAR) AS min_tick, " +
       "CAST(MAX(tick) AS VARCHAR) AS max_tick, " +
       "CAST(MAX(tick) - MIN(tick) AS VARCHAR) AS span_ticks " +
       "FROM t GROUP BY event_type ORDER BY event_type")
  )
}
