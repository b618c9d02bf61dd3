package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar function surface (SURVEY.md §2 group F) — all built-in
  * `org.apache.spark.sql.functions` (codegen'd, no UDFs), one composite
  * query per family, each with a DuckDB oracle twin.
  *
  * The reference interprets exactly two JSON fields and otherwise treats
  * payloads as opaque strings (ref: internal/gh/gh.go:92-125); the full
  * scalar surface is what its downstream ClickHouse SQL provides
  * (ref: README.md:4-6). Dialect traps handled here:
  *  - Spark `floor`/`ceil` return LONG, DuckDB's return DOUBLE → cast SQL side;
  *  - Spark `log` is natural log, DuckDB `log` is log10 → `ln` in SQL;
  *  - natural log last-ulp libm drift → round(.,6) both sides;
  *  - DuckDB casts DOUBLE→BIGINT by rounding, Spark truncates → trunc() in SQL;
  *  - DuckDB lists are 1-based; Spark `element_at` is 1-based too;
  *  - integer-ish outputs normalized to LongType (DuckDB defaults to BIGINT).
  */
object FunctionOps {
  import Tables.dec

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // F1: strings over part names.
    "fn_string" -> ((s, dir) => {
      Tables.part(s, dir)
        .filter(col("p_name").like("%a%"))
        .select(
          col("p_partkey"),
          lower(col("p_name")).as("lo"),
          upper(col("p_brand")).as("up"),
          trim(concat(lit("  "), col("p_type"), lit(" "))).as("trimmed"),
          substring(col("p_name"), 1, 5).as("sub5"),
          concat_ws("-", col("p_brand"), col("p_type")).as("joined"),
          regexp_replace(col("p_name"), " ", "_").as("snake"),
          length(col("p_name")).cast(LongType).as("len"),
          lpad(col("p_partkey").cast(StringType), 8, "0").as("padded"),
          regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"),
          element_at(split(col("p_name"), " "), 1).as("tok1"))
        .orderBy("p_partkey")
    }),

    // F2: date/time over orders (ms-precision timestamps — no ns hazard).
    "fn_datetime" -> ((s, dir) => {
      Tables.orders(s, dir)
        .select(
          col("o_orderkey"),
          to_date(col("o_orderdate")).as("d"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          year(col("o_orderdate")).cast(LongType).as("y"),
          month(col("o_orderdate")).cast(LongType).as("m"),
          dayofmonth(col("o_orderdate")).cast(LongType).as("dom"),
          hour(col("o_orderdate")).cast(LongType).as("h"),
          date_add(to_date(col("o_orderdate")), 7).as("plus7"),
          datediff(to_date(col("o_orderdate")), lit("2024-01-01").cast(DateType))
            .cast(LongType).as("days_since"),
          unix_timestamp(col("o_orderdate")).as("epoch_s"))
        .orderBy("o_orderkey")
    }),

    // F3: math over lineitem.
    "fn_math" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .select(
          col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"),
          abs(col("l_discount") - 0.05).as("abs_d"),
          round(dec(col("l_extendedprice")), 1).cast(DoubleType).as("round1"),
          floor(col("l_quantity")).as("flr"),
          ceil(col("l_quantity")).as("cl"),
          pow(col("l_quantity"), 2).as("sq"),
          sqrt(col("l_extendedprice")).as("rt"),
          round(log(col("l_extendedprice")), 6).as("ln6"),
          greatest(col("l_tax"), col("l_discount")).as("gr"),
          least(col("l_tax"), col("l_discount")).as("ls"),
          pmod(col("l_partkey"), lit(7)).as("pm"))
        // total order: (orderkey, linenumber) is not unique in this data
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    }),

    // F4: conditional / null handling.
    "fn_conditional" -> ((s, dir) => {
      Tables.customer(s, dir)
        .select(
          col("c_custkey"),
          coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("<bldg>")).as("seg"),
          when(col("c_acctbal") < 0, "debt")
            .when(col("c_acctbal") < 5000, "mid")
            .otherwise("rich").as("bucket"),
          nvl(nullif(col("c_nationkey"), lit(0)).cast(LongType), lit(-1L)).as("nation_or"))
        .orderBy("c_custkey")
    }),

    // F5: array higher-order functions over tokenized documents.
    "fn_array" -> ((s, dir) => {
      Tables.documents(s, dir)
        .withColumn("toks", split(col("text"), " "))
        .select(
          col("doc_id"),
          size(col("toks")).cast(LongType).as("n_toks"),
          array_contains(col("toks"), "the").as("has_the"),
          size(filter(col("toks"), t => length(t) > 4)).cast(LongType).as("n_long"),
          aggregate(col("toks"), lit(0L), (acc, t) => acc + length(t).cast(LongType))
            .as("sum_len"),
          element_at(sort_array(col("toks")), 1).as("tok_min"),
          aggregate(
            zip_with(transform(col("toks"), t => length(t).cast(LongType)),
                     transform(col("toks"), t => length(t).cast(LongType)),
                     (a, b) => a * b),
            lit(0L), (acc, x) => acc + x).as("sum_len_sq"))
        .orderBy("doc_id")
    }),

    // F5b: the rest of the array higher-order family — exists / forall
    // short-circuit predicates, flatten, sequence generation, sorted
    // distinct. All codegen'd built-ins; DuckDB phrases exists/forall as
    // list_filter cardinalities (two formulations, same semantics), and
    // distinct is sorted on both sides because DuckDB's list_distinct
    // does not preserve encounter order.
    "fn_array_hof" -> ((s, dir) => {
      Tables.documents(s, dir)
        .withColumn("toks", split(col("text"), " "))
        .select(col("doc_id"),
          exists(col("toks"), t => length(t) > 6).as("has_long"),
          forall(col("toks"), t => length(t) > 0).as("all_nonempty"),
          size(flatten(array(slice(col("toks"), lit(1), lit(2)),
            slice(col("toks"), lit(3), lit(2))))).cast(LongType).as("flat4"),
          size(sequence(lit(1), size(col("toks")))).cast(LongType).as("seq_n"),
          array_join(array_sort(array_distinct(slice(col("toks"), lit(1), lit(4)))),
            "|").as("first_uniq"))
        .orderBy("doc_id")
    }),

    // F6: map construction + access (testdata has no map column — built
    // in-query from event fields, FIXTURES.md).
    "fn_map" -> ((s, dir) => {
      Tables.events(s, dir)
        .withColumn("m", map(lit("type"), col("event_type"), lit("uid"), col("user_id").cast(StringType)))
        .select(
          col("event_id"),
          element_at(col("m"), "type").as("m_type"),
          element_at(col("m"), "uid").as("m_uid"),
          concat_ws(",", map_keys(col("m"))).as("keys"),
          concat_ws(",", map_values(col("m"))).as("vals"),
          size(col("m")).cast(LongType).as("m_size"))
        .orderBy("event_id")
    }),

    // F7: JSON — the heart of the raw-archive model (ref: internal/gh/gh.go:92-125).
    // ONE from_json pass feeds every typed projection (parsing the document is
    // the dominant cost; r1 parsed it three times and the json_tuple Generator
    // additionally broke whole-stage codegen — 18.4 s of a 95 s bench). A single
    // get_json_object remains to cover the path-extraction API surface.
    "fn_json" -> ((s, dir) => {
      Tables.events(s, dir)
        .withColumn("j", from_json(col("props"), StructType(Seq(StructField("k", LongType)))))
        .select(
          col("event_id"),
          col("j").getField("k").as("k"),
          get_json_object(col("props"), "$.k").as("k_str"),
          col("j").getField("k").as("k_typed"),
          to_json(struct(col("event_id").as("id"))).as("packed"))
        .orderBy("event_id")
    }),

    // F1b: URL functions — the GH archive is full of API/html URLs, and
    // "group by repo extracted from url" is a staple query. URLs are
    // synthesized deterministically from event fields, then decomposed with
    // parse_url (protocol/host/path/query-param). The DuckDB twin builds
    // the identical string and decomposes with anchored regexes — same
    // output on every well-formed URL by construction.
    "fn_url" -> ((s, dir) => {
      Tables.events(s, dir)
        .withColumn("url", concat(
          lit("https://api.github.com/repos/org"), col("user_id"),
          lit("/repo"), col("event_id") % 100,
          lit("/issues?page="), col("event_id") % 50,
          lit("&state="), col("event_type")))
        .select(
          col("event_id"), col("url"),
          parse_url(col("url"), lit("PROTOCOL")).as("proto"),
          parse_url(col("url"), lit("HOST")).as("host"),
          parse_url(col("url"), lit("PATH")).as("path"),
          parse_url(col("url"), lit("QUERY"), lit("page")).as("page"),
          parse_url(col("url"), lit("QUERY"), lit("state")).as("state"))
        .orderBy("event_id")
    }),

    // Struct surface — nested records as first-class values: build, access
    // through dotted paths, and serialize to JSON. This is the typed face
    // of the raw-JSON archive model (B1's projection in reverse): at scale
    // structs cost nothing extra — Tungsten stores them unboxed and
    // Catalyst prunes unaccessed fields out of the scan.
    "fn_struct" -> ((s, dir) => {
      Tables.orders(s, dir)
        .withColumn("o", struct(
          col("o_orderkey").as("key"),
          col("o_orderstatus").as("status"),
          struct(col("o_orderpriority").as("prio")).as("meta")))
        .select(col("o_orderkey"),
          col("o.status").as("status"),
          col("o.meta.prio").as("prio"),
          to_json(col("o")).as("packed"))
        .orderBy("o_orderkey")
    }),

    // Hash / binary-encoding surface — content addressing is how both the
    // archive (idempotent event keys) and the corpus pipeline (document
    // fingerprints, multimodal SHA-256 ids) name immutable payloads. All
    // map-only codegen'd built-ins; DuckDB computes the same standard
    // digests independently, so the oracle cross-checks two
    // implementations of MD5/SHA-256/hex/base64 rather than one formula.
    "fn_hash" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(
          col("doc_id"),
          md5(col("text").cast(BinaryType)).as("md5_hex"),
          sha2(col("text").cast(BinaryType), 256).as("sha256_hex"),
          hex(col("text").cast(BinaryType)).as("hexed"),
          // Spark's base64 is the RFC 2045 MIME codec (a CRLF every 76
          // chars); strip the chunking to emit the canonical RFC 4648 form
          // every other engine (incl. the DuckDB twin) produces
          regexp_replace(base64(col("text").cast(BinaryType)),
            "\r\n", "").as("b64"),
          // decode(unbase64(base64(x))) == x: the round-trip law, checked
          // per row rather than asserted in prose
          (decode(unbase64(base64(col("text").cast(BinaryType))), "UTF-8")
            === col("text")).as("b64_roundtrip"),
          length(unhex(hex(col("text").cast(BinaryType))))
            .cast(LongType).as("n_bytes"))
        .orderBy("doc_id")
    }),

    // Regex surface beyond the single-extract in F1: extract-ALL (array),
    // match-count, boolean match, and a grouped replace. Patterns stay in
    // the RE2-compatible subset (no backrefs/lookaround) so Spark's
    // java.util.regex and DuckDB's RE2 scan identically — the same
    // discipline text_pii_redact established. All map-only codegen'd ops.
    "fn_regex" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(
          col("doc_id"),
          regexp_extract(col("text"), "^([a-z]+)", 1).as("first_word"),
          col("text").rlike("scan").as("has_scan"),
          size(regexp_extract_all(col("text"), lit("[a-z]+e\\b"), lit(0)))
            .cast(LongType).as("n_e_words"),
          array_join(slice(regexp_extract_all(col("text"), lit("[a-z]+e\\b"), lit(0)),
            1, 3), ",").as("e_sample"),
          regexp_replace(col("text"), "(table|scan)", "<$1>").as("tagged"))
        .orderBy("doc_id")
    }),

    // ANSI-safe error handling — the raw-archive reality: some fraction of
    // every 100 TB is junk, and a pipeline that throws on the first bad
    // cell never finishes. try_cast / try_divide / try_to_timestamp return
    // null instead of failing the task (the row-level complement of B3's
    // file-level FAILFAST/PERMISSIVE choice). Junk is synthesized
    // deterministically so both engines see identical inputs.
    "fn_try" -> ((s, dir) => {
      Tables.events(s, dir)
        .withColumn("raw_num",
          when(col("event_id") % 3 === 0, lit("not_a_number"))
            .otherwise(col("event_id").cast(StringType)))
        .withColumn("raw_date",
          when(col("event_id") % 2 === 0, lit("2024-01-15"))
            .otherwise(lit("junk")))
        .select(
          col("event_id"),
          expr("try_cast(raw_num AS BIGINT)").as("parsed_num"),
          try_divide(col("value"), (col("event_id") % 5).cast(DoubleType))
            .as("safe_div"),
          expr("try_cast(raw_date AS DATE)").as("parsed_date"))
        .orderBy("event_id")
    }),

    // Spark 4 VariantType — the modern half-structured path: parse once
    // into the binary variant encoding, extract typed fields without
    // re-parsing text per access (the engine-native successor to
    // get_json_object over a string column). Outputs are extracted
    // scalars, so the parquet the driver compares stays plain-typed.
    "fn_variant" -> ((s, dir) => {
      Tables.events(s, dir)
        .withColumn("v", parse_json(col("props")))
        .select(
          col("event_id"),
          variant_get(col("v"), "$.k", "bigint").as("k_long"),
          variant_get(col("v"), "$.k", "string").as("k_str"),
          variant_get(col("v"), "$.missing", "bigint").as("absent"),
          to_json(col("v")).as("normalized"))
        .orderBy("event_id")
    }),

    // F1c: the second string tier — field splitting (split_part is THE
    // log-column extractor), character translation, repetition, reversal.
    // All codegen'd built-ins with exact DuckDB twins.
    "fn_string_extra" -> ((s, dir) => {
      Tables.part(s, dir)
        .select(col("p_partkey"),
          split_part(col("p_type"), lit(" "), lit(2)).as("type_mid"),
          translate(col("p_brand"), "#", "-").as("brand_dash"),
          repeat(lit("*"), pmod(col("p_partkey"), lit(5)).cast(IntegerType) + 1)
            .as("stars"),
          reverse(col("p_name")).as("rev_name"))
        .orderBy("p_partkey")
    }),

    // IPv4 arithmetic (ClickHouse IPv4NumToString / IPv4StringToNum /
    // CIDR-match analogs) — API/access logs carry addresses and "group by
    // /24, match a subnet" is the classic security slice. No engine inet
    // type needed: an IPv4 is a 32-bit int, rendering is three shifts and
    // a concat, the subnet test is integer masking — identical portable
    // arithmetic on both engines, synthesized deterministically here.
    "fn_ip" -> ((s, dir) => {
      val ip = Tables.splitHash(col("event_id"), 1L << 32)
      val oct = (k: Int) => pmod(shiftright(ip, k * 8), lit(256L))
      val ipStr = concat_ws(".",
        oct(3).cast(StringType), oct(2).cast(StringType),
        oct(1).cast(StringType), oct(0).cast(StringType))
      // /24 network and membership in 10.0.0.0/8
      Tables.events(s, dir)
        .select(col("event_id"),
          ip.as("ip_num"),
          ipStr.as("ip_str"),
          (ip - pmod(ip, lit(256L))).as("net24"),
          (oct(3) === 10L).as("in_10_slash_8"))
        .orderBy("event_id")
    }),

    // C-style formatting — report/export rendering (zero-pad, hex,
    // thousands grouping). Integer and string conversions only: %f is
    // deliberately absent because Java's formatter rounds ties half-UP
    // while C (and DuckDB's fmt) rounds half-EVEN — the one conversion
    // whose output is not engine-portable.
    "fn_printf" -> ((s, dir) => {
      Tables.events(s, dir)
        .select(col("event_id"),
          format_string("user-%05d", col("user_id")).as("padded"),
          format_string("%s@%x", col("event_type"), col("event_id"))
            .as("typed_hex"),
          format_string("%,d", col("event_id") * 1000).as("grouped"))
        .orderBy("event_id")
    }),

    // F8: casts across numeric/string/timestamp.
    "fn_cast" -> ((s, dir) => {
      Tables.orders(s, dir)
        .select(
          col("o_orderkey"),
          col("o_orderkey").cast(StringType).as("key_str"),
          col("o_orderkey").cast(StringType).cast(LongType).as("key_rt"),
          col("o_totalprice").cast(LongType).as("price_trunc"),
          dec(col("o_totalprice")).cast(StringType).as("price_dec_str"),
          col("o_orderdate").cast(DateType).as("as_date"),
          col("o_orderdate").cast(DateType).cast(StringType).as("date_str"),
          lit("3.5").cast(DoubleType).as("parsed"))
        .orderBy("o_orderkey")
    }))

  def oracle: Map[String, String] = Map(
    "fn_string" ->
      """SELECT p_partkey,
        |       lower(p_name) AS lo,
        |       upper(p_brand) AS up,
        |       trim(concat('  ', p_type, ' ')) AS trimmed,
        |       substring(p_name, 1, 5) AS sub5,
        |       concat_ws('-', p_brand, p_type) AS joined,
        |       regexp_replace(p_name, ' ', '_', 'g') AS snake,
        |       CAST(length(p_name) AS BIGINT) AS len,
        |       lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded,
        |       regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
        |       string_split(p_name, ' ')[1] AS tok1
        |FROM part WHERE p_name LIKE '%a%'
        |ORDER BY p_partkey""".stripMargin,
    "fn_datetime" ->
      """SELECT o_orderkey,
        |       CAST(o_orderdate AS DATE) AS d,
        |       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        |       CAST(year(o_orderdate) AS BIGINT) AS y,
        |       CAST(month(o_orderdate) AS BIGINT) AS m,
        |       CAST(day(o_orderdate) AS BIGINT) AS dom,
        |       CAST(hour(o_orderdate) AS BIGINT) AS h,
        |       CAST(o_orderdate AS DATE) + 7 AS plus7,
        |       date_diff('day', DATE '2024-01-01', CAST(o_orderdate AS DATE)) AS days_since,
        |       CAST(trunc(epoch(o_orderdate)) AS BIGINT) AS epoch_s
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "fn_math" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |       abs(l_discount - 0.05) AS abs_d,
        |       CAST(round(CAST(l_extendedprice AS DECIMAL(18,2)), 1) AS DOUBLE) AS round1,
        |       CAST(floor(l_quantity) AS BIGINT) AS flr,
        |       CAST(ceil(l_quantity) AS BIGINT) AS cl,
        |       pow(l_quantity, 2) AS sq,
        |       sqrt(l_extendedprice) AS rt,
        |       round(ln(l_extendedprice), 6) AS ln6,
        |       greatest(l_tax, l_discount) AS gr,
        |       least(l_tax, l_discount) AS ls,
        |       l_partkey % 7 AS pm
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin,
    "fn_conditional" ->
      """SELECT c_custkey,
        |       COALESCE(NULLIF(c_mktsegment, 'BUILDING'), '<bldg>') AS seg,
        |       CASE WHEN c_acctbal < 0 THEN 'debt'
        |            WHEN c_acctbal < 5000 THEN 'mid'
        |            ELSE 'rich' END AS bucket,
        |       COALESCE(CAST(NULLIF(c_nationkey, 0) AS BIGINT), -1) AS nation_or
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "fn_array" ->
      """SELECT doc_id,
        |       CAST(len(toks) AS BIGINT) AS n_toks,
        |       list_contains(toks, 'the') AS has_the,
        |       CAST(len(list_filter(toks, t -> length(t) > 4)) AS BIGINT) AS n_long,
        |       CAST(list_sum(list_transform(toks, t -> length(t))) AS BIGINT) AS sum_len,
        |       list_sort(toks)[1] AS tok_min,
        |       CAST(list_sum(list_transform(toks, t -> length(t) * length(t))) AS BIGINT) AS sum_len_sq
        |FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "fn_array_hof" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents)
        |SELECT doc_id,
        |       len(list_filter(tk, t -> length(t) > 6)) > 0 AS has_long,
        |       len(list_filter(tk, t -> NOT (length(t) > 0))) = 0 AS all_nonempty,
        |       CAST(len(flatten([tk[1:2], tk[3:4]])) AS BIGINT) AS flat4,
        |       CAST(len(generate_series(1, len(tk))) AS BIGINT) AS seq_n,
        |       array_to_string(list_sort(list_distinct(tk[1:4])), '|') AS first_uniq
        |FROM t ORDER BY doc_id""".stripMargin,
    "fn_map" ->
      """SELECT event_id,
        |       event_type AS m_type,
        |       CAST(user_id AS VARCHAR) AS m_uid,
        |       'type,uid' AS keys,
        |       concat_ws(',', event_type, CAST(user_id AS VARCHAR)) AS vals,
        |       CAST(2 AS BIGINT) AS m_size
        |FROM events ORDER BY event_id""".stripMargin,
    "fn_json" ->
      """SELECT event_id,
        |       CAST(props->>'$.k' AS BIGINT) AS k,
        |       props->>'$.k' AS k_str,
        |       CAST(props->>'$.k' AS BIGINT) AS k_typed,
        |       concat('{"id":', CAST(event_id AS VARCHAR), '}') AS packed
        |FROM events ORDER BY event_id""".stripMargin,
    "fn_cast" ->
      """SELECT o_orderkey,
        |       CAST(o_orderkey AS VARCHAR) AS key_str,
        |       CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS key_rt,
        |       CAST(trunc(o_totalprice) AS BIGINT) AS price_trunc,
        |       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS price_dec_str,
        |       CAST(o_orderdate AS DATE) AS as_date,
        |       CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS date_str,
        |       CAST('3.5' AS DOUBLE) AS parsed
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "fn_string_extra" ->
      """SELECT p_partkey,
        |       split_part(p_type, ' ', 2) AS type_mid,
        |       translate(p_brand, '#', '-') AS brand_dash,
        |       repeat('*', p_partkey % 5 + 1) AS stars,
        |       reverse(p_name) AS rev_name
        |FROM part ORDER BY p_partkey""".stripMargin,
    "fn_ip" ->
      """WITH x AS (
        |  SELECT event_id,
        |         ((event_id % 2147483648) * 2654435761) % 4294967296 AS ip
        |  FROM events)
        |SELECT event_id,
        |       ip AS ip_num,
        |       concat_ws('.', CAST((ip // 16777216) % 256 AS VARCHAR),
        |                      CAST((ip // 65536) % 256 AS VARCHAR),
        |                      CAST((ip // 256) % 256 AS VARCHAR),
        |                      CAST(ip % 256 AS VARCHAR)) AS ip_str,
        |       ip - (ip % 256) AS net24,
        |       (ip // 16777216) % 256 = 10 AS in_10_slash_8
        |FROM x ORDER BY event_id""".stripMargin,
    "fn_printf" ->
      """SELECT event_id,
        |       printf('user-%05d', user_id) AS padded,
        |       printf('%s@%x', event_type, event_id) AS typed_hex,
        |       printf('%,d', event_id * 1000) AS grouped
        |FROM events ORDER BY event_id""".stripMargin,
    "fn_try" ->
      """WITH x AS (
        |  SELECT event_id, value,
        |         CASE WHEN event_id % 3 = 0 THEN 'not_a_number'
        |              ELSE CAST(event_id AS VARCHAR) END AS raw_num,
        |         CASE WHEN event_id % 2 = 0 THEN '2024-01-15'
        |              ELSE 'junk' END AS raw_date
        |  FROM events)
        |SELECT event_id,
        |       TRY_CAST(raw_num AS BIGINT) AS parsed_num,
        |       value / NULLIF(CAST(event_id % 5 AS DOUBLE), 0) AS safe_div,
        |       TRY_CAST(raw_date AS DATE) AS parsed_date
        |FROM x ORDER BY event_id""".stripMargin,
    // FIXTURE CONTRACT: `normalized` hardcodes the props schema
    // '{"k":"BIGINT"}' because the events fixture's props column is exactly
    // the one-key object {"k": N} (TESTDATA.md); the Spark side emits
    // to_json of the full parsed variant, so these only agree while that
    // holds. If the fixture ever grows keys, extract the same single field
    // on both sides instead.
    "fn_variant" ->
      """SELECT event_id,
        |       CAST(props->>'$.k' AS BIGINT) AS k_long,
        |       props->>'$.k' AS k_str,
        |       CAST(props->>'$.missing' AS BIGINT) AS absent,
        |       to_json(from_json(props::JSON, '{"k":"BIGINT"}'))::VARCHAR AS normalized
        |FROM events ORDER BY event_id""".stripMargin,
    "fn_regex" ->
      """SELECT doc_id,
        |       regexp_extract(text, '^([a-z]+)', 1) AS first_word,
        |       regexp_matches(text, 'scan') AS has_scan,
        |       CAST(len(regexp_extract_all(text, '[a-z]+e\b')) AS BIGINT) AS n_e_words,
        |       COALESCE(array_to_string(regexp_extract_all(text, '[a-z]+e\b')[1:3], ','), '')
        |         AS e_sample,
        |       regexp_replace(text, '(table|scan)', '<\1>', 'g') AS tagged
        |FROM documents ORDER BY doc_id""".stripMargin,
    "fn_struct" ->
      """SELECT o_orderkey,
        |       o_orderstatus AS status,
        |       o_orderpriority AS prio,
        |       to_json(struct_pack(key := o_orderkey,
        |                           status := o_orderstatus,
        |                           meta := struct_pack(prio := o_orderpriority)))::VARCHAR
        |         AS packed
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "fn_hash" ->
      """SELECT doc_id,
        |       md5(text) AS md5_hex,
        |       sha256(text) AS sha256_hex,
        |       hex(text) AS hexed,
        |       to_base64(encode(text)) AS b64,
        |       decode(from_base64(to_base64(encode(text)))) = text AS b64_roundtrip,
        |       CAST(octet_length(unhex(hex(text))) AS BIGINT) AS n_bytes
        |FROM documents ORDER BY doc_id""".stripMargin,
    "fn_url" ->
      """WITH u AS (
        |  SELECT event_id,
        |         concat('https://api.github.com/repos/org', CAST(user_id AS VARCHAR),
        |                '/repo', CAST(event_id % 100 AS VARCHAR),
        |                '/issues?page=', CAST(event_id % 50 AS VARCHAR),
        |                '&state=', event_type) AS url
        |  FROM events)
        |SELECT event_id, url,
        |       regexp_extract(url, '^([a-z]+)://', 1) AS proto,
        |       regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
        |       regexp_extract(url, '^[a-z]+://[^/]+([^?]*)', 1) AS path,
        |       regexp_extract(url, '[?&]page=([^&]*)', 1) AS page,
        |       regexp_extract(url, '[?&]state=([^&]*)', 1) AS state
        |FROM u ORDER BY event_id""".stripMargin)
}
