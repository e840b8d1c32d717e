package graft.queries

import graft.{QueryFamily, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar-function family (SURVEY.md §2.C-8): string / date / math / JSON /
  * array (higher-order) functions. All Spark built-ins — codegen'd, no UDFs
  * — so every expression stays inside WholeStageCodegen and pushes into the
  * scan where it's a plain predicate.
  *
  * Determinism (§7.5):
  *  - dot products computed in DOUBLE with identical left-to-right
  *    accumulation on both engines (DuckDB's list_dot_product accumulates
  *    in FLOAT for float lists — not used);
  *  - round(x, 6) on any derived double;
  *  - regexes limited to constructs with identical Java/RE2 semantics.
  */
object Scalars extends QueryFamily {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_str_basic" -> { (s, d) =>
      Tables.part(s, d)
        .select(col("p_partkey"),
          upper(col("p_name")).as("uname"),
          substring(col("p_brand"), 1, 5).as("brand5"),
          concat_ws("|", col("p_type"), col("p_brand")).as("type_brand"),
          length(col("p_name")).as("name_len"))
        .orderBy("p_partkey")
    },
    "q_str_like" -> { (s, d) =>
      Tables.part(s, d)
        .filter(col("p_type").like("%BRASS%") || col("p_name").like("%ol%"))
        .select("p_partkey", "p_name", "p_type")
        .orderBy("p_partkey")
    },
    "q_str_regexp" -> { (s, d) =>
      Tables.part(s, d)
        .select(col("p_partkey"),
          regexp_extract(col("p_name"), "([a-z]+)$", 1).as("last_word"),
          regexp_replace(col("p_brand"), "[0-9]+", "#").as("brand_masked"))
        .orderBy("p_partkey")
    },
    "q_str_split" -> { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(split(col("text"), " ")).as("n_tokens"),
          element_at(split(col("text"), " "), 1).as("first_token"))
        .orderBy("doc_id")
    },
    "q_str_nfc" -> { (s, d) =>
      // Unicode NFC canonicalization through the native expression
      // (functions/TextExpressions UnicodeNormalize) — decomposed text
      // synthesized from the data: first token + "e"+combining-acute
      // (U+0301, composes to é) + precomposed é (stable under NFC). The
      // length pair witnesses real composition: n_nfc = n_raw - 1.
      // DuckDB-oracled against its nfc_normalize.
      val raw = concat(element_at(split(col("text"), " "), 1),
        lit("é"), lit("é"))
      Tables.documents(s, d)
        .select(col("doc_id"), raw.as("raw"))
        .select(col("doc_id"),
          graft.functions.TextFunctions.unicodeNormalize(col("raw"))
            .as("nfc_text"),
          length(col("raw")).as("n_raw"),
          length(graft.functions.TextFunctions.unicodeNormalize(col("raw")))
            .as("n_nfc"))
        .orderBy("doc_id")
    },
    "q_str_more" -> { (s, d) =>
      Tables.customer(s, d)
        .select(col("c_custkey"),
          lower(col("c_name")).as("lname"),
          initcap(col("c_mktsegment")).as("seg_cap"),
          lpad(col("c_custkey").cast("string"), 8, "0").as("padded"),
          trim(concat(lit("  "), col("c_mktsegment"), lit(" "))).as("trimmed"),
          reverse(col("c_mktsegment")).as("rev"),
          translate(col("c_mktsegment"), "AEIOU", "aeiou").as("translated"),
          instr(col("c_name"), "1").as("pos1"))
        .orderBy("c_custkey")
    },
    "q_date_more" -> { (s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          date_add(col("o_orderdate").cast("date"), 30).as("due"),
          add_months(col("o_orderdate").cast("date"), 2).as("plus2m"),
          last_day(col("o_orderdate")).as("month_end"),
          dayofweek(col("o_orderdate")).as("dow"),
          quarter(col("o_orderdate")).as("q"),
          unix_timestamp(col("o_orderdate")).as("epoch_s"))
        .orderBy("o_orderkey")
    },
    "q_date_format" -> { (s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
          date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("full"))
        .orderBy("o_orderkey")
    },
    "q_cond_expr" -> { (s, d) =>
      // CASE/WHEN, coalesce, nullif, greatest/least — conditional surface.
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          when(col("l_quantity") < 10, "low")
            .when(col("l_quantity") < 40, "mid")
            .otherwise("high").as("qty_band"),
          coalesce(nullif(col("l_returnflag"), lit("N")), lit("none"))
            .as("flag_or_none"),
          greatest(col("l_discount"), col("l_tax")).as("max_rate"),
          least(col("l_discount"), col("l_tax")).as("min_rate"))
        .orderBy("l_orderkey", "l_linenumber")
    },
    "q_date_parts" -> { (s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("dom"),
          date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
          datediff(lit("1998-01-01").cast("date"), col("o_orderdate"))
            .as("days_to_98"))
        .orderBy("o_orderkey")
    },
    "q_date_agg" -> { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(year(col("l_shipdate")).as("ship_year"),
                 month(col("l_shipdate")).as("ship_month"))
        .agg(count(lit(1)).as("n"),
             sum(col("l_quantity").cast("decimal(18,4)"))
               .cast("double").as("sum_qty"))
        .orderBy("ship_year", "ship_month")
    },
    "q_bitwise" -> { (s, d) =>
      // Bit manipulation over integer keys (feature-hash packing, flag
      // fields) — codegen'd built-ins, map-only.
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_partkey").bitwiseAND(col("l_suppkey")).as("k_and"),
          col("l_partkey").bitwiseOR(col("l_suppkey")).as("k_or"),
          col("l_partkey").bitwiseXOR(col("l_suppkey")).as("k_xor"),
          shiftleft(col("l_linenumber"), 3).as("ln_shl"),
          shiftright(col("l_partkey"), 2).as("pk_shr"),
          expr("bit_count(l_partkey)").as("pk_bits"))
        .orderBy("l_orderkey", "l_linenumber")
    },
    "q_math" -> { (s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("l_partkey") % 7).as("pk_mod7"),
          abs(col("l_quantity") - 25).as("qty_dev"),
          ceil(col("l_discount") * 100).as("disc_pct_ceil"),
          floor(col("l_tax") * 100).as("tax_pct_floor"),
          round(pow(col("l_quantity"), 2), 6).as("qty_sq"))
        .orderBy("l_orderkey", "l_linenumber")
    },
    "q_json" -> { (s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").as("k_str"),
          get_json_object(col("props"), "$.k").cast("long").as("k_num"))
        .filter(col("k_num") >= 50)
        .orderBy("event_id")
    },
    "q_arr_basic" -> { (s, d) =>
      // head4 emitted as floor-scaled longs joined to one string: the
      // harness compare can't sort/hash list cells, and float→string
      // formatting differs across engines while floor(x·1e6) of identical
      // IEEE floats can't.
      Tables.embeddings(s, d)
        .select(col("vec_id"),
          size(col("embedding")).as("dim"),
          element_at(col("embedding"), 1).cast("double").as("e1"),
          concat_ws(",", transform(slice(col("embedding"), 1, 4),
            x => floor(x.cast("double") * 1000000).cast("long").cast("string")))
            .as("head4"))
        .orderBy("vec_id")
    },
    "q_arr_dot" -> { (s, d) =>
      // Dot product against a fixed query vector (vec_id=0), in DOUBLE with
      // left-to-right accumulation — bit-identical to the DuckDB oracle's
      // list_sum(list_transform(list_zip(...))) form. This brute-force
      // broadcast-NLJ shape is also the ANN baseline (SURVEY.md §2.C-10).
      val e = Tables.embeddings(s, d)
      val q0 = e.filter(col("vec_id") === 0)
        .select(col("embedding").as("qvec"))
      e.crossJoin(broadcast(q0))
        .select(col("vec_id"),
          round(graft.functions.Vectors.dot(col("embedding"), col("qvec")), 6)
            .as("dot"))
        .orderBy("vec_id")
    }
  )

  def oracle: Map[String, String] = Map(
    "q_str_basic" ->
      """SELECT p_partkey, upper(p_name) AS uname,
        |  substring(p_brand, 1, 5) AS brand5,
        |  concat_ws('|', p_type, p_brand) AS type_brand,
        |  length(p_name) AS name_len
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_str_like" ->
      """SELECT p_partkey, p_name, p_type FROM part
        |WHERE p_type LIKE '%BRASS%' OR p_name LIKE '%ol%'
        |ORDER BY p_partkey""".stripMargin,
    "q_str_regexp" ->
      """SELECT p_partkey,
        |  regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
        |  regexp_replace(p_brand, '[0-9]+', '#', 'g') AS brand_masked
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_str_split" ->
      """SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
        |  string_split(text, ' ')[1] AS first_token
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_str_nfc" ->
      """SELECT doc_id,
        |  nfc_normalize(string_split(text, ' ')[1] || 'e' || chr(769)
        |    || chr(233)) AS nfc_text,
        |  length(string_split(text, ' ')[1] || 'e' || chr(769) || chr(233))
        |    AS n_raw,
        |  length(nfc_normalize(string_split(text, ' ')[1] || 'e' || chr(769)
        |    || chr(233))) AS n_nfc
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_str_more" ->
      """SELECT c_custkey, lower(c_name) AS lname,
        |  upper(substr(c_mktsegment, 1, 1)) || lower(substr(c_mktsegment, 2))
        |    AS seg_cap,
        |  lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
        |  trim('  ' || c_mktsegment || ' ') AS trimmed,
        |  reverse(c_mktsegment) AS rev,
        |  translate(c_mktsegment, 'AEIOU', 'aeiou') AS translated,
        |  instr(c_name, '1') AS pos1
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_date_more" ->
      """SELECT o_orderkey,
        |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS due,
        |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE) AS plus2m,
        |  last_day(o_orderdate) AS month_end,
        |  dayofweek(o_orderdate) + 1 AS dow,
        |  quarter(o_orderdate) AS q,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_date_format" ->
      """SELECT o_orderkey,
        |  strftime(o_orderdate, '%Y-%m') AS ym,
        |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS "full"
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_cond_expr" ->
      """SELECT l_orderkey, l_linenumber,
        |  CASE WHEN l_quantity < 10 THEN 'low'
        |       WHEN l_quantity < 40 THEN 'mid' ELSE 'high' END AS qty_band,
        |  coalesce(nullif(l_returnflag, 'N'), 'none') AS flag_or_none,
        |  greatest(l_discount, l_tax) AS max_rate,
        |  least(l_discount, l_tax) AS min_rate
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_date_parts" ->
      """SELECT o_orderkey,
        |  year(o_orderdate) AS y, month(o_orderdate) AS m,
        |  dayofmonth(o_orderdate) AS dom,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        |  datediff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS days_to_98
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_date_agg" ->
      """SELECT year(l_shipdate) AS ship_year, month(l_shipdate) AS ship_month,
        |  count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY 1, 2 ORDER BY ship_year, ship_month""".stripMargin,
    "q_bitwise" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_partkey & l_suppkey AS k_and,
        |  l_partkey | l_suppkey AS k_or,
        |  xor(l_partkey, l_suppkey) AS k_xor,
        |  l_linenumber << 3 AS ln_shl,
        |  l_partkey >> 2 AS pk_shr,
        |  bit_count(l_partkey) AS pk_bits
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_math" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_partkey % 7 AS pk_mod7,
        |  abs(l_quantity - 25) AS qty_dev,
        |  CAST(ceil(l_discount * 100) AS BIGINT) AS disc_pct_ceil,
        |  CAST(floor(l_tax * 100) AS BIGINT) AS tax_pct_floor,
        |  round(pow(l_quantity, 2), 6) AS qty_sq
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_json" ->
      """SELECT event_id,
        |  json_extract_string(props, '$.k') AS k_str,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num
        |FROM events
        |WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
        |ORDER BY event_id""".stripMargin,
    "q_arr_basic" ->
      """SELECT vec_id, len(embedding) AS dim,
        |  CAST(embedding[1] AS DOUBLE) AS e1,
        |  array_to_string(list_transform(embedding[1:4],
        |    x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)), ',')
        |    AS head4
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q_arr_dot" ->
      """SELECT e.vec_id,
        |  round(list_sum(list_transform(list_zip(e.embedding, q.qvec),
        |    x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))), 6) AS dot
        |FROM embeddings e
        |CROSS JOIN (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0) q
        |ORDER BY e.vec_id""".stripMargin
  )
}
