package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Scalar-function families (SURVEY.md §2.3): the Postgres function
  * surface the reference reaches via SQL delegation, expressed with
  * `org.apache.spark.sql.functions` so everything stays inside
  * whole-stage codegen (no UDFs anywhere in this module).
  *
  * Oracle dialect mappings are noted per query (SURVEY §7 risk 4);
  * derived ints are cast BIGINT, computed doubles rounded to 4, dates
  * emitted as ISO strings.
  */
object Functions {

  val qFnString = Q(
    "q_fn_string",
    // DuckDB dialect: string_split for split, regexp_replace needs the
    // 'g' flag to match Spark's replace-all semantics.
    """SELECT p_partkey,
      |       upper(p_name) AS uname,
      |       lower(p_brand) AS lbrand,
      |       substring(p_name, 1, 5) AS prefix,
      |       CAST(length(p_name) AS BIGINT) AS name_len,
      |       trim(concat('  ', p_name, '  ')) AS trimmed,
      |       lpad(CAST(p_size AS VARCHAR), 4, '0') AS padded_size,
      |       CAST(len(string_split(p_type, ' ')) AS BIGINT) AS n_type_words,
      |       regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
      |       regexp_extract(p_type, '([a-z]+)', 1) AS first_word,
      |       replace(p_brand, '#', 'no.') AS brand_long,
      |       CAST(instr(p_name, 'a') AS BIGINT) AS first_a
      |FROM part
      |ORDER BY p_partkey""".stripMargin) { (s, d) =>
    Tables.part(s, d)
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("uname"),
        lower(col("p_brand")).as("lbrand"),
        substring(col("p_name"), 1, 5).as("prefix"),
        length(col("p_name")).cast("bigint").as("name_len"),
        trim(concat(lit("  "), col("p_name"), lit("  "))).as("trimmed"),
        lpad(col("p_size").cast("string"), 4, "0").as("padded_size"),
        size(split(col("p_type"), " ")).cast("bigint").as("n_type_words"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
        regexp_extract(col("p_type"), "([a-z]+)", 1).as("first_word"),
        regexp_replace(col("p_brand"), "#", "no.").as("brand_long"),
        instr(col("p_name"), "a").cast("bigint").as("first_a"))
      .orderBy("p_partkey")
  }

  val qFnDate = Q(
    "q_fn_date",
    // DuckDB dialect: dayofweek()=dow (0=Sunday) vs Spark dayofweek
    // (1=Sunday) — Spark side subtracts 1; datediff arg order differs.
    """SELECT o_orderkey,
      |       CAST(year(o_orderdate) AS BIGINT) AS yr,
      |       CAST(month(o_orderdate) AS BIGINT) AS mo,
      |       CAST(day(o_orderdate) AS BIGINT) AS dy,
      |       CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
      |       CAST(dayofweek(o_orderdate) AS BIGINT) AS dow,
      |       date_trunc('month', o_orderdate) AS month_start,
      |       CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS BIGINT) AS days_to_98,
      |       strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS plus30,
      |       strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("bigint").as("yr"),
        month(col("o_orderdate")).cast("bigint").as("mo"),
        dayofmonth(col("o_orderdate")).cast("bigint").as("dy"),
        quarter(col("o_orderdate")).cast("bigint").as("qtr"),
        (dayofweek(col("o_orderdate")) - 1).cast("bigint").as("dow"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        datediff(lit("1998-01-01").cast("date"), col("o_orderdate").cast("date"))
          .cast("bigint").as("days_to_98"),
        date_format(date_add(col("o_orderdate").cast("date"), 30), "yyyy-MM-dd").as("plus30"),
        date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"))
      .orderBy("o_orderkey")
  }

  val qFnMath = Q(
    "q_fn_math",
    // DuckDB dialect: ln() for natural log (DuckDB log() is log10);
    // floor/ceil return DOUBLE there, BIGINT in Spark — cast both.
    """SELECT l_orderkey, l_linenumber,
      |       round(l_extendedprice, 2) AS price2,
      |       CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
      |       CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
      |       round(abs(l_discount - l_tax), 4) AS rate_gap,
      |       round(pow(l_quantity, 2), 4) AS qty_sq,
      |       round(sqrt(l_quantity), 4) AS qty_sqrt,
      |       round(ln(l_extendedprice), 4) AS price_ln,
      |       CAST(mod(l_orderkey, 7) AS BIGINT) AS key_mod7,
      |       round(sign(l_discount - l_tax), 1) AS gap_sign
      |FROM lineitem
      |ORDER BY l_orderkey, l_linenumber, price2, rate_gap, qty_sq""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice"), 2).as("price2"),
        floor(col("l_extendedprice")).as("price_floor"),
        ceil(col("l_extendedprice")).as("price_ceil"),
        round(abs(col("l_discount") - col("l_tax")), 4).as("rate_gap"),
        round(pow(col("l_quantity"), 2), 4).as("qty_sq"),
        round(sqrt(col("l_quantity")), 4).as("qty_sqrt"),
        round(log(col("l_extendedprice")), 4).as("price_ln"),
        pmod(col("l_orderkey"), lit(7)).cast("bigint").as("key_mod7"),
        round(signum(col("l_discount") - col("l_tax")), 1).as("gap_sign"))
      .orderBy("l_orderkey", "l_linenumber", "price2", "rate_gap", "qty_sq")
  }

  val qFnJson = Q(
    "q_fn_json",
    // DuckDB dialect: json_extract_string ↔ get_json_object.
    """SELECT event_id,
      |       json_extract_string(props, '$.k') AS k_str,
      |       CAST(json_extract(props, '$.k') AS BIGINT) AS k_int,
      |       CAST(json_extract(props, '$.missing') AS BIGINT) AS k_missing
      |FROM events
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType))))
          .getField("k").as("k_int"),
        get_json_object(col("props"), "$.missing").cast("bigint").as("k_missing"))
      .orderBy("event_id")
  }

  /** Variant type (Spark 4's semi-structured column format): parse once
    * into the binary variant encoding, then typed path extraction —
    * unlike get_json_object there is no per-access re-parse, which is
    * the point at corpus scale (parse_json runs once per row in the
    * scan projection, each variant_get is a cheap binary traversal).
    * Oracle: DuckDB json_extract + casts, which defines the same typed
    * semantics. */
  val qFnVariant = Q(
    "q_fn_variant",
    """SELECT event_id,
      |       CAST(json_extract(props, '$.k') AS BIGINT) AS k_int,
      |       CAST(json_extract(props, '$.k') AS DOUBLE) AS k_dbl,
      |       CAST(json_extract(props, '$.missing') AS BIGINT) AS k_missing
      |FROM events
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    val v = parse_json(col("props"))
    Tables.events(s, d)
      .select(
        col("event_id"),
        variant_get(v, "$.k", "bigint").as("k_int"),
        variant_get(v, "$.k", "double").as("k_dbl"),
        try_variant_get(v, "$.missing", "bigint").as("k_missing"))
      .orderBy("event_id")
  }

  val qFnArray = Q(
    "q_fn_array",
    // DuckDB dialect: len/list_transform/list_sum/list_max and 1-based
    // [i] / [a:b] slicing ↔ Spark size/transform/aggregate/array_max/
    // element_at/slice. Float math is cast to DOUBLE on both sides.
    """SELECT vec_id,
      |       CAST(len(embedding) AS BIGINT) AS dim,
      |       round(CAST(embedding[1] AS DOUBLE), 4) AS first_val,
      |       round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 4) AS sum_all,
      |       round(list_max(list_transform(embedding[1:8], x -> abs(CAST(x AS DOUBLE)))), 4) AS absmax8
      |FROM embeddings
      |ORDER BY vec_id""".stripMargin) { (s, d) =>
    Tables.embeddings(s, d)
      .select(
        col("vec_id"),
        size(col("embedding")).cast("bigint").as("dim"),
        round(element_at(col("embedding"), 1).cast("double"), 4).as("first_val"),
        round(expr("aggregate(transform(embedding, x -> CAST(x AS DOUBLE)), 0D, (acc, x) -> acc + x)"), 4)
          .as("sum_all"),
        round(expr("array_max(transform(slice(embedding, 1, 8), x -> abs(CAST(x AS DOUBLE))))"), 4)
          .as("absmax8"))
      .orderBy("vec_id")
  }

  /** Generator (UDTF-shaped) surface: posexplode over an array slice. */
  val qFnExplode = Q(
    "q_fn_explode",
    """SELECT e.vec_id, t.i AS pos, round(CAST(e.embedding[t.i] AS DOUBLE), 4) AS val
      |FROM embeddings e, range(1, 5) t(i)
      |ORDER BY vec_id, pos""".stripMargin) { (s, d) =>
    Tables.embeddings(s, d)
      .select(col("vec_id"), posexplode(slice(col("embedding"), 1, 4)))
      .select(
        col("vec_id"),
        (col("pos") + 1).cast("bigint").as("pos"),
        round(col("col").cast("double"), 4).as("val"))
      .orderBy("vec_id", "pos")
  }

  /** Map surface: build a map, read scalars back out. The oracle computes
    * the same scalars directly (DuckDB map syntax diverges; semantics —
    * element_at(map(k,v), k) = v — are engine-independent). */
  val qFnMap = Q(
    "q_fn_map",
    """SELECT event_id,
      |       round(value * 2, 4) AS doubled,
      |       'v' AS only_key,
      |       CAST(1 AS BIGINT) AS n_keys
      |FROM events
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .select(
        col("event_id"),
        round(element_at(map(lit("v"), col("value") * 2), "v"), 4).as("doubled"),
        element_at(map_keys(map(lit("v"), col("value"))), 1).as("only_key"),
        size(map_values(map(lit("v"), col("value")))).cast("bigint").as("n_keys"))
      .orderBy("event_id")
  }

  /** Bitwise family. DuckDB: xor() is a function, shifts are <</>>,
    * bit_count returns the popcount as in Spark. */
  val qFnBitwise = Q(
    "q_fn_bitwise",
    """SELECT o_orderkey,
      |       CAST(o_orderkey & 255 AS BIGINT) AS low_byte,
      |       CAST(o_orderkey | 1 AS BIGINT) AS with_low_bit,
      |       CAST(xor(o_orderkey, 21845) AS BIGINT) AS xored,
      |       CAST(o_orderkey << 2 AS BIGINT) AS shifted_l,
      |       CAST(o_orderkey >> 3 AS BIGINT) AS shifted_r,
      |       CAST(bit_count(o_orderkey) AS BIGINT) AS popcount
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        col("o_orderkey").bitwiseAND(255).cast("bigint").as("low_byte"),
        col("o_orderkey").bitwiseOR(1).cast("bigint").as("with_low_bit"),
        col("o_orderkey").bitwiseXOR(21845).cast("bigint").as("xored"),
        shiftleft(col("o_orderkey"), 2).cast("bigint").as("shifted_l"),
        shiftright(col("o_orderkey"), 3).cast("bigint").as("shifted_r"),
        bit_count(col("o_orderkey")).cast("bigint").as("popcount"))
      .orderBy("o_orderkey")
  }

  /** Struct (row-value) surface: build a struct, project fields through
    * it. The oracle computes the same scalars directly — field access
    * through a freshly built struct is the identity on both engines. */
  val qFnStruct = Q(
    "q_fn_struct",
    """SELECT o_orderkey,
      |       o_orderstatus AS s_status,
      |       round(o_totalprice, 4) AS s_price,
      |       CAST(2 AS BIGINT) AS n_fields
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .withColumn("st", struct(
        col("o_orderstatus").as("status"),
        round(col("o_totalprice"), 4).as("price")))
      .select(
        col("o_orderkey"),
        col("st.status").as("s_status"),
        col("st.price").as("s_price"),
        expr("CAST(size(json_object_keys(to_json(st))) AS BIGINT)").as("n_fields"))
      .orderBy("o_orderkey")
  }

  val all: Seq[Q] =
    Seq(qFnString, qFnDate, qFnMath, qFnJson, qFnVariant, qFnArray, qFnExplode,
      qFnMap, qFnBitwise, qFnStruct)
}
