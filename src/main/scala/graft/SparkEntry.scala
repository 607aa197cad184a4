package graft

import org.apache.spark.sql.{SparkSession, DataFrame, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

import graft.functions.GraftFunctions
import graft.gen.PageGen
import graft.pipeline.ERPipeline
import graft.score.Similarity
import graft.text.TextAnalysis
import graft.dedup.Dedup
import graft.ann.Ann

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every SQL-expressible operator has an `oracleSql` twin runnable by
  * DuckDB over the same parquet tables. Numeric outputs are designed for
  * bit-exact cross-engine comparison: counts/mins/maxes are exact,
  * monetary sums go through DECIMAL(18,4) (order-independent, exact) and
  * only then to double; no float division or float summation reaches an
  * oracle-checked column.
  */
object SparkEntry {

  private def t(dir: String, name: String)(implicit spark: SparkSession): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Exact, order-independent sum of a double money column. */
  private def dsum(c: Column): Column =
    sum(c.cast(DecimalType(18, 4))).cast(DoubleType)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Full ER pipeline over a generated 300-entity page corpus: extract →
    * block(LSH) → score → cluster, returning url→component assignments. */
  def entry(spark: SparkSession): DataFrame = {
    val pages = PageGen.pages(spark, 300, seed = 42L)
    val (clusters, _) = ERPipeline.run(spark, pages)
    clusters
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---------------- relational spine (TPC-H-ish; SURVEY.md §2.7-2.9) ----
    "q1_agg" -> ((s, dir) => { implicit val sp = s; import s.implicits._
      t(dir, "lineitem").groupBy($"l_returnflag", $"l_linestatus").agg(
        sum($"l_quantity").as("sum_qty"),
        count(lit(1)).as("n_rows"),
        dsum($"l_extendedprice").as("sum_price"),
        min($"l_shipdate").as("first_ship"),
        max($"l_shipdate").as("last_ship"))
    }),
    "q2_topn" -> ((s, dir) => { implicit val sp = s; import s.implicits._
      t(dir, "orders")
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
        .limit(20)
    }),
    "q3_join_agg" -> ((s, dir) => { implicit val sp = s; import s.implicits._
      val li = t(dir, "lineitem"); val o = t(dir, "orders")
      val c = t(dir, "customer")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy($"c_mktsegment").agg(
          count(lit(1)).as("n_rows"),
          sum($"l_quantity").as("sum_qty"),
          dsum($"l_extendedprice").as("sum_price"))
    }),
    "q4_semi_join" -> ((s, dir) => { implicit val sp = s; import s.implicits._
      t(dir, "part").join(t(dir, "lineitem"),
          $"p_partkey" === $"l_partkey", "left_semi")
        .groupBy($"p_brand").agg(count(lit(1)).as("n_parts"))
    }),
    "q5_anti_join" -> ((s, dir) => { implicit val sp = s; import s.implicits._
      t(dir, "customer").join(t(dir, "orders"),
          $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_name")
    }),
    "q6_window" -> ((s, dir) => { implicit val sp = s; import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      t(dir, "orders").withColumn("rn", row_number().over(w))
        .where($"rn" === 1)
        .select($"o_custkey", $"o_orderkey", $"o_totalprice")
    }),
    "q7_setops" -> ((s, dir) => { implicit val sp = s; import s.implicits._
      val cn = t(dir, "customer").select($"c_nationkey".cast(IntegerType).as("nk"))
      val sn = t(dir, "supplier").select($"s_nationkey".cast(IntegerType).as("nk"))
      cn.union(sn).distinct()
        .join(sn.distinct().withColumn("in_supplier", lit(1)), Seq("nk"), "left")
        .select($"nk", coalesce($"in_supplier", lit(0)).as("in_supplier"))
    }),
    "q8_rollup" -> ((s, dir) => { implicit val sp = s; import s.implicits._
      val c = t(dir, "customer"); val n = t(dir, "nation"); val r = t(dir, "region")
      c.join(broadcast(n), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
        .rollup($"r_name", $"n_name")
        .agg(count(lit(1)).as("n_cust"))
    }),
    "q9_events_daily" -> ((s, dir) => { implicit val sp = s; import s.implicits._
      t(dir, "events").groupBy(to_date($"ts").as("day"), $"event_type").agg(
        count(lit(1)).as("n_events"),
        dsum($"value").as("sum_value"))
    }),
    "q10_having" -> ((s, dir) => { implicit val sp = s; import s.implicits._
      t(dir, "orders").groupBy($"o_custkey").agg(
          count(lit(1)).as("n_orders"),
          dsum($"o_totalprice").as("sum_spend"))
        .where($"n_orders" >= 10)
    }),
    "q11_conditional_agg" -> ((s, dir) => { implicit val sp = s; import s.implicits._
      t(dir, "orders").groupBy($"o_orderpriority").agg(
        sum(when($"o_orderstatus" === "F", 1L).otherwise(0L)).as("n_f"),
        sum(when($"o_orderstatus" === "O", 1L).otherwise(0L)).as("n_o"),
        sum(when($"o_orderstatus" === "P", 1L).otherwise(0L)).as("n_p"))
    }),

    // ---------------- document / text ops (training-data pipeline) --------
    "doc_dedup_exact" -> ((s, dir) => { implicit val sp = s; import s.implicits._
      Dedup.exactGroups(t(dir, "documents"), $"text", $"doc_id")
    }),
    "doc_tokens" -> ((s, dir) => { implicit val sp = s; import s.implicits._
      t(dir, "documents").select($"doc_id",
        TextAnalysis.tokenCount($"text").cast(LongType).as("n_tokens"),
        TextAnalysis.bpeishTokenCount($"text").cast(LongType).as("n_subtokens"))
    }),
    "doc_quality" -> ((s, dir) => { implicit val sp = s; import s.implicits._
      t(dir, "documents").select($"doc_id",
        length($"text").cast(LongType).as("n_chars"),
        TextAnalysis.alphaCount($"text").cast(LongType).as("n_alpha"),
        TextAnalysis.digitCount($"text").cast(LongType).as("n_digit"),
        TextAnalysis.punctCount($"text").cast(LongType).as("n_punct"),
        TextAnalysis.stopwordCount($"text").cast(LongType).as("n_stopwords"))
    }),
    "doc_lang_guess" -> ((s, dir) => { implicit val sp = s; import s.implicits._
      t(dir, "documents").select($"doc_id",
        TextAnalysis.langGuessSql($"text").as("lang_guess"))
    }),
    "doc_fingerprint" -> ((s, dir) => { implicit val sp = s; import s.implicits._
      t(dir, "documents").select($"doc_id",
        TextAnalysis.fingerprint64($"text").as("fingerprint"))
    }),
    "doc_minhash_neardup" -> ((s, dir) => { implicit val sp = s; import s.implicits._
      Dedup.minhashPairs(t(dir, "documents"), $"doc_id", $"text",
        bands = 8, rowsPerBand = 4, jaccardFloor = 0.7)
    }),
    "doc_simhash" -> ((s, dir) => { implicit val sp = s; import s.implicits._
      t(dir, "documents").select($"doc_id",
        Dedup.simhash64($"text").as("simhash"))
    }),
    "emb_ann_topk" -> ((s, dir) => { implicit val sp = s; import s.implicits._
      Ann.bruteForceTopK(t(dir, "embeddings"), nQueries = 8, k = 5)
    }),
    "emb_neardup_lsh" -> ((s, dir) => { implicit val sp = s; import s.implicits._
      Ann.cosineNearDupLsh(t(dir, "embeddings"), bits = 12, cosFloor = 0.9)
    }),

    // ---------------- ER pipeline ops (north_rule; no SQL equivalent) -----
    "er_extract" -> ((s, dir) => { implicit val sp = s; import s.implicits._
      ERPipeline.extract(PageGen.pages(s, 400, seed = 7L))
        .select($"url", $"canonical_text", $"norm_title")
    }),
    "er_clusters" -> ((s, dir) => { implicit val sp = s; import s.implicits._
      val (cl, _) = ERPipeline.run(s, PageGen.pages(s, 400, seed = 7L))
      cl.select($"url", $"component")
    }),
    "er_f1" -> ((s, dir) => { implicit val sp = s; import s.implicits._
      val (cl, _) = ERPipeline.run(s, PageGen.pages(s, 400, seed = 7L))
      ERPipeline.evaluate(cl, PageGen.labeledPairs(s, 400, seed = 7L))
    }),
    "convert_ditto" -> ((s, dir) => { implicit val sp = s; import s.implicits._
      // Ditto COL/VAL lines synthesized from the page corpus → wide pairs
      val pairs = PageGen.labeledPairs(s, 200, seed = 5L).limit(500)
      val pages = PageGen.pagesWithTruth(s, 200, seed = 5L)
        .select($"url", $"text")
      val lines = pairs
        .join(pages.toDF("left_url", "l_text"), Seq("left_url"))
        .join(pages.toDF("right_url", "r_text"), Seq("right_url"))
        .select(concat_ws("\t", $"l_text", $"r_text",
          $"label".cast(StringType)).as("value"))
      graft.convert.DittoConverter.convertLines(s, lines,
        graft.convert.DittoConverter.Config(robust = true,
          preferredOrder = Seq("title", "brand")))
    }),
    "enrich_titles" -> ((s, dir) => { implicit val sp = s; import s.implicits._
      // enrichment operator (M1): deterministic per-field rule chains
      val pairs = PageGen.labeledPairs(s, 200, seed = 5L).limit(500)
      val pages = PageGen.pagesWithTruth(s, 200, seed = 5L)
        .select($"url",
          GraftFunctions.extractTitleUdf($"text").as("title"))
      val wide = pairs
        .join(pages.toDF("left_url", "left_title"), Seq("left_url"))
        .join(pages.toDF("right_url", "right_title"), Seq("right_url"))
        .withColumn("id", row_number().over(
          Window.orderBy($"left_url", $"right_url")) - 1)
        .select($"id", $"label", $"left_title", $"right_title")
      graft.norm.Enrichment.enrich(wide, graft.norm.Enrichment.wdcTitle)
    }),
    "er_similarity" -> ((s, dir) => { implicit val sp = s; import s.implicits._
      // similarity measures over part names (testdata-backed, deterministic)
      val p = t(dir, "part").select($"p_partkey", $"p_name")
      val q = p.toDF("q_partkey", "q_name")
      p.join(q, $"p_partkey" =!= $"q_partkey" &&
          pmod($"p_partkey" + $"q_partkey", lit(97)) === 0)
        .select($"p_partkey", $"q_partkey",
          Similarity.jaro_winkler($"p_name", $"q_name").as("jw"),
          levenshtein($"p_name", $"q_name").as("lev"))
    })
  )

  /** DuckDB oracles — same table names, same column aliases. */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        | count(*) AS n_rows,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
        | min(l_shipdate) AS first_ship, max(l_shipdate) AS last_ship
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q2_topn" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20""".stripMargin,
    "q3_join_agg" ->
      """SELECT c_mktsegment, count(*) AS n_rows, sum(l_quantity) AS sum_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,
    "q4_semi_join" ->
      """SELECT p_brand, count(*) AS n_parts FROM part
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
        |GROUP BY p_brand""".stripMargin,
    "q5_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "q6_window" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        | SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        | FROM orders) WHERE rn = 1""".stripMargin,
    "q7_setops" ->
      """SELECT nk, CASE WHEN nk IN (SELECT DISTINCT s_nationkey FROM supplier)
        | THEN 1 ELSE 0 END AS in_supplier
        |FROM (SELECT DISTINCT CAST(c_nationkey AS INT) AS nk FROM customer
        |      UNION SELECT DISTINCT CAST(s_nationkey AS INT) FROM supplier)""".stripMargin,
    "q8_rollup" ->
      """SELECT r_name, n_name, count(*) AS n_cust FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)""".stripMargin,
    "q9_events_daily" ->
      """SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n_events,
        | CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY CAST(ts AS DATE), event_type""".stripMargin,
    "q10_having" ->
      """SELECT o_custkey, count(*) AS n_orders,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_spend
        |FROM orders GROUP BY o_custkey HAVING count(*) >= 10""".stripMargin,
    "q11_conditional_agg" ->
      """SELECT o_orderpriority,
        | CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
        | CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
        | CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "doc_dedup_exact" ->
      """SELECT md5(text) AS h, count(*) AS n_copies, min(doc_id) AS keeper
        |FROM documents GROUP BY md5(text)""".stripMargin,
    "doc_tokens" ->
      """SELECT doc_id,
        | len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
        | len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS n_subtokens
        |FROM documents""".stripMargin,
    "doc_quality" ->
      """SELECT doc_id, length(text) AS n_chars,
        | length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS n_alpha,
        | length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit,
        | length(regexp_replace(text, '[^!-/:-@\[-`{-~]', '', 'g')) AS n_punct,
        | len(regexp_extract_all(lower(text),
        |   '\b(the|a|an|of|and|or|to|in|is|it|that|for|on|with|as)\b')) AS n_stopwords
        |FROM documents""".stripMargin,
    "doc_lang_guess" ->
      """SELECT doc_id, CASE
        | WHEN lower(text) LIKE '% the %' OR lower(text) LIKE '% and %'
        |   OR lower(text) LIKE '% of %' THEN 'en'
        | WHEN lower(text) LIKE '% de %' OR lower(text) LIKE '% la %'
        |   OR lower(text) LIKE '% el %' THEN 'es'
        | WHEN lower(text) LIKE '% le %' OR lower(text) LIKE '% et %'
        |   OR lower(text) LIKE '% les %' THEN 'fr'
        | ELSE 'unknown' END AS lang_guess
        |FROM documents""".stripMargin
  )
}
