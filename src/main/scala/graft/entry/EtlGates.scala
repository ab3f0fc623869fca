package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{EtlLeaf, EtlObj, EtlSchema}
import graft.ops._
import graft.llm._
import GateSupport._

/** Views, extract, transform/path, badgerfish, schema coercion, validation/match, load gates.
  *
  * One registry entry per operator: (name, spark fn, oracle SQL) —
  * composed into [[SparkEntry.queries]]/[[SparkEntry.oracleSql]].
  */
private[graft] object EtlGates {
  val all: Seq[(String, (SparkSession, String) => DataFrame, String)] = Seq(
    // ---- view DSL / joins -------------------------------------------------
    ("view_flagship",
      (s: SparkSession, dir: String) => viewFlagship(s, dir),
      """SELECT c_custkey, c_name, n_name, r_name
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |              JOIN region ON n_regionkey = r_regionkey
        |WHERE c_mktsegment = 'BUILDING'""".stripMargin),

    ("view_unique_first_order",
      (s: SparkSession, dir: String) => {
        import ViewDsl._
        val reg = new Registry(Map(
          "Customer" -> t(s, dir, "customer"), "Orders" -> t(s, dir, "orders")))
        val tree = ViewNode("Customer",
          children = Seq(ViewNode("Orders", unique = true,
            assoc = Some(Assoc("c_custkey", "o_custkey", BelongsTo)))))
        reg.applyView(tree)
          .select(col("c_custkey"), col("c_name"), col("o_orderkey"), col("o_totalprice"))
      },
      """SELECT c_custkey, c_name, o_orderkey, o_totalprice
        |FROM customer LEFT JOIN
        |  (SELECT * FROM orders QUALIFY row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) = 1) o
        |  ON c_custkey = o_custkey""".stripMargin),

    ("view_hasmany_nest",
      (s: SparkSession, dir: String) => {
        import ViewDsl._
        val reg = new Registry(Map(
          "Nation" -> t(s, dir, "nation"), "Customer" -> t(s, dir, "customer")))
        val tree = ViewNode("Nation",
          children = Seq(ViewNode("Customer", nest = true,
            assoc = Some(Assoc("n_nationkey", "c_nationkey", HasMany)))))
        reg.applyView(tree).select(col("n_nationkey"), col("n_name"),
          coalesce(size(col("customers")), lit(0)).cast("long").as("n_customers"),
          array_join(transform(col("customers"), x => x.getField("c_name")), ",").as("names"))
      },
      """SELECT n_nationkey, n_name, CAST(count(c_custkey) AS BIGINT) AS n_customers,
        |       string_agg(c_name, ',' ORDER BY c_custkey) AS names
        |FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
        |GROUP BY n_nationkey, n_name""".stripMargin),

    ("view_m2m_through",
      (s: SparkSession, dir: String) => {
        val reg = new ViewDsl.Registry(Map(
          "Customer" -> t(s, dir, "customer"), "Orders" -> t(s, dir, "orders"),
          "Lineitem" -> t(s, dir, "lineitem")))
        reg.manyToMany("Customer", "Orders", "Lineitem",
            "c_custkey", "o_custkey", "o_orderkey", "l_orderkey")
          .groupBy(col("c_custkey"))
          .agg(count(lit(1)).as("n_items"), sum(col("l_quantity")).as("qty"))
      },
      """SELECT c_custkey, CAST(count(*) AS BIGINT) AS n_items, CAST(sum(l_quantity) AS DOUBLE) AS qty
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |              JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY c_custkey""".stripMargin),

    // ---- extract (J6 lookup joins, U2 dep DAG) ---------------------------
    ("extract_enrich",
      (s: SparkSession, dir: String) => {
        // spec deliberately scrambled: toposort must schedule
        // cust_nation_key before nation_name
        val spec = Seq(
          "nation_name" -> (Extract.Lookup(t(s, dir, "nation"), "cust_nation_key",
            "n_nationkey", Seq("n_name" -> "nation_name"),
            deps = Seq("cust_nation_key")): Extract.Extractor),
          "big_order" -> Extract.ExprField(Nil, _ => col("o_totalprice") > 100000.0),
          "cust_nation_key" -> Extract.Lookup(t(s, dir, "customer"), "o_custkey",
            "c_custkey", Seq("c_name" -> "cust_name", "c_nationkey" -> "cust_nation_key")))
        Extract.extract(t(s, dir, "orders"), spec)
          .select(col("o_orderkey"), col("cust_name"), col("cust_nation_key"),
            col("nation_name"), col("big_order"))
      },
      """SELECT o_orderkey, c_name AS cust_name, c_nationkey AS cust_nation_key,
        |       n_name AS nation_name, o_totalprice > 100000.0 AS big_order
        |FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        |            LEFT JOIN nation ON c_nationkey = n_nationkey""".stripMargin),

    ("extract_selfedge_bool",
      (s: SparkSession, dir: String) => {
        // C12 under the oracle gate: the reference's motherIsFemale/
        // fatherIsMale pattern — a nullable reference looked up against
        // self-edges, folded to a null-tolerant boolean via <=> (null
        // reference -> vacuously true; missing edge -> false)
        val cust = t(s, dir, "customer")
        val d = cust.select(col("c_custkey"),
          when(col("c_custkey") % 7 =!= 0, col("c_custkey") % 100).as("mentor"))
        val edges = cust.filter(col("c_custkey") % 3 === 0)
          .select(col("c_custkey").as("minorID"), col("c_custkey").as("majorID"))
        Extract.extract(d, Seq(
          "mentor_major" -> (Extract.Lookup(edges, "mentor", "minorID",
            Seq("majorID" -> "mentor_major")): Extract.Extractor),
          "mentor_self" -> Extract.ExprField(Seq("mentor_major"),
            _ => col("mentor").isNull || (col("mentor_major") <=> col("mentor")))))
      },
      """WITH d AS (SELECT c_custkey,
        |             CASE WHEN c_custkey % 7 <> 0 THEN c_custkey % 100 END AS mentor
        |           FROM customer),
        |e AS (SELECT c_custkey AS minorID, c_custkey AS majorID
        |      FROM customer WHERE c_custkey % 3 = 0)
        |SELECT d.c_custkey, d.mentor, e.majorID AS mentor_major,
        |       (d.mentor IS NULL OR (e.majorID IS NOT DISTINCT FROM d.mentor)) AS mentor_self
        |FROM d LEFT JOIN e ON d.mentor = e.minorID""".stripMargin),

    ("extract_selfjoin",
      (s: SparkSession, dir: String) => {
        // the mother/father pattern: two lookups into the SAME table by
        // different derived keys (reference: person.js:19-31)
        val c = t(s, dir, "customer")
        val spec = Seq(
          "prev_key" -> (Extract.ExprField(Nil, _ => col("c_custkey") - 1): Extract.Extractor),
          "next_key" -> Extract.ExprField(Nil, _ => col("c_custkey") + 1),
          "prev_name" -> Extract.Lookup(c, "prev_key", "c_custkey",
            Seq("c_name" -> "prev_name"), deps = Seq("prev_key")),
          "next_name" -> Extract.Lookup(c, "next_key", "c_custkey",
            Seq("c_name" -> "next_name"), deps = Seq("next_key")))
        Extract.extract(c, spec)
          .select(col("c_custkey"), col("c_name"), col("prev_name"), col("next_name"))
      },
      """SELECT c.c_custkey, c.c_name, p.c_name AS prev_name, n.c_name AS next_name
        |FROM customer c LEFT JOIN customer p ON c.c_custkey - 1 = p.c_custkey
        |                LEFT JOIN customer n ON c.c_custkey + 1 = n.c_custkey""".stripMargin),

    // ---- transform / path language ---------------------------------------
    ("transform_path",
      (s: SparkSession, dir: String) => {
        import Transform._
        val base = t(s, dir, "documents").select(col("doc_id"), col("n_chars"),
          transform(split(col("text"), " "), x => struct(x.as("t"))).as("toks"))
        val spec = TObj(Seq(
          "doc_id" -> TPath("doc_id"),
          "n_toks" -> TPath("#toks"),
          "pairs" -> TArrMap("toks", TObj(Seq(
            "idx" -> TPath("#"),
            "tok" -> TPath("t"),
            "root_chars" -> TPath("$.n_chars"))))))
        Transform.applyTransform(base, spec)
          .select(col("doc_id"), col("n_toks").cast("long").as("n_toks"),
            explode(col("pairs")).as("p"))
          .select(col("doc_id"), col("n_toks"), col("p.idx").cast("long").as("idx"),
            col("p.tok").as("tok"), col("p.root_chars").as("root_chars"))
      },
      """WITH b AS (SELECT doc_id, n_chars, string_split(text, ' ') AS toks FROM documents),
        |u AS (SELECT doc_id, n_chars, CAST(len(toks) AS BIGINT) AS n_toks,
        |             unnest(list_transform(toks, (x, i) -> {'i': i, 'x': x})) AS p
        |      FROM b)
        |SELECT doc_id, n_toks, CAST(p.i - 1 AS BIGINT) AS idx, p.x AS tok,
        |       n_chars AS root_chars
        |FROM u""".stripMargin),

    ("transform_scatter",
      (s: SparkSession, dir: String) => {
        val sc = Transform.scatter(
          t(s, dir, "orders").select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus")),
          Seq("o_orderkey" -> Seq("ids.okey", "okey_flat"),
            "o_totalprice" -> Seq("ids.price"),
            "o_orderstatus" -> Seq("status")))
        sc.select(col("okey_flat"), col("ids.okey").as("okey_nested"),
          col("ids.price").as("price"), col("status"))
      },
      """SELECT o_orderkey AS okey_flat, o_orderkey AS okey_nested,
        |       o_totalprice AS price, o_orderstatus AS status FROM orders""".stripMargin),

    ("transform_defaults",
      (s: SparkSession, dir: String) => {
        val masked = events(s, dir).select(col("event_id"),
          when(col("event_type") === "click", lit(null).cast("double"))
            .otherwise(col("value")).as("value"))
        Transform.applyDefaults(masked, Seq("value" -> -1.0, "channel" -> "none"))
      },
      """SELECT event_id,
        |       COALESCE(CASE WHEN event_type = 'click' THEN NULL ELSE value END, -1.0) AS value,
        |       'none' AS channel
        |FROM events""".stripMargin),

    // ---- badgerfish -------------------------------------------------------
    ("badgerfish_roundtrip",
      (s: SparkSession, dir: String) =>
        Badgerfish.attributes(Badgerfish.convert(t(s, dir, "region"), toBfish = true)),
      "SELECT r_regionkey, r_name FROM region"),

    ("badgerfish_values",
      (s: SparkSession, dir: String) =>
        Badgerfish.values(t(s, dir, "nation").select(col("n_name"),
          array(col("n_nationkey"), col("n_regionkey")).as("keys"))),
      """SELECT 'n_name' AS path, n_name AS value FROM nation
        |UNION ALL SELECT 'keys', CAST(n_nationkey AS VARCHAR) FROM nation
        |UNION ALL SELECT 'keys', CAST(n_regionkey AS VARCHAR) FROM nation""".stripMargin),

    // ---- schema / coercion / fixed-width ---------------------------------
    ("schema_coerce",
      (s: SparkSession, dir: String) => {
        val raw = t(s, dir, "orders").select(
          col("o_orderkey").cast("string").as("id"),
          when(col("o_orderkey") % 7 === 0, lit(""))
            .otherwise(col("o_custkey").cast("string")).as("cust"),
          when(col("o_orderkey") % 5 === 0, lit("0000-00-00"))
            .otherwise(date_format(col("o_orderdate"), "yyyy-MM-dd")).as("odate"),
          when(col("o_orderstatus") === "F", lit("false")).otherwise(lit("true")).as("done"),
          col("o_orderpriority").as("prio"))
        EtlSchema.applySchema(raw, EtlObj(Seq(
          "id" -> EtlLeaf("number"), "cust" -> EtlLeaf("Number"),
          "odate" -> EtlLeaf("Date"), "done" -> EtlLeaf("Boolean"),
          "prio" -> EtlLeaf("String"))))
      },
      """SELECT CAST(o_orderkey AS BIGINT) AS id,
        |  CAST(CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_custkey END AS BIGINT) AS cust,
        |  CAST(CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE strftime(o_orderdate, '%Y-%m-%d') END AS DATE) AS odate,
        |  o_orderstatus <> 'F' AS done,
        |  o_orderpriority AS prio
        |FROM orders""".stripMargin),

    ("schema_fixedwidth",
      (s: SparkSession, dir: String) => {
        val raw = t(s, dir, "orders").select(
          when(col("o_orderkey") % 11 === 0, lit(null))
            .otherwise(col("o_orderkey")).cast("string").as("okey"),
          col("o_orderstatus").as("status"),
          when(col("o_orderkey") % 3 === 0, lit(null))
            .otherwise((col("o_orderpriority") === "1-URGENT").cast("string")).as("urgent"),
          when(col("o_orderkey") % 5 === 0, lit("0000-00-00"))
            .otherwise(date_format(col("o_orderdate"), "yyyy-MM-dd")).as("odate"))
        EtlSchema.applyFixedWidth(raw, EtlObj(Seq(
          "okey" -> EtlLeaf("Number", Some(10)), "status" -> EtlLeaf("String", Some(2)),
          "urgent" -> EtlLeaf("Boolean", Some(3)), "odate" -> EtlLeaf("Date", Some(8)))))
      },
      """SELECT concat(
        |  CASE WHEN o_orderkey % 11 = 0 THEN repeat(' ', 10) ELSE lpad(CAST(o_orderkey AS VARCHAR), 10, '0') END,
        |  rpad(substr(o_orderstatus, 1, 2), 2, ' '),
        |  CASE WHEN o_orderkey % 3 = 0 THEN '   ' WHEN o_orderpriority = '1-URGENT' THEN '001' ELSE '000' END,
        |  CASE WHEN o_orderkey % 5 = 0 THEN '00000000' ELSE strftime(o_orderdate, '%Y%m%d') END
        |) AS value FROM orders""".stripMargin),

    // ---- validation / match ----------------------------------------------
    ("validate_clauses",
      (s: SparkSession, dir: String) => {
        val spec: Validate.Spec = Seq(
          "c_mktsegment" -> Seq(Validate.EqLit("BUILDING"), Validate.EqLit("AUTOMOBILE")),
          "c_name" -> Seq(Validate.Pred(x => x.rlike("^Customer#[0-9]+$"))),
          "c_acctbal" -> Seq(Validate.Absent, Validate.Pred(x => x > 0.0)))
        Validate.observed(Validate.validate(t(s, dir, "customer"), spec), "validate_clauses")
          .select(col("c_custkey"), col("c_mktsegment_valid"), col("c_name_valid"),
            col("c_acctbal_valid"), col("_valid"))
      },
      """SELECT c_custkey,
        |  (c_mktsegment IS NOT DISTINCT FROM 'BUILDING') OR (c_mktsegment IS NOT DISTINCT FROM 'AUTOMOBILE') AS c_mktsegment_valid,
        |  COALESCE(regexp_matches(c_name, '^Customer#[0-9]+$'), false) AS c_name_valid,
        |  (c_acctbal IS NULL) OR COALESCE(c_acctbal > 0.0, false) AS c_acctbal_valid,
        |  ((c_mktsegment IS NOT DISTINCT FROM 'BUILDING') OR (c_mktsegment IS NOT DISTINCT FROM 'AUTOMOBILE'))
        |    AND COALESCE(regexp_matches(c_name, '^Customer#[0-9]+$'), false)
        |    AND ((c_acctbal IS NULL) OR COALESCE(c_acctbal > 0.0, false)) AS "_valid"
        |FROM customer""".stripMargin),

    ("match_dispatch",
      (s: SparkSession, dir: String) =>
        Validate.dispatch(t(s, dir, "orders"), Seq(
          Validate.Mapping("fulfilled", Seq("o_orderstatus" -> "F")),
          Validate.Mapping("open", Seq("o_orderstatus" -> "O")),
          Validate.Mapping("pending", Seq("o_orderstatus" -> "P"))))
          .select(col("o_orderkey"), col("_mapping")),
      """SELECT o_orderkey,
        |  CASE WHEN o_orderstatus IS NOT DISTINCT FROM 'F' THEN 'fulfilled'
        |       WHEN o_orderstatus IS NOT DISTINCT FROM 'O' THEN 'open'
        |       WHEN o_orderstatus IS NOT DISTINCT FROM 'P' THEN 'pending'
        |       ELSE NULL END AS "_mapping"
        |FROM orders""".stripMargin),

    ("match_validate_matrix",
      (s: SparkSession, dir: String) =>
        Validate.matchValidate(t(s, dir, "customer"), Seq(
          "c_mktsegment" -> Seq(Validate.EqLit("BUILDING")),
          "c_acctbal" -> Seq(Validate.Pred(x => x > 1000.0))),
          keep = Seq("c_custkey")),
      """SELECT c_custkey,
        |  NOT (c_mktsegment IS NOT DISTINCT FROM 'BUILDING') AS c_mktsegment_failed,
        |  NOT COALESCE(c_acctbal > 1000.0, false) AS c_acctbal_failed
        |FROM customer""".stripMargin),

    ("load_filter",
      (s: SparkSession, dir: String) =>
        // "already loaded" = customers holding a large order; the anti-join
        // keeps the rest (non-empty at every SF, unlike all-orders)
        Load.filterExisting(t(s, dir, "customer"),
          t(s, dir, "orders").filter(col("o_totalprice") > 300000.0)
            .select(col("o_custkey").as("c_custkey")), "c_custkey")
          .select(col("c_custkey"), col("c_name")),
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0)""".stripMargin),

    ("load_jdbc_roundtrip",
      (s: SparkSession, dir: String) => {
        // S8 executed for real: parent-then-child load into an embedded
        // in-memory Derby database through the production writeJdbc
        // (bind-parameter INSERTs), read back over JDBC (S7 executed),
        // joined and compared against the parquet oracle. The embedded
        // in-memory URL is the SANDBOX fixture (single-JVM local mode —
        // no database server exists here); writeJdbc/readJdbc take any
        // URL, and a cluster run points them at a database server
        // reachable from every executor. The roundtrip materializes
        // eagerly (localCheckpoint) so the DB can be DROPPED before
        // returning — idempotent across the driver's repeated runs,
        // zero leaked databases. Dimension tables only — a fact-sized
        // JDBC scan belongs to readJdbcPartitioned.
        val name = s"g${java.util.UUID.randomUUID().toString.replace("-", "")}"
        val url = s"jdbc:derby:memory:$name;create=true"
        val region = t(s, dir, "region")
          .select(col("r_regionkey").cast("long").as("r_regionkey"), col("r_name"))
        val nation = t(s, dir, "nation")
          .select(col("n_nationkey").cast("long").as("n_nationkey"), col("n_name"),
            col("n_regionkey").cast("long").as("n_regionkey"))
        graft.ops.Load.loadOrdered("region" -> region, Seq("nation" -> nation),
          (nm, df) => graft.ops.Load.writeJdbc(df, url, nm))
        val r = graft.sources.Sources.readJdbc(s, url, "region")
        val n = graft.sources.Sources.readJdbc(s, url, "nation")
        val out = n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .select(col("n_nationkey"), col("n_name"), col("r_name"))
          .localCheckpoint()
        try java.sql.DriverManager.getConnection(s"jdbc:derby:memory:$name;drop=true")
        catch { case _: java.sql.SQLException => () } // 08006 = successful drop
        out
      },
      """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name, r_name
        |FROM nation JOIN region ON n_regionkey = r_regionkey""".stripMargin),

    ("load_bucketed_join",
      (s: SparkSession, dir: String) => {
        // bucketed co-location executed for real: both sides written
        // bucketBy(8, custkey) into the session catalog, then joined —
        // Catalyst plans the join with NO Exchange on either side
        // (BucketingSpec asserts it, with a non-bucketed negative
        // control). The managed tables land in spark-warehouse/ and
        // are overwritten on every run, so the gate is idempotent;
        // names carry a SHA-256 dir digest so concurrent suites on
        // different fixture dirs never race on the catalog
        val sfx = dirSuffix(dir)
        Bucketing.writeBucketed(t(s, dir, "orders")
          .select(col("o_custkey").as("custkey"), col("o_orderkey")),
          s"graft_bkt_orders_$sfx", "custkey", nBuckets = 8)
        Bucketing.writeBucketed(t(s, dir, "customer")
          .select(col("c_custkey").as("custkey"), col("c_nationkey")),
          s"graft_bkt_customer_$sfx", "custkey", nBuckets = 8)
        Bucketing.bucketedJoin(s, s"graft_bkt_orders_$sfx", s"graft_bkt_customer_$sfx", "custkey")
          .select(col("o_orderkey"), col("custkey"), col("c_nationkey"))
      },
      """SELECT o_orderkey, o_custkey AS custkey, c_nationkey
        |FROM orders JOIN customer ON o_custkey = c_custkey""".stripMargin),

    ("validate_array_elems",
      (s: SparkSession, dir: String) => {
        val base = t(s, dir, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
        // array columns are joined to strings: the driver's pandas comparator
        // cannot hash numpy arrays (CORRECTNESS_r03 validate_array_elems err)
        Validate.validateElements(base, "toks",
          Seq(Validate.Pred(x => length(x) > 3)))
          .select(col("doc_id"),
            array_join(col("toks_elem_valid").cast("array<string>"), ",")
              .as("toks_elem_valid"),
            array_join(col("toks_invalid_idx").cast("array<string>"), ",")
              .as("toks_invalid_idx"),
            col("toks_valid"))
      },
      """WITH b AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        |SELECT doc_id,
        |  CASE WHEN toks IS NULL THEN NULL ELSE COALESCE(array_to_string(list_transform(toks, x -> CAST(length(x) > 3 AS VARCHAR)), ','), '') END AS toks_elem_valid,
        |  CASE WHEN toks IS NULL THEN NULL ELSE COALESCE(array_to_string(list_filter(list_transform(toks, (x, i) -> CASE WHEN NOT length(x) > 3 THEN CAST(i - 1 AS INT) END), x -> x IS NOT NULL), ','), '') END AS toks_invalid_idx,
        |  len(list_filter(toks, x -> NOT length(x) > 3)) = 0 AS toks_valid
        |FROM b""".stripMargin),

    ("pipeline_e2e",
      (s: SparkSession, dir: String) => {
        // the full match -> defaults -> validate -> extract -> transform
        // composition over one registered mapping (reference
        // orchestration: etl.js:729-756)
        import Pipeline._
        val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
        val m = PipelineMapping("fulfilled",
          matchSpec = Seq("o_orderstatus" -> "F"),
          defaults = Seq("channel" -> "batch"),
          validation = Seq(
            "o_orderpriority" -> prios.map(p => Validate.EqLit(p): Validate.Clause),
            "o_totalprice" -> Seq(Validate.Pred(x => x > 0.0))),
          extract = Seq(
            "cust_name" -> Extract.Lookup(t(s, dir, "customer"), "o_custkey",
              "c_custkey", Seq("c_name" -> "cust_name"))),
          transform = Some(Transform.TObj(Seq(
            "okey" -> Transform.TPath("o_orderkey"),
            "cust" -> Transform.TPath("cust_name"),
            "channel" -> Transform.TPath("channel"),
            "valid" -> Transform.TPath("_valid")))))
        val other = PipelineMapping("open", matchSpec = Seq("o_orderstatus" -> "O"))
        Pipeline.run(t(s, dir, "orders"), Seq(m, other), "fulfilled")
      },
      """SELECT o_orderkey AS okey, c_name AS cust, 'batch' AS channel,
        |  (o_orderpriority IN ('1-URGENT', '2-HIGH', '3-MEDIUM', '4-NOT SPECIFIED', '5-LOW'))
        |    AND COALESCE(o_totalprice > 0.0, false) AS valid
        |FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderstatus = 'F'""".stripMargin),
  )
}
